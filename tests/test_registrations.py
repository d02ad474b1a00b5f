import jax.numpy as jnp
import numpy as np
import pytest

from lv_slam_tpu.core import se3
from lv_slam_tpu.core.cloud import PointCloud
from lv_slam_tpu.io import synthetic
from lv_slam_tpu.ops.registrations import RegistrationParams, select_registration_method


@pytest.fixture(scope="module")
def reg_pair():
    scans, poses, _ = synthetic.make_sequence(
        2, seed=31, trajectory="figure8", step=1.0, n_rings=32, n_azimuth=450
    )
    target = PointCloud.from_numpy(scans[0], cap=16384)
    source = PointCloud.from_numpy(scans[1], cap=16384)
    gt = np.linalg.inv(poses[0]) @ poses[1]
    guess = jnp.asarray(gt.astype(np.float32))
    # perturb the guess off the truth (warm-start scale: DIRECT1's basin at
    # res 1.0 is ~+-0.3 m, and odometry guesses are far better than that)
    pert = se3.exp_se3(jnp.array([0.12, -0.08, 0.03, 0.01, -0.01, 0.02]))
    return target, source, gt, pert @ guess


@pytest.mark.parametrize("method,search,tol", [
    ("NDT_OMP", "DIRECT7", 0.06),
    ("NDT_PCA", "DIRECT1", 0.06),  # the weighted matcher runs DIRECT1 (dlo config)
    # p2p ICP carries an inherent resampling bias on sparse LiDAR (~0.16 m
    # here even when started AT ground truth) — the reason NDT is the default
    ("ICP", "DIRECT7", 0.25),
    ("GICP", "DIRECT7", 0.10),
])
def test_factory_methods_recover_pose(reg_pair, method, search, tol):
    target, source, gt, guess = reg_pair
    reg = select_registration_method(
        RegistrationParams(
            registration_method=method, max_iterations=40, ndt_nn_search_method=search
        )
    )
    result = reg(target, source, guess)
    got = np.asarray(result.transform)
    t_err = np.linalg.norm(got[:3, 3] - gt[:3, 3])
    assert t_err < tol, (method, t_err)
    assert float(result.fitness) < 0.5


def test_unknown_method_raises():
    with pytest.raises(ValueError):
        select_registration_method(RegistrationParams(registration_method="FOO"))


def test_ndt_ground_dof_mask(reg_pair):
    """Ground-constrained NDT must only adjust (z, roll, pitch)."""
    from lv_slam_tpu.ops.ndt_ground import ndt_ground_align
    from lv_slam_tpu.ops.voxel_map import build_voxel_map
    import jax

    target, source, gt, _ = reg_pair
    vm = jax.jit(
        lambda c: build_voxel_map(c, 10.0, leaf_cap=4096, lut_extent=64)
    )(target)
    guess = jnp.eye(4, dtype=jnp.float32).at[2, 3].set(0.5)  # 0.5 m z error
    res = jax.jit(
        lambda v, s, g: ndt_ground_align(v, s, g, resolution=10.0, max_iterations=16)
    )(vm, source, guess)
    got = np.asarray(res.transform)
    # x,y stay pinned up to the second-order leak of left-composed roll/pitch
    # acting on the translation (the reference's log-coordinate freeze has the
    # same property)
    assert abs(got[0, 3]) < 5e-3 and abs(got[1, 3]) < 5e-3, got[:3, 3]
    # z should have moved from the bogus 0.5 guess toward 0
    assert abs(got[2, 3]) < 0.4, got[2, 3]
