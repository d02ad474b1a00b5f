import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lv_slam_tpu.core.cloud import PointCloud
from lv_slam_tpu.io import synthetic
from lv_slam_tpu.ops.ndt import make_gauss_params, ndt_align, ndt_derivatives
from lv_slam_tpu.ops.voxel_map import build_voxel_map, neighborhood_offsets
from lv_slam_tpu.parallel import mesh as pmesh


@functools.partial(jax.jit, static_argnums=(1,))
def _build(cloud, weighted=False):
    return build_voxel_map(cloud, 1.0, leaf_cap=16384, lut_extent=256, weighted=weighted)


@pytest.fixture(scope="module")
def pair():
    scans, poses, _ = synthetic.make_sequence(
        2, seed=7, trajectory="straight", step=1.0, n_rings=32, n_azimuth=450
    )
    target = PointCloud.from_numpy(scans[0], cap=32768)
    source = PointCloud.from_numpy(scans[1], cap=32768)
    return target, source, np.linalg.inv(poses[0]) @ poses[1]


def test_sharded_derivatives_match_single(pair):
    target, source, _ = pair
    vm = _build(target)
    gauss = make_gauss_params(1.0)
    offsets = neighborhood_offsets("DIRECT7")
    T = jnp.eye(4).at[0, 3].set(1.0)
    xyz, mask = source.masked_xyz(), source.mask

    s1, g1, h1 = jax.jit(
        lambda: ndt_derivatives(vm, xyz, mask, T, gauss, offsets, False)
    )()

    m = pmesh.make_mesh(n_batch=1, n_point=8)
    s2, g2, h2 = jax.jit(
        lambda: pmesh.ndt_derivatives_sharded(m, vm, xyz, mask, T, gauss, offsets, False)
    )()
    np.testing.assert_allclose(float(s1), float(s2), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4, atol=1e-2)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), rtol=1e-3, atol=1.0)


def test_sharded_align_matches_single(pair):
    """The sharded align must be ALGORITHMICALLY identical to the optimized
    single-chip SoA path (same packed-gather kernel, same monotone-guarded
    Newton loop) — only float reduction order may differ."""
    from lv_slam_tpu.ops.ndt_soa import ndt_align_soa

    target, source, gt = pair
    vm = _build(target)
    guess = jnp.eye(4).at[0, 3].set(1.2)

    single = jax.jit(
        functools.partial(
            ndt_align_soa, resolution=1.0, max_iterations=64,
            transformation_epsilon=0.01, neighborhood="DIRECT7", weighted=False,
        )
    )(vm, source, guess)

    m = pmesh.make_mesh(n_batch=2, n_point=4)
    vms = pmesh.stack_maps([vm, vm])
    xyz = jnp.stack([source.masked_xyz()] * 2)
    mask = jnp.stack([source.mask] * 2)
    guesses = jnp.stack([guess] * 2)
    fn = jax.jit(
        functools.partial(
            pmesh.ndt_align_sharded, resolution=1.0, max_iterations=64,
            transformation_epsilon=0.01, neighborhood="DIRECT7", weighted=False,
        ),
        static_argnums=(0,),
    )
    transforms, scores, iters = fn(m, vms, xyz, mask, guesses)
    got = np.asarray(transforms)
    ref = np.asarray(single.transform)
    # both batch rows should match the single-device result
    np.testing.assert_allclose(got[0], ref, atol=5e-3)
    np.testing.assert_allclose(got[1], ref, atol=5e-3)
    # consistency (asserted above) is the point here; absolute accuracy on a
    # low-constraint straight corridor is looser
    t_err = np.linalg.norm(got[0][:3, 3] - gt[:3, 3])
    assert t_err < 0.2, (t_err, got[0][:3, 3], gt[:3, 3])
