import functools

import jax
import jax.numpy as jnp
import numpy as np

from lv_slam_tpu.core import se3
from lv_slam_tpu.core.cloud import PointCloud
from lv_slam_tpu.io import synthetic
from lv_slam_tpu.ops import ndt as ndt_mod
from lv_slam_tpu.ops.ndt import make_gauss_params, ndt_align, ndt_derivatives
from lv_slam_tpu.ops.voxel_map import build_voxel_map, lookup_leaves, neighborhood_offsets


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4))
def _build(cloud, res, leaf_cap, lut_extent, weighted=False):
    return build_voxel_map(cloud, res, leaf_cap=leaf_cap, lut_extent=lut_extent, weighted=weighted)


def _scan_cloud(scan, cap=65536):
    return PointCloud.from_numpy(scan, cap=cap)


def test_derivatives_match_autodiff(small_sequence):
    """Gradient must equal autodiff of the (frozen-gather) score; Hessian's
    symmetric part must equal the autodiff Hessian (the reference accumulates
    the unsymmetrized curvature term e_i x (e_j x y), impl2:566-620)."""
    scans, poses, _ = small_sequence
    cloud = _scan_cloud(scans[0], cap=16384)
    vm = _build(cloud, 1.0, 16384, 256)
    gauss = make_gauss_params(1.0)
    offsets = neighborhood_offsets("DIRECT7")

    t0 = se3.exp_se3(jnp.array([0.3, -0.2, 0.05, 0.02, -0.01, 0.04]))
    xyz = cloud.masked_xyz()
    score, grad, hess = jax.jit(
        lambda T: ndt_derivatives(vm, xyz, cloud.mask, T, gauss, offsets, False)
    )(t0)

    # frozen-gather score as a function of a (translation, angle-axis) pair
    y0 = se3.transform_points(t0, xyz)
    means, icovs, weights, hit = lookup_leaves(vm, y0, offsets)
    hit = hit & cloud.mask[:, None]

    def frozen_score(delta):
        rot = se3.exp_so3(delta[3:])
        y = y0 @ rot.T + delta[:3]
        d = y[:, None, :] - means
        q = jnp.einsum("nkij,nkj->nki", icovs, d)
        md = jnp.sum(d * q, axis=-1)
        e = jnp.exp(-0.5 * gauss.d2 * md)
        gate_val = gauss.d2 * e
        gate = hit & (gate_val <= 1.0) & (gate_val >= 0.0)
        w = jnp.where(gate, 1.0, 0.0)
        return jnp.sum(w * (-gauss.d1 * e))

    zero = jnp.zeros(6)
    score_ad = jax.jit(frozen_score)(zero)
    grad_ad = jax.jit(jax.grad(frozen_score))(zero)
    hess_ad = jax.jit(jax.hessian(frozen_score))(zero)

    np.testing.assert_allclose(float(score), float(score_ad), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(grad), np.asarray(grad_ad), rtol=2e-3, atol=2e-2)
    hsym = 0.5 * (np.asarray(hess) + np.asarray(hess).T)
    scale = np.abs(np.asarray(hess_ad)).max()
    np.testing.assert_allclose(hsym, np.asarray(hess_ad), atol=5e-3 * scale)


@functools.partial(jax.jit, static_argnums=(3, 4))
def _align(vm, cloud, guess, neighborhood, weighted):
    return ndt_align(
        vm,
        cloud,
        guess,
        resolution=1.0,
        transformation_epsilon=0.01,
        max_iterations=64,
        neighborhood=neighborhood,
        weighted=weighted,
    )


def test_two_frame_recovery(small_sequence):
    """Phase-3 gate: registration of consecutive synthetic frames recovers the
    ground-truth relative transform. NDT's convergence basin is ~ the voxel
    size, so it is seeded like the reference does (x=+1.5 m first-scan guess,
    `scan_matching_odom_nodelet.cpp:199-200`; warm starts afterwards)."""
    scans, poses, _ = small_sequence
    target = _scan_cloud(scans[0])
    source = _scan_cloud(scans[1])
    vm = _build(target, 1.0, 32768, 256)
    gt_rel = np.linalg.inv(poses[0]) @ poses[1]  # source frame -> target frame
    guess = jnp.eye(4).at[0, 3].set(1.5)

    for neighborhood, weighted in [("DIRECT1", True), ("DIRECT7", False)]:
        res = _align(vm, source, guess, neighborhood, weighted)
        got = np.asarray(res.transform)
        t_err = np.linalg.norm(got[:3, 3] - gt_rel[:3, 3])
        r_err = np.asarray(se3.rotation_angle(jnp.asarray(np.linalg.inv(gt_rel) @ got)[:3, :3]))
        assert t_err < 0.05, (neighborhood, weighted, t_err, got[:3, 3], gt_rel[:3, 3])
        assert float(r_err) < 0.02, (neighborhood, weighted, float(r_err))
        assert bool(res.converged)


def test_identity_alignment(small_sequence):
    scans, _, _ = small_sequence
    cloud = _scan_cloud(scans[0])
    vm = _build(cloud, 1.0, 32768, 256)
    guess = se3.exp_se3(jnp.array([0.4, -0.3, 0.1, 0.01, 0.02, -0.03]))
    res = _align(vm, cloud, guess, "DIRECT7", False)
    got = np.asarray(res.transform)
    # residual bounded by the eps=0.01 step-size stop criterion
    assert np.linalg.norm(got[:3, 3]) < 0.05
    assert float(se3.rotation_angle(jnp.asarray(got)[:3, :3])) < 0.02


def test_gauss_params_match_reference():
    """d1/d2/d3 constants for res=1.0, outlier 0.55 (impl2:94-99)."""
    g = make_gauss_params(1.0, 0.55)
    c1, c2 = 4.5, 0.55
    d3 = -np.log(c2)
    d1 = -np.log(c1 + c2) - d3
    d2 = -2 * np.log((-np.log(c1 * np.exp(-0.5) + c2) - d3) / d1)
    np.testing.assert_allclose(float(g.d1), d1, rtol=1e-6)
    np.testing.assert_allclose(float(g.d2), d2, rtol=1e-6)
    np.testing.assert_allclose(float(g.d3), d3, rtol=1e-6)
