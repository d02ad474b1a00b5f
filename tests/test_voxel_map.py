import functools

import jax
import jax.numpy as jnp
import numpy as np

from lv_slam_tpu.core.cloud import PointCloud
from lv_slam_tpu.ops.voxel_map import build_voxel_map, lookup_leaves, neighborhood_offsets


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4))
def _build(cloud, res, leaf_cap, lut_extent, weighted=False):
    return build_voxel_map(cloud, res, leaf_cap=leaf_cap, lut_extent=lut_extent, weighted=weighted)


_lookup = jax.jit(lookup_leaves)


def gaussian_cell_cloud(rng, centers, cov, n_per=50, cap=None):
    pts = []
    for c in centers:
        pts.append(rng.multivariate_normal(c, cov, size=n_per))
    pts = np.concatenate(pts).astype(np.float32)
    cap = cap or len(pts)
    return PointCloud.from_numpy(pts, cap=cap)


def test_single_voxel_stats(rng):
    # all points inside one 1m voxel at cell (2,3,4) -> center (2.5,3.5,4.5)
    mean = np.array([2.5, 3.5, 4.5])
    cov = np.diag([0.01, 0.02, 0.002])
    pts = rng.multivariate_normal(mean, cov, size=2000)
    pts = np.clip(pts, mean - 0.49, mean + 0.49).astype(np.float32)
    cloud = PointCloud.from_numpy(pts, cap=2048)
    vm = _build(cloud, 1.0, 64, 8)
    assert int(vm.n_leaves) == 1
    leaf = int(np.argmax(np.asarray(vm.valid)))
    got_mean = np.asarray(vm.means)[leaf]
    np.testing.assert_allclose(got_mean, pts.mean(axis=0), atol=1e-3)
    # inverse covariance should match sample covariance (n-1)/n convention
    n = len(pts)
    emp = np.cov(pts.T, bias=True) * (n - 1) / n
    got_icov = np.asarray(vm.icovs)[leaf]
    np.testing.assert_allclose(got_icov, np.linalg.inv(emp), rtol=0.05, atol=0.5)


def test_min_points_rule(rng):
    # 5 points in one voxel (below the 6-point threshold), 10 in another
    pts = np.concatenate(
        [
            np.tile([0.5, 0.5, 0.5], (5, 1)) + rng.normal(0, 0.05, (5, 3)),
            np.tile([3.5, 0.5, 0.5], (10, 1)) + rng.normal(0, 0.05, (10, 3)),
        ]
    ).astype(np.float32)
    cloud = PointCloud.from_numpy(pts, cap=32)
    vm = _build(cloud, 1.0, 16, 8)
    assert int(vm.n_leaves) == 1


def test_eigenvalue_inflation(rng):
    # perfectly planar points -> smallest eigenvalue would be ~0; inflated to
    # 0.01 * lambda_max (voxel_grid_covariance_omp_impl.hpp:344-358)
    xy = rng.uniform(0.05, 0.95, size=(500, 2))
    pts = np.concatenate([xy, np.full((500, 1), 0.5)], axis=1).astype(np.float32)
    cloud = PointCloud.from_numpy(pts, cap=512)
    vm = _build(cloud, 1.0, 16, 8)
    leaf = int(np.argmax(np.asarray(vm.valid)))
    icov = np.asarray(vm.icovs)[leaf]
    evals = np.sort(np.linalg.eigvalsh(np.linalg.inv(icov)))
    np.testing.assert_allclose(evals[0], 0.01 * evals[2], rtol=0.05)


def test_pca_weights_planar(rng):
    # planar voxel -> label=2 -> scale 1.25; weight = 1.25 * |mean|
    xy = rng.uniform(10.05, 10.95, size=(500, 2))
    pts = np.concatenate([xy, np.full((500, 1), 0.5)], axis=1).astype(np.float32)
    cloud = PointCloud.from_numpy(pts, cap=512)
    vm = _build(cloud, 1.0, 16, 16, True)
    leaf = int(np.argmax(np.asarray(vm.valid)))
    w = float(np.asarray(vm.weights)[leaf])
    mean_norm = float(np.linalg.norm(np.asarray(vm.means)[leaf]))
    np.testing.assert_allclose(w, 1.25 * mean_norm, rtol=1e-4)


def test_lookup_direct7(rng):
    centers = [(0.5, 0.5, 0.5), (1.5, 0.5, 0.5), (0.5, 1.5, 0.5)]
    cloud = gaussian_cell_cloud(rng, centers, np.eye(3) * 0.005, n_per=50)
    vm = _build(cloud, 1.0, 32, 8)
    assert int(vm.n_leaves) == 3
    pts = jnp.array([[0.5, 0.5, 0.5]])
    offsets = neighborhood_offsets("DIRECT7")
    means, icovs, weights, hit = _lookup(vm, pts, offsets)
    # center + two face neighbors occupied
    assert int(jnp.sum(hit)) == 3
    offsets1 = neighborhood_offsets("DIRECT1")
    _, _, _, hit1 = _lookup(vm, pts, offsets1)
    assert int(jnp.sum(hit1)) == 1


def test_lookup_miss(rng):
    cloud = gaussian_cell_cloud(rng, [(0.5, 0.5, 0.5)], np.eye(3) * 0.005, n_per=50)
    vm = _build(cloud, 1.0, 16, 8)
    pts = jnp.array([[100.0, 100.0, 100.0], [-5.0, 0.0, 0.0]])
    _, _, _, hit = _lookup(vm, pts, neighborhood_offsets("DIRECT7"))
    assert int(jnp.sum(hit)) == 0
