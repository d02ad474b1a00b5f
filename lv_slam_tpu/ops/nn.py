"""Approximate nearest-neighbor queries on a centroid grid.

The reference uses FLANN kd-trees for fitness scoring
(`pcl::Registration::getFitnessScore`, used by the loop-detector accept test
`loop_detector.hpp:265-269`) and for the fitness-adaptive information matrix
(`information_matrix_calculator.cpp:53-87`). kd-trees are pointer-chasing and
hostile to TPU; instead we quantize the target cloud to a fine centroid grid
(default 0.25 m) and take the min distance over the 3x3x3 cell neighborhood.
Cell lookup is binary search over sorted flat keys (vectorized `searchsorted`
— ~log2(L) gathers), which keeps memory at O(leaves) for arbitrarily fine
grids, unlike the dense LUT used on the NDT hot path. The approximation error
is bounded by the cell diagonal (~0.22 m at 0.25 m cells), well inside the
2.0 fitness accept threshold's working range.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from lv_slam_tpu.core.cloud import SENTINEL, PointCloud

_OFF27 = jnp.asarray(
    [(i, j, k) for i in (-1, 0, 1) for j in (-1, 0, 1) for k in (-1, 0, 1)],
    dtype=jnp.int32,
)
# Extent 1024 cells/axis: 1024^3 = 2^30 flat keys still fit int32.
_EXTENT = 1024
_KEY_MAX = jnp.int32(2**31 - 1)


class CentroidGrid(NamedTuple):
    keys: jax.Array         # (L,) ascending flat cell keys (invalid -> INT32_MAX)
    centroids: jax.Array    # (L,3)
    counts: jax.Array       # (L,) points per cell
    origin_cell: jax.Array  # (3,) int32
    resolution: jax.Array   # ()


def build_centroid_grid(
    cloud: PointCloud, resolution: float, leaf_cap: int = 65536
) -> CentroidGrid:
    """Fine-resolution occupancy/centroid grid over a cloud (jittable)."""
    n = cloud.cap
    res = jnp.float32(resolution)
    xyz = cloud.masked_xyz()
    mask = cloud.mask
    e = _EXTENT

    coords = jnp.floor(xyz / res).astype(jnp.int32)
    big = jnp.int32(2**30)
    origin_cell = jnp.min(jnp.where(mask[:, None], coords, big), axis=0)
    origin_cell = jnp.where(origin_cell == big, 0, origin_cell)
    rel = coords - origin_cell
    in_extent = jnp.all((rel >= 0) & (rel < e), axis=1) & mask
    flat = (rel[:, 0] * e + rel[:, 1]) * e + rel[:, 2]
    keys = jnp.where(in_extent, flat, _KEY_MAX)

    order = jnp.argsort(keys)
    skeys = keys[order]
    sxyz = xyz[order]
    svalid = in_extent[order]
    new_seg = jnp.concatenate([jnp.ones((1,), bool), skeys[1:] != skeys[:-1]])
    seg_id = jnp.cumsum(new_seg.astype(jnp.int32)) - 1
    seg_id = jnp.where(svalid & (seg_id < leaf_cap), seg_id, leaf_cap)
    num_seg = leaf_cap + 1

    counts = jax.ops.segment_sum(svalid.astype(jnp.float32), seg_id, num_segments=num_seg)[:leaf_cap]
    sums = jax.ops.segment_sum(jnp.where(svalid[:, None], sxyz, 0.0), seg_id, num_segments=num_seg)[:leaf_cap]
    seg_key = jax.ops.segment_max(jnp.where(svalid, skeys, -1), seg_id, num_segments=num_seg)[:leaf_cap]
    valid = (seg_key >= 0) & (counts > 0)
    centroids = sums / jnp.maximum(counts, 1.0)[:, None]
    # invalid/empty trailing segments -> INT32_MAX keeps `keys` ascending.
    keys_out = jnp.where(valid, seg_key, _KEY_MAX)
    return CentroidGrid(
        keys=keys_out,
        centroids=jnp.where(valid[:, None], centroids, SENTINEL),
        counts=jnp.where(valid, counts, 0.0),
        origin_cell=origin_cell,
        resolution=res,
    )


def nn_sq_dists(grid: CentroidGrid, points: jax.Array, mask: jax.Array) -> jax.Array:
    """(N,) approximate squared NN distance of each point to the grid cloud.

    Misses (no occupied cell within the 27-neighborhood) return +inf.
    """
    e = _EXTENT
    coords = jnp.floor(points / grid.resolution).astype(jnp.int32)
    rel = coords[:, None, :] - grid.origin_cell + _OFF27[None, :, :]
    in_extent = jnp.all((rel >= 0) & (rel < e), axis=-1)
    flat = (rel[..., 0] * e + rel[..., 1]) * e + rel[..., 2]
    query = jnp.where(in_extent, flat, _KEY_MAX)
    idx = jnp.searchsorted(grid.keys, query.reshape(-1)).reshape(query.shape)
    idx = jnp.minimum(idx, grid.keys.shape[0] - 1)
    hit = in_extent & (grid.keys[idx] == query)
    cent = grid.centroids[jnp.where(hit, idx, 0)]  # (N,27,3)
    d2 = jnp.sum((points[:, None, :] - cent) ** 2, axis=-1)
    d2 = jnp.where(hit, d2, jnp.inf)
    d2 = jnp.min(d2, axis=1)
    return jnp.where(mask, d2, jnp.inf)


def nn_points(grid: CentroidGrid, points: jax.Array, mask: jax.Array):
    """Approximate NN lookup returning the matched point: (d2 (N,), nn (N,3),
    valid (N,)). The match is the nearest occupied fine cell's centroid."""
    e = _EXTENT
    coords = jnp.floor(points / grid.resolution).astype(jnp.int32)
    rel = coords[:, None, :] - grid.origin_cell + _OFF27[None, :, :]
    in_extent = jnp.all((rel >= 0) & (rel < e), axis=-1)
    flat = (rel[..., 0] * e + rel[..., 1]) * e + rel[..., 2]
    query = jnp.where(in_extent, flat, _KEY_MAX)
    idx = jnp.searchsorted(grid.keys, query.reshape(-1)).reshape(query.shape)
    idx = jnp.minimum(idx, grid.keys.shape[0] - 1)
    hit = in_extent & (grid.keys[idx] == query)
    cent = grid.centroids[jnp.where(hit, idx, 0)]  # (N,27,3)
    d2 = jnp.sum((points[:, None, :] - cent) ** 2, axis=-1)
    d2 = jnp.where(hit, d2, jnp.inf)
    best = jnp.argmin(d2, axis=1)
    nn = jnp.take_along_axis(cent, best[:, None, None], axis=1)[:, 0]
    d2_best = jnp.take_along_axis(d2, best[:, None], axis=1)[:, 0]
    valid = mask & jnp.isfinite(d2_best)
    return jnp.where(valid, d2_best, jnp.inf), nn, valid


def fitness_score(
    target: PointCloud,
    source: PointCloud,
    transform: jax.Array,
    max_range: float = float("inf"),
    grid_resolution: float = 0.25,
) -> jax.Array:
    """Mean squared NN distance of `transform @ source` to `target`.

    Mirrors `pcl::Registration::getFitnessScore` semantics: only pairs with
    squared distance <= max_range^2 contribute; returns +inf when none do
    (PCL returns max double).
    """
    grid = build_centroid_grid(target, grid_resolution)
    moved = source.transformed(transform)
    d2 = nn_sq_dists(grid, moved.masked_xyz(), moved.mask)
    ok = jnp.isfinite(d2) & (d2 <= max_range * max_range)
    n = jnp.sum(ok.astype(jnp.float32))
    total = jnp.sum(jnp.where(ok, d2, 0.0))
    return jnp.where(n > 0, total / jnp.maximum(n, 1.0), jnp.inf)


def radius_outlier_removal(cloud: PointCloud, radius: float, min_neighbors: int) -> PointCloud:
    """Approximate radius outlier filter: a point survives if the 27-cell
    neighborhood (cell size = radius) holds at least `min_neighbors` other
    points. (The reference's RADIUS branch is a dead no-op —
    `prefiltering_nodelet.cpp:76-78` — so this is stricter than reference.)
    """
    grid = build_centroid_grid(cloud, radius, leaf_cap=cloud.cap)
    e = _EXTENT
    coords = jnp.floor(cloud.masked_xyz() / radius).astype(jnp.int32)
    rel = coords[:, None, :] - grid.origin_cell + _OFF27[None, :, :]
    in_extent = jnp.all((rel >= 0) & (rel < e), axis=-1)
    flat = (rel[..., 0] * e + rel[..., 1]) * e + rel[..., 2]
    query = jnp.where(in_extent, flat, _KEY_MAX)
    idx = jnp.searchsorted(grid.keys, query.reshape(-1)).reshape(query.shape)
    idx = jnp.minimum(idx, grid.keys.shape[0] - 1)
    hit = in_extent & (grid.keys[idx] == query)
    count = jnp.sum(jnp.where(hit, grid.counts[jnp.where(hit, idx, 0)], 0.0), axis=1)
    keep = cloud.mask & (count - 1 >= min_neighbors)
    return PointCloud(
        jnp.where(keep[:, None], cloud.xyz, SENTINEL), cloud.intensity, keep
    )


def statistical_outlier_removal(
    cloud: PointCloud, mean_k: int = 30, stddev_mult: float = 1.2
) -> PointCloud:
    """Approximate statistical outlier filter.

    The reference (`prefiltering_nodelet.cpp:61-70`) thresholds each point's
    mean exact k-NN distance against the global mean + stddev_mult * std. We
    use the local occupancy density at 0.5 m cells to form an equivalent
    isolation statistic (expected k-NN distance ~ (k / density)^(1/3)), which
    drops isolated returns with TPU-friendly gathers. Off in the flagship
    KITTI config.
    """
    radius = 0.5
    grid = build_centroid_grid(cloud, radius, leaf_cap=cloud.cap)
    e = _EXTENT
    coords = jnp.floor(cloud.masked_xyz() / radius).astype(jnp.int32)
    rel = coords[:, None, :] - grid.origin_cell + _OFF27[None, :, :]
    in_extent = jnp.all((rel >= 0) & (rel < e), axis=-1)
    flat = (rel[..., 0] * e + rel[..., 1]) * e + rel[..., 2]
    query = jnp.where(in_extent, flat, _KEY_MAX)
    idx = jnp.searchsorted(grid.keys, query.reshape(-1)).reshape(query.shape)
    idx = jnp.minimum(idx, grid.keys.shape[0] - 1)
    hit = in_extent & (grid.keys[idx] == query)
    density = jnp.sum(jnp.where(hit, grid.counts[jnp.where(hit, idx, 0)], 0.0), axis=1)
    vol = (3.0 * radius) ** 3
    knn_dist = jnp.cbrt(jnp.float32(mean_k) * vol / jnp.maximum(density, 1.0))
    n = jnp.maximum(jnp.sum(cloud.mask.astype(jnp.float32)), 1.0)
    mean = jnp.sum(jnp.where(cloud.mask, knn_dist, 0.0)) / n
    var = jnp.sum(jnp.where(cloud.mask, (knn_dist - mean) ** 2, 0.0)) / n
    thresh = mean + stddev_mult * jnp.sqrt(var)
    keep = cloud.mask & (knn_dist <= thresh)
    return PointCloud(
        jnp.where(keep[:, None], cloud.xyz, SENTINEL), cloud.intensity, keep
    )
