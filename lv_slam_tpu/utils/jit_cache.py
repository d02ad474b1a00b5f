"""Process-level caches for jitted step functions.

Per-instance `jax.jit(lambda ...)` closures defeat JAX's python-level
executable cache: every new driver object retraces and re-queries the
compilation cache, which costs seconds per shape through a remote-TPU
compile service. All hot step functions are built here once per
configuration via `lru_cache`.
"""

from __future__ import annotations

import functools

import jax

from lv_slam_tpu.ops.ndt_soa import ndt_align_soa as ndt_align  # fast path
from lv_slam_tpu.ops.prefilter import voxel_downsample
from lv_slam_tpu.ops.voxel_map import build_voxel_map


@functools.lru_cache(maxsize=32)
def downsample_fn(resolution: float, out_cap: int):
    return jax.jit(lambda c: voxel_downsample(c, resolution, out_cap))


@functools.lru_cache(maxsize=8)
def transform_cloud_fn():
    return jax.jit(lambda c, t: c.transformed(t))


@functools.lru_cache(maxsize=8)
def prefilter_chunk_fn(cfg):
    """Batched prefilter over a (B, cap) chunk of scans (cfg is the frozen
    PrefilterConfig, static under jit). Convenience API for host drivers;
    the fused drivers no longer use it — they take the `/filtered_points`
    product straight from the odometry program
    (`odometry/fused.run_sequence_fused(return_filtered=True)`)."""
    from lv_slam_tpu.ops.prefilter import prefilter

    return jax.jit(jax.vmap(lambda c: prefilter(c, cfg)))


@functools.lru_cache(maxsize=32)
def window_flush_fn(resolution: float, out_cap: int):
    """Motion-compose a whole keyframe window and voxel-downsample it in ONE
    device program: tuples of per-scan (cap,3)/(cap,) arrays + (W,4,4)
    window-relative transforms -> downsampled PointCloud. Stacking happens
    inside the jit so each keyframe costs exactly one dispatch through the
    remote-TPU relay."""
    import jax.numpy as jnp

    from lv_slam_tpu.core.cloud import SENTINEL, PointCloud

    @jax.jit
    def run(xyzs, intens, masks, rels):
        xyz = jnp.stack(xyzs)
        inten = jnp.stack(intens)
        mask = jnp.stack(masks)
        moved = (
            jnp.einsum("wij,wnj->wni", rels[:, :3, :3], xyz)
            + rels[:, None, :3, 3]
        )
        moved = jnp.where(mask[..., None], moved, SENTINEL)
        cloud = PointCloud(
            moved.reshape(-1, 3), inten.reshape(-1), mask.reshape(-1)
        )
        # parts arrive already voxel-centroided at this resolution (the
        # prefilter), so cross-part dedup-first == VoxelGrid to within the
        # voxel radius — at ~1/3 the cost of a full re-centroid
        from lv_slam_tpu.ops.prefilter import voxel_dedup_first

        return voxel_dedup_first(cloud, resolution, out_cap)

    return run


@functools.lru_cache(maxsize=64)
def window_group_fn(near: float, far: float, resolution: float, out_cap: int,
                    length: int):
    """Keyframe-window group program: `length` consecutive RAW scans of a
    stacked (C, cap) chunk -> ONE distance-filtered, motion-composed,
    voxel-centroided partial cloud, in a single dispatch.

    This replaces the per-scan backend feed (3 device slice ops per scan
    cost ~50 ms each through the remote relay) AND the separate
    `/filtered_points` chunk prefilter: the reference's prefilter semantics
    (distance band + VOXELGRID centroid, `prefiltering_nodelet.cpp:92-135`)
    are folded into the window composition (`global_graph_nodelet.cpp:
    237-244`). Centroiding the union of raw window points at the same
    resolution differs from per-scan centroid + dedup by at most the voxel
    radius.

    `length` is static (callers bucket to powers of two <= 16, bounding the
    (length, cap, 3) in-program intermediate, which the TPU tile-pads 42.7x
    on the minor dim); parts are selected by a leading-axis row gather so
    short trailing chunks need no dynamic_slice size games.
    """
    import jax.numpy as jnp

    from lv_slam_tpu.core.cloud import SENTINEL, PointCloud

    @jax.jit
    def run(chunk_xyz, chunk_inten, chunk_mask, start, rels, valid):
        c = chunk_xyz.shape[0]
        idx = jnp.clip(start + jnp.arange(length, dtype=jnp.int32), 0, c - 1)
        xyz = chunk_xyz[idx]          # (L, cap, 3) leading-axis row gather
        inten = chunk_inten[idx]
        mask = chunk_mask[idx] & valid[:, None]
        dist = jnp.linalg.norm(jnp.where(mask[..., None], xyz, 0.0), axis=-1)
        mask = mask & (dist > near) & (dist < far)
        moved = (
            jnp.einsum("wij,wnj->wni", rels[:, :3, :3], xyz)
            + rels[:, None, :3, 3]
        )
        moved = jnp.where(mask[..., None], moved, SENTINEL)
        cloud = PointCloud(
            moved.reshape(-1, 3), inten.reshape(-1), mask.reshape(-1)
        )
        from lv_slam_tpu.ops.prefilter import voxel_downsample

        return voxel_downsample(cloud, resolution, out_cap)

    return run


@functools.lru_cache(maxsize=64)
def window_group_filtered_fn(resolution: float, out_cap: int, length: int):
    """Keyframe-window group program over ALREADY-PREFILTERED scans.

    Inputs are the odometry program's `/filtered_points` product
    (`odometry/fused.run_sequence_fused(return_filtered=True)`): xyz stacked
    TRANSPOSED (C, 3, cap) so `cap` rides the minor dim (a (C, cap, 3)
    stack tile-pads 42.7x in HBM). Each scan is already distance-banded and
    voxel-centroided at `resolution`, so the union needs only motion-compose
    + dedup-first (== the reference's re-voxelization of the accumulated
    w_cloud, `global_graph_nodelet.cpp:213-217`, to within the voxel
    radius) — no second prefilter pass over raw rows.
    """
    import jax.numpy as jnp

    from lv_slam_tpu.core.cloud import SENTINEL, PointCloud

    @jax.jit
    def run(chunk_xyz_t, chunk_inten, chunk_mask, start, rels, valid):
        c = chunk_xyz_t.shape[0]
        idx = jnp.clip(start + jnp.arange(length, dtype=jnp.int32), 0, c - 1)
        xyz = jnp.swapaxes(chunk_xyz_t[idx], 1, 2)  # (L, cap, 3)
        inten = chunk_inten[idx]
        mask = chunk_mask[idx] & valid[:, None]
        moved = (
            jnp.einsum("wij,wnj->wni", rels[:, :3, :3], xyz)
            + rels[:, None, :3, 3]
        )
        moved = jnp.where(mask[..., None], moved, SENTINEL)
        cloud = PointCloud(
            moved.reshape(-1, 3), inten.reshape(-1), mask.reshape(-1)
        )
        from lv_slam_tpu.ops.prefilter import voxel_dedup_first

        return voxel_dedup_first(cloud, resolution, out_cap)

    return run


@functools.lru_cache(maxsize=32)
def build_cell_table_fn(cell_size: float, n_buckets: int, slots: int):
    """Jitted bucket-table k-NN builder (`ops/knn.build_cell_table`),
    shared across host-driver instances (per-instance jits re-query the
    remote compile cache — seconds per shape)."""
    from lv_slam_tpu.ops.knn import build_cell_table

    return jax.jit(functools.partial(
        build_cell_table, cell_size=cell_size, n_buckets=n_buckets, slots=slots,
    ))


@functools.lru_cache(maxsize=4)
def transform_points_fn():
    from lv_slam_tpu.core import se3

    return jax.jit(se3.transform_points)


@functools.lru_cache(maxsize=32)
def merge_partials_fn(resolution: float, out_cap: int, n_parts: int):
    """Merge `n_parts` already-centroided window partials (chunk-boundary
    case) into one keyframe cloud: concat + dedup-first at the shared
    resolution (partials are voxel-centroided, so dedup == re-centroid to
    within the voxel radius)."""
    import jax.numpy as jnp

    from lv_slam_tpu.core.cloud import PointCloud

    @jax.jit
    def run(xyzs, intens, masks):
        cloud = PointCloud(
            jnp.concatenate(xyzs), jnp.concatenate(intens), jnp.concatenate(masks)
        )
        from lv_slam_tpu.ops.prefilter import voxel_dedup_first

        return voxel_dedup_first(cloud, resolution, out_cap)

    return run


@functools.lru_cache(maxsize=32)
def build_map_fn(resolution: float, leaf_cap: int, lut_extent: int,
                 min_points_per_voxel: int = 6, min_covar_eigvalue_mult: float = 0.01,
                 weighted: bool = False):
    return jax.jit(
        functools.partial(
            build_voxel_map,
            resolution=resolution,
            leaf_cap=leaf_cap,
            lut_extent=lut_extent,
            min_points_per_voxel=min_points_per_voxel,
            min_covar_eigvalue_mult=min_covar_eigvalue_mult,
            weighted=weighted,
        )
    )


@functools.lru_cache(maxsize=32)
def ndt_score_fn(resolution: float, neighborhood: str = "DIRECT1", weighted: bool = True):
    """Weighted NDT score of a cloud at a fixed transform (for retry arbitration)."""
    from lv_slam_tpu.ops.ndt import make_gauss_params, ndt_derivatives
    from lv_slam_tpu.ops.voxel_map import neighborhood_offsets

    gauss = make_gauss_params(resolution)
    offsets = neighborhood_offsets(neighborhood)

    def score(vmap_, cloud, transform):
        s, _, _ = ndt_derivatives(
            vmap_, cloud.masked_xyz(), cloud.mask, transform, gauss, offsets, weighted
        )
        return s

    return jax.jit(score)


@functools.lru_cache(maxsize=32)
def ndt_align_fn(resolution: float, outlier_ratio: float = 0.55,
                 step_size: float = 0.1, transformation_epsilon: float = 0.01,
                 max_iterations: int = 35, neighborhood: str = "DIRECT7",
                 weighted: bool = False):
    return jax.jit(
        functools.partial(
            ndt_align,
            resolution=resolution,
            outlier_ratio=outlier_ratio,
            step_size=step_size,
            transformation_epsilon=transformation_epsilon,
            max_iterations=max_iterations,
            neighborhood=neighborhood,
            weighted=weighted,
        )
    )
