"""Device-resident LFA: feature odometry + mapping as ONE lax.scan program.

The reference's "lfa" stage is three external A-LOAM processes exchanging
ROS messages (`launch/dlo_lfa_ggo_kitti.launch:55-81`). The host-driver
rebuild (`lfa/pipeline.py`) already collapses them into one process but still
pays 3+ device dispatches per scan — dominant through a remote-TPU link.
This variant keeps the whole stage on device (same treatment as
`odometry/fused.py`):

- state = (previous scan's feature grids, odometry pose, world feature maps,
  refined pose) — every piece a fixed-capacity array.
- one scan step = range-image feature extraction -> scan-to-scan feature GN
  (or an externally supplied odometry pose: the `dlo_lfa` coupling, where
  the PCA-NDT odometry seeds the mapping stage) -> scan-to-map GN against
  the persistent edge/surf maps -> map merge + crop — all traced once.
- a full sequence runs under `lax.scan` with zero host syncs.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from lv_slam_tpu.config import LfaConfig
from lv_slam_tpu.core import se3
from lv_slam_tpu.core.cloud import SENTINEL, PointCloud
from lv_slam_tpu.lfa import registration as reg
from lv_slam_tpu.lfa.features import FeatureClouds, extract_features
from lv_slam_tpu.ops.knn import KnnGrid, build_cell_table, build_grid
from lv_slam_tpu.ops.prefilter import voxel_dedup_first


class LfaFusedState(NamedTuple):
    prev_edge_grid: KnnGrid
    prev_surf_grid: KnnGrid
    odom_pose: jax.Array    # (4,4) accumulated scan-to-scan odometry
    last_rel: jax.Array     # (4,4) constant-velocity warm start
    edge_map: jax.Array     # (Me,3) world edge features
    edge_mask: jax.Array    # (Me,)
    surf_map: jax.Array     # (Ms,3)
    surf_mask: jax.Array    # (Ms,)
    map_pose: jax.Array     # (4,4) refined world pose (aft_mapped)
    last_odom: jax.Array    # (4,4) odometry pose of the previous scan
    scan_idx: jax.Array     # () int32


def _extract(xyz, mask, cfg: LfaConfig) -> FeatureClouds:
    return extract_features(PointCloud(xyz, jnp.zeros(xyz.shape[0]), mask), cfg)


def _merge(map_xyz, map_mask, new_xyz, new_mask, resolution: float):
    # dedup-first (map points win over incoming duplicates): both sides are
    # already voxel-spaced at this resolution, so this matches A-LOAM's
    # re-voxelization to within the voxel radius at ~1/3 the cost
    cap = map_xyz.shape[0]
    xyz = jnp.concatenate([map_xyz, new_xyz], axis=0)
    mask = jnp.concatenate([map_mask, new_mask], axis=0)
    cloud = PointCloud(jnp.where(mask[:, None], xyz, SENTINEL), jnp.zeros(xyz.shape[0]), mask)
    out = voxel_dedup_first(cloud, resolution, cap)
    return out.xyz, out.mask


def _n_buckets(cfg: LfaConfig, cap: int) -> int:
    """Hash-table size from capacity x density (table memset+scatter cost
    scales with buckets*slots; occupied cells run ~cap/5, so density 1-2
    keeps collisions at a few percent)."""
    target = max(1, int(cfg.knn_table_density * cap))
    return 1 << max(12, min(18, (target - 1).bit_length()))


def make_lfa_fused(cfg: LfaConfig, external_odom: bool, crop_radius: float | None = None):
    """-> (init_state, step). `external_odom=True` is the dlo_lfa coupling:
    the caller supplies per-scan world odometry (from the PCA-NDT frontend)
    and the scan-to-scan feature solve is skipped; `False` is standalone LFA
    (A-LOAM's own alaserOdometry feeds alaserMapping)."""
    if crop_radius is None:
        crop_radius = cfg.crop_radius
    grid_cell = 2.0

    def init_state(xyz, mask, odom0) -> LfaFusedState:
        feats = _extract(xyz, mask, cfg)
        pose0 = jnp.asarray(odom0, jnp.float32)
        edge_w = se3.transform_points(pose0, feats.less_sharp)
        surf_w = se3.transform_points(pose0, feats.less_flat)
        edge_map = jnp.full((cfg.map_edge_cap, 3), SENTINEL, jnp.float32)
        edge_mask = jnp.zeros((cfg.map_edge_cap,), bool)
        surf_map = jnp.full((cfg.map_planar_cap, 3), SENTINEL, jnp.float32)
        surf_mask = jnp.zeros((cfg.map_planar_cap,), bool)
        edge_map, edge_mask = _merge(
            edge_map, edge_mask, edge_w, feats.less_sharp_mask, cfg.mapping_line_resolution
        )
        surf_map, surf_mask = _merge(
            surf_map, surf_mask, surf_w, feats.less_flat_mask, cfg.mapping_plane_resolution
        )
        return LfaFusedState(
            prev_edge_grid=build_grid(feats.less_sharp, feats.less_sharp_mask, grid_cell),
            prev_surf_grid=build_grid(feats.less_flat, feats.less_flat_mask, grid_cell),
            odom_pose=pose0,
            last_rel=jnp.eye(4, dtype=jnp.float32),
            edge_map=edge_map,
            edge_mask=edge_mask,
            surf_map=surf_map,
            surf_mask=surf_mask,
            map_pose=pose0,
            last_odom=pose0,
            scan_idx=jnp.int32(1),
        )

    def step(state: LfaFusedState, xyz, mask, ext_odom):
        feats = _extract(xyz, mask, cfg)

        if external_odom:
            odom = jnp.asarray(ext_odom, jnp.float32)
            new_edge_grid = state.prev_edge_grid
            new_surf_grid = state.prev_surf_grid
            new_last_rel = state.last_rel
        else:
            t = state.last_rel
            for _ in range(cfg.odom_corr_rounds):  # A-LOAM re-associates twice
                ye = se3.transform_points(t, feats.sharp)
                lines = reg.lines_from_2nn(ye, feats.sharp_mask, state.prev_edge_grid)
                ys = se3.transform_points(t, feats.flat)
                planes = reg.planes_from_3nn(ys, feats.flat_mask, state.prev_surf_grid)
                t = reg.gn_solve(t, feats.sharp, lines, feats.flat, planes, cfg.odom_max_iterations // 2)
            rel = se3.orthonormalize(t)
            odom = state.odom_pose @ rel
            new_edge_grid = build_grid(feats.less_sharp, feats.less_sharp_mask, grid_cell)
            new_surf_grid = build_grid(feats.less_flat, feats.less_flat_mask, grid_cell)
            new_last_rel = rel

        # scan-to-map: seed = previous refined pose composed with the
        # odometry increment (A-LOAM's transformAssociateToMap). Map k-NN
        # uses the bucket-table (cell 2.0 covers the 1.0 m fit gates with
        # the 8-cell probe — one gather per query batch).
        rel_map = se3.inverse(state.last_odom) @ odom
        guess = state.map_pose @ rel_map
        edge_grid = build_cell_table(
            state.edge_map, state.edge_mask, 2.0,
            n_buckets=_n_buckets(cfg, cfg.map_edge_cap), slots=cfg.knn_slots,
        )
        surf_grid = build_cell_table(
            state.surf_map, state.surf_mask, 2.0,
            n_buckets=_n_buckets(cfg, cfg.map_planar_cap), slots=cfg.knn_slots,
        )
        t = guess
        for _ in range(cfg.mapping_corr_rounds):
            ye = se3.transform_points(t, feats.less_sharp)
            lines = reg.lines_from_fit(ye, feats.less_sharp_mask, edge_grid, k=cfg.knn_k)
            ys = se3.transform_points(t, feats.less_flat)
            planes = reg.planes_from_fit(ys, feats.less_flat_mask, surf_grid, k=cfg.knn_k)
            t = reg.gn_solve(t, feats.less_sharp, lines, feats.less_flat, planes, cfg.mapping_max_iterations)
        refined = se3.orthonormalize(t)

        edge_w = se3.transform_points(refined, feats.less_sharp)
        surf_w = se3.transform_points(refined, feats.less_flat)
        edge_map, edge_mask = _merge(
            state.edge_map, state.edge_mask, edge_w, feats.less_sharp_mask,
            cfg.mapping_line_resolution,
        )
        surf_map, surf_mask = _merge(
            state.surf_map, state.surf_mask, surf_w, feats.less_flat_mask,
            cfg.mapping_plane_resolution,
        )
        center = refined[:3, 3]
        keep_e = edge_mask & (jnp.linalg.norm(edge_map - center, axis=1) < crop_radius)
        edge_map = jnp.where(keep_e[:, None], edge_map, SENTINEL)
        keep_s = surf_mask & (jnp.linalg.norm(surf_map - center, axis=1) < crop_radius)
        surf_map = jnp.where(keep_s[:, None], surf_map, SENTINEL)

        new_state = LfaFusedState(
            prev_edge_grid=new_edge_grid,
            prev_surf_grid=new_surf_grid,
            odom_pose=odom,
            last_rel=new_last_rel,
            edge_map=edge_map,
            edge_mask=keep_e,
            surf_map=surf_map,
            surf_mask=keep_s,
            map_pose=refined,
            last_odom=odom,
            scan_idx=state.scan_idx + 1,
        )
        return new_state, refined

    return init_state, step


@functools.lru_cache(maxsize=8)
def _jitted_lfa_scan(cfg: LfaConfig, external_odom: bool, crop_radius: float):
    init_state, step = make_lfa_fused(cfg, external_odom, crop_radius)

    @jax.jit
    def run(xyz, mask, odom_poses):
        state0 = init_state(xyz[0], mask[0], odom_poses[0])

        def body(state, inputs):
            x, m, o = inputs
            st, refined = step(state, x, m, o)
            return st, refined

        state, poses = jax.lax.scan(body, state0, (xyz[1:], mask[1:], odom_poses[1:]))
        return state, jnp.concatenate([odom_poses[:1], poses], axis=0)

    return run


@functools.lru_cache(maxsize=8)
def _jitted_lfa_cont(cfg: LfaConfig, external_odom: bool, crop_radius: float):
    """Continuation program: every scan is a refinement step (chunk 2+)."""
    _, step = make_lfa_fused(cfg, external_odom, crop_radius)

    @jax.jit
    def run(state0, xyz, mask, odom_poses):
        def body(state, inputs):
            x, m, o = inputs
            st, refined = step(state, x, m, o)
            return st, refined

        return jax.lax.scan(body, state0, (xyz, mask, odom_poses))

    return run


def run_sequence_lfa(
    xyz: jax.Array,
    mask: jax.Array,
    cfg: LfaConfig,
    odom_poses: jax.Array | None = None,
    crop_radius: float | None = None,
    init_state: LfaFusedState | None = None,
    return_state: bool = False,
):
    """(N,cap,3),(N,cap)[,(N,4,4) dlo odometry] -> (N,4,4) refined poses.

    One lax.scan program for the whole sequence. With `odom_poses` the stage
    runs in dlo_lfa mode (mapping refinement seeded by the NDT odometry —
    the flagship topology); without, standalone feature odometry drives it.

    Long sequences chunk like `run_sequence_fused`: pass `return_state=True`
    and thread the state into the next chunk's `init_state`.
    """
    external = odom_poses is not None
    if crop_radius is None:
        crop_radius = cfg.crop_radius
    if odom_poses is None:
        n = xyz.shape[0]
        odom_poses = jnp.tile(jnp.eye(4, dtype=jnp.float32), (n, 1, 1))
    if init_state is None:
        state, poses = _jitted_lfa_scan(cfg, external, crop_radius)(xyz, mask, odom_poses)
    else:
        state, poses = _jitted_lfa_cont(cfg, external, crop_radius)(
            init_state, xyz, mask, odom_poses
        )
    return (poses, state) if return_state else poses
