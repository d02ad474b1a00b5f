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
  the persistent edge/surf maps -> incremental map insert + crop — all
  traced once.
- a full sequence runs under `lax.scan` with zero host syncs.

The world maps ARE the k-NN cell tables, maintained incrementally
(`ops/knn.insert_cell_table`): the per-scan rebuild + full-map merge sort of
rounds 2-3 paid map-cap-sized sorts and scatters every scan even though each
map changes by ONE bounded feature batch (~4-8k points). Queries only ever
saw the table's `slots` points per cell, so storing ONLY those loses nothing
query-visible; insertion costs one batch-sized sort + gather + scatter and
crop is one elementwise pass.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from lv_slam_tpu.config import LfaConfig
from lv_slam_tpu.core import se3
from lv_slam_tpu.core.cloud import PointCloud
from lv_slam_tpu.lfa import registration as reg
from lv_slam_tpu.lfa.features import FeatureClouds, extract_features
from lv_slam_tpu.ops.knn import (
    CellTable,
    KnnGrid,
    build_grid,
    crop_cell_table,
    empty_cell_table,
    insert_cell_table,
)


class LfaFusedState(NamedTuple):
    prev_edge_grid: KnnGrid
    prev_surf_grid: KnnGrid
    odom_pose: jax.Array    # (4,4) accumulated scan-to-scan odometry
    last_rel: jax.Array     # (4,4) constant-velocity warm start
    edge_table: CellTable   # persistent world edge-feature map (k-NN table)
    surf_table: CellTable   # persistent world surf-feature map
    map_pose: jax.Array     # (4,4) refined world pose (aft_mapped)
    last_odom: jax.Array    # (4,4) odometry pose of the previous scan
    scan_idx: jax.Array     # () int32
    crop_center: jax.Array  # (3,) pose of the last table crop


def _extract(xyz, mask, cfg: LfaConfig) -> FeatureClouds:
    return extract_features(PointCloud(xyz, jnp.zeros(xyz.shape[0]), mask), cfg)


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

    def _insert_and_crop(state_edge, state_surf, feats, pose, crop_center):
        """Insert this scan's world-frame features; crop both tables only
        once the pose has moved `cfg.crop_interval` from the last crop (the
        crop is a full table sweep — ~3 ms/scan for both maps on v5e — and
        is query-invisible between intervals; see config.crop_interval).
        Returns (edge_table, surf_table, new_crop_center)."""
        edge_w = se3.transform_points(pose, feats.less_sharp)
        surf_w = se3.transform_points(pose, feats.less_flat)
        edge_table = insert_cell_table(
            state_edge, edge_w, feats.less_sharp_mask, cfg.mapping_line_resolution
        )
        surf_table = insert_cell_table(
            state_surf, surf_w, feats.less_flat_mask, cfg.mapping_plane_resolution
        )
        center = pose[:3, 3]
        if cfg.crop_interval <= 0.0:
            return (
                crop_cell_table(edge_table, center, crop_radius),
                crop_cell_table(surf_table, center, crop_radius),
                center,
            )
        moved2 = jnp.sum((center - crop_center) ** 2)

        def crop_both(tabs):
            e, s = tabs
            return (
                crop_cell_table(e, center, crop_radius),
                crop_cell_table(s, center, crop_radius),
                center,
            )

        def keep(tabs):
            e, s = tabs
            return e, s, crop_center

        return jax.lax.cond(
            moved2 > jnp.float32(cfg.crop_interval) ** 2,
            crop_both, keep, (edge_table, surf_table),
        )

    def init_state(xyz, mask, odom0) -> LfaFusedState:
        feats = _extract(xyz, mask, cfg)
        pose0 = jnp.asarray(odom0, jnp.float32)
        edge_table = empty_cell_table(
            _n_buckets(cfg, cfg.map_edge_cap), cfg.knn_slots, grid_cell
        )
        surf_table = empty_cell_table(
            _n_buckets(cfg, cfg.map_planar_cap), cfg.knn_slots, grid_cell
        )
        edge_table, surf_table, crop_center = _insert_and_crop(
            edge_table, surf_table, feats, pose0, pose0[:3, 3] + 1e6
        )
        return LfaFusedState(
            prev_edge_grid=build_grid(feats.less_sharp, feats.less_sharp_mask, grid_cell),
            prev_surf_grid=build_grid(feats.less_flat, feats.less_flat_mask, grid_cell),
            odom_pose=pose0,
            last_rel=jnp.eye(4, dtype=jnp.float32),
            edge_table=edge_table,
            surf_table=surf_table,
            map_pose=pose0,
            last_odom=pose0,
            scan_idx=jnp.int32(1),
            crop_center=crop_center,
        )

    # A-LOAM's laserMapping DROPS frames (skipFrameNum throttles what the
    # odometry stage forwards; the mapping main loop additionally keeps only
    # the latest queued frame when it falls behind) and the high-frequency
    # output composes the raw odometry onto the last map correction
    # (aft_mapped_to_init_high_frec). stride > 1 replicates that: only every
    # stride-th scan runs the scan-to-map GN + map insert; skipped scans
    # output `map_pose ∘ (last_mapped_odom⁻¹ ∘ odom)` and leave the maps
    # untouched. Under lax.scan the cond executes only the taken branch
    # (measured — see CLAUDE.md), so a skipped scan costs ~nothing: in the
    # external-odom (dlo_lfa) coupling even feature extraction moves inside
    # the mapped branch.
    # (standalone feature odometry extracts features every scan regardless —
    # the s2s solve needs them — so the fused stride applies only to the
    # external-odom coupling; the host driver `lfa/mapping.py` throttles its
    # own way)
    stride = max(1, int(cfg.mapping_skip_frame))

    def step(state: LfaFusedState, xyz, mask, ext_odom):
        if external_odom and stride > 1:
            odom = jnp.asarray(ext_odom, jnp.float32)
            rel_map = se3.inverse(state.last_odom) @ odom
            guess = state.map_pose @ rel_map
            do_map = (state.scan_idx % stride) == 0

            def mapped():
                feats = _extract(xyz, mask, cfg)
                t = guess
                for _ in range(cfg.mapping_corr_rounds):
                    ye = se3.transform_points(t, feats.less_sharp)
                    lines = reg.lines_from_fit(
                        ye, feats.less_sharp_mask, state.edge_table, k=cfg.knn_k
                    )
                    ys = se3.transform_points(t, feats.less_flat)
                    planes = reg.planes_from_fit(
                        ys, feats.less_flat_mask, state.surf_table, k=cfg.knn_k
                    )
                    t2 = reg.gn_solve(
                        t, feats.less_sharp, lines, feats.less_flat, planes,
                        cfg.mapping_max_iterations,
                    )
                    t = t2
                refined = se3.orthonormalize(t)
                et, st_, cc = _insert_and_crop(
                    state.edge_table, state.surf_table, feats, refined,
                    state.crop_center,
                )
                return et, st_, refined, odom, refined, cc

            def skipped():
                return (
                    state.edge_table, state.surf_table,
                    state.map_pose, state.last_odom, guess, state.crop_center,
                )

            edge_table, surf_table, map_pose, last_odom, out, crop_center = (
                jax.lax.cond(do_map, mapped, skipped)
            )
            new_state = LfaFusedState(
                prev_edge_grid=state.prev_edge_grid,
                prev_surf_grid=state.prev_surf_grid,
                odom_pose=odom,
                last_rel=state.last_rel,
                edge_table=edge_table,
                surf_table=surf_table,
                map_pose=map_pose,
                last_odom=last_odom,
                scan_idx=state.scan_idx + 1,
                crop_center=crop_center,
            )
            return new_state, out

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
        # queries hit the PERSISTENT cell tables directly (cell 2.0 covers
        # the 1.0 m fit gates with the 8-cell probe — one gather per query
        # batch, zero per-scan build cost).
        rel_map = se3.inverse(state.last_odom) @ odom
        guess = state.map_pose @ rel_map
        t = guess
        for _ in range(cfg.mapping_corr_rounds):
            ye = se3.transform_points(t, feats.less_sharp)
            lines = reg.lines_from_fit(ye, feats.less_sharp_mask, state.edge_table, k=cfg.knn_k)
            ys = se3.transform_points(t, feats.less_flat)
            planes = reg.planes_from_fit(ys, feats.less_flat_mask, state.surf_table, k=cfg.knn_k)
            t = reg.gn_solve(t, feats.less_sharp, lines, feats.less_flat, planes, cfg.mapping_max_iterations)
        refined = se3.orthonormalize(t)

        edge_table, surf_table, crop_center = _insert_and_crop(
            state.edge_table, state.surf_table, feats, refined,
            state.crop_center,
        )

        new_state = LfaFusedState(
            prev_edge_grid=new_edge_grid,
            prev_surf_grid=new_surf_grid,
            odom_pose=odom,
            last_rel=new_last_rel,
            edge_table=edge_table,
            surf_table=surf_table,
            map_pose=refined,
            last_odom=odom,
            scan_idx=state.scan_idx + 1,
            crop_center=crop_center,
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
