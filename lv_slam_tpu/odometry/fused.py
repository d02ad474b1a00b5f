"""Device-resident DLO: the whole scan-in/pose-out loop as one XLA program.

The host-driven `DirectLidarOdometry` pays per-scan host<->device round
trips (pose readback, keyframe decision, map-rebuild dispatch) — negligible
locally, but dominant through a remote-TPU link. This variant keeps the
entire odometry state machine on device:

- state = (keyframe voxel map, key_pose, tf_s2k, pre_tf, guess, stamp)
- one scan step = prefilter -> NDT align (+ the reference's double-align of
  scan 1) -> keyframe gate -> `lax.cond` map rebuild — all traced once
- a full sequence runs under `lax.scan` with zero host syncs; only the
  (N,4,4) pose array comes back.

This realizes BASELINE.json's north star ("the whole scan-in/pose-out loop
resident on TPU").
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from lv_slam_tpu.config import OdometryConfig, PrefilterConfig
from lv_slam_tpu.core import se3
from lv_slam_tpu.core.cloud import PointCloud
from lv_slam_tpu.ops.ndt_soa import ndt_align_soa as ndt_align
from lv_slam_tpu.ops.prefilter import (
    distance_filter,
    stride_subsample,
    uniform_subsample,
    voxel_dedup_first,
    voxel_downsample,
)
from lv_slam_tpu.ops.voxel_map import VoxelMap, build_voxel_map


class FusedState(NamedTuple):
    key_map: VoxelMap          # VoxelMap (lut mode) or ndt_hash.HashVoxelMap
    key_pose: jax.Array        # (4,4)
    tf_s2k: jax.Array          # (4,4)
    pre_tf_s2k: jax.Array      # (4,4)
    guess: jax.Array           # (4,4)
    keyframe_stamp: jax.Array  # ()
    scan_idx: jax.Array        # () int32


def _prefilter_mid(
    cloud: PointCloud, cfg: PrefilterConfig, stride_consumer: bool = False
) -> PointCloud:
    """The `/filtered_points` product: distance band + voxel centroid.

    `stride_consumer=True` (the caller subsamples with `stride_subsample`,
    which needs no front-compaction) skips the NONE branch's compact when
    the capacity already fits: at the flagship 0.1 m resolution nearly every
    voxel holds ONE KITTI return, so VOXELGRID/DEDUP are near-pass-throughs
    and NONE+stride is the zero-sort prefilter — an elementwise distance
    mask and a strided slice are its only ops (every other method pays at
    least one 131k-lane multi-operand sort per scan). Downstream consumers
    are mask-aware: the NDT map build sorts masked lanes itself and the
    keyframe window program (`jit_cache.window_group_filtered_fn`) dedups
    masked unions. NOTE the NONE+stride `/filtered_points` product keeps the
    RAW cap (holes, never voxel-downsampled): window unions then dedup at
    raw density, so `keyframe_cloud_cap` needs headroom (the dedup compact
    truncates voxel-key-sorted, i.e. spatially biased, on overflow)."""
    out = cloud
    if cfg.use_distance_filter:
        out = distance_filter(out, cfg.distance_near_thresh, cfg.distance_far_thresh)
    if cfg.downsample_method.upper() in ("VOXELGRID", "APPROX_VOXELGRID"):
        out = voxel_downsample(
            out, cfg.downsample_resolution, cfg.out_cap, cfg.downsample_method,
            reduce=cfg.voxel_reduce,
        )
    elif cfg.downsample_method.upper() == "DEDUP":
        out = voxel_dedup_first(out, cfg.downsample_resolution, cfg.out_cap)
    elif stride_consumer and cfg.out_cap >= out.cap:
        pass  # holes tolerated: stride_subsample slices lanes, mask and all
    else:
        # distance_filter only clears mask bits; uniform_subsample downstream
        # requires a front-compacted cloud (matches ops/prefilter.prefilter)
        out = out.compact(cfg.out_cap)
    return out


def _stride_active(subsample_method: str, scan_matching_cap: int, cloud_cap: int) -> bool:
    """True only when the stride subsample will actually be applied to the
    (possibly skip-compacted) product: with the compact skipped the mid cloud
    keeps `cloud_cap`, so the same cap bounds both decisions. Guards the
    NONE+stride compact-skip from firing when `scan_matching_cap` is 0 or
    >= cap — the NDT map would silently build from a never-downsampled
    cloud (advisor r4)."""
    return (
        subsample_method == "stride"
        and scan_matching_cap > 0
        and scan_matching_cap < cloud_cap
    )


def _prefilter(
    cloud: PointCloud,
    cfg: PrefilterConfig,
    scan_matching_cap: int = 0,
    subsample_method: str = "gather",
) -> PointCloud:
    out = _prefilter_mid(
        cloud, cfg,
        stride_consumer=_stride_active(subsample_method, scan_matching_cap, cloud.cap),
    )
    if scan_matching_cap and scan_matching_cap < out.cap:
        # bounded-lane scan matching (OdometryConfig.scan_matching_cap)
        if subsample_method == "stride":
            out = stride_subsample(out, scan_matching_cap)
        else:
            out = uniform_subsample(out, scan_matching_cap)
    return out


@functools.lru_cache(maxsize=16)
def _jitted_step_cache(cfg: OdometryConfig, prefilter_cfg: PrefilterConfig | None):
    init_state, step = make_fused_step(cfg, prefilter_cfg)
    return jax.jit(init_state), jax.jit(step, donate_argnums=0)


def _make_ops(cfg: OdometryConfig, prefilter_cfg: PrefilterConfig | None):
    """Shared closures (map build, align, retry align, score) for the
    per-sequence step and the batched fleet step."""
    ndt = cfg.ndt
    use_hash = ndt.table.lower() == "hash"

    build = functools.partial(
        build_voxel_map,
        resolution=ndt.resolution,
        leaf_cap=ndt.leaf_cap,
        lut_extent=ndt.lut_extent,
        min_points_per_voxel=ndt.min_points_per_voxel,
        min_covar_eigvalue_mult=ndt.min_covar_eigvalue_mult,
        weighted=ndt.weighted,
    )
    if use_hash:
        # the keyframe map lives in fused state as the hash table itself:
        # `to_hash` is paid once per keyframe rebuild (and the dense LUT is
        # never consumed, so XLA dead-code-eliminates its scatter)
        from lv_slam_tpu.ops.ndt_hash import ndt_align_hash_table

        align_fn = ndt_align_hash_table
    else:
        align_fn = ndt_align
    align = functools.partial(
        align_fn,
        resolution=ndt.resolution,
        outlier_ratio=ndt.outlier_ratio,
        step_size=ndt.step_size,
        transformation_epsilon=ndt.transformation_epsilon,
        max_iterations=ndt.max_iterations,
        neighborhood=ndt.neighborhood,
        weighted=ndt.weighted,
        coarse_subsample=ndt.coarse_subsample,
    )
    align_retry = functools.partial(
        align_fn,
        resolution=ndt.resolution,
        outlier_ratio=ndt.outlier_ratio,
        step_size=ndt.step_size,
        transformation_epsilon=ndt.transformation_epsilon,
        max_iterations=ndt.max_iterations,
        neighborhood=ndt.retry_neighborhood,
        weighted=ndt.weighted,
    )
    from lv_slam_tpu.ops.ndt import make_gauss_params
    from lv_slam_tpu.ops.ndt_hash import ndt_derivatives_hash, to_hash
    from lv_slam_tpu.ops.ndt_soa import ndt_derivatives_soa, to_soa
    from lv_slam_tpu.ops.voxel_map import neighborhood_offsets

    _gauss = make_gauss_params(ndt.resolution, ndt.outlier_ratio)
    _offs = neighborhood_offsets(ndt.neighborhood)

    if use_hash:
        base_build = build

        def build(cloud):  # noqa: F811 — hash-mode map builder
            return to_hash(base_build(cloud), ndt.hash_buckets_per_leaf)

    def score_at(key_map, cloud, transform):
        if use_hash:
            s, _, _ = ndt_derivatives_hash(
                key_map, cloud.masked_xyz().T, cloud.mask, transform,
                _gauss, _offs, ndt.weighted,
            )
        else:
            s, _, _ = ndt_derivatives_soa(
                to_soa(key_map), cloud.masked_xyz().T, cloud.mask, transform,
                _gauss, _offs, ndt.weighted,
            )
        return s

    return build, align, align_retry, score_at


def make_fused_step(
    cfg: OdometryConfig,
    prefilter_cfg: PrefilterConfig | None,
    emit_filtered: bool = False,
):
    """`emit_filtered=True` additionally outputs each scan's prefiltered
    cloud (distance band + voxel centroid, BEFORE the scan-matching
    subsample) as `(xyz (3,out_cap), intensity (out_cap,), mask (out_cap,))`
    — the `/filtered_points` product the reference's prefiltering nodelet
    publishes to the backend (`prefiltering_nodelet.cpp:92-135`). The xyz
    rides TRANSPOSED so the stacked (N,3,cap) scan output keeps `cap` on
    the minor dim (a (N,cap,3) stack is tile-padded 42.7x in HBM)."""
    ndt = cfg.ndt
    build, align, align_retry, score_at = _make_ops(cfg, prefilter_cfg)

    def init_state(cloud: PointCloud, stamp) -> FusedState:
        filtered = (
            _prefilter(cloud, prefilter_cfg, cfg.scan_matching_cap, cfg.subsample_method)
            if prefilter_cfg else cloud
        )
        eye = jnp.eye(4, dtype=jnp.float32)
        guess = eye.at[0, 3].set(cfg.initial_guess_x)
        return FusedState(
            key_map=build(filtered),
            key_pose=eye,
            tf_s2k=eye,
            pre_tf_s2k=eye,
            guess=guess,
            keyframe_stamp=jnp.float32(stamp),
            scan_idx=jnp.int32(1),
        )

    def step(state: FusedState, cloud: PointCloud, stamp) -> Tuple[FusedState, jax.Array]:
        if prefilter_cfg is not None:
            mid = _prefilter_mid(
                cloud, prefilter_cfg,
                stride_consumer=_stride_active(
                    cfg.subsample_method, cfg.scan_matching_cap, cloud.cap
                ),
            )
            if cfg.scan_matching_cap and cfg.scan_matching_cap < mid.cap:
                sub = stride_subsample if cfg.subsample_method == "stride" else uniform_subsample
                filtered = sub(mid, cfg.scan_matching_cap)
            else:
                filtered = mid
        else:
            mid = filtered = cloud
        result = align(state.key_map, filtered, state.guess)
        # the reference aligns scan 1 twice, re-seeded (:223-227); only pay
        # for it on scan 1
        tf_s2k = jax.lax.cond(
            state.scan_idx == 1,
            lambda: align(state.key_map, filtered, result.transform).transform,
            lambda: result.transform,
        )
        if ndt.retry_deviation_thresh > 0:
            # deviation-triggered wide-basin retry (NDTConfig.retry_*)
            dev = jnp.linalg.norm(tf_s2k[:3, 3] - state.guess[:3, 3])

            def retry():
                r = align_retry(state.key_map, filtered, state.guess)
                s_retry = score_at(state.key_map, filtered, r.transform)
                return jnp.where(s_retry > result.score, r.transform, tf_s2k)

            tf_s2k = jax.lax.cond(
                dev > ndt.retry_deviation_thresh, retry, lambda: tf_s2k
            )
        # float32 feedback loops amplify orthonormality defect ~3x/scan;
        # re-project onto SE(3) before composing the warm start
        tf_s2k = se3.orthonormalize(tf_s2k)

        tf_s2s = se3.inverse(state.pre_tf_s2k) @ tf_s2k
        odom = state.key_pose @ tf_s2k

        dx = jnp.linalg.norm(tf_s2k[:3, 3])
        da = se3.rotation_angle(tf_s2k[:3, :3])
        dt = jnp.float32(stamp) - state.keyframe_stamp
        switch = (
            (dx > cfg.keyframe_delta_trans)
            | (da > cfg.keyframe_delta_angle)
            | (dt > cfg.keyframe_delta_time)
        )

        new_map = jax.lax.cond(
            switch,
            lambda c: build(c),
            lambda c: state.key_map,
            filtered,
        )
        eye = jnp.eye(4, dtype=jnp.float32)
        key_pose = jnp.where(switch, odom, state.key_pose)
        tf_after = jnp.where(switch, eye, tf_s2k)
        new_state = FusedState(
            key_map=new_map,
            key_pose=key_pose,
            tf_s2k=tf_after,
            pre_tf_s2k=tf_after,
            guess=tf_after @ tf_s2s,
            keyframe_stamp=jnp.where(switch, jnp.float32(stamp), state.keyframe_stamp),
            scan_idx=state.scan_idx + 1,
        )
        out = (odom, result.iterations, switch)
        if emit_filtered:
            out = out + ((mid.xyz.T, mid.intensity, mid.mask),)
        return new_state, out

    return init_state, step


def run_sequence_fused(
    xyz: jax.Array,
    mask: jax.Array,
    stamps: jax.Array,
    cfg: OdometryConfig,
    prefilter_cfg: PrefilterConfig | None = None,
    with_stats: bool = False,
    use_scan: bool = True,
    init_state: FusedState | None = None,
    return_state: bool = False,
    inten: jax.Array | None = None,
    return_filtered: bool = False,
):
    """(N,cap,3), (N,cap), (N,) -> (N,4,4) poses.

    `use_scan=True`: the whole sequence is ONE `lax.scan` program — zero
    host round trips (the remote-TPU relay costs ~30 ms per dispatch/fetch).
    `use_scan=False`: one donated jitted step per scan (the incremental API;
    same math). Historical note: lax.scan was initially ~30x slower because
    the keyframe-rebuild conditional executed an iterative `eigh` in both
    branches; the analytic 3x3 eigensolver removed that wall.

    Chunked sequences (long KITTI runs that should not materialize as one
    (N,cap,3) array): pass `return_state=True` and feed the returned state
    back as `init_state` for the next chunk — with `init_state` set, ALL N
    scans are odometry steps (no scan-0 map init) and chunked results equal
    the unchunked run exactly.

    `return_filtered=True` (scan path only) additionally returns the
    per-scan `/filtered_points` clouds as `(xyz (N,3,out_cap), intensity
    (N,out_cap), mask (N,out_cap))` — the prefilter product the backend
    consumes, computed once inside the odometry program instead of by a
    second pass (see `make_fused_step`). Pass `inten` to carry real
    intensities through (defaults to zeros).
    """
    if return_filtered and not use_scan:
        raise ValueError("return_filtered requires the lax.scan path")
    if return_filtered and prefilter_cfg is None:
        raise ValueError("return_filtered requires a prefilter_cfg")
    if not use_scan:
        jinit, jstep = _jitted_step_cache(cfg, prefilter_cfg)
        n, cap = xyz.shape[0], xyz.shape[1]
        zeros_i = jnp.zeros((cap,), jnp.float32)
        if init_state is None:
            state = jinit(PointCloud(xyz[0], zeros_i, mask[0]), stamps[0])
            poses = [jnp.eye(4, dtype=jnp.float32)]
            iters = [jnp.int32(0)]
            switches = [jnp.bool_(False)]
            start = 1
        else:
            state = init_state
            poses, iters, switches = [], [], []
            start = 0
        for i in range(start, n):
            cloud = PointCloud(xyz[i], zeros_i, mask[i])
            state, (pose, it, sw) = jstep(state, cloud, stamps[i])
            poses.append(pose)
            iters.append(it)
            switches.append(sw)
        out_poses = jnp.stack(poses)
        out = (out_poses, jnp.stack(iters), jnp.stack(switches)) if with_stats else out_poses
        return (out, state) if return_state else out

    if inten is None:
        inten = jnp.zeros(xyz.shape[:2], jnp.float32)
    if init_state is None:
        run = _jitted_scan_cache(cfg, prefilter_cfg, return_filtered)
        state, outs = run(xyz, mask, stamps, inten)
        poses, iters, switches = outs[:3]
        eye = jnp.eye(4, dtype=jnp.float32)[None]
        out_poses = jnp.concatenate([eye, poses], axis=0)
        iters = jnp.concatenate([jnp.zeros(1, jnp.int32), iters])
        switches = jnp.concatenate([jnp.zeros(1, bool), switches])
        filtered = outs[3] if return_filtered else None
    else:
        run = _jitted_scan_cont_cache(cfg, prefilter_cfg, return_filtered)
        state, outs = run(init_state, xyz, mask, stamps, inten)
        out_poses, iters, switches = outs[:3]
        filtered = outs[3] if return_filtered else None
    out = (out_poses, iters, switches) if with_stats else out_poses
    if return_filtered:
        out = (out, filtered) if not isinstance(out, tuple) else out + (filtered,)
    return (out, state) if return_state else out


@functools.lru_cache(maxsize=16)
def _jitted_scan_cache(
    cfg: OdometryConfig, prefilter_cfg: PrefilterConfig | None,
    emit_filtered: bool = False,
):
    init_state, step = make_fused_step(cfg, prefilter_cfg, emit_filtered)

    @jax.jit
    def run(xyz, mask, stamps, inten):
        cloud0 = PointCloud(xyz[0], inten[0], mask[0])
        state0 = init_state(cloud0, stamps[0])

        def body(state, inputs):
            x, m, t, i = inputs
            st, out = step(state, PointCloud(x, i, m), t)
            return st, out

        state, outs = jax.lax.scan(
            body, state0, (xyz[1:], mask[1:], stamps[1:], inten[1:])
        )
        if emit_filtered:
            # scan 0 has no step output; prepend its /filtered_points product
            mid0 = _prefilter_mid(
                cloud0, prefilter_cfg,
                stride_consumer=_stride_active(
                    cfg.subsample_method, cfg.scan_matching_cap, cloud0.cap
                ),
            )
            fx, fi, fm = outs[3]
            outs = outs[:3] + ((
                jnp.concatenate([mid0.xyz.T[None], fx], axis=0),
                jnp.concatenate([mid0.intensity[None], fi], axis=0),
                jnp.concatenate([mid0.mask[None], fm], axis=0),
            ),)
        return state, outs

    return run


@functools.lru_cache(maxsize=16)
def _jitted_scan_cont_cache(
    cfg: OdometryConfig, prefilter_cfg: PrefilterConfig | None,
    emit_filtered: bool = False,
):
    """Continuation program: every scan is an odometry step (chunk 2+)."""
    _, step = make_fused_step(cfg, prefilter_cfg, emit_filtered)

    @jax.jit
    def run(state0, xyz, mask, stamps, inten):
        def body(state, inputs):
            x, m, t, i = inputs
            st, out = step(state, PointCloud(x, i, m), t)
            return st, out

        return jax.lax.scan(body, state0, (xyz, mask, stamps, inten))

    return run

