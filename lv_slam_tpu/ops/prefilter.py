"""Scan prefiltering: distance band, voxel downsampling, outlier removal.

Behavioral rebuild of `src/lidar_odometry/prefiltering_nodelet.cpp`:
- distance band-pass keeps `near < |p| < far` (:163-181)
- VOXELGRID downsample = per-voxel centroid; APPROX_VOXELGRID = cell center
  (:43-59). Implemented with one sort + segment reductions instead of PCL.
- STATISTICAL outlier removal (:61-81): mean distance to k nearest neighbors,
  keep points within `mean + stddev_mult * std` of the global distribution.
  (The reference's RADIUS branch is a no-op bug — it never assigns the built
  filter (:76-78) — so the flagship KITTI config effectively runs NONE.)
- optional per-point vertical-angle calibration (:183-220): rotate each point
  by `angle_base` degrees about `z x p` (the horizontal axis orthogonal to p).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from lv_slam_tpu.config import PrefilterConfig
from lv_slam_tpu.core.cloud import SENTINEL, PointCloud


def distance_filter(cloud: PointCloud, near: float, far: float) -> PointCloud:
    dist = jnp.linalg.norm(cloud.xyz, axis=1)
    keep = cloud.mask & (dist > near) & (dist < far)
    xyz = jnp.where(keep[:, None], cloud.xyz, SENTINEL)
    return PointCloud(xyz, cloud.intensity, keep)


def vertical_angle_calibration(cloud: PointCloud, angle_base_deg: float) -> PointCloud:
    """Rotate each point `angle_base` degrees about the axis `p x z` (unit),
    lifting rays slightly — the reference's per-point HDL-64 elevation fix
    (`prefiltering_nodelet.cpp:183-220`)."""
    from lv_slam_tpu.core import se3

    p = cloud.xyz
    z = jnp.array([0.0, 0.0, 1.0], dtype=p.dtype)
    axis = jnp.cross(p, z)
    norm = jnp.linalg.norm(axis, axis=1, keepdims=True)
    axis = axis / jnp.maximum(norm, 1e-12)
    angle = jnp.deg2rad(jnp.float32(angle_base_deg))
    rot = se3.exp_so3(axis * angle)  # (N,3,3)
    xyz = jnp.einsum("nij,nj->ni", rot, p)
    xyz = jnp.where(cloud.mask[:, None], xyz, SENTINEL)
    return PointCloud(xyz, cloud.intensity, cloud.mask)


def _pack_yz(cy: jax.Array, cz: jax.Array) -> jax.Array:
    """Order-preserving pack of two int32 voxel coords into ONE sort key:
    (cy + 2^14) * 2^15 + (cz + 2^14) < 2^30 — lexicographic in (cy, cz) for
    coords in [-16384, 16383] (±1.6 km at 0.1 m resolution, ±6.5 km at the
    LFA map resolutions; out-of-range coords clip, merging voxels far beyond
    any lidar's reach). Every sort compare-exchange moves ALL carried
    operands, so one packed key column instead of two is a direct cut in the
    dominant prefilter sort's cost. Values stay below the 2^30 invalid
    sentinel and int packing never rides float lanes (the TPU NaN
    canonicalization trap)."""
    off = jnp.int32(1 << 14)
    lim = jnp.int32((1 << 15) - 1)
    cy = jnp.clip(cy + off, 0, lim)
    cz = jnp.clip(cz + off, 0, lim)
    return cy * jnp.int32(1 << 15) + cz


def _unpack_yz(kyz: jax.Array) -> Tuple[jax.Array, jax.Array]:
    off = jnp.int32(1 << 14)
    w = jnp.int32(1 << 15)
    return kyz // w - off, kyz % w - off


def voxel_downsample(
    cloud: PointCloud,
    resolution: float,
    out_cap: int,
    method: str = "VOXELGRID",
    reduce: str = "scatter",
) -> PointCloud:
    """Centroid (VOXELGRID) or cell-center (APPROX_VOXELGRID) downsampling.

    Compacts surviving voxels to the front of a fresh `out_cap` cloud.

    Measured v5e cost model (131072 lanes): ONE multi-operand `lax.sort`
    carrying the float columns through the sort network costs 1.6 ms where
    the previous 3x-stable-argsort + composition-gather chain cost 5.7 ms;
    the sorted-dense segment ids make the output front-compacted already, so
    the final `compact()` (an identity re-layout, 1.6 ms) is a slice.
    Whole routine: 10.8 -> ~6 ms (it also runs over million-row keyframe
    windows in `window_group_fn`). The exact `segment_sum` stays: a global
    cumsum-difference centroid would lose ~0.5 m of f32 precision at the
    far end of a 131k-point prefix sum.

    `reduce` picks the run-sum implementation (VOXELGRID only):
    - "scatter": `segment_sum` (one scatter whose cost scales with the lane
      count — the measured ~3 ms/196k-updates class).
    - "scan": log-doubling SEGMENTED prefix scan (17 shifted adds, no
      scatter; per-run sums are exact — each run restarts at its boundary,
      so no global-prefix f32 cancellation) + run-end compaction via one
      bool argsort and one packed gather. A/B candidate where scatters are
      the bottleneck.
    """
    n = cloud.cap
    res = jnp.float32(resolution)
    xyz = cloud.masked_xyz()
    mask = cloud.mask

    # Lexicographic (x,(y,z)-packed) voxel-key sort — 6 carried operands
    # (was 8: the packed key saves one column, and the mask column is
    # recovered from the saturated first key instead of riding the sort).
    # Invalid lanes ride to the back via kx = 2^30; valid voxel coords are
    # bounded far below it, so `skx < big` IS the sorted mask. NOTE: int32
    # coords must NOT ride float32 lanes via bitcast — negative coords form
    # NaN bit patterns and the TPU canonicalizes NaNs in data movement,
    # silently merging distinct voxels. Multi-operand sort keeps every
    # column in its own dtype.
    coords = jnp.floor(xyz / res).astype(jnp.int32)
    big = jnp.int32(2**30)
    kx = jnp.where(mask, coords[:, 0], big)
    kyz = _pack_yz(coords[:, 1], coords[:, 2])
    skx, skyz, sx, sy, sz, sint = jax.lax.sort(
        (kx, kyz, xyz[:, 0], xyz[:, 1], xyz[:, 2], cloud.intensity),
        num_keys=2,
    )
    smask = skx < big

    new_seg = jnp.concatenate(
        [
            jnp.ones((1,), bool),
            (skx[1:] != skx[:-1]) | (skyz[1:] != skyz[:-1]),
        ]
    ) & smask

    seg_in = jnp.stack(
        [
            jnp.where(smask, sx, 0.0),
            jnp.where(smask, sy, 0.0),
            jnp.where(smask, sz, 0.0),
            jnp.where(smask, sint, 0.0),
            smask.astype(jnp.float32),
        ],
        axis=1,
    )
    if reduce == "scan" and method.upper() != "APPROX_VOXELGRID":
        # segmented inclusive prefix scan by doubling: v[i] accumulates back
        # to its run start (flags stop propagation at boundaries)
        v = seg_in
        f = new_seg | ~smask  # invalid lanes are 1-element runs
        d = 1
        while d < n:
            vprev = jnp.concatenate([jnp.zeros((d, 5), v.dtype), v[:-d]], axis=0)
            fprev = jnp.concatenate([jnp.ones((d,), bool), f[:-d]], axis=0)
            v = jnp.where(f[:, None], v, v + vprev)
            f = f | fprev
            d *= 2
        # the run's total lives at its LAST row; compact ends to the front
        # (they are already in voxel-key order, argsort is stable)
        is_end = jnp.concatenate([new_seg[1:] | ~smask[1:], jnp.ones((1,), bool)])
        is_end = is_end & smask
        sel = jnp.argsort(~is_end, stable=True)[:out_cap]
        sums = v[sel]                                     # one packed gather
        sums = jnp.where(is_end[sel][:, None], sums, 0.0)
    else:
        seg_id = jnp.cumsum(new_seg.astype(jnp.int32)) - 1
        seg_id = jnp.where(smask, seg_id, n)  # invalid lanes -> scratch bucket
        num_seg = n + 1
        # seg ids are dense ascending over the valid prefix: the sum rows come
        # out already front-compacted in voxel-key order — slice, don't sort
        sums = jax.ops.segment_sum(
            seg_in, seg_id, num_segments=num_seg, indices_are_sorted=True
        )[:out_cap]
    counts = sums[:, 4]
    cnt = jnp.maximum(counts, 1.0)
    if method.upper() == "APPROX_VOXELGRID":
        sky, skz = _unpack_yz(skyz)
        sc = jnp.stack([skx, sky, skz], axis=1)
        cell = jax.ops.segment_max(
            jnp.where(smask[:, None], sc, -big), seg_id,
            num_segments=num_seg, indices_are_sorted=True,
        )[:out_cap]
        pts = (cell.astype(jnp.float32) + 0.5) * res
    else:
        pts = sums[:, 0:3] / cnt[:, None]
    inten = sums[:, 3] / cnt
    valid = counts > 0

    out = PointCloud(
        jnp.where(valid[:, None], pts, SENTINEL), jnp.where(valid, inten, 0.0), valid
    )
    if out.cap < out_cap:
        # inputs smaller than the requested capacity: pad so the documented
        # fixed (out_cap,*) output shape holds for every input cap
        pad = out_cap - out.cap
        out = PointCloud(
            jnp.concatenate([out.xyz, jnp.full((pad, 3), SENTINEL)], axis=0),
            jnp.concatenate([out.intensity, jnp.zeros(pad)], axis=0),
            jnp.concatenate([out.mask, jnp.zeros(pad, bool)], axis=0),
        )
    return out


def voxel_dedup_first(cloud: PointCloud, resolution: float, out_cap: int) -> PointCloud:
    """Keep the FIRST point of each occupied voxel (dedup, not centroid).

    The cheapest dedup expressible on this TPU: ONE multi-key `lax.sort`
    that carries the permutation through the sort network (so no
    million-index gather to reorder columns), run-start detection, and an
    out_cap-bounded compaction — no segment reduction and no scatter (both
    cost ~20 ms at million-row window sizes; this is ~6 ms).

    Used where the inputs are already voxel-centroided at the same
    resolution (keyframe window flush over prefiltered scans, LFA feature
    map merges over downsampled features): there dedup-first differs from
    re-centroiding by at most the voxel radius on the few cross-part
    duplicates.

    Also the `downsample_method="DEDUP"` A/B for the odometry prefilter: at
    the flagship 0.1 m resolution nearly every occupied voxel holds ONE
    KITTI return (point spacing exceeds 10 cm beyond a few meters' range),
    so first-point == centroid almost everywhere and the segment reduction
    (the scatter in `voxel_downsample`) is pure overhead.
    """
    n = cloud.cap
    res = jnp.float32(resolution)
    xyz = cloud.masked_xyz()
    mask = cloud.mask
    coords = jnp.floor(xyz / res).astype(jnp.int32)
    big = jnp.int32(2**30)
    kx = jnp.where(mask, coords[:, 0], big)
    kyz = _pack_yz(coords[:, 1], coords[:, 2])
    skx, skyz, perm = jax.lax.sort(
        (kx, kyz, jnp.arange(n, dtype=jnp.int32)),
        num_keys=2,
    )
    new_seg = jnp.concatenate(
        [
            jnp.ones((1,), bool),
            (skx[1:] != skx[:-1]) | (skyz[1:] != skyz[:-1]),
        ]
    )
    winner = new_seg & (skx < big)
    sel = jnp.argsort(~winner, stable=True)[:out_cap]
    src = perm[sel]
    packed = jnp.concatenate([xyz, cloud.intensity[:, None]], axis=1)[src]
    ok = winner[sel]
    return PointCloud(
        jnp.where(ok[:, None], packed[:, :3], SENTINEL),
        jnp.where(ok, packed[:, 3], 0.0),
        ok,
    )


def uniform_subsample(cloud: PointCloud, out_cap: int) -> PointCloud:
    """Evenly-strided subsample of a front-compacted cloud to `out_cap`.

    TPU static-shape budget device: NDT gather cost scales with the PADDED
    lane count, so scan matching runs on a bounded, unbiased subset (every
    k-th surviving point) instead of a capacity-truncated one (truncation
    after the voxel sort is spatially biased toward low voxel keys). The
    input must have its valid points compacted to the front (voxel_downsample
    and PointCloud.compact guarantee this).
    """
    n = cloud.cap
    if out_cap >= n:
        return cloud
    cnt = jnp.sum(cloud.mask.astype(jnp.int32))
    take = jnp.minimum(cnt, out_cap)
    i = jnp.arange(out_cap, dtype=jnp.int32)
    # stride in float32: i * cnt overflows int32 at KITTI density (i up to
    # 65535 x cnt ~100k ~ 7e9 >> 2^31 — silently corrupted the subsample);
    # the float stride's worst-case rounding is a +-1 index jitter, harmless
    # for an even sampling heuristic (indices stay in range and ordered)
    step = cnt.astype(jnp.float32) / jnp.maximum(take, 1).astype(jnp.float32)
    idx = jnp.floor(i.astype(jnp.float32) * step).astype(jnp.int32)
    ok = i < take
    idx = jnp.where(ok, jnp.clip(idx, 0, n - 1), 0)
    packed = jnp.concatenate([cloud.xyz, cloud.intensity[:, None]], axis=1)[idx]
    return PointCloud(
        jnp.where(ok[:, None], packed[:, :3], SENTINEL),
        jnp.where(ok, packed[:, 3], 0.0),
        ok & cloud.mask[idx],
    )


def stride_subsample(cloud: PointCloud, out_cap: int) -> PointCloud:
    """Pure strided-slice subsample: every (cap/out_cap)-th lane, ZERO gathers.

    Requires cap % out_cap == 0. Unlike `uniform_subsample` this does not
    need a front-compacted input and pays no gather, but keeps only
    count/stride valid points (vs min(count, out_cap)) when the cloud
    underfills its capacity — the A/B alternative for the scan-matching
    subsample (`OdometryConfig.subsample_method`).

    Fill-ratio caveat: at fill = count/cap the matcher sees fill * out_cap
    points. The flagship caps run ~85-95% full (KITTI 125k/131072), where
    the loss is immaterial (validated on chip, devkit 0.00049); a cap
    sized at ~2x the point count would halve the matcher's diet — size
    caps to the workload (see test_fused_odometry_with_dedup_downsample's
    measured 43%-fill divergence)."""
    n = cloud.cap
    if out_cap >= n:
        return cloud
    if n % out_cap != 0:
        raise ValueError(f"stride_subsample needs cap % out_cap == 0, got {n} % {out_cap}")
    k = n // out_cap
    return PointCloud(cloud.xyz[::k], cloud.intensity[::k], cloud.mask[::k])


def prefilter(cloud: PointCloud, cfg: PrefilterConfig) -> PointCloud:
    """Full prefiltering chain (`prefiltering_nodelet.cpp:92-135`)."""
    out = cloud
    if cfg.use_angle_calibration:
        out = vertical_angle_calibration(out, cfg.angle_base)
    if cfg.use_distance_filter:
        out = distance_filter(out, cfg.distance_near_thresh, cfg.distance_far_thresh)
    method = cfg.downsample_method.upper()
    if method in ("VOXELGRID", "APPROX_VOXELGRID"):
        out = voxel_downsample(
            out, cfg.downsample_resolution, cfg.out_cap, method, reduce=cfg.voxel_reduce
        )
    elif method == "DEDUP":
        out = voxel_dedup_first(out, cfg.downsample_resolution, cfg.out_cap)
    else:
        out = out.compact(cfg.out_cap)
    if cfg.outlier_removal_method.upper() == "STATISTICAL":
        from lv_slam_tpu.ops.nn import statistical_outlier_removal

        out = statistical_outlier_removal(out, cfg.statistical_mean_k, cfg.statistical_stddev)
    elif cfg.outlier_removal_method.upper() == "RADIUS":
        from lv_slam_tpu.ops.nn import radius_outlier_removal

        out = radius_outlier_removal(out, cfg.radius_radius, cfg.radius_min_neighbors)
    return out
