import dataclasses

import numpy as np

from lv_slam_tpu.config import NDTConfig, OdometryConfig, PrefilterConfig
from lv_slam_tpu.io import synthetic
from lv_slam_tpu.odometry.dlo import run_sequence

_CAP = 32768
_NDT = NDTConfig(leaf_cap=16384, lut_extent=256)


def _relative_errors(gt, est):
    errs_t = []
    for i in range(1, len(gt)):
        rel_gt = np.linalg.inv(gt[i - 1]) @ gt[i]
        rel_est = np.linalg.inv(est[i - 1]) @ est[i]
        errs_t.append(np.linalg.norm((np.linalg.inv(rel_est) @ rel_gt)[:3, 3]))
    return np.array(errs_t)


def test_dlo_tracks_synthetic_sequence(small_sequence):
    """Phase-4 gate (minimum end-to-end slice): scan-to-keyframe weighted-NDT
    odometry tracks a synthetic sequence with small per-scan error."""
    scans, gt_poses, _ = small_sequence
    cfg = OdometryConfig(ndt=_NDT)
    est, stats = run_sequence(scans, cfg=cfg, cap=_CAP)
    assert stats.scan_count == len(scans)
    # ground truth is sensor-in-world; odometry is sensor-in-first-frame
    gt_rel = np.einsum("ij,njk->nik", np.linalg.inv(gt_poses[0]), gt_poses)
    errs = _relative_errors(gt_rel, est)
    assert errs.max() < 0.12, errs
    final_err = np.linalg.norm(est[-1][:3, 3] - gt_rel[-1][:3, 3])
    assert final_err < 0.25, final_err


def test_dlo_keyframe_switching(small_sequence):
    scans, _, _ = small_sequence
    # force a keyframe switch every ~2 m of travel
    cfg = OdometryConfig(keyframe_delta_trans=2.0, keyframe_delta_time=1e9, ndt=_NDT)
    est, stats = run_sequence(scans, cfg=cfg, cap=_CAP)
    assert stats.keyframe_count >= 2
    # trajectory should still be smooth across the keyframe switch
    steps = np.linalg.norm(np.diff(est[:, :3, 3], axis=0), axis=1)
    assert np.all(steps < 1.6) and np.all(steps > 0.4), steps


def test_dlo_with_prefilter(small_sequence):
    scans, gt_poses, _ = small_sequence
    pf = PrefilterConfig(raw_cap=_CAP, out_cap=_CAP)
    cfg = OdometryConfig(ndt=_NDT)
    est, stats = run_sequence(scans[:3], cfg=cfg, prefilter_cfg=pf, cap=_CAP)
    gt_rel = np.einsum("ij,njk->nik", np.linalg.inv(gt_poses[0]), gt_poses[:3])
    errs = _relative_errors(gt_rel, est)
    assert errs.max() < 0.12, errs


def test_uniform_subsample_unbiased():
    """scan_matching_cap subsampling: evenly-strided subset of the valid
    prefix (unbiased, unlike capacity truncation after a voxel sort) with
    exactly min(count, cap) survivors."""
    from lv_slam_tpu.core.cloud import PointCloud
    from lv_slam_tpu.ops.prefilter import uniform_subsample

    rng = np.random.default_rng(0)
    n_valid, cap, out_cap = 3000, 4096, 512
    pts = rng.uniform(-50, 50, size=(n_valid, 3)).astype(np.float32)
    cloud = PointCloud.from_numpy(pts, cap=cap)
    sub = uniform_subsample(cloud, out_cap)
    assert int(sub.count()) == out_cap
    sub_xyz = np.asarray(sub.xyz)[np.asarray(sub.mask)]
    # every survivor is an original point, and the subset spans the range
    # (first point kept, stride ~ n_valid/out_cap)
    np.testing.assert_allclose(sub_xyz[0], pts[0], atol=0)
    strides = (n_valid * np.arange(out_cap)) // out_cap
    np.testing.assert_allclose(sub_xyz, pts[strides], atol=0)
    # centroid unbiased within sampling noise
    assert np.linalg.norm(sub_xyz.mean(0) - pts.mean(0)) < 2.0

    # fewer valid points than the cap: everything survives
    small = PointCloud.from_numpy(pts[:100], cap=cap)
    sub2 = uniform_subsample(small, out_cap)
    assert int(sub2.count()) == 100
    np.testing.assert_allclose(
        np.asarray(sub2.xyz)[np.asarray(sub2.mask)], pts[:100], atol=0
    )


def test_voxel_downsample_edge_cases():
    """Pins the single-sort voxel_downsample rewrite: centroid exactness,
    empty clouds, all-one-voxel clouds, and front-compaction of the output."""
    import jax.numpy as jnp
    import numpy as np

    from lv_slam_tpu.core.cloud import PointCloud
    from lv_slam_tpu.ops.prefilter import voxel_downsample

    # two voxels, exact centroids
    pts = np.array(
        [[0.01, 0.01, 0.0], [0.03, 0.03, 0.0], [5.01, 0.0, 0.0], [5.03, 0.0, 0.0]],
        np.float32,
    )
    c = PointCloud.from_numpy(pts, cap=16)
    out = voxel_downsample(c, 0.1, 8)
    m = np.asarray(out.mask)
    assert m[:2].all() and not m[2:].any()  # front-compacted
    got = np.asarray(out.xyz)[:2]
    want = np.array([[0.02, 0.02, 0.0], [5.02, 0.0, 0.0]], np.float32)
    np.testing.assert_allclose(np.sort(got[:, 0]), np.sort(want[:, 0]), atol=1e-5)

    # empty cloud
    empty = PointCloud(
        jnp.full((16, 3), 1e6), jnp.zeros(16), jnp.zeros(16, bool)
    )
    out = voxel_downsample(empty, 0.1, 8)
    assert not np.asarray(out.mask).any()

    # all points in ONE voxel -> one output row
    one = PointCloud.from_numpy(
        np.full((10, 3), 0.05, np.float32)
        + np.linspace(0, 0.009, 10, dtype=np.float32)[:, None],
        cap=16,
    )
    out = voxel_downsample(one, 0.5, 8)
    m = np.asarray(out.mask)
    assert m[0] and not m[1:].any()

    # intensity averages per voxel
    ci = PointCloud.from_numpy(
        np.array([[0.01, 0, 0, 2.0], [0.02, 0, 0, 4.0]], np.float32), cap=8
    )
    out = voxel_downsample(ci, 0.1, 4)
    assert abs(float(np.asarray(out.intensity)[0]) - 3.0) < 1e-5


def test_uniform_subsample_no_int32_overflow():
    """i * cnt overflowed int32 at KITTI density (65536 lanes x ~100k valid
    points ~ 7e9): indices wrapped negative, clamped to wrong rows, and the
    valid count silently collapsed. The float-stride rewrite must keep every
    output lane valid and the indices evenly spread."""
    import jax.numpy as jnp

    from lv_slam_tpu.core.cloud import PointCloud
    from lv_slam_tpu.ops.prefilter import uniform_subsample

    n, out_cap, valid_n = 131072, 65536, 100000
    rng = np.random.default_rng(0)
    xyz = np.full((n, 3), 1.0e6, np.float32)
    xyz[:valid_n] = rng.uniform(-50, 50, (valid_n, 3)).astype(np.float32)
    mask = np.zeros(n, bool)
    mask[:valid_n] = True
    cloud = PointCloud(jnp.asarray(xyz), jnp.zeros(n), jnp.asarray(mask))
    out = uniform_subsample(cloud, out_cap)
    m = np.asarray(out.mask)
    assert int(m.sum()) == out_cap, int(m.sum())  # all lanes filled
    pts = np.asarray(out.xyz)[m]
    assert np.abs(pts).max() < 100.0  # no sentinel rows leaked
    # even spread: both halves of the valid prefix are represented
    first_half = np.isin(
        np.round(pts[:, 0], 4), np.round(xyz[: valid_n // 2, 0], 4)
    ).mean()
    assert 0.3 < first_half < 0.7, first_half


def test_prefilter_none_branch_compacts_before_subsample():
    """Advisor r3 medium: with downsample_method=NONE the distance filter only
    clears mask bits, so uniform_subsample saw a holey cloud and silently
    dropped valid points with spatial bias (666 survivors -> 340 kept).
    _prefilter_mid must front-compact in the NONE branch."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from lv_slam_tpu.core.cloud import PointCloud
    from lv_slam_tpu.odometry.fused import _prefilter
    from lv_slam_tpu.config import PrefilterConfig

    n, out_cap = 4096, 512
    rng = np.random.default_rng(1)
    # half the lanes inside the distance band, interleaved with out-of-band
    pts = rng.uniform(-50, 50, (n, 3)).astype(np.float32)
    pts[::2] *= 0.001  # even lanes fall below distance_near_thresh
    cloud = PointCloud.from_numpy(pts, cap=n)
    pf = PrefilterConfig(raw_cap=n, out_cap=n, downsample_method="NONE")
    out = jax.jit(lambda c: _prefilter(c, pf, scan_matching_cap=out_cap))(cloud)
    m = np.asarray(out.mask)
    assert int(m.sum()) == out_cap, int(m.sum())  # every output lane kept
    # survivors span the whole azimuth range of the valid set, not a prefix
    kept = np.asarray(out.xyz)[m]
    band = pts[1::2]
    az_kept = np.arctan2(kept[:, 1], kept[:, 0])
    az_band = np.arctan2(band[:, 1], band[:, 0])
    hist_k, _ = np.histogram(az_kept, bins=8, range=(-np.pi, np.pi))
    assert (hist_k > 0).all(), hist_k  # no azimuth sector starved


def test_voxel_downsample_scan_reduce_matches_scatter():
    """reduce="scan" (segmented prefix scan, no scatter) must reproduce the
    segment_sum path: same voxels, same order, centroids equal to f32
    accumulation-order tolerance."""
    import jax
    import jax.numpy as jnp

    from lv_slam_tpu.core.cloud import PointCloud
    from lv_slam_tpu.ops.prefilter import voxel_downsample

    rng = np.random.default_rng(4)
    n, out_cap = 8192, 4096
    pts = rng.uniform(-40, 40, (n, 3)).astype(np.float32)
    pts[: n // 4] = pts[0] + rng.uniform(0, 0.08, (n // 4, 3))  # one dense voxel
    raw = np.concatenate([pts, rng.uniform(0, 1, (n, 1)).astype(np.float32)], 1)
    cloud = PointCloud.from_numpy(raw, cap=n)
    a = jax.jit(lambda c: voxel_downsample(c, 0.1, out_cap, reduce="scatter"))(cloud)
    b = jax.jit(lambda c: voxel_downsample(c, 0.1, out_cap, reduce="scan"))(cloud)
    np.testing.assert_array_equal(np.asarray(a.mask), np.asarray(b.mask))
    m = np.asarray(a.mask)
    np.testing.assert_allclose(
        np.asarray(a.xyz)[m], np.asarray(b.xyz)[m], rtol=0, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(a.intensity)[m], np.asarray(b.intensity)[m], rtol=0, atol=1e-4
    )


def test_stride_subsample_matches_gather_on_full_cloud():
    """When the cloud fills its capacity (KITTI regime), stride_subsample
    picks the same every-k-th lanes as uniform_subsample; on underfilled
    clouds it keeps count/stride points, evenly spread."""
    import jax.numpy as jnp

    from lv_slam_tpu.core.cloud import PointCloud
    from lv_slam_tpu.ops.prefilter import stride_subsample, uniform_subsample

    rng = np.random.default_rng(5)
    n, out_cap = 4096, 1024
    pts = rng.uniform(-50, 50, (n, 3)).astype(np.float32)
    full = PointCloud.from_numpy(pts, cap=n)
    a = uniform_subsample(full, out_cap)
    b = stride_subsample(full, out_cap)
    np.testing.assert_array_equal(np.asarray(a.xyz), np.asarray(b.xyz))
    np.testing.assert_array_equal(np.asarray(a.mask), np.asarray(b.mask))

    half = PointCloud.from_numpy(pts[: n // 2], cap=n)
    s = stride_subsample(half, out_cap)
    m = np.asarray(s.mask)
    assert int(m.sum()) == n // 2 // (n // out_cap)
    kept = np.asarray(s.xyz)[m]
    np.testing.assert_allclose(kept, pts[: n // 2 : n // out_cap], atol=0)


def test_voxel_downsample_matches_numpy_reference():
    """Randomized pin of the packed-(y,z)-key sort: centroids, intensities,
    and the voxel partition must match a brute-force numpy reference on
    clouds spanning NEGATIVE coordinates (the packing offsets them)."""
    from lv_slam_tpu.core.cloud import PointCloud
    from lv_slam_tpu.ops.prefilter import voxel_downsample

    rng = np.random.default_rng(11)
    n, res = 4096, 0.25
    pts = rng.uniform(-60, 60, (n, 3)).astype(np.float32)
    inten = rng.uniform(0, 1, (n, 1)).astype(np.float32)
    cloud = PointCloud.from_numpy(np.concatenate([pts, inten], 1), cap=n)
    out = voxel_downsample(cloud, res, n)
    m = np.asarray(out.mask)

    keys = np.floor(pts / res).astype(np.int64)
    uniq, inv = np.unique(keys, axis=0, return_inverse=True)
    want_xyz = np.zeros((len(uniq), 3))
    want_int = np.zeros(len(uniq))
    for v in range(len(uniq)):
        sel = inv == v
        want_xyz[v] = pts[sel].mean(0)
        want_int[v] = inten[sel, 0].mean()
    assert int(m.sum()) == len(uniq)
    got_xyz = np.asarray(out.xyz)[m]
    got_int = np.asarray(out.intensity)[m]
    # match rows by voxel key (output order is voxel-lexicographic)
    got_keys = np.floor(got_xyz / res + 1e-4).astype(np.int64)
    order_w = np.lexsort(want_xyz.T[::-1])
    order_g = np.lexsort(got_xyz.T[::-1])
    np.testing.assert_allclose(got_xyz[order_g], want_xyz[order_w], atol=2e-4)
    np.testing.assert_allclose(got_int[order_g], want_int[order_w], atol=2e-4)
    del got_keys


def test_dedup_downsample_method():
    """downsample_method=DEDUP: one INPUT point per occupied voxel,
    front-compacted, equal to VOXELGRID's partition (and exactly equal where
    voxels are singleton — the KITTI 0.1 m regime)."""
    from lv_slam_tpu.core.cloud import PointCloud
    from lv_slam_tpu.ops.prefilter import prefilter, voxel_downsample

    rng = np.random.default_rng(3)
    n, res = 2048, 0.25
    pts = rng.uniform(-40, 40, (n, 3)).astype(np.float32)
    pts[: n // 8] = pts[0] + rng.uniform(0, 0.2, (n // 8, 3)).astype(np.float32)
    cloud = PointCloud.from_numpy(pts, cap=n)

    pf = PrefilterConfig(
        use_distance_filter=False, downsample_method="DEDUP",
        downsample_resolution=res, raw_cap=n, out_cap=n,
    )
    out = prefilter(cloud, pf)
    cen = voxel_downsample(cloud, res, n)
    m = np.asarray(out.mask)
    # same voxel partition as the centroid path
    assert int(m.sum()) == int(np.asarray(cen.mask).sum())
    # front-compacted (uniform_subsample downstream requires it)
    assert not m[int(m.sum()):].any()
    got = np.asarray(out.xyz)[m]
    # every output point is an INPUT point (dedup, not centroid)
    d = np.linalg.norm(got[:, None, :] - pts[None, :, :], axis=-1).min(1)
    assert d.max() == 0.0
    # singleton voxels: dedup == centroid exactly
    keys = np.floor(pts / res).astype(np.int64)
    uniq, inv, cnt = np.unique(keys, axis=0, return_inverse=True, return_counts=True)
    singleton = set(map(tuple, uniq[cnt == 1]))
    cm = np.asarray(cen.mask)
    cen_pts = np.asarray(cen.xyz)[cm]
    cen_single = {tuple(k): p for k, p in
                  zip(np.floor(cen_pts / res + 1e-4).astype(np.int64), cen_pts)
                  if tuple(k) in singleton}
    got_single = {tuple(k): p for k, p in
                  zip(np.floor(got / res + 1e-4).astype(np.int64), got)
                  if tuple(k) in singleton}
    assert set(cen_single) == set(got_single)
    for k in cen_single:
        np.testing.assert_allclose(cen_single[k], got_single[k], atol=1e-5)


def test_fused_odometry_with_dedup_downsample(small_sequence):
    """The fused DLO chain tracks with downsample_method=DEDUP (the
    no-segment-reduction A/B for the on-chip speed pick), under the shipped
    `stride` scan-matching subsample.

    Caps are sized to the scans (~14k points -> 16k cap, ~86% fill, the
    production fill ratio: KITTI raw 125k/131072). stride keeps count/k
    valid points, NOT min(count, cap) — at a 43% fill (32k cap here) it
    would starve the matcher to ~3.5k points and tracking degrades; see
    stride_subsample's docstring. The flagship defaults were validated on
    chip at full density (devkit 0.00049)."""
    import jax.numpy as jnp

    from lv_slam_tpu.core.cloud import PointCloud
    from lv_slam_tpu.odometry.fused import run_sequence_fused

    scans, gt_poses, _ = small_sequence
    cap = 16384
    assert all(len(s) <= cap for s in scans[:4])
    pf = PrefilterConfig(
        downsample_method="DEDUP", raw_cap=cap, out_cap=cap,
    )
    cfg = OdometryConfig(ndt=_NDT, scan_matching_cap=8192)
    clouds = [PointCloud.from_numpy(s, cap=cap) for s in scans[:4]]
    xyz = jnp.stack([c.xyz for c in clouds])
    mask = jnp.stack([c.mask for c in clouds])
    stamps = jnp.arange(4, dtype=jnp.float32) * 0.1
    est = np.asarray(run_sequence_fused(xyz, mask, stamps, cfg, pf))
    gt_rel = np.einsum("ij,njk->nik", np.linalg.inv(gt_poses[0]), gt_poses[:4])
    errs = _relative_errors(gt_rel, est)
    assert errs.max() < 0.12, errs
