import jax.numpy as jnp
import numpy as np

from lv_slam_tpu.config import NDTConfig, OdometryConfig, PrefilterConfig
from lv_slam_tpu.core.cloud import PointCloud
from lv_slam_tpu.odometry.dlo import run_sequence
from lv_slam_tpu.odometry.fused import run_sequence_fused


def _stack(scans, cap):
    clouds = [PointCloud.from_numpy(s, cap=cap) for s in scans]
    xyz = jnp.stack([c.xyz for c in clouds])
    mask = jnp.stack([c.mask for c in clouds])
    return xyz, mask


def test_fused_matches_host_driver(small_sequence):
    """The device-resident lax.scan pipeline must track like the host loop."""
    scans, gt, _ = small_sequence
    cap = 32768
    cfg = OdometryConfig(ndt=NDTConfig(leaf_cap=16384, lut_extent=256))
    stamps = np.arange(len(scans)) * 0.1

    host_poses, _ = run_sequence(scans, stamps, cfg=cfg, cap=cap)

    xyz, mask = _stack(scans, cap)
    fused_poses = np.asarray(run_sequence_fused(xyz, mask, jnp.asarray(stamps, jnp.float32), cfg))

    gt_rel = np.einsum("ij,njk->nik", np.linalg.inv(gt[0]), gt)
    for i in range(len(scans)):
        err_vs_host = np.linalg.norm(fused_poses[i][:3, 3] - host_poses[i][:3, 3])
        assert err_vs_host < 0.05, (i, err_vs_host)
    final_err = np.linalg.norm(fused_poses[-1][:3, 3] - gt_rel[-1][:3, 3])
    assert final_err < 0.25, final_err


def test_fused_chunked_matches_unchunked(small_sequence):
    """State threading across chunks reproduces the single-scan program
    exactly (odometry AND the LFA refinement)."""
    scans, gt, _ = small_sequence
    cap = 32768
    cfg = OdometryConfig(ndt=NDTConfig(leaf_cap=16384, lut_extent=256))
    n = len(scans)
    stamps = jnp.arange(n, dtype=jnp.float32) * 0.1
    xyz, mask = _stack(scans, cap)

    whole = np.asarray(run_sequence_fused(xyz, mask, stamps, cfg))
    k = n // 2
    first, state = run_sequence_fused(
        xyz[:k], mask[:k], stamps[:k], cfg, return_state=True
    )
    second = run_sequence_fused(
        xyz[k:], mask[k:], stamps[k:], cfg, init_state=state
    )
    chunked = np.concatenate([np.asarray(first), np.asarray(second)])
    np.testing.assert_allclose(chunked, whole, atol=1e-5)

    from lv_slam_tpu.config import LfaConfig
    from lv_slam_tpu.lfa.fused import run_sequence_lfa

    lfa_cfg = LfaConfig(
        scan_line=32, edge_cap=2048, planar_cap=4096,
        map_edge_cap=8192, map_planar_cap=16384,
    )
    odom = jnp.asarray(whole)
    lfa_whole = np.asarray(run_sequence_lfa(xyz, mask, lfa_cfg, odom_poses=odom))
    lf1, lstate = run_sequence_lfa(
        xyz[:k], mask[:k], lfa_cfg, odom_poses=odom[:k], return_state=True
    )
    lf2 = run_sequence_lfa(
        xyz[k:], mask[k:], lfa_cfg, odom_poses=odom[k:], init_state=lstate
    )
    lfa_chunked = np.concatenate([np.asarray(lf1), np.asarray(lf2)])
    np.testing.assert_allclose(lfa_chunked, lfa_whole, atol=1e-5)


def test_fused_with_prefilter(small_sequence):
    scans, gt, _ = small_sequence
    cap = 32768
    cfg = OdometryConfig(ndt=NDTConfig(leaf_cap=16384, lut_extent=256))
    pf = PrefilterConfig(raw_cap=cap, out_cap=cap)
    stamps = jnp.arange(len(scans), dtype=jnp.float32) * 0.1
    xyz, mask = _stack(scans, cap)
    poses = np.asarray(run_sequence_fused(xyz, mask, stamps, cfg, pf))
    gt_rel = np.einsum("ij,njk->nik", np.linalg.inv(gt[0]), gt)
    final_err = np.linalg.norm(poses[-1][:3, 3] - gt_rel[-1][:3, 3])
    assert final_err < 0.25, final_err


def test_return_filtered_matches_standalone_prefilter(small_sequence):
    """The /filtered_points product emitted by the fused odometry scan
    (return_filtered=True, transposed layout) equals the standalone
    distance-band + voxel-centroid chain applied per scan."""
    import jax

    from lv_slam_tpu.odometry.fused import _prefilter_mid

    scans, gt, _ = small_sequence
    cap = 32768
    cfg = OdometryConfig(ndt=NDTConfig(leaf_cap=16384, lut_extent=256))
    pf = PrefilterConfig(raw_cap=cap, out_cap=cap)
    stamps = jnp.arange(len(scans), dtype=jnp.float32) * 0.1
    xyz, mask = _stack(scans, cap)
    inten = jnp.zeros(xyz.shape[:2], jnp.float32) + 0.5

    (poses, filt) = run_sequence_fused(
        xyz, mask, stamps, cfg, pf, inten=inten, return_filtered=True
    )
    fxyz, finten, fmask = filt
    assert fxyz.shape == (len(scans), 3, cap)

    mid = jax.jit(lambda c: _prefilter_mid(c, pf))
    for i in range(len(scans)):
        want = mid(PointCloud(xyz[i], inten[i], mask[i]))
        np.testing.assert_array_equal(np.asarray(fmask[i]), np.asarray(want.mask))
        np.testing.assert_allclose(
            np.asarray(fxyz[i]).T, np.asarray(want.xyz), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(finten[i]), np.asarray(want.intensity), atol=1e-5
        )


def test_none_stride_zero_sort_prefilter(small_sequence):
    """downsample NONE + stride subsample (the zero-sort prefilter: at the
    flagship 0.1 m resolution nearly every voxel holds one return, so the
    voxel pass is a near-pass-through and the distance mask + strided slice
    suffice). The prefiltered scan-matching input must be EXACTLY every k-th
    lane of the distance-banded raw cloud (mask holes preserved, no
    compaction), and the sequence must still track."""
    from lv_slam_tpu.odometry.fused import _prefilter
    from lv_slam_tpu.ops.prefilter import distance_filter

    scans, gt, _ = small_sequence
    cap = 32768
    sm_cap = cap // 2
    pf = PrefilterConfig(raw_cap=cap, out_cap=cap, downsample_method="NONE")
    cloud = PointCloud.from_numpy(scans[0], cap=cap)

    out = _prefilter(cloud, pf, sm_cap, subsample_method="stride")
    ref = distance_filter(cloud, pf.distance_near_thresh, pf.distance_far_thresh)
    np.testing.assert_array_equal(np.asarray(out.xyz), np.asarray(ref.xyz)[::2])
    np.testing.assert_array_equal(np.asarray(out.mask), np.asarray(ref.mask)[::2])

    cfg = OdometryConfig(
        ndt=NDTConfig(leaf_cap=16384, lut_extent=256),
        scan_matching_cap=sm_cap, subsample_method="stride",
    )
    stamps = jnp.arange(len(scans), dtype=jnp.float32) * 0.1
    xyz, mask = _stack(scans, cap)
    poses = np.asarray(run_sequence_fused(xyz, mask, stamps, cfg, pf))
    gt_rel = np.einsum("ij,njk->nik", np.linalg.inv(gt[0]), gt)
    final_err = np.linalg.norm(poses[-1][:3, 3] - gt_rel[-1][:3, 3])
    assert final_err < 0.25, final_err
