import jax
import numpy as np
import pytest

from lv_slam_tpu.config import LfaConfig
from lv_slam_tpu.core.cloud import PointCloud
from lv_slam_tpu.io import synthetic
from lv_slam_tpu.lfa.features import extract_features
from lv_slam_tpu.lfa.pipeline import LfaPipeline

_CFG = LfaConfig(
    scan_line=32,
    edge_cap=2048,
    planar_cap=4096,
    map_edge_cap=16384,
    map_planar_cap=32768,
)


@pytest.fixture(scope="module")
def lfa_sequence():
    scans, poses, _ = synthetic.make_sequence(
        8, seed=21, trajectory="figure8", step=1.0, n_rings=32, n_azimuth=900,
        noise_std=0.005,
    )
    return scans, poses


def test_feature_extraction(lfa_sequence):
    scans, _ = lfa_sequence
    cloud = PointCloud.from_numpy(scans[0], cap=32768)
    feats = extract_features(cloud, _CFG)
    n_sharp = int(feats.sharp_mask.sum())
    n_flat = int(feats.flat_mask.sum())
    n_less_flat = int(feats.less_flat_mask.sum())
    assert n_sharp > 20, n_sharp
    assert n_flat > 100, n_flat
    assert n_less_flat > n_flat
    # edges should be on vertical structures / corners -> higher mean |z| spread
    sharp = np.asarray(feats.sharp)[np.asarray(feats.sharp_mask)]
    flat = np.asarray(feats.flat)[np.asarray(feats.flat_mask)]
    assert np.isfinite(sharp).all() and np.isfinite(flat).all()
    # flats dominated by ground: median z near the ground plane (sensor at 1.73)
    assert np.median(flat[:, 2]) < -1.0


def test_lfa_pipeline_tracks(lfa_sequence):
    scans, gt = lfa_sequence
    pipe = LfaPipeline(_CFG)
    est = [pipe.process_numpy(s, cap=32768) for s in scans]
    est = np.stack(est)
    gt_rel = np.einsum("ij,njk->nik", np.linalg.inv(gt[0]), gt)
    for i in range(1, len(scans)):
        rel_gt = np.linalg.inv(gt_rel[i - 1]) @ gt_rel[i]
        rel_est = np.linalg.inv(est[i - 1]) @ est[i]
        err = np.linalg.norm((np.linalg.inv(rel_est) @ rel_gt)[:3, 3])
        assert err < 0.10, (i, err)
    final_err = np.linalg.norm(est[-1][:3, 3] - gt_rel[-1][:3, 3])
    assert final_err < 0.25, final_err


def test_lfa_16_ring_tracks():
    """The 16-line regime (kylin/grodog datasets, `dlo_lfa_ggo_kylin.launch`:
    scan_line=16, +-15 deg FOV, finer feature resolutions) must track too."""
    from lv_slam_tpu.config import kylin_config

    cfg = kylin_config()
    lfa = cfg.lfa
    assert lfa.scan_line == 16 and lfa.mapping_line_resolution == 0.2
    scans, gt, _ = synthetic.make_sequence(
        6, seed=33, trajectory="figure8", step=0.5, n_rings=16, n_azimuth=900,
        noise_std=0.005, max_elev_deg=15.0, min_elev_deg=-15.0,
    )
    pipe = LfaPipeline(lfa)
    est = np.stack([pipe.process_numpy(s, cap=16384) for s in scans])
    gt_rel = np.einsum("ij,njk->nik", np.linalg.inv(gt[0]), gt)
    for i in range(1, len(scans)):
        rel_gt = np.linalg.inv(gt_rel[i - 1]) @ gt_rel[i]
        rel_est = np.linalg.inv(est[i - 1]) @ est[i]
        err = np.linalg.norm((np.linalg.inv(rel_est) @ rel_gt)[:3, 3])
        assert err < 0.10, (i, err)


def test_dataset_preset_surface():
    """Per-dataset factories mirror their launch files' deltas."""
    from lv_slam_tpu import config as C

    assert set(C.DATASET_CONFIGS) == {"kitti", "kylin", "ob", "grodog", "panda"}
    ky = C.kylin_config()
    assert ky.odometry.keyframe_delta_trans == 2.0
    assert (ky.loop.distance_thresh, ky.loop.accum_distance_thresh, ky.loop.min_edge_interval) == (5.0, 25.0, 15.0)
    gr = C.grodog_config()
    assert gr.prefilter.distance_near_thresh == 0.2
    assert gr.prefilter.downsample_method == "NONE"
    assert gr.odometry.keyframe_delta_angle == 0.34
    assert (gr.loop.distance_thresh, gr.loop.accum_distance_thresh, gr.loop.min_edge_interval) == (5.0, 10.0, 7.0)
    assert gr.lfa.scan_line == 16 and gr.lfa.minimum_range == 0.3
    pa = C.panda_config()
    assert pa.lfa.scan_line == 64
    assert C.ob_config().lfa.mapping_plane_resolution == 0.4


def test_lfa_fused_matches_host_pipeline(lfa_sequence):
    """The lax.scan LFA (one device program for the whole sequence) must
    reproduce the host-driven pipeline's trajectory."""
    import jax.numpy as jnp

    from lv_slam_tpu.lfa.fused import run_sequence_lfa

    scans, gt = lfa_sequence
    cap = 32768
    host = LfaPipeline(_CFG)
    host_poses = np.stack([host.process_numpy(s, cap=cap) for s in scans])

    clouds = [PointCloud.from_numpy(s, cap=cap) for s in scans]
    xyz = jnp.stack([c.xyz for c in clouds])
    mask = jnp.stack([c.mask for c in clouds])
    fused_poses = np.asarray(run_sequence_lfa(xyz, mask, _CFG))
    assert fused_poses.shape == host_poses.shape
    for i in range(len(scans)):
        dt = np.linalg.norm(fused_poses[i][:3, 3] - host_poses[i][:3, 3])
        assert dt < 0.05, (i, dt)


def test_lfa_fused_dlo_coupling(lfa_sequence):
    """dlo_lfa mode: external odometry seeds the scan-to-map refinement; a
    perturbed seed trajectory must come out closer to ground truth."""
    import jax.numpy as jnp

    from lv_slam_tpu.lfa.fused import run_sequence_lfa

    scans, gt = lfa_sequence
    gt_rel = np.einsum("ij,njk->nik", np.linalg.inv(gt[0]), gt).astype(np.float32)
    # accumulated drift (what scan-to-map refinement corrects): each step's
    # relative motion carries a small systematic bias
    noisy = gt_rel.copy()
    for i in range(1, len(scans)):
        noisy[i:, :3, 3] += np.float32(0.03)  # 3 cm/step x-drift

    cap = 32768
    clouds = [PointCloud.from_numpy(s, cap=cap) for s in scans]
    xyz = jnp.stack([c.xyz for c in clouds])
    mask = jnp.stack([c.mask for c in clouds])
    refined = np.asarray(run_sequence_lfa(xyz, mask, _CFG, odom_poses=jnp.asarray(noisy)))
    err_in = np.linalg.norm(noisy[1:, :3, 3] - gt_rel[1:, :3, 3], axis=1)
    err_out = np.linalg.norm(refined[1:, :3, 3] - gt_rel[1:, :3, 3], axis=1)
    # drift accumulates in the seed; the map-refined trajectory must not
    assert err_out[-1] < err_in[-1] * 0.5, (err_in[-1], err_out[-1])
    assert err_out.mean() < err_in.mean() * 0.6, (err_in.mean(), err_out.mean())


def test_lfa_mapping_corrects_bad_seed(lfa_sequence):
    """Scan-to-map refinement must pull a perturbed odometry seed back to the
    map (this was silently a no-op before the NaN-poisoning fix)."""
    import jax.numpy as jnp

    from lv_slam_tpu.lfa.features import extract_features
    from lv_slam_tpu.lfa.mapping import FeatureMapping
    from lv_slam_tpu.core.cloud import PointCloud

    scans, gt = lfa_sequence
    gt_rel = np.einsum("ij,njk->nik", np.linalg.inv(gt[0]), gt)
    mapper = FeatureMapping(_CFG)
    for i in range(3):
        feats = extract_features(PointCloud.from_numpy(scans[i], cap=32768), _CFG)
        mapper.process(feats, gt_rel[i])
    feats = extract_features(PointCloud.from_numpy(scans[3], cap=32768), _CFG)
    bad_seed = gt_rel[3].copy()
    bad_seed[0, 3] += 0.3
    bad_seed[1, 3] -= 0.2
    refined = mapper.process(feats, bad_seed)
    err = np.linalg.norm(refined[:3, 3] - gt_rel[3][:3, 3])
    assert err < 0.08, err


def test_lfa_fused_mapping_stride(lfa_sequence):
    """mapping_skip_frame > 1 in the fused dlo_lfa coupling: skipped scans
    output the odometry composed onto the last map correction (A-LOAM's
    aft_mapped_to_init_high_frec), mapped scans still correct drift, and the
    world maps only grow on mapped scans."""
    import dataclasses

    import jax.numpy as jnp

    from lv_slam_tpu.lfa.fused import run_sequence_lfa

    scans, gt = lfa_sequence
    gt_rel = np.einsum("ij,njk->nik", np.linalg.inv(gt[0]), gt).astype(np.float32)
    noisy = gt_rel.copy()
    for i in range(1, len(scans)):
        noisy[i:, :3, 3] += np.float32(0.03)

    cap = 32768
    clouds = [PointCloud.from_numpy(s, cap=cap) for s in scans]
    xyz = jnp.stack([c.xyz for c in clouds])
    mask = jnp.stack([c.mask for c in clouds])
    cfg2 = dataclasses.replace(_CFG, mapping_skip_frame=2)

    refined, state = run_sequence_lfa(
        xyz, mask, cfg2, odom_poses=jnp.asarray(noisy), return_state=True
    )
    refined = np.asarray(refined)

    # skipped scans (odd scan_idx): pose == map_pose @ inv(last_odom) @ odom
    # where (map_pose, last_odom) come from the preceding mapped scan. Scans
    # 1,3,5,... are skipped (scan_idx % 2 != 0); verify scan 1 against the
    # init state (map_pose = last_odom = odom0).
    want1 = gt_rel[0] @ np.linalg.inv(gt_rel[0]) @ noisy[1]
    np.testing.assert_allclose(refined[1], want1, atol=1e-4)

    # refinement still corrects the accumulated drift at half rate
    err_in = np.linalg.norm(noisy[1:, :3, 3] - gt_rel[1:, :3, 3], axis=1)
    err_out = np.linalg.norm(refined[1:, :3, 3] - gt_rel[1:, :3, 3], axis=1)
    assert err_out[-1] < err_in[-1] * 0.6, (err_in[-1], err_out[-1])

    # the map tables grew on mapped scans only: run stride=1 for comparison
    _, state1 = run_sequence_lfa(
        xyz, mask, _CFG, odom_poses=jnp.asarray(noisy), return_state=True
    )
    def _n_valid(tbl):
        t = np.asarray(tbl.table).reshape(tbl.table.shape[0], -1, 4)
        return int((t[..., 3] > 0).sum())

    n2 = _n_valid(state.surf_table)
    n1 = _n_valid(state1.surf_table)
    assert n2 < n1, (n2, n1)


def test_lfa_crop_interval_gates_table_sweep(lfa_sequence):
    """`crop_interval` defers the full-table crop sweep until the pose has
    moved that far (A-LOAM re-centers its cube grid only near a boundary,
    laserMapping.cpp). At the production geometry the crop is query-
    invisible: crop_radius (150) exceeds sensor range (~120) + the 8-cell
    probe reach, so any point far enough to be cropped can never sit in a
    probed cell. This stress test shrinks the radius INSIDE the sensor
    range to force cropping on a short drive — there the two settings see
    genuinely different (both valid) feature sets, so poses agree to the
    few-mm scale of the extra correspondences, not bit-exactly."""
    import dataclasses

    import jax.numpy as jnp

    from lv_slam_tpu.lfa.fused import run_sequence_lfa

    scans, gt = lfa_sequence
    gt_rel = np.einsum("ij,njk->nik", np.linalg.inv(gt[0]), gt).astype(np.float32)
    cap = 32768
    clouds = [PointCloud.from_numpy(s, cap=cap) for s in scans]
    xyz = jnp.stack([c.xyz for c in clouds])
    mask = jnp.stack([c.mask for c in clouds])

    def _n_valid(tbl):
        t = np.asarray(tbl.table).reshape(tbl.table.shape[0], -1, 4)
        return int((t[..., 3] > 0.5).sum())

    # tight radius so the ~7 m drive pushes early points past it
    results = {}
    for interval in (0.0, 1e6):
        cfg = dataclasses.replace(_CFG, crop_radius=20.0, crop_interval=interval)
        refined, state = run_sequence_lfa(
            xyz, mask, cfg, odom_poses=jnp.asarray(gt_rel), return_state=True
        )
        results[interval] = (np.asarray(refined), _n_valid(state.surf_table))

    # every-scan crop removed points the gated run retained
    assert results[1e6][1] > results[0.0][1], (results[0.0][1], results[1e6][1])
    # and tracking is unaffected: the trajectories agree to the few-mm
    # scale of the extra in-range correspondences (measured max ~11 mm on
    # this 7 m drive; production-geometry crops are exactly invisible)
    np.testing.assert_allclose(
        results[1e6][0][:, :3, 3], results[0.0][0][:, :3, 3], atol=5e-2
    )
    # both settings still track the ground truth
    gt_rel_t = gt_rel[: len(results[0.0][0]), :3, 3]
    for interval, (ref, _) in results.items():
        err = np.linalg.norm(ref[:, :3, 3] - gt_rel_t, axis=1).max()
        assert err < 0.15, (interval, err)
