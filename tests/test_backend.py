import os

import numpy as np
import pytest

from lv_slam_tpu.config import GraphConfig, LoopDetectorConfig
from lv_slam_tpu.core import se3
from lv_slam_tpu.core.cloud import PointCloud
from lv_slam_tpu.io import synthetic
from lv_slam_tpu.pipeline.backend import GlobalGraph

import jax.numpy as jnp


@pytest.fixture(scope="module")
def circle_run():
    """A closed-circle drive with drifting odometry: scans + GT + noisy odom."""
    n = 56
    radius = 20.0
    # dense world: loop verification needs enough vertical structure to pin
    # the pose (sparse scenes are ground-degenerate for any fitness metric)
    world = synthetic.make_world(seed=9, n_buildings=140, n_poles=240)
    angles = np.linspace(0, 2 * np.pi, n, endpoint=False)
    gt = []
    for a in angles:
        yaw = a + np.pi / 2
        c, s = np.cos(yaw), np.sin(yaw)
        pose = np.eye(4, dtype=np.float32)
        pose[:3, :3] = [[c, -s, 0], [s, c, 0], [0, 0, 1]]
        pose[:3, 3] = [radius * np.cos(a), radius * np.sin(a), 1.73]
        gt.append(pose)
    gt = np.stack(gt)
    rays = synthetic.hdl64_rays(32, 450)
    scans = [synthetic.simulate_scan(world, gt[i], rays, seed=100 + i) for i in range(n)]
    images = [synthetic.render_camera_image(world, gt[i], seed=9) for i in range(n)]

    # drifting odometry: relative GT composed with a small systematic yaw bias
    rng = np.random.default_rng(4)
    odoms = [np.linalg.inv(gt[0]) @ gt[0]]
    bias = np.asarray(se3.exp_se3(jnp.asarray([0.01, 0.0, 0.0, 0.0, 0.0, 0.0015], jnp.float32)))
    for i in range(1, n):
        rel = np.linalg.inv(gt[i - 1]) @ gt[i] @ bias
        odoms.append(odoms[-1] @ rel)
    return scans, gt, np.stack(odoms), images


def _build_backend():
    cfg = GraphConfig(
        keyframe_delta_trans=5.0,
        keyframe_cap=64,
        edge_cap=256,
        solver_num_iterations=64,
    )
    loop_cfg = LoopDetectorConfig(
        distance_thresh=10.0,
        accum_distance_thresh=60.0,
        min_edge_interval=5.0,
        fitness_score_thresh=2.0,
    )
    return GlobalGraph(cfg, loop_cfg, keyframe_cloud_cap=65536)


@pytest.mark.slow
def test_backend_loop_closure(circle_run):
    scans, gt, odoms, images = circle_run
    backend = _build_backend()
    for i, scan in enumerate(scans):
        cloud = PointCloud.from_numpy(scan, cap=16384)
        backend.add_scan(i, i * 0.1, odoms[i], cloud, image=images[i])
        if i % 10 == 9:  # the reference's 10 s wall-timer analogue
            backend.optimize()
    backend.finish()
    backend.drain()
    assert len(backend.keyframes) >= 8
    assert len(backend.loops) >= 1, "expected a loop closure on the closed circle"
    # the visual path was active: keyframes carry ORB descriptors and the
    # accepted loop passed the visual gate
    assert all(kf.descriptor is not None for kf in backend.keyframes)
    assert backend.loops[0].visual_score >= 0.04

    gt_rel = np.einsum("ij,njk->nik", np.linalg.inv(gt[0]), gt)
    errs_before, errs_after = [], []
    for kf in backend.keyframes:
        gt_pose = gt_rel[kf.seq]
        errs_before.append(np.linalg.norm(kf.odom[:3, 3] - gt_pose[:3, 3]))
        errs_after.append(np.linalg.norm(kf.estimate[:3, 3] - gt_pose[:3, 3]))
    # the drifted odometry error must shrink substantially after closure
    assert max(errs_after) < max(errs_before) * 0.6, (max(errs_before), max(errs_after))


def test_backend_dump_and_save_map(circle_run, tmp_path):
    scans, gt, odoms, images = circle_run
    backend = _build_backend()
    for i, scan in enumerate(scans[:20]):
        cloud = PointCloud.from_numpy(scan, cap=16384)
        backend.add_scan(i, i * 0.1, odoms[i], cloud)
    backend.finish()
    backend.drain()

    d = str(tmp_path / "dump")
    assert backend.dump(d)
    assert os.path.exists(os.path.join(d, "graph.g2o"))
    assert os.path.exists(os.path.join(d, "graph.g2o.kernels"))
    assert os.path.exists(os.path.join(d, "special_nodes.csv"))
    assert os.path.exists(os.path.join(d, "ggo_kf_odom.txt"))
    assert os.path.exists(os.path.join(d, "ggo_wf_odom.txt"))
    assert os.path.exists(os.path.join(d, "000000", "cloud.pcd"))
    assert os.path.exists(os.path.join(d, "000000", "data"))

    # wf file covers (nearly) every scan
    wf = np.loadtxt(os.path.join(d, "ggo_wf_odom.txt"))
    assert wf.shape[0] >= 15 and wf.shape[1] == 12

    map_path = str(tmp_path / "map.pcd")
    assert backend.save_map(map_path, resolution=0.2)
    from lv_slam_tpu.io.pcd import read_pcd

    pts = read_pcd(map_path)
    assert pts.shape[0] > 1000


def test_g2o_checkpoint_resume(circle_run, tmp_path):
    """dump -> load -> re-optimize (the reference's offline re-optimization
    authoring flow, `graph_slam.cpp:333-363`, `keyframe.cpp:94-201`)."""
    scans, gt, odoms, images = circle_run
    backend = _build_backend()
    backend.cfg = GraphConfig(
        keyframe_delta_trans=5.0, keyframe_cap=64, edge_cap=256,
        solver_num_iterations=64, enable_gps=True,
        enable_imu_orientation=True, enable_imu_acceleration=True,
    )
    for i, scan in enumerate(scans[:20]):
        backend.add_scan(
            i, i * 0.1, odoms[i], PointCloud.from_numpy(scan, cap=16384),
            gps_xyz=gt[i][:3, 3] + [500.0, 300.0, 0.0],
            imu_quat_wxyz=np.array([1.0, 0.0, 0.0, 0.0]),
            imu_acceleration=np.array([0.0, 0.0, 9.81]),
            floor_coeffs=np.array([0.0, 0.0, 1.0, 1.73]),
        )
    backend.finish()
    backend.drain()
    d = str(tmp_path / "dump")
    backend.dump(d)

    from lv_slam_tpu.graph import g2o_io, pose_graph as pg
    from lv_slam_tpu.pipeline.backend import load_dump

    loaded = g2o_io.load_graph(os.path.join(d, "graph.g2o"), node_cap=64, edge_cap=256)
    result = pg.optimize_pose_graph(loaded, 16)
    assert np.isfinite(float(result.chi2_after))

    # full resume: keyframes with clouds re-bound to graph nodes
    resumed = load_dump(d, GraphConfig(keyframe_cap=64, edge_cap=256), keyframe_cloud_cap=65536)
    assert len(resumed.keyframes) == len(backend.keyframes)
    for a, b in zip(resumed.keyframes, backend.keyframes):
        assert a.node_id == b.node_id and a.seq == b.seq
        np.testing.assert_allclose(a.odom, b.odom, atol=1e-5)
        assert int(a.cloud.count()) == int(b.cloud.count())
        # optional sensor annotations round-trip (`keyframe.cpp:66-85`)
        for field in ("floor_coeffs", "utm_coord", "acceleration", "orientation"):
            bv = getattr(b, field)
            av = getattr(a, field)
            if bv is None:
                assert av is None, field
            else:
                np.testing.assert_allclose(av, bv, atol=1e-6, err_msg=field)
    # re-optimization on the resumed graph works and map export still runs
    r2 = pg.optimize_pose_graph(resumed.graph, 16)
    assert np.isfinite(float(r2.chi2_after))
    assert resumed.save_map(str(tmp_path / "resumed_map.pcd"), resolution=0.3)


@pytest.mark.slow
def test_add_scan_batch_parity(circle_run):
    """Chunk-level `add_scan_batch` matches the per-scan `add_scan` path fed
    prefiltered slices: identical keyframe schedule, equivalent keyframe
    clouds (window-union centroid/dedup variants agree to within the voxel
    radius), and the same loop closure outcome. Covers BOTH batch layouts:
    raw chunks (the group program prefilters) and the production
    `filtered=True` path (transposed pre-filtered stacks, as produced by
    `run_sequence_fused(return_filtered=True)`)."""
    import jax

    from lv_slam_tpu.config import PrefilterConfig
    from lv_slam_tpu.ops.prefilter import prefilter

    scans, gt, odoms, images = circle_run
    pf_cfg = PrefilterConfig(raw_cap=16384, out_cap=16384)
    pf = jax.jit(lambda c: prefilter(c, pf_cfg))

    ref = _build_backend()
    ref.prefilter_cfg = pf_cfg
    filt_clouds = []
    for i, scan in enumerate(scans):
        cloud = pf(PointCloud.from_numpy(scan, cap=16384))
        filt_clouds.append(cloud)
        ref.add_scan(i, i * 0.1, odoms[i], cloud, image=images[i])
        if i % 10 == 9:  # periodic optimize keeps loop-verify guesses sane
            ref.optimize()
    ref.finish()
    ref.drain()

    def run_batch(filtered):
        bat = _build_backend()
        bat.prefilter_cfg = pf_cfg
        chunk = 16
        for s in range(0, len(scans), chunk):
            e = min(s + chunk, len(scans))
            if filtered:
                stacked = PointCloud(
                    jnp.stack([jnp.swapaxes(filt_clouds[k].xyz, 0, 1) for k in range(s, e)]),
                    jnp.stack([filt_clouds[k].intensity for k in range(s, e)]),
                    jnp.stack([filt_clouds[k].mask for k in range(s, e)]),
                )
            else:
                clouds = [PointCloud.from_numpy(scans[k], cap=16384) for k in range(s, e)]
                stacked = PointCloud(
                    jnp.stack([c.xyz for c in clouds]),
                    jnp.stack([c.intensity for c in clouds]),
                    jnp.stack([c.mask for c in clouds]),
                )
            # device-resident uint8 image stack: exercises the batched-ORB path
            img_stack = jnp.asarray(np.stack(images[s:e]).astype(np.uint8))
            bat.add_scan_batch(
                s, np.arange(s, e) * 0.1, odoms[s:e], stacked,
                images=img_stack, filtered=filtered,
            )
            bat.optimize()
        bat.finish()
        bat.drain()
        return bat

    assert len(ref.loops) >= 1
    for filtered in (False, True):
        bat = run_batch(filtered)
        assert [k.seq for k in bat.keyframes] == [k.seq for k in ref.keyframes]
        assert len(bat.loops) >= 1, f"filtered={filtered}"
        for kr, kb in zip(ref.keyframes, bat.keyframes):
            assert kb.descriptor is not None
            nr = int(np.asarray(kr.cloud.mask).sum())
            nb = int(np.asarray(kb.cloud.mask).sum())
            assert abs(nr - nb) < 0.15 * max(nr, nb), (filtered, kr.seq, nr, nb)
            assert np.linalg.norm(kr.estimate[:3, 3] - kb.estimate[:3, 3]) < 1.0
