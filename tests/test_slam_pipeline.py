import numpy as np

from lv_slam_tpu.config import (
    GraphConfig,
    LfaConfig,
    LoopDetectorConfig,
    NDTConfig,
    OdometryConfig,
    PipelineConfig,
    PrefilterConfig,
)
from lv_slam_tpu.io import synthetic
from lv_slam_tpu.pipeline.slam import LvSlam


def _small_cfg():
    return PipelineConfig(
        prefilter=PrefilterConfig(raw_cap=32768, out_cap=32768),
        odometry=OdometryConfig(ndt=NDTConfig(leaf_cap=16384, lut_extent=256)),
        lfa=LfaConfig(
            scan_line=32, edge_cap=2048, planar_cap=4096,
            map_edge_cap=16384, map_planar_cap=32768,
        ),
        loop=LoopDetectorConfig(),
        graph=GraphConfig(keyframe_delta_trans=3.0, keyframe_cap=64, edge_cap=256,
                          solver_num_iterations=32),
    )


def test_full_pipeline_end_to_end(small_sequence):
    """dlo -> lfa -> ggo wiring: runs, produces keyframes and a trajectory
    consistent with ground truth."""
    scans, gt, _ = small_sequence
    slam = LvSlam(_small_cfg(), optimize_every=4, scan_cap=32768)
    for i, s in enumerate(scans):
        slam.process(s, i * 0.1)
    slam.finalize()

    assert len(slam.dlo_poses) == len(scans)
    assert len(slam.lfa_poses) == len(scans)
    assert len(slam.backend.keyframes) >= 1
    traj = slam.trajectory()
    gt_rel = np.einsum("ij,njk->nik", np.linalg.inv(gt[0]), gt)
    # final refined odometry within bounds of ground truth
    final = slam.lfa_poses[-1]
    err = np.linalg.norm(final[:3, 3] - gt_rel[len(scans) - 1][:3, 3])
    assert err < 0.3, err


def test_pipeline_dlo_only(small_sequence):
    scans, gt, _ = small_sequence
    cfg = _small_cfg()
    slam = LvSlam(cfg, use_lfa=False, optimize_every=4, scan_cap=32768)
    for i, s in enumerate(scans):
        slam.process(s, i * 0.1)
    slam.finalize()
    gt_rel = np.einsum("ij,njk->nik", np.linalg.inv(gt[0]), gt)
    err = np.linalg.norm(slam.dlo_poses[-1][:3, 3] - gt_rel[len(scans) - 1][:3, 3])
    assert err < 0.2, err


def test_fused_driver_backend_cloud_matches_host_prefilter():
    """The batched prefilter helper (jit_cache.prefilter_chunk_fn) must
    equal the host driver's per-scan prefilter exactly — both stand in for
    /filtered_points (dlo_lfa_ggo_kitti.launch:88). The fused drivers now
    take the filtered product from the odometry program itself; THAT path's
    parity is pinned by
    test_fused.py::test_return_filtered_matches_standalone_prefilter."""
    import jax.numpy as jnp

    from lv_slam_tpu.config import PrefilterConfig
    from lv_slam_tpu.core.cloud import PointCloud
    from lv_slam_tpu.odometry.dlo import _prefilter_cache
    from lv_slam_tpu.utils.jit_cache import prefilter_chunk_fn

    rng = np.random.default_rng(3)
    cfg = PrefilterConfig(raw_cap=4096, out_cap=4096)
    scans = [rng.uniform(-40, 40, size=(3000, 4)).astype(np.float32) for _ in range(3)]
    clouds = [PointCloud.from_numpy(s, cap=cfg.raw_cap) for s in scans]
    batched = prefilter_chunk_fn(cfg)(
        PointCloud(
            jnp.stack([c.xyz for c in clouds]),
            jnp.stack([c.intensity for c in clouds]),
            jnp.stack([c.mask for c in clouds]),
        )
    )
    host = _prefilter_cache(cfg)
    for i, c in enumerate(clouds):
        ref = host(c)
        np.testing.assert_array_equal(np.asarray(batched.mask[i]), np.asarray(ref.mask))
        np.testing.assert_allclose(
            np.asarray(batched.xyz[i]), np.asarray(ref.xyz), atol=1e-5
        )
