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
