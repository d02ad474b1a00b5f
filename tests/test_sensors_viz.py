import os

import numpy as np

from lv_slam_tpu.config import GraphConfig, LoopDetectorConfig
from lv_slam_tpu.core.cloud import PointCloud
from lv_slam_tpu.pipeline.backend import GlobalGraph
from lv_slam_tpu.utils.viz import export_backend_graph, export_trajectory_svg


def _mini_backend(enable_gps=True):
    cfg = GraphConfig(
        keyframe_delta_trans=2.0, keyframe_cap=32, edge_cap=64,
        solver_num_iterations=32, enable_gps=enable_gps,
    )
    return GlobalGraph(cfg, LoopDetectorConfig(), keyframe_cloud_cap=8192)


def _feed(backend, rng, n=10, gps=None):
    pts_base = rng.normal(size=(2000, 3)).astype(np.float32) * [20, 20, 2]
    for i in range(n):
        odom = np.eye(4)
        odom[0, 3] = i * 2.5
        cloud = PointCloud.from_numpy(pts_base + [i * 2.5, 0, 0], cap=4096)
        backend.add_scan(
            i, i * 0.1, odom, cloud,
            gps_xyz=None if gps is None else gps[i],
        )
    backend.finish()
    backend.drain()


def test_gps_priors_attach_and_constrain(rng):
    backend = _mini_backend()
    # GPS (relative to the zero_utm fix, like the reference) reports a
    # growing +y drift the odometry doesn't see
    gps = [np.array([i * 2.5, 0.5 * i, 0.0]) for i in range(10)]
    _feed(backend, rng, gps=gps)
    assert any(kf.utm_coord is not None for kf in backend.keyframes)
    assert backend.zero_utm is not None
    # optimized keyframes bend toward the GPS drift signal
    last = backend.keyframes[-1]
    assert last.estimate[1, 3] > 0.3, last.estimate[:3, 3]


def test_viz_exports(rng, tmp_path):
    backend = _mini_backend(enable_gps=False)
    _feed(backend, rng)
    ply = str(tmp_path / "graph.ply")
    export_backend_graph(backend, ply)
    text = open(ply).read()
    assert "element vertex" in text and "element edge" in text

    svg = str(tmp_path / "traj.svg")
    traj = np.stack([kf.estimate for kf in backend.keyframes])
    export_trajectory_svg(svg, traj, traj)
    assert os.path.getsize(svg) > 200
