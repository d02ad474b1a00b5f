#!/usr/bin/env python
"""End-to-end demo on the synthetic world: full dlo_lfa_ggo pipeline with
camera images, loop closure, dump + map export, and evaluation against the
simulator's ground truth. Run with no arguments.
"""

import argparse
import os
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scans", type=int, default=60)
    ap.add_argument("--output", default="out_synth")
    ap.add_argument("--no-lfa", action="store_true")
    ap.add_argument(
        "--trajectory", choices=("figure8", "circle"), default="figure8",
        help="circle = closed loop sized to the scan count, run with "
        "kylin-scale keyframe/loop gates so visual loop closure fires",
    )
    ap.add_argument(
        "--live-port", type=int, default=None,
        help="serve live trajectory/map monitoring (RViz analog) on this "
        "port; 0 picks a free port (utils/live_viz.py)",
    )
    args = ap.parse_args()

    sys.path.insert(0, ".")
    from lv_slam_tpu.config import (
        GraphConfig, LoopDetectorConfig, OdometryConfig, PipelineConfig,
    )
    from lv_slam_tpu.io import kitti, synthetic
    from lv_slam_tpu.pipeline.slam import LvSlam

    print("simulating...")
    if args.trajectory == "circle":
        # close the circle within the run (~10% overlap past the start)
        radius = args.scans * 1.0 / (2.2 * np.pi)
        world = synthetic.make_world(seed=5)
        gt = synthetic.circle_trajectory(args.scans, step=1.0, radius=radius)
        rays = synthetic.hdl64_rays()
        scans = [
            synthetic.simulate_scan(world, gt[i], rays, seed=5 + i)
            for i in range(args.scans)
        ]
        cfg = PipelineConfig(
            odometry=OdometryConfig(keyframe_delta_trans=2.0),
            loop=LoopDetectorConfig(
                distance_thresh=5.0, accum_distance_thresh=25.0,
                min_edge_interval=15.0,
            ),
            graph=GraphConfig(keyframe_delta_trans=2.0),
        )
    else:
        scans, gt, world = synthetic.make_sequence(args.scans, seed=5, trajectory="figure8")
        cfg = PipelineConfig()
    images = [synthetic.render_camera_image(world, gt[i], seed=5) for i in range(args.scans)]

    viz = None
    if args.live_port is not None:
        from lv_slam_tpu.utils.live_viz import LiveViz

        viz = LiveViz(port=args.live_port)
        print(f"live view: http://127.0.0.1:{viz.start()}/")

    slam = LvSlam(cfg, use_lfa=not args.no_lfa, optimize_every=50, scan_cap=65536)
    t0 = time.perf_counter()
    poses = []
    for i, s in enumerate(scans):
        poses.append(slam.process(s, i * 0.1, image=images[i]))
        if viz is not None and (i + 1) % 10 == 0:
            viz.publish(trajectory=np.stack(poses))
            viz.publish_backend(slam.backend)
    slam.finalize()
    elapsed = time.perf_counter() - t0
    if viz is not None:
        viz.publish(trajectory=np.stack(poses))
        viz.publish_backend(slam.backend)

    est = np.stack(poses)
    gt_rel = np.einsum("ij,njk->nik", np.linalg.inv(gt[0]), gt)
    t_err, r_err = kitti.kitti_seq_error(gt_rel, est)
    ate = np.linalg.norm(est[:, :3, 3] - gt_rel[:, :3, 3], axis=1)
    print(f"{args.scans} scans in {elapsed:.1f}s ({args.scans/elapsed:.1f} scans/s)")
    print(f"ATE mean/max {ate.mean():.3f}/{ate.max():.3f} m; loops: {len(slam.backend.loops)}")

    out = args.output
    os.makedirs(out, exist_ok=True)
    kitti.write_pose_file(os.path.join(out, "odom.txt"), est)
    kitti.write_pose_file(os.path.join(out, "gt.txt"), gt_rel)
    slam.backend.dump(os.path.join(out, "dump"))
    slam.backend.save_map(os.path.join(out, "map.pcd"), resolution=0.1)
    print(f"outputs in {out}/")


if __name__ == "__main__":
    main()
