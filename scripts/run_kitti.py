#!/usr/bin/env python
"""Run the dlo_lfa_ggo pipeline over a KITTI odometry sequence.

Equivalent of the reference's `launch/dlo_lfa_ggo_kitti.launch` + the batch
runner `scripts/lidar_odom_kitti.sh`: reads velodyne .bin scans + calib,
runs the pipeline, writes the odometry file in the camera frame, the dump
directory, and the exported map.

Usage:
    python scripts/run_kitti.py --dataset /path/to/KITTI/odometry/dataset \
        --seq 04 --output out/ [--no-lfa] [--max-scans N]
"""

import argparse
import os
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", required=True)
    ap.add_argument("--seq", default="04")
    ap.add_argument("--output", default="out")
    ap.add_argument("--no-lfa", action="store_true")
    ap.add_argument("--max-scans", type=int, default=None)
    ap.add_argument("--optimize-every", type=int, default=100)
    ap.add_argument(
        "--vocab", default=None,
        help="pretrained BoW vocabulary (.npz from scripts/train_vocab.py); "
        "without it the loop detector trains one on the sequence's own "
        "keyframes (LoopDetectorConfig.auto_train_vocab)",
    )
    args = ap.parse_args()

    sys.path.insert(0, ".")
    from lv_slam_tpu.config import PipelineConfig
    from lv_slam_tpu.io import kitti
    from lv_slam_tpu.pipeline.slam import LvSlam

    seq_dir = os.path.join(args.dataset, "sequences", args.seq)
    calib = kitti.read_calib(os.path.join(seq_dir, "calib.txt"))
    tr = kitti.tr_to_matrix(calib.get("Tr"))
    scan_files = kitti.list_sequence_scans(args.dataset, args.seq)
    if args.max_scans:
        scan_files = scan_files[: args.max_scans]

    vocabulary = None
    if args.vocab:
        from lv_slam_tpu.graph.bow import Vocabulary

        vocabulary = Vocabulary.load(args.vocab)

    cfg = PipelineConfig(calib_tr=tuple(tr[:3, :4].reshape(-1)))
    slam = LvSlam(
        cfg, use_lfa=not args.no_lfa, optimize_every=args.optimize_every,
        vocabulary=vocabulary,
    )

    from lv_slam_tpu import native

    poses = []
    t0 = time.perf_counter()
    # native prefetcher keeps the device fed (numpy fallback if unbuilt)
    with native.ScanPrefetcher(scan_files) as prefetcher:
        for i, scan in enumerate(prefetcher):
            pose = slam.process(scan, i * 0.1)
            poses.append(pose)
            if i % 50 == 0:
                rate = (i + 1) / (time.perf_counter() - t0)
                print(f"scan {i}/{len(scan_files)}  {rate:.1f} scans/s")
    slam.finalize()

    out = args.output
    os.makedirs(out, exist_ok=True)
    kitti.write_pose_file(
        os.path.join(out, f"KITTI_{args.seq}_odom.txt"),
        kitti.velo_to_cam_poses(np.stack(poses), tr),
    )
    slam.backend.dump(os.path.join(out, "dump"))
    slam.backend.save_map(os.path.join(out, "map.pcd"), resolution=0.05)
    elapsed = time.perf_counter() - t0
    print(f"done: {len(poses)} scans in {elapsed:.1f}s ({len(poses)/elapsed:.1f} scans/s)")
    print(f"outputs in {out}/")


if __name__ == "__main__":
    main()
