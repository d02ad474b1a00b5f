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


def _run_fused(scan_files, image_files, cfg, use_lfa, chunk, tr, optimize_every,
               vocabulary, viz=None):
    """Chunked device-resident pipeline: the dlo and lfa lax.scan programs
    process `chunk` scans per dispatch, threading their carry state between
    chunks (exact equality with the unchunked run); the global graph consumes
    the refined poses on the host as usual."""
    import jax.numpy as jnp

    from lv_slam_tpu import native
    from lv_slam_tpu.core.cloud import PointCloud
    from lv_slam_tpu.odometry.fused import run_sequence_fused
    from lv_slam_tpu.pipeline.backend import GlobalGraph
    from lv_slam_tpu.pipeline.fused_chain import run_sequence_chain

    from lv_slam_tpu.pipeline.async_backend import AsyncBackend

    tr_mat = np.eye(4)
    tr_mat[:3, :4] = tr[:3, :4]
    backend = GlobalGraph(
        cfg.graph, cfg.loop, calib_tr=tr_mat, vocabulary=vocabulary,
        prefilter_cfg=cfg.prefilter,
    )
    # the backend (pose fetch + keyframe windows + loop dispatch + LM) runs
    # on its own worker thread, like the reference's backend nodelet — the
    # producer below only dispatches device programs
    async_b = AsyncBackend(backend)
    cap = cfg.prefilter.raw_cap
    odo_state = chain_state = None
    poses = []
    seq = 0
    pending = None
    t0 = time.perf_counter()

    def _drain_work(p):
        """Fetch chunk k-1's poses and run its backend host work — executes
        on the AsyncBackend worker, overlapping the producer's device
        dispatches (the reference's nodelets pipeline the same way)."""
        p_seq, n, refined, cloud, imgs = p
        refined_np = np.asarray(refined, np.float64)
        backend.add_scan_batch(
            p_seq, np.arange(p_seq, p_seq + n) * 0.1, refined_np,
            cloud, images=imgs, filtered=True,
        )
        for i in range(n):
            if (p_seq + i + 1) % optimize_every == 0:
                backend.optimize()
        poses.extend(refined_np)
        if viz is not None:
            viz.publish(trajectory=np.stack(poses))
            viz.publish_backend(backend)
        rate = (p_seq + n) / (time.perf_counter() - t0)
        print(f"scan {p_seq + n}/{len(scan_files)}  {rate:.1f} scans/s")

    def drain(p):
        async_b.submit(_drain_work, p)

    def flush(buf):
        nonlocal odo_state, chain_state, seq, pending
        clouds = [PointCloud.from_numpy(s, cap=cap) for s in buf]
        xyz = jnp.stack([c.xyz for c in clouds])
        mask = jnp.stack([c.mask for c in clouds])
        inten = jnp.stack([c.intensity for c in clouds])
        stamps = (jnp.arange(len(buf), dtype=jnp.float32) + seq) * 0.1
        if use_lfa and cfg.lfa is not None:
            # fused dlo+lfa chain: ONE device program per chunk; the lfa
            # stage consumes the RAW scan like the reference's A-LOAM
            # (ascanRegistration subscribes to /velodyne_points and applies
            # only its own minimum_range cut)
            (odom, refined, filt), chain_state = run_sequence_chain(
                xyz, mask, stamps, cfg.odometry, cfg.prefilter, cfg.lfa,
                init_state=chain_state, return_state=True,
                inten=inten, return_filtered=True,
            )
        else:
            (odom, filt), odo_state = run_sequence_fused(
                xyz, mask, stamps, cfg.odometry, cfg.prefilter,
                init_state=odo_state, return_state=True,
                inten=inten, return_filtered=True,
            )
            refined = odom
        # the backend consumes /filtered_points (dlo_lfa_ggo_kitti.launch:88):
        # the prefilter chain is folded into the chunk-level window-group
        # programs (backend.add_scan_batch) — no per-scan device slicing
        imgs = None
        if image_files:
            from lv_slam_tpu.io.kitti import read_image_gray

            imgs = [
                read_image_gray(image_files[seq + i])
                if seq + i < len(image_files) else None
                for i in range(len(clouds))
            ]
            shapes = {im.shape for im in imgs if im is not None}
            if all(im is not None for im in imgs) and len(shapes) == 1:
                # uniform chunk: upload the uint8 stack once so the backend
                # batch-extracts ORB in one dispatch (see add_scan_batch)
                imgs = jnp.asarray(np.stack(imgs).astype(np.uint8))
        prev, pending = pending, (
            seq, len(clouds), refined, PointCloud(*filt), imgs
        )
        if prev is not None:
            drain(prev)
        seq += len(buf)

    buf = []
    with native.ScanPrefetcher(scan_files) as prefetcher:
        for scan in prefetcher:
            buf.append(scan)
            if len(buf) == chunk:
                flush(buf)
                buf = []
    if buf:
        flush(buf)
    if pending is not None:
        drain(pending)
    async_b.finish()
    async_b.drain()  # joins the worker; `backend` is owned by us again
    return poses, backend


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
        help="pretrained BoW vocabulary: .npz from scripts/train_vocab.py (a "
        "shipped asset lives at lv_slam_tpu/assets/vocab_synthetic_512.npz) "
        "or a DBoW3 OpenCV-YAML .yml/.yml.gz (the reference's real-image "
        "config/vocabulary.yml.gz loads directly); without it the loop "
        "detector trains one on the sequence's own keyframes "
        "(LoopDetectorConfig.auto_train_vocab)",
    )
    ap.add_argument(
        "--fused", action="store_true",
        help="chunked device-resident pipeline: dlo and lfa run as lax.scan "
        "programs over fixed-size chunks with state threaded between chunks "
        "(one dispatch per chunk per stage instead of several per scan)",
    )
    ap.add_argument(
        "--live-port", type=int, default=None,
        help="serve live trajectory/graph monitoring (RViz analog) on this "
        "port; 0 picks a free port (utils/live_viz.py)",
    )
    ap.add_argument(
        "--chunk", type=int, default=32,
        help="scans per fused chunk (HBM bound: stacked (chunk,cap,3) clouds "
        "tile-pad the minor dim 3 up to 128 on TPU — 42.7x the logical size)",
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
    image_files = kitti.list_sequence_images(args.dataset, args.seq)
    if args.max_scans:
        scan_files = scan_files[: args.max_scans]
        image_files = image_files[: args.max_scans]
    if image_files:
        print(f"{len(image_files)} camera frames (visual loop closure active)")

    vocabulary = None
    if args.vocab:
        from lv_slam_tpu.graph.bow import Vocabulary

        if args.vocab.endswith((".yml", ".yml.gz", ".yaml", ".yaml.gz")):
            vocabulary = Vocabulary.load_dbow3(args.vocab)
        else:
            vocabulary = Vocabulary.load(args.vocab)

    cfg = PipelineConfig(calib_tr=tuple(tr[:3, :4].reshape(-1)))

    from lv_slam_tpu import native

    viz = None
    if args.live_port is not None:
        from lv_slam_tpu.utils.live_viz import LiveViz

        viz = LiveViz(port=args.live_port)
        print(f"live view: http://127.0.0.1:{viz.start()}/")

    t0 = time.perf_counter()
    if args.fused:
        poses, backend = _run_fused(
            scan_files, image_files, cfg, not args.no_lfa, args.chunk, tr,
            args.optimize_every, vocabulary, viz=viz,
        )
    else:
        slam = LvSlam(
            cfg, use_lfa=not args.no_lfa, optimize_every=args.optimize_every,
            vocabulary=vocabulary,
        )
        poses = []
        # native prefetcher keeps the device fed (numpy fallback if unbuilt)
        with native.ScanPrefetcher(scan_files) as prefetcher:
            for i, scan in enumerate(prefetcher):
                img = (
                    kitti.read_image_gray(image_files[i])
                    if image_files and i < len(image_files) else None
                )
                pose = slam.process(scan, i * 0.1, image=img)
                poses.append(pose)
                if viz is not None and (i + 1) % 10 == 0:
                    viz.publish(trajectory=np.stack(poses))
                    viz.publish_backend(slam.backend)
                if i % 50 == 0:
                    rate = (i + 1) / (time.perf_counter() - t0)
                    print(f"scan {i}/{len(scan_files)}  {rate:.1f} scans/s")
        slam.finalize()
        backend = slam.backend

    out = args.output
    os.makedirs(out, exist_ok=True)
    kitti.write_pose_file(
        os.path.join(out, f"KITTI_{args.seq}_odom.txt"),
        kitti.velo_to_cam_poses(np.stack(poses), tr),
    )
    backend.dump(os.path.join(out, "dump"))
    backend.save_map(os.path.join(out, "map.pcd"), resolution=0.05)
    elapsed = time.perf_counter() - t0
    print(f"done: {len(poses)} scans in {elapsed:.1f}s ({len(poses)/elapsed:.1f} scans/s)")
    print(f"outputs in {out}/")


if __name__ == "__main__":
    main()
