"""Benchmark: flagship-pipeline scan-in/pose-out throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference runs KITTI bags in real time at the Velodyne rate
(10 scans/s, `README.md:128,133`) on a desktop CPU; `vs_baseline` is the
speedup over that 10 scans/s real-time rate. The driver-set north star is
>= 100 scans/s/chip (BASELINE.json).

BENCH_MODE selects the measured topology:
- full  (default): dlo -> lfa -> ggo — the reference's flagship
  `dlo_lfa_ggo_kitti.launch` stack, measured CONFIG-IDENTICAL to
  `scripts/run_kitti.py --fused`: flagship `PipelineConfig()` defaults,
  prefilter inside the timed fused-odometry program, LFA on the raw scans
  (A-LOAM subscribes to /velodyne_points), the backend fed batched-
  prefiltered clouds (= /filtered_points) WITH camera images.
- dlo_ggo: the same without the LFA stage (its delta vs `full` is the LFA
  cost).
- fused: odometry only; host: per-scan host-driver odometry.

The default invocation is the HEADLINE ONLY (warmup + BENCH_REPS=2 timed
reps) so it completes well inside the test rig's relay MTBF (~15 min);
the heavier extras are opt-in separate invocations: BENCH_DELTA=1 adds
the LFA-on/off delta (2 extra passes), BENCH_FLEET=1 adds the multi-lane
fleet retention measurement.

The workload is a KITTI-density circular drive: 64 rings x 2000 azimuth
(~115k raw returns/scan — the prefilter capacities are exercised for real)
around a 24.5 m-radius circle, so the vehicle revisits its start after
~154 m of travel. With the flagship loop gates (20 m distance / 100 m
accumulated travel / 50 m interval, `launch/dlo_lfa_ggo_kitti.launch:104-106`)
the final keyframes trigger REAL loop closures: ORB keyframe descriptors,
auto-trained-BoW ranking (>= vocab_min_keyframes keyframes carry
descriptors), the coarse-to-fine NDT verification ladder, and loop edges in
the optimized graph — the bench fails if no loop is detected.

Accuracy gate: the devkit-style relative translation error on the synthetic
ground truth must stay under 1% (the reference-parity bar is t <= 0.0094,
BASELINE.md) and the final-pose drift under 2% of distance — a diverged
run's throughput is meaningless.
"""

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/lv_slam_jax")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402


def _devkit_t_err(gt_rel: np.ndarray, est: np.ndarray) -> float:
    """KITTI-devkit-style relative translation error; segment lengths scale
    down for short synthetic runs (devkit's own 100-800 m segments need a
    real sequence)."""
    from lv_slam_tpu.io import kitti

    total = float(
        np.linalg.norm(gt_rel[1:, :3, 3] - gt_rel[:-1, :3, 3], axis=1).sum()
    )
    lengths = None
    if total < 850.0:
        lengths = tuple(f * total for f in (0.25, 0.5, 0.75)) or None
    t_err, _ = kitti.kitti_seq_error(gt_rel, est, step=5, lengths=lengths)
    return float(t_err)


def _probe_rig(timeout_s: float = 75.0) -> None:
    """Fail fast with ONE structured JSON line if the TPU relay is wedged.

    The relay can wedge permanently (every device op hangs, even from fresh
    processes — see CLAUDE.md); without this probe a dead rig produces a
    30-frame traceback after minutes of hanging (what happened to
    BENCH_r03.json). A 1-element round trip under a timeout distinguishes
    "pipeline broken" from "rig down"."""
    import threading

    ok = []

    def _touch():
        try:
            x = jax.device_put(np.ones((1,), np.float32))
            v = np.asarray(x + 1.0)
            ok.append(float(v[0]))
        except Exception as exc:  # backend init failure = rig down too
            ok.append(exc)

    t = threading.Thread(target=_touch, daemon=True)
    t.start()
    t.join(timeout_s)
    if not ok or isinstance(ok[0], Exception):
        reason = "probe_timeout" if not ok else f"{type(ok[0]).__name__}: {ok[0]}"[:200]
        mode = os.environ.get("BENCH_MODE", "full")
        metric = {
            "full": "slam_scans_per_sec_per_chip",
            "dlo_ggo": "dlo_ggo_scans_per_sec_per_chip",
        }.get(mode, "dlo_scans_per_sec_per_chip")
        print(json.dumps({
            "metric": metric,
            "value": None,
            "unit": "scans/s",
            "vs_baseline": None,
            "error": "relay_unavailable",
            "extra": {"probe": reason},
        }))
        os._exit(1)


def main():
    mode = os.environ.get("BENCH_MODE", "full")
    n_scans = int(os.environ.get("BENCH_SCANS", "170"))
    _probe_rig()
    import jax.numpy as jnp

    from lv_slam_tpu.config import kitti_flagship_config
    from lv_slam_tpu.core.cloud import PointCloud
    from lv_slam_tpu.io import synthetic

    cfg = kitti_flagship_config()
    # A/B path selection for on-chip sweeps (defaults = shipped config):
    # BENCH_VOXEL_REDUCE=scan|scatter, BENCH_SUBSAMPLE=stride|gather,
    # BENCH_DOWNSAMPLE=DEDUP|VOXELGRID|APPROX_VOXELGRID
    import dataclasses as _dc

    vr = os.environ.get("BENCH_VOXEL_REDUCE")
    sub = os.environ.get("BENCH_SUBSAMPLE")
    ds = os.environ.get("BENCH_DOWNSAMPLE")
    lfa_stride = os.environ.get("BENCH_LFA_STRIDE")
    if vr or sub or ds or lfa_stride:
        pf = _dc.replace(
            cfg.prefilter,
            **({"voxel_reduce": vr} if vr else {}),
            **({"downsample_method": ds} if ds else {}),
        )
        od = _dc.replace(cfg.odometry, **({"subsample_method": sub} if sub else {}))
        lf = _dc.replace(
            cfg.lfa,
            **({"mapping_skip_frame": int(lfa_stride)} if lfa_stride else {}),
        )
        cfg = _dc.replace(cfg, prefilter=pf, odometry=od, lfa=lf)
    # record the EFFECTIVE prefilter path (override or shipped default) so
    # sweep artifacts are comparable without knowing the config history
    extra_ab = {
        "voxel_reduce": cfg.prefilter.voxel_reduce,
        "subsample": cfg.odometry.subsample_method,
        "downsample": cfg.prefilter.downsample_method,
        "lfa_stride": cfg.lfa.mapping_skip_frame,
    }

    world = synthetic.make_world(seed=5)
    # BENCH_TRAJECTORY=double_circle: two laps over the same travel — the
    # MULTI-loop workload (VERDICT r4 #7). Lap 2 revisits lap 1 throughout,
    # so with the flagship gates (100 m accum / 50 m interval / 20 m radius)
    # a 300-scan double circle fires ~3 accepted closures plus gated
    # rejections; the default single circle fires exactly one at the end.
    traj = os.environ.get("BENCH_TRAJECTORY", "circle")
    laps = 2 if traj == "double_circle" else 1
    if traj == "double_circle" and "BENCH_SCANS" not in os.environ:
        n_scans = 300  # 150 m laps: > accum_distance_thresh, 3x min_edge_interval
    gt_poses = synthetic.circle_trajectory(n_scans, step=1.0, laps=laps)
    extra_ab["trajectory"] = traj
    rays = synthetic.hdl64_rays(64, 2000)
    # the ray-traced workload is deterministic in (seed, n_scans, ray grid):
    # cache it on disk — simulation costs ~4 s/scan on this host and is rig
    # overhead, not pipeline time
    tag = "" if laps == 1 else f"_{traj}"
    cache = f"/root/.cache/lv_slam_bench_scans_v1_{n_scans}{tag}.npz"
    try:
        with np.load(cache) as z:
            scans = [z[f"s{i}"] for i in range(n_scans)]
            images = [z[f"i{i}"] for i in range(n_scans)]
    except Exception:
        scans = [
            synthetic.simulate_scan(world, gt_poses[i], rays, seed=5 + i)
            for i in range(n_scans)
        ]
        images = [
            synthetic.render_camera_image(world, gt_poses[i], seed=5)
            for i in range(n_scans)
        ]
        try:
            np.savez(
                cache,
                **{f"s{i}": s for i, s in enumerate(scans)},
                **{f"i{i}": im for i, im in enumerate(images)},
            )
        except Exception:
            pass
    cap = cfg.prefilter.raw_cap
    gt_rel = np.einsum("ij,njk->nik", np.linalg.inv(gt_poses[0]), gt_poses)
    extra = {"mode": mode, "raw_points": int(np.mean([s.shape[0] for s in scans])),
             **extra_ab}

    if mode in ("fused", "full", "dlo_ggo"):
        from lv_slam_tpu.odometry.fused import run_sequence_fused

        # host-side padded buffers once; the timed chain uploads per chunk.
        # The sequence is processed in run_kitti-style chunks with carry
        # state threaded between them (exact-equal to unchunked): a fully
        # resident (N, cap, 3) stack at KITTI density exceeds HBM — the TPU
        # tiles the minor dim 3 up to 128, a 42.7x padding expansion.
        chunk = int(os.environ.get("BENCH_CHUNK", "32"))
        host_clouds = [PointCloud.from_numpy(s, cap=cap) for s in scans]
        xyz_np = np.stack([np.asarray(c.xyz) for c in host_clouds])
        mask_np = np.stack([np.asarray(c.mask) for c in host_clouds])
        inten_np = np.stack([np.asarray(c.intensity) for c in host_clouds])
        del host_clouds
        stamps_np = np.arange(n_scans, dtype=np.float32) * 0.1
        # pre-upload the chunked scan data ONCE: re-uploading ~2.2 MB/scan
        # per rep would measure the test rig's few-MB/s relay, not the
        # pipeline (production hosts feed chips over GB/s PCIe; run_kitti
        # overlaps ingest with the native ScanPrefetcher). Device arrays are
        # compact — only in-program copies pay the minor-dim tile padding.
        chunks = []
        for s in range(0, n_scans, chunk):
            e = min(s + chunk, n_scans)
            chunks.append((
                s, e,
                jnp.asarray(xyz_np[s:e]), jnp.asarray(mask_np[s:e]),
                jnp.asarray(inten_np[s:e]), jnp.asarray(stamps_np[s:e]),
                # uint8 (C,H,W) camera stack: the backend batch-extracts ORB
                # for all keyframe images of the chunk in one dispatch
                jnp.asarray(np.stack(images[s:e]).astype(np.uint8)),
            ))

        if mode == "full":
            from lv_slam_tpu.lfa.fused import run_sequence_lfa
            from lv_slam_tpu.pipeline.fused_chain import run_sequence_chain

        # the dlo->lfa stages run as ONE lax.scan per chunk by default
        # (pipeline/fused_chain.py): one dispatch instead of two serialized
        # programs, no intermediate (N,4,4) odometry materialization, and
        # XLA overlaps LFA feature extraction with the NDT Newton iterations
        # inside each step. BENCH_CHAIN=split restores the two-program path
        # (the delta is the fusion gain).
        use_chain = os.environ.get("BENCH_CHAIN", "fused") != "split"
        extra["chain"] = "fused" if (mode == "full" and use_chain) else "split"

        loop_time = [0.0]
        # per-scan host/relay budget attribution (VERDICT r4 #4): pose-fetch
        # sync, backend feed (window programs + ORB dispatch), optimize
        # cycles (includes loop dispatch+harvest — also counted separately
        # in loop_ms_per_scan)
        stage_time = {"fetch": 0.0, "feed": 0.0, "optimize": 0.0}

        def _stage_extras():
            for k, v in stage_time.items():
                extra[f"{k}_ms_per_scan"] = round(v / n_scans * 1000.0, 2)

        def make_backend():
            """Flagship loop/graph config; graph capacities sized to the
            workload — static shapes are a config property on TPU."""
            from lv_slam_tpu.config import GraphConfig, LoopDetectorConfig
            from lv_slam_tpu.graph.bow import Vocabulary
            from lv_slam_tpu.pipeline.backend import GlobalGraph

            # Load the SHIPPED pretrained vocabulary ONCE, exactly like the
            # reference loads its DBoW3 asset at startup
            # (loop_detector.hpp:51-71) — auto-training k-means inside the
            # timed chain cost ~2.3 s in the round-4 on-chip profile.
            # BENCH_VOCAB overrides the asset; a `.yml(.gz)` path goes
            # through the DBoW3 importer (e.g. the reference's own
            # `config/vocabulary.yml.gz` — run the accuracy validation with
            # the REAL vocabulary at its native scale).
            vocab_path = os.environ.get("BENCH_VOCAB") or os.path.join(
                os.path.dirname(os.path.abspath(__file__)),
                "lv_slam_tpu", "assets", "vocab_synthetic_512.npz",
            )
            if vocab_path.endswith((".yml", ".yml.gz")):
                vocab = Vocabulary.load_dbow3(vocab_path)
            else:
                vocab = Vocabulary.load(vocab_path)
            extra["vocab_words"] = int(vocab.centers.shape[0])
            backend = GlobalGraph(
                GraphConfig(
                    keyframe_cap=64, edge_cap=256, prior_cap=16,
                    solver_num_iterations=64,
                ),
                LoopDetectorConfig(),
                prefilter_cfg=cfg.prefilter,
                vocabulary=vocab,
            )
            # loop detection is async (dispatch-only detect + deferred
            # harvest); bill BOTH host sides to loop_time — the device work
            # itself overlaps the pipeline and is not separately visible
            for name in ("dispatch_verifications", "harvest"):
                orig = getattr(backend.loop_detector, name)

                def timed(*a, _orig=orig, **k):
                    t0 = time.perf_counter()
                    out = _orig(*a, **k)
                    loop_time[0] += time.perf_counter() - t0
                    return out

                setattr(backend.loop_detector, name, timed)
            # the backend runs on its own worker thread by default, like the
            # reference's backend nodelet (global_graph_nodelet.cpp:670-764):
            # the timed chain pays only enqueue + the end-of-sequence join;
            # feed/optimize host+relay time overlaps device dispatches.
            # BENCH_ASYNC=0 restores the in-line backend (the delta is the
            # overlap gain). Results are identical either way (FIFO worker).
            if os.environ.get("BENCH_ASYNC", "1") != "0":
                from lv_slam_tpu.pipeline.async_backend import AsyncBackend

                backend = AsyncBackend(backend)
                extra["backend_async"] = True
            else:
                extra["backend_async"] = False
            return backend

        def run_chain(with_lfa):
            """One full-pipeline pass, chunked exactly like
            `run_kitti.py --fused`; returns the final (host) pose array.

            Two-stage software pipeline (the reference's nodelets are async
            for the same reason): chunk k's odometry+LFA programs are
            dispatched BEFORE chunk k-1's pose fetch + backend host work, so
            the host/relay side of the backend overlaps device compute."""
            backend = make_backend() if mode in ("full", "dlo_ggo") else None
            odo_state = lfa_state = chain_state = None
            pending = None
            for k in stage_time:
                stage_time[k] = 0.0

            pose_parts = {}  # chunk start -> host poses (ordered at join)

            def feed_chunk(s, e, refined, cloud, imgs, g):
                """Fetch this chunk's poses and feed the backend — runs on
                the AsyncBackend worker (FIFO, so pose_parts fills in
                order); the fetch's relay latency overlaps the producer's
                next-chunk dispatches exactly like the reference's
                odometry-publisher / backend-subscriber split."""
                t0 = time.perf_counter()
                poses_np = np.asarray(refined)  # the chunk sync point
                g.timings["feed_pose_fetch"] = (
                    g.timings.get("feed_pose_fetch", 0.0)
                    + time.perf_counter() - t0
                )
                pose_parts[s] = poses_np
                g.add_scan_batch(
                    s, stamps_np[s:e], poses_np, cloud, images=imgs,
                    filtered=True,
                )
                # reference optimization cadence: 10 s wall timer
                # (graph_update_interval) = every ~100 scans at 10 Hz
                if any((i + 1) % 100 == 0 for i in range(s, e)):
                    g.optimize()

            def drain(p):
                s, e, refined, cloud, imgs = p
                if backend is None:
                    t0 = time.perf_counter()
                    pose_parts[s] = np.asarray(refined)  # the chunk sync
                    stage_time["fetch"] += time.perf_counter() - t0
                elif hasattr(backend, "graph_backend"):
                    # async backend: even the pose fetch leaves the timed
                    # chain (the producer only dispatches device programs)
                    backend.submit(
                        feed_chunk, s, e, refined, cloud, imgs,
                        backend.graph_backend,
                    )
                else:
                    # synchronous backend (BENCH_ASYNC=0): fetch + feed +
                    # optimize cadence all bill the timed chain; the
                    # per-phase split is in backend_phase_ms_per_scan
                    t0 = time.perf_counter()
                    feed_chunk(s, e, refined, cloud, imgs, backend)
                    stage_time["feed"] += time.perf_counter() - t0

            for s, e, xyz, mask, inten, stamps, imgs_dev in chunks:
                if with_lfa and use_chain:
                    # fused dlo+lfa chain: one device program per chunk
                    (odom, refined, filt), chain_state = run_sequence_chain(
                        xyz, mask, stamps, cfg.odometry, cfg.prefilter,
                        cfg.lfa, init_state=chain_state, return_state=True,
                        inten=inten, return_filtered=True,
                    )
                else:
                    (odom, filt), odo_state = run_sequence_fused(
                        xyz, mask, stamps, cfg.odometry, cfg.prefilter,
                        init_state=odo_state, return_state=True,
                        inten=inten, return_filtered=True,
                    )
                    if with_lfa:
                        # lfa consumes the RAW scan like the reference's A-LOAM
                        refined, lfa_state = run_sequence_lfa(
                            xyz, mask, cfg.lfa, odom_poses=odom,
                            init_state=lfa_state, return_state=True,
                        )
                    else:
                        refined = odom
                if pending is not None:
                    drain(pending)
                pending = (s, e, refined, PointCloud(*filt), imgs_dev)
            drain(pending)
            if backend is not None:
                backend.finish()
                t0 = time.perf_counter()
                backend.drain()
                stage_time["optimize"] += time.perf_counter() - t0
                extra["keyframes"] = len(backend.keyframes)
                extra["n_loops"] = len(backend.loops)
                extra["bow_active"] = backend.loop_detector.vocabulary is not None
                # per-gate rejection counters: multi-loop workloads must
                # show the gates actually discriminating (VERDICT r4 #7)
                extra["loop_rejections"] = dict(backend.loop_detector.stats)
                # per-phase backend budget (VERDICT r4 #4): ms/scan for each
                # feed_*/opt_* phase (opt_cycles is a COUNT); a *_fetch
                # entry includes device work it waited on — the relay queue
                # is serial, so a fetch drains everything dispatched before
                # it
                extra["backend_phase_ms_per_scan"] = {
                    k: (round(v) if k == "opt_cycles"
                        else round(v / n_scans * 1000.0, 2))
                    for k, v in sorted(backend.timings.items())
                }
            return np.concatenate(
                [pose_parts[k] for k in sorted(pose_parts)], axis=0
            )

        if os.environ.get("BENCH_ACCURACY_ONLY") == "1":
            # ONE pass, no reps/deltas/fleet: validates the accuracy fields
            # (devkit_t_err, n_loops, tracking_ok) at full workload density.
            # Runnable on CPU (`env -u PYTHONPATH JAX_PLATFORMS=cpu`) when the
            # TPU relay is down — the math is platform-independent; only the
            # throughput figure (reported as null) needs the chip.
            t0 = time.perf_counter()
            est = run_chain(mode == "full")
            elapsed = time.perf_counter() - t0
            timed = n_scans
            extra["accuracy_only"] = True
            extra["loop_ms_per_scan"] = round(loop_time[0] / n_scans * 1000.0, 2)
            _stage_extras()
            _finish(mode, est, gt_rel, n_scans, timed, elapsed, extra,
                    value_is_throughput=False)
            return
        # warm-up compiles every step variant once
        est = run_chain(mode == "full")
        # headline = warmup + 2 timed reps: the round-4 default (3 reps +
        # 2 delta passes + fleet) exceeded the relay's MTBF (rc=124 at
        # 2400 s); the delta and fleet extras are opt-in separate passes
        reps = max(1, int(os.environ.get("BENCH_REPS", "2")))
        # NOTE: through the remote-TPU relay `block_until_ready` does not
        # actually block; a host fetch is the only true synchronization. The
        # relay adds noisy per-fetch latency (30-500 ms), so each rep syncs
        # with one full pose fetch and the minimum rep time is reported.
        times = []
        for _ in range(reps):
            loop_time[0] = 0.0
            t0 = time.perf_counter()
            est = run_chain(mode == "full")
            times.append(time.perf_counter() - t0)
        elapsed = min(times)
        timed = n_scans
        extra["loop_ms_per_scan"] = round(loop_time[0] / n_scans * 1000.0, 2)
        _stage_extras()
        if mode == "full" and os.environ.get("BENCH_DELTA", "0") == "1":
            # OPT-IN LFA-on/off delta: time one dlo+ggo pass (already warm).
            # run_chain overwrites the keyframe/loop/bow extras — snapshot
            # the TIMED flagship run's values (the tracking gate and the
            # reported stats must describe the headline run, not the delta)
            snap = {
                k: extra[k]
                for k in ("keyframes", "n_loops", "bow_active", "loop_rejections")
                if k in extra
            }
            off = []
            for _ in range(2):
                t0 = time.perf_counter()
                run_chain(False)
                off.append(time.perf_counter() - t0)
            extra.update(snap)
            extra["dlo_ggo_scans_per_sec"] = round(n_scans / min(off), 2)
            extra["lfa_ms_per_scan"] = round((elapsed - min(off)) / n_scans * 1000.0, 2)
        if mode == "full" and os.environ.get("BENCH_FLEET", "0") == "1":
            # fleet mode: B lanes of the dlo+lfa chain on the ONE real chip.
            # Lanes beyond the device count run serially within their shard
            # (one pipeline already saturates the chip — measured; chips are
            # the scaling axis, one true-branch program per chip), so the
            # efficiency metric is TOTAL throughput retention: 4-lane total
            # scans/s vs 1-lane total scans/s (1.0 = lane multiplexing is
            # free; on a pod each lane gets its own chip and this program is
            # per-chip identical to single-lane). Lanes run at 65536-point
            # capacity so B*N*cap stays within HBM (the minor-dim-3 tile
            # padding makes stacked clouds 42.7x their logical size).
            import dataclasses

            from jax.sharding import Mesh

            from lv_slam_tpu.parallel.fleet import run_fleet_odometry

            try:
                f_cap = 65536
                f_pf = dataclasses.replace(cfg.prefilter, raw_cap=f_cap, out_cap=f_cap)
                f_clouds = [PointCloud.from_numpy(s, cap=f_cap) for s in scans[:40]]
                fx = np.stack([np.asarray(c.xyz) for c in f_clouds])
                fm = np.stack([np.asarray(c.mask) for c in f_clouds])
                mesh = Mesh(np.array(jax.devices()[:1]), ("batch",))
                n_fleet = 32
                rate = {}
                for lanes in (1, 4):
                    sx = jnp.asarray(
                        np.stack([fx[i * 2 : i * 2 + n_fleet] for i in range(lanes)])
                    )
                    sm = jnp.asarray(
                        np.stack([fm[i * 2 : i * 2 + n_fleet] for i in range(lanes)])
                    )
                    st = jnp.asarray(np.stack([stamps_np[:n_fleet]] * lanes))
                    args = (mesh, sx, sm, st, cfg.odometry, cfg.lfa, f_pf)
                    np.asarray(run_fleet_odometry(*args))  # warm/compile
                    best = np.inf
                    for _ in range(2):
                        t0 = time.perf_counter()
                        np.asarray(run_fleet_odometry(*args))
                        best = min(best, time.perf_counter() - t0)
                    rate[lanes] = lanes * n_fleet / best
                extra["fleet_scans_per_sec_per_lane_b4"] = round(rate[4] / 4, 2)
                extra["fleet_throughput_retention_b4"] = round(rate[4] / rate[1], 2)
            except Exception as exc:  # the headline must survive a fleet failure
                extra["fleet_error"] = f"{type(exc).__name__}: {exc}"[:200]
    else:
        from lv_slam_tpu.odometry.dlo import DirectLidarOdometry

        odo = DirectLidarOdometry(cfg.odometry, cfg.prefilter)
        warm = 3
        for i in range(warm):
            odo.process(PointCloud.from_numpy(scans[i], cap=cap), i * 0.1)
        t0 = time.perf_counter()
        for i in range(warm, n_scans):
            # per-scan upload (a resident 170-scan cloud list exceeds HBM
            # under the minor-dim tile padding)
            odo.process(PointCloud.from_numpy(scans[i], cap=cap), i * 0.1)
        jax.block_until_ready(odo._key_map.means)
        elapsed = time.perf_counter() - t0
        est = np.stack(odo.poses)
        timed = n_scans - warm
        extra["keyframes"] = odo.stats.keyframe_count

    _finish(mode, est, gt_rel, n_scans, timed, elapsed, extra)


def _finish(mode, est, gt_rel, n_scans, timed, elapsed, extra,
            value_is_throughput=True):
    scans_per_sec = timed / elapsed
    # accuracy gates: throughput of a diverged run is meaningless
    final_err = np.linalg.norm(est[-1][:3, 3] - gt_rel[-1][:3, 3])
    drift_ok = final_err < 0.02 * max(1.0, n_scans)  # < 2% of distance
    try:
        t_rel = _devkit_t_err(gt_rel[: est.shape[0]], est)
    except Exception:
        t_rel = float("nan")
    # reference-parity bar: t <= 0.0094 (BASELINE.md); gate at ~1%
    rel_ok = not np.isfinite(t_rel) or t_rel <= 0.010
    # the flagship loop pipeline must actually fire on this workload
    loops_ok = mode not in ("full", "dlo_ggo") or extra.get("n_loops", 0) >= 1

    metric = {
        "full": "slam_scans_per_sec_per_chip",
        "dlo_ggo": "dlo_ggo_scans_per_sec_per_chip",
    }.get(mode, "dlo_scans_per_sec_per_chip")
    result = {
        "metric": metric,
        "value": round(scans_per_sec, 2) if value_is_throughput else None,
        "unit": "scans/s",
        "vs_baseline": round(scans_per_sec / 10.0, 2) if value_is_throughput else None,
        "extra": {
            "n_scans": timed,
            "final_traj_err_m": round(float(final_err), 4),
            "devkit_t_err": round(t_rel, 5) if np.isfinite(t_rel) else None,
            "tracking_ok": bool(drift_ok and rel_ok and loops_ok),
            "platform": jax.devices()[0].platform,
            **extra,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
