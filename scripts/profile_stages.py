"""Stage- and kernel-level profiler for the flagship chain.

Two measurement modes, both honest through the remote-TPU relay (see
CLAUDE.md "Measured TPU performance facts"):

- sequence mode: time whole jitted sequence programs (odometry, LFA) with
  ONE pose fetch as the sync point — what the benchmark experiences.
- kernel mode: `--kernels` times individual ops inside a device-side
  `lax.fori_loop` whose body is DATA-DEPENDENT ON THE CARRY (inputs are
  perturbed by `acc * 1e-20`). Without the carry dependence XLA hoists the
  loop-invariant body and the measurement reads ~free (this exact mistake
  produced a phantom 1.66 ms reading for a 10.8 ms op in round 3).

Usage:
    python scripts/profile_stages.py              # sequence mode, 64 scans
    python scripts/profile_stages.py --kernels    # kernel microbenches
    N=128 python scripts/profile_stages.py        # more scans (needs cache)

The scan workload comes from the bench's disk cache
(`/root/.cache/lv_slam_bench_scans_v1_<N>.npz`, created by `bench.py` with
`BENCH_SCANS=<N>`); pass --synth to ray-trace fresh scans instead.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/lv_slam_jax")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_default_matmul_precision", "highest")
import jax.numpy as jnp
import numpy as np


def _fetch_latency():
    z = jnp.zeros(())
    np.asarray(z)
    lat = np.inf
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(z)
        lat = min(lat, time.perf_counter() - t0)
    return lat


def carry_timed(name, fn, *args, reps=20, rounds=3):
    """Device-side fori_loop of `reps` calls; body inputs perturbed by the
    carry so XLA cannot hoist. Prints best-of-`rounds` minus one fetch."""

    @jax.jit
    def loop(*a):
        def body(i, acc):
            perturbed = [
                x + acc * 1e-20
                if hasattr(x, "dtype") and x.dtype == jnp.float32
                else x
                for x in a
            ]
            out = fn(*perturbed)
            leaves = jax.tree.leaves(out)
            s = sum(jnp.sum(jnp.asarray(l, jnp.float32).ravel()[:1]) for l in leaves)
            return acc + s * 1e-20

        return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

    float(np.asarray(loop(*args)))  # compile + warm
    best = np.inf
    for _ in range(rounds):
        t0 = time.perf_counter()
        float(np.asarray(loop(*args)))
        best = min(best, time.perf_counter() - t0)
    ms = (best - _fetch_latency()) / reps * 1000.0
    print(f"{name:28s} {ms:8.3f} ms", flush=True)
    return ms


def seq_timed(name, fn, n_scans, rounds=3):
    """Time a whole-sequence program; sync = one fetch of the result tail."""
    out = fn()
    np.asarray(jax.tree.leaves(out)[0])[-1:]
    best = np.inf
    for _ in range(rounds):
        t0 = time.perf_counter()
        out = fn()
        np.asarray(jax.tree.leaves(out)[0])[-1:]
        best = min(best, time.perf_counter() - t0)
    print(f"{name:28s} {best:8.3f} s  {best / n_scans * 1000.0:7.2f} ms/scan", flush=True)
    return best


def _load_workload(n_scans, synth):
    from lv_slam_tpu.io import synthetic

    cache = f"/root/.cache/lv_slam_bench_scans_v1_{n_scans}.npz"
    if not synth and os.path.exists(cache):
        with np.load(cache) as z:
            return [z[f"s{i}"] for i in range(n_scans)]
    world = synthetic.make_world(seed=5)
    gt = synthetic.circle_trajectory(n_scans, step=1.0)
    rays = synthetic.hdl64_rays(64, 2000)
    return [synthetic.simulate_scan(world, gt[i], rays, seed=5 + i) for i in range(n_scans)]


def _lfa_components(cfg, c0, c1, cap):
    """Carry-chained microbench of every fused-LFA step component (the
    round-3 /tmp/prof_lfa3.py attack plan, preserved in-repo)."""
    from lv_slam_tpu.lfa import registration as reg
    from lv_slam_tpu.lfa.features import extract_features
    from lv_slam_tpu.lfa.fused import _n_buckets, make_lfa_fused
    from lv_slam_tpu.core.cloud import PointCloud
    from lv_slam_tpu.ops.knn import (
        build_cell_table, crop_cell_table, insert_cell_table,
    )

    lcfg = cfg.lfa
    carry_timed(
        "extract_features",
        lambda x, m: extract_features(PointCloud(x, jnp.zeros(cap), m), lcfg),
        c0.xyz, c0.mask,
    )

    # extraction internals (the VERDICT-r3 "scatter-min" candidate): where do
    # the ~ms go — projection scatter, row compaction sort, curvature rolls,
    # or the three top_k networks?
    from lv_slam_tpu.lfa import features as F

    def _proj(x, m):
        return F.project_range_image(
            PointCloud(x, jnp.zeros(cap), m), n_rings=lcfg.scan_line,
            minimum_range=lcfg.minimum_range, min_elev_deg=lcfg.min_elev_deg,
            max_elev_deg=lcfg.max_elev_deg,
        )

    carry_timed("  project_range_image", _proj, c0.xyz, c0.mask)
    img, vld = jax.jit(_proj)(c0.xyz, c0.mask)
    carry_timed("  compact_rows", F.compact_rows, img, vld)
    cimg, cvld = jax.jit(F.compact_rows)(img, vld)
    carry_timed("  curvature+extrema",
                lambda i, v: F._local_extrema(
                    jnp.nan_to_num(F.curvature(i, v)[0], nan=-jnp.inf), 2, True),
                cimg, cvld)
    cc, cok = jax.jit(F.curvature)(cimg, cvld)

    def _picks(i, c, ok):
        e = F._sector_topk(i, c, ok, lcfg.less_sharp_per_sector, lcfg.n_sectors, True)
        f = F._sector_topk(i, c, ok, lcfg.flat_per_sector, lcfg.n_sectors, False)
        g = F._sector_topk(
            i, c, ok, max(1, lcfg.planar_cap // (lcfg.n_sectors * lcfg.scan_line)),
            lcfg.n_sectors, False)
        return (F._compact(e[0], e[1], lcfg.edge_cap),
                F._compact(f[0], f[1], lcfg.planar_cap // 4),
                F._compact(g[0], g[1], lcfg.planar_cap))

    carry_timed("  sector_topk+compacts", _picks, cimg, cc, cok)
    feats = jax.jit(
        lambda x, m: extract_features(PointCloud(x, jnp.zeros(cap), m), lcfg)
    )(c1.xyz, c1.mask)

    rng = np.random.default_rng(0)
    em = jnp.asarray(rng.uniform(-80, 80, (lcfg.map_edge_cap, 3)).astype(np.float32))
    emk = jnp.asarray(np.arange(lcfg.map_edge_cap) < lcfg.map_edge_cap // 2)
    sm = jnp.asarray(rng.uniform(-80, 80, (lcfg.map_planar_cap, 3)).astype(np.float32))
    smk = jnp.asarray(np.arange(lcfg.map_planar_cap) < lcfg.map_planar_cap // 2)

    def build_e(m, k):
        return build_cell_table(
            m, k, 2.0, n_buckets=_n_buckets(lcfg, lcfg.map_edge_cap), slots=lcfg.knn_slots
        )

    def build_s(m, k):
        return build_cell_table(
            m, k, 2.0, n_buckets=_n_buckets(lcfg, lcfg.map_planar_cap), slots=lcfg.knn_slots
        )

    carry_timed("build_cell edge(32k)", build_e, em, emk)
    carry_timed("build_cell surf(64k)", build_s, sm, smk)
    e_grid = jax.jit(build_e)(em, emk)
    s_grid = jax.jit(build_s)(sm, smk)
    eye = jnp.eye(4, dtype=jnp.float32)
    carry_timed(
        "insert edge(4k batch)",
        lambda t, y, m: insert_cell_table(t, y, m, lcfg.mapping_line_resolution),
        e_grid, feats.less_sharp, feats.less_sharp_mask,
    )
    carry_timed(
        "insert surf(8k batch)",
        lambda t, y, m: insert_cell_table(t, y, m, lcfg.mapping_plane_resolution),
        s_grid, feats.less_flat, feats.less_flat_mask,
    )
    carry_timed(
        "crop edge table",
        lambda t: crop_cell_table(t, jnp.zeros(3), lcfg.crop_radius), e_grid,
    )
    carry_timed(
        "crop surf table",
        lambda t: crop_cell_table(t, jnp.zeros(3), lcfg.crop_radius), s_grid,
    )

    carry_timed(
        "lines_from_fit",
        lambda y, m: reg.lines_from_fit(y, m, e_grid, k=lcfg.knn_k),
        feats.less_sharp, feats.less_sharp_mask,
    )
    carry_timed(
        "planes_from_fit",
        lambda y, m: reg.planes_from_fit(y, m, s_grid, k=lcfg.knn_k),
        feats.less_flat, feats.less_flat_mask,
    )
    lines = jax.jit(lambda y, m: reg.lines_from_fit(y, m, e_grid, k=lcfg.knn_k))(
        feats.less_sharp, feats.less_sharp_mask
    )
    planes = jax.jit(lambda y, m: reg.planes_from_fit(y, m, s_grid, k=lcfg.knn_k))(
        feats.less_flat, feats.less_flat_mask
    )
    carry_timed(
        "gn_solve",
        lambda t: reg.gn_solve(
            t, feats.less_sharp, lines, feats.less_flat, planes, lcfg.mapping_max_iterations
        ),
        eye,
    )
    init_state, step = make_lfa_fused(lcfg, external_odom=True)
    st0 = jax.jit(init_state)(c0.xyz, c0.mask, eye)
    carry_timed("FULL lfa step", lambda x, m: step(st0, x, m, eye)[1], c1.xyz, c1.mask)


def _backend_components(cfg, clouds, cap):
    """Device-exec cost of every backend-side program the worker thread
    waits on (the round-5 wall): batched ORB pyramid, the fused loop-verify
    ladder, the window-group compose, and the pose-graph LM solve. These
    tell round-trip latency apart from device time in the bench's
    backend_phase_ms_per_scan numbers."""
    from lv_slam_tpu.config import LoopDetectorConfig
    from lv_slam_tpu.graph import pose_graph as pg
    from lv_slam_tpu.graph.loop_detector import LoopDetector, _fused_verify_fn
    from lv_slam_tpu.ops.orb import _detect_pyramid_batch
    from lv_slam_tpu.utils.jit_cache import window_group_filtered_fn

    # 1. ORB pyramid over an 8-image chunk batch (bench images are 128x256
    #    uint8; float input so carry_timed's perturbation defeats hoisting)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(0, 255, (8, 128, 256)).astype(np.float32))
    ld = LoopDetector(LoopDetectorConfig())
    k_levels = None
    from lv_slam_tpu.ops import orb as _orb

    k_levels = _orb.OrbExtractor()._k_levels(128, 256)
    carry_timed(
        "orb pyramid batch (8 imgs)",
        lambda im: _detect_pyramid_batch(im.astype(jnp.uint8), k_levels, 20.0),
        imgs, reps=5,
    )

    # 2. fused verify ladder, k=1 candidate, full keyframe-cap clouds
    c0, c1 = clouds[0], clouds[1]
    budget = int(ld.cfg.verify_coarse_points)
    stride = max(1, cap // budget) if budget > 0 else 1
    vfn = _fused_verify_fn(
        ld._resolutions, ld._iter_schedule, ld.cfg.ndt_neighborhood,
        ld._leaf_cap, ld._lut_extent, 0.25, stride,
    )
    guess = jnp.eye(4, dtype=jnp.float32)[None].at[0, 0, 3].set(2.0)
    carry_timed(
        "verify ladder (k=1)",
        lambda nx, nm, cx, cm, g: vfn(
            nx, jnp.zeros(cap), nm, cx[None], jnp.zeros((1, cap)), cm[None], g
        ),
        c0.xyz, c0.mask, c1.xyz, c1.mask, guess, reps=5,
    )

    # 3. window-group compose over a 16-scan filtered chunk (C,3,cap)
    l2 = 16
    cx = jnp.stack([c.xyz.T for c in clouds[:l2]])
    ci = jnp.stack([c.intensity for c in clouds[:l2]])
    cm = jnp.stack([c.mask for c in clouds[:l2]])
    rels = jnp.asarray(np.stack([np.eye(4)] * l2).astype(np.float32))
    valid = jnp.asarray(np.ones(l2, bool))
    wfn = window_group_filtered_fn(0.1, cap, l2)
    carry_timed(
        "window group (16 scans)",
        lambda x, r: wfn(x, ci, cm, jnp.int32(0), r, valid),
        cx, rels, reps=5,
    )

    # 4. pose-graph LM at the 64-node bucket (the backend's common case)
    g = pg.empty_graph(64, 256, 16)
    rng = np.random.default_rng(1)
    for i in range(40):
        T = np.eye(4, dtype=np.float32)
        T[:3, 3] = [i * 2.0, np.sin(i * 0.3), 0.0]
        g = pg.add_node(g, i, T)
        if i:
            meas = np.eye(4, dtype=np.float32)
            meas[0, 3] = 2.0
            g = pg.add_se3_edge(g, i - 1, i - 1, i, meas, np.eye(6, dtype=np.float32))
    jax.block_until_ready(jax.tree.leaves(g))
    import time as _t

    np.asarray(pg.optimize_pose_graph(g, 64).poses)  # compile + warm
    best = np.inf
    for _ in range(3):
        t0 = _t.perf_counter()
        np.asarray(pg.optimize_pose_graph(g, 64).poses)
        best = min(best, _t.perf_counter() - t0)
    print(f"{'LM solve 64it (40 nodes)':28s} {(best - _fetch_latency()) * 1000.0:8.3f} ms", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--kernels", action="store_true", help="kernel microbenches")
    ap.add_argument("--lfa", action="store_true", help="LFA component microbenches")
    ap.add_argument("--backend", action="store_true", help="backend program microbenches")
    ap.add_argument("--synth", action="store_true", help="ray-trace instead of cache")
    args = ap.parse_args()
    n_scans = int(os.environ.get("N", "64"))

    from lv_slam_tpu.config import kitti_flagship_config
    from lv_slam_tpu.core.cloud import PointCloud

    cfg = kitti_flagship_config()
    scans = _load_workload(n_scans, args.synth)
    cap = cfg.prefilter.raw_cap
    clouds = [PointCloud.from_numpy(s, cap=cap) for s in scans]
    xyz = jnp.asarray(np.stack([np.asarray(c.xyz) for c in clouds]))
    mask = jnp.asarray(np.stack([np.asarray(c.mask) for c in clouds]))
    stamps = jnp.arange(n_scans, dtype=jnp.float32) * 0.1
    c0, c1 = clouds[0], clouds[1]

    if args.lfa:
        _lfa_components(cfg, c0, c1, cap)
        return

    if args.backend:
        _backend_components(cfg, clouds, cap)
        return

    if args.kernels:
        from lv_slam_tpu.lfa.features import extract_features
        from lv_slam_tpu.lfa.fused import _n_buckets
        from lv_slam_tpu.odometry.fused import _make_ops, _prefilter
        from lv_slam_tpu.ops.knn import build_cell_table
        from lv_slam_tpu.ops.prefilter import voxel_downsample

        pf = cfg.prefilter
        carry_timed(
            "prefilter chain",
            lambda x, m: _prefilter(PointCloud(x, jnp.zeros(cap), m), pf, cfg.odometry.scan_matching_cap),
            c0.xyz, c0.mask,
        )
        carry_timed(
            "voxel_downsample 131k",
            lambda x, m: voxel_downsample(PointCloud(x, jnp.zeros(cap), m), pf.downsample_resolution, pf.out_cap),
            c0.xyz, c0.mask,
        )
        # A/B prefilter kernels (BENCH_VOXEL_REDUCE / BENCH_DOWNSAMPLE /
        # BENCH_SUBSAMPLE candidates) head-to-head on identical input
        from lv_slam_tpu.ops.prefilter import voxel_dedup_first

        carry_timed(
            "voxel_downsample scan-red",
            lambda x, m: voxel_downsample(
                PointCloud(x, jnp.zeros(cap), m), pf.downsample_resolution,
                pf.out_cap, reduce="scan",
            ),
            c0.xyz, c0.mask,
        )
        carry_timed(
            "voxel_dedup_first 131k",
            lambda x, m: voxel_dedup_first(
                PointCloud(x, jnp.zeros(cap), m), pf.downsample_resolution, pf.out_cap
            ),
            c0.xyz, c0.mask,
        )
        import dataclasses as _dc

        pf_dedup = _dc.replace(pf, downsample_method="DEDUP")
        carry_timed(
            "prefilter chain DEDUP",
            lambda x, m: _prefilter(
                PointCloud(x, jnp.zeros(cap), m), pf_dedup, cfg.odometry.scan_matching_cap
            ),
            c0.xyz, c0.mask,
        )
        carry_timed(
            "prefilter DEDUP+stride",
            lambda x, m: _prefilter(
                PointCloud(x, jnp.zeros(cap), m), pf_dedup,
                cfg.odometry.scan_matching_cap, subsample_method="stride",
            ),
            c0.xyz, c0.mask,
        )
        build, align, _, _ = _make_ops(cfg.odometry, pf)
        filt0 = jax.jit(lambda c: _prefilter(c, pf, cfg.odometry.scan_matching_cap))(c0)
        filt1 = jax.jit(lambda c: _prefilter(c, pf, cfg.odometry.scan_matching_cap))(c1)
        key_map = jax.jit(build)(filt0)
        guess = jnp.eye(4, dtype=jnp.float32).at[0, 3].set(1.0)
        carry_timed("ndt map build+hash", build, filt0)
        carry_timed(
            "ndt align (1m guess)",
            lambda m, c, g: align(m, c, g).transform, key_map, filt1, guess,
        )
        lcfg = cfg.lfa
        carry_timed(
            "lfa extract_features",
            lambda x, m: extract_features(PointCloud(x, jnp.zeros(cap), m), lcfg),
            c0.xyz, c0.mask,
        )
        rng = np.random.default_rng(0)
        em = jnp.asarray(rng.uniform(-80, 80, (lcfg.map_edge_cap, 3)).astype(np.float32))
        emk = jnp.asarray(np.arange(lcfg.map_edge_cap) < lcfg.map_edge_cap // 2)
        carry_timed(
            "lfa cell table (edge)",
            lambda m, k: build_cell_table(
                m, k, 2.0, n_buckets=_n_buckets(lcfg, lcfg.map_edge_cap), slots=lcfg.knn_slots
            ),
            em, emk,
        )
        return

    from lv_slam_tpu.lfa.fused import run_sequence_lfa
    from lv_slam_tpu.odometry.fused import run_sequence_fused

    seq_timed(
        "odometry sequence",
        lambda: run_sequence_fused(xyz, mask, stamps, cfg.odometry, cfg.prefilter),
        n_scans,
    )
    odom = run_sequence_fused(xyz, mask, stamps, cfg.odometry, cfg.prefilter)
    seq_timed(
        "lfa sequence",
        lambda: run_sequence_lfa(xyz, mask, cfg.lfa, odom_poses=odom),
        n_scans,
    )
    (_, iters, switches) = run_sequence_fused(
        xyz, mask, stamps, cfg.odometry, cfg.prefilter, with_stats=True
    )
    it = np.asarray(iters)
    print(
        f"ndt iterations: mean {it[1:].mean():.1f} p90 {np.percentile(it[1:], 90):.0f}"
        f"  keyframes {int(np.asarray(switches).sum())}/{n_scans}",
        flush=True,
    )


if __name__ == "__main__":
    main()
