"""Multi-loop workload: a double-circle trajectory must fire >= 3 accepted
closures, exercise the gates' REJECTIONS, and shrink the drifted trajectory
error after optimization (VERDICT r4 #7).

The reference's sequential detect handles a stream of repeated closures and
rejections over a long run (`loop_detector.hpp:79-140`: one accepted edge
per `min_edge_interval` of travel, candidates discarded by the BoW score
and fitness gates). Here lap 2 of a double circle revisits lap 1
throughout, so the detector sees candidates at every keyframe — the
interval gate spaces the accepted edges and the fitness gate discards
poorly-overlapping far candidates.

The backend is fed directly with drift-injected odometry (no NDT odometry
stage — this pins the LOOP machinery, not tracking), exactly how
`bench.py` feeds it chunk-level `/filtered_points` batches.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from lv_slam_tpu.config import GraphConfig, LoopDetectorConfig, PrefilterConfig
from lv_slam_tpu.core.cloud import PointCloud
from lv_slam_tpu.io import synthetic
from lv_slam_tpu.pipeline.backend import GlobalGraph

_N, _STEP, _CAP = 160, 1.0, 8192


@pytest.fixture(scope="module")
def double_circle():
    world = synthetic.make_world(seed=9)
    gt = synthetic.circle_trajectory(_N, step=_STEP, laps=2)  # lap = 80 m
    rays = synthetic.vlp16_rays(16, 600)
    scans = [
        synthetic.simulate_scan(world, gt[i], rays, seed=9 + i)
        for i in range(_N)
    ]
    return scans, gt


def _drifted_odometry(gt: np.ndarray, yaw_per_scan: float = 5e-4,
                      scale: float = 1.004) -> np.ndarray:
    """Compose ground-truth relative motions with a constant yaw bias and a
    forward-scale bias — the classic odometry drift model. Ends ~1-2 m off
    over 160 m of travel: well inside the verifier's guess-correction gates
    (5 m / 0.5 rad) but far enough that closures visibly correct it."""
    rels = np.einsum("nij,njk->nik", np.linalg.inv(gt[:-1]), gt[1:])
    c, s = np.cos(yaw_per_scan), np.sin(yaw_per_scan)
    bias = np.array(
        [[c, -s, 0, 0], [s, c, 0, 0], [0, 0, 1, 0], [0, 0, 0, 1]], np.float64
    )
    odom = [np.eye(4)]
    for r in rels:
        r = r.astype(np.float64).copy()
        r[:3, 3] *= scale
        odom.append(odom[-1] @ (bias @ r))
    return np.stack(odom)


def test_double_circle_multi_loop(double_circle):
    scans, gt = double_circle
    gt_rel = np.einsum("ij,njk->nik", np.linalg.inv(gt[0]), gt).astype(np.float64)
    odom = _drifted_odometry(gt_rel)

    # gates scaled to the 80 m lap (flagship KITTI gates assume >=100 m
    # laps); fitness tightened so far-but-aligned candidates with poor
    # overlap are REJECTED rather than silently out-scored
    loop_cfg = LoopDetectorConfig(
        distance_thresh=15.0,
        accum_distance_thresh=60.0,
        min_edge_interval=20.0,
        fitness_score_thresh=0.5,
        auto_train_vocab=False,
    )
    backend = GlobalGraph(
        GraphConfig(
            keyframe_cap=64, edge_cap=256, prior_cap=16,
            keyframe_delta_trans=3.0, solver_num_iterations=32,
        ),
        loop_cfg,
        keyframe_cloud_cap=16384,
        prefilter_cfg=PrefilterConfig(raw_cap=_CAP, out_cap=_CAP),
    )

    chunk = 16
    clouds = [PointCloud.from_numpy(s, cap=_CAP) for s in scans]
    for s in range(0, _N, chunk):
        e = min(s + chunk, _N)
        stack = PointCloud(
            jnp.stack([c.xyz for c in clouds[s:e]]),
            jnp.stack([c.intensity for c in clouds[s:e]]),
            jnp.stack([c.mask for c in clouds[s:e]]),
        )
        backend.add_scan_batch(
            s, np.arange(s, e) * 0.1, odom[s:e], stack
        )
        backend.optimize()
    backend.finish()
    backend.drain()

    # >= 3 accepted closures spaced by the interval gate
    assert len(backend.loops) >= 3, (
        len(backend.loops), backend.loop_detector.stats,
    )
    accums = sorted(l.key1.accum_distance for l in backend.loops)
    assert all(
        b - a >= loop_cfg.min_edge_interval - 1e-6
        for a, b in zip(accums, accums[1:])
    ), accums

    # the detector saw real competition: far more candidates were device-
    # verified than loops accepted (best-of-batch selection + interval gate;
    # the REJECTION gates are pinned deterministically by the unit tests
    # below — in this same-world workload every alignment is legitimately
    # good, so natural gate rejections are not guaranteed)
    stats = backend.loop_detector.stats
    assert stats["verified"] > 2 * len(backend.loops), stats

    # post-closure error shrink: optimized keyframe estimates beat the
    # drifted odometry they were built from
    err_odom, err_est = [], []
    for kf in backend.keyframes:
        g = gt_rel[kf.seq][:3, 3]
        err_odom.append(np.linalg.norm(kf.odom[:3, 3] - g))
        err_est.append(np.linalg.norm(kf.estimate[:3, 3] - g))
    # drift grows with travel — compare the worst-drifted tail
    tail = slice(len(err_odom) // 2, None)
    assert np.mean(err_est[tail]) < 0.6 * np.mean(err_odom[tail]), (
        np.mean(err_odom[tail]), np.mean(err_est[tail]),
    )


def _kf(seq, pos, cloud, accum, descriptor=None):
    from lv_slam_tpu.graph.keyframe import KeyFrame

    odom = np.eye(4)
    odom[:3, 3] = pos
    return KeyFrame(
        stamp=seq * 0.1, seq=seq, odom=odom, accum_distance=accum,
        cloud=cloud, descriptor=descriptor,
    )


def test_fitness_gate_rejects_nonoverlapping_candidate():
    """A candidate whose cloud shares no structure with the new keyframe
    must fail the fitness gate (`loop_detector.hpp:262-269`: best_score
    above fitness_score_thresh -> no edge) and increment the counter."""
    from lv_slam_tpu.graph.loop_detector import LoopDetector

    rng = np.random.default_rng(4)
    a = rng.uniform(-20, 20, size=(4000, 4)).astype(np.float32)
    b = rng.uniform(180, 220, size=(4000, 4)).astype(np.float32)  # disjoint
    new_kf = _kf(10, np.zeros(3), PointCloud.from_numpy(a, cap=4096), 200.0)
    cand = _kf(1, np.zeros(3), PointCloud.from_numpy(b, cap=4096), 10.0)

    det = LoopDetector(LoopDetectorConfig(fitness_score_thresh=0.3))
    loop = det.verify([cand], [1.0], new_kf)
    assert loop is None
    assert det.stats["fitness_rejected"] >= 1, det.stats


def test_bow_gate_rejects_dissimilar_descriptors():
    """Candidates whose BoW vectors share no words score ~0 < the 0.04
    accept gate (`loop_detector.hpp:241-246`) and are dropped before any
    device verification."""
    from lv_slam_tpu.graph.bow import Vocabulary
    from lv_slam_tpu.graph.loop_detector import LoopDetector

    rng = np.random.default_rng(7)
    # 2 well-separated binary words; descriptors deterministic per word
    w0 = np.zeros((1, 32), np.uint8)
    w1 = np.full((1, 32), 255, np.uint8)
    vocab = Vocabulary.train([np.repeat(w0, 8, 0), np.repeat(w1, 8, 0)], n_words=2)
    cloud = PointCloud.from_numpy(
        rng.uniform(-20, 20, size=(1000, 4)).astype(np.float32), cap=1024
    )
    new_kf = _kf(10, np.zeros(3), cloud, 200.0, descriptor=np.repeat(w0, 8, 0))
    cand = _kf(1, np.zeros(3), cloud, 10.0, descriptor=np.repeat(w1, 8, 0))

    det = LoopDetector(
        LoopDetectorConfig(auto_train_vocab=False), vocabulary=vocab
    )
    ranked, scores = det.rank_candidates([cand], new_kf)
    assert ranked == [] and scores == []
    assert det.stats["bow_rejected"] == 1, det.stats


def test_guess_gate_rejects_excessive_correction():
    """A verified transform that deviates from the graph-estimate guess by
    more than max_guess_correction_* is rejected (self-similar-scene guard;
    deviation documented in LoopDetectorConfig)."""
    from lv_slam_tpu.graph.loop_detector import LoopDetector, PendingVerification

    rng = np.random.default_rng(5)
    a = rng.uniform(-20, 20, size=(1000, 4)).astype(np.float32)
    cloud = PointCloud.from_numpy(a, cap=1024)
    new_kf = _kf(10, np.zeros(3), cloud, 200.0)
    cand = _kf(1, np.zeros(3), cloud, 10.0)

    det = LoopDetector(LoopDetectorConfig(max_guess_correction_trans=0.5))
    # craft the harvested packet directly: identity guess, verified
    # transform 3 m away, perfect fitness — only the guess gate can reject
    rel = np.eye(4, dtype=np.float32)
    rel[0, 3] = 3.0
    packed = np.concatenate([rel.reshape(16), [0.0]]).astype(np.float32)
    p = PendingVerification(
        new_kf=new_kf, candidates=[cand], scores=[1.0],
        guesses=np.eye(4)[None], packed=packed[None],
    )
    loops = det.harvest([p])
    assert loops == []
    assert det.stats["guess_rejected"] == 1, det.stats
