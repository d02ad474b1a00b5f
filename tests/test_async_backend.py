"""AsyncBackend parity: the thread-backed facade must produce IDENTICAL
results to the synchronous GlobalGraph — same keyframes, same loops, same
optimized poses — because it executes the same calls in the same FIFO
order on one worker (pipeline/async_backend.py; the reference's backend
likewise runs in its own thread, `global_graph_nodelet.cpp:670-764`).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from lv_slam_tpu.config import GraphConfig, LoopDetectorConfig, PrefilterConfig
from lv_slam_tpu.core.cloud import PointCloud
from lv_slam_tpu.io import synthetic
from lv_slam_tpu.pipeline.async_backend import AsyncBackend
from lv_slam_tpu.pipeline.backend import GlobalGraph

_N, _CAP = 96, 8192


@pytest.fixture(scope="module")
def circle_feed():
    world = synthetic.make_world(seed=11)
    gt = synthetic.circle_trajectory(_N, step=1.0, radius=_N / (2 * np.pi))
    rays = synthetic.vlp16_rays(16, 500)
    scans = [
        synthetic.simulate_scan(world, gt[i], rays, seed=11 + i)
        for i in range(_N)
    ]
    gt_rel = np.einsum("ij,njk->nik", np.linalg.inv(gt[0]), gt)
    clouds = [PointCloud.from_numpy(s, cap=_CAP) for s in scans]
    return clouds, gt_rel.astype(np.float64)


def _make_backend():
    return GlobalGraph(
        GraphConfig(
            keyframe_cap=32, edge_cap=128, prior_cap=8,
            keyframe_delta_trans=3.0, solver_num_iterations=32,
        ),
        LoopDetectorConfig(
            distance_thresh=15.0, accum_distance_thresh=60.0,
            min_edge_interval=20.0, auto_train_vocab=False,
        ),
        keyframe_cloud_cap=16384,
        prefilter_cfg=PrefilterConfig(raw_cap=_CAP, out_cap=_CAP),
    )


def _run(backend, clouds, odom, chunk=16):
    for s in range(0, _N, chunk):
        e = min(s + chunk, _N)
        stack = PointCloud(
            jnp.stack([c.xyz for c in clouds[s:e]]),
            jnp.stack([c.intensity for c in clouds[s:e]]),
            jnp.stack([c.mask for c in clouds[s:e]]),
        )
        backend.add_scan_batch(s, np.arange(s, e) * 0.1, odom[s:e], stack)
        if e % 48 == 0:
            backend.optimize()
    backend.finish()
    backend.drain()
    return backend


def test_async_matches_sync(circle_feed):
    clouds, odom = circle_feed
    sync = _run(_make_backend(), clouds, odom)
    async_b = _run(AsyncBackend(_make_backend()), clouds, odom)

    assert len(async_b.keyframes) == len(sync.keyframes)
    assert len(async_b.loops) == len(sync.loops) >= 1
    assert [l.key1.seq for l in async_b.loops] == [l.key1.seq for l in sync.loops]
    assert async_b.loop_detector.stats == sync.loop_detector.stats
    # identical call sequence on one worker -> bit-identical optimized poses
    k = len(sync.keyframes)
    np.testing.assert_array_equal(
        np.asarray(async_b.graph.poses[:k]), np.asarray(sync.graph.poses[:k])
    )
    # the worker measured the same phases the sync path did
    assert "feed_window" in async_b.timings and "opt_lm_dispatch" in async_b.timings


def test_async_worker_exception_reraises(circle_feed):
    clouds, odom = circle_feed
    b = AsyncBackend(_make_backend())
    with pytest.raises(TypeError):
        b.add_scan_batch("not-an-int")  # malformed feed explodes on worker
        b.join()
    # after join() the facade refuses further enqueues instead of hanging
    with pytest.raises(RuntimeError):
        b.optimize()


def test_async_join_idempotent(circle_feed):
    clouds, odom = circle_feed
    b = AsyncBackend(_make_backend())
    stack = PointCloud(
        jnp.stack([c.xyz for c in clouds[:4]]),
        jnp.stack([c.intensity for c in clouds[:4]]),
        jnp.stack([c.mask for c in clouds[:4]]),
    )
    b.add_scan_batch(0, np.arange(4) * 0.1, odom[:4], stack)
    b.join()
    b.join()  # second join is a no-op
    # wrapped backend remains usable synchronously after join
    b.graph_backend.finish()
    b.graph_backend.drain()
    assert len(b.keyframes) >= 1
