"""Run the GlobalGraph backend on its own worker thread.

The reference's backend is a ROS nodelet whose optimization runs in a 10 s
wall-timer THREAD that never blocks the odometry callback chain
(`src/global_graph/global_graph_nodelet.cpp:670-764`: keyframe ingestion,
loop detection and g2o optimization all happen off the sensor path). The
round-5 on-chip profile showed our synchronous equivalent billing
~50 ms/scan of host/relay time to the timed chain (feed 12.6 +
optimize 37.9, `bench_runs/r05/full_170.json`) while the device compute
itself fully overlapped — exactly the cost this wrapper removes.

`AsyncBackend` owns a `GlobalGraph` and a single worker thread consuming a
FIFO queue, so the backend's host work (keyframe gating, BoW assignment,
window bookkeeping) and its relay waits (ORB fetch, verify harvest, LM pose
fetch) overlap the producer's device dispatches. Results are IDENTICAL to
the synchronous backend: one consumer processes feeds strictly in order,
and all GlobalGraph state is touched only from the worker after the first
enqueue (jax device arrays handed across are immutable). `join()` at end
of sequence is the only synchronization point; exceptions raised on the
worker re-raise there.

Thread-safety notes: JAX dispatch/fetch is thread-safe and both threads'
RPCs serialize in the relay queue anyway — the win is latency overlap, not
device parallelism. numpy and RPC waits release the GIL, so the producer's
dispatches run concurrently with the worker's BoW/window math.
"""

from __future__ import annotations

import queue
import threading
from typing import Optional

from lv_slam_tpu.pipeline.backend import GlobalGraph

__all__ = ["AsyncBackend"]


class AsyncBackend:
    """Thread-backed facade over a `GlobalGraph`.

    Producer API (`add_scan_batch`, `optimize`, `finish`, `drain`) enqueues;
    the worker executes against the wrapped backend in FIFO order. `join()`
    (or `drain()`, which implies it) blocks until the queue is empty and the
    final optimize cycles have run, then the wrapped graph is safe to read
    (`.keyframes`, `.loops`, `.graph.poses`, `.timings`, ...).
    """

    def __init__(self, backend: GlobalGraph, max_pending: int = 8):
        self.graph_backend = backend
        # bounded so a stalled worker applies back-pressure instead of
        # buffering an unbounded number of device-array references
        self._q: "queue.Queue" = queue.Queue(maxsize=max_pending)
        self._exc: Optional[BaseException] = None
        self._thread = threading.Thread(
            target=self._run, name="lv-slam-backend", daemon=True
        )
        self._thread.start()

    # ----------------------------------------------------------- worker
    def _run(self) -> None:
        while True:
            item = self._q.get()
            try:
                if item is None:
                    return
                fn, args, kwargs = item
                if self._exc is None:  # fail fast, drain the rest
                    if callable(fn):
                        fn(*args, **kwargs)
                    else:
                        getattr(self.graph_backend, fn)(*args, **kwargs)
            except BaseException as e:  # noqa: BLE001 — re-raised at join()
                self._exc = e
            finally:
                self._q.task_done()

    def _submit(self, fn: str, *args, **kwargs) -> None:
        if self._exc is not None:
            self.join()  # re-raises
        if not self._thread.is_alive():
            raise RuntimeError("AsyncBackend worker already joined")
        self._q.put((fn, args, kwargs))

    # --------------------------------------------------------- producer
    def submit(self, fn, *args, **kwargs) -> None:
        """Enqueue an arbitrary callable to run ON THE WORKER, in FIFO order
        with the backend calls. The production drivers use this to move the
        chunk pose FETCH itself off the sensor path: the worker fetches the
        odometry program's poses (a ~30-500 ms relay round trip) and feeds
        them to the wrapped backend, so the producer thread only ever
        dispatches device programs — the reference's odometry nodelet
        likewise publishes without waiting on the backend subscriber."""
        self._submit_callable(fn, args, kwargs)

    def _submit_callable(self, fn, args, kwargs) -> None:
        if self._exc is not None:
            self.join()  # re-raises
        if not self._thread.is_alive():
            raise RuntimeError("AsyncBackend worker already joined")
        self._q.put((fn, args, kwargs))

    def add_scan_batch(self, *args, **kwargs) -> None:
        self._submit("add_scan_batch", *args, **kwargs)

    def optimize(self, *args, **kwargs) -> None:
        """Enqueue one optimization cycle (fire-and-forget: the result is
        visible in the wrapped graph after `join()`)."""
        self._submit("optimize", *args, **kwargs)

    def finish(self) -> None:
        self._submit("finish")

    def drain(self) -> None:
        """Enqueue the backend drain, then join the worker: after this the
        wrapped backend is fully up to date and owned by the caller again."""
        self._submit("drain")
        self.join()

    def join(self) -> None:
        """Block until all enqueued work completed; re-raise any worker
        exception. The worker thread exits; the wrapped `GlobalGraph` is
        then safe to use directly (including further synchronous calls)."""
        if self._thread.is_alive():
            self._q.put(None)
            self._thread.join()
        if self._exc is not None:
            exc, self._exc = self._exc, None
            raise exc

    # ------------------------------------------------------ passthrough
    def __getattr__(self, name):
        # reads of backend state (keyframes, loops, timings, ...) after
        # join(); anything stateful mid-flight is a caller bug — the
        # producer API above is the only safe mid-flight surface
        return getattr(self.graph_backend, name)
