"""Global graph backend: windowed keyframes -> loops -> pose-graph LM.

Rebuild of `GlobalGraphNodelet` (`src/global_graph/global_graph_nodelet.cpp`).
The ROS callback graph becomes explicit methods on one host object:

- `add_scan` = `cloud_callback` (:154-245): per-scan odometry is recorded for
  the wf dump; scans between keyframe triggers are motion-composed into the
  current window (`w_odom^-1 odom`) and concatenated; on a trigger the window
  is voxel-downsampled (0.1 m) into a KeyFrame (with ORB descriptors when an
  image is attached) and queued.
- `optimize` = `optimization_timer_callback` (:670-764): flush <=
  `max_keyframes_per_update` queued keyframes into the graph (SE3 node +
  consecutive edge with the information calculator + Huber), run loop
  detection over the new keyframes, add loop edges, LM-optimize, re-anchor
  every estimate to keyframe 0, and refresh `trans_odom2map`.
- `dump` / `save_map` = the two ROS services (:979-1070): graph.g2o +
  .kernels sidecar, per-keyframe `%06d/` dirs (data + cloud.pcd),
  special_nodes.csv, `ggo_kf_odom.txt` / `ggo_wf_odom.txt` (camera frame via
  the calib Tr conjugation), and the octree-deduped map PCD.
"""

from __future__ import annotations

import os
import time
from typing import Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from lv_slam_tpu.config import GraphConfig, LoopDetectorConfig
from lv_slam_tpu.core.cloud import PointCloud
from lv_slam_tpu.graph import g2o_io, pose_graph as pg
from lv_slam_tpu.graph.information_matrix import calc_information_matrix
from lv_slam_tpu.graph.keyframe import KeyFrame, KeyframeUpdater
from lv_slam_tpu.graph.loop_detector import Loop, LoopDetector
from lv_slam_tpu.graph.map_cloud import generate_map_cloud
from lv_slam_tpu.io import kitti, pcd


class GlobalGraph:
    def __init__(
        self,
        cfg: Optional[GraphConfig] = None,
        loop_cfg: Optional[LoopDetectorConfig] = None,
        calib_tr: Optional[np.ndarray] = None,
        keyframe_cloud_cap: int = 131072,
        vocabulary=None,
        prefilter_cfg=None,
    ):
        self.cfg = cfg or GraphConfig()
        self.loop_cfg = loop_cfg or LoopDetectorConfig()
        self.tr = np.eye(4) if calib_tr is None else np.asarray(calib_tr, np.float64)
        self.keyframe_cloud_cap = keyframe_cloud_cap
        if prefilter_cfg is None:
            from lv_slam_tpu.config import PrefilterConfig

            prefilter_cfg = PrefilterConfig()
        self.prefilter_cfg = prefilter_cfg

        self.graph = pg.empty_graph(
            self.cfg.keyframe_cap, self.cfg.edge_cap, self.cfg.prior_cap,
            self.cfg.plane_cap, self.cfg.sp_edge_cap, self.cfg.plane_edge_cap,
        )
        self.updater = KeyframeUpdater(self.cfg.keyframe_delta_trans, self.cfg.keyframe_delta_angle)
        self.loop_detector = LoopDetector(self.loop_cfg, vocabulary=vocabulary)

        self.keyframes: List[KeyFrame] = []
        self.new_keyframes: List[KeyFrame] = []
        self.keyframe_queue: List[KeyFrame] = []
        self.loops: List[Loop] = []
        # in-flight device loop verifications (dispatched last optimize
        # cycle, harvested at the next — see LoopDetector.dispatch/harvest)
        self.pending_loops: List = []
        # nodes/edges added since the last LM solve (gates the solve — and
        # lets drain() defer intermediate solves to its final cycle)
        self._graph_dirty = False
        self.odoms: Dict[int, np.ndarray] = {}
        self.trans_odom2map = np.eye(4)
        self.zero_utm: Optional[np.ndarray] = None
        self._n_nodes = 0
        self._n_edges = 0
        self._n_priors = 0
        self._n_planes = 0
        self._n_sp_edges = 0
        self._n_plane_edges = 0
        self.floor_plane_node_id: Optional[int] = None
        self.anchor_node_id: Optional[int] = None
        self.anchor_edge_id: Optional[int] = None
        self._orb = None
        # cumulative wall-clock per backend phase (seconds): populated by
        # add_scan_batch ("feed_*") and optimize ("opt_*"); host-visible
        # time only — a fetch entry includes any device work it waited on
        # (the relay queue is serial). bench.py surfaces these per scan.
        self.timings: Dict[str, float] = {}

        # window accumulation state: device clouds + window-relative transforms
        self._w_parts: List[tuple] = []  # (PointCloud, (4,4) np rel transform)
        self._w_partials: List[PointCloud] = []  # batch path: centroided groups
        self._w_odom: Optional[np.ndarray] = None
        self._w_seq = -1
        self._w_stamp = 0.0
        self._w_image = None
        self._w_orb = None  # batch path: precomputed (descriptor, keypoints)
        self._w_accum = 0.0
        self._w_sensors: dict = {}

        from lv_slam_tpu.utils.jit_cache import window_flush_fn

        self._window_flush = window_flush_fn(0.1, self.keyframe_cloud_cap)

    # ------------------------------------------------------------------ scans
    def add_scan(
        self,
        seq: int,
        stamp: float,
        odom: np.ndarray,
        cloud: PointCloud,
        image: Optional[np.ndarray] = None,
        gps_xyz: Optional[np.ndarray] = None,
        imu_quat_wxyz: Optional[np.ndarray] = None,
        imu_acceleration: Optional[np.ndarray] = None,
        floor_coeffs: Optional[np.ndarray] = None,
    ) -> None:
        odom = np.asarray(odom, np.float64)
        self.odoms[seq] = odom
        sensors = dict(
            gps=gps_xyz, imu_quat=imu_quat_wxyz, imu_acc=imu_acceleration,
            floor=floor_coeffs,
        )
        if self.updater.update(odom):
            if self._w_odom is not None:
                self._flush_window()
            self._w_parts = [(cloud, np.eye(4))]
            self._w_partials = []  # clear any batch-path leftovers
            self._w_odom = odom
            self._w_seq = seq
            self._w_stamp = stamp
            self._w_image = image
            self._w_orb = None
            self._w_accum = self.updater.accum_distance
            self._w_sensors = {k: v for k, v in sensors.items() if v is not None}
        elif self._w_odom is not None:
            rel = np.linalg.inv(self._w_odom) @ odom
            self._w_parts.append((cloud, rel))
            # latest reading within the window wins (the reference associates
            # the closest-in-time message to the keyframe)
            for k, v in sensors.items():
                if v is not None:
                    self._w_sensors[k] = v

    def _window_cloud(self) -> PointCloud:
        """Collapse the accumulated window into one downsampled cloud.

        Per-scan path (`add_scan`): motion-compose the stacked (W,cap,*)
        window in ONE device program (`global_graph_nodelet.cpp:237-244`);
        the part count is padded to a power of two so the jit sees a bounded
        set of shapes. Batch path (`add_scan_batch`): the groups are already
        centroided partials — return the single partial, or dedup-merge the
        chunk-boundary few.
        """
        if self._w_partials:
            parts = self._w_partials
            if len(parts) == 1:
                return parts[0]
            from lv_slam_tpu.utils.jit_cache import merge_partials_fn

            target = 1
            while target < len(parts):
                target *= 2
            # pad with repeats of the first partial: dedup-first keeps the
            # earliest occurrence per voxel, so trailing duplicates are inert
            pad = parts + [parts[0]] * (target - len(parts))
            merge = merge_partials_fn(
                self.prefilter_cfg.downsample_resolution
                if self.prefilter_cfg.downsample_method.upper() != "NONE" else 0.1,
                self.keyframe_cloud_cap, target,
            )
            return merge(
                tuple(p.xyz for p in pad),
                tuple(p.intensity for p in pad),
                tuple(p.mask for p in pad),
            )
        w = len(self._w_parts)
        target = 1
        while target < w:
            target *= 2
        pad = self._w_parts[0][0]
        xyzs = tuple(c.xyz for c, _ in self._w_parts) + (pad.xyz,) * (target - w)
        intens = tuple(c.intensity for c, _ in self._w_parts) + (pad.intensity,) * (target - w)
        zero_mask = None
        masks = tuple(c.mask for c, _ in self._w_parts)
        if target > w:
            zero_mask = jnp.zeros_like(pad.mask)
            masks = masks + (zero_mask,) * (target - w)
        rels = np.stack(
            [rel for _, rel in self._w_parts] + [np.eye(4)] * (target - w)
        ).astype(np.float32)
        return self._window_flush(xyzs, intens, masks, jnp.asarray(rels))

    def _flush_window(self) -> None:
        downsampled = self._window_cloud()
        descriptor = keypoints = None
        if self._w_orb is not None:
            descriptor, keypoints = self._w_orb
        elif self._w_image is not None:
            descriptor, keypoints = self._extract_orb(self._w_image)
        kf = KeyFrame(
            stamp=self._w_stamp,
            seq=self._w_seq,
            odom=self._w_odom,
            accum_distance=self._w_accum,
            cloud=downsampled,
            descriptor=descriptor,
            keypoints=keypoints,
        )
        kf._pending_sensors = dict(self._w_sensors)  # attached at flush
        self._w_sensors = {}
        self.keyframe_queue.append(kf)

    def add_scan_batch(
        self,
        seq0: int,
        stamps: np.ndarray,
        odoms: np.ndarray,
        chunk: PointCloud,
        images=None,
        sensors=None,
        filtered: bool = False,
    ) -> None:
        """Chunk-level `cloud_callback`: C scans arriving as stacked device
        arrays (C,cap,*) plus host odometry poses (C,4,4).

        Behaviorally equivalent to C `add_scan` calls on prefiltered slices
        — with one restriction: the raw-chunk path (`filtered=False`) folds
        only the distance band + voxel centroid into the window group
        program; `use_angle_calibration` and `outlier_removal_method` from
        PrefilterConfig are NOT applied (a warning is raised if enabled).
        The device work per keyframe window is ONE group program
        (`jit_cache.window_group_fn`) that slices the raw chunk, applies the
        prefilter's distance band, motion-composes, and voxel-centroids in a
        single dispatch — per-scan device slicing costs ~50 ms per op
        through the remote-TPU relay and a separate `/filtered_points`
        prefilter pass costs ~15 ms/scan, both of which this removes.
        Windows spanning chunk boundaries accumulate one partial per chunk
        and dedup-merge at flush.

        `images` may be a host list (one optional (H,W) array per scan) or a
        DEVICE-RESIDENT (C,H,W) stack: device stacks run ORB for every
        window-opening scan of the chunk in ONE batched dispatch
        (`OrbExtractor.detect_and_compute_batch`) — the per-keyframe path
        pays an image upload + dispatch + fetch round of relay latency each
        (~276 ms/keyframe measured on the remote-TPU rig).

        `filtered=True`: `chunk` holds the odometry program's
        `/filtered_points` product (xyz TRANSPOSED (C,3,cap), already
        distance-banded + voxel-centroided;
        `run_sequence_fused(return_filtered=True)`) — the window group then
        only motion-composes + dedups, skipping a second prefilter pass
        over raw rows (the reference's backend likewise consumes
        `/filtered_points`, not `/velodyne_points`).
        """
        if not filtered and (
            self.prefilter_cfg.use_angle_calibration
            or self.prefilter_cfg.outlier_removal_method.upper() != "NONE"
        ):
            import warnings

            warnings.warn(
                "add_scan_batch raw-chunk path applies only the distance band "
                "+ voxel centroid; use_angle_calibration/outlier_removal_method "
                "are dropped — use per-scan add_scan for full prefiltering",
                stacklevel=2,
            )
        odoms = np.asarray(odoms, np.float64)
        stamps = np.asarray(stamps, np.float64)
        c = odoms.shape[0]
        triggers, accums = [], []
        for i in range(c):
            self.odoms[seq0 + i] = odoms[i]
            triggers.append(self.updater.update(odoms[i]))
            accums.append(self.updater.accum_distance)

        orb_batch = {}
        import jax

        images_on_device = isinstance(images, jax.Array)
        if images_on_device:
            opened = [i for i in range(c) if triggers[i]]
            if opened:
                _t_orb = time.perf_counter()
                import jax.numpy as jnp

                if self._orb is None:
                    from lv_slam_tpu.ops import orb

                    self._orb = orb.OrbExtractor(
                        max_features=self.loop_cfg.descriptor_cap
                    )
                b2 = 1
                while b2 < len(opened):
                    b2 *= 2
                idx = opened + [opened[0]] * (b2 - len(opened))
                rows = images[jnp.asarray(idx, jnp.int32)]
                results = self._orb.detect_and_compute_batch(rows)
                orb_batch = dict(zip(opened, results[: len(opened)]))
                self.timings["feed_orb"] = (
                    self.timings.get("feed_orb", 0.0)
                    + time.perf_counter() - _t_orb
                )

        _t_win = time.perf_counter()
        group_cap = 16  # bounds the (L,cap,3) in-program window intermediate
        i = 0
        while i < c:
            if triggers[i]:
                if self._w_odom is not None:
                    self._flush_window()
                self._w_parts = []
                self._w_partials = []
                self._w_odom = odoms[i]
                self._w_seq = seq0 + i
                self._w_stamp = float(stamps[i])
                if images_on_device:
                    self._w_image = None
                    self._w_orb = orb_batch.get(i)
                else:
                    self._w_image = images[i] if images is not None else None
                    self._w_orb = None
                self._w_accum = accums[i]
                self._w_sensors = {}
            j = i + 1
            while j < c and not triggers[j] and j - i < group_cap:
                j += 1
            self._append_group(chunk, odoms, i, j, filtered)
            if sensors is not None:
                for k in range(i, j):
                    for key, v in (sensors[k] or {}).items():
                        if v is not None:
                            self._w_sensors[key] = v
            i = j
        self.timings["feed_window"] = (
            self.timings.get("feed_window", 0.0) + time.perf_counter() - _t_win
        )
        # eager loop-verification dispatch: this chunk's new keyframes enter
        # the graph now and their verify ladders go on the device queue
        # dispatch-only, overlapping the next chunk's odometry (the
        # reference's backend thread runs concurrently for the same reason)
        self._ingest("feed")

    def _append_group(
        self, chunk: PointCloud, odoms: np.ndarray, i: int, j: int,
        filtered: bool = False,
    ) -> None:
        """Run one window-group program over chunk scans [i, j) and append
        the resulting partial to the open window."""
        from lv_slam_tpu.utils.jit_cache import (
            window_group_filtered_fn,
            window_group_fn,
        )

        length = j - i
        l2 = 1
        while l2 < length:
            l2 *= 2
        rels = np.stack(
            [np.linalg.inv(self._w_odom) @ odoms[k] for k in range(i, j)]
            + [np.eye(4)] * (l2 - length)
        ).astype(np.float32)
        valid = np.zeros(l2, bool)
        valid[:length] = True
        pf = self.prefilter_cfg
        res = (
            pf.downsample_resolution
            if pf.downsample_method.upper() != "NONE" else 0.1
        )
        if filtered:
            fn = window_group_filtered_fn(res, self.keyframe_cloud_cap, l2)
        else:
            near, far = (
                (pf.distance_near_thresh, pf.distance_far_thresh)
                if pf.use_distance_filter else (0.0, float("inf"))
            )
            fn = window_group_fn(near, far, res, self.keyframe_cloud_cap, l2)
        partial = fn(
            chunk.xyz, chunk.intensity, chunk.mask,
            jnp.int32(i), jnp.asarray(rels), jnp.asarray(valid),
        )
        self._w_partials.append(partial)

    def finish(self) -> None:
        """Flush the trailing window (the reference drops it; we keep it so
        short sequences still produce their last keyframe)."""
        if self._w_odom is not None and (self._w_parts or self._w_partials):
            self._flush_window()
            self._w_parts, self._w_partials, self._w_odom = [], [], None

    def drain(self) -> None:
        """Run optimize cycles until the keyframe queue is empty AND every
        in-flight loop verification has been harvested (the async detect
        defers verdicts by one cycle). End-of-sequence idiom:
        `backend.finish(); backend.drain()`.

        Intermediate cycles (ones that still flush keyframes, so another
        cycle must follow) skip the LM solve — its poses would be recomputed
        immediately; only the final cycle pays the solve + pose fetch (the
        drain tail is synchronous rig time on the remote-TPU relay)."""
        while self.keyframe_queue or self.pending_loops:
            self.optimize(lm=not self.keyframe_queue)
        if self._graph_dirty:
            self.optimize()

    def _extract_orb(self, image: np.ndarray):
        from lv_slam_tpu.ops import orb

        if self._orb is None:
            self._orb = orb.OrbExtractor(max_features=self.loop_cfg.descriptor_cap)
        return self._orb.detect_and_compute(image)

    # --------------------------------------------------------------- optimize
    def _ingest(self, prefix: str = "opt") -> bool:
        """Flush queued keyframes into the graph AND dispatch their loop
        verifications (async device programs, harvested at a later optimize
        cycle). Called from `add_scan_batch` (prefix="feed") so the verify
        ladders overlap the NEXT chunk's odometry dispatches — on the circle
        workload every loop candidate appears near sequence end, and without
        eager dispatch all of that device work lands synchronously in the
        `drain()` tail (the measured optimize_ms_per_scan≈38 wall of the
        round-5 on-chip capture)."""
        tick = time.perf_counter
        t0 = tick()
        updated = self._flush_keyframe_queue()
        self.timings[prefix + "_flush"] = (
            self.timings.get(prefix + "_flush", 0.0) + tick() - t0
        )
        if not updated:
            return False
        t0 = tick()
        self.pending_loops += self.loop_detector.dispatch_verifications(
            self.keyframes, self.new_keyframes
        )
        self.keyframes.extend(self.new_keyframes)
        self.new_keyframes = []
        self._graph_dirty = True
        self.timings[prefix + "_dispatch"] = (
            self.timings.get(prefix + "_dispatch", 0.0) + tick() - t0
        )
        return True

    def optimize(self, num_iterations: Optional[int] = None, lm: bool = True):
        """One `optimization_timer_callback` cycle. Returns the LM result or
        None when nothing changed since the last solve (no new keyframes AND
        no accepted loops).

        Loop detection is asynchronous, like the reference's backend thread
        that never blocks odometry (`global_graph_nodelet.cpp:670-764`):
        verifications are DISPATCHED eagerly as keyframes arrive (feed-time
        `_ingest`, so their device work overlaps the pipeline's odometry
        dispatches); this cycle HARVESTS the in-flight verdicts, adds the
        accepted loop edges, then runs the LM solve. `lm=False` does
        everything but the solve (drain()'s intermediate cycles). Call
        `drain()` at end of sequence to flush both queues."""
        cfg = self.cfg
        tick = time.perf_counter

        def tock(key, t0):
            self.timings[key] = self.timings.get(key, 0.0) + tick() - t0
            return tick()

        t0 = tick()
        # this fetch waits on verify ladders dispatched at feed time — in
        # steady state their device work already overlapped the pipeline,
        # but an end-of-sequence drain() pays the last chunk's synchronously
        loops = self.loop_detector.harvest(self.pending_loops)
        t0 = tock("opt_harvest", t0)
        self.pending_loops = []
        self._ingest()  # catch anything not ingested at feed time
        if loops:
            self._graph_dirty = True
        if not self._graph_dirty:
            return None
        t0 = tick()

        for loop in loops:
            info = np.asarray(
                calc_information_matrix(loop.key1.cloud, loop.key2.cloud, loop.relative_pose, cfg)
            )
            self.graph = pg.add_se3_edge(
                self.graph,
                self._n_edges,
                loop.key1.node_id,
                loop.key2.node_id,
                loop.relative_pose,
                info,
                huber=_huber_size(cfg.loop_closure_edge_robust_kernel, cfg.loop_closure_edge_robust_kernel_size),
            )
            self._n_edges += 1
            self.loops.append(loop)
        t0 = tock("opt_loop_edges", t0)
        if not lm:
            return None

        # ship only the ACTIVE prefix of the graph: node/edge/prior slots are
        # assigned sequentially, so slicing to the next power-of-two bucket is
        # exact. Upload volume AND the dense LM normal-equation size then
        # scale with content, not with the configured capacities (a
        # 1024-keyframe cap no longer costs a 6144^2 solve for a 40-node
        # graph); each bucket tuple compiles once.
        active, k2 = self._active_graph()
        result = pg.optimize_pose_graph(
            active, num_iterations or cfg.solver_num_iterations
        )
        t0 = tock("opt_lm_dispatch", t0)
        poses = np.asarray(result.poses, np.float64)
        t0 = tock("opt_lm_fetch", t0)
        self.timings["opt_cycles"] = self.timings.get("opt_cycles", 0.0) + 1.0
        self._graph_dirty = False
        self.graph.poses[:k2] = poses.astype(np.float32)  # host arrays, in place
        if self._n_planes:  # each fetch costs a relay round trip
            self.graph.planes[:] = np.asarray(result.planes, np.float32)
        for kf in self.keyframes:
            kf.estimate = poses[kf.node_id]

        last = self.keyframes[-1]
        self.trans_odom2map = last.estimate @ np.linalg.inv(last.odom)
        return result

    def _active_graph(self):
        """Slice the graph to power-of-two buckets over the active prefix
        (ids are sequential). Plane/plane-edge arrays stay whole (caps <= 64)."""

        def bucket(n: int, cap: int, lo: int = 8) -> int:
            b = lo
            while b < n:
                b *= 2
            return min(b, cap)

        g = self.graph
        k2 = bucket(self._n_nodes, self.cfg.keyframe_cap)
        e2 = bucket(self._n_edges, self.cfg.edge_cap)
        p2 = bucket(self._n_priors, self.cfg.prior_cap)
        s2 = bucket(self._n_sp_edges, self.cfg.sp_edge_cap)
        active = g._replace(
            poses=g.poses[:k2], node_valid=g.node_valid[:k2],
            node_fixed=g.node_fixed[:k2],
            e_i=g.e_i[:e2], e_j=g.e_j[:e2], e_meas=g.e_meas[:e2],
            e_info=g.e_info[:e2], e_huber=g.e_huber[:e2], e_valid=g.e_valid[:e2],
            p_node=g.p_node[:p2], p_type=g.p_type[:p2], p_meas=g.p_meas[:p2],
            p_info=g.p_info[:p2], p_huber=g.p_huber[:p2], p_valid=g.p_valid[:p2],
            sp_i=g.sp_i[:s2], sp_plane=g.sp_plane[:s2], sp_meas=g.sp_meas[:s2],
            sp_info=g.sp_info[:s2], sp_huber=g.sp_huber[:s2], sp_valid=g.sp_valid[:s2],
        )
        return active, k2

    def _flush_keyframe_queue(self) -> bool:
        if not self.keyframe_queue:
            return False
        cfg = self.cfg
        odom2map = self.trans_odom2map
        n = min(len(self.keyframe_queue), cfg.max_keyframes_per_update)
        for i in range(n):
            kf = self.keyframe_queue[i]
            kf.node_id = self._n_nodes
            self._n_nodes += 1
            self.new_keyframes.append(kf)
            pose0 = odom2map @ kf.odom
            self.graph = pg.add_node(self.graph, kf.node_id, pose0)
            kf.estimate = pose0
            if not self.keyframes and len(self.new_keyframes) == 1:
                # fix the first node through an anchor
                # (`global_graph_nodelet.cpp:279-287`)
                if cfg.fix_first_node:
                    self.anchor_node_id = self._n_nodes
                    self._n_nodes += 1
                    self.graph = pg.add_node(self.graph, self.anchor_node_id, np.eye(4))
                    self.graph = pg.set_node_fixed(self.graph, self.anchor_node_id)
                    self.anchor_edge_id = self._n_edges
                    self.graph = pg.add_se3_edge(
                        self.graph, self._n_edges, self.anchor_node_id, kf.node_id,
                        np.eye(4), np.eye(6),
                    )
                    self._n_edges += 1
                continue
            prev = (
                self.keyframes[-1]
                if i == 0 and self.keyframes
                else self.new_keyframes[-2]
            )
            relative = np.linalg.inv(kf.odom) @ prev.odom
            info = np.asarray(calc_information_matrix(prev.cloud, kf.cloud, relative, cfg))
            self.graph = pg.add_se3_edge(
                self.graph,
                self._n_edges,
                kf.node_id,
                prev.node_id,
                relative,
                info,
                huber=_huber_size(cfg.odometry_edge_robust_kernel, cfg.odometry_edge_robust_kernel_size),
            )
            self._n_edges += 1
        # attach queued sensor priors now that node ids exist
        for kf in self.new_keyframes[-n:]:
            pending = getattr(kf, "_pending_sensors", None) or {}
            if "gps" in pending and cfg.enable_gps:
                self.add_gps_prior(kf, np.asarray(pending["gps"]))
            if "imu_quat" in pending and cfg.enable_imu_orientation:
                self.add_imu_orientation_prior(kf, np.asarray(pending["imu_quat"]))
            if "imu_acc" in pending and cfg.enable_imu_acceleration:
                self.add_imu_acceleration_prior(kf, np.asarray(pending["imu_acc"]))
            if "floor" in pending:
                self.add_floor_prior(kf, np.asarray(pending["floor"]))
        del self.keyframe_queue[:n]
        return True

    # --------------------------------------------------------------- priors
    def add_gps_prior(self, kf: KeyFrame, xyz: np.ndarray) -> None:
        """GPS position prior. Like the reference, the first UTM fix becomes
        `zero_utm` and all measurements are expressed relative to it
        (`global_graph_nodelet.cpp:407-441`)."""
        cfg = self.cfg
        xyz = np.asarray(xyz, np.float64)
        if self.zero_utm is None:
            self.zero_utm = xyz.copy()
        rel = xyz - self.zero_utm
        info = np.diag(
            [1.0 / cfg.gps_edge_stddev_xy, 1.0 / cfg.gps_edge_stddev_xy, 1.0 / cfg.gps_edge_stddev_z]
        )
        self.graph = pg.add_prior(
            self.graph, self._n_priors, kf.node_id, pg.PRIOR_XYZ, rel, info, huber=1.0
        )
        self._n_priors += 1
        kf.utm_coord = xyz

    def add_imu_orientation_prior(self, kf: KeyFrame, quat_wxyz: np.ndarray) -> None:
        cfg = self.cfg
        info = np.eye(3) / cfg.imu_orientation_edge_stddev
        self.graph = pg.add_prior(
            self.graph, self._n_priors, kf.node_id, pg.PRIOR_QUAT, quat_wxyz, info, huber=1.0
        )
        self._n_priors += 1
        kf.orientation = np.asarray(quat_wxyz)

    def add_imu_acceleration_prior(self, kf: KeyFrame, acc_local: np.ndarray) -> None:
        cfg = self.cfg
        info = np.eye(3) / cfg.imu_acceleration_edge_stddev
        meas = np.concatenate([[0.0, 0.0, 1.0], acc_local / max(np.linalg.norm(acc_local), 1e-9)])
        self.graph = pg.add_prior(
            self.graph, self._n_priors, kf.node_id, pg.PRIOR_VEC, meas, info, huber=1.0
        )
        self._n_priors += 1
        kf.acceleration = np.asarray(acc_local)

    def add_floor_prior(self, kf: KeyFrame, coeffs: np.ndarray) -> None:
        """Floor constraint through the SHARED fixed z=0 plane vertex, like
        the reference (`global_graph_nodelet.cpp:598-612`): every floored
        keyframe gets an EdgeSE3Plane against the one floor node."""
        cfg = self.cfg
        if self.floor_plane_node_id is None:
            self.floor_plane_node_id = self._n_planes
            self.graph = pg.add_plane_node(
                self.graph, self.floor_plane_node_id, [0.0, 0.0, 1.0, 0.0], fixed=True
            )
            self._n_planes += 1
        info = np.eye(3) / cfg.floor_edge_stddev
        self.graph = pg.add_se3_plane_edge(
            self.graph, self._n_sp_edges, kf.node_id, self.floor_plane_node_id,
            coeffs, info,
            huber=_huber_size(cfg.floor_edge_robust_kernel, cfg.floor_edge_robust_kernel_size),
        )
        self._n_sp_edges += 1
        kf.floor_coeffs = np.asarray(coeffs)

    # --------------------------------------------------------------- services
    def dump(self, directory: str) -> bool:
        """`/global_graph/dump` (:979-1027)."""
        os.makedirs(directory, exist_ok=True)
        g2o_io.save_graph(os.path.join(directory, "graph.g2o"), self.graph)
        for i, kf in enumerate(self.keyframes):
            kf_dir = os.path.join(directory, f"{i:06d}")
            os.makedirs(kf_dir, exist_ok=True)
            with open(os.path.join(kf_dir, "data"), "w") as f:
                f.write(f"stamp {kf.stamp:.9f}\n")
                f.write(f"seq {kf.seq}\n")
                f.write("odom\n")
                for row in kf.odom:
                    f.write(" ".join(f"{v:.9g}" for v in row) + "\n")
                f.write(f"accum_distance {kf.accum_distance:.9g}\n")
                # optional per-keyframe sensor annotations, same single-line
                # layout as the reference (`keyframe.cpp:66-85`)
                if kf.floor_coeffs is not None:
                    f.write("floor_coeffs " + " ".join(f"{v:.9g}" for v in kf.floor_coeffs) + "\n")
                if kf.utm_coord is not None:
                    f.write("utm_coord " + " ".join(f"{v:.9g}" for v in kf.utm_coord) + "\n")
                if kf.acceleration is not None:
                    f.write("acceleration " + " ".join(f"{v:.9g}" for v in kf.acceleration) + "\n")
                if kf.orientation is not None:
                    f.write("orientation " + " ".join(f"{v:.9g}" for v in kf.orientation) + "\n")
                if kf.estimate is not None:
                    f.write("estimate\n")
                    for row in kf.estimate:
                        f.write(" ".join(f"{v:.9g}" for v in row) + "\n")
                f.write(f"id {kf.node_id}\n")
            pcd.write_pcd(os.path.join(kf_dir, "cloud.pcd"), kf.cloud.to_numpy())
        if self.zero_utm is not None:
            with open(os.path.join(directory, "zero_utm"), "w") as f:
                f.write(" ".join(f"{v:.9f}" for v in self.zero_utm) + "\n")
        # real ids like the reference (`global_graph_nodelet.cpp:1018-1021`);
        # plane vertices live in the g2o file at PLANE_ID_OFFSET + index
        anchor_node = -1 if self.anchor_node_id is None else self.anchor_node_id
        anchor_edge = -1 if self.anchor_edge_id is None else self.anchor_edge_id
        floor_node = (
            -1 if self.floor_plane_node_id is None
            else g2o_io.PLANE_ID_OFFSET + self.floor_plane_node_id
        )
        with open(os.path.join(directory, "special_nodes.csv"), "w") as f:
            f.write(f"anchor_node {anchor_node}\n")
            f.write(f"anchor_edge {anchor_edge}\n")
            f.write(f"floor_node {floor_node}\n")
        self.save_pose(directory)
        return True

    def save_map(self, destination: str, resolution: float = 0.05, utm: bool = False) -> bool:
        """`/global_graph/save_map` (:1035-1070). `utm=True` offsets the map
        by `zero_utm` (and writes a `.utm` sidecar), like the reference."""
        if not self.keyframes:
            return False
        clouds = [kf.cloud for kf in self.keyframes]
        poses = [kf.estimate if kf.estimate is not None else kf.odom for kf in self.keyframes]
        points = generate_map_cloud(clouds, poses, resolution)
        if points.shape[0] == 0:
            return False
        if utm and self.zero_utm is not None:
            points = points.copy()
            points[:, :3] += self.zero_utm
        if self.zero_utm is not None:
            with open(destination + ".utm", "w") as f:
                f.write(" ".join(f"{v:.9f}" for v in self.zero_utm) + "\n")
        pcd.write_pcd(destination, points)
        return True

    def save_pose(self, directory: str) -> None:
        """ggo_kf_odom.txt + ggo_wf_odom.txt (:1077-1149). The wf file
        distributes each keyframe's optimization residual across its scans;
        the reference's interpolation has a slerp-extrapolation quirk
        (q0.slerp(seq1-seq0, q1) with an out-of-range parameter, :1131) — we
        apply the mathematically intended per-scan fraction instead."""
        kf_poses = np.stack(
            [kf.estimate if kf.estimate is not None else kf.odom for kf in self.keyframes]
        )
        kitti.write_pose_file(
            os.path.join(directory, "ggo_kf_odom.txt"),
            kitti.velo_to_cam_poses(kf_poses, self.tr),
        )

        align = np.linalg.inv(kf_poses[0])
        wf = []
        for i, kf in enumerate(self.keyframes):
            kf_pose = align @ kf_poses[i]
            seq0 = kf.seq
            if seq0 not in self.odoms:
                continue
            odom0 = self.odoms[seq0]
            if i < len(self.keyframes) - 1:
                nxt = self.keyframes[i + 1]
                seq1 = nxt.seq
                if seq1 not in self.odoms:
                    continue
                kf_pose_next = align @ kf_poses[i + 1]
                d_pose = np.linalg.inv(kf_pose) @ kf_pose_next
                d_odom = np.linalg.inv(odom0) @ self.odoms[seq1]
                resid = np.linalg.inv(d_odom) @ d_pose
            else:
                seq1 = max(self.odoms.keys()) + 1
                resid = np.eye(4)
            span = max(seq1 - seq0, 1)
            from lv_slam_tpu.core import se3 as se3m

            resid_log = np.asarray(
                se3m.log_se3(se3m.orthonormalize(jnp.asarray(resid, jnp.float32))),
                np.float64,
            )
            resid_log = np.nan_to_num(resid_log)
            for j in range(seq0, seq1):
                if j not in self.odoms:
                    continue
                pose_s2k = np.linalg.inv(odom0) @ self.odoms[j]
                frac = (j - seq0) / span
                corr = np.asarray(
                    se3m.exp_se3(jnp.asarray(frac * resid_log, jnp.float32)), np.float64
                )
                wf.append(kf_pose @ pose_s2k @ corr)
        if wf:
            kitti.write_pose_file(
                os.path.join(directory, "ggo_wf_odom.txt"),
                kitti.velo_to_cam_poses(np.stack(wf), self.tr),
            )


def _huber_size(kind: str, size: float) -> float:
    return size if (kind or "NONE").upper() == "HUBER" else 0.0


def load_dump(
    directory: str,
    cfg: Optional[GraphConfig] = None,
    loop_cfg: Optional[LoopDetectorConfig] = None,
    keyframe_cloud_cap: int = 131072,
) -> GlobalGraph:
    """Rebuild a GlobalGraph from a dump directory (the reference's unused
    `KeyFrame::load` + `GraphSLAM::load` authoring path, `keyframe.cpp:94-201`):
    graph.g2o (+ kernels) and the per-keyframe `%06d/` dirs, re-binding
    keyframes to graph nodes by id — ready for offline re-optimization."""
    backend = GlobalGraph(cfg, loop_cfg, keyframe_cloud_cap=keyframe_cloud_cap)
    g = backend.cfg
    backend.graph = g2o_io.load_graph(
        os.path.join(directory, "graph.g2o"), g.keyframe_cap, g.edge_cap,
        g.prior_cap, g.plane_cap, g.sp_edge_cap, g.plane_edge_cap,
    )
    backend._n_edges = int(np.asarray(backend.graph.e_valid).sum())
    backend._n_nodes = int(np.asarray(backend.graph.node_valid).sum())
    backend._n_priors = int(np.asarray(backend.graph.p_valid).sum())
    backend._n_planes = int(np.asarray(backend.graph.plane_valid).sum())
    backend._n_sp_edges = int(np.asarray(backend.graph.sp_valid).sum())
    backend._n_plane_edges = int(np.asarray(backend.graph.q_valid).sum())
    special = os.path.join(directory, "special_nodes.csv")
    if os.path.exists(special):
        with open(special) as f:
            vals = dict(line.split() for line in f if line.strip())
        if int(vals.get("anchor_node", -1)) >= 0:
            backend.anchor_node_id = int(vals["anchor_node"])
        if int(vals.get("anchor_edge", -1)) >= 0:
            backend.anchor_edge_id = int(vals["anchor_edge"])
        if int(vals.get("floor_node", -1)) >= 0:
            backend.floor_plane_node_id = int(vals["floor_node"]) - g2o_io.PLANE_ID_OFFSET

    i = 0
    while True:
        kf_dir = os.path.join(directory, f"{i:06d}")
        if not os.path.isdir(kf_dir):
            break
        meta = {}
        with open(os.path.join(kf_dir, "data")) as f:
            lines = [l.rstrip("\n") for l in f]
        j = 0
        while j < len(lines):
            parts = lines[j].split()
            if parts[0] in ("odom", "estimate"):
                rows = [list(map(float, lines[j + k + 1].split())) for k in range(4)]
                meta[parts[0]] = np.asarray(rows)
                j += 5
            else:
                meta[parts[0]] = parts[1:] if len(parts) > 2 else (
                    parts[1] if len(parts) > 1 else None
                )
                j += 1
        points = pcd.read_pcd(os.path.join(kf_dir, "cloud.pcd"))
        kf = KeyFrame(
            stamp=float(meta.get("stamp", 0.0)),
            seq=int(meta.get("seq", i)),
            odom=meta.get("odom", np.eye(4)),
            accum_distance=float(meta.get("accum_distance", 0.0)),
            cloud=PointCloud.from_numpy(points, cap=keyframe_cloud_cap),
            node_id=int(meta.get("id", i)),
            estimate=meta.get("estimate"),
        )
        for field in ("floor_coeffs", "utm_coord", "acceleration", "orientation"):
            if meta.get(field) is not None:
                setattr(kf, field, np.asarray([float(v) for v in meta[field]]))
        backend.keyframes.append(kf)
        i += 1

    utm_path = os.path.join(directory, "zero_utm")
    if os.path.exists(utm_path):
        backend.zero_utm = np.loadtxt(utm_path)
    return backend
