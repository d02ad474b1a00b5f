"""Full SLAM pipeline: dlo -> lfa -> ggo (the `dlo_lfa_ggo_kitti` stack).

Mirrors the reference's flagship launch topology
(`launch/dlo_lfa_ggo_kitti.launch`):

- prefilter (0.1 m voxel + distance band) feeds the DLO frontend
- the "lfa" stage refines odometry against persistent feature maps. In
  `dlo_lfa` mode the DLO pose seeds the scan-to-map solve (the reference
  couples its A-LOAM fork to the dlo output); in pure `lfa` mode the
  scan-to-scan feature odometry provides the seed.
- the global graph consumes the refined odometry + filtered cloud (+ camera
  image when available) and runs loop closure + LM on a fixed cadence
  (the reference's 10 s wall timer becomes an every-N-scans cadence).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from lv_slam_tpu.config import PipelineConfig
from lv_slam_tpu.core.cloud import PointCloud
from lv_slam_tpu.lfa.features import extract_features
from lv_slam_tpu.lfa.mapping import FeatureMapping
from lv_slam_tpu.lfa.odometry import FeatureOdometry
from lv_slam_tpu.odometry.dlo import DirectLidarOdometry
from lv_slam_tpu.pipeline.backend import GlobalGraph


class LvSlam:
    def __init__(
        self,
        cfg: Optional[PipelineConfig] = None,
        use_dlo: bool = True,
        use_lfa: bool = True,
        optimize_every: int = 100,
        scan_cap: int = 131072,
        vocabulary=None,
    ):
        self.cfg = cfg or PipelineConfig()
        self.use_dlo = use_dlo
        self.use_lfa = use_lfa and self.cfg.lfa is not None
        self.optimize_every = optimize_every
        self.scan_cap = scan_cap

        self.dlo = DirectLidarOdometry(self.cfg.odometry, self.cfg.prefilter) if use_dlo else None
        if self.use_lfa:
            self.feature_odometry = None if use_dlo else FeatureOdometry(self.cfg.lfa)
            self.mapping = FeatureMapping(self.cfg.lfa)
        tr = None
        if self.cfg.calib_tr is not None:
            tr = np.eye(4)
            tr[:3, :4] = np.asarray(self.cfg.calib_tr, np.float64).reshape(3, 4)
        self.backend = GlobalGraph(self.cfg.graph, self.cfg.loop, calib_tr=tr, vocabulary=vocabulary)

        self._seq = 0
        self.dlo_poses: list[np.ndarray] = []
        self.lfa_poses: list[np.ndarray] = []

    def process(
        self,
        scan: np.ndarray,
        stamp: float,
        image: Optional[np.ndarray] = None,
        gps_xyz: Optional[np.ndarray] = None,
        imu_quat_wxyz: Optional[np.ndarray] = None,
        imu_acceleration: Optional[np.ndarray] = None,
        detect_floor: bool = False,
    ) -> np.ndarray:
        """One raw (M,4) scan in -> current odometry pose out.

        Optional sensor attachments mirror the reference's GPS/IMU/floor
        queues (`global_graph_nodelet.cpp:314-627`): each is attached to the
        NEXT keyframe created at/after this scan as a unary prior.
        """
        cloud = PointCloud.from_numpy(scan, cap=self.scan_cap)

        odom = np.eye(4)
        if self.dlo is not None:
            odom = self.dlo.process(cloud, stamp)
            self.dlo_poses.append(odom)

        if self.use_lfa:
            feats = extract_features(cloud, self.cfg.lfa)
            if self.feature_odometry is not None:
                odom = self.feature_odometry.process(feats)
            refined = self.mapping.process(feats, odom)
            self.lfa_poses.append(refined)
            odom = refined

        # the backend receives the (prefiltered) cloud like /filtered_points
        filtered = self.dlo._prefilter(cloud) if (self.dlo and self.dlo._prefilter) else cloud
        floor_coeffs = None
        if detect_floor:
            from lv_slam_tpu.ops.floor import detect_floor as _detect

            result = _detect(filtered)
            if bool(result.found):
                floor_coeffs = np.asarray(result.coeffs)
        self.backend.add_scan(
            self._seq, stamp, odom, filtered, image=image,
            gps_xyz=gps_xyz, imu_quat_wxyz=imu_quat_wxyz,
            imu_acceleration=imu_acceleration, floor_coeffs=floor_coeffs,
        )
        self._seq += 1
        if self._seq % self.optimize_every == 0:
            self.backend.optimize()
        return odom

    def finalize(self):
        """Flush the trailing keyframe window and run a final optimization."""
        self.backend.finish()
        result = None
        while self.backend.keyframe_queue or self.backend.pending_loops:
            out = self.backend.optimize()
            result = out if out is not None else result
        return result

    def trajectory(self) -> np.ndarray:
        """Optimized keyframe trajectory (K,4,4)."""
        return np.stack([
            kf.estimate if kf.estimate is not None else kf.odom
            for kf in self.backend.keyframes
        ]) if self.backend.keyframes else np.zeros((0, 4, 4))
