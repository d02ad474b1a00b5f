"""LFA pipeline: feature extraction -> scan-to-scan odometry -> scan-to-map.

The reference's "lfa" stage is the external A-LOAM process chain
`ascanRegistration -> alaserOdometry -> alaserMapping`
(`launch/dlo_lfa_ggo_kitti.launch:55-81`) whose `/aft_mapped_to_init_high_frec`
output feeds the global graph. Here the three processes collapse into one
host driver around three jitted device programs.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from lv_slam_tpu.config import LfaConfig
from lv_slam_tpu.core.cloud import PointCloud
from lv_slam_tpu.lfa.features import extract_features
from lv_slam_tpu.lfa.mapping import FeatureMapping
from lv_slam_tpu.lfa.odometry import FeatureOdometry


class LfaPipeline:
    def __init__(self, cfg: Optional[LfaConfig] = None):
        self.cfg = cfg or LfaConfig()
        self.odometry = FeatureOdometry(self.cfg)
        self.mapping = FeatureMapping(self.cfg)
        self.poses: list[np.ndarray] = []

    def process(self, cloud: PointCloud) -> np.ndarray:
        """One scan in (sensor frame) -> refined world pose out."""
        feats = extract_features(cloud, self.cfg)
        odom = self.odometry.process(feats)
        pose = self.mapping.process(feats, odom)
        self.poses.append(pose)
        return pose

    def process_numpy(self, scan: np.ndarray, cap: int = 131072) -> np.ndarray:
        return self.process(PointCloud.from_numpy(scan, cap=cap))
