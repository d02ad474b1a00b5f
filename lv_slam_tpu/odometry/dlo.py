"""Direct LiDAR odometry ("dlo"): scan-to-keyframe weighted-NDT tracking.

Behavioral rebuild of `ScanMatchingOdomNodelet::matching_s2k`
(`src/lidar_odometry/scan_matching_odom_nodelet.cpp:192-261`):

- scan 0 becomes the first keyframe; the initial guess is identity with
  x = +1.5 m (:199-200); scan 1 is aligned twice, the second pass seeded with
  the first result (:223-227)
- constant-velocity warm start: `guess = pre_tf_s2k @ tf_s2s` with
  `tf_s2s = pre_tf_s2k^-1 @ tf_s2k` (:249-250)
- keyframe switch when `|t| > delta_trans` or `2*acos(q_w) > delta_angle` or
  `dt > delta_time` (:240-248); the new keyframe map is rebuilt from the
  current filtered scan and `tf_s2k` resets to identity
- odometry pose is `key_pose @ tf_s2k` (:233)

TPU mapping: the NDT align and the keyframe map build are jitted device
programs; the per-scan driver is a thin host loop holding device arrays
(keyframe map, warm-start transforms). A fully fused device-side step (align
+ conditional map rebuild under `lax.cond`) is used by the benchmark path.
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from lv_slam_tpu.config import OdometryConfig, PrefilterConfig
from lv_slam_tpu.core.cloud import PointCloud
from lv_slam_tpu.ops.prefilter import prefilter


@functools.lru_cache(maxsize=16)
def _prefilter_cache(prefilter_cfg: PrefilterConfig):
    return jax.jit(functools.partial(prefilter, cfg=prefilter_cfg))


@functools.lru_cache(maxsize=16)
def _subsample_cache(out_cap: int):
    from lv_slam_tpu.ops.prefilter import uniform_subsample

    return jax.jit(functools.partial(uniform_subsample, out_cap=out_cap))


@functools.lru_cache(maxsize=16)
def _compact_cache(out_cap: int):
    return jax.jit(lambda c: c.compact(out_cap))


@dataclasses.dataclass
class OdometryStats:
    scan_count: int = 0
    keyframe_count: int = 0
    total_align_time: float = 0.0
    total_iterations: int = 0
    retries: int = 0

    @property
    def mean_align_time(self) -> float:
        n = max(self.scan_count - 1, 1)
        return self.total_align_time / n


class DirectLidarOdometry:
    """Host driver around jitted scan-to-keyframe NDT steps."""

    def __init__(
        self,
        cfg: Optional[OdometryConfig] = None,
        prefilter_cfg: Optional[PrefilterConfig] = None,
    ):
        self.cfg = cfg or OdometryConfig()
        self.prefilter_cfg = prefilter_cfg
        ndt = self.cfg.ndt

        from lv_slam_tpu.utils.jit_cache import build_map_fn, ndt_align_fn

        self._build = build_map_fn(
            ndt.resolution, ndt.leaf_cap, ndt.lut_extent,
            ndt.min_points_per_voxel, ndt.min_covar_eigvalue_mult, ndt.weighted,
        )
        self._align = ndt_align_fn(
            ndt.resolution, ndt.outlier_ratio, ndt.step_size,
            ndt.transformation_epsilon, ndt.max_iterations,
            ndt.neighborhood, ndt.weighted,
        )
        if ndt.retry_deviation_thresh > 0:
            from lv_slam_tpu.utils.jit_cache import ndt_score_fn

            self._align_retry = ndt_align_fn(
                ndt.resolution, ndt.outlier_ratio, ndt.step_size,
                ndt.transformation_epsilon, ndt.max_iterations,
                ndt.retry_neighborhood, ndt.weighted,
            )
            self._score = ndt_score_fn(ndt.resolution, ndt.neighborhood, ndt.weighted)
        else:
            self._align_retry = None
        if prefilter_cfg is not None:
            self._prefilter = _prefilter_cache(prefilter_cfg)
        else:
            self._prefilter = None
        sm = self.cfg.scan_matching_cap
        if prefilter_cfg is not None and sm and sm < prefilter_cfg.out_cap:
            self._subsample = _subsample_cache(sm)
            # uniform_subsample needs a front-compacted cloud; outlier removal
            # re-holes the mask after prefilter()'s compaction
            self._compact_before_subsample = (
                prefilter_cfg.outlier_removal_method.upper() != "NONE"
            )
        else:
            self._subsample = None
            self._compact_before_subsample = False
        self.reset()

    def reset(self):
        self.stats = OdometryStats()
        self._key_map = None
        self._key_pose = np.eye(4, dtype=np.float64)
        self._tf_s2k = np.eye(4, dtype=np.float64)
        self._pre_tf_s2k = np.eye(4, dtype=np.float64)
        self._guess = np.eye(4, dtype=np.float64)
        self._keyframe_stamp = 0.0
        self.poses: list[np.ndarray] = []
        self.keyframe_indices: list[int] = []

    # -- per-scan entry -------------------------------------------------------
    def process(self, cloud: PointCloud, stamp: float) -> np.ndarray:
        """Track one (already device-resident) scan; returns the odometry pose
        (sensor in the frame of keyframe 0) as a float64 (4,4)."""
        cfg = self.cfg
        if self._prefilter is not None:
            cloud = self._prefilter(cloud)
        if self._subsample is not None:
            # bounded-lane scan matching (OdometryConfig.scan_matching_cap);
            # same subsample as the fused driver's in-program path
            if self._compact_before_subsample:
                cloud = _compact_cache(cloud.cap)(cloud)
            cloud = self._subsample(cloud)

        if self.stats.scan_count == 0:
            self._key_map = self._build(cloud)
            self._guess = np.eye(4)
            self._guess[0, 3] = cfg.initial_guess_x
            self._keyframe_stamp = stamp
            self.stats.scan_count = 1
            self.stats.keyframe_count = 1
            self.keyframe_indices.append(0)
            self.poses.append(np.eye(4))
            return np.eye(4)

        t0 = time.perf_counter()
        guess_j = jnp.asarray(self._guess, jnp.float32)
        result = self._align(self._key_map, cloud, guess_j)
        tf_s2k = np.asarray(result.transform, np.float64)
        if self.stats.scan_count == 1:
            # the reference aligns scan 1 twice (:223-227)
            result = self._align(self._key_map, cloud, jnp.asarray(tf_s2k, jnp.float32))
            tf_s2k = np.asarray(result.transform, np.float64)
        # deviation-triggered wide-basin retry (NDTConfig.retry_*)
        if (
            self._align_retry is not None
            and np.linalg.norm(tf_s2k[:3, 3] - self._guess[:3, 3])
            > self.cfg.ndt.retry_deviation_thresh
        ):
            retry = self._align_retry(self._key_map, cloud, guess_j)
            s_retry = float(self._score(self._key_map, cloud, retry.transform))
            if s_retry > float(result.score):
                result = retry
                tf_s2k = np.asarray(retry.transform, np.float64)
                self.stats.retries += 1
        self.stats.total_align_time += time.perf_counter() - t0
        self.stats.total_iterations += int(result.iterations)

        tf_s2s = np.linalg.inv(self._pre_tf_s2k) @ tf_s2k
        odom = self._key_pose @ tf_s2k

        # keyframe gate (:240-248)
        dx = np.linalg.norm(tf_s2k[:3, 3])
        qw = np.clip(_rot_qw(tf_s2k[:3, :3]), -1.0, 1.0)
        da = 2.0 * np.arccos(qw)
        dt = stamp - self._keyframe_stamp
        if dx > cfg.keyframe_delta_trans or da > cfg.keyframe_delta_angle or dt > cfg.keyframe_delta_time:
            self._key_map = self._build(cloud)
            self._key_pose = odom
            tf_s2k = np.eye(4)
            self._keyframe_stamp = stamp
            self.stats.keyframe_count += 1
            self.keyframe_indices.append(self.stats.scan_count)

        self._pre_tf_s2k = tf_s2k
        self._guess = tf_s2k @ tf_s2s
        self.stats.scan_count += 1
        self.poses.append(odom)
        return odom

    def process_numpy(self, scan: np.ndarray, stamp: float, cap: int = 131072) -> np.ndarray:
        return self.process(PointCloud.from_numpy(scan, cap=cap), stamp)


def _rot_qw(rot: np.ndarray) -> float:
    """|w| of the quaternion of a rotation matrix (for the 2*acos(w) gate)."""
    tr = np.trace(rot)
    return float(np.sqrt(max(0.0, 1.0 + tr)) / 2.0)


def run_sequence(
    scans,
    stamps=None,
    cfg: Optional[OdometryConfig] = None,
    prefilter_cfg: Optional[PrefilterConfig] = None,
    cap: int = 131072,
) -> tuple[np.ndarray, OdometryStats]:
    """Convenience: run DLO over a list of (M,4) numpy scans -> (N,4,4) poses."""
    odo = DirectLidarOdometry(cfg, prefilter_cfg)
    if stamps is None:
        stamps = [i * 0.1 for i in range(len(scans))]
    poses = [odo.process_numpy(s, t, cap=cap) for s, t in zip(scans, stamps)]
    return np.stack(poses), odo.stats
