"""Typed configuration mirroring the reference's launch-file parameter surface.

The reference's de-facto config system is ROS launch XML (`launch/*.launch`);
every component ctor pulls `private_nh.param<T>(name, default)`. Here each
pipeline stage gets a frozen dataclass whose field names and defaults follow
the flagship KITTI configuration (`launch/dlo_lfa_ggo_kitti.launch`) and the
in-code defaults (`src/lidar_odometry/*.cpp`, `include/global_graph/*.hpp`).

Static shape capacities (``*_cap`` fields) are TPU additions: every device
array is fixed-capacity + validity mask so that XLA compiles one program per
configuration.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class PrefilterConfig:
    """Scan prefiltering (reference `src/lidar_odometry/prefiltering_nodelet.cpp:39-89`)."""

    use_distance_filter: bool = True
    distance_near_thresh: float = 0.5
    distance_far_thresh: float = 100.0
    # NONE | VOXELGRID | APPROX_VOXELGRID | DEDUP (first point per voxel —
    # no segment reduction; at 0.1 m resolution almost every occupied voxel
    # holds one KITTI return, so this is a cheap near-equivalent A/B of
    # VOXELGRID — see ops/prefilter.voxel_dedup_first)
    downsample_method: str = "VOXELGRID"
    downsample_resolution: float = 0.1
    # NONE | RADIUS | STATISTICAL.  NOTE: the reference's RADIUS branch never
    # assigns the built filter (prefiltering_nodelet.cpp:76-78) so RADIUS is a
    # no-op there; we implement it for real but keep NONE-equivalence as the
    # flagship default ("RADIUS" in the KITTI launch == no-op in practice).
    outlier_removal_method: str = "NONE"
    statistical_mean_k: int = 30
    statistical_stddev: float = 1.2
    radius_radius: float = 0.5
    radius_min_neighbors: int = 5
    use_angle_calibration: bool = False
    angle_base: float = 0.11  # degrees, vertical-angle calibration rotation
    # run-sum implementation for the voxel centroid: "scatter" (segment_sum)
    # or "scan" (segmented prefix scan, no scatter) — see ops/prefilter.py
    voxel_reduce: str = "scatter"
    # --- capacities (TPU static shapes) ---
    raw_cap: int = 131072  # max raw points per scan (KITTI HDL-64 ~130k)
    out_cap: int = 131072  # max points after filtering


@dataclasses.dataclass(frozen=True)
class NDTConfig:
    """NDT registration (reference `include/ndt_omp/ndt_omp_impl2.hpp:53-83`
    defaults; odometry overrides `scan_matching_odom_nodelet.cpp:108-119`)."""

    resolution: float = 1.0
    step_size: float = 0.1  # More-Thuente step_max
    outlier_ratio: float = 0.55
    transformation_epsilon: float = 0.01
    max_iterations: int = 64
    # DIRECT1 | DIRECT7 | DIRECT26 (KDTREE mode of the reference is subsumed
    # by DIRECT modes: odometry uses DIRECT1, loop closure DIRECT7)
    neighborhood: str = "DIRECT1"
    # pclpca weighted NDT (True) vs classical pclomp NDT (False)
    weighted: bool = True
    # Robustness retry (improvement over reference): when the align result
    # deviates from the warm-start guess by more than this translation (m),
    # re-align with `retry_neighborhood` (wider basin) and keep whichever
    # result scores higher. Warm-start rotation error in curves occasionally
    # drops DIRECT1 into a neighboring optimum; the retry rescues it at
    # negligible amortized cost. 0 disables.
    retry_deviation_thresh: float = 0.15
    retry_neighborhood: str = "DIRECT7"
    # >1 runs the Newton approach phase on every k-th point before a
    # full-resolution polish (gather cost scales with point count; the final
    # optimum is full-resolution). Measured on TPU: 2 is both faster AND
    # slightly more accurate than single-phase (the polish starts inside the
    # basin); 4 trades a hair of accuracy for ~1.3x more speed.
    coarse_subsample: int = 2
    min_points_per_voxel: int = 6
    min_covar_eigvalue_mult: float = 0.01  # eigenvalue inflation, eq 6.11
    # leaf lookup structure for the derivative pass: "lut" = dense voxel->leaf
    # LUT + packed row (2 serial gathers/offset); "hash" = open-addressed
    # bucket-pair table with embedded keys (1 gather/offset; ~0.2% of leaves
    # may drop on bucket overflow). The gather chain is the measured
    # per-iteration floor on v5e, so "hash" halves the hot-pass latency.
    table: str = "hash"
    hash_buckets_per_leaf: int = 4
    # --- capacities ---
    leaf_cap: int = 32768  # max occupied voxels per map
    # dense LUT extent in cells per axis (origin at the data min corner); the
    # LUT is lut_extent^3 int32. At resolution 1.0 m, 256 cells = a 256 m span.
    lut_extent: int = 256


@dataclasses.dataclass(frozen=True)
class OdometryConfig:
    """Scan-to-keyframe DLO frontend (`scan_matching_odom_nodelet.cpp:65-138`,
    `launch/dlo_lfa_ggo_kitti.launch:49-53`)."""

    keyframe_delta_trans: float = 10.0
    keyframe_delta_angle: float = 0.17
    keyframe_delta_time: float = 1.0
    initial_guess_x: float = 1.5  # first-scan guess (scan_matching_odom:199-200)
    # TPU static-shape budget: scan matching runs on an evenly-strided
    # subsample of the filtered cloud when it exceeds this lane count (NDT
    # gather cost scales with the PADDED capacity; 1-m voxel statistics
    # saturate well below 65k samples). 0 disables. The backend still
    # receives the full filtered cloud.
    scan_matching_cap: int = 65536
    # "gather": exactly min(count, cap) survivors via a strided index gather
    # (unbiased, pays one cap-sized gather). "stride": a pure strided SLICE
    # keeping every (cap/scan_matching_cap)-th lane — zero gathers, but keeps
    # only count/stride points when the cloud underfills its capacity.
    # Round-4 on-chip A/B at the full 170-scan workload: stride 21.0 scans/s
    # vs gather 18.58, accuracy equal (devkit 0.00049 both) — stride ships.
    subsample_method: str = "stride"
    ndt: NDTConfig = dataclasses.field(default_factory=NDTConfig)


@dataclasses.dataclass(frozen=True)
class LfaConfig:
    """LOAM-style feature odometry+mapping stage (reference launches the
    external A-LOAM package; params `launch/dlo_lfa_ggo_kitti.launch:56-61`)."""

    scan_line: int = 64
    minimum_range: float = 5.0
    mapping_line_resolution: float = 0.4
    mapping_plane_resolution: float = 0.8
    # A-LOAM's skipFrameNum: the mapping stage sees only every N-th frame
    # (its main loop additionally drops queued frames when it falls behind);
    # in-between poses are the odometry composed onto the last map
    # correction (aft_mapped_to_init_high_frec). In the fused dlo_lfa
    # coupling a skipped scan costs ~nothing (feature extraction + GN +
    # insert all sit in the unexecuted cond branch) — the measured LFA cost
    # divides by ~N.
    mapping_skip_frame: int = 1
    # vertical field of view of the scanner (ring index recovery): HDL-64
    # spans +2..-24.8 deg; 16-line sensors (VLP-16 in the kylin/grodog rigs)
    # span +-15 deg
    min_elev_deg: float = -24.8
    max_elev_deg: float = 2.0
    # feature picks per ring sector (A-LOAM uses 2 sharp + 4 less-sharp per
    # sector, 6 sectors; 4 flat + downsampled less-flat)
    n_sectors: int = 6
    sharp_per_sector: int = 2
    less_sharp_per_sector: int = 20
    flat_per_sector: int = 4
    # correspondence schedule (A-LOAM re-associates twice per solve; with the
    # dlo warm start one round measures within noise of two on the synthetic
    # devkit gate — 0.0018 vs 0.0020 rel-t, bar 0.0094 — at roughly half the
    # mapping cost, so one round is the default; standalone feature odometry
    # keeps two)
    odom_corr_rounds: int = 2
    mapping_corr_rounds: int = 1
    # bucket-table k-NN: stored slots per hash cell, fit neighborhood size,
    # and hash-table density (buckets ~ density * capacity). The table
    # memset+scatter AND its gather working set scale with buckets*slots —
    # measured on v5e, density 0.5 + 6 slots halves the whole LFA step
    # (8.97 -> 4.34 ms) with no devkit accuracy change; collisions only cost
    # recall on the few % of cells sharing a bucket (occupied cells run
    # ~capacity/5, so load stays ~0.4)
    knn_slots: int = 6
    knn_k: int = 5
    knn_table_density: float = 0.5
    # world feature maps are cropped to this radius around the pose: the
    # sensor sees <= ~120 m and the correspondence gate is 1 m, so features
    # beyond 150 m can never match (A-LOAM's 21x21x11 50-m-cube grid covers
    # +-500 m but only the in-view cubes are ever queried)
    crop_radius: float = 150.0
    # crop only after the pose has moved this far since the last crop
    # (A-LOAM likewise re-centers its cube grid only when the pose nears a
    # boundary, laserMapping.cpp — not every frame). The crop pass is a full
    # table sweep (~3 ms/scan on v5e for both maps); queries probe only the
    # 8 cells around each feature point, so points lingering briefly past
    # the radius are query-invisible — the interval's only effect is that
    # the table may transiently hold points out to crop_radius +
    # crop_interval. 0 restores crop-every-scan.
    crop_interval: float = 10.0
    # --- capacities ---
    edge_cap: int = 4096
    planar_cap: int = 8192
    # world map capacities: within the 150 m crop, edge features live on
    # ~1D structures at mapping_line_resolution spacing and surf features on
    # ~2D surfaces at mapping_plane_resolution — 32k/64k covers a dense urban
    # 150-m disc (all map structures scale their sort/scatter cost with these
    # caps, so they are sized to the regime, not to "as big as fits")
    map_edge_cap: int = 32768
    map_planar_cap: int = 65536
    odom_max_iterations: int = 8
    mapping_max_iterations: int = 8


@dataclasses.dataclass(frozen=True)
class LoopDetectorConfig:
    """Loop detection gates + verification (`include/global_graph/loop_detector.hpp:51-71`,
    `launch/dlo_lfa_ggo_kitti.launch:104-113`)."""

    distance_thresh: float = 20.0
    accum_distance_thresh: float = 100.0
    min_edge_interval: float = 50.0
    fitness_score_thresh: float = 2.0
    bow_score_thresh: float = 0.04
    # registration used for geometric verification
    registration_method: str = "NDT_OMP"
    ndt_resolution: float = 1.0
    ndt_neighborhood: str = "DIRECT7"
    # Coarse-to-fine refinement ladder run before `ndt_resolution`. The
    # reference verifies with a single res-1.0 NDT whose convergence basin is
    # under a meter; drifted loop guesses routinely exceed that. Each coarser
    # stage widens the basin proportionally (improvement over reference).
    multiscale: Tuple[float, ...] = (4.0, 2.0)
    # Newton-iteration caps per ladder rung. The epsilon test ends the
    # while_loop early on convergence, but under vmap the candidate batch
    # runs to the WORST lane — and wrong-place candidates (the gates'
    # rejects) often never converge, so the cap IS the cost of a rung.
    # Coarse rungs only need to pull a drifted guess into the next basin
    # (in-sequence NDT converges in ~2.4 Newton iters; a loop seed is a
    # few meters off, each rung halves it); the final rung polishes from
    # an already-close seed. 8/8/16 keeps every accepted loop in the
    # full-density CPU validations (circle + double_circle, t_err
    # unchanged) at ~1/4 the worst-lane device cost of the old 64/64/64.
    multiscale_max_iterations: int = 8
    verify_max_iterations: int = 16
    # Source-cloud point budget for the COARSE rungs only: the NDT
    # derivative pass is gather-bound (cost ~ linear in point count), and
    # pulling a drifted guess into the next rung's basin doesn't need the
    # full 131k-point keyframe cloud — lanes are stride-sliced down to at
    # most this many. The final rung (and the fitness pass) always runs at
    # full density — the loop edge's accuracy comes from there. 0 disables.
    verify_coarse_points: int = 32768
    # Reject verified loops whose pose deviates from the graph-estimate guess
    # by more than this (m / rad): in self-similar scenes a wrong alignment
    # can score as well as the true one, but genuine loop corrections are
    # bounded by accumulated drift (improvement over reference).
    max_guess_correction_trans: float = 5.0
    max_guess_correction_rot: float = 0.5
    candidates_cap: int = 8  # top-k BoW candidates verified per new keyframe
    descriptor_cap: int = 512  # ORB descriptors kept per keyframe
    # BoW by default: when no pretrained vocabulary is supplied, train one on
    # the mapped sequence's own keyframes once this many carry descriptors
    # (the reference loads a pretrained DBoW3 asset, `loop_detector.hpp:51-71`)
    auto_train_vocab: bool = True
    vocab_min_keyframes: int = 10
    vocab_words: int = 512


@dataclasses.dataclass(frozen=True)
class GraphConfig:
    """Pose-graph backend (`global_graph_nodelet.cpp:72-146`,
    `launch/dlo_lfa_ggo_kitti.launch:95-146`)."""

    solver_num_iterations: int = 1024
    keyframe_delta_trans: float = 10.0
    keyframe_delta_angle: float = 0.17
    max_keyframes_per_update: int = 20
    graph_update_interval: float = 10.0
    map_cloud_resolution: float = 0.5
    # information matrix (information_matrix_calculator.cpp:9-21)
    use_const_inf_matrix: bool = True
    const_stddev_x: float = 0.5
    const_stddev_q: float = 0.1
    var_gain_a: float = 20.0
    min_stddev_x: float = 0.1
    max_stddev_x: float = 5.0
    min_stddev_q: float = 0.05
    max_stddev_q: float = 0.2
    fitness_score_max_range: float = float("inf")
    # robust kernels
    odometry_edge_robust_kernel: str = "Huber"
    odometry_edge_robust_kernel_size: float = 1.0
    loop_closure_edge_robust_kernel: str = "Huber"
    loop_closure_edge_robust_kernel_size: float = 1.0
    floor_edge_robust_kernel: str = "NONE"
    floor_edge_robust_kernel_size: float = 1.0
    # anchor the first keyframe to the origin through a fixed helper node
    # (`global_graph_nodelet.cpp:279-287`, param fix_first_node, default off)
    fix_first_node: bool = False
    # GPS / IMU / floor priors (disabled in the KITTI flagship run)
    enable_gps: bool = False
    enable_imu_acceleration: bool = False
    enable_imu_orientation: bool = False
    gps_edge_stddev_xy: float = 20.0
    gps_edge_stddev_z: float = 5.0
    imu_orientation_edge_stddev: float = 1.0
    imu_acceleration_edge_stddev: float = 1.0
    floor_edge_stddev: float = 100.0
    # --- capacities ---
    keyframe_cap: int = 1024
    edge_cap: int = 4096
    prior_cap: int = 256
    plane_cap: int = 8
    sp_edge_cap: int = 64   # SE3<->plane edges (floor constraints)
    plane_edge_cap: int = 16


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    """Top-level pipeline: dlo -> lfa -> ggo (the `dlo_lfa_ggo_kitti` stack)."""

    prefilter: PrefilterConfig = dataclasses.field(default_factory=PrefilterConfig)
    odometry: OdometryConfig = dataclasses.field(default_factory=OdometryConfig)
    lfa: Optional[LfaConfig] = dataclasses.field(default_factory=LfaConfig)
    loop: LoopDetectorConfig = dataclasses.field(default_factory=LoopDetectorConfig)
    graph: GraphConfig = dataclasses.field(default_factory=GraphConfig)
    # camera->lidar calibration 3x4 row-major "Tr" (KITTI calib.txt); identity
    # when absent. Odometry output files are written in the camera frame via
    # Tr * T * Tr^-1 (scan_matching_odom_nodelet.cpp:156-160).
    calib_tr: Optional[Tuple[float, ...]] = None


def kitti_flagship_config() -> PipelineConfig:
    """The `dlo_lfa_ggo_kitti.launch` configuration."""
    return PipelineConfig()


def _sixteen_ring_lfa(**overrides) -> LfaConfig:
    base = dict(
        scan_line=16, minimum_range=0.3,
        mapping_line_resolution=0.2, mapping_plane_resolution=0.4,
        min_elev_deg=-15.0, max_elev_deg=15.0,
    )
    base.update(overrides)
    return LfaConfig(**base)


def kylin_config() -> PipelineConfig:
    """`dlo_lfa_ggo_kylin.launch`: 16-line lidar, indoor-scale gates
    (keyframes 2 m, loop gates 5/25/15 m — launch :104-106)."""
    return PipelineConfig(
        odometry=OdometryConfig(keyframe_delta_trans=2.0),
        lfa=_sixteen_ring_lfa(),
        loop=LoopDetectorConfig(
            distance_thresh=5.0, accum_distance_thresh=25.0, min_edge_interval=15.0
        ),
        graph=GraphConfig(keyframe_delta_trans=2.0),
    )


def ob_config() -> PipelineConfig:
    """`dlo_lfa_ggo_ob.launch`: identical parameterization to kylin (only
    ROS topic remaps differ)."""
    return kylin_config()


def grodog_config() -> PipelineConfig:
    """`dlo_lfa_ggo_grodog.launch`: 16-line quadruped rig — 0.2 m near
    clip, no voxel downsample, looser angle/time keyframe gates, tight loop
    gates 5/10/7 m."""
    return PipelineConfig(
        prefilter=PrefilterConfig(distance_near_thresh=0.2, downsample_method="NONE"),
        odometry=OdometryConfig(
            keyframe_delta_trans=2.0, keyframe_delta_angle=0.34, keyframe_delta_time=2.0
        ),
        lfa=_sixteen_ring_lfa(),
        loop=LoopDetectorConfig(
            distance_thresh=5.0, accum_distance_thresh=10.0, min_edge_interval=7.0
        ),
        graph=GraphConfig(keyframe_delta_trans=2.0, keyframe_delta_angle=0.34),
    )


def panda_config() -> PipelineConfig:
    """`dlo_lfa_panda.launch`: 64-line Pandar rig; dlo+lfa parameters match
    the KITTI flagship (no ggo stage in its launch — loop defaults kept)."""
    return PipelineConfig()


DATASET_CONFIGS = {
    "kitti": kitti_flagship_config,
    "kylin": kylin_config,
    "ob": ob_config,
    "grodog": grodog_config,
    "panda": panda_config,
}
