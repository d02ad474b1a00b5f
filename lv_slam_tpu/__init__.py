"""lv_slam_tpu — a TPU-native LiDAR(+camera) SLAM framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of BurryChen/lv_slam
(ROS1/C++/PCL/g2o), re-designed TPU-first:

- Point clouds are fixed-capacity padded arrays with validity masks.
- The NDT voxel-Gaussian map is a flat leaf table plus a dense int32 voxel->leaf
  LUT (replacing ``std::map`` + FLANN kd-tree; reference
  ``include/ndt_omp/voxel_grid_covariance_omp.h``).
- NDT registration (classical ``pclomp`` and PCA-weighted ``pclpca``; reference
  ``include/ndt_omp/ndt_omp_impl2.hpp``, ``include/ndt_pca/ndt_pca_impl2.hpp``)
  is a fused batched derivative pass + Newton loop under ``lax.while_loop``.
- LOAM-style feature odometry/mapping ("lfa", reference launches the external
  A-LOAM package) is batched Gauss-Newton in XLA.
- The g2o pose graph backend (reference ``src/global_graph/``) is batched
  Levenberg-Marquardt over typed factors with dense Cholesky on the MXU.
- Visual loop detection replaces DBoW3 bag-of-words with an MXU descriptor
  cross-matching kernel plus an optional trainable k-means vocabulary.

Single-process: the ROS nodelet graph becomes a host driver around jitted
scan-in/pose-out device steps. Multi-chip scaling is expressed with
``jax.sharding.Mesh`` + ``shard_map`` (see ``lv_slam_tpu.parallel``).
"""

__version__ = "0.1.0"

from lv_slam_tpu.config import (  # noqa: F401
    PrefilterConfig,
    NDTConfig,
    OdometryConfig,
    LoopDetectorConfig,
    GraphConfig,
    LfaConfig,
    PipelineConfig,
)
