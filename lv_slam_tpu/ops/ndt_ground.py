"""Ground-constrained NDT (the reference's `pclomp_ground` elevation refiner).

`NormalDistributionsTransformGround` (`include/ndt_omp/ndt_ground.h`,
`ndt_ground_impl.hpp:94-246,508-567`) registers only ground-plane voxels
(voxel normal within 10 degrees of +z) and solves only the (z, roll, pitch)
sub-problem by zeroing the complementary gradient/Hessian blocks. It is
instantiated by the odometry nodelet at resolution 10.0
(`scan_matching_odom_nodelet.cpp:121-126`) as an elevation-refinement
experiment (not in the active matching path).

Rebuild: filter the voxel map's LUT to ground leaves, then run the standard
fused NDT with a (tz, roll, pitch) DOF mask.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from lv_slam_tpu.core.cloud import PointCloud
from lv_slam_tpu.ops.ndt import NDTResult, ndt_align
from lv_slam_tpu.ops.voxel_map import VoxelMap

# free (tz, roll, pitch); frozen (tx, ty, yaw) — flag-1 semantics
# (`ndt_ground_impl.hpp:554-561`)
GROUND_DOF = (False, False, True, True, True, False)


def filter_ground_leaves(vmap_: VoxelMap, max_angle_deg: float = 10.0) -> VoxelMap:
    """Keep only leaves whose surface normal is within `max_angle_deg` of +z
    (`ndt_ground_impl.hpp:527-546` classifies by voxel-normal angle)."""
    cos_thresh = jnp.cos(jnp.deg2rad(jnp.float32(max_angle_deg)))
    ground = vmap_.valid & (jnp.abs(vmap_.normals[:, 2]) >= cos_thresh)
    # rewrite LUT entries pointing at non-ground leaves to -1
    leaf = jnp.maximum(vmap_.lut, 0)
    keep = (vmap_.lut >= 0) & ground[leaf]
    lut = jnp.where(keep, vmap_.lut, -1)
    return vmap_._replace(valid=ground, lut=lut)


def ndt_ground_align(
    vmap_: VoxelMap,
    source: PointCloud,
    guess: jax.Array,
    *,
    resolution: float = 10.0,
    transformation_epsilon: float = 0.01,
    max_iterations: int = 64,
    max_ground_angle_deg: float = 10.0,
) -> NDTResult:
    ground_map = filter_ground_leaves(vmap_, max_ground_angle_deg)
    return ndt_align(
        ground_map,
        source,
        guess,
        resolution=resolution,
        transformation_epsilon=transformation_epsilon,
        max_iterations=max_iterations,
        neighborhood="DIRECT1",
        weighted=False,
        dof_mask=GROUND_DOF,
    )
