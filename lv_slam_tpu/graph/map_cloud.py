"""Global map cloud generation.

Rebuild of `MapCloudGenerator` (`src/global_graph/map_cloud_generator.cpp:
16-55`): concatenate every keyframe cloud transformed by its optimized pose,
then deduplicate by occupied-voxel centers at `resolution` (the reference
uses a PCL octree and keeps one representative point per occupied voxel; we
keep the per-voxel centroid via the same sort+segment machinery as the NDT
map build — a strictly better representative with identical density).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from lv_slam_tpu.core.cloud import PointCloud
from lv_slam_tpu.ops.prefilter import voxel_downsample


def generate_map_cloud(
    keyframe_clouds: Sequence[PointCloud],
    poses: Sequence[np.ndarray],
    resolution: float = 0.5,
    out_cap: int = 1 << 20,
) -> np.ndarray:
    """Host-orchestrated map build: per-keyframe transform on device, one
    final voxel dedup. Returns an (M,4) numpy array [x y z intensity]."""
    if len(keyframe_clouds) == 0:
        return np.zeros((0, 4), np.float32)
    parts = []
    transform_fn = jax.jit(lambda c, t: c.transformed(t))
    for cloud, pose in zip(keyframe_clouds, poses):
        moved = transform_fn(cloud, jnp.asarray(pose, jnp.float32))
        parts.append(moved.to_numpy())
    merged = np.concatenate(parts, axis=0)
    if merged.shape[0] == 0:
        return merged
    cap = 1
    while cap < merged.shape[0]:
        cap *= 2
    cloud = PointCloud.from_numpy(merged, cap=cap)
    deduped = _dedup(cloud, float(resolution), min(out_cap, cap))
    return deduped.to_numpy()


@jax.jit
def _transform_cloud(cloud: PointCloud, pose: jax.Array) -> PointCloud:
    return cloud.transformed(pose)


def _dedup(cloud: PointCloud, resolution: float, out_cap: int) -> PointCloud:
    fn = jax.jit(
        lambda c: voxel_downsample(c, resolution, out_cap), donate_argnums=0
    )
    return fn(cloud)
