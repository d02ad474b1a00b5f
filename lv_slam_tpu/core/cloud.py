"""Fixed-capacity point cloud container.

The reference shuttles `pcl::PointCloud<pcl::PointXYZI>` between stages
(dynamic length). On TPU every shape is static: a cloud is a `(cap, 3)` float32
position array, a `(cap,)` float32 intensity array, and a `(cap,)` bool mask.
Invalid lanes carry a far-away sentinel position so that voxel hashing and
reductions need no special-casing beyond the mask.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.tree_util import register_pytree_node_class

# Sentinel position for invalid lanes: far outside every LUT/grid extent.
SENTINEL = 1.0e6


@register_pytree_node_class
class PointCloud:
    """Padded point cloud: positions `(cap,3)`, intensity `(cap,)`, mask `(cap,)`."""

    def __init__(self, xyz: jax.Array, intensity: jax.Array, mask: jax.Array):
        self.xyz = xyz
        self.intensity = intensity
        self.mask = mask

    # -- pytree protocol ----------------------------------------------------
    def tree_flatten(self):
        return (self.xyz, self.intensity, self.mask), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    # -- construction -------------------------------------------------------
    @classmethod
    def from_numpy(cls, points, cap: int, intensity=None) -> "PointCloud":
        """Build from a host `(n, 3)` or `(n, 4)` array, padding/truncating to cap."""
        import numpy as np

        points = np.asarray(points, dtype=np.float32)
        if points.ndim != 2:
            raise ValueError(f"points must be (n,3|4), got {points.shape}")
        if points.shape[1] >= 4 and intensity is None:
            intensity = points[:, 3]
        xyz_np = points[:, :3]
        n = min(xyz_np.shape[0], cap)
        xyz = np.full((cap, 3), SENTINEL, dtype=np.float32)
        inten = np.zeros((cap,), dtype=np.float32)
        mask = np.zeros((cap,), dtype=bool)
        xyz[:n] = xyz_np[:n]
        if intensity is not None:
            inten[:n] = np.asarray(intensity, dtype=np.float32)[:n]
        mask[:n] = np.isfinite(xyz_np[:n]).all(axis=1)
        xyz[:n][~mask[:n]] = SENTINEL
        return cls(jnp.asarray(xyz), jnp.asarray(inten), jnp.asarray(mask))

    # -- info ---------------------------------------------------------------
    @property
    def cap(self) -> int:
        return self.xyz.shape[0]

    def count(self) -> jax.Array:
        return jnp.sum(self.mask.astype(jnp.int32))

    # -- ops ----------------------------------------------------------------
    def transformed(self, transform: jax.Array) -> "PointCloud":
        from lv_slam_tpu.core import se3

        xyz = se3.transform_points(transform, self.xyz)
        xyz = jnp.where(self.mask[:, None], xyz, SENTINEL)
        return PointCloud(xyz, self.intensity, self.mask)

    def masked_xyz(self) -> jax.Array:
        """Positions with invalid lanes pinned to the sentinel."""
        return jnp.where(self.mask[:, None], self.xyz, SENTINEL)

    def compact(self, out_cap: Optional[int] = None) -> "PointCloud":
        """Stable-move valid lanes to the front (device-side), resize to out_cap.

        Gather cost scales with index count, so only the first `out_cap`
        sorted positions are gathered, and all columns ride one packed row.
        """
        out_cap = out_cap or self.cap
        idx = jnp.argsort(~self.mask, stable=True)[:out_cap]
        packed = jnp.concatenate(
            [self.xyz, self.intensity[:, None], self.mask[:, None].astype(jnp.float32)],
            axis=1,
        )[idx]
        mask = packed[:, 4] > 0.5
        xyz = jnp.where(mask[:, None], packed[:, 0:3], SENTINEL)
        return PointCloud(xyz, packed[:, 3], mask)

    def to_numpy(self):
        """Host `(n,4)` array of the valid points."""
        import numpy as np

        xyz = np.asarray(self.xyz)
        inten = np.asarray(self.intensity)
        mask = np.asarray(self.mask)
        return np.concatenate([xyz[mask], inten[mask, None]], axis=1)
