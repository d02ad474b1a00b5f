"""Fleet-scale data parallelism: many sequences, one SPMD program.

The reference processes one rosbag per process (`scripts/lidar_odom_kitti.sh`
loops sequences serially). On a TPU pod slice the natural production shape is
the opposite: S independent sequences sharded over the mesh's "batch" axis,
each chip running the full device-resident odometry (and optionally LFA)
lax.scan on its shard — zero collectives in steady state, linear scaling
(measured: batching sequences per chip is perfectly linear in cost; the
gather engine is already saturated, so cross-sequence parallelism is free
throughput on idle chips).

Partitioning is GSPMD-style: the per-sequence programs are `vmap`ped and the
batch axis annotated with a `NamedSharding`; XLA partitions the vmapped
program across the mesh (no collectives cross the batch axis, so the
partition is exact). This composes with the point-sharded registration in
`parallel/mesh.py` on a 2D (batch, point) mesh.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lv_slam_tpu.config import LfaConfig, OdometryConfig
from lv_slam_tpu.core.cloud import PointCloud


@functools.lru_cache(maxsize=8)
def _fleet_fn(mesh: Mesh, cfg: OdometryConfig, lfa_cfg: LfaConfig | None):
    from lv_slam_tpu.lfa.fused import make_lfa_fused
    from lv_slam_tpu.odometry.fused import make_fused_step

    init_state, step = make_fused_step(cfg, None)
    lfa = make_lfa_fused(lfa_cfg, external_odom=True) if lfa_cfg is not None else None

    def one_sequence(sx, sm, st):
        state0 = init_state(PointCloud(sx[0], jnp.zeros(sx.shape[1]), sm[0]), st[0])

        def body(state, inputs):
            x, m, t = inputs
            new_state, (pose, _, _) = step(state, PointCloud(x, jnp.zeros(x.shape[0]), m), t)
            return new_state, pose

        _, poses = jax.lax.scan(body, state0, (sx[1:], sm[1:], st[1:]))
        poses = jnp.concatenate([jnp.eye(4, dtype=jnp.float32)[None], poses], axis=0)
        if lfa is None:
            return poses
        lfa_init, lfa_step = lfa
        lstate = lfa_init(sx[0], sm[0], poses[0])

        def lfa_body(state, inputs):
            x, m, o = inputs
            st_, refined = lfa_step(state, x, m, o)
            return st_, refined

        _, refined = jax.lax.scan(lfa_body, lstate, (sx[1:], sm[1:], poses[1:]))
        return jnp.concatenate([poses[:1], refined], axis=0)

    sharding = NamedSharding(mesh, P("batch"))
    return jax.jit(
        lambda x, m, t: jax.vmap(one_sequence)(x, m, t),
        in_shardings=(sharding, sharding, sharding),
        out_shardings=sharding,
    )


def run_fleet_odometry(
    mesh: Mesh,
    xyz: jax.Array,      # (S, N, cap, 3) S sequences of N scans
    mask: jax.Array,     # (S, N, cap)
    stamps: jax.Array,   # (S, N)
    cfg: OdometryConfig,
    lfa_cfg: LfaConfig | None = None,
) -> jax.Array:
    """-> (S, N, 4, 4) poses; sequences sharded over the mesh "batch" axis.

    Each shard runs the fused scan-in/pose-out odometry program (and the
    fused LFA refinement when `lfa_cfg` is given) over its local sequences.
    The while-loops inside NDT run lockstep under vmap — the lanes that
    converge early ride along, which is the OpenMP guided-schedule trade
    re-expressed in SPMD form.
    """
    return _fleet_fn(mesh, cfg, lfa_cfg)(xyz, mask, stamps)


def shard_sequences(mesh: Mesh, tree):
    """Place (S, ...) arrays sharded over the mesh "batch" axis."""
    sharding = NamedSharding(mesh, P("batch"))
    return jax.device_put(tree, sharding)
