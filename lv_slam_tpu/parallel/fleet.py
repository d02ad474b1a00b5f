"""Fleet-scale data parallelism: many sequences, one SPMD program.

The reference processes one rosbag per process (`scripts/lidar_odom_kitti.sh`
loops sequences serially). On a TPU pod slice the natural production shape is
the opposite: S independent sequences sharded over the mesh's "batch" axis,
each chip running the full device-resident odometry (and optionally LFA)
lax.scan on its shard — zero steady-state collectives.

Partitioning is `shard_map` over the mesh "batch" axis: every shard runs
the UNMODIFIED per-sequence program (`odometry/fused.make_fused_step`), so
the keyframe-rebuild / retry / double-align `lax.cond`s stay true per-lane
branches. Lanes beyond the device count unroll serially within their shard
— measured on v5e, one pipeline already saturates the chip's gather engine
(vmap lane-batching scaled SUPER-linearly: 1/2/4 lanes = 0.39/1.32/5.50 s
for the same per-lane work, 3.5x worse than serial), so per-chip
multiplexing buys nothing and chips are the scaling axis. Per-lane
throughput/overhead is measured by bench.py's `fleet_*` extras.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lv_slam_tpu.config import LfaConfig, OdometryConfig
from lv_slam_tpu.core.cloud import PointCloud


@functools.lru_cache(maxsize=8)
def _fleet_fn(
    mesh: Mesh,
    cfg: OdometryConfig,
    lfa_cfg: LfaConfig | None,
    prefilter_cfg=None,
):
    from lv_slam_tpu.lfa.fused import make_lfa_fused
    from lv_slam_tpu.odometry.fused import make_fused_step

    init_state, step = make_fused_step(cfg, prefilter_cfg)
    lfa = make_lfa_fused(lfa_cfg, external_odom=True) if lfa_cfg is not None else None

    def one_sequence(sx, sm, st):
        zeros = jnp.zeros((sx.shape[1],), jnp.float32)
        state0 = init_state(PointCloud(sx[0], zeros, sm[0]), st[0])

        def body(state, inputs):
            x, m, t = inputs
            new_state, (pose, _, _) = step(state, PointCloud(x, zeros, m), t)
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

    def shard_body(x, m, t):
        # local shard (S_local, N, cap, ...): one true-branch per-sequence
        # program per local lane, unrolled (S_local is usually 1 — chips are
        # the scaling axis; see the module docstring)
        return jnp.stack([one_sequence(x[i], m[i], t[i]) for i in range(x.shape[0])])

    spec = P("batch")
    # check_vma=False: the body is collective-free (pure per-shard compute);
    # the varying-axis analysis chokes on unvarying scalars mixed into
    # while_loop carries inside the NDT solver
    return jax.jit(
        jax.shard_map(
            shard_body, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
            check_vma=False,
        )
    )


def run_fleet_odometry(
    mesh: Mesh,
    xyz: jax.Array,      # (S, N, cap, 3) S sequences of N scans
    mask: jax.Array,     # (S, N, cap)
    stamps: jax.Array,   # (S, N)
    cfg: OdometryConfig,
    lfa_cfg: LfaConfig | None = None,
    prefilter_cfg=None,
) -> jax.Array:
    """-> (S, N, 4, 4) poses; sequences sharded over the mesh "batch" axis.

    Each shard runs the fused scan-in/pose-out odometry program (and the
    fused LFA refinement when `lfa_cfg` is given) over its local sequences,
    serially within the shard — every conditional stays a true branch (see
    the module docstring for why this beats vmap lane-batching on a chip).
    """
    return _fleet_fn(mesh, cfg, lfa_cfg, prefilter_cfg)(xyz, mask, stamps)


def shard_sequences(mesh: Mesh, tree):
    """Place (S, ...) arrays sharded over the mesh "batch" axis."""
    sharding = NamedSharding(mesh, P("batch"))
    return jax.device_put(tree, sharding)
