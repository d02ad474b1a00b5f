"""Fleet-scale data parallelism: many sequences, one SPMD program.

The reference processes one rosbag per process (`scripts/lidar_odom_kitti.sh`
loops sequences serially). On a TPU pod slice the natural production shape is
the opposite: S independent sequences sharded over the mesh's "batch" axis,
each chip running the full device-resident odometry (and optionally LFA)
lax.scan on its shard. The only steady-state communication is a per-scan
scalar reduction of the any-lane branch predicates (see
`odometry/fused.make_fleet_step`) — everything heavy stays shard-local.

Partitioning is GSPMD-style: the batched step's lane axis is annotated with
a `NamedSharding`; XLA partitions the program across the mesh. This
composes with the point-sharded registration in `parallel/mesh.py` on a 2D
(batch, point) mesh. Per-lane throughput is measured by bench.py's
`fleet_*` extras on the real chip.
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
    from lv_slam_tpu.odometry.fused import make_fleet_step

    # the odometry runs as ONE time-major batched scan over all lanes: the
    # keyframe-rebuild / retry / double-align conditionals stay REAL branches
    # (any-lane predicates + per-lane acceptance) instead of lowering to
    # per-lane select under vmap, where every lane would pay every branch
    # every scan (a full map rebuild per lane per scan)
    init_states, step = make_fleet_step(cfg, prefilter_cfg)
    lfa = make_lfa_fused(lfa_cfg, external_odom=True) if lfa_cfg is not None else None

    def odometry_all(x, m, t):
        # (S, N, ...) -> time-major (N, S, ...)
        xt = jnp.swapaxes(x, 0, 1)
        mt = jnp.swapaxes(m, 0, 1)
        tt = jnp.swapaxes(t, 0, 1)
        s, cap = x.shape[0], x.shape[2]
        zeros = jnp.zeros((s, cap), jnp.float32)
        states = init_states(PointCloud(xt[0], zeros, mt[0]), tt[0])

        def body(states, inputs):
            xs, ms, ts = inputs
            new_states, (poses, _, _) = step(states, PointCloud(xs, zeros, ms), ts)
            return new_states, poses

        _, poses = jax.lax.scan(body, states, (xt[1:], mt[1:], tt[1:]))
        eye = jnp.tile(jnp.eye(4, dtype=jnp.float32), (1, s, 1, 1))
        return jnp.swapaxes(jnp.concatenate([eye, poses], axis=0), 0, 1)  # (S,N,4,4)

    def one_sequence_lfa(sx, sm, poses):
        lfa_init, lfa_step = lfa
        lstate = lfa_init(sx[0], sm[0], poses[0])

        def lfa_body(state, inputs):
            x, m, o = inputs
            st_, refined = lfa_step(state, x, m, o)
            return st_, refined

        _, refined = jax.lax.scan(lfa_body, lstate, (sx[1:], sm[1:], poses[1:]))
        return jnp.concatenate([poses[:1], refined], axis=0)

    def run(x, m, t):
        poses = odometry_all(x, m, t)
        if lfa is None:
            return poses
        return jax.vmap(one_sequence_lfa)(x, m, poses)

    sharding = NamedSharding(mesh, P("batch"))
    return jax.jit(
        run,
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
    prefilter_cfg=None,
) -> jax.Array:
    """-> (S, N, 4, 4) poses; sequences sharded over the mesh "batch" axis.

    Each shard runs the fused scan-in/pose-out odometry program (and the
    fused LFA refinement when `lfa_cfg` is given) over its local sequences.
    The while-loops inside NDT run lockstep under vmap — the lanes that
    converge early ride along, which is the OpenMP guided-schedule trade
    re-expressed in SPMD form.
    """
    return _fleet_fn(mesh, cfg, lfa_cfg, prefilter_cfg)(xyz, mask, stamps)


def shard_sequences(mesh: Mesh, tree):
    """Place (S, ...) arrays sharded over the mesh "batch" axis."""
    sharding = NamedSharding(mesh, P("batch"))
    return jax.device_put(tree, sharding)
