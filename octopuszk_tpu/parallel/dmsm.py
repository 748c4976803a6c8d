"""Distributed MSM over a device mesh.

Reference parity: VariableBaseMSM.distributedMSM (VariableBaseMSM.java:
772-787) = mapPartitions(per-partition Pippenger on GPU) + reduce(add);
FixedBaseMSM.distributedBatchMSM (FixedBaseMSM.java:446-472) = broadcast
base + mapPartitionsToPair.  TPU-native: shard_map over a 1-D mesh —
per-chip Pippenger, then an all_gather of the (tiny) per-chip partial
points and a local tree reduction; fixed-base is embarrassingly parallel
with the window table replicated (XLA broadcasts it once over ICI).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from octopuszk_tpu.curves import group_ops as jac
from octopuszk_tpu.ops import msm
from octopuszk_tpu.parallel.mesh import AXIS


def distributed_pippenger(mesh, group, points, scalars_raw,
                          c: int | None = None, lanes: int | None = None):
    """Sum_i [s_i] P_i with (points, scalars) sharded on the batch axis.

    Returns a replicated single point.
    """
    n = scalars_raw.shape[-1]
    d = mesh.devices.size
    local_n = n // d
    if c is None:
        c = msm._choose_c(max(2, local_n))
    if lanes is None:
        lanes = msm._choose_lanes(local_n)

    point_spec = jax.tree_util.tree_map(lambda _: P(None, AXIS), points)

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(point_spec, P(None, AXIS)),
        out_specs=jax.tree_util.tree_map(lambda _: P(), points),
        check_vma=False)  # result is replicated by the all_gather+reduce
    def _local(pts, scal):
        part = msm.pippenger_msm(group, pts, scal, c, lanes)
        # [D] partial points on every chip, then local log-tree reduce
        gathered = jax.tree_util.tree_map(
            lambda x: jax.lax.all_gather(x, AXIS, axis=x.ndim), part)
        m = 1 << max(0, (d - 1).bit_length())
        gathered, _ = msm._pad_pow2_to(group, gathered, m)
        return jac.tree_reduce(group.ops, gathered, m)

    return _local(points, scalars_raw)


def distributed_fixed_base_msm(mesh, group, base_point, scalars_raw,
                               w: int = 8):
    """[s_i] G for sharded scalars; output point batch stays sharded."""
    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(jax.tree_util.tree_map(lambda _: P(), base_point),
                  P(None, AXIS)),
        out_specs=jax.tree_util.tree_map(lambda _: P(None, AXIS), base_point))
    def _local(base, scal):
        return msm.fixed_base_msm(group, base, scal, w)

    return _local(base_point, scalars_raw)
