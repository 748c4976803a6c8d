"""Distributed MSM over a device mesh.

Reference parity: VariableBaseMSM.distributedMSM (VariableBaseMSM.java:
772-787) = mapPartitions(per-partition Pippenger on GPU) + reduce(add);
FixedBaseMSM.distributedBatchMSM (FixedBaseMSM.java:446-472) = broadcast
base + mapPartitionsToPair.  TPU-native: shard_map over a 1-D mesh —
per-chip Pippenger, then an all_gather of the (tiny) per-chip partial
points and a local tree reduction; fixed-base is embarrassingly parallel
with the window table replicated (XLA broadcasts it once over ICI).

All entry points are memoized ``jax.jit(shard_map(...))`` executables —
eager shard_map dispatch compiles each body primitive separately
(measured ~25x slower) and fresh closures defeat the jit cache.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from octopuszk_tpu.curves import group_ops as jac
from octopuszk_tpu.ops import msm
from octopuszk_tpu.parallel.mesh import AXIS


def _point_specs(group, spec):
    """Full per-coord spec pytree for a point batch of this group."""
    template = group.infinity((1,))
    return jax.tree_util.tree_map(lambda _: spec, template)


@functools.lru_cache(maxsize=None)
def _pippenger_fn(mesh, group, c: int, lanes: int):
    d = mesh.devices.size

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(_point_specs(group, P(None, AXIS)), P(None, AXIS)),
        out_specs=_point_specs(group, P()),
        check_vma=False)  # result is replicated by the all_gather+reduce
    def _local(pts, scal):
        part = msm.pippenger_msm(group, pts, scal, c, lanes)
        # [D] partial points on every chip, then local log-tree reduce
        gathered = jax.tree_util.tree_map(
            lambda x: jax.lax.all_gather(x, AXIS, axis=x.ndim), part)
        m = 1 << max(0, (d - 1).bit_length())
        gathered, _ = msm._pad_pow2_to(group, gathered, m)
        return jac.tree_reduce(group.ops, gathered, m)

    return jax.jit(_local)


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
    return _pippenger_fn(mesh, group, c, lanes)(points, scalars_raw)


@functools.lru_cache(maxsize=None)
def _packed_pippenger_fn(mesh, group, c: int, lanes: int, chunk_log: int):
    d = mesh.devices.size

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(AXIS, None), P(None, AXIS)),
        out_specs=_point_specs(group, P()),
        check_vma=False)
    def _local(packed, scal):
        part = msm.pippenger_msm_packed(group, packed, scal, c, lanes,
                                        chunk_log)
        gathered = jax.tree_util.tree_map(
            lambda x: jax.lax.all_gather(x, AXIS, axis=x.ndim), part)
        m = 1 << max(0, (d - 1).bit_length())
        gathered, _ = msm._pad_pow2_to(group, gathered, m)
        return jac.tree_reduce(group.ops, gathered, m)

    return jax.jit(_local)


def distributed_pippenger_packed(mesh, group, packed, scalars_raw,
                                 c: int | None = None,
                                 lanes: int | None = None,
                                 chunk_log: int = 22):
    """Large-path distributed MSM: the base is a packed-row tensor
    (ops/msm.py pack_affine_rows) sharded on its row axis; scalars are
    co-sharded on the batch axis.  Per-chip signed-digit Pippenger with
    fused mixed-add scans, then the same all_gather point reduction.

    Tiny inputs (<= msm.NAIVE_THRESHOLD points per chip — the single
    shared constant, read at call time so tests can patch it) run a
    naive double-and-add module instead — unless the caller pins
    ``c``/``lanes`` explicitly, which forces the Pippenger path.
    """
    d = mesh.devices.size
    ppr = msm._points_per_row(group)
    local_n = packed.shape[0] * ppr // d
    if c is None and lanes is None and local_n <= msm.NAIVE_THRESHOLD:
        return _naive_packed_fn(mesh, group)(packed, scalars_raw)
    if c is None:
        c = msm._choose_c_large(min(local_n, 1 << chunk_log))
    if lanes is None:
        num_chunks = max(1, -(-local_n // (1 << chunk_log)))
        lanes = min(1 << max(
            0, (local_n // num_chunks).bit_length() - 1), 4096)
    return _packed_pippenger_fn(mesh, group, c, lanes, chunk_log)(
        packed, scalars_raw)


@functools.lru_cache(maxsize=None)
def _naive_packed_fn(mesh, group):
    d = mesh.devices.size

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(AXIS, None), P(None, AXIS)),
        out_specs=_point_specs(group, P()),
        check_vma=False)
    def _local(packed, scal):
        pts = msm.packed_to_points(group, packed)
        part = msm.msm_naive(group, pts, scal)
        gathered = jax.tree_util.tree_map(
            lambda x: jax.lax.all_gather(x, AXIS, axis=x.ndim), part)
        m = 1 << max(0, (d - 1).bit_length())
        gathered, _ = msm._pad_pow2_to(group, gathered, m)
        return jac.tree_reduce(group.ops, gathered, m)

    return jax.jit(_local)


@functools.lru_cache(maxsize=None)
def _pack_fn(mesh, group):
    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(_point_specs(group, P(None, AXIS)),),
        out_specs=P(AXIS, None))
    def _local(pts):
        return msm.points_to_packed(group, pts)

    return jax.jit(_local)


def distributed_pack(mesh, group, points):
    """Batch-sharded Jacobian points -> row-sharded packed affine rows
    (u32[n/ppr, 128], ops/msm.py pack_affine_rows layout).  Done once at
    setup so every proof's MSMs run the large packed path; the affine
    conversion (batched inverse) is local per shard — no communication.
    """
    local_n = _batch_n_tree(points) // mesh.devices.size
    assert local_n % msm._points_per_row(group) == 0, local_n
    return _pack_fn(mesh, group)(points)


def _batch_n_tree(points):
    leaf = jax.tree_util.tree_leaves(points)[0]
    return leaf.shape[-1]


@functools.lru_cache(maxsize=None)
def _fixed_base_fn(mesh, group, w: int):
    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(_point_specs(group, P()), P(None, AXIS)),
        out_specs=_point_specs(group, P(None, AXIS)))
    def _local(base, scal):
        return msm.fixed_base_msm(group, base, scal, w)

    return jax.jit(_local)


def distributed_fixed_base_msm(mesh, group, base_point, scalars_raw,
                               w: int | None = None):
    """[s_i] G for sharded scalars; output point batch stays sharded."""
    if w is None:
        local_n = scalars_raw.shape[-1] // mesh.devices.size
        w = (msm._choose_w_packed(local_n)
             if local_n >= msm.FIXED_PACKED_MIN else msm._choose_w(local_n))
    return _fixed_base_fn(mesh, group, w)(base_point, scalars_raw)


# ---------------------------------------------------------------------------
# fused distributed double MSM (shared scalars, G1 + G2 bases)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _sort_digits_fn(mesh, num_win: int, c: int):
    """Per-shard signed-digit extraction + batched per-window sort for one
    chunk of the shared scalars — computed ONCE and fed to both groups'
    window pipelines (the work the reference fuses per partition,
    VariableBaseMSM.java:805-820 -> …cu:1712-1806)."""

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=P(None, AXIS), out_specs=(P(None, AXIS), P(None, AXIS)))
    def _local(scal):
        return msm._sorted_digits(scal, num_win, c)

    return jax.jit(_local)


@functools.lru_cache(maxsize=None)
def _windows_fn(mesh, group, c: int, lanes: int, rows: int):
    """Per-shard window pipeline from pre-sorted digits -> replicated
    [.., num_win] window point batch (all_gather + tree reduce across
    shards).  The payload indices in idx2s are LOCAL to each shard's
    chunk, matching the local packed rows."""
    d = mesh.devices.size

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(AXIS, None), P(None, AXIS), P(None, AXIS)),
        out_specs=_point_specs(group, P()),
        check_vma=False)
    def _local(packed_c, ds, ix):
        w = msm._windows_from_sorted(group, packed_c, ds, ix, c, lanes, rows)
        gathered = jax.tree_util.tree_map(
            lambda x: jax.lax.all_gather(x, AXIS, axis=x.ndim), w)
        # [.., num_win, D]: reduce the device axis with an unrolled
        # pairwise tree (tree_reduce assumes a flat [L, n] batch; here the
        # window axis rides along)
        parts = [jax.tree_util.tree_map(lambda x: x[..., i], gathered)
                 for i in range(d)]
        while len(parts) > 1:
            nxt = [jac.add(group.ops, parts[i], parts[i + 1])
                   for i in range(0, len(parts) - 1, 2)]
            if len(parts) % 2:
                nxt.append(parts[-1])
            parts = nxt
        return parts[0]

    return jax.jit(_local)


def distributed_pippenger_double_packed(mesh, g1, g2, packed1, packed2,
                                        scalars_raw, c: int | None = None,
                                        lanes: int | None = None,
                                        chunk_log: int = 22):
    """Fused distributed double MSM: one scalar vector against row-sharded
    packed G1 AND G2 bases.  The signed-digit extraction and the batched
    per-window sort run once per chunk and drive both groups' bucket
    pipelines (three separate executables — sort, G1 windows, G2 windows —
    so the XLA:CPU test path never compiles the doubled EC graph that
    crashes it, and the real mesh pipelines the async dispatches).

    Reference parity: VariableBaseMSM.distributedDoubleMSM
    (VariableBaseMSM.java:805-820) -> the fused double-MSM CUDA host
    (algebra_msm_VariableBaseMSM.cu:1712-1806).
    """
    d = mesh.devices.size
    ppr1, ppr2 = msm._points_per_row(g1), msm._points_per_row(g2)
    n = packed1.shape[0] * ppr1
    assert packed2.shape[0] * ppr2 == n, (packed1.shape, packed2.shape)
    local_n = n // d
    if c is None and lanes is None and local_n <= msm.NAIVE_THRESHOLD:
        return (_naive_packed_fn(mesh, g1)(packed1, scalars_raw),
                _naive_packed_fn(mesh, g2)(packed2, scalars_raw))
    num_chunks, lanes, chunk_m, m_total = msm._plan_packed(
        local_n, lanes, chunk_log)
    rows = chunk_m // lanes
    assert m_total == local_n, (m_total, local_n)
    if c is None:
        c = msm._choose_c_large(chunk_m)
    num_win = -(-255 // c)

    wr1 = wr2 = None
    gchunk = chunk_m * d                 # global elements per chunk round
    for k in range(num_chunks):
        # slices along the sharded axes keep the sharding (shard-aligned)
        sc_c = jax.lax.slice_in_dim(scalars_raw, k * gchunk,
                                    (k + 1) * gchunk, axis=1)
        p1_c = jax.lax.slice_in_dim(packed1, k * gchunk // ppr1,
                                    (k + 1) * gchunk // ppr1, axis=0)
        p2_c = jax.lax.slice_in_dim(packed2, k * gchunk // ppr2,
                                    (k + 1) * gchunk // ppr2, axis=0)
        ds, ix = _sort_digits_fn(mesh, num_win, c)(sc_c)
        w1 = _windows_fn(mesh, g1, c, lanes, rows)(p1_c, ds, ix)
        w2 = _windows_fn(mesh, g2, c, lanes, rows)(p2_c, ds, ix)
        wr1 = w1 if wr1 is None else g1.add(wr1, w1)
        wr2 = w2 if wr2 is None else g2.add(wr2, w2)
    return (msm._combine_windows(g1, wr1, c),
            msm._combine_windows(g2, wr2, c))
