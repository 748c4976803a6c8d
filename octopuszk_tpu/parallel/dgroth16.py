"""Distributed Groth16: sharded witness map and prover over a device mesh.

Reference parity: DistributedProver.prove (DistributedProver.java:28-167)
and R1CStoQAPRDD.R1CStoQAPWitness (R1CStoQAPRDD.java:159-270).  The Spark
topology maps to TPU as:

* assignment⋈query joins        -> co-sharded arrays (no-op)
* constraint⋈assignment joins   -> all_gather(z) + local gather by col
* reduceByKey per constraint    -> hierarchical segment-sum + psum
* DistributedFFT (2 shuffles)   -> parallel/dntt.py (all_to_all 4-step)
* mapPartitions Pippenger+reduce-> parallel/dmsm.py

The hierarchical segment-sum keeps uint32 exact: local chunk partials
(<= 2^13 terms each, < 2^29 per limb) are canonicalized with fp.from_wide
before the psum (< 2^16 * D per limb) and again before the chunk->row
second level — sound for any row density and mesh size <= 2^15.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from octopuszk_tpu.fields import fp
from octopuszk_tpu.fields.spec import FieldSpec, FR
from octopuszk_tpu.parallel import dmsm, dntt
from octopuszk_tpu.parallel.mesh import AXIS, batch_sharding, replicated
from octopuszk_tpu.relations.r1cs import R1CS, SparseMatrix


@dataclasses.dataclass
class ShardedMatrix:
    """COO matrix with nnz-axis arrays sharded; chunk tables replicated."""

    row: jnp.ndarray          # sharded [nnz_pad]
    col: jnp.ndarray          # sharded [nnz_pad]
    val: jnp.ndarray          # sharded [L, nnz_pad]
    row_chunk: jnp.ndarray    # sharded [nnz_pad]
    row_chunk_seg: jnp.ndarray  # replicated [n_chunks]
    num_rows: int
    num_chunks: int


@dataclasses.dataclass
class ShardedR1CS:
    a: ShardedMatrix
    b: ShardedMatrix
    c: ShardedMatrix
    num_constraints: int
    num_inputs: int
    num_variables: int


def shard_matrix(mesh, m: SparseMatrix) -> ShardedMatrix:
    d = mesh.devices.size
    nnz = int(m.row.shape[0])
    pad = (-nnz) % d
    row = np.pad(np.asarray(m.row), (0, pad))
    col = np.pad(np.asarray(m.col), (0, pad))
    val = np.pad(np.asarray(m.val), ((0, 0), (0, pad)))  # zero value terms
    chunk = np.pad(np.asarray(m.row_chunk), (0, pad))    # pads add 0 to chunk0
    sh = batch_sharding(mesh)
    sh1 = jax.sharding.NamedSharding(mesh, P(AXIS))
    rep = replicated(mesh)
    return ShardedMatrix(
        row=jax.device_put(jnp.asarray(row), sh1),
        col=jax.device_put(jnp.asarray(col), sh1),
        val=jax.device_put(jnp.asarray(val), sh),
        row_chunk=jax.device_put(jnp.asarray(chunk), sh1),
        row_chunk_seg=jax.device_put(m.row_chunk_seg, rep),
        num_rows=m.num_rows,
        num_chunks=int(m.row_chunk_seg.shape[0]))


def shard_r1cs(mesh, r1cs: R1CS) -> ShardedR1CS:
    return ShardedR1CS(
        a=shard_matrix(mesh, r1cs.a),
        b=shard_matrix(mesh, r1cs.b),
        c=shard_matrix(mesh, r1cs.c),
        num_constraints=r1cs.num_constraints,
        num_inputs=r1cs.num_inputs,
        num_variables=r1cs.num_variables)


def _local_matvec(spec, sm: ShardedMatrix, z_full):
    """Inside shard_map: local terms -> replicated [L, num_rows] result."""
    terms = fp.mont_mul(spec, sm.val, z_full[:, sm.col])
    part = jax.ops.segment_sum(terms.T, sm.row_chunk,
                               num_segments=sm.num_chunks).T
    part = fp.reduce_sum_mont(spec, part)
    part = jax.lax.psum(part, AXIS)
    part = fp.reduce_sum_mont(spec, part)
    out = jax.ops.segment_sum(part.T, sm.row_chunk_seg,
                              num_segments=sm.num_rows).T
    return fp.reduce_sum_mont(spec, out)


def distributed_witness(mesh, spec: FieldSpec, sr: ShardedR1CS, n: int, z):
    """QAP witness map with z batch-sharded; returns h sharded [L, n].

    (h's extra top zero coefficient of the serial path is appended by the
    caller on host if needed; degree <= n-2 so h[n-1] == 0 anyway.)
    """
    d = mesh.devices.size
    nc, ni = sr.num_constraints, sr.num_inputs
    mats = (sr.a, sr.b, sr.c)
    flat_specs = tuple(
        (P(AXIS), P(AXIS), P(None, AXIS), P(AXIS), P()) for _ in mats)

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(flat_specs, P(None, AXIS)),
        out_specs=(P(None, AXIS), P(None, AXIS), P(None, AXIS)))
    def _evals(mats_flat, z_loc):
        z_full = jax.lax.all_gather(z_loc, AXIS, axis=1, tiled=True)
        outs = []
        for (row, col, val, chunk, chunk_seg), src in zip(mats_flat, mats):
            sm = ShardedMatrix(row=row, col=col, val=val, row_chunk=chunk,
                               row_chunk_seg=chunk_seg,
                               num_rows=src.num_rows,
                               num_chunks=src.num_chunks)
            outs.append(_local_matvec(spec, sm, z_full))
        az, bz, cz = outs
        # pad to domain, add input-consistency rows for A
        zeros = fp.zeros_like_batch((n,))
        a_ev = zeros.at[:, :nc].set(az).at[:, nc:nc + ni].set(z_full[:, :ni])
        b_ev = zeros.at[:, :nc].set(bz)
        c_ev = zeros.at[:, :nc].set(cz)
        # return this device's slice (outputs are batch-sharded)
        dev = jax.lax.axis_index(AXIS)
        sl = n // d
        pick = lambda x: jax.lax.dynamic_slice_in_dim(x, dev * sl, sl, axis=1)
        return pick(a_ev), pick(b_ev), pick(c_ev)

    flats = tuple((m.row, m.col, m.val, m.row_chunk, m.row_chunk_seg)
                  for m in mats)
    a_ev, b_ev, c_ev = _evals(flats, z)

    def to_coset(x):
        return dntt.distributed_ntt(
            mesh, spec, dntt.distributed_ntt(mesh, spec, x, inverse=True),
            coset=True)

    a_c, b_c, c_c = to_coset(a_ev), to_coset(b_ev), to_coset(c_ev)

    from octopuszk_tpu.ops import ntt as sntt
    zinv = pow(sntt.compute_z_at(spec, n, spec.generator), -1, spec.p)

    @functools.partial(jax.shard_map, mesh=mesh,
                       in_specs=(P(None, AXIS),) * 3, out_specs=P(None, AXIS))
    def _h_coset(ac, bc, cc):
        h = fp.sub(spec, fp.mont_mul(spec, ac, bc), cc)
        zc = fp.constant(
            np.asarray(_mont_limbs(spec, zinv)), ())
        return fp.mont_mul(spec, h, zc[:, None])

    h_coset = _h_coset(a_c, b_c, c_c)
    return dntt.distributed_ntt(mesh, spec, h_coset, inverse=True, coset=True)


def _mont_limbs(spec, x: int):
    from octopuszk_tpu.utils.bigint import int_to_limbs
    from octopuszk_tpu.fields.spec import NUM_LIMBS
    return int_to_limbs(spec.to_mont(x % spec.p), NUM_LIMBS)


def distributed_prove_core(mesh, group, pk_queries, z, h):
    """The MSM phase over sharded queries; returns replicated points.

    pk_queries: dict of sharded point batches (query_a/b1/b2/h, delta_abc).
    z, h: sharded raw-limb scalars.
    """
    out = {}
    for name, (grp, pts, scal) in pk_queries.items():
        out[name] = dmsm.distributed_pippenger(mesh, grp, pts, scal)
    return out
