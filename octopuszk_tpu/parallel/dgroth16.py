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
    col_chunk: jnp.ndarray = None        # sharded [nnz_pad]
    col_chunk_seg: jnp.ndarray = None    # replicated [n_col_chunks]
    num_cols: int = 0
    num_col_chunks: int = 0


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
    cchunk = np.pad(np.asarray(m.col_chunk), (0, pad))
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
        num_chunks=int(m.row_chunk_seg.shape[0]),
        col_chunk=jax.device_put(jnp.asarray(cchunk), sh1),
        col_chunk_seg=jax.device_put(m.col_chunk_seg, rep),
        num_cols=m.num_cols,
        num_col_chunks=int(m.col_chunk_seg.shape[0]))


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


@functools.lru_cache(maxsize=None)
def _satisfied_fn(mesh, spec: FieldSpec, meta: tuple):
    flat_specs = tuple(
        (P(AXIS), P(AXIS), P(None, AXIS), P(AXIS), P()) for _ in meta)

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(flat_specs, P(None, AXIS)), out_specs=P())
    def _check(mats_flat, z_loc):
        z_full = jax.lax.all_gather(z_loc, AXIS, axis=1, tiled=True)
        outs = []
        for (row, col, val, chunk, chunk_seg), (nrows, nchunks) in zip(
                mats_flat, meta):
            sm = ShardedMatrix(row=row, col=col, val=val, row_chunk=chunk,
                               row_chunk_seg=chunk_seg, num_rows=nrows,
                               num_chunks=nchunks)
            outs.append(_local_matvec(spec, sm, z_full))
        az, bz, cz = outs
        return jnp.all(fp.eq(fp.mont_mul(spec, az, bz), cz))

    return jax.jit(_check)


def distributed_is_satisfied(mesh, spec: FieldSpec, sr: ShardedR1CS,
                             z) -> bool:
    """Sharded satisfiability check: A z * B z == C z elementwise, with z
    batch-sharded [L, m_pad] (zero-padded past num_variables).

    Reference: R1CSRelationRDD.isSatisfied (R1CSRelationRDD.java:179) —
    the join+reduceByKey becomes all_gather(z) + local gather + the
    hierarchical exact segment sum with a psum across shards.
    """
    mats = (sr.a, sr.b, sr.c)
    meta = tuple((m.num_rows, m.num_chunks) for m in mats)
    flats = tuple((m.row, m.col, m.val, m.row_chunk, m.row_chunk_seg)
                  for m in mats)
    return bool(_satisfied_fn(mesh, spec, meta)(flats, z))


@functools.lru_cache(maxsize=None)
def _witness_evals_fn(mesh, spec: FieldSpec, n: int, nc: int, ni: int,
                      meta: tuple):
    """Memoized jitted A/B/C-evaluation shard_map.  ``meta`` is a tuple of
    (num_rows, num_chunks) per matrix (static shape data — the arrays
    themselves are passed as arguments so the executable is reused across
    proofs and tests)."""
    d = mesh.devices.size
    flat_specs = tuple(
        (P(AXIS), P(AXIS), P(None, AXIS), P(AXIS), P()) for _ in meta)

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(flat_specs, P(None, AXIS)),
        out_specs=(P(None, AXIS), P(None, AXIS), P(None, AXIS)))
    def _evals(mats_flat, z_loc):
        z_full = jax.lax.all_gather(z_loc, AXIS, axis=1, tiled=True)
        outs = []
        for (row, col, val, chunk, chunk_seg), (nrows, nchunks) in zip(
                mats_flat, meta):
            sm = ShardedMatrix(row=row, col=col, val=val, row_chunk=chunk,
                               row_chunk_seg=chunk_seg,
                               num_rows=nrows,
                               num_chunks=nchunks)
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

    return jax.jit(_evals)


@functools.lru_cache(maxsize=None)
def _h_coset_fn(mesh, spec: FieldSpec, n: int):
    from octopuszk_tpu.ops import ntt as sntt
    zinv = pow(sntt.compute_z_at(spec, n, spec.generator), -1, spec.p)

    @functools.partial(jax.shard_map, mesh=mesh,
                       in_specs=(P(None, AXIS),) * 3, out_specs=P(None, AXIS))
    def _h_coset(ac, bc, cc):
        h = fp.sub(spec, fp.mont_mul(spec, ac, bc), cc)
        zc = fp.constant(
            np.asarray(_mont_limbs(spec, zinv)), ())
        return fp.mont_mul(spec, h, zc[:, None])

    return jax.jit(_h_coset)


def distributed_witness(mesh, spec: FieldSpec, sr: ShardedR1CS, n: int, z):
    """QAP witness map with z batch-sharded; returns h sharded [L, n].

    (h's extra top zero coefficient of the serial path is appended by the
    caller on host if needed; degree <= n-2 so h[n-1] == 0 anyway.)
    """
    nc, ni = sr.num_constraints, sr.num_inputs
    mats = (sr.a, sr.b, sr.c)
    meta = tuple((m.num_rows, m.num_chunks) for m in mats)
    flats = tuple((m.row, m.col, m.val, m.row_chunk, m.row_chunk_seg)
                  for m in mats)
    a_ev, b_ev, c_ev = _witness_evals_fn(mesh, spec, n, nc, ni, meta)(
        flats, z)

    def to_coset(x):
        return dntt.distributed_ntt(
            mesh, spec, dntt.distributed_ntt(mesh, spec, x, inverse=True),
            coset=True)

    a_c, b_c, c_c = to_coset(a_ev), to_coset(b_ev), to_coset(c_ev)
    h_coset = _h_coset_fn(mesh, spec, n)(a_c, b_c, c_c)
    return dntt.distributed_ntt(mesh, spec, h_coset, inverse=True, coset=True)


def _mont_limbs(spec, x: int):
    from octopuszk_tpu.utils.bigint import int_to_limbs
    from octopuszk_tpu.fields.spec import NUM_LIMBS
    return int_to_limbs(spec.to_mont(x % spec.p), NUM_LIMBS)


def _local_rmatvec(spec, sm: ShardedMatrix, w_full):
    """Inside shard_map: transpose matvec A.T @ w -> replicated [L, cols]."""
    terms = fp.mont_mul(spec, sm.val, w_full[:, sm.row])
    part = jax.ops.segment_sum(terms.T, sm.col_chunk,
                               num_segments=sm.num_col_chunks).T
    part = fp.reduce_sum_mont(spec, part)
    part = jax.lax.psum(part, AXIS)
    part = fp.reduce_sum_mont(spec, part)
    out = jax.ops.segment_sum(part.T, sm.col_chunk_seg,
                              num_segments=sm.num_cols).T
    return fp.reduce_sum_mont(spec, out)


def distributed_lagrange(mesh, spec: FieldSpec, n: int, t: int):
    """Sharded Lagrange coefficients L_i(t), i < n — uint32[L, n] sharded.

    Reference: FFTAuxiliary.distributedRadix2LagrangeCoefficients
    (FFTAuxiliary.java:307-354).  Requires t outside the domain (the
    random-secret case; checked on host).
    """
    assert pow(t, n, spec.p) != 1, "t in evaluation domain"
    return _lagrange_fn(mesh, spec, n, t)()


@functools.lru_cache(maxsize=None)
def _lagrange_fn(mesh, spec: FieldSpec, n: int, t: int):
    d = mesh.devices.size
    dmax = 1 << max(0, (d - 1).bit_length())
    omega = spec.rou_of_order(n)
    zt_over_n = (pow(t, n, spec.p) - 1) * pow(n, -1, spec.p) % spec.p

    @functools.partial(jax.shard_map, mesh=mesh, in_specs=(),
                       out_specs=P(None, AXIS))
    def _body():
        w = dntt._dev_scaled_powers(spec, omega, n // d, dmax)
        t_col = fp.constant(np.asarray(_mont_limbs(spec, t)), (n // d,))
        diff = fp.sub(spec, t_col, w)
        inv_diff = fp.batch_inv(spec, diff)
        zc = fp.constant(np.asarray(_mont_limbs(spec, zt_over_n)), ())
        return fp.mont_mul(spec, fp.mont_mul(spec, w, inv_diff),
                           zc[:, None])

    return jax.jit(_body)


def sharded_pad(x: int, d: int, min_local: int = 4) -> int:
    """Pad a batch length so the per-shard slice is a power of two >= 4:
    every group's points-per-row divides it and the packed-MSM lane plan
    (ops/msm.py _plan_packed) always tiles it exactly."""
    local = max(min_local, -(-x // d))
    return d * (1 << (local - 1).bit_length())


def distributed_qap_instance(mesh, spec: FieldSpec, sr: ShardedR1CS,
                             t: int, n: int, m_pad: int | None = None,
                             h_pad: int | None = None):
    """Sharded At/Bt/Ct [L, m_pad] + Ht [L, h_pad]; zt host.

    Reference: R1CStoQAPRDD.R1CStoQAPRelation (R1CStoQAPRDD.java:44-131).
    """
    d = mesh.devices.size
    nc, ni, m = sr.num_constraints, sr.num_inputs, sr.num_variables
    if m_pad is None:
        m_pad = sharded_pad(m, d)
    lag = distributed_lagrange(mesh, spec, n, t)
    mats = (sr.a, sr.b, sr.c)
    meta = tuple((mm.num_rows, mm.num_cols, mm.num_col_chunks)
                 for mm in mats)
    flats = tuple((mm.row, mm.col, mm.val, mm.col_chunk, mm.col_chunk_seg)
                  for mm in mats)
    at, bt, ct = _instance_fn(mesh, spec, nc, ni, m_pad, meta)(flats, lag)

    # Ht = powers of t, padded past n+1 (extra powers are harmless: their
    # H-coefficient scalars are zero)
    if h_pad is None:
        h_pad = sharded_pad(n + 1, d)
    from octopuszk_tpu.ops import ntt as sntt
    zt = sntt.compute_z_at(spec, n, t)
    return at, bt, ct, _ht_fn(mesh, spec, t, h_pad)(), zt


@functools.lru_cache(maxsize=None)
def _instance_fn(mesh, spec: FieldSpec, nc: int, ni: int, m_pad: int,
                 meta: tuple):
    d = mesh.devices.size
    mat_specs = tuple(
        (P(AXIS), P(AXIS), P(None, AXIS), P(AXIS), P()) for _ in meta)

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(mat_specs, P(None, AXIS)),
        out_specs=(P(None, AXIS),) * 3)
    def _instance(mats_flat, lag_loc):
        lag_full = jax.lax.all_gather(lag_loc, AXIS, axis=1, tiled=True)
        w = lag_full[:, :nc]
        outs = []
        for (row, col, val, cchunk, cseg), (nrows, ncols, ncchunks) in zip(
                mats_flat, meta):
            sm = ShardedMatrix(
                row=row, col=col, val=val, row_chunk=None,
                row_chunk_seg=None, num_rows=nrows,
                num_chunks=0, col_chunk=cchunk, col_chunk_seg=cseg,
                num_cols=ncols, num_col_chunks=ncchunks)
            outs.append(_local_rmatvec(spec, sm, w))
        at, bt, ct = outs
        # input consistency: At_i += L_{nc+i}(t), i < ni
        consist = jnp.zeros_like(at).at[:, :ni].set(lag_full[:, nc:nc + ni])
        at = fp.add(spec, at, consist)
        # pad to m_pad and slice the local shard
        dev = jax.lax.axis_index(AXIS)
        sl = m_pad // d
        def pick(x):
            x = jnp.pad(x, ((0, 0), (0, m_pad - x.shape[1])))
            return jax.lax.dynamic_slice_in_dim(x, dev * sl, sl, axis=1)
        return pick(at), pick(bt), pick(ct)

    return jax.jit(_instance)


@functools.lru_cache(maxsize=None)
def _ht_fn(mesh, spec: FieldSpec, t: int, h_pad: int):
    d = mesh.devices.size
    dmax = 1 << max(0, (d - 1).bit_length())

    @functools.partial(jax.shard_map, mesh=mesh, in_specs=(),
                       out_specs=P(None, AXIS))
    def _ht():
        return dntt._dev_scaled_powers(spec, t, h_pad // d, dmax)

    return jax.jit(_ht)


def distributed_setup(mesh, sr: ShardedR1CS, seed: int = 1, curve=None):
    """Distributed CRS generation; returns a CRS whose proving-key queries
    are row-sharded PACKED affine tensors (dmsm.distributed_pack) driving
    the prover's large-MSM path.  delta_abc_g1 covers ALL m variables with
    the primary entries gamma-scaled — the reference's filtered field MSM
    (FixedBaseMSM.distributedFilterFieldBatchMSM, FixedBaseMSM.java:
    854-878) computes exactly this split in one pass; the prover zeroes
    primary scalars so only the delta-scaled tail contributes.

    ``curve``: a curves/family.py bundle; defaults to BN254a.
    Reference: DistributedSetup.generate (DistributedSetup.java:34-227).
    """
    import random as _random

    from octopuszk_tpu.curves import group_ops as jac
    from octopuszk_tpu.models.groth16.objects import (
        CRS, ProvingKey, VerificationKey)
    from octopuszk_tpu.parallel import mesh as pmesh

    if curve is None:
        from octopuszk_tpu.curves.family import bn254a
        curve = bn254a()
    fr = curve.fr
    g1_grp, g2_grp = curve.g1, curve.g2

    rng = _random.Random(seed)
    t, alpha, beta, gamma, delta = (rng.randrange(1, fr.p) for _ in range(5))
    inv_gamma = pow(gamma, -1, fr.p)
    inv_delta = pow(delta, -1, fr.p)
    nc, ni, m = sr.num_constraints, sr.num_inputs, sr.num_variables
    d = mesh.devices.size
    n = 1 << (nc + ni - 1).bit_length()
    # ONE shared pad for variable and H vectors: every query shares the
    # same fixed-base and packed-MSM executables (compile time is scarce
    # on the CPU-mesh test path; padded scalars are zero = identity)
    pad = max(sharded_pad(m, d), sharded_pad(n + 1, d))

    at, bt, ct, ht, zt = distributed_qap_instance(
        mesh, fr, sr, t, n, m_pad=pad, h_pad=pad)

    def cmul(x, k: int):
        kc = jnp.asarray(np.asarray(_mont_limbs(fr, k)))
        return fp.mont_mul(fr, x, kc[:, None])

    abc = fp.add(fr, fp.add(fr, cmul(at, beta), cmul(bt, alpha)), ct)
    # filtered split: gamma^-1 on the primary prefix, delta^-1 on the rest
    idx = jnp.arange(pad, dtype=jnp.int32)
    filtered_abc = fp.select(idx < ni, cmul(abc, inv_gamma),
                             cmul(abc, inv_delta))
    ht_scaled = cmul(ht, zt * inv_delta % fr.p)

    g1_gen = g1_grp.host.mul(g1_grp.generator_affine, rng.randrange(1, fr.p))
    g2_gen = g2_grp.host.mul(g2_grp.generator_affine, rng.randrange(1, fr.p))
    g1_dev = pmesh.replicate_point(mesh, g1_grp.point_to_device(g1_gen))
    g2_dev = pmesh.replicate_point(mesh, g2_grp.point_to_device(g2_gen))

    def raw(x):
        return fp.from_mont(fr, x)

    def enc_g1(scalars_mont):
        pts = dmsm.distributed_fixed_base_msm(
            mesh, g1_grp, g1_dev, raw(scalars_mont))
        return pts, dmsm.distributed_pack(mesh, g1_grp, pts)

    def enc_g2_b():
        pts = dmsm.distributed_fixed_base_msm(mesh, g2_grp, g2_dev, raw(bt))
        pk = dmsm.distributed_pack(mesh, g2_grp, pts)
        jax.block_until_ready(pk)
        return pk

    # the G2 chain compiles/runs on its own thread, overlapped with the
    # four G1 encodes (the G2 executables are the most expensive compiles;
    # jax dispatch and XLA compilation are thread-safe and release the GIL)
    from octopuszk_tpu.utils.workers import big_stack_executor
    with big_stack_executor() as ex:
        fut_b_g2 = ex.submit(enc_g2_b)
        _, query_a = enc_g1(at)
        _, query_b_g1 = enc_g1(bt)
        _, query_h = enc_g1(ht_scaled)
        filtered_pts, delta_abc_g1 = enc_g1(filtered_abc)
        query_b_g2 = fut_b_g2.result()

    # vk gammaABC = the gamma-scaled primary prefix of the filtered query
    gamma_abc_g1 = g1_grp.points_to_host(
        jac._map_coords(filtered_pts, lambda c: c[..., :ni]))

    pk = ProvingKey(
        alpha_g1=g1_grp.host.mul(g1_gen, alpha),
        beta_g1=g1_grp.host.mul(g1_gen, beta),
        beta_g2=g2_grp.host.mul(g2_gen, beta),
        delta_g1=g1_grp.host.mul(g1_gen, delta),
        delta_g2=g2_grp.host.mul(g2_gen, delta),
        delta_abc_g1=delta_abc_g1, query_a=query_a,
        query_b_g1=query_b_g1, query_b_g2=query_b_g2,
        query_h=query_h, r1cs=sr, packed=True, delta_abc_full=True)
    vk = VerificationKey(
        alpha_beta_gt=curve.pairing.reduced_pairing(
            pk.alpha_g1, pk.beta_g2),
        gamma_g2=g2_grp.host.mul(g2_gen, gamma),
        delta_g2=pk.delta_g2,
        gamma_abc_g1=gamma_abc_g1)
    return CRS(proving_key=pk, verification_key=vk)


def distributed_prove(mesh, pk, primary, auxiliary, seed: int = 2,
                      curve=None, config=None):
    """Distributed prover over a sharded proving key (distributed_setup).

    ``curve``: a curves/family.py bundle; defaults to BN254a.
    Reference: DistributedProver.prove (DistributedProver.java:28-167).
    """
    import random as _random

    from octopuszk_tpu.models.groth16.objects import Proof
    from octopuszk_tpu.parallel import mesh as pmesh
    from octopuszk_tpu.relations.r1cs import assignment_to_device

    if curve is None:
        from octopuszk_tpu.curves.family import bn254a
        curve = bn254a()
    fr = curve.fr
    g1_grp, g2_grp = curve.g1, curve.g2

    rng = _random.Random(seed)
    r = rng.randrange(fr.p)
    s = rng.randrange(fr.p)
    sr = pk.r1cs
    d = mesh.devices.size
    nc, ni, m = sr.num_constraints, sr.num_inputs, sr.num_variables
    n = 1 << (nc + ni - 1).bit_length()
    assert pk.packed, "distributed_prove needs a packed distributed CRS"
    # the setup packs every query to ONE shared padded length (see
    # distributed_setup); recover it from the stored queries
    from octopuszk_tpu.ops import msm
    pad = pk.query_a.shape[0] * msm._points_per_row(g1_grp)

    full = list(primary) + list(auxiliary)
    z = pmesh.shard_vector(
        mesh, assignment_to_device(fr, full + [0] * (pad - m)))
    if config is not None and config.debug:
        # debug-mode satisfiability assertion before proving
        # (DistributedProver.java:38-55 role, gated on config.debugFlag)
        assert distributed_is_satisfied(mesh, fr, sr, z), \
            "R1CS not satisfied"
    h = distributed_witness(mesh, fr, sr, n, z)       # [L, n] sharded
    h = jnp.pad(h, ((0, 0), (0, pad - n)))

    z_raw = fp.from_mont(fr, z)
    if getattr(pk, "delta_abc_full", True):
        # distributed-setup layout (full-m filtered query): zero the
        # primary scalars so only delta-scaled entries contribute
        idx = jnp.arange(pad, dtype=jnp.int32)
        z_aux_raw = jnp.where(idx[None, :] < ni, jnp.uint32(0), z_raw)
    else:
        # serial-setup layout (aux-only query, re-sharded via shard_crs):
        # align scalars by dropping the primary prefix
        z_aux_raw = jnp.pad(z_raw[:, ni:], ((0, 0), (0, ni)))
    h_raw = fp.from_mont(fr, h)

    def run_msm(grp, packed, scal):
        part = dmsm.distributed_pippenger_packed(mesh, grp, packed, scal)
        return _replicated_point_to_host(grp, part)

    def run_double():
        # fused queryB double MSM: digit extraction + per-window sort
        # shared between the G1 and G2 pipelines (the work the reference
        # fuses per partition, VariableBaseMSM.java:805-820)
        r1, r2 = dmsm.distributed_pippenger_double_packed(
            mesh, g1_grp, g2_grp, pk.query_b_g1, pk.query_b_g2, z_raw)
        return (_replicated_point_to_host(g1_grp, r1),
                _replicated_point_to_host(g2_grp, r2))

    # the fused B MSM (with the most expensive G2 executable) overlaps
    # the remaining G1 MSMs on its own thread (compiles and dispatch
    # release the GIL)
    from octopuszk_tpu.utils.workers import big_stack_executor
    with big_stack_executor() as ex:
        fut_b = ex.submit(run_double)
        eval_a = run_msm(g1_grp, pk.query_a, z_raw)
        eval_h = run_msm(g1_grp, pk.query_h, h_raw)
        eval_abc = run_msm(g1_grp, pk.delta_abc_g1, z_aux_raw)
        eval_b1, eval_b2 = fut_b.result()

    g1, g2 = g1_grp.host, g2_grp.host
    a_pt = g1.add(g1.add(pk.alpha_g1, eval_a), g1.mul(pk.delta_g1, r))
    b1_pt = g1.add(g1.add(pk.beta_g1, eval_b1), g1.mul(pk.delta_g1, s))
    b2_pt = g2.add(g2.add(pk.beta_g2, eval_b2), g2.mul(pk.delta_g2, s))
    c_pt = g1.add(eval_abc, eval_h)
    c_pt = g1.add(c_pt, g1.mul(a_pt, s))
    c_pt = g1.add(c_pt, g1.mul(b1_pt, r))
    c_pt = g1.add(c_pt, g1.neg(g1.mul(pk.delta_g1, r * s % fr.p)))
    return Proof(a=a_pt, b=b2_pt, c=c_pt)


def _replicated_point_to_host(grp, p):
    from octopuszk_tpu.curves import group_ops as jac
    return grp.points_to_host(jac._map_coords(p, lambda c: c[..., None]))[0]


# ---------------------------------------------------------------------------
# distributed CRS persistence bridge (gather-to-serial / re-shard)
# ---------------------------------------------------------------------------


def _unshard_matrix(sm: ShardedMatrix) -> SparseMatrix:
    """ShardedMatrix -> host SparseMatrix (device_get gathers the shards;
    the zero-value nnz padding added by shard_matrix is kept — padded
    terms multiply to zero, so every consumer is unaffected)."""
    return SparseMatrix(
        row=jnp.asarray(np.asarray(sm.row)),
        col=jnp.asarray(np.asarray(sm.col)),
        val=jnp.asarray(np.asarray(sm.val)),
        row_chunk=jnp.asarray(np.asarray(sm.row_chunk)),
        row_chunk_seg=jnp.asarray(np.asarray(sm.row_chunk_seg)),
        col_chunk=jnp.asarray(np.asarray(sm.col_chunk)),
        col_chunk_seg=jnp.asarray(np.asarray(sm.col_chunk_seg)),
        num_rows=sm.num_rows, num_cols=sm.num_cols)


def gather_crs(mesh, crs):
    """Distributed CRS -> serial-form CRS (host/gathered arrays) that
    ``models.groth16.serialize.save_crs`` can persist.

    The packed row-sharded queries gather to full u32[n/ppr, 128] tensors
    and the ShardedR1CS to a host SparseMatrix R1CS; the result also
    proves directly with the SERIAL prover (the layouts coincide).
    The reference has no CRS persistence at all (SURVEY.md §5) — at
    billions of gates a re-runnable setup is not optional.
    """
    from octopuszk_tpu.models.groth16.objects import CRS, ProvingKey

    pk = crs.proving_key
    assert pk.packed, "gather_crs expects a packed distributed CRS"
    sr = pk.r1cs
    r1cs = R1CS(
        a=_unshard_matrix(sr.a), b=_unshard_matrix(sr.b),
        c=_unshard_matrix(sr.c), num_constraints=sr.num_constraints,
        num_inputs=sr.num_inputs, num_variables=sr.num_variables)
    gq = lambda q: jnp.asarray(np.asarray(q))
    new_pk = ProvingKey(
        alpha_g1=pk.alpha_g1, beta_g1=pk.beta_g1, beta_g2=pk.beta_g2,
        delta_g1=pk.delta_g1, delta_g2=pk.delta_g2,
        delta_abc_g1=gq(pk.delta_abc_g1), query_a=gq(pk.query_a),
        query_b_g1=gq(pk.query_b_g1), query_b_g2=gq(pk.query_b_g2),
        query_h=gq(pk.query_h), r1cs=r1cs, packed=True,
        delta_abc_full=getattr(pk, "delta_abc_full", True))
    return CRS(proving_key=new_pk, verification_key=crs.verification_key)


def shard_crs(mesh, crs):
    """Serial-form packed CRS (setup.setup output or serialize.load_crs)
    -> distributed CRS: row-shard every packed query over the mesh and
    shard the R1CS.  Inverse of ``gather_crs`` up to array placement.
    """
    from octopuszk_tpu.models.groth16.objects import CRS, ProvingKey

    pk = crs.proving_key
    assert pk.packed, "shard_crs expects a packed CRS"
    d = mesh.devices.size
    sh_rows = jax.sharding.NamedSharding(mesh, P(AXIS, None))
    def sq(q):
        assert q.shape[0] % d == 0, (q.shape, d)
        return jax.device_put(q, sh_rows)
    sr = (pk.r1cs if isinstance(pk.r1cs, ShardedR1CS)
          else shard_r1cs(mesh, pk.r1cs))
    new_pk = ProvingKey(
        alpha_g1=pk.alpha_g1, beta_g1=pk.beta_g1, beta_g2=pk.beta_g2,
        delta_g1=pk.delta_g1, delta_g2=pk.delta_g2,
        delta_abc_g1=sq(pk.delta_abc_g1), query_a=sq(pk.query_a),
        query_b_g1=sq(pk.query_b_g1), query_b_g2=sq(pk.query_b_g2),
        query_h=sq(pk.query_h), r1cs=sr, packed=True,
        delta_abc_full=getattr(pk, "delta_abc_full", False))
    return CRS(proving_key=new_pk, verification_key=crs.verification_key)
