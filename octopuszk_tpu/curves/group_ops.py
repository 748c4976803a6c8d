"""Vectorized COMPLETE projective curve arithmetic (a = 0 curves).

Homogeneous projective points ``(X, Y, Z)`` with the identity at
(0, 1, 0), using the Renes–Costello–Batina complete addition formulas
(EPFL ePrint 2015/1060, Algorithms 7-9 for a=0): one branchless 12M
formula correct for EVERY input pair — doubling, identity, inverses —
so the vectorized kernels need no per-lane selects and do ~2.2x less
work than total Jacobian add (which must also compute the doubling
branch).  Requires odd group order (true for BN254 G1 and the G2
subgroup).

Works over any coordinate field presented as an ops namespace (Fp for
G1, Fp2 for G2).  Everything is shape-polymorphic in the batch dims and
jit/vmap/shard_map friendly.

Reference parity: the roles of BNG1.java:38-117 / BNG2.java and the
device EC arithmetic in algebra_msm_VariableBaseMSM.cu:290-726 — an
intentionally different (strictly better for SIMD) formula family.
"""

from __future__ import annotations

import types

import jax.numpy as jnp

from octopuszk_tpu.fields import fp, fp2, host_tower
from octopuszk_tpu.fields.spec import FieldSpec, NUM_LIMBS
from octopuszk_tpu.utils.bigint import int_to_limbs

import numpy as np


def make_fp_ops(spec: FieldSpec, b3: int = 9,
                group_name: str = "G1") -> types.SimpleNamespace:
    """Coordinate-field adapter for a base prime field (G1).

    ``b3`` = 3 * coefficientB (BN254a b=3 -> 9; BN254b b=13 -> 39),
    multiplied in by addition chain — cheaper than a Montgomery multiply."""
    return types.SimpleNamespace(
        spec=spec,
        group_name=group_name,
        add=lambda a, b: fp.add(spec, a, b),
        sub=lambda a, b: fp.sub(spec, a, b),
        mul=lambda a, b: fp.mont_mul(spec, a, b),
        sqr=lambda a: fp.mont_sqr(spec, a),
        neg=lambda a: fp.neg(spec, a),
        dbl=lambda a: fp.add(spec, a, a),
        inv=lambda a: fp.inv(spec, a),
        mul_b3=lambda a: fp.mul_small(spec, a, b3),
        binv=lambda a: fp.batch_inv_rows(spec, a),
        is_zero=fp.is_zero,
        eq=fp.eq,
        select=fp.select,
        zero=lambda shape=(): fp.zeros_like_batch(shape),
        one=lambda shape=(): fp.constant(spec.one_mont_limbs, shape),
    )


def _g2_b3_limbs(spec, b3):
    """b3 = 3 * (b / twist) as Montgomery Fp2 limb constants."""
    return (np.asarray(int_to_limbs(spec.to_mont(b3[0]), NUM_LIMBS)),
            np.asarray(int_to_limbs(spec.to_mont(b3[1]), NUM_LIMBS)))


def make_fp2_ops(spec: FieldSpec, nr: int = -1, b3=None,
                 group_name: str = "G2") -> types.SimpleNamespace:
    """Coordinate-field adapter for Fp2 (G2 of a BN curve).

    ``nr``: the Fp2 non-residue (u^2 = nr; BN254a -1, BN254b -5).
    ``b3``: 3 * twistCoefficientB as an (c0, c1) int pair; defaults to the
    BN254a value 9/(9+u)."""
    if b3 is None:
        b2 = host_tower.fp2_mul((3, 0), host_tower.fp2_inv(host_tower.XI))
        b3 = host_tower.fp2_scalar(b2, 3)
    b3c0, b3c1 = _g2_b3_limbs(spec, b3)

    def mul_b3(a):
        # build constants at full rank (1-D limb vectors trip Mosaic)
        tail = a[0].shape[1:]
        cc = (fp.constant(b3c0, tail), fp.constant(b3c1, tail))
        return fp2.mul(spec, a, cc, nr)

    return types.SimpleNamespace(
        spec=spec,
        group_name=group_name,
        add=lambda a, b: fp2.add(spec, a, b),
        sub=lambda a, b: fp2.sub(spec, a, b),
        mul=lambda a, b: fp2.mul(spec, a, b, nr),
        sqr=lambda a: fp2.sqr(spec, a, nr),
        neg=lambda a: fp2.neg(spec, a),
        dbl=lambda a: fp2.double(spec, a),
        inv=lambda a: fp2.inv(spec, a, nr),
        mul_b3=mul_b3,
        binv=lambda a: fp2.batch_inv_rows(spec, a, nr=nr),
        is_zero=fp2.is_zero,
        eq=fp2.eq,
        select=fp2.select,
        zero=lambda shape=(): (fp.zeros_like_batch(shape),
                               fp.zeros_like_batch(shape)),
        one=lambda shape=(): (fp.constant(spec.one_mont_limbs, shape),
                              fp.zeros_like_batch(shape)),
    )


# ---------------------------------------------------------------------------
# point predicates / constructors
# ---------------------------------------------------------------------------

def infinity(ops, batch_shape=()):
    """The identity: (0, 1, 0)."""
    return (ops.zero(batch_shape), ops.one(batch_shape),
            ops.zero(batch_shape))


def is_infinity(ops, p):
    return ops.is_zero(p[2])


def select_point(ops, mask, p, q):
    """mask ? p : q, per batch element."""
    return tuple(ops.select(mask, a, b) for a, b in zip(p, q))


def negate(ops, p):
    return (p[0], ops.neg(p[1]), p[2])


def taint_point(p, *refs):
    """Merge shard_map varying-axes of refs into every coord of p
    (value-preserving; needed for loop-carry inits inside shard_map)."""
    z = None
    for ref in refs:
        c = ref
        while isinstance(c, tuple):
            c = c[0]
        zc = fp.vma_zero(c)
        z = zc if z is None else (z ^ zc)
    return _map_coords(p, lambda c: c ^ z)


def _batch_shape(coord):
    """Batch shape of a coordinate (unwrap Fp2 pairs)."""
    while isinstance(coord, tuple):
        coord = coord[0]
    return coord.shape[1:]


def _map_coords(point, fn):
    return tuple(
        tuple(fn(c) for c in coord) if isinstance(coord, tuple) else fn(coord)
        for coord in point)


# ---------------------------------------------------------------------------
# complete add / double / mixed add  (RCB 2015, Algorithms 7, 8, 9; a = 0)
# ---------------------------------------------------------------------------

def _same_batch(p, q):
    a, b = p[0], q[0]
    while isinstance(a, tuple):
        a = a[0]
    while isinstance(b, tuple):
        b = b[0]
    return a.shape == b.shape


def _broadcast_points(p, q):
    """Broadcast every coord leaf of two points to a common batch shape."""
    import jax

    leaves = jax.tree_util.tree_leaves((p, q))
    shape = jnp.broadcast_shapes(*[a.shape for a in leaves])
    bc = lambda a: jnp.broadcast_to(a, shape)
    return (jax.tree_util.tree_map(bc, p), jax.tree_util.tree_map(bc, q))


def _mul_many(ops, pairs):
    """[a*b for a, b in pairs] via ONE batched ops.mul.

    The independent multiplies of a complete-add formula are concatenated
    along the batch (last) axis so they compile to a single rolled CIOS
    while-loop instead of k separate ones — XLA compile time for the
    formula drops ~6x (the dominant cost of the CPU multi-chip gate) and
    the wider batch amortizes loop overhead on TPU.  All operands must
    share one shape (callers broadcast first).
    """
    import jax

    k = len(pairs)
    if k == 1:
        return [ops.mul(*pairs[0])]
    lhs = [a for a, _ in pairs]
    rhs = [b for _, b in pairs]
    scalar = jax.tree_util.tree_leaves(lhs[0])[0].ndim == 1  # [L]: no batch
    if scalar:
        expand = lambda x: jax.tree_util.tree_map(lambda a: a[..., None], x)
        lhs = [expand(x) for x in lhs]
        rhs = [expand(x) for x in rhs]
    n = jax.tree_util.tree_leaves(lhs[0])[0].shape[-1]
    cat = lambda *xs: jnp.concatenate(xs, axis=-1)
    prod = ops.mul(jax.tree_util.tree_map(cat, *lhs),
                   jax.tree_util.tree_map(cat, *rhs))
    outs = []
    for i in range(k):
        o = jax.tree_util.tree_map(
            lambda a: jax.lax.slice_in_dim(
                a, i * n, (i + 1) * n, axis=a.ndim - 1), prod)
        if scalar:
            o = jax.tree_util.tree_map(lambda a: a[..., 0], o)
        outs.append(o)
    return outs


def _pallas_eligible(ops, p):
    """Use the fused Pallas kernel? (TPU backend, flat [L, n] batch, not
    already tracing inside a kernel; only the BN254a groups have compiled
    kernels — other curve families take the XLA formula path.)"""
    if fp.UNROLL or ops.group_name not in ("G1", "G2"):
        return False
    c = p[0]
    while isinstance(c, tuple):
        c = c[0]
    if c.ndim != 2 or c.shape[1] < 256:
        return False
    from octopuszk_tpu.ops import pallas_ops
    return pallas_ops.enabled()


def add(ops, p, q):
    """P + Q, complete: valid for all inputs (identity, equal, inverse)."""
    if _pallas_eligible(ops, p) and _same_batch(p, q):
        from octopuszk_tpu.ops import pallas_ops
        return pallas_ops.add_points(ops.group_name, p, q)
    p, q = _broadcast_points(p, q)
    X1, Y1, Z1 = p
    X2, Y2, Z2 = q
    t0, t1, t2, t3, t4, t5 = _mul_many(ops, [
        (X1, X2), (Y1, Y2), (Z1, Z2),
        (ops.add(X1, Y1), ops.add(X2, Y2)),
        (ops.add(Y1, Z1), ops.add(Y2, Z2)),
        (ops.add(X1, Z1), ops.add(X2, Z2))])
    t3 = ops.sub(t3, ops.add(t0, t1))                 # X1Y2 + X2Y1
    t4 = ops.sub(t4, ops.add(t1, t2))                 # Y1Z2 + Y2Z1
    t5 = ops.sub(t5, ops.add(t0, t2))                 # X1Z2 + X2Z1
    three_t0 = ops.add(ops.dbl(t0), t0)
    b3t2 = ops.mul_b3(t2)
    z3 = ops.add(t1, b3t2)
    t1 = ops.sub(t1, b3t2)
    y3 = ops.mul_b3(t5)
    ma, mb, mc, md, me, mf = _mul_many(ops, [
        (t3, t1), (t4, y3), (y3, three_t0), (t1, z3),
        (z3, t4), (three_t0, t3)])
    return (ops.sub(ma, mb), ops.add(mc, md), ops.add(me, mf))


def double(ops, p):
    """[2]P, complete (RCB Algorithm 9, a = 0)."""
    if _pallas_eligible(ops, p):
        from octopuszk_tpu.ops import pallas_ops
        return pallas_ops.double_points(ops.group_name, p)
    X, Y, Z = p
    t0, t1, tzz, txy = _mul_many(ops, [(Y, Y), (Y, Z), (Z, Z), (X, Y)])
    z3 = ops.dbl(ops.dbl(ops.dbl(t0)))                # 8Y^2
    t2 = ops.mul_b3(tzz)
    y3a = ops.add(t0, t2)
    t2_3 = ops.add(ops.dbl(t2), t2)
    t0 = ops.sub(t0, t2_3)
    X3, Z3, yb, xc = _mul_many(ops, [
        (t2, z3), (t1, z3), (t0, y3a), (t0, txy)])
    return (ops.dbl(xc), ops.add(X3, yb), Z3)


def mixed_add(ops, p, q_affine, q_inf_mask=None):
    """P (projective) + Q (affine, Z=1): complete in P (RCB Algorithm 8).

    ``q_inf_mask`` marks batch slots where Q is the identity.
    """
    (X1, Y1), (X2, Y2) = _broadcast_points(p[:2], q_affine)
    Z1, _ = _broadcast_points(p[2], X2)
    t0, t1, t3, t4m, t5m = _mul_many(ops, [
        (X1, X2), (Y1, Y2),
        (ops.add(X2, Y2), ops.add(X1, Y1)),
        (X2, Z1), (Y2, Z1)])
    t3 = ops.sub(t3, ops.add(t0, t1))                 # X1Y2 + X2Y1
    t4 = ops.add(t4m, X1)                             # X1 + X2Z1
    t5 = ops.add(t5m, Y1)                             # Y1 + Y2Z1
    three_t0 = ops.add(ops.dbl(t0), t0)
    b3z1 = ops.mul_b3(Z1)
    z3 = ops.add(t1, b3z1)
    t1 = ops.sub(t1, b3z1)
    y3 = ops.mul_b3(t4)
    ma, mb, mc, md, me, mf = _mul_many(ops, [
        (t3, t1), (t5, y3), (y3, three_t0), (t1, z3),
        (z3, t5), (three_t0, t3)])
    out = (ops.sub(ma, mb), ops.add(mc, md), ops.add(me, mf))
    if q_inf_mask is not None:
        out = select_point(ops, q_inf_mask, p, out)
    return out


# ---------------------------------------------------------------------------
# affine conversion
# ---------------------------------------------------------------------------

def to_affine(ops, p):
    """Batch projective -> affine: (x, y, inf_mask); identity -> (0, 0)."""
    X, Y, Z = p
    inf = is_infinity(ops, p)
    z_safe = ops.select(inf, ops.one(_batch_shape(X)), Z)
    zinv = ops.inv(z_safe)
    x = ops.mul(X, zinv)
    y = ops.mul(Y, zinv)
    zero = ops.zero(_batch_shape(X))
    return (ops.select(inf, zero, x), ops.select(inf, zero, y), inf)


def to_affine_fast(ops, p):
    """Batch projective -> affine via the O(n) two-level batched inverse
    (fields/fp.py batch_inv_rows) — the 2^24-scale path; identical
    semantics to ``to_affine``.  Flat [L, n] batches only."""
    X, Y, Z = p
    inf = is_infinity(ops, p)
    one = ops.one(_batch_shape(X))
    z_safe = ops.select(inf, one, Z)
    zinv = ops.binv(z_safe)
    x = ops.mul(X, zinv)
    y = ops.mul(Y, zinv)
    zero = ops.zero(_batch_shape(X))
    return (ops.select(inf, zero, x), ops.select(inf, zero, y), inf)


def normalize_z1(ops, p):
    """Rescale to Z=1 form (identity stays (0,1,0))."""
    x, y, inf = to_affine(ops, p)
    one = ops.one(_batch_shape(x))
    z = ops.select(inf, ops.zero(_batch_shape(x)), one)
    y = ops.select(inf, one, y)
    return (x, y, z)


# ---------------------------------------------------------------------------
# reductions and scalar multiplication
# ---------------------------------------------------------------------------

def tree_reduce(ops, p, axis_size: int):
    """Sum a batch of points along the last batch axis -> single point.

    Hillis-Steele suffix folding under one fori_loop (constant shapes):
    level l adds element j + 2^l into element j.  TPU-native replacement
    for Spark `reduce(GroupT::add)` (VariableBaseMSM.java:779-786).
    """
    import jax

    n = axis_size
    if n == 1:
        return _index_last(p, 0)
    levels = (n - 1).bit_length()
    iota = jnp.arange(n, dtype=jnp.int32)
    inf = infinity(ops, (n,))

    def body(l, q):
        d = jnp.left_shift(jnp.int32(1), l)
        idx = jnp.minimum(iota + d, n - 1)
        shifted = _map_coords(q, lambda c: c[..., idx])
        valid = iota + d < n
        shifted = select_point(ops, valid, shifted, inf)
        return add(ops, q, shifted)

    out = jax.lax.fori_loop(0, levels, body, p)
    return _index_last(out, 0)


def _index_last(p, i):
    return _map_coords(p, lambda c: c[..., i])


def scalar_bits(scalars_raw: jnp.ndarray, bit: int) -> jnp.ndarray:
    """Bit `bit` of each scalar; scalars_raw is uint32[L, ...] raw limbs."""
    from octopuszk_tpu.fields.spec import LIMB_BITS
    limb = bit // LIMB_BITS
    off = bit % LIMB_BITS
    return (scalars_raw[limb] >> jnp.uint32(off)) & jnp.uint32(1)


def scalar_mul(ops, p, scalars_raw, num_bits: int = 254):
    """[k_i] P_i elementwise over a batch (double-and-add, MSB first)."""
    import jax

    def body(i, acc):
        bit = num_bits - 1 - i
        acc = double(ops, acc)
        with_add = add(ops, acc, p)
        take = scalar_bits(scalars_raw, bit) == jnp.uint32(1)
        return select_point(ops, take, with_add, acc)

    init = taint_point(infinity(ops, _batch_shape(p[0])), p, scalars_raw)
    return jax.lax.fori_loop(0, num_bits, body, init)
