"""Generic vectorized Jacobian-coordinate curve arithmetic (a = 0 curves).

Works over any coordinate field presented as an ops namespace (Fp for G1,
Fp2 for G2), so one implementation serves both BN254 groups.  Points are
``(X, Y, Z)`` pytrees of Montgomery limb tensors; ``Z == 0`` encodes the
identity.  Everything is branchless (selects), shape-polymorphic in the
batch dims, and jit/vmap/shard_map friendly.

Formulas: standard public EFD Jacobian add/double for short Weierstrass
a=0 ("add-2007-bl", "dbl-2009-l", "madd-2007-bl").  Reference parity: the
roles of BNG1.java:38-117 / BNG2.java and the device EC arithmetic in
algebra_msm_VariableBaseMSM.cu:290-726 — re-designed as batched tensor
dataflow instead of per-thread bignum code.

BN254 has prime order in both G1 and G2(subgroup), so there are no points
with Y = 0 (no 2-torsion); dbl is total except at infinity, which the
formulas propagate automatically (Z3 = 2*Y*Z = 0).
"""

from __future__ import annotations

import types

import jax.numpy as jnp

from octopuszk_tpu.fields import fp, fp2
from octopuszk_tpu.fields.spec import FieldSpec


def make_fp_ops(spec: FieldSpec) -> types.SimpleNamespace:
    """Coordinate-field adapter for a base prime field (G1)."""
    return types.SimpleNamespace(
        spec=spec,
        group_name="G1",
        add=lambda a, b: fp.add(spec, a, b),
        sub=lambda a, b: fp.sub(spec, a, b),
        mul=lambda a, b: fp.mont_mul(spec, a, b),
        sqr=lambda a: fp.mont_sqr(spec, a),
        neg=lambda a: fp.neg(spec, a),
        dbl=lambda a: fp.add(spec, a, a),
        inv=lambda a: fp.inv(spec, a),
        is_zero=fp.is_zero,
        eq=fp.eq,
        select=fp.select,
        zero=lambda shape=(): fp.zeros_like_batch(shape),
        one=lambda shape=(): fp.constant(spec.one_mont_limbs, shape),
    )


def make_fp2_ops(spec: FieldSpec) -> types.SimpleNamespace:
    """Coordinate-field adapter for Fp2 (G2)."""
    return types.SimpleNamespace(
        spec=spec,
        group_name="G2",
        add=lambda a, b: fp2.add(spec, a, b),
        sub=lambda a, b: fp2.sub(spec, a, b),
        mul=lambda a, b: fp2.mul(spec, a, b),
        sqr=lambda a: fp2.sqr(spec, a),
        neg=lambda a: fp2.neg(spec, a),
        dbl=lambda a: fp2.double(spec, a),
        inv=lambda a: fp2.inv(spec, a),
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
    """The identity: (1, 1, 0)."""
    return (ops.one(batch_shape), ops.one(batch_shape), ops.zero(batch_shape))


def taint_point(p, *refs):
    """Merge shard_map varying-axes of refs into every coord of p
    (value-preserving; needed for loop-carry inits inside shard_map)."""
    from octopuszk_tpu.fields import fp as _fp

    z = None
    for ref in refs:
        c = ref
        while isinstance(c, tuple):
            c = c[0]
        zc = _fp.vma_zero(c)
        z = zc if z is None else (z ^ zc)
    return _map_coords(p, lambda c: c ^ z)


def is_infinity(ops, p):
    return ops.is_zero(p[2])


def select_point(ops, mask, p, q):
    """mask ? p : q, per batch element."""
    return tuple(ops.select(mask, a, b) for a, b in zip(p, q))


def negate(ops, p):
    return (p[0], ops.neg(p[1]), p[2])


# ---------------------------------------------------------------------------
# double / add
# ---------------------------------------------------------------------------

def _same_batch(p, q):
    a, b = p[0], q[0]
    while isinstance(a, tuple):
        a = a[0]
    while isinstance(b, tuple):
        b = b[0]
    return a.shape == b.shape


def _pallas_eligible(ops, p):
    """Use the fused Pallas kernel? (TPU backend, flat [L, n] batch, not
    already tracing inside a kernel.)"""
    from octopuszk_tpu.fields import fp as _fp
    if _fp.UNROLL:
        return False
    c = p[0]
    while isinstance(c, tuple):
        c = c[0]
    if c.ndim != 2 or c.shape[1] < 256:
        return False
    from octopuszk_tpu.ops import pallas_ops
    return pallas_ops.enabled()


def double(ops, p):
    """[2]P.  Total: identity propagates via Z3 = 2YZ = 0."""
    if _pallas_eligible(ops, p):
        from octopuszk_tpu.ops import pallas_ops
        return pallas_ops.double_points(ops.group_name, p)
    X, Y, Z = p
    A = ops.sqr(X)
    B = ops.sqr(Y)
    C = ops.sqr(B)
    t = ops.sqr(ops.add(X, B))
    D = ops.dbl(ops.sub(ops.sub(t, A), C))
    E = ops.add(ops.dbl(A), A)            # 3A  (a = 0)
    F = ops.sqr(E)
    X3 = ops.sub(F, ops.dbl(D))
    C8 = ops.dbl(ops.dbl(ops.dbl(C)))
    Y3 = ops.sub(ops.mul(E, ops.sub(D, X3)), C8)
    Z3 = ops.dbl(ops.mul(Y, Z))
    return (X3, Y3, Z3)


def add(ops, p, q):
    """P + Q, total: handles P=O, Q=O, P=Q (doubling), P=-Q (infinity)."""
    if _pallas_eligible(ops, p) and _same_batch(p, q):
        from octopuszk_tpu.ops import pallas_ops
        return pallas_ops.add_points(ops.group_name, p, q)
    X1, Y1, Z1 = p
    X2, Y2, Z2 = q
    Z1Z1 = ops.sqr(Z1)
    Z2Z2 = ops.sqr(Z2)
    U1 = ops.mul(X1, Z2Z2)
    U2 = ops.mul(X2, Z1Z1)
    S1 = ops.mul(ops.mul(Y1, Z2), Z2Z2)
    S2 = ops.mul(ops.mul(Y2, Z1), Z1Z1)
    H = ops.sub(U2, U1)
    rr = ops.dbl(ops.sub(S2, S1))
    # generic case
    I = ops.sqr(ops.dbl(H))
    J = ops.mul(H, I)
    V = ops.mul(U1, I)
    X3 = ops.sub(ops.sub(ops.sqr(rr), J), ops.dbl(V))
    Y3 = ops.sub(ops.mul(rr, ops.sub(V, X3)), ops.dbl(ops.mul(S1, J)))
    Z3 = ops.mul(ops.mul(H, Z1), Z2)
    Z3 = ops.dbl(Z3)
    out = (X3, Y3, Z3)
    # special cases
    h_zero = ops.is_zero(H)
    r_zero = ops.is_zero(rr)
    same_point = jnp.logical_and(h_zero, r_zero)      # P == Q  -> double
    opposite = jnp.logical_and(h_zero, jnp.logical_not(r_zero))  # P == -Q
    p_inf = is_infinity(ops, p)
    q_inf = is_infinity(ops, q)
    out = select_point(ops, same_point, double(ops, p), out)
    out = select_point(ops, opposite, infinity(ops, _batch_shape(X3)), out)
    out = select_point(ops, p_inf, q, out)
    out = select_point(ops, q_inf, p, out)
    return out


def mixed_add(ops, p, q_affine, q_inf_mask=None):
    """P (Jacobian) + Q (affine, Z=1): 7M + 4S "madd-2007-bl".

    ``q_affine`` is (x, y); ``q_inf_mask`` marks batch slots where Q is the
    identity (affine coords can't encode it).  Still total in P.
    """
    X1, Y1, Z1 = p
    X2, Y2 = q_affine
    Z1Z1 = ops.sqr(Z1)
    U2 = ops.mul(X2, Z1Z1)
    S2 = ops.mul(ops.mul(Y2, Z1), Z1Z1)
    H = ops.sub(U2, X1)
    rr = ops.dbl(ops.sub(S2, Y1))
    HH = ops.sqr(H)
    I = ops.dbl(ops.dbl(HH))
    J = ops.mul(H, I)
    V = ops.mul(X1, I)
    X3 = ops.sub(ops.sub(ops.sqr(rr), J), ops.dbl(V))
    Y3 = ops.sub(ops.mul(rr, ops.sub(V, X3)), ops.dbl(ops.mul(Y1, J)))
    Z3 = ops.sub(ops.sub(ops.sqr(ops.add(Z1, H)), Z1Z1), HH)
    out = (X3, Y3, Z3)
    h_zero = ops.is_zero(H)
    r_zero = ops.is_zero(rr)
    same_point = jnp.logical_and(h_zero, r_zero)
    opposite = jnp.logical_and(h_zero, jnp.logical_not(r_zero))
    p_inf = is_infinity(ops, p)
    q_jac = (X2, Y2, ops.one(_batch_shape(X2)))
    out = select_point(ops, same_point, double(ops, p), out)
    out = select_point(ops, opposite, infinity(ops, _batch_shape(X3)), out)
    out = select_point(ops, p_inf, q_jac, out)
    if q_inf_mask is not None:
        out = select_point(ops, q_inf_mask, p, out)
    return out


def _batch_shape(coord):
    """Batch shape of a coordinate (unwrap Fp2 pairs)."""
    while isinstance(coord, tuple):
        coord = coord[0]
    return coord.shape[1:]


# ---------------------------------------------------------------------------
# affine conversion
# ---------------------------------------------------------------------------

def to_affine(ops, p):
    """Batch Jacobian -> affine: (x, y, inf_mask); identity maps to (0, 0).

    Uses one Fermat inversion on Z after combining via is_infinity select
    (Z=0 slots inverted as 1 to stay well-defined).
    """
    X, Y, Z = p
    inf = is_infinity(ops, p)
    z_safe = ops.select(inf, ops.one(_batch_shape(X)), Z)
    zinv = ops.inv(z_safe)
    zinv2 = ops.sqr(zinv)
    zinv3 = ops.mul(zinv2, zinv)
    x = ops.mul(X, zinv2)
    y = ops.mul(Y, zinv3)
    zero = ops.zero(_batch_shape(X))
    x = ops.select(inf, zero, x)
    y = ops.select(inf, zero, y)
    return (x, y, inf)


def normalize_z1(ops, p):
    """Rescale to Z=1 Jacobian form (identity stays (1,1,0))."""
    x, y, inf = to_affine(ops, p)
    one = ops.one(_batch_shape(x))
    zero_z = ops.select(inf, ops.zero(_batch_shape(x)), one)
    x = ops.select(inf, one, x)
    y = ops.select(inf, one, y)
    return (x, y, zero_z)


# ---------------------------------------------------------------------------
# reductions and scalar multiplication
# ---------------------------------------------------------------------------

def tree_reduce(ops, p, axis_size: int):
    """Sum a batch of points along the last batch axis -> single point.

    Hillis-Steele suffix folding under one fori_loop (constant shapes, one
    small compiled graph): level l adds element j + 2^l into element j, so
    element 0 accumulates the total after ceil(log2 n) levels.  TPU-native
    replacement for Spark `reduce(GroupT::add)`
    (VariableBaseMSM.java:779-786).
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


def _map_coords(point, fn):
    return tuple(
        tuple(fn(c) for c in coord) if isinstance(coord, tuple) else fn(coord)
        for coord in point)


def _fold_halves(ops, p, half):
    lo = _map_coords(p, lambda c: c[..., :half])
    hi = _map_coords(p, lambda c: c[..., half:2 * half])
    return add(ops, lo, hi)


def _index_last(p, i):
    return _map_coords(p, lambda c: c[..., i])


def scalar_bits(scalars_raw: jnp.ndarray, bit: int) -> jnp.ndarray:
    """Bit `bit` of each scalar; scalars_raw is uint32[L, ...] raw limbs."""
    from octopuszk_tpu.fields.spec import LIMB_BITS
    limb = bit // LIMB_BITS
    off = bit % LIMB_BITS
    return (scalars_raw[limb] >> jnp.uint32(off)) & jnp.uint32(1)


def scalar_mul(ops, p, scalars_raw, num_bits: int = 254):
    """[k_i] P_i elementwise over a batch (double-and-add, MSB first).

    ``scalars_raw``: uint32[L, batch] raw (non-Montgomery) limbs.
    Rolled loop over bits so the compiled graph stays small.
    """
    import jax

    def body(i, acc):
        bit = num_bits - 1 - i
        acc = double(ops, acc)
        with_add = add(ops, acc, p)
        take = scalar_bits(scalars_raw, bit) == jnp.uint32(1)
        return select_point(ops, take, with_add, acc)

    init = taint_point(infinity(ops, _batch_shape(p[0])), p, scalars_raw)
    return jax.lax.fori_loop(0, num_bits, body, init)
