"""Vectorized 254-bit prime-field arithmetic for TPU.

Representation
--------------
A batch of field elements is a ``uint32[L, ...]`` array: L = 16 little-endian
limbs of 16 bits each (axis 0), arbitrary batch shape after that.  Putting the
limb axis first keeps the batch axis minor-most, so XLA tiles it onto the
TPU's 128-wide vector lanes.

Elements are kept in **Montgomery form** (a*R mod p, R = 2**256) in canonical
range [0, p) with every limb < 2**16.  Multiplication is CIOS with 16-bit
limb products exact in uint32 — the TPU-native replacement for the
reference's CGBN ``cgbn_mul`` + ``cgbn_rem`` device math
(algebra_msm_FixedBaseMSM.cu:36-78).

Graph-size discipline: carry/borrow chains use a Kogge-Stone parallel
prefix over the limb axis (4 steps, no 16-deep serial chain), and the CIOS
rounds run under ``lax.fori_loop`` — every public op compiles to a small
constant-size graph regardless of batch shape, which keeps XLA compile
times sane for the large compositions in the curve/MSM/NTT layers.

All functions are shape-polymorphic in the batch dims and jit/vmap/
shard_map friendly; the FieldSpec is closed over statically.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from octopuszk_tpu.fields.spec import FieldSpec, LIMB_BITS, LIMB_MASK, NUM_LIMBS

L = NUM_LIMBS
# numpy scalars (not jnp): they fold into jaxprs as literals, which keeps
# them legal inside Pallas kernel traces (device-array constants are not).
MASK = np.uint32(LIMB_MASK)
U32 = np.uint32
ONE = np.uint32(1)
ZERO = np.uint32(0)

# When True (inside a Pallas kernel trace, see ops/pallas_ops.py), limb
# constants are built from scalar literals instead of numpy arrays —
# Pallas kernels may not capture array constants.
UNROLL = False


def zeros_like_batch(batch_shape) -> jnp.ndarray:
    return jnp.zeros((L,) + tuple(batch_shape), dtype=jnp.uint32)


def _literal_limbs(vals, trailing_shape) -> jnp.ndarray:
    rows = [jnp.full((1,) + tuple(trailing_shape), int(v), dtype=jnp.uint32)
            for v in vals]
    return jnp.concatenate(rows, axis=0)


def constant(spec_limbs: np.ndarray, batch_shape=()) -> jnp.ndarray:
    """Broadcast a host limb vector to a device [L, *batch] array."""
    if UNROLL:
        # build at full rank/shape from scalar literals: Mosaic rejects
        # captured array constants and chokes on some broadcast patterns
        return _literal_limbs(spec_limbs, tuple(batch_shape))
    c = jnp.asarray(spec_limbs.astype(np.uint32))
    return jnp.broadcast_to(c.reshape((L,) + (1,) * len(batch_shape)),
                            (L,) + tuple(batch_shape))


def _p_col(spec: FieldSpec, ref) -> jnp.ndarray:
    """Modulus limbs shaped [L, 1, ...] to broadcast against ref [L, ...]."""
    if UNROLL:
        return _literal_limbs(spec.p_limbs, (1,) * (ref.ndim - 1))
    return jnp.asarray(spec.p_limbs.astype(np.uint32)).reshape(
        (L,) + (1,) * (ref.ndim - 1))


# ---------------------------------------------------------------------------
# Kogge-Stone carry / borrow propagation over the limb axis
# ---------------------------------------------------------------------------

def vma_zero(ref):
    """A scalar zero carrying ref's varying-manual-axes (shard_map vma).

    XOR-ing a loop-carry init with this makes its vma match loop bodies
    that depend on sharded data — required by scan/fori inside shard_map.
    """
    z = jax.lax.slice(ref, (0,) * ref.ndim, (1,) * ref.ndim)
    return jnp.reshape(z ^ z, ())


def taint(x, ref):
    """Value-preserving vma merge: x ^ vma_zero(ref)."""
    return x ^ vma_zero(ref)


def _at(x, i: int):
    """x[i] on the limb axis as a static slice (Mosaic rejects the
    dynamic_slice that integer indexing lowers to).

    NOTE: rank-reducing; measured ~7x slower than a rank-preserving
    ``_row`` slice inside Mosaic kernels — avoid in hot paths.
    """
    if i < 0:
        i += x.shape[0]
    return jnp.squeeze(jax.lax.slice_in_dim(x, i, i + 1, axis=0), axis=0)


def _row(x, i: int):
    """x[i:i+1] on the limb axis (keeps the leading axis)."""
    if i < 0:
        i += x.shape[0]
    return jax.lax.slice_in_dim(x, i, i + 1, axis=0)


def _shift_down(x, d, fill):
    """Shift limb axis towards higher indices by d, filling with `fill`."""
    pad = jnp.full((d,) + x.shape[1:], fill, dtype=x.dtype)
    return jnp.concatenate([pad, x[:-d]], axis=0)


def _ks_carry_in(g, p):
    """Carry into each limb given per-limb generate g and propagate p.

    g, p: uint32[W, ...] in {0,1}.  Returns uint32[W, ...] c with
    c[j] = carry out of limbs [0..j-1] rippled into j (c[0] = 0).
    Kogge-Stone inclusive scan of (g, p) then shift down by one.
    """
    W = g.shape[0]
    d = 1
    while d < W:
        gs = _shift_down(g, d, ZERO)
        ps = _shift_down(p, d, ONE)
        g = g | (p & gs)
        p = p & ps
        d *= 2
    return _shift_down(g, 1, ZERO)


def _resolve_add(s):
    """Normalize limb sums s[j] < 2**17 - 1 to 16-bit with KS carries.

    Returns (limbs, carry_out) where carry_out is uint32[1, ...] in {0,1}
    (rank-preserving: Mosaic lowers rank-reducing extracts ~7x slower).
    """
    g = s >> LIMB_BITS                      # generate: sum >= 2**16
    p = ((s & MASK) == MASK).astype(jnp.uint32)  # propagate: low == 0xffff
    c = _ks_carry_in(g, p)
    out = (s + c) & MASK
    top = _row(s, -1) + _row(c, -1)
    return out, top >> LIMB_BITS


def _resolve_sub(d):
    """Normalize limb diffs d[j] = a_j + 2**16 - b_j (in [1, 2**17-1])
    to 16-bit with KS borrows.  Returns (limbs, borrow_out in {0,1},
    shape [1, ...])."""
    g = (ONE - (d >> LIMB_BITS))            # borrow generate: d < 2**16
    p = ((d & MASK) == ZERO).astype(jnp.uint32)  # propagate: d == 2**16
    b = _ks_carry_in(g, p)
    out = (d - b) & MASK
    top = _row(d, -1) - _row(b, -1)
    return out, ONE - (top >> LIMB_BITS)


def _cond_sub_p(spec: FieldSpec, t, extra_ge=None):
    """If value(t) >= p subtract p; t is [L, ...] canonical 16-bit limbs."""
    p = _p_col(spec, t)
    d, borrow = _resolve_sub(t + (ONE << LIMB_BITS) - p)
    ge = borrow == ZERO
    if extra_ge is not None:
        ge = jnp.logical_or(ge, extra_ge)
    return jnp.where(ge, d, t)


# ---------------------------------------------------------------------------
# add / sub / neg
# ---------------------------------------------------------------------------

def add(spec: FieldSpec, a, b):
    """(a + b) mod p, canonical in/out."""
    s, carry = _resolve_add(a + b)
    # a, b < p < 2**254 so sum < 2**255: carry is always 0.
    del carry
    return _cond_sub_p(spec, s)


def sub(spec: FieldSpec, a, b):
    """(a - b) mod p, canonical in/out."""
    d, borrow = _resolve_sub(a + (ONE << LIMB_BITS) - b)
    # if borrowed, add p back
    p = _p_col(spec, d)
    e, _ = _resolve_add(d + p)
    return jnp.where(borrow != ZERO, e, d)


def neg(spec: FieldSpec, a):
    """(-a) mod p."""
    p = _p_col(spec, a)
    d, _ = _resolve_sub(p + (ONE << LIMB_BITS) - a)
    return jnp.where(is_zero(a), jnp.zeros_like(a), d)


def double(spec: FieldSpec, a):
    return add(spec, a, a)


def mul_small(spec: FieldSpec, a, k: int):
    """k * a for a small host-known integer k (|k| <= ~64) by a
    double-and-add chain — cheaper than a full Montgomery multiply."""
    if k == 0:
        return jnp.zeros_like(a)
    neg_k = k < 0
    k = abs(k)
    acc = None
    run = a
    while k:
        if k & 1:
            acc = run if acc is None else add(spec, acc, run)
        k >>= 1
        if k:
            run = add(spec, run, run)
    return neg(spec, acc) if neg_k else acc


# ---------------------------------------------------------------------------
# Montgomery multiplication (CIOS, rolled over rounds)
# ---------------------------------------------------------------------------

def mont_mul(spec: FieldSpec, a, b):
    """(a * b * R^-1) mod p. Inputs/outputs canonical Montgomery-form limbs.

    Per-limb accumulators stay < 2**23 over the 16 rounds (sums of two
    16x16-bit product halves per round plus a < 2**7 shift carry), so
    uint32 never overflows and no 64-bit math is needed.

    The a_i*b and m*p partial products of each round are SUMMED before
    accumulation (their lo/hi halves each fit u32 with headroom), so the
    round does two 17-limb accumulate-adds instead of four — ~20% fewer
    vector-ALU ops in the Pallas scan kernels where this is the hot loop.
    ``m`` comes from t[0] + the limb-0 product directly (the mod-2^16
    value is unchanged by deferring the accumulation).
    """
    a, b = jnp.broadcast_arrays(a, b)
    p = _p_col(spec, a)
    n0inv = U32(spec.n0inv)
    # derive zeros from both inputs so their shard_map vma matches the body
    zrow = (_row(a, 0) ^ _row(a, 0)) | (_row(b, 0) ^ _row(b, 0))
    t0 = jnp.concatenate([zrow] * (L + 1), axis=0)

    def round_core(ai_row, t):
        prod_ab = ai_row * b                       # exact in u32
        # m = (T mod 2^16) * n0inv mod 2^16 with T = t[0] + (a_i b)[0];
        # u32 wraparound of the sum preserves the low 16 bits
        m = (((_row(t, 0) + _row(prod_ab, 0)) & MASK) * n0inv) & MASK
        prod_mp = m * p
        lo = (prod_ab & MASK) + (prod_mp & MASK)             # < 2^17
        hi = (prod_ab >> LIMB_BITS) + (prod_mp >> LIMB_BITS)  # < 2^17
        t = t + jnp.concatenate([lo, zrow], axis=0)
        t = t + jnp.concatenate([zrow, hi], axis=0)
        carry = _row(t, 0) >> LIMB_BITS
        t = jnp.concatenate([t[1:], zrow], axis=0)
        return jnp.concatenate([_row(t, 0) + carry, t[1:]], axis=0)

    if UNROLL:
        t = t0
        for i in range(L):
            t = round_core(_row(a, i), t)
    else:
        t = jax.lax.fori_loop(
            0, L, lambda i, t: round_core(a[i][None], t), t0)
    # t[:L] limbs < 2**23; t[L] < 2**7. Resolve carries then reduce.
    s, carry = _resolve_wide(t)
    del carry  # value < 2p < 2**255: 17th limb is in s[-1], handled below
    return _cond_sub_p(spec, s[:L], extra_ge=_row(s, L) != ZERO)


def _resolve_wide(t):
    """Carry-normalize limbs t[j] < 2**31 to 16-bit (KS with multi-bit
    carries): first fold high parts downward once, then KS on {0,1}."""
    lo = t & MASK
    hi = t >> LIMB_BITS                      # < 2**15
    s = lo + _shift_down(hi, 1, ZERO)        # < 2**17 - 1
    out, carry = _resolve_add(s)
    # the top hi limb would spill past the array; callers size t so that
    # t[-1] >> 16 == 0 (documented invariant).
    return out, carry


def mont_sqr(spec: FieldSpec, a):
    return mont_mul(spec, a, a)


def to_mont(spec: FieldSpec, x):
    """Raw residue -> Montgomery form."""
    return mont_mul(spec, x, constant(spec.r2_limbs, x.shape[1:]))


def from_mont(spec: FieldSpec, a):
    """Montgomery form -> raw residue (multiply by 1)."""
    one = jnp.zeros_like(a).at[0].set(ONE)
    return mont_mul(spec, a, one)


# ---------------------------------------------------------------------------
# predicates / selects
# ---------------------------------------------------------------------------

def is_zero(a):
    return jnp.all(a == ZERO, axis=0)


def eq(a, b):
    return jnp.all(a == b, axis=0)


def select(mask, a, b):
    """mask ? a : b with mask shaped like the batch dims."""
    return jnp.where(mask, a, b)


# ---------------------------------------------------------------------------
# inversion / exponentiation
# ---------------------------------------------------------------------------

def pow_const(spec: FieldSpec, a, e: int):
    """a**e for a host-known exponent, as a rolled fori_loop (MSB-first)."""
    bits = bin(e)[2:]
    nbits = len(bits)
    bitvec = jnp.asarray(np.array([int(c) for c in bits], dtype=np.uint32))
    one = taint(constant(spec.one_mont_limbs, a.shape[1:]), a)

    def body(i, acc):
        acc = mont_sqr(spec, acc)
        with_mul = mont_mul(spec, acc, a)
        return jnp.where(bitvec[i] == ONE, with_mul, acc)

    return jax.lax.fori_loop(0, nbits, body, one)


def inv(spec: FieldSpec, a):
    """a^(p-2): vectorized Fermat inversion. inv(0) = 0."""
    return pow_const(spec, a, spec.p_minus_2)


def batch_inv(spec: FieldSpec, a, axis: int = 1):
    """Elementwise inverse of a batch via Hillis-Steele prefix/suffix
    products + one Fermat inversion.  All inputs must be nonzero.
    Replaces the reference's sequential Montgomery-trick loops."""
    n = a.shape[axis]
    one_col = constant(spec.one_mont_limbs, ())

    def scan_products(x, reverse):
        steps = max(0, (n - 1)).bit_length()

        def body(i, acc):
            d = 1 << i
            pad_shape = list(acc.shape)
            pad_shape[axis] = min(d, n)
            fill = jnp.broadcast_to(
                one_col.reshape((L,) + (1,) * (acc.ndim - 1)), pad_shape)
            idx = [slice(None)] * acc.ndim
            idx[axis] = slice(None, n - d) if not reverse else slice(d, None)
            sl = acc[tuple(idx)]
            shifted = jnp.concatenate(
                [fill, sl] if not reverse else [sl, fill], axis=axis)
            return mont_mul(spec, acc, shifted)

        acc = x
        for i in range(steps):       # log n python loop, tiny body count
            acc = body(i, acc)
        return acc

    incl = scan_products(a, reverse=False)
    sufx = scan_products(a, reverse=True)

    def shiftx(x, rev):
        pad_shape = list(x.shape)
        pad_shape[axis] = 1
        fill = jnp.broadcast_to(
            one_col.reshape((L,) + (1,) * (x.ndim - 1)), pad_shape)
        idx = [slice(None)] * x.ndim
        idx[axis] = slice(0, n - 1) if not rev else slice(1, None)
        sl = x[tuple(idx)]
        return jnp.concatenate([fill, sl] if not rev else [sl, fill],
                               axis=axis)

    excl_pre = shiftx(incl, rev=False)
    excl_suf = shiftx(sufx, rev=True)
    total = jax.lax.index_in_dim(incl, n - 1, axis=axis, keepdims=True)
    inv_total = inv(spec, total)
    out = mont_mul(spec, excl_pre, excl_suf)
    return mont_mul(spec, out, inv_total)


def batch_inv_rows(spec: FieldSpec, a, lanes: int = 4096):
    """Elementwise inverse of a flat [L, n] batch in O(n) multiplies.

    Two-level Montgomery trick: lane-parallel serial prefix products down
    ``rows = n/lanes`` steps, ONE vectorized Fermat inversion of the lane
    totals, then a backward sweep emitting inverses — ~4 multiplies per
    element total, vs ~2 log n for the Hillis-Steele ``batch_inv`` (use
    that one for small/odd batches).  Zero inputs are mapped through as
    inv(0)=0 (the identity-safe convention callers rely on).

    Role: the batched-inversion feeding affine conversion before large
    MSMs (the reference normalizes on the Java side; here it must be
    device-resident at 2^24 scale).
    """
    n = a.shape[-1]
    lanes = min(lanes, n)
    rows = -(-n // lanes)
    m = rows * lanes
    one = constant(spec.one_mont_limbs, ())
    zmask = is_zero(a)
    a_safe = jnp.where(zmask, jnp.broadcast_to(
        one.reshape((L,) + (1,) * (a.ndim - 1)), a.shape), a)
    if m != n:
        pad = jnp.broadcast_to(one.reshape((L, 1)), (L, m - n))
        a_safe = jnp.concatenate([a_safe, pad], axis=-1)
    # sorted-position layout: lane l owns positions [l*rows, (l+1)*rows)
    xr = jnp.moveaxis(a_safe.reshape(L, lanes, rows), -1, 0)  # [rows, L, lanes]

    def fwd(carry, row):
        nxt = mont_mul(spec, carry, row)
        return nxt, carry            # emit EXCLUSIVE prefix

    carry0 = taint(constant(spec.one_mont_limbs, (lanes,)), a_safe)
    totals, excl = jax.lax.scan(fwd, carry0, xr)
    tinv = inv(spec, totals)         # one Fermat pass over [L, lanes]

    def bwd(carry, xs):
        row, ex = xs
        out = mont_mul(spec, carry, ex)
        return mont_mul(spec, carry, row), out

    _, invs = jax.lax.scan(bwd, tinv, (xr, excl), reverse=True)
    flat = jnp.moveaxis(invs, 0, -1).reshape(L, m)[:, :n]
    return jnp.where(zmask, jnp.zeros_like(a), flat)


# ---------------------------------------------------------------------------
# wide reduction (values wider than 256 bits -> canonical)
# ---------------------------------------------------------------------------

def from_wide(spec: FieldSpec, wide, out_mont: bool):
    """Reduce uint32[W, ...] (W >= L, limbs < 2**31) to canonical 16 limbs.

    Interprets the input as a little-endian base-2**16 integer X (limbs may
    exceed 16 bits — e.g. raw segment sums).  Returns X mod p (out_mont=
    False), or (X * R) mod p (out_mont=True — i.e. treat X as a raw
    integer and produce its Montgomery form).

    NOTE: a sum of Montgomery-form values is *already* Montgomery-scaled;
    reduce it with out_mont=False (see reduce_sum_mont).
    """
    W = wide.shape[0]
    zrow = _row(wide, 0) ^ _row(wide, 0)
    # fold multi-bit carries: limbs < 2**31 -> hi < 2**15 folded upward
    lo = wide & MASK
    hi = wide >> LIMB_BITS
    t = jnp.concatenate([lo, zrow], axis=0)
    t = t + jnp.concatenate([zrow, hi], axis=0)   # limbs < 2**17 - 1
    s, carry = _resolve_add(t)
    del carry                                # t sized with headroom above
    W1 = W + 1
    t = jnp.concatenate([s, zrow], axis=0)
    n0inv = U32(spec.n0inv)
    p = _p_col(spec, t)
    k = max(W1 - 14, 0)
    zpad = jnp.concatenate([zrow] * (t.shape[0] - L - 1), axis=0)

    def redc(i, t):
        m = (_row(t, 0) * n0inv) & MASK
        prod = m * p                        # [L, ...]
        t = t + jnp.concatenate([prod & MASK, zrow, zpad], axis=0)
        t = t + jnp.concatenate([zrow, prod >> LIMB_BITS, zpad], axis=0)
        carry = _row(t, 0) >> LIMB_BITS
        t = jnp.concatenate([t[1:], zrow], axis=0)
        return jnp.concatenate([_row(t, 0) + carry, t[1:]], axis=0)

    t = jax.lax.fori_loop(0, k, redc, t)
    s, carry = _resolve_wide(t[:W1])
    del carry
    s = s[:L + 1]
    res = _cond_sub_p(spec, s[:L], extra_ge=_row(s, L) != ZERO)
    # correct the 2**(-16k) scale factor introduced by the extra passes
    fix = constant(spec.wide_fixup_limbs(k, out_mont), wide.shape[1:])
    return mont_mul(spec, res, fix)


def reduce_sum_mont(spec: FieldSpec, wide):
    """Canonicalize a wide uint32 sum of Montgomery-form values.

    The integer sum of Montgomery values is itself Montgomery-scaled, so
    this is just ``X mod p`` — the exact-sum path used by sparse matvec
    segment sums (the role of reduceByKey in R1CStoQAPRDD.java).
    """
    return from_wide(spec, wide, out_mont=False)
