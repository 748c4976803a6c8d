"""Vectorized 254-bit prime-field arithmetic for TPU.

Representation
--------------
A batch of field elements is a ``uint32[L, ...]`` array: L = 16 little-endian
limbs of 16 bits each (axis 0), arbitrary batch shape after that.  Putting the
limb axis first keeps the batch axis minor-most, so XLA tiles it onto the
TPU's 128-wide vector lanes; all carry chains run across *rows* (sublanes)
and every op below is a pure elementwise dataflow graph that XLA fuses.

Elements are kept in **Montgomery form** (a*R mod p, R = 2**256) in canonical
range [0, p) with every limb < 2**16.  Multiplication is a lazy-carry CIOS:
limb products of 16-bit operands are exact in uint32, and per-limb
accumulators stay below 2**23 over the 16 rounds, so no 64-bit arithmetic is
ever needed — this is the TPU-native replacement for the reference's CGBN
`cgbn_mul` + `cgbn_rem` device math (algebra_msm_FixedBaseMSM.cu:36-78).

All functions are shape-polymorphic in the batch dims and jit/vmap/shard_map
friendly; the FieldSpec is closed over statically.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from octopuszk_tpu.fields.spec import FieldSpec, LIMB_BITS, LIMB_MASK, NUM_LIMBS

L = NUM_LIMBS
MASK = jnp.uint32(LIMB_MASK)
U32 = jnp.uint32


def _unstack(x):
    return [x[i] for i in range(x.shape[0])]


def _const_limbs(npvec) -> list:
    return [U32(int(v)) for v in npvec]


def zeros_like_batch(batch_shape) -> jnp.ndarray:
    return jnp.zeros((L,) + tuple(batch_shape), dtype=jnp.uint32)


def constant(spec_limbs: np.ndarray, batch_shape=()) -> jnp.ndarray:
    """Broadcast a host limb vector to a device [L, *batch] array."""
    c = jnp.asarray(spec_limbs.astype(np.uint32))
    return jnp.broadcast_to(c.reshape((L,) + (1,) * len(batch_shape)),
                            (L,) + tuple(batch_shape))


# ---------------------------------------------------------------------------
# add / sub / neg
# ---------------------------------------------------------------------------

def _carry_propagate(t):
    """Normalize list of limb accumulators (< 2**31 each) to 16-bit limbs.

    Returns (normalized list, carry_out).
    """
    out = []
    c = None
    for j in range(len(t)):
        s = t[j] if c is None else t[j] + c
        out.append(s & MASK)
        c = s >> LIMB_BITS
    return out, c


def _cond_sub_p(spec: FieldSpec, t, extra_ge=None):
    """If value(t) >= p subtract p; t is L normalized limbs. extra_ge forces."""
    p = _const_limbs(spec.p_limbs)
    d = []
    bor = U32(0)
    for j in range(L):
        x = t[j] + U32(1 << LIMB_BITS) - p[j] - bor
        d.append(x & MASK)
        bor = U32(1) - (x >> LIMB_BITS)
    ge = bor == U32(0)
    if extra_ge is not None:
        ge = jnp.logical_or(ge, extra_ge)
    return [jnp.where(ge, d[j], t[j]) for j in range(L)]


def add(spec: FieldSpec, a, b):
    """(a + b) mod p, canonical in/out."""
    ta, tb = _unstack(a), _unstack(b)
    t, carry = _carry_propagate([ta[j] + tb[j] for j in range(L)])
    # a, b < p < 2**254 so sum < 2**255: carry is always 0.
    del carry
    return jnp.stack(_cond_sub_p(spec, t))


def sub(spec: FieldSpec, a, b):
    """(a - b) mod p, canonical in/out."""
    ta, tb = _unstack(a), _unstack(b)
    d = []
    bor = U32(0)
    for j in range(L):
        x = ta[j] + U32(1 << LIMB_BITS) - tb[j] - bor
        d.append(x & MASK)
        bor = U32(1) - (x >> LIMB_BITS)
    # if borrow-out, add p back
    p = _const_limbs(spec.p_limbs)
    e = []
    c = U32(0)
    for j in range(L):
        s = d[j] + p[j] + c
        e.append(s & MASK)
        c = s >> LIMB_BITS
    neg_flag = bor != U32(0)
    return jnp.stack([jnp.where(neg_flag, e[j], d[j]) for j in range(L)])


def neg(spec: FieldSpec, a):
    """(-a) mod p."""
    ta = _unstack(a)
    p = _const_limbs(spec.p_limbs)
    d = []
    bor = U32(0)
    for j in range(L):
        x = p[j] + U32(1 << LIMB_BITS) - ta[j] - bor
        d.append(x & MASK)
        bor = U32(1) - (x >> LIMB_BITS)
    z = is_zero(a)
    return jnp.stack([jnp.where(z, U32(0), d[j]) for j in range(L)])


def double(spec: FieldSpec, a):
    return add(spec, a, a)


# ---------------------------------------------------------------------------
# Montgomery multiplication (lazy-carry CIOS)
# ---------------------------------------------------------------------------

def mont_mul(spec: FieldSpec, a, b):
    """(a * b * R^-1) mod p. Inputs/outputs canonical Montgomery-form limbs."""
    ta, tb = _unstack(a), _unstack(b)
    return jnp.stack(_mont_mul_limbs(spec, ta, tb))


def _mont_mul_limbs(spec: FieldSpec, ta, tb):
    """CIOS rounds vectorized over the limb axis: each of the L rounds is
    ~14 tensor ops on [L, ...] arrays (instead of 16 unrolled scalar rows),
    keeping compiled graphs small.  Per-limb accumulators stay < 2**23 as
    in the scalar analysis, so uint32 never overflows."""
    a = jnp.stack(ta)                              # [L, ...]
    b = jnp.stack(tb)
    bshape = (1,) * (a.ndim - 1)
    p = jnp.asarray(spec.p_limbs.astype(np.uint32)).reshape((L,) + bshape)
    n0inv = U32(spec.n0inv)
    t = jnp.zeros((L + 1,) + a.shape[1:], dtype=jnp.uint32)
    for i in range(L):
        prod = a[i][None] * b                      # [L, ...], exact in u32
        t = t.at[:L].add(prod & MASK)
        t = t.at[1:].add(prod >> LIMB_BITS)
        # m = t[0] * -p^-1 mod 2**16 (u32 wraparound keeps mod-2**16 exact)
        m = (t[0] * n0inv) & MASK
        prod2 = m[None] * p
        t = t.at[:L].add(prod2 & MASK)
        t = t.at[1:].add(prod2 >> LIMB_BITS)
        # t[0] now divisible by 2**16: shift down one limb
        carry = t[0] >> LIMB_BITS
        t = jnp.concatenate([t[1:], jnp.zeros_like(t[:1])], axis=0)
        t = t.at[0].add(carry)
    t, carry_out = _carry_propagate([t[j] for j in range(L)])
    # value < 2p < 2**255 so the 17th limb (carry_out) is always 0.
    del carry_out
    return _cond_sub_p(spec, t)


def mont_sqr(spec: FieldSpec, a):
    return mont_mul(spec, a, a)


def to_mont(spec: FieldSpec, x):
    """Raw residue -> Montgomery form."""
    return mont_mul(spec, x, constant(spec.r2_limbs, x.shape[1:]))


def from_mont(spec: FieldSpec, a):
    """Montgomery form -> raw residue (multiply by 1)."""
    one = jnp.zeros_like(a).at[0].set(U32(1))
    return mont_mul(spec, a, one)


# ---------------------------------------------------------------------------
# predicates / selects
# ---------------------------------------------------------------------------

def is_zero(a):
    t = _unstack(a)
    acc = t[0]
    for j in range(1, L):
        acc = acc | t[j]
    return acc == U32(0)


def eq(a, b):
    ta, tb = _unstack(a), _unstack(b)
    acc = ta[0] ^ tb[0]
    for j in range(1, L):
        acc = acc | (ta[j] ^ tb[j])
    return acc == U32(0)


def select(mask, a, b):
    """mask ? a : b with mask shaped like the batch dims."""
    return jnp.where(mask, a, b)


# ---------------------------------------------------------------------------
# inversion
# ---------------------------------------------------------------------------

def pow_const(spec: FieldSpec, a, e: int):
    """a**e for a host-known exponent, as a rolled fori_loop (MSB-first).

    One square + one (selected) multiply per exponent bit — small compiled
    graph, intended for moderate batch sizes.
    """
    bits = bin(e)[2:]
    nbits = len(bits)
    bitvec = jnp.asarray(np.array([int(c) for c in bits], dtype=np.uint32))
    one = constant(spec.one_mont_limbs, a.shape[1:])

    def body(i, acc):
        acc = mont_sqr(spec, acc)
        with_mul = mont_mul(spec, acc, a)
        return jnp.where(bitvec[i] == U32(1), with_mul, acc)

    return jax.lax.fori_loop(0, nbits, body, one)


def inv(spec: FieldSpec, a):
    """a^(p-2): vectorized Fermat inversion. inv(0) = 0."""
    return pow_const(spec, a, spec.p_minus_2)


def batch_inv(spec: FieldSpec, a, axis: int = 1):
    """Elementwise inverse of a batch via parallel prefix/suffix products.

    Cost ~ 2 associative scans (O(n log n) muls, log-depth) + one Fermat
    inversion of the total product.  All inputs must be nonzero.
    Replaces the reference's sequential Montgomery-trick loops.
    """
    def mul_fn(x, y):
        return mont_mul(spec, x, y)

    incl = jax.lax.associative_scan(mul_fn, a, axis=axis)          # prefix incl
    sufx = jax.lax.associative_scan(mul_fn, a, axis=axis, reverse=True)
    n = a.shape[axis]
    one = constant(spec.one_mont_limbs, ())
    # exclusive prefix: shift right along `axis`
    def shift(x, rev):
        pad = [(0, 0)] * x.ndim
        sl = [slice(None)] * x.ndim
        if rev:
            pad[axis] = (0, 1)
            sl[axis] = slice(1, None)
        else:
            pad[axis] = (1, 0)
            sl[axis] = slice(0, n - 1)
        shape = list(x.shape)
        shape[axis] = 1
        filler = jnp.broadcast_to(one.reshape((L,) + (1,) * (x.ndim - 1)), shape)
        return jax.lax.concatenate(
            [filler, x[tuple(sl)]] if not rev else [x[tuple(sl)], filler], axis)
    excl_pre = shift(incl, rev=False)
    excl_suf = shift(sufx, rev=True)
    total = jax.lax.index_in_dim(incl, n - 1, axis=axis, keepdims=True)
    inv_total = inv(spec, total)
    out = mont_mul(spec, excl_pre, excl_suf)
    return mont_mul(spec, out, inv_total)


# ---------------------------------------------------------------------------
# wide reduction (values wider than 256 bits -> canonical)
# ---------------------------------------------------------------------------

def from_wide(spec: FieldSpec, wide, out_mont: bool):
    """Reduce uint32[W, ...] (W >= L, limbs < 2**28) to canonical 16 limbs.

    Interprets the input as a little-endian base-2**16 integer X (limbs may
    exceed 16 bits up to 2**28 — e.g. raw segment sums).  Returns X mod p,
    either as a raw residue (out_mont=False) or re-scaled into Montgomery
    form (out_mont=True, for when X was itself a sum of Montgomery values).

    Used for: uniform sampling from 512 random bits, and normalizing sparse
    matvec accumulations (the role of reduceByKey in R1CStoQAPRDD.java).
    """
    t = _unstack(wide)
    t, carry = _carry_propagate(t)
    t = t + [carry]
    W = len(t)
    n0inv = U32(spec.n0inv)
    # REDC passes: each divides by 2**16 mod p and drops one limb of headroom
    k = max(W - 14, 0)
    tv = jnp.stack(t + [jnp.zeros_like(t[0])])     # [W+1, ...]
    bshape = (1,) * (tv.ndim - 1)
    p = jnp.asarray(spec.p_limbs.astype(np.uint32)).reshape((L,) + bshape)
    for _ in range(k):
        m = (tv[0] * n0inv) & MASK
        prod = m[None] * p
        tv = tv.at[:L].add(prod & MASK)
        tv = tv.at[1:L + 1].add(prod >> LIMB_BITS)
        carry = tv[0] >> LIMB_BITS
        tv = jnp.concatenate([tv[1:], jnp.zeros_like(tv[:1])], axis=0)
        tv = tv.at[0].add(carry)
    t, carry = _carry_propagate([tv[j] for j in range(W)])
    t = (t + [carry])[:L + 1]
    # value now < 2p: fold the (tiny) 17th limb via one conditional subtract
    hi = t[L] if len(t) > L else zero
    res = _cond_sub_p(spec, t[:L], extra_ge=hi != U32(0))
    # correct the 2**(-16k) scale factor introduced by the extra passes
    fix = constant(spec.wide_fixup_limbs(k, out_mont), wide.shape[1:])
    return mont_mul(spec, jnp.stack(res), fix)
