"""Vectorized Fp2 = Fp[u]/(u^2 + 1) arithmetic over limb tensors.

An Fp2 batch is a pair ``(c0, c1)`` of ``uint32[L, ...]`` Montgomery limb
arrays (see fields/fp.py).  The non-residue is -1, so
``(a0 + a1 u)(b0 + b1 u) = (a0 b0 - a1 b1) + (a0 b1 + a1 b0) u`` and
Karatsuba saves one of the four base multiplications.

Reference parity: algebra/fields/Fp2.java and the device Fp2 helpers in
the reference CUDA (algebra_msm_VariableBaseMSM.cu:148-253) — re-designed
as batched elementwise limb tensors rather than per-thread bignum registers.
"""

from __future__ import annotations

from octopuszk_tpu.fields import fp
from octopuszk_tpu.fields.spec import FieldSpec


def add(spec: FieldSpec, a, b):
    return (fp.add(spec, a[0], b[0]), fp.add(spec, a[1], b[1]))


def sub(spec: FieldSpec, a, b):
    return (fp.sub(spec, a[0], b[0]), fp.sub(spec, a[1], b[1]))


def neg(spec: FieldSpec, a):
    return (fp.neg(spec, a[0]), fp.neg(spec, a[1]))


def double(spec: FieldSpec, a):
    return (fp.add(spec, a[0], a[0]), fp.add(spec, a[1], a[1]))


def mul(spec: FieldSpec, a, b):
    # Karatsuba: 3 base muls
    t0 = fp.mont_mul(spec, a[0], b[0])
    t1 = fp.mont_mul(spec, a[1], b[1])
    s = fp.mont_mul(spec, fp.add(spec, a[0], a[1]), fp.add(spec, b[0], b[1]))
    c0 = fp.sub(spec, t0, t1)
    c1 = fp.sub(spec, fp.sub(spec, s, t0), t1)
    return (c0, c1)


def sqr(spec: FieldSpec, a):
    # (a0+a1)(a0-a1) + 2 a0 a1 u: 2 base muls
    t = fp.mont_mul(spec, fp.add(spec, a[0], a[1]), fp.sub(spec, a[0], a[1]))
    c1 = fp.mont_mul(spec, a[0], a[1])
    return (t, fp.add(spec, c1, c1))


def mul_fp(spec: FieldSpec, a, k):
    """Multiply Fp2 batch by an Fp batch/constant (limb array)."""
    return (fp.mont_mul(spec, a[0], k), fp.mont_mul(spec, a[1], k))


def conj(spec: FieldSpec, a):
    return (a[0], fp.neg(spec, a[1]))


def inv(spec: FieldSpec, a):
    """1 / (a0 + a1 u) = (a0 - a1 u) / (a0^2 + a1^2)."""
    n = fp.add(spec, fp.mont_sqr(spec, a[0]), fp.mont_sqr(spec, a[1]))
    d = fp.inv(spec, n)
    return (fp.mont_mul(spec, a[0], d),
            fp.neg(spec, fp.mont_mul(spec, a[1], d)))


def batch_inv_rows(spec: FieldSpec, a, lanes: int = 4096):
    """Elementwise Fp2 inverse of a flat batch in O(n) base multiplies
    (norm trick over fp.batch_inv_rows).  inv(0) = 0."""
    n = fp.add(spec, fp.mont_sqr(spec, a[0]), fp.mont_sqr(spec, a[1]))
    d = fp.batch_inv_rows(spec, n, lanes)
    return (fp.mont_mul(spec, a[0], d),
            fp.neg(spec, fp.mont_mul(spec, a[1], d)))


def is_zero(a):
    import jax.numpy as jnp
    return jnp.logical_and(fp.is_zero(a[0]), fp.is_zero(a[1]))


def eq(a, b):
    import jax.numpy as jnp
    return jnp.logical_and(fp.eq(a[0], b[0]), fp.eq(a[1], b[1]))


def select(mask, a, b):
    return (fp.select(mask, a[0], b[0]), fp.select(mask, a[1], b[1]))
