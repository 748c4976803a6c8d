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


def _mul3(spec, triples):
    """Three independent base muls as ONE batched mont_mul (concat along
    the batch axis): a single rolled CIOS while-loop compiles ~3x faster
    than three and amortizes loop overhead on TPU."""
    import jax.numpy as jnp

    shapes = [x.shape for pair in triples for x in pair]
    shape = jnp.broadcast_shapes(*shapes)
    if len(shape) == 1:          # [L] scalars: add a batch axis
        ls = [jnp.broadcast_to(x, shape)[:, None] for x, _ in triples]
        rs = [jnp.broadcast_to(y, shape)[:, None] for _, y in triples]
    else:
        ls = [jnp.broadcast_to(x, shape) for x, _ in triples]
        rs = [jnp.broadcast_to(y, shape) for _, y in triples]
    n = ls[0].shape[-1]
    prod = fp.mont_mul(spec, jnp.concatenate(ls, axis=-1),
                       jnp.concatenate(rs, axis=-1))
    outs = [prod[..., i * n:(i + 1) * n] for i in range(len(triples))]
    if len(shape) == 1:
        outs = [o[..., 0] for o in outs]
    return outs


def mul(spec: FieldSpec, a, b, nr: int = -1):
    """(a0 + a1 u)(b0 + b1 u) with u^2 = nr (BN254a: -1; BN254b: -5).

    Karatsuba: 3 base muls, batched into one CIOS loop."""
    t0, t1, s = _mul3(spec, [
        (a[0], b[0]), (a[1], b[1]),
        (fp.add(spec, a[0], a[1]), fp.add(spec, b[0], b[1]))])
    if nr == -1:
        c0 = fp.sub(spec, t0, t1)
    else:
        c0 = fp.add(spec, t0, fp.mul_small(spec, t1, nr))
    c1 = fp.sub(spec, fp.sub(spec, s, t0), t1)
    return (c0, c1)


def sqr(spec: FieldSpec, a, nr: int = -1):
    # (a0 + a1)(a0 + nr a1) = a0^2 + nr a1^2 + (1 + nr) a0 a1:
    # 2 base muls, batched into one; nr = -1 degenerates to the classic
    # (a0+a1)(a0-a1) + 2 a0 a1 u form.
    a1nr = fp.neg(spec, a[1]) if nr == -1 else fp.mul_small(spec, a[1], nr)
    m1, m2 = _mul3(spec, [
        (fp.add(spec, a[0], a[1]), fp.add(spec, a[0], a1nr)),
        (a[0], a[1])])
    c0 = m1 if nr == -1 else fp.sub(spec, m1,
                                    fp.mul_small(spec, m2, 1 + nr))
    return (c0, fp.add(spec, m2, m2))


def mul_fp(spec: FieldSpec, a, k):
    """Multiply Fp2 batch by an Fp batch/constant (limb array)."""
    return (fp.mont_mul(spec, a[0], k), fp.mont_mul(spec, a[1], k))


def conj(spec: FieldSpec, a):
    return (a[0], fp.neg(spec, a[1]))


def _norm(spec: FieldSpec, a, nr: int):
    """a0^2 - nr a1^2 (the Fp2 norm)."""
    s0, s1 = _mul3(spec, [(a[0], a[0]), (a[1], a[1])])
    if nr == -1:
        return fp.add(spec, s0, s1)
    return fp.sub(spec, s0, fp.mul_small(spec, s1, nr))


def inv(spec: FieldSpec, a, nr: int = -1):
    """1 / (a0 + a1 u) = (a0 - a1 u) / (a0^2 - nr a1^2)."""
    d = fp.inv(spec, _norm(spec, a, nr))
    return (fp.mont_mul(spec, a[0], d),
            fp.neg(spec, fp.mont_mul(spec, a[1], d)))


def batch_inv_rows(spec: FieldSpec, a, lanes: int = 4096, nr: int = -1):
    """Elementwise Fp2 inverse of a flat batch in O(n) base multiplies
    (norm trick over fp.batch_inv_rows).  inv(0) = 0."""
    d = fp.batch_inv_rows(spec, _norm(spec, a, nr), lanes)
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
