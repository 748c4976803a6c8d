"""Polynomial evaluation helpers over Fr limb tensors.

Reference parity: common/NaiveEvaluation.java:243-296
(evaluatePolynomial / parallelEvaluatePolynomial) — re-designed as a
log-depth powers expansion + exact wide sum instead of sequential Horner.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from octopuszk_tpu.fields import fp
from octopuszk_tpu.fields.spec import FieldSpec
from octopuszk_tpu.ops import ntt


def evaluate_poly(spec: FieldSpec, coeffs, x):
    """p(x) for coeffs uint32[L, n] and x uint32[L] (both Montgomery).

    Returns uint32[L].  n is padded internally to a power of two.
    Exact: products are summed as wide uint32 limbs (safe for n <= 2^15
    per chunk) and reduced with from_wide.
    """
    n = coeffs.shape[1]
    m = 1 << (n - 1).bit_length() if n > 1 else 1
    if m != n:
        coeffs = jnp.pad(coeffs, ((0, 0), (0, m - n)))
    pw = ntt.powers(spec, x, m)
    terms = fp.mont_mul(spec, coeffs, pw)
    return _wide_sum(spec, terms)


def _wide_sum(spec: FieldSpec, terms):
    """Exact sum over the batch axis of uint32[L, n] Montgomery values."""
    n = terms.shape[1]
    chunk = 1 << 13
    while n > 1:
        k = min(chunk, n)
        pad = (-n) % k
        if pad:
            terms = jnp.pad(terms, ((0, 0), (0, pad)))
            n += pad
        wide = terms.reshape(terms.shape[0], n // k, k).sum(
            axis=2, dtype=jnp.uint32)
        terms = fp.reduce_sum_mont(spec, wide)
        n = terms.shape[1]
    return terms[:, 0]
