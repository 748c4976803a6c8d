"""Experimental MXU-assisted Montgomery multiplication (SOS + matmul REDC).

VERDICT r4 #1 asked for limb-product accumulation on the MXU.  A batched
a_i * b_i of independent pairs has NO shared operand, so the raw product
cannot ride a matmul (a contraction reuses one operand across outputs;
per-pair products are rank-1 each) — but the Montgomery REDUCTION is two
bignum multiplies by FIXED constants (N' = -p^-1 mod R and p itself),
and a multiply-by-a-constant IS a matmul: with the constant's 8-bit limbs
laid out as a Toeplitz band matrix T[k, j] = c_{k-j}, the convolution
T @ x8 computes c*x for the whole batch in one [K, 32] x [32, n]
contraction.  8-bit limbs in bfloat16 keep every product (< 2^16) and
every 32-term accumulation (< 2^21) exact in the f32 accumulator.

So this separated form (SOS product + matmul REDC):

  1. wide = a*b          school-book, VPU (256 16x16-bit muls — no reuse)
  2. m    = wide_lo * N' mod R     MXU: [32, 32] Toeplitz matmul
  3. t    = (wide + m*p) / R       MXU: [64, 32] Toeplitz matmul

vs the interleaved CIOS in fields/fp.py (512 VPU muls, ONE carry
resolve).  The matmuls are nearly free on the MXU, but the separated
form pays three carry resolves and ~100 u32<->bf16 lane conversions —
measured economics on the chip are in scripts/mxu_experiment.py and
STATUS.md; this module is the committed experiment either way.

Reference kernel being chased: algebra_msm_VariableBaseMSM.cu:1246-1431
(CGBN mul+rem on CUDA integer cores — the GPU has no tensor-core path
for this either).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from octopuszk_tpu.fields import fp
from octopuszk_tpu.fields.spec import FieldSpec, LIMB_BITS, LIMB_MASK, NUM_LIMBS

L = NUM_LIMBS
MASK = np.uint32(LIMB_MASK)
U32 = np.uint32


@functools.cache
def _redc_mats(spec: FieldSpec):
    """(NP8 [32, 32], P8 [64, 32]) bfloat16 Toeplitz band matrices of
    N' = -p^-1 mod 2^256 (low-truncated: mod-R arithmetic) and p."""
    p = spec.p
    n_prime = (-pow(p, -1, 1 << 256)) % (1 << 256)
    npb = [(n_prime >> (8 * i)) & 0xFF for i in range(32)]
    pb = [(p >> (8 * i)) & 0xFF for i in range(32)]
    np8 = np.zeros((32, 32), np.float32)
    for k in range(32):
        for j in range(k + 1):
            np8[k, j] = npb[k - j]
    p8 = np.zeros((64, 32), np.float32)
    for k in range(64):
        for j in range(max(0, k - 31), min(32, k + 1)):
            p8[k, j] = pb[k - j]
    return (jnp.asarray(np8, jnp.bfloat16), jnp.asarray(p8, jnp.bfloat16))


def _split8(x16):
    """Canonical u32[16, n] 16-bit limbs -> bf16[32, n] 8-bit limbs
    (little-endian; values < 256 are exact in bfloat16)."""
    lo = (x16 & U32(0xFF)).astype(jnp.bfloat16)
    hi = (x16 >> U32(8)).astype(jnp.bfloat16)
    return jnp.stack([lo, hi], axis=1).reshape(2 * x16.shape[0],
                                               x16.shape[1])


def _comb16(y8):
    """u32[2K, n] 8-bit-position values (< 2^21) -> u32[K, n] 16-bit
    positions (< 2^30): w16[k] = y[2k] + 256*y[2k+1]."""
    return y8[0::2] + (y8[1::2] << U32(8))


def _wide_product(a, b):
    """School-book 512-bit product: u32[16, n] x2 -> u32[33, n] with
    unnormalized limbs < 2^21 (16-bit positions)."""
    n = a.shape[1]

    def z(k):
        return jnp.zeros((k, n), jnp.uint32)

    t = z(33)
    for i in range(L):
        prod = a[i][None] * b                    # [16, n], exact in u32
        lo = prod & MASK
        hi = prod >> U32(LIMB_BITS)
        t = t + jnp.concatenate([z(i), lo, z(17 - i)], axis=0)
        t = t + jnp.concatenate([z(i + 1), hi, z(16 - i)], axis=0)
    return t


def _matmul(mat_bf16, x8_bf16):
    """[K, 32] x [32, n] -> u32[K, n] exact integer matmul via the MXU
    (bf16 inputs, f32 accumulation; all values < 2^21 stay exact)."""
    y = jax.lax.dot_general(
        mat_bf16, x8_bf16, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return y.astype(jnp.uint32)


def mont_mul_sos_mxu(spec: FieldSpec, a, b):
    """(a * b * R^-1) mod p — bit-identical to fields.fp.mont_mul, with
    the two fixed-operand REDC multiplies on the MXU."""
    a, b = jnp.broadcast_arrays(a, b)
    np8, p8 = _redc_mats(spec)
    t = _wide_product(a, b)
    w, _ = fp._resolve_wide(t)                  # canonical [33, n]
    # m = (wide mod R) * N' mod R  — [32, 32] matmul then carry-resolve;
    # the carry out of limb 15 is dropped (mod-R arithmetic)
    m16 = _comb16(_matmul(np8, _split8(w[:L])))  # [16, n] < 2^30
    m, _ = fp._resolve_wide(m16)
    # t = wide + m*p  — [64, 32] matmul; tt < 2^30 + 2^16 per limb
    mp16 = _comb16(_matmul(p8, _split8(m)))      # [32, n] < 2^30
    tt = w + jnp.concatenate(
        [mp16, jnp.zeros((1, a.shape[1]), jnp.uint32)], axis=0)
    s, _ = fp._resolve_wide(tt)                  # low 16 limbs now zero
    return fp._cond_sub_p(spec, s[L:2 * L],
                          extra_ge=fp._row(s, 2 * L) != np.uint32(0))
