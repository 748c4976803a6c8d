"""Radix-2 NTT over the BN254 scalar field as limb-tensor dataflow.

Single-chip evaluation-domain ops mirroring the semantics of the
reference's SerialFFT (algebra/fft/SerialFFT.java:75-162) and the serial
Lagrange/coset helpers (FFTAuxiliary.java:224-302) — re-designed TPU-first:

* a field vector is ``uint32[L, n]`` Montgomery limbs (see fields/fp.py);
* the butterfly network is a ``fori_loop`` over log2(n) stages whose
  gather indices are computed on-device from iota + shifts (static shapes,
  tiny compiled graph — unlike the reference CUDA which recomputes
  ``omega^k`` via modular exponentiation per thread,
  algebra_fft_FFTAuxiliary.cu:70-162);
* twiddles come from one ``omega^k`` table built by log2(n) doubling steps.

No bit-reversal pass is needed: we use DIF (decimation in frequency) for
the forward transform and DIT for the inverse, so bit-reversed order is
internal only.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from octopuszk_tpu.fields import fp
from octopuszk_tpu.fields.spec import FieldSpec, NUM_LIMBS
from octopuszk_tpu.utils.bigint import int_to_limbs

I32 = jnp.int32


def powers(spec: FieldSpec, base_mont, n: int):
    """[1, g, g^2, ..., g^(n-1)] as uint32[L, n] Montgomery limbs.

    ``base_mont`` is a single element uint32[L] (Montgomery).  Built by
    log2(n) doubling steps: P_{2k} = [P_k, P_k * g^k] — n total mults in
    log depth.  Any n >= 1 is accepted (non-powers of two build to the
    next power of two and slice).
    """
    assert n >= 1
    out = fp.constant(spec.one_mont_limbs, (1,))
    cur = base_mont  # invariant: cur == g^(current length of out)
    while out.shape[1] < n:
        shifted = fp.mont_mul(spec, out, cur[:, None])
        out = jnp.concatenate([out, shifted], axis=1)
        cur = fp.mont_mul(spec, cur[:, None], cur[:, None])[:, 0]
    return out[:, :n]


def _stage_indices(n: int, s: int, dif: bool):
    """Gather indices for butterfly stage s; returns (iA, iB, sign, twk).

    For DIT stage s (half-block m = 2^s): position i pairs (in0, in0+m)
    where in0 = (i with bit s cleared); sign = bit s of i; twiddle index
    = (i mod m) * (n / 2m).  For DIF stage s we run stages in reverse
    order (m = n/2^(s+1)) with twiddle applied after the sub.
    """
    i = jax.lax.broadcasted_iota(I32, (n, 1), 0)[:, 0]
    logn = n.bit_length() - 1
    mbits = jnp.asarray(logn - 1 - s if dif else s, I32)  # m = 2^mbits
    m = jnp.left_shift(jnp.asarray(1, I32), mbits)
    j = i & (m - 1)
    in0 = i & ~m          # clear bit mbits
    in1 = in0 | m
    sign = (i >> mbits) & 1  # 0: first half of block; 1: second
    # twiddle exponent step = n / (2m): exponent = j << (logn-1-mbits)
    twk = j << (jnp.asarray(logn - 1, I32) - mbits)
    return in0, in1, sign, twk


def _butterfly_loop(spec: FieldSpec, x, tw_table, dif: bool):
    """Run all log2(n) butterfly stages with a rolled fori_loop.

    ``x``: uint32[L, n] or uint32[L, n, B] (transform along axis 1, B
    independent trailing batches — the layout of column FFTs in the
    distributed 4-step algorithm, with B on the TPU lane axis).
    """
    n = x.shape[1]
    logn = n.bit_length() - 1
    batched = x.ndim == 3

    from octopuszk_tpu.ops import pallas_ops
    total = 1
    for dim in x.shape[1:]:
        total *= dim
    use_pallas = pallas_ops.enabled() and total >= 4096

    def body(s, v):
        iA, iB, sign, twk = _stage_indices(n, s, dif)
        a = v[:, iA]
        b = v[:, iB]
        w = tw_table[:, twk]
        if batched:
            w = jnp.broadcast_to(w[..., None], a.shape)
            sign_b = sign[None, :, None]
        else:
            sign_b = sign[None, :]
        if use_pallas:
            L = v.shape[0]
            flat = lambda t: t.reshape(L, total)
            add_, sub_ = pallas_ops.butterfly(
                spec, flat(a), flat(b), flat(w), dif)
            add_, sub_ = add_.reshape(a.shape), sub_.reshape(a.shape)
        elif dif:
            # out(sign=0) = a + b ; out(sign=1) = (a - b) * w
            add_ = fp.add(spec, a, b)
            sub_ = fp.mont_mul(spec, fp.sub(spec, a, b), w)
        else:
            # out(sign=0) = a + w*b ; out(sign=1) = a - w*b
            t = fp.mont_mul(spec, b, w)
            add_ = fp.add(spec, a, t)
            sub_ = fp.sub(spec, a, t)
        return jnp.where(sign_b == 0, add_, sub_)

    return jax.lax.fori_loop(0, logn, body, x)


def _emul(spec: FieldSpec, a, b):
    """Elementwise Montgomery multiply, routed through the fused Pallas
    kernel at large shapes (the XLA path's rolled CIOS rounds round-trip
    every intermediate through HBM).  ``b`` is broadcast to ``a``'s shape
    if needed."""
    from octopuszk_tpu.ops import pallas_ops
    L = a.shape[0]
    total = 1
    for dim in a.shape[1:]:
        total *= dim
    if pallas_ops.enabled() and total >= 4096:
        bb = jnp.broadcast_to(b, a.shape)
        return pallas_ops.mont_mul(
            spec, a.reshape(L, total), bb.reshape(L, total)).reshape(a.shape)
    return fp.mont_mul(spec, a, b)


def _omega(spec: FieldSpec, n: int, inverse: bool):
    w = spec.rou_of_order(n)
    if inverse:
        w = pow(w, -1, spec.p)
    return jnp.asarray(int_to_limbs(spec.to_mont(w), NUM_LIMBS))


# above this size the flat butterfly's [L, n]-wide minor-axis gathers
# amplify reads ~128x per stage (and their transients killed the worker
# at 2^24 on a 16 GB chip); the serial Bailey 4-step keeps every gather
# on [L, sqrt(n), sqrt(n)] blocks with full lane rows
FOUR_STEP_MIN = 1 << 18


@functools.partial(jax.jit, static_argnums=(0,))
def ntt(spec: FieldSpec, coeffs):
    """Coefficients -> evaluations on the size-n subgroup (natural order).

    Reference: SerialFFT.radix2FFT (SerialFFT.java:75-81).
    """
    n = coeffs.shape[1]
    if n == 1:
        return coeffs
    if n >= FOUR_STEP_MIN:
        return _ntt_4step(spec, coeffs, inverse=False)
    tw = powers(spec, _omega(spec, n, False), n // 2)
    # DIF forward leaves results in bit-reversed order; un-reverse with a
    # DIT-compatible ordering: run DIF then permute.
    y = _butterfly_loop(spec, coeffs, tw, dif=True)
    return y[:, _bitrev_perm(n)]


@functools.partial(jax.jit, static_argnums=(0,))
def intt(spec: FieldSpec, evals):
    """Evaluations -> coefficients (inverse NTT, natural order).

    Reference: SerialFFT.radix2InverseFFT (SerialFFT.java:86-93).
    """
    n = evals.shape[1]
    if n == 1:
        return evals
    if n >= FOUR_STEP_MIN:
        return _ntt_4step(spec, evals, inverse=True)
    tw = powers(spec, _omega(spec, n, True), n // 2)
    x = evals[:, _bitrev_perm(n)]
    y = _butterfly_loop(spec, x, tw, dif=False)
    n_inv = spec.to_mont(pow(n, -1, spec.p))
    return _emul(spec, y, fp.constant(
        np.asarray(int_to_limbs(n_inv, NUM_LIMBS)), ())[:, None])


def _ntt_4step(spec: FieldSpec, x, inverse: bool):
    """Serial Bailey 4-step: view [R, C] row-major, transform columns,
    twiddle by omega^(k1*j2), transform rows, transpose to natural order.

    The single-chip case of the distributed 4-step (parallel/dntt.py,
    FFTAuxiliary.distributedRadix2FFT role) — both ntt_batched passes
    gather along a sqrt(n)-sized axis with a full sqrt(n)-lane trailing
    batch, so every gathered slice is whole tile rows."""
    L, n = x.shape
    logn = n.bit_length() - 1
    R, C = 1 << ((logn + 1) // 2), 1 << (logn // 2)
    omega = spec.rou_of_order(n)
    if inverse:
        omega = pow(omega, -1, spec.p)
    xl = x.reshape(L, R, C)
    xl = ntt_batched(spec, xl, inverse=inverse)          # columns (len R)
    bases = powers(spec, jnp.asarray(
        int_to_limbs(spec.to_mont(omega), NUM_LIMBS)), C)     # omega^{j2}
    tw = powers_batched(spec, bases, R)                  # omega^{j2*k1}
    xl = _emul(spec, xl, tw)
    xl = jnp.moveaxis(
        ntt_batched(spec, jnp.moveaxis(xl, 1, 2), inverse=inverse),
        1, 2)                                            # rows (len C)
    return jnp.moveaxis(xl, 1, 2).reshape(L, n)


def powers_batched(spec: FieldSpec, bases, n: int):
    """bases uint32[L, B] -> uint32[L, n, B] with out[:, i, b] = base_b^i."""
    assert n >= 1
    B = bases.shape[1]
    out = fp.constant(spec.one_mont_limbs, (1, B))
    cur = bases  # invariant: cur == base^(current length of out)
    while out.shape[1] < n:
        shifted = fp.mont_mul(spec, out, cur[:, None, :])
        out = jnp.concatenate([out, shifted], axis=1)
        cur = fp.mont_mul(spec, cur, cur)
    return out[:, :n]


def ntt_batched(spec: FieldSpec, x, inverse: bool = False):
    """Transform along axis 1 of uint32[L, n, B] (B independent columns)."""
    n = x.shape[1]
    if n == 1:
        return x
    tw = powers(spec, _omega(spec, n, inverse), n // 2)
    if inverse:
        y = _butterfly_loop(spec, x[:, _bitrev_perm(n)], tw, dif=False)
        n_inv = spec.to_mont(pow(n, -1, spec.p))
        return _emul(spec, y, fp.constant(
            np.asarray(int_to_limbs(n_inv, NUM_LIMBS)), ())[:, None, None])
    y = _butterfly_loop(spec, x, tw, dif=True)
    return y[:, _bitrev_perm(n)]


@functools.cache
def _bitrev_perm(n: int) -> np.ndarray:
    logn = n.bit_length() - 1
    idx = np.arange(n, dtype=np.int64)
    rev = np.zeros(n, dtype=np.int64)
    for b in range(logn):
        rev |= ((idx >> b) & 1) << (logn - 1 - b)
    return rev


def _coset_g(spec: FieldSpec):
    return jnp.asarray(int_to_limbs(spec.to_mont(spec.generator), NUM_LIMBS))


def multiply_by_coset(spec: FieldSpec, x, inverse: bool = False):
    """x[i] *= g^i (or g^-i): FFTAuxiliary.multiplyByCoset (…java:224-232)."""
    n = x.shape[1]
    g = spec.generator if not inverse else pow(spec.generator, -1, spec.p)
    gl = jnp.asarray(int_to_limbs(spec.to_mont(g), NUM_LIMBS))
    return _emul(spec, x, powers(spec, gl, n))


@functools.partial(jax.jit, static_argnums=(0,))
def coset_ntt(spec: FieldSpec, coeffs):
    """Evaluate on the coset g*H. Reference: SerialFFT.radix2CosetFFT."""
    return ntt(spec, multiply_by_coset(spec, coeffs))


@functools.partial(jax.jit, static_argnums=(0,))
def coset_intt(spec: FieldSpec, evals):
    """Interpolate from the coset g*H. SerialFFT.radix2CosetInverseFFT."""
    return multiply_by_coset(spec, intt(spec, evals), inverse=True)


@functools.partial(jax.jit, static_argnums=(0, 1))
def lagrange_coeffs(spec: FieldSpec, n: int, t):
    """All n Lagrange basis polynomials of the domain evaluated at t.

    L_i(t) = (t^n - 1)/n * omega^i / (t - omega^i), with the special case
    t in H handled by the formula degenerating — callers use random t, and
    exact-hit of the domain is handled like the reference by direct check
    (FFTAuxiliary.serialRadix2LagrangeCoefficients, …java:249-302).

    ``t``: uint32[L] Montgomery element.  Returns uint32[L, n].
    """
    w = powers(spec, _omega(spec, n, False), n)            # omega^i
    t_col = t[:, None]
    diff = fp.sub(spec, jnp.broadcast_to(t_col, w.shape), w)   # t - omega^i
    on_domain = fp.is_zero(diff)                            # t == omega^i ?
    any_hit = jnp.any(on_domain)
    diff_safe = jnp.where(on_domain[None, :],
                          fp.constant(spec.one_mont_limbs, (n,)), diff)
    inv_diff = fp.batch_inv(spec, diff_safe)
    # Z(t)/n = (t^n - 1) * n^-1
    tn = fp.pow_const(spec, t_col, n)[:, 0]
    one = fp.constant(spec.one_mont_limbs, ())
    zt_over_n = fp.mont_mul(
        spec, fp.sub(spec, tn, one)[:, None],
        fp.constant(np.asarray(int_to_limbs(
            spec.to_mont(pow(n, -1, spec.p)), NUM_LIMBS)), ())[:, None])[:, 0]
    coeffs = fp.mont_mul(spec, fp.mont_mul(spec, w, inv_diff),
                         jnp.broadcast_to(zt_over_n[:, None], w.shape))
    # exact domain hit: L_i = delta_i
    delta = jnp.where(on_domain[None, :],
                      fp.constant(spec.one_mont_limbs, (n,)),
                      fp.zeros_like_batch((n,)))
    return jnp.where(any_hit, delta, coeffs)


def compute_z_at(spec: FieldSpec, n: int, t_int: int) -> int:
    """Z(t) = t^n - 1 as a host int. Reference: SerialFFT.computeZ."""
    return (pow(t_int, n, spec.p) - 1) % spec.p


def divide_by_z_on_coset(spec: FieldSpec, evals):
    """Divide coset evaluations by Z(g*omega^i) = g^n - 1 (constant).

    Reference: SerialFFT.divideByZOnCoset (SerialFFT.java:157-162).
    """
    n = evals.shape[1]
    zinv = pow(compute_z_at(spec, n, spec.generator), -1, spec.p)
    zc = fp.constant(np.asarray(int_to_limbs(spec.to_mont(zinv), NUM_LIMBS)))
    return _emul(spec, evals, zc[:, None])
