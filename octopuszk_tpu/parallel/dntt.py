"""Distributed radix-2 NTT over a device mesh (Bailey 4-step).

Reference parity: FFTAuxiliary.distributedRadix2FFT
(FFTAuxiliary.java:129-219) — the Sze/SSMR 2-step MapReduce FFT with
rows x cols decomposition and two shuffle transposes, re-designed for ICI:
the Spark combineByKey shuffles become ``jax.lax.all_to_all`` inside one
``shard_map``, the per-group serial FFTs become batched on-chip butterfly
networks (ops/ntt.py), and the twiddle scaling ``omegaShift^(index*i)``
becomes a log-depth powers_batched.

Data layout: the global vector [L, n] is viewed as a row-major [R, C]
matrix; a chip holds R/D contiguous rows.  Forward and inverse both run:
  column-block transform (post all-to-all) -> twiddle -> row transform ->
  final transpose back to natural-order sharding.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from octopuszk_tpu.fields import fp
from octopuszk_tpu.fields.spec import FieldSpec, NUM_LIMBS
from octopuszk_tpu.ops import ntt
from octopuszk_tpu.parallel.mesh import AXIS
from octopuszk_tpu.utils.bigint import int_to_limbs


def _split_rc(n: int, d: int) -> tuple[int, int]:
    """Pick R x C = n with d | R, d | C, both powers of two, R ~ sqrt(n)."""
    logn = n.bit_length() - 1
    logd = d.bit_length() - 1
    assert 2 ** logn == n and 2 ** logd == d, "power-of-two sizes required"
    assert logn >= 2 * logd, (
        f"distributed NTT needs n >= d^2 (n={n}, d={d})")
    logr = max(logd, min(logn - logd, (logn + 1) // 2))
    return 1 << logr, 1 << (logn - logr)


def _const(spec, x: int):
    return jnp.asarray(int_to_limbs(spec.to_mont(x % spec.p), NUM_LIMBS))


def _dev_scaled_powers(spec, base: int, count: int, dmax: int):
    """Per-device geometric sequence base^(dev*count + i), i < count."""
    dev = jax.lax.axis_index(AXIS)
    local = ntt.powers(spec, _const(spec, base), count)
    block = pow(base, count, spec.p)
    dev_pow = ntt.powers(spec, _const(spec, block), dmax)[:, dev]
    return fp.mont_mul(spec, local, dev_pow[:, None])


def distributed_ntt(mesh, spec: FieldSpec, x, inverse: bool = False,
                    coset: bool = False):
    """NTT/iNTT of a batch-sharded uint32[L, n] vector; stays sharded.

    coset=True evaluates on (interpolates from) the coset g*H, matching
    SerialFFT.radix2CosetFFT / radix2CosetInverseFFT semantics.
    """
    d = mesh.devices.size
    n = x.shape[1]
    if d == 1:
        if coset:
            return (ntt.coset_intt if inverse else ntt.coset_ntt)(spec, x)
        return (ntt.intt if inverse else ntt.ntt)(spec, x)
    return _ntt_fn(mesh, spec, x.shape[0], n, inverse, coset)(x)


@functools.lru_cache(maxsize=None)
def _ntt_fn(mesh, spec: FieldSpec, L: int, n: int, inverse: bool,
            coset: bool):
    """Memoized jitted distributed-NTT executable.

    Eagerly-invoked shard_map closures would re-trace AND re-compile on
    every call (and eager shard_map dispatch compiles each body primitive
    separately — measured ~25x slower than one jitted module); caching the
    ``jax.jit(shard_map(...))`` per (mesh, spec, shape, direction) makes
    repeated NTTs hit the in-process executable cache.
    """
    d = mesh.devices.size
    R, C = _split_rc(n, d)
    dmax = 1 << max(0, (d - 1).bit_length())
    omega = spec.rou_of_order(n)
    if inverse:
        omega = pow(omega, -1, spec.p)
    g = spec.generator
    g_inv = pow(g, -1, spec.p)

    @functools.partial(jax.shard_map, mesh=mesh,
                       in_specs=P(None, AXIS), out_specs=P(None, AXIS))
    def _body(xl):
        if coset and not inverse:
            xl = fp.mont_mul(spec, xl, _dev_scaled_powers(spec, g, n // d, dmax))
        xl = xl.reshape(L, R // d, C)
        # row-block -> column-block
        xl = jax.lax.all_to_all(xl, AXIS, split_axis=2, concat_axis=1,
                                tiled=True)                    # [L, R, C/d]
        xl = ntt.ntt_batched(spec, xl, inverse=inverse)
        # twiddle: * omega^(j2 * k1), j2 = global column, k1 = row
        bases = _dev_scaled_powers(spec, omega, C // d, dmax)  # omega^{j2}
        tw = ntt.powers_batched(spec, bases, R)                # [L, R, C/d]
        xl = fp.mont_mul(spec, xl, tw)
        # column-block -> row-block
        xl = jax.lax.all_to_all(xl, AXIS, split_axis=1, concat_axis=2,
                                tiled=True)                    # [L, R/d, C]
        xl = jnp.moveaxis(
            ntt.ntt_batched(spec, jnp.moveaxis(xl, 1, 2), inverse=inverse),
            1, 2)                                              # rows FFT_C
        # transpose [R, C] -> [C, R] for natural output order
        xl = jax.lax.all_to_all(xl, AXIS, split_axis=2, concat_axis=1,
                                tiled=True)                    # [L, R, C/d]
        xl = jnp.moveaxis(xl, 1, 2).reshape(L, n // d)         # [L, C/d * R]
        if coset and inverse:
            xl = fp.mont_mul(spec, xl,
                             _dev_scaled_powers(spec, g_inv, n // d, dmax))
        return xl

    return jax.jit(_body)
