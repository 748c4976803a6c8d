"""NTT-layer differential tests vs naive host evaluation.

Reference test parity: DistributedFFTTest.java:41-194 / SerialFFTTest —
FFT vs naive polynomial evaluation, FFT∘iFFT = id, coset variants,
Lagrange coefficients, computeZ.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from octopuszk_tpu.fields.spec import FR, NUM_LIMBS
from octopuszk_tpu.ops import ntt
from octopuszk_tpu.utils.bigint import ints_to_limbs, limbs_to_ints, int_to_limbs

pytestmark = pytest.mark.quick

P = FR.p


def _dev(xs):
    return jnp.asarray(ints_to_limbs([FR.to_mont(x) for x in xs], NUM_LIMBS))


def _host(arr):
    return [FR.from_mont(v) for v in limbs_to_ints(np.asarray(arr))]


def _naive_eval_all(coeffs, root):
    n = len(coeffs)
    out = []
    for k in range(n):
        x = pow(root, k, P)
        acc, xp = 0, 1
        for c in coeffs:
            acc = (acc + c * xp) % P
            xp = xp * x % P
        out.append(acc)
    return out


@pytest.mark.parametrize("n", [8, 32])
def test_ntt_vs_naive(rng, n):
    coeffs = [rng.randrange(P) for _ in range(n)]
    root = FR.rou_of_order(n)
    got = _host(ntt.ntt(FR, _dev(coeffs)))
    assert got == _naive_eval_all(coeffs, root)


@pytest.mark.parametrize("n", [8, 64])
def test_ntt_roundtrip(rng, n):
    coeffs = [rng.randrange(P) for _ in range(n)]
    a = _dev(coeffs)
    assert _host(ntt.intt(FR, ntt.ntt(FR, a))) == coeffs
    assert _host(ntt.ntt(FR, ntt.intt(FR, a))) == coeffs


@pytest.mark.parametrize("n", [16, 64])
def test_ntt_4step_vs_naive(rng, n):
    """Serial Bailey 4-step (the >= FOUR_STEP_MIN production path) on a
    small domain, against the naive oracle and the flat butterfly path.
    Called directly so the jit cache of the flat-path traces at the same
    shapes is not a factor (ADVICE r4: 4-step had no direct unit test)."""
    coeffs = [rng.randrange(P) for _ in range(n)]
    a = _dev(coeffs)
    root = FR.rou_of_order(n)
    got = _host(ntt._ntt_4step(FR, a, inverse=False))
    assert got == _naive_eval_all(coeffs, root)
    assert got == _host(ntt.ntt(FR, a))
    # inverse 4-step round-trips
    back = _host(ntt._ntt_4step(FR, ntt._ntt_4step(FR, a, inverse=False),
                                inverse=True))
    assert back == coeffs


def test_ntt_4step_nonsquare(rng):
    """Odd log2(n): R != C decomposition (R = 2C)."""
    n = 32
    coeffs = [rng.randrange(P) for _ in range(n)]
    a = _dev(coeffs)
    got = _host(ntt._ntt_4step(FR, a, inverse=False))
    assert got == _naive_eval_all(coeffs, FR.rou_of_order(n))


def test_butterfly_mulsub_kernels_interpret(rng, monkeypatch):
    """Fused Pallas butterfly / mul_sub / mont_mul kernels under interpret
    mode vs the fp formulas (ADVICE r4: these kernels were validated only
    transitively by TPU runs)."""
    from octopuszk_tpu.fields import fp
    from octopuszk_tpu.ops import pallas_ops

    n = 300
    mk = lambda seed: _dev([rng.randrange(P) for _ in range(n)])
    a, b, w, c = mk(1), mk(2), mk(3), mk(4)
    want_dif = (fp.add(FR, a, b), fp.mont_mul(FR, fp.sub(FR, a, b), w))
    t = fp.mont_mul(FR, b, w)
    want_dit = (fp.add(FR, a, t), fp.sub(FR, a, t))
    want_mulsub = fp.sub(FR, fp.mont_mul(FR, a, b), c)
    want_mul = fp.mont_mul(FR, a, b)
    monkeypatch.setenv("OCTOPUSZK_PALLAS", "interpret")
    pallas_ops.reset_mode_caches()
    try:
        got_dif = pallas_ops.butterfly(FR, a, b, w, dif=True)
        got_dit = pallas_ops.butterfly(FR, a, b, w, dif=False)
        got_mulsub = pallas_ops.mul_sub(FR, a, b, c)
        got_mul = pallas_ops.mont_mul(FR, a, b)
    finally:
        monkeypatch.delenv("OCTOPUSZK_PALLAS")
        pallas_ops.reset_mode_caches()
    for got, want in (list(zip(got_dif, want_dif))
                      + list(zip(got_dit, want_dit))
                      + [(got_mulsub, want_mulsub), (got_mul, want_mul)]):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_coset_vs_naive(rng):
    n = 16
    coeffs = [rng.randrange(P) for _ in range(n)]
    root = FR.rou_of_order(n)
    g = FR.generator
    got = _host(ntt.coset_ntt(FR, _dev(coeffs)))
    # coset evals: p(g * omega^k)
    expect = []
    for k in range(n):
        x = g * pow(root, k, P) % P
        acc, xp = 0, 1
        for c in coeffs:
            acc = (acc + c * xp) % P
            xp = xp * x % P
        expect.append(acc)
    assert got == expect
    back = _host(ntt.coset_intt(FR, ntt.coset_ntt(FR, _dev(coeffs))))
    assert back == coeffs


def test_powers(rng):
    n = 16
    b = rng.randrange(P)
    bl = jnp.asarray(int_to_limbs(FR.to_mont(b), NUM_LIMBS))
    got = _host(ntt.powers(FR, bl, n))
    assert got == [pow(b, i, P) for i in range(n)]


def test_lagrange_coeffs(rng):
    n = 16
    t = rng.randrange(P)
    root = FR.rou_of_order(n)
    tl = jnp.asarray(int_to_limbs(FR.to_mont(t), NUM_LIMBS))
    got = _host(ntt.lagrange_coeffs(FR, n, tl))
    # naive: L_i(t) = prod_{j != i} (t - w^j) / (w^i - w^j)
    ws = [pow(root, i, P) for i in range(n)]
    expect = []
    for i in range(n):
        num, den = 1, 1
        for j in range(n):
            if j == i:
                continue
            num = num * (t - ws[j]) % P
            den = den * (ws[i] - ws[j]) % P
        expect.append(num * pow(den, -1, P) % P)
    assert got == expect
    # consistency: interpolation property — sum L_i(t) * p(w^i) = p(t)
    coeffs = [rng.randrange(P) for _ in range(n)]
    evals = _naive_eval_all(coeffs, root)
    lhs = sum(l * e for l, e in zip(got, evals)) % P
    rhs, xp = 0, 1
    for c in coeffs:
        rhs = (rhs + c * xp) % P
        xp = xp * t % P
    assert lhs == rhs


def test_lagrange_on_domain_hit(rng):
    n = 8
    root = FR.rou_of_order(n)
    t = pow(root, 3, P)
    tl = jnp.asarray(int_to_limbs(FR.to_mont(t), NUM_LIMBS))
    got = _host(ntt.lagrange_coeffs(FR, n, tl))
    assert got == [1 if i == 3 else 0 for i in range(n)]


def test_divide_by_z_on_coset(rng):
    n = 8
    # p(x) = Z(x) * q(x), deg q < n, then on the coset: divide recovers q
    q = [rng.randrange(P) for _ in range(n)]
    # Z(x) = x^n - 1, so p has degree < 2n: work in size-2n domain
    pc = [(-c) % P for c in q] + q  # (x^n - 1)*q = x^n q - q
    ev = ntt.coset_ntt(FR, _dev(pc))
    # divide the first-half coset evals? Z on coset of the size-2n domain is
    # not constant; instead test directly on the size-n domain:
    # take p2 = Z_n * 1 (constant poly 1): evals on coset g*H_n of Z_n are
    # g^n - 1 everywhere.
    g = FR.generator
    zc = (pow(g, n, P) - 1) % P
    const_one = _dev([1] + [0] * (n - 1))
    evals = ntt.coset_ntt(FR, const_one)   # all ones
    got = _host(ntt.divide_by_z_on_coset(FR, evals))
    zinv = pow(zc, -1, P)
    assert got == [zinv] * n
