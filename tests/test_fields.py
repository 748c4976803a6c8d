"""Field-layer differential tests: device limb kernels vs python ints.

Reference test parity: algebra/fields/FieldsTest.java:92-170 (field axioms)
— here run as randomized differential checks against the exact host oracle.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from octopuszk_tpu.fields import fp
from octopuszk_tpu.fields.spec import FR, FQ, NUM_LIMBS
from octopuszk_tpu.utils.bigint import ints_to_limbs, limbs_to_ints

pytestmark = pytest.mark.quick

SPECS = [FR, FQ]
N = 64


def _rand_elems(rng, spec, n):
    return [rng.randrange(spec.p) for _ in range(n)]


def _dev(spec, xs):
    return jnp.asarray(ints_to_limbs([spec.to_mont(x) for x in xs], NUM_LIMBS))


def _host(spec, arr):
    return [spec.from_mont(v) for v in limbs_to_ints(np.asarray(arr))]


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
def test_add_sub_neg(rng, spec):
    xs, ys = _rand_elems(rng, spec, N), _rand_elems(rng, spec, N)
    a, b = _dev(spec, xs), _dev(spec, ys)
    assert _host(spec, fp.add(spec, a, b)) == [(x + y) % spec.p for x, y in zip(xs, ys)]
    assert _host(spec, fp.sub(spec, a, b)) == [(x - y) % spec.p for x, y in zip(xs, ys)]
    assert _host(spec, fp.neg(spec, a)) == [(-x) % spec.p for x in xs]
    assert _host(spec, fp.double(spec, a)) == [2 * x % spec.p for x in xs]


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
def test_add_edge_cases(spec):
    xs = [0, 1, spec.p - 1, spec.p - 2, 0, spec.p - 1]
    ys = [0, spec.p - 1, spec.p - 1, 1, 1, 1]
    a, b = _dev(spec, xs), _dev(spec, ys)
    assert _host(spec, fp.add(spec, a, b)) == [(x + y) % spec.p for x, y in zip(xs, ys)]
    assert _host(spec, fp.sub(spec, a, b)) == [(x - y) % spec.p for x, y in zip(xs, ys)]


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
def test_mont_mul(rng, spec):
    xs, ys = _rand_elems(rng, spec, N), _rand_elems(rng, spec, N)
    a, b = _dev(spec, xs), _dev(spec, ys)
    got = _host(spec, fp.mont_mul(spec, a, b))
    assert got == [x * y % spec.p for x, y in zip(xs, ys)]
    got_sq = _host(spec, fp.mont_sqr(spec, a))
    assert got_sq == [x * x % spec.p for x in xs]


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
def test_mont_roundtrip(rng, spec):
    xs = _rand_elems(rng, spec, N)
    raw = jnp.asarray(ints_to_limbs(xs, NUM_LIMBS))
    m = fp.to_mont(spec, raw)
    back = fp.from_mont(spec, m)
    assert limbs_to_ints(np.asarray(back)) == xs


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
def test_inv(rng, spec):
    xs = _rand_elems(rng, spec, 8)
    a = _dev(spec, xs)
    got = _host(spec, fp.inv(spec, a))
    assert got == [pow(x, -1, spec.p) if x else 0 for x in xs]


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
def test_batch_inv(rng, spec):
    xs = [rng.randrange(1, spec.p) for _ in range(N)]
    a = _dev(spec, xs)
    got = _host(spec, fp.batch_inv(spec, a))
    assert got == [pow(x, -1, spec.p) for x in xs]


def test_pow_const(rng):
    spec = FR
    xs = _rand_elems(rng, spec, 8)
    a = _dev(spec, xs)
    e = 0xDEADBEEF12345
    got = _host(spec, fp.pow_const(spec, a, e))
    assert got == [pow(x, e, spec.p) for x in xs]


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
def test_from_wide(rng, spec):
    # random 512-bit values as 32 limbs of 16 bits
    W = 32
    vals = [rng.randrange(1 << 512) for _ in range(N)]
    wide = jnp.asarray(ints_to_limbs(vals, W))
    got_raw = limbs_to_ints(np.asarray(fp.from_wide(spec, wide, out_mont=False)))
    assert got_raw == [v % spec.p for v in vals]
    got_mont = [spec.from_mont(v) for v in
                limbs_to_ints(np.asarray(fp.from_wide(spec, wide, out_mont=True)))]
    assert got_mont == [v % spec.p for v in vals]


def test_predicates(rng):
    spec = FR
    xs = [0, 1, 0, spec.p - 1]
    a = _dev(spec, xs)
    z = np.asarray(fp.is_zero(a))
    assert z.tolist() == [True, False, True, False]
    assert np.asarray(fp.eq(a, a)).all()


def test_mont_mul_sos_mxu_matches_cios(rng):
    """MXU-REDC Montgomery multiply (ops/mxu_mont.py) is bit-identical to
    the CIOS path for random inputs, both BN254 fields, incl. edge values."""
    import jax.numpy as jnp
    from octopuszk_tpu.fields.spec import FQ
    from octopuszk_tpu.ops import mxu_mont
    from octopuszk_tpu.utils.bigint import ints_to_limbs

    for spec in (FR, FQ):
        vals_a = [rng.randrange(spec.p) for _ in range(61)] + [0, 1, spec.p - 1]
        vals_b = [rng.randrange(spec.p) for _ in range(61)] + [spec.p - 1, 0, 1]
        a = jnp.asarray(ints_to_limbs(vals_a, NUM_LIMBS))
        b = jnp.asarray(ints_to_limbs(vals_b, NUM_LIMBS))
        want = fp.mont_mul(spec, a, b)
        got = mxu_mont.mont_mul_sos_mxu(spec, a, b)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
