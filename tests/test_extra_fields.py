"""Parity tests: extra field specs, tower variants, fake curves, and the
host MSM reference algorithms.

Reference test parity: FieldsTest.java (Fp3/Fp6/Complex axioms),
SerialVariableBaseMSMTest.java:31-77 (naive/sorted/BosCoster agreement),
fake-curve plumbing (curves/fake/).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from octopuszk_tpu.curves import fake
from octopuszk_tpu.fields import fp, host_ext
from octopuszk_tpu.fields.spec import FR, LARGE, NUM_LIMBS, SMALL
from octopuszk_tpu.ops import msm, ntt
from octopuszk_tpu.utils.bigint import ints_to_limbs, limbs_to_ints

pytestmark = pytest.mark.quick


@pytest.mark.parametrize("spec", [SMALL, LARGE], ids=lambda s: s.name)
def test_generic_field_kernels(rng, spec):
    xs = [rng.randrange(spec.p) for _ in range(16)]
    ys = [rng.randrange(spec.p) for _ in range(16)]
    a = jnp.asarray(ints_to_limbs([spec.to_mont(x) for x in xs], NUM_LIMBS))
    b = jnp.asarray(ints_to_limbs([spec.to_mont(y) for y in ys], NUM_LIMBS))
    got = [spec.from_mont(v) for v in
           limbs_to_ints(np.asarray(fp.mont_mul(spec, a, b)))]
    assert got == [x * y % spec.p for x, y in zip(xs, ys)]


def test_ntt_small_field(rng):
    n = 16
    xs = [rng.randrange(SMALL.p) for _ in range(n)]
    a = jnp.asarray(ints_to_limbs([SMALL.to_mont(x) for x in xs], NUM_LIMBS))
    back = ntt.intt(SMALL, ntt.ntt(SMALL, a))
    got = [SMALL.from_mont(v) for v in limbs_to_ints(np.asarray(back))]
    assert got == xs


def test_fp3_axioms(rng):
    par = host_ext.Fp3Params(p=FR.p, non_residue=2)
    a = tuple(rng.randrange(FR.p) for _ in range(3))
    b = tuple(rng.randrange(FR.p) for _ in range(3))
    ab = host_ext.fp3_mul(par, a, b)
    ba = host_ext.fp3_mul(par, b, a)
    assert ab == ba
    ainv = host_ext.fp3_inv(par, a)
    assert host_ext.fp3_mul(par, a, ainv) == host_ext.fp3_one()


def test_fp6_2over3_axioms(rng):
    par = host_ext.Fp3Params(p=FR.p, non_residue=2)
    a = (tuple(rng.randrange(FR.p) for _ in range(3)),
         tuple(rng.randrange(FR.p) for _ in range(3)))
    ainv = host_ext.fp6_2over3_inv(par, a)
    one = host_ext.fp6_2over3_mul(par, a, ainv)
    assert one == ((1, 0, 0), (0, 0, 0))


def test_complex_dft_roundtrip():
    xs = [(float(i), float(-i)) for i in range(8)]
    f = host_ext.naive_complex_dft(xs)
    # inverse = conj -> dft -> conj / n
    conj = [(re, -im) for re, im in f]
    back = host_ext.naive_complex_dft(conj)
    for (re, im), (xr, xi) in zip(
            [(r / 8, -i / 8) for r, i in back], xs):
        assert abs(re - xr) < 1e-9 and abs(im - xi) < 1e-9


def test_fake_group_msm(rng):
    g = fake.FAKE
    n = 8
    ks = [rng.randrange(FR.p) for _ in range(n)]
    vals = [rng.randrange(FR.p) for _ in range(n)]
    pdev = g.points_to_device(vals)
    sdev = jnp.asarray(ints_to_limbs(ks, NUM_LIMBS))
    got = g.points_to_host(
        tuple(c[..., None] for c in g.tree_reduce(
            g.scalar_mul(pdev, sdev), n)))[0]
    assert got == g.host.naive_msm(ks, vals)


def test_sorted_and_boscoster_msm(rng):
    from octopuszk_tpu.curves import bn254
    g = bn254.G1
    n = 12
    ks = [rng.randrange(1, 1 << 60) for _ in range(n - 2)] + [0, 5]
    # duplicate scalars too (the reference's regression case)
    ks[1] = ks[0]
    pts = [g.host.mul(g.generator_affine, rng.randrange(1, FR.p))
           for _ in range(n)]
    expect = g.host.naive_msm(ks, pts)
    assert msm.sorted_msm_host(g, ks, pts) == expect
    assert msm.bos_coster_msm_host(g, ks, pts) == expect
