"""BN254b — the reference's second curve family (bn254b/ package,
dispatched by the `zksnark-large` profiler app, Profiler.java:34,67,248).

Mirrors the reference test strategy (CurvesTest.java BN254b cases,
BilinearityTest.java, SerialzkSNARKTest semantics) on the generic
curve-family bundle (curves/family.py): tower axioms, device group law
vs the host oracle, pairing bilinearity, and one end-to-end prove+verify.
"""

import random

import numpy as np
import pytest

from octopuszk_tpu.curves.family import BN254B_PARAMS, bn254b


@pytest.fixture(scope="module")
def cv():
    return bn254b()


def test_tower_axioms(cv, rng=None):
    tw = cv.tower
    r = random.Random(7)
    p = cv.fq.p
    def rand_fp6():
        return tuple((r.randrange(p), r.randrange(p)) for _ in range(3))

    for _ in range(5):
        a12 = (rand_fp6(), rand_fp6())
        b12 = (rand_fp6(), rand_fp6())
        # field axioms in Fp12: commutativity, associativity, inverses
        assert tw.fp12_mul(a12, b12) == tw.fp12_mul(b12, a12)
        ainv = tw.fp12_inv(a12)
        assert tw.fp12_mul(a12, ainv) == tw.FP12_ONE
        # Fp2 norm/inverse consistency under u^2 = -5
        x = (r.randrange(p), r.randrange(p))
        assert tw.fp2_mul(x, tw.fp2_inv(x)) == tw.FP2_ONE


def test_generators_on_curve(cv):
    assert cv.g1.host.is_on_curve(cv.params.g1_gen)
    assert cv.g2.host.is_on_curve(cv.params.g2_gen)
    # subgroup order r kills both generators
    assert cv.g1.host.mul(cv.params.g1_gen, cv.fr.p) is None
    assert cv.g2.host.mul(cv.params.g2_gen, cv.fr.p) is None


def test_device_group_law_matches_host(cv):
    r = random.Random(11)
    for grp in (cv.g1, cv.g2):
        pts = [grp.host.mul(grp.generator_affine, r.randrange(1, cv.fr.p))
               for _ in range(4)] + [None]
        dev = grp.points_to_device(pts)
        # add the batch to its own rotation, compare with host
        rot = grp.points_to_device(pts[1:] + pts[:1])
        out = grp.points_to_host(grp.add(dev, rot))
        want = [grp.host.add(a, b) for a, b in zip(pts, pts[1:] + pts[:1])]
        assert out == want
        out2 = grp.points_to_host(grp.double(dev))
        want2 = [grp.host.add(a, a) for a in pts]
        assert out2 == want2


def test_pairing_bilinearity(cv):
    r = random.Random(13)
    a = r.randrange(2, 1 << 64)
    b = r.randrange(2, 1 << 64)
    P = cv.params.g1_gen
    Q = cv.params.g2_gen
    e = cv.pairing.reduced_pairing
    lhs = e(cv.g1.host.mul(P, a), cv.g2.host.mul(Q, b))
    rhs = cv.pairing.gt_exp(e(P, Q), a * b % cv.fr.p)
    assert lhs == rhs
    assert lhs != cv.pairing.GT_ONE  # non-degenerate
    # e(0, Q) = 1
    assert e(None, Q) == cv.pairing.GT_ONE


def test_msm_device_vs_host(cv):
    from octopuszk_tpu.ops import msm
    r = random.Random(17)
    n = 8
    scalars = [r.randrange(cv.fr.p) for _ in range(n)]
    pts = [cv.g1.host.mul(cv.g1.generator_affine, r.randrange(1, cv.fr.p))
           for _ in range(n)]
    from octopuszk_tpu.utils.bigint import ints_to_limbs
    import jax.numpy as jnp
    sc = jnp.asarray(ints_to_limbs(scalars, 16))
    dev = cv.g1.points_to_device(pts)
    got = cv.g1.points_to_host(
        _as_batch(msm.pippenger_msm_large(cv.g1, dev, sc, chunk_log=4)))[0]
    assert got == cv.g1.host.naive_msm(scalars, pts)


def _as_batch(p):
    from octopuszk_tpu.curves import group_ops as jac
    return jac._map_coords(p, lambda c: c[..., None])


def test_groth16_e2e_bn254b(cv):
    """zksnark-large role: full setup/prove/verify on BN254b."""
    from octopuszk_tpu.models.groth16 import prover, setup, verifier
    from octopuszk_tpu.relations import construct

    r1cs, primary, aux = construct.serial_construct(13, 3, seed=41,
                                                    spec=cv.fr)
    crs = setup.setup(r1cs, seed=42, curve=cv)
    proof = prover.prove(crs.proving_key, primary, aux, seed=43, curve=cv)
    assert verifier.verify(crs.verification_key, primary, proof, curve=cv)
    # soundness spot-check: wrong primary input rejected
    bad = [primary[0]] + [(x + 1) % cv.fr.p for x in primary[1:]]
    assert not verifier.verify(crs.verification_key, bad, proof, curve=cv)
