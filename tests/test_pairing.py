"""Pairing tests: bilinearity and non-degeneracy on BN254 (host-side).

Reference test parity: BilinearityTest.java:70-…, BNFinalExponentiationTest.
"""

import pytest
from octopuszk_tpu.curves import host_curve as hc, pairing
from octopuszk_tpu.fields import host_tower as tw
from octopuszk_tpu.fields.spec import FR

pytestmark = pytest.mark.quick


def test_bilinearity(rng):
    a = rng.randrange(1, FR.p)
    b = rng.randrange(1, FR.p)
    P = hc.G1_GEN
    Q = hc.G2_GEN
    e_ab = pairing.reduced_pairing(hc.g1_mul(P, a), hc.g2_mul(Q, b))
    e_base = pairing.reduced_pairing(P, Q)
    assert e_ab == pairing.gt_exp(e_base, a * b % FR.p)
    # other factorization
    e_ba = pairing.reduced_pairing(hc.g1_mul(P, b), hc.g2_mul(Q, a))
    assert e_ab == e_ba


def test_non_degenerate():
    e = pairing.reduced_pairing(hc.G1_GEN, hc.G2_GEN)
    assert e != tw.FP12_ONE
    # order r: e^r == 1
    assert pairing.gt_exp(e, 0) == tw.FP12_ONE


def test_identity_pairs():
    assert pairing.reduced_pairing(None, hc.G2_GEN) == tw.FP12_ONE
    assert pairing.reduced_pairing(hc.G1_GEN, None) == tw.FP12_ONE


def test_additivity(rng):
    a = rng.randrange(1, FR.p)
    b = rng.randrange(1, FR.p)
    P = hc.G1_GEN
    Q = hc.G2_GEN
    lhs = pairing.reduced_pairing(hc.g1_mul(P, (a + b) % FR.p), Q)
    rhs = tw.fp12_mul(pairing.reduced_pairing(hc.g1_mul(P, a), Q),
                      pairing.reduced_pairing(hc.g1_mul(P, b), Q))
    assert lhs == rhs


def test_generators_on_curve():
    assert hc.g1_is_on_curve(hc.G1_GEN)
    assert hc.g2_is_on_curve(hc.G2_GEN)
    # subgroup check for G2 generator: r*Q == identity
    assert hc.g2_mul(hc.G2_GEN, FR.p) is None
    assert hc.g1_mul(hc.G1_GEN, FR.p) is None


def test_frobenius_tables_and_fast_final_exp():
    """Frobenius coefficient tables == plain pow(p^k); multi-exp hard part
    == plain pow of (p^4-p^2+1)/r (role of BNPairing.java:153-235)."""
    import random

    from octopuszk_tpu.fields import host_tower as tw
    from octopuszk_tpu.fields.spec import FQ, FR
    from octopuszk_tpu.fields.tower import HostTower

    P = FQ.p
    T = HostTower(P, -1, tw.XI)
    r = random.Random(9)
    a = (tuple((r.randrange(P), r.randrange(P)) for _ in range(3)),
         tuple((r.randrange(P), r.randrange(P)) for _ in range(3)))
    for k in (1, 2, 3):
        assert T.frobenius(a, k) == tw.fp12_pow(a, P ** k)
    hard = (P ** 4 - P ** 2 + 1) // FR.p
    assert T.final_exp_hard(a, FR.p) == tw.fp12_pow(a, hard)
