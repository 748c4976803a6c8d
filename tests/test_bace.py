"""BACE subsystem tests: honest prover accepted, malicious rejected.

Reference test parity: bace/BaceTest.java:71-96.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from octopuszk_tpu.fields.spec import FR, NUM_LIMBS
from octopuszk_tpu.models.bace import prover, verifier
from octopuszk_tpu.models.bace.circuit import (
    Circuit, ConstantGate, InputGate, ProductGate, SumGate)
from octopuszk_tpu.utils.bigint import ints_to_limbs, limbs_to_ints

P = FR.p


def _circuit():
    # (x0 * x1 + x2) * (x0 + 7)
    x0, x1, x2 = InputGate(0), InputGate(1), InputGate(2)
    g = ProductGate(SumGate(ProductGate(x0, x1), x2),
                    SumGate(x0, ConstantGate(7)))
    return Circuit(3, g)


def _eval_host(xs):
    return (xs[0] * xs[1] + xs[2]) * (xs[0] + 7) % P


@pytest.fixture
def instance(rng):
    c = _circuit()
    K = 8
    vals = [[rng.randrange(P) for _ in range(3)] for _ in range(K)]
    flat = [v for inst in vals for v in inst]   # element k*S + j
    dev = jnp.asarray(ints_to_limbs([FR.to_mont(v) for v in flat],
                                    NUM_LIMBS))
    return c, K, vals, dev


def test_honest_prover_accepted(instance):
    c, K, vals, dev = instance
    proof = prover.compute_proof(FR, c, dev, K)
    assert verifier.verify_proof(FR, c, proof, dev, K, seed=1)
    # results match per-instance evaluation
    res = verifier.get_result(FR, c, proof, K)
    got = [FR.from_mont(v) for v in limbs_to_ints(np.asarray(res))]
    assert got == [_eval_host(v) for v in vals]


def test_malicious_prover_rejected(instance):
    c, K, vals, dev = instance
    proof = prover.compute_proof(FR, c, dev, K)
    bad = proof.at[0, 0].set((proof[0, 0] + 1) % (1 << 16))
    assert not verifier.verify_proof(FR, c, bad, dev, K, seed=1)
