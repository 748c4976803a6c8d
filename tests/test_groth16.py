"""End-to-end Groth16: construct -> setup -> prove -> verify.

Reference test parity: SerialzkSNARKTest.java:141-150 (accept) plus a
soundness-negative check in the spirit of BaceTest.java:71-96 (reject).
"""

import pytest

from octopuszk_tpu.fields.spec import FR
from octopuszk_tpu.models.groth16 import prover, setup, verifier
from octopuszk_tpu.relations import construct


@pytest.fixture(scope="module")
def proven():
    r1cs, primary, aux = construct.serial_construct(14, 3, seed=7)
    crs = setup.setup(r1cs, seed=8)
    proof = prover.prove(crs.proving_key, primary, aux, seed=9)
    return crs, primary, aux, proof


def test_accept(proven):
    crs, primary, aux, proof = proven
    assert verifier.verify(crs.verification_key, primary, proof)


def test_reject_wrong_input(proven):
    crs, primary, aux, proof = proven
    bad = list(primary)
    bad[1] = (bad[1] + 1) % FR.p
    assert not verifier.verify(crs.verification_key, bad, proof)


def test_reject_tampered_proof(proven):
    from octopuszk_tpu.curves import host_curve as hc
    crs, primary, aux, proof = proven
    from octopuszk_tpu.models.groth16.objects import Proof
    tampered = Proof(a=hc.g1_add(proof.a, hc.G1_GEN), b=proof.b, c=proof.c)
    assert not verifier.verify(crs.verification_key, primary, tampered)


def test_matmul_groth16_end_to_end():
    from octopuszk_tpu.relations import apps
    r1cs, primary, aux = apps.matmul_construct(2, 2, 2, seed=44)
    crs = setup.setup(r1cs, seed=45)
    proof = prover.prove(crs.proving_key, primary, aux, seed=46)
    assert verifier.verify(crs.verification_key, primary, proof)


def test_prove_packed_msm_path(proven, monkeypatch):
    """Force the packed Pippenger pipeline (the production path) through
    the serial prover at this tiny size — the default dispatch would pick
    the naive module below msm.NAIVE_THRESHOLD points."""
    from octopuszk_tpu.ops import msm
    crs, primary, aux, _ = proven
    monkeypatch.setattr(msm, "NAIVE_THRESHOLD", 0)
    proof = prover.prove(crs.proving_key, primary, aux, seed=11)
    assert verifier.verify(crs.verification_key, primary, proof)
