"""CRS / proof serialization round-trip tests (the reference's documented
checkpoint gap, SURVEY.md §5)."""

import numpy as np
import pytest

from octopuszk_tpu.models.groth16 import prover, serialize, setup, verifier
from octopuszk_tpu.relations import construct


def test_crs_roundtrip(tmp_path):
    r1cs, primary, aux = construct.serial_construct(14, 3, seed=31)
    crs = setup.setup(r1cs, seed=32)
    path = str(tmp_path / "crs.npz")
    serialize.save_crs(path, crs)
    crs2 = serialize.load_crs(path)
    # device arrays equal (packed-row query tensors)
    assert crs2.proving_key.packed == crs.proving_key.packed
    for name in ("query_a", "query_b_g1", "query_b_g2", "query_h",
                 "delta_abc_g1"):
        a = getattr(crs.proving_key, name)
        b = getattr(crs2.proving_key, name)
        assert np.array_equal(np.asarray(a), np.asarray(b))
    # host values equal
    assert crs2.proving_key.alpha_g1 == crs.proving_key.alpha_g1
    assert crs2.verification_key.alpha_beta_gt == \
        crs.verification_key.alpha_beta_gt
    assert crs2.verification_key.gamma_abc_g1 == \
        crs.verification_key.gamma_abc_g1
    # a proof made with the loaded key verifies with the original vk
    proof = prover.prove(crs2.proving_key, primary, aux, seed=33)
    assert verifier.verify(crs.verification_key, primary, proof)


def test_proof_roundtrip(tmp_path):
    r1cs, primary, aux = construct.serial_construct(14, 3, seed=34)
    crs = setup.setup(r1cs, seed=35)
    proof = prover.prove(crs.proving_key, primary, aux, seed=36)
    path = str(tmp_path / "proof.json")
    serialize.save_proof(path, proof)
    proof2 = serialize.load_proof(path)
    assert (proof2.a, proof2.b, proof2.c) == (proof.a, proof.b, proof.c)
    assert verifier.verify(crs.verification_key, primary, proof2)


def test_streamed_prove_from_host_crs(tmp_path):
    """load_crs(device=False) keeps queries on host; the prover streams
    them chunk-by-chunk (docs/HBM_BUDGET.md 2^24 plan) — proof verifies."""
    r1cs, primary, aux = construct.serial_construct(14, 3, seed=44)
    crs = setup.setup(r1cs, seed=45)
    path = str(tmp_path / "crs_stream.npz")
    serialize.save_crs(path, crs)
    crs2 = serialize.load_crs(path, device=False)
    assert isinstance(crs2.proving_key.query_a, np.ndarray)
    proof = prover.prove(crs2.proving_key, primary, aux, seed=46)
    assert verifier.verify(crs.verification_key, primary, proof)
