"""Distributed Groth16 end-to-end on the 8-device CPU mesh.

Reference test parity: DistributedzkSNARKTest.java:115-126 (construct ->
distributed setup -> distributed prove -> verify, local master).
"""

import jax
import pytest

from octopuszk_tpu.fields.spec import FR
from octopuszk_tpu.models.groth16 import verifier
from octopuszk_tpu.parallel import dgroth16, mesh as pmesh
from octopuszk_tpu.relations import construct


@pytest.fixture(scope="module")
def proven():
    assert len(jax.devices()) == 8
    mesh = pmesh.make_mesh()
    # n >= d^2 for the 4-step NTT: nc + ni = 64 -> domain 64 = 8^2
    r1cs, primary, aux = construct.serial_construct(61, 3, seed=21)
    sr = dgroth16.shard_r1cs(mesh, r1cs)
    crs = dgroth16.distributed_setup(mesh, sr, seed=22)
    proof = dgroth16.distributed_prove(mesh, crs.proving_key, primary, aux,
                                       seed=23)
    return crs, primary, proof


def test_distributed_accept(proven):
    crs, primary, proof = proven
    assert verifier.verify(crs.verification_key, primary, proof)


def test_distributed_reject_wrong_input(proven):
    crs, primary, proof = proven
    bad = list(primary)
    bad[1] = (bad[1] + 1) % FR.p
    assert not verifier.verify(crs.verification_key, bad, proof)
