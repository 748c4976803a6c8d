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


@pytest.fixture(autouse=True)
def _bound_compiles_per_test():
    """This file compiles the largest distributed modules (fused double
    MSM, bn254b EC graphs); XLA:CPU accumulates compiler state until a
    later compile segfaults (tests/conftest.py), so bound the population
    per TEST here, not just per module."""
    yield
    jax.clear_caches()


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
    return crs, primary, aux, proof


def test_distributed_accept(proven):
    crs, primary, aux, proof = proven
    assert verifier.verify(crs.verification_key, primary, proof)


def test_distributed_reject_wrong_input(proven):
    crs, primary, aux, proof = proven
    bad = list(primary)
    bad[1] = (bad[1] + 1) % FR.p
    assert not verifier.verify(crs.verification_key, bad, proof)


def test_distributed_prove_packed_msm_path(proven, monkeypatch):
    """Force the packed Pippenger modules (the production path) through
    distributed_prove at this tiny size — the default dispatch would pick
    the naive module below msm.NAIVE_THRESHOLD points/chip (the shared
    constant dmsm reads at call time)."""
    from octopuszk_tpu.ops import msm
    crs, primary, aux, _ = proven
    mesh = pmesh.make_mesh()
    monkeypatch.setattr(msm, "NAIVE_THRESHOLD", 0)
    proof = dgroth16.distributed_prove(mesh, crs.proving_key, primary, aux,
                                       seed=29)
    assert verifier.verify(crs.verification_key, primary, proof)


def test_distributed_is_satisfied():
    """Sharded satisfiability (R1CSRelationRDD.isSatisfied role): accepts
    the honest assignment, rejects a corrupted one."""
    from octopuszk_tpu.relations.r1cs import assignment_to_device

    mesh = pmesh.make_mesh()
    d = mesh.devices.size
    r1cs, primary, aux = construct.serial_construct(21, 3, seed=31)
    sr = dgroth16.shard_r1cs(mesh, r1cs)
    full = primary + aux
    m_pad = dgroth16.sharded_pad(len(full), d)
    z = pmesh.shard_vector(mesh, assignment_to_device(
        FR, full + [0] * (m_pad - len(full))))
    assert dgroth16.distributed_is_satisfied(mesh, FR, sr, z)
    bad = list(full)
    bad[2] = (bad[2] + 1) % FR.p
    z_bad = pmesh.shard_vector(mesh, assignment_to_device(
        FR, bad + [0] * (m_pad - len(bad))))
    assert not dgroth16.distributed_is_satisfied(mesh, FR, sr, z_bad)


def test_distributed_bn254b_end_to_end():
    """The distributed pipeline is curve-generic: BN254b (the reference's
    zksnark-large curve) setup -> prove -> verify on the mesh."""
    from octopuszk_tpu.curves.family import bn254b
    curve = bn254b()
    mesh = pmesh.make_mesh()
    r1cs, primary, aux = construct.serial_construct(
        61, 3, seed=24, spec=curve.fr)
    sr = dgroth16.shard_r1cs(mesh, r1cs)
    crs = dgroth16.distributed_setup(mesh, sr, seed=25, curve=curve)
    proof = dgroth16.distributed_prove(mesh, crs.proving_key, primary, aux,
                                       seed=26, curve=curve)
    assert verifier.verify(crs.verification_key, primary, proof, curve=curve)


def test_distributed_crs_roundtrip(proven, tmp_path):
    """Distributed CRS persistence: gather -> save -> load -> re-shard ->
    distributed prove from the reloaded CRS verifies (VERDICT r4 item:
    a distributed CRS could be neither saved nor rehydrated).  The
    gathered form also proves with the SERIAL prover."""
    from octopuszk_tpu.models.groth16 import prover as sprover, serialize

    crs, primary, aux, _ = proven
    mesh = pmesh.make_mesh()
    gathered = dgroth16.gather_crs(mesh, crs)
    path = str(tmp_path / "dcrs.npz")
    serialize.save_crs(path, gathered)
    reloaded = serialize.load_crs(path)
    # serial prove from the gathered/reloaded CRS
    sproof = sprover.prove(reloaded.proving_key, primary, aux, seed=41)
    assert verifier.verify(reloaded.verification_key, primary, sproof)
    # re-shard onto the mesh and prove distributed
    dcrs = dgroth16.shard_crs(mesh, reloaded)
    dproof = dgroth16.distributed_prove(mesh, dcrs.proving_key, primary,
                                        aux, seed=42)
    assert verifier.verify(dcrs.verification_key, primary, dproof)
