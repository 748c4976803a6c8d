"""Distributed-layer tests on the 8-device CPU mesh.

Reference test parity: DistributedFFTTest.java, DistributedVariableBase/
FixedBaseMSMTest.java, exercised exactly like the reference uses
local-mode Spark — here a virtual 8-device mesh (conftest.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from octopuszk_tpu.curves import bn254, group_ops as jac
from octopuszk_tpu.fields.spec import FR, NUM_LIMBS
from octopuszk_tpu.ops import ntt
from octopuszk_tpu.parallel import dmsm, dntt, mesh as pmesh
from octopuszk_tpu.utils.bigint import ints_to_limbs, limbs_to_ints

P = FR.p


@pytest.fixture(autouse=True)
def _bound_compiles_per_test():
    """Large distributed modules (fused double MSM, mesh NTT) push the
    XLA:CPU compiler-state accumulation over its segfault edge when a
    whole file compiles in one process (tests/conftest.py) — bound the
    population per TEST here."""
    yield
    jax.clear_caches()


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8
    return pmesh.make_mesh()


def _dev(xs):
    return jnp.asarray(ints_to_limbs([FR.to_mont(x) for x in xs], NUM_LIMBS))


def _host(arr):
    return [FR.from_mont(v) for v in limbs_to_ints(np.asarray(arr))]


@pytest.mark.parametrize("n", [64, 256])
def test_distributed_ntt_matches_serial(rng, mesh, n):
    xs = [rng.randrange(P) for _ in range(n)]
    x = pmesh.shard_vector(mesh, _dev(xs))
    got = dntt.distributed_ntt(mesh, FR, x)
    assert _host(got) == _host(ntt.ntt(FR, _dev(xs)))


def test_distributed_intt_roundtrip(rng, mesh):
    n = 64
    xs = [rng.randrange(P) for _ in range(n)]
    x = pmesh.shard_vector(mesh, _dev(xs))
    back = dntt.distributed_ntt(mesh, FR, dntt.distributed_ntt(mesh, FR, x),
                                inverse=True)
    assert _host(back) == xs


def test_distributed_coset_matches_serial(rng, mesh):
    n = 64
    xs = [rng.randrange(P) for _ in range(n)]
    x = pmesh.shard_vector(mesh, _dev(xs))
    got = dntt.distributed_ntt(mesh, FR, x, coset=True)
    assert _host(got) == _host(ntt.coset_ntt(FR, _dev(xs)))
    back = dntt.distributed_ntt(mesh, FR, got, inverse=True, coset=True)
    assert _host(back) == xs


def _rand_points(rng, grp, n):
    return [grp.host.mul(grp.generator_affine, rng.randrange(1, FR.p))
            for _ in range(n)]


def test_distributed_pippenger(rng, mesh):
    grp = bn254.G1
    n = 32
    ks = [rng.randrange(P) for _ in range(n)]
    pts = _rand_points(rng, grp, n)
    pdev = pmesh.shard_point_batch(mesh, grp.points_to_device(pts))
    sdev = pmesh.shard_vector(mesh, jnp.asarray(ints_to_limbs(ks, NUM_LIMBS)))
    got = dmsm.distributed_pippenger(mesh, grp, pdev, sdev, 4, 2)
    single = grp.points_to_host(jac._map_coords(got, lambda c: c[..., None]))[0]
    assert single == grp.host.naive_msm(ks, pts)


def test_distributed_pippenger_packed(rng, mesh):
    """Packed-path distributed MSM (row-sharded base) == host oracle ==
    serial packed result."""
    from octopuszk_tpu.ops import msm
    grp = bn254.G1
    n = 64   # local 8 points = 2 packed rows per shard
    ks = [rng.randrange(P) for _ in range(n)]
    ks[0] = 0
    pts = _rand_points(rng, grp, n)
    pts[1] = None
    pdev = pmesh.shard_point_batch(mesh, grp.points_to_device(pts))
    packed = dmsm.distributed_pack(mesh, grp, pdev)
    sdev = pmesh.shard_vector(mesh, jnp.asarray(ints_to_limbs(ks, NUM_LIMBS)))
    want = grp.host.naive_msm(ks, pts)
    # pinned c/lanes forces the Pippenger pipeline at this tiny size
    got = dmsm.distributed_pippenger_packed(mesh, grp, packed, sdev,
                                            c=8, lanes=8)
    single = grp.points_to_host(jac._map_coords(got, lambda c: c[..., None]))[0]
    assert single == want
    # default dispatch at this size takes the naive module — same result
    got_n = dmsm.distributed_pippenger_packed(mesh, grp, packed, sdev)
    assert grp.points_to_host(
        jac._map_coords(got_n, lambda c: c[..., None]))[0] == want
    serial_packed = msm.points_to_packed(grp, grp.points_to_device(pts))
    serial = msm.pippenger_msm_packed(grp, serial_packed, jnp.asarray(
        ints_to_limbs(ks, NUM_LIMBS)))
    assert grp.points_to_host(
        jac._map_coords(serial, lambda c: c[..., None]))[0] == want


def test_distributed_fixed_base(rng, mesh):
    grp = bn254.G1
    n = 16
    ks = [rng.randrange(P) for _ in range(n)]
    base = _rand_points(rng, grp, 1)[0]
    sdev = pmesh.shard_vector(mesh, jnp.asarray(ints_to_limbs(ks, NUM_LIMBS)))
    got = dmsm.distributed_fixed_base_msm(
        mesh, grp, pmesh.replicate_point(mesh, grp.point_to_device(base)),
        sdev)
    assert grp.points_to_host(got) == [grp.host.mul(base, k) for k in ks]


def test_distributed_bace_matches_serial(rng, mesh):
    """Distributed BACE proof == serial proof (bace/Prover.java:40-93
    Spark pipeline vs parallel/dbace.py)."""
    from octopuszk_tpu.models.bace import prover as sprover
    from octopuszk_tpu.models.bace.circuit import (
        Circuit, ConstantGate, InputGate, ProductGate, SumGate)
    from octopuszk_tpu.parallel import dbace

    x0, x1, x2 = InputGate(0), InputGate(1), InputGate(2)
    c = Circuit(3, ProductGate(SumGate(ProductGate(x0, x1), x2),
                               SumGate(x0, ConstantGate(7))))
    K = 64  # >= d^2 so stage 1 takes the distributed NTT path
    flat = [rng.randrange(P) for _ in range(3 * K)]
    dev = _dev(flat)
    want = _host(sprover.compute_proof(FR, c, dev, K))
    got = _host(dbace.distributed_compute_proof(mesh, FR, c, dev, K))
    assert got == want


def test_distributed_double_msm_fused(rng, mesh):
    """Fused distributed double MSM (shared digits/sort driving both
    groups' pipelines) == host oracle; exercises 2 chunks and both the
    pinned-Pippenger and naive dispatches."""
    from octopuszk_tpu.ops import msm
    g1, g2 = bn254.G1, bn254.G2
    n = 128   # local 16 points; chunk_log=3 -> 2 chunks of 8/chip
    ks = [rng.randrange(P) for _ in range(n)]
    ks[0] = 0
    p1 = _rand_points(rng, g1, n)
    p2 = _rand_points(rng, g2, n)
    p1[1] = None
    p2[1] = None
    pk1 = dmsm.distributed_pack(
        mesh, g1, pmesh.shard_point_batch(mesh, g1.points_to_device(p1)))
    pk2 = dmsm.distributed_pack(
        mesh, g2, pmesh.shard_point_batch(mesh, g2.points_to_device(p2)))
    sdev = pmesh.shard_vector(mesh, jnp.asarray(ints_to_limbs(ks, NUM_LIMBS)))
    r1, r2 = dmsm.distributed_pippenger_double_packed(
        mesh, g1, g2, pk1, pk2, sdev, c=8, lanes=8, chunk_log=3)
    for grp, r, pts in ((g1, r1, p1), (g2, r2, p2)):
        got = grp.points_to_host(
            jac._map_coords(r, lambda c: c[..., None]))[0]
        assert got == grp.host.naive_msm(ks, pts)
    # default dispatch at this size takes the naive modules — same result
    r1n, r2n = dmsm.distributed_pippenger_double_packed(
        mesh, g1, g2, pk1, pk2, sdev)
    for grp, r, pts in ((g1, r1n, p1), (g2, r2n, p2)):
        got = grp.points_to_host(
            jac._map_coords(r, lambda c: c[..., None]))[0]
        assert got == grp.host.naive_msm(ks, pts)


def test_distributed_bace_verifier(rng, mesh):
    """Distributed BACE verification over the mesh: honest proof accepted,
    corrupted proof rejected (bace/Verifier.java:39-89 Spark role)."""
    from octopuszk_tpu.models.bace.circuit import (
        Circuit, ConstantGate, InputGate, ProductGate, SumGate)
    from octopuszk_tpu.parallel import dbace

    x0, x1 = InputGate(0), InputGate(1)
    c = Circuit(2, ProductGate(SumGate(x0, x1),
                               SumGate(x1, ConstantGate(3))))
    K = 64
    flat = [rng.randrange(P) for _ in range(2 * K)]
    dev = _dev(flat)
    proof = dbace.distributed_compute_proof(mesh, FR, c, dev, K)
    assert dbace.distributed_verify_proof(mesh, FR, c, proof, dev, K, seed=7)
    # malicious prover: perturb one coefficient
    bad = jnp.asarray(proof).at[0, 3].set(
        (jnp.asarray(proof)[0, 3] + 1) % (1 << 16))
    assert not dbace.distributed_verify_proof(mesh, FR, c, bad, dev, K,
                                              seed=7)


def test_distributed_bace_get_result(rng, mesh):
    """distributed_get_result == serial get_result (bace/Verifier.java:
    74-89 role)."""
    from octopuszk_tpu.models.bace import prover as sprover
    from octopuszk_tpu.models.bace import verifier as sverifier
    from octopuszk_tpu.models.bace.circuit import (
        Circuit, InputGate, ProductGate, SumGate)
    from octopuszk_tpu.parallel import dbace

    c = Circuit(2, ProductGate(SumGate(InputGate(0), InputGate(1)),
                               InputGate(1)))
    K = 64
    flat = [rng.randrange(P) for _ in range(2 * K)]
    dev = _dev(flat)
    proof = sprover.compute_proof(FR, c, dev, K)
    want = np.asarray(sverifier.get_result(FR, c, proof, K))
    sharded = pmesh.shard_vector(mesh, proof)
    got = np.asarray(dbace.distributed_get_result(mesh, FR, c, sharded, K))
    np.testing.assert_array_equal(got, want)
