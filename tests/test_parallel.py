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
