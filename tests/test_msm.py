"""MSM differential tests: fixed-base, Pippenger, naive vs host oracle.

Reference test parity: SerialVariableBaseMSMTest.java:31-77,
DistributedVariableBaseMSMTest.java:41-110 (incl. duplicate scalars),
SerialFixedBaseMSMTest.java.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from octopuszk_tpu.curves import bn254, group_ops as jac
from octopuszk_tpu.fields.spec import FR, NUM_LIMBS
from octopuszk_tpu.ops import msm
from octopuszk_tpu.utils.bigint import ints_to_limbs

GROUPS = [bn254.G1, bn254.G2]


def _scalars_dev(ks):
    return jnp.asarray(ints_to_limbs(ks, NUM_LIMBS))


def _rand_points(rng, grp, n):
    return [grp.host.mul(grp.generator_affine, rng.randrange(1, FR.p))
            for _ in range(n)]


def _single_to_host(grp, p):
    return grp.points_to_host(jac._map_coords(p, lambda c: c[..., None]))[0]


@pytest.mark.parametrize("grp", GROUPS, ids=lambda g: g.name)
def test_msm_naive(rng, grp):
    n = 5
    ks = [rng.randrange(FR.p) for _ in range(n - 1)] + [0]
    pts = _rand_points(rng, grp, n)
    got = _single_to_host(
        grp, msm.msm_naive(grp, grp.points_to_device(pts), _scalars_dev(ks)))
    assert got == grp.host.naive_msm(ks, pts)


def test_fixed_base_msm_g1(rng):
    grp = bn254.G1
    n = 16
    ks = [rng.randrange(FR.p) for _ in range(n - 2)] + [0, 1]
    base = _rand_points(rng, grp, 1)[0]
    got = grp.points_to_host(msm.fixed_base_msm(
        grp, grp.point_to_device(base), _scalars_dev(ks), 8))
    assert got == [grp.host.mul(base, k) for k in ks]


def test_fixed_base_msm_g2(rng):
    grp = bn254.G2
    ks = [rng.randrange(FR.p) for _ in range(4)]
    base = _rand_points(rng, grp, 1)[0]
    got = grp.points_to_host(msm.fixed_base_msm(
        grp, grp.point_to_device(base), _scalars_dev(ks), 8))
    assert got == [grp.host.mul(base, k) for k in ks]


@pytest.mark.parametrize("grp", GROUPS, ids=lambda g: g.name)
def test_pippenger(rng, grp):
    n = 32
    ks = [rng.randrange(FR.p) for _ in range(n - 2)] + [0, 1]
    pts = _rand_points(rng, grp, n)
    got = _single_to_host(grp, msm.pippenger_msm(
        grp, grp.points_to_device(pts), _scalars_dev(ks), 5, 8))
    assert got == grp.host.naive_msm(ks, pts)


def test_pippenger_duplicate_scalars(rng):
    # duplicate scalars AND duplicate points (equal-point adds in buckets)
    grp = bn254.G1
    p = _rand_points(rng, grp, 1)[0]
    pts = [p, p, p] + _rand_points(rng, grp, 5)
    k = rng.randrange(FR.p)
    ks = [k, k, k] + [rng.randrange(FR.p) for _ in range(5)]
    got = _single_to_host(grp, msm.pippenger_msm(
        grp, grp.points_to_device(pts), _scalars_dev(ks), 4, 4))
    assert got == grp.host.naive_msm(ks, pts)


def test_pippenger_nondivisible_n(rng):
    grp = bn254.G1
    n = 7  # not a multiple of lanes
    ks = [rng.randrange(FR.p) for _ in range(n)]
    pts = _rand_points(rng, grp, n)
    got = _single_to_host(grp, msm.pippenger_msm(
        grp, grp.points_to_device(pts), _scalars_dev(ks), 6, 4))
    assert got == grp.host.naive_msm(ks, pts)


def test_field_batch_msm(rng):
    from octopuszk_tpu.fields import fp
    from octopuszk_tpu.utils.bigint import int_to_limbs, limbs_to_ints
    base = rng.randrange(FR.p)
    ks = [rng.randrange(FR.p) for _ in range(8)]
    out = msm.field_batch_msm(
        FR, jnp.asarray(int_to_limbs(FR.to_mont(base), NUM_LIMBS)),
        jnp.asarray(ints_to_limbs([FR.to_mont(k) for k in ks], NUM_LIMBS)))
    got = [FR.from_mont(v) for v in limbs_to_ints(np.asarray(out))]
    assert got == [k * base % FR.p for k in ks]


def test_partitioned_host_profiling_variants(rng):
    """distributedSorted/BosCoster/Pippenger profiling parity
    (VariableBaseMSM.java:821-892): partitioned host algorithms agree
    with the naive oracle."""
    grp = bn254.G1
    n = 23
    ks = [rng.randrange(FR.p) for _ in range(n - 1)] + [0]
    pts = _rand_points(rng, grp, n)
    want = grp.host.naive_msm(ks, pts)
    assert msm.distributed_sorted_msm_host(grp, ks, pts, 4) == want
    assert msm.distributed_bos_coster_msm_host(grp, ks, pts, 4) == want
    assert msm.distributed_pippenger_msm_host(grp, ks, pts, 4) == want
