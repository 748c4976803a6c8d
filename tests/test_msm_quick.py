"""Quick-tier coverage of every public ops/msm.py entry point at tiny
shapes, plus one small serial Groth16 end-to-end.

Shapes are pinned so every test (and the Groth16 e2e) shares the same
compiled executables: n = 64 points -> the packed plan picks lanes=32,
rows=2, c=8 for both the single and the fused double MSM, matching what
the prover compiles for a 2^5-domain circuit.  The round-3 breakage lived
in the packed path's helpers and no quick test touched them; these do.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from octopuszk_tpu.curves import bn254, group_ops as jac
from octopuszk_tpu.fields.spec import FR, NUM_LIMBS
from octopuszk_tpu.ops import msm
from octopuszk_tpu.utils.bigint import ints_to_limbs

pytestmark = pytest.mark.quick

N = 64


def _scalars_dev(ks):
    return jnp.asarray(ints_to_limbs(ks, NUM_LIMBS))


def _rand_points(rng, grp, n):
    return [grp.host.mul(grp.generator_affine, rng.randrange(1, FR.p))
            for _ in range(n)]


def _single_to_host(grp, p):
    return grp.points_to_host(jac._map_coords(p, lambda c: c[..., None]))[0]


def _probe_case(rng, grp, n):
    """Scalars/points with the adversarial edge cases folded in: zero
    scalar, input point at infinity, scalar one, scalar r-1 (= -P)."""
    ks = [rng.randrange(FR.p) for _ in range(n)]
    pts = _rand_points(rng, grp, n)
    ks[0], ks[1], ks[2] = 0, 1, FR.p - 1
    pts[3] = None
    return ks, pts


def test_signed_digits_reconstruct(rng):
    c, num_win = 8, 32
    ks = [0, 1, FR.p - 1] + [rng.randrange(FR.p) for _ in range(13)]
    mags, negs = msm._signed_digits(_scalars_dev(ks), c, num_win)
    mags, negs = np.asarray(mags), np.asarray(negs)
    assert mags.max() <= 1 << (c - 1)
    for i, k in enumerate(ks):
        got = sum(int(mags[j, i]) * (-1) ** int(negs[j, i]) << (c * j)
                  for j in range(num_win))
        assert got == k, i


def test_packed_msm_g1(rng):
    grp = bn254.G1
    ks, pts = _probe_case(rng, grp, N)
    packed = msm.points_to_packed(grp, grp.points_to_device(pts))
    want = grp.host.naive_msm(ks, pts)
    # pinned c/lanes force the Pippenger pipeline (defaults at this size
    # dispatch to the naive module — also checked for agreement)
    got = _single_to_host(
        grp, msm.pippenger_msm_packed(grp, packed, _scalars_dev(ks),
                                      c=8, lanes=32))
    assert got == want
    got_naive = _single_to_host(
        grp, msm.pippenger_msm_packed(grp, packed, _scalars_dev(ks)))
    assert got_naive == want


def test_double_msm_packed_naive_dispatch(rng):
    """Default dispatch at tiny n: the fused double MSM runs the naive
    modules for both groups (the pinned-Pippenger variant lives in the
    slow tier, test_msm_large.py — its G2 windows module is the single
    most expensive XLA:CPU compile in the suite)."""
    g1, g2 = bn254.G1, bn254.G2
    ks = [rng.randrange(FR.p) for _ in range(N)]
    ks[0] = 0
    p1 = _rand_points(rng, g1, N)
    p2 = _rand_points(rng, g2, N)
    r1, r2 = msm.pippenger_double_msm_packed(
        g1, g2,
        msm.points_to_packed(g1, g1.points_to_device(p1)),
        msm.points_to_packed(g2, g2.points_to_device(p2)),
        _scalars_dev(ks))
    assert _single_to_host(g1, r1) == g1.host.naive_msm(ks, p1)
    assert _single_to_host(g2, r2) == g2.host.naive_msm(ks, p2)


def test_msm_large_unpacked_alias(rng):
    # pippenger_msm_large = pack + packed path; identical result
    grp = bn254.G1
    ks, pts = _probe_case(rng, grp, N)
    got = _single_to_host(grp, msm.pippenger_msm_large(
        grp, grp.points_to_device(pts), _scalars_dev(ks), c=8, lanes=32))
    assert got == grp.host.naive_msm(ks, pts)


def test_fixed_and_double_batch_msm(rng):
    g1, g2 = bn254.G1, bn254.G2
    ks = [rng.randrange(FR.p) for _ in range(N - 2)] + [0, 1]
    b1 = _rand_points(rng, g1, 1)[0]
    b2 = _rand_points(rng, g2, 1)[0]
    r1, r2 = msm.double_batch_msm(
        g1, g2, g1.point_to_device(b1), g2.point_to_device(b2),
        _scalars_dev(ks), w=4)
    assert g1.points_to_host(r1) == [g1.host.mul(b1, k) for k in ks]
    assert g2.points_to_host(r2) == [g2.host.mul(b2, k) for k in ks]


def test_host_reference_algorithms(rng):
    grp = bn254.G1
    n = 6
    ks = [rng.randrange(FR.p) for _ in range(n - 2)]
    ks += [ks[0], 0]   # duplicate scalar + zero
    pts = _rand_points(rng, grp, n)
    want = grp.host.naive_msm(ks, pts)
    assert msm.sorted_msm_host(grp, ks, pts) == want
    assert msm.bos_coster_msm_host(grp, ks, pts) == want


def test_groth16_e2e_small():
    """Serial Groth16 at a 2^5 domain: every prover MSM runs the packed
    path at the same shapes the tests above compiled."""
    from octopuszk_tpu.models.groth16 import prover, setup, verifier
    from octopuszk_tpu.relations import construct
    r1cs, primary, aux = construct.serial_construct(29, 3, seed=7)
    crs = setup.setup(r1cs, seed=8)
    proof = prover.prove(crs.proving_key, primary, aux, seed=9)
    assert verifier.verify(crs.verification_key, primary, proof)
    bad = list(primary)
    bad[1] = (bad[1] + 1) % FR.p
    assert not verifier.verify(crs.verification_key, bad, proof)
