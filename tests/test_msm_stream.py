"""Host-streamed packed MSM tests (docs/HBM_BUDGET.md 2^24 plan), in
their own module so the per-module jax.clear_caches() fixture bounds the
XLA:CPU compile population (tests/conftest.py)."""

import jax.numpy as jnp
import numpy as np

from octopuszk_tpu.curves import bn254, group_ops as jac
from octopuszk_tpu.fields.spec import FR, NUM_LIMBS
from octopuszk_tpu.ops import msm
from octopuszk_tpu.utils.bigint import ints_to_limbs


def _rand_scalars(rng, n):
    return [rng.randrange(0, FR.p) for _ in range(n)]


def _rand_points(rng, group, n):
    return [group.host.mul(group.generator_affine, rng.randrange(1, FR.p))
            for _ in range(n)]


def _host_msm(group, scalars, pts):
    acc = None
    for s, p in zip(scalars, pts):
        acc = group.host.add(acc, group.host.mul(p, s))
    return acc


def test_msm_packed_stream_matches_oracle(rng):
    """Host-streamed packed MSM (pinned c/lanes + 3 chunks, forcing the
    actual streaming loop) == host oracle; fused double variant too."""
    g1, g2 = bn254.G1, bn254.G2
    n = 96
    ks = _rand_scalars(rng, n)
    ks[0] = 0
    p1 = _rand_points(rng, g1, n)
    p2 = _rand_points(rng, g2, n)
    sc = np.asarray(ints_to_limbs(ks, NUM_LIMBS), dtype=np.uint32)
    ph1 = np.asarray(msm.points_to_packed(g1, g1.points_to_device(p1)))
    ph2 = np.asarray(msm.points_to_packed(g2, g2.points_to_device(p2)))
    got = msm.pippenger_msm_packed_stream(g1, ph1, sc, c=8, lanes=8,
                                          chunk_log=5)
    got_h = bn254.G1.points_to_host(
        jac._map_coords(got, lambda a: a[..., None]))[0]
    assert got_h == _host_msm(g1, ks, p1)
    r1, r2 = msm.pippenger_double_msm_packed_stream(
        g1, g2, ph1, ph2, sc, c=8, lanes=8, chunk_log=5)
    for grp, r, pts in ((g1, r1, p1), (g2, r2, p2)):
        gh = grp.points_to_host(
            jac._map_coords(r, lambda a: a[..., None]))[0]
        assert gh == _host_msm(grp, ks, pts)
