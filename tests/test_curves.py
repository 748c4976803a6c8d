"""Curve-layer differential tests: device Jacobian batches vs host oracle.

Reference test parity: algebra/curves/CurvesTest.java:84-97 (group laws) —
randomized differential checks against the exact python-int implementation.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from octopuszk_tpu.curves import bn254
from octopuszk_tpu.fields.spec import FR, NUM_LIMBS
from octopuszk_tpu.utils.bigint import ints_to_limbs

GROUPS = [bn254.G1, bn254.G2]
N = 8


def _rand_points(rng, grp, n):
    gen = grp.generator_affine
    return [grp.host.mul(gen, rng.randrange(1, FR.p)) for _ in range(n)]


@pytest.mark.parametrize("grp", GROUPS, ids=lambda g: g.name)
def test_roundtrip(rng, grp):
    pts = _rand_points(rng, grp, N) + [None]
    dev = grp.points_to_device(pts)
    assert grp.points_to_host(dev) == pts


@pytest.mark.parametrize("grp", GROUPS, ids=lambda g: g.name)
def test_add_double(rng, grp):
    ps = _rand_points(rng, grp, N)
    qs = _rand_points(rng, grp, N)
    a, b = grp.points_to_device(ps), grp.points_to_device(qs)
    got = grp.points_to_host(grp.add(a, b))
    assert got == [grp.host.add(p, q) for p, q in zip(ps, qs)]
    got2 = grp.points_to_host(grp.double(a))
    assert got2 == [grp.host.add(p, p) for p in ps]


@pytest.mark.parametrize("grp", GROUPS, ids=lambda g: g.name)
def test_add_edge_cases(rng, grp):
    p = _rand_points(rng, grp, 1)[0]
    ps = [p, None, p, p, None]
    qs = [None, p, p, grp.host.neg(p), None]
    a, b = grp.points_to_device(ps), grp.points_to_device(qs)
    got = grp.points_to_host(grp.add(a, b))
    assert got == [p, p, grp.host.add(p, p), None, None]


@pytest.mark.parametrize("grp", GROUPS, ids=lambda g: g.name)
def test_mixed_add(rng, grp):
    ps = _rand_points(rng, grp, 4)
    qs = _rand_points(rng, grp, 3) + [None]
    a = grp.points_to_device(ps)
    qdev = grp.points_to_device(qs)
    x, y, inf = grp.to_affine(qdev)
    got = grp.points_to_host(grp.mixed_add(a, (x, y), inf))
    assert got == [grp.host.add(p, q) for p, q in zip(ps, qs)]


@pytest.mark.parametrize("grp", GROUPS, ids=lambda g: g.name)
def test_scalar_mul(rng, grp):
    ps = _rand_points(rng, grp, 4)
    ks = [rng.randrange(FR.p) for _ in range(3)] + [0]
    a = grp.points_to_device(ps)
    s = jnp.asarray(ints_to_limbs(ks, NUM_LIMBS))
    got = grp.points_to_host(grp.scalar_mul(a, s))
    assert got == [grp.host.mul(p, k) for p, k in zip(ps, ks)]


@pytest.mark.parametrize("grp", GROUPS, ids=lambda g: g.name)
def test_tree_reduce(rng, grp):
    from octopuszk_tpu.curves import group_ops as jac
    ps = _rand_points(rng, grp, 7) + [None]
    a = grp.points_to_device(ps)
    got = grp.tree_reduce(a, 8)     # single point, no batch dim
    acc = None
    for p in ps:
        acc = grp.host.add(acc, p)
    got_b = jac._map_coords(got, lambda c: c[..., None])
    assert grp.points_to_host(got_b) == [acc]
