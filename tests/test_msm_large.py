"""Differential tests for the large-scale MSM path (signed digits,
packed-row gathers, mixed-add scans) and its Pallas kernels under
interpret mode — CI coverage of the Mosaic-facing code without TPU
hardware (VERDICT round-1 item: Pallas kernels had zero CI coverage).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from octopuszk_tpu.curves import bn254, group_ops as jac
from octopuszk_tpu.fields import fp
from octopuszk_tpu.fields.spec import FR, FQ, NUM_LIMBS
from octopuszk_tpu.ops import msm
from octopuszk_tpu.utils.bigint import ints_to_limbs


@pytest.fixture(autouse=True)
def _bound_compiles_per_test():
    """XLA:CPU accumulates compiler state until a later large-EC compile
    segfaults (see tests/conftest.py); this file compiles the biggest
    modules in the suite (fused double-MSM windows), so bound the
    population per TEST, not just per module."""
    yield
    jax.clear_caches()


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


@pytest.mark.parametrize("n", [1, 5, 700])
def test_batch_inv_rows(rng, n):
    vals = [rng.randrange(1, FQ.p) for _ in range(n)] + ([0] if n > 2 else [])
    a = jnp.asarray(ints_to_limbs([FQ.to_mont(v) for v in vals], NUM_LIMBS))
    out = fp.batch_inv_rows(FQ, a, lanes=4)
    from octopuszk_tpu.utils.bigint import limbs_to_ints
    got = [FQ.from_mont(v) for v in limbs_to_ints(np.asarray(out))]
    want = [pow(v, FQ.p - 2, FQ.p) if v else 0 for v in vals]
    assert got == want


def _check_large(group, n, rng, c=None, lanes=None, chunk_log=21,
                 with_zero_and_inf=True):
    scalars = _rand_scalars(rng, n)
    pts = _rand_points(rng, group, n)
    if with_zero_and_inf and n >= 4:
        scalars[1] = 0                     # zero scalar
        pts[2] = None                      # input point at infinity
        scalars[3] = 1                     # scalar one
    dev_pts = group.points_to_device(pts)
    sc = jnp.asarray(ints_to_limbs(scalars, NUM_LIMBS))
    got = msm.pippenger_msm_large(group, dev_pts, sc, c=c, lanes=lanes,
                                  chunk_log=chunk_log)
    got_aff = group.points_to_host(jac._map_coords(got, lambda a: a[..., None]))[0]
    want = _host_msm(group, scalars, pts)
    assert got_aff == want


def test_large_msm_g1_xla(rng):
    _check_large(bn254.G1, 97, rng, c=8, lanes=16)


def test_large_msm_g1_chunked(rng):
    # multiple chunks: chunk_log tiny so 3 chunks exercise the chunk scan
    _check_large(bn254.G1, 100, rng, c=8, lanes=8, chunk_log=5)


def test_large_msm_g2_xla(rng):
    _check_large(bn254.G2, 33, rng, c=8, lanes=8)


def test_large_msm_g1_interpret(rng, monkeypatch):
    from octopuszk_tpu.ops import pallas_ops
    monkeypatch.setenv("OCTOPUSZK_PALLAS", "interpret")
    pallas_ops.reset_mode_caches()
    try:
        _check_large(bn254.G1, 300, rng, c=8, lanes=128)
    finally:
        monkeypatch.delenv("OCTOPUSZK_PALLAS")
        pallas_ops.reset_mode_caches()


def test_large_msm_g2_interpret(rng, monkeypatch):
    from octopuszk_tpu.ops import pallas_ops
    monkeypatch.setenv("OCTOPUSZK_PALLAS", "interpret")
    pallas_ops.reset_mode_caches()
    try:
        _check_large(bn254.G2, 150, rng, c=8, lanes=128)
    finally:
        monkeypatch.delenv("OCTOPUSZK_PALLAS")
        pallas_ops.reset_mode_caches()


def test_double_msm_packed_pippenger(rng):
    """Fused G1+G2 double MSM with pinned c/lanes (forces the Pippenger
    windows modules — the path the serial prover takes at scale)."""
    import jax.numpy as jnp
    g1, g2 = bn254.G1, bn254.G2
    n = 64
    ks = _rand_scalars(rng, n)
    ks[0] = 0
    p1 = _rand_points(rng, g1, n)
    p2 = _rand_points(rng, g2, n)
    sc = jnp.asarray(ints_to_limbs(ks, NUM_LIMBS))
    r1, r2 = msm.pippenger_double_msm_packed(
        g1, g2,
        msm.points_to_packed(g1, g1.points_to_device(p1)),
        msm.points_to_packed(g2, g2.points_to_device(p2)),
        sc, c=8, lanes=32)
    for grp, r, pts in ((g1, r1, p1), (g2, r2, p2)):
        got = grp.points_to_host(
            jac._map_coords(r, lambda a: a[..., None]))[0]
        assert got == _host_msm(grp, ks, pts)


def test_pointwise_kernels_interpret(rng, monkeypatch):
    """Fused add/double kernels under interpret mode vs XLA formulas."""
    from octopuszk_tpu.ops import pallas_ops
    n = 300
    pts = _rand_points(rng, bn254.G1, n)
    qts = _rand_points(rng, bn254.G1, n)
    p = bn254.G1.points_to_device(pts)
    q = bn254.G1.points_to_device(qts)
    want_add = jac.add(bn254.G1.ops, p, q)
    want_dbl = jac.double(bn254.G1.ops, p)
    monkeypatch.setenv("OCTOPUSZK_PALLAS", "interpret")
    pallas_ops.reset_mode_caches()
    try:
        got_add = pallas_ops.add_points("G1", p, q)
        got_dbl = pallas_ops.double_points("G1", p)
    finally:
        monkeypatch.delenv("OCTOPUSZK_PALLAS")
        pallas_ops.reset_mode_caches()
    for a, b in zip(got_add, want_add):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(got_dbl, want_dbl):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

