"""Packed-row fixed-base MSM path tests (the n >= FIXED_PACKED_MIN
production path of setup), in their own module so the per-module
jax.clear_caches() fixture bounds the XLA:CPU compile population
(see tests/conftest.py)."""

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


@pytest.mark.parametrize("grp", GROUPS, ids=lambda g: g.name)
def test_fixed_base_msm_packed_path(rng, grp, monkeypatch):
    """The packed-row fixed-base evaluation (the n >= FIXED_PACKED_MIN
    production path of setup) forced down to a tiny size: XLA-fallback
    window scan + chunking (2 chunks)."""
    monkeypatch.setattr(msm, "FIXED_PACKED_MIN", 1)
    monkeypatch.setattr(msm, "FIXED_CHUNK_LOG", 4)
    n = 32
    ks = [rng.randrange(FR.p) for _ in range(n - 2)] + [0, 1]
    base = _rand_points(rng, grp, 1)[0]
    got = grp.points_to_host(msm.fixed_base_msm(
        grp, grp.point_to_device(base), _scalars_dev(ks), 9))
    assert got == [grp.host.mul(base, k) for k in ks]


def test_fixed_base_msm_packed_interpret(rng, monkeypatch):
    """Packed fixed-base eval through the fused mixed-add TOTAL kernel
    under pallas interpret mode (CI coverage of the Mosaic path)."""
    from octopuszk_tpu.ops import pallas_ops
    grp = bn254.G1
    monkeypatch.setattr(msm, "FIXED_PACKED_MIN", 1)
    monkeypatch.setattr(msm, "FIXED_CHUNK_LOG", 7)
    n = 128
    ks = [rng.randrange(FR.p) for _ in range(n - 2)] + [0, 1]
    base = _rand_points(rng, grp, 1)[0]
    monkeypatch.setenv("OCTOPUSZK_PALLAS", "interpret")
    pallas_ops.reset_mode_caches()
    try:
        got = grp.points_to_host(msm.fixed_base_msm(
            grp, grp.point_to_device(base), _scalars_dev(ks), 8))
    finally:
        monkeypatch.delenv("OCTOPUSZK_PALLAS")
        pallas_ops.reset_mode_caches()
    assert got == [grp.host.mul(base, k) for k in ks]


