"""Fake curves: field elements masquerading as group elements.

Reference parity: algebra/curves/fake/{FakeG1, FakeG2, FakeGT,
FakeInitialize}.java — CPU-cheap test doubles where the "group" is the
additive group of Fr (group add = field add, scalar mul = field mul), so
proof-system plumbing can be exercised without EC cost.  In the
reference these broke when the JNI kernels hard-coded BN254
(SerialzkSNARKTest.java:95-121, commented out); here they work with
every generic code path.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from octopuszk_tpu.fields import fp
from octopuszk_tpu.fields.spec import FR, NUM_LIMBS
from octopuszk_tpu.utils.bigint import int_to_limbs, ints_to_limbs, limbs_to_ints


class _FakeHost:
    """Host-side ops over python ints (None = identity = 0)."""

    @staticmethod
    def add(p, q):
        if p is None:
            return q
        if q is None:
            return p
        r = (p + q) % FR.p
        return r if r else None

    @staticmethod
    def mul(p, k):
        if p is None:
            return None
        r = p * k % FR.p
        return r if r else None

    @staticmethod
    def neg(p):
        return None if p is None else (-p) % FR.p

    @staticmethod
    def naive_msm(scalars, points):
        acc = 0
        for s, pt in zip(scalars, points):
            acc = (acc + s * (pt or 0)) % FR.p
        return acc if acc else None


class FakeGroup:
    """Device 'group': a single Fr limb tensor per element.

    Exposes the same API surface as curves/bn254._Group so MSM / Groth16
    code can run on it; points are (value,) 1-tuples to keep the pytree
    structure uniform with real curves.
    """

    name = "Fake"
    coord_dim = 1
    host = _FakeHost
    generator_affine = 1

    def add(self, p, q):
        return (fp.add(FR, p[0], q[0]),)

    def double(self, p):
        return (fp.add(FR, p[0], p[0]),)

    def negate(self, p):
        return (fp.neg(FR, p[0]),)

    def infinity(self, batch_shape=()):
        return (fp.zeros_like_batch(batch_shape),)

    def is_infinity(self, p):
        return fp.is_zero(p[0])

    def select(self, mask, p, q):
        return (fp.select(mask, p[0], q[0]),)

    def scalar_mul(self, p, scalars_raw, num_bits=254):
        mont = fp.to_mont(FR, scalars_raw)
        return (fp.mont_mul(FR, p[0], mont),)

    def tree_reduce(self, p, n):
        from octopuszk_tpu.ops import poly
        return (poly._wide_sum(FR, p[0]),)

    def points_to_device(self, values):
        return (jnp.asarray(ints_to_limbs(
            [FR.to_mont(v or 0) for v in values], NUM_LIMBS)),)

    def points_to_host(self, p):
        vals = [FR.from_mont(v) for v in limbs_to_ints(np.asarray(p[0]))]
        return [v if v else None for v in vals]

    def point_to_device(self, value):
        return (jnp.asarray(int_to_limbs(FR.to_mont(value or 0),
                                         NUM_LIMBS)),)


FAKE = FakeGroup()
