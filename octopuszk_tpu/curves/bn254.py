"""BN254 G1/G2 device groups: Jacobian limb-tensor batches + host bridges.

``G1`` / ``G2`` bundle the complete-projective ops (curves/group_ops.py)
conversions between host affine points (python ints, None = identity — the
format of curves/host_curve.py) and device batches.

Reference parity: BN254aG1.java / BN254aG2.java including their JNI
conversion hooks (AbstractGroup.java:76-86) — here the "serialization
boundary" is just host<->device limb packing at program edges.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from octopuszk_tpu.curves import host_curve, group_ops as jac
from octopuszk_tpu.fields.spec import FQ, NUM_LIMBS
from octopuszk_tpu.utils.bigint import ints_to_limbs, limbs_to_ints


def _last_dim(p):
    c = p[0]
    while isinstance(c, tuple):
        c = c[0]
    return c.shape[-1]


class _Group:
    """One device group: ops adapter + host conversions."""

    def __init__(self, name, ops, gen_affine, coord_dim, host, fq=FQ):
        import jax

        self.name = name
        self.ops = ops
        self.fq = fq
        self.generator_affine = gen_affine
        self.coord_dim = coord_dim  # 1 for Fp (G1), 2 for Fp2 (G2)
        self.host = host            # host_curve function namespace
        # jitted entry points (the groups are singletons, so these compile
        # once per shape and hit the persistent cache across processes)
        self._add = jax.jit(lambda p, q: jac.add(ops, p, q))
        self._double = jax.jit(lambda p: jac.double(ops, p))
        self._mixed = jax.jit(lambda p, q, m: jac.mixed_add(ops, p, q, m))
        self._to_affine = jax.jit(lambda p: jac.to_affine(ops, p))
        self._tree_reduce = jax.jit(
            lambda p: jac.tree_reduce(ops, p, _last_dim(p)))
        self._scalar_mul = jax.jit(
            lambda p, s: jac.scalar_mul(ops, p, s))

    # -- device-side ops --

    def add(self, p, q):
        return self._add(p, q)

    def double(self, p):
        return self._double(p)

    def negate(self, p):
        return jac.negate(self.ops, p)

    def mixed_add(self, p, q_aff, q_inf=None):
        if q_inf is None:
            return jac.mixed_add(self.ops, p, q_aff, None)
        return self._mixed(p, q_aff, q_inf)

    def infinity(self, batch_shape=()):
        return jac.infinity(self.ops, batch_shape)

    def select(self, mask, p, q):
        return jac.select_point(self.ops, mask, p, q)

    def is_infinity(self, p):
        return jac.is_infinity(self.ops, p)

    def to_affine(self, p):
        return self._to_affine(p)

    def tree_reduce(self, p, n):
        assert _last_dim(p) == n
        return self._tree_reduce(p)

    def scalar_mul(self, p, scalars_raw, num_bits=254):
        assert num_bits == 254
        return self._scalar_mul(p, scalars_raw)

    # -- host <-> device --

    def _coord_to_dev(self, vals_per_component):
        """list over components of list of ints -> coord pytree."""
        if self.coord_dim == 1:
            return jnp.asarray(ints_to_limbs(
                [self.fq.to_mont(v) for v in vals_per_component[0]], NUM_LIMBS))
        return tuple(
            jnp.asarray(ints_to_limbs([self.fq.to_mont(v) for v in comp],
                                      NUM_LIMBS))
            for comp in vals_per_component)

    def points_to_device(self, affine_points):
        """List of host affine points (None = identity) -> Jacobian batch."""
        n = len(affine_points)
        if self.coord_dim == 1:
            xs = [[p[0] if p else 0 for p in affine_points]]
            ys = [[p[1] if p else 1 for p in affine_points]]
        else:
            xs = [[p[0][c] if p else 0 for p in affine_points]
                  for c in range(2)]
            ys = [[p[1][c] if p else (1 if c == 0 else 0)
                   for p in affine_points] for c in range(2)]
        zs_int = [0 if p is None else 1 for p in affine_points]
        X = self._coord_to_dev(xs)
        Y = self._coord_to_dev(ys)
        if self.coord_dim == 1:
            Z = jnp.asarray(ints_to_limbs(
                [self.fq.to_mont(z) for z in zs_int], NUM_LIMBS))
        else:
            Z = (jnp.asarray(ints_to_limbs(
                    [self.fq.to_mont(z) for z in zs_int], NUM_LIMBS)),
                 jnp.asarray(np.zeros((NUM_LIMBS, n), dtype=np.uint32)))
        return (X, Y, Z)

    def _coord_to_host(self, coord):
        if self.coord_dim == 1:
            return [self.fq.from_mont(v) for v in limbs_to_ints(np.asarray(coord))]
        comps = [[self.fq.from_mont(v) for v in limbs_to_ints(np.asarray(c))]
                 for c in coord]
        return list(zip(*comps))

    def points_to_host(self, p):
        """Point batch -> list of host affine points (None = identity).

        Pads the batch to a power of two first so the jitted affine
        conversion (254-round Fermat inversion) compiles for log-many
        distinct shapes instead of one per call site."""
        n = _last_dim(p)
        m = 1 << max(0, (n - 1).bit_length())
        if m != n:
            import jax.numpy as _jnp

            p = jac._map_coords(
                p, lambda c: _jnp.pad(c, ((0, 0), (0, m - n))))
        x, y, inf = self._to_affine(p)
        x = jac._map_coords((x,), lambda c: c[..., :n])[0]
        y = jac._map_coords((y,), lambda c: c[..., :n])[0]
        inf = inf[..., :n]
        xs = self._coord_to_host(x)
        ys = self._coord_to_host(y)
        infs = np.asarray(inf).reshape(-1).tolist()
        return [None if i else (xv, yv) for xv, yv, i in zip(xs, ys, infs)]

    def point_to_device(self, affine_point):
        """Single host point -> batch-less (shape [L]) device point."""
        batch = self.points_to_device([affine_point])
        return jac._map_coords(batch, lambda c: c[..., 0])

    def generator(self, batch_shape=()):
        """The group generator broadcast to a batch."""
        g = self.points_to_device([self.generator_affine])
        def bc(c):
            c0 = c[..., 0]
            return jnp.broadcast_to(
                c0.reshape(c0.shape + (1,) * len(batch_shape)),
                c0.shape + tuple(batch_shape))
        return jac._map_coords(g, bc)


class _HostG1:
    add = staticmethod(host_curve.g1_add)
    mul = staticmethod(host_curve.g1_mul)
    neg = staticmethod(host_curve.g1_neg)
    is_on_curve = staticmethod(host_curve.g1_is_on_curve)
    naive_msm = staticmethod(host_curve.naive_msm_g1)


class _HostG2:
    add = staticmethod(host_curve.g2_add)
    mul = staticmethod(host_curve.g2_mul)
    neg = staticmethod(host_curve.g2_neg)
    is_on_curve = staticmethod(host_curve.g2_is_on_curve)
    naive_msm = staticmethod(host_curve.naive_msm_g2)


G1 = _Group("G1", jac.make_fp_ops(FQ), host_curve.G1_GEN, 1, _HostG1)
G2 = _Group("G2", jac.make_fp2_ops(FQ), host_curve.G2_GEN, 2, _HostG2)
