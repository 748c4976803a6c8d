"""R1CS -> QAP reduction: instance map (at t) and witness map.

Reference parity: reductions/r1cs_to_qap/R1CStoQAP.java —
``R1CStoQAPRelation`` (…java:37-97): Lagrange-basis accumulation of
At/Bt/Ct + input-consistency rows + powers-of-t Ht + Zt; and
``R1CStoQAPWitness`` (…java:125-238): the prover's 6-FFT pipeline
(evaluate A,B,C on S -> iNTT -> coset NTT -> H = (A*B - C)/Z on coset ->
coset iNTT).  Here both maps are pure array dataflow: the per-constraint
accumulation loops become transpose-matvecs (rmatvec) and the
assignment-evaluation loops become matvecs — segment sums instead of
Spark joins (R1CStoQAPRDD.java:44-270).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from octopuszk_tpu.fields import fp
from octopuszk_tpu.fields.spec import FieldSpec, NUM_LIMBS
from octopuszk_tpu.ops import ntt
from octopuszk_tpu.relations.r1cs import R1CS, matvec, rmatvec
from octopuszk_tpu.utils.bigint import int_to_limbs


def domain_size(r1cs: R1CS) -> int:
    n = r1cs.num_constraints + r1cs.num_inputs
    return 1 << (n - 1).bit_length()


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class QAPInstance:
    """QAP evaluated at t: At/Bt/Ct uint32[L, m], Ht uint32[L, n+1], all
    Montgomery form.  zt/t are host ints (O(1) secrets live on host)."""

    at: jnp.ndarray
    bt: jnp.ndarray
    ct: jnp.ndarray
    ht: jnp.ndarray
    zt: int
    t: int
    num_inputs: int
    num_variables: int
    degree: int

    def tree_flatten(self):
        return ((self.at, self.bt, self.ct, self.ht),
                (self.zt, self.t, self.num_inputs, self.num_variables,
                 self.degree))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)


@functools.partial(jax.jit, static_argnums=(0, 2))
def _instance_core(spec: FieldSpec, r1cs: R1CS, n: int, t_mont):
    nc, ni = r1cs.num_constraints, r1cs.num_inputs
    lag = ntt.lagrange_coeffs(spec, n, t_mont)          # [L, n]
    w = lag[:, :nc]
    at = rmatvec(spec, r1cs.a, w)
    bt = rmatvec(spec, r1cs.b, w)
    ct = rmatvec(spec, r1cs.c, w)
    # input consistency: At_i += L_{nc+i}(t) for i < numInputs
    consist = jnp.zeros_like(at).at[:, :ni].set(lag[:, nc:nc + ni])
    at = fp.add(spec, at, consist)
    ht = ntt.powers(spec, t_mont, _next_pow2(n + 1))[:, :n + 1]
    return at, bt, ct, ht


def qap_instance(spec: FieldSpec, r1cs: R1CS, t: int) -> QAPInstance:
    """Instance map at host secret t. R1CStoQAP.R1CStoQAPRelation."""
    n = domain_size(r1cs)
    ni, m = r1cs.num_inputs, r1cs.num_variables
    t_mont = jnp.asarray(int_to_limbs(spec.to_mont(t), NUM_LIMBS))
    at, bt, ct, ht = _instance_core(spec, r1cs, n, t_mont)
    zt = ntt.compute_z_at(spec, n, t)
    return QAPInstance(at=at, bt=bt, ct=ct, ht=ht, zt=zt, t=t,
                       num_inputs=ni, num_variables=m, degree=n)


def _next_pow2(x: int) -> int:
    return 1 << (x - 1).bit_length()


@functools.partial(jax.jit, static_argnums=(0, 2))
def qap_witness(spec: FieldSpec, r1cs: R1CS, n: int, z):
    """Witness map: full assignment z (uint32[L, m] Montgomery) -> H
    coefficients uint32[L, n+1] Montgomery (degree <= n-2, top two zero).

    Reference: R1CStoQAP.R1CStoQAPWitness (R1CStoQAP.java:125-238).
    """
    nc, ni = r1cs.num_constraints, r1cs.num_inputs
    az = matvec(spec, r1cs.a, z)                  # [L, nc]
    bz = matvec(spec, r1cs.b, z)
    cz = matvec(spec, r1cs.c, z)
    zeros = fp.zeros_like_batch((n,))
    # A evals on S: constraints then input-consistency rows then zero pad
    a_evals = zeros.at[:, :nc].set(az).at[:, nc:nc + ni].set(z[:, :ni])
    b_evals = zeros.at[:, :nc].set(bz)
    c_evals = zeros.at[:, :nc].set(cz)
    a_coset = ntt.coset_ntt(spec, ntt.intt(spec, a_evals))
    b_coset = ntt.coset_ntt(spec, ntt.intt(spec, b_evals))
    c_coset = ntt.coset_ntt(spec, ntt.intt(spec, c_evals))
    from octopuszk_tpu.ops import pallas_ops
    if pallas_ops.enabled() and n >= 4096:
        h_coset = pallas_ops.mul_sub(spec, a_coset, b_coset, c_coset)
    else:
        h_coset = fp.sub(spec, fp.mont_mul(spec, a_coset, b_coset), c_coset)
    h_coset = ntt.divide_by_z_on_coset(spec, h_coset)
    h = ntt.coset_intt(spec, h_coset)             # [L, n]
    return jnp.concatenate([h, fp.zeros_like_batch((1,))], axis=1)
