"""Groth16 prover, single-chip path.

Reference parity: zk_proof_systems/zkSNARK/SerialProver.prove
(SerialProver.java:26-119): QAP witness map (the 6-NTT pipeline), then
variable-base MSMs over queryA / queryB (G1+G2) / queryH / deltaABC, then
O(1) host group algebra assembling (A, B, C).
"""

from __future__ import annotations

import random

from octopuszk_tpu.curves import bn254, group_ops as jac
from octopuszk_tpu.fields import fp
from octopuszk_tpu.fields.spec import FR
from octopuszk_tpu.models.groth16.objects import Proof, ProvingKey
from octopuszk_tpu.ops import msm
from octopuszk_tpu.reductions.r1cs_to_qap import domain_size, qap_witness
from octopuszk_tpu.relations.r1cs import assignment_to_device


def _single_to_host(grp, p):
    return grp.points_to_host(jac._map_coords(p, lambda c: c[..., None]))[0]


def prove(pk: ProvingKey, primary, auxiliary, seed: int = 2) -> Proof:
    """primary/auxiliary: host int assignments (primary[0] == 1)."""
    rng = random.Random(seed)
    r = rng.randrange(FR.p)
    s = rng.randrange(FR.p)

    import jax.numpy as jnp

    r1cs = pk.r1cs
    n = domain_size(r1cs)
    z = assignment_to_device(FR, list(primary) + list(auxiliary))
    h = qap_witness(FR, r1cs, n, z)

    z_raw = fp.from_mont(FR, z)
    h_raw = fp.from_mont(FR, h)
    ni = r1cs.num_inputs

    def padto(x, q):
        """Zero-pad scalars to a query batch's length (setup pads queries
        to powers of two; zero scalars contribute the identity)."""
        want = q[0].shape[-1] if not isinstance(q[0], tuple) \
            else q[0][0].shape[-1]
        return jnp.pad(x, ((0, 0), (0, want - x.shape[1])))

    eval_a = _single_to_host(
        bn254.G1, msm.pippenger_msm(
            bn254.G1, pk.query_a, padto(z_raw, pk.query_a)))
    eval_b1 = _single_to_host(
        bn254.G1, msm.pippenger_msm(
            bn254.G1, pk.query_b_g1, padto(z_raw, pk.query_b_g1)))
    eval_b2 = _single_to_host(
        bn254.G2, msm.pippenger_msm(
            bn254.G2, pk.query_b_g2, padto(z_raw, pk.query_b_g2)))
    eval_h = _single_to_host(
        bn254.G1, msm.pippenger_msm(
            bn254.G1, pk.query_h, padto(h_raw, pk.query_h)))
    eval_abc = _single_to_host(
        bn254.G1, msm.pippenger_msm(
            bn254.G1, pk.delta_abc_g1,
            padto(z_raw[:, ni:], pk.delta_abc_g1)))
    g1, g2 = bn254.G1.host, bn254.G2.host

    # A = alpha + sum a_i A_i(t) + r*delta
    a_pt = g1.add(g1.add(pk.alpha_g1, eval_a), g1.mul(pk.delta_g1, r))
    # B = beta + sum a_i B_i(t) + s*delta  (G1 and G2 copies)
    b1_pt = g1.add(g1.add(pk.beta_g1, eval_b1), g1.mul(pk.delta_g1, s))
    b2_pt = g2.add(g2.add(pk.beta_g2, eval_b2), g2.mul(pk.delta_g2, s))
    # C = evalABC + evalH + s*A + r*B1 - rs*delta
    c_pt = g1.add(eval_abc, eval_h)
    c_pt = g1.add(c_pt, g1.mul(a_pt, s))
    c_pt = g1.add(c_pt, g1.mul(b1_pt, r))
    c_pt = g1.add(c_pt, g1.neg(g1.mul(pk.delta_g1, r * s % FR.p)))
    return Proof(a=a_pt, b=b2_pt, c=c_pt)
