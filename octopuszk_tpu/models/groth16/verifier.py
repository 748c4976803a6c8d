"""Groth16 verifier (host-side: 3 pairings + one tiny MSM).

Reference parity: zk_proof_systems/zkSNARK/Verifier.verify
(Verifier.java:25-58): check e(A, B) == e(alpha, beta) * e(evalABC, gamma)
* e(C, delta) with evalABC = sum primary_i * gammaABC_i.
"""

from __future__ import annotations

from octopuszk_tpu.curves import host_curve, pairing
from octopuszk_tpu.fields import host_tower as tw
from octopuszk_tpu.models.groth16.objects import Proof, VerificationKey


def verify(vk: VerificationKey, primary, proof: Proof) -> bool:
    assert primary[0] == 1, "primary input must start with the constant one"
    ab = pairing.reduced_pairing(proof.a, proof.b)
    eval_abc = host_curve.naive_msm_g1(primary, vk.gamma_abc_g1)
    rhs = tw.fp12_mul(
        vk.alpha_beta_gt,
        tw.fp12_mul(pairing.reduced_pairing(eval_abc, vk.gamma_g2),
                    pairing.reduced_pairing(proof.c, vk.delta_g2)))
    return ab == rhs
