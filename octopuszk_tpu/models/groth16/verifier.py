"""Groth16 verifier (host-side: 3 pairings + one tiny MSM).

Reference parity: zk_proof_systems/zkSNARK/Verifier.verify
(Verifier.java:25-58): check e(A, B) == e(alpha, beta) * e(evalABC, gamma)
* e(C, delta) with evalABC = sum primary_i * gammaABC_i.

Generic over the curve bundle (curves/family.py); defaults to BN254a —
the reference dispatches BN254a vs BN254b the same way
(Profiler.java:34,67).
"""

from __future__ import annotations

from octopuszk_tpu.models.groth16.objects import Proof, VerificationKey


def verify(vk: VerificationKey, primary, proof: Proof, curve=None) -> bool:
    if curve is None:
        from octopuszk_tpu.curves.family import bn254a
        curve = bn254a()
    assert primary[0] == 1, "primary input must start with the constant one"
    pairing = curve.pairing
    ab = pairing.reduced_pairing(proof.a, proof.b)
    # host Pippenger: the reference GPU-offloads this tiny MSM for BN254a
    # (Verifier.java:45-46); at <= ~2^10 inputs a host windowed sum is
    # faster than a device round-trip + compile
    from octopuszk_tpu.ops import msm
    eval_abc = msm.pippenger_host(curve.g1, list(primary), vk.gamma_abc_g1,
                                  order=curve.fr.p)
    rhs = pairing.gt_mul(
        vk.alpha_beta_gt,
        pairing.gt_mul(pairing.reduced_pairing(eval_abc, vk.gamma_g2),
                       pairing.reduced_pairing(proof.c, vk.delta_g2)))
    return ab == rhs
