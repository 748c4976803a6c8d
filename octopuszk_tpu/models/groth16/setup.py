"""Groth16 trusted setup (CRS generation), single-chip path.

Reference parity: zk_proof_systems/zkSNARK/SerialSetup.generate
(SerialSetup.java:32-192): sample secrets; QAP instance at t; gammaABC /
deltaABC scalar vectors; encode every query with fixed-base batch MSM on
the accelerator; one alpha*beta pairing for the verification key.
"""

from __future__ import annotations

import random

import jax.numpy as jnp
import numpy as np

from octopuszk_tpu.curves import bn254, pairing
from octopuszk_tpu.fields import fp
from octopuszk_tpu.fields.spec import FR, NUM_LIMBS
from octopuszk_tpu.models.groth16.objects import CRS, ProvingKey, VerificationKey
from octopuszk_tpu.ops import msm
from octopuszk_tpu.reductions.r1cs_to_qap import qap_instance
from octopuszk_tpu.utils.bigint import int_to_limbs


def _const(x: int):
    return jnp.asarray(int_to_limbs(FR.to_mont(x % FR.p), NUM_LIMBS))


def setup(r1cs, seed: int = 1) -> CRS:
    """Generate the CRS for an R1CS relation."""
    rng = random.Random(seed)
    t, alpha, beta, gamma, delta = (rng.randrange(1, FR.p) for _ in range(5))
    inv_gamma = pow(gamma, -1, FR.p)
    inv_delta = pow(delta, -1, FR.p)

    qap = qap_instance(FR, r1cs, t)
    ni, m = qap.num_inputs, qap.num_variables

    # abc_i = beta*At_i + alpha*Bt_i + Ct_i   (device, Montgomery)
    abc = fp.add(
        FR,
        fp.add(FR,
               fp.mont_mul(FR, qap.at, _const(beta)[:, None]),
               fp.mont_mul(FR, qap.bt, _const(alpha)[:, None])),
        qap.ct)
    gamma_abc = fp.mont_mul(FR, abc[:, :ni], _const(inv_gamma)[:, None])
    delta_abc = fp.mont_mul(FR, abc[:, ni:], _const(inv_delta)[:, None])

    # random group generators (reference: g1Factory.random, SerialSetup.java:92)
    g1_gen = bn254.G1.host.mul(bn254.G1.generator_affine, rng.randrange(1, FR.p))
    g2_gen = bn254.G2.host.mul(bn254.G2.generator_affine, rng.randrange(1, FR.p))
    g1_dev = bn254.G1.point_to_device(g1_gen)
    g2_dev = bn254.G2.point_to_device(g2_gen)

    def raw(x):
        return fp.from_mont(FR, x)

    # fixed-base batch MSMs for all queries (FixedBaseMSM.batchMSM role)
    query_a = msm.fixed_base_msm(bn254.G1, g1_dev, raw(qap.at))
    query_b_g1 = msm.fixed_base_msm(bn254.G1, g1_dev, raw(qap.bt))
    query_b_g2 = msm.fixed_base_msm(bn254.G2, g2_dev, raw(qap.bt))
    delta_abc_g1 = msm.fixed_base_msm(bn254.G1, g1_dev, raw(delta_abc))
    ht_scaled = fp.mont_mul(FR, qap.ht,
                            _const(qap.zt * inv_delta % FR.p)[:, None])
    query_h = msm.fixed_base_msm(bn254.G1, g1_dev, raw(ht_scaled))
    gamma_abc_g1 = msm.fixed_base_msm(bn254.G1, g1_dev, raw(gamma_abc))

    alpha_g1 = bn254.G1.host.mul(g1_gen, alpha)
    beta_g1 = bn254.G1.host.mul(g1_gen, beta)
    beta_g2 = bn254.G2.host.mul(g2_gen, beta)
    delta_g1 = bn254.G1.host.mul(g1_gen, delta)
    delta_g2 = bn254.G2.host.mul(g2_gen, delta)
    gamma_g2 = bn254.G2.host.mul(g2_gen, gamma)
    alpha_beta_gt = pairing.reduced_pairing(alpha_g1, beta_g2)

    pk = ProvingKey(
        alpha_g1=alpha_g1, beta_g1=beta_g1, beta_g2=beta_g2,
        delta_g1=delta_g1, delta_g2=delta_g2,
        delta_abc_g1=delta_abc_g1, query_a=query_a,
        query_b_g1=query_b_g1, query_b_g2=query_b_g2,
        query_h=query_h, r1cs=r1cs)
    vk = VerificationKey(
        alpha_beta_gt=alpha_beta_gt, gamma_g2=gamma_g2, delta_g2=delta_g2,
        gamma_abc_g1=bn254.G1.points_to_host(gamma_abc_g1))
    return CRS(proving_key=pk, verification_key=vk)
