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

from octopuszk_tpu.fields import fp
from octopuszk_tpu.fields.spec import NUM_LIMBS
from octopuszk_tpu.models.groth16.objects import CRS, ProvingKey, VerificationKey
from octopuszk_tpu.ops import msm
from octopuszk_tpu.reductions.r1cs_to_qap import qap_instance
from octopuszk_tpu.utils.bigint import int_to_limbs


def _const(spec, x: int):
    return jnp.asarray(int_to_limbs(spec.to_mont(x % spec.p), NUM_LIMBS))


import functools

import jax


@functools.cache
def _setup_scalars(spec, ni: int, m: int, bucket: int):
    """Jitted pipeline: query scalar vectors (padded to `bucket`, raw
    non-Montgomery limbs ready for fixed-base MSM digit extraction)."""

    def pad2(x):
        return jnp.pad(x, ((0, 0), (0, bucket - x.shape[1])))

    @jax.jit
    def run(at, bt, ct, ht, beta_c, alpha_c, ig_c, id_c, ztid_c):
        at, bt, ct, ht = pad2(at), pad2(bt), pad2(ct), pad2(ht)
        # abc_i = beta*At_i + alpha*Bt_i + Ct_i   (device, Montgomery)
        abc = fp.add(
            spec,
            fp.add(spec,
                   fp.mont_mul(spec, at, beta_c[:, None]),
                   fp.mont_mul(spec, bt, alpha_c[:, None])),
            ct)
        gamma_abc = pad2(fp.mont_mul(spec, abc[:, :ni], ig_c[:, None]))
        delta_abc = pad2(fp.mont_mul(spec, abc[:, ni:m], id_c[:, None]))
        ht_scaled = fp.mont_mul(spec, ht, ztid_c[:, None])

        def raw(x):
            return fp.from_mont(spec, x)

        return (raw(at), raw(bt), raw(gamma_abc), raw(delta_abc),
                raw(ht_scaled))

    return run


def setup(r1cs, seed: int = 1, curve=None) -> CRS:
    """Generate the CRS for an R1CS relation.

    ``curve``: a curves/family.py bundle; defaults to BN254a.  (The
    reference dispatches BN254a vs BN254b by profiler app name,
    Profiler.java:34,67,248.)"""
    if curve is None:
        from octopuszk_tpu.curves.family import bn254a
        curve = bn254a()
    fr = curve.fr
    g1_grp, g2_grp = curve.g1, curve.g2
    rng = random.Random(seed)
    t, alpha, beta, gamma, delta = (rng.randrange(1, fr.p) for _ in range(5))
    inv_gamma = pow(gamma, -1, fr.p)
    inv_delta = pow(delta, -1, fr.p)

    import os as _os
    import time as _time0
    _tq = _time0.perf_counter()
    qap = qap_instance(fr, r1cs, t)
    if _os.environ.get("OCTOPUSZK_SETUP_TIMERS"):
        np.asarray(jax.tree_util.tree_leaves(qap.at)[0]).ravel()[:1]
        print(f"setup-stage qap-instance: {_time0.perf_counter() - _tq:.3f}s",
              flush=True)
    ni, m = qap.num_inputs, qap.num_variables

    # pad every query-scalar vector to ONE common power-of-two bucket:
    # padded scalars are zero ([0]G = identity points), so MSM results are
    # unchanged while all queries (and all circuits in a size bucket)
    # share a single compiled fixed-base/Pippenger graph per group
    bucket = 1 << max(1, (max(m, qap.ht.shape[1]) - 1).bit_length())

    # random group generators (reference: g1Factory.random, SerialSetup.java:92)
    g1_gen = g1_grp.host.mul(g1_grp.generator_affine, rng.randrange(1, fr.p))
    g2_gen = g2_grp.host.mul(g2_grp.generator_affine, rng.randrange(1, fr.p))
    g1_dev = g1_grp.point_to_device(g1_gen)
    g2_dev = g2_grp.point_to_device(g2_gen)

    import os
    import time as _time
    _timers = os.environ.get("OCTOPUSZK_SETUP_TIMERS")
    _t = _time.perf_counter

    def _mark(label, since, value=None):
        # force materialization so the stage is actually done (the axon
        # tunnel does not reliably block in block_until_ready; a host
        # fetch does)
        if _timers:
            if value is not None:
                leaf = jax.tree_util.tree_leaves(value)[0]
                np.asarray(leaf).ravel()[:1]
            print(f"setup-stage {label}: {_t() - since:.3f}s", flush=True)
        return _t()

    t0 = _t()
    cst = lambda x: _const(fr, x)
    scal = _setup_scalars(fr, ni, m, bucket)(
        qap.at, qap.bt, qap.ct, qap.ht, cst(beta), cst(alpha),
        cst(inv_gamma), cst(inv_delta),
        cst(qap.zt * inv_delta % fr.p))
    at_raw, bt_raw, gamma_raw, delta_raw, ht_raw = scal
    t0 = _mark("scalars", t0, scal)

    # fixed-base batch MSMs for all queries (FixedBaseMSM.batchMSM role),
    # then pack each query into the at-rest affine row layout the prover's
    # large-MSM path gathers from (pack once here, reuse across proofs —
    # the reference re-marshals Java arrays into JNI buffers per call)
    pad_to = msm._msm_pad_to(g1_grp, bucket, None, 22)

    def enc(group, gen_dev, scalars):
        pts = msm.fixed_base_msm(group, gen_dev, scalars)
        return msm.points_to_packed(group, pts, pad_to=pad_to)

    query_a = enc(g1_grp, g1_dev, at_raw)
    t0 = _mark("enc-A(g1)", t0, query_a)
    query_b_g1 = enc(g1_grp, g1_dev, bt_raw)
    t0 = _mark("enc-B(g1)", t0, query_b_g1)
    query_b_g2 = enc(g2_grp, g2_dev, bt_raw)
    t0 = _mark("enc-B(g2)", t0, query_b_g2)
    delta_abc_g1 = enc(g1_grp, g1_dev, delta_raw)
    t0 = _mark("enc-deltaABC(g1)", t0, delta_abc_g1)
    query_h = enc(g1_grp, g1_dev, ht_raw)
    t0 = _mark("enc-H(g1)", t0, query_h)
    gamma_abc_g1 = msm.fixed_base_msm(g1_grp, g1_dev, gamma_raw)
    t0 = _mark("enc-gammaABC(g1)", t0, gamma_abc_g1)

    alpha_g1 = g1_grp.host.mul(g1_gen, alpha)
    beta_g1 = g1_grp.host.mul(g1_gen, beta)
    beta_g2 = g2_grp.host.mul(g2_gen, beta)
    delta_g1 = g1_grp.host.mul(g1_gen, delta)
    delta_g2 = g2_grp.host.mul(g2_gen, delta)
    gamma_g2 = g2_grp.host.mul(g2_gen, gamma)
    alpha_beta_gt = curve.pairing.reduced_pairing(alpha_g1, beta_g2)

    pk = ProvingKey(
        alpha_g1=alpha_g1, beta_g1=beta_g1, beta_g2=beta_g2,
        delta_g1=delta_g1, delta_g2=delta_g2,
        delta_abc_g1=delta_abc_g1, query_a=query_a,
        query_b_g1=query_b_g1, query_b_g2=query_b_g2,
        query_h=query_h, r1cs=r1cs, packed=True)
    vk = VerificationKey(
        alpha_beta_gt=alpha_beta_gt, gamma_g2=gamma_g2, delta_g2=delta_g2,
        gamma_abc_g1=g1_grp.points_to_host(gamma_abc_g1)[:ni])
    return CRS(proving_key=pk, verification_key=vk)
