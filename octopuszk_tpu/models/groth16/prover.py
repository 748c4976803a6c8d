"""Groth16 prover, single-chip path.

Reference parity: zk_proof_systems/zkSNARK/SerialProver.prove
(SerialProver.java:26-119): QAP witness map (the 6-NTT pipeline), then
variable-base MSMs over queryA / queryB (G1+G2 fused double MSM) /
queryH / deltaABC, then O(1) host group algebra assembling (A, B, C).

The CRS queries arrive pre-packed in the affine row layout
(ops/msm.py points_to_packed, done once at setup), so every MSM runs the
large-scale signed-digit pipeline with row gathers and fused mixed-add
scans; queryB runs as ONE fused G1+G2 double MSM sharing digit
extraction and the batched sort (VariableBaseMSM.doubleMSM role,
VariableBaseMSM.java:489-771).
"""

from __future__ import annotations

import random

from octopuszk_tpu.curves import group_ops as jac
from octopuszk_tpu.fields import fp
from octopuszk_tpu.models.groth16.objects import Proof, ProvingKey
from octopuszk_tpu.ops import msm
from octopuszk_tpu.reductions.r1cs_to_qap import domain_size, qap_witness
from octopuszk_tpu.relations.r1cs import assignment_to_device, is_satisfied


def _single_to_host(grp, p):
    return grp.points_to_host(jac._map_coords(p, lambda c: c[..., None]))[0]


def prove(pk: ProvingKey, primary, auxiliary, seed: int = 2,
          config=None, curve=None) -> Proof:
    """primary/auxiliary: host int assignments (primary[0] == 1).

    ``curve``: a curves/family.py bundle; defaults to BN254a."""
    if curve is None:
        from octopuszk_tpu.curves.family import bn254a
        curve = bn254a()
    fr = curve.fr
    g1_grp, g2_grp = curve.g1, curve.g2
    rng = random.Random(seed)
    r = rng.randrange(fr.p)
    s = rng.randrange(fr.p)

    r1cs = pk.r1cs
    n = domain_size(r1cs)
    z = assignment_to_device(fr, list(primary) + list(auxiliary))
    if config is not None and config.debug:
        # debug-mode satisfiability assertion before proving
        # (SerialProver.java:32-55 role, gated on config.debugFlag)
        assert bool(is_satisfied(fr, r1cs, z)), "R1CS not satisfied"
    h = qap_witness(fr, r1cs, n, z)
    if config is not None and config.debug:
        # QAP degree check (SerialProver.java:49-53: qapWitness degree
        # bounds): deg H <= n - 2, so the top coefficient must be zero
        import numpy as np
        assert not np.asarray(h[:, n - 1:]).any(), "QAP H degree too high"

    z_raw = fp.from_mont(fr, z)
    h_raw = fp.from_mont(fr, h)
    ni = r1cs.num_inputs

    if pk.packed:
        import numpy as _np

        # host-resident (numpy) queries stream chunk-by-chunk to the
        # device — the 2^24-scale path where the CRS exceeds HBM
        # (docs/HBM_BUDGET.md; serialize.load_crs(device=False))
        streamed = isinstance(pk.query_a, _np.ndarray)
        run_single = (msm.pippenger_msm_packed_stream if streamed
                      else msm.pippenger_msm_packed)
        run_double = (msm.pippenger_double_msm_packed_stream if streamed
                      else msm.pippenger_double_msm_packed)
        eval_a = _single_to_host(
            g1_grp, run_single(g1_grp, pk.query_a, z_raw))
        b1, b2 = run_double(
            g1_grp, g2_grp, pk.query_b_g1, pk.query_b_g2, z_raw)
        eval_b1 = _single_to_host(g1_grp, b1)
        eval_b2 = _single_to_host(g2_grp, b2)
        eval_h = _single_to_host(
            g1_grp, run_single(g1_grp, pk.query_h, h_raw))
        if getattr(pk, "delta_abc_full", False):
            # distributed-setup layout: full-m filtered query — zero the
            # primary scalars so only delta-scaled entries contribute
            import jax.numpy as jnp
            idx = jnp.arange(z_raw.shape[1], dtype=jnp.int32)
            abc_scal = jnp.where(idx[None, :] < ni, jnp.uint32(0), z_raw)
        else:
            abc_scal = z_raw[:, ni:]
        eval_abc = _single_to_host(
            g1_grp, run_single(g1_grp, pk.delta_abc_g1, abc_scal))
    else:
        import jax.numpy as jnp

        def padto(x, q):
            want = q[0].shape[-1] if not isinstance(q[0], tuple) \
                else q[0][0].shape[-1]
            return jnp.pad(x, ((0, 0), (0, want - x.shape[1])))

        def run(grp, q, x):
            return _single_to_host(
                grp, msm.pippenger_msm(grp, q, padto(x, q)))

        eval_a = run(g1_grp, pk.query_a, z_raw)
        eval_b1 = run(g1_grp, pk.query_b_g1, z_raw)
        eval_b2 = run(g2_grp, pk.query_b_g2, z_raw)
        eval_h = run(g1_grp, pk.query_h, h_raw)
        eval_abc = run(g1_grp, pk.delta_abc_g1, z_raw[:, ni:])

    g1, g2 = g1_grp.host, g2_grp.host

    # A = alpha + sum a_i A_i(t) + r*delta
    a_pt = g1.add(g1.add(pk.alpha_g1, eval_a), g1.mul(pk.delta_g1, r))
    # B = beta + sum a_i B_i(t) + s*delta  (G1 and G2 copies)
    b1_pt = g1.add(g1.add(pk.beta_g1, eval_b1), g1.mul(pk.delta_g1, s))
    b2_pt = g2.add(g2.add(pk.beta_g2, eval_b2), g2.mul(pk.delta_g2, s))
    # C = evalABC + evalH + s*A + r*B1 - rs*delta
    c_pt = g1.add(eval_abc, eval_h)
    c_pt = g1.add(c_pt, g1.mul(a_pt, s))
    c_pt = g1.add(c_pt, g1.mul(b1_pt, r))
    c_pt = g1.add(c_pt, g1.neg(g1.mul(pk.delta_g1, r * s % fr.p)))
    return Proof(a=a_pt, b=b2_pt, c=c_pt)
