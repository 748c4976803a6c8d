"""BACE verifier and result extraction.

Reference parity: bace/Verifier.verifyProof (bace/Verifier.java:39-73):
evaluate the proof polynomial and every input-column LDE at a random
point, re-run the circuit on those scalars and compare; and
Verifier.getResult (…java:74-89): NTT the proof and read every
(D/K)-th evaluation as the per-instance circuit output.
"""

from __future__ import annotations

import random

import jax.numpy as jnp

from octopuszk_tpu.fields.spec import FieldSpec, NUM_LIMBS
from octopuszk_tpu.models.bace.circuit import Circuit
from octopuszk_tpu.models.bace.prover import input_polynomials, proof_size
from octopuszk_tpu.ops import ntt, poly
from octopuszk_tpu.fields import fp
from octopuszk_tpu.utils.bigint import int_to_limbs


def verify_proof(spec: FieldSpec, circuit: Circuit, proof, inputs,
                 num_inputs: int, seed: int = 0) -> bool:
    rng = random.Random(seed)
    rho = rng.randrange(spec.p)
    rho_l = jnp.asarray(int_to_limbs(spec.to_mont(rho), NUM_LIMBS))
    claimed = poly.evaluate_poly(spec, proof, rho_l)
    # input column LDEs at rho
    coeffs = input_polynomials(spec, circuit, inputs, num_inputs)
    L, K, S = coeffs.shape
    pw = ntt.powers(spec, rho_l, K)                       # [L, K]
    terms = fp.mont_mul(spec, coeffs, pw[:, :, None])     # [L, K, S]
    # exact per-column sums along the K axis (K <= 2^15 per wide sum)
    wide = terms.sum(axis=1, dtype=jnp.uint32)            # [L, S]
    col_eval = fp.reduce_sum_mont(spec, wide)
    got = circuit.compute(spec, col_eval[:, :, None])[:, 0]
    return bool(jnp.all(fp.eq(claimed, got)))


def get_result(spec: FieldSpec, circuit: Circuit, proof, num_inputs: int):
    """Per-instance circuit outputs uint32[L, K] from the proof."""
    D = proof.shape[1]
    evals = ntt.ntt(spec, proof)
    step = D // num_inputs
    return evals[:, ::step]
