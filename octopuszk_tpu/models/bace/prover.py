"""BACE prover: Merlin-Arthur proof for batch circuit evaluation.

Reference parity: bace/Prover.computeProof (bace/Prover.java:40-93) —
column LDE interpolation (size-K iNTT per input column), low-degree
extension to the proof domain D = nextpow2(totalDegree * K), circuit
evaluation at all D points at once, and a final iNTT producing the proof
polynomial R(z).  The reference's flatMapToPair+combineByKey transpose is
just an axis swap here.
"""

from __future__ import annotations

import jax.numpy as jnp

from octopuszk_tpu.fields.spec import FieldSpec
from octopuszk_tpu.models.bace.circuit import Circuit
from octopuszk_tpu.ops import ntt


def proof_size(circuit: Circuit, num_inputs: int) -> int:
    d = circuit.total_degree() * num_inputs
    return 1 << max(0, (d - 1).bit_length())


def input_polynomials(spec: FieldSpec, circuit: Circuit, inputs,
                      num_inputs: int):
    """Column LDE coefficients: uint32[L, K, S] from interleaved inputs.

    ``inputs``: uint32[L, K*S] Montgomery, element k*S + j = instance k's
    j-th input (bace/Common.getInputColumns layout).
    """
    S = circuit.input_size
    K = num_inputs
    cols = inputs.reshape(inputs.shape[0], K, S)
    return ntt.ntt_batched(spec, cols, inverse=True)  # iNTT along K axis


def compute_proof(spec: FieldSpec, circuit: Circuit, inputs,
                  num_inputs: int):
    """Returns R(z) coefficients uint32[L, D] (Montgomery)."""
    K = num_inputs
    D = proof_size(circuit, K)
    coeffs = input_polynomials(spec, circuit, inputs, K)   # [L, K, S]
    L, _, S = coeffs.shape
    padded = jnp.zeros((L, D, S), dtype=coeffs.dtype).at[:, :K].set(coeffs)
    evals = ntt.ntt_batched(spec, padded)                  # [L, D, S]
    # circuit on every domain point: inputs [L, S, D]
    r = circuit.compute(spec, jnp.moveaxis(evals, 1, 2))   # [L, D]
    return ntt.intt(spec, r)
