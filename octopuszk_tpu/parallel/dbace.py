"""Distributed BACE prover over a device mesh.

Reference parity: bace/Prover.computeProof (bace/Prover.java:40-93) —
the Spark pipeline is: per-input-poly FFT inside partitions, a
flatMapToPair+combineByKey TRANSPOSE shuffle, per-column circuit
evaluation, then a distributed inverse FFT.  TPU-native mapping:

* per-column size-K iNTT / size-D NTT  -> parallel/dntt.py (all_to_all
  4-step) per input polynomial (S is small, K and D are the large axes);
* the transpose shuffle                -> nothing: the evaluations stay
  batch-sharded over the proof domain D, which co-shards every column;
* per-column circuit evaluation        -> one vectorized elementwise
  dataflow over the local D/d points (XLA partitions it; no collective);
* final distributed inverse FFT        -> dntt over the sharded [L, D].
"""

from __future__ import annotations

import jax.numpy as jnp

from octopuszk_tpu.fields.spec import FieldSpec
from octopuszk_tpu.models.bace.circuit import Circuit
from octopuszk_tpu.models.bace.prover import proof_size
from octopuszk_tpu.ops import ntt
from octopuszk_tpu.parallel import dntt, mesh as pmesh


def distributed_compute_proof(mesh, spec: FieldSpec, circuit: Circuit,
                              inputs, num_inputs: int):
    """R(z) coefficients uint32[L, D] (Montgomery), sharded over D.

    ``inputs``: uint32[L, K*S] Montgomery, element k*S + j = instance k's
    j-th input (the serial prover's layout, models/bace/prover.py).
    """
    d = mesh.devices.size
    K = num_inputs
    S = circuit.input_size
    D = proof_size(circuit, K)
    assert D % d == 0 and D >= d * d, (
        f"distributed BACE needs d^2 <= D and d | D (D={D}, d={d})")
    L = inputs.shape[0]
    cols = inputs.reshape(L, K, S)

    col_evals = []
    for j in range(S):
        cj = cols[:, :, j]                              # [L, K]
        if K >= d * d and K % d == 0:
            coeff = dntt.distributed_ntt(
                mesh, spec, pmesh.shard_vector(mesh, cj), inverse=True)
            coeff = jnp.asarray(coeff)
        else:
            coeff = ntt.intt(spec, cj)                  # small-K fallback
        padded = pmesh.shard_vector(
            mesh, jnp.pad(coeff, ((0, 0), (0, D - K))))
        col_evals.append(dntt.distributed_ntt(mesh, spec, padded))

    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    evals = jax.device_put(                             # [L, S, D]
        jnp.stack(col_evals, axis=1),
        NamedSharding(mesh, P(None, None, pmesh.AXIS)))
    # elementwise circuit evaluation over the sharded domain axis — XLA
    # partitions it with zero communication (each chip evaluates its own
    # D/d points; role of the reference's per-column Spark tasks)
    r = circuit.compute(spec, evals)                    # [L, D] sharded
    return dntt.distributed_ntt(
        mesh, spec, pmesh.shard_vector(mesh, r), inverse=True)
