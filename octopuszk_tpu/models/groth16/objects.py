"""Groth16 object model: CRS / proving key / verification key / proof.

Reference parity: zk_proof_systems/zkSNARK/objects/{CRS, ProvingKey,
VerificationKey, Proof}.java — with the TPU-native split: big query
vectors are device Jacobian point batches, O(1) elements (alpha, beta,
delta, the GT pairing value, proof points) are host affine points.
"""

from __future__ import annotations

import dataclasses
from typing import Any


@dataclasses.dataclass
class ProvingKey:
    """Reference: ProvingKey.java.

    Serial CRS (models/groth16/setup.py): every query is a PACKED-ROW
    affine tensor ``uint32[n/ppr, 128]`` (ops/msm.py pack_affine_rows) —
    the at-rest layout the large-MSM path gathers from, packed once at
    setup and reused across proofs.  Distributed CRS
    (parallel/dgroth16.py): queries are batch-sharded Jacobian point
    batches.  ``packed`` says which."""

    alpha_g1: Any            # host affine G1
    beta_g1: Any
    beta_g2: Any             # host affine G2
    delta_g1: Any
    delta_g2: Any
    delta_abc_g1: Any        # query over aux variables (scalars z[ni:])
    query_a: Any             # query over all variables
    query_b_g1: Any          # query over all variables (G1 copy)
    query_b_g2: Any          # query over all variables (G2)
    query_h: Any             # query over H coefficients [degree + 1]
    r1cs: Any
    packed: bool = False
    # delta_abc_g1 layout: False = aux-only entries (serial setup,
    # scalars z[ni:]); True = all m variables with the primary prefix
    # gamma-scaled (distributed setup's one-pass filtered query,
    # FixedBaseMSM.distributedFilterFieldBatchMSM role) — the prover
    # zeroes primary scalars instead.
    delta_abc_full: bool = False


@dataclasses.dataclass
class VerificationKey:
    """Reference: VerificationKey.java.  All host-side (verifier is O(1)
    pairings + a num_inputs-sized MSM)."""

    alpha_beta_gt: Any       # Fp12 element
    gamma_g2: Any            # host affine G2
    delta_g2: Any
    gamma_abc_g1: list       # host affine G1 list [num_inputs]


@dataclasses.dataclass
class Proof:
    """Reference: Proof.java:109-131 — (A in G1, B in G2, C in G1)."""

    a: Any                   # host affine G1
    b: Any                   # host affine G2
    c: Any                   # host affine G1


@dataclasses.dataclass
class CRS:
    """Reference: CRS.java."""

    proving_key: ProvingKey
    verification_key: VerificationKey
