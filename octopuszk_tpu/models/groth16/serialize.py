"""CRS / proof serialization (save & load).

The reference never persists its CRS (SURVEY.md §5 flags this as an
explicit gap: RDD persist/unpersist only).  Here: device point batches
and sparse R1CS arrays go into one compressed .npz; O(1) host values
(affine points, GT elements, sizes) into a JSON sidecar inside the same
archive.  Round-trips bit-exactly.
"""

from __future__ import annotations

import io
import json

import jax.numpy as jnp
import numpy as np

from octopuszk_tpu.models.groth16.objects import (
    CRS, Proof, ProvingKey, VerificationKey)
from octopuszk_tpu.relations.r1cs import R1CS, SparseMatrix


def _point_batch_to_np(p, prefix, out):
    for ci, coord in enumerate(p):
        if isinstance(coord, tuple):
            for cj, c in enumerate(coord):
                out[f"{prefix}_{ci}_{cj}"] = np.asarray(c)
        else:
            out[f"{prefix}_{ci}"] = np.asarray(coord)


def _point_batch_from_np(d, prefix, coord_dim):
    coords = []
    for ci in range(3):
        if coord_dim == 2:
            coords.append(tuple(jnp.asarray(d[f"{prefix}_{ci}_{cj}"])
                                for cj in range(2)))
        else:
            coords.append(jnp.asarray(d[f"{prefix}_{ci}"]))
    return tuple(coords)


def _matrix_to_np(m: SparseMatrix, prefix, out, meta):
    for name in ("row", "col", "val", "row_chunk", "row_chunk_seg",
                 "col_chunk", "col_chunk_seg"):
        out[f"{prefix}_{name}"] = np.asarray(getattr(m, name))
    meta[prefix] = {"num_rows": m.num_rows, "num_cols": m.num_cols}


def _matrix_from_np(d, prefix, meta):
    return SparseMatrix(
        row=jnp.asarray(d[f"{prefix}_row"]),
        col=jnp.asarray(d[f"{prefix}_col"]),
        val=jnp.asarray(d[f"{prefix}_val"]),
        row_chunk=jnp.asarray(d[f"{prefix}_row_chunk"]),
        row_chunk_seg=jnp.asarray(d[f"{prefix}_row_chunk_seg"]),
        col_chunk=jnp.asarray(d[f"{prefix}_col_chunk"]),
        col_chunk_seg=jnp.asarray(d[f"{prefix}_col_chunk_seg"]),
        num_rows=meta[prefix]["num_rows"],
        num_cols=meta[prefix]["num_cols"])


def _host_to_json(x):
    """Host points / field values -> JSON-safe nested string structure."""
    if x is None:
        return None
    if isinstance(x, int):
        return str(x)
    if isinstance(x, (tuple, list)):
        return [_host_to_json(v) for v in x]
    raise TypeError(type(x))


def _host_from_json(x):
    if x is None:
        return None
    if isinstance(x, str):
        return int(x)
    if isinstance(x, list):
        return tuple(_host_from_json(v) for v in x)
    raise TypeError(type(x))


def save_crs(path: str, crs: CRS) -> None:
    pk, vk = crs.proving_key, crs.verification_key
    arrays = {}
    meta = {"host": {}, "packed": bool(pk.packed),
            "delta_abc_full": bool(getattr(pk, "delta_abc_full", False))}
    if pk.packed:
        # packed-row affine queries: one u32[n/ppr, 128] tensor each
        for name in ("delta_abc_g1", "query_a", "query_b_g1",
                     "query_b_g2", "query_h"):
            arrays[name] = np.asarray(getattr(pk, name))
    else:
        _point_batch_to_np(pk.delta_abc_g1, "delta_abc", arrays)
        _point_batch_to_np(pk.query_a, "query_a", arrays)
        _point_batch_to_np(pk.query_b_g1, "query_b_g1", arrays)
        _point_batch_to_np(pk.query_b_g2, "query_b_g2", arrays)
        _point_batch_to_np(pk.query_h, "query_h", arrays)
    r = pk.r1cs
    _matrix_to_np(r.a, "ra", arrays, meta)
    _matrix_to_np(r.b, "rb", arrays, meta)
    _matrix_to_np(r.c, "rc", arrays, meta)
    meta["r1cs"] = {"num_constraints": r.num_constraints,
                    "num_inputs": r.num_inputs,
                    "num_variables": r.num_variables}
    meta["host"] = {
        "alpha_g1": _host_to_json(pk.alpha_g1),
        "beta_g1": _host_to_json(pk.beta_g1),
        "beta_g2": _host_to_json(pk.beta_g2),
        "delta_g1": _host_to_json(pk.delta_g1),
        "delta_g2": _host_to_json(pk.delta_g2),
        "alpha_beta_gt": _host_to_json(vk.alpha_beta_gt),
        "gamma_g2": _host_to_json(vk.gamma_g2),
        "vk_delta_g2": _host_to_json(vk.delta_g2),
        "gamma_abc_g1": _host_to_json(vk.gamma_abc_g1),
    }
    arrays["__meta__"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8)
    np.savez_compressed(path, **arrays)


def load_crs(path: str, device: bool = True) -> CRS:
    """``device=False`` keeps packed queries as HOST numpy arrays — the
    prover then streams them chunk-by-chunk (the 2^24-scale path where
    the CRS exceeds HBM, docs/HBM_BUDGET.md)."""
    d = np.load(path if path.endswith(".npz") else path + ".npz")
    meta = json.loads(bytes(d["__meta__"]).decode())
    h = {k: _host_from_json(v) for k, v in meta["host"].items()}
    r1cs = R1CS(
        a=_matrix_from_np(d, "ra", meta),
        b=_matrix_from_np(d, "rb", meta),
        c=_matrix_from_np(d, "rc", meta),
        **meta["r1cs"])
    packed = bool(meta.get("packed", False))
    if packed:
        conv = jnp.asarray if device else np.asarray
        queries = {name: conv(d[name])
                   for name in ("delta_abc_g1", "query_a", "query_b_g1",
                                "query_b_g2", "query_h")}
    else:
        queries = {
            "delta_abc_g1": _point_batch_from_np(d, "delta_abc", 1),
            "query_a": _point_batch_from_np(d, "query_a", 1),
            "query_b_g1": _point_batch_from_np(d, "query_b_g1", 1),
            "query_b_g2": _point_batch_from_np(d, "query_b_g2", 2),
            "query_h": _point_batch_from_np(d, "query_h", 1)}
    pk = ProvingKey(
        alpha_g1=h["alpha_g1"], beta_g1=h["beta_g1"], beta_g2=h["beta_g2"],
        delta_g1=h["delta_g1"], delta_g2=h["delta_g2"],
        r1cs=r1cs, packed=packed,
        delta_abc_full=bool(meta.get("delta_abc_full", False)), **queries)
    vk = VerificationKey(
        alpha_beta_gt=h["alpha_beta_gt"], gamma_g2=h["gamma_g2"],
        delta_g2=h["vk_delta_g2"],
        gamma_abc_g1=list(h["gamma_abc_g1"]))
    return CRS(proving_key=pk, verification_key=vk)


def save_proof(path: str, proof: Proof) -> None:
    with open(path, "w") as f:
        json.dump({"a": _host_to_json(proof.a), "b": _host_to_json(proof.b),
                   "c": _host_to_json(proof.c)}, f)


def load_proof(path: str) -> Proof:
    with open(path) as f:
        d = json.load(f)
    return Proof(a=_host_from_json(d["a"]), b=_host_from_json(d["b"]),
                 c=_host_from_json(d["c"]))
