"""R1CS relation in COO sparse form over device limb tensors.

The reference keeps constraints as Java object graphs
(relations/objects/R1CSConstraints.java, LinearCombination.java) and, in
distributed form, as ``JavaPairRDD<Long, LinearTerm>`` — which *is* a COO
sparse matrix keyed by constraint index (R1CSConstraintsRDD.java).  The
TPU-native form makes that explicit: each of A, B, C is (row, col, val)
arrays; the assignment is a dense Fr vector; A·z / Aᵀ·w are
gather + multiply + segment-sum — no join/shuffle needed because
co-indexing replaces Spark's join (SURVEY.md §2 parallelism note 3).

Fr limb sums would overflow uint32 beyond 2^15 terms per segment, so
segment sums are hierarchical: a host-precomputed *chunk* id splits each
row (and each column, for the transpose) into chunks of <= 2^13 entries;
chunk partials are canonicalized with fields.fp.from_wide before the
second-level sum.  This also mirrors the reference's special-casing of the
"popular" dense constraint (R1CStoQAPRDD.java:104-131) — generically.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from octopuszk_tpu.fields import fp
from octopuszk_tpu.fields.spec import FieldSpec, FR, NUM_LIMBS
from octopuszk_tpu.utils.bigint import ints_to_limbs

CHUNK = 1 << 13


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class SparseMatrix:
    """COO matrix over Fr with hierarchical segment ids for both axes.

    val is Montgomery-form limbs uint32[L, nnz]; row/col int32[nnz] with
    row sorted ascending (construction sorts).  *_chunk / *_chunk_seg are
    the two-level segment-sum ids (see module docstring).
    """

    row: jnp.ndarray
    col: jnp.ndarray
    val: jnp.ndarray
    row_chunk: jnp.ndarray        # [nnz] first-level id for row sums
    row_chunk_seg: jnp.ndarray    # [n_row_chunks] -> row
    col_chunk: jnp.ndarray        # [nnz] first-level id for col sums
    col_chunk_seg: jnp.ndarray    # [n_col_chunks] -> col
    num_rows: int
    num_cols: int

    def tree_flatten(self):
        children = (self.row, self.col, self.val, self.row_chunk,
                    self.row_chunk_seg, self.col_chunk, self.col_chunk_seg)
        return children, (self.num_rows, self.num_cols)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    @property
    def nnz(self):
        return self.row.shape[0]


def _chunk_ids(sorted_ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """First-level chunk ids for a sorted id array: every run of equal ids
    is split into chunks of <= CHUNK entries; returns (chunk_of_entry,
    id_of_chunk)."""
    n = len(sorted_ids)
    if n == 0:
        return (np.zeros(0, dtype=np.int32), np.zeros(0, dtype=np.int32))
    new_run = np.empty(n, dtype=bool)
    new_run[0] = True
    new_run[1:] = sorted_ids[1:] != sorted_ids[:-1]
    run_start = np.maximum.accumulate(np.where(new_run, np.arange(n), 0))
    pos_in_run = np.arange(n) - run_start
    boundary = new_run | (pos_in_run % CHUNK == 0)
    chunk_of_entry = np.cumsum(boundary) - 1
    id_of_chunk = sorted_ids[boundary]
    return chunk_of_entry.astype(np.int32), id_of_chunk.astype(np.int32)


def make_sparse(spec: FieldSpec, rows, cols, vals, num_rows: int,
                num_cols: int) -> SparseMatrix:
    """Build a SparseMatrix from host arrays/lists (vals = raw ints).

    Vectorized: synthetic circuits draw values from a handful of distinct
    constants (1, p-1, public matrix entries), so Montgomery conversion
    runs once per distinct value and fans out with a numpy gather —
    2^24-constraint construction stays seconds, not minutes (the role of
    the reference's parallelConstruct/Indexer machinery,
    R1CSConstruction.java:116-505, 789-1014).
    """
    rows = np.asarray(rows, dtype=np.int64)
    cols = np.asarray(cols, dtype=np.int64)
    order = np.argsort(rows, kind="stable")
    rows, cols = rows[order], cols[order]
    row_chunk, row_chunk_seg = _chunk_ids(rows)
    # for the transpose: sort a copy by col
    corder = np.argsort(cols, kind="stable")
    col_sorted = cols[corder]
    cc, ccs = _chunk_ids(col_sorted)
    # map back: col_chunk[i] = chunk id of entry i in col-sorted order
    col_chunk = np.empty(len(cols), dtype=np.int32)
    col_chunk[corder] = cc
    if isinstance(vals, np.ndarray) and vals.dtype != object:
        vals_arr = vals.astype(object)[order]
    else:
        vals_arr = np.asarray(list(vals), dtype=object)[order]
    uniq, inv = np.unique(vals_arr, return_inverse=True)
    if len(uniq) * 4 <= len(vals_arr):
        uniq_limbs = np.asarray(ints_to_limbs(
            [spec.to_mont(int(v) % spec.p) for v in uniq], NUM_LIMBS))
        val_limbs = uniq_limbs[:, inv]
    else:
        val_limbs = ints_to_limbs(
            [spec.to_mont(int(v) % spec.p) for v in vals_arr], NUM_LIMBS)
    return SparseMatrix(
        row=jnp.asarray(rows.astype(np.int32)),
        col=jnp.asarray(cols.astype(np.int32)),
        val=jnp.asarray(val_limbs),
        row_chunk=jnp.asarray(row_chunk),
        row_chunk_seg=jnp.asarray(row_chunk_seg),
        col_chunk=jnp.asarray(col_chunk),
        col_chunk_seg=jnp.asarray(ccs),
        num_rows=num_rows, num_cols=num_cols)


def _segment_sum_field(spec, terms, seg1, seg1_to_seg2, n1: int, n2: int):
    """Hierarchical exact segment sum of Montgomery values.

    terms: uint32[L, k] Montgomery; seg1: int32[k] first-level ids (n1 of
    them), seg1_to_seg2: int32[n1] second-level target ids; returns
    uint32[L, n2] Montgomery.
    """
    part = jax.ops.segment_sum(terms.T, seg1, num_segments=n1).T
    part = fp.reduce_sum_mont(spec, part)
    out = jax.ops.segment_sum(part.T, seg1_to_seg2, num_segments=n2).T
    return fp.reduce_sum_mont(spec, out)


def matvec(spec: FieldSpec, m: SparseMatrix, z):
    """A @ z: z is uint32[L, num_cols] Montgomery; result [L, num_rows].

    The role of the constraint⋈assignment join + reduceByKey in
    R1CSRelationRDD.isSatisfied / R1CStoQAPRDD (…java:202-227).
    """
    terms = fp.mont_mul(spec, m.val, z[:, m.col])
    return _segment_sum_field(
        spec, terms, m.row_chunk, m.row_chunk_seg,
        int(m.row_chunk_seg.shape[0]), m.num_rows)


def rmatvec(spec: FieldSpec, m: SparseMatrix, w):
    """A.T @ w: w is uint32[L, num_rows]; result [L, num_cols].

    Used by the QAP instance map (At/Bt/Ct accumulation against Lagrange
    coefficients, R1CStoQAP.java:49-66)."""
    terms = fp.mont_mul(spec, m.val, w[:, m.row])
    return _segment_sum_field(
        spec, terms, m.col_chunk, m.col_chunk_seg,
        int(m.col_chunk_seg.shape[0]), m.num_cols)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class R1CS:
    """R1CS relation: A z * B z = C z, with primary/auxiliary split.

    Reference parity: R1CSRelation.java:41-111.  ``num_inputs`` counts the
    primary assignment *including* the leading constant-one variable
    (index 0), as in DIZK.
    """

    a: SparseMatrix
    b: SparseMatrix
    c: SparseMatrix
    num_constraints: int
    num_inputs: int
    num_variables: int

    def tree_flatten(self):
        return ((self.a, self.b, self.c),
                (self.num_constraints, self.num_inputs, self.num_variables))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    def is_valid(self) -> bool:
        ok = self.num_inputs <= self.num_variables
        for m in (self.a, self.b, self.c):
            ok = ok and m.num_rows == self.num_constraints
            ok = ok and m.num_cols == self.num_variables
        return bool(ok)


@functools.partial(jax.jit, static_argnums=(0,))
def is_satisfied(spec: FieldSpec, r1cs: R1CS, z) -> jnp.ndarray:
    """All constraints hold for full assignment z? -> scalar bool.

    Reference: R1CSRelation.isSatisfied (r1cs/R1CSRelation.java:65-111).
    """
    az = matvec(spec, r1cs.a, z)
    bz = matvec(spec, r1cs.b, z)
    cz = matvec(spec, r1cs.c, z)
    lhs = fp.mont_mul(spec, az, bz)
    return jnp.all(fp.eq(lhs, cz))


def assignment_to_device(spec: FieldSpec, values) -> jnp.ndarray:
    """Host int assignment -> Montgomery limb vector uint32[L, n].

    Montgomery conversion runs ON DEVICE (one batched mont_mul by R^2):
    host-side ``to_mont`` is a python big-int mulmod per element, ~10s at
    the reference's 2^20 test scale; the host only packs raw residue
    limbs (native/marshal.c fast path)."""
    raw = jnp.asarray(
        ints_to_limbs([v % spec.p for v in values], NUM_LIMBS))
    return fp.to_mont(spec, raw)
