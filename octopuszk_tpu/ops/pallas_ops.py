"""Pallas TPU kernels for the hot field/curve operations.

The jnp limb kernels in fields/fp.py round-trip every intermediate
through HBM (one elementwise op at a time unless XLA fuses); the Pallas
path runs the *entire* formula — e.g. a full projective add, ~12 Montgomery
multiplies — inside one kernel with all temporaries in VMEM, so HBM
traffic per point drops from kilobytes to the 6 input + 3 output
coordinates.  This is the TPU-native counterpart of the reference's fused
CUDA device functions (algebra_msm_VariableBaseMSM.cu:290-726).

Design: the SAME formula code (curves/group_ops.py, fields/fp.py) is
traced inside the kernel body with ``fp.UNROLL`` enabled (static CIOS
rounds — Mosaic-friendly).  Blocks tile the batch (lane) axis; the limb
axis (16) sits on sublanes.

Enable/disable with env OCTOPUSZK_PALLAS=0/1 (default: on for TPU-like
backends, off on CPU).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from octopuszk_tpu.fields import fp
from octopuszk_tpu.fields.spec import NUM_LIMBS

L = NUM_LIMBS
BLOCK = 1024


@functools.cache
def enabled() -> bool:
    env = os.environ.get("OCTOPUSZK_PALLAS")
    if env is not None:
        return env not in ("0", "false", "")
    try:
        platform = jax.default_backend()
    except Exception:
        return False
    return platform not in ("cpu",)


@functools.cache
def interpret_mode() -> bool:
    """True when kernels should run under pallas interpret mode (CPU CI
    coverage of the Mosaic-facing code paths — no TPU needed)."""
    return os.environ.get("OCTOPUSZK_PALLAS") == "interpret"


def reset_mode_caches():
    """Re-read OCTOPUSZK_PALLAS (tests toggle it via monkeypatch)."""
    enabled.cache_clear()
    interpret_mode.cache_clear()


class _unrolled:
    def __enter__(self):
        self._old = fp.UNROLL
        fp.UNROLL = True

    def __exit__(self, *exc):
        fp.UNROLL = self._old


def _flatten_coords(point):
    """Point pytree -> flat list of [L, n] arrays (+ re-packer)."""
    flat = []
    struct = []
    for coord in point:
        if isinstance(coord, tuple):
            struct.append(len(coord))
            flat.extend(coord)
        else:
            struct.append(0)
            flat.append(coord)

    def rebuild(arrays):
        out = []
        it = iter(arrays)
        for s in struct:
            if s == 0:
                out.append(next(it))
            else:
                out.append(tuple(next(it) for _ in range(s)))
        return tuple(out)

    return flat, rebuild


def _pad_to_block(arrays, n):
    pad = (-n) % BLOCK
    if pad == 0:
        return arrays, n
    return [jnp.pad(a, ((0, 0), (0, pad))) for a in arrays], n + pad


def pointwise_kernel(fn, n_in: int, n_out: int):
    """Build a pallas_call running `fn` blockwise along the batch axis.

    fn: list of n_in loaded [L, BLOCK] arrays -> list of n_out arrays.
    Returns a function over [L, n] arrays (n padded internally).
    """
    def kernel(*refs):
        ins = [r[...] for r in refs[:n_in]]
        with _unrolled():
            outs = fn(ins)
        for r, o in zip(refs[n_in:], outs):
            r[...] = o

    def call(*arrays):
        n = arrays[0].shape[1]
        padded, np_ = _pad_to_block(list(arrays), n)
        grid = (np_ // BLOCK,)
        spec = pl.BlockSpec((L, BLOCK), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[spec] * n_in,
            out_specs=[spec] * n_out,
            out_shape=[jax.ShapeDtypeStruct((L, np_), jnp.uint32)] * n_out,
            interpret=interpret_mode(),
        )(*padded)
        if np_ != n:
            out = [o[:, :n] for o in out]
        return out

    return call


# ---------------------------------------------------------------------------
# curve kernels
# ---------------------------------------------------------------------------

def _group_ops(group_name: str):
    from octopuszk_tpu.curves import bn254
    group = bn254.G1 if group_name == "G1" else bn254.G2
    ncoords = 3 * group.coord_dim
    if group.coord_dim == 1:
        def rebuild(arrs):
            return (arrs[0], arrs[1], arrs[2])
    else:
        def rebuild(arrs):
            return ((arrs[0], arrs[1]), (arrs[2], arrs[3]),
                    (arrs[4], arrs[5]))
    return group, ncoords, rebuild


@functools.cache
def _add_kernel(group_name: str):
    from octopuszk_tpu.curves import group_ops as jac
    group, ncoords, rebuild = _group_ops(group_name)

    def fn(ins):
        p = rebuild(ins[:ncoords])
        q = rebuild(ins[ncoords:])
        flat, _ = _flatten_coords(jac.add(group.ops, p, q))
        return flat

    return pointwise_kernel(fn, 2 * ncoords, ncoords)


@functools.cache
def _double_kernel(group_name: str):
    from octopuszk_tpu.curves import group_ops as jac
    group, ncoords, rebuild = _group_ops(group_name)

    def fn(ins):
        flat, _ = _flatten_coords(jac.double(group.ops, rebuild(ins)))
        return flat

    return pointwise_kernel(fn, ncoords, ncoords)


def add_points(group_name, p, q):
    """Batched complete-projective add via one fused kernel."""
    fp_, rebuild = _flatten_coords(p)
    fq, _ = _flatten_coords(q)
    outs = _add_kernel(group_name)(*(fp_ + fq))
    return rebuild(outs)


def double_points(group_name, p):
    fp_, rebuild = _flatten_coords(p)
    outs = _double_kernel(group_name)(*fp_)
    return rebuild(outs)


# ---------------------------------------------------------------------------
# fused bucket-accumulation scan (Pippenger inner loop)
# ---------------------------------------------------------------------------

SCAN_BLOCK = 1024


@functools.cache
def _scan_kernel(group_name: str, rows: int, lanes: int):
    """One-launch EC prefix scan over [rows, lanes] sorted points.

    Grid = (lanes/BL, rows) with the row axis iterating fastest; the
    running carry lives in VMEM scratch across row steps (reset at row 0),
    so the whole per-window accumulation is a single kernel instead of
    `rows` sequential launches.  Emits inclusive prefixes per row plus the
    final lane totals.
    """
    from octopuszk_tpu.curves import group_ops as jac
    group, ncoords, rebuild = _group_ops(group_name)
    BL = min(SCAN_BLOCK, lanes)
    assert lanes % BL == 0

    def kernel(*refs):
        ins = refs[:ncoords]
        prefix_out = refs[ncoords:2 * ncoords]
        scratch = refs[2 * ncoords:]
        r = pl.program_id(1)

        with _unrolled():
            @pl.when(r == 0)
            def _():
                # carry := identity (0, 1, 0); Montgomery one at the Y
                # coordinate (flat index 1 for G1, 2 for G2's Y.c0)
                onef = jnp.concatenate(
                    [jnp.full((1, BL), int(v), jnp.uint32)
                     for v in _one_limbs(group_name)], axis=0)
                zero = jnp.zeros((L, BL), jnp.uint32)
                y_idx = 1 if ncoords == 3 else 2
                for ci, s in enumerate(scratch):
                    s[...] = onef if ci == y_idx else zero

            carry = rebuild([s[...] for s in scratch])
            row = rebuild([x[...] for x in ins])
            new = jac.add(group.ops, carry, row)
            flat, _ = _flatten_coords(new)
            for s, o, v in zip(scratch, prefix_out, flat):
                s[...] = v
                o[...] = v

    def call(coords_rows):
        """coords_rows: flat list of [rows*L, lanes] arrays (row-major
        blocks of L limb-rows per scan row).  Returns inclusive prefix
        rows in the same layout (lane totals = last prefix row)."""
        in_spec = pl.BlockSpec((L, BL), lambda i, r: (r, i),
                               memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            kernel,
            grid=(lanes // BL, rows),
            in_specs=[in_spec] * ncoords,
            out_specs=[in_spec] * ncoords,
            out_shape=[jax.ShapeDtypeStruct((rows * L, lanes), jnp.uint32)]
            * ncoords,
            scratch_shapes=[pltpu.VMEM((L, BL), jnp.uint32)] * ncoords,
            interpret=interpret_mode(),
        )(*coords_rows)
        return out

    return call


@functools.cache
def _one_limbs(group_name: str):
    from octopuszk_tpu.curves import bn254
    g = bn254.G1 if group_name == "G1" else bn254.G2
    return tuple(int(v) for v in g.ops.spec.one_mont_limbs)


def scan_accumulate(group_name, pts_rows_flat, rows: int, lanes: int):
    """(prefix_rows, lane_totals) for flat coord arrays [rows, L, lanes]."""
    return _scan_kernel(group_name, rows, lanes)(pts_rows_flat)


@functools.cache
def _scan_mixed_kernel(group_name: str, rows: int, lanes: int):
    """EC prefix scan with AFFINE row inputs (RCB mixed add, 11M vs 12M,
    and 2/3 the input HBM traffic of the projective scan).

    Inputs: 2*coord_dim flat affine coord arrays [rows*L, lanes].  The
    identity is encoded as (0, 0): no point of the odd-order G1/G2
    subgroups has Y = 0 (a Y=0 point would be 2-torsion), so the kernel
    derives the skip mask from Y's limbs — no separate mask operand,
    whose (1, BL) blocks Mosaic rejects anyway.  The projective running
    carry lives in VMEM scratch; emits inclusive projective prefixes.
    """
    from octopuszk_tpu.curves import group_ops as jac
    group, ncoords, rebuild = _group_ops(group_name)
    naff = 2 * group.coord_dim
    if group.coord_dim == 1:
        def rebuild_aff(arrs):
            return (arrs[0], arrs[1])
    else:
        def rebuild_aff(arrs):
            return ((arrs[0], arrs[1]), (arrs[2], arrs[3]))
    BL = min(SCAN_BLOCK, lanes)
    assert lanes % BL == 0

    def kernel(*refs):
        ins = refs[:naff]
        prefix_out = refs[naff:naff + ncoords]
        scratch = refs[naff + ncoords:]
        r = pl.program_id(1)

        with _unrolled():
            @pl.when(r == 0)
            def _():
                onef = jnp.concatenate(
                    [jnp.full((1, BL), int(v), jnp.uint32)
                     for v in _one_limbs(group_name)], axis=0)
                zero = jnp.zeros((L, BL), jnp.uint32)
                y_idx = 1 if ncoords == 3 else 2
                for ci, s in enumerate(scratch):
                    s[...] = onef if ci == y_idx else zero

            carry = rebuild([s[...] for s in scratch])
            aff = [x[...] for x in ins]
            q_aff = rebuild_aff(aff)
            # Y == 0 across all limbs (and both Fp2 components) => identity
            ymax = aff[naff // 2]
            for yc in aff[naff // 2 + 1:]:
                ymax = ymax | yc
            # int32 view: Mosaic lacks unsigned reductions (limbs < 2^16)
            q_inf = jnp.max(ymax.astype(jnp.int32), axis=0,
                            keepdims=True) == jnp.int32(0)
            new = jac.mixed_add(group.ops, carry, q_aff, q_inf_mask=q_inf)
            flat, _ = _flatten_coords(new)
            for s, o, v in zip(scratch, prefix_out, flat):
                s[...] = v
                o[...] = v

    def call(aff_rows_flat):
        """aff_rows_flat: naff arrays [rows*L, lanes].  Returns ncoords
        projective prefix arrays [rows*L, lanes] (inclusive; lane totals
        = last prefix row)."""
        in_spec = pl.BlockSpec((L, BL), lambda i, r: (r, i),
                               memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            kernel,
            grid=(lanes // BL, rows),
            in_specs=[in_spec] * naff,
            out_specs=[in_spec] * ncoords,
            out_shape=[jax.ShapeDtypeStruct((rows * L, lanes), jnp.uint32)]
            * ncoords,
            scratch_shapes=[pltpu.VMEM((L, BL), jnp.uint32)] * ncoords,
            interpret=interpret_mode(),
        )(*aff_rows_flat)
        return out

    return call


def scan_accumulate_mixed(group_name, aff_rows_flat, rows: int, lanes: int):
    """Projective prefix rows for affine inputs (see _scan_mixed_kernel)."""
    return _scan_mixed_kernel(group_name, rows, lanes)(aff_rows_flat)


@functools.cache
def _scan_mixed_total_kernel(group_name: str, rows: int, lanes: int):
    """Mixed-add accumulation emitting ONLY the final lane totals.

    Same row-wise EC scan as _scan_mixed_kernel, but the output block
    doubles as the running carry (output refs are read-write and the
    block index is constant across the row axis, so Mosaic keeps it in
    VMEM and flushes once per lane block) — no prefix rows are written.
    Fixed-base MSM evaluation uses this: per-lane accumulation of one
    gathered window-table point per row, where the per-row prefixes are
    meaningless and writing them would triple the HBM traffic.
    """
    from octopuszk_tpu.curves import group_ops as jac
    group, ncoords, rebuild = _group_ops(group_name)
    naff = 2 * group.coord_dim
    if group.coord_dim == 1:
        def rebuild_aff(arrs):
            return (arrs[0], arrs[1])
    else:
        def rebuild_aff(arrs):
            return ((arrs[0], arrs[1]), (arrs[2], arrs[3]))
    BL = min(SCAN_BLOCK, lanes)
    assert lanes % BL == 0

    def kernel(*refs):
        ins = refs[:naff]
        outs = refs[naff:]
        r = pl.program_id(1)

        with _unrolled():
            @pl.when(r == 0)
            def _():
                onef = jnp.concatenate(
                    [jnp.full((1, BL), int(v), jnp.uint32)
                     for v in _one_limbs(group_name)], axis=0)
                zero = jnp.zeros((L, BL), jnp.uint32)
                y_idx = 1 if ncoords == 3 else 2
                for ci, o in enumerate(outs):
                    o[...] = onef if ci == y_idx else zero

            carry = rebuild([o[...] for o in outs])
            aff = [x[...] for x in ins]
            q_aff = rebuild_aff(aff)
            ymax = aff[naff // 2]
            for yc in aff[naff // 2 + 1:]:
                ymax = ymax | yc
            q_inf = jnp.max(ymax.astype(jnp.int32), axis=0,
                            keepdims=True) == jnp.int32(0)
            new = jac.mixed_add(group.ops, carry, q_aff, q_inf_mask=q_inf)
            flat, _ = _flatten_coords(new)
            for o, v in zip(outs, flat):
                o[...] = v

    def call(aff_rows_flat):
        """aff_rows_flat: naff arrays [rows*L, lanes].  Returns ncoords
        projective total arrays [L, lanes]."""
        in_spec = pl.BlockSpec((L, BL), lambda i, r: (r, i),
                               memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec((L, BL), lambda i, r: (0, i),
                                memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            kernel,
            grid=(lanes // BL, rows),
            in_specs=[in_spec] * naff,
            out_specs=[out_spec] * ncoords,
            out_shape=[jax.ShapeDtypeStruct((L, lanes), jnp.uint32)]
            * ncoords,
            interpret=interpret_mode(),
        )(*aff_rows_flat)
        return out

    return call


def scan_accumulate_mixed_total(group_name, aff_rows_flat, rows: int,
                                lanes: int):
    """Final lane totals only (see _scan_mixed_total_kernel)."""
    return _scan_mixed_total_kernel(group_name, rows, lanes)(aff_rows_flat)


# ---------------------------------------------------------------------------
# field kernels
# ---------------------------------------------------------------------------

@functools.cache
def _mont_mul_kernel(spec):
    def fn(ins):
        return [fp.mont_mul(spec, ins[0], ins[1])]
    return pointwise_kernel(fn, 2, 1)


def mont_mul(spec, a, b):
    return _mont_mul_kernel(spec)(a, b)[0]


@functools.cache
def _mul_sub_kernel(spec):
    def fn(ins):
        a, b, c = ins
        return [fp.sub(spec, fp.mont_mul(spec, a, b), c)]
    return pointwise_kernel(fn, 3, 1)


def mul_sub(spec, a, b, c):
    """a*b - c fused (the witness map's H = A*B - C on the coset)."""
    return _mul_sub_kernel(spec)(a, b, c)[0]


@functools.cache
def _butterfly_kernel(spec, dif: bool):
    """Fused NTT butterfly: (a, b, w) -> (sum, diff) in one launch.

    DIF: (a+b, (a-b)*w); DIT: (a+w*b, a-w*b).  The XLA fallback's rolled
    CIOS rounds round-trip ~100 intermediate buffers through HBM per
    mont_mul at NTT shapes; fused, each stage moves just 5 coords."""
    def fn(ins):
        a, b, w = ins
        if dif:
            return [fp.add(spec, a, b),
                    fp.mont_mul(spec, fp.sub(spec, a, b), w)]
        t = fp.mont_mul(spec, b, w)
        return [fp.add(spec, a, t), fp.sub(spec, a, t)]

    return pointwise_kernel(fn, 3, 2)


def butterfly(spec, a, b, w, dif: bool):
    """[L, n] fused butterfly pair; see _butterfly_kernel."""
    return _butterfly_kernel(spec, dif)(a, b, w)
