"""Multi-scalar multiplication kernels (fixed-base and variable-base).

TPU-first re-design of the reference's CUDA MSM layer:

* **Fixed-base batch MSM** (``fixed_base_msm``): one base point G, many
  scalars; returns [s_i]G for each i.  Window table is built on device by
  log-depth doubling (the reference builds it per-window on GPU,
  algebra_msm_FixedBaseMSM.cu:750-995); per-scalar evaluation is
  outerc gathers + adds, vectorized over the whole batch.

* **Variable-base Pippenger** (``pippenger_msm``): many (scalar, point)
  pairs; returns one point.  The reference scatters points into buckets
  with atomicAdd counters (algebra_msm_VariableBaseMSM.cu:736-777); TPUs
  have no atomics, so bucket accumulation is re-designed as
  sort-by-bucket + a two-level segmented prefix scan:
    1. per window, sort point indices by bucket id;
    2. lane-parallel serial scan over rows (k lanes x n/k rows) computes
       inclusive EC prefix sums in O(n) work;
    3. bucket sums are differences of prefix values at segment ends;
    4. the classic weighted suffix reduction (sum_b b * S_b) runs as an
       associative scan over the bucket axis;
    5. window results combine MSB-first with c doublings per window.

* **Naive MSM** (``msm_naive``): batched double-and-add + tree reduce —
  the differential-test oracle (NaiveMSM.java:20-69 analogue).

All functions take points as Jacobian limb-tensor batches (curves/bn254.py)
and scalars as raw (non-Montgomery) uint32[L, n] limbs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from octopuszk_tpu.curves import group_ops as jac
from octopuszk_tpu.fields.spec import LIMB_BITS, NUM_LIMBS

I32 = jnp.int32
U32 = jnp.uint32
SCALAR_BITS = 254


def _map_coords(point, fn):
    return jac._map_coords(point, fn)


# ---------------------------------------------------------------------------
# naive reference
# ---------------------------------------------------------------------------

def msm_naive(group, points, scalars_raw):
    """Sum_i [s_i] P_i via batched double-and-add + tree reduction."""
    n = _batch_n(points)
    prods = group.scalar_mul(points, scalars_raw)
    padded, m = _pad_pow2(group, prods, n)
    return group.tree_reduce(padded, m)


def _batch_n(points):
    c = points[0]
    while isinstance(c, tuple):
        c = c[0]
    return c.shape[-1]


def _pad_pow2(group, points, n):
    m = 1 << max(0, (n - 1).bit_length())
    if m == n:
        return points, m
    inf = group.infinity((m - n,))
    padded = tuple(
        tuple(jnp.concatenate([a, b], axis=-1) for a, b in zip(ca, cb))
        if isinstance(ca, tuple) else jnp.concatenate([ca, cb], axis=-1)
        for ca, cb in zip(points, inf))
    return padded, m


# ---------------------------------------------------------------------------
# digit extraction
# ---------------------------------------------------------------------------

def _digits(scalars_raw, c: int, num_win: int):
    """uint32[num_win, n]: c-bit windows of each scalar, LSB window first."""
    L, n = scalars_raw.shape
    padded = jnp.concatenate(
        [scalars_raw, jnp.zeros((1, n), dtype=scalars_raw.dtype)], axis=0)
    out = []
    mask = U32((1 << c) - 1)
    for j in range(num_win):
        bit = c * j
        limb, off = bit // LIMB_BITS, bit % LIMB_BITS
        lo = padded[limb] >> U32(off)
        if off + c > LIMB_BITS:
            lo = lo | (padded[limb + 1] << U32(LIMB_BITS - off))
        out.append(lo & mask)
    return jnp.stack(out)


# ---------------------------------------------------------------------------
# fixed-base batch MSM
# ---------------------------------------------------------------------------

def _window_table(group, base_point, w: int, outerc: int):
    """Multiples table: T[win][d] = [d * 2^(w*win)] G, shape [outerc, 2^w].

    One lax.scan over windows; inside, a rolled fori over the w bits adds
    [2^b]G_win into every table slot whose digit has bit b set — constant
    shapes, one small compiled graph.  Replaces the reference's GPU table
    build (getWindowTableG1, algebra_msm_FixedBaseMSM.cu:851-995).
    """
    B = 1 << w
    iota = jax.lax.broadcasted_iota(jnp.int32, (B, 1), 0)[:, 0]

    def window(g, _):
        # g: running [2^(w*win)] G, single point
        def bit_step(b, carry):
            row, gb = carry
            has_bit = ((iota >> b) & 1) == 1
            gb_b = _bc_like(_map_coords(gb, lambda c: c[..., None]), row)
            row = group.select(has_bit, group.add(row, gb_b), row)
            return (row, group.double(gb))

        row, g_next = jax.lax.fori_loop(
            0, w, bit_step, (group.infinity((B,)), g))
        return g_next, row

    _, rows = jax.lax.scan(window, base_point, None, length=outerc)
    # rows coords: [outerc, L, B] -> [L, outerc, B]
    return _map_coords(rows, lambda c: jnp.moveaxis(c, 0, 1))


def _bc_like(single, batch):
    """Broadcast a [*, 1] point against a [*, m] point batch."""
    ref = batch[0]
    while isinstance(ref, tuple):
        ref = ref[0]
    m = ref.shape[-1]
    return _map_coords(single, lambda c: jnp.broadcast_to(
        c, c.shape[:-1] + (m,)))


def _concat_points(p, q):
    return tuple(
        tuple(jnp.concatenate([a, b], axis=-1) for a, b in zip(cp, cq))
        if isinstance(cp, tuple) else jnp.concatenate([cp, cq], axis=-1)
        for cp, cq in zip(p, q))


def _choose_w(n: int) -> int:
    """Fixed-base window width from the batch size.

    Cost model (in batched-lane point adds): table build is
    outerc*w*2^w (w bit-steps per window, each a 2^w-wide add) and
    evaluation is outerc*n, with outerc = ceil(254/w) — minimize
    (254/w)*(n + w*2^w) over w.  Replaces the reference's empirical
    per-curve threshold table (FixedBaseMSM.getWindowSize,
    FixedBaseMSM.java:49-66; BN254aG1Parameters.java:25-50); capped at 14
    so the table stays <100 MB at any batch size.
    """
    def cost(w):
        return (-(-SCALAR_BITS // w)) * (n + w * (1 << w))

    return min(range(4, 15), key=cost)


# batch size from which fixed-base evaluation switches to the packed-row
# path: affine window table packed as u32 gather rows + fused mixed-add
# accumulation (same machinery as the large variable-base path).  Below
# it the direct projective gather+add loop compiles faster and the
# table/pack overhead doesn't amortize.
FIXED_PACKED_MIN = 1 << 14
FIXED_CHUNK_LOG = 17


def _choose_w_packed(n: int) -> int:
    """Window width for the packed fixed-base path: evaluation is outerc*n
    mixed adds and the table build outerc*w*2^w batched adds + a pack, so
    minimize (254/w)*(n + w*2^w) over a wider range than the small path
    (the packed table is byte-dense — 128B/point — so w up to 16 stays
    under ~150 MB)."""
    def cost(w):
        return (-(-SCALAR_BITS // w)) * (n + w * (1 << w))

    return min(range(8, 17), key=cost)


@functools.partial(jax.jit, static_argnums=(0, 3))
def fixed_base_msm(group, base_point, scalars_raw, w: int | None = None):
    """[s_i] G for one base G and a batch of scalars: uint32[L, n] -> batch.

    Reference parity: FixedBaseMSM.batchMSM (FixedBaseMSM.java:185-315) +
    the device kernel fixedbase_MSM_unit_processing_G1 (…cu:750-791).

    Large batches (n >= FIXED_PACKED_MIN) take the packed path: the
    window table is converted to affine packed rows once, then evaluation
    is a row gather + one fused mixed-add accumulation over windows per
    scalar chunk — the minor-axis table gathers and full projective adds
    of the direct loop were the reason setup wall-time dwarfed prove.
    """
    n = scalars_raw.shape[1]
    if n >= FIXED_PACKED_MIN:
        if w is None:
            w = _choose_w_packed(n)
        return _fixed_base_msm_packed(group, base_point, scalars_raw, w)
    if w is None:
        w = _choose_w(n)
    outerc = (SCALAR_BITS + w - 1) // w
    table = _window_table(group, base_point, w, outerc)
    digits = _digits(scalars_raw, w, outerc)          # [outerc, n]

    def body(win, acc):
        d = digits[win]                                # [n]
        row = _map_coords(table, lambda c: jnp.take(c, win, axis=-2))
        pts = _map_coords(row, lambda c: c[..., d])    # gather [L, n]
        return group.add(acc, pts)

    init = jac.taint_point(group.infinity((n,)), table, (digits,))
    return jax.lax.fori_loop(0, outerc, body, init)


def _fixed_base_msm_packed(group, base_point, scalars_raw, w: int):
    """Packed-row fixed-base evaluation (see fixed_base_msm docstring).

    Reference parity: getWindowTableG1 + fixedbase_MSM_unit_processing_G1
    (algebra_msm_FixedBaseMSM.cu:750-995) — table on device, then one
    table lookup + add per window per scalar; the packed-row/fused-scan
    realization is TPU-specific.
    """
    n = scalars_raw.shape[1]
    outerc = (SCALAR_BITS + w - 1) // w
    B = 1 << w
    table = _window_table(group, base_point, w, outerc)
    # [L, outerc, B] -> flat [L, outerc*B] batch (win-major), then affine
    # packed rows; entry win*B + d = [d * 2^(w*win)] G, identity at d=0
    flat = _map_coords(table, lambda c: c.reshape(c.shape[:-2] + (outerc * B,)))
    packed_table = points_to_packed(group, flat)

    chunk = min(n, 1 << FIXED_CHUNK_LOG)
    m = chunk * (-(-n // chunk))
    if m != n:
        scalars_raw = jnp.pad(scalars_raw, ((0, 0), (0, m - n)))
    digits = _digits(scalars_raw, w, outerc)          # [outerc, m]
    nchunks = m // chunk
    win_off = (jnp.arange(outerc, dtype=jnp.int32) * B)[:, None]

    from octopuszk_tpu.ops import pallas_ops
    use_pallas = (pallas_ops.enabled() and chunk >= 128
                  and group.ops.group_name in ("G1", "G2"))

    def chunk_body(carry, d_c):
        order = (d_c.astype(jnp.int32) + win_off).reshape(-1)
        coords = _gather_packed(group, packed_table, order)  # [L, outerc*chunk]
        if use_pallas:
            aff_flat = [jnp.moveaxis(
                c.reshape(NUM_LIMBS, outerc, chunk), 0, 1).reshape(
                    outerc * NUM_LIMBS, chunk) for c in coords]
            tot = pallas_ops.scan_accumulate_mixed_total(
                group.ops.group_name, aff_flat, outerc, chunk)
            _, _, rebuild = pallas_ops._group_ops(group.ops.group_name)
            res = rebuild(tot)
        else:
            cd = group.coord_dim
            if cd == 1:
                q_aff = (coords[0], coords[1])
                ymax = coords[1]
            else:
                q_aff = ((coords[0], coords[1]), (coords[2], coords[3]))
                ymax = coords[2] | coords[3]
            infm = jnp.max(ymax, axis=0) == U32(0)
            q_rows = _map_coords(q_aff, lambda a: jnp.moveaxis(
                a.reshape(NUM_LIMBS, outerc, chunk), 0, 1))
            inf_rows = infm.reshape(outerc, chunk)

            def step(carryp, xs):
                row, im = xs
                return jac.mixed_add(group.ops, carryp, row,
                                     q_inf_mask=im), None

            carry0 = jac.taint_point(group.infinity((chunk,)), q_aff)
            res, _ = jax.lax.scan(step, carry0, (q_rows, inf_rows))
        return carry, res

    d_chunks = jnp.moveaxis(digits.reshape(outerc, nchunks, chunk), 1, 0)
    _, res_chunks = jax.lax.scan(chunk_body, 0, d_chunks)
    out = _map_coords(res_chunks, lambda a: jnp.moveaxis(a, 0, 1).reshape(
        NUM_LIMBS, m))
    if m != n:
        out = _map_coords(out, lambda a: a[..., :n])
    return out


# ---------------------------------------------------------------------------
# variable-base Pippenger
# ---------------------------------------------------------------------------

def _choose_c(n: int) -> int:
    """Window width for the small/medium sort-based path: the reference's
    heuristic c = log2(n) - log2(n)/3 (algebra_msm_VariableBaseMSM.cu:
    1267-1272), clamped to [4, 16].  With the Abel-summation bucket
    reduction the O(2^c) bucket phase stays a small fraction of the scan
    work at these sizes, so the window count (254/c) dominates and a
    larger c than the classic log2(n) - 4 pays off.  (The large packed
    path sizes its windows separately, _choose_c_large.)"""
    logn = max(1, n.bit_length() - 1)
    return max(4, min(16, logn - logn // 3))


def _choose_lanes(n: int) -> int:
    """Vector width for the serial bucket-accumulation scan (a power of
    two so the fused kernel's lane blocks always divide evenly)."""
    return min(1 << max(0, n.bit_length() - 1), 4096)


@functools.partial(jax.jit, static_argnums=(0, 3, 4))
def pippenger_msm(group, points, scalars_raw, c: int | None = None,
                  lanes: int | None = None):
    """Sum_i [s_i] P_i -> single point (no batch dim).

    Reference parity: VariableBaseMSM.serialMSM JNI path -> pippengerMSMG1
    (algebra_msm_VariableBaseMSM.cu:1246-1431), re-designed sort-based.
    """
    n = _batch_n(points)
    if c is None:
        c = _choose_c(n)
    if lanes is None:
        lanes = _choose_lanes(n)
    # pad to a multiple of lanes with zero scalars (bucket 0 = discarded)
    rows = -(-n // lanes)
    m = rows * lanes
    if m != n:
        points, _ = _pad_pow2_to(group, points, m)
        scalars_raw = jnp.pad(scalars_raw, ((0, 0), (0, m - n)))
    num_win = (SCALAR_BITS + c - 1) // c
    digits = _digits(scalars_raw, c, num_win)          # [num_win, m]

    def window_body(carry, d):
        w_res = _window_msm(group, points, d, c, lanes, rows)
        return carry, w_res

    _, window_results = jax.lax.scan(window_body, 0, digits)
    # combine MSB-first: acc = [2^c] acc + W_j
    def combine(j, acc):
        idx = num_win - 1 - j
        wj = _map_coords(window_results, lambda a: a[idx])
        def dbl(_, p):
            return group.double(p)
        acc = jax.lax.fori_loop(0, c, dbl, acc)
        return group.add(acc, wj)

    acc0 = jac.taint_point(group.infinity(()), window_results)
    return jax.lax.fori_loop(0, num_win, combine, acc0)


def _pad_pow2_to(group, points, m):
    n = _batch_n(points)
    if m == n:
        return points, m
    inf = group.infinity((m - n,))
    return _concat_points(points, inf), m


def _window_msm(group, points, d, c: int, lanes: int, rows: int):
    """One Pippenger window: bucket-accumulate and weight-reduce.

    ``d``: uint32[m] bucket ids (0 = skip).  Returns a single point.
    """
    m = d.shape[0]
    B = 1 << c
    order = jnp.argsort(d)
    d_sorted = d[order]
    pts = _map_coords(points, lambda a: a[..., order])

    # two-level inclusive EC prefix over sorted points
    # lane l owns sorted positions [l*rows, (l+1)*rows)
    def to_rows(a):  # [L, m] -> [rows, L, lanes]
        return jnp.moveaxis(a.reshape(a.shape[:-1] + (lanes, rows)), -1, 0)

    pts_rows = _map_coords(pts, to_rows)

    from octopuszk_tpu.fields.spec import NUM_LIMBS
    from octopuszk_tpu.ops import pallas_ops
    if (pallas_ops.enabled() and lanes >= 256
            and group.ops.group_name in ("G1", "G2")):
        # fused one-launch Pallas scan (carry in VMEM scratch)
        flat, rebuild = pallas_ops._flatten_coords(pts_rows)
        flat2d = tuple(a.reshape(rows * NUM_LIMBS, lanes) for a in flat)
        pref_flat = pallas_ops.scan_accumulate(
            group.ops.group_name, flat2d, rows, lanes)
        pref3d = [a.reshape(rows, NUM_LIMBS, lanes) for a in pref_flat]
        prefix_rows = rebuild(pref3d)
        lane_totals = rebuild([a[rows - 1] for a in pref3d])
    else:
        def step(carryp, row):
            newc = group.add(carryp, row)
            return newc, newc

        carry0 = jac.taint_point(group.infinity((lanes,)), pts)
        lane_totals, prefix_rows = jax.lax.scan(step, carry0, pts_rows)

    def from_rows(a):  # [rows, L, lanes] -> [L, m]
        a = jnp.moveaxis(a, 0, -1)            # [L, lanes, rows]
        return a.reshape(a.shape[:-2] + (m,))

    prefix_within = _map_coords(prefix_rows, from_rows)

    # exclusive prefix of lane totals across lanes (Hillis-Steele, rolled)
    incl = _hs_prefix(group, lane_totals, lanes)
    excl = _shift_right_inf(group, incl, lanes)

    # segment-end positions: e_b = (# elements with id <= b) - 1
    bucket_ids = jax.lax.broadcasted_iota(U32, (B, 1), 0)[:, 0]
    e = jnp.searchsorted(d_sorted, bucket_ids, side="right").astype(I32) - 1
    valid = e >= 0
    eg = jnp.maximum(e, 0)
    at_within = _map_coords(prefix_within, lambda a: a[..., eg])
    at_lane = _map_coords(excl, lambda a: a[..., eg // rows])
    cum = group.add(at_within, at_lane)            # [B] points
    cum = group.select(valid, cum, group.infinity((B,)))

    # Abel summation: with S_b = cum[b] - cum[b-1],
    #   sum_b b*S_b = (B-1)*cum[B-1] - sum_{b=0}^{B-2} cum[b]
    # (bucket 0 and empty buckets handled automatically).
    cum_last = _map_coords(cum, lambda a: a[..., B - 1])
    rest = _map_coords(cum, lambda a: a[..., :B - 1])
    sum_rest = _scan_sum(group, rest, B - 1)
    # (B-1)*cum_last = 2^c*cum_last - cum_last
    def dbl(_, q):
        return group.double(q)
    shifted = jax.lax.fori_loop(0, c, dbl, cum_last)
    weighted = group.add(shifted, group.negate(cum_last))
    return group.add(weighted, group.negate(sum_rest))


def _scan_sum(group, p, n: int, width: int = 2048):
    """Sum n points in O(n) adds: serial scan over rows of `width` lanes,
    then a small Hillis-Steele fold across lanes."""
    width = min(width, n)
    rows = -(-n // width)
    m = rows * width
    if m != n:
        p, _ = _pad_pow2_to(group, p, m)

    def to_rows(a):  # [L, m] -> [rows, L, width]
        return jnp.moveaxis(a.reshape(a.shape[:-1] + (width, rows)), -1, 0)

    def step(carry, row):
        return group.add(carry, row), 0

    carry0 = jac.taint_point(group.infinity((width,)), p)
    totals, _ = jax.lax.scan(step, carry0, _map_coords(p, to_rows))
    return group.tree_reduce(totals, width)


def _hs_prefix(group, p, n: int):
    """Inclusive EC prefix sums along the last axis (Hillis-Steele under
    one fori_loop: level l adds element j - 2^l into element j)."""
    iota = jnp.arange(n, dtype=jnp.int32)
    inf = group.infinity((n,))

    def body(l, q):
        d = jnp.left_shift(jnp.int32(1), l)
        idx = jnp.maximum(iota - d, 0)
        shifted = _map_coords(q, lambda c: c[..., idx])
        valid = iota - d >= 0
        shifted = jac.select_point(group.ops, valid, shifted, inf)
        return jac.add(group.ops, q, shifted)

    levels = (n - 1).bit_length()
    return jax.lax.fori_loop(0, levels, body, p)


def _hs_suffix(group, p, n: int):
    """Inclusive EC suffix sums along the last axis."""
    iota = jnp.arange(n, dtype=jnp.int32)
    inf = group.infinity((n,))

    def body(l, q):
        d = jnp.left_shift(jnp.int32(1), l)
        idx = jnp.minimum(iota + d, n - 1)
        shifted = _map_coords(q, lambda c: c[..., idx])
        valid = iota + d < n
        shifted = jac.select_point(group.ops, valid, shifted, inf)
        return jac.add(group.ops, q, shifted)

    levels = (n - 1).bit_length()
    return jax.lax.fori_loop(0, levels, body, p)


def _shift_right_inf(group, p, width):
    """

    Shift a [width] point batch right by one along the batch axis,
    filling slot 0 with the identity (exclusive-prefix helper).
    """
    inf1 = group.infinity((1,))
    return tuple(
        tuple(jnp.concatenate([zi, ci[..., :-1]], axis=-1)
              for zi, ci in zip(z, cc)) if isinstance(cc, tuple)
        else jnp.concatenate([z, cc[..., :-1]], axis=-1)
        for z, cc in zip(inf1, p))


# ---------------------------------------------------------------------------
# large-scale variable-base Pippenger (signed digits, packed-row gathers)
# ---------------------------------------------------------------------------
#
# The sort-based path above gathers point limbs along the MINOR axis of
# [L, n] coord tensors: on TPU every gathered element fetches a whole
# (8, 128) tile, an ~128x read amplification (measured ~6 GB/s effective).
# The large path re-lays points out as PACKED ROWS — u32[n, P] with the
# affine X, Y limbs and an identity flag along the lane axis — so the
# per-window shuffle is a row gather (~8x amplification, measured 34-79
# GB/s), then transposes back to [L, m] for compute.  Signed windowed
# digits halve the bucket count (B = 2^(c-1)+1), point negation is a free
# Y-negate folded into the shuffle, and the bucket accumulation runs as
# the fused Pallas MIXED-add scan (affine rows into a projective carry:
# 11M vs 12M, 2/3 the scan input traffic).  Chunking bounds transient HBM
# (the reference bounds its JNI batches the same way at 2^21-2^23,
# FixedBaseMSM.java:200,257,510).
#
# Reference parity: VariableBaseMSM.serialMSM -> pippengerMSMG1
# (algebra_msm_VariableBaseMSM.cu:1246-1431); the signed-digit/row-pack/
# mixed-add design is TPU-specific.


def _signed_digits(scalars_raw, c: int, num_win: int):
    """Signed windowed digits: magnitudes in [0, 2^(c-1)] and sign bits.

    d_j in (-2^(c-1), 2^(c-1)]: if the raw c-bit digit (plus carry) is
    > 2^(c-1) it becomes d - 2^c and carries 1 into the next window.
    Requires num_win*c >= 255 so the final carry is absorbed.
    """
    assert num_win * c >= 255, (num_win, c)
    digits = _digits(scalars_raw, c, num_win)
    half = U32(1 << (c - 1))
    full = U32(1 << c)
    mags, negs = [], []
    carry = jnp.zeros_like(digits[0])
    for j in range(num_win):
        d = digits[j] + carry
        go = d > half
        mags.append(jnp.where(go, full - d, d))
        carry = go.astype(jnp.uint32)
        negs.append(carry)
    return jnp.stack(mags), jnp.stack(negs)


def _affine_flat(group, x, y):
    """Affine coord pytrees -> flat list of [L, n] arrays (X then Y)."""
    flat = []
    for coord in (x, y):
        if isinstance(coord, tuple):
            flat.extend(coord)
        else:
            flat.append(coord)
    return flat


def _points_per_row(group) -> int:
    """Points per packed 128-lane row: 4 for G1 (32 limb lanes each),
    2 for G2 (64)."""
    return 128 // (2 * group.coord_dim * NUM_LIMBS)


def pack_affine_rows(group, x, y):
    """Pack affine points into u32[n/ppr, 128] gather rows.

    Each row holds ``ppr`` consecutive points (their X then Y limb
    vectors along the lane axis).  128 u32 lanes = exactly one (8, 128)
    tile row, so the packed base has ZERO tile-padding waste — at 2^24
    the G1 base is 2 GB resident instead of the 8 GB a [n, 64] layout
    physically occupies.  The identity encodes as (0, 0) — no odd-order
    subgroup point has Y = 0.
    """
    flat = _affine_flat(group, x, y)
    stacked = jnp.concatenate(flat, axis=0)              # [C, n]
    C, n = stacked.shape
    ppr = 128 // C
    assert n % ppr == 0, (n, ppr)
    # [C, n] -> [C, n/ppr, ppr] -> [n/ppr, ppr, C] -> [n/ppr, 128]
    return jnp.moveaxis(stacked.reshape(C, n // ppr, ppr), 0, -1).reshape(
        n // ppr, 128)


def points_to_packed(group, points, pad_to: int | None = None):
    """Projective point batch -> packed rows u32[pad_to/ppr, 128].

    Affine conversion via the O(n) two-level batched inverse; padding
    appends identity points ((0, 0) encoding).
    """
    n = _batch_n(points)
    x, y, inf = jac.to_affine_fast(group.ops, points)
    del inf   # identity already landed as (0, 0)
    if pad_to is not None and pad_to != n:
        x, y = (_map_coords((x, y), lambda a: jnp.pad(
            a, ((0, 0), (0, pad_to - n)))))
    return pack_affine_rows(group, x, y)


def packed_to_points(group, packed):
    """Packed affine rows u32[n/ppr, 128] -> projective point batch [n].

    Inverse of ``points_to_packed``; (0, 0)-encoded identities map to the
    projective identity (0, 1, 0)."""
    from octopuszk_tpu.fields import fp

    ppr = _points_per_row(group)
    cd = group.coord_dim
    C = 128 // ppr
    n = packed.shape[0] * ppr
    t = packed.reshape(n, C).T                       # [C, n]
    coords = [jax.lax.slice_in_dim(t, i * NUM_LIMBS, (i + 1) * NUM_LIMBS,
                                   axis=0) for i in range(2 * cd)]
    spec = group.ops.spec
    one = fp.constant(spec.one_mont_limbs, (n,))
    zero = jnp.zeros_like(one)
    ymax = coords[cd]
    for yc in coords[cd + 1:]:
        ymax = ymax | yc
    inf = jnp.max(ymax, axis=0) == U32(0)

    def sel(a, b):
        return jnp.where(inf, a, b)

    if cd == 1:
        return (sel(zero, coords[0]), sel(one, coords[1]), sel(zero, one))
    return ((sel(zero, coords[0]), sel(zero, coords[1])),
            (sel(one, coords[2]), sel(zero, coords[3])),
            (sel(zero, one), zero))


def _gather_packed(group, packed, order, negb=None):
    """Row-gather points ``order`` (int32[m]) from packed affine rows
    u32[n/ppr, 128] -> list of 2*coord_dim coord arrays [L, m].

    ``negb`` (bool[m], optional) negates Y per element — free sign folding
    for signed-digit windows.  The identity encodes as (0, 0) — no
    odd-order subgroup point has Y = 0 — and fp.neg(0) = 0 keeps that
    encoding.
    """
    from octopuszk_tpu.fields import fp

    m = order.shape[0]
    cd = group.coord_dim
    spec = group.ops.spec
    C = 2 * cd * NUM_LIMBS             # limb lanes per point
    ppr = 128 // C                     # points per packed row

    g = packed[order // ppr]            # [m, 128] row gather
    if ppr > 1:
        # select this point's sub-block: fold over the bits of (order%ppr)
        g = g.reshape(m, ppr, C)
        sub = order % ppr
        half = ppr
        while half > 1:
            half //= 2
            lo = g[:, :half]
            hi = g[:, half:]
            take_hi = (sub & half) != 0
            g = jnp.where(take_hi[:, None, None], hi, lo)
        g = g.reshape(m, C)

    t = g.T                             # [C, m]
    coords = [jax.lax.slice_in_dim(t, i * NUM_LIMBS, (i + 1) * NUM_LIMBS,
                                   axis=0) for i in range(2 * cd)]
    if negb is not None:
        for i in range(cd, 2 * cd):
            coords[i] = jnp.where(negb, fp.neg(spec, coords[i]), coords[i])
    return coords


def _window_msm_mixed(group, packed, d_sorted, idx2s, c: int, lanes: int,
                      rows: int):
    """One signed-digit Pippenger window over packed rows -> one point.

    ``d_sorted``/``idx2s``: this window's pre-sorted bucket magnitudes and
    (index << 1 | negbit) payloads (sorts for all windows are batched into
    one lax.sort call by the caller).
    """
    from octopuszk_tpu.ops import pallas_ops

    m = d_sorted.shape[0]
    B = (1 << (c - 1)) + 1             # bucket ids 0..2^(c-1); 0 = skip
    cd = group.coord_dim

    order = (idx2s >> 1).astype(jnp.int32)
    negb = (idx2s & 1) != 0
    coords = _gather_packed(group, packed, order, negb)

    def to_rows(a):  # [L, m] -> [rows, L, lanes]
        return jnp.moveaxis(a.reshape(a.shape[:-1] + (lanes, rows)), -1, 0)

    if (pallas_ops.enabled() and lanes >= 128
            and group.ops.group_name in ("G1", "G2")):
        aff_flat = [to_rows(a).reshape(rows * NUM_LIMBS, lanes)
                    for a in coords]
        pref_flat = pallas_ops.scan_accumulate_mixed(
            group.ops.group_name, aff_flat, rows, lanes)
        pref3d = [a.reshape(rows, NUM_LIMBS, lanes) for a in pref_flat]
        _, _, rebuild = pallas_ops._group_ops(group.ops.group_name)
        prefix_rows = rebuild(pref3d)
        lane_totals = rebuild([a[rows - 1] for a in pref3d])
    else:
        # XLA fallback: lax.scan of mixed adds (CPU tests / no-Pallas)
        if cd == 1:
            q_aff = (coords[0], coords[1])
            ymax = coords[1]
        else:
            q_aff = ((coords[0], coords[1]), (coords[2], coords[3]))
            ymax = coords[2] | coords[3]
        infm = jnp.max(ymax, axis=0) == U32(0)
        q_rows = _map_coords(q_aff, to_rows)
        inf_rows = jnp.moveaxis(infm.reshape(lanes, rows), -1, 0)

        def step(carryp, xs):
            row, im = xs
            newc = jac.mixed_add(group.ops, carryp, row, q_inf_mask=im)
            return newc, newc

        carry0 = jac.taint_point(group.infinity((lanes,)), q_aff)
        lane_totals, prefix_rows = jax.lax.scan(
            step, carry0, (q_rows, inf_rows))

    def from_rows(a):  # [rows, L, lanes] -> [L, m]
        a = jnp.moveaxis(a, 0, -1)
        return a.reshape(a.shape[:-2] + (m,))

    prefix_within = _map_coords(prefix_rows, from_rows)
    incl = _hs_prefix(group, lane_totals, lanes)
    excl = _shift_right_inf(group, incl, lanes)

    bucket_ids = jax.lax.broadcasted_iota(U32, (B, 1), 0)[:, 0]
    e = jnp.searchsorted(d_sorted, bucket_ids, side="right").astype(I32) - 1
    valid = e >= 0
    eg = jnp.maximum(e, 0)
    at_within = _map_coords(prefix_within, lambda a: a[..., eg])
    at_lane = _map_coords(excl, lambda a: a[..., eg // rows])
    cum = group.add(at_within, at_lane)
    cum = group.select(valid, cum, group.infinity((B,)))

    # Abel: sum_b b*S_b = M*cum[M] - sum_{b<M} cum[b],  M = 2^(c-1)
    cum_last = _map_coords(cum, lambda a: a[..., B - 1])
    rest = _map_coords(cum, lambda a: a[..., :B - 1])
    sum_rest = _scan_sum(group, rest, B - 1)

    def dbl(_, q):
        return group.double(q)

    shifted = jax.lax.fori_loop(0, c - 1, dbl, cum_last)
    return group.add(shifted, group.negate(sum_rest))


def _choose_c_large(chunk_m: int) -> int:
    """Signed-window width: bucket phase ~2*2^(c-1) adds per window-chunk
    vs chunk_m scan adds; c = log2(chunk_m) - 4 keeps it ~6%."""
    return max(8, min(17, chunk_m.bit_length() - 1 - 4))


@functools.partial(jax.jit, static_argnums=(0, 3, 4, 5, 6))
def _msm_large_packed(group, packed, scalars_raw, num_win: int, c: int,
                      lanes: int, rows: int):
    """packed u32[m_total, P] (identity-padded), scalars u32[L, m_total]
    -> one point.  One compiled window pipeline (lax.scan over chunks and
    windows)."""
    ppr = _points_per_row(group)
    m_total = packed.shape[0] * ppr
    chunk_m = lanes * rows
    num_chunks = m_total // chunk_m
    packed_chunks = packed.reshape(num_chunks, chunk_m // ppr, 128)
    # scalars stay raw until inside the chunk body: digit tensors for all
    # windows at once would cost 2 * num_win * m_total bytes of HBM
    scalars_chunks = jnp.moveaxis(
        scalars_raw.reshape(NUM_LIMBS, num_chunks, chunk_m), 1, 0)

    def chunk_body(acc, xs):
        packed_c, sc_c = xs
        mag_c, neg_c = _signed_digits(sc_c, c, num_win)
        # ONE batched sort for all windows of this chunk
        iota2 = (jax.lax.broadcasted_iota(U32, (num_win, chunk_m), 1)
                 << 1) | neg_c
        d_sorted, idx2s = jax.lax.sort(
            (mag_c, iota2), dimension=1, num_keys=1)

        def win_body(_, wxs):
            ds_w, ix_w = wxs
            return 0, _window_msm_mixed(
                group, packed_c, ds_w, ix_w, c, lanes, rows)

        _, wpts = jax.lax.scan(win_body, 0, (d_sorted, idx2s))
        wpts = _map_coords(wpts, lambda a: jnp.moveaxis(a, 0, -1))
        return group.add(acc, wpts), None

    acc0 = jac.taint_point(group.infinity((num_win,)), packed_chunks,
                           scalars_chunks)
    window_results, _ = jax.lax.scan(
        chunk_body, acc0, (packed_chunks, scalars_chunks))

    def combine(j, acc):
        idx = num_win - 1 - j
        wj = _map_coords(window_results, lambda a: a[..., idx])

        def dbl(_, p):
            return group.double(p)

        acc = jax.lax.fori_loop(0, c, dbl, acc)
        return group.add(acc, wj)

    accf = jac.taint_point(group.infinity(()), window_results)
    return jax.lax.fori_loop(0, num_win, combine, accf)


def _plan_packed(n: int, lanes: int | None, chunk_log: int):
    """Chunk plan shared by packing and execution: (num_chunks, lanes,
    chunk_m, m_total).  lanes >= 4 keeps chunk_m divisible by every
    group's points-per-row."""
    num_chunks = max(1, -(-n // (1 << chunk_log)))
    if lanes is None:
        lanes = min(1 << max(0, (n // num_chunks).bit_length() - 1), 4096)
    lanes = max(lanes, 4)
    chunk_m = lanes * (-(-n // (num_chunks * lanes)))
    return num_chunks, lanes, chunk_m, num_chunks * chunk_m


def pippenger_msm_large(group, points, scalars_raw, c: int | None = None,
                        lanes: int | None = None, chunk_log: int = 22):
    """Large variable-base MSM: signed digits + packed-row shuffles +
    fused mixed-add scans, chunked to bound transient HBM."""
    n = _batch_n(points)
    packed = _prep_packed(group, points, _msm_pad_to(group, n, lanes,
                                                     chunk_log))
    return pippenger_msm_packed(group, packed, scalars_raw, c, lanes,
                                chunk_log)


def _msm_pad_to(group, n, lanes, chunk_log):
    return _plan_packed(n, lanes, chunk_log)[3]


# below this size the naive double-and-add module replaces the Pippenger
# pipeline (matches parallel/dmsm.NAIVE_THRESHOLD): the bucket machinery
# can't win at tiny n, the naive module compiles ~5x faster on XLA:CPU,
# and the full window pipeline for non-Pallas curve families (bn254b G2)
# has crashed the XLA:CPU compiler (deep-recursion segfault) — the
# reference likewise dispatches small inputs to its simple CPU algorithms
# (VariableBaseMSM.java:199-213).  Pinning c/lanes forces Pippenger.
NAIVE_THRESHOLD = 1 << 10


@functools.partial(jax.jit, static_argnums=(0,))
def _naive_packed(group, packed, scalars_raw):
    return msm_naive(group, packed_to_points(group, packed), scalars_raw)


def pippenger_msm_packed(group, packed, scalars_raw,
                         c: int | None = None, lanes: int | None = None,
                         chunk_log: int = 22):
    """Variable-base MSM over a pre-packed base (``points_to_packed``).

    The packed form is the natural at-rest layout for CRS query vectors —
    pack once at setup, reuse across proofs (the reference re-marshals
    Java arrays into JNI buffers per call instead).
    """
    ppr = _points_per_row(group)
    n = packed.shape[0] * ppr
    if scalars_raw.shape[1] != n:
        scalars_raw = jnp.pad(
            scalars_raw, ((0, 0), (0, n - scalars_raw.shape[1])))
    if c is None and lanes is None and n <= NAIVE_THRESHOLD:
        return _naive_packed(group, packed, scalars_raw)
    num_chunks, lanes, chunk_m, m_total = _plan_packed(n, lanes, chunk_log)
    rows = chunk_m // lanes
    assert m_total == n, (m_total, n)   # packed bases are pre-padded
    if c is None:
        c = _choose_c_large(chunk_m)
    num_win = -(-255 // c)
    return _msm_large_packed(group, packed, scalars_raw, num_win, c,
                             lanes, rows)


@functools.partial(jax.jit, static_argnums=(1, 2))
def _sorted_digits(scalars_chunk, num_win: int, c: int):
    """Signed digits + ONE batched per-window sort for a chunk: returns
    (d_sorted, idx2s) with idx2s = (source index << 1) | negbit."""
    chunk_m = scalars_chunk.shape[1]
    mag_c, neg_c = _signed_digits(scalars_chunk, c, num_win)
    iota2 = (jax.lax.broadcasted_iota(U32, (num_win, chunk_m), 1)
             << 1) | neg_c
    return jax.lax.sort((mag_c, iota2), dimension=1, num_keys=1)


@functools.partial(jax.jit, static_argnums=(0, 4, 5, 6))
def _windows_from_sorted(group, packed_chunk, d_sorted, idx2s, c: int,
                         lanes: int, rows: int):
    """All windows of one chunk from pre-sorted digits -> [.., num_win]
    point batch."""
    def win_body(_, wxs):
        ds_w, ix_w = wxs
        return 0, _window_msm_mixed(group, packed_chunk, ds_w, ix_w, c,
                                    lanes, rows)

    _, wpts = jax.lax.scan(win_body, 0, (d_sorted, idx2s))
    return _map_coords(wpts, lambda a: jnp.moveaxis(a, 0, -1))


@functools.partial(jax.jit, static_argnums=(0, 2))
def _combine_windows(group, window_results, c: int):
    """MSB-first window combination: acc = [2^c] acc + W_j."""
    num_win = None
    for leaf in jax.tree_util.tree_leaves(window_results):
        num_win = leaf.shape[-1]
        break

    def step(j, acc):
        idx = num_win - 1 - j
        wj = _map_coords(window_results, lambda a: a[..., idx])

        def dbl(_, p):
            return group.double(p)

        acc = jax.lax.fori_loop(0, c, dbl, acc)
        return group.add(acc, wj)

    accf = jac.taint_point(group.infinity(()), window_results)
    return jax.lax.fori_loop(0, num_win, step, accf)


def _msm_large_packed_double(g1, g2, packed1, packed2, scalars_raw,
                             num_win: int, c: int, lanes: int, rows: int):
    """Fused G1+G2 double MSM over packed bases with SHARED scalars:
    signed-digit extraction and the batched per-window sort are computed
    once per chunk and drive both groups' bucket pipelines.

    Reference parity: VariableBaseMSM.doubleMSM / the fused
    variableBaseDoubleMSMNativeHelper (VariableBaseMSM.java:489-771,
    algebra_msm_VariableBaseMSM.cu:1712-1806) — the reference fuses the
    two MSMs into one JNI/GPU launch for the prover's queryB; here the
    shared work (digits, signs, sort) is hoisted instead, which is the
    part a TPU actually re-pays (the EC adds themselves can't be shared).
    The chunk loop runs at the python level and the two groups compile as
    SEPARATE modules: one fused module crashes XLA:CPU (a recursive pass
    overflows its stack on the doubled graph) and fusing across the two
    independent dataflows buys nothing.
    """
    ppr1, ppr2 = _points_per_row(g1), _points_per_row(g2)
    m_total = packed1.shape[0] * ppr1
    chunk_m = lanes * rows
    num_chunks = m_total // chunk_m
    p1_chunks = packed1.reshape(num_chunks, chunk_m // ppr1, 128)
    p2_chunks = packed2.reshape(num_chunks, chunk_m // ppr2, 128)

    wr1 = wr2 = None
    for k in range(num_chunks):
        sc_c = jax.lax.slice_in_dim(scalars_raw, k * chunk_m,
                                    (k + 1) * chunk_m, axis=1)
        d_sorted, idx2s = _sorted_digits(sc_c, num_win, c)
        w1 = _windows_from_sorted(g1, p1_chunks[k], d_sorted, idx2s, c,
                                  lanes, rows)
        w2 = _windows_from_sorted(g2, p2_chunks[k], d_sorted, idx2s, c,
                                  lanes, rows)
        wr1 = w1 if wr1 is None else g1.add(wr1, w1)
        wr2 = w2 if wr2 is None else g2.add(wr2, w2)
    return (_combine_windows(g1, wr1, c), _combine_windows(g2, wr2, c))


def pippenger_double_msm_packed(g1, g2, packed1, packed2, scalars_raw,
                                c: int | None = None,
                                lanes: int | None = None,
                                chunk_log: int = 22):
    """Fused variable-base double MSM (same scalars, G1 and G2 bases).

    Both packed bases must cover the same (padded) point count."""
    ppr1, ppr2 = _points_per_row(g1), _points_per_row(g2)
    n = packed1.shape[0] * ppr1
    assert packed2.shape[0] * ppr2 == n, (packed1.shape, packed2.shape)
    if scalars_raw.shape[1] != n:
        scalars_raw = jnp.pad(
            scalars_raw, ((0, 0), (0, n - scalars_raw.shape[1])))
    if c is None and lanes is None and n <= NAIVE_THRESHOLD:
        return (_naive_packed(g1, packed1, scalars_raw),
                _naive_packed(g2, packed2, scalars_raw))
    num_chunks, lanes, chunk_m, m_total = _plan_packed(n, lanes, chunk_log)
    rows = chunk_m // lanes
    assert m_total == n, (m_total, n)
    if c is None:
        c = _choose_c_large(chunk_m)
    num_win = -(-255 // c)
    return _msm_large_packed_double(g1, g2, packed1, packed2, scalars_raw,
                                    num_win, c, lanes, rows)


@functools.partial(jax.jit, static_argnums=(0, 2))
def _prep_packed(group, points, pad_to: int):
    return points_to_packed(group, points, pad_to=pad_to)


# ---------------------------------------------------------------------------
# host reference algorithms (CPU; parity with the reference's Java paths)
# ---------------------------------------------------------------------------

def sorted_msm_host(group, scalars, points):
    """Sort by scalar, multiply scalar *differences* into running suffix
    sums: VariableBaseMSM.sortedMSM (VariableBaseMSM.java:41-56).
    Host python-int reference algorithm."""
    out = None
    running = None
    prev_s = None
    for s, p in sorted(zip(scalars, points), key=lambda t: -t[0]):
        if prev_s is not None and prev_s != s:
            out = group.host.add(out, group.host.mul(running, prev_s - s))
        running = group.host.add(running, p)
        prev_s = s
    if prev_s is not None:
        out = group.host.add(out, group.host.mul(running, prev_s))
    return out


def bos_coster_msm_host(group, scalars, points):
    """Bos-Coster: repeatedly reduce the two largest scalars.

    VariableBaseMSM.bosCosterMSM (VariableBaseMSM.java:86-119)."""
    import heapq

    heap = [(-s, i) for i, s in enumerate(scalars) if s]
    pts = list(points)
    heapq.heapify(heap)
    if not heap:
        return None
    while len(heap) > 1:
        s1, i1 = heapq.heappop(heap)
        s2, i2 = heap[0]
        s1, s2 = -s1, -s2
        if s2 == 0 or s1 // s2 > (1 << 20):
            # degenerate: finish with double-and-add
            heapq.heappush(heap, (-s1, i1))
            acc = None
            for s, i in heap:
                acc = group.host.add(acc, group.host.mul(pts[i], -s))
            return acc
        s1 -= s2
        pts[i2] = group.host.add(pts[i2], pts[i1])
        if s1:
            heapq.heappush(heap, (-s1, i1))
    s, i = heap[0]
    return group.host.mul(pts[i], -s)


def pippenger_host(group, scalars, points, c: int = 8,
                   order: int | None = None):
    """Host-int Pippenger (CPU reference: VariableBaseMSM.pippengerMSM,
    VariableBaseMSM.java:134-188).  ~9x fewer EC ops than naive_msm at
    n ~ 1000 — used by the verifier's primary-input MSM.

    ``order``: group order; when given, scalars are reduced mod order
    first so negative / unnormalized caller input decomposes correctly
    (python ``>>`` on negative ints would silently corrupt digits).
    """
    if order is not None:
        scalars = [s % order for s in scalars]
    if not scalars:
        return None
    assert all(s >= 0 for s in scalars), \
        "negative scalars need `order` to normalize"
    num_win = (max(s.bit_length() for s in scalars) + c - 1) // c or 1
    mask = (1 << c) - 1
    acc = None
    for w in range(num_win - 1, -1, -1):
        for _ in range(c):
            acc = group.host.add(acc, acc) if acc is not None else None
        buckets = [None] * (1 << c)
        for s, p in zip(scalars, points):
            d = (s >> (c * w)) & mask
            if d and p is not None:
                buckets[d] = group.host.add(buckets[d], p)
        run = tot = None
        for b in range(mask, 0, -1):
            run = group.host.add(run, buckets[b])
            tot = group.host.add(tot, run)
        acc = group.host.add(acc, tot)
    return acc


def double_batch_msm(g1_group, g2_group, base_g1, base_g2, scalars_raw,
                     w: int | None = None):
    """[s_i]G1 and [s_i]G2 for the same scalars — the reference's
    doubleBatchMSM (FixedBaseMSM.java:489-604) runs both in one GPU
    launch; here the two fixed-base MSMs are issued back-to-back and XLA
    overlaps them."""
    return (fixed_base_msm(g1_group, base_g1, scalars_raw, w),
            fixed_base_msm(g2_group, base_g2, scalars_raw, w))


# ---------------------------------------------------------------------------
# field "MSM" (elementwise scalar * field base)
# ---------------------------------------------------------------------------

def field_batch_msm(spec, base_mont, scalars_mont):
    """Elementwise scalars[i] * base over Fr (both in Montgomery form).

    Reference parity: field_MSM (algebra_msm_FixedBaseMSM.cu:1241-1266).
    """
    from octopuszk_tpu.fields import fp
    return fp.mont_mul(spec, scalars_mont, base_mont[:, None])


# ---------------------------------------------------------------------------
# host-streamed packed MSM (CRS larger than HBM: docs/HBM_BUDGET.md)
# ---------------------------------------------------------------------------


def _stream_plan(group, packed_host, scalars_host, lanes, chunk_log, c):
    import numpy as np

    ppr = _points_per_row(group)
    n = packed_host.shape[0] * ppr
    if scalars_host.shape[1] != n:
        scalars_host = np.pad(
            np.asarray(scalars_host),
            ((0, 0), (0, n - scalars_host.shape[1])))
    num_chunks, lanes, chunk_m, m_total = _plan_packed(n, lanes, chunk_log)
    assert m_total == n, (m_total, n)   # packed bases are pre-padded
    if c is None:
        c = _choose_c_large(chunk_m)
    return scalars_host, num_chunks, lanes, chunk_m, c, -(-255 // c), ppr


def pippenger_msm_packed_stream(group, packed_host, scalars_host,
                                c: int | None = None,
                                lanes: int | None = None,
                                chunk_log: int = 22):
    """Variable-base MSM over a HOST-resident packed base (numpy array),
    streamed to the device one chunk at a time — the 2^24-scale path
    where the CRS exceeds HBM (docs/HBM_BUDGET.md).  Numerically
    identical to ``pippenger_msm_packed``; mirrors the reference's
    2^21-2^23-element JNI batch streaming (FixedBaseMSM.java:200,257,510).
    """
    if (c is None and lanes is None
            and packed_host.shape[0] * _points_per_row(group)
            <= NAIVE_THRESHOLD):
        return pippenger_msm_packed(group, jnp.asarray(packed_host),
                                    jnp.asarray(scalars_host))
    scalars_host, num_chunks, lanes, chunk_m, c, num_win, ppr = \
        _stream_plan(group, packed_host, scalars_host, lanes, chunk_log, c)
    rows = chunk_m // lanes
    wr = None
    for k in range(num_chunks):
        pc = jnp.asarray(packed_host[k * chunk_m // ppr:
                                     (k + 1) * chunk_m // ppr])
        sc = jnp.asarray(scalars_host[:, k * chunk_m:(k + 1) * chunk_m])
        ds, ix = _sorted_digits(sc, num_win, c)
        w = _windows_from_sorted(group, pc, ds, ix, c, lanes, rows)
        wr = w if wr is None else group.add(wr, w)
    return _combine_windows(group, wr, c)


def pippenger_double_msm_packed_stream(g1, g2, p1_host, p2_host,
                                       scalars_host, c: int | None = None,
                                       lanes: int | None = None,
                                       chunk_log: int = 22):
    """Streamed fused double MSM: shared scalars against host-resident
    G1 and G2 packed bases; digit extraction + the batched per-window
    sort run once per chunk for both groups."""
    if (c is None and lanes is None
            and p1_host.shape[0] * _points_per_row(g1) <= NAIVE_THRESHOLD):
        return pippenger_double_msm_packed(
            g1, g2, jnp.asarray(p1_host), jnp.asarray(p2_host),
            jnp.asarray(scalars_host))
    scalars_host, num_chunks, lanes, chunk_m, c, num_win, ppr1 = \
        _stream_plan(g1, p1_host, scalars_host, lanes, chunk_log, c)
    ppr2 = _points_per_row(g2)
    assert p2_host.shape[0] * ppr2 == p1_host.shape[0] * ppr1
    rows = chunk_m // lanes
    wr1 = wr2 = None
    for k in range(num_chunks):
        sc = jnp.asarray(scalars_host[:, k * chunk_m:(k + 1) * chunk_m])
        ds, ix = _sorted_digits(sc, num_win, c)
        p1c = jnp.asarray(p1_host[k * chunk_m // ppr1:
                                  (k + 1) * chunk_m // ppr1])
        p2c = jnp.asarray(p2_host[k * chunk_m // ppr2:
                                  (k + 1) * chunk_m // ppr2])
        w1 = _windows_from_sorted(g1, p1c, ds, ix, c, lanes, rows)
        w2 = _windows_from_sorted(g2, p2c, ds, ix, c, lanes, rows)
        wr1 = w1 if wr1 is None else g1.add(wr1, w1)
        wr2 = w2 if wr2 is None else g2.add(wr2, w2)
    return (_combine_windows(g1, wr1, c), _combine_windows(g2, wr2, c))


# ---------------------------------------------------------------------------
# partitioned host profiling variants (reference parity:
# VariableBaseMSM.distributedSortedMSM / BosCoster / Pippenger,
# VariableBaseMSM.java:821-892 — Spark mapPartitions(CPU algorithm) +
# reduce(add), used only by the profiler to compare algorithm classes)
# ---------------------------------------------------------------------------


def _partitioned_host_msm(group, scalars, points, alg, num_partitions):
    """Split (scalars, points) into partitions, run a host algorithm per
    partition, reduce with host adds — the exact shape of the reference's
    mapPartitions profiling wrappers (the real prover path is the device
    Pippenger; these exist for algorithm-class comparisons)."""
    n = len(scalars)
    num_partitions = max(1, min(num_partitions, n))
    per = -(-n // num_partitions)
    acc = None
    for i in range(0, n, per):
        part = alg(group, scalars[i:i + per], points[i:i + per])
        acc = group.host.add(acc, part)
    return acc


def distributed_sorted_msm_host(group, scalars, points, num_partitions=8):
    """VariableBaseMSM.distributedSortedMSM (…java:821-845) parity."""
    return _partitioned_host_msm(group, scalars, points, sorted_msm_host,
                                 num_partitions)


def distributed_bos_coster_msm_host(group, scalars, points,
                                    num_partitions=8):
    """VariableBaseMSM.distributedBosCosterMSM (…java:846-868) parity."""
    return _partitioned_host_msm(group, scalars, points,
                                 bos_coster_msm_host, num_partitions)


def distributed_pippenger_msm_host(group, scalars, points,
                                   num_partitions=8):
    """VariableBaseMSM.distributedPippengerMSM (…java:869-892) parity."""
    return _partitioned_host_msm(
        group, scalars, points,
        lambda g, s, p: pippenger_host(g, s, p), num_partitions)
