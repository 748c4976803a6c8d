"""Row-gather microbenchmark: XLA dynamic gather vs Pallas scalar-prefetch.

The packed-MSM window shuffle is a random row gather from u32[R, 128]
(512 B/row) — measured at 25-79 GB/s effective in round 4, ~3-10% of the
819 GB/s HBM peak, and ~40% of MSM window time.  This script measures:

  1. XLA `jnp.take(packed, idx, axis=0)` (the production path);
  2. a Pallas kernel whose input BlockSpec index_map reads the row index
     from a scalar-prefetch operand — the paged-attention-style gather
     where the pipeline DMAs each (G, 128) output block's G source rows.

Usage: python scripts/gather_experiment.py [log2_rows]   (default 2^21)
Prints one JSON line per measurement; findings go to STATUS.md.
"""

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

G = 8  # rows gathered per grid step (G in_specs of one row each)


@functools.cache
def _pallas_gather(m: int):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(idx_ref, *refs):
        ins = refs[:G]
        out = refs[G]
        for k in range(G):
            out[k:k + 1, :] = ins[k][...]

    in_specs = [
        pl.BlockSpec((1, 128),
                     (lambda i, idx_ref, k=k: (idx_ref[G * i + k], 0)))
        for k in range(G)
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(m // G,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((G, 128), lambda i, idx_ref: (i, 0)),
    )

    interpret = jax.default_backend() == "cpu"

    @jax.jit
    def run(idx, packed):
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((m, 128), jnp.uint32),
            interpret=interpret,
        )(idx, *([packed] * G))

    return run


def _bench(fn, *args, iters=10):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    np.asarray(out.ravel()[:1])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    np.asarray(out.ravel()[:1])
    return (time.perf_counter() - t0) / iters


def main(log2r: int = 21):
    import jax
    import jax.numpy as jnp

    R = 1 << log2r
    m = R  # gather as many rows as the table holds (the MSM shape)
    rng = np.random.default_rng(3)
    packed = jnp.asarray(
        rng.integers(0, 1 << 32, size=(R, 128), dtype=np.uint32))
    idx = jnp.asarray(rng.permutation(R).astype(np.int32))
    bytes_moved = m * 128 * 4

    xla = jax.jit(lambda i, p: jnp.take(p, i, axis=0))
    dt = _bench(xla, idx, packed)
    print(json.dumps({"metric": "xla_row_gather", "log2_rows": log2r,
                      "seconds": round(dt, 5),
                      "GBps": round(bytes_moved / dt / 1e9, 2)}), flush=True)

    try:
        pg = _pallas_gather(m)
        got = pg(idx, packed)
        assert np.array_equal(np.asarray(got), np.asarray(packed)[np.asarray(idx)])
        dt = _bench(pg, idx, packed)
        print(json.dumps({"metric": "pallas_prefetch_gather",
                          "log2_rows": log2r, "seconds": round(dt, 5),
                          "GBps": round(bytes_moved / dt / 1e9, 2)}),
              flush=True)
    except Exception as e:  # pragma: no cover - experiment probe
        print(json.dumps({"metric": "pallas_prefetch_gather",
                          "error": repr(e)[:300]}), flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 21)
