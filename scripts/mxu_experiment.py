"""MXU Montgomery-multiplication experiment (VERDICT r4 #1).

Measures, on the current backend:
  1. raw VPU elementwise throughput: u32 multiply, u32 add, f32 multiply
     on [16, n] tensors (grounds the "compute-bound in CIOS limb
     multiplies" claim with numbers);
  2. raw MXU throughput of the [64, 32] x [32, n] bf16 Toeplitz matmul
     the REDC offload uses;
  3. end-to-end mont_mul: fields/fp.py CIOS (VPU) vs
     ops/mxu_mont.py SOS + MXU-REDC, bit-exactness cross-checked.

Usage: python scripts/mxu_experiment.py [log2_n]   (default 2^20)
Prints one JSON line per measurement.  Findings land in STATUS.md.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _bench(fn, *args, iters=20):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])  # host fetch
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    return (time.perf_counter() - t0) / iters


def main(log2n: int = 20):
    import jax
    import jax.numpy as jnp

    from octopuszk_tpu.fields import fp
    from octopuszk_tpu.fields.spec import FR, NUM_LIMBS
    from octopuszk_tpu.ops import mxu_mont
    from octopuszk_tpu.utils.bigint import ints_to_limbs, limbs_to_ints

    n = 1 << log2n
    rng = np.random.default_rng(7)
    a_np = rng.integers(0, 1 << 16, size=(16, n), dtype=np.uint32)
    b_np = rng.integers(0, 1 << 16, size=(16, n), dtype=np.uint32)
    a_np[15] &= 0x3FFF
    b_np[15] &= 0x3FFF
    a, b = jnp.asarray(a_np), jnp.asarray(b_np)
    results = []

    def rec(name, seconds, work, unit):
        r = {"metric": name, "seconds": round(seconds, 6),
             "rate": round(work / seconds / 1e9, 2), "unit": unit}
        results.append(r)
        print(json.dumps(r), flush=True)

    # --- raw elementwise ops (8 chained ops per launch to swamp overhead)
    @jax.jit
    def mul_u32(x, y):
        for _ in range(8):
            x = x * y
        return x

    @jax.jit
    def add_u32(x, y):
        for _ in range(8):
            x = x + y
        return x

    af, bf = a.astype(jnp.float32), b.astype(jnp.float32)

    @jax.jit
    def mul_f32(x, y):
        for _ in range(8):
            x = x * y
        return x

    rec("u32_mul", _bench(mul_u32, a, b) / 8, 16 * n, "Gop/s")
    rec("u32_add", _bench(add_u32, a, b) / 8, 16 * n, "Gop/s")
    rec("f32_mul", _bench(mul_f32, af, bf) / 8, 16 * n, "Gop/s")

    # --- MXU Toeplitz matmul (the REDC offload shape)
    np8, p8 = mxu_mont._redc_mats(FR)
    x8 = mxu_mont._split8(a)

    @jax.jit
    def redc_mm(m, x):
        return mxu_mont._matmul(m, x)

    dt = _bench(redc_mm, p8, x8)
    rec("mxu_toeplitz_64x32", dt, 64 * 32 * n, "Gmac/s")

    # --- end-to-end mont_mul paths
    cios = jax.jit(lambda x, y: fp.mont_mul(FR, x, y))
    sos = jax.jit(lambda x, y: mxu_mont.mont_mul_sos_mxu(FR, x, y))
    got_c = np.asarray(cios(a, b))
    got_s = np.asarray(sos(a, b))
    assert (got_c == got_s).all(), "SOS-MXU mismatch vs CIOS"
    dt_c = _bench(cios, a, b)
    dt_s = _bench(sos, a, b)
    rec("mont_mul_cios", dt_c, n, "Gelem/s")
    rec("mont_mul_sos_mxu", dt_s, n, "Gelem/s")
    print(json.dumps({
        "metric": "sos_mxu_speedup_vs_cios",
        "value": round(dt_c / dt_s, 3),
        "backend": jax.default_backend(),
        "n": n}), flush=True)
    return results


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 20)
