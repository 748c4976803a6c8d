"""Headline benchmark: variable-base G1 MSM throughput (points/s/chip).

Reference analogue: the `vmsm-g1` profiler app
(profiler/profiling/VariableBaseMSMProfiling.java:19-47) driving the CUDA
Pippenger (algebra_msm_VariableBaseMSM.cu:1246-1431).  Prints ONE JSON
line.  ``vs_baseline`` is measured against 1e6 points/s — a conservative
estimate for the reference's CGBN Pippenger on its sm_86 target (no
concrete number is published; see BASELINE.md).

The MSM runs the large-scale packed path (ops/msm.py): signed windowed
digits, packed-row affine gathers, fused Pallas mixed-add scans, chunked
to bound transient HBM.  The base is packed once up front — the CRS
at-rest layout a prover would hold.

Usage: python bench.py [log2_size] [--prove]
  default: variable-base G1 MSM at 2^24 (the BASELINE.md tracked size)
  --prove: end-to-end Groth16 prove wall time at 2^log2_size constraints
"""

import json
import sys
import time

import numpy as np

BASELINE_POINTS_PER_S = 1.0e6


def rand_scalars(n, bits=253, seed=0):
    import jax.numpy as jnp
    rng = np.random.default_rng(seed)
    limbs = rng.integers(0, 1 << 16, size=(16, n), dtype=np.uint32)
    limbs[15] &= (1 << (bits - 240)) - 1  # keep < 2^bits
    return jnp.asarray(limbs)


def gen_packed_points(g1, log2n: int, seed: int = 1, chunk_log2: int = 22):
    """n pseudo-random points as packed affine rows, built on device in
    2^chunk_log2-point chunks: [k_i]G via fixed-base MSM, then pack."""
    import jax
    import jax.numpy as jnp
    from octopuszk_tpu.ops import msm

    n = 1 << log2n
    gen = g1.point_to_device(g1.generator_affine)
    chunk = min(n, 1 << chunk_log2)
    packs = []
    for i in range(n // chunk):
        pts = msm.fixed_base_msm(g1, gen, rand_scalars(chunk, seed=seed + i))
        packs.append(msm.points_to_packed(g1, pts, pad_to=chunk))
        del pts
    packed = jnp.concatenate(packs, axis=0) if len(packs) > 1 else packs[0]
    jax.block_until_ready(packed)
    return packed


def bench_vmsm(log2n: int, which: str = "g1"):
    from octopuszk_tpu.curves import bn254
    from octopuszk_tpu.ops import msm

    n = 1 << log2n
    grp = bn254.G1 if which == "g1" else bn254.G2
    # G2 packed rows are 2x G1 (Fp2 coords); 2^22 G2 plus the generation
    # working set exhausts a 16 GB chip (measured RESOURCE_EXHAUSTED), so
    # generate in smaller chunks for G2.
    packed = gen_packed_points(grp, log2n,
                               chunk_log2=20 if which == "g2" else 22)
    scalars = rand_scalars(n, seed=101)
    np.asarray(scalars[0])  # materialize

    def run():
        r = msm.pippenger_msm_packed(grp, packed, scalars)
        np.asarray(r[0] if not isinstance(r[0], tuple) else r[0][0])
        return r

    run()  # warmup/compile
    iters = 3 if log2n <= 20 else 2
    t0 = time.perf_counter()
    for _ in range(iters):
        run()
    dt = (time.perf_counter() - t0) / iters
    pps = n / dt
    return {
        "metric": f"vmsm_{which}_points_per_s_2^{log2n}",
        "value": round(pps, 1),
        "unit": "points/s/chip",
        "vs_baseline": round(pps / BASELINE_POINTS_PER_S, 3),
    }


def bench_prove(log2c: int):
    """Secondary: end-to-end Groth16 prove wall time at 2^log2c
    constraints (the reference CI scale, SerialzkSNARKTest.java:141-150)."""
    from octopuszk_tpu.models.groth16 import prover, setup
    from octopuszk_tpu.relations import construct

    nc = (1 << log2c) - 3
    r1cs, primary, aux = construct.serial_construct(nc, 3, seed=5)
    crs = setup.setup(r1cs, seed=6)
    prover.prove(crs.proving_key, primary, aux, seed=7)  # warmup/compile
    t0 = time.perf_counter()
    prover.prove(crs.proving_key, primary, aux, seed=8)
    dt = time.perf_counter() - t0
    return {
        "metric": f"groth16_prove_s_2^{log2c}",
        "value": round(dt, 3),
        "unit": "s",
        "vs_baseline": 0.0,
    }


def _record(result):
    """Append to results/bench_history.csv so every bench run leaves a
    checked-in artifact (VERDICT r4: perf claims must live in artifacts,
    not round notes)."""
    import csv
    import datetime
    import os
    here = os.path.dirname(os.path.abspath(__file__))
    path = os.path.join(here, "results", "bench_history.csv")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    new = not os.path.exists(path)
    with open(path, "a", newline="") as f:
        w = csv.writer(f)
        if new:
            w.writerow(["utc", "metric", "value", "unit", "vs_baseline"])
        w.writerow([datetime.datetime.now(datetime.timezone.utc).isoformat(
            timespec="seconds"), result["metric"], result["value"],
            result["unit"], result.get("vs_baseline", "")])
    return result


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    if "--prove" in sys.argv:
        out = bench_prove(int(args[0]) if args else 20)
    elif "--g2" in sys.argv:
        out = bench_vmsm(int(args[0]) if args else 22, "g2")
    else:
        out = bench_vmsm(int(args[0]) if args else 24)
    print(json.dumps(_record(out)))
