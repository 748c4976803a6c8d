#!/bin/bash
# Round-5 measurement campaign (single TPU chip).  Run top-to-bottom once
# the chip is reachable; every row lands in results/ as a checked-in
# artifact (VERDICT r4: perf claims must live in artifacts).
#
#   bash scripts/run_r5_sweeps.sh [results-dir]
set -x
cd "$(dirname "$0")/.."
OUT=${1:-results}
mkdir -p "$OUT"

# 0. MXU Montgomery experiment (microbenchmarks + SOS-vs-CIOS)
timeout 1800 python scripts/mxu_experiment.py 20 | tee "$OUT/mxu_experiment_r5.txt"
timeout 1800 python scripts/gather_experiment.py 21 | tee "$OUT/gather_experiment_r5.txt"

# 1. MSM sweeps: G1 + G2 variable-base, G1 + G2 fixed-base
timeout 7200 python scripts/sweep.py --out "$OUT/sweep_serial_r5.csv" vmsm-g1 16 18 20 22 24
timeout 7200 python scripts/sweep.py --out "$OUT/sweep_serial_r5.csv" vmsm-g2 16 18 20 22
timeout 7200 python scripts/sweep.py --out "$OUT/sweep_serial_r5.csv" fmsm-g1 16 18 20 22
timeout 7200 python scripts/sweep.py --out "$OUT/sweep_serial_r5.csv" fmsm-g2 16 18 20

# 2. NTT sanity re-run
timeout 3600 python scripts/sweep.py --out "$OUT/sweep_serial_r5.csv" fft 20 24

# 3. end-to-end zksnark: cold+warm setup split, through 2^22
timeout 7200 python scripts/sweep.py --out "$OUT/sweep_serial_r5.csv" zksnark 12 16 20
timeout 7200 python scripts/sweep.py --timeout 5400 --out "$OUT/sweep_serial_r5.csv" zksnark 22

# 4. the reference-CI configuration (SerialzkSNARKTest.java:141-150)
timeout 7200 python scripts/sweep.py --timeout 5400 --inputs 1023 --out "$OUT/sweep_serial_r5.csv" zksnark 20

# 5. bench lines (also append to results/bench_history.csv)
timeout 3600 python bench.py 24
timeout 3600 python bench.py --g2 22
timeout 3600 python bench.py --prove 20
