#!/bin/bash
# Round-5 prioritized campaign: most valuable artifacts first, so a
# wall-clock cutoff still leaves the tracked metrics on disk.
set -x
cd "$(dirname "$0")/.."
OUT=${1:-results}
mkdir -p "$OUT"

# 1. tracked headline metric (BENCH + history)
timeout 2400 python bench.py 24 | tee "$OUT/bench_vmsm24_r5.txt"

# 2. prove tracked metric + setup cold/warm split at 2^20
timeout 3600 python scripts/sweep.py --out "$OUT/sweep_serial_r5.csv" zksnark 20
timeout 2400 python bench.py --prove 20 | tee "$OUT/bench_prove20_r5.txt"

# 3. G2 + fixed-base evidence
timeout 2400 python bench.py --g2 22 | tee "$OUT/bench_vmsm22_g2_r5.txt"
timeout 3600 python scripts/sweep.py --out "$OUT/sweep_serial_r5.csv" vmsm-g2 16 18 20
timeout 3600 python scripts/sweep.py --out "$OUT/sweep_serial_r5.csv" fmsm-g1 16 18 20
timeout 3600 python scripts/sweep.py --out "$OUT/sweep_serial_r5.csv" fmsm-g2 16 18

# 4. reference-CI configuration (1023 inputs, 2^20)
timeout 5400 python scripts/sweep.py --timeout 5200 --inputs 1023 --out "$OUT/sweep_serial_r5.csv" zksnark 20

# 5. MXU Montgomery experiment
timeout 1800 python scripts/mxu_experiment.py 20 | tee "$OUT/mxu_experiment_r5.txt"
timeout 1800 python scripts/gather_experiment.py 21 | tee "$OUT/gather_experiment_r5.txt"

# 6. scale: vmsm sweep fill + zksnark 2^22
timeout 3600 python scripts/sweep.py --out "$OUT/sweep_serial_r5.csv" vmsm-g1 16 18 20 22 24
timeout 3600 python scripts/sweep.py --out "$OUT/sweep_serial_r5.csv" fft 20 24
timeout 7200 python scripts/sweep.py --timeout 7000 --out "$OUT/sweep_serial_r5.csv" zksnark 22
