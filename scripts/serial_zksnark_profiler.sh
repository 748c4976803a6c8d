#!/usr/bin/env bash
# Serial zkSNARK sweep (role of the reference's serialzkSNARKProfiler.sh:1-40
# spark-submit driver): prove at increasing sizes on the attached chip.
set -euo pipefail
cd "$(dirname "$0")/.."
SIZES="${SIZES:-10 12 14 16 18 20}"
exec python scripts/sweep.py "${APP:-zksnark}" $SIZES
