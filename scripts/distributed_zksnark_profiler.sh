#!/usr/bin/env bash
# Distributed zkSNARK sweep (role of distributedzkSNARKProfiler.sh:1-37):
# same pipeline over an NDEV-device mesh (virtual CPU mesh when fewer
# real chips are attached — the reference's local[*] Spark analogue).
set -euo pipefail
cd "$(dirname "$0")/.."
NDEV="${NDEV:-8}"
SIZES="${SIZES:-10 12 14}"
exec python scripts/sweep.py --ndev "$NDEV" "${APP:-zksnark}" $SIZES
