#!/bin/bash
# roi120 (like-for-like README geometry) configuration sweep on the real
# chip: tile_batch x {Pallas W-conv on/off}, steady-state only, each leg a
# fresh subprocess via bench.py --leg inference (HBM isolation).
#
# Usage: scripts/sweep_roi120.sh [SIZE]   (default 900)
# Writes one line per leg to stdout; run during a quiet chip window only
# (never beside a quality study).
set -u
cd "$(dirname "$0")/.."
SIZE=${1:-900}
TO=${SWEEP_LEG_TIMEOUT:-1800}
for B in 2 4 8; do
  for W in 1 0; do
    echo "=== B=$B wpallas=$W"
    NEUROCLEAR_PALLAS_WCONV=$W timeout "$TO" \
      python bench.py --leg inference --size "$SIZE" --tile-batch "$B" \
      --roi 120 --ov 15 --bc 10 2>&1 | tail -2
  done
done
