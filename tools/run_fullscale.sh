#!/usr/bin/env bash
# Full-scale (60k images = 983k graph nodes) FashionMNIST-shaped spatial
# geodesic pipeline on the real TPU chip — the north-star wall-clock demo.
# Artifacts + timings land under experiments/fullscale-fashion.
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p experiments
exec python scripts/run_pipeline.py \
  --preset configs/fullscale-fashion \
  --timings-out experiments/fullscale-fashion-timings.json "$@"
