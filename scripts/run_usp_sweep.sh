#!/usr/bin/env bash
# USP degree sweep — the `scripts/run_qkvpack_compare.sh` analog.
# Defaults to the 8-device virtual CPU mesh (structure validation);
# on a real multi-chip slice just run without JAX_PLATFORMS tricks.
set -euo pipefail
cd "$(dirname "$0")/.."
SEQ=${SEQ:-4096}
HEADS=${HEADS:-8}
KV_HEADS=${KV_HEADS:-4}
python benchmarks/bench_usp.py --seq "$SEQ" --heads "$HEADS" \
  --kv-heads "$KV_HEADS" --bwd "$@"
