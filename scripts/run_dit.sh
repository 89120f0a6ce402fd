#!/usr/bin/env bash
# Non-causal (DiT) sweep — the `scripts/run_dit.sh` analog.
set -euo pipefail
cd "$(dirname "$0")/.."
python benchmarks/bench_usp.py --seq "${SEQ:-4096}" --heads "${HEADS:-24}" \
  --kv-heads "${KV_HEADS:-24}" --head-dim "${HEAD_DIM:-128}" "$@"
