#!/usr/bin/env bash
# Long-context GQA kernel bench on the real chip — the `run_gqa.sh` analog
# (64 q-heads / 8 kv-heads at 128K in the reference; Llama-3 shapes here).
set -euo pipefail
cd "$(dirname "$0")/.."
python bench.py --seq "${SEQ:-131072}" --iters "${ITERS:-4}" "$@"
