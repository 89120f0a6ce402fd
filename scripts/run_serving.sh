#!/usr/bin/env bash
# Serving-side numbers: decode throughput by cache dtype + TTFT sweep.
set -euo pipefail
cd "$(dirname "$0")/.."
python benchmarks/bench_decode.py "$@"
python benchmarks/bench_decode.py --ttft
