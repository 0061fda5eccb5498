#!/bin/bash
# CPU-vs-accelerator comparison grid (reference utils/perf-cmp.sh analog):
# native C++ runtime (RUN_CHOICE=0 tier) vs the TPU keyswitch over a
# batch grid.  Knobs: N, DECOMP, BATCHES, ITERS.
set -e
cd "$(dirname "$0")/.."
exec python benchmarks/perf_cmp.py "$@"
