#!/bin/bash
# Batch-size env matrix for the NTT suite (analog of the reference's
# tests/micro_fwd_ntt.sh:20-27 — rerun at BATCH_SIZE_NTT 1 and 8).
# The FPGA_DEBUG=2 pass prints the scheduler's stage/demux/overlap split
# for the worksize-batched streams (submit/finalize overlap coverage).
set -e
cd "$(dirname "$0")/.."
for batch in 1 8; do
    echo "=== BATCH_SIZE_NTT=$batch ==="
    BATCH_SIZE_NTT=$batch BATCH_SIZE_INTT=$batch \
        python -m pytest tests/test_api.py tests/test_ntt_jax.py -q "$@"
done
echo "=== BATCH_SIZE_NTT=8 FPGA_DEBUG=2 (overlap instrumentation) ==="
BATCH_SIZE_NTT=8 BATCH_SIZE_INTT=8 FPGA_DEBUG=2 \
    python -m pytest tests/test_api.py -q "$@"
