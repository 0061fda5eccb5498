#!/bin/bash
# DyadicMultiply env matrix (analog of tests/micro_dyadic_multiply.sh).
set -e
cd "$(dirname "$0")/.."
for batch in 1 4; do
    echo "=== BATCH_SIZE_DYADIC_MULTIPLY=$batch ==="
    BATCH_SIZE_DYADIC_MULTIPLY=$batch \
        python -m pytest tests/test_api.py tests/test_mixed_workload.py -q "$@"
done
