#!/bin/bash
# KeySwitch env matrix (analog of tests/micro_keyswitch.sh:20-34 — N x batch
# sweep through the runtime).
set -e
cd "$(dirname "$0")/.."
for batch in 1 2; do
    echo "=== BATCH_SIZE_KEYSWITCH=$batch ==="
    BATCH_SIZE_KEYSWITCH=$batch \
        python -m pytest tests/test_keyswitch_tpu.py tests/test_mixed_workload.py -q "$@"
done
