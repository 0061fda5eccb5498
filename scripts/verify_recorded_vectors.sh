#!/usr/bin/env bash
# One-command bit-exactness proof against Intel's recorded keyswitch
# vectors (release v1.1 testdata.zip) — see tests/testdata/RECORDED_VECTORS.md.
# Requires network access; this build environment has none, so the proof
# completes on any networked host:
#
#   scripts/verify_recorded_vectors.sh [workdir]
set -euo pipefail

REPO="$(cd "$(dirname "$0")/.." && pwd)"
WORK="${1:-"$REPO/.recorded-vectors"}"
URL="https://github.com/intel/hexl-fpga/releases/download/v1.1/testdata.zip"

mkdir -p "$WORK"
cd "$WORK"
if [ ! -f testdata.zip ]; then
    echo "[1/4] downloading $URL"
    wget -q "$URL"
else
    echo "[1/4] testdata.zip already present"
fi
echo "[2/4] unzipping"
unzip -oq testdata.zip
DATA="$WORK/testdata"
[ -d "$DATA" ] || DATA="$WORK"  # zip may extract flat
ls "$DATA"/*.json >/dev/null || {
    echo "no *.json extracted under $DATA" >&2; exit 1; }

echo "[3/4] writing recorded_manifest.sha256 (commit to tests/testdata/)"
{
    sha256sum testdata.zip
    (cd "$DATA" && sha256sum ./*.json)
} > "$REPO/tests/testdata/recorded_manifest.sha256"

echo "[4/4] running the vector suite against the recorded data"
cd "$REPO"
KEYSWITCH_DATA_DIR="$DATA" N=16384,8192 \
    python -m pytest tests/test_keyswitch_vectors.py -q "$@"
echo
echo "golden tier passed; for the production TPU path add:"
echo "  HEXL_TPU_HEAVY_TESTS=1 KEYSWITCH_DATA_DIR=$DATA N=16384,8192 \\"
echo "      python -m pytest tests/test_keyswitch_vectors.py -q"
