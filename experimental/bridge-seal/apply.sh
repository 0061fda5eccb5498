#!/usr/bin/env bash
# Apply the hexl-tpu bridge patch to a Microsoft SEAL v4.0.0 checkout and
# build it against this repository's accelerator library.
#
# Usage: ./apply.sh [path-to-SEAL-checkout]
#   (clones SEAL v4.0.0 into ./SEAL if no path is given; needs network)
#   ./apply.sh --check   validates the patch OFFLINE (no SEAL checkout):
#   hunk arithmetic, vendored original-side excerpts, and the intel::hexl::
#   API cross-check against cpp/include/hexl-fpga.h (see check.py).
set -euo pipefail

HERE="$(cd "$(dirname "$0")" && pwd)"
REPO_ROOT="$(cd "$HERE/../.." && pwd)"

if [ "${1:-}" = "--check" ]; then
  exec python3 "$HERE/check.py"
fi

SEAL_DIR="${1:-$HERE/SEAL}"

if [ ! -d "$SEAL_DIR" ]; then
  git clone --depth 1 --branch v4.0.0 https://github.com/microsoft/SEAL.git "$SEAL_DIR"
fi

# the accelerator library must be built first
if [ ! -f "$REPO_ROOT/cpp/build/libhexl_fpga_tpu.so" ]; then
  cmake -S "$REPO_ROOT/cpp" -B "$REPO_ROOT/cpp/build" -DCMAKE_BUILD_TYPE=Release
  cmake --build "$REPO_ROOT/cpp/build" -j
fi

cd "$SEAL_DIR"
git apply --3way "$HERE/patches/hexl-tpu-seal-4.0.0.patch" \
  || git apply "$HERE/patches/hexl-tpu-seal-4.0.0.patch"

cmake -S . -B build \
  -DSEAL_USE_HEXL_TPU=ON \
  -DHEXL_TPU_ROOT="$REPO_ROOT" \
  -DSEAL_BUILD_DEPS=ON \
  -DBUILD_SHARED_LIBS=OFF
cmake --build build -j

# build + run the end-to-end keyswitch example (square + rotate w/ precision
# check, the reference bridge's validation flow)
g++ -std=c++17 -O2 \
  -I "$SEAL_DIR/native/src" -I "$SEAL_DIR/build/native/src" \
  -I "$REPO_ROOT/cpp/include" \
  "$HERE/tests/keyswitch-example.cpp" \
  "$SEAL_DIR/build/lib/libseal-4.0.a" "$REPO_ROOT/cpp/build/libhexl_fpga_tpu.so" \
  -o "$HERE/tests/keyswitch-example"
LD_LIBRARY_PATH="$REPO_ROOT/cpp/build" "$HERE/tests/keyswitch-example"
