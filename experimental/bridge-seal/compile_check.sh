#!/usr/bin/env bash
# Offline compile gate for the SEAL bridge (VERDICT r3 #9): prove, without
# a SEAL checkout or network, that
#   (1) the patch's switch_key_inplace hook — its ADDED LINES extracted
#       from the patch bytes at check time, so the gate can never drift —
#       is valid C++ in a SEAL-4.0.0-shaped scope AND calls
#       intel::hexl::KeySwitch with argument types matching the REAL
#       shipped cpp/include/hexl-fpga.h;
#   (2) tests/keyswitch-example.cpp compiles against the SEAL 4.0.0
#       public-API shapes.
# Runs in CI next to apply.sh --check.
set -euo pipefail

HERE="$(cd "$(dirname "$0")" && pwd)"
REPO="$(cd "$HERE/../.." && pwd)"
PATCH="$HERE/patches/hexl-tpu-seal-4.0.0.patch"
TMP="$(mktemp -d)"
trap 'rm -rf "$TMP"' EXIT

# extract the hook hunk's added lines (the LAST hunk of the evaluator.cpp
# diff; hunk 1 is the file-top #include, which hook_harness.cpp provides)
awk '/^diff --git a\/native\/src\/seal\/evaluator.cpp/,0' "$PATCH" \
    | awk '/^@@/{n++} n>=2' \
    | grep '^+' | sed 's/^+//' > "$TMP/hook_body.inc"
[ -s "$TMP/hook_body.inc" ] || {
    echo "compile_check: no hook body extracted from $PATCH" >&2; exit 1; }
grep -q 'intel::hexl::KeySwitch' "$TMP/hook_body.inc" || {
    echo "compile_check: hook body missing the KeySwitch call" >&2; exit 1; }

echo "[1/2] hook fragment vs the real hexl-fpga.h ABI"
g++ -std=c++17 -fsyntax-only -Wall -Werror \
    -I "$REPO/cpp/include" -I "$HERE/stubs" -I "$TMP" \
    "$HERE/stubs/hook_harness.cpp"

echo "[2/2] keyswitch-example.cpp vs the SEAL 4.0.0 API shapes"
g++ -std=c++17 -fsyntax-only -Wall -Werror \
    -I "$HERE/stubs" \
    "$HERE/tests/keyswitch-example.cpp"

echo "bridge compile check: OK"
