#!/usr/bin/env python3
"""Offline structural verification of the SEAL bridge patch (`apply.sh
--check`).

The reference project proves its bridge patch by applying it to a real SEAL
4.0.0 checkout in CI (`/root/reference/experimental/bridge-seal/README.md`);
this environment has no network, so patch rot must be detectable WITHOUT a
SEAL checkout.  Three checks:

1. **Hunk arithmetic** — every `@@ -a,b +c,d @@` header's counts must match
   the hunk body (context/removed/added line tally).  Catches hand-edited
   hunks that `git apply` would reject.
2. **Vendored original excerpts** — `patches/excerpts/` records, for each
   hunk, the ORIGINAL-side lines (context + removals) as they stood in SEAL
   v4.0.0 when the patch was authored.  The check reconstructs the
   original side from the patch and diffs it against the recording — an
   edit to the patch that silently changes what SEAL content it expects
   fails here unless the excerpts are deliberately re-recorded.
3. **API cross-check** — every `intel::hexl::` function the patch's ADDED
   lines call must exist in this repository's public header
   (`cpp/include/hexl-fpga.h`).  Catches bridge/library signature drift,
   the rot mode that breaks the build even when the patch applies.
"""

from __future__ import annotations

import os
import re
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
PATCH = os.path.join(HERE, "patches", "hexl-tpu-seal-4.0.0.patch")
EXCERPTS = os.path.join(HERE, "patches", "excerpts")
HEADER = os.path.join(HERE, "..", "..", "cpp", "include", "hexl-fpga.h")

HUNK_RE = re.compile(r"^@@ -(\d+)(?:,(\d+))? \+(\d+)(?:,(\d+))? @@")


def parse_patch(path):
    """-> list of (target_file, hunk_header, old_count, new_count, lines)."""
    hunks = []
    target = None
    cur = None
    with open(path) as f:
        for raw in f:
            line = raw.rstrip("\n")
            if line.startswith("+++ "):
                target = line[4:]
                target = target.removeprefix("b/")
                continue
            m = HUNK_RE.match(line)
            if m:
                cur = {
                    "file": target,
                    "header": line,
                    "old_n": int(m.group(2) or 1),
                    "new_n": int(m.group(4) or 1),
                    "lines": [],
                }
                hunks.append(cur)
                continue
            if cur is not None and line[:1] in (" ", "+", "-", ""):
                if line.startswith("--- "):
                    cur = None
                    continue
                cur["lines"].append(line)
    return hunks


def check_hunk_arith(hunks):
    errs = []
    for i, h in enumerate(hunks):
        old = sum(1 for ln in h["lines"] if ln[:1] in (" ", "-", ""))
        new = sum(1 for ln in h["lines"] if ln[:1] in (" ", "+", ""))
        if old != h["old_n"] or new != h["new_n"]:
            errs.append(
                f"hunk {i} ({h['file']} {h['header']}): counts "
                f"{old}/{new} != header {h['old_n']}/{h['new_n']}"
            )
    return errs


def original_side(h):
    return [
        ln[1:] if ln else ""
        for ln in h["lines"]
        if ln[:1] in (" ", "-", "")
    ]


def check_excerpts(hunks, record=False):
    errs = []
    os.makedirs(EXCERPTS, exist_ok=True)
    for i, h in enumerate(hunks):
        name = f"{h['file'].replace('/', '__')}.hunk{i}.orig"
        path = os.path.join(EXCERPTS, name)
        got = "\n".join(original_side(h)) + "\n"
        if record:
            with open(path, "w") as f:
                f.write(got)
            continue
        if not os.path.exists(path):
            errs.append(f"missing vendored excerpt {name}")
            continue
        want = open(path).read()
        if got != want:
            errs.append(
                f"hunk {i} ({h['file']}): original-side lines no longer "
                f"match vendored excerpt {name} — patch edited without "
                "re-recording (run check.py --record if intentional)"
            )
    return errs


def check_api(hunks):
    errs = []
    header = open(HEADER).read()
    called = set()
    for h in hunks:
        for ln in h["lines"]:
            if not ln.startswith("+"):
                continue
            for m in re.finditer(r"intel::hexl::(\w+)\s*\(", ln):
                called.add(m.group(1))
    for fn in sorted(called):
        if not re.search(rf"\b{fn}\s*\(", header):
            errs.append(
                f"patch calls intel::hexl::{fn}(...) but cpp/include/"
                "hexl-fpga.h declares no such function"
            )
    if not called:
        errs.append("patch's added lines call no intel::hexl:: API — "
                    "bridge would be a no-op")
    return errs


def main(argv):
    record = "--record" in argv
    hunks = parse_patch(PATCH)
    if not hunks:
        print("check.py: no hunks parsed from patch", file=sys.stderr)
        return 1
    errs = check_hunk_arith(hunks)
    errs += check_excerpts(hunks, record=record)
    if not record:
        errs += check_api(hunks)
    for e in errs:
        print(f"check.py: FAIL: {e}", file=sys.stderr)
    if not errs:
        mode = "recorded" if record else "verified"
        print(
            f"check.py: {mode} {len(hunks)} hunks across "
            f"{len({h['file'] for h in hunks})} files; API cross-check OK"
        )
    return 1 if errs else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
