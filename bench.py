"""Benchmark driver: batched 16K-point forward negacyclic NTT throughput.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference FPGA design's per-compute-unit speed of light —
VEC=8 butterflies/cycle x 400 MHz = 3.2e9 butterflies/s; one 16K NTT =
(N/2)*log2(N) = 114,688 butterflies => 3.6e4 NTT/s per CU
(`device/config.sh:18-22`; BASELINE.md).  The reference publishes no
measured numbers, so this design ceiling is the comparison point.

Run on the real TPU chip; validates bit-exactness against the golden model
before timing.  Extra detail goes to stderr.
"""

import json
import os
import sys
import time

BASELINE_NTT_PER_SEC = 3.6e4  # reference CU upper bound (BASELINE.md)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from hexl_fpga_tpu.ops import golden, nt, ntt_mxu_pallas, word64 as w
    from hexl_fpga_tpu.utils.retry import call_with_retry

    n = 16384
    q = nt.generate_primes(1, 51, n)[0]
    B = int(os.environ.get("BENCH_BATCH", 4096))
    TP = int(os.environ.get("BENCH_TILE_P", 4))
    rng = np.random.default_rng(0)
    a = rng.integers(0, q, size=(B, n), dtype=np.uint64)

    log(f"devices: {jax.devices()}")
    log(f"bench: fwd NTT (fused MXU four-step) n={n} q={q} batch={B} tile_p={TP}")

    lo, hi = w.to_pair_np(a)
    lo, hi = jnp.asarray(lo), jnp.asarray(hi)

    def run_kernel(make_fn, label):
        fn = make_fn()
        t0 = time.time()
        out = call_with_retry(fn, lo, hi)
        jax.block_until_ready(out)
        log(f"[{label}] compile+first run: {time.time() - t0:.1f}s")
        got = w.from_pair_np(np.asarray(out[0][:4]), np.asarray(out[1][:4]))
        np.testing.assert_array_equal(got, golden.fwd_ntt(a[:4], q))
        log(f"[{label}] bit-exact vs golden: OK")
        iters = int(os.environ.get("BENCH_ITERS", 10))
        best = 1e18
        for _ in range(2):
            t0 = time.time()
            for _ in range(iters):
                out = fn(lo, hi)
            jax.block_until_ready(out)
            best = min(best, (time.time() - t0) / iters)
        return best

    # primary: fused MXU kernel; fallback: the VPU masked-roll kernel (in
    # case a toolchain change breaks Mosaic int8 matmuls on this platform)
    try:
        dt = run_kernel(
            lambda: ntt_mxu_pallas.fwd_ntt_fn(n, int(q), TP), "mxu"
        )
    except Exception as exc:  # pragma: no cover - fallback path
        log(f"MXU kernel failed ({type(exc).__name__}: {exc}); "
            "falling back to the VPU kernel")
        from hexl_fpga_tpu.ops import ntt_pallas

        dt = run_kernel(
            lambda: ntt_pallas.fwd_ntt_fn(n, int(q), 32), "vpu"
        )
    ntt_per_sec = B / dt
    log(f"{dt*1e3:.3f} ms/batch -> {ntt_per_sec:.0f} NTT/s")

    print(
        json.dumps(
            {
                "metric": "fwd_ntt_16384_throughput",
                "value": round(ntt_per_sec, 1),
                "unit": "NTT/s",
                "vs_baseline": round(ntt_per_sec / BASELINE_NTT_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
