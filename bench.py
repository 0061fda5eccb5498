"""Benchmark driver: the library's headline ops on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extras"}.
The primary metric is batched 16K-point forward negacyclic NTT throughput;
"extras" carries the flagship KeySwitch (16384_6_7_7_2, the reference's
benchmark config — `benchmark/bench_keyswitch.cpp:15-24,113-159`) and
DyadicMultiply rates, each validated bit-exact before timing.

Baseline: the reference FPGA design's per-compute-unit speed of light —
VEC=8 butterflies/cycle x 400 MHz = 3.2e9 butterflies/s; one 16K NTT =
(N/2)*log2(N) = 114,688 butterflies => 3.6e4 NTT/s per CU
(`device/config.sh:18-22`; BASELINE.md).  The reference publishes no
measured numbers, so this design ceiling is the comparison point.

Run on the real TPU chip; extra detail goes to stderr.  Set BENCH_NTT_ONLY=1
to skip the extras (fast smoke run).
"""

import json
import os
import sys
import time

BASELINE_NTT_PER_SEC = 3.6e4  # reference CU upper bound (BASELINE.md)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench_ntt():
    import jax
    import numpy as np
    import jax.numpy as jnp

    from hexl_fpga_tpu.ops import golden, nt, ntt_mxu_pallas, word64 as w
    from hexl_fpga_tpu.utils.retry import call_with_retry
    from hexl_fpga_tpu.utils.timing import chain_timer

    n = 16384
    q = nt.generate_primes(1, 51, n)[0]
    B = int(os.environ.get("BENCH_BATCH", 2048))
    TP = int(os.environ.get("BENCH_TILE_P", 4))
    rng = np.random.default_rng(0)
    a = rng.integers(0, q, size=(B, n), dtype=np.uint64)

    log(f"devices: {jax.devices()}")
    log(f"bench: fwd NTT (fused MXU four-step) n={n} q={q} batch={B} tile_p={TP}")

    lo, hi = w.to_pair_np(a)
    lo, hi = jnp.asarray(lo), jnp.asarray(hi)

    def run_kernel(raw_call, jit_fn, label):
        t0 = time.time()
        out = call_with_retry(jit_fn, lo, hi)
        jax.block_until_ready(out)
        log(f"[{label}] compile+first run: {time.time() - t0:.1f}s")
        got = w.from_pair_np(np.asarray(out[0][:4]), np.asarray(out[1][:4]))
        np.testing.assert_array_equal(got, golden.fwd_ntt(a[:4], q))
        log(f"[{label}] bit-exact vs golden: OK")
        # dependent-chain slope: overhead-free steady-state rate (the
        # canonical output re-enters the kernel as a valid input)
        return chain_timer(raw_call, (lo, hi))

    # primary: fused MXU kernel; fallback: the VPU masked-roll kernel (in
    # case a toolchain change breaks Mosaic int8 matmuls on this platform)
    try:
        dt = run_kernel(
            ntt_mxu_pallas.raw_fwd_call(n, int(q), TP),
            ntt_mxu_pallas.fwd_ntt_fn(n, int(q), TP), "mxu",
        )
    except Exception as exc:  # pragma: no cover - fallback path
        log(f"MXU kernel failed ({type(exc).__name__}: {exc}); "
            "falling back to the VPU kernel")
        from hexl_fpga_tpu.ops import ntt_pallas

        dt = run_kernel(
            ntt_pallas.raw_fwd_call(n, int(q), 32),
            ntt_pallas.fwd_ntt_fn(n, int(q), 32), "vpu",
        )
    ntt_per_sec = B / dt
    log(f"{dt*1e3:.3f} ms/batch -> {ntt_per_sec:.0f} NTT/s")
    return ntt_per_sec


def bench_keyswitch():
    """Flagship op at the reference's 16384_6_7_7_2 benchmark config;
    bit-exact vs the golden model, then timed device-resident AND
    end-to-end (host buffers in/out, keys upload-once-cached)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from hexl_fpga_tpu.ops import keyswitch_tpu, word64 as w
    from hexl_fpga_tpu.utils import vectors
    from hexl_fpga_tpu.utils.retry import call_with_retry

    n, L, K = 16384, 6, 7
    B = int(os.environ.get("BENCH_KS_BATCH", 32))
    t0 = time.time()
    frozen = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "tests", "testdata", "16384_6_7_7_2_0.json.gz",
    )
    if os.path.exists(frozen):
        # the committed frozen vector: oracle is independent of the
        # generator's current behavior
        vec = vectors.load_json(frozen)
        log(f"[keyswitch] frozen vector load {time.time()-t0:.1f}s")
    else:
        vec = vectors.make_keyswitch_vector(n, L, K, seed=0, modulus_bits=51)
        log(f"[keyswitch] vector gen {time.time()-t0:.1f}s")
    ctx = keyswitch_tpu.get_context(
        n, L, K, L + 1, 2, vec.moduli, vec.twiddle_factors
    )
    ts = np.stack([vec.t_target_iter_ptr] * B)
    rs = np.stack([vec.input] * B)
    t0 = time.time()
    out = call_with_retry(
        ctx.run_batch, rs, ts, vec.key_vectors, vec.modswitch_factors
    )
    log(f"[keyswitch] compile+first run: {time.time()-t0:.1f}s")
    np.testing.assert_array_equal(out[0], vec.expected_output)
    np.testing.assert_array_equal(out[B - 1], vec.expected_output)
    log("[keyswitch] bit-exact vs golden: OK")

    iters = int(os.environ.get("BENCH_KS_ITERS", 5))
    t0 = time.time()
    for _ in range(iters):
        out = ctx.run_batch(rs, ts, vec.key_vectors, vec.modswitch_factors)
    e2e = B / ((time.time() - t0) / iters)

    # device-resident steady-state rate: dependent chain feeding the output
    # ciphertext back as BOTH the next target and accumulator, so no part of
    # the body is loop-invariant (XLA's while-loop invariant code motion
    # would otherwise hoist the transform core out of the timing loop and
    # fake the rate), timed by slope to cancel the host dispatch overhead.
    from hexl_fpga_tpu.utils.timing import chain_timer

    t = w.to_pair_np(ts.reshape(B, L, n))
    r = w.to_pair_np(rs.reshape(B, 2, L, n))
    keys = [jnp.asarray(x) for x in ctx.device_keys(vec.key_vectors)]
    mlo, mhi = ctx.prepare_msf(vec.modswitch_factors)
    mlo, mhi = jnp.asarray(mlo), jnp.asarray(mhi)

    def step(tlo, thi, rlo, rhi):
        olo, ohi = ctx._build(tlo, thi, *keys, rlo, rhi, mlo, mhi)
        return olo[:, 0], ohi[:, 0], olo, ohi

    dt = chain_timer(
        step,
        (jnp.asarray(t[0]), jnp.asarray(t[1]),
         jnp.asarray(r[0]), jnp.asarray(r[1])),
        i1=2, i2=8,
    )
    dev = B / dt
    log(f"[keyswitch] device {dev:.0f} op/s, e2e {e2e:.0f} op/s (batch {B})")
    return dev, e2e


def bench_dyadic():
    """DyadicMultiply at the reference bench shape (N=16384, 14 moduli,
    `benchmark/bench_dyadic_multiply.cpp`); bit-exact, then device rate."""
    import jax
    import numpy as np

    from hexl_fpga_tpu.ops import dyadic_pallas, golden, nt
    from hexl_fpga_tpu.utils.retry import call_with_retry

    n, M = 16384, 14
    B = int(os.environ.get("BENCH_DY_BATCH", 16))
    moduli = nt.generate_primes(M, 51, n)
    rng = np.random.default_rng(1)
    op1 = rng.integers(0, 2**52, size=(B, 2, M, n), dtype=np.uint64)
    op2 = rng.integers(0, 2**52, size=(B, 2, M, n), dtype=np.uint64)
    for m, q in enumerate(moduli):  # canonical operands
        op1[:, :, m, :] %= np.uint64(q)
        op2[:, :, m, :] %= np.uint64(q)

    runner = dyadic_pallas.runner(tuple(int(q) for q in moduli), n)
    t0 = time.time()
    out, dev_args = call_with_retry(runner.first_run, op1, op2)
    log(f"[dyadic] compile+first run: {time.time()-t0:.1f}s")
    want = golden.dyadic_multiply(
        op1[0].ravel(), op2[0].ravel(), n, moduli, M
    ).reshape(3, M, n)
    np.testing.assert_array_equal(out[0], want)
    log("[dyadic] bit-exact vs golden: OK")

    # dependent chain: two of the three output polys feed the next call's
    # operands, so successive iterations cannot overlap or be elided
    from hexl_fpga_tpu.utils.timing import chain_timer

    def step(l1, h1, l2, h2):
        olo, ohi = runner.device_call(l1, h1, l2, h2)
        return olo[:, 0:2], ohi[:, 0:2], olo[:, 1:3], ohi[:, 1:3]

    dt = chain_timer(step, tuple(dev_args))
    rate = B / dt
    # effective HBM traffic: 4 input + 6 output u32 planes of (2|3, M, n)
    bytes_per_op = (2 * 2 + 3 * 2) * M * n * 4
    gbs = rate * bytes_per_op / 1e9
    log(f"[dyadic] {rate:.0f} op/s = {gbs:.0f} GB/s effective (batch {B})")
    return rate, gbs


def main():
    extras = {}
    ntt_per_sec = bench_ntt()
    if os.environ.get("BENCH_NTT_ONLY") != "1":
        try:
            ks_dev, ks_e2e = bench_keyswitch()
            extras["keyswitch_16384_6_7_7_2_device_op_per_s"] = round(ks_dev, 1)
            extras["keyswitch_16384_6_7_7_2_e2e_op_per_s"] = round(ks_e2e, 1)
        except Exception as exc:  # pragma: no cover
            log(f"keyswitch bench failed: {type(exc).__name__}: {exc}")
        try:
            dy_rate, dy_gbs = bench_dyadic()
            extras["dyadic_16384x14_op_per_s"] = round(dy_rate, 1)
            extras["dyadic_effective_gb_per_s"] = round(dy_gbs, 1)
        except Exception as exc:  # pragma: no cover
            log(f"dyadic bench failed: {type(exc).__name__}: {exc}")

    print(
        json.dumps(
            {
                "metric": "fwd_ntt_16384_throughput",
                "value": round(ntt_per_sec, 1),
                "unit": "NTT/s",
                "vs_baseline": round(ntt_per_sec / BASELINE_NTT_PER_SEC, 3),
                "extras": extras,
            }
        )
    )


if __name__ == "__main__":
    main()
