"""CPU-vs-TPU comparison grid (reference `utils/perf-cmp.sh:45-60`: runs
bench_keyswitch at RUN_CHOICE=0 — Intel HEXL CPU — vs RUN_CHOICE=2 — FPGA —
over an iter x batch grid).  Here: the native C++ CPU runtime vs the TPU
keyswitch path."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from common import emit, log  # noqa: E402


def main():
    import numpy as np

    from hexl_fpga_tpu.cpp_bridge import NativeRuntime
    from hexl_fpga_tpu.ops import keyswitch_tpu
    from hexl_fpga_tpu.utils import vectors

    n = int(os.environ.get("N", 4096))
    L = int(os.environ.get("DECOMP", 2))
    K = L + 1
    batches = [int(x) for x in os.environ.get("BATCHES", "1,4").split(",")]
    vec = vectors.make_keyswitch_vector(n, L, K, seed=0, modulus_bits=51)

    rt = NativeRuntime()
    rt.acquire()
    try:
        for B in batches:
            # CPU (native C++ runtime, RUN_CHOICE=0 analog)
            t0 = time.time()
            iters = int(os.environ.get("ITERS", 3))
            for _ in range(iters):
                got = rt.keyswitch(
                    vec.input, vec.t_target_iter_ptr, n, L, K, L + 1, 2,
                    vec.moduli, vec.key_vectors, vec.modswitch_factors,
                    vec.twiddle_factors,
                )
            cpu_dt = (time.time() - t0) / iters
            np.testing.assert_array_equal(got, vec.expected_output)
            emit("keyswitch_cpu_native", 1.0 / cpu_dt, "op/s", n=n, decomp=L,
                 batch=1)

            # TPU: device-resident steady-state rate (dependent chain on
            # the result accumulator — the honest compute comparison; the
            # e2e number additionally pays this environment's network-tunnel
            # transfer + sync latency, which a PCIe/DMA-attached host would
            # not)
            import jax.numpy as jnp

            from hexl_fpga_tpu.ops import word64 as w
            from hexl_fpga_tpu.utils.timing import chain_timer

            ctx = keyswitch_tpu.get_context(
                n, L, K, L + 1, 2, vec.moduli, vec.twiddle_factors
            )
            ts = np.stack([vec.t_target_iter_ptr] * B)
            rs = np.stack([vec.input] * B)
            out = ctx.run_batch(rs, ts, vec.key_vectors, vec.modswitch_factors)
            np.testing.assert_array_equal(out[0], vec.expected_output)
            t0 = time.time()
            for _ in range(iters):
                out = ctx.run_batch(rs, ts, vec.key_vectors,
                                    vec.modswitch_factors)
            tpu_e2e_dt = (time.time() - t0) / iters

            t = w.to_pair_np(ts.reshape(B, L, n))
            r = w.to_pair_np(rs.reshape(B, 2, L, n))
            keys = [jnp.asarray(x) for x in ctx.device_keys(vec.key_vectors)]
            msf4 = jnp.asarray(ctx.prepare_msf4(vec.modswitch_factors))

            def step(tlo, thi, rlo, rhi):
                olo, ohi = ctx._build(tlo, thi, *keys, rlo, rhi, msf4)
                return olo[:, 0], ohi[:, 0], olo, ohi  # hoist-proof feedback

            tpu_dt = chain_timer(
                step,
                (jnp.asarray(t[0]), jnp.asarray(t[1]),
                 jnp.asarray(r[0]), jnp.asarray(r[1])),
                i1=2, i2=8,
            ) / B
            emit("keyswitch_tpu", 1.0 / tpu_dt, "op/s", n=n, decomp=L,
                 batch=B, speedup_vs_cpu=round(cpu_dt / tpu_dt, 2),
                 e2e_op_per_s=round(B / tpu_e2e_dt, 2))
            log(f"B={B}: cpu {1/cpu_dt:.2f} op/s, tpu device "
                f"{1/tpu_dt:.2f} op/s (e2e {B/tpu_e2e_dt:.2f})")
    finally:
        rt.release()


if __name__ == "__main__":
    main()
