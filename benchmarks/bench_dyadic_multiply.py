"""DyadicMultiply throughput over an N / worksize sweep (reference
`benchmark/bench_dyadic_multiply.cpp`: coeff_count up to 16384/2, moduli up
to 14, worksize sweep).  Production tier: the fused Pallas kernel
(ops/dyadic_pallas.py); timed as a dependent chain (two of the three output
polys feed the next call) so the dispatch overhead cancels."""

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from common import emit, log  # noqa: E402


def main():
    import numpy as np

    from hexl_fpga_tpu.ops import dyadic_pallas, golden, nt
    from hexl_fpga_tpu.utils.timing import chain_timer

    ws = int(os.environ.get("WORKSIZE", 16))
    n_moduli = int(os.environ.get("N_MODULI", 14))
    sweep = [int(x) for x in os.environ.get(
        "N_SWEEP", "1024,4096,8192,16384,32768").split(",")]
    for n in sweep:
        moduli = nt.generate_primes(n_moduli, 50, n)
        rng = np.random.default_rng(0)
        op1 = rng.integers(0, min(moduli), size=(ws, 2, n_moduli, n),
                           dtype=np.uint64)
        op2 = rng.integers(0, min(moduli), size=(ws, 2, n_moduli, n),
                           dtype=np.uint64)
        runner = dyadic_pallas.runner(tuple(int(q) for q in moduli), n)
        out, dev_args = runner.first_run(op1, op2)
        want = golden.dyadic_multiply(
            op1[0].ravel(), op2[0].ravel(), n, moduli, n_moduli
        ).reshape(3, n_moduli, n)
        np.testing.assert_array_equal(out[0], want)

        def step(l1, h1, l2, h2):
            olo, ohi = runner.device_call(l1, h1, l2, h2)
            return olo[:, 0:2], ohi[:, 0:2], olo[:, 1:3], ohi[:, 1:3]

        dt = chain_timer(step, tuple(dev_args))
        gbs = ws / dt * (2 * 2 + 3 * 2) * n_moduli * n * 4 / 1e9
        emit("dyadic_multiply_throughput", ws / dt, "op/s", n=n,
             n_moduli=n_moduli, worksize=ws, ms_per_batch=round(dt * 1e3, 3),
             effective_gb_per_s=round(gbs, 1))
        log(f"n={n}: {ws/dt:.1f} op/s ({gbs:.0f} GB/s effective)")


if __name__ == "__main__":
    main()
