"""DyadicMultiply throughput over an N / worksize sweep (reference
`benchmark/bench_dyadic_multiply.cpp`: coeff_count up to 16384/2, moduli up
to 14, worksize sweep)."""

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from common import emit, log, time_fn  # noqa: E402


def main():
    import jax.numpy as jnp
    import numpy as np

    from hexl_fpga_tpu.ops import dyadic_jax, golden, nt, word64 as w

    ws = int(os.environ.get("WORKSIZE", 64))
    n_moduli = int(os.environ.get("N_MODULI", 14))
    sweep = [int(x) for x in os.environ.get(
        "N_SWEEP", "1024,4096,8192,16384,32768").split(",")]
    for n in sweep:
        moduli = np.array(nt.generate_primes(n_moduli, 50, n), dtype=np.uint64)
        rng = np.random.default_rng(0)
        op1 = rng.integers(0, moduli.min(), size=(ws, 2, n_moduli, n),
                           dtype=np.uint64)
        op2 = rng.integers(0, moduli.min(), size=(ws, 2, n_moduli, n),
                           dtype=np.uint64)
        lens = np.zeros((ws, n_moduli), dtype=np.uint32)
        barrs = np.zeros((ws, n_moduli), dtype=np.uint64)
        for b in range(ws):
            lens[b], barrs[b] = dyadic_jax.moduli_meta(moduli)
        o1 = w.to_pair_np(op1)
        o2 = w.to_pair_np(op2)
        qp = w.to_pair_np(np.broadcast_to(moduli, (ws, n_moduli)).reshape(
            ws, n_moduli, 1).copy())
        bp = w.to_pair_np(barrs.reshape(ws, n_moduli, 1))
        args = tuple(jnp.asarray(x) for x in (
            o1[0], o1[1], o2[0], o2[1], qp[0], qp[1], bp[0], bp[1]))
        ln = jnp.asarray(lens.reshape(ws, n_moduli, 1))
        fn = dyadic_jax._dyadic_jit()
        out = fn(*args, ln)
        got = w.from_pair_np(np.asarray(out[0][:1]), np.asarray(out[1][:1]))
        want = golden.dyadic_multiply(
            op1[0].ravel(), op2[0].ravel(), n, moduli, n_moduli
        ).reshape(1, 3, n_moduli, n)
        np.testing.assert_array_equal(got, want)
        dt = time_fn(lambda *a: fn(*a, ln), *args,
                     iters=int(os.environ.get("ITERS", 10)))
        emit("dyadic_multiply_throughput", ws / dt, "op/s", n=n,
             n_moduli=n_moduli, worksize=ws, ms_per_batch=round(dt * 1e3, 3))
        log(f"n={n}: {ws/dt:.1f} op/s")


if __name__ == "__main__":
    main()
