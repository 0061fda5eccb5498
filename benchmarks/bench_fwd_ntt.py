"""Forward-NTT throughput (reference fixture `fpga_ntt_p16384_ws4096`,
`/root/reference/benchmark/bench_fwd_ntt.cpp:54-61`): N=16384, a worksize of
batched transforms, 52-bit prime.  Validates bit-exactness, then times the
device-resident fused MXU kernel."""

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from common import emit, log  # noqa: E402


def main():
    import jax.numpy as jnp
    import numpy as np

    from hexl_fpga_tpu.ops import golden, nt, ntt_mxu_pallas, word64 as w
    from hexl_fpga_tpu.utils.timing import chain_timer

    n = int(os.environ.get("N", 16384))
    ws = int(os.environ.get("WORKSIZE", 4096))
    tp = int(os.environ.get("TILE_P", 4))
    q = nt.generate_primes(1, 51, n)[0]
    rng = np.random.default_rng(0)
    a = rng.integers(0, q, size=(ws, n), dtype=np.uint64)
    lo, hi = w.to_pair_np(a)
    lo, hi = jnp.asarray(lo), jnp.asarray(hi)
    fn = ntt_mxu_pallas.fwd_ntt_fn(n, int(q), tp)
    out = fn(lo, hi)
    got = w.from_pair_np(np.asarray(out[0][:2]), np.asarray(out[1][:2]))
    np.testing.assert_array_equal(got, golden.fwd_ntt(a[:2], q))
    log("bit-exact OK")
    # dependent-chain slope: steady-state rate net of dispatch overhead
    dt = chain_timer(ntt_mxu_pallas.raw_fwd_call(n, int(q), tp), (lo, hi))
    emit("fwd_ntt_throughput", ws / dt, "NTT/s", n=n, worksize=ws,
         ms_per_batch=round(dt * 1e3, 3))


if __name__ == "__main__":
    main()
