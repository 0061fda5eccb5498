"""Inverse-NTT throughput (reference `benchmark/bench_inv_ntt.cpp`):
N=16384, worksize batch, 52-bit prime, fused MXU kernel."""

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
    # arbitrary NTT-domain residues; bit-exactness checked on a slice vs the
    # golden inverse (full-worksize golden transforms are host-side minutes)
    y = rng.integers(0, q, size=(ws, n), dtype=np.uint64)
    lo, hi = w.to_pair_np(y)
    lo, hi = jnp.asarray(lo), jnp.asarray(hi)
    fn = ntt_mxu_pallas.inv_ntt_fn(n, int(q), tp)
    out = fn(lo, hi)
    back = w.from_pair_np(np.asarray(out[0][:2]), np.asarray(out[1][:2]))
    np.testing.assert_array_equal(back, golden.inv_ntt(y[:2], q))
    log("bit-exact OK")
    dt = chain_timer(ntt_mxu_pallas.raw_inv_call(n, int(q), tp), (lo, hi))
    emit("inv_ntt_throughput", ws / dt, "INTT/s", n=n, worksize=ws,
         ms_per_batch=round(dt * 1e3, 3))


if __name__ == "__main__":
    main()
