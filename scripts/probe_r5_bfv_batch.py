"""Probe: BEHZ BFV multiply throughput vs batch size (round 5).

The device BEHZ pipeline (ops/rns_behz_tpu.py) is 26 per-modulus NTT
dispatches whose row count scales with the batch (4B or 3B rows each).
The fused MXU NTT kernel's per-poly cost drops steeply with row count, so
the multiply should gain a lot of throughput from batching — this sweeps
B and prints op/s per point (dependent chains, same process).

Run: python scripts/probe_r5_bfv_batch.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax.numpy as jnp

from hexl_fpga_tpu.ops import nt, rns_behz, rns_behz_tpu, twiddles
from hexl_fpga_tpu.ops import word64 as w
from hexl_fpga_tpu.utils.timing import chain_timer

T0 = time.time()


def log(msg):
    print(f"[{time.time()-T0:7.1f}s] {msg}", flush=True)


def main():
    n, k, t = 16384, 6, 65537
    q = [int(p) for p in nt.generate_primes(k, 51, n)]
    tool = rns_behz.BehzTool(n, q, t)
    tabs = [twiddles.ntt_tables(n, qi) for qi in q]
    tpu = rns_behz_tpu.BehzTpu(tool, tabs)
    rng = np.random.default_rng(7)

    def rand_ct(B):
        return np.stack([
            np.stack([
                np.stack([rng.integers(0, qi, size=n, dtype=np.uint64)
                          for qi in q])
                for _ in range(2)
            ])
            for _ in range(B)
        ])

    for B in (1, 2, 4, 8, 16):
        c1, c2 = rand_ct(B), rand_ct(B)
        l1, h1 = w.to_pair_np(c1)
        l2, h2 = w.to_pair_np(c2)

        def step(a, b, c, d):
            olo, ohi = tpu._fn(a, b, c, d)
            return olo[:, 0:2], ohi[:, 0:2], olo[:, 1:3], ohi[:, 1:3]

        t0 = time.time()
        dt = chain_timer(
            step,
            (jnp.asarray(l1), jnp.asarray(h1),
             jnp.asarray(l2), jnp.asarray(h2)),
            i1=2, i2=6,
        )
        log(f"B={B:3d}: {B/dt:8.1f} op/s ({dt*1e3/B:6.2f} ms/op; "
            f"compile+measure {time.time()-t0:.0f}s)")


if __name__ == "__main__":
    main()
