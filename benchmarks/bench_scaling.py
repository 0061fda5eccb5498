"""Multi-chip scaling fixture: batch-sharded forward NTT over a device mesh
(the BASELINE.md scaling-efficiency metric: 1 chip / 1 host / N hosts).

On a multi-chip TPU slice this shards the batch over 'dp' with zero
collectives (linear scaling expected).  In this development environment only
ONE real chip is attached, so the multi-device path additionally validates
functionally on a virtual CPU mesh (the driver's dryrun_multichip does the
same for the keyswitch + distributed-NTT paths)."""

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from common import emit, log, time_fn  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    from hexl_fpga_tpu.ops import golden, nt, word64 as w
    from hexl_fpga_tpu.parallel import sharded

    n = int(os.environ.get("N", 16384))
    q = nt.generate_primes(1, 51, n)[0]
    devs = jax.devices()
    n_dev = len(devs)
    B = int(os.environ.get("BATCH_PER_CHIP", 256)) * n_dev
    log(f"devices: {n_dev} x {devs[0].platform}")

    rng = np.random.default_rng(0)
    a = rng.integers(0, q, size=(B, n), dtype=np.uint64)
    lo, hi = w.to_pair_np(a)

    from hexl_fpga_tpu.ops import ntt_mxu_pallas
    from hexl_fpga_tpu.utils.timing import chain_timer

    mesh = Mesh(np.array(devs), ("dp",))
    on_cpu = devs[0].platform == "cpu"
    if on_cpu:
        fn = sharded.batch_sharded_fwd_ntt(mesh, "dp", n, int(q))
        raw = None
    else:
        # the production tier: fused MXU Pallas kernel per shard
        fn = sharded.batch_sharded_fwd_ntt_mxu(mesh, "dp", n, int(q))
        raw = ntt_mxu_pallas.raw_fwd_call(n, int(q), 4)
    out = fn(jnp.asarray(lo), jnp.asarray(hi))
    got = w.from_pair_np(np.asarray(out[0][:2]), np.asarray(out[1][:2]))
    np.testing.assert_array_equal(got, golden.fwd_ntt(a[:2], q))
    log("bit-exact OK")
    if raw is not None:
        # dependent-chain slope (overhead-free steady state); the sharded
        # call is a per-shard kernel with zero collectives, so chaining the
        # local kernel measures the same per-chip rate
        dt = chain_timer(raw, (jnp.asarray(lo), jnp.asarray(hi)))
    else:
        dt = time_fn(fn, jnp.asarray(lo), jnp.asarray(hi),
                     iters=int(os.environ.get("ITERS", 20)))
    emit("fwd_ntt_sharded_throughput", B / dt, "NTT/s", n=n,
         devices=n_dev, batch=B, per_chip=round(B / dt / n_dev, 1),
         kernel="mxu" if not on_cpu else "xla")

    # MXU-tier coefficient-sharded (sequence-parallel) NTT: functional on
    # any mesh; throughput meaningful only with >= 2 real chips
    if n_dev >= 2 and n // 128 % n_dev == 0:
        sp_mesh = Mesh(np.array(devs), ("sp",))
        dfn = sharded.dist_fwd_ntt_mxu(sp_mesh, "sp", n, int(q))
        out = dfn(jnp.asarray(lo[:4]), jnp.asarray(hi[:4]))
        got = w.from_pair_np(np.asarray(out[0]), np.asarray(out[1]))
        np.testing.assert_array_equal(got, golden.fwd_ntt(a[:4], q))
        log(f"dist_fwd_ntt_mxu over {n_dev} shards: bit-exact OK")
        dt = time_fn(dfn, jnp.asarray(lo[:4]), jnp.asarray(hi[:4]),
                     iters=5)
        emit("dist_fwd_ntt_mxu_latency", dt * 1e3, "ms", n=n,
             shards=n_dev, batch=4)


if __name__ == "__main__":
    main()
