"""KeySwitch throughput at the reference's flagship config 16384_6_7_7_2
(`benchmark/bench_keyswitch.cpp:15-24,113-159`: N=16384, decomp=6,
key_modulus=7, rns=7, 2 components, ITER batches).

Reports both the device-resident rate (production analog: ciphertexts
produced/consumed by adjacent device ops) and the end-to-end rate including
host<->device transfer of the ciphertext (keys are upload-once-cached, as in
the reference's keys_map_)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from common import emit, log  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from hexl_fpga_tpu.ops import keyswitch_tpu, word64 as w
    from hexl_fpga_tpu.utils import vectors

    n = int(os.environ.get("N", 16384))
    L = int(os.environ.get("DECOMP", 6))
    K = int(os.environ.get("KEY_MODULUS", 7))
    B = int(os.environ.get("BATCH", 4))
    log(f"config {n}_{L}_{K}_{L+1}_2 batch={B}")
    t0 = time.time()
    vec = vectors.make_keyswitch_vector(n, L, K, seed=0, modulus_bits=51)
    log(f"vector gen {time.time()-t0:.0f}s")
    ctx = keyswitch_tpu.get_context(
        n, L, K, L + 1, 2, vec.moduli, vec.twiddle_factors
    )
    ts = np.stack([vec.t_target_iter_ptr] * B)
    rs = np.stack([vec.input] * B)
    t0 = time.time()
    out = ctx.run_batch(rs, ts, vec.key_vectors, vec.modswitch_factors)
    log(f"compile+first {time.time()-t0:.0f}s")
    np.testing.assert_array_equal(out[0], vec.expected_output)
    log("bit-exact OK")

    # end-to-end (host buffers in/out, keys cached on device)
    iters = int(os.environ.get("ITERS", 5))
    t0 = time.time()
    for _ in range(iters):
        out = ctx.run_batch(rs, ts, vec.key_vectors, vec.modswitch_factors)
    dt = (time.time() - t0) / iters
    emit("keyswitch_throughput_e2e", B / dt, "op/s",
         config=f"{n}_{L}_{K}_{L+1}_2", batch=B,
         ms_per_batch=round(dt * 1e3, 1))

    # device-resident: dependent chain on the result accumulator (slope
    # timing nets out the dispatch overhead; see utils/timing.py)
    from hexl_fpga_tpu.utils.timing import chain_timer

    t = w.to_pair_np(ts.reshape(B, L, n))
    r = w.to_pair_np(rs.reshape(B, 2, L, n))
    keys = [jnp.asarray(x) for x in ctx.device_keys(vec.key_vectors)]
    msf4 = jnp.asarray(ctx.prepare_msf4(vec.modswitch_factors))

    # output feeds back as BOTH next target and accumulator: hoist-proof
    def step(tlo, thi, rlo, rhi):
        olo, ohi = ctx._build(tlo, thi, *keys, rlo, rhi, msf4)
        return olo[:, 0], ohi[:, 0], olo, ohi

    dt = chain_timer(
        step,
        (jnp.asarray(t[0]), jnp.asarray(t[1]),
         jnp.asarray(r[0]), jnp.asarray(r[1])),
        i1=2, i2=8,
    )
    emit("keyswitch_throughput_device", B / dt, "op/s",
         config=f"{n}_{L}_{K}_{L+1}_2", batch=B,
         ms_per_batch=round(dt * 1e3, 1))


if __name__ == "__main__":
    main()
