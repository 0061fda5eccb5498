"""Round-4 verification probe: deferred-automorphism hoisting + keyed chain
on the REAL TPU at the flagship config (16384_6_7_7_2).

Drives the library surface (not tests): bit-exactness of the three changed
paths, then chain-timer rates for full vs hoisted vs keyed-chain keyswitch.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from hexl_fpga_tpu.integrations.ckks import _ntt_galois_sigma
    from hexl_fpga_tpu.ops import keyswitch_tpu, word64 as w
    from hexl_fpga_tpu.utils import vectors
    from hexl_fpga_tpu.utils.retry import call_with_retry
    from hexl_fpga_tpu.utils.timing import chain_timer

    n, L, K = 16384, 6, 7
    B = int(os.environ.get("BATCH", 32))
    log(f"devices: {jax.devices()}")
    frozen = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "testdata", "16384_6_7_7_2_0.json.gz",
    )
    vec = vectors.load_json(frozen)
    ctx = keyswitch_tpu.get_context(
        n, L, K, L + 1, 2, vec.moduli, vec.twiddle_factors
    )
    ts = np.stack([vec.t_target_iter_ptr] * B)
    rs = np.stack([vec.input] * B)

    # [1] run_hoisted(perm=None) bit-exact vs frozen vector
    t0 = time.time()
    dec = ctx.hoist(ts)
    out = call_with_retry(
        ctx.run_hoisted, dec, rs, vec.key_vectors, vec.modswitch_factors
    )
    log(f"[1] hoist+apply compile+run {time.time()-t0:.0f}s")
    np.testing.assert_array_equal(out.to_host()[0], vec.expected_output)
    log("[1] hoisted perm=None bit-exact: OK")

    # [2] deferred-perm identity on device: run_hoisted(perm=sigma) ==
    #     sigma-gather of run_batch with sigma^{-1}-permuted keys
    sigma = _ntt_galois_sigma(n, 5).astype(np.int32)
    inv = np.empty_like(sigma)
    inv[sigma] = np.arange(n, dtype=np.int32)
    t0 = time.time()
    outp = call_with_retry(
        lambda: ctx.run_hoisted(
            dec, rs, vec.key_vectors, vec.modswitch_factors, perm=sigma
        )
    ).to_host()
    log(f"[2] perm apply compile+run {time.time()-t0:.0f}s")
    keys_perm = [
        np.asarray(kv, np.uint64).reshape(2, K, n)[..., inv].reshape(-1)
        for kv in vec.key_vectors
    ]
    inner = ctx.run_batch(
        rs[:1], ts[:1], keys_perm, vec.modswitch_factors
    )[0]
    want = inner.reshape(2, L, n)[..., sigma].reshape(-1)
    np.testing.assert_array_equal(outp[0], want)
    np.testing.assert_array_equal(outp[B - 1], want)
    log("[2] deferred-perm identity bit-exact: OK")

    # [3] keyed chain depth-2 == sequential run_device
    S = 4
    key_sets = [vec.key_vectors] + [
        [
            np.roll(np.asarray(kv, np.uint64).reshape(2, K, n), s, axis=-1
                    ).reshape(-1)
            for kv in vec.key_vectors
        ]
        for s in range(1, S)
    ]
    h_t = ctx.stage_target(ts)
    seq = ctx.run_device(rs, h_t, key_sets[0], vec.modswitch_factors)
    seq = ctx.run_device(seq, h_t, key_sets[1], vec.modswitch_factors)
    got2 = ctx.run_device_chain_keyed(
        rs, h_t, key_sets, vec.modswitch_factors, [0, 1]
    )
    np.testing.assert_array_equal(got2.to_host(), seq.to_host())
    log("[3] keyed chain depth-2 bit-exact vs sequential: OK")

    # [4] rates: full keyswitch (device), hoisted apply, keyed chain
    t = w.to_pair_np(ts.reshape(B, L, n))
    r = w.to_pair_np(rs.reshape(B, 2, L, n))
    keys = [jnp.asarray(x) for x in ctx.device_keys(vec.key_vectors)]
    msf4 = jnp.asarray(ctx.prepare_msf4(vec.modswitch_factors))

    def step(tlo, thi, rlo, rhi):
        olo, ohi = ctx._build(tlo, thi, *keys, rlo, rhi, msf4)
        return olo[:, 0], ohi[:, 0], olo, ohi

    dt = chain_timer(
        step,
        (jnp.asarray(t[0]), jnp.asarray(t[1]),
         jnp.asarray(r[0]), jnp.asarray(r[1])),
        i1=2, i2=8,
    )
    log(f"[4] full keyswitch device: {B/dt:.0f} op/s ({dt*1e3:.2f} ms/b{B})")

    Sh = int(os.environ.get("HOIST_STEPS", 8))
    sigmas = np.stack([
        _ntt_galois_sigma(n, pow(5, s + 1, 2 * n)) for s in range(Sh)
    ]).astype(np.int32)
    perm_tab = jnp.asarray(sigmas)
    t0 = time.time()
    kstack = ctx.hoisted_key_stack(vec.key_vectors, list(sigmas))
    jax.block_until_ready(kstack)
    log(f"[4] hoisted key stacks staged in {time.time()-t0:.0f}s")

    # big tensors ride the chain STATE (XLA parameters), not the closure
    def hstep(i, rlo, rhi, dlo, dhi, ka, kb, kc, kd, pt, m4):
        s = jnp.remainder(i, Sh)
        olo, ohi = ctx._apply_hoisted(
            dlo, dhi, rlo, rhi, ka[s], kb[s], kc[s], kd[s],
            m4, perm=pt[s],
        )
        return (i + 1, olo, ohi, dlo, dhi, ka, kb, kc, kd, pt, m4)

    dt_h = chain_timer(
        hstep,
        (jnp.int32(0), jnp.asarray(r[0]), jnp.asarray(r[1]),
         dec.dlo, dec.dhi, *kstack, perm_tab, msf4),
        i1=2, i2=8,
    )
    log(f"[4] hoisted apply: {B/dt_h:.0f} op/s ({dt_h*1e3:.2f} ms/b{B}) "
        f"speedup {dt/dt_h:.2f}x")

    depth = 64
    schedule = [i % S for i in range(depth)]
    cur = ctx.run_device_chain_keyed(
        rs, h_t, key_sets, vec.modswitch_factors, schedule
    )
    cur.block_until_ready()
    t0 = time.time()
    cur = ctx.run_device_chain_keyed(
        cur, h_t, key_sets, vec.modswitch_factors, schedule
    )
    cur.block_until_ready()
    dt_c = time.time() - t0
    log(f"[4] keyed chain depth-{depth}: {depth*B/dt_c:.0f} op/s")
    print("PROBE-R4-PASS")


if __name__ == "__main__":
    main()
