"""Round-5 verification probe: rectangular Galois factorization at n=8192.

Drives the PUBLIC hoisted-rotation surface on the real TPU:
  * run_hoisted(galois=g) — the new two-matmul MXU path at odd log2 n
    (round 4 fell back to the ~8.7 ms lane gather here);
  * run_hoisted(perm=sigma_g) — the gather path, as the oracle;
  * run_hoisted() with no permutation — bit-exact vs run_batch (golden
    contract);
and times both rotation modes (chain_timer slopes, wire excluded).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

t0 = time.time()


def log(*a):
    print(f"[{time.time()-t0:6.1f}s]", *a, file=sys.stderr, flush=True)


def main():
    import jax.numpy as jnp

    from hexl_fpga_tpu.ops import galois_mxu, keyswitch_tpu, word64 as w
    from hexl_fpga_tpu.utils import vectors
    from hexl_fpga_tpu.utils.retry import call_with_retry
    from hexl_fpga_tpu.utils.timing import chain_timer

    n, L, K = 8192, 5, 7  # the reference's first-class 8192_5_7_6_2 config
    B = 8
    vec = vectors.make_keyswitch_vector(n, L, K, seed=5, modulus_bits=51)
    ctx = keyswitch_tpu.get_context(
        n, L, K, L + 1, 2, vec.moduli, vec.twiddle_factors
    )
    ts = np.stack([vec.t_target_iter_ptr] * B)
    rs = np.stack([vec.input] * B)

    # plain run_hoisted == run_batch (bit-exact contract)
    out = call_with_retry(
        ctx.run_batch, rs, ts, vec.key_vectors, vec.modswitch_factors
    )
    log("full keyswitch ran")
    dec = ctx.hoist(ts)
    outh = call_with_retry(
        ctx.run_hoisted, dec, rs, vec.key_vectors, vec.modswitch_factors
    )
    np.testing.assert_array_equal(outh.to_host(), out)
    log("hoisted(no perm) bit-exact vs run_batch: OK")

    g = pow(5, 9, 2 * n)
    sigma = galois_mxu.ntt_galois_sigma(n, g).astype(np.int32)
    import functools

    got_mxu = call_with_retry(functools.partial(
        ctx.run_hoisted, dec, rs, vec.key_vectors, vec.modswitch_factors,
        galois=g,
    ))
    got_perm = call_with_retry(functools.partial(
        ctx.run_hoisted, dec, rs, vec.key_vectors, vec.modswitch_factors,
        perm=sigma,
    ))
    np.testing.assert_array_equal(got_mxu.to_host(), got_perm.to_host())
    log("hoisted(galois=g) MXU path bit-exact vs gather path at n=8192: OK")

    # rates: matmul-automorphism apply vs gather apply (device slopes)
    keys_g = ctx.device_keys(vec.key_vectors, hoist_perm=sigma)
    msf4 = jnp.asarray(ctx.prepare_msf4(vec.modswitch_factors))
    gops = ctx.galois_mxu_operands(g)
    sig_dev = jnp.asarray(sigma)
    r = w.to_pair_np(rs.reshape(B, 2, L, n))

    def step_mxu(rlo, rhi, dl, dh, a, b, c, d, m4, C, M):
        olo, ohi = ctx._apply_hoisted(dl, dh, rlo, rhi, a, b, c, d, m4,
                                      galois_ops=(C, M))
        return (olo, ohi, dl, dh, a, b, c, d, m4, C, M)

    def step_gather(rlo, rhi, dl, dh, a, b, c, d, m4, s):
        olo, ohi = ctx._apply_hoisted(dl, dh, rlo, rhi, a, b, c, d, m4,
                                      perm=s)
        return (olo, ohi, dl, dh, a, b, c, d, m4, s)

    base = (jnp.asarray(r[0]), jnp.asarray(r[1]), dec.dlo, dec.dhi,
            *keys_g, msf4)
    dt_m = chain_timer(step_mxu, base + tuple(gops), i1=2, i2=8)
    dt_g = chain_timer(step_gather, base + (sig_dev,), i1=2, i2=8)
    log(f"hoisted apply n=8192 B={B}: MXU {B/dt_m:.0f} op/s "
        f"({dt_m*1e3:.2f} ms), gather {B/dt_g:.0f} op/s "
        f"({dt_g*1e3:.2f} ms), matmul/gather speedup {dt_g/dt_m:.2f}x")
    print("PROBE_OK", flush=True)


if __name__ == "__main__":
    main()
