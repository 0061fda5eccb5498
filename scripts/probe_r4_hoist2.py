"""Minimal hoisted-apply timing probe (round 4): hoist once, time the
per-step apply with per-step sigmas + pre-permuted key stacks, all large
tensors passed as chain-state parameters.  Fine-grained stage logging to
locate any stall."""

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
    from hexl_fpga_tpu.utils.timing import chain_timer

    n, L, K = 16384, 6, 7
    B = int(os.environ.get("BATCH", 32))
    Sh = int(os.environ.get("HOIST_STEPS", 4))
    log(f"devices: {jax.devices()} B={B} S={Sh}")
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

    t0 = time.time()
    dec = ctx.hoist(ts)
    dec.block_until_ready()
    log(f"hoist (decompose) compile+run {time.time()-t0:.0f}s")

    t0 = time.time()
    sigmas = np.stack([
        _ntt_galois_sigma(n, pow(5, s + 1, 2 * n)) for s in range(Sh)
    ]).astype(np.int32)
    log(f"sigmas built {time.time()-t0:.0f}s")
    t0 = time.time()
    kstack = ctx.hoisted_key_stack(vec.key_vectors, list(sigmas))
    jax.block_until_ready(kstack)
    log(f"key stacks staged {time.time()-t0:.0f}s "
        f"({sum(int(np.prod(k.shape)) for k in kstack)*4/1e6:.0f} MB)")

    msf4 = jnp.asarray(ctx.prepare_msf4(vec.modswitch_factors))
    perm_tab = jnp.asarray(sigmas)
    r = w.to_pair_np(rs.reshape(B, 2, L, n))

    def hstep(i, rlo, rhi, dlo, dhi, ka, kb, kc, kd, pt, m4):
        s = jnp.remainder(i, Sh)
        olo, ohi = ctx._apply_hoisted(
            dlo, dhi, rlo, rhi, ka[s], kb[s], kc[s], kd[s],
            m4, perm=pt[s],
        )
        return (i + 1, olo, ohi, dlo, dhi, ka, kb, kc, kd, pt, m4)

    t0 = time.time()
    dt_h = chain_timer(
        hstep,
        (jnp.int32(0), jnp.asarray(r[0]), jnp.asarray(r[1]),
         dec.dlo, dec.dhi, *kstack, perm_tab, msf4),
        i1=2, i2=6,
    )
    log(f"hoisted chain timed in {time.time()-t0:.0f}s")
    log(f"hoisted apply: {B/dt_h:.0f} op/s ({dt_h*1e3:.2f} ms/b{B})")
    print(f"HOISTED_MS_PER_BATCH {dt_h*1e3:.3f}")


if __name__ == "__main__":
    main()
