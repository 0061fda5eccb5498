"""Round-4 isolation probe: where do the hoisted apply's ms go?

(a) bare minor-axis gather rate on the chip (x[..., perm] chained);
(b) the hoisted apply WITHOUT the output gather (perm=None), same harness;
(c) (from probe_r4_hoist2) the full apply with perm = 11.95 ms/b32.
(c) - (b) = output-gather cost; (a) = intrinsic gather ceiling.
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
    from hexl_fpga_tpu.utils.timing import chain_timer

    n, L, K = 16384, 6, 7
    B = int(os.environ.get("BATCH", 32))
    log(f"devices: {jax.devices()}")

    # (a) bare gather: (2*B*L? use the output shape) rows x n, u32 pair
    R = B * 2 * L  # the output tensor's rows
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 2**32, size=(R, n), dtype=np.uint64)
                    .astype(np.uint32))
    perm = jnp.asarray(
        _ntt_galois_sigma(n, 5).astype(np.int32)
    )

    def gstep(a, b):
        return b[:, perm], a[:, perm]

    dt = chain_timer(gstep, (x, x), i1=2, i2=10)
    mb = 2 * R * n * 4 / 1e6
    log(f"(a) bare gather: {dt*1e3:.2f} ms per 2x({R},{n}) u32 "
        f"= {mb/dt/1e3:.1f} GB/s")

    # (b) hoisted apply, perm=None, kstack-sliced keys (same harness shape)
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
    log(f"hoist compile+run {time.time()-t0:.0f}s")
    Sh = 4
    sigmas = np.stack([
        _ntt_galois_sigma(n, pow(5, s + 1, 2 * n)) for s in range(Sh)
    ]).astype(np.int32)
    kstack = ctx.hoisted_key_stack(vec.key_vectors, list(sigmas))
    msf4 = jnp.asarray(ctx.prepare_msf4(vec.modswitch_factors))
    r = w.to_pair_np(rs.reshape(B, 2, L, n))

    def hstep_np(i, rlo, rhi, dlo, dhi, ka, kb, kc, kd, m4):
        s = jnp.remainder(i, Sh)
        olo, ohi = ctx._apply_hoisted(
            dlo, dhi, rlo, rhi, ka[s], kb[s], kc[s], kd[s], m4, perm=None,
        )
        return (i + 1, olo, ohi, dlo, dhi, ka, kb, kc, kd, m4)

    dt_b = chain_timer(
        hstep_np,
        (jnp.int32(0), jnp.asarray(r[0]), jnp.asarray(r[1]),
         dec.dlo, dec.dhi, *kstack, msf4),
        i1=2, i2=6,
    )
    log(f"(b) apply WITHOUT output gather: {dt_b*1e3:.2f} ms/b{B} "
        f"({B/dt_b:.0f} op/s)")


if __name__ == "__main__":
    main()
