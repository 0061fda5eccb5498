"""Hoisted keyswitch (decompose once, apply many) at the flagship config.

Models the dominant CKKS rotation pattern (BSGS linear transforms,
bootstrapping CoeffToSlot): ONE hoisted decomposition of a ciphertext,
then many rotation applies — each a {NTT-domain gather + 84-term MAC +
INTT2 + fused tail} instead of the full 62-transform-row keyswitch.

Timing is hoist-proof for the hoisted regime: D is *supposed* to be
loop-invariant (that is the optimization), but each chain step gathers D
with a DIFFERENT Galois permutation selected by the carried step index, so
the per-step MAC/INTT2/tail work cannot be moved out of the loop; the
ciphertext accumulator chains step to step.  The same-process full-keyswitch
chain (bench_keyswitch's device metric shape) is measured alongside for the
speedup ratio."""

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

    from hexl_fpga_tpu.integrations.ckks import _ntt_galois_sigma
    from hexl_fpga_tpu.ops import keyswitch_tpu, word64 as w
    from hexl_fpga_tpu.utils import vectors
    from hexl_fpga_tpu.utils.timing import chain_timer

    n = int(os.environ.get("N", 16384))
    L = int(os.environ.get("DECOMP", 6))
    K = int(os.environ.get("KEY_MODULUS", 7))
    B = int(os.environ.get("BATCH", 4))
    S = int(os.environ.get("STEPS", 8))  # distinct rotation sigmas cycled
    log(f"config {n}_{L}_{K}_{L+1}_2 batch={B} steps={S}")
    t0 = time.time()
    vec = vectors.make_keyswitch_vector(n, L, K, seed=0, modulus_bits=51)
    log(f"vector gen {time.time()-t0:.0f}s")
    ctx = keyswitch_tpu.get_context(
        n, L, K, L + 1, 2, vec.moduli, vec.twiddle_factors
    )
    ts = np.stack([vec.t_target_iter_ptr] * B)
    rs = np.stack([vec.input] * B)

    # correctness gate: the hoisted apply with no permutation must be
    # BIT-IDENTICAL to the standard path
    t0 = time.time()
    dec = ctx.hoist(ts)
    out = ctx.run_hoisted(dec, rs, vec.key_vectors, vec.modswitch_factors)
    log(f"hoist compile+first {time.time()-t0:.0f}s")
    np.testing.assert_array_equal(out.to_host()[0], vec.expected_output)
    log("hoisted perm=None bit-exact OK")

    keys = [jnp.asarray(x) for x in ctx.device_keys(vec.key_vectors)]
    msf4 = jnp.asarray(ctx.prepare_msf4(vec.modswitch_factors))
    sigmas = np.stack([
        _ntt_galois_sigma(n, pow(5, r + 1, 2 * n)) for r in range(S)
    ]).astype(np.int32)
    perm_tab = jnp.asarray(sigmas)
    # per-step sigma^{-1}-permuted key stacks (deferred-automorphism apply;
    # staged once, the production rotate_many pattern)
    kstack = ctx.hoisted_key_stack(vec.key_vectors, list(sigmas))
    dlo, dhi = dec.dlo, dec.dhi
    r0 = w.to_pair_np(rs.reshape(B, 2, L, n))

    # hoisted chain: step i applies sigma_{i mod S}; accumulator carries
    def hoisted_step(i, rlo, rhi):
        s = jnp.remainder(i, S)
        olo, ohi = ctx._apply_hoisted(
            dlo, dhi, rlo, rhi,
            kstack[0][s], kstack[1][s], kstack[2][s], kstack[3][s],
            msf4, perm=perm_tab[s],
        )
        return i + 1, olo, ohi

    dt_h = chain_timer(
        hoisted_step, (jnp.int32(0),) + tuple(jnp.asarray(x) for x in r0)
    )
    emit("hoisted_keyswitch_throughput_device", B / dt_h, "op/s",
         config=f"{n}_{L}_{K}_{L+1}_2", batch=B,
         ms_per_op=round(dt_h / B * 1e3, 3))

    # same-process full keyswitch chain (A/B baseline; bench_keyswitch shape)
    t = w.to_pair_np(ts.reshape(B, L, n))

    def full_step(tlo, thi, rlo, rhi):
        olo, ohi = ctx._build(tlo, thi, *keys, rlo, rhi, msf4)
        return olo[:, 0], ohi[:, 0], olo, ohi

    dt_f = chain_timer(
        full_step, tuple(jnp.asarray(x) for x in (t[0], t[1], r0[0], r0[1]))
    )
    emit("keyswitch_throughput_device", B / dt_f, "op/s",
         config=f"{n}_{L}_{K}_{L+1}_2", batch=B,
         ms_per_op=round(dt_f / B * 1e3, 3))
    emit("hoisted_speedup", dt_f / dt_h, "x",
         note="per-rotation: hoisted apply vs full keyswitch, same process")


if __name__ == "__main__":
    main()
