"""Probe: where the hoisted apply's residual gap to its 2x ideal lives.

The deferred Galois automorphism currently runs apply_galois_mxu TWICE
(out_lo, out_hi) at 4 u8 limbs each = 8 limb planes through the M einsum.
But the pair encodes ONE value lo + hi*2^32 < 2^52 (moduli <= 52 bits at
the flagship config), so SEVEN u8 limbs cover it — and both planes can
ride a single take + einsum call.  12.5% less permutation-stage traffic
plus one fewer dispatch chain.

Interleaved same-process A/B at the bench hstep shape (16384_6_7_7_2,
batch 32, 8 alternating sigmas):

  plain  — hoisted apply with NO output permutation (the lower bound);
  cur    — the shipped path (two 4-limb apply_galois_mxu calls);
  pair7  — one 7-limb stacked apply for (lo, hi).

Every variant is asserted bit-exact against the direct sigma gather
before timing.  Run: python scripts/probe_r5_hoist_gap.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from hexl_fpga_tpu.ops import galois_mxu, keyswitch_tpu
from hexl_fpga_tpu.ops import word64 as w
from hexl_fpga_tpu.integrations.ckks import _ntt_galois_sigma
from hexl_fpga_tpu.utils import vectors
from hexl_fpga_tpu.utils.timing import chain_timer


def log(msg):
    print(f"[{time.time()-T0:7.1f}s] {msg}", flush=True)


T0 = time.time()


def apply_pair7(lo, hi, c_idx, M):
    """Permute the (lo, hi) u32 pair by the staged Galois operands with
    SEVEN u8 limbs of the underlying < 2^56 value (4 from lo, 3 from hi;
    hi < 2^24 whenever every modulus is < 56 bits) in ONE take + einsum."""
    n1 = M.shape[1]
    n2 = c_idx.shape[0]
    shp = lo.shape
    x2 = jnp.stack([lo, hi]).reshape((2,) + shp[:-1] + (n2, n1))
    g2 = jnp.take(x2, c_idx, axis=-2)
    glo, ghi = g2[0], g2[1]
    limbs = jnp.stack(
        [((glo >> (8 * k)) & jnp.uint32(0xFF)).astype(M.dtype)
         for k in range(4)]
        + [((ghi >> (8 * k)) & jnp.uint32(0xFF)).astype(M.dtype)
           for k in range(3)]
    )  # (7, ..., n2, n1)
    O = jnp.einsum("prm,k...pm->k...pr", M, limbs).astype(jnp.uint32)
    olo = O[0] | (O[1] << 8) | (O[2] << 16) | (O[3] << 24)
    ohi = O[4] | (O[5] << 8) | (O[6] << 16)
    return olo.reshape(shp), ohi.reshape(shp)


def main():
    n, L, K = 16384, 6, 7
    B = int(os.environ.get("PROBE_BATCH", 32))
    frozen = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..",
        "tests", "testdata", "16384_6_7_7_2_0.json.gz",
    )
    vec = vectors.load_json(frozen)
    ctx = keyswitch_tpu.get_context(
        n, L, K, L + 1, 2, vec.moduli, vec.twiddle_factors
    )
    rng = np.random.default_rng(5)
    ts = np.stack([vec.t_target_iter_ptr] * B)
    rs = np.stack([vec.input] * B)
    log(f"staging (B={B})")
    dec = ctx.hoist(ts)
    r = w.to_pair_np(rs.reshape(B, 2, L, n))
    msf4 = jnp.asarray(ctx.prepare_msf4(vec.modswitch_factors))

    S = 8
    gs = [pow(5, s + 1, 2 * n) for s in range(S)]
    sigmas = np.stack([_ntt_galois_sigma(n, g) for g in gs]).astype(np.int32)
    kstack = ctx.hoisted_key_stack(vec.key_vectors, list(sigmas))
    staged = [galois_mxu.stage_operands(
        galois_mxu.build_galois_operands(n, g)) for g in gs]
    cS = jnp.stack([s[0] for s in staged])          # (S, n2) int32
    mS = jnp.stack([s[1] for s in staged])          # (S, n2, n1, n1) bf16

    # --- exactness: pair7 vs direct sigma gather on real-looking planes --
    lo = jnp.asarray(rng.integers(0, 1 << 32, size=(4, 2, n),
                                  dtype=np.uint64).astype(np.uint32))
    hi = jnp.asarray(rng.integers(0, 1 << 20, size=(4, 2, n),
                                  dtype=np.uint64).astype(np.uint32))
    got_lo, got_hi = jax.jit(apply_pair7)(lo, hi, cS[0], mS[0])
    sig = np.asarray(sigmas[0])
    assert np.array_equal(np.asarray(got_lo), np.asarray(lo)[..., sig])
    assert np.array_equal(np.asarray(got_hi), np.asarray(hi)[..., sig])
    log("pair7 bit-exact vs direct sigma gather: OK")
    cur_lo = galois_mxu.apply_galois_mxu(lo, cS[0], mS[0])
    cur_hi = galois_mxu.apply_galois_mxu(hi, cS[0], mS[0])
    assert np.array_equal(np.asarray(cur_lo), np.asarray(got_lo))
    assert np.array_equal(np.asarray(cur_hi), np.asarray(got_hi))
    log("cur bit-exact vs pair7: OK")

    # --- chained hoisted apply per variant (interleaved rounds) ----------
    def make_step(mode):
        def hstep(i, rlo, rhi, dl, dh, ka, kb, kc, kd, Cs, Ms, m4):
            s = jnp.remainder(i, S)
            olo, ohi = ctx._apply_hoisted(
                dl, dh, rlo, rhi, ka[s], kb[s], kc[s], kd[s], m4,
            )
            if mode == "cur":
                olo = galois_mxu.apply_galois_mxu(olo, Cs[s], Ms[s])
                ohi = galois_mxu.apply_galois_mxu(ohi, Cs[s], Ms[s])
            elif mode == "pair7":
                olo, ohi = apply_pair7(olo, ohi, Cs[s], Ms[s])
            return (i + 1, olo, ohi, dl, dh, ka, kb, kc, kd, Cs, Ms, m4)
        return hstep

    args0 = (jnp.int32(0), jnp.asarray(r[0]), jnp.asarray(r[1]),
             dec.dlo, dec.dhi, *kstack, cS, mS, msf4)
    modes = tuple(
        os.environ.get("PROBE_MODES", "plain,cur,pair7").split(","))
    rates = {m: [] for m in modes}
    for rnd in range(3):
        for mode in modes:
            dt = chain_timer(make_step(mode), args0, i1=2, i2=8)
            rates[mode].append(B / dt)
            log(f"round {rnd} {mode}: {B/dt:.0f} op/s")
    for mode in modes:
        med = sorted(rates[mode])[1]
        log(f"{mode}: median {med:.0f} op/s over {len(rates[mode])} rounds")


if __name__ == "__main__":
    main()
