"""Probe: Galois-matmul operand dtype on the hoisted-apply rate (round 5).

The deferred automorphism runs as TWO one-hot einsums over four u8 limb
planes (ops/galois_mxu.py), currently staged in f32.  On TPU MXU:

  * f32 matmul runs at a fraction of the bf16 rate and reads 4 B/limb;
  * bf16 is exact for the same one-hot dot products (integers < 256 fit
    bf16's 8 significand bits; each output is a single product) at half
    the HBM bytes and full MXU rate;
  * int8 with a -128 offset (limb' = limb - 128, out = einsum + 128,
    exact because every one-hot row sums to 1) reads 1 B/limb and hits
    the 2x int8 MXU path with int32 accumulation.

This measures the full hoisted-apply chain (the bench.py hstep shape,
flagship 16384_6_7_7_2, batch 32) with each variant, interleaved in ONE
process so chip-load variance cancels, asserting bit-exactness of every
variant against the f32 path first.

Run: python scripts/probe_r5_galois_dtype.py
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


def apply_variant(x, C, M, mode):
    """apply_galois_mxu with a dtype-mode knob (x: uint32 planes)."""
    n2, n1 = C.shape[0], M.shape[1]
    shp = x.shape
    x2 = x.reshape(shp[:-1] + (n2, n1))
    limbs_u = jnp.stack(
        [((x2 >> (8 * k)) & jnp.uint32(0xFF)) for k in range(4)]
    )
    if mode == "f32":
        limbs = limbs_u.astype(jnp.float32)
        G = jnp.einsum("pc,k...cm->k...pm", C, limbs)
        O = jnp.einsum("prm,k...pm->k...pr", M, G).astype(jnp.uint32)
    elif mode == "bf16":
        limbs = limbs_u.astype(jnp.bfloat16)
        Cb, Mb = C.astype(jnp.bfloat16), M.astype(jnp.bfloat16)
        G = jnp.einsum("pc,k...cm->k...pm", Cb, limbs)
        O = jnp.einsum("prm,k...pm->k...pr", Mb, G).astype(jnp.uint32)
    elif mode == "int8":
        limbs = (limbs_u.astype(jnp.int32) - 128).astype(jnp.int8)
        Ci = C.astype(jnp.int8)
        Mi = M.astype(jnp.int8)
        G = jnp.einsum("pc,k...cm->k...pm", Ci, limbs,
                       preferred_element_type=jnp.int32).astype(jnp.int8)
        O = jnp.einsum("prm,k...pm->k...pr", Mi, G,
                       preferred_element_type=jnp.int32)
        O = (O + 128).astype(jnp.uint32)
    elif mode == "rowC":
        # C is a pure permutation of n2 ROWS (each a full 128-lane vector):
        # take along the sublane axis with a STATIC index — no matmul, no
        # limb inflation for that stage — then only M runs as bf16 matmuls.
        c_idx = jnp.argmax(C.astype(jnp.float32), axis=1)
        g2 = jnp.take(x2, c_idx, axis=-2)
        limbs = jnp.stack(
            [((g2 >> (8 * k)) & jnp.uint32(0xFF)).astype(jnp.bfloat16)
             for k in range(4)]
        )
        Mb = M.astype(jnp.bfloat16)
        O = jnp.einsum("prm,k...pm->k...pr", Mb, limbs).astype(jnp.uint32)
    elif mode == "u16":
        # TWO u16 limb planes in f32 (< 2^16 is exact in f32's 24-bit
        # significand): half the matmul count of the u8 modes, f32 MXU rate
        limbs = jnp.stack(
            [((x2 >> (16 * k)) & jnp.uint32(0xFFFF)).astype(jnp.float32)
             for k in range(2)]
        )
        Cf, Mf = C.astype(jnp.float32), M.astype(jnp.float32)
        G = jnp.einsum("pc,k...cm->k...pm", Cf, limbs)
        O = jnp.einsum("prm,k...pm->k...pr", Mf, G).astype(jnp.uint32)
        out = O[0] | (O[1] << 16)
        return out.reshape(shp)
    else:
        raise ValueError(mode)
    out = O[0] | (O[1] << 8) | (O[2] << 16) | (O[3] << 24)
    return out.reshape(shp)


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
    gops = [
        galois_mxu.build_galois_operands(n, g) for g in gs
    ]
    cS = jnp.stack([jnp.asarray(o.C) for o in gops])
    mS = jnp.stack([jnp.asarray(o.M) for o in gops])

    # --- exactness of each variant vs the f32 apply on a real plane ------
    x = jnp.asarray(
        rng.integers(0, 1 << 32, size=(4, 2, n), dtype=np.uint64
                     ).astype(np.uint32))
    base = np.asarray(apply_variant(x, cS[0], mS[0], "f32"))
    # u16-in-f32 is NOT exact on TPU: XLA's default f32 dot runs bf16
    # passes, so only values < 256 survive any precision (measured).
    for mode in ("bf16", "int8", "rowC"):
        got = np.asarray(jax.jit(
            lambda a, b, c: apply_variant(a, b, c, mode))(x, cS[0], mS[0]))
        assert np.array_equal(base, got), f"{mode} NOT exact"
        log(f"{mode} bit-exact vs f32: OK")
    sig = np.asarray(sigmas[0])
    want = np.asarray(x)[..., sig]
    assert np.array_equal(base, want), "f32 vs direct sigma mismatch"
    log("f32 bit-exact vs direct sigma gather: OK")

    # --- chained hoisted apply per variant (interleaved rounds) ----------
    def make_step(mode):
        def hstep(i, rlo, rhi, dl, dh, ka, kb, kc, kd, Cs, Ms, m4):
            s = jnp.remainder(i, S)
            olo, ohi = ctx._apply_hoisted(
                dl, dh, rlo, rhi, ka[s], kb[s], kc[s], kd[s], m4,
            )
            olo = apply_variant(olo, Cs[s], Ms[s], mode)
            ohi = apply_variant(ohi, Cs[s], Ms[s], mode)
            return (i + 1, olo, ohi, dl, dh, ka, kb, kc, kd, Cs, Ms, m4)
        return hstep

    args0 = (jnp.int32(0), jnp.asarray(r[0]), jnp.asarray(r[1]),
             dec.dlo, dec.dhi, *kstack, cS, mS, msf4)
    modes = tuple(
        os.environ.get("PROBE_MODES", "bf16,rowC,u16").split(","))
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
