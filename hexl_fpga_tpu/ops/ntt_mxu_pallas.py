"""Fused Pallas kernel for the four-step MXU NTT/INTT.

Same math as ops/ntt_mxu.py (two exact int8-limb matmuls + per-element
modular recombination — see that module's docstring), but fused into ONE
Pallas kernel per direction: a tile of whole polynomials stays resident in
VMEM through both matmul stages, so the int32 limb-group products — 7x the
data volume — never touch HBM.  This is what the unfused XLA version cannot
do (matmul outputs don't fuse into elementwise consumers), and it is the
difference between HBM-bound and MXU/VPU-bound.

Layout walk (forward), tile of P polys:
  in  (P, n1, n2)  --transpose-->  (n1, P*n2)      stage-1 contraction-major
  stage 1: S_s = G1big_s^T @ limbs(x);  C = sum_s S_s * (2^{8s} U) mod q
  (n1, P*n2) == (n1*P, n2) view      stage-2 contraction on the minor axis
  stage 2: S_s = limbs(C) @ G2big_s;  out = sum_s S_s * 2^{8s} mod q
  out (n1*P, n2) --transpose--> (P, n1, n2)
The inverse runs the same two stages mirrored (right-matmul with the V
table first, then left-matmul), matching A = H1 @ ((Y @ H2) * V).

Reference analog: `device/fwd_ntt.cpp` / `device/inv_ntt.cpp` butterfly
pipelines; here the FPGA's 8-butterflies/cycle datapath becomes 128x128
systolic matmuls, the TPU-native widest unit.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import word64 as w
from .ntt_mxu import make_plan
from ..utils.retry import call_with_retry

Pair = Tuple[jnp.ndarray, jnp.ndarray]

DEFAULT_TILE_P = 4


# ---------------------------------------------------------------------------
# in-kernel helpers (operate on jnp values inside the kernel trace)
# ---------------------------------------------------------------------------


def _limbs_axis0(lo, hi, nlimb):
    """(K, C) u32 pair -> int8 limbs (nlimb*K, C) and uint-rowsum (1, C)."""
    limbs = []
    for t in range(nlimb):
        v = ((lo >> (8 * t)) & 0xFF) if t < 4 else ((hi >> (8 * (t - 4))) & 0xFF)
        limbs.append(v)
    u = jnp.concatenate(limbs, axis=0)
    rowsum = sum(l.astype(jnp.int32).sum(axis=0, keepdims=True) for l in limbs)
    return (u.astype(jnp.int32) - 128).astype(jnp.int8), rowsum


def _limbs_axis1(lo, hi, nlimb):
    """(R, C) u32 pair -> int8 limbs (R, nlimb*C) and uint-rowsum (R, 1)."""
    limbs = []
    for t in range(nlimb):
        v = ((lo >> (8 * t)) & 0xFF) if t < 4 else ((hi >> (8 * (t - 4))) & 0xFF)
        limbs.append(v)
    u = jnp.concatenate(limbs, axis=1)
    rowsum = sum(l.astype(jnp.int32).sum(axis=1, keepdims=True) for l in limbs)
    return (u.astype(jnp.int32) - 128).astype(jnp.int8), rowsum


def _assemble_fold(S_list, c64: int):
    """V = sum_s S_s << 8s  ->  a 64-bit representative congruent to V mod q.

    The limb-group sums assemble into three u32 words with SHIFTS AND ADDS
    ONLY (no per-s multiplies), then the top word folds via 2^64 = c64.
    S_s: int32, nonneg, < 2^26; V < 2^75."""
    z = jnp.zeros_like(S_list[0], jnp.uint32)
    v0 = v1 = v2 = z
    for s, S in enumerate(S_list):
        Su = S.astype(jnp.uint32)
        word, sh = divmod(8 * s, 32)
        lo_c = (Su << sh) if sh else Su
        hi_c = (Su >> (32 - sh)) if sh else None
        if word == 0:
            t0 = v0 + lo_c
            c0 = (t0 < v0).astype(jnp.uint32)
            v0 = t0
            t1 = v1 + c0
            c1 = (t1 < v1).astype(jnp.uint32)
            v1 = t1
            v2 = v2 + c1
            if hi_c is not None:
                t1 = v1 + hi_c
                c1 = (t1 < v1).astype(jnp.uint32)
                v1 = t1
                v2 = v2 + c1
        else:
            t1 = v1 + lo_c
            c1 = (t1 < v1).astype(jnp.uint32)
            v1 = t1
            v2 = v2 + c1
            if hi_c is not None:
                v2 = v2 + hi_c
    # fold the top word: v2 < 2^12, so v2 * c64 < 2^64 is exact in u64
    t = w.mullo64((v2, z), c64)
    vv = w.add64((v0, v1), t)
    carry = w.lt64(vv, (v0, v1))
    return w.select64(carry, w.add64(vv, c64), vv)


def _barrett_canonical(vv, q: int, q_barr: int):
    """Any u64 representative -> [0, q) (Barrett, two corrections)."""
    Q = w.mulhi64(vv, q_barr)
    r = w.sub64(vv, w.mullo64(Q, q))
    return w.cond_sub64(w.cond_sub64(r, q), q)


def _lazy_twiddle(x, wt, q: int):
    """One Harvey lazy multiply by a (W, W_precon) table; exact mod q for ANY
    u64 representative x, output in [0, 2q) — so the pre-twiddle Barrett is
    skipped entirely.  Lazy values are fine downstream (limb extraction
    handles anything < 2^56 and the matmul is mod-q linear)."""
    (wlo, whi, plo, phi) = wt
    return w.mul_mod_lazy(x, (wlo, whi), (plo, phi), q)


def _stage_left_inkernel(lo, hi, g_ref, corr_ref, q, c64, q_barr,
                         w_tables=None, canonical=True):
    """(K, C) u32 pair -> (n_out, C): left matmul, shift-assembly, then
    either a lazy twiddle multiply (tables pre-tiled to the working shape;
    no Barrett needed) or a canonical Barrett."""
    nlimb = g_ref.shape[0]
    a, rowsum = _limbs_axis0(lo, hi, nlimb)
    S_list = []
    for s in range(nlimb):
        dot = jax.lax.dot_general(
            g_ref[s], a,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        S_list.append(dot + corr_ref[s][:, None] + 128 * rowsum)
    vv = _assemble_fold(S_list, c64)
    if w_tables is not None:
        return _lazy_twiddle(vv, w_tables, q)
    if not canonical:
        return vv  # any-u64 representative; consumer reduces
    return _barrett_canonical(vv, q, q_barr)


def _stage_right_inkernel(lo, hi, g_ref, corr_ref, q, c64, q_barr,
                          w_tables=None, n1=None, canonical=True):
    """(R, C) u32 pair -> (R, n_out): right matmul + shift-assembly.

    With w_tables ((n1, n_out) x4), rows are (p, m1) with m1 minor; the lazy
    multiply runs in (P, n1, n_out) shape so the table broadcasts along the
    leading poly axis (and replaces the Barrett)."""
    nlimb = g_ref.shape[0]
    a, rowsum = _limbs_axis1(lo, hi, nlimb)
    R = lo.shape[0]
    S_list = []
    for s in range(nlimb):
        dot = jax.lax.dot_general(
            a, g_ref[s],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        S_list.append(dot + corr_ref[s][None, :] + 128 * rowsum)
    vv = _assemble_fold(S_list, c64)
    if w_tables is not None:
        shape3 = (R // n1, n1, vv[0].shape[1])
        x3 = (vv[0].reshape(shape3), vv[1].reshape(shape3))
        wt3 = tuple(t[None, :, :] for t in w_tables)
        out3 = _lazy_twiddle(x3, wt3, q)
        return (out3[0].reshape(R, -1), out3[1].reshape(R, -1))
    if not canonical:
        return vv  # any-u64 representative; consumer reduces
    return _barrett_canonical(vv, q, q_barr)


# ---------------------------------------------------------------------------
# fused kernels
# ---------------------------------------------------------------------------


def _fwd_body(lo3, hi3, g1_ref, c1_ref, uw_lo, uw_hi, up_lo, up_hi,
              g2_ref, c2_ref, q, n1, n2, tile_p, c64, q_barr, canonical):
    """Both forward stages on a (tile_p, n1, n2) tile; returns same shape.

    Dataflow keeps the lane (minor) axis aligned through both stages —
    j2 -> j2 -> m2 — so the only data movements are cheap major-axis swaps:
      in (P, n1, n2) --(1,0,2)--> (n1, P*n2)   stage-1 LEFT matmul (over j1)
      (n1, P*n2) == ((m1,p), n2) view          stage-2 RIGHT matmul (over j2)
      out ((m1,p), m2) --(1,0,2)--> (P, n1, n2)
    The U twiddle tables are host-pre-tiled to (n1, P*n2) so the lazy
    multiply is a plain same-shape elementwise op (no in-kernel broadcast)."""
    lo = jnp.transpose(lo3, (1, 0, 2)).reshape(n1, tile_p * n2)
    hi = jnp.transpose(hi3, (1, 0, 2)).reshape(n1, tile_p * n2)
    clo, chi = _stage_left_inkernel(
        lo, hi, g1_ref, c1_ref, q, c64, q_barr,
        w_tables=(uw_lo, uw_hi, up_lo, up_hi),
    )  # lazy [0, 2q)
    # (n1, P*n2) == (n1*P, n2) view: stage-2 contraction on minor axis
    olo, ohi = _stage_right_inkernel(
        clo.reshape(n1 * tile_p, n2), chi.reshape(n1 * tile_p, n2),
        g2_ref, c2_ref, q, c64, q_barr, canonical=canonical,
    )
    return (jnp.transpose(olo.reshape(n1, tile_p, n2), (1, 0, 2)),
            jnp.transpose(ohi.reshape(n1, tile_p, n2), (1, 0, 2)))


def _fwd_kernel(n: int, q: int, tile_p: int, plan, canonical=True):
    n1, n2 = plan["n1"], plan["n2"]
    c64, q_barr = int(plan["c64"]), int(plan["q_barr"])

    def kernel(lo_ref, hi_ref, g1_ref, c1_ref, uw_lo, uw_hi, up_lo, up_hi,
               g2_ref, c2_ref, olo_ref, ohi_ref):
        olo, ohi = _fwd_body(
            lo_ref[:], hi_ref[:], g1_ref, c1_ref,
            uw_lo[:], uw_hi[:], up_lo[:], up_hi[:], g2_ref, c2_ref,
            q, n1, n2, tile_p, c64, q_barr, canonical,
        )
        olo_ref[:] = olo
        ohi_ref[:] = ohi

    return kernel


def _inv_kernel(n: int, q: int, tile_p: int, plan, canonical=True):
    n1, n2 = plan["n1"], plan["n2"]
    c64, q_barr = int(plan["c64"]), int(plan["q_barr"])

    def kernel(lo_ref, hi_ref, g1_ref, c1_ref, vw_lo, vw_hi, vp_lo, vp_hi,
               g2_ref, c2_ref, olo_ref, ohi_ref):
        # stage 1: right matmul on (P*n1, n2), V table indexed by row % n1
        lo = lo_ref[:].reshape(tile_p * n1, n2)
        hi = hi_ref[:].reshape(tile_p * n1, n2)
        plo, phi = _stage_right_inkernel(
            lo, hi, g1_ref, c1_ref, q, c64, q_barr,
            w_tables=(vw_lo[:], vw_hi[:], vp_lo[:], vp_hi[:]), n1=n1,
        )  # lazy [0, 2q)
        # stage 2: left matmul over m1: (P, n1, n2) -> (n1, P*n2)
        plo = jnp.transpose(plo.reshape(tile_p, n1, n2), (1, 0, 2)).reshape(
            n1, tile_p * n2
        )
        phi = jnp.transpose(phi.reshape(tile_p, n1, n2), (1, 0, 2)).reshape(
            n1, tile_p * n2
        )
        olo, ohi = _stage_left_inkernel(
            plo, phi, g2_ref, c2_ref, q, c64, q_barr, canonical=canonical,
        )
        olo_ref[:] = jnp.transpose(
            olo.reshape(n1, tile_p, n2), (1, 0, 2)
        )
        ohi_ref[:] = jnp.transpose(
            ohi.reshape(n1, tile_p, n2), (1, 0, 2)
        )

    return kernel


def _make_call(kernel, n1, n2, tile_p, tabs, interpret):
    def call(lo, hi):
        B = lo.shape[0]
        grid = (B // tile_p,)
        data_spec = pl.BlockSpec(
            (tile_p, n1, n2), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        )
        full = [
            pl.BlockSpec(
                t.shape, (lambda nd: (lambda b: (0,) * nd))(t.ndim),
                memory_space=pltpu.VMEM,
            )
            for t in tabs
        ]
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[data_spec, data_spec] + full,
            out_specs=[data_spec, data_spec],
            out_shape=[
                jax.ShapeDtypeStruct((B, n1, n2), jnp.uint32),
                jax.ShapeDtypeStruct((B, n1, n2), jnp.uint32),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )(lo.reshape(B, n1, n2), hi.reshape(B, n1, n2), *tabs)
        return out[0].reshape(B, n1 * n2), out[1].reshape(B, n1 * n2)

    return call


def _fwd_tabs(plan, tile_p):
    g1, c1 = plan["f1"]
    g2, c2 = plan["f2"]
    n1, n2 = plan["n1"], plan["n2"]

    # U / U_precon tables pre-tiled to the kernel's (n1, P*n2) working shape
    def tile(t):
        return np.ascontiguousarray(
            np.broadcast_to(t[:, None, :], (n1, tile_p, n2)).reshape(
                n1, tile_p * n2
            )
        )

    (uw_lo, uw_hi), (up_lo, up_hi) = plan["f1_u"]
    return (
        jnp.asarray(g1), jnp.asarray(c1),
        jnp.asarray(tile(uw_lo)), jnp.asarray(tile(uw_hi)),
        jnp.asarray(tile(up_lo)), jnp.asarray(tile(up_hi)),
        jnp.asarray(g2), jnp.asarray(c2),
    )


def _inv_tabs(plan):
    g1, c1 = plan["i1"]
    g2, c2 = plan["i2"]
    (vw_lo, vw_hi), (vp_lo, vp_hi) = plan["i1_v"]
    return (
        jnp.asarray(g1), jnp.asarray(c1),
        jnp.asarray(vw_lo), jnp.asarray(vw_hi),
        jnp.asarray(vp_lo), jnp.asarray(vp_hi),
        jnp.asarray(g2), jnp.asarray(c2),
    )


def _pick_n1(n: int) -> int:
    # keep the lane (minor) axis at 128 through the whole kernel: n2 == 128,
    # n1 = n/128 — Mosaic rejects sub-128 minor-axis reshapes otherwise
    assert n % 128 == 0 and n >= 1024
    return n // 128


@functools.lru_cache(maxsize=None)
def fwd_ntt_fn(n: int, q: int, tile_p: int = DEFAULT_TILE_P,
               interpret: bool = False, psi: int | None = None):
    """Jitted fused forward NTT: (lo, hi) (B, n) u32 pairs, B % tile_p == 0."""
    plan = make_plan(n, q, _pick_n1(n), psi)
    kernel = _fwd_kernel(n, q, tile_p, plan)
    call = _make_call(kernel, plan["n1"], plan["n2"], tile_p,
                      _fwd_tabs(plan, tile_p), interpret)
    return jax.jit(call)


@functools.lru_cache(maxsize=None)
def inv_ntt_fn(n: int, q: int, tile_p: int = DEFAULT_TILE_P,
               interpret: bool = False, psi: int | None = None):
    plan = make_plan(n, q, _pick_n1(n), psi)
    kernel = _inv_kernel(n, q, tile_p, plan)
    call = _make_call(kernel, plan["n1"], plan["n2"], tile_p, _inv_tabs(plan),
                      interpret)
    return jax.jit(call)


@functools.lru_cache(maxsize=None)
def fwd_ntt_fn32(n: int, q: int, tile_p: int = DEFAULT_TILE_P,
                 interpret: bool = False, psi: int | None = None):
    """Jitted forward NTT on INTERLEAVED u32 input (B, 2n) -> (B, 2n).

    Zero-copy staging entry: the host views its u64 buffer as interleaved
    u32 (word64.to_interleaved_np — free) and the u64 split runs on-device;
    the worksize-batched `_NTT` executor path uses this so host staging is
    one DMA, not a numpy conversion pass."""
    call = raw_fwd_call(n, q, tile_p, psi=psi, interpret=interpret)

    def f(x32):
        lo, hi = w.deinterleave_jnp(x32)
        olo, ohi = call(lo, hi)
        return w.interleave_jnp(olo, ohi)

    return jax.jit(f)


@functools.lru_cache(maxsize=None)
def inv_ntt_fn32(n: int, q: int, tile_p: int = DEFAULT_TILE_P,
                 interpret: bool = False, psi: int | None = None):
    """Jitted inverse NTT on interleaved u32 input (see fwd_ntt_fn32)."""
    call = raw_inv_call(n, q, tile_p, psi=psi, interpret=interpret)

    def f(x32):
        lo, hi = w.deinterleave_jnp(x32)
        olo, ohi = call(lo, hi)
        return w.interleave_jnp(olo, ohi)

    return jax.jit(f)


def raw_fwd_call(n: int, q: int, tile_p: int = DEFAULT_TILE_P,
                 psi: int | None = None, interpret: bool = False,
                 canonical: bool = True, data_bits: int | None = None):
    """Unjitted fused-forward callable for composition inside a larger jit.

    canonical=False emits any-u64 representatives (the final Barrett is
    skipped) for consumers that reduce themselves — e.g. the keyswitch MAC's
    Harvey lazy multiply, which is exact for any u64 input.

    data_bits widens the input-limb coverage: the transform is mod-q-linear,
    so callers may feed UNREDUCED representatives up to 2^data_bits (e.g. a
    residue still canonical in a different modulus) and receive the exact
    NTT of (x mod q) — the Barrett pass that would otherwise sit in front
    of the kernel disappears entirely."""
    plan = make_plan(n, q, _pick_n1(n), psi, data_bits)
    kernel = _fwd_kernel(n, q, tile_p, plan, canonical)
    return _make_call(kernel, plan["n1"], plan["n2"], tile_p,
                      _fwd_tabs(plan, tile_p), interpret)


def raw_inv_call(n: int, q: int, tile_p: int = DEFAULT_TILE_P,
                 psi: int | None = None, interpret: bool = False,
                 canonical: bool = True):
    """Unjitted fused-inverse callable for composition inside a larger jit
    (see raw_fwd_call for the canonical flag)."""
    plan = make_plan(n, q, _pick_n1(n), psi)
    kernel = _inv_kernel(n, q, tile_p, plan, canonical)
    return _make_call(kernel, plan["n1"], plan["n2"], tile_p, _inv_tabs(plan),
                      interpret)


def raw_fwd_tail_call(n: int, q: int, fix: int, tile_p: int = DEFAULT_TILE_P,
                      psi: int | None = None, interpret: bool = False,
                      data_bits: int | None = None):
    """Fused keyswitch TAIL for one decomp modulus q_j: the reference's
    always-running ntt2->ms->store chain (`keyswitch/ntt2.hpp`,
    `keyswitch/ms.hpp:27-84`, `keyswitch/store.hpp`) as ONE kernel.

    call(e_lo, e_hi, acc_lo, acc_hi, res_lo, res_hi, msf4) -> (out_lo, out_hi)
      e:    (R, n) u32 pairs, R = comp*B rows (k-major) — the INTT2 output
            e = d + qk/2, canonical under q_k (same planes for every j);
      acc:  (R, n) LAZY u64 engine-MAC accumulators for q_j (< 2^56);
      res:  (R, n) caller ciphertext rows to accumulate into;
      msf4: (4,) uint32 [msf_lo, msf_hi, precon_lo, precon_hi] — the reduced
            modswitch factor and its Harvey precon (SMEM scalars, traced so
            msf changes don't recompile);
      out:  (R, n) canonical result rows.

    Fuses, per element and entirely in VMEM: the +fix prologue
    (`intt2_redu.hpp:30-58` — e + fix < q_k + q_j < 2^53 rides the
    wide-input transform unreduced), the forward NTT under q_j, the Barrett
    of the transform output AND of the lazy accumulator, the ms.hpp
    (acc + 4q - g) ReduceMod8, the modswitch multiply, and the host-style
    accumulate-into-ciphertext with one conditional subtract
    (`host/src/fpga.cpp:441-475`).  Unfused, each of these steps is its own
    HBM-bound XLA pass over (R, n) u32-pair planes."""
    plan = make_plan(n, q, _pick_n1(n), psi,
                     data_bits if data_bits is not None else 53)
    n1, n2 = plan["n1"], plan["n2"]
    c64, q_barr = int(plan["c64"]), int(plan["q_barr"])
    tabs = _fwd_tabs(plan, tile_p)

    def kernel(e_lo_ref, e_hi_ref, g1_ref, c1_ref, uw_lo, uw_hi, up_lo,
               up_hi, g2_ref, c2_ref, acc_lo_ref, acc_hi_ref, res_lo_ref,
               res_hi_ref, msf_ref, olo_ref, ohi_ref):
        # prologue: f = e + fix (constant add; stays < 2^53, unreduced)
        flo3, fhi3 = w.add64((e_lo_ref[:], e_hi_ref[:]), fix)
        vlo, vhi = _fwd_body(
            flo3, fhi3, g1_ref, c1_ref,
            uw_lo[:], uw_hi[:], up_lo[:], up_hi[:], g2_ref, c2_ref,
            q, n1, n2, tile_p, c64, q_barr, canonical=False,
        )
        g = _barrett_canonical((vlo, vhi), q, q_barr)
        acc = _barrett_canonical(
            (acc_lo_ref[:], acc_hi_ref[:]), q, q_barr
        )
        # ms.hpp:66-83 — (acc + 4q - g) in [0, 5q) reduced via ReduceMod8
        t1 = w.reduce_mod_factor(w.add64(w.sub64(acc, g), 4 * q), q, 8)
        # modswitch multiply by the traced msf scalar (Harvey lazy + one
        # conditional subtract == the exact static-Barrett result)
        msf = (msf_ref[0], msf_ref[1])
        mp = (msf_ref[2], msf_ref[3])
        delta = w.cond_sub64(w.mul_mod_lazy(t1, msf, mp, q), q)
        r_out = w.cond_sub64(
            w.add64((res_lo_ref[:], res_hi_ref[:]), delta), q
        )
        olo_ref[:] = r_out[0]
        ohi_ref[:] = r_out[1]

    def call(e_lo, e_hi, acc_lo, acc_hi, res_lo, res_hi, msf4):
        R = e_lo.shape[0]
        assert R % tile_p == 0
        grid = (R // tile_p,)
        data_spec = pl.BlockSpec(
            (tile_p, n1, n2), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        )
        full = [
            pl.BlockSpec(
                t.shape, (lambda nd: (lambda b: (0,) * nd))(t.ndim),
                memory_space=pltpu.VMEM,
            )
            for t in tabs
        ]
        msf_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[data_spec, data_spec] + full
            + [data_spec, data_spec, data_spec, data_spec, msf_spec],
            out_specs=[data_spec, data_spec],
            out_shape=[
                jax.ShapeDtypeStruct((R, n1, n2), jnp.uint32),
                jax.ShapeDtypeStruct((R, n1, n2), jnp.uint32),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )(
            e_lo.reshape(R, n1, n2), e_hi.reshape(R, n1, n2), *tabs,
            acc_lo.reshape(R, n1, n2), acc_hi.reshape(R, n1, n2),
            res_lo.reshape(R, n1, n2), res_hi.reshape(R, n1, n2),
            msf4,
        )
        return out[0].reshape(R, n), out[1].reshape(R, n)

    return call


def raw_fwd_mac_call(n: int, q: int, L: int, comp: int = 2,
                     tile_p: int = DEFAULT_TILE_P, skip_i: int | None = None,
                     psi: int | None = None, interpret: bool = False,
                     data_bits: int | None = None):
    """Fused forward-NTT + key-MAC: the keyswitch engine of `dyadmult.hpp`
    as ONE kernel.

    call(data_lo, data_hi, kw_lo, kw_hi, kp_lo, kp_hi) -> (acc_lo, acc_hi)
      data: (L*B, n) u32-pair planes, i-major (rows i*B..i*B+B-1 = source
            limb i's batch) — e.g. the stacked INTT1 outputs, UNREDUCED
            (pair with data_bits);
      keys/precons: (L, comp, n) planes (this modulus's key column);
      acc:  (comp, B, n) u64-pair representatives of
            sum_i lazy(NTT_q(data_i) * key[i, k])  (< 2q per term, < 2^56
            total for L <= 7) — Barrett-reduce downstream.

    The transform outputs never touch HBM: the grid runs (batch-tile, i)
    with i innermost, so each batch-tile's accumulator block stays resident
    in VMEM across all L source limbs (the VMEM analog of the reference's
    t_poly_lazy BRAM accumulators, `dyadmult.hpp:91-166`).  skip_i marks the
    identity source limb (i == j) whose contribution the caller adds from
    t_target directly."""
    # with skip_i set, some other grid step must initialize the accumulator:
    # at L == 1 the only step (i == 0 == skip_i) is predicated off and the
    # output block would be returned uninitialized — the caller's sole term
    # is the t_target identity limb, so it must not emit this kernel at all.
    assert skip_i is None or L >= 2, (
        "raw_fwd_mac_call with skip_i requires L >= 2 (at L == 1 the only "
        "grid step is skipped and the accumulator is never written)"
    )
    plan = make_plan(n, q, _pick_n1(n), psi, data_bits)
    n1, n2 = plan["n1"], plan["n2"]
    c64, q_barr = int(plan["c64"]), int(plan["q_barr"])
    tabs = _fwd_tabs(plan, tile_p)
    init_i = 1 if skip_i == 0 else 0

    def kernel(lo_ref, hi_ref, g1_ref, c1_ref, uw_lo, uw_hi, up_lo, up_hi,
               g2_ref, c2_ref, kw_lo, kw_hi, kp_lo, kp_hi,
               alo_ref, ahi_ref):
        i = pl.program_id(1)
        run = (i != skip_i) if skip_i is not None else (i >= 0)

        @pl.when(run)
        def _():
            olo, ohi = _fwd_body(
                lo_ref[:], hi_ref[:], g1_ref, c1_ref,
                uw_lo[:], uw_hi[:], up_lo[:], up_hi[:], g2_ref, c2_ref,
                q, n1, n2, tile_p, c64, q_barr, canonical=False,
            )
            for k in range(comp):
                key = (kw_lo[0, k][None], kw_hi[0, k][None])
                kp = (kp_lo[0, k][None], kp_hi[0, k][None])
                prod = w.mul_mod_lazy((olo, ohi), key, kp, q)

                @pl.when(i == init_i)
                def _():
                    alo_ref[k] = prod[0]
                    ahi_ref[k] = prod[1]

                @pl.when(i != init_i)
                def _():
                    s = w.add64((alo_ref[k], ahi_ref[k]), prod)
                    alo_ref[k] = s[0]
                    ahi_ref[k] = s[1]

    def call(lo, hi, kw_lo, kw_hi, kp_lo, kp_hi):
        LB = lo.shape[0]
        B = LB // L
        assert B % tile_p == 0
        bb = B // tile_p
        data_spec = pl.BlockSpec(
            (tile_p, n1, n2), lambda b, i: (i * bb + b, 0, 0),
            memory_space=pltpu.VMEM,
        )
        key_spec = pl.BlockSpec(
            (1, comp, n1, n2), lambda b, i: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
        acc_spec = pl.BlockSpec(
            (comp, tile_p, n1, n2), lambda b, i: (0, b, 0, 0),
            memory_space=pltpu.VMEM,
        )
        full = [
            pl.BlockSpec(
                t.shape, (lambda nd: (lambda b, i: (0,) * nd))(t.ndim),
                memory_space=pltpu.VMEM,
            )
            for t in tabs
        ]
        out = pl.pallas_call(
            kernel,
            grid=(bb, L),
            in_specs=[data_spec, data_spec] + full
            + [key_spec, key_spec, key_spec, key_spec],
            out_specs=[acc_spec, acc_spec],
            out_shape=[
                jax.ShapeDtypeStruct((comp, B, n1, n2), jnp.uint32),
                jax.ShapeDtypeStruct((comp, B, n1, n2), jnp.uint32),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
                dimension_semantics=("parallel", "arbitrary"),
            ),
            interpret=interpret,
        )(
            lo.reshape(LB, n1, n2), hi.reshape(LB, n1, n2),
            *tabs,
            kw_lo.reshape(L, comp, n1, n2), kw_hi.reshape(L, comp, n1, n2),
            kp_lo.reshape(L, comp, n1, n2), kp_hi.reshape(L, comp, n1, n2),
        )
        return out[0].reshape(comp, B, n), out[1].reshape(comp, B, n)

    return call


# numpy wrappers -------------------------------------------------------------


def _run(fn, a, q, tile_p):
    a = np.asarray(a, dtype=np.uint64)
    n = a.shape[-1]
    flat = a.reshape(-1, n)
    B = flat.shape[0]
    pad = (-B) % tile_p
    if pad:
        flat = np.concatenate([flat, np.zeros((pad, n), flat.dtype)])
    lo, hi = w.to_pair_np(flat)
    olo, ohi = call_with_retry(fn, lo, hi)
    return w.from_pair_np(np.asarray(olo), np.asarray(ohi))[:B].reshape(a.shape)


def fwd_ntt(a, q: int, tile_p: int = DEFAULT_TILE_P,
            interpret: bool = False) -> np.ndarray:
    n = np.asarray(a).shape[-1]
    return _run(fwd_ntt_fn(n, int(q), tile_p, interpret), a, q, tile_p)


def inv_ntt(a, q: int, tile_p: int = DEFAULT_TILE_P,
            interpret: bool = False) -> np.ndarray:
    n = np.asarray(a).shape[-1]
    return _run(inv_ntt_fn(n, int(q), tile_p, interpret), a, q, tile_p)
