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

from . import nt, word64 as w
from .ntt_mxu import NLIMB, make_plan
from ..utils.retry import call_with_retry

Pair = Tuple[jnp.ndarray, jnp.ndarray]

DEFAULT_TILE_P = 4


# ---------------------------------------------------------------------------
# in-kernel helpers (operate on jnp values inside the kernel trace)
# ---------------------------------------------------------------------------


def _limbs_axis0(lo, hi):
    """(K, C) u32 pair -> int8 limbs (NLIMB*K, C) and uint-rowsum (1, C)."""
    limbs = []
    for t in range(NLIMB):
        v = ((lo >> (8 * t)) & 0xFF) if t < 4 else ((hi >> (8 * (t - 4))) & 0xFF)
        limbs.append(v)
    u = jnp.concatenate(limbs, axis=0)
    rowsum = sum(l.astype(jnp.int32).sum(axis=0, keepdims=True) for l in limbs)
    return (u.astype(jnp.int32) - 128).astype(jnp.int8), rowsum


def _limbs_axis1(lo, hi):
    """(R, C) u32 pair -> int8 limbs (R, NLIMB*C) and uint-rowsum (R, 1)."""
    limbs = []
    for t in range(NLIMB):
        v = ((lo >> (8 * t)) & 0xFF) if t < 4 else ((hi >> (8 * (t - 4))) & 0xFF)
        limbs.append(v)
    u = jnp.concatenate(limbs, axis=1)
    rowsum = sum(l.astype(jnp.int32).sum(axis=1, keepdims=True) for l in limbs)
    return (u.astype(jnp.int32) - 128).astype(jnp.int8), rowsum


def _acc_step(acc, S, wlo, whi):
    """acc (3 u32 limbs) += S * (wlo, whi); S < 2^26 nonneg, W < 2^52."""
    acc0, acc1, acc2 = acc
    Su = S.astype(jnp.uint32)
    p0, p1 = w.mul32(Su, wlo)
    r1, r2 = w.mul32(Su, whi)
    s0 = acc0 + p0
    c0 = (s0 < acc0).astype(jnp.uint32)
    t1 = p1 + r1
    ct = (t1 < p1).astype(jnp.uint32)
    s1 = acc1 + t1
    c1 = (s1 < acc1).astype(jnp.uint32)
    s1b = s1 + c0
    c1b = (s1b < s1).astype(jnp.uint32)
    return s0, s1b, acc2 + r2 + ct + c1 + c1b


def _final_reduce(acc, q: int, c64: int, q_barr: int):
    """(acc0, acc1, acc2) = V < 2^96-ish -> V mod q canonical."""
    acc0, acc1, acc2 = acc
    v = (acc0, acc1)
    top = acc2
    # one wide fold: top < 2^18, top*c64 < 2^70 (3 u32 limbs); afterwards the
    # residual top is < 2^7, so a single exact u64 fold finishes the job
    t = w.mul64_full((top, jnp.zeros_like(top)), w.const_pair(c64))
    s = w.add64(v, (t[0], t[1]))
    carry = w.lt64(s, v).astype(jnp.uint32)
    v = s
    top = t[2] + carry
    t = w.mullo64((top, jnp.zeros_like(top)), c64)
    s = w.add64(v, t)
    carry = w.lt64(s, v)
    v = w.select64(carry, w.add64(s, c64), s)
    Q = w.mulhi64(v, q_barr)
    r = w.sub64(v, w.mullo64(Q, q))
    return w.cond_sub64(w.cond_sub64(r, q), q)


def _zero_acc(S):
    z = jnp.zeros_like(S, jnp.uint32)
    return (z, jnp.zeros_like(z), jnp.zeros_like(z))


def _stage_left_inkernel(lo, hi, g_ref, corr_ref, q, c64, q_barr, w_tables=None,
                         scalar_consts=None, P=None, n2=None):
    """(K, C) u32 pair -> (n_out, C): left matmul + recombine.

    With w_tables, recombination runs in (n_out, P, n2) shape so the (m, j2)
    table broadcasts along the poly axis without materialization."""
    a, rowsum = _limbs_axis0(lo, hi)
    acc = None
    for s in range(NLIMB):
        dot = jax.lax.dot_general(
            g_ref[s], a,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        S = dot + corr_ref[s][:, None] + 128 * rowsum
        if w_tables is not None:
            S = S.reshape(S.shape[0], P, n2)
            wlo3 = w_tables[0][s][:, None, :]
            whi3 = w_tables[1][s][:, None, :]
        else:
            wlo3, whi3 = scalar_consts[s]
        acc = _acc_step(acc if acc is not None else _zero_acc(S), S, wlo3, whi3)
    out = _final_reduce(acc, q, c64, q_barr)
    if w_tables is not None:
        return out[0].reshape(out[0].shape[0], -1), out[1].reshape(
            out[1].shape[0], -1
        )
    return out


def _stage_right_inkernel(lo, hi, g_ref, corr_ref, q, c64, q_barr,
                          w_tables=None, scalar_consts=None, n1=None):
    """(R, C) u32 pair -> (R, n_out): right matmul + recombine.

    With w_tables (7, n1, n_out), rows are (p, m1) with m1 minor; the
    recombination runs in (P, n1, n_out) shape so the table broadcasts along
    the poly axis."""
    a, rowsum = _limbs_axis1(lo, hi)
    R = lo.shape[0]
    acc = None
    for s in range(NLIMB):
        dot = jax.lax.dot_general(
            a, g_ref[s],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        S = dot + corr_ref[s][None, :] + 128 * rowsum
        if w_tables is not None:
            S = S.reshape(R // n1, n1, S.shape[1])
            wlo3 = w_tables[0][s][None, :, :]
            whi3 = w_tables[1][s][None, :, :]
        else:
            wlo3, whi3 = scalar_consts[s]
        acc = _acc_step(acc if acc is not None else _zero_acc(S), S, wlo3, whi3)
    out = _final_reduce(acc, q, c64, q_barr)
    if w_tables is not None:
        return out[0].reshape(R, -1), out[1].reshape(R, -1)
    return out


def _scalar_consts(q: int):
    """(wlo, whi) uint32 numpy scalars for W_s = 2^{8s} mod q."""
    out = []
    for s in range(NLIMB):
        c = pow(2, 8 * s, q)
        out.append((np.uint32(c & 0xFFFFFFFF), np.uint32(c >> 32)))
    return out


# ---------------------------------------------------------------------------
# fused kernels
# ---------------------------------------------------------------------------


def _fwd_kernel(n: int, q: int, tile_p: int, plan):
    # Dataflow keeps the lane (minor) axis aligned through both stages —
    # j2 -> j2 -> m2 — so the only data movements are cheap major-axis swaps:
    #   in (P, n1, n2) --(1,0,2)--> (n1, P*n2)   stage-1 LEFT matmul (over j1)
    #   (n1, P*n2) == ((m1,p), n2) view          stage-2 RIGHT matmul (over j2)
    #   out ((m1,p), m2) --(1,0,2)--> (P, n1, n2)
    # The U twiddle is host-pre-tiled to (7, n1, P*n2) so recombination is a
    # plain same-shape elementwise multiply (no in-kernel broadcast).
    n1, n2 = plan["n1"], plan["n2"]
    c64, q_barr = int(plan["c64"]), int(plan["q_barr"])
    consts = _scalar_consts(q)

    def kernel(lo_ref, hi_ref, g1_ref, c1_ref, w1lo_ref, w1hi_ref,
               g2_ref, c2_ref, olo_ref, ohi_ref):
        lo = jnp.transpose(lo_ref[:], (1, 0, 2)).reshape(n1, tile_p * n2)
        hi = jnp.transpose(hi_ref[:], (1, 0, 2)).reshape(n1, tile_p * n2)
        a, rowsum = _limbs_axis0(lo, hi)
        acc = None
        for s in range(NLIMB):
            dot = jax.lax.dot_general(
                g1_ref[s], a,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            S = dot + c1_ref[s][:, None] + 128 * rowsum
            acc = _acc_step(acc if acc is not None else _zero_acc(S), S,
                            w1lo_ref[s], w1hi_ref[s])
        clo, chi = _final_reduce(acc, q, c64, q_barr)
        # (n1, P*n2) == (n1*P, n2) view: stage-2 contraction on minor axis
        olo, ohi = _stage_right_inkernel(
            clo.reshape(n1 * tile_p, n2), chi.reshape(n1 * tile_p, n2),
            g2_ref, c2_ref, q, c64, q_barr, scalar_consts=consts,
        )
        olo_ref[:] = jnp.transpose(olo.reshape(n1, tile_p, n2), (1, 0, 2))
        ohi_ref[:] = jnp.transpose(ohi.reshape(n1, tile_p, n2), (1, 0, 2))

    return kernel


def _inv_kernel(n: int, q: int, tile_p: int, plan):
    n1, n2 = plan["n1"], plan["n2"]
    c64, q_barr = int(plan["c64"]), int(plan["q_barr"])
    consts = _scalar_consts(q)

    def kernel(lo_ref, hi_ref, g1_ref, c1_ref, w1lo_ref, w1hi_ref,
               g2_ref, c2_ref, olo_ref, ohi_ref):
        # stage 1: right matmul on (P*n1, n2), V table indexed by row % n1
        lo = lo_ref[:].reshape(tile_p * n1, n2)
        hi = hi_ref[:].reshape(tile_p * n1, n2)
        plo, phi = _stage_right_inkernel(
            lo, hi, g1_ref, c1_ref, q, c64, q_barr,
            w_tables=(w1lo_ref, w1hi_ref), n1=n1,
        )
        # stage 2: left matmul over m1: (P, n1, n2) -> (n1, P*n2)
        plo = jnp.transpose(plo.reshape(tile_p, n1, n2), (1, 0, 2)).reshape(
            n1, tile_p * n2
        )
        phi = jnp.transpose(phi.reshape(tile_p, n1, n2), (1, 0, 2)).reshape(
            n1, tile_p * n2
        )
        olo, ohi = _stage_left_inkernel(
            plo, phi, g2_ref, c2_ref, q, c64, q_barr, scalar_consts=consts,
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
    # U table pre-tiled to the kernel's (n1, P*n2) working shape
    def tile(t):
        return np.ascontiguousarray(
            np.broadcast_to(t[:, :, None, :], (NLIMB, n1, tile_p, n2)).reshape(
                NLIMB, n1, tile_p * n2
            )
        )
    return (
        jnp.asarray(g1), jnp.asarray(c1),
        jnp.asarray(tile(plan["f1_w"][0])), jnp.asarray(tile(plan["f1_w"][1])),
        jnp.asarray(g2), jnp.asarray(c2),
    )


def _inv_tabs(plan):
    g1, c1 = plan["i1"]
    g2, c2 = plan["i2"]
    return (
        jnp.asarray(g1), jnp.asarray(c1),
        jnp.asarray(plan["i1_w"][0]), jnp.asarray(plan["i1_w"][1]),
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


def raw_fwd_call(n: int, q: int, tile_p: int = DEFAULT_TILE_P,
                 psi: int | None = None, interpret: bool = False):
    """Unjitted fused-forward callable for composition inside a larger jit."""
    plan = make_plan(n, q, _pick_n1(n), psi)
    kernel = _fwd_kernel(n, q, tile_p, plan)
    return _make_call(kernel, plan["n1"], plan["n2"], tile_p,
                      _fwd_tabs(plan, tile_p), interpret)


def raw_inv_call(n: int, q: int, tile_p: int = DEFAULT_TILE_P,
                 psi: int | None = None, interpret: bool = False):
    """Unjitted fused-inverse callable for composition inside a larger jit."""
    plan = make_plan(n, q, _pick_n1(n), psi)
    kernel = _inv_kernel(n, q, tile_p, plan)
    return _make_call(kernel, plan["n1"], plan["n2"], tile_p, _inv_tabs(plan),
                      interpret)


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
