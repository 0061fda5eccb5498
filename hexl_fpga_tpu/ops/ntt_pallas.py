"""Pallas TPU kernels for the batched negacyclic NTT/INTT.

Design (TPU-native, not a translation of `device/fwd_ntt.cpp`):

* One kernel invocation keeps a (TILE_B, n) tile of polynomials resident in
  VMEM across *all* log2(n) butterfly stages — a single HBM read + write per
  poly, vs one round trip per stage for a stage-by-stage XLA program.  This
  is the TPU analog of the FPGA's on-chip BRAM ping-pong
  (`fwd_ntt.cpp:85-96`).

* Data is viewed as (TILE_B, R, 128) with R = n/128, logical index
  j = r*128 + l (l = lane).  Every stage is a *masked-roll butterfly*: the
  partner at distance t is fetched with a circular roll — along the sublane
  (row) axis for t >= 128 (shift t/128), along the lane axis for t < 128
  (shift t) — and a parity mask on bit t of the index selects the X/Y update.
  This shape-uniform formulation avoids reshapes/relayouts entirely (Mosaic
  compiles the whole 14-stage pipeline in one kernel; per-stage reshape
  variants blow up the compiler at R >= 32).  It mirrors the split the FPGA
  makes at t < VEC (`fwd_ntt.cpp:199-280`) — strides above the vector width
  are address swizzles, strides below are lane shuffles.

* Twiddles are position-expanded on the host into one (S, R, 128) stack per
  table (entry [s, r, l] = W[stage_offset_s + (j >> (log2 t_s + 1))]), so the
  kernel's butterfly is branch-free elementwise VPU code.

* All 64-bit values are uint32 (lo, hi) plane pairs (see ops/word64.py);
  the modulus is compile-time static so Barrett constants fold.

Bit-exact with the golden model (canonical [0, q) outputs).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import nt, twiddles, word64 as w
from ..utils.retry import call_with_retry

LANES = 128
MIN_N = 1024  # below this the jnp path is used
DEFAULT_TILE_B = 8


# ---------------------------------------------------------------------------
# host-side twiddle preparation
# ---------------------------------------------------------------------------


def _expand_pos_tables(table: np.ndarray, n: int, offsets_and_m) -> np.ndarray:
    """Position-expanded twiddles: for each stage (offset, m) produce an
    (R, 128) array with entry [r, l] = table[offset + ((r*128 + l) // (n/m))]
    — the per-element block twiddle, identical for both butterfly partners."""
    R = n // LANES
    out = np.zeros((len(offsets_and_m), R, LANES), dtype=np.uint64)
    j = np.arange(n).reshape(R, LANES)
    for s, (offset, m) in enumerate(offsets_and_m):
        block = j // (n // m)
        out[s] = table[offset + block]
    return out


@functools.lru_cache(maxsize=None)
def fwd_plan(n: int, q: int):
    t = twiddles.ntt_tables(n, q)
    return _fwd_plan_from_tables(n, q, t.fwd, t.fwd_precon)


def _fwd_plan_from_tables(n: int, q: int, fwd: np.ndarray, fwd_precon: np.ndarray):
    # forward stage s: m = 2^s, table offset m (W[m + i]); s = 0..log2(n)-1
    offs = [(1 << s, 1 << s) for s in range(nt.log2_exact(n))]
    pos = _expand_pos_tables(fwd, n, offs)
    posp = _expand_pos_tables(fwd_precon, n, offs)
    return {"pos": w.to_pair_np(pos), "posp": w.to_pair_np(posp)}


@functools.lru_cache(maxsize=None)
def inv_plan(n: int, q: int):
    t = twiddles.ntt_tables(n, q)
    return _inv_plan_from_tables(n, q, t.inv, t.inv_precon, t.inv_n, t.inv_n_w)


def _inv_plan_from_tables(n, q, inv, inv_precon, inv_n, inv_n_w):
    # inverse stage order: m = n/2 (t=1) ... m = 2 (t = n/4); the golden-layout
    # table offset for stage m is root_index = 1 + sum of later m's.
    offs = []
    root_index = 1
    m = n >> 1
    while m > 1:
        offs.append((root_index, m))
        root_index += m
        m >>= 1
    pos = _expand_pos_tables(inv, n, offs)
    posp = _expand_pos_tables(inv_precon, n, offs)
    return {
        "pos": w.to_pair_np(pos),
        "posp": w.to_pair_np(posp),
        "inv_n": int(inv_n),
        "inv_n_w": int(inv_n_w),
        "inv_n_precon": nt.barrett_factor(int(inv_n), 64, q),
        "inv_n_w_precon": nt.barrett_factor(int(inv_n_w), 64, q),
    }


# ---------------------------------------------------------------------------
# kernel stage bodies
# ---------------------------------------------------------------------------


def _roll_pair(x, shift: int, axis: int):
    size = x[0].shape[axis]
    s = shift % size
    return (
        pltpu.roll(x[0], shift=s, axis=axis),
        pltpu.roll(x[1], shift=s, axis=axis),
    )


def _parity_mask(shape, t: int):
    """True where bit `t` of the logical index j = r*128 + l is clear (the X
    half of each butterfly pair)."""
    if t >= LANES:
        idx = jax.lax.broadcasted_iota(jnp.uint32, shape, dimension=1)
        bit = t // LANES
    else:
        idx = jax.lax.broadcasted_iota(jnp.uint32, shape, dimension=2)
        bit = t
    return (idx & bit) == 0


def _stage_tables(posw, poswp, s: int):
    return (posw[0][s], posw[1][s]), (poswp[0][s], poswp[1][s])


def _fwd_stage(x, s: int, t: int, posw, poswp, q: int):
    """One forward Harvey butterfly stage as a masked roll.

    T[j] = lazy(x[j] * W_block(j)); X rows take T from the partner (roll by
    -shift), Y rows their own; tx is the [0,2q) fold of the X element."""
    axis, shift = (1, t // LANES) if t >= LANES else (2, t)
    W, Wp = _stage_tables(posw, poswp, s)
    T = w.mul_mod_lazy(x, W, Wp, q)
    T_up = _roll_pair(T, -shift, axis)
    x_dn = _roll_pair(x, shift, axis)
    tx_self = w.cond_sub64(x, 2 * q)
    tx_down = w.cond_sub64(x_dn, 2 * q)
    nX = w.add64(tx_self, T_up)
    nY = w.sub64(w.add64(tx_down, 2 * q), T)
    return w.select64(_parity_mask(x[0].shape, t), nX, nY)


def _inv_stage(x, s: int, t: int, posw, poswp, q: int):
    """One inverse (Gentleman-Sande) stage as a masked roll.

    X rows: (x + x[partner]) folded to [0,2q); Y rows: lazy((x[partner] + 2q
    - x) * W)."""
    axis, shift = (1, t // LANES) if t >= LANES else (2, t)
    W, Wp = _stage_tables(posw, poswp, s)
    x_up = _roll_pair(x, -shift, axis)
    x_dn = _roll_pair(x, shift, axis)
    nX = w.cond_sub64(w.add64(x, x_up), 2 * q)
    ty = w.sub64(w.add64(x_dn, 2 * q), x)
    nY = w.mul_mod_lazy(ty, W, Wp, q)
    return w.select64(_parity_mask(x[0].shape, t), nX, nY)


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------


def _fwd_kernel(n: int, q: int, tile_b: int):
    R = n // LANES
    logn = nt.log2_exact(n)

    def kernel(lo_ref, hi_ref, pw_lo, pw_hi, pp_lo, pp_hi, out_lo, out_hi):
        x = (
            lo_ref[:].reshape(tile_b, R, LANES),
            hi_ref[:].reshape(tile_b, R, LANES),
        )
        posw = (pw_lo[:], pw_hi[:])
        poswp = (pp_lo[:], pp_hi[:])
        for s in range(logn):
            t = n >> (s + 1)
            x = _fwd_stage(x, s, t, posw, poswp, q)
        x = w.cond_sub64(w.cond_sub64(x, 2 * q), q)
        out_lo[:] = x[0].reshape(tile_b, n)
        out_hi[:] = x[1].reshape(tile_b, n)

    return kernel


def _inv_kernel(n: int, q: int, tile_b: int, plan):
    R = n // LANES
    logn = nt.log2_exact(n)

    def kernel(lo_ref, hi_ref, pw_lo, pw_hi, pp_lo, pp_hi, out_lo, out_hi):
        x = (
            lo_ref[:].reshape(tile_b, R, LANES),
            hi_ref[:].reshape(tile_b, R, LANES),
        )
        posw = (pw_lo[:], pw_hi[:])
        poswp = (pp_lo[:], pp_hi[:])
        for s in range(logn - 1):
            t = 1 << s
            x = _inv_stage(x, s, t, posw, poswp, q)
        # fused final stage (m = 1, t = n/2) as a masked row-roll: X half
        # (rows r < R/2) scaled by n^{-1}, Y half by n^{-1} * W_last
        h = R >> 1
        x_up = _roll_pair(x, -h, 1)
        x_dn = _roll_pair(x, h, 1)
        tx = w.cond_sub64(w.add64(x, x_up), 2 * q)
        ty = w.sub64(w.add64(x_dn, 2 * q), x)
        nX = w.mul_mod_lazy(tx, plan["inv_n"], plan["inv_n_precon"], q)
        nY = w.mul_mod_lazy(ty, plan["inv_n_w"], plan["inv_n_w_precon"], q)
        out = w.select64(_parity_mask(x[0].shape, (n >> 1)), nX, nY)
        out = w.cond_sub64(out, q)
        out_lo[:] = out[0].reshape(tile_b, n)
        out_hi[:] = out[1].reshape(tile_b, n)

    return kernel


def _make_call(kernel, n: int, tile_b: int, interpret: bool):
    def call(lo, hi, *tables):
        B = lo.shape[0]
        grid = (B // tile_b,)
        data_spec = pl.BlockSpec(
            (tile_b, n), lambda b: (b, 0), memory_space=pltpu.VMEM
        )
        full = [
            pl.BlockSpec(
                tb.shape,
                (lambda nd: (lambda b: (0,) * nd))(tb.ndim),
                memory_space=pltpu.VMEM,
            )
            for tb in tables
        ]
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[data_spec, data_spec] + full,
            out_specs=[data_spec, data_spec],
            out_shape=[
                jax.ShapeDtypeStruct((B, n), jnp.uint32),
                jax.ShapeDtypeStruct((B, n), jnp.uint32),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )(lo, hi, *tables)

    return call


def _pos_tables(plan):
    return (
        plan["pos"][0], plan["pos"][1],
        plan["posp"][0], plan["posp"][1],
    )


@functools.lru_cache(maxsize=None)
def fwd_ntt_fn(n: int, q: int, tile_b: int = DEFAULT_TILE_B, interpret: bool = False):
    """Jitted forward-NTT pallas entry: (lo, hi) of shape (B, n), B % tile_b == 0."""
    assert n >= MIN_N and n % LANES == 0
    plan = fwd_plan(n, q)
    tables = tuple(jnp.asarray(t) for t in _pos_tables(plan))
    call = _make_call(_fwd_kernel(n, q, tile_b), n, tile_b, interpret)
    return jax.jit(lambda lo, hi: tuple(call(lo, hi, *tables)))


@functools.lru_cache(maxsize=None)
def inv_ntt_fn(n: int, q: int, tile_b: int = DEFAULT_TILE_B, interpret: bool = False):
    assert n >= MIN_N and n % LANES == 0
    plan = inv_plan(n, q)
    tables = tuple(jnp.asarray(t) for t in _pos_tables(plan))
    call = _make_call(_inv_kernel(n, q, tile_b, plan), n, tile_b, interpret)
    return jax.jit(lambda lo, hi: tuple(call(lo, hi, *tables)))


def raw_fwd_call(n: int, q: int, tile_b: int = DEFAULT_TILE_B,
                 interpret: bool = False):
    """Unjitted forward callable for composition inside a larger jit."""
    assert n >= MIN_N and n % LANES == 0
    plan = fwd_plan(n, q)
    tables = tuple(jnp.asarray(t) for t in _pos_tables(plan))
    call = _make_call(_fwd_kernel(n, q, tile_b), n, tile_b, interpret)
    return lambda lo, hi: tuple(call(lo, hi, *tables))


# numpy convenience wrappers ---------------------------------------------------


def _pad_batch(a: np.ndarray, tile_b: int):
    B = a.shape[0]
    pad = (-B) % tile_b
    if pad:
        a = np.concatenate([a, np.zeros((pad,) + a.shape[1:], a.dtype)])
    return a, B


def fwd_ntt(a, q: int, tile_b: int = DEFAULT_TILE_B, interpret: bool = False) -> np.ndarray:
    a = np.asarray(a, dtype=np.uint64)
    n = a.shape[-1]
    flat = a.reshape(-1, n)
    padded, B = _pad_batch(flat, tile_b)
    lo, hi = w.to_pair_np(padded)
    olo, ohi = call_with_retry(fwd_ntt_fn(n, int(q), tile_b, interpret), lo, hi)
    out = w.from_pair_np(np.asarray(olo), np.asarray(ohi))[:B]
    return out.reshape(a.shape)


def inv_ntt(a, q: int, tile_b: int = DEFAULT_TILE_B, interpret: bool = False) -> np.ndarray:
    a = np.asarray(a, dtype=np.uint64)
    n = a.shape[-1]
    flat = a.reshape(-1, n)
    padded, B = _pad_batch(flat, tile_b)
    lo, hi = w.to_pair_np(padded)
    olo, ohi = call_with_retry(inv_ntt_fn(n, int(q), tile_b, interpret), lo, hi)
    out = w.from_pair_np(np.asarray(olo), np.asarray(ohi))[:B]
    return out.reshape(a.shape)
