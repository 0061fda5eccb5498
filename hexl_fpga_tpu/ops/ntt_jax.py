"""Batched negacyclic NTT/INTT as JAX programs on uint32 pairs.

This is the XLA-compiled compute path (the analog of the reference's
`device/fwd_ntt.cpp` / `device/inv_ntt.cpp` dataflow kernels, re-designed for
TPU): instead of a streaming radix-2 pipeline with VEC=8 butterflies/cycle,
each stage is a full-width vectorized butterfly pass over a (batch, n) array —
the batch dimension supplies the parallelism that the FPGA got from pipeline
depth, which is the natural TPU formulation (VPU lanes x batch).

The modulus is a *static* compile-time constant (one executable per (n, q),
mirroring the per-modulus fence semantics of the reference scheduler,
`host/src/fpga_int.cpp:263-273`), so all Barrett constants fold into the
program.  Outputs are bit-exact with the golden model for all
input/output_mod_factor=1 paths.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import nt, twiddles, word64 as w

Pair = Tuple[jnp.ndarray, jnp.ndarray]


@functools.lru_cache(maxsize=None)
def device_tables(n: int, q: int):
    """Twiddle tables as uint32-pair numpy arrays, cached per (n, q)."""
    t = twiddles.ntt_tables(n, q)
    return {
        "fwd": w.to_pair_np(t.fwd),
        "fwd_precon": w.to_pair_np(t.fwd_precon),
        "inv": w.to_pair_np(t.inv),
        "inv_precon": w.to_pair_np(t.inv_precon),
        "inv_n": int(t.inv_n),
        "inv_n_w": int(t.inv_n_w),
        "inv_n_precon": nt.barrett_factor(t.inv_n, 64, q),
        "inv_n_w_precon": nt.barrett_factor(t.inv_n_w, 64, q),
    }


def _stack_halves(X: Pair, Y: Pair, B, m, t, n) -> Pair:
    def one(xp, yp):
        return jnp.stack([xp, yp], axis=2).reshape(B, n)

    return one(X[0], Y[0]), one(X[1], Y[1])


def fwd_ntt_core(x: Pair, n: int, q: int, tabs=None) -> Pair:
    """Forward NTT over (B, n) uint32-pair arrays; canonical [0, q) output.

    Trace-time loop over log2(n) stages; each stage views the array as
    (B, m, 2, t) and runs the Harvey butterfly on the halves."""
    if tabs is None:
        tabs = device_tables(n, q)
    lo, hi = x
    B = lo.shape[0]
    fwd_lo, fwd_hi = tabs["fwd"]
    fp_lo, fp_hi = tabs["fwd_precon"]
    twice_q = 2 * q

    t = n >> 1
    m = 1
    while m < n:
        vlo = lo.reshape(B, m, 2, t)
        vhi = hi.reshape(B, m, 2, t)
        X = (vlo[:, :, 0, :], vhi[:, :, 0, :])
        Y = (vlo[:, :, 1, :], vhi[:, :, 1, :])
        W = (
            jnp.asarray(fwd_lo[m : 2 * m]).reshape(1, m, 1),
            jnp.asarray(fwd_hi[m : 2 * m]).reshape(1, m, 1),
        )
        Wp = (
            jnp.asarray(fp_lo[m : 2 * m]).reshape(1, m, 1),
            jnp.asarray(fp_hi[m : 2 * m]).reshape(1, m, 1),
        )
        tx = w.cond_sub64(X, twice_q)
        T = w.mul_mod_lazy(Y, W, Wp, q)
        newX = w.add64(tx, T)
        newY = w.sub64(w.add64(tx, twice_q), T)
        lo, hi = _stack_halves(newX, newY, B, m, t, n)
        m <<= 1
        t >>= 1

    out = w.cond_sub64(w.cond_sub64((lo, hi), twice_q), q)
    return out


def inv_ntt_core(x: Pair, n: int, q: int, tabs=None) -> Pair:
    """Inverse NTT incl. n^{-1} normalization; canonical [0, q) output."""
    if tabs is None:
        tabs = device_tables(n, q)
    lo, hi = x
    B = lo.shape[0]
    inv_lo, inv_hi = tabs["inv"]
    ip_lo, ip_hi = tabs["inv_precon"]
    twice_q = 2 * q

    t = 1
    root_index = 1
    m = n >> 1
    while m > 1:
        vlo = lo.reshape(B, m, 2, t)
        vhi = hi.reshape(B, m, 2, t)
        X = (vlo[:, :, 0, :], vhi[:, :, 0, :])
        Y = (vlo[:, :, 1, :], vhi[:, :, 1, :])
        W = (
            jnp.asarray(inv_lo[root_index : root_index + m]).reshape(1, m, 1),
            jnp.asarray(inv_hi[root_index : root_index + m]).reshape(1, m, 1),
        )
        Wp = (
            jnp.asarray(ip_lo[root_index : root_index + m]).reshape(1, m, 1),
            jnp.asarray(ip_hi[root_index : root_index + m]).reshape(1, m, 1),
        )
        root_index += m
        tx = w.add64(X, Y)
        ty = w.sub64(w.add64(X, twice_q), Y)
        newX = w.cond_sub64(tx, twice_q)
        newY = w.mul_mod_lazy(ty, W, Wp, q)
        lo, hi = _stack_halves(newX, newY, B, m, t, n)
        t <<= 1
        m >>= 1

    # fused last stage: X half scaled by n^{-1}, Y half by n^{-1} * W_last
    h = n >> 1
    X = (lo[:, :h], hi[:, :h])
    Y = (lo[:, h:], hi[:, h:])
    tx = w.cond_sub64(w.add64(X, Y), twice_q)
    ty = w.sub64(w.add64(X, twice_q), Y)
    newX = w.mul_mod_lazy(tx, tabs["inv_n"], tabs["inv_n_precon"], q)
    newY = w.mul_mod_lazy(ty, tabs["inv_n_w"], tabs["inv_n_w_precon"], q)
    lo = jnp.concatenate([newX[0], newY[0]], axis=1)
    hi = jnp.concatenate([newX[1], newY[1]], axis=1)
    return w.cond_sub64((lo, hi), q)


# ---------------------------------------------------------------------------
# jitted entry points + numpy convenience wrappers
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _fwd_jit(n: int, q: int):
    return jax.jit(lambda lo, hi: fwd_ntt_core((lo, hi), n, q))


@functools.lru_cache(maxsize=None)
def _inv_jit(n: int, q: int):
    return jax.jit(lambda lo, hi: inv_ntt_core((lo, hi), n, q))


@functools.lru_cache(maxsize=None)
def _fwd_jit_tables(n: int, q: int, digest: int):
    tabs = _TABLE_STASH.pop((n, q, digest), None)
    assert tabs is not None, "table stash missing (internal error)"
    return jax.jit(lambda lo, hi: fwd_ntt_core((lo, hi), n, q, tabs))


@functools.lru_cache(maxsize=None)
def _inv_jit_tables(n: int, q: int, digest: int):
    tabs = _TABLE_STASH.pop((n, q, digest), None)
    assert tabs is not None, "table stash missing (internal error)"
    return jax.jit(lambda lo, hi: inv_ntt_core((lo, hi), n, q, tabs))


_TABLE_STASH: dict = {}


def fwd_ntt_with_tables(a, q: int, root_of_unity_powers, precon) -> np.ndarray:
    """Forward NTT using *caller-supplied* twiddle tables (golden layout), the
    deprecated `_NTT` API path (`host/inc/hexl-fpga.h:115-118`)."""
    a = np.asarray(a, dtype=np.uint64)
    n = a.shape[-1]
    fwd = np.ascontiguousarray(root_of_unity_powers, dtype=np.uint64)
    fp = np.ascontiguousarray(precon, dtype=np.uint64)
    digest = hash((fwd.tobytes(), fp.tobytes()))
    key = (n, int(q), digest)
    _TABLE_STASH.setdefault(
        key, {"fwd": w.to_pair_np(fwd), "fwd_precon": w.to_pair_np(fp)}
    )
    fn = _fwd_jit_tables(n, int(q), digest)
    lo, hi = w.to_pair_np(a.reshape(-1, n))
    olo, ohi = fn(lo, hi)
    return w.from_pair_np(np.asarray(olo), np.asarray(ohi)).reshape(a.shape)


def inv_ntt_with_tables(
    a, q: int, inv_root_of_unity_powers, precon, inv_n: int, inv_n_w: int
) -> np.ndarray:
    """Inverse NTT using caller tables + explicit inv_n / inv_n_w, the
    deprecated `_INTT` API path (`host/inc/hexl-fpga.h:150-154`)."""
    a = np.asarray(a, dtype=np.uint64)
    n = a.shape[-1]
    inv = np.ascontiguousarray(inv_root_of_unity_powers, dtype=np.uint64)
    ip = np.ascontiguousarray(precon, dtype=np.uint64)
    digest = hash((inv.tobytes(), ip.tobytes(), int(inv_n), int(inv_n_w)))
    key = (n, int(q), digest)
    _TABLE_STASH.setdefault(
        key,
        {
            "inv": w.to_pair_np(inv),
            "inv_precon": w.to_pair_np(ip),
            "inv_n": int(inv_n),
            "inv_n_w": int(inv_n_w),
            "inv_n_precon": nt.barrett_factor(int(inv_n), 64, int(q)),
            "inv_n_w_precon": nt.barrett_factor(int(inv_n_w), 64, int(q)),
        },
    )
    fn = _inv_jit_tables(n, int(q), digest)
    lo, hi = w.to_pair_np(a.reshape(-1, n))
    olo, ohi = fn(lo, hi)
    return w.from_pair_np(np.asarray(olo), np.asarray(ohi)).reshape(a.shape)


def fwd_ntt(a, q: int) -> np.ndarray:
    """numpy u64 (..., n) -> forward NTT, canonical output."""
    a = np.asarray(a, dtype=np.uint64)
    n = a.shape[-1]
    shape = a.shape
    lo, hi = w.to_pair_np(a.reshape(-1, n))
    olo, ohi = _fwd_jit(n, int(q))(lo, hi)
    return w.from_pair_np(np.asarray(olo), np.asarray(ohi)).reshape(shape)


def inv_ntt(a, q: int) -> np.ndarray:
    a = np.asarray(a, dtype=np.uint64)
    n = a.shape[-1]
    shape = a.shape
    lo, hi = w.to_pair_np(a.reshape(-1, n))
    olo, ohi = _inv_jit(n, int(q))(lo, hi)
    return w.from_pair_np(np.asarray(olo), np.asarray(ohi)).reshape(shape)
