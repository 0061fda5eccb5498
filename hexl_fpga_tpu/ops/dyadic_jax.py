"""Dyadic (ciphertext x ciphertext) multiplication as a JAX program.

Replaces the reference's 5-kernel FPGA dataflow
(`device/dyadic_multiply.cpp:61-342`: input_fifo -> operands_fetcher ->
dyadic_multiply_eu -> output_nb_fifo) with a single fused elementwise pass:
on TPU the DDR repacking/FIFO machinery is unnecessary — XLA streams
HBM->VMEM tiles and the VPU computes all three output polynomials in one
kernel.  Math follows `dyadic_multiply_eu_kernel` (`:195-228`):
    out0 = x0*y0, out1 = x0*y1 + x1*y0, out2 = x1*y1   (mod each modulus)
with the reference's MultMod Barrett recipe (per-op moduli are runtime data,
so the traced-modulus path of word64 is used with the host-precomputed
(len, barr_lo) metadata of FPGAObject_DyadicMultiply::fill_in_data,
`host/src/fpga.cpp:355-391`)."""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import word64 as w

Pair = Tuple[jnp.ndarray, jnp.ndarray]


def dyadic_multiply_core(op1: Pair, op2: Pair, q: Pair, barr: Pair, length) -> Pair:
    """op1/op2: (..., 2, M, N) pairs; q/barr/length: (..., M, 1) broadcastable.

    Returns (..., 3, M, N) pair."""

    def poly(p, i):
        return (p[0][..., i, :, :], p[1][..., i, :, :])

    x0, x1 = poly(op1, 0), poly(op1, 1)
    y0, y1 = poly(op2, 0), poly(op2, 1)

    def mm(a, b):
        return w.mul_mod_traced(a, b, q, barr, length)

    out0 = mm(x0, y0)
    # x0*y1 + x1*y0 mod q: both products canonical, AddUIntMod
    p01 = mm(x0, y1)
    p10 = mm(x1, y0)
    out1 = w.cond_sub64(w.add64(p01, p10), q)
    out2 = mm(x1, y1)

    lo = jnp.stack([out0[0], out1[0], out2[0]], axis=-3)
    hi = jnp.stack([out0[1], out1[1], out2[1]], axis=-3)
    return lo, hi


@functools.lru_cache(maxsize=None)
def _dyadic_jit():
    return jax.jit(
        lambda o1lo, o1hi, o2lo, o2hi, qlo, qhi, blo, bhi, ln: dyadic_multiply_core(
            (o1lo, o1hi), (o2lo, o2hi), (qlo, qhi), (blo, bhi), ln
        )
    )


def moduli_meta(moduli: np.ndarray):
    """Per-modulus (len, barr_lo) as in FPGAObject_DyadicMultiply::fill_in_data:
    len = floor(log2 q) - 1, barr_lo = floor(2^(len+64) / q)."""
    moduli = np.asarray(moduli, dtype=np.uint64)
    lens = np.array([int(q).bit_length() - 2 for q in moduli], dtype=np.uint32)
    barrs = np.array(
        [((1 << (int(l) + 64)) // int(q)) & ((1 << 64) - 1) for q, l in zip(moduli, lens)],
        dtype=np.uint64,
    )
    return lens, barrs


def dyadic_multiply_batched_dispatch(op1, op2, moduli):
    """Async form of dyadic_multiply_batched: stages inputs, dispatches the
    jitted program, and returns the (lo, hi) device arrays without blocking
    (XLA async dispatch is the reference's credit pipeline,
    `host/src/fpga.cpp:689-694`)."""
    op1 = np.asarray(op1, dtype=np.uint64)
    op2 = np.asarray(op2, dtype=np.uint64)
    B, _, M, n = op1.shape
    moduli = np.asarray(moduli, dtype=np.uint64).reshape(B, M)
    lens = np.zeros((B, M), dtype=np.uint32)
    barrs = np.zeros((B, M), dtype=np.uint64)
    for b in range(B):
        lens[b], barrs[b] = moduli_meta(moduli[b])
    o1 = w.to_pair_np(op1)
    o2 = w.to_pair_np(op2)
    qp = w.to_pair_np(moduli.reshape(B, M, 1))
    bp = w.to_pair_np(barrs.reshape(B, M, 1))
    return _dyadic_jit()(
        o1[0], o1[1], o2[0], o2[1], qp[0], qp[1], bp[0], bp[1],
        lens.reshape(B, M, 1),
    )


def dyadic_multiply_batched(op1, op2, moduli) -> np.ndarray:
    """op1/op2: (B, 2, M, n) u64; moduli: (B, M). Returns (B, 3, M, n) u64."""
    lo, hi = dyadic_multiply_batched_dispatch(op1, op2, moduli)
    return w.from_pair_np(np.asarray(lo), np.asarray(hi))


@functools.lru_cache(maxsize=64)
def _dyadic_static_jit(moduli: tuple):
    """Per-moduli-tuple specialization: Barrett constants fold into the
    program (the fence semantics key batches by moduli, so reuse is high)."""

    def fn(o1lo, o1hi, o2lo, o2hi):  # (B, 2, M, n) planes
        outs = []
        for m, q in enumerate(moduli):
            def red(x):
                # inputs tolerated in [0, 4q) like the reference MultMod
                # (`device/mod_ops.hpp:31-84`)
                return w.cond_sub64(w.cond_sub64(x, 2 * q), q)

            x0 = red((o1lo[:, 0, m], o1hi[:, 0, m]))
            x1 = red((o1lo[:, 1, m], o1hi[:, 1, m]))
            y0 = red((o2lo[:, 0, m], o2hi[:, 0, m]))
            y1 = red((o2lo[:, 1, m], o2hi[:, 1, m]))
            out0 = w.mul_mod_static(x0, y0, q)
            p01 = w.mul_mod_static(x0, y1, q)
            p10 = w.mul_mod_static(x1, y0, q)
            out1 = w.cond_sub64(w.add64(p01, p10), q)
            out2 = w.mul_mod_static(x1, y1, q)
            outs.append((out0, out1, out2))
        lo = jnp.stack(
            [jnp.stack([outs[m][k][0] for m in range(len(moduli))], axis=1)
             for k in range(3)], axis=1)
        hi = jnp.stack(
            [jnp.stack([outs[m][k][1] for m in range(len(moduli))], axis=1)
             for k in range(3)], axis=1)
        return lo, hi

    return jax.jit(fn)


def dyadic_multiply_static(op1, op2, moduli) -> np.ndarray:
    """op1/op2: (B, 2, M, n) u64 with one shared moduli vector -> (B, 3, M, n).

    Inputs must be < 4q per modulus (the device MultMod domain,
    `device/mod_ops.hpp:31-84`).  The traced path (dyadic_multiply_batched)
    additionally reproduces the reference's tolerance of raw operands beyond
    4q when the 128-bit product stays under 2^(len+64) — needed for the
    reference ramp-stimulus tests with tiny moduli."""
    op1 = np.asarray(op1, dtype=np.uint64)
    op2 = np.asarray(op2, dtype=np.uint64)
    o1 = w.to_pair_np(op1)
    o2 = w.to_pair_np(op2)
    fn = _dyadic_static_jit(tuple(int(q) for q in moduli))
    lo, hi = fn(o1[0], o1[1], o2[0], o2[1])
    return w.from_pair_np(np.asarray(lo), np.asarray(hi))


def dyadic_multiply(op1, op2, n: int, moduli, n_moduli: int) -> np.ndarray:
    """numpy convenience wrapper with the public-API layout
    (`host/inc/hexl-fpga.h:41-43`): op [2][M][n] -> out [3][M][n]."""
    op1 = np.asarray(op1, dtype=np.uint64).reshape(2, n_moduli, n)
    op2 = np.asarray(op2, dtype=np.uint64).reshape(2, n_moduli, n)
    moduli = np.asarray(moduli, dtype=np.uint64)
    lens, barrs = moduli_meta(moduli)
    o1 = w.to_pair_np(op1)
    o2 = w.to_pair_np(op2)
    qp = w.to_pair_np(moduli.reshape(n_moduli, 1))
    bp = w.to_pair_np(barrs.reshape(n_moduli, 1))
    lo, hi = _dyadic_jit()(
        o1[0], o1[1], o2[0], o2[1], qp[0], qp[1], bp[0], bp[1],
        lens.reshape(n_moduli, 1),
    )
    return w.from_pair_np(np.asarray(lo), np.asarray(hi)).reshape(-1)
