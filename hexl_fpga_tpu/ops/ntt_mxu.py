"""Four-step negacyclic NTT/INTT on the MXU (exact int8-limb matmuls).

This is the MXU formulation of the NTT — the TPU-native answer to the
reference's dedicated butterfly pipelines (`device/fwd_ntt.cpp`,
`device/inv_ntt.cpp`): instead of log2(n) dependent butterfly stages on the
VPU, the transform becomes two 128-wide matrix multiplications on the
systolic array with one elementwise twiddle pass between them.

Math (verified bit-exact vs the golden model; see tests/test_ntt_mxu.py):
the HEXL forward transform is out[br(k)] = sum_j a[j] psi^{(2k+1) j} mod q
(psi = minimal 2n-th root; br = bit reversal).  With n = n1*n2, omega =
psi^2, and ALL permutations and the negacyclic twist folded into
precomputed matrices, the transform in natural layout A[j1][j2] =
a[j1*n2 + j2] is

    OUT = ((G1^T @ A) * U) @ G2          (mod q, OUT natural layout)
      G1[j1][m1] = psi^{j1 n2} omega^{n2 j1 br(m1)}
      U [m1][j2] = psi^{j2}    omega^{j2 br(m1)}
      G2[j2][m2] = omega^{n1 j2 br(m2)}

and the inverse is

    A   = H1 @ ((Y @ H2) * V)            (mod q)
      H2[m2][j2] = omega^{-n1 j2 br(m2)}
      V [m1][j2] = omega^{-j2 br(m1)} psi^{-j2} n^{-1}
      H1[j1][m1] = psi^{-j1 n2} omega^{-n2 j1 br(m1)}

Exact integer matmul on the MXU: data (< 2^52) splits into 7 uint8 limbs;
for each data-limb index t the matrix is pre-multiplied by 2^{8t} mod q and
itself split into 7 uint8 limbs, and the t dimension is STACKED ALONG THE
CONTRACTION AXIS — so the whole exact product needs only 7 int8 matmuls per
stage (one per matrix-limb index s), each with contraction depth 7*128.
Signedness uses the standard zero-point trick (limb-128 as int8, correction
= 128*colsum + 128*rowsum).  Group sums S_s < 7*128*255^2 < 2^26; the
elementwise tail recombines value = sum_s S_s * (2^{8s} W mod q) with the
stage twiddle W folded into the per-s tables, accumulates exactly in three
uint32 limbs, and reduces with a folded Barrett pass.

Layouts stay (sublane, lane)-friendly: stage 1 contracts j1 with the data
kept (n1, B, n2); stage 2 contracts j2 on (n1*B, n2).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import nt, word64 as w

Pair = Tuple[jnp.ndarray, jnp.ndarray]

NLIMB = 7  # max: 7 x 8-bit limbs cover values < 2^56 (moduli <= 2^52)


def nlimb_for(q: int) -> int:
    """8-bit limbs needed for the data domain [0, 2q) (lazy values included).

    <= 47-bit moduli need only 6 limbs -> 36 instead of 49 int8 matmuls per
    stage and a shorter recombination tail."""
    return -(-(int(q).bit_length() + 1) // 8)


# ---------------------------------------------------------------------------
# host-side plan construction (exact python ints)
# ---------------------------------------------------------------------------


def _limb_stack_matrix(M: np.ndarray, q: int, nlimb: int = NLIMB):
    """Stack-by-limb encoding of an exact matrix for one-matmul-per-s use.

    M: (K, O) python-int matrix mod q.  Returns
      gbig:   (nlimb, nlimb*K, O) int8 — gbig[s, t*K + j, o] =
              limb_s((2^{8t} * M[j, o]) mod q) - 128
      corr:   (nlimb, O) int32 — 128 * column sums of the int8 limbs
    """
    K, O = M.shape
    gbig = np.zeros((nlimb, nlimb * K, O), dtype=np.int16)
    for t in range(nlimb):
        Mt = (M.astype(object) * pow(2, 8 * t, q)) % q
        for s in range(nlimb):
            gbig[s, t * K : (t + 1) * K, :] = ((Mt >> (8 * s)) & 0xFF).astype(
                np.int16
            ) - 128
    corr = 128 * gbig.sum(axis=1, dtype=np.int64)
    return gbig.astype(np.int8), corr.astype(np.int32)


def _w_tables(W: np.ndarray, q: int, nlimb: int = NLIMB):
    """Per-s twiddle tables (2^{8s} * W) mod q as uint32 pairs.

    W: element table (or scalar 1) folded into the stage-s recombination."""
    tabs = np.stack([(W.astype(object) * pow(2, 8 * s, q)) % q for s in range(nlimb)])
    return w.to_pair_np(tabs.astype(np.uint64))


@functools.lru_cache(maxsize=None)
def make_plan(n: int, q: int, n1: int = 128, psi: int | None = None,
              min_data_bits: int | None = None):
    """All precomputed constants for fwd+inv four-step NTT at (n, q).

    psi overrides the 2n-th root (e.g. derived from a caller twiddle table:
    the golden-layout forward table stores psi at index bit_reverse(1) = n/2,
    so any table-defined transform is reproduced exactly).

    min_data_bits widens the data-limb count so inputs up to 2^min_data_bits
    stay exact — the transform is mod-q-linear, so feeding an UNREDUCED
    residue representative (e.g. a value still in another modulus's domain)
    yields the exact NTT of (x mod q) without a Barrett pass in front."""
    assert n % n1 == 0
    n2 = n // n1
    b1, b2 = nt.log2_exact(n1), nt.log2_exact(n2)
    if psi is None:
        psi = nt.minimal_primitive_root(2 * n, q)
    assert nt.is_primitive_root(psi, 2 * n, q), "psi must be a 2n-th root"
    omega = pow(psi, 2, q)
    psi_inv = nt.inverse_mod(psi, q)
    omega_inv = nt.inverse_mod(omega, q)
    n_inv = nt.inverse_mod(n, q)

    def br1(x):
        return nt.reverse_bits(x, b1)

    def br2(x):
        return nt.reverse_bits(x, b2)

    j1v = np.arange(n1)
    j2v = np.arange(n2)
    m1v = np.array([br1(m) for m in range(n1)])
    m2v = np.array([br2(m) for m in range(n2)])

    def powmat(base, exps):
        flat = [pow(base, int(e), q) for e in exps.ravel()]
        return np.array(flat, dtype=object).reshape(exps.shape)

    # forward matrices (folded permutations + twist; see module docstring)
    G1 = powmat(psi, (j1v * n2)[:, None] + 0 * m1v[None, :]) * powmat(
        omega, n2 * j1v[:, None] * m1v[None, :]
    ) % q  # (j1, m1)
    U = powmat(psi, j2v[None, :] + 0 * m1v[:, None]) * powmat(
        omega, j2v[None, :] * m1v[:, None]
    ) % q  # (m1, j2)
    G2 = powmat(omega, n1 * j2v[:, None] * m2v[None, :])  # (j2, m2)

    # inverse matrices
    H2 = powmat(omega_inv, n1 * j2v[None, :] * m2v[:, None])  # (m2, j2)
    V = (
        powmat(omega_inv, j2v[None, :] * m1v[:, None])
        * powmat(psi_inv, j2v[None, :] + 0 * m1v[:, None])
        * n_inv
    ) % q  # (m1, j2)
    H1 = powmat(psi_inv, (j1v[:, None] * n2) + 0 * m1v[None, :]) * powmat(
        omega_inv, n2 * j1v[:, None] * m1v[None, :]
    ) % q  # (j1, m1)

    c64 = pow(2, 64, q)
    q_barr = ((1 << 64) // q) & ((1 << 64) - 1)
    ones = np.ones((1, 1), dtype=object)
    nl = nlimb_for(q)
    if min_data_bits is not None:
        nl = max(nl, -(-int(min_data_bits) // 8))
    if nl > NLIMB:
        raise ValueError(
            f"modulus {q} needs {nl} 8-bit limbs (> {NLIMB}): the MXU plan "
            "covers q < 2^55; route wider moduli to the XLA/VPU core "
            "(ntt_jax) instead"
        )

    def lazy_tab(W):
        """(W, W_precon) uint32 pairs for the Harvey lazy twiddle multiply."""
        Wu = W.astype(np.uint64)
        prec = np.array(
            [nt.barrett_factor(int(v), 64, q) for v in Wu.ravel()],
            dtype=np.uint64,
        ).reshape(Wu.shape)
        return w.to_pair_np(Wu), w.to_pair_np(prec)

    plan = {
        "n": n, "q": q, "n1": n1, "n2": n2, "nlimb": nl,
        "c64": np.uint64(c64),
        "q_barr": np.uint64(q_barr),
        # stage 1 fwd: left-matmul, contraction j1; matrix used as (j1, m1)
        "f1": _limb_stack_matrix(G1, q, nl),
        "f1_w": _w_tables(U, q, nl),                   # (s, m1, j2)
        "f1_u": lazy_tab(U),                           # lazy-multiply form
        # stage 2 fwd: right-matmul, contraction j2; matrix (j2, m2)
        "f2": _limb_stack_matrix(G2, q, nl),
        "f2_w": _w_tables(np.broadcast_to(ones, (1, 1)).copy(), q, nl),
        # stage 1 inv: right-matmul, contraction m2; matrix (m2, j2)
        "i1": _limb_stack_matrix(H2, q, nl),
        "i1_w": _w_tables(V, q, nl),                   # (s, m1, j2)
        "i1_v": lazy_tab(V),
        # stage 2 inv: left-matmul, contraction m1; matrix (m1, j1)
        "i2": _limb_stack_matrix(H1.T.copy(), q, nl),
        "i2_w": _w_tables(np.broadcast_to(ones, (1, 1)).copy(), q, nl),
    }
    return plan


# ---------------------------------------------------------------------------
# device-side building blocks
# ---------------------------------------------------------------------------


def _data_limbs_axis(lo, hi, axis: int, nlimb: int = NLIMB):
    """Split u32-pair data into nlimb uint8 limbs stacked along `axis`.

    Values must fit nlimb*8 bits (lazy [0,2q) included).  Returns
      stacked int8 (limb value - 128) with axis size nlimb * K,
      rowsum int32 (sum of raw uint8 limbs over that axis)."""
    limbs = []
    for t in range(nlimb):
        if t < 4:
            v = (lo >> (8 * t)) & 0xFF
        else:
            v = (hi >> (8 * (t - 4))) & 0xFF
        limbs.append(v)
    u = jnp.concatenate(limbs, axis=axis)  # uint32 0..255
    rowsum = sum(l.astype(jnp.int32).sum(axis=axis) for l in limbs)
    a = (u.astype(jnp.int32) - 128).astype(jnp.int8)
    return a, rowsum


def _mul32(a, b):
    """Exact 32x32 -> (lo32, hi32) product of uint32 arrays."""
    return w.mul32(a, b)


def _recombine_mod(S_list, w_lo_list, w_hi_list, q: int, c64, q_barr):
    """value = sum_s S_s * W_s mod q, exact.

    S_s: int32 >= 0, < 2^26; W_s = (lo, hi) uint32 pair, < q <= 2^52.
    Accumulates in three uint32 limbs then folds 2^64 ≡ c64 twice and
    finishes with a double-corrected Barrett."""
    acc0 = jnp.zeros_like(S_list[0], dtype=jnp.uint32)
    acc1 = jnp.zeros_like(acc0)
    acc2 = jnp.zeros_like(acc0)
    for S, wlo, whi in zip(S_list, w_lo_list, w_hi_list):
        Su = S.astype(jnp.uint32)
        p0, p1 = _mul32(Su, wlo)   # S * W_lo
        r1, r2 = _mul32(Su, whi)   # S * W_hi (whi < 2^20 so r2 < 2^14)
        s0 = acc0 + p0
        c0 = (s0 < acc0).astype(jnp.uint32)
        t1 = p1 + r1
        ct = (t1 < p1).astype(jnp.uint32)  # p1 + r1 may wrap uint32
        s1 = acc1 + t1
        c1 = (s1 < acc1).astype(jnp.uint32)
        s1b = s1 + c0
        c1b = (s1b < s1).astype(jnp.uint32)
        acc0, acc1 = s0, s1b
        acc2 = acc2 + r2 + ct + c1 + c1b
    # V = acc2 * 2^64 + (acc0, acc1); fold top limb twice via 2^64 ≡ c64
    v = (acc0, acc1)
    top = acc2
    for _ in range(2):
        # top * c64: top < 2^18 (then < 2^7), c64 < 2^52 -> product < 2^70
        t = w.mul64_full((top, jnp.zeros_like(top)), w.const_pair(int(c64)))
        s = w.add64(v, (t[0], t[1]))
        carry = w.lt64(s, v).astype(jnp.uint32)  # wrapped past 2^64
        v = s
        top = t[2] + carry  # t[2] < 2^6; carry folds back in
    # one last fold: top now < 2^7 -> top * c64 < 2^59, exact in u64
    t = w.mullo64((top, jnp.zeros_like(top)), int(c64))
    s = w.add64(v, t)
    carry = w.lt64(s, v)
    v = w.select64(carry, w.add64(s, int(c64)), s)
    # Barrett with two corrections (valid for any v < 2^64)
    Q = w.mulhi64(v, int(q_barr))
    r = w.sub64(v, w.mullo64(Q, q))
    r = w.cond_sub64(w.cond_sub64(r, q), q)
    return r


def _stage_left(lo, hi, gbig, corr, w_pair, q, c64, q_barr):
    """OUT[m, b, c] = (sum_j M[j, m] * X[j, b, c]) * W[m, 1, c] mod q.

    lo/hi: (K, B, C) u32 planes; gbig (s, NLIMB*K, n_out) int8;
    corr (s, n_out) int32; w_pair ((s, m, c) lo, hi) broadcast over B."""
    K, B, C = lo.shape
    nlimb = gbig.shape[0]
    a, rowsum = _data_limbs_axis(lo, hi, axis=0, nlimb=nlimb)
    a2 = a.reshape(nlimb * K, B * C)
    S_list, wlo_list, whi_list = [], [], []
    n_out = gbig.shape[2]
    for s in range(nlimb):
        dot = jax.lax.dot_general(
            gbig[s], a2,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # (n_out, B*C)
        S = (
            dot.reshape(n_out, B, C)
            + corr[s][:, None, None]
            + 128 * rowsum[None, :, :]
        )
        S_list.append(S)
        wl, wh = w_pair
        if wl.shape[1] == 1 and wl.shape[2] == 1:  # scalar table
            wlo_list.append(wl[s])
            whi_list.append(wh[s])
        else:
            wlo_list.append(wl[s][:, None, :])
            whi_list.append(wh[s][:, None, :])
    return _recombine_mod(S_list, wlo_list, whi_list, q, c64, q_barr)


def _stage_right(lo, hi, gbig, corr, w_pair, q, c64, q_barr):
    """OUT[r, m] = (sum_c X[r, c] * M[c, m]) * W_scalar mod q.

    lo/hi: (R, C) u32 planes; gbig (s, NLIMB*C, n_out)."""
    R, C = lo.shape
    nlimb = gbig.shape[0]
    a, rowsum = _data_limbs_axis(lo, hi, axis=1, nlimb=nlimb)
    S_list, wlo_list, whi_list = [], [], []
    for s in range(nlimb):
        dot = jax.lax.dot_general(
            a, gbig[s],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # (R, n_out)
        S = dot + corr[s][None, :] + 128 * rowsum[:, None]
        S_list.append(S)
        wl, wh = w_pair
        wlo_list.append(wl[s])
        whi_list.append(wh[s])
    return _recombine_mod(S_list, wlo_list, whi_list, q, c64, q_barr)


# ---------------------------------------------------------------------------
# full transforms
# ---------------------------------------------------------------------------


def fwd_ntt_core(x: Pair, n: int, q: int, plan=None) -> Pair:
    """Forward NTT over (B, n) uint32-pair arrays; canonical [0, q) output."""
    if plan is None:
        plan = make_plan(n, q)
    n1, n2 = plan["n1"], plan["n2"]
    c64, q_barr = plan["c64"], plan["q_barr"]
    lo, hi = x
    B = lo.shape[0]
    # (B, n1, n2) -> (n1, B, n2): stage-1 contraction axis leading
    lo1 = lo.reshape(B, n1, n2).transpose(1, 0, 2)
    hi1 = hi.reshape(B, n1, n2).transpose(1, 0, 2)
    g, corr = plan["f1"]
    clo, chi = _stage_left(
        lo1, hi1, jnp.asarray(g), jnp.asarray(corr),
        (jnp.asarray(plan["f1_w"][0]), jnp.asarray(plan["f1_w"][1])),
        q, c64, q_barr,
    )  # (n1, B, n2)
    g2, corr2 = plan["f2"]
    olo, ohi = _stage_right(
        clo.reshape(n1 * B, n2), chi.reshape(n1 * B, n2),
        jnp.asarray(g2), jnp.asarray(corr2),
        (jnp.asarray(plan["f2_w"][0]), jnp.asarray(plan["f2_w"][1])),
        q, c64, q_barr,
    )  # (n1*B, n2)
    out_lo = olo.reshape(n1, B, n2).transpose(1, 0, 2).reshape(B, n)
    out_hi = ohi.reshape(n1, B, n2).transpose(1, 0, 2).reshape(B, n)
    return out_lo, out_hi


def inv_ntt_core(x: Pair, n: int, q: int, plan=None) -> Pair:
    """Inverse NTT (incl. n^{-1}) over (B, n) pairs; canonical output."""
    if plan is None:
        plan = make_plan(n, q)
    n1, n2 = plan["n1"], plan["n2"]
    c64, q_barr = plan["c64"], plan["q_barr"]
    lo, hi = x
    B = lo.shape[0]
    # stage 1 (right-matmul, contraction m2) on (B*n1, n2), with V folded —
    # but V is indexed (m1, j2), so recombine needs (n1, B, n2) layout:
    lo1 = lo.reshape(B, n1, n2).transpose(1, 0, 2)
    hi1 = hi.reshape(B, n1, n2).transpose(1, 0, 2)
    g, corr = plan["i1"]
    nlimb = g.shape[0]
    # run the matmul in (n1*B, n2) shape, then reshape for the (m1, j2) table
    a, rowsum = _data_limbs_axis(
        lo1.reshape(n1 * B, n2), hi1.reshape(n1 * B, n2), axis=1, nlimb=nlimb
    )
    S_list, wlo_list, whi_list = [], [], []
    for s in range(nlimb):
        dot = jax.lax.dot_general(
            a, jnp.asarray(g)[s],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        S = (dot + jnp.asarray(corr)[s][None, :] + 128 * rowsum[:, None]).reshape(
            n1, B, n2
        )
        S_list.append(S)
        wlo_list.append(jnp.asarray(plan["i1_w"][0])[s][:, None, :])
        whi_list.append(jnp.asarray(plan["i1_w"][1])[s][:, None, :])
    plo, phi = _recombine_mod(S_list, wlo_list, whi_list, q, c64, q_barr)
    # stage 2: left-matmul contracting m1 on (n1, B, n2)
    g2, corr2 = plan["i2"]
    olo, ohi = _stage_left(
        plo, phi, jnp.asarray(g2), jnp.asarray(corr2),
        (jnp.asarray(plan["i2_w"][0]), jnp.asarray(plan["i2_w"][1])),
        q, c64, q_barr,
    )  # (j1, B, n2)
    out_lo = olo.transpose(1, 0, 2).reshape(B, n)
    out_hi = ohi.transpose(1, 0, 2).reshape(B, n)
    return out_lo, out_hi


# ---------------------------------------------------------------------------
# jitted entries + numpy wrappers
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def fwd_ntt_fn(n: int, q: int):
    plan = make_plan(n, q)
    return jax.jit(lambda lo, hi: fwd_ntt_core((lo, hi), n, q, plan))


@functools.lru_cache(maxsize=None)
def inv_ntt_fn(n: int, q: int):
    plan = make_plan(n, q)
    return jax.jit(lambda lo, hi: inv_ntt_core((lo, hi), n, q, plan))


def fwd_ntt(a, q: int) -> np.ndarray:
    a = np.asarray(a, dtype=np.uint64)
    n = a.shape[-1]
    lo, hi = w.to_pair_np(a.reshape(-1, n))
    olo, ohi = fwd_ntt_fn(n, int(q))(lo, hi)
    return w.from_pair_np(np.asarray(olo), np.asarray(ohi)).reshape(a.shape)


def inv_ntt(a, q: int) -> np.ndarray:
    a = np.asarray(a, dtype=np.uint64)
    n = a.shape[-1]
    lo, hi = w.to_pair_np(a.reshape(-1, n))
    olo, ohi = inv_ntt_fn(n, int(q))(lo, hi)
    return w.from_pair_np(np.asarray(olo), np.asarray(ohi)).reshape(a.shape)
