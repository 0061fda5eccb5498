"""Galois automorphism in the NTT domain as MXU matmuls (no lane gather).

The hoisted-keyswitch apply needs one NTT-domain permutation of the output
ciphertext per rotation.  XLA lowers `x[..., perm]` on TPU to a lane gather
that measures ~8.7 ms for a batch-32 flagship ciphertext — MORE than the
whole hoisted apply saves (scripts/probe_r4_hoist3.py: full keyswitch
7.8 ms, hoisted-apply-without-permutation 4.7 ms, with the gather 13.4 ms;
a compile-time-constant permutation lowers the same way).

But the Galois map is not an arbitrary permutation.  In NATURAL evaluation
order (position u <-> exponent 2u+1) the automorphism tau_g is AFFINE:

    OUT_nat[u] = IN_nat[(g*u + (g-1)/2) mod n]

and an affine index map on u = i*n2 + j (the (n1, n2) = (128, 128) view)
factors exactly into
    * a static column permutation  j -> w(j) = (g*j + h) mod n2,
    * a static row permutation     i -> (g*i) mod n1,
    * a per-column ROLL of rows by s(j) = (g^{-1} * floor((g*j+h)/n2)) mod n1
      (the "shear" — the only data-dependent-shaped stage),
while the bit-reversed NTT layout enters and leaves through the separable
reorder  X_nat[i, j] = V[rev(j), rev(i)]  (transpose + two 7-bit-reversal
permutations).  Every stage is a (128 x 128) permutation matrix multiply or
a j-batched (128 x 128) shear matmul — MXU work, ~40x less wall time than
the gather.

Exactness: u32 planes are split into FOUR u8 limbs and carried through the
f32 matmuls.  Every dot product is one-hot (a single 1.0 times a value
< 256 plus zeros), so the result is exact under ANY matmul precision the
backend picks (even raw bf16 represents integers < 256 exactly).
Property-tested against jnp.take and the scalar sigma in
tests/test_galois_mxu.py.

Reference anchor: the reference has no rotation/hoisting concept at all
(`host/src/fpga.cpp` re-runs the full keyswitch per op); SEAL/HEXL apply
Galois in NTT form with a scalar loop (seal/util/galois.cpp) — this is the
TPU-native formulation.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np


def _rev_bits(x: int, bits: int) -> int:
    return int(bin(x)[2:].zfill(bits)[::-1], 2)


def ntt_galois_sigma(n: int, g: int) -> np.ndarray:
    """sigma with NTT(tau_g m) = NTT(m)[sigma] in the library's
    bit-reversed NTT layout (same table as
    integrations.ckks._ntt_galois_sigma; lives here so ops-layer code can
    use it without importing the integrations package)."""
    b = n.bit_length() - 1
    br = np.array([_rev_bits(p, b) for p in range(n)], dtype=np.int64)
    e = 2 * br + 1
    e_inv = np.zeros(2 * n, dtype=np.int64)
    e_inv[e] = np.arange(n)
    return e_inv[(g * e) % (2 * n)]


class GaloisOperands(NamedTuple):
    """Staged one-hot f32 operands for one (n, g): apply with
    apply_galois_mxu.  P1/Q1 fold the br->natural reorder with the affine
    row/column permutations; S is the (n2, n1, n1) shear; P2/Q2 fold the
    natural->br reorder back."""

    P1: np.ndarray  # (n1, n1) f32; left-multiplies V^T
    Q1: np.ndarray  # (n2, n2) f32; right-multiplies
    S: np.ndarray   # (n2, n1, n1) f32; per-column row roll
    P2: np.ndarray  # (n1, n1) f32
    Q2: np.ndarray  # (n2, n2) f32
    n: int
    g: int


def _perm_left(sigma: np.ndarray) -> np.ndarray:
    """P with (P X)[i, j] = X[sigma[i], j]."""
    m = len(sigma)
    P = np.zeros((m, m), dtype=np.float32)
    P[np.arange(m), sigma] = 1.0
    return P


def _perm_right(tau: np.ndarray) -> np.ndarray:
    """Q with (X Q)[i, j] = X[i, tau[j]]."""
    m = len(tau)
    Q = np.zeros((m, m), dtype=np.float32)
    Q[tau, np.arange(m)] = 1.0
    return Q


def build_galois_operands(n: int, g: int) -> GaloisOperands:
    """Factor OUT[p] = IN[sigma_g[p]] (bit-reversed NTT layout, sigma from
    integrations.ckks._ntt_galois_sigma) into the matmul chain; verified
    index-exactly against the direct sigma before returning."""
    assert n >= 4 and (n & (n - 1)) == 0
    g = int(g) % (2 * n)
    assert g % 2 == 1, "galois element must be odd"
    b = n.bit_length() - 1
    b1 = b // 2
    n1 = 1 << (b - b1)  # rows (major)
    n2 = 1 << b1        # cols (minor)
    h = ((g - 1) // 2) % n
    ginv1 = pow(g, -1, n1)

    rev_r = np.array([_rev_bits(i, b - b1) for i in range(n1)])
    rev_c = np.array([_rev_bits(j, b1) for j in range(n2)])
    assert n1 == n2, "square view required (even log2 n)"

    # stage maps (see module docstring)
    w = (g * np.arange(n2) + h) % n2                       # column perm
    q = ((g * np.arange(n2) + h) // n2) % n1               # row carry
    s = (ginv1 * q) % n1                                   # per-col roll
    grow = (g * np.arange(n1)) % n1                        # row perm

    # compose the static pieces:
    #   X_nat = P_rev V^T Q_rev;  X_c = X_nat Q_w;  X_r = P_grow X_c
    #   => X_r = (P_grow P_rev) V^T (Q_rev Q_w) = P1 V^T Q1
    P_rev = _perm_left(rev_r)
    Q_rev = _perm_right(rev_c)
    P1 = _perm_left(rev_r[grow])          # P_grow then P_rev: X[grow->rev]
    Q1 = Q_rev @ _perm_right(w)
    # shear: Z[i, j] = X_r[(i + s[j]) % n1, j]
    S = np.zeros((n2, n1, n1), dtype=np.float32)
    for j in range(n2):
        rows = (np.arange(n1) + s[j]) % n1
        S[j, np.arange(n1), rows] = 1.0
    # back to br: OUT = P_rev Z^T Q_rev
    P2, Q2 = P_rev, Q_rev

    ops = GaloisOperands(P1.astype(np.float32), Q1.astype(np.float32), S,
                         P2.astype(np.float32), Q2.astype(np.float32),
                         n, g)

    # index-exact verification against the direct sigma
    idx = np.arange(n, dtype=np.int64)
    got = _apply_index(ops, idx.reshape(n1, n2))
    sigma = ntt_galois_sigma(n, g)
    assert np.array_equal(got.reshape(-1), idx[sigma]), (
        "galois matmul factorization does not reproduce sigma"
    )
    return ops


def _apply_index(ops: GaloisOperands, V: np.ndarray) -> np.ndarray:
    """Reference (numpy int) application of the index chain (host check)."""
    n1 = V.shape[0]

    def pl(P):
        return P.argmax(axis=1)

    def pr(Q):
        return Q.argmax(axis=0)

    X1 = V.T[pl(ops.P1), :][:, pr(ops.Q1)]
    Z = np.stack([
        X1[(np.arange(n1) + 0), j] if False else
        X1[ops.S[j].argmax(axis=1), j]
        for j in range(V.shape[1])
    ], axis=1)
    return Z.T[pl(ops.P2), :][:, pr(ops.Q2)]


def stage_operands(ops: GaloisOperands):
    """Host numpy -> device jnp arrays (call once per sigma, cache)."""
    import jax.numpy as jnp

    return tuple(jnp.asarray(x) for x in (ops.P1, ops.Q1, ops.S,
                                          ops.P2, ops.Q2))


def apply_galois_mxu(x, P1, Q1, S, P2, Q2):
    """Permute a uint32 plane (..., n) by the staged Galois operands.

    Exact: four u8 limbs ride f32 one-hot matmuls (single-term dot
    products — precision-independent)."""
    import jax.numpy as jnp

    n1 = P1.shape[0]
    n2 = Q1.shape[0]
    shp = x.shape
    V = x.reshape(shp[:-1] + (n1, n2))
    out = jnp.zeros_like(V)
    for k in range(4):
        limb = ((V >> (8 * k)) & jnp.uint32(0xFF)).astype(jnp.float32)
        # X1 = P1 @ V^T @ Q1
        X1 = jnp.einsum("ik,...kj->...ij", P1,
                        jnp.swapaxes(limb, -1, -2))
        X1 = jnp.einsum("...ik,kj->...ij", X1, Q1)
        # shear: Z[..., i, j] = sum_r S[j, i, r] X1[..., r, j]
        Z = jnp.einsum("jir,...rj->...ij", S, X1)
        # OUT = P2 @ Z^T @ Q2
        O = jnp.einsum("ik,...kj->...ij", P2, jnp.swapaxes(Z, -1, -2))
        O = jnp.einsum("...ik,kj->...ij", O, Q2)
        out = out | (O.astype(jnp.uint32) << (8 * k))
    return out.reshape(shp)
