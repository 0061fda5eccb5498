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

and an affine index map on u = i*n2 + j (any (n1, n2) power-of-two view;
n1 = n2 = 128 at n = 16384, (128, 64) at n = 8192) factors into a static
column selection plus a per-column row permutation, while the bit-reversed
NTT layout enters and leaves through the separable reorder
X_nat[i, j] = x.reshape(n2, n1)[rev(j), rev(i)].  Composing EVERY static
stage on the host collapses the whole map to exactly TWO one-hot matmuls:

    G[..., p, :]    = x2[..., c(p), :]          # C: (n2, n2) column select
    out2[..., p, r] = G[..., p, m(p, r)]        # M: (n2, n1, n1) per-column
                                                #    composed row permutation

(the round-4 form ran five einsums — br reorders, affine perms, and the
shear separately; precomposition removes 3/5 of the matmul FLOPs and all
intermediate HBM traffic).

Exactness: u32 planes are split into FOUR u8 limbs (stacked on one batch
axis so both einsums run once, not per limb) and carried through the f32
matmuls.  Every dot product is one-hot (a single 1.0 times a value < 256
plus zeros), so the result is exact under ANY matmul precision the backend
picks (even raw bf16 represents integers < 256 exactly).  Property-tested
against jnp.take and the scalar sigma in tests/test_galois_mxu.py.

Reference anchor: the reference has no rotation/hoisting concept at all
(`host/src/fpga.cpp` re-runs the full keyswitch per op); SEAL/HEXL apply
Galois in NTT form with a scalar loop (seal/util/galois.cpp) — this is the
TPU-native formulation.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np


def _rev_bits(x: int, bits: int) -> int:
    if bits == 0:
        return 0
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
    """Fully precomposed one-hot f32 operands for one (n, g): apply with
    apply_galois_mxu.  The data rides as x2 = x.reshape(n2, n1) (n1 the
    lane/minor axis); C selects source rows, M applies the per-row
    composed permutation of the n1 lanes (see build_galois_operands)."""

    C: np.ndarray  # (n2, n2) f32: G = C @ x2 (one-hot row select)
    M: np.ndarray  # (n2, n1, n1) f32: out2[p, r] = G[p, m(p, r)]
    n: int
    g: int


def _view_shape(n: int):
    """(n1, n2) with n = n1 * n2, n1 = lane axis (the larger half)."""
    b = n.bit_length() - 1
    b1 = b // 2
    return 1 << (b - b1), 1 << b1


def _index_maps(n: int, g: int):
    """The composed integer index maps (c, m) of the factorization:
    out2[p, r] = x2[c[p], m[p, r]] for x2 = x.reshape(n2, n1), out2 in the
    same layout.  Derivation: with u = i*n2 + j in NATURAL order,
    OUT_nat[i, j] = IN_nat[(g*i + cj(j)) mod n1, w(j)] where
    w(j) = (g*j + h) mod n2 and cj(j) = floor((g*j + h) / n2) mod n1
    (h = (g-1)/2 mod n); the br layout enters/leaves through
    X_nat[i, j] = x2[rev_c(j), rev_r(i)].  No square-view requirement:
    the affine map factors over any (n1, n2)."""
    n1, n2 = _view_shape(n)
    b = n.bit_length() - 1
    b1 = b // 2
    h = ((g - 1) // 2) % n
    rev_r = np.array([_rev_bits(i, b - b1) for i in range(n1)])
    rev_c = np.array([_rev_bits(j, b1) for j in range(n2)])
    j_nat = rev_c  # natural column of br position p: j = rev_c(p)
    w = (g * j_nat + h) % n2
    cj = ((g * j_nat + h) // n2) % n1
    c = rev_c[w]  # (n2,): source x2 row per output row p
    # m[p, r]: source lane of out2[p, r]
    i_nat = rev_r  # natural row of br lane r
    m = rev_r[(g * i_nat[None, :] + cj[:, None]) % n1]  # (n2, n1)
    return c.astype(np.int64), m.astype(np.int64)


def build_galois_operands(n: int, g: int) -> GaloisOperands:
    """Factor OUT[p] = IN[sigma_g[p]] (bit-reversed NTT layout, sigma from
    ntt_galois_sigma) into the two-matmul chain; verified index-exactly
    against the direct sigma before returning.  Works for ANY power-of-two
    n >= 4 (rectangular views included — n = 8192 runs as (128, 64))."""
    n = int(n)
    if n < 4 or (n & (n - 1)) != 0:
        raise ValueError(f"n must be a power of two >= 4, got {n}")
    g = int(g) % (2 * n)
    if g % 2 != 1:
        raise ValueError(f"galois element must be odd, got {g}")
    n1, n2 = _view_shape(n)
    c, m = _index_maps(n, g)

    C = np.zeros((n2, n2), dtype=np.float32)
    C[np.arange(n2), c] = 1.0
    M = np.zeros((n2, n1, n1), dtype=np.float32)
    for p in range(n2):
        M[p, np.arange(n1), m[p]] = 1.0
    ops = GaloisOperands(C, M, n, g)

    # index-exact verification against the direct sigma (ValueError, not
    # assert: the gate must survive python -O)
    idx = np.arange(n, dtype=np.int64)
    got = _apply_index(ops, idx)
    sigma = ntt_galois_sigma(n, g)
    if not np.array_equal(got, idx[sigma]):
        raise ValueError(
            "galois matmul factorization does not reproduce sigma "
            f"(n={n}, g={g})"
        )
    return ops


def _apply_index(ops: GaloisOperands, x: np.ndarray) -> np.ndarray:
    """Reference (numpy integer gather) application of the composed index
    maps — the host-side check mirror of apply_galois_mxu."""
    n1, n2 = _view_shape(ops.n)
    c = ops.C.argmax(axis=1)
    m = ops.M.argmax(axis=2)
    x2 = np.asarray(x).reshape(n2, n1)
    out2 = x2[c[:, None], m]
    return out2.reshape(-1)


def stage_operands(ops: GaloisOperands):
    """Host numpy -> device jnp arrays (call once per sigma, cache).

    The C stage is a pure permutation of n2 ROWS — each a full 128-lane
    vector — so it stages as an int32 index vector and applies as a
    row-axis take (second-minor-axis gathers are cheap on TPU; only LANE
    gathers are the ~8.7 ms trap this module exists to avoid).  M stages
    in bfloat16: every value is 0.0 or 1.0 (exact) and the limb operands
    are integers < 256 — within bf16's 8 significand bits — so the
    one-hot dot products stay exact on the full-rate bf16 MXU path.
    Same-process A/B on a v5e (`scripts/probe_r5_galois_dtype.py`):
    row-take + one bf16 einsum > two bf16 einsums > two f32 einsums
    (~+2% / ~+5% on the whole hoisted apply); int8-with-offset measured
    slower (the offset/cast lane work outweighs the 2x int8 MXU rate),
    and u16-limbs-in-f32 is NOT exact (XLA's default f32 dot runs bf16
    passes — only values < 256 survive any matmul precision)."""
    import jax.numpy as jnp

    c_idx = np.argmax(ops.C, axis=1).astype(np.int32)
    return (jnp.asarray(c_idx),
            jnp.asarray(ops.M, dtype=jnp.bfloat16))


def apply_galois_mxu(x, C, M):
    """Permute a uint32 plane (..., n) by the staged Galois operands.

    C: (n2,) int32 source-row indices (stage_operands) or an (n2, n2)
    one-hot matrix (applied as a row take either way).  M: (n2, n1, n1)
    one-hot per-row lane permutation, applied as ONE einsum over four u8
    limbs stacked on a leading batch axis — exact in any float dtype with
    >= 8 significand bits (each dot product has a single nonzero term,
    a 1.0 times an integer < 256)."""
    import jax.numpy as jnp

    n1 = M.shape[1]
    c_idx = C if C.ndim == 1 else jnp.argmax(C, axis=1)
    n2 = c_idx.shape[0]
    shp = x.shape
    x2 = x.reshape(shp[:-1] + (n2, n1))
    g2 = jnp.take(x2, c_idx, axis=-2)
    limbs = jnp.stack(
        [((g2 >> (8 * k)) & jnp.uint32(0xFF)).astype(M.dtype)
         for k in range(4)]
    )  # (4, ..., n2, n1)
    O = jnp.einsum("prm,k...pm->k...pr", M, limbs).astype(jnp.uint32)
    out = O[0] | (O[1] << 8) | (O[2] << 16) | (O[3] << 24)
    return out.reshape(shp)


def hi_limb_count(moduli) -> int:
    """u8 limbs covering the HI u32 plane of CANONICAL (< q) pair values:
    the pair encodes lo + hi*2^32 < max(q), so hi < 2^(max_bits - 32) —
    3 limbs at the flagship 52-bit moduli, 4 only beyond 56 bits (q < 2^32
    leaves hi == 0; one zero limb keeps the path uniform)."""
    mb = max(int(q).bit_length() for q in moduli)
    return min(4, max(1, -(-(mb - 32) // 8)))


def apply_galois_mxu_pair(lo, hi, C, M, hi_limbs: int = 4):
    """Permute a CANONICAL u32 (lo, hi) pair plane (..., n) in ONE
    take + einsum: 4 lo limbs + hi_limbs hi limbs stacked on the leading
    limb axis.  Requires hi < 2^(8*hi_limbs) — guaranteed for canonical
    residues via hi_limb_count(moduli).  Strictly less einsum FLOPs/HBM
    traffic than two apply_galois_mxu calls whenever hi_limbs < 4, and one
    dispatch chain instead of two always."""
    import jax.numpy as jnp

    n1 = M.shape[1]
    c_idx = C if C.ndim == 1 else jnp.argmax(C, axis=1)
    n2 = c_idx.shape[0]
    shp = lo.shape
    x2 = jnp.stack([lo, hi]).reshape((2,) + shp[:-1] + (n2, n1))
    g2 = jnp.take(x2, c_idx, axis=-2)
    glo, ghi = g2[0], g2[1]
    limbs = jnp.stack(
        [((glo >> (8 * k)) & jnp.uint32(0xFF)).astype(M.dtype)
         for k in range(4)]
        + [((ghi >> (8 * k)) & jnp.uint32(0xFF)).astype(M.dtype)
           for k in range(hi_limbs)]
    )  # (4 + hi_limbs, ..., n2, n1)
    O = jnp.einsum("prm,k...pm->k...pr", M, limbs).astype(jnp.uint32)
    olo = O[0] | (O[1] << 8) | (O[2] << 16) | (O[3] << 24)
    ohi = O[4]
    for k in range(1, hi_limbs):
        ohi = ohi | (O[4 + k] << (8 * k))
    return olo.reshape(shp), ohi.reshape(shp)
