"""Minimal CKKS scheme on top of the public API — the SEAL-bridge analog.

The reference ships a patch against SEAL v4.0.0 that routes CKKS
`switch_key_inplace` through `intel::hexl::KeySwitch` and validates the
integration with a square+rotate precision test
(`experimental/bridge-seal/patches/hexl-fpga-BRIDGE-seal-4.0.0.patch:246`,
`tests/keyswitch-example.cpp`).  SEAL itself is not vendored here; instead
this module implements the same CKKS operations directly so the integration
is testable end to end:

  * ciphertext x ciphertext multiply  -> api.DyadicMultiply
  * relinearization / rotation keyswitch -> api.KeySwitch (accumulate
    semantics, P-gadget switching keys — the exact contract the bridge
    patch relies on)
  * encode/decode via the canonical embedding (slot j at zeta^{5^j}),
    encrypt/decrypt, exact RNS rescale, Galois rotation.

Everything except the two accelerated ops runs in exact host arithmetic
(python ints / object arrays); the embedding uses complex128 like SEAL's
CKKSEncoder.  This is an integration surface, not a hardened crypto
implementation (no floods, no CRT sampling bias fixes).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import List, Sequence

import numpy as np

from .. import api
from ..ops import golden, nt, twiddles
from ..utils import vectors


def _obj(a) -> np.ndarray:
    return np.asarray(a, dtype=np.uint64).astype(object)


def _negacyclic_automorphism(m: List[int], g: int, n: int, Q: int) -> List[int]:
    """m(X) -> m(X^g) mod (X^n + 1, Q)."""
    out = [0] * n
    for k, c in enumerate(m):
        e = (g * k) % (2 * n)
        if e < n:
            out[e] = (out[e] + c) % Q
        else:
            out[e - n] = (out[e - n] - c) % Q
    return out


@dataclass
class Ciphertext:
    data: np.ndarray  # (2, level+1, n) uint64, NTT domain per limb
    level: int        # number of active decomp moduli - 1
    scale: float


class CkksContext:
    """Parameters + keys for one CKKS instantiation.

    moduli: full key-modulus chain — decomp primes q_0..q_{L-1} plus the
    special prime P as the last entry (the reference keyswitch layout)."""

    def __init__(self, n: int, moduli: Sequence[int], scale: float,
                 seed: int = 0):
        self.n = n
        self.moduli = [int(q) for q in moduli]
        self.K = len(self.moduli)
        self.L = self.K - 1            # decomp moduli
        self.P = self.moduli[-1]
        self.scale = scale
        self.slots = n // 2
        self.tabs = [twiddles.ntt_tables(n, q) for q in self.moduli]
        self.twiddle_factors = twiddles.keyswitch_twiddles(n, self.moduli)
        self.modswitch_factors = [
            nt.inverse_mod(self.P % q, q) if q != self.P else 1
            for q in self.moduli
        ]
        rng = np.random.default_rng(seed)
        self._rng = rng
        # noise multiplier for fresh encryptions and switching keys: 1 for
        # CKKS/BFV; the BGV subclass sets t (its errors must be ≡ 0 mod t)
        self._noise_scale = getattr(self, "_noise_scale", 1)
        self.s = [int(v) for v in rng.integers(-1, 2, size=n)]  # ternary
        # canonical embedding: slot j evaluated at zeta^{5^j}, zeta = e^{i pi/n}
        e = np.array([pow(5, j, 2 * n) for j in range(self.slots)])
        k = np.arange(n)
        self.E = np.exp(1j * np.pi * np.outer(e, k) / n)  # (slots, n)

        # relinearization keys: s^2 -> s
        s2 = vectors._negacyclic_mul(self.s, self.s, 1 << 127)
        s2 = [v if v < (1 << 126) else v - (1 << 127) for v in s2]
        self.relin_keys = self._make_switch_keys(s2)
        self._rot_keys = {}

    # -- key material --------------------------------------------------------

    def _make_switch_keys(self, s_old: List[int]) -> List[np.ndarray]:
        """P-gadget switching keys s_old -> s (vectors.py keygen recipe,
        matching the RLWE contract proven in tests/test_keyswitch_golden)."""
        n, K, L, P = self.n, self.K, self.L, self.P
        QP = 1
        for q in self.moduli:
            QP *= q
        rng = self._rng
        sn_ntt = [
            golden.fwd_ntt(
                np.array([v % q for v in self.s], dtype=np.uint64), q,
                self.tabs[j],
            )
            for j, q in enumerate(self.moduli)
        ]
        keys = []
        for i in range(L):
            a_int = [int(rng.integers(0, 1 << 62)) % QP for _ in range(n)]
            e = [self._noise_scale * int(v)
                 for v in rng.integers(-3, 4, size=n)]
            comp0 = np.zeros((K, n), dtype=np.uint64)
            comp1 = np.zeros((K, n), dtype=np.uint64)
            for j, q in enumerate(self.moduli):
                a_ntt = golden.fwd_ntt(
                    np.array([v % q for v in a_int], dtype=np.uint64), q,
                    self.tabs[j],
                )
                comp1[j] = a_ntt
                neg_a = np.where(a_ntt == 0, 0, np.uint64(q) - a_ntt)
                b = golden.inv_ntt(
                    ((neg_a.astype(object) * sn_ntt[j].astype(object)) % q
                     ).astype(np.uint64), q, self.tabs[j],
                )
                add = np.array(
                    [
                        (ev + (P * sv if j == i else 0)) % q
                        for ev, sv in zip(e, s_old)
                    ],
                    dtype=np.uint64,
                )
                b = ((b.astype(object) + add.astype(object)) % q).astype(
                    np.uint64
                )
                comp0[j] = golden.fwd_ntt(b, q, self.tabs[j])
            keys.append(np.concatenate([comp0.ravel(), comp1.ravel()]))
        return keys

    def galois_keys(self, r: int) -> List[np.ndarray]:
        """Rotation keys for a left-rotation by r slots (s(X^g) -> s)."""
        return self._galois_keys_for(pow(5, r, 2 * self.n))

    def _galois_keys_for(self, g: int) -> List[np.ndarray]:
        if g not in self._rot_keys:
            s_g = _negacyclic_automorphism(self.s, g, self.n, 1 << 127)
            s_g = [v if v < (1 << 126) else v - (1 << 127) for v in s_g]
            self._rot_keys[g] = self._make_switch_keys(s_g)
        return self._rot_keys[g]

    # -- encode / decode ------------------------------------------------------

    def encode(self, z, level: int | None = None, scale: float | None = None):
        """complex vector (slots,) -> integer poly coefficients (list)."""
        scale = scale or self.scale
        z = np.asarray(z, dtype=np.complex128)
        assert z.shape == (self.slots,)
        m = (2.0 / self.n) * np.real(self.E.conj().T @ z)  # (n,)
        return [int(round(v * scale)) for v in m]

    def decode(self, m_int: List[int], scale: float) -> np.ndarray:
        m = np.array([float(v) for v in m_int])
        return (self.E @ m) / scale

    # -- encrypt / decrypt ----------------------------------------------------

    def _to_ntt_limbs(self, m_int: List[int], nlimbs: int) -> np.ndarray:
        out = np.zeros((nlimbs, self.n), dtype=np.uint64)
        for j in range(nlimbs):
            q = self.moduli[j]
            arr = np.array([v % q for v in m_int], dtype=np.uint64)
            out[j] = golden.fwd_ntt(arr, q, self.tabs[j])
        return out

    def encrypt(self, z, noise_bound: int = 3) -> Ciphertext:
        n, L = self.n, self.L
        m_int = self.encode(z)
        Qd = 1
        for q in self.moduli[:L]:
            Qd *= q
        rng = self._rng
        a_int = [int(rng.integers(0, 1 << 62)) % Qd for _ in range(n)]
        e = [self._noise_scale * int(v)
             for v in rng.integers(-noise_bound, noise_bound + 1, size=n)]
        b_int = vectors._negacyclic_mul([(-v) % Qd for v in a_int], self.s, Qd)
        b_int = [(bv + ev + mv) % Qd for bv, ev, mv in zip(b_int, e, m_int)]
        data = np.stack(
            [self._to_ntt_limbs(b_int, L), self._to_ntt_limbs(a_int, L)]
        )
        return Ciphertext(data=data, level=L - 1, scale=self.scale)

    def decrypt(self, ct: Ciphertext) -> np.ndarray:
        nl = ct.level + 1
        moduli = self.moduli[:nl]
        coeff = np.zeros((nl, self.n), dtype=np.uint64)
        for j, q in enumerate(moduli):
            s_ntt = golden.fwd_ntt(
                np.array([v % q for v in self.s], dtype=np.uint64), q,
                self.tabs[j],
            )
            v = (
                _obj(ct.data[0, j])
                + _obj(ct.data[1, j]) * s_ntt.astype(object)
            ) % q
            coeff[j] = golden.inv_ntt(v.astype(np.uint64), q, self.tabs[j])
        # CRT reconstruct + center
        Q = 1
        for q in moduli:
            Q *= q
        m = [0] * self.n
        for j, q in enumerate(moduli):
            Qi = Q // q
            inv = nt.inverse_mod(Qi % q, q)
            mul = Qi * inv
            for k in range(self.n):
                m[k] = (m[k] + int(coeff[j, k]) * mul) % Q
        m = [v - Q if v > Q // 2 else v for v in m]
        return self.decode(m, ct.scale)

    # -- homomorphic ops (through the accelerated public API) -----------------

    def multiply(self, ct1: Ciphertext, ct2: Ciphertext):
        """ct x ct -> 3-component intermediate (d0, d1, d2), via
        api.DyadicMultiply."""
        assert ct1.level == ct2.level
        nl = ct1.level + 1
        moduli = np.array(self.moduli[:nl], dtype=np.uint64)
        results = np.zeros(3 * nl * self.n, dtype=np.uint64)
        api.set_worksize_DyadicMultiply(1)
        api.DyadicMultiply(
            results, ct1.data.ravel(), ct2.data.ravel(), self.n, moduli, nl
        )
        api.DyadicMultiplyCompleted()
        return results.reshape(3, nl, self.n), ct1.scale * ct2.scale

    def _keyswitch_accumulate(self, d01: np.ndarray, t_ntt: np.ndarray,
                              keys: List[np.ndarray]) -> np.ndarray:
        """result (2, nl, n) += KeySwitch(t) via api.KeySwitch."""
        nl = d01.shape[1]
        result = d01.reshape(-1).copy()
        api.set_worksize_KeySwitch(1)
        api.KeySwitch(
            result, t_ntt.ravel(), self.n, nl, self.K, nl + 1, 2,
            self.moduli, keys, self.modswitch_factors, self.twiddle_factors,
        )
        api.KeySwitchCompleted()
        return result.reshape(2, nl, self.n)

    def relinearize(self, d: np.ndarray, scale: float, level: int) -> Ciphertext:
        """(d0, d1, d2) -> 2-component ciphertext via the relin keyswitch."""
        out = self._keyswitch_accumulate(d[:2], d[2], self.relin_keys)
        return Ciphertext(data=out, level=level, scale=scale)

    def multiply_relin(self, ct1: Ciphertext, ct2: Ciphertext) -> Ciphertext:
        d, sc = self.multiply(ct1, ct2)
        return self.relinearize(d, sc, ct1.level)

    def rescale(self, ct: Ciphertext) -> Ciphertext:
        """Exact RNS rescale by the last active modulus (coeff domain)."""
        nl = ct.level + 1
        assert nl >= 2
        q_last = self.moduli[nl - 1]
        out = np.zeros((2, nl - 1, self.n), dtype=np.uint64)
        for k in range(2):
            limbs = [
                golden.inv_ntt(ct.data[k, j], self.moduli[j], self.tabs[j])
                for j in range(nl)
            ]
            last = limbs[nl - 1].astype(object)
            for j in range(nl - 1):
                q = self.moduli[j]
                inv_qlast = nt.inverse_mod(q_last % q, q)
                v = ((limbs[j].astype(object) - last) % q * inv_qlast) % q
                out[k, j] = golden.fwd_ntt(
                    v.astype(np.uint64), q, self.tabs[j]
                )
        return Ciphertext(
            data=out, level=ct.level - 1, scale=ct.scale / q_last
        )

    def mod_switch_to_next(self, ct: Ciphertext) -> Ciphertext:
        """Drop the last active modulus WITHOUT rescaling (SEAL's
        mod_switch_to_next): level decreases, scale is unchanged.  Exact in
        RNS-NTT form — the remaining limbs already hold the centered
        value's residues, so this is a row slice.  Used to align levels
        before add/multiply between ciphertexts of different depths."""
        nl = ct.level + 1
        assert nl >= 2
        return Ciphertext(
            data=ct.data[:, : nl - 1].copy(), level=ct.level - 1,
            scale=ct.scale,
        )

    def add(self, ct1: Ciphertext, ct2: Ciphertext) -> Ciphertext:
        assert ct1.level == ct2.level and abs(ct1.scale - ct2.scale) < 1e-3
        nl = ct1.level + 1
        out = np.zeros_like(ct1.data)
        for j in range(nl):
            q = np.uint64(self.moduli[j])
            with np.errstate(over="ignore"):
                s = ct1.data[:, j] + ct2.data[:, j]
            out[:, j] = np.where(s >= q, s - q, s)
        return Ciphertext(data=out, level=ct1.level, scale=ct1.scale)

    def sub(self, ct1: Ciphertext, ct2: Ciphertext) -> Ciphertext:
        assert ct1.level == ct2.level and abs(ct1.scale - ct2.scale) < 1e-3
        nl = ct1.level + 1
        out = np.zeros_like(ct1.data)
        for j in range(nl):
            q = np.uint64(self.moduli[j])
            with np.errstate(over="ignore"):
                d = ct1.data[:, j] + q - ct2.data[:, j]
            out[:, j] = np.where(d >= q, d - q, d)
        return Ciphertext(data=out, level=ct1.level, scale=ct1.scale)

    def add_plain(self, ct: Ciphertext, z) -> Ciphertext:
        """ct + encode(z) at the ciphertext's scale."""
        nl = ct.level + 1
        m_int = self.encode(z, scale=ct.scale)
        out = ct.data.copy()
        m_ntt = self._to_ntt_limbs(m_int, nl)
        for j in range(nl):
            q = np.uint64(self.moduli[j])
            with np.errstate(over="ignore"):
                s = out[0, j] + m_ntt[j]
            out[0, j] = np.where(s >= q, s - q, s)
        return Ciphertext(data=out, level=ct.level, scale=ct.scale)

    def multiply_plain(self, ct: Ciphertext, z) -> Ciphertext:
        """ct * encode(z); scale multiplies (rescale afterwards)."""
        nl = ct.level + 1
        m_int = self.encode(z)
        m_ntt = self._to_ntt_limbs(m_int, nl)
        out = np.zeros_like(ct.data)
        for k in range(2):
            for j in range(nl):
                q = self.moduli[j]
                out[k, j] = (
                    _obj(ct.data[k, j]) * m_ntt[j].astype(object) % q
                ).astype(np.uint64)
        return Ciphertext(data=out, level=ct.level, scale=ct.scale * self.scale)

    def conjugate(self, ct: Ciphertext) -> Ciphertext:
        """Complex conjugation of the slots: the Galois map X -> X^{2n-1}."""
        return self._apply_galois(ct, 2 * self.n - 1)

    def rotate(self, ct: Ciphertext, r: int) -> Ciphertext:
        """Left-rotate slots by r: Galois automorphism + keyswitch."""
        return self._apply_galois(ct, pow(5, r, 2 * self.n))

    def _apply_galois(self, ct: Ciphertext, g: int) -> Ciphertext:
        nl = ct.level + 1
        # apply tau_g per limb in the coefficient domain (exact)
        rot = np.zeros_like(ct.data)
        for k in range(2):
            for j in range(nl):
                q = self.moduli[j]
                c = golden.inv_ntt(ct.data[k, j], q, self.tabs[j])
                c_rot = _negacyclic_automorphism(
                    [int(v) for v in c], g, self.n, q
                )
                rot[k, j] = golden.fwd_ntt(
                    np.array(c_rot, dtype=np.uint64), q, self.tabs[j]
                )
        # keyswitch the c1(X^g) component from s(X^g) to s
        d01 = np.stack([rot[0], np.zeros_like(rot[0])])
        out = self._keyswitch_accumulate(d01, rot[1], self._galois_keys_for(g))
        return Ciphertext(data=out, level=ct.level, scale=ct.scale)


# ---------------------------------------------------------------------------
# Device-resident evaluation (rotation chains without host round trips)
# ---------------------------------------------------------------------------
#
# The Galois automorphism tau_g is a PURE PERMUTATION of NTT-domain values:
# position p of the golden NTT layout holds the evaluation at
# psi^(2*bitrev(p)+1), and tau_g maps evaluation exponents e -> g*e mod 2n,
# so NTT(tau_g m)[p] = NTT(m)[sigma(p)] with
# sigma(p) = e_inv(g * (2*bitrev(p)+1) mod 2n).  A rotation therefore
# becomes one device gather + the keyswitch — no coefficient-domain round
# trip (the host path's per-limb INTT/NTT pair disappears), and a chain of
# rotations keeps the ciphertext on the accelerator with ONE host fetch at
# the end.  This is the production pattern the reference cannot express
# (every FPGA op round-trips PCIe: `host/src/fpga.cpp:1517-1545`).


@dataclass
class DeviceCkksCiphertext:
    """(2, level+1, 2n)-interleaved u32 NTT-domain ciphertext on device."""

    data32: "object"  # jnp array
    level: int
    scale: float


def _ntt_galois_sigma(n: int, g: int) -> np.ndarray:
    """sigma with NTT(tau_g m) = NTT(m)[sigma] (verified property test)."""
    b = n.bit_length() - 1
    br = np.zeros(n, dtype=np.int64)
    for p in range(n):
        br[p] = int(bin(p)[2:].zfill(b)[::-1], 2)
    e = 2 * br + 1                       # evaluation exponent per position
    e_inv = np.zeros(2 * n, dtype=np.int64)
    e_inv[e] = np.arange(n)
    return e_inv[(g * e) % (2 * n)]


class DeviceCkksEvaluator:
    """Device-resident rotate/conjugate/add/sub for a CkksContext.

    Built on keyswitch_tpu (n >= 1024): the keyswitch runs the fused MXU
    kernels; rotation keys ride the context's pinned device cache."""

    def __init__(self, ctx: "CkksContext", interpret: bool | None = None):
        import jax

        assert ctx.n >= 1024, "device evaluator needs the MXU tier (n >= 1024)"
        self.ctx = ctx
        if interpret is None:
            interpret = jax.devices()[0].platform == "cpu"
        self.interpret = interpret
        self._ks = {}
        self._rot_fn = {}
        self._addsub_fn = {}
        self._sigma32 = {}

    def _ks_ctx(self, nl: int):
        if nl not in self._ks:
            from ..ops import keyswitch_tpu

            self._ks[nl] = keyswitch_tpu.get_context(
                self.ctx.n, nl, self.ctx.K, nl + 1, 2, self.ctx.moduli,
                self.ctx.twiddle_factors, interpret=self.interpret,
            )
        return self._ks[nl]

    def _sigma_interleaved(self, g: int):
        import jax.numpy as jnp

        if g not in self._sigma32:
            s = _ntt_galois_sigma(self.ctx.n, g)
            idx = np.empty(2 * self.ctx.n, dtype=np.int32)
            idx[0::2] = 2 * s
            idx[1::2] = 2 * s + 1
            self._sigma32[g] = jnp.asarray(idx)
        return self._sigma32[g]

    def stage(self, ct: Ciphertext) -> DeviceCkksCiphertext:
        import jax.numpy as jnp

        from ..ops import word64 as w

        return DeviceCkksCiphertext(
            jnp.asarray(w.to_interleaved_np(ct.data)), ct.level, ct.scale
        )

    def to_host(self, h: DeviceCkksCiphertext) -> Ciphertext:
        from ..ops import word64 as w

        data = w.from_interleaved_np(np.asarray(h.data32)).reshape(
            2, h.level + 1, self.ctx.n
        )
        return Ciphertext(data=data, level=h.level, scale=h.scale)

    def _rotation_fn(self, nl: int, mxu: bool):
        """One jit: NTT-domain input automorphism + keyswitch-accumulate.
        mxu=True applies the automorphism as MXU matmuls
        (ops/galois_mxu.py — TPU lane gathers are slow); False is the
        generic gather (odd-log2 n)."""
        import jax
        import jax.numpy as jnp

        from ..ops import galois_mxu, word64 as w

        key = (nl, mxu)
        if key not in self._rot_fn:
            ks = self._ks_ctx(nl)

            if mxu:
                def fn(data32, klo, khi, plo, phi, msf4, *g5):
                    lo, hi = w.deinterleave_jnp(data32)   # (2, nl, n)
                    rlo, rhi = galois_mxu.apply_galois_mxu_pair(
                        lo, hi, *g5,
                        hi_limbs=galois_mxu.hi_limb_count(ks.moduli),
                    )
                    olo, ohi = ks._build(
                        rlo[1][None], rhi[1][None], klo, khi, plo, phi,
                        jnp.stack([rlo[0], jnp.zeros_like(rlo[0])])[None],
                        jnp.stack([rhi[0], jnp.zeros_like(rhi[0])])[None],
                        msf4,
                    )
                    return w.interleave_jnp(olo, ohi)[0]  # (2, nl, 2n)
            else:
                def fn(data32, idx32, klo, khi, plo, phi, msf4):
                    rot = data32[:, :, idx32]            # (2, nl, 2n)
                    t32 = rot[1][None]                   # (1, nl, 2n)
                    r32 = jnp.stack(
                        [rot[0], jnp.zeros_like(rot[0])]
                    )[None]                              # (1, 2, nl, 2n)
                    return ks._build32(
                        t32, r32, klo, khi, plo, phi, msf4
                    )[0]

            self._rot_fn[key] = jax.jit(fn)
        return self._rot_fn[key]

    def _apply_galois(self, h: DeviceCkksCiphertext, g: int):
        nl = h.level + 1
        ks = self._ks_ctx(nl)
        keys = ks.device_keys(self.ctx._galois_keys_for(g))
        msf4 = ks.prepare_msf4(self.ctx.modswitch_factors)
        gops = ks.galois_mxu_operands(g)
        if gops is not None:
            out32 = self._rotation_fn(nl, True)(
                h.data32, *keys, msf4, *gops
            )
        else:
            out32 = self._rotation_fn(nl, False)(
                h.data32, self._sigma_interleaved(g), *keys, msf4
            )
        return DeviceCkksCiphertext(out32, h.level, h.scale)

    def rotate(self, h: DeviceCkksCiphertext, r: int) -> DeviceCkksCiphertext:
        """Left-rotate slots by r, fully on device (gather + keyswitch)."""
        return self._apply_galois(h, pow(5, r, 2 * self.ctx.n))

    def conjugate(self, h: DeviceCkksCiphertext) -> DeviceCkksCiphertext:
        return self._apply_galois(h, 2 * self.ctx.n - 1)

    def _addsub(self, h1, h2, sub: bool):
        import jax
        import jax.numpy as jnp

        from ..ops import word64 as w

        assert h1.level == h2.level and abs(h1.scale - h2.scale) < 1e-3
        nl = h1.level + 1
        key = (nl, sub)
        if key not in self._addsub_fn:
            moduli = self.ctx.moduli

            def fn(a32, b32):
                alo, ahi = w.deinterleave_jnp(a32)
                blo, bhi = w.deinterleave_jnp(b32)
                outs_lo, outs_hi = [], []
                for j in range(nl):
                    q = moduli[j]
                    a = (alo[:, j], ahi[:, j])
                    b = (blo[:, j], bhi[:, j])
                    o = w.sub_mod(a, b, q) if sub else w.add_mod(a, b, q)
                    outs_lo.append(o[0])
                    outs_hi.append(o[1])
                return w.interleave_jnp(
                    jnp.stack(outs_lo, 1), jnp.stack(outs_hi, 1)
                )

            self._addsub_fn[key] = jax.jit(fn)
        return DeviceCkksCiphertext(
            self._addsub_fn[key](h1.data32, h2.data32), h1.level, h1.scale
        )

    def add(self, h1, h2) -> DeviceCkksCiphertext:
        return self._addsub(h1, h2, sub=False)

    def sub(self, h1, h2) -> DeviceCkksCiphertext:
        return self._addsub(h1, h2, sub=True)


# -- device-resident multiply / relinearize / rescale -----------------------
#
# With these, the full CKKS evaluation pipeline (multiply -> relinearize ->
# rescale -> rotate -> add) runs on the accelerator end to end; the host
# sees ciphertexts only at encrypt/decrypt.


def _evaluator_multiply_relin(self, h1: DeviceCkksCiphertext,
                              h2: DeviceCkksCiphertext):
    """h1 * h2 -> relinearized 2-component handle (dyadic kernel + relin
    keyswitch, both on device)."""
    import jax
    import jax.numpy as jnp

    from ..ops import dyadic_pallas

    assert h1.level == h2.level
    nl = h1.level + 1
    moduli = tuple(self.ctx.moduli[:nl])
    runner = dyadic_pallas.runner(moduli, self.ctx.n,
                                  interpret=self.interpret)
    ks = self._ks_ctx(nl)
    keys = ks.device_keys(self.ctx.relin_keys)
    msf4 = ks.prepare_msf4(self.ctx.modswitch_factors)
    key = ("mulrelin", nl)
    if key not in self._rot_fn:

        def fn(a32, b32, klo, khi, plo, phi, m4):
            d32 = runner.device_call32(a32[None], b32[None])[0]  # (3, nl, 2n)
            t32 = d32[2][None]                                   # d2
            r32 = d32[0:2][None]                                 # (d0, d1)
            return ks._build32(t32, r32, klo, khi, plo, phi, m4)[0]

        self._rot_fn[key] = jax.jit(fn)
    out32 = self._rot_fn[key](h1.data32, h2.data32, *keys, msf4)
    return DeviceCkksCiphertext(out32, h1.level, h1.scale * h2.scale)


def _evaluator_rescale(self, h: DeviceCkksCiphertext):
    """Exact RNS rescale by the last active modulus, entirely on device:
    per limb INTT -> (c_j - c_last) * q_last^{-1} mod q_j -> NTT.

    The subtraction rides the wide-input trick: d = c_j + C*q_j - c_last
    (C*q_j > q_last keeps it nonnegative, d ≡ c_j - c_last mod q_j,
    d < 2^54) feeds the Harvey lazy multiply by q_last^{-1} directly —
    exact for any u64 representative."""
    import jax
    import jax.numpy as jnp

    from ..ops import nt as _nt, ntt_mxu_pallas, word64 as w

    nl = h.level + 1
    assert nl >= 2, "rescale needs at least two active moduli"
    key = ("rescale", nl)
    if key not in self._rot_fn:
        n = self.ctx.n
        moduli = self.ctx.moduli
        q_last = moduli[nl - 1]
        ks = self._ks_ctx(self.ctx.L)  # reuse per-modulus transforms' psi
        inv_calls = ks._inv  # canonical INTT per modulus (full K list)
        fwd_calls = [
            ntt_mxu_pallas.raw_fwd_call(
                n, moduli[j], ks.tile_p, psi=ks.psi[j],
                interpret=self.interpret, canonical=True, data_bits=53,
            )
            for j in range(nl - 1)
        ]
        consts = []
        for j in range(nl - 1):
            q = moduli[j]
            inv_qlast = _nt.inverse_mod(q_last % q, q)
            C = q_last // q + 1
            consts.append((q, inv_qlast,
                           _nt.barrett_factor(inv_qlast, 64, q), C * q))

        def fn(data32):
            lo, hi = w.deinterleave_jnp(data32)      # (2, nl, n)
            outs_lo, outs_hi = [], []
            # one INTT call per modulus over both components (rows 2)
            coeff = [
                _pad2(inv_calls[j], lo[:, j], hi[:, j], ks.tile_p)
                for j in range(nl)
            ]
            last = coeff[nl - 1]
            for j in range(nl - 1):
                q, inv_q, prec, cq = consts[j]
                d = w.sub64(w.add64(coeff[j], cq), last)
                v = w.cond_sub64(
                    w.mul_mod_lazy(d, inv_q, prec, q), q
                )
                o = _pad2(fwd_calls[j], v[0], v[1], ks.tile_p)
                outs_lo.append(o[0])
                outs_hi.append(o[1])
            return w.interleave_jnp(
                jnp.stack(outs_lo, 1), jnp.stack(outs_hi, 1)
            )

        self._rot_fn[key] = jax.jit(fn)
    out32 = self._rot_fn[key](h.data32)
    return DeviceCkksCiphertext(
        out32, h.level - 1, h.scale / self.ctx.moduli[nl - 1]
    )


def _pad2(call, lo, hi, tile_p):
    """Run a raw transform call on (R, n) rows with tile_p padding."""
    import jax.numpy as jnp

    R = lo.shape[0]
    pad = (-R) % tile_p
    if pad:
        lo = jnp.concatenate([lo, jnp.zeros((pad,) + lo.shape[1:], lo.dtype)])
        hi = jnp.concatenate([hi, jnp.zeros((pad,) + hi.shape[1:], hi.dtype)])
    olo, ohi = call(lo, hi)
    return olo[:R], ohi[:R]


def _evaluator_mod_switch_to_next(self, h: DeviceCkksCiphertext
                                  ) -> DeviceCkksCiphertext:
    """Drop the last active modulus without rescaling (level alignment;
    see CkksContext.mod_switch_to_next).  A device-side row slice — no
    transforms, no host round trip."""
    nl = h.level + 1
    assert nl >= 2
    return DeviceCkksCiphertext(h.data32[:, : nl - 1], h.level - 1, h.scale)


DeviceCkksEvaluator.multiply_relin = _evaluator_multiply_relin
DeviceCkksEvaluator.rescale = _evaluator_rescale
DeviceCkksEvaluator.mod_switch_to_next = _evaluator_mod_switch_to_next


def _evaluator_add_plain(self, h: DeviceCkksCiphertext, z):
    """h + encode(z) at h's scale: encoding stays on host (big-int CRT),
    the limb-wise modular add runs on device."""
    import jax
    import jax.numpy as jnp

    from ..ops import word64 as w

    nl = h.level + 1
    m_ntt = self.ctx._to_ntt_limbs(self.ctx.encode(z, scale=h.scale), nl)
    m32 = jnp.asarray(w.to_interleaved_np(np.asarray(m_ntt, dtype=np.uint64)))
    key = ("add_plain", nl)
    if key not in self._addsub_fn:
        moduli = self.ctx.moduli

        def fn(a32, p32):
            alo, ahi = w.deinterleave_jnp(a32)   # (2, nl, n)
            plo, phi = w.deinterleave_jnp(p32)   # (nl, n)
            outs_lo, outs_hi = [], []
            for j in range(nl):
                o = w.add_mod((alo[0, j], ahi[0, j]), (plo[j], phi[j]),
                              moduli[j])
                outs_lo.append(o[0])
                outs_hi.append(o[1])
            c0_lo = jnp.stack(outs_lo)
            c0_hi = jnp.stack(outs_hi)
            return w.interleave_jnp(
                jnp.stack([c0_lo, alo[1]]), jnp.stack([c0_hi, ahi[1]])
            )

        self._addsub_fn[key] = jax.jit(fn)
    return DeviceCkksCiphertext(
        self._addsub_fn[key](h.data32, m32), h.level, h.scale
    )


def _evaluator_multiply_plain(self, h: DeviceCkksCiphertext, z):
    """h * encode(z): pointwise modular multiply of both components per
    limb on device; scale multiplies (rescale afterwards)."""
    import jax
    import jax.numpy as jnp

    from ..ops import word64 as w

    nl = h.level + 1
    m_ntt = self.ctx._to_ntt_limbs(self.ctx.encode(z), nl)
    m32 = jnp.asarray(w.to_interleaved_np(np.asarray(m_ntt, dtype=np.uint64)))
    key = ("mul_plain", nl)
    if key not in self._addsub_fn:
        moduli = self.ctx.moduli

        def fn(a32, p32):
            alo, ahi = w.deinterleave_jnp(a32)
            plo, phi = w.deinterleave_jnp(p32)
            outs_lo, outs_hi = [], []
            for k in range(2):
                for j in range(nl):
                    o = w.mul_mod_static(
                        (alo[k, j], ahi[k, j]), (plo[j], phi[j]), moduli[j]
                    )
                    outs_lo.append(o[0])
                    outs_hi.append(o[1])
            lo = jnp.stack(outs_lo).reshape(2, nl, -1)
            hi = jnp.stack(outs_hi).reshape(2, nl, -1)
            return w.interleave_jnp(lo, hi)

        self._addsub_fn[key] = jax.jit(fn)
    return DeviceCkksCiphertext(
        self._addsub_fn[key](h.data32, m32), h.level,
        h.scale * self.ctx.scale,
    )


DeviceCkksEvaluator.add_plain = _evaluator_add_plain
DeviceCkksEvaluator.multiply_plain = _evaluator_multiply_plain


# -- hoisted rotations (decompose once, rotate many) -------------------------
#
# Halevi-Shoup hoisting on the keyswitch_tpu hoisted core: the keyswitch
# prefix (INTT1 + all engine NTTs, 48 of 62 transform rows) depends only on
# the ciphertext, not the rotation step — compute it once, then every
# additional rotation is {two NTT-domain gathers + MAC + INTT2 + tail}.
# The hoisted decomposition automorphs by PERMUTATION in the engine NTT
# domain, i.e. with the integer representative tau_g(y_i) (coefficients in
# (-q_i, q_i)) instead of the canonical lift — a valid gadget decomposition
# producing a correct (not bit-identical to rotate-then-keyswitch)
# encryption of the rotated plaintext, the standard hoisting trade
# (lattigo RotateHoisted).  The dominant CKKS patterns — BSGS linear
# transforms, bootstrapping's CoeffToSlot, encrypted matrix-vector — rotate
# one ciphertext by MANY steps and win ~3x per rotation.


@dataclass
class DeviceHoistedCiphertext:
    """A ciphertext + the hoisted decomposition of its c1, on device."""

    dlo: "object"     # (nl+1, nl, n) lazy engine-domain planes (active only)
    dhi: "object"
    data32: "object"  # the (2, nl, 2n) interleaved ciphertext (for c0)
    level: int
    scale: float


def _evaluator_hoist(self, h: DeviceCkksCiphertext) -> DeviceHoistedCiphertext:
    """Run the keyswitch prefix (INTT1 + all engine NTTs) on h's c1 once."""
    import jax

    from ..ops import word64 as w

    nl = h.level + 1
    ks = self._ks_ctx(nl)
    key = ("hoist", nl)
    if key not in self._rot_fn:
        def fn(data32):
            lo, hi = w.deinterleave_jnp(data32)   # (2, nl, n)
            return ks._decompose(lo[1][None], hi[1][None])

        self._rot_fn[key] = jax.jit(fn)
    dlo, dhi = self._rot_fn[key](h.data32)
    return DeviceHoistedCiphertext(dlo, dhi, h.data32, h.level, h.scale)


def _evaluator_rotate_hoisted(self, hh: DeviceHoistedCiphertext,
                              r: int) -> DeviceCkksCiphertext:
    """One rotation from a hoisted ciphertext: two gathers + MAC + tail.
    The sigma permutation is a TRACED argument — every step shares one
    compiled program."""
    return self._apply_galois_hoisted(hh, pow(5, r, 2 * self.ctx.n))


def _evaluator_conjugate_hoisted(self, hh: DeviceHoistedCiphertext
                                 ) -> DeviceCkksCiphertext:
    return self._apply_galois_hoisted(hh, 2 * self.ctx.n - 1)


def _evaluator_apply_galois_hoisted(self, hh, g: int):
    import jax
    import jax.numpy as jnp

    from ..ops import word64 as w

    nl = hh.level + 1
    ks = self._ks_ctx(nl)
    sigma_np = _ntt_galois_sigma(self.ctx.n, g).astype(np.int32)
    # sigma^{-1}-permuted keys, staged once per (g, key set): the apply then
    # runs gather-free on the decomposition and permutes only its output
    # (keyswitch_tpu._apply_hoisted deferred-automorphism scheme)
    keys = ks.device_keys(self.ctx._galois_keys_for(g), hoist_perm=sigma_np)
    msf4 = ks.prepare_msf4(self.ctx.modswitch_factors)
    # the deferred output automorphism prefers MXU matmuls over the lane
    # gather (ops/galois_mxu.py; ~8.7 ms/batch-32 gather vs sub-ms matmuls
    # at the flagship shape); gather remains the odd-log2-n fallback
    gops = ks.galois_mxu_operands(g)
    if not hasattr(self, "_sigma_n"):
        self._sigma_n = {}
    if g not in self._sigma_n:
        self._sigma_n[g] = jnp.asarray(sigma_np)
    key = ("hoisted_rot_mxu" if gops is not None else "hoisted_rot", nl)
    if key not in self._rot_fn:
        if gops is not None:
            def fn(dlo, dhi, data32, klo, khi, plo, phi, m4, *g5):
                lo, hi = w.deinterleave_jnp(data32)    # (2, nl, n)
                res_lo = jnp.stack([lo[0], jnp.zeros_like(lo[0])])[None]
                res_hi = jnp.stack([hi[0], jnp.zeros_like(hi[0])])[None]
                olo, ohi = ks._apply_hoisted(
                    dlo, dhi, res_lo, res_hi, klo, khi, plo, phi, m4,
                    galois_ops=g5,
                )
                return w.interleave_jnp(olo, ohi)[0]   # (2, nl, 2n)
        else:
            def fn(dlo, dhi, data32, s_idx, klo, khi, plo, phi, m4):
                lo, hi = w.deinterleave_jnp(data32)    # (2, nl, n)
                # UNPERMUTED accumulation base: out = sigma(c0 + deltas)
                res_lo = jnp.stack([lo[0], jnp.zeros_like(lo[0])])[None]
                res_hi = jnp.stack([hi[0], jnp.zeros_like(hi[0])])[None]
                olo, ohi = ks._apply_hoisted(
                    dlo, dhi, res_lo, res_hi, klo, khi, plo, phi, m4,
                    perm=s_idx,
                )
                return w.interleave_jnp(olo, ohi)[0]   # (2, nl, 2n)

        self._rot_fn[key] = jax.jit(fn)
    if gops is not None:
        out32 = self._rot_fn[key](
            hh.dlo, hh.dhi, hh.data32, *keys, msf4, *gops,
        )
    else:
        out32 = self._rot_fn[key](
            hh.dlo, hh.dhi, hh.data32, self._sigma_n[g], *keys, msf4,
        )
    return DeviceCkksCiphertext(out32, hh.level, hh.scale)


def _evaluator_rotate_many(self, h: DeviceCkksCiphertext, steps,
                           fused: bool = True
                           ) -> "list[DeviceCkksCiphertext]":
    """Rotate h by every step in `steps`, hoisting the keyswitch prefix
    once.  Step 0 returns h itself (no keyswitch needed).

    fused=True (default) runs ALL nontrivial rotations in ONE compiled
    lax.scan — the per-step sigma permutations and Galois key tensors ride
    the scan as inputs, so the whole batch is a single device dispatch
    (one program compile per level, any step set).  fused=False dispatches
    rotate_hoisted per step (same math, S dispatches)."""
    import jax
    import jax.numpy as jnp

    nontrivial = [r for r in steps if r % self.ctx.slots != 0]
    hh = self.hoist(h) if nontrivial else None
    if not fused or len(nontrivial) <= 1:
        by_step = {
            r: self.rotate_hoisted(hh, r) for r in set(nontrivial)
        }
        return [h if r % self.ctx.slots == 0 else by_step[r] for r in steps]

    from ..ops import word64 as w

    nl = h.level + 1
    ks = self._ks_ctx(nl)
    uniq = sorted(set(nontrivial))
    if not hasattr(self, "_sigma_n"):
        self._sigma_n = {}
    for r in uniq:
        g = pow(5, r, 2 * self.ctx.n)
        if g not in self._sigma_n:
            self._sigma_n[g] = jnp.asarray(
                _ntt_galois_sigma(self.ctx.n, g).astype(np.int32)
            )
    msf4 = ks.prepare_msf4(self.ctx.modswitch_factors)
    # per-step deferred automorphisms as MXU matmuls (the precomposed
    # (C, M) pair stacks along the scan axis; factorization covers every
    # supported n, so mxu is always available — the gather variant stays
    # for arbitrary non-Galois permutations)
    use_mxu = ks.galois_mxu_operands(pow(5, uniq[0], 2 * self.ctx.n)) \
        is not None
    key = ("rot_many_mxu" if use_mxu else "rot_many", nl)
    if key not in self._rot_fn:
        if use_mxu:
            def fn(dlo, dhi, data32, klo, khi, plo, phi, m4, cS, mS):
                lo, hi = w.deinterleave_jnp(data32)
                res_lo = jnp.stack([lo[0], jnp.zeros_like(lo[0])])[None]
                res_hi = jnp.stack([hi[0], jnp.zeros_like(hi[0])])[None]

                def body(carry, xs):
                    a, b, c, d, cs, ms = xs
                    olo, ohi = ks._apply_hoisted(
                        dlo, dhi, res_lo, res_hi, a, b, c, d, m4,
                        galois_ops=(cs, ms),
                    )
                    return carry, w.interleave_jnp(olo, ohi)[0]

                _, outs = jax.lax.scan(
                    body, 0, (klo, khi, plo, phi, cS, mS)
                )
                return outs                        # (S, 2, nl, 2n)
        else:
            def fn(dlo, dhi, data32, sperms, klo, khi, plo, phi, m4):
                lo, hi = w.deinterleave_jnp(data32)    # (2, nl, n)
                # unpermuted base (deferred-automorphism apply; keys in the
                # scanned stacks are pre-permuted per step)
                res_lo = jnp.stack([lo[0], jnp.zeros_like(lo[0])])[None]
                res_hi = jnp.stack([hi[0], jnp.zeros_like(hi[0])])[None]

                def body(carry, xs):
                    s_idx, a, b, c, d = xs
                    olo, ohi = ks._apply_hoisted(
                        dlo, dhi, res_lo, res_hi, a, b, c, d, m4,
                        perm=s_idx,
                    )
                    return carry, w.interleave_jnp(olo, ohi)[0]

                _, outs = jax.lax.scan(
                    body, 0, (sperms,) + (klo, khi, plo, phi)
                )
                return outs                        # (S, 2, nl, 2n)

        self._rot_fn[key] = jax.jit(fn)
    # the scan materializes ALL per-step Galois key tensors as stacked
    # inputs (4 x (S, L, comp, K, n) u32 — ~22 MB/step at the flagship
    # config), so bound the stack and run the steps in chunks: memory
    # stays O(chunk), the hoisted prefix is still computed once, and a
    # BSGS sweep costs ceil(S/chunk) dispatches instead of S
    keyset_bytes = 4 * 4 * ks.L * ks.comp * ks.K * ks.n
    if use_mxu:
        # the stacked composed lane-permutation tensors add
        # 2 * n2 * n1^2 bytes per step (bf16 M; the row-index vector is
        # negligible — galois_mxu.stage_operands, _view_shape: n1*n2 == n)
        from ..ops.galois_mxu import _view_shape

        n1, n2 = _view_shape(ks.n)
        keyset_bytes += 2 * n2 * n1 * n1
    max_mb = int(os.environ.get("HEXL_TPU_ROT_MANY_MAX_MB", "256"))
    chunk = max(1, (max_mb << 20) // keyset_bytes)
    by_step = {}
    for c0 in range(0, len(uniq), chunk):
        sub = uniq[c0 : c0 + chunk]
        gs = [pow(5, r, 2 * self.ctx.n) for r in sub]
        keysets = [
            ks.device_keys(
                self.ctx._galois_keys_for(g),
                hoist_perm=np.asarray(self._sigma_n[g]),
            )
            for g in gs
        ]
        kstack = tuple(
            jnp.stack([kset[i] for kset in keysets]) for i in range(4)
        )
        if use_mxu:
            gops = [ks.galois_mxu_operands(g) for g in gs]
            cS = jnp.stack([o[0] for o in gops])
            mS = jnp.stack([o[1] for o in gops])
            outs = self._rot_fn[key](
                hh.dlo, hh.dhi, hh.data32, *kstack, msf4, cS, mS,
            )
        else:
            perms = jnp.stack([self._sigma_n[g] for g in gs])
            outs = self._rot_fn[key](
                hh.dlo, hh.dhi, hh.data32, perms, *kstack, msf4
            )
        for s, r in enumerate(sub):
            by_step[r] = DeviceCkksCiphertext(outs[s], h.level, h.scale)
    return [h if r % self.ctx.slots == 0 else by_step[r] for r in steps]


DeviceCkksEvaluator.hoist = _evaluator_hoist
DeviceCkksEvaluator.rotate_hoisted = _evaluator_rotate_hoisted
DeviceCkksEvaluator.conjugate_hoisted = _evaluator_conjugate_hoisted
DeviceCkksEvaluator._apply_galois_hoisted = _evaluator_apply_galois_hoisted
DeviceCkksEvaluator.rotate_many = _evaluator_rotate_many


def _evaluator_linear_transform(self, h: DeviceCkksCiphertext, diagonals,
                                bsgs_n1: int | None = None
                                ) -> DeviceCkksCiphertext:
    """Encrypted matrix-vector product M @ z via the diagonal method with
    baby-step/giant-step rotations (Halevi-Shoup): M is given by its
    generalized diagonals {d: u_d} with u_d[i] = M[i, (i+d) % slots], so

        M z = sum_d  u_d * rot_d(z)
            = sum_j rot_{j*n1}( sum_i roll(u_{j*n1+i}, j*n1) * rot_i(z) )

    The n1 baby rotations rot_i(z) come from ONE hoisted decomposition of
    h; only the (#giant-step) outer rotations pay a full keyswitch.  This
    is the core kernel of encrypted inference and bootstrapping's
    CoeffToSlot/SlotToCoeff; the reference accelerates the raw KeySwitch
    but has no rotation-level composition to hoist across.

    diagonals: {int d: (slots,) complex vector}; bsgs_n1: baby-step count
    (default ~sqrt(#diagonals)).  Output scale is h.scale * ctx.scale —
    rescale afterwards."""
    import math

    slots = self.ctx.slots
    diags = {d % slots: np.asarray(v) for d, v in diagonals.items()}
    assert diags, "linear_transform requires at least one diagonal"
    assert all(v.shape == (slots,) for v in diags.values())
    n1 = bsgs_n1 or max(1, int(round(math.sqrt(len(diags)))))
    groups: "dict[int, list[int]]" = {}
    for d in sorted(diags):
        groups.setdefault(d // n1, []).append(d)
    # baby rotations from one hoisted decomposition, all in one fused scan
    baby_needed = sorted({d % n1 for d in diags})
    baby = dict(zip(baby_needed, self.rotate_many(h, baby_needed)))
    out = None
    for j, ds in groups.items():
        inner = None
        for d in ds:
            term = self.multiply_plain(
                baby[d % n1], np.roll(diags[d], j * n1)
            )
            inner = term if inner is None else self.add(inner, term)
        if j:
            inner = self.rotate(inner, (j * n1) % slots)
        out = inner if out is None else self.add(out, inner)
    return out


def _evaluator_linear_transform_fused(self, h: DeviceCkksCiphertext,
                                      diagonals, bsgs_n1: int | None = None,
                                      return_program: bool = False):
    """linear_transform compiled to ONE device program.

    Same BSGS diagonal-method math as linear_transform (bit-identical
    output — tested), but the whole computation — hoisted decomposition,
    the baby-rotation scan, per-diagonal plaintext multiplies, group sums,
    giant-step rotations, final accumulation — traces into a single jit,
    so an encrypted matrix-vector product is ONE device dispatch instead
    of ~(#groups * #diagonals) of them.  This is the production shape for
    the dominant kernel of encrypted inference / bootstrapping's
    CoeffToSlot: on a dispatch-latency-bound host (PCIe or this tunnel)
    the unfused path pays a round trip per primitive.

    One program per (level, n1, diagonal-index structure); the diagonal
    VALUES are traced inputs, so reusing the same banding pattern (the
    common case: a fixed model matrix) costs no recompiles.  Giant-step
    Galois keys are baked per structure; memory for the baby scan is
    4 x (#baby, L, comp, K, n) u32 — bound #baby (= bsgs_n1) accordingly.

    Reference anchor: the reference accelerates single KeySwitch calls
    only (`host/src/fpga.cpp`); it has no rotation- or workload-level
    composition to fuse across."""
    import math

    import jax
    import jax.numpy as jnp

    from ..ops import galois_mxu, word64 as w

    slots = self.ctx.slots
    n = self.ctx.n
    diags = {d % slots: np.asarray(v) for d, v in diagonals.items()}
    assert diags, "linear_transform requires at least one diagonal"
    assert all(v.shape == (slots,) for v in diags.values())
    n1 = bsgs_n1 or max(1, int(round(math.sqrt(len(diags)))))
    groups: "dict[int, list[int]]" = {}
    for d in sorted(diags):
        groups.setdefault(d // n1, []).append(d)
    group_list = sorted(groups.items())
    baby_rot = sorted({d % n1 for d in diags} - {0})
    giant_rot = [j for j, _ in group_list if j]

    nl = h.level + 1
    ks = self._ks_ctx(nl)
    moduli = self.ctx.moduli
    msf4 = jnp.asarray(ks.prepare_msf4(self.ctx.modswitch_factors))
    if not hasattr(self, "_sigma_n"):
        self._sigma_n = {}

    # -- staging (device arrays; hashable structure key for the program) --
    # baby rotations: per-sigma pre-permuted keys + (c_idx, M) operand
    # stacks ride a lax.scan (the rotate_many pattern)
    baby_args = ()
    if baby_rot:
        b_gs = [pow(5, r, 2 * n) for r in baby_rot]
        b_sigmas = [
            np.asarray(_ntt_galois_sigma(n, g), dtype=np.int32)
            for g in b_gs
        ]
        b_keysets = [
            ks.device_keys(self.ctx._galois_keys_for(g), hoist_perm=s)
            for g, s in zip(b_gs, b_sigmas)
        ]
        b_gops = [ks.galois_mxu_operands(g) for g in b_gs]
        assert all(o is not None for o in b_gops)
        baby_args = tuple(
            jnp.stack([kset[i] for kset in b_keysets]) for i in range(4)
        ) + (
            jnp.stack([o[0] for o in b_gops]),
            jnp.stack([o[1] for o in b_gops]),
        )
    # giant rotations: plain (unpermuted) keys + operands, unrolled
    giant_args = ()
    for j in giant_rot:
        g = pow(5, (j * n1) % slots, 2 * n)
        giant_args += tuple(
            ks.device_keys(self.ctx._galois_keys_for(g))
        ) + tuple(ks.galois_mxu_operands(g))
    # per-diagonal plaintexts in NTT-limb form, stacked per group
    diag_args = ()
    for j, ds in group_list:
        planes = np.stack([
            np.asarray(
                self.ctx._to_ntt_limbs(
                    self.ctx.encode(np.roll(diags[d], j * n1)), nl
                ),
                dtype=np.uint64,
            )
            for d in ds
        ])                                        # (len(ds), nl, n)
        plo, phi = w.to_pair_np(planes)
        diag_args += (jnp.asarray(plo), jnp.asarray(phi))

    struct = (nl, n1, tuple(baby_rot),
              tuple((j, tuple(ds)) for j, ds in group_list))
    key = ("lt_fused", struct)
    if key not in self._rot_fn:
        S = len(baby_rot)
        NG = len(giant_rot)

        def fn(data32, m4, *args):
            b_args = args[:6] if S else ()
            off = 6 if S else 0
            g_args = args[off : off + 6 * NG]
            p_args = args[off + 6 * NG :]
            lo, hi = w.deinterleave_jnp(data32)      # (2, nl, n)

            # babies: steps r in baby_rot via one hoisted scan; r=0 is h
            babies = {0: (lo, hi)}
            if S:
                dlo, dhi = ks._decompose(lo[1][None], hi[1][None])
                res_lo = jnp.stack([lo[0], jnp.zeros_like(lo[0])])[None]
                res_hi = jnp.stack([hi[0], jnp.zeros_like(hi[0])])[None]

                def body(carry, xs):
                    a, b, c, d, cs, ms = xs
                    olo, ohi = ks._apply_hoisted(
                        dlo, dhi, res_lo, res_hi, a, b, c, d, m4,
                        galois_ops=(cs, ms),
                    )
                    return carry, (olo[0], ohi[0])   # (2, nl, n)

                _, (s_lo, s_hi) = jax.lax.scan(body, 0, b_args)
                for i, r in enumerate(baby_rot):
                    babies[r] = (s_lo[i], s_hi[i])

            def mul_plain(b, plo_d, phi_d):
                outs = []
                for k in range(2):
                    outs.append([
                        w.mul_mod_static(
                            (b[0][k, j2], b[1][k, j2]),
                            (plo_d[j2], phi_d[j2]), moduli[j2]
                        )
                        for j2 in range(nl)
                    ])
                return (
                    jnp.stack([jnp.stack([o[0] for o in row])
                               for row in outs]),
                    jnp.stack([jnp.stack([o[1] for o in row])
                               for row in outs]),
                )

            def add_ct(a, b):
                outs_lo, outs_hi = [], []
                for k in range(2):
                    row_lo, row_hi = [], []
                    for j2 in range(nl):
                        o = w.add_mod(
                            (a[0][k, j2], a[1][k, j2]),
                            (b[0][k, j2], b[1][k, j2]), moduli[j2]
                        )
                        row_lo.append(o[0])
                        row_hi.append(o[1])
                    outs_lo.append(jnp.stack(row_lo))
                    outs_hi.append(jnp.stack(row_hi))
                return jnp.stack(outs_lo), jnp.stack(outs_hi)

            acc = None
            gi = 0
            for gidx, (j, ds) in enumerate(group_list):
                plo_g, phi_g = p_args[2 * gidx], p_args[2 * gidx + 1]
                inner = None
                for di, d in enumerate(ds):
                    term = mul_plain(
                        babies[d % n1], plo_g[di], phi_g[di]
                    )
                    inner = term if inner is None else add_ct(inner, term)
                if j:
                    ka, kb, kc, kd, cI, mM = g_args[6 * gi : 6 * gi + 6]
                    gi += 1
                    rlo, rhi = galois_mxu.apply_galois_mxu_pair(
                        inner[0], inner[1], cI, mM,
                        hi_limbs=galois_mxu.hi_limb_count(moduli),
                    )
                    olo, ohi = ks._build(
                        rlo[1][None], rhi[1][None], ka, kb, kc, kd,
                        jnp.stack(
                            [rlo[0], jnp.zeros_like(rlo[0])]
                        )[None],
                        jnp.stack(
                            [rhi[0], jnp.zeros_like(rhi[0])]
                        )[None],
                        m4,
                    )
                    inner = (olo[0], ohi[0])
                acc = inner if acc is None else add_ct(acc, inner)
            return w.interleave_jnp(acc[0], acc[1])

        self._rot_fn[key] = jax.jit(fn)
    rest = (msf4,) + baby_args + giant_args + diag_args
    out32 = self._rot_fn[key](h.data32, *rest)
    out = DeviceCkksCiphertext(out32, h.level, h.scale * self.ctx.scale)
    if return_program:
        # (result, traced fn, staged operand tuple) — for dependent-chain
        # benchmarking: call fn(data32, *rest) with the operands riding
        # the chain carry (NOT closed over: large closed-over device
        # arrays embed as HLO constants and can exceed the remote-compile
        # request limit on tunneled runtimes)
        return out, self._rot_fn[key], rest
    return out


DeviceCkksEvaluator.linear_transform = _evaluator_linear_transform
DeviceCkksEvaluator.linear_transform_fused = _evaluator_linear_transform_fused
