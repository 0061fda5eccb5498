"""BGV scheme on top of the accelerated primitives — exact integer HE.

The reference accelerates SEAL's two hot primitives (DyadicMultiply,
KeySwitch) for CKKS/BFV, whose messages live in the high-order bits so the
keyswitch tail's rounding error lands in the noise
(`device/keyswitch/ms.hpp:27-84`).  SEAL 4.0 also ships BGV
(scheme_type::bgv), whose message lives in the LSB mod t — every division
step must subtract a value divisible by t.  This module provides that
scheme end to end on the same accelerated primitives:

  * ciphertext x ciphertext multiply -> api.DyadicMultiply (unchanged; the
    tensor product is scheme-agnostic)
  * relinearization / rotation       -> the BGV-mode keyswitch
    (`keyswitch_tpu` with plain_modulus=t: GHS-corrected tail, noise
    divisible by t — see tests/test_keyswitch_bgv.py)
  * batching (SEAL BatchEncoder): t ≡ 1 (mod 2n), slots are evaluations at
    the odd powers of a primitive 2n-th root of unity mod t, laid out as a
    2 x n/2 matrix; rotate = Galois 5^r (row rotation), conjugate = row
    swap (SEAL rotate_columns)
  * BGV modulus switching (Gentry-Halevi-Smart): drop q_last by exact
    division after subtracting a correction divisible by t; the message
    picks up a factor q_last^{-1} mod t tracked SEAL-style as a ciphertext
    correction factor (SEAL's BGVCorrectionFactor).

BGV is EXACT: every test asserts equality mod t, not precision bounds.
Everything except the two accelerated ops runs in exact host arithmetic;
the ciphertext layout, key gadget and keyswitch contract are identical to
the CKKS module's (this class reuses CkksContext's RLWE machinery and
differs only in encode/decode, the tail correction, and noise scaling).
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np

from ..ops import golden, nt, twiddles
from . import ckks
from .ckks import Ciphertext


class BatchEncoder:
    """SEAL BatchEncoder analog, shared by the BGV and BFV schemes.

    Requires t ≡ 1 (mod 2n): the n slots are the evaluations of m(X) at the
    odd powers of a primitive 2n-th root of unity mod t, laid out as a
    2 x n/2 matrix — row 0 at exponents 5^j, row 1 at -5^j (the same orbits
    the CKKS embedding uses, so the device evaluators' Galois sigma tables
    apply unchanged: rotate = 5^r, conjugate/rotate_columns = row swap)."""

    def __init__(self, n: int, t: int):
        assert (t - 1) % (2 * n) == 0, "batching needs t ≡ 1 (mod 2n)"
        self.n = n
        self.t = t
        self.tab_t = twiddles.ntt_tables(n, t)
        b = n.bit_length() - 1
        br = np.array([int(bin(p)[2:].zfill(b)[::-1], 2) for p in range(n)])
        e_of_pos = 2 * br + 1  # golden NTT position p evaluates psi^e
        pos_of_e = np.zeros(2 * n, dtype=np.int64)
        pos_of_e[e_of_pos] = np.arange(n)
        half = n // 2
        g = np.array([pow(5, j, 2 * n) for j in range(half)])
        self.slot_pos = np.concatenate(
            [pos_of_e[g], pos_of_e[(2 * n - g) % (2 * n)]]
        )  # (n,) NTT position of slot j (row-major 2 x n/2)

    def to_poly(self, vals) -> List[int]:
        """(n,) slot values mod t -> centered poly coefficients."""
        a = np.zeros(self.n, dtype=np.uint64)
        a[self.slot_pos] = np.asarray(vals, dtype=np.uint64)
        m = golden.inv_ntt(a, self.t, self.tab_t)
        return [int(v) - self.t if int(v) > self.t // 2 else int(v)
                for v in m]

    def to_slots(self, m_int) -> np.ndarray:
        """poly coefficients (any lift) -> (n,) slot values mod t."""
        arr = np.array([v % self.t for v in m_int], dtype=np.uint64)
        return golden.fwd_ntt(arr, self.t, self.tab_t)[self.slot_pos]


class BgvContext(ckks.CkksContext):
    """Parameters + keys for one BGV instantiation.

    moduli: decomp primes q_0..q_{L-1} plus the special prime P last (the
    reference keyswitch layout).  t: plaintext modulus, prime, t ≡ 1 mod 2n
    (batching) and coprime to every q (exact division steps).

    Ciphertext.scale carries the SEAL-style CORRECTION FACTOR cf (an exact
    small integer in a float): decrypt returns [m * cf^{-1}]_t, and
    mod_switch_to_next multiplies cf by q_last^{-1} mod t instead of
    rescaling the message."""

    def __init__(self, n: int, moduli: Sequence[int], t: int, seed: int = 0):
        from math import gcd

        t = int(t)
        assert t >= 2
        assert (t - 1) % (2 * n) == 0, "batching needs t ≡ 1 (mod 2n)"
        for q in moduli:
            assert gcd(int(q), t) == 1, "moduli must be coprime to t"
        self.t = t
        self._noise_scale = t  # fresh/key errors are t*e (BGV form)
        super().__init__(n, moduli, scale=1.0, seed=seed)
        self.encoder = BatchEncoder(n, t)

    # -- encode / decode (SEAL BatchEncoder analog) ---------------------------

    def encode(self, z, level: int | None = None, scale=None) -> List[int]:
        """(n,) integer vector mod t -> centered poly coefficients.

        Layout matches SEAL's BatchEncoder: first n/2 entries are row 0,
        last n/2 are row 1.  `scale`, when given (add_plain at a switched
        level), is the ciphertext's correction factor: the plaintext is
        pre-multiplied by cf so it adds into [cf * m]_t coherently."""
        z = np.asarray(z)
        assert z.shape == (self.n,), "BGV encodes n slots (2 x n/2 matrix)"
        cf = 1 if scale is None else int(round(scale)) % self.t
        vals = ((z.astype(object) * cf) % self.t).astype(np.uint64)
        # centered into (-t/2, t/2] so the lift into Q adds minimal noise
        return self.encoder.to_poly(vals)

    def decode(self, m_int: List[int], scale) -> np.ndarray:
        """Centered coefficients -> (n,) slot values mod t, correcting by
        the ciphertext's factor cf (scale): returns [m * cf^{-1}]_t."""
        cf = int(round(scale)) % self.t
        a = self.encoder.to_slots(m_int)
        inv_cf = nt.inverse_mod(cf, self.t)
        return (a.astype(object) * inv_cf % self.t).astype(np.uint64)

    def noise_budget(self, ct: Ciphertext) -> int:
        """Bits of headroom before the centered value [c0 + c1 s]_Q wraps Q
        and decryption fails: floor(log2(Q / (2 * max |v|))).  BGV carries
        v = cf*m + t*e — unlike BFV there is no fractional rounding, the
        whole centered magnitude is the budget consumer."""
        import math

        from .ckks import _obj

        nl = ct.level + 1
        moduli = self.moduli[:nl]
        Q = 1
        for q in moduli:
            Q *= q
        # centered [c0 + c1 s]_Q via per-limb decrypt + CRT (the parent's
        # decrypt body, stopping before the mod-t step)
        coeff = np.zeros((nl, self.n), dtype=np.uint64)
        for j, q in enumerate(moduli):
            s_ntt = golden.fwd_ntt(
                np.array([v % q for v in self.s], dtype=np.uint64), q,
                self.tabs[j],
            )
            v = (
                _obj(ct.data[0, j]) + _obj(ct.data[1, j]) * s_ntt.astype(object)
            ) % q
            coeff[j] = golden.inv_ntt(v.astype(np.uint64), q, self.tabs[j])
        m = [0] * self.n
        for j, q in enumerate(moduli):
            Qi = Q // q
            mul = Qi * nt.inverse_mod(Qi % q, q)
            for k in range(self.n):
                m[k] = (m[k] + int(coeff[j, k]) * mul) % Q
        worst = max(abs(v - Q if v > Q // 2 else v) for v in m)
        if worst == 0:
            return Q.bit_length() - 1
        return max(0, int(math.floor(math.log2(Q / (2 * worst)))))

    # -- scheme-specific overrides -------------------------------------------

    def _keyswitch_accumulate(self, d01: np.ndarray, t_ntt: np.ndarray,
                              keys: List[np.ndarray]) -> np.ndarray:
        """result (2, nl, n) += BGV KeySwitch(t): the GHS-corrected tail
        (golden.keyswitch plain_modulus) keeps the rounding delta divisible
        by t, so relinearization/rotation add t-divisible noise only."""
        nl = d01.shape[1]
        result = d01.reshape(-1).copy()
        out = golden.keyswitch(
            result, t_ntt.ravel(), self.n, nl, self.K, nl + 1, 2,
            self.moduli, keys, self.modswitch_factors, self.twiddle_factors,
            plain_modulus=self.t,
        )
        return out.reshape(2, nl, self.n)

    def multiply_relin(self, ct1: Ciphertext, ct2: Ciphertext) -> Ciphertext:
        d, sc = self.multiply(ct1, ct2)
        cf = (int(round(ct1.scale)) * int(round(ct2.scale))) % self.t
        return self.relinearize(d, float(cf), ct1.level)

    def rescale(self, ct: Ciphertext) -> Ciphertext:
        raise TypeError(
            "rescale is a CKKS operation; BGV noise management is "
            "mod_switch_to_next (exact GHS division, correction factor "
            "tracked)"
        )

    def mod_switch_to_next(self, ct: Ciphertext) -> Ciphertext:
        """Drop q_last by the Gentry-Halevi-Smart exact division.

        c' = (c - d') / q_last with d' == c (mod q_last) and d' == 0
        (mod t): d' = [c]_qlast_centered + q_last * u',
        u' = [-[c]_qlast * q_last^{-1}]_t centered.  Noise shrinks by
        ~q_last; the message picks up q_last^{-1} mod t, folded into the
        correction factor (SEAL BGV mod-switch semantics)."""
        nl = ct.level + 1
        assert nl >= 2
        ql = self.moduli[nl - 1]
        ql_half = ql >> 1
        inv_ql_t = nt.inverse_mod(ql % self.t, self.t)
        t_half = self.t >> 1
        out = np.zeros((2, nl - 1, self.n), dtype=np.uint64)
        for k in range(2):
            d = golden.inv_ntt(ct.data[k, nl - 1], ql, self.tabs[nl - 1])
            # e - ql_half is the centered residue [c]_ql; sigma - t_half is
            # the centered u' (the keyswitch tail's exact formulation,
            # golden.keyswitch plain_modulus docstring)
            e = (d.astype(object) + ql_half) % ql
            sigma = ((ql_half - e) * inv_ql_t + t_half) % self.t
            for j in range(nl - 1):
                q = self.moduli[j]
                inv_ql = nt.inverse_mod(ql % q, q)
                fix = (-ql_half - ql * t_half) % q
                f = (e + fix + sigma * (ql % q)) % q  # == d' mod q
                c = ct.data[k, j].astype(object)
                g = golden.fwd_ntt(f.astype(np.uint64), q, self.tabs[j])
                out[k, j] = (
                    (c - g.astype(object)) % q * inv_ql % q
                ).astype(np.uint64)
        cf = (int(round(ct.scale)) * inv_ql_t) % self.t
        return Ciphertext(data=out, level=ct.level - 1, scale=float(cf))


class DeviceBgvEvaluator(ckks.DeviceCkksEvaluator):
    """Device-resident BGV ops: everything DeviceCkksEvaluator compiles
    (rotate/conjugate incl. hoisted, add/sub, plain ops, multiply_relin)
    runs unchanged on BGV ciphertexts — the ONLY differences are the
    keyswitch contexts (plain_modulus=t: the GHS-corrected fused tail),
    correction-factor bookkeeping, and the mod-switch (exact GHS division
    instead of a row slice)."""

    def _ks_ctx(self, nl: int):
        if nl not in self._ks:
            from ..ops import keyswitch_tpu

            self._ks[nl] = keyswitch_tpu.get_context(
                self.ctx.n, nl, self.ctx.K, nl + 1, 2, self.ctx.moduli,
                self.ctx.twiddle_factors, interpret=self.interpret,
                plain_modulus=self.ctx.t,
            )
        return self._ks[nl]

    def multiply_relin(self, h1, h2):
        out = ckks._evaluator_multiply_relin(self, h1, h2)
        out.scale = float(
            (int(round(h1.scale)) * int(round(h2.scale))) % self.ctx.t
        )
        return out

    def rescale(self, h):
        raise TypeError(
            "rescale is a CKKS operation; BGV uses mod_switch_to_next"
        )

    def mod_switch_to_next(self, h):
        """GHS mod-switch on device: INTT of the last limb, the sigma
        correction digit mod t, then per remaining limb one wide-input
        tail NTT and a Harvey multiply by q_last^{-1} — the same kernel
        shapes as the keyswitch tail, one jit per level."""
        import jax
        import jax.numpy as jnp

        from ..ops import nt as _nt, ntt_mxu_pallas, word64 as w

        nl = h.level + 1
        assert nl >= 2
        t = self.ctx.t
        key = ("bgv_ms", nl)
        if key not in self._rot_fn:
            n = self.ctx.n
            moduli = self.ctx.moduli
            ql = moduli[nl - 1]
            ql_half = ql >> 1
            inv_ql_t = _nt.inverse_mod(ql % t, t)
            t_half = t >> 1
            t_barr = _nt.barrett_factor(1, 64, t)
            ks = self._ks_ctx(nl)
            fwd_calls = [
                ntt_mxu_pallas.raw_fwd_call(
                    n, moduli[j], ks.tile_p, psi=ks.psi[j],
                    interpret=self.interpret, canonical=False, data_bits=54,
                )
                for j in range(nl - 1)
            ]
            consts = []
            for j in range(nl - 1):
                q = moduli[j]
                inv_ql = _nt.inverse_mod(ql % q, q)
                consts.append((
                    q,
                    _nt.barrett_factor(1, 64, q),
                    (-ql_half - ql * t_half) % q,
                    ql % q,
                    (inv_ql, _nt.barrett_factor(inv_ql, 64, q)),
                ))

            def fn(data32):
                lo, hi = w.deinterleave_jnp(data32)       # (2, nl, n)
                d = ckks._pad2(
                    ks._inv[nl - 1], lo[:, nl - 1], hi[:, nl - 1], ks.tile_p
                )                                          # canonical u. ql
                e = w.add_mod(d, ql_half, ql)
                e_t = w.barrett_reduce64(e, t, t_barr)
                x = w.cond_sub64(
                    w.add64(w.sub64(w.const_pair(ql_half % t), e_t), t), t
                )
                u = w.mul_mod_static(x, inv_ql_t, t)
                sigma = w.add_mod(u, t_half, t)
                outs_lo, outs_hi = [], []
                for j in range(nl - 1):
                    q, q_barr, fix, ql_mod, (inv_ql, prec) = consts[j]
                    f = w.add64(
                        w.add64(e, w.mul_mod_static(sigma, ql_mod, q)), fix
                    )                                      # < 3*2^52, == d' mod q
                    g = ckks._pad2(fwd_calls[j], f[0], f[1], ks.tile_p)
                    g = w.barrett_reduce64(g, q, q_barr)
                    c = (lo[:, j], hi[:, j])
                    diff = w.cond_sub64(w.add64(w.sub64(c, g), q), q)
                    o = w.cond_sub64(
                        w.mul_mod_lazy(diff, inv_ql, prec, q), q
                    )
                    outs_lo.append(o[0])
                    outs_hi.append(o[1])
                return w.interleave_jnp(
                    jnp.stack(outs_lo, 1), jnp.stack(outs_hi, 1)
                )

            self._rot_fn[key] = jax.jit(fn)
        out32 = self._rot_fn[key](h.data32)
        inv_ql_t = nt.inverse_mod(self.ctx.moduli[nl - 1] % t, t)
        cf = (int(round(h.scale)) * inv_ql_t) % t
        return ckks.DeviceCkksCiphertext(out32, h.level - 1, float(cf))
