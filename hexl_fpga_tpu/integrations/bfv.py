"""BFV scheme on top of the accelerated primitives — the reference's other
SEAL target.

The reference's SEAL bridge accelerates `switch_key_inplace` for BFV
relinearization and rotations (the BFV keyswitch IS the plain CKKS-style
keyswitch: the message sits in the high bits, so the tail's rounding error
lands in the noise — `device/keyswitch/ms.hpp:27-84`).  BFV ciphertext
multiplication, by contrast, is NOT a dyadic NTT-domain product: it is a
coefficient-domain tensor product over the integers scaled by t/Q with
rounding, which SEAL runs on the CPU (BEHZ/HPS base extension) even with
the FPGA attached.  This module mirrors that split:

  * relinearization / rotation -> api-compatible KeySwitch (accelerated;
    `CkksContext._keyswitch_accumulate` unchanged)
  * multiplication             -> exact host big-int tensor product with
    divide-and-round by t/Q (the textbook definition the RNS algorithms
    approximate), so every test asserts equality mod t
  * batching                   -> the shared BatchEncoder (bgv.BatchEncoder;
    SEAL BatchEncoder semantics, t ≡ 1 mod 2n)
  * modulus switching          -> divide-and-round drop of q_last (the
    message rides the MSB: Delta m / q_last ≈ Delta' m, the rounding error
    joins the noise — no correction factor needed, unlike BGV)

Add/sub/rotate/conjugate and the device-resident evaluator machinery are
inherited from the CKKS module unchanged (scale stays 1.0; BFV switching
keys are the standard unscaled-gadget keys CkksContext already builds).
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np

from ..ops import golden, nt
from . import ckks
from .bgv import BatchEncoder
from .ckks import Ciphertext


def _div_round(num: int, den: int) -> int:
    """round(num / den) in EXACT integer arithmetic (den > 0; half rounds
    up).  Float division silently loses precision beyond 2^53 — the tensor
    products here reach hundreds of bits."""
    return (2 * num + den) // (2 * den)


class BfvContext(ckks.CkksContext):
    """Parameters + keys for one BFV instantiation.

    moduli: decomp primes q_0..q_{L-1} plus the special prime P last.
    t: plaintext modulus, prime, t ≡ 1 mod 2n (batching).  Messages are
    (n,) integer vectors mod t; Ciphertext.scale stays 1.0 (BFV needs no
    scale/correction bookkeeping — the Delta = floor(Q/t) factor is a
    function of the level)."""

    def __init__(self, n: int, moduli: Sequence[int], t: int, seed: int = 0):
        from math import gcd

        t = int(t)
        assert t >= 2
        for q in moduli:
            assert gcd(int(q), t) == 1, "moduli must be coprime to t"
        self.t = t
        super().__init__(n, moduli, scale=1.0, seed=seed)
        self.encoder = BatchEncoder(n, t)

    # -- level helpers ---------------------------------------------------------

    def _Q(self, nl: int) -> int:
        Q = 1
        for q in self.moduli[:nl]:
            Q *= q
        return Q

    def _delta(self, nl: int) -> int:
        return self._Q(nl) // self.t

    def _lift_centered(self, data: np.ndarray, nl: int) -> List[int]:
        """NTT-limb rows (nl, n) -> centered big-int coefficients mod Q."""
        Q = self._Q(nl)
        coeff = np.stack(
            [
                golden.inv_ntt(data[j], self.moduli[j], self.tabs[j])
                for j in range(nl)
            ]
        )
        out = [0] * self.n
        for j in range(nl):
            q = self.moduli[j]
            Qi = Q // q
            mul = Qi * nt.inverse_mod(Qi % q, q)
            for k in range(self.n):
                out[k] = (out[k] + int(coeff[j, k]) * mul) % Q
        return [v - Q if v > Q // 2 else v for v in out]

    # -- encode / decode -------------------------------------------------------

    def encode(self, z, level: int | None = None, scale=None) -> List[int]:
        """(n,) slot values mod t -> centered plaintext poly mod t (the
        Delta scaling happens at encrypt/add_plain, as in SEAL)."""
        z = np.asarray(z)
        assert z.shape == (self.n,), "BFV encodes n slots (2 x n/2 matrix)"
        return self.encoder.to_poly(z.astype(np.uint64))

    def decode(self, m_int: List[int], scale=None) -> np.ndarray:
        return self.encoder.to_slots(m_int)

    # -- encrypt / decrypt -----------------------------------------------------

    def encrypt(self, z, noise_bound: int = 3) -> Ciphertext:
        n, L = self.n, self.L
        Qd = self._Q(L)
        delta = self._delta(L)
        m_int = [delta * v for v in self.encode(z)]
        rng = self._rng
        a_int = [int(rng.integers(0, 1 << 62)) % Qd for _ in range(n)]
        e = [int(v) for v in rng.integers(-noise_bound, noise_bound + 1,
                                          size=n)]
        from ..utils import vectors

        b_int = vectors._negacyclic_mul([(-v) % Qd for v in a_int], self.s,
                                        Qd)
        b_int = [(bv + ev + mv) % Qd for bv, ev, mv in zip(b_int, e, m_int)]
        data = np.stack(
            [self._to_ntt_limbs(b_int, L), self._to_ntt_limbs(a_int, L)]
        )
        return Ciphertext(data=data, level=L - 1, scale=1.0)

    def decrypt(self, ct: Ciphertext) -> np.ndarray:
        """m = round(t * [c0 + c1 s]_Q / Q) mod t, then slot-decode."""
        nl = ct.level + 1
        Q = self._Q(nl)
        v = self._raw_decrypt(ct)
        m = [_div_round(self.t * x, Q) % self.t for x in v]
        return self.decode(m)

    def noise_budget(self, ct: Ciphertext) -> int:
        """SEAL's invariant_noise_budget analog: bits of headroom before
        decryption fails.  v = [c0 + c1 s]_Q carries t*v/Q = m + frac with
        |frac| < 1/2 required for correctness; the budget is
        floor(log2(Q / (2 * max |[t*v]_Q centered|))) — 0 means the next
        operation may corrupt the message."""
        import math

        nl = ct.level + 1
        Q = self._Q(nl)
        v = self._raw_decrypt(ct)
        worst = max(
            abs(r - Q if r > Q // 2 else r)
            for r in ((self.t * x) % Q for x in v)
        )
        if worst == 0:
            return Q.bit_length() - 1
        return max(0, int(math.floor(math.log2(Q / (2 * worst)))))

    def _raw_decrypt(self, ct: Ciphertext) -> List[int]:
        """Centered [c0 + c1 s]_Q (big ints)."""
        nl = ct.level + 1
        Q = self._Q(nl)
        from ..utils import vectors

        s_mod = [v % Q for v in self.s]
        c0 = self._lift_centered(ct.data[0, :nl], nl)
        c1 = self._lift_centered(ct.data[1, :nl], nl)
        cs = vectors._negacyclic_mul([v % Q for v in c1], s_mod, Q)
        out = [(a + b) % Q for a, b in zip(c0, cs)]
        return [v - Q if v > Q // 2 else v for v in out]

    # -- homomorphic ops -------------------------------------------------------

    def _keyswitch_accumulate(self, d01: np.ndarray, t_ntt: np.ndarray,
                              keys) -> np.ndarray:
        """result (2, nl, n) += KeySwitch(t) — the plain CKKS/BFV tail,
        through the golden model so the host tier works at any n (the
        public api.KeySwitch enforces the reference's n >= 1024; the
        accelerated route is covered by the device-evaluator tests)."""
        nl = d01.shape[1]
        out = golden.keyswitch(
            d01.reshape(-1).copy(), t_ntt.ravel(), self.n, nl, self.K,
            nl + 1, 2, self.moduli, keys, self.modswitch_factors,
            self.twiddle_factors,
        )
        return out.reshape(2, nl, self.n)

    def multiply(self, ct1: Ciphertext, ct2: Ciphertext):
        """Textbook BFV tensor product: exact integer negacyclic products of
        the centered lifts, scaled by t/Q with rounding — the operation the
        RNS (BEHZ/HPS) algorithms approximate.  Returns ((3, nl, n) NTT
        limbs, scale) like CkksContext.multiply, feeding relinearize()."""
        assert ct1.level == ct2.level
        nl = ct1.level + 1
        n = self.n
        Q = self._Q(nl)
        a = [self._lift_centered(ct1.data[k, :nl], nl) for k in range(2)]
        b = [self._lift_centered(ct2.data[k, :nl], nl) for k in range(2)]

        def negacyclic_int(x, y):
            out = [0] * n
            for i, xi in enumerate(x):
                if xi == 0:
                    continue
                for jj, yj in enumerate(y):
                    k = i + jj
                    if k < n:
                        out[k] += xi * yj
                    else:
                        out[k - n] -= xi * yj
            return out

        t01 = negacyclic_int(a[0], b[1])
        t10 = negacyclic_int(a[1], b[0])
        raw = [
            negacyclic_int(a[0], b[0]),
            [u + v for u, v in zip(t01, t10)],
            negacyclic_int(a[1], b[1]),
        ]
        d = np.zeros((3, nl, n), dtype=np.uint64)
        for c in range(3):
            scaled = [_div_round(self.t * v, Q) % Q for v in raw[c]]
            d[c] = self._to_ntt_limbs(scaled, nl)
        return d, 1.0

    def _behz(self, nl: int):
        """Per-level BEHZ RNS tool (ops/rns_behz.py), cached."""
        if not hasattr(self, "_behz_tools"):
            self._behz_tools = {}
        if nl not in self._behz_tools:
            from ..ops import rns_behz

            # aux_bits auto: BehzTool widens the Bsk primes until the BEHZ
            # range condition prod(B)*m_sk > 2*t*n*(k+2)^2*prod(q) holds
            # (and raises if it can't) — the old min(51, bits) cap could
            # silently under-size Bsk for large t and corrupt decryption
            self._behz_tools[nl] = rns_behz.BehzTool(
                self.n, self.moduli[:nl], self.t
            )
        return self._behz_tools[nl]

    def _behz_tpu(self, nl: int):
        """Per-level DEVICE BEHZ tool (ops/rns_behz_tpu.py), cached; None
        when the shape is below the MXU kernel floor (n < 1024) or the
        auto-sized Bsk primes exceed the plan's 2^55 ceiling — the host
        tool then serves (same results, same tests)."""
        if not hasattr(self, "_behz_tpu_tools"):
            self._behz_tpu_tools = {}
        if nl not in self._behz_tpu_tools:
            from ..ops import rns_behz_tpu

            try:
                import jax

                # CPU backend: the XLA butterfly engines (interpret-mode
                # Pallas execution of ~17k+7 transforms costs minutes per
                # multiply); TPU: the fused MXU kernels
                cpu = jax.devices()[0].platform == "cpu"
                self._behz_tpu_tools[nl] = rns_behz_tpu.BehzTpu(
                    self._behz(nl), self.tabs[:nl],
                    engine_impl="xla" if cpu else "mxu",
                )
            except ValueError:
                self._behz_tpu_tools[nl] = None
        return self._behz_tpu_tools[nl]

    def multiply_rns(self, ct1: Ciphertext, ct2: Ciphertext,
                     device: bool | None = None):
        """Full-RNS BFV multiply (BEHZ): limb-wise base extension +
        NTT-domain tensor + fast floor + Shenoy back-conversion.  No
        big-int convolution anywhere — and the whole pipeline runs ON THE
        DEVICE (ops/rns_behz_tpu.py: fused MXU NTTs + u32-pair lane math
        in one jit) whenever the shape fits the MXU kernels (n >= 1024);
        device=None auto-selects, True forces (raising if unsupported),
        False forces the host NumPy tool (ops/rns_behz.py — the oracle the
        device path is bit-exact against, tests/test_rns_behz_tpu.py).
        Result differs from `multiply` only by the bounded BEHZ correction
        terms, which land in the noise: decryption agrees whenever the
        budget is positive (tests/test_rns_behz.py).  Beyond reference
        capability: SEAL computes this on the CPU even with the FPGA
        attached."""
        assert ct1.level == ct2.level
        nl = ct1.level + 1
        c1 = np.asarray(ct1.data[:, :nl], dtype=np.uint64)
        c2 = np.asarray(ct2.data[:, :nl], dtype=np.uint64)
        tpu = self._behz_tpu(nl) if device in (None, True) else None
        if device is True and tpu is None:
            raise ValueError(
                "device BEHZ unavailable at this shape (n < 1024 or Bsk "
                "primes beyond the MXU plan)"
            )
        if tpu is not None:
            return tpu.multiply(c1, c2), 1.0
        return self._behz(nl).multiply(c1, c2, self.tabs[:nl]), 1.0

    def rescale(self, ct: Ciphertext) -> Ciphertext:
        raise TypeError(
            "rescale is a CKKS operation; BFV noise management is "
            "mod_switch_to_next (divide-and-round drop of q_last)"
        )

    def mod_switch_to_next(self, ct: Ciphertext) -> Ciphertext:
        """Drop q_last by exact division after subtracting the centered
        residue (the CKKS-style tail): Delta m / q_last lands within 1 of
        Delta' m, the difference joining the noise — the message rides the
        MSB so no mod-t correction is needed (contrast bgv.BgvContext)."""
        nl = ct.level + 1
        assert nl >= 2
        ql = self.moduli[nl - 1]
        ql_half = ql >> 1
        out = np.zeros((2, nl - 1, self.n), dtype=np.uint64)
        for k in range(2):
            d = golden.inv_ntt(ct.data[k, nl - 1], ql, self.tabs[nl - 1])
            e = (d.astype(object) + ql_half) % ql  # e - ql_half = [c]_ql
            for j in range(nl - 1):
                q = self.moduli[j]
                inv_ql = nt.inverse_mod(ql % q, q)
                fix = q - (ql_half % q)
                f = (e + fix) % q
                c = ct.data[k, j].astype(object)
                g = golden.fwd_ntt(f.astype(np.uint64), q, self.tabs[j])
                out[k, j] = (
                    (c - g.astype(object)) % q * inv_ql % q
                ).astype(np.uint64)
        return Ciphertext(data=out, level=ct.level - 1, scale=1.0)

    def add_plain(self, ct: Ciphertext, z) -> Ciphertext:
        """ct + Delta * encode(z) (SEAL multiply_add_plain_with_scaling)."""
        nl = ct.level + 1
        delta = self._delta(nl)
        m_int = [delta * v for v in self.encode(z)]
        m_ntt = self._to_ntt_limbs(m_int, nl)
        out = ct.data.copy()
        for j in range(nl):
            q = np.uint64(self.moduli[j])
            with np.errstate(over="ignore"):
                s = out[0, j] + m_ntt[j]
            out[0, j] = np.where(s >= q, s - q, s)
        return Ciphertext(data=out, level=ct.level, scale=1.0)

    def multiply_plain(self, ct: Ciphertext, z) -> Ciphertext:
        """ct * encode(z): pointwise NTT multiply per limb — the plain poly
        is NOT Delta-scaled (message becomes Delta * m1 * m2)."""
        nl = ct.level + 1
        m_ntt = self._to_ntt_limbs(self.encode(z), nl)
        out = np.zeros_like(ct.data)
        for k in range(2):
            for j in range(nl):
                q = self.moduli[j]
                out[k, j] = (
                    ct.data[k, j].astype(object)
                    * m_ntt[j].astype(object) % q
                ).astype(np.uint64)
        return Ciphertext(data=out, level=ct.level, scale=1.0)
