"""KeySwitch on TPU: fused MXU NTT kernels composed with XLA glue.

This is the production keyswitch path (the pure-XLA composition in
keyswitch_jax.py is the readable reference implementation; its monolithic
butterfly graph does not compile tractably at N=16384, decomp=6).

Mapping from the reference's ~30-kernel FPGA dataflow (SURVEY.md §3.3):

  FPGA                              here
  ----                              ----
  INTT1 engine (serial over i)      ONE fused-Pallas INTT per decomp modulus,
                                    batched over the ops in flight
  intt1_redu + 7x NTT engines       Barrett reduce in XLA + ONE batched
                                    fused-Pallas NTT per modulus; all L
                                    source limbs ride one kernel call
  7x dyadmult MAC engines           unrolled exact mul_mod_static + add_mod
                                    in XLA (fused elementwise)
  INTT2 (special modulus)           batched fused-Pallas INTT under q_k
  intt2_redu + NTT engines 7,8      the +qk/2 / +fix reduction in XLA; the
                                    final NTTs CONCATENATED into the same
                                    per-modulus kernel call as the engine
                                    NTTs would be — the special-engine chain
                                    runs first so per-q_i work batches once
  ms + store + host accumulate      modswitch multiply + accumulate in XLA

The schedule reorders the reference's engine-parallel pipeline into
special-engine-first so that, per decomp modulus q_i, the (L-1) engine
transforms and the 2 tail transforms share one Pallas dispatch: 14 Mosaic
kernels total for the 16384_6_7_7_2 benchmark config instead of 56
transform instances.

Bit-exact with the golden model; caller twiddle tables are honored by
deriving the 2n-th root from the table (fwd[bit_reverse(1)] = psi) and
rebuilding the four-step plan from it.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import nt, ntt_mxu_pallas, twiddles, word64 as w

Pair = Tuple[jnp.ndarray, jnp.ndarray]


def _pad_rows(lo, hi, mult: int):
    B = lo.shape[0]
    pad = (-B) % mult
    if pad:
        lo = jnp.concatenate([lo, jnp.zeros((pad,) + lo.shape[1:], lo.dtype)])
        hi = jnp.concatenate([hi, jnp.zeros((pad,) + hi.shape[1:], hi.dtype)])
    return lo, hi, B


class KeySwitchTpuContext:
    """Compiled TPU keyswitch for one static configuration.

    Same fence semantics as the reference scheduler: keyed by
    (n, decomp, key_modulus, rns, components, moduli, twiddles)."""

    def __init__(
        self,
        n: int,
        decomp_modulus_size: int,
        key_modulus_size: int,
        rns_modulus_size: int,
        key_component_count: int,
        moduli: Sequence[int],
        twiddle_factors: Optional[np.ndarray] = None,
        tile_p: int = 4,
        interpret: bool = False,
        fused_mac: bool = False,
        fused_tail: bool = True,
        plain_modulus: Optional[int] = None,
        mac_impl: str = "deferred",
    ):
        assert key_component_count == 2, "key_component_count must be 2"
        # rns_modulus_size never reaches the reference's computation: it is
        # fence-only metadata (`host/src/fpga_int.cpp:443`); the device
        # kernel launches receive n / decomp_modulus_size / modulus_meta
        # only (`host/src/fpga.cpp:1296-1301,1560-1565`).  Match that:
        # accept any positive value (it stays in the context cache key so
        # config changes fence exactly as the reference does) and compute
        # from (n, decomp, key_modulus, comp) alone.
        assert rns_modulus_size > 0, "requires rns_modulus_size > 0"
        self.n = n
        self.L = decomp_modulus_size
        self.K = key_modulus_size
        self.comp = key_component_count
        self.moduli = tuple(int(m) for m in moduli)
        self.tile_p = tile_p
        self.interpret = interpret
        # MAC schedule: "deferred" (approx-quotient Harvey, deferred Q*q —
        # the production schedule) or "exact128" (quotient-free 128-bit
        # accumulation, no precon reads — the algorithm-shape probe)
        assert mac_impl in ("deferred", "exact128"), mac_impl
        self.mac_impl = mac_impl
        if mac_impl == "exact128":
            # instance attributes shadow the class staticmethods; every MAC
            # consumer (_build, _apply_hoisted) dispatches through self
            self._mac_term = KeySwitchTpuContext._mac_term128
            self._mac_close = KeySwitchTpuContext._mac_close128
        assert self.K - 1 >= self.L, "special modulus must not be a decomp modulus"
        # 2n-th roots: derived from the caller's tables when provided
        # (fwd[bit_reverse(1)] = psi), else the canonical minimal root
        if twiddle_factors is not None:
            view = twiddles.decode_keyswitch_twiddles(twiddle_factors, n, self.K)
            self.psi = [int(view.fwd[j][n // 2]) for j in range(self.K)]
        else:
            self.psi = [None] * self.K
        self.qk = self.moduli[self.K - 1]
        self.qk_half = self.qk >> 1
        self.q_barr = [nt.barrett_factor(1, 64, q) for q in self.moduli]
        # BGV mode (plain_modulus = t): the tail subtracts d' = [d]_qk + qk*u'
        # with u' = [-[d]_qk * qk^{-1}]_t centered — divisible by t, so the
        # switched ciphertext stays exact mod t (golden.keyswitch docstring;
        # the reference tail `keyswitch/ms.hpp:27-84` is CKKS/BFV-only).
        # Implemented as a per-coefficient digit sigma = u' + t/2 in [0, t)
        # computed once from the INTT2 output, then folded into each decomp
        # tail as e += sigma * (qk mod q_j) with a BGV fix constant; the
        # widened f < qk + 2q < 2^54 still rides the 7-limb wide-input
        # transforms exactly (capacity 2^56).
        self.plain_modulus = None if plain_modulus is None else int(plain_modulus)
        if self.plain_modulus is not None:
            t = self.plain_modulus
            from math import gcd

            assert t >= 2, "plain_modulus must be >= 2"
            assert gcd(self.qk, t) == 1, (
                "special modulus must be coprime to plain_modulus"
            )
            assert t < min(self.moduli), (
                "plain_modulus must be below every coefficient modulus"
            )
            self.t_half = t >> 1
            self.inv_qk_t = nt.inverse_mod(self.qk % t, t)
            self.qk_half_t = self.qk_half % t
            self.t_barr = nt.barrett_factor(1, 64, t)
            self._fix = [
                (-self.qk_half - self.qk * self.t_half) % self.moduli[j]
                for j in range(self.L)
            ]
            self._qk_mod = [self.qk % self.moduli[j] for j in range(self.L)]
        else:
            self._fix = [
                self.moduli[j] - (self.qk_half % self.moduli[j])
                for j in range(self.L)
            ]
        # fused-Pallas transform callables (unjitted; composed in one jit).
        # Forward transforms emit LAZY u64 representatives — their consumers
        # (the Harvey lazy MAC, the tail's Barrett into the SAME modulus) are
        # all mod-q_j-linear, so any representative is exact.  The inverse
        # transforms MUST stay canonical: INTT1's output value is reduced
        # into OTHER moduli (intt1_redu) and INTT2's into AddUIntMod — both
        # depend on the integer representative, not just the residue.
        # data_bits=53: the forward transforms accept UNREDUCED inputs (a
        # residue canonical under ANOTHER modulus, < 2^52, or e + fix
        # < q_k + q_j < 2^53) — the transform is mod-q-linear and the limb
        # pipeline exact to 2^56, so the Barrett passes that used to sit in
        # front of every engine/tail NTT (the intt1_redu / intt2_redu
        # analogs) fold into the kernels' limb split for free.
        self._fwd = [
            ntt_mxu_pallas.raw_fwd_call(n, q, tile_p, psi=self.psi[j],
                                        interpret=interpret, canonical=False,
                                        data_bits=53)
            for j, q in enumerate(self.moduli)
        ]
        self._inv = [
            ntt_mxu_pallas.raw_inv_call(n, q, tile_p, psi=self.psi[j],
                                        interpret=interpret)
            for j, q in enumerate(self.moduli)
        ]
        # fused tail kernels (one per decomp modulus): +fix prologue, tail
        # NTT, accumulator+output Barrett, ms.hpp modswitch, ciphertext
        # accumulate — one VMEM-resident pass instead of ~10 HBM-bound XLA
        # elementwise kernels per modulus (VERDICT r2 'what's weak' #4).
        self.fused_tail = fused_tail
        if fused_tail:
            self._tail = [
                ntt_mxu_pallas.raw_fwd_tail_call(
                    n, self.moduli[j], self._fix[j],
                    tile_p, psi=self.psi[j], interpret=interpret,
                    data_bits=54 if self.plain_modulus is not None else None,
                )
                for j in range(self.L)
            ]
        # fused transform+MAC engines (`dyadmult.hpp` in one kernel): the
        # engine NTT outputs accumulate against the keys in VMEM and never
        # round-trip HBM; skip_i marks the identity limb whose term comes
        # from t_target directly.  Measured on v5e it is NOT faster than
        # the separate-MAC schedule (2.9K vs 3.1K op/s hoist-proof at
        # 16384_6_7_7_2 — the XLA MAC glue was already fused/minor), so it
        # stays off by default; it may win on parts with different
        # VMEM/HBM balance.
        self.fused_mac = fused_mac
        if fused_mac:
            L = self.L
            # L == 1: the decomp engine's only MAC term is the t_target
            # identity limb (added outside the kernel) — a skip_i kernel
            # would have every grid step predicated off and return an
            # uninitialized accumulator, so build none (engine_acc skips it).
            self._mac = [
                ntt_mxu_pallas.raw_fwd_mac_call(
                    n, self.moduli[j], L, self.comp, tile_p, skip_i=j,
                    psi=self.psi[j], interpret=interpret, data_bits=53,
                )
                if L >= 2 else None
                for j in range(L)
            ]
            self._mac_sp = ntt_mxu_pallas.raw_fwd_mac_call(
                n, self.qk, L, self.comp, tile_p, skip_i=None,
                psi=self.psi[self.K - 1], interpret=interpret, data_bits=53,
            )
        self._fn = jax.jit(self._build)
        self._fn32 = jax.jit(self._build32)
        self._fn32p = jax.jit(self._build32p)

    # -- jitted body --------------------------------------------------------

    @staticmethod
    def _mac_term(acc, val, key, kp):
        """One Harvey lazy MAC term with (a) the APPROXIMATE quotient (one
        fewer 32x32 partial product per term) and (b) the Q*q subtraction
        DEFERRED across the whole sum: accumulate sum(w_i*x_i mod 2^64) and
        sum(Q_i) separately and subtract (sum Q)*q ONCE per engine-component
        (_mac_close) — exact because the true value sum(w_i x_i - Q_i q) is
        a sum of [0, 4q) terms, < 28q < 2^58 for q <= 2^52, so the mod-2^64
        arithmetic is lossless.  Replaces 10 32x32 partials per term with 6
        (+3 once at close); the downstream two-correction Barrett
        canonicalizes exactly."""
        Q = w.mulhi64_approx(val, kp)
        wx = w.mullo64(key, val)
        if acc is None:
            return (wx, Q)
        return (w.add64(acc[0], wx), w.add64(acc[1], Q))

    @staticmethod
    def _mac_close(acc, q):
        """(sum wx mod 2^64, sum Q) -> the lazy u64 sum < 28q."""
        return w.sub64(acc[0], w.mullo64(acc[1], q))

    @staticmethod
    def _mac_term128(acc, val, key, kp):
        """QUOTIENT-FREE MAC term (mac_impl="exact128"): accumulate the full
        128-bit product key*val into a 4-limb u32 accumulator — no Harvey
        quotient per term and the precon tables are never read (halving the
        MAC's key-side HBM traffic).  Exact: key < q < 2^52, val any u64
        representative, so each product < 2^116 and a <= 7-term sum < 2^119
        fits 128 bits.  The reference's per-term Harvey/Barrett schedule is
        `device/keyswitch/dyadmult.hpp:116-160`; this trades its per-term
        quotient math for one wide reduction per engine-component
        (_mac_close128); measured A/B against the deferred schedule in
        scripts/probe_r4_mac.py (results in doc/roofline.md)."""
        del kp  # quotient-free: preconditioners unused
        p = w.mul64_full(key, val)
        if acc is None:
            return p
        return w.add128(acc, p)

    @staticmethod
    def _mac_close128(acc, q):
        """4-limb accumulator (< 2^119) -> lazy u64 representative < 4q.

        V = A + 2^64*B with A = limbs[0:2] (any u64), B = limbs[2:4]
        (< 2^55).  B reduces exactly (Barrett, B < 2^63); A folds to a
        representative < 3q with one floor(2^64/q) quotient (valid for ANY
        u64 A: the quotient underestimates by < 2, each unit costing +q)."""
        q = int(q)
        barr = (1 << 64) // q
        A = (acc[0], acc[1])
        B = (acc[2], acc[3])
        b = w.barrett_reduce64(B, q, barr)
        t = w.mul_mod_static(b, (1 << 64) % q, q)
        QA = w.mulhi64(A, barr)
        repA = w.sub64(A, w.mullo64(QA, q))
        return w.add64(repA, t)

    def _sigma(self, e):
        """BGV correction digit per coefficient: sigma = [(qk/2 - e) *
        qk^{-1} + t/2]_t, computed ONCE from the INTT2 output e (canonical
        under q_k).  sigma - t/2 is the centered multiple of qk that makes
        the subtracted tail value divisible by t (see __init__)."""
        t = self.plain_modulus
        e_t = w.barrett_reduce64(e, t, self.t_barr)
        x = w.cond_sub64(
            w.add64(w.sub64(w.const_pair(self.qk_half_t), e_t), t), t
        )
        u = w.mul_mod_static(x, self.inv_qk_t, t)
        return w.add_mod(u, self.t_half, t)

    def _tail_j(self, j, e, acc, res, msf4, sigma=None):
        """Per-decomp-modulus tail: INTT2 output e ((comp*B, n), canonical
        under q_k), lazy MAC accumulators acc ([comp] of (B, n) pairs), and
        caller result rows res ([comp] of (B, n) pairs) -> canonical output
        rows per component.  Fused-tail contexts run the single Pallas
        kernel; otherwise the XLA composition (`ms.hpp:27-84` analog).
        sigma (BGV contexts only) folds the mod-t correction into e before
        the transform: f == d' (mod q_j), still < 2^54 wide-input exact."""
        q = self.moduli[j]
        comp = self.comp
        B = acc[0][0].shape[0]
        if sigma is not None:
            e = w.add64(e, w.mul_mod_static(sigma, self._qk_mod[j], q))
        if self.fused_tail:
            # ONE kernel: +fix prologue, tail NTT, Barrett of both the
            # transform output and the LAZY accumulator, ms, accumulate
            acc_l = jnp.concatenate([acc[k][0] for k in range(comp)])
            acc_h = jnp.concatenate([acc[k][1] for k in range(comp)])
            res_l = jnp.concatenate([res[k][0] for k in range(comp)])
            res_h = jnp.concatenate([res[k][1] for k in range(comp)])
            el, eh, _ = _pad_rows(e[0], e[1], self.tile_p)
            al, ah, _ = _pad_rows(acc_l, acc_h, self.tile_p)
            rl, rh, _ = _pad_rows(res_l, res_h, self.tile_p)
            ol, oh = self._tail[j](el, eh, al, ah, rl, rh, msf4[j])
            return [
                (ol[k * B : (k + 1) * B], oh[k * B : (k + 1) * B])
                for k in range(comp)
            ]
        fix = self._fix[j]
        acc = [w.barrett_reduce64(a, q, self.q_barr[j]) for a in acc]
        # tail transforms: f = e + fix (< q_k + 2q_j < 2^54, unreduced)
        f = w.add64(e, fix)
        vlo, vhi = self._transform(self._fwd, j, f[0], f[1])
        # modswitch tail (`ms.hpp:27-84`) + host-style accumulate; the
        # lazy-output transform's u64 representative reduces here
        outs = []
        for k in range(comp):
            g = w.barrett_reduce64(
                (vlo[k * B : (k + 1) * B], vhi[k * B : (k + 1) * B]),
                q, self.q_barr[j],
            )
            t1 = w.reduce_mod_factor(
                w.add64(w.sub64(acc[k], g), 4 * q), q, 8
            )
            msf = (msf4[j, 0], msf4[j, 1])
            delta = w.mul_mod_static(t1, msf, q)
            outs.append(w.cond_sub64(w.add64(res[k], delta), q))
        return outs

    def _transform(self, which, j, lo, hi):
        """Run a fused transform under modulus j on (Bx, n) with padding."""
        lo, hi, B = _pad_rows(lo, hi, self.tile_p)
        olo, ohi = which[j](lo, hi)
        return olo[:B], ohi[:B]

    def _build(self, t_lo, t_hi, keys_lo, keys_hi, kp_lo, kp_hi,
               res_lo, res_hi, msf4):
        """t: (B, L, n); keys + key precons: (L, comp, K, n);
        res: (B, comp, L, n); msf4: (K, 4) uint32 — reduced modswitch
        factors as [lo, hi, precon_lo, precon_hi] rows."""
        n, L, K, comp = self.n, self.L, self.K, self.comp
        B0 = t_lo.shape[0]
        moduli = self.moduli
        qk, qk_half = self.qk, self.qk_half

        # the fused MAC kernels tile the batch: pad B globally (zero rows
        # transform/accumulate to zeros and are sliced off at the end)
        pad = (-B0) % self.tile_p if self.fused_mac else 0
        if pad:
            t_lo = jnp.concatenate(
                [t_lo, jnp.zeros((pad, L, n), t_lo.dtype)])
            t_hi = jnp.concatenate(
                [t_hi, jnp.zeros((pad, L, n), t_hi.dtype)])
            res_lo = jnp.concatenate(
                [res_lo, jnp.zeros((pad, comp, L, n), res_lo.dtype)])
            res_hi = jnp.concatenate(
                [res_hi, jnp.zeros((pad, comp, L, n), res_hi.dtype)])
        B = B0 + pad

        def tp(i):
            return (t_lo[:, i, :], t_hi[:, i, :])

        # INTT1 per decomp modulus (batch B each)
        coeff = [
            self._transform(self._inv, i, t_lo[:, i, :], t_hi[:, i, :])
            for i in range(L)
        ]

        def mac(acc, val, i, k, j, q):
            # deferred-quotient Harvey lazy MAC (see _mac_term)
            key = (keys_lo[i, k, j, :], keys_hi[i, k, j, :])
            kp = (kp_lo[i, k, j, :], kp_hi[i, k, j, :])
            return self._mac_term(acc, val, key, kp)

        mac_close = self._mac_close

        # the stacked INTT1 outputs feed every engine UNREDUCED (the
        # transforms are wide-input; see __init__): one concat, reused by
        # the special engine and all L decomp engines
        sp = K - 1
        stack_lo = jnp.concatenate([c[0] for c in coeff])  # (L*B, n)
        stack_hi = jnp.concatenate([c[1] for c in coeff])

        def engine_acc(j, q, mac_call, skip_t_term):
            """acc[k] (lazy u64 reps, < 28q < 2^58) for engine modulus j."""
            if self.fused_mac and mac_call is None:
                # L == 1 decomp engine: only the identity-limb term exists
                acc = [None] * comp
            elif self.fused_mac:
                alo, ahi = mac_call(
                    stack_lo, stack_hi,
                    keys_lo[:, :, j, :], keys_hi[:, :, j, :],
                    kp_lo[:, :, j, :], kp_hi[:, :, j, :],
                )
                # kernel output is an already-closed lazy sum: carry it as
                # the wx accumulator with a zero deferred quotient
                z = jnp.zeros_like(alo[0])
                acc = [((alo[k], ahi[k]), (z, z)) for k in range(comp)]
            else:
                vlo, vhi = self._transform(self._fwd, j, stack_lo, stack_hi)
                acc = [None] * comp
                for i in range(L):
                    if skip_t_term and i == j:
                        continue
                    val = (vlo[i * B : (i + 1) * B], vhi[i * B : (i + 1) * B])
                    for k in range(comp):
                        acc[k] = mac(acc[k], val, i, k, j, q)
            if skip_t_term:
                # identity limb i == j: INTT_q then NTT_q is the identity on
                # canonical inputs — its MAC term comes from t_target
                for k in range(comp):
                    acc[k] = mac(acc[k], tp(j), j, k, j, q)
            return [mac_close(a, q) for a in acc]

        # ---- special engine first (`dyadmult.hpp` engine K-1 + INTT2) ----
        acc_sp = engine_acc(
            sp, qk, self._mac_sp if self.fused_mac else None, False
        )
        acc_sp = [
            w.barrett_reduce64(a, qk, self.q_barr[sp]) for a in acc_sp
        ]
        # INTT2 over both components in one call
        dlo, dhi = self._transform(
            self._inv, sp,
            jnp.concatenate([acc_sp[k][0] for k in range(comp)]),
            jnp.concatenate([acc_sp[k][1] for k in range(comp)]),
        )
        e = w.add_mod((dlo, dhi), qk_half, qk)  # (comp*B, n)
        sigma = self._sigma(e) if self.plain_modulus is not None else None

        # ---- per decomp modulus: fused engine MAC + tail NTT ----
        out_lo = jnp.zeros((B, comp, L, n), dtype=jnp.uint32)
        out_hi = jnp.zeros((B, comp, L, n), dtype=jnp.uint32)
        for j in range(L):
            q = moduli[j]
            acc = engine_acc(
                j, q, self._mac[j] if self.fused_mac else None, True
            )
            res = [
                (res_lo[:, k, j, :], res_hi[:, k, j, :]) for k in range(comp)
            ]
            outs = self._tail_j(j, e, acc, res, msf4, sigma)
            for k in range(comp):
                out_lo = out_lo.at[:, k, j, :].set(outs[k][0])
                out_hi = out_hi.at[:, k, j, :].set(outs[k][1])
        return out_lo[:B0], out_hi[:B0]

    def _build32(self, t32, r32, keys_lo, keys_hi, kp_lo, kp_hi, msf4):
        """Interleaved-u32 entry: t32 (B, L, 2n), r32 (B, comp, L, 2n) ->
        out32 (B, comp, L, 2n).  The u64<->u32-pair split runs ON DEVICE
        (one cheap relayout each way) so host staging is a zero-copy view —
        the reference keeps staging off the critical path with ping-pong
        FPGAObjects (`host/src/fpga.cpp:1517-1545`); here the split itself
        is eliminated."""
        t_lo, t_hi = w.deinterleave_jnp(t32)
        r_lo, r_hi = w.deinterleave_jnp(r32)
        olo, ohi = self._build(t_lo, t_hi, keys_lo, keys_hi, kp_lo, kp_hi,
                               r_lo, r_hi, msf4)
        return w.interleave_jnp(olo, ohi)

    def _build32p(self, tp, rp, keys_lo, keys_hi, kp_lo, kp_hi, msf4):
        """52-bit WIRE-PACKED entry (ops/wirepack.py): operands arrive
        packed to 13/16 of the interleaved bytes (every transported value
        is a residue below a <= 2^52 modulus), unpack on device, compute,
        and return the result packed.  For hosts where the link — not
        compute — bounds end-to-end throughput."""
        from . import wirepack

        t32 = wirepack.unpack_jnp(tp)
        r32 = wirepack.unpack_jnp(rp)
        out32 = self._build32(t32, r32, keys_lo, keys_hi, kp_lo, kp_hi, msf4)
        return wirepack.pack_jnp(out32)

    # -- numpy wrappers (same surface as keyswitch_jax.KeySwitchContext) ----

    def prepare_keys(self, k_switch_keys):
        keys = np.stack(
            [
                np.asarray(kv, dtype=np.uint64).reshape(self.comp, self.K, self.n)
                for kv in k_switch_keys
            ]
        )
        return w.to_pair_np(keys)

    def key_precons(self, keys: np.ndarray):
        """floor(key << 64 / q_j) per element — the Harvey precon tables for
        the in-flight MAC (one-time host precompute per key set; vectorized
        long division, ~0.1 s per flagship set — w.precon64_np)."""
        prec = np.zeros_like(keys)
        for j in range(self.K):
            prec[:, :, j, :] = w.precon64_np(keys[:, :, j, :], self.moduli[j])
        return prec

    # key-set cache size: the reference's keys_map_ caches every key set it
    # ever sees (`host/src/fpga.cpp:1158-1165`); key+precon tensors are large
    # (~22 MB at 16384_6_7_7_2) so this bounds device-memory growth while
    # still keeping the common CKKS rotation pattern (a handful of Galois
    # keys used round-robin) fully resident.
    KEY_CACHE_SLOTS = 8

    # permuted-key caches held per Galois sigma (hoisted rotations): each
    # distinct permutation gets its own small PinnedKeyCache (a rotation
    # step pairs ONE sigma with ONE Galois key set, so 1-2 slots suffice);
    # the dict itself is LRU-bounded to cap device memory (~22 MB/set).
    PERM_CACHE_SLOTS = 32

    def device_keys(self, k_switch_keys, hoist_perm=None):
        """Upload-once key + precon cache — the analog of the reference's
        pointer-keyed keys_map_ (`host/src/fpga.cpp:1158-1165`), via the
        shared utils/keycache.PinnedKeyCache (LRU, source-array pinning,
        identity + content-checksum guarded; see that module for the
        mutation contract and the HEXL_TPU_KEY_CHECKSUM=full knob).

        hoist_perm (an (n,) NTT-domain Galois sigma, concrete numpy) stages
        the keys PRE-PERMUTED by sigma^{-1}: because the automorphism
        commutes with the elementwise MAC, P(D_i) * k_i == P(D_i * P^{-1}k_i)
        — so a hoisted apply can run its MAC/tail on the UNPERMUTED
        decomposition against these keys and gather only the final output
        (see _apply_hoisted).  The permutation runs once per (sigma, key
        set) at stage time, never per apply."""
        from ..utils.keycache import PinnedKeyCache

        def _stage(src, inv=None):
            keys = np.stack(
                [a.reshape(self.comp, self.K, self.n) for a in src]
            )
            if inv is not None:
                keys = np.ascontiguousarray(keys[..., inv])
            klo, khi = w.to_pair_np(keys)
            plo, phi = w.to_pair_np(self.key_precons(keys))
            return tuple(jnp.asarray(x) for x in (klo, khi, plo, phi))

        if hoist_perm is None:
            if not hasattr(self, "_key_cache"):
                self._key_cache = PinnedKeyCache(self.KEY_CACHE_SLOTS, _stage)
            return self._key_cache.get(k_switch_keys)
        import hashlib

        p = np.asarray(hoist_perm, dtype=np.int64).reshape(self.n)
        pid = hashlib.blake2b(p.tobytes(), digest_size=16).digest()
        if not hasattr(self, "_key_cache_perm"):
            from collections import OrderedDict

            self._key_cache_perm = OrderedDict()
        cache = self._key_cache_perm.get(pid)
        if cache is None:
            inv = np.empty_like(p)
            inv[p] = np.arange(self.n, dtype=np.int64)
            cache = PinnedKeyCache(
                2, functools.partial(_stage, inv=inv)
            )
            self._key_cache_perm[pid] = cache
            while len(self._key_cache_perm) > self.PERM_CACHE_SLOTS:
                self._key_cache_perm.popitem(last=False)
        else:
            self._key_cache_perm.move_to_end(pid)
        return cache.get(k_switch_keys)

    def prepare_msf(self, modswitch_factors):
        msf = np.array(
            [int(m) % q for m, q in zip(modswitch_factors, self.moduli)],
            dtype=np.uint64,
        )
        return w.to_pair_np(msf)

    def prepare_msf4(self, modswitch_factors) -> np.ndarray:
        """(K, 4) uint32 [msf_lo, msf_hi, precon_lo, precon_hi] rows: the
        reduced modswitch factor and its Harvey precon floor(msf<<64 / q)
        for the fused tail's traced scalar multiply."""
        out = np.zeros((self.K, 4), dtype=np.uint32)
        for j, (m, q) in enumerate(zip(modswitch_factors, self.moduli)):
            m = int(m) % q
            prec = (m << 64) // q
            out[j] = (m & 0xFFFFFFFF, m >> 32,
                      prec & 0xFFFFFFFF, (prec >> 32) & 0xFFFFFFFF)
        return out

    def run(self, result, t_target, k_switch_keys, modswitch_factors):
        return self.run_batch(
            np.asarray(result, dtype=np.uint64)[None],
            np.asarray(t_target, dtype=np.uint64)[None],
            k_switch_keys,
            modswitch_factors,
        )[0]

    def dispatch_batch(self, results, t_targets, k_switch_keys,
                       modswitch_factors):
        """Stage + dispatch without blocking; returns (lo, hi) device arrays
        shaped (B, comp, L, n).  The scheduler demuxes the PREVIOUS batch
        while this one computes (`host/src/fpga.cpp:1517-1545` analog)."""
        B = results.shape[0]
        n, L = self.n, self.L
        t = w.to_pair_np(np.asarray(t_targets, dtype=np.uint64).reshape(B, L, n))
        r = w.to_pair_np(
            np.asarray(results, dtype=np.uint64).reshape(B, self.comp, L, n)
        )
        klo, khi, plo, phi = self.device_keys(k_switch_keys)
        msf4 = self.prepare_msf4(modswitch_factors)
        return self._fn(t[0], t[1], klo, khi, plo, phi, r[0], r[1], msf4)

    def dispatch_batch32(self, results, t_targets, k_switch_keys,
                         modswitch_factors):
        """Zero-copy staging fast path: host u64 buffers are VIEWED as
        interleaved u32 (no conversion pass), transferred once, and split
        on-device.  Returns the out32 device array (B, comp, L, 2n) without
        blocking; view the fetched result with from_interleaved_np."""
        B = results.shape[0]
        n, L = self.n, self.L
        t32 = w.to_interleaved_np(
            np.asarray(t_targets, dtype=np.uint64).reshape(B, L, n)
        )
        r32 = w.to_interleaved_np(
            np.asarray(results, dtype=np.uint64).reshape(B, self.comp, L, n)
        )
        klo, khi, plo, phi = self.device_keys(k_switch_keys)
        msf4 = self.prepare_msf4(modswitch_factors)
        return self._fn32(t32, r32, klo, khi, plo, phi, msf4)

    def dispatch_batch32p(self, results, t_targets, k_switch_keys,
                          modswitch_factors):
        """Wire-packed transport (52 bits/coefficient on the link, both
        directions): host packs with numpy, device unpacks/repacks inside
        the jit.  Returns the packed device array; decode the fetched
        result with wirepack.unpack_np + from_interleaved_np."""
        from . import wirepack

        B = results.shape[0]
        n, L = self.n, self.L
        tp = wirepack.pack_np(w.to_interleaved_np(
            np.asarray(t_targets, dtype=np.uint64).reshape(B, L, n)
        ))
        rp = wirepack.pack_np(w.to_interleaved_np(
            np.asarray(results, dtype=np.uint64).reshape(
                B, self.comp, self.L, n
            )
        ))
        klo, khi, plo, phi = self.device_keys(k_switch_keys)
        msf4 = self.prepare_msf4(modswitch_factors)
        return self._fn32p(tp, rp, klo, khi, plo, phi, msf4)

    @staticmethod
    def wire_pack_enabled() -> bool:
        import os

        return os.environ.get("HEXL_TPU_WIRE_PACK") == "1"

    def run_batch(self, results, t_targets, k_switch_keys, modswitch_factors):
        B = results.shape[0]
        if self.wire_pack_enabled():
            from . import wirepack

            outp = self.dispatch_batch32p(
                results, t_targets, k_switch_keys, modswitch_factors
            )
            out32 = wirepack.unpack_np(np.asarray(outp))
        else:
            out32 = np.asarray(self.dispatch_batch32(
                results, t_targets, k_switch_keys, modswitch_factors
            ))
        return w.from_interleaved_np(out32).reshape(B, -1)

    # -- device-resident ciphertext handles ---------------------------------
    #
    # Chained HE workloads (rotate -> keyswitch -> accumulate ...) pay full
    # host<->device staging per op through the numpy API; the reference has
    # no such concept (every op round-trips PCIe).  A handle keeps the
    # operand resident: run_device consumes and returns handles, so a chain
    # of K keyswitches moves host data 0 times in between.

    def stage_target(self, t_targets) -> "DeviceTarget":
        """Upload (B, L*n) u64 targets once; reusable across run_device calls."""
        B = np.asarray(t_targets).shape[0]
        t32 = w.to_interleaved_np(
            np.asarray(t_targets, dtype=np.uint64).reshape(B, self.L, self.n)
        )
        return DeviceTarget(jnp.asarray(t32), self)

    def stage_ciphertext(self, cts) -> "DeviceCiphertext":
        """Upload (B, comp*L*n) u64 ciphertexts once as a device handle."""
        B = np.asarray(cts).shape[0]
        c32 = w.to_interleaved_np(
            np.asarray(cts, dtype=np.uint64).reshape(
                B, self.comp, self.L, self.n
            )
        )
        return DeviceCiphertext(jnp.asarray(c32), self)

    def run_device_chain(self, ct, target, k_switch_keys, modswitch_factors,
                         depth: int) -> "DeviceCiphertext":
        """depth keyswitches with FIXED keys/target compiled as ONE device
        program (lax.fori_loop): each step's output ciphertext is the next
        step's accumulator.  Eliminates the per-link host dispatch of a
        run_device python loop, so long same-key chains run at the full
        device rate (power-iteration rotations, repeated mod-raise, ...);
        for per-step key changes use run_device per link."""
        if not isinstance(ct, DeviceCiphertext):
            ct = self.stage_ciphertext(np.asarray(ct, dtype=np.uint64))
        if not isinstance(target, DeviceTarget):
            target = self.stage_target(np.asarray(target, dtype=np.uint64))
        assert ct.ctx is self and target.ctx is self
        klo, khi, plo, phi = self.device_keys(k_switch_keys)
        msf4 = self.prepare_msf4(modswitch_factors)
        if not hasattr(self, "_chain_fn"):
            def chain(ct32, t32, a, b, c, d, m4, k):
                return jax.lax.fori_loop(
                    0, k,
                    lambda i, cur: self._build32(t32, cur, a, b, c, d, m4),
                    ct32,
                )

            self._chain_fn = jax.jit(chain)
        out32 = self._chain_fn(ct.data32, target.data32, klo, khi, plo, phi,
                               msf4, jnp.int32(depth))
        return DeviceCiphertext(out32, self)

    def run_device_chain_keyed(self, ct, target, key_sets,
                               modswitch_factors, schedule
                               ) -> "DeviceCiphertext":
        """len(schedule) keyswitches compiled as ONE device program with
        PER-STEP keys — the real rotation-chain pattern.  key_sets is a
        list of S key sets (each the usual sequence of L (comp*K*n,) u64
        arrays; all stay resident via the pinned key cache), schedule an
        int sequence where step i uses key_sets[schedule[i]].  The S
        staged key/precon tensors are stacked once and indexed by a TRACED
        step inside the fori_loop, so any schedule of the same length (and
        any key contents) shares one compiled program; per-link host
        dispatch — the reference's per-op enqueue with key-fence re-upload
        (`host/src/fpga.cpp:1158-1248`) and this library's own run_device
        loop (~1.6 ms/link) — disappears entirely."""
        if not isinstance(ct, DeviceCiphertext):
            ct = self.stage_ciphertext(np.asarray(ct, dtype=np.uint64))
        if not isinstance(target, DeviceTarget):
            target = self.stage_target(np.asarray(target, dtype=np.uint64))
        assert ct.ctx is self and target.ctx is self
        sched = np.asarray(schedule, dtype=np.int32).reshape(-1)
        assert sched.size > 0 and sched.min() >= 0
        assert sched.max() < len(key_sets), "schedule indexes past key_sets"
        staged = [self.device_keys(ks) for ks in key_sets]
        kstack = tuple(
            jnp.stack([s[i] for s in staged]) for i in range(4)
        )
        msf4 = self.prepare_msf4(modswitch_factors)
        if not hasattr(self, "_chain_keyed_fn"):
            def chain(ct32, t32, ka, kb, kc, kd, m4, sch):
                def body(i, cur):
                    s = sch[i]
                    return self._build32(
                        t32, cur, ka[s], kb[s], kc[s], kd[s], m4
                    )

                return jax.lax.fori_loop(0, sch.shape[0], body, ct32)

            self._chain_keyed_fn = jax.jit(chain)
        out32 = self._chain_keyed_fn(
            ct.data32, target.data32, *kstack, msf4, jnp.asarray(sched)
        )
        return DeviceCiphertext(out32, self)

    def run_device(self, ct, target, k_switch_keys, modswitch_factors
                   ) -> "DeviceCiphertext":
        """KeySwitch entirely on device: ct/target may be handles (stay
        resident) or host u64 arrays (staged zero-copy).  Returns a handle;
        call .to_host() only when the chain ends."""
        if not isinstance(ct, DeviceCiphertext):
            ct = self.stage_ciphertext(np.asarray(ct, dtype=np.uint64))
        if not isinstance(target, DeviceTarget):
            target = self.stage_target(np.asarray(target, dtype=np.uint64))
        assert ct.ctx is self and target.ctx is self
        klo, khi, plo, phi = self.device_keys(k_switch_keys)
        msf4 = self.prepare_msf4(modswitch_factors)
        out32 = self._fn32(target.data32, ct.data32, klo, khi, plo, phi,
                           msf4)
        return DeviceCiphertext(out32, self)

    # -- hoisted keyswitch (decompose once, apply many) ---------------------
    #
    # Halevi-Shoup hoisting: the expensive PREFIX of the keyswitch — INTT1
    # of every decomp limb plus the forward NTT into EVERY engine modulus
    # (48 of the 62 transform rows at 16384_6_7_7_2) — depends only on the
    # target, not on the key or the Galois automorphism.  Computing it once
    # and reusing it across many applies turns each additional rotation of
    # the same ciphertext into {one NTT-domain gather + the 84-term MAC +
    # INTT2 + the 12 fused tail rows}: ~4.4x less transform work per
    # rotation.  The reference has no hoisting concept (every KeySwitch call
    # re-runs the full dataflow, `host/src/fpga.cpp:1049-1068`); this is a
    # TPU-first extension in the style of lattigo's RotateHoisted.

    def _decompose(self, t_lo, t_hi):
        """(B, L, n) canonical NTT-domain targets -> the hoisted
        decomposition (L+1, L*B, n) of LAZY u64 representatives over the
        ACTIVE engines only — plane j < L is decomp modulus q_j, plane L is
        the special modulus q_{K-1} (inactive moduli L..K-2 are never read
        by the apply, so their transforms are skipped; at a reduced CKKS
        level K - L - 1 of them exist):
        D[p, i*B+b] = NTT_{q(p)}(INTT1_{q_i}(t[b, i])) — limb i's canonical
        coefficient lift, transformed by the wide-input kernels (no Barrett
        pass in front)."""
        L, K = self.L, self.K
        coeff = [
            self._transform(self._inv, i, t_lo[:, i, :], t_hi[:, i, :])
            for i in range(L)
        ]
        stack_lo = jnp.concatenate([c[0] for c in coeff])
        stack_hi = jnp.concatenate([c[1] for c in coeff])
        ds = [
            self._transform(self._fwd, j, stack_lo, stack_hi)
            for j in list(range(L)) + [K - 1]
        ]
        return jnp.stack([d[0] for d in ds]), jnp.stack([d[1] for d in ds])

    def _apply_hoisted(self, dlo, dhi, res_lo, res_hi, keys_lo, keys_hi,
                       kp_lo, kp_hi, msf4, perm=None, galois_ops=None):
        """Keyswitch from a hoisted decomposition D (see _decompose).

        perm, an optional (n,) int32 NTT-domain permutation (the Galois
        sigma of ckks._ntt_galois_sigma), makes this an apply of the
        AUTOMORPHED decomposition — with the permutation DEFERRED to the
        output.  The keys MUST then be pre-permuted by sigma^{-1}
        (device_keys(..., hoist_perm=sigma)): the automorphism tau commutes
        with every ring-linear stage of the pipeline, so

            P(D_i) * k_i == P(D_i * P^{-1} k_i)
            out == P( tail(MAC(D, P^{-1}K)) + res )

        where res is the UNPERMUTED accumulation base (e.g. the original
        c0).  Instead of gathering all (L+1)*L*B decomposition planes per
        apply (plus the c0 planes), ONE gather runs over the comp*L output
        planes — 3.5-7x less permutation traffic, and the MAC/tail read D
        with plain linear access.  Equal to the direct automorph-the-
        decomposition form up to the standard hoisting rounding trade (tau
        does not commute with the tail's integer lifts at sign-wrapped
        coefficients — same class of representative difference as hoisting
        itself vs rotate-then-decompose; the result decrypts identically up
        to noise, property-tested in tests/test_ckks.py).  With perm=None
        the output IS bit-identical to _build: every MAC input has the same
        residue (D[j] row j is a lazy representative of the target itself),
        and the tails canonicalize."""
        n, L, K, comp = self.n, self.L, self.K, self.comp
        moduli = self.moduli
        qk, qk_half = self.qk, self.qk_half
        B = res_lo.shape[0]

        def engine_acc(plane, j, q):
            # plane indexes the compact (L+1)-plane decomposition
            # (see _decompose); j indexes the key tensors' K moduli.
            acc = [None] * comp
            for i in range(L):
                val = (dlo[plane, i * B : (i + 1) * B],
                       dhi[plane, i * B : (i + 1) * B])
                for k in range(comp):
                    key = (keys_lo[i, k, j, :], keys_hi[i, k, j, :])
                    kp = (kp_lo[i, k, j, :], kp_hi[i, k, j, :])
                    acc[k] = self._mac_term(acc[k], val, key, kp)
            return [self._mac_close(a, q) for a in acc]

        # special engine + INTT2 (identical schedule to _build)
        sp = K - 1
        acc_sp = engine_acc(L, sp, qk)
        acc_sp = [
            w.barrett_reduce64(a, qk, self.q_barr[sp]) for a in acc_sp
        ]
        dlo2, dhi2 = self._transform(
            self._inv, sp,
            jnp.concatenate([acc_sp[k][0] for k in range(comp)]),
            jnp.concatenate([acc_sp[k][1] for k in range(comp)]),
        )
        e = w.add_mod((dlo2, dhi2), qk_half, qk)
        sigma = self._sigma(e) if self.plain_modulus is not None else None

        out_lo = jnp.zeros((B, comp, L, n), dtype=jnp.uint32)
        out_hi = jnp.zeros((B, comp, L, n), dtype=jnp.uint32)
        for j in range(L):
            acc = engine_acc(j, j, moduli[j])
            res = [
                (res_lo[:, k, j, :], res_hi[:, k, j, :]) for k in range(comp)
            ]
            outs = self._tail_j(j, e, acc, res, msf4, sigma)
            for k in range(comp):
                out_lo = out_lo.at[:, k, j, :].set(outs[k][0])
                out_hi = out_hi.at[:, k, j, :].set(outs[k][1])
        if galois_ops is not None:
            # the deferred automorphism as MXU matmuls (ops/galois_mxu.py):
            # XLA's lane gather for x[..., perm] costs ~8.7 ms/batch-32 at
            # the flagship shape — more than the whole hoisted apply saves
            # (scripts/probe_r4_hoist3.py) — while the affine factorization
            # (static perms + per-column shear, one-hot f32 matmuls on u8
            # limbs) is MXU work.  Canonical residues permute to canonical
            # residues either way.
            from . import galois_mxu

            out_lo, out_hi = galois_mxu.apply_galois_mxu_pair(
                out_lo, out_hi, *galois_ops,
                hi_limbs=galois_mxu.hi_limb_count(self.moduli),
            )
        elif perm is not None:
            # generic-permutation fallback (arbitrary perm, or odd-log2 n
            # where the square-view factorization doesn't apply)
            out_lo = out_lo[..., perm]
            out_hi = out_hi[..., perm]
        return out_lo, out_hi

    def galois_mxu_operands(self, g: int):
        """Staged MXU-matmul operands (C, M) for the NTT-domain Galois map
        of element g (cached per g).  The factorization covers every
        power-of-two n — rectangular views included (8192 runs as
        (128, 64)); build_galois_operands raises ValueError only on a
        genuine factorization bug."""
        if not hasattr(self, "_gal_ops"):
            self._gal_ops = {}
        if g not in self._gal_ops:
            from . import galois_mxu

            self._gal_ops[g] = galois_mxu.stage_operands(
                galois_mxu.build_galois_operands(self.n, g)
            )
        return self._gal_ops[g]

    def hoisted_key_stack(self, k_switch_keys, perms):
        """Stack sigma^{-1}-permuted key/precon tensors for a fused
        per-step hoisted scan (rotate_many-style): perms is a sequence of S
        concrete (n,) sigmas; returns 4 arrays shaped (S,) + key shape,
        step s holding device_keys(keys, hoist_perm=perms[s])."""
        sets = [
            self.device_keys(k_switch_keys, hoist_perm=np.asarray(p))
            for p in perms
        ]
        return tuple(jnp.stack([s[i] for s in sets]) for i in range(4))

    def hoist(self, target) -> "DeviceDecomposition":
        """Decompose a keyswitch target ONCE for reuse across many
        run_hoisted applies (different keys and/or Galois permutations of
        the same target).  target: DeviceTarget or host (B, L*n) u64."""
        if not isinstance(target, DeviceTarget):
            target = self.stage_target(np.asarray(target, dtype=np.uint64))
        assert target.ctx is self
        if not hasattr(self, "_hoist_fn"):
            def fn(t32):
                return self._decompose(*w.deinterleave_jnp(t32))

            self._hoist_fn = jax.jit(fn)
        dlo, dhi = self._hoist_fn(target.data32)
        return DeviceDecomposition(dlo, dhi, self)

    def run_hoisted(self, dec, ct, k_switch_keys, modswitch_factors,
                    perm=None, galois=None) -> "DeviceCiphertext":
        """Apply a keyswitch from a hoisted decomposition, accumulating into
        ct (handle or host (B, comp*L*n) u64).

        galois, if given, is the Galois ELEMENT g (odd int mod 2n): the
        keys stage pre-permuted by sigma_g^{-1} (cached per sigma, see
        device_keys), the apply runs gather-free, and the deferred output
        automorphism executes as MXU matmuls (ops/galois_mxu.py) — the
        production rotation path at EVERY supported n (the rectangular
        factorization covers odd log2 n too).  perm is the generic
        alternative for arbitrary permutations: a CONCRETE (n,) NTT-domain
        permutation applied to the output planes with a (slow on TPU)
        traced lane gather.  ct must be the UNPERMUTED accumulation base
        either way; the output is sigma(ct + delta).  All operands are
        traced, so every rotation step shares one compiled program per
        mode."""
        if not isinstance(ct, DeviceCiphertext):
            ct = self.stage_ciphertext(np.asarray(ct, dtype=np.uint64))
        assert dec.ctx is self and ct.ctx is self
        assert dec.batch == ct.batch, (
            f"decomposition batch {dec.batch} != ciphertext batch {ct.batch}"
        )
        gops = None
        if galois is not None:
            assert perm is None, "pass either galois or perm, not both"
            from . import galois_mxu

            hoist_sigma = galois_mxu.ntt_galois_sigma(
                self.n, int(galois)
            ).astype(np.int32)
            gops = self.galois_mxu_operands(int(galois))
        else:
            hoist_sigma = None if perm is None else np.asarray(perm)
        klo, khi, plo, phi = self.device_keys(
            k_switch_keys, hoist_perm=hoist_sigma,
        )
        msf4 = self.prepare_msf4(modswitch_factors)
        mode = "galois" if gops is not None else (
            "perm" if perm is not None else "plain"
        )
        if not hasattr(self, "_hoisted_fns"):
            self._hoisted_fns = {}
        if mode not in self._hoisted_fns:
            if mode == "galois":
                def fn(dlo, dhi, ct32, a, b, c, d, m4, *g5):
                    r_lo, r_hi = w.deinterleave_jnp(ct32)
                    olo, ohi = self._apply_hoisted(
                        dlo, dhi, r_lo, r_hi, a, b, c, d, m4,
                        galois_ops=g5,
                    )
                    return w.interleave_jnp(olo, ohi)
            else:
                def fn(dlo, dhi, ct32, a, b, c, d, m4, *p):
                    r_lo, r_hi = w.deinterleave_jnp(ct32)
                    olo, ohi = self._apply_hoisted(
                        dlo, dhi, r_lo, r_hi, a, b, c, d, m4,
                        perm=p[0] if p else None,
                    )
                    return w.interleave_jnp(olo, ohi)

            self._hoisted_fns[mode] = jax.jit(fn)
        args = (dec.dlo, dec.dhi, ct.data32, klo, khi, plo, phi, msf4)
        if mode == "galois":
            args = args + tuple(gops)
        elif mode == "perm":
            args = args + (jnp.asarray(perm, dtype=jnp.int32),)
        return DeviceCiphertext(self._hoisted_fns[mode](*args), self)


class DeviceDecomposition:
    """Hoisted keyswitch prefix resident on device: (L+1, L*B, n) lazy-u64
    plane pair over the ACTIVE engines (planes 0..L-1 = decomp moduli,
    plane L = the special modulus; see _decompose), reusable across many
    run_hoisted calls (~5.3 MB at 16384_6_7_7_2, B=1)."""

    def __init__(self, dlo, dhi, ctx: "KeySwitchTpuContext"):
        self.dlo = dlo
        self.dhi = dhi
        self.ctx = ctx

    @property
    def batch(self) -> int:
        return self.dlo.shape[1] // self.ctx.L

    def block_until_ready(self):
        self.dlo.block_until_ready()
        return self


class DeviceCiphertext:
    """(B, comp, L, 2n)-interleaved u32 ciphertext resident on device."""

    def __init__(self, data32, ctx: "KeySwitchTpuContext"):
        self.data32 = data32
        self.ctx = ctx

    @property
    def batch(self) -> int:
        return self.data32.shape[0]

    def to_host(self) -> np.ndarray:
        """Fetch as (B, comp*L*n) u64 (zero-copy view of the fetched bytes)."""
        return w.from_interleaved_np(np.asarray(self.data32)).reshape(
            self.batch, -1
        )

    def block_until_ready(self):
        self.data32.block_until_ready()
        return self


class DeviceTarget:
    """(B, L, 2n)-interleaved u32 keyswitch target resident on device."""

    def __init__(self, data32, ctx: "KeySwitchTpuContext"):
        self.data32 = data32
        self.ctx = ctx


@functools.lru_cache(maxsize=16)
def _context_cached(n, L, K, rns, comp, moduli, tw_key, tile_p, interpret,
                    plain_modulus=None, mac_impl="deferred"):
    # strict lookup: a stash entry evicted between insertion and this call
    # must raise, not silently build the context with default twiddles
    tw = _TWIDDLE_STASH[tw_key] if tw_key is not None else None
    return KeySwitchTpuContext(
        n, L, K, rns, comp, list(moduli), tw, tile_p, interpret,
        plain_modulus=plain_modulus, mac_impl=mac_impl,
    )


# Side table carrying the (unhashable) twiddle buffer into the lru-cached
# context factory, keyed by a strong content digest so distinct buffers can
# never collide; bounded to the context LRU's size so stash entries die with
# the contexts built from them.
_TWIDDLE_STASH: "dict[bytes, np.ndarray]" = {}
_TWIDDLE_STASH_SLOTS = 16


def get_context(
    n, decomp_modulus_size, key_modulus_size, rns_modulus_size,
    key_component_count, moduli, twiddle_factors=None, tile_p: int = 4,
    interpret: bool = False, plain_modulus: int | None = None,
    mac_impl: str = "deferred",
) -> KeySwitchTpuContext:
    if twiddle_factors is not None:
        import hashlib

        tw = np.ascontiguousarray(np.asarray(twiddle_factors, dtype=np.uint64))
        tw_key = hashlib.blake2b(tw.tobytes(), digest_size=16).digest()
        _TWIDDLE_STASH.pop(tw_key, None)
        _TWIDDLE_STASH[tw_key] = tw  # re-insert: newest at dict tail
        while len(_TWIDDLE_STASH) > _TWIDDLE_STASH_SLOTS:
            _TWIDDLE_STASH.pop(next(iter(_TWIDDLE_STASH)))
    else:
        tw_key = None
    return _context_cached(
        n, decomp_modulus_size, key_modulus_size, rns_modulus_size,
        key_component_count, tuple(int(m) for m in moduli), tw_key, tile_p,
        interpret,
        None if plain_modulus is None else int(plain_modulus),
        mac_impl,
    )
