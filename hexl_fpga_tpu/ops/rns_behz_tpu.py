"""BEHZ full-RNS BFV multiply ON THE DEVICE (TPU-resident rns_behz).

ops/rns_behz.py holds the exact host-NumPy formulation (the oracle); this
module runs the same pipeline on the accelerated kernels, composed inside
ONE jit:

  * inverse/forward NTTs      -> the fused MXU four-step Pallas kernels
                                 (ntt_mxu_pallas.raw_{fwd,inv}_call), the
                                 same tier the keyswitch rides — the four
                                 input polynomials (and three outputs)
                                 batch through each per-modulus kernel as
                                 stacked rows;
  * base extension / SmMRq /
    fast floor / Shenoy        -> exact u32-pair lane math (ops/word64):
                                 every constant multiply is a Harvey lazy
                                 multiply against a host-precomputed
                                 precon (valid for ANY u64 representative,
                                 so cross-base operands need no Barrett
                                 pass in front), the <= k-term conversion
                                 sums accumulate lazily (< k*2m < 2^59)
                                 and reduce once;
  * m_tilde = 2^32 arithmetic  -> native wrapping uint32 lane ops (masks,
                                 exactly as the host tool).

Bit-exact with BehzTool.multiply on every input (tests/test_rns_behz_tpu.py
drives both and asserts array equality): both sides are exact integer
pipelines sharing the same constants and the same NTT roots (psi is taken
from the supplied twiddle tables).

Reference anchor (what this goes beyond): the reference accelerates only
the keyswitch — BFV ciphertext multiplication stays on the SEAL CPU even
with the FPGA attached (`experimental/bridge-seal/patches/
hexl-fpga-BRIDGE-seal-4.0.0.patch:246-252`).  Here the whole multiply is
device-resident.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import ntt_mxu_pallas, rns_behz, twiddles, word64 as w

Pair = Tuple[jnp.ndarray, jnp.ndarray]

_MXU_MODULUS_CEILING = 1 << 55  # ntt_mxu plan limb budget (make_plan)


def _pad_rows(lo, hi, mult: int):
    B = lo.shape[0]
    pad = (-B) % mult
    if pad:
        lo = jnp.concatenate([lo, jnp.zeros((pad,) + lo.shape[1:], lo.dtype)])
        hi = jnp.concatenate([hi, jnp.zeros((pad,) + hi.shape[1:], hi.dtype)])
    return lo, hi, B


def _cmul(x: Pair, c: int, q: int, lazy: bool = False) -> Pair:
    """(x * c) mod q for ANY u64 representative x and a static constant
    c — Harvey lazy multiply with the precon computed at trace time
    (exact in [0, 2q) for any x; MultiplyUIntModLazy<64> semantics).
    lazy=True keeps the [0, 2q) representative for consumers that sum."""
    q = int(q)
    c = int(c) % q
    pre = (c << 64) // q
    r = w.mul_mod_lazy(x, w.const_pair(c), w.const_pair(pre), q)
    return r if lazy else w.cond_sub64(r, q)


def _xla_tabs(t: twiddles.NttTables):
    """Package an NttTables for the ntt_jax butterfly cores (same dict
    shape as ntt_jax.device_tables, but honoring the table's own root)."""
    from . import nt

    q = t.q
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


class BehzTpu:
    """Device-resident BEHZ multiply for one host BehzTool's parameters.

    q_tabs supplies the level's forward-NTT roots (BfvContext.tabs[:k]) so
    the device transforms reproduce the host tool's transforms exactly;
    Bsk roots come from tool.bsk_tables().

    engine_impl: 'mxu' (default) composes the fused four-step Pallas
    kernels — the production TPU tier (n >= 1024); 'xla' uses the
    ntt_jax butterfly cores (any n; also the CPU test tier, where
    interpret-mode Pallas execution of the ~17k+7 transforms is minutes
    per call).  Both are bit-exact with the host tool — the ShardedKeySwitch
    engine_impl pattern.  interpret=True runs the Pallas kernels in
    interpreter mode (mxu off-TPU)."""

    def __init__(self, tool: rns_behz.BehzTool,
                 q_tabs: Sequence[twiddles.NttTables],
                 tile_p: int = 4, interpret: bool = False,
                 engine_impl: str = "mxu"):
        n = tool.n
        assert engine_impl in ("xla", "mxu")
        self.engine_impl = engine_impl
        if engine_impl == "mxu":
            if n < 1024 or n % 128 != 0:
                raise ValueError(
                    f"the MXU BEHZ tier needs n >= 1024 (n={n}); use "
                    "engine_impl='xla' or the host BehzTool below that"
                )
            for m in list(tool.q) + list(tool.Bsk):
                if m >= _MXU_MODULUS_CEILING:
                    raise ValueError(
                        f"modulus {m} >= 2^55: beyond the MXU NTT plan; "
                        "use engine_impl='xla' (aux primes this wide "
                        "arise only for very large plain moduli)"
                    )
        assert len(q_tabs) == tool.k
        self.t = tool
        self.tile_p = tile_p
        bsk_tabs = tool.bsk_tables()
        if engine_impl == "mxu":
            self._inv_q = [
                ntt_mxu_pallas.raw_inv_call(
                    n, q, tile_p, psi=int(q_tabs[i].w), interpret=interpret
                )
                for i, q in enumerate(tool.q)
            ]
            self._fwd_q = [
                ntt_mxu_pallas.raw_fwd_call(
                    n, q, tile_p, psi=int(q_tabs[i].w), interpret=interpret
                )
                for i, q in enumerate(tool.q)
            ]
            self._inv_bsk = [
                ntt_mxu_pallas.raw_inv_call(
                    n, m, tile_p, psi=int(bsk_tabs[d].w),
                    interpret=interpret,
                )
                for d, m in enumerate(tool.Bsk)
            ]
            self._fwd_bsk = [
                ntt_mxu_pallas.raw_fwd_call(
                    n, m, tile_p, psi=int(bsk_tabs[d].w),
                    interpret=interpret,
                )
                for d, m in enumerate(tool.Bsk)
            ]
        else:
            from . import ntt_jax

            def mk(tabs, q, fwd):
                core = ntt_jax.fwd_ntt_core if fwd else ntt_jax.inv_ntt_core
                d = _xla_tabs(tabs)
                return lambda lo, hi: core((lo, hi), n, q, d)

            self._inv_q = [
                mk(q_tabs[i], q, False) for i, q in enumerate(tool.q)
            ]
            self._fwd_q = [
                mk(q_tabs[i], q, True) for i, q in enumerate(tool.q)
            ]
            self._inv_bsk = [
                mk(bsk_tabs[d], m, False) for d, m in enumerate(tool.Bsk)
            ]
            self._fwd_bsk = [
                mk(bsk_tabs[d], m, True) for d, m in enumerate(tool.Bsk)
            ]
        self._barr = {
            int(m): ((1 << 64) // int(m)) & ((1 << 64) - 1)
            for m in list(tool.q) + list(tool.Bsk)
        }
        # mxu: ONE jitted program (the production TPU dispatch).  xla: run
        # the composition eagerly — the monolithic graph (~17k+7 unrolled
        # butterfly transforms) costs minutes of XLA:CPU compile on small
        # boxes while eager per-op dispatch at test shapes is trivial.
        self._fn = (
            jax.jit(self._multiply_pairs) if engine_impl == "mxu"
            else self._multiply_pairs
        )

    # -- primitives (u32-pair lane math, exact) -----------------------------

    def _transform(self, which, j, x: Pair) -> Pair:
        if self.engine_impl == "xla":
            return which[j](x[0], x[1])
        lo, hi, B = _pad_rows(x[0], x[1], self.tile_p)
        olo, ohi = which[j](lo, hi)
        return olo[:B], ohi[:B]

    def _reduce_sum(self, terms: List[Pair], m: int) -> Pair:
        """Canonical sum of <= 2k lazy [0, 2m) terms (sum < 2^60)."""
        acc = terms[0]
        for t in terms[1:]:
            acc = w.add64(acc, t)
        return w.barrett_reduce64(acc, m, self._barr[m])

    def _fastbconv(self, tilde: List[Pair], dst: Sequence[int],
                   hat) -> List[Pair]:
        """sum_i tilde_i * (qhat_i mod m) mod m per destination modulus
        (BEHZ FastBConv; lazy terms, one reduction)."""
        return [
            self._reduce_sum(
                [_cmul(tilde[i], int(hat[i][d]), m, lazy=True)
                 for i in range(self.t.k)], m
            )
            for d, m in enumerate(dst)
        ]

    def _conv_mtilde_u32(self, tilde: List[Pair]) -> jnp.ndarray:
        """The m_tilde = 2^32 component: wrapping uint32 lane arithmetic
        on the LOW words (tilde_i is canonical, so lo == tilde_i mod 2^32)."""
        T = self.t
        acc = tilde[0][0] * jnp.uint32(int(T.q_hat_mod_mtilde[0]))
        for i in range(1, T.k):
            acc = acc + tilde[i][0] * jnp.uint32(int(T.q_hat_mod_mtilde[i]))
        return acc

    def _extend_to_bsk(self, x_q: List[Pair]) -> List[Pair]:
        """Base extension q -> Bsk with the m_tilde Montgomery correction
        (rns_behz.BehzTool.extend_to_bsk, device form)."""
        T = self.t
        # xm*qhat_inv folded into one constant multiply per limb
        xt = [
            _cmul(x_q[i],
                  (T.m_tilde % T.q[i]) * T.q_hat_inv[i] % T.q[i], T.q[i])
            for i in range(T.k)
        ]
        conv = self._fastbconv(xt, T.Bsk, T.q_hat_mod_Bsk)
        r = self._conv_mtilde_u32(xt) * jnp.uint32(T.neg_inv_q_mod_mtilde)
        neg = r >= jnp.uint32(1 << 31)
        rmag = (jnp.where(neg, jnp.uint32(0) - r, r),
                jnp.zeros_like(r))  # m_tilde - r wraps exactly in u32
        out = []
        for d, m in enumerate(T.Bsk):
            term = _cmul(rmag, int(T.q_mod_Bsk[d]), m)
            s = w.select64(neg, w.sub_mod(conv[d], term, m),
                           w.add_mod(conv[d], term, m))
            out.append(_cmul(s, T.inv_mtilde_mod_Bsk[d], m))
        return out

    def _fast_floor(self, tq_q: List[Pair], tq_bsk: List[Pair]
                    ) -> List[Pair]:
        T = self.t
        tilde = [
            _cmul(tq_q[i], T.q_hat_inv[i], T.q[i]) for i in range(T.k)
        ]
        f = self._fastbconv(tilde, T.Bsk, T.q_hat_mod_Bsk)
        return [
            _cmul(w.sub_mod(tq_bsk[d], f[d], m), T.inv_q_mod_Bsk[d], m)
            for d, m in enumerate(T.Bsk)
        ]

    def _fastbconv_sk(self, g_bsk: List[Pair]) -> List[Pair]:
        """Exact Bsk -> q via Shenoy-Kumaresan (rns_behz.fastbconv_sk)."""
        T = self.t
        k, msk = T.k, T.m_sk
        tilde = [
            _cmul(g_bsk[j], T.b_hat_inv[j], T.b[j]) for j in range(k)
        ]
        h = self._reduce_sum(
            [_cmul(tilde[j], int(T.b_hat_mod_msk[j]), msk, lazy=True)
             for j in range(k)], msk
        )
        d0 = w.sub_mod(h, g_bsk[k], msk)
        alpha = w.mul_mod_static(d0, T.inv_B_mod_msk, msk)
        neg = w.ge64(alpha, w.const_pair(msk // 2 + 1))
        amag = w.select64(neg, w.sub64(w.const_pair(msk), alpha), alpha)
        out = []
        for i, qi in enumerate(T.q):
            conv = self._reduce_sum(
                [_cmul(tilde[j], int(T.b_hat_mod_q[j, i]), qi, lazy=True)
                 for j in range(k)], qi
            )
            corr = _cmul(amag, int(T.B_mod_q[i]), qi)
            out.append(
                w.select64(neg, w.add_mod(conv, corr, qi),
                           w.sub_mod(conv, corr, qi))
            )
        return out

    # -- jitted multiply ------------------------------------------------------

    @staticmethod
    def _tensor(a0: Pair, a1: Pair, b0: Pair, b1: Pair, m: int):
        """(a0+a1*s)*(b0+b1*s) component products mod m (canonical in/out)."""
        d0 = w.mul_mod_static(a0, b0, m)
        c1 = w.mul_mod_static(a0, b1, m)
        c2 = w.mul_mod_static(a1, b0, m)
        d1 = w.add_mod(c1, c2, m)
        d2 = w.mul_mod_static(a1, b1, m)
        return d0, d1, d2

    def _multiply_pairs(self, c1_lo, c1_hi, c2_lo, c2_hi):
        """(B, 2, k, n) u32-pair NTT-limb ciphertexts -> (B, 3, k, n)
        canonical NTT-limb tensor output scaled by t/q (BEHZ)."""
        T = self.t
        k, n = T.k, T.n
        B = c1_lo.shape[0]

        def rows(lo, hi, i):  # 4-poly row stack per q-limb: (4B, n)
            return (
                jnp.concatenate([lo[:, 0, i], lo[:, 1, i]]),
                jnp.concatenate([hi[:, 0, i], hi[:, 1, i]]),
            )

        def stack4(i):
            r1 = rows(c1_lo, c1_hi, i)
            r2 = rows(c2_lo, c2_hi, i)
            return (jnp.concatenate([r1[0], r2[0]]),
                    jnp.concatenate([r1[1], r2[1]]))

        # 1. coefficient domain per q-limb (one batched INTT per modulus)
        coeff = [self._transform(self._inv_q, i, stack4(i))
                 for i in range(k)]
        # 2. extend all four polys to Bsk at once ((4B, n) planes)
        ext = self._extend_to_bsk(coeff)
        # 3. forward transforms under each Bsk modulus
        bsk = [self._transform(self._fwd_bsk, d, ext[d])
               for d in range(k + 1)]

        def split4(x: Pair):
            return [
                (x[0][s * B:(s + 1) * B], x[1][s * B:(s + 1) * B])
                for s in range(4)
            ]

        # 4. tensor products per modulus (the q half reuses input limbs)
        dq = [
            self._tensor(
                (c1_lo[:, 0, i], c1_hi[:, 0, i]),
                (c1_lo[:, 1, i], c1_hi[:, 1, i]),
                (c2_lo[:, 0, i], c2_hi[:, 0, i]),
                (c2_lo[:, 1, i], c2_hi[:, 1, i]),
                T.q[i],
            )
            for i in range(k)
        ]
        db = []
        for d in range(k + 1):
            a0, a1, b0, b1 = split4(bsk[d])
            db.append(self._tensor(a0, a1, b0, b1, T.Bsk[d]))

        # 5. per-modulus INTT of the 3 components (stacked rows), t-scale
        def stack3(trip: Tuple[Pair, Pair, Pair]) -> Pair:
            return (jnp.concatenate([p[0] for p in trip]),
                    jnp.concatenate([p[1] for p in trip]))

        tq_q = [
            _cmul(self._transform(self._inv_q, i, stack3(dq[i])),
                  T.t % T.q[i], T.q[i])
            for i in range(k)
        ]
        tq_bsk = [
            _cmul(self._transform(self._inv_bsk, d, stack3(db[d])),
                  T.t % T.Bsk[d], T.Bsk[d])
            for d in range(k + 1)
        ]
        # 6. fast floor + exact Shenoy back-conversion ((3B, n) planes)
        g = self._fast_floor(tq_q, tq_bsk)
        res_q = self._fastbconv_sk(g)
        # 7. back to the NTT domain under q
        out = [self._transform(self._fwd_q, i, res_q[i]) for i in range(k)]
        out_lo = jnp.stack([o[0] for o in out], axis=1)  # (3B, k, n)
        out_hi = jnp.stack([o[1] for o in out], axis=1)
        return (
            out_lo.reshape(3, B, k, n).swapaxes(0, 1),
            out_hi.reshape(3, B, k, n).swapaxes(0, 1),
        )

    # -- host conveniences ----------------------------------------------------

    def multiply_batch(self, ct1_ntt: np.ndarray, ct2_ntt: np.ndarray
                       ) -> np.ndarray:
        """(B, 2, k, n) u64 NTT-limb ciphertexts -> (B, 3, k, n) u64
        (bit-exact vs BehzTool.multiply per batch row)."""
        l1, h1 = w.to_pair_np(np.asarray(ct1_ntt, dtype=np.uint64))
        l2, h2 = w.to_pair_np(np.asarray(ct2_ntt, dtype=np.uint64))
        olo, ohi = self._fn(jnp.asarray(l1), jnp.asarray(h1),
                            jnp.asarray(l2), jnp.asarray(h2))
        return w.from_pair_np(np.asarray(olo), np.asarray(ohi))

    def multiply(self, ct1_ntt: np.ndarray, ct2_ntt: np.ndarray
                 ) -> np.ndarray:
        """(2, k, n) -> (3, k, n): the BehzTool.multiply drop-in."""
        return self.multiply_batch(ct1_ntt[None], ct2_ntt[None])[0]
