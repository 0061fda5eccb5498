"""KeySwitch as a single fused JAX program.

TPU-native re-design of the reference's ~30-kernel FPGA dataflow graph
(`device/keyswitch/` — load, twiddle dispatch, INTT1, intt1_redu, 7x NTT,
7x dyadmult MAC, INTT2, intt2_redu, 2x NTT, ms, store; decoded in SURVEY.md
§3.3).  On TPU the pipe graph becomes straight-line batched array code under
one jit: XLA fuses the elementwise stages and the batch dimension provides
the parallelism the FPGA obtained from pipelining.

Bit-exactness notes:
  * All transforms produce canonical residues, so the INTT1->reduce->NTT chain
    for j == i is the exact identity on t_target[i]; we skip those transforms
    (the hardware computes them, the bits agree — asserted in tests).
  * The modswitch tail follows `intt2_redu.hpp:27-58` (add qk/2 under qk once,
    then per-q_i add fix = q_i - (qk/2 mod q_i) and Barrett-reduce) and
    `ms.hpp:66-83` ((acc + 4q - ntt_out) reduced from [0,8q), times the
    ReduceMod8-reduced modswitch factor).
  * The public op *accumulates* into the caller ciphertext with one
    conditional subtract (`host/src/fpga.cpp` fill_out_data).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import nt, ntt_jax, twiddles, word64 as w

Pair = Tuple[jnp.ndarray, jnp.ndarray]


def _tables_from_view(view: twiddles.KeySwitchTwiddleView, j: int, n: int, q: int):
    """Device tables for modulus j from a caller twiddle buffer (keyswitch host
    layout), reconstructing the golden layout's leading-1 inverse slot."""
    inv = np.empty(n, dtype=np.uint64)
    inv[0] = 1
    inv[1:] = view.inv[j][: n - 1]
    inv_precon = np.empty(n, dtype=np.uint64)
    inv_precon[0] = nt.barrett_factor(1, 64, q)
    inv_precon[1:] = view.inv_precon[j][: n - 1]
    inv_n = nt.inverse_mod(n, q)
    inv_n_w = (inv_n * int(inv[n - 1])) % q
    return {
        "fwd": w.to_pair_np(view.fwd[j]),
        "fwd_precon": w.to_pair_np(view.fwd_precon[j]),
        "inv": w.to_pair_np(inv),
        "inv_precon": w.to_pair_np(inv_precon),
        "inv_n": inv_n,
        "inv_n_w": inv_n_w,
        "inv_n_precon": nt.barrett_factor(inv_n, 64, q),
        "inv_n_w_precon": nt.barrett_factor(inv_n_w, 64, q),
    }


class KeySwitchContext:
    """Compiled keyswitch for one static configuration.

    Mirrors the fence semantics of the reference scheduler: a context is keyed
    by (n, decomp, key_modulus, rns, components, moduli, twiddle buffer)
    (`host/src/fpga_int.cpp:429-448` — any change fences and reconfigures)."""

    def __init__(
        self,
        n: int,
        decomp_modulus_size: int,
        key_modulus_size: int,
        rns_modulus_size: int,
        key_component_count: int,
        moduli: Sequence[int],
        twiddle_factors: Optional[np.ndarray] = None,
        plain_modulus: Optional[int] = None,
    ):
        assert key_component_count == 2, "key_component_count must be 2"
        # rns_modulus_size is fence-only in the reference (stored, compared
        # at `host/src/fpga_int.cpp:443`, never passed to a device kernel —
        # `host/src/fpga.cpp:1296-1301,1560-1565`): accept any positive
        # value and compute independently of it, exactly as the reference
        # does.
        assert rns_modulus_size > 0, "requires rns_modulus_size > 0"
        self.n = n
        self.L = decomp_modulus_size
        self.K = key_modulus_size
        self.rns = rns_modulus_size
        self.comp = key_component_count
        self.moduli = tuple(int(m) for m in moduli)
        if twiddle_factors is not None:
            view = twiddles.decode_keyswitch_twiddles(twiddle_factors, n, self.K)
            self.tabs = [
                _tables_from_view(view, j, n, self.moduli[j]) for j in range(self.K)
            ]
        else:
            self.tabs = [ntt_jax.device_tables(n, q) for q in self.moduli]
        self.qk = self.moduli[self.K - 1]
        self.qk_half = self.qk >> 1
        self.q_barr = [nt.barrett_factor(1, 64, q) for q in self.moduli]
        # BGV mode: the tail's subtracted value must be divisible by t —
        # the GHS correction digit sigma (keyswitch_tpu._sigma / the golden
        # model's plain_modulus docstring) folds into each decomp tail
        self.plain_modulus = None if plain_modulus is None else int(plain_modulus)
        if self.plain_modulus is not None:
            t = self.plain_modulus
            from math import gcd

            assert t >= 2, "plain_modulus must be >= 2"
            assert gcd(self.qk, t) == 1, (
                "special modulus must be coprime to plain_modulus"
            )
            self.t_half = t >> 1
            self.inv_qk_t = nt.inverse_mod(self.qk % t, t)
            self.t_barr = nt.barrett_factor(1, 64, t)
        self._fn = jax.jit(self._build)

    def _build(self, t_lo, t_hi, keys_lo, keys_hi, res_lo, res_hi, msf_lo, msf_hi):
        """t: (B, L, n); keys: (L, comp, K, n); res: (B, comp, L, n);
        msf: (K,) reduced modswitch factors."""
        n, L, K = self.n, self.L, self.K
        B = t_lo.shape[0]
        moduli = self.moduli

        def tp(i):
            return (t_lo[:, i, :], t_hi[:, i, :])

        # INTT1 under each decomp modulus (`keyswitch/intt1.hpp`).
        coeff = [ntt_jax.inv_ntt_core(tp(i), n, moduli[i], self.tabs[i]) for i in range(L)]

        # Engines 0..L-1 and the special engine K-1
        # (`dyadmult.hpp:144-146` valid_engine).
        engines = list(range(L)) + [K - 1]
        acc = {}
        for j in engines:
            q = moduli[j]
            acc_j = [None] * self.comp
            for i in range(L):
                if i == j:
                    # INTT_{q_i} then NTT_{q_i} is the exact identity on
                    # canonical inputs: reuse t_target[i] directly.
                    val = tp(i)
                else:
                    red = w.barrett_reduce64(coeff[i], q, self.q_barr[j])
                    val = ntt_jax.fwd_ntt_core(red, n, q, self.tabs[j])
                for k in range(self.comp):
                    key = (keys_lo[i, k, j, :], keys_hi[i, k, j, :])
                    prod = w.mul_mod_static(val, key, q)
                    acc_j[k] = (
                        prod if acc_j[k] is None else w.add_mod(acc_j[k], prod, q)
                    )
            acc[j] = acc_j

        # Special-modulus tail (`intt2_core.hpp`, `intt2_redu.hpp`, `ms.hpp`).
        out_lo = jnp.zeros((B, self.comp, L, n), dtype=jnp.uint32)
        out_hi = jnp.zeros((B, self.comp, L, n), dtype=jnp.uint32)
        for k in range(self.comp):
            d = ntt_jax.inv_ntt_core(acc[K - 1][k], n, self.qk, self.tabs[K - 1])
            e = w.add_mod(d, self.qk_half, self.qk)
            if self.plain_modulus is not None:
                # sigma = [(qk/2 - e) qk^{-1} + t/2]_t — the per-coefficient
                # GHS digit making the subtracted tail value == 0 (mod t)
                t = self.plain_modulus
                e_t = w.barrett_reduce64(e, t, self.t_barr)
                x = w.cond_sub64(
                    w.add64(
                        w.sub64(w.const_pair(self.qk_half % t), e_t), t
                    ), t,
                )
                u = w.mul_mod_static(x, self.inv_qk_t, t)
                sigma = w.add_mod(u, self.t_half, t)
            for i in range(L):
                q = moduli[i]
                if self.plain_modulus is None:
                    fix = q - (self.qk_half % q)
                    fsum = w.add64(e, fix)
                else:
                    fix = (-self.qk_half - self.qk * self.t_half) % q
                    fsum = w.add64(
                        w.add64(e, w.mul_mod_static(sigma, self.qk % q, q)),
                        fix,
                    )
                f = w.barrett_reduce64(fsum, q, self.q_barr[i])
                g = ntt_jax.fwd_ntt_core(f, n, q, self.tabs[i])
                t1 = w.reduce_mod_factor(
                    w.add64(w.sub64(acc[i][k], g), 4 * q), q, 8
                )
                msf = (msf_lo[i], msf_hi[i])
                delta = w.mul_mod_static(t1, msf, q)
                r_in = (res_lo[:, k, i, :], res_hi[:, k, i, :])
                r_out = w.cond_sub64(w.add64(r_in, delta), q)
                out_lo = out_lo.at[:, k, i, :].set(r_out[0])
                out_hi = out_hi.at[:, k, i, :].set(r_out[1])
        return out_lo, out_hi

    def prepare_keys(self, k_switch_keys) -> Tuple[np.ndarray, np.ndarray]:
        """Stack the public-API key pointers into the (L, comp, K, n) device
        layout (the analog of Device::KeySwitch_load_keys packing + caching,
        `host/src/fpga.cpp:1158-1248`)."""
        n, K = self.n, self.K
        keys = np.stack(
            [
                np.asarray(kv, dtype=np.uint64).reshape(self.comp, K, n)
                for kv in k_switch_keys
            ]
        )
        return w.to_pair_np(keys)

    def prepare_msf(self, modswitch_factors) -> Tuple[np.ndarray, np.ndarray]:
        msf = np.array(
            [int(m) % q for m, q in zip(modswitch_factors, self.moduli)],
            dtype=np.uint64,
        )
        return w.to_pair_np(msf)

    def run(self, result, t_target, k_switch_keys, modswitch_factors) -> np.ndarray:
        """Single-op numpy wrapper (batch of 1)."""
        return self.run_batch(
            np.asarray(result, dtype=np.uint64)[None],
            np.asarray(t_target, dtype=np.uint64)[None],
            k_switch_keys,
            modswitch_factors,
        )[0]

    def dispatch_batch(self, results, t_targets, k_switch_keys,
                       modswitch_factors):
        """Stage + dispatch without blocking; returns (lo, hi) device
        arrays shaped (B, comp, L, n)."""
        B = results.shape[0]
        n, L = self.n, self.L
        t = w.to_pair_np(np.asarray(t_targets, dtype=np.uint64).reshape(B, L, n))
        r = w.to_pair_np(
            np.asarray(results, dtype=np.uint64).reshape(B, self.comp, L, n)
        )
        klo, khi = self.prepare_keys(k_switch_keys)
        mlo, mhi = self.prepare_msf(modswitch_factors)
        return self._fn(t[0], t[1], klo, khi, r[0], r[1], mlo, mhi)

    def run_batch(self, results, t_targets, k_switch_keys, modswitch_factors):
        """results: (B, comp*L*n), t_targets: (B, L*n) -> (B, comp*L*n)."""
        olo, ohi = self.dispatch_batch(
            results, t_targets, k_switch_keys, modswitch_factors
        )
        B = results.shape[0]
        return w.from_pair_np(np.asarray(olo), np.asarray(ohi)).reshape(B, -1)


@functools.lru_cache(maxsize=32)
def _context_cached(n, L, K, rns, comp, moduli, tw_key, plain_modulus=None):
    # strict lookup: an evicted stash entry must raise, not silently
    # fall back to default twiddles (see keyswitch_tpu._context_cached)
    tw = _TWIDDLE_STASH[tw_key] if tw_key is not None else None
    return KeySwitchContext(n, L, K, rns, comp, list(moduli), tw,
                            plain_modulus=plain_modulus)


# digest-keyed, bounded: see keyswitch_tpu._TWIDDLE_STASH for rationale
_TWIDDLE_STASH: "dict[bytes, np.ndarray]" = {}
_TWIDDLE_STASH_SLOTS = 32


def get_context(
    n: int,
    decomp_modulus_size: int,
    key_modulus_size: int,
    rns_modulus_size: int,
    key_component_count: int,
    moduli,
    twiddle_factors=None,
    plain_modulus: Optional[int] = None,
) -> KeySwitchContext:
    if twiddle_factors is not None:
        import hashlib

        tw = np.ascontiguousarray(np.asarray(twiddle_factors, dtype=np.uint64))
        tw_key = hashlib.blake2b(tw.tobytes(), digest_size=16).digest()
        _TWIDDLE_STASH.pop(tw_key, None)
        _TWIDDLE_STASH[tw_key] = tw
        while len(_TWIDDLE_STASH) > _TWIDDLE_STASH_SLOTS:
            _TWIDDLE_STASH.pop(next(iter(_TWIDDLE_STASH)))
    else:
        tw_key = None
    return _context_cached(
        n,
        decomp_modulus_size,
        key_modulus_size,
        rns_modulus_size,
        key_component_count,
        tuple(int(m) for m in moduli),
        tw_key,
        None if plain_modulus is None else int(plain_modulus),
    )


def keyswitch(
    result,
    t_target,
    n,
    decomp_modulus_size,
    key_modulus_size,
    rns_modulus_size,
    key_component_count,
    moduli,
    k_switch_keys,
    modswitch_factors,
    twiddle_factors=None,
) -> np.ndarray:
    """Drop-in functional form mirroring `intel::hexl::KeySwitch`
    (`host/inc/hexl-fpga.h:75-80`); accumulates into `result` and returns it."""
    ctx = get_context(
        n,
        decomp_modulus_size,
        key_modulus_size,
        rns_modulus_size,
        key_component_count,
        moduli,
        twiddle_factors,
    )
    return ctx.run(result, t_target, k_switch_keys, modswitch_factors)
