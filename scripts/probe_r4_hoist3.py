"""Decompose the hoisted-apply cost at 16384_6_7_7_2 (VERDICT #1: hoisting
must beat the full op; r3+r4 both measure ~0.65x despite the apply doing
~4.4x less transform work — find where the time actually goes).

Variants timed (hoist-proof chains, same process, interleaved):
  full    — the full keyswitch (_build), the baseline
  h_none  — hoisted apply, perm=None (no gather at all)
  h_trace — hoisted apply, traced perm (the bench path)
  h_const — hoisted apply, perm baked into the program as a CONSTANT
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from hexl_fpga_tpu.ops import keyswitch_tpu, word64 as w
from hexl_fpga_tpu.utils import vectors
from hexl_fpga_tpu.utils.retry import call_with_retry
from hexl_fpga_tpu.utils.timing import chain_timer


def main():
    n, L, K = 16384, 6, 7
    B = int(os.environ.get("PROBE_B", 32))
    frozen = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "testdata", "16384_6_7_7_2_0.json.gz",
    )
    vec = vectors.load_json(frozen)
    print(f"devices: {jax.devices()}", file=sys.stderr)
    ctx = keyswitch_tpu.get_context(
        n, L, K, L + 1, 2, vec.moduli, vec.twiddle_factors
    )
    ts = np.stack([vec.t_target_iter_ptr] * B)
    rs = np.stack([vec.input] * B)
    t = w.to_pair_np(ts.reshape(B, L, n))
    r = w.to_pair_np(rs.reshape(B, 2, L, n))
    keys = [jnp.asarray(x) for x in ctx.device_keys(vec.key_vectors)]
    msf4 = jnp.asarray(ctx.prepare_msf4(vec.modswitch_factors))

    out = call_with_retry(
        ctx.run_batch, rs, ts, vec.key_vectors, vec.modswitch_factors
    )
    np.testing.assert_array_equal(out[0], vec.expected_output)
    dec = ctx.hoist(ts)
    dec.block_until_ready()

    from hexl_fpga_tpu.integrations.ckks import _ntt_galois_sigma

    sigma = _ntt_galois_sigma(n, 5).astype(np.int32)
    perm_c = jnp.asarray(sigma)

    def full(tlo, thi, rlo, rhi):
        olo, ohi = ctx._build(tlo, thi, *keys, rlo, rhi, msf4)
        return olo[:, 0], ohi[:, 0], olo, ohi

    # hoist-proofing: the MAC/INTT2/tails read only dec+keys, which are
    # loop-INVARIANT here (the bench varies the key per step instead) — XLA
    # would hoist the whole pipeline out of the timing loop.  Poke one
    # output scalar back into the decomposition carry each step (an
    # in-place row write on the aliased carry, ~free) so every stage stays
    # loop-variant.  Timing-only: bit-exactness is gated in bench.py/tests.
    def _poke(dl, olo):
        return dl.at[0, 0].set(dl[0, 0] ^ olo[0, 0, 0])

    def h_none(rlo, rhi, dl, dh):
        olo, ohi = ctx._apply_hoisted(dl, dh, rlo, rhi, *keys, msf4,
                                      perm=None)
        return olo, ohi, _poke(dl, olo), dh

    def h_trace(rlo, rhi, dl, dh, p):
        olo, ohi = ctx._apply_hoisted(dl, dh, rlo, rhi, *keys, msf4, perm=p)
        return olo, ohi, _poke(dl, olo), dh, p

    def h_const(rlo, rhi, dl, dh):
        olo, ohi = ctx._apply_hoisted(dl, dh, rlo, rhi, *keys, msf4,
                                      perm=perm_c)
        return olo, ohi, _poke(dl, olo), dh

    args_f = (jnp.asarray(t[0]), jnp.asarray(t[1]),
              jnp.asarray(r[0]), jnp.asarray(r[1]))
    args_n = (jnp.asarray(r[0]), jnp.asarray(r[1]), dec.dlo, dec.dhi)
    args_t = args_n + (perm_c,)

    results = {}
    todo = [
        ("full", full, args_f),
        ("h_none", h_none, args_n),
        ("h_trace", h_trace, args_t),
        ("h_const", h_const, args_n),
    ]
    for rnd in range(3):
        for name, fn, args in todo:
            dt = chain_timer(fn, args, i1=2, i2=6)
            results.setdefault(name, []).append(B / dt)
            print(f"[round {rnd}] {name}: {B/dt:.0f} op/s "
                  f"({dt*1e3:.2f} ms/b{B})", file=sys.stderr)
    med = {k: sorted(v)[len(v) // 2] for k, v in results.items()}
    print(" ".join(f"{k}={med[k]:.0f}" for k in med))


if __name__ == "__main__":
    main()
