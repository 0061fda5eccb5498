"""On-chip A/B: deferred-quotient Harvey MAC vs quotient-free exact128 MAC
at the flagship 16384_6_7_7_2 keyswitch (VERDICT r3 next-step #6: one more
algorithm shape at the 84-term MAC residue, measured honestly).

Both contexts share every transform kernel (same moduli/twiddles); only the
MAC term/close schedule differs.  Timing is the hoist-proof dependent chain
(the output feeds back as both the next target and accumulator), interleaved
A/B/A/B so shared-chip load drift cancels.  Run me on the real TPU with no
other TPU process alive.
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

    ts = np.stack([vec.t_target_iter_ptr] * B)
    rs = np.stack([vec.input] * B)
    t = w.to_pair_np(ts.reshape(B, L, n))
    r = w.to_pair_np(rs.reshape(B, 2, L, n))

    def setup(mac_impl):
        ctx = keyswitch_tpu.get_context(
            n, L, K, L + 1, 2, vec.moduli, vec.twiddle_factors,
            mac_impl=mac_impl,
        )
        out = call_with_retry(
            ctx.run_batch, rs, ts, vec.key_vectors, vec.modswitch_factors
        )
        np.testing.assert_array_equal(out[0], vec.expected_output)
        print(f"[{mac_impl}] bit-exact vs frozen vector: OK", file=sys.stderr)
        keys = [jnp.asarray(x) for x in ctx.device_keys(vec.key_vectors)]
        msf4 = jnp.asarray(ctx.prepare_msf4(vec.modswitch_factors))

        def step(tlo, thi, rlo, rhi):
            olo, ohi = ctx._build(tlo, thi, *keys, rlo, rhi, msf4)
            return olo[:, 0], ohi[:, 0], olo, ohi

        args = (jnp.asarray(t[0]), jnp.asarray(t[1]),
                jnp.asarray(r[0]), jnp.asarray(r[1]))
        return step, args

    t0 = time.time()
    step_a, args_a = setup("deferred")
    print(f"[deferred] setup {time.time()-t0:.0f}s", file=sys.stderr)
    t0 = time.time()
    step_b, args_b = setup("exact128")
    print(f"[exact128] setup {time.time()-t0:.0f}s", file=sys.stderr)

    rounds = int(os.environ.get("PROBE_ROUNDS", 3))
    rates = {"deferred": [], "exact128": []}
    for it in range(rounds):
        for name, step, args in (
            ("deferred", step_a, args_a), ("exact128", step_b, args_b)
        ):
            dt = chain_timer(step, args, i1=2, i2=8)
            rates[name].append(B / dt)
            print(f"[round {it}] {name}: {B/dt:.0f} op/s", file=sys.stderr)
    med = {k: sorted(v)[len(v) // 2] for k, v in rates.items()}
    print(
        f"MEDIANS deferred={med['deferred']:.0f} op/s "
        f"exact128={med['exact128']:.0f} op/s "
        f"ratio exact128/deferred={med['exact128']/med['deferred']:.3f}"
    )


if __name__ == "__main__":
    main()
