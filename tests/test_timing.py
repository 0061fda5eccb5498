"""chain_timer sanity on CPU: the slope of a dependent chain must track the
per-iteration cost and must NOT include the fixed per-call overhead."""

import numpy as np

from hexl_fpga_tpu.ops import nt, ntt_jax, word64 as w
from hexl_fpga_tpu.utils.timing import chain_timer


def test_chain_timer_measures_a_real_op():
    n = 256
    q = int(nt.generate_primes(1, 30, n)[0])
    rng = np.random.default_rng(0)
    a = rng.integers(0, q, size=(4, n), dtype=np.uint64)
    lo, hi = w.to_pair_np(a)

    def step(lo, hi):
        return ntt_jax.fwd_ntt_core((lo, hi), n, q)

    dt = chain_timer(step, (lo, hi), i1=2, i2=10, reps=2)
    assert 0 < dt < 5.0  # a real, positive per-iteration cost

    # chaining preserves correctness: k applications == k golden transforms
    import jax

    f = jax.jit(
        lambda s: jax.lax.fori_loop(0, 3, lambda i, ss: tuple(step(*ss)), s)
    )
    out = f((lo, hi))
    from hexl_fpga_tpu.ops import golden

    want = a
    for _ in range(3):
        want = golden.fwd_ntt(want, q)
    np.testing.assert_array_equal(
        w.from_pair_np(np.asarray(out[0]), np.asarray(out[1])), want
    )
