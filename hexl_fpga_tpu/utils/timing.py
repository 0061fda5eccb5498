"""Device-honest throughput measurement.

The tunneled TPU runtime used in this environment has a large fixed
dispatch/sync cost per host round trip (~50 ms measured), and its
`block_until_ready` can return before short dispatched work completes —
naive timing loops therefore either wildly over- or under-report kernel
throughput.  The remedy here:

* run the op as a DEPENDENT CHAIN on the device (each iteration consumes
  the previous iteration's output), inside one compiled `lax.fori_loop`
  whose trip count is a runtime argument (the body compiles once);
* time two different trip counts and report the SLOPE — the per-iteration
  cost with the fixed per-call overhead differenced away;
* force completion with a small host fetch from the final state.

This mirrors production steady-state (ops back-to-back on device) rather
than a single isolated dispatch.
"""

from __future__ import annotations

import time
from typing import Callable, Tuple

import numpy as np


def chain_timer(step: Callable, state: Tuple, i1: int = 6, i2: int = 22,
                reps: int = 4) -> float:
    """Seconds per iteration of `step` (state -> state), overhead-free.

    `step` must be traceable (it is compiled once inside a fori_loop) and
    return arrays of the same shapes/dtypes as `state`.

    CAUTION: every expensive part of `step` must depend on the carried
    state.  XLA's while-loop invariant code motion hoists loop-invariant
    subgraphs (including whole kernel chains) out of the fori_loop body —
    a step whose hot path consumes only closed-over constants measures the
    cost of the loop TAIL, not the op.  Feed the op's outputs back into
    ALL of its major inputs."""
    import jax
    import jax.numpy as jnp

    from .retry import call_with_retry

    def run(s, k):
        return jax.lax.fori_loop(0, k, lambda i, ss: tuple(step(*ss)), s)

    f = jax.jit(run)

    def once(k):
        t0 = time.time()
        out = f(state, jnp.int32(k))
        jax.block_until_ready(out)
        _ = np.asarray(out[0].ravel()[:1])  # force a real host round trip
        return time.time() - t0

    call_with_retry(once, i1)  # compile + warm (retries transient remote
    call_with_retry(once, i2)  # compile failures under the tunnel)

    def measure():
        # paired short/long trips: each pair sees (nearly) the same
        # machine load, so pairwise slopes survive load DRIFT; the
        # min-of-mins estimator is kept as the primary (optimal under
        # additive noise) with the median of pairwise slopes as the
        # fallback when a spike lands only on the short-trip runs
        pairs = [(once(i1), once(i2)) for _ in range(reps)]
        t1 = min(p[0] for p in pairs)
        t2 = min(p[1] for p in pairs)
        slope = (t2 - t1) / (i2 - i1)
        if slope > 0:
            return slope
        slopes = sorted((b - a) / (i2 - i1) for a, b in pairs)
        return slopes[len(slopes) // 2]

    slope = measure()
    if slope <= 0:
        slope = measure()  # one fresh retry (transient load spike)
    if slope <= 0:
        # refusing to report is better than recording a clamped-to-zero
        # denominator as an absurd rate (a shared-chip load spike during
        # the short-trip runs can make the raw difference negative)
        raise RuntimeError(
            "chain_timer: non-positive slope twice (machine-load spike "
            "during measurement) — rerun this metric"
        )
    return slope
