"""Shared benchmark helpers (timing, JSON emission).

The fixture configs mirror the reference's google-benchmark suite
(`/root/reference/benchmark/`): fwd/inv NTT at N=16384 worksize 4096,
DyadicMultiply N/moduli sweeps, KeySwitch 16384_6_7_7_2."""

import json
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def emit(metric, value, unit, **extra):
    print(json.dumps({"metric": metric, "value": round(value, 2),
                      "unit": unit, **extra}), flush=True)


def time_fn(fn, *args, iters=20, warmup=True):
    """Median-free simple mean timing of a device-resident callable."""
    import jax

    if warmup:
        out = fn(*args)
        jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters
