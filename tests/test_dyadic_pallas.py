"""Fused Pallas DyadicMultiply (ops/dyadic_pallas.py) bit-exactness, run in
interpreter mode on CPU; hardware timing lives in bench.py / benchmarks/.

Mirrors the reference test domains (`tests/test_dyadic_multiply.cpp`):
random canonical operands over large primes, plus the ramp stimulus with
raw (non-canonical) values over small moduli."""

import numpy as np
import pytest

from hexl_fpga_tpu.ops import dyadic_pallas, golden, nt


def _golden3(op1, op2, n, moduli, M):
    return golden.dyadic_multiply(
        op1.ravel(), op2.ravel(), n, moduli, M
    ).reshape(3, M, n)


@pytest.mark.parametrize(
    "bits", [pytest.param(20, marks=pytest.mark.heavy), 51]
)
def test_dyadic_pallas_random(bits):
    n, M, B = 256, 3, 2
    moduli = nt.generate_primes(M, bits, n)
    rng = np.random.default_rng(bits)
    op1 = rng.integers(0, 2**52, size=(B, 2, M, n), dtype=np.uint64)
    op2 = rng.integers(0, 2**52, size=(B, 2, M, n), dtype=np.uint64)
    for m, q in enumerate(moduli):
        op1[:, :, m, :] %= np.uint64(q)
        op2[:, :, m, :] %= np.uint64(q)
    r = dyadic_pallas.runner(tuple(moduli), n, interpret=True)
    out = r.run(op1, op2)
    for b in range(B):
        np.testing.assert_array_equal(
            out[b], _golden3(op1[b], op2[b], n, moduli, M)
        )


def test_dyadic_pallas_ramp_raw_operands():
    """Raw ramp operands beyond 4q stay exact (the reference MultMod domain
    its ramp tests rely on, `tests/test_dyadic_multiply.cpp:32-109`)."""
    n, M = 256, 2
    moduli = nt.generate_primes(M, 17, n)
    a = (np.arange(2 * M * n, dtype=np.uint64) % np.uint64(8 * moduli[0]))
    b = (np.arange(2 * M * n, dtype=np.uint64)[::-1] % np.uint64(8 * moduli[0]))
    op1 = a.reshape(1, 2, M, n)
    op2 = b.reshape(1, 2, M, n)
    r = dyadic_pallas.runner(tuple(moduli), n, interpret=True)
    out = r.run(op1, op2)
    np.testing.assert_array_equal(out[0], _golden3(op1[0], op2[0], n, moduli, M))


def test_dyadic_pallas_dispatch_matches_run():
    n, M = 128, 1
    moduli = nt.generate_primes(M, 30, n)
    rng = np.random.default_rng(3)
    op1 = rng.integers(0, moduli[0], size=(1, 2, M, n), dtype=np.uint64)
    op2 = rng.integers(0, moduli[0], size=(1, 2, M, n), dtype=np.uint64)
    r = dyadic_pallas.runner(tuple(moduli), n, interpret=True)
    lo, hi = r.dispatch(op1, op2)
    np.testing.assert_array_equal(r._unstage((lo, hi)), r.run(op1, op2))


def test_dispatch32_interleaved_matches_run():
    """Zero-copy interleaved entry: bit-identical to the pair-plane path."""
    from hexl_fpga_tpu.ops import word64 as w

    n, M, B = 256, 3, 2
    moduli = tuple(int(q) for q in nt.generate_primes(M, 30, n))
    r = dyadic_pallas.DyadicRunner(moduli, n, interpret=True)
    rng = np.random.default_rng(9)
    op1 = rng.integers(0, 2**30, size=(B, 2, M, n), dtype=np.uint64)
    op2 = rng.integers(0, 2**30, size=(B, 2, M, n), dtype=np.uint64)
    out32 = r.dispatch32(op1, op2)
    got = w.from_interleaved_np(np.asarray(out32)).reshape(B, 3, M, n)
    want = r.run(op1, op2)
    np.testing.assert_array_equal(got, want)
