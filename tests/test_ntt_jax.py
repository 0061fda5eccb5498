"""JAX NTT/INTT vs golden model: bit-exact across sizes and prime widths."""

import numpy as np
import pytest

from hexl_fpga_tpu.ops import golden, nt, ntt_jax, twiddles


@pytest.mark.parametrize(
    "n", [16, 128, 1024, pytest.param(4096, marks=pytest.mark.heavy)]
)
@pytest.mark.parametrize("bits", [20, 33, 52])
def test_fwd_matches_golden(n, bits):
    q = nt.generate_primes(1, bits, n)[0]
    rng = np.random.default_rng(n + bits)
    a = rng.integers(0, q, size=(3, n), dtype=np.uint64)
    want = golden.fwd_ntt(a, q)
    got = ntt_jax.fwd_ntt(a, q)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize(
    "n", [16, 128, 1024, pytest.param(4096, marks=pytest.mark.heavy)]
)
@pytest.mark.parametrize("bits", [20, 33, 52])
def test_inv_matches_golden(n, bits):
    q = nt.generate_primes(1, bits, n)[0]
    rng = np.random.default_rng(n * 31 + bits)
    a = rng.integers(0, q, size=(3, n), dtype=np.uint64)
    want = golden.inv_ntt(a, q)
    got = ntt_jax.inv_ntt(a, q)
    np.testing.assert_array_equal(got, want)


@pytest.mark.heavy
def test_roundtrip_16384():
    n = 16384
    q = nt.generate_primes(1, 52, n)[0]
    rng = np.random.default_rng(0)
    a = rng.integers(0, q, size=(2, n), dtype=np.uint64)
    fwd = ntt_jax.fwd_ntt(a, q)
    np.testing.assert_array_equal(ntt_jax.inv_ntt(fwd, q), a)
    # spot check one row against golden
    np.testing.assert_array_equal(fwd[0], golden.fwd_ntt(a[0], q))


def test_stimulus_matrix_61bit():
    """Reference stimulus sweep at the 61-62 bit edge of the deprecated NTT API
    (`tests/test_fwd_ntt.cpp:119-170`)."""
    n = 256
    q = nt.generate_primes(1, 61, n)[0]
    stimuli = [
        np.zeros(n, dtype=np.uint64),
        np.ones(n, dtype=np.uint64),
        np.full(n, q - 1, dtype=np.uint64),
        np.arange(n, dtype=np.uint64),
        np.eye(1, n, 0, dtype=np.uint64).ravel(),
    ]
    for a in stimuli:
        np.testing.assert_array_equal(ntt_jax.fwd_ntt(a, q), golden.fwd_ntt(a, q))
        np.testing.assert_array_equal(ntt_jax.inv_ntt(a, q), golden.inv_ntt(a, q))
