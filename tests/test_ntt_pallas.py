"""Pallas NTT/INTT kernels vs golden model (interpret mode on CPU).

On real TPU hardware the same kernels are exercised by bench.py and were
validated bit-exact for n in {1024, 2048, 4096, 8192, 16384} (see BENCH logs);
CI runs interpret mode, the analog of the reference's FPGA_EMULATOR builds
(`device/CMakeLists.txt:4-8`)."""

import numpy as np
import pytest

from hexl_fpga_tpu.ops import golden, nt, ntt_pallas


@pytest.mark.parametrize(
    "n", [1024, pytest.param(2048, marks=pytest.mark.heavy)]
)
@pytest.mark.parametrize("bits", [20, 52])
def test_fwd_matches_golden(n, bits):
    q = nt.generate_primes(1, bits, n)[0]
    rng = np.random.default_rng(n + bits)
    a = rng.integers(0, q, size=(8, n), dtype=np.uint64)
    got = ntt_pallas.fwd_ntt(a, q, interpret=True)
    np.testing.assert_array_equal(got, golden.fwd_ntt(a, q))


@pytest.mark.parametrize(
    "n", [1024, pytest.param(2048, marks=pytest.mark.heavy)]
)
@pytest.mark.parametrize("bits", [20, 52])
def test_inv_matches_golden(n, bits):
    q = nt.generate_primes(1, bits, n)[0]
    rng = np.random.default_rng(n * 3 + bits)
    a = rng.integers(0, q, size=(8, n), dtype=np.uint64)
    got = ntt_pallas.inv_ntt(a, q, interpret=True)
    np.testing.assert_array_equal(got, golden.inv_ntt(a, q))


def test_roundtrip_and_batch_padding():
    n = 1024
    q = nt.generate_primes(1, 45, n)[0]
    rng = np.random.default_rng(5)
    a = rng.integers(0, q, size=(5, n), dtype=np.uint64)  # non-multiple of tile
    fwd = ntt_pallas.fwd_ntt(a, q, interpret=True)
    back = ntt_pallas.inv_ntt(fwd, q, interpret=True)
    np.testing.assert_array_equal(back, a)


def test_stimulus_edges():
    n = 1024
    q = nt.generate_primes(1, 52, n)[0]
    stimuli = np.stack(
        [
            np.zeros(n, dtype=np.uint64),
            np.ones(n, dtype=np.uint64),
            np.full(n, q - 1, dtype=np.uint64),
            np.arange(n, dtype=np.uint64),
            np.eye(1, n, 0, dtype=np.uint64).ravel(),
            np.full(n, q - 1, dtype=np.uint64),
            np.zeros(n, dtype=np.uint64),
            np.ones(n, dtype=np.uint64),
        ]
    )
    np.testing.assert_array_equal(
        ntt_pallas.fwd_ntt(stimuli, q, interpret=True), golden.fwd_ntt(stimuli, q)
    )
    np.testing.assert_array_equal(
        ntt_pallas.inv_ntt(stimuli, q, interpret=True), golden.inv_ntt(stimuli, q)
    )
