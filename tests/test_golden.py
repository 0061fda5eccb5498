"""Golden-model tests: vectorized numpy vs literal scalar loops and math laws."""

import random

import numpy as np
import pytest

from hexl_fpga_tpu.ops import golden, nt, twiddles


def scalar_fwd_ntt(a, n, q, tables):
    """Literal transcription of the HEXL forward loop
    (`tests/test_utils/ntt.cpp:464-548`), Python big ints."""
    x = [int(v) for v in a]
    t = n >> 1
    m = 1
    while m < n:
        j1 = 0
        for i in range(m):
            W = int(tables.fwd[m + i])
            for j in range(j1, j1 + t):
                X, Y = x[j], x[j + t]
                tx = X - 2 * q if X >= 2 * q else X
                T = (Y * W) % q  # lazy value differs but canonical result agrees
                # emulate the lazy form exactly:
                Wp = int(tables.fwd_precon[m + i])
                Q = (Y * Wp) >> 64
                T = (Y * W - Q * q) & ((1 << 64) - 1)
                x[j] = tx + T
                x[j + t] = tx + 2 * q - T
            j1 += 2 * t
        m <<= 1
        t >>= 1
    return [v % q for v in x]


def scalar_inv_ntt(a, n, q, tables):
    """Literal transcription of the HEXL inverse loop
    (`tests/test_utils/ntt.cpp:580-660`)."""
    M = (1 << 64) - 1

    def lazy(xv, yop, q):
        yp = nt.barrett_factor(yop, 64, q)
        Q = (xv * yp) >> 64
        return (yop * xv - Q * q) & M

    x = [int(v) for v in a]
    t = 1
    root_index = 1
    m = n >> 1
    while m > 1:
        j1 = 0
        for i in range(m):
            W = int(tables.inv[root_index])
            root_index += 1
            for j in range(j1, j1 + t):
                X, Y = x[j], x[j + t]
                tx = X + Y
                ty = X + 2 * q - Y
                x[j] = tx - 2 * q if tx >= 2 * q else tx
                x[j + t] = lazy(ty, W, q)
            j1 += 2 * t
        t <<= 1
        m >>= 1
    W = int(tables.inv[root_index])
    inv_n = nt.inverse_mod(n, q)
    inv_n_w = (inv_n * W) % q
    h = n >> 1
    out = list(x)
    for j in range(h):
        X, Y = x[j], x[j + h]
        tx = X + Y
        if tx >= 2 * q:
            tx -= 2 * q
        ty = X + 2 * q - Y
        out[j] = lazy(tx, inv_n, q)
        out[j + h] = lazy(ty, inv_n_w, q)
    return [v % q for v in out]


@pytest.mark.parametrize("n", [8, 32, 128])
def test_fwd_ntt_matches_scalar(n):
    rng = np.random.default_rng(0)
    for q in nt.generate_primes(2, 30, n):
        tabs = twiddles.ntt_tables(n, q)
        a = rng.integers(0, q, size=n, dtype=np.uint64)
        got = golden.fwd_ntt(a, q, tabs)
        want = scalar_fwd_ntt(a, n, q, tabs)
        assert list(map(int, got)) == want


@pytest.mark.parametrize("n", [8, 32, 128])
def test_inv_ntt_matches_scalar(n):
    rng = np.random.default_rng(1)
    for q in nt.generate_primes(2, 30, n):
        tabs = twiddles.ntt_tables(n, q)
        a = rng.integers(0, q, size=n, dtype=np.uint64)
        got = golden.inv_ntt(a, q, tabs)
        want = scalar_inv_ntt(a, n, q, tabs)
        assert list(map(int, got)) == want


@pytest.mark.parametrize("n", [16, 256, 4096])
@pytest.mark.parametrize("bits", [20, 30, 49, 52, 60])
def test_ntt_roundtrip(n, bits):
    if bits <= nt.log2_exact(n):
        pytest.skip("prime too small for this n")
    rng = np.random.default_rng(n * bits)
    q = nt.generate_primes(1, bits, n)[0]
    tabs = twiddles.ntt_tables(n, q)
    a = rng.integers(0, q, size=(3, n), dtype=np.uint64)
    fwd = golden.fwd_ntt(a, q, tabs)
    assert fwd.max() < q
    back = golden.inv_ntt(fwd, q, tabs)
    np.testing.assert_array_equal(back, a)


def test_ntt_stimulus_matrix():
    """Reference stimulus sweep (`tests/test_fwd_ntt.cpp:15-62`): RAMP, ZEROS,
    ONES, MAX, IMPULSE inputs all roundtrip and stay canonical."""
    n = 512
    for bits in (20, 42, 52, 61):
        q = nt.generate_primes(1, bits, n)[0]
        tabs = twiddles.ntt_tables(n, q)
        stimuli = {
            "zeros": np.zeros(n, dtype=np.uint64),
            "ones": np.ones(n, dtype=np.uint64),
            "ramp": np.arange(n, dtype=np.uint64) % np.uint64(q),
            "max": np.full(n, q - 1, dtype=np.uint64),
            "impulse": np.eye(1, n, 0, dtype=np.uint64).ravel(),
        }
        for name, a in stimuli.items():
            fwd = golden.fwd_ntt(a, q, tabs)
            assert int(fwd.max()) < q, name
            np.testing.assert_array_equal(golden.inv_ntt(fwd, q, tabs), a, err_msg=name)


def test_negacyclic_convolution_theorem():
    """NTT(a) * NTT(b) pointwise == NTT(a * b mod X^n + 1): the mathematical
    property that underlies dyadic multiplication of NTT-form ciphertexts."""
    n = 64
    q = nt.generate_primes(1, 40, n)[0]
    rng = np.random.default_rng(7)
    a = rng.integers(0, q, size=n, dtype=np.uint64)
    b = rng.integers(0, q, size=n, dtype=np.uint64)
    tabs = twiddles.ntt_tables(n, q)
    fa = golden.fwd_ntt(a, q, tabs).astype(object)
    fb = golden.fwd_ntt(b, q, tabs).astype(object)
    prod_ntt = (fa * fb) % q
    got = golden.inv_ntt(prod_ntt.astype(np.uint64), q, tabs)
    # schoolbook negacyclic product
    want = [0] * n
    for i in range(n):
        for j in range(n):
            k = i + j
            s = int(a[i]) * int(b[j])
            if k < n:
                want[k] = (want[k] + s) % q
            else:
                want[k - n] = (want[k - n] - s) % q
    assert list(map(int, got)) == want


def test_mulhi64_and_barrett():
    rng = random.Random(3)
    xs = np.array([rng.randrange(1 << 64) for _ in range(256)], dtype=np.uint64)
    ys = np.array([rng.randrange(1 << 64) for _ in range(256)], dtype=np.uint64)
    hi = golden.mulhi64(xs, ys)
    for x, y, h in zip(xs, ys, hi):
        assert int(h) == (int(x) * int(y)) >> 64
    for bits in (17, 33, 52, 61):
        q = nt.generate_primes(1, bits, 1)[0]
        vals = np.array(
            [rng.randrange(min(1 << 62, (1 << 64) - 1)) for _ in range(128)],
            dtype=np.uint64,
        )
        red = golden.barrett_reduce64(vals, q)
        for v, r in zip(vals, red):
            assert int(r) == int(v) % q


def test_dyadic_multiply_golden():
    """Reference oracle layout test (`tests/test_dyadic_multiply.cpp:32-109`)."""
    n, n_moduli = 16, 3
    moduli = [(m + 1) * 10 for m in range(n_moduli)]
    op1 = np.arange(2 * n_moduli * n, dtype=np.uint64) + 1
    op2 = np.arange(2 * n_moduli * n, dtype=np.uint64) + 2
    out = golden.dyadic_multiply(op1, op2, n, moduli, n_moduli).reshape(3, n_moduli, n)
    x = op1.reshape(2, n_moduli, n)
    y = op2.reshape(2, n_moduli, n)
    for m in range(n_moduli):
        q = moduli[m]
        for i in range(n):
            assert int(out[0, m, i]) == (int(x[0, m, i]) * int(y[0, m, i])) % q
            assert (
                int(out[1, m, i])
                == (int(x[0, m, i]) * int(y[1, m, i]) + int(x[1, m, i]) * int(y[0, m, i])) % q
            )
            assert int(out[2, m, i]) == (int(x[1, m, i]) * int(y[1, m, i])) % q
