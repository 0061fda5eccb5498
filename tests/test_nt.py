"""Number-theory layer tests (vs Python big-int oracles)."""

import random

import numpy as np
import pytest

from hexl_fpga_tpu.ops import nt, twiddles


def test_reverse_bits():
    assert nt.reverse_bits(0b0001, 4) == 0b1000
    assert nt.reverse_bits(0b1011, 4) == 0b1101
    assert nt.reverse_bits(1, 1) == 1
    assert nt.reverse_bits(5, 0) == 0


def test_inverse_mod():
    rng = random.Random(1)
    for q in nt.generate_primes(5, 30, 1024):
        for _ in range(20):
            a = rng.randrange(1, q)
            inv = nt.inverse_mod(a, q)
            assert (a * inv) % q == 1


def test_generate_primes_properties():
    primes = nt.generate_primes(4, 40, 4096)
    assert len(primes) == 4
    for q in primes:
        assert nt.is_prime(q)
        assert (1 << 40) <= q < (1 << 41)
        assert q % (2 * 4096) == 1


def test_is_prime_small():
    known = {2, 3, 5, 7, 11, 13, 97, 7919}
    for n in range(2, 100):
        ref = all(n % d for d in range(2, n))
        assert nt.is_prime(n) == ref, n
    for n in known:
        assert nt.is_prime(n)


def test_minimal_primitive_root():
    for q in nt.generate_primes(3, 25, 64):
        w = nt.minimal_primitive_root(128, q)
        assert nt.is_primitive_root(w, 128, q)
        # minimality: no smaller primitive root among all odd powers
        ws = {pow(w, e, q) for e in range(1, 128, 2)}
        assert w == min(x for x in ws if nt.is_primitive_root(x, 128, q))


def test_barrett_factor():
    rng = random.Random(2)
    for _ in range(50):
        q = rng.randrange(1 << 20, 1 << 52)
        op = rng.randrange(q + 1)
        assert nt.barrett_factor(op, 64, q) == ((op << 64) // q) & ((1 << 64) - 1)


def test_rk_factor():
    for q in nt.generate_primes(3, 50, 16384):
        rk = nt.rk_factor(q)
        k = rk & 0xFF
        r = rk >> 8
        assert (1 << k) >= q and (1 << (k - 1)) < q
        assert r == (1 << (2 * k)) // q


def test_twiddle_tables_structure():
    n = 64
    q = nt.generate_primes(1, 30, n)[0]
    t = twiddles.ntt_tables(n, q)
    bits = nt.log2_exact(n)
    # fwd[bit_reverse(i)] == w^i
    for i in range(n):
        assert int(t.fwd[nt.reverse_bits(i, bits)]) == pow(t.w, i, q)
    # inv table scan order with leading 1
    inv_pre = [nt.inverse_mod(int(v), q) for v in t.fwd]
    expect = [inv_pre[0]]
    m = n >> 1
    while m > 0:
        expect.extend(inv_pre[m : 2 * m])
        m >>= 1
    assert list(map(int, t.inv)) == expect
    assert (t.inv_n * n) % q == 1


def test_keyswitch_twiddle_layout():
    n = 32
    q = nt.generate_primes(1, 28, n)[0]
    t = twiddles.ntt_tables(n, q)
    buf = twiddles.keyswitch_twiddles_one_modulus(n, q)
    assert buf.shape == (4 * n,)
    # inv block drops the leading 1 and zeroes the final slot
    # (`host/src/twiddle-factors.cpp:48-55`)
    assert list(buf[: n - 1]) == list(t.inv[1:])
    assert buf[n - 1] == 0
    np.testing.assert_array_equal(buf[2 * n : 3 * n], t.fwd)
    np.testing.assert_array_equal(buf[3 * n : 4 * n], t.fwd_precon)
    view = twiddles.decode_keyswitch_twiddles(buf, n, 1)
    np.testing.assert_array_equal(view.fwd[0], t.fwd)
