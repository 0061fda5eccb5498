"""Property tests: word64 pair arithmetic vs Python big-int oracle."""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hexl_fpga_tpu.ops import nt, word64 as w

M64 = (1 << 64) - 1


def pairs(vals):
    return tuple(jnp.asarray(v) for v in w.to_pair_np(np.array(vals, dtype=np.uint64)))


def ints(p):
    return [int(v) for v in w.from_pair_np(np.asarray(p[0]), np.asarray(p[1]))]


@pytest.fixture(scope="module")
def rng():
    return random.Random(1234)


def test_mul32(rng):
    a = np.array([rng.randrange(1 << 32) for _ in range(512)], dtype=np.uint32)
    b = np.array([rng.randrange(1 << 32) for _ in range(512)], dtype=np.uint32)
    lo, hi = w.mul32(jnp.asarray(a), jnp.asarray(b))
    prod = [int(x) * int(y) for x, y in zip(a, b)]
    assert [int(v) for v in np.asarray(lo)] == [p & 0xFFFFFFFF for p in prod]
    assert [int(v) for v in np.asarray(hi)] == [p >> 32 for p in prod]


def test_add_sub_cmp(rng):
    xs = [rng.randrange(1 << 64) for _ in range(512)]
    ys = [rng.randrange(1 << 64) for _ in range(512)]
    a, b = pairs(xs), pairs(ys)
    assert ints(w.add64(a, b)) == [(x + y) & M64 for x, y in zip(xs, ys)]
    assert ints(w.sub64(a, b)) == [(x - y) & M64 for x, y in zip(xs, ys)]
    ge = np.asarray(w.ge64(a, b))
    assert list(ge) == [x >= y for x, y in zip(xs, ys)]


def test_mul64(rng):
    xs = [rng.randrange(1 << 64) for _ in range(512)]
    ys = [rng.randrange(1 << 64) for _ in range(512)]
    a, b = pairs(xs), pairs(ys)
    assert ints(w.mullo64(a, b)) == [(x * y) & M64 for x, y in zip(xs, ys)]
    assert ints(w.mulhi64(a, b)) == [(x * y) >> 64 for x, y in zip(xs, ys)]
    r0, r1, r2, r3 = w.mul64_full(a, b)
    full = [
        int(v0) | (int(v1) << 32) | (int(v2) << 64) | (int(v3) << 96)
        for v0, v1, v2, v3 in zip(
            np.asarray(r0), np.asarray(r1), np.asarray(r2), np.asarray(r3)
        )
    ]
    assert full == [x * y for x, y in zip(xs, ys)]


def test_add128(rng):
    """4-limb 128-bit add vs bigints, including carry cascades from
    all-ones limbs (sum kept < 2^128 as the exact128 MAC guarantees)."""
    xs = [rng.randrange(1 << 127) for _ in range(509)] + [
        (1 << 127) - 1, (1 << 96) - 1, (1 << 64) - 1
    ]
    ys = [rng.randrange((1 << 127) - x) for x in xs]

    def limbs(vals):
        return tuple(
            jnp.asarray(
                np.array([(v >> (32 * i)) & 0xFFFFFFFF for v in vals],
                         dtype=np.uint32)
            )
            for i in range(4)
        )

    s = w.add128(limbs(xs), limbs(ys))
    got = [
        int(a) | (int(b) << 32) | (int(c) << 64) | (int(d) << 96)
        for a, b, c, d in zip(*(np.asarray(x) for x in s))
    ]
    assert got == [x + y for x, y in zip(xs, ys)]


@pytest.mark.parametrize("bits", [17, 28, 33, 45, 52])
def test_mul_mod_static(rng, bits):
    q = nt.generate_primes(1, bits, 16)[0]
    xs = [rng.randrange(q) for _ in range(512)]
    ys = [rng.randrange(q) for _ in range(512)]
    got = ints(w.mul_mod_static(pairs(xs), pairs(ys), q))
    assert got == [(x * y) % q for x, y in zip(xs, ys)]


@pytest.mark.parametrize("bits", [20, 40, 52, 61])
def test_mul_mod_lazy_and_barrett(rng, bits):
    q = nt.generate_primes(1, bits, 16)[0]
    ws = [rng.randrange(q) for _ in range(256)]
    wp = [nt.barrett_factor(v, 64, q) for v in ws]
    xs = [rng.randrange(4 * q) for _ in range(256)]
    lazy = ints(w.mul_mod_lazy(pairs(xs), pairs(ws), pairs(wp), q))
    for x, wv, t in zip(xs, ws, lazy):
        assert t < 2 * q
        assert t % q == (x * wv) % q
    # barrett_reduce64 full reduction
    q_barr = nt.barrett_factor(1, 64, q)
    vals = [rng.randrange(1 << 62) for _ in range(256)]
    red = ints(w.barrett_reduce64(pairs(vals), q, q_barr))
    assert red == [v % q for v in vals]


def test_add_sub_mod(rng):
    q = nt.generate_primes(1, 50, 16)[0]
    xs = [rng.randrange(q) for _ in range(256)]
    ys = [rng.randrange(q) for _ in range(256)]
    assert ints(w.add_mod(pairs(xs), pairs(ys), q)) == [
        (x + y) % q for x, y in zip(xs, ys)
    ]
    assert ints(w.sub_mod(pairs(xs), pairs(ys), q)) == [
        (x - y) % q for x, y in zip(xs, ys)
    ]


def test_reduce_mod_factor(rng):
    q = nt.generate_primes(1, 45, 16)[0]
    for factor in (1, 2, 4, 8):
        xs = [rng.randrange(factor * q) for _ in range(256)]
        got = ints(w.reduce_mod_factor(pairs(xs), q, factor))
        assert got == [x % q for x in xs]


def test_mul_mod_traced(rng):
    """MultMod recipe with traced per-element moduli, incl. tiny non-prime
    moduli as in the dyadic-multiply tests (`tests/test_dyadic_multiply.cpp`)."""
    qs, xs, ys = [], [], []
    for _ in range(512):
        q = rng.choice([10, 20, 1000, (1 << 28) + 3, (1 << 52) - 47, rng.randrange(2, 1 << 52)])
        qs.append(q)
        xs.append(rng.randrange(4 * q) if 4 * q < (1 << 63) else rng.randrange(q))
        ys.append(rng.randrange(4 * q) if 4 * q < (1 << 63) else rng.randrange(q))
    lens = [int(np.floor(np.log2(q))) - 1 if q > 2 else 0 for q in qs]
    barrs = [((1 << (l + 64)) // q) & M64 for q, l in zip(qs, lens)]
    got = ints(
        w.mul_mod_traced(
            pairs(xs),
            pairs(ys),
            pairs(qs),
            pairs(barrs),
            jnp.asarray(np.array(lens, dtype=np.uint32)),
        )
    )
    assert got == [(x % q) * (y % q) % q for x, y, q in zip(xs, ys, qs)]


def test_jit_compatible():
    q = nt.generate_primes(1, 50, 16)[0]

    @jax.jit
    def f(alo, ahi, blo, bhi):
        return w.mul_mod_static((alo, ahi), (blo, bhi), q)

    rng = np.random.default_rng(0)
    a = rng.integers(0, q, size=128, dtype=np.uint64)
    b = rng.integers(0, q, size=128, dtype=np.uint64)
    alo, ahi = w.to_pair_np(a)
    blo, bhi = w.to_pair_np(b)
    lo, hi = f(alo, ahi, blo, bhi)
    got = w.from_pair_np(np.asarray(lo), np.asarray(hi))
    want = [(int(x) * int(y)) % q for x, y in zip(a, b)]
    assert list(map(int, got)) == want


def test_mulhi64_approx_error_bound():
    """mulhi64_approx underestimates the exact high word by at most 2 (the
    dropped low-half carry), the bound the dyadic approx-Barrett path's
    extra conditional subtracts rely on."""
    import jax.numpy as jnp

    rng = np.random.default_rng(11)
    a = rng.integers(0, 1 << 64, size=512, dtype=np.uint64)
    b = rng.integers(0, 1 << 64, size=512, dtype=np.uint64)
    # include adversarial carry-heavy operands
    a[:8] = [0xFFFFFFFFFFFFFFFF, 0xFFFFFFFF00000000, 0x00000000FFFFFFFF,
             0x8000000080000000, 0xFFFFFFFFFFFFFFFE, 1, 0, 0x123456789ABCDEF0]
    b[:8] = [0xFFFFFFFFFFFFFFFF, 0xFFFFFFFFFFFFFFFF, 0xFFFFFFFF00000001,
             0x7FFFFFFFFFFFFFFF, 2, 0xFFFFFFFFFFFFFFFF, 5, 0xFEDCBA9876543210]
    al, ah = w.to_pair_np(a)
    bl, bh = w.to_pair_np(b)
    gl, gh = w.mulhi64_approx((jnp.asarray(al), jnp.asarray(ah)),
                              (jnp.asarray(bl), jnp.asarray(bh)))
    got = w.from_pair_np(np.asarray(gl), np.asarray(gh)).astype(object)
    want = [(int(x) * int(y)) >> 64 for x, y in zip(a, b)]
    diff = [int(wv) - int(gv) for wv, gv in zip(want, got)]
    assert all(0 <= d <= 2 for d in diff), max(diff)


def test_precon64_np_exact_vs_bigint():
    """Vectorized base-2^8 long division == Python bigint floor(k<<64/q)
    across modulus sizes and edge values."""
    rng = np.random.default_rng(5)
    for bits in (17, 40, 45, 52, 54):
        q = int(nt.generate_primes(1, bits, 1024)[0])
        ks = np.concatenate([
            np.array([0, 1, q - 1], dtype=np.uint64),
            rng.integers(0, q, size=200, dtype=np.uint64),
        ])
        got = w.precon64_np(ks, q)
        want = np.array([(int(k) << 64) // q for k in ks], dtype=np.uint64)
        np.testing.assert_array_equal(got, want)
