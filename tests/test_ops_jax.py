"""Dyadic multiply + keyswitch JAX ops vs golden models (bit-exact)."""

import numpy as np
import pytest

from hexl_fpga_tpu.ops import dyadic_jax, golden, keyswitch_jax, nt
from hexl_fpga_tpu.utils import vectors


def test_dyadic_multiply_matches_golden_small_moduli():
    """Reference test stimulus (`tests/test_dyadic_multiply.cpp:32-109`):
    ramp operands, tiny non-prime moduli."""
    n, M = 64, 4
    moduli = [(m + 1) * 10 for m in range(M)]
    op1 = (np.arange(2 * M * n, dtype=np.uint64) + 1) % np.uint64(1 << 52)
    op2 = (np.arange(2 * M * n, dtype=np.uint64) + 2) % np.uint64(1 << 52)
    want = golden.dyadic_multiply(op1, op2, n, moduli, M)
    got = dyadic_jax.dyadic_multiply(op1, op2, n, moduli, M)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("bits", [30, 52])
def test_dyadic_multiply_matches_golden_large_moduli(bits):
    n, M = 256, 3
    moduli = nt.generate_primes(M, bits, n)
    rng = np.random.default_rng(bits)
    op1 = np.concatenate(
        [rng.integers(0, q, size=n, dtype=np.uint64) for q in moduli * 2]
    )
    op2 = np.concatenate(
        [rng.integers(0, q, size=n, dtype=np.uint64) for q in moduli * 2]
    )
    want = golden.dyadic_multiply(op1, op2, n, moduli, M)
    got = dyadic_jax.dyadic_multiply(op1, op2, n, moduli, M)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize(
    "n,L,K", [(32, 2, 3), pytest.param(64, 3, 4, marks=pytest.mark.heavy)]
)
def test_keyswitch_matches_golden(n, L, K):
    vec = vectors.make_keyswitch_vector(n, L, K, seed=17, modulus_bits=45)
    got = keyswitch_jax.keyswitch(
        vec.input,
        vec.t_target_iter_ptr,
        n,
        L,
        K,
        L + 1,
        2,
        vec.moduli,
        vec.key_vectors,
        vec.modswitch_factors,
        vec.twiddle_factors,
    )
    np.testing.assert_array_equal(got, vec.expected_output)


def test_keyswitch_computed_twiddles_match():
    n, L, K = 32, 2, 3
    vec = vectors.make_keyswitch_vector(n, L, K, seed=23, modulus_bits=40)
    got = keyswitch_jax.keyswitch(
        vec.input,
        vec.t_target_iter_ptr,
        n,
        L,
        K,
        L + 1,
        2,
        vec.moduli,
        vec.key_vectors,
        vec.modswitch_factors,
        twiddle_factors=None,
    )
    np.testing.assert_array_equal(got, vec.expected_output)


@pytest.mark.heavy
def test_keyswitch_batched():
    n, L, K = 32, 2, 3
    vec1 = vectors.make_keyswitch_vector(n, L, K, seed=31, modulus_bits=40)
    rng = np.random.default_rng(1)
    B = 3
    ts = np.stack(
        [vec1.t_target_iter_ptr]
        + [
            np.concatenate(
                [rng.integers(0, vec1.moduli[i], size=n, dtype=np.uint64) for i in range(L)]
            )
            for _ in range(B - 1)
        ]
    )
    rs = np.zeros((B, 2 * L * n), dtype=np.uint64)
    ctx = keyswitch_jax.get_context(
        n, L, K, L + 1, 2, vec1.moduli, vec1.twiddle_factors
    )
    got = ctx.run_batch(rs, ts, vec1.key_vectors, vec1.modswitch_factors)
    for b in range(B):
        want = golden.keyswitch(
            rs[b],
            ts[b],
            n,
            L,
            K,
            L + 1,
            2,
            vec1.moduli,
            vec1.key_vectors,
            vec1.modswitch_factors,
            vec1.twiddle_factors,
        )
        np.testing.assert_array_equal(got[b], want)


@pytest.mark.heavy
def test_keyswitch_16384_config_shape():
    """Flagship config smoke test at reduced size: 4096_2_3_3_2."""
    n, L, K = 4096, 2, 3
    vec = vectors.make_keyswitch_vector(n, L, K, seed=3, modulus_bits=52)
    got = keyswitch_jax.keyswitch(
        vec.input,
        vec.t_target_iter_ptr,
        n,
        L,
        K,
        L + 1,
        2,
        vec.moduli,
        vec.key_vectors,
        vec.modswitch_factors,
        vec.twiddle_factors,
    )
    np.testing.assert_array_equal(got, vec.expected_output)
