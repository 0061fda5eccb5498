"""Galois-permutation-as-MXU-matmuls (ops/galois_mxu.py): the factorization
is index-exact by construction (build verifies and raises ValueError);
these tests drive the device apply against jnp.take and the scalar sigma,
including the rectangular views (odd log2 n: 2048, 8192)."""

import numpy as np
import pytest

from hexl_fpga_tpu.ops import galois_mxu


@pytest.mark.parametrize(
    "n,g",
    [
        (1024, 5),
        (1024, 2 * 1024 - 1),          # conjugation
        (2048, 5),                     # rectangular (64, 32) view
        (2048, pow(5, 9, 4096)),
        (4096, pow(5, 11, 8192)),
        (8192, 5),                     # rectangular (128, 64) view —
        (8192, pow(5, 33, 16384)),     # first-class reference config
        (8192, 2 * 8192 - 1),
        (16384, 5),
        (16384, pow(5, 123, 32768)),
        (16384, 2 * 16384 - 1),
    ],
)
def test_apply_matches_gather(n, g):
    import jax.numpy as jnp

    ops = galois_mxu.build_galois_operands(n, g)  # verifies index-exact
    staged = galois_mxu.stage_operands(ops)
    rng = np.random.default_rng(n ^ g)
    x = rng.integers(0, 1 << 32, size=(3, n), dtype=np.uint64).astype(
        np.uint32
    )
    sig = galois_mxu.ntt_galois_sigma(n, g)
    got = np.asarray(galois_mxu.apply_galois_mxu(jnp.asarray(x), *staged))
    np.testing.assert_array_equal(got, x[:, sig])


def test_adversarial_values_exact():
    """All-ones limbs (0xFFFFFFFF) and single-bit values survive the f32
    one-hot matmuls bit-exactly regardless of backend matmul precision."""
    import jax.numpy as jnp

    n, g = 1024, 5
    staged = galois_mxu.stage_operands(galois_mxu.build_galois_operands(n, g))
    x = np.zeros((2, n), dtype=np.uint32)
    x[0] = 0xFFFFFFFF
    x[1] = (np.arange(n, dtype=np.uint32) * 0x9E3779B1) | 0x80000001
    sig = galois_mxu.ntt_galois_sigma(n, g)
    got = np.asarray(galois_mxu.apply_galois_mxu(jnp.asarray(x), *staged))
    np.testing.assert_array_equal(got, x[:, sig])


@pytest.mark.parametrize("n,g,bits", [
    (1024, 5, 52),                     # hi_limbs 3
    (8192, pow(5, 33, 16384), 61),     # rectangular view, hi_limbs 4
    (2048, 2 * 2048 - 1, 30),          # q < 2^32: hi == 0, hi_limbs 1
])
def test_apply_pair_matches_gather(n, g, bits):
    """apply_galois_mxu_pair (ONE take+einsum for a canonical (lo, hi)
    pair, 4 + hi_limb_count limbs) is bit-exact vs the direct sigma on
    both planes for every limb-count tier."""
    import jax.numpy as jnp

    staged = galois_mxu.stage_operands(galois_mxu.build_galois_operands(n, g))
    hl = galois_mxu.hi_limb_count([(1 << bits) - 1])
    assert hl == max(1, min(4, -(-(bits - 32) // 8)))
    rng = np.random.default_rng(n ^ g ^ bits)
    v = rng.integers(0, 1 << bits, size=(3, n), dtype=np.uint64)
    lo = (v & 0xFFFFFFFF).astype(np.uint32)
    hi = (v >> 32).astype(np.uint32)
    sig = galois_mxu.ntt_galois_sigma(n, g)
    olo, ohi = galois_mxu.apply_galois_mxu_pair(
        jnp.asarray(lo), jnp.asarray(hi), *staged, hi_limbs=hl
    )
    np.testing.assert_array_equal(np.asarray(olo), lo[:, sig])
    np.testing.assert_array_equal(np.asarray(ohi), hi[:, sig])


def test_invalid_inputs_rejected():
    """Explicit ValueError gates (assert-free: they must survive -O)."""
    with pytest.raises(ValueError):
        galois_mxu.build_galois_operands(1000, 5)  # not a power of two
    with pytest.raises(ValueError):
        galois_mxu.build_galois_operands(1024, 4)  # even galois element


def test_host_index_mirror():
    """_apply_index (the numpy gather mirror of the matmul chain) agrees
    with the direct sigma — the same check build_galois_operands gates on,
    exercised here at a rectangular shape."""
    n, g = 2048, pow(5, 5, 4096)
    ops = galois_mxu.build_galois_operands(n, g)
    x = np.arange(n, dtype=np.int64) * 7 + 3
    sig = galois_mxu.ntt_galois_sigma(n, g)
    np.testing.assert_array_equal(galois_mxu._apply_index(ops, x), x[sig])


def test_sigma_matches_ckks_table():
    from hexl_fpga_tpu.integrations.ckks import _ntt_galois_sigma

    for n, g in ((1024, 5), (1024, 2047), (8192, 5)):
        np.testing.assert_array_equal(
            galois_mxu.ntt_galois_sigma(n, g), _ntt_galois_sigma(n, g)
        )
