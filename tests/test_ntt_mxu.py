"""Bit-exactness tests for the MXU four-step NTT (ops/ntt_mxu.py) and its
fused Pallas form (ops/ntt_mxu_pallas.py, interpret mode on CPU).

Oracle: the golden scalar model (ops/golden.py), itself validated against
the reference semantics (`tests/test_utils/ntt.cpp`)."""

import numpy as np
import pytest

import jax

from hexl_fpga_tpu.ops import golden, nt, ntt_mxu, word64 as w


def _roundtrip_case(n, n1, bits, seed=0, B=3):
    q = nt.generate_primes(1, bits, n)[0]
    plan = ntt_mxu.make_plan(n, q, n1)
    rng = np.random.default_rng(seed)
    a = rng.integers(0, q, size=(B, n), dtype=np.uint64)
    lo, hi = w.to_pair_np(a)
    f = jax.jit(lambda lo, hi: ntt_mxu.fwd_ntt_core((lo, hi), n, q, plan))
    olo, ohi = f(lo, hi)
    got = w.from_pair_np(np.asarray(olo), np.asarray(ohi))
    want = golden.fwd_ntt(a, q)
    np.testing.assert_array_equal(got, want)
    g = jax.jit(lambda lo, hi: ntt_mxu.inv_ntt_core((lo, hi), n, q, plan))
    ilo, ihi = g(*w.to_pair_np(want))
    back = w.from_pair_np(np.asarray(ilo), np.asarray(ihi))
    np.testing.assert_array_equal(back, a)


@pytest.mark.parametrize(
    "n,n1,bits",
    [
        (256, 16, 20),
        (256, 16, 30),
        (256, 16, 52),
        (512, 16, 45),
        (1024, 32, 52),
    ],
)
def test_mxu_ntt_roundtrip(n, n1, bits):
    _roundtrip_case(n, n1, bits)


def test_mxu_ntt_stimulus_patterns():
    """Reference stimulus matrix (`tests/test_fwd_ntt.cpp:15-62`)."""
    n, n1 = 256, 16
    q = nt.generate_primes(1, 48, n)[0]
    plan = ntt_mxu.make_plan(n, q, n1)
    pats = [
        np.zeros(n, dtype=np.uint64),
        np.ones(n, dtype=np.uint64),
        np.full(n, q - 1, dtype=np.uint64),
        np.arange(n, dtype=np.uint64) % np.uint64(q),
    ]
    imp = np.zeros(n, dtype=np.uint64)
    imp[0] = 1
    pats.append(imp)
    a = np.stack(pats)
    lo, hi = w.to_pair_np(a)
    f = jax.jit(lambda lo, hi: ntt_mxu.fwd_ntt_core((lo, hi), n, q, plan))
    olo, ohi = f(lo, hi)
    got = w.from_pair_np(np.asarray(olo), np.asarray(ohi))
    np.testing.assert_array_equal(got, golden.fwd_ntt(a, q))


def test_mxu_pallas_interpret_matches_golden():
    """Fused Pallas kernel in interpreter mode (CPU backend)."""
    from hexl_fpga_tpu.ops import ntt_mxu_pallas

    n = 1024  # n1=128 -> n2=8
    q = nt.generate_primes(1, 45, n)[0]
    rng = np.random.default_rng(1)
    a = rng.integers(0, q, size=(4, n), dtype=np.uint64)
    got = ntt_mxu_pallas.fwd_ntt(a, q, tile_p=2, interpret=True)
    np.testing.assert_array_equal(got, golden.fwd_ntt(a, q))
    back = ntt_mxu_pallas.inv_ntt(got, q, tile_p=2, interpret=True)
    np.testing.assert_array_equal(back, a)


def test_mxu_pallas_wide_input_unreduced():
    """data_bits widening: the forward kernel fed UNREDUCED representatives
    (values far above q, e.g. residues canonical under another modulus)
    returns exactly NTT(x mod q) — the mod-q-linearity the keyswitch relies
    on to drop its engine-side Barrett passes."""
    import jax

    from hexl_fpga_tpu.ops import ntt_mxu_pallas

    n = 1024
    q = int(nt.generate_primes(1, 45, n)[0])  # nlimb_for(q) = 6 (48 bits)
    rng = np.random.default_rng(7)
    raw = rng.integers(0, 1 << 53, size=(2, n), dtype=np.uint64)
    call = ntt_mxu_pallas.raw_fwd_call(n, q, tile_p=2, interpret=True,
                                       data_bits=53)
    lo, hi = w.to_pair_np(raw)
    olo, ohi = jax.jit(call)(lo, hi)
    got = w.from_pair_np(np.asarray(olo), np.asarray(ohi))
    np.testing.assert_array_equal(got, golden.fwd_ntt(raw % np.uint64(q), q))


def test_wide_modulus_rejected_with_clear_error():
    # a 61-bit modulus needs 8 limbs > NLIMB: make_plan must raise ValueError
    # (not a bare AssertionError) so the executor fallback is the only route
    q61 = nt.generate_primes(1, 61, 1024)[0]
    assert ntt_mxu.nlimb_for(q61) > ntt_mxu.NLIMB
    with pytest.raises(ValueError, match="limbs"):
        ntt_mxu.make_plan(1024, q61, 8)


def test_executor_routes_wide_modulus_to_xla_core():
    # the accelerated tier must fall back to the XLA/VPU core for moduli the
    # MXU plan cannot cover (reference accepts 20-62 bit primes,
    # `tests/test_fwd_ntt.cpp:119-170`)
    from hexl_fpga_tpu.runtime.executors import JaxExecutor

    q61 = nt.generate_primes(1, 61, 1024)[0]
    q51 = nt.generate_primes(1, 51, 1024)[0]
    assert not JaxExecutor._mxu_supported(1024, int(q61))
    assert JaxExecutor._mxu_supported(1024, int(q51))
    assert not JaxExecutor._mxu_supported(512, int(q51))  # n too small
