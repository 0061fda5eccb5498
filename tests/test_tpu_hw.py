"""On-hardware validation tier — runs only with HEXL_TPU_HW_TESTS=1 on a
real TPU (the analog of the reference CI's RUN_CHOICE=2 pass on the FPGA
card before the RUN_CHOICE=1 emulation pass, `.github/workflows/ci.yml`).

  HEXL_TPU_HW_TESTS=1 python -m pytest tests/test_tpu_hw.py -q
"""

import os

import numpy as np
import pytest

import jax

pytestmark = pytest.mark.skipif(
    os.environ.get("HEXL_TPU_HW_TESTS") != "1"
    or jax.devices()[0].platform == "cpu",
    reason="hardware tier (HEXL_TPU_HW_TESTS=1 on a TPU)",
)


def test_mxu_ntt_roundtrip_hw():
    from hexl_fpga_tpu.ops import golden, nt, ntt_mxu_pallas

    for n, bits in [(1024, 30), (16384, 51)]:
        q = nt.generate_primes(1, bits, n)[0]
        rng = np.random.default_rng(0)
        a = rng.integers(0, q, size=(8, n), dtype=np.uint64)
        got = ntt_mxu_pallas.fwd_ntt(a, q)
        np.testing.assert_array_equal(got, golden.fwd_ntt(a, q))
        back = ntt_mxu_pallas.inv_ntt(got, q)
        np.testing.assert_array_equal(back, a)


def test_keyswitch_benchmark_config_hw():
    from hexl_fpga_tpu.ops import keyswitch_tpu
    from hexl_fpga_tpu.utils import vectors

    n, L, K = 16384, 6, 7
    vec = vectors.make_keyswitch_vector(n, L, K, seed=0, modulus_bits=51)
    ctx = keyswitch_tpu.get_context(
        n, L, K, L + 1, 2, vec.moduli, vec.twiddle_factors
    )
    got = ctx.run(
        vec.input, vec.t_target_iter_ptr, vec.key_vectors,
        vec.modswitch_factors,
    )
    np.testing.assert_array_equal(got, vec.expected_output)


@pytest.mark.parametrize("config", ["16384_6_7_7_2", "16384_5_7_6_2"])
def test_recorded_16384_configs_hw(config):
    """Both recorded 16384 configs (the reference's full recorded matrix,
    `tests/micro_keyswitch.sh:20-34`) through the production TPU path,
    bit-exact vs the frozen committed vectors."""
    import glob

    from hexl_fpga_tpu.ops import keyswitch_tpu
    from hexl_fpga_tpu.utils import vectors

    data = os.path.join(os.path.dirname(__file__), "testdata")
    files = sorted(glob.glob(os.path.join(data, f"{config}_*.json*")))
    assert files, f"frozen {config} vector missing from tests/testdata/"
    vec = vectors.load_json(files[0])
    ctx = keyswitch_tpu.get_context(
        vec.coeff_count, vec.decomp_modulus_size, vec.key_modulus_size,
        vec.rns_modulus_size, vec.key_component_count, vec.moduli,
        vec.twiddle_factors,
    )
    got = ctx.run(
        vec.input, vec.t_target_iter_ptr, vec.key_vectors,
        vec.modswitch_factors,
    )
    np.testing.assert_array_equal(got, vec.expected_output)


def test_fuzz_random_configs_hw():
    """Randomized config fuzz on hardware: the TPU keyswitch across random
    (n, L, K, prime widths) must match the golden model bit for bit."""
    from hexl_fpga_tpu.ops import keyswitch_tpu
    from hexl_fpga_tpu.utils import vectors

    rng = np.random.default_rng(2026)
    for trial in range(3):
        n = int(rng.choice([1024, 2048, 4096]))
        L = int(rng.integers(2, 5))
        K = L + 1
        bits = int(rng.integers(30, 52))
        vec = vectors.make_keyswitch_vector(
            n, L, K, seed=trial, modulus_bits=bits
        )
        ctx = keyswitch_tpu.KeySwitchTpuContext(
            n, L, K, L + 1, 2, vec.moduli, vec.twiddle_factors, tile_p=2
        )
        got = ctx.run(
            vec.input, vec.t_target_iter_ptr, vec.key_vectors,
            vec.modswitch_factors,
        )
        np.testing.assert_array_equal(
            got, vec.expected_output,
            err_msg=f"config n={n} L={L} K={K} bits={bits}",
        )


def test_api_accelerated_hw():
    from hexl_fpga_tpu import api
    from hexl_fpga_tpu.ops import golden, nt, twiddles

    api.acquire_FPGA_resources()
    q = nt.generate_primes(1, 48, 2048)[0]
    t = twiddles.ntt_tables(2048, q)
    a = np.random.default_rng(1).integers(0, q, size=2048, dtype=np.uint64)
    op = a.copy()
    with pytest.deprecated_call():
        api._set_worksize_NTT(1)
        api._NTT(op, t.fwd, t.fwd_precon, q, 2048)
    api._NTTCompleted()
    np.testing.assert_array_equal(op, golden.fwd_ntt(a, q, t))


def test_api_wide_modulus_fallback_hw():
    """61-bit modulus through the public _NTT on the accelerated tier: must
    route to the XLA/VPU core (the MXU plan only covers q < 2^55) and stay
    bit-exact (reference prime sweep: `tests/test_fwd_ntt.cpp:119-170`)."""
    from hexl_fpga_tpu import api
    from hexl_fpga_tpu.ops import golden, nt, twiddles

    api.acquire_FPGA_resources()
    n = 1024
    q = nt.generate_primes(1, 61, n)[0]
    t = twiddles.ntt_tables(n, q)
    a = np.random.default_rng(7).integers(0, q, size=n, dtype=np.uint64)
    op = a.copy()
    with pytest.deprecated_call():
        api._set_worksize_NTT(1)
        api._NTT(op, t.fwd, t.fwd_precon, q, n)
    api._NTTCompleted()
    np.testing.assert_array_equal(op, golden.fwd_ntt(a, q, t))


def test_api_wire_packed_keyswitch_hw(monkeypatch):
    """HEXL_TPU_WIRE_PACK=1 through the public API on the accelerated tier:
    the executor's packed transport branch must stay bit-exact."""
    from hexl_fpga_tpu import api
    from hexl_fpga_tpu.utils import vectors

    monkeypatch.setenv("HEXL_TPU_WIRE_PACK", "1")
    api.acquire_FPGA_resources()
    vec = vectors.make_keyswitch_vector(1024, 2, 3, seed=4, modulus_bits=45)
    res = vec.input.copy()
    api.set_worksize_KeySwitch(1)
    api.KeySwitch(res, vec.t_target_iter_ptr, 1024, 2, 3, 3, 2,
                  vec.moduli, vec.key_vectors, vec.modswitch_factors,
                  vec.twiddle_factors)
    api.KeySwitchCompleted()
    np.testing.assert_array_equal(res.ravel(), vec.expected_output.ravel())
