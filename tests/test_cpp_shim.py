"""Parity tests for the native C++ runtime (cpp/ — the `hexl-fpga.h` ABI).

Validates, bit for bit against the Python golden layer:
  * the C++ number-theory/twiddle factory (`cpp/src/number_theory.cpp`)
    vs `hexl_fpga_tpu.ops.twiddles`;
  * native NTT/INTT/DyadicMultiply/KeySwitch (`cpp/src/compute.cpp`)
    vs `hexl_fpga_tpu.ops.golden`, driven through the full async API
    (scheduler worksize/fence/batch protocol included);
  * the accelerator backend plug-in: the JAX executors registered through
    `hexl_tpu_register_backend` produce identical results via the C++ API.
"""

import shutil
import subprocess

import numpy as np
import pytest

from hexl_fpga_tpu.ops import golden, nt, twiddles
from hexl_fpga_tpu.utils import vectors

cpp_bridge = pytest.importorskip("hexl_fpga_tpu.cpp_bridge")

pytestmark = pytest.mark.skipif(
    shutil.which("cmake") is None or shutil.which("g++") is None,
    reason="no native toolchain",
)


@pytest.fixture(scope="module")
def rt():
    try:
        runtime = cpp_bridge.NativeRuntime()
    except subprocess.CalledProcessError as e:
        pytest.skip(f"cmake build failed: {e}")
    runtime.acquire()
    yield runtime
    runtime.release()


def test_tables_match_python(rt):
    n = 256
    q = nt.generate_primes(1, 30, n)[0]
    fwd, fwd_p, inv, inv_p, inv_n, inv_n_w = rt.make_ntt_tables(n, q)
    t = twiddles.ntt_tables(n, q)
    np.testing.assert_array_equal(fwd, t.fwd)
    np.testing.assert_array_equal(fwd_p, t.fwd_precon)
    np.testing.assert_array_equal(inv, t.inv)
    np.testing.assert_array_equal(inv_p, t.inv_precon)
    assert inv_n == t.inv_n
    assert inv_n_w == t.inv_n_w


def test_minimal_primitive_root_matches(rt):
    for bits in (20, 30, 45):
        n = 128
        q = nt.generate_primes(1, bits, n)[0]
        assert rt.lib.hexl_tpu_minimal_primitive_root(
            2 * n, q
        ) == nt.minimal_primitive_root(2 * n, q)


@pytest.mark.parametrize("bits", [20, 30, 45, 52])
def test_ntt_intt_vs_golden(rt, bits):
    n = 1024
    q = nt.generate_primes(1, bits, n)[0]
    t = twiddles.ntt_tables(n, q)
    rng = np.random.default_rng(bits)
    stimuli = [
        rng.integers(0, q, size=n, dtype=np.uint64),           # RANDOM
        (np.arange(n, dtype=np.uint64) % np.uint64(q)),         # RAMP
        np.zeros(n, dtype=np.uint64),                           # ZEROS
        np.ones(n, dtype=np.uint64),                            # ONES
        np.full(n, q - 1, dtype=np.uint64),                     # MAX
    ]
    imp = np.zeros(n, dtype=np.uint64)
    imp[0] = 1
    stimuli.append(imp)                                         # IMPULSE
    for a in stimuli:
        got = rt.ntt(a, t.fwd, t.fwd_precon, q, n)
        np.testing.assert_array_equal(got, golden.fwd_ntt(a, q, t))
        back = rt.intt(got, t.inv, t.inv_precon, q, t.inv_n, t.inv_n_w, n)
        np.testing.assert_array_equal(back, a)


def test_dyadic_multiply_vs_golden(rt):
    n, M = 512, 3
    moduli = np.array([65537, (1 << 30) + 3, (1 << 50) + 5], dtype=np.uint64)
    rng = np.random.default_rng(0)
    op1 = (rng.integers(0, 1 << 62, size=2 * M * n, dtype=np.uint64)
           % np.repeat(np.tile(moduli, 2), n))
    op2 = (rng.integers(0, 1 << 62, size=2 * M * n, dtype=np.uint64)
           % np.repeat(np.tile(moduli, 2), n))
    got = rt.dyadic_multiply(op1, op2, n, moduli)
    want = golden.dyadic_multiply(op1, op2, n, moduli, M)
    np.testing.assert_array_equal(got, want)


def test_dyadic_multiply_batched_async(rt):
    n, M = 128, 2
    moduli = np.array([(1 << 40) + 79, (1 << 44) + 43], dtype=np.uint64)
    rng = np.random.default_rng(1)
    ops1 = [rng.integers(0, moduli.min(), size=2 * M * n, dtype=np.uint64)
            for _ in range(5)]
    ops2 = [rng.integers(0, moduli.min(), size=2 * M * n, dtype=np.uint64)
            for _ in range(5)]
    outs = rt.dyadic_multiply(ops1, ops2, n, moduli)
    for a, b, got in zip(ops1, ops2, outs):
        np.testing.assert_array_equal(
            got, golden.dyadic_multiply(a, b, n, moduli, M)
        )


@pytest.mark.parametrize("use_twiddles", [False, True])
def test_keyswitch_vs_golden(rt, use_twiddles):
    n, L, K = 1024, 2, 3
    vec = vectors.make_keyswitch_vector(n, L, K, seed=11, modulus_bits=45)
    tw = vec.twiddle_factors if use_twiddles else None
    got = rt.keyswitch(
        vec.input, vec.t_target_iter_ptr, n, L, K, L + 1, 2,
        vec.moduli, vec.key_vectors, vec.modswitch_factors, tw,
    )
    np.testing.assert_array_equal(got, vec.expected_output)


@pytest.mark.heavy
@pytest.mark.parametrize("pipelined", [False, True])
def test_jax_backend_registration(rt, pipelined):
    """The registered JAX backend handles batches and matches golden —
    via the blocking v1 executors and via the split submit/finalize v2
    pipeline (`cpp/include/hexl_tpu_backend.h`)."""
    rt.register_jax_backend(pipelined=pipelined)
    try:
        n, M = 256, 2
        moduli = np.array([(1 << 40) + 79, (1 << 44) + 43], dtype=np.uint64)
        rng = np.random.default_rng(2)
        op1 = rng.integers(0, moduli.min(), size=2 * M * n, dtype=np.uint64)
        op2 = rng.integers(0, moduli.min(), size=2 * M * n, dtype=np.uint64)
        got = rt.dyadic_multiply(op1, op2, n, moduli)
        np.testing.assert_array_equal(
            got, golden.dyadic_multiply(op1, op2, n, moduli, M)
        )

        q = nt.generate_primes(1, 45, 1024)[0]
        t = twiddles.ntt_tables(1024, q)
        a = rng.integers(0, q, size=1024, dtype=np.uint64)
        got = rt.ntt(a, t.fwd, t.fwd_precon, q, 1024)
        np.testing.assert_array_equal(got, golden.fwd_ntt(a, q, t))

        vec = vectors.make_keyswitch_vector(1024, 2, 3, seed=5, modulus_bits=45)
        got = rt.keyswitch(
            vec.input, vec.t_target_iter_ptr, 1024, 2, 3, 3, 2,
            vec.moduli, vec.key_vectors, vec.modswitch_factors,
            vec.twiddle_factors,
        )
        np.testing.assert_array_equal(got, vec.expected_output)

        # multi-batch stream (batch limit 1 -> one in-flight batch per op):
        # exercises the v2 submit(i+1)-before-finalize(i) overlap window
        ops1 = [rng.integers(0, moduli.min(), size=2 * M * n, dtype=np.uint64)
                for _ in range(5)]
        ops2 = [rng.integers(0, moduli.min(), size=2 * M * n, dtype=np.uint64)
                for _ in range(5)]
        outs = rt.dyadic_multiply(ops1, ops2, n, moduli)
        for a, b, got in zip(ops1, ops2, outs):
            np.testing.assert_array_equal(
                got, golden.dyadic_multiply(a, b, n, moduli, M)
            )
    finally:
        rt.clear_backend()


@pytest.mark.heavy
def test_pipelined_keyswitch_same_result_accumulate(rt):
    """Two KeySwitch ops accumulating into the SAME result buffer inside one
    worksize window, through the pipelined v2 backend: the scheduler must
    finalize batch i before batch i+1's submit snapshots the aliased result
    (read-after-write hazard drain, `cpp/src/runtime.cpp::HasRawHazard`) —
    a stale snapshot would silently drop op 1's contribution."""
    rt.register_jax_backend(pipelined=True)
    try:
        n, L, K = 1024, 2, 3
        vec = vectors.make_keyswitch_vector(n, L, K, seed=7, modulus_bits=45)
        result = np.ascontiguousarray(vec.input, dtype=np.uint64).copy()
        t = np.ascontiguousarray(vec.t_target_iter_ptr, dtype=np.uint64)
        moduli = np.ascontiguousarray(vec.moduli, dtype=np.uint64)
        msf = np.ascontiguousarray(vec.modswitch_factors, dtype=np.uint64)
        keys = [
            np.ascontiguousarray(k, dtype=np.uint64) for k in vec.key_vectors
        ]
        key_arr = (cpp_bridge.u64_p * len(keys))(
            *[cpp_bridge._np_ptr(k) for k in keys]
        )
        tw = np.ascontiguousarray(vec.twiddle_factors, dtype=np.uint64)
        rt.lib.hexl_tpu_set_worksize_keyswitch(2)
        for _ in range(2):
            rt.lib.hexl_tpu_keyswitch(
                cpp_bridge._np_ptr(result), cpp_bridge._np_ptr(t),
                n, L, K, L + 1, 2, cpp_bridge._np_ptr(moduli), key_arr,
                cpp_bridge._np_ptr(msf), cpp_bridge._np_ptr(tw),
            )
        rt.lib.hexl_tpu_keyswitch_completed()
        want = vec.input
        for _ in range(2):
            want = golden.keyswitch(
                want, vec.t_target_iter_ptr, n, L, K, L + 1, 2,
                vec.moduli, vec.key_vectors, vec.modswitch_factors,
                vec.twiddle_factors,
            )
        np.testing.assert_array_equal(result, want)
    finally:
        rt.clear_backend()


def test_cpp_selftest_binary(rt):
    """The standalone C++ self-test binary passes."""
    exe = cpp_bridge._BUILD_DIR / "hexl_tpu_selftest"
    if not exe.exists():
        pytest.skip("selftest binary not built")
    out = subprocess.run([str(exe)], capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stderr
    assert "ALL OK" in out.stdout
