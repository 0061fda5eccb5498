"""End-to-end public API tests through the async runtime.

Modeled on the reference test strategy (SURVEY.md §4): everything via the
public worksize/op/Completed protocol, with a global acquire/release fixture
(the reference's gtest fpga_context environment, `tests/main.cpp:8-20`)."""

import os

import numpy as np
import pytest

import hexl_fpga_tpu as hexl
from hexl_fpga_tpu import config as config_mod
from hexl_fpga_tpu.ops import golden, nt, twiddles
from hexl_fpga_tpu.runtime import scheduler
from hexl_fpga_tpu.utils import vectors


@pytest.fixture(autouse=True)
def tpu_context():
    os.environ.setdefault("RUN_CHOICE", "1")  # emulation: JAX on CPU
    config_mod.reset_config()
    hexl.acquire_FPGA_resources()
    yield
    hexl.release_FPGA_resources()
    config_mod.reset_config()


def _dyadic_io(num_ops, num_moduli, n):
    """Deterministic ramp stimulus of `tests/test_dyadic_multiply.cpp:32-109`."""
    moduli, op1, op2, exp = [], [], [], []
    for b in range(num_ops):
        ms = [(b + m + 1) * 10 for m in range(num_moduli)]
        moduli.append(ms)
        o1 = np.concatenate(
            [
                np.array([b + i + 1 + m * n for i in range(n)], dtype=np.uint64)
                for m in range(num_moduli)
            ]
            + [
                np.array([b + i + 11 + m * n for i in range(n)], dtype=np.uint64)
                for m in range(num_moduli)
            ]
        )
        o2 = np.concatenate(
            [
                np.array([b + i + 2 + m * n for i in range(n)], dtype=np.uint64)
                for m in range(num_moduli)
            ]
            + [
                np.array([b + i + 22 + m * n for i in range(n)], dtype=np.uint64)
                for m in range(num_moduli)
            ]
        )
        op1.append(o1)
        op2.append(o2)
        exp.append(golden.dyadic_multiply(o1, o2, n, ms, num_moduli))
    return moduli, op1, op2, exp


@pytest.mark.parametrize("worksize", [1, 4])
def test_dyadic_multiply_api(worksize):
    n, M = 64, 3
    moduli, op1, op2, exp = _dyadic_io(worksize, M, n)
    outs = [np.zeros(3 * M * n, dtype=np.uint64) for _ in range(worksize)]
    hexl.set_worksize_DyadicMultiply(worksize)
    for i in range(worksize):
        hexl.DyadicMultiply(outs[i], op1[i], op2[i], n, moduli[i], M)
    assert hexl.DyadicMultiplyCompleted()
    for i in range(worksize):
        np.testing.assert_array_equal(outs[i], exp[i])


@pytest.mark.parametrize("worksize", [1, 3])
def test_ntt_api(worksize):
    n = 1024
    q = nt.generate_primes(1, 50, n)[0]
    tabs = twiddles.ntt_tables(n, q)
    rng = np.random.default_rng(0)
    ops = [rng.integers(0, q, size=n, dtype=np.uint64) for _ in range(worksize)]
    exp = [golden.fwd_ntt(o, q, tabs) for o in ops]
    with pytest.deprecated_call():
        hexl._set_worksize_NTT(worksize)
        for o in ops:
            hexl._NTT(o, tabs.fwd, tabs.fwd_precon, q, n)
    assert hexl._NTTCompleted()
    for o, e in zip(ops, exp):
        np.testing.assert_array_equal(o, e)  # in-place semantics


@pytest.mark.parametrize("worksize", [1, 3])
def test_intt_api(worksize):
    n = 1024
    q = nt.generate_primes(1, 50, n)[0]
    tabs = twiddles.ntt_tables(n, q)
    rng = np.random.default_rng(1)
    ops = [rng.integers(0, q, size=n, dtype=np.uint64) for _ in range(worksize)]
    exp = [golden.inv_ntt(o, q, tabs) for o in ops]
    with pytest.deprecated_call():
        hexl._set_worksize_INTT(worksize)
        for o in ops:
            hexl._INTT(o, tabs.inv, tabs.inv_precon, q, tabs.inv_n, tabs.inv_n_w, n)
    assert hexl._INTTCompleted()
    for o, e in zip(ops, exp):
        np.testing.assert_array_equal(o, e)


@pytest.mark.heavy
def test_keyswitch_api_batch():
    n, L, K = 32, 2, 3
    # n=32 is below the public API's minimum; use the context directly for
    # small sizes and the API for n=1024 here.
    n = 1024
    vec = vectors.make_keyswitch_vector(n, L, K, seed=2, modulus_bits=45)
    ws = 2
    results = [vec.input.copy() for _ in range(ws)]
    hexl.set_worksize_KeySwitch(ws)
    for r in results:
        hexl.KeySwitch(
            r,
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
    assert hexl.KeySwitchCompleted()
    for r in results:
        np.testing.assert_array_equal(r, vec.expected_output)


def test_keyswitch_api_validation():
    with pytest.raises(Exception):
        hexl.KeySwitch(
            np.zeros(4, dtype=np.uint64),
            np.zeros(4, dtype=np.uint64),
            999,  # invalid n
            1,
            2,
            2,
            2,
            [17],
            [np.zeros(4, dtype=np.uint64)],
            [1],
        )


def test_mixed_dyadic_and_keyswitch():
    """Interleaved DyadicMultiply + KeySwitch batches, the combined-kernel test
    (`tests/test_dyadic_multiply_keyswitch.cpp`)."""
    n, L, K = 1024, 2, 3
    vec = vectors.make_keyswitch_vector(n, L, K, seed=8, modulus_bits=45)
    M = 2
    moduli, op1, op2, exp = _dyadic_io(2, M, n)
    outs = [np.zeros(3 * M * n, dtype=np.uint64) for _ in range(2)]
    ks_res = vec.input.copy()

    hexl.set_worksize_DyadicMultiply(2)
    hexl.set_worksize_KeySwitch(1)
    hexl.DyadicMultiply(outs[0], op1[0], op2[0], n, moduli[0], M)
    hexl.KeySwitch(
        ks_res,
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
    hexl.DyadicMultiply(outs[1], op1[1], op2[1], n, moduli[1], M)
    assert hexl.KeySwitchCompleted()
    assert hexl.DyadicMultiplyCompleted()
    np.testing.assert_array_equal(ks_res, vec.expected_output)
    for i in range(2):
        np.testing.assert_array_equal(outs[i], exp[i])


def test_run_choice_0_cpu_fallback(monkeypatch):
    """RUN_CHOICE=0: golden CPU path supports DyadicMultiply/KeySwitch only
    (`fpga_int.cpp:195-207,317-321`)."""
    hexl.release_FPGA_resources()
    monkeypatch.setenv("RUN_CHOICE", "0")
    config_mod.reset_config()
    hexl.acquire_FPGA_resources()
    n, M = 32, 2
    moduli, op1, op2, exp = _dyadic_io(1, M, n)
    out = np.zeros(3 * M * n, dtype=np.uint64)
    hexl.set_worksize_DyadicMultiply(1)
    hexl.DyadicMultiply(out, op1[0], op2[0], n, moduli[0], M)
    assert hexl.DyadicMultiplyCompleted()
    np.testing.assert_array_equal(out, exp[0])
    # NTT aborts on the CPU backend, as in the reference
    q = nt.generate_primes(1, 30, 1024)[0]
    tabs = twiddles.ntt_tables(1024, q)
    a = np.ones(1024, dtype=np.uint64)
    with pytest.deprecated_call():
        hexl._set_worksize_NTT(1)
        with pytest.raises(RuntimeError):
            hexl._NTT(a, tabs.fwd, tabs.fwd_precon, q, 1024)


def test_seal_bridge_patch_check():
    """apply.sh --check: the vendored SEAL bridge patch must verify offline
    (hunk arithmetic, recorded original-side excerpts, intel::hexl:: API
    cross-check) — the reference proves its patch by applying it in CI
    (`experimental/bridge-seal/README.md`); this is the no-network analog."""
    import subprocess, os as _os

    script = _os.path.join(
        _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
        "experimental", "bridge-seal", "check.py",
    )
    res = subprocess.run(
        ["python", script], capture_output=True, text=True, timeout=60
    )
    assert res.returncode == 0, res.stderr
