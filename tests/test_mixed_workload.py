"""Mixed DyadicMultiply + KeySwitch interleaving through the async API —
the analog of `tests/test_dyadic_multiply_keyswitch.cpp:296-313` against the
combined DYADIC_MULTIPLY_KEYSWITCH bitstream."""

import numpy as np
import pytest

from hexl_fpga_tpu import api
from hexl_fpga_tpu.ops import golden
from hexl_fpga_tpu.utils import vectors


@pytest.fixture(scope="module", autouse=True)
def runtime():
    api.acquire_FPGA_resources()
    yield


@pytest.mark.heavy
def test_interleaved_dyadic_and_keyswitch():
    n, L, K = 1024, 2, 3
    vec = vectors.make_keyswitch_vector(n, L, K, seed=21, modulus_bits=45)
    M = 2
    dy_moduli = np.array(vec.moduli[:M], dtype=np.uint64)
    rng = np.random.default_rng(0)
    reps = 3

    # enqueue both op types before completing either (interleaved batches)
    api.set_worksize_DyadicMultiply(reps)
    api.set_worksize_KeySwitch(reps)
    dy_outs, dy_ins = [], []
    ks_outs = []
    for r in range(reps):
        op1 = rng.integers(0, dy_moduli.min(), size=2 * M * n, dtype=np.uint64)
        op2 = rng.integers(0, dy_moduli.min(), size=2 * M * n, dtype=np.uint64)
        out = np.zeros(3 * M * n, dtype=np.uint64)
        dy_ins.append((op1, op2))
        dy_outs.append(out)
        api.DyadicMultiply(out, op1, op2, n, dy_moduli, M)

        ks = vec.input.copy()
        ks_outs.append(ks)
        api.KeySwitch(
            ks, vec.t_target_iter_ptr, n, L, K, L + 1, 2,
            vec.moduli, vec.key_vectors, vec.modswitch_factors,
            vec.twiddle_factors,
        )
    assert api.DyadicMultiplyCompleted()
    assert api.KeySwitchCompleted()

    for (op1, op2), out in zip(dy_ins, dy_outs):
        np.testing.assert_array_equal(
            out, golden.dyadic_multiply(op1, op2, n, dy_moduli, M)
        )
    for ks in ks_outs:
        np.testing.assert_array_equal(ks, vec.expected_output)


def test_fence_on_parameter_change():
    """Consecutive dyadic ops with different moduli must still all complete
    correctly (each parameter change fences the batch,
    `host/src/fpga_int.cpp:263-273`)."""
    n = 512
    rng = np.random.default_rng(1)
    cases = []
    api.set_worksize_DyadicMultiply(4)
    for m in [(1 << 30) + 3, (1 << 40) + 79, (1 << 30) + 3, (1 << 50) + 5]:
        moduli = np.array([m], dtype=np.uint64)
        op1 = rng.integers(0, m, size=2 * n, dtype=np.uint64)
        op2 = rng.integers(0, m, size=2 * n, dtype=np.uint64)
        out = np.zeros(3 * n, dtype=np.uint64)
        cases.append((op1, op2, out, moduli))
        api.DyadicMultiply(out, op1, op2, n, moduli, 1)
    assert api.DyadicMultiplyCompleted()
    for op1, op2, out, moduli in cases:
        np.testing.assert_array_equal(
            out, golden.dyadic_multiply(op1, op2, n, moduli, 1)
        )
