"""Argument-validation tests — the analog of the reference's death tests
(`tests/test_dyadic_multiply.cpp` EXPECT_DEATH cases against FPGA_ASSERT)."""

import numpy as np
import pytest

from hexl_fpga_tpu import api


def test_keyswitch_rejects_bad_args():
    n, L, K = 1024, 2, 3
    moduli = [65537 * 2 + 1] * K  # placeholder values within range
    keys = [np.zeros(2 * K * n, dtype=np.uint64)] * L
    msf = [1] * K
    result = np.zeros(2 * L * n, dtype=np.uint64)
    t = np.zeros(L * n, dtype=np.uint64)

    with pytest.raises(AssertionError):
        api.KeySwitch(result, t, 1000, L, K, L + 1, 2, moduli, keys, msf)
    with pytest.raises(AssertionError):
        api.KeySwitch(result, t, n, L, K, L + 1, 3, moduli, keys, msf)
    with pytest.raises(AssertionError):
        api.KeySwitch(result, t, n, L, 8, L + 1, 2, moduli + [3] * 5, keys, msf)
    with pytest.raises(AssertionError):
        api.KeySwitch(result, t, n, 0, K, L + 1, 2, moduli, keys, msf)
    with pytest.raises(AssertionError):  # modulus below 2^16
        api.KeySwitch(result, t, n, L, K, L + 1, 2, [100] * K, keys, msf)
    with pytest.raises(AssertionError):  # modulus above 2^52
        api.KeySwitch(
            result, t, n, L, K, L + 1, 2, [(1 << 53)] * K, keys, msf
        )


def test_dyadic_rejects_bad_args():
    with pytest.raises(AssertionError):
        api.DyadicMultiply(None, np.zeros(1), np.zeros(1), 4, [17], 1)
    with pytest.raises(AssertionError):
        api.DyadicMultiply(np.zeros(12, dtype=np.uint64), np.zeros(8),
                           np.zeros(8), 0, [17], 1)
    with pytest.raises(AssertionError):
        api.DyadicMultiply(np.zeros(12, dtype=np.uint64), np.zeros(8),
                           np.zeros(8), 4, [17], 0)


def test_worksize_must_be_positive():
    with pytest.raises(AssertionError):
        api.set_worksize_DyadicMultiply(0)
    with pytest.raises(AssertionError):
        api.set_worksize_KeySwitch(0)


def test_ntt_rejects_unsupported_n():
    with pytest.deprecated_call():
        with pytest.raises(AssertionError):
            api._NTT(np.zeros(1000, dtype=np.uint64), np.zeros(1000),
                     np.zeros(1000), 65537, 1000)
