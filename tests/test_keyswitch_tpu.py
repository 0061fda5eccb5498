"""KeySwitch TPU-path (ops/keyswitch_tpu.py) bit-exactness, run on the CPU
backend with the fused Pallas kernels in interpreter mode.

Real-hardware validation of the same path (incl. the 16384_6_7_7_2
benchmark config) runs in benchmarks/bench_keyswitch.py on the TPU."""

import numpy as np
import pytest

from hexl_fpga_tpu.ops import keyswitch_tpu
from hexl_fpga_tpu.utils import vectors


@pytest.fixture(scope="module")
def vec():
    return vectors.make_keyswitch_vector(1024, 2, 3, seed=11, modulus_bits=45)


def test_keyswitch_tpu_with_caller_twiddles(vec):
    ctx = keyswitch_tpu.KeySwitchTpuContext(
        1024, 2, 3, 3, 2, vec.moduli, vec.twiddle_factors,
        tile_p=2, interpret=True,
    )
    got = ctx.run(
        vec.input, vec.t_target_iter_ptr, vec.key_vectors, vec.modswitch_factors
    )
    np.testing.assert_array_equal(got, vec.expected_output)


def test_keyswitch_tpu_computed_twiddles_and_batch(vec):
    ctx = keyswitch_tpu.KeySwitchTpuContext(
        1024, 2, 3, 3, 2, vec.moduli, None, tile_p=2, interpret=True,
    )
    B = 3
    ts = np.stack([vec.t_target_iter_ptr] * B)
    rs = np.stack([vec.input] * B)
    outs = ctx.run_batch(rs, ts, vec.key_vectors, vec.modswitch_factors)
    for b in range(B):
        np.testing.assert_array_equal(outs[b], vec.expected_output)


def test_device_key_cache_reuses_upload(vec):
    ctx = keyswitch_tpu.KeySwitchTpuContext(
        1024, 2, 3, 3, 2, vec.moduli, None, tile_p=2, interpret=True,
    )
    k1 = ctx.device_keys(vec.key_vectors)
    k2 = ctx.device_keys(vec.key_vectors)
    assert k1[0] is k2[0] and k1[1] is k2[1]
