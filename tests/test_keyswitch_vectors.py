"""Vector-driven keyswitch test, mirroring the reference's data-dir protocol
(`tests/test_keyswitch.cpp:148-191`): glob `$KEYSWITCH_DATA_DIR/
{N}_{decomp}_{key}_{rns}_{kcomp}_*.json` and assert bit-exact output.

Without KEYSWITCH_DATA_DIR set, a small vector set is generated on the fly
(the reference's testdata.zip download is not available offline); point the
env var at recorded vectors to reproduce the reference flow exactly."""

import glob
import os

import numpy as np
import pytest

from hexl_fpga_tpu.ops import golden
from hexl_fpga_tpu.utils import vectors


def _load_vectors(tmp_path_factory):
    data_dir = os.environ.get("KEYSWITCH_DATA_DIR")
    if data_dir:
        pats = os.environ.get("N", "1024,4096").split(",")
        files = []
        for n in pats:
            files += glob.glob(os.path.join(data_dir, f"{n}_*_*_*_2_*.json"))
        if not files:
            pytest.skip(f"no vectors matching in {data_dir}")
        return [vectors.load_json(f) for f in sorted(files)[:4]]
    # generate a small set in the same schema
    out = []
    for n, L, K in [(1024, 2, 3), (2048, 3, 4)]:
        for seed in range(2):
            out.append(
                vectors.make_keyswitch_vector(n, L, K, seed=seed,
                                              modulus_bits=45)
            )
    return out


@pytest.fixture(scope="module")
def vecs(tmp_path_factory):
    return _load_vectors(tmp_path_factory)


def test_golden_matches_vectors(vecs):
    for vec in vecs:
        got = golden.keyswitch(
            vec.input, vec.t_target_iter_ptr, vec.coeff_count,
            vec.decomp_modulus_size, vec.key_modulus_size,
            vec.rns_modulus_size, vec.key_component_count, vec.moduli,
            vec.key_vectors, vec.modswitch_factors, vec.twiddle_factors,
        )
        np.testing.assert_array_equal(got, vec.expected_output)


def test_tpu_path_matches_vectors(vecs):
    from hexl_fpga_tpu.ops import keyswitch_tpu

    for vec in vecs[:2]:
        ctx = keyswitch_tpu.KeySwitchTpuContext(
            vec.coeff_count, vec.decomp_modulus_size, vec.key_modulus_size,
            vec.rns_modulus_size, vec.key_component_count, vec.moduli,
            vec.twiddle_factors, tile_p=2, interpret=True,
        )
        got = ctx.run(
            vec.input, vec.t_target_iter_ptr, vec.key_vectors,
            vec.modswitch_factors,
        )
        np.testing.assert_array_equal(got, vec.expected_output)
