"""Vector-driven keyswitch test, mirroring the reference's data-dir protocol
(`tests/test_keyswitch.cpp:148-191`): glob `$KEYSWITCH_DATA_DIR/
{N}_{decomp}_{key}_{rns}_{kcomp}_*.json` and assert bit-exact output.

By default the FROZEN vectors committed under tests/testdata/ are used
(generated once by scripts/gen_keyswitch_testdata.py and committed, so a
regression in the generator cannot silently move oracle and subject
together — the reference's testdata.zip download is unavailable offline).
Point KEYSWITCH_DATA_DIR at recorded vectors to reproduce the reference
flow with other data."""

import glob
import os

import numpy as np
import pytest

from hexl_fpga_tpu.ops import golden
from hexl_fpga_tpu.utils import vectors

DEFAULT_DATA_DIR = os.path.join(os.path.dirname(__file__), "testdata")


def _load_vectors(tmp_path_factory):
    data_dir = os.environ.get("KEYSWITCH_DATA_DIR") or DEFAULT_DATA_DIR
    pats = os.environ.get("N", "1024,2048").split(",")
    files = []
    for n in pats:
        for ext in ("json", "json.gz"):
            files += glob.glob(os.path.join(data_dir, f"{n}_*_*_*_2_*.{ext}"))
    if files:
        return [vectors.load_json(f) for f in sorted(files)[:4]]
    if os.environ.get("KEYSWITCH_DATA_DIR"):
        pytest.skip(f"no vectors matching in {data_dir}")
    # last resort: generate a small set in the same schema
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


@pytest.mark.parametrize(
    "config,want_L,want_K",
    [("16384_6_7_7_2", 6, 7), ("16384_5_7_6_2", 5, 7)],
)
def test_flagship_vector_loads_and_schema_checks(config, want_L, want_K):
    """BOTH recorded 16384 configs (the reference's full recorded matrix,
    `tests/micro_keyswitch.sh:20-34`) must always load with a consistent
    schema in the fast tier (their full compute runs in bench.py, the
    dryrun, and the HW tier — too slow for a 1-core fast run)."""
    files = glob.glob(os.path.join(DEFAULT_DATA_DIR, f"{config}_*.json*"))
    assert files, f"frozen {config} vector missing from tests/testdata/"
    vec = vectors.load_json(sorted(files)[0])
    n, L, K = vec.coeff_count, vec.decomp_modulus_size, vec.key_modulus_size
    assert (n, L, K) == (16384, want_L, want_K)
    assert vec.rns_modulus_size == L + 1
    assert vec.key_component_count == 2
    assert len(vec.moduli) == K
    assert all(1 << 16 <= int(q) <= 1 << 52 for q in vec.moduli)
    assert np.asarray(vec.t_target_iter_ptr).size == L * n
    assert np.asarray(vec.input).size == 2 * L * n
    assert np.asarray(vec.expected_output).size == 2 * L * n
    assert len(vec.key_vectors) == L
    for kv in vec.key_vectors:
        assert np.asarray(kv).size == 2 * K * n
    assert len(vec.modswitch_factors) == K
    # twiddle buffer: 4 tables x K moduli x n (keyswitch host layout)
    assert np.asarray(vec.twiddle_factors).size == 4 * K * n


@pytest.mark.parametrize("config", ["8192_5_7_6_2", "8192_6_7_7_2"])
def test_8192_frozen_vectors_bit_exact(config):
    """The reference's recorded-vector matrix runs BOTH configs at both
    N in {16384, 8192} (`tests/micro_keyswitch.sh:20-34`); the frozen set
    carries 8192 for both configs — assert them bit-exact through the
    golden model (the TPU path equals golden via test_keyswitch_tpu /
    bench.py gates)."""
    files = glob.glob(os.path.join(DEFAULT_DATA_DIR, f"{config}_*.json*"))
    assert files, f"frozen {config} vector missing from tests/testdata/"
    vec = vectors.load_json(sorted(files)[0])
    got = golden.keyswitch(
        vec.input, vec.t_target_iter_ptr, vec.coeff_count,
        vec.decomp_modulus_size, vec.key_modulus_size,
        vec.rns_modulus_size, vec.key_component_count, vec.moduli,
        vec.key_vectors, vec.modswitch_factors, vec.twiddle_factors,
    )
    np.testing.assert_array_equal(got, vec.expected_output)


@pytest.mark.heavy
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
