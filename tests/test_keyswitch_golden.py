"""KeySwitch golden-model tests.

The critical test here is `test_keyswitch_is_rlwe_keyswitch`: since the
reference's recorded vectors (release testdata.zip) cannot be downloaded in
this environment, we instead prove the decoded dataflow *semantically*
implements RLWE key switching — for genuine switching keys from s_old to
s_new, the output delta ciphertext satisfies
    d0 + d1 * s_new  ==  t * s_old + small_noise  (mod Q)
which is the defining property of SEAL's switch_key_inplace (the operation
the reference accelerates; see `experimental/bridge-seal`)."""

import numpy as np
import pytest

from hexl_fpga_tpu.ops import golden, nt, twiddles
from hexl_fpga_tpu.utils import vectors


def crt_reconstruct(limbs, moduli):
    """limbs: (L, n) residues -> list of ints mod Q = prod(moduli)."""
    Q = 1
    for q in moduli:
        Q *= q
    n = limbs.shape[1]
    out = [0] * n
    for i, q in enumerate(moduli):
        Qi = Q // q
        inv = nt.inverse_mod(Qi % q, q)
        for j in range(n):
            out[j] = (out[j] + int(limbs[i, j]) * Qi * inv) % Q
    return out


def center(x, Q):
    return x - Q if x > Q // 2 else x


# (64, 5, 7) is the 5_7_6_2 shape of the reference's second recorded-vector
# config (`tests/test_keyswitch.cpp:148-191`): K-1 > L, rns = L+1 = 6.
@pytest.mark.parametrize("n,L,K", [(32, 2, 3), (64, 3, 4), (64, 5, 7)])
def test_keyswitch_is_rlwe_keyswitch(n, L, K):
    vec = vectors.make_keyswitch_vector(
        n, L, K, seed=42, modulus_bits=40, nonzero_input=False
    )
    aux = vec.aux
    moduli = vec.moduli
    Qd = 1
    for q in moduli[:L]:
        Qd *= q

    out = vec.expected_output.reshape(2, L, n)
    tabs = [twiddles.ntt_tables(n, q) for q in moduli]
    # back to coefficient domain per limb
    d_coeff = np.stack(
        [
            np.stack([golden.inv_ntt(out[k, i], moduli[i], tabs[i]) for i in range(L)])
            for k in range(2)
        ]
    )  # (2, L, n)

    d0 = crt_reconstruct(d_coeff[0], moduli[:L])
    d1 = crt_reconstruct(d_coeff[1], moduli[:L])

    s_new = aux["s_new"]
    s_old = aux["s_old"]
    t_int = [v % Qd for v in aux["t_int"]]

    lhs = vectors._negacyclic_mul(d1, s_new, Qd)
    lhs = [(a + b) % Qd for a, b in zip(d0, lhs)]
    rhs = vectors._negacyclic_mul(t_int, s_old, Qd)

    err = [center((a - b) % Qd, Qd) for a, b in zip(lhs, rhs)]
    max_err = max(abs(e) for e in err)
    # noise budget: sum_i t_i * e_i / P + rounding ~= L * n * noise * q / P
    bound = L * n * 8 * max(moduli[:L]) // aux["P"] + n * L + 64
    assert max_err <= bound, f"keyswitch noise {max_err} exceeds bound {bound}"
    assert max_err > 0  # sanity: this is an approximate identity, not exact


def test_keyswitch_accumulates_into_input():
    """Output = input + delta with single conditional subtract
    (`host/src/fpga.cpp` FPGAObject_KeySwitch::fill_out_data)."""
    n, L, K = 32, 2, 3
    vec0 = vectors.make_keyswitch_vector(n, L, K, seed=5, nonzero_input=False)
    delta = vec0.expected_output.reshape(2, L, n)

    rng = np.random.default_rng(6)
    ct = np.stack(
        [rng.integers(0, vec0.moduli[i % L], size=n, dtype=np.uint64) for i in range(2 * L)]
    ).reshape(2, L, n)
    got = golden.keyswitch(
        ct.ravel(),
        vec0.t_target_iter_ptr,
        n,
        L,
        K,
        L + 1,
        2,
        vec0.moduli,
        vec0.key_vectors,
        vec0.modswitch_factors,
        vec0.twiddle_factors,
    ).reshape(2, L, n)
    for k in range(2):
        for i in range(L):
            q = np.uint64(vec0.moduli[i])
            with np.errstate(over="ignore"):
                want = ct[k, i] + delta[k, i]
            want = np.where(want >= q, want - q, want)
            np.testing.assert_array_equal(got[k, i], want)


def test_keyswitch_json_roundtrip(tmp_path):
    vec = vectors.make_keyswitch_vector(32, 2, 3, seed=9)
    path = str(tmp_path / f"32_2_3_3_2_{0}.json")
    vectors.save_json(vec, path)
    back = vectors.load_json(path)
    assert back.config_name == vec.config_name
    np.testing.assert_array_equal(back.t_target_iter_ptr, vec.t_target_iter_ptr)
    np.testing.assert_array_equal(back.expected_output, vec.expected_output)
    np.testing.assert_array_equal(back.twiddle_factors, vec.twiddle_factors)
    # re-running the golden model on the loaded vector reproduces expected_output
    got = golden.keyswitch(
        back.input,
        back.t_target_iter_ptr,
        back.coeff_count,
        back.decomp_modulus_size,
        back.key_modulus_size,
        back.rns_modulus_size,
        back.key_component_count,
        back.moduli,
        back.key_vectors,
        back.modswitch_factors,
        back.twiddle_factors,
    )
    np.testing.assert_array_equal(got, back.expected_output)


def test_keyswitch_rns_is_fence_only():
    """rns_modulus_size never reaches the reference's computation — it is
    stored and compared in the batch fence only (`host/src/fpga_int.cpp:443`;
    the kernel launches pass n/decomp/modulus_meta,
    `host/src/fpga.cpp:1296-1301,1560-1565`).  Any positive value must give
    the same bits; zero is rejected (`host/src/keyswitch.cpp:28`)."""
    n, L, K = 32, 2, 3
    vec = vectors.make_keyswitch_vector(n, L, K, seed=13)
    for rns in (1, L, L + 1, L + 2, 17):
        got = golden.keyswitch(
            vec.input.copy(),
            vec.t_target_iter_ptr, n, L, K, rns, 2,
            vec.moduli, vec.key_vectors, vec.modswitch_factors, None,
        )
        np.testing.assert_array_equal(got, vec.expected_output)
    with pytest.raises(AssertionError):
        golden.keyswitch(
            vec.input.copy(),
            vec.t_target_iter_ptr, n, L, K, 0, 2,
            vec.moduli, vec.key_vectors, vec.modswitch_factors, None,
        )


def test_keyswitch_computed_vs_caller_twiddles():
    """Golden model gives identical bits whether twiddles come from the caller
    buffer or are recomputed internally (`fpga.cpp` KeySwitch_load_twiddles)."""
    n, L, K = 32, 2, 3
    vec = vectors.make_keyswitch_vector(n, L, K, seed=11, nonzero_input=False)
    got = golden.keyswitch(
        np.zeros(2 * L * n, dtype=np.uint64),
        vec.t_target_iter_ptr,
        n,
        L,
        K,
        L + 1,
        2,
        vec.moduli,
        vec.key_vectors,
        vec.modswitch_factors,
        twiddle_factors=None,
    )
    np.testing.assert_array_equal(got, vec.expected_output)
