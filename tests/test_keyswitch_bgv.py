"""BGV-mode keyswitch (plain_modulus = t).

The reference's tail (`device/keyswitch/ms.hpp:27-84`) subtracts the plain
centered residue [d]_qk before the q_k^{-1} multiply — correct for CKKS/BFV,
where the rounding error lands in the noise.  BGV keeps its message in the
LSB mod t, so the subtracted value must ALSO be divisible by t.  With
plain_modulus set, both the golden model and the device contexts apply the
Gentry-Halevi-Smart correction: d' = [d]_qk + qk*u' with
u' = [-[d]_qk * qk^{-1}]_t centered, so d' == d (mod qk) AND d' == 0 (mod t).

The defining semantic property proved here: for BGV switching keys (errors
scaled by t), the keyswitch noise
    d0 + d1*s_new - t_target*s_old   (mod Q, centered)
is small AND exactly divisible by t — so [m]_t survives key switching.
"""

import numpy as np
import pytest

from hexl_fpga_tpu.ops import golden, nt, twiddles
from hexl_fpga_tpu.ops import keyswitch_tpu
from hexl_fpga_tpu.utils import vectors

T = 65537  # BGV plaintext modulus (prime; coprime to the NTT-friendly q's)


@pytest.fixture(scope="module")
def bgv_vec():
    """One shared n=1024 BGV vector (golden keyswitch at n=1024 is pure
    Python big-int — generate once for the whole module)."""
    return vectors.make_keyswitch_vector(
        1024, 2, 3, seed=11, modulus_bits=45, plain_modulus=T,
    )


def crt_reconstruct(limbs, moduli):
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


def _keyswitch_noise(vec, out_flat):
    """Centered noise polynomial d0 + d1*s_new - t*s_old mod Qd (ints)."""
    n, L = vec.coeff_count, vec.decomp_modulus_size
    moduli = vec.moduli
    aux = vec.aux
    Qd = 1
    for q in moduli[:L]:
        Qd *= q
    out = out_flat.reshape(2, L, n)
    tabs = [twiddles.ntt_tables(n, q) for q in moduli]
    d_coeff = np.stack(
        [
            np.stack(
                [golden.inv_ntt(out[k, i], moduli[i], tabs[i]) for i in range(L)]
            )
            for k in range(2)
        ]
    )
    d0 = crt_reconstruct(d_coeff[0], moduli[:L])
    d1 = crt_reconstruct(d_coeff[1], moduli[:L])
    t_int = [v % Qd for v in aux["t_int"]]
    lhs = vectors._negacyclic_mul(d1, aux["s_new"], Qd)
    lhs = [(a + b) % Qd for a, b in zip(d0, lhs)]
    rhs = vectors._negacyclic_mul(t_int, aux["s_old"], Qd)
    return [center((a - b) % Qd, Qd) for a, b in zip(lhs, rhs)], Qd


@pytest.mark.parametrize("n,L,K", [(32, 2, 3), (64, 3, 4)])
def test_bgv_keyswitch_noise_divisible_by_t(n, L, K):
    """The headline BGV property: noise small and == 0 (mod t) exactly."""
    vec = vectors.make_keyswitch_vector(
        n, L, K, seed=42, modulus_bits=40, nonzero_input=False,
        plain_modulus=T,
    )
    err, _ = _keyswitch_noise(vec, vec.expected_output)
    max_err = max(abs(e) for e in err)
    bound = T * (L * n * 8 * max(vec.moduli[:L]) // vec.aux["P"] + n * L + 64)
    assert 0 < max_err <= bound, f"noise {max_err} exceeds bound {bound}"
    assert all(e % T == 0 for e in err), "BGV noise must be divisible by t"


def test_ckks_tail_breaks_bgv_divisibility():
    """Control: the SAME t-scaled keys through the plain CKKS/BFV tail leave
    a rounding delta NOT divisible by t — the correction is load-bearing."""
    n, L, K = 32, 2, 3
    vec = vectors.make_keyswitch_vector(
        n, L, K, seed=42, modulus_bits=40, nonzero_input=False,
        plain_modulus=T,
    )
    out_plain = golden.keyswitch(
        vec.input.copy(), vec.t_target_iter_ptr, n, L, K, L + 1, 2,
        vec.moduli, vec.key_vectors, vec.modswitch_factors,
        vec.twiddle_factors,  # no plain_modulus: CKKS/BFV tail
    )
    err, _ = _keyswitch_noise(vec, out_plain)
    assert any(e % T != 0 for e in err)


def test_device_bgv_matches_golden_fused(bgv_vec):
    """Device BGV context (fused tail) bit-exact vs golden BGV."""
    vec = bgv_vec
    ctx = keyswitch_tpu.KeySwitchTpuContext(
        1024, 2, 3, 3, 2, vec.moduli, vec.twiddle_factors,
        tile_p=2, interpret=True, plain_modulus=T,
    )
    got = ctx.run(
        vec.input, vec.t_target_iter_ptr, vec.key_vectors,
        vec.modswitch_factors,
    )
    np.testing.assert_array_equal(got, vec.expected_output)


@pytest.mark.heavy
def test_device_bgv_matches_golden_unfused(bgv_vec):
    """The XLA-composition tail applies the same sigma fold (widened f rides
    the 7-limb wide-input transform, capacity 2^56)."""
    vec = bgv_vec
    ctx = keyswitch_tpu.KeySwitchTpuContext(
        1024, 2, 3, 3, 2, vec.moduli, vec.twiddle_factors,
        tile_p=2, interpret=True, plain_modulus=T, fused_tail=False,
    )
    got = ctx.run(
        vec.input, vec.t_target_iter_ptr, vec.key_vectors,
        vec.modswitch_factors,
    )
    np.testing.assert_array_equal(got, vec.expected_output)


def test_bgv_context_guards(bgv_vec):
    vec = bgv_vec
    qk = vec.moduli[-1]
    with pytest.raises(AssertionError, match="coprime"):
        keyswitch_tpu.KeySwitchTpuContext(
            1024, 2, 3, 3, 2, vec.moduli, None, tile_p=2, interpret=True,
            plain_modulus=qk,
        )
    with pytest.raises(AssertionError, match=">= 2"):
        keyswitch_tpu.KeySwitchTpuContext(
            1024, 2, 3, 3, 2, vec.moduli, None, tile_p=2, interpret=True,
            plain_modulus=1,
        )


def test_get_context_caches_per_plain_modulus(bgv_vec):
    """plain_modulus participates in the context cache key — a BGV context
    and a CKKS context over the same parameters must be distinct."""
    vec = bgv_vec
    a = keyswitch_tpu.get_context(
        1024, 2, 3, 3, 2, vec.moduli, tile_p=2, interpret=True,
    )
    b = keyswitch_tpu.get_context(
        1024, 2, 3, 3, 2, vec.moduli, tile_p=2, interpret=True,
        plain_modulus=T,
    )
    assert a is not b
    assert a.plain_modulus is None and b.plain_modulus == T
    a2 = keyswitch_tpu.get_context(
        1024, 2, 3, 3, 2, vec.moduli, tile_p=2, interpret=True,
    )
    assert a2 is a
