"""BGV scheme integration tests (integrations/bgv.py).

BGV is exact: every assertion is equality mod t, not a precision bound —
the strongest possible end-to-end check that the GHS-corrected keyswitch
tail and modulus switching preserve the message.  The host tier runs at
n=64 (golden keyswitch, pure host arithmetic); the device tier reuses the
n=1024 fused Pallas kernels in interpreter mode like the CKKS tests."""

import numpy as np
import pytest

from hexl_fpga_tpu import api
from hexl_fpga_tpu.integrations import bgv, ckks
from hexl_fpga_tpu.ops import nt

N, T = 64, 257  # t prime, t ≡ 1 (mod 2n)


@pytest.fixture(scope="module")
def ctx():
    moduli = nt.generate_primes(4, 40, N)  # 3 decomp + special
    c = bgv.BgvContext(N, moduli, t=T, seed=3)
    api.acquire_FPGA_resources()
    yield c


def rand_msg(rng):
    return rng.integers(0, T, size=N, dtype=np.uint64)


def test_encode_decode_roundtrip(ctx):
    rng = np.random.default_rng(0)
    z = rand_msg(rng)
    m = ctx.encode(z)
    assert all(-T // 2 <= v <= T // 2 for v in m)  # centered lift
    np.testing.assert_array_equal(ctx.decode(m, 1.0), z)


def test_encode_is_slotwise(ctx):
    """Negacyclic poly product == slotwise product mod t (the batching
    homomorphism, SEAL BatchEncoder semantics)."""
    rng = np.random.default_rng(1)
    z1, z2 = rand_msg(rng), rand_msg(rng)
    m1, m2 = ctx.encode(z1), ctx.encode(z2)
    prod = bgv.ckks.vectors._negacyclic_mul(
        [v % T for v in m1], [v % T for v in m2], T
    )
    np.testing.assert_array_equal(
        ctx.decode(prod, 1.0), z1.astype(object) * z2 % T
    )


def test_encrypt_decrypt(ctx):
    rng = np.random.default_rng(2)
    z = rand_msg(rng)
    np.testing.assert_array_equal(ctx.decrypt(ctx.encrypt(z)), z)


def test_add_sub_plain_ops(ctx):
    rng = np.random.default_rng(3)
    z1, z2 = rand_msg(rng), rand_msg(rng)
    ct1, ct2 = ctx.encrypt(z1), ctx.encrypt(z2)
    np.testing.assert_array_equal(
        ctx.decrypt(ctx.add(ct1, ct2)), (z1 + z2) % T
    )
    np.testing.assert_array_equal(
        ctx.decrypt(ctx.sub(ct1, ct2)), (z1.astype(object) - z2) % T
    )
    np.testing.assert_array_equal(
        ctx.decrypt(ctx.add_plain(ct1, z2)), (z1 + z2) % T
    )
    np.testing.assert_array_equal(
        ctx.decrypt(ctx.multiply_plain(ct1, z2)),
        z1.astype(object) * z2 % T,
    )


def test_multiply_relinearize_exact(ctx):
    """ct x ct through api.DyadicMultiply + the BGV keyswitch: EXACT
    slotwise product (CKKS can only bound the error; BGV must equal)."""
    rng = np.random.default_rng(4)
    z1, z2 = rand_msg(rng), rand_msg(rng)
    ct = ctx.multiply_relin(ctx.encrypt(z1), ctx.encrypt(z2))
    np.testing.assert_array_equal(
        ctx.decrypt(ct), z1.astype(object) * z2 % T
    )


def test_rotate_and_conjugate(ctx):
    rng = np.random.default_rng(5)
    z = rand_msg(rng)
    ct = ctx.encrypt(z)
    half = N // 2
    rows = z.reshape(2, half)
    got = ctx.decrypt(ctx.rotate(ct, 3)).reshape(2, half)
    np.testing.assert_array_equal(got, np.roll(rows, -3, axis=1))
    got = ctx.decrypt(ctx.conjugate(ct)).reshape(2, half)
    np.testing.assert_array_equal(got, rows[::-1])  # row swap


def test_mod_switch_exact_with_correction_factor(ctx):
    """GHS mod-switch: message preserved EXACTLY; the q_last^{-1} factor
    is tracked in the correction factor, not lost."""
    rng = np.random.default_rng(6)
    z = rand_msg(rng)
    ct = ctx.encrypt(z)
    ct2 = ctx.mod_switch_to_next(ct)
    assert ct2.level == ct.level - 1
    assert int(ct2.scale) == nt.inverse_mod(
        ctx.moduli[ct.level] % T, T
    )
    np.testing.assert_array_equal(ctx.decrypt(ct2), z)


def test_rescale_rejected(ctx):
    ct = ctx.encrypt(rand_msg(np.random.default_rng(7)))
    with pytest.raises(TypeError, match="CKKS"):
        ctx.rescale(ct)


@pytest.mark.heavy
def test_depth2_circuit(ctx):
    """(z1*z2 switched) * z3 + z4 — multiply at a REDUCED level exercises
    correction-factor composition through multiply_relin."""
    rng = np.random.default_rng(8)
    z = [rand_msg(rng) for _ in range(4)]
    cts = [ctx.encrypt(v) for v in z]
    p = ctx.multiply_relin(cts[0], cts[1])
    p = ctx.mod_switch_to_next(p)
    q3 = ctx.mod_switch_to_next(cts[2])
    q4 = ctx.mod_switch_to_next(cts[3])
    p = ctx.multiply_relin(p, q3)
    # align cf before add: scale q4's plaintext is cf=1-switched; adjust by
    # multiplying q4 with the plain constant cf_p * cf_q4^{-1}
    cf_p, cf_q4 = int(p.scale) % T, int(q4.scale) % T
    adj = (cf_p * nt.inverse_mod(cf_q4, T)) % T
    q4 = ctx.multiply_plain(q4, np.full(N, adj, dtype=np.uint64))
    q4.scale = p.scale  # cf_q4 * adj == cf_p: the handles now agree
    out = ctx.add(p, q4)
    expect = (
        z[0].astype(object) * z[1] % T * z[2] % T + z[3]
    ) % T
    np.testing.assert_array_equal(ctx.decrypt(out), expect)


# -- device tier (n=1024 fused kernels, interpreter mode) --------------------


@pytest.fixture(scope="module")
def dctx():
    n = 1024
    moduli = nt.generate_primes(4, 45, n)
    c = bgv.BgvContext(n, moduli, t=65537, seed=9)
    api.acquire_FPGA_resources()
    yield c


@pytest.fixture(scope="module")
def dev(dctx):
    return bgv.DeviceBgvEvaluator(dctx, interpret=True)


@pytest.mark.heavy
def test_device_rotate_matches_host(dctx, dev):
    rng = np.random.default_rng(10)
    z = rng.integers(0, 65537, size=dctx.n, dtype=np.uint64)
    ct = dctx.encrypt(z)
    host = dctx.decrypt(dctx.rotate(ct, 5))
    got = dctx.decrypt(dev.to_host(dev.rotate(dev.stage(ct), 5)))
    np.testing.assert_array_equal(got, host)
    np.testing.assert_array_equal(
        got.reshape(2, -1),
        np.roll(z.reshape(2, -1), -5, axis=1),
    )


@pytest.mark.heavy
def test_device_multiply_relin_and_mod_switch(dctx, dev):
    rng = np.random.default_rng(11)
    t = dctx.t
    z1 = rng.integers(0, t, size=dctx.n, dtype=np.uint64)
    z2 = rng.integers(0, t, size=dctx.n, dtype=np.uint64)
    h = dev.multiply_relin(dev.stage(dctx.encrypt(z1)),
                           dev.stage(dctx.encrypt(z2)))
    h = dev.mod_switch_to_next(h)
    np.testing.assert_array_equal(
        dctx.decrypt(dev.to_host(h)), z1.astype(object) * z2 % t
    )
    with pytest.raises(TypeError, match="CKKS"):
        dev.rescale(h)


# -- public API (api.KeySwitch plain_modulus extension) -----------------------


@pytest.fixture()
def api_vec():
    from hexl_fpga_tpu.utils import vectors

    return vectors.make_keyswitch_vector(
        1024, 2, 3, seed=17, modulus_bits=45, plain_modulus=65537,
    )


def test_api_keyswitch_bgv_golden_executor(api_vec, monkeypatch):
    """RUN_CHOICE=0: the public async API routes plain_modulus to the
    golden executor and returns the BGV-corrected result."""
    from hexl_fpga_tpu import config as config_mod

    vec = api_vec
    api.release_FPGA_resources()
    monkeypatch.setenv("RUN_CHOICE", "0")
    config_mod.reset_config()
    api.acquire_FPGA_resources()
    try:
        res = vec.input.copy()
        api.set_worksize_KeySwitch(1)
        api.KeySwitch(
            res, vec.t_target_iter_ptr, 1024, 2, 3, 3, 2, vec.moduli,
            vec.key_vectors, vec.modswitch_factors, vec.twiddle_factors,
            plain_modulus=65537,
        )
        assert api.KeySwitchCompleted()
        np.testing.assert_array_equal(res.ravel(), vec.expected_output.ravel())
    finally:
        api.release_FPGA_resources()
        monkeypatch.delenv("RUN_CHOICE")
        config_mod.reset_config()


@pytest.mark.heavy
def test_api_keyswitch_bgv_emulation_executor(api_vec, monkeypatch):
    """RUN_CHOICE=1: the XLA fallback (keyswitch_jax) applies the same GHS
    correction — bit-exact vs the golden BGV expected output."""
    from hexl_fpga_tpu import config as config_mod

    vec = api_vec
    api.release_FPGA_resources()
    monkeypatch.setenv("RUN_CHOICE", "1")
    config_mod.reset_config()
    api.acquire_FPGA_resources()
    try:
        res = vec.input.copy()
        api.set_worksize_KeySwitch(1)
        api.KeySwitch(
            res, vec.t_target_iter_ptr, 1024, 2, 3, 3, 2, vec.moduli,
            vec.key_vectors, vec.modswitch_factors, vec.twiddle_factors,
            plain_modulus=65537,
        )
        assert api.KeySwitchCompleted()
        np.testing.assert_array_equal(res.ravel(), vec.expected_output.ravel())
    finally:
        api.release_FPGA_resources()
        monkeypatch.delenv("RUN_CHOICE")
        config_mod.reset_config()


def test_api_keyswitch_rejects_non_coprime_plain_modulus(api_vec):
    vec = api_vec
    api.acquire_FPGA_resources()
    res = vec.input.copy()
    api.set_worksize_KeySwitch(1)
    with pytest.raises(Exception, match="coprime"):
        api.KeySwitch(
            res, vec.t_target_iter_ptr, 1024, 2, 3, 3, 2, vec.moduli,
            vec.key_vectors, vec.modswitch_factors, vec.twiddle_factors,
            plain_modulus=int(vec.moduli[0]),
        )


@pytest.mark.heavy
def test_device_hoisted_rotations_bgv(dctx, dev):
    """Hoisted BGV rotations (decompose once, apply many): the hoisted
    apply's tail also folds the GHS digit, so every rotated ciphertext
    decrypts EXACTLY (the hoisted gadget differs from rotate-then-keyswitch
    by design, but the message mod t must be identical)."""
    rng = np.random.default_rng(12)
    t = dctx.t
    z = rng.integers(0, t, size=dctx.n, dtype=np.uint64)
    h = dev.stage(dctx.encrypt(z))
    outs = dev.rotate_many(h, [0, 1, 7])
    for r, o in zip([0, 1, 7], outs):
        np.testing.assert_array_equal(
            dctx.decrypt(dev.to_host(o)).reshape(2, -1),
            np.roll(z.reshape(2, -1), -r, axis=1),
        )


def test_noise_budget_tracks_operations(ctx):
    rng = np.random.default_rng(13)
    z1, z2 = rand_msg(rng), rand_msg(rng)
    ct1 = ctx.encrypt(z1)
    fresh = ctx.noise_budget(ct1)
    assert fresh > 20
    prod = ctx.multiply_relin(ct1, ctx.encrypt(z2))
    after = ctx.noise_budget(prod)
    assert 0 < after < fresh
