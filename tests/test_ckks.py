"""CKKS integration tests — the analog of the reference SEAL bridge's
end-to-end validation (`experimental/bridge-seal/tests/keyswitch-example.cpp`:
CKKS square with relinearization + rotation, precision-checked)."""

import numpy as np
import pytest

from hexl_fpga_tpu import api
from hexl_fpga_tpu.integrations import ckks
from hexl_fpga_tpu.ops import nt


@pytest.fixture(scope="module")
def ctx():
    # 46-bit primes with scale ~ q: post-rescale scale stays ~2^45, far above
    # the rescale noise (~||s||_1), the standard CKKS parameterization
    n = 1024
    moduli = nt.generate_primes(4, 45, n)  # 3 decomp + special
    c = ckks.CkksContext(n, moduli, scale=2.0**45, seed=1)
    api.acquire_FPGA_resources()
    yield c


def test_encode_decode_roundtrip(ctx):
    rng = np.random.default_rng(0)
    z = rng.normal(size=ctx.slots) + 1j * rng.normal(size=ctx.slots)
    m = ctx.encode(z)
    back = ctx.decode(m, ctx.scale)
    assert np.max(np.abs(back - z)) < 1e-5


def test_encrypt_decrypt(ctx):
    rng = np.random.default_rng(1)
    z = rng.normal(size=ctx.slots)
    ct = ctx.encrypt(z)
    back = ctx.decrypt(ct)
    assert np.max(np.abs(back - z)) < 1e-4


@pytest.mark.heavy
def test_square_relinearize_rescale(ctx):
    """Square + relinearize through DyadicMultiply + KeySwitch, then rescale —
    the bridge patch's exact code path for CKKS multiplication."""
    rng = np.random.default_rng(2)
    z = rng.uniform(0.5, 1.5, size=ctx.slots)
    ct = ctx.encrypt(z)
    ct2 = ctx.multiply_relin(ct, ct)
    ct2 = ctx.rescale(ct2)
    back = ctx.decrypt(ct2)
    rel_err = np.max(np.abs(back - z * z) / np.abs(z * z))
    assert rel_err < 1e-3, f"relative error {rel_err}"


def test_rotate(ctx):
    """Galois rotation + keyswitch: slots shift left by r."""
    rng = np.random.default_rng(3)
    z = rng.normal(size=ctx.slots)
    ct = ctx.encrypt(z)
    for r in (1, 5):
        rot = ctx.rotate(ct, r)
        back = ctx.decrypt(rot)
        want = np.roll(z, -r)
        assert np.max(np.abs(back - want)) < 1e-3, f"rotation by {r}"


def test_add_sub_plain_ops(ctx):
    rng = np.random.default_rng(5)
    z1 = rng.normal(size=ctx.slots)
    z2 = rng.normal(size=ctx.slots)
    ct1, ct2 = ctx.encrypt(z1), ctx.encrypt(z2)
    assert np.max(np.abs(ctx.decrypt(ctx.add(ct1, ct2)) - (z1 + z2))) < 1e-4
    assert np.max(np.abs(ctx.decrypt(ctx.sub(ct1, ct2)) - (z1 - z2))) < 1e-4
    assert np.max(np.abs(ctx.decrypt(ctx.add_plain(ct1, z2)) - (z1 + z2))) < 1e-4
    mp = ctx.rescale(ctx.multiply_plain(ct1, z2))
    rel = np.max(np.abs(ctx.decrypt(mp) - z1 * z2))
    assert rel < 1e-4


@pytest.mark.heavy
def test_depth2_circuit(ctx):
    """Depth-2 evaluation with rescaling at each level: z^2 * z — exercises
    level tracking, scale management, and keyswitching twice."""
    # |z| < 1 keeps the pre-rescale level-1 message (z^3 * scale^2 ~ 2^90)
    # under Q_1/2 (~2^90.4 with two 46-bit primes) — the standard CKKS
    # integer-budget constraint (SEAL uses a wider q_0 for extra headroom)
    rng = np.random.default_rng(9)
    z = rng.uniform(0.5, 0.9, size=ctx.slots)
    ct = ctx.encrypt(z)
    sq = ctx.rescale(ctx.multiply_relin(ct, ct))        # level L-2, scale ~2^45
    # bring ct to the same level by a plaintext-1 multiply + rescale
    ct_l1 = ctx.rescale(ctx.multiply_plain(ct, np.ones(ctx.slots)))
    assert ct_l1.level == sq.level
    cube = ctx.rescale(ctx.multiply_relin(sq, ct_l1))   # level L-3
    back = ctx.decrypt(cube)
    rel = np.max(np.abs(back - z ** 3) / np.abs(z ** 3))
    assert rel < 1e-3, f"depth-2 relative error {rel}"


def test_conjugate(ctx):
    rng = np.random.default_rng(6)
    z = rng.normal(size=ctx.slots) + 1j * rng.normal(size=ctx.slots)
    ct = ctx.encrypt(z)
    back = ctx.decrypt(ctx.conjugate(ct))
    assert np.max(np.abs(back - np.conj(z))) < 1e-3


@pytest.mark.heavy
def test_multiply_two_ciphertexts(ctx):
    rng = np.random.default_rng(4)
    z1 = rng.uniform(0.5, 1.5, size=ctx.slots)
    z2 = rng.uniform(0.5, 1.5, size=ctx.slots)
    ct = ctx.multiply_relin(ctx.encrypt(z1), ctx.encrypt(z2))
    ct = ctx.rescale(ct)
    back = ctx.decrypt(ct)
    rel_err = np.max(np.abs(back - z1 * z2) / np.abs(z1 * z2))
    assert rel_err < 1e-3


@pytest.fixture(scope="module")
def ev(ctx):
    # one evaluator for all device tests: its jitted stages are cached per
    # instance, so the suite compiles each pipeline once
    return ckks.DeviceCkksEvaluator(ctx, interpret=True)


def test_device_evaluator_rotate_matches_host(ctx, ev):
    """Device-resident rotation (NTT-domain permutation gather + fused-MXU
    keyswitch, no host round trip) must equal the host path's coefficient-
    domain automorphism + keyswitch bit-for-bit."""
    rng = np.random.default_rng(5)
    z = rng.standard_normal(ctx.slots) + 1j * rng.standard_normal(ctx.slots)
    ct = ctx.encrypt(z)
    h = ev.stage(ct)
    got = ev.to_host(ev.rotate(h, 3))
    want = ctx.rotate(ct, 3)
    np.testing.assert_array_equal(got.data, want.data)
    assert got.level == want.level and got.scale == want.scale


@pytest.mark.heavy
def test_device_evaluator_chain(ctx, ev):
    """rotate -> rotate -> add chain entirely on device, one final fetch;
    decrypts to the expected rotated slots."""
    rng = np.random.default_rng(6)
    z = rng.standard_normal(ctx.slots) + 1j * rng.standard_normal(ctx.slots)
    ct = ctx.encrypt(z)
    h = ev.stage(ct)
    h1 = ev.rotate(h, 1)
    h2 = ev.rotate(h1, 1)          # net rotation by 2 (key for r=1 reused)
    hs = ev.add(h2, h1)            # rot2(z) + rot1(z)
    back = ctx.decrypt(ev.to_host(hs))
    want = np.roll(z, -2) + np.roll(z, -1)
    assert np.max(np.abs(back - want)) < 1e-2


def test_ntt_galois_sigma_property():
    """NTT(tau_g m) == NTT(m)[sigma] for the derived permutation."""
    from hexl_fpga_tpu.ops import golden, nt as _nt, twiddles

    n = 64
    q = int(_nt.generate_primes(1, 30, n)[0])
    tabs = twiddles.ntt_tables(n, q)
    rng = np.random.default_rng(2)
    m = rng.integers(0, q, size=n, dtype=np.uint64)
    for g in (3, 5, 2 * n - 1):
        rot = ckks._negacyclic_automorphism([int(v) for v in m], g, n, q)
        lhs = golden.fwd_ntt(np.array(rot, dtype=np.uint64), q, tabs)
        rhs = golden.fwd_ntt(m, q, tabs)[ckks._ntt_galois_sigma(n, g)]
        np.testing.assert_array_equal(lhs, rhs)


@pytest.mark.heavy
def test_device_evaluator_multiply_relin_rescale_matches_host(ctx, ev):
    """Device multiply+relinearize and rescale must equal the host path
    bit-for-bit (same dyadic kernel math, same keyswitch, same exact RNS
    rescale)."""
    rng = np.random.default_rng(7)
    z1 = rng.standard_normal(ctx.slots) * 0.5
    z2 = rng.standard_normal(ctx.slots) * 0.5
    ct1, ct2 = ctx.encrypt(z1), ctx.encrypt(z2)
    got = ev.to_host(ev.multiply_relin(ev.stage(ct1), ev.stage(ct2)))
    want = ctx.multiply_relin(ct1, ct2)
    np.testing.assert_array_equal(got.data, want.data)
    assert got.scale == want.scale
    got_rs = ev.to_host(ev.rescale(ev.stage(want)))
    want_rs = ctx.rescale(want)
    np.testing.assert_array_equal(got_rs.data, want_rs.data)
    assert got_rs.level == want_rs.level


@pytest.mark.heavy
def test_device_evaluator_full_pipeline(ctx, ev):
    """encrypt -> (device: multiply_relin -> rescale -> rotate -> add) ->
    decrypt: the whole evaluation stays on the accelerator."""
    rng = np.random.default_rng(8)
    z1 = rng.standard_normal(ctx.slots) * 0.5
    z2 = rng.standard_normal(ctx.slots) * 0.5
    h1 = ev.stage(ctx.encrypt(z1))
    h2 = ev.stage(ctx.encrypt(z2))
    h = ev.rescale(ev.multiply_relin(h1, h2))   # z1*z2, one level down
    hr = ev.rotate(h, 1)
    hsum = ev.add(h, hr)                        # z1z2 + rot1(z1z2)
    back = ctx.decrypt(ev.to_host(hsum))
    want = z1 * z2 + np.roll(z1 * z2, -1)
    assert np.max(np.abs(back - want)) < 1e-2


@pytest.mark.heavy
def test_device_evaluator_plain_ops_match_host(ctx, ev):
    """Device add_plain / multiply_plain equal the host path bit-for-bit."""
    rng = np.random.default_rng(9)
    z = rng.standard_normal(ctx.slots) * 0.5
    p = rng.standard_normal(ctx.slots) * 0.5
    ct = ctx.encrypt(z)
    h = ev.stage(ct)
    got_add = ev.to_host(ev.add_plain(h, p))
    want_add = ctx.add_plain(ct, p)
    np.testing.assert_array_equal(got_add.data, want_add.data)
    got_mul = ev.to_host(ev.multiply_plain(h, p))
    want_mul = ctx.multiply_plain(ct, p)
    np.testing.assert_array_equal(got_mul.data, want_mul.data)
    assert got_mul.scale == want_mul.scale


@pytest.mark.heavy
def test_device_evaluator_hoisted_rotations(ctx, ev):
    """Hoisted rotations (decompose once, rotate many): each rotation from
    one hoisted decomposition decrypts to the rotated slots.  Hoisting
    automorphs the DECOMPOSED target by NTT-domain permutation — a valid
    gadget decomposition that is not bit-identical to rotate-then-decompose
    (the standard Halevi-Shoup trade), so correctness is checked at the
    plaintext level against the non-hoisted rotation."""
    rng = np.random.default_rng(10)
    z = rng.standard_normal(ctx.slots) + 1j * rng.standard_normal(ctx.slots)
    ct = ctx.encrypt(z)
    h = ev.stage(ct)
    outs = ev.rotate_many(h, [0, 1, 3])
    assert outs[0] is h                       # trivial step: no keyswitch
    for r, o in zip([0, 1, 3], outs):
        back = ctx.decrypt(ev.to_host(o))
        want = np.roll(z, -r)
        assert np.max(np.abs(back - want)) < 1e-2, f"rotation {r}"
        # hoisted noise stays in the same class as the plain rotation
        plain = ctx.decrypt(ev.to_host(ev.rotate(h, r))) if r else z
        assert np.max(np.abs(back - want)) < 10 * max(
            1e-4, np.max(np.abs(plain - want))
        )


@pytest.mark.heavy
def test_device_evaluator_hoisted_rotation_reduced_level(ctx, ev):
    """Hoisted rotation AFTER a rescale: the level drops (nl < K-1), so the
    compact hoisted decomposition (L+1 active planes, inactive moduli
    skipped) must still index the special engine correctly.  Exercises the
    K > L+1 plane layout that top-level tests never reach."""
    rng = np.random.default_rng(14)
    z = rng.standard_normal(ctx.slots) * 0.5
    p = rng.uniform(0.5, 1.5, size=ctx.slots)
    h = ev.rescale(ev.multiply_plain(ev.stage(ctx.encrypt(z)), p))
    assert h.level + 1 < ctx.K - 1  # genuinely reduced: inactive moduli exist
    outs = ev.rotate_many(h, [1, 3])
    for r, o in zip([1, 3], outs):
        back = ctx.decrypt(ev.to_host(o))
        want = np.roll(z * p, -r)
        assert np.max(np.abs(back - want)) < 1e-2, f"rotation {r}"


@pytest.mark.heavy
def test_device_evaluator_rotate_many_fused_matches_unfused(ctx, ev):
    """The fused scan (one dispatch for all steps) computes exactly the
    same integers as per-step rotate_hoisted dispatches."""
    rng = np.random.default_rng(13)
    z = rng.standard_normal(ctx.slots) + 1j * rng.standard_normal(ctx.slots)
    h = ev.stage(ctx.encrypt(z))
    unfused = ev.rotate_many(h, [1, 3], fused=False)
    fused = ev.rotate_many(h, [1, 3], fused=True)
    for a, b in zip(unfused, fused):
        np.testing.assert_array_equal(np.asarray(a.data32),
                                      np.asarray(b.data32))


@pytest.mark.heavy
def test_device_evaluator_rotate_many_chunked_matches_unfused(
        ctx, ev, monkeypatch):
    """HEXL_TPU_ROT_MANY_MAX_MB=0 forces chunk=1 (the key-stack memory
    bound): the chunked fused scans must still equal the per-step path
    bit-for-bit, and every requested step must come back."""
    monkeypatch.setenv("HEXL_TPU_ROT_MANY_MAX_MB", "0")
    rng = np.random.default_rng(17)
    z = rng.standard_normal(ctx.slots) + 1j * rng.standard_normal(ctx.slots)
    h = ev.stage(ctx.encrypt(z))
    unfused = ev.rotate_many(h, [1, 2, 3], fused=False)
    fused = ev.rotate_many(h, [1, 2, 3], fused=True)
    for a, b in zip(unfused, fused):
        np.testing.assert_array_equal(np.asarray(a.data32),
                                      np.asarray(b.data32))


@pytest.mark.heavy
def test_mod_switch_to_next_host_and_device(ctx, ev):
    """Dropping the last modulus without rescale: same decryption (scale
    unchanged), level aligned for subsequent ops; device path matches the
    host path bit-for-bit."""
    rng = np.random.default_rng(21)
    z = rng.standard_normal(ctx.slots) * 0.5
    ct = ctx.encrypt(z)
    sw = ctx.mod_switch_to_next(ct)
    assert sw.level == ct.level - 1 and sw.scale == ct.scale
    assert np.max(np.abs(ctx.decrypt(sw) - z)) < 1e-2
    h = ev.mod_switch_to_next(ev.stage(ct))
    np.testing.assert_array_equal(
        np.asarray(ev.to_host(h).data), sw.data
    )
    # level alignment: a fresh ciphertext mod-switched down can be added
    # to one at the lower level with a matching scale
    z2 = rng.standard_normal(ctx.slots) * 0.5
    other = ctx.mod_switch_to_next(ctx.encrypt(z2))
    both = ctx.add(sw, other)
    assert np.max(np.abs(ctx.decrypt(both) - (z + z2))) < 1e-2


@pytest.mark.heavy
def test_device_evaluator_conjugate_hoisted(ctx, ev):
    rng = np.random.default_rng(11)
    z = rng.standard_normal(ctx.slots) + 1j * rng.standard_normal(ctx.slots)
    h = ev.stage(ctx.encrypt(z))
    back = ctx.decrypt(ev.to_host(ev.conjugate_hoisted(ev.hoist(h))))
    assert np.max(np.abs(back - np.conj(z))) < 1e-2


@pytest.mark.heavy
def test_device_evaluator_linear_transform(ctx, ev):
    """BSGS diagonal-method matrix-vector product on device (hoisted baby
    rotations + giant-step keyswitches) decrypts to sum_d u_d * rot_d(z)."""
    rng = np.random.default_rng(12)
    z = rng.standard_normal(ctx.slots) * 0.5 + 1j * rng.standard_normal(
        ctx.slots) * 0.5
    diags = {
        d: rng.standard_normal(ctx.slots) * 0.5 for d in (0, 1, 5, 17)
    }
    want = sum(diags[d] * np.roll(z, -d) for d in diags)
    h = ev.stage(ctx.encrypt(z))
    out = ev.linear_transform(h, diags, bsgs_n1=4)
    assert abs(out.scale - ctx.scale * ctx.scale) < 1e-3 * out.scale
    back = ctx.decrypt(ev.to_host(out))
    assert np.max(np.abs(back - want)) < 1e-2


def test_device_evaluator_linear_transform_fused_bitexact(ctx, ev):
    """linear_transform_fused (the whole BSGS matvec as ONE compiled
    program) is BIT-identical to the unfused composition — same hoisted
    babies, same multiply/add order, same giant-step keyswitches — and
    decrypts to the matvec."""
    rng = np.random.default_rng(13)
    z = rng.standard_normal(ctx.slots) * 0.5
    diags = {
        d: rng.standard_normal(ctx.slots) * 0.5 for d in (0, 1, 2, 5, 17)
    }
    want = sum(diags[d] * np.roll(z, -d) for d in diags)
    h = ev.stage(ctx.encrypt(z))
    ref = ev.linear_transform(h, diags, bsgs_n1=4)
    out = ev.linear_transform_fused(h, diags, bsgs_n1=4)
    assert out.level == ref.level
    assert abs(out.scale - ref.scale) < 1e-3 * ref.scale
    np.testing.assert_array_equal(
        np.asarray(out.data32), np.asarray(ref.data32)
    )
    back = ctx.decrypt(ev.to_host(out))
    assert np.max(np.abs(back - want)) < 1e-2


def test_device_evaluator_linear_transform_fused_no_giant(ctx, ev):
    """Degenerate BSGS shapes: all diagonals in group 0 (no giant step),
    and a single trivial diagonal {0} (no rotation at all)."""
    rng = np.random.default_rng(14)
    z = rng.standard_normal(ctx.slots) * 0.5
    diags = {d: rng.standard_normal(ctx.slots) * 0.5 for d in (0, 1, 3)}
    want = sum(diags[d] * np.roll(z, -d) for d in diags)
    h = ev.stage(ctx.encrypt(z))
    out = ev.linear_transform_fused(h, diags, bsgs_n1=8)
    back = ctx.decrypt(ev.to_host(out))
    assert np.max(np.abs(back - want)) < 1e-2

    only0 = {0: rng.standard_normal(ctx.slots) * 0.5}
    out0 = ev.linear_transform_fused(h, only0, bsgs_n1=1)
    back0 = ctx.decrypt(ev.to_host(out0))
    assert np.max(np.abs(back0 - only0[0] * z)) < 1e-2
