"""BFV scheme integration tests (integrations/bfv.py).

BFV is exact mod t like BGV: every assertion is equality, not a precision
bound.  Relinearization and rotation go through the plain (CKKS-style)
accelerated keyswitch — the reference's own BFV usage of
switch_key_inplace — while the tensor product runs as the textbook exact
host computation the RNS algorithms approximate."""

import numpy as np
import pytest

from hexl_fpga_tpu import api
from hexl_fpga_tpu.integrations import bfv
from hexl_fpga_tpu.ops import nt

N, T = 64, 257  # t prime, t ≡ 1 (mod 2n)


@pytest.fixture(scope="module")
def ctx():
    moduli = nt.generate_primes(4, 40, N)  # 3 decomp + special
    c = bfv.BfvContext(N, moduli, t=T, seed=4)
    api.acquire_FPGA_resources()
    yield c


def rand_msg(rng):
    return rng.integers(0, T, size=N, dtype=np.uint64)


def test_encrypt_decrypt(ctx):
    rng = np.random.default_rng(0)
    z = rand_msg(rng)
    np.testing.assert_array_equal(ctx.decrypt(ctx.encrypt(z)), z)


def test_add_sub_plain_ops(ctx):
    rng = np.random.default_rng(1)
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
    """Textbook t/Q-scaled tensor product + the accelerated relinearization
    keyswitch: EXACT slotwise product mod t."""
    rng = np.random.default_rng(2)
    z1, z2 = rand_msg(rng), rand_msg(rng)
    ct = ctx.multiply_relin(ctx.encrypt(z1), ctx.encrypt(z2))
    np.testing.assert_array_equal(
        ctx.decrypt(ct), z1.astype(object) * z2 % T
    )


def test_rotate_and_conjugate(ctx):
    rng = np.random.default_rng(3)
    z = rand_msg(rng)
    ct = ctx.encrypt(z)
    rows = z.reshape(2, -1)
    np.testing.assert_array_equal(
        ctx.decrypt(ctx.rotate(ct, 3)).reshape(2, -1),
        np.roll(rows, -3, axis=1),
    )
    np.testing.assert_array_equal(
        ctx.decrypt(ctx.conjugate(ct)).reshape(2, -1), rows[::-1]
    )


def test_mod_switch_preserves_message(ctx):
    """Divide-and-round drop of q_last: Delta m rides the MSB, no
    correction factor (scale stays 1.0, unlike BGV)."""
    rng = np.random.default_rng(4)
    z = rand_msg(rng)
    ct = ctx.mod_switch_to_next(ctx.encrypt(z))
    assert ct.scale == 1.0
    np.testing.assert_array_equal(ctx.decrypt(ct), z)


def test_rescale_rejected(ctx):
    ct = ctx.encrypt(rand_msg(np.random.default_rng(5)))
    with pytest.raises(TypeError, match="CKKS"):
        ctx.rescale(ct)


@pytest.mark.heavy
def test_depth2_circuit(ctx):
    """(z1*z2 mod-switched) * z3 + z4 — multiply at a reduced level, then a
    level-aligned add (no correction factors to juggle in BFV)."""
    rng = np.random.default_rng(6)
    z = [rand_msg(rng) for _ in range(4)]
    cts = [ctx.encrypt(v) for v in z]
    p = ctx.multiply_relin(cts[0], cts[1])
    p = ctx.mod_switch_to_next(p)
    p = ctx.multiply_relin(p, ctx.mod_switch_to_next(cts[2]))
    out = ctx.add(p, ctx.mod_switch_to_next(cts[3]))
    expect = (z[0].astype(object) * z[1] % T * z[2] % T + z[3]) % T
    np.testing.assert_array_equal(ctx.decrypt(out), expect)


@pytest.mark.heavy
def test_device_rotate_matches_host_bfv():
    """BFV rotations on the inherited device evaluator: the plain keyswitch
    contexts (no plain_modulus) are exactly the CKKS ones, so
    DeviceCkksEvaluator works as-is on BFV ciphertexts."""
    n = 1024
    moduli = nt.generate_primes(4, 45, n)
    ctx = bfv.BfvContext(n, moduli, t=65537, seed=8)
    api.acquire_FPGA_resources()
    from hexl_fpga_tpu.integrations import ckks

    dev = ckks.DeviceCkksEvaluator(ctx, interpret=True)
    rng = np.random.default_rng(9)
    z = rng.integers(0, 65537, size=n, dtype=np.uint64)
    ct = ctx.encrypt(z)
    got = ctx.decrypt(dev.to_host(dev.rotate(dev.stage(ct), 4)))
    np.testing.assert_array_equal(
        got.reshape(2, -1), np.roll(z.reshape(2, -1), -4, axis=1)
    )


def test_noise_budget_tracks_operations(ctx):
    """invariant_noise_budget analog: fresh >> after multiply, and the
    message stays exact while the budget is positive."""
    rng = np.random.default_rng(7)
    z1, z2 = rand_msg(rng), rand_msg(rng)
    ct1 = ctx.encrypt(z1)
    fresh = ctx.noise_budget(ct1)
    assert fresh > 20
    prod = ctx.multiply_relin(ct1, ctx.encrypt(z2))
    after = ctx.noise_budget(prod)
    assert 0 < after < fresh
    np.testing.assert_array_equal(
        ctx.decrypt(prod), z1.astype(object) * z2 % T
    )
