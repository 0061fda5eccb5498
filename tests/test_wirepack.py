"""52-bit wire-pack codec: exact roundtrip, numpy/jnp agreement."""

import numpy as np

from hexl_fpga_tpu.ops import wirepack, word64 as w


def test_pack_roundtrip_np():
    rng = np.random.default_rng(0)
    a = rng.integers(0, 1 << 52, size=(3, 2, 128), dtype=np.uint64)
    a[0, 0, 0] = (1 << 52) - 1  # all payload bits set
    a[0, 0, 1] = 0
    x32 = w.to_interleaved_np(a)
    p = wirepack.pack_np(x32)
    assert p.shape[-1] == x32.shape[-1] * 13 // 16
    back = wirepack.unpack_np(p)
    np.testing.assert_array_equal(back, x32)
    np.testing.assert_array_equal(w.from_interleaved_np(back), a)


def test_pack_jnp_matches_np():
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    a = rng.integers(0, 1 << 52, size=(2, 256), dtype=np.uint64)
    x32 = w.to_interleaved_np(a)
    p_np = wirepack.pack_np(x32)
    p_j = np.asarray(wirepack.pack_jnp(jnp.asarray(x32)))
    np.testing.assert_array_equal(p_j, p_np)
    u_j = np.asarray(wirepack.unpack_jnp(jnp.asarray(p_np)))
    np.testing.assert_array_equal(u_j, x32)


def test_cross_direction_inverse():
    # host pack -> device unpack and device pack -> host unpack
    import jax.numpy as jnp

    rng = np.random.default_rng(2)
    a = rng.integers(0, 1 << 52, size=(4, 512), dtype=np.uint64)
    x32 = w.to_interleaved_np(a)
    d = np.asarray(wirepack.unpack_jnp(jnp.asarray(wirepack.pack_np(x32))))
    np.testing.assert_array_equal(d, x32)
    h = wirepack.unpack_np(np.asarray(wirepack.pack_jnp(jnp.asarray(x32))))
    np.testing.assert_array_equal(h, x32)
