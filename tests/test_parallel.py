"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from hexl_fpga_tpu.ops import golden, nt, word64 as w
from hexl_fpga_tpu.parallel import sharded
from hexl_fpga_tpu.utils import vectors


@pytest.fixture(scope="module")
def devices():
    devs = jax.devices()
    assert len(devs) >= 8, "conftest must provide 8 virtual CPU devices"
    return devs


def test_batch_sharded_fwd_ntt(devices):
    n, q = 1024, nt.generate_primes(1, 45, 1024)[0]
    mesh = Mesh(np.array(devices[:8]), ("dp",))
    fn = sharded.batch_sharded_fwd_ntt(mesh, "dp", n, q)
    rng = np.random.default_rng(0)
    a = rng.integers(0, q, size=(16, n), dtype=np.uint64)
    lo, hi = w.to_pair_np(a)
    olo, ohi = fn(jnp.asarray(lo), jnp.asarray(hi))
    out = w.from_pair_np(np.asarray(olo), np.asarray(ohi))
    np.testing.assert_array_equal(out, golden.fwd_ntt(a, q))


@pytest.mark.parametrize(
    "n_shards",
    [2, pytest.param(4, marks=pytest.mark.heavy),
     pytest.param(8, marks=pytest.mark.heavy)],
)
def test_dist_fwd_ntt(devices, n_shards):
    """Coefficient-sharded (sequence-parallel) NTT: bit-exact vs golden."""
    n, q = 2048, nt.generate_primes(1, 45, 2048)[0]
    mesh = Mesh(np.array(devices[:n_shards]), ("sp",))
    fn = sharded.dist_fwd_ntt(mesh, "sp", n, q)
    rng = np.random.default_rng(n_shards)
    a = rng.integers(0, q, size=(4, n), dtype=np.uint64)
    lo, hi = w.to_pair_np(a)
    olo, ohi = fn(jnp.asarray(lo), jnp.asarray(hi))
    out = w.from_pair_np(np.asarray(olo), np.asarray(ohi))
    np.testing.assert_array_equal(out, golden.fwd_ntt(a, q))


@pytest.mark.parametrize(
    "n_shards",
    [2, pytest.param(4, marks=pytest.mark.heavy),
     pytest.param(8, marks=pytest.mark.heavy)],
)
def test_dist_inv_ntt(devices, n_shards):
    """Coefficient-sharded inverse NTT: roundtrip + bit-exact vs golden."""
    n, q = 2048, nt.generate_primes(1, 45, 2048)[0]
    mesh = Mesh(np.array(devices[:n_shards]), ("sp",))
    fn = sharded.dist_inv_ntt(mesh, "sp", n, q)
    rng = np.random.default_rng(100 + n_shards)
    a = rng.integers(0, q, size=(4, n), dtype=np.uint64)
    y = golden.fwd_ntt(a, q)
    lo, hi = w.to_pair_np(y)
    olo, ohi = fn(jnp.asarray(lo), jnp.asarray(hi))
    out = w.from_pair_np(np.asarray(olo), np.asarray(ohi))
    np.testing.assert_array_equal(out, a)
    np.testing.assert_array_equal(out, golden.inv_ntt(y, q))


@pytest.mark.parametrize("n_shards", [2, pytest.param(8, marks=pytest.mark.heavy)])
@pytest.mark.parametrize("chunks", [1, 4])
def test_dist_fwd_ntt_mxu(devices, n_shards, chunks):
    """MXU-tier coefficient-sharded NTT (four-step + per-chunk
    reduce_scatters of the exact 16-bit partial planes): bit-exact vs
    golden for any batch chunking (chunks only partition the batch; the
    chunked form exists so collectives overlap the next chunk's
    matmuls)."""
    n, q = 1024, int(nt.generate_primes(1, 51, 1024)[0])
    mesh = Mesh(np.array(devices[:n_shards]), ("sp",))
    fn = sharded.dist_fwd_ntt_mxu(mesh, "sp", n, q, chunks=chunks)
    rng = np.random.default_rng(10 + n_shards)
    a = rng.integers(0, q, size=(3, n), dtype=np.uint64)
    lo, hi = w.to_pair_np(a)
    olo, ohi = fn(jnp.asarray(lo), jnp.asarray(hi))
    out = w.from_pair_np(np.asarray(olo), np.asarray(ohi))
    np.testing.assert_array_equal(out, golden.fwd_ntt(a, q))


@pytest.mark.parametrize("n_shards", [2, pytest.param(8, marks=pytest.mark.heavy)])
def test_dist_inv_ntt_mxu_roundtrip(devices, n_shards):
    """MXU-tier coefficient-sharded INVERSE NTT: bit-exact vs golden, and
    the fwd o inv round trip chains WITHOUT resharding (the inverse's
    output placement equals the forward's input placement)."""
    n, q = 1024, int(nt.generate_primes(1, 51, 1024)[0])
    mesh = Mesh(np.array(devices[:n_shards]), ("sp",))
    fwd = sharded.dist_fwd_ntt_mxu(mesh, "sp", n, q)
    inv = sharded.dist_inv_ntt_mxu(mesh, "sp", n, q)
    rng = np.random.default_rng(20 + n_shards)
    a = rng.integers(0, q, size=(3, n), dtype=np.uint64)
    y = golden.fwd_ntt(a, q)
    # inverse alone vs golden
    lo, hi = w.to_pair_np(y)
    olo, ohi = inv(jnp.asarray(lo), jnp.asarray(hi))
    out = w.from_pair_np(np.asarray(olo), np.asarray(ohi))
    np.testing.assert_array_equal(out, a)
    # chained INTT -> NTT on device arrays, no host round trip / reshard
    olo2, ohi2 = fwd(olo, ohi)
    out2 = w.from_pair_np(np.asarray(olo2), np.asarray(ohi2))
    np.testing.assert_array_equal(out2, y)


@pytest.mark.heavy
def test_limb_sharded_keyswitch_mxu_engines(devices):
    """ShardedKeySwitch with the fused-MXU Pallas engine transforms (the
    single-chip production kernels composed with collectives)."""
    n, L, K = 1024, 2, 3
    vec = vectors.make_keyswitch_vector(n, L, K, seed=7, modulus_bits=45)
    mesh = Mesh(np.array(devices[:2]), ("mp",))
    ks = sharded.ShardedKeySwitch(
        mesh, "mp", None, n, L, K, vec.moduli, engine_impl="mxu", tile_p=2
    )
    B = 2
    ts = np.stack([vec.t_target_iter_ptr] * B)
    rs = np.stack([vec.input] * B)
    got = ks.run(rs, ts, vec.key_vectors, vec.modswitch_factors)
    for b in range(B):
        np.testing.assert_array_equal(got[b], vec.expected_output)


@pytest.mark.parametrize(
    "mp,dp", [(2, 1), pytest.param(4, 2, marks=pytest.mark.heavy)]
)
def test_limb_sharded_keyswitch(devices, mp, dp):
    n, L, K = 64, 3, 4
    vec = vectors.make_keyswitch_vector(n, L, K, seed=7, modulus_bits=40)
    mesh = Mesh(
        np.array(devices[: mp * dp]).reshape(dp, mp), ("dp", "mp")
    )
    ks = sharded.ShardedKeySwitch(
        mesh, "mp", "dp" if dp > 1 else None, n, L, K, vec.moduli
    )
    B = 2 * dp
    rng = np.random.default_rng(1)
    ts = np.stack([vec.t_target_iter_ptr for _ in range(B)])
    rs = np.stack(
        [
            np.concatenate(
                [
                    rng.integers(0, vec.moduli[i % L], size=n, dtype=np.uint64)
                    for i in range(2 * L)
                ]
            )
            for _ in range(B)
        ]
    )
    got = ks.run(rs, ts, vec.key_vectors, vec.modswitch_factors)
    for b in range(B):
        want = golden.keyswitch(
            rs[b], ts[b], n, L, K, L + 1, 2,
            vec.moduli, vec.key_vectors, vec.modswitch_factors, None,
        )
        np.testing.assert_array_equal(got[b], want)


def test_sharded_keyswitch_comm_report_and_key_cache(devices):
    """The sharded path's collective accounting and its upload-once key
    cache (engine-sliced stores: no full-tensor psum)."""
    n, L, K = 64, 3, 4
    from hexl_fpga_tpu.utils import vectors as V

    vec = V.make_keyswitch_vector(n, L, K, seed=3, modulus_bits=40)
    mesh = Mesh(np.array(devices[:2]), ("mp",))
    ks = sharded.ShardedKeySwitch(mesh, "mp", None, n, L, K, vec.moduli)
    rep = ks.comm_report(batch=4)
    plane = 4 * 2 * n * 4 * 2
    assert rep["full_tensor_psum_bytes"] == 0
    assert rep["e_broadcast_psum_bytes"] == plane
    assert rep["output_slice_gather_bytes"] == L * plane
    rs = np.zeros((2, 2 * L * n), dtype=np.uint64)
    ts = np.stack([vec.t_target_iter_ptr] * 2)
    got = ks.run(rs, ts, vec.key_vectors, vec.modswitch_factors)
    want = golden.keyswitch(
        rs[0], ts[0], n, L, K, L + 1, 2, vec.moduli, vec.key_vectors,
        vec.modswitch_factors, None,
    )
    np.testing.assert_array_equal(got[0], want)
    # second run with the same key objects: cache hit (same staged arrays)
    k1 = ks._staged_keys(vec.key_vectors)
    k2 = ks._staged_keys(vec.key_vectors)
    assert k1[0] is k2[0] and k1[1] is k2[1]


def test_limb_sharded_keyswitch_bgv(devices):
    """ShardedKeySwitch plain_modulus: the GHS digit is computed from the
    broadcast special-engine value (no extra collectives) and every shard's
    decomp tail matches the golden BGV model bit-exactly."""
    n, L, K, t = 64, 3, 4, 257
    vec = vectors.make_keyswitch_vector(
        n, L, K, seed=7, modulus_bits=40, plain_modulus=t
    )
    mesh = Mesh(np.array(devices[:2]), ("mp",))
    ks = sharded.ShardedKeySwitch(
        mesh, "mp", None, n, L, K, vec.moduli, plain_modulus=t
    )
    B = 2
    ts = np.stack([vec.t_target_iter_ptr] * B)
    rs = np.stack([vec.input] * B)
    got = ks.run(rs, ts, vec.key_vectors, vec.modswitch_factors)
    for b in range(B):
        np.testing.assert_array_equal(got[b], vec.expected_output)


@pytest.mark.heavy
def test_limb_sharded_keyswitch_bgv_mxu_engines(devices):
    """BGV sharded keyswitch on the fused-MXU production tail (the GHS digit
    folded into e rides the data_bits=54 wide-input tail kernel)."""
    n, L, K, t = 1024, 2, 3, 257
    vec = vectors.make_keyswitch_vector(
        n, L, K, seed=5, modulus_bits=45, plain_modulus=t
    )
    mesh = Mesh(np.array(devices[:2]), ("mp",))
    ks = sharded.ShardedKeySwitch(
        mesh, "mp", None, n, L, K, vec.moduli, engine_impl="mxu",
        tile_p=2, plain_modulus=t,
    )
    B = 2
    ts = np.stack([vec.t_target_iter_ptr] * B)
    rs = np.stack([vec.input] * B)
    got = ks.run(rs, ts, vec.key_vectors, vec.modswitch_factors)
    for b in range(B):
        np.testing.assert_array_equal(got[b], vec.expected_output)


def test_sharded_hoisted_keyswitch(devices):
    """Sharded hoisting (decompose once over 'mp', apply many): the plain
    apply is bit-exact vs the recorded vector, and the deferred-automorphism
    rotation equals {full run with sigma^{-1}-permuted keys} permuted by
    sigma — the same identity the single-chip run_hoisted ships."""
    from hexl_fpga_tpu.ops import galois_mxu

    n, L, K = 64, 3, 4
    vec = vectors.make_keyswitch_vector(n, L, K, seed=7, modulus_bits=40)
    mesh = Mesh(np.array(devices[:2]), ("mp",))
    ks = sharded.ShardedKeySwitch(mesh, "mp", None, n, L, K, vec.moduli)
    B = 2
    ts = np.stack([vec.t_target_iter_ptr] * B)
    rs = np.stack([vec.input] * B)
    dec = ks.hoist(ts)
    got = ks.run_hoisted(dec, rs, vec.key_vectors, vec.modswitch_factors)
    for b in range(B):
        np.testing.assert_array_equal(got[b], vec.expected_output)
    # rotation: out == sigma(run(rs, ts, sigma^{-1}-permuted keys))
    g = pow(5, 3, 2 * n)
    sigma = galois_mxu.ntt_galois_sigma(n, g)
    inv = np.empty_like(sigma)
    inv[sigma] = np.arange(n)
    keys_perm = [
        np.ascontiguousarray(
            np.asarray(kv, np.uint64).reshape(2, K, n)[..., inv]
        ).reshape(-1)
        for kv in vec.key_vectors
    ]
    full = ks.run(rs, ts, keys_perm, vec.modswitch_factors)
    want = full.reshape(B, 2, L, n)[..., sigma].reshape(B, -1)
    got_g = ks.run_hoisted(
        dec, rs, vec.key_vectors, vec.modswitch_factors, galois=g
    )
    np.testing.assert_array_equal(got_g, want)


@pytest.mark.heavy
def test_sharded_hoisted_keyswitch_mxu(devices):
    """Sharded hoisting on the fused-MXU production kernels, cross-validated
    bit-exact against the SINGLE-CHIP run_hoisted (the dryrun stage's
    check, in miniature)."""
    from hexl_fpga_tpu.ops import keyswitch_tpu

    n, L, K = 1024, 2, 3
    vec = vectors.make_keyswitch_vector(n, L, K, seed=7, modulus_bits=45)
    mesh = Mesh(np.array(devices[:2]), ("mp",))
    ks = sharded.ShardedKeySwitch(
        mesh, "mp", None, n, L, K, vec.moduli, engine_impl="mxu", tile_p=2
    )
    B = 2
    ts = np.stack([vec.t_target_iter_ptr] * B)
    rs = np.stack([vec.input] * B)
    g = pow(5, 5, 2 * n)
    dec = ks.hoist(ts)
    got = ks.run_hoisted(
        dec, rs, vec.key_vectors, vec.modswitch_factors, galois=g
    )
    ctx = keyswitch_tpu.get_context(
        n, L, K, L + 1, 2, vec.moduli, vec.twiddle_factors,
        tile_p=2, interpret=True,
    )
    dec1 = ctx.hoist(ts)
    want = ctx.run_hoisted(
        dec1, rs, vec.key_vectors, vec.modswitch_factors, galois=g
    ).to_host()
    np.testing.assert_array_equal(got, want)


def test_scaling_projection_model():
    """The projection model (BASELINE.md scaling deliverable): P=1 is the
    identity, efficiency decreases monotonically with P, and the worst-chip
    row count mirrors ShardedKeySwitch's slot layout."""
    from hexl_fpga_tpu.parallel import projection

    p1 = projection.keyswitch_mp_projection(1, t1_ms=9.4, batch=32)
    assert p1.comm_ms == 0.0
    assert abs(p1.t_p_ms - 9.4) < 1e-6 and p1.efficiency == 1.0
    effs = [
        projection.keyswitch_mp_projection(P, t1_ms=9.4, batch=32).efficiency
        for P in (2, 4, 8)
    ]
    assert all(e1 > e2 for e1, e2 in zip(effs, effs[1:]))
    assert all(0.3 < e < 1.0 for e in effs)
    s1 = projection.dist_ntt_sp_projection(1, t1_ms=15.2, batch=4096)
    assert s1.efficiency == 1.0
    rep = projection.report()
    assert "mp (keyswitch latency) P=8" in rep and "dp (batch" in rep
