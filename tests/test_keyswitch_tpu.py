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


@pytest.fixture(scope="module")
def ctx(vec):
    """ONE shared interpret-mode context for every test that exercises the
    standard 1024_2_3_3_2 config with caller twiddles: interpret-mode
    dispatches dominate the fast tier's wall clock on 1-core boxes, and a
    shared context reuses every traced program across tests."""
    return keyswitch_tpu.get_context(
        1024, 2, 3, 3, 2, vec.moduli, vec.twiddle_factors,
        tile_p=2, interpret=True,
    )


def test_keyswitch_tpu_with_caller_twiddles(vec, ctx):
    got = ctx.run(
        vec.input, vec.t_target_iter_ptr, vec.key_vectors, vec.modswitch_factors
    )
    np.testing.assert_array_equal(got, vec.expected_output)


@pytest.mark.heavy
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


def test_device_key_cache_alternating_sets(vec):
    """The multi-entry cache keeps BOTH key sets resident — the CKKS rotation
    pattern (alternating Galois keys) triggers zero re-uploads after warmup
    (reference keys_map_ caches all sets, `host/src/fpga.cpp:1158-1165`)."""
    vec2 = vectors.make_keyswitch_vector(1024, 2, 3, seed=77, modulus_bits=45)
    ctx = keyswitch_tpu.KeySwitchTpuContext(
        1024, 2, 3, 3, 2, vec.moduli, None, tile_p=2, interpret=True,
    )
    a1 = ctx.device_keys(vec.key_vectors)
    b1 = ctx.device_keys(vec2.key_vectors)
    for _ in range(3):
        a2 = ctx.device_keys(vec.key_vectors)
        b2 = ctx.device_keys(vec2.key_vectors)
        assert a2[0] is a1[0] and b2[0] is b1[0]  # both sets stay cached


def test_device_key_cache_detects_mutation(vec):
    """In-place mutation of a cached key buffer must re-upload, not serve the
    stale tensors (the hazard class of the reference's pointer keying)."""
    keys = [np.array(k, dtype=np.uint64) for k in vec.key_vectors]
    ctx = keyswitch_tpu.KeySwitchTpuContext(
        1024, 2, 3, 3, 2, vec.moduli, None, tile_p=2, interpret=True,
    )
    k1 = ctx.device_keys(keys)
    keys[0][:] = (keys[0] + np.uint64(1)) % np.uint64(vec.moduli[0])
    k2 = ctx.device_keys(keys)
    assert k1[0] is not k2[0]
    # and the refreshed upload reflects the new contents
    np.testing.assert_array_equal(
        np.asarray(k2[0]).ravel()[: 8],
        (keys[0].reshape(2, 3, 1024).astype(np.uint64)
         & np.uint64(0xFFFFFFFF)).astype(np.uint32).ravel()[: 8],
    )


def test_rns_accepts_any_positive(vec):
    """rns_modulus_size is fence-only metadata in the reference (stored and
    compared at `host/src/fpga_int.cpp:443`, never passed to a device
    kernel): any positive value constructs; zero is rejected
    (`host/src/keyswitch.cpp:28`).  Bit-exactness across rns values is
    proven at the golden tier (test_keyswitch_golden) and, on this path,
    in the heavy variant below (a second context = a second compile)."""
    for rns in (1, 3, 9):
        keyswitch_tpu.KeySwitchTpuContext(
            1024, 2, 3, rns, 2, vec.moduli, None, tile_p=2, interpret=True,
        )
    with pytest.raises(AssertionError):
        keyswitch_tpu.KeySwitchTpuContext(
            1024, 2, 3, 0, 2, vec.moduli, None, tile_p=2, interpret=True,
        )


@pytest.mark.heavy
def test_rns_is_fence_only_bit_exact(vec, ctx):
    """Any positive rns produces the same bits through the TPU context."""
    ctx4 = keyswitch_tpu.get_context(
        1024, 2, 3, 4, 2, vec.moduli, vec.twiddle_factors,
        tile_p=2, interpret=True,
    )
    got = ctx4.run(
        vec.input, vec.t_target_iter_ptr, vec.key_vectors, vec.modswitch_factors
    )
    np.testing.assert_array_equal(got, vec.expected_output)


@pytest.mark.heavy
def test_keyswitch_mac_exact128(vec):
    """Quotient-free 128-bit-accumulation MAC (mac_impl="exact128"):
    bit-exact with the deferred-quotient production schedule."""
    ctx = keyswitch_tpu.KeySwitchTpuContext(
        1024, 2, 3, 3, 2, vec.moduli, vec.twiddle_factors,
        tile_p=2, interpret=True, mac_impl="exact128",
    )
    got = ctx.run(
        vec.input, vec.t_target_iter_ptr, vec.key_vectors, vec.modswitch_factors
    )
    np.testing.assert_array_equal(got, vec.expected_output)


@pytest.mark.heavy
def test_keyswitch_fused_mac_engine(vec):
    """Alternative fused transform+MAC engine kernel (raw_fwd_mac_call):
    bit-exact with the default schedule, including batch padding."""
    ctx = keyswitch_tpu.KeySwitchTpuContext(
        1024, 2, 3, 3, 2, vec.moduli, vec.twiddle_factors,
        tile_p=2, interpret=True, fused_mac=True,
    )
    got = ctx.run(
        vec.input, vec.t_target_iter_ptr, vec.key_vectors, vec.modswitch_factors
    )
    np.testing.assert_array_equal(got, vec.expected_output)


def test_device_resident_handle_chain(vec, ctx):
    """stage_ciphertext/stage_target + run_device: the chained-handle path
    must match run() exactly, including a 2-deep chain with no host
    round trip between ops."""
    h_ct = ctx.stage_ciphertext(vec.input[None])
    h_t = ctx.stage_target(vec.t_target_iter_ptr[None])
    out1 = ctx.run_device(h_ct, h_t, vec.key_vectors, vec.modswitch_factors)
    np.testing.assert_array_equal(out1.to_host()[0], vec.expected_output)
    # chain: the output handle feeds the next op's accumulator directly
    out2 = ctx.run_device(out1, h_t, vec.key_vectors, vec.modswitch_factors)
    ref2 = ctx.run(vec.expected_output, vec.t_target_iter_ptr,
                   vec.key_vectors, vec.modswitch_factors)
    np.testing.assert_array_equal(out2.to_host()[0], ref2)
    # host arrays are accepted in place of handles (staged zero-copy)
    out3 = ctx.run_device(vec.input[None], vec.t_target_iter_ptr[None],
                          vec.key_vectors, vec.modswitch_factors)
    np.testing.assert_array_equal(out3.to_host()[0], vec.expected_output)


def test_interleaved_dispatch_fast_path(vec, ctx):
    """dispatch_batch32 (zero-copy staging + on-device u64 split) must be
    bit-identical to the pair-plane dispatch_batch."""
    from hexl_fpga_tpu.ops import word64 as w

    rs = vec.input[None]
    ts = vec.t_target_iter_ptr[None]
    out32 = ctx.dispatch_batch32(rs, ts, vec.key_vectors,
                                 vec.modswitch_factors)
    got = w.from_interleaved_np(np.asarray(out32)).reshape(1, -1)
    olo, ohi = ctx.dispatch_batch(rs, ts, vec.key_vectors,
                                  vec.modswitch_factors)
    want = w.from_pair_np(np.asarray(olo), np.asarray(ohi)).reshape(1, -1)
    np.testing.assert_array_equal(got, want)
    np.testing.assert_array_equal(got[0], vec.expected_output.ravel())


def test_wire_packed_dispatch_matches(vec, ctx, monkeypatch):
    """The 52-bit wire-packed transport must be bit-identical end to end
    (the frozen expected_output IS the oracle, so one packed dispatch
    proves it; pack/unpack roundtrips are covered by test_wirepack.py)."""
    monkeypatch.setenv("HEXL_TPU_WIRE_PACK", "1")
    rs = vec.input[None]
    ts = vec.t_target_iter_ptr[None]
    got = ctx.run_batch(rs, ts, vec.key_vectors, vec.modswitch_factors)
    np.testing.assert_array_equal(got[0], vec.expected_output.ravel())


def test_key_cache_full_checksum_catches_any_mutation(vec, monkeypatch):
    """HEXL_TPU_KEY_CHECKSUM=full must catch in-place mutations that the
    default stride sample can miss (the cache's documented escape hatch
    for callers that cannot honor the no-mutation contract)."""
    monkeypatch.setenv("HEXL_TPU_KEY_CHECKSUM", "full")
    ctx = keyswitch_tpu.KeySwitchTpuContext(
        1024, 2, 3, 3, 2, vec.moduli, None, tile_p=2, interpret=True,
    )
    keys = [np.array(k, dtype=np.uint64) for k in vec.key_vectors]
    h1 = ctx.device_keys(keys)
    # mutate ONE element chosen off the stride-64 sample grid
    flat = keys[0].reshape(-1)
    stride = max(1, flat.size // 64)
    idx = 1 if stride > 1 else 0
    assert idx % stride != 0 or stride == 1
    flat[idx] ^= np.uint64(1)
    h2 = ctx.device_keys(keys)
    assert h1[0] is not h2[0], "full checksum must force a re-upload"


def test_run_device_chain_matches_sequential(vec, ctx):
    """The compiled fixed-key chain must equal depth sequential run_device
    calls bit-for-bit."""
    h_t = ctx.stage_target(vec.t_target_iter_ptr[None])
    cur = ctx.stage_ciphertext(vec.input[None])
    for _ in range(2):
        cur = ctx.run_device(cur, h_t, vec.key_vectors,
                             vec.modswitch_factors)
    chained = ctx.run_device_chain(
        vec.input[None], vec.t_target_iter_ptr[None], vec.key_vectors,
        vec.modswitch_factors, depth=2,
    )
    np.testing.assert_array_equal(chained.to_host(), cur.to_host())


def test_run_device_chain_keyed_matches_sequential(vec, ctx):
    """The compiled PER-STEP-KEY chain (stacked key tensors indexed by a
    traced step) must equal the same schedule run as sequential run_device
    calls bit-for-bit."""
    # a second key set over the SAME moduli: roll each (comp, K, n) plane
    # along n (values stay canonical per modulus plane)
    keys2 = [
        np.roll(np.asarray(kv, np.uint64).reshape(2, 3, 1024), 7, axis=-1
                ).reshape(-1)
        for kv in vec.key_vectors
    ]
    key_sets = [vec.key_vectors, keys2]
    schedule = [1, 0]
    h_t = ctx.stage_target(vec.t_target_iter_ptr[None])
    cur = ctx.stage_ciphertext(vec.input[None])
    for s in schedule:
        cur = ctx.run_device(cur, h_t, key_sets[s], vec.modswitch_factors)
    chained = ctx.run_device_chain_keyed(
        vec.input[None], vec.t_target_iter_ptr[None], key_sets,
        vec.modswitch_factors, schedule,
    )
    np.testing.assert_array_equal(chained.to_host(), cur.to_host())


def test_hoisted_keyswitch_matches_run_batch(vec, ctx):
    """run_hoisted(perm=None) must be BIT-IDENTICAL to run_batch: every MAC
    input carries the same residue (D[j] row j is a lazy representative of
    the target itself) and the tails canonicalize."""
    dec = ctx.hoist(np.asarray(vec.t_target_iter_ptr, np.uint64)[None])
    out = ctx.run_hoisted(
        dec, np.asarray(vec.input, np.uint64)[None], vec.key_vectors,
        vec.modswitch_factors,
    )
    np.testing.assert_array_equal(out.to_host()[0], vec.expected_output)
    # identity permutation == no permutation (the perm path itself is exact)
    out2 = ctx.run_hoisted(
        dec, np.asarray(vec.input, np.uint64)[None], vec.key_vectors,
        vec.modswitch_factors, perm=np.arange(1024, dtype=np.int32),
    )
    np.testing.assert_array_equal(out2.to_host()[0], vec.expected_output)


def test_hoisted_keyswitch_deferred_perm_identity(vec, ctx):
    """run_hoisted(perm=sigma) uses the deferred-automorphism scheme: keys
    staged pre-permuted by sigma^{-1}, the apply gather-free, one output
    gather.  Its output must therefore be BIT-IDENTICAL to

        sigma( run_batch(res, t, sigma^{-1}(keys), msf) )

    — run_batch on the ORIGINAL target with host-permuted keys, then the
    sigma gather applied per plane.  (HE-level validity of the rotation
    semantics is covered by tests/test_ckks.py decryption tests.)"""
    from hexl_fpga_tpu.integrations.ckks import _ntt_galois_sigma

    n, L, comp, K = 1024, 2, 2, 3
    sigma = _ntt_galois_sigma(n, 5).astype(np.int32)
    inv = np.empty_like(sigma)
    inv[sigma] = np.arange(n, dtype=np.int32)
    dec = ctx.hoist(np.asarray(vec.t_target_iter_ptr, np.uint64)[None])
    out = ctx.run_hoisted(
        dec, np.asarray(vec.input, np.uint64)[None], vec.key_vectors,
        vec.modswitch_factors, perm=sigma,
    ).to_host()[0]
    keys_perm = [
        np.asarray(kv, np.uint64).reshape(comp, K, n)[..., inv].reshape(-1)
        for kv in vec.key_vectors
    ]
    inner = ctx.run_batch(
        np.asarray(vec.input, np.uint64)[None],
        np.asarray(vec.t_target_iter_ptr, np.uint64)[None],
        keys_perm, vec.modswitch_factors,
    )[0]
    want = inner.reshape(comp, L, n)[..., sigma].reshape(-1)
    np.testing.assert_array_equal(out, want)


def test_hoisted_galois_mxu_matches_perm_path(vec, ctx):
    """run_hoisted(galois=g) (deferred automorphism as MXU matmuls,
    ops/galois_mxu.py) is BIT-IDENTICAL to run_hoisted(perm=sigma_g) (the
    gather path) — same keys, same pipeline, only the permutation
    implementation differs."""
    from hexl_fpga_tpu.ops import galois_mxu

    g = 5
    sigma = galois_mxu.ntt_galois_sigma(1024, g).astype(np.int32)
    dec = ctx.hoist(np.asarray(vec.t_target_iter_ptr, np.uint64)[None])
    ct = np.asarray(vec.input, np.uint64)[None]
    via_perm = ctx.run_hoisted(
        dec, ct, vec.key_vectors, vec.modswitch_factors, perm=sigma,
    ).to_host()
    via_mxu = ctx.run_hoisted(
        dec, ct, vec.key_vectors, vec.modswitch_factors, galois=g,
    ).to_host()
    np.testing.assert_array_equal(via_mxu, via_perm)


def test_hoisted_keyswitch_compact_planes_reduced_level():
    """K > L+1 (an INACTIVE modulus between the level and the special
    prime): the hoisted decomposition must hold only L+1 compact planes —
    decomp moduli then the special prime — skipping inactive transforms,
    and run_hoisted must still be bit-identical to run_batch."""
    v = vectors.make_keyswitch_vector(1024, 2, 4, seed=3, modulus_bits=45)
    ctx = keyswitch_tpu.KeySwitchTpuContext(
        1024, 2, 4, 3, 2, v.moduli, v.twiddle_factors,
        tile_p=2, interpret=True,
    )
    assert ctx.K > ctx.L + 1
    want = ctx.run_batch(
        np.asarray(v.input, np.uint64)[None],
        np.asarray(v.t_target_iter_ptr, np.uint64)[None],
        v.key_vectors, v.modswitch_factors,
    )[0]
    np.testing.assert_array_equal(want, v.expected_output)
    dec = ctx.hoist(np.asarray(v.t_target_iter_ptr, np.uint64)[None])
    assert dec.dlo.shape[0] == ctx.L + 1, dec.dlo.shape
    out = ctx.run_hoisted(
        dec, np.asarray(v.input, np.uint64)[None], v.key_vectors,
        v.modswitch_factors,
    )
    np.testing.assert_array_equal(out.to_host()[0], v.expected_output)
