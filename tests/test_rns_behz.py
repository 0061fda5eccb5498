"""BEHZ full-RNS BFV multiply (ops/rns_behz.py): every primitive bit-exact
vs a Python big-int oracle; end-to-end multiply validated by exact
decryption and noise budget against the textbook t/Q big-int tensor product
(the operation the reference leaves on the SEAL CPU —
`/root/reference/experimental/bridge-seal/`)."""

import numpy as np
import pytest

from hexl_fpga_tpu.integrations import bfv
from hexl_fpga_tpu.ops import nt, rns_behz


@pytest.fixture(scope="module")
def tool():
    n = 32
    q = [int(p) for p in nt.generate_primes(3, 45, n)]
    return rns_behz.BehzTool(n, q, 65537, aux_bits=46)


def _res(xs, base):
    return np.stack(
        [np.array([x % m for x in xs], dtype=np.uint64) for m in base]
    )


def test_bases_distinct_and_ntt_friendly(tool):
    all_m = tool.q + tool.Bsk
    assert len(set(all_m)) == len(all_m)
    for m in tool.Bsk:
        assert m % (2 * tool.n) == 1  # negacyclic-NTT friendly
    assert tool.m_tilde == 1 << 32


def test_fastbconv_vs_bigint(tool):
    Q = tool.q_prod
    rng = np.random.default_rng(0)
    xs = [int(v) % Q for v in rng.integers(0, 1 << 62, size=tool.n)]
    x_q = _res(xs, tool.q)
    conv = tool.fastbconv_q_to(x_q, tool.Bsk, tool.q_hat_mod_Bsk)
    tilde = tool._tilde(x_q)
    for col in range(tool.n):
        # the conversion computes S = sum_i tilde_i * qhat_i = x + alpha*q
        S = sum(int(tilde[i, col]) * tool.q_hat[i] for i in range(tool.k))
        assert S % Q == xs[col]
        assert 0 <= (S - xs[col]) // Q < tool.k
        for d, m in enumerate(tool.Bsk):
            assert int(conv[d, col]) == S % m


def test_extend_to_bsk_small_overflow(tool):
    """SmMRq: the extended value is x + a*q for one consistent integer with
    |a| <= k+1 (BEHZ Lemma; the correction joins the noise)."""
    Q = tool.q_prod
    P_bsk = 1
    for m in tool.Bsk:
        P_bsk *= m
    rng = np.random.default_rng(1)
    xs = [int(v) % Q for v in rng.integers(0, 1 << 62, size=tool.n)]
    ext = tool.extend_to_bsk(_res(xs, tool.q))
    for col in range(tool.n):
        # CRT-reconstruct the integer the Bsk residues represent
        y = 0
        for d, m in enumerate(tool.Bsk):
            Pd = P_bsk // m
            y = (y + int(ext[d, col]) * Pd * nt.inverse_mod(Pd % m, m)) % P_bsk
        if y > P_bsk // 2:
            y -= P_bsk
        xc = xs[col] - Q if xs[col] > Q // 2 else xs[col]
        a, r = divmod(y - xc, Q)
        assert r == 0
        assert abs(a) <= tool.k + 1


def test_fast_floor_and_sk_conversion(tool):
    """fast_floor lands within (-k, 0] of the true floor; fastbconv_sk
    (Shenoy-Kumaresan) converts the result back to q EXACTLY."""
    Q = tool.q_prod
    t = tool.t
    rng = np.random.default_rng(2)
    bound = Q * 3  # tensor-product-sized values beyond Q
    ds = [int(v) % bound for v in rng.integers(0, 1 << 62, size=tool.n)]
    dsc = [d - bound if d > bound // 2 else d for d in ds]
    g = tool.fast_floor(
        _res([t * d for d in dsc], tool.q),
        _res([t * d for d in dsc], tool.Bsk),
    )
    out = tool.fastbconv_sk(g)
    for col in range(tool.n):
        want = (t * dsc[col]) // Q
        cand = None
        for e in range(-tool.k, 1):
            if all(
                int(g[d, col]) == (want + e) % m
                for d, m in enumerate(tool.Bsk)
            ):
                cand = want + e
                break
        assert cand is not None, "fast_floor error outside (-k, 0]"
        for i, qi in enumerate(tool.q):
            assert int(out[i, col]) == cand % qi


def test_multiply_rns_decrypts_exactly():
    """End-to-end: BEHZ multiply + relinearize decrypts to m1*m2 mod t with
    the same noise budget as the textbook big-int tensor product."""
    n = 64
    moduli = [int(p) for p in nt.generate_primes(4, 45, n)]
    t = 257  # prime, 1 mod 2n
    ctx = bfv.BfvContext(n, moduli, t, seed=3)
    rng = np.random.default_rng(0)
    z1 = rng.integers(0, t, size=n).astype(np.uint64)
    z2 = rng.integers(0, t, size=n).astype(np.uint64)
    c1, c2 = ctx.encrypt(z1), ctx.encrypt(z2)
    want = (z1.astype(object) * z2.astype(object)) % t

    d_rns, _ = ctx.multiply_rns(c1, c2)
    ct_rns = ctx.relinearize(d_rns, 1.0, level=c1.level)
    assert np.array_equal(ctx.decrypt(ct_rns).astype(object), want)

    d_ref, _ = ctx.multiply(c1, c2)
    ct_ref = ctx.relinearize(d_ref, 1.0, level=c1.level)
    b_ref, b_rns = ctx.noise_budget(ct_ref), ctx.noise_budget(ct_rns)
    # BEHZ's bounded correction terms cost at most a few bits of budget
    assert b_rns >= b_ref - 4
    # and the tensor outputs agree up to those bounded corrections
    for c in range(3):
        for j in range(c1.level + 1):
            qj = ctx.moduli[j]
            from hexl_fpga_tpu.ops import golden

            a = golden.inv_ntt(d_ref[c][j], qj, ctx.tabs[j]).astype(object)
            b = golden.inv_ntt(d_rns[c][j], qj, ctx.tabs[j]).astype(object)
            diff = (a - b) % qj
            diff = np.where(diff > qj // 2, diff - qj, diff)
            assert np.abs(diff).max() <= 4 * (c1.level + 2)
