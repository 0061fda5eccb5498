"""Device-resident BEHZ multiply (ops/rns_behz_tpu.py): bit-exact against
the host NumPy BehzTool on every element — both are exact integer pipelines
sharing constants and NTT roots, so any deviation is a bug.

The CPU tier drives the XLA butterfly engines (engine_impl='xla' — the
u32-pair base-conversion/floor/Shenoy lane math is identical in both
tiers; interpret-mode Pallas execution of the ~17k+7 transforms costs
minutes per multiply on one core).  The fused-MXU tier runs on the real
chip via bench.py's bfv extra, which gates on the same host-tool
bit-exactness before timing."""

import numpy as np
import pytest

from hexl_fpga_tpu.ops import nt, rns_behz, rns_behz_tpu, twiddles


def _make(n, k, bits, t, seed):
    q = [int(p) for p in nt.generate_primes(k, bits, n)]
    tool = rns_behz.BehzTool(n, q, t)
    tabs = [twiddles.ntt_tables(n, qi) for qi in q]
    tpu = rns_behz_tpu.BehzTpu(tool, tabs, engine_impl="xla")
    rng = np.random.default_rng(seed)
    cts = [
        np.stack([
            np.stack([rng.integers(0, qi, size=n, dtype=np.uint64)
                      for qi in q])
            for _ in range(2)
        ])
        for _ in range(2)
    ]
    return tool, tabs, tpu, cts


@pytest.mark.parametrize(
    "n,k,bits,t",
    [
        (128, 2, 45, 65537),
        (128, 3, 51, 257),
        pytest.param(1024, 3, 51, 65537, marks=pytest.mark.heavy),
    ],
)
def test_device_multiply_bit_exact(n, k, bits, t):
    tool, tabs, tpu, (c1, c2) = _make(n, k, bits, t, seed=k)
    want = tool.multiply(c1, c2, tabs)
    got = tpu.multiply(c1, c2)
    np.testing.assert_array_equal(got, want)


def test_device_multiply_batch():
    n, k = 128, 2
    tool, tabs, tpu, (c1, c2) = _make(n, k, 45, 65537, seed=9)
    b1 = np.stack([c1, c2])
    b2 = np.stack([c2, c1])
    got = tpu.multiply_batch(b1, b2)
    for b in range(2):
        want = tool.multiply(b1[b], b2[b], tabs)
        np.testing.assert_array_equal(got[b], want)


def test_shape_gates():
    """Below the MXU floor the mxu tier refuses (xla tier serves any n)."""
    n = 64
    q = [int(p) for p in nt.generate_primes(2, 45, n)]
    tool = rns_behz.BehzTool(n, q, 257)
    tabs = [twiddles.ntt_tables(n, qi) for qi in q]
    with pytest.raises(ValueError):
        rns_behz_tpu.BehzTpu(tool, tabs, engine_impl="mxu")
    rns_behz_tpu.BehzTpu(tool, tabs, engine_impl="xla")  # fine


def test_bfv_context_multiply_rns_device_end_to_end():
    """BfvContext.multiply_rns(device=True) == (device=False) bit-exactly
    and decrypts to m1*m2 through relinearization."""
    from hexl_fpga_tpu.integrations import bfv

    n = 128
    moduli = [int(p) for p in nt.generate_primes(3, 45, n)]
    t = 257  # prime, 1 mod 2n
    ctx = bfv.BfvContext(n, moduli, t, seed=4)
    rng = np.random.default_rng(1)
    z1 = rng.integers(0, t, size=n).astype(np.uint64)
    z2 = rng.integers(0, t, size=n).astype(np.uint64)
    ct1, ct2 = ctx.encrypt(z1), ctx.encrypt(z2)
    d_dev, _ = ctx.multiply_rns(ct1, ct2, device=True)
    d_host, _ = ctx.multiply_rns(ct1, ct2, device=False)
    np.testing.assert_array_equal(d_dev, d_host)
    ct = ctx.relinearize(d_dev, 1.0, level=ct1.level)
    want = (z1.astype(object) * z2.astype(object)) % t
    assert np.array_equal(ctx.decrypt(ct).astype(object), want)
