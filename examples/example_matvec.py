"""Encrypted matrix-vector product with hoisted rotations (BSGS).

The dominant kernel of encrypted inference and CKKS bootstrapping: apply a
plaintext matrix M to an encrypted vector z via the diagonal method,

    M z = sum_d  diag_d(M) * rot_d(z),

organized baby-step/giant-step so the baby rotations all come from ONE
hoisted keyswitch decomposition (Halevi-Shoup hoisting — the keyswitch
prefix is computed once and each additional rotation costs only a
NTT-domain permutation + MAC + tail, ~4.4x less transform work).  The
whole computation is device-resident: one upload, one fetch.

Run on TPU (or CPU with interpret mode, slower):
    python examples/example_matvec.py
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np

from hexl_fpga_tpu import api
from hexl_fpga_tpu.integrations import ckks
from hexl_fpga_tpu.ops import nt


def main():
    n = 1024
    moduli = nt.generate_primes(4, 45, n)  # 3 decomp primes + special
    ctx = ckks.CkksContext(n, moduli, scale=2.0**45, seed=7)
    api.acquire_FPGA_resources()

    rng = np.random.default_rng(0)
    z = rng.standard_normal(ctx.slots) * 0.5
    # a banded matrix: 6 generalized diagonals
    bands = (0, 1, 2, 16, 17, 33)
    diags = {d: rng.standard_normal(ctx.slots) * 0.5 for d in bands}
    want = sum(diags[d] * np.roll(z, -d) for d in bands)

    ev = ckks.DeviceCkksEvaluator(ctx)
    h = ev.stage(ctx.encrypt(z))            # host -> device, once
    out = ev.linear_transform(h, diags, bsgs_n1=16)
    out = ev.rescale(out)                   # scale back to ~2^45
    back = ctx.decrypt(ev.to_host(out))     # device -> host, once

    err = np.max(np.abs(back - want))
    print(f"matvec over {len(bands)} diagonals (BSGS n1=16, hoisted): "
          f"max |err| = {err:.2e}")
    assert err < 1e-2

    # the same computation compiled to ONE device program (bit-identical
    # to the composition above; the production shape — one dispatch per
    # matvec instead of one per primitive)
    fused = ev.rescale(ev.linear_transform_fused(h, diags, bsgs_n1=16))
    err_f = np.max(np.abs(ctx.decrypt(ev.to_host(fused)) - want))
    print(f"fused one-program matvec: max |err| = {err_f:.2e}")
    assert err_f < 1e-2
    api.release_FPGA_resources()
    print("OK")


if __name__ == "__main__":
    main()
