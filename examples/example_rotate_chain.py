"""Device-resident CKKS rotation chain.

A chain of slot rotations (the hot pattern in CKKS matrix-vector products
and bootstrapping) in which the ciphertext NEVER returns to the host
between ops: each rotation is an NTT-domain permutation gather + the
fused-MXU keyswitch, and the chain pays one device->host transfer at the
end.  Compare examples/example_ckks.py, which round-trips the host per op
(the reference FPGA's only possible pattern: `host/src/fpga.cpp:1517-1545`).

Run on TPU (or CPU with interpret=True, slower):
    python examples/example_rotate_chain.py
"""

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
    z = rng.standard_normal(ctx.slots) + 1j * rng.standard_normal(ctx.slots)
    ct = ctx.encrypt(z)

    ev = ckks.DeviceCkksEvaluator(ctx)
    h = ev.stage(ct)                    # host -> device, once
    depth = 4
    for _ in range(depth):
        h = ev.rotate(h, 1)             # gather + keyswitch, on device
    out = ev.to_host(h)                 # device -> host, once
    back = ctx.decrypt(out)

    want = np.roll(z, -depth)
    err = np.max(np.abs(back - want))
    print(f"rotation chain depth {depth}: max |err| = {err:.2e}")
    assert err < 1e-2
    api.release_FPGA_resources()
    print("OK")


if __name__ == "__main__":
    main()
