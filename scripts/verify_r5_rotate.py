"""Drive the public CKKS rotation surface end-to-end on the default
backend (the real TPU here): encrypt -> device rotate (MXU Galois path,
bf16 operands) + hoisted rotate -> decrypt, slot values must match the
host rotation of the plaintext. /verify driver for the galois dtype
change; kept as a standing smoke probe."""

import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from hexl_fpga_tpu.integrations import ckks
from hexl_fpga_tpu.ops import nt


def main():
    n = 16384
    moduli = nt.generate_primes(4, 45, n)
    ctx = ckks.CkksContext(n, moduli, scale=2.0**45, seed=3)
    ev = ckks.DeviceCkksEvaluator(ctx)
    slots = n // 2
    z = np.arange(slots, dtype=np.float64) / slots + 0.25
    ct = ctx.encrypt(z)
    h = ev.stage(ct)

    r = 3
    rot = ev.rotate(h, r)
    got = ctx.decrypt(ev.to_host(rot)).real
    want = np.roll(z, -r)
    err = float(np.max(np.abs(got - want)))
    print(f"rotate({r}): max slot error {err:.3e}", flush=True)
    assert err < 1e-6, err

    hh = ev.hoist(h)
    for rr in (1, 5):
        rot2 = ev.rotate_hoisted(hh, rr)
        got2 = ctx.decrypt(ev.to_host(rot2)).real
        err2 = float(np.max(np.abs(got2 - np.roll(z, -rr))))
        print(f"hoisted rotate({rr}): max slot error {err2:.3e}", flush=True)
        assert err2 < 1e-6, err2
    print("PUBLIC ROTATION SURFACE OK", flush=True)


if __name__ == "__main__":
    main()
