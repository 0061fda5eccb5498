"""CKKS end-to-end demo: encrypt, square (DyadicMultiply), relinearize
(KeySwitch), rescale, rotate, decrypt — the workload the reference's SEAL
bridge accelerates (`experimental/bridge-seal/tests/keyswitch-example.cpp`)."""

import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from hexl_fpga_tpu import api  # noqa: E402
from hexl_fpga_tpu.integrations import ckks  # noqa: E402
from hexl_fpga_tpu.ops import nt  # noqa: E402


def main():
    n = 1024
    moduli = nt.generate_primes(4, 45, n)
    ctx = ckks.CkksContext(n, moduli, scale=2.0**45, seed=7)
    api.acquire_FPGA_resources()

    rng = np.random.default_rng(0)
    z = rng.uniform(0.5, 1.5, size=ctx.slots)
    ct = ctx.encrypt(z)
    print(f"encrypted {ctx.slots} slots at scale 2^45")

    sq = ctx.rescale(ctx.multiply_relin(ct, ct))
    err = np.max(np.abs(ctx.decrypt(sq) - z * z))
    print(f"square + relinearize + rescale: max abs error {err:.3e}")

    rot = ctx.rotate(ct, 3)
    err = np.max(np.abs(ctx.decrypt(rot) - np.roll(z, -3)))
    print(f"rotate by 3: max abs error {err:.3e}")

    api.release_FPGA_resources()
    print("done")


if __name__ == "__main__":
    main()
