"""BFV end-to-end demo: the reference's other SEAL scheme.

Encrypt integer vectors, multiply exactly (textbook t/Q tensor product),
relinearize through the accelerated KeySwitch, mod-switch down a level,
rotate — every result exact mod t."""

import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from hexl_fpga_tpu import api  # noqa: E402
from hexl_fpga_tpu.integrations import bfv  # noqa: E402
from hexl_fpga_tpu.ops import nt  # noqa: E402


def main():
    n, t = 1024, 65537
    moduli = nt.generate_primes(4, 45, n)
    ctx = bfv.BfvContext(n, moduli, t=t, seed=11)
    api.acquire_FPGA_resources()

    rng = np.random.default_rng(0)
    z1 = rng.integers(0, t, size=n, dtype=np.uint64)
    z2 = rng.integers(0, t, size=n, dtype=np.uint64)
    print(f"encrypted 2 x {n} integer slots mod t={t}")

    prod = ctx.multiply_relin(ctx.encrypt(z1), ctx.encrypt(z2))
    assert np.array_equal(ctx.decrypt(prod), z1.astype(object) * z2 % t)
    print("multiply (exact t/Q tensor) + accelerated relinearize: EXACT")

    # the production path: full-RNS BEHZ multiply, device-resident (fused
    # MXU NTTs + u32-pair base conversions in one jit; beyond the
    # reference, whose bridge leaves BFV multiplication on the SEAL CPU)
    d_rns, sc = ctx.multiply_rns(ctx.encrypt(z1), ctx.encrypt(z2))
    prod_rns = ctx.relinearize(d_rns, sc, level=len(moduli) - 2)
    assert np.array_equal(ctx.decrypt(prod_rns), z1.astype(object) * z2 % t)
    print("multiply_rns (device BEHZ) + relinearize: EXACT")

    prod = ctx.mod_switch_to_next(prod)
    assert np.array_equal(ctx.decrypt(prod), z1.astype(object) * z2 % t)
    print(f"divide-and-round mod-switch to level {prod.level}: EXACT")

    rot = ctx.rotate(ctx.encrypt(z1), 3)
    assert np.array_equal(
        ctx.decrypt(rot).reshape(2, -1),
        np.roll(z1.reshape(2, -1), -3, axis=1),
    )
    print("rotate rows by 3 (accelerated keyswitch): EXACT")

    api.release_FPGA_resources()
    print("done")


if __name__ == "__main__":
    main()
