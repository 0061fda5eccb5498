"""BGV end-to-end demo: exact integer homomorphic arithmetic.

Encrypt two integer vectors (SEAL BatchEncoder-style slots), multiply them
through the accelerated DyadicMultiply, relinearize through the BGV-mode
KeySwitch (GHS-corrected tail: the rounding delta is divisible by t, so the
message mod t is untouched), mod-switch down a level, and decrypt — every
result is EXACT mod t, unlike CKKS's approximate arithmetic."""

import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from hexl_fpga_tpu import api  # noqa: E402
from hexl_fpga_tpu.integrations import bgv  # noqa: E402
from hexl_fpga_tpu.ops import nt  # noqa: E402


def main():
    n, t = 1024, 65537  # t prime, t ≡ 1 (mod 2n) for batching
    moduli = nt.generate_primes(4, 45, n)
    ctx = bgv.BgvContext(n, moduli, t=t, seed=7)
    api.acquire_FPGA_resources()

    rng = np.random.default_rng(0)
    z1 = rng.integers(0, t, size=n, dtype=np.uint64)
    z2 = rng.integers(0, t, size=n, dtype=np.uint64)
    ct1, ct2 = ctx.encrypt(z1), ctx.encrypt(z2)
    print(f"encrypted 2 x {n} integer slots mod t={t}")

    prod = ctx.multiply_relin(ct1, ct2)
    assert np.array_equal(ctx.decrypt(prod), z1.astype(object) * z2 % t)
    print("multiply + relinearize: EXACT slotwise product")

    prod = ctx.mod_switch_to_next(prod)
    assert np.array_equal(ctx.decrypt(prod), z1.astype(object) * z2 % t)
    print(f"GHS mod-switch to level {prod.level}: message preserved "
          f"(correction factor {int(prod.scale)})")

    rot = ctx.rotate(ct1, 5)
    assert np.array_equal(
        ctx.decrypt(rot).reshape(2, -1),
        np.roll(z1.reshape(2, -1), -5, axis=1),
    )
    print("rotate rows by 5: EXACT")

    api.release_FPGA_resources()
    print("done")


if __name__ == "__main__":
    main()
