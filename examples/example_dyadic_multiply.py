"""Standalone dyadic-multiply demo with validation — the analog of the
reference's `examples/` app (`examples/example.cpp`): enqueue a worksize of
ciphertext products through the async API, wait, verify against a direct
recompute."""

import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from hexl_fpga_tpu import api  # noqa: E402
from hexl_fpga_tpu.ops import golden, nt  # noqa: E402


def main():
    n = 4096
    n_moduli = 3
    worksize = 4
    moduli = np.array(nt.generate_primes(n_moduli, 48, n), dtype=np.uint64)
    rng = np.random.default_rng(0)

    api.acquire_FPGA_resources()
    print(f"dyadic multiply: n={n}, {n_moduli} moduli, worksize={worksize}")

    jobs = []
    api.set_worksize_DyadicMultiply(worksize)
    for _ in range(worksize):
        op1 = rng.integers(0, moduli.min(), size=2 * n_moduli * n, dtype=np.uint64)
        op2 = rng.integers(0, moduli.min(), size=2 * n_moduli * n, dtype=np.uint64)
        out = np.zeros(3 * n_moduli * n, dtype=np.uint64)
        api.DyadicMultiply(out, op1, op2, n, moduli, n_moduli)
        jobs.append((op1, op2, out))
    api.DyadicMultiplyCompleted()

    for i, (op1, op2, out) in enumerate(jobs):
        want = golden.dyadic_multiply(op1, op2, n, moduli, n_moduli)
        assert np.array_equal(out, want), f"job {i} mismatch"
        print(f"job {i}: verified OK")
    api.release_FPGA_resources()
    print("all results validated")


if __name__ == "__main__":
    main()
