"""Extended on-hardware fuzz: the fused MXU kernels and the TPU keyswitch
across a broad (n, prime-width) grid, bit-exact vs the golden models.

Run on a real TPU (takes tens of minutes — each config compiles kernels):
  python scripts/fuzz_hw.py [--quick]
Exit code 0 = every configuration matched exactly.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    quick = "--quick" in sys.argv
    from hexl_fpga_tpu.ops import golden, nt, ntt_mxu_pallas
    from hexl_fpga_tpu.ops import keyswitch_tpu
    from hexl_fpga_tpu.utils import vectors

    rng = np.random.default_rng(0)
    failures = []
    t_start = time.time()

    # --- NTT/INTT grid ---
    sizes = [1024, 4096, 16384] if quick else [1024, 2048, 4096, 8192, 16384, 32768]
    widths = [30, 51] if quick else [20, 30, 40, 45, 48, 51]
    for n in sizes:
        for bits in widths:
            if bits <= nt.log2_exact(n):
                continue
            q = nt.generate_primes(1, bits, n)[0]
            a = rng.integers(0, q, size=(4, n), dtype=np.uint64)
            # stimulus corners appended (reference matrix)
            a[1] = 0
            a[2] = q - 1
            a[3, :] = 0
            a[3, 0] = 1
            t0 = time.time()
            try:
                y = ntt_mxu_pallas.fwd_ntt(a, q)
                ok_f = np.array_equal(y, golden.fwd_ntt(a, q))
                back = ntt_mxu_pallas.inv_ntt(y, q)
                ok_i = np.array_equal(back, a)
            except Exception as exc:
                ok_f = ok_i = False
                print(f"ntt n={n} bits={bits}: EXCEPTION {exc}", flush=True)
            status = "OK" if (ok_f and ok_i) else "FAIL"
            print(f"ntt n={n} q={q} ({q.bit_length()}b): fwd+inv {status} "
                  f"[{time.time()-t0:.0f}s]", flush=True)
            if status != "OK":
                failures.append(("ntt", n, q))

    # --- keyswitch grid ---
    ks_configs = (
        [(1024, 2, 3, 45)]
        if quick
        else [
            (1024, 2, 3, 30), (1024, 4, 5, 51), (2048, 3, 4, 40),
            (4096, 2, 3, 45), (4096, 5, 6, 51), (8192, 3, 4, 48),
        ]
    )
    for n, L, K, bits in ks_configs:
        t0 = time.time()
        vec = vectors.make_keyswitch_vector(n, L, K, seed=n + L,
                                            modulus_bits=bits)
        ctx = keyswitch_tpu.KeySwitchTpuContext(
            n, L, K, L + 1, 2, vec.moduli, vec.twiddle_factors, tile_p=2
        )
        got = ctx.run(vec.input, vec.t_target_iter_ptr, vec.key_vectors,
                      vec.modswitch_factors)
        ok = np.array_equal(got, vec.expected_output)
        print(f"keyswitch {n}_{L}_{K} ({bits}b): "
              f"{'OK' if ok else 'FAIL'} [{time.time()-t0:.0f}s]", flush=True)
        if not ok:
            failures.append(("keyswitch", n, L, K, bits))

    print(f"fuzz done in {time.time()-t_start:.0f}s; "
          f"{'ALL OK' if not failures else f'{len(failures)} FAILURES'}",
          flush=True)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
