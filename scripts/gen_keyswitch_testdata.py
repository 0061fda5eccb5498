"""Generate keyswitch test vectors in the reference's JSON schema.

The reference distributes recorded vectors as a release download
(testdata.zip, `README.md:166-173`), globbed by the tests as
`$KEYSWITCH_DATA_DIR/{N}_{decomp}_{key}_{rns}_{kcomp}_*.json`
(`tests/test_keyswitch.cpp:148-191`).  That download is unavailable here;
this script produces semantically-valid vectors in the same schema (genuine
RLWE switching keys; expected_output from the golden model, whose RLWE
semantics are proven in tests/test_keyswitch_golden.py).

Usage:
  python scripts/gen_keyswitch_testdata.py [outdir] [--configs 16384_6_7 ...]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hexl_fpga_tpu.utils import vectors  # noqa: E402


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "testdata"
    frozen = "--frozen" in sys.argv  # the committed tests/testdata set
    os.makedirs(outdir, exist_ok=True)
    # reference-shipped configs: {N}_6_7_7_2 and {N}_5_7_6_2 at N in
    # {16384, 8192}; small configs added for fast CI
    if frozen:
        # (n, L, K, seeds, gzip): small fixtures as plain JSON; the large
        # reference configs compressed (~9-19 MB of random residues each).
        # 8192/16384 x {6_7_7_2, 5_7_6_2} mirror the reference's recorded
        # test matrix (`tests/micro_keyswitch.sh:20-34`).
        configs = [
            (1024, 2, 3, 2, False),
            (2048, 3, 4, 1, False),
            (1024, 5, 7, 1, False),
            (8192, 5, 7, 1, True),
            (8192, 6, 7, 1, True),
            (16384, 5, 7, 1, True),
            (16384, 6, 7, 1, True),
        ]
    else:
        configs = [
            (1024, 2, 3, 2, False),
            (4096, 2, 3, 2, False),
            (8192, 5, 7, 2, False),
            (8192, 6, 7, 2, False),
            (16384, 5, 7, 2, False),
            (16384, 6, 7, 2, False),
        ]
    for n, L, K, seeds, gz in configs:
        for seed in range(seeds):
            ext = "json.gz" if gz else "json"
            rns = L + 1
            path = os.path.join(outdir, f"{n}_{L}_{K}_{rns}_2_{seed}.{ext}")
            if frozen and os.path.exists(path):
                print("exists", path)  # never churn committed frozen bytes
                continue
            vec = vectors.make_keyswitch_vector(
                n, L, K, seed=seed, modulus_bits=51
            )
            assert f"{vec.config_name}_{seed}.{ext}" == os.path.basename(path)
            vectors.save_json(vec, path)
            print("wrote", path)


if __name__ == "__main__":
    main()
