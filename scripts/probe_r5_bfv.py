"""Round-5 probe: device BEHZ multiply on the real chip (the bench_bfv
path standalone: compile-size check over the tunnel + bit-exact gate +
chain rate)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench

bench.bench_bfv_multiply.__globals__["log"] = bench.log
extras = {}
bench.bench_bfv_multiply(extras)
print("PROBE_OK", extras)
