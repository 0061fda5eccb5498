import os, time, numpy as np
from hexl_fpga_tpu.ops import keyswitch_tpu
from hexl_fpga_tpu.utils import vectors
from hexl_fpga_tpu.utils.retry import call_with_retry

n, L, K, B = 16384, 6, 7, 32
vec = vectors.load_json(os.path.join("tests","testdata","16384_6_7_7_2_0.json.gz"))
ctx = keyswitch_tpu.get_context(n, L, K, L+1, 2, vec.moduli, vec.twiddle_factors)
ts = np.stack([vec.t_target_iter_ptr]*B); rs = np.stack([vec.input]*B)
# warm both paths + bit-exact
out = call_with_retry(ctx.run_batch, rs, ts, vec.key_vectors, vec.modswitch_factors)
np.testing.assert_array_equal(out[0], vec.expected_output)
os.environ["HEXL_TPU_WIRE_PACK"] = "1"
out = call_with_retry(ctx.run_batch, rs, ts, vec.key_vectors, vec.modswitch_factors)
np.testing.assert_array_equal(out[0], vec.expected_output)
print("packed path bit-exact OK", flush=True)

def pipelined(iters=4):
    from hexl_fpga_tpu.ops import wirepack, word64 as w
    packed = os.environ.get("HEXL_TPU_WIRE_PACK") == "1"
    t0=time.time()
    inflight = []
    for i in range(iters):
        if packed:
            o = ctx.dispatch_batch32p(rs, ts, vec.key_vectors, vec.modswitch_factors)
        else:
            o = ctx.dispatch_batch32(rs, ts, vec.key_vectors, vec.modswitch_factors)
        inflight.append(o)
        if len(inflight) > 1:
            x = np.asarray(inflight.pop(0))
            if packed: wirepack.unpack_np(x)
    for o in inflight:
        x = np.asarray(o)
        if packed: wirepack.unpack_np(x)
    dt=(time.time()-t0)/iters
    return B/dt

r_on = pipelined()
os.environ.pop("HEXL_TPU_WIRE_PACK")
r_off = pipelined()
print(f"pipelined e2e: packed {r_on:.1f} op/s vs unpacked {r_off:.1f} op/s", flush=True)
