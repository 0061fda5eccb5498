import os, time, numpy as np
import jax.numpy as jnp
from hexl_fpga_tpu.ops import keyswitch_tpu
from hexl_fpga_tpu.utils import vectors
from hexl_fpga_tpu.utils.retry import call_with_retry
from hexl_fpga_tpu.utils.timing import chain_timer
from hexl_fpga_tpu.ops import word64 as w

# 1. small config on HW: fused tail correctness (SMEM spec must pass Mosaic)
vec = vectors.make_keyswitch_vector(1024, 2, 3, seed=0, modulus_bits=45)
ctx = keyswitch_tpu.KeySwitchTpuContext(1024, 2, 3, 3, 2, vec.moduli,
                                        vec.twiddle_factors, tile_p=2)
got = call_with_retry(ctx.run, vec.input, vec.t_target_iter_ptr,
                      vec.key_vectors, vec.modswitch_factors)
np.testing.assert_array_equal(got, vec.expected_output)
print("n=1024 fused-tail HW bit-exact OK", flush=True)

# 2. flagship A/B: device chain rate fused vs unfused
n, L, K, B = 16384, 6, 7, 32
vec = vectors.load_json(os.path.join("tests","testdata","16384_6_7_7_2_0.json.gz"))
ts = np.stack([vec.t_target_iter_ptr]*B); rs = np.stack([vec.input]*B)
t = w.to_pair_np(ts.reshape(B, L, n)); r = w.to_pair_np(rs.reshape(B, 2, L, n))
for fused in (True, False):
    ctx = keyswitch_tpu.KeySwitchTpuContext(n, L, K, L+1, 2, vec.moduli,
                                            vec.twiddle_factors, fused_tail=fused)
    out = call_with_retry(ctx.run_batch, rs[:4], ts[:4], vec.key_vectors, vec.modswitch_factors)
    np.testing.assert_array_equal(out[0], vec.expected_output)
    print(f"fused_tail={fused}: bit-exact OK", flush=True)
    keys = [jnp.asarray(x) for x in ctx.device_keys(vec.key_vectors)]
    msf4 = jnp.asarray(ctx.prepare_msf4(vec.modswitch_factors))
    def step(tlo, thi, rlo, rhi):
        olo, ohi = ctx._build(tlo, thi, *keys, rlo, rhi, msf4)
        return olo[:, 0], ohi[:, 0], olo, ohi
    dt = chain_timer(step, (jnp.asarray(t[0]), jnp.asarray(t[1]),
                            jnp.asarray(r[0]), jnp.asarray(r[1])), i1=2, i2=8)
    print(f"fused_tail={fused}: device {B/dt:.0f} op/s", flush=True)
