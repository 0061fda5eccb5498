import os, numpy as np
import jax.numpy as jnp
from hexl_fpga_tpu.ops import keyswitch_tpu, word64 as w
from hexl_fpga_tpu.utils import vectors
from hexl_fpga_tpu.utils.retry import call_with_retry
from hexl_fpga_tpu.utils.timing import chain_timer

n, L, K, B = 16384, 6, 7, 32
vec = vectors.load_json(os.path.join("tests","testdata","16384_6_7_7_2_0.json.gz"))
ts = np.stack([vec.t_target_iter_ptr]*B); rs = np.stack([vec.input]*B)
t = w.to_pair_np(ts.reshape(B, L, n)); r = w.to_pair_np(rs.reshape(B, 2, L, n))
ctx = keyswitch_tpu.KeySwitchTpuContext(n, L, K, L+1, 2, vec.moduli,
                                        vec.twiddle_factors)
out = call_with_retry(ctx.run_batch, rs[:4], ts[:4], vec.key_vectors, vec.modswitch_factors)
np.testing.assert_array_equal(out[0], vec.expected_output)
print("approx-MAC + fused tail: bit-exact OK", flush=True)
keys = [jnp.asarray(x) for x in ctx.device_keys(vec.key_vectors)]
msf4 = jnp.asarray(ctx.prepare_msf4(vec.modswitch_factors))
def step(tlo, thi, rlo, rhi):
    olo, ohi = ctx._build(tlo, thi, *keys, rlo, rhi, msf4)
    return olo[:, 0], ohi[:, 0], olo, ohi
dt = chain_timer(step, (jnp.asarray(t[0]), jnp.asarray(t[1]),
                        jnp.asarray(r[0]), jnp.asarray(r[1])), i1=2, i2=8)
print(f"device {B/dt:.0f} op/s (prev fused-tail exact-MAC: 3091)", flush=True)
