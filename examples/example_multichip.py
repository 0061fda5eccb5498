"""Multi-chip sharding example: batch-sharded NTT and a limb-sharded
KeySwitch over a device mesh.

On a real TPU slice, run as-is (the mesh picks up all attached chips).
Without one, a virtual 8-device CPU mesh demonstrates the same program:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/example_multichip.py

The sharding axes mirror the reference's parallelism (SURVEY.md §2.4):
'dp' = the host-side op batching / compute-unit replication, 'mp' = the
7-parallel-RNS-engine axis of the keyswitch pipeline.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from hexl_fpga_tpu.ops import golden, nt, word64 as w
    from hexl_fpga_tpu.parallel import sharded
    from hexl_fpga_tpu.utils import vectors

    devs = jax.devices()
    if len(devs) < 2:
        devs = jax.devices("cpu")
    n_dev = len(devs)
    print(f"{n_dev} x {devs[0].platform} devices")

    # --- batch-sharded forward NTT over 'dp' (zero collectives) -----------
    n = 1024
    q = int(nt.generate_primes(1, 45, n)[0])
    mesh = Mesh(np.array(devs), ("dp",))
    fn = sharded.batch_sharded_fwd_ntt(mesh, "dp", n, q)
    rng = np.random.default_rng(0)
    a = rng.integers(0, q, size=(2 * n_dev, n), dtype=np.uint64)
    lo, hi = w.to_pair_np(a)
    olo, ohi = fn(jnp.asarray(lo), jnp.asarray(hi))
    out = w.from_pair_np(np.asarray(olo), np.asarray(ohi))
    np.testing.assert_array_equal(out, golden.fwd_ntt(a, q))
    print(f"batch-sharded NTT over dp={n_dev}: bit-exact")

    # --- RNS-limb-sharded KeySwitch over 'mp' -----------------------------
    L, K = 2, 3
    vec = vectors.make_keyswitch_vector(n, L, K, seed=0, modulus_bits=45)
    mp_mesh = Mesh(np.array(devs), ("mp",))
    ks = sharded.ShardedKeySwitch(mp_mesh, "mp", None, n, L, K, vec.moduli)
    got = ks.run(
        vec.input[None], vec.t_target_iter_ptr[None],
        vec.key_vectors, vec.modswitch_factors,
    )
    np.testing.assert_array_equal(got[0], vec.expected_output)
    print(f"limb-sharded KeySwitch over mp={n_dev}: bit-exact")

    # --- coefficient-sharded NTT ('sp', the long-polynomial seam) ---------
    if (n // 128) % n_dev == 0 and n_dev >= 2:
        dfn = sharded.dist_fwd_ntt_mxu(mp_mesh := Mesh(np.array(devs), ("sp",)),
                                       "sp", n, q)
        olo, ohi = dfn(jnp.asarray(lo[:2]), jnp.asarray(hi[:2]))
        out = w.from_pair_np(np.asarray(olo), np.asarray(ohi))
        np.testing.assert_array_equal(out, golden.fwd_ntt(a[:2], q))
        print(f"coefficient-sharded MXU NTT over sp={n_dev}: bit-exact")


if __name__ == "__main__":
    main()
