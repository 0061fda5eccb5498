"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Mirrors the reference's emulation-mode testing strategy (`RUN_CHOICE=1`,
`device/CMakeLists.txt:4-8`): the same kernels run on CPU so CI needs no
accelerator; multi-chip sharding is tested on a virtual device mesh.
"""

import os

# Force the CPU backend (override any preset accelerator platform): tests are
# the emulation tier; real-hardware validation happens in bench.py.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# jax may already be imported (site customization); the env var is then
# ignored, so set the config knob too.
import jax

jax.config.update("jax_platforms", "cpu")
