"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Mirrors the reference's emulation-mode testing strategy (`RUN_CHOICE=1`,
`device/CMakeLists.txt:4-8`): the same kernels run on CPU so CI needs no
accelerator; multi-chip sharding is tested on a virtual device mesh.

Set HEXL_TPU_HW_TESTS=1 to leave the platform as configured (real TPU) and
enable tests/test_tpu_hw.py — the on-hardware validation tier.
"""

import os

_HW = os.environ.get("HEXL_TPU_HW_TESTS") == "1"

if not _HW:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

if not _HW:
    # jax may already be imported (site customization); the env var is then
    # ignored, so set the config knob too.
    jax.config.update("jax_platforms", "cpu")
