"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Mirrors the reference's emulation-mode testing strategy (`RUN_CHOICE=1`,
`device/CMakeLists.txt:4-8`): the same kernels run on CPU so CI needs no
accelerator; multi-chip sharding is tested on a virtual device mesh.

Set HEXL_TPU_HW_TESTS=1 to leave the platform as configured (real TPU) and
enable tests/test_tpu_hw.py — the on-hardware validation tier.
"""

import os

import pytest

_HW = os.environ.get("HEXL_TPU_HW_TESTS") == "1"

if not _HW:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        flags = (flags + " --xla_force_host_platform_device_count=8").strip()
    # XLA:CPU's LLVM optimization pipeline takes 40+ MINUTES on the big
    # interpret-mode fused-keyswitch programs (measured, 1-core host) and
    # buys nothing here — the CPU tier checks exact integer CORRECTNESS,
    # not speed.  opt level 0 compiles the same program in ~30 s,
    # bit-identically (integer semantics don't depend on optimization).
    # The HW tier never sees this: it keeps the default pipeline.
    if "xla_backend_optimization_level" not in flags:
        flags = (flags + " --xla_backend_optimization_level=0").strip()
    os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

if not _HW:
    # jax may already be imported (site customization); the env var is then
    # ignored, so set the config knob too.
    jax.config.update("jax_platforms", "cpu")

from hexl_fpga_tpu.utils.cache import enable_compile_cache  # noqa: E402

# Persistent compilation cache: XLA CPU compiles of the big fused programs
# dominate suite time on small machines (60s+ each on one core); cached
# re-runs drop to ~1s per program.  Backend-gated (utils/cache.py): in the
# HW tier (real TPU) cache writes stall compiles, so it stays off there.
enable_compile_cache(os.path.dirname(os.path.dirname(__file__)))


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "heavy: compile-heavy tier (big shapes / full sweeps); skipped "
        "unless HEXL_TPU_HEAVY_TESTS=1 — the fast tier keeps a smaller "
        "variant of every code path",
    )


def pytest_collection_modifyitems(config, items):
    if os.environ.get("HEXL_TPU_HEAVY_TESTS") == "1":
        return
    skip = pytest.mark.skip(
        reason="heavy tier: set HEXL_TPU_HEAVY_TESTS=1 to run"
    )
    for item in items:
        if "heavy" in item.keywords:
            item.add_marker(skip)
