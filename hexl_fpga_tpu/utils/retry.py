"""Retry wrapper for flaky remote TPU kernel compilation.

Under the axon tunnel, Mosaic kernels compile in a terminal-side helper
process that intermittently dies (HTTP 500 / "tpu_compile_helper subprocess
exit code 1") under load; the same program compiles fine on retry.  Compiled
executables are cached by jax, so retries only ever pay the compile cost."""

from __future__ import annotations

import time


def call_with_retry(fn, *args, attempts: int = 4, delay_s: float = 2.0):
    last = None
    for i in range(attempts):
        try:
            return fn(*args)
        except Exception as e:  # jax.errors.JaxRuntimeError from remote compile
            msg = str(e)
            transient = "remote_compile" in msg or "tpu_compile_helper" in msg
            if not transient:
                raise
            last = e
            try:
                import jax

                jax.clear_caches()
            except Exception:
                pass
            time.sleep(delay_s * (i + 1))
    raise last
