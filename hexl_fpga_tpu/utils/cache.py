"""Persistent XLA compile-cache enabling, gated on the actual backend.

On the CPU backend the cache demonstrably works (60 s compiles -> ~1 s
re-runs; it is what keeps the test suite fast on this 1-core host).  On
the tunneled TPU backend, cache WRITES stall the first compile by ~10
minutes (twice reproduced) without speeding re-runs — so the cache is
enabled only when the process's default backend is CPU, unless forced
(callers that explicitly compile CPU-only programs, e.g. the multichip
dryrun's virtual mesh).  Env overrides: HEXL_TPU_NO_COMPILE_CACHE=1
always off; HEXL_TPU_COMPILE_CACHE=1 always on.
"""

from __future__ import annotations

import hashlib
import os


def _host_fingerprint() -> str:
    """Short digest of the host CPU's feature flags.

    XLA:CPU caches AOT-compiled machine code; entries produced on a host
    with different ISA extensions are rejected at load time with a
    machine-feature mismatch (risking SIGILL if forced), and the rejection
    path is slower than a cold compile.  Salting the cache directory with
    the flags digest makes a migrated/retyped host start a fresh cache
    instead of churning through every stale entry."""
    flags = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        pass
    return hashlib.sha256(flags.encode()).hexdigest()[:12]


def enable_compile_cache(repo_root: str, force: bool = False) -> bool:
    if os.environ.get("HEXL_TPU_NO_COMPILE_CACHE") == "1":
        return False
    try:
        import jax

        if (not force
                and os.environ.get("HEXL_TPU_COMPILE_CACHE") != "1"
                and jax.default_backend() != "cpu"):
            return False
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get(
                "HEXL_TPU_COMPILE_CACHE_DIR",
                os.path.join(repo_root, ".jax_cache", _host_fingerprint()),
            ),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        try:
            jax.config.update("jax_persistent_cache_enable_xla_caches", "all")
        except Exception:  # older jax: knob absent
            pass
        return True
    except Exception:
        return False
