"""Persistent XLA compilation cache.

First-compile dominates cold pipeline wall-clock (the 13-stage run on a
tiny clip spends minutes in XLA before the first frame moves; every
jitted stage recompiles in every fresh process). The reference never has
this problem only because its hot loops are interpreted Python + external
binaries. JAX's persistent compilation cache keeps compiled executables
on disk keyed by HLO fingerprint, so the second process reuses them.

``enable_compilation_cache`` is called by the pipeline orchestrator
(``compilation_cache`` config knob), ``bench.py`` and the training CLI.
Idempotent; safe to call after jax import but before first compile (a
late call simply misses already-compiled functions).
"""

from __future__ import annotations

import os
from typing import Optional

__all__ = ["enable_compilation_cache"]

_ENV = "ELVIS_TPU_COMPILE_CACHE"


def enable_compilation_cache(path: Optional[str] = None) -> Optional[str]:
    """Point JAX's persistent compilation cache at ``path`` (default:
    ``$ELVIS_TPU_COMPILE_CACHE`` or ``~/.cache/elvis_tpu_xla``).
    Returns the directory used, or None if the runtime refused."""
    import jax

    if path is None and os.environ.get(_ENV) == "off":
        # Hard opt-out. The test suite sets this: writing the persistent
        # cache (put_executable_and_time -> executable serialization)
        # segfaulted the CPython process three times in round-3 full-suite
        # runs, always in that frame, after ~150 tests of accumulated jit
        # state on the CPU test backend. Tests must not write user-level
        # caches anyway; the real-chip paths (pipeline, bench, training)
        # keep the cache on.
        return None
    path = path or os.environ.get(_ENV) or os.path.join(
        os.path.expanduser("~"), ".cache", "elvis_tpu_xla"
    )
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # cache everything that took noticeable compile time; tiny
        # entries are cheap to recompile and would churn the dir
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        return None
    return path
