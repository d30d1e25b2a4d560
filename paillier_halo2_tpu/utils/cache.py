"""Persistent XLA compilation cache setup.

This environment's XLA compiles even tiny programs in ~0.3-1s; the framework's
digit-arithmetic graphs contain thousands of fused ops, so cold compiles cost
minutes. Enabling the on-disk cache makes repeat runs (tests, benches) start
hot. Env vars alone are not picked up by this jax build — the config must be
set programmatically, hence this helper.
"""
from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(os.path.dirname(__file__), "..", "..", ".jax_cache")


def setup_compilation_cache(cache_dir: str | None = None) -> None:
    import jax

    if os.environ.get("PAILLIER_TPU_NO_CACHE"):
        jax.config.update("jax_enable_compilation_cache", False)
        return
    path = os.path.abspath(cache_dir or os.environ.get("JAX_COMPILATION_CACHE_DIR") or _DEFAULT_DIR)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
