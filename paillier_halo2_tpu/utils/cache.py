"""Persistent XLA compilation cache setup.

This environment's XLA compiles even tiny programs in ~0.3-1s; the framework's
digit-arithmetic graphs contain thousands of fused ops, so cold compiles cost
minutes. Enabling the on-disk cache makes repeat runs (tests, benches) start
hot. Env vars alone are not picked up by this jax build — the config must be
set programmatically, hence this helper.

The cache directory is keyed by a machine fingerprint (CPU flags + platform):
XLA:CPU cache entries embed AOT-compiled code whose target machine features
are NOT part of XLA's cache key, so a cache written on one box poisons runs
on another ("Loading XLA:CPU AOT result ... doesn't match the machine type
for execution", seen in the round-2 driver run, which shares this workspace
across machines). Fingerprinting the directory makes each machine see only
its own entries.
"""
from __future__ import annotations

import hashlib
import os
import platform

_DEFAULT_BASE = os.path.join(os.path.dirname(__file__), "..", "..", ".jax_cache")


def _machine_fingerprint() -> str:
    h = hashlib.blake2b(digest_size=8)
    h.update(platform.machine().encode())
    try:
        with open("/proc/cpuinfo", "rb") as fh:
            for line in fh:
                if line.startswith((b"flags", b"model name")):
                    h.update(line)
                    break
            for line in fh:
                if line.startswith(b"flags"):
                    h.update(line)
                    break
    except OSError:
        h.update(platform.processor().encode())
    # cpuinfo flags can match across boxes whose effective LLVM target
    # features still differ (hypervisors mask amx/avx10 inconsistently) —
    # the round-2 dryrun hit exactly that ("Machine type used for XLA:CPU
    # compilation doesn't match"). Key per physical box too.
    for ident in ("/etc/machine-id", "/proc/sys/kernel/hostname"):
        try:
            with open(ident, "rb") as fh:
                h.update(fh.read())
        except OSError:
            pass
    return h.hexdigest()


def setup_compilation_cache(cache_dir: str | None = None) -> None:
    import jax

    if os.environ.get("PAILLIER_TPU_NO_CACHE"):
        jax.config.update("jax_enable_compilation_cache", False)
        return
    base = os.path.abspath(
        cache_dir or os.environ.get("JAX_COMPILATION_CACHE_DIR") or _DEFAULT_BASE
    )
    path = os.path.join(base, _machine_fingerprint())
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
