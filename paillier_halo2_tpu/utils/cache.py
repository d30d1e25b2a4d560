"""Persistent XLA compilation cache setup.

This environment's XLA compiles even tiny programs in ~0.3-1s; the framework's
digit-arithmetic graphs contain thousands of fused ops, so cold compiles cost
minutes. Enabling the on-disk cache makes repeat runs (tests, benches) start
hot. Env vars alone are not picked up by this jax build — the config must be
set programmatically, hence this helper.

Cache entries have very different portability per backend, so the directory
is split by backend:

- **TPU (axon) executables are host-portable**: they target the TPU, not the
  host CPU, so one shared `tpu/` dir serves every machine that shares this
  workspace. This is what keeps the driver's end-of-round bench warm (its
  round-2 MSM "first call" was 15 s — clearly served from entries written by
  earlier builder runs on a different host).
- **XLA:CPU entries embed AOT host code** whose LLVM target features are NOT
  part of XLA's cache key; an entry written on one box poisons runs on
  another ("Loading XLA:CPU AOT result ... doesn't match the machine type
  for execution", seen in the round-2 driver run — and machine-id/hostname
  fingerprints do NOT discriminate, because the container image bakes them
  while the VMs' CPUID-derived LLVM tuning, e.g. +prefer-no-gather, still
  differs). boot_id is unique per VM boot, so a `cpu-<boot>` dir can only be
  reused by the very boot that wrote it: entries are machine-compatible by
  construction. Cost: each fresh VM's CPU paths start cold — acceptable; the
  compile-lean lowerings (utils/lean.py) keep cold starts in minutes.
"""
from __future__ import annotations

import hashlib
import os

_DEFAULT_BASE = os.path.join(os.path.dirname(__file__), "..", "..", ".jax_cache")


def _boot_fingerprint() -> str:
    h = hashlib.blake2b(digest_size=8)
    for ident in (
        "/proc/sys/kernel/random/boot_id",
        "/etc/machine-id",
        "/proc/sys/kernel/hostname",
    ):
        try:
            with open(ident, "rb") as fh:
                h.update(fh.read())
        except OSError:
            pass
    # CPU model + feature flags: XLA:CPU AOT code embeds LLVM target features
    # derived from CPUID, which are NOT in XLA's own cache key — and boot_id
    # alone proved insufficient across this workspace's VMs (round-3/4 logs:
    # "+prefer-no-gather is not supported on the host machine" while reusing
    # a cpu-<boot> dir). Mixing CPUID-derived lines into the fingerprint
    # makes cache dirs machine-feature-compatible by construction.
    try:
        with open("/proc/cpuinfo", "rb") as fh:
            for line in fh:
                if line.startswith((b"model name", b"flags")):
                    h.update(line)
                    break  # first core is representative
            for line in fh:
                if line.startswith(b"flags"):
                    h.update(line)
                    break
    except OSError:
        pass
    return h.hexdigest()


def setup_compilation_cache(cache_dir: str | None = None) -> None:
    """Pick the cache dir for the ACTIVE backend — call only after the
    intended platform is decided (tests/dryrun force CPU first; the bench
    runs on the axon TPU plugin)."""
    import jax

    if os.environ.get("PAILLIER_TPU_NO_CACHE"):
        jax.config.update("jax_enable_compilation_cache", False)
        return
    base = os.path.abspath(
        cache_dir or os.environ.get("JAX_COMPILATION_CACHE_DIR") or _DEFAULT_BASE
    )
    try:
        on_cpu = jax.default_backend() == "cpu"
    except Exception:
        on_cpu = True
    if on_cpu:
        path = os.path.join(base, f"cpu-{_boot_fingerprint()}")
        # Drop STALE cpu-* dirs (and the legacy 16-hex fingerprint dirs from
        # rounds 1-3): their AOT host code is useless (possibly
        # SIGILL-dangerous) here, and the workspace persists across VMs —
        # without this the cache also grows forever. Cleanup is deliberately
        # conservative (ADVICE r3): only in the repo-default base (a
        # user-supplied JAX_COMPILATION_CACHE_DIR may be shared with other
        # projects), and only names matching the known cache-dir patterns —
        # never the shared portable tpu/ dir, never unrelated directories.
        # NOTE: a concurrently *live* cpu-<other-boot> dir on a different VM
        # sharing this workspace would still be removed; acceptable here
        # because each VM re-creates its dir on demand (cache miss, not data
        # loss) and the builder/driver do not run cross-VM concurrently.
        def _is_stale_cpu_cache(name: str) -> bool:
            if name.startswith("cpu-"):
                return True
            return len(name) == 16 and all(c in "0123456789abcdef" for c in name)

        if base == os.path.abspath(_DEFAULT_BASE):
            try:
                for d in os.listdir(base):
                    full = os.path.join(base, d)
                    if full != path and os.path.isdir(full) and _is_stale_cpu_cache(d):
                        import shutil

                        shutil.rmtree(full, ignore_errors=True)
            except OSError:
                pass
    else:
        path = os.path.join(base, "tpu")
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
