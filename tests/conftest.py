"""Test configuration: force an 8-device virtual CPU mesh.

The reference's tests run single-process on CPU (cargo test); ours additionally
exercise multi-chip sharding, which JAX lets us fake on CPU via
--xla_force_host_platform_device_count (SURVEY.md section 4).

Note: this environment pre-imports jax in sitecustomize with the remote
'axon' TPU platform, so env vars alone are too late — the platform must be
overridden through jax.config before any backend initializes. The remote TPU
has high per-dispatch latency (it is a tunnel), so unit tests run on local
CPU; only benches target the real chip.

Round-1 -> round-2 robustness changes (VERDICT item 4):
- the persistent compilation cache is OFF by default for tests (its write
  path segfaulted XLA:CPU in the driver sandbox); opt back in with
  PAILLIER_TPU_CACHE=1.
- the blanket --xla_disable_hlo_passes=fusion is gone: disabling fusion made
  LLVM blow up (OOM/segfault) compiling the big prover graphs, which is worse
  than the fusion slowdown it avoided. Heavy point-op tests shrink their
  geometry instead.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# 8 virtual device threads time-share ~4 cores: a device can sit in a
# collective rendezvous for minutes while the others' long per-shard programs
# (e.g. the MSM bucket loop) finish. XLA:CPU hard-aborts such rendezvous after
# 40s by default — raise both timeouts far above any test's runtime.
if "collective_call_terminate" not in flags:
    flags = (
        flags + " --xla_cpu_collective_call_warn_stuck_timeout_seconds=600"
        " --xla_cpu_collective_call_terminate_timeout_seconds=7200"
    ).strip()
os.environ["XLA_FLAGS"] = flags
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402  (already imported by sitecustomize; config still open)

jax.config.update("jax_platforms", "cpu")

# Persistent compile cache ON by default: XLA:CPU compiles of the prover
# graphs dominate suite wall time; repeat runs start hot. (The round-1 "cache
# segfault" was vm.max_map_count exhaustion — fixed below — not the cache.)
if os.environ.get("PAILLIER_TPU_NO_CACHE"):
    jax.config.update("jax_enable_compilation_cache", False)
else:
    from paillier_halo2_tpu.utils.cache import setup_compilation_cache  # noqa: E402

    setup_compilation_cache()

os.environ.setdefault("PAILLIER_TPU_MSM_WINDOW", "4")

# XLA:CPU's LLVM JIT maps ~3 VM regions per code section, dozens per compiled
# executable; the prover path compiles hundreds of executables, and at the
# kernel default vm.max_map_count=65530 mmap starts failing ("LLVM compilation
# error: Cannot allocate memory") followed by a hard segfault. Two defenses:
# raise the limit when we can (containers usually run tests as root), and
# drop dead executables between test modules.
from paillier_halo2_tpu.utils.sysfix import raise_map_count  # noqa: E402

raise_map_count()

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    yield
    jax.clear_caches()
