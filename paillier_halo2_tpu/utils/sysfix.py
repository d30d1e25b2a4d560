"""Environment hardening for heavy XLA:CPU compilation.

XLA:CPU's LLVM JIT creates ~3 VM mappings per emitted code section and
dozens per compiled executable. A full prover run compiles hundreds of
executables; at the kernel default vm.max_map_count=65530 the process
eventually fails mmap ("LLVM compilation error: Cannot allocate memory")
and then segfaults inside compilation. Raising the limit needs root (true
in the containers this runs in); failure is ignored so unprivileged runs
just keep the default.
"""
from __future__ import annotations

_MAPS_TARGET = 1_048_576


def raise_map_count(target: int = _MAPS_TARGET) -> bool:
    """Best-effort bump of vm.max_map_count; True if the limit is >= target."""
    try:
        with open("/proc/sys/vm/max_map_count") as fh:
            current = int(fh.read())
        if current >= target:
            return True
        with open("/proc/sys/vm/max_map_count", "w") as fh:
            fh.write(str(target))
        return True
    except (OSError, PermissionError, ValueError):
        return False
