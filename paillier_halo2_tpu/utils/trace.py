"""Structured per-phase timing/observability (SURVEY.md section 5: the
reference has only ad-hoc println! timers in its bench harness,
/root/reference/src/bench.rs:173-178; here phases log uniformly and can be
captured as JSON or as a jax.profiler trace).

Env switches:
  PAILLIER_TPU_TRACE=1            human-readable phase lines on stdout
  PAILLIER_TPU_TRACE_JSON=path    append one JSON object per phase to `path`
  PAILLIER_TPU_PROFILE=dir        wrap top-level sections in jax.profiler
"""
from __future__ import annotations

import json
import os
import time


class PhaseTimer:
    """Per-section phase marker. `mark(label)` logs time since construction;
    every mark also records a delta since the previous mark."""

    def __init__(self, section: str):
        self.section = section
        self.t0 = time.monotonic()
        self._last = self.t0
        self._stdout = bool(os.environ.get("PAILLIER_TPU_TRACE"))
        self._json_path = os.environ.get("PAILLIER_TPU_TRACE_JSON")

    def mark(self, label: str) -> None:
        now = time.monotonic()
        total, delta = now - self.t0, now - self._last
        self._last = now
        if self._stdout:
            print(f"[{self.section}] {label}: {total:.2f}s (+{delta:.2f}s)", flush=True)
        if self._json_path:
            with open(self._json_path, "a") as fh:
                fh.write(
                    json.dumps(
                        {
                            "section": self.section,
                            "phase": label,
                            "t_total_s": round(total, 4),
                            "t_delta_s": round(delta, 4),
                            "ts": time.time(),
                        }
                    )
                    + "\n"
                )


class profile_section:
    """Optional jax.profiler capture around a top-level section (no-op unless
    PAILLIER_TPU_PROFILE=<dir> is set)."""

    def __init__(self, name: str):
        self.dir = os.environ.get("PAILLIER_TPU_PROFILE")
        self.name = name
        self._ctx = None

    def __enter__(self):
        if self.dir:
            import jax

            self._ctx = jax.profiler.trace(
                os.path.join(self.dir, self.name), create_perfetto_link=False
            )
            self._ctx.__enter__()
        return self

    def __exit__(self, *exc):
        if self._ctx is not None:
            self._ctx.__exit__(*exc)
        return False
