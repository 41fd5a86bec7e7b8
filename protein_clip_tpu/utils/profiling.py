"""Tracing / profiling subsystem (absent in the reference, SURVEY.md §5).

- ``trace(logdir)``: context manager around jax.profiler for TensorBoard /
  Perfetto traces of train steps.
- ``StepTimer``: wall-clock step timing with host-sync (the axon TPU tunnel
  returns before execution completes, so a device value must be fetched —
  see .claude/skills/verify/SKILL.md) and pairs/sec accounting, emitted as
  JSONL next to the run metrics.
- ``nan_debug()``: enables jax_debug_nans for a scope — the functional
  substitute for the reference's cudnn-off determinism belt-and-braces.
"""

from __future__ import annotations

import contextlib
import json
import time
from pathlib import Path

import jax


@contextlib.contextmanager
def trace(logdir: str | Path):
    jax.profiler.start_trace(str(logdir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def nan_debug(enable: bool = True):
    prev = jax.config.read("jax_debug_nans")
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


class StepTimer:
    """Times steps (sync via a fetched scalar) and logs pairs/sec."""

    def __init__(self, pairs_per_step: int, out_path: str | Path | None = None):
        self.pairs_per_step = pairs_per_step
        self.out_path = Path(out_path) if out_path else None
        self.times: list[float] = []
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, sync_value=None) -> float:
        if sync_value is not None:
            float(sync_value)  # force device->host completion
        dt = time.perf_counter() - self._t0
        self.times.append(dt)
        if self.out_path:
            with open(self.out_path, "a") as f:
                f.write(json.dumps({
                    "step": len(self.times), "seconds": dt,
                    "pairs_per_sec": self.pairs_per_step / dt,
                }) + "\n")
        return dt

    @property
    def pairs_per_sec(self) -> float:
        if not self.times:
            return 0.0
        best = min(self.times)
        return self.pairs_per_step / best
