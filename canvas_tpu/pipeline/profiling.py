"""Per-stage timing + structured run metrics (SURVEY.md §5).

The reference scatters timestamped Console.WriteLine progress lines and two
Stopwatch timers; here every stage runs under a `stage(...)` context that
records wall time, device sync time, and peak RSS into a run-wide report
that the orchestrator writes as JSON next to the outputs.  JAX's own
profiler can be layered on demand via `trace(...)`.
"""

from __future__ import annotations

import contextlib
import json
import resource
import time
from dataclasses import dataclass, field
from pathlib import Path


@dataclass
class StageRecord:
    name: str
    seconds: float
    peak_rss_mb: float
    extra: dict = field(default_factory=dict)


@dataclass
class RunProfile:
    records: list[StageRecord] = field(default_factory=list)
    started: float = field(default_factory=time.time)
    # optional stage-boundary hook (the workflows install
    # Checkpointer.stage here so -c/-s start/stop-checkpoint flags see
    # every stage transition; raising from it aborts the workflow)
    gate: object = None

    @contextlib.contextmanager
    def stage(self, name: str, **extra):
        if self.gate is not None:
            self.gate(name)
        t0 = time.perf_counter()
        try:
            yield self
        finally:
            dt = time.perf_counter() - t0
            rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
            self.records.append(StageRecord(name, dt, rss, extra))

    def note(self, name: str, **extra) -> None:
        self.records.append(StageRecord(name, 0.0, 0.0, extra))

    def report(self) -> dict:
        return {
            "total_seconds": time.time() - self.started,
            "stages": [
                {"name": r.name, "seconds": round(r.seconds, 3),
                 "peak_rss_mb": round(r.peak_rss_mb, 1), **r.extra}
                for r in self.records
            ],
        }

    def write(self, path: str | Path) -> None:
        Path(path).write_text(json.dumps(self.report(), indent=2) + "\n")


@contextlib.contextmanager
def trace(log_dir: str | Path):
    """JAX profiler trace around a block (view with TensorBoard/xprof)."""
    import jax

    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


_ACTIVE: RunProfile | None = None


def current() -> RunProfile:
    global _ACTIVE
    if _ACTIVE is None:
        _ACTIVE = RunProfile()
    return _ACTIVE


def reset() -> RunProfile:
    global _ACTIVE
    _ACTIVE = RunProfile()
    return _ACTIVE
