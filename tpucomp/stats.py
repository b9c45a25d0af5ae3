"""Observability: per-run stats and optional device profiling.

SURVEY.md §5: the reference exposes status codes only; the new framework
adds structured per-run stats (ratio, throughput, per-format counters)
and jax.profiler-based tracing for the device pipelines.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import Dict, Optional


@dataclass
class RunStats:
    fmt: str = ""
    in_bytes: int = 0
    out_bytes: int = 0
    units: int = 0
    stored_raw_units: int = 0
    wall_s: float = 0.0

    @property
    def ratio(self) -> float:
        return self.out_bytes / self.in_bytes if self.in_bytes else 0.0

    @property
    def gbps(self) -> float:
        return self.in_bytes / self.wall_s / 1e9 if self.wall_s else 0.0

    def as_dict(self) -> Dict:
        return {
            "fmt": self.fmt,
            "in_bytes": self.in_bytes,
            "out_bytes": self.out_bytes,
            "units": self.units,
            "stored_raw_units": self.stored_raw_units,
            "wall_s": round(self.wall_s, 6),
            "ratio": round(self.ratio, 6),
            "GBps": round(self.gbps, 6),
        }


@contextlib.contextmanager
def timed(stats: RunStats):
    t0 = time.perf_counter()
    try:
        yield stats
    finally:
        stats.wall_s += time.perf_counter() - t0


@contextlib.contextmanager
def device_trace(logdir: Optional[str] = None):
    """jax.profiler trace scope (perfetto dump) when a logdir is given."""
    if logdir:
        import jax

        jax.profiler.start_trace(logdir)
        try:
            yield
        finally:
            jax.profiler.stop_trace()
    else:
        yield
