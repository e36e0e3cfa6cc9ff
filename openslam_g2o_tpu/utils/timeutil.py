"""Timing utilities: monotonic time, scoped timers, tictoc profiling.

Re-implements g2o/stuff/timeutil.h (get_monotonic_time :107, ScopeTime
:69-128) and g2o/stuff/tictoc.h:42-60 (pairwise scoped profiler activated by
the G2O_ENABLE_TICTOC environment variable).
"""
from __future__ import annotations

import os
import time
from collections import defaultdict
from contextlib import contextmanager

__all__ = ["get_monotonic_time", "ScopeTime", "scope_time", "tictoc",
           "tictoc_stats", "tictoc_print", "tictoc_reset"]


def get_monotonic_time() -> float:
    return time.monotonic()


class ScopeTime:
    """Prints the elapsed time of a scope (timeutil.h:69-94); usable as a
    context manager."""

    def __init__(self, title: str = ""):
        self.title = title
        self.t0 = get_monotonic_time()

    def __enter__(self):
        self.t0 = get_monotonic_time()
        return self

    def __exit__(self, *exc):
        import sys
        print(f"{self.title or 'ScopeTime'} took {self.elapsed():.6f} s",
              file=sys.stderr)
        return False

    def elapsed(self) -> float:
        return get_monotonic_time() - self.t0


scope_time = ScopeTime

_enabled = os.environ.get("G2O_ENABLE_TICTOC", "") not in ("", "0")
_stats = defaultdict(lambda: {"calls": 0, "total": 0.0, "min": float("inf"),
                              "max": 0.0})
_starts: dict = {}


def tictoc(tag: str) -> float:
    """Pairwise profiler: the first call with `tag` starts the clock, the
    second stops it and records the interval (tictoc.h:52). Returns the
    elapsed time on the stopping call, else 0. No-op unless
    G2O_ENABLE_TICTOC is set."""
    if not _enabled:
        return 0.0
    now = get_monotonic_time()
    if tag not in _starts:
        _starts[tag] = now
        return 0.0
    dt = now - _starts.pop(tag)
    s = _stats[tag]
    s["calls"] += 1
    s["total"] += dt
    s["min"] = min(s["min"], dt)
    s["max"] = max(s["max"], dt)
    return dt


def tictoc_stats():
    return {k: dict(v) for k, v in _stats.items()}


def tictoc_print():
    import sys
    for tag, s in sorted(_stats.items(), key=lambda kv: -kv[1]["total"]):
        mean = s["total"] / max(s["calls"], 1)
        print(f"TICTOC {tag:24s} calls={s['calls']:6d} total={s['total']:.4f} "
              f"mean={mean:.6f} min={s['min']:.6f} max={s['max']:.6f}",
              file=sys.stderr)


def tictoc_reset():
    _stats.clear()
    _starts.clear()
