"""Per-stage decode tracing (SURVEY §5.1).

The reference has no built-in tracer and relies on external cachegrind
runs (CI/profiling.sh); here per-stage wall time is accumulated in
process so `python -m openvvc_tpu --trace` (or OPENVVC_TRACE=1) can
print a decode-stage breakdown after any run. Spans are cheap enough to
leave in the hot path: a no-op context manager when disabled.
"""

from __future__ import annotations

import os
import threading
import time
from collections import defaultdict

ENABLED = bool(int(os.environ.get("OPENVVC_TRACE", "0")))

_stats: dict[str, float] = defaultdict(float)
_counts: dict[str, int] = defaultdict(int)
_lock = threading.Lock()


class _Span:
    __slots__ = ("name", "t0")

    def __init__(self, name: str):
        self.name = name

    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self.t0
        with _lock:
            _stats[self.name] += dt
            _counts[self.name] += 1
        return False


class _NoSpan:
    __slots__ = ()

    def __init__(self, name: str):
        pass

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False


def enable() -> None:
    global span, ENABLED
    ENABLED = True
    span = _Span


span = _Span if ENABLED else _NoSpan


def stats() -> dict[str, tuple[float, int]]:
    """{stage: (total_seconds, calls)}"""
    with _lock:
        return {k: (_stats[k], _counts[k]) for k in _stats}


def reset() -> None:
    with _lock:
        _stats.clear()
        _counts.clear()


def report(out=None) -> None:
    import sys

    out = out or sys.stderr
    total = sum(v for v, _ in stats().values())
    for name, (sec, n) in sorted(stats().items(), key=lambda kv: -kv[1][0]):
        out.write(f"{name:24s} {sec * 1e3:9.1f} ms  ({n} calls, "
                  f"{sec / max(n, 1) * 1e3:7.2f} ms/call)\n")
    out.write(f"{'(sum of stages)':24s} {total * 1e3:9.1f} ms\n")
