"""Profiling probes (replaces the reference's ENABLE_PROFILE hooks).

The reference wraps hot sections with the libobs profiler when compiled
with ENABLE_PROFILE (reference CMakeLists.txt:15, src/common.c:10-21);
here the same probe names become ``jax.profiler.TraceAnnotation`` scopes
plus lightweight host-side timing counters, always available and
switchable at runtime.
"""

from __future__ import annotations

import contextlib
import threading
import time
from collections import defaultdict

import jax

_enabled = False
_stats: dict[str, list[float]] = defaultdict(list)
_lock = threading.Lock()


def enable(on: bool = True) -> None:
    global _enabled
    _enabled = on


def reset() -> None:
    with _lock:
        _stats.clear()


def summary() -> dict[str, dict[str, float]]:
    """Per-probe count/total/mean seconds."""
    with _lock:
        return {
            k: {
                "count": len(v),
                "total_s": sum(v),
                "mean_s": sum(v) / len(v) if v else 0.0,
            }
            for k, v in _stats.items()
        }


@contextlib.contextmanager
def probe(name: str):
    """Named probe (probe names mirror the reference's:
    'render_target', 'convert_yuv', 'draw_vectorscope', ...)."""
    if not _enabled:
        yield
        return
    t0 = time.perf_counter()
    with jax.profiler.TraceAnnotation(name):
        yield
    dt = time.perf_counter() - t0
    with _lock:
        _stats[name].append(dt)


def start_trace(log_dir: str) -> None:
    """Full device trace (view with TensorBoard/XProf)."""
    jax.profiler.start_trace(log_dir)


def stop_trace() -> None:
    jax.profiler.stop_trace()
