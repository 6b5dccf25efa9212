"""Shared measurement helpers for the benchmark/sweep scripts.

Two primitives, per doc/performance.md Methodology:

* slope(...)      — wall-clock batch slope: time a jitted fori_loop at n
                    and 2n iterations; (t(2n)-t(n))/n cancels the tunnel
                    round trip exactly.
* op_profile(...) — xprof `op_profile` leaf-op device times for one loop
                    program (the only trustworthy sub-chain numbers on
                    the tunneled dev setup).

Both take a `build(n) -> jitted fn(*args)` factory so each script keeps
its own loop body (anti-hoist + checksum choices are measurement-specific
and documented where they differ).
"""
import glob
import json
import shutil
import time

import numpy as np


def best_of(fn, args, reps: int = 3) -> float:
    """Compile+warm, then best wall time of `reps` runs (seconds)."""
    _ = np.asarray(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = np.asarray(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def slope_ms(build, args, n: int, reps: int = 5) -> float:
    """Per-iteration wall cost in ms via the two-batch slope.

    The two batch sizes are timed INTERLEAVED rep-by-rep (each keeping
    its own minimum): the shared dev TPU drifts between fast/slow states
    over minutes, and timing all n-reps then all 2n-reps lets a state
    change between the blocks skew the slope (see bench.py)."""
    f1, f2 = build(n), build(2 * n)
    _ = np.asarray(f1(*args))  # compile + warmup
    _ = np.asarray(f2(*args))
    t1 = t2 = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = np.asarray(f1(*args))
        t1 = min(t1, time.perf_counter() - t0)
        t0 = time.perf_counter()
        _ = np.asarray(f2(*args))
        t2 = min(t2, time.perf_counter() - t0)
    return (t2 - t1) / n * 1e3


def op_profile_rows(run, args, n: int, trace_dir: str):
    """Run `run(*args)` under jax.profiler, return [(ms_per_iter, op_name)]
    sorted by descending time (leaf ops of the xprof op_profile tree)."""
    import jax

    _ = np.asarray(run(*args))
    shutil.rmtree(trace_dir, ignore_errors=True)
    with jax.profiler.trace(trace_dir):
        _ = np.asarray(run(*args))

    from xprof.convert import raw_to_tool_data as rtd

    data, _m = rtd.xspace_to_tool_data(
        glob.glob(trace_dir + "/plugins/profile/*/*.xplane.pb"),
        "op_profile", {},
    )
    rows = []

    def walk(node):
        m = node.get("metrics", {})
        if m.get("occurrences") and not node.get("children"):
            rows.append((m.get("rawTime", 0) / (n * 1e9), node.get("name", "?")))
        for c in node.get("children", []):
            walk(c)

    walk(json.loads(data).get("byProgram", {}))
    rows.sort(reverse=True)
    return rows
