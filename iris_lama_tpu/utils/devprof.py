"""On-device timing through jax.profiler (works over the axon tunnel —
verified r4; the trace carries real per-fusion device times, immune to
the ~25 ms host sync cost that poisons wall-clock micro-benchmarks).

Usage:
    ms = device_time_ms(jitted_fn, args_fn, n=4)

``args_fn(k)`` returns the argument tuple for invocation k (vary a value
per call — the runtime serves value-identical dispatches from a cache).
Returns the median device time of the jit region across invocations.
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import tempfile

import jax


def _jit_events(trace_dir):
    out = []
    for path in glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                          recursive=True):
        with gzip.open(path) as f:
            d = json.load(f)
        for e in d.get("traceEvents", []):
            name = e.get("name", "")
            if e.get("dur") and name.startswith("jit_"):
                out.append((name, e["dur"] / 1e3))
    return out


def device_time_ms(fn, args_fn, n: int = 4):
    """Median on-device ms of ``fn``'s jit region over n varied calls."""
    out = fn(*args_fn(59999))
    jax.block_until_ready(out)
    with tempfile.TemporaryDirectory() as td:
        with jax.profiler.trace(td):
            outs = [fn(*args_fn(k)) for k in range(n)]
            jax.block_until_ready(outs)
        evs = _jit_events(td)
    durs = sorted(ms for _, ms in evs)
    if not durs:
        return float("nan")
    return durs[len(durs) // 2]


def device_breakdown(fn, args_fn, n: int = 2, top: int = 12):
    """(name, ms) rows of the largest device events for ``fn``."""
    out = fn(*args_fn(59999))
    jax.block_until_ready(out)
    rows = []
    with tempfile.TemporaryDirectory() as td:
        with jax.profiler.trace(td):
            outs = [fn(*args_fn(k)) for k in range(n)]
            jax.block_until_ready(outs)
        for path in glob.glob(os.path.join(td, "**", "*.trace.json.gz"),
                              recursive=True):
            with gzip.open(path) as f:
                d = json.load(f)
            for e in d.get("traceEvents", []):
                if e.get("dur") and not str(e.get("name", "")).startswith("$"):
                    rows.append((e["name"], e["dur"] / 1e3))
    rows.sort(key=lambda r: -r[1])
    return rows[:top]
