"""Profiler-derived DEVICE time for a thunk — the host-noise-free metric.

Wall-clock benchmarks on this harness's remoted TPU mix device time with
tunnel/dispatch latency, so cross-run swings (e.g. the r03->r04 train
7.82->7.24 samples/s drift) could not be attributed from the recorded
JSON alone. This module runs a thunk under ``jax.profiler.trace``, parses
the Chrome trace it writes (the same artifact the PERFORMANCE.md per-op
roofline analyses were read from), and sums the device-lane "XLA Modules"
durations — the microseconds the chip itself was executing compiled
programs, with every host/tunnel contribution excluded. bench.py emits
the result next to each wall-clock metric (``*_device_ms*``), so a future
swing is answerable from BENCH_r{N}.json: device metric moved -> real
regression; only the wall metric moved -> host/tunnel conditions.

No reference counterpart (the reference ships no profiling tooling);
closest analogue is torch.profiler CUDA self-time attribution.
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import shutil
import tempfile
from typing import Callable, Optional


def _parse_device_module_us(trace_path: str) -> float:
    """Sum device-process "XLA Modules" event durations (µs) in a Chrome
    trace. Modules serialize on a single core, so the sum is device busy
    time."""
    with gzip.open(trace_path, "rt") as f:
        events = json.load(f)["traceEvents"]
    procs, threads = {}, {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            procs[e["pid"]] = e["args"].get("name", "")
        elif e.get("ph") == "M" and e.get("name") == "thread_name":
            threads[(e["pid"], e["tid"])] = e["args"].get("name", "")
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        pname = procs.get(e["pid"], "")
        tname = threads.get((e["pid"], e.get("tid")), "")
        if pname.startswith("/device:") and tname == "XLA Modules":
            total += float(e.get("dur", 0.0))
    return total


def measure_device_ms(thunk: Callable[[], None]) -> Optional[float]:
    """Run ``thunk`` (which must internally force its results — a device
    barrier before the trace stops) under the JAX profiler and return the
    device busy time in milliseconds, or None when no device trace was
    produced (e.g. CPU-only backends name no "/device:" process)."""
    import jax

    tmpdir = tempfile.mkdtemp(prefix="tsaw_devtime_")
    try:
        with jax.profiler.trace(tmpdir):
            thunk()
        paths = sorted(glob.glob(
            os.path.join(tmpdir, "**", "*.trace.json.gz"), recursive=True))
        if not paths:
            return None
        us = _parse_device_module_us(paths[-1])
        return us / 1000.0 if us > 0 else None
    except Exception:
        return None
    finally:
        shutil.rmtree(tmpdir, ignore_errors=True)
