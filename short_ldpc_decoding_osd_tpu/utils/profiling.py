"""Tracing/profiling helpers (SURVEY.md §5 tracing row).

The reference only has ``time.process_time`` deltas and a TF-profiler FLOPs
counter; here: jax.profiler trace capture, blocking wall timers, and
cost-analysis FLOPs for any jitted function."""

from __future__ import annotations

import contextlib
import json
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Blocking wall-clock timer for device work."""

    def __init__(self):
        self.records: dict[str, list[float]] = {}

    @contextlib.contextmanager
    def measure(self, name: str, result=None):
        t0 = time.perf_counter()
        yield
        if result is not None:
            jax.block_until_ready(result)
        self.records.setdefault(name, []).append(time.perf_counter() - t0)

    def summary(self) -> dict:
        return {
            name: {
                "n": len(vals),
                "total_s": sum(vals),
                "mean_s": sum(vals) / len(vals),
            }
            for name, vals in self.records.items()
        }


def flops_estimate(fn, *args) -> float | None:
    """XLA cost-analysis FLOPs of a jitted callable (None if unavailable).

    Replaces the reference's graph-freeze profiler trick
    (``nn_training.py:218-262``)."""
    try:
        lowered = jax.jit(fn).lower(*args)
        analysis = lowered.compile().cost_analysis()
        if isinstance(analysis, list):
            analysis = analysis[0]
        return float(analysis.get("flops", None))
    except Exception:
        return None


class JsonlLogger:
    """Append-mode structured metrics log (replaces the reference's .txt
    appends, ``ldpc_128_testing.py:138-153``)."""

    def __init__(self, path: str):
        self.path = path

    def log(self, record: dict):
        record = dict(record)
        record.setdefault("t", time.time())
        with open(self.path, "a") as fh:
            fh.write(json.dumps(record, default=str) + "\n")
