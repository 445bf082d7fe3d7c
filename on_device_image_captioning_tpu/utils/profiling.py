"""Profiling and observability.

The reference's only observability is flushed prints of loss/lr/sec-per-iter
(reference train.py:183-246) and wall-clock latency loops
(reference benchmarking/benchmarking.py:69-121). TPU-native equivalents:

- `trace(path)`: jax.profiler context emitting a TensorBoard-loadable device
  trace (op-level timeline, HBM usage) — the replacement for "no tracer";
- `StepTimer`: throughput/sec-per-iter accounting with warmup skip;
- `MetricsLogger`: the reference's print-logging, structured (stdout and/or
  JSONL file for machine consumption).
"""
from __future__ import annotations

import contextlib
import json
import time
from typing import Dict, Optional


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace viewable in TensorBoard/XProf."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region appearing in profiler timelines (use around steps/phases)."""
    import jax

    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    def __init__(self, warmup: int = 1):
        self.warmup = warmup
        self._seen = 0
        self._total = 0.0
        self._last: Optional[float] = None

    def tick(self) -> float:
        """Call once per step; returns seconds since previous tick (0 on first)."""
        now = time.perf_counter()
        dt = 0.0 if self._last is None else now - self._last
        self._last = now
        self._seen += 1
        if self._seen > self.warmup:
            self._total += dt
        return dt

    @property
    def sec_per_iter(self) -> float:
        steps = max(self._seen - self.warmup, 1)
        return self._total / steps


class MetricsLogger:
    """print(..., flush=True) semantics (reference train.py:40) plus optional
    JSONL sink."""

    def __init__(self, jsonl_path: Optional[str] = None, stdout: bool = True):
        self.stdout = stdout
        self._f = open(jsonl_path, "a") if jsonl_path else None

    def log(self, step: int, metrics: Dict[str, float]) -> None:
        if self.stdout:
            parts = " ".join(f"{k} {v:.6g}" for k, v in metrics.items())
            print(f"it {step} {parts}", flush=True)
        if self._f:
            self._f.write(json.dumps({"step": step, **metrics}) + "\n")
            self._f.flush()

    def close(self):
        if self._f:
            self._f.close()
            self._f = None
