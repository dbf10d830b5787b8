"""Structured metrics logging + profiler hooks.

The reference only has prints + TensorBoardX (`tb_visualizer.py:38-76`); we add
what SURVEY.md §5 flags as missing: structured JSONL metrics and first-class
`jax.profiler` trace capture.
"""
from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Optional


class MetricsLogger:
    """Append-only JSONL metrics log (+ mirrored stdout line)."""

    def __init__(self, path: Optional[str] = None, echo: bool = True):
        self.path = path
        self.echo = echo
        if path:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def log(self, **metrics) -> None:
        rec = {"t": time.time(), **metrics}
        line = json.dumps(rec)
        if self.path:
            with open(self.path, "a") as f:
                f.write(line + "\n")
        if self.echo:
            printable = " ".join(
                f"{k}={v:.4g}" if isinstance(v, float) else f"{k}={v}"
                for k, v in metrics.items())
            print(f"[metrics] {printable}", flush=True)


@contextlib.contextmanager
def profile_trace(log_dir: str, enabled: bool = True):
    """Capture a jax.profiler trace around a block (view with TensorBoard or
    Perfetto). Usage: `with profile_trace('/tmp/trace'): run_step()`."""
    if not enabled:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling wall-clock timer for steps/sec reporting."""

    def __init__(self, window: int = 50):
        self.window = window
        self.times: list[float] = []

    def tick(self) -> float:
        now = time.perf_counter()
        self.times.append(now)
        if len(self.times) > self.window:
            self.times.pop(0)
        if len(self.times) < 2:
            return 0.0
        return (len(self.times) - 1) / (self.times[-1] - self.times[0])
