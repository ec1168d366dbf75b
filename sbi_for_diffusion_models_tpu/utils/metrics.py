"""Structured metrics + profiling harness.

The reference's only observability is stdout prints (reference:
data_simulator.py:56-57,102-111; mnle.py:218) and a gitignored TensorBoard dir
from sbi's internal writer. This module is the framework's metrics tier:

* ``MetricsLogger`` — append-only JSONL event log (stage, name, value, time);
* ``timed`` — wall-clock a device computation with a forced host sync (on the
  axon TPU tunnel, ``block_until_ready`` does not reliably synchronize, so a
  host transfer of a scalar is used);
* ``trace`` — context manager around ``jax.profiler`` for on-demand TPU
  traces.
"""

from __future__ import annotations

import contextlib
import json
import time
from pathlib import Path
from typing import Any, Callable, Optional

import jax
import numpy as np

__all__ = ["MetricsLogger", "timed", "trace", "host_sync"]


def host_sync(x) -> float:
    """Force full device execution by pulling one scalar to host."""
    leaf = jax.tree.leaves(x)[0]
    return float(np.asarray(leaf).ravel()[0])


class MetricsLogger:
    """Append-only JSONL metrics: one {"ts", "stage", "name", "value"} per line."""

    def __init__(self, path: str | Path | None = None):
        self.path = Path(path) if path is not None else None
        if self.path is not None:
            self.path.parent.mkdir(parents=True, exist_ok=True)

    def log(self, stage: str, name: str, value: Any, **extra) -> None:
        rec = {"ts": time.time(), "stage": stage, "name": name, "value": value}
        rec.update(extra)
        if self.path is not None:
            with open(self.path, "a") as f:
                f.write(json.dumps(rec) + "\n")
        else:
            print(f"[metrics] {stage}/{name} = {value}")


def timed(fn: Callable, *args, sync: bool = True, **kwargs):
    """Run fn(*args, **kwargs), return (result, seconds) with host sync."""
    t0 = time.perf_counter()
    out = fn(*args, **kwargs)
    if sync:
        host_sync(out)
    return out, time.perf_counter() - t0


@contextlib.contextmanager
def trace(logdir: str | Path = "/tmp/jax_trace"):
    """Capture a jax.profiler trace around the enclosed block."""
    jax.profiler.start_trace(str(logdir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()
