"""Profiling + tracing hooks.

The reference has none (a commented-out SummaryWriter is the whole story,
reference videonet_animatediff.py:26,95-96; SURVEY.md §5). Here: xprof-
compatible jax.profiler traces around hot loops, named step annotations,
and a lightweight step timer that reports steps/sec + device memory.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Dict, Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture an xprof trace of the enclosed block:

        with profiling.trace("/tmp/emox_trace"):
            for _ in range(3):
                state, m = train_step(state, batch, key)
        # tensorboard --logdir /tmp/emox_trace
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region visible in the trace viewer (TraceAnnotation)."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Blocking wall-clock step timer with warmup discard."""

    def __init__(self, warmup: int = 1):
        self.warmup = warmup
        self._times = []
        self._t0: Optional[float] = None
        self._count = 0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self._count += 1
        if self._count > self.warmup:
            self._times.append(dt)
        return False

    @property
    def mean_s(self) -> float:
        return sum(self._times) / max(1, len(self._times))

    @property
    def steps_per_sec(self) -> float:
        return 1.0 / self.mean_s if self._times else 0.0

    def summary(self) -> Dict[str, float]:
        return {
            "mean_ms": self.mean_s * 1e3,
            "steps_per_sec": self.steps_per_sec,
            "n": float(len(self._times)),
        }


def device_memory_stats(device: Optional[jax.Device] = None) -> Dict[str, float]:
    """Per-device HBM stats (bytes) when the backend exposes them."""
    d = device or jax.devices()[0]
    try:
        stats = d.memory_stats() or {}
    except (AttributeError, NotImplementedError, jax.errors.JaxRuntimeError):
        return {}
    return {k: float(v) for k, v in stats.items() if isinstance(v, (int, float))}


def save_profile_summary(path: str, timer: StepTimer, extra: Optional[Dict] = None) -> None:
    rec = {"time": time.time(), **timer.summary(), "memory": device_memory_stats()}
    if extra:
        rec.update(extra)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "a") as f:
        f.write(json.dumps(rec) + "\n")
