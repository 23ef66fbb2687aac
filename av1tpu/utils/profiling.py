"""Tracing and throughput observability.

The reference has no profiling at all (SURVEY.md §5 — tqdm bars and
hand-recorded epoch times). This module provides the TPU-native
equivalents: ``jax.profiler`` trace capture around any region (viewable in
TensorBoard/Perfetto), per-step timing, and superblocks/sec meters — the
benchmark currency of BASELINE.json.
"""
from __future__ import annotations

import contextlib
import json
import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Dict, List, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: Path, name: str = "av1tpu"):
    """Capture a jax.profiler trace of the enclosed region.

    View with TensorBoard's profile plugin or ui.perfetto.dev.
    """
    log_dir = str(log_dir)
    jax.profiler.start_trace(log_dir)
    try:
        with jax.profiler.TraceAnnotation(name):
            yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named region inside an active trace."""
    with jax.profiler.TraceAnnotation(name):
        yield


@dataclass
class ThroughputMeter:
    """Step-time / items-per-second accumulator with percentile summary."""

    unit: str = "superblocks"
    _times: List[float] = field(default_factory=list)
    _items: List[int] = field(default_factory=list)
    _start: Optional[float] = None

    def start(self) -> None:
        self._start = time.perf_counter()

    def stop(self, items: int) -> float:
        assert self._start is not None, "call start() first"
        dt = time.perf_counter() - self._start
        self._times.append(dt)
        self._items.append(items)
        self._start = None
        return dt

    @contextlib.contextmanager
    def step(self, items: int):
        self.start()
        try:
            yield
        finally:
            self.stop(items)

    def summary(self, skip_warmup: int = 1) -> Dict[str, float]:
        times = self._times[skip_warmup:] or self._times
        items = self._items[skip_warmup:] or self._items
        if not times:
            return {}
        total_time = sum(times)
        total_items = sum(items)
        sorted_times = sorted(times)

        def pct(p):
            idx = min(int(len(sorted_times) * p), len(sorted_times) - 1)
            return sorted_times[idx]

        return {
            "steps": len(times),
            f"{self.unit}_per_sec": total_items / total_time,
            "mean_step_sec": total_time / len(times),
            "p50_step_sec": pct(0.50),
            "p90_step_sec": pct(0.90),
            "p99_step_sec": pct(0.99),
        }

    def save(self, path: Path, skip_warmup: int = 1) -> None:
        Path(path).parent.mkdir(parents=True, exist_ok=True)
        Path(path).write_text(json.dumps(self.summary(skip_warmup), indent=2))


def device_memory_stats() -> Dict[str, Dict[str, int]]:
    """Per-device memory stats where the backend exposes them."""
    stats = {}
    for dev in jax.devices():
        try:
            stats[str(dev)] = dict(dev.memory_stats() or {})
        except Exception:
            stats[str(dev)] = {}
    return stats


__all__ = ["ThroughputMeter", "annotate", "device_memory_stats", "trace"]
