"""Tracing and metrics: the observability surface.

The reference's observability is algorithmic result metadata (merge.info,
pca.info — SURVEY.md §5); we keep that bit-for-bit in MNNResult and add the
runtime layer the reference lacks: jax.profiler trace annotations per merge
step / kernel, and a structured metrics recorder (cells/sec, per-step wall
times, pair counts) for the benchmark harness.
"""
from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

__all__ = ["trace_span", "MetricsRecorder", "get_recorder", "set_recorder"]

_recorder: Optional["MetricsRecorder"] = None


def get_recorder() -> Optional["MetricsRecorder"]:
    return _recorder


def set_recorder(rec: Optional["MetricsRecorder"]) -> Optional["MetricsRecorder"]:
    global _recorder
    old = _recorder
    _recorder = rec
    return old


@contextlib.contextmanager
def trace_span(name: str, **attrs):
    """jax.profiler annotation + wall-time capture into the active recorder."""
    try:
        import jax.profiler

        ctx = jax.profiler.TraceAnnotation(name)
    except Exception:  # pragma: no cover
        ctx = contextlib.nullcontext()
    t0 = time.perf_counter()
    with ctx:
        yield
    dt = time.perf_counter() - t0
    rec = get_recorder()
    if rec is not None:
        rec.record_span(name, dt, **attrs)


@dataclass
class MetricsRecorder:
    """Accumulates span timings and counters for one run."""

    spans: Dict[str, List[float]] = field(default_factory=lambda: defaultdict(list))
    counters: Dict[str, float] = field(default_factory=lambda: defaultdict(float))
    attrs: List[Dict[str, Any]] = field(default_factory=list)

    def record_span(self, name: str, seconds: float, **attrs) -> None:
        self.spans[name].append(seconds)
        if attrs:
            self.attrs.append({"span": name, "seconds": seconds, **attrs})

    def add(self, name: str, value: float = 1.0) -> None:
        self.counters[name] += value

    def summary(self) -> Dict[str, Any]:
        return {
            "spans": {
                k: {"count": len(v), "total_s": sum(v), "max_s": max(v)}
                for k, v in self.spans.items()
            },
            "counters": dict(self.counters),
        }

    def dump_json(self) -> str:
        return json.dumps(self.summary(), sort_keys=True)

    @contextlib.contextmanager
    def activate(self):
        old = set_recorder(self)
        try:
            yield self
        finally:
            set_recorder(old)
