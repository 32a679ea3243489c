"""Lightweight tracing/metrics (SURVEY.md §5: the reference has println! +
Instant only, prover.rs:107,157; this is the structured replacement).

``span`` times a region; ``Metrics`` accumulates named durations and
counters and renders a one-line report. ``jax_trace`` wraps a region in a
jax.profiler trace for TensorBoard when BPT_JAX_TRACE_DIR is set.
"""
from __future__ import annotations

import contextlib
import os
import sys
import time
from collections import defaultdict


class Metrics:
    def __init__(self):
        self.durations: dict[str, float] = defaultdict(float)
        self.counters: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def span(self, name: str):
        trace = os.environ.get("BPT_TRACE_SPANS")
        if trace:
            print(f"[span] {name} ...", file=sys.stderr, flush=True)
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.durations[name] += dt
            if trace:
                print(f"[span] {name} {dt:.2f}s", file=sys.stderr, flush=True)

    def count(self, name: str, inc: int = 1):
        self.counters[name] += inc

    def reset(self):
        """Zero the accumulators (e.g. between a cold and a warm prove so
        the warm per-round breakdown isn't buried in cold compile time)."""
        self.durations.clear()
        self.counters.clear()

    def report(self) -> str:
        parts = [f"{k}={v*1e3:.1f}ms" for k, v in sorted(self.durations.items())]
        parts += [f"{k}={v}" for k, v in sorted(self.counters.items())]
        return " ".join(parts)


_global = Metrics()


def get_metrics() -> Metrics:
    return _global


@contextlib.contextmanager
def jax_trace(name: str):
    """jax.profiler trace if BPT_JAX_TRACE_DIR is set, else no-op."""
    trace_dir = os.environ.get("BPT_JAX_TRACE_DIR")
    if not trace_dir:
        yield
        return
    import jax

    with jax.profiler.trace(os.path.join(trace_dir, name)):
        yield
