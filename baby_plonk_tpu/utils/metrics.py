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
            if os.environ.get("BPT_TRACE_HBM"):
                try:
                    import jax

                    st = jax.devices()[0].memory_stats() or {}
                    used = st.get("bytes_in_use", 0)
                    peak = st.get("peak_bytes_in_use", 0)
                    print(
                        f"[hbm] {name}: in_use={used/2**30:.2f}G "
                        f"peak={peak/2**30:.2f}G",
                        file=sys.stderr,
                        flush=True,
                    )
                except Exception as e:  # stats are best-effort diagnostics
                    print(f"[hbm] {name}: unavailable ({e})", file=sys.stderr)

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
