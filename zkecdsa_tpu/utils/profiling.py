"""Profiling & observability (SURVEY section 5 rows: tracing/profiling +
metrics/logging).

The reference ships an 0x flamegraph harness and a raw ns/op microbench
(reference bench/flamegraph.ts, bench/hrtime.ts).  Our equivalents:

* :func:`trace` - context manager around ``jax.profiler`` writing an
  XProf/Perfetto trace directory;
* :class:`StageTimer` - structured per-stage wall-clock accounting used by
  the batched pipeline (proofs/sec counters are derived from it);
* :func:`kernel_ns_per_op` - the hrtime.ts analog: median ns/op of a
  jitted kernel after warm-up.
"""

from __future__ import annotations

import contextlib
import json
import time
from typing import Callable

import jax

__all__ = ["trace", "StageTimer", "kernel_ns_per_op"]


@contextlib.contextmanager
def trace(logdir: str | None = None):
    """Capture a device trace viewable in XProf/Perfetto.  ``logdir``
    defaults to ``Config.profile_dir`` (ZKECDSA_PROFILE_DIR)."""
    if logdir is None:
        from .config import get_config

        logdir = get_config().profile_dir
    if logdir is None:
        raise ValueError(
            "no trace directory: pass logdir or set ZKECDSA_PROFILE_DIR"
        )
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """Accumulates wall-clock per named pipeline stage."""

    def __init__(self) -> None:
        self.stages: dict[str, float] = {}
        self.counts: dict[str, int] = {}

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.stages[name] = self.stages.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> str:
        total = sum(self.stages.values()) or 1.0
        lines = [
            f"{name:<28s} {secs:8.3f}s  {100 * secs / total:5.1f}%  x{self.counts[name]}"
            for name, secs in sorted(
                self.stages.items(), key=lambda kv: -kv[1]
            )
        ]
        return "\n".join(lines)

    def as_json(self) -> str:
        return json.dumps(self.stages)


def kernel_ns_per_op(
    fn: Callable, args: tuple, n_ops: int, iters: int = 20, warmup: int = 2
) -> float:
    """Median ns per logical op of a jitted kernel (bench/hrtime.ts:17-32
    analog: raw timer around repeated invocations, divided by op count)."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    samples = []
    for _ in range(iters):
        t0 = time.perf_counter_ns()
        jax.block_until_ready(fn(*args))
        samples.append((time.perf_counter_ns() - t0) / n_ops)
    samples.sort()
    return samples[len(samples) // 2]
