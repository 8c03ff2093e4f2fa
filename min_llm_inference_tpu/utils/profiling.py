"""Tracing/profiling subsystem.

TPU-native analogue of the reference's NVTX phase ranges + ``make profile``
(/root/reference/src/inferencer.cpp:8,55-82; Makefile:16-18): the four
engine phases (forward / process-results / realloc / insert+prefill) are
wrapped in ``phase(...)`` ranges that emit

  * ``jax.profiler.TraceAnnotation`` events — visible on the host timeline
    of an xprof/tensorboard trace captured with ``trace(logdir)`` (the
    analogue of nsys consuming NVTX ranges), and
  * host wall-clock accumulation per phase in a process-global
    ``PhaseStats`` — cheap enough to stay on in production engines and
    printable without any trace viewer (``bench.py --phase-stats``).

Device-side op attribution inside the jitted steps comes from
``jax.named_scope`` annotations (the XLA-metadata analogue of kernel
names) on the model stages; capture with::

    with trace("/tmp/tpu_trace"):
        engine.run(store)          # then: tensorboard --logdir /tmp/tpu_trace

or ``python bench.py --profile /tmp/tpu_trace``.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator

import jax


class PhaseStats:
    """Per-phase host wall-time accumulator (reference ThroughputCounter's
    sibling: phases instead of tokens)."""

    def __init__(self) -> None:
        self.seconds: Dict[str, float] = defaultdict(float)
        self.calls: Dict[str, int] = defaultdict(int)

    def add(self, name: str, dt: float) -> None:
        self.seconds[name] += dt
        self.calls[name] += 1

    def reset(self) -> None:
        self.seconds.clear()
        self.calls.clear()

    def summary(self) -> Dict[str, Dict[str, float]]:
        total = sum(self.seconds.values()) or 1.0
        return {
            name: {
                "seconds": round(s, 4),
                "calls": self.calls[name],
                "share": round(s / total, 4),
            }
            for name, s in sorted(
                self.seconds.items(), key=lambda kv: -kv[1]
            )
        }


_global_stats = PhaseStats()


def get_global_phase_stats() -> PhaseStats:
    return _global_stats


@contextlib.contextmanager
def phase(name: str) -> Iterator[None]:
    """Annotate one engine phase: a TraceAnnotation on the profiler's host
    timeline + wall-time accumulation. The reference wraps the same four
    phases in NVTX ranges (src/inferencer.cpp:55-82)."""
    t0 = time.perf_counter()
    with jax.profiler.TraceAnnotation(name):
        yield
    _global_stats.add(name, time.perf_counter() - t0)


@contextlib.contextmanager
def trace(logdir: str | None) -> Iterator[None]:
    """Capture an xprof trace into ``logdir`` (None = no-op). View with
    tensorboard or xprof; host rows show the ``phase(...)`` ranges, device
    rows the jitted kernels with ``named_scope`` attribution."""
    if not logdir:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
