"""Tracing / profiling: phase timers + jax.profiler integration.

The reference's only observability is wall-clock prints around phases
(``Person-ReID/getFeatures.py:54,69-70``; per-epoch totals at
``mainKIT.py:136-201``) — SURVEY.md §5 flags the absence of profiler hooks.
Here:

- :class:`PhaseTimer` accumulates named spans (the reference's
  feature-extraction / clustering / finetuning accounting) and reports
  totals + means;
- :func:`phase` is a context manager timing one span with an optional
  ``jax.profiler.TraceAnnotation`` so spans show up in TPU traces;
- :func:`profile_to` wraps ``jax.profiler.trace`` for one-line capture of a
  device trace viewable in TensorBoard/Perfetto.

All device timing blocks on the arrays passed to ``phase(..., block_on=)``
— otherwise async dispatch makes spans meaningless.
"""

from __future__ import annotations

import collections
import contextlib
import time
from typing import Dict

import jax


class PhaseTimer:
    """Accumulates (count, total seconds) per named phase."""

    def __init__(self):
        self._totals: Dict[str, float] = collections.defaultdict(float)
        self._counts: Dict[str, int] = collections.defaultdict(int)

    def add(self, name: str, seconds: float) -> None:
        self._totals[name] += seconds
        self._counts[name] += 1

    def total(self, name: str) -> float:
        return self._totals[name]

    def mean(self, name: str) -> float:
        return self._totals[name] / max(self._counts[name], 1)

    def report(self) -> str:
        lines = []
        for name in sorted(self._totals):
            lines.append(
                f"{name}: total {self._totals[name]:.2f}s, "
                f"mean {self.mean(name):.3f}s over {self._counts[name]} spans"
            )
        return "\n".join(lines)

    @contextlib.contextmanager
    def span(self, name: str, block_on=None):
        with phase(name, block_on=block_on) as get_elapsed:
            yield
        self.add(name, get_elapsed())


@contextlib.contextmanager
def phase(name: str, block_on=None):
    """Time one span; yields a zero-arg callable returning elapsed seconds.
    Emits a ``TraceAnnotation`` so the span appears in device traces."""
    elapsed = [0.0]
    t0 = time.time()
    with jax.profiler.TraceAnnotation(name):
        yield lambda: elapsed[0]
        if block_on is not None:
            jax.block_until_ready(block_on)
    elapsed[0] = time.time() - t0


@contextlib.contextmanager
def trace_annotation(name: str):
    """Bare TraceAnnotation passthrough (named spans inside jit regions)."""
    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def profile_to(log_dir: str):
    """Capture a full device trace to ``log_dir`` (TensorBoard/Perfetto)."""
    with jax.profiler.trace(log_dir):
        yield
