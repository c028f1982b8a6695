"""Profiling + tracing hooks.

Role of the reference's torch profiler spans and CUDA-event phase timing
(SURVEY.md §5 "Tracing/profiling": record_function annotations throughout
networks/loss, per-phase wall clock in training_loop_v0.py:267-272,501-506).

TPU equivalents: jax.profiler traces (viewable in TensorBoard/XProf),
jax.named_scope for HLO-level annotation, and a host-side phase timer that
forces completion via tiny scalar reads (the axon platform's
block_until_ready is lazy; see .claude/skills/verify/SKILL.md).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict

import jax
import numpy as np

named_scope = jax.named_scope


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace for TensorBoard (jax.profiler)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class PhaseTimer:
    """Wall-clock per named phase (role of the CUDA start/end events)."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str, sync_value=None):
        t0 = time.perf_counter()
        yield
        if sync_value is not None:
            jax.block_until_ready(sync_value)
        self.totals[name] += time.perf_counter() - t0
        self.counts[name] += 1

    def report(self) -> Dict[str, float]:
        return {
            f"Timing/{k}": self.totals[k] / max(self.counts[k], 1)
            for k in self.totals
        }

    def reset(self):
        self.totals.clear()
        self.counts.clear()
