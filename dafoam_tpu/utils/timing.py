"""Timing + profiling (aux subsystem parity, SURVEY.md §5.1).

The reference offers per-phase wall/CPU prints (DASolver::printElapsedTime,
getElapsedClockTime exposed to Python). Here: a Timer registry plus direct
hooks into the JAX profiler (xprof traces come nearly free on TPU).
"""

from __future__ import annotations

import contextlib
import time

import jax


class Timer:
    """Phase timer: Timer.phase('adjoint') context, report() summary."""

    _acc: dict = {}

    def __init__(self):
        self._acc = {}

    @contextlib.contextmanager
    def phase(self, name, block_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                jax.block_until_ready(block_on)
            self._acc[name] = self._acc.get(name, 0.0) \
                + time.perf_counter() - t0

    def report(self):
        return dict(sorted(self._acc.items(), key=lambda kv: -kv[1]))


@contextlib.contextmanager
def trace(logdir="/tmp/dafoam_tpu_trace"):
    """JAX profiler trace (view with xprof/tensorboard)."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()
