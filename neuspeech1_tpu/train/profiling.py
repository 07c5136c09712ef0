"""Tracing / profiling hooks (SURVEY §5: the reference has none; the rebuild
adds jax.profiler trace capture + per-step wall timing).

Usage:
    with step_trace("output/profile", start_step=10, stop_step=15, step=n):
        state, m = train_step(...)

or programmatically:
    prof = Profiler("output/profile")
    prof.maybe_start(step); ...; prof.maybe_stop(step)

Traces are TensorBoard-compatible (xplane) and viewable with
`tensorboard --logdir <dir>` or xprof.
"""

from __future__ import annotations

import contextlib
import os
import time

import jax


class Profiler:
    def __init__(self, log_dir: str, start_step: int = 10, num_steps: int = 5):
        self.log_dir = log_dir
        self.start_step = start_step
        self.stop_step = start_step + num_steps
        self._active = False

    def maybe_start(self, step: int) -> None:
        if not self._active and step == self.start_step:
            os.makedirs(self.log_dir, exist_ok=True)
            jax.profiler.start_trace(self.log_dir)
            self._active = True

    def maybe_stop(self, step: int) -> None:
        if self._active and step >= self.stop_step:
            jax.profiler.stop_trace()
            self._active = False
            print(f"[profiler] trace written to {self.log_dir}", flush=True)

    def close(self) -> None:
        if self._active:
            jax.profiler.stop_trace()
            self._active = False


@contextlib.contextmanager
def annotate(name: str):
    """Named region in the trace timeline (TraceAnnotation)."""
    with jax.profiler.TraceAnnotation(name):
        yield


class StepTimer:
    """Blocking wall-clock timing of jitted steps (correct on runtimes where
    individual output buffers can become ready before the whole program
    finishes — always block on the full output tree)."""

    def __init__(self):
        self.times = []

    @contextlib.contextmanager
    def measure(self, result_tree_getter=None):
        t0 = time.perf_counter()
        yield
        self.times.append(time.perf_counter() - t0)

    def block(self, tree) -> float:
        t0 = time.perf_counter()
        jax.block_until_ready(jax.tree_util.tree_leaves(tree))
        dt = time.perf_counter() - t0
        return dt

    @property
    def mean_ms(self) -> float:
        return 1000.0 * sum(self.times) / max(len(self.times), 1)
