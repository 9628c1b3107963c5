"""Profiling / tracing hooks (aux subsystem; the reference has none —
SURVEY.md §5 flags this as a gap to fill, not a port target).

- `trace(logdir)`: context manager around jax.profiler traces (view in
  TensorBoard / Perfetto).
- `StepTimer`: rolling step-time + examples/sec meter, the eval loop's
  `sec_per_example` generalised.
"""
import contextlib
import time

import jax


@contextlib.contextmanager
def trace(logdir):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    def __init__(self, window=50):
        self.window = window
        self.times = []
        self.counts = []
        self._last = None

    def tic(self):
        self._last = time.perf_counter()

    def toc(self, n_examples=1):
        if self._last is None:
            return
        dt = time.perf_counter() - self._last
        self.times.append(dt)
        self.counts.append(n_examples)
        if len(self.times) > self.window:
            self.times.pop(0)
            self.counts.pop(0)
        self._last = None

    @property
    def sec_per_step(self):
        return sum(self.times) / max(len(self.times), 1)

    @property
    def examples_per_sec(self):
        t = sum(self.times)
        return sum(self.counts) / t if t > 0 else 0.0

    @property
    def sec_per_example(self):
        n = sum(self.counts)
        return sum(self.times) / n if n > 0 else 0.0
