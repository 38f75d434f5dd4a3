"""Tracing / profiling hooks.

The reference has no profiling beyond wall-clock brackets around its process
pools (reference scripts/evaluate_M1.py:213-222; SURVEY §5 lists tracing as
a missing capability). This module provides:

  * :class:`StageTimer` — accumulating named stage timers with a report,
    used by the pipeline and training loops;
  * :func:`profile_trace` — context manager around the JAX/XLA device
    profiler writing a TensorBoard-compatible trace.
"""

import time
from collections import defaultdict
from contextlib import contextmanager

import jax


class StageTimer:
    """Accumulate wall-clock per named stage; thread-unsafe by design (use
    one per driver)."""

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextmanager
    def stage(self, name):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self):
        lines = ["{:<24} {:>10} {:>8}".format("STAGE", "TOTAL(s)", "CALLS")]
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            lines.append("{:<24} {:>10.3f} {:>8}".format(
                name, self.totals[name], self.counts[name]))
        return "\n".join(lines)


@contextmanager
def profile_trace(log_dir, host_only=False):
    """Capture a device+host profiler trace under `log_dir` (view with
    TensorBoard's profile plugin or xprof)."""
    jax.profiler.start_trace(log_dir, create_perfetto_link=False)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


_GLOBAL = StageTimer()


def stage(name):
    """Module-level convenience: `with stage('mcem'):` on the shared
    timer."""
    return _GLOBAL.stage(name)
