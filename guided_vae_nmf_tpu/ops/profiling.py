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


# ---------------------------------------------------------------------------
# Device-op microbenchmark (profiler-trace based)
# ---------------------------------------------------------------------------
#
# On a tunneled dev TPU every wall-clock scalar fetch pays a ~40 ms HTTP
# round trip, so device-op trace durations are the only reliable
# microbenchmark signal; this helper is how all VALIDATION.md kernel
# numbers were measured.


def _sync(out):
    """Force completion: a scalar D2H fetch (block_until_ready is not a
    reliable barrier on the tunneled axon backend)."""
    import numpy as np

    for leaf in jax.tree_util.tree_leaves(out):
        np.asarray(leaf.ravel()[0] if hasattr(leaf, "ravel") else leaf)


def device_time_ms(fn, trace_dir="/tmp/_devtime", top=0):
    """Run fn() under the jax profiler; return (total_device_ms, op_table).

    fn should RETURN its jax outputs so they can be synced. op_table is a
    list of (ms, count, name) sorted desc; `top` > 0 prints that many rows.
    """
    import collections
    import glob
    import gzip
    import json
    import shutil

    shutil.rmtree(trace_dir, ignore_errors=True)
    _sync(fn())  # warm
    with jax.profiler.trace(trace_dir):
        _sync(fn())
    files = sorted(glob.glob(f"{trace_dir}/**/*.trace.json.gz",
                             recursive=True))
    if not files:
        raise RuntimeError(
            f"jax profiler wrote no trace under {trace_dir}; is a device "
            "backend attached?")
    ev = json.load(gzip.open(files[-1]))["traceEvents"]
    pidname = {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pidname[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pidname.items() if "TPU" in n.upper()}
    agg = collections.Counter()
    cnt = collections.Counter()
    for e in ev:
        if e.get("ph") == "X" and e.get("pid") in dev_pids:
            agg[e["name"]] += e.get("dur", 0)
            cnt[e["name"]] += 1
    table = sorted(((d / 1e3, cnt[n], n) for n, d in agg.items()),
                   reverse=True)
    # total = sum of top-level dispatched XLA modules ("jit_*" events);
    # nested while/fusion/custom-call events are contained within them.
    # Falls back to the largest event when nothing matches the prefix.
    total = sum(ms * 1.0 for ms, c, n in table if n.startswith("jit"))
    if not total and table:
        total = table[0][0]
    if top:
        for ms, c, n in table[:top]:
            print(f"{ms:9.2f} ms x{c:5d}  {n[:100]}")
    return total, table
