"""Online dynamic-batching enhancement service (production serving layer).

Beyond-reference capability: the reference's deployment story is offline
sweeps only (evaluate_M1.py:186-222 — a process pool over a fixed file
list). This module turns the same whole-pipeline device program
(`pipeline._enhance_waveform_jit`: waveform -> STFT -> labels -> MCEM ->
Wiener filter -> ISTFT, one jitted program) into an online endpoint:

  * concurrent clients call `submit(waveform)` and get a Future;
  * a collector thread groups pending requests within a bounded wait
    window (`max_wait_ms`), buckets them by padded frame count, and runs
    ONE device program per bucket group;
  * batch and length dimensions are rounded up to a small fixed lattice
    (powers of two up to `max_batch`; `bucket_multiple` frames) so the
    number of distinct compiled shapes is bounded and steady-state serving
    never recompiles.

Determinism note: every request draws its MH chain keys from its own
request id, so on the XLA engine (`engine='xla'`) a request's MH
randomness is independent of what else rode in its batch: identical
batch shapes replay bit-identically, and different co-batching changes
the output only by XLA's shape-dependent float-reduction ordering
(~1 PCM16 LSB — vs ~0.05 RMS between different MH seeds). The fused
Pallas engine derives its per-tile PRNG streams from the whole batch's
leading key (pallas_engine.mcem_batch_fused), so its MH noise genuinely
depends on batch composition — statistically equivalent, not replayable
across groupings. Serving defaults to the fused engine (it is the
throughput path); switch to 'xla' when replay stability matters more
than speed.
"""

import threading
import time
from collections import deque
from concurrent.futures import Future
from dataclasses import dataclass, field

import numpy as np
import jax
import jax.numpy as jnp

from .mcem import MCEMConfig
from .dsp.stft import frame_count, pad_signal_for_stft
from .pipeline import FS, HOP, NFFT, _enhance_waveform_jit, _use_fused


class QueueFullError(RuntimeError):
    """submit() backpressure: the waiting queue is at ServeConfig.max_queue.
    Transient by design — retry with backoff (HTTP front end: 429)."""


@dataclass(frozen=True)
class ServeConfig:
    """Dynamic-batching policy.

    max_batch: largest device batch (requests beyond it wait for the next
      program). max_wait_ms: how long the collector holds the FIRST
      request of a group open for co-batching company; the latency cost a
      lightly-loaded service pays for throughput under load.
    bucket_multiple: frame-count lattice (128 keeps the fused kernel's
      N % 128 == 0 contract). batch_lattice: allowed device batch sizes —
      a group of 5 runs as 8 with duplicated tail rows, bounding compiled
      shapes to len(batch_lattice) x #buckets."""

    max_batch: int = 16
    max_wait_ms: float = 20.0
    bucket_multiple: int = 128
    batch_lattice: tuple = (1, 2, 4, 8, 16)
    # backpressure: submit() raises QueueFullError once this many requests
    # are waiting (un-dispatched) — bounds host memory under request
    # floods; clients should retry with backoff (HTTP maps it to 429).
    # 0 disables the bound.
    max_queue: int = 256
    # under load, merge shorter requests upward into the longest pending
    # bucket (they run correctly at any larger n_pad — the frame mask
    # covers the extra padding) as long as each merged request wastes at
    # most `max_pad_waste` of its rows' compute; one big dispatch
    # amortizes the per-batch overhead that otherwise caps saturated
    # throughput. 0 disables coalescing.
    max_pad_waste: float = 0.5
    label_mode: str = "dnn"          # 'dnn' | 'timo' | 'none' (M1)
    target: str = "ibm"
    noise_model: str = "spp"         # serving default = real-noise config
    engine: str = "auto"             # 'auto' | 'fused' | 'xla'
    fast: bool = False
    soft_guidance: bool = False      # condition on classifier probabilities
    # classifier inference protocol (classifier_meta.json side-car;
    # serve_models reads it from the model dir automatically)
    features: str = "power"          # 'power' | 'log-power'
    dnn_threshold: float = 0.5
    seed: int = 0


@dataclass
class _Request:
    x: np.ndarray                    # float32 waveform
    future: Future = field(default_factory=Future)
    rid: int = 0
    t_submit: float = 0.0
    n_frames: int = 0


class EnhancementService:
    """Shared-device online enhancement endpoint with dynamic batching.

    >>> svc = EnhancementService(m2, classifier_params=cls, mean=m, std=s)
    >>> fut = svc.submit(noisy_waveform)          # returns immediately
    >>> out = fut.result()                        # {'s': ..., 'n': ...}
    >>> svc.close()

    `enhance(x)` is the blocking convenience wrapper. Thread-safe; any
    number of producer threads may submit concurrently.
    """

    def __init__(self, vae_params, classifier_params=None, mean=None,
                 std=None, cfg: MCEMConfig = MCEMConfig(),
                 serve: ServeConfig = ServeConfig(), mesh=None):
        """mesh: optional jax.sharding.Mesh with a "data" axis — batches
        shard over it (pipeline._enhance_waveform_sharded), with the
        batch lattice floored at the mesh size so every dispatch divides
        evenly (single requests then pay duplicate-row padding: a
        latency-vs-utilization tradeoff the caller opts into)."""
        if serve.label_mode == "dnn" and classifier_params is None:
            raise ValueError("label_mode 'dnn' needs classifier_params")
        from .pipeline import validate_noise_model

        # the serving path feeds noise_model straight into the jitted core
        # (no per-call validation like enhance_batch's): reject typos here
        validate_noise_model(serve.noise_model, cfg)
        lat = tuple(serve.batch_lattice)
        if not lat or list(lat) != sorted(set(lat)):
            raise ValueError("batch_lattice must be strictly increasing")
        if serve.max_batch > lat[-1]:
            # the collector groups up to max_batch requests and the
            # dispatcher rounds the group UP to a lattice entry — a group
            # larger than the biggest entry would have no compiled shape
            raise ValueError(
                f"max_batch={serve.max_batch} exceeds the largest "
                f"batch_lattice entry {lat[-1]}")
        self._mesh = mesh
        self._n_dev = 1 if mesh is None else mesh.shape["data"]
        if mesh is not None and lat[-1] % self._n_dev:
            raise ValueError("max batch_lattice entry must divide by the "
                             "mesh data axis")
        self._vae = vae_params
        self._cls = classifier_params
        self._mean = None if mean is None else jnp.asarray(
            np.asarray(mean, np.float32))
        self._std = None if std is None else jnp.asarray(
            np.asarray(std, np.float32))
        self._cfg = cfg
        self._serve = serve
        self._queue = deque()
        self._cv = threading.Condition()
        self._rid = 0
        self._closed = False
        # (latency_s, batch_size) per request — bounded sliding window so
        # a long-lived server's stats()/healthz stay O(window) instead of
        # sorting an ever-growing list under the collector's lock
        self._lat = deque(maxlen=10_000)
        self._n_total = 0            # lifetime request count
        self._batches = 0
        import queue

        self._inflight = queue.Queue(maxsize=2)   # dispatched, unfetched
        self._worker = threading.Thread(target=self._loop, daemon=True,
                                        name="gvnmf-serving")
        self._fetcher = threading.Thread(target=self._fetch_loop,
                                         daemon=True,
                                         name="gvnmf-serving-fetch")
        self._worker.start()
        self._fetcher.start()

    # ---- client API ------------------------------------------------------

    def submit(self, x):
        """Enqueue one waveform; returns a Future of {'s', 'n',
        'latency_s', 'batch_size'} (float32 arrays trimmed to len(x))."""
        x = np.asarray(x, np.float32)
        if x.ndim != 1 or len(x) == 0:
            raise ValueError("submit expects a non-empty 1-D waveform")
        if not np.all(np.isfinite(x)):
            raise ValueError("waveform contains non-finite samples")
        req = _Request(x=x, t_submit=time.perf_counter(),
                       n_frames=frame_count(len(x)))
        with self._cv:
            if self._closed:
                raise RuntimeError("service is closed")
            mq = self._serve.max_queue
            if mq and len(self._queue) >= mq:
                raise QueueFullError(
                    f"{len(self._queue)} requests waiting "
                    f"(ServeConfig.max_queue={mq})")
            self._rid += 1
            req.rid = self._rid
            self._queue.append(req)
            self._cv.notify()
        return req.future

    def enhance(self, x):
        return self.submit(x).result()

    def stats(self):
        """Serving counters: request count, mean batch size, latency
        percentiles (seconds)."""
        with self._cv:
            snap = list(self._lat)   # O(window) copy; sort outside the lock
            n_total = self._n_total
        if not snap:
            return {"requests": n_total, "batches": self._batches}
        lat = sorted(l for l, _ in snap)
        bs = [b for _, b in snap]

        def pct(p):
            return lat[min(len(lat) - 1, int(p / 100 * len(lat)))]

        return {
            "requests": n_total, "window": len(lat),
            "batches": self._batches,
            "mean_batch": float(np.mean(bs)),
            "p50_s": pct(50), "p95_s": pct(95), "max_s": lat[-1],
        }

    def warmup(self, buckets=(128, 256, 512), batch_sizes=None):
        """Pre-compile the (batch, bucket) shape lattice so steady-state
        serving never pays a jit compile (the persistent XLA cache makes
        this one-time per machine). Returns elapsed seconds; call
        `reset_stats()` afterwards if the warmup traffic should not count."""
        t0 = time.perf_counter()
        for n_pad in buckets:
            T = (n_pad - 4) * HOP
            for B in (batch_sizes or self._serve.batch_lattice):
                reqs = [
                    _Request(x=np.full(T, 1e-3, np.float32), rid=0,
                             t_submit=time.perf_counter(),
                             n_frames=frame_count(T))
                    for _ in range(B)
                ]
                self._run_bucket(n_pad, reqs)
                for r in reqs:
                    r.future.result()
        return time.perf_counter() - t0

    def reset_stats(self):
        with self._cv:
            self._lat.clear()
            self._n_total = 0
            self._batches = 0

    def close(self, timeout=60.0):
        """Drain the queue, stop the worker. Idempotent."""
        with self._cv:
            if self._closed:
                return
            self._closed = True
            self._cv.notify_all()
        self._worker.join(timeout)
        self._fetcher.join(timeout)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # ---- collector / device loop ----------------------------------------

    def _collect(self):
        """Block for the first request, then hold the group open for up to
        max_wait_ms (or until max_batch arrive). Returns [] on shutdown."""
        sv = self._serve
        with self._cv:
            while not self._queue and not self._closed:
                self._cv.wait(0.1)
            if not self._queue:
                return []
            deadline = time.perf_counter() + sv.max_wait_ms / 1e3
            while (len(self._queue) < sv.max_batch
                   and not self._closed):
                left = deadline - time.perf_counter()
                if left <= 0:
                    break
                self._cv.wait(left)
            group = []
            while self._queue and len(group) < sv.max_batch:
                group.append(self._queue.popleft())
            return group

    def _loop(self):
        """Collector: groups requests and dispatches device programs.
        jax dispatch is async, so the collector moves on to assembling
        the next batch while the device computes; the fetcher thread
        blocks on results. The bounded in-flight queue caps device
        memory exactly like pipeline.enhance_files' MAX_INFLIGHT."""
        while True:
            group = self._collect()
            if not group:
                with self._cv:
                    if self._closed and not self._queue:
                        self._inflight.put(None)        # fetcher sentinel
                        return
                continue
            for n_pad, reqs in self._plan_groups(group):
                try:
                    handles = self._dispatch_bucket(n_pad, reqs)
                    self._inflight.put((handles, reqs))
                except Exception as e:      # resolve rather than wedge
                    for r in reqs:
                        if not r.future.done():
                            r.future.set_exception(e)

    def _fetch_loop(self):
        while True:
            item = self._inflight.get()
            if item is None:
                return
            handles, reqs = item
            try:
                self._resolve_bucket(handles, reqs)
            except Exception as e:
                for r in reqs:
                    if not r.future.done():
                        r.future.set_exception(e)

    def _plan_groups(self, group):
        """Partition a collected group into (n_pad, requests) dispatches.

        Base policy: one group per `bucket_multiple` length bucket (keeps
        the pad waste of short members bounded). Under load, greedily
        coalesce smaller buckets upward into the longest pending one —
        compute scales with n_pad, so a request merged into a larger
        bucket wastes (n_pad - own_bucket)/n_pad of its row; merging is
        allowed while that stays ≤ max_pad_waste and the batch has room.
        One larger dispatch amortizes the fixed per-batch cost (host
        assembly + dispatch round-trip) that otherwise caps saturated
        throughput (scripts/bench_serving.py measures both policies)."""
        bm = self._serve.bucket_multiple
        buckets = {}
        for r in group:
            b = -(-r.n_frames // bm) * bm
            buckets.setdefault(b, []).append(r)
        if self._serve.max_pad_waste <= 0 or len(buckets) == 1:
            return sorted(buckets.items())
        plans = []
        pending = sorted(buckets.items(), reverse=True)
        while pending:
            n_pad, reqs = pending.pop(0)
            reqs = list(reqs)
            while pending and len(reqs) < self._serve.max_batch:
                b_next, r_next = pending[0]
                if (n_pad - b_next) / n_pad > self._serve.max_pad_waste:
                    break
                room = self._serve.max_batch - len(reqs)
                reqs.extend(r_next[:room])
                if room >= len(r_next):
                    pending.pop(0)
                else:
                    pending[0] = (b_next, r_next[room:])
            plans.append((n_pad, reqs))
        return plans

    def _dispatch_bucket(self, n_pad, reqs):
        """Host assembly + async device dispatch; returns result handles
        without blocking on the computation."""
        sv = self._serve
        B = len(reqs)
        Bp = next(b for b in sv.batch_lattice
                  if b >= max(B, self._n_dev))
        L = (n_pad - 1) * HOP + NFFT
        x_b = np.zeros((Bp, L), np.int16)
        mask_b = np.zeros((Bp, n_pad), np.float32)
        for j, r in enumerate(reqs):
            xi = np.clip(np.round(r.x * 32768.0), -32768, 32767)
            xp, nf = pad_signal_for_stft(xi.astype(np.int16))
            x_b[j, : min(len(xp), L)] = xp[:L]
            mask_b[j, :nf] = 1.0
        for j in range(B, Bp):               # benign duplicate tail rows
            x_b[j] = x_b[B - 1]
            mask_b[j] = mask_b[B - 1]
        # host-side threefry seeds, bit-identical to
        # jax.random.PRNGKey(x) under the default x64-disabled config
        # (the seed canonicalizes to int32, so the key is [0, x mod 2^32])
        # — per-request PRNGKey() calls would each be a tiny device
        # program, up to max_batch synchronous round-trips per dispatch
        seeds = [sv.seed * 1_000_003 + r.rid
                 for r in (reqs + [reqs[-1]] * (Bp - B))]
        keys = jnp.asarray(np.array(
            [[0, x & 0xFFFFFFFF] for x in seeds], np.uint32))
        use_fused = _use_fused(sv.engine, self._vae, n_pad)
        args = (
            self._vae, jnp.asarray(x_b), None, None,
            self._cls if sv.label_mode == "dnn" else None,
            self._mean if sv.label_mode == "dnn" else None,
            self._std if sv.label_mode == "dnn" else None,
            jnp.asarray(mask_b), keys, self._cfg,
        )
        kw = dict(use_fused=use_fused, noise_model=sv.noise_model,
                  fast=sv.fast, label_mode=sv.label_mode,
                  target=sv.target, quantile_fraction=0.98,
                  quantile_weight=0.999, return_noise=not use_fused,
                  soft_guidance=sv.soft_guidance, features=sv.features,
                  dnn_threshold=sv.dnn_threshold)
        if self._mesh is None:
            s_i16, n_i16, _, _, finite_ok = _enhance_waveform_jit(
                *args, **kw)
        else:
            from .pipeline import _enhance_waveform_sharded

            s_i16, n_i16, _, _, finite_ok = _enhance_waveform_sharded(
                self._mesh, *args, **kw)
        return s_i16, n_i16, finite_ok

    def _resolve_bucket(self, handles, reqs):
        s_i16, n_i16, finite_ok = handles
        B = len(reqs)
        s_np = np.asarray(s_i16, np.float32) / 32768.0
        n_np = (None if n_i16 is None
                else np.asarray(n_i16, np.float32) / 32768.0)
        ok = np.asarray(finite_ok)          # (Bp,) per-row flags
        now = time.perf_counter()
        for j, r in enumerate(reqs):
            T = len(r.x)
            if not ok[j]:                   # degrade THIS row only
                s, n = r.x.copy(), np.zeros(T, np.float32)
            else:
                s = s_np[j, :T]
                n = (r.x - s) if n_np is None else n_np[j, :T]
            lat = now - r.t_submit
            with self._cv:
                self._lat.append((lat, B))
                self._n_total += 1
            try:                            # client may have cancelled
                if not r.future.done():
                    r.future.set_result({"s": s, "n": n,
                                         "latency_s": lat,
                                         "batch_size": B})
            except Exception:               # cancel raced the done() check
                pass
        self._batches += 1

    def _run_bucket(self, n_pad, reqs):
        """Synchronous dispatch+resolve (warmup path)."""
        self._resolve_bucket(self._dispatch_bucket(n_pad, reqs), reqs)
