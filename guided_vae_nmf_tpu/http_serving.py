"""HTTP front end for the online enhancement service (stdlib-only).

The reference has no serving story (its deployment mode is batch scripts,
reference scripts/evaluate_M1.py:186-222); this framework's
:class:`~guided_vae_nmf_tpu.serving.EnhancementService` provides
dynamic-batched shared-device enhancement, and this module exposes it
over HTTP so non-Python clients can use it. No third-party dependencies:
`http.server.ThreadingHTTPServer` gives one thread per connection, each
blocking on `service.enhance()` — the service's collector thread then
co-batches concurrent requests onto the device exactly as it does for
in-process callers.

API:
  POST /v1/enhance      body = RIFF wav (16 kHz PCM16/float), response =
                        RIFF wav (PCM16) of the enhanced speech track.
                        `?track=noise` returns the noise estimate instead;
                        `?track=both` returns one run's exact Wiener
                        partition as a stereo wav (ch0 speech, ch1 noise).
                        Response headers: X-Latency-S (service-side
                        latency), X-Batch-Size (device batch the request
                        rode in).
  POST /v1/enhance_stream
                        ONLINE enhancement over one connection: body =
                        raw little-endian PCM16 mono at the service rate
                        (`audio/L16`), either `Transfer-Encoding: chunked`
                        or a plain `Content-Length` body — both are read
                        incrementally; the response streams enhanced
                        PCM16 back with chunked transfer encoding as the
                        enhancer finalizes samples (bounded latency, see
                        streaming.StreamingM2Enhancer). Full duplex: a
                        live client interleaves writes and reads. Each
                        connection gets a fresh enhancer from the
                        server's `stream_factory` (501 if not configured).
  GET  /healthz         {"status": "ok", "requests": N} once the service
                        is accepting work.
  GET  /stats           the service's latency/batching stats as JSON.
  GET  /metrics         the same counters in Prometheus text exposition
                        format (scrape surface for production monitoring).

Use :class:`EnhancementHTTPServer` programmatically or
``scripts/serve_http.py`` as the deployable entry point.
"""

import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import urlparse, parse_qs

import numpy as np

from .data.wav import read_wav, write_wav
from .serving import QueueFullError

_MAX_BODY = 64 * 1024 * 1024            # 64 MB ~ 35 min of 16 kHz PCM16


class _Handler(BaseHTTPRequestHandler):
    # set by the server factory
    service = None
    stream_factory = None       # () -> fresh streaming enhancer, or None
    stream_sem = None           # bounds concurrent streams (429 beyond)
    stream_stats = None         # shared dict: started/active/done/samples
    stream_lock = None          # guards stream_stats mutations/snapshots
    fs = 16000
    quiet = True

    protocol_version = "HTTP/1.1"
    # per-connection socket timeout: idle/slow clients release their
    # handler thread instead of pinning it forever (thread-per-connection
    # server; front public deployments with a reverse proxy for connection
    # caps/TLS)
    timeout = 120
    # how much of an unread (rejected) body to drain so the error response
    # survives instead of racing a TCP reset
    _DRAIN_LIMIT = 8 * 1024 * 1024
    _body_left = 0

    def log_message(self, fmt, *args):   # stdlib default logs every hit
        if not self.quiet:
            super().log_message(fmt, *args)

    # ---- helpers ---------------------------------------------------------

    def _send(self, code, body, ctype="application/json", headers=()):
        self.send_response(code)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        for k, v in headers:
            self.send_header(k, v)
        self.end_headers()
        self.wfile.write(body)

    def _send_json(self, code, obj):
        self._send(code, json.dumps(obj).encode())

    def _error(self, code, msg):
        # error paths may leave the request body unread: drain moderate
        # bodies so keep-alive stays usable and the response isn't lost
        # to a TCP reset; beyond the drain limit, advertise and perform a
        # connection close.
        if 0 < self._body_left <= self._DRAIN_LIMIT:
            self.rfile.read(self._body_left)
            self._body_left = 0
        headers = ()
        if self._body_left:
            self.close_connection = True
            headers = (("Connection", "close"),)
        self._send(code, json.dumps({"error": msg}).encode(),
                   headers=headers)

    # ---- routes ----------------------------------------------------------

    def do_GET(self):
        path = urlparse(self.path).path
        if path == "/healthz":
            self._send_json(200, {
                "status": "ok",
                "requests": self.service.stats().get("requests", 0),
            })
        elif path == "/stats":
            stats = dict(self.service.stats())
            if self.stream_stats is not None:
                with self.stream_lock:
                    stats["streams"] = dict(self.stream_stats)
            self._send_json(200, stats)
        elif path == "/metrics":
            self._send(200, self._prometheus().encode(),
                       ctype="text/plain; version=0.0.4")
        else:
            self._error(404, f"unknown path {path}")

    def _prometheus(self):
        """The /stats counters in Prometheus text exposition format
        (counters suffixed _total, latency quantiles as a summary) — the
        scrape surface production deployments expect; same source dicts
        as /stats."""
        s = self.service.stats()
        lines = [
            "# TYPE gvnmf_requests_total counter",
            f"gvnmf_requests_total {s.get('requests', 0)}",
            "# TYPE gvnmf_batches_total counter",
            f"gvnmf_batches_total {s.get('batches', 0)}",
        ]
        if "mean_batch" in s:
            lines += [
                "# TYPE gvnmf_batch_size_mean gauge",
                f"gvnmf_batch_size_mean {s['mean_batch']:.6g}",
                "# TYPE gvnmf_request_latency_seconds summary",
                'gvnmf_request_latency_seconds{quantile="0.5"} '
                f"{s['p50_s']:.6g}",
                'gvnmf_request_latency_seconds{quantile="0.95"} '
                f"{s['p95_s']:.6g}",
                'gvnmf_request_latency_seconds{quantile="1"} '
                f"{s['max_s']:.6g}",
            ]
        if self.stream_stats is not None:
            with self.stream_lock:               # consistent snapshot
                st = dict(self.stream_stats)
            lines += [
                "# TYPE gvnmf_streams_started_total counter",
                f"gvnmf_streams_started_total {st.get('started', 0)}",
                "# TYPE gvnmf_streams_done_total counter",
                f"gvnmf_streams_done_total {st.get('done', 0)}",
                "# TYPE gvnmf_streams_aborted_total counter",
                f"gvnmf_streams_aborted_total {st.get('aborted', 0)}",
                "# TYPE gvnmf_streams_active gauge",
                f"gvnmf_streams_active {st.get('active', 0)}",
                "# TYPE gvnmf_stream_samples_in_total counter",
                f"gvnmf_stream_samples_in_total {st.get('samples_in', 0)}",
            ]
        return "\n".join(lines) + "\n"

    def do_POST(self):
        url = urlparse(self.path)
        chunked = "chunked" in (
            self.headers.get("Transfer-Encoding") or "").lower()
        if url.path == "/v1/enhance_stream":
            return self._do_enhance_stream(chunked)
        if chunked:                              # unknown framing: close
            self._body_left = _MAX_BODY + 1
            return self._error(400, "chunked body only on /v1/enhance_stream")
        try:
            length = int(self.headers.get("Content-Length", "0"))
        except ValueError:
            self._body_left = _MAX_BODY + 1      # unknown framing: close
            return self._error(400, "bad Content-Length")
        self._body_left = max(0, length)
        if url.path != "/v1/enhance":
            return self._error(404, f"unknown path {url.path}")
        if length <= 0:
            return self._error(400, "empty body (expected RIFF wav)")
        if length > _MAX_BODY:
            return self._error(413, f"body over {_MAX_BODY} bytes")
        body = self.rfile.read(length)
        self._body_left = 0

        try:
            x, fs = read_wav(io.BytesIO(body))
        except Exception as e:
            return self._error(400, f"not a readable RIFF wav: {e}")
        if fs != self.fs:
            return self._error(
                400, f"sample rate {fs} != service rate {self.fs}")
        if x.ndim > 1:                   # multi-channel: first channel,
            x = x[:, 0]                  # matching the noise-DB convention
        x = np.ascontiguousarray(x, np.float32)
        if x.size == 0:
            return self._error(400, "zero-length audio")
        if not np.all(np.isfinite(x)):
            return self._error(400, "waveform contains non-finite samples")

        track = parse_qs(url.query).get("track", ["speech"])[0]
        if track not in ("speech", "noise", "both"):
            return self._error(400, f"unknown track {track!r}")
        try:
            out = self.service.enhance(x)
        except QueueFullError as e:      # backpressure: retry with backoff
            return self._send(
                429, json.dumps({"error": str(e)}).encode(),
                headers=(("Retry-After", "1"),))
        except RuntimeError as e:        # closed service
            return self._error(503, str(e))
        if track == "both":
            # one run's exact Wiener partition as a stereo wav:
            # ch0 = speech, ch1 = noise (s + n reconstructs the mixture)
            y = np.stack([out["s"], out["n"]], axis=1)
        else:
            y = out["n" if track == "noise" else "s"]
        buf = io.BytesIO()
        write_wav(buf, y, self.fs)
        self._send(
            200, buf.getvalue(), ctype="audio/wav",
            headers=(("X-Latency-S", f"{out['latency_s']:.4f}"),
                     ("X-Batch-Size", str(out["batch_size"]))),
        )

    # ---- online streaming route ------------------------------------------

    def _iter_chunked(self):
        """Decode a `Transfer-Encoding: chunked` request body from rfile,
        yielding payload blocks as they arrive (http.server does not
        decode chunked requests itself).

        Raises ValueError on truncated or malformed framing so the
        handler aborts the stream (truncated chunked response + close)
        instead of flushing and writing a valid terminating chunk — a
        framing error must not look like a successful complete response.
        Only a proper 0-size final chunk ends the body cleanly."""
        while True:
            line = self.rfile.readline(8192)
            if not line:
                raise ValueError("chunked body truncated (EOF in framing)")
            if not line.endswith(b"\n"):     # size line over 8 KB
                raise ValueError("chunk-size line too long")
            try:
                size = int(line.split(b";")[0].strip() or b"0", 16)
            except ValueError:
                raise ValueError(f"malformed chunk size {line[:32]!r}")
            if size < 0:   # int(b'-8', 16) parses; it is not valid framing
                raise ValueError(f"negative chunk size {size}")
            if size == 0:
                while True:                  # optional trailers, then CRLF
                    t = self.rfile.readline(1024)
                    if t in (b"\r\n", b"\n"):
                        return
                    if not t:
                        raise ValueError(
                            "chunked body truncated (EOF in trailers)")
            left = size
            while left:
                blk = self.rfile.read1(min(left, 65536))
                if not blk:
                    raise ValueError(
                        "chunked body truncated (EOF in payload)")
                left -= len(blk)
                yield blk
            if len(self.rfile.read(2)) < 2:  # chunk-terminating CRLF
                raise ValueError(
                    "chunked body truncated (EOF at chunk CRLF)")

    def _iter_sized(self, length):
        """Yield a Content-Length body incrementally (read1: emit what
        the socket has rather than blocking for a full block)."""
        left = length
        while left:
            blk = self.rfile.read1(min(left, 65536))
            if not blk:
                return
            left -= len(blk)
            yield blk

    def _do_enhance_stream(self, chunked):
        if self.stream_factory is None:
            self._body_left = _MAX_BODY + 1  # cannot drain an open stream
            return self._error(501, "streaming not configured "
                                    "(server has no stream_factory)")
        if not self.stream_sem.acquire(blocking=False):
            # every live stream holds device programs; beyond the cap the
            # client should retry (mirrors the batch route's 429)
            self._body_left = _MAX_BODY + 1
            self.send_response_only(429)
            self.send_header("Retry-After", "1")
            body = json.dumps({"error": "stream capacity reached"}).encode()
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.send_header("Connection", "close")
            self.close_connection = True
            self.end_headers()
            self.wfile.write(body)
            return
        try:
            self._enhance_stream_locked(chunked)
        finally:
            self.stream_sem.release()

    def _enhance_stream_locked(self, chunked):
        if chunked:
            reader = self._iter_chunked()
        else:
            try:
                length = int(self.headers.get("Content-Length", ""))
            except ValueError:
                self._body_left = _MAX_BODY + 1
                return self._error(
                    411, "need Content-Length or Transfer-Encoding: chunked")
            if length <= 0:
                return self._error(400, "empty body (expected PCM16)")
            if length > _MAX_BODY:
                self._body_left = _MAX_BODY + 1
                return self._error(413, f"body over {_MAX_BODY} bytes")
            self._body_left = length         # drained by _iter_sized below
            reader = self._iter_sized(length)
        try:
            enhancer = self.stream_factory()
        except Exception as e:
            self._body_left = _MAX_BODY + 1
            return self._error(500, f"stream enhancer init failed: {e}")
        st = self.stream_stats
        with self.stream_lock:
            st["started"] += 1
            st["active"] += 1

        def emit(samples):
            if samples.size == 0:
                return
            pcm = np.clip(np.round(np.asarray(samples) * 32768.0),
                          -32768, 32767).astype("<i2").tobytes()
            self.wfile.write(f"{len(pcm):x}\r\n".encode() + pcm + b"\r\n")

        # every exit from here on is counted exactly once as 'done' or
        # 'aborted' and always decrements 'active' — including header-write
        # failures (client gone before the 200) and the over-limit cut
        total = 0
        carry = b""                          # odd-byte PCM16 alignment
        outcome = "aborted"
        try:
            self.send_response(200)
            self.send_header("Content-Type",
                             f"audio/L16; rate={self.fs}; channels=1")
            self.send_header("Transfer-Encoding", "chunked")
            self.send_header("X-Chunk-Frames", str(enhancer.chunk_frames))
            self.end_headers()
            for blk in reader:
                total += len(blk)
                if total > _MAX_BODY:        # 200 already sent: cut the
                    self.close_connection = True   # stream, no trailer
                    return
                buf = carry + blk
                n = len(buf) & ~1
                carry = buf[n:]
                if n:
                    x = np.frombuffer(buf[:n], "<i2").astype(np.float32)
                    emit(enhancer.push(x / 32768.0))
            emit(enhancer.flush())
            self.wfile.write(b"0\r\n\r\n")   # final chunk
            self._body_left = 0
            outcome = "done"
            with self.stream_lock:
                st["samples_in"] += total // 2
        except Exception:
            # mid-stream failure after 200: the only valid signal is a
            # truncated chunked body + connection close
            self.close_connection = True
        finally:
            # pooled sessions hold a shared slot: release it on abort
            # (no-op after a completed flush, and for plain enhancers)
            close = getattr(enhancer, "close", None)
            if close is not None:
                try:
                    close()
                except Exception:
                    pass
            with self.stream_lock:
                st[outcome] += 1
                st["active"] -= 1


class EnhancementHTTPServer:
    """Threaded HTTP wrapper around an EnhancementService.

    >>> srv = EnhancementHTTPServer(service, port=0)   # 0 = ephemeral
    >>> srv.start()
    >>> srv.port                                        # bound port
    >>> srv.close()                                     # stops HTTP only

    Closing the HTTP server does NOT close the underlying service (it may
    have in-process users); `scripts/serve_http.py` owns both lifetimes.
    """

    def __init__(self, service, host="127.0.0.1", port=8571, fs=16000,
                 quiet=True, stream_factory=None, max_streams=8):
        import collections

        self._service = service
        self._stream_driver = None   # set by build_server (pooled mode)

        handler = type("BoundHandler", (_Handler,), {
            "service": service, "fs": fs, "quiet": quiet,
            # staticmethod: a bare function stored in the class dict would
            # otherwise bind as a method and receive the handler as `self`
            "stream_factory": (None if stream_factory is None
                               else staticmethod(stream_factory)),
            # each live stream holds compiled per-chunk device programs;
            # beyond the cap new streams get 429 (client retries)
            "stream_sem": threading.BoundedSemaphore(max_streams),
            # all counter mutations and scrape snapshots go through
            # stream_lock so a scrape never sees a half-applied
            # transition (started != done+aborted+active)
            "stream_stats": collections.defaultdict(int),
            "stream_lock": threading.Lock(),
        })
        self._httpd = ThreadingHTTPServer((host, port), handler)
        self._thread = None

    @property
    def port(self):
        return self._httpd.server_address[1]

    def start(self):
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True,
            name="gvnmf-http")
        self._thread.start()
        return self

    def close(self):
        if self._thread is not None:     # shutdown() blocks on an event
            self._httpd.shutdown()       # only serve_forever() ever sets
            self._thread.join(timeout=10)
        self._httpd.server_close()

    def close_all(self):
        """Close the HTTP front end AND the underlying service (drains
        in-flight requests) and, when `build_server` attached one, the
        stream pool's ticker thread. Use for stacks owned end-to-end
        (scripts/serve_http.py, `gvnmf serve`); plain `close()` keeps the
        service alive for other in-process users."""
        self.close()
        if self._stream_driver is not None:
            self._stream_driver.shutdown()
        self._service.close()


def build_server(models_dir, host="127.0.0.1", port=8571, niter=100,
                 noise_model="spp", noise_gain=False, noise_gain_bands=1,
                 soft_labels=False, fast=False, wait_ms=20.0, warmup=False,
                 stream=True, chunk_frames=8, stream_residual=False,
                 pooled_streams=False, max_streams=8, tick_ms=5.0,
                 data_parallel=False, profile=None):
    """Assemble the full serving stack from a pretrained-models directory
    (M2_ibm/ + classifier_ibm/): EnhancementService + optional streaming
    endpoint (dedicated or pooled) + the HTTP front end. Shared by
    `scripts/serve_http.py` and `gvnmf serve` — returns the (unstarted)
    EnhancementHTTPServer; its `close_all()` tears down the whole stack
    (HTTP + pool ticker + service drain). `data_parallel=True` shards
    BOTH serving paths over all devices: request batches via the
    service's mesh dispatch, and the stream pool's lanes + resident
    state over the mesh data axis (max_streams is rounded up to a
    multiple of the device count)."""
    import os

    from .mcem import MCEMConfig
    from .serving import EnhancementService, ServeConfig
    from .train import load_model, load_norm_stats

    # stream lanes may diverge from the offline service under a
    # streaming-only profile
    stream_soft, stream_gain = soft_labels, noise_gain
    stream_bands = noise_gain_bands
    stream_adaptive = 0
    if profile is not None:
        # validated preset (profiles.py): authoritative for the managed
        # knobs on both serving paths; a streaming-only profile leaves
        # the request/batch path at its flags
        from .profiles import get_profile

        prof = get_profile(profile)
        if prof.offline:
            noise_model = prof.noise_model
            soft_labels = prof.soft_guidance
            noise_gain = prof.cfg_overrides.get("noise_gain", False)
            noise_gain_bands = prof.cfg_overrides.get(
                "noise_gain_bands", 1)
        st = prof.streaming or {}
        chunk_frames = st.get("chunk_frames", chunk_frames)
        stream_residual = st.get("residual_tracking", stream_residual)
        stream_soft = st.get("soft_guidance", soft_labels)
        stream_gain = st.get("noise_gain", noise_gain)
        stream_bands = st.get("noise_gain_bands", noise_gain_bands)
        stream_adaptive = st.get("adaptive_iters", 0)

    mesh = None
    if data_parallel:
        from .parallel import make_mesh

        mesh = make_mesh()
        n_dev = mesh.shape["data"]
        max_streams = ((max_streams + n_dev - 1) // n_dev) * n_dev

    from .train.checkpoints import load_classifier_meta

    m2 = load_model(os.path.join(models_dir, "M2_ibm"), kind="dgm")
    cls = load_model(os.path.join(models_dir, "classifier_ibm"),
                     kind="classifier")
    mean, std = load_norm_stats(os.path.join(models_dir, "classifier_ibm"))
    # the classifier's shipped protocol (features / calibrated threshold)
    cmeta = load_classifier_meta(os.path.join(models_dir, "classifier_ibm"))

    svc = EnhancementService(
        m2, classifier_params=cls, mean=mean, std=std,
        cfg=MCEMConfig(niter=niter, noise_gain=noise_gain,
                       noise_gain_bands=noise_gain_bands),
        mesh=mesh,
        serve=ServeConfig(max_wait_ms=wait_ms, label_mode="dnn",
                          noise_model=noise_model,
                          soft_guidance=soft_labels, fast=fast,
                          features=cmeta["features"],
                          dnn_threshold=cmeta["threshold"]),
    )
    if warmup:
        print(f"warmup: {svc.warmup():.1f}s", flush=True)
        svc.reset_stats()

    stream_factory = None
    driver = None
    stream_kw = dict(classifier_params=cls, mean=mean, std=std,
                     chunk_frames=chunk_frames, soft_guidance=stream_soft,
                     residual_tracking=stream_residual,
                     noise_gain=stream_gain,
                     noise_gain_bands=stream_bands,
                     adaptive_iters=stream_adaptive, label_mode="dnn",
                     features=cmeta["features"],
                     dnn_threshold=cmeta["threshold"],
                     # HTTP streams never expose masks; with the
                     # prefix-trimming this makes indefinite live
                     # connections fully bounded-memory
                     keep_masks=False)
    if stream and pooled_streams:
        from .streaming import (
            MultiStreamM2Enhancer, PooledStreamSession, StreamPoolDriver,
        )

        driver = StreamPoolDriver(
            MultiStreamM2Enhancer(m2, max_streams=max_streams,
                                  mesh=mesh, **stream_kw),
            tick_ms=tick_ms)

        def stream_factory():
            return PooledStreamSession(driver)
    elif stream:
        from .streaming import StreamingM2Enhancer

        def stream_factory():
            return StreamingM2Enhancer(m2, **stream_kw)

    srv = EnhancementHTTPServer(svc, host=host, port=port, quiet=False,
                                stream_factory=stream_factory,
                                max_streams=max_streams)
    srv._stream_driver = driver          # close_all() owns the stack
    return srv
