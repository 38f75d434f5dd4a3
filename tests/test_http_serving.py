"""HTTP front end (guided_vae_nmf_tpu/http_serving.py): a real client
(urllib over a bound ephemeral port) drives POST /v1/enhance with RIFF
bodies against a live EnhancementService, plus healthz/stats and every
rejection path."""

import io
import json
import urllib.error
import urllib.request

import numpy as np
import jax
import pytest

from guided_vae_nmf_tpu.data.wav import read_wav, write_wav
from guided_vae_nmf_tpu.http_serving import EnhancementHTTPServer
from guided_vae_nmf_tpu.mcem import MCEMConfig
from guided_vae_nmf_tpu.models import vae_init
from guided_vae_nmf_tpu.serving import EnhancementService, ServeConfig

F, L, H = 513, 8, 16
CFG = MCEMConfig(niter=2, nsamples_E_step=2, burnin_E_step=1,
                 nsamples_WF=2, burnin_WF=1, nmf_rank=2)
SV = ServeConfig(engine="xla", label_mode="none", noise_model="nmf",
                 max_wait_ms=20.0)


@pytest.fixture(scope="module")
def server():
    m1 = vae_init(jax.random.PRNGKey(0), [F, L, [H]])
    svc = EnhancementService(m1, cfg=CFG, serve=SV)
    srv = EnhancementHTTPServer(svc, port=0).start()   # ephemeral port
    yield srv
    srv.close()
    svc.close()


def _wav_bytes(x, fs=16000):
    buf = io.BytesIO()
    write_wav(buf, x, fs)
    return buf.getvalue()


def _post(srv, body, path="/v1/enhance"):
    req = urllib.request.Request(
        f"http://127.0.0.1:{srv.port}{path}", data=body,
        headers={"Content-Type": "audio/wav"})
    return urllib.request.urlopen(req, timeout=300)


def test_enhance_roundtrip(server):
    rng = np.random.RandomState(0)
    x = (0.1 * rng.randn(8000)).astype(np.float32)
    resp = _post(server, _wav_bytes(x))
    assert resp.status == 200
    assert resp.headers["Content-Type"] == "audio/wav"
    assert float(resp.headers["X-Latency-S"]) > 0
    s, fs = read_wav(io.BytesIO(resp.read()))
    assert fs == 16000 and s.shape == x.shape
    assert np.all(np.isfinite(s))

    # noise track (independent request -> independent MH run): shape only
    resp_n = _post(server, _wav_bytes(x), path="/v1/enhance?track=noise")
    n, _ = read_wav(io.BytesIO(resp_n.read()))
    assert n.shape == x.shape and np.all(np.isfinite(n))

    # track=both: ONE run's exact Wiener partition as a stereo wav —
    # s + n reconstructs the (PCM16-quantized) request body
    resp_b = _post(server, _wav_bytes(x), path="/v1/enhance?track=both")
    sn, _ = read_wav(io.BytesIO(resp_b.read()))
    assert sn.shape == (len(x), 2)
    xq = np.round(x * 32768.0) / 32768.0        # body was PCM16-quantized
    np.testing.assert_allclose(sn.sum(axis=1), xq, atol=4.0 / 32768.0)


def test_healthz_and_stats(server):
    with urllib.request.urlopen(
            f"http://127.0.0.1:{server.port}/healthz", timeout=60) as r:
        h = json.loads(r.read())
    assert h["status"] == "ok"
    with urllib.request.urlopen(
            f"http://127.0.0.1:{server.port}/stats", timeout=60) as r:
        st = json.loads(r.read())
    assert st["requests"] >= 1          # roundtrip test above counted


def test_rejections(server):
    def code_of(body=b"", path="/v1/enhance", method="POST"):
        req = urllib.request.Request(
            f"http://127.0.0.1:{server.port}{path}",
            data=body if method == "POST" else None)
        try:
            with urllib.request.urlopen(req, timeout=60) as r:
                return r.status
        except urllib.error.HTTPError as e:
            e.read()
            return e.code

    assert code_of(b"") == 400                          # empty body
    assert code_of(b"not a wav at all" * 4) == 400      # unparseable
    assert code_of(_wav_bytes(np.zeros(100), fs=8000)) == 400  # wrong rate
    assert code_of(_wav_bytes(np.ones(100)), "/v1/enhance?track=x") == 400
    assert code_of(_wav_bytes(np.ones(100)), "/v1/other") == 404
    assert code_of(path="/nope", method="GET") == 404


def test_multichannel_takes_first_channel(server):
    rng = np.random.RandomState(1)
    stereo = (0.1 * rng.randn(6000, 2)).astype(np.float32)
    resp = _post(server, _wav_bytes(stereo))
    s, _ = read_wav(io.BytesIO(resp.read()))
    assert s.shape == (6000,)


def test_concurrent_clients_cobatch(server):
    """Concurrent POSTs must all succeed and ride shared device batches
    (the HTTP threads block on the same collector)."""
    import concurrent.futures as cf

    rng = np.random.RandomState(2)
    bodies = [_wav_bytes((0.1 * rng.randn(8000)).astype(np.float32))
              for _ in range(6)]
    with cf.ThreadPoolExecutor(6) as pool:
        resps = list(pool.map(lambda b: _post(server, b), bodies))
    sizes = [int(r.headers["X-Batch-Size"]) for r in resps]
    for r in resps:
        assert r.status == 200
        r.read()
    assert max(sizes) >= 2              # at least one shared batch


def test_http_429_on_queue_full():
    """A saturated queue maps to HTTP 429 + Retry-After (backpressure is
    visible to HTTP clients, not an opaque 500)."""
    import concurrent.futures as cf

    m1 = vae_init(jax.random.PRNGKey(1), [F, L, [H]])
    tight = ServeConfig(engine="xla", label_mode="none", noise_model="nmf",
                        max_wait_ms=2000.0, max_queue=1)
    svc = EnhancementService(m1, cfg=CFG, serve=tight)
    srv = EnhancementHTTPServer(svc, port=0).start()
    try:
        rng = np.random.RandomState(3)
        bodies = [_wav_bytes((0.1 * rng.randn(5000)).astype(np.float32))
                  for _ in range(12)]

        def post(b):
            try:
                with _post(srv, b) as r:
                    r.read()
                    return r.status
            except urllib.error.HTTPError as e:
                e.read()
                return e.code

        with cf.ThreadPoolExecutor(12) as pool:
            codes = list(pool.map(post, bodies))
        assert 429 in codes, codes
        assert 200 in codes, codes
    finally:
        srv.close()
        svc.close()


# ---------------------------------------------------------------------------
# POST /v1/enhance_stream — online enhancement over chunked HTTP
# ---------------------------------------------------------------------------


def _pcm16(x):
    return np.clip(np.round(np.asarray(x) * 32768.0),
                   -32768, 32767).astype("<i2").tobytes()


@pytest.fixture(scope="module")
def stream_server():
    from guided_vae_nmf_tpu.streaming import StreamingSPPEnhancer

    m1 = vae_init(jax.random.PRNGKey(0), [F, L, [H]])
    svc = EnhancementService(m1, cfg=CFG, serve=SV)
    srv = EnhancementHTTPServer(
        svc, port=0,
        stream_factory=lambda: StreamingSPPEnhancer(chunk_frames=8),
    ).start()
    yield srv
    srv.close()
    svc.close()


def _offline_reference(x):
    """Same enhancer driven directly: the HTTP byte stream must match."""
    from guided_vae_nmf_tpu.streaming import StreamingSPPEnhancer

    enh = StreamingSPPEnhancer(chunk_frames=8)
    xq = np.frombuffer(_pcm16(x), "<i2").astype(np.float32) / 32768.0
    out = [enh.push(xq), enh.flush()]
    return b"".join(_pcm16(o) for o in out if o.size)


def test_stream_content_length_roundtrip(stream_server):
    rng = np.random.RandomState(1)
    x = (0.1 * rng.randn(9000)).astype(np.float32)
    req = urllib.request.Request(
        f"http://127.0.0.1:{stream_server.port}/v1/enhance_stream",
        data=_pcm16(x), headers={"Content-Type": "audio/L16"})
    with urllib.request.urlopen(req, timeout=300) as resp:
        assert resp.status == 200
        assert resp.headers["Content-Type"].startswith("audio/L16")
        assert resp.headers.get("X-Chunk-Frames") == "8"
        body = resp.read()
    assert body == _offline_reference(x)
    y = np.frombuffer(body, "<i2")
    assert len(y) == len(x)


def test_stream_chunked_request_odd_boundaries(stream_server):
    import http.client

    rng = np.random.RandomState(2)
    x = (0.1 * rng.randn(7001)).astype(np.float32)
    pcm = _pcm16(x)
    # deliberately odd-sized chunks: the handler must re-align PCM16
    cuts = [0, 333, 334, 4097, 9000, len(pcm)]
    blocks = [pcm[a:b] for a, b in zip(cuts, cuts[1:])]
    conn = http.client.HTTPConnection(
        "127.0.0.1", stream_server.port, timeout=300)
    conn.request("POST", "/v1/enhance_stream", body=iter(blocks),
                 headers={"Content-Type": "audio/L16",
                          "Transfer-Encoding": "chunked"},
                 encode_chunked=True)
    resp = conn.getresponse()
    assert resp.status == 200
    body = resp.read()
    conn.close()
    assert body == _offline_reference(x)


def test_stream_full_duplex(stream_server):
    """Interleave: send enough audio to finalize samples, read them BEFORE
    sending the rest — proves the response streams, not buffers."""
    import socket

    rng = np.random.RandomState(3)
    x = (0.1 * rng.randn(16000)).astype(np.float32)
    pcm = _pcm16(x)
    first, rest = pcm[:12000], pcm[12000:]

    s = socket.create_connection(
        ("127.0.0.1", stream_server.port), timeout=120)
    try:
        s.sendall(
            b"POST /v1/enhance_stream HTTP/1.1\r\n"
            b"Host: x\r\nTransfer-Encoding: chunked\r\n"
            b"Content-Type: audio/L16\r\n\r\n")
        s.sendall(f"{len(first):x}\r\n".encode() + first + b"\r\n")
        # read headers + the first enhanced chunk with the body unfinished
        got = b""
        while b"\r\n\r\n" not in got:
            got += s.recv(65536)
        head, tail = got.split(b"\r\n\r\n", 1)
        assert b"200" in head.split(b"\r\n", 1)[0]
        assert b"Transfer-Encoding: chunked" in head
        while b"\r\n" not in tail:      # first chunk-size line
            tail += s.recv(65536)
        first_chunk = int(tail.split(b"\r\n", 1)[0], 16)
        assert first_chunk > 0          # samples arrived before body end
        # finish the request and drain the rest
        s.sendall(f"{len(rest):x}\r\n".encode() + rest + b"\r\n"
                  + b"0\r\n\r\n")
        while b"0\r\n\r\n" not in tail:
            blk = s.recv(65536)
            if not blk:
                break
            tail += blk
    finally:
        s.close()
    # reassemble the chunked payload and compare with the direct drive
    payload = b""
    while tail:
        if b"\r\n" not in tail:
            break
        line, tail = tail.split(b"\r\n", 1)
        n = int(line or b"0", 16)
        if n == 0:
            break
        payload, tail = payload + tail[:n], tail[n + 2:]
    assert payload == _offline_reference(x)


def test_stream_not_configured_501(server):
    req = urllib.request.Request(
        f"http://127.0.0.1:{server.port}/v1/enhance_stream",
        data=b"\x00\x00" * 100, headers={"Content-Type": "audio/L16"})
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req, timeout=60)
    assert ei.value.code == 501


def test_stream_capacity_429_and_stats():
    """max_streams=1: a held-open stream makes the next one 429; /stats
    exposes the stream counters."""
    import json as _json
    import socket

    from guided_vae_nmf_tpu.streaming import StreamingSPPEnhancer

    m1 = vae_init(jax.random.PRNGKey(0), [F, L, [H]])
    svc = EnhancementService(m1, cfg=CFG, serve=SV)
    srv = EnhancementHTTPServer(
        svc, port=0, max_streams=1,
        stream_factory=lambda: StreamingSPPEnhancer(chunk_frames=8),
    ).start()
    try:
        hold = socket.create_connection(("127.0.0.1", srv.port), timeout=60)
        hold.sendall(b"POST /v1/enhance_stream HTTP/1.1\r\nHost: x\r\n"
                     b"Transfer-Encoding: chunked\r\n\r\n")
        hold.sendall(b"400\r\n" + b"\x01\x00" * 512 + b"\r\n")
        # wait until the first stream's 200 headers prove the slot is held
        got = b""
        while b"\r\n\r\n" not in got:
            got += hold.recv(65536)
        assert b"200" in got.split(b"\r\n", 1)[0]

        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/v1/enhance_stream",
            data=b"\x01\x00" * 256, headers={"Content-Type": "audio/L16"})
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=60)
        assert ei.value.code == 429
        assert ei.value.headers.get("Retry-After") == "1"

        with urllib.request.urlopen(
                f"http://127.0.0.1:{srv.port}/stats", timeout=60) as r:
            stats = _json.loads(r.read())
        assert stats["streams"]["active"] == 1
        assert stats["streams"]["started"] == 1

        hold.sendall(b"0\r\n\r\n")           # finish the held stream
        while b"0\r\n\r\n" not in got:
            blk = hold.recv(65536)
            if not blk:
                break
            got += blk
        hold.close()

        with urllib.request.urlopen(
                f"http://127.0.0.1:{srv.port}/stats", timeout=60) as r:
            stats = _json.loads(r.read())
        assert stats["streams"]["active"] == 0
        assert stats["streams"]["done"] == 1
    finally:
        srv.close()
        svc.close()


@pytest.fixture()
def fresh_stream_server():
    """Per-test server: stream stats start at zero."""
    from guided_vae_nmf_tpu.streaming import StreamingSPPEnhancer

    m1 = vae_init(jax.random.PRNGKey(0), [F, L, [H]])
    svc = EnhancementService(m1, cfg=CFG, serve=SV)
    srv = EnhancementHTTPServer(
        svc, port=0,
        stream_factory=lambda: StreamingSPPEnhancer(chunk_frames=8),
    ).start()
    yield srv
    srv.close()
    svc.close()


def _stream_stats(srv):
    with urllib.request.urlopen(
            f"http://127.0.0.1:{srv.port}/stats", timeout=60) as r:
        return json.loads(r.read())["streams"]


def _raw_stream_post(port, payload_after_headers, timeout=60):
    """Open /v1/enhance_stream with chunked framing, send raw bytes, and
    return everything the server sends back until it closes or 3 s of
    silence."""
    import socket

    s = socket.create_connection(("127.0.0.1", port), timeout=timeout)
    try:
        s.sendall(b"POST /v1/enhance_stream HTTP/1.1\r\nHost: x\r\n"
                  b"Content-Type: audio/L16\r\n"
                  b"Transfer-Encoding: chunked\r\n\r\n")
        s.sendall(payload_after_headers)
        s.settimeout(3)
        got = b""
        try:
            while True:
                blk = s.recv(65536)
                if not blk:
                    break
                got += blk
        except TimeoutError:
            pass
        return got
    finally:
        s.close()


def _wait_stream_quiesced(srv, deadline_s=30):
    import time

    t0 = time.time()
    while time.time() - t0 < deadline_s:
        st = _stream_stats(srv)
        if st.get("active", 0) == 0 and st.get("started", 0) > 0:
            return st
        time.sleep(0.1)
    raise AssertionError(f"stream never quiesced: {st}")


def test_stream_malformed_framing_aborts_not_done(fresh_stream_server):
    """A garbage chunk-size line must cut the stream (no clean 0-chunk
    terminator) and count it as aborted — a framing error must not look
    like a successful complete response."""
    srv = fresh_stream_server
    pcm = b"\x01\x00" * 512
    got = _raw_stream_post(
        srv.port,
        f"{len(pcm):x}\r\n".encode() + pcm + b"\r\n" + b"zzzz\r\n")
    assert b"200" in got.split(b"\r\n", 1)[0]    # headers were sent
    assert not got.endswith(b"0\r\n\r\n")        # but NOT cleanly terminated
    st = _wait_stream_quiesced(srv)
    assert st["aborted"] == 1 and st.get("done", 0) == 0


def test_stream_oversize_chunk_ext_aborts(fresh_stream_server):
    """An RFC-legal but absurdly long chunk-extension line (> the reader's
    bound) must abort, never silently shift payload bytes into the PCM."""
    srv = fresh_stream_server
    line = (b"400;ext=" + b"a" * 9000 + b"\r\n")
    got = _raw_stream_post(srv.port, line + b"\x01\x00" * 512 + b"\r\n")
    assert not got.endswith(b"0\r\n\r\n")
    st = _wait_stream_quiesced(srv)
    assert st["aborted"] == 1 and st.get("done", 0) == 0


def test_stream_truncated_body_aborts(fresh_stream_server):
    """Closing the connection mid-chunk (EOF in payload) is truncation,
    not a clean end-of-stream."""
    srv = fresh_stream_server
    # claim 0x400 bytes, send half, close
    got = _raw_stream_post(srv.port, b"400\r\n" + b"\x01\x00" * 256)
    assert not got.endswith(b"0\r\n\r\n")
    st = _wait_stream_quiesced(srv)
    assert st["aborted"] == 1 and st.get("done", 0) == 0


def test_stream_empty_body_clean_200(fresh_stream_server):
    """A chunked request terminated before any payload is a valid empty
    stream: clean 200 with an empty chunked body, counted as done."""
    srv = fresh_stream_server
    got = _raw_stream_post(srv.port, b"0\r\n\r\n")
    assert b"200" in got.split(b"\r\n", 1)[0]
    assert got.endswith(b"0\r\n\r\n")            # clean terminator
    st = _wait_stream_quiesced(srv)
    assert st["done"] == 1 and st.get("aborted", 0) == 0
    assert st["active"] == 0


def test_stream_negative_chunk_size_aborts(fresh_stream_server):
    """int(b'-8', 16) parses: a negative chunk size must abort, never be
    consumed as payload (the loop would never terminate normally)."""
    srv = fresh_stream_server
    got = _raw_stream_post(srv.port, b"-8\r\n" + b"\x01\x00" * 512 + b"\r\n")
    assert not got.endswith(b"0\r\n\r\n")
    st = _wait_stream_quiesced(srv)
    assert st["aborted"] == 1 and st.get("done", 0) == 0


def test_metrics_prometheus_endpoint(fresh_stream_server):
    """GET /metrics exposes the /stats counters in Prometheus text
    exposition format and tracks a completed stream."""
    srv = fresh_stream_server
    got = _raw_stream_post(srv.port, b"0\r\n\r\n")   # one clean empty stream
    assert got.endswith(b"0\r\n\r\n")
    _wait_stream_quiesced(srv)
    with urllib.request.urlopen(
            f"http://127.0.0.1:{srv.port}/metrics", timeout=60) as r:
        assert r.headers["Content-Type"].startswith("text/plain")
        body = r.read().decode()
    assert "# TYPE gvnmf_requests_total counter" in body
    assert "gvnmf_streams_started_total 1" in body
    assert "gvnmf_streams_done_total 1" in body
    assert "gvnmf_streams_active 0" in body


# ---------------------------------------------------------------------------
# Pooled streaming: concurrent connections share one batched device program
# ---------------------------------------------------------------------------


def test_pooled_streams_concurrent_clients_match_single():
    """Two concurrent /v1/enhance_stream clients against a pooled server
    (MultiStreamM2Enhancer + StreamPoolDriver): each byte stream matches a
    dedicated single-stream enhancer to PCM16 tolerance, and aborted
    connections release their pool slot."""
    import threading

    from guided_vae_nmf_tpu.models import dgm_init
    from guided_vae_nmf_tpu.streaming import (
        MultiStreamM2Enhancer, PooledStreamSession, StreamingM2Enhancer,
        StreamPoolDriver,
    )

    dgm = dgm_init(jax.random.PRNGKey(0), [F, F, 8, [32]])
    kw = dict(label_mode="timo", chunk_frames=4, context_frames=8,
              block_iters=2, e_steps=2)
    m1 = vae_init(jax.random.PRNGKey(0), [F, L, [H]])
    svc = EnhancementService(m1, cfg=CFG, serve=SV)
    driver = StreamPoolDriver(
        MultiStreamM2Enhancer(dgm, max_streams=2, **kw), tick_ms=2.0)
    srv = EnhancementHTTPServer(
        svc, port=0, max_streams=2,
        stream_factory=lambda: PooledStreamSession(driver)).start()
    try:
        def pcm16(x):
            return np.clip(np.round(np.asarray(x) * 32768.0),
                           -32768, 32767).astype("<i2").tobytes()

        rng = np.random.RandomState(3)
        sigs = [(0.1 * rng.randn(n)).astype(np.float32)
                for n in (9000, 12000)]

        refs = []
        for x in sigs:
            enh = StreamingM2Enhancer(dgm, **kw)
            xq = np.frombuffer(pcm16(x), "<i2").astype(np.float32) / 32768.0
            out = [enh.push(xq), enh.flush()]
            refs.append(np.concatenate([o for o in out if o.size]))

        bodies = {}

        def client(i):
            req = urllib.request.Request(
                f"http://127.0.0.1:{srv.port}/v1/enhance_stream",
                data=pcm16(sigs[i]), headers={"Content-Type": "audio/L16"})
            with urllib.request.urlopen(req, timeout=300) as resp:
                assert resp.status == 200
                bodies[i] = resp.read()

        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(2)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        assert sorted(bodies) == [0, 1]
        for i, x in enumerate(sigs):
            y = np.frombuffer(bodies[i], "<i2").astype(np.float32) / 32768.0
            assert len(y) == len(x)
            # pooled block EM == single-stream to float tolerance; after
            # PCM16 quantization that is +-1 LSB
            np.testing.assert_allclose(y, refs[i], atol=2.0 / 32768,
                                       err_msg=f"client {i}")

        # abort: drop a connection mid-stream; its slot must come back
        import http.client

        conn = http.client.HTTPConnection("127.0.0.1", srv.port, timeout=60)
        conn.putrequest("POST", "/v1/enhance_stream")
        conn.putheader("Content-Type", "audio/L16")
        conn.putheader("Transfer-Encoding", "chunked")
        conn.endheaders()
        conn.send(b"400\r\n" + b"\x00" * 1024 + b"\r\n")
        conn.close()                      # mid-stream drop (no trailer)
        deadline = 60
        import time as _t
        t0 = _t.time()
        while _t.time() - t0 < deadline:
            try:
                sid = driver.open()
                driver.abort(sid)
                other = driver.open()     # both slots free again
                driver.abort(other)
                break
            except RuntimeError:
                _t.sleep(0.2)
        else:
            raise AssertionError("aborted connection never released slot")
    finally:
        srv.close()
        driver.shutdown()
        svc.close()
