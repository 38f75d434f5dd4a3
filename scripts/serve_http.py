"""Deployable HTTP enhancement endpoint (wav in -> enhanced wav out).

Serves the flagship configuration (M2 + DNN classifier, SPP noise model)
from the shipped pretrained artifacts over plain HTTP via the
dynamic-batching EnhancementService — concurrent POSTs co-batch onto the
device. stdlib HTTP only; see guided_vae_nmf_tpu/http_serving.py for the
API (POST /v1/enhance, GET /healthz, GET /stats, GET /metrics).

Also serves POST /v1/enhance_stream — ONLINE enhancement (PCM16 in/out,
chunked transfer both ways, ~chunk_frames x 16 ms + 64 ms latency) via a
per-connection StreamingM2Enhancer; disable with --stream 0. With
--pooled_streams 1, concurrent stream connections share ONE batched
device program per tick (MultiStreamM2Enhancer + StreamPoolDriver)
instead of one dispatch per stream — higher per-chip stream capacity at
up to --tick_ms extra latency. Stack construction is shared with
`gvnmf serve` (http_serving.build_server).

Usage: python scripts/serve_http.py [--host 0.0.0.0] [--port 8571]
       [--models artifacts/pretrained] [--niter 100]
       [--noise_model spp] [--noise_gain 0] [--soft_labels 0] [--fast 0]
       [--wait_ms 20] [--warmup 0] [--stream 1] [--chunk_frames 8]
       [--stream_residual 0]   (causal spp2 noise tracking in the stream)
       [--pooled_streams 0] [--max_streams 8] [--tick_ms 5]
       [--data_parallel 0]     (shard requests + pooled streams over all
                                devices of the mesh)
"""

import os
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

os.environ.setdefault(
    "GVNMF_CACHE_DIR", os.path.expanduser("~/.cache/gvnmf_xla")
)

from _common import flag


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    host = flag(argv, "host", "127.0.0.1")
    port = flag(argv, "port", 8571, int)
    models = flag(argv, "models", "artifacts/pretrained")
    niter = flag(argv, "niter", 100, int)
    noise_model = flag(argv, "noise_model", "spp")
    noise_gain = flag(argv, "noise_gain", "0") in ("1", "true")
    ng_bands = flag(argv, "noise_gain_bands", 1, int)
    soft = flag(argv, "soft_labels", "0") in ("1", "true")
    fast = flag(argv, "fast", "0") in ("1", "true")
    wait_ms = flag(argv, "wait_ms", 20.0, float)
    warmup = flag(argv, "warmup", "0") in ("1", "true")
    stream = flag(argv, "stream", "1") in ("1", "true")
    chunk_frames = flag(argv, "chunk_frames", 8, int)
    residual = flag(argv, "stream_residual", "0") in ("1", "true")
    pooled = flag(argv, "pooled_streams", "0") in ("1", "true")
    max_streams = flag(argv, "max_streams", 8, int)
    tick_ms = flag(argv, "tick_ms", 5.0, float)
    data_parallel = flag(argv, "data_parallel", "0") in ("1", "true")
    profile = flag(argv, "profile", None)  # validated preset (profiles.py)

    from guided_vae_nmf_tpu.http_serving import build_server

    srv = build_server(
        models, host=host, port=port, niter=niter,
        noise_model=noise_model, noise_gain=noise_gain,
        noise_gain_bands=ng_bands, soft_labels=soft, fast=fast,
        wait_ms=wait_ms, warmup=warmup, stream=stream,
        chunk_frames=chunk_frames, stream_residual=residual,
        pooled_streams=pooled, max_streams=max_streams, tick_ms=tick_ms,
        data_parallel=data_parallel, profile=profile)
    srv.start()
    print(f"serving on http://{host}:{srv.port} "
          f"(niter={niter}, noise_model={noise_model}, "
          f"soft={soft}, fast={fast})", flush=True)
    try:
        while True:
            time.sleep(3600)
    except KeyboardInterrupt:
        pass
    finally:
        srv.close_all()


if __name__ == "__main__":
    main()
