"""Concurrent-streaming capacity bench: the MultiStreamM2Enhancer pool
(one vmapped block-EM device program per tick) vs dedicated per-stream
enhancers dispatched serially (one program per stream per tick — what a
naive thread-per-stream server does, and the per-GPU-process model the
reference uses for offline sweeps, evaluate_M1.py:186-222).

Both paths run the SAME flagship streaming config (M2 + labels + SPP noise,
blockwise warm-started PEEM) over B concurrent synthetic streams fed in
real-time-ordered chunks. Reports, per B: wall per enhanced audio-second
for pooled vs serial, the pooled speedup, and the per-chip total realtime
factor (B streams x 1x audio each). A realtime factor >= B means the chip
sustains B live streams.

Usage: python scripts/bench_multistream.py [--streams 2,4,8] [--seconds 8]
       [--chunk_frames 4] [--context_frames 24] [--label_mode timo]
"""

import json
import os
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

os.environ.setdefault(
    "GVNMF_CACHE_DIR", os.path.expanduser("~/.cache/gvnmf_xla")
)

import numpy as np

from _common import backend_info, flag

FS = 16000


def _signal(seed, n):
    rng = np.random.RandomState(seed)
    t = np.arange(n) / FS
    s = 0.1 * np.sin(2 * np.pi * np.cumsum(
        120 + 30 * np.sin(2 * np.pi * (0.7 + 0.1 * seed) * t)) / FS)
    s *= np.clip(np.sin(2 * np.pi * 1.6 * t + seed), 0, None)
    return (s + 0.02 * rng.randn(n)).astype(np.float32)


def _run_pooled(dgm, kw, sigs, chunk_samples, max_streams, mesh=None):
    from guided_vae_nmf_tpu.streaming import MultiStreamM2Enhancer

    pool = MultiStreamM2Enhancer(dgm, max_streams=max_streams,
                                 mesh=mesh, **kw)
    sids = [pool.open() for _ in sigs]
    n = len(sigs[0])
    t0 = time.perf_counter()
    for lo in range(0, n, chunk_samples):
        for sid, x in zip(sids, sigs):
            pool.feed(sid, x[lo:lo + chunk_samples])
        pool.step()
    for sid in sids:
        pool.flush(sid)
        pool.close(sid)
    return time.perf_counter() - t0


def _run_serial(dgm, kw, sigs, chunk_samples):
    from guided_vae_nmf_tpu.streaming import StreamingM2Enhancer

    enhs = [StreamingM2Enhancer(dgm, **kw) for _ in sigs]
    n = len(sigs[0])
    t0 = time.perf_counter()
    for lo in range(0, n, chunk_samples):
        for enh, x in zip(enhs, sigs):
            enh.push(x[lo:lo + chunk_samples])
    for enh in enhs:
        enh.flush()
    return time.perf_counter() - t0


def main(argv=None):
    argv = argv or sys.argv[1:]
    streams = [int(b) for b in flag(argv, "streams", "2,4,8").split(",")]
    # 0 = size the pool to each B (full occupancy); a fixed value also
    # measures the under-occupied cost (lane buckets pad to powers of 2)
    max_streams = flag(argv, "max_streams", 0, int)
    seconds = flag(argv, "seconds", 8.0, float)
    chunk_frames = flag(argv, "chunk_frames", 4, int)
    context_frames = flag(argv, "context_frames", 24, int)
    label_mode = flag(argv, "label_mode", "timo")
    block_iters = flag(argv, "block_iters", 6, int)
    e_steps = flag(argv, "e_steps", 4, int)
    # shard the pool's lanes + resident state over the mesh data axis
    # (full-lane ticks; measures the multi-chip live-stream capacity)
    data_parallel = flag(argv, "data_parallel", "0") in ("1", "true")
    mesh = None
    if data_parallel:
        from guided_vae_nmf_tpu.parallel import make_mesh

        mesh = make_mesh()

    from _common import load_model, load_norm_stats
    from guided_vae_nmf_tpu.streaming import HOP

    kw = dict(label_mode=label_mode, chunk_frames=chunk_frames,
              context_frames=context_frames, block_iters=block_iters,
              e_steps=e_steps)
    dgm = load_model("artifacts/pretrained/M2_ibm", kind="dgm")
    if label_mode == "dnn":
        kw["classifier_params"] = load_model(
            "artifacts/pretrained/classifier_ibm", kind="classifier")
        kw["mean"], kw["std"] = load_norm_stats(
            "artifacts/pretrained/classifier_ibm")

    n = int(seconds * FS)
    chunk_samples = chunk_frames * HOP  # feed cadence = one block latency
    rows = []
    for B in streams:
        sigs = [_signal(7 + i, n) for i in range(B)]
        # warm both compiled paths (pool program + single program)
        pool_size = max_streams or B
        if mesh is not None:
            n_dev = mesh.shape["data"]
            pool_size = ((pool_size + n_dev - 1) // n_dev) * n_dev
        _run_pooled(dgm, kw, [s[: 4 * chunk_samples] for s in sigs],
                    chunk_samples, pool_size, mesh)
        _run_serial(dgm, kw, [sigs[0][: 4 * chunk_samples]], chunk_samples)
        t_pool = _run_pooled(dgm, kw, sigs, chunk_samples, pool_size, mesh)
        t_serial = _run_serial(dgm, kw, sigs, chunk_samples)
        audio_s = B * seconds
        rows.append({
            "streams": B,
            "pool_size": pool_size,
            "pooled_wall_s": round(t_pool, 3),
            "serial_wall_s": round(t_serial, 3),
            "pooled_rtf_total": round(audio_s / t_pool, 1),
            "serial_rtf_total": round(audio_s / t_serial, 1),
            "speedup": round(t_serial / t_pool, 2),
            "sustains_live": bool(audio_s / t_pool >= B),
        })
        print(json.dumps(rows[-1]))
    print(json.dumps({"bench": "multistream", **backend_info(),
                      "chunk_frames": chunk_frames,
                      "seconds": seconds, "rows": rows}))


if __name__ == "__main__":
    main()
