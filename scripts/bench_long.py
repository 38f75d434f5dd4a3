"""Long-recording benchmark: ONE continuous recording of --minutes
(default 30) enhanced on a single chip — the SURVEY §5 "very long
recordings" scenario (the reference caps at utterance scale; its
per-frame MH and NMF reductions were never run at 100k+ frames).

Builds a synthetic mixture by looping the subset test speech against
colored noise, runs the full M2-IBM MCEM sweep (niter configurable) on
the single file, and prints a JSON line with the realtime factor and the
E-step sample-buffer footprint. For recordings beyond one chip's HBM the
frame axis shards over a mesh instead (`parallel.frame_sharded_mcem`,
dryrun stage 4).

Usage: python scripts/bench_long.py [--minutes 30] [--niter 100]
       [--work /tmp/gvnmf_long]
"""

import json
import os
import shutil
import sys
import time

sys.path.insert(0, ".")

os.environ.setdefault(
    "GVNMF_CACHE_DIR", os.path.expanduser("~/.cache/gvnmf_xla")
)

import numpy as np
from scipy.signal import lfilter

from guided_vae_nmf_tpu.data import read_wav, write_wav, speech_list
from guided_vae_nmf_tpu.train.checkpoints import best_checkpoint, load_params
from guided_vae_nmf_tpu.mcem import MCEMConfig
from guided_vae_nmf_tpu.pipeline import enhance_files
from _common import backend_info, flag

SUBSET = "/root/reference/data/subset"
FS = 16000


def main(argv=None):
    argv = argv or sys.argv[1:]
    minutes = flag(argv, "minutes", 30, int)
    niter = flag(argv, "niter", 100, int)
    work = flag(argv, "work", "/tmp/gvnmf_long")
    shutil.rmtree(work, ignore_errors=True)

    # loop the subset test speech to --minutes, add colored noise at 0 dB
    base = speech_list(f"{SUBSET}/raw/", "test")
    parts = []
    for name in base:
        x, fs = read_wav(os.path.join(f"{SUBSET}/raw/", name))
        assert fs == FS
        parts.append(x[int(0.1 * FS):] / np.abs(x).max())
    s = np.concatenate(parts)
    target_len = minutes * 60 * FS
    s = np.tile(s, target_len // len(s) + 1)[:target_len]
    rng = np.random.RandomState(0)
    n = lfilter([1], [1, -0.9], rng.randn(target_len)).astype(np.float64)
    n *= np.sqrt(np.sum(s**2) / np.sum(n**2))  # 0 dB
    x = (s + n).astype(np.float32)
    peak = np.abs(x).max() * 1.01
    x, s = x / peak, (s / peak).astype(np.float32)

    rel = "CSR-1-WSJ-0/WAV/wsj0/si_et_05/440/long000.wav"
    proc = os.path.join(work, "proc") + "/"
    bp = os.path.join(proc, os.path.splitext(rel)[0])
    os.makedirs(os.path.dirname(bp), exist_ok=True)
    write_wav(bp + "_x.wav", x, FS)
    write_wav(bp + "_s.wav", s.astype(np.float32), FS)

    m2 = load_params(best_checkpoint("artifacts/pretrained/M2_ibm"),
                     static={"y_dim": 513})
    cfg = MCEMConfig(niter=niter)

    audio_sec = len(x) / FS
    n_frames = len(x) // 256 + 1
    buf_gb = cfg.nsamples_E_step * n_frames * 513 * 2 / 1e9  # bf16 dump

    t0 = time.perf_counter()
    enhance_files([rel], proc, os.path.join(work, "est"), m2,
                  model_type="m2", classif_type="oracle", cfg=cfg,
                  batch_size=32, fast=True)
    cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    enhance_files([rel], proc, os.path.join(work, "est2"), m2,
                  model_type="m2", classif_type="oracle", cfg=cfg,
                  batch_size=32, fast=True)
    warm = time.perf_counter() - t0

    print(json.dumps({
        **backend_info(),
        "minutes": minutes,
        "frames": int(n_frames),
        "niter": niter,
        "sample_buffer_gb": round(buf_gb, 2),
        "cold_s": round(cold, 1),
        "warm_s": round(warm, 1),
        "rtf_warm": round(audio_sec / warm, 1),
    }))


if __name__ == "__main__":
    main()
