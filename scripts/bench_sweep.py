"""Reproducible 100-utterance full-pipeline sweep benchmark (the
BASELINE.json target scenario measured in VALIDATION.md): replicates the
bundled subset test mixtures to `--n` utterances, runs `enhance_files`
(oracle-IBM M2, full niter=100 MCEM) twice — cold then warm — and prints a
JSON summary of end-to-end wav->wav realtime factors.

Usage: python scripts/bench_sweep.py [--n 100] [--batch_size 32]
       [--work /tmp/gvnmf_sweep]
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

from guided_vae_nmf_tpu.data import (
    create_test_mixtures, read_wav, speech_list,
)
from guided_vae_nmf_tpu.train.checkpoints import best_checkpoint, load_params
from guided_vae_nmf_tpu.mcem import MCEMConfig
from guided_vae_nmf_tpu.pipeline import enhance_files
from _common import backend_info, flag

SUBSET = "/root/reference/data/subset"
FS = 16000


def noise_bank():
    def make(seed, kind):
        r = np.random.RandomState(seed)
        n = r.randn(FS * 60)
        if kind == "lowpass":
            n = lfilter([1], [1, -0.9], n)
        return n / np.abs(n).max()

    return {"white": make(1, "white"), "low": make(2, "lowpass")}


def main(argv=None):
    argv = argv or sys.argv[1:]
    n_utts = flag(argv, "n", 100, int)
    batch_size = flag(argv, "batch_size", 32, int)
    fast = bool(flag(argv, "fast", 1, int))  # bf16 dumps + approx recip
    profile_dir = flag(argv, "profile")      # write an XLA trace here
    work = flag(argv, "work", "/tmp/gvnmf_sweep")
    shutil.rmtree(work, ignore_errors=True)

    # base mixtures from the subset + synthetic noise, then replicate
    proc = os.path.join(work, "proc") + "/"
    create_test_mixtures(f"{SUBSET}/raw/", proc, noise_bank(),
                         dataset_type="test", snrs=(0.0,),
                         noise_types=("white", "low"))
    base = speech_list(f"{SUBSET}/raw/", "test")
    names = []
    for i in range(n_utts):
        src = os.path.join(proc, os.path.splitext(base[i % len(base)])[0])
        rel = f"CSR-1-WSJ-0/WAV/wsj0/si_et_05/440/u{i:03d}.wav"
        dst = os.path.join(proc, os.path.splitext(rel)[0])
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        for suf in ("_x.wav", "_s.wav", "_n.wav"):
            if not os.path.exists(dst + suf):
                os.link(src + suf, dst + suf)
        names.append(rel)

    audio_sec = sum(
        len(read_wav(os.path.join(
            proc, os.path.splitext(n)[0]) + "_x.wav")[0])
        for n in names
    ) / FS
    m2 = load_params(best_checkpoint("artifacts/pretrained/M2_ibm"),
                     static={"y_dim": 513})
    cfg = MCEMConfig()  # full reference iteration counts

    t0 = time.perf_counter()
    enhance_files(names, proc, os.path.join(work, "est_cold"), m2,
                  model_type="m2", classif_type="oracle", cfg=cfg,
                  batch_size=batch_size, fast=fast)
    cold = time.perf_counter() - t0

    from contextlib import nullcontext

    from guided_vae_nmf_tpu.ops.profiling import profile_trace

    ctx = profile_trace(profile_dir) if profile_dir else nullcontext()
    t0 = time.perf_counter()
    with ctx:
        enhance_files(names, proc, os.path.join(work, "est_warm"), m2,
                      model_type="m2", classif_type="oracle", cfg=cfg,
                      batch_size=batch_size, fast=fast)
    warm = time.perf_counter() - t0

    print(json.dumps({
        **backend_info(),
        "utterances": n_utts,
        "audio_sec": round(audio_sec, 1),
        "cold_s": round(cold, 1),
        "warm_s": round(warm, 1),
        "rtf_cold": round(audio_sec / cold, 1),
        "rtf_warm": round(audio_sec / warm, 1),
    }))


if __name__ == "__main__":
    main()
