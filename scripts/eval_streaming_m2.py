"""Latency/quality curve for the online M2 flagship (StreamingM2Enhancer).

Enhances the bundled QUT test mixtures through the blockwise
warm-started PEEM stream at several chunk sizes and compares each
configuration against (a) the mixture floor and (b) the OFFLINE flagship
configuration (M2 + SPP noise model) on SI-SDR/ESTOI/PESQ. Latency =
chunk_frames x 16 ms block + 64 ms STFT window.

Usage: python scripts/eval_streaming_m2.py
       [--artifacts artifacts/pretrained] [--chunks 4,8,16,32]
       [--label_mode dnn|timo] [--niter_offline 100]
       [--soft_labels 0] [--residual 0] [--noise_gain 0]
       [--skip_offline 0]

--residual 1 enables causal residual noise tracking (the streaming
analogue of the offline 'spp2' two-pass model). --noise_gain 1 learns a
per-frame noise gain inside each block (the causal analogue of
MCEMConfig.noise_gain; no cross-block delay).
"""

import os
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from guided_vae_nmf_tpu.data import read_wav, speech_list
from guided_vae_nmf_tpu.mcem import MCEMConfig
from guided_vae_nmf_tpu.metrics import energy_ratios, stoi, pesq
from guided_vae_nmf_tpu.pipeline import enhance_files
from guided_vae_nmf_tpu.streaming import StreamingM2Enhancer, FS, HOP
from _common import load_model, load_norm_stats, flag

SUB = "/root/reference/data/subset"


def mets(s, n, sh):
    L = min(len(s), len(sh))
    return (energy_ratios(sh[:L], s[:L], n[:L])[0],
            stoi(s[:L], sh[:L], FS, True), pesq(FS, s[:L], sh[:L], "wb"))


def main(argv=None):
    argv = argv or sys.argv[1:]
    artifacts = flag(argv, "artifacts", "artifacts/pretrained")
    chunks = [int(c) for c in flag(argv, "chunks", "4,8,16,32").split(",")]
    label_mode = flag(argv, "label_mode", "dnn")
    niter = flag(argv, "niter_offline", 100, int)
    work = flag(argv, "work", "/tmp/streaming_m2_eval")
    soft = flag(argv, "soft_labels", "0") in ("1", "true")
    residual = flag(argv, "residual", "0") in ("1", "true")
    noise_gain = flag(argv, "noise_gain", "0") in ("1", "true")
    ng_init = flag(argv, "noise_gain_init", "ones")
    ng_bands = flag(argv, "noise_gain_bands", 1, int)
    adaptive_iters = flag(argv, "adaptive_iters", 0, int)
    escalate_reinit = flag(argv, "escalate_reinit", "0") in ("1", "true")
    lookahead = flag(argv, "lookahead", "0") in ("1", "true")
    block_iters = flag(argv, "block_iters", 6, int)
    e_steps = flag(argv, "e_steps", 4, int)
    context = flag(argv, "context_frames", 24, int)
    skip_offline = flag(argv, "skip_offline", "0") in ("1", "true")

    profile = flag(argv, "profile", None)
    if profile is not None:
        # validated preset (profiles.py): authoritative for the managed
        # streaming knobs; label source / niter_offline keep their flags
        from guided_vae_nmf_tpu.profiles import streaming_settings

        st = streaming_settings(profile)

        def pick(key, flagged, current):
            # an EXPLICIT flag beats the profile (ablation sweeps);
            # otherwise the profile is authoritative for its knobs
            if flag(argv, flagged) is not None:
                return current
            return st.get(key, current)

        soft = pick("soft_guidance", "soft_labels", soft)
        residual = pick("residual_tracking", "residual", residual)
        noise_gain = pick("noise_gain", "noise_gain", noise_gain)
        ng_bands = pick("noise_gain_bands", "noise_gain_bands", ng_bands)
        adaptive_iters = pick("adaptive_iters", "adaptive_iters",
                              adaptive_iters)
        escalate_reinit = pick("escalate_reinit", "escalate_reinit",
                               escalate_reinit)
        lookahead = pick("lookahead", "lookahead", lookahead)
        block_iters = pick("block_iters", "block_iters", block_iters)
        e_steps = pick("e_steps", "e_steps", e_steps)
        context = pick("context_frames", "context_frames", context)
        if "chunk_frames" in st and flag(argv, "chunks") is None:
            chunks = [st["chunk_frames"]]

    files = speech_list(f"{SUB}/raw/", "test")
    processed = f"{SUB}/processed/"
    m2 = load_model(os.path.join(artifacts, "M2_ibm"), kind="dgm")
    cls = mean = std = None
    features, dnn_threshold = "power", 0.5
    if label_mode == "dnn":
        from guided_vae_nmf_tpu.train import load_classifier_meta

        cls = load_model(os.path.join(artifacts, "classifier_ibm"),
                         kind="classifier")
        mean, std = load_norm_stats(
            os.path.join(artifacts, "classifier_ibm"))
        cmeta = load_classifier_meta(
            os.path.join(artifacts, "classifier_ibm"))
        features, dnn_threshold = cmeta["features"], cmeta["threshold"]

    utts = []
    for p in files:
        bp = os.path.join(processed, os.path.splitext(p)[0])
        s, _ = read_wav(bp + "_s.wav")
        n, _ = read_wav(bp + "_n.wav")
        x, _ = read_wav(bp + "_x.wav")
        utts.append((os.path.basename(p)[:-4], s, n, x))

    print(f"{'config':<26}{'latency':>9}" + "".join(
        f"{u[0]:>26}" for u in utts))
    row = [f"{energy_ratios(x, s, n)[0]:+.2f} "
           f"{stoi(s, x, FS, True):.3f} {pesq(FS, s, x, 'wb'):.2f}"
           for _, s, n, x in utts]
    print(f"{'mixture floor':<26}{'—':>9}" + "".join(
        f"{c:>26}" for c in row))

    # offline flagship (M2 + SPP noise), the configuration the stream
    # approximates
    out = os.path.join(work, "offline")
    if not skip_offline:
        enhance_files(files, processed, out, m2, model_type="m2",
                      classif_type="oracle" if label_mode == "timo"
                      else label_mode,
                      classifier_params=cls, mean=mean, std=std,
                      cfg=MCEMConfig(niter=niter), batch_size=4,
                      noise_model="spp")
        row = []
        for p, (name, s, n, x) in zip(files, utts):
            sh, _ = read_wav(os.path.join(
                out, os.path.splitext(p)[0]) + "_s_est.wav")
            a, b, c = mets(s, n, sh)
            row.append(f"{a:+.2f} {b:.3f} {c:.2f}")
        print(f"{'offline M2+SPP (MCEM)':<26}{'∞':>9}" + "".join(
            f"{c:>26}" for c in row))

    for cf in chunks:
        # latency = chunk buffering + 64 ms STFT window (+ one extra
        # chunk when the lookahead mode delays emission by a tick)
        lat_ms = cf * HOP * 1000 // FS + 64
        if lookahead:
            lat_ms += cf * HOP * 1000 // FS
        row = []
        t0 = time.perf_counter()
        for name, s, n, x in utts:
            enh = StreamingM2Enhancer(
                m2, classifier_params=cls, mean=mean, std=std,
                chunk_frames=cf, label_mode=label_mode,
                soft_guidance=soft, residual_tracking=residual,
                noise_gain=noise_gain, noise_gain_init=ng_init,
                noise_gain_bands=ng_bands,
                adaptive_iters=adaptive_iters,
                escalate_reinit=escalate_reinit, lookahead=lookahead,
                block_iters=block_iters, e_steps=e_steps,
                context_frames=context, features=features,
                dnn_threshold=dnn_threshold)
            outs = []
            for lo in range(0, len(x), 4096):
                outs.append(enh.push(x[lo:lo + 4096]))
            outs.append(enh.flush())
            sh = np.concatenate(outs)
            a, b, c = mets(s, n, sh)
            row.append(f"{a:+.2f} {b:.3f} {c:.2f}")
        wall = time.perf_counter() - t0
        print(f"{f'stream chunk={cf}':<26}{f'{lat_ms} ms':>9}" + "".join(
            f"{c:>26}" for c in row) + f"   [{wall:.0f}s]")
    print("(cells: SI-SDR dB, ESTOI, PESQ-wb)")


if __name__ == "__main__":
    main()
