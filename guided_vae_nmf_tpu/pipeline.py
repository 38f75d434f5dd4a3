"""End-to-end enhancement pipeline: wav -> STFT -> guidance labels ->
batched MCEM -> Wiener filtering -> ISTFT -> wav.

Capability parity with reference scripts/evaluate_M1.py,
evaluate_M2_ibm.py, evaluate_M2_vad.py and evaluate_wiener_filter.py
(process_utt + the multi-GPU process-pool harness, evaluate_M1.py:99-222).
The reference enhances one utterance per process; here utterances are
length-bucketed, padded, stacked and enhanced as whole batches by one
jit-compiled program per bucket shape — `vmap` inside the engine, and
optionally `shard_map`-style sharding of the utterance batch over a device
mesh (parallel.sweep).

Guidance label sources (reference evaluate_M2_ibm.py:121-141):
  'dnn'    — supervised classifier on standardized power frames, > 0.5 hard
  'oracle' — Lorenz-quantile IBM/VAD of the clean speech
  'timo'   — SPP-based unsupervised soft mask, > 0.5 hard
  'ones' / 'zeros' — ablations (commented variants, evaluate_M2_vad.py:133-137)
"""

import os
import time
from collections import defaultdict
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from .dsp import (
    stft,
    istft_masked_ri_jax,
    clean_speech_IBM,
    clean_speech_VAD,
)
from .data import read_wav, write_wav
from .models import classifier_apply
from .mcem import (
    HybridConfig,
    MCEMConfig,
    PEEMConfig,
    mcem_m1_batch,
    mcem_m2_batch,
    mcem_batch_fused,
    peem_m1_batch,
    peem_m2_batch,
    timo_mask_estimation,
    timo_vad_estimation,
)

FS = 16000
NFFT = 1024
HOP = 256
BINS = 513


def bucket_frames(n_frames, bucket_multiple=128):
    """Static padded frame count for an utterance (limits recompilation to
    one program per bucket)."""
    return ((n_frames + bucket_multiple - 1) // bucket_multiple) * \
        bucket_multiple


def load_mixture(path_base):
    """Read `<base>_x.wav` -> (x_t, T_orig, X_tf (F, N) complex64).

    Uses the native C++ decode+STFT when the library is built (exact
    parity, GIL-free; tests/data/test_native.py), falling back to the
    numpy path."""
    from .data import native_loader

    if native_loader.is_available():
        x_t, fs = native_loader.read_wav_native(path_base + "_x.wav")
        assert fs == FS
        X_tf = native_loader.stft_complex_native(x_t)
        return x_t, len(x_t), X_tf
    x_t, fs = read_wav(path_base + "_x.wav")
    assert fs == FS
    X_tf = stft(x_t, fs=FS, wlen_sec=NFFT / FS, hop_percent=HOP / NFFT)
    return x_t, len(x_t), X_tf


def make_labels(classif_type, X_power, s_path=None, classifier_params=None,
                mean=None, std=None, target="ibm", quantile_fraction=0.98,
                quantile_weight=0.999, eps=1e-8, features="power",
                dnn_threshold=0.5):
    """Per-utterance guidance labels.

    X_power: (F, N) mixture power spectrogram. Returns (y_soft, y_hard) with
    shape (y_dim, N); y_dim = 513 for IBM/Wiener targets, 1 for VAD.

    features / dnn_threshold: the classifier's input transform and hard-
    decision threshold (classifier_meta.json side-car; reference protocol
    = raw power, > 0.5).
    """
    if classif_type == "dnn":
        from .models import classifier_features

        x = classifier_features(X_power.T, features)  # (N, F)
        if mean is not None:
            x = (x - mean.reshape(1, -1)) / (std.reshape(1, -1) + eps)
        y_soft = np.asarray(classifier_apply(classifier_params,
                                             jnp.asarray(x))).T
        y_hard = (y_soft > dnn_threshold).astype(np.float32)
    elif classif_type == "oracle":
        s_t, _ = read_wav(s_path)
        s_tf = stft(s_t, fs=FS, wlen_sec=NFFT / FS, hop_percent=HOP / NFFT)
        fn = clean_speech_VAD if target == "vad" else clean_speech_IBM
        y_soft = fn(s_tf, quantile_fraction=quantile_fraction,
                    quantile_weight=quantile_weight)
        if target == "vad":
            y_soft = y_soft.reshape(1, -1)
        y_hard = y_soft.astype(np.float32)
    elif classif_type == "timo":
        if target == "vad":
            y_soft = timo_vad_estimation(X_power)[None]
        else:
            y_soft = timo_mask_estimation(X_power)
        y_hard = (y_soft > 0.5).astype(np.float32)
    elif classif_type == "ones":
        y_dim = 1 if target == "vad" else X_power.shape[0]
        y_soft = np.ones((y_dim, X_power.shape[1]), np.float32)
        y_hard = y_soft
    elif classif_type == "zeros":
        y_dim = 1 if target == "vad" else X_power.shape[0]
        y_soft = np.zeros((y_dim, X_power.shape[1]), np.float32)
        y_hard = y_soft
    else:
        raise ValueError(f"unknown classif_type: {classif_type}")
    return y_soft, y_hard


def _pad_batch(X_tfs, ys, n_pad):
    """Stack per-utterance (F, N_i) complex spectrograms (and optional
    labels) into padded (B, F, n_pad) arrays + masks. Pad power frames carry
    the benign value 1.0 (engine contract, mcem.engine.pad_power)."""
    B = len(X_tfs)
    F = X_tfs[0].shape[0]
    X_c = np.zeros((B, F, n_pad), np.complex64)
    X_p = np.ones((B, F, n_pad), np.float32)
    mask = np.zeros((B, n_pad), np.float32)
    y_b = None
    if ys is not None:
        y_dim = ys[0].shape[0]
        y_b = np.zeros((B, y_dim, n_pad), np.float32)
    for i, X in enumerate(X_tfs):
        n = X.shape[1]
        X_c[i, :, :n] = X
        X_p[i, :, :n] = np.abs(X) ** 2
        mask[i, :n] = 1.0
        if ys is not None:
            y_b[i, :, : ys[i].shape[1]] = ys[i]
    return X_c, X_p, mask, y_b


def _ema_time(P, alpha):
    """First-order IIR smoothing along the frame axis of (B, F, N)."""
    def step(v, p):
        v = alpha * v + (1.0 - alpha) * p
        return v, v

    _, out = jax.lax.scan(step, P[..., 0], jnp.moveaxis(P, -1, 0))
    return jnp.moveaxis(out, 0, -1)


def _spp2_pass1_cfg(cfg):
    """Reduced-iteration copy of an MCEMConfig for spp2's first pass
    (None or non-MCEM configs pass through unchanged)."""
    import dataclasses as _dc

    p1 = getattr(cfg, "spp2_pass1_niter", None)
    if not p1 or p1 >= cfg.niter:
        return cfg
    return _dc.replace(cfg, niter=p1)


NOISE_MODELS = ("nmf", "spp", "hybrid", "spp2")


def validate_noise_model(noise_model, cfg=None):
    """Single whitelist for the noise models (shared by the batch APIs and
    the serving layer — a typo'd name must error, not silently fall
    through to 'nmf' behavior)."""
    if noise_model not in NOISE_MODELS:
        raise ValueError(f"noise_model must be one of {NOISE_MODELS}, "
                         f"got {noise_model!r}")
    if isinstance(cfg, HybridConfig) and noise_model == "hybrid":
        raise ValueError("algorithm 'hybrid' supports noise_model "
                         "'nmf', 'spp' or 'spp2' only")
    if getattr(cfg, "noise_gain", False) and noise_model not in (
            "spp", "spp2"):
        raise ValueError("MCEMConfig.noise_gain requires a fixed noise "
                         "model (noise_model 'spp' or 'spp2'), got "
                         f"{noise_model!r}")


def _spp2_two_pass(run_engine, Vb_spp, X_p, keys, cfg):
    """Two-pass noise model ('spp2'), the one construction both the jitted
    core and the host batch API use: pass 1 runs the engine with the
    SPP-tracked noise variance at a reduced iteration budget
    (cfg.spp2_pass1_niter — the residual saturates within ~10 EM
    iterations); pass 2 re-runs with Vb = max(Vb_spp, ema((1-WFs1)^2
    |X|^2)). The pass-1 residual power (1-WFs1)^2 |X|^2 is exactly the
    energy the first Wiener filter removed — a per-bin, per-frame noise
    estimate that tracks level changes the stationary SPP tracker smooths
    away, floored at the SPP PSD so pass 2 never under-models the noise
    (VALIDATION.md two-pass table: +1.7 dB SI-SDR on the QUT car
    mixture)."""
    out = run_engine(Vb_spp, keys, cfg=_spp2_pass1_cfg(cfg))
    res = jnp.square(1.0 - out["WFs"]) * X_p
    Vb2 = jnp.maximum(Vb_spp, _ema_time(res, 0.5))
    keys2 = jax.vmap(lambda k: jax.random.fold_in(k, 2))(keys)
    return run_engine(Vb2, keys2)


def _fast_kwargs(fast):
    """Fused-engine kwargs for the `fast` level: False = exact; truthy =
    bf16 sample dumps + approximate reciprocal, no cost trace (the
    validated quality-neutral fast mode, VALIDATION.md); the string
    'trans' additionally swaps the chain's per-bin exp/log for the
    bit-arithmetic versions (<3e-7 rel err — an order tighter than the
    already-validated bf16 dumps' 3e-3; equivalence pinned in
    tests/mcem/test_pallas.py::test_approx_trans_chain_matches_exact)."""
    if not fast:
        return {}
    kw = dict(samples_dtype=jnp.bfloat16, approx_recip=True,
              compute_cost=False)
    if fast == "trans":
        kw["approx_trans"] = True
    return kw


def _mcem_wf_istft(vae_params, X_re, X_im, X_p, mask, y, keys, cfg,
                   use_fused, noise_model, fast):
    """Shared traced core: engine selection -> MCEM -> Wiener filtering ->
    masked batched ISTFT. Called from inside the jitted entry points.

    noise_model: 'nmf' (reference default), 'spp' (fixed SPP-tracked noise
    variance, the *_noNMF variants), 'hybrid' (SPP floor + learned
    low-rank NMF residual: Vb = W@H + Vb_spp; runs on the XLA engine), or
    'spp2' (two-pass: pass 1 = 'spp'; pass 2 re-runs the engine with
    Vb = max(Vb_spp, ema((1-WFs1)^2 * |X|^2)) — the pass-1 residual sees
    per-frame noise the stationary tracker underestimates; VALIDATION.md
    two-pass table: +1.7 dB SI-SDR on the QUT car mixture)."""
    update_nmf = noise_model not in ("spp", "spp2")
    Vb_spp = None
    if noise_model in ("spp", "hybrid", "spp2"):
        from .mcem import spp_track_jax

        psd, _ = jax.vmap(spp_track_jax)(X_p)
        Vb_spp = jnp.maximum(psd, 1e-6)
    Vb_fixed = Vb_spp
    if noise_model == "hybrid":
        use_fused = False  # the fused kernel models Vb = W@H xor fixed

    if isinstance(cfg, HybridConfig) and noise_model == "hybrid":
        raise ValueError("algorithm 'hybrid' supports noise_model "
                         "'nmf', 'spp' or 'spp2' only")

    def run_engine(Vb_fixed, keys, cfg=cfg):
        if isinstance(cfg, HybridConfig):
            # PEEM warm start + short fused-MCEM refinement (the 162x
            # paper-config operating point; --algorithm hybrid on the
            # CLIs). Not to be confused with noise_model='hybrid' (SPP
            # floor + NMF residual)
            from .mcem import peem_mcem_m2_batch

            pcfg, mcfg = cfg.split()
            kw = _fast_kwargs(fast)
            return peem_mcem_m2_batch(vae_params, X_p, mask, y, keys, pcfg,
                                      mcfg, update_nmf=update_nmf,
                                      Vb_fixed=Vb_fixed, use_fused=use_fused,
                                      **kw)
        if isinstance(cfg, PEEMConfig):
            fn = peem_m1_batch if y is None else peem_m2_batch
            args = (vae_params, X_p, mask) + (() if y is None else (y,))
            return fn(*args, keys, cfg, update_nmf=update_nmf,
                      Vb_fixed=Vb_fixed)
        if use_fused:
            kw = _fast_kwargs(fast)
            return mcem_batch_fused(vae_params, X_p, mask, y, keys, cfg,
                                    update_nmf=update_nmf,
                                    Vb_fixed=Vb_fixed, **kw)
        if y is None:
            return mcem_m1_batch(vae_params, X_p, mask, keys, cfg,
                                 update_nmf=update_nmf, Vb_fixed=Vb_fixed)
        return mcem_m2_batch(vae_params, X_p, mask, y, keys, cfg,
                             update_nmf=update_nmf, Vb_fixed=Vb_fixed)

    if noise_model == "spp2":
        out = _spp2_two_pass(run_engine, Vb_spp, X_p, keys, cfg)
    else:
        out = run_engine(Vb_fixed, keys)
    X = X_re + 1j * X_im
    S = out["WFs"] * X
    Nc = out["WFn"] * X
    s_est = jax.vmap(lambda c, m: istft_masked_ri_jax(
        jnp.real(c), jnp.imag(c), m))(S, mask)
    n_est = jax.vmap(lambda c, m: istft_masked_ri_jax(
        jnp.real(c), jnp.imag(c), m))(Nc, mask)
    return s_est, n_est, out["WFs"], out["WFn"]


@partial(jax.jit,
         static_argnames=("cfg", "use_fused", "noise_model", "fast"))
def _enhance_to_audio_jit(vae_params, X_re, X_im, X_p, mask, y, keys,
                          cfg, use_fused=True, noise_model="nmf",
                          fast=False):
    """One device program: MCEM -> Wiener filtering -> masked batched ISTFT.

    Complex spectrogram arrives as split real/imag f32 (transport-safe);
    X_p may be None (computed on device as re^2+im^2 with benign pad
    frames) and y may be uint8 (cast on device) — both halve host->device
    traffic on slow transports. Returns (s_est, n_est) padded float32
    waveforms plus the WF masks.
    """
    if X_p is None:
        X_p = jnp.where(mask[:, None, :] > 0, X_re**2 + X_im**2, 1.0)
    if y is not None and y.dtype != jnp.float32:
        y = y.astype(jnp.float32)
    return _mcem_wf_istft(vae_params, X_re, X_im, X_p, mask, y, keys, cfg,
                          use_fused, noise_model, fast)


@partial(jax.jit,
         static_argnames=("cfg", "use_fused", "noise_model", "fast",
                          "label_mode", "target", "quantile_fraction",
                          "quantile_weight", "return_noise",
                          "soft_guidance", "features", "dnn_threshold"))
def _enhance_waveform_jit(vae_params, x_pad, s_pad, y_in, classifier_params,
                          mean, std, mask, keys, cfg, use_fused=True,
                          noise_model="nmf", fast=False, label_mode="none",
                          target="ibm", quantile_fraction=0.98,
                          quantile_weight=0.999, return_noise=True,
                          soft_guidance=False, features="power",
                          dnn_threshold=0.5):
    """Whole-pipeline device program fed RAW WAVEFORMS: batched STFT ->
    guidance labels -> MCEM -> Wiener filtering -> masked ISTFT.

    Shipping pre-padded waveforms instead of split-complex spectrograms
    cuts host->device traffic ~4x (T f32 samples vs 2*513*T/256), and the
    oracle/dnn label generation runs on device (`clean_speech_IBM_jax` /
    `classifier_apply`) instead of on the host critical path — the two
    host-side costs the round-1 sweep measurement identified.

    label_mode: 'none' (M1), 'oracle', 'dnn', 'ones', 'zeros' computed on
    device, or 'host' (y_in carries precomputed labels, e.g. the SPP
    'timo' source).

    Transport contract (every leg sized for a slow link): waveforms may
    arrive int16 (converted on device with the same 1/32768 scaling the
    host decoder uses); the enhanced audio returns PCM16-quantized int16
    (bit-identical to what write_wav would produce from f32); hard labels
    return bit-packed uint8 (MSB-first, np.unpackbits layout); soft labels
    are fetched (f16) only for 'dnn' — for the other sources soft == hard
    and the host reconstructs them. Returns (s_i16, n_i16,
    y_soft f16 | None, y_hard_packed u8 | None, finite_ok (B,) per-row bool).
    """
    from .dsp import (
        stft_batch_padded_jax, clean_speech_IBM_jax, clean_speech_VAD_jax,
    )

    if x_pad.dtype != jnp.float32:
        x_pad = x_pad.astype(jnp.float32) / 32768.0
    if s_pad is not None and s_pad.dtype != jnp.float32:
        s_pad = s_pad.astype(jnp.float32) / 32768.0
    X = stft_batch_padded_jax(x_pad)
    X_re, X_im = jnp.real(X), jnp.imag(X)
    X_p = jnp.where(mask[:, None, :] > 0, X_re**2 + X_im**2, 1.0)

    y = y_soft = y_hard = None
    if label_mode == "host":
        y = y_in.astype(jnp.float32)
    elif label_mode == "oracle":
        S = stft_batch_padded_jax(s_pad)
        Sp = (jnp.real(S)**2 + jnp.imag(S)**2) * mask[:, None, :]
        fn = (clean_speech_VAD_jax if target == "vad"
              else clean_speech_IBM_jax)
        y_soft = jax.vmap(
            lambda p: fn(p, quantile_fraction, quantile_weight))(Sp)
        y_hard = y_soft
        y = y_hard
    elif label_mode == "dnn":
        from .models import classifier_features

        # pad frames carry benign X_p = 1; their labels are ignored by the
        # masked engine, so the transform needs no mask special-case
        xn = classifier_features(X_p.transpose(0, 2, 1), features)
        if mean is not None:
            xn = (xn - mean.reshape(1, 1, -1)) / (
                std.reshape(1, 1, -1) + 1e-8)
        flat = classifier_apply(classifier_params,
                                xn.reshape(-1, xn.shape[-1]))
        y_soft = flat.reshape(
            xn.shape[0], xn.shape[1], -1).transpose(0, 2, 1)
        y_hard = (y_soft > dnn_threshold).astype(jnp.float32)
        # soft_guidance: condition MCEM on the classifier's probabilities
        # instead of the thresholded IBM — +1 dB SI-SDR on the QUT car
        # mixture with the subset classifier (VALIDATION.md); the
        # reference protocol (hard) stays the default.
        y = y_soft if soft_guidance else y_hard
    elif label_mode == "timo":
        # SPP recurrence is causal over frames, so trailing pad frames
        # (benign X_p = 1) cannot perturb the valid prefix
        from .mcem.spp import (
            timo_mask_estimation_jax, timo_vad_estimation_jax,
        )

        if target == "vad":
            y_soft = jax.vmap(timo_vad_estimation_jax)(X_p)[:, None, :]
        else:
            y_soft = jax.vmap(timo_mask_estimation_jax)(X_p)
        y_hard = (y_soft > 0.5).astype(jnp.float32)
        y = y_soft if soft_guidance else y_hard
    elif label_mode in ("ones", "zeros"):
        y_dim = 1 if target == "vad" else X_p.shape[1]
        fill = jnp.ones if label_mode == "ones" else jnp.zeros
        y = fill((X_p.shape[0], y_dim, X_p.shape[2]), jnp.float32)
        y_soft = y_hard = y

    s_est, n_est, _, _ = _mcem_wf_istft(
        vae_params, X_re, X_im, X_p, mask, y, keys, cfg, use_fused,
        noise_model, fast)
    # per-ROW flags: a co-batched healthy request must not be degraded by
    # another row's numeric failure (serving resolves rows independently;
    # enhance_files np.all()s the flags and keeps whole-batch retry)
    finite_ok = jnp.all(jnp.isfinite(s_est), axis=-1)
    if return_noise:
        finite_ok = finite_ok & jnp.all(jnp.isfinite(n_est), axis=-1)

    def to_pcm16(w):
        return jnp.clip(jnp.round(w * 32768.0), -32768, 32767).astype(
            jnp.int16)

    out_soft = (y_soft.astype(jnp.float16)
                if (y_soft is not None and label_mode in ("dnn", "timo"))
                else None)
    out_hard = None if y_hard is None else _packbits_bands(y_hard)
    # return_noise=False halves the PCM device->host transfer: the Wiener
    # gains sum to one, so the host reconstructs the mixture-consistent
    # n = x - s. Not bit-identical to the device-quantized n_est: round-
    # half-to-even ties and clipping of s at full scale can shift samples
    # by +-1 LSB (use return_noise=True when a bit-exact track is needed)
    out_n = to_pcm16(n_est) if return_noise else None
    return to_pcm16(s_est), out_n, out_soft, out_hard, finite_ok


def _packbits_bands(y):
    """(B, y_dim, N) 0/1 floats -> (B, ceil(y_dim/8), N) uint8, MSB-first
    per byte (np.unpackbits(..., axis=1) inverts it on the host) — an 8x
    smaller device->host transfer for hard labels."""
    B, d, N = y.shape
    pad = (-d) % 8
    yp = jnp.pad(y, ((0, 0), (0, pad), (0, 0))).reshape(B, -1, 8, N)
    weights = jnp.asarray([128, 64, 32, 16, 8, 4, 2, 1], jnp.float32)
    return jnp.einsum("bkwn,w->bkn", yp, weights).astype(jnp.uint8)


def _enhance_waveform_sharded(mesh, vae_params, x_pad, s_pad, y_in,
                              classifier_params, mean, std, mask, keys,
                              cfg, use_fused, noise_model, fast,
                              label_mode, target, quantile_fraction,
                              quantile_weight, return_noise=True,
                              soft_guidance=False, features="power",
                              dnn_threshold=0.5, axis="data"):
    """shard_map wrapper of the whole waveform device program over the
    mesh's data axis (multi-chip sweep): every stage — STFT, labels, MCEM,
    Wiener filter, ISTFT — is per-utterance independent, so each device
    runs its shard with ZERO collectives. shard_map (not sharding
    annotations) because the fused Pallas call is opaque to the
    partitioner. The batch size must be a multiple of the mesh axis
    (enhance_files pads by duplicating trailing utterances and ignores
    their outputs)."""
    from jax.sharding import PartitionSpec as P

    B = x_pad.shape[0]
    n_dev = mesh.shape[axis]
    if B % n_dev != 0:
        raise ValueError(f"batch {B} must divide the mesh axis ({n_dev})")
    has_s = s_pad is not None
    has_y = y_in is not None
    has_cls = classifier_params is not None
    has_norm = mean is not None

    def local(params, *rest):
        rest = list(rest)
        cls = rest.pop(0) if has_cls else None
        mn = rest.pop(0) if has_norm else None
        sd = rest.pop(0) if has_norm else None
        x, m, k = rest[:3]
        rest = rest[3:]
        s = rest.pop(0) if has_s else None
        yi = rest.pop(0) if has_y else None
        s_e, n_e, ys, yh, ok = _enhance_waveform_jit(
            params, x, s, yi, cls, mn, sd, m, k, cfg,
            use_fused=use_fused, noise_model=noise_model, fast=fast,
            label_mode=label_mode, target=target,
            quantile_fraction=quantile_fraction,
            quantile_weight=quantile_weight, return_noise=return_noise,
            soft_guidance=soft_guidance, features=features,
            dnn_threshold=dnn_threshold,
        )
        outs = [s_e]
        if return_noise:
            outs.append(n_e)
        if ys is not None:
            outs.append(ys)
        if yh is not None:
            outs.append(yh)
        outs.append(ok)                     # (local_B,) per-row flags
        return tuple(outs)

    data = P(axis)
    in_specs = [P()]
    args = [vae_params]
    if has_cls:
        in_specs.append(P())
        args.append(classifier_params)
    if has_norm:
        in_specs += [P(), P()]
        args += [mean, std]
    in_specs += [data, data, data]
    args += [x_pad, mask, keys]
    if has_s:
        in_specs.append(data)
        args.append(s_pad)
    if has_y:
        in_specs.append(data)
        args.append(y_in)

    # extra outputs: dnn/timo -> (y_soft, y_hard); oracle/ones/zeros ->
    # y_hard; none/host -> nothing (host labels already live on the host)
    n_extra = 2 if label_mode in ("dnn", "timo") else (
        1 if label_mode in ("oracle", "ones", "zeros") else 0)
    n_pcm = 2 if return_noise else 1
    fn = jax.shard_map(
        local, mesh=mesh, in_specs=tuple(in_specs),
        out_specs=tuple([data] * (1 + n_pcm + n_extra)), check_vma=False,
    )
    outs = list(fn(*args))
    ok = outs.pop()
    s_e = outs[0]
    n_e = outs[1] if return_noise else None
    ys = outs[n_pcm] if n_extra == 2 else None
    yh = outs[n_pcm + (n_extra == 2)] if n_extra else None
    return s_e, n_e, ys, yh, ok


def enhance_to_audio(vae_params, X_tfs, t_origs, ys=None, keys=None,
                     cfg: MCEMConfig = MCEMConfig(), bucket_multiple=128,
                     engine="auto", noise_model="nmf", fast=False):
    """Batched wav-domain enhancement: complex spectrograms in, trimmed
    time-domain (s_est, n_est) lists out — engine, Wiener filtering and
    ISTFT all inside one jit (no host round-trips between stages)."""
    validate_noise_model(noise_model, cfg)
    n_pad = bucket_frames(max(X.shape[1] for X in X_tfs), bucket_multiple)
    X_c, X_p, mask, y_b = _pad_batch(X_tfs, ys, n_pad)
    B = len(X_tfs)
    if keys is None:
        keys = jax.random.split(jax.random.PRNGKey(0), B)
    use_fused = _use_fused(engine, vae_params, n_pad)
    s_est, n_est, _, _ = _enhance_to_audio_jit(
        vae_params,
        jnp.asarray(np.real(X_c).astype(np.float32)),
        jnp.asarray(np.imag(X_c).astype(np.float32)),
        jnp.asarray(X_p), jnp.asarray(mask),
        None if ys is None else jnp.asarray(y_b), keys, cfg,
        use_fused=use_fused, noise_model=noise_model, fast=fast,
    )
    s_est = np.asarray(s_est)
    n_est = np.asarray(n_est)
    return ([s_est[i][:t] for i, t in enumerate(t_origs)],
            [n_est[i][:t] for i, t in enumerate(t_origs)])


def _use_fused(engine, vae_params, n_pad):
    """Engine selection: the fused Pallas engine is the default on real
    accelerators; the XLA scan engine is the portable fallback (and the CPU
    default — the Pallas interpreter's PRNG is a stub)."""
    if engine == "xla":
        return False
    if engine == "fused":
        return True
    dec = vae_params["decoder"]
    return (
        jax.default_backend() != "cpu"
        and 1 <= len(dec["hidden"]) <= 4
        and n_pad % 128 == 0
    )


def enhance_batch(vae_params, X_tfs, ys=None, keys=None,
                  cfg: MCEMConfig = MCEMConfig(), bucket_multiple=128,
                  return_masks=False, engine="auto", noise_model="nmf"):
    """Enhance a list of per-utterance (F, N_i) complex spectrograms (all in
    one padded batch). Returns lists of (F, N_i) S_hat / N_hat complex
    arrays (+ the WF masks when requested).

    noise_model: 'nmf' (the reference default), 'spp' — a fixed noise
    variance from the SPP tracker instead of NMF with only the gain g
    updated (the reference's *_noNMF variants, mcem.py:493-760 fed by
    spp_estimation's noise PSD) — 'hybrid' (SPP floor + learned NMF
    residual; XLA engine) — or 'spp2' (two-pass: the pass-1 residual
    power, EMA-smoothed and floored at the SPP PSD, becomes pass 2's
    fixed per-frame noise variance).
    """
    validate_noise_model(noise_model, cfg)
    n_pad = bucket_frames(max(X.shape[1] for X in X_tfs), bucket_multiple)
    X_c, X_p, mask, y_b = _pad_batch(X_tfs, ys, n_pad)
    B = len(X_tfs)
    if keys is None:
        keys = jax.random.split(jax.random.PRNGKey(0), B)

    update_nmf = noise_model not in ("spp", "spp2")
    Vb_spp = None
    if noise_model in ("spp", "hybrid", "spp2"):
        from .mcem import spp_track_jax

        psd, _ = jax.vmap(spp_track_jax)(jnp.asarray(X_p))
        Vb_spp = jnp.maximum(psd, 1e-6)  # SPP noise PSD, floored

    def run_engine(Vb_fixed, keys, cfg=cfg):
        if _use_fused(engine, vae_params, n_pad) and noise_model != "hybrid":
            y_arg = None if ys is None else jnp.asarray(y_b)
            return mcem_batch_fused(vae_params, jnp.asarray(X_p),
                                    jnp.asarray(mask), y_arg, keys, cfg,
                                    update_nmf=update_nmf, Vb_fixed=Vb_fixed)
        if ys is None:
            return mcem_m1_batch(vae_params, jnp.asarray(X_p),
                                 jnp.asarray(mask), keys, cfg,
                                 update_nmf=update_nmf, Vb_fixed=Vb_fixed)
        return mcem_m2_batch(vae_params, jnp.asarray(X_p), jnp.asarray(mask),
                             jnp.asarray(y_b), keys, cfg,
                             update_nmf=update_nmf, Vb_fixed=Vb_fixed)

    if noise_model == "spp2":
        out = _spp2_two_pass(run_engine, Vb_spp, jnp.asarray(X_p),
                             jnp.asarray(keys), cfg)
    else:
        out = run_engine(Vb_spp, keys)
    WFs = np.asarray(out["WFs"])
    WFn = np.asarray(out["WFn"])
    S_hat = [WFs[i, :, : X.shape[1]] * X for i, X in enumerate(X_tfs)]
    N_hat = [WFn[i, :, : X.shape[1]] * X for i, X in enumerate(X_tfs)]
    if return_masks:
        return S_hat, N_hat, out
    return S_hat, N_hat


def plan_batches(file_paths, n_frames_all, batch_size=16,
                 bucket_multiple=128, n_dev=1, seed=0):
    """Bucket utterances by padded frame count and cut mesh-friendly
    batches; returns [(paths, n_pad, keys)].

    Batch sizes scale inversely with bucket length (the E-step sample
    buffer (B, R, F, N) must fit HBM). With n_dev > 1 the plan is
    mesh-aware: every batch size is a multiple of the mesh's data axis,
    and sub-mesh bucket tails are pooled across buckets into merged
    batches at the max n_pad of their members — frame padding is far
    cheaper than the duplicate-row compute it replaces — so at most ONE
    batch per sweep (the final pooled tail) still gets duplicate-row
    padding inside the sharded dispatch. `scripts/bench_shard_balance.py`
    measures the residual waste."""
    groups = defaultdict(list)
    for i, nf in enumerate(n_frames_all):
        groups[bucket_frames(nf, bucket_multiple)].append(i)

    # per-utterance keys derive from the utterance's LIST INDEX, not the
    # batch cut, so on the XLA engine (engine='xla', per-utterance key
    # streams + framewise_uniform inits) the stochastic trajectory is
    # invariant to the plan — single-device and mesh-aware plans produce
    # identical outputs. The fused Pallas engine derives its chain PRNG
    # streams and NMF init from the whole batch's leading key and the
    # padded length, so its outputs are plan-dependent (statistically
    # equivalent MH noise, not bit-stable across plans).
    keys_all = jax.random.split(jax.random.PRNGKey(seed),
                                max(len(file_paths), 1))
    batches = []  # (paths, n_pad, keys)
    leftovers = []  # (idx, n_pad) bucket tails smaller than the mesh
    for n_pad, idxs in sorted(groups.items()):
        eff_batch = max(1, batch_size * 512 // max(n_pad, 512))
        if n_dev > 1:
            eff_batch = max(n_dev, (eff_batch // n_dev) * n_dev)
            tail = len(idxs) % n_dev
            if tail:
                leftovers.extend((i, n_pad) for i in idxs[-tail:])
                idxs = idxs[:-tail]
        for lo in range(0, len(idxs), eff_batch):
            sel = idxs[lo: lo + eff_batch]
            batches.append(([file_paths[i] for i in sel], n_pad,
                            keys_all[np.asarray(sel)]))
    if leftovers:
        # descending n_pad: full chunks group the long utterances (their
        # max-n_pad cost is dominated by their own length) and the single
        # partial chunk — the only one that pads with duplicate rows —
        # lands at the SMALLEST n_pad, minimizing the duplicated work
        leftovers.sort(key=lambda t: -t[1])
        for lo in range(0, len(leftovers), n_dev):
            chunk = leftovers[lo: lo + n_dev]
            n_pad = max(p for _, p in chunk)
            sel = np.asarray([i for i, _ in chunk])
            batches.append(([file_paths[i] for i, _ in chunk], n_pad,
                            keys_all[sel]))
    return batches


class SweepResult(float):
    """Wall-clock seconds of an enhancement sweep (usable as a plain
    float), annotated with utterance accounting so callers can report
    honest counts when skip_existing drops already-done work."""

    __slots__ = ("n_processed", "n_skipped")

    def __new__(cls, seconds, n_processed, n_skipped=0):
        r = super().__new__(cls, seconds)
        r.n_processed = n_processed
        r.n_skipped = n_skipped
        return r


def enhance_files(file_paths, processed_dir, output_dir, vae_params,
                  model_type="m2", classif_type="dnn", target="ibm",
                  classifier_params=None, mean=None, std=None,
                  cfg: MCEMConfig = MCEMConfig(), batch_size=16,
                  bucket_multiple=128, quantile_fraction=0.98,
                  quantile_weight=0.999, seed=0, verbose=False,
                  engine="auto", noise_model="nmf", fast=False, mesh=None,
                  soft_guidance=False, skip_existing=False, profile=None,
                  features="power", dnn_threshold=0.5):
    """Full sweep over a test file list (reference evaluate_*.py main +
    process_utt): reads `<utt>_x.wav` (+ `_s.wav` for oracle labels), writes
    `<utt>_s_est.wav`, `<utt>_n_est.wav` and the soft/hard label arrays
    (`_ibm_soft_est.npy` / `_ibm_hard_est.npy` — npy instead of torch .pt).

    skip_existing: resume a killed sweep — utterances whose `_s_est.wav`
    already exists under `output_dir` are dropped from the plan before
    bucketing (the reference semantics, and the default, re-enhance
    everything).

    The sweep is a three-stage host/device pipeline (round-2 rework of the
    round-1 "load everything, dispatch everything" design):

      1. a header-only length scan buckets utterances without decoding;
      2. batch assembly (wav decode + pre-pad; no label work — every
         guidance source runs inside the device program) runs in a
         prefetch thread pool, staying PREFETCH batches ahead of the
         device;
      3. batches ship as raw waveforms and the whole STFT -> labels ->
         MCEM -> WF -> ISTFT chain runs as one device program
         (`_enhance_waveform_jit`); a bounded in-flight queue caps device
         memory, and completed outputs are written by a writer pool while
         later batches compute.

    Fault-tolerant (SURVEY §7.10): a failed batch is retried one utterance
    at a time, and an utterance that still fails degrades to mixture
    passthrough instead of aborting the sweep. Returns wall-clock seconds.

    profile: name of a validated operating-point preset (profiles.py) —
    authoritative for noise_model, soft_guidance and the cfg's
    noise_gain/noise_gain_bands; all other arguments keep their values.
    """
    from concurrent.futures import ThreadPoolExecutor

    from .data import wav_num_samples
    from .dsp import pad_signal_for_stft
    from .dsp.stft import frame_count

    if profile is not None:
        from .profiles import apply_profile_cfg, offline_settings

        noise_model, soft_guidance = offline_settings(profile)
        cfg = apply_profile_cfg(cfg, profile)
    validate_noise_model(noise_model, cfg)
    if model_type == "m2" and classif_type not in (
            "dnn", "oracle", "timo", "ones", "zeros"):
        raise ValueError(f"unknown classif_type: {classif_type!r}")
    n_listed = len(file_paths)
    if skip_existing:
        file_paths = [
            p for p in file_paths
            if not os.path.exists(os.path.join(
                output_dir, os.path.splitext(p)[0] + "_s_est.wav"))
        ]
        if not file_paths:
            return SweepResult(0.0, 0, n_listed)
    n_skipped = n_listed - len(file_paths)
    t_start = time.perf_counter()
    PREFETCH = 3        # batches being assembled ahead of the device
    MAX_INFLIGHT = 2    # dispatched-but-unfetched device batches
    from .utils import device_warmup

    device_warmup()
    from .ops.profiling import StageTimer
    timer = StageTimer()

    # every label source runs on device ('host' remains a label_mode of
    # the jit API for callers with precomputed labels)
    label_mode = classif_type if model_type == "m2" else "none"
    mean_d = None if mean is None else jnp.asarray(
        np.asarray(mean, np.float32))
    std_d = None if std is None else jnp.asarray(np.asarray(std, np.float32))

    # ---- 1) header-only length scan + bucketing --------------------------
    def scan_one(path):
        base_in = os.path.join(processed_dir, os.path.splitext(path)[0])
        return frame_count(wav_num_samples(base_in + "_x.wav"))

    with ThreadPoolExecutor(max_workers=8) as pool:
        n_frames_all = list(pool.map(scan_one, file_paths))

    n_dev = 1 if mesh is None else mesh.shape["data"]
    batches = plan_batches(file_paths, n_frames_all, batch_size,
                           bucket_multiple, n_dev, seed)

    # ---- 2) batch assembly (runs in the prefetch pool) -------------------
    def assemble(paths, n_pad):
        L = (n_pad - 1) * HOP + NFFT
        B = len(paths)
        # int16 end to end: raw PCM ships as-is, the device applies the
        # 1/32768 scaling (half the host->device bytes of f32)
        x_b = np.zeros((B, L), np.int16)
        s_b = np.zeros((B, L), np.int16) if label_mode == "oracle" else None
        mask_b = np.zeros((B, n_pad), np.float32)
        t_origs = []
        from .data import native_loader, read_wav_int16

        use_native = native_loader.has_assemble()

        def fill_row(path, row):
            """decode + end-pad + reflect-pad + PCM16 into `row`; the C++
            assembler (bit-exact vs the Python path, GIL-free) when built."""
            if use_native:
                return native_loader.assemble_utt_native(path, row)
            x_t, fs = read_wav_int16(path)
            assert fs == FS
            xp, nf = pad_signal_for_stft(x_t)
            # len(xp) can exceed L by up to hop-1 samples when the padded
            # length is not a hop multiple; those trailing samples belong
            # to no frame, so truncation is exact
            row[: min(len(xp), L)] = xp[:L]
            return nf, len(x_t)

        for j, path in enumerate(paths):
            base_in = os.path.join(processed_dir, os.path.splitext(path)[0])
            nf, T = fill_row(base_in + "_x.wav", x_b[j])
            t_origs.append(T)
            mask_b[j, :nf] = 1.0
            if label_mode == "oracle":
                fill_row(base_in + "_s.wav", s_b[j])
        return {"paths": paths, "t_origs": t_origs, "x": x_b, "s": s_b,
                "y": None, "mask": mask_b,
                "n_frames": [frame_count(t) for t in t_origs]}

    # ---- 3) pipelined dispatch / fetch / write ---------------------------
    def dispatch(a, n_pad, keys):
        use_fused = _use_fused(engine, vae_params, n_pad)
        # host-side n = x - s relies on WFs + WFn = 1, which the fused
        # kernel enforces by construction (shared accumulator samples);
        # the XLA engine's VX_FLOOR clamp can break the identity in
        # degenerate near-silent bins, so those paths keep the device n
        common = dict(use_fused=use_fused, noise_model=noise_model,
                      fast=fast, label_mode=label_mode, target=target,
                      quantile_fraction=quantile_fraction,
                      quantile_weight=quantile_weight,
                      return_noise=not use_fused,
                      soft_guidance=soft_guidance, features=features,
                      dnn_threshold=dnn_threshold)
        if mesh is None:
            return _enhance_waveform_jit(
                vae_params, jnp.asarray(a["x"]),
                None if a["s"] is None else jnp.asarray(a["s"]),
                None if a["y"] is None else jnp.asarray(a["y"]),
                classifier_params if label_mode == "dnn" else None,
                mean_d if label_mode == "dnn" else None,
                std_d if label_mode == "dnn" else None,
                jnp.asarray(a["mask"]), keys, cfg, **common,
            )
        # multi-chip: pad the batch to the mesh size by duplicating
        # trailing utterances (their outputs are simply never written)
        n_dev = mesh.shape["data"]
        B = a["x"].shape[0]
        Bp = ((B + n_dev - 1) // n_dev) * n_dev

        def padb(arr):
            if arr is None or Bp == B:
                return arr
            reps = np.repeat(np.asarray(arr)[-1:], Bp - B, axis=0)
            return np.concatenate([np.asarray(arr), reps], axis=0)

        keys_p = jnp.asarray(padb(np.asarray(keys)))
        return _enhance_waveform_sharded(
            mesh, vae_params, jnp.asarray(padb(a["x"])),
            None if a["s"] is None else jnp.asarray(padb(a["s"])),
            None if a["y"] is None else jnp.asarray(padb(a["y"])),
            classifier_params if label_mode == "dnn" else None,
            mean_d if label_mode == "dnn" else None,
            std_d if label_mode == "dnn" else None,
            jnp.asarray(padb(a["mask"])), keys_p, cfg, **common,
        )

    writer = ThreadPoolExecutor(max_workers=4)
    write_futs = []

    def write_utt(base_out, s, n, y_soft, y_hard):
        # _s_est.wav is the skip_existing completion marker, so it must
        # appear last and atomically: stage it under a tmp name, write
        # every sidecar, then rename. A sweep killed mid-utterance leaves
        # no marker and the utterance is redone on resume.
        os.makedirs(os.path.dirname(base_out), exist_ok=True)
        tmp = base_out + "_s_est.wav.tmp"
        write_wav(tmp, s, FS)
        write_wav(base_out + "_n_est.wav", n, FS)
        if y_soft is not None:
            # compact dtypes (soft f16, hard u8); consumers cast
            np.save(base_out + "_ibm_soft_est.npy", y_soft)
            np.save(base_out + "_ibm_hard_est.npy", y_hard)
        os.replace(tmp, base_out + "_s_est.wav")

    def finish(item, n_batch):
        a, keys, out = item
        t_origs = a["t_origs"]
        n_frames = a["n_frames"]
        y_soft_b = y_hard_b = None
        y_dim = 1 if target == "vad" else BINS
        try:
            if isinstance(out, Exception):
                raise out
            with timer.stage("d2h_fetch"):
                out = tuple(None if o is None else np.asarray(o)
                            for o in out)
            if not np.all(out[4]):  # scalar or per-shard flags
                raise FloatingPointError("non-finite enhancement output")
            s_pad = out[0]  # int16 PCM, quantized on device
            s_est = [s_pad[j][:t] for j, t in enumerate(t_origs)]
            if out[1] is not None:
                n_est = [out[1][j][:t] for j, t in enumerate(t_origs)]
            else:
                # the device ships s only; Wiener gains sum to one, so the
                # mixture-consistent noise track is n = x - s (the source
                # wavs are PCM16; a["x"] rows carry the exact mixture after
                # the nfft//2 reflect lead-in). May differ from the device-
                # quantized track by +-1 LSB (rounding ties / clipping of
                # s); pass return_noise=True for a bit-exact _n_est.wav
                off = NFFT // 2
                n_est = [
                    np.clip(a["x"][j][off:off + t].astype(np.int32)
                            - s_est[j].astype(np.int32),
                            -32768, 32767).astype(np.int16)
                    for j, t in enumerate(t_origs)
                ]
            if out[3] is not None:
                y_hard_b = np.unpackbits(out[3], axis=1)[:, :y_dim, :]
                y_soft_b = (out[2] if out[2] is not None
                            else y_hard_b.astype(np.float16))
        except Exception as exc:
            print(f"batch of {len(a['paths'])} failed ({exc!r}); "
                  "retrying per-utterance")
            s_est, n_est = [], []
            y_soft_l, y_hard_l = [], []
            for j, path in enumerate(a["paths"]):
                base_in = os.path.join(processed_dir,
                                       os.path.splitext(path)[0])
                try:
                    _, _, X_tf = load_mixture(base_in)
                    ys_j = None
                    if model_type == "m2":
                        y_soft_j, y_hard_j = make_labels(
                            classif_type, np.abs(X_tf) ** 2,
                            s_path=base_in + "_s.wav",
                            classifier_params=classifier_params,
                            mean=mean, std=std, target=target,
                            quantile_fraction=quantile_fraction,
                            quantile_weight=quantile_weight,
                            features=features, dnn_threshold=dnn_threshold,
                        )
                        ys_j = [y_hard_j]
                        y_soft_l.append(y_soft_j.astype(np.float16))
                        y_hard_l.append(y_hard_j.astype(np.uint8))
                    s1, n1 = enhance_to_audio(
                        vae_params, [X_tf], [t_origs[j]], ys_j,
                        keys[j:j + 1], cfg, bucket_multiple,
                        engine=engine, noise_model=noise_model,
                    )
                    s_est.append(s1[0])
                    n_est.append(n1[0])
                except Exception as exc2:
                    print(f"utterance {path} failed ({exc2!r}); "
                          "writing passthrough")
                    x_t, _, _ = load_mixture(base_in)
                    s_est.append(x_t)
                    n_est.append(np.zeros_like(x_t))
                    if model_type == "m2":
                        if not y_soft_l or len(y_soft_l) <= j:
                            F = BINS if target != "vad" else 1
                            y_soft_l.append(
                                np.zeros((F, n_frames[j]), np.float16))
                            y_hard_l.append(
                                np.zeros((F, n_frames[j]), np.uint8))
            if model_type == "m2":
                y_soft_b = y_soft_l
                y_hard_b = y_hard_l

        for j, path in enumerate(a["paths"]):
            base_out = os.path.join(output_dir, os.path.splitext(path)[0])
            ys_j = yh_j = None
            if y_soft_b is not None:
                ys_j = np.asarray(y_soft_b[j])[:, : n_frames[j]]
                yh_j = np.asarray(y_hard_b[j])[:, : n_frames[j]]
            write_futs.append(writer.submit(
                write_utt, base_out, s_est[j], n_est[j], ys_j, yh_j))
        if verbose:
            print(f"batch {n_batch}: enhanced {len(a['paths'])} utterances")

    from collections import deque

    loader = ThreadPoolExecutor(max_workers=PREFETCH)
    assemble_futs = deque(
        loader.submit(assemble, paths, n_pad)
        for paths, n_pad, _ in batches[: PREFETCH]
    )
    # finish() (device->host fetch + write handoff) runs on a dedicated
    # fetch thread so the D2H transfer of batch i overlaps the device
    # compute of batches i+1.. — the main thread only assembles and
    # dispatches, blocking just for MAX_INFLIGHT backpressure
    fetcher = ThreadPoolExecutor(max_workers=1)
    in_flight = deque()
    n_done = 0
    for i, (paths, n_pad, keys) in enumerate(batches):
        with timer.stage("assemble_wait"):
            a = assemble_futs.popleft().result()
        if i + PREFETCH < len(batches):
            nxt = batches[i + PREFETCH]
            assemble_futs.append(loader.submit(assemble, nxt[0], nxt[1]))
        try:
            with timer.stage("dispatch"):
                out = dispatch(a, n_pad, keys)
        except Exception as exc:
            out = exc
        in_flight.append(fetcher.submit(finish, (a, keys, out), i))
        while len(in_flight) > MAX_INFLIGHT:
            with timer.stage("finish_wait"):
                in_flight.popleft().result()
            n_done += 1
    while in_flight:
        with timer.stage("finish_wait"):
            in_flight.popleft().result()
        n_done += 1
    loader.shutdown(wait=True)
    fetcher.shutdown(wait=True)
    with timer.stage("writer_drain"):
        for f in write_futs:
            f.result()  # surface writer exceptions
        writer.shutdown(wait=True)
    if verbose:
        print(timer.report())
    return SweepResult(time.perf_counter() - t_start,
                       len(file_paths), n_skipped)


@partial(jax.jit, static_argnames=())
def _wiener_waveform_jit(wiener_params, x_pad, mean, std, mask, eps=1e-8):
    """Batched Wiener-DNN baseline device program: STFT -> normalized
    power -> mask = classifier -> S = mask * X -> masked ISTFT -> PCM16.
    Same int16 transport contract as the MCEM sweep."""
    from .dsp import stft_batch_padded_jax

    if x_pad.dtype != jnp.float32:
        x_pad = x_pad.astype(jnp.float32) / 32768.0
    X = stft_batch_padded_jax(x_pad)
    X_re, X_im = jnp.real(X), jnp.imag(X)
    xn = (X_re**2 + X_im**2).transpose(0, 2, 1)  # (B, N, F)
    if mean is not None:
        xn = (xn - mean.reshape(1, 1, -1)) / (std.reshape(1, 1, -1) + eps)
    m = classifier_apply(wiener_params, xn.reshape(-1, xn.shape[-1]))
    m = m.reshape(xn.shape[0], xn.shape[1], -1).transpose(0, 2, 1)
    s_est = jax.vmap(istft_masked_ri_jax)(m * X_re, m * X_im, mask)
    s_i16 = jnp.clip(jnp.round(s_est * 32768.0), -32768, 32767).astype(
        jnp.int16)
    return s_i16, m.astype(jnp.float16)


def enhance_files_wiener(file_paths, processed_dir, output_dir,
                         wiener_params, mean=None, std=None, eps=1e-8,
                         verbose=False, batch_size=32, bucket_multiple=128):
    """DNN Wiener-mask baseline sweep (reference
    evaluate_wiener_filter.py:88-101): mask = model(x_norm);
    S_hat = mask * X; single ISTFT; writes `<utt>_s_est.wav` and the
    soft mask. Round 2: length-bucketed batches through one device
    program (int16 transport) instead of a per-utterance host loop."""
    from .data import wav_num_samples
    from .dsp import pad_signal_for_stft
    from .dsp.stft import frame_count

    t_start = time.perf_counter()
    mean_d = None if mean is None else jnp.asarray(
        np.asarray(mean, np.float32))
    std_d = None if std is None else jnp.asarray(
        np.asarray(std, np.float32))

    groups = defaultdict(list)
    for path in file_paths:
        base_in = os.path.join(processed_dir, os.path.splitext(path)[0])
        nf = frame_count(wav_num_samples(base_in + "_x.wav"))
        groups[bucket_frames(nf, bucket_multiple)].append(path)

    from .data import native_loader, read_wav_int16

    for n_pad, paths in sorted(groups.items()):
        L = (n_pad - 1) * HOP + NFFT
        for lo in range(0, len(paths), batch_size):
            sel = paths[lo: lo + batch_size]
            B = len(sel)
            x_b = np.zeros((B, L), np.int16)
            mask_b = np.zeros((B, n_pad), np.float32)
            t_origs = []
            n_frames = []
            for j, path in enumerate(sel):
                base_in = os.path.join(processed_dir,
                                       os.path.splitext(path)[0])
                if native_loader.has_assemble():
                    nf, T = native_loader.assemble_utt_native(
                        base_in + "_x.wav", x_b[j])
                else:
                    x_t, fs = read_wav_int16(base_in + "_x.wav")
                    assert fs == FS
                    xp, nf = pad_signal_for_stft(x_t)
                    x_b[j, : min(len(xp), L)] = xp[:L]
                    T = len(x_t)
                t_origs.append(T)
                n_frames.append(nf)
                mask_b[j, :nf] = 1.0
            s_i16, m = _wiener_waveform_jit(
                wiener_params, jnp.asarray(x_b), mean_d, std_d,
                jnp.asarray(mask_b), eps=eps)
            s_i16 = np.asarray(s_i16)
            m = np.asarray(m)
            for j, path in enumerate(sel):
                base_out = os.path.join(output_dir,
                                        os.path.splitext(path)[0])
                os.makedirs(os.path.dirname(base_out), exist_ok=True)
                write_wav(base_out + "_s_est.wav",
                          s_i16[j][: t_origs[j]], FS)
                np.save(base_out + "_wiener_mask.npy",
                        m[j][:, : n_frames[j]].astype(np.float32))
                if verbose:
                    print(f"wiener: {path}")
    return time.perf_counter() - t_start
