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
                quantile_weight=0.999, eps=1e-8):
    """Per-utterance guidance labels.

    X_power: (F, N) mixture power spectrogram. Returns (y_soft, y_hard) with
    shape (y_dim, N); y_dim = 513 for IBM/Wiener targets, 1 for VAD.
    """
    if classif_type == "dnn":
        x = X_power.T  # (N, F)
        if mean is not None:
            x = (x - mean.reshape(1, -1)) / (std.reshape(1, -1) + eps)
        y_soft = np.asarray(classifier_apply(classifier_params,
                                             jnp.asarray(x))).T
        y_hard = (y_soft > 0.5).astype(np.float32)
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
    update_nmf = noise_model != "spp"
    Vb_fixed = None
    if not update_nmf:
        from .mcem import spp_track_jax

        psd, _ = jax.vmap(spp_track_jax)(X_p)
        Vb_fixed = jnp.maximum(psd, 1e-6)

    if isinstance(cfg, PEEMConfig):
        fn = peem_m1_batch if y is None else peem_m2_batch
        args = (vae_params, X_p, mask) + (() if y is None else (y,))
        out = fn(*args, keys, cfg, update_nmf=update_nmf,
                 Vb_fixed=Vb_fixed)
    elif use_fused:
        kw = dict(samples_dtype=jnp.bfloat16, approx_recip=True,
                  compute_cost=False) if fast else {}
        out = mcem_batch_fused(vae_params, X_p, mask, y, keys, cfg,
                               update_nmf=update_nmf, Vb_fixed=Vb_fixed,
                               **kw)
    elif y is None:
        out = mcem_m1_batch(vae_params, X_p, mask, keys, cfg,
                            update_nmf=update_nmf, Vb_fixed=Vb_fixed)
    else:
        out = mcem_m2_batch(vae_params, X_p, mask, y, keys, cfg,
                            update_nmf=update_nmf, Vb_fixed=Vb_fixed)
    X = X_re + 1j * X_im
    S = out["WFs"] * X
    Nc = out["WFn"] * X
    s_est = jax.vmap(lambda c, m: istft_masked_ri_jax(
        jnp.real(c), jnp.imag(c), m))(S, mask)
    n_est = jax.vmap(lambda c, m: istft_masked_ri_jax(
        jnp.real(c), jnp.imag(c), m))(Nc, mask)
    return s_est, n_est, out["WFs"], out["WFn"]


def enhance_to_audio(vae_params, X_tfs, t_origs, ys=None, keys=None,
                     cfg: MCEMConfig = MCEMConfig(), bucket_multiple=128,
                     engine="auto", noise_model="nmf", fast=False):
    """Batched wav-domain enhancement: complex spectrograms in, trimmed
    time-domain (s_est, n_est) lists out — engine, Wiener filtering and
    ISTFT all inside one jit (no host round-trips between stages)."""
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

    noise_model: 'nmf' (the reference default) or 'spp' — a fixed noise
    variance from the SPP tracker instead of NMF; the M-step then updates
    only the gain g (the reference's *_noNMF variants, mcem.py:493-760 fed
    by spp_estimation's noise PSD).
    """
    n_pad = bucket_frames(max(X.shape[1] for X in X_tfs), bucket_multiple)
    X_c, X_p, mask, y_b = _pad_batch(X_tfs, ys, n_pad)
    B = len(X_tfs)
    if keys is None:
        keys = jax.random.split(jax.random.PRNGKey(0), B)

    update_nmf = noise_model != "spp"
    Vb_fixed = None
    if not update_nmf:
        from .mcem import spp_track_jax

        psd, _ = jax.vmap(spp_track_jax)(jnp.asarray(X_p))
        Vb_fixed = jnp.maximum(psd, 1e-6)  # SPP noise PSD, floored

    if _use_fused(engine, vae_params, n_pad):
        y_arg = None if ys is None else jnp.asarray(y_b)
        out = mcem_batch_fused(vae_params, jnp.asarray(X_p),
                               jnp.asarray(mask), y_arg, keys, cfg,
                               update_nmf=update_nmf, Vb_fixed=Vb_fixed)
    elif ys is None:
        out = mcem_m1_batch(vae_params, jnp.asarray(X_p), jnp.asarray(mask),
                            keys, cfg, update_nmf=update_nmf,
                            Vb_fixed=Vb_fixed)
    else:
        out = mcem_m2_batch(vae_params, jnp.asarray(X_p), jnp.asarray(mask),
                            jnp.asarray(y_b), keys, cfg,
                            update_nmf=update_nmf, Vb_fixed=Vb_fixed)
    WFs = np.asarray(out["WFs"])
    WFn = np.asarray(out["WFn"])
    S_hat = [WFs[i, :, : X.shape[1]] * X for i, X in enumerate(X_tfs)]
    N_hat = [WFn[i, :, : X.shape[1]] * X for i, X in enumerate(X_tfs)]
    if return_masks:
        return S_hat, N_hat, out
    return S_hat, N_hat


def enhance_files(file_paths, processed_dir, output_dir, vae_params,
                  model_type="m2", classif_type="dnn", target="ibm",
                  classifier_params=None, mean=None, std=None,
                  cfg: MCEMConfig = MCEMConfig(), batch_size=16,
                  bucket_multiple=128, quantile_fraction=0.98,
                  quantile_weight=0.999, seed=0, verbose=False,
                  engine="auto", noise_model="nmf"):
    """Full sweep over a test file list (reference evaluate_*.py main +
    process_utt): reads `<utt>_x.wav` (+ `_s.wav` for oracle labels), writes
    `<utt>_s_est.wav`, `<utt>_n_est.wav` and the soft/hard label arrays
    (`_ibm_soft_est.npy` / `_ibm_hard_est.npy` — npy instead of torch .pt).

    Utterances are grouped into (bucketed-length, batch_size) groups; each
    group is enhanced as one device batch. Returns wall-clock seconds.
    """
    t_start = time.perf_counter()

    # Load + label everything with a host thread pool (IO-bound; the
    # native C++ loader releases the GIL, so decode+STFT run in parallel)
    def load_one(path):
        base_in = os.path.join(processed_dir, os.path.splitext(path)[0])
        x_t, T_orig, X_tf = load_mixture(base_in)
        y_soft, y_hard = None, None
        if model_type == "m2":
            y_soft, y_hard = make_labels(
                classif_type, np.abs(X_tf) ** 2,
                s_path=base_in + "_s.wav",
                classifier_params=classifier_params, mean=mean, std=std,
                target=target, quantile_fraction=quantile_fraction,
                quantile_weight=quantile_weight,
            )
        return {"path": path, "T_orig": T_orig, "X_tf": X_tf,
                "y_soft": y_soft, "y_hard": y_hard}

    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=8) as pool:
        utts = list(pool.map(load_one, file_paths))

    # Bucket by padded length
    groups = defaultdict(list)
    for i, u in enumerate(utts):
        groups[bucket_frames(u["X_tf"].shape[1], bucket_multiple)].append(i)

    # Phase 1 — dispatch every batch asynchronously: hard labels travel as
    # uint8 and |X|^2 is recomputed on device, shrinking host->device
    # traffic; JAX's async dispatch overlaps each batch's transfer with
    # the previous batch's compute.
    key = jax.random.PRNGKey(seed)
    pending = []
    for n_pad, idxs in sorted(groups.items()):
        # keep batch x frames roughly constant so the E-step sample buffer
        # (B, R, F, N) stays within HBM for long-utterance buckets
        eff_batch = max(1, batch_size * 512 // max(n_pad, 512))
        for lo in range(0, len(idxs), eff_batch):
            sel = idxs[lo: lo + eff_batch]
            batch = [utts[i] for i in sel]
            key, sub = jax.random.split(key)
            keys = jax.random.split(sub, len(batch))
            X_tfs = [u["X_tf"] for u in batch]
            ys = ([u["y_hard"] for u in batch]
                  if model_type == "m2" else None)
            n_b = bucket_frames(max(X.shape[1] for X in X_tfs),
                                bucket_multiple)
            X_c, _, mask_b, y_b = _pad_batch(X_tfs, ys, n_b)
            use_fused = _use_fused(engine, vae_params, n_b)
            try:
                out = _enhance_to_audio_jit(
                    vae_params,
                    jnp.asarray(np.real(X_c).astype(np.float32)),
                    jnp.asarray(np.imag(X_c).astype(np.float32)),
                    None, jnp.asarray(mask_b),
                    None if y_b is None else jnp.asarray(
                        y_b.astype(np.uint8)),
                    keys, cfg, use_fused=use_fused,
                    noise_model=noise_model,
                )
            except Exception as exc:
                out = exc
            pending.append((batch, X_tfs, ys, keys, out))

    # Phase 2 — fetch results in dispatch order and write outputs;
    # fault-tolerant (SURVEY §7.10): a failed batch is retried one
    # utterance at a time, and an utterance that still fails degrades to
    # mixture passthrough instead of aborting the sweep.
    for n_batch, (batch, X_tfs, ys, keys, out) in enumerate(pending):
        t_origs = [u["T_orig"] for u in batch]
        try:
            if isinstance(out, Exception):
                raise out
            s_pad = np.asarray(out[0])
            n_pad_arr = np.asarray(out[1])
            if not np.all(np.isfinite(s_pad)):
                raise FloatingPointError("non-finite enhancement output")
            s_est = [s_pad[j][:t] for j, t in enumerate(t_origs)]
            n_est = [n_pad_arr[j][:t] for j, t in enumerate(t_origs)]
        except Exception as exc:
            print(f"batch of {len(batch)} failed ({exc!r}); "
                  "retrying per-utterance")
            s_est, n_est = [], []
            for j, u in enumerate(batch):
                try:
                    s1, n1 = enhance_to_audio(
                        vae_params, [X_tfs[j]], [t_origs[j]],
                        None if ys is None else [ys[j]],
                        keys[j:j + 1], cfg, bucket_multiple,
                        engine=engine, noise_model=noise_model,
                    )
                    s_est.append(s1[0])
                    n_est.append(n1[0])
                except Exception as exc2:
                    print(f"utterance {u['path']} failed ({exc2!r}); "
                          "writing passthrough")
                    x_t, _, _ = load_mixture(os.path.join(
                        processed_dir, os.path.splitext(u["path"])[0]))
                    s_est.append(x_t)
                    n_est.append(np.zeros_like(x_t))

        for j, u in enumerate(batch):
            base_out = os.path.join(
                output_dir, os.path.splitext(u["path"])[0]
            )
            os.makedirs(os.path.dirname(base_out), exist_ok=True)
            write_wav(base_out + "_s_est.wav", s_est[j], FS)
            write_wav(base_out + "_n_est.wav", n_est[j], FS)
            if u["y_soft"] is not None:
                # compact dtypes (soft f16, hard u8); consumers cast
                np.save(base_out + "_ibm_soft_est.npy",
                        u["y_soft"].astype(np.float16))
                np.save(base_out + "_ibm_hard_est.npy",
                        u["y_hard"].astype(np.uint8))
        if verbose:
            print(f"batch {n_batch}: enhanced {len(batch)} utterances")
    return time.perf_counter() - t_start


def enhance_files_wiener(file_paths, processed_dir, output_dir,
                         wiener_params, mean=None, std=None, eps=1e-8,
                         verbose=False):
    """DNN Wiener-mask baseline sweep (reference
    evaluate_wiener_filter.py:88-101): mask = model(x_norm);
    S_hat = mask * X; single ISTFT; writes `<utt>_s_est.wav`."""
    t_start = time.perf_counter()
    for path in file_paths:
        base_in = os.path.join(processed_dir, os.path.splitext(path)[0])
        x_t, T_orig, X_tf = load_mixture(base_in)
        x = (np.abs(X_tf) ** 2).T
        if mean is not None:
            x = (x - mean.reshape(1, -1)) / (std.reshape(1, -1) + eps)
        mask = np.asarray(classifier_apply(wiener_params, jnp.asarray(
            x.astype(np.float32)))).T
        S_hat = mask * X_tf
        n = X_tf.shape[1]
        s_hat = np.asarray(istft_masked_ri_jax(
            jnp.asarray(np.real(S_hat).astype(np.float32)),
            jnp.asarray(np.imag(S_hat).astype(np.float32)),
            jnp.ones((n,), jnp.float32)))[:T_orig]
        base_out = os.path.join(output_dir, os.path.splitext(path)[0])
        os.makedirs(os.path.dirname(base_out), exist_ok=True)
        write_wav(base_out + "_s_est.wav", s_hat, FS)
        np.save(base_out + "_wiener_mask.npy", mask)
        if verbose:
            print(f"wiener: {path}")
    return time.perf_counter() - t_start
