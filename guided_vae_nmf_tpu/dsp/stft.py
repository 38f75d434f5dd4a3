"""STFT / inverse STFT.

Capability parity with the reference wrappers (reference:
python/processing/stft.py:16-102), which delegate to librosa. librosa is not a
dependency of this framework: the transform is implemented from first
principles twice —

  * :func:`stft` / :func:`istft` — host-side numpy, float64 accumulation with
    a complex64/float32 result, matching the reference's librosa output
    bit-for-bit on the bundled golden pickles (verified in
    tests/dsp/test_stft.py). Used for dataset synthesis and golden tests.
  * :func:`stft_jax` / :func:`istft_jax` — pure `jnp`, float32, jittable and
    vmappable. Used on-device by the enhancement engine. Framing is a gather,
    the DFT is `jnp.fft.rfft`, overlap-add is a scatter-add; XLA fuses the
    windowing into the FFT's input.

Frozen conventions (the compatibility contract, reference stft.py:16-63):
fs=16 kHz, 64 ms window => nfft=1024 => 513 bins, hop=25% => 256 samples,
periodic hann, centered with reflect padding, end-padded with one extra hop of
zeros when the signal length is not a multiple of the hop, complex64 output of
shape (freq_bins, frames).
"""

import math

import numpy as np
import jax
import jax.numpy as jnp
from functools import partial


def stft_params(fs=16000, wlen_sec=64e-3, hop_percent=0.25):
    """Resolve (nfft, hop) from the reference's parameterization.

    Raises ValueError when wlen_sec*fs is not an integer (reference
    stft.py:37-38).
    """
    if wlen_sec * fs != int(wlen_sec * fs):
        raise ValueError("wlen_sample of STFT is not an integer.")
    nfft = int(wlen_sec * fs)
    hopsamp = int(hop_percent * nfft)
    return nfft, hopsamp


def periodic_hann(n):
    """Periodic (DFT-even) Hann window of length n, float64.

    Equals scipy.signal.get_window('hann', n, fftbins=True), which is what
    librosa uses internally.
    """
    return 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / n)


def _end_pad_len(n, fs, wlen_sec, hop_percent, hopsamp):
    """Zeros the reference end-padding rule appends to an `n`-sample
    utterance (stft.py:48-53): one hop unless the duration is an exact
    multiple of the hop, compared in float seconds exactly as the
    reference does. Length-based so streaming flush (which no longer
    materializes the whole signal) shares the frozen contract."""
    utt_len = n / fs
    if math.ceil(utt_len / wlen_sec / hop_percent) != int(
        utt_len / wlen_sec / hop_percent
    ):
        return hopsamp
    return 0


def _maybe_end_pad(x, fs, wlen_sec, hop_percent, hopsamp):
    """Reference end-padding rule applied to a signal (see
    :func:`_end_pad_len`)."""
    z = _end_pad_len(len(x), fs, wlen_sec, hop_percent, hopsamp)
    if z:
        return np.pad(x, (0, z), mode="constant")
    return x


def stft(
    x,
    fs=16e3,
    wlen_sec=64e-3,
    win="hann",
    hop_percent=0.25,
    center=True,
    pad_mode="reflect",
    pad_at_end=True,
    dtype="complex64",
):
    """Host-side STFT, shape (nfft//2+1, n_frames), complex64.

    Matches librosa.core.stft semantics as used by the reference
    (stft.py:55-62): centered reflect padding of nfft//2 samples, periodic
    hann window, rfft of each windowed frame, computed in the input float
    precision then cast to `dtype`.
    """
    if win != "hann":
        raise ValueError("only hann windows are supported")
    fs = int(fs)
    nfft, hopsamp = stft_params(fs, wlen_sec, hop_percent)

    x = np.asarray(x)
    if pad_at_end:
        x = _maybe_end_pad(x, fs, wlen_sec, hop_percent, hopsamp)

    if center:
        x = np.pad(x, nfft // 2, mode=pad_mode)

    n_frames = 1 + (len(x) - nfft) // hopsamp
    window = periodic_hann(nfft)
    # Strided view of all frames: (n_frames, nfft), then window + rfft.
    frames = np.lib.stride_tricks.as_strided(
        x,
        shape=(n_frames, nfft),
        strides=(x.strides[0] * hopsamp, x.strides[0]),
    )
    Sxx = np.fft.rfft(frames * window, axis=-1).T
    return Sxx.astype(dtype)


def istft(
    Sxx,
    fs=16000,
    wlen_sec=64e-3,
    win="hann",
    hop_percent=0.25,
    center=True,
    dtype="float32",
    max_len=None,
):
    """Host-side inverse STFT with windowed overlap-add and squared-window
    normalization (librosa.core.istft semantics, reference stft.py:92-101).

    `max_len` truncates/zero-pads the output to that many samples — callers
    pass the original sample count T_orig (e.g. reference
    scripts/evaluate_M1.py:144-149).
    """
    if win != "hann":
        raise ValueError("only hann windows are supported")
    nfft, hopsamp = stft_params(fs, wlen_sec, hop_percent)
    window = periodic_hann(nfft)

    Sxx = np.asarray(Sxx)
    n_frames = Sxx.shape[1]
    expected_len = nfft + hopsamp * (n_frames - 1)

    # Overlap-add of windowed inverse DFT frames.
    frames = np.fft.irfft(Sxx.T, n=nfft, axis=-1) * window
    y = np.zeros(expected_len, dtype=np.float64)
    wss = np.zeros(expected_len, dtype=np.float64)
    wsq = window**2
    for i in range(n_frames):
        start = i * hopsamp
        y[start : start + nfft] += frames[i]
        wss[start : start + nfft] += wsq
    # Normalize by the summed squared window where it is numerically nonzero.
    nz = wss > np.finfo(np.float64).tiny
    y[nz] /= wss[nz]

    if center:
        y = y[nfft // 2 : expected_len - nfft // 2]

    if max_len is not None:
        out = np.zeros(int(max_len), dtype=np.float64)
        n = min(len(y), int(max_len))
        out[:n] = y[:n]
        y = out
    return y.astype(dtype)


# --------------------------------------------------------------------------
# On-device (jnp) implementations
# --------------------------------------------------------------------------


def frame_count(
    n_samples, fs=16000, wlen_sec=64e-3, hop_percent=0.25, pad_at_end=True
):
    """Number of STFT frames produced for an n_samples-long signal, matching
    :func:`stft` (centered + end-pad rule, including its float-seconds
    divisibility test)."""
    nfft, hopsamp = stft_params(fs, wlen_sec, hop_percent)
    utt_len = n_samples / fs
    if pad_at_end and math.ceil(utt_len / wlen_sec / hop_percent) != int(
        utt_len / wlen_sec / hop_percent
    ):
        n_samples = n_samples + hopsamp
    return 1 + n_samples // hopsamp


@partial(jax.jit, static_argnames=("nfft", "hopsamp"))
def stft_jax(x, nfft=1024, hopsamp=256):
    """Jittable float32 STFT of a 1-D signal → (nfft//2+1, n_frames) complex64.

    The end-pad decision is shape-dependent and therefore resolved at trace
    time from the static length of `x`: callers must pre-pad with
    :func:`pad_signal_jax` or pass lengths that are already hop-multiples.
    This function applies only the centered reflect padding.
    """
    x = jnp.asarray(x, jnp.float32)
    if x.shape[0] % hopsamp != 0:
        x = jnp.pad(x, (0, hopsamp))  # end-pad rule fires for non-multiples
    xp = jnp.pad(x, nfft // 2, mode="reflect")
    n_frames = 1 + (xp.shape[0] - nfft) // hopsamp
    idx = jnp.arange(n_frames)[:, None] * hopsamp + jnp.arange(nfft)[None, :]
    window = jnp.asarray(periodic_hann(nfft), jnp.float32)
    frames = xp[idx] * window
    return jnp.fft.rfft(frames, axis=-1).T.astype(jnp.complex64)


def pad_signal_for_stft(x, fs=16000, wlen_sec=64e-3, hop_percent=0.25):
    """Host-side pre-padding for the on-device batched STFT: applies the
    reference's end-pad rule plus the centered reflect padding, returning
    (padded signal, n_valid_frames). float input comes back float32;
    int16 PCM comes back int16 (reflect padding copies samples, so raw
    PCM can ship as-is — the device consumer must then apply the decoder's
    1/32768 scaling, as `_enhance_waveform_jit` does). Note the padded
    length can exceed (n_valid_frames-1)*hop + nfft by up to hop-1
    samples when the end-padded length is not a hop multiple; the excess
    belongs to no frame and may be truncated.

    Frames [0, n_valid) of :func:`stft_batch_padded_jax` over the padded
    signal are sample-identical to :func:`stft` of the raw signal — only
    the FFT arithmetic precision differs (f32 on device vs f64 host).
    The reflect padding must happen per-utterance on the host: batching
    zero-padded signals first would reflect the wrong samples at the
    utterance end.
    """
    nfft, hopsamp = stft_params(fs, wlen_sec, hop_percent)
    x = np.asarray(x)
    x = _maybe_end_pad(x, fs, wlen_sec, hop_percent, hopsamp)
    n_frames = 1 + len(x) // hopsamp
    xp = np.pad(x, nfft // 2, mode="reflect")
    if xp.dtype != np.int16:  # int16 PCM ships raw; the device rescales
        xp = xp.astype(np.float32)
    return xp, n_frames


@partial(jax.jit, static_argnames=("nfft", "hopsamp"))
def stft_batch_padded_jax(x_pad, nfft=1024, hopsamp=256):
    """Batched on-device STFT of host-pre-padded signals (see
    :func:`pad_signal_for_stft`): (B, L) float32 -> (B, nfft//2+1,
    n_frames) complex64 with n_frames = 1 + (L - nfft) // hopsamp.

    Shipping waveforms + computing the STFT on device cuts host->device
    traffic ~4x versus shipping split-complex spectrograms (T samples vs
    2 * 513 * T/256 floats) and moves the FFT onto the accelerator."""
    B, L = x_pad.shape
    n_frames = 1 + (L - nfft) // hopsamp
    window = jnp.asarray(periodic_hann(nfft), jnp.float32)
    frames = _frame_signal(x_pad, n_frames, nfft, hopsamp) * window
    return jnp.fft.rfft(frames, axis=-1).transpose(0, 2, 1).astype(
        jnp.complex64)


def _frame_signal(x_pad, n_frames, nfft, hopsamp):
    """(B, L) -> (B, n_frames, nfft) sliding frames WITHOUT a gather: the
    inverse of :func:`_overlap_add`'s phase-split — frames whose index is
    congruent mod nfft//hopsamp tile the signal contiguously, so framing
    is `ratio` static slices + reshapes interleaved by a stack (a TPU
    gather with a (n_frames, nfft) index matrix measured ~144 ms at 16k
    frames; this form is ~ms and exact)."""
    B, L = x_pad.shape
    ratio = nfft // hopsamp
    if ratio * hopsamp != nfft:  # fallback: gather
        idx = (jnp.arange(n_frames)[:, None] * hopsamp
               + jnp.arange(nfft)[None, :])
        return x_pad[:, idx]
    phases = []
    for p in range(ratio):
        start = p * hopsamp
        n_p = (L - start - nfft) // nfft + 1
        phases.append(
            x_pad[:, start:start + n_p * nfft].reshape(B, n_p, nfft))
    n_min = min(ph.shape[1] for ph in phases)
    head = jnp.stack([ph[:, :n_min] for ph in phases], axis=2).reshape(
        B, n_min * ratio, nfft)
    tail = [ph[:, n_min:] for ph in phases if ph.shape[1] > n_min]
    return jnp.concatenate([head] + tail, axis=1)[:, :n_frames]


@partial(jax.jit, static_argnames=("nfft", "hopsamp"))
def istft_masked_ri_jax(S_re, S_im, frame_mask, nfft=1024, hopsamp=256):
    """Real/imag-input variant of :func:`istft_masked_jax`.

    Some device transports cannot ship complex64 host<->device buffers (the
    axon TPU tunnel among them); this entry point takes float32 real and
    imaginary parts and forms the complex spectrogram on device.
    """
    return istft_masked_jax(S_re + 1j * S_im, frame_mask, nfft=nfft,
                            hopsamp=hopsamp)


def _overlap_add(frames, nfft, hopsamp):
    """Overlap-add of (n_frames, nfft) windowed frames at hop `hopsamp`
    WITHOUT a scatter: when hopsamp divides nfft, frames taken every
    nfft//hopsamp rows land at non-overlapping, contiguous output
    positions, so the OLA is `ratio` reshapes + shifted pads + one sum.
    A TPU scatter-add serializes (measured ~0.5 s at 16k frames, growing
    superlinearly); this form is pure data movement and stays ~ms at
    100k+ frames. Each output sample still sums exactly its `ratio`
    contributing frames — only the f32 summation order differs from the
    scatter (≤1 ulp per sample)."""
    n_frames = frames.shape[0]
    expected_len = nfft + hopsamp * (n_frames - 1)
    ratio = nfft // hopsamp
    if ratio * hopsamp != nfft:  # fallback: exact scatter
        idx = (jnp.arange(n_frames)[:, None] * hopsamp
               + jnp.arange(nfft)[None, :])
        return jnp.zeros(expected_len, jnp.float32).at[
            idx.reshape(-1)].add(frames.reshape(-1))
    y = jnp.zeros(expected_len, jnp.float32)
    for p in range(ratio):
        rows = frames[p::ratio]              # rows nfft apart in output
        flat = rows.reshape(-1)
        start = p * hopsamp
        y = y + jnp.pad(flat, (start, expected_len - start - flat.size))
    return y


@partial(jax.jit, static_argnames=("nfft", "hopsamp"))
def istft_masked_jax(Sxx, frame_mask, nfft=1024, hopsamp=256):
    """Inverse STFT of a frame-padded spectrogram: only frames with
    frame_mask==1 contribute to the overlap-add numerator AND the
    squared-window normalization, so the valid samples are bit-identical to
    an unpadded ISTFT (naively padding with zero frames would over-normalize
    the last window of real audio). Returns the full padded-length signal;
    callers trim to T_orig."""
    Sxx = jnp.asarray(Sxx)
    n_frames = Sxx.shape[1]
    expected_len = nfft + hopsamp * (n_frames - 1)
    window = jnp.asarray(periodic_hann(nfft), jnp.float32)

    frames = jnp.fft.irfft(Sxx.T, n=nfft, axis=-1).astype(jnp.float32)
    frames = frames * window * frame_mask[:, None]
    y = _overlap_add(frames, nfft, hopsamp)
    wsq = jnp.broadcast_to((window**2)[None, :],
                           (n_frames, nfft)) * frame_mask[:, None]
    wss = _overlap_add(wsq, nfft, hopsamp)
    y = jnp.where(wss > jnp.finfo(jnp.float32).tiny, y / wss, y)
    return y[nfft // 2 : expected_len - nfft // 2]


@partial(jax.jit, static_argnames=("nfft", "hopsamp", "max_len"))
def istft_jax(Sxx, nfft=1024, hopsamp=256, max_len=None):
    """Jittable inverse STFT (float32): windowed overlap-add via scatter-add
    with squared-window normalization; optionally fixed to `max_len` samples
    (static)."""
    Sxx = jnp.asarray(Sxx)
    n_frames = Sxx.shape[1]
    expected_len = nfft + hopsamp * (n_frames - 1)
    window = jnp.asarray(periodic_hann(nfft), jnp.float32)

    frames = jnp.fft.irfft(Sxx.T, n=nfft, axis=-1).astype(jnp.float32) * window
    y = _overlap_add(frames, nfft, hopsamp)
    wss = _overlap_add(
        jnp.broadcast_to(window**2, frames.shape), nfft, hopsamp)
    y = jnp.where(wss > jnp.finfo(jnp.float32).tiny, y / wss, y)

    y = y[nfft // 2 : expected_len - nfft // 2]
    if max_len is not None:
        pad = max(0, int(max_len) - y.shape[0])
        y = jnp.pad(y, (0, pad))[: int(max_len)]
    return y
