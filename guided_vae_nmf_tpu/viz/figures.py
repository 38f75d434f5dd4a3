"""Figure builders: waveform / spectrogram / mask inspection montages.

Capability parity with reference python/visualization.py:8-326
(display_waveplot, display_spectrogram, display_power_spectro,
display_wav_spectro_mask, display_multiple_signals,
display_multiple_spectro) without librosa.display: dB conversion and
time/frequency axes are computed directly. The 'pdf' backend is forced for
headless use exactly like the reference (visualization.py:4), and the same
display conventions are kept: magma colormap, -40/20 dB limits in the
montage builders, VAD rows broadcast to all frequency bins for display
(visualization.py:73-75).
"""

import numpy as np
import matplotlib

matplotlib.use("pdf")  # headless (remote/CI) use
import matplotlib.pyplot as plt  # noqa: E402
import matplotlib.gridspec as grd  # noqa: E402

FS = 16000


def power_to_db(S, ref=1.0, amin=1e-10, top_db=80.0):
    """10*log10(S/ref) with amin flooring and top_db range limiting (the
    librosa.power_to_db convention the reference relies on)."""
    S = np.asarray(S)
    log_spec = 10.0 * np.log10(np.maximum(amin, S))
    log_spec -= 10.0 * np.log10(np.maximum(amin, ref))
    if top_db is not None:
        log_spec = np.maximum(log_spec, log_spec.max() - top_db)
    return log_spec


def _extent(n_frames, fs=FS, hop=256, n_bins=513):
    return [0, n_frames * hop / fs, 0, fs / 2 / 1000.0]  # sec x kHz


def display_waveplot(x, fs=FS, ymax=1.0, ymin=-1.0, xticks_sec=1.0,
                     fontsize=50):
    """Amplitude-vs-time waveform plot (reference visualization.py:8-42)."""
    t = np.arange(len(x)) / fs
    plt.rcParams.update({"font.size": fontsize})
    img = plt.plot(t, x, linewidth=0.5)
    plt.ylabel("Amplitude", fontsize=fontsize + 10)
    plt.xlabel("Time (s)", fontsize=fontsize + 10)
    plt.xticks(np.arange(0, len(x) / fs, step=xticks_sec), fontsize=fontsize)
    plt.yticks(fontsize=fontsize)
    plt.ylim(ymin=ymin, ymax=ymax)
    return img


def display_spectrogram(complex_spec, convert_to_db=False, fs=FS, vmin=-60,
                        vmax=10, wlen_sec=64e-3, hop_percent=0.25,
                        xticks_sec=1.0, cmap="magma", fontsize=50):
    """Magnitude (optionally dB) spectrogram image (reference
    visualization.py:44-105)."""
    spec = np.abs(complex_spec)
    if convert_to_db:
        spec = power_to_db(spec**2)
    hop = int(hop_percent * wlen_sec * fs)
    plt.rcParams.update({"font.size": fontsize})
    img = plt.imshow(spec, origin="lower", aspect="auto", cmap=cmap,
                     vmin=vmin, vmax=vmax,
                     extent=_extent(spec.shape[1], fs, hop, spec.shape[0]))
    plt.ylabel("Frequency (kHz)", fontsize=fontsize + 10)
    plt.xlabel("Time (s)", fontsize=fontsize + 10)
    return img


def display_power_spectro(psd, convert_to_db=False, fs=FS, vmin=-60, vmax=10,
                          wlen_sec=64e-3, hop_percent=0.25, cmap="magma",
                          fontsize=50):
    """Power spectrogram image (reference visualization.py:107-155)."""
    spec = np.asarray(psd)
    if convert_to_db:
        spec = power_to_db(spec)
    hop = int(hop_percent * wlen_sec * fs)
    img = plt.imshow(spec, origin="lower", aspect="auto", cmap=cmap,
                     vmin=vmin, vmax=vmax,
                     extent=_extent(spec.shape[1], fs, hop, spec.shape[0]))
    plt.ylabel("Frequency (kHz)", fontsize=fontsize + 10)
    plt.xlabel("Time (s)", fontsize=fontsize + 10)
    return img


def _broadcast_mask(mask, n_bins=513):
    """VAD rows (1, frames) are broadcast to all bins for display
    (reference visualization.py:73-75)."""
    mask = np.asarray(mask)
    if mask.shape[0] == 1:
        mask = np.repeat(mask, n_bins, axis=0)
    return mask


def display_wav_spectro_mask(x, x_tf, x_ibm, fs=FS, vmin=-40, vmax=20,
                             wlen_sec=64e-3, hop_percent=0.25,
                             cmap="magma"):
    """3-row montage: waveform / dB spectrogram / mask (reference
    visualization.py:157-199)."""
    fig = plt.figure(figsize=(20, 25))
    gs = grd.GridSpec(3, 2, height_ratios=[3, 10, 10],
                      width_ratios=[10, 0.5], wspace=0.1, hspace=0.3)
    hop = int(hop_percent * wlen_sec * fs)

    ax = fig.add_subplot(gs[0, 0])
    ax.plot(np.arange(len(x)) / fs, x, linewidth=0.5)
    ax.set_xlim(0, len(x) / fs)
    ax.set_ylabel("Amplitude")

    ax = fig.add_subplot(gs[1, 0])
    im = ax.imshow(power_to_db(np.abs(x_tf) ** 2), origin="lower",
                   aspect="auto", cmap=cmap, vmin=vmin, vmax=vmax,
                   extent=_extent(x_tf.shape[1], fs, hop))
    ax.set_ylabel("Frequency (kHz)")
    fig.colorbar(im, cax=fig.add_subplot(gs[1, 1]))

    ax = fig.add_subplot(gs[2, 0])
    im = ax.imshow(_broadcast_mask(x_ibm), origin="lower", aspect="auto",
                   cmap=cmap, vmin=0, vmax=1,
                   extent=_extent(x_tf.shape[1], fs, hop))
    ax.set_ylabel("Frequency (kHz)")
    ax.set_xlabel("Time (s)")
    fig.colorbar(im, cax=fig.add_subplot(gs[2, 1]))
    return fig


def display_multiple_signals(signal_list, fs=FS, vmin=-40, vmax=20,
                             wlen_sec=64e-3, hop_percent=0.25,
                             titles=None, cmap="magma"):
    """Side-by-side (waveform, spectrogram, mask) columns for several
    signals — the per-utterance metric figure (reference
    visualization.py:201-269; used by run_metrics_M2.py:174-200).

    signal_list: list of [x_time, x_tf, mask_or_None].
    """
    nb = len(signal_list)
    fig = plt.figure(figsize=(10 * nb, 15))
    gs = grd.GridSpec(3, nb, hspace=0.3, wspace=0.2)
    hop = int(hop_percent * wlen_sec * fs)
    for i, (x_t, x_tf, mask) in enumerate(signal_list):
        ax = fig.add_subplot(gs[0, i])
        ax.plot(np.arange(len(x_t)) / fs, x_t, linewidth=0.5)
        ax.set_xlim(0, len(x_t) / fs)
        if titles:
            ax.set_title(titles[i])
        ax = fig.add_subplot(gs[1, i])
        ax.imshow(power_to_db(np.abs(x_tf) ** 2), origin="lower",
                  aspect="auto", cmap=cmap, vmin=vmin, vmax=vmax,
                  extent=_extent(x_tf.shape[1], fs, hop))
        ax = fig.add_subplot(gs[2, i])
        if mask is not None:
            ax.imshow(_broadcast_mask(mask), origin="lower", aspect="auto",
                      cmap=cmap, vmin=0, vmax=1,
                      extent=_extent(x_tf.shape[1], fs, hop))
        else:
            ax.axis("off")
    return fig


def display_multiple_spectro(signal_list, fs=FS, vmin=-40, vmax=20,
                             wlen_sec=64e-3, hop_percent=0.25,
                             titles=None, cmap="magma"):
    """Waveform + spectrogram rows only (reference
    visualization.py:271-326)."""
    nb = len(signal_list)
    fig = plt.figure(figsize=(10 * nb, 10))
    gs = grd.GridSpec(2, nb, hspace=0.3, wspace=0.2)
    hop = int(hop_percent * wlen_sec * fs)
    for i, (x_t, x_tf) in enumerate(signal_list):
        ax = fig.add_subplot(gs[0, i])
        ax.plot(np.arange(len(x_t)) / fs, x_t, linewidth=0.5)
        ax.set_xlim(0, len(x_t) / fs)
        if titles:
            ax.set_title(titles[i])
        ax = fig.add_subplot(gs[1, i])
        ax.imshow(power_to_db(np.abs(x_tf) ** 2), origin="lower",
                  aspect="auto", cmap=cmap, vmin=vmin, vmax=vmax,
                  extent=_extent(x_tf.shape[1], fs, hop))
    return fig
