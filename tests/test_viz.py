"""Figure-builder smoke tests (reference python/visualization.py surface):
everything renders headlessly and produces the expected panel structure."""

import numpy as np
import matplotlib

matplotlib.use("pdf")
import matplotlib.pyplot as plt  # noqa: E402

from guided_vae_nmf_tpu.dsp import stft
from guided_vae_nmf_tpu.viz import (
    power_to_db,
    display_waveplot,
    display_spectrogram,
    display_power_spectro,
    display_wav_spectro_mask,
    display_multiple_signals,
    display_multiple_spectro,
)

FS = 16000


def _sig(n=16000):
    t = np.arange(n) / FS
    return np.sin(2 * np.pi * 440 * t) * np.exp(-t)


def test_power_to_db_conventions():
    S = np.array([[1.0, 10.0], [100.0, 1e-20]])
    db = power_to_db(S, top_db=80.0)
    assert db.max() == 20.0  # 10*log10(100)
    assert db.min() >= db.max() - 80.0  # range limiting


def test_single_panel_builders():
    x = _sig()
    X = stft(x)
    plt.figure()
    display_waveplot(x, fontsize=8)
    plt.close("all")
    plt.figure()
    display_spectrogram(X, convert_to_db=True, fontsize=8)
    plt.close("all")
    plt.figure()
    display_power_spectro(np.abs(X) ** 2, convert_to_db=True, fontsize=8)
    plt.close("all")


def test_montage_builders(tmp_path):
    x = _sig()
    X = stft(x)
    ibm = (np.abs(X) ** 2 > 0.01).astype(np.float32)
    vad = ibm.max(axis=0, keepdims=True)

    fig = display_wav_spectro_mask(x, X, ibm)
    fig.savefig(tmp_path / "m.png", dpi=20)
    plt.close(fig)

    # VAD rows broadcast to all bins for display
    fig = display_wav_spectro_mask(x, X, vad)
    plt.close(fig)

    fig = display_multiple_signals(
        [[x, X, ibm], [x, X, None]], titles=["a", "b"]
    )
    assert len(fig.axes) >= 5
    plt.close(fig)

    fig = display_multiple_spectro([[x, X], [x, X]], titles=["a", "b"])
    assert len(fig.axes) == 4
    plt.close(fig)
