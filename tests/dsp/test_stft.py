"""STFT/ISTFT tests.

Mirrors the reference test strategy (reference tests/processing/test_stft.py):
round-trip identity plus concat-shape convention, and adds golden-parity
checks against the bundled pickles produced by the reference's librosa
pipeline (reference tests/dataset/test_csr1_wjs0_dataset.py).
"""

import numpy as np
import pytest
from numpy.testing import assert_allclose, assert_array_almost_equal

from conftest import REFERENCE_DATA, has_reference_data
from guided_vae_nmf_tpu.data import read_wav, speech_list, read_dataset
from guided_vae_nmf_tpu.dsp import stft, istft, stft_jax, istft_jax, frame_count

FS = 16000
WLEN_SEC = 64e-3
HOP_PERCENT = 0.25


def _chirp(n, fs=FS):
    t = np.arange(n) / fs
    return (0.5 * np.sin(2 * np.pi * (200 + 1500 * t) * t)).astype(np.float64)


@pytest.mark.parametrize("n_samples", [16000, 16001, 115136, 40960 + 77])
def test_roundtrip_identity(n_samples):
    x = _chirp(n_samples)
    Sxx = stft(x, fs=FS, wlen_sec=WLEN_SEC, hop_percent=HOP_PERCENT)
    assert Sxx.shape[0] == 513
    assert Sxx.dtype == np.complex64
    x_hat = istft(Sxx, fs=FS, wlen_sec=WLEN_SEC, hop_percent=HOP_PERCENT,
                  max_len=len(x))
    assert_array_almost_equal(x_hat, x, decimal=5)


def test_concat_spectrograms():
    a = stft(_chirp(16000), fs=FS, wlen_sec=WLEN_SEC, hop_percent=HOP_PERCENT)
    b = stft(_chirp(32000), fs=FS, wlen_sec=WLEN_SEC, hop_percent=HOP_PERCENT)
    cat = np.concatenate([a, b], axis=1)
    assert cat.shape == (513, a.shape[1] + b.shape[1])


@pytest.mark.parametrize("n_samples", [16000, 16001, 115136])
def test_jax_matches_numpy(n_samples):
    x = _chirp(n_samples)
    Sxx = stft(x, fs=FS, wlen_sec=WLEN_SEC, hop_percent=HOP_PERCENT)
    Sxx_j = np.asarray(stft_jax(x.astype(np.float32)))
    assert Sxx_j.shape == Sxx.shape
    scale = np.abs(Sxx).max()
    assert_allclose(Sxx_j, Sxx, atol=2e-4 * scale)

    x_hat = np.asarray(istft_jax(Sxx_j, max_len=n_samples))
    assert_allclose(x_hat, x, atol=1e-4)


def test_frame_count_matches_stft():
    for n in [16000, 16001, 115136, 115200, 12345]:
        x = _chirp(n)
        Sxx = stft(x, fs=FS, wlen_sec=WLEN_SEC, hop_percent=HOP_PERCENT)
        assert Sxx.shape[1] == frame_count(n, FS, WLEN_SEC, HOP_PERCENT)


def test_wlen_must_be_integer_samples():
    with pytest.raises(ValueError):
        stft(_chirp(1000), fs=16000, wlen_sec=1e-4 * np.pi)


@pytest.mark.skipif(not has_reference_data(), reason="reference subset absent")
@pytest.mark.parametrize("dataset_type", ["train", "validation", "test"])
def test_golden_parity_vs_reference_pickles(dataset_type):
    """Recompute power spectrograms from the raw subset wavs with this
    framework's STFT and compare with the reference-generated golden pickles
    (librosa output). This is the librosa-parity contract."""
    raw_dir = f"{REFERENCE_DATA}/raw/"
    files = speech_list(raw_dir, dataset_type)
    assert files, "no wavs found in reference subset"

    spectrograms = []
    for path in files:
        x, fs = read_wav(raw_dir + path)
        assert fs == FS
        x = x[int(0.1 * FS):]          # cut leading burst
        x = x / np.max(np.abs(x))      # peak-normalize
        Sxx = stft(x, fs=FS, wlen_sec=WLEN_SEC, hop_percent=HOP_PERCENT)
        spectrograms.append(np.abs(Sxx) ** 2)
    ours = np.concatenate(spectrograms, axis=1)

    golden = read_dataset(f"{REFERENCE_DATA}/pickle/", dataset_type, "frames")
    assert ours.shape == golden.shape
    assert_allclose(ours, golden, rtol=1e-4, atol=1e-6 * golden.max())
