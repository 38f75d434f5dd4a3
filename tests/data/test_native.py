"""Native C++ loader tests: decode and STFT parity with the Python/numpy
implementations (which are themselves golden-parity with the reference)."""

import numpy as np
import pytest
from numpy.testing import assert_allclose, assert_array_equal

from conftest import REFERENCE_DATA, has_reference_data
from guided_vae_nmf_tpu.data import read_wav, speech_list, write_wav
from guided_vae_nmf_tpu.data.native_loader import (
    is_available,
    read_wav_native,
    stft_power_native,
    load_power_native,
)
from guided_vae_nmf_tpu.dsp import stft

pytestmark = pytest.mark.skipif(
    not is_available(), reason="native toolchain unavailable"
)

FS = 16000


def test_riff_decode_matches_python(tmp_path):
    rng = np.random.RandomState(0)
    x = np.clip(0.5 * rng.randn(12345), -1, 1)
    path = str(tmp_path / "t.wav")
    write_wav(path, x, FS)
    py, fs_py = read_wav(path)
    nat, fs_nat = read_wav_native(path)
    assert fs_py == fs_nat == FS
    assert_array_equal(nat, py)


@pytest.mark.skipif(not has_reference_data(), reason="subset absent")
def test_sphere_decode_matches_python():
    raw = f"{REFERENCE_DATA}/raw/"
    path = raw + speech_list(raw, "train")[0]
    py, fs_py = read_wav(path)
    nat, fs_nat = read_wav_native(path)
    assert fs_py == fs_nat
    assert_array_equal(nat, py)


def test_stft_power_matches_python():
    rng = np.random.RandomState(1)
    for n in (16000, 16001, 40960 + 77):
        x = 0.3 * rng.randn(n)
        ref = (np.abs(stft(x)) ** 2).astype(np.float32)
        nat = stft_power_native(x)
        assert nat.shape == ref.shape
        assert_allclose(nat, ref, rtol=1e-5, atol=1e-7 * ref.max())


def test_stft_complex_matches_python():
    from guided_vae_nmf_tpu.data.native_loader import stft_complex_native

    rng = np.random.RandomState(2)
    for n in (16000, 16001):
        x = 0.3 * rng.randn(n)
        ref = stft(x)
        nat = stft_complex_native(x)
        assert nat.shape == ref.shape and nat.dtype == np.complex64
        scale = np.abs(ref).max()
        assert_allclose(nat, ref, atol=1e-5 * scale)


@pytest.mark.skipif(not has_reference_data(), reason="subset absent")
def test_fused_load_power_matches_pipeline():
    raw = f"{REFERENCE_DATA}/raw/"
    path = raw + speech_list(raw, "train")[0]
    x, fs = read_wav(path)
    x = x[int(0.1 * FS):]
    x = x / np.max(np.abs(x))
    ref = (np.abs(stft(x)) ** 2).astype(np.float32)
    nat = load_power_native(path)
    assert nat.shape == ref.shape
    assert_allclose(nat, ref, rtol=1e-5, atol=1e-7 * ref.max())


def test_native_assemble_utt_exact():
    """The C++ batch assembler (decode + end-pad + reflect-pad + PCM16)
    must be bit-exact vs the Python path on both RIFF and SPHERE files."""
    import glob

    from guided_vae_nmf_tpu.data import native_loader as nl
    from guided_vae_nmf_tpu.data import read_wav_int16
    from guided_vae_nmf_tpu.dsp import pad_signal_for_stft

    if not nl.has_assemble():
        pytest.skip("native assembler not built")
    paths = sorted(glob.glob(
        f"{REFERENCE_DATA}/processed/CSR-1-WSJ-0/**/*_x.wav",
        recursive=True))[:2]
    paths += sorted(glob.glob(
        f"{REFERENCE_DATA}/raw/CSR-1-WSJ-0/**/*.wav", recursive=True))[:1]
    assert paths
    for p in paths:
        x, _ = read_wav_int16(p)
        xp, nf_py = pad_signal_for_stft(x)
        L = (((nf_py + 127) // 128) * 128 - 1) * 256 + 1024
        row_py = np.zeros(L, np.int16)
        row_py[: min(len(xp), L)] = xp[:L]
        row_c = np.zeros(L, np.int16)
        nf_c, t_c = nl.assemble_utt_native(p, row_c)
        assert nf_c == nf_py and t_c == len(x)
        np.testing.assert_array_equal(row_c, row_py)
