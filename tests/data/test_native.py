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


# ---------------------------------------------------------------------------
# malformed / hostile container inputs — the decoder feeds a C++ path from
# user-supplied files, so truncated or crafted headers must fail cleanly
# (IOError) or decode the clamped prefix; never read out of bounds.
# ---------------------------------------------------------------------------


def _riff(fmt_body=None, data=b"\x00\x00" * 64, data_sz=None,
          extra_chunks=b""):
    """Assemble a minimal RIFF wav with full control over the headers."""
    if fmt_body is None:
        # PCM16 mono 16 kHz
        fmt_body = (
            (1).to_bytes(2, "little") + (1).to_bytes(2, "little")
            + (16000).to_bytes(4, "little") + (32000).to_bytes(4, "little")
            + (2).to_bytes(2, "little") + (16).to_bytes(2, "little")
        )
    chunks = b"fmt " + len(fmt_body).to_bytes(4, "little") + fmt_body
    chunks += extra_chunks
    sz = len(data) if data_sz is None else data_sz
    chunks += b"data" + sz.to_bytes(4, "little") + data
    body = b"WAVE" + chunks
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def _fmt(audio_format=1, channels=1, fs=16000, bits=16):
    return (
        audio_format.to_bytes(2, "little") + channels.to_bytes(2, "little")
        + fs.to_bytes(4, "little") + (fs * channels * max(bits // 8, 1))
        .to_bytes(4, "little") + (channels * max(bits // 8, 1))
        .to_bytes(2, "little") + bits.to_bytes(2, "little")
    )


def _write(tmp_path, name, blob):
    p = tmp_path / name
    p.write_bytes(blob)
    return str(p)


def test_truncated_data_chunk_clamps(tmp_path):
    # declares 1 MiB of PCM but ships 128 bytes — must decode the prefix
    p = _write(tmp_path, "trunc.wav",
               _riff(data=b"\x01\x00" * 64, data_sz=1 << 20))
    x, fs = read_wav_native(p)
    assert fs == 16000 and len(x) == 64


def test_huge_declared_chunk_size_no_crash(tmp_path):
    p = _write(tmp_path, "huge.wav",
               _riff(data=b"\x01\x00" * 8, data_sz=0xFFFFFFF0))
    x, _ = read_wav_native(p)
    assert len(x) == 8


def test_zero_channels_rejected(tmp_path):
    p = _write(tmp_path, "ch0.wav", _riff(fmt_body=_fmt(channels=0)))
    with pytest.raises(IOError):
        read_wav_native(p)


def test_zero_bits_rejected(tmp_path):
    p = _write(tmp_path, "b0.wav", _riff(fmt_body=_fmt(bits=0)))
    with pytest.raises(IOError):
        read_wav_native(p)


def test_fmt_chunk_past_eof_rejected(tmp_path):
    # fmt declares 16 bytes but the file ends after 4 — the partial fmt
    # must not be read; with no valid fmt/fs the decode fails
    blob = b"RIFF" + (36).to_bytes(4, "little") + b"WAVE"
    blob += b"fmt " + (16).to_bytes(4, "little") + b"\x01\x00\x01\x00"
    blob += b"\x00" * (44 - len(blob))  # pad to pass the 44-byte gate
    p = _write(tmp_path, "eof.wav", blob)
    with pytest.raises(IOError):
        read_wav_native(p)


def test_garbage_rejected(tmp_path):
    rng = np.random.RandomState(3)
    p = _write(tmp_path, "junk.wav", rng.bytes(256))
    with pytest.raises(IOError):
        read_wav_native(p)


def _sphere(tmp_path, name, fields, pcm):
    head = "NIST_1A\n   1024\n" + "".join(
        f"{k} -i {v}\n" for k, v in fields.items()) + "end_head\n"
    blob = head.encode().ljust(1024, b" ") + pcm
    return _write(tmp_path, name, blob)


def test_sphere_zero_channels_rejected(tmp_path):
    p = _sphere(tmp_path, "ch0.sph",
                {"sample_count": 16, "sample_rate": 16000,
                 "sample_n_bytes": 2, "channel_count": 0},
                b"\x01\x00" * 16)
    with pytest.raises(IOError):
        read_wav_native(p)


def test_sphere_huge_sample_count_clamps(tmp_path):
    p = _sphere(tmp_path, "huge.sph",
                {"sample_count": 2**62, "sample_rate": 16000,
                 "sample_n_bytes": 2, "channel_count": 1},
                b"\x01\x00" * 32)
    x, fs = read_wav_native(p)
    assert fs == 16000 and len(x) == 32


def test_assemble_rejects_empty_audio(tmp_path):
    from guided_vae_nmf_tpu.data import native_loader as nl

    if not nl.has_assemble():
        pytest.skip("native assembler not built")
    p = _write(tmp_path, "empty.wav", _riff(data=b""))
    row = np.zeros(2048, np.int16)
    with pytest.raises(IOError):
        nl.assemble_utt_native(p, row)


def test_assemble_single_sample_no_crash(tmp_path):
    from guided_vae_nmf_tpu.data import native_loader as nl

    if not nl.has_assemble():
        pytest.skip("native assembler not built")
    p = _write(tmp_path, "one.wav", _riff(data=b"\x00\x40"))
    row = np.zeros(4096, np.int16)
    nf, t = nl.assemble_utt_native(p, row)
    assert t == 1 and nf >= 1


def test_python_wav_num_samples_zero_channels(tmp_path):
    # the pure-Python header scanner must not ZeroDivisionError on a
    # crafted channels=0 fmt chunk
    from guided_vae_nmf_tpu.data.wav import wav_num_samples

    p = _write(tmp_path, "pych0.wav",
               _riff(fmt_body=_fmt(channels=0), data=b"\x01\x00" * 8))
    assert wav_num_samples(p) == 8
