"""Data-layer tests: wav round-trip, SNR mixing, H5 schema + self-describing
attrs round-trip (the reference's golden-metadata test style,
tests/dataset/test_csr1_wjs0_dataset_h5.py), synthesis pipelines on the
bundled subset."""

import os

import numpy as np
import pytest
from numpy.testing import assert_allclose

from conftest import REFERENCE_DATA, has_reference_data
from guided_vae_nmf_tpu.data import (
    read_wav,
    write_wav,
    snr_gain,
    mix_at_snr,
    noise_segment,
    preprocess_noise,
    H5FrameWriter,
    H5FrameReader,
    frame_batches,
    create_clean_frames,
    create_noisy_frames,
    create_test_mixtures,
    read_dataset,
    speech_list,
)
from guided_vae_nmf_tpu.dsp import stft, clean_speech_IBM

FS = 16000


def test_wav_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    x = np.clip(0.5 * rng.randn(8000), -1, 1)
    path = str(tmp_path / "t.wav")
    write_wav(path, x, FS)
    y, fs = read_wav(path)
    assert fs == FS
    assert_allclose(y, x, atol=1.0 / 32768)


def test_snr_mixing_realizes_target():
    rng = np.random.RandomState(1)
    s = rng.randn(16000)
    n = rng.randn(16000)
    for snr in (-5.0, 0.0, 5.0):
        mix, scaled = mix_at_snr(s, n, snr)
        realized = 10 * np.log10(np.sum(s**2) / np.sum(scaled**2))
        assert_allclose(realized, snr, atol=1e-6)
        assert_allclose(mix, s + scaled)


def test_preprocess_noise_resamples_and_trims():
    rng = np.random.RandomState(2)
    stereo = rng.randn(48000 * 3, 2)
    mono = preprocess_noise(stereo, 48000)
    assert mono.ndim == 1
    assert len(mono) == FS * 3
    # car trim keeps [90 s, 2580 s)
    long = rng.randn(FS * 200)
    car = preprocess_noise(long, FS, noise_type="car")
    assert len(car) == FS * 200 - 90 * FS


def test_noise_segment_length_and_range():
    rng = np.random.RandomState(3)
    audios = {"cafe": rng.randn(FS * 10)}
    speech = np.zeros(FS * 2)
    np.random.seed(0)
    seg = noise_segment(audios, "cafe", speech)
    assert len(seg) == len(speech)
    with pytest.raises(ValueError):
        noise_segment({"cafe": np.zeros(10)}, "cafe", speech)


def test_h5_writer_reader_roundtrip(tmp_path):
    path = str(tmp_path / "frames.h5")
    rng = np.random.RandomState(4)
    X1 = rng.rand(513, 40).astype(np.float32)
    Y1 = (rng.rand(513, 40) > 0.5).astype(np.float32)
    X2 = rng.rand(513, 25).astype(np.float32)
    Y2 = (rng.rand(513, 25) > 0.5).astype(np.float32)
    with H5FrameWriter(path, "train") as w:
        w.append(X1, Y1)
        w.append(X2, Y2)
    r = H5FrameReader(path, "train")
    X, Y = r.load_all()
    assert X.shape == (65, 513)
    assert_allclose(X.T, np.concatenate([X1, X2], axis=1))
    assert_allclose(Y.T, np.concatenate([Y1, Y2], axis=1))
    # attrs describe the STFT (self-describing artifact contract)
    assert r.attrs["fs"] == 16000 and r.attrs["wlen_sec"] == 64e-3
    # train mean/std side-datasets
    full = np.concatenate([X1, X2], axis=1)
    assert_allclose(r.mean[:, 0], full.mean(axis=1), rtol=1e-4)
    assert_allclose(r.std[:, 0], full.std(axis=1), rtol=1e-3, atol=1e-6)
    r.close()


def test_frame_batches_shuffled_cover_all():
    X = np.arange(100)[:, None].repeat(3, axis=1).astype(np.float32)
    Y = np.arange(100)[:, None].astype(np.float32)
    seen = []
    for xb, yb in frame_batches(X, Y, 8, key=np.random.RandomState(0)):
        assert xb.shape == (8, 3)
        seen.extend(yb[:, 0].tolist())
    assert len(seen) == 96  # drop_remainder
    assert len(set(seen)) == 96


@pytest.mark.skipif(not has_reference_data(), reason="reference subset absent")
def test_create_clean_frames_matches_golden(tmp_path):
    """Synthesize a clean frame store from the subset and verify the stored
    X equals the golden frames pickle (same pipeline, H5-backed)."""
    out = str(tmp_path / "clean.h5")
    create_clean_frames(f"{REFERENCE_DATA}/raw/", out,
                        dataset_types=("train",), labels="labels",
                        quantile_fraction=0.98)
    r = H5FrameReader(out, "train")
    X, Y = r.load_all()
    golden = read_dataset(f"{REFERENCE_DATA}/pickle/", "train", "frames")
    assert_allclose(X.T, golden, rtol=1e-4, atol=1e-6 * golden.max())
    golden_y = read_dataset(f"{REFERENCE_DATA}/pickle/", "train", "labels")
    assert_allclose(Y.T, golden_y)
    r.close()


@pytest.mark.skipif(not has_reference_data(), reason="reference subset absent")
def test_h5_attrs_self_describe_recompute(tmp_path):
    """The reference's golden-metadata round trip (reference
    tests/dataset/test_csr1_wjs0_dataset_h5.py): recompute the STFT of an
    utterance using ONLY the parameters stored in the H5 attrs and verify
    exact equality with the stored frame columns."""
    out = str(tmp_path / "clean.h5")
    create_clean_frames(f"{REFERENCE_DATA}/raw/", out,
                        dataset_types=("train",), labels="labels",
                        quantile_fraction=0.98)
    r = H5FrameReader(out, "train")
    attrs = r.attrs
    raw_dir = f"{REFERENCE_DATA}/raw/"
    path = speech_list(raw_dir, "train")[0]
    x, fs = read_wav(raw_dir + path)
    assert fs == attrs["fs"]
    x = x[int(0.1 * attrs["fs"]):]
    x = x / np.max(np.abs(x))
    S = stft(x, fs=attrs["fs"], wlen_sec=attrs["wlen_sec"],
             win=attrs["win"], hop_percent=attrs["hop_percent"],
             dtype=attrs["dtype"])
    power = (np.abs(S) ** 2).astype(np.float32)
    stored = r.X[:, : power.shape[1]]
    assert_allclose(stored, power, rtol=1e-6)
    ibm = clean_speech_IBM(S, attrs["quantile_fraction"],
                           attrs["quantile_weight"])
    np.testing.assert_array_equal(r.Y[:, : ibm.shape[1]], ibm)
    r.close()


@pytest.mark.skipif(not has_reference_data(), reason="reference subset absent")
def test_create_noisy_and_test_mixtures(tmp_path):
    rng = np.random.RandomState(5)
    noise = {"cafe": 0.1 * rng.randn(FS * 60),
             "home": 0.1 * rng.randn(FS * 60)}
    out = str(tmp_path / "noisy.h5")
    snr = create_noisy_frames(
        f"{REFERENCE_DATA}/raw/", out,
        {"train": noise}, dataset_types=("train",),
        labels="noisy_labels", quantile_fraction=0.999,
    )
    assert set(snr["train"]) <= {-5, -2.5, 0, 2.5, 5.0}
    r = H5FrameReader(out, "train")
    assert r.mean is not None and r.std is not None
    assert r.X.shape[0] == 513
    r.close()

    wav_dir = str(tmp_path / "proc") + "/"
    all_snr = create_test_mixtures(
        f"{REFERENCE_DATA}/raw/", wav_dir, noise,
        dataset_type="test", noise_types=("cafe", "home"),
    )
    files = speech_list(f"{REFERENCE_DATA}/raw/", "test")
    assert len(all_snr) == len(files)
    base = os.path.splitext(os.path.join(wav_dir, files[0]))[0]
    s, _ = read_wav(base + "_s.wav")
    n, _ = read_wav(base + "_n.wav")
    x, _ = read_wav(base + "_x.wav")
    assert_allclose(x, s + n, atol=3.0 / 32768)  # joint normalization holds
    assert max(np.abs(x).max(), np.abs(s).max(), np.abs(n).max()) <= 1.0
    # pickled snr list round-trips
    back = read_dataset(wav_dir, "test", "snr_db")
    assert back == all_snr


def test_wav_num_samples_and_int16(tmp_path):
    """Header-only length probe + raw-PCM read agree with the float reader
    on both RIFF wavs and (when bundled) NIST SPHERE files."""
    from guided_vae_nmf_tpu.data import read_wav_int16, wav_num_samples

    rng = np.random.RandomState(0)
    x = (rng.rand(12345) * 1.6 - 0.8)
    p = str(tmp_path / "t.wav")
    write_wav(p, x, FS)
    assert wav_num_samples(p) == 12345
    raw, fs = read_wav_int16(p)
    assert fs == FS and raw.dtype == np.int16 and len(raw) == 12345
    flt, _ = read_wav(p)
    assert_allclose(raw.astype(np.float64) / 32768.0, flt, atol=0)

    # write_wav int16 passthrough is bit-exact
    p2 = str(tmp_path / "t2.wav")
    write_wav(p2, raw, FS)
    raw2, _ = read_wav_int16(p2)
    np.testing.assert_array_equal(raw, raw2)

    if has_reference_data():
        import glob

        sphere = [
            f for f in glob.glob(
                f"{REFERENCE_DATA}/raw/CSR-1-WSJ-0/**/*.wav",
                recursive=True)
            if open(f, "rb").read(8).startswith(b"NIST_1A")
        ]
        if sphere:
            f = sphere[0]
            flt, _ = read_wav(f)
            assert wav_num_samples(f) == len(flt)
            raw, _ = read_wav_int16(f)
            assert_allclose(raw.astype(np.float64) / 32768.0, flt, atol=0)
