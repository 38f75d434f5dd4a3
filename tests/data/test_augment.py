"""Augmentation + rich noise bank (round-3 speech-prior recipe)."""

import numpy as np

from guided_vae_nmf_tpu.data.noise import synthetic_noise_bank
from guided_vae_nmf_tpu.data.synthesis import augment_clean, speed_perturb

FS = 16000


def test_speed_perturb_changes_duration():
    x = np.sin(2 * np.pi * 440 * np.arange(FS) / FS)
    fast = speed_perturb(x, 1.1)
    slow = speed_perturb(x, 0.9)
    assert abs(len(fast) - FS / 1.1) < 3
    assert abs(len(slow) - FS / 0.9) < 3
    assert np.array_equal(speed_perturb(x, 1.0), x)


def test_augment_clean_counts_and_normalization():
    rng = np.random.RandomState(0)
    streams = [rng.randn(FS) * 0.5 for _ in range(3)]
    streams = [s / np.abs(s).max() for s in streams]
    out = augment_clean(streams)
    # originals + 2 speed factors each + 1 gain copy each
    assert len(out) == 3 + 3 * 2 + 3
    for i, s in enumerate(streams):
        assert out[i] is s                     # originals first, untouched
    for y in out[3:9]:
        assert abs(np.abs(y).max() - 1.0) < 1e-6   # peak-normalized
    for y in out[9:]:
        g = np.abs(y).max()
        assert 0.69 < g < 1.41                 # gain-varied copies


def test_rich_noise_bank_superset_and_reproducible():
    rng = np.random.RandomState(1)
    clean = [rng.randn(2 * FS) for _ in range(2)]
    base = synthetic_noise_bank(clean, duration_sec=4)
    rich = synthetic_noise_bank(clean, duration_sec=4, rich=True)
    assert set(base) <= set(rich)
    for k in base:  # rich=True must not perturb the base families
        np.testing.assert_array_equal(base[k], rich[k])
    for k in ("car", "clatter", "tonal", "cafe"):
        assert k in rich
        assert np.abs(rich[k]).max() <= 1.0 + 1e-9
        assert np.all(np.isfinite(rich[k]))
    # car noise is low-frequency dominated (QUT car cabin signature)
    spec = np.abs(np.fft.rfft(rich["car"])) ** 2
    f = np.fft.rfftfreq(len(rich["car"]), 1 / FS)
    low = spec[f < 200].sum()
    assert low / spec.sum() > 0.8


def test_h5_stream_source_and_trainer(tmp_path):
    """Double-buffered H5 streaming (beyond-HBM training sets): chunks
    cover the store exactly once per epoch, two-level shuffling differs
    across epochs, and the streaming trainer learns (loss decreases)."""
    import jax

    from guided_vae_nmf_tpu.data import H5FrameWriter, H5StreamSource
    from guided_vae_nmf_tpu.train import TrainConfig, train_m2

    h5p = str(tmp_path / "s.h5")
    rng = np.random.RandomState(0)
    n = 1536
    X = rng.rand(513, n).astype(np.float32) + 0.01
    Y = (rng.rand(513, n) > 0.5).astype(np.float32)
    w = H5FrameWriter(h5p, "train")
    w.append(X, Y)
    w.finalize()
    w = H5FrameWriter(h5p, "validation")
    w.append(X[:, :256], Y[:, :256])
    w.finalize()

    src = H5StreamSource(h5p, "train", chunk_frames=512, seed=0)
    assert (src.n_chunks, src.n_frames) == (3, n)
    seen = []
    for Xc, Yc in src.epoch_chunks(0):
        assert Xc.shape == (512, 513) and Yc.shape == (512, 513)
        seen.append(Xc)
    # chunks tile the full store (row multisets match)
    got = np.sort(np.concatenate(seen).sum(axis=1))
    want = np.sort(X.T.sum(axis=1))
    np.testing.assert_allclose(got, want, rtol=1e-4)
    # different epoch -> different order
    first_rows = [np.asarray(c[0]) for c, _ in src.epoch_chunks(1)]
    assert not np.array_equal(first_rows[0], seen[0][0])

    cfg = TrainConfig(end_epoch=2, batch_size=128)
    _, hist = train_m2(src, (X[:, :256].T, Y[:, :256].T), cfg=cfg,
                       model_dir=str(tmp_path / "M2"), name="M2")
    assert hist[1]["train"] < hist[0]["train"]
    assert np.isfinite(hist[1]["valid"])
    src.close()


def test_h5_stream_source_covers_ragged_tail(tmp_path):
    """Round-3 review fix: a store whose size is not a chunk multiple must
    still see every frame each epoch — the final chunk starts at
    n_frames - chunk_frames (full-size, overlapping), instead of the old
    behavior of silently dropping the tail."""
    from guided_vae_nmf_tpu.data import H5FrameWriter, H5StreamSource

    h5p = str(tmp_path / "r.h5")
    rng = np.random.RandomState(1)
    n = 1300                                # 2 full 512-chunks + 276 tail
    X = rng.rand(513, n).astype(np.float32)
    Y = (rng.rand(513, n) > 0.5).astype(np.float32)
    w = H5FrameWriter(h5p, "train")
    w.append(X, Y)
    w.finalize()

    src = H5StreamSource(h5p, "train", chunk_frames=512, seed=0)
    assert src.n_chunks == 3                # ceil coverage, not floor
    rows = np.concatenate([c for c, _ in src.epoch_chunks(0)])
    assert rows.shape == (3 * 512, 513)     # fixed chunk shape kept
    # every frame of the store appears at least once
    seen = {tuple(np.round(r, 5)) for r in rows}
    missing = sum(tuple(np.round(r, 5)) not in seen for r in X.T)
    assert missing == 0
    src.close()


def _peak_freq(y, fs=16000):
    Y = np.abs(np.fft.rfft(y * np.hanning(len(y))))
    return np.argmax(Y) * fs / len(y)


def test_pv_stretch_preserves_pitch():
    from guided_vae_nmf_tpu.data.synthesis import pv_stretch

    fs = 16000
    t = np.arange(int(1.5 * fs)) / fs
    x = np.sin(2 * np.pi * 220 * t)
    y = pv_stretch(x, 1.25)
    # duration shrinks by the rate (to frame resolution), pitch holds
    assert abs(len(y) / len(x) - 0.8) < 0.03
    assert abs(_peak_freq(y) - 220) < 4
    assert np.array_equal(pv_stretch(x, 1.0), x)


def test_pitch_shift_moves_pitch_keeps_duration():
    from guided_vae_nmf_tpu.data.synthesis import pitch_shift

    fs = 16000
    t = np.arange(int(1.5 * fs)) / fs
    x = np.sin(2 * np.pi * 220 * t)
    for f in (0.8, 1.3):
        y = pitch_shift(x, f)
        assert len(y) == len(x)
        assert abs(_peak_freq(y) - 220 * f) < 4


def test_voice_variants_distinct_speakers():
    """The campaign's synthetic-speaker lever: every variant is
    length-positive, peak-normalized, and the pitch-shifted ones land on
    distinct fundamentals (audibly distinct pseudo-speakers)."""
    from guided_vae_nmf_tpu.data.synthesis import (
        VOICE_VARIANTS, voice_variants,
    )

    fs = 16000
    t = np.arange(int(1.2 * fs)) / fs
    x = np.sin(2 * np.pi * 220 * t) * (0.8 + 0.2 * np.sin(2 * np.pi * 3 * t))
    vs = voice_variants(x)
    assert len(vs) == len(VOICE_VARIANTS)
    freqs = sorted(round(_peak_freq(v)) for v in vs)
    assert len(set(freqs)) >= 7          # distinct fundamentals
    for v in vs:
        assert np.isclose(np.max(np.abs(v)), 1.0, atol=1e-6)
