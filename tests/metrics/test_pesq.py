"""PESQ (first-party ITU-T P.862.2-wb) tests.

The environment has no `pesq` wheel and no conformance vectors, so the
validation strategy is: exact endpoints of the normative output mapping,
the algorithm's documented invariances (level, small delay), monotone
degradation under additive noise, range bounds, and internal consistency
of the generated Bark-band layout. scripts/validate_pesq.py additionally
computes deltas against the ITU C extension whenever it is importable.
"""

import numpy as np
import pytest

from guided_vae_nmf_tpu.metrics.pesq import (
    pesq, mos_lqo_wb, mos_lqo_nb, _tables,
)

FS = 16000


def _speech_like(seconds=3.0, seed=0):
    """Harmonic carrier with syllabic amplitude gating and end silences —
    enough structure for the VAD/alignment stages to engage."""
    n = int(seconds * FS)
    t = np.arange(n) / FS
    f0 = 120 + 30 * np.sin(2 * np.pi * 0.5 * t)
    x = np.zeros(n)
    phase = np.cumsum(f0) / FS
    for k in range(1, 12):
        x += np.sin(2 * np.pi * phase * k) / k
    x *= np.clip(np.sin(2 * np.pi * 1.7 * t), 0, None)
    x[: int(0.3 * FS)] = 0.0
    x[-int(0.3 * FS):] = 0.0
    return 0.1 * x


def test_mapping_endpoints():
    # P.862.2: raw 4.5 -> 4.6439, raw -0.5 -> 1.0427
    assert mos_lqo_wb(4.5) == pytest.approx(4.64389, abs=1e-4)
    assert mos_lqo_wb(-0.5) == pytest.approx(1.04268, abs=1e-3)
    # P.862.1 narrowband endpoints: 4.549 / 1.017
    assert mos_lqo_nb(4.5) == pytest.approx(4.5490, abs=1e-3)
    assert mos_lqo_nb(-0.5) == pytest.approx(1.0166, abs=1e-3)


def test_identical_signals_hit_max():
    x = _speech_like()
    assert pesq(FS, x, x) == pytest.approx(4.64389, abs=1e-3)


def test_level_invariance():
    x = _speech_like()
    base = pesq(FS, x, x)
    assert pesq(FS, x, 10.0 * x) == pytest.approx(base, abs=1e-3)
    assert pesq(FS, 0.1 * x, x) == pytest.approx(base, abs=1e-3)


def test_monotone_under_noise():
    x = _speech_like()
    rng = np.random.RandomState(1)
    scores = []
    for snr in [40, 20, 10, 0]:
        noise = rng.randn(len(x)) * np.sqrt(
            np.mean(x ** 2) * 10 ** (-snr / 10.0))
        scores.append(pesq(FS, x, x + noise))
    assert scores[0] > 3.0          # mild noise stays in the upper range
    assert scores[-1] < 1.6         # heavy noise lands near the floor
    assert all(a >= b - 0.05 for a, b in zip(scores, scores[1:]))


def test_small_delay_recovered_by_alignment():
    x = _speech_like()
    base = pesq(FS, x, x)
    for shift in (-500, 320):
        assert pesq(FS, x, np.roll(x, shift)) >= base - 0.4


def test_range_and_errors():
    x = _speech_like()
    rng = np.random.RandomState(2)
    worst = pesq(FS, x, rng.randn(len(x)) * 0.1)
    assert 1.0 <= worst <= 4.644
    with pytest.raises(ValueError):
        pesq(FS, x, x, mode="swb")
    with pytest.raises(ValueError):
        pesq(FS, x[: FS // 8], x[: FS // 8])
    with pytest.raises(ValueError):
        pesq(44100, x, x)


def test_narrowband_mode():
    """P.862 nb: IRS receive weighting + the P.862.1 mapping; identical
    signals hit that mapping's endpoint (4.549) and noise degrades
    monotonically at both rates."""
    for fs in (8000, 16000):
        n = 3 * fs
        t = np.arange(n) / fs
        x = np.sin(2 * np.pi * np.cumsum(
            120 + 30 * np.sin(2 * np.pi * 0.5 * t)) / fs)
        x *= 0.1 * np.clip(np.sin(2 * np.pi * 1.7 * t), 0, None)
        assert pesq(fs, x, x, mode="nb") == pytest.approx(4.549, abs=2e-3)
        rng = np.random.RandomState(3)
        noisy = x + rng.randn(n) * np.sqrt(np.mean(x ** 2) * 0.1)
        v = pesq(fs, x, noisy, mode="nb")
        assert 1.0 <= v < 4.0


def test_band_tables_consistent():
    for fs in (8000, 16000):
        t = _tables(fs)
        assert t.Nb == (49 if fs == 16000 else 42)
        assert np.all(t.width_bark > 0)
        # bands tile [0, bark(fs/2)] contiguously
        edges = np.concatenate([[0.0], np.cumsum(t.width_bark)])
        centres = 0.5 * (edges[:-1] + edges[1:])
        np.testing.assert_allclose(centres, t.centre_bark, atol=1e-9)
        # every usable FFT bin lands in exactly one band
        assert t.nr_bins.sum() == t.n_bins - 1
        assert len(t.abs_thresh_power) == t.Nb
        assert np.all(t.abs_thresh_power > 0)


def test_metrics_package_exports_pesq():
    from guided_vae_nmf_tpu.metrics import pesq as pkg_pesq, HAS_PESQ

    assert HAS_PESQ
    x = _speech_like(1.0)
    assert callable(pkg_pesq)
    assert pkg_pesq(FS, x, x) == pytest.approx(4.64389, abs=1e-3)
