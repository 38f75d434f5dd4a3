"""PESQ (first-party ITU-T P.862.2-wb) tests.

The environment has no `pesq` wheel and no conformance vectors, so the
validation strategy is three-layered:

1. structural conformance — the band layout is pinned to the standard's
   published `centre_of_band_bark` constants and the identities those
   tables satisfy (tiling, low-band centre_hz == 100*centre_bark,
   first/last band widths), plus the exact output-mapping endpoints;
2. behavioural battery — recorded expected scores over degradation
   families (additive noise at swept SNRs, level shifts, constant
   delays, low/band/high-pass filtering, clipping) with monotonicity
   asserts where the family is ordered. The recorded values are drift
   pins from this implementation (no conformance oracle exists here),
   but the monotone/invariance structure is normative;
3. external delta — scripts/validate_pesq.py computes per-utterance
   deltas against the ITU C extension whenever that wheel is importable.
"""

import numpy as np
import pytest

from guided_vae_nmf_tpu.metrics.pesq import (
    pesq, mos_lqo_wb, mos_lqo_nb, _tables, CENTRE_OF_BAND_BARK,
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
        # bands tile [0, top edge] contiguously
        edges = np.concatenate([[0.0], np.cumsum(t.width_bark)])
        centres = 0.5 * (edges[:-1] + edges[1:])
        np.testing.assert_allclose(centres, t.centre_bark, atol=1e-9)
        # every usable FFT bin lands in exactly one band
        assert t.nr_bins.sum() == t.n_bins - 1
        assert len(t.abs_thresh_power) == t.Nb
        assert np.all(t.abs_thresh_power > 0)


def test_band_tables_match_published_constants():
    """The layout IS the standard's published table: band centres equal
    `centre_of_band_bark_16k` (the 8 kHz mode its 42-band prefix), the
    first band is the published half-width 0.157344 starting at 0 Bark,
    and the low-band centres satisfy the published tables' identity
    centre_hz == 100 * centre_bark (the scale is exactly f/100 there)."""
    t16 = _tables(16000)
    np.testing.assert_allclose(t16.centre_bark, CENTRE_OF_BAND_BARK,
                               atol=1e-12)
    t8 = _tables(8000)
    np.testing.assert_allclose(t8.centre_bark, CENTRE_OF_BAND_BARK[:42],
                               atol=1e-12)
    assert t16.width_bark[0] == pytest.approx(0.157344, abs=1e-9)
    assert t16.width_bark[-1] == pytest.approx(0.585244, abs=1e-6)
    top_edge = np.sum(t16.width_bark)
    assert top_edge == pytest.approx(21.335656, abs=1e-5)
    # centre_hz = 100 * centre_bark for every band below 500 Hz
    low = t16.centre_bark[t16.centre_bark < 5.0]
    np.testing.assert_allclose(t16.warp.inverse(low), 100.0 * low,
                               rtol=1e-12)
    # warp endpoints: 0 -> 0, Nyquist -> top edge; strictly monotone
    assert float(t16.warp(0.0)) == 0.0
    assert float(t16.warp(8000.0)) == pytest.approx(top_edge, abs=1e-9)
    f = np.linspace(1.0, 8000.0, 4000)
    assert np.all(np.diff(t16.warp(f)) > 0)
    # 8 kHz thresholds are the exact 42-entry prefix of the 16 kHz curve
    np.testing.assert_allclose(t8.abs_thresh_power,
                               t16.abs_thresh_power[:42], rtol=1e-12)


def test_bin_assignment_is_the_published_integer_table():
    """FFT-bin -> band assignment comes from the standard's
    `nr_of_hz_bands_per_bark_band_16k` integer table, not a warp: the
    counts consume exactly the Nf/2 rfft bins the framing produces (DC
    carries no power), the 8 kHz mode is the table's 42-band prefix
    clipped at its 128-bin spectrum, and the counts agree with the
    normative z = f/100 scale over the region it covers."""
    from guided_vae_nmf_tpu.metrics.pesq import (
        NR_OF_HZ_BANDS_PER_BARK_BAND_16K as T,
    )
    assert T.sum() == 256 and len(T) == 49
    t16 = _tables(16000)
    np.testing.assert_array_equal(
        t16.band_of_bin, np.repeat(np.arange(49), T)[1:])
    t8 = _tables(8000)
    c8 = T[:42].copy()
    c8[-1] -= c8.sum() - 128
    np.testing.assert_array_equal(
        t8.band_of_bin, np.repeat(np.arange(42), c8)[1:])
    # below the 500 Hz break the scale is exactly f/100: each bin's band
    # by cumulative count equals its band by that scale
    edges = np.concatenate([[0.0], np.cumsum(t16.width_bark)])
    by_count = np.repeat(np.arange(49), T)
    for k in range(1, 16):                      # 31.25*15 Hz < 500
        z = 31.25 * k / 100.0
        assert by_count[k] == int(
            np.searchsorted(edges, z, side="right") - 1)


# ---------------------------------------------------------------------------
# degradation-family battery (recorded drift pins + normative structure)
# ---------------------------------------------------------------------------

def _speech_broadband(seconds=3.0):
    """Harmonics to ~6 kHz plus gated noise bursts — broadband material so
    that filtering degradations actually remove energy."""
    n = int(seconds * FS)
    t = np.arange(n) / FS
    f0 = 120 + 30 * np.sin(2 * np.pi * 0.5 * t)
    x = np.zeros(n)
    phase = np.cumsum(f0) / FS
    for k in range(1, 45):
        x += np.sin(2 * np.pi * phase * k) / k
    rng = np.random.RandomState(5)
    x += 0.15 * rng.randn(n) * np.clip(
        np.sin(2 * np.pi * 1.1 * t + 1.3), 0, None)
    x *= np.clip(np.sin(2 * np.pi * 1.7 * t), 0, None)
    x[: int(0.3 * FS)] = 0.0
    x[-int(0.3 * FS):] = 0.0
    return 0.05 * x


def _brickwall(x, lo, hi):
    sp = np.fft.rfft(x)
    f = np.fft.rfftfreq(len(x), 1.0 / FS)
    return np.fft.irfft(np.where((f >= lo) & (f <= hi), sp, 0), len(x))


def test_family_noise_sweep_fine():
    """Fine-resolution additive-noise sweep: strictly decreasing until the
    score floor, with recorded expected scores."""
    x = _speech_like()
    rng = np.random.RandomState(11)
    noise = rng.randn(len(x))
    expected = {45: 4.4100, 40: 3.8331, 35: 3.1016, 30: 2.7698,
                25: 2.4509, 20: 2.1241, 15: 1.8036, 10: 1.5398,
                5: 1.3945, 0: 1.3373}
    scores = []
    for snr, exp in expected.items():
        nn = noise * np.sqrt(np.mean(x ** 2) * 10 ** (-snr / 10.0))
        s = pesq(FS, x, x + nn)
        assert s == pytest.approx(exp, abs=2e-3), f"snr={snr}"
        scores.append(s)
    assert all(a > b for a, b in zip(scores, scores[1:]))


def test_family_level_shifts_exactly_invariant():
    x = _speech_like()
    for g in (0.25, 0.5, 2.0, 4.0):
        assert pesq(FS, x, g * x) == pytest.approx(4.6439, abs=1e-3)


def test_family_constant_delays():
    """Recorded scores for constant delays (drift-pins for the round-4
    utterance-locate alignment); a delay inside the utterance's silence
    margin is fully recovered (perfect score), and ± the same shift
    scores identically (alignment symmetry)."""
    x = _speech_like()
    expected = {-1000: 4.2960, -160: 4.2596, 160: 4.2596, 800: 4.2596}
    for shift, exp in expected.items():
        assert pesq(FS, x, np.roll(x, shift)) == pytest.approx(
            exp, abs=2e-3), f"shift={shift}"
    # 0.1 s shift still entirely within the 0.3 s end silences: alignment
    # recovers it exactly
    assert pesq(FS, x, np.roll(x, 1600)) == pytest.approx(4.6439, abs=1e-3)


def test_family_time_varying_delay():
    """Round-4 capability (P.862 utterance splitting / per-utterance
    crude subalign): a delay that CHANGES mid-file is tracked per
    segment instead of averaged. Recorded pins; a uniform shift of the
    same magnitude stays near-perfect for contrast."""
    x = _speech_like()
    y = x.copy()
    h = len(x) // 2
    y[:h] = np.roll(x[:h], 120)
    y[h:] = np.roll(x[h:], -120)
    v = pesq(FS, x, y)
    assert v == pytest.approx(4.3346, abs=5e-3)
    assert v > 4.0          # both segments individually re-aligned
    assert pesq(FS, x, np.roll(x, 120)) == pytest.approx(4.6422,
                                                         abs=5e-3)


def test_family_split_points_off_grid():
    """Round-4 exhaustive split scan: the split search tests EVERY vote
    window boundary, so delay changes at arbitrary (non-round-fraction)
    positions and >2-segment delay schedules are still tracked per
    segment. Recorded pins; every case stays well above the unaligned
    floor (a 120-sample constant mismatch unrepaired would land ~2.4,
    cf. the clipping family)."""
    x = _speech_like()
    for frac, exp in ((0.293, 4.0679), (0.41, 3.5718)):
        y = x.copy()
        h = int(len(x) * frac)
        y[:h] = np.roll(x[:h], 120)
        y[h:] = np.roll(x[h:], -120)
        assert pesq(FS, x, y) == pytest.approx(exp, abs=5e-3), frac
    y = x.copy()
    a, b = len(x) // 3, 2 * len(x) // 3
    y[:a] = np.roll(x[:a], 100)
    y[a:b] = np.roll(x[a:b], -140)
    y[b:] = np.roll(x[b:], 60)
    assert pesq(FS, x, y) == pytest.approx(3.9536, abs=5e-3)


def test_pow_dens_correction_rounding_is_second_order():
    """The one remaining wheel-provable deviation (metrics/pesq.py
    provenance note) is the ITU C code's precomputed power-density
    correction table vs our band-coverage-derived factors — a rounding
    difference of that float table (~1e-6 relative). Bound its largest
    possible effect empirically: perturb EVERY band's factor by ±0.5%
    relative (thousands of times any table rounding), uniformly and with
    alternating signs, and re-score degradations with real disturbance
    mass; MOS moves by < 0.004 in every case, so the deviation is
    measured — not merely asserted — to be far below the 5e-3 family-pin
    resolution."""
    from guided_vae_nmf_tpu.metrics.pesq import _tables

    x = _speech_like()
    rng = np.random.RandomState(11)
    noise = rng.randn(len(x))
    nn = noise * np.sqrt(np.mean(x ** 2) * 10 ** (-2.0))
    cases = [x + nn, np.clip(x, -0.02, 0.02)]
    t = _tables(FS)
    base = t.pow_dens_correction.copy()
    try:
        for fac in (1.005 * np.ones(base.size),
                    1 + 0.005 * (-1.0) ** np.arange(base.size)):
            for y in cases:
                t.pow_dens_correction = base
                s0 = pesq(FS, x, y)
                t.pow_dens_correction = base * fac
                assert abs(pesq(FS, x, y) - s0) < 4e-3
    finally:
        t.pow_dens_correction = base


def test_family_bandwidth_reduction():
    """Low-pass family: score decreases monotonically as the cutoff drops
    (with recorded pins); telephone band and high-pass also penalised."""
    x = _speech_broadband()
    assert pesq(FS, x, x) == pytest.approx(4.6439, abs=1e-3)
    expected = {6000: 4.5443, 4000: 4.4808, 3000: 4.3642,
                2000: 4.2816, 1000: 4.0434}
    prev = 4.6439
    for fc, exp in expected.items():
        s = pesq(FS, x, _brickwall(x, 0, fc))
        assert s == pytest.approx(exp, abs=2e-3), f"fc={fc}"
        assert s < prev + 1e-6
        prev = s
    assert pesq(FS, x, _brickwall(x, 300, 3400)) == pytest.approx(
        4.1382, abs=2e-3)
    assert pesq(FS, x, _brickwall(x, 500, 8000)) == pytest.approx(
        4.2741, abs=2e-3)


def test_family_clipping():
    """Amplitude clipping: harsher clipping scores lower (recorded pins)."""
    x = _speech_like()
    expected = {0.5: 2.5699, 0.2: 1.9807, 0.1: 1.8211}
    prev = np.inf
    for frac, exp in expected.items():
        thr = frac * np.max(np.abs(x))
        s = pesq(FS, x, np.clip(x, -thr, thr))
        assert s == pytest.approx(exp, abs=2e-3), f"clip={frac}"
        assert s < prev
        prev = s


def test_nb_wb_consistency_on_same_material():
    """Both modes rank the same noise levels identically and stay within
    ~0.15 MOS of each other on broadband noise over this material."""
    x = _speech_like()
    rng = np.random.RandomState(11)
    noise = rng.randn(len(x))
    expected = {40: (3.8331, 3.8351), 20: (2.1241, 2.0580),
                10: (1.5398, 1.5827), 0: (1.3373, 1.3569)}
    for snr, (wb_exp, nb_exp) in expected.items():
        nn = noise * np.sqrt(np.mean(x ** 2) * 10 ** (-snr / 10.0))
        wb = pesq(FS, x, x + nn)
        nb = pesq(FS, x, x + nn, mode="nb")
        assert wb == pytest.approx(wb_exp, abs=2e-3)
        assert nb == pytest.approx(nb_exp, abs=2e-3)
        assert abs(wb - nb) < 0.15


def test_metrics_package_exports_pesq():
    from guided_vae_nmf_tpu.metrics import pesq as pkg_pesq, HAS_PESQ

    assert HAS_PESQ
    x = _speech_like(1.0)
    assert callable(pkg_pesq)
    assert pkg_pesq(FS, x, x) == pytest.approx(4.64389, abs=1e-3)


def test_validate_pesq_runs_when_wheel_present():
    """Auto-run the ITU-wheel conformance harness wherever the wheel
    exists; environments without it (like this one) skip. A wheel-bearing
    CI thus enforces mean |MOS delta| <= 0.1 on the subset mixtures."""
    pytest.importorskip("pesq")
    import subprocess
    import sys as _sys
    import os as _os
    repo = _os.path.dirname(_os.path.dirname(_os.path.dirname(
        _os.path.abspath(__file__))))
    r = subprocess.run(
        [_sys.executable, _os.path.join(repo, "scripts/validate_pesq.py")],
        capture_output=True, text=True, timeout=1800)
    assert r.returncode == 0, r.stdout + r.stderr
