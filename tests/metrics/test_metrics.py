"""Metric tests: SI-SDR identities, STOI/ESTOI sanity behavior, stats
aggregation shape/CI math."""

import numpy as np
import jax.numpy as jnp
from numpy.testing import assert_allclose

from guided_vae_nmf_tpu.metrics import (
    energy_ratios,
    energy_ratios_jax,
    stoi,
    estoi,
    third_octave_band_matrix,
    mean_confidence_interval,
    compute_stats,
)

FS = 16000


def _speechlike(seed=0, seconds=2.0):
    rng = np.random.RandomState(seed)
    t = np.arange(int(FS * seconds)) / FS
    env = np.clip(np.sin(2 * np.pi * 2.0 * t), 0, None)  # syllabic rate
    carrier = np.sin(2 * np.pi * 220 * t) + 0.5 * np.sin(2 * np.pi * 440 * t)
    return env * carrier + 0.01 * rng.randn(len(t))


def test_si_sdr_clean_estimate_is_infinite_ish():
    s = _speechlike(0)
    n = _speechlike(1)
    sdr, sir, sar = energy_ratios(s, s, n)
    assert sdr > 100  # estimate == clean: error energy ~0


def test_si_sdr_known_mixture():
    s = _speechlike(0)
    n = np.random.RandomState(2).randn(len(s)) * np.std(s)
    s_hat = s + 0.1 * n  # only noise error, no artifacts
    sdr, sir, sar = energy_ratios(s_hat, s, n)
    assert_allclose(sdr, 10 * np.log10(np.sum(s**2) / np.sum((0.1 * n) ** 2)),
                    atol=0.3)
    assert sar > sdr  # artifacts negligible compared to noise
    j = energy_ratios_jax(jnp.asarray(s_hat), jnp.asarray(s), jnp.asarray(n))
    assert_allclose(np.asarray(j), np.asarray([sdr, sir, sar]), atol=1e-3)


def test_obm_covers_bands():
    obm, cf = third_octave_band_matrix()
    assert obm.shape == (15, 257)
    assert np.all(obm.sum(axis=1) >= 1)
    assert_allclose(cf[0], 150.0)
    assert cf[-1] < 5000


def test_stoi_identity_is_one():
    s = _speechlike(0)
    assert stoi(s, s, FS) > 0.999
    assert estoi(s, s, FS) > 0.999


def test_stoi_decreases_with_noise():
    s = _speechlike(0)
    rng = np.random.RandomState(1)
    clean = estoi(s, s, FS)
    light = estoi(s, s + 0.05 * rng.randn(len(s)), FS)
    heavy = estoi(s, s + 1.0 * rng.randn(len(s)), FS)
    assert clean > light > heavy
    assert heavy < 0.6
    st_light = stoi(s, s + 0.05 * rng.randn(len(s)), FS)
    st_heavy = stoi(s, s + 1.0 * rng.randn(len(s)), FS)
    assert st_light > st_heavy


def test_mean_confidence_interval():
    m, h = mean_confidence_interval([1.0, 2.0, 3.0, 4.0, 5.0])
    assert_allclose(m, 3.0)
    # t(0.975, df=4) * sem = 2.776 * 0.7071
    assert_allclose(h, 1.963, atol=1e-3)


def test_compute_stats_structure(capsys):
    rows = [(10.0, 0.9), (12.0, 0.95), (8.0, 0.85), (11.0, 0.92)]
    snrs = [-5, 0, -5, 0]
    out = compute_stats(["si_sdr", "stoi"], rows, snrs)
    assert set(out["overall"].keys()) == {"si_sdr", "stoi"}
    assert set(out["per_snr"].keys()) == {-5.0, 0.0}
    assert out["per_snr"][-5.0]["si_sdr"]["avg"] == 9.0
