"""Target/label tests: reference-style invariants (reference
tests/processing/test_target.py) plus golden bit-parity against the bundled
label pickles and numpy<->jnp agreement."""

import numpy as np
import pytest
from numpy.testing import assert_array_equal

from conftest import REFERENCE_DATA, has_reference_data
from guided_vae_nmf_tpu.data import read_wav, speech_list, read_dataset
from guided_vae_nmf_tpu.dsp import (
    stft,
    clean_speech_IBM,
    clean_speech_VAD,
    noise_robust_clean_speech_VAD,
    noise_robust_clean_speech_IBM,
    ideal_wiener_mask,
    noise_aware_IRM,
    noise_aware_IBM,
)
from guided_vae_nmf_tpu.dsp.targets import (
    clean_speech_IBM_jax,
    clean_speech_VAD_jax,
)

FS = 16000


def _spectro(seed=0, n=32000):
    rng = np.random.RandomState(seed)
    t = np.arange(n) / FS
    x = np.sin(2 * np.pi * 440 * t) * (t > 0.5) + 0.01 * rng.randn(n)
    return stft(x, fs=FS, wlen_sec=64e-3, hop_percent=0.25)


def test_ibm_values_and_dtype():
    ibm = clean_speech_IBM(_spectro())
    assert ibm.dtype == np.float32
    assert set(np.unique(ibm)) <= {0.0, 1.0}


def test_vad_shape_and_values():
    S = _spectro()
    vad = clean_speech_VAD(S)
    assert vad.shape == (1, S.shape[1])
    assert set(np.unique(vad)) <= {0.0, 1.0}


def test_noise_robust_vad_fills_interior():
    S = _spectro()
    vad = noise_robust_clean_speech_VAD(S)[0]
    on = np.nonzero(vad)[0]
    # every frame between first and last active frame is active
    assert np.all(vad[on[0]: on[-1]] == 1.0)


def test_noise_robust_ibm_subset_of_vad():
    S = _spectro()
    ibm = noise_robust_clean_speech_IBM(S)
    vad = noise_robust_clean_speech_VAD(S)
    assert np.all(ibm <= vad)  # IBM is gated by the VAD


def test_ideal_wiener_mask_range():
    s, n = _spectro(0), _spectro(1)
    w = ideal_wiener_mask(s, n)
    assert np.all((w >= 0) & (w <= 1))
    # dominated bins approach 1
    big = ideal_wiener_mask(10 * s, 0 * n)
    assert big.mean() > 0.99


def test_jax_variants_match_numpy():
    S = _spectro()
    power = np.abs(S) ** 2
    assert_array_equal(np.asarray(clean_speech_IBM_jax(power)),
                       clean_speech_IBM(S))
    assert_array_equal(np.asarray(clean_speech_VAD_jax(power)),
                       clean_speech_VAD(S))


def test_noise_aware_IRM_shapes():
    F, T, D, K = 51, 31, 6, 2
    rng = np.random.RandomState(0)
    X_all = rng.rand(F, T, D, K)
    X, N = X_all[..., 0], X_all[..., 1]
    assert noise_aware_IRM(X_all).shape == (F, T, K)
    assert noise_aware_IRM(X, N).shape == (F, T, 2)
    sums = noise_aware_IRM(X_all).sum(axis=-1)
    np.testing.assert_allclose(sums, 1.0)


def test_noise_aware_IBM_shapes():
    rng = np.random.RandomState(0)
    X = rng.randn(40, 513) + 1j * rng.randn(40, 513)
    N = 0.1 * (rng.randn(40, 513) + 1j * rng.randn(40, 513))
    sm, nm = noise_aware_IBM(X, N)
    assert sm.shape == X.shape and nm.shape == X.shape
    assert sm.dtype == bool and nm.dtype == bool


@pytest.mark.skipif(not has_reference_data(), reason="reference subset absent")
@pytest.mark.parametrize("dataset_type", ["train", "validation", "test"])
def test_golden_parity_labels(dataset_type):
    """Bit-exact IBM (and where bundled, VAD) label parity with the
    reference-generated golden pickles (quantile 0.98, weight 0.999;
    reference tests/dataset/test_csr1_wjs0_dataset.py:100-162).

    The bundled train/validation label pickles were generated with the
    leading 0.1 s *cut*; the test-split ones with the 0.1 s *replaced* by the
    following 0.1 s (the commented-out variant at reference
    test_csr1_wjs0_dataset.py:121) — verified empirically against the shapes.
    """
    raw_dir = f"{REFERENCE_DATA}/raw/"
    ibms, vads = [], []
    for path in speech_list(raw_dir, dataset_type):
        x, fs = read_wav(raw_dir + path)
        if dataset_type == "test":
            x = x.copy()
            x[: int(0.1 * FS)] = x[int(0.1 * FS): int(0.2 * FS)]
        else:
            x = x[int(0.1 * FS):]
        x = x / np.max(np.abs(x))
        S = stft(x, fs=FS, wlen_sec=64e-3, hop_percent=0.25)
        ibms.append(clean_speech_IBM(S, 0.98, 0.999))
        vads.append(clean_speech_VAD(S, 0.98, 0.999))
    assert_array_equal(
        np.concatenate(ibms, axis=1),
        read_dataset(f"{REFERENCE_DATA}/pickle/", dataset_type, "labels"),
    )
    if dataset_type != "test":  # no si_et_05_vad_labels.p bundled
        assert_array_equal(
            np.concatenate(vads, axis=1),
            read_dataset(f"{REFERENCE_DATA}/pickle/", dataset_type,
                         "vad_labels"),
        )


def test_lorenz_bisect_matches_sort():
    """The sort-free bisection threshold (used beyond 1M elements) must
    reproduce the sort-based Lorenz threshold; mask disagreement is
    bounded to the single f32 cumsum-rounding boundary element."""
    import jax.numpy as jnp

    from guided_vae_nmf_tpu.dsp.targets import (
        _lorenz_threshold_bisect, _lorenz_threshold_sort,
    )

    rng = np.random.RandomState(3)
    for q in (0.98, 0.999, 0.5):
        for scale in (1.0, 1e-6, 1e6):
            x = (rng.rand(200_000) ** 4 * scale).astype(np.float32)
            x[rng.rand(200_000) < 0.3] = 0.0  # pad-frame style ties
            ts = float(_lorenz_threshold_sort(jnp.asarray(x), q))
            tb = float(_lorenz_threshold_bisect(jnp.asarray(x), q))
            n_diff = int(np.sum((x > ts) != (x > tb)))
            assert n_diff <= 1, (q, scale, ts, tb, n_diff)
