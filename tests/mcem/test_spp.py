"""SPP noise tracker tests: numpy<->lax.scan agreement, invariants, and
parity against the reference implementation (read-only import)."""

import sys

import numpy as np
import pytest
from numpy.testing import assert_allclose

from guided_vae_nmf_tpu.mcem import (
    SPPNoiseEstimator,
    timo_mask_estimation,
    timo_vad_estimation,
    timo_noise_estimation,
    spp_track_jax,
    timo_mask_estimation_jax,
    timo_vad_estimation_jax,
)


def _spectro(seed=0, f=65, n=50):
    rng = np.random.RandomState(seed)
    noise = 0.1 * rng.rand(f, n)
    speech = np.zeros((f, n))
    speech[5:20, 20:40] = 3.0 * rng.rand(15, 20)
    return noise + speech


def test_spp_mask_range_and_speech_detection():
    S = _spectro()
    mask = timo_mask_estimation(S)
    assert mask.shape == S.shape
    assert np.all((mask >= 0) & (mask <= 1))
    assert np.all(mask[:, :10] == 0)  # init frames report SPP 0
    # speech region must show high presence probability
    assert mask[5:20, 25:35].mean() > 0.8


def test_vad_estimation():
    S = _spectro()
    vad = timo_vad_estimation(S)
    assert vad.shape == (S.shape[1],)
    # speech frames show clearly higher presence probability than noise-only
    assert vad[25:35].mean() > 2 * max(vad[12:18].mean(), 0.05)
    assert vad[:10].max() == 0.0


def test_noise_estimation_with_external_spp():
    S = _spectro()
    mask = timo_mask_estimation(S)
    psd = timo_noise_estimation(S, mask)
    assert psd.shape == S.shape
    assert np.all(psd >= 0)


def test_jax_track_matches_numpy():
    S = _spectro(seed=3)
    mask_np = timo_mask_estimation(S)
    mask_j = np.asarray(timo_mask_estimation_jax(S.astype(np.float32)))
    assert_allclose(mask_j, mask_np, atol=1e-5)

    vad_np = timo_vad_estimation(S)
    vad_j = np.asarray(timo_vad_estimation_jax(S.astype(np.float32)))
    assert_allclose(vad_j, vad_np, atol=1e-5)

    est = SPPNoiseEstimator(frame_length=(S.shape[0] - 1) * 2)
    psd_np = est.from_stft(S.T)  # (frames, bins)
    psd_j, _ = spp_track_jax(S.astype(np.float32))
    assert_allclose(np.asarray(psd_j), psd_np.T, rtol=1e-4, atol=1e-6)


def _reference_available():
    import os

    return os.path.isdir("/root/reference/python")


@pytest.mark.skipif(
    not _reference_available(), reason="reference unavailable"
)
def test_parity_with_reference():
    sys.path.insert(0, "/root/reference")
    try:
        from python.models import spp_estimation as ref
    finally:
        sys.path.pop(0)

    S = _spectro(seed=7)
    assert_allclose(timo_mask_estimation(S), ref.timo_mask_estimation(S))
    assert_allclose(timo_vad_estimation(S), ref.timo_vad_estimation(S))
    m = timo_mask_estimation(S)
    assert_allclose(timo_noise_estimation(S, m),
                    ref.timo_noise_estimation(S, m))
