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


def test_spp_track_chunk_equals_whole_track():
    """Chunked state-carrying tracking == the whole-track scan, exactly
    (same f32 scan body, carried state between chunks), including ragged
    chunk sizes and a pad-gated final chunk."""
    import jax.numpy as jnp

    from guided_vae_nmf_tpu.mcem import (
        spp_state_init, spp_track_chunk, spp_track_jax,
    )

    S = _spectro(seed=11).astype(np.float32)    # (bins, frames)
    want_psd, want_spp = spp_track_jax(jnp.asarray(S))

    state = spp_state_init(S.shape[0])
    got_psd, got_spp = [], []
    lo = 0
    for k in (1, 7, 4, 13, 2, 64):              # ragged chunking
        chunk = S[:, lo:lo + k]
        if chunk.shape[1] == 0:
            break
        psd, spp, state = spp_track_chunk(jnp.asarray(chunk), state)
        got_psd.append(np.asarray(psd))
        got_spp.append(np.asarray(spp))
        lo += chunk.shape[1]
    if lo < S.shape[1]:
        # final ragged chunk padded to 8 rows; n_valid gates the carry
        k = S.shape[1] - lo
        pad = np.ones((S.shape[0], 8), np.float32)
        pad[:, :k] = S[:, lo:]
        psd, spp, state2 = spp_track_chunk(jnp.asarray(pad), state,
                                           n_valid=k)
        got_psd.append(np.asarray(psd)[:, :k])
        got_spp.append(np.asarray(spp)[:, :k])
        # pad rows advanced nothing: re-running them changes no state
        psd_b, _, _ = spp_track_chunk(jnp.asarray(pad), state, n_valid=k)
        assert_allclose(np.asarray(psd_b), np.asarray(psd))
        state = state2

    assert_allclose(np.concatenate(got_psd, axis=1), np.asarray(want_psd),
                    rtol=0, atol=0)
    assert_allclose(np.concatenate(got_spp, axis=1), np.asarray(want_spp),
                    rtol=0, atol=0)
    assert int(state[2]) == S.shape[1]
