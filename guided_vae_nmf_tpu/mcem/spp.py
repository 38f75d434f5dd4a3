"""SPP-based noise PSD estimation (Gerkmann & Hendriks 2011/2012).

Capability parity with reference python/models/spp_estimation.py:17-235: the
frame-recursive speech-presence-probability noise tracker, plus the
`timo_*` helpers that run it over a whole spectrogram to produce soft masks /
VAD / noise PSD tracks (the unsupervised "timo" classifier option,
reference scripts/evaluate_M2_ibm.py:136-141).

The recurrence is sequential over frames, so the TPU-native form is a
`lax.scan` over the frame axis (`spp_track_jax`), vmappable over utterance
batches; a numpy `SPPNoiseEstimator` class keeps the reference's streaming
update/reset API for host-side use.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from functools import partial

SPP_FIX_SMOOTH = 0.8
SPP_PROB_SMOOTH = 0.9
SPP_PRIOR = 0.5
SPP_SNR_OPT_DB = 15
SPP_NUM_FRAMES_INIT = 10


class SPPNoiseEstimator:
    """Streaming SPP noise tracker (reference spp_estimation.py:17-172).

    First `num_frames_init` frames are averaged into the initial noise PSD
    (SPP reported as 0); afterwards each frame applies the inverse-GLR SPP,
    stuck protection (clamp when the smoothed probability exceeds 0.99), the
    SPP-weighted noise periodogram blend and fixed PSD smoothing.
    """

    def __init__(self, frame_length, fixed_smooth=SPP_FIX_SMOOTH,
                 prob_smooth=SPP_PROB_SMOOTH, prior=SPP_PRIOR,
                 snr_opt_db=SPP_SNR_OPT_DB,
                 num_frames_init=SPP_NUM_FRAMES_INIT):
        self._frame_length = frame_length
        self._fixed_smooth = fixed_smooth
        self._prob_smooth = prob_smooth
        self._prior = prior
        self._snr_opt_lin = 10.0 ** (snr_opt_db / 10.0)
        self._num_frames_init = num_frames_init
        self._inv_glr_factor = (1 - prior) / prior * (1.0 + self._snr_opt_lin)
        self._inv_glr_exp_factor = self._snr_opt_lin / (1.0 + self._snr_opt_lin)
        self.reset()

    def reset(self):
        n_bins = self._frame_length // 2 + 1
        self._v_old_psd = np.zeros(n_bins)
        self._v_smooth_prob = np.zeros(n_bins)
        self._num_frames_processed = 0

    def update(self, v_noisy_per, v_spp_in=None):
        """One frame update -> (noise_psd, spp) or noise_psd when an external
        SPP is supplied (reference spp_estimation.py:86-146)."""
        if v_spp_in is not None:
            v_noise_per = (1.0 - v_spp_in) * v_noisy_per + \
                v_spp_in * self._v_old_psd
            v_noise_psd = (1.0 - self._fixed_smooth) * v_noise_per + \
                self._fixed_smooth * self._v_old_psd
            return v_noise_psd

        if self._num_frames_processed < self._num_frames_init:
            v_noise_psd = self._v_old_psd + v_noisy_per / self._num_frames_init
            self._v_old_psd = v_noise_psd
            self._num_frames_processed += 1
            return v_noisy_per, np.zeros_like(self._v_old_psd)

        v_inv_glr = self._inv_glr_factor * np.exp(
            -v_noisy_per / (self._v_old_psd + 1e-8) * self._inv_glr_exp_factor
        )
        v_spp = 1.0 / (1.0 + v_inv_glr)

        self._v_smooth_prob = (1 - self._prob_smooth) * v_spp + \
            self._prob_smooth * self._v_smooth_prob
        v_mask = self._v_smooth_prob > 0.99
        v_spp = np.where(v_mask, np.minimum(v_spp, 0.99), v_spp)

        v_noise_per = (1.0 - v_spp) * v_noisy_per + v_spp * self._v_old_psd
        v_noise_psd = (1.0 - self._fixed_smooth) * v_noise_per + \
            self._fixed_smooth * self._v_old_psd
        self._v_old_psd = v_noise_psd
        return v_noise_psd, v_spp

    def from_stft(self, mat_per):
        """Noise PSD track for a (frames, bins) periodogram matrix, resetting
        afterwards (reference spp_estimation.py:156-172)."""
        mat_psd = np.zeros(mat_per.shape)
        for frame, per in enumerate(mat_per):
            mat_psd[frame] = self.update(per)[0]
        self.reset()
        return mat_psd


def timo_mask_estimation(spectrogram):
    """Soft TF mask = per-frame SPP over a (bins, frames) power spectrogram
    (reference spp_estimation.py:175-194)."""
    freq_bins, _ = spectrogram.shape
    est = SPPNoiseEstimator(frame_length=(freq_bins - 1) * 2)
    mask = np.zeros_like(spectrogram)
    for i, frame in enumerate(spectrogram.T):
        _, v_spp = est.update(frame)
        mask[:, i] = v_spp
    return mask


def timo_vad_estimation(spectrogram):
    """Frame VAD = SPP of the per-frame summed power (reference
    spp_estimation.py:196-215)."""
    frame_power = spectrogram.sum(axis=0)
    est = SPPNoiseEstimator(frame_length=0)
    vad = np.zeros_like(frame_power)
    for i, p in enumerate(frame_power):
        _, v_spp = est.update(np.atleast_1d(p))
        vad[i] = v_spp[0]
    return vad


def timo_noise_estimation(spectrogram, mask):
    """Noise PSD track with an externally supplied SPP mask (reference
    spp_estimation.py:217-235)."""
    freq_bins, _ = spectrogram.shape
    est = SPPNoiseEstimator(frame_length=(freq_bins - 1) * 2)
    noise_psd = np.zeros_like(spectrogram)
    for i, (frame, spp_in) in enumerate(zip(spectrogram.T, mask.T)):
        v_noise_psd = est.update(frame, spp_in)
        noise_psd[:, i] = v_noise_psd
        # NOTE: the reference's external-SPP path never advances _v_old_psd
        # (spp_estimation.py:137-146); behavior preserved for parity.
    return noise_psd


# ---------------------------------------------------------------------------
# lax.scan implementation
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("num_frames_init",))
def spp_track_jax(power, fixed_smooth=SPP_FIX_SMOOTH,
                  prob_smooth=SPP_PROB_SMOOTH, prior=SPP_PRIOR,
                  snr_opt_db=SPP_SNR_OPT_DB,
                  num_frames_init=SPP_NUM_FRAMES_INIT):
    """Jittable SPP tracker over a (bins, frames) power spectrogram.

    Returns (noise_psd, spp), both (bins, frames). Per-frame recurrence as a
    `lax.scan` over the frame axis; the init-phase branch is a `where` on the
    frame counter. vmap over a leading batch axis for utterance batches.
    """
    snr_opt_lin = 10.0 ** (snr_opt_db / 10.0)
    glr_factor = (1 - prior) / prior * (1.0 + snr_opt_lin)
    glr_exp = snr_opt_lin / (1.0 + snr_opt_lin)
    n_bins = power.shape[0]

    def step(carry, per):
        old_psd, smooth_prob, idx = carry
        # init phase: accumulate average, SPP = 0
        init_psd = old_psd + per / num_frames_init

        inv_glr = glr_factor * jnp.exp(-per / (old_psd + 1e-8) * glr_exp)
        spp = 1.0 / (1.0 + inv_glr)
        smooth2 = (1 - prob_smooth) * spp + prob_smooth * smooth_prob
        spp = jnp.where(smooth2 > 0.99, jnp.minimum(spp, 0.99), spp)
        noise_per = (1.0 - spp) * per + spp * old_psd
        track_psd = (1.0 - fixed_smooth) * noise_per + fixed_smooth * old_psd

        in_init = idx < num_frames_init
        new_old = jnp.where(in_init, init_psd, track_psd)
        new_smooth = jnp.where(in_init, smooth_prob, smooth2)
        out_psd = jnp.where(in_init, per, track_psd)
        out_spp = jnp.where(in_init, jnp.zeros_like(spp), spp)
        return (new_old, new_smooth, idx + 1), (out_psd, out_spp)

    init = (
        jnp.zeros((n_bins,), power.dtype),
        jnp.zeros((n_bins,), power.dtype),
        jnp.asarray(0, jnp.int32),
    )
    _, (psd, spp) = lax.scan(step, init, power.T)
    return psd.T, spp.T


def timo_mask_estimation_jax(spectrogram):
    """Jittable soft-mask variant of :func:`timo_mask_estimation`."""
    _, spp = spp_track_jax(spectrogram)
    return spp


def timo_vad_estimation_jax(spectrogram):
    """Jittable VAD variant (SPP of summed power)."""
    _, spp = spp_track_jax(spectrogram.sum(axis=0, keepdims=True))
    return spp[0]
