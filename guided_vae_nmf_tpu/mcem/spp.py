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
        self._glr_inv_scale = (1 - prior) / prior * (1.0 + self._snr_opt_lin)
        self._glr_exp_scale = self._snr_opt_lin / (1.0 + self._snr_opt_lin)
        self.reset()

    def reset(self):
        n_bins = self._frame_length // 2 + 1
        self._psd = np.zeros(n_bins)
        self._spp_smoothed = np.zeros(n_bins)
        self._num_frames_processed = 0

    def update(self, periodogram, spp_external=None):
        """One frame update -> (noise_psd, spp) or noise_psd when an external
        SPP is supplied (reference spp_estimation.py:86-146)."""
        if spp_external is not None:
            blended_per = (1.0 - spp_external) * periodogram + \
                spp_external * self._psd
            noise_psd = (1.0 - self._fixed_smooth) * blended_per + \
                self._fixed_smooth * self._psd
            return noise_psd

        if self._num_frames_processed < self._num_frames_init:
            noise_psd = self._psd + periodogram / self._num_frames_init
            self._psd = noise_psd
            self._num_frames_processed += 1
            return periodogram, np.zeros_like(self._psd)

        inv_glr = self._glr_inv_scale * np.exp(
            -periodogram / (self._psd + 1e-8) * self._glr_exp_scale
        )
        spp = 1.0 / (1.0 + inv_glr)

        self._spp_smoothed = (1 - self._prob_smooth) * spp + \
            self._prob_smooth * self._spp_smoothed
        stuck = self._spp_smoothed > 0.99
        spp = np.where(stuck, np.minimum(spp, 0.99), spp)

        blended_per = (1.0 - spp) * periodogram + spp * self._psd
        noise_psd = (1.0 - self._fixed_smooth) * blended_per + \
            self._fixed_smooth * self._psd
        self._psd = noise_psd
        return noise_psd, spp

    def from_stft(self, per_frames):
        """Noise PSD track for a (frames, bins) periodogram matrix, resetting
        afterwards (reference spp_estimation.py:156-172)."""
        psd_frames = np.zeros(per_frames.shape)
        for frame, per in enumerate(per_frames):
            psd_frames[frame] = self.update(per)[0]
        self.reset()
        return psd_frames


def timo_mask_estimation(spectrogram):
    """Soft TF mask = per-frame SPP over a (bins, frames) power spectrogram
    (reference spp_estimation.py:175-194)."""
    freq_bins, _ = spectrogram.shape
    est = SPPNoiseEstimator(frame_length=(freq_bins - 1) * 2)
    mask = np.zeros_like(spectrogram)
    for i, frame in enumerate(spectrogram.T):
        _, spp = est.update(frame)
        mask[:, i] = spp
    return mask


def timo_vad_estimation(spectrogram):
    """Frame VAD = SPP of the per-frame summed power (reference
    spp_estimation.py:196-215)."""
    frame_power = spectrogram.sum(axis=0)
    est = SPPNoiseEstimator(frame_length=0)
    vad = np.zeros_like(frame_power)
    for i, p in enumerate(frame_power):
        _, spp = est.update(np.atleast_1d(p))
        vad[i] = spp[0]
    return vad


def timo_noise_estimation(spectrogram, mask):
    """Noise PSD track with an externally supplied SPP mask (reference
    spp_estimation.py:217-235)."""
    freq_bins, _ = spectrogram.shape
    est = SPPNoiseEstimator(frame_length=(freq_bins - 1) * 2)
    psd_track = np.zeros_like(spectrogram)
    for i, (frame, spp_in) in enumerate(zip(spectrogram.T, mask.T)):
        psd_track[:, i] = est.update(frame, spp_in)
        # NOTE: the reference's external-SPP path never advances _psd
        # (spp_estimation.py:137-146); behavior preserved for parity.
    return psd_track


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
