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


def _spp_step(fixed_smooth, prob_smooth, prior, snr_opt_db,
              num_frames_init, gated=False):
    """Per-frame scan body shared by the whole-track and the
    state-carrying chunk trackers. With `gated=True` the scanned input is
    (per, valid): frames with valid <= 0 emit outputs but do NOT advance
    the carried state (streaming pads)."""
    snr_opt_lin = 10.0 ** (snr_opt_db / 10.0)
    glr_factor = (1 - prior) / prior * (1.0 + snr_opt_lin)
    glr_exp = snr_opt_lin / (1.0 + snr_opt_lin)

    def step(carry, inp):
        per, valid = inp if gated else (inp, None)
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
        if gated:
            keep = valid > 0
            new_old = jnp.where(keep, new_old, old_psd)
            new_smooth = jnp.where(keep, new_smooth, smooth_prob)
            idx = jnp.where(keep, idx + 1, idx)
            return (new_old, new_smooth, idx), (out_psd, out_spp)
        return (new_old, new_smooth, idx + 1), (out_psd, out_spp)

    return step


def spp_state_init(n_bins, dtype=jnp.float32):
    """Fresh carried state for :func:`spp_track_chunk` — equivalent to the
    tracker before its first frame."""
    return (jnp.zeros((n_bins,), dtype), jnp.zeros((n_bins,), dtype),
            jnp.asarray(0, jnp.int32))


@partial(jax.jit, static_argnames=("num_frames_init",))
def spp_track_chunk(power, state, n_valid=None,
                    fixed_smooth=SPP_FIX_SMOOTH,
                    prob_smooth=SPP_PROB_SMOOTH, prior=SPP_PRIOR,
                    snr_opt_db=SPP_SNR_OPT_DB,
                    num_frames_init=SPP_NUM_FRAMES_INIT):
    """State-carrying chunk tracker: (bins, frames) power + carried state
    -> (noise_psd, spp, new_state). Feeding a track chunk-by-chunk equals
    :func:`spp_track_jax` on the whole track exactly (same f32 scan body)
    — the streaming enhancers' causal recurrence as ONE device scan per
    chunk instead of a per-frame host loop. `n_valid` (traced scalar)
    gates state advancement so end-of-stream pad rows emit benign outputs
    without polluting the carry; vmap over a leading batch axis (states
    stacked likewise) for the multi-stream pool."""
    K = power.shape[1]
    step = _spp_step(fixed_smooth, prob_smooth, prior, snr_opt_db,
                     num_frames_init, gated=True)
    if n_valid is None:
        valid = jnp.ones((K,), jnp.int32)
    else:
        valid = (jnp.arange(K) < n_valid).astype(jnp.int32)
    state, (psd, spp) = lax.scan(step, state, (power.T, valid))
    return psd.T, spp.T, state


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
    n_bins = power.shape[0]
    step = _spp_step(fixed_smooth, prob_smooth, prior, snr_opt_db,
                     num_frames_init)
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
