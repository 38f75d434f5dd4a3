"""Supervision targets: ideal binary masks, VAD, ideal Wiener masks.

Capability parity with reference python/processing/target.py:7-280. Host-side
numpy implementations (dataset synthesis is host work); the Lorenz-quantile
criterion is also exposed as a jittable jnp function for on-device oracle
label generation inside the batched enhancement engine.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def lorenz_threshold(power, quantile_fraction):
    """Threshold value of the Lorenz-function quantile criterion
    (reference target.py:16-21): sort all values descending, find the last
    value whose cumulative share of the total is below `quantile_fraction`."""
    sorted_power = np.sort(power, axis=None)[::-1]
    lorenz_function = np.cumsum(sorted_power) / np.sum(sorted_power)
    return sorted_power[lorenz_function < quantile_fraction][-1]


def _harden(mask, quantile_weight):
    """Soften toward 0.5 by quantile_weight then round to exact {0,1} float32
    (reference target.py:23-27)."""
    mask = 0.5 + quantile_weight * (mask - 0.5)
    mask = np.round(mask)
    return np.float32(mask)


def clean_speech_IBM(observations, quantile_fraction=0.98, quantile_weight=0.999):
    """Oracle ideal binary mask over a complex spectrogram via the Lorenz
    criterion on TF power (reference target.py:7-27). Returns float32 {0,1}
    of the spectrogram's shape."""
    power = abs(observations * observations.conj())
    threshold = lorenz_threshold(power, quantile_fraction)
    return _harden(power > threshold, quantile_weight)


def clean_speech_VAD(observations, quantile_fraction=0.98, quantile_weight=0.999):
    """Frame-level voice activity labels: the Lorenz criterion applied to
    per-frame summed power (reference target.py:29-50). Returns float32 {0,1}
    of shape (1, frames)."""
    power = abs(observations * observations.conj()).sum(axis=0)
    threshold = lorenz_threshold(power, quantile_fraction)
    return _harden(power > threshold, quantile_weight)[None]


def noise_robust_clean_speech_VAD(
    observations,
    quantile_fraction_begin=0.93,
    quantile_fraction_end=0.99,
    quantile_weight=0.999,
):
    """VAD robust to leading/trailing noise: two Lorenz passes at different
    quantiles, then fill every frame between the first onset (loose quantile)
    and the last offset (tight quantile) with speech (reference
    target.py:52-77)."""
    vad = clean_speech_VAD(
        observations, quantile_fraction=quantile_fraction_begin,
        quantile_weight=quantile_weight,
    )[0]
    vad_end = clean_speech_VAD(
        observations, quantile_fraction=quantile_fraction_end,
        quantile_weight=quantile_weight,
    )[0]
    begin = np.nonzero(vad)[0]
    end = np.nonzero(vad_end)[0]
    vad[begin[0] : end[-1]] = 1.0
    return vad[None]


def noise_robust_clean_speech_IBM(
    observations,
    vad_quantile_fraction_begin=0.93,
    vad_quantile_fraction_end=0.99,
    ibm_quantile_fraction=0.999,
    quantile_weight=0.999,
):
    """Noise-robust IBM = noise-robust VAD AND per-bin IBM (reference
    target.py:79-103)."""
    vad = noise_robust_clean_speech_VAD(
        observations,
        quantile_fraction_begin=vad_quantile_fraction_begin,
        quantile_fraction_end=vad_quantile_fraction_end,
        quantile_weight=quantile_weight,
    )
    ibm = clean_speech_IBM(
        observations, quantile_fraction=ibm_quantile_fraction,
        quantile_weight=quantile_weight,
    )
    return ibm * vad


def ideal_wiener_mask(speech_tf, noise_tf, eps=1e-8):
    """Oracle Wiener mask |S|^2/(|S|^2+|N|^2+eps) (reference
    target.py:105-117)."""
    speech_power = np.abs(speech_tf) ** 2
    noise_power = np.abs(noise_tf) ** 2
    return speech_power / (speech_power + noise_power + eps)


# --------------------------------------------------------------------------
# jnp (on-device) variants
# --------------------------------------------------------------------------


def _lorenz_threshold_sort(flat, quantile_fraction):
    """Reference-shaped Lorenz threshold: full descending sort + cumsum
    (reference target.py:7-27). O(n log n) — the TPU sort dominates label
    generation beyond ~1M elements."""
    flat = jnp.sort(flat)[::-1]
    lorenz = jnp.cumsum(flat) / jnp.sum(flat)
    count = jnp.sum(lorenz < quantile_fraction)
    return flat[jnp.maximum(count - 1, 0)]


def _lorenz_threshold_bisect(flat, quantile_fraction):
    """Sort-free Lorenz threshold: 31-step bisection over the float32 bit
    order (non-negative floats compare like their int32 bit patterns), each
    step one masked sum — O(n) streaming passes instead of an O(n log n)
    device sort (a 57M-element sort is seconds on TPU; this is ~10 ms).

    Semantics match `_lorenz_threshold_sort` including its tie behavior
    (threshold = count-th largest element; a tie run at the threshold is
    excluded wholesale by the strict `>` mask). Boundary bins whose
    inclusion depends on f32 cumsum rounding may differ from the sort
    form — at most the single crossing element of millions.
    """
    total = jnp.sum(flat)
    target = quantile_fraction * total
    bits = jax.lax.bitcast_convert_type(flat, jnp.int32)

    def s_ge(vbits):
        return jnp.sum(jnp.where(bits >= vbits, flat, 0.0))

    def body(_, lohi):
        lo, hi = lohi
        mid = lo + (hi - lo) // 2  # (lo+hi)//2 overflows int32
        below = s_ge(mid) < target
        return jnp.where(below, lo, mid + 1), jnp.where(below, mid, hi)

    lo, hi = lax.fori_loop(0, 31, body, (jnp.int32(0), jnp.int32(0x7f7fffff)))
    v0 = hi  # minimal bit value whose >=-sum is below target
    ge = bits >= v0
    c0 = jnp.sum(ge)
    s0 = jnp.sum(jnp.where(ge, flat, 0.0))
    t_hi = jnp.min(jnp.where(ge, flat, jnp.inf))         # smallest kept
    w = jnp.max(jnp.where(ge, -jnp.inf, flat))           # next value down
    r = target - s0
    extra = jnp.where(w > 0, jnp.ceil(r / w) - 1, 0.0)
    extra = jnp.clip(extra, 0.0, None)
    threshold = jnp.where(extra >= 1, w, t_hi)
    # count == 0 (first element already covers the quantile) -> reference
    # falls back to flat[0], the global max
    return jnp.where(c0 + extra < 1, jnp.max(flat), threshold)


_LORENZ_BISECT_MIN_SIZE = 1 << 20


def _lorenz_threshold(flat, quantile_fraction):
    # the bisection walks the float32 bit order; any other dtype (e.g.
    # f64 under jax_enable_x64) takes the dtype-agnostic sort path
    if (flat.size >= _LORENZ_BISECT_MIN_SIZE
            and flat.dtype == jnp.float32):
        return _lorenz_threshold_bisect(flat, quantile_fraction)
    return _lorenz_threshold_sort(flat, quantile_fraction)


def clean_speech_IBM_jax(power, quantile_fraction=0.98, quantile_weight=0.999):
    """Jittable Lorenz-quantile IBM from a *power* spectrogram.

    Note: takes |X|^2 directly (on-device pipelines already carry power), not
    the complex spectrogram like the host variant.
    """
    threshold = _lorenz_threshold(power.reshape(-1), quantile_fraction)
    mask = (power > threshold).astype(jnp.float32)
    return jnp.round(0.5 + quantile_weight * (mask - 0.5))


def clean_speech_VAD_jax(power, quantile_fraction=0.98, quantile_weight=0.999):
    """Jittable frame-level VAD labels from a power spectrogram, (1, frames)."""
    frame_power = power.sum(axis=0)
    threshold = _lorenz_threshold(frame_power, quantile_fraction)
    vad = (frame_power > threshold).astype(jnp.float32)
    return jnp.round(0.5 + quantile_weight * (vad - 0.5))[None]


# --------------------------------------------------------------------------
# Heymann-style noise-aware masks (reference target.py:119-280; unused by the
# reference's scripts but part of its public API surface)
# --------------------------------------------------------------------------


def noise_aware_IRM(*inputs, feature_dim=-2, source_dim=-1, tuple_output=False):
    """Ideal soft (ratio) mask over stacked sources (reference
    target.py:119-183). Accepts either one stacked array or several source
    arrays which are stacked along `source_dim`."""
    assert feature_dim != source_dim

    if len(inputs) != 1:
        ndims = [i.ndim for i in inputs]
        if max(ndims) != min(ndims):
            assert max(ndims) == min(ndims) + 1
            inputs = [
                np.expand_dims(i, source_dim) if i.ndim == min(ndims) else i
                for i in inputs
            ]
        else:
            # Append a trailing source axis (the reference passed
            # num_dims_min+1, which pre-1.13 numpy clamped to "append").
            inputs = [np.expand_dims(i, min(ndims)) for i in inputs]
        X = np.concatenate(inputs, axis=source_dim)
    else:
        X = inputs[0]

    power = np.sum(X.conjugate() * X, axis=feature_dim, keepdims=True)
    mask = (power / np.sum(power, axis=source_dim, keepdims=True)).real

    if not tuple_output:
        return np.squeeze(mask, axis=feature_dim)
    sizes = np.cumsum([o.shape[source_dim] for o in inputs])
    output = np.split(mask, sizes[:-1], axis=source_dim)
    return [
        np.squeeze(o) if o.shape[source_dim] == 1
        else np.squeeze(o, axis=feature_dim)
        for o in output
    ]


def _voiced_unvoiced_split(number_of_frequency_bins):
    """Frequency-dependent voiced/unvoiced weighting curves (reference
    target.py:188-227)."""
    split_bin = 200
    transition_width = 99
    fast_transition_width = 5
    low_bin = 4
    high_bin = 500

    a = np.pi / (transition_width - 1) * np.arange(transition_width)
    transition = 0.5 * (1 + np.cos(a))
    b = np.pi / (fast_transition_width - 1) * np.arange(fast_transition_width)
    fast_transition = (np.cos(b) + 1) / 2

    start = int(split_bin - transition_width / 2)
    voiced = np.ones(number_of_frequency_bins)
    voiced[start - 1 : start + transition_width - 1] = transition
    voiced[start - 1 + transition_width :] = 0
    voiced[:low_bin] = 0
    voiced[low_bin - 1 : low_bin + fast_transition_width - 1] = 1 - fast_transition

    unvoiced = np.ones(number_of_frequency_bins)
    unvoiced[start - 1 : start + transition_width - 1] = 1 - transition
    unvoiced[:start] = 0
    unvoiced[high_bin - 1 :] = 0
    unvoiced[high_bin - 1 : high_bin + fast_transition_width - 1] = fast_transition

    return voiced, unvoiced


def noise_aware_IBM(
    X,
    N,
    threshold_unvoiced_speech=5,
    threshold_voiced_speech=0,
    threshold_unvoiced_noise=-10,
    threshold_voiced_noise=-10,
    low_cut=5,
    high_cut=500,
):
    """Heymann voiced/unvoiced-threshold IBM from speech and noise STFTs with
    (frames, bins) orientation (reference target.py:229-280). Returns
    (speech_mask, noise_mask) boolean arrays."""
    voiced, unvoiced = _voiced_unvoiced_split(X.shape[-1])

    threshold = threshold_voiced_speech * voiced + threshold_unvoiced_speech * unvoiced
    threshold_new = (
        threshold_unvoiced_noise * voiced + threshold_voiced_noise * unvoiced
    )

    xPSD = X * X.conjugate()
    xPSD_threshold = xPSD / np.power(10, threshold / 10)
    xPSD_threshold_new = xPSD / np.power(10, threshold_new / 10)
    nPSD = N * N.conjugate()

    speech_mask = np.logical_and(xPSD_threshold > nPSD, xPSD_threshold > 0.005)
    speech_mask[..., : low_cut - 1] = 0
    speech_mask[..., high_cut:] = 0

    noise_mask = np.logical_or(xPSD_threshold_new < nPSD, xPSD_threshold_new < 0.005)
    noise_mask[..., : low_cut - 1] = 1
    noise_mask[..., high_cut:] = 1

    return speech_mask, noise_mask
