"""Scale-invariant SDR/SIR/SAR energy-ratio metrics.

Capability parity with reference python/metrics.py:12-60: decompose the
estimate as s_hat = alpha_s*s + alpha_n*n + e_art by projection and report
the three ratios in dB. Implemented in both numpy (host) and jnp (jittable,
vmappable over utterance batches — the reference computes these in a process
pool, P4 in SURVEY §2.7).
"""

import numpy as np
import jax.numpy as jnp


def si_sdr_components(s_hat, s, n):
    """Projection decomposition (reference metrics.py:12-37)."""
    alpha_s = np.dot(s_hat, s) / np.linalg.norm(s) ** 2
    s_target = alpha_s * s
    alpha_n = np.dot(s_hat, n) / np.linalg.norm(n) ** 2
    e_noise = alpha_n * n
    e_art = s_hat - s_target - e_noise
    return s_target, e_noise, e_art


def energy_ratios(s_hat, s, n):
    """(si_sdr, si_sir, si_sar) in dB (reference metrics.py:39-60)."""
    s_target, e_noise, e_art = si_sdr_components(s_hat, s, n)
    t = np.linalg.norm(s_target) ** 2
    si_sdr = 10 * np.log10(t / np.linalg.norm(e_noise + e_art) ** 2)
    si_sir = 10 * np.log10(t / np.linalg.norm(e_noise) ** 2)
    si_sar = 10 * np.log10(t / np.linalg.norm(e_art) ** 2)
    return si_sdr, si_sir, si_sar


def energy_ratios_jax(s_hat, s, n):
    """jnp version of :func:`energy_ratios`; vmap over a batch axis for
    whole-sweep metric computation on device."""
    alpha_s = jnp.dot(s_hat, s) / jnp.sum(s**2)
    s_target = alpha_s * s
    alpha_n = jnp.dot(s_hat, n) / jnp.sum(n**2)
    e_noise = alpha_n * n
    e_art = s_hat - s_target - e_noise
    t = jnp.sum(s_target**2)
    si_sdr = 10 * jnp.log10(t / jnp.sum((e_noise + e_art) ** 2))
    si_sir = 10 * jnp.log10(t / jnp.sum(e_noise**2))
    si_sar = 10 * jnp.log10(t / jnp.sum(e_art**2))
    return si_sdr, si_sir, si_sar
