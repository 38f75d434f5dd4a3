"""Log-density helpers (reference python/models/distributions.py:5-54)."""

import math

import jax
import jax.numpy as jnp


def prior_categorical(batch_size, y_dim):
    """Uniform categorical prior over y (reference distributions.py:5-10)."""
    prior = jnp.ones((batch_size, y_dim))
    return jax.nn.softmax(prior, axis=1)


def log_standard_gaussian(x):
    """log N(x | 0, I), summed over the last axis (reference
    distributions.py:13-20)."""
    return jnp.sum(-0.5 * math.log(2 * math.pi) - x**2 / 2, axis=-1)


def log_gaussian(x, mu, log_var):
    """log N(x | mu, exp(log_var)), summed over the last axis (reference
    distributions.py:23-34)."""
    log_pdf = (
        -0.5 * math.log(2 * math.pi)
        - log_var / 2
        - (x - mu) ** 2 / (2 * jnp.exp(log_var))
    )
    return jnp.sum(log_pdf, axis=-1)


def log_standard_categorical(p, eps):
    """Bernoulli-style cross-entropy of labels p against a uniform 0.5 prior
    (reference distributions.py:37-54)."""
    prior = 0.5 * jnp.ones_like(p)
    return -jnp.sum(
        p * jnp.log(prior + eps) + (1 - p) * jnp.log(1 - prior + eps), axis=1
    )
