"""Semi-supervised SVI machinery.

Capability parity with reference python/models/variational.py:10-165 —
`ImportanceWeightedSampler` (Burda IWAE), `DeterministicWarmup` (Sønderby
linear beta schedule), and the SVI / SVI_M1 objective functions. The
reference's training scripts call `elbo` directly; this module preserves the
retained Kingma-M2 ELBO machinery as pure functions over (params, batch,
key).
"""

import jax.numpy as jnp

from .nets import dgm_apply, vae_apply, classifier_apply
from .losses import binary_cross_entropy, log_sum_exp, enumerate_discrete
from .distributions import log_standard_categorical


class ImportanceWeightedSampler:
    """Importance-weighted ELBO reducer [Burda 2015] (reference
    variational.py:10-29)."""

    def __init__(self, mc=1, iw=1):
        self.mc = mc
        self.iw = iw

    def resample(self, x):
        return jnp.tile(x, (self.mc * self.iw, 1))

    def __call__(self, elbo):
        elbo = elbo.reshape(self.mc, self.iw, -1)
        elbo = jnp.mean(
            log_sum_exp(elbo, axis=1, sum_op=jnp.mean), axis=0
        )
        return elbo.reshape(-1)


class DeterministicWarmup:
    """Linear KL warm-up [Sønderby 2016] (reference variational.py:32-48)."""

    def __init__(self, n=100, t_max=1):
        self.t = 0.0
        self.t_max = t_max
        self.inc = 1.0 / n

    def __iter__(self):
        return self

    def __next__(self):
        t = self.t + self.inc
        self.t = self.t_max if t > self.t_max else t
        return self.t


def svi_m1(params, x, key, likelihood=binary_cross_entropy, eps=1e-8):
    """SVI objective for M1 (reference variational.py:123-164). Returns
    [loss, -likelihood, KL] as batch means."""
    from .losses import kl_divergence

    r, mu, logvar = vae_apply(params, x, key)
    lik = -likelihood(r, x, eps)
    kl = kl_divergence(mu, logvar)
    L = lik - kl
    return [-jnp.mean(L), -jnp.mean(lik), jnp.mean(kl)]


def svi(params, x, key, y=None, classifier_params=None,
        likelihood=binary_cross_entropy, eps=1e-8):
    """Semi-supervised SVI objective for M2 (reference
    variational.py:51-121). Labelled: returns [loss, -lik, -prior, KL].
    Unlabelled: enumerates all one-hot labels, weights per-label -L(x,y) by
    the classifier posterior and adds its entropy, returning mean U(x)."""
    from .losses import kl_divergence

    is_labelled = y is not None
    y_dim = params["y_dim"]

    if is_labelled:
        xs, ys = x, y
    else:
        batch = x.shape[0]
        ys = enumerate_discrete(batch, y_dim)
        xs = jnp.tile(x, (y_dim, 1))

    r, mu, logvar = dgm_apply(params, xs, ys, key)
    lik = -likelihood(r, xs, eps)
    prior = -log_standard_categorical(ys, eps)
    kl = kl_divergence(mu, logvar)
    elbo_val = lik + prior - kl

    if is_labelled:
        return [
            -jnp.mean(elbo_val),
            -jnp.mean(lik),
            -jnp.mean(prior),
            jnp.mean(kl),
        ]

    logits = classifier_apply(classifier_params, x)
    L = elbo_val.reshape(logits.T.shape).T
    H = -jnp.sum(logits * jnp.log(logits + 1e-8), axis=-1)
    L = jnp.sum(logits * L, axis=-1)
    return jnp.mean(L + H)
