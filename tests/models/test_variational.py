"""SVI machinery tests (reference python/models/variational.py)."""

import numpy as np
import jax
import jax.numpy as jnp
from numpy.testing import assert_allclose

from guided_vae_nmf_tpu.models import (
    vae_init,
    dgm_init,
    classifier_init,
    svi,
    svi_m1,
    ImportanceWeightedSampler,
    ikatura_saito_divergence,
)

KEY = jax.random.PRNGKey(0)


def _is_lik(r, x, eps):
    """IS-divergence likelihood — the decoder emits positive variances, so
    the (legacy, unused-by-scripts) BCE default is out of domain here just
    as it is in the reference."""
    return jnp.mean(ikatura_saito_divergence(r, x, eps))


def test_svi_m1_components_finite_and_consistent():
    vae = vae_init(KEY, [32, 4, [16]])
    x = jax.random.uniform(KEY, (6, 32)) * 0.9 + 0.05
    loss, neg_lik, kl = svi_m1(vae, x, jax.random.PRNGKey(1), likelihood=_is_lik)
    assert np.isfinite(float(loss))
    # loss = -mean(lik - kl) = neg_lik + kl
    assert_allclose(float(loss), float(neg_lik) + float(kl), rtol=1e-5)


def test_svi_labelled_returns_components():
    dgm = dgm_init(KEY, [32, 4, 4, [16]])
    x = jax.random.uniform(KEY, (6, 32)) * 0.9 + 0.05
    y = jnp.eye(4)[jnp.array([0, 1, 2, 3, 0, 1])]
    loss, neg_lik, neg_prior, kl = svi(dgm, x, jax.random.PRNGKey(1), y=y, likelihood=_is_lik)
    assert np.isfinite(float(loss))
    assert_allclose(
        float(loss), float(neg_lik) + float(neg_prior) + float(kl),
        rtol=1e-4,
    )


def test_svi_unlabelled_enumerates_labels():
    y_dim = 3
    dgm = dgm_init(KEY, [16, y_dim, 4, [8]])
    cls = classifier_init(KEY, [16, [8], y_dim])
    x = jax.random.uniform(KEY, (5, 16)) * 0.9 + 0.05
    U = svi(dgm, x, jax.random.PRNGKey(2), classifier_params=cls, likelihood=_is_lik)
    assert np.isfinite(float(U))


def test_importance_weighted_sampler():
    s = ImportanceWeightedSampler(mc=2, iw=3)
    x = jnp.ones((4, 5))
    assert s.resample(x).shape == (24, 5)
    elbo = jnp.arange(24.0)
    out = s(elbo)
    assert out.shape == (4,)
    assert np.all(np.isfinite(np.asarray(out)))
