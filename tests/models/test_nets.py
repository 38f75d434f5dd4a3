"""Model-layer tests: shapes, parameter counts, loss math, and forward
parity against the reference's torch modules (imported read-only from
/root/reference) through the checkpoint importer."""

import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from numpy.testing import assert_allclose

from conftest import has_reference_data
from guided_vae_nmf_tpu.models import (
    vae_init,
    vae_apply,
    dgm_init,
    dgm_apply,
    classifier_init,
    classifier_apply,
    classifier2_init,
    classifier2_apply,
    encoder_apply,
    decoder_apply,
    count_parameters,
    elbo,
    binary_cross_entropy,
    mean_square_error_mask,
    f1_loss,
    kl_divergence,
    import_vae,
    import_classifier,
    export_vae,
    DeterministicWarmup,
)

KEY = jax.random.PRNGKey(0)


def test_vae_shapes_and_count():
    params = vae_init(KEY, [513, 32, [128, 128]])
    x = jax.random.uniform(KEY, (7, 513)) + 0.1
    r, mu, logvar = vae_apply(params, x, jax.random.PRNGKey(1))
    assert r.shape == (7, 513)
    assert mu.shape == (7, 32) and logvar.shape == (7, 32)
    assert np.all(np.asarray(r) > 0)  # decoder outputs exp() variance
    # M1 z=32 h=[128,128]: exactly 177,473 params (= the reference torch
    # model's count for the same dims)
    n = count_parameters(params)
    assert n == 177_473


def test_dgm_label_conditioning():
    params = dgm_init(KEY, [513, 513, 32, [128, 128]])
    x = jax.random.uniform(KEY, (5, 513)) + 0.1
    y0 = jnp.zeros((5, 513))
    y1 = jnp.ones((5, 513))
    r0, *_ = dgm_apply(params, x, y0, None)
    r1, *_ = dgm_apply(params, x, y1, None)
    assert r0.shape == (5, 513)
    assert not np.allclose(np.asarray(r0), np.asarray(r1))


def test_classifier_output_range():
    params = classifier_init(KEY, [513, [128, 128], 513])
    y = classifier_apply(params, jax.random.normal(KEY, (11, 513)))
    assert y.shape == (11, 513)
    assert np.all((np.asarray(y) >= 0) & (np.asarray(y) <= 1))


def test_classifier2_softmax():
    params = classifier2_init(KEY, [64, [32], 10])
    y = classifier2_apply(params, jax.random.normal(KEY, (3, 64)))
    assert y.shape == (3, 2, 10)
    assert_allclose(np.asarray(y.sum(axis=1)), 1.0, rtol=1e-5)


def test_elbo_matches_manual():
    rng = np.random.RandomState(0)
    x = rng.rand(4, 16).astype(np.float32) + 0.1
    r = rng.rand(4, 16).astype(np.float32) + 0.1
    mu = rng.randn(4, 3).astype(np.float32)
    logvar = rng.randn(4, 3).astype(np.float32)
    eps = 1e-8
    loss, recon, KL = elbo(x, r, mu, logvar, eps)
    recon_m = np.mean(
        np.sum(x / r - np.log(x + eps) + np.log(r) - 1, axis=-1)
    )
    KL_m = -0.5 * np.mean(np.sum(logvar - mu**2 - np.exp(logvar), axis=-1))
    assert_allclose(float(recon), recon_m, rtol=1e-5)
    assert_allclose(float(KL), KL_m, rtol=1e-5)
    assert_allclose(float(loss), recon_m + KL_m, rtol=1e-5)


def test_bce_and_mse_mask():
    rng = np.random.RandomState(1)
    y = (rng.rand(8, 5) > 0.5).astype(np.float32)
    p = np.clip(rng.rand(8, 5).astype(np.float32), 0.01, 0.99)
    got = float(binary_cross_entropy(p, y, 1e-8))
    want = -np.mean(
        np.sum(y * np.log(p + 1e-8) + (1 - y) * np.log(1 - p + 1e-8), axis=-1)
    )
    assert_allclose(got, want, rtol=1e-5)
    assert_allclose(
        float(mean_square_error_mask(y, p)),
        np.mean(np.sum((y - p) ** 2, axis=-1)),
        rtol=1e-5,
    )


def test_f1_perfect_and_inverted():
    y = jnp.array([1, 0, 1, 1, 0], jnp.float32)
    acc, prec, rec, f1 = f1_loss(y, y)
    assert float(acc) > 0.999 and float(f1) > 0.999
    acc, prec, rec, f1 = f1_loss(1 - y, y)
    assert float(f1) < 1e-6


def test_deterministic_warmup():
    w = DeterministicWarmup(n=4)
    vals = [next(w) for _ in range(6)]
    assert_allclose(vals, [0.25, 0.5, 0.75, 1.0, 1.0, 1.0])


def test_export_import_roundtrip():
    params = vae_init(KEY, [64, 8, [32, 16]])
    back = import_vae(export_vae(params))
    for a, b in zip(
        jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(back)
    ):
        assert_allclose(np.asarray(a), np.asarray(b))


# ---------------------------------------------------------------------------
# Forward parity with the reference torch modules (read-only import)
# ---------------------------------------------------------------------------


def _reference_available():
    try:
        import torch  # noqa: F401
    except ImportError:
        return False
    import os

    return os.path.isdir("/root/reference/python")


@pytest.mark.skipif(
    not _reference_available(), reason="reference/torch unavailable"
)
def test_torch_checkpoint_forward_parity():
    sys.path.insert(0, "/root/reference")
    try:
        import torch
        from python.models.models import VariationalAutoencoder, Classifier
    finally:
        sys.path.pop(0)

    torch.manual_seed(0)
    tvae = VariationalAutoencoder([513, 32, [128, 128]])
    tvae.eval()
    params = import_vae(tvae.state_dict())

    x = np.random.RandomState(0).rand(9, 513).astype(np.float32) + 0.1
    with torch.no_grad():
        _, tmu, tlogvar = tvae.encoder(torch.from_numpy(x))
        tdec = tvae.decoder(tmu)
    _, jmu, jlogvar = encoder_apply(params["encoder"], jnp.asarray(x))
    jdec = decoder_apply(params["decoder"], jmu)
    assert_allclose(np.asarray(jmu), tmu.numpy(), atol=1e-5)
    assert_allclose(np.asarray(jlogvar), tlogvar.numpy(), atol=1e-5)
    assert_allclose(np.asarray(jdec), tdec.numpy(), rtol=1e-4, atol=1e-5)

    tcls = Classifier([513, [128, 128], 513])
    tcls.eval()
    cparams = import_classifier(tcls.state_dict())
    with torch.no_grad():
        ty = tcls(torch.from_numpy(x))
    jy = classifier_apply(cparams, jnp.asarray(x))
    assert_allclose(np.asarray(jy), ty.numpy(), atol=1e-5)
