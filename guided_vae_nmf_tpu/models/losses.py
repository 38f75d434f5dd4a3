"""Losses and classification scores.

Capability parity with reference python/models/utils.py:44-145: the
Itakura-Saito-divergence ELBO used for M1/M2 training, its per-sample L/U
semi-supervised forms, BCE, mask-MSE losses, and the tp/tn/fp/fn F1 score.
All functions are pure jnp and jittable.
"""

import jax.numpy as jnp


def ikatura_saito_divergence(r, x, eps):
    """Per-sample IS divergence summed over bins: sum(x/r - log(x+eps)
    + log(r) - 1) (reference utils.py:61-64; the reference keeps the
    original author's spelling)."""
    return jnp.sum(x / r - jnp.log(x + eps) + jnp.log(r) - 1.0, axis=-1)


itakura_saito_divergence = ikatura_saito_divergence  # corrected-spelling alias


def kl_divergence(mu, logvar):
    """Analytic KL(q(z|x) || N(0,I)) per sample: -0.5*sum(logvar - mu^2
    - exp(logvar)) (reference models.py:164-166, utils.py:68)."""
    return -0.5 * jnp.sum(logvar - mu**2 - jnp.exp(logvar), axis=-1)


def elbo(x, r, mu, logvar, eps):
    """Negative ELBO = batch-mean IS reconstruction + batch-mean analytic KL
    (reference utils.py:66-69). Returns (loss, recon, KL)."""
    recon = jnp.mean(ikatura_saito_divergence(r, x, eps))
    KL = jnp.mean(kl_divergence(mu, logvar))
    return recon + KL, recon, KL


def L_loss(x, r, mu, logvar, eps):
    """Per-sample labelled loss L(x,y) (reference utils.py:71-74)."""
    recon = ikatura_saito_divergence(r, x, eps)
    KL = kl_divergence(mu, logvar)
    return recon + KL, recon, KL


def U_loss(x, r, mu, logvar, y_hat_soft, eps):
    """Unlabelled semi-supervised loss U(x) with classifier entropy
    (reference utils.py:76-91)."""
    recon = ikatura_saito_divergence(r, x, eps)
    KL = kl_divergence(mu, logvar)
    L = recon + KL
    L = L.reshape(y_hat_soft.T.shape).T
    H = -y_hat_soft * jnp.log(y_hat_soft + eps) - (1 - y_hat_soft) * jnp.log(
        1 - y_hat_soft + eps
    )
    L_soft = jnp.sum(y_hat_soft * L, axis=-1)
    U = jnp.mean(L_soft - H[:, 0])
    return U, jnp.mean(L), jnp.mean(recon), jnp.mean(KL)


def binary_cross_entropy(r, x, eps):
    """Sum over bins, mean over batch (reference utils.py:55-56)."""
    return -jnp.mean(
        jnp.sum(
            x * jnp.log(r + eps) + (1 - x) * jnp.log(1 - r + eps), axis=-1
        )
    )


def binary_cross_entropy_logits(z, x, pos_weight=None):
    """Numerically stable BCE from logits: identical objective to
    :func:`binary_cross_entropy` applied to sigmoid(z) (up to the eps
    regularizer), with bounded gradients when sigmoids saturate. Sum over
    bins, mean over batch (the reference convention, utils.py:55-56).

    pos_weight: optional scalar multiplier on the positive-class term
    (torch BCEWithLogitsLoss pos_weight semantics) — class-balance lever
    for sparse-positive IBM targets. None = the reference's unweighted
    objective."""
    if pos_weight is None:
        per = jnp.maximum(z, 0.0) - z * x + jnp.log1p(jnp.exp(-jnp.abs(z)))
        return jnp.mean(jnp.sum(per, axis=-1))
    # -[w_p * x * log sig(z) + (1 - x) * log(1 - sig(z))] via softplus
    log_sig = -jnp.logaddexp(0.0, -z)
    log_1m = -jnp.logaddexp(0.0, z)
    per = -(pos_weight * x * log_sig + (1.0 - x) * log_1m)
    return jnp.mean(jnp.sum(per, axis=-1))


def binary_cross_entropy_2classes(r1, r2, x, eps):
    """Two-head BCE for the softmax classifier (reference utils.py:58-59)."""
    return -jnp.mean(
        jnp.sum(x * jnp.log(r1 + eps) + (1 - x) * jnp.log(r2 + eps), axis=-1)
    )


def mean_square_error_mask(y, y_hat):
    """Mask-domain MSE, summed over bins, mean over batch (reference
    utils.py:98-100) — the Wiener-filter DNN baseline loss."""
    return jnp.mean(jnp.sum((y - y_hat) ** 2, axis=-1))


def mean_square_error_signal(x, y, y_hat):
    """Signal-weighted mask MSE (reference utils.py:93-96)."""
    return jnp.mean(jnp.sum(((y - y_hat) * x) ** 2, axis=-1))


def magnitude_spectrum_approximation_loss(x, s, y_hat):
    """MSA loss |s - y_hat*x|^2 (reference utils.py:102-104)."""
    d = s - y_hat * x
    return jnp.mean(jnp.sum(jnp.real(d * jnp.conj(d)), axis=-1))


def f1_loss(y_hat_hard, y, epsilon=1e-8):
    """Accuracy/precision/recall/F1 from tp/tn/fp/fn over flattened binary
    predictions (reference utils.py:106-145)."""
    y_pred = y_hat_hard.astype(jnp.float32)
    y_true = y.astype(jnp.float32)
    tp = jnp.sum(y_true * y_pred)
    tn = jnp.sum((1 - y_true) * (1 - y_pred))
    fp = jnp.sum((1 - y_true) * y_pred)
    fn = jnp.sum(y_true * (1 - y_pred))
    accuracy = (tp + tn) / (tp + tn + fp + fn + epsilon)
    precision = tp / (tp + fp + epsilon)
    recall = tp / (tp + fn + epsilon)
    f1 = 2 * precision * recall / (precision + recall + epsilon)
    return accuracy, precision, recall, f1


def log_sum_exp(tensor, axis=-1, sum_op=jnp.sum):
    """Numerically stable LSE with a pluggable reduction (reference
    utils.py:44-53)."""
    m = jnp.max(tensor, axis=axis, keepdims=True)
    return (
        jnp.log(sum_op(jnp.exp(tensor - m), axis=axis, keepdims=True) + 1e-8)
        + m
    )


def enumerate_discrete(batch_size, y_dim):
    """All one-hot labels tiled over the batch: (y_dim*batch_size, y_dim)
    (reference utils.py:5-28)."""
    eye = jnp.eye(y_dim, dtype=jnp.float32)
    return jnp.repeat(eye, batch_size, axis=0)


def onehot(k, label):
    """1-of-k encoding (reference utils.py:30-42)."""
    return (jnp.arange(k) == label).astype(jnp.float32)
