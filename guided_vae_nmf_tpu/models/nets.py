"""Model layer: frame-wise FFNN families as pure init/apply pairs.

Capability parity with reference python/models/models.py:8-217 —
GaussianSample reparametrization, tanh Encoder/Decoder, the M1
`VariationalAutoencoder`, the guided M2 `DeepGenerativeModel` (Kingma M2:
label-concatenated encoder/decoder), and the supervised `Classifier` (ReLU
hidden, sigmoid output, optional BatchNorm) plus its 2-class softmax variant.

TPU-first design: parameters are pytrees of `jnp` arrays (Linear weights
stored (in, out) so `apply` is `x @ w + b` — a clean MXU matmul over a
(batch, features) activation), all apply functions are pure/jittable, and
stochastic nodes take explicit PRNG keys.
"""

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Linear / MLP primitives
# ---------------------------------------------------------------------------


def linear_init(key, n_in, n_out, dtype=jnp.float32):
    """Xavier-normal weights (gain 1), zero bias — the reference's init for
    every Linear (models.py:136-140)."""
    std = np.sqrt(2.0 / (n_in + n_out))
    w = std * jax.random.normal(key, (n_in, n_out), dtype)
    return {"w": w, "b": jnp.zeros((n_out,), dtype)}


def linear_apply(p, x):
    return x @ p["w"] + p["b"]


def _mlp_init(key, sizes):
    keys = jax.random.split(key, len(sizes) - 1)
    return [
        linear_init(k, sizes[i], sizes[i + 1]) for i, k in enumerate(keys)
    ]


# ---------------------------------------------------------------------------
# Encoder / Decoder / GaussianSample
# ---------------------------------------------------------------------------


def encoder_init(key, x_dim, h_dim, z_dim):
    """Encoder = tanh MLP -> parallel mu / log_var heads (GaussianSample,
    reference models.py:24-38,90-104)."""
    k_h, k_mu, k_lv = jax.random.split(key, 3)
    return {
        "hidden": _mlp_init(k_h, [x_dim, *h_dim]),
        "mu": linear_init(k_mu, h_dim[-1], z_dim),
        "log_var": linear_init(k_lv, h_dim[-1], z_dim),
    }


def encoder_apply(params, x, key=None):
    """Returns (z, mu, log_var). With key=None, z = mu (the posterior mean —
    what the reference's `_, Z, _ = vae.encoder(x)` destructuring yields is a
    sample; MCEM init uses the middle element, the mean)."""
    h = x
    for layer in params["hidden"]:
        h = jnp.tanh(linear_apply(layer, h))
    mu = linear_apply(params["mu"], h)
    log_var = linear_apply(params["log_var"], h)
    if key is None:
        z = mu
    else:
        z = reparametrize(key, mu, log_var)
    return z, mu, log_var


def reparametrize(key, mu, log_var):
    """z = mu + exp(0.5*log_var) * eps (reference models.py:9-22)."""
    eps = jax.random.normal(key, mu.shape, mu.dtype)
    return mu + jnp.exp(0.5 * log_var) * eps


def decoder_init(key, z_dim, h_dim, x_dim):
    """Decoder = tanh MLP -> exp(Linear): outputs a positive variance/PSD,
    not a mean (reference models.py:107-121)."""
    k_h, k_out = jax.random.split(key)
    return {
        "hidden": _mlp_init(k_h, [z_dim, *h_dim]),
        "out": linear_init(k_out, h_dim[-1], x_dim),
    }


def decoder_apply(params, z):
    h = z
    for layer in params["hidden"]:
        h = jnp.tanh(linear_apply(layer, h))
    return jnp.exp(linear_apply(params["out"], h))


# ---------------------------------------------------------------------------
# M1: VariationalAutoencoder
# ---------------------------------------------------------------------------


def vae_init(key, dims):
    """dims = [x_dim, z_dim, h_dim]; decoder mirrors the encoder with the
    hidden stack reversed (reference models.py:124-140)."""
    x_dim, z_dim, h_dim = dims
    k_enc, k_dec = jax.random.split(key)
    return {
        "encoder": encoder_init(k_enc, x_dim, h_dim, z_dim),
        "decoder": decoder_init(k_dec, z_dim, list(reversed(h_dim)), x_dim),
    }


def vae_apply(params, x, key):
    """Forward pass -> (r, mu, log_var): sample z from q(z|x), decode to the
    variance r (reference models.py:171-178). KL is computed by the loss."""
    z, mu, log_var = encoder_apply(params["encoder"], x, key)
    r = decoder_apply(params["decoder"], z)
    return r, mu, log_var


def vae_sample(params, z):
    return decoder_apply(params["decoder"], z)


# ---------------------------------------------------------------------------
# M2: DeepGenerativeModel (guided VAE)
# ---------------------------------------------------------------------------


def dgm_init(key, dims):
    """dims = [x_dim, y_dim, z_dim, h_dim]; encoder sees cat[x, y], decoder
    sees cat[z, y] (Kingma M2, reference models.py:184-201)."""
    x_dim, y_dim, z_dim, h_dim = dims
    k_enc, k_dec = jax.random.split(key)
    return {
        "encoder": encoder_init(k_enc, x_dim + y_dim, h_dim, z_dim),
        "decoder": decoder_init(
            k_dec, z_dim + y_dim, list(reversed(h_dim)), x_dim
        ),
        "y_dim": y_dim,
    }


def dgm_apply(params, x, y, key):
    z, mu, log_var = encoder_apply(
        params["encoder"], jnp.concatenate([x, y], axis=-1), key
    )
    r = decoder_apply(
        params["decoder"], jnp.concatenate([z, y], axis=-1)
    )
    return r, mu, log_var


def dgm_sample(params, z, y):
    return decoder_apply(
        params["decoder"], jnp.concatenate([z, y.astype(z.dtype)], axis=-1)
    )


# ---------------------------------------------------------------------------
# Classifiers
# ---------------------------------------------------------------------------


def classifier_init(key, dims, batch_norm=False):
    """dims = [x_dim, h_dim, y_dim]; ReLU hidden layers, sigmoid output
    (reference models.py:41-62). With batch_norm, a BatchNorm1d follows each
    hidden Linear; its running stats live in the returned params under
    'bn' (inference uses the running stats, training updates them)."""
    x_dim, h_dim, y_dim = dims
    k_h, k_out = jax.random.split(key)
    params = {
        "hidden": _mlp_init(k_h, [x_dim, *h_dim]),
        "out": linear_init(k_out, h_dim[-1], y_dim),
        "batch_norm": batch_norm,
    }
    if batch_norm:
        params["bn"] = [
            {
                "scale": jnp.ones((h,)),
                "bias": jnp.zeros((h,)),
                "mean": jnp.zeros((h,)),
                "var": jnp.ones((h,)),
            }
            for h in h_dim
        ]
    return params


def _bn_apply(bn, h, train, momentum=0.1, eps=1e-5):
    if train:
        mean = jnp.mean(h, axis=0)
        var = jnp.var(h, axis=0)
        new_bn = {
            "scale": bn["scale"],
            "bias": bn["bias"],
            "mean": (1 - momentum) * bn["mean"] + momentum * mean,
            "var": (1 - momentum) * bn["var"] + momentum * var,
        }
    else:
        mean, var = bn["mean"], bn["var"]
        new_bn = bn
    h = (h - mean) / jnp.sqrt(var + eps) * bn["scale"] + bn["bias"]
    return h, new_bn


def classifier_apply(params, x, train=False):
    """Sigmoid-output classifier forward. Returns y (and, when batch_norm and
    train, updated params with fresh running stats)."""
    h = x
    new_bns = []
    # batch-norm presence is decided by tree STRUCTURE ('bn' subtree), not
    # the 'batch_norm' bool leaf: a bool leaf is traced under jit and
    # cannot drive Python control flow (the structure check is static)
    has_bn = "bn" in params
    for i, layer in enumerate(params["hidden"]):
        h = linear_apply(layer, h)
        if has_bn:
            h, nb = _bn_apply(params["bn"][i], h, train)
            new_bns.append(nb)
        h = jax.nn.relu(h)
    y = jax.nn.sigmoid(linear_apply(params["out"], h))
    if has_bn and train:
        return y, {**params, "bn": new_bns}
    return y


FEATURE_MODES = ("power", "log-power")


def classifier_features(x, features="power", eps=1e-10):
    """Input transform for the classifier/Wiener discriminators, applied
    BEFORE mean/std standardization.

    'power'     — raw |X|^2 frames, the reference protocol
                  (training_classifier.py:97-108 standardizes raw power).
    'log-power' — ln(|X|^2 + 1e-10): compresses the ~60 dB dynamic range
                  of a 513-bin power frame so standardization yields
                  O(1)-scale inputs in EVERY bin instead of being
                  dominated by the loudest bins (at-scale classifier
                  lever, VALIDATION.md round-5 ablation).

    Works on numpy arrays (host label path, training prep) and on jax
    arrays/tracers (device label path) alike; the mode is recorded in the
    model dir's classifier_meta.json so inference always matches training.
    """
    if features == "power":
        return x
    if features == "log-power":
        xp = jnp if isinstance(x, jnp.ndarray) else np
        return xp.log(x + eps)
    raise ValueError(
        f"unknown feature mode {features!r}; valid: {FEATURE_MODES}")


def classifier_apply_logits(params, x):
    """Pre-sigmoid logits — for the numerically stable training loss (the
    eps-form BCE's gradient blows up to 1/eps once sigmoids saturate)."""
    h = x
    for i, layer in enumerate(params["hidden"]):
        h = linear_apply(layer, h)
        if "bn" in params:  # static structure check (see classifier_apply)
            h, _ = _bn_apply(params["bn"][i], h, False)
        h = jax.nn.relu(h)
    return linear_apply(params["out"], h)


def classifier2_init(key, dims, batch_norm=False):
    """Two-class softmax-per-bin variant (reference models.py:64-88): output
    layer is 2*y_dim wide, reshaped to (batch, 2, y_dim) and softmaxed over
    the class axis."""
    x_dim, h_dim, y_dim = dims
    p = classifier_init(key, [x_dim, h_dim, 2 * y_dim], batch_norm)
    p["y_dim"] = y_dim
    return p


def classifier2_apply(params, x, train=False):
    h = x
    for i, layer in enumerate(params["hidden"]):
        h = linear_apply(layer, h)
        if "bn" in params:  # static structure check (see classifier_apply)
            h, _ = _bn_apply(params["bn"][i], h, train)
        h = jax.nn.relu(h)
    logits = linear_apply(params["out"], h)
    logits = logits.reshape(-1, 2, params["y_dim"])
    return jax.nn.softmax(logits, axis=1)


def count_parameters(params):
    """Total trainable parameter count (reference python/utils.py:7-8)."""
    leaves = jax.tree_util.tree_leaves(
        {k: v for k, v in params.items() if k not in ("batch_norm", "y_dim")}
        if isinstance(params, dict) else params
    )
    return sum(int(np.prod(l.shape)) for l in leaves if hasattr(l, "shape"))
