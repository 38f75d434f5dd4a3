"""Training loops for the four model families.

Capability parity with reference scripts/training_M1.py, training_M2.py,
training_classifier.py, training_wiener_filter.py: Adam(lr 1e-3, betas
(0.9, 0.999)), batch 128, IS-divergence ELBO for M1/M2, BCE (+running F1)
for the classifier, mask-MSE for the Wiener DNN, per-epoch validation,
output_batch.log / output_epoch.log appends, per-epoch checkpoints named
`{name}_epoch_{e:03d}_vloss_{v:.2f}` — plus resume, which the reference
lacks (SURVEY §5).

TPU-first: one jitted train step per model family; with a Mesh the step is
data-parallel — parameters replicated, the frame batch sharded over the
`data` axis, gradient psums inserted by XLA from the sharding annotations
(replacing the reference's single-GPU training + DataLoader workers, P2 in
SURVEY §2.7).
"""

import os
import time
from dataclasses import dataclass
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
import optax

from ..models import (
    vae_init,
    vae_apply,
    dgm_init,
    dgm_apply,
    classifier_init,
    classifier_apply,
    elbo,
    binary_cross_entropy_logits,
    mean_square_error_mask,
)
from ..data.h5io import frame_batches
from ..parallel.mesh import batch_sharding, replicated
from .checkpoints import save_params, save_resume_state, load_resume_state


@dataclass(frozen=True)
class TrainConfig:
    """Optimizer/loop settings (reference training_M1.py:26-41)."""

    batch_size: int = 128
    learning_rate: float = 1e-3
    beta1: float = 0.9
    beta2: float = 0.999
    eps: float = 1e-8
    start_epoch: int = 1
    end_epoch: int = 200
    seed: int = 0


def make_optimizer(cfg: TrainConfig):
    return optax.adam(cfg.learning_rate, b1=cfg.beta1, b2=cfg.beta2)


# ---------------------------------------------------------------------------
# Per-family losses: (params, batch, key, eps) -> (loss, aux)
# ---------------------------------------------------------------------------


def m1_loss(params, batch, key, eps):
    x, _ = batch
    r, mu, logvar = vae_apply(params, x, key)
    loss, recon, KL = elbo(x, r, mu, logvar, eps)
    return loss, {"recon": recon, "KL": KL}


def m2_loss(params, batch, key, eps):
    x, y = batch
    r, mu, logvar = dgm_apply(params, x, y, key)
    loss, recon, KL = elbo(x, r, mu, logvar, eps)
    return loss, {"recon": recon, "KL": KL}


def classifier_loss(params, batch, key, eps, pos_weight=None):
    x, y = batch
    from ..models.nets import classifier_apply_logits

    z = classifier_apply_logits(params, x)
    # stable logits-form BCE == the reference's sigmoid+log objective;
    # pos_weight (None = reference parity) up-weights the sparse positive
    # bins of a 0.98-quantile IBM target (class-balance lever)
    loss = binary_cross_entropy_logits(z, y, pos_weight)
    y_hard = (z > 0.0).astype(jnp.float32)
    aux = {
        "tp": jnp.sum(y * y_hard),
        "tn": jnp.sum((1 - y) * (1 - y_hard)),
        "fp": jnp.sum((1 - y) * y_hard),
        "fn": jnp.sum(y * (1 - y_hard)),
    }
    return loss, aux


def wiener_loss(params, batch, key, eps):
    x, y = batch
    y_hat = classifier_apply(params, x)
    return mean_square_error_mask(y, y_hat), {}


LOSSES = {
    "m1": m1_loss,
    "m2": m2_loss,
    "classifier": classifier_loss,
    "wiener": wiener_loss,
}


# ---------------------------------------------------------------------------
# Jitted steps
# ---------------------------------------------------------------------------


def make_train_step(loss_fn, optimizer, eps, mesh=None):
    def step(params, opt_state, batch, key):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, key, eps
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, aux

    if mesh is None:
        return jax.jit(step)
    rep = replicated(mesh)
    data = batch_sharding(mesh)
    return jax.jit(
        step,
        in_shardings=(rep, rep, (data, data), rep),
        out_shardings=(rep, rep, rep, rep),
    )


def make_eval_step(loss_fn, eps, mesh=None):
    def step(params, batch, key):
        return loss_fn(params, batch, key, eps)

    if mesh is None:
        return jax.jit(step)
    rep = replicated(mesh)
    data = batch_sharding(mesh)
    return jax.jit(step, in_shardings=(rep, (data, data), rep),
                   out_shardings=(rep, rep))


def make_epoch_steps(loss_fn, optimizer, eps, has_y, mesh=None):
    """Whole-epoch device programs (the fit path).

    The reference loops Python over ~70 tiny batches per epoch with a
    host sync on every `loss.item()` (training_M2.py:110-122); at these
    model sizes that is pure dispatch overhead — measured 37x slower than
    torch-CPU over a remote device link. Here the frame arrays live on
    device across the whole run and each epoch is ONE compiled program:
    `lax.scan` over the shuffled batch index matrix carrying
    (params, opt_state). Only the epoch-mean loss returns to the host.

    With a mesh, each scanned batch is constrained to shard over the
    `data` axis (frames replicated in HBM, compute split, gradient psums
    induced by the constraint) — the parameters stay replicated.
    """
    constrain = (lambda b: b)
    if mesh is not None:
        def constrain(b):
            return jax.lax.with_sharding_constraint(
                b, batch_sharding(mesh, ndim=b.ndim))

    def train_epoch(tparams, opt_state, X, Y, perm, key):
        keys = jax.random.split(key, perm.shape[0])

        def body(carry, inp):
            tp, os_ = carry
            idx, k = inp
            batch = (constrain(X[idx]),
                     constrain(Y[idx]) if has_y else None)
            (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                tp, batch, k, eps
            )
            updates, os2 = optimizer.update(grads, os_, tp)
            return (optax.apply_updates(tp, updates), os2), loss

        (tparams, opt_state), losses = lax.scan(
            body, (tparams, opt_state), (perm, keys)
        )
        return tparams, opt_state, jnp.mean(losses)

    def eval_epoch(tparams, X, Y, idx, key):
        keys = jax.random.split(key, idx.shape[0])

        def body(_, inp):
            i, k = inp
            batch = (constrain(X[i]), constrain(Y[i]) if has_y else None)
            return None, loss_fn(tparams, batch, k, eps)

        _, (losses, auxs) = lax.scan(body, None, (idx, keys))
        return jnp.mean(losses), jax.tree.map(jnp.sum, auxs)

    # NOTE: no buffer donation on (tparams, opt_state) — the async
    # checkpoint saver may still be reading epoch N's arrays while epoch
    # N+1 executes, and the trees are ~1 MB (copies are free at this size)
    return jax.jit(train_epoch), jax.jit(eval_epoch)


# ---------------------------------------------------------------------------
# Generic fit loop
# ---------------------------------------------------------------------------


def _log(path, msg):
    with open(path, "a") as f:
        print(msg, file=f)


def fit(params, family, train_data, valid_data, cfg: TrainConfig, model_dir,
        name, mesh=None, resume=False, verbose=False, loss_fn=None):
    """Train `params` of a model `family` on in-memory (frames, bins) arrays.

    train_data/valid_data: (X, Y) with X (n_frames, x_dim) float32 and Y
    (n_frames, y_dim) or None (M1). `loss_fn` overrides the family's
    default objective (same signature) — e.g. a pos_weighted classifier
    BCE. Returns (params, history).
    """
    from ..utils import device_warmup

    device_warmup()
    os.makedirs(model_dir, exist_ok=True)
    loss_fn = loss_fn or LOSSES[family]
    optimizer = make_optimizer(cfg)
    opt_state = optimizer.init(_trainable(params))
    train_step = make_train_step(
        lambda p, b, k, e: loss_fn(_merge(params, p), b, k, e),
        optimizer, cfg.eps, mesh,
    )
    eval_step = make_eval_step(
        lambda p, b, k, e: loss_fn(_merge(params, p), b, k, e), cfg.eps, mesh
    )

    start_epoch = cfg.start_epoch
    tparams = _trainable(params)
    if resume:
        restored = load_resume_state(model_dir, opt_state)
        if restored is not None:
            start_epoch, tparams, opt_state = restored
            start_epoch += 1

    batch_log = os.path.join(model_dir, "output_batch.log")
    epoch_log = os.path.join(model_dir, "output_epoch.log")
    rng = np.random.RandomState(cfg.seed)
    key = jax.random.PRNGKey(cfg.seed)

    # streaming mode: train_data is an H5StreamSource (beyond-HBM sets) —
    # chunks flow through the same epoch-scan program with double-buffered
    # host reads (data/h5io.py)
    use_stream = hasattr(train_data, "epoch_chunks")
    if use_stream:
        source = train_data
        if source.chunk_frames % cfg.batch_size:
            raise ValueError("chunk_frames must be a multiple of "
                             "batch_size for the streaming trainer")
        Xtr, Ytr = None, (object() if source.y_dim else None)
    else:
        Xtr, Ytr = train_data
    Xva, Yva = valid_data
    # epoch-as-scan needs at least one full batch; with a mesh the batch
    # must also split evenly over the data axis
    use_epoch_scan = use_stream or (
        len(Xtr) >= cfg.batch_size and (
            mesh is None or cfg.batch_size % mesh.shape["data"] == 0))
    if use_epoch_scan:
        train_ep, eval_ep = make_epoch_steps(
            lambda p, b, k, e: loss_fn(_merge(params, p), b, k, e),
            optimizer, cfg.eps, has_y=Ytr is not None, mesh=mesh,
        )
        if not use_stream:
            X_tr_d = jnp.asarray(Xtr)
            Y_tr_d = None if Ytr is None else jnp.asarray(Ytr)
            nb_tr = len(Xtr) // cfg.batch_size
        else:
            nb_chunk = source.chunk_frames // cfg.batch_size
        X_va_d = jnp.asarray(Xva)
        Y_va_d = None if Yva is None else jnp.asarray(Yva)
        nb_va = max(len(Xva) // cfg.batch_size, 1)
        bs_va = min(cfg.batch_size, len(Xva))
        # empty validation set: scanning a zero-row batch would make
        # jnp.mean return NaN and poison best-checkpoint selection
        has_valid = bs_va > 0
        idx_va = jnp.asarray(
            np.arange(nb_va * bs_va, dtype=np.int32).reshape(nb_va, bs_va))

    # checkpoint writes (param fetch + npz) run off the critical path on a
    # single saver thread — ~1.5 s/epoch over a remote device link
    # otherwise dominates the 0.2 s epoch-scan epochs
    from concurrent.futures import ThreadPoolExecutor

    saver = ThreadPoolExecutor(max_workers=1)
    save_futs = []
    # stream H2D lookahead; shut down with `saver` (a per-fit() leak
    # otherwise), and only needed on the streaming path
    xfer_pool = ThreadPoolExecutor(max_workers=1) if use_stream else None

    history = []
    for epoch in range(start_epoch, cfg.end_epoch + 1):
        t0 = time.time()
        if use_stream:
            key, k_va = jax.random.split(key)
            chunk_losses = []
            # triple pipeline: the source's reader thread loads chunk
            # i+2 from H5 while the transfer thread device_puts chunk
            # i+1 and the device runs chunk i's epoch-scan. Chunks
            # arrive unshuffled; the shuffled batch index matrix
            # shuffles within-chunk ON DEVICE (no host gather copy); no
            # host sync until the epoch-mean float() at the end.
            def put(c):
                X_c, Y_c = c
                return (jnp.asarray(X_c),
                        None if Ytr is None else jnp.asarray(Y_c),
                        len(X_c))

            chunks = source.epoch_chunks(epoch)
            first = next(chunks, None)
            fut = None if first is None else xfer_pool.submit(put, first)
            while fut is not None:
                X_d, Y_d, n_c = fut.result()
                nxt = next(chunks, None)
                fut = None if nxt is None else xfer_pool.submit(put, nxt)
                key, k_tr = jax.random.split(key)
                idx = np.arange(n_c)
                rng.shuffle(idx)
                perm = jnp.asarray(
                    idx[: nb_chunk * cfg.batch_size].astype(np.int32)
                    .reshape(nb_chunk, cfg.batch_size))
                tparams, opt_state, l_d = train_ep(
                    tparams, opt_state, X_d, Y_d, perm, k_tr)
                chunk_losses.append(l_d)
            tr_loss = float(jnp.mean(jnp.stack(chunk_losses)))
            if has_valid:
                va_loss_d, aux_sums = eval_ep(
                    tparams, X_va_d, Y_va_d, idx_va, k_va)
                va_loss = float(va_loss_d)
                agg = {k: float(v) for k, v in aux_sums.items()}
            else:
                va_loss, agg = 0.0, {}
            _log(batch_log,
                 f"Epoch: {epoch} Train loss: {tr_loss:.6f} "
                 f"time: {time.time() - t0:.2f}s")
        elif use_epoch_scan:
            idx = np.arange(len(Xtr))
            rng.shuffle(idx)
            perm = jnp.asarray(
                idx[: nb_tr * cfg.batch_size].astype(np.int32).reshape(
                    nb_tr, cfg.batch_size))
            key, k_tr, k_va = jax.random.split(key, 3)
            tparams, opt_state, tr_loss_d = train_ep(
                tparams, opt_state, X_tr_d, Y_tr_d, perm, k_tr)
            tr_loss = float(tr_loss_d)
            if has_valid:
                va_loss_d, aux_sums = eval_ep(
                    tparams, X_va_d, Y_va_d, idx_va, k_va)
                va_loss = float(va_loss_d)
                agg = {k: float(v) for k, v in aux_sums.items()}
            else:
                va_loss, agg = 0.0, {}
            _log(batch_log,
                 f"Epoch: {epoch} Train loss: {tr_loss:.6f} "
                 f"time: {time.time() - t0:.2f}s")
        else:
            tr_loss, n_batches = 0.0, 0
            for xb, yb in frame_batches(Xtr, Ytr, cfg.batch_size, key=rng):
                key, sub = jax.random.split(key)
                batch = (jnp.asarray(xb),
                         None if yb is None else jnp.asarray(yb))
                tparams, opt_state, loss, aux = train_step(
                    tparams, opt_state, batch, sub
                )
                tr_loss += float(loss)
                n_batches += 1
            tr_loss /= max(n_batches, 1)
            _log(batch_log,
                 f"Epoch: {epoch} Train loss: {tr_loss:.6f} "
                 f"time: {time.time() - t0:.2f}s")

            va_loss, n_batches = 0.0, 0
            agg = {}
            for xb, yb in frame_batches(Xva, Yva, cfg.batch_size):
                key, sub = jax.random.split(key)
                batch = (jnp.asarray(xb),
                         None if yb is None else jnp.asarray(yb))
                loss, aux = eval_step(tparams, batch, sub)
                va_loss += float(loss)
                for k, v in aux.items():
                    agg[k] = agg.get(k, 0.0) + float(v)
                n_batches += 1
            va_loss /= max(n_batches, 1)

        extra = ""
        if family == "classifier" and agg:
            tp, tn = agg.get("tp", 0), agg.get("tn", 0)
            fp, fn = agg.get("fp", 0), agg.get("fn", 0)
            f1 = 2 * tp / max(2 * tp + fp + fn, 1e-8)
            extra = f" F1: {f1:.4f}"
        _log(epoch_log,
             f"Epoch: {epoch} Train loss: {tr_loss:.6f} "
             f"Valid loss: {va_loss:.6f}{extra}")
        if verbose:
            print(f"[{name}] epoch {epoch}: train {tr_loss:.4f} "
                  f"valid {va_loss:.4f}{extra}")

        def _save(epoch=epoch, va_loss=va_loss, tparams=tparams,
                  opt_state=opt_state):
            save_params(model_dir, name, epoch, va_loss,
                        _merge(params, tparams))
            save_resume_state(model_dir, epoch, tparams, opt_state)

        # fail fast on saver errors (don't train for hours with no
        # checkpoints) and bound the queue so slow saves can't pin an
        # unbounded backlog of parameter copies
        save_futs.append(saver.submit(_save))
        while len(save_futs) > 4 or (save_futs and save_futs[0].done()):
            save_futs.pop(0).result()
        history.append({"epoch": epoch, "train": tr_loss, "valid": va_loss,
                        "time_s": time.time() - t0})

    for f in save_futs:
        f.result()  # surface saver exceptions
    saver.shutdown(wait=True)
    if xfer_pool is not None:
        xfer_pool.shutdown(wait=True)
    return _merge(params, tparams), history


def _trainable(params):
    """Drop static leaves (y_dim, batch_norm flags) for optax."""
    if isinstance(params, dict):
        return {
            k: _trainable(v)
            for k, v in params.items()
            if not isinstance(v, (bool, int, str, float))
        }
    if isinstance(params, (list, tuple)):
        return [_trainable(v) for v in params]
    return params


def _merge(full, trained):
    """Re-attach static leaves onto a trained subtree."""
    if isinstance(full, dict):
        out = {}
        for k, v in full.items():
            if isinstance(v, (bool, int, str, float)) and not hasattr(
                v, "shape"
            ):
                out[k] = v
            else:
                out[k] = _merge(v, trained[k])
        return out
    if isinstance(full, (list, tuple)):
        return [_merge(v, t) for v, t in zip(full, trained)]
    return trained


# ---------------------------------------------------------------------------
# Family-specific front doors (mirror the reference scripts)
# ---------------------------------------------------------------------------


def train_m1(train_frames, valid_frames, dims=(513, 32, (128, 128)),
             cfg=TrainConfig(), model_dir="models/M1", name="M1", mesh=None,
             resume=False, verbose=False):
    """M1 VAE on clean-speech frames (reference training_M1.py)."""
    x_dim, z_dim, h_dim = dims
    params = vae_init(jax.random.PRNGKey(cfg.seed), [x_dim, z_dim,
                                                     list(h_dim)])
    return fit(params, "m1", (train_frames, None), (valid_frames, None),
               cfg, model_dir, name, mesh, resume, verbose)


def train_m2(train_data, valid_data, dims=(513, 513, 32, (128, 128)),
             cfg=TrainConfig(), model_dir="models/M2", name="M2", mesh=None,
             resume=False, verbose=False):
    """Guided M2 on (noisy frames, oracle labels) (reference
    training_M2.py)."""
    x_dim, y_dim, z_dim, h_dim = dims
    params = dgm_init(jax.random.PRNGKey(cfg.seed),
                      [x_dim, y_dim, z_dim, list(h_dim)])
    return fit(params, "m2", train_data, valid_data, cfg, model_dir, name,
               mesh, resume, verbose)


def calibrate_threshold(params, X_valid, Y_valid, grid=None,
                        batch_frames=65536):
    """F1-maximizing hard-decision threshold on (already transformed and
    standardized) validation frames. Returns (threshold, f1_at_threshold).

    The reference hard-codes > 0.5 (evaluate_M2_ibm.py:121-131); on sparse
    0.98-quantile IBM targets the classifier's operating point sits well
    above it (measured peak F1 at ~0.7, VALIDATION.md round-4 sweep), so
    the calibrated value ships in classifier_meta.json as the model's
    default."""
    from ..models import classifier_apply

    if grid is None:
        grid = np.round(np.arange(0.05, 0.96, 0.05), 2)
    tp = np.zeros(len(grid))
    fp = np.zeros(len(grid))
    fn = np.zeros(len(grid))
    for i in range(0, len(X_valid), batch_frames):
        ys = np.asarray(classifier_apply(
            params, jnp.asarray(X_valid[i:i + batch_frames])))
        yt = np.asarray(Y_valid[i:i + batch_frames]) > 0.5
        for gi, t in enumerate(grid):
            yh = ys > t
            tp[gi] += np.sum(yh & yt)
            fp[gi] += np.sum(yh & ~yt)
            fn[gi] += np.sum(~yh & yt)
    f1 = 2 * tp / np.maximum(2 * tp + fp + fn, 1)
    best = int(np.argmax(f1))
    return float(grid[best]), float(f1[best])


def train_classifier(train_data, valid_data, dims=(513, (128, 128), 513),
                     cfg=TrainConfig(), model_dir="models/classifier",
                     name="Classifier", mean=None, std=None, mesh=None,
                     resume=False, verbose=False, features="power",
                     pos_weight=None, calibrate=False, meta_extra=None):
    """Supervised IBM/VAD classifier on standardized noisy frames (reference
    training_classifier.py; the H5 train mean/std are saved as
    trainset_mean.npy / trainset_std.npy side-cars, :97-108).

    Round-5 classifier levers (defaults = exact reference protocol):
      features   — declarative record of the input transform the CALLER
                   applied before standardization ('power' | 'log-power');
                   persisted to classifier_meta.json so inference matches.
      pos_weight — optional positive-class BCE weight (class balance).
      calibrate  — after training, sweep the hard-decision threshold on
                   the validation set with the BEST checkpoint and persist
                   the F1-maximizing value as the model's default.
    """
    from functools import partial

    from ..models.nets import FEATURE_MODES
    from .checkpoints import best_checkpoint, load_params, \
        save_classifier_meta

    if features not in FEATURE_MODES:
        raise ValueError(f"features must be one of {FEATURE_MODES}, "
                         f"got {features!r}")
    x_dim, h_dim, y_dim = dims
    params = classifier_init(jax.random.PRNGKey(cfg.seed),
                             [x_dim, list(h_dim), y_dim])
    if mean is not None:
        os.makedirs(model_dir, exist_ok=True)
        np.save(os.path.join(model_dir, "trainset_mean.npy"), mean)
        np.save(os.path.join(model_dir, "trainset_std.npy"), std)
    loss_fn = None
    if pos_weight is not None:
        loss_fn = partial(classifier_loss, pos_weight=float(pos_weight))
    out = fit(params, "classifier", train_data, valid_data, cfg, model_dir,
              name, mesh, resume, verbose, loss_fn=loss_fn)

    meta = {"features": features, "threshold": 0.5,
            "pos_weight": pos_weight}
    if calibrate:
        best = best_checkpoint(model_dir)
        p_best = load_params(best) if best else out[0]
        Xva, Yva = valid_data
        thr, f1 = calibrate_threshold(p_best, np.asarray(Xva),
                                      np.asarray(Yva))
        meta.update(threshold=thr, valid_f1=round(f1, 4))
    meta.update(meta_extra or {})
    save_classifier_meta(model_dir, meta)
    return out


def train_wiener(train_data, valid_data, dims=(513, (128,) * 5, 513),
                 cfg=TrainConfig(), model_dir="models/wiener", name="Wiener",
                 mean=None, std=None, mesh=None, resume=False,
                 verbose=False):
    """Wiener-mask DNN baseline (reference training_wiener_filter.py:45:
    5x128 hidden, mask-MSE loss)."""
    x_dim, h_dim, y_dim = dims
    params = classifier_init(jax.random.PRNGKey(cfg.seed),
                             [x_dim, list(h_dim), y_dim])
    if mean is not None:
        os.makedirs(model_dir, exist_ok=True)
        np.save(os.path.join(model_dir, "trainset_mean.npy"), mean)
        np.save(os.path.join(model_dir, "trainset_std.npy"), std)
    return fit(params, "wiener", train_data, valid_data, cfg, model_dir,
               name, mesh, resume, verbose)
