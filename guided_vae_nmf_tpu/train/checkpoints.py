"""Checkpointing with the reference's externally-visible naming scheme plus
actual resume (a capability the reference lacks: it saves state_dicts every
epoch but never reloads them, SURVEY §5).

Files: `<model_dir>/<name>_epoch_{e:03d}_vloss_{v:.2f}.ckpt.npz` mirroring
the reference's `..._vloss_{v:.2f}.pt` convention
(scripts/training_M1.py:143-145); the flat npz maps dotted tree paths to
arrays. `save_resume_state` additionally persists the optimizer state and
epoch for restarts. Reference torch .pt checkpoints load through
models.torch_import.
"""

import os
import re
from glob import glob

import numpy as np
import jax
import jax.numpy as jnp


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}."))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}."))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _unflatten(flat):
    tree = {}
    for key, val in flat.items():
        parts = key.split(".")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val

    def fix(node):
        if isinstance(node, dict):
            keys = list(node.keys())
            if keys and all(re.fullmatch(r"\d+", k) for k in keys):
                return [fix(node[str(i)]) for i in range(len(keys))]
            return {k: fix(v) for k, v in node.items()}
        return jnp.asarray(node)

    return fix(tree)


def checkpoint_name(name, epoch, vloss):
    """The reference's per-epoch naming (training_M1.py:143-145)."""
    return f"{name}_epoch_{epoch:03d}_vloss_{vloss:.2f}"


def save_params(model_dir, name, epoch, vloss, params):
    os.makedirs(model_dir, exist_ok=True)
    path = os.path.join(
        model_dir, checkpoint_name(name, epoch, vloss) + ".ckpt.npz"
    )
    flat = _flatten(_strip_static(params))
    np.savez(path, **flat)
    return path


def load_params(path, static=None):
    """Load a params pytree; `static` re-attaches non-array leaves (e.g.
    {'batch_norm': False, 'y_dim': 513})."""
    with np.load(path) as data:
        flat = {k: data[k] for k in data.files}
    tree = _unflatten(flat)
    if static:
        tree.update(static)
    return tree


def _strip_static(params):
    if isinstance(params, dict):
        return {
            k: _strip_static(v)
            for k, v in params.items()
            if not isinstance(v, (bool, int, str, float)) or hasattr(v, "shape")
        }
    if isinstance(params, (list, tuple)):
        return [_strip_static(v) for v in params]
    return params


def best_checkpoint(model_dir, name=None):
    """Path of the lowest-vloss checkpoint in a model dir (the reference
    selects 'best' by hand-editing script constants; here it is automatic)."""
    pattern = os.path.join(model_dir, "*_vloss_*.ckpt.npz")
    best, best_v = None, float("inf")
    for path in glob(pattern):
        m = re.search(r"_epoch_(\d+)_vloss_([-\d.]+)\.ckpt\.npz$", path)
        if not m:
            continue
        if name is not None and not os.path.basename(path).startswith(name):
            continue
        v = float(m.group(2))
        if v < best_v:
            best, best_v = path, v
    return best


def save_resume_state(model_dir, epoch, params, opt_state, extra=None):
    """Persist full training state for resume (new capability)."""
    os.makedirs(model_dir, exist_ok=True)
    path = os.path.join(model_dir, "resume_state.npz")
    flat = {"__epoch": np.asarray(epoch)}
    flat.update({f"p.{k}": v for k, v in _flatten(_strip_static(params)).items()})
    leaves, treedef = jax.tree_util.tree_flatten(opt_state)
    for i, leaf in enumerate(leaves):
        flat[f"o.{i}"] = np.asarray(leaf)
    if extra:
        for k, v in extra.items():
            flat[f"x.{k}"] = np.asarray(v)
    np.savez(path, **flat)
    return path


def load_resume_state(model_dir, opt_state_template, static=None):
    """Restore (epoch, params, opt_state) from resume_state.npz; returns
    None when absent."""
    path = os.path.join(model_dir, "resume_state.npz")
    if not os.path.exists(path):
        return None
    with np.load(path) as data:
        flat = {k: data[k] for k in data.files}
    epoch = int(flat.pop("__epoch"))
    params = _unflatten(
        {k[2:]: v for k, v in flat.items() if k.startswith("p.")}
    )
    if static:
        params.update(static)
    leaves, treedef = jax.tree_util.tree_flatten(opt_state_template)
    new_leaves = [
        jnp.asarray(flat[f"o.{i}"]) for i in range(len(leaves))
    ]
    opt_state = jax.tree_util.tree_unflatten(treedef, new_leaves)
    return epoch, params, opt_state


def load_model(path_or_dir, kind="vae", y_dim=513):
    """Load model params from a .ckpt.npz, a reference torch .pt
    (models.torch_import), or — given a directory — its best (lowest
    vloss) checkpoint. `kind`: 'vae' | 'dgm' | 'classifier'."""
    path = path_or_dir
    if os.path.isdir(path):
        path = best_checkpoint(path)
        if path is None:
            raise FileNotFoundError(f"no checkpoints in {path_or_dir}")
    if path.endswith(".pt"):
        from ..models import import_classifier, import_dgm, import_vae

        if kind == "classifier":
            return import_classifier(path)
        if kind == "dgm":
            return import_dgm(path, y_dim)
        return import_vae(path)
    static = None
    if kind == "dgm":
        static = {"y_dim": y_dim}
    elif kind == "classifier":
        static = {"batch_norm": False}
    return load_params(path, static=static)


def load_norm_stats(model_dir):
    """trainset_mean.npy / trainset_std.npy side-cars (reference
    evaluate_M2_ibm.py:188-194); (None, None) when absent."""
    mean_p = os.path.join(model_dir, "trainset_mean.npy")
    std_p = os.path.join(model_dir, "trainset_std.npy")
    if os.path.exists(mean_p):
        return np.load(mean_p), np.load(std_p)
    return None, None


CLASSIFIER_META_DEFAULTS = {"features": "power", "threshold": 0.5}


def save_classifier_meta(model_dir, meta):
    """Persist the classifier's inference protocol next to its checkpoint:
    `classifier_meta.json` with at least {'features', 'threshold'} (plus
    training-provenance keys like pos_weight / label quantiles). The
    reference has no such side-car because its protocol is fixed (raw
    power, > 0.5, evaluate_M2_ibm.py:121-131); once features/threshold
    become levers they MUST travel with the model dir or inference
    silently mismatches training."""
    import json

    os.makedirs(model_dir, exist_ok=True)
    path = os.path.join(model_dir, "classifier_meta.json")
    with open(path, "w") as f:
        json.dump(meta, f, indent=1, sort_keys=True)
    return path


def load_classifier_meta(model_dir):
    """classifier_meta.json merged over the reference-protocol defaults
    ({'features': 'power', 'threshold': 0.5}) — absent file = a model
    trained under the reference protocol."""
    import json

    meta = dict(CLASSIFIER_META_DEFAULTS)
    path = os.path.join(model_dir, "classifier_meta.json")
    if os.path.exists(path):
        with open(path) as f:
            meta.update(json.load(f))
    return meta
