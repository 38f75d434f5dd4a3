"""Shared helpers for the evaluation/reconstruction scripts."""

import os
import sys

import numpy as np

from guided_vae_nmf_tpu.train import best_checkpoint, load_params
from guided_vae_nmf_tpu.models import import_vae, import_dgm, import_classifier


def load_model(path_or_dir, kind="vae", y_dim=513):
    """Load a model from a .ckpt.npz, a reference torch .pt, or pick the
    best checkpoint in a directory."""
    path = path_or_dir
    if os.path.isdir(path):
        path = best_checkpoint(path)
        if path is None:
            raise FileNotFoundError(
                f"no checkpoints in {path_or_dir}"
            )
    if path.endswith(".pt"):
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
    evaluate_M2_ibm.py:188-194)."""
    mean_p = os.path.join(model_dir, "trainset_mean.npy")
    std_p = os.path.join(model_dir, "trainset_std.npy")
    if os.path.exists(mean_p):
        return np.load(mean_p), np.load(std_p)
    return None, None


def flag(rest, name, default=None, cast=str):
    if "--help" in rest or "-h" in rest:
        # Uniform help surface for the flag()-parsed aux CLIs (the
        # apply_overrides-parsed reference CLIs handle --help in
        # config.apply_overrides the same way).
        main_mod = sys.modules.get("__main__")
        doc = (getattr(main_mod, "__doc__", None) or "").strip()
        print(doc or "usage: see --flags in the script source")
        raise SystemExit(0)
    key = f"--{name}"
    if key in rest:
        return cast(rest[rest.index(key) + 1])
    return default
