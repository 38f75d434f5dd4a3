"""Training-loop tests: loss decrease on the bundled subset frames,
checkpoint naming/side-cars, resume, and single-device vs data-parallel
mesh equivalence."""

import os
from glob import glob

import numpy as np
import jax
import pytest
from numpy.testing import assert_allclose

from conftest import REFERENCE_DATA, has_reference_data
from guided_vae_nmf_tpu.data import read_dataset
from guided_vae_nmf_tpu.models import vae_init, classifier_init
from guided_vae_nmf_tpu.train import (
    TrainConfig,
    train_m1,
    train_m2,
    train_classifier,
    train_wiener,
    make_optimizer,
    make_train_step,
    m1_loss,
    best_checkpoint,
    load_params,
)
from guided_vae_nmf_tpu.parallel import make_mesh


def _frames(n=512, bins=33, seed=0):
    rng = np.random.RandomState(seed)
    return (rng.rand(n, bins).astype(np.float32) + 0.05)


@pytest.mark.skipif(not has_reference_data(), reason="reference subset absent")
def test_train_m1_on_subset(tmp_path):
    Xtr = read_dataset(f"{REFERENCE_DATA}/pickle/", "train", "frames").T
    Xva = read_dataset(f"{REFERENCE_DATA}/pickle/", "validation", "frames").T
    cfg = TrainConfig(end_epoch=3, batch_size=128)
    params, hist = train_m1(
        Xtr, Xva, dims=(513, 16, (64,)), cfg=cfg,
        model_dir=str(tmp_path), name="M1",
    )
    assert hist[-1]["train"] < hist[0]["train"]
    # per-epoch checkpoints with the reference naming stem
    ckpts = sorted(glob(str(tmp_path / "M1_epoch_*_vloss_*.ckpt.npz")))
    assert len(ckpts) == 3
    assert os.path.exists(tmp_path / "output_epoch.log")
    assert os.path.exists(tmp_path / "output_batch.log")
    # best checkpoint loads back into a usable tree
    best = best_checkpoint(str(tmp_path))
    loaded = load_params(best)
    assert "encoder" in loaded and "decoder" in loaded


def test_train_m2_synthetic(tmp_path):
    X = _frames(384, 33)
    Y = (np.random.RandomState(1).rand(384, 33) > 0.5).astype(np.float32)
    cfg = TrainConfig(end_epoch=2, batch_size=64)
    params, hist = train_m2(
        (X, Y), (X, Y), dims=(33, 33, 8, (32,)), cfg=cfg,
        model_dir=str(tmp_path), name="M2",
    )
    assert np.isfinite(hist[-1]["valid"])
    assert hist[-1]["train"] < hist[0]["train"]


def test_train_classifier_and_sidecars(tmp_path):
    rng = np.random.RandomState(2)
    X = rng.rand(256, 20).astype(np.float32)
    Y = (X > 0.5).astype(np.float32)  # learnable mapping
    mean, std = X.mean(0, keepdims=True), X.std(0, keepdims=True)
    cfg = TrainConfig(end_epoch=3, batch_size=64)
    params, hist = train_classifier(
        (X, Y), (X, Y), dims=(20, (32,), 20), cfg=cfg,
        model_dir=str(tmp_path), name="Classifier", mean=mean, std=std,
    )
    assert hist[-1]["valid"] < hist[0]["valid"]
    assert os.path.exists(tmp_path / "trainset_mean.npy")
    assert os.path.exists(tmp_path / "trainset_std.npy")
    log = open(tmp_path / "output_epoch.log").read()
    assert "F1:" in log


def test_train_wiener(tmp_path):
    rng = np.random.RandomState(3)
    X = rng.rand(256, 20).astype(np.float32)
    Y = np.clip(X * 0.8, 0, 1).astype(np.float32)
    cfg = TrainConfig(end_epoch=2, batch_size=64)
    params, hist = train_wiener(
        (X, Y), (X, Y), dims=(20, (16, 16), 20), cfg=cfg,
        model_dir=str(tmp_path), name="Wiener",
    )
    assert hist[-1]["train"] < hist[0]["train"]


def test_resume_continues_from_saved_epoch(tmp_path):
    X = _frames(256, 20, 4)
    cfg = TrainConfig(end_epoch=2, batch_size=64)
    train_m1(X, X, dims=(20, 4, (16,)), cfg=cfg, model_dir=str(tmp_path),
             name="M1")
    cfg2 = TrainConfig(end_epoch=4, batch_size=64)
    params, hist = train_m1(X, X, dims=(20, 4, (16,)), cfg=cfg2,
                            model_dir=str(tmp_path), name="M1", resume=True)
    # resumed run only covers epochs 3..4
    assert [h["epoch"] for h in hist] == [3, 4]


def test_data_parallel_step_matches_single_device():
    """The mesh-sharded train step must produce the same parameters as the
    single-device step (same data, same key) — gradient psum correctness."""
    mesh = make_mesh(axis_names=("data",))
    assert mesh.devices.size == 8  # virtual CPU devices from conftest

    X = _frames(64, 24, 5)
    params = vae_init(jax.random.PRNGKey(0), [24, 4, [16]])
    cfg = TrainConfig()
    opt = make_optimizer(cfg)
    opt_state = opt.init(params)
    key = jax.random.PRNGKey(7)
    batch = (X, None)

    step_single = make_train_step(m1_loss, opt, cfg.eps, mesh=None)
    p1, _, loss1, _ = step_single(params, opt_state, batch, key)

    step_dp = make_train_step(m1_loss, opt, cfg.eps, mesh=mesh)
    p2, _, loss2, _ = step_dp(params, opt_state, batch, key)

    assert_allclose(float(loss1), float(loss2), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_epoch_scan_mesh_fit_matches_single_device(tmp_path):
    """fit() on a mesh (epoch-as-scan with data-axis sharding constraints)
    must track the single-device fit: same seeds -> same shuffles/keys, so
    histories agree up to reduction-order float noise."""
    from guided_vae_nmf_tpu.train import train_m2

    mesh = make_mesh(axis_names=("data",))
    X = _frames(256, 20, 3)
    Y = (X > np.median(X)).astype(np.float32)
    cfg = TrainConfig(end_epoch=3, batch_size=64)
    _, h1 = train_m2((X, Y), (X, Y), dims=(20, 20, 4, (16,)), cfg=cfg,
                     model_dir=str(tmp_path / "single"), name="M2")
    _, h2 = train_m2((X, Y), (X, Y), dims=(20, 20, 4, (16,)), cfg=cfg,
                     model_dir=str(tmp_path / "mesh"), name="M2",
                     mesh=mesh)
    for a, b in zip(h1, h2):
        assert_allclose(a["train"], b["train"], rtol=1e-4)
        assert_allclose(a["valid"], b["valid"], rtol=1e-4)
