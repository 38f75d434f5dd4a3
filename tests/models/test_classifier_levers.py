"""Round-5 classifier quality levers (VERDICT item 2): weighted BCE,
log-power input features, calibrated decision threshold — each defaulting
to exact reference-protocol behavior (training_classifier.py raw power,
unweighted BCE; evaluate_M2_ibm.py:121-131 hard > 0.5) and persisted via
the classifier_meta.json side-car so inference always matches training."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from guided_vae_nmf_tpu.models import (
    FEATURE_MODES,
    binary_cross_entropy_logits,
    classifier_apply,
    classifier_features,
    classifier_init,
)
from guided_vae_nmf_tpu.train import (
    TrainConfig,
    calibrate_threshold,
    load_classifier_meta,
    train_classifier,
)

KEY = jax.random.PRNGKey(0)


def test_bce_pos_weight_one_matches_unweighted():
    rng = np.random.RandomState(0)
    z = jnp.asarray(rng.randn(16, 9).astype(np.float32) * 3)
    y = jnp.asarray((rng.rand(16, 9) > 0.7).astype(np.float32))
    base = float(binary_cross_entropy_logits(z, y))
    w1 = float(binary_cross_entropy_logits(z, y, pos_weight=1.0))
    assert np.isclose(base, w1, rtol=1e-6)


def test_bce_pos_weight_upweights_positive_term():
    # all-positive targets with negative logits: pure positive-class loss,
    # so pos_weight=2 must exactly double it
    z = jnp.full((4, 5), -2.0)
    y = jnp.ones((4, 5))
    l1 = float(binary_cross_entropy_logits(z, y, pos_weight=1.0))
    l2 = float(binary_cross_entropy_logits(z, y, pos_weight=2.0))
    assert np.isclose(l2, 2 * l1, rtol=1e-6)
    # all-negative targets: the positive term is inactive -> no effect
    y0 = jnp.zeros((4, 5))
    assert np.isclose(
        float(binary_cross_entropy_logits(z, y0, pos_weight=1.0)),
        float(binary_cross_entropy_logits(z, y0, pos_weight=5.0)),
        rtol=1e-6)


def test_classifier_features_modes():
    x_np = np.abs(np.random.RandomState(1).randn(6, 4)).astype(np.float32)
    assert classifier_features(x_np, "power") is x_np
    lg = classifier_features(x_np, "log-power")
    assert isinstance(lg, np.ndarray)
    np.testing.assert_allclose(lg, np.log(x_np + 1e-10), rtol=1e-6)
    # jax path (as traced inside the device label program)
    lg_j = classifier_features(jnp.asarray(x_np), "log-power")
    np.testing.assert_allclose(np.asarray(lg_j), lg, rtol=1e-5)
    with pytest.raises(ValueError):
        classifier_features(x_np, "mel")
    assert FEATURE_MODES == ("power", "log-power")


def test_calibrate_threshold_recovers_separation():
    """A classifier whose soft outputs perfectly separate at 0.65 must
    calibrate to the grid point with maximal F1 (0.65), not 0.5."""

    class Fake(dict):
        pass

    # monkeypatch-free: build labels from a known soft output by inverting
    # through a real (random) classifier
    cls = classifier_init(KEY, [8, [16], 3])
    X = np.random.RandomState(2).rand(512, 8).astype(np.float32)
    y_soft = np.asarray(classifier_apply(cls, jnp.asarray(X)))
    Y = (y_soft > 0.65).astype(np.float32)
    thr, f1 = calibrate_threshold(cls, X, Y)
    assert f1 == pytest.approx(1.0)
    # any grid point in (0.65, min positive soft] is perfect; it must at
    # least beat 0.5 semantics, i.e. sit strictly above 0.6
    assert thr > 0.6


def test_train_classifier_writes_meta_and_calibrates(tmp_path):
    rng = np.random.RandomState(3)
    X = rng.rand(96, 8).astype(np.float32)
    Y = (rng.rand(96, 4) > 0.8).astype(np.float32)
    mdir = str(tmp_path / "cls")
    train_classifier((X, Y), (X, Y), dims=(8, (8,), 4),
                     cfg=TrainConfig(end_epoch=2, batch_size=32),
                     model_dir=mdir, features="log-power", pos_weight=3.0,
                     calibrate=True,
                     meta_extra={"label_quantile": [0.98, 0.999]})
    meta = load_classifier_meta(mdir)
    assert meta["features"] == "log-power"
    assert meta["pos_weight"] == 3.0
    assert 0.05 <= meta["threshold"] <= 0.95
    assert "valid_f1" in meta
    assert meta["label_quantile"] == [0.98, 0.999]


def test_meta_defaults_when_absent(tmp_path):
    meta = load_classifier_meta(str(tmp_path))
    assert meta == {"features": "power", "threshold": 0.5}


def test_train_classifier_rejects_unknown_features(tmp_path):
    X = np.zeros((8, 4), np.float32)
    with pytest.raises(ValueError):
        train_classifier((X, X), (X, X), dims=(4, (4,), 4),
                         model_dir=str(tmp_path / "x"), features="mel")
