"""Dataset-shim tests (reference python/data.py API surface)."""

import numpy as np
import pytest
from numpy.testing import assert_array_equal

from guided_vae_nmf_tpu.data.datasets import (
    collate_fn,
    SpectrogramFrames,
    SpectrogramLabeledFrames,
    HDF5SpectrogramLabeledFrames,
)
from guided_vae_nmf_tpu.data import H5FrameWriter


def test_collate_fn_pads_with_minimum():
    a = np.arange(6, dtype=np.float32).reshape(2, 3) + 1
    b = np.arange(4, dtype=np.float32).reshape(2, 2) + 10
    out = collate_fn([a, b])
    assert out.shape == (2, 2, 3)
    assert_array_equal(out[0], a)
    # b padded with its per-array minimum
    assert out[1, 0, 2] == b.min()


def test_frame_datasets():
    data = np.arange(12, dtype=np.float32).reshape(3, 4)
    labels = (data > 5).astype(np.float32)
    ds = SpectrogramFrames(data)
    assert len(ds) == 4
    assert_array_equal(ds[1], data[:, 1])
    lds = SpectrogramLabeledFrames(data, labels)
    x, y = lds[2]
    assert_array_equal(x, data[:, 2])
    assert_array_equal(y, labels[:, 2])


def test_hdf5_dataset_lazy_and_picklable(tmp_path):
    import pickle

    path = str(tmp_path / "t.h5")
    rng = np.random.RandomState(0)
    X = rng.rand(5, 30).astype(np.float32)
    Y = (X > 0.5).astype(np.float32)
    with H5FrameWriter(path, "train", 5, 5, track_stats=False) as w:
        w.append(X, Y)
    ds = HDF5SpectrogramLabeledFrames(path, "train")
    assert len(ds) == 30
    x, y = ds[7]
    assert_array_equal(x, X[:, 7])
    assert_array_equal(y, Y[:, 7])
    # picklable before/after first access (worker-process contract)
    ds2 = pickle.loads(pickle.dumps(ds))
    x2, _ = ds2[3]
    assert_array_equal(x2, X[:, 3])
