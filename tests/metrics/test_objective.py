"""Objective-measure tests: identity optima, monotonic degradation with
noise, value-range sanity."""

import numpy as np
from guided_vae_nmf_tpu.metrics import seg_snr, fw_seg_snr, llr, wss

FS = 16000


def _speech(seed=0, seconds=1.5):
    rng = np.random.RandomState(seed)
    t = np.arange(int(FS * seconds)) / FS
    env = np.clip(np.sin(2 * np.pi * 2.5 * t), 0, None)
    x = env * (np.sin(2 * np.pi * 200 * t) + 0.4 * np.sin(2 * np.pi * 430 * t))
    return x + 0.005 * rng.randn(len(t))


def _noisy(x, level, seed=1):
    return x + level * np.std(x) * np.random.RandomState(seed).randn(len(x))


def test_seg_snr():
    x = _speech()
    assert seg_snr(x, x) == 35.0  # identity hits the per-frame ceiling
    a = seg_snr(x, _noisy(x, 0.1))
    b = seg_snr(x, _noisy(x, 1.0))
    assert a > b
    assert -10.0 <= b <= 35.0


def test_fw_seg_snr():
    x = _speech()
    ident = fw_seg_snr(x, x)
    assert ident > 30.0
    a = fw_seg_snr(x, _noisy(x, 0.1))
    b = fw_seg_snr(x, _noisy(x, 1.0))
    assert ident > a > b


def test_llr():
    x = _speech()
    assert llr(x, x) < 0.05  # identity: ratio ~1 -> log ~0
    a = llr(x, _noisy(x, 0.2))
    b = llr(x, _noisy(x, 2.0))
    assert b > a >= 0.0
    assert b <= 2.0  # outlier clamp


def test_wss():
    x = _speech()
    ident = wss(x, x)
    assert ident < 1e-6
    a = wss(x, _noisy(x, 0.2))
    b = wss(x, _noisy(x, 2.0))
    assert b > a > ident
