"""Drift-pin regression tests for the reimplemented metrics.

These are NOT conformance goldens: the pinned values were computed from
the implementation under test and guard against silent drift only.

The canonical implementations (pystoi, Hu & Loizou's MATLAB, the ITU pesq
wheel) are not importable in this environment. Correctness (as opposed to
drift) is covered by tests/metrics/test_crosscheck.py, which re-derives
every measure as a second, naive, loop-level implementation straight from
the papers and matches the library to ~1e-9; cross-implementation deltas
against the canonical packages are measured by scripts/validate_stoi.py /
scripts/validate_pesq.py wherever those are importable.
"""

import glob
import os

import numpy as np
import pytest

from conftest import has_reference_data
from guided_vae_nmf_tpu.data import read_wav
from guided_vae_nmf_tpu.metrics.stoi import stoi
from guided_vae_nmf_tpu.metrics.objective import fw_seg_snr, llr, wss

FS = 16000
SUBSET_GLOB = ("/root/reference/data/subset/processed/CSR-1-WSJ-0/"
               "**/*_x.wav")

# utterance -> (ESTOI, STOI, fwSegSNR, LLR, WSS) of mixture vs clean
SUBSET_PINS = {
    "050a050a": (0.7330106523, 0.8168327042, 14.99883784, 0.18524091,
                 8.10828785),
    "050a050b": (0.8976870277, 0.9564697260, 26.11447080, 0.05931375,
                 8.49088158),
    "050a050c": (0.8236021487, 0.8994163412, 18.64144307, 0.10127794,
                 6.92984630),
}


def _synthetic_pair():
    rng = np.random.RandomState(7)
    n = 3 * FS
    t = np.arange(n) / FS
    x = np.sin(2 * np.pi * np.cumsum(
        150 + 50 * np.sin(2 * np.pi * 0.7 * t)) / FS)
    x *= np.clip(np.sin(2 * np.pi * 2.1 * t), 0, None)
    noise = rng.randn(n) * np.sqrt(np.mean(x ** 2)) * 10 ** (-5 / 20)
    return x, x + noise


def test_stoi_synthetic_pins():
    x, y = _synthetic_pair()
    assert stoi(x, y, FS) == pytest.approx(0.2280849027, abs=1e-8)
    assert stoi(x, y, FS, extended=True) == pytest.approx(
        0.1575051002, abs=1e-8)


@pytest.mark.skipif(not has_reference_data(),
                    reason="reference subset absent")
def test_subset_mixture_pins():
    bases = {
        os.path.basename(p)[:-6]: p[:-6]
        for p in glob.glob(SUBSET_GLOB, recursive=True)
    }
    checked = 0
    for utt, (g_estoi, g_stoi, g_fw, g_llr, g_wss) in SUBSET_PINS.items():
        if utt not in bases:
            continue
        b = bases[utt]
        s, _ = read_wav(b + "_s.wav")
        x, _ = read_wav(b + "_x.wav")
        m = min(len(s), len(x))
        s, x = s[:m], x[:m]
        assert stoi(s, x, FS, extended=True) == pytest.approx(
            g_estoi, abs=1e-6), utt
        assert stoi(s, x, FS) == pytest.approx(g_stoi, abs=1e-6), utt
        assert fw_seg_snr(s, x, FS) == pytest.approx(g_fw, abs=1e-4), utt
        assert llr(s, x, FS) == pytest.approx(g_llr, abs=1e-5), utt
        assert wss(s, x, FS) == pytest.approx(g_wss, abs=1e-4), utt
        checked += 1
    assert checked == len(SUBSET_PINS)
