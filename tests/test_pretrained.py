"""Quality regression test against the shipped pretrained checkpoints
(artifacts/pretrained/, trained on the bundled subset — see README): the
full M2-IBM oracle-guided MCEM pipeline must IMPROVE SI-SDR on every
subset test mixture and by a clear margin on the matched-speaker one.

The test synthesizes its mixtures deterministically (seeded noise bank +
seeded SNR draws), so no audio fixtures are stored.
"""

import os

import numpy as np
import pytest
from scipy.signal import lfilter

from conftest import REFERENCE_DATA, has_reference_data
from guided_vae_nmf_tpu.data import (
    create_test_mixtures,
    read_wav,
    speech_list,
)
from guided_vae_nmf_tpu.train.checkpoints import best_checkpoint, load_params
from guided_vae_nmf_tpu.mcem import MCEMConfig
from guided_vae_nmf_tpu.pipeline import enhance_files, enhance_files_wiener
from guided_vae_nmf_tpu.metrics import energy_ratios

FS = 16000
ART = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "artifacts", "pretrained")

pytestmark = pytest.mark.skipif(
    not (has_reference_data() and os.path.isdir(ART)),
    reason="subset or pretrained artifacts absent",
)


def _noise_bank():
    def make(seed, kind):
        r = np.random.RandomState(seed)
        n = r.randn(FS * 60)
        if kind == "lowpass":
            n = lfilter([1], [1, -0.9], n)
        return n / np.abs(n).max()

    return {"white": make(1, "white"), "low": make(2, "lowpass")}


@pytest.fixture(scope="module")
def mixtures(tmp_path_factory):
    proc = str(tmp_path_factory.mktemp("proc"))
    create_test_mixtures(f"{REFERENCE_DATA}/raw/", proc, _noise_bank(),
                         dataset_type="test", snrs=(0.0,),
                         noise_types=("white", "low"))
    return proc


def _si_sdr_delta(proc, est, name):
    bp = os.path.join(proc, os.path.splitext(name)[0])
    be = os.path.join(est, os.path.splitext(name)[0])
    s, _ = read_wav(bp + "_s.wav")
    n, _ = read_wav(bp + "_n.wav")
    x, _ = read_wav(bp + "_x.wav")
    sh, _ = read_wav(be + "_s_est.wav")
    ln = min(len(s), len(sh))
    before = energy_ratios(x[:ln], s[:ln], n[:ln])[0]
    after = energy_ratios(sh[:ln], s[:ln], n[:ln])[0]
    return before, after


def test_m2_ibm_oracle_improves_si_sdr(mixtures, tmp_path):
    m2 = load_params(best_checkpoint(os.path.join(ART, "M2_ibm")),
                     static={"y_dim": 513})
    files = speech_list(f"{REFERENCE_DATA}/raw/", "test")
    est = str(tmp_path / "est")
    enhance_files(files, mixtures, est, m2, model_type="m2",
                  classif_type="oracle", cfg=MCEMConfig(niter=10),
                  batch_size=4)
    deltas = []
    for name in files:
        before, after = _si_sdr_delta(mixtures, est, name)
        assert after > before, f"{name}: {before:.2f} -> {after:.2f}"
        deltas.append(after - before)
    assert max(deltas) > 2.0  # clear win on at least one utterance


def test_m1_unsupervised_improves(mixtures, tmp_path):
    m1 = load_params(best_checkpoint(os.path.join(ART, "M1")))
    files = speech_list(f"{REFERENCE_DATA}/raw/", "test")[:1]
    est = str(tmp_path / "est")
    enhance_files(files, mixtures, est, m1, model_type="m1",
                  cfg=MCEMConfig(niter=10), batch_size=2)
    before, after = _si_sdr_delta(mixtures, est, files[0])
    assert after > before


def test_m2_vad_oracle_runs(mixtures, tmp_path):
    m2 = load_params(best_checkpoint(os.path.join(ART, "M2_vad")),
                     static={"y_dim": 1})
    files = speech_list(f"{REFERENCE_DATA}/raw/", "test")[:1]
    est = str(tmp_path / "est")
    enhance_files(files, mixtures, est, m2, model_type="m2",
                  classif_type="oracle", target="vad",
                  cfg=MCEMConfig(niter=5), batch_size=2)
    before, after = _si_sdr_delta(mixtures, est, files[0])
    assert np.isfinite(after)


def test_wiener_dnn_baseline_runs(mixtures, tmp_path):
    w = load_params(best_checkpoint(os.path.join(ART, "wiener")),
                    static={"batch_norm": False})
    mean = np.load(os.path.join(ART, "wiener", "trainset_mean.npy"))
    std = np.load(os.path.join(ART, "wiener", "trainset_std.npy"))
    files = speech_list(f"{REFERENCE_DATA}/raw/", "test")
    est = str(tmp_path / "est")
    enhance_files_wiener(files, mixtures, est, w, mean=mean, std=std)
    for name in files:
        before, after = _si_sdr_delta(mixtures, est, name)
        assert np.isfinite(after)
