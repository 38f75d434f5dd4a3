"""CLI smoke tests for the driver scripts not covered by test_scripts.py:
create_noisy_train_set, create_test_set, training_classifier,
training_wiener_filter, evaluate_wiener_filter, run_metrics_wiener,
reconstruct_dnn_classif — every scripts/*.py is now executed by CI
(reference §2.5 inventory: 19 entry points).

Noise corpora (DEMAND/QUT) are not bundled, so the dataset-synthesis
scripts run with --synthetic_noise 1 (the same six-family bank the
pretrained checkpoints were trained with).
"""

import os
import shutil

import pytest

from conftest import REFERENCE_DATA, has_reference_data
from tests.test_scripts import run_script

pytestmark = pytest.mark.skipif(
    not has_reference_data(), reason="reference subset absent"
)


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("data_root_full")
    subset = root / "subset"
    subset.mkdir()
    os.symlink(f"{REFERENCE_DATA}/raw", subset / "raw")
    shutil.copytree(f"{REFERENCE_DATA}/processed/CSR-1-WSJ-0",
                    subset / "processed" / "CSR-1-WSJ-0")
    (subset / "export").mkdir()
    (subset / "models").mkdir()
    return str(root)


def test_noisy_train_classifier_and_wiener_cli(data_root):
    models_dir = os.path.join(data_root, "subset", "models")

    # 1) noisy training frames (IBM labels) with the synthetic bank
    out = run_script("create_noisy_train_set.py", "--data_root", data_root,
                     "--synthetic_noise", "1")
    assert "wrote" in out

    # 2) supervised IBM classifier, 1 epoch, tiny hidden
    out = run_script("training_classifier.py", "--data_root", data_root,
                     "--end_epoch", "1", "--h_dim", "32")
    assert "done" in out
    clf_dir = os.path.join(models_dir, "Classifier_hdim_032_end_epoch_001")
    assert os.path.isdir(clf_dir)
    assert os.path.exists(os.path.join(clf_dir, "trainset_mean.npy"))

    # 3) qualitative classifier masks + F1 figures
    out = run_script("reconstruct_dnn_classif.py", "--data_root", data_root,
                     "--classifier", clf_dir,
                     "--output", os.path.join(models_dir, "classif_figs/"))
    assert "F1" in out

    # 4) Wiener-mask labels + DNN baseline, 1 epoch
    run_script("create_noisy_train_set.py", "--data_root", data_root,
               "--synthetic_noise", "1", "--labels", "noisy_wiener_labels")
    out = run_script("training_wiener_filter.py", "--data_root", data_root,
                     "--end_epoch", "1")
    assert "done" in out
    wdir = os.path.join(models_dir, "Wiener_hdim_5x128_end_epoch_001")
    assert os.path.isdir(wdir)

    # 5) enhance the test set with the Wiener DNN
    est = os.path.join(models_dir, "wiener_enhanced/")
    out = run_script("evaluate_wiener_filter.py", "--data_root", data_root,
                     "--model", wdir, "--output", est)
    assert "Finished" in out

    # 6) metric protocol on the Wiener outputs
    out = run_script("run_metrics_wiener.py", "--data_root", data_root,
                     "--est_dir", est)
    assert "SI-SDR" in out and "PESQ" in out


def test_create_test_set_cli(tmp_path):
    """create_test_set synthesizes the QUT-layout mixture triplets +
    snr_db pickle in a fresh root (separate from the shared fixture so the
    golden processed data is never overwritten)."""
    root = tmp_path / "root"
    subset = root / "subset"
    subset.mkdir(parents=True)
    os.symlink(f"{REFERENCE_DATA}/raw", subset / "raw")
    (subset / "processed").mkdir()

    out = run_script("create_test_set.py", "--data_root", str(root),
                     "--synthetic_noise", "1")
    assert "Finished" in out and "mixtures" in out

    wavs = []
    for dirpath, _, files in os.walk(subset / "processed"):
        wavs.extend(f for f in files if f.endswith("_x.wav"))
    assert wavs, "no mixture wavs written"
    pickles = []
    for dirpath, _, files in os.walk(subset / "processed"):
        pickles.extend(f for f in files if f.endswith("snr_db.p"))
    assert pickles, "no snr_db pickle written"


def test_bench_train_cli(tmp_path):
    """bench_train prints one JSON line with throughput fields (tiny run,
    no torch half)."""
    import json

    out = run_script("bench_train.py", "--epochs", "2",
                     "--work", str(tmp_path / "bt"))
    rec = json.loads(out.strip().splitlines()[-1])
    assert rec["epochs"] == 2 and rec["steady_frames_per_s"] > 0


def test_bench_long_cli(tmp_path):
    """bench_long enhances a 1-minute continuous recording end to end."""
    import json

    out = run_script("bench_long.py", "--minutes", "1", "--niter", "2",
                     "--work", str(tmp_path / "bl"))
    rec = json.loads(out.strip().splitlines()[-1])
    assert rec["minutes"] == 1 and rec["rtf_warm"] > 0


def test_notebook_tours(tmp_path):
    """examples/notebook_tours.py covers the reference's three jupyter
    notebooks (inspection/training/visualization) as plain scripts."""
    import subprocess
    import sys as _sys

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["GVNMF_PLATFORM"] = "cpu"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + ":" + env.get("PYTHONPATH", "")
    out = subprocess.run(
        [_sys.executable, os.path.join(repo, "examples",
                                       "notebook_tours.py")],
        capture_output=True, text=True, cwd=repo, env=env, timeout=600,
    )
    assert out.returncode == 0, out.stderr
    for tag in ("[inspection]", "[training]", "[visualization]"):
        assert tag in out.stdout


def test_bench_train_stream_cli(tmp_path):
    """--stream N: beyond-HBM double-buffered ingestion benchmark fields
    (tiny replicate so CI stays fast)."""
    import json

    out = run_script("bench_train.py", "--epochs", "2", "--stream", "2",
                     "--work", str(tmp_path / "bts"))
    rec = json.loads(out.strip().splitlines()[-1])
    assert rec["stream_replicate"] == 2
    assert rec["stream_frames"] > rec["train_frames"]
    assert rec["stream_frames_per_s"] > 0


def test_bench_niter500_cli():
    """Paper-config harness at a toy shape: all three kernel variants
    report a realtime factor (no quality half in CI)."""
    import json

    out = run_script("bench_niter500.py", "--batch", "2", "--n", "128",
                     "--niter", "3", "--peem", "1")
    rec = json.loads(out.strip().splitlines()[-1])
    for k in ("exact_f32_rtf", "fast_r2_rtf", "fast_bf16mm_rtf",
              "peem_rtf"):
        assert rec[k] > 0, k


def test_eval_real_noise_cli(tmp_path):
    """Real-noise system matrix on one cheap system config."""
    out = run_script("eval_real_noise.py", "--niter", "2",
                     "--systems", "wiener",
                     "--work", str(tmp_path / "rn"))
    assert "Real-noise QUT table" in out
    assert "wiener" in out


def test_bench_shard_balance_cli():
    """Mesh plan accounting + ragged sharded==single equality (tiny)."""
    out = run_script("bench_shard_balance.py", "--utts", "10",
                     "--niter", "2")
    assert "mesh-aware plan" in out
    assert "sharded == single-device" in out


def test_bench_serving_cli():
    """bench_serving runs the dynamic-batching service end to end (tiny
    load, tiny MCEM, CPU/XLA engine) and prints a JSON record per load."""
    import json

    out = run_script("bench_serving.py", "--rates", "8", "--n", "4",
                     "--niter", "2", "--seconds", "0.5")
    rec = json.loads(out.strip().splitlines()[-1])
    assert rec["loads"] and rec["loads"][0]["p95_ms"] > 0
    assert rec["loads"][0]["achieved_req_s"] > 0


def test_doctor_cli():
    """scripts/doctor.py: every required check passes on the CPU backend
    and the accelerator probe never hangs."""
    out = run_script("doctor.py", "--probe_s", "5")
    assert "doctor: healthy" in out
    assert "cpu backend compile+run" in out
