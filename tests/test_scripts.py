"""CLI script smoke tests: run the create/train/evaluate/metrics drivers
end-to-end on a temp data root wired to the bundled subset."""

import os
import shutil
import subprocess
import sys

import numpy as np
import pytest

from conftest import REFERENCE_DATA, has_reference_data

pytestmark = pytest.mark.skipif(
    not has_reference_data(), reason="reference subset absent"
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    """Temp `data/subset` tree: raw symlinked to the reference, processed
    mixtures copied (writable), empty export/models."""
    root = tmp_path_factory.mktemp("data_root")
    subset = root / "subset"
    subset.mkdir()
    os.symlink(f"{REFERENCE_DATA}/raw", subset / "raw")
    shutil.copytree(f"{REFERENCE_DATA}/processed/CSR-1-WSJ-0",
                    subset / "processed" / "CSR-1-WSJ-0")
    (subset / "export").mkdir()
    (subset / "models").mkdir()
    return str(root)


def run_script(name, *args):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["GVNMF_PLATFORM"] = "cpu"
    env["PYTHONPATH"] = REPO + ":" + env.get("PYTHONPATH", "")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", name), *args],
        capture_output=True, text=True, cwd=REPO, env=env, timeout=1200,
    )
    assert out.returncode == 0, f"{name} failed:\n{out.stdout}\n{out.stderr}"
    return out.stdout


def test_full_cli_workflow(data_root):
    # 1) dataset synthesis (clean frames H5)
    out = run_script("create_train_set.py", "--data_root", data_root,
                     "--quantile_fraction", "0.98")
    assert "wrote" in out

    # 2) train M1 briefly
    out = run_script("training_M1.py", "--data_root", data_root,
                     "--end_epoch", "2", "--z_dim", "8", "--h_dim", "32")
    assert "done" in out
    models_dir = os.path.join(data_root, "subset", "models")
    m1_dir = os.path.join(models_dir,
                          "M1_hdim_032_zdim_008_end_epoch_002")
    assert os.path.isdir(m1_dir)

    # 3) enhance the test set with M1 + fast MCEM
    out = run_script(
        "evaluate_M1.py", "--data_root", data_root, "--model", m1_dir,
        "--niter", "3", "--nsamples_E_step", "2", "--burnin_E_step", "2",
        "--nsamples_WF", "2", "--burnin_WF", "2",
        "--output", os.path.join(models_dir, "M1_enhanced/"),
    )
    assert "Finished" in out
    est = os.path.join(models_dir, "M1_enhanced",
                       "CSR-1-WSJ-0/WAV/wsj0/si_et_05/440")
    assert any(f.endswith("_s_est.wav") for f in os.listdir(est))

    # 4) metrics on the enhanced outputs + the mixture floor
    out = run_script("run_metrics_M1.py", "--data_root", data_root,
                     "--est_dir", os.path.join(models_dir, "M1_enhanced/"))
    assert "SI-SDR" in out and "ESTOI" in out
    out = run_script("run_metrics_mixture.py", "--data_root", data_root)
    assert "SI-SDR" in out


def test_m2_oracle_cli_and_metrics(data_root):
    models_dir = os.path.join(data_root, "subset", "models")
    # untrained random M2 via a 1-epoch training run on the clean H5
    run_script("create_train_set.py", "--data_root", data_root,
               "--quantile_fraction", "0.98")
    # reuse clean H5 as stand-in labeled noisy data for a quick M2 train
    out = run_script("training_M2.py", "--data_root", data_root,
                     "--labels", "labels", "--end_epoch", "1",
                     "--z_dim", "8", "--h_dim", "32")
    m2_dir = os.path.join(models_dir, "M2_hdim_032_zdim_008_end_epoch_001")
    assert os.path.isdir(m2_dir)

    out = run_script(
        "evaluate_M2_ibm.py", "--data_root", data_root, "--model", m2_dir,
        "--classif_type", "oracle", "--niter", "2",
        "--nsamples_E_step", "2", "--burnin_E_step", "2",
        "--nsamples_WF", "2", "--burnin_WF", "2",
        "--output", os.path.join(models_dir, "M2_oracle_enhanced/"),
    )
    assert "Finished" in out

    out = run_script("run_metrics_M2.py", "--data_root", data_root,
                     "--est_dir",
                     os.path.join(models_dir, "M2_oracle_enhanced/"))
    assert "F1" in out

    # --algorithm hybrid: PEEM + warm-started fused-MCEM refinement
    out = run_script(
        "evaluate_M2_ibm.py", "--data_root", data_root, "--model", m2_dir,
        "--classif_type", "oracle", "--algorithm", "hybrid",
        "--niter", "3", "--refine", "2", "--e_steps", "2",
        "--nsamples_E_step", "2", "--burnin_E_step", "1",
        "--nsamples_WF", "2", "--burnin_WF", "1",
        "--output", os.path.join(models_dir, "M2_hybrid_enhanced/"),
    )
    assert "Finished" in out
    est = os.path.join(models_dir, "M2_hybrid_enhanced",
                       "CSR-1-WSJ-0/WAV/wsj0/si_et_05/440")
    assert any(f.endswith("_s_est.wav") for f in os.listdir(est))


def test_m2_vad_ablation_and_wiener_cli(data_root):
    models_dir = os.path.join(data_root, "subset", "models")
    # quick VAD-guided M2 train + ones-ablation eval (no classifier needed)
    run_script("create_train_set.py", "--data_root", data_root,
               "--labels", "vad_labels", "--quantile_fraction", "0.98")
    run_script("training_M2.py", "--data_root", data_root,
               "--labels", "vad_labels", "--end_epoch", "1",
               "--z_dim", "8", "--h_dim", "32")
    m2v = os.path.join(models_dir, "M2_hdim_032_zdim_008_end_epoch_001")
    out = run_script(
        "evaluate_M2_vad.py", "--data_root", data_root, "--model", m2v,
        "--classif_type", "ones", "--niter", "2",
        "--nsamples_E_step", "2", "--burnin_E_step", "2",
        "--nsamples_WF", "2", "--burnin_WF", "2",
        "--output", os.path.join(models_dir, "M2_vad_ones/"),
    )
    assert "Finished" in out


def test_reconstruct_and_visualization(data_root):
    models_dir = os.path.join(data_root, "subset", "models")
    m1_dir = os.path.join(models_dir, "M1_hdim_032_zdim_008_end_epoch_002")
    out = run_script("reconstruct_M1.py", "--data_root", data_root,
                     "--model", m1_dir,
                     "--output", os.path.join(models_dir, "recon/"))
    assert "_recon.png" in out
    out = run_script("reconstruct_timo_classif.py", "--data_root", data_root,
                     "--output", os.path.join(models_dir, "timo/"))
    assert "timo" in out
    out = run_script("visualization.py", "--data_root", data_root,
                     "--dataset_type", "test",
                     "--output", os.path.join(models_dir, "figs/"))
    assert "wrote" in out


def test_help_flag_exits_zero():
    """Every CLI script must answer --help with its usage docstring and
    rc=0 (the apply_overrides help surface) without touching data/models."""
    import glob

    scripts = sorted(
        os.path.basename(p)
        for p in glob.glob(os.path.join(REPO, "scripts", "*.py"))
        if not os.path.basename(p).startswith("_")
    )
    assert scripts, "no CLI scripts found"
    for name in scripts:
        out = run_script(name, "--help")
        assert "--" in out, f"{name} --help printed no flags:\n{out}"


def test_algorithm_flag_routes_config():
    """--algorithm peem/hybrid must receive the shared flags (--niter,
    --noise_gain): parsing MCEMConfig before branching used to consume
    them and silently run the other engine at its defaults."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "scripts"))
    import evaluate_M1 as m1

    captured = {}

    def fake_enhance_files(*a, **kw):
        captured["cfg"] = kw.get("cfg")
        raise SystemExit(0)

    orig = m1.enhance_files
    m1.enhance_files = fake_enhance_files
    try:
        for algo, expect_type, extra in (
                ("peem", "PEEMConfig", ["--niter", "123"]),
                ("hybrid", "HybridConfig", ["--refine", "7"]),
                ("mcem", "MCEMConfig", ["--noise_gain", "1",
                                        "--noise_model", "spp"])):
            try:
                m1.main(["--algorithm", algo,
                         "--model", "artifacts/pretrained/M1"] + extra)
            except SystemExit:
                pass
            cfg = captured.pop("cfg")
            assert type(cfg).__name__ == expect_type, (algo, cfg)
            if algo == "peem":
                assert cfg.niter == 123
            elif algo == "hybrid":
                assert cfg.refine == 7
            else:
                assert cfg.noise_gain is True
    finally:
        m1.enhance_files = orig
