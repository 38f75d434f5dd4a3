"""The `gvnmf` console entry point (guided_vae_nmf_tpu/cli.py): every
subcommand exercised end-to-end against the bundled subset + shipped
pretrained artifacts (beyond-reference surface; the reference has no CLI
at all, SURVEY §1)."""

import os
import subprocess
import sys

import numpy as np
import pytest

from conftest import REFERENCE_DATA, has_reference_data
from guided_vae_nmf_tpu.data import read_wav

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ART = os.path.join(REPO, "artifacts", "pretrained")
MIX_DIR = os.path.join(REFERENCE_DATA,
                       "processed/CSR-1-WSJ-0/WAV/wsj0/si_et_05/440")

pytestmark = pytest.mark.skipif(
    not (has_reference_data() and os.path.isdir(ART)),
    reason="reference subset or pretrained artifacts absent")


def _run(*args, timeout=600):
    env = dict(os.environ)
    # GVNMF_PLATFORM beats the deployment site hook that would otherwise
    # re-pin the subprocess to the accelerator tunnel (package __init__)
    env["JAX_PLATFORMS"] = "cpu"
    env["GVNMF_PLATFORM"] = "cpu"
    env["PYTHONPATH"] = REPO + ":" + env.get("PYTHONPATH", "")
    return subprocess.run(
        [sys.executable, "-m", "guided_vae_nmf_tpu.cli", *args],
        capture_output=True, text=True, timeout=timeout, cwd=REPO,
        env=env)


def test_cli_help_and_version():
    out = _run("--help", timeout=120)
    assert out.returncode == 0
    for cmd in ("enhance", "stream", "metrics", "serve", "doctor"):
        assert cmd in out.stdout
    out = _run("version", timeout=120)
    assert out.returncode == 0 and out.stdout.strip()


def test_cli_enhance_and_metrics(tmp_path):
    mix = os.path.join(MIX_DIR, "440c020a_x.wav")
    clean = os.path.join(MIX_DIR, "440c020a_s.wav")
    s_out = str(tmp_path / "s.wav")
    n_out = str(tmp_path / "n.wav")
    out = _run("enhance", mix, s_out, "--model", f"{ART}/M2_ibm",
               "--classifier", f"{ART}/classifier_ibm",
               "--niter", "3", "--noise_model", "spp",
               "--noise_out", n_out)
    assert out.returncode == 0, out.stderr[-800:]
    x, fs = read_wav(mix)
    s, _ = read_wav(s_out)
    n, _ = read_wav(n_out)
    assert fs == 16000 and len(s) == len(x) == len(n)
    assert np.all(np.isfinite(s))

    out = _run("metrics", "--clean", clean, "--enhanced", s_out,
               "--mixture", mix)
    assert out.returncode == 0, out.stderr[-800:]
    for key in ("ESTOI", "PESQ-wb", "SI-SDR", "SI-SIR", "SI-SAR"):
        assert key in out.stdout


def test_cli_enhance_peem_m1(tmp_path):
    """Algorithm + model-type coverage: label-free M1 enhancement through
    the deterministic PEEM engine, loading a bare .ckpt.npz path (no
    shipped M1 artifact — the CLI must accept file checkpoints too)."""
    import jax

    from guided_vae_nmf_tpu.models import vae_init
    from guided_vae_nmf_tpu.train import save_params

    ckpt = save_params(str(tmp_path), "M1", 1, 0.0,
                       vae_init(jax.random.PRNGKey(0), [513, 16, [32]]))
    mix = os.path.join(MIX_DIR, "440c020b_x.wav")
    s_out = str(tmp_path / "s.wav")
    out = _run("enhance", mix, s_out, "--model", ckpt,
               "--model_type", "m1", "--algorithm", "peem",
               "--niter", "3", "--noise_model", "spp")
    assert out.returncode == 0, out.stderr[-800:]
    s, _ = read_wav(s_out)
    assert len(s) == len(read_wav(mix)[0])


def test_cli_enhance_batch_glob(tmp_path):
    """Glob input -> one padded device batch -> per-file outputs in the
    output directory."""
    out = _run("enhance", os.path.join(MIX_DIR, "440c020*_x.wav"),
               str(tmp_path), "--model", f"{ART}/M2_ibm",
               "--label", "timo", "--niter", "2", "--noise_model", "spp")
    assert out.returncode == 0, out.stderr[-800:]
    for utt in ("a", "b", "c"):
        mix = os.path.join(MIX_DIR, f"440c020{utt}_x.wav")
        est = tmp_path / f"440c020{utt}_x_enhanced.wav"
        assert est.exists()
        assert len(read_wav(str(est))[0]) == len(read_wav(mix)[0])
    assert "3 files" in out.stdout


def test_cli_stream(tmp_path):
    mix = os.path.join(MIX_DIR, "440c020a_x.wav")
    y_out = str(tmp_path / "y.wav")
    out = _run("stream", mix, y_out, "--model", f"{ART}/M2_ibm",
               "--label", "timo", "--block_iters", "2", "--e_steps", "2")
    assert out.returncode == 0, out.stderr[-800:]
    y, _ = read_wav(y_out)
    assert len(y) == len(read_wav(mix)[0])
    assert np.all(np.isfinite(y))


def test_cli_train_and_enhance_roundtrip(tmp_path):
    """`gvnmf train` fits an M2 on a tiny synthetic H5, then `gvnmf
    enhance` loads the resulting checkpoint directory — the full
    train -> deploy lifecycle through the console command."""
    from guided_vae_nmf_tpu.data import H5FrameWriter

    rng = np.random.RandomState(0)
    X = rng.uniform(0.01, 1.0, (513, 512)).astype(np.float32)
    Y = (rng.rand(513, 512) > 0.5).astype(np.float32)
    h5p = str(tmp_path / "frames.h5")
    for split, sl in (("train", slice(0, 384)),
                      ("validation", slice(384, 512))):
        with H5FrameWriter(h5p, split) as w:
            w.append(X[:, sl], Y[:, sl])
    out_dir = str(tmp_path / "ckpt")
    out = _run("train", "m2", "--h5", h5p, "--out", out_dir,
               "--epochs", "2", "--z_dim", "8", "--h_dim", "16")
    assert out.returncode == 0, out.stderr[-800:]
    assert "best valid" in out.stdout
    import glob as _glob

    assert _glob.glob(os.path.join(out_dir, "*.ckpt.npz"))

    mix = os.path.join(MIX_DIR, "440c020a_x.wav")
    s_out = str(tmp_path / "s.wav")
    out = _run("enhance", mix, s_out, "--model", out_dir,
               "--label", "timo", "--niter", "2", "--noise_model", "spp")
    assert out.returncode == 0, out.stderr[-800:]
    assert len(read_wav(s_out)[0]) == len(read_wav(mix)[0])


def test_cli_dataset_to_train_lifecycle(tmp_path):
    """`gvnmf dataset` synthesizes a labeled H5 from arbitrary user wavs
    (no WSJ0 layout), and `gvnmf train` consumes it — the full
    data -> model lifecycle on user corpora."""
    from guided_vae_nmf_tpu.data import write_wav

    rng = np.random.RandomState(0)
    t = np.arange(int(1.2 * 16000)) / 16000
    for i in range(3):
        s = (0.4 * np.sin(2 * np.pi * (180 + 40 * i) * t)
             * np.clip(np.sin(2 * np.pi * 1.3 * t + i), 0, None))
        write_wav(str(tmp_path / f"clean{i}.wav"),
                  s.astype(np.float32), 16000)
    write_wav(str(tmp_path / "hum.wav"),
              (0.1 * rng.randn(3 * 16000)).astype(np.float32), 16000)

    h5p = str(tmp_path / "frames.h5")
    out = _run("dataset", "--clean", str(tmp_path / "clean*.wav"),
               "--noise", str(tmp_path / "hum.wav"), "--out", h5p,
               "--val_fraction", "0.34")
    assert out.returncode == 0, out.stderr[-800:]
    assert "2 train / 1 validation" in out.stdout
    assert "hum" in out.stdout

    out = _run("train", "m2", "--h5", h5p,
               "--out", str(tmp_path / "ckpt"),
               "--epochs", "1", "--z_dim", "4", "--h_dim", "8")
    assert out.returncode == 0, out.stderr[-800:]
    assert "best valid" in out.stdout

    # --augment: speed/gain copies extend the train side (2 clean train
    # utterances -> +2 speed + 2 gain copies)
    out = _run("dataset", "--clean", str(tmp_path / "clean*.wav"),
               "--noise", str(tmp_path / "hum.wav"),
               "--out", str(tmp_path / "frames_aug.h5"),
               "--val_fraction", "0.34", "--augment")
    assert out.returncode == 0, out.stderr[-800:]
    assert "augmented train split: +6" in out.stdout
    assert "8 train / 1 validation" in out.stdout


def test_cli_doctor():
    out = _run("doctor", "--probe_s", "20")
    assert out.returncode == 0, out.stderr[-800:]
    assert "cpu fallback" in out.stdout


def test_build_server_shared_factory():
    """http_serving.build_server (shared by `gvnmf serve` and
    scripts/serve_http.py) assembles a working stack from the artifacts
    directory: health endpoint answers on an ephemeral port."""
    import json
    from urllib.request import urlopen

    from guided_vae_nmf_tpu.http_serving import build_server

    srv = build_server(ART, port=0, niter=2, pooled_streams=True,
                       max_streams=2).start()
    try:
        with urlopen(f"http://127.0.0.1:{srv.port}/healthz",
                     timeout=10) as r:
            assert json.load(r)["status"] == "ok"
    finally:
        # full-stack teardown: HTTP + pool ticker + service drain
        srv.close_all()
    assert srv._stream_driver is not None    # pooled mode attached it

    # data_parallel: requests AND pooled streams shard over the mesh
    # (8-way virtual CPU mesh under the test conftest)
    srv = build_server(ART, port=0, niter=2, pooled_streams=True,
                       max_streams=2, data_parallel=True).start()
    try:
        pool = srv._stream_driver._pool
        assert pool.mesh is not None
        assert pool.max_streams % pool.mesh.shape["data"] == 0
        with urlopen(f"http://127.0.0.1:{srv.port}/healthz",
                     timeout=10) as r:
            assert json.load(r)["status"] == "ok"
    finally:
        srv.close_all()


def test_cli_stream_rejects_non_causal_labels():
    """The stream subcommand only offers causal label sources."""
    out = _run("stream", "in.wav", "out.wav", "--model", "x",
               "--label", "oracle", timeout=120)
    assert out.returncode == 2
    assert "invalid choice" in out.stderr


def test_cli_enhance_resamples_and_downmixes(tmp_path):
    """Non-16k / stereo inputs are auto-converted (first channel,
    polyphase resample) instead of rejected; output is 16 kHz."""
    from scipy.signal import resample_poly

    from guided_vae_nmf_tpu.data import write_wav

    x16, _ = read_wav(os.path.join(MIX_DIR, "440c020a_x.wav"))
    x8 = resample_poly(x16[:32000], 1, 2).astype(np.float32)
    stereo8 = np.stack([x8, 0.5 * x8], axis=1)
    src = str(tmp_path / "in8k.wav")
    write_wav(src, stereo8, 8000)
    s_out = str(tmp_path / "s.wav")
    out = _run("enhance", src, s_out, "--model", f"{ART}/M2_ibm",
               "--label", "timo", "--niter", "2", "--noise_model", "spp")
    assert out.returncode == 0, out.stderr[-800:]
    assert "converted to 16 kHz mono" in out.stdout
    s, fs = read_wav(s_out)
    assert fs == 16000 and len(s) == 2 * len(x8)

    # oracle labels must align with the converted mixture: the s_ref is
    # converted the same way (regression for the label/frame mismatch)
    c16, _ = read_wav(os.path.join(MIX_DIR, "440c020a_s.wav"))
    c8 = resample_poly(c16[:32000], 1, 2).astype(np.float32)
    sref = str(tmp_path / "clean8k.wav")
    write_wav(sref, c8, 8000)
    out = _run("enhance", src, s_out, "--model", f"{ART}/M2_ibm",
               "--label", "oracle", "--s_ref", sref,
               "--niter", "2", "--noise_model", "spp")
    assert out.returncode == 0, out.stderr[-800:]
    assert len(read_wav(s_out)[0]) == 2 * len(x8)
