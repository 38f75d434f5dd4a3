"""End-to-end enhancement pipeline tests on the bundled subset mixtures:
file-sweep outputs, the S_hat + N_hat = X reconstruction invariant (the
Wiener filters partition unity), label sources, and the Wiener-DNN baseline
path."""

import os
from glob import glob

import numpy as np
import jax
import pytest
from numpy.testing import assert_allclose

from conftest import REFERENCE_DATA, has_reference_data
from guided_vae_nmf_tpu.data import read_wav, speech_list
from guided_vae_nmf_tpu.dsp import stft
from guided_vae_nmf_tpu.models import vae_init, dgm_init, classifier_init
from guided_vae_nmf_tpu.mcem import MCEMConfig
from guided_vae_nmf_tpu.pipeline import (
    enhance_batch,
    enhance_files,
    enhance_files_wiener,
    make_labels,
    load_mixture,
    bucket_frames,
)

PROCESSED = f"{REFERENCE_DATA}/processed/"
KEY = jax.random.PRNGKey(0)
FAST_CFG = MCEMConfig(niter=4, nsamples_E_step=3, burnin_E_step=3,
                      nsamples_WF=4, burnin_WF=4, nmf_rank=4)

pytestmark = pytest.mark.skipif(
    not has_reference_data(), reason="reference subset absent"
)


def _test_files():
    return speech_list(f"{REFERENCE_DATA}/raw/", "test")


def test_bucket_frames():
    assert bucket_frames(1) == 128
    assert bucket_frames(128) == 128
    assert bucket_frames(129) == 256


def test_enhance_batch_reconstruction_invariant():
    """WFs + WFn = 1 => s_est + n_est must reconstruct the mixture STFT."""
    files = _test_files()[:2]
    X_tfs = [load_mixture(
        os.path.join(PROCESSED, os.path.splitext(p)[0]))[2] for p in files]
    vae = vae_init(KEY, [513, 8, [32]])
    S_hat, N_hat = enhance_batch(vae, X_tfs, cfg=FAST_CFG)
    for S, N, X in zip(S_hat, N_hat, X_tfs):
        assert S.shape == X.shape
        assert_allclose(S + N, X, atol=2e-4 * np.abs(X).max())


def test_make_labels_all_sources():
    files = _test_files()
    base = os.path.join(PROCESSED, os.path.splitext(files[0])[0])
    _, _, X_tf = load_mixture(base)
    power = np.abs(X_tf) ** 2
    N = X_tf.shape[1]

    cls = classifier_init(KEY, [513, [32], 513])
    soft, hard = make_labels("dnn", power, classifier_params=cls)
    assert soft.shape == (513, N) and set(np.unique(hard)) <= {0.0, 1.0}

    soft, hard = make_labels("oracle", power, s_path=base + "_s.wav")
    assert hard.shape == (513, N)

    soft, hard = make_labels("oracle", power, s_path=base + "_s.wav",
                             target="vad")
    assert hard.shape == (1, N)

    soft, hard = make_labels("timo", power)
    assert hard.shape == (513, N)

    soft, hard = make_labels("timo", power, target="vad")
    assert hard.shape == (1, N)

    for ab in ("ones", "zeros"):
        soft, hard = make_labels(ab, power, target="vad")
        assert hard.shape == (1, N)
        assert np.all(hard == (1.0 if ab == "ones" else 0.0))


def test_enhance_files_m2_sweep(tmp_path):
    files = _test_files()
    dgm = dgm_init(KEY, [513, 513, 8, [32]])
    cls = classifier_init(KEY, [513, [32], 513])
    dt = enhance_files(
        files, PROCESSED, str(tmp_path), dgm, model_type="m2",
        classif_type="dnn", classifier_params=cls, cfg=FAST_CFG,
        batch_size=4,
    )
    assert dt > 0
    for p in files:
        base = str(tmp_path / os.path.splitext(p)[0])
        s_est, fs = read_wav(base + "_s_est.wav")
        x, _ = read_wav(os.path.join(PROCESSED,
                                     os.path.splitext(p)[0]) + "_x.wav")
        assert fs == 16000
        assert len(s_est) == len(x)  # trimmed to T_orig
        assert np.all(np.isfinite(s_est))
        assert os.path.exists(base + "_n_est.wav")
        assert os.path.exists(base + "_ibm_soft_est.npy")
        assert os.path.exists(base + "_ibm_hard_est.npy")
        # mixture decomposition survives the ISTFT round trip
        n_est, _ = read_wav(base + "_n_est.wav")
        assert_allclose(s_est + n_est, x, atol=5e-3)


def test_enhance_batch_spp_noise_model():
    """The noNMF variant (reference mcem.py:493-760): SPP-tracked fixed
    noise variance, M-step updates only the gain. Reconstruction invariant
    still holds."""
    files = _test_files()[:2]
    X_tfs = [load_mixture(
        os.path.join(PROCESSED, os.path.splitext(p)[0]))[2] for p in files]
    vae = vae_init(KEY, [513, 8, [32]])
    S_hat, N_hat = enhance_batch(vae, X_tfs, cfg=FAST_CFG,
                                 noise_model="spp")
    for S, N, X in zip(S_hat, N_hat, X_tfs):
        assert np.all(np.isfinite(S)) and np.all(np.isfinite(N))
        assert_allclose(S + N, X, atol=2e-4 * np.abs(X).max())


def test_enhance_files_m1_vad_free(tmp_path):
    files = _test_files()[:2]
    vae = vae_init(KEY, [513, 8, [32]])
    enhance_files(files, PROCESSED, str(tmp_path), vae, model_type="m1",
                  cfg=FAST_CFG)
    base = str(tmp_path / os.path.splitext(files[0])[0])
    assert os.path.exists(base + "_s_est.wav")
    assert not glob(str(tmp_path / "**/*_ibm_*"), recursive=True)


def test_fault_tolerant_sweep_passthrough(tmp_path):
    """A model whose dimensions cannot process the input must not abort
    the sweep: the failed utterances degrade to mixture passthrough."""
    files = _test_files()[:2]
    bad_vae = vae_init(KEY, [64, 8, [32]])  # x_dim 64 != 513 -> raises
    enhance_files(files, PROCESSED, str(tmp_path), bad_vae,
                  model_type="m1", cfg=FAST_CFG)
    for p in files:
        base = str(tmp_path / os.path.splitext(p)[0])
        s_est, _ = read_wav(base + "_s_est.wav")
        x, _ = read_wav(os.path.join(PROCESSED,
                                     os.path.splitext(p)[0]) + "_x.wav")
        assert_allclose(s_est, x, atol=2.0 / 32768)  # passthrough


def test_enhance_files_wiener(tmp_path):
    files = _test_files()
    w = classifier_init(KEY, [513, [16] * 5, 513])
    enhance_files_wiener(files, PROCESSED, str(tmp_path), w)
    for p in files:
        base = str(tmp_path / os.path.splitext(p)[0])
        s_est, _ = read_wav(base + "_s_est.wav")
        x, _ = read_wav(os.path.join(PROCESSED,
                                     os.path.splitext(p)[0]) + "_x.wav")
        assert len(s_est) == len(x)
        assert np.all(np.isfinite(s_est))


def test_enhance_files_mesh_sharded_matches_single_device(tmp_path):
    """The wav->wav sweep sharded over the 8-way virtual mesh (shard_map,
    zero collectives) must reproduce the single-device sweep: same keys,
    per-utterance independence — only the batch padding to the mesh size
    differs, and padded duplicates are never written."""
    from guided_vae_nmf_tpu.parallel import make_mesh

    files = _test_files()
    dgm = dgm_init(KEY, [513, 513, 8, [32]])
    out_1 = tmp_path / "single"
    out_m = tmp_path / "mesh"
    enhance_files(files, PROCESSED, str(out_1), dgm, model_type="m2",
                  classif_type="oracle", cfg=FAST_CFG, batch_size=4)
    enhance_files(files, PROCESSED, str(out_m), dgm, model_type="m2",
                  classif_type="oracle", cfg=FAST_CFG, batch_size=4,
                  mesh=make_mesh())
    for p in files:
        rel = os.path.splitext(p)[0]
        s1, _ = read_wav(str(out_1 / (rel + "_s_est.wav")))
        sm, _ = read_wav(str(out_m / (rel + "_s_est.wav")))
        assert len(s1) == len(sm)
        # identical per-utterance programs + keys; PCM16 quantization
        # absorbs float reassociation -> at most a couple of LSBs
        assert np.max(np.abs(s1 - sm)) <= 4.0 / 32768, p
        y1 = np.load(str(out_1 / (rel + "_ibm_hard_est.npy")))
        ym = np.load(str(out_m / (rel + "_ibm_hard_est.npy")))
        np.testing.assert_array_equal(y1, ym)


def test_enhance_files_timo_on_device(tmp_path):
    """The SPP 'timo' label source now runs inside the device program; the
    saved hard labels must match the host SPP estimator's labels and the
    soft labels must be the real SPP values (not a copy of hard)."""
    files = _test_files()[:1]
    dgm = dgm_init(KEY, [513, 513, 8, [32]])
    enhance_files(files, PROCESSED, str(tmp_path), dgm, model_type="m2",
                  classif_type="timo", cfg=FAST_CFG)
    rel = os.path.splitext(files[0])[0]
    y_hard = np.load(str(tmp_path / (rel + "_ibm_hard_est.npy")))
    y_soft = np.load(str(tmp_path / (rel + "_ibm_soft_est.npy")))
    X = load_mixture(os.path.join(PROCESSED, rel))[2]
    _, y_host = make_labels("timo", np.abs(X) ** 2)
    assert y_hard.shape == y_host.shape
    # f32 scan vs f64 host recurrence: allow a tiny borderline-bin budget
    mismatch = np.mean(y_hard != y_host)
    assert mismatch < 5e-3, mismatch
    assert 0.0 < float(y_soft.astype(np.float32).mean()) < 1.0
    assert not np.array_equal(y_soft.astype(np.float32), y_hard)


def test_make_labels_dnn_features_and_threshold():
    """Round-5 classifier protocol knobs: 'log-power' transforms the input
    before standardization and dnn_threshold replaces the hard 0.5."""
    from guided_vae_nmf_tpu.models import classifier_apply

    files = _test_files()
    base = os.path.join(PROCESSED, os.path.splitext(files[0])[0])
    _, _, X_tf = load_mixture(base)
    power = np.abs(X_tf) ** 2
    cls = classifier_init(KEY, [513, [32], 513])
    rng = np.random.RandomState(0)
    mean = rng.rand(513).astype(np.float32)
    std = (rng.rand(513) + 0.5).astype(np.float32)

    soft, hard = make_labels("dnn", power, classifier_params=cls,
                             mean=mean, std=std, features="log-power",
                             dnn_threshold=0.7)
    xn = (np.log(power.T + 1e-10) - mean) / (std + 1e-8)
    ref = np.asarray(classifier_apply(cls, jax.numpy.asarray(xn))).T
    np.testing.assert_allclose(soft, ref, rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(hard, (soft > 0.7).astype(np.float32))


def test_enhance_files_dnn_device_labels_honor_meta_knobs(tmp_path):
    """The device label program must apply the same features/threshold as
    the host make_labels path (saved hard labels compared)."""
    files = _test_files()[:1]
    dgm = dgm_init(KEY, [513, 513, 8, [32]])
    cls = classifier_init(KEY, [513, [32], 513])
    enhance_files(files, PROCESSED, str(tmp_path), dgm, model_type="m2",
                  classif_type="dnn", classifier_params=cls, cfg=FAST_CFG,
                  features="log-power", dnn_threshold=0.7)
    rel = os.path.splitext(files[0])[0]
    y_hard = np.load(str(tmp_path / (rel + "_ibm_hard_est.npy")))
    X = load_mixture(os.path.join(PROCESSED, rel))[2]
    _, y_host = make_labels("dnn", np.abs(X) ** 2, classifier_params=cls,
                            features="log-power", dnn_threshold=0.7)
    assert y_hard.shape == y_host.shape
    mismatch = np.mean(y_hard != y_host)
    assert mismatch < 5e-3, mismatch
    # the threshold must actually bite: 0.7-hard labels are sparser than
    # the 0.5 default would be
    _, y_05 = make_labels("dnn", np.abs(X) ** 2, classifier_params=cls,
                          features="log-power", dnn_threshold=0.5)
    assert y_host.sum() < y_05.sum()


def test_enhance_files_bucket_boundary_length(tmp_path):
    """Regression: an utterance whose frame count is an exact bucket
    multiple while its end-padded length is not a hop multiple used to
    overflow the assembly buffer (len(xp) > L by up to hop-1 samples) and
    crash the sweep. T=32300 -> 128 frames == one full bucket."""
    from guided_vae_nmf_tpu.data import write_wav

    proc = tmp_path / "proc"
    utt_dir = proc / "CSR-1-WSJ-0/WAV/wsj0/si_et_05/440"
    utt_dir.mkdir(parents=True)
    rng = np.random.RandomState(0)
    T = 32300
    assert T % 256 != 0
    s = 0.1 * np.sin(2 * np.pi * 200 * np.arange(T) / 16000)
    x = s + 0.05 * rng.randn(T)
    write_wav(str(utt_dir / "u_s.wav"), s, 16000)
    write_wav(str(utt_dir / "u_n.wav"), x - s, 16000)
    write_wav(str(utt_dir / "u_x.wav"), x, 16000)

    vae = vae_init(KEY, [513, 8, [32]])
    enhance_files(["CSR-1-WSJ-0/WAV/wsj0/si_et_05/440/u.wav"],
                  str(proc) + "/", str(tmp_path / "est"), vae,
                  model_type="m1", cfg=FAST_CFG)
    out, _ = read_wav(str(tmp_path / "est/CSR-1-WSJ-0/WAV/wsj0/si_et_05/"
                          "440/u_s_est.wav"))
    assert len(out) == T and np.all(np.isfinite(out))


def test_dnn_label_device_path_no_fallback(capsys):
    """Guard: classifier params (including their bool 'batch_norm' leaf)
    must trace through the waveform device program — a TracerBoolConversion
    here used to be silently absorbed by the fault-tolerant retry, running
    every dnn batch on the slow host path."""
    files = _test_files()[:1]
    dgm = dgm_init(KEY, [513, 513, 8, [32]])
    cls = classifier_init(KEY, [513, [32], 513])
    import tempfile

    with tempfile.TemporaryDirectory() as out:
        enhance_files(files, PROCESSED, out, dgm, model_type="m2",
                      classif_type="dnn", classifier_params=cls,
                      cfg=FAST_CFG)
    assert "retrying per-utterance" not in capsys.readouterr().out


def test_enhance_batch_hybrid_noise_model():
    """Hybrid noise model (SPP floor + learned NMF residual,
    Vb = W@H + Vb_spp): reconstruction invariant holds; on the subset the
    pure SPP model remains the recommended real-noise configuration
    (VALIDATION.md)."""
    files = _test_files()[:2]
    X_tfs = [load_mixture(
        os.path.join(PROCESSED, os.path.splitext(p)[0]))[2] for p in files]
    vae = vae_init(KEY, [513, 8, [32]])
    S_hat, N_hat = enhance_batch(vae, X_tfs, cfg=FAST_CFG,
                                 noise_model="hybrid")
    for S, N, X in zip(S_hat, N_hat, X_tfs):
        assert np.all(np.isfinite(S)) and np.all(np.isfinite(N))
        assert_allclose(S + N, X, atol=2e-4 * np.abs(X).max())


def test_silent_input_degrades_not_nan(tmp_path):
    """An all-silent mixture (total power 0) breaks the Lorenz quantile
    and the MCEM math in BOTH implementations (division by the total);
    the sweep must catch the non-finite output and write passthrough
    audio, never NaN wavs."""
    from guided_vae_nmf_tpu.data import write_wav

    rel = "CSR-1-WSJ-0/WAV/wsj0/si_et_05/440/silent00.wav"
    proc = tmp_path / "proc"
    bp = proc / os.path.splitext(rel)[0]
    os.makedirs(os.path.dirname(str(bp)), exist_ok=True)
    silence = np.zeros(16000, np.float32)
    write_wav(str(bp) + "_x.wav", silence, 16000)
    write_wav(str(bp) + "_s.wav", silence, 16000)

    dgm = dgm_init(KEY, [513, 513, 8, [32]])
    enhance_files([rel], str(proc) + "/", str(tmp_path / "est"), dgm,
                  model_type="m2", classif_type="oracle", cfg=FAST_CFG)
    base = str(tmp_path / "est" / os.path.splitext(rel)[0])
    s_est, _ = read_wav(base + "_s_est.wav")
    assert np.all(np.isfinite(s_est))
    assert_allclose(s_est, silence, atol=2.0 / 32768)


def test_plan_batches_mesh_aware():
    """Mesh-aware planning: every batch is a mesh multiple except at most
    one pooled tail; keys are utterance-index based (plan-invariant); the
    pooled partial tail sits at the smallest leftover n_pad."""
    from guided_vae_nmf_tpu.pipeline import plan_batches

    files = [f"u{i}.wav" for i in range(22)]
    rng = np.random.RandomState(3)
    n_frames = [int(rng.choice([60, 100, 250, 380, 600, 850]))
                for _ in range(22)]
    plan1 = plan_batches(files, n_frames, batch_size=16, n_dev=1, seed=0)
    plan8 = plan_batches(files, n_frames, batch_size=16, n_dev=8, seed=0)
    assert sorted(p for b in plan8 for p in b[0]) == sorted(files)
    partial = [b for b in plan8 if len(b[0]) % 8]
    assert len(partial) <= 1
    if partial:
        assert partial[0][1] == min(b[1] for b in plan8
                                    if any(p in partial[0][0]
                                           for p in b[0]))
    # per-utterance keys identical across plans
    k1 = {p: tuple(np.asarray(k)) for b in plan1
          for p, k in zip(b[0], np.asarray(b[2]))}
    k8 = {p: tuple(np.asarray(k)) for b in plan8
          for p, k in zip(b[0], np.asarray(b[2]))}
    assert k1 == k8


def test_enhance_files_hybrid_algorithm(tmp_path):
    """--algorithm hybrid (HybridConfig) routes the sweep through PEEM +
    warm-started fused-MCEM refinement; outputs keep the reconstruction
    invariant and the file contract."""
    from guided_vae_nmf_tpu.mcem import HybridConfig

    files = _test_files()[:2]
    dgm = dgm_init(KEY, [513, 513, 8, [32]])
    hcfg = HybridConfig(niter=3, refine=2, e_steps=2, nmf_rank=3,
                        nsamples_E_step=2, burnin_E_step=1,
                        nsamples_WF=2, burnin_WF=1)
    dt = enhance_files(
        files, PROCESSED, str(tmp_path), dgm, model_type="m2",
        classif_type="oracle", cfg=hcfg, batch_size=2,
    )
    assert dt > 0
    for p in files:
        base = str(tmp_path / os.path.splitext(p)[0])
        s_est, _ = read_wav(base + "_s_est.wav")
        n_est, _ = read_wav(base + "_n_est.wav")
        x, _ = read_wav(os.path.join(PROCESSED,
                                     os.path.splitext(p)[0]) + "_x.wav")
        assert np.all(np.isfinite(s_est))
        assert_allclose(s_est + n_est, x, atol=5e-3)

    with pytest.raises(ValueError, match="noise_model"):
        enhance_files(files, PROCESSED, str(tmp_path / "h2"), dgm,
                      model_type="m2", classif_type="oracle", cfg=hcfg,
                      batch_size=2, noise_model="hybrid")


def test_enhance_batch_spp2_noise_model_matches_manual_composition():
    """noise_model='spp2' (two-pass): pass 1 = SPP-fixed engine; pass 2
    re-runs with Vb = max(Vb_spp, ema(pass-1 residual power)) and folded
    keys. Must equal the manual composition of the same two engine calls,
    and keep the reconstruction invariant."""
    import jax.numpy as jnp

    from guided_vae_nmf_tpu.mcem import mcem_m1_batch, spp_track_jax
    from guided_vae_nmf_tpu.pipeline import _ema_time, _pad_batch

    files = _test_files()[:2]
    X_tfs = [load_mixture(
        os.path.join(PROCESSED, os.path.splitext(p)[0]))[2] for p in files]
    vae = vae_init(KEY, [513, 8, [32]])
    keys = jax.random.split(jax.random.PRNGKey(3), len(X_tfs))

    S_hat, N_hat, out = enhance_batch(vae, X_tfs, keys=keys, cfg=FAST_CFG,
                                      engine="xla", noise_model="spp2",
                                      return_masks=True)
    for S, N, X in zip(S_hat, N_hat, X_tfs):
        assert np.all(np.isfinite(S)) and np.all(np.isfinite(N))
        assert_allclose(S + N, X, atol=2e-4 * np.abs(X).max())

    n_pad = bucket_frames(max(X.shape[1] for X in X_tfs))
    _, X_p, mask, _ = _pad_batch(X_tfs, None, n_pad)
    X_p, mask = jnp.asarray(X_p), jnp.asarray(mask)
    psd, _ = jax.vmap(spp_track_jax)(X_p)
    Vb_spp = jnp.maximum(psd, 1e-6)
    out1 = mcem_m1_batch(vae, X_p, mask, keys, FAST_CFG,
                         update_nmf=False, Vb_fixed=Vb_spp)
    res = jnp.square(1.0 - out1["WFs"]) * X_p
    Vb2 = jnp.maximum(Vb_spp, _ema_time(res, 0.5))
    keys2 = jax.vmap(lambda k: jax.random.fold_in(k, 2))(keys)
    out2 = mcem_m1_batch(vae, X_p, mask, keys2, FAST_CFG,
                         update_nmf=False, Vb_fixed=Vb2)
    assert_allclose(np.asarray(out["WFs"]), np.asarray(out2["WFs"]),
                    atol=1e-6)
    # pass 2 actually moved the solution away from pass 1
    assert not np.allclose(np.asarray(out["WFs"]),
                           np.asarray(out1["WFs"]), atol=1e-3)


def test_ema_time_matches_host_loop():
    """_ema_time (lax.scan IIR along frames) == the straightforward host
    recurrence, including the v0 = P[..., 0] initialization."""
    import jax.numpy as jnp

    from guided_vae_nmf_tpu.pipeline import _ema_time

    r = np.random.RandomState(0).rand(2, 5, 7).astype(np.float32)
    v = r[..., 0].copy()
    want = np.empty_like(r)
    for t in range(r.shape[-1]):
        v = 0.5 * v + 0.5 * r[..., t]
        want[..., t] = v
    assert_allclose(np.asarray(_ema_time(jnp.asarray(r), 0.5)), want,
                    atol=1e-7)


def test_soft_guidance_device_path(tmp_path):
    """soft_guidance=True conditions MCEM on the classifier probabilities
    (not the >0.5 IBM): outputs are finite and differ from the hard run;
    the label side-outputs (soft/hard npy) are unchanged."""
    files = _test_files()[:1]
    dgm = dgm_init(KEY, [513, 513, 8, [32]])
    cls = classifier_init(KEY, [513, [32], 513])
    out_h = str(tmp_path / "hard")
    out_s = str(tmp_path / "soft")
    for out, soft in ((out_h, False), (out_s, True)):
        enhance_files(files, PROCESSED, out, dgm, model_type="m2",
                      classif_type="dnn", classifier_params=cls,
                      cfg=FAST_CFG, soft_guidance=soft)
    base = os.path.splitext(files[0])[0]
    sh, _ = read_wav(os.path.join(out_h, base + "_s_est.wav"))
    ss, _ = read_wav(os.path.join(out_s, base + "_s_est.wav"))
    assert np.all(np.isfinite(sh)) and np.all(np.isfinite(ss))
    assert not np.array_equal(sh, ss)
    # label artifacts identical: soft guidance changes what MCEM consumes,
    # not what the sweep reports
    for suffix in ("_ibm_soft_est.npy", "_ibm_hard_est.npy"):
        a = np.load(os.path.join(out_h, base + suffix))
        b = np.load(os.path.join(out_s, base + suffix))
        assert_allclose(a, b, atol=1e-6)


def test_spp2_pass1_budget_config():
    """spp2's first pass runs cfg.spp2_pass1_niter EM iterations (clamped
    to niter); non-MCEM configs pass through unchanged."""
    from guided_vae_nmf_tpu.mcem import PEEMConfig
    from guided_vae_nmf_tpu.pipeline import _spp2_pass1_cfg

    full = MCEMConfig(niter=100)
    assert _spp2_pass1_cfg(full).niter == 25
    assert _spp2_pass1_cfg(full).nsamples_E_step == full.nsamples_E_step
    assert _spp2_pass1_cfg(MCEMConfig(niter=10)).niter == 10  # no inflation
    assert _spp2_pass1_cfg(MCEMConfig(niter=100, spp2_pass1_niter=0)) is not None
    assert _spp2_pass1_cfg(
        MCEMConfig(niter=100, spp2_pass1_niter=0)).niter == 100  # 0 = off
    pe = PEEMConfig()
    assert _spp2_pass1_cfg(pe) is pe


def test_enhance_batch_noise_gain():
    """MCEMConfig.noise_gain through the batch API: runs on the XLA engine
    (fused gated off), keeps the reconstruction invariant, and is rejected
    with the NMF noise model."""
    import dataclasses

    files = _test_files()[:2]
    X_tfs = [load_mixture(
        os.path.join(PROCESSED, os.path.splitext(p)[0]))[2] for p in files]
    vae = vae_init(KEY, [513, 8, [32]])
    cfg = dataclasses.replace(FAST_CFG, noise_gain=True)
    S_hat, N_hat = enhance_batch(vae, X_tfs, cfg=cfg, noise_model="spp")
    for S, N, X in zip(S_hat, N_hat, X_tfs):
        assert np.all(np.isfinite(S)) and np.all(np.isfinite(N))
        assert_allclose(S + N, X, atol=2e-4 * np.abs(X).max())
    with pytest.raises(ValueError, match="noise_gain"):
        enhance_batch(vae, X_tfs, cfg=cfg, noise_model="nmf")


def test_enhance_files_skip_existing(tmp_path):
    """skip_existing=True resumes a killed sweep: utterances with an
    existing _s_est.wav are not re-enhanced (their outputs keep their
    bytes); missing ones are produced."""
    files = _test_files()[:2]
    vae = vae_init(KEY, [513, 8, [32]])
    enhance_files([files[0]], PROCESSED, str(tmp_path), vae,
                  model_type="m1", cfg=FAST_CFG)
    done = str(tmp_path / (os.path.splitext(files[0])[0] + "_s_est.wav"))
    before = open(done, "rb").read()
    enhance_files(files, PROCESSED, str(tmp_path), vae, model_type="m1",
                  cfg=FAST_CFG, seed=1, skip_existing=True)
    assert open(done, "rb").read() == before   # untouched (seed differs)
    other = str(tmp_path / (os.path.splitext(files[1])[0] + "_s_est.wav"))
    assert os.path.exists(other)
    # all present: returns immediately
    assert enhance_files(files, PROCESSED, str(tmp_path), vae,
                         model_type="m1", cfg=FAST_CFG,
                         skip_existing=True) == 0.0


def test_fast_kwargs_levels():
    """The `fast` level -> fused-engine kwargs mapping: False = exact,
    truthy = bf16 dumps + approx reciprocal, 'trans' adds the
    bit-arithmetic exp/log (bench.py auto-picks between the two on
    hardware)."""
    import jax.numpy as jnp

    from guided_vae_nmf_tpu.pipeline import _fast_kwargs

    assert _fast_kwargs(False) == {}
    base = _fast_kwargs(True)
    assert base == dict(samples_dtype=jnp.bfloat16, approx_recip=True,
                        compute_cost=False)
    trans = _fast_kwargs("trans")
    assert trans == dict(base, approx_trans=True)
