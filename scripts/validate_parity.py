"""Behavioral parity harness: train a subset M2, enhance the subset test
mixtures with BOTH this framework's batched MCEM and the reference's torch
MCEM (loaded with identical weights), and print side-by-side SI-SDR/ESTOI.

See VALIDATION.md for recorded results. Requires /root/reference (read-only)
for the reference engine half; ours runs regardless.

Usage: python scripts/validate_parity.py [--work /tmp/quality]
       [--epochs 150] [--niter 50]
"""

import os
import sys
import time

sys.path.insert(0, ".")

import numpy as np

from guided_vae_nmf_tpu.data import (
    create_noisy_frames,
    create_test_mixtures,
    read_wav,
    speech_list,
)
from guided_vae_nmf_tpu.data.h5io import H5FrameReader
from guided_vae_nmf_tpu.dsp import stft, istft, clean_speech_IBM
from guided_vae_nmf_tpu.train import TrainConfig, train_m2
from guided_vae_nmf_tpu.train.checkpoints import best_checkpoint, load_params
from guided_vae_nmf_tpu.mcem import MCEMConfig
from guided_vae_nmf_tpu.pipeline import enhance_files
from guided_vae_nmf_tpu.metrics import energy_ratios, stoi
from guided_vae_nmf_tpu.models import export_vae
from _common import flag, pin_platform

SUB = "/root/reference/data/subset"
FS = 16000


def make_noise(seed, kind):
    r = np.random.RandomState(seed)
    n = r.randn(FS * 60)
    if kind == "lowpass":
        from scipy.signal import lfilter

        n = lfilter([1], [1, -0.9], n)
    return n / np.abs(n).max()


def collect_metrics(bp, s_hat):
    """(si_sdr, estoi, pesq_wb) of an enhanced track vs the sources."""
    from guided_vae_nmf_tpu.metrics import pesq

    s, _ = read_wav(bp + "_s.wav")
    n, _ = read_wav(bp + "_n.wav")
    L = min(len(s), len(s_hat))
    s, n, sh = s[:L], n[:L], s_hat[:L]
    return (energy_ratios(sh, s, n)[0], stoi(s, sh, FS, True),
            pesq(FS, s, sh, "wb"))


def metrics_line(tag, name, bp, s_hat):
    from guided_vae_nmf_tpu.metrics import pesq

    s, _ = read_wav(bp + "_s.wav")
    n, _ = read_wav(bp + "_n.wav")
    x, _ = read_wav(bp + "_x.wav")
    L = min(len(s), len(s_hat))
    s, n, x = s[:L], n[:L], x[:L]
    sdr, est, psq = collect_metrics(bp, s_hat)
    print(f"{name} {tag}: SI-SDR {energy_ratios(x, s, n)[0]:.1f} -> "
          f"{sdr:.1f} dB | "
          f"ESTOI {stoi(s, x, FS, True):.3f} -> {est:.3f}"
          f" | PESQ {pesq(FS, s, x, 'wb'):.2f} -> {psq:.2f}")


def reference_model(m2):
    """The reference's torch `DeepGenerativeModel` loaded with this
    framework's M2 weights (via export_vae), frozen for inference — the
    engine-vs-engine comparison half used by both `main` and
    `seed_averaged`."""
    import torch

    sys.path.insert(0, "/root/reference")
    from python.models.models import DeepGenerativeModel

    tm = DeepGenerativeModel([513, 513, 32, [128, 128]], None)
    sd = {k: torch.from_numpy(np.asarray(v).copy())
          for k, v in export_vae(m2).items()}
    tm.load_state_dict(sd)
    tm.eval()
    for p in tm.parameters():
        p.requires_grad = False
    return tm


def main(argv=None):
    argv = argv or sys.argv[1:]
    pin_platform(argv)
    work = flag(argv, "work", "/tmp/quality")
    epochs = flag(argv, "epochs", 150, int)
    niter = flag(argv, "niter", 50, int)
    os.makedirs(work, exist_ok=True)

    noise = {"white": make_noise(1, "white"), "low": make_noise(2, "lowpass")}
    h5 = f"{work}/noisy.h5"
    if not os.path.exists(h5):
        create_noisy_frames(f"{SUB}/raw/", h5,
                            {"train": noise, "validation": noise},
                            dataset_types=("train", "validation"),
                            labels="noisy_labels", quantile_fraction=0.999,
                            snrs=(-5, 0, 5))
        create_test_mixtures(f"{SUB}/raw/", f"{work}/proc/", noise,
                             dataset_type="test", snrs=(0.0,),
                             noise_types=("white", "low"))

    ckpt = best_checkpoint(f"{work}/M2")
    if ckpt is None:
        r = H5FrameReader(h5, "train"); Xtr, Ytr = r.load_all(); r.close()
        r = H5FrameReader(h5, "validation"); Xva, Yva = r.load_all(); r.close()
        cfg = TrainConfig(end_epoch=epochs, batch_size=256)
        m2, hist = train_m2((Xtr, Ytr), (Xva, Yva),
                            dims=(513, 513, 32, (128, 128)), cfg=cfg,
                            model_dir=f"{work}/M2", name="M2")
        print(f"M2 best valid {min(h['valid'] for h in hist):.1f}")
    m2 = load_params(best_checkpoint(f"{work}/M2"), static={"y_dim": 513})

    files = speech_list(f"{SUB}/raw/", "test")
    # --utts <substring[,substring]>: restrict the gate study to matching
    # utterances (VERDICT round-3 item 5 — resolve utterance a's
    # niter=100 PESQ residual with a larger per-utterance seed count)
    only = flag(argv, "utts")
    if only:
        subs = only.split(",")
        files = [f for f in files if any(s in f for s in subs)]
        assert files, f"--utts {only!r} matched nothing"
    mc = MCEMConfig(niter=niter)
    seeds = flag(argv, "seeds", 0, int)
    engine = flag(argv, "engine", "both")
    if engine == "report":
        return gate_report(work, files, niter)
    if engine == "paired":
        return paired_seeds(work, files, m2, mc, seeds or 8)
    if engine == "paired-report":
        return paired_report(work, files, niter)
    if seeds:
        return seed_averaged(work, files, m2, mc, seeds, engine)

    t0 = time.time()
    enhance_files(files, f"{work}/proc/", f"{work}/est/", m2,
                  model_type="m2", classif_type="oracle", cfg=mc,
                  batch_size=4)
    print(f"[ours] batched enhancement: {time.time() - t0:.1f}s total")
    for name in files:
        bp = os.path.join(f"{work}/proc/", os.path.splitext(name)[0])
        be = os.path.join(f"{work}/est/", os.path.splitext(name)[0])
        sh, _ = read_wav(be + "_s_est.wav")
        metrics_line("OURS", os.path.basename(name), bp, sh)

    if not os.path.isdir("/root/reference/python"):
        print("reference tree absent; skipping torch half")
        return
    tm = reference_model(m2)
    for name in files:
        bp = os.path.join(f"{work}/proc/", os.path.splitext(name)[0])
        t0 = time.time()
        sh = run_reference_engine(tm, bp, mc)
        metrics_line(f"REF ({time.time() - t0:.0f}s)",
                     os.path.basename(name), bp, sh)


def run_reference_engine(tm, bp, mc):
    """One utterance through the reference's torch MCEM_M2 (oracle IBM).

    Takes the full MCEMConfig (not just niter) so nmf_rank/eps always
    match what record_reference_stream reads — the common-random-numbers
    pairing silently desynchronizes if the two halves ever disagree."""
    import torch

    from python.models.mcem import MCEM_M2

    x_t, _ = read_wav(bp + "_x.wav")
    s_t, _ = read_wav(bp + "_s.wav")
    X = stft(x_t).T
    y = clean_speech_IBM(stft(s_t), 0.98, 0.999)
    mcem = MCEM_M2(niter=mc.niter, nsamples_E_step=mc.nsamples_E_step,
                   burnin_E_step=mc.burnin_E_step, nsamples_WF=mc.nsamples_WF,
                   burnin_WF=mc.burnin_WF, var_RW=mc.var_RW)
    mcem.init_parameters(X=X, y=torch.from_numpy(y.T.copy()), vae=tm,
                         nmf_rank=mc.nmf_rank, eps=mc.eps, device="cpu")
    mcem.run()
    return istft(mcem.S_hat, max_len=len(x_t))


def _gate_store(work, engine, niter):
    return os.path.join(work, f"gate_{engine}_niter{niter}.json")


def _load_gate(path):
    import json

    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    return {}


def _save_gate(path, data):
    import json

    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(data, f)
    os.replace(tmp, path)


def seed_averaged(work, files, m2, mc, seeds, engine="both"):
    """BASELINE.json quality gate: the MH trajectories are stochastic, so a
    single run's PESQ/ESTOI carries MH sampling noise ~0.05. Averaging K
    independent seeds on BOTH engines isolates the systematic
    engine-vs-engine delta, which is the quantity the gate bounds
    (|Δmean| ≤ 0.01).

    Per-seed metrics persist to gate_{ours,ref}_niter{N}.json in `work`,
    so long runs resume where they stopped and the two engine halves can
    run as concurrent processes (`--engine ours` on the chip while
    `--engine ref` burns CPU). `--engine report` prints the table with
    95% t-CIs on every Δmean from whatever has accumulated."""
    if engine in ("both", "ours", "peem"):
        tag = "ours" if engine != "peem" else "peem"
        cfg = mc
        if tag == "peem":
            from guided_vae_nmf_tpu.mcem import PEEMConfig

            cfg = PEEMConfig(niter=mc.niter)
        path = _gate_store(work, tag, mc.niter)
        done = _load_gate(path)
        for k in range(seeds):
            if str(k) in done:
                continue
            est = f"{work}/est_{tag}_s{k}/"
            t0 = time.time()
            enhance_files(files, f"{work}/proc/", est, m2,
                          model_type="m2", classif_type="oracle", cfg=cfg,
                          batch_size=4, seed=k)
            wall = time.time() - t0
            row = {}
            for name in files:
                bp = os.path.join(f"{work}/proc/",
                                  os.path.splitext(name)[0])
                be = os.path.join(est, os.path.splitext(name)[0])
                sh, _ = read_wav(be + "_s_est.wav")
                row[name] = collect_metrics(bp, sh)
            row["_wall_s"] = wall
            done[str(k)] = row
            _save_gate(path, done)
            print(f"[{tag}] seed {k} done ({wall:.1f}s)", flush=True)

    if engine in ("both", "ref"):
        import torch

        tm = reference_model(m2)
        path = _gate_store(work, "ref", mc.niter)
        done = _load_gate(path)
        for k in range(seeds):
            if str(k) in done:
                continue
            torch.manual_seed(k)
            row = {}
            for name in files:
                bp = os.path.join(f"{work}/proc/",
                                  os.path.splitext(name)[0])
                sh = run_reference_engine(tm, bp, mc)
                row[name] = collect_metrics(bp, sh)
            done[str(k)] = row
            _save_gate(path, done)
            print(f"[ref] seed {k} done", flush=True)

    gate_report(work, files, mc.niter)


def gate_report(work, files, niter):
    """Seed-averaged delta table with 95% t-CIs from the persisted
    per-seed stores (uses the seeds present in BOTH engines' stores)."""
    from scipy import stats as sps

    o_all = _load_gate(_gate_store(work, "ours", niter))
    r_all = _load_gate(_gate_store(work, "ref", niter))
    common = sorted(set(o_all) & set(r_all), key=int)
    if not common:
        print("no common seeds recorded yet")
        return
    K = len(common)
    print(f"\nSeed-averaged engine-vs-engine deltas ({K} seeds, "
          f"niter={niter}):")
    hdr = ("utterance", "metric", "ours mean±sd", "ref mean±sd",
           "Δmean", "95% CI")
    print("{:<14} {:<7} {:>14} {:>14} {:>8} {:>18}".format(*hdr))
    # K=1: sd/CI are undefined (ddof=1 variance of one sample, t with
    # df=0) — print means with zero spread instead of NaNs
    tcrit = sps.t.ppf(0.975, K - 1) if K > 1 else 0.0
    sd = ((lambda v: v.std(ddof=1)) if K > 1
          else (lambda v: 0.0))
    var1 = ((lambda v: v.var(ddof=1)) if K > 1
            else (lambda v: 0.0))
    agg = {"SI-SDR": [], "ESTOI": [], "PESQ": []}
    for name in files:
        o = np.asarray([o_all[s][name] for s in common])
        r = np.asarray([r_all[s][name] for s in common])
        for i, met in enumerate(("SI-SDR", "ESTOI", "PESQ")):
            # paired-by-seed differences: seeds are independent draws of
            # the same MH process, so the unpaired Welch CI is the right
            # bound on the mean difference
            d = o[:, i].mean() - r[:, i].mean()
            se = np.sqrt(var1(o[:, i]) / K + var1(r[:, i]) / K)
            agg[met].append(d)
            print("{:<14} {:<7} {:>7.3f}±{:<5.3f} {:>7.3f}±{:<5.3f} "
                  "{:>+8.3f} [{:+.3f}, {:+.3f}]".format(
                      os.path.basename(name), met,
                      o[:, i].mean(), sd(o[:, i]),
                      r[:, i].mean(), sd(r[:, i]), d,
                      d - tcrit * se, d + tcrit * se))
    for met, ds in agg.items():
        print(f"mean |Δ{met}| over utterances: "
              f"{np.abs(np.asarray(ds)).mean():.4f}")

    p_all = _load_gate(_gate_store(work, "peem", niter))
    if p_all:
        pk = sorted(p_all, key=int)
        Kp = len(pk)
        print(f"\nPEEM (gradient E-step) vs MCEM ours, {Kp} seeds, "
              f"niter={niter}:")
        print("{:<14} {:<7} {:>14} {:>14} {:>8}".format(
            "utterance", "metric", "peem mean±sd", "mcem mean±sd",
            "Δ(peem-mcem)"))
        for name in files:
            p = np.asarray([p_all[s][name] for s in pk])
            o = np.asarray([o_all[s][name] for s in common])
            for i, met in enumerate(("SI-SDR", "ESTOI", "PESQ")):
                print("{:<14} {:<7} {:>7.3f}±{:<5.3f} {:>7.3f}±{:<5.3f} "
                      "{:>+8.3f}".format(
                          os.path.basename(name), met,
                          p[:, i].mean(), p[:, i].std(ddof=1),
                          o[:, i].mean(), o[:, i].std(ddof=1),
                          p[:, i].mean() - o[:, i].mean()))
        pw = [p_all[s].get("_wall_s") for s in pk]
        ow = [o_all[s].get("_wall_s") for s in common]
        pw = [w for w in pw if w]
        ow = [w for w in ow if w]
        if pw and ow:
            # steady-state walls (skip each store's first seed: compile)
            ps = np.median(pw[1:] or pw)
            osd = np.median(ow[1:] or ow)
            print(f"wall/seed (3-utt batch, median): peem {ps:.1f}s, "
                  f"mcem {osd:.1f}s -> speedup x{osd / ps:.1f}")




def paired_seeds(work, files, m2, mc, seeds):
    """Common-random-numbers gate: run the torch reference from
    torch.manual_seed(k), replay its EXACT RNG stream through our engine
    (record_reference_stream -> mcem_run(noise=..., init_nmf=...)), and
    difference the two halves PER SEED. The MH randomness cancels, so the
    per-seed delta is the pure numerical engine difference — orders of
    magnitude less variance than the unpaired seed_averaged estimator
    (VERDICT round-3 item 5: settle utterance a's -0.017 PESQ residual
    with a mechanism-level measurement)."""
    import jax
    import jax.numpy as jnp
    import torch

    from guided_vae_nmf_tpu.mcem import mcem_run
    from guided_vae_nmf_tpu.models.torch_import import (
        record_reference_stream,
    )

    tm = reference_model(m2)
    params = {k: v for k, v in m2.items() if k != "y_dim"}
    L = int(m2["encoder"]["mu"]["w"].shape[1])
    path = _gate_store(work, "paired", mc.niter)
    done = _load_gate(path)
    for k in range(seeds):
        # resume at (seed, utterance) granularity so a store built with
        # --utts can later be filled in for the remaining utterances
        row = dict(done.get(str(k), {}))
        if all(name in row for name in files):
            continue
        for name in files:
            if name in row:
                continue
            bp = os.path.join(f"{work}/proc/", os.path.splitext(name)[0])
            torch.manual_seed(k)
            t0 = time.time()
            sh_ref = run_reference_engine(tm, bp, mc)
            t_ref = time.time() - t0

            x_t, _ = read_wav(bp + "_x.wav")
            s_t, _ = read_wav(bp + "_s.wav")
            X = stft(x_t).T  # (N, F) complex
            y = clean_speech_IBM(stft(s_t), 0.98, 0.999)  # (F, N)
            Nfrm, Fdim = X.shape
            # the stream replay is a CPU torch RNG walk, not engine work —
            # time it apart so t_ours covers only the XLA engine
            t0 = time.time()
            W0, H0, g0, noise = record_reference_stream(
                k, Fdim, Nfrm, L, mc)
            t_rec = time.time() - t0
            t0 = time.time()
            out = mcem_run(params, jnp.asarray(np.abs(X.T) ** 2),
                           jnp.ones((Nfrm,)), jnp.asarray(y.copy()),
                           jax.random.PRNGKey(0), mc,
                           init_nmf=(jnp.asarray(W0), jnp.asarray(H0),
                                     jnp.asarray(g0)), noise=noise)
            sh_ours = istft(np.asarray(out["WFs"]) * np.asarray(X.T),
                            max_len=len(x_t))
            t_ours = time.time() - t0
            row[name] = {
                "ref": collect_metrics(bp, sh_ref),
                "ours": collect_metrics(bp, sh_ours),
                "wav_rel_l2": float(np.linalg.norm(sh_ours - sh_ref)
                                    / np.linalg.norm(sh_ref)),
            }
            print(f"[paired] seed {k} {os.path.basename(name)}: "
                  f"dPESQ {row[name]['ours'][2] - row[name]['ref'][2]:+.4f}"
                  f" wav_rel_l2 {row[name]['wav_rel_l2']:.2e}"
                  f" (ref {t_ref:.0f}s ours {t_ours:.0f}s"
                  f" +replay {t_rec:.0f}s)", flush=True)
            done[str(k)] = row
            _save_gate(path, done)
    paired_report(work, files, mc.niter)


def paired_report(work, files, niter):
    """Paired per-seed delta table (mean, sd, 95% t-CI) from the
    gate_paired store."""
    from scipy import stats as sps

    all_ = _load_gate(_gate_store(work, "paired", niter))
    ks = sorted(all_, key=int)
    if not ks:
        print("no paired seeds recorded yet")
        return
    K = len(ks)
    print(f"\nPaired (common-random-numbers) engine deltas "
          f"({K} seeds, niter={niter}; randomness cancelled, numerical "
          f"difference only):")
    tcrit = sps.t.ppf(0.975, K - 1) if K > 1 else 0.0
    for name in files:
        rows = [all_[s][name] for s in ks if name in all_[s]]
        if not rows:
            continue
        d = np.asarray([np.asarray(r["ours"]) - np.asarray(r["ref"])
                        for r in rows])
        l2 = np.asarray([r["wav_rel_l2"] for r in rows])
        for i, met in enumerate(("SI-SDR", "ESTOI", "PESQ")):
            m, s = d[:, i].mean(), (d[:, i].std(ddof=1) if K > 1 else 0.0)
            se = s / np.sqrt(K)
            print(f"  {os.path.basename(name):<14} {met:<7} "
                  f"paired Δ {m:+.4f} ± {s:.4f}  "
                  f"95% CI [{m - tcrit * se:+.4f}, {m + tcrit * se:+.4f}]")
        print(f"  {os.path.basename(name):<14} wav_rel_l2 "
              f"mean {l2.mean():.3e} max {l2.max():.3e}")


if __name__ == "__main__":
    main()
