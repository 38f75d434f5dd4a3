"""Real-noise system matrix on the bundled QUT test mixtures.

Reproduces VALIDATION.md's real-noise table for a given artifact set:
each system enhances the 3 bundled WSJ+QUT mixtures (−5/0/0 dB) and the
script prints SI-SDR (mixture → enhanced), ESTOI and PESQ-wb per
utterance. Used to compare the round-1 subset-trained models against the
round-3 augmentation-trained ones (VERDICT item 3).

Usage: python scripts/eval_real_noise.py [--artifacts artifacts/pretrained]
       [--niter 100] [--systems m2dnn_spp,m2oracle_spp,wiener,m1_spp]
       [--work /tmp/real_noise_eval] [--noise_gain 0] [--soft_labels 0]
       [--seeds 1]

--noise_gain 1 enables the per-frame noise gain (MCEMConfig.noise_gain)
on the fixed-noise systems (spp/spp2 suffixes only). --seeds N repeats
each MCEM system with N independent PRNG seeds and reports mean±sd per
utterance (the MH sampling noise is ~0.02-0.1 dB — seed-average any
claimed delta of that order).
"""

import os
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

os.environ.setdefault(
    "GVNMF_CACHE_DIR", os.path.expanduser("~/.cache/gvnmf_xla")
)

import numpy as np

from guided_vae_nmf_tpu.data import read_wav, speech_list
from guided_vae_nmf_tpu.mcem import MCEMConfig
from guided_vae_nmf_tpu.metrics import energy_ratios, stoi, pesq
from guided_vae_nmf_tpu.pipeline import enhance_files, enhance_files_wiener
from _common import load_model, load_norm_stats, flag

SUB = "/root/reference/data/subset"
FS = 16000


def metrics_for(processed, est_dir, files):
    rows = []
    for p in files:
        bp = os.path.join(processed, os.path.splitext(p)[0])
        be = os.path.join(est_dir, os.path.splitext(p)[0])
        s, _ = read_wav(bp + "_s.wav")
        n, _ = read_wav(bp + "_n.wav")
        x, _ = read_wav(bp + "_x.wav")
        sh, _ = read_wav(be + "_s_est.wav")
        L = min(len(s), len(sh))
        s, n, x, sh = s[:L], n[:L], x[:L], sh[:L]
        rows.append((
            energy_ratios(x, s, n)[0], energy_ratios(sh, s, n)[0],
            stoi(s, sh, FS, True), pesq(FS, s, sh, "wb"),
        ))
    return rows


def main(argv=None):
    argv = argv or sys.argv[1:]
    artifacts = flag(argv, "artifacts", "artifacts/pretrained")
    niter = flag(argv, "niter", 100, int)
    work = flag(argv, "work", "/tmp/real_noise_eval")
    systems = flag(
        argv, "systems", "m2dnn_spp,m2oracle_spp,wiener,m1_spp").split(",")
    soft_labels = flag(argv, "soft_labels", "0") in ("1", "true")
    noise_gain = flag(argv, "noise_gain", "0") in ("1", "true")
    ng_bands = flag(argv, "noise_gain_bands", 1, int)

    seeds = flag(argv, "seeds", 1, int)
    algo = flag(argv, "algorithm", "mcem")

    profile = flag(argv, "profile", None)
    if profile is not None:
        # validated preset (profiles.py): authoritative for the managed
        # knobs; also selects the flagship system at the preset's noise
        # model unless --systems was given explicitly
        from guided_vae_nmf_tpu.profiles import get_profile

        prof = get_profile(profile)
        noise_model, soft_labels = prof.noise_model, prof.soft_guidance
        if not prof.offline:
            raise SystemExit(f"profile {profile!r} is streaming-only "
                             "(use eval_streaming_m2.py)")
        noise_gain = prof.cfg_overrides.get("noise_gain", False)
        ng_bands = prof.cfg_overrides.get("noise_gain_bands", 1)
        if flag(argv, "systems") is None:
            systems = [f"m2dnn_{prof.noise_model}"]

    files = speech_list(f"{SUB}/raw/", "test")
    processed = f"{SUB}/processed/"
    if algo == "peem":
        from guided_vae_nmf_tpu.mcem import PEEMConfig

        cfg = PEEMConfig(niter=niter, noise_gain=noise_gain,
                         noise_gain_bands=ng_bands)
    else:
        cfg = MCEMConfig(niter=niter, noise_gain=noise_gain,
                         noise_gain_bands=ng_bands)

    m2 = load_model(os.path.join(artifacts, "M2_ibm"), kind="dgm")
    results = {}
    for sysname in systems:
        suffix = "_soft" if soft_labels and sysname.startswith("m2dnn_") \
            else ""
        t0 = time.perf_counter()
        # model weights / norm stats are seed-independent: load once
        if sysname.startswith("m2dnn_"):
            cls = load_model(os.path.join(artifacts, "classifier_ibm"),
                             kind="classifier")
            mean, std = load_norm_stats(
                os.path.join(artifacts, "classifier_ibm"))
        elif sysname.startswith("m1_"):
            m1 = load_model(os.path.join(artifacts, "M1"), kind="vae")
        elif sysname == "wiener":
            w = load_model(os.path.join(artifacts, "wiener"),
                           kind="classifier")
            mean, std = load_norm_stats(os.path.join(artifacts, "wiener"))
        elif not sysname.startswith("m2oracle_"):
            raise SystemExit(f"unknown system {sysname}")
        per_seed = []
        # deterministic systems run once regardless of --seeds: the wiener
        # baseline has no sampling, and PEEM's only key use is the NMF
        # init, bypassed under the fixed-noise (spp/spp2) models
        deterministic = sysname == "wiener" or (
            algo == "peem" and sysname.split("_", 1)[-1] in ("spp", "spp2"))
        for seed in range(1 if deterministic else seeds):
            out = os.path.join(work, artifacts.replace("/", "_"),
                               sysname + suffix + f"_seed{seed}")
            if sysname.startswith("m2dnn_"):
                enhance_files(files, processed, out, m2, model_type="m2",
                              classif_type="dnn", classifier_params=cls,
                              mean=mean, std=std, cfg=cfg, batch_size=4,
                              noise_model=sysname.split("_", 1)[1],
                              soft_guidance=soft_labels, seed=seed)
            elif sysname.startswith("m2oracle_"):
                enhance_files(files, processed, out, m2, model_type="m2",
                              classif_type="oracle", cfg=cfg, batch_size=4,
                              noise_model=sysname.split("_", 1)[1],
                              seed=seed)
            elif sysname.startswith("m1_"):
                enhance_files(files, processed, out, m1, model_type="m1",
                              cfg=cfg, batch_size=4,
                              noise_model=sysname.split("_", 1)[1],
                              seed=seed)
            else:
                enhance_files_wiener(files, processed, out, w, mean=mean,
                                     std=std)
            per_seed.append(metrics_for(processed, out, files))
        results[sysname] = per_seed
        print(f"[{sysname}] done in {time.perf_counter() - t0:.1f}s "
              f"({len(per_seed)} seed(s))", flush=True)

    print(f"\nReal-noise QUT table ({artifacts}, niter={niter}, "
          f"seeds={seeds}):")
    print(f"{'system':<14}" + "".join(
        f"{os.path.basename(f)[:-4]:>30}" for f in files))
    for sysname, per_seed in results.items():
        arr = np.asarray(per_seed)          # (S, n_files, 4)
        mean_ = arr.mean(axis=0)
        sd = arr.std(axis=0)
        cells = []
        for j in range(arr.shape[1]):
            a, bdb, e, p = mean_[j]
            if arr.shape[0] > 1:
                cells.append(f"{a:+.2f}->{bdb:+.2f}±{sd[j][1]:.2f} "
                             f"{e:.3f} {p:.2f}")
            else:
                cells.append(f"{a:+.2f}->{bdb:+.2f} {e:.3f} {p:.2f}")
        print(f"{sysname:<14}" + "".join(f"{c:>30}" for c in cells))
    print("(cells: SI-SDR mix->enh dB [±sd over seeds], ESTOI, PESQ-wb)")


if __name__ == "__main__":
    main()
