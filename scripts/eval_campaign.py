"""Designed-scale evaluation campaign (VERDICT round-3 item 1): run the
reference's FULL metric protocol — per-input-SNR 95%-CI aggregation over
~hundreds of utterances (reference python/metrics.py:70-130,
scripts/run_metrics_M2.py:236-244) — at the scale it was designed for,
using an in-tree synthesized corpus.

The bundled subset has 3 test utterances; every quality conclusion so far
rests on them. This campaign synthesizes a speaker-disjoint multi-speaker
test corpus (phase-vocoder voice variants x balanced SNR grid x rotating
QUT-analogue noise families), retrains all model families on an enlarged
speaker-disjoint bank, sweeps the flagship systems/profiles, and prints
the reference-format mean±CI tables per input SNR — plus the per-noise-
family classifier F1 (the round-3 'kitchen F1 0.41' re-measurement).

Speaker-disjoint splits over the bundled clean material (reference
subset: 21 utterances, 7 speakers):
  train: WSJ 011 (si_tr_s) + NTCD Lipspkr1, 01M          (9 utts)
  valid: WSJ 050 (si_dt_05)                              (3 utts)
  test : WSJ 440 (si_et_05) + NTCD 08F, 34M              (9 utts)
Test noise is drawn from a DIFFERENT bank seed than training (held-out
noise instances); babble is built from TRAIN speech only.

Usage: python scripts/eval_campaign.py [--work /tmp/gvnmf_campaign]
       [--models <dir>|retrain] [--voices 9] [--snrs -5,0,5] [--niter 100]
       [--epochs 200] [--systems mixture,m2dnn_reference,...]
       [--batch_size 16] [--smoke 1]
"""

import glob
import json
import os
import shutil
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

os.environ.setdefault(
    "GVNMF_CACHE_DIR", os.path.expanduser("~/.cache/gvnmf_xla")
)

import numpy as np

from _common import backend_info, flag, load_model, load_norm_stats

FS = 16000
SUB = "/root/reference/data/subset"
# QUT-analogue test families (reference qut_database.py:46-51 uses
# {cafe, car, home-kitchen, street-city}; the synthetic analogues are
# cafe / car / clatter (impulsive kitchen) / babble)
TEST_FAMILIES = ("cafe", "car", "clatter", "babble")
TEST_BANK_SEED = 202         # != the training bank's seed (11)

ALL_SYSTEMS = ("mixture", "m2dnn_reference", "m2dnn_real-noise",
               "m2dnn_impulse-noise", "wiener", "m1_spp",
               "m2oracle_reference", "m2oracle_real-noise")


def _wsj(split, spk):
    return sorted(glob.glob(
        f"{SUB}/raw/CSR-1-WSJ-0/WAV/wsj0/{split}/{spk}/*.wav"))


def _ntcd(spk):
    return sorted(glob.glob(
        f"{SUB}/raw/ntcd_timit/Clean/*/{spk}/straightcam/*.wav"))


def campaign_splits():
    """Speaker-disjoint (paths_train, paths_valid, paths_test)."""
    train = _wsj("si_tr_s", "011") + _ntcd("Lipspkr1") + _ntcd("01M")
    valid = _wsj("si_dt_05", "050")
    test = _wsj("si_et_05", "440") + _ntcd("08F") + _ntcd("34M")
    assert len(train) == 9 and len(valid) == 3 and len(test) == 9
    return train, valid, test


def _load_clean(p):
    from guided_vae_nmf_tpu.data import read_wav

    x, _ = read_wav(p)
    if x.ndim > 1:
        x = x[:, 0]
    x = x[int(0.1 * FS):]
    return x / np.max(np.abs(x))


def build_test_corpus(work, n_voices, snrs, train_clean):
    """Synthesize the balanced test corpus: every (test utterance x voice
    variant) mixed at EVERY SNR with a deterministically rotating noise
    family (each family appears equally at each SNR). Writes the
    reference's `<utt>_{s,n,x}.wav` triples (joint max-normalization,
    create_test_set.py:99-103) plus a manifest. Returns the manifest."""
    from guided_vae_nmf_tpu.data import write_wav
    from guided_vae_nmf_tpu.data.noise import (
        noise_segment, synthetic_noise_bank,
    )
    from guided_vae_nmf_tpu.data.synthesis import (
        VOICE_VARIANTS, voice_variants,
    )

    corpus = os.path.join(work, "corpus")
    manifest_path = os.path.join(corpus, "manifest.json")
    want = {"n_voices": n_voices, "snrs": list(snrs),
            "families": list(TEST_FAMILIES), "seed": TEST_BANK_SEED,
            "naming": "speaker-prefixed"}
    if os.path.exists(manifest_path):
        m = json.load(open(manifest_path))
        if m.get("config") == want:
            return m
    os.makedirs(corpus, exist_ok=True)

    # held-out noise instances: new seed; babble from TRAIN speech
    bank = synthetic_noise_bank(train_clean, seed=TEST_BANK_SEED,
                                rich=True)
    bank = {f: bank[f] for f in TEST_FAMILIES}

    _, _, test_paths = campaign_splits()
    variants = VOICE_VARIANTS[:n_voices]
    rng = np.random.RandomState(7)
    entries = []
    fam_i = 0
    for p in test_paths:
        x = _load_clean(p)
        base = os.path.splitext(os.path.basename(p))[0]
        spk = os.path.basename(os.path.dirname(
            os.path.dirname(p) if "straightcam" in p else p))
        for vi, v in enumerate(voice_variants(x, variants)):
            for snr in snrs:
                fam = TEST_FAMILIES[fam_i % len(TEST_FAMILIES)]
                fam_i += 1
                np.random.seed(rng.randint(1 << 30))
                nz = noise_segment(bank, fam, v)
                k = np.sum(v ** 2) * 10 ** (-snr / 10) / np.sum(nz ** 2)
                nz = nz * np.sqrt(k)
                mix = v + nz
                # reference create_test_set.py:99-103: joint max-norm
                norm = max(np.abs(v).max(), np.abs(nz).max(),
                           np.abs(mix).max())
                # speaker prefix: NTCD wav basenames repeat across
                # speakers (08F/sa2.wav vs 34M/sa2.wav), so the bare
                # basename is NOT corpus-unique
                name = f"{spk}_{base}_v{vi}_snr{int(snr):+d}"
                out = os.path.join(corpus, name)
                write_wav(out + "_s.wav", (v / norm).astype(np.float32),
                          FS)
                write_wav(out + "_n.wav", (nz / norm).astype(np.float32),
                          FS)
                write_wav(out + "_x.wav", (mix / norm).astype(np.float32),
                          FS)
                entries.append({"name": name + ".wav", "snr": snr,
                                "family": fam, "speaker": spk,
                                "voice": vi})
    names = [e["name"] for e in entries]
    assert len(set(names)) == len(names), "corpus names must be unique"
    manifest = {"config": want, "entries": entries}
    json.dump(manifest, open(manifest_path, "w"))
    print(f"corpus: {len(entries)} mixtures "
          f"({len(test_paths)} utts x {len(variants)} voices x "
          f"{len(snrs)} SNRs), families {TEST_FAMILIES}", flush=True)
    return manifest


def retrain(work, epochs, train_voices):
    """Retrain M1 / M2-IBM / classifier / wiener on the enlarged
    speaker-disjoint bank: voice-variant + gain augmented clean speech,
    rich 10-family synthetic noise (training seed), wide SNR grid.
    Reuses pretrain_subset's build/train plumbing."""
    from pretrain_subset import build, clean_labeled_frames
    from guided_vae_nmf_tpu.data.noise import synthetic_noise_bank
    from guided_vae_nmf_tpu.data.synthesis import (
        VOICE_VARIANTS, augment_clean, voice_variants,
    )
    from guided_vae_nmf_tpu.train import (
        TrainConfig, train_classifier, train_m1, train_m2, train_wiener,
    )
    from guided_vae_nmf_tpu.train.checkpoints import best_checkpoint

    models = os.path.join(work, "models")
    all_jobs = ("M1", "M2_ibm", "classifier_ibm", "wiener")
    if all(os.path.exists(os.path.join(models, j)) for j in all_jobs):
        print(f"models: reusing {models}", flush=True)
        return models

    # frame bank is expensive to build (voice variants + mixing + STFT of
    # ~400 streams); cache it so interrupted retrains resume per job
    bank_npz = os.path.join(work, "train_bank.npz")
    if os.path.exists(bank_npz):
        z = np.load(bank_npz)
        (Xtr, Yibm_tr, Ywf_tr, Xva, Yibm_va, Ywf_va,
         Xc_tr, Yc_ibm_tr, Xc_va, Yc_ibm_va) = (
            z[k] for k in ("Xtr", "Yibm_tr", "Ywf_tr", "Xva", "Yibm_va",
                           "Ywf_va", "Xc_tr", "Yc_ibm_tr", "Xc_va",
                           "Yc_ibm_va"))
        clean_tr = clean_va = None
        print(f"bank: cached {Xtr.shape[0]} noisy / "
              f"{Xc_tr.shape[0]} clean train frames", flush=True)
    else:
        tr_paths, va_paths, _ = campaign_splits()
        base_tr = [_load_clean(p) for p in tr_paths]
        clean_va = [_load_clean(p) for p in va_paths]
        # synthetic speakers + level diversity on the training side
        clean_tr = []
        for x in base_tr:
            clean_tr.extend(
                voice_variants(x, VOICE_VARIANTS[:train_voices]))
        clean_tr = augment_clean(clean_tr, factors=(), gains=(0.7, 1.4))

        noise = synthetic_noise_bank(base_tr, seed=11, rich=True)
        t0 = time.perf_counter()
        Xtr, Yibm_tr, _, Ywf_tr = build(
            clean_tr, noise, 0, n_mix=3,
            snrs=(-7.5, -5, -2.5, 0, 2.5, 5.0, 7.5, 10.0),
            include_clean=True)
        Xva, Yibm_va, _, Ywf_va = build(clean_va, noise, 1, n_mix=4,
                                        snrs=(-5, -2.5, 0, 2.5, 5.0))
        Xc_tr, Yc_ibm_tr, _ = clean_labeled_frames(clean_tr)
        Xc_va, Yc_ibm_va, _ = clean_labeled_frames(clean_va)
        np.savez(bank_npz, Xtr=Xtr, Yibm_tr=Yibm_tr, Ywf_tr=Ywf_tr,
                 Xva=Xva, Yibm_va=Yibm_va, Ywf_va=Ywf_va, Xc_tr=Xc_tr,
                 Yc_ibm_tr=Yc_ibm_tr, Xc_va=Xc_va, Yc_ibm_va=Yc_ibm_va)
        print(f"bank: {Xtr.shape[0]} noisy / {Xc_tr.shape[0]} clean train "
              f"frames ({time.perf_counter() - t0:.0f}s to build)",
              flush=True)

    eps = 1e-8
    mean, std = Xtr.mean(0), Xtr.std(0)
    Xn_tr = ((Xtr - mean) / (std + eps)).astype(np.float32)
    Xn_va = ((Xva - mean) / (std + eps)).astype(np.float32)
    cfg = TrainConfig(end_epoch=epochs, batch_size=256)
    cfg_cls = TrainConfig(end_epoch=max(1, epochs // 2), batch_size=256)

    jobs = [
        ("M1", lambda d: train_m1(
            Xc_tr, Xc_va,
            dims=(513, 32, (128, 128)), cfg=cfg, model_dir=d, name="M1")),
        ("M2_ibm", lambda d: train_m2(
            (Xc_tr, Yc_ibm_tr), (Xc_va, Yc_ibm_va),
            dims=(513, 513, 32, (128, 128)), cfg=cfg, model_dir=d,
            name="M2")),
        ("classifier_ibm", lambda d: train_classifier(
            (Xn_tr, Yibm_tr), (Xn_va, Yibm_va),
            dims=(513, (128, 128), 513), cfg=cfg_cls, model_dir=d,
            name="Classifier", mean=mean, std=std)),
        ("wiener", lambda d: train_wiener(
            (Xn_tr, Ywf_tr), (Xn_va, Ywf_va), dims=(513, (128,) * 5, 513),
            cfg=cfg_cls, model_dir=d, name="Wiener", mean=mean, std=std)),
    ]
    for name, job in jobs:
        if os.path.exists(os.path.join(models, name)):
            continue                     # resumed run: job already done
        t0 = time.perf_counter()
        mdir = os.path.join(work, "train", name)
        _, hist = job(mdir)
        dst = os.path.join(models, name)
        os.makedirs(dst, exist_ok=True)
        shutil.copy(best_checkpoint(mdir), dst)
        for side in ("trainset_mean.npy", "trainset_std.npy"):
            p = os.path.join(mdir, side)
            if os.path.exists(p):
                shutil.copy(p, dst)
        print(f"{name}: best valid "
              f"{min(h['valid'] for h in hist):.3f} "
              f"({time.perf_counter() - t0:.0f}s)", flush=True)
    return models


def run_system(sysname, work, models, names, niter, batch_size, seed):
    """Enhance the whole corpus with one system; returns its est dir."""
    from guided_vae_nmf_tpu.mcem import MCEMConfig
    from guided_vae_nmf_tpu.pipeline import enhance_files

    corpus = os.path.join(work, "corpus")
    est = os.path.join(work, "est", sysname)
    cfg = MCEMConfig(niter=niter)
    kw = dict(cfg=cfg, batch_size=batch_size, seed=seed, fast=True,
              skip_existing=True, verbose=True)
    t0 = time.perf_counter()
    if sysname.startswith("m2dnn_"):
        profile = sysname.split("_", 1)[1]
        cls = load_model(os.path.join(models, "classifier_ibm"),
                         kind="classifier")
        mean, std = load_norm_stats(os.path.join(models, "classifier_ibm"))
        m2 = load_model(os.path.join(models, "M2_ibm"), kind="dgm")
        enhance_files(names, corpus, est, m2, model_type="m2",
                      classif_type="dnn", classifier_params=cls,
                      mean=mean, std=std, profile=profile, **kw)
    elif sysname.startswith("m2oracle_"):
        # oracle guidance (reference evaluate_M2_ibm.py classif_type=
        # 'oracle'): isolates engine quality from classifier quality —
        # the gap m2oracle - m2dnn is the classifier's cost at scale
        profile = sysname.split("_", 1)[1]
        m2 = load_model(os.path.join(models, "M2_ibm"), kind="dgm")
        enhance_files(names, corpus, est, m2, model_type="m2",
                      classif_type="oracle", profile=profile, **kw)
    elif sysname == "m1_spp":
        m1 = load_model(os.path.join(models, "M1"), kind="vae")
        enhance_files(names, corpus, est, m1, model_type="m1",
                      noise_model="spp", **kw)
    elif sysname == "wiener":
        from guided_vae_nmf_tpu.pipeline import enhance_files_wiener

        w = load_model(os.path.join(models, "wiener"), kind="classifier")
        mean, std = load_norm_stats(os.path.join(models, "wiener"))
        enhance_files_wiener(names, corpus, est, w, mean=mean, std=std,
                             batch_size=batch_size)
    else:
        raise SystemExit(f"unknown system {sysname}")
    print(f"[{sysname}] enhanced {len(names)} in "
          f"{time.perf_counter() - t0:.0f}s", flush=True)
    return est


def metrics_for(sysname, work, manifest, max_workers):
    """Reference-protocol metrics for one system: per-utterance rows via
    the P4 process pool, mean±95%-CI overall and per input SNR
    (reference metrics.py:70-130), plus per-noise-family F1 for guided
    systems."""
    from guided_vae_nmf_tpu.metrics.runner import (
        METRIC_KEYS_BASE, METRIC_KEYS_F1, compute_metrics_mixture_utt,
        compute_metrics_utt, metrics_pool,
    )
    from guided_vae_nmf_tpu.metrics.stats import compute_stats

    corpus = os.path.join(work, "corpus")
    entries = manifest["entries"]
    names = [e["name"] for e in entries]
    snr_arr = np.asarray([e["snr"] for e in entries], np.float64)
    with_f1 = sysname.startswith("m2dnn_")

    keys = list(METRIC_KEYS_BASE) + ["PESQ"]
    if sysname == "mixture":
        args = [(corpus, p) for p in names]
        fn = compute_metrics_mixture_utt
    else:
        est = os.path.join(work, "est", sysname)
        if with_f1:
            keys += METRIC_KEYS_F1
        args = [(corpus, est, p, with_f1, "ibm", 0.98, 0.999, False)
                for p in names]
        fn = compute_metrics_utt

    with metrics_pool(max_workers) as ex:
        rows = list(ex.map(fn, args))

    print(f"\n===== {sysname} =====", flush=True)
    stats = compute_stats(keys, rows, snr_arr)

    fam_f1 = {}
    if with_f1:
        f1_col = keys.index("F1")
        for fam in sorted({e["family"] for e in entries}):
            vals = [r[f1_col] for r, e in zip(rows, entries)
                    if e["family"] == fam]
            fam_f1[fam] = round(float(np.mean(vals)), 3)
        print(f"[{sysname}] classifier F1 by noise family: {fam_f1}",
              flush=True)
    return {"keys": keys, "stats": stats, "f1_by_family": fam_f1,
            "rows": [[None if (isinstance(v, float) and np.isnan(v))
                      else round(float(v), 4) for v in r] for r in rows]}


def main(argv=None):
    argv = argv or sys.argv[1:]
    smoke = flag(argv, "smoke", 0, int)
    work = flag(argv, "work",
                "/tmp/gvnmf_campaign" + ("_smoke" if smoke else ""))
    models_arg = flag(argv, "models", "retrain")
    n_voices = flag(argv, "voices", 2 if smoke else 9, int)
    snrs = tuple(float(s) for s in
                 flag(argv, "snrs", "0" if smoke else "-5,0,5").split(","))
    niter = flag(argv, "niter", 2 if smoke else 100, int)
    epochs = flag(argv, "epochs", 2 if smoke else 200, int)
    train_voices = flag(argv, "train_voices", 2 if smoke else 5, int)
    batch_size = flag(argv, "batch_size", 16, int)
    seed = flag(argv, "seed", 0, int)
    max_workers = flag(argv, "max_workers", 8, int)
    systems = flag(
        argv, "systems",
        "mixture,m2dnn_reference" if smoke else ",".join(ALL_SYSTEMS)
    ).split(",")

    os.makedirs(work, exist_ok=True)
    tr_paths, _, _ = campaign_splits()
    train_clean = [_load_clean(p) for p in tr_paths]

    manifest = build_test_corpus(work, n_voices, snrs, train_clean)
    names = [e["name"] for e in manifest["entries"]]

    if models_arg == "retrain":
        models = retrain(work, epochs, train_voices)
    else:
        models = models_arg
    if flag(argv, "prep_only", 0, int):
        print(json.dumps({"campaign": "prep_done", "models": models,
                          "utterances": len(names), **backend_info()}))
        return

    out = os.path.join(work, "campaign_results.json")
    # merge into a prior run's record so systems can be added
    # incrementally (--systems a,b into the same --work)
    results = json.load(open(out)) if os.path.exists(out) else {}
    prior = [s for s in results.get("config", {}).get("systems", ())
             if s not in systems]
    results["config"] = {
        "n_utterances": len(names), "voices": n_voices,
        "snrs": list(snrs), "niter": niter, "epochs": epochs,
        "train_voices": train_voices, "models": models,
        "systems": prior + list(systems), **backend_info(),
    }
    for sysname in systems:
        if sysname != "mixture":
            run_system(sysname, work, models, names, niter, batch_size,
                       seed)
        results[sysname] = metrics_for(sysname, work, manifest,
                                       max_workers)

    json.dump(results, open(out, "w"), indent=1)
    print(f"\nresults -> {out}", flush=True)
    print(json.dumps({"campaign": "done", "utterances": len(names),
                      "systems": systems, **backend_info()}))


if __name__ == "__main__":
    main()
