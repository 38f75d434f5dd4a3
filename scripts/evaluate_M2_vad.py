"""M2 + VAD-guided enhancement sweep (reference scripts/evaluate_M2_vad.py):
frame-level VAD labels (y_dim=1) condition the MCEM; supports the dnn /
oracle / timo label sources and the ones/zeros ablations
(evaluate_M2_vad.py:133-137).

Usage: python scripts/evaluate_M2_vad.py --model <ckpt-or-dir>
       [--classifier <ckpt-or-dir>] [--classif_type dnn|oracle|timo|ones|zeros]
       [--dataset_size subset] [--niter 100] [--batch_size 16]
       [--output <dir>]
"""

import os
import sys
import time

sys.path.insert(0, ".")

from guided_vae_nmf_tpu.config import PathsConfig, MCEMConfig, apply_overrides
from guided_vae_nmf_tpu.mcem import PEEMConfig
from guided_vae_nmf_tpu.data import speech_list
from guided_vae_nmf_tpu.pipeline import enhance_files
from _common import load_model, load_norm_stats, flag


def main(argv=None):
    argv = argv or sys.argv[1:]
    paths, rest = apply_overrides(PathsConfig(), argv)
    # --algorithm FIRST: exactly one config class parses the flags
    # (parsing MCEMConfig before branching consumed shared flags like
    # --niter/--noise_gain and silently dropped them for peem/hybrid)
    algo = flag(rest, "algorithm", "mcem")
    if algo == "hybrid":
        # PEEM warm start + fused-MCEM refinement (VALIDATION paper-config
        # table: 162x realtime at niter=500 + refine=150)
        from guided_vae_nmf_tpu.mcem import HybridConfig

        cfg, rest = apply_overrides(HybridConfig(), rest)
    elif algo == "peem":
        # point-estimate EM (gradient E-step; arXiv:1905.01209) — ~5-8x
        # cheaper per iteration than MCEM at near-identical quality
        cfg, rest = apply_overrides(PEEMConfig(), rest)
    else:
        cfg, rest = apply_overrides(MCEMConfig(), rest)
    model_path = flag(rest, "model", paths.models_dir)
    classifier_path = flag(rest, "classifier")
    classif_type = flag(rest, "classif_type", "dnn")
    output = flag(rest, "output",
                  paths.models_dir + f"M2_vad_{classif_type}_enhanced/")
    batch_size = flag(rest, "batch_size", 16, int)
    skip_existing = flag(rest, "skip_existing", "0") in ("1", "true")
    noise_model = flag(rest, "noise_model", "nmf")  # nmf | spp (noNMF) | hybrid | spp2
    profile = flag(rest, "profile", None)  # validated preset (profiles.py)
    soft_labels = flag(rest, "soft_labels", "0") in ("1", "true")
    mesh = None
    if flag(rest, "data_parallel", "0") in ("1", "true"):
        from guided_vae_nmf_tpu.parallel import make_mesh

        mesh = make_mesh()  # utterance batch sharded over all devices

    dgm = load_model(model_path, kind="dgm", y_dim=1)
    classifier, mean, std = None, None, None
    features, dnn_threshold = "power", 0.5
    if classif_type == "dnn":
        if classifier_path is None:
            raise SystemExit("--classifier <ckpt-or-dir> is required with "
                             "--classif_type dnn")
        classifier = load_model(classifier_path, kind="classifier")
        cdir = (classifier_path if os.path.isdir(classifier_path)
                else os.path.dirname(classifier_path))
        mean, std = load_norm_stats(cdir)
        from guided_vae_nmf_tpu.train import load_classifier_meta

        cmeta = load_classifier_meta(cdir)
        features = flag(rest, "features", cmeta["features"])
        dnn_threshold = flag(rest, "dnn_threshold", cmeta["threshold"],
                             float)

    files = speech_list(paths.input_speech_dir, "test")
    t0 = time.perf_counter()
    res = enhance_files(files, paths.processed_wav_dir, output, dgm,
                        model_type="m2", classif_type=classif_type,
                        target="vad", classifier_params=classifier,
                        mean=mean, std=std, cfg=cfg,
                        batch_size=batch_size, verbose=True,
                        noise_model=noise_model, mesh=mesh,
                        soft_guidance=soft_labels,
                        skip_existing=skip_existing,
                        profile=profile, features=features,
                        dnn_threshold=dnn_threshold)
    skipped = f", {res.n_skipped} skipped" if res.n_skipped else ""
    print(f"Finished in {time.perf_counter() - t0:.1f} seconds "
          f"({res.n_processed} utterances{skipped})")


if __name__ == "__main__":
    main()
