"""M1 + MCEM enhancement sweep over the test set (reference
scripts/evaluate_M1.py). One batched device program replaces the reference's
one-process-per-GPU pool (evaluate_M1.py:186-222).

Usage: python scripts/evaluate_M1.py --model <ckpt-or-dir>
       [--dataset_size subset] [--niter 100] [--batch_size 16]
       [--output <dir>]
"""

import sys
import time

sys.path.insert(0, ".")

from guided_vae_nmf_tpu.config import PathsConfig, MCEMConfig, apply_overrides
from guided_vae_nmf_tpu.mcem import PEEMConfig
from guided_vae_nmf_tpu.data import speech_list
from guided_vae_nmf_tpu.pipeline import enhance_files
from _common import load_model, flag


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
    output = flag(rest, "output", paths.models_dir + "M1_enhanced/")
    batch_size = flag(rest, "batch_size", 16, int)
    noise_model = flag(rest, "noise_model", "nmf")  # nmf | spp (noNMF) | hybrid | spp2
    profile = flag(rest, "profile", None)  # validated preset (profiles.py)
    mesh = None
    if flag(rest, "data_parallel", "0") in ("1", "true"):
        from guided_vae_nmf_tpu.parallel import make_mesh

        mesh = make_mesh()  # utterance batch sharded over all devices

    skip_existing = flag(rest, "skip_existing", "0") in ("1", "true")

    vae = load_model(model_path, kind="vae")
    files = speech_list(paths.input_speech_dir, "test")
    t0 = time.perf_counter()
    res = enhance_files(files, paths.processed_wav_dir, output, vae,
                        model_type="m1", cfg=cfg, batch_size=batch_size,
                        verbose=True, noise_model=noise_model, mesh=mesh,
                        skip_existing=skip_existing,
                        profile=profile)
    skipped = f", {res.n_skipped} skipped" if res.n_skipped else ""
    print(f"Finished in {time.perf_counter() - t0:.1f} seconds "
          f"({res.n_processed} utterances{skipped})")


if __name__ == "__main__":
    main()
