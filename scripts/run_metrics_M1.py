"""Metrics for M1-enhanced outputs (reference scripts/run_metrics_M1.py):
SI-SDR/SIR/SAR + ESTOI (+PESQ when available), 95% CIs overall and per
input SNR.

Usage: python scripts/run_metrics_M1.py --est_dir <enhanced-dir>
       [--dataset_size subset] [--save_json true]
"""

import sys

sys.path.insert(0, ".")

from guided_vae_nmf_tpu.config import PathsConfig, apply_overrides
from guided_vae_nmf_tpu.metrics import run_metrics
from _common import flag


def main(argv=None):
    argv = argv or sys.argv[1:]
    paths, rest = apply_overrides(PathsConfig(), argv)
    est_dir = flag(rest, "est_dir", paths.models_dir + "M1_enhanced/")
    save_json = flag(rest, "save_json", "false") in ("1", "true")
    figures = flag(rest, "figures", "false") in ("1", "true")
    run_metrics(paths.input_speech_dir, paths.processed_wav_dir, est_dir,
                with_f1=False, save_json=save_json, make_figures=figures)
    if flag(rest, "polqa", "false") in ("1", "true"):
        from guided_vae_nmf_tpu.metrics import run_polqa

        run_polqa(paths.input_speech_dir, paths.processed_wav_dir, est_dir)


if __name__ == "__main__":
    main()
