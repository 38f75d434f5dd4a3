"""Metrics for M2-enhanced outputs incl. mask F1 vs the oracle label
(reference scripts/run_metrics_M2.py:102-244).

Usage: python scripts/run_metrics_M2.py --est_dir <enhanced-dir>
       [--target ibm|vad] [--dataset_size subset] [--save_json true]
"""

import sys

sys.path.insert(0, ".")

from guided_vae_nmf_tpu.config import PathsConfig, apply_overrides
from guided_vae_nmf_tpu.metrics import run_metrics
from _common import flag


def main(argv=None):
    argv = argv or sys.argv[1:]
    paths, rest = apply_overrides(PathsConfig(), argv)
    est_dir = flag(rest, "est_dir",
                   paths.models_dir + "M2_ibm_dnn_enhanced/")
    target = flag(rest, "target", "ibm")
    save_json = flag(rest, "save_json", "false") in ("1", "true")
    figures = flag(rest, "figures", "false") in ("1", "true")
    run_metrics(paths.input_speech_dir, paths.processed_wav_dir, est_dir,
                with_f1=True, target=target, save_json=save_json,
                make_figures=figures)


if __name__ == "__main__":
    main()
