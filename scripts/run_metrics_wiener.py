"""Metrics for the Wiener-DNN baseline outputs, serial loop + stats.json
(reference scripts/run_metrics_wiener.py:194-214).

Usage: python scripts/run_metrics_wiener.py --est_dir <enhanced-dir>
       [--dataset_size subset]
"""

import sys

sys.path.insert(0, ".")

from guided_vae_nmf_tpu.config import PathsConfig, apply_overrides
from guided_vae_nmf_tpu.metrics import run_metrics
from _common import flag


def main(argv=None):
    argv = argv or sys.argv[1:]
    paths, rest = apply_overrides(PathsConfig(), argv)
    est_dir = flag(rest, "est_dir", paths.models_dir + "wiener_enhanced/")
    run_metrics(paths.input_speech_dir, paths.processed_wav_dir, est_dir,
                with_f1=False, save_json=True, serial=True)


if __name__ == "__main__":
    main()
