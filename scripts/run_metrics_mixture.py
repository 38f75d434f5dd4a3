"""No-processing floor: metrics of the raw mixtures vs clean speech
(reference scripts/run_metrics_mixture.py).

Usage: python scripts/run_metrics_mixture.py [--dataset_size subset]
"""

import sys

sys.path.insert(0, ".")

from guided_vae_nmf_tpu.config import PathsConfig, apply_overrides
from guided_vae_nmf_tpu.metrics import run_metrics


def main(argv=None):
    argv = argv or sys.argv[1:]
    paths, rest = apply_overrides(PathsConfig(), argv)
    run_metrics(paths.input_speech_dir, paths.processed_wav_dir,
                est_dir=None, mixture_floor=True)


if __name__ == "__main__":
    main()
