"""Clean-speech training frame store (reference scripts/create_train_set.py).

Usage: python scripts/create_train_set.py [--dataset_size subset]
       [--labels labels|vad_labels] [--quantile_fraction 0.999]
"""

import sys

sys.path.insert(0, ".")

from guided_vae_nmf_tpu.config import PathsConfig, LabelConfig, apply_overrides
from guided_vae_nmf_tpu.data import create_clean_frames


def main(argv=None):
    paths, rest = apply_overrides(PathsConfig(), argv or sys.argv[1:])
    labels = "labels"
    quantile_fraction = 0.999
    if "--labels" in rest:
        labels = rest[rest.index("--labels") + 1]
    if "--quantile_fraction" in rest:
        quantile_fraction = float(rest[rest.index("--quantile_fraction") + 1])

    out = paths.h5_path(labels)
    import os

    os.makedirs(os.path.dirname(out), exist_ok=True)
    create_clean_frames(
        paths.input_speech_dir, out,
        dataset_types=("train", "validation"), labels=labels,
        quantile_fraction=quantile_fraction,
    )
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
