"""Qualitative SPP ("timo") masks, soft + hard figures (reference
scripts/reconstruct_timo_classif.py:95-173).

Usage: python scripts/reconstruct_timo_classif.py [--target ibm|vad]
       [--dataset_size subset] [--output <dir>]
"""

import os
import sys

sys.path.insert(0, ".")

import numpy as np
import matplotlib

matplotlib.use("pdf")
import matplotlib.pyplot as plt  # noqa: E402

from guided_vae_nmf_tpu.config import PathsConfig, apply_overrides
from guided_vae_nmf_tpu.data import speech_list
from guided_vae_nmf_tpu.pipeline import load_mixture, make_labels
from guided_vae_nmf_tpu.viz import display_wav_spectro_mask
from _common import flag


def main(argv=None):
    argv = argv or sys.argv[1:]
    paths, rest = apply_overrides(PathsConfig(), argv)
    target = flag(rest, "target", "ibm")
    output = flag(rest, "output", paths.models_dir + "timo_figures/")

    for path in speech_list(paths.input_speech_dir, "test"):
        base = os.path.join(paths.processed_wav_dir,
                            os.path.splitext(path)[0])
        x_t, _, X_tf = load_mixture(base)
        power = np.abs(X_tf) ** 2
        y_soft, y_hard = make_labels("timo", power, target=target)

        for kind, mask in (("soft", y_soft), ("hard", y_hard)):
            fig = display_wav_spectro_mask(x_t, X_tf, mask)
            out = os.path.join(
                output,
                os.path.splitext(path)[0] + f"_fig_timo_{target}_{kind}.png",
            )
            os.makedirs(os.path.dirname(out), exist_ok=True)
            fig.savefig(out, dpi=40)
            plt.close(fig)
        print(f"{path}: wrote soft/hard timo figures")


if __name__ == "__main__":
    main()
