"""Waveform + spectrogram + VAD/IBM label inspection figures for raw subset
utterances (reference scripts/visualization.py:41-107).

Usage: python scripts/visualization.py [--dataset_size subset]
       [--dataset_type train] [--labels ibm|vad] [--output <dir>]
"""

import os
import sys

sys.path.insert(0, ".")

import numpy as np
import matplotlib

matplotlib.use("pdf")
import matplotlib.pyplot as plt  # noqa: E402

from guided_vae_nmf_tpu.config import PathsConfig, apply_overrides
from guided_vae_nmf_tpu.data import speech_list, read_wav
from guided_vae_nmf_tpu.dsp import stft, clean_speech_IBM, \
    noise_robust_clean_speech_VAD
from guided_vae_nmf_tpu.viz import display_wav_spectro_mask
from _common import flag


def main(argv=None):
    argv = argv or sys.argv[1:]
    paths, rest = apply_overrides(PathsConfig(), argv)
    dataset_type = flag(rest, "dataset_type", "train")
    labels = flag(rest, "labels", "ibm")
    output = flag(rest, "output", "figures/")

    for path in speech_list(paths.input_speech_dir, dataset_type):
        x, fs = read_wav(os.path.join(paths.input_speech_dir, path))
        x = x[int(0.1 * fs):]
        x = x / np.max(np.abs(x))
        x_tf = stft(x)
        if labels == "vad":
            mask = noise_robust_clean_speech_VAD(x_tf)
        else:
            mask = clean_speech_IBM(x_tf)
        fig = display_wav_spectro_mask(x, x_tf, mask)
        out = os.path.join(output,
                           os.path.splitext(path)[0] + f"_{labels}.png")
        os.makedirs(os.path.dirname(out), exist_ok=True)
        fig.savefig(out, dpi=40)
        plt.close(fig)
        print(f"wrote {out}")


if __name__ == "__main__":
    main()
