"""Qualitative DNN-classifier masks + F1 vs the oracle label (reference
scripts/reconstruct_dnn_classif.py:166-226).

Usage: python scripts/reconstruct_dnn_classif.py --classifier <ckpt-or-dir>
       [--target ibm|vad] [--dataset_size subset] [--output <dir>]
"""

import os
import sys

sys.path.insert(0, ".")

import numpy as np

from guided_vae_nmf_tpu.config import PathsConfig, apply_overrides
from guided_vae_nmf_tpu.data import speech_list, read_wav
from guided_vae_nmf_tpu.dsp import stft, clean_speech_IBM, clean_speech_VAD
from guided_vae_nmf_tpu.models.losses import f1_loss
from guided_vae_nmf_tpu.pipeline import load_mixture, make_labels
from guided_vae_nmf_tpu.viz import display_wav_spectro_mask
from _common import load_model, load_norm_stats, flag


def main(argv=None):
    argv = argv or sys.argv[1:]
    paths, rest = apply_overrides(PathsConfig(), argv)
    classifier_path = flag(rest, "classifier", paths.models_dir)
    target = flag(rest, "target", "ibm")
    output = flag(rest, "output", paths.models_dir + "classif_figures/")

    classifier = load_model(classifier_path, kind="classifier")
    cdir = (classifier_path if os.path.isdir(classifier_path)
            else os.path.dirname(classifier_path))
    mean, std = load_norm_stats(cdir)

    for path in speech_list(paths.input_speech_dir, "test"):
        base = os.path.join(paths.processed_wav_dir,
                            os.path.splitext(path)[0])
        x_t, _, X_tf = load_mixture(base)
        power = np.abs(X_tf) ** 2
        y_soft, y_hard = make_labels("dnn", power,
                                     classifier_params=classifier,
                                     mean=mean, std=std, target=target)

        s_t, _ = read_wav(base + "_s.wav")
        s_tf = stft(s_t)
        fn = clean_speech_VAD if target == "vad" else clean_speech_IBM
        y_oracle = fn(s_tf)
        if target == "vad":
            y_oracle = y_oracle.reshape(1, -1)
        n = min(y_hard.shape[1], y_oracle.shape[1])
        acc, prec, rec, f1 = (float(v) for v in f1_loss(
            y_hard[:, :n].reshape(-1), y_oracle[:, :n].reshape(-1)))

        fig = display_wav_spectro_mask(x_t, X_tf, y_hard)
        fig.suptitle(f"F1 = {f1:.3f}  acc = {acc:.3f}  "
                     f"prec = {prec:.3f}  recall = {rec:.3f}")
        out = os.path.join(
            output, os.path.splitext(path)[0] + f"_fig_{target}.png")
        os.makedirs(os.path.dirname(out), exist_ok=True)
        fig.savefig(out, dpi=40)
        import matplotlib.pyplot as plt

        plt.close(fig)
        print(f"{path}: F1 {f1:.3f} -> {out}")


if __name__ == "__main__":
    main()
