"""Wiener-mask DNN baseline enhancement (reference
scripts/evaluate_wiener_filter.py): mask = model(x_norm); S_hat = mask * X.

Usage: python scripts/evaluate_wiener_filter.py --model <ckpt-or-dir>
       [--dataset_size subset] [--output <dir>]
"""

import os
import sys
import time

sys.path.insert(0, ".")

from guided_vae_nmf_tpu.config import PathsConfig, apply_overrides
from guided_vae_nmf_tpu.data import speech_list
from guided_vae_nmf_tpu.pipeline import enhance_files_wiener
from _common import load_model, load_norm_stats, flag


def main(argv=None):
    argv = argv or sys.argv[1:]
    paths, rest = apply_overrides(PathsConfig(), argv)
    model_path = flag(rest, "model", paths.models_dir)
    output = flag(rest, "output", paths.models_dir + "wiener_enhanced/")

    params = load_model(model_path, kind="classifier")
    mdir = (model_path if os.path.isdir(model_path)
            else os.path.dirname(model_path))
    mean, std = load_norm_stats(mdir)

    files = speech_list(paths.input_speech_dir, "test")
    t0 = time.perf_counter()
    enhance_files_wiener(files, paths.processed_wav_dir, output, params,
                         mean=mean, std=std, verbose=True)
    print(f"Finished in {time.perf_counter() - t0:.1f} seconds "
          f"({len(files)} utterances)")


if __name__ == "__main__":
    main()
