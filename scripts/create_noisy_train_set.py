"""Noisy training frame store with DEMAND noise (reference
scripts/create_noisy_train_set.py).

Usage: python scripts/create_noisy_train_set.py [--dataset_size subset]
       [--labels noisy_labels|noisy_vad_labels|noisy_wiener_labels]
       [--noise_dir data/complete/raw/Demand]
"""

import os
import sys

sys.path.insert(0, ".")

import numpy as np

from guided_vae_nmf_tpu.config import PathsConfig, apply_overrides
from guided_vae_nmf_tpu.data import (
    create_noisy_frames,
    demand_noise_list,
    preprocess_noise,
    read_wav,
    write_preprocessed_noise,
    noise_list_preprocessed,
)
from guided_vae_nmf_tpu.data.noise import DEMAND_RECORDINGS


def prepare_demand_noise(input_noise_dir, output_noise_dir):
    """Concatenate + resample the per-type DEMAND recordings into single
    16 kHz wavs (reference create_noisy_train_set.py:83-130)."""
    audios = {}
    for dataset_type in ("train", "validation"):
        noise_paths = demand_noise_list(input_noise_dir, dataset_type)
        per_split = {}
        for noise_type, paths in noise_paths.items():
            chunks = []
            for p in paths:
                audio, fs = read_wav(p)
                chunks.append(preprocess_noise(audio, fs))
            audio = np.concatenate(chunks)
            write_preprocessed_noise(output_noise_dir, dataset_type,
                                     noise_type, audio)
            per_split[noise_type] = audio
        audios[dataset_type] = per_split
    return audios


def main(argv=None):
    argv = argv or sys.argv[1:]
    paths, rest = apply_overrides(PathsConfig(), argv)
    labels = "noisy_labels"
    noise_dir = "data/complete/raw/Demand/"
    processed_noise_dir = "data/complete/processed/Demand/"
    if "--labels" in rest:
        labels = rest[rest.index("--labels") + 1]
    if "--noise_dir" in rest:
        noise_dir = rest[rest.index("--noise_dir") + 1]
    if "--processed_noise_dir" in rest:
        processed_noise_dir = rest[rest.index("--processed_noise_dir") + 1]

    if "--synthetic_noise" in rest and rest[
            rest.index("--synthetic_noise") + 1] in ("1", "true"):
        # DEMAND unavailable: six-family synthetic bank (the same one the
        # shipped pretrained checkpoints were trained with)
        from guided_vae_nmf_tpu.data import synthetic_noise_bank

        bank = synthetic_noise_bank()
        names = sorted(bank)
        audios = {
            "train": {t: bank[t] for t in names[: len(names) // 2 + 1]},
            "validation": {t: bank[t] for t in names[len(names) // 2 + 1:]},
        }
    else:
        # Load preprocessed noise if present, else preprocess raw DEMAND
        audios = {}
        try:
            for dataset_type in ("train", "validation"):
                types = list(DEMAND_RECORDINGS[dataset_type].keys())
                audios[dataset_type] = noise_list_preprocessed(
                    processed_noise_dir, dataset_type, types
                )
        except (FileNotFoundError, OSError):
            audios = prepare_demand_noise(noise_dir, processed_noise_dir)

    out = paths.h5_path(labels)
    os.makedirs(os.path.dirname(out), exist_ok=True)
    quantile = 0.999
    snr_lists = create_noisy_frames(
        paths.input_speech_dir, out, audios,
        dataset_types=("train", "validation"), labels=labels,
        quantile_fraction=quantile,
        output_wav_dir=(paths.processed_wav_dir
                        if paths.dataset_size == "subset" else None),
    )
    print(f"wrote {out}; SNR draws: "
          f"{ {k: len(v) for k, v in snr_lists.items()} }")


if __name__ == "__main__":
    main()
