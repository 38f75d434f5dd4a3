"""Test mixtures with QUT noise (reference scripts/create_test_set.py).

Usage: python scripts/create_test_set.py [--dataset_size subset]
       [--noise_dir data/complete/raw/QUT-NOISE]
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np

from guided_vae_nmf_tpu.config import PathsConfig, apply_overrides
from guided_vae_nmf_tpu.data import (
    create_test_mixtures,
    qut_noise_list,
    preprocess_noise,
    read_wav,
    write_preprocessed_noise,
    noise_list_preprocessed,
)


def prepare_qut_noise(input_noise_dir, output_noise_dir):
    """Preprocess the four QUT recordings (reference
    create_test_set.py / qut_database.py:63-113)."""
    audios = {}
    for noise_type, path in qut_noise_list(input_noise_dir).items():
        audio, fs = read_wav(path)
        audio = preprocess_noise(audio, fs, noise_type=noise_type)
        write_preprocessed_noise(output_noise_dir, "test", noise_type, audio)
        audios[noise_type] = audio
    return audios


def main(argv=None):
    argv = argv or sys.argv[1:]
    paths, rest = apply_overrides(PathsConfig(), argv)
    noise_dir = "data/complete/raw/"
    processed_noise_dir = "data/complete/processed/QUT-NOISE/"
    if "--noise_dir" in rest:
        noise_dir = rest[rest.index("--noise_dir") + 1]
    if "--processed_noise_dir" in rest:
        processed_noise_dir = rest[rest.index("--processed_noise_dir") + 1]

    noise_types = ("cafe", "home", "street", "car")
    if "--synthetic_noise" in rest and rest[
            rest.index("--synthetic_noise") + 1] in ("1", "true"):
        # QUT unavailable: stand in four synthetic families under the
        # QUT type names so downstream tooling sees the same layout
        from guided_vae_nmf_tpu.data import synthetic_noise_bank

        bank = synthetic_noise_bank()
        audios = dict(zip(noise_types, (bank["white"], bank["low"],
                                        bank["mid"], bank["brown"])))
    else:
        try:
            audios = noise_list_preprocessed(processed_noise_dir, "test",
                                             list(noise_types))
        except (FileNotFoundError, OSError):
            audios = prepare_qut_noise(noise_dir, processed_noise_dir)

    t0 = time.perf_counter()
    all_snr = create_test_mixtures(
        paths.input_speech_dir, paths.processed_wav_dir, audios,
        dataset_type="test", snrs=(-5.0, 0.0, 5.0),
        noise_types=noise_types,
    )
    print(f"Finished in {time.perf_counter() - t0:.1f} seconds; "
          f"{len(all_snr)} mixtures, SNRs {sorted(set(all_snr))}")


if __name__ == "__main__":
    main()
