"""Train the supervised IBM/VAD classifier on standardized noisy frames
(reference scripts/training_classifier.py).

Usage: python scripts/training_classifier.py [--dataset_size subset]
       [--labels noisy_labels|noisy_vad_labels] [--h_dim 128,128]
       [--end_epoch 100] [--resume true]
"""

import os
import sys

sys.path.insert(0, ".")

import numpy as np

from guided_vae_nmf_tpu.config import PathsConfig, TrainConfig, apply_overrides
from guided_vae_nmf_tpu.data.h5io import H5FrameReader
from guided_vae_nmf_tpu.train import train_classifier


def main(argv=None):
    argv = argv or sys.argv[1:]
    paths, rest = apply_overrides(PathsConfig(), argv)
    cfg, rest = apply_overrides(TrainConfig(end_epoch=100), rest)
    labels = "noisy_labels"
    h_dim = (128, 128)
    eps = 1e-8
    resume = "--resume" in rest and rest[rest.index("--resume") + 1] in (
        "1", "true")
    data_parallel = "--data_parallel" in rest and rest[
        rest.index("--data_parallel") + 1] in ("1", "true")
    mesh = None
    if data_parallel:
        from guided_vae_nmf_tpu.parallel import make_mesh

        mesh = make_mesh()  # frame batch sharded over all local devices
    if "--labels" in rest:
        labels = rest[rest.index("--labels") + 1]
    if "--h_dim" in rest:
        h_dim = tuple(int(v)
                      for v in rest[rest.index("--h_dim") + 1].split(","))
    y_dim = 1 if "vad" in labels else 513

    h5 = paths.h5_path(labels)
    rtr = H5FrameReader(h5, "train")
    Xtr, Ytr = rtr.load_all()
    mean = rtr.mean[:, 0] if rtr.mean is not None else Xtr.mean(0)
    std = rtr.std[:, 0] if rtr.std is not None else Xtr.std(0)
    rva = H5FrameReader(h5, "validation")
    Xva, Yva = rva.load_all()
    rtr.close(); rva.close()

    # standardize with the H5 train stats (reference
    # training_classifier.py:97-108)
    Xtr = (Xtr - mean) / (std + eps)
    Xva = (Xva - mean) / (std + eps)

    name = (f"Classifier_hdim_{'_'.join(f'{h:03d}' for h in h_dim)}"
            f"_end_epoch_{cfg.end_epoch:03d}")
    model_dir = os.path.join(paths.models_dir, name)
    params, hist = train_classifier(
        (Xtr.astype(np.float32), Ytr), (Xva.astype(np.float32), Yva),
        dims=(513, h_dim, y_dim), cfg=cfg, model_dir=model_dir,
        name="Classifier", mean=mean, std=std, mesh=mesh, resume=resume, verbose=True,
    )
    print(f"done; best valid BCE {min(h['valid'] for h in hist):.2f}; "
          f"checkpoints in {model_dir}")


if __name__ == "__main__":
    main()
