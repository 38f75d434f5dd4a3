"""Train the Wiener-mask DNN baseline (reference
scripts/training_wiener_filter.py: 5x128 hidden, mask-MSE loss).

Usage: python scripts/training_wiener_filter.py [--dataset_size subset]
       [--end_epoch 100] [--resume true]
"""

import os
import sys

sys.path.insert(0, ".")

import numpy as np

from guided_vae_nmf_tpu.config import PathsConfig, TrainConfig, apply_overrides
from guided_vae_nmf_tpu.data.h5io import H5FrameReader
from guided_vae_nmf_tpu.train import train_wiener


def main(argv=None):
    argv = argv or sys.argv[1:]
    paths, rest = apply_overrides(PathsConfig(), argv)
    cfg, rest = apply_overrides(TrainConfig(end_epoch=100), rest)
    resume = "--resume" in rest and rest[rest.index("--resume") + 1] in (
        "1", "true")
    data_parallel = "--data_parallel" in rest and rest[
        rest.index("--data_parallel") + 1] in ("1", "true")
    mesh = None
    if data_parallel:
        from guided_vae_nmf_tpu.parallel import make_mesh

        mesh = make_mesh()  # frame batch sharded over all local devices
    eps = 1e-8

    h5 = paths.h5_path("noisy_wiener_labels")
    rtr = H5FrameReader(h5, "train")
    Xtr, Ytr = rtr.load_all()
    mean = rtr.mean[:, 0] if rtr.mean is not None else Xtr.mean(0)
    std = rtr.std[:, 0] if rtr.std is not None else Xtr.std(0)
    rva = H5FrameReader(h5, "validation")
    Xva, Yva = rva.load_all()
    rtr.close(); rva.close()

    Xtr = (Xtr - mean) / (std + eps)
    Xva = (Xva - mean) / (std + eps)

    name = f"Wiener_hdim_5x128_end_epoch_{cfg.end_epoch:03d}"
    model_dir = os.path.join(paths.models_dir, name)
    params, hist = train_wiener(
        (Xtr.astype(np.float32), Ytr), (Xva.astype(np.float32), Yva),
        dims=(513, (128,) * 5, 513), cfg=cfg, model_dir=model_dir,
        name="Wiener", mean=mean, std=std, mesh=mesh, resume=resume, verbose=True,
    )
    print(f"done; best valid mask-MSE {min(h['valid'] for h in hist):.4f}; "
          f"checkpoints in {model_dir}")


if __name__ == "__main__":
    main()
