"""Train the guided M2 VAE on noisy frames with oracle labels (reference
scripts/training_M2.py).

Usage: python scripts/training_M2.py [--dataset_size subset]
       [--labels noisy_labels|noisy_vad_labels] [--z_dim 32]
       [--h_dim 128,128] [--end_epoch 200] [--resume true]
"""

import os
import sys

sys.path.insert(0, ".")

from guided_vae_nmf_tpu.config import PathsConfig, TrainConfig, apply_overrides
from guided_vae_nmf_tpu.data.h5io import H5FrameReader
from guided_vae_nmf_tpu.train import train_m2


def main(argv=None):
    argv = argv or sys.argv[1:]
    paths, rest = apply_overrides(PathsConfig(), argv)
    cfg, rest = apply_overrides(TrainConfig(end_epoch=200), rest)
    labels = "noisy_labels"
    z_dim, h_dim = 32, (128, 128)
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
    if "--z_dim" in rest:
        z_dim = int(rest[rest.index("--z_dim") + 1])
    if "--h_dim" in rest:
        h_dim = tuple(int(v)
                      for v in rest[rest.index("--h_dim") + 1].split(","))
    y_dim = 1 if "vad" in labels else 513

    h5 = paths.h5_path(labels)
    rtr = H5FrameReader(h5, "train")
    Xtr, Ytr = rtr.load_all()
    rva = H5FrameReader(h5, "validation")
    Xva, Yva = rva.load_all()
    rtr.close(); rva.close()

    name = (f"M2_hdim_{'_'.join(f'{h:03d}' for h in h_dim)}"
            f"_zdim_{z_dim:03d}_end_epoch_{cfg.end_epoch:03d}")
    model_dir = os.path.join(paths.models_dir, name)
    params, hist = train_m2(
        (Xtr, Ytr), (Xva, Yva), dims=(513, y_dim, z_dim, h_dim), cfg=cfg,
        model_dir=model_dir, name="M2", mesh=mesh, resume=resume, verbose=True,
    )
    print(f"done; best valid {min(h['valid'] for h in hist):.2f}; "
          f"checkpoints in {model_dir}")


if __name__ == "__main__":
    main()
