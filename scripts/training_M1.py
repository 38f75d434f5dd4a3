"""Train the M1 VAE on clean-speech frames (reference
scripts/training_M1.py).

Usage: python scripts/training_M1.py [--dataset_size subset]
       [--z_dim 16] [--h_dim 128] [--end_epoch 200] [--resume true]
"""

import os
import sys

sys.path.insert(0, ".")

from guided_vae_nmf_tpu.config import PathsConfig, TrainConfig, apply_overrides
from guided_vae_nmf_tpu.data import read_dataset
from guided_vae_nmf_tpu.data.h5io import H5FrameReader
from guided_vae_nmf_tpu.train import train_m1


def main(argv=None):
    argv = argv or sys.argv[1:]
    paths, rest = apply_overrides(PathsConfig(), argv)
    cfg, rest = apply_overrides(TrainConfig(end_epoch=200), rest)
    z_dim, h_dim = 16, (128,)
    resume = "--resume" in rest and rest[rest.index("--resume") + 1] in (
        "1", "true")
    data_parallel = "--data_parallel" in rest and rest[
        rest.index("--data_parallel") + 1] in ("1", "true")
    mesh = None
    if data_parallel:
        from guided_vae_nmf_tpu.parallel import make_mesh

        mesh = make_mesh()  # frame batch sharded over all local devices
    if "--z_dim" in rest:
        z_dim = int(rest[rest.index("--z_dim") + 1])
    if "--h_dim" in rest:
        h_dim = tuple(int(v)
                      for v in rest[rest.index("--h_dim") + 1].split(","))

    # Frames from the pickle store (reference training_M1.py:46-47) or the
    # H5 export when present.
    h5 = paths.h5_path("labels")
    if os.path.exists(h5):
        rtr = H5FrameReader(h5, "train")
        Xtr, _ = rtr.load_all()
        rva = H5FrameReader(h5, "validation")
        Xva, _ = rva.load_all()
        rtr.close(); rva.close()
    else:
        Xtr = read_dataset(paths.pickle_dir, "train", "frames").T
        Xva = read_dataset(paths.pickle_dir, "validation", "frames").T

    name = (f"M1_hdim_{h_dim[0]:03d}_zdim_{z_dim:03d}"
            f"_end_epoch_{cfg.end_epoch:03d}")
    model_dir = os.path.join(paths.models_dir, name)
    params, hist = train_m1(
        Xtr, Xva, dims=(513, z_dim, h_dim), cfg=cfg, model_dir=model_dir,
        name="M1", mesh=mesh, resume=resume, verbose=True,
    )
    print(f"done; best valid {min(h['valid'] for h in hist):.2f}; "
          f"checkpoints in {model_dir}")


if __name__ == "__main__":
    main()
