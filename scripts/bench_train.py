"""Training-throughput benchmark (the L4 training half of the framework:
reference training_M2.py ran one CUDA GPU; here the jitted data-parallel
trainer on TPU).

Builds the same diverse-noise labeled frame set the shipped checkpoints
use (scripts/pretrain_subset.py), times `train_m2` for --epochs epochs at
the reference batch size, and prints one JSON line with frames/s and
epoch wall-clock. `--torch_baseline 1` additionally times the reference's
own torch model + SVI loop (loaded from /root/reference, CPU) on the same
frames for a same-machine comparison.

Usage: python scripts/bench_train.py [--epochs 20] [--batch_size 256]
       [--torch_baseline 0]
"""

import json
import os
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

os.environ.setdefault(
    "GVNMF_CACHE_DIR", os.path.expanduser("~/.cache/gvnmf_xla")
)

import numpy as np

from guided_vae_nmf_tpu.train import TrainConfig, train_m2
from _common import backend_info, flag
from pretrain_subset import build_dataset


def main(argv=None):
    argv = argv or sys.argv[1:]
    epochs = flag(argv, "epochs", 20, int)
    batch_size = flag(argv, "batch_size", 256, int)
    hidden = flag(argv, "hidden", 128, int)
    z_dim = flag(argv, "z", 32, int)
    dims = (513, 513, z_dim, (hidden, hidden))
    torch_baseline = flag(argv, "torch_baseline", 0, int)
    work = flag(argv, "work", "/tmp/gvnmf_bench_train")

    (Xtr, Ytr), (Xva, Yva) = build_dataset()
    n_frames = len(Xtr)

    cfg = TrainConfig(end_epoch=epochs, batch_size=batch_size)
    t0 = time.perf_counter()
    _, hist = train_m2((Xtr, Ytr), (Xva, Yva), dims=dims, cfg=cfg,
                       model_dir=os.path.join(work, "M2"), name="M2")
    wall = time.perf_counter() - t0
    # the first epoch carries the whole-epoch program compile (persistent
    # XLA cache absorbs it across runs); epochs 2.. are steady state
    steady = [h["time_s"] for h in hist[1:]] or [hist[0]["time_s"]]
    steady_epoch = sum(steady) / len(steady)

    result = {
        "epochs": epochs,
        "train_frames": n_frames,
        "batch_size": batch_size,
        "wall_s": round(wall, 2),
        "first_epoch_s": round(hist[0]["time_s"], 3),
        "steady_epoch_s": round(steady_epoch, 3),
        "steady_frames_per_s": round(n_frames / steady_epoch, 0),
    }

    if torch_baseline and os.path.isdir("/root/reference/python"):
        result["torch_epoch_s"] = round(
            _torch_epoch((Xtr, Ytr), batch_size), 3)
        result["torch_frames_per_s"] = round(
            n_frames / result["torch_epoch_s"], 0)

    stream = flag(argv, "stream", 0, int)
    if stream:
        result.update(_stream_bench((Xtr, Ytr), (Xva, Yva), cfg, work,
                                    replicate=stream, dims=dims,
                                    base_rate=result["steady_frames_per_s"]))

    result.update(backend_info())
    print(json.dumps(result))


def _stream_bench(train_data, valid_data, cfg, work, replicate=10,
                  base_rate=None, dims=(513, 513, 32, (128, 128))):
    """Beyond-HBM ingestion benchmark: replicate the frame set
    `replicate`x into an H5 store and train via the double-buffered
    H5StreamSource (data/h5io.py) — H5 reads + H2D transfers of chunk
    i+1 overlap the device's epoch-scan over chunk i. Reports the
    streaming frames/s and its fraction of the in-memory rate."""
    from guided_vae_nmf_tpu.data import H5FrameWriter, H5StreamSource
    from guided_vae_nmf_tpu.train import train_m2 as train_m2_fn

    X, Y = train_data
    h5p = os.path.join(work, f"stream_{replicate}x.h5")
    usable = False
    if os.path.exists(h5p):
        try:  # a crashed writer leaves a file without the datasets
            H5StreamSource(h5p, "train").close()
            usable = True
        except Exception:
            os.remove(h5p)
    if not usable:
        w = H5FrameWriter(h5p, "train", compression=None,
                          chunk_frames=4096)
        for _ in range(replicate):
            w.append(X.T, Y.T)
        w.finalize()
    chunk = max(cfg.batch_size, (len(X) // cfg.batch_size)
                * cfg.batch_size)
    src = H5StreamSource(h5p, "train", chunk_frames=chunk, seed=0)
    n = src.n_chunks * src.chunk_frames
    scfg = TrainConfig(end_epoch=3, batch_size=cfg.batch_size)
    t0 = time.perf_counter()
    _, hist = train_m2_fn(src, valid_data, dims=dims, cfg=scfg,
                          model_dir=os.path.join(work, "M2_stream"),
                          name="M2")
    src.close()
    steady = [h["time_s"] for h in hist[1:]] or [hist[0]["time_s"]]
    ep = sum(steady) / len(steady)
    out = {
        "stream_replicate": replicate,
        "stream_frames": n,
        "stream_epoch_s": round(ep, 3),
        "stream_frames_per_s": round(n / ep, 0),
    }
    if base_rate:
        out["stream_vs_inmem"] = round(out["stream_frames_per_s"]
                                       / base_rate, 3)
    return out


def _torch_epoch(train_data, batch_size):
    """One epoch of the reference's own training step (torch CPU):
    `r, mu, logvar = model(x, y); loss = elbo(...); backward; Adam` —
    reference scripts/training_M2.py:114-118, run on the same frames for
    a same-machine number."""
    import torch

    sys.path.insert(0, "/root/reference")
    from python.models.models import DeepGenerativeModel
    from python.models.utils import elbo

    X, Y = train_data
    model = DeepGenerativeModel([513, 513, 32, [128, 128]], None)
    opt = torch.optim.Adam(model.parameters(), lr=1e-3, betas=(0.9, 0.999))
    model.train()
    t0 = time.perf_counter()
    for lo in range(0, len(X) - batch_size + 1, batch_size):
        xb = torch.from_numpy(X[lo:lo + batch_size])
        yb = torch.from_numpy(Y[lo:lo + batch_size])
        r, mu, logvar = model(xb, yb)
        loss, recon, kl = elbo(xb, r, mu, logvar, 1e-8)
        loss.backward()
        opt.step()
        opt.zero_grad()
        float(loss.item())
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
