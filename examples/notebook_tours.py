"""Script equivalents of the reference's three jupyter notebooks
(reference jupyter/inspection.ipynb, training.ipynb, visualization.ipynb):

  inspection    — load the bundled frame/label pickles and render the
                  dB spectrogram + binary-label images;
  training      — a small SVI-based M2 training demo (the notebook's
                  DeepGenerativeModel + SVI + ImportanceWeightedSampler
                  flow, here models.variational.SVI on the same frames);
  visualization — STFT + Lorenz-quantile IBM of the first test utterance
                  rendered as a figure.

Usage: python examples/notebook_tours.py [inspection|training|visualization]
       (default: all three; figures under /tmp/gvnmf_tours)
"""

import os
import sys

sys.path.insert(0, ".")

import numpy as np

OUT = "/tmp/gvnmf_tours"
SUB = "/root/reference/data/subset"


def tour_inspection():
    import matplotlib

    matplotlib.use("pdf")
    import matplotlib.pyplot as plt

    from guided_vae_nmf_tpu.data import read_dataset

    frames = read_dataset(f"{SUB}/pickle/", "train", "frames")
    labels = read_dataset(f"{SUB}/pickle/", "train", "labels")
    fig, (a, b) = plt.subplots(2, 1, figsize=(13, 8))
    a.imshow(20 * np.log10(np.maximum(frames, 1e-12)), cmap="jet",
             origin="lower", aspect="auto")
    a.set_title("training frames (dB)")
    b.imshow(labels, cmap="binary", origin="lower", aspect="auto")
    b.set_title("IBM labels")
    path = os.path.join(OUT, "inspection.pdf")
    fig.savefig(path)
    print(f"[inspection] frames {frames.shape}, labels {labels.shape} "
          f"-> {path}")


def tour_training():
    import jax

    from guided_vae_nmf_tpu.data import read_dataset
    from guided_vae_nmf_tpu.models import dgm_init
    from guided_vae_nmf_tpu.models.losses import ikatura_saito_divergence
    from guided_vae_nmf_tpu.models.variational import svi

    X = read_dataset(f"{SUB}/pickle/", "train", "frames").T
    Y = read_dataset(f"{SUB}/pickle/", "train", "labels").T
    params = dgm_init(jax.random.PRNGKey(0), [513, 513, 128, [256, 128]])
    xb = X[:16].astype(np.float32)
    yb = Y[:16].astype(np.float32)
    # the notebook's likelihood choice: IS divergence, not BCE (power
    # frames are unbounded, BCE would NaN) — jupyter/training.ipynb
    out = svi(params, xb, jax.random.PRNGKey(1), y=yb,
              likelihood=ikatura_saito_divergence)
    print(f"[training] SVI labelled loss on a 16-frame batch: "
          f"{float(out[0]):.2f} (notebook flow: DGM z=128 h=[256,128])")


def tour_visualization():
    from guided_vae_nmf_tpu.data import read_wav, speech_list
    from guided_vae_nmf_tpu.dsp import clean_speech_IBM, stft
    from guided_vae_nmf_tpu.viz import display_wav_spectro_mask

    path = speech_list(f"{SUB}/raw/", "test")[0]
    x, fs = read_wav(os.path.join(f"{SUB}/raw/", path))
    x = x / np.max(np.abs(x))
    x_tf = stft(x)
    ibm = clean_speech_IBM(x_tf, 0.98, 0.999)
    fig = display_wav_spectro_mask(x, x_tf, ibm)
    out = os.path.join(OUT, "visualization.pdf")
    fig.savefig(out)
    print(f"[visualization] {os.path.basename(path)}: spectro+IBM -> {out}")


def main(argv=None):
    argv = argv or sys.argv[1:]
    os.makedirs(OUT, exist_ok=True)
    tours = {"inspection": tour_inspection, "training": tour_training,
             "visualization": tour_visualization}
    for name in (argv or list(tours)):
        tours[name]()


if __name__ == "__main__":
    main()
