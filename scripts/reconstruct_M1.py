"""Qualitative VAE analysis-resynthesis: per test utterance run the M1 VAE
forward on the noisy power spectrogram and save a 3-panel dB-spectrogram
figure (reference scripts/reconstruct_M1.py:66-163).

Usage: python scripts/reconstruct_M1.py --model <ckpt-or-dir>
       [--dataset_size subset] [--output <dir>]
"""

import os
import sys

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp
import matplotlib

matplotlib.use("pdf")
import matplotlib.pyplot as plt  # noqa: E402

from guided_vae_nmf_tpu.config import PathsConfig, apply_overrides
from guided_vae_nmf_tpu.data import speech_list
from guided_vae_nmf_tpu.models import vae_apply
from guided_vae_nmf_tpu.pipeline import load_mixture
from guided_vae_nmf_tpu.viz import power_to_db
from _common import load_model, flag


def main(argv=None):
    argv = argv or sys.argv[1:]
    paths, rest = apply_overrides(PathsConfig(), argv)
    model_path = flag(rest, "model", paths.models_dir)
    output = flag(rest, "output", paths.models_dir + "M1_reconstruct/")

    vae = load_model(model_path, kind="vae")
    key = jax.random.PRNGKey(0)
    files = speech_list(paths.input_speech_dir, "test")
    for path in files:
        base = os.path.join(paths.processed_wav_dir,
                            os.path.splitext(path)[0])
        _, _, X_tf = load_mixture(base)
        x = jnp.asarray((np.abs(X_tf) ** 2).T)  # (frames, bins)
        key, sub = jax.random.split(key)
        r, mu, logvar = vae_apply(vae, x, sub)
        recon = np.asarray(r).T  # decoded variance, (bins, frames)

        fig, axes = plt.subplots(3, 1, figsize=(12, 12))
        for ax, (title, S) in zip(axes, [
            ("noisy power", np.abs(X_tf) ** 2),
            ("VAE reconstruction (variance)", recon),
            ("residual (dB difference)",
             np.abs(np.abs(X_tf) ** 2 - recon)),
        ]):
            im = ax.imshow(power_to_db(S), origin="lower", aspect="auto",
                           cmap="magma", vmin=-40, vmax=20)
            ax.set_title(title)
            fig.colorbar(im, ax=ax)
        out = os.path.join(output, os.path.splitext(path)[0] + "_recon.png")
        os.makedirs(os.path.dirname(out), exist_ok=True)
        fig.savefig(out, dpi=60)
        plt.close(fig)
        print(f"wrote {out}")


if __name__ == "__main__":
    main()
