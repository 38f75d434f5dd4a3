"""End-to-end demo on the bundled subset + shipped pretrained checkpoints
(the working-code equivalent of the reference's exploratory jupyter/
notebooks): synthesize noisy mixtures, enhance them with MCEM and PEEM,
report SI-SDR/ESTOI against the mixture floor, and render an
inspection figure.

Usage: python examples/demo_enhancement.py [--out /tmp/gvnmf_demo]
"""

import os
import sys
import time

sys.path.insert(0, ".")

# persistent compile cache: the first run pays the one-time Pallas/XLA
# compilation (~2 min); later runs start at steady-state speed
os.environ.setdefault(
    "GVNMF_CACHE_DIR",
    os.path.expanduser("~/.cache/gvnmf_xla"),
)

import numpy as np
from scipy.signal import lfilter

from guided_vae_nmf_tpu.data import (
    create_test_mixtures, read_wav, speech_list,
)
from guided_vae_nmf_tpu.dsp import stft
from guided_vae_nmf_tpu.train.checkpoints import best_checkpoint, load_params
from guided_vae_nmf_tpu.mcem import MCEMConfig, PEEMConfig
from guided_vae_nmf_tpu.pipeline import enhance_files
from guided_vae_nmf_tpu.metrics import energy_ratios, stoi
from guided_vae_nmf_tpu.viz import display_multiple_signals

SUBSET = "/root/reference/data/subset"
ART = "artifacts/pretrained"
FS = 16000


def noise_bank():
    def make(seed, kind):
        r = np.random.RandomState(seed)
        n = r.randn(FS * 60)
        if kind == "lowpass":
            n = lfilter([1], [1, -0.9], n)
        return n / np.abs(n).max()

    return {"white": make(1, "white"), "low": make(2, "lowpass")}


def report(tag, proc, est, files):
    for name in files:
        bp = os.path.join(proc, os.path.splitext(name)[0])
        be = os.path.join(est, os.path.splitext(name)[0])
        s, _ = read_wav(bp + "_s.wav")
        n, _ = read_wav(bp + "_n.wav")
        x, _ = read_wav(bp + "_x.wav")
        sh, _ = read_wav(be + "_s_est.wav")
        ln = min(len(s), len(sh))
        print(f"  [{tag}] {os.path.basename(name)}: "
              f"SI-SDR {energy_ratios(x[:ln], s[:ln], n[:ln])[0]:+.2f} -> "
              f"{energy_ratios(sh[:ln], s[:ln], n[:ln])[0]:+.2f} dB | "
              f"ESTOI {stoi(s[:ln], x[:ln], FS, True):.3f} -> "
              f"{stoi(s[:ln], sh[:ln], FS, True):.3f}")


def main():
    out = "/tmp/gvnmf_demo"
    if "--out" in sys.argv:
        out = sys.argv[sys.argv.index("--out") + 1]
    proc = os.path.join(out, "proc") + "/"

    print("1) synthesizing test mixtures (0 dB SNR, 2 noise types)...")
    create_test_mixtures(f"{SUBSET}/raw/", proc, noise_bank(),
                         dataset_type="test", snrs=(0.0,),
                         noise_types=("white", "low"))
    files = speech_list(f"{SUBSET}/raw/", "test")

    m2 = load_params(best_checkpoint(f"{ART}/M2_ibm"),
                     static={"y_dim": 513})

    print("2) MCEM enhancement (oracle IBM guidance, 50 EM iterations)...")
    t0 = time.time()
    est = os.path.join(out, "est_mcem")
    enhance_files(files, proc, est, m2, model_type="m2",
                  classif_type="oracle", cfg=MCEMConfig(niter=50),
                  batch_size=4)
    print(f"   {time.time() - t0:.1f}s for {len(files)} utterances "
          "(includes one-time compilation on a cold cache)")
    report("MCEM", proc, est, files)

    print("3) PEEM enhancement (gradient E-step, 50 EM iterations)...")
    t0 = time.time()
    est_p = os.path.join(out, "est_peem")
    enhance_files(files, proc, est_p, m2, model_type="m2",
                  classif_type="oracle", cfg=PEEMConfig(niter=50),
                  batch_size=4)
    print(f"   {time.time() - t0:.1f}s")
    report("PEEM", proc, est_p, files)

    print("4) inspection figure...")
    name = files[0]
    bp = os.path.join(proc, os.path.splitext(name)[0])
    be = os.path.join(est, os.path.splitext(name)[0])
    x, _ = read_wav(bp + "_x.wav")
    s, _ = read_wav(bp + "_s.wav")
    sh, _ = read_wav(be + "_s_est.wav")
    fig = display_multiple_signals(
        [[s, stft(s), None], [x, stft(x), None], [sh, stft(sh), None]],
        titles=["clean", "mixture", "enhanced"],
    )
    fig_path = os.path.join(out, "demo.png")
    fig.savefig(fig_path, dpi=50)
    print(f"   wrote {fig_path}")


if __name__ == "__main__":
    main()
