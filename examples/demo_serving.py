"""Minimal online-serving demo: three concurrent clients against the
dynamic-batching EnhancementService with the shipped flagship models
(M2 + DNN classifier + SPP noise, niter=100 MCEM).

Run: python examples/demo_serving.py
"""

import os
import sys
import threading

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))

os.environ.setdefault(
    "GVNMF_CACHE_DIR", os.path.expanduser("~/.cache/gvnmf_xla")
)

import numpy as np

from _common import load_model, load_norm_stats
from guided_vae_nmf_tpu.data import read_wav, speech_list
from guided_vae_nmf_tpu.mcem import MCEMConfig
from guided_vae_nmf_tpu.metrics import energy_ratios
from guided_vae_nmf_tpu.serving import EnhancementService, ServeConfig

ART = "artifacts/pretrained"
SUB = "/root/reference/data/subset"


def main():
    m2 = load_model(f"{ART}/M2_ibm", kind="dgm")
    cls = load_model(f"{ART}/classifier_ibm", kind="classifier")
    mean, std = load_norm_stats(f"{ART}/classifier_ibm")

    files = speech_list(f"{SUB}/raw/", "test")
    proc = f"{SUB}/processed/"

    svc = EnhancementService(
        m2, classifier_params=cls, mean=mean, std=std,
        cfg=MCEMConfig(niter=100),
        serve=ServeConfig(noise_model="spp", max_wait_ms=30.0))
    try:
        results = {}

        def client(name):
            base = os.path.join(proc, os.path.splitext(name)[0])
            x, _ = read_wav(base + "_x.wav")
            out = svc.enhance(x)           # blocking convenience wrapper
            s_ref, _ = read_wav(base + "_s.wav")
            n_ref, _ = read_wav(base + "_n.wav")
            L = min(len(s_ref), len(out["s"]))
            results[name] = (
                energy_ratios(x[:L], s_ref[:L], n_ref[:L])[0],
                energy_ratios(out["s"][:L], s_ref[:L], n_ref[:L])[0],
                out["latency_s"], out["batch_size"],
            )

        threads = [threading.Thread(target=client, args=(f,))
                   for f in files]
        for t in threads:
            t.start()
        for t in threads:
            t.join()

        for name, (si_in, si_out, lat, bs) in sorted(results.items()):
            print(f"{os.path.basename(name):<16} SI-SDR {si_in:+.2f} -> "
                  f"{si_out:+.2f} dB   latency {lat:.2f}s  "
                  f"(batch of {bs})")
        print("service stats:", svc.stats())
    finally:
        svc.close()


if __name__ == "__main__":
    main()
