"""Conformance check of the first-party STOI/ESTOI (and objective
measures) against the canonical packages, when importable.

This environment has neither `pystoi` nor `pysepm`, so cross-
implementation deltas cannot be computed in CI; run this script wherever
they are installed. The framing and resampler conventions were matched to
pystoi line-by-line (exclusive final frame, Octave-style Kaiser
anti-aliasing FIR), so the expected ESTOI delta is < 1e-6.

Usage: python scripts/validate_stoi.py [--data_root DIR] [--threshold 1e-3]
"""

import argparse
import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from guided_vae_nmf_tpu.data import read_wav  # noqa: E402
from guided_vae_nmf_tpu.metrics.stoi import stoi as stoi_fp  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_root", default="/root/reference/data/subset")
    ap.add_argument("--threshold", type=float, default=1e-3)
    args = ap.parse_args()

    try:
        from pystoi import stoi as stoi_canon
    except ImportError:
        print("pystoi not importable in this environment; nothing to "
              "validate (goldens in tests/metrics/test_goldens.py pin "
              "the implementation against drift).")
        return 0

    pattern = os.path.join(args.data_root,
                           "processed/CSR-1-WSJ-0/**/*_x.wav")
    deltas = []
    for path in sorted(glob.glob(pattern, recursive=True)):
        b = path[:-6]
        s, _ = read_wav(b + "_s.wav")
        x, _ = read_wav(b + "_x.wav")
        m = min(len(s), len(x))
        s, x = s[:m], x[:m]
        for ext in (False, True):
            a = stoi_canon(s, x, 16000, extended=ext)
            f = stoi_fp(s, x, 16000, extended=ext)
            deltas.append(f - a)
            name = "ESTOI" if ext else "STOI"
            print(f"{os.path.basename(b)} {name}: canon={a:.6f} "
                  f"first-party={f:.6f} delta={f - a:+.2e}")

    try:
        import pysepm

        for path in sorted(glob.glob(pattern, recursive=True))[:3]:
            b = path[:-6]
            s, _ = read_wav(b + "_s.wav")
            x, _ = read_wav(b + "_x.wav")
            m = min(len(s), len(x))
            from guided_vae_nmf_tpu.metrics.objective import (
                fw_seg_snr, llr, wss,
            )
            print(f"{os.path.basename(b)} fwSegSNR: "
                  f"canon={pysepm.fwSNRseg(s[:m], x[:m], 16000):.4f} "
                  f"first-party={fw_seg_snr(s[:m], x[:m], 16000):.4f}")
            print(f"{os.path.basename(b)} LLR: "
                  f"canon={pysepm.llr(s[:m], x[:m], 16000):.4f} "
                  f"first-party={llr(s[:m], x[:m], 16000):.4f}")
            print(f"{os.path.basename(b)} WSS: "
                  f"canon={pysepm.wss(s[:m], x[:m], 16000):.4f} "
                  f"first-party={wss(s[:m], x[:m], 16000):.4f}")
    except ImportError:
        print("(pysepm absent: objective-measure deltas skipped)")

    deltas = np.asarray(deltas)
    print(f"mean|delta|={np.mean(np.abs(deltas)):.2e} "
          f"max|delta|={np.max(np.abs(deltas)):.2e}")
    return 0 if np.max(np.abs(deltas)) <= args.threshold else 1


if __name__ == "__main__":
    sys.exit(main())
