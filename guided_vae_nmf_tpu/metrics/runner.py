"""Per-utterance metric sweeps.

Capability parity with reference scripts/run_metrics_M1.py:60-176,
run_metrics_M2.py:102-244, run_metrics_wiener.py and
run_metrics_mixture.py:50-120: for each test utterance read the
(s, n, x, s_est) wavs, compute SI-SDR/SI-SIR/SI-SAR, ESTOI (and PESQ when
the optional C extension is importable), plus mask F1 against the oracle
label for the guided variants; aggregate with 95% CIs overall and per input
SNR. Fan-out over a process pool like the reference (P4 in SURVEY §2.7).
"""

import os
from concurrent.futures import ProcessPoolExecutor

import numpy as np

from ..data import read_wav, read_dataset, speech_list
from ..dsp import stft, clean_speech_IBM, clean_speech_VAD
from ..models.losses import f1_loss
from .si_sdr import energy_ratios
from .stoi import stoi
from .stats import compute_stats
from . import pesq as _pesq

FS = 16000

METRIC_KEYS_BASE = ["SI-SDR", "SI-SIR", "SI-SAR", "ESTOI"]
METRIC_KEYS_F1 = ["ACC", "PRECISION", "RECALL", "F1"]
# Classic objective speech-quality measures (metrics/objective.py) — used
# as independent scales to triangulate the first-party PESQ ordering at
# campaign scale (VERDICT round-4 item 9); LLR/WSS are distortion
# measures (lower = better), the two SNR variants are higher-better.
METRIC_KEYS_OBJECTIVE = ["SSNR", "FWSSNR", "LLR", "WSS"]


def _objective_row(s, s_hat):
    from .objective import fw_seg_snr, llr, seg_snr, wss

    return [float(seg_snr(s, s_hat)), float(fw_seg_snr(s, s_hat)),
            float(llr(s, s_hat)), float(wss(s, s_hat))]


def _safe_pesq(s, s_hat):
    """PESQ-wb, NaN for degenerate inputs (< 250 ms or silent) so one
    pathological utterance cannot abort the whole metric sweep — the
    reference's C extension raises on the same inputs."""
    try:
        return _pesq(FS, s, s_hat, "wb")
    except (ValueError, RuntimeError):
        return float("nan")


def compute_metrics_utt(args):
    """One utterance: returns a metric tuple; optionally renders the
    reference's per-utterance inspection figure with the metrics in the
    title (reference run_metrics_M1.py:117-139,
    run_metrics_M2.py:102-200)."""
    (processed_dir, est_dir, path, with_f1, target, quantile_fraction,
     quantile_weight, make_figures) = args[:8]
    with_objective = args[8] if len(args) > 8 else False
    base_p = os.path.join(processed_dir, os.path.splitext(path)[0])
    base_e = os.path.join(est_dir, os.path.splitext(path)[0])

    s, _ = read_wav(base_p + "_s.wav")
    n, _ = read_wav(base_p + "_n.wav")
    s_hat, _ = read_wav(base_e + "_s_est.wav")
    ln = min(len(s), len(s_hat))
    s, n, s_hat = s[:ln], n[:ln], s_hat[:ln]

    si_sdr, si_sir, si_sar = energy_ratios(s_hat, s, n)
    estoi_v = stoi(s, s_hat, FS, extended=True)
    pesq_v = _safe_pesq(s, s_hat)
    row = [si_sdr, si_sir, si_sar, estoi_v, pesq_v]
    if with_objective:
        row.extend(_objective_row(s, s_hat))

    if make_figures:
        import matplotlib

        matplotlib.use("pdf")
        import matplotlib.pyplot as plt

        from ..viz import display_multiple_signals

        x, _ = read_wav(base_p + "_x.wav")
        fig = display_multiple_signals(
            [[s, stft(s), None], [x[:ln], stft(x[:ln]), None],
             [s_hat, stft(s_hat), None]],
            titles=["clean", "mixture", "enhanced"],
        )
        fig.suptitle(
            f"SI-SDR {si_sdr:.1f} dB | SI-SIR {si_sir:.1f} | "
            f"SI-SAR {si_sar:.1f} | ESTOI {estoi_v:.3f} | "
            f"PESQ {pesq_v:.2f}"
        )
        fig.savefig(base_e + "_fig.png", dpi=40)
        plt.close(fig)

    if with_f1:
        y_hard = np.load(base_e + "_ibm_hard_est.npy")
        s_tf = stft(s)
        fn = clean_speech_VAD if target == "vad" else clean_speech_IBM
        y_oracle = fn(s_tf, quantile_fraction=quantile_fraction,
                      quantile_weight=quantile_weight)
        if target == "vad":
            y_oracle = y_oracle.reshape(1, -1)
        ncols = min(y_hard.shape[1], y_oracle.shape[1])
        acc, prec, rec, f1 = (
            float(v) for v in f1_loss(
                np.asarray(y_hard[:, :ncols]).reshape(-1),
                y_oracle[:, :ncols].reshape(-1),
            )
        )
        row.extend([acc, prec, rec, f1])
    return tuple(row)


def compute_metrics_mixture_utt(args):
    """No-processing floor: metrics of the raw mixture vs clean (reference
    run_metrics_mixture.py:50-120)."""
    processed_dir, path = args[:2]
    with_objective = args[2] if len(args) > 2 else False
    base = os.path.join(processed_dir, os.path.splitext(path)[0])
    s, _ = read_wav(base + "_s.wav")
    n, _ = read_wav(base + "_n.wav")
    x, _ = read_wav(base + "_x.wav")
    si_sdr, si_sir, si_sar = energy_ratios(x, s, n)
    estoi_v = stoi(s, x, FS, extended=True)
    row = [si_sdr, si_sir, si_sar, estoi_v, _safe_pesq(s, x)]
    if with_objective:
        row.extend(_objective_row(s, x))
    return tuple(row)


def _pool_init():
    """Worker initializer: metrics are host-side (SURVEY P4 — PESQ/STOI
    are CPU code); pin the worker's JAX to CPU BEFORE its first backend
    use so a spawned child never grabs the parent's accelerator (on a
    single-grant TPU tunnel a second grab deadlocks both processes).
    The spawn bootstrap may import jax (via __main__'s imports) before
    this runs, so set the live config too — jax.config.update wins over
    env/site-hook pins any time before the first backend use."""
    os.environ["GVNMF_PLATFORM"] = "cpu"
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")


def metrics_pool(max_workers=8):
    """Process pool for metric sweeps. MUST be spawn-context: the parent
    typically holds a live TPU client, and a fork()ed child inherits
    JAX's internal locks mid-state — the reference's fork pool
    (run_metrics_M1.py:161) deadlocks under an initialized accelerator
    backend (observed on the v5e tunnel, round 4)."""
    import multiprocessing

    return ProcessPoolExecutor(
        max_workers=max_workers,
        mp_context=multiprocessing.get_context("spawn"),
        initializer=_pool_init,
    )


def run_metrics(input_speech_dir, processed_dir, est_dir=None,
                dataset_type="test", with_f1=False, target="ibm",
                quantile_fraction=0.98, quantile_weight=0.999,
                max_workers=8, confidence=0.95, save_json=False,
                mixture_floor=False, serial=False, make_figures=False):
    """Sweep the test list, aggregate, print tables; returns
    (metric_keys, rows, snr_list, stats)."""
    files = speech_list(input_speech_dir, dataset_type)
    snr_list = read_dataset(processed_dir, dataset_type, "snr_db")

    keys = list(METRIC_KEYS_BASE) + ["PESQ"]
    if with_f1 and not mixture_floor:
        keys.extend(METRIC_KEYS_F1)

    if mixture_floor:
        args = [(processed_dir, p) for p in files]
        fn = compute_metrics_mixture_utt
    else:
        args = [
            (processed_dir, est_dir, p, with_f1, target, quantile_fraction,
             quantile_weight, make_figures)
            for p in files
        ]
        fn = compute_metrics_utt

    if serial:
        rows = [fn(a) for a in args]
    else:
        with metrics_pool(max_workers) as ex:
            rows = list(ex.map(fn, args))

    stats = compute_stats(keys, rows, np.asarray(snr_list),
                          model_data_dir=est_dir, confidence=confidence,
                          save_json=save_json)
    return keys, rows, snr_list, stats
