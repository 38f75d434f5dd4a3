"""Dual-implementation cross-checks for ESTOI/STOI and the classical
objective measures (fwSegSNR, LLR, WSS, segSNR).

The canonical oracles (pystoi, Hu & Loizou's MATLAB) are not importable
here, so convention errors in guided_vae_nmf_tpu.metrics could hide
behind self-generated regression pins. This file closes that hole with a
second, deliberately naive implementation of each measure — explicit
Python loops, no shared helpers, written directly from the papers'
equations plus the convention spec below — and asserts agreement with
the library to ~1e-6 (relative) across randomized signal families. A
vectorization/axis/convention slip in either implementation shows up as
a mismatch; identical mistakes in two structurally different codebases
are far less likely than in one.

Convention spec shared by both implementations (the pystoi / Hu&Loizou
compatibility contract, documented in metrics/stoi.py and
metrics/objective.py):

STOI/ESTOI (Taal 2011 / Jensen & Taal 2016, pystoi conventions):
  * internal rate 10 kHz; Octave-style 60 dB Kaiser-sinc resampler
  * frames 256 @ hop 128, interior Hann taper np.hanning(258)[1:-1]
  * EXCLUSIVE final frame (the last frame is dropped even when it fits)
  * silence removal at 40 dB below the loudest clean frame, energies
    20*log10(||frame|| + 1e-16), OLA rebuild of kept frames
  * 512-pt rFFT; 15 one-third-octave bands from 150 Hz, band edges
    150*2^((2k±1)/6) snapped to the NEAREST fft bin (argmin (f-edge)^2)
  * 30-frame (384 ms) segments; normalization epsilons 1e-16
  * STOI clipping c = 10^(15/20)

Objective measures (Hu & Loizou 2008 conventions as implemented here):
  * 30 ms Hann frames, 75% overlap, native rate, inclusive final frame
  * 25 Gaussian critical-band filters on bark = 6*asinh(f/600), centers
    linspace(bark[1], 0.95*bark[-1], 25), sigma = width/2, rows
    normalized to unit sum (+1e-10)
  * fwSegSNR: weights Sb^0.1, band SNR 10log10((Sb+eps)/((sqrt(Sb)-
    sqrt(Eb))^2+eps)) clipped to [-10, 35]
  * LLR: autocorrelation-method LPC of order fs/1000+2, skip frames with
    windowed clean energy < 1e-8, per-frame value log(num/den + eps)
    clamped at 2.0, plain mean
  * WSS: Klatt weights with Kmax=20, Klocmax=1, "local peak" = running
    max over bands at or above the current one
  * segSNR: time-domain, per-frame clamp [-10, 35] dB
"""

import numpy as np
import pytest

from guided_vae_nmf_tpu.metrics.stoi import stoi
from guided_vae_nmf_tpu.metrics.objective import (
    fw_seg_snr, llr, wss, seg_snr,
)

EPS10 = 1e-10


# ===========================================================================
# naive STOI / ESTOI (loops, from the papers + spec above)
# ===========================================================================

def naive_resample_octave(x, p, q):
    """Octave `resample` as literal operations: design the 60 dB
    Kaiser-windowed sinc, zero-stuff by p, convolve, pick every q-th
    sample starting at the filter's center tap."""
    rejection_db = 60.0
    cutoff = 1.0 / (2.0 * max(p, q))
    roll_off = cutoff / 10.0
    half = int(np.ceil((rejection_db - 8.0) / (28.714 * roll_off)))
    taps = []
    beta = 0.1102 * (rejection_db - 8.7)
    kais = np.kaiser(2 * half + 1, beta)
    for i, t in enumerate(range(-half, half + 1)):
        taps.append(2 * p * cutoff * np.sinc(2 * cutoff * t) * kais[i])
    h = np.asarray(taps)
    h = h / np.sum(h)          # the library normalizes to unit DC ...
    h = h * p                  # ... and scipy's resample_poly restores *up
    up = np.zeros(len(x) * p)
    up[::p] = x
    full = np.convolve(up, h, mode="full")
    n_out = -((-len(x) * p) // q)
    out = np.empty(n_out)
    for k in range(n_out):
        out[k] = full[half + k * q]
    return out


def _naive_frames_exclusive(x):
    """Frame starts strictly before len(x) - 256 (exclusive endpoint)."""
    starts = []
    i = 0
    while i < len(x) - 256:
        starts.append(i)
        i += 128
    return starts


def _naive_window():
    return np.hanning(258)[1:-1]


def naive_remove_silent(x, y):
    w = _naive_window()
    starts = _naive_frames_exclusive(x)
    energies = []
    for s in starts:
        fr = x[s:s + 256] * w
        energies.append(20 * np.log10(np.sqrt(np.sum(fr * fr)) + 1e-16))
    thr = max(energies) - 40.0
    keep = [s for s, e in zip(starts, energies) if e > thr]
    n = len(keep)
    out_len = 256 + (n - 1) * 128 if n else 0
    xs = np.zeros(out_len)
    ys = np.zeros(out_len)
    for i, s in enumerate(keep):
        xs[i * 128:i * 128 + 256] += x[s:s + 256] * w
        ys[i * 128:i * 128 + 256] += y[s:s + 256] * w
    return xs, ys


def naive_band_matrix():
    f = np.linspace(0, 10000, 513)[:257]
    bands = []
    for k in range(15):
        lo_hz = 150.0 * 2.0 ** ((2 * k - 1) / 6.0)
        hi_hz = 150.0 * 2.0 ** ((2 * k + 1) / 6.0)
        lo = int(np.argmin((f - lo_hz) ** 2))
        hi = int(np.argmin((f - hi_hz) ** 2))
        bands.append((lo, hi))
    return bands


def naive_envelopes(x):
    w = _naive_window()
    starts = _naive_frames_exclusive(x)
    bands = naive_band_matrix()
    env = np.zeros((15, len(starts)))
    for j, s in enumerate(starts):
        spec = np.fft.rfft(x[s:s + 256] * w, 512)
        p = np.abs(spec) ** 2
        for b, (lo, hi) in enumerate(bands):
            acc = 0.0
            for k in range(lo, hi):
                acc += p[k]
            env[b, j] = np.sqrt(acc)
    return env


def naive_stoi(x, y, fs, extended):
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    if fs != 10000:
        g = np.gcd(int(fs), 10000)
        x = naive_resample_octave(x, 10000 // g, int(fs) // g)
        y = naive_resample_octave(y, 10000 // g, int(fs) // g)
    x, y = naive_remove_silent(x, y)
    X = naive_envelopes(x)
    Y = naive_envelopes(y)
    M = X.shape[1] - 30 + 1
    if extended:
        total = 0.0
        for m in range(M):
            Xs = X[:, m:m + 30].copy()
            Ys = Y[:, m:m + 30].copy()
            for b in range(15):               # row normalize
                Xs[b] -= Xs[b].mean()
                Xs[b] /= np.sqrt(np.sum(Xs[b] ** 2)) + 1e-16
                Ys[b] -= Ys[b].mean()
                Ys[b] /= np.sqrt(np.sum(Ys[b] ** 2)) + 1e-16
            for t in range(30):               # column normalize
                Xs[:, t] -= Xs[:, t].mean()
                Xs[:, t] /= np.sqrt(np.sum(Xs[:, t] ** 2)) + 1e-16
                Ys[:, t] -= Ys[:, t].mean()
                Ys[:, t] /= np.sqrt(np.sum(Ys[:, t] ** 2)) + 1e-16
            acc = 0.0
            for b in range(15):
                for t in range(30):
                    acc += Xs[b, t] * Ys[b, t]
            total += acc / 30.0
        return total / M
    c = 10.0 ** (15.0 / 20.0)
    total = 0.0
    for m in range(M):
        for b in range(15):
            xs = X[b, m:m + 30]
            ys = Y[b, m:m + 30]
            alpha = np.sqrt(np.sum(xs ** 2)) / (
                np.sqrt(np.sum(ys ** 2)) + 1e-16)
            yp = np.minimum(ys * alpha, xs * (1 + c))
            xc = xs - xs.mean()
            yc = yp - yp.mean()
            total += np.sum(xc * yc) / (
                np.sqrt(np.sum(xc ** 2)) * np.sqrt(np.sum(yc ** 2))
                + 1e-16)
    return total / (M * 15)


# ===========================================================================
# naive objective measures (loops, from Hu & Loizou / Klatt + spec above)
# ===========================================================================

def _naive_frames_inclusive(x, frame_len, hop):
    starts = []
    i = 0
    while i + frame_len <= len(x):
        starts.append(i)
        i += hop
    return starts


def naive_crit_filters(n_bins, fs):
    f = np.linspace(0, fs / 2, n_bins)
    bark = 6.0 * np.arcsinh(f / 600.0)
    lo, hi = bark[1], bark[-1] * 0.95
    centers = [lo + i * (hi - lo) / 24.0 for i in range(25)]
    width = centers[1] - centers[0]
    filt = np.zeros((25, n_bins))
    for b in range(25):
        for k in range(n_bins):
            filt[b, k] = np.exp(
                -0.5 * ((bark[k] - centers[b]) / (0.5 * width)) ** 2)
        filt[b] /= filt[b].sum() + EPS10
    return filt


def naive_fw_seg_snr(clean, est, fs=16000):
    n = min(len(clean), len(est))
    clean, est = clean[:n], est[:n]
    frame_len = int(0.03 * fs)
    hop = frame_len // 4
    win = np.hanning(frame_len)
    starts = _naive_frames_inclusive(clean, frame_len, hop)
    filt = naive_crit_filters(frame_len // 2 + 1, fs)
    vals = []
    for s in starts:
        S = np.abs(np.fft.rfft(clean[s:s + frame_len] * win)) ** 2
        E = np.abs(np.fft.rfft(est[s:s + frame_len] * win)) ** 2
        num = 0.0
        den = 0.0
        for b in range(25):
            sb = float(np.dot(filt[b], S))
            eb = float(np.dot(filt[b], E))
            w = sb ** 0.1
            snr = 10 * np.log10(
                (sb + EPS10) / ((np.sqrt(sb) - np.sqrt(eb)) ** 2 + EPS10))
            snr = min(max(snr, -10.0), 35.0)
            num += w * snr
            den += w
        vals.append(num / (den + EPS10))
    return float(np.mean(vals))


def naive_lpc(frame, order):
    """Textbook Levinson-Durbin (explicit loops, separate prev array)."""
    n = len(frame)
    r = np.zeros(order + 1)
    for lag in range(order + 1):
        acc = 0.0
        for t in range(n - lag):
            acc += frame[t] * frame[t + lag]
        r[lag] = acc
    a = np.zeros(order + 1)
    a[0] = 1.0
    err = r[0] + EPS10
    for i in range(1, order + 1):
        acc = r[i]
        for j in range(1, i):
            acc += a[j] * r[i - j]
        k = -acc / err
        prev = a.copy()
        for j in range(1, i):
            a[j] = prev[j] + k * prev[i - j]
        a[i] = k
        err *= (1.0 - k * k)
        if err <= 0:
            err = EPS10
    return a, r


def naive_llr(clean, est, fs=16000):
    n = min(len(clean), len(est))
    clean, est = clean[:n], est[:n]
    order = int(fs / 1000) + 2
    frame_len = int(0.03 * fs)
    hop = frame_len // 4
    win = np.hanning(frame_len)
    vals = []
    for s in _naive_frames_inclusive(clean, frame_len, hop):
        sf = clean[s:s + frame_len] * win
        ef = est[s:s + frame_len] * win
        if np.sum(sf ** 2) < 1e-8:
            continue
        a_c, r_c = naive_lpc(sf, order)
        a_d, _ = naive_lpc(ef, order)
        num = 0.0
        den = 0.0
        for j in range(order + 1):
            for k in range(order + 1):
                num += a_d[j] * r_c[abs(j - k)] * a_d[k]
                den += a_c[j] * r_c[abs(j - k)] * a_c[k]
        if den > 0 and num > 0:
            vals.append(min(np.log(num / den + EPS10), 2.0))
    return float(np.mean(vals)) if vals else 0.0


def naive_wss(clean, est, fs=16000):
    n = min(len(clean), len(est))
    clean, est = clean[:n], est[:n]
    frame_len = int(0.03 * fs)
    hop = frame_len // 4
    win = np.hanning(frame_len)
    filt = naive_crit_filters(frame_len // 2 + 1, fs)
    vals = []
    for st in _naive_frames_inclusive(clean, frame_len, hop):
        S = np.abs(np.fft.rfft(clean[st:st + frame_len] * win)) ** 2
        E = np.abs(np.fft.rfft(est[st:st + frame_len] * win)) ** 2
        sb = np.array([10 * np.log10(np.dot(filt[b], S) + EPS10)
                       for b in range(25)])
        eb = np.array([10 * np.log10(np.dot(filt[b], E) + EPS10)
                       for b in range(25)])
        smax = sb.max()
        num = 0.0
        den = 0.0
        for b in range(24):
            locpeak = max(sb[b:])      # running max at/above this band
            w = (20.0 / (20.0 + smax - sb[b])) * \
                (1.0 / (1.0 + locpeak - sb[b]))
            ds = sb[b + 1] - sb[b]
            de = eb[b + 1] - eb[b]
            num += w * (ds - de) ** 2
            den += w
        vals.append(num / (den + EPS10))
    return float(np.mean(vals))


def naive_seg_snr(clean, est, fs=16000):
    n = min(len(clean), len(est))
    clean, est = clean[:n], est[:n]
    frame_len = int(0.03 * fs)
    hop = frame_len // 4
    vals = []
    for s in _naive_frames_inclusive(clean, frame_len, hop):
        sp = float(np.sum(clean[s:s + frame_len] ** 2))
        ep = float(np.sum((clean[s:s + frame_len]
                           - est[s:s + frame_len]) ** 2))
        snr = 10 * np.log10((sp + EPS10) / (ep + EPS10))
        vals.append(min(max(snr, -10.0), 35.0))
    return float(np.mean(vals))


# ===========================================================================
# signal families
# ===========================================================================

def _families(fs, seconds=1.6):
    n = int(seconds * fs)
    t = np.arange(n) / fs
    rng = np.random.RandomState(99)
    tone = np.sin(2 * np.pi * np.cumsum(
        180 + 60 * np.sin(2 * np.pi * 0.9 * t)) / fs)
    tone *= 0.4 + 0.6 * np.clip(np.sin(2 * np.pi * 2.3 * t), 0, None)
    mod_noise = rng.randn(n) * (0.3 + 0.7 * np.clip(
        np.sin(2 * np.pi * 1.3 * t + 0.4), 0, None))
    mix = tone + 0.5 * mod_noise
    pairs = []
    for clean in (tone, mix):
        for snr in (10.0, 0.0):
            nn = rng.randn(n) * np.sqrt(
                np.mean(clean ** 2) * 10 ** (-snr / 10))
            pairs.append((clean, clean + nn))
    return pairs


@pytest.mark.parametrize("extended", [False, True])
def test_stoi_matches_naive_at_10k(extended):
    for clean, deg in _families(10000):
        a = stoi(clean, deg, 10000, extended=extended)
        b = naive_stoi(clean, deg, 10000, extended)
        assert a == pytest.approx(b, abs=1e-9), (extended,)


def test_estoi_matches_naive_through_resampler_16k():
    clean, deg = _families(16000)[1]
    a = stoi(clean, deg, 16000, extended=True)
    b = naive_stoi(clean, deg, 16000, True)
    assert a == pytest.approx(b, abs=1e-9)


def test_objective_measures_match_naive():
    for clean, deg in _families(16000):
        assert fw_seg_snr(clean, deg) == pytest.approx(
            naive_fw_seg_snr(clean, deg), rel=1e-9, abs=1e-9)
        assert wss(clean, deg) == pytest.approx(
            naive_wss(clean, deg), rel=1e-9, abs=1e-9)
        assert seg_snr(clean, deg) == pytest.approx(
            naive_seg_snr(clean, deg), rel=1e-9, abs=1e-9)
    # LLR is heavier (double LPC per frame in pure loops): one family
    clean, deg = _families(16000)[2]
    assert llr(clean, deg) == pytest.approx(
        naive_llr(clean, deg), rel=1e-7, abs=1e-8)


def test_llr_lpc_matches_naive_lpc():
    from guided_vae_nmf_tpu.metrics.objective import _lpc

    rng = np.random.RandomState(3)
    for _ in range(5):
        fr = rng.randn(480) * np.hanning(480)
        a1, r1 = _lpc(fr, 18)
        a2, r2 = naive_lpc(fr, 18)
        np.testing.assert_allclose(r1, r2, rtol=1e-10, atol=1e-12)
        np.testing.assert_allclose(a1, a2, rtol=1e-8, atol=1e-10)
