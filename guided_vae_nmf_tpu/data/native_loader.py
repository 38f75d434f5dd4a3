"""ctypes bindings for the native (C++) host data loader.

Builds `native/libgvnmf_native.so` on first use (g++ via make) and exposes
fast wav/NIST-SPHERE decode and STFT power-spectrogram extraction that
match the Python implementations bit-for-bit (tests/data/test_native.py).
The C calls release the GIL, so wrapping them in a thread pool gives real
parallel feature extraction — the framework's replacement for the
reference's native libsndfile/librosa dependency surface (SURVEY §2.9).

All entry points gracefully report unavailability (`is_available()`); the
pure-Python paths remain the fallback.
"""

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.environ.get("GVNMF_NATIVE_DIR") or os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_SO_PATH = os.path.join(_NATIVE_DIR, "libgvnmf_native.so")

_lib = None
_build_failed = False


def _load():
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    if not os.path.exists(_SO_PATH):
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR],
                check=True, capture_output=True, timeout=120,
            )
        except (subprocess.SubprocessError, FileNotFoundError, OSError):
            _build_failed = True
            return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError:
        _build_failed = True
        return None
    lib.gvnmf_decode.restype = ctypes.c_long
    lib.gvnmf_decode.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_double), ctypes.c_long,
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.gvnmf_frame_count.restype = ctypes.c_long
    lib.gvnmf_frame_count.argtypes = [
        ctypes.c_long, ctypes.c_int, ctypes.c_double, ctypes.c_double,
    ]
    lib.gvnmf_bins.restype = ctypes.c_int
    lib.gvnmf_bins.argtypes = [ctypes.c_int, ctypes.c_double]
    lib.gvnmf_stft_power.restype = ctypes.c_int
    lib.gvnmf_stft_power.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_long, ctypes.c_int,
        ctypes.c_double, ctypes.c_double, ctypes.POINTER(ctypes.c_float),
    ]
    lib.gvnmf_load_power.restype = ctypes.c_long
    lib.gvnmf_load_power.argtypes = [
        ctypes.c_char_p, ctypes.c_double, ctypes.c_int, ctypes.c_double,
        ctypes.c_double, ctypes.POINTER(ctypes.c_float), ctypes.c_long,
    ]
    lib.gvnmf_stft_complex.restype = ctypes.c_int
    lib.gvnmf_stft_complex.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_long, ctypes.c_int,
        ctypes.c_double, ctypes.c_double, ctypes.POINTER(ctypes.c_float),
    ]
    if hasattr(lib, "gvnmf_assemble_utt"):  # present from round 2 on
        lib.gvnmf_assemble_utt.restype = ctypes.c_int
        lib.gvnmf_assemble_utt.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int16), ctypes.c_long,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_long), ctypes.POINTER(ctypes.c_long),
        ]
    _lib = lib
    return _lib


def is_available():
    return _load() is not None


def read_wav_native(path):
    """Native decode -> (float64 samples, fs); raises on failure."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    fs = ctypes.c_int(0)
    n = lib.gvnmf_decode(path.encode(), None, 0, ctypes.byref(fs))
    if n < 0:
        raise IOError(f"native decode failed: {path}")
    out = np.empty(n, np.float64)
    lib.gvnmf_decode(
        path.encode(),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        n, ctypes.byref(fs),
    )
    return out, int(fs.value)


def stft_power_native(x, fs=16000, wlen_sec=64e-3, hop_percent=0.25):
    """Native STFT power spectrogram -> (bins, frames) float32 (the
    reference orientation)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    x = np.ascontiguousarray(x, np.float64)
    frames = lib.gvnmf_frame_count(len(x), fs, wlen_sec, hop_percent)
    bins = lib.gvnmf_bins(fs, wlen_sec)
    out = np.empty((frames, bins), np.float32)
    rc = lib.gvnmf_stft_power(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(x), fs,
        wlen_sec, hop_percent,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if rc != 0:
        raise RuntimeError("native stft failed")
    return out.T


def stft_complex_native(x, fs=16000, wlen_sec=64e-3, hop_percent=0.25):
    """Native complex STFT -> (bins, frames) complex64 (the reference
    orientation)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    x = np.ascontiguousarray(x, np.float64)
    frames = lib.gvnmf_frame_count(len(x), fs, wlen_sec, hop_percent)
    bins = lib.gvnmf_bins(fs, wlen_sec)
    out = np.empty((frames, bins, 2), np.float32)
    rc = lib.gvnmf_stft_complex(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(x), fs,
        wlen_sec, hop_percent,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if rc != 0:
        raise RuntimeError("native stft failed")
    return out.view(np.complex64)[..., 0].T


def load_power_native(path, cut_sec=0.1, fs=16000, wlen_sec=64e-3,
                      hop_percent=0.25, max_frames=8192):
    """Fused native decode + burst cut + peak-normalize + STFT power ->
    (bins, frames) float32. One C call, GIL released."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    bins = lib.gvnmf_bins(fs, wlen_sec)
    buf = np.empty((max_frames, bins), np.float32)
    frames = lib.gvnmf_load_power(
        path.encode(), cut_sec, fs, wlen_sec, hop_percent,
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        buf.size,
    )
    if frames < 0:
        raise IOError(f"native load failed ({frames}): {path}")
    return np.ascontiguousarray(buf[:frames]).T


def has_assemble():
    lib = _load()
    return lib is not None and hasattr(lib, "gvnmf_assemble_utt")


def assemble_utt_native(path, row, fs=16000, nfft=1024, hop=256):
    """Decode + end-pad + reflect-pad + PCM16-quantize one utterance into
    the pre-zeroed int16 `row` (a view into the sweep's (B, L) transport
    batch), entirely in C++ with the GIL released — a thread pool
    assembles whole batches in parallel. Returns (n_frames, t_orig)."""
    lib = _load()
    assert row.dtype == np.int16 and row.flags.c_contiguous, \
        "row must be a contiguous int16 view into the batch"
    n_frames = ctypes.c_long()
    t_orig = ctypes.c_long()
    rc = lib.gvnmf_assemble_utt(
        path.encode(), row.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        row.shape[0], fs, nfft, hop,
        ctypes.byref(n_frames), ctypes.byref(t_orig),
    )
    if rc != 0:
        raise IOError(f"native assemble failed ({rc}) for {path}")
    return int(n_frames.value), int(t_orig.value)
