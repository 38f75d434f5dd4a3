"""Streaming enhancement: chunked output must equal the offline sweep."""

import os

import numpy as np
import jax
import pytest
from numpy.testing import assert_allclose

from conftest import REFERENCE_DATA, has_reference_data
from guided_vae_nmf_tpu.data import read_wav
from guided_vae_nmf_tpu.models import classifier_init
from guided_vae_nmf_tpu.pipeline import enhance_files_wiener
from guided_vae_nmf_tpu.streaming import StreamingWienerEnhancer

pytestmark = pytest.mark.skipif(
    not has_reference_data(), reason="reference subset absent")

PROCESSED = f"{REFERENCE_DATA}/processed/"
UTT = "CSR-1-WSJ-0/WAV/wsj0/si_et_05/440/440c020a.wav"


def _params():
    return classifier_init(jax.random.PRNGKey(3), [513, [32, 32], 513])


def test_streaming_matches_offline_sweep(tmp_path):
    """Chunk-by-chunk streaming output == the offline enhance_files_wiener
    track (same framing/padding/normalization, applied causally)."""
    w = _params()
    rng = np.random.RandomState(0)
    mean = rng.rand(513).astype(np.float32)
    std = (rng.rand(513) + 0.5).astype(np.float32)

    enhance_files_wiener([UTT], PROCESSED, str(tmp_path), w,
                         mean=mean, std=std)
    offline, _ = read_wav(
        str(tmp_path / os.path.splitext(UTT)[0]) + "_s_est.wav")

    x, fs = read_wav(os.path.join(PROCESSED, os.path.splitext(UTT)[0])
                     + "_x.wav")
    enh = StreamingWienerEnhancer(w, mean=mean, std=std)
    out = []
    lo = 0
    rng2 = np.random.RandomState(1)
    while lo < len(x):
        n = int(rng2.randint(160, 4000))  # ragged 10-250 ms chunks
        out.append(enh.push(x[lo:lo + n]))
        lo += n
    out.append(enh.flush())
    stream = np.concatenate(out)

    assert len(stream) == len(x) == len(offline)
    # offline additionally PCM16-quantizes on device -> +-1 LSB
    assert_allclose(stream, offline, atol=2.0 / 32768)


def test_streaming_incremental_latency():
    """push() emits samples as soon as one window of future audio exists —
    streaming, not batch-at-flush."""
    w = _params()
    enh = StreamingWienerEnhancer(w)
    rng = np.random.RandomState(2)
    emitted = 0
    for _ in range(8):
        emitted += len(enh.push(rng.randn(4000).astype(np.float32)))
    # 32000 samples in; all but ~one window's worth must already be out
    assert emitted >= 8 * 4000 - 2 * 1024


def test_streaming_masks_shape():
    w = _params()
    enh = StreamingWienerEnhancer(w)
    rng = np.random.RandomState(4)
    x = rng.randn(16000).astype(np.float32)
    enh.push(x)
    enh.flush()
    from guided_vae_nmf_tpu.dsp.stft import _maybe_end_pad

    n_exp = 1 + len(_maybe_end_pad(x, 16000, 64e-3, 0.25, 256)) // 256
    F, T = enh.masks.shape
    assert F == 513 and T == n_exp


def test_streaming_spp_matches_timo_masks():
    """The streaming SPP mask track equals the offline `timo` source
    (same causal recurrence over the same frames; f32 device power vs the
    host f64 STFT gives only tiny drift)."""
    from guided_vae_nmf_tpu.dsp import stft
    from guided_vae_nmf_tpu.mcem import timo_mask_estimation
    from guided_vae_nmf_tpu.streaming import StreamingSPPEnhancer

    x, _ = read_wav(os.path.join(PROCESSED, os.path.splitext(UTT)[0])
                    + "_x.wav")
    x = x[:32000]
    enh = StreamingSPPEnhancer()
    out = [enh.push(c) for c in np.array_split(x, 13)]
    out.append(enh.flush())
    stream = np.concatenate(out)
    assert len(stream) == len(x) and np.all(np.isfinite(stream))

    from guided_vae_nmf_tpu.dsp.stft import _maybe_end_pad

    ref_masks = timo_mask_estimation(
        np.abs(stft(x)) ** 2)[:, : enh.masks.shape[1]]
    got = enh.masks.astype(np.float32)[:, : ref_masks.shape[1]]
    assert got.shape == ref_masks.shape
    assert np.mean(np.abs(got - ref_masks)) < 5e-3


def test_streaming_spp_improves_stationary_noise():
    """Model-free SPP streaming must improve SI-SDR on stationary noise."""
    from guided_vae_nmf_tpu.metrics import energy_ratios
    from guided_vae_nmf_tpu.streaming import StreamingSPPEnhancer

    s, _ = read_wav(os.path.join(PROCESSED, os.path.splitext(UTT)[0])
                    + "_s.wav")
    s = s[:48000]
    rng = np.random.RandomState(0)
    n = (rng.randn(len(s)) * np.sqrt(np.mean(s**2))).astype(np.float32)
    x = s + n
    enh = StreamingSPPEnhancer()
    out = [enh.push(c) for c in np.array_split(x, 9)]
    out.append(enh.flush())
    sh = np.concatenate(out)
    before = energy_ratios(x, s, n)[0]
    after = energy_ratios(sh, s, n)[0]
    assert after > before + 1.0  # at least +1 dB on white noise


def test_push_after_flush_raises():
    import pytest as _pytest
    from guided_vae_nmf_tpu.streaming import StreamingSPPEnhancer
    enh = StreamingSPPEnhancer(chunk_frames=8)
    rng = np.random.RandomState(0)
    x = rng.randn(16000).astype(np.float32) * 0.05
    enh.push(x)
    enh.flush()
    with _pytest.raises(RuntimeError):
        enh.push(x)
    enh.reset()                      # reset clears the flushed state
    out = enh.push(x)
    assert out.dtype == np.float32


def test_streaming_m2_runs_and_enhances():
    """Blockwise warm-started PEEM M2 stream (timo labels, SPP noise):
    chunked output is finite, mask-bounded, and the chunking is
    deterministic (same input split differently -> same state count)."""
    from guided_vae_nmf_tpu.models import dgm_init
    from guided_vae_nmf_tpu.streaming import StreamingM2Enhancer

    F_BINS = 513
    dgm = dgm_init(jax.random.PRNGKey(0), [F_BINS, F_BINS, 8, [32]])
    rng = np.random.RandomState(4)
    n = 2 * 16000
    t = np.arange(n) / 16000
    s = 0.1 * np.sin(2 * np.pi * np.cumsum(
        130 + 40 * np.sin(2 * np.pi * 0.7 * t)) / 16000)
    s *= np.clip(np.sin(2 * np.pi * 1.8 * t), 0, None)
    x = (s + 0.03 * rng.randn(n)).astype(np.float32)

    enh = StreamingM2Enhancer(dgm, label_mode="timo", chunk_frames=8,
                              context_frames=16, block_iters=3, e_steps=2)
    outs = []
    for lo in range(0, n, 3000):
        outs.append(enh.push(x[lo:lo + 3000]))
    outs.append(enh.flush())
    y = np.concatenate(outs)
    assert len(y) == n
    assert np.all(np.isfinite(y))
    m = enh.masks
    assert m.shape[0] == F_BINS
    assert float(np.asarray(m, np.float32).min()) >= 0.0
    assert float(np.asarray(m, np.float32).max()) <= 1.0
    # the enhancer must actually suppress something (not the identity)
    assert np.mean((y - x[:len(y)]) ** 2) > 1e-10
    with pytest.raises(RuntimeError):
        enh.push(x[:100])


def test_streaming_m2_warmup_context_validity():
    """Regression (round-3 review): during stream warm-up the context must
    hold exactly the real frames seen so far — the old np.roll logic
    duplicated frames and inflated ctx_valid before the context filled."""
    from guided_vae_nmf_tpu.models import dgm_init
    from guided_vae_nmf_tpu.streaming import StreamingM2Enhancer, HOP

    F_BINS = 513
    dgm = dgm_init(jax.random.PRNGKey(0), [F_BINS, F_BINS, 8, [32]])
    enh = StreamingM2Enhancer(dgm, label_mode="timo", chunk_frames=2,
                              context_frames=8, block_iters=1, e_steps=1)
    rng = np.random.RandomState(0)
    frames_seen = 0
    x = (0.05 * rng.randn(8 * 16000)).astype(np.float32)
    lo = 0
    for chunk in (2500, 2000, 3000, 2600):
        enh.push(x[lo:lo + chunk])
        lo += chunk
        frames_seen = enh._t_done
        want = min(8, frames_seen)
        got = int(enh._ctx_valid.sum())
        assert got == want, (frames_seen, got)
        # valid context = right-aligned block, no stale prefix validity
        assert np.all(enh._ctx_valid[:8 - got] == 0.0)
        assert np.all(enh._ctx_valid[8 - got:] == 1.0)


def test_streaming_m2_vad_family():
    """The VAD-guided M2 (y_dim=1) streams with both label sources —
    regression for the _ctx_y shape being keyed on label_mode."""
    from guided_vae_nmf_tpu.models import dgm_init, classifier_init
    from guided_vae_nmf_tpu.streaming import StreamingM2Enhancer

    F_BINS = 513
    dgm = dgm_init(jax.random.PRNGKey(0), [F_BINS, 1, 8, [32]])
    rng = np.random.RandomState(1)
    x = (0.05 * rng.randn(16000)).astype(np.float32)

    for kwargs in (
        {"label_mode": "timo"},
        {"label_mode": "dnn",
         "classifier_params": classifier_init(
             jax.random.PRNGKey(1), [F_BINS, [16], 1])},
    ):
        enh = StreamingM2Enhancer(dgm, chunk_frames=4, context_frames=8,
                                  block_iters=2, e_steps=2, **kwargs)
        y = np.concatenate([enh.push(x), enh.flush()])
        assert len(y) == len(x)
        assert np.all(np.isfinite(y))


def test_streaming_m2_soft_guidance():
    """soft_guidance=True conditions the stream on label probabilities:
    finite output that differs from the hard-label stream."""
    from guided_vae_nmf_tpu.models import dgm_init
    from guided_vae_nmf_tpu.streaming import StreamingM2Enhancer

    F_BINS = 513
    dgm = dgm_init(jax.random.PRNGKey(0), [F_BINS, F_BINS, 8, [32]])
    rng = np.random.RandomState(5)
    n = 16000
    x = (0.05 * np.sin(2 * np.pi * 220 * np.arange(n) / 16000)
         + 0.02 * rng.randn(n)).astype(np.float32)

    ys = {}
    for soft in (False, True):
        enh = StreamingM2Enhancer(dgm, label_mode="timo", chunk_frames=8,
                                  context_frames=16, block_iters=2,
                                  e_steps=2, soft_guidance=soft)
        outs = [enh.push(x)]
        outs.append(enh.flush())
        ys[soft] = np.concatenate(outs)
    assert np.all(np.isfinite(ys[True]))
    assert len(ys[True]) == len(ys[False]) == n
    assert not np.array_equal(ys[True], ys[False])


def test_streaming_m2_residual_tracking():
    """Causal residual noise tracking (the streaming analogue of the
    offline 'spp2' two-pass model): deterministic, finite, engages the
    EMA state, and on a stationary-noise stream it suppresses at least
    as much energy in the tail as the plain SPP stream (the residual
    floor can only raise the noise variance)."""
    from guided_vae_nmf_tpu.models import dgm_init
    from guided_vae_nmf_tpu.streaming import StreamingM2Enhancer

    F_BINS = 513
    dgm = dgm_init(jax.random.PRNGKey(0), [F_BINS, F_BINS, 8, [32]])
    rng = np.random.RandomState(7)
    n = 2 * 16000
    x = (0.05 * rng.randn(n)).astype(np.float32)  # noise-only stream

    def run(tracking):
        enh = StreamingM2Enhancer(dgm, label_mode="timo", chunk_frames=8,
                                  context_frames=16, block_iters=2,
                                  e_steps=2, residual_tracking=tracking)
        y = np.concatenate([enh.push(x), enh.flush()])
        return y, enh

    y0, _ = run(False)
    y1, enh1 = run(True)
    y1b, _ = run(True)
    assert np.array_equal(y1, y1b)              # deterministic
    assert np.all(np.isfinite(y1))
    assert enh1._res is not None and enh1._res.shape == (F_BINS,)
    # tail energy (after the EMA has warmed): tracking suppresses >= plain
    tail = slice(n // 2, n)
    assert np.sum(y1[tail] ** 2) <= np.sum(y0[tail] ** 2) * 1.02
    # reset() clears the tracker state
    enh1.reset()
    assert enh1._res is None


def test_flush_without_push_returns_empty():
    """flush() on a never-pushed (or empty-chunk-only) stream must return
    an empty array, not crash in the reflect padding."""
    from guided_vae_nmf_tpu.streaming import StreamingSPPEnhancer
    enh = StreamingSPPEnhancer(chunk_frames=8)
    out = enh.flush()
    assert out.size == 0 and out.dtype == np.float32

    enh = StreamingSPPEnhancer(chunk_frames=8)
    assert enh.push(np.zeros(0, np.float32)).size == 0
    out = enh.flush()
    assert out.size == 0 and out.dtype == np.float32


def test_streaming_m2_noise_gain():
    """noise_gain=True learns an in-block per-frame noise gain: the
    stream stays deterministic, finite, and differs from the plain
    stream; off is the default and keeps the original output."""
    from guided_vae_nmf_tpu.models import dgm_init
    from guided_vae_nmf_tpu.streaming import StreamingM2Enhancer

    m2 = dgm_init(jax.random.PRNGKey(0), [513, 513, 16, [32]])
    rng = np.random.RandomState(7)
    x = rng.randn(16000).astype(np.float32) * 0.1
    x[6000:6400] += rng.randn(400).astype(np.float32) * 2.0  # impulse

    def run(**kw):
        enh = StreamingM2Enhancer(m2, label_mode="timo", chunk_frames=8,
                                  **kw)
        out = [enh.push(x[lo:lo + 4096]) for lo in range(0, len(x), 4096)]
        out.append(enh.flush())
        return np.concatenate(out)

    y0 = run()
    y1 = run(noise_gain=True)
    y1b = run(noise_gain=True)
    assert y1.shape == y0.shape
    assert np.all(np.isfinite(y1))
    np.testing.assert_array_equal(y1, y1b)      # deterministic
    assert not np.array_equal(y1, y0)           # the gain does something


def test_streaming_noise_gain_ratio_init():
    """noise_gain_init='ratio' is deterministic, differs from 'ones', and
    rejects unknown values."""
    from guided_vae_nmf_tpu.models import dgm_init
    from guided_vae_nmf_tpu.streaming import StreamingM2Enhancer

    m2 = dgm_init(jax.random.PRNGKey(0), [513, 513, 16, [32]])
    rng = np.random.RandomState(9)
    x = rng.randn(12000).astype(np.float32) * 0.1
    x[4000:4400] += rng.randn(400).astype(np.float32) * 2.0

    def run(init):
        enh = StreamingM2Enhancer(m2, label_mode="timo", chunk_frames=8,
                                  noise_gain=True, noise_gain_init=init)
        out = [enh.push(x[lo:lo + 4096]) for lo in range(0, len(x), 4096)]
        out.append(enh.flush())
        return np.concatenate(out)

    a = run("ratio")
    b = run("ratio")
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, run("ones"))
    with pytest.raises(ValueError, match="noise_gain_init"):
        StreamingM2Enhancer(m2, label_mode="timo", noise_gain=True,
                            noise_gain_init="zeros")


def test_streaming_noise_gain_bands():
    """noise_gain_bands > 1 in the stream: per-band warm-started gain,
    deterministic, differs from the scalar gain."""
    from guided_vae_nmf_tpu.models import dgm_init
    from guided_vae_nmf_tpu.streaming import StreamingM2Enhancer

    m2 = dgm_init(jax.random.PRNGKey(0), [513, 513, 16, [32]])
    rng = np.random.RandomState(11)
    x = rng.randn(12000).astype(np.float32) * 0.1
    x[4000:4400] += rng.randn(400).astype(np.float32) * 2.0

    def run(nb):
        enh = StreamingM2Enhancer(m2, label_mode="timo", chunk_frames=8,
                                  noise_gain=True, noise_gain_bands=nb)
        out = [enh.push(x[lo:lo + 4096]) for lo in range(0, len(x), 4096)]
        out.append(enh.flush())
        assert enh._ctx_b.shape == ((enh.C,) if nb == 1 else (nb, enh.C))
        return np.concatenate(out)

    a = run(2)
    np.testing.assert_array_equal(a, run(2))
    assert np.all(np.isfinite(a))
    assert not np.array_equal(a, run(1))


# ---------------------------------------------------------------------------
# Multi-stream pool
# ---------------------------------------------------------------------------

def _pool_signal(seed, n):
    rng = np.random.RandomState(seed)
    t = np.arange(n) / 16000
    s = 0.1 * np.sin(2 * np.pi * np.cumsum(
        120 + (20 + 10 * seed) * np.sin(2 * np.pi * 0.9 * t)) / 16000)
    s *= np.clip(np.sin(2 * np.pi * 1.5 * t + seed), 0, None)
    return (s + 0.03 * rng.randn(n)).astype(np.float32)


def _m2_cfg():
    from guided_vae_nmf_tpu.models import dgm_init

    dgm = dgm_init(jax.random.PRNGKey(0), [513, 513, 8, [32]])
    kw = dict(label_mode="timo", chunk_frames=4, context_frames=12,
              block_iters=2, e_steps=2)
    return dgm, kw


def test_multistream_matches_single():
    """Each pooled stream's output equals a dedicated single-stream
    enhancer fed the same samples — lanes are independent, so grouping
    and co-batched traffic cannot change a stream's result (float
    tolerance: XLA tiles the vmapped matmuls differently)."""
    from guided_vae_nmf_tpu.streaming import (
        MultiStreamM2Enhancer, StreamingM2Enhancer,
    )

    dgm, kw = _m2_cfg()
    sigs = [_pool_signal(s, n) for s, n in
            ((1, 16000), (2, 24000), (3, 11000))]

    singles = []
    for x in sigs:
        enh = StreamingM2Enhancer(dgm, **kw)
        parts = [enh.push(x[lo:lo + 4000]) for lo in range(0, len(x), 4000)]
        parts.append(enh.flush())
        singles.append(np.concatenate(parts))

    pool = MultiStreamM2Enhancer(dgm, max_streams=4, **kw)
    sids = [pool.open() for _ in sigs]
    outs = {sid: [] for sid in sids}
    pos = [0, 0, 0]
    # interleaved ragged feeding; streams finish at different times
    rng = np.random.RandomState(7)
    live = set(range(3))
    while live:
        for i in sorted(live):
            n = int(rng.randint(1500, 5000))
            pool.feed(sids[i], sigs[i][pos[i]:pos[i] + n])
            pos[i] += n
        for sid, arr in pool.step().items():
            outs[sid].append(arr)
        for i in sorted(live):
            if pos[i] >= len(sigs[i]):
                outs[sids[i]].append(pool.flush(sids[i]))
                pool.close(sids[i])
                live.discard(i)
    # flush() co-drains other streams into their buffers; a final step()
    # on a closed pool is a no-op (all sids closed above) so everything
    # must already be accounted for
    for i, x in enumerate(sigs):
        got = np.concatenate(outs[sids[i]])
        assert len(got) == len(x)
        assert_allclose(got, singles[i], atol=2e-5, rtol=1e-4,
                        err_msg=f"stream {i}")


def test_multistream_dnn_labels_match_single():
    """The pool's batched classifier path (one `_dnn_probs_jit` call per
    tick, sliced per lane) produces the same guidance — and therefore
    the same output — as a dedicated stream running the classifier on
    its own chunk."""
    from guided_vae_nmf_tpu.models import classifier_init
    from guided_vae_nmf_tpu.streaming import (
        MultiStreamM2Enhancer, StreamingM2Enhancer,
    )

    dgm, kw = _m2_cfg()
    kw = dict(kw, label_mode="dnn",
              classifier_params=classifier_init(
                  jax.random.PRNGKey(3), [513, [16], 513]),
              mean=np.full((513,), 0.01, np.float32),
              std=np.full((513,), 0.02, np.float32))
    sigs = [_pool_signal(s, n) for s, n in ((4, 12000), (5, 16000))]

    singles = []
    for x in sigs:
        enh = StreamingM2Enhancer(dgm, **kw)
        singles.append(np.concatenate([enh.push(x), enh.flush()]))

    pool = MultiStreamM2Enhancer(dgm, max_streams=2, **kw)
    sids = [pool.open() for _ in sigs]
    outs = {sid: [] for sid in sids}
    for lo in range(0, 16000, 4000):
        for sid, x in zip(sids, sigs):
            pool.feed(sid, x[lo:lo + 4000])
        for sid, arr in pool.step().items():
            outs[sid].append(arr)
    for sid in sids:
        outs[sid].append(pool.flush(sid))
        pool.close(sid)
    for i, x in enumerate(sigs):
        got = np.concatenate(outs[sids[i]])
        assert len(got) == len(x)
        assert_allclose(got, singles[i], atol=2e-5, rtol=1e-4,
                        err_msg=f"dnn stream {i}")


def test_multistream_mesh_sharded_matches_single():
    """Mesh mode: live streams shard across the 8-way virtual mesh (rows
    + resident state on the data axis, one shard_map program per tick,
    idle rows frozen at k=0). Every stream's output must equal a
    dedicated single-device StreamingM2Enhancer fed the same samples,
    including slots that sit idle for whole ticks."""
    from guided_vae_nmf_tpu.parallel import make_mesh
    from guided_vae_nmf_tpu.streaming import (
        MultiStreamM2Enhancer, StreamingM2Enhancer,
    )

    mesh = make_mesh()
    n_dev = mesh.shape["data"]
    dgm, kw = _m2_cfg()
    sigs = [_pool_signal(s, n) for s, n in
            ((6, 15000), (7, 9000), (8, 20000))]

    singles = []
    for x in sigs:
        enh = StreamingM2Enhancer(dgm, **kw)
        parts = [enh.push(x[lo:lo + 3000]) for lo in range(0, len(x), 3000)]
        parts.append(enh.flush())
        singles.append(np.concatenate(parts))

    pool = MultiStreamM2Enhancer(dgm, max_streams=n_dev, mesh=mesh, **kw)
    sids = [pool.open() for _ in sigs]
    outs = {sid: [] for sid in sids}
    pos = [0, 0, 0]
    live = set(range(3))
    rng = np.random.RandomState(3)
    while live:
        for i in sorted(live):
            if rng.rand() < 0.3:
                continue                  # this stream idles this round
            n = int(rng.randint(1000, 4000))
            pool.feed(sids[i], sigs[i][pos[i]:pos[i] + n])
            pos[i] += n
        for sid, arr in pool.step().items():
            outs[sid].append(arr)
        for i in sorted(live):
            if pos[i] >= len(sigs[i]):
                outs[sids[i]].append(pool.flush(sids[i]))
                pool.close(sids[i])
                live.discard(i)
    for i, x in enumerate(sigs):
        got = np.concatenate(outs[sids[i]])
        assert len(got) == len(x)
        assert_allclose(got, singles[i], atol=2e-5, rtol=1e-4,
                        err_msg=f"mesh stream {i}")


def test_multistream_state_views_read_resident_rows():
    """A pool slot's introspection views (_ctx_valid/_ctx_b/_res) must
    reflect the device-resident pool row the ticks actually update, not
    the slot's untouched fresh _dstate."""
    from guided_vae_nmf_tpu.streaming import MultiStreamM2Enhancer

    dgm, kw = _m2_cfg()
    pool = MultiStreamM2Enhancer(dgm, max_streams=2, **kw)
    sid = pool.open()
    pool.feed(sid, _pool_signal(9, 8000))
    pool.step()
    enh = pool._slot(sid)
    assert enh._ctx_valid.sum() > 0          # warm context visible
    # recycling resets the resident row: a fresh slot sees fresh state
    pool.flush(sid)
    pool.close(sid)
    sid2 = pool.open()
    assert pool._slot(sid2)._ctx_valid.sum() == 0
    pool.close(sid2)


def test_multistream_slot_lifecycle():
    """Admission control, recycling, and misuse guards."""
    from guided_vae_nmf_tpu.streaming import MultiStreamM2Enhancer

    dgm, kw = _m2_cfg()
    pool = MultiStreamM2Enhancer(dgm, max_streams=2, **kw)
    a = pool.open()
    b = pool.open()
    with pytest.raises(RuntimeError):
        pool.open()                      # full
    x = _pool_signal(0, 9000)
    pool.feed(a, x)
    out_a = [v for k, v in pool.step().items() if k == a]
    assert out_a and out_a[0].size > 0
    tail = pool.flush(a)
    assert np.concatenate(out_a + [tail]).shape == (len(x),)
    with pytest.raises(RuntimeError):
        pool.flush(a)                    # flush twice
    with pytest.raises(RuntimeError):
        pool.feed(a, x[:100])            # feed after flush
    pool.close(a)
    with pytest.raises(KeyError):
        pool.feed(a, x[:100])            # closed sid
    c = pool.open()                      # recycled slot, fresh state
    assert c != a
    pool.feed(c, x[:5000])
    assert pool.masks(c).shape[0] == 513
    pool.close(b)
    pool.close(c)


def test_multistream_flush_codrains_into_buffers():
    """flush(one stream) batches whatever else is ready; the co-drained
    output must surface at the OTHER stream's next step(), not vanish."""
    from guided_vae_nmf_tpu.streaming import MultiStreamM2Enhancer

    dgm, kw = _m2_cfg()
    pool = MultiStreamM2Enhancer(dgm, max_streams=2, **kw)
    a, b = pool.open(), pool.open()
    xa = _pool_signal(5, 7000)
    xb = _pool_signal(6, 15000)
    pool.feed(a, xa)
    pool.feed(b, xb[:12000])
    tail_a = pool.flush(a)               # co-drains b's ready chunks
    assert tail_a.shape == (len(xa),)
    pool.feed(b, xb[12000:])
    got_b = [pool.step().get(b, np.zeros(0, np.float32))]
    got_b.append(pool.flush(b))
    assert np.concatenate(got_b).shape == (len(xb),)


def test_multistream_empty_flush():
    from guided_vae_nmf_tpu.streaming import MultiStreamM2Enhancer

    dgm, kw = _m2_cfg()
    pool = MultiStreamM2Enhancer(dgm, max_streams=1, **kw)
    a = pool.open()
    assert pool.flush(a).size == 0
    pool.close(a)


def test_stream_pool_driver_concurrent():
    """Concurrent handler threads through one StreamPoolDriver: each
    stream's output equals a dedicated enhancer; abort releases slots."""
    import threading

    from guided_vae_nmf_tpu.streaming import (
        MultiStreamM2Enhancer, PooledStreamSession, StreamingM2Enhancer,
        StreamPoolDriver,
    )

    dgm, kw = _m2_cfg()
    sigs = [_pool_signal(10 + i, 9000 + 2000 * i) for i in range(3)]
    singles = []
    for x in sigs:
        enh = StreamingM2Enhancer(dgm, **kw)
        parts = [enh.push(x[lo:lo + 2500]) for lo in range(0, len(x), 2500)]
        parts.append(enh.flush())
        singles.append(np.concatenate(parts))

    driver = StreamPoolDriver(
        MultiStreamM2Enhancer(dgm, max_streams=3, **kw), tick_ms=2.0)
    results = {}

    def client(i):
        sess = PooledStreamSession(driver)
        try:
            x = sigs[i]
            parts = [sess.push(x[lo:lo + 2500])
                     for lo in range(0, len(x), 2500)]
            parts.append(sess.flush())
            results[i] = np.concatenate([p for p in parts if p.size])
        finally:
            sess.close()

    threads = [threading.Thread(target=client, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert sorted(results) == [0, 1, 2]
    for i in range(3):
        assert len(results[i]) == len(sigs[i])
        assert_allclose(results[i], singles[i], atol=2e-5, rtol=1e-4,
                        err_msg=f"pooled stream {i}")

    # abort path: a dropped session must release its slot
    a = PooledStreamSession(driver)
    b = PooledStreamSession(driver)
    c = PooledStreamSession(driver)
    with pytest.raises(RuntimeError):
        PooledStreamSession(driver)      # full (max_streams=3)
    a.push(sigs[0][:3000])
    a.close()                            # abort without flush
    d = PooledStreamSession(driver)      # slot recycled
    d.close()
    b.close()
    c.close()
    driver.shutdown()


def test_stream_pool_driver_fail_fast(monkeypatch):
    """A ticker-thread failure must surface as an exception in push(),
    never as an infinite hang (review finding: a dead ticker would wedge
    every connection and silently 429 all new ones)."""
    from guided_vae_nmf_tpu.streaming import (
        MultiStreamM2Enhancer, StreamPoolDriver,
    )

    dgm, kw = _m2_cfg()
    pool = MultiStreamM2Enhancer(dgm, max_streams=2, **kw)
    driver = StreamPoolDriver(pool, tick_ms=1.0)
    sid = driver.open()

    def boom():
        raise ValueError("device exploded")

    monkeypatch.setattr(pool, "step", boom)
    with pytest.raises(RuntimeError, match="ticker died"):
        driver.push(sid, _pool_signal(0, 8000))
    with pytest.raises(RuntimeError):    # stays failed, fails at entry
        driver.push(sid, np.zeros(100, np.float32))
    driver.shutdown()


def test_stream_pool_flush_failure_releases_slot(monkeypatch):
    """driver.flush() must release the slot even when the pool flush
    raises — otherwise failed streams leak slots until the pool is full."""
    from guided_vae_nmf_tpu.streaming import (
        MultiStreamM2Enhancer, StreamPoolDriver,
    )

    dgm, kw = _m2_cfg()
    pool = MultiStreamM2Enhancer(dgm, max_streams=1, **kw)
    driver = StreamPoolDriver(pool, tick_ms=1.0)
    sid = driver.open()
    driver.push(sid, _pool_signal(1, 4000))

    real_flush = pool.flush

    def failing_flush(s):
        raise ValueError("flush failed")

    monkeypatch.setattr(pool, "flush", failing_flush)
    with pytest.raises(ValueError):
        driver.flush(sid)
    monkeypatch.setattr(pool, "flush", real_flush)
    sid2 = driver.open()                 # slot came back
    driver.abort(sid2)
    driver.shutdown()


def test_streaming_rejects_non_finite_input():
    """A NaN/Inf chunk would poison the device-resident recurrence state
    for the rest of the stream; _ingest fails the bad chunk instead
    (same contract as EnhancementService.submit)."""
    from guided_vae_nmf_tpu.streaming import StreamingSPPEnhancer

    enh = StreamingSPPEnhancer(chunk_frames=4)
    enh.push(np.zeros(2000, np.float32))
    bad = np.zeros(1000, np.float32)
    bad[500] = np.nan
    with pytest.raises(ValueError, match="non-finite"):
        enh.push(bad)
    # the stream survives: good chunks keep flowing
    y = enh.push(np.zeros(2000, np.float32))
    assert np.all(np.isfinite(y))


def test_streaming_bounded_memory_trim():
    """Indefinite live streams run at bounded memory: finalized buffer
    prefixes are trimmed (absolute coordinates offset by the drop
    counters) without changing a single output sample, including the
    flush tail built append-only from the trimmed buffer."""
    from guided_vae_nmf_tpu.streaming import StreamingSPPEnhancer

    rng = np.random.RandomState(3)
    x = (0.05 * rng.randn(12 * 16000)).astype(np.float32)

    ref = StreamingSPPEnhancer(chunk_frames=8)
    ref.TRIM_CHUNK = 1 << 62          # effectively no trimming
    trim = StreamingSPPEnhancer(chunk_frames=8)
    trim.TRIM_CHUNK = 8192            # aggressive trimming

    out_r, out_t = [], []
    for lo in range(0, len(x), 3210):
        out_r.append(ref.push(x[lo:lo + 3210]))
        out_t.append(trim.push(x[lo:lo + 3210]))
    # the trimmed stream's working set is bounded...
    bound = trim.TRIM_CHUNK + 4 * 1024 + 2 * 4000
    assert len(trim._pad) < bound, len(trim._pad)
    assert trim._y.size < 2 * bound
    assert trim._raw.size < bound
    # ...while the reference kept everything
    assert len(ref._pad) > len(x)
    out_r.append(ref.flush())
    out_t.append(trim.flush())
    a, b = np.concatenate(out_r), np.concatenate(out_t)
    assert len(a) == len(b) == len(x)
    np.testing.assert_array_equal(a, b)   # bit-identical output


def test_multistream_bounded_memory_trim():
    """The pooled emit path trims finalized prefixes too (long-lived
    pool slots run at bounded memory) without changing output vs a
    dedicated untrimmed stream."""
    from guided_vae_nmf_tpu.streaming import (
        MultiStreamM2Enhancer, StreamingM2Enhancer,
    )

    dgm, kw = _m2_cfg()
    x = _pool_signal(12, 6 * 16000)

    single = StreamingM2Enhancer(dgm, **kw)
    single.TRIM_CHUNK = 1 << 62
    want = np.concatenate([single.push(x), single.flush()])

    pool = MultiStreamM2Enhancer(dgm, max_streams=2, **kw)
    sid = pool.open()
    s = pool._slot(sid)
    s.TRIM_CHUNK = 8192
    outs = []
    for lo in range(0, len(x), 4000):
        pool.feed(sid, x[lo:lo + 4000])
        outs.extend(pool.step().values())
    assert len(s._pad) < 8192 + 3 * 4096 + 4000, len(s._pad)
    assert s._raw.size < 8192 + 3 * 4096 + 4000
    outs.append(pool.flush(sid))
    pool.close(sid)
    got = np.concatenate(outs)
    assert len(got) == len(x)
    assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_stream_pool_driver_churn():
    """Sustained churn: waves of short-lived clients — half aborting
    mid-stream — cycle through recycled slots while a long-lived client
    streams continuously. The long stream must equal a dedicated
    enhancer (recycled resident rows cannot leak state into it) and
    every wave must complete."""
    import threading

    from guided_vae_nmf_tpu.streaming import (
        MultiStreamM2Enhancer, PooledStreamSession, StreamingM2Enhancer,
        StreamPoolDriver,
    )

    dgm, kw = _m2_cfg()
    x_long = _pool_signal(20, 30000)
    single = StreamingM2Enhancer(dgm, **kw)
    want = np.concatenate(
        [single.push(x_long[lo:lo + 1500])
         for lo in range(0, len(x_long), 1500)] + [single.flush()])

    driver = StreamPoolDriver(
        MultiStreamM2Enhancer(dgm, max_streams=3, **kw), tick_ms=1.0)
    done = []          # list.append is atomic under the GIL
    got = {}

    def long_client():
        sess = PooledStreamSession(driver)
        try:
            parts = [sess.push(x_long[lo:lo + 1500])
                     for lo in range(0, len(x_long), 1500)]
            parts.append(sess.flush())
            got["long"] = np.concatenate([p for p in parts if p.size])
        finally:
            sess.close()

    def churn_client(seed):
        rng = np.random.RandomState(seed)
        for it in range(6):
            sess = PooledStreamSession(driver)
            try:
                sess.push(_pool_signal(100 + seed * 31 + it, 2500))
                if rng.rand() < 0.5:
                    pass                      # abort via close()
                else:
                    sess.flush()
                done.append(1)
            finally:
                sess.close()

    threads = [threading.Thread(target=long_client)] + [
        threading.Thread(target=churn_client, args=(s,)) for s in (1, 2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert not any(t.is_alive() for t in threads)
    assert len(done) == 12
    assert len(got["long"]) == len(x_long)
    assert_allclose(got["long"], want, atol=2e-5, rtol=1e-4)
    driver.shutdown()


def test_streaming_adaptive_iters():
    """adaptive_iters escalates the in-block EM budget when the noise
    gain still moves (impulse blocks): deterministic, finite, differs
    from the fixed-budget stream, requires noise_gain, and composes with
    bands."""
    from guided_vae_nmf_tpu.models import dgm_init
    from guided_vae_nmf_tpu.streaming import StreamingM2Enhancer

    m2 = dgm_init(jax.random.PRNGKey(0), [513, 513, 16, [32]])
    rng = np.random.RandomState(7)
    x = rng.randn(16000).astype(np.float32) * 0.1
    x[6000:6400] += rng.randn(400).astype(np.float32) * 2.0  # impulse

    def run(**kw):
        enh = StreamingM2Enhancer(m2, label_mode="timo", chunk_frames=8,
                                  **kw)
        out = [enh.push(x[lo:lo + 4096]) for lo in range(0, len(x), 4096)]
        out.append(enh.flush())
        return np.concatenate(out)

    y_fixed = run(noise_gain=True)
    y_ad = run(noise_gain=True, adaptive_iters=12)
    y_ad2 = run(noise_gain=True, adaptive_iters=12)
    assert np.all(np.isfinite(y_ad))
    np.testing.assert_array_equal(y_ad, y_ad2)     # deterministic
    assert not np.array_equal(y_ad, y_fixed)       # extra iters engaged
    # composes with per-band gains
    yb = run(noise_gain=True, noise_gain_bands=2, adaptive_iters=8)
    assert np.all(np.isfinite(yb))
    with pytest.raises(ValueError, match="adaptive_iters"):
        StreamingM2Enhancer(m2, label_mode="timo", adaptive_iters=4)


def test_streaming_escalate_reinit():
    """escalate_reinit (round 5): escalated blocks re-init their gain at
    the window power ratio before the extra adaptive iterations —
    deterministic, finite, differs from plain adaptive escalation, and
    requires the adaptive budget."""
    from guided_vae_nmf_tpu.models import dgm_init
    from guided_vae_nmf_tpu.streaming import StreamingM2Enhancer

    m2 = dgm_init(jax.random.PRNGKey(0), [513, 513, 16, [32]])
    rng = np.random.RandomState(7)
    x = rng.randn(16000).astype(np.float32) * 0.1
    x[6000:6400] += rng.randn(400).astype(np.float32) * 2.0  # impulse

    def run(**kw):
        enh = StreamingM2Enhancer(m2, label_mode="timo", chunk_frames=8,
                                  noise_gain=True, **kw)
        out = [enh.push(x[lo:lo + 4096]) for lo in range(0, len(x), 4096)]
        out.append(enh.flush())
        return np.concatenate(out)

    y_ad = run(adaptive_iters=12)
    y_esc = run(adaptive_iters=12, escalate_reinit=True)
    y_esc2 = run(adaptive_iters=12, escalate_reinit=True)
    assert np.all(np.isfinite(y_esc))
    np.testing.assert_array_equal(y_esc, y_esc2)   # deterministic
    assert not np.array_equal(y_esc, y_ad)         # re-init engaged
    # composes with per-band gains
    yb = run(noise_gain_bands=2, adaptive_iters=8, escalate_reinit=True)
    assert np.all(np.isfinite(yb))
    with pytest.raises(ValueError, match="escalate_reinit"):
        StreamingM2Enhancer(m2, label_mode="timo", noise_gain=True,
                            escalate_reinit=True)


def test_streaming_lookahead():
    """One-block lookahead (round 5): emission runs one tick late so each
    chunk is re-optimized with the NEXT chunk visible. Output length and
    framing are unchanged; emission lags the causal stream by one chunk;
    ragged push sizes drain fully at flush; deterministic."""
    from guided_vae_nmf_tpu.models import dgm_init
    from guided_vae_nmf_tpu.streaming import StreamingM2Enhancer

    m2 = dgm_init(jax.random.PRNGKey(0), [513, 513, 16, [32]])
    rng = np.random.RandomState(3)
    x = rng.randn(20000).astype(np.float32) * 0.1

    def run(push_sizes, **kw):
        enh = StreamingM2Enhancer(m2, label_mode="timo", chunk_frames=4,
                                  **kw)
        outs, lo, i = [], 0, 0
        while lo < len(x):
            n = push_sizes[i % len(push_sizes)]
            outs.append(enh.push(x[lo:lo + n]))
            lo += n
            i += 1
        emitted_before_flush = sum(len(o) for o in outs)
        outs.append(enh.flush())
        return np.concatenate(outs), emitted_before_flush

    y_norm, em_norm = run([4096])
    y_la, em_la = run([4096], lookahead=True)
    assert len(y_la) == len(x) == len(y_norm)
    assert np.all(np.isfinite(y_la))
    assert not np.array_equal(y_la, y_norm)        # future engaged
    # emission lags the causal stream by exactly one chunk of frames
    assert em_la < em_norm
    y_la2, _ = run([4096], lookahead=True)
    np.testing.assert_array_equal(y_la, y_la2)     # deterministic
    # ragged pushes (partial chunks) keep the pending bookkeeping honest
    y_rag, _ = run([700, 1900, 4096, 333], lookahead=True)
    assert len(y_rag) == len(x)
    assert np.all(np.isfinite(y_rag))
    # composes with the full impulse stack
    enh = StreamingM2Enhancer(m2, label_mode="timo", chunk_frames=4,
                              noise_gain=True, noise_gain_bands=2,
                              adaptive_iters=6, escalate_reinit=True,
                              lookahead=True)
    out = [enh.push(x[lo:lo + 4096]) for lo in range(0, len(x), 4096)]
    out.append(enh.flush())
    y_full = np.concatenate(out)
    assert len(y_full) == len(x) and np.all(np.isfinite(y_full))
    with pytest.raises(ValueError, match="lookahead"):
        StreamingM2Enhancer(m2, label_mode="timo", chunk_frames=32,
                            context_frames=24, lookahead=True)
