"""Streaming (online) enhancement — a serving-mode capability beyond the
reference's offline scripts.

The Wiener-DNN baseline and the SPP mask sources are frame-causal (the
classifier is frame-wise, reference evaluate_wiener_filter.py:88-101; the
SPP recurrence is causal), so enhancement can run on a live stream:
`StreamingWienerEnhancer` consumes arbitrary-size sample chunks and emits
enhanced samples with one STFT window (64 ms) of algorithmic latency,
producing OUTPUT IDENTICAL to the offline `enhance_files_wiener` sweep
(same framing, same reflect/end padding applied causally, same masked
overlap-add normalization — verified to float tolerance in
tests/test_streaming.py).

Causality notes: the reflect lead-in of the centered STFT needs only the
FIRST nfft//2+1 samples, so it is available ~32 ms into the stream; the
reflect tail and the reference's end-pad rule need the stream end and are
applied in `flush()` (append-only against the causally-built padded
buffer). A sample is emitted once every frame overlapping it has been
processed.

TPU-native shape of the module (round 3):
- every enhancer's WHOLE chunk path is ONE fixed-shape device program
  (one compile per stream, one dispatch per chunk) with all recurrent
  state — SPP/VAD tracker carries, residual EMA, warm EM context —
  device-resident (`_m2_tick_core`, `_spp_tick_jit`);
- concurrent streams share one program per tick: the pool keeps a
  STACKED state (rows = slots) permanently on device and
  gathers/scatters lanes by slot row inside the program
  (`_m2_pool_tick`); with `mesh=` the rows shard over the data axis
  (multi-chip live streams, zero collectives);
- streams run at BOUNDED host memory indefinitely: finalized buffer
  prefixes are trimmed (drop-counter offsets, bit-identical output) and
  `keep_masks=False` disables the mask history for serving.
"""

import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from .dsp.stft import (periodic_hann, stft_params, _maybe_end_pad,
                       _end_pad_len)
from .models import classifier_apply

FS = 16000
NFFT, HOP = stft_params()


@partial(jax.jit, static_argnames=("eps",))
def _wiener_frames_jit(params, frames, mean, std, eps=1e-8):
    """(k, nfft) raw frames -> (k, nfft) enhanced windowed frames + (k, F)
    masks: window -> rfft -> normalized power -> classifier mask ->
    masked spectrum -> irfft -> window. Numerically the per-frame slice of
    the offline `_wiener_waveform_jit` program."""
    window = jnp.asarray(periodic_hann(NFFT), jnp.float32)
    fw = frames * window
    X = jnp.fft.rfft(fw, axis=-1)
    p = (jnp.real(X) ** 2 + jnp.imag(X) ** 2).astype(jnp.float32)
    if mean is not None:
        p = (p - mean[None, :]) / (std[None, :] + eps)
    m = classifier_apply(params, p)
    S = m.astype(jnp.complex64) * X
    y = jnp.fft.irfft(S, n=NFFT, axis=-1).astype(jnp.float32) * window
    return y, m.astype(jnp.float16)


class _StreamingOLA:
    """Shared machinery for chunked causal STFT-mask-ISTFT enhancement:
    causal reflect lead-in, frame batching at a fixed compile shape,
    masked overlap-add with the offline normalization, lazy emission
    (a sample leaves once every frame overlapping it is processed), and
    the reference end-pad rule at flush. Subclasses implement
    `_enhance_frame_batch(frames, k) -> (enhanced windowed frames,
    masks)` — `k` is the count of valid rows (the rest are compile-shape
    zero padding and must not advance any recurrent state).
    """

    # finalized prefixes are trimmed once they exceed this many samples
    # (amortizes the copy; ~4 s of audio)
    TRIM_CHUNK = 64 * 1024

    def __init__(self, chunk_frames=64, keep_masks=True):
        self.chunk_frames = chunk_frames
        # False = bounded-memory mode for indefinite live streams (the
        # `masks` history would otherwise grow ~8 GB/day at 16 kHz)
        self.keep_masks = keep_masks
        self._win_sq = periodic_hann(NFFT).astype(np.float32) ** 2
        self.reset()

    def reset(self):
        self._raw = np.zeros(0, np.float32)   # UN-trimmed original tail
        self._pad = None                      # padded signal (lead known)
        self._t_done = 0                      # frames processed
        self._emitted = 0                     # original samples emitted
        self._y = np.zeros(NFFT, np.float32)  # OLA accumulators (grown)
        self._w = np.zeros(NFFT, np.float32)
        self._masks = []
        self._flushed = False
        # samples discarded from the buffer fronts (indefinite streams
        # run at BOUNDED memory: finalized prefixes are trimmed and all
        # absolute coordinates offset by these counters)
        self._drop = 0       # padded coords: _pad/_y/_w fronts
        self._raw_drop = 0   # original coords: _raw front

    # -- internals --------------------------------------------------------

    # _raw and _pad live in geometrically grown backing buffers so a
    # push()/feed() appends O(chunk) instead of re-copying the whole
    # stream (a 30-min stream would otherwise pay a ~100 MB concatenate
    # per push — quadratic over the stream's life, and inside the pool
    # driver that copy ran under the shared lock).

    @property
    def _raw(self):
        return self._raw_buf[:self._n_raw]

    @_raw.setter
    def _raw(self, value):
        self._raw_buf = np.asarray(value, np.float32)
        self._n_raw = len(self._raw_buf)

    @property
    def _pad(self):
        if self._pad_buf is None:
            return None
        return self._pad_buf[:self._n_pad]

    @_pad.setter
    def _pad(self, value):
        if value is None:
            self._pad_buf = None
            self._n_pad = 0
        else:
            self._pad_buf = np.asarray(value, np.float32)
            self._n_pad = len(self._pad_buf)

    @staticmethod
    def _append(buf, n, x):
        need = n + len(x)
        if need > len(buf):
            grown = np.zeros(max(need, 2 * len(buf), 4096), np.float32)
            grown[:n] = buf[:n]
            buf = grown
        buf[n:need] = x
        return buf, need

    def _append_raw(self, x):
        self._raw_buf, self._n_raw = self._append(
            self._raw_buf, self._n_raw, x)

    def _append_pad(self, x):
        self._pad_buf, self._n_pad = self._append(
            self._pad_buf, self._n_pad, x)

    def _ensure_acc(self, n):
        if self._y.size < n:
            grow = max(n, 2 * self._y.size)
            self._y = np.concatenate(
                [self._y, np.zeros(grow - self._y.size, np.float32)])
            self._w = np.concatenate(
                [self._w, np.zeros(grow - self._w.size, np.float32)])

    def _take_frames(self, padded, t0, k):
        """Extract frames [t0, t0+k) from the padded signal, zero-padded
        to the fixed compile shape (chunk_frames, nfft). Strided-view
        gather: one copy, no per-frame python loop."""
        lo = t0 * HOP - self._drop
        windows = np.lib.stride_tricks.sliding_window_view(
            padded[lo:lo + (k - 1) * HOP + NFFT], NFFT)
        frames = np.ascontiguousarray(windows[::HOP][:k])
        if k < self.chunk_frames:  # fixed compile shape
            frames = np.pad(frames, ((0, self.chunk_frames - k), (0, 0)))
        return frames

    # NFFT == 4*HOP: frames 4 apart don't overlap, so the overlap-add
    # vectorizes as (at most) 4 phase-grouped contiguous adds
    _OLA_PHASES = NFFT // HOP if NFFT % HOP == 0 else None

    def _ola_accumulate(self, t0, y, m, k, advance=True):
        """Overlap-add k enhanced windowed frames starting at frame t0
        into the accumulators and advance the processed-frame cursor
        (advance=False: delayed-emission subclasses accumulate behind
        the cursor and manage it themselves)."""
        y = np.asarray(y)[:k]
        if self.keep_masks:
            self._masks.append(np.asarray(m)[:k])
        self._ensure_acc((t0 + k - 1) * HOP + NFFT - self._drop)
        base = t0 * HOP - self._drop
        P = self._OLA_PHASES
        if P:
            for p in range(min(P, k)):
                rows = y[p::P]                 # non-overlapping frames
                n = rows.shape[0]
                lo = base + p * HOP
                dst = self._y[lo:lo + n * NFFT].reshape(n, NFFT)
                dst += rows
                dstw = self._w[lo:lo + n * NFFT].reshape(n, NFFT)
                dstw += self._win_sq[None, :]
        else:  # non-divisor hop (not used by this framework's params)
            for i in range(k):
                lo = base + i * HOP
                self._y[lo:lo + NFFT] += y[i]
                self._w[lo:lo + NFFT] += self._win_sq
        if advance:
            self._t_done = t0 + k

    def _process_frames(self, padded, t_end):
        """Run frames [self._t_done, t_end) through the device program and
        overlap-add them into the accumulators."""
        while self._t_done < t_end:
            k = min(self.chunk_frames, t_end - self._t_done)
            t0 = self._t_done
            frames = self._take_frames(padded, t0, k)
            y, m = self._enhance_frame_batch(frames, k)
            self._ola_accumulate(t0, y, m, k)

    def _emit_upto(self, orig_end):
        """Return finalized original samples [self._emitted, orig_end)."""
        orig_end = min(orig_end, self._raw_drop + self._n_raw)
        if orig_end <= self._emitted:
            return np.zeros(0, np.float32)
        lo = self._emitted + NFFT // 2 - self._drop    # padded coords
        hi = orig_end + NFFT // 2 - self._drop
        w = self._w[lo:hi]
        y = self._y[lo:hi]
        out = np.where(w > np.finfo(np.float32).tiny, y / w, y)
        self._emitted = orig_end
        return out.astype(np.float32)

    def _maybe_trim(self):
        """Discard finalized buffer prefixes (bounded-memory streaming).
        Keeps an NFFT margin behind the emit point: flush's reflect tail
        reads the padded buffer's last NFFT//2+2 samples and the OLA
        normalizer only ever reads forward of the emit point."""
        cut = self._emitted + NFFT // 2 - self._drop - NFFT
        if cut >= self.TRIM_CHUNK:
            # shift the live tail down INSIDE the backing buffers (one
            # copy, keeps the geometric growth headroom)
            keep = self._n_pad - cut
            self._pad_buf[:keep] = self._pad_buf[cut:self._n_pad]
            self._n_pad = keep
            self._y[:self._y.size - cut] = self._y[cut:]
            self._y = self._y[:self._y.size - cut]
            self._w[:self._w.size - cut] = self._w[cut:]
            self._w = self._w[:self._w.size - cut]
            self._drop += cut
        cut_r = self._emitted - self._raw_drop - NFFT
        if cut_r >= self.TRIM_CHUNK:
            keep = self._n_raw - cut_r
            self._raw_buf[:keep] = self._raw_buf[cut_r:self._n_raw]
            self._n_raw = keep
            self._raw_drop += cut_r

    # -- public API -------------------------------------------------------

    def _ingest(self, samples):
        """Buffer new samples and extend the causally-known padded signal;
        returns the count of frames now available for processing. Raises
        if the stream was already flushed."""
        if self._flushed:
            raise RuntimeError(
                "push() after flush(): the stream was finalized with the "
                "end-pad rule; call reset() to start a new stream")
        samples = np.asarray(samples, np.float32)
        if samples.size and not np.all(np.isfinite(samples)):
            # same contract as EnhancementService.submit: a NaN/Inf chunk
            # would poison the device-resident recurrence state (SPP
            # carry, warm context) for the REST of the stream — fail the
            # bad chunk instead
            raise ValueError("non-finite samples in stream input")
        self._append_raw(samples)
        if self._pad is None:
            if self._n_raw < NFFT // 2 + 1:
                return 0
            # reflect lead-in, available causally (one-time copy)
            raw = self._raw
            self._pad = np.concatenate([raw[NFFT // 2:0:-1], raw])
        else:
            new = (self._raw_drop + self._n_raw + NFFT // 2
                   - self._drop - self._n_pad)
            if new > 0:
                self._append_pad(self._raw[-new:])
        return self._t_avail()

    def _t_avail(self):
        """Frames fully inside the causally-known padded prefix."""
        if self._pad is None:
            return 0
        total = self._drop + self._n_pad
        return max(0, (total - NFFT) // HOP + 1)

    def _flush_pad(self):
        """End-of-stream framing: apply the reference end-pad rule and
        the reflect tail by APPENDING to the causally-built padded
        buffer (the prefix is identical, so indefinite streams flush at
        bounded memory). Returns the total frame count."""
        if self._pad is None:
            # stream shorter than the reflect lead: build the padded
            # signal outright (the append-only path needs the lead)
            x = _maybe_end_pad(self._raw, FS, 64e-3, 0.25, HOP)
            n_frames = 1 + len(x) // HOP
            padded = np.pad(x, NFFT // 2, mode="reflect").astype(
                np.float32)
            need = (n_frames - 1) * HOP + NFFT
            if len(padded) < need:
                padded = np.pad(padded, (0, need - len(padded)))
            self._pad = padded
            return n_frames

        L = self._raw_drop + self._n_raw
        # reference end-pad rule on the total length (shared frozen
        # contract with the offline path)
        z = _end_pad_len(L, FS, 64e-3, 0.25, HOP)
        if z:
            self._append_pad(np.zeros(z, np.float32))
        x_ep_len = L + z
        n_frames = 1 + x_ep_len // HOP
        # reflect tail: np.pad(x_ep, nfft//2, 'reflect') right side =
        # x_ep[-2], x_ep[-3], ... — the padded buffer ends with x_ep, so
        # its own tail provides the samples (the trim margin keeps them)
        tail = self._pad[-2:-2 - NFFT // 2:-1].copy()
        self._append_pad(tail)
        need = (n_frames - 1) * HOP + NFFT
        total = self._drop + self._n_pad
        if total < need:  # hop-remainder: frames may overrun; pad
            self._append_pad(np.zeros(need - total, np.float32))
        return n_frames

    def _t_emit_bound(self):
        """First frame NOT yet overlap-added (delayed-emission subclasses
        lag this behind the processed cursor)."""
        return self._t_done

    def push(self, samples):
        """Feed a chunk; returns the newly-finalized enhanced samples."""
        t_avail = self._ingest(samples)
        if t_avail:
            self._process_frames(self._pad, t_avail)
        # a sample is final once the next un-ACCUMULATED frame starts
        # after it
        out = self._emit_upto(self._t_emit_bound() * HOP - NFFT // 2)
        self._maybe_trim()
        return out

    def flush(self):
        """Apply the reference end-pad rule + reflect tail, process the
        remaining frames and return the rest of the enhanced signal.
        The stream is finalized afterwards: push() raises until reset()."""
        self._flushed = True
        if self._raw.size == 0:   # nothing ever pushed: nothing to finalize
            return np.zeros(0, np.float32)
        n_frames = self._flush_pad()
        self._process_frames(self._pad, n_frames)
        return self._emit_upto(self._raw_drop + self._n_raw)

    @property
    def masks(self):
        """(F, frames) float16 soft masks of everything processed so far.
        Raises when the stream runs with keep_masks=False (bounded-memory
        serving mode) — an empty array would read as 'no frames'."""
        if not self.keep_masks:
            raise RuntimeError(
                "mask history disabled (keep_masks=False)")
        if not self._masks:
            return np.zeros((NFFT // 2 + 1, 0), np.float16)
        return np.concatenate(self._masks, axis=0).T


class StreamingWienerEnhancer(_StreamingOLA):
    """Chunked real-time Wiener-DNN enhancement with offline-identical
    output. Usage::

        enh = StreamingWienerEnhancer(params, mean, std)
        for chunk in stream:           # float32 samples, any size
            out.append(enh.push(chunk))
        out.append(enh.flush())        # drains the tail

    `np.concatenate(out)` equals the offline sweep's `_s_est` track for
    the same input (float tolerance; the offline path additionally
    PCM16-quantizes on device).
    """

    def __init__(self, params, mean=None, std=None, chunk_frames=64,
                 eps=1e-8, keep_masks=True):
        self.params = params
        self.mean = None if mean is None else jnp.asarray(
            np.asarray(mean, np.float32))
        self.std = None if std is None else jnp.asarray(
            np.asarray(std, np.float32))
        self.eps = eps
        super().__init__(chunk_frames, keep_masks)

    def _enhance_frame_batch(self, frames, k):
        return _wiener_frames_jit(self.params, jnp.asarray(frames),
                                  self.mean, self.std, eps=self.eps)


@jax.jit
def _spp_tick_jit(frames, k, state):
    """Model-free chunk path as one program: analysis -> causal SPP scan
    (state carried on device, pad rows gated) -> masked synthesis."""
    from .mcem.spp import spp_track_chunk

    window = jnp.asarray(periodic_hann(NFFT), jnp.float32)
    X = jnp.fft.rfft(frames * window, axis=-1)
    re = jnp.real(X).astype(jnp.float32)
    im = jnp.imag(X).astype(jnp.float32)
    power = re**2 + im**2
    _, spp, state = spp_track_chunk(power.T, state, n_valid=k)
    valid = (jnp.arange(frames.shape[0]) < k)[:, None]
    m = jnp.where(valid, spp.T, 0.0)       # pad rows stay masked out
    S = m.astype(jnp.complex64) * (re + 1j * im)
    y = jnp.fft.irfft(S, n=NFFT, axis=-1).astype(jnp.float32) * window
    return y, m, state


class StreamingSPPEnhancer(_StreamingOLA):
    """Model-free streaming enhancement: the soft mask is the per-frame
    speech presence probability of the causal Gerkmann SPP tracker (the
    reference's "timo" source, mcem/spp.py) — no trained network, no
    oracle. The SPP recurrence state persists across chunks ON DEVICE
    (the whole chunk is one program, `_spp_tick_jit`), so the mask track
    equals `timo_mask_estimation` of the whole spectrogram."""

    def __init__(self, chunk_frames=64, keep_masks=True):
        super().__init__(chunk_frames, keep_masks)

    def reset(self):
        super().reset()
        from .mcem.spp import spp_state_init

        self._spp_state = spp_state_init(NFFT // 2 + 1)

    def _enhance_frame_batch(self, frames, k):
        y, m, self._spp_state = _spp_tick_jit(
            jnp.asarray(frames), k, self._spp_state)
        return y, np.asarray(m).astype(np.float16)


# ---------------------------------------------------------------------------
# Streaming flagship: online M2 enhancement (blockwise warm-started PEEM)
# ---------------------------------------------------------------------------

def _m2_block_em(dec_params, Xw, y_pre, Vb, Z0, g0, b0, mask,
                 iters=6, e_steps=4, lr=5e-3, noise_gain=False,
                 n_bands=1, adaptive_iters=0, adaptive_thresh=0.05,
                 escalate_reinit=False):
    """Blockwise point-estimate EM over one (F, W) analysis window with a
    fixed (SPP-tracked) noise variance: `e_steps` gradient-ascent steps on
    the latent MAP objective per EM iteration (mcem/peem.py), then the
    per-frame gain update (the *_noNMF M-step, reference mcem.py:543-578).
    Warm-started from the previous block's (Z, g) on the context frames.
    Returns (Z, g, b, WFs) over the whole window.

    noise_gain: also learn the noise gain b (MCEMConfig.noise_gain's
    causal analogue) — impulsive frames inside the window raise their
    own noise variance within the block, no cross-block delay. b0 is
    the warm-started gain: (W,) per-frame, or (n_bands, W) per-band
    when n_bands > 1 (the offline 2-3 band sweet spot applies causally
    too).

    adaptive_iters (requires noise_gain): after the fixed `iters`
    budget, run up to this many EXTRA EM iterations while the noise
    gain is still moving (max |Δlog b| per iteration > adaptive_thresh)
    — an impulse landing in the block escalates its own iteration
    budget, quiet blocks pay nothing. Latency is unchanged (same tick);
    only per-block compute is data-dependent (lax.while_loop; under
    vmap in the pooled engine lanes mask independently).

    escalate_reinit (round 5, requires adaptive_iters): when a block
    escalates, RE-INIT the gain at the window's measured power ratio
    max(1, sum_band X / sum_band Vb) before the extra iterations — the
    blanket 'ratio' init's impulse jump-start WITHOUT its cost on
    speech-dominated quiet blocks (those never escalate, so they never
    get the aggressive init; the round-4 gap analysis's untried lever).
    """
    from .mcem.engine import (
        VX_FLOOR, _decode_cond, nmf_m_step, noise_gain_state,
    )

    L = Z0.shape[0]
    # b0 discarded: the streaming gain is warm state carried across blocks
    _, eff_vb, band_map = noise_gain_state(
        Xw.shape[0], Xw.shape[1], n_bands, Vb, Xw.dtype)

    def obj(Z, g, b):
        Vs = _decode_cond(dec_params, y_pre, Z)
        Vx = jnp.maximum(g * Vs + eff_vb(b), VX_FLOOR)
        return (jnp.sum((jnp.log(Vx) + Xw / Vx) * mask)
                + 0.5 * jnp.sum(Z * Z * mask))

    grad = jax.grad(obj)
    W1 = jnp.ones((Xw.shape[0], 1), Xw.dtype)
    H0 = jnp.zeros((1, Xw.shape[1]), Xw.dtype)

    def logb(v):
        return jnp.log(jnp.maximum(v, 1e-12))

    def em(carry, _):
        Z, g, b = carry

        def e_step(Z, _):
            return Z - lr * grad(Z, g, b), None

        Z, _ = jax.lax.scan(e_step, Z, None, length=e_steps)
        Vs = _decode_cond(dec_params, y_pre, Z)[None]
        if noise_gain:
            _, _, g, b2 = nmf_m_step(Xw, mask, W1, H0, g, Vs,
                                     update_nmf=False, Vb_fixed=Vb, b=b,
                                     band_map=band_map)
            d = jnp.max(jnp.abs(logb(b2) - logb(b)))
            b = b2
        else:
            _, _, g = nmf_m_step(Xw, mask, W1, H0, g, Vs,
                                 update_nmf=False, Vb_fixed=Vb)
            d = jnp.zeros((), Xw.dtype)
        return (Z, g, b), d

    (Z, g, b), ds = jax.lax.scan(em, (Z0, g0, b0), None, length=iters)

    if adaptive_iters and noise_gain:
        if escalate_reinit:
            # escalated blocks restart their gain at the measured window
            # ratio so the extra iterations refine a right-magnitude
            # init instead of multiplicatively crawling up from ~1
            if band_map is None:
                ratio = Xw.sum(0) / jnp.maximum(Vb.sum(0), 1e-12)
            else:
                ratio = ((band_map @ Xw)
                         / jnp.maximum(band_map @ Vb, 1e-12))
            engaged = ds[-1] > adaptive_thresh
            b = jnp.where(engaged, jnp.maximum(ratio, 1.0), b)

        def cond(carry):
            _, _, _, i, d = carry
            return (i < adaptive_iters) & (d > adaptive_thresh)

        def body(carry):
            Z, g, b, i, _ = carry
            (Z, g, b), d = em((Z, g, b), None)
            return Z, g, b, i + 1, d

        # the base budget's final Δlog b decides whether the escalation
        # loop engages: quiet blocks pay zero extra iterations
        Z, g, b, _, _ = jax.lax.while_loop(
            cond, body, (Z, g, b, jnp.int32(0), ds[-1]))

    Vs = _decode_cond(dec_params, y_pre, Z)
    Vx = jnp.maximum(g * Vs + eff_vb(b), VX_FLOOR)
    return Z, g, b, (g * Vs) / Vx


_TICK_STATICS = ("label_mode", "soft_guidance", "residual_tracking",
                 "residual_alpha", "noise_gain", "noise_gain_init",
                 "n_bands", "block_iters", "e_steps", "lr", "eps",
                 "adaptive_iters", "escalate_reinit", "lookahead",
                 "features", "dnn_threshold")


def _m2_tick_core(enc, dec, cls, mean, std, band_map, frames, k, state,
                  label_mode="dnn", soft_guidance=False,
                  residual_tracking=False, residual_alpha=0.5,
                  noise_gain=False, noise_gain_init="ones", n_bands=1,
                  block_iters=6, e_steps=4, lr=5e-3, eps=1e-8,
                  adaptive_iters=0, escalate_reinit=False, lookahead=False,
                  features="power", dnn_threshold=0.5):
    """The WHOLE M2 streaming chunk path as one traced program: analysis,
    causal SPP noise track, guidance labels, encoder warm init, window
    assembly, blockwise EM, residual tracking, context rebuild and masked
    synthesis — every recurrence state device-resident in `state`, so one
    chunk costs ONE dispatch (previously ~6 plus host loops; pooled
    streams vmap this whole function inside `_m2_pool_tick`).

    `state` pytree: spp/vad tracker carries, (res, res_valid) EMA,
    ctx_{X,y,Vb,Z} (·, C) warm windows, ctx_g/ctx_b gains, n_ctx valid
    count (context validity is right-aligned contiguous by construction).
    `k` (traced) = valid rows of this chunk; pad rows emit benign outputs
    and never advance any carry."""
    from .mcem.engine import _precompute_label_proj
    from .mcem.spp import spp_track_chunk
    from .models.nets import encoder_apply

    K = frames.shape[0]
    C = state["ctx_X"].shape[1]
    L = state["ctx_Z"].shape[0]
    window = jnp.asarray(periodic_hann(NFFT), jnp.float32)
    X = jnp.fft.rfft(frames * window, axis=-1)
    re = jnp.real(X).astype(jnp.float32)
    im = jnp.imag(X).astype(jnp.float32)
    power = re**2 + im**2                       # (K, F)
    rows = jnp.arange(K)
    valid_row = (rows < k)[:, None]             # (K, 1)

    # causal SPP noise track; benign pad rows (Vb=1, spp=0) as before
    psd_T, spp_T, spp_state = spp_track_chunk(
        power.T, state["spp"], n_valid=k)
    Vb_new = jnp.where(valid_row, psd_T.T, 1.0)
    spp = jnp.where(valid_row, spp_T.T, 0.0)
    res, res_valid = state["res"]
    if residual_tracking:
        # noise floor from the enhanced residual of PAST blocks
        Vb_new = jnp.where(valid_row & (res_valid > 0),
                           jnp.maximum(Vb_new, res[None, :]), Vb_new)

    # guidance labels (hard IBM by default, probabilities when soft)
    vad_state = state["vad"]
    if label_mode == "timo":
        if state["ctx_y"].shape[0] == 1:
            # frame VAD = SPP of summed power (spp.timo_vad_estimation)
            _, vspp, vad_state = spp_track_chunk(
                power.sum(axis=1)[None, :], vad_state, n_valid=k)
            y_soft = jnp.where(valid_row, vspp.T, 0.0)   # (K, 1)
        else:
            y_soft = spp
    else:
        from .models import classifier_features

        p = classifier_features(power, features)
        if mean is not None:
            p = (p - mean[None, :]) / (std[None, :] + eps)
        y_soft = classifier_apply(cls, p)
    thr = dnn_threshold if label_mode == "dnn" else 0.5
    y_new = (y_soft if soft_guidance
             else (y_soft > thr)).astype(jnp.float32)

    # encoder posterior mean for the new frames (reference mcem.py:214)
    _, mu, _ = encoder_apply(enc, jnp.concatenate([power, y_new], axis=1))
    Z_new = mu.T                                # (L, K)

    # fixed-shape window [C | chunk]
    Xw = jnp.concatenate([state["ctx_X"], power.T], axis=1)
    yw = jnp.concatenate([state["ctx_y"], y_new.T], axis=1)
    Vbw = jnp.concatenate([state["ctx_Vb"], Vb_new.T], axis=1)
    Zw = jnp.concatenate([state["ctx_Z"], Z_new], axis=1)
    gw = jnp.concatenate([state["ctx_g"], jnp.ones((K,), jnp.float32)])
    if n_bands == 1:
        b_new = jnp.ones((K,), jnp.float32)
        if noise_gain and noise_gain_init == "ratio":
            ratio = power.sum(axis=1) / jnp.maximum(
                Vb_new.sum(axis=1), 1e-12)
            b_new = jnp.maximum(ratio, 1.0)
        bw = jnp.concatenate([state["ctx_b"], b_new])
    else:
        b_new = jnp.ones((n_bands, K), jnp.float32)
        if noise_gain and noise_gain_init == "ratio":
            num = band_map @ power.T            # per-band ratio (nb, K)
            den = jnp.maximum(band_map @ Vb_new.T, 1e-12)
            b_new = jnp.maximum(num / den, 1.0)
        bw = jnp.concatenate([state["ctx_b"], b_new], axis=1)
    n_ctx = state["n_ctx"]
    maskw = jnp.concatenate([
        (jnp.arange(C) >= C - n_ctx).astype(jnp.float32),
        (rows < k).astype(jnp.float32)])
    Xw = jnp.maximum(Xw, 1e-12)                 # benign pad values
    Vbw = jnp.maximum(Vbw, 1e-10)

    y_pre = _precompute_label_proj(dec, yw, L)
    Z, g, bfr, WFs = _m2_block_em(
        dec, Xw, y_pre, Vbw, Zw, gw, bw, maskw, iters=block_iters,
        e_steps=e_steps, lr=lr, noise_gain=noise_gain, n_bands=n_bands,
        adaptive_iters=adaptive_iters, escalate_reinit=escalate_reinit)
    m = WFs[:, C:].T                            # (K, F) gains, new frames

    if residual_tracking:
        # same IIR recurrence as pipeline._ema_time, causal over the
        # valid rows
        a = residual_alpha

        def rstep(carry, inp):
            r_st, r_ok = carry
            m_i, p_i, v_i = inp
            r = (1.0 - m_i) ** 2 * p_i
            blended = jnp.where(r_ok > 0, a * r_st + (1.0 - a) * r, r)
            r_st = jnp.where(v_i > 0, blended, r_st)
            r_ok = jnp.where(v_i > 0, 1.0, r_ok)
            return (r_st, r_ok), None

        (res, res_valid), _ = jax.lax.scan(
            rstep, (res, res_valid),
            (m, power, (rows < k).astype(jnp.float32)))

    # context rebuild: right-align the last (up to C) VALID frames. The
    # valid region of the window is contiguous [C - n_ctx, C + k), so
    # "last C valid" is always window columns [k, C + k) with the first
    # C - v columns (v = new valid count) overwritten by the benign fill.
    v = jnp.minimum(n_ctx + k, C)
    col = jnp.arange(C)
    lead = (col < C - v)

    def rebuild(buf, fill):
        sl = jax.lax.dynamic_slice_in_dim(buf, k, C, axis=buf.ndim - 1)
        return jnp.where(lead if buf.ndim == 1 else lead[None, :],
                         fill, sl)

    new_state = dict(
        spp=spp_state, vad=vad_state, res=(res, res_valid),
        ctx_X=rebuild(Xw, 0.0), ctx_y=rebuild(yw, 0.0),
        ctx_Vb=rebuild(Vbw, 1.0), ctx_Z=rebuild(Z, 0.0),
        ctx_g=rebuild(g, 1.0), ctx_b=rebuild(bfr, 1.0),
        n_ctx=v,
    )
    S = m.astype(jnp.complex64) * (re + 1j * im)
    y = jnp.fft.irfft(S, n=NFFT, axis=-1).astype(jnp.float32) * window
    if lookahead:
        # one-block-lookahead mode: the HOST emits each chunk one tick
        # late, synthesized from the WHOLE window's refined mask (the
        # previous chunk sits right-aligned in the context and has just
        # been re-optimized with this chunk visible); hand it the full
        # (C+K, F) mask instead of the current chunk's slice
        return y, WFs.T, new_state
    return y, m, new_state


_m2_tick_jit = partial(jax.jit, static_argnames=_TICK_STATICS)(
    _m2_tick_core)


@partial(jax.jit, static_argnames=_TICK_STATICS)
def _m2_pool_tick(enc, dec, cls, mean, std, band_map, frames, ks,
                  slot_ids, pool_state, **cfg):
    """One device program for a pool tick: gather each lane's recurrence
    state out of the RESIDENT stacked pool state (leading dim =
    max_streams — it never leaves the device between ticks), run the
    whole chunk path vmapped over lanes, scatter the updated states back.
    Pad lanes replay a live lane's slot: their scatter writes the exact
    same values that lane wrote, so duplicate indices are benign.

    Lanes are fully independent, so a stream's result does not depend on
    what shares its batch (equality vs the single-stream program is
    pinned to float tolerance in tests/test_streaming.py — XLA may tile
    the batched programs differently, so bitwise equality is not
    guaranteed)."""
    states = jax.tree_util.tree_map(lambda a: a[slot_ids], pool_state)

    def one(f, k1, st):
        return _m2_tick_core(enc, dec, cls, mean, std, band_map,
                             f, k1, st, **cfg)

    y, m, new_states = jax.vmap(one)(frames, ks, states)
    pool_state = jax.tree_util.tree_map(
        lambda a, u: a.at[slot_ids].set(u), pool_state, new_states)
    return y, m, pool_state


def _make_pool_tick_sharded(mesh, enc, dec, cls, mean, std, band_map,
                            cfg, axis="data"):
    """Build the multi-chip pool tick: a FULL-LANE tick (every slot row
    every tick) shard_mapped over the mesh's data axis — rows and the
    resident stacked state stay sharded across chips, each device runs
    its local rows with ZERO collectives (lanes are independent). Idle
    rows run with k=0 on zero frames: the gated SPP scan and a
    keep-select on the state leave them untouched; their outputs are
    discarded. Model params are closed over (replicated). Returns a
    jitted (frames, ks, pool_state) -> (y, m, pool_state) function;
    build once per pool (the trace is cached on the instance)."""
    from jax.sharding import PartitionSpec as P

    def local(frames_l, ks_l, state_l):
        def one(f, k1, st):
            return _m2_tick_core(enc, dec, cls, mean, std, band_map,
                                 f, k1, st, **cfg)

        y, m, new = jax.vmap(one)(frames_l, ks_l, state_l)
        keep = ks_l > 0

        def sel(n, o):
            return jnp.where(
                keep.reshape((-1,) + (1,) * (n.ndim - 1)), n, o)

        new = jax.tree_util.tree_map(sel, new, state_l)
        return y, m, new

    spec = P(axis)
    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=(spec, spec, spec))
    return jax.jit(fn)


class StreamingM2Enhancer(_StreamingOLA):
    """Online flagship: M2 guided-VAE enhancement on a live stream.

    Blockwise EM (beyond-reference capability, VERDICT round-2 item 7):
    every `chunk_frames` new frames are enhanced by a fixed-shape window
    [context | chunk] where the context carries the warm (Z, g) state of
    the previous blocks, the noise variance is the causal Gerkmann SPP
    tracker's PSD (the real-noise flagship configuration,
    `noise_model='spp'`), labels come from the frame-wise classifier
    (`label_mode='dnn'`) or the SPP mask (`'timo'`), and the E-step is
    PEEM's gradient ascent (deterministic, so the stream needs no RNG).
    Latency = chunk_frames x 16 ms + the 64 ms STFT window; one compiled
    program per stream.
    """

    def __init__(self, dgm_params, classifier_params=None, mean=None,
                 std=None, chunk_frames=8, context_frames=24,
                 block_iters=6, e_steps=4, lr=5e-3, label_mode="dnn",
                 soft_guidance=False, residual_tracking=False,
                 residual_alpha=0.5, noise_gain=False,
                 noise_gain_init="ones", noise_gain_bands=1, eps=1e-8,
                 keep_masks=True, adaptive_iters=0, escalate_reinit=False,
                 lookahead=False, features="power", dnn_threshold=0.5):
        if label_mode == "dnn" and classifier_params is None:
            raise ValueError("label_mode='dnn' needs classifier_params")
        # classifier inference protocol (classifier_meta.json side-car):
        # input transform before standardization + hard-decision threshold
        self.features = features
        self.dnn_threshold = dnn_threshold
        # guidance dimension from the model (513 for IBM-guided M2, 1 for
        # the VAD-guided family), NOT from label_mode
        self.y_dim = int(dgm_params.get("y_dim", NFFT // 2 + 1))
        self.dgm = {k: v for k, v in dgm_params.items() if k != "y_dim"}
        self.enc = self.dgm["encoder"]
        self.dec = self.dgm["decoder"]
        self.cls = classifier_params
        self.mean = None if mean is None else jnp.asarray(
            np.asarray(mean, np.float32))
        self.std = None if std is None else jnp.asarray(
            np.asarray(std, np.float32))
        self.label_mode = label_mode
        # condition on classifier probabilities instead of the >0.5 IBM
        # (same opt-in as the offline pipeline's soft_guidance)
        self.soft_guidance = soft_guidance
        # causal analogue of the offline 'spp2' two-pass noise model:
        # the enhanced residual power (1-WFs)^2 |X|^2 of PAST blocks,
        # EMA-smoothed with the same alpha as pipeline._ema_time, floors
        # the next block's noise variance (one-block delay replaces the
        # offline second pass; same max(spp, ema(residual)) rule)
        self.residual_tracking = residual_tracking
        self.residual_alpha = residual_alpha
        # learn a per-frame noise gain inside each block (the causal
        # analogue of MCEMConfig.noise_gain — impulsive frames raise
        # their own noise variance with NO cross-block delay, vs
        # residual_tracking's one-block-delayed floor)
        self.noise_gain = noise_gain
        # 'ones' starts new frames at b=1 (the offline init); 'ratio'
        # jump-starts them at the frame's broadband power ratio
        # max(1, sum_f X / sum_f Vb) — impulses need b ~ 100x, which the
        # multiplicative sqrt-steps reach slowly from 1 within one
        # block's iteration budget. Measured trade on QUT (chunk=4,
        # gain+soft+residual): 'ratio' lifts the impulsive kitchen
        # +0.45 -> +2.69 dB (above even the offline +2.60) and café
        # −3.94 -> −3.70 at a car cost +10.43 -> +9.77 and ~0.035 ESTOI
        # (speech-dominated frames also jump high and the in-block EM
        # cannot fully pull them back; more iterations do NOT recover
        # it — the two inits converge to different operating points).
        if noise_gain_init not in ("ones", "ratio"):
            raise ValueError("noise_gain_init must be 'ones' or 'ratio'")
        if not noise_gain:
            # both knobs are dead without the gain; a silent no-op would
            # let a user believe they measured the ratio-init / banded
            # operating point (and bands>1 pays an identity matmul)
            if noise_gain_init != "ones":
                raise ValueError(
                    "noise_gain_init='ratio' requires noise_gain=True")
            if noise_gain_bands != 1:
                raise ValueError(
                    "noise_gain_bands > 1 requires noise_gain=True")
            if adaptive_iters:
                raise ValueError(
                    "adaptive_iters requires noise_gain=True (the "
                    "escalation trigger is the gain's movement)")
        if escalate_reinit and not adaptive_iters:
            raise ValueError(
                "escalate_reinit requires adaptive_iters > 0 (it re-inits "
                "the gain of blocks the adaptive budget escalates)")
        # adaptive in-block budget: up to this many EXTRA EM iterations
        # while the noise gain still moves > 5%/iter (impulse blocks
        # escalate themselves; quiet blocks pay nothing; latency
        # unchanged)
        self.adaptive_iters = adaptive_iters
        # round-5 impulse lever: escalated blocks re-init their gain at
        # the window power ratio before the extra iterations (the
        # 'ratio' jump-start scoped to blocks that need it)
        self.escalate_reinit = escalate_reinit
        # one-block lookahead (round 5): emit each chunk one tick LATE,
        # after the block EM has refined it with the next chunk visible
        # in the window — latency rises by exactly chunk_frames x 16 ms
        # (128 -> 192 ms at chunk=4) for an offline-style future view of
        # impulses crossing block boundaries
        if lookahead and chunk_frames > context_frames:
            raise ValueError(
                "lookahead needs chunk_frames <= context_frames (the "
                "emitted chunk must still sit inside the EM window)")
        self.lookahead = lookahead
        self.noise_gain_init = noise_gain_init
        # spectral resolution of the gain (offline sweet spot: 2-3 bands
        # for impulsive noise, MCEMConfig.noise_gain_bands)
        self.noise_gain_bands = noise_gain_bands
        self._band_map = None
        if noise_gain_bands > 1:
            from .mcem.engine import _noise_gain_band_map

            # kept as a device array: the fused tick consumes it every
            # chunk, so no per-tick host->device upload
            self._band_map = jnp.asarray(
                _noise_gain_band_map(NFFT // 2 + 1, noise_gain_bands))
        self.C = context_frames
        self.block_iters = block_iters
        self.e_steps = e_steps
        self.lr = lr
        self.eps = eps
        # latent dim from the encoder's gaussian head (needed to build
        # the device-resident context state eagerly)
        self._L = int(np.asarray(self.enc["mu"]["w"]).shape[1])
        super().__init__(chunk_frames, keep_masks)

    def reset(self):
        super().reset()
        # lookahead emission lag: (t0, k) of the processed-but-unemitted
        # chunk (None until the first tick)
        self._la_pending = None
        if hasattr(self, "C"):     # base reset() fires before full init
            from .mcem.spp import spp_state_init

            # EVERY recurrence state of the stream lives on device as one
            # pytree consumed/produced by the fused tick program
            # (_m2_tick_core): tracker carries, residual EMA, warm
            # context windows, context validity count.
            F = NFFT // 2 + 1
            C, nb = self.C, self.noise_gain_bands

            def z(*s):
                return jnp.zeros(s, jnp.float32)

            def o(*s):
                return jnp.ones(s, jnp.float32)

            self._dstate = dict(
                spp=spp_state_init(F),
                vad=spp_state_init(1),
                res=(z(F), jnp.asarray(0.0, jnp.float32)),
                ctx_X=z(F, C), ctx_y=z(self.y_dim, C), ctx_Vb=o(F, C),
                ctx_Z=z(self._L, C), ctx_g=o(C),
                ctx_b=(o(C) if nb == 1 else o(nb, C)),
                n_ctx=jnp.asarray(0, jnp.int32),
            )

    def _current_state(self):
        """The stream's live recurrence state: its own `_dstate`, or —
        when the stream is a pool slot — its row of the pool's resident
        stacked state (ticks update only that row, never `_dstate`)."""
        pool = getattr(self, "_pool", None)
        if pool is not None and pool._pool_state is not None:
            return jax.tree_util.tree_map(
                lambda a: a[self._pool_row], pool._pool_state)
        return self._dstate

    # state views for tests/introspection (context validity is
    # right-aligned contiguous; n_ctx is the carried count)
    @property
    def _ctx_valid(self):
        C, v = self.C, int(self._current_state()["n_ctx"])
        out = np.zeros((C,), np.float32)
        if v:
            out[C - v:] = 1.0
        return out

    @property
    def _ctx_b(self):
        return np.asarray(self._current_state()["ctx_b"])

    @property
    def _res(self):
        """Residual-tracking EMA state: None until warmed (host-API
        compatibility view of the device carry)."""
        res, ok = self._current_state()["res"]
        return np.asarray(res) if float(ok) > 0 else None

    def _tick_cfg(self):
        """Static (compile-time) config of the fused tick program."""
        return dict(label_mode=self.label_mode,
                    soft_guidance=self.soft_guidance,
                    residual_tracking=self.residual_tracking,
                    residual_alpha=self.residual_alpha,
                    noise_gain=self.noise_gain,
                    noise_gain_init=self.noise_gain_init,
                    n_bands=self.noise_gain_bands,
                    block_iters=self.block_iters, e_steps=self.e_steps,
                    lr=self.lr, eps=self.eps,
                    adaptive_iters=self.adaptive_iters,
                    escalate_reinit=self.escalate_reinit,
                    lookahead=self.lookahead,
                    features=self.features,
                    dnn_threshold=self.dnn_threshold)

    def _enhance_frame_batch(self, frames, k):
        y, m, self._dstate = _m2_tick_jit(
            self.enc, self.dec, self.cls, self.mean, self.std,
            self._band_map, jnp.asarray(frames), k, self._dstate,
            **self._tick_cfg())
        return y, np.asarray(m).astype(np.float16)

    # -- one-block lookahead (round 5): delayed emission ------------------

    def _t_emit_bound(self):
        if self.lookahead and self._la_pending is not None:
            return self._la_pending[0]
        return super()._t_emit_bound()

    def _tick_full(self, frames, k):
        """Run the tick and return the full-window refined mask at float32
        (the lookahead synthesis consumes it; the float16 cast is only for
        the mask HISTORY)."""
        _, m, self._dstate = _m2_tick_jit(
            self.enc, self.dec, self.cls, self.mean, self.std,
            self._band_map, jnp.asarray(frames), k, self._dstate,
            **self._tick_cfg())
        return np.asarray(m, np.float32)

    def _synth_rows(self, padded, t0, k, m):
        """Host synthesis of k frames [t0, t0+k) under mask m (k, F) —
        the lookahead path's emission runs one tick behind the device, so
        the (tiny: chunk x nfft) synthesis happens here from the padded
        buffer the host already holds."""
        window = periodic_hann(NFFT).astype(np.float32)
        fr = self._take_frames(padded, t0, k)[:k]
        X = np.fft.rfft(fr * window[None, :], axis=-1)
        y = np.fft.irfft(np.asarray(m, np.float64) * X, n=NFFT, axis=-1)
        return (y * window[None, :]).astype(np.float32)

    def _accumulate_pending(self, padded, m_full):
        tp, kp = self._la_pending
        # the pending chunk sits right-aligned at the context end:
        # window columns [C - kp, C)
        m_prev = np.asarray(m_full, np.float32)[self.C - kp:self.C]
        y_prev = self._synth_rows(padded, tp, kp, m_prev)
        self._ola_accumulate(tp, y_prev, m_prev.astype(np.float16), kp,
                             advance=False)

    def _process_frames(self, padded, t_end):
        if not self.lookahead:
            return super()._process_frames(padded, t_end)
        while self._t_done < t_end:
            k = min(self.chunk_frames, t_end - self._t_done)
            t0 = self._t_done
            frames = self._take_frames(padded, t0, k)
            m_full = self._tick_full(frames, k)
            if self._la_pending is not None:
                self._accumulate_pending(padded, m_full)
            self._la_pending = (t0, k)
            self._t_done = t0 + k

    def flush(self):
        if not self.lookahead:
            return super().flush()
        self._flushed = True
        if self._raw.size == 0:
            return np.zeros(0, np.float32)
        n_frames = self._flush_pad()
        self._process_frames(self._pad, n_frames)
        if self._la_pending is not None:
            # drain tick: zero new frames (k=0) — recurrence state is
            # gated, but the block EM runs once more over the window and
            # refines the final pending chunk before it is emitted
            m_full = self._tick_full(
                np.zeros((self.chunk_frames, NFFT), np.float32), 0)
            self._accumulate_pending(self._pad, m_full)
            self._la_pending = None
        return self._emit_upto(self._raw_drop + self._n_raw)


# ---------------------------------------------------------------------------
# Multi-stream pool: batched concurrent streaming
# ---------------------------------------------------------------------------

class MultiStreamM2Enhancer:
    """Serve up to `max_streams` concurrent live M2 streams with ONE
    batched (vmapped) block-EM device program per tick instead of one
    dispatch per stream — the TPU-idiomatic way to scale concurrent
    real-time calls per chip: a single stream's (F, W) decoder matmuls
    underutilize the MXU, and B lanes batch them into a (B·W)-frame
    workload at one dispatch (beyond-reference serving capability; the
    reference's only parallelism is one process per GPU,
    evaluate_M1.py:186-222).

    Server loop pattern (each tick of a real-time scheduler)::

        pool = MultiStreamM2Enhancer(dgm, classifier_params=cls,
                                     max_streams=8)
        a, b = pool.open(), pool.open()
        pool.feed(a, chunk_a)           # buffer only, no device work
        pool.feed(b, chunk_b)
        outs = pool.step()              # ONE device program per tick:
                                        # {sid: new enhanced samples}
        tail_a = pool.flush(a)          # end-pad rule + batched drain
        pool.close(a)                   # slot is recycled for open()

    Every stream's output matches a dedicated `StreamingM2Enhancer` fed
    the same samples to float tolerance (lanes are independent; XLA may
    tile the batched analysis/classifier/encoder/EM programs differently
    at different lane counts, so bitwise equality is not guaranteed —
    pinned in tests/test_streaming.py). One edge of that caveat: with
    hard guidance (`soft_guidance=False`) a classifier probability or
    SPP value lying within ~1 ulp of the 0.5 threshold could flip a
    binary label between the pooled and dedicated programs, amplifying
    the ulp into a visible (still quality-neutral) output difference;
    `soft_guidance=True` conditions on the probabilities themselves and
    has no such discontinuity. The per-tick
    program has a FIXED lane count (`max_streams`): partially occupied
    ticks pad with copies of a live lane to the next power-of-two lane
    bucket (capped at `max_streams`), so the pool compiles at most
    log2(max_streams)+1 block-EM programs and a lightly occupied pool
    pays at most 2x its live lanes in padded compute.
    """

    def __init__(self, dgm_params, classifier_params=None, mean=None,
                 std=None, max_streams=8, mesh=None, **enhancer_kwargs):
        if max_streams < 1:
            raise ValueError("max_streams must be >= 1")
        self.mesh = mesh
        if mesh is not None:
            n_dev = mesh.shape.get("data", 1)
            if max_streams % n_dev != 0:
                raise ValueError(
                    f"max_streams ({max_streams}) must be a multiple of "
                    f"the mesh data axis ({n_dev})")
        self._sharded_tick = None   # built lazily (mesh mode)
        self.max_streams = max_streams
        # mirrored from StreamingM2Enhancer's default for API clients
        # (e.g. the HTTP X-Chunk-Frames header) without opening a slot
        self.chunk_frames = enhancer_kwargs.get("chunk_frames", 8)
        self._kw = dict(dgm_params=dgm_params,
                        classifier_params=classifier_params,
                        mean=mean, std=std, **enhancer_kwargs)
        self._slots = {}        # sid -> StreamingM2Enhancer
        self._free = []         # closed enhancers, recycled by open()
        self._next_sid = 0
        self._buffered = {}     # sid -> [arrays] emitted by ticks that
        #                         ran inside another stream's flush()
        self._t_target = {}     # sid -> total frame count after flush()
        # stacked recurrence states, one row per slot, RESIDENT on
        # device across ticks (built from the first slot's fresh state);
        # rows are (re)initialized by open() and gathered/scattered
        # inside the single tick program
        self._pool_state = None
        self._n_created = 0     # rows handed out (<= max_streams)

    # -- slot management ----------------------------------------------------

    def _slot(self, sid):
        try:
            return self._slots[sid]
        except KeyError:
            raise KeyError(f"unknown or closed stream id {sid}") from None

    def open(self):
        """Admit a new stream; returns its id. Raises when the pool is at
        `max_streams` (callers back-pressure, e.g. HTTP 429)."""
        if len(self._slots) >= self.max_streams:
            raise RuntimeError(
                f"stream pool full ({self.max_streams} live streams)")
        if self._free:
            enh = self._free.pop()
            enh.reset()
        else:
            enh = StreamingM2Enhancer(**self._kw)
            enh._pool_row = self._n_created
            enh._pool = self    # state views read the resident row
            self._n_created += 1
        if self._pool_state is None:
            # all rows start fresh (identical to enh's just-reset state)
            self._pool_state = jax.tree_util.tree_map(
                lambda a: jnp.stack([a] * self.max_streams),
                enh._dstate)
        else:
            # recycle: reset this slot's resident row to the fresh state
            row = enh._pool_row
            self._pool_state = jax.tree_util.tree_map(
                lambda a, f: a.at[row].set(f),
                self._pool_state, enh._dstate)
        sid = self._next_sid
        self._next_sid += 1
        self._slots[sid] = enh
        self._buffered[sid] = []
        return sid

    def close(self, sid):
        """Release a stream's slot (its enhancer is recycled). Un-flushed
        streams are simply dropped."""
        enh = self._slot(sid)
        del self._slots[sid]
        self._buffered.pop(sid, None)
        self._t_target.pop(sid, None)
        self._free.append(enh)

    def masks(self, sid):
        """(F, frames) float16 soft masks of the stream so far."""
        return self._slot(sid).masks

    # -- streaming ------------------------------------------------------------

    def feed(self, sid, samples):
        """Buffer samples for a stream. No device work happens here —
        call `step()` to process every stream's ready chunks together."""
        self._slot(sid)._ingest(samples)

    def _ready(self):
        """Slots with at least one unprocessed frame available."""
        ready = []
        for sid, s in self._slots.items():
            t_end = self._t_target.get(sid)
            if t_end is None:
                t_end = s._t_avail()
            if t_end > s._t_done:
                ready.append((sid, s, t_end))
        return ready

    def _tick(self, ready):
        """One batched tick: each ready slot contributes one chunk, and
        the WHOLE chunk path — analysis, causal SPP tracks, guidance
        labels, encoder warm init, window assembly, block EM, residual
        tracking, context rebuild, synthesis — runs as ONE device
        program for all streams (`_m2_pool_tick`), with every slot's
        recurrence state RESIDENT on device in the stacked pool state
        (gathered/scattered by slot row inside the program). Host work
        per tick is frame extraction and overlap-add only: one dispatch
        per tick at any occupancy.

        The lane count is bucketed to the next power of two (capped at
        max_streams): a lightly occupied pool pays at most 2x its live
        lanes in padded compute at a bounded compile count
        (log2(max_streams)+1 programs per distinct chunk path). Pad
        lanes replay lane 0 (same frames, same slot row); their scatter
        rewrites lane 0's row with identical values."""
        lanes = [(s, s._t_done, min(s.chunk_frames, t_end - s._t_done))
                 for sid, s, t_end in ready]
        s0 = lanes[0][0]
        if self.mesh is not None:
            return self._tick_sharded(lanes, s0)
        n = len(lanes)
        n_lanes = 1
        while n_lanes < n:
            n_lanes *= 2
        n_lanes = min(n_lanes, self.max_streams)
        lane_idx = list(range(n)) + [0] * (n_lanes - n)  # pad = lane 0

        blocks = [s._take_frames(s._pad, t0, k) for s, t0, k in lanes]
        frames_all = np.stack([blocks[j] for j in lane_idx])
        ks = jnp.asarray([lanes[j][2] for j in lane_idx], jnp.int32)
        slot_ids = jnp.asarray(
            [lanes[j][0]._pool_row for j in lane_idx], jnp.int32)
        y_all, m_all, self._pool_state = _m2_pool_tick(
            s0.enc, s0.dec, s0.cls, s0.mean, s0.std, s0._band_map,
            jnp.asarray(frames_all), ks, slot_ids, self._pool_state,
            **s0._tick_cfg())
        y_np, m_np = np.asarray(y_all), np.asarray(m_all)
        for i, (s, t0, k) in enumerate(lanes):
            s._ola_accumulate(t0, y_np[i], m_np[i].astype(np.float16), k)

    def _tick_sharded(self, lanes, s0):
        """Multi-chip tick: EVERY slot row runs every tick (idle rows at
        k=0 keep their state), rows + the resident state sharded over the
        mesh's data axis — live streams scale across all chips in one
        shard_map program per tick. No lane bucketing: at mesh scale the
        pool is sized for capacity and the full-lane program is the
        single compiled shape."""
        R = self.max_streams
        frames_full = np.zeros((R, s0.chunk_frames, NFFT), np.float32)
        ks_full = np.zeros((R,), np.int32)
        by_row = {}
        for s, t0, k in lanes:
            row = s._pool_row
            frames_full[row] = s._take_frames(s._pad, t0, k)
            ks_full[row] = k
            by_row[row] = (s, t0, k)
        if self._sharded_tick is None:
            self._sharded_tick = _make_pool_tick_sharded(
                self.mesh, s0.enc, s0.dec, s0.cls, s0.mean, s0.std,
                s0._band_map, s0._tick_cfg())
        y_all, m_all, self._pool_state = self._sharded_tick(
            jnp.asarray(frames_full), jnp.asarray(ks_full),
            self._pool_state)
        y_np, m_np = np.asarray(y_all), np.asarray(m_all)
        for row, (s, t0, k) in by_row.items():
            s._ola_accumulate(t0, y_np[row], m_np[row].astype(np.float16),
                              k)

    def step(self):
        """Process every ready chunk of every live stream in batched
        ticks and return the newly finalized samples per stream id
        (streams with no new output are omitted)."""
        ready = self._ready()
        while ready:
            self._tick(ready)
            ready = self._ready()
        outs = {}
        for sid, s in self._slots.items():
            parts = self._buffered[sid]
            self._buffered[sid] = []
            if sid in self._t_target:
                if s._t_done >= self._t_target[sid]:
                    parts.append(s._emit_upto(s._raw_drop + s._n_raw))
            else:
                parts.append(s._emit_upto(s._t_done * HOP - NFFT // 2))
                s._maybe_trim()      # bounded memory for long streams
            parts = [p for p in parts if p.size]
            if parts:
                outs[sid] = np.concatenate(parts)
        return outs

    def flush(self, sid):
        """Finalize a stream (reference end-pad rule), drain it through
        batched ticks (co-draining whatever else is ready — their output
        is buffered for their next `step()`), and return its remaining
        enhanced samples. The slot stays open for `masks()` until
        `close()`."""
        s = self._slot(sid)
        if s._flushed:
            raise RuntimeError("flush() called twice on one stream")
        s._flushed = True
        if s._raw.size == 0:
            self._t_target[sid] = 0
            return np.zeros(0, np.float32)
        self._t_target[sid] = s._flush_pad()   # extends s._pad in place
        outs = self.step()
        for osid, arr in outs.items():
            if osid != sid:
                self._buffered[osid].append(arr)
        return outs.get(sid, np.zeros(0, np.float32))


# ---------------------------------------------------------------------------
# Thread-safe pool front end for concurrent connection handlers
# ---------------------------------------------------------------------------

class StreamPoolDriver:
    """Thread-safe front end over `MultiStreamM2Enhancer` for concurrent
    connection handlers (e.g. the HTTP `/v1/enhance_stream` route).

    `push()` feeds the caller's stream and blocks until the next batched
    tick: a background ticker thread waits `tick_ms` for co-arriving
    feeds, then runs ONE `pool.step()` for every live stream — N
    concurrent connections cost one device dispatch per tick instead of
    N. Per-stream latency grows by at most `tick_ms` + one tick's device
    time over a dedicated enhancer.

    Lifecycle: `open()` -> `push()`xN -> `flush()` (finalizes AND releases
    the slot) or `abort()` (releases without finalizing — connection
    drops must call it or the slot leaks until shutdown()).
    """

    def __init__(self, pool, tick_ms=5.0):
        import threading

        self._pool = pool
        self._tick_s = tick_ms / 1000.0
        self._lock = threading.Lock()
        self._wake = threading.Condition(self._lock)
        self._out = {}            # sid -> [np arrays] routed by the ticker
        self._gen = 0             # completed-tick counter
        self._pending = False
        self._stop = False
        self._failed = None       # first ticker exception: fail fast
        self._thread = threading.Thread(
            target=self._run, daemon=True, name="gvnmf-streampool")
        self._thread.start()

    @property
    def chunk_frames(self):
        return self._pool.chunk_frames

    def _run(self):
        while True:
            with self._wake:
                while not self._pending and not self._stop:
                    self._wake.wait(timeout=0.5)
                if self._stop:
                    return
                self._pending = False
            time.sleep(self._tick_s)       # co-batching window, lock-free
            with self._wake:
                try:
                    outs = self._pool.step()
                except Exception as e:     # fail FAST, never silently:
                    # a dead ticker would wedge every push() forever
                    self._failed = e
                    self._stop = True
                    self._wake.notify_all()
                    raise
                for sid, arr in outs.items():
                    if sid in self._out:
                        self._out[sid].append(arr)
                self._gen += 1
                self._wake.notify_all()

    def _check_alive(self):
        if self._failed is not None:
            raise RuntimeError(
                "stream pool ticker died") from self._failed
        if self._stop:
            raise RuntimeError("stream pool driver is shut down")

    def open(self):
        """Admit a stream (raises RuntimeError when the pool is full)."""
        with self._lock:
            sid = self._pool.open()
            self._out[sid] = []
            return sid

    def push(self, sid, samples):
        """Feed samples and return the output of the next batched tick
        for this stream (possibly empty — e.g. mid-chunk). Raises if the
        ticker died or the driver was shut down (never hangs)."""
        with self._wake:
            self._check_alive()
            self._pool.feed(sid, samples)
            self._pending = True
            gen0 = self._gen
            self._wake.notify_all()
            while self._gen == gen0 and not self._stop:
                self._wake.wait(timeout=1.0)
            self._check_alive()
            parts = self._out.get(sid, [])
            if parts:
                self._out[sid] = []
        return (np.concatenate(parts) if parts
                else np.zeros(0, np.float32))

    def flush(self, sid):
        """Finalize the stream (end-pad rule), return its remaining
        output, and release the slot — also on failure (a flush that
        raises must not leak the slot)."""
        with self._lock:
            parts = self._out.pop(sid, [])
            try:
                parts.append(self._pool.flush(sid))
            finally:
                self._pool.close(sid)
        parts = [p for p in parts if p.size]
        return (np.concatenate(parts) if parts
                else np.zeros(0, np.float32))

    def abort(self, sid):
        """Release a stream's slot without finalizing (connection drop)."""
        with self._lock:
            self._out.pop(sid, None)
            try:
                self._pool.close(sid)
            except KeyError:
                pass                       # already flushed/closed

    def shutdown(self):
        """Stop the ticker thread (idempotent). Live slots are dropped."""
        with self._wake:
            self._stop = True
            self._wake.notify_all()
        self._thread.join(timeout=10)


class PooledStreamSession:
    """Per-connection adapter with the `StreamingM2Enhancer` surface
    (`push`/`flush`/`chunk_frames`, plus `close()` for abort paths) over
    a shared `StreamPoolDriver` — drop-in for `http_serving`'s
    `stream_factory` so concurrent HTTP streams share one batched device
    program per tick::

        driver = StreamPoolDriver(MultiStreamM2Enhancer(dgm, ...))
        server = EnhancementHTTPServer(
            svc, stream_factory=lambda: PooledStreamSession(driver))
    """

    def __init__(self, driver):
        self._driver = driver
        self.sid = driver.open()
        self.chunk_frames = driver.chunk_frames
        self._done = False

    def push(self, samples):
        return self._driver.push(self.sid, samples)

    def flush(self):
        self._done = True
        return self._driver.flush(self.sid)

    def close(self):
        """Release the slot if the stream was never finalized (abort)."""
        if not self._done:
            self._done = True
            self._driver.abort(self.sid)
