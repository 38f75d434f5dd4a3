"""Batched Monte-Carlo EM enhancement engine.

Capability parity with reference python/models/mcem.py:8-760 (EM base,
MCEM_M1, MCEM_M2 and the *_noNMF variants): alternate Metropolis-Hastings
sampling of the VAE latent (speech model) with NMF multiplicative updates
(noise model), finishing with a probabilistic Wiener filter. The update order
and formulas follow mcem.py:90-178 exactly; randomness is explicit
`jax.random` key threading (the reference relies on global torch seeding,
mcem.py:1-5).

TPU-first re-design (not a translation):

* the MH chain is a `lax.scan`; the per-frame accept (mcem.py:271-280) is a
  masked `where` on both Z *and* the already-computed proposal variance, so
  each MH step needs ONE decoder evaluation where the reference runs two
  (propose + re-decode after accept, mcem.py:261,283);
* the guidance label y is constant during EM, so its share of the decoder's
  first-layer matmul (y_dim=513 of 545 input columns for M2-IBM) is hoisted
  out of the chain and computed once (`_precompute_label_proj`);
* E-step posterior draws land in a fixed (R, F, N) buffer via
  `dynamic_update_slice` (no (burnin+R) temporaries); the Wiener-filter pass
  accumulates the WFs/WFn running means inside the scan carry and never
  materializes its 25 draws;
* utterances are batched by `vmap` with per-utterance frame-validity masks:
  pad frames carry X=1 benign values, are excluded from the cross-frame NMF
  reductions (W update, cost) by the mask, and are sliced away on exit;
* everything is one `jit`-compiled program per (F, N_pad, R) shape bucket.
"""

from dataclasses import dataclass
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..models.nets import linear_apply, encoder_apply


# Numerical floor for the mixture variance Vx = g*Vs + Vb: late-EM underflow
# on near-silent bins would otherwise turn 1/Vx into inf (the float32
# reference has the same failure mode). Far below any real power magnitude.
VX_FLOOR = 1e-10


@dataclass(frozen=True)
class MCEMConfig:
    """Algorithm hyper-parameters (defaults = reference
    scripts/evaluate_M1.py:89-97 / evaluate_M2_ibm.py:72-80)."""

    niter: int = 100
    nsamples_E_step: int = 10
    burnin_E_step: int = 30
    nsamples_WF: int = 25
    burnin_WF: int = 75
    var_RW: float = 0.01
    nmf_rank: int = 10
    eps: float = 1e-8
    # noise_model='spp2' only: EM iterations of the residual-estimating
    # first pass (pass 2 runs the full `niter`). A short pass 1 keeps the
    # full two-pass gain — sweeping 10/25/50/100 on QUT left every metric
    # flat-to-better at 10 (VALIDATION.md) — so the default makes spp2
    # cost ~1.25x a single pass instead of 2x. None = use `niter`.
    spp2_pass1_niter: int = 25
    # Fixed-noise models only (update_nmf=False): learn a per-frame noise
    # GAIN b (N,) in the M-step, the exact symmetric counterpart of the
    # reference's per-frame speech gain g (mcem.py:135-142), so
    # Vb = b * Vb_fixed. A stationary tracker (SPP) underestimates
    # impulsive frames by orders of magnitude; b lets the EM scale the
    # tracked PSD per frame without freeing its spectral shape (the
    # failure mode of the per-bin trackers — VALIDATION.md ablations).
    # Beyond-reference capability; default off = reference *_noNMF parity.
    noise_gain: bool = False
    # noise_gain only: number of log-spaced frequency bands the gain
    # resolves (1 = one scalar per frame, the default; >1 = b is
    # (n_bands, N), each band scaled independently). The measured curve
    # (VALIDATION.md): 2-3 bands is the impulsive-noise sweet spot (QUT
    # kitchen +1.95 -> +5.72 dB at bands=2 with ~0.01-0.03 ESTOI cost);
    # >=4 bands degrade toward the per-bin-tracker failure mode
    # (speech-swallowing, ESTOI collapse).
    noise_gain_bands: int = 1


# ---------------------------------------------------------------------------
# Conditioned decoder: hoist the constant label projection
# ---------------------------------------------------------------------------


def _precompute_label_proj(dec_params, y, L):
    """First decoder layer input is cat[z, y]; split its weight so the fixed
    y part is projected once: h1_pre = y^T @ W1[L:] + b1 of shape (N, h1).
    With y=None (M1) this is just the broadcast bias."""
    l0 = dec_params["hidden"][0]
    if y is None:
        return l0["b"][None, :]
    return y.T @ l0["w"][L:] + l0["b"]


def _decode_cond(dec_params, y_pre, Z):
    """Decoder forward given Z (L, N) and precomputed label projection
    (N, h1) -> speech variance Vs (F, N)."""
    l0 = dec_params["hidden"][0]
    L = Z.shape[0]
    h = jnp.tanh(Z.T @ l0["w"][:L] + y_pre)
    for layer in dec_params["hidden"][1:]:
        h = jnp.tanh(linear_apply(layer, h))
    return jnp.exp(linear_apply(dec_params["out"], h)).T


# ---------------------------------------------------------------------------
# Metropolis-Hastings latent sampling
# ---------------------------------------------------------------------------


def framewise_uniform(key, rows, N, dtype=jnp.float32):
    """(rows, N) uniforms whose column n depends only on (key, n): per-frame
    fold_in instead of one (rows, N) draw, so NMF inits — and therefore
    whole XLA-engine MCEM trajectories — are invariant to how far the
    frame axis is padded (a pooled-bucket batch and the utterance's own
    bucket produce identical results; tests/test_pipeline.py mesh test)."""
    return jax.vmap(
        lambda n: jax.random.uniform(jax.random.fold_in(key, n), (rows,),
                                     dtype)
    )(jnp.arange(N)).T


def _mh_scan(dec_params, y_pre, X_abs2, Vb, g, Z0, Vs0, key, n_steps, var_RW,
             step_extra, noise=None):
    """Run `n_steps` of the random-walk MH chain (reference mcem.py:218-294).

    `step_extra(carry_extra, m, Z, Vs, Vx)` folds per-step products (sample
    buffers or WF accumulators) without materializing the chain.
    `noise`: optional (Zn (n_steps, L, N), U (n_steps, N)) recorded streams
    replacing the PRNG draws — the fixed-randomness test mode shared with
    the Pallas kernel (mh_chain_pallas(noise=...)), making var_RW>0
    trajectories bit-comparable across engines.

    PRNG layout: one chain-level split advances `key`; the draws derive
    from per-frame keys folded with the step index, so a frame's noise
    stream depends only on (key, frame, step) — never on the padded
    length N. Returns (Z, Vs, key, carry_extra).
    """
    L, N = Z0.shape
    gVb = Vb  # alias for clarity; Vb fixed during a chain
    sqrt_var = jnp.sqrt(jnp.asarray(var_RW, X_abs2.dtype))
    key, sub = jax.random.split(key)
    frame_keys = jax.vmap(jax.random.fold_in, (None, 0))(
        sub, jnp.arange(N))

    def step(carry, m):
        Z, Vs, extra = carry
        if noise is not None:
            zn_m = noise[0][m]
        else:
            zn_m = jax.vmap(
                lambda k: jax.random.normal(
                    jax.random.fold_in(k, m), (L,), Z0.dtype)
            )(frame_keys).T
        Z_prime = Z + sqrt_var * zn_m
        Vs_prime = _decode_cond(dec_params, y_pre, Z_prime)
        Vx = jnp.maximum(g * Vs + gVb, VX_FLOOR)
        Vx_prime = jnp.maximum(g * Vs_prime + gVb, VX_FLOOR)
        # log acceptance ratio (mcem.py:266-268)
        acc_prob = jnp.sum(
            jnp.log(Vx) - jnp.log(Vx_prime)
            + (1.0 / Vx - 1.0 / Vx_prime) * X_abs2,
            axis=0,
        ) + 0.5 * jnp.sum(Z**2 - Z_prime**2, axis=0)
        if noise is not None:
            u_m = noise[1][m]
        else:
            u_m = jax.vmap(
                lambda k: jax.random.uniform(
                    jax.random.fold_in(jax.random.fold_in(k, m), 1), ())
            )(frame_keys)
        is_acc = jnp.log(u_m) < acc_prob
        Z = jnp.where(is_acc[None, :], Z_prime, Z)
        # selective update == the reference's post-accept re-decode
        Vs = jnp.where(is_acc[None, :], Vs_prime, Vs)
        Vx = jnp.maximum(g * Vs + gVb, VX_FLOOR)
        extra = step_extra(extra, m, Z, Vs, Vx)
        return (Z, Vs, extra), None

    init_extra = step_extra(None, None, None, None, None)  # sentinel init
    (Z, Vs, extra), _ = lax.scan(
        step, (Z0, Vs0, init_extra), jnp.arange(n_steps)
    )
    return Z, Vs, key, extra


def mh_sample_posterior(dec_params, y_pre, X_abs2, Vb, g, Z0, Vs0, key,
                        nsamples, burnin, var_RW, noise=None):
    """E-step chain: collect the `nsamples` post-burnin speech variances into
    a (R, F, N) buffer (reference mcem.py:286-289 keeps Z draws then
    re-decodes; keeping Vs directly is equivalent and halves decoder work)."""
    F, N = X_abs2.shape

    def step_extra(extra, m, Z, Vs, Vx):
        if extra is None:
            return jnp.zeros((nsamples, F, N), X_abs2.dtype)
        idx = jnp.maximum(m - burnin, 0)
        updated = lax.dynamic_update_slice(extra, Vs[None], (idx, 0, 0))
        return jnp.where(m >= burnin, updated, extra)

    Z, Vs, key, buf = _mh_scan(
        dec_params, y_pre, X_abs2, Vb, g, Z0, Vs0, key,
        nsamples + burnin, var_RW, step_extra, noise=noise,
    )
    return Z, Vs, key, buf


def mh_wiener_filter(dec_params, y_pre, X_abs2, Vb, g, Z0, Vs0, key,
                     nsamples, burnin, var_RW, noise=None):
    """Final Wiener-filter chain (reference mcem.py:327-345): accumulate the
    posterior means of Vs_scaled/Vx and Vb/Vx in the scan carry."""
    F, N = X_abs2.shape

    def step_extra(extra, m, Z, Vs, Vx):
        if extra is None:
            return (
                jnp.zeros((F, N), X_abs2.dtype),
                jnp.zeros((F, N), X_abs2.dtype),
            )
        acc_s, acc_n = extra
        take = (m >= burnin).astype(X_abs2.dtype)
        acc_s = acc_s + take * (g * Vs) / Vx
        acc_n = acc_n + take * Vb / Vx
        return acc_s, acc_n

    Z, Vs, key, (acc_s, acc_n) = _mh_scan(
        dec_params, y_pre, X_abs2, Vb, g, Z0, Vs0, key,
        nsamples + burnin, var_RW, step_extra, noise=noise,
    )
    return acc_s / nsamples, acc_n / nsamples, Z, Vs, key


# ---------------------------------------------------------------------------
# NMF M-step
# ---------------------------------------------------------------------------


def _noise_gain_band_map(F, n_bands, dtype=jnp.float32):
    """(n_bands, F) 0/1 membership matrix of log-spaced frequency bands
    (band 0 includes the DC bin). Static per (F, n_bands)."""
    if not 1 <= n_bands <= F:
        # an empty band would make its multiplicative update 0/0 = NaN
        raise ValueError(
            f"noise_gain_bands must be in [1, F={F}], got {n_bands}")
    edges = np.round(np.geomspace(1, F, n_bands + 1)).astype(np.int64)
    edges[0] = 0
    edges[-1] = F
    edges = np.maximum.accumulate(edges)
    for k in range(1, n_bands):              # force non-empty bands
        edges[k] = max(edges[k], edges[k - 1] + 1)
    m = np.zeros((n_bands, F), np.float32)
    for k in range(n_bands):
        m[k, edges[k]:edges[k + 1]] = 1.0
    return jnp.asarray(m, dtype)


def noise_gain_state(F, N, n_bands, Vb_fixed, dtype, batch=None):
    """Shared construction of the per-frame/per-band noise-gain state
    (MCEMConfig.noise_gain / noise_gain_bands): the effective noise
    variance is Vb = eff_vb(b) = scale(b) * Vb_fixed.

    Returns (b0, eff_vb, band_map). One definition for all engines so
    the band semantics (log spacing, membership) cannot drift between
    the XLA, PEEM, streaming, and fused-Pallas paths.

    Layouts: with batch=None, Vb_fixed is (F, N)-broadcastable and b is
    (N,) or (n_bands, N); with batch=B, Vb_fixed is (B, N, F) (the fused
    engine's frame-major layout) and b is (B, N) or (B, n_bands, N).
    """
    if batch is None:
        if n_bands > 1:
            band_map = _noise_gain_band_map(F, n_bands, dtype)
            b0 = jnp.ones((n_bands, N), dtype)

            def eff_vb(b_):
                return (band_map.T @ b_) * Vb_fixed
        else:
            band_map = None
            b0 = jnp.ones((N,), dtype)

            def eff_vb(b_):
                return b_[None, :] * Vb_fixed
    else:
        if n_bands > 1:
            band_map = _noise_gain_band_map(F, n_bands, dtype)
            b0 = jnp.ones((batch, n_bands, N), dtype)

            def eff_vb(b_):                  # (B, K_b, N) -> (B, N, F)
                return jnp.einsum("bkn,kf->bnf", b_, band_map) * Vb_fixed
        else:
            band_map = None
            b0 = jnp.ones((batch, N), dtype)

            def eff_vb(b_):                  # (B, N)
                return b_[:, :, None] * Vb_fixed
    return b0, eff_vb, band_map


def nmf_m_step(X_abs2, mask, W, H, g, Vs_samples, update_nmf=True,
               Vb_fixed=None, axis_name=None, b=None, band_map=None):
    """Multiplicative W, H, g updates in the reference's exact order
    (mcem.py:90-152): W; recompute Vb,Vx; H; recompute; L1-normalize W with
    compensating H rescale; g. `mask` (N,) excludes pad frames from the
    cross-frame reductions so the result equals the unpadded per-utterance
    computation. With update_nmf=False the noise variance stays at Vb_fixed
    and only g is updated (the *_noNMF variants, mcem.py:543-578).

    `b` (N,), fixed-noise models only: per-frame noise gain
    (MCEMConfig.noise_gain) — Vb = b * Vb_fixed; b gets the same
    gradient-split multiplicative update as g (its coefficient in Vx is
    Vb_fixed where g's is Vs), updated BEFORE g (noise-model parameters
    first, mirroring the reference's W,H-then-g order). Returns
    (W, H, g, b) when given, (W, H, g) otherwise.

    `axis_name`: when the FRAME axis is sharded over a mesh (shard_map,
    one long recording spanning chips — SURVEY §5), the only cross-frame
    reductions in the whole EM iteration are this function's W-update
    matmuls (and the cost); they become psums over the frame shards. The
    H and g updates are per-frame and stay local."""

    def fsum(v):
        return lax.psum(v, axis_name) if axis_name else v

    def vx(Vb):
        return jnp.maximum(g * Vs_samples + Vb, VX_FLOOR)  # (R, F, N)

    if b is not None and b.ndim == 2:
        # per-band per-frame gain: b (n_bands, N), band_map (n_bands, F);
        # Vb = (band_map.T @ b) * Vb_fixed — b_k's coefficient in Vx is
        # 1[f in band k] * Vb_fixed, so the gradient-split update is the
        # per-frame rule with the f-sums restricted to the band.
        assert not update_nmf, "noise_gain requires a fixed noise model"
        Vx = vx((band_map.T @ b) * Vb_fixed)
        num = band_map @ (X_abs2 * Vb_fixed * jnp.sum(Vx**-2, axis=0))
        den = band_map @ (Vb_fixed * jnp.sum(Vx**-1, axis=0))
        b = b * (num / den) ** 0.5
        Vx = vx((band_map.T @ b) * Vb_fixed)
        num = jnp.sum(X_abs2 * jnp.sum(Vs_samples * Vx**-2, axis=0),
                      axis=0)
        den = jnp.sum(jnp.sum(Vs_samples * Vx**-1, axis=0), axis=0)
        g = g * (num / den) ** 0.5
        return W, H, g, b

    if b is not None:
        assert not update_nmf, "noise_gain requires a fixed noise model"
        Vx = vx(b[None, :] * Vb_fixed)
        num = jnp.sum(X_abs2 * Vb_fixed * jnp.sum(Vx**-2, axis=0), axis=0)
        den = jnp.sum(Vb_fixed * jnp.sum(Vx**-1, axis=0), axis=0)
        b = b * (num / den) ** 0.5
        Vx = vx(b[None, :] * Vb_fixed)
        num = jnp.sum(X_abs2 * jnp.sum(Vs_samples * Vx**-2, axis=0),
                      axis=0)
        den = jnp.sum(jnp.sum(Vs_samples * Vx**-1, axis=0), axis=0)
        g = g * (num / den) ** 0.5
        return W, H, g, b

    Vb = _noise_var(W, H, update_nmf, Vb_fixed)
    if update_nmf:
        Vx = vx(Vb)
        sum_inv2 = jnp.sum(Vx**-2, axis=0)
        sum_inv1 = jnp.sum(Vx**-1, axis=0)
        num = fsum(((X_abs2 * sum_inv2) * mask) @ H.T)
        den = fsum((sum_inv1 * mask) @ H.T)
        W = W * (num / den) ** 0.5

        Vb = _noise_var(W, H, True, Vb_fixed)
        Vx = vx(Vb)
        sum_inv2 = jnp.sum(Vx**-2, axis=0)
        sum_inv1 = jnp.sum(Vx**-1, axis=0)
        num = W.T @ (X_abs2 * sum_inv2)
        den = W.T @ sum_inv1
        H = H * (num / den) ** 0.5

        norm_col_W = jnp.sum(jnp.abs(W), axis=0)
        W = W / norm_col_W[None, :]
        H = H * norm_col_W[:, None]
        Vb = _noise_var(W, H, True, Vb_fixed)

    Vx = vx(Vb)
    num = jnp.sum(X_abs2 * jnp.sum(Vs_samples * Vx**-2, axis=0), axis=0)
    den = jnp.sum(jnp.sum(Vs_samples * Vx**-1, axis=0), axis=0)
    g = g * (num / den) ** 0.5
    return W, H, g


# ---------------------------------------------------------------------------
# Full EM loop (single utterance; vmap over a batch)
# ---------------------------------------------------------------------------


def _noise_var(W, H, update_nmf, Vb_fixed):
    """Noise variance under the three noise models: NMF (W@H), fixed
    external PSD (Vb_fixed, the *_noNMF variants), or HYBRID — a fixed
    floor (e.g. the SPP track) plus a learned low-rank NMF residual:
    Vb = W@H + Vb_fixed. The multiplicative updates stay valid with the
    additive floor inside Vx."""
    if not update_nmf:
        return Vb_fixed
    Vb = W @ H
    return Vb if Vb_fixed is None else Vb + Vb_fixed


def _masked_cost(X_abs2, mask, Vb, g, Vs_samples, axis_name=None):
    """Expected negative log-likelihood over valid frames (reference
    mcem.py:68-70 computes a plain mean; the mask restricts it to real
    frames so padding cannot shift the trajectory)."""
    Vx = g * Vs_samples + Vb
    per_bin = jnp.log(Vx) + X_abs2 / Vx
    total = jnp.sum(per_bin * mask)
    count = Vs_samples.shape[0] * X_abs2.shape[0] * jnp.sum(mask)
    if axis_name:
        total = lax.psum(total, axis_name)
        count = lax.psum(count, axis_name)
    return total / count


def mcem_run(vae_params, X_abs2, mask, y, key, cfg: MCEMConfig,
             update_nmf=True, Vb_fixed=None, axis_name=None,
             init_nmf=None, init_Z=None, noise=None):
    """Run the full MCEM loop on one utterance.

    Args:
      vae_params: M1 vae tree (y=None) or M2 dgm tree (y given).
      X_abs2: (F, N) power spectrogram; pad frames must hold benign
        positive values (use `pad_power`).
      mask: (N,) float 0/1 frame-validity mask.
      y: (y_dim, N) fixed guidance labels, or None for M1.
      key: PRNG key.
      update_nmf: False for the *_noNMF variants (requires Vb_fixed).
      Vb_fixed: (F, N) fixed noise variance when update_nmf=False.
      axis_name: mesh axis the FRAME dimension is sharded over (inside a
        shard_map; see parallel.sweep.frame_sharded_mcem) — the MH chain
        is per-frame independent, so only the NMF W-update and the cost
        need psums. None for the single-device path.
      init_nmf: optional (W0, H0, g0) overriding the random NMF init —
        used by the frame-sharded path so every shard starts from its
        slice of one global init (and by fixed-randomness tests).
      init_Z: optional (L, N) latent warm start replacing the encoder
        posterior-mean init (PEEM->MCEM hybrid on the XLA engine).
      noise: optional recorded random streams replacing EVERY PRNG draw of
        the run — the full-run fixed-randomness mode (the chain-level
        `_mh_scan(noise=...)` hook extended across the EM loop). Tuple
        `(Zn_E (niter, sE, L, N), U_E (niter, sE, N),
          Zn_WF (sWF, L, N), U_WF (sWF, N))` with sE/sWF the E/WF chain
        lengths (nsamples+burnin). Combined with `init_nmf`, no PRNG draw
        influences the result (the chain-level split still runs but its
        draws go unused), which makes the engines bit-comparable:
        replaying the torch reference's global-RNG stream (same
        manual_seed, same consumption order — mcem.py:42-44,257,271)
        turns the engine-vs-engine delta into a PAIRED, randomness-free
        numerical comparison (validate_parity.py --engine paired).
        Not supported together with noise_gain.

    Returns dict with WFs, WFn (F, N), cost (niter,), W, H, g, Z.
    """
    F, N = X_abs2.shape
    enc_params = vae_params["encoder"]
    dec_params = vae_params["decoder"]
    L = dec_params["hidden"][0]["w"].shape[0] - (0 if y is None else y.shape[0])

    key, k_w, k_h = jax.random.split(key, 3)
    if init_nmf is not None:
        W, H, g = init_nmf
    elif update_nmf:
        W = jnp.maximum(jax.random.uniform(k_w, (F, cfg.nmf_rank)), cfg.eps)
        H = jnp.maximum(framewise_uniform(k_h, cfg.nmf_rank, N), cfg.eps)
        g = jnp.ones((N,), X_abs2.dtype)
    else:
        # Fixed external noise model: spread Vb over rank-1 factors so the
        # same code path computes Vb = W @ H = Vb_fixed.
        W = jnp.ones((F, 1), X_abs2.dtype)
        H = jnp.zeros((1, N), X_abs2.dtype)
        g = jnp.ones((N,), X_abs2.dtype)

    if init_Z is not None:
        Z = init_Z
    else:
        # Z0 = encoder posterior mean of the (label-conditioned) power
        # frames (reference mcem.py:214-215,367-368)
        enc_in = (X_abs2.T if y is None
                  else jnp.concatenate([X_abs2, y], 0).T)
        _, mu, _ = encoder_apply(enc_params, enc_in)
        Z = mu.T  # (L, N)

    y_pre = _precompute_label_proj(dec_params, y, L)
    Vs = _decode_cond(dec_params, y_pre, Z)

    use_b = cfg.noise_gain and not update_nmf
    if noise is not None and cfg.noise_gain:
        raise ValueError("fixed-randomness injection (noise=) is not "
                         "supported with noise_gain")
    if cfg.noise_gain and update_nmf:
        raise ValueError(
            "MCEMConfig.noise_gain requires a fixed noise model "
            "(update_nmf=False, i.e. noise_model 'spp'/'spp2')")

    if use_b:
        # per-frame noise gain (MCEMConfig.noise_gain): Vb = b * Vb_fixed,
        # b updated in the M-step symmetrically to g (see nmf_m_step).
        # noise_gain_bands > 1: b is (n_bands, N), per-band scaling.
        b, eff_vb, band_map = noise_gain_state(
            F, N, cfg.noise_gain_bands, Vb_fixed, X_abs2.dtype)

        def em_iter_b(carry, _):
            W, H, g, b, Z, Vs, key = carry
            Z, Vs, key, Vs_samples = mh_sample_posterior(
                dec_params, y_pre, X_abs2, eff_vb(b), g, Z, Vs, key,
                cfg.nsamples_E_step, cfg.burnin_E_step, cfg.var_RW,
            )
            W2, H2, g2, b2 = nmf_m_step(
                X_abs2, mask, W, H, g, Vs_samples, update_nmf=False,
                Vb_fixed=Vb_fixed, axis_name=axis_name, b=b,
                band_map=band_map,
            )
            cost = _masked_cost(X_abs2, mask, eff_vb(b2), g2,
                                Vs_samples, axis_name=axis_name)
            return (W2, H2, g2, b2, Z, Vs, key), cost

        (W, H, g, b, Z, Vs, key), cost = lax.scan(
            em_iter_b, (W, H, g, b, Z, Vs, key), None, length=cfg.niter
        )
        WFs, WFn, Z, Vs, key = mh_wiener_filter(
            dec_params, y_pre, X_abs2, eff_vb(b), g, Z, Vs,
            key, cfg.nsamples_WF, cfg.burnin_WF, cfg.var_RW,
        )
        return {
            "WFs": WFs, "WFn": WFn, "cost": cost,
            "W": W, "H": H, "g": g, "b": b, "Z": Z,
        }

    def em_iter(carry, xs):
        W, H, g, Z, Vs, key = carry
        Vb = _noise_var(W, H, update_nmf, Vb_fixed)
        Z, Vs, key, Vs_samples = mh_sample_posterior(
            dec_params, y_pre, X_abs2, Vb, g, Z, Vs, key,
            cfg.nsamples_E_step, cfg.burnin_E_step, cfg.var_RW,
            noise=xs,
        )
        W2, H2, g2 = nmf_m_step(
            X_abs2, mask, W, H, g, Vs_samples, update_nmf=update_nmf,
            Vb_fixed=Vb_fixed, axis_name=axis_name,
        )
        Vb2 = _noise_var(W2, H2, update_nmf, Vb_fixed)
        cost = _masked_cost(X_abs2, mask, Vb2, g2, Vs_samples,
                            axis_name=axis_name)
        return (W2, H2, g2, Z, Vs, key), cost

    # injected streams ride the scan xs (one (sE, ...) slice per EM iter)
    xs_E = None if noise is None else (jnp.asarray(noise[0]),
                                       jnp.asarray(noise[1]))
    (W, H, g, Z, Vs, key), cost = lax.scan(
        em_iter, (W, H, g, Z, Vs, key), xs_E, length=cfg.niter
    )

    Vb = _noise_var(W, H, update_nmf, Vb_fixed)
    WFs, WFn, Z, Vs, key = mh_wiener_filter(
        dec_params, y_pre, X_abs2, Vb, g, Z, Vs, key,
        cfg.nsamples_WF, cfg.burnin_WF, cfg.var_RW,
        noise=None if noise is None else (jnp.asarray(noise[2]),
                                          jnp.asarray(noise[3])),
    )
    return {
        "WFs": WFs, "WFn": WFn, "cost": cost,
        "W": W, "H": H, "g": g, "Z": Z,
    }


def mcem_run_converged(vae_params, X_abs2, mask, y, key,
                       cfg: MCEMConfig = MCEMConfig(), tol=1e-4,
                       check_every=5, update_nmf=True, Vb_fixed=None):
    """MCEM with cost-based early stopping (the legacy engine's
    `run(tol=1e-4)`, reference mcem_julius.py:106-108): run EM in
    `check_every`-iteration jitted chunks and stop once the per-chunk mean
    cost decrease falls below `tol`; `cfg.niter` is the iteration budget.

    Single-utterance host loop (per-utterance convergence times differ, so
    batching would hide the capability); returns the same dict as
    :func:`mcem_run` with 'cost' trimmed to the executed iterations and an
    'iters' count.
    """
    use_b = cfg.noise_gain and not update_nmf
    if cfg.noise_gain and update_nmf:
        raise ValueError(
            "MCEMConfig.noise_gain requires a fixed noise model "
            "(update_nmf=False, i.e. noise_model 'spp'/'spp2')")
    if use_b:
        b0, eff_vb, band_map = noise_gain_state(
            X_abs2.shape[0], X_abs2.shape[1], cfg.noise_gain_bands,
            Vb_fixed, X_abs2.dtype)
    else:
        b0, eff_vb, band_map = None, None, None
    chunk_cfg = MCEMConfig(
        niter=check_every, nsamples_E_step=cfg.nsamples_E_step,
        burnin_E_step=cfg.burnin_E_step, nsamples_WF=cfg.nsamples_WF,
        burnin_WF=cfg.burnin_WF, var_RW=cfg.var_RW,
        nmf_rank=cfg.nmf_rank, eps=cfg.eps,
    )

    @jax.jit
    def chunk(state):
        W, H, g, b, Z, Vs, k = state
        dec = vae_params["decoder"]
        L = dec["hidden"][0]["w"].shape[0] - (
            0 if y is None else y.shape[0]
        )
        y_pre = _precompute_label_proj(dec, y, L)

        def em_iter(carry, _):
            W, H, g, b, Z, Vs, k = carry
            Vb = eff_vb(b) if use_b else _noise_var(
                W, H, update_nmf, Vb_fixed)
            Z, Vs, k, samples = mh_sample_posterior(
                dec, y_pre, X_abs2, Vb, g, Z, Vs, k,
                chunk_cfg.nsamples_E_step, chunk_cfg.burnin_E_step,
                chunk_cfg.var_RW,
            )
            if use_b:
                W2, H2, g2, b2 = nmf_m_step(
                    X_abs2, mask, W, H, g, samples, update_nmf=False,
                    Vb_fixed=Vb_fixed, b=b, band_map=band_map,
                )
                Vb2 = eff_vb(b2)
            else:
                W2, H2, g2 = nmf_m_step(
                    X_abs2, mask, W, H, g, samples, update_nmf=update_nmf,
                    Vb_fixed=Vb_fixed,
                )
                b2 = None
                Vb2 = (W2 @ H2) if update_nmf else Vb_fixed
            cost = _masked_cost(X_abs2, mask, Vb2, g2, samples)
            return (W2, H2, g2, b2, Z, Vs, k), cost

        (W, H, g, b, Z, Vs, k), costs = lax.scan(
            em_iter, (W, H, g, b, Z, Vs, k), None, length=check_every
        )
        return (W, H, g, b, Z, Vs, k), costs

    # init exactly as mcem_run
    F, N = X_abs2.shape
    enc_params = vae_params["encoder"]
    dec_params = vae_params["decoder"]
    L = dec_params["hidden"][0]["w"].shape[0] - (
        0 if y is None else y.shape[0]
    )
    key, k_w, k_h = jax.random.split(key, 3)
    if update_nmf:
        W = jnp.maximum(jax.random.uniform(k_w, (F, cfg.nmf_rank)), cfg.eps)
        H = jnp.maximum(framewise_uniform(k_h, cfg.nmf_rank, N), cfg.eps)
    else:
        W = jnp.ones((F, 1), X_abs2.dtype)
        H = jnp.zeros((1, N), X_abs2.dtype)
    g = jnp.ones((N,), X_abs2.dtype)
    enc_in = X_abs2.T if y is None else jnp.concatenate([X_abs2, y], 0).T
    _, mu, _ = encoder_apply(enc_params, enc_in)
    Z = mu.T
    y_pre = _precompute_label_proj(dec_params, y, L)
    Vs = _decode_cond(dec_params, y_pre, Z)

    state = (W, H, g, b0, Z, Vs, key)
    costs_all = []
    prev = None
    iters = 0
    while iters < cfg.niter:
        state, costs = chunk(state)
        costs = np.asarray(costs)
        costs_all.append(costs)
        iters += check_every
        cur = float(costs[-1])
        if prev is not None and (prev - cur) < tol:
            break
        prev = cur

    W, H, g, b, Z, Vs, key = state
    Vb = eff_vb(b) if use_b else _noise_var(W, H, update_nmf, Vb_fixed)
    WFs, WFn, Z, Vs, key = mh_wiener_filter(
        dec_params, y_pre, X_abs2, Vb, g, Z, Vs, key,
        cfg.nsamples_WF, cfg.burnin_WF, cfg.var_RW,
    )
    out = {
        "WFs": WFs, "WFn": WFn,
        "cost": jnp.asarray(np.concatenate(costs_all)),
        "W": W, "H": H, "g": g, "Z": Z, "iters": iters,
    }
    if use_b:
        out["b"] = b
    return out


@partial(jax.jit,
         static_argnames=("cfg", "tol", "check_every", "update_nmf"))
def mcem_run_converged_batch(vae_params, X_abs2, mask, y, keys,
                             cfg: MCEMConfig = MCEMConfig(), tol=1e-4,
                             check_every=5, update_nmf=True,
                             Vb_fixed=None):
    """Batched tol-stop MCEM: :func:`mcem_run_converged` vectorized over a
    padded utterance batch with per-utterance convergence masks.

    One device program runs `check_every`-iteration EM chunks under a
    `lax.while_loop`; after each chunk every utterance applies the legacy
    stop rule (chunk-end cost decrease < tol, reference
    mcem_julius.py:106-108). Utterances that stop are FROZEN — their
    state and PRNG stream cease advancing (per-row `where` selects) —
    while stragglers keep iterating, so each row's trajectory equals the
    single-utterance engine's for the same key. The loop ends when every
    row has converged or spent the `cfg.niter` budget; the final Wiener
    pass then runs for all rows.

    Args: X_abs2 (B, F, N), mask (B, N), y (B, y_dim, N) or None,
    keys (B, 2), Vb_fixed (B, F, N) when update_nmf=False.

    Returns the :func:`mcem_run` dict batched, plus 'iters' (B,) int32
    per-utterance executed iteration counts; 'cost' is (B, budget) with
    entries past a row's executed iterations left at 0.
    """
    use_b = cfg.noise_gain and not update_nmf
    if cfg.noise_gain and update_nmf:
        raise ValueError(
            "MCEMConfig.noise_gain requires a fixed noise model "
            "(update_nmf=False, i.e. noise_model 'spp'/'spp2')")
    B, F, N = X_abs2.shape
    if use_b:
        # band_map is static per (F, n_bands); b is per-row state. The
        # per-row effective noise variance matches noise_gain_state's
        # single-utterance semantics (Vb_fixed here is (B, F, N)).
        band_map = (_noise_gain_band_map(F, cfg.noise_gain_bands,
                                         X_abs2.dtype)
                    if cfg.noise_gain_bands > 1 else None)
        b0 = (jnp.ones((B, cfg.noise_gain_bands, N), X_abs2.dtype)
              if cfg.noise_gain_bands > 1
              else jnp.ones((B, N), X_abs2.dtype))

        def eff_vb_row(b_, Vb_f):
            if band_map is not None:
                return (band_map.T @ b_) * Vb_f
            return b_[None, :] * Vb_f
    else:
        band_map, b0, eff_vb_row = None, None, None
    enc_params = vae_params["encoder"]
    dec_params = vae_params["decoder"]
    L = dec_params["hidden"][0]["w"].shape[0] - (
        0 if y is None else y.shape[1]
    )
    n_chunks = -(-cfg.niter // check_every)
    budget = n_chunks * check_every

    def init_one(X, k, yy):
        k, k_w, k_h = jax.random.split(k, 3)
        if update_nmf:
            W = jnp.maximum(jax.random.uniform(k_w, (F, cfg.nmf_rank)),
                            cfg.eps)
            H = jnp.maximum(framewise_uniform(k_h, cfg.nmf_rank, N),
                            cfg.eps)
        else:
            W = jnp.ones((F, 1), X.dtype)
            H = jnp.zeros((1, N), X.dtype)
        g = jnp.ones((N,), X.dtype)
        enc_in = X.T if yy is None else jnp.concatenate([X, yy], 0).T
        _, mu, _ = encoder_apply(enc_params, enc_in)
        Z = mu.T
        y_pre = _precompute_label_proj(dec_params, yy, L)
        Vs = _decode_cond(dec_params, y_pre, Z)
        return W, H, g, Z, Vs, k, y_pre

    if y is None:
        state = jax.vmap(lambda X, k: init_one(X, k, None))(X_abs2, keys)
    else:
        state = jax.vmap(init_one)(X_abs2, keys, y)
    # splice the (already batched) noise-gain state in after g
    state = state[:3] + (b0,) + state[3:]

    def chunk_one(W, H, g, b, Z, Vs, k, y_pre, X, m, Vb_f):
        def em_iter(carry, _):
            W, H, g, b, Z, Vs, k = carry
            Vb = (eff_vb_row(b, Vb_f) if use_b
                  else _noise_var(W, H, update_nmf, Vb_f))
            Z, Vs, k, samples = mh_sample_posterior(
                dec_params, y_pre, X, Vb, g, Z, Vs, k,
                cfg.nsamples_E_step, cfg.burnin_E_step, cfg.var_RW,
            )
            if use_b:
                W2, H2, g2, b2 = nmf_m_step(
                    X, m, W, H, g, samples, update_nmf=False,
                    Vb_fixed=Vb_f, b=b, band_map=band_map,
                )
                Vb2 = eff_vb_row(b2, Vb_f)
            else:
                W2, H2, g2 = nmf_m_step(
                    X, m, W, H, g, samples, update_nmf=update_nmf,
                    Vb_fixed=Vb_f,
                )
                b2 = None
                Vb2 = _noise_var(W2, H2, update_nmf, Vb_f)
            cost = _masked_cost(X, m, Vb2, g2, samples)
            return (W2, H2, g2, b2, Z, Vs, k), cost

        (W, H, g, b, Z, Vs, k), costs = lax.scan(
            em_iter, (W, H, g, b, Z, Vs, k), None, length=check_every
        )
        return (W, H, g, b, Z, Vs, k), costs

    def chunk_all(state):
        W, H, g, b, Z, Vs, k, y_pre = state
        if Vb_fixed is None:
            new, costs = jax.vmap(
                lambda W, H, g, b, Z, Vs, k, yp, X, m: chunk_one(
                    W, H, g, b, Z, Vs, k, yp, X, m, None)
            )(W, H, g, b, Z, Vs, k, y_pre, X_abs2, mask)
        else:
            new, costs = jax.vmap(chunk_one)(
                W, H, g, b, Z, Vs, k, y_pre, X_abs2, mask, Vb_fixed
            )
        return new + (y_pre,), costs

    def cond(carry):
        _, active, _, _, _, ci = carry
        return jnp.any(active) & (ci < n_chunks)

    def body(carry):
        state, active, prev, iters, hist, ci = carry
        new_state, costs = chunk_all(state)

        def sel(n, o):
            return jnp.where(
                active.reshape((B,) + (1,) * (n.ndim - 1)), n, o)

        state = jax.tree_util.tree_map(sel, new_state, state)
        old = lax.dynamic_slice(hist, (0, ci * check_every),
                                (B, check_every))
        hist = lax.dynamic_update_slice(
            hist, jnp.where(active[:, None], costs, old),
            (0, ci * check_every))
        cur = costs[:, -1]
        iters = jnp.where(active, iters + check_every, iters)
        new_active = active & ((prev - cur) >= tol)
        prev = jnp.where(active, cur, prev)
        return state, new_active, prev, iters, hist, ci + 1

    carry0 = (state, jnp.ones((B,), bool),
              jnp.full((B,), jnp.inf, X_abs2.dtype),
              jnp.zeros((B,), jnp.int32),
              jnp.zeros((B, budget), X_abs2.dtype), jnp.int32(0))
    state, _, _, iters, hist, _ = lax.while_loop(cond, body, carry0)
    W, H, g, b, Z, Vs, k, y_pre = state

    def wf_one(W, H, g, b, Z, Vs, k, y_pre, X, Vb_f):
        Vb = (eff_vb_row(b, Vb_f) if use_b
              else _noise_var(W, H, update_nmf, Vb_f))
        WFs, WFn, Z, Vs, k = mh_wiener_filter(
            dec_params, y_pre, X, Vb, g, Z, Vs, k,
            cfg.nsamples_WF, cfg.burnin_WF, cfg.var_RW,
        )
        return WFs, WFn, Z

    if Vb_fixed is None:
        WFs, WFn, Z = jax.vmap(
            lambda W, H, g, b, Z, Vs, k, yp, X: wf_one(
                W, H, g, b, Z, Vs, k, yp, X, None)
        )(W, H, g, b, Z, Vs, k, y_pre, X_abs2)
    else:
        WFs, WFn, Z = jax.vmap(wf_one)(
            W, H, g, b, Z, Vs, k, y_pre, X_abs2, Vb_fixed
        )
    out = {
        "WFs": WFs, "WFn": WFn, "cost": hist,
        "W": W, "H": H, "g": g, "Z": Z, "iters": iters,
    }
    if use_b:
        out["b"] = b
    return out


def pad_power(X_abs2, N_pad, pad_value=1.0):
    """Pad a (F, N) power spectrogram to (F, N_pad) with benign positive
    values and return (padded, mask)."""
    F, N = X_abs2.shape
    out = jnp.full((F, N_pad), pad_value, X_abs2.dtype)
    out = out.at[:, :N].set(X_abs2)
    mask = jnp.zeros((N_pad,), X_abs2.dtype).at[:N].set(1.0)
    return out, mask


# ---------------------------------------------------------------------------
# Batched entry points
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("cfg", "update_nmf"))
def mcem_m1_batch(vae_params, X_abs2, mask, keys, cfg: MCEMConfig,
                  update_nmf=True, Vb_fixed=None):
    """vmap of :func:`mcem_run` for M1 over a padded utterance batch:
    X_abs2 (B, F, N), mask (B, N), keys (B, 2). Replaces the reference's
    one-process-per-GPU sweep (evaluate_M1.py:186-222) with one compiled
    program."""
    def run_one(X, m, k, Vb):
        return mcem_run(vae_params, X, m, None, k, cfg,
                        update_nmf=update_nmf, Vb_fixed=Vb)

    if Vb_fixed is None:
        return jax.vmap(lambda X, m, k: run_one(X, m, k, None))(
            X_abs2, mask, keys
        )
    return jax.vmap(run_one)(X_abs2, mask, keys, Vb_fixed)


@partial(jax.jit, static_argnames=("cfg", "update_nmf"))
def mcem_m2_batch(dgm_params, X_abs2, mask, y, keys, cfg: MCEMConfig,
                  update_nmf=True, Vb_fixed=None):
    """vmap of :func:`mcem_run` for M2: y (B, y_dim, N) fixed hard labels
    (reference mcem.py:207-216)."""
    params = {k: v for k, v in dgm_params.items() if k != "y_dim"}

    def run_one(X, m, yy, k, Vb):
        return mcem_run(params, X, m, yy, k, cfg,
                        update_nmf=update_nmf, Vb_fixed=Vb)

    if Vb_fixed is None:
        return jax.vmap(lambda X, m, yy, k: run_one(X, m, yy, k, None))(
            X_abs2, mask, y, keys
        )
    return jax.vmap(run_one)(X_abs2, mask, y, keys, Vb_fixed)
