"""PEEM — point-estimate EM enhancement (gradient E-step, no sampling).

The reference's M-step carries an explicit compatibility branch for "the
PEEM algorithm only, where there is no sampling of the latent variables"
(reference mcem.py:93-101, the rem_dim singleton handling), following
"A Statistically Principled and Computationally Efficient Approach to
Speech Enhancement using Variational Autoencoders" (arXiv:1905.01209):
instead of Metropolis-Hastings posterior draws, the E-step performs a few
gradient-ascent steps on the latent MAP objective

    J(Z) = sum_f [ log Vx + |X|^2 / Vx ] + 0.5 ||Z||^2,
    Vx = g * Vs(Z) + Vb,

and the M-step runs the same multiplicative NMF updates with the single
point estimate (R=1). On TPU the E-step is pure autodiff through the
decoder — one fused backward matmul chain per gradient step — making PEEM
~5-8x cheaper than MCEM per EM iteration.
"""

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from .engine import (
    VX_FLOOR,
    framewise_uniform,
    nmf_m_step,
    _precompute_label_proj,
    _decode_cond,
    _masked_cost,
)
from ..models.nets import encoder_apply


@dataclass(frozen=True)
class PEEMConfig:
    """PEEM hyper-parameters (arXiv:1905.01209 uses L-BFGS-ish inner
    optimization; a few fixed-rate gradient steps behave equivalently on
    the frame-wise FFNN decoder and map better to lax.scan)."""

    niter: int = 50
    e_steps: int = 5
    lr: float = 5e-3
    nmf_rank: int = 10
    eps: float = 1e-8
    # Fixed-noise models only: per-frame noise gain b (Vb = b * Vb_fixed),
    # updated in the M-step like g — see MCEMConfig.noise_gain.
    noise_gain: bool = False
    # spectral resolution of the gain (see MCEMConfig.noise_gain_bands;
    # 2-3 log-spaced bands is the measured impulsive-noise sweet spot)
    noise_gain_bands: int = 1


def _map_objective(dec_params, y_pre, X_abs2, Vb, g, Z, mask):
    """Negative log posterior (up to constants), summed over valid
    frames."""
    Vs = _decode_cond(dec_params, y_pre, Z)
    Vx = jnp.maximum(g * Vs + Vb, VX_FLOOR)
    nll = jnp.sum((jnp.log(Vx) + X_abs2 / Vx) * mask)
    prior = 0.5 * jnp.sum((Z * Z) * mask)
    return nll + prior


def peem_run(vae_params, X_abs2, mask, y, key, cfg: PEEMConfig = PEEMConfig(),
             update_nmf=True, Vb_fixed=None):
    """Run PEEM on one utterance; same contract as engine.mcem_run (key is
    only used for the NMF init — the E-step is deterministic)."""
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

    grad_fn = jax.grad(
        lambda Z, Vb, g: _map_objective(
            dec_params, y_pre, X_abs2, Vb, g, Z, mask
        )
    )

    use_b = cfg.noise_gain and not update_nmf
    if cfg.noise_gain and update_nmf:
        raise ValueError(
            "PEEMConfig.noise_gain requires a fixed noise model "
            "(update_nmf=False, i.e. noise_model 'spp'/'spp2')")

    if use_b:
        # per-frame (or per-band) noise gain (see MCEMConfig.noise_gain):
        # Vb = b * Vb_fixed, b updated by nmf_m_step's gradient-split rule
        from .engine import noise_gain_state

        b, eff_vb, band_map = noise_gain_state(
            F, N, cfg.noise_gain_bands, Vb_fixed, X_abs2.dtype)

        def em_iter_b(carry, _):
            W, H, g, b, Z = carry
            Vb = eff_vb(b)

            def e_step(Z, _):
                return Z - cfg.lr * grad_fn(Z, Vb, g), None

            Z, _ = lax.scan(e_step, Z, None, length=cfg.e_steps)
            Vs = _decode_cond(dec_params, y_pre, Z)[None]
            W2, H2, g2, b2 = nmf_m_step(X_abs2, mask, W, H, g, Vs,
                                        update_nmf=False,
                                        Vb_fixed=Vb_fixed, b=b,
                                        band_map=band_map)
            cost = _masked_cost(X_abs2, mask, eff_vb(b2), g2, Vs)
            return (W2, H2, g2, b2, Z), cost

        (W, H, g, b, Z), cost = lax.scan(em_iter_b, (W, H, g, b, Z), None,
                                         length=cfg.niter)
        Vb = eff_vb(b)
        Vs = _decode_cond(dec_params, y_pre, Z)
        Vx = jnp.maximum(g * Vs + Vb, VX_FLOOR)
        return {"WFs": (g * Vs) / Vx, "WFn": Vb / Vx, "cost": cost,
                "W": W, "H": H, "g": g, "b": b, "Z": Z}

    def em_iter(carry, _):
        W, H, g, Z = carry
        Vb = (W @ H) if update_nmf else Vb_fixed

        def e_step(Z, _):
            return Z - cfg.lr * grad_fn(Z, Vb, g), None

        Z, _ = lax.scan(e_step, Z, None, length=cfg.e_steps)
        Vs = _decode_cond(dec_params, y_pre, Z)[None]  # (1, F, N)
        W2, H2, g2 = nmf_m_step(X_abs2, mask, W, H, g, Vs,
                                update_nmf=update_nmf, Vb_fixed=Vb_fixed)
        Vb2 = (W2 @ H2) if update_nmf else Vb_fixed
        cost = _masked_cost(X_abs2, mask, Vb2, g2, Vs)
        return (W2, H2, g2, Z), cost

    (W, H, g, Z), cost = lax.scan(em_iter, (W, H, g, Z), None,
                                  length=cfg.niter)

    Vb = (W @ H) if update_nmf else Vb_fixed
    Vs = _decode_cond(dec_params, y_pre, Z)
    Vx = jnp.maximum(g * Vs + Vb, VX_FLOOR)
    WFs = (g * Vs) / Vx
    WFn = Vb / Vx
    return {"WFs": WFs, "WFn": WFn, "cost": cost, "W": W, "H": H, "g": g,
            "Z": Z}


@partial(jax.jit, static_argnames=("cfg", "update_nmf"))
def peem_m1_batch(vae_params, X_abs2, mask, keys, cfg: PEEMConfig,
                  update_nmf=True, Vb_fixed=None):
    def one(X, m, k, Vb):
        return peem_run(vae_params, X, m, None, k, cfg,
                        update_nmf=update_nmf, Vb_fixed=Vb)

    if Vb_fixed is None:
        return jax.vmap(lambda X, m, k: one(X, m, k, None))(
            X_abs2, mask, keys
        )
    return jax.vmap(one)(X_abs2, mask, keys, Vb_fixed)


@partial(jax.jit, static_argnames=("cfg", "update_nmf"))
def peem_m2_batch(dgm_params, X_abs2, mask, y, keys, cfg: PEEMConfig,
                  update_nmf=True, Vb_fixed=None):
    params = {k: v for k, v in dgm_params.items() if k != "y_dim"}

    def one(X, m, yy, k, Vb):
        return peem_run(params, X, m, yy, k, cfg,
                        update_nmf=update_nmf, Vb_fixed=Vb)

    if Vb_fixed is None:
        return jax.vmap(lambda X, m, yy, k: one(X, m, yy, k, None))(
            X_abs2, mask, y, keys
        )
    return jax.vmap(one)(X_abs2, mask, y, keys, Vb_fixed)


@dataclass(frozen=True)
class HybridConfig:
    """PEEM->MCEM hybrid: deterministic gradient EM for `niter`
    iterations, then `refine` warm-started MCEM sampling iterations +
    the sampled Wiener filter. The 162x-realtime operating point at the
    paper's 500-iteration config (VALIDATION.md paper-config table);
    select with --algorithm hybrid on the evaluate CLIs."""

    niter: int = 500                 # PEEM iterations
    refine: int = 150                # MCEM refinement iterations
    e_steps: int = 5
    lr: float = 5e-3
    nmf_rank: int = 10
    eps: float = 1e-8
    nsamples_E_step: int = 10
    burnin_E_step: int = 30
    nsamples_WF: int = 25
    burnin_WF: int = 75
    var_RW: float = 0.01

    def split(self):
        from .engine import MCEMConfig

        pcfg = PEEMConfig(niter=self.niter, e_steps=self.e_steps,
                          lr=self.lr, nmf_rank=self.nmf_rank,
                          eps=self.eps)
        mcfg = MCEMConfig(niter=self.refine,
                          nsamples_E_step=self.nsamples_E_step,
                          burnin_E_step=self.burnin_E_step,
                          nsamples_WF=self.nsamples_WF,
                          burnin_WF=self.burnin_WF, var_RW=self.var_RW,
                          nmf_rank=self.nmf_rank, eps=self.eps)
        return pcfg, mcfg


def peem_mcem_m2_batch(dgm_params, X_abs2, mask, y, keys,
                       pcfg: PEEMConfig, mcfg, update_nmf=True,
                       Vb_fixed=None, use_fused=True, **fused_kw):
    """PEEM warm start + short fused-MCEM refinement (the paper-config
    fast mode): run the deterministic gradient EM for pcfg.niter
    iterations, then hand its (W, H, g, Z) state to the fused Pallas MCEM
    for mcfg.niter sampling iterations and the sampled Wiener filter.
    y=None runs the label-free M1 family.

    Rationale: at the paper's 500-iteration budget (reference
    evaluate_M1.py:92) the MH chain spends most iterations converging
    NMF/Z — work the point-estimate E-step does ~8x cheaper — while the
    final posterior-averaged Wiener filter (what MCEM actually
    contributes over PEEM) only needs a short warm-started chain.
    Quality harness: scripts/bench_niter500.py --hybrid.
    """
    from .pallas_engine import mcem_batch_fused

    if y is None:
        r = peem_m1_batch(dgm_params, X_abs2, mask, keys, pcfg,
                          update_nmf=update_nmf, Vb_fixed=Vb_fixed)
    else:
        r = peem_m2_batch(dgm_params, X_abs2, mask, y, keys, pcfg,
                          update_nmf=update_nmf, Vb_fixed=Vb_fixed)
    keys_m = jax.vmap(lambda k: jax.random.fold_in(k, 7331))(keys)
    if use_fused:
        init = {"W": r["W"], "H": r["H"], "g": r["g"], "Z": r["Z"]}
        out = mcem_batch_fused(dgm_params, X_abs2, mask, y, keys_m, mcfg,
                               init=init, update_nmf=update_nmf,
                               Vb_fixed=Vb_fixed, **fused_kw)
    else:
        # XLA-scan refinement (CPU / portable path): the Pallas
        # interpreter's PRNG is a stub, so the fused chain would run with
        # meaningless MH randomness off-accelerator (pipeline._use_fused
        # makes the same call for plain MCEM)
        from .engine import mcem_run

        params = {k: v for k, v in dgm_params.items() if k != "y_dim"}

        def one(X, m, yy, k, W, H, g, Z, Vb):
            return mcem_run(params, X, m, yy, k, mcfg,
                            update_nmf=update_nmf, Vb_fixed=Vb,
                            init_nmf=(W, H, g), init_Z=Z)

        args = (X_abs2, mask, y, keys_m, r["W"], r["H"], r["g"], r["Z"])
        if y is None:
            def one_m1(X, m, k, W, H, g, Z, Vb):
                return one(X, m, None, k, W, H, g, Z, Vb)

            args = (X_abs2, mask, keys_m, r["W"], r["H"], r["g"], r["Z"])
            if Vb_fixed is None:
                out = jax.vmap(
                    lambda *a: one_m1(*a, None))(*args)
            else:
                out = jax.vmap(one_m1)(*args, Vb_fixed)
        elif Vb_fixed is None:
            out = jax.vmap(lambda *a: one(*a, None))(*args)
        else:
            out = jax.vmap(one)(*args, Vb_fixed)
    out["cost"] = jnp.concatenate([r["cost"], out["cost"]], axis=-1)
    return out
