"""Fused Pallas MH-chain kernel tests.

On the CPU backend the kernel runs through the Pallas interpreter whose
PRNG is a stub, so the deterministic var_RW=0 paths are checked directly
(proposal == current => every update equation must reproduce the direct
decoder computation bit-for-bit) and the var_RW>0 stochastic paths are
checked via the fixed-randomness injection mode: recorded noise streams
fed to both the kernel and the XLA engine must produce the same
trajectories. On-core PRNG statistics are validated on TPU
(VALIDATION.md + bench.py).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from numpy.testing import assert_allclose

from guided_vae_nmf_tpu.models import dgm_init, vae_init
from guided_vae_nmf_tpu.models.nets import decoder_apply
from guided_vae_nmf_tpu.mcem import MCEMConfig, mcem_batch_fused
from guided_vae_nmf_tpu.mcem.pallas_engine import mh_chain_pallas, _dec_parts

B, F, N, L, H = 2, 65, 128, 8, 16
KEY = jax.random.PRNGKey(0)


def _setup(y_dim=10):
    dgm = dgm_init(KEY, [F, y_dim, L, [H, H]])
    dec = dgm["decoder"]
    l0 = dec["hidden"][0]
    y = (jax.random.uniform(jax.random.PRNGKey(4), (B, N, y_dim)) > 0.5)
    y = y.astype(jnp.float32)
    ypre = jnp.einsum("bny,yh->bnh", y, l0["w"][L:]) + l0["b"]
    dec_w = _dec_parts(dec, L)
    X2 = jax.random.uniform(jax.random.PRNGKey(1), (B, N, F)) + 0.05
    Vb = jax.random.uniform(jax.random.PRNGKey(2), (B, N, F)) * 0.1 + 0.01
    g = jnp.ones((B, N))
    Z = jax.random.normal(jax.random.PRNGKey(3), (B, N, L))
    zin = jnp.concatenate([Z, y], axis=-1)
    Vs0 = decoder_apply(dec, zin.reshape(B * N, -1)).reshape(B, N, F)
    seeds = jnp.arange(B * (N // 128), dtype=jnp.int32).reshape(B, -1)
    return dgm, dec_w, X2, Vb, g, ypre, Z, Vs0, seeds


def test_var0_e_mode_deterministic():
    _, dec_w, X2, Vb, g, ypre, Z, Vs0, seeds = _setup()
    Zo, Vso, (samp, s1, s2) = mh_chain_pallas(
        dec_w, X2, Vb, g, ypre, Z, Vs0, seeds, mode="e",
        nsamples=3, burnin=2, var_RW=0.0,
    )
    Vx0 = g[..., None] * Vs0 + Vb
    assert_allclose(np.asarray(Zo), np.asarray(Z), atol=1e-6)
    assert_allclose(np.asarray(Vso), np.asarray(Vs0), atol=1e-4)
    # every post-burnin sample is the (unchanged) current Vs
    assert_allclose(
        np.asarray(samp),
        np.broadcast_to(np.asarray(Vs0)[:, None], samp.shape),
        atol=1e-4,
    )
    # W-update statistics = nsamples * {1/Vx, 1/Vx^2}
    assert_allclose(np.asarray(s1), np.asarray(3.0 / Vx0), rtol=1e-3)
    assert_allclose(np.asarray(s2), np.asarray(3.0 / Vx0**2), rtol=1e-3)


def test_var0_wf_mode_deterministic():
    _, dec_w, X2, Vb, g, ypre, Z, Vs0, seeds = _setup()
    Zo, Vso, (ws, wn) = mh_chain_pallas(
        dec_w, X2, Vb, g, ypre, Z, Vs0, seeds, mode="wf",
        nsamples=4, burnin=3, var_RW=0.0,
    )
    Vx0 = g[..., None] * Vs0 + Vb
    assert_allclose(np.asarray(ws / 4),
                    np.asarray((g[..., None] * Vs0) / Vx0), atol=1e-4)
    assert_allclose(np.asarray(wn / 4), np.asarray(Vb / Vx0), atol=1e-4)
    # Wiener filters partition unity
    assert_allclose(np.asarray((ws + wn) / 4), 1.0, atol=1e-4)


def test_m1_path_no_labels():
    vae = vae_init(KEY, [F, L, [H, H]])
    dec = vae["decoder"]
    dec_w = _dec_parts(dec, L)
    X2 = jax.random.uniform(jax.random.PRNGKey(1), (B, N, F)) + 0.05
    Vb = X2 * 0.1
    g = jnp.ones((B, N))
    Z = jax.random.normal(jax.random.PRNGKey(3), (B, N, L))
    ypre = jnp.broadcast_to(dec["hidden"][0]["b"], (B, N, H))
    Vs0 = decoder_apply(dec, Z.reshape(B * N, L)).reshape(B, N, F)
    seeds = jnp.zeros((B, N // 128), jnp.int32)
    Zo, Vso, _ = mh_chain_pallas(dec_w, X2, Vb, g, ypre, Z, Vs0, seeds,
                                 mode="e", nsamples=2, burnin=1, var_RW=0.0)
    assert_allclose(np.asarray(Vso), np.asarray(Vs0), atol=1e-4)


def test_mcem_batch_fused_end_to_end_shapes():
    dgm, *_ = _setup()
    X = jax.random.uniform(jax.random.PRNGKey(7), (B, F, N)) + 0.05
    y = (jax.random.uniform(jax.random.PRNGKey(8), (B, 10, N)) > 0.5)
    y = y.astype(jnp.float32)
    mask = jnp.ones((B, N))
    keys = jax.random.split(jax.random.PRNGKey(9), B)
    cfg = MCEMConfig(niter=2, nsamples_E_step=2, burnin_E_step=1,
                     nsamples_WF=2, burnin_WF=1, nmf_rank=3)
    out = mcem_batch_fused(dgm, X, mask, y, keys, cfg)
    assert out["WFs"].shape == (B, F, N)
    assert np.all(np.isfinite(np.asarray(out["WFs"])))
    assert_allclose(np.asarray(out["WFs"] + out["WFn"]), 1.0, atol=1e-4)
    assert out["cost"].shape == (B, 2)
    # M1 (label-free) path
    vae = vae_init(KEY, [F, L, [H, H]])
    out = mcem_batch_fused(vae, X, mask, None, keys, cfg)
    assert out["WFs"].shape == (B, F, N)
    assert np.all(np.isfinite(np.asarray(out["WFs"])))


def test_depth_1_and_3_decoders():
    """The fused kernel handles the reference's whole architecture family:
    1 hidden layer (training_M1.py's default) through deeper stacks."""
    for h_stack in ([H], [H, H, H]):
        dgm = dgm_init(KEY, [F, 10, L, h_stack])
        dec = dgm["decoder"]
        y = (jax.random.uniform(jax.random.PRNGKey(4), (B, N, 10)) > 0.5)
        y = y.astype(jnp.float32)
        l0 = dec["hidden"][0]
        ypre = jnp.einsum("bny,yh->bnh", y, l0["w"][L:]) + l0["b"]
        dec_w = _dec_parts(dec, L)
        X2 = jax.random.uniform(jax.random.PRNGKey(1), (B, N, F)) + 0.05
        Vb = X2 * 0.1
        g = jnp.ones((B, N))
        Z = jax.random.normal(jax.random.PRNGKey(3), (B, N, L))
        zin = jnp.concatenate([Z, y], axis=-1)
        Vs0 = decoder_apply(dec, zin.reshape(B * N, -1)).reshape(B, N, F)
        seeds = jnp.zeros((B, N // 128), jnp.int32)
        Zo, Vso, _ = mh_chain_pallas(dec_w, X2, Vb, g, ypre, Z, Vs0, seeds,
                                     mode="e", nsamples=2, burnin=1,
                                     var_RW=0.0)
        assert_allclose(np.asarray(Vso), np.asarray(Vs0), atol=1e-4)
        # full driver too
        mask = jnp.ones((B, N))
        keys = jax.random.split(jax.random.PRNGKey(9), B)
        cfg = MCEMConfig(niter=1, nsamples_E_step=2, burnin_E_step=1,
                         nsamples_WF=2, burnin_WF=1, nmf_rank=3)
        out = mcem_batch_fused(dgm, jnp.swapaxes(X2, 1, 2), mask,
                               jnp.swapaxes(y, 1, 2), keys, cfg)
        assert np.all(np.isfinite(np.asarray(out["WFs"])))


def test_vad_guided_y_dim_1():
    """M2-VAD: a single guidance row (y_dim=1) conditions the decoder."""
    dgm = dgm_init(KEY, [F, 1, L, [H, H]])
    X = jax.random.uniform(jax.random.PRNGKey(7), (B, F, N)) + 0.05
    y = (jax.random.uniform(jax.random.PRNGKey(8), (B, 1, N)) > 0.5)
    y = y.astype(jnp.float32)
    mask = jnp.ones((B, N))
    keys = jax.random.split(jax.random.PRNGKey(9), B)
    cfg = MCEMConfig(niter=2, nsamples_E_step=2, burnin_E_step=1,
                     nsamples_WF=2, burnin_WF=1, nmf_rank=3)
    out = mcem_batch_fused(dgm, X, mask, y, keys, cfg)
    assert np.all(np.isfinite(np.asarray(out["WFs"])))
    # conditioning is live: all-ones vs all-zeros VAD give different filters
    out0 = mcem_batch_fused(dgm, X, mask, jnp.zeros_like(y), keys, cfg)
    assert not np.allclose(np.asarray(out["WFs"]), np.asarray(out0["WFs"]))


def test_bf16_sample_mode_runs():
    dgm, *_ = _setup()
    X = jax.random.uniform(jax.random.PRNGKey(7), (B, F, N)) + 0.05
    y = (jax.random.uniform(jax.random.PRNGKey(8), (B, 10, N)) > 0.5)
    y = y.astype(jnp.float32)
    mask = jnp.ones((B, N))
    keys = jax.random.split(jax.random.PRNGKey(9), B)
    cfg = MCEMConfig(niter=2, nsamples_E_step=2, burnin_E_step=1,
                     nsamples_WF=2, burnin_WF=1, nmf_rank=3)
    out = mcem_batch_fused(dgm, X, mask, y, keys, cfg, compute_cost=False,
                           samples_dtype=jnp.bfloat16)
    assert np.all(np.isfinite(np.asarray(out["WFs"])))


def test_injected_noise_e_mode_matches_xla_engine():
    """Fixed-randomness test mode (SURVEY §7): recorded noise streams fed
    to BOTH engines make the var_RW>0 E-chain trajectories comparable on
    CPU, where the interpreter PRNG is a stub. Validates the stochastic
    kernel math (proposal scaling, accept rule, accumulators) that the
    var_RW=0 tests cannot reach."""
    from guided_vae_nmf_tpu.mcem.engine import mh_sample_posterior

    dgm, dec_w, X2, Vb, g, ypre, Z, Vs0, seeds = _setup()
    nsamples, burnin, var_rw = 3, 2, 0.01
    n_steps = nsamples + burnin
    rng = np.random.RandomState(0)
    Zn = rng.randn(B, n_steps, N, L).astype(np.float32)
    U = rng.uniform(1e-6, 1.0, (B, n_steps, N)).astype(np.float32)

    Zo, Vso, (samp, s1, s2) = mh_chain_pallas(
        dec_w, X2, Vb, g, ypre, Z, Vs0, seeds, mode="e",
        nsamples=nsamples, burnin=burnin, var_RW=var_rw,
        noise=(jnp.asarray(Zn), jnp.asarray(U)),
    )

    dec = dgm["decoder"]
    for b in range(B):
        # engine layout is (F, N)/(L, N); kernel is frames-major
        noise_b = (jnp.asarray(Zn[b].transpose(0, 2, 1)),
                   jnp.asarray(U[b]))
        Ze, Vse, _, buf = mh_sample_posterior(
            dec, ypre[b], X2[b].T, Vb[b].T, g[b][None], Z[b].T, Vs0[b].T,
            jax.random.PRNGKey(0), nsamples, burnin, var_rw,
            noise=noise_b,
        )
        assert_allclose(np.asarray(Zo[b]), np.asarray(Ze).T, atol=2e-5)
        assert_allclose(np.asarray(Vso[b]), np.asarray(Vse).T, rtol=2e-4)
        # sample buffer: engine (R, F, N) vs kernel (R, N, F)
        assert_allclose(np.asarray(samp[b]),
                        np.asarray(buf).transpose(0, 2, 1), rtol=2e-4)
    # at var_RW=0.01 with these streams some accepts and some rejects must
    # occur, otherwise the test is vacuous
    assert not np.allclose(np.asarray(Zo), np.asarray(Z))


def test_injected_noise_wf_mode_matches_xla_engine():
    from guided_vae_nmf_tpu.mcem.engine import mh_wiener_filter

    dgm, dec_w, X2, Vb, g, ypre, Z, Vs0, seeds = _setup()
    nsamples, burnin, var_rw = 4, 3, 0.01
    n_steps = nsamples + burnin
    rng = np.random.RandomState(1)
    Zn = rng.randn(B, n_steps, N, L).astype(np.float32)
    U = rng.uniform(1e-6, 1.0, (B, n_steps, N)).astype(np.float32)

    Zo, Vso, (ws, wn) = mh_chain_pallas(
        dec_w, X2, Vb, g, ypre, Z, Vs0, seeds, mode="wf",
        nsamples=nsamples, burnin=burnin, var_RW=var_rw,
        noise=(jnp.asarray(Zn), jnp.asarray(U)),
    )
    dec = dgm["decoder"]
    for b in range(B):
        noise_b = (jnp.asarray(Zn[b].transpose(0, 2, 1)),
                   jnp.asarray(U[b]))
        WFs, WFn, Ze, _, _ = mh_wiener_filter(
            dec, ypre[b], X2[b].T, Vb[b].T, g[b][None], Z[b].T, Vs0[b].T,
            jax.random.PRNGKey(0), nsamples, burnin, var_rw,
            noise=noise_b,
        )
        assert_allclose(np.asarray(ws[b] / nsamples), np.asarray(WFs).T,
                        atol=2e-5)
        assert_allclose(np.asarray(wn[b] / nsamples), np.asarray(WFn).T,
                        atol=2e-5)
        assert_allclose(np.asarray(Zo[b]), np.asarray(Ze).T, atol=2e-5)


def test_approx_trans_helpers_accuracy():
    """The fast-mode exp/log replacements (exponent-field bit arithmetic +
    short polynomials) stay within ~f32 roundoff of the natives across
    their kernel operating ranges."""
    from guided_vae_nmf_tpu.mcem.pallas_engine import _fast_exp, _fast_log

    rng = np.random.RandomState(0)
    x = np.concatenate([
        10.0 ** rng.uniform(-30, 30, 50000),     # Vx range above VX_FLOOR
        rng.uniform(6e-8, 1.0, 20000),           # accept-test uniforms
    ]).astype(np.float32)
    got = np.asarray(jax.jit(_fast_log)(x))
    ref = np.log(x.astype(np.float64))
    assert np.abs(got - ref).max() < 1e-5        # abs err in a log-domain sum

    y = rng.uniform(-87.0, 88.0, 50000).astype(np.float32)
    got = np.asarray(jax.jit(_fast_exp)(y))
    ref = np.exp(y.astype(np.float64))
    assert (np.abs(got - ref) / ref).max() < 1e-6


def test_approx_trans_chain_matches_exact():
    """approx_trans swaps the chain's exp/log for the bit-arithmetic
    versions; with identical injected noise streams the trajectory must
    track the exact chain (same accept decisions at these margins, state
    equal to ~1e-4)."""
    _, dec_w, X2, Vb, g, ypre, Z, Vs0, seeds = _setup()
    nsamples, burnin, var_rw = 3, 2, 0.01
    n_steps = nsamples + burnin
    rng = np.random.RandomState(7)
    noise = (jnp.asarray(rng.randn(B, n_steps, N, L).astype(np.float32)),
             jnp.asarray(rng.uniform(1e-6, 1.0, (B, n_steps, N))
                         .astype(np.float32)))

    out = {}
    for approx in (False, True):
        Zo, Vso, (samp, s1, s2) = mh_chain_pallas(
            dec_w, X2, Vb, g, ypre, Z, Vs0, seeds, mode="e",
            nsamples=nsamples, burnin=burnin, var_RW=var_rw,
            approx_trans=approx, noise=noise,
        )
        out[approx] = (Zo, Vso, samp, s1, s2)
    assert not np.allclose(np.asarray(out[False][0]), np.asarray(Z))
    assert_allclose(np.asarray(out[True][0]), np.asarray(out[False][0]),
                    atol=1e-5)
    assert_allclose(np.asarray(out[True][1]), np.asarray(out[False][1]),
                    rtol=1e-4)
    assert_allclose(np.asarray(out[True][2]), np.asarray(out[False][2]),
                    rtol=1e-4)


def test_mcem_batch_fused_approx_trans_runs():
    """Full fused MCEM with the approx-transcendental fast mode: shapes,
    finiteness, and Wiener masks in [0, 1]."""
    dgm = dgm_init(KEY, [F, 10, L, [H, H]])
    X2 = jnp.asarray(
        np.random.RandomState(3).uniform(0.05, 1.0, (B, F, N)), jnp.float32)
    y = (jax.random.uniform(jax.random.PRNGKey(5), (B, 10, N)) > 0.5)
    y = y.astype(jnp.float32)
    mask = jnp.ones((B, N))
    keys = jax.random.split(jax.random.PRNGKey(9), 2)
    res = mcem_batch_fused(
        dgm, X2, mask, y, keys, MCEMConfig(niter=2), approx_trans=True,
        approx_recip=True, samples_dtype=jnp.bfloat16,
    )
    assert res["WFs"].shape == (B, F, N)
    for k in ("WFs", "WFn", "W", "H", "g", "Z"):
        assert np.isfinite(np.asarray(res[k])).all(), k
    assert (np.asarray(res["WFs"]) >= 0).all()
    assert (np.asarray(res["WFs"]) <= 1.0 + 1e-5).all()


def test_noise_gain_fused_matches_xla_var0():
    """Fixed-noise model + per-frame noise gain (MCEMConfig.noise_gain):
    in the var_RW=0 deterministic limit the chains are RNG-free, so the
    fused path's b/g trajectories and Wiener filters must match the XLA
    engine's to float tolerance."""
    from guided_vae_nmf_tpu.mcem import mcem_m2_batch

    dgm, *_ = _setup()
    X = jax.random.uniform(jax.random.PRNGKey(7), (B, F, N)) + 0.05
    X = X.at[:, :, 30:33].mul(50.0)         # impulsive frames
    y = (jax.random.uniform(jax.random.PRNGKey(8), (B, 10, N)) > 0.5)
    y = y.astype(jnp.float32)
    mask = jnp.ones((B, N))
    Vb = jax.random.uniform(jax.random.PRNGKey(5), (B, F, N)) * 0.2 + 0.05
    keys = jax.random.split(jax.random.PRNGKey(9), B)
    cfg = MCEMConfig(niter=3, nsamples_E_step=2, burnin_E_step=1,
                     nsamples_WF=2, burnin_WF=1, var_RW=0.0,
                     noise_gain=True)
    fused = mcem_batch_fused(dgm, X, mask, y, keys, cfg,
                             update_nmf=False, Vb_fixed=Vb)
    xla = mcem_m2_batch(dgm, X, mask, y, keys, cfg,
                        update_nmf=False, Vb_fixed=Vb)
    bf = np.asarray(fused["b"])
    bx = np.asarray(xla["b"])
    assert bf.shape == (B, N)
    assert_allclose(bf, bx, rtol=2e-4)
    assert_allclose(np.asarray(fused["g"]), np.asarray(xla["g"]),
                    rtol=2e-4)
    assert_allclose(np.asarray(fused["WFs"]), np.asarray(xla["WFs"]),
                    rtol=1e-3, atol=1e-5)
    # impulse frames must carry a raised gain in both engines
    assert bf[:, 30:33].mean() > 3.0 * np.delete(bf, range(30, 33),
                                                 axis=1).mean()


def test_noise_gain_bands_fused_matches_xla_var0():
    """Per-band noise gain through the fused path: var_RW=0 trajectories
    must match the XLA engine's (b (B, n_bands, N), band-restricted
    update sums)."""
    from guided_vae_nmf_tpu.mcem import mcem_m2_batch

    dgm, *_ = _setup()
    X = jax.random.uniform(jax.random.PRNGKey(7), (B, F, N)) + 0.05
    X = X.at[:, :8, 30:33].mul(50.0)        # low-band burst
    y = (jax.random.uniform(jax.random.PRNGKey(8), (B, 10, N)) > 0.5)
    y = y.astype(jnp.float32)
    mask = jnp.ones((B, N))
    Vb = jax.random.uniform(jax.random.PRNGKey(5), (B, F, N)) * 0.2 + 0.05
    keys = jax.random.split(jax.random.PRNGKey(9), B)
    cfg = MCEMConfig(niter=3, nsamples_E_step=2, burnin_E_step=1,
                     nsamples_WF=2, burnin_WF=1, var_RW=0.0,
                     noise_gain=True, noise_gain_bands=4)
    fused = mcem_batch_fused(dgm, X, mask, y, keys, cfg,
                             update_nmf=False, Vb_fixed=Vb)
    xla = mcem_m2_batch(dgm, X, mask, y, keys, cfg,
                        update_nmf=False, Vb_fixed=Vb)
    assert fused["b"].shape == (B, 4, N)
    assert_allclose(np.asarray(fused["b"]), np.asarray(xla["b"]),
                    rtol=2e-4)
    assert_allclose(np.asarray(fused["WFs"]), np.asarray(xla["WFs"]),
                    rtol=1e-3, atol=1e-5)
