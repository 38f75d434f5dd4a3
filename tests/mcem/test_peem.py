"""PEEM (point-estimate EM) tests: deterministic E-step, cost descent,
Wiener-filter partition, batched variants."""

import numpy as np
import jax
import jax.numpy as jnp
from numpy.testing import assert_allclose, assert_array_equal

from guided_vae_nmf_tpu.models import vae_init, dgm_init
from guided_vae_nmf_tpu.mcem import (
    PEEMConfig,
    peem_run,
    peem_m1_batch,
    peem_m2_batch,
)

F, N, L = 33, 24, 4
CFG = PEEMConfig(niter=8, e_steps=3, nmf_rank=3)
KEY = jax.random.PRNGKey(0)


def test_peem_m1_cost_descends():
    vae = vae_init(KEY, [F, L, [16]])
    X = jax.random.uniform(KEY, (F, N)) + 0.05
    out = peem_run(vae, X, jnp.ones((N,)), None, jax.random.PRNGKey(1), CFG)
    cost = np.asarray(out["cost"])
    assert np.all(np.isfinite(cost))
    assert cost[-1] < cost[0]
    assert_allclose(np.asarray(out["WFs"] + out["WFn"]), 1.0, atol=1e-5)


def test_peem_deterministic_given_key():
    vae = vae_init(KEY, [F, L, [16]])
    X = jax.random.uniform(KEY, (F, N)) + 0.05
    a = peem_run(vae, X, jnp.ones((N,)), None, jax.random.PRNGKey(3), CFG)
    b = peem_run(vae, X, jnp.ones((N,)), None, jax.random.PRNGKey(3), CFG)
    assert_array_equal(np.asarray(a["WFs"]), np.asarray(b["WFs"]))


def test_peem_m2_batched():
    y_dim = 6
    dgm = dgm_init(KEY, [F, y_dim, L, [16]])
    B = 3
    X = jax.random.uniform(KEY, (B, F, N)) + 0.05
    y = (jax.random.uniform(jax.random.PRNGKey(2), (B, y_dim, N)) > 0.5)
    y = y.astype(jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(4), B)
    out = peem_m2_batch(dgm, X, jnp.ones((B, N)), y, keys, CFG)
    assert out["WFs"].shape == (B, F, N)
    assert np.all(np.isfinite(np.asarray(out["WFs"])))
    c = np.asarray(out["cost"])
    assert np.all(c[:, -1] < c[:, 0])


def test_peem_m1_batched_matches_single():
    vae = vae_init(KEY, [F, L, [16]])
    B = 2
    X = jax.random.uniform(KEY, (B, F, N)) + 0.05
    keys = jax.random.split(jax.random.PRNGKey(5), B)
    batched = peem_m1_batch(vae, X, jnp.ones((B, N)), keys, CFG)
    single = peem_run(vae, X[0], jnp.ones((N,)), None, keys[0], CFG)
    assert_allclose(np.asarray(batched["WFs"][0]),
                    np.asarray(single["WFs"]), atol=1e-6)


def test_peem_mcem_hybrid_batch():
    """PEEM->MCEM hybrid (paper-config fast mode): warm-started fused
    refinement returns valid Wiener filters, concatenates the cost
    trajectories, and equals mcem_batch_fused called manually with PEEM's
    final state as `init`."""
    from guided_vae_nmf_tpu.mcem import (
        MCEMConfig, peem_mcem_m2_batch, mcem_batch_fused,
    )

    B, Ff, Nn, ydim = 2, 65, 128, 10
    dgm = dgm_init(KEY, [Ff, ydim, 8, [16, 16]])
    X = jax.random.uniform(jax.random.PRNGKey(7), (B, Ff, Nn)) + 0.05
    y = (jax.random.uniform(jax.random.PRNGKey(8), (B, ydim, Nn)) > 0.5)
    y = y.astype(jnp.float32)
    mask = jnp.ones((B, Nn))
    keys = jax.random.split(jax.random.PRNGKey(9), B)
    pcfg = PEEMConfig(niter=4, e_steps=2, nmf_rank=3)
    mcfg = MCEMConfig(niter=2, nsamples_E_step=2, burnin_E_step=1,
                      nsamples_WF=2, burnin_WF=1, nmf_rank=3)
    out = peem_mcem_m2_batch(dgm, X, mask, y, keys, pcfg, mcfg)
    assert out["WFs"].shape == (B, Ff, Nn)
    assert np.all(np.isfinite(np.asarray(out["WFs"])))
    assert_allclose(np.asarray(out["WFs"] + out["WFn"]), 1.0, atol=1e-4)
    assert out["cost"].shape == (B, pcfg.niter + mcfg.niter)

    r = peem_m2_batch(dgm, X, mask, y, keys, pcfg)
    keys_m = jax.vmap(lambda k: jax.random.fold_in(k, 7331))(keys)
    ref = mcem_batch_fused(
        dgm, X, mask, y, keys_m, mcfg,
        init={"W": r["W"], "H": r["H"], "g": r["g"], "Z": r["Z"]})
    assert_array_equal(np.asarray(out["WFs"]), np.asarray(ref["WFs"]))


def test_hybrid_xla_refinement_has_real_randomness():
    """Round-3 review fix: on CPU the hybrid must refine on the XLA
    engine (use_fused=False) — the Pallas interpreter's PRNG is a stub,
    which (with the warm start removing the random NMF init) would make
    every seed produce the identical chain. The XLA path must be
    seed-sensitive and replayable."""
    from guided_vae_nmf_tpu.mcem import (
        MCEMConfig, peem_mcem_m2_batch,
    )

    B, Ff, Nn, ydim = 2, 65, 128, 10
    dgm = dgm_init(KEY, [Ff, ydim, 8, [16, 16]])
    X = jax.random.uniform(jax.random.PRNGKey(7), (B, Ff, Nn)) + 0.05
    y = (jax.random.uniform(jax.random.PRNGKey(8), (B, ydim, Nn)) > 0.5)
    y = y.astype(jnp.float32)
    mask = jnp.ones((B, Nn))
    pcfg = PEEMConfig(niter=3, e_steps=2, nmf_rank=3)
    mcfg = MCEMConfig(niter=2, nsamples_E_step=2, burnin_E_step=1,
                      nsamples_WF=2, burnin_WF=1, nmf_rank=3)

    def run(seed):
        keys = jax.random.split(jax.random.PRNGKey(seed), B)
        return np.asarray(peem_mcem_m2_batch(
            dgm, X, mask, y, keys, pcfg, mcfg, use_fused=False)["WFs"])

    a, b, a2 = run(0), run(1), run(0)
    assert np.array_equal(a, a2)            # replayable
    assert np.abs(a - b).max() > 1e-6       # seed-sensitive (real RNG)
    assert np.all(np.isfinite(a))


def test_peem_noise_gain():
    """PEEMConfig.noise_gain: b rises on impulsive frames, cost descends,
    and update_nmf=True is rejected (same contract as the MCEM engine)."""
    import pytest

    vae = vae_init(KEY, [F, L, [16]])
    X = jax.random.uniform(jax.random.PRNGKey(5), (F, N)) + 0.05
    X = X.at[:, 8:10].mul(80.0)
    Vb = jnp.ones((F, N)) * 0.4
    cfg = PEEMConfig(niter=8, e_steps=3, noise_gain=True)
    out = peem_run(vae, X, jnp.ones((N,)), None, jax.random.PRNGKey(1),
                   cfg, update_nmf=False, Vb_fixed=Vb)
    b = np.asarray(out["b"])
    assert b.shape == (N,) and np.all(np.isfinite(b)) and np.all(b > 0)
    assert b[8:10].mean() > 5.0 * np.delete(b, [8, 9]).mean()
    cost = np.asarray(out["cost"])
    assert cost[-1] < cost[0]
    assert_allclose(np.asarray(out["WFs"] + out["WFn"]), 1.0, atol=1e-5)
    with pytest.raises(ValueError, match="noise_gain"):
        peem_run(vae, X, jnp.ones((N,)), None, jax.random.PRNGKey(1), cfg,
                 update_nmf=True)


def test_peem_noise_gain_bands_localize_spectrally():
    """PEEMConfig.noise_gain_bands > 1: the (n_bands, N) gain must rise
    only in the band x frame cells holding a burst (same contract as the
    MCEM engine's per-band gain); cost descends; WF partitions."""
    vae = vae_init(KEY, [F, L, [16]])
    X = jax.random.uniform(jax.random.PRNGKey(5), (F, N)) + 0.05
    X = X.at[:6, 8:11].mul(100.0)           # low-band burst
    Vb = jnp.ones((F, N)) * 0.5
    cfg = PEEMConfig(niter=8, e_steps=3, noise_gain=True,
                     noise_gain_bands=6)
    out = peem_run(vae, X, jnp.ones((N,)), None, jax.random.PRNGKey(1),
                   cfg, update_nmf=False, Vb_fixed=Vb)
    b = np.asarray(out["b"])
    assert b.shape == (6, N) and np.all(np.isfinite(b)) and np.all(b > 0)
    assert b[:2, 8:11].mean() > 5.0 * b[3:, :].mean()
    cost = np.asarray(out["cost"])
    assert cost[-1] <= cost[0]
    assert_allclose(np.asarray(out["WFs"] + out["WFn"]), 1.0, atol=1e-5)
