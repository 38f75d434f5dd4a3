"""Deterministic-replay tests (SURVEY §7.10): identical PRNG keys must
reproduce identical enhancement results; different keys must differ (the
randomness is real, not frozen). Plus the early-stopping engine variant
(the legacy reference engine's run(tol), mcem_julius.py:106-108)."""

import numpy as np
import jax
import jax.numpy as jnp
from numpy.testing import assert_array_equal, assert_allclose

from guided_vae_nmf_tpu.models import vae_init, dgm_init
from guided_vae_nmf_tpu.mcem import (
    MCEMConfig,
    mcem_run,
    mcem_run_converged,
    mcem_m2_batch,
)

F, N, L = 33, 20, 4
CFG = MCEMConfig(niter=3, nsamples_E_step=2, burnin_E_step=2, nsamples_WF=2,
                 burnin_WF=2, nmf_rank=3)


def _problem():
    vae = vae_init(jax.random.PRNGKey(0), [F, L, [16]])
    X = jax.random.uniform(jax.random.PRNGKey(1), (F, N)) + 0.05
    return vae, X, jnp.ones((N,))


def test_same_key_reproduces_bitwise():
    vae, X, mask = _problem()
    a = mcem_run(vae, X, mask, None, jax.random.PRNGKey(7), CFG)
    b = mcem_run(vae, X, mask, None, jax.random.PRNGKey(7), CFG)
    assert_array_equal(np.asarray(a["WFs"]), np.asarray(b["WFs"]))
    assert_array_equal(np.asarray(a["cost"]), np.asarray(b["cost"]))


def test_different_keys_differ():
    vae, X, mask = _problem()
    a = mcem_run(vae, X, mask, None, jax.random.PRNGKey(7), CFG)
    b = mcem_run(vae, X, mask, None, jax.random.PRNGKey(8), CFG)
    assert not np.allclose(np.asarray(a["WFs"]), np.asarray(b["WFs"]))


def test_batch_determinism():
    y_dim = 5
    dgm = dgm_init(jax.random.PRNGKey(0), [F, y_dim, L, [16]])
    B = 3
    X = jax.random.uniform(jax.random.PRNGKey(1), (B, F, N)) + 0.05
    y = (jax.random.uniform(jax.random.PRNGKey(2), (B, y_dim, N)) > 0.5)
    y = y.astype(jnp.float32)
    mask = jnp.ones((B, N))
    keys = jax.random.split(jax.random.PRNGKey(3), B)
    a = mcem_m2_batch(dgm, X, mask, y, keys, CFG)
    b = mcem_m2_batch(dgm, X, mask, y, keys, CFG)
    assert_array_equal(np.asarray(a["WFs"]), np.asarray(b["WFs"]))


def test_early_stopping_engine_m2():
    y_dim = 5
    dgm = dgm_init(jax.random.PRNGKey(0), [F, y_dim, L, [16]])
    X = jax.random.uniform(jax.random.PRNGKey(1), (F, N)) + 0.05
    y = (jax.random.uniform(jax.random.PRNGKey(2), (y_dim, N)) > 0.5)
    y = y.astype(jnp.float32)
    cfg = MCEMConfig(niter=20, nsamples_E_step=2, burnin_E_step=2,
                     nsamples_WF=2, burnin_WF=2, nmf_rank=3)
    out = mcem_run_converged(dgm, X, jnp.ones((N,)), y,
                             jax.random.PRNGKey(6), cfg, tol=1e-3,
                             check_every=5)
    assert np.all(np.isfinite(np.asarray(out["WFs"])))
    assert out["iters"] <= cfg.niter


def test_early_stopping_engine():
    vae, X, mask = _problem()
    cfg = MCEMConfig(niter=40, nsamples_E_step=2, burnin_E_step=2,
                     nsamples_WF=2, burnin_WF=2, nmf_rank=3)
    out = mcem_run_converged(vae, X, mask, None, jax.random.PRNGKey(5),
                             cfg, tol=1e-3, check_every=5)
    # converged before the budget on this toy problem
    assert out["iters"] <= cfg.niter
    assert out["cost"].shape[0] == out["iters"]
    assert np.all(np.isfinite(np.asarray(out["WFs"])))
    assert_allclose(np.asarray(out["WFs"] + out["WFn"]), 1.0, atol=1e-5)
    # a tighter tolerance runs at least as long
    out2 = mcem_run_converged(vae, X, mask, None, jax.random.PRNGKey(5),
                              cfg, tol=1e-9, check_every=5)
    assert out2["iters"] >= out["iters"]


def test_converged_batch_matches_single_runs():
    """Batched tol-stop engine: per-utterance convergence masks freeze
    finished rows while stragglers iterate, and every row's result
    matches the single-utterance engine for the same key — including the
    per-row iteration counts (the histogram differs across rows)."""
    from guided_vae_nmf_tpu.mcem import mcem_run_converged_batch

    y_dim = 5
    dgm = dgm_init(jax.random.PRNGKey(0), [F, y_dim, L, [16]])
    B = 4
    # heterogeneous difficulty: scale rows so convergence times differ
    X = jax.random.uniform(jax.random.PRNGKey(1), (B, F, N)) + 0.05
    X = X * jnp.asarray([1.0, 5.0, 0.3, 12.0])[:, None, None]
    y = (jax.random.uniform(jax.random.PRNGKey(2), (B, y_dim, N)) > 0.5)
    y = y.astype(jnp.float32)
    mask = jnp.ones((B, N))
    keys = jax.random.split(jax.random.PRNGKey(9), B)
    cfg = MCEMConfig(niter=40, nsamples_E_step=2, burnin_E_step=2,
                     nsamples_WF=2, burnin_WF=2, nmf_rank=3)

    # tol chosen so the four rows stop at distinct chunks (decision
    # margins >= 9e-4, far above the ~1e-7 vmap-vs-single numeric noise)
    out = mcem_run_converged_batch(dgm, X, mask, y, keys, cfg,
                                   tol=8e-3, check_every=5)
    iters = np.asarray(out["iters"])
    assert iters.shape == (B,)

    singles = [
        mcem_run_converged(dgm, X[b], mask[b], y[b], keys[b], cfg,
                           tol=8e-3, check_every=5)
        for b in range(B)
    ]
    # iteration-count histogram: each row stops exactly where its single
    # run does
    assert [int(s["iters"]) for s in singles] == list(iters)
    # rows genuinely differ (frozen rows waited on stragglers)
    assert len(set(iters.tolist())) > 1
    for b, s in enumerate(singles):
        n_it = int(iters[b])
        assert_allclose(np.asarray(out["cost"][b, :n_it]),
                        np.asarray(s["cost"]), rtol=2e-5, atol=1e-4)
        # cost entries past the executed iterations stay zero
        assert np.all(np.asarray(out["cost"][b, n_it:]) == 0.0)
        assert_allclose(np.asarray(out["WFs"][b]),
                        np.asarray(s["WFs"]), rtol=2e-4, atol=2e-5)
        assert_allclose(np.asarray(out["WFn"][b]),
                        np.asarray(s["WFn"]), rtol=2e-4, atol=2e-5)


def test_converged_batch_m1():
    from guided_vae_nmf_tpu.mcem import mcem_run_converged_batch

    vae, X1, _ = _problem()
    B = 2
    X = jnp.stack([X1, X1 * 3.0])
    mask = jnp.ones((B, N))
    keys = jax.random.split(jax.random.PRNGKey(4), B)
    cfg = MCEMConfig(niter=20, nsamples_E_step=2, burnin_E_step=2,
                     nsamples_WF=2, burnin_WF=2, nmf_rank=3)
    out = mcem_run_converged_batch(vae, X, mask, None, keys, cfg,
                                   tol=1e-3, check_every=5)
    assert np.all(np.isfinite(np.asarray(out["WFs"])))
    assert_allclose(np.asarray(out["WFs"] + out["WFn"]), 1.0, atol=1e-5)
    for b in range(B):
        s = mcem_run_converged(vae, X[b], mask[b], None, keys[b], cfg,
                               tol=1e-3, check_every=5)
        assert int(s["iters"]) == int(out["iters"][b])
        assert_allclose(np.asarray(out["WFs"][b]), np.asarray(s["WFs"]),
                        rtol=2e-4, atol=2e-5)


def _spp_problem(B=None):
    """Fixed-noise M2 problem for the noise_gain tol-stop tests."""
    y_dim = 5
    dgm = dgm_init(jax.random.PRNGKey(0), [F, y_dim, L, [16]])
    shape = (F, N) if B is None else (B, F, N)
    X = jax.random.uniform(jax.random.PRNGKey(1), shape) + 0.05
    y = (jax.random.uniform(jax.random.PRNGKey(2),
                            shape[:-2] + (y_dim, N)) > 0.5)
    Vb = jax.random.uniform(jax.random.PRNGKey(3), shape) * 0.2 + 0.02
    return dgm, X, y.astype(jnp.float32), Vb


def test_converged_noise_gain_matches_fixed_budget():
    """noise_gain through the tol-stop engine (the round-3 capability x
    engine hole): with a tol that never fires, the chunked engine must
    reproduce mcem_run's noise_gain trajectory for the same key, and the
    per-frame gain b must come back adapted."""
    dgm, X, y, Vb = _spp_problem()
    mask = jnp.ones((N,))
    cfg = MCEMConfig(niter=10, nsamples_E_step=2, burnin_E_step=2,
                     nsamples_WF=2, burnin_WF=2, noise_gain=True)
    key = jax.random.PRNGKey(11)
    ref = mcem_run(dgm, X, mask, y, key, cfg, update_nmf=False,
                   Vb_fixed=Vb)
    out = mcem_run_converged(dgm, X, mask, y, key, cfg, tol=-1.0,
                             check_every=5, update_nmf=False, Vb_fixed=Vb)
    assert out["iters"] == cfg.niter
    assert out["b"].shape == (N,)
    assert not np.allclose(np.asarray(out["b"]), 1.0)
    assert_allclose(np.asarray(out["WFs"]), np.asarray(ref["WFs"]),
                    rtol=2e-4, atol=2e-5)
    assert_allclose(np.asarray(out["b"]), np.asarray(ref["b"]),
                    rtol=2e-4, atol=2e-5)
    assert_allclose(np.asarray(out["cost"]), np.asarray(ref["cost"]),
                    rtol=2e-5, atol=1e-4)


def test_converged_noise_gain_early_stop_and_bands():
    """tol-stop + noise_gain_bands > 1: a loose tol stops early and the
    banded gain has the (n_bands, N) layout."""
    dgm, X, y, Vb = _spp_problem()
    mask = jnp.ones((N,))
    cfg = MCEMConfig(niter=40, nsamples_E_step=2, burnin_E_step=2,
                     nsamples_WF=2, burnin_WF=2, noise_gain=True,
                     noise_gain_bands=4)
    out = mcem_run_converged(dgm, X, mask, y, jax.random.PRNGKey(12), cfg,
                             tol=1e-2, check_every=5, update_nmf=False,
                             Vb_fixed=Vb)
    assert out["b"].shape == (4, N)
    assert out["iters"] <= cfg.niter
    assert np.all(np.isfinite(np.asarray(out["WFs"])))
    assert_allclose(np.asarray(out["WFs"] + out["WFn"]), 1.0, atol=1e-5)


def test_converged_batch_noise_gain_matches_single():
    """Batched tol-stop + noise_gain: per-row freeze semantics hold with
    the extra gain state — each row matches its single-utterance run."""
    from guided_vae_nmf_tpu.mcem import mcem_run_converged_batch

    B = 3
    dgm, X, y, Vb = _spp_problem(B)
    X = X * jnp.asarray([1.0, 6.0, 0.3])[:, None, None]
    mask = jnp.ones((B, N))
    keys = jax.random.split(jax.random.PRNGKey(13), B)
    cfg = MCEMConfig(niter=30, nsamples_E_step=2, burnin_E_step=2,
                     nsamples_WF=2, burnin_WF=2, noise_gain=True,
                     noise_gain_bands=2)
    out = mcem_run_converged_batch(dgm, X, mask, y, keys, cfg, tol=5e-3,
                                   check_every=5, update_nmf=False,
                                   Vb_fixed=Vb)
    assert out["b"].shape == (B, 2, N)
    for b in range(B):
        s = mcem_run_converged(dgm, X[b], mask[b], y[b], keys[b], cfg,
                               tol=5e-3, check_every=5, update_nmf=False,
                               Vb_fixed=Vb[b])
        assert int(s["iters"]) == int(out["iters"][b])
        assert_allclose(np.asarray(out["WFs"][b]), np.asarray(s["WFs"]),
                        rtol=2e-4, atol=2e-5)
        assert_allclose(np.asarray(out["b"][b]), np.asarray(s["b"]),
                        rtol=2e-4, atol=2e-5)
