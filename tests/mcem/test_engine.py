"""MCEM engine tests: smoke/finiteness, masked-padding equivalence of the
NMF M-step, and deterministic M-step parity against the reference torch
implementation (read-only import)."""

import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from numpy.testing import assert_allclose

from guided_vae_nmf_tpu.models import vae_init, dgm_init
from guided_vae_nmf_tpu.mcem import (
    MCEMConfig,
    mcem_run,
    mcem_m1_batch,
    mcem_m2_batch,
    nmf_m_step,
    pad_power,
)

KEY = jax.random.PRNGKey(42)
F, N, L, K, R = 33, 24, 4, 3, 5

SMALL_CFG = MCEMConfig(
    niter=3, nsamples_E_step=4, burnin_E_step=3, nsamples_WF=4, burnin_WF=3,
    var_RW=0.01, nmf_rank=K, eps=1e-8,
)


def _power(key, f=F, n=N):
    return jax.random.uniform(key, (f, n)) * 2.0 + 0.05


def test_mcem_m1_smoke():
    vae = vae_init(KEY, [F, L, [16]])
    X = _power(KEY)
    mask = jnp.ones((N,))
    out = mcem_run(vae, X, mask, None, jax.random.PRNGKey(1), SMALL_CFG)
    for name in ("WFs", "WFn"):
        v = np.asarray(out[name])
        assert v.shape == (F, N)
        assert np.all(np.isfinite(v))
        assert np.all(v >= 0) and np.all(v <= 1.0 + 1e-5)
    assert np.all(np.isfinite(np.asarray(out["cost"])))
    # the EM cost should decrease overall on this toy problem
    cost = np.asarray(out["cost"])
    assert cost[-1] <= cost[0] + 1e-3


def test_mcem_m2_batch_shapes():
    y_dim = 7
    dgm = dgm_init(KEY, [F, y_dim, L, [16]])
    B = 3
    X = jax.random.uniform(KEY, (B, F, N)) + 0.05
    y = (jax.random.uniform(jax.random.PRNGKey(2), (B, y_dim, N)) > 0.5)
    y = y.astype(jnp.float32)
    mask = jnp.ones((B, N))
    keys = jax.random.split(jax.random.PRNGKey(3), B)
    out = mcem_m2_batch(dgm, X, mask, y, keys, SMALL_CFG)
    assert out["WFs"].shape == (B, F, N)
    assert np.all(np.isfinite(np.asarray(out["WFs"])))
    assert out["cost"].shape == (B, SMALL_CFG.niter)


def test_wiener_filters_partition():
    """WFs + WFn = (Vs_scaled + Vb)/Vx averaged = 1 exactly, per sample —
    so the averaged filters must sum to 1."""
    vae = vae_init(KEY, [F, L, [16]])
    X = _power(KEY)
    out = mcem_run(vae, X, jnp.ones((N,)), None, jax.random.PRNGKey(7),
                   SMALL_CFG)
    s = np.asarray(out["WFs"]) + np.asarray(out["WFn"])
    assert_allclose(s, 1.0, atol=1e-5)


def test_m_step_padding_equivalence():
    """Masked M-step on a padded problem == unmasked M-step on the valid
    slice: W identical, H/g identical on valid frames."""
    rng = np.random.RandomState(0)
    X = rng.rand(F, N).astype(np.float32) + 0.05
    W = rng.rand(F, K).astype(np.float32) + 0.1
    H = rng.rand(K, N).astype(np.float32) + 0.1
    g = rng.rand(N).astype(np.float32) + 0.5
    Vs = rng.rand(R, F, N).astype(np.float32) + 0.05

    W1, H1, g1 = nmf_m_step(jnp.asarray(X), jnp.ones((N,)), jnp.asarray(W),
                            jnp.asarray(H), jnp.asarray(g), jnp.asarray(Vs))

    pad = 9
    Xp = np.concatenate([X, np.ones((F, pad), np.float32)], axis=1)
    Hp = np.concatenate([H, rng.rand(K, pad).astype(np.float32) + 0.1], 1)
    gp = np.concatenate([g, np.ones(pad, np.float32)])
    Vsp = np.concatenate([Vs, rng.rand(R, F, pad).astype(np.float32) + 0.05],
                         axis=2)
    mask = np.concatenate([np.ones(N), np.zeros(pad)]).astype(np.float32)

    W2, H2, g2 = nmf_m_step(jnp.asarray(Xp), jnp.asarray(mask),
                            jnp.asarray(W), jnp.asarray(Hp), jnp.asarray(gp),
                            jnp.asarray(Vsp))
    assert_allclose(np.asarray(W2), np.asarray(W1), rtol=2e-5)
    assert_allclose(np.asarray(H2)[:, :N], np.asarray(H1), rtol=2e-4)
    assert_allclose(np.asarray(g2)[:N], np.asarray(g1), rtol=2e-4)
    assert np.all(np.isfinite(np.asarray(H2)))
    assert np.all(np.isfinite(np.asarray(g2)))


def test_pad_power():
    X = np.asarray(_power(KEY))
    Xp, mask = pad_power(jnp.asarray(X), N + 8)
    assert Xp.shape == (F, N + 8)
    assert_allclose(np.asarray(Xp[:, :N]), X)
    assert np.all(np.asarray(Xp[:, N:]) == 1.0)
    assert np.asarray(mask).sum() == N


def _reference_available():
    import os

    try:
        import torch  # noqa: F401
    except ImportError:
        return False
    return os.path.isdir("/root/reference/python")


@pytest.mark.skipif(
    not _reference_available(), reason="reference/torch unavailable"
)
def test_m_step_parity_with_reference():
    """Deterministic parity: given identical (X, W, H, g, Vs samples), our
    nmf_m_step must reproduce the reference EM.M_step (mcem.py:90-152) to
    float32 tolerance."""
    sys.path.insert(0, "/root/reference")
    try:
        import torch
        from python.models.mcem import EM
    finally:
        sys.path.pop(0)

    rng = np.random.RandomState(3)
    X = rng.rand(F, N).astype(np.float32) + 0.05
    W = rng.rand(F, K).astype(np.float32) + 0.1
    H = rng.rand(K, N).astype(np.float32) + 0.1
    g = rng.rand(N).astype(np.float32) + 0.5
    Vs = rng.rand(R, F, N).astype(np.float32) + 0.05

    em = EM(niter=1)
    em.device = "cpu"
    em.X_abs_2 = torch.from_numpy(X.copy())
    em.W = torch.from_numpy(W.copy())
    em.H = torch.from_numpy(H.copy())
    em.g = torch.from_numpy(g.copy())
    em.Vs = torch.from_numpy(Vs.copy())
    em.compute_Vb()
    em.compute_Vs_scaled()
    em.compute_Vx()
    em.M_step()

    W2, H2, g2 = nmf_m_step(jnp.asarray(X), jnp.ones((N,)), jnp.asarray(W),
                            jnp.asarray(H), jnp.asarray(g), jnp.asarray(Vs))
    assert_allclose(np.asarray(W2), em.W.numpy(), rtol=2e-5)
    assert_allclose(np.asarray(H2), em.H.numpy(), rtol=2e-5)
    assert_allclose(np.asarray(g2), em.g.numpy(), rtol=2e-5)


# ---------------------------------------------------------------------------
# Per-frame noise gain (MCEMConfig.noise_gain)
# ---------------------------------------------------------------------------


def test_noise_gain_tracks_impulsive_frames():
    """b must rise on frames whose power exceeds the fixed noise model
    (the impulsive-noise capability) and the EM cost must still descend;
    the flag adds a 'b' key without disturbing the output contract."""
    vae = vae_init(KEY, [F, L, [16]])
    X = _power(jax.random.PRNGKey(7))
    X = X.at[:, 10:13].mul(100.0)          # impulsive burst
    mask = jnp.ones((N,))
    Vb = jnp.ones((F, N)) * 0.5
    cfg = MCEMConfig(
        niter=6, nsamples_E_step=4, burnin_E_step=3, nsamples_WF=4,
        burnin_WF=3, noise_gain=True,
    )
    out = mcem_run(vae, X, mask, None, jax.random.PRNGKey(1), cfg,
                   update_nmf=False, Vb_fixed=Vb)
    b = np.asarray(out["b"])
    assert b.shape == (N,) and np.all(np.isfinite(b)) and np.all(b > 0)
    others = np.delete(b, range(10, 13))
    assert b[10:13].mean() > 10.0 * others.mean()
    cost = np.asarray(out["cost"])
    assert cost[-1] <= cost[0]
    for name in ("WFs", "WFn"):
        v = np.asarray(out[name])
        assert np.all(np.isfinite(v)) and np.all(v >= 0) and np.all(v <= 1 + 1e-5)


def test_noise_gain_off_has_no_b_key():
    """Default config must not grow the output dict (reference-parity
    contract for the *_noNMF variants)."""
    vae = vae_init(KEY, [F, L, [16]])
    X = _power(KEY)
    Vb = jnp.ones((F, N)) * 0.5
    out = mcem_run(vae, X, jnp.ones((N,)), None, jax.random.PRNGKey(1),
                   SMALL_CFG, update_nmf=False, Vb_fixed=Vb)
    assert "b" not in out
    assert not MCEMConfig().noise_gain


def test_noise_gain_requires_fixed_noise_model():
    vae = vae_init(KEY, [F, L, [16]])
    X = _power(KEY)
    cfg = MCEMConfig(niter=2, nsamples_E_step=2, burnin_E_step=2,
                     nsamples_WF=2, burnin_WF=2, noise_gain=True)
    with pytest.raises(ValueError, match="noise_gain"):
        mcem_run(vae, X, jnp.ones((N,)), None, jax.random.PRNGKey(1), cfg,
                 update_nmf=True)


def test_noise_gain_batch_matches_single():
    """mcem_m2_batch(noise_gain) rows equal per-utterance mcem_run with
    the same keys (the vmap wrapper adds nothing)."""
    y_dim = 7
    dgm = dgm_init(KEY, [F, y_dim, L, [16]])
    B = 2
    X = jax.random.uniform(KEY, (B, F, N)) + 0.05
    y = (jax.random.uniform(jax.random.PRNGKey(2), (B, y_dim, N)) > 0.5)
    y = y.astype(jnp.float32)
    mask = jnp.ones((B, N))
    Vb = jnp.ones((B, F, N)) * 0.4
    keys = jax.random.split(jax.random.PRNGKey(3), B)
    cfg = MCEMConfig(niter=3, nsamples_E_step=3, burnin_E_step=2,
                     nsamples_WF=3, burnin_WF=2, noise_gain=True)
    out = mcem_m2_batch(dgm, X, mask, y, keys, cfg,
                        update_nmf=False, Vb_fixed=Vb)
    params = {k: v for k, v in dgm.items() if k != "y_dim"}
    for i in range(B):
        one = mcem_run(params, X[i], mask[i], y[i], keys[i], cfg,
                       update_nmf=False, Vb_fixed=Vb[i])
        assert_allclose(np.asarray(out["b"][i]), np.asarray(one["b"]),
                        rtol=1e-6)
        assert_allclose(np.asarray(out["WFs"][i]), np.asarray(one["WFs"]),
                        rtol=1e-6)


def test_noise_gain_bands_localize_spectrally():
    """noise_gain_bands > 1: the (n_bands, N) gain must rise only in the
    band x frame cells holding a burst; the band map tiles all F bins
    exactly once; cost still descends."""
    from guided_vae_nmf_tpu.mcem.engine import (
        mcem_run, _noise_gain_band_map,
    )

    m = np.asarray(_noise_gain_band_map(F, 6))
    assert m.shape == (6, F)
    assert np.all(m.sum(axis=0) == 1.0)     # every bin in exactly one band

    vae = vae_init(KEY, [F, L, [16]])
    X = _power(jax.random.PRNGKey(11))
    X = X.at[:6, 10:13].mul(100.0)          # low-band burst
    Vb = jnp.ones((F, N)) * 0.5
    cfg = MCEMConfig(niter=6, nsamples_E_step=4, burnin_E_step=3,
                     nsamples_WF=4, burnin_WF=3, noise_gain=True,
                     noise_gain_bands=6)
    out = mcem_run(vae, X, jnp.ones((N,)), None, jax.random.PRNGKey(1),
                   cfg, update_nmf=False, Vb_fixed=Vb)
    b = np.asarray(out["b"])
    assert b.shape == (6, N) and np.all(np.isfinite(b)) and np.all(b > 0)
    burst = b[:2, 10:13].mean()
    assert burst > 5.0 * b[3:, :].mean()
    cost = np.asarray(out["cost"])
    assert cost[-1] <= cost[0]


def test_noise_gain_bands_out_of_range_rejected():
    """n_bands > F would create an empty band (0/0 = NaN b update): the
    band map must reject it up front."""
    from guided_vae_nmf_tpu.mcem.engine import _noise_gain_band_map

    with pytest.raises(ValueError, match="noise_gain_bands"):
        _noise_gain_band_map(33, 34)
    with pytest.raises(ValueError, match="noise_gain_bands"):
        _noise_gain_band_map(33, 0)


@pytest.mark.skipif(
    not _reference_available(), reason="reference/torch unavailable"
)
def test_full_run_injected_parity_with_reference():
    """Full-run fixed-randomness cross-engine parity: replaying the torch
    reference's global-RNG stream (record_reference_stream) through
    mcem_run(noise=..., init_nmf=...) must reproduce the reference
    MCEM_M2 run's S_hat to float32 tolerance — every draw paired, so the
    ONLY remaining differences are numerical (XLA vs torch accumulation,
    the Vx floor). Reference lineage: mcem.py:29-46 (init),
    218-294 (MH chain), 155-178 (run/WF)."""
    sys.path.insert(0, "/root/reference")
    try:
        import torch
        from python.models.models import DeepGenerativeModel
        from python.models.mcem import MCEM_M2
    finally:
        sys.path.pop(0)

    from guided_vae_nmf_tpu.models import export_vae
    from guided_vae_nmf_tpu.models.torch_import import (
        record_reference_stream,
    )

    L2 = 8
    dgm = dgm_init(KEY, [F, F, L2, [16]])
    rng = np.random.RandomState(11)
    Xc = (rng.randn(N, F) + 1j * rng.randn(N, F)).astype(np.complex64)
    y_np = (rng.rand(N, F) > 0.5).astype(np.float32)

    tm = DeepGenerativeModel([F, F, L2, [16]], None)
    tm.load_state_dict({k: torch.from_numpy(np.asarray(v).copy())
                        for k, v in export_vae(dgm).items()})
    tm.eval()
    for p in tm.parameters():
        p.requires_grad = False

    mc = MCEM_M2(niter=SMALL_CFG.niter,
                 nsamples_E_step=SMALL_CFG.nsamples_E_step,
                 burnin_E_step=SMALL_CFG.burnin_E_step,
                 nsamples_WF=SMALL_CFG.nsamples_WF,
                 burnin_WF=SMALL_CFG.burnin_WF, var_RW=SMALL_CFG.var_RW)
    torch.manual_seed(5)
    mc.init_parameters(X=Xc, y=torch.from_numpy(y_np.copy()),
                       vae=tm, nmf_rank=SMALL_CFG.nmf_rank,
                       eps=SMALL_CFG.eps, device="cpu")
    mc.run()

    W0, H0, g0, noise = record_reference_stream(
        5, F, N, L2, SMALL_CFG)
    X_abs2 = jnp.asarray(np.abs(Xc.T) ** 2)
    out = mcem_run(dgm, X_abs2, jnp.ones((N,)),
                   jnp.asarray(y_np.T.copy()), jax.random.PRNGKey(0),
                   SMALL_CFG, init_nmf=(jnp.asarray(W0), jnp.asarray(H0),
                                        jnp.asarray(g0)), noise=noise)
    S_ours = np.asarray(out["WFs"]) * Xc.T
    assert_allclose(S_ours, mc.S_hat, rtol=2e-4, atol=2e-6)
    # and injection really controlled the trajectory: a different stream
    # (different seed) must NOT reproduce it
    _, _, _, noise2 = record_reference_stream(6, F, N, L2, SMALL_CFG)
    out2 = mcem_run(dgm, X_abs2, jnp.ones((N,)),
                    jnp.asarray(y_np.T.copy()), jax.random.PRNGKey(0),
                    SMALL_CFG, init_nmf=(jnp.asarray(W0), jnp.asarray(H0),
                                         jnp.asarray(g0)), noise=noise2)
    assert not np.allclose(np.asarray(out2["WFs"]), np.asarray(out["WFs"]))
