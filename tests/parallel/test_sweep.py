"""Multi-chip sharding tests on the 8-way virtual CPU mesh: sharded MCEM
sweep matches the single-device batch bit-for-bit, file-list sharding
partitions exactly."""

import numpy as np
import jax
import jax.numpy as jnp
from numpy.testing import assert_allclose

from guided_vae_nmf_tpu.models import vae_init, dgm_init
from guided_vae_nmf_tpu.mcem import MCEMConfig, mcem_m1_batch, mcem_m2_batch
from guided_vae_nmf_tpu.models import dgm_init as _dgm_init
from guided_vae_nmf_tpu.parallel import (
    make_mesh,
    shard_file_list,
    sharded_mcem_m1,
    sharded_mcem_m2,
    sharded_mcem_fused,
)

KEY = jax.random.PRNGKey(0)
F, N, L = 33, 16, 4
CFG = MCEMConfig(niter=2, nsamples_E_step=2, burnin_E_step=2, nsamples_WF=2,
                 burnin_WF=2, nmf_rank=3)


def test_shard_file_list_partitions():
    files = [f"u{i}.wav" for i in range(10)]
    shards = [shard_file_list(files, i, 4) for i in range(4)]
    assert sum(len(s) for s in shards) == 10
    assert [f for s in shards for f in s] == files


def test_sharded_m1_matches_single_device():
    mesh = make_mesh()
    B = 8
    vae = vae_init(KEY, [F, L, [16]])
    X = np.asarray(jax.random.uniform(KEY, (B, F, N))) + 0.05
    mask = np.ones((B, N), np.float32)
    keys = np.asarray(jax.random.split(jax.random.PRNGKey(5), B))

    ref = mcem_m1_batch(vae, jnp.asarray(X), jnp.asarray(mask),
                        jnp.asarray(keys), CFG)
    out = sharded_mcem_m1(mesh, vae, X, mask, keys, CFG)
    assert_allclose(out["WFs"], np.asarray(ref["WFs"]), atol=1e-5)
    assert_allclose(out["cost"], np.asarray(ref["cost"]), rtol=1e-4)


def test_sharded_fused_pallas_engine():
    """shard_map keeps the Pallas kernel SPMD: each of the 8 virtual
    devices runs its own kernel grid on its batch shard."""
    mesh = make_mesh()
    B, F2, N2, L2 = 8, 65, 128, 8
    dgm = _dgm_init(KEY, [F2, 10, L2, [16, 16]])
    X = np.asarray(jax.random.uniform(KEY, (B, F2, N2))) + 0.05
    y = (np.random.RandomState(0).rand(B, 10, N2) > 0.5).astype(np.float32)
    mask = np.ones((B, N2), np.float32)
    keys = np.asarray(jax.random.split(jax.random.PRNGKey(2), B))
    cfg = MCEMConfig(niter=2, nsamples_E_step=2, burnin_E_step=1,
                     nsamples_WF=2, burnin_WF=1, nmf_rank=3)
    out = sharded_mcem_fused(mesh, dgm, X, mask, y, keys, cfg)
    assert out["WFs"].shape == (B, F2, N2)
    assert np.all(np.isfinite(out["WFs"]))
    assert_allclose(out["WFs"] + out["WFn"], 1.0, atol=1e-4)


def test_sharded_m2_with_ragged_batch():
    """Batch not divisible by the mesh size: padded internally, trimmed on
    return."""
    mesh = make_mesh()
    B = 5  # ragged vs 8 devices
    y_dim = 6
    dgm = dgm_init(KEY, [F, y_dim, L, [16]])
    X = np.asarray(jax.random.uniform(KEY, (B, F, N))) + 0.05
    y = (np.random.RandomState(0).rand(B, y_dim, N) > 0.5).astype(np.float32)
    mask = np.ones((B, N), np.float32)
    keys = np.asarray(jax.random.split(jax.random.PRNGKey(6), B))

    out = sharded_mcem_m2(mesh, dgm, X, mask, y, keys, CFG)
    assert out["WFs"].shape == (B, F, N)
    assert np.all(np.isfinite(out["WFs"]))
    ref = mcem_m2_batch(dgm, jnp.asarray(X), jnp.asarray(mask),
                        jnp.asarray(y), jnp.asarray(keys), CFG)
    assert_allclose(out["WFs"], np.asarray(ref["WFs"]), atol=1e-5)


def test_frame_sharded_long_recording_matches_single_device():
    """One long recording sharded over the FRAME axis (SURVEY §5): with
    var_RW=0 the MCEM trajectory is deterministic, so the 8-shard result
    must equal the single-device run from the same global NMF init up to
    psum reassociation."""
    from guided_vae_nmf_tpu.parallel import frame_sharded_mcem
    from guided_vae_nmf_tpu.mcem.engine import mcem_run

    mesh = make_mesh()
    F2, N2, ydim = 129, 512, 16
    dgm = dgm_init(KEY, [F2, ydim, 8, [32]])
    X = np.random.RandomState(0).rand(F2, N2).astype(np.float32) + 0.05
    y = (np.random.RandomState(1).rand(ydim, N2) > 0.5).astype(np.float32)
    mask = np.ones((N2,), np.float32)
    key = jax.random.PRNGKey(42)
    cfg = MCEMConfig(niter=5, nsamples_E_step=3, burnin_E_step=3,
                     nsamples_WF=3, burnin_WF=3, nmf_rank=4, var_RW=0.0)

    out_s = frame_sharded_mcem(mesh, dgm, jnp.asarray(X), jnp.asarray(mask),
                               jnp.asarray(y), key, cfg)

    from guided_vae_nmf_tpu.mcem.engine import framewise_uniform

    k2, k_w, k_h = jax.random.split(key, 3)
    W0 = jnp.maximum(jax.random.uniform(k_w, (F2, cfg.nmf_rank)), cfg.eps)
    H0 = jnp.maximum(framewise_uniform(k_h, cfg.nmf_rank, N2), cfg.eps)
    g0 = jnp.ones((N2,), jnp.float32)
    out_1 = mcem_run(dgm, jnp.asarray(X), jnp.asarray(mask), jnp.asarray(y),
                     k2, cfg, init_nmf=(W0, H0, g0))
    for name in ("WFs", "WFn", "g", "cost", "W", "H"):
        a, b = np.asarray(out_s[name]), np.asarray(out_1[name])
        assert a.shape == b.shape, name
        assert_allclose(a, b, rtol=2e-4, atol=1e-6, err_msg=name)


def test_frame_sharded_stochastic_and_errors():
    from guided_vae_nmf_tpu.parallel import frame_sharded_mcem
    import pytest

    mesh = make_mesh()
    F2, N2 = 33, 128
    vae = vae_init(KEY, [F2, 4, [16]])
    X = np.random.RandomState(2).rand(F2, N2).astype(np.float32) + 0.05
    mask = np.ones((N2,), np.float32)
    cfg = MCEMConfig(niter=2, nsamples_E_step=2, burnin_E_step=2,
                     nsamples_WF=2, burnin_WF=2, nmf_rank=3)
    out = frame_sharded_mcem(mesh, vae, jnp.asarray(X), jnp.asarray(mask),
                             None, jax.random.PRNGKey(3), cfg)
    assert np.all(np.isfinite(np.asarray(out["WFs"])))
    assert_allclose(np.asarray(out["WFs"]) + np.asarray(out["WFn"]), 1.0,
                    atol=1e-4)
    with pytest.raises(ValueError):  # 100 frames don't divide 8 shards
        frame_sharded_mcem(mesh, vae, jnp.asarray(X[:, :100]),
                           jnp.asarray(mask[:100]), None,
                           jax.random.PRNGKey(3), cfg)


def test_grid_sharded_batch_of_long_recordings_matches_single_device():
    """2-D mesh (data x frame): B=4 recordings over 2 data shards, each
    recording's frames over 4 frame shards. With var_RW=0 the trajectory
    is deterministic, so the grid result must equal per-utterance
    single-device mcem_run from the same global per-utterance NMF init
    (psum reassociation tolerance)."""
    from guided_vae_nmf_tpu.parallel import grid_sharded_mcem
    from guided_vae_nmf_tpu.mcem.engine import mcem_run, framewise_uniform

    mesh = make_mesh(axis_names=("data", "frame"), shape=(2, 4))
    B2, F2, N2, ydim = 4, 65, 256, 8
    dgm = dgm_init(KEY, [F2, ydim, 8, [32]])
    rng = np.random.RandomState(0)
    X = rng.rand(B2, F2, N2).astype(np.float32) + 0.05
    y = (rng.rand(B2, ydim, N2) > 0.5).astype(np.float32)
    mask = np.ones((B2, N2), np.float32)
    keys = jax.random.split(jax.random.PRNGKey(11), B2)
    cfg = MCEMConfig(niter=4, nsamples_E_step=3, burnin_E_step=3,
                     nsamples_WF=3, burnin_WF=3, nmf_rank=4, var_RW=0.0)

    out_g = grid_sharded_mcem(mesh, dgm, jnp.asarray(X), jnp.asarray(mask),
                              jnp.asarray(y), jnp.asarray(keys), cfg)
    assert out_g["WFs"].shape == (B2, F2, N2)

    for b in range(B2):
        k_run, k_w, k_h = jax.random.split(keys[b], 3)
        W0 = jnp.maximum(jax.random.uniform(k_w, (F2, cfg.nmf_rank)),
                         cfg.eps)
        H0 = jnp.maximum(framewise_uniform(k_h, cfg.nmf_rank, N2), cfg.eps)
        g0 = jnp.ones((N2,), jnp.float32)
        ref = mcem_run(dgm, jnp.asarray(X[b]), jnp.asarray(mask[b]),
                       jnp.asarray(y[b]), k_run, cfg,
                       init_nmf=(W0, H0, g0))
        for name in ("WFs", "WFn", "g", "W", "H", "cost"):
            assert_allclose(np.asarray(out_g[name][b]),
                            np.asarray(ref[name]), rtol=3e-4, atol=1e-6,
                            err_msg=f"utt {b}: {name}")


def test_grid_sharded_shape_errors():
    from guided_vae_nmf_tpu.parallel import grid_sharded_mcem
    import pytest

    mesh = make_mesh(axis_names=("data", "frame"), shape=(2, 4))
    vae = vae_init(KEY, [F, L, [16]])
    X = np.random.RandomState(1).rand(3, F, 128).astype(np.float32) + 0.05
    with pytest.raises(ValueError):      # B=3 doesn't divide 2
        grid_sharded_mcem(mesh, vae, jnp.asarray(X),
                          jnp.ones((3, 128), np.float32), None,
                          jax.random.split(KEY, 3), CFG)
    X2 = X[:2, :, :102]
    with pytest.raises(ValueError):      # 102 frames don't divide 4
        grid_sharded_mcem(mesh, vae, jnp.asarray(X2),
                          jnp.ones((2, 102), np.float32), None,
                          jax.random.split(KEY, 2), CFG)


def test_grid_b1_reproduces_frame_sharded():
    """The documented invariant: a B=1 grid run over a (1, 8) mesh equals
    frame_sharded_mcem over the flat 8-mesh with the same key (shared
    _global_nmf_init derivation, var_RW=0)."""
    from guided_vae_nmf_tpu.parallel import (frame_sharded_mcem,
                                             grid_sharded_mcem)

    mesh1 = make_mesh()
    mesh2 = make_mesh(axis_names=("data", "frame"), shape=(1, 8))
    F2, N2 = 33, 512
    vae = vae_init(KEY, [F2, 4, [16]])
    X = np.random.RandomState(5).rand(F2, N2).astype(np.float32) + 0.05
    mask = np.ones((N2,), np.float32)
    key = jax.random.PRNGKey(77)
    cfg = MCEMConfig(niter=3, nsamples_E_step=2, burnin_E_step=2,
                     nsamples_WF=2, burnin_WF=2, nmf_rank=3, var_RW=0.0)

    out_f = frame_sharded_mcem(mesh1, vae, jnp.asarray(X),
                               jnp.asarray(mask), None, key, cfg)
    out_g = grid_sharded_mcem(mesh2, vae, jnp.asarray(X)[None],
                              jnp.asarray(mask)[None], None, key[None],
                              cfg)
    for name in ("WFs", "WFn", "g", "W", "H", "cost"):
        assert_allclose(np.asarray(out_g[name][0]),
                        np.asarray(out_f[name]), rtol=2e-4, atol=1e-6,
                        err_msg=name)


def test_grid_sharded_spp_fixed_noise_variance():
    """update_nmf=False + Vb_fixed through the 2-D grid (the rest[-1]
    operand wiring): matches per-utterance single-device runs."""
    from guided_vae_nmf_tpu.parallel import grid_sharded_mcem
    from guided_vae_nmf_tpu.mcem.engine import mcem_run

    mesh = make_mesh(axis_names=("data", "frame"), shape=(2, 4))
    B2, F2, N2 = 2, 33, 128
    vae = vae_init(KEY, [F2, 4, [16]])
    rng = np.random.RandomState(9)
    X = rng.rand(B2, F2, N2).astype(np.float32) + 0.05
    Vb = rng.rand(B2, F2, N2).astype(np.float32) * 0.1 + 0.01
    mask = np.ones((B2, N2), np.float32)
    keys = jax.random.split(jax.random.PRNGKey(13), B2)
    cfg = MCEMConfig(niter=3, nsamples_E_step=2, burnin_E_step=2,
                     nsamples_WF=2, burnin_WF=2, nmf_rank=3, var_RW=0.0)

    out_g = grid_sharded_mcem(mesh, vae, jnp.asarray(X), jnp.asarray(mask),
                              None, jnp.asarray(keys), cfg,
                              update_nmf=False, Vb_fixed=jnp.asarray(Vb))
    for b in range(B2):
        k_run, _, _ = jax.random.split(keys[b], 3)
        ref = mcem_run(vae, jnp.asarray(X[b]), jnp.asarray(mask[b]), None,
                       k_run, cfg, update_nmf=False,
                       Vb_fixed=jnp.asarray(Vb[b]),
                       init_nmf=(jnp.ones((F2, 1)), jnp.zeros((1, N2)),
                                 jnp.ones((N2,))))
        assert_allclose(np.asarray(out_g["WFs"][b]),
                        np.asarray(ref["WFs"]), rtol=2e-4, atol=1e-6)


def test_grid_sharded_noise_gain():
    """MCEMConfig.noise_gain through the 2-D grid: the per-frame gain b is
    frame-local (no collective), comes back frame-sharded, and the var0
    deterministic trajectories match per-utterance single-device runs."""
    from guided_vae_nmf_tpu.parallel import grid_sharded_mcem
    from guided_vae_nmf_tpu.mcem.engine import mcem_run

    mesh = make_mesh(axis_names=("data", "frame"), shape=(2, 4))
    B2, F2, N2 = 2, 33, 128
    vae = vae_init(KEY, [F2, 4, [16]])
    rng = np.random.RandomState(21)
    X = rng.rand(B2, F2, N2).astype(np.float32) + 0.05
    X[:, :, 40:44] *= 60.0                  # impulsive frames
    Vb = rng.rand(B2, F2, N2).astype(np.float32) * 0.1 + 0.01
    mask = np.ones((B2, N2), np.float32)
    keys = jax.random.split(jax.random.PRNGKey(17), B2)
    cfg = MCEMConfig(niter=3, nsamples_E_step=2, burnin_E_step=2,
                     nsamples_WF=2, burnin_WF=2, var_RW=0.0,
                     noise_gain=True)

    out_g = grid_sharded_mcem(mesh, vae, jnp.asarray(X), jnp.asarray(mask),
                              None, jnp.asarray(keys), cfg,
                              update_nmf=False, Vb_fixed=jnp.asarray(Vb))
    assert out_g["b"].shape == (B2, N2)
    for b in range(B2):
        k_run, _, _ = jax.random.split(keys[b], 3)
        ref = mcem_run(vae, jnp.asarray(X[b]), jnp.asarray(mask[b]), None,
                       k_run, cfg, update_nmf=False,
                       Vb_fixed=jnp.asarray(Vb[b]),
                       init_nmf=(jnp.ones((F2, 1)), jnp.zeros((1, N2)),
                                 jnp.ones((N2,))))
        assert_allclose(np.asarray(out_g["b"][b]), np.asarray(ref["b"]),
                        rtol=2e-4, atol=1e-6)
        assert_allclose(np.asarray(out_g["WFs"][b]),
                        np.asarray(ref["WFs"]), rtol=2e-4, atol=1e-6)
    bb = np.asarray(out_g["b"])
    assert bb[:, 40:44].mean() > 3.0 * np.delete(bb, range(40, 44),
                                                 axis=1).mean()


def test_grid_sharded_noise_gain_bands():
    """noise_gain_bands > 1 through the 2-D grid: b must come back
    (B, n_bands, N) with the BANDS axis intact (only frames sharded) and
    match single-device runs."""
    from guided_vae_nmf_tpu.parallel import grid_sharded_mcem
    from guided_vae_nmf_tpu.mcem.engine import mcem_run

    mesh = make_mesh(axis_names=("data", "frame"), shape=(2, 4))
    B2, F2, N2, NB = 2, 33, 128, 4
    vae = vae_init(KEY, [F2, 4, [16]])
    rng = np.random.RandomState(31)
    X = rng.rand(B2, F2, N2).astype(np.float32) + 0.05
    Vb = rng.rand(B2, F2, N2).astype(np.float32) * 0.1 + 0.01
    mask = np.ones((B2, N2), np.float32)
    keys = jax.random.split(jax.random.PRNGKey(19), B2)
    cfg = MCEMConfig(niter=2, nsamples_E_step=2, burnin_E_step=2,
                     nsamples_WF=2, burnin_WF=2, var_RW=0.0,
                     noise_gain=True, noise_gain_bands=NB)

    out_g = grid_sharded_mcem(mesh, vae, jnp.asarray(X), jnp.asarray(mask),
                              None, jnp.asarray(keys), cfg,
                              update_nmf=False, Vb_fixed=jnp.asarray(Vb))
    assert out_g["b"].shape == (B2, NB, N2)
    for i in range(B2):
        k_run, _, _ = jax.random.split(keys[i], 3)
        ref = mcem_run(vae, jnp.asarray(X[i]), jnp.asarray(mask[i]), None,
                       k_run, cfg, update_nmf=False,
                       Vb_fixed=jnp.asarray(Vb[i]),
                       init_nmf=(jnp.ones((F2, 1)), jnp.zeros((1, N2)),
                                 jnp.ones((N2,))))
        assert_allclose(np.asarray(out_g["b"][i]), np.asarray(ref["b"]),
                        rtol=2e-4, atol=1e-6)
