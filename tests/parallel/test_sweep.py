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
