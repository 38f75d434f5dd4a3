"""Sharded enhancement sweeps over the device mesh.

Replaces the reference's inference "cluster" — `np.array_split` of the test
file list over torch.multiprocessing spawned processes, one full model
replica per GPU, zero communication (reference evaluate_M1.py:186-222) —
with (a) DCN-level sharding of the file list across hosts via
`jax.process_index`, and (b) ICI-level sharding of each padded utterance
batch over the mesh's data axis: parameters replicated, the batch split,
one jit-compiled program, XLA collectives only where shardings require them.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from .mesh import batch_sharding, replicated, pad_to_multiple
from ..mcem.engine import (mcem_m1_batch, mcem_m2_batch, MCEMConfig,
                           framewise_uniform)


def shard_file_list(file_paths, process_index=None, process_count=None):
    """This host's contiguous shard of the utterance list (multi-host DCN
    split; the reference's np.array_split over GPU processes,
    evaluate_M1.py:203)."""
    if process_index is None:
        process_index = jax.process_index()
    if process_count is None:
        process_count = jax.process_count()
    return list(np.array_split(np.asarray(file_paths),
                               process_count)[process_index])


def _pad_batch_to_mesh(arrays, n_dev):
    """Pad the leading batch dim of every array to a multiple of the mesh's
    data-axis size (pad entries replicate row 0 and are dropped by the
    caller)."""
    B = arrays[0].shape[0]
    Bp = pad_to_multiple(B, n_dev)
    out = []
    for a in arrays:
        if Bp != B:
            pad = np.broadcast_to(np.asarray(a)[:1],
                                  (Bp - B,) + a.shape[1:])
            a = np.concatenate([np.asarray(a), pad], axis=0)
        out.append(a)
    return out, B


def sharded_mcem_m1(mesh, vae_params, X_abs2, mask, keys,
                    cfg: MCEMConfig = MCEMConfig()):
    """M1 MCEM with the utterance batch sharded over the mesh data axis."""
    n_dev = mesh.devices.size
    (X_abs2, mask, keys), B = _pad_batch_to_mesh([X_abs2, mask, keys], n_dev)
    data3 = batch_sharding(mesh, ndim=3)
    data2 = batch_sharding(mesh, ndim=2)
    rep = replicated(mesh)
    params = jax.device_put(vae_params, rep)
    out = mcem_m1_batch(
        params,
        jax.device_put(X_abs2, data3),
        jax.device_put(mask, data2),
        jax.device_put(keys, data2),
        cfg,
    )
    return jax.tree_util.tree_map(lambda x: np.asarray(x)[:B], out)


def sharded_mcem_fused(mesh, vae_params, X_abs2, mask, y, keys,
                       cfg: MCEMConfig = MCEMConfig(), axis="data",
                       **fused_kw):
    """Fused-Pallas MCEM over the mesh via shard_map: the utterance batch
    splits over the data axis and each device runs its own kernel grid on
    its shard (a Pallas call is opaque to the partitioner, so plain
    sharding annotations would gather the batch — shard_map keeps it
    SPMD). Zero collectives: the sweep is embarrassingly parallel like the
    reference's process pool, but one program."""
    from ..mcem.pallas_engine import mcem_batch_fused

    n_dev = mesh.shape[axis]
    has_y = y is not None
    arrays = [X_abs2, mask, keys] + ([y] if has_y else [])
    arrays, B = _pad_batch_to_mesh(arrays, n_dev)
    if has_y:
        X_abs2, mask, keys, y = arrays
    else:
        X_abs2, mask, keys = arrays

    def local(params, X, m, k, yy=None):
        return mcem_batch_fused(params, X, m, yy, k, cfg, **fused_kw)

    in_specs = [P(), P(axis), P(axis), P(axis)]
    args = [vae_params, X_abs2, mask, keys]
    if has_y:
        in_specs.append(P(axis))
        args.append(y)
    fn = jax.shard_map(
        local, mesh=mesh, in_specs=tuple(in_specs), out_specs=P(axis),
        check_vma=False,
    )
    out = fn(*args)
    return jax.tree_util.tree_map(lambda x: np.asarray(x)[:B], out)


def _global_nmf_init(key, F, N, cfg, update_nmf, dtype):
    """Single source of the shard-count-invariant global NMF init used by
    BOTH frame_sharded_mcem and grid_sharded_mcem (per utterance): the
    key splits (run, W, H) exactly like the single-device mcem_run draw,
    so a B=1 grid run reproduces the frame-sharded trajectory."""
    key_run, k_w, k_h = jax.random.split(jnp.asarray(key), 3)
    if update_nmf:
        W0 = jnp.maximum(jax.random.uniform(k_w, (F, cfg.nmf_rank)),
                         cfg.eps)
        H0 = jnp.maximum(framewise_uniform(k_h, cfg.nmf_rank, N), cfg.eps)
    else:
        W0 = jnp.ones((F, 1), dtype)
        H0 = jnp.zeros((1, N), dtype)
    return key_run, W0, H0, jnp.ones((N,), dtype)


def frame_sharded_mcem(mesh, vae_params, X_abs2, mask, y, key,
                       cfg: MCEMConfig = MCEMConfig(), axis="data",
                       update_nmf=True, Vb_fixed=None):
    """ONE long recording sharded over the mesh along the FRAME axis
    (SURVEY §5 closing bullet): a 30-minute utterance whose (R, F, N)
    sample buffer would OOM a single chip spans the mesh instead.

    The MH chain is per-frame independent (reference mcem.py:271-280) and
    the H/g updates are per-frame, so the only collectives in the whole EM
    loop are psums of the NMF W-update matmuls and the scalar cost
    (engine.nmf_m_step / _masked_cost with axis_name set). The NMF init is
    drawn once globally and sliced so the trajectory is shard-count
    invariant; each shard folds its mesh position into the PRNG key for
    independent per-frame MH noise.

    Args: X_abs2 (F, N) with N % mesh_size == 0 (pad with `pad_power` +
    mask), mask (N,), y (y_dim, N) or None, one PRNG key.
    Returns the mcem_run dict with full-length (F, N) WFs/WFn/H/g and the
    replicated W/cost.
    """
    from ..mcem.engine import mcem_run

    n_dev = mesh.shape[axis]
    F, N = X_abs2.shape
    if N % n_dev != 0:
        raise ValueError(f"frame count {N} must divide the mesh axis "
                         f"({n_dev}); pad with pad_power + mask")

    # Global NMF init, identical to the single-device mcem_run draw
    key, W0, H0, g0 = _global_nmf_init(key, F, N, cfg, update_nmf,
                                       X_abs2.dtype)

    has_y = y is not None
    has_vb = Vb_fixed is not None

    def local(params, X, m, W0_, H0_, g0_, k, *rest):
        yy = rest[0] if has_y else None
        vb = rest[-1] if has_vb else None
        k = jax.random.fold_in(k, jax.lax.axis_index(axis))
        out = mcem_run(params, X, m, yy, k, cfg, update_nmf=update_nmf,
                       Vb_fixed=vb, axis_name=axis,
                       init_nmf=(W0_, H0_, g0_))
        # W and cost are already psum-consistent (identical on every
        # shard); mark them replicated for the out_specs below.
        res = {
            "WFs": out["WFs"], "WFn": out["WFn"], "H": out["H"],
            "g": out["g"], "Z": out["Z"],
            "W": jax.lax.psum(out["W"], axis) / n_dev,
            "cost": jax.lax.psum(out["cost"], axis) / n_dev,
        }
        if "b" in out:           # per-frame noise gain: frame-local
            res["b"] = out["b"]
        return res

    frame2 = P(None, axis)   # (F, N) split on frames
    frame1 = P(axis)
    in_specs = [P(), frame2, frame1, P(), frame2, frame1, P()]
    args = [vae_params, X_abs2, mask, W0, H0, g0, key]
    if has_y:
        in_specs.append(frame2)
        args.append(y)
    if has_vb:
        in_specs.append(frame2)
        args.append(Vb_fixed)
    out_specs = {
        "WFs": frame2, "WFn": frame2, "H": frame2, "g": frame1,
        "Z": frame2, "W": P(), "cost": P(),
    }
    if cfg.noise_gain and not update_nmf:
        # per-frame gain is (N,) frame-sharded; per-band is (n_bands, N)
        # with only the FRAME axis sharded
        out_specs["b"] = frame1 if cfg.noise_gain_bands == 1 else frame2
    fn = jax.shard_map(
        local, mesh=mesh, in_specs=tuple(in_specs), out_specs=out_specs,
        check_vma=False,
    )
    return fn(*args)


def sharded_mcem_m2(mesh, dgm_params, X_abs2, mask, y, keys,
                    cfg: MCEMConfig = MCEMConfig()):
    """M2 MCEM with the utterance batch sharded over the mesh data axis."""
    n_dev = mesh.devices.size
    (X_abs2, mask, y, keys), B = _pad_batch_to_mesh(
        [X_abs2, mask, y, keys], n_dev
    )
    data3 = batch_sharding(mesh, ndim=3)
    data2 = batch_sharding(mesh, ndim=2)
    rep = replicated(mesh)
    params = jax.device_put(dgm_params, rep)
    out = mcem_m2_batch(
        params,
        jax.device_put(X_abs2, data3),
        jax.device_put(mask, data2),
        jax.device_put(y, data3),
        jax.device_put(keys, data2),
        cfg,
    )
    return jax.tree_util.tree_map(lambda x: np.asarray(x)[:B], out)


def grid_sharded_mcem(mesh, vae_params, X_abs2, mask, y, keys,
                      cfg: MCEMConfig = MCEMConfig(),
                      data_axis="data", frame_axis="frame",
                      update_nmf=True, Vb_fixed=None):
    """A BATCH of long recordings over a 2-D mesh: utterances split over
    `data_axis`, every utterance's frames over `frame_axis` — the
    composition of the per-utterance inference parallelism (SURVEY §2.7
    P1) with the long-recording frame sharding (SURVEY §5 closing
    bullet), for pod-scale sweeps where single recordings outgrow one
    chip's HBM.

    Collectives: identical to `frame_sharded_mcem` — psums of the NMF
    W-update matmuls and the scalar cost along `frame_axis` only
    (reference mcem.py:107-115's frame reductions); the data axis is
    communication-free, so on a (hosts*chips) mesh the frame axis should
    map to ICI and the data axis may span DCN.

    Args: X_abs2 (B, F, N) with B % mesh.shape[data_axis] == 0 and
    N % mesh.shape[frame_axis] == 0 (pad with `pad_power` + mask);
    mask (B, N); y (B, y_dim, N) or None; keys (B, 2) uint32 — per
    utterance, split exactly like `frame_sharded_mcem`'s single key so a
    B=1 run reproduces it. Returns the batched result dict (B leading).
    """
    from ..mcem.engine import mcem_run

    nd = mesh.shape[data_axis]
    nf = mesh.shape[frame_axis]
    B, F, N = X_abs2.shape
    if B % nd != 0:
        raise ValueError(f"batch {B} must divide the {data_axis} axis "
                         f"({nd}); pad the batch (rows are masked per "
                         f"frame, duplicate + drop)")
    if N % nf != 0:
        raise ValueError(f"frame count {N} must divide the {frame_axis} "
                         f"axis ({nf}); pad with pad_power + mask")

    # Global per-utterance NMF init (shard-count invariant): vmapped
    # _global_nmf_init, the exact frame_sharded_mcem derivation per
    # utterance (pinned by the B=1 equivalence test).
    key_run, W0, H0, g0 = jax.vmap(
        lambda k: _global_nmf_init(k, F, N, cfg, update_nmf, X_abs2.dtype)
    )(jnp.asarray(keys))

    has_y = y is not None
    has_vb = Vb_fixed is not None

    def local(params, X, m, W0_, H0_, g0_, k, *rest):
        yy = rest[0] if has_y else None
        vb = rest[-1] if has_vb else None
        k = jax.vmap(jax.random.fold_in, (0, None))(
            k, jax.lax.axis_index(frame_axis))

        def one(X1, m1, W1, H1, g1, k1, y1, vb1):
            return mcem_run(params, X1, m1, y1, k1, cfg,
                            update_nmf=update_nmf, Vb_fixed=vb1,
                            axis_name=frame_axis,
                            init_nmf=(W1, H1, g1))

        out = jax.vmap(one, (0, 0, 0, 0, 0, 0,
                             0 if has_y else None,
                             0 if has_vb else None))(
            X, m, W0_, H0_, g0_, k, yy, vb)
        res = {
            "WFs": out["WFs"], "WFn": out["WFn"], "H": out["H"],
            "g": out["g"], "Z": out["Z"],
            "W": jax.lax.psum(out["W"], frame_axis) / nf,
            "cost": jax.lax.psum(out["cost"], frame_axis) / nf,
        }
        if "b" in out:           # per-frame noise gain: frame-local
            res["b"] = out["b"]
        return res

    bf3 = P(data_axis, None, frame_axis)   # (B, F/ydim/K, N)
    bf2 = P(data_axis, frame_axis)         # (B, N)
    b_only = P(data_axis)
    in_specs = [P(), bf3, bf2, b_only, bf3, bf2, b_only]
    args = [vae_params, X_abs2, mask, W0, H0, g0, key_run]
    if has_y:
        in_specs.append(bf3)
        args.append(y)
    if has_vb:
        in_specs.append(bf3)
        args.append(Vb_fixed)
    out_specs = {
        "WFs": bf3, "WFn": bf3, "H": bf3, "g": bf2, "Z": bf3,
        "W": b_only, "cost": b_only,
    }
    if cfg.noise_gain and not update_nmf:
        # (B, N) per-frame gain, or (B, n_bands, N) per-band (bands
        # replicated, frames sharded)
        out_specs["b"] = bf2 if cfg.noise_gain_bands == 1 else bf3
    fn = jax.shard_map(
        local, mesh=mesh, in_specs=tuple(in_specs), out_specs=out_specs,
        check_vma=False,
    )
    return fn(*args)
