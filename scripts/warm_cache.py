"""Precompile the sweep's device programs into the persistent XLA cache.

Cold sweeps pay one compile per (bucket, batch, label-mode) shape — tens
of seconds each on a remote-compile transport. Run this once per
deployment (or after upgrading jaxlib / changing the model family) to
populate GVNMF_CACHE_DIR with the standard shape grid; subsequent
processes start warm.

Usage: GVNMF_CACHE_DIR=~/.cache/gvnmf_xla python scripts/warm_cache.py
       [--buckets 384,512,640] [--batch_size 32] [--labels oracle,dnn]
       [--noise_models nmf] [--fast 1] [--y_dim 513]
       [--serving 1]  (online endpoint batch x bucket lattice)
       [--stream 1]   (fused streaming ticks, dedicated + pooled)
"""

import os
import sys
import time

sys.path.insert(0, ".")

os.environ.setdefault(
    "GVNMF_CACHE_DIR", os.path.expanduser("~/.cache/gvnmf_xla")
)

import numpy as np

from _common import flag


def main(argv=None):
    argv = argv or sys.argv[1:]
    buckets = [int(v) for v in flag(argv, "buckets", "384,512,640").split(",")]
    batch_size = flag(argv, "batch_size", 32, int)
    labels = flag(argv, "labels", "oracle,dnn").split(",")
    noise_models = flag(argv, "noise_models", "nmf").split(",")
    fast = bool(flag(argv, "fast", 1, int))
    y_dim = flag(argv, "y_dim", 513, int)

    import jax
    import jax.numpy as jnp

    from guided_vae_nmf_tpu.mcem import MCEMConfig
    from guided_vae_nmf_tpu.models import classifier_init, dgm_init
    from guided_vae_nmf_tpu.pipeline import (
        HOP, NFFT, _enhance_waveform_jit, _use_fused, bucket_frames,
    )

    params = dgm_init(jax.random.PRNGKey(0), [513, y_dim, 32, [128, 128]])
    cls = classifier_init(jax.random.PRNGKey(1), [513, (128, 128), y_dim])
    mean = jnp.zeros((513,), jnp.float32)
    std = jnp.ones((513,), jnp.float32)
    cfg = MCEMConfig()

    n_done = 0
    for n_pad in buckets:
        n_pad = bucket_frames(n_pad)
        # the sweep shrinks the batch for long buckets to bound HBM
        B = max(1, batch_size * 512 // max(n_pad, 512))
        L = (n_pad - 1) * HOP + NFFT
        x = jnp.zeros((B, L), jnp.int16)
        mask = jnp.ones((B, n_pad), jnp.float32)
        keys = jax.random.split(jax.random.PRNGKey(2), B)
        use_fused = _use_fused("auto", params, n_pad)
        for label_mode in labels:
            for nm in noise_models:
                t0 = time.perf_counter()
                out = _enhance_waveform_jit(
                    params, x,
                    x if label_mode == "oracle" else None, None,
                    cls if label_mode == "dnn" else None,
                    mean if label_mode == "dnn" else None,
                    std if label_mode == "dnn" else None,
                    mask, keys, cfg, use_fused=use_fused,
                    noise_model=nm, fast=fast, label_mode=label_mode,
                    return_noise=not use_fused,  # the sweep's contract
                )
                np.asarray(out[0])
                n_done += 1
                print(f"compiled bucket={n_pad} B={B} {label_mode}/{nm} "
                      f"({time.perf_counter() - t0:.1f}s)", flush=True)
    if flag(argv, "serving", 0, int):
        # the online endpoint's (batch x bucket) lattice at its default
        # config (SPP noise + DNN labels) — shape-keyed, so random
        # weights warm the same programs real checkpoints hit
        from guided_vae_nmf_tpu.serving import (
            EnhancementService, ServeConfig,
        )

        svc = EnhancementService(
            params, classifier_params=cls, mean=mean, std=std, cfg=cfg,
            serve=ServeConfig(noise_model="spp"))
        try:
            srv_buckets = tuple(
                bucket_frames(b) for b in buckets) or (128, 256, 512)
            dt = svc.warmup(buckets=srv_buckets)
            n_done += len(srv_buckets) * 5
            print(f"serving lattice warmed ({dt:.1f}s)", flush=True)
        finally:
            svc.close()

    if flag(argv, "stream", 0, int):
        # the fused streaming tick (dedicated + pooled) at the serving
        # default chunk shape — a live connection's first chunk then
        # reloads instead of compiling
        from guided_vae_nmf_tpu.streaming import (
            HOP as SHOP, MultiStreamM2Enhancer, StreamingM2Enhancer,
        )

        t0 = time.perf_counter()
        chunk_frames = flag(argv, "chunk_frames", 8, int)
        max_streams = flag(argv, "max_streams", 8, int)
        skw = dict(classifier_params=cls, mean=mean, std=std,
                   label_mode="dnn", chunk_frames=chunk_frames)
        enh = StreamingM2Enhancer(params, **skw)
        enh.push(np.zeros(2 * chunk_frames * SHOP, np.float32))
        n_done += 1
        # every power-of-two lane bucket the pool can compile
        pool = MultiStreamM2Enhancer(params, max_streams=max_streams,
                                     **skw)
        b = 1
        while b <= max_streams:
            sids = [pool.open() for _ in range(b)]
            for sid in sids:
                pool.feed(sid, np.zeros(2 * chunk_frames * SHOP,
                                        np.float32))
            pool.step()
            for sid in sids:
                pool.close(sid)
            n_done += 1
            b *= 2
        print(f"streaming ticks warmed ({time.perf_counter() - t0:.1f}s)",
              flush=True)

    print(f"warmed {n_done} programs into "
          f"{os.environ['GVNMF_CACHE_DIR']}")


if __name__ == "__main__":
    main()
