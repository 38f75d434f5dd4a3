"""guided_vae_nmf_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for
guided-VAE + NMF statistical speech enhancement.

Re-designed from scratch with the capabilities of the reference research
codebase sp-uhh/guided-vae-nmf ("Guided variational autoencoder for speech
enhancement with a supervised classifier", arXiv:2102.06454):

  * `dsp/`      — L0 signal processing: STFT/ISTFT, mask/label targets
                  (reference: python/processing/{stft,target}.py)
  * `data/`     — L1 data layer: wav IO, file lists, noise DBs, mixing,
                  HDF5/pickle stores, input pipelines
                  (reference: python/dataset/, python/data.py)
  * `models/`   — L2 model layer: VAE (M1), guided VAE (M2), classifiers,
                  losses, distributions, SVI machinery, torch ckpt import
                  (reference: python/models/{models,utils,distributions,
                  variational}.py)
  * `mcem/`     — L3 enhancement algorithms: batched Monte-Carlo EM engine
                  (Metropolis-Hastings + NMF), SPP noise tracking
                  (reference: python/models/{mcem,spp_estimation}.py)
  * `train/`    — training loops, checkpoint/resume, logging
                  (reference: scripts/training_*.py)
  * `metrics/`  — SI-SDR family, ESTOI, stats aggregation
                  (reference: python/metrics.py, scripts/run_metrics_*.py)
  * `parallel/` — device mesh, sharded sweeps, collectives
                  (replaces the reference's torch.multiprocessing pools)
  * `viz/`      — spectrogram/mask figure builders
                  (reference: python/visualization.py)

Everything on the device compute path is pure-functional JAX: pytree
parameters, explicit PRNG keys, `lax.scan` loops, `vmap` over utterances and
`shard_map` over a `jax.sharding.Mesh`.
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("GVNMF_PLATFORM"):
    # Deployment images may pin jax to a platform plugin via site hooks
    # before user code runs; this honors an explicit platform request
    # (e.g. GVNMF_PLATFORM=cpu for host-side tooling and CI).
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["GVNMF_PLATFORM"])

if _os.environ.get("GVNMF_CACHE_DIR"):
    # Persistent XLA compilation cache: the fused Pallas kernels take
    # minutes to compile cold; with the cache a sweep restart reuses them
    # across processes.
    import jax as _jax2

    _jax2.config.update(
        "jax_compilation_cache_dir", _os.environ["GVNMF_CACHE_DIR"]
    )
    _jax2.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
