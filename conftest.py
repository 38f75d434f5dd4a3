"""Pytest root conftest.

Forces JAX onto the host CPU backend with 8 virtual devices so the full
multi-chip sharding paths (mesh/pjit/shard_map) are exercised without TPU
hardware. Must run before the first `import jax` resolves a backend.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon site hook (PYTHONPATH=/root/.axon_site) pins JAX_PLATFORMS to the
# TPU tunnel before conftest runs; the config update below wins regardless of
# import order.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache: the suite's sharded programs dominate
# its wall-clock when compiled cold; repeat runs reuse the cache. An
# explicit GVNMF_CACHE_DIR (also read by the package __init__) wins.
_cache = os.environ.get("GVNMF_CACHE_DIR") or os.path.join(
    os.path.expanduser("~"), ".cache", "gvnmf_xla"
)
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

REFERENCE_DATA = "/root/reference/data/subset"


def has_reference_data():
    return os.path.isdir(REFERENCE_DATA)
