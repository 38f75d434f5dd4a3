"""Device mesh and sharding helpers.

The reference has no collective layer at all — its only parallelism is one
spawned process per GPU over a split file list (reference
scripts/evaluate_M1.py:186-222; SURVEY §2.7). The TPU-native replacement is
a `jax.sharding.Mesh` over ICI with named-sharding annotations: data-parallel
training shards the frame batch, the enhancement sweep shards the utterance
batch, and XLA inserts the psum/all-gather collectives.
"""

from contextlib import contextmanager

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, axis_names=("data",), shape=None):
    """Build a Mesh over all (or the given) devices.

    With one axis name the mesh is a flat data/utterance axis; pass
    `shape` + multiple names for 2-D layouts (e.g. ("data", "model"))."""
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices)
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    return Mesh(devices.reshape(shape), axis_names)


def batch_sharding(mesh, axis="data", ndim=2):
    """NamedSharding that splits the leading (batch) dimension."""
    spec = P(axis, *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def replicated(mesh):
    return NamedSharding(mesh, P())


def shard_batch(mesh, tree, axis="data"):
    """device_put every array in `tree` with its leading axis split over
    `axis` (padding is the caller's job — batch % mesh size must be 0)."""
    def put(x):
        return jax.device_put(
            x, batch_sharding(mesh, axis, ndim=max(x.ndim, 1))
        )

    return jax.tree_util.tree_map(put, tree)


def replicate(mesh, tree):
    """device_put every array replicated over the mesh."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, replicated(mesh)), tree
    )


def pad_to_multiple(n, m):
    """Smallest n' >= n with n' % m == 0."""
    return ((n + m - 1) // m) * m


@contextmanager
def maybe_mesh(mesh):
    """Enter the mesh context when one is given; no-op otherwise."""
    if mesh is None:
        yield
    else:
        with mesh:
            yield
