"""Multi-host (DCN) runtime initialization.

The reference's largest deployment unit is one machine with a handful of
GPUs and spawned processes (SURVEY §2.7). The TPU-native equivalent spans
pods: each host process joins the JAX distributed runtime, the utterance
list splits across hosts over DCN (`sweep.shard_file_list`), and each
host's mesh shard runs the ICI-parallel batch engines.

Typical driver:

    from guided_vae_nmf_tpu.parallel import multihost, make_mesh
    multihost.initialize()                       # no-op on a single host
    files = shard_file_list(all_files)           # this host's shard
    mesh = make_mesh()                           # local+global devices
    ... enhance_files(files, ...) ...
"""

import os

import jax

_initialized = False


def initialize(coordinator_address=None, num_processes=None,
               process_id=None):
    """Join the JAX distributed runtime when running multi-host.

    Arguments default from the standard environment
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID, or the
    TPU pod metadata jax.distributed discovers natively). Safe to call on
    a single host: with no coordinator configured it is a no-op.
    """
    global _initialized
    if _initialized:
        return
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    hosts = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    # a real pod var is a comma-separated host list; tooling sometimes
    # injects warning strings there
    in_pod = bool(hosts) and " " not in hosts and "," in hosts
    if coordinator_address is None and not in_pod:
        return  # single-host run
    kwargs = {}
    if coordinator_address:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    elif os.environ.get("JAX_NUM_PROCESSES"):
        kwargs["num_processes"] = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is not None:
        kwargs["process_id"] = process_id
    elif os.environ.get("JAX_PROCESS_ID"):
        kwargs["process_id"] = int(os.environ["JAX_PROCESS_ID"])
    jax.distributed.initialize(**kwargs)
    _initialized = True


def is_multihost():
    return jax.process_count() > 1
