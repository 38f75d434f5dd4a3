"""Multi-host (DCN) runtime test: a real 2-process jax.distributed CPU
cluster — each process contributes 2 virtual devices to a 4-device global
mesh — exercising multihost.initialize, shard_file_list partitioning, a
cross-process allgather, and a global-mesh reduction. This is the CI
evidence for the DCN layer (parallel/multihost.py docstring contract);
the reference's nearest analog is its np.array_split-over-processes
inference harness (reference evaluate_M1.py:186-222)."""

import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

WORKER = """
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
pid = int(sys.argv[1]); port = sys.argv[2]
sys.path.insert(0, {repo!r})
from guided_vae_nmf_tpu.parallel import multihost, shard_file_list
multihost.initialize(coordinator_address=f"127.0.0.1:{{port}}",
                     num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert multihost.is_multihost()
files = [f"u{{i}}" for i in range(5)]
print("SHARD", pid, ",".join(shard_file_list(files)), flush=True)
import numpy as np, jax.numpy as jnp
from jax.experimental import multihost_utils
g = multihost_utils.process_allgather(jnp.asarray([float(pid + 1)]))
print("ALLGATHER_SUM", pid, float(np.sum(g)), flush=True)
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
mesh = Mesh(np.asarray(jax.devices()), ("data",))
arr = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("data")),
    np.asarray([float(pid + 1)] * 2, np.float32), (4,))
s = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(arr)
print("GLOBAL_SUM", pid, float(np.asarray(s)), flush=True)
""".format(repo=REPO)


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _clean_env():
    env = dict(os.environ)
    for k in ("JAX_PLATFORMS", "XLA_FLAGS", "JAX_COORDINATOR_ADDRESS",
              "JAX_NUM_PROCESSES", "JAX_PROCESS_ID"):
        env.pop(k, None)
    return env


def test_two_process_distributed_cpu_cluster():
    port = _free_port()
    env = _clean_env()
    procs = [
        subprocess.Popen([sys.executable, "-c", WORKER, str(pid), str(port)],
                         env=env, stdout=subprocess.PIPE,
                         stderr=subprocess.STDOUT, text=True, cwd=REPO)
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"

    # disjoint, complete file partition across hosts
    shards = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("SHARD"):
                _, pid, files = line.split(" ", 2)
                shards[int(pid)] = files.split(",")
    assert sorted(shards[0] + shards[1]) == [f"u{i}" for i in range(5)]
    assert not set(shards[0]) & set(shards[1])

    # each process saw both contributions (1.0 + 2.0) via DCN allgather,
    # and the global-mesh reduction over 2x2 devices = 2*1 + 2*2 = 6
    for out in outs:
        assert "ALLGATHER_SUM" in out and " 3.0" in out, out[-2000:]
        assert "GLOBAL_SUM" in out and " 6.0" in out, out[-2000:]
