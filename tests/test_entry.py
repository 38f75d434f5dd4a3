"""Driver-contract tests for __graft_entry__.

The driver imports __graft_entry__ in a process it controls — WITHOUT the
pytest conftest that pins JAX to an 8-device virtual CPU mesh — and calls
`dryrun_multichip(8)`. Round 1 shipped an entry that assumed the caller had
already provisioned 8 devices, and the driver check failed (rc=1,
MULTICHIP_r01.json). These tests invoke the entry exactly the way the
driver does: a fresh subprocess with the ambient environment, conftest
absent, so the self-provisioning path (re-exec onto a virtual CPU mesh) is
what gets exercised.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _driver_env():
    """The environment the driver would use: ambient env, minus the CPU/
    virtual-mesh pinning conftest.py injected into this pytest process."""
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    flags = env.get("XLA_FLAGS", "")
    flags = " ".join(
        f for f in flags.split()
        if "xla_force_host_platform_device_count" not in f
    )
    if flags:
        env["XLA_FLAGS"] = flags
    else:
        env.pop("XLA_FLAGS", None)
    return env


def test_dryrun_multichip_driver_style():
    """dryrun_multichip(8) must pass from a clean process with <8 devices
    visible (it re-execs itself onto an 8-way virtual CPU mesh)."""
    code = (
        "import __graft_entry__ as g\n"
        "g.dryrun_multichip(8)\n"
        "print('MULTICHIP-OK')\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        env=_driver_env(),
        cwd=REPO,
        capture_output=True,
        text=True,
        # Cold-persistent-cache compiles of the six stage programs can take
        # >900 s on a loaded host; warm runs are ~1 min (see the entry's
        # GVNMF_CACHE_DIR default).
        timeout=1800,
    )
    assert proc.returncode == 0, (
        f"rc={proc.returncode}\nstdout:\n{proc.stdout[-2000:]}\n"
        f"stderr:\n{proc.stderr[-4000:]}"
    )
    assert "MULTICHIP-OK" in proc.stdout


def test_entry_returns_jittable():
    """entry() must return (fn, args) with fn jittable on the current
    backend (here: the conftest-pinned CPU mesh)."""
    import jax
    import __graft_entry__ as g

    fn, args = g.entry()
    compiled = jax.jit(fn).lower(*args).compile()
    assert compiled is not None
