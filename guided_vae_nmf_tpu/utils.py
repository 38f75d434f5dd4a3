"""Misc utilities (reference python/utils.py:5-22)."""

import subprocess
import sys


def count_parameters(params):
    """Trainable parameter count; re-exported from models.nets (reference
    utils.py:7-8)."""
    from .models.nets import count_parameters as _cp

    return _cp(params)


def open_file(path):
    """Open a file/folder with the platform handler (reference
    utils.py:10-17)."""
    if sys.platform == "win32":
        import os

        os.startfile(path)
    else:
        opener = "open" if sys.platform == "darwin" else "xdg-open"
        subprocess.call([opener, path])


def get_key(val, my_dict):
    """Reverse dictionary lookup (reference utils.py:19-22)."""
    for key, value in my_dict.items():
        if val == value:
            return key
    return "key doesn't exist"


def device_warmup():
    """Dispatch one trivial jitted op and block on it.

    Works around a first-compile race observed on the remote-tunnel TPU
    backend: a process whose FIRST dispatched program is large can wedge
    waiting on the server socket, while the same program runs fine after
    any small program has completed the client/server handshake. Called
    at the top of the heavy entry points (trainer.fit, enhance_files,
    bench mains); a no-op costing ~1 ms on healthy local backends.
    """
    try:
        import jax
        import jax.numpy as jnp

        jax.jit(lambda x: x + 1)(jnp.zeros(8)).block_until_ready()
    except Exception:  # pragma: no cover - never block real work on this
        pass
