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
