"""Deployment diagnostics: one command that answers "why doesn't it run?"

Checks, without ever hanging on a wedged accelerator tunnel:
  - JAX import + version, backend reachability via a BOUNDED device probe
    (a dead remote-TPU relay otherwise blocks `jax.devices()` forever),
  - CPU-fallback viability (virtual-mesh compile of a trivial program),
  - the native C++ loader (build/load state, decode self-test),
  - persistent XLA compilation cache (dir, entry count),
  - pretrained artifacts + reference subset data presence,
  - HTTP serving deps (stdlib only — just confirms the module imports).

Exit code 0 when every REQUIRED check passes (accelerator reachability is
reported but not required: the framework runs on the CPU backend).

Usage: python scripts/doctor.py [--probe_s 30]
"""

import os
import sys

sys.path.insert(0, ".")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _common import flag

GREEN, RED, DIM, END = "\033[32m", "\033[31m", "\033[2m", "\033[0m"


def _mark(ok):
    return f"{GREEN}ok{END}" if ok else f"{RED}FAIL{END}"


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    probe_s = flag(argv, "probe_s", 30.0, float)
    required_ok = True

    def check(name, ok, detail="", required=True):
        nonlocal required_ok
        tag = _mark(ok) if required else (
            f"{GREEN}ok{END}" if ok else f"{DIM}unavailable{END}")
        print(f"  [{tag}] {name}" + (f" — {detail}" if detail else ""))
        if required and not ok:
            required_ok = False

    print("gvnmf doctor")

    # --- jax + backend -----------------------------------------------------
    try:
        import jax
        check("jax import", True, f"v{jax.__version__}")
    except Exception as e:
        check("jax import", False, str(e))
        print("cannot continue without jax")
        return 1

    import __graft_entry__ as g
    n_dev = g._count_devices_bounded(probe_s)
    check("accelerator backend", n_dev > 0,
          (f"{n_dev} device(s)" if n_dev else
           f"init unresponsive after {probe_s:.0f}s (wedged tunnel or no "
           "accelerator); CPU fallback below"), required=False)

    # --- CPU fallback: compile + run a trivial program ---------------------
    try:
        import subprocess
        code = (
            "import jax\n"
            "jax.config.update('jax_platforms', 'cpu')\n"
            "import jax.numpy as jnp\n"
            "print(float(jax.jit(lambda x: (x * 2 + 1).sum())"
            "(jnp.arange(7.0))))\n"
        )
        r = subprocess.run([sys.executable, "-c", code], timeout=120,
                           capture_output=True, text=True)
        check("cpu backend compile+run", r.returncode == 0,
              r.stderr.strip().splitlines()[-1] if r.returncode else "")
    except Exception as e:
        check("cpu backend compile+run", False, str(e))

    # --- native loader ------------------------------------------------------
    try:
        from guided_vae_nmf_tpu.data import native_loader as nl
        ok = nl.is_available()
        detail = ""
        if ok:
            import numpy as np
            import tempfile

            from guided_vae_nmf_tpu.data import write_wav

            with tempfile.NamedTemporaryFile(suffix=".wav") as f:
                x = np.linspace(-0.5, 0.5, 333).astype(np.float32)
                write_wav(f.name, x, 16000)
                y, fs = nl.read_wav_native(f.name)
                ok = fs == 16000 and len(y) == 333
                detail = "decode self-test"
        check("native C++ loader", ok, detail, required=False)
    except Exception as e:
        check("native C++ loader", False, str(e), required=False)

    # --- persistent compile cache -------------------------------------------
    cache = os.environ.get("GVNMF_CACHE_DIR") or os.path.expanduser(
        "~/.cache/gvnmf_xla")
    n = len(os.listdir(cache)) if os.path.isdir(cache) else -1
    check("xla compile cache", n >= 0,
          f"{cache} ({n} entries)" if n >= 0 else f"{cache} missing",
          required=False)
    # serving's full-lattice warmup (~30 shapes) takes ~5 min COLD per
    # machine and milliseconds from a populated persistent cache, so an
    # empty/missing cache is the thing to flag before `gvnmf serve --warmup`
    check("serving warmup cost", n > 0,
          "warm (lattice compiles replay from cache)" if n > 0 else
          "cold cache: first `serve --warmup` compiles the full "
          "(batch, bucket) lattice, ~5 min one-time on this machine; "
          "persisted here afterwards", required=False)

    # --- artifacts + data ----------------------------------------------------
    art = "artifacts/pretrained"
    names = ("M1", "M2_ibm", "M2_vad", "classifier_ibm", "classifier_vad",
             "wiener")
    have = [m for m in names if os.path.isdir(os.path.join(art, m))]
    check("pretrained artifacts", len(have) == len(names),
          f"{len(have)}/{len(names)} model dirs under {art}",
          required=False)
    sub = "/root/reference/data/subset"
    check("reference subset data", os.path.isdir(sub), sub, required=False)

    # --- serving modules ------------------------------------------------------
    try:
        import guided_vae_nmf_tpu.http_serving    # noqa: F401
        import guided_vae_nmf_tpu.serving         # noqa: F401
        import guided_vae_nmf_tpu.streaming       # noqa: F401
        check("serving modules import", True)
    except Exception as e:
        check("serving modules import", False, str(e))

    print("doctor:", "healthy" if required_ok else "REQUIRED CHECKS FAILED")
    return 0 if required_ok else 1


if __name__ == "__main__":
    sys.exit(main())
