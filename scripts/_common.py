"""Shared helpers for the evaluation/reconstruction scripts."""

import sys

# Model/side-car loading lives in the package (also used by the `gvnmf`
# console CLI); re-exported here for the scripts.
from guided_vae_nmf_tpu.train import load_model, load_norm_stats  # noqa: F401


def backend_info():
    """Backend/device provenance tag for bench JSON lines.

    Every bench_* script merges this into its output so CPU-vs-TPU
    measurement provenance is recorded mechanically (a VALIDATION.md
    table can never silently mix backends again).
    """
    import jax

    devs = jax.devices()
    return {
        "backend": jax.default_backend(),
        "device": str(devs[0]) if devs else "none",
        "n_devices": len(devs),
    }


def pin_platform(argv):
    """`--platform cpu|tpu`: in-process JAX platform pin.

    The axon site hook re-pins JAX_PLATFORMS at interpreter startup, so
    the environment variable alone CANNOT force a script onto the CPU
    here; `jax.config.update` before first backend use wins over the
    hook. Needed when two script halves must not share the single-client
    TPU tunnel (e.g. validate_parity `--engine ref --platform cpu`
    concurrent with `--engine ours` on the chip — two tunnel clients
    deadlock each other)."""
    plat = flag(argv, "platform", "")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)
    return plat


def flag(rest, name, default=None, cast=str):
    if "--help" in rest or "-h" in rest:
        # Uniform help surface for the flag()-parsed aux CLIs (the
        # apply_overrides-parsed reference CLIs handle --help in
        # config.apply_overrides the same way).
        main_mod = sys.modules.get("__main__")
        doc = (getattr(main_mod, "__doc__", None) or "").strip()
        print(doc or "usage: see --flags in the script source")
        raise SystemExit(0)
    key = f"--{name}"
    if key in rest:
        return cast(rest[rest.index(key) + 1])
    return default
