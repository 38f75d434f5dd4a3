"""VPU / HBM microbenchmark behind the kernel roofline analysis.

VALIDATION.md's paper-config section claims the fused MH chain is
VPU-transcendental-bound (bf16 matmuls flat, batch-scaling flat). This
script produces the chip-side evidence:

  1. streamed elementwise ops over an HBM-resident array — every op
     lands on the ~800 GB/s HBM line (identical Gelem/s for add and
     exp), proving streamed elementwise work is bandwidth-bound;
  2. the same ops chained 64-deep over a smaller array — measured rates
     stay flat across op kinds here too, i.e. XLA materializes each
     elementwise op of a long dependent chain rather than fusing it
     into a register-resident loop.

Interpretation: ANY XLA-level elementwise formulation of the MH chain
is memory-bound at ≤100 Gelem/s on this chip. The Pallas chain kernel's
VMEM-resident loop executes ~1.6e11 transcendental element-ops/s PLUS
the decode matmuls and data-term arithmetic in its 3.7 s paper-config
run — above anything an XLA elementwise pipeline can reach, and with no
memory-side slack left (doubling batch leaves RTF flat,
bench_niter500.py). That is the basis of VALIDATION.md's
"transcendental-roofline, not kernel-efficiency-gap" claim.

Usage: python scripts/bench_vpu.py [--m 8388608] [--iters 400]
       [--inner 64]
"""

import json
import os
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

os.environ.setdefault(
    "GVNMF_CACHE_DIR", os.path.expanduser("~/.cache/gvnmf_xla")
)

import numpy as np

from _common import backend_info, flag


def main(argv=None):
    argv = argv or sys.argv[1:]
    M = flag(argv, "m", 8 * 1024 * 1024, int)
    iters = flag(argv, "iters", 400, int)
    inner = flag(argv, "inner", 64, int)

    import jax
    import jax.numpy as jnp
    from jax import lax

    cases = {
        "add": lambda c: c + 1.000001e-6,
        "exp": lambda c: jnp.exp(-jnp.abs(c)) + 0.1,
        "log": lambda c: jnp.log(c + 1.1),
        "tanh": lambda c: jnp.tanh(c) + 0.2,
        "recip": lambda c: 1.0 / (c + 1.0),
    }

    def timed(run, x, ops):
        v = float(run(x))                  # compile + execute (fetch
        t0 = time.perf_counter()           # forces real execution on
        v = float(run(x))                  # acknowledge-only backends)
        dt = time.perf_counter() - t0
        assert np.isfinite(v)
        return ops / dt / 1e9

    out = {"m": M, "iters": iters, "inner": inner,
           "streamed_gelem_s": {}, "fused_gelem_s": {}}

    # 1) streamed: one op per HBM pass
    x = jnp.asarray(np.random.RandomState(0).rand(M).astype(np.float32)
                    + 0.1)
    for name, fn in cases.items():
        @jax.jit
        def run(x, fn=fn):
            y, _ = lax.scan(lambda c, _: (fn(c), None), x, None,
                            length=iters)
            return jnp.sum(y)

        g = timed(run, x, M * iters)
        out["streamed_gelem_s"][name] = round(g, 1)
        print(f"streamed {name:>6}: {g:7.1f} Gelem/s", flush=True)

    # 2) chained: `inner` dependent ops fused per pass over a small array
    xs = jnp.asarray(
        np.random.RandomState(0).rand(M // 16).astype(np.float32) + 0.1)
    for name, fn in cases.items():
        @jax.jit
        def run(x, fn=fn):
            def body(c, _):
                for _i in range(inner):
                    c = fn(c)
                return c, None
            y, _ = lax.scan(body, x, None, length=max(1, iters // 8))
            return jnp.sum(y)

        g = timed(run, xs, (M // 16) * max(1, iters // 8) * inner)
        out["fused_gelem_s"][name] = round(g, 1)
        print(f"fused    {name:>6}: {g:7.1f} Gelem/s", flush=True)

    hbm = out["streamed_gelem_s"]["add"] * 8 / 1e3   # f32 in+out per elem
    out["implied_hbm_gb_s"] = round(hbm * 1e3, 0)
    out.update(backend_info())
    print(json.dumps(out))


if __name__ == "__main__":
    main()
