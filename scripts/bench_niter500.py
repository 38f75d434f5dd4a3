"""Paper-config (500 EM iterations) kernel experiment harness.

BASELINE.md: the paper's published results used 500 MCEM iterations
(reference evaluate_M1.py:92); round 2 measured 71.8x realtime there vs
the 200x north-star. This harness times the fused engine at niter=500 on
a (B, F, N) batch across kernel variants (exact, fast, fast+bf16
matmuls) and checks quality neutrality of the fastest variant against
exact mode on the bundled subset mixtures (|dSI-SDR| / |dESTOI| /
|dPESQ| over seeds).

Usage: python scripts/bench_niter500.py [--batch 32] [--n 512]
       [--niter 500] [--quality 1 --seeds 4]
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


def fast_trans_kw(jnp):
    """The round-3 fast-mode kwargs — single definition so the timing
    variant and the quality gate measure the same configuration."""
    return dict(samples_dtype=jnp.bfloat16, approx_recip=True,
                compute_cost=False, approx_trans=True)


def main(argv=None):
    argv = argv or sys.argv[1:]
    B = flag(argv, "batch", 32, int)
    N = flag(argv, "n", 512, int)
    niter = flag(argv, "niter", 500, int)
    quality = flag(argv, "quality", 0, int)
    seeds = flag(argv, "seeds", 4, int)

    import jax
    import jax.numpy as jnp

    from guided_vae_nmf_tpu.mcem import MCEMConfig
    from guided_vae_nmf_tpu.mcem.pallas_engine import mcem_batch_fused
    from guided_vae_nmf_tpu.models import dgm_init

    F, ydim, L = 513, 513, 32
    dgm = dgm_init(jax.random.PRNGKey(0), [F, ydim, L, [128, 128]])
    rng = np.random.RandomState(0)
    X = jnp.asarray(rng.rand(B, F, N).astype(np.float32) + 0.05)
    y = jnp.asarray((rng.rand(B, ydim, N) > 0.5).astype(np.float32))
    mask = jnp.ones((B, N), jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(1), B)
    cfg = MCEMConfig(niter=niter)
    audio_s = B * N * 256 / 16000.0

    variants = {
        "exact_f32": {},
        "fast_r2": dict(samples_dtype=jnp.bfloat16, approx_recip=True,
                        compute_cost=False),
        "fast_bf16mm": dict(samples_dtype=jnp.bfloat16, approx_recip=True,
                            compute_cost=False,
                            matmul_dtype=jnp.bfloat16),
        # round 3: + bit-arithmetic exp/log in the chain (approx_trans)
        "fast_trans_r3": fast_trans_kw(jnp),
    }
    out = {"batch": B, "n_frames": N, "niter": niter,
           "audio_s": round(audio_s, 1)}
    for name, kw in variants.items():
        def run():
            r = mcem_batch_fused(dgm, X, mask, y, keys, cfg, **kw)
            jax.block_until_ready(r["WFs"])
            return r

        r = run()                  # compile + warm
        # materialize once: guards against a degraded remote backend
        # acknowledging dispatches without executing (ghost timings)
        wf = np.asarray(r["WFs"])
        assert np.all(np.isfinite(wf)) and 0.0 < float(wf.mean()) < 1.0, \
            f"{name}: implausible WFs (mean {float(wf.mean())})"
        t0 = time.perf_counter()
        run()
        dt = time.perf_counter() - t0
        out[name + "_s"] = round(dt, 3)
        out[name + "_rtf"] = round(audio_s / dt, 1)
        print(f"{name}: {dt:.3f}s = {audio_s / dt:.1f}x realtime",
              flush=True)

    if flag(argv, "peem", 0, int):
        # device-level PEEM vs fused-MCEM at the same shape (the honest
        # basis for any README speedup claim; tiny-batch wall clock is
        # dispatch-dominated)
        from guided_vae_nmf_tpu.mcem import PEEMConfig, peem_m2_batch

        pcfg = PEEMConfig(niter=niter)

        def prun():
            r = peem_m2_batch(dgm, X, mask, y, keys, pcfg)
            jax.block_until_ready(r["WFs"])
            return r

        prun()
        t0 = time.perf_counter()
        prun()
        dt = time.perf_counter() - t0
        out["peem_s"] = round(dt, 3)
        out["peem_rtf"] = round(audio_s / dt, 1)
        out["peem_vs_fast_mcem"] = round(
            out["fast_bf16mm_s"] / dt, 2)
        print(f"peem: {dt:.3f}s = {audio_s / dt:.1f}x realtime",
              flush=True)

    refine = flag(argv, "hybrid", 0, int)
    if refine:
        # PEEM warm start + short fused-MCEM refinement: the paper-config
        # fast mode (peem.peem_mcem_m2_batch)
        from guided_vae_nmf_tpu.mcem import (
            PEEMConfig, peem_mcem_m2_batch,
        )

        pcfg = PEEMConfig(niter=niter)
        mcfg = MCEMConfig(niter=refine)
        fast_kw = dict(samples_dtype=jnp.bfloat16, approx_recip=True,
                       compute_cost=False)

        def hrun():
            r = peem_mcem_m2_batch(dgm, X, mask, y, keys, pcfg, mcfg,
                                   **fast_kw)
            jax.block_until_ready(r["WFs"])
            return r

        hrun()
        t0 = time.perf_counter()
        hrun()
        dt = time.perf_counter() - t0
        out["hybrid_refine"] = refine
        out["hybrid_s"] = round(dt, 3)
        out["hybrid_rtf"] = round(audio_s / dt, 1)
        print(f"hybrid(peem {niter} + mcem {refine}): {dt:.3f}s = "
              f"{audio_s / dt:.1f}x realtime", flush=True)

    if quality:
        out["quality"] = _quality_check(
            niter, seeds, refine=refine,
            approx_trans=bool(flag(argv, "approx_trans", 0, int)))
    out.update(backend_info())
    print(json.dumps(out))


def _quality_check(niter, seeds, refine=0, approx_trans=False):
    """Seed-averaged |delta| of the fastest variant vs exact mode on the
    bundled subset mixtures (oracle labels, shipped pretrained M2)."""
    import jax
    import jax.numpy as jnp

    from _common import load_model
    from guided_vae_nmf_tpu.data import read_wav, speech_list
    from guided_vae_nmf_tpu.dsp import stft, istft, clean_speech_IBM
    from guided_vae_nmf_tpu.mcem import MCEMConfig, pad_power
    from guided_vae_nmf_tpu.mcem.pallas_engine import mcem_batch_fused
    from guided_vae_nmf_tpu.metrics import energy_ratios, stoi, pesq

    SUB = "/root/reference/data/subset"
    m2 = load_model("artifacts/pretrained/M2_ibm", kind="dgm")
    files = speech_list(f"{SUB}/raw/", "test")
    base = f"{SUB}/processed/"
    cfg = MCEMConfig(niter=niter)

    utts = []
    for p in files:
        bp = os.path.join(base, os.path.splitext(p)[0])
        x, _ = read_wav(bp + "_x.wav")
        s, _ = read_wav(bp + "_s.wav")
        n, _ = read_wav(bp + "_n.wav")
        X_tf = stft(x)
        yy = clean_speech_IBM(stft(s), 0.98, 0.999)
        utts.append((bp, x, s, n, X_tf, yy))
    N_pad = max((u[4].shape[1] + 127) // 128 * 128 for u in utts)

    def run_mode(seed, engine=None, **kw):
        engine = engine or (lambda *a, **k: mcem_batch_fused(
            *a[:5], cfg, **k))
        mets = []
        for bp, x, s, n, X_tf, yy in utts:
            Xp, m = pad_power(jnp.asarray(np.abs(X_tf) ** 2), N_pad)
            yp = jnp.zeros((yy.shape[0], N_pad)).at[:, :yy.shape[1]].set(
                jnp.asarray(yy))
            out = engine(
                m2, Xp[None], m[None], yp[None],
                jax.random.split(jax.random.PRNGKey(seed), 1), **kw)
            WFs = np.asarray(out["WFs"])[0][:, : X_tf.shape[1]]
            sh = istft(WFs * X_tf, max_len=len(x))
            L = min(len(s), len(sh))
            mets.append((
                energy_ratios(sh[:L], s[:L], n[:L])[0],
                stoi(s[:L], sh[:L], 16000, True),
                pesq(16000, s[:L], sh[:L], "wb"),
            ))
        return np.asarray(mets)

    fast_kw = dict(samples_dtype=jnp.bfloat16, approx_recip=True,
                   compute_cost=False, matmul_dtype=jnp.bfloat16)
    if approx_trans:
        fast_kw = fast_trans_kw(jnp)
    if refine:
        from guided_vae_nmf_tpu.mcem import (
            PEEMConfig, peem_mcem_m2_batch,
        )

        pcfg = PEEMConfig(niter=niter)
        mcfg = MCEMConfig(niter=refine)
        fast_kw = dict(samples_dtype=jnp.bfloat16, approx_recip=True,
                       compute_cost=False)

        def hybrid_engine(m2_, Xp, m, yp, keys, **kw):
            return peem_mcem_m2_batch(m2_, Xp, m, yp, keys, pcfg, mcfg,
                                      **kw)
    else:
        hybrid_engine = None
    ex, fa = [], []
    for k in range(seeds):
        ex.append(run_mode(k))
        fa.append(run_mode(k, engine=hybrid_engine, **fast_kw))
        print(f"quality seed {k} done", flush=True)
    ex = np.mean(np.asarray(ex), axis=0)   # (utt, 3) seed-avg
    fa = np.mean(np.asarray(fa), axis=0)
    for i, (bp, *_rest) in enumerate(utts):
        print(f"  utt {os.path.basename(bp)}: signed d(SI-SDR/ESTOI/PESQ) "
              f"{fa[i,0]-ex[i,0]:+.3f} {fa[i,1]-ex[i,1]:+.4f} "
              f"{fa[i,2]-ex[i,2]:+.4f}", flush=True)
    d = np.abs(fa - ex)
    res = {
        "seeds": seeds,
        "mode": ("hybrid" if refine else
                 "fast_trans_r3" if approx_trans else "fast_bf16mm"),
        "mean_abs_dSISDR": round(float(d[:, 0].mean()), 4),
        "mean_abs_dESTOI": round(float(d[:, 1].mean()), 4),
        "mean_abs_dPESQ": round(float(d[:, 2].mean()), 4),
    }
    print("quality:", res, flush=True)
    return res


if __name__ == "__main__":
    main()
