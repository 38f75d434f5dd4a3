"""Shard-balance / padding-waste harness for the mesh-sharded sweep.

Synthesizes a deliberately skewed-length utterance set (SURVEY §2.7 P1:
per-utterance lengths vary ~10x), plans it with the mesh-aware batcher
(pipeline.plan_batches), and reports:

  * the batch plan (sizes x bucket n_pad),
  * duplicate-row padding waste (rows computed but never written),
  * frame-padding waste ((n_pad - n_frames) work inside kept rows),
  * per-shard assigned frame counts (load balance across the data axis),
  * per-batch wall time of the actual sharded sweep, and
  * equality of the sharded outputs vs the single-device sweep on the
    same ragged set.

Runs on the 8-way virtual CPU mesh by default (JAX_PLATFORMS=cpu,
xla_force_host_platform_device_count=8); on real hardware drop the pins.

Usage: python scripts/bench_shard_balance.py [--utts 22] [--niter 3]
       [--cpu 1]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from _common import backend_info, flag  # noqa: E402


def main(argv=None):
    argv = argv or sys.argv[1:]
    n_utts = flag(argv, "utts", 22, int)
    niter = flag(argv, "niter", 3, int)
    use_cpu = flag(argv, "cpu", 1, int)
    if use_cpu:
        os.environ.setdefault("XLA_FLAGS",
                              "--xla_force_host_platform_device_count=8")
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        import jax

    import numpy as np

    from guided_vae_nmf_tpu.data import write_wav, read_wav
    from guided_vae_nmf_tpu.mcem import MCEMConfig
    from guided_vae_nmf_tpu.models import dgm_init
    from guided_vae_nmf_tpu.parallel import make_mesh
    from guided_vae_nmf_tpu.pipeline import enhance_files, plan_batches
    from guided_vae_nmf_tpu.dsp.stft import frame_count

    FS = 16000
    work = "/tmp/shard_balance"
    proc = os.path.join(work, "proc")
    os.makedirs(proc, exist_ok=True)

    # skewed lengths: half short (1-2 s), a third medium (3-6 s), the rest
    # long (8-14 s) — a ragged mix that defeats naive per-bucket batching
    rng = np.random.RandomState(0)
    files = []
    for i in range(n_utts):
        if i % 2 == 0:
            sec = rng.uniform(1.0, 2.0)
        elif i % 3 == 0:
            sec = rng.uniform(8.0, 14.0)
        else:
            sec = rng.uniform(3.0, 6.0)
        n = int(sec * FS)
        t = np.arange(n) / FS
        s = 0.1 * np.sin(2 * np.pi * np.cumsum(
            140 + 40 * np.sin(2 * np.pi * 0.4 * t + i)) / FS)
        s *= np.clip(np.sin(2 * np.pi * 1.9 * t + 0.3 * i), 0, None)
        x = s + 0.05 * rng.randn(n)
        name = f"utt{i:03d}.wav"
        write_wav(os.path.join(proc, f"utt{i:03d}_s.wav"),
                  s.astype(np.float32), FS)
        write_wav(os.path.join(proc, f"utt{i:03d}_x.wav"),
                  x.astype(np.float32), FS)
        files.append(name)

    mesh = make_mesh()
    n_dev = mesh.shape["data"]
    n_frames_all = [
        frame_count(len(read_wav(os.path.join(
            proc, f"utt{i:03d}_x.wav"))[0]))
        for i in range(n_utts)
    ]

    # ---- plan accounting -------------------------------------------------
    def account(plan, label):
        dup_rows = 0
        kept_frames = 0
        pad_frames = 0
        shard_frames = np.zeros(n_dev, np.int64)
        nf = dict(zip(files, n_frames_all))
        for paths, n_pad, _ in plan:
            B = len(paths)
            Bp = -(-B // n_dev) * n_dev
            dup_rows += (Bp - B)
            kept_frames += sum(nf[p] for p in paths)
            pad_frames += sum(n_pad - nf[p] for p in paths)
            # row r of the padded batch lands on shard r * n_dev // Bp
            for r in range(Bp):
                shard_frames[r * n_dev // Bp] += n_pad
        print(f"\n[{label}] batches: " + ", ".join(
            f"{len(p)}x{n}" for p, n, _ in plan))
        dup_work = sum(
            (-(-len(p) // n_dev) * n_dev - len(p)) * n for p, n, _ in plan)
        tot_work = sum(
            -(-len(p) // n_dev) * n_dev * n for p, n, _ in plan)
        print(f"[{label}] duplicate rows: {dup_rows} "
              f"({100.0 * dup_work / tot_work:.1f}% of row-frame work)")
        print(f"[{label}] frame padding: {pad_frames} frames "
              f"({100.0 * pad_frames / tot_work:.1f}% of work; "
              f"{kept_frames} real)")
        print(f"[{label}] per-shard frames: {shard_frames.tolist()} "
              f"(imbalance {shard_frames.max() / shard_frames.mean():.2f}x)")
        return dup_work, pad_frames, tot_work

    naive_plan = plan_batches(files, n_frames_all, batch_size=16,
                              n_dev=1, seed=0)
    account(naive_plan, "mesh-naive plan (n_dev=1 cuts, mesh padding)")
    plan = plan_batches(files, n_frames_all, batch_size=16, n_dev=n_dev,
                        seed=0)
    dup_work, _, tot_work = account(plan, "mesh-aware plan")
    assert dup_work / tot_work < 0.10, "duplicate-row waste exceeds 10%"

    # ---- actual sweeps: equality + per-batch timing ----------------------
    dgm = dgm_init(jax.random.PRNGKey(0), [513, 513, 8, [32]])
    cfg = MCEMConfig(niter=niter, nsamples_E_step=2, burnin_E_step=2,
                     nsamples_WF=2, burnin_WF=2)
    t0 = time.time()
    enhance_files(files, proc, os.path.join(work, "single"), dgm,
                  model_type="m2", classif_type="oracle", cfg=cfg,
                  batch_size=16)
    t_single = time.time() - t0
    t0 = time.time()
    enhance_files(files, proc, os.path.join(work, "mesh"), dgm,
                  model_type="m2", classif_type="oracle", cfg=cfg,
                  batch_size=16, mesh=mesh)
    t_mesh = time.time() - t0
    worst = 0.0
    for i in range(n_utts):
        s1, _ = read_wav(os.path.join(work, "single",
                                      f"utt{i:03d}_s_est.wav"))
        sm, _ = read_wav(os.path.join(work, "mesh",
                                      f"utt{i:03d}_s_est.wav"))
        assert len(s1) == len(sm)
        worst = max(worst, float(np.max(np.abs(s1 - sm))))
    print(f"\nsharded == single-device on the ragged set: "
          f"max |delta| = {worst * 32768:.1f} LSB (PCM16)")
    assert worst <= 4.0 / 32768
    print(f"wall: single-device {t_single:.1f}s, 8-way mesh {t_mesh:.1f}s "
          f"(virtual CPU devices share the host; on real chips the mesh "
          f"time divides by the shard count)")


if __name__ == "__main__":
    main()
