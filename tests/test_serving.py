"""Dynamic-batching serving layer (guided_vae_nmf_tpu/serving.py): online
submit/enhance contract, grouping under the wait window, per-request key
determinism on the XLA engine, degraded-batch handling, stats/close."""

import threading
import time

import numpy as np
import jax
import pytest

from guided_vae_nmf_tpu.mcem import MCEMConfig
from guided_vae_nmf_tpu.models import vae_init
from guided_vae_nmf_tpu.serving import EnhancementService, ServeConfig

F, L, H = 513, 8, 16
CFG = MCEMConfig(niter=2, nsamples_E_step=2, burnin_E_step=1,
                 nsamples_WF=2, burnin_WF=1, nmf_rank=2)
SV = ServeConfig(engine="xla", label_mode="none", noise_model="nmf",
                 max_wait_ms=50.0)


@pytest.fixture(scope="module")
def m1():
    return vae_init(jax.random.PRNGKey(0), [F, L, [H]])


def _wav(seed, seconds):
    r = np.random.RandomState(seed)
    return (0.1 * r.randn(int(16000 * seconds))).astype(np.float32)


def test_submit_roundtrip_and_mixture_consistency(m1):
    with EnhancementService(m1, cfg=CFG, serve=SV) as svc:
        xs = [_wav(1, 0.4), _wav(2, 0.9), _wav(3, 0.6)]
        futs = [svc.submit(x) for x in xs]
        outs = [f.result(timeout=300) for f in futs]
        for x, out in zip(xs, outs):
            assert out["s"].shape == x.shape
            assert np.all(np.isfinite(out["s"]))
            # Wiener partition: s + n reconstructs the mixture (PCM16
            # quantization of both tracks -> tolerance ~2 LSB)
            np.testing.assert_allclose(out["s"] + out["n"], x,
                                       atol=3.0 / 32768.0)
        st = svc.stats()
        assert st["requests"] == 3
        assert st["batches"] >= 1


def test_same_rid_same_result_regardless_of_cobatching(m1):
    """XLA engine + per-request keys: request #1's MH randomness must not
    depend on what else rode in its batch. Bit-equality holds for equal
    batch shapes; across different compiled shapes XLA may reorder float
    reductions, so the contract is agreement to ~1 PCM16 LSB (vs ~0.05
    RMS between different MH seeds — orders of magnitude apart)."""
    x = _wav(7, 0.5)

    with EnhancementService(m1, cfg=CFG, serve=SV) as svc:
        alone = svc.submit(x).result(timeout=300)
        again = svc.submit(x).result(timeout=300)   # same shape, rid 2
    # different rid -> different MH draws -> visibly different output
    assert np.abs(alone["s"] - again["s"]).max() > 10.0 / 32768.0

    slow = ServeConfig(engine="xla", label_mode="none",
                       noise_model="nmf", max_wait_ms=2000.0)
    with EnhancementService(m1, cfg=CFG, serve=slow) as svc:
        f1 = svc.submit(x)                   # rid 1, held open
        f2 = svc.submit(_wav(8, 0.5))        # rid 2, same bucket
        both = f1.result(timeout=300)
        assert both["batch_size"] == 2
        f2.result(timeout=300)

    np.testing.assert_allclose(alone["s"], both["s"],
                               atol=2.0 / 32768.0)


def test_bucketing_splits_length_groups(m1):
    """A 0.3 s and an 8 s request exceed the pad-waste budget (bucket 128
    vs 512 -> 75% waste) and must run as separate device programs."""
    slow = ServeConfig(engine="xla", label_mode="none",
                       noise_model="nmf", max_wait_ms=1000.0)
    with EnhancementService(m1, cfg=CFG, serve=slow) as svc:
        f1 = svc.submit(_wav(4, 0.3))
        f2 = svc.submit(_wav(5, 8.0))
        o1, o2 = f1.result(timeout=600), f2.result(timeout=600)
        assert o1["batch_size"] == 1 and o2["batch_size"] == 1
        assert svc.stats()["batches"] == 2


def test_coalescing_merges_adjacent_buckets(m1):
    """A 1.9 s and a 3.9 s request (buckets 128 and 256, 50% waste) merge
    into ONE dispatch under the default max_pad_waste=0.5; with
    coalescing disabled they split."""
    slow = ServeConfig(engine="xla", label_mode="none",
                       noise_model="nmf", max_wait_ms=1000.0)
    with EnhancementService(m1, cfg=CFG, serve=slow) as svc:
        f1 = svc.submit(_wav(4, 1.9))
        f2 = svc.submit(_wav(5, 3.9))
        o1, o2 = f1.result(timeout=600), f2.result(timeout=600)
        assert o1["batch_size"] == 2 and o2["batch_size"] == 2
        assert svc.stats()["batches"] == 1
        # the short request still comes back at its own length, finite
        assert o1["s"].shape == (int(16000 * 1.9),)
        assert np.all(np.isfinite(o1["s"]))

    off = ServeConfig(engine="xla", label_mode="none",
                      noise_model="nmf", max_wait_ms=1000.0,
                      max_pad_waste=0.0)
    with EnhancementService(m1, cfg=CFG, serve=off) as svc:
        f1 = svc.submit(_wav(4, 1.9))
        f2 = svc.submit(_wav(5, 3.9))
        f1.result(timeout=600), f2.result(timeout=600)
        assert svc.stats()["batches"] == 2


def test_concurrent_producers(m1):
    with EnhancementService(m1, cfg=CFG, serve=SV) as svc:
        outs = {}

        def client(i):
            outs[i] = svc.enhance(_wav(10 + i, 0.4))

        ts = [threading.Thread(target=client, args=(i,)) for i in range(4)]
        for t in ts:
            t.start()
        for t in ts:
            t.join(300)
        assert len(outs) == 4
        assert all(np.all(np.isfinite(o["s"])) for o in outs.values())


def test_close_rejects_new_submits(m1):
    svc = EnhancementService(m1, cfg=CFG, serve=SV)
    svc.submit(_wav(20, 0.3)).result(timeout=300)
    svc.close()
    svc.close()                              # idempotent
    with pytest.raises(RuntimeError):
        svc.submit(_wav(21, 0.3))


def test_bad_input_rejected(m1):
    with EnhancementService(m1, cfg=CFG, serve=SV) as svc:
        with pytest.raises(ValueError):
            svc.submit(np.zeros((2, 100), np.float32))
        with pytest.raises(ValueError):
            svc.submit(np.zeros(0, np.float32))
        bad = np.zeros(1000, np.float32)
        bad[3] = np.nan
        with pytest.raises(ValueError):
            svc.submit(bad)


def test_host_key_layout_matches_prngkey():
    """The serving layer builds threefry keys on the host; pin the layout
    against jax.random.PRNGKey so a jax-side change cannot silently alter
    request RNG streams."""
    for x in (0, 5, 1_000_003 * 7 + 42, 2**40 + 17):
        np.testing.assert_array_equal(
            np.asarray(jax.random.PRNGKey(x)),
            np.array([0, x & 0xFFFFFFFF], np.uint32))


def test_mesh_sharded_service_matches_single_device(m1):
    """Multi-chip serving: the same requests through a mesh-sharded
    service (8-way virtual CPU mesh, shard_map over the data axis) must
    produce the single-device service's outputs bit-for-bit (XLA engine,
    identical per-request keys; zero collectives in the program)."""
    from guided_vae_nmf_tpu.parallel import make_mesh

    xs = [_wav(30 + i, 0.5) for i in range(3)]
    slow = ServeConfig(engine="xla", label_mode="none",
                       noise_model="nmf", max_wait_ms=2000.0)

    def run(mesh):
        with EnhancementService(m1, cfg=CFG, serve=slow,
                                mesh=mesh) as svc:
            futs = [svc.submit(x) for x in xs]
            return [f.result(timeout=600) for f in futs]

    single = run(None)
    sharded = run(make_mesh())
    assert sharded[0]["batch_size"] == 3
    # per-request keys + per-row programs: agreement to ~1 PCM16 LSB
    # (the mesh pads B=3 -> 8 rows vs 4 single-device, and XLA may
    # reorder float reductions across compiled shapes — same bound as
    # the co-batching test; different MH seeds would differ by ~0.05 RMS)
    for a, b in zip(single, sharded):
        np.testing.assert_allclose(a["s"], b["s"], atol=2.0 / 32768.0)


def test_spp2_noise_model_serving_path(m1):
    """noise_model='spp2' (two-pass) through the serving program: output
    is finite, mixture-consistent, and differs from single-pass 'spp'."""
    sv2 = ServeConfig(engine="xla", label_mode="none", noise_model="spp2",
                      max_wait_ms=20.0)
    sv1 = ServeConfig(engine="xla", label_mode="none", noise_model="spp",
                      max_wait_ms=20.0)
    x = _wav(11, 0.5)
    with EnhancementService(m1, cfg=CFG, serve=sv2) as svc:
        out2 = svc.submit(x).result(timeout=300)
    with EnhancementService(m1, cfg=CFG, serve=sv1) as svc:
        out1 = svc.submit(x).result(timeout=300)
    assert np.all(np.isfinite(out2["s"]))
    np.testing.assert_allclose(out2["s"] + out2["n"], x, atol=3.0 / 32768.0)
    assert not np.array_equal(out2["s"], out1["s"])


def test_queue_backpressure(m1):
    """max_queue bounds the waiting queue: the overflow submit raises
    QueueFullError; earlier requests still complete."""
    from guided_vae_nmf_tpu.serving import QueueFullError

    tight = ServeConfig(engine="xla", label_mode="none", noise_model="nmf",
                        max_wait_ms=2000.0, max_queue=2)
    with EnhancementService(m1, cfg=CFG, serve=tight) as svc:
        futs = []
        raised = False
        # the collector may pop the first request(s) into a group before
        # the flood lands, so keep submitting until the bound trips
        for i in range(20):
            try:
                futs.append(svc.submit(_wav(i, 0.3)))
            except QueueFullError:
                raised = True
                break
        assert raised, "max_queue=2 never tripped over 20 rapid submits"
        for f in futs:
            out = f.result(timeout=300)
            assert np.all(np.isfinite(out["s"]))


def test_serveconfig_rejected_at_init(m1):
    """Misconfiguration must fail at construction, not inside the worker
    thread (where a StopIteration would strand every grouped request)."""
    bad = [
        ServeConfig(engine="xla", label_mode="none",
                    max_batch=32),                    # > lattice max (16)
        ServeConfig(engine="xla", label_mode="none",
                    batch_lattice=(4, 2, 1)),         # not increasing
        ServeConfig(engine="xla", label_mode="none",
                    batch_lattice=()),                # empty lattice
        ServeConfig(engine="xla", label_mode="none",
                    noise_model="ssp"),               # typo'd noise model
    ]
    for sv in bad:
        with pytest.raises(ValueError):
            EnhancementService(m1, cfg=CFG, serve=sv)


def test_serving_noise_gain(m1):
    """MCEMConfig.noise_gain rides the serving config into the jitted
    core (spp default noise model): finite output, and the nmf noise
    model is rejected at construction."""
    import dataclasses

    cfg = dataclasses.replace(CFG, noise_gain=True)
    svc = EnhancementService(
        m1, cfg=cfg,
        serve=ServeConfig(engine="xla", label_mode="none",
                          noise_model="spp"))
    try:
        x = np.random.RandomState(0).randn(8000).astype(np.float32) * 0.1
        out = svc.enhance(x)
        assert out["s"].shape == x.shape
        assert np.all(np.isfinite(out["s"]))
    finally:
        svc.close()
    with pytest.raises(ValueError, match="noise_gain"):
        EnhancementService(
            m1, cfg=cfg,
            serve=ServeConfig(engine="xla", label_mode="none",
                              noise_model="nmf"))
