"""Validated operating-point presets (`--profile`, profiles.py): registry
invariants, config overlay semantics, and end-to-end equivalence —
a profile through `enhance_files` must produce byte-identical output to
the hand-assembled flag combination its VALIDATION.md row was measured
with."""

import dataclasses
import os

import jax
import numpy as np
import pytest

from conftest import REFERENCE_DATA, has_reference_data
from guided_vae_nmf_tpu.mcem import HybridConfig, MCEMConfig, PEEMConfig
from guided_vae_nmf_tpu.profiles import (
    PROFILE_NAMES,
    PROFILES,
    apply_profile_cfg,
    get_profile,
    offline_settings,
    streaming_settings,
)

pytestmark = pytest.mark.skipif(
    not has_reference_data(), reason="reference subset absent"
)


def test_registry_invariants():
    assert set(PROFILE_NAMES) == {
        "reference", "real-noise", "impulse-noise",
        "streaming-low-latency", "streaming-192ms",
    }
    for name, prof in PROFILES.items():
        assert prof.name == name
        assert prof.description
        if prof.offline:
            # offline knobs must be a valid pipeline combination
            from guided_vae_nmf_tpu.pipeline import validate_noise_model

            validate_noise_model(
                prof.noise_model,
                MCEMConfig(**prof.cfg_overrides))


def test_reference_profile_is_parity_defaults():
    """`reference` must leave every managed knob at the reference's
    defaults (the no-surprise contract)."""
    noise_model, soft = offline_settings("reference")
    assert noise_model == "nmf" and soft is False
    cfg = MCEMConfig()
    assert apply_profile_cfg(cfg, "reference") == cfg


def test_apply_profile_cfg_overlays():
    cfg = apply_profile_cfg(MCEMConfig(niter=7), "impulse-noise")
    assert cfg.noise_gain is True
    assert cfg.noise_gain_bands == 2
    assert cfg.niter == 7            # unmanaged knobs untouched
    cfg = apply_profile_cfg(PEEMConfig(), "real-noise")
    assert cfg.noise_gain is True and cfg.noise_gain_bands == 1


def test_hybrid_config_rejects_gain_profiles():
    """HybridConfig has no noise_gain field: gain profiles must raise
    instead of silently dropping the lever."""
    with pytest.raises(ValueError, match="does not support"):
        apply_profile_cfg(HybridConfig(), "real-noise")
    # and the parity profile passes through unchanged
    assert apply_profile_cfg(HybridConfig(), "reference") == HybridConfig()


def test_streaming_only_profile_rejected_offline():
    with pytest.raises(ValueError, match="streaming-only"):
        offline_settings("streaming-low-latency")
    with pytest.raises(ValueError, match="streaming-only"):
        apply_profile_cfg(MCEMConfig(), "streaming-low-latency")


def test_streaming_settings():
    st = streaming_settings("streaming-low-latency")
    assert st["chunk_frames"] == 4           # 128 ms
    assert st["noise_gain_bands"] == 2       # VERDICT item 7 promotion
    assert st["soft_guidance"] and st["residual_tracking"]
    # round-4 validated setting (VALIDATION adaptive-budget table)
    assert st["adaptive_iters"] == 6
    # round-5 balanced 192 ms point: identical levers, chunk=8
    st192 = streaming_settings("streaming-192ms")
    assert st192["chunk_frames"] == 8        # 192 ms
    assert {k: v for k, v in st192.items() if k != "chunk_frames"} == \
           {k: v for k, v in st.items() if k != "chunk_frames"}
    # every streaming-profile key must be a constructor parameter of
    # BOTH stream classes: the consumers pass these through as kwargs,
    # so an unaccepted key would crash — and a key missing from this
    # check could be silently dropped by a consumer's .get() mapping
    import inspect

    from guided_vae_nmf_tpu.streaming import (
        MultiStreamM2Enhancer, StreamingM2Enhancer,
    )

    single = set(inspect.signature(StreamingM2Enhancer).parameters)
    # the pool forwards **enhancer_kwargs into per-slot
    # StreamingM2Enhancer constructors and its fused tick reads the same
    # _TICK_STATICS, so the single class's signature is the contract
    for prof_name in PROFILE_NAMES:
        keys = set(streaming_settings(prof_name) or {})
        assert keys <= single, (
            f"{prof_name}: {sorted(keys - single)} not accepted by "
            "StreamingM2Enhancer")
    # offline profiles carry their causal analogues
    assert streaming_settings("real-noise")["noise_gain"] is True
    assert streaming_settings("impulse-noise")["noise_gain_bands"] == 2


def test_unknown_profile():
    with pytest.raises(ValueError, match="valid:"):
        get_profile("fastest")


def test_enhance_files_profile_equals_manual(tmp_path):
    """profile='impulse-noise' through enhance_files == the explicit
    noise_model/soft_guidance/cfg flag combination (same seed, same
    bytes)."""
    from guided_vae_nmf_tpu.data import speech_list
    from guided_vae_nmf_tpu.models import dgm_init
    from guided_vae_nmf_tpu.pipeline import enhance_files

    files = speech_list(f"{REFERENCE_DATA}/raw/", "test")[:1]
    dgm = dgm_init(jax.random.PRNGKey(0), [513, 513, 8, [32]])
    base = MCEMConfig(niter=3, nsamples_E_step=2, burnin_E_step=2,
                      nsamples_WF=2, burnin_WF=2, nmf_rank=4)

    enhance_files(files, f"{REFERENCE_DATA}/processed/",
                  str(tmp_path / "prof"), dgm, model_type="m2",
                  classif_type="oracle", cfg=base,
                  profile="impulse-noise")
    enhance_files(files, f"{REFERENCE_DATA}/processed/",
                  str(tmp_path / "manual"), dgm, model_type="m2",
                  classif_type="oracle",
                  cfg=dataclasses.replace(base, noise_gain=True,
                                          noise_gain_bands=2),
                  noise_model="spp", soft_guidance=True)

    name = os.path.splitext(files[0])[0] + "_s_est.wav"
    a = open(tmp_path / "prof" / name, "rb").read()
    b = open(tmp_path / "manual" / name, "rb").read()
    assert a == b


def test_enhance_files_profile_overrides_explicit_args(tmp_path):
    """The profile is authoritative for its managed knobs: an explicit
    conflicting noise_model is replaced (documented semantics)."""
    from guided_vae_nmf_tpu.data import speech_list
    from guided_vae_nmf_tpu.models import dgm_init
    from guided_vae_nmf_tpu.pipeline import enhance_files

    files = speech_list(f"{REFERENCE_DATA}/raw/", "test")[:1]
    dgm = dgm_init(jax.random.PRNGKey(0), [513, 513, 8, [32]])
    base = MCEMConfig(niter=3, nsamples_E_step=2, burnin_E_step=2,
                      nsamples_WF=2, burnin_WF=2, nmf_rank=4)
    enhance_files(files, f"{REFERENCE_DATA}/processed/",
                  str(tmp_path / "a"), dgm, model_type="m2",
                  classif_type="oracle", cfg=base, noise_model="nmf",
                  profile="real-noise")
    enhance_files(files, f"{REFERENCE_DATA}/processed/",
                  str(tmp_path / "b"), dgm, model_type="m2",
                  classif_type="oracle",
                  cfg=dataclasses.replace(base, noise_gain=True),
                  noise_model="spp2", soft_guidance=True)
    name = os.path.splitext(files[0])[0] + "_s_est.wav"
    assert (open(tmp_path / "a" / name, "rb").read()
            == open(tmp_path / "b" / name, "rb").read())
