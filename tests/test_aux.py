"""Aux-subsystem tests: config CLI overrides, profiling hooks, misc utils."""

import time

import jax

from guided_vae_nmf_tpu.config import (
    PathsConfig,
    StftConfig,
    ModelDims,
    MCEMConfig,
    apply_overrides,
)
from guided_vae_nmf_tpu.ops import StageTimer
from guided_vae_nmf_tpu.utils import count_parameters, get_key
from guided_vae_nmf_tpu.models import vae_init


def test_apply_overrides_types_and_rest():
    cfg, rest = apply_overrides(
        MCEMConfig(),
        ["--niter", "7", "--var_RW", "0.02", "--unknown", "x"],
    )
    assert cfg.niter == 7 and abs(cfg.var_RW - 0.02) < 1e-12
    assert rest == ["--unknown", "x"]
    # tuples parse from comma lists
    dims, _ = apply_overrides(ModelDims(), ["--h_dim", "64,32"])
    assert dims.h_dim == (64, 32)
    # untouched fields keep defaults
    stft_cfg, _ = apply_overrides(StftConfig(), [])
    assert stft_cfg.wlen_sec == 64e-3


def test_paths_config_layout():
    p = PathsConfig(dataset_size="subset", data_root="data")
    assert p.input_speech_dir.endswith("data/subset/raw/")
    assert p.h5_path("noisy_labels").endswith(
        "CSR-1-WSJ-0_noisy_labels.h5"
    )


def test_stage_timer_accumulates():
    t = StageTimer()
    with t.stage("a"):
        time.sleep(0.01)
    with t.stage("a"):
        pass
    with t.stage("b"):
        pass
    assert t.counts["a"] == 2 and t.counts["b"] == 1
    assert t.totals["a"] >= 0.01
    rep = t.report()
    assert "a" in rep and "STAGE" in rep


def test_misc_utils():
    params = vae_init(jax.random.PRNGKey(0), [16, 4, [8]])
    assert count_parameters(params) > 0
    assert get_key(2, {"x": 1, "y": 2}) == "y"
    assert get_key(9, {"x": 1}) == "key doesn't exist"


def test_device_time_ms_cpu():
    """The profiler-trace microbenchmark helper returns a (total, table)
    pair; on CPU there are no TPU device pids, so total degrades to 0 and
    the call must not raise."""
    import jax.numpy as jnp

    from guided_vae_nmf_tpu.ops.profiling import device_time_ms

    total, table = device_time_ms(lambda: jnp.ones((8, 8)) @ jnp.ones((8, 8)))
    assert total >= 0.0 and isinstance(table, list)
