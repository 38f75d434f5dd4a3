"""Campaign system registry (scripts/eval_campaign.py): the system-name →
pipeline-configuration dispatch is the campaign record's ground truth —
a silent mis-mapping would label one configuration's rows with another
system's name. Pin the mapping with enhance_files mocked out (no models,
no corpus, no device compute), plus the registry invariants the
aggregation relies on (stochastic prefixes, table labels)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "scripts"))

import campaign_tables
import eval_campaign as ec


def test_all_systems_have_table_labels():
    """campaign_tables must be able to label every campaign system —
    an unlabeled system silently drops out of the VALIDATION tables."""
    labeled = {k for k, _ in campaign_tables.LABELS}
    assert set(ec.ALL_SYSTEMS) <= labeled, (
        sorted(set(ec.ALL_SYSTEMS) - labeled))


def test_stochastic_prefixes_cover_mh_systems():
    """Seed replication must hit exactly the MH-stochastic systems:
    everything except the deterministic mixture/wiener rows."""
    stochastic = {s for s in ec.ALL_SYSTEMS
                  if s.startswith(ec.STOCHASTIC_PREFIXES)}
    assert stochastic == set(ec.ALL_SYSTEMS) - {"mixture", "wiener"}


@pytest.mark.parametrize("sysname,expect", [
    ("m2dnn_real-noise", dict(model_type="m2", classif_type="dnn",
                              profile="real-noise", model="M2_ibm")),
    ("m2dnn_reference", dict(model_type="m2", classif_type="dnn",
                             profile="reference", model="M2_ibm")),
    ("m2oracle_impulse-noise", dict(model_type="m2",
                                    classif_type="oracle",
                                    profile="impulse-noise",
                                    model="M2_ibm")),
    ("m2vaddnn_real-noise", dict(model_type="m2", classif_type="dnn",
                                 target="vad", profile="real-noise",
                                 model="M2_vad")),
    ("m2vadoracle_real-noise", dict(model_type="m2",
                                    classif_type="oracle", target="vad",
                                    profile="real-noise",
                                    model="M2_vad")),
    ("m1_spp", dict(model_type="m1", noise_model="spp", profile=None,
                    model="M1")),
    ("m1spp_real-noise", dict(model_type="m1", profile="real-noise",
                              model="M1")),
    ("m1spp_impulse-noise", dict(model_type="m1",
                                 profile="impulse-noise", model="M1")),
])
def test_run_system_dispatch(monkeypatch, tmp_path, sysname, expect):
    captured = {}

    def fake_enhance_files(names, corpus, est, params, **kw):
        captured.update(kw)
        captured["est"] = est

    loaded = {}

    def fake_load_model(path, kind=None, **kw):
        loaded["model"] = os.path.basename(path)
        loaded["kind"] = kind
        return {}

    def fake_dnn_kw(models, cdir):
        captured["classifier_dir"] = cdir
        return dict(classifier_params={}, mean=None, std=None,
                    features="log-power", dnn_threshold=0.85)

    import guided_vae_nmf_tpu.pipeline as pl

    monkeypatch.setattr(pl, "enhance_files", fake_enhance_files)
    monkeypatch.setattr(ec, "load_model", fake_load_model)
    monkeypatch.setattr(ec, "_dnn_kw", fake_dnn_kw)

    ec.run_system(sysname, str(tmp_path), str(tmp_path / "models"),
                  ["a.wav"], niter=3, batch_size=2, seed=1)

    assert loaded["model"] == expect["model"]
    for key in ("classif_type", "target", "noise_model"):
        if key in expect:
            assert captured[key] == expect[key], key
    # profile: None (plain m1_spp) or the name after the first underscore
    assert captured.get("profile") == expect["profile"]
    # guided DNN systems must consume the persisted classifier protocol
    if expect.get("classif_type") == "dnn":
        want_cls = ("classifier_vad" if expect.get("target") == "vad"
                    else "classifier_ibm")
        assert captured["classifier_dir"] == want_cls
        assert captured["dnn_threshold"] == 0.85
    # replicate seeds write to suffixed est dirs (merge-safe record)
    assert captured["est"].endswith(f"{sysname}@s1")
    assert captured["seed"] == 1


def test_unknown_system_rejected(tmp_path):
    with pytest.raises(SystemExit, match="unknown system"):
        ec.run_system("m3_fancy", str(tmp_path), "models", [], 1, 1, 0)
