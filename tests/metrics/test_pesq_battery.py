"""Portable PESQ conformance battery regression (VERDICT round-4 item 6).

The battery (scripts/pesq_battery.py) is the in-tree instrument a
wheel-bearing environment runs standalone to check the first-party
P.862.2 scale; here we pin that regenerating its deterministic signals
reproduces the committed expected scores, so the committed JSON is always
a faithful snapshot of the shipped implementation.
"""

import json
import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(REPO, "scripts"))

EXPECTED = os.path.join(REPO, "artifacts", "pesq_battery_expected.json")

# a cheap representative subset (full battery = 18 cases, ~40 s serial);
# spans noise, alignment (incl. time-varying delay), clipping, identity
SUBSET = ("identical", "white_snr10", "tv_delay_20_80ms", "clip_50pc")


@pytest.fixture(scope="module")
def cases():
    import pesq_battery

    return {n: (s, d) for n, s, d in pesq_battery.battery()
            if n in SUBSET}


def test_expected_file_covers_battery():
    import pesq_battery

    exp = json.load(open(EXPECTED))["cases"]
    names = [n for n, _, _ in pesq_battery.battery()]
    assert sorted(exp) == sorted(names)
    # sanity ordering the scale must satisfy: more noise = lower MOS
    assert (exp["white_snr20"]["first_party"]
            > exp["white_snr10"]["first_party"]
            > exp["white_snr0"]["first_party"])
    assert exp["identical"]["first_party"] == pytest.approx(4.6439,
                                                            abs=1e-3)


def test_regenerated_scores_match_committed(cases):
    from guided_vae_nmf_tpu.metrics.pesq import pesq

    exp = json.load(open(EXPECTED))["cases"]
    for name, (s, d) in cases.items():
        got = float(pesq(16000, s, d, "wb"))
        assert got == pytest.approx(exp[name]["first_party"], abs=2e-3), \
            name


def test_battery_signals_are_deterministic():
    import pesq_battery

    a = {n: d for n, _, d in pesq_battery.battery()}
    b = {n: d for n, _, d in pesq_battery.battery()}
    for n in a:
        np.testing.assert_array_equal(a[n], b[n])
