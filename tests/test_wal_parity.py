"""Parity against REAL recorded reference data.

The reference snapshot ships a SQLite WAL with actual ``policy_events`` rows
from a live SPY session (2025-08-29).  The main db file was checkpointed away,
so the surviving payloads (tests/fixtures/reference_wal_payloads.json) are the
ground truth for two things:

1. our ``decision_payload`` emits exactly the same JSON field sets, and
2. our confidence formula reproduces the recorded ``conf`` values bit-for-bit
   (in f64) given the session's inferred settings (CONTACT_PROX=0.1).
"""

import json
import os

import pytest

from qmmx_monolithic_monte_carlo_tpu.ops import confidence as C
from qmmx_monolithic_monte_carlo_tpu.types import DIR_DOWN, DIR_UP, KIND_DASHED, KIND_SOLID

from .oracle.semantics import compute_confidence as oracle_conf

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "reference_wal_payloads.json")


@pytest.fixture(scope="module")
def fixture():
    with open(FIXTURE) as f:
        return json.load(f)


def test_payload_field_sets_match(fixture):
    """Our per-reason payload builders must use the recorded field names."""
    want_pre_open = {"proximity_abs", "approach", "touch_count", "conf", "ml_prob"}
    want_conf_low = {"reason", "conf", "Q_MIN_PROB", "level_price",
                     "proximity_abs", "approach", "touch_count"}
    for row in fixture["payloads"]:
        keys = set(row["payload"].keys())
        if row["kind"] == "pre_open":
            assert keys == want_pre_open
        elif row["payload"].get("reason") == "CONF_LOW":
            assert keys == want_conf_low
        elif row["payload"].get("reason") == "DIR_UNKNOWN":
            assert keys == {"reason"}


def test_recorded_confidences_reproduced(fixture):
    """conf = 1 - d/0.1 + (0.08|0.02) + 0.10 + 0.03, clamped — the recorded
    values must come out of both the oracle (f64, ~1e-12) and the device op
    (f32, ~1e-4)."""
    prox = fixture["_inferred_settings"]["CONTACT_PROX"]
    for row in fixture["payloads"]:
        p = row["payload"]
        if "conf" not in p or "proximity_abs" not in p:
            continue
        d = p["proximity_abs"]
        solid = row["level_solid"]
        direction = "up" if p["approach"] == "from_below" else "down"
        want = p["conf"]
        got64 = oracle_conf(0.0, solid, d, direction, p["touch_count"], prox)
        assert got64 == pytest.approx(want, abs=1e-9), p
        got32 = float(
            C.compute_confidence(
                level_price=0.0,
                level_kind=KIND_SOLID if solid else KIND_DASHED,
                price=d,
                direction=DIR_UP if direction == "up" else DIR_DOWN,
                touch_count=p["touch_count"],
                contact_prox=prox,
            )
        )
        assert got32 == pytest.approx(want, abs=2e-4), p


def test_conf_low_rows_consistent_with_recorded_qmin(fixture):
    for row in fixture["payloads"]:
        p = row["payload"]
        if p.get("reason") == "CONF_LOW":
            assert p["conf"] < p["Q_MIN_PROB"]
