"""Golden end-to-end session: the full stack (feed → engine → SQLite → training
→ portfolio) replayed deterministically and pinned against committed values.

Any behavioral regression anywhere in the stack — gate ordering, latch
semantics, cooldowns, escalation, audit payloads, trade lifecycle, watermark
training — moves at least one of these numbers.
"""

import numpy as np
import pytest

from qmmx_monolithic_monte_carlo_tpu.host.app import EngineHost
from qmmx_monolithic_monte_carlo_tpu.io import analyzer
from qmmx_monolithic_monte_carlo_tpu.io import db as _db
from qmmx_monolithic_monte_carlo_tpu.io import feed as feed_io

GOLDEN = {
    "reason_counts": {"CONF_LOW": 6, "COOLDOWN": 99, "IN_POSITION": 203,
                      "PRICE_STALE": 1, "TOO_FAR": 681},
    "trades": 10,
    "closed": 9,
    "wins": 6,
    "losses": 3,
    "contacts": 6,
    "exit_events": 9,
    "realized": 0.63,
}


def test_golden_session(tmp_path):
    db = str(tmp_path / "q.db")
    c = _db.db_connect(db)
    _db.db_init(c)
    _db.replace_levels(c, [
        {"color": "blue", "type": "solid", "index": 0, "price": 100.0},
        {"color": "orange", "type": "dashed", "index": 0, "price": 100.4},
        {"color": "teal", "type": "solid", "index": 0, "price": 99.6},
    ])
    _db.settings_set(c, "Q_MIN_PROB", "0.5")
    _db.settings_set(c, "DISABLE_POLICY_GATE", "1")
    feed = feed_io.SyntheticFeed("SYN", s0=100.0, sigma=2.0, seed=12345)
    host = EngineHost(db_path=db, feed=feed, symbol="SYN", tick_sleep=0.0,
                      policy_path=str(tmp_path / "p.npz"),
                      lr_model_path=str(tmp_path / "l.npz"),
                      retrain_interval_s=0.0, log=lambda *a: None)
    host.run(max_ticks=1000, sleep=lambda s: None)

    res = analyzer.analyze_policy_events(c)
    assert res["counts"] == GOLDEN["reason_counts"]
    assert c.execute("SELECT COUNT(*) FROM trades").fetchone()[0] == GOLDEN["trades"]
    assert c.execute("SELECT COUNT(*) FROM trades WHERE ts_close IS NOT NULL"
                     ).fetchone()[0] == GOLDEN["closed"]
    assert c.execute("SELECT COUNT(*) FROM contact_events").fetchone()[0] \
        == GOLDEN["contacts"]
    assert c.execute("SELECT COUNT(*) FROM policy_events WHERE phase='exit'"
                     ).fetchone()[0] == GOLDEN["exit_events"]
    snap = host.portfolio()
    assert snap["wins"] == GOLDEN["wins"]
    assert snap["losses"] == GOLDEN["losses"]
    assert snap["realized"] == pytest.approx(GOLDEN["realized"], abs=1e-6)
    # the incremental trainer consumed labeled events during the run
    assert not np.allclose(np.asarray(host.policy.w_entry), 0.0)


def test_strict_quirks_session_differs_predictably(tmp_path):
    """The same tape under strict_reference_quirks: no contact events (Q9), no
    escalations (Q8), VETO-family skips audited as ENGINE_ERR (Q1), and the
    sim candidate discovery double-evaluates (Q2)."""
    from qmmx_monolithic_monte_carlo_tpu.config import CompatFlags

    db = str(tmp_path / "q.db")
    c = _db.db_connect(db)
    _db.db_init(c)
    _db.replace_levels(c, [
        {"color": "blue", "type": "solid", "index": 0, "price": 100.0},
        {"color": "orange", "type": "dashed", "index": 0, "price": 100.4},
        {"color": "teal", "type": "solid", "index": 0, "price": 99.6},
    ])
    _db.settings_set(c, "Q_MIN_PROB", "0.5")
    _db.settings_set(c, "DISABLE_POLICY_GATE", "1")
    feed = feed_io.SyntheticFeed("SYN", s0=100.0, sigma=2.0, seed=12345)
    host = EngineHost(db_path=db, feed=feed, symbol="SYN", tick_sleep=0.0,
                      compat=CompatFlags.strict_reference_quirks(),
                      policy_path=str(tmp_path / "p.npz"),
                      lr_model_path=str(tmp_path / "l.npz"),
                      retrain_interval_s=0.0, log=lambda *a: None)
    host.run(max_ticks=1000, sleep=lambda s: None)
    # Q9: strict mode writes no contact events
    assert c.execute("SELECT COUNT(*) FROM contact_events").fetchone()[0] == 0
    # trades still open/close (the tape is the same market)
    assert c.execute("SELECT COUNT(*) FROM trades").fetchone()[0] >= 1
    # Q2 in the engine is decision-idempotent thanks to the latch, so reason
    # counts still aggregate; the analyzer keeps working under strict mode
    res = analyzer.analyze_policy_events(c)
    assert res["total"] > 0
