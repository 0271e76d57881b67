"""Feeds: Polygon adapter against a mocked transport, replay feed, host glue."""

import pytest

from qmmx_monolithic_monte_carlo_tpu.io import feed as F


class _FakeResponse:
    def __init__(self, status_code=200, payload=None, text=""):
        self.status_code = status_code
        self._payload = payload or {}
        self.text = text

    def json(self):
        return self._payload


class _FakeSession:
    def __init__(self, responses):
        self.responses = responses  # url-substring -> _FakeResponse
        self.calls = []

    def get(self, url, params=None, timeout=None):
        self.calls.append((url, params))
        for frag, resp in self.responses.items():
            if frag in url:
                return resp
        return _FakeResponse(404, {}, "not found")


def _feed_with(responses):
    f = F.PolygonFeed("spy")
    f.session = _FakeSession(responses)
    return f


def test_market_status_paths():
    f = _feed_with({"marketstatus": _FakeResponse(200, {"market": "open"})})
    s = f.get_market_status("k")
    assert s.is_open and s.session == "open"
    f = _feed_with({"marketstatus": _FakeResponse(200, {"market": "extended-hours"})})
    s = f.get_market_status("k")
    assert not s.is_open and s.session == "extended-hours"
    f = _feed_with({"marketstatus": _FakeResponse(500, {}, "boom")})
    assert f.get_market_status("k").session == "unknown"


def test_prev_close_and_errors():
    f = _feed_with({"/prev": _FakeResponse(200, {"results": [{"c": 648.5}]})})
    px, err = f.get_prev_close("k")
    assert px == 648.5 and err is None
    f = _feed_with({"/prev": _FakeResponse(200, {"results": []})})
    px, err = f.get_prev_close("k")
    assert px is None and "no results" in err
    f = _feed_with({"/prev": _FakeResponse(503, {}, "oops")})
    px, err = f.get_prev_close("k")
    assert px is None and "503" in err


def test_last_trade_ns_to_ms():
    f = _feed_with({"/last/trade/SPY": _FakeResponse(
        200, {"results": {"p": 648.31, "t": 1_756_000_000_123_456_789}})})
    px, t_ms, err = f.get_last_trade("k")
    assert px == 648.31 and err is None
    assert t_ms == 1_756_000_000_123_456_789 // 1_000_000
    f = _feed_with({"/last/trade/SPY": _FakeResponse(200, {"results": {}})})
    px, t_ms, err = f.get_last_trade("k")
    assert px is None and "missing p/t" in err


def test_minute_bars_trim_and_key_filter():
    results = [{"t": i, "o": 1.0, "h": 2.0, "l": 0.5, "c": 1.5, "v": 3.0}
               for i in range(100)]
    results.append({"t": 100, "o": 1.0})  # malformed row filtered out
    f = _feed_with({"/range/1/minute/": _FakeResponse(200, {"results": results})})
    bars, err = f.get_minute_bars("k", minutes=30)
    assert err is None and len(bars) == 30
    assert bars[-1]["t"] == 99 and bars[0]["t"] == 70
    assert all("v" in b for b in bars)
    # uppercased symbol reaches the URL
    assert "SPY" in f.session.calls[0][0]


def test_replay_feed_drives_host(tmp_path):
    import numpy as np

    from qmmx_monolithic_monte_carlo_tpu.host.app import EngineHost
    from qmmx_monolithic_monte_carlo_tpu.io import db as _db

    rng = np.random.default_rng(3)
    prints = []
    t = 1_000_000
    px = 100.0
    for _ in range(300):
        t += int(rng.integers(400, 1500))
        px = round(px + float(rng.normal(0, 0.05)), 2)
        prints.append((t, px))
    feed = F.ReplayFeed("SPY", prints)

    db = str(tmp_path / "q.db")
    c = _db.db_connect(db)
    _db.db_init(c)
    _db.replace_levels(c, [{"color": "blue", "type": "solid", "index": 0,
                            "price": 100.0}])
    _db.settings_set(c, "Q_MIN_PROB", "0.45")
    _db.settings_set(c, "DISABLE_POLICY_GATE", "1")
    host = EngineHost(db_path=db, feed=feed, symbol="SPY", tick_sleep=0.0,
                      policy_path=str(tmp_path / "p.npz"),
                      lr_model_path=str(tmp_path / "l.npz"),
                      retrain_interval_s=1e9)
    host.run(max_ticks=400, sleep=lambda s: None)
    # all prints consumed; the loop stopped at exhaustion
    assert feed._i == len(prints)
    assert c.execute("SELECT COUNT(*) FROM policy_events").fetchone()[0] >= 250
