"""Native C++ data path vs Python fallback parity + engine-rollup agreement."""

import numpy as np
import pytest

from qmmx_monolithic_monte_carlo_tpu.io import native


def _ticks(seed=0, n=5000):
    rng = np.random.default_rng(seed)
    ts = np.cumsum(rng.integers(200, 2000, n)).astype(np.int64) + 1_000_000
    px = np.round(100 + np.cumsum(rng.normal(0, 0.02, n)), 2)
    vol = rng.uniform(0, 5, n)
    return ts, px, vol


def test_native_builds_and_loads():
    assert native.available(), "g++ toolchain expected in this image"


def test_aggregate_matches_python_fallback():
    ts, px, vol = _ticks()
    a = native.aggregate_ticks(ts, px, vol)
    b = native._aggregate_ticks_py(ts, px, vol)
    for k in ("t", "o", "h", "l", "c", "v"):
        np.testing.assert_allclose(a[k], b[k], rtol=1e-12, err_msg=k)
    # bucketing semantics: bar timestamps are minute-aligned
    assert np.all(a["t"] % 60000 == 0)
    assert np.all(a["h"] >= a["c"]) and np.all(a["l"] <= a["c"])


def test_aggregate_matches_engine_rollup():
    """The native aggregator must agree with the device-side ingest_tick scan."""
    import jax

    from qmmx_monolithic_monte_carlo_tpu.engine import lifecycle as LC
    from qmmx_monolithic_monte_carlo_tpu.engine.state import EngineCarry
    from qmmx_monolithic_monte_carlo_tpu.ops.guard import GuardParams
    from qmmx_monolithic_monte_carlo_tpu.ops.touch import TouchMemoryParams
    from qmmx_monolithic_monte_carlo_tpu.types import Levels

    ts, px, vol = _ticks(1, 600)
    levels = Levels.from_rows(
        [{"color": "blue", "type": "solid", "index": 0, "price": 100.0}], 4
    )
    carry = EngineCarry.init(4)
    tp = TouchMemoryParams.default()
    gp = GuardParams.default()
    closes = []
    for i in range(len(ts)):
        carry, rolled = LC.ingest_tick(
            carry, levels, tp, gp,
            ts_ms=int(ts[i]), price=float(px[i]), volume=float(vol[i]),
        )
    bars_c, bars_v, valid = carry.bars.ordered()
    got_c = np.asarray(bars_c)[np.asarray(valid)]
    nat = native.aggregate_ticks(ts, px, vol)
    # the engine's ring holds CLOSED bars only; the native output includes the
    # final (still open) bar
    np.testing.assert_allclose(got_c, nat["c"][:-1].astype(np.float32), rtol=1e-6)


def test_parse_bars_csv(tmp_path):
    ts, px, vol = _ticks(2, 2000)
    bars = native.aggregate_ticks(ts, px, vol)
    p = tmp_path / "bars.csv"
    with open(p, "w") as f:
        f.write("t,o,h,l,c,v\n")
        for i in range(len(bars["t"])):
            f.write(f"{bars['t'][i]},{bars['o'][i]},{bars['h'][i]},"
                    f"{bars['l'][i]},{bars['c'][i]},{bars['v'][i]}\n")
    got = native.parse_bars_csv(str(p))
    py = native._parse_bars_csv_py(str(p))
    for k in ("t", "o", "h", "l", "c", "v"):
        np.testing.assert_allclose(got[k], py[k], rtol=1e-9, err_msg=k)


def test_parse_missing_file():
    with pytest.raises((FileNotFoundError, ValueError)):
        native.parse_bars_csv("/nonexistent/file.csv")


def test_resample_returns_matches_numpy():
    rng = np.random.default_rng(3)
    n = 100
    logc = rng.normal(0, 0.001, n)
    logh = logc + np.abs(rng.normal(0, 0.0005, n))
    logl = logc - np.abs(rng.normal(0, 0.0005, n))
    logo = rng.normal(0, 0.0005, n)
    idx = rng.integers(0, n, (16, 24)).astype(np.int32)
    got = native.resample_returns(logc, logh, logl, logo, idx, np.log(100.0))
    # numpy reference
    r = logc[idx]
    prev = np.log(100.0) + np.concatenate(
        [np.zeros((16, 1)), np.cumsum(r[:, :-1], axis=1)], axis=1
    )
    np.testing.assert_allclose(got[0], prev + r, rtol=1e-12)
    np.testing.assert_allclose(got[1], prev + logh[idx], rtol=1e-12)


def test_audit_batch_writer(tmp_path):
    """Batched audit rows land identically to per-row db.audit, in ONE
    transaction (native sqlite writer when built, executemany otherwise)."""
    from qmmx_monolithic_monte_carlo_tpu.io import db as _db

    db = str(tmp_path / "a.db")
    conn = _db.db_connect(db)
    _db.db_init(conn)
    rows = [(_db.utcnow(), "SIM", "GATE_SKIP:CONF_LOW",
             f"Confidence 0.{i % 10} < min 0.60. prox=0.080", "{}")
            for i in range(500)]
    assert native.audit_batch(db, rows) == 500
    got = conn.execute(
        "SELECT ts, phase, code, message, extras_json FROM audit_log "
        "ORDER BY id").fetchall()
    assert [tuple(r) for r in got] == rows


def test_audit_batch_native_symbol_present_when_sqlite_links():
    lib = native.load()
    if lib is None:
        pytest.skip("no compiler available")
    # this image ships libsqlite3.so.0, so the sqlite-enabled build must win
    assert hasattr(lib, "qmmx_audit_batch_write")
