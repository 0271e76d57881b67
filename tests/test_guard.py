"""AccumulationBreakoutGuard scan state vs the scalar oracle."""

import numpy as np

from qmmx_monolithic_monte_carlo_tpu.ops import guard as G

from .oracle.semantics import GuardOracle

REGIME = {
    "unknown": G.REGIME_UNKNOWN,
    "accumulation": G.REGIME_ACCUMULATION,
    "breakout_up": G.REGIME_BREAKOUT_UP,
    "breakout_down": G.REGIME_BREAKOUT_DOWN,
}


def _run_bars(bars):
    params = G.GuardParams.default()
    st = G.GuardState.zeros()
    oracle = GuardOracle()
    for (ts, o, h, l, c, v) in bars:
        oracle.push(ts, o, h, l, c, v)
        st = G.push_minute_bar(st, params, ts_ms=ts, high=h, low=l, close=c, volume=v)
        assert int(st.regime) == REGIME[oracle.regime], (ts, oracle.regime, int(st.regime))
        if oracle.box_low is not None:
            assert bool(st.box_valid)
            np.testing.assert_allclose(float(st.box_low), oracle.box_low, atol=1e-5)
            np.testing.assert_allclose(float(st.box_high), oracle.box_high, atol=1e-5)
        else:
            assert not bool(st.box_valid)
    return st, oracle


def test_accumulation_then_breakout_then_clear():
    bars = []
    ts = 0
    # 40 compressed bars around 100 (box height << 18bp of 100 = 0.18)
    for i in range(40):
        ts += 60_000
        c = 100.0 + 0.03 * np.sin(i)
        bars.append((ts, c, c + 0.02, c - 0.02, c, 1.0))
    # volume-spiked breakout up
    for i in range(3):
        ts += 60_000
        c = 100.5 + 0.1 * i
        bars.append((ts, c, c + 0.05, c - 0.05, c, 10.0))
    # fall back inside the box and stay 3 bars → regime clears to accumulation
    # (a 4th bar would flip to "unknown": window still uncompressed — faithful
    # to the reference's clear-then-reassess order)
    for i in range(3):
        ts += 60_000
        c = 100.0
        bars.append((ts, c, c + 0.02, c - 0.02, c, 1.0))
    st, oracle = _run_bars(bars)
    assert oracle.regime == "accumulation"


def test_too_few_bars_is_unknown():
    bars = [(60_000 * (i + 1), 100.0, 100.1, 99.9, 100.0, 1.0) for i in range(10)]
    st, oracle = _run_bars(bars)
    assert oracle.regime == "unknown"
    assert int(st.regime) == G.REGIME_UNKNOWN


def test_random_walk_parity():
    rng = np.random.default_rng(42)
    bars = []
    ts = 0
    c = 100.0
    for i in range(150):
        ts += 60_000
        c *= float(np.exp(rng.normal(0, 0.0004)))
        h = c * float(np.exp(abs(rng.normal(0, 0.0003))))
        l = c * float(np.exp(-abs(rng.normal(0, 0.0003))))
        v = float(rng.uniform(0.5, 2.0)) * (5.0 if 100 <= i < 105 else 1.0)
        bars.append((ts, c, h, l, c, v))
    _run_bars(bars)


def test_allow_trade_gating():
    st = G.GuardState.zeros().replace(regime=np.int32(G.REGIME_BREAKOUT_UP))
    from qmmx_monolithic_monte_carlo_tpu.types import SIDE_LONG, SIDE_SHORT

    assert bool(G.allow_trade(st, SIDE_LONG))
    assert not bool(G.allow_trade(st, SIDE_SHORT))
    st = st.replace(regime=np.int32(G.REGIME_BREAKOUT_DOWN))
    assert not bool(G.allow_trade(st, SIDE_LONG))
    assert bool(G.allow_trade(st, SIDE_SHORT))
