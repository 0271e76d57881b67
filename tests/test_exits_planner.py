"""ExitStrategy + SmartEntryPlanner pure ops vs scenario expectations."""

import numpy as np
import pytest

from qmmx_monolithic_monte_carlo_tpu.engine import exits as X
from qmmx_monolithic_monte_carlo_tpu.engine import planner as P
from qmmx_monolithic_monte_carlo_tpu.types import SIDE_LONG, SIDE_SHORT, Levels

LEVELS = Levels.from_rows(
    [
        {"color": "blue", "type": "solid", "index": 0, "price": 100.0},
        {"color": "blue", "type": "dashed", "index": 1, "price": 100.5},
        {"color": "orange", "type": "solid", "index": 0, "price": 101.5},
        {"color": "teal", "type": "solid", "index": 0, "price": 99.0},
    ],
    max_levels=8,
)


def _hist(prices, vols, n=32):
    p = np.zeros((n,), np.float32)
    v = np.zeros((n,), np.float32)
    m = np.zeros((n,), bool)
    p[: len(prices)] = prices
    v[: len(vols)] = vols
    m[: len(prices)] = True
    return p, v, m


def test_exit_on_reversal_against_long():
    # approaching 100.0 from above with DECREASING volume → reversal bounce up...
    # wait: from_above reversal bounce is UP (goes_up), which is NOT against a long.
    prices = [100.5, 100.4, 100.3, 100.2, 100.1]
    vols = [10, 8, 6, 4, 2]
    p, v, m = _hist(prices, vols)
    d = X.should_exit(side=SIDE_LONG, current_price=100.1, levels=LEVELS,
                      bar_prices=p, bar_volumes=v, bar_valid=m)
    assert not bool(d.exit)  # reversal up favors the long
    d2 = X.should_exit(side=SIDE_SHORT, current_price=100.1, levels=LEVELS,
                       bar_prices=p, bar_volumes=v, bar_valid=m)
    assert bool(d2.exit)  # reversal up is against the short
    assert int(d2.basis) == X.BASIS_REVERSAL


def test_exit_on_continuation_against_long():
    # approaching 100.0 from above with INCREASING volume → continuation down
    prices = [100.5, 100.4, 100.3, 100.2, 100.1]
    vols = [2, 4, 6, 8, 10]
    p, v, m = _hist(prices, vols)
    d = X.should_exit(side=SIDE_LONG, current_price=100.1, levels=LEVELS,
                      bar_prices=p, bar_volumes=v, bar_valid=m)
    assert bool(d.exit)
    assert int(d.basis) == X.BASIS_CONTINUATION


def test_hold_when_far_or_no_trend():
    p, v, m = _hist([105.0, 105.1], [1, 1])
    d = X.should_exit(side=SIDE_LONG, current_price=105.0, levels=LEVELS,
                      bar_prices=p, bar_volumes=v, bar_valid=m)
    assert not bool(d.exit)
    assert int(d.basis) == X.BASIS_NONE


def test_next_level_target():
    px, found = X.next_level_target(LEVELS, 100.0, SIDE_LONG)
    assert bool(found) and float(px) == pytest.approx(100.5)
    px, found = X.next_level_target(LEVELS, 100.0, SIDE_SHORT)
    assert bool(found) and float(px) == pytest.approx(99.0)
    px, found = X.next_level_target(LEVELS, 98.0, SIDE_SHORT)
    assert not bool(found)


def test_escalation_rolls_target_and_trails_stop():
    # long from 99.8, at target near 100.0, rising volume from below → continuation up
    prices = [99.0, 99.2, 99.4, 99.6, 99.9]
    vols = [2, 4, 6, 8, 10]
    p, v, m = _hist(prices, vols)
    esc = X.should_escalate_on_target(
        side=SIDE_LONG, entry=99.8, current_price=99.9, levels=LEVELS,
        bar_prices=p, bar_volumes=v, bar_valid=m,
    )
    assert bool(esc.escalate)
    assert float(esc.next_target) == pytest.approx(100.5)
    # trail = max(entry, anchor - 0.35) = max(99.8, 99.65) = 99.8
    assert float(esc.trail_stop) == pytest.approx(99.8)


def test_planner_reversal_signal():
    # from above into 100.0, decreasing volume → reversal LONG with entry above level
    prices = [100.6, 100.5, 100.4, 100.3, 100.2]
    vols = [10, 8, 6, 4, 2]
    p, v, m = _hist(prices, vols)
    sig = P.should_enter(
        current_price=100.2, current_time_s=1000.0, pattern_time_s=950.0,
        pattern_time_valid=True, levels=LEVELS,
        bar_prices=p, bar_volumes=v, bar_valid=m,
    )
    assert bool(sig.valid)
    assert int(sig.side) == SIDE_LONG
    assert int(sig.basis) == P.BASIS_REVERSAL
    assert float(sig.entry_price) == pytest.approx(100.03)  # level + slippage
    assert float(sig.target_hint) == pytest.approx(100.5)


def test_planner_stale_pattern_blocks():
    prices = [100.6, 100.5, 100.4, 100.3, 100.2]
    vols = [10, 8, 6, 4, 2]
    p, v, m = _hist(prices, vols)
    sig = P.should_enter(
        current_price=100.2, current_time_s=2000.0, pattern_time_s=950.0,
        pattern_time_valid=True, levels=LEVELS,
        bar_prices=p, bar_volumes=v, bar_valid=m,
    )
    assert not bool(sig.valid)  # 1050 s > 180 s freshness window


def test_planner_continuation_signal():
    prices = [100.6, 100.5, 100.4, 100.3, 100.2]
    vols = [2, 4, 6, 8, 10]
    p, v, m = _hist(prices, vols)
    sig = P.should_enter(
        current_price=100.2, current_time_s=1000.0, pattern_time_s=950.0,
        pattern_time_valid=True, levels=LEVELS,
        bar_prices=p, bar_volumes=v, bar_valid=m,
    )
    assert bool(sig.valid)
    assert int(sig.side) == SIDE_SHORT
    assert int(sig.basis) == P.BASIS_CONTINUATION
    assert float(sig.entry_price) == pytest.approx(99.97)  # level - slippage
    assert float(sig.target_hint) == pytest.approx(99.0)


def test_planner_confluence_snapback_pattern():
    """Pierce first cluster level, slightly pierce the second, snap back ≥
    min_retrace → snapback flag set (reversal confirmation, ref :614-655)."""
    import numpy as np

    levels = Levels.from_rows(
        [
            {"color": "blue", "type": "solid", "index": 0, "price": 100.0},
            {"color": "orange", "type": "dashed", "index": 0, "price": 99.6},
        ],
        max_levels=8,
    )
    # approach from above: first = 100.0 (max of cluster), second = 99.6.
    # path: pierce 100.0 (within 0.35), slightly pierce 99.6 (between 0.35 and
    # 0.35+0.042 below/above it), then snap back above 99.6 + 0.08.
    prices = [100.8, 100.5, 100.2, 99.9,      # pierce first (|p-100|<=0.35)
              99.22,                          # slight pierce of 99.6 (d=0.38)
              99.9]                           # snap back >= 99.68
    vols = [10, 8, 6, 4, 2, 1]
    p, v, m = _hist(prices, vols)
    from qmmx_monolithic_monte_carlo_tpu.engine.planner import snapback_pattern

    snap = snapback_pattern(p, m, levels, 100.0, approach_from_below=False)
    assert bool(snap)
    # without the snap-back bar the pattern must NOT confirm
    p2, v2, m2 = _hist(prices[:-1] + [99.3], vols)
    snap2 = snapback_pattern(p2, m2, levels, 100.0, approach_from_below=False)
    assert not bool(snap2)


def test_planner_signal_carries_snapback():
    levels = Levels.from_rows(
        [
            {"color": "blue", "type": "solid", "index": 0, "price": 100.0},
            {"color": "orange", "type": "dashed", "index": 0, "price": 99.6},
        ],
        max_levels=8,
    )
    prices = [100.8, 100.5, 100.2, 99.9, 99.22, 99.9]
    vols = [10, 8, 6, 4, 2, 1]  # decreasing into the level → reversal basis
    p, v, m = _hist(prices, vols)
    # the snap-back bar flips the *inferred* approach to from_below (last two
    # prices move up toward the level) — exactly like the reference; supply the
    # pattern's approach_direction as the reference's pattern dict does (:466)
    sig = P.should_enter(
        current_price=99.9, current_time_s=1000.0, pattern_time_s=950.0,
        pattern_time_valid=True, levels=levels,
        bar_prices=p, bar_volumes=v, bar_valid=m,
        approach_hint=0,  # from_above
    )
    assert bool(sig.valid)
    assert bool(sig.confluence)
    assert bool(sig.snapback)
    assert int(sig.side) == SIDE_LONG  # from_above reversal → long
