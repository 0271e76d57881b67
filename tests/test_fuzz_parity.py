"""Randomized-parameter fuzzing: the scan engine must match the scalar oracle
under arbitrary (sane) knob draws, not just the defaults."""

import numpy as np
import pytest

from qmmx_monolithic_monte_carlo_tpu.config import EngineParams
from qmmx_monolithic_monte_carlo_tpu.engine import lifecycle as LC
from qmmx_monolithic_monte_carlo_tpu.engine.state import EngineCarry
from qmmx_monolithic_monte_carlo_tpu.reasons import Reason
from qmmx_monolithic_monte_carlo_tpu.sim.candidates import find_candidates
from qmmx_monolithic_monte_carlo_tpu.types import Bars, Levels

from .oracle import sims as OS
from .oracle.engine import EngineOracle

REASON_NAME = {r.value: r.name for r in Reason}


def _random_levels(rng, n):
    colors = ["blue", "orange", "black", "teal"]
    kinds = ["solid", "dashed"]
    rows = []
    for i in range(n):
        rows.append({
            "color": str(rng.choice(colors)),
            "type": str(rng.choice(kinds)),
            "index": i,
            "price": float(np.round(100 + rng.normal(0, 0.5), 2)),
        })
    return rows


@pytest.mark.parametrize("trial", range(6))
@pytest.mark.slow
def test_lifecycle_fuzz(trial):
    rng = np.random.default_rng(1000 + trial)
    level_rows = _random_levels(rng, int(rng.integers(1, 7)))
    kw = dict(
        contact_prox=float(rng.uniform(0.02, 0.15)),
        q_min_prob=float(rng.uniform(0.3, 0.8)),
        cooldown_s=float(rng.integers(2, 20)),
        stop_padding=float(rng.uniform(0.1, 0.6)),
        tp_padding=float(rng.uniform(0.1, 0.5)),
        enable_veto=bool(rng.integers(2)),
        veto_vol_strong=float(rng.uniform(0.1, 0.4)),
        veto_prox=float(rng.uniform(0.03, 0.1)),
        use_blend=bool(rng.integers(2)),
    )
    n = 400
    ts = (1_000_000 + np.cumsum(rng.integers(400, 1500, n))).astype(np.int32)
    prices = np.round(100.0 + np.cumsum(rng.normal(0, 0.04, n)), 2).astype(np.float32)
    vols = (rng.uniform(0, 8, n)).astype(np.float32)

    levels = Levels.from_rows(level_rows, max_levels=8)
    params = EngineParams.default(**kw)
    carry = EngineCarry.init(levels.max_levels)
    final, events = LC.run_ticks(carry, levels, params, ts, prices, vols,
                                 policy_gate_disabled=True)

    oracle = EngineOracle(
        level_rows, contact_prox=kw["contact_prox"], q_min_prob=kw["q_min_prob"],
        cooldown_s=int(kw["cooldown_s"]), stop_padding=kw["stop_padding"],
        tp_padding=kw["tp_padding"], enable_veto=kw["enable_veto"],
        veto_vol_strong=kw["veto_vol_strong"], veto_prox=kw["veto_prox"],
        use_blend=kw["use_blend"], policy_gate_disabled=True,
    )
    reasons = np.asarray(events.decision.reason)
    for i in range(n):
        ev = oracle.tick(int(ts[i]), float(prices[i]), float(vols[i]))
        assert REASON_NAME[int(reasons[i])] == ev["reason"], (trial, i, kw)
        assert bool(np.asarray(events.opened)[i]) == ev["opened"], (trial, i)
        assert bool(np.asarray(events.closed)[i]) == ev["closed"], (trial, i)
    assert float(final.realized_pnl) == pytest.approx(oracle.pnl, abs=2e-3)


def test_sim_candidates_seeded_from_live_state():
    """Q7: the sim threads a COPY of the live gate state — a live engine with
    exhausted touch counts must suppress candidates without being mutated."""
    rng = np.random.default_rng(7)
    level_rows = [{"color": "blue", "type": "solid", "index": 0, "price": 100.0}]
    levels = Levels.from_rows(level_rows, max_levels=4)
    params = EngineParams.default(q_min_prob=0.4)
    n = 120
    c = np.round(100.0 + np.cumsum(rng.normal(0, 0.03, n)), 2)
    h = np.round(c + np.abs(rng.normal(0, 0.04, n)), 2)
    l = np.round(c - np.abs(rng.normal(0, 0.04, n)), 2)
    o = np.concatenate([[c[0]], c[:-1]])
    bars = Bars.from_arrays((np.arange(n) * 60000).astype(np.int32), o, h, l, c)

    fresh = EngineCarry.init(levels.max_levels)
    cands_fresh = find_candidates(bars, levels, params, touch_limit=5,
                                  with_gates=True, mode="replay", carry=fresh)

    # live state: the level is already over-touched → LEVEL_OVERTOUCHED in sim
    live = fresh.replace(
        contact=fresh.contact.replace(
            touch_counts=fresh.contact.touch_counts.at[0].set(10)
        )
    )
    cands_live = find_candidates(bars, levels, params, touch_limit=5,
                                 with_gates=True, mode="replay", carry=live)
    n_fresh = int(np.asarray(cands_fresh.is_cand).sum())
    n_live = int(np.asarray(cands_live.is_cand).sum())
    assert n_fresh > 0
    assert n_live == 0
    # purity: the live carry object is unchanged (no Q7 mutation)
    assert int(np.asarray(live.contact.touch_counts)[0]) == 10
    reasons = np.asarray(cands_live.gate_reason)
    assert (reasons == Reason.LEVEL_OVERTOUCHED).any()
