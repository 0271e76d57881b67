"""Gate stack + lifecycle scan vs the scalar engine oracle over random tapes."""

import jax
import numpy as np
import pytest

from qmmx_monolithic_monte_carlo_tpu.config import CompatFlags, EngineParams
from qmmx_monolithic_monte_carlo_tpu.engine import lifecycle as LC
from qmmx_monolithic_monte_carlo_tpu.engine.state import EngineCarry
from qmmx_monolithic_monte_carlo_tpu.reasons import Reason, returned_code
from qmmx_monolithic_monte_carlo_tpu.types import Levels

from .oracle.engine import EngineOracle

LEVEL_ROWS = [
    {"color": "blue", "type": "solid", "index": 0, "price": 100.0},
    {"color": "blue", "type": "dashed", "index": 1, "price": 100.45},
    {"color": "orange", "type": "solid", "index": 0, "price": 99.6},
    {"color": "teal", "type": "dashed", "index": 0, "price": 100.1},
]

REASON_NAME = {r.value: r.name for r in Reason}


def _tape(seed, n=600, vol_scale=0.0):
    rng = np.random.default_rng(seed)
    ts = (1_000_000 + np.cumsum(rng.integers(500, 1200, n))).astype(np.int32)
    prices = (100.0 + np.cumsum(rng.normal(0, 0.03, n))).astype(np.float32)
    prices = np.round(prices, 2)  # cent ticks like real prints
    vols = (rng.uniform(0, 10, n) * vol_scale).astype(np.float32)
    return ts, prices, vols


@pytest.mark.parametrize("seed,qmin,vol_scale", [
    (0, 0.5, 0.0),
    (1, 0.6, 0.0),
    (2, 0.5, 1.0),
    (3, 0.3, 1.0),
    (4, 0.7, 5.0),
])
@pytest.mark.slow
def test_lifecycle_matches_oracle(seed, qmin, vol_scale):
    ts, prices, vols = _tape(seed, n=600, vol_scale=vol_scale)
    levels = Levels.from_rows(LEVEL_ROWS, max_levels=8)
    params = EngineParams.default(q_min_prob=qmin)
    carry = EngineCarry.init(levels.max_levels)

    run = jax.jit(
        lambda c, t, p, v: LC.run_ticks(
            c, levels, params, t, p, v, policy_gate_disabled=True,
            compat=CompatFlags(),
        )
    )
    final, events = run(carry, ts, prices, vols)

    oracle = EngineOracle(LEVEL_ROWS, q_min_prob=qmin, policy_gate_disabled=True)
    reasons = np.asarray(events.decision.reason)
    opened = np.asarray(events.opened)
    closed = np.asarray(events.closed)
    escalated = np.asarray(events.escalated)
    pnls = np.asarray(events.pnl)

    for i in range(len(ts)):
        ev = oracle.tick(int(ts[i]), float(prices[i]), float(vols[i]))
        got_reason = REASON_NAME[int(reasons[i])]
        assert got_reason == ev["reason"], (
            f"tick {i}: reason {got_reason} != oracle {ev['reason']}"
        )
        assert bool(opened[i]) == ev["opened"], f"tick {i} opened"
        assert bool(closed[i]) == ev["closed"], f"tick {i} closed"
        assert bool(escalated[i]) == ev["escalated"], f"tick {i} escalated"
        if ev["closed"]:
            assert float(pnls[i]) == pytest.approx(ev["pnl"], abs=1e-4)

    assert float(final.realized_pnl) == pytest.approx(oracle.pnl, abs=1e-3)
    assert int(final.wins) == oracle.wins
    assert int(final.losses) == oracle.losses
    assert float(final.equity_r) == pytest.approx(oracle.equity_r, abs=1e-3)


def test_double_evaluate_compat_doubles_touches():
    """Q2: two evaluations per tick must advance the touch latch twice as often
    only on entry ticks (latch prevents double counting while hovering)."""
    ts, prices, vols = _tape(0, n=200)
    levels = Levels.from_rows(LEVEL_ROWS, max_levels=8)
    params = EngineParams.default(q_min_prob=0.99)  # block entries, observe touches
    carry = EngineCarry.init(levels.max_levels)
    _, ev1 = LC.run_ticks(carry, levels, params, ts, prices, vols,
                          compat=CompatFlags(double_evaluate=False))
    _, ev2 = LC.run_ticks(carry, levels, params, ts, prices, vols,
                          compat=CompatFlags(double_evaluate=True))
    # with the latch, hovering doesn't double-count; totals must be >= single-eval
    t1 = np.asarray(ev1.decision.touch_count).max()
    t2 = np.asarray(ev2.decision.touch_count).max()
    assert t2 >= t1


def test_returned_code_mapping():
    assert returned_code(Reason.EDGE_FATIGUE) == "VETO"
    assert returned_code(Reason.EDGE_FATIGUE, strict_reference_quirks=True) == "ENGINE_ERR"
    assert returned_code(Reason.ACC_BREAKOUT_GATE) == 904
    assert returned_code(Reason.ML_CONF_LOW) == "CONF_LOW"
    assert returned_code(Reason.COMBINED_LOW) == "CONF_LOW"
    assert returned_code(Reason.TOO_FAR) == "TOO_FAR"


def test_policy_gate_blocks_with_zero_weights():
    """Zero-weight OnlinePolicy scores 0.5 everywhere → chosen 0.5 < 0.60 →
    gate blocks all entries (ref :3083-3085)."""
    ts, prices, vols = _tape(0, n=300)
    levels = Levels.from_rows(LEVEL_ROWS, max_levels=8)
    params = EngineParams.default(q_min_prob=0.3)
    carry = EngineCarry.init(levels.max_levels)
    _, ev = LC.run_ticks(carry, levels, params, ts, prices, vols,
                         policy_gate_disabled=False)
    assert int(np.asarray(ev.opened).sum()) == 0
    # some ticks must have produced OK decisions that the policy gate then blocked
    oks = np.asarray(ev.decision.ok)
    assert oks.sum() > 0
    assert not np.asarray(ev.policy_pass)[oks].any()


def test_lifecycle_blend_mode_matches_oracle():
    """Blend-mode (70/30) gate math through the full lifecycle scan."""
    ts, prices, vols = _tape(11, n=400, vol_scale=1.0)
    levels = Levels.from_rows(LEVEL_ROWS, max_levels=8)
    params = EngineParams.default(q_min_prob=0.55, use_blend=True,
                                  w_rules=0.7, w_ml=0.3)
    carry = EngineCarry.init(levels.max_levels)
    final, events = LC.run_ticks(carry, levels, params, ts, prices, vols,
                                 policy_gate_disabled=True)
    oracle = EngineOracle(LEVEL_ROWS, q_min_prob=0.55, use_blend=True,
                          policy_gate_disabled=True)
    reasons = np.asarray(events.decision.reason)
    for i in range(len(ts)):
        ev = oracle.tick(int(ts[i]), float(prices[i]), float(vols[i]))
        assert REASON_NAME[int(reasons[i])] == ev["reason"], i
    assert float(final.realized_pnl) == pytest.approx(oracle.pnl, abs=1e-3)


def test_host_audit_entry_rows_use_returned_codes(tmp_path):
    """The loop-level ENTRY audit rows carry the reference's *returned* codes
    (VETO family → 'VETO', acc gate → 904), excluding TOO_FAR/IN_POSITION."""
    from qmmx_monolithic_monte_carlo_tpu.host.app import EngineHost
    from qmmx_monolithic_monte_carlo_tpu.io import db as _db
    from qmmx_monolithic_monte_carlo_tpu.io import feed as feed_io

    db = str(tmp_path / "q.db")
    c = _db.db_connect(db)
    _db.db_init(c)
    _db.replace_levels(c, [
        {"color": "blue", "type": "solid", "index": 0, "price": 100.0}])
    _db.settings_set(c, "Q_MIN_PROB", "0.99")  # force CONF_LOW skips
    feed = feed_io.SyntheticFeed("SYN", s0=100.0, sigma=1.0, seed=9)
    host = EngineHost(db_path=db, feed=feed, symbol="SYN", tick_sleep=0.0,
                      policy_path=str(tmp_path / "p.npz"),
                      lr_model_path=str(tmp_path / "l.npz"),
                      retrain_interval_s=1e9)
    host.run(max_ticks=200, sleep=lambda s: None)
    codes = {r[0] for r in c.execute(
        "SELECT DISTINCT code FROM audit_log WHERE phase='ENTRY'").fetchall()}
    assert "CONF_LOW" in codes
    assert "TOO_FAR" not in codes          # excluded like the reference loop
    assert "IN_POSITION" not in codes


@pytest.mark.slow
def test_exit_head_vetoes_escalation_when_enabled():
    """Opt-in exit-head gating: with a policy whose exit head strongly says
    exit_now, an escalation-eligible target hit closes at target instead of
    rolling the target/stop; with the flag off (default), behavior is
    unchanged."""
    import jax.numpy as jnp

    from qmmx_monolithic_monte_carlo_tpu.engine.state import Position
    from qmmx_monolithic_monte_carlo_tpu.models import online_policy as OP

    levels = Levels.from_rows([
        {"color": "blue", "type": "solid", "index": 0, "price": 100.0},
        {"color": "blue", "type": "dashed", "index": 1, "price": 100.5},
        {"color": "teal", "type": "solid", "index": 0, "price": 99.0},
    ], max_levels=8)
    params = EngineParams.default(q_min_prob=1.01)  # conf<=1 → no fresh entries

    # phase A: build rising-volume history toward 100.0 from below (the
    # escalation recipe: continuation favored at target) with no position
    ts = np.arange(10, dtype=np.int64) * 60_000 + 1_000
    prices = np.array([99.0, 99.1, 99.2, 99.3, 99.4, 99.5, 99.6, 99.7, 99.8,
                       99.85], np.float32)
    vols = np.linspace(2, 10, 10).astype(np.float32)

    def run_phase_a(policy, use_exit_head):
        carry = EngineCarry.init(levels.max_levels)
        carry, _ = LC.run_ticks(
            carry, levels, params, ts.astype(np.int32), prices, vols,
            policy=policy, policy_gate_disabled=True,
            use_exit_head=use_exit_head,
        )
        # phase B: inject an open long whose target is the 100.0 level and
        # tick AT the target — escalation-eligible (near target, continuation)
        carry = carry.replace(position=Position(
            side=jnp.int32(1), entry=jnp.float32(99.8),
            stop=jnp.float32(99.45), target=jnp.float32(100.0),
            open_ts_ms=jnp.int32(int(ts[-1])),
        ))
        tick_ts = np.int32(int(ts[-1]) + 60_000)
        carry2, ev = LC.run_ticks(
            carry, levels, params, np.asarray([tick_ts]),
            np.asarray([100.0], np.float32), np.asarray([10.0], np.float32),
            policy=policy, policy_gate_disabled=True,
            use_exit_head=use_exit_head,
        )
        return ev

    # exit head rigged to scream exit_now (big positive bias weight)
    loud_exit = OP.PolicyParams.init().replace(
        w_exit=jnp.zeros((2, 7), jnp.float32).at[OP.A_EXIT_NOW, 0].set(10.0)
    )

    ev_off = run_phase_a(loud_exit, use_exit_head=False)
    assert bool(np.asarray(ev_off.escalated)[0]), (
        "fixture must be escalation-eligible with the flag off")
    assert not bool(np.asarray(ev_off.closed)[0])

    ev_on = run_phase_a(loud_exit, use_exit_head=True)
    assert not bool(np.asarray(ev_on.escalated)[0])
    assert bool(np.asarray(ev_on.closed)[0])
    assert int(np.asarray(ev_on.close_reason)[0]) == LC.CLOSE_TARGET
    assert float(np.asarray(ev_on.exit_scores)[0, OP.A_EXIT_NOW]) > 0.99

    # a quiet exit head changes nothing even with the flag on
    ev_quiet = run_phase_a(OP.PolicyParams.init(), use_exit_head=True)
    assert bool(np.asarray(ev_quiet.escalated)[0])
