"""Engine-gated generated-path lifecycle: scalar-oracle parity + semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qmmx_monolithic_monte_carlo_tpu.config import EngineParams
from qmmx_monolithic_monte_carlo_tpu.ops.pathgen import PathBars
from qmmx_monolithic_monte_carlo_tpu.sim import gatedpath
from qmmx_monolithic_monte_carlo_tpu.sim.gatedpath import GateConfig
from qmmx_monolithic_monte_carlo_tpu.sim.pathsim import PathStats
from qmmx_monolithic_monte_carlo_tpu.types import Levels

from .oracle import gated as O

LEVEL_ROWS = [
    {"color": "blue", "type": "solid", "index": 0, "price": 100.0},
    {"color": "orange", "type": "dashed", "index": 0, "price": 100.4},
]
LEVELS = Levels.from_rows(LEVEL_ROWS, max_levels=8)
ORACLE_LEVELS = [(100.0, 1), (100.4, 0)]  # slot order: (price, kind)
PARAMS = EngineParams.default()


def _random_bars(rng, p, w, s0=100.0, step=0.06):
    """Random-walk OHLC bars in exact f32 (closes wander across the levels)."""
    moves = rng.normal(0.0, step, (p, w)).astype(np.float32)
    c = (s0 + np.cumsum(moves, axis=1)).astype(np.float32)
    o = np.concatenate([np.full((p, 1), s0, np.float32), c[:, :-1]], axis=1)
    wick_h = np.abs(rng.normal(0.0, step / 2, (p, w))).astype(np.float32)
    wick_l = np.abs(rng.normal(0.0, step / 2, (p, w))).astype(np.float32)
    h = (np.maximum(o, c) + wick_h).astype(np.float32)
    l = (np.minimum(o, c) - wick_l).astype(np.float32)
    return PathBars(open=jnp.asarray(o), high=jnp.asarray(h),
                    low=jnp.asarray(l), close=jnp.asarray(c),
                    volume=jnp.zeros_like(jnp.asarray(c)))


def _run_both(bars, tie, gate, use_confidence=True):
    out = gatedpath.gated_path_replay(bars, LEVELS, PARAMS, gate, jnp.asarray(tie))
    p = int(bars.close.shape[0])
    o, h, l, c = (np.asarray(bars.open), np.asarray(bars.high),
                  np.asarray(bars.low), np.asarray(bars.close))
    want = [
        O.lifecycle_path(
            o[i], h[i], l[i], c[i], tie[i], ORACLE_LEVELS,
            contact_prox=0.05, stop_padding=0.35, tp_padding=0.25,
            touch_limit=int(gate.touch_limit), q_min_prob=float(gate.q_min_prob),
            cooldown_bars=int(gate.cooldown_bars),
            touch_gap_bars=int(gate.touch_gap_bars),
            use_confidence=use_confidence,
        )
        for i in range(p)
    ]
    return out, want


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_lifecycle_matches_scalar_oracle(seed):
    rng = np.random.default_rng(seed)
    p, w = 16, 32
    bars = _random_bars(rng, p, w)
    tie = rng.uniform(0, 1, (p, w)).astype(np.float32)
    gate = GateConfig.default()
    out, want = _run_both(bars, tie, gate)

    trades = np.asarray(out.trades)
    assert trades.sum() > 0, "fuzz tape produced no trades — widen the walk"
    for i in range(p):
        assert int(trades[i]) == want[i]["trades"], f"path {i} trades"
        assert int(np.asarray(out.wins)[i]) == want[i]["wins"], f"path {i} wins"
        assert int(np.asarray(out.losses)[i]) == want[i]["losses"], f"path {i} losses"
        assert bool(np.asarray(out.open_at_end)[i]) == want[i]["open_at_end"]
        assert float(np.asarray(out.equity)[i]) == pytest.approx(
            want[i]["equity"], abs=1e-5)
        assert float(np.asarray(out.max_dd)[i]) == pytest.approx(
            want[i]["max_dd"], abs=1e-5)


def test_lifecycle_oracle_parity_with_cooldown_and_tight_budget():
    rng = np.random.default_rng(7)
    p, w = 16, 40
    bars = _random_bars(rng, p, w, step=0.08)
    tie = rng.uniform(0, 1, (p, w)).astype(np.float32)
    gate = GateConfig.default(touch_limit=2, cooldown_bars=3, touch_gap_bars=1)
    out, want = _run_both(bars, tie, gate)
    for i in range(p):
        assert int(np.asarray(out.trades)[i]) == want[i]["trades"], f"path {i}"
        assert float(np.asarray(out.equity)[i]) == pytest.approx(
            want[i]["equity"], abs=1e-5)


def test_touch_budget_caps_entries_per_level():
    """A path oscillating across one level must stop entering at the budget."""
    w = 40
    # closes alternate 99.98 / 100.02 around the 100.0 level; wide hi/lo so
    # every trade closes next bar (stop 99.65 / target 100.25 both reachable)
    c = np.where(np.arange(w) % 2 == 0, 99.98, 100.02).astype(np.float32)
    o = np.concatenate([[100.05], c[:-1]]).astype(np.float32)
    h = (c + 0.5).astype(np.float32)
    l = (c - 0.5).astype(np.float32)
    bars = PathBars(open=jnp.asarray(o[None]), high=jnp.asarray(h[None]),
                    low=jnp.asarray(l[None]), close=jnp.asarray(c[None]),
                    volume=jnp.zeros((1, w), jnp.float32))
    tie = np.full((1, w), 0.99, np.float32)  # coin always picks the stop
    gate = GateConfig.default(touch_limit=2, touch_gap_bars=1,
                              use_confidence=False)
    out = gatedpath.gated_path_replay(bars, LEVELS, PARAMS, gate, jnp.asarray(tie))
    # entries land only while the touch count is < 2 (each signal bar is fresh)
    assert int(out.trades[0]) == 1, (
        "first touch enters; second touch hits the latch count of 2 at the "
        f"budget and is blocked — got {int(out.trades[0])}")


def test_repeated_trading_and_drawdown_accounting():
    """Multi-trade path: equity = sum of per-trade R; dd tracks the worst
    peak-to-trough run, not just -min(equity)."""
    rng = np.random.default_rng(11)
    p, w = 64, 48
    bars = _random_bars(rng, p, w, step=0.1)
    tie = rng.uniform(0, 1, (p, w)).astype(np.float32)
    gate = GateConfig.default(touch_limit=100, touch_gap_bars=1,
                              use_confidence=False)
    out = gatedpath.gated_path_replay(bars, LEVELS, PARAMS, gate, jnp.asarray(tie))
    trades = np.asarray(out.trades)
    assert (trades > 1).any(), "expected repeated entries on some path"
    closed = np.asarray(out.wins) + np.asarray(out.losses)
    open_ = np.asarray(out.open_at_end).astype(int)
    np.testing.assert_array_equal(closed + open_, trades)
    assert (np.asarray(out.max_dd) >= 0).all()
    # every path with >= 1 loss has dd >= 1 (a stop is a full -1 R leg)
    lossy = np.asarray(out.losses) > 0
    assert (np.asarray(out.max_dd)[lossy] >= 1.0 - 1e-6).all()


def test_mc_paths_gated_stats_contract():
    stats = gatedpath.mc_paths_gated(
        jax.random.key(0), LEVELS, PARAMS,
        GateConfig.default(touch_limit=100, touch_gap_bars=1),
        num_paths=1 << 12, num_bars=40, sigma=0.3, block_paths=1 << 11,
    )
    n = float(stats.n)
    assert n == 1 << 12
    assert float(stats.n_entered) <= n
    assert float(stats.sum_trades) >= float(stats.n_entered)  # >= 1 trade/path
    # trade accounting: wins + losses + still-open == trades
    assert float(stats.n_tp + stats.n_stop + stats.n_open) == pytest.approx(
        float(stats.sum_trades))
    assert float(stats.max_dd) >= 0.0
    assert float(stats.sum_dd) >= 0.0
    assert float(stats.min_r) <= float(stats.max_r)
    assert float(stats.hist.sum()) == pytest.approx(float(stats.n_entered))
    # merge associativity against a single-block run with the same key
    one = gatedpath.mc_paths_gated(
        jax.random.key(0), LEVELS, PARAMS,
        GateConfig.default(touch_limit=100, touch_gap_bars=1),
        num_paths=1 << 12, num_bars=40, sigma=0.3, block_paths=1 << 11,
    )
    assert float(one.sum_r) == pytest.approx(float(stats.sum_r))


def test_from_lifecycle_semantics():
    stats = PathStats.from_lifecycle(
        equity=jnp.asarray([1.5, -2.0, 0.0]),
        trades=jnp.asarray([3, 2, 0]),
        wins=jnp.asarray([2, 0, 0]),
        losses=jnp.asarray([1, 2, 0]),
        open_at_end=jnp.asarray([False, False, False]),
        max_dd=jnp.asarray([0.5, 2.0, 0.0]),
    )
    assert float(stats.n) == 3
    assert float(stats.n_entered) == 2          # third path never traded
    assert float(stats.n_tp) == 2               # trade-level wins
    assert float(stats.n_stop) == 3
    assert float(stats.sum_trades) == 5
    assert float(stats.min_r) == -2.0           # per-path total R extremes
    assert float(stats.max_r) == 1.5
    assert float(stats.max_dd) == 2.0
    assert float(stats.mean_trades) == pytest.approx(2.5)
    assert float(stats.mean_dd) == pytest.approx(1.25)


def test_sweep_paths_gated_crn_and_monotonicity():
    """Gated grid sweep: identical configs produce identical stats (CRN), and
    a wider stop (same tp) can only raise trade-level hit rate on shared
    paths."""
    from qmmx_monolithic_monte_carlo_tpu.parallel import sweep as PS

    grid = PS.grid_params(PARAMS, stop_paddings=[0.35, 0.35, 0.5],
                          tp_paddings=[0.25])
    stats = PS.sweep_paths_gated(
        jax.random.key(0), LEVELS, grid,
        GateConfig.default(touch_limit=100, touch_gap_bars=1),
        num_paths=1 << 13, num_bars=40, sigma=0.3, block_paths=1 << 12,
    )
    # configs 0 and 1 are identical → bitwise-equal stats (CRN proof)
    for f in ("n", "n_entered", "n_tp", "n_stop", "sum_r", "sum_trades",
              "sum_dd", "max_dd"):
        a, b = np.asarray(getattr(stats, f)), None
        assert float(a[0]) == float(a[1]), f
    # wider stop, same target: stops get harder to hit on the SAME paths
    assert float(stats.hit_rate[2]) >= float(stats.hit_rate[0])


def test_sweep_paths_gated_gate_grid_axis():
    """Gate knobs on the grid axis: a [G]-batched GateConfig sweeps the
    decision surface (touch budgets, Q_MIN_PROB) with CRN, and each config
    reproduces a single-config sweep run bitwise."""
    from qmmx_monolithic_monte_carlo_tpu.parallel import sweep as PS

    grid, gate_g = PS.grid_params_gated(
        PARAMS, GateConfig.default(touch_gap_bars=1),
        touch_limits=[2, 100], q_min_probs=[0.40, 0.60],
    )
    assert jax.tree_util.tree_leaves(grid)[0].shape[0] == 4
    kw = dict(num_paths=1 << 13, num_bars=40, sigma=0.3, block_paths=1 << 12)
    stats = PS.sweep_paths_gated(jax.random.key(0), LEVELS, grid, gate_g, **kw)

    # config 1 = (tl=2, qmin=0.60): reproduce with a single-config grid
    single_grid = PS.grid_params(PARAMS, stop_paddings=[0.35], tp_paddings=[0.25])
    single = PS.sweep_paths_gated(
        jax.random.key(0), LEVELS, single_grid,
        GateConfig.default(touch_limit=2, q_min_prob=0.60, touch_gap_bars=1),
        **kw)
    for f in ("n", "n_entered", "n_tp", "n_stop", "sum_r", "sum_trades",
              "sum_dd", "max_dd"):
        assert float(np.asarray(getattr(stats, f))[1]) == \
            float(np.asarray(getattr(single, f))[0]), f
    # a looser touch budget can only take more trades on the SAME paths
    assert float(stats.sum_trades[3]) >= float(stats.sum_trades[1])
    # a lower confidence floor can only take more trades on the SAME paths
    assert float(stats.sum_trades[0]) >= float(stats.sum_trades[1])


# ---- execution noise in the gated lifecycle (reference MC :3453-3461) ----

def test_gated_noise_zero_matches_none_bitwise():
    from qmmx_monolithic_monte_carlo_tpu.sim.montecarlo import McNoise
    key = jax.random.key(21)
    kw = dict(num_paths=1 << 12, block_paths=1 << 12, num_bars=16, sigma=0.3)
    base = gatedpath.mc_paths_gated(key, LEVELS, PARAMS, **kw)
    zero = gatedpath.mc_paths_gated(key, LEVELS, PARAMS, **kw,
                                    noise=McNoise.make(0.0, 0.0, 0.0, 0.0))
    for f in ("n", "n_tp", "n_stop", "n_open", "n_entered", "sum_r", "sum_r2",
              "min_r", "max_r", "sum_trades", "sum_dd", "max_dd", "hist"):
        np.testing.assert_array_equal(np.asarray(getattr(base, f)),
                                      np.asarray(getattr(zero, f)), err_msg=f)


def test_gated_noise_entry_bar_pairing():
    """Noise draws apply AT THE ENTRY BAR: jitter only the known entry bar's
    draws and verify the scaffold shifts exactly by them (injected normals)."""
    from qmmx_monolithic_monte_carlo_tpu.sim.montecarlo import McNoise

    w = 8
    # flat path pinned at 100.02 except a dip at bar 5 that hits the shifted
    # stop; direction known at bar 1 (100.05 -> 100.02 = short signal at lvl 100)
    c = np.full((1, w), 100.02, np.float32)
    o = np.concatenate([[100.05], c[0, :-1]]).astype(np.float32)[None]
    h = c + 0.0
    l = c + 0.0
    h = h.copy(); l = l.copy()
    h[0, 5] = 100.90   # would hit a short stop at 100.35 (no-noise) or shifted
    bars = PathBars(open=jnp.asarray(o), high=jnp.asarray(h),
                    low=jnp.asarray(l), close=jnp.asarray(c),
                    volume=jnp.zeros((1, w), jnp.float32))
    tie = np.zeros((1, w), np.float32)
    gate = GateConfig.default(touch_limit=100, touch_gap_bars=1,
                              use_confidence=False)

    # no noise: short opens bar 0 (c=100.02 < o=100.05), stop 100.35; bar 5
    # high 100.90 stops it out -> one loss
    out0 = gatedpath.gated_path_replay(bars, LEVELS, PARAMS, gate,
                                       jnp.asarray(tie))
    assert int(out0.trades[0]) >= 1 and int(out0.losses[0]) == 1

    # stop slip +0.60 AT BAR 0 ONLY lifts the stop to 100.95 -> bar 5 no
    # longer reaches it; a slip at any other bar must not matter
    noise = McNoise.make(entry_slip_std=0.0, level_jitter_std=0.0,
                         stop_slip_std=1.0, target_slip_std=0.0)
    ns = np.zeros((1, w), np.float32); ns[0, 0] = 0.60
    zeros = np.zeros((1, w), np.float32)
    out1 = gatedpath.gated_path_replay(
        bars, LEVELS, PARAMS, gate, jnp.asarray(tie), noise=noise,
        noise_normals=(jnp.asarray(zeros), jnp.asarray(zeros),
                       jnp.asarray(ns), jnp.asarray(zeros)))
    assert int(out1.losses[0]) == 0

    # same slip moved to a NON-entry bar leaves the no-noise outcome intact
    ns2 = np.zeros((1, w), np.float32); ns2[0, 3] = 0.60
    out2 = gatedpath.gated_path_replay(
        bars, LEVELS, PARAMS, gate, jnp.asarray(tie), noise=noise,
        noise_normals=(jnp.asarray(zeros), jnp.asarray(zeros),
                       jnp.asarray(ns2), jnp.asarray(zeros)))
    assert int(out2.losses[0]) == int(out0.losses[0])
