"""Fused gated-lifecycle kernel: exact parity vs the XLA gatedpath pipeline
under injected uniforms (TPU-interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from qmmx_monolithic_monte_carlo_tpu.config import EngineParams
from qmmx_monolithic_monte_carlo_tpu.ops.pallas_mc import (
    GATED_BLOCK,
    GATED_LANES,
    GATED_SUB,
    mc_paths_pallas_gated,
)
from qmmx_monolithic_monte_carlo_tpu.ops.pathgen import PathBars
from qmmx_monolithic_monte_carlo_tpu.sim import gatedpath
from qmmx_monolithic_monte_carlo_tpu.sim.gatedpath import GateConfig
from qmmx_monolithic_monte_carlo_tpu.sim.pathsim import PathStats
from qmmx_monolithic_monte_carlo_tpu.types import Levels

LEVELS = Levels.from_rows(
    [
        {"color": "blue", "type": "solid", "index": 0, "price": 100.0},
        {"color": "orange", "type": "dashed", "index": 0, "price": 100.4},
    ],
    max_levels=8,
)
PARAMS = EngineParams.default()
W = 16
SIGMA = 0.3
DT = 1.0 / (390.0 * 252.0)


def _bars_from_uniforms(u, lanes=GATED_LANES, noise=False):
    """Regenerate the kernel's streaming GBM bars with the same jnp f32 ops
    (same XLA CPU backend in interpret mode → bitwise-identical bars), and
    collect the per-bar tie coins.  u: (4W, 8, B) f32 — 8 blocks per
    double-bar step (paired Box-Muller: one (u1, u2) draw yields the two
    bars' normals as (r·cos, r·sin)).  With ``noise``, u is (8W, 8, B) —
    stride 16 with the per-bar execution-noise normal pairs at ks 8..15 —
    and a third return carries the (4, P, W) noise normals."""
    stride = 16 if noise else 8
    drift = jnp.float32((0.0 - 0.5 * SIGMA * SIGMA) * DT)
    sig = jnp.float32(SIGMA * np.sqrt(DT))
    sig2dt = sig * sig
    log_s = jnp.full((GATED_SUB, lanes), jnp.float32(np.log(100.0)))
    opens, closes, highs, lows, ties = [], [], [], [], []
    nrm = [[], [], [], []]
    for t2 in range(W // 2):
        blk = lambda k: jnp.asarray(u[stride * t2 + k], jnp.float32)
        radius = jnp.sqrt(-2.0 * jnp.log(blk(0)))
        angle = 6.283185307179586 * blk(1)
        z_pair = (radius * jnp.cos(angle), radius * jnp.sin(angle))
        for half in range(2):
            z = z_pair[half]
            u3, u4, tie = blk(2 + 3 * half), blk(3 + 3 * half), blk(4 + 3 * half)
            if noise:
                r1 = jnp.sqrt(-2.0 * jnp.log(blk(8 + 4 * half)))
                a1 = 6.283185307179586 * blk(9 + 4 * half)
                r2 = jnp.sqrt(-2.0 * jnp.log(blk(10 + 4 * half)))
                a2 = 6.283185307179586 * blk(11 + 4 * half)
                nrm[0].append(r1 * jnp.cos(a1))
                nrm[1].append(r1 * jnp.sin(a1))
                nrm[2].append(r2 * jnp.cos(a2))
                nrm[3].append(r2 * jnp.sin(a2))
            incr = drift + sig * z
            log_open = log_s
            log_close = log_s + incr
            d2 = (log_close - log_open) ** 2
            highs.append(jnp.exp(0.5 * (log_open + log_close
                                        + jnp.sqrt(d2 - 2.0 * sig2dt * jnp.log(u3)))))
            lows.append(jnp.exp(0.5 * (log_open + log_close
                                       - jnp.sqrt(d2 - 2.0 * sig2dt * jnp.log(u4)))))
            opens.append(jnp.exp(log_open))
            closes.append(jnp.exp(log_close))
            ties.append(tie)
            log_s = log_close

    def flat(rows):  # list of W × (8, B) → (P, W)
        return jnp.stack(rows, axis=-1).reshape(GATED_SUB * lanes, W)

    bars = PathBars(open=flat(opens), high=flat(highs),
                    low=flat(lows), close=flat(closes),
                    volume=jnp.zeros((GATED_SUB * lanes, W), jnp.float32))
    if noise:
        return bars, flat(ties), tuple(flat(n) for n in nrm)
    return bars, flat(ties)


@pytest.mark.parametrize("gate_kw", [
    dict(touch_limit=100, touch_gap_bars=1, use_confidence=False),  # multi-trade
    dict(),                                                          # engine defaults
    dict(touch_limit=2, cooldown_bars=3),                            # tight gates
])
def test_gated_kernel_matches_xla_pipeline_exact_uniforms(gate_kw):
    rng = np.random.default_rng(0)
    u = rng.uniform(1e-6, 1.0, (1, 4 * W, GATED_SUB, GATED_LANES)).astype(np.float32)
    gate = GateConfig.default(**gate_kw)

    # plain XLA interpret (not the TPU-semantics simulator: a fori_loop over
    # a ~30-array carry takes minutes per op there); the external-RNG path
    # uses no TPU-specific primitives, so XLA interpret is faithful
    got = mc_paths_pallas_gated(
        0, LEVELS, PARAMS, gate, num_paths=GATED_BLOCK, num_bars=W,
        sigma=SIGMA, dt=DT, interpret=True,
        external_uniforms=u,
    )

    bars, tie = _bars_from_uniforms(u[0])
    out = gatedpath.gated_path_replay(bars, LEVELS, PARAMS, gate, tie)
    want = PathStats.from_lifecycle(
        equity=out.equity, trades=out.trades, wins=out.wins, losses=out.losses,
        open_at_end=out.open_at_end, max_dd=out.max_dd,
    )

    # counts are exact; sums tolerate reduction-order ulps
    assert float(got.n) == float(want.n) == GATED_BLOCK
    assert float(got.n_entered) == float(want.n_entered)
    assert float(got.n_tp) == float(want.n_tp)
    assert float(got.n_stop) == float(want.n_stop)
    assert float(got.n_open) == float(want.n_open)
    assert float(got.sum_trades) == float(want.sum_trades)
    assert float(got.sum_r) == pytest.approx(float(want.sum_r), abs=2e-2)
    assert float(got.sum_dd) == pytest.approx(float(want.sum_dd), abs=2e-2)
    assert float(got.min_r) == pytest.approx(float(want.min_r), abs=1e-5)
    assert float(got.max_r) == pytest.approx(float(want.max_r), abs=1e-5)
    assert float(got.max_dd) == pytest.approx(float(want.max_dd), abs=1e-5)
    np.testing.assert_array_equal(np.asarray(got.hist), np.asarray(want.hist))
    if gate_kw.get("touch_limit") == 100:
        assert float(got.sum_trades) > float(got.n_entered)  # multi-trade proof


def test_gated_tail_past_single_trade_range():
    """Multi-stop paths must resolve below -1.5R (the old single-trade
    histogram floor): stop-heavy gates produce per-path totals of -2R and
    beyond, and VaR(5%)/CVaR from the widened lifecycle histogram must report
    them — with the kernel and the XLA pipeline binning identically."""
    from qmmx_monolithic_monte_carlo_tpu.sim.pathsim import (
        LIFE_HIST_HI,
        LIFE_HIST_LO,
    )

    rng = np.random.default_rng(3)
    u = rng.uniform(1e-6, 1.0, (1, 4 * W, GATED_SUB, GATED_LANES)).astype(np.float32)
    # tight stop, unreachable target → nearly every trade is a -1R stop;
    # permissive gates → several trades per path
    params = EngineParams.default(stop_padding=0.02, tp_padding=5.0)
    gate = GateConfig.default(
        touch_limit=10_000, touch_gap_bars=1, use_confidence=False
    )

    got = mc_paths_pallas_gated(
        0, LEVELS, params, gate, num_paths=GATED_BLOCK, num_bars=W,
        sigma=SIGMA, dt=DT, interpret=True, external_uniforms=u,
    )
    bars, tie = _bars_from_uniforms(u[0])
    out = gatedpath.gated_path_replay(bars, LEVELS, params, gate, tie)
    want = PathStats.from_lifecycle(
        equity=out.equity, trades=out.trades, wins=out.wins, losses=out.losses,
        open_at_end=out.open_at_end, max_dd=out.max_dd,
    )

    # the scenario actually produces 2+ stop paths
    assert float(want.min_r) <= -2.0
    equity = np.asarray(out.equity)
    entered = np.asarray(out.trades) > 0
    assert (equity[entered] <= -2.0).mean() > 0.05

    # kernel and XLA bin identically over the lifecycle range
    assert got.hist_lo == want.hist_lo == LIFE_HIST_LO
    assert got.hist_hi == want.hist_hi == LIFE_HIST_HI
    np.testing.assert_array_equal(np.asarray(got.hist), np.asarray(want.hist))

    # VaR/CVaR resolve past the old -1.5R floor and track the exact quantile
    var_exact = np.quantile(equity[entered], 0.05)
    assert var_exact < -1.5
    var_hist = float(want.quantile(0.05))
    assert var_hist < -1.5
    bin_w = (LIFE_HIST_HI - LIFE_HIST_LO) / want.hist.shape[-1]
    assert abs(var_hist - var_exact) <= 2 * bin_w
    # exact CVaR = mean of the lowest 5% of mass (NOT "<= quantile": equity
    # totals tie heavily at integer stop counts, and <= would over-include)
    tail_n = max(1, int(np.floor(0.05 * entered.sum())))
    cvar_exact = np.sort(equity[entered])[:tail_n].mean()
    assert cvar_exact < -1.5
    assert float(want.cvar(0.05)) == pytest.approx(cvar_exact, abs=3 * bin_w)


def test_gated_kernel_noise_matches_xla_pipeline_exact_uniforms():
    """Per-entry execution noise in the fused gated kernel: with the noise
    normals reconstructed from the same injected uniforms, the kernel matches
    gated_path_replay(noise=...) exactly on counts and the histogram."""
    from qmmx_monolithic_monte_carlo_tpu.sim.montecarlo import McNoise

    rng = np.random.default_rng(17)
    u = rng.uniform(1e-6, 1.0, (1, 8 * W, GATED_SUB, GATED_LANES)).astype(np.float32)
    gate = GateConfig.default(touch_limit=100, touch_gap_bars=1,
                              use_confidence=False)
    noise = McNoise.make(level_jitter_std=0.02, entry_slip_std=0.01,
                         stop_slip_std=0.015, target_slip_std=0.015)

    got = mc_paths_pallas_gated(
        0, LEVELS, PARAMS, gate, num_paths=GATED_BLOCK, num_bars=W,
        sigma=SIGMA, dt=DT, noise=noise, interpret=True, external_uniforms=u,
    )
    bars, tie, nn = _bars_from_uniforms(u[0], noise=True)
    out = gatedpath.gated_path_replay(bars, LEVELS, PARAMS, gate, tie,
                                      noise=noise, noise_normals=nn)
    want = PathStats.from_lifecycle(
        equity=out.equity, trades=out.trades, wins=out.wins, losses=out.losses,
        open_at_end=out.open_at_end, max_dd=out.max_dd,
    )
    assert float(got.n) == float(want.n) == GATED_BLOCK
    assert float(got.n_entered) == float(want.n_entered)
    assert float(got.n_tp) == float(want.n_tp)
    assert float(got.n_stop) == float(want.n_stop)
    assert float(got.sum_trades) == float(want.sum_trades)
    assert float(got.sum_r) == pytest.approx(float(want.sum_r), abs=2e-2)
    assert float(got.min_r) == pytest.approx(float(want.min_r), abs=1e-5)
    assert float(got.max_dd) == pytest.approx(float(want.max_dd), abs=1e-5)
    np.testing.assert_array_equal(np.asarray(got.hist), np.asarray(want.hist))
    # the noise actually bites: R leaves the discrete zero-noise value set
    base = gatedpath.gated_path_replay(bars, LEVELS, PARAMS, gate, tie)
    assert float(jnp.sum(base.equity)) != float(jnp.sum(out.equity))


def test_gated_kernel_zero_noise_matches_noise_free_exact():
    """σ=0 noise mode consumes the extra draw rows but must reproduce the
    noise-free gated kernel bitwise (same price/tie uniform blocks)."""
    from qmmx_monolithic_monte_carlo_tpu.sim.montecarlo import McNoise

    rng = np.random.default_rng(19)
    u = rng.uniform(1e-6, 1.0, (1, 8 * W, GATED_SUB, GATED_LANES)).astype(np.float32)
    # the noise-free kernel reads blocks with stride 8 — build its uniform
    # tensor from the stride-16 tensor's price/tie blocks
    u8 = u[:, np.ravel([[16 * t + k for k in range(8)]
                        for t in range(W // 2)])]
    gate = GateConfig.default(touch_limit=100, touch_gap_bars=1,
                              use_confidence=False)
    zero = McNoise.make(level_jitter_std=0.0, entry_slip_std=0.0,
                        stop_slip_std=0.0, target_slip_std=0.0)
    a = mc_paths_pallas_gated(
        0, LEVELS, PARAMS, gate, num_paths=GATED_BLOCK, num_bars=W,
        sigma=SIGMA, dt=DT, noise=zero, interpret=True, external_uniforms=u,
    )
    b = mc_paths_pallas_gated(
        0, LEVELS, PARAMS, gate, num_paths=GATED_BLOCK, num_bars=W,
        sigma=SIGMA, dt=DT, interpret=True, external_uniforms=u8,
    )
    for fld in ("n", "n_entered", "n_tp", "n_stop", "n_open", "sum_trades",
                "sum_r", "min_r", "max_r", "max_dd"):
        assert float(getattr(a, fld)) == float(getattr(b, fld)), fld
    np.testing.assert_array_equal(np.asarray(a.hist), np.asarray(b.hist))


def test_gated_kernel_rejects_bad_shapes():
    with pytest.raises(ValueError):
        mc_paths_pallas_gated(0, LEVELS, PARAMS, num_paths=GATED_BLOCK + 1,
                              num_bars=W)


def test_gated_universe_kernel_rejects_bad_shapes():
    from qmmx_monolithic_monte_carlo_tpu.ops.pallas_mc import (
        mc_paths_pallas_gated_universe,
    )
    from qmmx_monolithic_monte_carlo_tpu.parallel import universe as U

    rows = [[{"color": "blue", "type": "solid", "index": 0, "price": 100.0}]]
    levels = U.stack_levels(rows, max_levels=8)
    with pytest.raises(ValueError):
        mc_paths_pallas_gated_universe(
            0, levels, PARAMS, np.array([100.0]), np.array([0.2]),
            paths_per_symbol=GATED_BLOCK + 1, num_bars=8,
        )


def test_gated_kernel_lanes_param_exact():
    """The per-call ``lanes`` width (swept for throughput on hardware) keeps
    exactness: a 512-lane block matches the XLA pipeline under injected
    uniforms just like the default width."""
    lanes = 512
    rng = np.random.default_rng(7)
    u = rng.uniform(1e-6, 1.0, (1, 4 * W, GATED_SUB, lanes)).astype(np.float32)
    gate = GateConfig.default(touch_limit=100, touch_gap_bars=1,
                              use_confidence=False)
    got = mc_paths_pallas_gated(
        0, LEVELS, PARAMS, gate, num_paths=GATED_SUB * lanes, num_bars=W,
        sigma=SIGMA, dt=DT, lanes=lanes, interpret=True, external_uniforms=u,
    )
    bars, tie = _bars_from_uniforms(u[0], lanes=lanes)
    out = gatedpath.gated_path_replay(bars, LEVELS, PARAMS, gate, tie)
    want = PathStats.from_lifecycle(
        equity=out.equity, trades=out.trades, wins=out.wins, losses=out.losses,
        open_at_end=out.open_at_end, max_dd=out.max_dd,
    )
    assert float(got.n) == float(want.n) == GATED_SUB * lanes
    assert float(got.n_entered) == float(want.n_entered)
    assert float(got.sum_trades) == float(want.sum_trades)
    assert float(got.sum_r) == pytest.approx(float(want.sum_r), abs=2e-2)
    np.testing.assert_array_equal(np.asarray(got.hist), np.asarray(want.hist))


@pytest.mark.slow
def test_gated_sweep_kernel_matches_single_configs_exact():
    """Gate-knob grid sweep (kernel 5): each grid configuration's stats match
    an independent single-config gated-kernel run under the SAME injected
    uniforms — the CRN grid changes nothing but the knobs."""
    from qmmx_monolithic_monte_carlo_tpu.ops.pallas_mc import (
        mc_paths_pallas_gated_sweep,
    )

    rng = np.random.default_rng(11)
    u = rng.uniform(1e-6, 1.0, (1, 4 * W, GATED_SUB, GATED_LANES)).astype(np.float32)
    stops = [0.35, 0.20, 0.35, 0.35]
    tps = [0.25, 0.25, 0.40, 0.25]
    gates = [
        GateConfig.default(),
        GateConfig.default(q_min_prob=0.40),
        GateConfig.default(touch_limit=2, cooldown_bars=3),
        GateConfig.default(touch_limit=100, touch_gap_bars=1,
                           use_confidence=False),
    ]
    grid_gate = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *gates)

    got = mc_paths_pallas_gated_sweep(
        0, LEVELS, PARAMS, stops, tps, grid_gate,
        num_paths=GATED_BLOCK, num_bars=W, sigma=SIGMA, dt=DT,
        interpret=True, external_uniforms=u,
    )
    assert got.n.shape == (4,)
    for g, (sp, tp, gt) in enumerate(zip(stops, tps, gates)):
        params_g = EngineParams.default(stop_padding=sp, tp_padding=tp)
        want = mc_paths_pallas_gated(
            0, LEVELS, params_g, gt, num_paths=GATED_BLOCK, num_bars=W,
            sigma=SIGMA, dt=DT, interpret=True, external_uniforms=u,
        )
        for f in ("n", "n_entered", "n_tp", "n_stop", "n_open", "sum_trades"):
            assert float(getattr(got, f)[g]) == float(getattr(want, f)), (g, f)
        assert float(got.sum_r[g]) == pytest.approx(float(want.sum_r), abs=1e-4)
        assert float(got.max_dd[g]) == pytest.approx(float(want.max_dd), abs=1e-5)
        np.testing.assert_array_equal(
            np.asarray(got.hist[g]), np.asarray(want.hist))
    # the grid actually varies: permissive config 3 trades more than tight 2
    assert float(got.sum_trades[3]) > float(got.sum_trades[2])


def test_gated_universe_per_symbol_knobs_exact():
    """Per-symbol engine knobs ride the symbol slab: each symbol of a 2-symbol
    universe with DISTINCT (prox, stop_pad, tp_pad) matches a single-config
    gated-kernel run of that symbol under the same injected uniforms."""
    import jax as _jax

    from qmmx_monolithic_monte_carlo_tpu.ops.pallas_mc import (
        mc_paths_pallas_gated_universe,
    )
    from qmmx_monolithic_monte_carlo_tpu.parallel import universe as U

    rows = [
        [{"color": "blue", "type": "solid", "index": 0, "price": 100.0}],
        [{"color": "red", "type": "dashed", "index": 0, "price": 100.3}],
    ]
    levels2 = U.stack_levels(rows, max_levels=8)
    s0 = np.array([100.0, 100.0], np.float32)
    sigma = np.array([SIGMA, SIGMA], np.float32)
    prox = np.array([0.05, 0.08], np.float32)
    sp = np.array([0.35, 0.20], np.float32)
    tp = np.array([0.25, 0.40], np.float32)
    params_vec = PARAMS.replace(
        contact_prox=jnp.asarray(prox), stop_padding=jnp.asarray(sp),
        tp_padding=jnp.asarray(tp))
    gate = GateConfig.default(touch_limit=100, touch_gap_bars=1,
                              use_confidence=False)
    rng = np.random.default_rng(13)
    u = rng.uniform(1e-6, 1.0, (2, 1, 4 * W, GATED_SUB, GATED_LANES)).astype(np.float32)

    got = mc_paths_pallas_gated_universe(
        0, levels2, params_vec, s0, sigma, gate,
        paths_per_symbol=GATED_BLOCK, num_bars=W, dt=DT,
        interpret=True, external_uniforms=u,
    )
    assert got.n.shape == (2,)
    for s in range(2):
        params_s = EngineParams.default(
            contact_prox=float(prox[s]), stop_padding=float(sp[s]),
            tp_padding=float(tp[s]))
        levels_s = _jax.tree_util.tree_map(lambda x: x[s], levels2)
        want = mc_paths_pallas_gated(
            0, levels_s, params_s, gate, num_paths=GATED_BLOCK, num_bars=W,
            sigma=SIGMA, dt=DT, interpret=True, external_uniforms=u[s],
        )
        for f in ("n", "n_entered", "n_tp", "n_stop", "n_open", "sum_trades"):
            assert float(getattr(got, f)[s]) == float(getattr(want, f)), (s, f)
        np.testing.assert_array_equal(
            np.asarray(got.hist[s]), np.asarray(want.hist))
    # the knobs actually differ per symbol
    assert float(got.n_entered[0]) != float(got.n_entered[1]) or \
        float(got.sum_r[0]) != float(got.sum_r[1])


@pytest.mark.slow
def test_gated_sweep_noise_std_rows_match_single_configs():
    """[G]-leaved McNoise stds on the gated sweep's grid axis: each row
    equals a single-config gated-kernel run with that row's scalar stds
    under the same injected uniforms (row 0: zero stds == the noise-free
    decision trace)."""
    from qmmx_monolithic_monte_carlo_tpu.ops.pallas_mc import (
        mc_paths_pallas_gated_sweep,
    )
    from qmmx_monolithic_monte_carlo_tpu.sim.montecarlo import McNoise

    rng = np.random.default_rng(47)
    u = rng.uniform(1e-6, 1.0, (1, 8 * W, GATED_SUB, GATED_LANES)).astype(np.float32)
    gate = GateConfig.default(touch_limit=100, touch_gap_bars=1,
                              use_confidence=False)
    grid_gate = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), gate, gate)
    stds = [(0.0, 0.0, 0.0, 0.0), (0.02, 0.01, 0.015, 0.015)]
    noise_grid = McNoise(
        level_jitter_std=jnp.asarray([s[0] for s in stds], jnp.float32),
        entry_slip_std=jnp.asarray([s[1] for s in stds], jnp.float32),
        stop_slip_std=jnp.asarray([s[2] for s in stds], jnp.float32),
        target_slip_std=jnp.asarray([s[3] for s in stds], jnp.float32),
    )

    got = mc_paths_pallas_gated_sweep(
        0, LEVELS, PARAMS, [0.35, 0.35], [0.25, 0.25], grid_gate,
        num_paths=GATED_BLOCK, num_bars=W, sigma=SIGMA, dt=DT,
        noise=noise_grid, interpret=True, external_uniforms=u,
    )
    assert got.n.shape == (2,)
    for g, s in enumerate(stds):
        single = McNoise.make(level_jitter_std=s[0], entry_slip_std=s[1],
                              stop_slip_std=s[2], target_slip_std=s[3])
        want = mc_paths_pallas_gated(
            0, LEVELS, PARAMS, gate, num_paths=GATED_BLOCK, num_bars=W,
            sigma=SIGMA, dt=DT, noise=single, interpret=True,
            external_uniforms=u,
        )
        for f in ("n", "n_entered", "n_tp", "n_stop", "sum_trades"):
            assert float(getattr(got, f)[g]) == float(getattr(want, f)), (g, f)
        np.testing.assert_array_equal(np.asarray(got.hist[g]),
                                      np.asarray(want.hist))
        assert float(got.sum_r[g]) == pytest.approx(float(want.sum_r), abs=1e-4)
    assert float(got.sum_r[0]) != float(got.sum_r[1])  # the stds bite


def test_gated_universe_per_symbol_noise_exact():
    """Per-symbol McNoise stds ride the gated universe slab: each symbol of
    a 2-symbol universe with DISTINCT stds matches a single-config
    gated-kernel run with those scalar stds under the same injected
    uniforms."""
    from qmmx_monolithic_monte_carlo_tpu.ops.pallas_mc import (
        mc_paths_pallas_gated_universe,
    )
    from qmmx_monolithic_monte_carlo_tpu.parallel import universe as U
    from qmmx_monolithic_monte_carlo_tpu.sim.montecarlo import McNoise

    rows = [
        [{"color": "blue", "type": "solid", "index": 0, "price": 100.0}],
        [{"color": "red", "type": "dashed", "index": 0, "price": 100.3}],
    ]
    levels2 = U.stack_levels(rows, max_levels=8)
    s0 = np.array([100.0, 100.0], np.float32)
    sigma = np.array([SIGMA, SIGMA], np.float32)
    stds = [(0.0, 0.0, 0.0, 0.0), (0.03, 0.01, 0.02, 0.02)]
    noise_vec = McNoise(
        level_jitter_std=jnp.asarray([s[0] for s in stds], jnp.float32),
        entry_slip_std=jnp.asarray([s[1] for s in stds], jnp.float32),
        stop_slip_std=jnp.asarray([s[2] for s in stds], jnp.float32),
        target_slip_std=jnp.asarray([s[3] for s in stds], jnp.float32),
    )
    gate = GateConfig.default(touch_limit=100, touch_gap_bars=1,
                              use_confidence=False)
    rng = np.random.default_rng(53)
    u = rng.uniform(1e-6, 1.0, (2, 1, 8 * W, GATED_SUB, GATED_LANES)).astype(np.float32)

    got = mc_paths_pallas_gated_universe(
        0, levels2, PARAMS, s0, sigma, gate,
        paths_per_symbol=GATED_BLOCK, num_bars=W, dt=DT,
        noise=noise_vec, interpret=True, external_uniforms=u,
    )
    assert got.n.shape == (2,)
    for s in range(2):
        single = McNoise.make(level_jitter_std=stds[s][0],
                              entry_slip_std=stds[s][1],
                              stop_slip_std=stds[s][2],
                              target_slip_std=stds[s][3])
        levels_s = jax.tree_util.tree_map(lambda x: x[s], levels2)
        want = mc_paths_pallas_gated(
            0, levels_s, PARAMS, gate, num_paths=GATED_BLOCK, num_bars=W,
            sigma=SIGMA, dt=DT, noise=single, interpret=True,
            external_uniforms=u[s],
        )
        for f in ("n", "n_entered", "n_tp", "n_stop", "sum_trades"):
            assert float(getattr(got, f)[s]) == float(getattr(want, f)), (s, f)
        np.testing.assert_array_equal(np.asarray(got.hist[s]),
                                      np.asarray(want.hist))
