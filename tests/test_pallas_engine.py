"""Fused FULL-ENGINE kernel: exact parity vs sim/enginepath.py under injected
uniforms (plain interpret mode on CPU — the external-RNG path uses no TPU
primitives, so XLA interpret is faithful)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qmmx_monolithic_monte_carlo_tpu.config import EngineParams
from qmmx_monolithic_monte_carlo_tpu.engine.state import MlModel
from qmmx_monolithic_monte_carlo_tpu.models import online_policy as OP
from qmmx_monolithic_monte_carlo_tpu.ops import guard as G
from qmmx_monolithic_monte_carlo_tpu.ops import touch as T
from qmmx_monolithic_monte_carlo_tpu.ops.pallas_engine import (
    DRAWS_PER_PAIR,
    ENGINE_SUB,
    mc_paths_pallas_engine,
)
from qmmx_monolithic_monte_carlo_tpu.ops.pathgen import PathBars, VolumeModel
from qmmx_monolithic_monte_carlo_tpu.sim import enginepath as EP
from qmmx_monolithic_monte_carlo_tpu.sim.pathsim import PathStats
from qmmx_monolithic_monte_carlo_tpu.types import Levels

LEVELS = Levels.from_rows(
    [
        {"color": "blue", "type": "solid", "index": 0, "price": 100.0},
        {"color": "orange", "type": "dashed", "index": 0, "price": 100.4},
        {"color": "teal", "type": "solid", "index": 0, "price": 99.6},
    ],
    max_levels=8,
)
W = 40
DT = 1.0 / (390.0 * 252.0)
LANES = 256
BLOCK = ENGINE_SUB * LANES
VM = VolumeModel()


def _bars_from_uniforms(u, sigma, lanes=LANES, vm=VM, with_noise=False,
                        w=W, s0=100.0, antithetic=False, um=None, beta=0.0):
    """Regenerate the kernel's streaming bars AND volumes with the same jnp
    f32 ops from the injected uniform layout (10 blocks per double-bar step:
    price-normal pair, volume-normal pair, then (u_high, u_low, tie) per
    half).  With ``noise``, u has stride 18 (per-bar execution-noise normal
    pairs at ks 10..17) and a third return carries the (4, P, W) normals.
    Odd ``w`` consumes a final draw block's first Box-Muller branch only
    (the kernel's half-step tail).  With ``um`` (the corr kernel's shared
    market tensor, rows [2*t2, 2*t2+1]) the price shock becomes
    ``beta*z_mkt + sqrt(1-beta^2)*eps`` — the correlated z also drives the
    volume model, matching the engine corr kernel."""
    stride = 18 if with_noise else 10
    nrm = [[], [], [], []]
    drift = jnp.float32((0.0 - 0.5 * sigma * sigma) * DT)
    sig = jnp.float32(sigma * np.sqrt(DT))
    sig2dt = sig * sig
    mean_abs = jnp.float32(np.sqrt(2.0 / np.pi))
    sd_abs = jnp.float32(np.sqrt(1.0 - 2.0 / np.pi))
    log_s = jnp.full((ENGINE_SUB, lanes), jnp.float32(np.log(s0)))
    opens, closes, highs, lows, vols, ties = [], [], [], [], [], []
    for t2 in range((w + 1) // 2):
        blk = lambda k: jnp.asarray(u[stride * t2 + k], jnp.float32)
        radius = jnp.sqrt(-2.0 * jnp.log(blk(0)))
        angle = 6.283185307179586 * blk(1)
        z_pair = (radius * jnp.cos(angle), radius * jnp.sin(angle))
        if antithetic:
            # kernel antithetic: right half-lanes = left's normals negated
            half_l = lanes // 2
            z_pair = tuple(
                jnp.concatenate([z[:, :half_l], -z[:, :half_l]], axis=1)
                for z in z_pair)
        if um is not None:
            mrad = jnp.sqrt(-2.0 * jnp.log(jnp.asarray(um[2 * t2],
                                                       jnp.float32)))
            mang = 6.283185307179586 * jnp.asarray(um[2 * t2 + 1], jnp.float32)
            zm_pair = (mrad * jnp.cos(mang), mrad * jnp.sin(mang))
            if antithetic:
                # antithetic BOOK pairs flip the market shock too
                half_l = lanes // 2
                zm_pair = tuple(
                    jnp.concatenate([z[:, :half_l], -z[:, :half_l]], axis=1)
                    for z in zm_pair)
            bta = jnp.float32(beta)
            perp = jnp.sqrt(jnp.maximum(jnp.float32(0.0), 1.0 - bta * bta))
            z_pair = (bta * zm_pair[0] + perp * z_pair[0],
                      bta * zm_pair[1] + perp * z_pair[1])
        vradius = jnp.sqrt(-2.0 * jnp.log(blk(2)))
        vangle = 6.283185307179586 * blk(3)
        zv_pair = (vradius * jnp.cos(vangle), vradius * jnp.sin(vangle))
        halves = 1 if (w % 2 and t2 == w // 2) else 2
        for half in range(halves):
            t = 2 * t2 + half
            z, zv = z_pair[half], zv_pair[half]
            u3, u4, tie = blk(4 + 3 * half), blk(5 + 3 * half), blk(6 + 3 * half)
            if with_noise:
                r1 = jnp.sqrt(-2.0 * jnp.log(blk(10 + 4 * half)))
                a1 = 6.283185307179586 * blk(11 + 4 * half)
                r2 = jnp.sqrt(-2.0 * jnp.log(blk(12 + 4 * half)))
                a2 = 6.283185307179586 * blk(13 + 4 * half)
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
            # the kernel's in-loop VolumeModel mirror
            m = jnp.mod(jnp.float32(vm.open_minute) + jnp.float32(t),
                        jnp.float32(vm.day_minutes))
            x = 2.0 * m / jnp.float32(max(vm.day_minutes - 1, 1)) - 1.0
            shape = 1.0 + jnp.float32(vm.u_amp) * (x * x - jnp.float32(1.0 / 3.0))
            noise = jnp.exp(jnp.float32(vm.noise_sigma) * zv
                            - 0.5 * jnp.float32(vm.noise_sigma) ** 2)
            v = jnp.float32(vm.base) * shape * noise
            v = v * (1.0 + jnp.float32(vm.ret_coupling)
                     * ((jnp.abs(z) - mean_abs) / sd_abs))
            vols.append(jnp.maximum(v, jnp.float32(0.05 * vm.base)))
            log_s = log_close

    def flat(rows):  # list of W × (8, B) → (P, W)
        return jnp.stack(rows, axis=-1).reshape(ENGINE_SUB * lanes, w)

    bars = PathBars(open=flat(opens), high=flat(highs), low=flat(lows),
                    close=flat(closes), volume=flat(vols))
    if with_noise:
        return bars, flat(ties), tuple(flat(n) for n in nrm)
    return bars, flat(ties)


def _run_both(seed, sigma, *, params=None, policy=None, ml_model=None,
              touch_params=None, guard_params=None, escalation=True):
    if params is None:
        params = EngineParams.default()
    rng = np.random.default_rng(seed)
    u = rng.uniform(
        1e-6, 1.0, (1, DRAWS_PER_PAIR * (W // 2), ENGINE_SUB, LANES),
    ).astype(np.float32)

    got, got_skips, got_escal = mc_paths_pallas_engine(
        0, LEVELS, params, num_paths=BLOCK, num_bars=W, sigma=sigma, dt=DT,
        lanes=LANES, policy=policy, ml_model=ml_model,
        touch_params=touch_params, guard_params=guard_params,
        escalation=escalation, interpret=True, external_uniforms=u,
    )

    bars, tie = _bars_from_uniforms(u[0], sigma)
    out = EP.engine_path_replay(
        bars, LEVELS, params, tie, policy=policy, ml_model=ml_model,
        touch_params=touch_params, guard_params=guard_params,
        escalation=escalation,
    )
    want = PathStats.from_lifecycle(
        equity=out.equity, trades=out.trades, wins=out.wins, losses=out.losses,
        open_at_end=out.open_at_end, max_dd=out.max_dd,
    )
    return (got, got_skips, got_escal), (want, out)


def _assert_match(got_pack, want_pack):
    got, got_skips, got_escal = got_pack
    want, out = want_pack
    # counts are exact; sums tolerate reduction-order ulps
    assert float(got.n) == float(want.n) == BLOCK
    assert float(got.n_entered) == float(want.n_entered)
    assert float(got.n_tp) == float(want.n_tp)
    assert float(got.n_stop) == float(want.n_stop)
    assert float(got.n_open) == float(want.n_open)
    assert float(got.sum_trades) == float(want.sum_trades)
    assert float(got_escal) == float(jnp.sum(out.escalations))
    np.testing.assert_array_equal(np.asarray(got_skips),
                                  np.asarray(out.skip_counts))
    assert float(got.sum_r) == pytest.approx(float(want.sum_r), abs=2e-2)
    assert float(got.sum_dd) == pytest.approx(float(want.sum_dd), abs=2e-2)
    assert float(got.min_r) == pytest.approx(float(want.min_r), abs=1e-5)
    assert float(got.max_r) == pytest.approx(float(want.max_r), abs=1e-5)
    assert float(got.max_dd) == pytest.approx(float(want.max_dd), abs=1e-5)
    np.testing.assert_array_equal(np.asarray(got.hist), np.asarray(want.hist))


@pytest.mark.slow
def test_engine_kernel_matches_xla_pipeline_defaults():
    """Engine defaults: the main ladder + veto + escalation run and agree
    gate-for-gate with the XLA full-engine pipeline."""
    got_pack, want_pack = _run_both(0, sigma=0.3)
    _assert_match(got_pack, want_pack)
    got, got_skips, got_escal = got_pack
    assert float(got.n_entered) > 0
    assert float(got.sum_trades) > float(got.n_entered)  # multi-trade proof
    skips = {r.name: float(s) for r, s in zip(EP.SKIP_REASONS,
                                              np.asarray(got_skips))}
    assert skips["TOO_FAR"] > 0
    assert skips["CONF_LOW"] > 0
    assert skips["CONTRA_VOL_LONG"] + skips["CONTRA_VOL_SHORT"] > 0
    assert float(got_escal) > 0  # escalations occur at this scale


@pytest.mark.slow
def test_engine_kernel_matches_with_accumulation_gates_active():
    """Force the guard into accumulation (tiny vol, generous compression) so
    the 7b family — edge fatigue, bounce budget, per-level cooldown — and the
    breakout counter-trend gate actually fire, and still match exactly."""
    guard = G.GuardParams.default().replace(
        min_bars=jnp.int32(6), compression_bp=jnp.float32(300.0))
    touch = T.TouchMemoryParams.default().replace(
        max_bounces=jnp.int32(1), min_time_gap_ms=jnp.int32(120_000),
        fatigue_vol_k=jnp.float32(0.0))
    got_pack, want_pack = _run_both(
        1, sigma=0.05, guard_params=guard, touch_params=touch)
    _assert_match(got_pack, want_pack)
    skips = {r.name: float(s) for r, s in zip(EP.SKIP_REASONS,
                                              np.asarray(got_pack[1]))}
    assert skips["EDGE_FATIGUE"] + skips["TOUCH_BUDGET"] + \
        skips["TOUCH_COOLDOWN"] > 0


@pytest.mark.slow
def test_engine_kernel_matches_with_ml_and_policy_gates():
    """Armed ML + OnlinePolicy gates (nonzero heads) agree exactly."""
    rng = np.random.default_rng(7)
    pol = OP.PolicyParams.init()
    w_entry = rng.normal(0, 0.8, (3, 7)).astype(np.float32)
    w_entry[0, 0] += 0.8
    w_entry[1, 0] += 0.8
    w_entry[2, 0] -= 0.5
    pol = pol.replace(w_entry=jnp.asarray(w_entry))
    ml = MlModel.from_weights(np.array([0.4, -0.8, -0.3, 0.2], np.float32), 0.55)
    got_pack, want_pack = _run_both(2, sigma=0.3, policy=pol, ml_model=ml)
    _assert_match(got_pack, want_pack)
    skips = {r.name: float(s) for r, s in zip(EP.SKIP_REASONS,
                                              np.asarray(got_pack[1]))}
    assert skips["ML_CONF_LOW"] > 0
    assert skips["ONLINE_POLICY"] > 0


@pytest.mark.slow
def test_engine_kernel_noise_matches_xla_pipeline_exact():
    """Per-entry execution noise in the FULL-ENGINE kernel: with the noise
    normals reconstructed from the same injected uniforms, the kernel matches
    engine_path_replay(noise=...) exactly on counts, skip table, escalations
    and the histogram — and σ=0 noise mode reproduces the noise-free kernel
    bitwise."""
    from qmmx_monolithic_monte_carlo_tpu.sim.montecarlo import McNoise

    params = EngineParams.default()
    rng = np.random.default_rng(31)
    u = rng.uniform(
        1e-6, 1.0, (1, 18 * (W // 2), ENGINE_SUB, LANES)).astype(np.float32)
    noise = McNoise.make(level_jitter_std=0.02, entry_slip_std=0.01,
                         stop_slip_std=0.015, target_slip_std=0.015)

    got, got_skips, got_escal = mc_paths_pallas_engine(
        0, LEVELS, params, num_paths=BLOCK, num_bars=W, sigma=0.3, dt=DT,
        lanes=LANES, noise=noise, interpret=True, external_uniforms=u,
    )
    bars, tie, nn = _bars_from_uniforms(u[0], 0.3, with_noise=True)
    out = EP.engine_path_replay(bars, LEVELS, params, tie,
                                noise=noise, noise_normals=nn)
    want = PathStats.from_lifecycle(
        equity=out.equity, trades=out.trades, wins=out.wins, losses=out.losses,
        open_at_end=out.open_at_end, max_dd=out.max_dd,
    )
    assert float(got.n) == float(want.n) == BLOCK
    assert float(got.n_entered) == float(want.n_entered)
    assert float(got.n_tp) == float(want.n_tp)
    assert float(got.n_stop) == float(want.n_stop)
    assert float(got.sum_trades) == float(want.sum_trades)
    assert float(got_escal) == float(jnp.sum(out.escalations))
    np.testing.assert_array_equal(np.asarray(got_skips),
                                  np.asarray(out.skip_counts))
    assert float(got.sum_r) == pytest.approx(float(want.sum_r), abs=2e-2)
    np.testing.assert_array_equal(np.asarray(got.hist), np.asarray(want.hist))
    # the noise actually bites
    base = EP.engine_path_replay(bars, LEVELS, params, tie)
    assert float(jnp.sum(base.equity)) != float(jnp.sum(out.equity))

    # σ=0 noise mode == noise-free kernel bitwise (stride-8 price/tie blocks)
    u10 = u[:, np.ravel([[18 * t + k for k in range(10)]
                         for t in range(W // 2)])]
    zero = McNoise.make(level_jitter_std=0.0, entry_slip_std=0.0,
                        stop_slip_std=0.0, target_slip_std=0.0)
    a = mc_paths_pallas_engine(
        0, LEVELS, params, num_paths=BLOCK, num_bars=W, sigma=0.3, dt=DT,
        lanes=LANES, noise=zero, interpret=True, external_uniforms=u,
    )
    b = mc_paths_pallas_engine(
        0, LEVELS, params, num_paths=BLOCK, num_bars=W, sigma=0.3, dt=DT,
        lanes=LANES, interpret=True, external_uniforms=u10,
    )
    for fld in ("n", "n_entered", "n_tp", "n_stop", "sum_trades", "sum_r",
                "min_r", "max_r", "max_dd"):
        assert float(getattr(a[0], fld)) == float(getattr(b[0], fld)), fld
    np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))
    assert float(a[2]) == float(b[2])


@pytest.mark.slow
def test_engine_sweep_kernel_matches_single_configs_exact():
    """Engine-knob CRN grid sweep: each grid row's stats (counts, skip table,
    escalations, histogram) match an independent single-config engine-kernel
    run under the SAME injected uniforms."""
    from qmmx_monolithic_monte_carlo_tpu.ops.pallas_engine import (
        mc_paths_pallas_engine_sweep,
    )

    # kernel-vs-kernel comparison: a shorter horizon than the parity tests
    # keeps every knob's effect visible at a fraction of the interpret cost
    w2 = 24
    rng = np.random.default_rng(23)
    u = rng.uniform(
        1e-6, 1.0, (1, DRAWS_PER_PAIR * (w2 // 2), ENGINE_SUB, LANES),
    ).astype(np.float32)
    cfgs = [
        EngineParams.default(),
        EngineParams.default(stop_padding=0.20, tp_padding=0.40),
        EngineParams.default(q_min_prob=0.40, enable_veto=False),
        EngineParams.default(overtouch_limit=2, cooldown_s=180.0),
    ]
    grid = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *cfgs)

    got, got_skips, got_escal = mc_paths_pallas_engine_sweep(
        0, LEVELS, grid, num_paths=BLOCK, num_bars=w2, sigma=0.3, dt=DT,
        lanes=LANES, interpret=True, external_uniforms=u,
    )
    assert got.n.shape == (len(cfgs),)
    for g, cfg in enumerate(cfgs):
        want, wskips, wescal = mc_paths_pallas_engine(
            0, LEVELS, cfg, num_paths=BLOCK, num_bars=w2, sigma=0.3, dt=DT,
            lanes=LANES, interpret=True, external_uniforms=u,
        )
        for f in ("n", "n_entered", "n_tp", "n_stop", "n_open", "sum_trades"):
            assert float(getattr(got, f)[g]) == float(getattr(want, f)), (g, f)
        assert float(got_escal[g]) == float(wescal), g
        np.testing.assert_array_equal(np.asarray(got_skips[g]),
                                      np.asarray(wskips))
        assert float(got.sum_r[g]) == pytest.approx(float(want.sum_r), abs=1e-4)
        assert float(got.max_dd[g]) == pytest.approx(float(want.max_dd), abs=1e-5)
        np.testing.assert_array_equal(np.asarray(got.hist[g]),
                                      np.asarray(want.hist))
    # the grid actually varies the decision surface
    assert float(got.n_entered[2]) != float(got.n_entered[3]) or \
        float(got.sum_r[1]) != float(got.sum_r[0])


@pytest.mark.slow
def test_engine_universe_per_symbol_knobs_exact():
    """Per-symbol FULL-ENGINE universe: each symbol of a 2-symbol universe
    with DISTINCT engine knobs (paddings, q_min, veto) matches a
    single-config engine-kernel run of that symbol under the same injected
    uniforms."""
    from qmmx_monolithic_monte_carlo_tpu.ops.pallas_engine import (
        mc_paths_pallas_engine_universe,
    )
    from qmmx_monolithic_monte_carlo_tpu.parallel import universe as U

    rows = [
        [{"color": "blue", "type": "solid", "index": 0, "price": 100.0},
         {"color": "teal", "type": "solid", "index": 0, "price": 99.6}],
        [{"color": "red", "type": "dashed", "index": 0, "price": 100.3}],
    ]
    levels2 = U.stack_levels(rows, max_levels=8)
    s0 = np.array([100.0, 100.0], np.float32)
    sigma = np.array([0.3, 0.3], np.float32)
    sp = np.array([0.35, 0.20], np.float32)
    tp = np.array([0.25, 0.40], np.float32)
    qm = np.array([0.60, 0.40], np.float32)
    params_vec = EngineParams.default().replace(
        stop_padding=jnp.asarray(sp), tp_padding=jnp.asarray(tp),
        q_min_prob=jnp.asarray(qm))
    w2 = 24   # kernel-vs-kernel: shorter horizon, same knob coverage
    rng = np.random.default_rng(29)
    u = rng.uniform(
        1e-6, 1.0, (2, 1, DRAWS_PER_PAIR * (w2 // 2), ENGINE_SUB, LANES),
    ).astype(np.float32)

    got, got_skips, got_escal = mc_paths_pallas_engine_universe(
        0, levels2, params_vec, s0, sigma,
        paths_per_symbol=BLOCK, num_bars=w2, dt=DT, lanes=LANES,
        interpret=True, external_uniforms=u,
    )
    assert got.n.shape == (2,)
    for s in range(2):
        params_s = EngineParams.default(
            stop_padding=float(sp[s]), tp_padding=float(tp[s]),
            q_min_prob=float(qm[s]))
        levels_s = jax.tree_util.tree_map(lambda x: x[s], levels2)
        want, wskips, wescal = mc_paths_pallas_engine(
            0, levels_s, params_s, num_paths=BLOCK, num_bars=w2,
            sigma=float(sigma[s]), dt=DT, lanes=LANES,
            interpret=True, external_uniforms=u[s],
        )
        for f in ("n", "n_entered", "n_tp", "n_stop", "n_open", "sum_trades"):
            assert float(getattr(got, f)[s]) == float(getattr(want, f)), (s, f)
        assert float(got_escal[s]) == float(wescal), s
        np.testing.assert_array_equal(np.asarray(got_skips[s]),
                                      np.asarray(wskips))
        np.testing.assert_array_equal(np.asarray(got.hist[s]),
                                      np.asarray(want.hist))
    # the knobs actually differ per symbol
    assert float(got.n_entered[0]) != float(got.n_entered[1]) or \
        float(got.sum_r[0]) != float(got.sum_r[1])


def test_engine_kernel_rejects_bad_shapes():
    params = EngineParams.default()
    with pytest.raises(ValueError):
        mc_paths_pallas_engine(0, LEVELS, params, num_paths=BLOCK + 1,
                               num_bars=W, lanes=LANES)
    with pytest.raises(ValueError):
        mc_paths_pallas_engine(0, LEVELS, params, num_paths=BLOCK,
                               num_bars=62, lanes=LANES)
    with pytest.raises(ValueError):
        mc_paths_pallas_engine(
            0, LEVELS, params, num_paths=BLOCK, num_bars=W, lanes=LANES,
            touch_params=T.TouchMemoryParams.default().replace(
                fatigue_hits=jnp.int32(4)))


@pytest.mark.slow
def test_engine_sweep_noise_std_rows_match_single_configs():
    """[G]-leaved McNoise stds sweep slippage sensitivity under CRN: each
    grid row equals a single-config engine run with that row's scalar stds
    under the same injected uniforms (row 0: all-zero stds == the noise-free
    decision trace)."""
    from qmmx_monolithic_monte_carlo_tpu.ops.pallas_engine import (
        mc_paths_pallas_engine_sweep,
    )
    from qmmx_monolithic_monte_carlo_tpu.sim.montecarlo import McNoise

    w2 = 16
    rng = np.random.default_rng(37)
    u = rng.uniform(
        1e-6, 1.0, (1, 18 * (w2 // 2), ENGINE_SUB, LANES)).astype(np.float32)
    params = EngineParams.default()
    grid_params = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), params, params)   # 2 identical knob rows
    stds = [(0.0, 0.0, 0.0, 0.0), (0.02, 0.01, 0.015, 0.015)]
    noise_grid = McNoise(
        level_jitter_std=jnp.asarray([s[0] for s in stds], jnp.float32),
        entry_slip_std=jnp.asarray([s[1] for s in stds], jnp.float32),
        stop_slip_std=jnp.asarray([s[2] for s in stds], jnp.float32),
        target_slip_std=jnp.asarray([s[3] for s in stds], jnp.float32),
    )

    got, got_skips, got_escal = mc_paths_pallas_engine_sweep(
        0, LEVELS, grid_params, num_paths=BLOCK, num_bars=w2, sigma=0.3,
        dt=DT, lanes=LANES, noise=noise_grid, interpret=True,
        external_uniforms=u,
    )
    assert got.n.shape == (2,)
    for g, s in enumerate(stds):
        single = McNoise.make(level_jitter_std=s[0], entry_slip_std=s[1],
                              stop_slip_std=s[2], target_slip_std=s[3])
        want, wskips, wescal = mc_paths_pallas_engine(
            0, LEVELS, params, num_paths=BLOCK, num_bars=w2, sigma=0.3,
            dt=DT, lanes=LANES, noise=single, interpret=True,
            external_uniforms=u,
        )
        for f in ("n", "n_entered", "n_tp", "n_stop", "sum_trades"):
            assert float(getattr(got, f)[g]) == float(getattr(want, f)), (g, f)
        assert float(got_escal[g]) == float(wescal), g
        np.testing.assert_array_equal(np.asarray(got_skips[g]),
                                      np.asarray(wskips))
        np.testing.assert_array_equal(np.asarray(got.hist[g]),
                                      np.asarray(want.hist))
        assert float(got.sum_r[g]) == pytest.approx(float(want.sum_r), abs=1e-4)
    # the stds actually bite: the noised row's equity differs
    assert float(got.sum_r[0]) != float(got.sum_r[1])


@pytest.mark.slow
def test_engine_universe_sweep_matches_single_configs_exact():
    """Sweep-of-universes: every (symbol, grid-row) cell of the one-launch
    [S, G] surface equals a single-config engine-kernel run with that
    symbol's levels/sigma and that row's knobs under the same injected
    uniforms."""
    from qmmx_monolithic_monte_carlo_tpu.ops.pallas_engine import (
        mc_paths_pallas_engine_universe_sweep,
    )
    from qmmx_monolithic_monte_carlo_tpu.parallel import universe as U

    w2 = 16
    rows = [
        [{"color": "blue", "type": "solid", "index": 0, "price": 100.0}],
        [{"color": "red", "type": "dashed", "index": 0, "price": 100.3}],
    ]
    levels2 = U.stack_levels(rows, max_levels=8)
    s0 = np.array([100.0, 100.0], np.float32)
    sigma = np.array([0.3, 0.2], np.float32)
    cfgs = [EngineParams.default(),
            EngineParams.default(stop_padding=0.20, tp_padding=0.40,
                                 q_min_prob=0.40)]
    grid = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *cfgs)
    rng = np.random.default_rng(43)
    u = rng.uniform(
        1e-6, 1.0, (2, 1, DRAWS_PER_PAIR * (w2 // 2), ENGINE_SUB, LANES),
    ).astype(np.float32)

    got, got_skips, got_escal = mc_paths_pallas_engine_universe_sweep(
        0, levels2, grid, s0, sigma, paths_per_symbol=BLOCK, num_bars=w2,
        dt=DT, lanes=LANES, interpret=True, external_uniforms=u,
    )
    assert got.n.shape == (2, 2)
    for s in range(2):
        levels_s = jax.tree_util.tree_map(lambda x: x[s], levels2)
        for g, cfg in enumerate(cfgs):
            want, wskips, wescal = mc_paths_pallas_engine(
                0, levels_s, cfg, num_paths=BLOCK, num_bars=w2,
                sigma=float(sigma[s]), dt=DT, lanes=LANES,
                interpret=True, external_uniforms=u[s],
            )
            for f in ("n", "n_entered", "n_tp", "n_stop", "sum_trades"):
                assert float(getattr(got, f)[s, g]) == float(
                    getattr(want, f)), (s, g, f)
            assert float(got_escal[s, g]) == float(wescal), (s, g)
            np.testing.assert_array_equal(np.asarray(got_skips[s, g]),
                                          np.asarray(wskips))
            np.testing.assert_array_equal(np.asarray(got.hist[s, g]),
                                          np.asarray(want.hist))
    # both axes vary
    assert float(got.n_entered[0, 0]) != float(got.n_entered[1, 0]) or \
        float(got.sum_r[0, 0]) != float(got.sum_r[1, 0])
    assert float(got.n_entered[0, 0]) != float(got.n_entered[0, 1]) or \
        float(got.sum_r[0, 0]) != float(got.sum_r[0, 1])
