"""Fused Pallas MC kernel: exact parity vs a numpy oracle with injected uniforms
(TPU-interpret mode on CPU)."""

import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from qmmx_monolithic_monte_carlo_tpu.config import EngineParams
from qmmx_monolithic_monte_carlo_tpu.ops.pallas_mc import LANES, mc_paths_pallas
from qmmx_monolithic_monte_carlo_tpu.types import Levels

LEVELS = Levels.from_rows(
    [
        {"color": "blue", "type": "solid", "index": 0, "price": 100.0},
        {"color": "orange", "type": "dashed", "index": 0, "price": 100.4},
    ],
    max_levels=8,
)
PARAMS = EngineParams.default()
W = 24
SIGMA = 0.3
DT = 1.0 / (390.0 * 252.0)


def _oracle(u, lvls, prox=0.05, sp=0.35, tp=0.25, s0=100.0, noise=None):
    """f32 numpy re-computation of the kernel semantics from the same uniforms.
    ``noise``: optional (lvl_jitter, entry_slip, stop_slip, tgt_slip) stds —
    the uniform tensor then carries four extra rows (two Box-Muller pairs →
    the per-path noise normals) after the tie row."""
    f = np.float32
    drift = f((0 - 0.5 * SIGMA**2) * DT)
    sig = f(SIGMA * np.sqrt(DT))
    nb = u.shape[0]
    tot = dict(entered=0, tp=0, stop=0, open=0, sum_r=0.0,
               min_r=np.inf, max_r=-np.inf)
    for blk in range(nb):
        ub = u[blk].astype(np.float32)
        # paired Box-Muller layout: u1/u2 are W//2 rows, each pair yields
        # (r·cos, r·sin) — cos normals drive bars [0, W/2), sin [W/2, W)
        h = W // 2
        u1, u2 = ub[:h], ub[h:W]
        u3, u4 = ub[W:2 * W], ub[2 * W:3 * W]
        tie = ub[3 * W]
        if noise is not None:
            r1 = np.sqrt(f(-2.0) * np.log(ub[3 * W + 1]))
            a1 = f(2 * np.pi) * ub[3 * W + 2]
            r2 = np.sqrt(f(-2.0) * np.log(ub[3 * W + 3]))
            a2 = f(2 * np.pi) * ub[3 * W + 4]
            njs = r1 * np.cos(a1) * f(noise[0])
            nes = r1 * np.sin(a1) * f(noise[1])
            nss = r2 * np.cos(a2) * f(noise[2])
            nts = r2 * np.sin(a2) * f(noise[3])
        radius = np.sqrt(f(-2.0) * np.log(u1))
        angle = f(2 * np.pi) * u2
        z = np.concatenate([radius * np.cos(angle), radius * np.sin(angle)],
                           axis=0)
        incr = drift + sig * z
        logc = f(np.log(s0)) + np.cumsum(incr, axis=0, dtype=np.float32)
        logo = logc - incr
        close, opens = np.exp(logc), np.exp(logo)
        d2 = (logc - logo) ** 2
        high = np.exp(f(0.5) * (logo + logc + np.sqrt(d2 - 2 * sig * sig * np.log(u3))))
        low = np.exp(f(0.5) * (logo + logc - np.sqrt(d2 - 2 * sig * sig * np.log(u4))))
        _replay_block_oracle(tot, close, opens, high, low, tie, lvls,
                             prox, sp, tp,
                             (njs, nes, nss, nts) if noise is not None else None)
    return tot


def _replay_block_oracle(tot, close, opens, high, low, tie, lvls, prox, sp,
                         tp, noise_draws, w=None):
    """First-contact + stop/target replay over one (W, LANES) bar block —
    shared by the GBM and bootstrap oracles."""
    w = w if w is not None else W
    if noise_draws is not None:
        njs, nes, nss, nts = noise_draws
    la = np.array(lvls, np.float32)
    if True:
        for lane in range(close.shape[1]):
            c = close[:, lane]
            d = np.abs(c[:, None] - la[None, :])
            best = d.min(axis=1)
            bi = d.argmin(axis=1)
            near = best <= prox
            if not near.any():
                continue
            eb = int(np.argmax(near))
            tot["entered"] += 1
            lvl = la[bi[eb]]
            entry = c[eb]
            long_ = entry > opens[eb, lane]
            if noise_draws is not None:
                lvl = lvl + njs[lane]
                entry = entry + nes[lane]
            stp = lvl - sp if long_ else lvl + sp
            tgt = lvl + tp if long_ else lvl - tp
            if noise_draws is not None:
                stp = stp + nss[lane]
                tgt = tgt + nts[lane]
            risk = max(abs(entry - stp), 1e-9)
            reward = abs(tgt - entry)
            got = "open"
            for j in range(eb + 1, w):
                hh, ll = high[j, lane], low[j, lane]
                sh = ll <= stp if long_ else hh >= stp
                th = hh >= tgt if long_ else ll <= tgt
                if sh and th:
                    up, dn = max(0.0, hh - entry), max(0.0, entry - ll)
                    got = "tp" if tie[lane] < up / (up + dn + 1e-9) else "stop"
                    break
                if th:
                    got = "tp"
                    break
                if sh:
                    got = "stop"
                    break
            tot[got] += 1
            r = reward / risk if got == "tp" else (-1.0 if got == "stop" else 0.0)
            tot["sum_r"] += r
            tot["min_r"] = min(tot["min_r"], r)
            tot["max_r"] = max(tot["max_r"], r)
    return tot


def test_kernel_matches_numpy_oracle_exact_uniforms():
    rng = np.random.default_rng(0)
    nb = 2
    u = rng.uniform(1e-9, 1.0, (nb, 3 * W + 1, LANES)).astype(np.float32)
    s = mc_paths_pallas(
        0, LEVELS, PARAMS, num_paths=nb * LANES, num_bars=W, sigma=SIGMA, dt=DT,
        lanes=LANES, interpret=pltpu.InterpretParams(), external_uniforms=u,
    )
    want = _oracle(u, [100.0, 100.4])
    assert float(s.n) == nb * LANES
    assert abs(float(s.n_entered) - want["entered"]) <= 1
    # f32 threshold crossings can flip O(1) outcomes out of 1024
    assert abs(float(s.n_tp) - want["tp"]) <= 2
    assert abs(float(s.n_stop) - want["stop"]) <= 2
    assert abs(float(s.n_open) - want["open"]) <= 2
    assert float(s.sum_r) == pytest.approx(want["sum_r"], abs=3.0)
    assert float(s.hist.sum()) == pytest.approx(float(s.n_entered))
    # min/max R tracked in the kernel accumulator (VERDICT r1 item 3): the R
    # value set is discrete ({-1, 0, tp/sp ratios}); the ratio itself differs
    # from numpy at ~5e-5 (MXU matmul-cumsum vs np.cumsum f32 association)
    assert float(s.min_r) == pytest.approx(want["min_r"], abs=1e-3)
    assert float(s.max_r) == pytest.approx(want["max_r"], abs=1e-3)


def test_kernel_stats_contract():
    rng = np.random.default_rng(1)
    u = rng.uniform(1e-9, 1.0, (1, 3 * W + 1, LANES)).astype(np.float32)
    s = mc_paths_pallas(
        7, LEVELS, PARAMS, num_paths=LANES, num_bars=W, sigma=SIGMA, dt=DT,
        lanes=LANES, interpret=pltpu.InterpretParams(), external_uniforms=u,
    )
    assert float(s.n_tp + s.n_stop + s.n_open) == pytest.approx(float(s.n_entered))
    assert 0.0 <= float(s.hit_rate) <= 1.0
    q = float(s.quantile(0.5))
    assert -1.5 <= q <= 2.5
    # no NaNs in the PathStats contract; extremes bound the R support
    assert np.isfinite(float(s.min_r)) and np.isfinite(float(s.max_r))
    assert float(s.min_r) <= float(s.max_r)
    assert -1.0 <= float(s.min_r) and float(s.max_r) <= 2.5


def test_kernel_noise_matches_numpy_oracle_exact_uniforms():
    """Execution noise in the fused kernel (McNoise knobs): the per-path
    gaussian jitters/slips match the numpy oracle from the same uniforms."""
    from qmmx_monolithic_monte_carlo_tpu.sim.montecarlo import McNoise

    rng = np.random.default_rng(5)
    u = rng.uniform(1e-9, 1.0, (2, 3 * W + 5, LANES)).astype(np.float32)
    stds = (0.02, 0.01, 0.015, 0.015)
    noise = McNoise.make(level_jitter_std=stds[0], entry_slip_std=stds[1],
                         stop_slip_std=stds[2], target_slip_std=stds[3])
    s = mc_paths_pallas(
        0, LEVELS, PARAMS, num_paths=2 * LANES, num_bars=W, sigma=SIGMA, dt=DT,
        lanes=LANES, noise=noise, interpret=pltpu.InterpretParams(),
        external_uniforms=u,
    )
    want = _oracle(u, [100.0, 100.4], noise=stds)
    assert float(s.n_entered) == want["entered"]
    assert abs(float(s.n_tp) - want["tp"]) <= 2
    assert abs(float(s.n_stop) - want["stop"]) <= 2
    assert abs(float(s.n_open) - want["open"]) <= 2
    assert float(s.sum_r) == pytest.approx(want["sum_r"], abs=3.0)
    # noise actually perturbs the outcome mix vs the noise-free oracle
    base = _oracle(u, [100.0, 100.4])
    assert want["sum_r"] != base["sum_r"]


def test_kernel_zero_noise_matches_noise_free_exact():
    """σ=0 noise mode consumes the extra draws but must reproduce the
    noise-free kernel bitwise (the price draws are the same blocks)."""
    from qmmx_monolithic_monte_carlo_tpu.sim.montecarlo import McNoise

    rng = np.random.default_rng(6)
    u = rng.uniform(1e-9, 1.0, (1, 3 * W + 5, LANES)).astype(np.float32)
    zero = McNoise.make(level_jitter_std=0.0, entry_slip_std=0.0,
                        stop_slip_std=0.0, target_slip_std=0.0)
    a = mc_paths_pallas(
        0, LEVELS, PARAMS, num_paths=LANES, num_bars=W, sigma=SIGMA, dt=DT,
        lanes=LANES, noise=zero, interpret=pltpu.InterpretParams(),
        external_uniforms=u,
    )
    b = mc_paths_pallas(
        0, LEVELS, PARAMS, num_paths=LANES, num_bars=W, sigma=SIGMA, dt=DT,
        lanes=LANES, interpret=pltpu.InterpretParams(),
        external_uniforms=u[:, :3 * W + 1],
    )
    for fld in ("n", "n_entered", "n_tp", "n_stop", "n_open", "sum_r",
                "min_r", "max_r"):
        assert float(getattr(a, fld)) == float(getattr(b, fld)), fld
    np.testing.assert_array_equal(np.asarray(a.hist), np.asarray(b.hist))


def test_kernel_rejects_bad_shapes():
    with pytest.raises(ValueError):
        mc_paths_pallas(0, LEVELS, PARAMS, num_paths=LANES + 1, num_bars=W)
    big = Levels.from_rows(
        [{"color": "blue", "type": "solid", "index": i, "price": 100.0 + i}
         for i in range(9)],
        max_levels=16,
    )
    with pytest.raises(ValueError):
        mc_paths_pallas(0, big, PARAMS, num_paths=LANES, num_bars=W)


def test_universe_kernel_contract_interpret():
    """Shape/stat contract of the per-symbol kernel (TPU-interpret on CPU;
    interpret-mode PRNG yields degenerate paths, so only structure is checked —
    real-value agreement vs the XLA universe pipeline is validated on TPU:
    hit rates 0.60 vs 0.60 at 1M paths/symbol, see benchmarks/RESULTS.md)."""
    from qmmx_monolithic_monte_carlo_tpu.ops.pallas_mc import (
        mc_paths_pallas_universe,
    )
    from qmmx_monolithic_monte_carlo_tpu.parallel import universe as U

    rows = [[{"color": "blue", "type": "solid", "index": 0, "price": 100.0 + i}]
            for i in range(3)]
    levels = U.stack_levels(rows, max_levels=8)
    s0 = np.array([100.0, 101.0, 102.0], np.float32)
    sigma = np.full(3, 0.25, np.float32)
    st = mc_paths_pallas_universe(
        0, levels, PARAMS, s0, sigma, paths_per_symbol=LANES, num_bars=16,
        interpret=pltpu.InterpretParams(),
    )
    assert st.n.shape == (3,)
    np.testing.assert_array_equal(np.asarray(st.n), LANES)
    assert st.hist.shape == (3, 128)
    # accounting holds per symbol
    np.testing.assert_allclose(
        np.asarray(st.n_tp + st.n_stop + st.n_open), np.asarray(st.n_entered)
    )
    # extremes are never NaN (±inf allowed when a symbol saw no entries)
    assert not np.isnan(np.asarray(st.min_r)).any()
    assert not np.isnan(np.asarray(st.max_r)).any()


def test_universe_kernel_per_symbol_knobs_exact():
    """Per-symbol engine knobs (prox, stop_pad, tp_pad) ride the symbol slab:
    each symbol of a 3-symbol universe with DISTINCT knobs matches a
    single-config kernel run of that symbol under the same injected
    uniforms."""
    import jax

    from qmmx_monolithic_monte_carlo_tpu.ops.pallas_mc import (
        mc_paths_pallas_universe,
    )
    from qmmx_monolithic_monte_carlo_tpu.parallel import universe as U

    rows = [
        [{"color": "blue", "type": "solid", "index": 0, "price": 100.0}],
        [{"color": "red", "type": "dashed", "index": 0, "price": 100.3}],
        [{"color": "green", "type": "solid", "index": 0, "price": 99.7}],
    ]
    levels3 = U.stack_levels(rows, max_levels=8)
    s0 = np.full(3, 100.0, np.float32)
    sigma = np.full(3, SIGMA, np.float32)
    prox = np.array([0.05, 0.08, 0.03], np.float32)
    sp = np.array([0.35, 0.20, 0.50], np.float32)
    tp = np.array([0.25, 0.40, 0.10], np.float32)
    params_vec = PARAMS.replace(
        contact_prox=prox, stop_padding=sp, tp_padding=tp)
    rng = np.random.default_rng(5)
    u = rng.uniform(1e-9, 1.0, (3, 1, 3 * W + 1, LANES)).astype(np.float32)

    got = mc_paths_pallas_universe(
        0, levels3, params_vec, s0, sigma, paths_per_symbol=LANES, num_bars=W,
        dt=DT, interpret=True, external_uniforms=u,
    )
    assert got.n.shape == (3,)
    for s in range(3):
        params_s = EngineParams.default(
            contact_prox=float(prox[s]), stop_padding=float(sp[s]),
            tp_padding=float(tp[s]))
        levels_s = jax.tree_util.tree_map(lambda x: x[s], levels3)
        want = mc_paths_pallas(
            0, levels_s, params_s, num_paths=LANES, num_bars=W, sigma=SIGMA,
            dt=DT, lanes=LANES, interpret=True, external_uniforms=u[s],
        )
        for f in ("n", "n_entered", "n_tp", "n_stop", "n_open"):
            assert float(getattr(got, f)[s]) == float(getattr(want, f)), (s, f)
        # log_s0/sig_dt/drift are host-derived in f64 for BOTH kernels since
        # the round-4 universe-divergence fix (_derived_consts) — the bars
        # are bit-identical and every DECISION matches (counts + histogram
        # bitwise above/below).  sum_r is an f32 reduction over a DIFFERENT
        # accumulator geometry ((symbol, block) grid vs (block,)), and the
        # round-5 environment's XLA CPU reduces the two shapes in different
        # association orders (~30 ulps at this total) — so the sum compares
        # to a reassociation bound, not bitwise.  On-chip, Mosaic's explicit
        # accumulator rows keep the order fixed and the hardware pin
        # (benchmarks/onchip_exactness.py) stays exact.
        assert float(got.sum_r[s]) == pytest.approx(
            float(want.sum_r), rel=1e-5)
        np.testing.assert_array_equal(
            np.asarray(got.hist[s]), np.asarray(want.hist))
    # knobs actually differ → per-symbol outcomes differ
    assert len({float(x) for x in np.asarray(got.n_entered)}) > 1


def test_universe_kernel_rejects_bad_shapes():
    from qmmx_monolithic_monte_carlo_tpu.ops.pallas_mc import (
        mc_paths_pallas_universe,
    )
    from qmmx_monolithic_monte_carlo_tpu.parallel import universe as U

    rows = [[{"color": "blue", "type": "solid", "index": 0, "price": 100.0}]]
    levels = U.stack_levels(rows, max_levels=8)
    with pytest.raises(ValueError):
        mc_paths_pallas_universe(
            0, levels, PARAMS, np.array([100.0]), np.array([0.2]),
            paths_per_symbol=LANES + 1, num_bars=16,
        )


def test_sweep_kernel_contract_and_crn():
    """Sweep kernel with injected... no external-RNG path: interpret-mode
    contract only (real-value cross-check vs the single kernel runs on TPU:
    hit 0.5936 vs 0.5938 at (0.35, 0.25), see benchmarks/RESULTS.md)."""
    from qmmx_monolithic_monte_carlo_tpu.ops.pallas_mc import mc_paths_pallas_sweep

    st = mc_paths_pallas_sweep(
        0, LEVELS, PARAMS, [0.25, 0.35], [0.15, 0.25],
        num_paths=LANES, num_bars=16, sigma=SIGMA, dt=DT,
        interpret=pltpu.InterpretParams(),
    )
    assert st.n.shape == (2,)
    np.testing.assert_array_equal(np.asarray(st.n), LANES)
    np.testing.assert_allclose(
        np.asarray(st.n_tp + st.n_stop + st.n_open), np.asarray(st.n_entered)
    )
    # CRN: every config saw the same paths → identical entered counts
    entered = np.asarray(st.n_entered)
    assert entered[0] == entered[1]
    assert not np.isnan(np.asarray(st.min_r)).any()
    assert not np.isnan(np.asarray(st.max_r)).any()


def test_sweep_kernel_rejects_mismatched_grid():
    from qmmx_monolithic_monte_carlo_tpu.ops.pallas_mc import mc_paths_pallas_sweep

    with pytest.raises(ValueError):
        mc_paths_pallas_sweep(0, LEVELS, PARAMS, [0.25, 0.35], [0.15],
                              num_paths=LANES, num_bars=16)


def test_kernel_bootstrap_matches_numpy_oracle_exact_uniforms():
    """Recorded-bar resampling in the first-contact kernel (VERDICT r3
    missing #3): idx = floor(u·H) per (path, bar), per-lane table gathers,
    MXU log-return cumsum — vs a numpy oracle building the same bars from
    the same uniforms and replaying through the shared first-contact logic."""
    from qmmx_monolithic_monte_carlo_tpu.ops.pathgen import (
        PathBars,
        bootstrap_tables,
    )

    f = np.float32
    h = 300
    rng = np.random.default_rng(9)
    steps = rng.normal(0, 0.12, h).astype(f)
    hc = f(100.0) + np.cumsum(steps, dtype=f)
    ho = np.concatenate([[f(100.0)], hc[:-1]])
    hist = PathBars(
        open=ho, close=hc,
        high=np.maximum(ho, hc) + rng.uniform(0, 0.15, h).astype(f),
        low=np.minimum(ho, hc) - rng.uniform(0, 0.15, h).astype(f),
        volume=np.ones(h, f))

    nb = 2
    u = rng.uniform(1e-9, 1.0, (nb, W + 1, LANES)).astype(f)
    s = mc_paths_pallas(
        0, LEVELS, PARAMS, num_paths=nb * LANES, num_bars=W, dt=DT,
        lanes=LANES, sampler="bootstrap", hist_bars=hist,
        interpret=pltpu.InterpretParams(), external_uniforms=u,
    )

    logc, logh, logl, logo, _v = (np.asarray(t, f) for t in bootstrap_tables(
        hist.open, hist.high, hist.low, hist.close))
    tot = dict(entered=0, tp=0, stop=0, open=0, sum_r=0.0,
               min_r=np.inf, max_r=-np.inf)
    for blk in range(nb):
        ub = u[blk].astype(f)
        idx = np.minimum(np.floor(ub[:W] * f(h)), f(h - 1)).astype(np.int32)
        tie = ub[W]
        lc = logc[idx]
        log_close = f(np.log(100.0)) + np.cumsum(lc, axis=0, dtype=f)
        log_prev = log_close - lc
        close = np.exp(log_close)
        opens = np.exp(log_prev + logo[idx])
        high = np.exp(log_prev + logh[idx])
        low = np.exp(log_prev + logl[idx])
        _replay_block_oracle(tot, close, opens, high, low, tie,
                             [100.0, 100.4], 0.05, 0.35, 0.25, None)

    assert float(s.n) == nb * LANES
    assert abs(float(s.n_entered) - tot["entered"]) <= 2
    assert abs(float(s.n_tp) - tot["tp"]) <= 3
    assert abs(float(s.n_stop) - tot["stop"]) <= 3
    assert float(s.sum_r) == pytest.approx(tot["sum_r"], abs=3.0)
    assert tot["entered"] > 0


@pytest.mark.slow
def test_kernel_bootstrap_multi_tile_and_validation():
    from qmmx_monolithic_monte_carlo_tpu.ops.pathgen import PathBars

    with pytest.raises(ValueError, match="hist_bars"):
        mc_paths_pallas(0, LEVELS, PARAMS, num_paths=LANES, num_bars=W,
                        lanes=LANES, sampler="bootstrap")
    # history spanning multiple lane tiles still runs (interpret, tiny)
    f = np.float32
    h = LANES + 77
    rng = np.random.default_rng(2)
    steps = rng.normal(0, 0.1, h).astype(f)
    hc = f(100.0) + np.cumsum(steps, dtype=f)
    ho = np.concatenate([[f(100.0)], hc[:-1]])
    hist = PathBars(open=ho, close=hc,
                    high=np.maximum(ho, hc) + f(0.05),
                    low=np.minimum(ho, hc) - f(0.05),
                    volume=np.ones(h, f))
    u = rng.uniform(1e-9, 1.0, (1, W + 1, LANES)).astype(f)
    s = mc_paths_pallas(
        0, LEVELS, PARAMS, num_paths=LANES, num_bars=W, dt=DT, lanes=LANES,
        sampler="bootstrap", hist_bars=hist,
        interpret=pltpu.InterpretParams(), external_uniforms=u,
    )
    assert float(s.n) == LANES


def _boot_history(seed, h):
    """Recorded OHLC history with wick structure (first-contact bootstrap)."""
    from qmmx_monolithic_monte_carlo_tpu.ops.pathgen import PathBars

    f = np.float32
    rng = np.random.default_rng(seed)
    steps = rng.normal(0, 0.1, h).astype(f)
    c = f(100.0) + np.cumsum(steps, dtype=f)
    o = np.concatenate([[f(100.0)], c[:-1]])
    return PathBars(open=o, close=c,
                    high=np.maximum(o, c) + rng.uniform(0, 0.1, h).astype(f),
                    low=np.minimum(o, c) - rng.uniform(0, 0.1, h).astype(f),
                    volume=np.ones(h, f))


@pytest.mark.slow
def test_universe_kernel_bootstrap_per_symbol_histories_exact():
    """First-contact universe over per-symbol recorded bars: each symbol
    resamples its OWN [S, H] history row (the reference MC is a per-symbol
    recorded-bar replay, :3353-3538) and equals a single-config bootstrap
    kernel run of that symbol under the same injected uniforms."""
    import jax

    from qmmx_monolithic_monte_carlo_tpu.ops.pallas_mc import (
        mc_paths_pallas_universe,
    )
    from qmmx_monolithic_monte_carlo_tpu.ops.pathgen import PathBars
    from qmmx_monolithic_monte_carlo_tpu.parallel import universe as U

    w = 16
    rows = [[{"color": "blue", "type": "solid", "index": 0, "price": 100.2}],
            [{"color": "teal", "type": "dashed", "index": 0, "price": 99.8}]]
    levels2 = U.stack_levels(rows, max_levels=4)
    s0 = np.array([100.0, 100.0], np.float32)
    sigma = np.array([0.3, 0.5], np.float32)    # unused by bootstrap bars
    hists = [_boot_history(11, 200), _boot_history(23, 200)]
    hist2 = PathBars(*[np.stack([np.asarray(getattr(h, f)) for h in hists])
                       for f in PathBars._fields])
    rng = np.random.default_rng(31)
    u = rng.uniform(1e-6, 1.0, (2, 1, w + 1, LANES)).astype(np.float32)

    got = mc_paths_pallas_universe(
        0, levels2, PARAMS, s0, sigma, paths_per_symbol=LANES, num_bars=w,
        sampler="bootstrap", hist_bars=hist2, interpret=True,
        external_uniforms=u,
    )
    assert got.n.shape == (2,)
    for s in range(2):
        levels_s = jax.tree_util.tree_map(lambda x: x[s], levels2)
        want = mc_paths_pallas(
            0, levels_s, PARAMS, num_paths=LANES, num_bars=w, lanes=LANES,
            s0=float(s0[s]), sigma=float(sigma[s]), sampler="bootstrap",
            hist_bars=hists[s], interpret=True, external_uniforms=u[s],
        )
        for f in ("n", "n_entered", "n_tp", "n_stop", "n_open", "sum_r"):
            assert float(getattr(got, f)[s]) == float(getattr(want, f)), (s, f)
        np.testing.assert_array_equal(np.asarray(got.hist[s]),
                                      np.asarray(want.hist))
    assert float(got.n_entered[0]) > 0


def test_sweep_kernel_bootstrap_contract_interpret():
    """Bootstrap sweep kernel contract (per-op interpret; PRNG-only kernel):
    every grid row replays the SAME resampled history walk (CRN → identical
    entered counts), accounting holds, and the rows exactly match
    single-config kernel runs with the same seed (identical draw order)."""
    from qmmx_monolithic_monte_carlo_tpu.ops.pallas_mc import (
        mc_paths_pallas_sweep,
    )

    hist = _boot_history(5, 150)
    st = mc_paths_pallas_sweep(
        0, LEVELS, PARAMS, [0.25, 0.35], [0.15, 0.25],
        num_paths=LANES, num_bars=16, sigma=SIGMA, dt=DT,
        sampler="bootstrap", hist_bars=hist,
        interpret=pltpu.InterpretParams(),
    )
    assert st.n.shape == (2,)
    np.testing.assert_array_equal(np.asarray(st.n), LANES)
    np.testing.assert_allclose(
        np.asarray(st.n_tp + st.n_stop + st.n_open), np.asarray(st.n_entered))
    entered = np.asarray(st.n_entered)
    assert entered[0] == entered[1]
    for g, (sp, tp) in enumerate([(0.25, 0.15), (0.35, 0.25)]):
        want = mc_paths_pallas(
            0, LEVELS, PARAMS.replace(stop_padding=sp, tp_padding=tp),
            num_paths=LANES, num_bars=16, lanes=LANES, sigma=SIGMA, dt=DT,
            sampler="bootstrap", hist_bars=hist,
            interpret=pltpu.InterpretParams(),
        )
        for f in ("n", "n_entered", "n_tp", "n_stop", "sum_r"):
            assert float(getattr(st, f)[g]) == float(getattr(want, f)), (g, f)


def test_kernel_block_bootstrap_matches_numpy_oracle_exact_uniforms():
    """Contiguous-block resampling in the first-contact kernel
    (ops/pathgen.block_bootstrap_paths semantics): bar j's index =
    start-of-its-block + offset, one start uniform per block (non-start
    rows ignored) — vs a numpy oracle building the same bars."""
    from qmmx_monolithic_monte_carlo_tpu.ops.pathgen import bootstrap_tables

    f = np.float32
    h, bl = 300, 6
    hist = _boot_history(9, h)
    rng = np.random.default_rng(15)
    nb = 2
    u = rng.uniform(1e-9, 1.0, (nb, W + 1, LANES)).astype(f)
    s = mc_paths_pallas(
        0, LEVELS, PARAMS, num_paths=nb * LANES, num_bars=W, dt=DT,
        lanes=LANES, sampler="block_bootstrap", hist_bars=hist, block_len=bl,
        interpret=pltpu.InterpretParams(), external_uniforms=u,
    )

    logc, logh, logl, logo, _v = (np.asarray(t, f) for t in bootstrap_tables(
        hist.open, hist.high, hist.low, hist.close))
    tot = dict(entered=0, tp=0, stop=0, open=0, sum_r=0.0,
               min_r=np.inf, max_r=-np.inf)
    for blk in range(nb):
        ub = u[blk].astype(f)
        starts = np.minimum(np.floor(ub[:W] * f(h - bl)), f(h - bl - 1))
        idx = np.stack([starts[(j // bl) * bl] + f(j - (j // bl) * bl)
                        for j in range(W)]).astype(np.int32)
        tie = ub[W]
        lc = logc[idx]
        log_close = f(np.log(100.0)) + np.cumsum(lc, axis=0, dtype=f)
        log_prev = log_close - lc
        close = np.exp(log_close)
        opens = np.exp(log_prev + logo[idx])
        high = np.exp(log_prev + logh[idx])
        low = np.exp(log_prev + logl[idx])
        _replay_block_oracle(tot, close, opens, high, low, tie,
                             [100.0, 100.4], 0.05, 0.35, 0.25, None)

    assert float(s.n) == nb * LANES
    assert abs(float(s.n_entered) - tot["entered"]) <= 2
    assert abs(float(s.n_tp) - tot["tp"]) <= 3
    assert abs(float(s.n_stop) - tot["stop"]) <= 3
    assert float(s.sum_r) == pytest.approx(tot["sum_r"], abs=3.0)


HPARAMS = dict(v0=0.09, kappa=2.0, theta=0.05, xi=0.9, rho=-0.6)


def _heston_oracle_bars(ub, hes, s0=100.0, w=None, lanes=None):
    """Numpy f32 mirror of ops/pallas_mc._heston_block from one uniform
    block (layout: u1, u2, u3, u4 [3w rows], tie, uq1, uq2)."""
    f = np.float32
    w = w if w is not None else W
    lanes = lanes if lanes is not None else LANES
    v0, kap, th, xi, rho, mu_, dtf = (f(x) for x in hes)
    rho_perp = f(np.sqrt(max(0.0, 1.0 - float(rho) ** 2)))
    h = w // 2
    u1, u2 = ub[:h], ub[h:w]
    u3, u4 = ub[w:2 * w], ub[2 * w:3 * w]
    tie = ub[3 * w]
    uq1 = ub[3 * w + 1:3 * w + 1 + h]
    uq2 = ub[3 * w + 1 + h:3 * w + 1 + w]
    radius = np.sqrt(f(-2.0) * np.log(u1))
    angle = f(2 * np.pi) * u2
    z = np.concatenate([radius * np.cos(angle), radius * np.sin(angle)],
                       axis=0)
    qr = np.sqrt(f(-2.0) * np.log(uq1))
    qa = f(2 * np.pi) * uq2
    zq = np.concatenate([qr * np.cos(qa), qr * np.sin(qa)], axis=0)
    z2 = rho * z + rho_perp * zq
    v = np.full((1, lanes), v0, f)
    incr_rows, sig2_rows = [], []
    for t in range(w):
        v_pos = np.maximum(v, f(0.0))
        sig_bar = np.sqrt(v_pos * dtf)
        incr_rows.append((mu_ - f(0.5) * v_pos) * dtf + sig_bar * z[t:t + 1])
        sig2_rows.append(v_pos * dtf)
        v = v + kap * (th - v_pos) * dtf + xi * sig_bar * z2[t:t + 1]
    incr = np.concatenate(incr_rows, axis=0)
    sig2dt = np.concatenate(sig2_rows, axis=0)
    logc = f(np.log(s0)) + np.cumsum(incr, axis=0, dtype=f)
    logo = logc - incr
    close, opens = np.exp(logc), np.exp(logo)
    d2 = (logc - logo) ** 2
    high = np.exp(f(0.5) * (logo + logc + np.sqrt(d2 - 2 * sig2dt * np.log(u3))))
    low = np.exp(f(0.5) * (logo + logc - np.sqrt(d2 - 2 * sig2dt * np.log(u4))))
    return close, opens, high, low, tie


def test_kernel_heston_matches_numpy_oracle_exact_uniforms():
    """Heston stochastic vol in the block-form first-contact kernel
    (`_heston_block`): serial variance chain + MXU cumsum + LOCAL-vol bridge
    extremes, vs a numpy f32 mirror from the same uniforms
    (ops/pathgen.heston_paths semantics, full-truncation Euler)."""
    from qmmx_monolithic_monte_carlo_tpu.ops.pallas_mc import _heston_tuple

    rng = np.random.default_rng(23)
    nb = 2
    u = rng.uniform(1e-9, 1.0, (nb, 4 * W + 1, LANES)).astype(np.float32)
    s = mc_paths_pallas(
        0, LEVELS, PARAMS, num_paths=nb * LANES, num_bars=W, dt=DT,
        lanes=LANES, sampler="heston", heston=HPARAMS,
        interpret=pltpu.InterpretParams(), external_uniforms=u,
    )
    hes = _heston_tuple(HPARAMS, 0.0, DT)
    tot = dict(entered=0, tp=0, stop=0, open=0, sum_r=0.0,
               min_r=np.inf, max_r=-np.inf)
    for blk in range(nb):
        close, opens, high, low, tie = _heston_oracle_bars(
            u[blk].astype(np.float32), hes)
        _replay_block_oracle(tot, close, opens, high, low, tie,
                             [100.0, 100.4], 0.05, 0.35, 0.25, None)
    assert float(s.n) == nb * LANES
    assert abs(float(s.n_entered) - tot["entered"]) <= 2
    assert abs(float(s.n_tp) - tot["tp"]) <= 3
    assert abs(float(s.n_stop) - tot["stop"]) <= 3
    assert abs(float(s.n_open) - tot["open"]) <= 3
    assert float(s.sum_r) == pytest.approx(tot["sum_r"], abs=3.0)
    # stochastic vol actually moved the outcome mix vs plain GBM on the
    # same price uniforms
    g = mc_paths_pallas(
        0, LEVELS, PARAMS, num_paths=nb * LANES, num_bars=W, sigma=SIGMA,
        dt=DT, lanes=LANES, interpret=pltpu.InterpretParams(),
        external_uniforms=u[:, :3 * W + 1],
    )
    assert float(g.sum_r) != float(s.sum_r)


def test_heston_universe_matches_single_exact():
    """Heston in the first-contact UNIVERSE kernel: each symbol of a
    2-symbol universe matches a single-config kernel run of that symbol
    bitwise under the same injected uniforms (shared heston params,
    per-symbol s0 via the host-derived log_s0 slab column)."""
    import jax

    from qmmx_monolithic_monte_carlo_tpu.ops.pallas_mc import (
        mc_paths_pallas_universe,
    )
    from qmmx_monolithic_monte_carlo_tpu.parallel import universe as U

    rows = [
        [{"color": "blue", "type": "solid", "index": 0, "price": 100.0},
         {"color": "teal", "type": "dashed", "index": 0, "price": 100.4}],
        [{"color": "orange", "type": "solid", "index": 0, "price": 50.1}],
    ]
    lv2 = U.stack_levels(rows, max_levels=4)
    s0 = np.array([100.0, 50.0], np.float32)
    sigma = np.full(2, SIGMA, np.float32)
    rng = np.random.default_rng(31)
    u = rng.uniform(1e-9, 1.0, (2, 1, 4 * W + 1, LANES)).astype(np.float32)
    got = mc_paths_pallas_universe(
        0, lv2, PARAMS, s0, sigma, paths_per_symbol=LANES, num_bars=W,
        dt=DT, sampler="heston", heston=HPARAMS, interpret=True,
        external_uniforms=u,
    )
    for s in range(2):
        lv_s = jax.tree_util.tree_map(lambda x: x[s], lv2)
        want = mc_paths_pallas(
            0, lv_s, PARAMS, num_paths=LANES, num_bars=W, s0=float(s0[s]),
            dt=DT, lanes=LANES, sampler="heston", heston=HPARAMS,
            interpret=True, external_uniforms=u[s],
        )
        for fld in ("n", "n_entered", "n_tp", "n_stop", "n_open", "sum_r",
                    "min_r", "max_r"):
            assert float(getattr(got, fld)[s]) == float(getattr(want, fld)), (
                s, fld)
        np.testing.assert_array_equal(
            np.asarray(got.hist[s]), np.asarray(want.hist))


def test_kernel_heston_rejects_antithetic_and_odd_bars():
    with pytest.raises(ValueError):
        mc_paths_pallas(0, LEVELS, PARAMS, num_paths=LANES, num_bars=W,
                        sampler="heston", heston=HPARAMS, antithetic=True,
                        lanes=LANES)
    with pytest.raises(ValueError):
        mc_paths_pallas(0, LEVELS, PARAMS, num_paths=LANES, num_bars=W + 1,
                        sampler="heston", heston=HPARAMS, lanes=LANES)
