"""Recorded-bar (bootstrap) streaming through the fused GATED kernels.

VERDICT r3 missing #3, extended to the gated family: the reference's MC
walks RECORDED bars (qmmx_monolithic.py:3353-3538); the scaled analog is
bootstrap resampling of real history (ops/pathgen.bootstrap_paths).  The
gated lifecycle loop now draws per-bar resample indices on-chip and
gathers the relative-geometry channels by per-lane ``take_along_axis``
over lane-tiled VMEM tables (one logo gather on the statically peeled
first bar seeds prev-close = open[0], matching gated_path_replay).  Under
injected uniforms every kernel must match the XLA gated pipeline on bars
reconstructed from the same draws."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qmmx_monolithic_monte_carlo_tpu.config import EngineParams
from qmmx_monolithic_monte_carlo_tpu.ops import pathgen as PG
from qmmx_monolithic_monte_carlo_tpu.ops.pallas_mc import (
    GATED_SUB,
    _gated_stride,
    mc_paths_pallas_gated,
    mc_paths_pallas_gated_sweep,
    mc_paths_pallas_gated_universe,
)
from qmmx_monolithic_monte_carlo_tpu.sim import gatedpath as GP
from qmmx_monolithic_monte_carlo_tpu.sim.pathsim import PathStats
from qmmx_monolithic_monte_carlo_tpu.types import Levels

from .test_engine_bootstrap import _history, _stacked_histories

LANES = 128           # small tiles keep interpret-mode parity runs fast
BLOCK = GATED_SUB * LANES
BOOT = _gated_stride("bootstrap", False)

LEVELS = Levels.from_rows(
    [
        {"color": "blue", "type": "solid", "index": 0, "price": 100.0},
        {"color": "teal", "type": "dashed", "index": 0, "price": 100.35},
        {"color": "orange", "type": "solid", "index": 0, "price": 99.65},
    ],
    max_levels=4,
)


def _bars_from_boot_uniforms(u, hist, w, lanes=LANES, s0=100.0):
    """Mirror the gated kernel's bootstrap stream (u [rows, 8, lanes]):
    idx = floor(u·H) clamped, channel gathers, sequential log chaining."""
    logc, logh, logl, logo, _vol = PG.bootstrap_tables(
        hist.open, hist.high, hist.low, hist.close, hist.volume)
    hf = jnp.float32(logc.shape[0])
    log_s = jnp.full((GATED_SUB, lanes), jnp.float32(np.log(s0)))
    opens, closes, highs, lows, ties = [], [], [], [], []
    for t in range(w):
        t2, half = divmod(t, 2)
        uu = jnp.asarray(u[BOOT * t2 + half], jnp.float32)
        tie = jnp.asarray(u[BOOT * t2 + 2 + half], jnp.float32)
        idx = jnp.minimum(jnp.floor(uu * hf), hf - 1.0).astype(jnp.int32)
        opens.append(jnp.exp(log_s + logo[idx]))
        closes.append(jnp.exp(log_s + logc[idx]))
        highs.append(jnp.exp(log_s + logh[idx]))
        lows.append(jnp.exp(log_s + logl[idx]))
        ties.append(tie)
        log_s = log_s + logc[idx]

    def flat(rows):
        return jnp.stack(rows, axis=-1).reshape(GATED_SUB * lanes, w)

    return PG.PathBars(open=flat(opens), high=flat(highs), low=flat(lows),
                       close=flat(closes), volume=None), flat(ties)


def _xla_stats(bars, tieu, levels, params, gate=None):
    if gate is None:
        gate = GP.GateConfig.from_params(params)
    out = GP.gated_path_replay(bars, levels, params, gate, tieu)
    return PathStats.from_lifecycle(
        equity=out.equity, trades=out.trades, wins=out.wins,
        losses=out.losses, open_at_end=out.open_at_end, max_dd=out.max_dd)


@pytest.mark.slow
def test_gated_kernel_bootstrap_matches_xla_exact():
    """Kernel bootstrap streaming == XLA gated lifecycle on bars
    reconstructed from the same injected uniforms (incl. the bar-0
    prev-close = open[0] seeding over a real open gap)."""
    w = 24
    hist = _history(3, 300)
    params = EngineParams.default(stop_padding=0.25, tp_padding=0.18)
    rng = np.random.default_rng(13)
    u = rng.uniform(
        1e-6, 1.0, (1, BOOT * (w // 2), GATED_SUB, LANES)).astype(np.float32)

    got = mc_paths_pallas_gated(
        0, LEVELS, params, num_paths=BLOCK, num_bars=w, lanes=LANES,
        sampler="bootstrap", hist_bars=hist, interpret=True,
        external_uniforms=u)
    bars, tieu = _bars_from_boot_uniforms(u[0], hist, w)
    want = _xla_stats(bars, tieu, LEVELS, params)
    for f in ("n", "n_entered", "n_tp", "n_stop", "n_open", "sum_trades"):
        assert float(getattr(got, f)) == float(getattr(want, f)), f
    np.testing.assert_array_equal(np.asarray(got.hist), np.asarray(want.hist))
    assert float(got.n_entered) > 0


@pytest.mark.slow
def test_gated_sweep_kernel_bootstrap_matches_single_configs_exact():
    """Every grid row of the bootstrap gated sweep equals an independent
    single-config bootstrap kernel run under the same injected uniforms
    (identical resample indices per row — CRN on recorded history)."""
    w = 16
    hist = _history(7, 220)
    params = EngineParams.default()
    stops = np.array([0.15, 0.35], np.float32)
    tps = np.array([0.10, 0.28], np.float32)
    rng = np.random.default_rng(29)
    # the gated sweep kernel runs fixed 1024-lane blocks
    u = rng.uniform(
        1e-6, 1.0, (1, BOOT * (w // 2), GATED_SUB, 1024)).astype(np.float32)

    got = mc_paths_pallas_gated_sweep(
        0, LEVELS, params, stops, tps, num_paths=GATED_SUB * 1024,
        num_bars=w, sampler="bootstrap", hist_bars=hist, interpret=True,
        external_uniforms=u)
    assert got.n.shape == (2,)
    for g in range(2):
        cfg = params.replace(stop_padding=float(stops[g]),
                             tp_padding=float(tps[g]))
        want = mc_paths_pallas_gated(
            0, LEVELS, cfg, num_paths=GATED_SUB * 1024, num_bars=w,
            lanes=1024, sampler="bootstrap", hist_bars=hist, interpret=True,
            external_uniforms=u)
        for f in ("n", "n_entered", "n_tp", "n_stop", "n_open", "sum_trades"):
            assert float(getattr(got, f)[g]) == float(getattr(want, f)), (g, f)
        np.testing.assert_array_equal(np.asarray(got.hist[g]),
                                      np.asarray(want.hist))
    assert float(got.n_tp[0]) != float(got.n_tp[1])


@pytest.mark.slow
def test_gated_universe_kernel_bootstrap_per_symbol_histories_exact():
    """Each symbol of a 2-symbol gated universe resamples its OWN recorded
    history and equals a single-config bootstrap run of that symbol."""
    w = 12
    rows = [
        [{"color": "blue", "type": "solid", "index": 0, "price": 100.0},
         {"color": "teal", "type": "dashed", "index": 0, "price": 100.4}],
        [{"color": "orange", "type": "solid", "index": 0, "price": 50.1}],
    ]
    from qmmx_monolithic_monte_carlo_tpu.parallel import universe as U

    levels2 = U.stack_levels(rows, max_levels=4)
    s0 = np.array([100.0, 50.0], np.float32)
    sigma = np.array([0.35, 0.5], np.float32)   # unused by bootstrap bars
    hist2 = _stacked_histories([11, 23], 180)
    params = EngineParams.default().replace(
        stop_padding=jnp.asarray([0.20, 0.30], np.float32))
    rng = np.random.default_rng(31)
    u = rng.uniform(
        1e-6, 1.0,
        (2, 1, BOOT * (w // 2), GATED_SUB, 1024)).astype(np.float32)

    got = mc_paths_pallas_gated_universe(
        0, levels2, params, s0, sigma, paths_per_symbol=GATED_SUB * 1024,
        num_bars=w, sampler="bootstrap", hist_bars=hist2, interpret=True,
        external_uniforms=u)
    assert got.n.shape == (2,)
    for s in range(2):
        levels_s = jax.tree_util.tree_map(lambda x: x[s], levels2)
        hist_s = jax.tree_util.tree_map(lambda x: x[s], hist2)
        cfg = EngineParams.default(stop_padding=[0.20, 0.30][s])
        want = mc_paths_pallas_gated(
            0, levels_s, cfg, num_paths=GATED_SUB * 1024, num_bars=w,
            s0=float(s0[s]), sigma=float(sigma[s]), lanes=1024,
            sampler="bootstrap", hist_bars=hist_s, interpret=True,
            external_uniforms=u[s])
        for f in ("n", "n_entered", "n_tp", "n_stop", "n_open", "sum_trades"):
            assert float(getattr(got, f)[s]) == float(getattr(want, f)), (s, f)
        np.testing.assert_array_equal(np.asarray(got.hist[s]),
                                      np.asarray(want.hist))


def test_gated_bootstrap_validation():
    params = EngineParams.default()
    with pytest.raises(ValueError, match="hist_bars"):
        mc_paths_pallas_gated(
            0, LEVELS, params, num_paths=BLOCK, num_bars=8, lanes=LANES,
            sampler="bootstrap")
    with pytest.raises(ValueError, match="samplers"):
        mc_paths_pallas_gated(
            0, LEVELS, params, num_paths=BLOCK, num_bars=8, lanes=LANES,
            sampler="garch")


def _bars_from_blockboot_uniforms(u, hist, w, block_len, lanes=LANES,
                                  s0=100.0):
    """Mirror the gated kernel's BLOCK-bootstrap stream: one start uniform
    per contiguous block_len-bar run, idx = start + offset."""
    logc, logh, logl, logo, _vol = PG.bootstrap_tables(
        hist.open, hist.high, hist.low, hist.close, hist.volume)
    hf = jnp.float32(logc.shape[0])
    bl = jnp.float32(block_len)
    log_s = jnp.full((GATED_SUB, lanes), jnp.float32(np.log(s0)))
    cur = jnp.zeros((GATED_SUB, lanes), jnp.float32)
    opens, closes, highs, lows, ties = [], [], [], [], []
    for t in range(w):
        t2, half = divmod(t, 2)
        uu = jnp.asarray(u[BOOT * t2 + half], jnp.float32)
        tie = jnp.asarray(u[BOOT * t2 + 2 + half], jnp.float32)
        off = t % block_len
        if off == 0:
            cur = jnp.minimum(jnp.floor(uu * (hf - bl)), hf - bl - 1.0)
        idx = (cur + jnp.float32(off)).astype(jnp.int32)
        opens.append(jnp.exp(log_s + logo[idx]))
        closes.append(jnp.exp(log_s + logc[idx]))
        highs.append(jnp.exp(log_s + logh[idx]))
        lows.append(jnp.exp(log_s + logl[idx]))
        ties.append(tie)
        log_s = log_s + logc[idx]

    def flat(rows):
        return jnp.stack(rows, axis=-1).reshape(GATED_SUB * lanes, w)

    return PG.PathBars(open=flat(opens), high=flat(highs), low=flat(lows),
                       close=flat(closes), volume=None), flat(ties)


@pytest.mark.slow
def test_gated_kernel_block_bootstrap_matches_xla_exact():
    """Gated kernel block-bootstrap == XLA gated lifecycle on bars
    reconstructed from the same uniforms (contiguous runs; bar-0 prev-close
    still open[0])."""
    w, bl = 16, 5
    hist = _history(3, 260)
    params = EngineParams.default(stop_padding=0.25, tp_padding=0.18)
    rng = np.random.default_rng(37)
    u = rng.uniform(
        1e-6, 1.0, (1, BOOT * (w // 2), GATED_SUB, LANES)).astype(np.float32)

    got = mc_paths_pallas_gated(
        0, LEVELS, params, num_paths=BLOCK, num_bars=w, lanes=LANES,
        sampler="block_bootstrap", hist_bars=hist, block_len=bl,
        interpret=True, external_uniforms=u)
    bars, tieu = _bars_from_blockboot_uniforms(u[0], hist, w, bl)
    want = _xla_stats(bars, tieu, LEVELS, params)
    for f in ("n", "n_entered", "n_tp", "n_stop", "n_open", "sum_trades"):
        assert float(getattr(got, f)) == float(getattr(want, f)), f
    np.testing.assert_array_equal(np.asarray(got.hist), np.asarray(want.hist))
    assert float(got.n_entered) > 0
    # same uniforms under iid bootstrap give a different surface
    iid = mc_paths_pallas_gated(
        0, LEVELS, params, num_paths=BLOCK, num_bars=w, lanes=LANES,
        sampler="bootstrap", hist_bars=hist, interpret=True,
        external_uniforms=u)
    assert float(iid.sum_trades) != float(got.sum_trades)


@pytest.mark.slow
def test_gated_sweep_kernel_block_bootstrap_crn_exact():
    """Block-bootstrap gated CRN sweep rows == single-config runs under the
    same uniforms."""
    w, bl = 8, 3
    hist = _history(7, 150)
    params = EngineParams.default()
    stops = np.array([0.15, 0.35], np.float32)
    tps = np.array([0.10, 0.28], np.float32)
    rng = np.random.default_rng(43)
    u = rng.uniform(
        1e-6, 1.0, (1, BOOT * (w // 2), GATED_SUB, 1024)).astype(np.float32)

    got = mc_paths_pallas_gated_sweep(
        0, LEVELS, params, stops, tps, num_paths=GATED_SUB * 1024,
        num_bars=w, sampler="block_bootstrap", hist_bars=hist, block_len=bl,
        interpret=True, external_uniforms=u)
    for g in range(2):
        cfg = params.replace(stop_padding=float(stops[g]),
                             tp_padding=float(tps[g]))
        want = mc_paths_pallas_gated(
            0, LEVELS, cfg, num_paths=GATED_SUB * 1024, num_bars=w,
            lanes=1024, sampler="block_bootstrap", hist_bars=hist,
            block_len=bl, interpret=True, external_uniforms=u)
        for f in ("n", "n_entered", "n_tp", "n_stop", "sum_trades"):
            assert float(getattr(got, f)[g]) == float(getattr(want, f)), (g, f)
