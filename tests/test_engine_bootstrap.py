"""Recorded-bar (bootstrap) streaming through the fused FULL-ENGINE kernel.

VERDICT r3 missing #3: the reference's MC walks RECORDED bars (:3353-3538);
the scaled analog is bootstrap resampling of real history with real volumes
(ops/pathgen.bootstrap_paths).  The kernel now draws per-bar resample
indices on-chip and gathers the five relative-geometry channels by per-lane
``take_along_axis`` over lane-tiled VMEM tables.  Under injected uniforms it
must match the XLA engine pipeline on bars reconstructed from the same
draws (the GBM parity tests' pattern)."""

import jax.numpy as jnp
import numpy as np
import pytest

from qmmx_monolithic_monte_carlo_tpu.config import EngineParams
from qmmx_monolithic_monte_carlo_tpu.ops import pathgen as PG
from qmmx_monolithic_monte_carlo_tpu.ops.pallas_engine import (
    BOOT_DRAWS_PER_PAIR,
    ENGINE_SUB,
    mc_paths_pallas_engine,
)
from qmmx_monolithic_monte_carlo_tpu.sim import enginepath as EP
from qmmx_monolithic_monte_carlo_tpu.sim.pathsim import PathStats
from qmmx_monolithic_monte_carlo_tpu.types import Levels

from .test_pallas_engine import DT, LANES

BLOCK = ENGINE_SUB * LANES

LEVELS = Levels.from_rows(
    [
        {"color": "blue", "type": "solid", "index": 0, "price": 100.0},
        {"color": "teal", "type": "dashed", "index": 0, "price": 100.35},
        {"color": "orange", "type": "solid", "index": 0, "price": 99.65},
    ],
    max_levels=4,
)


def _history(seed, h):
    """A recorded OHLCV history with real wick structure and volume bursts
    (what the guard/veto gates consume)."""
    rng = np.random.default_rng(seed)
    steps = rng.normal(0, 0.12, h).astype(np.float32)
    c = np.float32(100.0) + np.cumsum(steps, dtype=np.float32)
    o = np.concatenate([[np.float32(100.0)], c[:-1]])
    hi = np.maximum(o, c) + rng.uniform(0, 0.15, h).astype(np.float32)
    lo = np.minimum(o, c) - rng.uniform(0, 0.15, h).astype(np.float32)
    v = rng.lognormal(13.0, 0.5, h).astype(np.float32)
    v = v * (1.0 + 2.0 * (np.abs(steps) > 0.15)).astype(np.float32)
    return PG.PathBars(open=jnp.asarray(o), high=jnp.asarray(hi),
                       low=jnp.asarray(lo), close=jnp.asarray(c),
                       volume=jnp.asarray(v))


def _bars_from_boot_uniforms(u, hist, w, lanes=LANES, s0=100.0):
    """Mirror the kernel's bootstrap stream: idx = floor(u·H) clamped, five
    channel gathers, sequential log chaining — all in jnp f32."""
    logc, logh, logl, logo, vol = PG.bootstrap_tables(
        hist.open, hist.high, hist.low, hist.close, hist.volume)
    hf = jnp.float32(logc.shape[0])
    stride = BOOT_DRAWS_PER_PAIR
    log_s = jnp.full((ENGINE_SUB, lanes), jnp.float32(np.log(s0)))
    opens, closes, highs, lows, vols, ties = [], [], [], [], [], []
    for t in range(w):
        t2, half = divmod(t, 2)
        uu = jnp.asarray(u[stride * t2 + half], jnp.float32)
        tie = jnp.asarray(u[stride * t2 + 2 + half], jnp.float32)
        idx = jnp.minimum(jnp.floor(uu * hf), hf - 1.0).astype(jnp.int32)
        opens.append(jnp.exp(log_s + logo[idx]))
        closes.append(jnp.exp(log_s + logc[idx]))
        highs.append(jnp.exp(log_s + logh[idx]))
        lows.append(jnp.exp(log_s + logl[idx]))
        vols.append(vol[idx])
        ties.append(tie)
        log_s = log_s + logc[idx]

    def flat(rows):
        return jnp.stack(rows, axis=-1).reshape(ENGINE_SUB * lanes, w)

    return PG.PathBars(open=flat(opens), high=flat(highs), low=flat(lows),
                       close=flat(closes), volume=flat(vols)), flat(ties)


def test_engine_kernel_bootstrap_matches_xla_exact():
    """Kernel bootstrap streaming == XLA full-engine pipeline on bars
    reconstructed from the same injected uniforms: exact counts, skip table,
    escalations, histogram."""
    w = 24
    hist = _history(3, 300)
    params = EngineParams.default(stop_padding=0.25, tp_padding=0.18)
    rng = np.random.default_rng(13)
    u = rng.uniform(
        1e-6, 1.0,
        (1, BOOT_DRAWS_PER_PAIR * ((w + 1) // 2), ENGINE_SUB, LANES),
    ).astype(np.float32)

    got, got_skips, got_escal = mc_paths_pallas_engine(
        0, LEVELS, params, num_paths=BLOCK, num_bars=w, dt=DT, lanes=LANES,
        sampler="bootstrap", hist_bars=hist, interpret=True,
        external_uniforms=u,
    )
    bars, tie = _bars_from_boot_uniforms(u[0], hist, w)
    out = EP.engine_path_replay(bars, LEVELS, params, tie)
    want = PathStats.from_lifecycle(
        equity=out.equity, trades=out.trades, wins=out.wins, losses=out.losses,
        open_at_end=out.open_at_end, max_dd=out.max_dd,
    )
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
    np.testing.assert_array_equal(np.asarray(got.hist), np.asarray(want.hist))
    # real traffic: entries happen and recorded volumes reach the veto gates
    assert float(got.n_entered) > 0
    skips = {r.name: float(s) for r, s in zip(EP.SKIP_REASONS,
                                              np.asarray(got_skips))}
    assert skips["TOO_FAR"] > 0


def test_engine_kernel_bootstrap_multi_tile_history():
    """History longer than one lane tile (H > lanes) exercises the
    range-selected multi-tile gather path."""
    w = 8
    hist = _history(5, 2 * LANES + 57)      # 3 lane tiles at LANES=256
    params = EngineParams.default()
    rng = np.random.default_rng(17)
    u = rng.uniform(
        1e-6, 1.0, (1, BOOT_DRAWS_PER_PAIR * (w // 2), ENGINE_SUB, LANES),
    ).astype(np.float32)

    got, got_skips, _es = mc_paths_pallas_engine(
        0, LEVELS, params, num_paths=BLOCK, num_bars=w, dt=DT, lanes=LANES,
        sampler="bootstrap", hist_bars=hist, interpret=True,
        external_uniforms=u,
    )
    bars, tie = _bars_from_boot_uniforms(u[0], hist, w)
    out = EP.engine_path_replay(bars, LEVELS, params, tie)
    want = PathStats.from_lifecycle(
        equity=out.equity, trades=out.trades, wins=out.wins, losses=out.losses,
        open_at_end=out.open_at_end, max_dd=out.max_dd,
    )
    assert float(got.n_entered) == float(want.n_entered)
    assert float(got.sum_trades) == float(want.sum_trades)
    np.testing.assert_array_equal(np.asarray(got_skips),
                                  np.asarray(out.skip_counts))
    np.testing.assert_array_equal(np.asarray(got.hist), np.asarray(want.hist))


def test_engine_kernel_bootstrap_requires_history():
    with pytest.raises(ValueError, match="hist_bars"):
        mc_paths_pallas_engine(
            0, LEVELS, EngineParams.default(), num_paths=BLOCK, num_bars=8,
            lanes=LANES, sampler="bootstrap")
