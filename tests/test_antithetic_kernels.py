"""Antithetic variance reduction inside the fused kernels.

``antithetic=True`` pairs each left half-lane with a sign-flipped copy on
the right half (ops/pathgen.gbm_paths pairs path halves the same way);
bridge/tie/volume draws stay fresh per lane and the right half's normal
draws are consumed-but-unused, so the uniform stream layout matches the
plain run (CRN alignment).  Exactness: kernel vs the jnp mirror oracles
applying the identical pairing, replayed through the XLA pipelines."""

import jax.numpy as jnp
import numpy as np
import pytest

from qmmx_monolithic_monte_carlo_tpu.config import EngineParams
from qmmx_monolithic_monte_carlo_tpu.ops.pallas_engine import (
    DRAWS_PER_PAIR,
    ENGINE_SUB,
    mc_paths_pallas_engine,
)
from qmmx_monolithic_monte_carlo_tpu.ops.pallas_mc import (
    GATED_SUB,
    mc_paths_pallas,
    mc_paths_pallas_gated,
)
from qmmx_monolithic_monte_carlo_tpu.sim import enginepath as EP
from qmmx_monolithic_monte_carlo_tpu.sim import gatedpath as GP
from qmmx_monolithic_monte_carlo_tpu.sim.pathsim import PathStats

from .test_engine_bootstrap import LEVELS
from .test_gated_bootstrap import _xla_stats
from .test_pallas_engine import DT, _bars_from_uniforms

LANES = 256
SIGMA = 0.3


@pytest.mark.slow
def test_engine_kernel_antithetic_matches_xla_exact():
    """Engine kernel antithetic == XLA engine replay on bars rebuilt with
    the identical half-lane sign-flip pairing: exact counts, skip table,
    histogram — and a different surface from the unpaired run."""
    w = 16
    params = EngineParams.default(stop_padding=0.25, tp_padding=0.18)
    rng = np.random.default_rng(51)
    u = rng.uniform(
        1e-6, 1.0, (1, DRAWS_PER_PAIR * (w // 2), ENGINE_SUB, LANES),
    ).astype(np.float32)

    anti, a_skips, a_esc = mc_paths_pallas_engine(
        0, LEVELS, params, num_paths=ENGINE_SUB * LANES, num_bars=w,
        sigma=SIGMA, dt=DT, lanes=LANES, antithetic=True, interpret=True,
        external_uniforms=u)
    bars, tie = _bars_from_uniforms(u[0], SIGMA, w=w, antithetic=True)
    out = EP.engine_path_replay(bars, LEVELS, params, tie)
    want = PathStats.from_lifecycle(
        equity=out.equity, trades=out.trades, wins=out.wins,
        losses=out.losses, open_at_end=out.open_at_end, max_dd=out.max_dd)
    for f in ("n", "n_entered", "n_tp", "n_stop", "n_open", "sum_trades"):
        assert float(getattr(anti, f)) == float(getattr(want, f)), f
    np.testing.assert_array_equal(np.asarray(a_skips),
                                  np.asarray(out.skip_counts))
    assert float(a_esc) == float(jnp.sum(out.escalations))
    np.testing.assert_array_equal(np.asarray(anti.hist),
                                  np.asarray(want.hist))
    base, _s, _e = mc_paths_pallas_engine(
        0, LEVELS, params, num_paths=ENGINE_SUB * LANES, num_bars=w,
        sigma=SIGMA, dt=DT, lanes=LANES, interpret=True,
        external_uniforms=u)
    assert float(base.sum_trades) != float(anti.sum_trades)


def _gated_bars_anti(u, w, lanes):
    """Gated-kernel GBM stream with the antithetic lane pairing."""
    drift = jnp.float32((0.0 - 0.5 * SIGMA * SIGMA) * DT)
    sig = jnp.float32(SIGMA * np.sqrt(DT))
    sig2dt = sig * sig
    log_s = jnp.full((GATED_SUB, lanes), jnp.float32(np.log(100.0)))
    opens, closes, highs, lows, ties = [], [], [], [], []
    for t2 in range(w // 2):
        blk = lambda k: jnp.asarray(u[8 * t2 + k], jnp.float32)
        radius = jnp.sqrt(-2.0 * jnp.log(blk(0)))
        angle = 6.283185307179586 * blk(1)
        z_pair = (radius * jnp.cos(angle), radius * jnp.sin(angle))
        h = lanes // 2
        z_pair = tuple(jnp.concatenate([z[:, :h], -z[:, :h]], axis=1)
                       for z in z_pair)
        for half in range(2):
            z = z_pair[half]
            u3, u4, tie = blk(2 + 3 * half), blk(3 + 3 * half), blk(4 + 3 * half)
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

    from qmmx_monolithic_monte_carlo_tpu.ops.pathgen import PathBars

    def flat(rows):
        return jnp.stack(rows, axis=-1).reshape(GATED_SUB * lanes, w)

    return PathBars(open=flat(opens), high=flat(highs), low=flat(lows),
                    close=flat(closes), volume=None), flat(ties)


def test_gated_kernel_antithetic_matches_xla_exact():
    w = 16
    params = EngineParams.default(stop_padding=0.25, tp_padding=0.18)
    rng = np.random.default_rng(53)
    u = rng.uniform(
        1e-6, 1.0, (1, 8 * (w // 2), GATED_SUB, LANES)).astype(np.float32)

    anti = mc_paths_pallas_gated(
        0, LEVELS, params, num_paths=GATED_SUB * LANES, num_bars=w,
        sigma=SIGMA, dt=DT, lanes=LANES, antithetic=True, interpret=True,
        external_uniforms=u)
    bars, tieu = _gated_bars_anti(u[0], w, LANES)
    want = _xla_stats(bars, tieu, LEVELS, params)
    for f in ("n", "n_entered", "n_tp", "n_stop", "n_open", "sum_trades"):
        assert float(getattr(anti, f)) == float(getattr(want, f)), f
    np.testing.assert_array_equal(np.asarray(anti.hist),
                                  np.asarray(want.hist))


def test_fc_kernel_antithetic_pairs_lanes():
    """First-contact kernel antithetic ~= plain kernel on angle-mirrored
    uniforms (u2 -> frac(u2+0.5) flips both Box-Muller branches modulo
    transcendental ulps, so counts agree within the file's usual f32
    threshold-flip tolerance)."""
    w = 16
    params = EngineParams.default()
    rng = np.random.default_rng(57)
    u = rng.uniform(1e-6, 1.0, (1, 3 * w + 1, LANES)).astype(np.float32)

    v = np.array(u)
    h = LANES // 2
    v[:, :w // 2, h:] = v[:, :w // 2, :h]
    v[:, w // 2:w, h:] = np.mod(v[:, w // 2:w, :h] + 0.5, 1.0)

    anti = mc_paths_pallas(
        0, LEVELS, params, num_paths=LANES, num_bars=w, sigma=SIGMA, dt=DT,
        lanes=LANES, antithetic=True, interpret=True, external_uniforms=u)
    plain = mc_paths_pallas(
        0, LEVELS, params, num_paths=LANES, num_bars=w, sigma=SIGMA, dt=DT,
        lanes=LANES, interpret=True, external_uniforms=v)
    for f in ("n", "n_entered", "n_tp", "n_stop", "n_open"):
        assert abs(float(getattr(anti, f)) - float(getattr(plain, f))) <= 2, f


def test_antithetic_validation():
    with pytest.raises(ValueError, match="gbm"):
        from .test_engine_bootstrap import _history

        mc_paths_pallas_engine(
            0, LEVELS, EngineParams.default(), num_paths=ENGINE_SUB * LANES,
            num_bars=8, lanes=LANES, sampler="bootstrap",
            hist_bars=_history(3, 100), antithetic=True, interpret=True)
    with pytest.raises(ValueError, match="lanes"):
        mc_paths_pallas_gated(
            0, LEVELS, EngineParams.default(), num_paths=GATED_SUB * 128,
            num_bars=8, lanes=128, antithetic=True, interpret=True)
