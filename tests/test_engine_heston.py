"""Heston stochastic-vol streaming through the fused FULL-ENGINE kernel.

The XLA pipeline has had a Heston sampler since round 1
(ops/pathgen.heston_paths: full-truncation Euler, bridge extremes from each
bar's LOCAL vol, volume coupled to the price shock) but it was the last
sampler stuck on the slow path — the kernels now carry the variance v_t as
one extra state tile and draw a third Box-Muller pair per double-bar step
for the rho-correlated vol shock.  Under injected uniforms the kernel must
match the XLA engine pipeline on bars reconstructed from the same draws."""

import jax.numpy as jnp
import numpy as np
import pytest

from qmmx_monolithic_monte_carlo_tpu.config import EngineParams
from qmmx_monolithic_monte_carlo_tpu.ops import pathgen as PG
from qmmx_monolithic_monte_carlo_tpu.ops.pallas_engine import (
    ENGINE_SUB,
    HESTON_DRAWS_PER_PAIR,
    _heston_tuple,
    mc_paths_pallas_engine,
)
from qmmx_monolithic_monte_carlo_tpu.sim import enginepath as EP
from qmmx_monolithic_monte_carlo_tpu.sim.pathsim import PathStats

from .test_engine_bootstrap import LEVELS
from .test_pallas_engine import DT, LANES, VM

BLOCK = ENGINE_SUB * LANES


def _bars_from_heston_uniforms(u, hp, w, lanes=LANES, vm=VM, s0=100.0):
    """Regenerate the kernel's Heston stream with the same jnp f32 ops
    (12 blocks per double-bar step: price pair, volume pair, vol-shock
    pair, then (u_high, u_low, tie) per half)."""
    v0, kappa, theta, xi, rho, mu, dt = hp
    rho_perp = float(np.sqrt(max(0.0, 1.0 - rho * rho)))
    stride = HESTON_DRAWS_PER_PAIR
    dtf = jnp.float32(dt)
    mean_abs = jnp.float32(np.sqrt(2.0 / np.pi))
    sd_abs = jnp.float32(np.sqrt(1.0 - 2.0 / np.pi))
    log_s = jnp.full((ENGINE_SUB, lanes), jnp.float32(np.log(s0)))
    v = jnp.full((ENGINE_SUB, lanes), jnp.float32(v0))
    opens, closes, highs, lows, vols, ties = [], [], [], [], [], []
    for t2 in range((w + 1) // 2):
        blk = lambda k: jnp.asarray(u[stride * t2 + k], jnp.float32)
        radius = jnp.sqrt(-2.0 * jnp.log(blk(0)))
        angle = 6.283185307179586 * blk(1)
        z_pair = (radius * jnp.cos(angle), radius * jnp.sin(angle))
        vradius = jnp.sqrt(-2.0 * jnp.log(blk(2)))
        vangle = 6.283185307179586 * blk(3)
        zv_pair = (vradius * jnp.cos(vangle), vradius * jnp.sin(vangle))
        qradius = jnp.sqrt(-2.0 * jnp.log(blk(4)))
        qangle = 6.283185307179586 * blk(5)
        zq_pair = (qradius * jnp.cos(qangle), qradius * jnp.sin(qangle))
        halves = 1 if (w % 2 and t2 == w // 2) else 2
        for half in range(halves):
            t = 2 * t2 + half
            z, zv, zq = z_pair[half], zv_pair[half], zq_pair[half]
            u3 = blk(6 + 3 * half)
            u4 = blk(7 + 3 * half)
            tie = blk(8 + 3 * half)
            v_pos = jnp.maximum(v, 0.0)
            sig_bar = jnp.sqrt(v_pos * dtf)
            log_open = log_s
            log_close = (log_s + (jnp.float32(mu) - 0.5 * v_pos) * dtf
                         + sig_bar * z)
            sig2dt = v_pos * dtf
            v = (v + jnp.float32(kappa) * (jnp.float32(theta) - v_pos) * dtf
                 + jnp.float32(xi) * sig_bar
                 * (jnp.float32(rho) * z + jnp.float32(rho_perp) * zq))
            d2 = (log_close - log_open) ** 2
            highs.append(jnp.exp(0.5 * (
                log_open + log_close + jnp.sqrt(d2 - 2.0 * sig2dt * jnp.log(u3)))))
            lows.append(jnp.exp(0.5 * (
                log_open + log_close - jnp.sqrt(d2 - 2.0 * sig2dt * jnp.log(u4)))))
            opens.append(jnp.exp(log_open))
            closes.append(jnp.exp(log_close))
            ties.append(tie)
            m = jnp.mod(jnp.float32(vm.open_minute) + jnp.float32(t),
                        jnp.float32(vm.day_minutes))
            x = 2.0 * m / jnp.float32(max(vm.day_minutes - 1, 1)) - 1.0
            shape = 1.0 + jnp.float32(vm.u_amp) * (x * x - jnp.float32(1.0 / 3.0))
            noise = jnp.exp(jnp.float32(vm.noise_sigma) * zv
                            - 0.5 * jnp.float32(vm.noise_sigma) ** 2)
            vol = jnp.float32(vm.base) * shape * noise
            vol = vol * (1.0 + jnp.float32(vm.ret_coupling)
                         * ((jnp.abs(z) - mean_abs) / sd_abs))
            vols.append(jnp.maximum(vol, jnp.float32(0.05 * vm.base)))
            log_s = log_close

    def flat(rows):
        return jnp.stack(rows, axis=-1).reshape(ENGINE_SUB * lanes, w)

    bars = PG.PathBars(open=flat(opens), high=flat(highs), low=flat(lows),
                       close=flat(closes), volume=flat(vols))
    return bars, flat(ties)


HPARAMS = dict(v0=0.09, kappa=2.0, theta=0.05, xi=0.9, rho=-0.6)


def _run_heston(w, seed=21, params=None):
    if params is None:
        params = EngineParams.default(stop_padding=0.25, tp_padding=0.18)
    hp = _heston_tuple(HPARAMS, 0.0, DT)
    rng = np.random.default_rng(seed)
    u = rng.uniform(
        1e-6, 1.0,
        (1, HESTON_DRAWS_PER_PAIR * ((w + 1) // 2), ENGINE_SUB, LANES),
    ).astype(np.float32)
    got, got_skips, got_escal = mc_paths_pallas_engine(
        0, LEVELS, params, num_paths=BLOCK, num_bars=w, dt=DT, lanes=LANES,
        sampler="heston", heston=HPARAMS, interpret=True,
        external_uniforms=u,
    )
    bars, tie = _bars_from_heston_uniforms(u[0], hp, w)
    out = EP.engine_path_replay(bars, LEVELS, params, tie)
    want = PathStats.from_lifecycle(
        equity=out.equity, trades=out.trades, wins=out.wins,
        losses=out.losses, open_at_end=out.open_at_end, max_dd=out.max_dd)
    return got, got_skips, got_escal, want, out


@pytest.mark.slow
def test_engine_kernel_heston_matches_xla_exact():
    """Kernel Heston streaming == XLA full-engine pipeline on bars
    reconstructed from the same injected uniforms: exact counts, skip
    table, escalations, histogram."""
    got, got_skips, got_escal, want, out = _run_heston(24)
    for f in ("n", "n_entered", "n_tp", "n_stop", "n_open", "sum_trades"):
        assert float(getattr(got, f)) == float(getattr(want, f)), f
    assert float(got_escal) == float(jnp.sum(out.escalations))
    np.testing.assert_array_equal(np.asarray(got_skips),
                                  np.asarray(out.skip_counts))
    np.testing.assert_array_equal(np.asarray(got.hist), np.asarray(want.hist))
    assert float(got.n_entered) > 0


@pytest.mark.slow
def test_engine_kernel_heston_odd_horizon_exact():
    """Odd horizons run the final half step with the heston draw layout."""
    got, got_skips, _e, want, out = _run_heston(9, seed=27)
    for f in ("n", "n_entered", "n_tp", "n_stop", "sum_trades"):
        assert float(getattr(got, f)) == float(getattr(want, f)), f
    np.testing.assert_array_equal(np.asarray(got_skips),
                                  np.asarray(out.skip_counts))


@pytest.mark.slow
def test_engine_heston_differs_from_gbm():
    """The vol path actually matters: heston with xi >> 0 produces a
    different decision surface than GBM at the matched average vol."""
    w = 24
    rng = np.random.default_rng(5)
    # same-seed PRNG comparison is not possible under injected uniforms
    # (different strides), so compare aggregate surfaces at matched vols
    got, _s, _e, want, _o = _run_heston(w, seed=5)
    sigma_eq = float(np.sqrt(HPARAMS["v0"] * 390 * 252))
    from qmmx_monolithic_monte_carlo_tpu.ops.pallas_engine import (
        DRAWS_PER_PAIR,
    )

    ug = rng.uniform(
        1e-6, 1.0, (1, DRAWS_PER_PAIR * (w // 2), ENGINE_SUB, LANES),
    ).astype(np.float32)
    gbm, _gs, _ge = mc_paths_pallas_engine(
        0, LEVELS, EngineParams.default(stop_padding=0.25, tp_padding=0.18),
        num_paths=BLOCK, num_bars=w, sigma=sigma_eq, dt=DT, lanes=LANES,
        interpret=True, external_uniforms=ug,
    )
    assert float(gbm.sum_trades) != float(got.sum_trades)


def test_engine_heston_validation():
    with pytest.raises(ValueError, match="samplers"):
        mc_paths_pallas_engine(
            0, LEVELS, EngineParams.default(), num_paths=BLOCK, num_bars=8,
            lanes=LANES, sampler="garch", interpret=True)


def _gated_bars_from_heston_uniforms(u, hp, w, lanes, s0=100.0):
    """Regenerate the GATED kernel's Heston stream (10 blocks per
    double-bar step: price pair, vol-shock pair, 2×(u3, u4, tie))."""
    from qmmx_monolithic_monte_carlo_tpu.ops.pallas_mc import (
        GATED_SUB,
        _gated_stride,
    )

    v0, kappa, theta, xi, rho, mu, dt = hp
    rho_perp = float(np.sqrt(max(0.0, 1.0 - rho * rho)))
    stride = _gated_stride("heston", False)
    dtf = jnp.float32(dt)
    log_s = jnp.full((GATED_SUB, lanes), jnp.float32(np.log(s0)))
    v = jnp.full((GATED_SUB, lanes), jnp.float32(v0))
    opens, closes, highs, lows, ties = [], [], [], [], []
    for t2 in range(w // 2):
        blk = lambda k: jnp.asarray(u[stride * t2 + k], jnp.float32)
        radius = jnp.sqrt(-2.0 * jnp.log(blk(0)))
        angle = 6.283185307179586 * blk(1)
        z_pair = (radius * jnp.cos(angle), radius * jnp.sin(angle))
        qradius = jnp.sqrt(-2.0 * jnp.log(blk(2)))
        qangle = 6.283185307179586 * blk(3)
        zq_pair = (qradius * jnp.cos(qangle), qradius * jnp.sin(qangle))
        for half in range(2):
            z, zq = z_pair[half], zq_pair[half]
            u3 = blk(4 + 3 * half)
            u4 = blk(5 + 3 * half)
            tie = blk(6 + 3 * half)
            v_pos = jnp.maximum(v, 0.0)
            sig_bar = jnp.sqrt(v_pos * dtf)
            log_open = log_s
            log_close = (log_s + (jnp.float32(mu) - 0.5 * v_pos) * dtf
                         + sig_bar * z)
            sig2dt = v_pos * dtf
            v = (v + jnp.float32(kappa) * (jnp.float32(theta) - v_pos) * dtf
                 + jnp.float32(xi) * sig_bar
                 * (jnp.float32(rho) * z + jnp.float32(rho_perp) * zq))
            d2 = (log_close - log_open) ** 2
            highs.append(jnp.exp(0.5 * (
                log_open + log_close + jnp.sqrt(d2 - 2.0 * sig2dt * jnp.log(u3)))))
            lows.append(jnp.exp(0.5 * (
                log_open + log_close - jnp.sqrt(d2 - 2.0 * sig2dt * jnp.log(u4)))))
            opens.append(jnp.exp(log_open))
            closes.append(jnp.exp(log_close))
            ties.append(tie)
            log_s = log_close

    def flat(rows):
        return jnp.stack(rows, axis=-1).reshape(GATED_SUB * lanes, w)

    return PG.PathBars(open=flat(opens), high=flat(highs), low=flat(lows),
                       close=flat(closes), volume=None), flat(ties)


def test_gated_kernel_heston_matches_xla_exact():
    """Gated kernel Heston streaming == XLA gated lifecycle on bars
    reconstructed from the same injected uniforms."""
    from qmmx_monolithic_monte_carlo_tpu.ops.pallas_mc import (
        GATED_SUB,
        _gated_stride,
        mc_paths_pallas_gated,
    )
    from qmmx_monolithic_monte_carlo_tpu.sim import gatedpath as GP

    w, lanes = 24, 128
    params = EngineParams.default(stop_padding=0.25, tp_padding=0.18)
    hp = _heston_tuple(HPARAMS, 0.0, DT)
    stride = _gated_stride("heston", False)
    rng = np.random.default_rng(33)
    u = rng.uniform(
        1e-6, 1.0, (1, stride * (w // 2), GATED_SUB, lanes),
    ).astype(np.float32)

    got = mc_paths_pallas_gated(
        0, LEVELS, params, num_paths=GATED_SUB * lanes, num_bars=w,
        lanes=lanes, dt=DT, sampler="heston", heston=HPARAMS,
        interpret=True, external_uniforms=u)
    bars, tieu = _gated_bars_from_heston_uniforms(u[0], hp, w, lanes)
    gate = GP.GateConfig.from_params(params)
    out = GP.gated_path_replay(bars, LEVELS, params, gate, tieu)
    want = PathStats.from_lifecycle(
        equity=out.equity, trades=out.trades, wins=out.wins,
        losses=out.losses, open_at_end=out.open_at_end, max_dd=out.max_dd)
    for f in ("n", "n_entered", "n_tp", "n_stop", "n_open", "sum_trades"):
        assert float(getattr(got, f)) == float(getattr(want, f)), f
    np.testing.assert_array_equal(np.asarray(got.hist), np.asarray(want.hist))
    assert float(got.n_entered) > 0


def test_gated_sweep_kernel_heston_crn_exact():
    """Heston gated CRN sweep rows == single-config runs under the same
    uniforms (identical variance paths per row)."""
    from qmmx_monolithic_monte_carlo_tpu.ops.pallas_mc import (
        GATED_SUB,
        _gated_stride,
        mc_paths_pallas_gated,
        mc_paths_pallas_gated_sweep,
    )

    w = 8
    params = EngineParams.default()
    stops = np.array([0.15, 0.35], np.float32)
    tps = np.array([0.10, 0.28], np.float32)
    stride = _gated_stride("heston", False)
    rng = np.random.default_rng(39)
    u = rng.uniform(
        1e-6, 1.0, (1, stride * (w // 2), GATED_SUB, 1024),
    ).astype(np.float32)

    got = mc_paths_pallas_gated_sweep(
        0, LEVELS, params, stops, tps, num_paths=GATED_SUB * 1024,
        num_bars=w, dt=DT, sampler="heston", heston=HPARAMS,
        interpret=True, external_uniforms=u)
    for g in range(2):
        cfg = params.replace(stop_padding=float(stops[g]),
                             tp_padding=float(tps[g]))
        want = mc_paths_pallas_gated(
            0, LEVELS, cfg, num_paths=GATED_SUB * 1024, num_bars=w,
            lanes=1024, dt=DT, sampler="heston", heston=HPARAMS,
            interpret=True, external_uniforms=u)
        for f in ("n", "n_entered", "n_tp", "n_stop", "sum_trades"):
            assert float(getattr(got, f)[g]) == float(getattr(want, f)), (g, f)
