#!/usr/bin/env python3
"""Pin the fused kernels' Mosaic lowering on REAL hardware (VERDICT r2 item 7).

The CPU tests prove the gated/engine lifecycles exact under
``interpret=True`` — the kernels' jnp ops executed by XLA.  That pins the op
SEQUENCE but not the Mosaic lowering.  On-chip, bitwise equality against an
XLA reference is not achievable even for a perfect lowering: Mosaic and
XLA:TPU lower exp/log/sin/cos through different polynomial approximations, so
regenerated bars differ by a few ulps and a measure-zero set of
threshold-straddling trades flips.  What a MISCOMPILE would produce instead
is gross disagreement (wrong counts by percent-level or worse).

This script runs ONE block of injected uniforms through each Mosaic-lowered
kernel on the TPU, replays the same uniforms through plain XLA on the same
chip, and reports the decision-agreement statistics.  PASS criteria: path
counts exact, every trade-level count within 0.2% relative, and histogram
L1-distance below 0.5% of entered paths.

Measured 2026-08-16 on v5e (recorded in benchmarks/RESULTS.md): gated kernel
12010/12019 trade decisions identical (99.93%), n/n_entered exact.

Prints one JSON line per kernel; exits 1 if any kernel fails its bound.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from qmmx_monolithic_monte_carlo_tpu.config import EngineParams
from qmmx_monolithic_monte_carlo_tpu.ops.pallas_mc import (
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
W = 40
SIGMA = 0.3
DT = 1.0 / (390.0 * 252.0)

COUNT_REL_TOL = 2e-3
HIST_L1_TOL = 5e-3


def _bars_from_uniforms_gated(u):
    """Streaming-GBM bar regeneration with plain jnp f32 ops (the gated
    kernel's exact op sequence — mirrors tests/test_pallas_gated.py)."""
    drift = jnp.float32((0.0 - 0.5 * SIGMA * SIGMA) * DT)
    sig = jnp.float32(SIGMA * np.sqrt(DT))
    sig2dt = sig * sig
    lanes = u.shape[-1]
    log_s = jnp.full((GATED_SUB, lanes), jnp.float32(np.log(100.0)))
    opens, closes, highs, lows, ties = [], [], [], [], []
    for t2 in range(W // 2):
        blk = lambda k: jnp.asarray(u[8 * t2 + k], jnp.float32)
        radius = jnp.sqrt(-2.0 * jnp.log(blk(0)))
        angle = 6.283185307179586 * blk(1)
        z_pair = (radius * jnp.cos(angle), radius * jnp.sin(angle))
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
    n = GATED_SUB * lanes

    def flat(rows):
        return jnp.stack(rows, axis=-1).reshape(n, W)

    bars = PathBars(open=flat(opens), high=flat(highs),
                    low=flat(lows), close=flat(closes),
                    volume=jnp.zeros((n, W), jnp.float32))
    return bars, flat(ties)


def _judge(name, got, want, *, extra=None, counts=("n", "n_entered", "n_tp",
                                                   "n_stop", "n_open",
                                                   "sum_trades")):
    rows = {}
    worst_rel = 0.0
    for f in counts:
        a, b = float(getattr(got, f)), float(getattr(want, f))
        rows[f] = [a, b]
        if f in ("n",):
            worst_rel = max(worst_rel, 0.0 if a == b else 1.0)
        else:
            worst_rel = max(worst_rel, abs(a - b) / max(abs(b), 1.0))
    l1 = float(np.abs(np.asarray(got.hist) - np.asarray(want.hist)).sum())
    l1_frac = l1 / max(float(want.n_entered), 1.0)
    ok = (rows["n"][0] == rows["n"][1] and worst_rel <= COUNT_REL_TOL
          and l1_frac <= HIST_L1_TOL)
    out = {
        "kernel": name, "counts": rows,
        "worst_count_rel_diff": worst_rel,
        "hist_l1_frac_of_entered": l1_frac,
        "decisions_checked": rows.get("sum_trades", rows["n_entered"])[1],
        "ok": ok,
    }
    if extra:
        out.update(extra)
    print(json.dumps(out))
    return ok


def check_gated():
    block = GATED_SUB * GATED_LANES
    rng = np.random.default_rng(42)
    u = rng.uniform(1e-6, 1.0, (1, 4 * W, GATED_SUB, GATED_LANES)).astype(np.float32)
    gate = GateConfig.default()
    params = EngineParams.default()
    got = mc_paths_pallas_gated(
        0, LEVELS, params, gate, num_paths=block, num_bars=W,
        sigma=SIGMA, dt=DT, external_uniforms=u,
    )
    bars, tie = _bars_from_uniforms_gated(u[0])
    out = gatedpath.gated_path_replay(bars, LEVELS, params, gate, tie)
    want = PathStats.from_lifecycle(
        equity=out.equity, trades=out.trades, wins=out.wins, losses=out.losses,
        open_at_end=out.open_at_end, max_dd=out.max_dd,
    )
    rel = abs(float(got.sum_r) - float(want.sum_r)) / max(abs(float(want.sum_r)), 1.0)
    return _judge("gated", got, want, extra={"sum_r_rel_diff": rel})


def check_engine():
    from qmmx_monolithic_monte_carlo_tpu.ops.pallas_engine import (
        DRAWS_PER_PAIR,
        ENGINE_SUB,
        mc_paths_pallas_engine,
    )
    from qmmx_monolithic_monte_carlo_tpu.sim import enginepath as EP
    from tests.test_pallas_engine import LANES as TLANES
    from tests.test_pallas_engine import _bars_from_uniforms as mk_bars

    # 3 levels so target escalation has a level to roll to (with only 2, the
    # anchor at a target touch is almost always the outermost level and
    # next_level_target finds nothing)
    levels3 = Levels.from_rows(
        [
            {"color": "blue", "type": "solid", "index": 0, "price": 100.0},
            {"color": "orange", "type": "dashed", "index": 0, "price": 100.4},
            {"color": "teal", "type": "solid", "index": 0, "price": 99.6},
        ],
        max_levels=8,
    )
    block = ENGINE_SUB * TLANES
    rng = np.random.default_rng(7)
    u = rng.uniform(
        1e-6, 1.0, (1, DRAWS_PER_PAIR * (W // 2), ENGINE_SUB, TLANES),
    ).astype(np.float32)
    params = EngineParams.default()
    got, got_skips, got_escal = mc_paths_pallas_engine(
        0, levels3, params, num_paths=block, num_bars=W, sigma=SIGMA, dt=DT,
        lanes=TLANES, external_uniforms=u,
    )
    bars, tie = mk_bars(u[0], SIGMA)
    out = EP.engine_path_replay(bars, levels3, params, tie)
    want = PathStats.from_lifecycle(
        equity=out.equity, trades=out.trades, wins=out.wins, losses=out.losses,
        open_at_end=out.open_at_end, max_dd=out.max_dd,
    )
    skips_diff = float(np.abs(np.asarray(got_skips)
                              - np.asarray(out.skip_counts)).sum())
    skips_tot = float(np.asarray(out.skip_counts).sum())
    return _judge("engine", got, want, extra={
        "escalations": [float(got_escal), float(jnp.sum(out.escalations))],
        "skip_table_l1_frac": skips_diff / max(skips_tot, 1.0),
    })


def check_engine_noise():
    """The noised engine kernel (stride-18 draw layout, per-entry McNoise):
    same judging as the noise-free row, with the noise normals reconstructed
    from the same injected uniforms."""
    from qmmx_monolithic_monte_carlo_tpu.ops.pallas_engine import (
        ENGINE_SUB,
        mc_paths_pallas_engine,
    )
    from qmmx_monolithic_monte_carlo_tpu.sim import enginepath as EP
    from qmmx_monolithic_monte_carlo_tpu.sim.montecarlo import McNoise
    from tests.test_pallas_engine import LANES as TLANES
    from tests.test_pallas_engine import _bars_from_uniforms as mk_bars

    levels3 = Levels.from_rows(
        [
            {"color": "blue", "type": "solid", "index": 0, "price": 100.0},
            {"color": "orange", "type": "dashed", "index": 0, "price": 100.4},
            {"color": "teal", "type": "solid", "index": 0, "price": 99.6},
        ],
        max_levels=8,
    )
    block = ENGINE_SUB * TLANES
    rng = np.random.default_rng(11)
    u = rng.uniform(
        1e-6, 1.0, (1, 18 * (W // 2), ENGINE_SUB, TLANES)).astype(np.float32)
    params = EngineParams.default()
    noise = McNoise.make(level_jitter_std=0.02, entry_slip_std=0.01,
                         stop_slip_std=0.01, target_slip_std=0.01)
    got, got_skips, got_escal = mc_paths_pallas_engine(
        0, levels3, params, num_paths=block, num_bars=W, sigma=SIGMA, dt=DT,
        lanes=TLANES, noise=noise, external_uniforms=u,
    )
    bars, tie, nn = mk_bars(u[0], SIGMA, with_noise=True)
    out = EP.engine_path_replay(bars, levels3, params, tie,
                                noise=noise, noise_normals=nn)
    want = PathStats.from_lifecycle(
        equity=out.equity, trades=out.trades, wins=out.wins, losses=out.losses,
        open_at_end=out.open_at_end, max_dd=out.max_dd,
    )
    skips_diff = float(np.abs(np.asarray(got_skips)
                              - np.asarray(out.skip_counts)).sum())
    skips_tot = float(np.asarray(out.skip_counts).sum())
    return _judge("engine+noise", got, want, extra={
        "escalations": [float(got_escal), float(jnp.sum(out.escalations))],
        "skip_table_l1_frac": skips_diff / max(skips_tot, 1.0),
    })


def _engine_parity(name, *, levels, w, seed, lanes=256, params=None,
                   sampler="gbm", hist=None, harvest=False, sigma=SIGMA):
    """Shared judge for the round-4 engine-envelope kernels: run one block
    of injected uniforms through the Mosaic kernel AND the XLA pipeline on
    the same chip (bars regenerated from the same draws)."""
    from qmmx_monolithic_monte_carlo_tpu.ops.pallas_engine import (
        ENGINE_SUB,
        _draw_stride,
        mc_paths_pallas_engine,
    )
    from qmmx_monolithic_monte_carlo_tpu.sim import enginepath as EP
    from tests.test_pallas_engine import _bars_from_uniforms as mk_bars

    if params is None:
        params = EngineParams.default()
    block = ENGINE_SUB * lanes
    stride = _draw_stride(sampler, False)
    rng = np.random.default_rng(seed)
    u = rng.uniform(
        1e-6, 1.0, (1, stride * ((w + 1) // 2), ENGINE_SUB, lanes),
    ).astype(np.float32)
    res = mc_paths_pallas_engine(
        0, levels, params, num_paths=block, num_bars=w, sigma=sigma, dt=DT,
        lanes=lanes, sampler=sampler, hist_bars=hist, harvest=harvest,
        external_uniforms=u,
    )
    got, got_skips, got_escal = res[:3]
    if sampler == "bootstrap":
        from tests.test_engine_bootstrap import _bars_from_boot_uniforms

        bars, tie = _bars_from_boot_uniforms(u[0], hist, w, lanes=lanes)
    else:
        bars, tie = mk_bars(u[0], sigma, lanes=lanes, w=w)
    out = EP.engine_path_replay(bars, levels, params, tie, harvest=harvest)
    want = PathStats.from_lifecycle(
        equity=out.equity, trades=out.trades, wins=out.wins, losses=out.losses,
        open_at_end=out.open_at_end, max_dd=out.max_dd,
    )
    extra = {
        "escalations": [float(got_escal),
                        float(np.asarray(out.escalations).sum())],
    }
    if harvest:
        hv_k = np.asarray(res[3].ml_counts)
        hv_x = np.asarray(out.harvest.ml_counts)
        extra["harvest_labeled"] = [float(hv_k.sum()), float(hv_x.sum())]
        extra["harvest_l1_frac"] = (
            float(np.abs(hv_k - hv_x).sum()) / max(float(hv_x.sum()), 1.0))
    return _judge(name, got, want, extra=extra)


def check_envelope():
    """Round-4 envelope: 30 levels, windowed-guard 63-bar (odd) horizon,
    bootstrap recorded bars, on-chip harvest."""
    from tests.test_engine_bootstrap import _history
    from tests.test_engine_envelope import _many_levels

    ok = _engine_parity("engine-30-levels", levels=_many_levels(30), w=24,
                        seed=50)
    ok = _engine_parity("engine-63-bars-windowed-odd",
                        levels=_many_levels(4, step=0.3), w=63, seed=51) and ok
    ok = _engine_parity(
        "engine-bootstrap", levels=_many_levels(3, step=0.35), w=24, seed=52,
        sampler="bootstrap", hist=_history(3, 300),
        params=EngineParams.default(stop_padding=0.25, tp_padding=0.18),
    ) and ok
    ok = _engine_parity("engine-harvest",
                        levels=_many_levels(3, step=0.35), w=40, seed=53,
                        harvest=True) and ok
    return ok


def _slice_stats(st, *idx):
    """Select one grid/symbol cell of a batched PathStats (hist_lo/hist_hi
    are static, not pytree leaves, and pass through untouched)."""
    import jax

    return jax.tree_util.tree_map(lambda v: v[idx], st)


def check_bootstrap():
    """Round-4b: recorded-bar (bootstrap) streaming across ALL fused kernel
    families pinned on-chip — engine sweep / universe / universe-sweep and
    gated sweep / universe vs single-config kernel runs under the same
    injected uniforms (identical resample indices), gated single vs the XLA
    replay, first-contact universe vs the single kernel, and the PRNG-only
    first-contact sweep vs same-seed single runs (identical draw order).
    Set QMMX_EXACT_INTERPRET=1 to smoke the harness on CPU (interpret mode;
    skips the PRNG-only check — prng_seed cannot lower there)."""
    import os

    import jax

    from qmmx_monolithic_monte_carlo_tpu.ops.pallas_engine import (
        ENGINE_SUB,
        mc_paths_pallas_engine,
        mc_paths_pallas_engine_sweep,
        mc_paths_pallas_engine_universe,
        mc_paths_pallas_engine_universe_sweep,
    )
    from qmmx_monolithic_monte_carlo_tpu.ops.pallas_mc import (
        LANES,
        _gated_stride,
        mc_paths_pallas,
        mc_paths_pallas_gated,
        mc_paths_pallas_gated_sweep,
        mc_paths_pallas_gated_universe,
        mc_paths_pallas_sweep,
        mc_paths_pallas_universe,
    )
    from qmmx_monolithic_monte_carlo_tpu.parallel import universe as U
    from tests.test_engine_bootstrap import (
        BOOT_DRAWS_PER_PAIR as EBOOT,
        _history,
        _stacked_histories,
    )
    from tests.test_gated_bootstrap import (
        _bars_from_boot_uniforms as mk_gated_boot_bars,
        _xla_stats,
    )

    interp = bool(int(os.environ.get("QMMX_EXACT_INTERPRET", "0")))
    rng = np.random.default_rng(77)
    ok = True

    # ---- engine family (lanes=256) over one shared recorded history ----
    w, lanes = 24, 256
    hist = _history(3, 300)
    stop_g = np.array([0.18, 0.32], np.float32)
    u = rng.uniform(1e-6, 1.0, (1, EBOOT * (w // 2), ENGINE_SUB, lanes),
                    ).astype(np.float32)
    lv3 = Levels.from_rows(
        [{"color": "blue", "type": "solid", "index": 0, "price": 100.0},
         {"color": "teal", "type": "dashed", "index": 0, "price": 100.35},
         {"color": "orange", "type": "solid", "index": 0, "price": 99.65}],
        max_levels=4)
    kw = dict(num_paths=ENGINE_SUB * lanes, num_bars=w, dt=DT, lanes=lanes,
              sampler="bootstrap", hist_bars=hist, interpret=interp,
              external_uniforms=u)
    singles = [mc_paths_pallas_engine(
        0, lv3, EngineParams.default(stop_padding=float(sg)), **kw)
        for sg in stop_g]
    grid = EngineParams.default().replace(stop_padding=jnp.asarray(stop_g))
    sw = mc_paths_pallas_engine_sweep(0, lv3, grid, **kw)
    for g in range(2):
        ok = _judge(f"engine-sweep-bootstrap[{g}]", _slice_stats(sw[0], g),
                    singles[g][0],
                    extra={"skips_equal": bool(np.array_equal(
                        np.asarray(sw[1][g]), np.asarray(singles[g][1]))),
                        "escal": [float(sw[2][g]), float(singles[g][2])],
                    }) and ok

    # per-symbol engine universe + [S, G] universe-sweep
    rows2 = [
        [{"color": "blue", "type": "solid", "index": 0, "price": 100.0},
         {"color": "teal", "type": "dashed", "index": 0, "price": 100.4}],
        [{"color": "orange", "type": "solid", "index": 0, "price": 50.1}],
    ]
    lv2 = U.stack_levels(rows2, max_levels=4)
    s0v = np.array([100.0, 50.0], np.float32)
    sgv = np.array([0.35, 0.5], np.float32)
    hist2 = _stacked_histories([11, 23], 256)
    uu = rng.uniform(1e-6, 1.0, (2, 1, EBOOT * (w // 2), ENGINE_SUB, lanes),
                     ).astype(np.float32)
    pars = EngineParams.default().replace(
        stop_padding=jnp.asarray([0.20, 0.30], np.float32))
    un = mc_paths_pallas_engine_universe(
        0, lv2, pars, s0v, sgv, paths_per_symbol=ENGINE_SUB * lanes,
        num_bars=w, dt=DT, lanes=lanes, sampler="bootstrap", hist_bars=hist2,
        interpret=interp, external_uniforms=uu)
    usw = mc_paths_pallas_engine_universe_sweep(
        0, lv2, pars.replace(stop_padding=jnp.asarray(stop_g)), s0v, sgv,
        paths_per_symbol=ENGINE_SUB * lanes, num_bars=w, dt=DT, lanes=lanes,
        sampler="bootstrap", hist_bars=hist2, interpret=interp,
        external_uniforms=uu)
    for s in range(2):
        lv_s = jax.tree_util.tree_map(lambda x: x[s], lv2)
        h_s = jax.tree_util.tree_map(lambda x: x[s], hist2)
        single = mc_paths_pallas_engine(
            0, lv_s, EngineParams.default(stop_padding=[0.20, 0.30][s]),
            num_paths=ENGINE_SUB * lanes, num_bars=w, s0=float(s0v[s]),
            sigma=float(sgv[s]), dt=DT, lanes=lanes, sampler="bootstrap",
            hist_bars=h_s, interpret=interp, external_uniforms=uu[s])
        ok = _judge(f"engine-universe-bootstrap[{s}]",
                    _slice_stats(un[0], s), single[0],
                    extra={"escal": [float(un[2][s]), float(single[2])]},
                    ) and ok
        for g in range(2):
            sg_single = mc_paths_pallas_engine(
                0, lv_s, EngineParams.default(stop_padding=float(stop_g[g])),
                num_paths=ENGINE_SUB * lanes, num_bars=w, s0=float(s0v[s]),
                sigma=float(sgv[s]), dt=DT, lanes=lanes, sampler="bootstrap",
                hist_bars=h_s, interpret=interp, external_uniforms=uu[s])
            ok = _judge(f"engine-universe-sweep-bootstrap[{s},{g}]",
                        _slice_stats(usw[0], s, g), sg_single[0]) and ok

    # ---- gated family (1024 lanes) ----
    gb = _gated_stride("bootstrap", False)
    ug = rng.uniform(1e-6, 1.0, (1, gb * (w // 2), GATED_SUB, GATED_LANES),
                     ).astype(np.float32)
    params = EngineParams.default(stop_padding=0.25, tp_padding=0.18)
    got = mc_paths_pallas_gated(
        0, lv3, params, num_paths=GATED_SUB * GATED_LANES, num_bars=w,
        lanes=GATED_LANES, sampler="bootstrap", hist_bars=hist,
        interpret=interp, external_uniforms=ug)
    bars, tieu = mk_gated_boot_bars(ug[0], hist, w, lanes=GATED_LANES)
    ok = _judge("gated-bootstrap", got,
                _xla_stats(bars, tieu, lv3, params)) and ok

    # block-bootstrap (contiguous runs): engine + gated singles vs the
    # mirrored-oracle XLA replays under the same uniforms
    from tests.test_engine_bootstrap import (
        _bars_from_blockboot_uniforms as mk_eng_block_bars,
    )
    from tests.test_gated_bootstrap import (
        _bars_from_blockboot_uniforms as mk_gated_block_bars,
    )
    from qmmx_monolithic_monte_carlo_tpu.sim import enginepath as EP
    from qmmx_monolithic_monte_carlo_tpu.sim.pathsim import (
        PathStats as _PS,
    )

    bl = 5
    eb = mc_paths_pallas_engine(
        0, lv3, EngineParams.default(stop_padding=0.25, tp_padding=0.18),
        num_paths=ENGINE_SUB * lanes, num_bars=w, dt=DT, lanes=lanes,
        sampler="block_bootstrap", hist_bars=hist, block_len=bl,
        interpret=interp, external_uniforms=u)
    bbars, btie = mk_eng_block_bars(u[0], hist, w, bl, lanes=lanes)
    bout = EP.engine_path_replay(
        bbars, lv3, EngineParams.default(stop_padding=0.25, tp_padding=0.18),
        btie)
    ok = _judge("engine-block-bootstrap", eb[0], _PS.from_lifecycle(
        equity=bout.equity, trades=bout.trades, wins=bout.wins,
        losses=bout.losses, open_at_end=bout.open_at_end,
        max_dd=bout.max_dd)) and ok
    gblk = mc_paths_pallas_gated(
        0, lv3, params, num_paths=GATED_SUB * GATED_LANES, num_bars=w,
        lanes=GATED_LANES, sampler="block_bootstrap", hist_bars=hist,
        block_len=bl, interpret=interp, external_uniforms=ug)
    gbars, gtie = mk_gated_block_bars(ug[0], hist, w, bl, lanes=GATED_LANES)
    ok = _judge("gated-block-bootstrap", gblk,
                _xla_stats(gbars, gtie, lv3, params)) and ok

    # heston stochastic vol: engine + gated singles vs mirrored-oracle
    # XLA replays under the same uniforms
    from qmmx_monolithic_monte_carlo_tpu.ops.pallas_engine import (
        HESTON_DRAWS_PER_PAIR,
        _heston_tuple,
    )
    from qmmx_monolithic_monte_carlo_tpu.ops.pallas_mc import _gated_stride
    from tests.test_engine_heston import (
        HPARAMS,
        _bars_from_heston_uniforms,
        _gated_bars_from_heston_uniforms,
    )
    from qmmx_monolithic_monte_carlo_tpu.ops.pathgen import VolumeModel

    hp = _heston_tuple(HPARAMS, 0.0, DT)
    uh = rng.uniform(
        1e-6, 1.0, (1, HESTON_DRAWS_PER_PAIR * (w // 2), ENGINE_SUB, lanes),
    ).astype(np.float32)
    he = mc_paths_pallas_engine(
        0, lv3, EngineParams.default(stop_padding=0.25, tp_padding=0.18),
        num_paths=ENGINE_SUB * lanes, num_bars=w, dt=DT, lanes=lanes,
        sampler="heston", heston=HPARAMS, interpret=interp,
        external_uniforms=uh)
    hbars, htie = _bars_from_heston_uniforms(uh[0], hp, w, lanes=lanes,
                                             vm=VolumeModel())
    hout = EP.engine_path_replay(
        hbars, lv3, EngineParams.default(stop_padding=0.25, tp_padding=0.18),
        htie)
    ok = _judge("engine-heston", he[0], _PS.from_lifecycle(
        equity=hout.equity, trades=hout.trades, wins=hout.wins,
        losses=hout.losses, open_at_end=hout.open_at_end,
        max_dd=hout.max_dd)) and ok
    gh_stride = _gated_stride("heston", False)
    ugh = rng.uniform(
        1e-6, 1.0, (1, gh_stride * (w // 2), GATED_SUB, GATED_LANES),
    ).astype(np.float32)
    ghes = mc_paths_pallas_gated(
        0, lv3, params, num_paths=GATED_SUB * GATED_LANES, num_bars=w,
        lanes=GATED_LANES, dt=DT, sampler="heston", heston=HPARAMS,
        interpret=interp, external_uniforms=ugh)
    ghbars, ghtie = _gated_bars_from_heston_uniforms(ugh[0], hp, w,
                                                     GATED_LANES)
    ok = _judge("gated-heston", ghes,
                _xla_stats(ghbars, ghtie, lv3, params)) and ok
    gsw = mc_paths_pallas_gated_sweep(
        0, lv3, params, stop_g, np.array([0.15, 0.25], np.float32),
        num_paths=GATED_SUB * GATED_LANES, num_bars=w, sampler="bootstrap",
        hist_bars=hist, interpret=interp, external_uniforms=ug)
    ugu = rng.uniform(
        1e-6, 1.0, (2, 1, gb * (w // 2), GATED_SUB, GATED_LANES),
    ).astype(np.float32)
    gun = mc_paths_pallas_gated_universe(
        0, lv2, pars, s0v, sgv, paths_per_symbol=GATED_SUB * GATED_LANES,
        num_bars=w, sampler="bootstrap", hist_bars=hist2, interpret=interp,
        external_uniforms=ugu)
    for g, (sg, tg) in enumerate([(0.18, 0.15), (0.32, 0.25)]):
        single = mc_paths_pallas_gated(
            0, lv3, params.replace(stop_padding=sg, tp_padding=tg),
            num_paths=GATED_SUB * GATED_LANES, num_bars=w, lanes=GATED_LANES,
            sampler="bootstrap", hist_bars=hist, interpret=interp,
            external_uniforms=ug)
        ok = _judge(f"gated-sweep-bootstrap[{g}]", _slice_stats(gsw, g),
                    single) and ok
    for s in range(2):
        lv_s = jax.tree_util.tree_map(lambda x: x[s], lv2)
        h_s = jax.tree_util.tree_map(lambda x: x[s], hist2)
        single = mc_paths_pallas_gated(
            0, lv_s, EngineParams.default(stop_padding=[0.20, 0.30][s]),
            num_paths=GATED_SUB * GATED_LANES, num_bars=w, s0=float(s0v[s]),
            sigma=float(sgv[s]), lanes=GATED_LANES, sampler="bootstrap",
            hist_bars=h_s, interpret=interp, external_uniforms=ugu[s])
        ok = _judge(f"gated-universe-bootstrap[{s}]", _slice_stats(gun, s),
                    single) and ok

    # ---- first-contact family ----
    uf = rng.uniform(1e-6, 1.0, (2, 1, w + 1, LANES)).astype(np.float32)
    hists_fc = [_history(41, 200), _history(43, 200)]
    from qmmx_monolithic_monte_carlo_tpu.ops.pathgen import PathBars

    hist2_fc = PathBars(*[jnp.stack([jnp.asarray(getattr(h, f))
                                     for h in hists_fc])
                          for f in PathBars._fields])
    fun = mc_paths_pallas_universe(
        0, lv2, EngineParams.default(), s0v, sgv, paths_per_symbol=LANES,
        num_bars=w, dt=DT, sampler="bootstrap", hist_bars=hist2_fc,
        interpret=interp, external_uniforms=uf)
    for s in range(2):
        lv_s = jax.tree_util.tree_map(lambda x: x[s], lv2)
        single = mc_paths_pallas(
            0, lv_s, EngineParams.default(), num_paths=LANES, num_bars=w,
            lanes=LANES, s0=float(s0v[s]), sigma=float(sgv[s]), dt=DT,
            sampler="bootstrap", hist_bars=hists_fc[s], interpret=interp,
            external_uniforms=uf[s])
        ok = _judge(f"fc-universe-bootstrap[{s}]", _slice_stats(fun, s),
                    single, counts=("n", "n_entered", "n_tp", "n_stop",
                                    "n_open")) and ok
    if not interp:
        # PRNG-only sweep kernel: same seed + same draw order == the single
        # kernel's stream, so rows must match single runs bitwise on-chip
        fsw = mc_paths_pallas_sweep(
            7, lv3, EngineParams.default(), stop_g, [0.15, 0.25],
            num_paths=LANES, num_bars=w, sigma=SIGMA, dt=DT,
            sampler="bootstrap", hist_bars=hist)
        for g, (sg, tg) in enumerate([(float(stop_g[0]), 0.15),
                                      (float(stop_g[1]), 0.25)]):
            single = mc_paths_pallas(
                7, lv3, EngineParams.default().replace(
                    stop_padding=sg, tp_padding=tg),
                num_paths=LANES, num_bars=w, lanes=LANES, sigma=SIGMA, dt=DT,
                sampler="bootstrap", hist_bars=hist)
            ok = _judge(f"fc-sweep-bootstrap[{g}]", _slice_stats(fsw, g),
                        single, counts=("n", "n_entered", "n_tp", "n_stop",
                                        "n_open")) and ok

    # first-contact heston (`_heston_block`): universe vs single on the same
    # injected uniforms, and the PRNG-only sweep vs single runs (identical
    # draw order u1, u2, uq1, uq2, u3, u4, tie)
    from tests.test_pallas_mc import HPARAMS as FC_HPARAMS

    ufh = rng.uniform(1e-6, 1.0, (2, 1, 4 * w + 1, LANES)).astype(np.float32)
    fhun = mc_paths_pallas_universe(
        0, lv2, EngineParams.default(), s0v, sgv, paths_per_symbol=LANES,
        num_bars=w, dt=DT, sampler="heston", heston=FC_HPARAMS,
        interpret=interp, external_uniforms=ufh)
    for s in range(2):
        lv_s = jax.tree_util.tree_map(lambda x: x[s], lv2)
        single = mc_paths_pallas(
            0, lv_s, EngineParams.default(), num_paths=LANES, num_bars=w,
            lanes=LANES, s0=float(s0v[s]), dt=DT, sampler="heston",
            heston=FC_HPARAMS, interpret=interp, external_uniforms=ufh[s])
        ok = _judge(f"fc-universe-heston[{s}]", _slice_stats(fhun, s),
                    single, counts=("n", "n_entered", "n_tp", "n_stop",
                                    "n_open")) and ok
    if not interp:
        fhsw = mc_paths_pallas_sweep(
            9, lv3, EngineParams.default(), stop_g, [0.15, 0.25],
            num_paths=LANES, num_bars=w, dt=DT, sampler="heston",
            heston=FC_HPARAMS)
        for g, (sg, tg) in enumerate([(float(stop_g[0]), 0.15),
                                      (float(stop_g[1]), 0.25)]):
            single = mc_paths_pallas(
                9, lv3, EngineParams.default().replace(
                    stop_padding=sg, tp_padding=tg),
                num_paths=LANES, num_bars=w, lanes=LANES, dt=DT,
                sampler="heston", heston=FC_HPARAMS)
            ok = _judge(f"fc-sweep-heston[{g}]", _slice_stats(fhsw, g),
                        single, counts=("n", "n_entered", "n_tp", "n_stop",
                                        "n_open")) and ok
    return ok


def check_corr():
    """Round-4c: the correlated gated-universe kernel
    (mc_paths_pallas_gated_corr — symbol-inner grid, shared market ref,
    portfolio scratch) vs the XLA portfolio pipeline from the SAME injected
    uniforms: per-symbol counts/hist exact, portfolio counts/hist exact,
    sums to f32 ulps."""
    import os

    import jax

    from qmmx_monolithic_monte_carlo_tpu.ops.pallas_mc import (
        GATED_SUB,
        mc_paths_pallas_gated_corr,
    )
    from qmmx_monolithic_monte_carlo_tpu.parallel import universe as U
    from qmmx_monolithic_monte_carlo_tpu.sim.gatedpath import (
        GateConfig,
        gated_path_replay,
    )
    from qmmx_monolithic_monte_carlo_tpu.sim.pathsim import PathStats as _PS

    interp = bool(int(os.environ.get("QMMX_EXACT_INTERPRET", "0")))
    # 8192 paths/symbol like check_gated: the count tolerance is relative,
    # and the residual Mosaic-vs-XLA transcendental flip rate (~0.1%) needs
    # the larger sample to sit inside COUNT_REL_TOL
    w, lanes = 16, 256 if interp else 1024

    def _corr_bars_jnp(u, um, beta, s0, sigma):
        """jnp mirror of the corr kernel's bar construction (device
        transcendentals — the numpy mirror in tests/test_portfolio.py is
        host libm, whose ulps vs Mosaic flip ~0.9% of decisions; XLA on the
        same chip is the right oracle for the hardware pin)."""
        drift = jnp.float32((0.0 - 0.5 * sigma * sigma) * DT)
        sig = jnp.float32(sigma * np.sqrt(DT))
        sig2dt = sig * sig
        perp = jnp.float32(np.sqrt(max(0.0, 1.0 - beta * beta)))
        beta = jnp.float32(beta)
        log_s = jnp.full((GATED_SUB, lanes), jnp.float32(np.log(s0)))
        opens, closes, highs, lows, ties = [], [], [], [], []
        for t2 in range(w // 2):
            blk = lambda k: jnp.asarray(u[8 * t2 + k], jnp.float32)
            mblk = lambda k: jnp.asarray(um[2 * t2 + k], jnp.float32)
            mrad = jnp.sqrt(-2.0 * jnp.log(mblk(0)))
            mang = 6.283185307179586 * mblk(1)
            zm = (mrad * jnp.cos(mang), mrad * jnp.sin(mang))
            rad = jnp.sqrt(-2.0 * jnp.log(blk(0)))
            ang = 6.283185307179586 * blk(1)
            ze = (rad * jnp.cos(ang), rad * jnp.sin(ang))
            for half in range(2):
                z = beta * zm[half] + perp * ze[half]
                u3 = blk(2 + 3 * half)
                u4 = blk(3 + 3 * half)
                tie = blk(4 + 3 * half)
                log_open = log_s
                log_close = log_s + (drift + sig * z)
                d2 = (log_close - log_open) ** 2
                highs.append(jnp.exp(0.5 * (
                    log_open + log_close
                    + jnp.sqrt(d2 - 2.0 * sig2dt * jnp.log(u3)))))
                lows.append(jnp.exp(0.5 * (
                    log_open + log_close
                    - jnp.sqrt(d2 - 2.0 * sig2dt * jnp.log(u4)))))
                opens.append(jnp.exp(log_open))
                closes.append(jnp.exp(log_close))
                ties.append(tie)
                log_s = log_close
        n = GATED_SUB * lanes
        flat = lambda rows: jnp.stack(rows, axis=-1).reshape(n, w)
        return PathBars(open=flat(opens), high=flat(highs), low=flat(lows),
                        close=flat(closes),
                        volume=jnp.zeros((n, w), jnp.float32)), flat(ties)

    lv2 = U.stack_levels([
        [{"color": "blue", "type": "solid", "index": 0, "price": 100.0}],
        [{"color": "orange", "type": "dashed", "index": 0, "price": 50.2}],
    ], max_levels=4)
    s0 = np.array([100.0, 50.0], np.float32)
    sg = np.array([0.3, 0.4], np.float32)
    beta = np.array([0.8, 0.6], np.float32)
    wts = np.array([0.5, 0.5], np.float32)
    params = EngineParams.default()
    rng = np.random.default_rng(19)
    u = rng.uniform(1e-6, 1.0, (2, 1, 8 * (w // 2), GATED_SUB, lanes)
                    ).astype(np.float32)
    um = rng.uniform(1e-6, 1.0, (1, 2 * (w // 2), GATED_SUB, lanes)
                     ).astype(np.float32)
    sym, port = mc_paths_pallas_gated_corr(
        0, lv2, params, s0, sg, beta, wts,
        paths_per_symbol=GATED_SUB * lanes, num_bars=w, lanes=lanes,
        interpret=interp, external_uniforms=u, market_uniforms=um)

    gate = GateConfig.from_params(params)
    n = GATED_SUB * lanes
    port_curve = jnp.zeros((w, n), jnp.float32)
    tr = jnp.zeros((n,), jnp.int32)
    wi, lo = tr, tr
    opn = jnp.zeros((n,), bool)
    ok = True
    for s in range(2):
        lv_s = jax.tree_util.tree_map(lambda x: x[s], lv2)
        bars, tie = _corr_bars_jnp(
            u[s, 0], um[0], float(beta[s]), float(s0[s]), float(sg[s]))
        out, curve = gated_path_replay(bars, lv_s, params, gate, tie,
                                       return_curve=True)
        stats = _PS.from_lifecycle(
            equity=out.equity, trades=out.trades, wins=out.wins,
            losses=out.losses, open_at_end=out.open_at_end,
            max_dd=out.max_dd)
        ok = _judge(f"gated-corr[{s}]", _slice_stats(sym, s), stats) and ok
        port_curve = port_curve + wts[s] * curve
        tr = tr + out.trades
        wi = wi + out.wins
        lo = lo + out.losses
        opn = jnp.logical_or(opn, out.open_at_end)
    final = port_curve[-1]
    peak = jax.lax.cummax(jnp.maximum(port_curve, 0.0), axis=0)
    pdd = jnp.max(peak - port_curve, axis=0)
    pstats = _PS.from_lifecycle(equity=final, trades=tr, wins=wi, losses=lo,
                                open_at_end=opn, max_dd=pdd)
    ok = _judge("gated-corr-portfolio", port, pstats) and ok
    return ok


def check_engine_corr():
    """Round-4d: the correlated FULL-ENGINE universe kernel
    (mc_paths_pallas_engine_corr — symbol-inner grid, shared market ref,
    book curve scratch) vs sim/enginepath + the book combine from the SAME
    injected uniforms (jnp mirror → XLA on the same chip)."""
    import os

    import jax

    from qmmx_monolithic_monte_carlo_tpu.ops.pallas_engine import (
        ENGINE_SUB,
        mc_paths_pallas_engine_corr,
    )
    from qmmx_monolithic_monte_carlo_tpu.parallel import universe as U
    from qmmx_monolithic_monte_carlo_tpu.sim.enginepath import (
        engine_path_replay,
    )
    from qmmx_monolithic_monte_carlo_tpu.sim.pathsim import PathStats as _PS
    from tests.test_pallas_engine import _bars_from_uniforms as mk_bars

    interp = bool(int(os.environ.get("QMMX_EXACT_INTERPRET", "0")))
    w, lanes = 16, 256
    n = ENGINE_SUB * lanes
    lv2 = U.stack_levels([
        [{"color": "blue", "type": "solid", "index": 0, "price": 100.0}],
        [{"color": "orange", "type": "dashed", "index": 0, "price": 50.2}],
    ], max_levels=4)
    s0 = np.array([100.0, 50.0], np.float32)
    sg = np.array([0.3, 0.4], np.float32)
    beta = np.array([0.8, 0.6], np.float32)
    wts = np.array([0.5, 0.5], np.float32)
    params = EngineParams.default()
    rng = np.random.default_rng(29)
    u = rng.uniform(1e-6, 1.0, (2, 1, 10 * (w // 2), ENGINE_SUB, lanes)
                    ).astype(np.float32)
    um = rng.uniform(1e-6, 1.0, (1, 2 * (w // 2), ENGINE_SUB, lanes)
                     ).astype(np.float32)
    sym, port, skips, escal, hv = mc_paths_pallas_engine_corr(
        0, lv2, params, s0, sg, beta, wts,
        paths_per_symbol=n, num_bars=w, lanes=lanes, harvest=True,
        interpret=interp, external_uniforms=u, market_uniforms=um)

    port_curve = jnp.zeros((w, n), jnp.float32)
    tr = jnp.zeros((n,), jnp.int32)
    wi, lo = tr, tr
    opn = jnp.zeros((n,), bool)
    ok = True
    for s in range(2):
        lv_s = jax.tree_util.tree_map(lambda x: x[s], lv2)
        bars, tie = mk_bars(u[s, 0], float(sg[s]), lanes=lanes, w=w,
                            s0=float(s0[s]), um=um[0], beta=float(beta[s]))
        out, curve = engine_path_replay(bars, lv_s, params, tie,
                                        harvest=True, return_curve=True)
        stats = _PS.from_lifecycle(
            equity=out.equity, trades=out.trades, wins=out.wins,
            losses=out.losses, open_at_end=out.open_at_end,
            max_dd=out.max_dd)
        skips_diff = float(np.abs(np.asarray(skips[s])
                                  - np.asarray(out.skip_counts)).sum())
        skips_tot = float(np.asarray(out.skip_counts).sum())
        hv_diff = float(np.abs(
            np.asarray(hv.ml_counts[s]) - np.asarray(out.harvest.ml_counts)
        ).sum())
        ok = _judge(f"engine-corr[{s}]", _slice_stats(sym, s), stats, extra={
            "escalations": [float(escal[s]), float(jnp.sum(out.escalations))],
            "skip_table_l1_frac": skips_diff / max(skips_tot, 1.0),
            "harvest_labeled": [float(hv.n_labeled[s]),
                                float(out.harvest.n_labeled)],
            "harvest_l1_frac": hv_diff / max(
                float(out.harvest.n_labeled), 1.0),
        }) and ok
        ok = ok and (hv_diff / max(float(out.harvest.n_labeled), 1.0)
                     <= HIST_L1_TOL)
        port_curve = port_curve + wts[s] * curve
        tr = tr + out.trades
        wi = wi + out.wins
        lo = lo + out.losses
        opn = jnp.logical_or(opn, out.open_at_end)
    final = port_curve[-1]
    peak = jax.lax.cummax(jnp.maximum(port_curve, 0.0), axis=0)
    pdd = jnp.max(peak - port_curve, axis=0)
    pstats = _PS.from_lifecycle(equity=final, trades=tr, wins=wi, losses=lo,
                                open_at_end=opn, max_dd=pdd)
    ok = _judge("engine-corr-portfolio", port, pstats) and ok
    return ok


def check_corr_samplers():
    """Round-4f: samplers through the correlated-book FULL-ENGINE kernel —
    bootstrap / block_bootstrap (JOINT recorded days: shared market
    resample indices over each symbol's OWN history) and heston (price AND
    variance shocks beta-mixed with the market factor) vs per-symbol
    sim/enginepath replays + the book combine from the SAME uniforms."""
    import os

    import jax

    from qmmx_monolithic_monte_carlo_tpu.ops.pallas_engine import (
        BOOT_DRAWS_PER_PAIR,
        ENGINE_SUB,
        HESTON_DRAWS_PER_PAIR,
        _heston_tuple,
        mc_paths_pallas_engine_corr,
    )
    from qmmx_monolithic_monte_carlo_tpu.parallel import universe as U
    from qmmx_monolithic_monte_carlo_tpu.sim.enginepath import (
        engine_path_replay,
    )
    from qmmx_monolithic_monte_carlo_tpu.sim.pathsim import PathStats as _PS
    from tests.test_corr_samplers import (
        HPARAMS,
        _corr_boot_bars,
        _corr_heston_bars,
    )
    from tests.test_engine_bootstrap import _stacked_histories

    interp = bool(int(os.environ.get("QMMX_EXACT_INTERPRET", "0")))
    w, lanes = 16, 256
    n = ENGINE_SUB * lanes
    dt = 1.0 / (390.0 * 252.0)
    lv2 = U.stack_levels([
        [{"color": "blue", "type": "solid", "index": 0, "price": 100.0}],
        [{"color": "orange", "type": "dashed", "index": 0, "price": 50.2}],
    ], max_levels=4)
    s0 = np.array([100.0, 50.0], np.float32)
    sg = np.array([0.3, 0.4], np.float32)
    beta = np.array([0.8, 0.6], np.float32)
    wts = np.array([0.5, 0.5], np.float32)
    params = EngineParams.default(stop_padding=0.25, tp_padding=0.18)
    hist2 = _stacked_histories([11, 23], 180)
    hp = _heston_tuple(HPARAMS, 0.0, dt)
    rng = np.random.default_rng(67)
    ok = True
    for mode in ("bootstrap", "block_bootstrap", "heston"):
        boot = mode != "heston"
        stride = BOOT_DRAWS_PER_PAIR if boot else HESTON_DRAWS_PER_PAIR
        m_rows = 2 if boot else 4
        u = rng.uniform(1e-6, 1.0, (2, 1, stride * (w // 2), ENGINE_SUB,
                                    lanes)).astype(np.float32)
        um = rng.uniform(1e-6, 1.0, (1, m_rows * (w // 2), ENGINE_SUB,
                                     lanes)).astype(np.float32)
        kw = (dict(sampler=mode, hist_bars=hist2,
                   block_len=4 if mode == "block_bootstrap" else 10)
              if boot else dict(sampler="heston", heston=HPARAMS))
        sym, port, skips, escal = mc_paths_pallas_engine_corr(
            0, lv2, params, s0, sg, beta, wts,
            paths_per_symbol=n, num_bars=w, lanes=lanes, dt=dt,
            interpret=interp, external_uniforms=u, market_uniforms=um, **kw)
        port_curve = jnp.zeros((w, n), jnp.float32)
        tr = jnp.zeros((n,), jnp.int32)
        wi, lo = tr, tr
        opn = jnp.zeros((n,), bool)
        for s in range(2):
            lv_s = jax.tree_util.tree_map(lambda x: x[s], lv2)
            if boot:
                hist_s = jax.tree_util.tree_map(lambda x: x[s], hist2)
                bars, tie = _corr_boot_bars(
                    u[s, 0], um[0], hist_s, w, lanes, float(s0[s]),
                    block_len=4 if mode == "block_bootstrap" else None)
            else:
                bars, tie = _corr_heston_bars(
                    u[s, 0], um[0], hp, float(beta[s]), w, lanes,
                    s0=float(s0[s]))
            out, curve = engine_path_replay(bars, lv_s, params, tie,
                                            return_curve=True)
            stats = _PS.from_lifecycle(
                equity=out.equity, trades=out.trades, wins=out.wins,
                losses=out.losses, open_at_end=out.open_at_end,
                max_dd=out.max_dd)
            skips_diff = float(np.abs(np.asarray(skips[s])
                                      - np.asarray(out.skip_counts)).sum())
            ok = _judge(f"corr-{mode}[{s}]", _slice_stats(sym, s), stats,
                        extra={
                "escalations": [float(escal[s]),
                                float(jnp.sum(out.escalations))],
                "skip_table_l1_frac": skips_diff / max(
                    float(np.asarray(out.skip_counts).sum()), 1.0),
            }) and ok
            port_curve = port_curve + wts[s] * curve
            tr = tr + out.trades
            wi = wi + out.wins
            lo = lo + out.losses
            opn = jnp.logical_or(opn, out.open_at_end)
        final = port_curve[-1]
        peak = jax.lax.cummax(jnp.maximum(port_curve, 0.0), axis=0)
        pdd = jnp.max(peak - port_curve, axis=0)
        pstats = _PS.from_lifecycle(equity=final, trades=tr, wins=wi,
                                    losses=lo, open_at_end=opn, max_dd=pdd)
        ok = _judge(f"corr-{mode}-portfolio", port, pstats) and ok

    # ---- gated corr kernel cells (the fast book path) ----
    from qmmx_monolithic_monte_carlo_tpu.ops.pallas_mc import (
        GATED_SUB,
        _gated_stride,
        _heston_tuple as _gt_heston_tuple,
        mc_paths_pallas_gated_corr,
    )
    from qmmx_monolithic_monte_carlo_tpu.sim.gatedpath import (
        GateConfig,
        gated_path_replay,
    )
    from tests.test_corr_samplers import (
        _gated_corr_boot_bars,
        _gated_corr_heston_bars,
    )

    gate = GateConfig.from_params(params)
    ghp = _gt_heston_tuple(HPARAMS, 0.0, dt)
    ng = GATED_SUB * lanes
    for mode in ("bootstrap", "heston"):
        boot = mode == "bootstrap"
        stride = _gated_stride(mode, False)
        m_rows = 2 if boot else 4
        u = rng.uniform(1e-6, 1.0, (2, 1, stride * (w // 2), GATED_SUB,
                                    lanes)).astype(np.float32)
        um = rng.uniform(1e-6, 1.0, (1, m_rows * (w // 2), GATED_SUB,
                                     lanes)).astype(np.float32)
        kw = (dict(sampler="bootstrap", hist_bars=hist2)
              if boot else dict(sampler="heston", heston=HPARAMS))
        sym, port = mc_paths_pallas_gated_corr(
            0, lv2, params, s0, sg, beta, wts,
            paths_per_symbol=ng, num_bars=w, lanes=lanes, dt=dt,
            interpret=interp, external_uniforms=u, market_uniforms=um, **kw)
        port_curve = jnp.zeros((w, ng), jnp.float32)
        tr = jnp.zeros((ng,), jnp.int32)
        wi, lo = tr, tr
        opn = jnp.zeros((ng,), bool)
        for s in range(2):
            lv_s = jax.tree_util.tree_map(lambda x: x[s], lv2)
            if boot:
                hist_s = jax.tree_util.tree_map(lambda x: x[s], hist2)
                bars, tie = _gated_corr_boot_bars(
                    u[s, 0], um[0], hist_s, w, lanes, float(s0[s]))
            else:
                bars, tie = _gated_corr_heston_bars(
                    u[s, 0], um[0], ghp, float(beta[s]), w, lanes,
                    s0=float(s0[s]))
            out, curve = gated_path_replay(bars, lv_s, params, gate, tie,
                                           return_curve=True)
            stats = _PS.from_lifecycle(
                equity=out.equity, trades=out.trades, wins=out.wins,
                losses=out.losses, open_at_end=out.open_at_end,
                max_dd=out.max_dd)
            ok = _judge(f"gated-corr-{mode}[{s}]", _slice_stats(sym, s),
                        stats) and ok
            port_curve = port_curve + wts[s] * curve
            tr = tr + out.trades
            wi = wi + out.wins
            lo = lo + out.losses
            opn = jnp.logical_or(opn, out.open_at_end)
        final = port_curve[-1]
        peak = jax.lax.cummax(jnp.maximum(port_curve, 0.0), axis=0)
        pdd = jnp.max(peak - port_curve, axis=0)
        pstats = _PS.from_lifecycle(equity=final, trades=tr, wins=wi,
                                    losses=lo, open_at_end=opn, max_dd=pdd)
        ok = _judge(f"gated-corr-{mode}-portfolio", port, pstats) and ok
    return ok


def check_corr_offset():
    """Round-4d: block-offset seeding of the corr kernels — ONE 2-block
    launch must equal TWO 1-block launches at offsets {0, 1} merged (the
    single-chip proof that sharded book runs are bitwise independent of the
    mesh shape: parallel/mesh.sharded_mc_paths_pallas_corr passes device
    d's global starting block as the offset).  Hardware-PRNG path only
    (prng_seed cannot lower on CPU)."""
    import jax

    from qmmx_monolithic_monte_carlo_tpu.ops.pallas_engine import (
        ENGINE_SUB,
        mc_paths_pallas_engine_corr,
    )
    from qmmx_monolithic_monte_carlo_tpu.ops.pallas_mc import (
        GATED_SUB,
        mc_paths_pallas_gated_corr,
    )
    from qmmx_monolithic_monte_carlo_tpu.parallel import universe as U

    if jax.devices()[0].platform == "cpu":
        print('{"kernel": "corr-offset", "skipped": "needs TPU PRNG"}')
        return True

    lv2 = U.stack_levels([
        [{"color": "blue", "type": "solid", "index": 0, "price": 100.0}],
        [{"color": "orange", "type": "dashed", "index": 0, "price": 50.2}],
    ], max_levels=4)
    s0 = np.array([100.0, 50.0], np.float32)
    sg = np.array([0.3, 0.4], np.float32)
    beta = np.array([0.8, 0.6], np.float32)
    wts = np.array([0.5, 0.5], np.float32)
    params = EngineParams.default()
    ok = True
    for name, fn, sub, lanes in (
        ("gated", mc_paths_pallas_gated_corr, GATED_SUB, 1024),
        ("engine", mc_paths_pallas_engine_corr, ENGINE_SUB, 256),
    ):
        block = sub * lanes
        full = fn(5, lv2, params, s0, sg, beta, wts,
                  paths_per_symbol=2 * block, num_bars=16, lanes=lanes)
        p0 = fn(5, lv2, params, s0, sg, beta, wts,
                paths_per_symbol=block, num_bars=16, lanes=lanes,
                block_offset=0)
        p1 = fn(5, lv2, params, s0, sg, beta, wts,
                paths_per_symbol=block, num_bars=16, lanes=lanes,
                block_offset=1)
        f_sym, f_port = full[0], full[1]
        m_sym = p0[0].merge(p1[0])
        m_port = p0[1].merge(p1[1])
        for s in range(2):
            ok = _judge(f"corr-offset-{name}[{s}]", _slice_stats(f_sym, s),
                        _slice_stats(m_sym, s)) and ok
        ok = _judge(f"corr-offset-{name}-portfolio", f_port, m_port) and ok
    return ok


def main(only=None):
    import jax

    dev = jax.devices()[0]
    if dev.platform == "cpu":
        print("# WARNING: no TPU visible — this run does NOT pin Mosaic",
              file=sys.stderr)
    print(f"# device={dev.device_kind} mosaic={dev.platform != 'cpu'}",
          file=sys.stderr)
    checks = {
        "gated": check_gated,
        "engine": check_engine,
        "engine_noise": check_engine_noise,
        "envelope": check_envelope,
        "bootstrap": check_bootstrap,
        "corr": check_corr,
        "engine_corr": check_engine_corr,
        "corr_samplers": check_corr_samplers,
        "corr_offset": check_corr_offset,
    }
    ok = True
    for name, fn in checks.items():
        if only and name not in only:
            continue
        ok = fn() and ok
    return 0 if ok else 1


if __name__ == "__main__":
    only = set(sys.argv[1:]) or None
    for attempt in range(3):
        try:
            sys.exit(main(only))
        except SystemExit:
            raise
        except Exception as e:  # noqa: BLE001
            if attempt == 2:
                raise
            print(f"# attempt {attempt + 1} failed ({e}); retrying",
                  file=sys.stderr)
            time.sleep(10)
