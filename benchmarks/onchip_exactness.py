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
