#!/usr/bin/env python3
"""Where does ``sim/enginepath.mc_paths_engine`` (the XLA fallback, VERDICT r3
weak #2) spend its time?

ROADMAP round-5 item 2 guesses the pipeline is HBM-bound on carried state
(~8 KB/path of guard/touch rings vs the kernel's ~430 B).  This study
measures that: each variant monkeypatches ONE stage into an identity at
trace time, letting XLA dead-code-eliminate that stage's carried state and
compute — an upper bound on what a real state diet of that stage can win.
All variants are traced into their OWN jit objects so reps interleave
round-robin in one process (the shared axon chip drifts ~1.9x across
processes — CLAUDE.md).

Variants:
  full       baseline pipeline (lean guard after the round-4 state diet)
  old_guard  restore the pre-diet RegularGuardState/guard_push in-process
             (4x64-slot rings + [P,64] masked window reductions per bar)
  no_guard   lean_guard_push -> identity (remaining guard cost DCE'd)
  no_touch   R.touch_register -> identity (tap rings + per-level dedup DCE'd)
  no_skips   SKIP_REASONS -> 1 bucket (15 of 16 per-bar [P] reductions gone)
  no_esc     escalation=False (static flag: no per-bar escalation features)
  gen_floor  engine_path_replay -> trivial reduce (generation + harness only)
  full_b15/b16  the full pipeline at 32k/64k-path blocks (the 8k optimum was
             measured under the old ~8 KB/path state)

First run (pre-diet, 2026-08-19, v5e, 2^19 paths x 40 bars): full 444k
paths/s; no_guard 1.89M (4.26x — guard_push was 76.5% of the pipeline);
no_touch 1.04x; no_rings 1.11x (the concats were cheap — the [P,64] masked
window REDUCTIONS were the cost); no_skips 1.01x; no_esc 1.03x; gen_floor
16.6M (37x).  That run motivated the lean guard.

Run: python benchmarks/xla_diet_bisect.py [--paths LOG2] [--bars N] [--reps R]
"""

import argparse
import contextlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from qmmx_monolithic_monte_carlo_tpu.config import EngineParams
from qmmx_monolithic_monte_carlo_tpu.ops import regular as R
from qmmx_monolithic_monte_carlo_tpu.sim import enginepath as EP
from qmmx_monolithic_monte_carlo_tpu.types import Levels

LEVELS = Levels.from_rows(
    [
        {"color": "blue", "type": "solid", "index": 0, "price": 100.0},
        {"color": "orange", "type": "dashed", "index": 0, "price": 100.4},
    ],
    max_levels=8,
)


@contextlib.contextmanager
def patched(*patches):
    """patches: (module, attr, replacement) applied for the trace only."""
    saved = [(m, a, getattr(m, a)) for m, a, _ in patches]
    try:
        for m, a, v in patches:
            setattr(m, a, v)
        yield
    finally:
        for m, a, v in saved:
            setattr(m, a, v)


def _fake_replay(paths, levels, params, tie_uniform, **kw):
    eq = jnp.sum(jnp.asarray(paths.close, jnp.float32)
                 * jnp.asarray(tie_uniform, jnp.float32), axis=1)
    p = eq.shape[0]
    zi = jnp.zeros((p,), jnp.int32)
    return EP.EngineLifecycleOutcome(
        equity=eq, trades=zi, wins=zi, losses=zi, open_at_end=zi > 0,
        max_dd=eq * 0.0, escalations=zi,
        skip_counts=jnp.zeros((len(EP.SKIP_REASONS),), jnp.float32),
        harvest=None)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--paths", type=int, default=19, help="log2 total paths")
    ap.add_argument("--bars", type=int, default=40)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--block", type=int, default=13, help="log2 block paths")
    args = ap.parse_args()

    params = EngineParams.default()
    n = 1 << args.paths
    dev = jax.devices()[0]
    print(f"# device={dev.device_kind} paths=2^{args.paths} bars={args.bars}",
          file=sys.stderr)

    def pipeline(key, escalation=True, block=None):
        return EP._mc_paths_engine_jit.__wrapped__(
            key, LEVELS, params, num_paths=n, num_bars=args.bars, sigma=0.3,
            block_paths=1 << (args.block if block is None else block),
            escalation=escalation)

    ident_guard = lambda st, params, **kw: st
    ident_touch = lambda st, params, levels, **kw: st

    def old_guard_push(st, params, *, bar_index, high, low, close, vol_ring):
        # pre-diet pipeline: slot 0 of the shared ring is this bar's volume
        return R.guard_push(st, params, bar_index=bar_index, high=high,
                            low=low, close=close, volume=vol_ring[:, 0])

    class _OldZeros:
        @staticmethod
        def zeros(p, *, windowed=False):
            return R.RegularGuardState.zeros(p)

    def no_fatigue(st, params, now_ms):
        import qmmx_monolithic_monte_carlo_tpu.ops.touch as T
        return jnp.full((st.count.shape[0],), T.EDGE_NONE, jnp.int32)

    def no_tallow(st, params, level_idx, side, now_ms):
        p = st.count.shape[0]
        return (jnp.ones((p,), bool), jnp.zeros((p,), bool),
                jnp.ones((p,), jnp.float32))

    def guard_fixed_mas(st, params, *, bar_index, high, low, close, vol_ring):
        # lean guard with the two masked [P,64] vol-MA sums replaced by
        # constants — isolates the sums' share of the lean guard's cost
        import qmmx_monolithic_monte_carlo_tpu.ops.regular as _R
        n = jnp.asarray(bar_index, jnp.int32) + 1
        n_win = jnp.minimum(n, _R.GUARD_WINDOW_BARS)
        run_low = jnp.minimum(st.run_low, jnp.asarray(low, jnp.float32))
        run_high = jnp.maximum(st.run_high, jnp.asarray(high, jnp.float32))
        ones = jnp.ones_like(run_low if run_low.ndim == 1 else run_low[:, 0])
        box_low, box_high, box_valid, regime, inside_count = _R._regime_update(
            params, price_now=jnp.asarray(close, jnp.float32),
            box_low_w=run_low if run_low.ndim == 1 else jnp.min(run_low, -1),
            box_high_w=run_high if run_high.ndim == 1 else jnp.max(run_high, -1),
            vol_ma_s=ones * 2.0, s_def=ones > 0, vol_ma_l=ones, l_def=ones > 0,
            n_win=n_win, box_low=st.box_low, box_high=st.box_high,
            box_valid=st.box_valid, regime=st.regime,
            inside_count=st.inside_count)
        return _R.LeanGuardState(
            run_low=run_low, run_high=run_high, box_low=box_low,
            box_high=box_high, box_valid=box_valid, regime=regime,
            inside_count=inside_count)

    variants = [
        ("full", (), dict()),
        ("old_guard", ((R, "lean_guard_push", old_guard_push),
                       (R, "LeanGuardState", _OldZeros)), dict()),
        ("no_guard", ((R, "lean_guard_push", ident_guard),), dict()),
        ("guard_fixed_mas", ((R, "lean_guard_push", guard_fixed_mas),), dict()),
        ("no_fatigue", ((R, "edge_fatigued", no_fatigue),), dict()),
        ("no_tallow", ((R, "touch_allow", no_tallow),), dict()),
        ("no_treg", ((R, "touch_register", ident_touch),), dict()),
        ("no_acc_reads", ((R, "edge_fatigued", no_fatigue),
                          (R, "touch_allow", no_tallow)), dict()),
        ("no_skips", ((EP, "SKIP_REASONS", EP.SKIP_REASONS[:1]),), dict()),
        ("no_esc", (), dict(escalation=False)),
        ("gen_floor", ((EP, "engine_path_replay", _fake_replay),), dict()),
    ]

    jfns = {}
    for name, patches, kw in variants:
        jfn = jax.jit(lambda key, _kw=kw: pipeline(key, **_kw))
        with patched(*patches):
            out = jfn(jax.random.key(0))      # traces + compiles HERE
            float(out[0].sum_r)
        jfns[name] = jfn
        print(f"# compiled {name}", file=sys.stderr)

    times = {name: [] for name, _, _ in variants}
    for rep in range(1, args.reps + 1):
        for name, _, _ in variants:
            t0 = time.perf_counter()
            out = jfns[name](jax.random.key(rep))
            float(out[0].sum_r)
            times[name].append(time.perf_counter() - t0)

    t_full = min(times["full"])
    for name, _, _ in variants:
        dt = min(times[name])
        print(json.dumps({
            "variant": name, "time_s": round(dt, 4),
            "paths_per_sec": round(n / dt, 1),
            "speedup_vs_full": round(t_full / dt, 3),
            "share_of_full": round(1.0 - dt / t_full, 3),
        }))


if __name__ == "__main__":
    main()
