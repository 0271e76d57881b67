#!/usr/bin/env python3
"""Full-engine fused-kernel throughput on the real chip + lane sweep.

Measures ``mc_paths_pallas_engine`` (the complete 12-gate ladder + guard +
touch memory + escalation + in-loop volume model, all on-chip) against the
XLA pipeline ``sim/enginepath.mc_paths_engine``, and sweeps the state-tile
lane width.  Prints one JSON row per measurement.

Run: python benchmarks/engine_kernel_bench.py [--paths LOG2] [--bars N]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from qmmx_monolithic_monte_carlo_tpu.config import EngineParams
from qmmx_monolithic_monte_carlo_tpu.ops.pallas_engine import mc_paths_pallas_engine
from qmmx_monolithic_monte_carlo_tpu.types import Levels

LEVELS = Levels.from_rows(
    [
        {"color": "blue", "type": "solid", "index": 0, "price": 100.0},
        {"color": "orange", "type": "dashed", "index": 0, "price": 100.4},
    ],
    max_levels=8,
)


def _levels_n(n):
    if n <= 2:
        return LEVELS
    colors = ("blue", "orange", "black", "teal")
    rows = [{"color": colors[i % 4],
             "type": "solid" if (i // 4) % 2 == 0 else "dashed",
             "index": i // 8, "price": 100.0 + (i - n // 2) * 0.12}
            for i in range(n)]
    return Levels.from_rows(rows, max_levels=n)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--paths", type=int, default=24, help="log2 total paths")
    ap.add_argument("--bars", type=int, default=40)
    ap.add_argument("--lanes", type=int, nargs="+", default=[256, 512, 1024])
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--levels", type=int, default=2,
                    help="level-slot count (cost-curve runs: 8/16/30)")
    ap.add_argument("--sampler", default="gbm",
                    choices=["gbm", "bootstrap", "block_bootstrap",
                             "heston"])
    ap.add_argument("--block-len", type=int, default=10)
    ap.add_argument("--hist", type=int, default=390,
                    help="bootstrap history length (bars)")
    ap.add_argument("--harvest", action="store_true",
                    help="collect flywheel label stats on-chip")
    ap.add_argument("--stage-split", action="store_true",
                    help="also time the generation-only kernel (gen_only) — "
                         "the roofline split: full-vs-generate gap = state-"
                         "machine cost")
    ap.add_argument("--xla", action="store_true",
                    help="also time sim/enginepath.mc_paths_engine")
    args = ap.parse_args()

    params = EngineParams.default()
    num_paths = 1 << args.paths
    levels = _levels_n(args.levels)
    dev = jax.devices()[0]
    print(f"# device={dev.device_kind} paths=2^{args.paths} bars={args.bars} "
          f"levels={args.levels} sampler={args.sampler}", file=sys.stderr)
    hist = None
    if args.sampler in ("bootstrap", "block_bootstrap"):
        import numpy as np

        from qmmx_monolithic_monte_carlo_tpu.ops.pathgen import PathBars

        rng = np.random.default_rng(0)
        h = args.hist
        steps = rng.normal(0, 0.1, h).astype(np.float32)
        c = np.float32(100.0) + np.cumsum(steps, dtype=np.float32)
        o = np.concatenate([[np.float32(100.0)], c[:-1]])
        hist = PathBars(
            open=o, close=c,
            high=np.maximum(o, c) + rng.uniform(0, 0.1, h).astype(np.float32),
            low=np.minimum(o, c) - rng.uniform(0, 0.1, h).astype(np.float32),
            volume=rng.lognormal(13.0, 0.4, h).astype(np.float32))

    for lanes in args.lanes:
        modes = ([("full", {}), ("gen", {"gen_only": True}),
                  ("no_d", {"skip_d": True}), ("nofold", {"no_fold": True})]
                 if args.stage_split else [("full", {})])
        for mode, mkw in modes:
            gen_only = mode == "gen"

            def run(seed):
                return mc_paths_pallas_engine(
                    seed, levels, params, num_paths=num_paths,
                    num_bars=args.bars, sigma=0.3,
                    dt=1.0 / (390.0 * 252.0), lanes=lanes,
                    sampler=args.sampler, hist_bars=hist,
                    block_len=args.block_len,
                    heston=(dict(v0=0.09, xi=0.9)
                            if args.sampler == "heston" else None),
                    harvest=args.harvest, **mkw,
                )

            res = run(0)
            stats = res[0]
            float(stats.sum_r)
            t0 = time.perf_counter()
            for k in range(1, args.reps + 1):
                res = run(k)
                stats = res[0]
                float(stats.sum_r)
            dt_s = (time.perf_counter() - t0) / args.reps
            row = {
                "backend": "pallas", "lanes": lanes, "levels": args.levels,
                "bars": args.bars, "sampler": args.sampler,
                "mode": mode, "harvest": args.harvest,
                "paths_per_sec": round(num_paths / dt_s, 1),
                "bar_steps_per_sec": round(num_paths * args.bars / dt_s, 1),
                "time_s": round(dt_s, 4),
            }
            if mode == "full":
                row.update(hit_rate=round(float(stats.hit_rate), 4),
                           mean_trades=round(float(stats.mean_trades), 4),
                           escalations=int(res[2]))
                if args.harvest:
                    row["labeled"] = float(res[3].n_labeled)
            print(json.dumps(row))

    if args.xla:
        from qmmx_monolithic_monte_carlo_tpu.sim.enginepath import mc_paths_engine

        n_xla = min(num_paths, 1 << 21)

        def run_xla(seed):
            return mc_paths_engine(
                jax.random.key(seed), LEVELS, params, num_paths=n_xla,
                num_bars=args.bars, sigma=0.3, block_paths=1 << 13,
            )

        stats, skips, escal = run_xla(0)
        float(stats.sum_r)
        t0 = time.perf_counter()
        for k in range(1, args.reps + 1):
            stats, skips, escal = run_xla(k)
            float(stats.sum_r)
        dt_s = (time.perf_counter() - t0) / args.reps
        print(json.dumps({
            "backend": "xla", "paths_per_sec": round(n_xla / dt_s, 1),
            "time_s": round(dt_s, 4),
            "hit_rate": round(float(stats.hit_rate), 4),
            "mean_trades": round(float(stats.mean_trades), 4),
        }))


if __name__ == "__main__":
    for attempt in range(3):
        try:
            main()
            break
        except Exception as e:  # noqa: BLE001
            if attempt == 2:
                raise
            print(f"# attempt {attempt + 1} failed ({e}); retrying",
                  file=sys.stderr)
            time.sleep(10)
