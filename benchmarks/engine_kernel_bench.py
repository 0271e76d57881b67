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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--paths", type=int, default=24, help="log2 total paths")
    ap.add_argument("--bars", type=int, default=40)
    ap.add_argument("--lanes", type=int, nargs="+", default=[256, 512, 1024])
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--xla", action="store_true",
                    help="also time sim/enginepath.mc_paths_engine")
    args = ap.parse_args()

    params = EngineParams.default()
    num_paths = 1 << args.paths
    dev = jax.devices()[0]
    print(f"# device={dev.device_kind} paths=2^{args.paths} bars={args.bars}",
          file=sys.stderr)

    for lanes in args.lanes:
        def run(seed):
            return mc_paths_pallas_engine(
                seed, LEVELS, params, num_paths=num_paths, num_bars=args.bars,
                sigma=0.3, dt=1.0 / (390.0 * 252.0), lanes=lanes,
            )

        stats, skips, escal = run(0)
        float(stats.sum_r)
        t0 = time.perf_counter()
        for k in range(1, args.reps + 1):
            stats, skips, escal = run(k)
            float(stats.sum_r)
        dt_s = (time.perf_counter() - t0) / args.reps
        print(json.dumps({
            "backend": "pallas", "lanes": lanes,
            "paths_per_sec": round(num_paths / dt_s, 1),
            "time_s": round(dt_s, 4),
            "hit_rate": round(float(stats.hit_rate), 4),
            "mean_trades": round(float(stats.mean_trades), 4),
            "escalations": int(escal),
        }))

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
