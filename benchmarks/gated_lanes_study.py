#!/usr/bin/env python3
"""Gated-kernel lane-geometry sweep (VERDICT r2 item 8).

The gated lifecycle state machine runs on (8, lanes) vector-register tiles;
the first-contact kernel's round-2 sweep showed wider lanes win (+7% at 8192).
This script measures ``mc_paths_pallas_gated`` throughput for lanes in
{512, 1024, 2048, 4096} on the real chip and prints a JSON row per width.
The winner becomes GATED_LANES in ops/pallas_mc.py (see RESULTS.md).

Run: python benchmarks/gated_lanes_study.py [--paths LOG2] [--bars N]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from qmmx_monolithic_monte_carlo_tpu.config import EngineParams
from qmmx_monolithic_monte_carlo_tpu.ops.pallas_mc import mc_paths_pallas_gated
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
    ap.add_argument("--paths", type=int, default=27, help="log2 total paths")
    ap.add_argument("--bars", type=int, default=40)
    ap.add_argument("--lanes", type=int, nargs="+",
                    default=[512, 1024, 2048, 4096])
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    params = EngineParams.default()
    num_paths = 1 << args.paths
    dev = jax.devices()[0]
    print(f"# device={dev.device_kind} paths=2^{args.paths} bars={args.bars}",
          file=sys.stderr)

    for lanes in args.lanes:
        def run(seed):
            return mc_paths_pallas_gated(
                seed, LEVELS, params, num_paths=num_paths, num_bars=args.bars,
                sigma=0.3, dt=1.0 / (390.0 * 252.0), lanes=lanes,
            )

        stats = run(0)
        float(stats.sum_r)  # compile + materialize
        t0 = time.perf_counter()
        for k in range(1, args.reps + 1):
            stats = run(k)
            float(stats.sum_r)
        dt_s = (time.perf_counter() - t0) / args.reps
        rate = num_paths / dt_s
        print(json.dumps({
            "lanes": lanes, "paths_per_sec": round(rate, 1),
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
