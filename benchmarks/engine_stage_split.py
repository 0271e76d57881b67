"""PAIRED in-process stage split of the full-engine kernel (VERDICT r4 #1).

All variants are timed INTERLEAVED in one process (round-robin, median of
--rounds reps each, IQR quoted) — the only regime that survives the shared
axon chip's ~1.9x cross-process drift.  Variants stack the kernel's own
static stage switches:

    gen          gen_only=True                     (bar generation alone)
    ladder       skip_d=True,  escalation=False    (+ B/C: position mgmt +
                                                    12-gate ladder)
    ladder+esc   skip_d=True,  escalation=True     (+ the escalation walk)
    full-noesc   skip_d=False, escalation=False    (+ minute close, no walk)
    full         skip_d=False, escalation=True     (the shipped kernel)

Deltas between adjacent rows price each stage; (full) - (full-noesc) and
(ladder+esc) - (ladder) are two independent measurements of the walk.

Run: python benchmarks/engine_stage_split.py [--paths 24] [--rounds 7]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

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

VARIANTS = {
    "gen": dict(gen_only=True),
    "ladder": dict(skip_d=True, escalation=False),
    "ladder+esc": dict(skip_d=True, escalation=True),
    "full-noesc": dict(escalation=False),
    "full": dict(),
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--paths", type=int, default=24, help="log2 total paths")
    ap.add_argument("--bars", type=int, default=40)
    ap.add_argument("--lanes", type=int, default=256)
    ap.add_argument("--rounds", type=int, default=7)
    ap.add_argument("--variants", nargs="+", default=list(VARIANTS))
    args = ap.parse_args()
    n = 1 << args.paths
    params = EngineParams.default()

    runs = {}
    for name in args.variants:
        kw = VARIANTS[name]

        def make(kw=kw):
            def go(seed):
                out = mc_paths_pallas_engine(
                    seed, LEVELS, params, num_paths=n, num_bars=args.bars,
                    sigma=0.3, lanes=args.lanes, **kw)
                return float(np.asarray(out[0].n))
            return go

        runs[name] = make()
        runs[name](0)  # compile

    times = {name: [] for name in runs}
    for r in range(args.rounds):
        for name, go in runs.items():
            t0 = time.perf_counter()
            go(r + 1)
            times[name].append(time.perf_counter() - t0)

    rows = {}
    for name, ts in times.items():
        ts = np.asarray(sorted(ts))
        med = float(np.median(ts))
        iqr = float(ts[int(len(ts) * 0.75)] - ts[int(len(ts) * 0.25)])
        rows[name] = {"ms": round(med * 1e3, 1),
                      "iqr_ms": round(iqr * 1e3, 1),
                      "paths_per_s": round(n / med / 1e6, 1)}
    out = {"regime": "paired", "paths": n, "bars": args.bars,
           "lanes": args.lanes, "rounds": args.rounds, "rows": rows}
    names = list(rows)
    for a, b in zip(names, names[1:]):
        out[f"delta_{b}_minus_{a}_ms"] = round(
            rows[b]["ms"] - rows[a]["ms"], 1)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
