#!/usr/bin/env python3
"""The closed learning loop at path scale, demonstrated on real hardware.

Runs ``sim/flywheel.policy_iteration`` — simulate → harvest labels on-chip →
refresh the ML gate (weighted IRLS, ref :3833-3853) and the OnlinePolicy
entry heads (ref :3753-3803) → re-simulate with the refreshed models ARMED —
and prints one JSON row per round.  The closed-loop evidence VERDICT r3
missing #1 asks for: the ONLINE_POLICY / ML_CONF_LOW skip rows appear in
round 1+ (they cannot fire in round 0: no trained model exists yet), and the
hit rate / trade mix shifts once simulation output trains the gates that
veto the next round's entries.

Run: python benchmarks/flywheel_demo.py [--paths LOG2] [--rounds N]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from qmmx_monolithic_monte_carlo_tpu.config import EngineParams
from qmmx_monolithic_monte_carlo_tpu.sim import enginepath as EP
from qmmx_monolithic_monte_carlo_tpu.sim import flywheel as FW
from qmmx_monolithic_monte_carlo_tpu.types import Levels

LEVELS = Levels.from_rows(
    [
        {"color": "blue", "type": "solid", "index": 0, "price": 100.0},
        {"color": "orange", "type": "dashed", "index": 0, "price": 100.4},
        {"color": "teal", "type": "solid", "index": 0, "price": 99.6},
    ],
    max_levels=4,
)


def _structured_history(num_bars: int = 2048, seed: int = 99):
    """A recorded history with STRUCTURE a gate can learn: two vol regimes
    (64-bar blocks of sigma 0.10 vs 0.45 annualized-intraday scale), volume
    coupled to the regime, and a mild negative-drift skew in the high-vol
    regime — so entry-time features (volume ratios, distances) carry signal
    about win probability that pure GBM lacks."""
    from qmmx_monolithic_monte_carlo_tpu.ops.pathgen import PathBars

    rng = np.random.default_rng(seed)
    blocks = num_bars // 64
    hi = np.repeat(rng.random(blocks) < 0.5, 64)[:num_bars]
    sig = np.where(hi, 0.45, 0.10) * np.sqrt(1.0 / (390.0 * 252.0))
    drift = np.where(hi, -0.15, 0.05) / (390.0 * 252.0)
    r = rng.normal(drift, sig).astype(np.float64)
    c = 100.0 * np.exp(np.cumsum(r))
    o = np.concatenate([[100.0], c[:-1]])
    spread = np.abs(rng.normal(0, sig * 0.7, num_bars))
    h = np.maximum(o, c) * np.exp(spread)
    l = np.minimum(o, c) * np.exp(-spread)
    v = rng.lognormal(13.0, 0.3, num_bars) * np.where(hi, 2.2, 1.0)
    return PathBars(open=np.float32(o), high=np.float32(h),
                    low=np.float32(l), close=np.float32(c),
                    volume=np.float32(v))


def run_holdout(args):
    """Held-out learning evaluation (VERDICT r4 missing #2): train on seed-A
    populations, measure armed-vs-disarmed expectancy on a disjoint seed-B
    population (CRN across arms — identical eval paths)."""
    from qmmx_monolithic_monte_carlo_tpu.sim import flywheel as FW2

    hist = _structured_history() if args.sampler != "gbm" else None
    t0 = time.perf_counter()
    train_rounds, rows = FW2.holdout_eval(
        0, 10_007, LEVELS, EngineParams.default(), rounds=args.rounds,
        num_paths=1 << args.paths, eval_paths=1 << args.eval_paths,
        num_bars=args.bars, sigma=args.sigma,
        arm_policy_gate=args.arm_policy, sampler=args.sampler,
        hist_bars=hist, exact_tail=args.exact_tail,
        explore_paths=(1 << args.explore) if args.explore else 0,
        explore_reweight=not args.no_reweight)
    wall = time.perf_counter() - t0
    for i, rd in enumerate(train_rounds):
        print(json.dumps({
            "train_round": i, "labeled": rd.labeled,
            "explored": rd.explored,
            "hit_rate": round(float(rd.stats.hit_rate), 5),
            "mean_r": round(float(rd.stats.mean_r), 5),
            "trades": float(rd.stats.sum_trades),
        }))
    for row in rows:
        print(json.dumps({k: (round(v, 5) if isinstance(v, float) else v)
                          for k, v in row.items()}))
    base = rows[0]
    final = rows[-1]
    print(json.dumps({
        "sampler": args.sampler,
        "arm_policy_gate": args.arm_policy,
        "explore_paths": (1 << args.explore) if args.explore else 0,
        "explore_reweight": bool(args.explore) and not args.no_reweight,
        "holdout_expectancy_delta_r": round(
            final["expectancy_r"] - base["expectancy_r"], 5),
        "holdout_mean_r_delta": round(final["mean_r"] - base["mean_r"], 5),
        "holdout_var05_delta": round(final["var_05"] - base["var_05"], 5),
        "trades_kept_frac": round(final["trades"] / max(base["trades"], 1.0),
                                  5),
        "wall_s": round(wall, 2),
    }))
    return 0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--paths", type=int, default=28, help="log2 paths/round")
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--bars", type=int, default=40)
    ap.add_argument("--sigma", type=float, default=0.3)
    ap.add_argument("--holdout", action="store_true",
                    help="train on seed-A, evaluate armed-vs-disarmed on a "
                         "disjoint seed-B population")
    ap.add_argument("--eval-paths", type=int, default=24,
                    help="log2 held-out eval paths (holdout mode)")
    ap.add_argument("--arm-policy", action="store_true",
                    help="also arm the refreshed OnlinePolicy heads")
    ap.add_argument("--sampler", default="gbm",
                    choices=["gbm", "bootstrap", "block_bootstrap"],
                    help="non-gbm uses a structured two-regime recorded "
                         "history (the distribution a gate CAN learn)")
    ap.add_argument("--exact-tail", action="store_true",
                    help="exact held-out VaR/CVaR (XLA backend only)")
    ap.add_argument("--explore", type=int, default=0,
                    help="log2 gates-off exploration paths merged into every "
                         "armed round's harvest (0=off; fixes the round-1 "
                         "survivorship collapse — see RESULTS.md)")
    ap.add_argument("--no-reweight", action="store_true",
                    help="plain merge instead of importance-reweighting the "
                         "merged harvest to the exploration bucket "
                         "frequencies (harvest.reweight_to_base)")
    args = ap.parse_args()
    if args.holdout:
        return run_holdout(args)

    t0 = time.perf_counter()
    rounds = FW.policy_iteration(
        0, LEVELS, EngineParams.default(), rounds=args.rounds,
        num_paths=1 << args.paths, num_bars=args.bars, sigma=args.sigma,
        explore_paths=(1 << args.explore) if args.explore else 0,
    )
    wall = time.perf_counter() - t0
    names = [r.name for r in EP.SKIP_REASONS]
    for i, rd in enumerate(rounds):
        st = rd.stats
        print(json.dumps({
            "round": i,
            "paths": 1 << args.paths,
            "labeled": rd.labeled,
            "hit_rate": round(float(st.hit_rate), 5),
            "mean_r": round(float(st.mean_r), 5),
            "trades": float(st.sum_trades),
            "escalations": rd.escalations,
            "ml_present": bool(rd.ml_model.present),
            "policy_l2": round(float(np.linalg.norm(
                np.asarray(rd.policy.w_entry))), 4),
            "skips": {n: float(s) for n, s in zip(names, rd.skips)
                      if float(s) > 0},
        }))
    print(json.dumps({"total_wall_s": round(wall, 2),
                      "paths_per_round": 1 << args.paths,
                      "rounds": args.rounds}))
    # the loop is CLOSED: round 1+ runs with the ML gate trained on the
    # previous round's harvest — ML_CONF_LOW cannot fire in round 0 (no
    # model exists) and must prune entries afterwards, shifting the mix
    k_ml = names.index("ML_CONF_LOW")
    assert rounds[0].skips[k_ml] == 0
    moved = any(r.skips[k_ml] > 0 for r in rounds[1:])
    shifted = any(
        float(r.stats.hit_rate) != float(rounds[0].stats.hit_rate)
        for r in rounds[1:])
    print(json.dumps({"closed_loop_ml_gate_fired": bool(moved),
                      "hit_rate_shifted": bool(shifted)}))
    return 0 if (moved and shifted) else 1


if __name__ == "__main__":
    for attempt in range(3):
        try:
            sys.exit(main())
        except SystemExit:
            raise
        except Exception as e:  # noqa: BLE001
            if attempt == 2:
                raise
            print(f"# attempt {attempt + 1} failed ({e}); retrying",
                  file=sys.stderr)
            time.sleep(10)
