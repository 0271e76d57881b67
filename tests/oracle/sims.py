"""Scalar oracle of the two simulators (replay + Monte Carlo candidate/walk)."""

from __future__ import annotations

import numpy as np

from .engine import EngineOracle, _f32


def find_candidates(bars, levels, oracle: EngineOracle, *, touch_limit=1,
                    with_gates=True, mode="mc", t0_ms=0, prox=0.05,
                    sp=0.35, tp=0.25):
    """bars: list of dicts {o,h,l,c}; levels: list of level dicts.
    ``oracle`` supplies the gate stack (its latch state evolves, its ts is forced
    fresh per bar, and no live-loop state updates happen between bars)."""
    cands = []
    touch_counts = {}
    prev_c = None
    for i, b in enumerate(bars):
        c = float(b["c"])
        if prev_c is None:
            prev_c = c
            continue
        p32 = np.float32(c)
        li, nearest = min(
            enumerate(oracle.levels),
            key=lambda kv: abs(np.float32(kv[1]["price"]) - p32),
        )
        lvl = nearest["price"]
        if np.float32(abs(np.float32(lvl) - p32)) > np.float32(prox):
            prev_c = c
            continue
        side = "long" if c > prev_c else "short"

        def run_gates():
            now = t0_ms + i * 60_000
            oracle.last_ts = now
            return oracle.evaluate_entry(c, prev_c, now)

        if mode == "mc":
            tc = touch_counts.get(li, 0) + 1
            if tc > touch_limit:
                prev_c = c
                continue
            touch_counts[li] = tc
            out_lvl, out_side = lvl, side
            if with_gates:
                ok, reason, extras = run_gates()
                if not ok:
                    prev_c = c
                    continue
                out_lvl = extras.get("level_price", lvl)
                out_side = extras.get("side", side)
        else:  # replay ordering: gates first, then touch limit
            if with_gates:
                ok, reason, extras = run_gates()
                if not ok:
                    prev_c = c
                    continue
            tc = touch_counts.get(li, 0) + 1
            if tc > touch_limit:
                prev_c = c
                continue
            touch_counts[li] = tc
            out_lvl, out_side = lvl, side

        if out_side == "long":
            stop = _f32(np.float32(out_lvl) - np.float32(sp))
            target = _f32(np.float32(out_lvl) + np.float32(tp))
        else:
            stop = _f32(np.float32(out_lvl) + np.float32(sp))
            target = _f32(np.float32(out_lvl) - np.float32(tp))
        cands.append({"i": i, "side": out_side, "lvl": out_lvl,
                      "entry": c, "stop": stop, "target": target, "touch": tc})
        prev_c = c
    return cands


def replay_walk(bars, cand):
    """Deterministic forward walk, stop checked before target (:3621-3628)."""
    side = cand["side"]
    stop, target, entry = cand["stop"], cand["target"], cand["entry"]
    for j in range(cand["i"] + 1, len(bars)):
        hh, ll = float(bars[j]["h"]), float(bars[j]["l"])
        if side == "long":
            if ll <= stop:
                return "stop", stop, j
            if hh >= target:
                return "tp", target, j
        else:
            if hh >= stop:
                return "stop", stop, j
            if ll <= target:
                return "tp", target, j
    return "open", float(bars[-1]["c"]), len(bars)


def replay_r(cand, outcome):
    if outcome == "open":
        return 0.0
    risk = abs(cand["entry"] - cand["stop"]) or 1e-9
    reward = abs(cand["target"] - cand["entry"])
    return reward / risk if outcome == "tp" else -1.0


def mc_walk(bars, cand, *, lvl_jitter, entry_slip, stop_slip, target_slip,
            tie_u, sp=0.35, tp=0.25):
    """Noisy walk with injected noise draws (for exact parity with the JAX
    per-(trial,candidate) streams)."""
    side = cand["side"]
    lvl_j = cand["lvl"] + lvl_jitter
    entry = cand["entry"] + entry_slip
    if side == "long":
        stop = lvl_j - sp + stop_slip
        target = lvl_j + tp + target_slip
    else:
        stop = lvl_j + sp + stop_slip
        target = lvl_j - tp + target_slip
    risk = abs(entry - stop) or 1e-9
    reward = abs(target - entry)
    for j in range(cand["i"] + 1, len(bars)):
        hh, ll = float(bars[j]["h"]), float(bars[j]["l"])
        stop_hit = (ll <= stop) if side == "long" else (hh >= stop)
        tgt_hit = (hh >= target) if side == "long" else (ll <= target)
        if stop_hit and tgt_hit:
            up = max(0.0, hh - entry)
            dn = max(0.0, entry - ll)
            p_tp = up / (up + dn + 1e-9)
            return (reward / risk, "tp") if tie_u < p_tp else (-1.0, "stop")
        if tgt_hit:
            return reward / risk, "tp"
        if stop_hit:
            return -1.0, "stop"
    return 0.0, "open"
