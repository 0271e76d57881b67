"""Scalar Python oracle for the engine-gated generated-path lifecycle.

Mirrors sim/gatedpath.gated_path_replay bar-by-bar in plain Python with
float32 arithmetic at every decision boundary (repo convention: oracles
mirror f32 exactly).  Semantics cited in the module under test:
cooldown (qmmx_monolithic.py:1516), direction (:1529-1540), contact
(:1543-1555), touch latch + LEVEL_OVERTOUCHED (:1557-1587), confidence
(:1415-1427, :1626-1641), stop/target scaffold (:1643-1675), same-bar tie
(:3467-3480), equity/peak/drawdown (:3491-3510).
"""

from __future__ import annotations

import numpy as np

f32 = np.float32

KIND_SOLID = 1


def confidence(lvl_price, lvl_kind, price, touch_count, contact_prox):
    dist = f32(abs(f32(price) - f32(lvl_price)))
    prox = f32(max(f32(1e-4), f32(contact_prox)))
    base = f32(max(f32(0.0), f32(1.0) - f32(dist / prox)))
    base = f32(base + (f32(0.08) if lvl_kind == KIND_SOLID else f32(0.02)))
    if touch_count <= 1:
        adj = f32(0.10)
    elif touch_count == 2:
        adj = f32(-0.08)
    else:
        adj = f32(-0.16)
    base = f32(base + adj)
    base = f32(base + f32(0.03))  # direction always known at a signal
    return f32(min(f32(1.0), max(f32(0.0), base)))


def lifecycle_path(o, h, l, c, tie, levels, *, contact_prox, stop_padding,
                   tp_padding, touch_limit, q_min_prob, cooldown_bars,
                   touch_gap_bars, use_confidence=True):
    """One path.  ``levels``: list of (price, kind) tuples in slot order.
    Returns dict(equity, trades, wins, losses, open_at_end, max_dd)."""
    w = len(c)
    side = 0
    entry = stop = target = f32(0.0)
    cooldown = 0
    touch = {}
    last_tb = {}
    equity = peak = dd = f32(0.0)
    trades = wins = losses = 0
    prev_c = f32(o[0])

    for bar in range(w):
        hh, ll, cc = f32(h[bar]), f32(l[bar]), f32(c[bar])

        # 1) position management
        was_flat = side == 0
        if side != 0:
            is_long = side > 0
            stop_hit = (ll <= stop) if is_long else (hh >= stop)
            tgt_hit = (hh >= target) if is_long else (ll <= target)
            closed = stop_hit or tgt_hit
            if closed:
                if stop_hit and tgt_hit:
                    up = f32(max(f32(0.0), f32(hh - entry)))
                    dn = f32(max(f32(0.0), f32(entry - ll)))
                    p_tp = f32(up / f32(up + dn + f32(1e-9)))
                    target_first = f32(tie[bar]) < p_tp
                else:
                    target_first = tgt_hit
                risk = f32(max(abs(f32(entry - stop)), f32(1e-9)))
                reward = f32(abs(f32(target - entry)))
                r = f32(reward / risk) if target_first else f32(-1.0)
                equity = f32(equity + r)
                peak = f32(max(peak, equity))
                dd = f32(max(dd, f32(peak - equity)))
                if target_first:
                    wins += 1
                else:
                    losses += 1
                side = 0
                cooldown = cooldown_bars
                prev_c = cc
                continue  # never re-enter on a closing bar (:2966-3014)

        cd_ok = cooldown <= 0
        cooldown = max(cooldown - 1, 0)

        # 2) entry evaluation
        if was_flat and cd_ok and cc != prev_c:
            best_d, best_i = None, None
            for i, (lp, _) in enumerate(levels):
                d = f32(abs(f32(cc) - f32(lp)))
                if best_d is None or d < best_d:
                    best_d, best_i = d, i
            if best_i is not None and best_d <= f32(contact_prox):
                tc = touch.get(best_i, 0)
                lt = last_tb.get(best_i)
                fresh = lt is None or (bar - lt) >= touch_gap_bars
                if fresh:
                    tc += 1
                    touch[best_i] = tc
                    last_tb[best_i] = bar
                lvlp, lvlk = levels[best_i]
                conf = confidence(lvlp, lvlk, cc, tc, contact_prox)
                conf_ok = (not use_confidence) or conf >= f32(q_min_prob)
                if tc < touch_limit and conf_ok:
                    side = 1 if cc > prev_c else -1
                    entry = cc
                    if side > 0:
                        stop = f32(f32(lvlp) - f32(stop_padding))
                        target = f32(f32(lvlp) + f32(tp_padding))
                    else:
                        stop = f32(f32(lvlp) + f32(stop_padding))
                        target = f32(f32(lvlp) - f32(tp_padding))
                    trades += 1
        prev_c = cc

    return dict(equity=float(equity), trades=trades, wins=wins, losses=losses,
                open_at_end=side != 0, max_dd=float(dd))
