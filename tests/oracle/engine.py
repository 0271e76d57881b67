"""Scalar oracle of the full engine: gate stack + live-loop lifecycle.

Mirrors the documented reference semantics (SURVEY.md §3.2) in plain Python with
the rebuild's default quirk fixes (single evaluation, named VETO reasons, working
escalation).  Used to cross-check the vectorized scan engine over random tapes.
"""

from __future__ import annotations

import numpy as np

from . import semantics as S
from .semantics import GuardOracle, TouchMemoryOracle


def _f32(x):
    """The device engine computes in float32; mirror it at decision boundaries."""
    return float(np.float32(x))


class EngineOracle:
    def __init__(self, levels, *, contact_prox=0.05, q_min_prob=0.60,
                 cooldown_s=8, stop_padding=0.35, tp_padding=0.25,
                 enable_veto=True, veto_vol_strong=0.25, veto_prox=0.06,
                 disable_ml_gate=False, use_blend=False, w_rules=0.7, w_ml=0.3,
                 policy_gate_disabled=False):
        # levels: list of dicts sorted by (color, type, index)
        self.levels = sorted(levels, key=lambda r: (r["color"], r["type"], r["index"]))
        self.prox = contact_prox
        self.qmin = q_min_prob
        self.cooldown_s = cooldown_s
        self.sp = stop_padding
        self.tp = tp_padding
        self.enable_veto = enable_veto
        self.veto_strong = veto_vol_strong
        self.veto_prox = veto_prox
        self.disable_ml = disable_ml_gate
        self.use_blend = use_blend
        self.w_rules, self.w_ml = w_rules, w_ml
        self.policy_gate_disabled = policy_gate_disabled

        self.last_price = None
        self.last_ts = None
        self.cooldown_until = 0
        self.last_direction = None
        self.position = None  # dict(side, entry, stop, target)
        self.touch_counts = {}
        self.latch = {}
        self.touchmem = TouchMemoryOracle()
        self.guard = GuardOracle()
        self.recent = []      # [(close, volume, ts)]
        self.cur_bar = None
        self.pnl = 0.0
        self.equity_r = 0.0
        self.wins = 0
        self.losses = 0
        self.events = []

    # ---- bar roll-up ----
    def ingest(self, ts, price, vol):
        m = ts // 60000
        if self.cur_bar is None or self.cur_bar["m"] != m:
            if self.cur_bar is not None:
                b = self.cur_bar
                self._minute_close(b["ts0"], b["o"], b["h"], b["l"], b["c"], b["v"])
            self.cur_bar = {"m": m, "ts0": ts - ts % 60000, "o": price, "h": price,
                            "l": price, "c": price, "v": vol}
            return self.cur_bar is not None
        else:
            b = self.cur_bar
            b["c"] = price
            b["h"] = max(b["h"], price)
            b["l"] = min(b["l"], price)
            b["v"] += vol

    def _minute_close(self, ts0, o, h, l, c, v):
        self.recent.append((c, v, ts0))
        if len(self.recent) > 240:
            self.recent = self.recent[-240:]
        vols = [r[1] for r in self.recent]
        ma_s = sum(vols[-5:]) / max(1, min(5, len(vols)))
        ma_l = sum(vols[-20:]) / max(1, min(20, len(vols)))
        self.guard.push(ts0, o, h, l, c, v)
        if self.guard.regime == "accumulation":
            self.touchmem.register(
                ts0, o, h, l, c, v, [lv["price"] for lv in self.levels],
                self.guard.box_low, self.guard.box_high, ma_s, ma_l)
        if self.guard.regime in ("breakout_up", "breakout_down"):
            self.touchmem = TouchMemoryOracle()

    # ---- gate stack ----
    def evaluate_entry(self, price, prev_price, now_ms, api_key=True):
        if not api_key:
            return False, "MISSING_API_KEY", {}
        if price is None or self.last_ts is None or now_ms - self.last_ts > 15000:
            return False, "PRICE_STALE", {}
        if self.position is not None:
            return False, "IN_POSITION", {}
        if now_ms < self.cooldown_until:
            return False, "COOLDOWN", {}
        if not self.levels:
            return False, "NOLEVELS", {}
        eps = 1e-9
        direction = None
        if prev_price is not None:
            if price > prev_price + eps:
                direction = "up"
            elif price < prev_price - eps:
                direction = "down"
            else:
                direction = self.last_direction
        if direction is None:
            return False, "DIR_UNKNOWN", {}
        p32 = np.float32(price)
        li, nearest = min(
            enumerate(self.levels),
            key=lambda kv: abs(np.float32(kv[1]["price"]) - p32),
        )
        dist = float(abs(np.float32(nearest["price"]) - p32))
        if np.float32(dist) > np.float32(self.prox):
            return False, "TOO_FAR", {}
        # touch latch
        key = li
        if not self.latch.get(key, False):
            self.touch_counts[key] = self.touch_counts.get(key, 0) + 1
            self.latch[key] = True
        for oi, lv in enumerate(self.levels):
            if oi != key and self.latch.get(oi) and \
                    abs(np.float32(lv["price"]) - p32) > np.float32(self.prox):
                self.latch[oi] = False
        tc = self.touch_counts.get(key, 0)
        if tc >= 4:
            return False, "LEVEL_OVERTOUCHED", {}
        decay_mult = 1.0
        if self.guard.regime == "accumulation":
            edge_for_this = "top" if direction == "down" else "bot"
            if self.touchmem.edge_fatigued(now_ms) == edge_for_this:
                return False, "EDGE_FATIGUE", {}
            side_tm = "SHORT" if direction == "down" else "LONG"
            ok, why, mult = self.touchmem.allow(key, side_tm, now_ms)
            if not ok:
                return False, ("TOUCH_BUDGET" if why == "budget" else "TOUCH_COOLDOWN"), {}
            decay_mult = mult
        # confidence uses the f32-rounded distance (the device computes |Δ| in
        # f32; level/price anchors at 0 so only the distance enters the formula)
        conf = S.compute_confidence(
            0.0, nearest["type"] == "solid", dist, direction, tc, self.prox
        ) * decay_mult
        if conf < self.qmin:
            return False, "CONF_LOW", {}
        side = "long" if direction == "up" else "short"
        if not self.guard.allow("LONG" if side == "long" else "SHORT"):
            return False, "ACC_BREAKOUT_GATE", {}
        if side == "long":
            stop = _f32(np.float32(nearest["price"]) - np.float32(self.sp))
            target = _f32(np.float32(nearest["price"]) + np.float32(self.tp))
        else:
            stop = _f32(np.float32(nearest["price"]) + np.float32(self.sp))
            target = _f32(np.float32(nearest["price"]) - np.float32(self.tp))
        if self.enable_veto:
            slope = S.volume_slope([r[1] for r in self.recent], 6)
            confl = sum(1 for lv in self.levels
                        if abs(lv["price"] - nearest["price"]) <= 0.15) >= 2
            approach = "from_below" if direction == "up" else "from_above"
            ok, code = S.soft_veto(side, slope, approach, confl, dist,
                                   self.prox, self.veto_strong, self.veto_prox)
            if not ok:
                return False, code, {}
        # ML gate: no model in these tests → always passes, mlp = conf
        mlp = conf
        if self.use_blend:
            s = self.w_rules + self.w_ml
            blended = self.w_rules / s * conf + self.w_ml / s * mlp
            if blended < self.qmin:
                return False, "COMBINED_LOW", {}
        extras = {"side": side, "level_idx": key, "level_price": nearest["price"],
                  "conf": conf, "touch_count": tc, "stop": stop, "target": target,
                  "direction": direction}
        return True, "OK", extras

    # ---- exits / escalation (fixed semantics) ----
    def _should_escalate(self, side, entry, price):
        levels = self.levels
        if not levels:
            return None
        nearest = min(levels, key=lambda lv: abs(lv["price"] - price))
        lp = nearest["price"]
        near = abs(price - lp) <= 0.35
        prices = [r[0] for r in self.recent]
        vols = [r[1] for r in self.recent]
        approach = S.infer_approach(prices, lp)
        if approach is None:
            approach = "from_above" if price > lp else "from_below"
        trend = S.volume_trend_toward_level(prices, vols, lp)
        if not near or trend is None:
            return None
        basis = "reversal" if trend < 0 else "continuation"
        rev_down = approach == "from_below"
        cont_down = approach == "from_above"
        against = (
            (side == "long" and rev_down) or (side == "short" and not rev_down)
            if basis == "reversal"
            else (side == "long" and cont_down) or (side == "short" and not cont_down)
        )
        if against or basis != "continuation":
            return None
        anchor = lp
        prices_sorted = sorted(lv["price"] for lv in levels)
        if side == "long":
            higher = [p for p in prices_sorted if p > anchor + 1e-9]
            nxt = min(higher) if higher else None
        else:
            lower = [p for p in prices_sorted if p < anchor - 1e-9]
            nxt = max(lower) if lower else None
        if nxt is None:
            return None
        trail = max(entry, anchor - 0.35) if side == "long" else min(entry, anchor + 0.35)
        return {"next_target": nxt, "trail_stop": round(trail, 2)}

    # ---- one loop iteration ----
    def tick(self, ts, price, vol=0.0, minutes_since_open=0):
        self.ingest(ts, price, vol)
        prev = self.last_price
        ok, reason, extras = self.evaluate_entry(price, prev, ts)
        self.last_ts = ts
        lp = self.last_price
        self.last_price = price
        if lp is not None and price != lp:
            self.last_direction = "up" if price > lp else "down"
        ev = {"reason": reason, "ok": ok, "opened": False, "closed": False,
              "close_reason": None, "pnl": 0.0, "escalated": False}
        if self.position is not None:
            p = self.position
            if p["side"] == "long":
                stop_hit, tgt_hit = price <= p["stop"], price >= p["target"]
            else:
                stop_hit, tgt_hit = price >= p["stop"], price <= p["target"]
            if stop_hit:
                self._close(price, "STOP", ts, ev)
                return ev
            if tgt_hit:
                esc = (self._should_escalate(p["side"], p["entry"], price)
                       if abs(price - p["target"]) <= self.prox else None)
                if esc is not None:
                    p["stop"], p["target"] = esc["trail_stop"], esc["next_target"]
                    ev["escalated"] = True
                else:
                    self._close(price, "TARGET", ts, ev)
                return ev
        else:
            if ok:
                # policy gate: zero-weight policy scores 0.5 → gate fails unless disabled
                if self.policy_gate_disabled:
                    self.position = {"side": extras["side"], "entry": price,
                                     "stop": extras["stop"], "target": extras["target"]}
                    ev["opened"] = True
        return ev

    def _close(self, price, why, ts, ev):
        p = self.position
        pnl = price - p["entry"] if p["side"] == "long" else p["entry"] - price
        risk = abs(p["entry"] - p["stop"]) or 1e-9
        self.pnl += pnl
        self.equity_r += pnl / risk
        if pnl > 0:
            self.wins += 1
        else:
            self.losses += 1
        self.position = None
        self.cooldown_until = ts + self.cooldown_s * 1000
        ev["closed"] = True
        ev["close_reason"] = why
        ev["pnl"] = pnl
