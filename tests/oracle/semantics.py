"""Pure-Python oracle of the documented reference semantics.

Written fresh from SURVEY.md's behavioral spec (with file:line citations) — this is
the ground truth the vectorized JAX ops are tested against on small inputs.  It is
deliberately scalar, loopy and obvious.
"""

from __future__ import annotations

import math
import random
from collections import defaultdict, deque


def volume_slope(vols: list[float], window: int = 6) -> float:
    """Halves-average slope over the last `window` volumes (ref :1796-1811)."""
    if len(vols) < 3:
        return 0.0
    last = vols[-min(window, len(vols)):]
    half = max(2, len(last) // 2)
    v1 = sum(last[:half]) / half
    v2 = sum(last[-half:]) / half
    if v1 == 0 and v2 == 0:
        return 0.0
    return (v2 - v1) / (abs(v1) + 1e-9)


def volume_trend_toward_level(
    prices: list[float],
    vols: list[float],
    level: float,
    lookback: int = 5,
    min_bars: int = 3,
):
    """Signed volume trend over bars that moved toward the level (ref :567-601).
    Returns None when there is not enough history."""
    n = len(prices)
    if n < max(lookback, min_bars):
        return None
    seq = list(zip(prices[-lookback:], vols[-lookback:]))
    kept: list[float] = []
    prev_d = None
    for p, v in seq:
        d = abs(p - level)
        if prev_d is None or d <= prev_d:
            kept.append(v)
        prev_d = d
    if len(kept) < min_bars:
        kept = [v for _, v in seq]
    k = max(2, len(kept) // 2)
    return sum(kept[-k:]) / k - sum(kept[:k]) / k


def infer_approach(prices: list[float], level: float):
    """Approach from the last two prices (ref :554-565): 'from_above'/'from_below'/None."""
    if len(prices) < 2:
        return None
    p1, p2 = prices[-2], prices[-1]
    if abs(p2 - level) < abs(p1 - level):
        return "from_above" if p1 > level else "from_below"
    return None


def compute_confidence(level_price, level_solid, price, direction, touch_count, prox):
    """Handcrafted confidence (ref :1415-1427)."""
    dist = abs(price - level_price)
    base = max(0.0, 1.0 - dist / max(1e-4, prox))
    base += 0.08 if level_solid else 0.02
    if touch_count <= 1:
        base += 0.10
    elif touch_count == 2:
        base -= 0.08
    else:
        base -= 0.16
    if direction in ("up", "down"):
        base += 0.03
    return max(0.0, min(1.0, base))


def soft_veto(side, volume_slope, approach, confluence, proximity_abs,
              contact_prox, veto_vol_strong=0.25, veto_prox=0.06):
    """Soft volume veto (ref :1773-1794). Returns (allowed, code)."""
    if abs(volume_slope) < 0.05 and not confluence:
        return True, "INCONCLUSIVE"
    near = proximity_abs <= max(veto_prox, contact_prox * 0.12)
    s = veto_vol_strong
    if approach == "from_below":
        if near and side == "long" and volume_slope < -s:
            return False, "CONTRA_VOL_LONG"
        if near and side == "short" and volume_slope > s:
            return False, "CONTRA_VOL_SHORT"
    else:
        if near and side == "long" and volume_slope > s:
            return False, "CONTRA_VOL_LONG"
        if near and side == "short" and volume_slope < -s:
            return False, "CONTRA_VOL_SHORT"
    return True, "ALLOW"


def policy_features(proximity_abs, volume_trend, approach, confluence, minutes_since_open):
    """OnlinePolicy 7-dim feature vector (ref :308-331)."""
    prox = min(1.0, proximity_abs)
    vt = max(-1.0, min(1.0, volume_trend / 1e6))
    ao = [1.0 if approach == c else 0.0 for c in ("from_above", "from_below")]
    return [1.0, prox, vt] + ao + [1.0 if confluence else 0.0,
                                   min(1.0, minutes_since_open / 390.0)]


def sigmoid(x):
    if x < -50:
        return 0.0
    if x > 50:
        return 1.0
    return 1.0 / (1.0 + math.exp(-x))


class OnlinePolicyOracle:
    """Two-head online logistic model (ref :274-379)."""

    ENTRY = ("go_long", "go_short", "skip")
    EXIT = ("exit_now", "hold")

    def __init__(self, lr=0.03, l2=1e-6, use_perceptron=False, dim=7):
        self.lr, self.l2, self.use_perceptron = lr, l2, use_perceptron
        self.w_entry = {a: [0.0] * dim for a in self.ENTRY}
        self.w_exit = {a: [0.0] * dim for a in self.EXIT}

    def score(self, head, x):
        return {a: sigmoid(sum(wi * xi for wi, xi in zip(w, x)))
                for a, w in head.items()}

    def update(self, head, action, x, y):
        w = head[action]
        pred = sigmoid(sum(wi * xi for wi, xi in zip(w, x)))
        if self.use_perceptron:
            err = y - (1 if pred >= 0.5 else 0)
            for i in range(len(w)):
                w[i] += self.lr * err * x[i]
        else:
            for i in range(len(w)):
                w[i] -= self.lr * ((pred - y) * x[i] + self.l2 * w[i])


class TouchMemoryOracle:
    """LevelTouchMemory (ref :1112-1239), keyed by level index instead of rounded
    price (see ops/touch.py COMPAT NOTE)."""

    def __init__(self, tol_bps=8, min_time_gap_sec=180, min_price_gap_bps=4,
                 decay=0.85, max_bounces=2, fatigue_hits=3,
                 fatigue_window_min=30, fatigue_vol_k=1.20):
        self.tol_bps = tol_bps
        self.gap_ms = min_time_gap_sec * 1000
        self.px_gap_bps = min_price_gap_bps
        self.decay = decay
        self.max_bounces = max_bounces
        self.fat_hits = fatigue_hits
        self.fat_win_ms = fatigue_window_min * 60000
        self.fat_k = fatigue_vol_k
        self.touch = defaultdict(lambda: {"count": 0, "last_ts": None, "last_px": None})
        self.taps = deque(maxlen=1000)

    @staticmethod
    def _bps(px, ref):
        return 0.0 if ref <= 0 else abs(px - ref) / ref * 1e4

    def register(self, ts, o, h, l, c, v, level_prices, box_low, box_high,
                 vol_ma_s=None, vol_ma_l=None):
        for li, lp in enumerate(level_prices):
            lr = round(lp, 2)
            near = (l - 1e-9) <= lr <= (h + 1e-9) or self._bps(c, lr) <= self.tol_bps
            if not near:
                continue
            side = "SHORT" if c > lr else "LONG"
            rec = self.touch[(li, side)]
            if rec["last_ts"] is not None:
                if ts - rec["last_ts"] < self.gap_ms:
                    continue
                if rec["last_px"] is not None and self._bps(c, rec["last_px"]) < self.px_gap_bps:
                    continue
            rec["count"] += 1
            rec["last_ts"] = ts
            rec["last_px"] = c
        if box_low is not None and box_high is not None:
            ratio = (vol_ma_s / vol_ma_l) if (vol_ma_s and vol_ma_l and vol_ma_l > 0) else 1.0
            if h >= box_high - 1e-9:
                self.taps.append((ts, "top", ratio))
            if l <= box_low + 1e-9:
                self.taps.append((ts, "bot", ratio))

    def edge_fatigued(self, now_ms):
        if not self.taps:
            return None
        t0 = now_ms - self.fat_win_ms
        for edge in ("top", "bot"):
            hits = [r for (t, e, r) in self.taps if t >= t0 and e == edge]
            if len(hits) >= self.fat_hits:
                if sum(hits[-self.fat_hits:]) / self.fat_hits >= self.fat_k:
                    return edge
        return None

    def allow(self, level_idx, side, now_ms):
        rec = self.touch[(level_idx, side)]
        if rec["count"] >= self.max_bounces:
            return False, "budget", 1.0
        if rec["last_ts"] is not None and now_ms - rec["last_ts"] < self.gap_ms:
            return False, "cooldown", 1.0
        return True, "ok", self.decay ** rec["count"]


class GuardOracle:
    """AccumulationBreakoutGuard (ref :1241-1356)."""

    def __init__(self, box_lookback_min=60, min_bars=30, compression_bp=18,
                 vol_short=5, vol_long=20, vol_k=1.40, reenter_clear_bars=3):
        self.bars = deque(maxlen=600)
        self.lb_ms = box_lookback_min * 60000
        self.min_bars = min_bars
        self.comp_bp = compression_bp
        self.vs, self.vl, self.vk = vol_short, vol_long, vol_k
        self.clear_n = reenter_clear_bars
        self.box_low = self.box_high = self.box_ts0 = None
        self.regime = "unknown"
        self._inside = 0

    def push(self, ts, o, h, l, c, v):
        self.bars.append((ts, o, h, l, c, v))
        self._update()

    def _update(self):
        t_end = self.bars[-1][0]
        win = [b for b in self.bars if t_end - b[0] <= self.lb_ms]
        if len(win) < self.min_bars:
            self.regime = "unknown"
            self.box_low = self.box_high = self.box_ts0 = None
            self._inside = 0
            return
        highs = [b[2] for b in win]
        lows = [b[3] for b in win]
        closes = [b[4] for b in win]
        vols = [b[5] for b in win]
        price = closes[-1]
        blo, bhi = min(lows), max(highs)
        thresh = price * self.comp_bp / 10000.0
        ma_s = sum(vols[-self.vs:]) / self.vs if len(vols) >= self.vs else None
        ma_l = sum(vols[-self.vl:]) / self.vl if len(vols) >= self.vl else None
        if bhi - blo <= max(1e-6, thresh):
            if self.regime not in ("breakout_up", "breakout_down"):
                self.regime = "accumulation"
            self.box_low, self.box_high = blo, bhi
            if self.box_ts0 is None:
                self.box_ts0 = win[0][0]
        else:
            if self.regime not in ("breakout_up", "breakout_down"):
                self.regime = "unknown"
        if self.box_low is not None and self.box_high is not None and ma_s and ma_l:
            if price > self.box_high + 1e-6 and ma_s > self.vk * ma_l:
                self.regime = "breakout_up"
                self._inside = 0
            elif price < self.box_low - 1e-6 and ma_s > self.vk * ma_l:
                self.regime = "breakout_down"
                self._inside = 0
        if self.regime in ("breakout_up", "breakout_down") and self.box_low is not None:
            if self.box_low <= price <= self.box_high:
                self._inside += 1
                if self._inside >= self.clear_n:
                    self.regime = "accumulation"
            else:
                self._inside = 0

    def allow(self, side):
        if self.regime == "breakout_up" and side == "SHORT":
            return False
        if self.regime == "breakout_down" and side == "LONG":
            return False
        return True


def walk_outcome(bars, cand, stop, target, entry, tie_rand):
    """First-hit walk (ref :3449-3486) with explicit noisy stop/target/entry and a
    supplied tie uniform. bars = list of (h, l); walk starts at index cand_i+1."""
    side = cand["side"]
    risk = abs(entry - stop) or 1e-9
    reward = abs(target - entry)
    for j in range(cand["i"] + 1, len(bars)):
        hh, ll = bars[j]
        stop_hit = (ll <= stop) if side == "long" else (hh >= stop)
        tgt_hit = (hh >= target) if side == "long" else (ll <= target)
        if stop_hit and tgt_hit:
            up = max(0.0, hh - entry)
            dn = max(0.0, entry - ll)
            p_tp = up / (up + dn + 1e-9)
            return (reward / risk, "tp") if tie_rand < p_tp else (-1.0, "stop")
        if tgt_hit:
            return reward / risk, "tp"
        if stop_hit:
            return -1.0, "stop"
    return 0.0, "open"
