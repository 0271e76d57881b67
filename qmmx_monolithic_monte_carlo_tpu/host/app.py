"""Live engine host: the reference's 0.7 s polling loop around the pure engine.

Re-expression of QMMXApp's engine thread (qmmx_monolithic.py:2905-3195) minus the
Tk GUI: fetch a trade print from the feed, run the jitted ``tick_step``, persist
reason-coded events/trades through io/db, narrate via QVoice, retrain the online
policy on the 2-minute watermark cadence (:3823-3828), and snapshot the
portfolio.  All engine state lives in the device-side ``EngineCarry``; SQLite is
the audit/trade mirror exactly as upstream.

Timestamps: the device carry uses int32 ms relative to ``epoch_ms`` (first tick,
minute-aligned); the host converts at the boundary.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field
from datetime import datetime
from functools import partial

import jax
import numpy as np

from ..config import CompatFlags, EngineParams
from ..engine import lifecycle as LC
from ..engine.gates import TickInput
from ..engine.state import EngineCarry, MlModel
from ..models import online_policy as OP
from ..ops import features as F
from ..reasons import Reason
from ..types import SIDE_LONG, Levels
from ..io import audit as audit_io
from ..io import checkpoint as ckpt
from ..io import db as _db
from ..io import portfolio as port
from ..io import qvoice as qv
from ..io import trainstore


def minutes_since_open(now_ts: float) -> int:
    """Minutes since 09:30 local (reference :3228-3234)."""
    try:
        t = datetime.fromtimestamp(now_ts)
        open_t = t.replace(hour=9, minute=30, second=0, microsecond=0)
        return max(0, int((t - open_t).total_seconds() // 60))
    except (ValueError, OSError, OverflowError):
        return 0


@dataclass
class EngineHost:
    db_path: str = "qmmx.db"
    feed: object = None
    symbol: str | None = None
    max_levels: int = 64
    tick_sleep: float = 0.7
    compat: CompatFlags = field(default_factory=CompatFlags)
    policy_path: str = "models/online_policy.npz"
    lr_model_path: str = "models/qmmx_lr.npz"
    retrain_interval_s: float = 120.0
    log: object = print

    def __post_init__(self):
        self.conn = _db.db_connect(self.db_path)
        _db.db_init(self.conn)
        self.symbol = self.symbol or _db.settings_get(self.conn, "symbol", "SPY")
        self.api_key = _db.settings_get(self.conn, "polygon_api_key", "") or ""
        self.allow_ah = _db.settings_get(self.conn, "allow_after_hours", "0") == "1"
        self.qvoice = qv.QVoice(self.db_path)
        self.params = EngineParams.from_settings(
            lambda k, d=None: _db.settings_get(self.conn, k, d)
        )
        self.policy = None
        if os.path.exists(self.policy_path):
            try:
                self.policy = ckpt.load_policy_npz(self.policy_path)
            except Exception:
                self.policy = None
        if self.policy is None:
            self.policy = OP.PolicyParams.init()
        self.ml_model = MlModel.absent()
        if os.path.exists(self.lr_model_path):
            try:
                self.ml_model = ckpt.load_lr_model_npz(self.lr_model_path)
            except Exception:
                pass
        self.policy_gate_disabled = (
            _db.settings_get(self.conn, "DISABLE_POLICY_GATE", "0") == "1"
        )
        # opt-in exit-head gating (the reference never consults score_exit
        # live; see engine/lifecycle.tick_step docstring)
        self.use_exit_head = (
            _db.settings_get(self.conn, "USE_EXIT_HEAD", "0") == "1"
        )
        self.exit_head_threshold = float(
            _db.settings_get(self.conn, "EXIT_HEAD_MIN", "0.60") or 0.60
        )
        self.reload_levels()
        self.carry = EngineCarry.init(self.max_levels)
        self.epoch_ms: int | None = None
        self.open_trade_id: int | None = None
        self._last_retrain = 0.0
        self._last_levels_reload = 0.0
        # pending ex-post exit labels: [(event_id, side, exit_px, minutes_left)]
        self._pending_exits: list[list] = []
        self.exit_label_horizon_bars = 5
        self._step = self._build_step()

    # ---- setup ----
    def reload_levels(self):
        self.level_rows = _db.load_levels(self.conn)
        self.levels = Levels.from_rows(self.level_rows, max_levels=self.max_levels)

    def _build_step(self):
        @partial(jax.jit, static_argnames=("pgd", "ueh"))
        def step(carry, levels, params, policy, ml_model, price, prev_price,
                 prev_valid, now_rel_ms, mins, pgd, ueh):
            tick = TickInput(
                price=price, price_valid=jax.numpy.asarray(True),
                prev_price=prev_price, prev_price_valid=prev_valid,
                now_ms=now_rel_ms, api_key_present=jax.numpy.asarray(True),
            )
            return LC.tick_step(
                carry, levels, params, tick,
                policy=policy, ml_model=ml_model, minutes_since_open=mins,
                policy_gate_disabled=pgd,
                use_exit_head=ueh,
                exit_head_threshold=self.exit_head_threshold,
                compat=self.compat,
            )

        return step

    # ---- one loop iteration ----
    def tick(self, price: float, t_ms: int, now_s: float | None = None) -> dict:
        if now_s is None:
            now_s = time.time()
        if self.epoch_ms is None:
            self.epoch_ms = (t_ms // 60_000) * 60_000
        rel = int(t_ms - self.epoch_ms)

        prev_price = float(np.asarray(self.carry.last_price))
        prev_valid = bool(np.asarray(self.carry.last_price_valid))

        mins = minutes_since_open(now_s)
        self.carry, event = self._step(
            self.carry, self.levels, self.params, self.policy, self.ml_model,
            np.float32(price), np.float32(prev_price), prev_valid,
            np.int32(rel), np.int32(mins),
            pgd=self.policy_gate_disabled,
            ueh=self.use_exit_head,
        )
        return self._persist_event(event, price, rel, mins=mins)

    def _persist_event(self, event: LC.TickEvent, price: float, rel_ms: int,
                       mins: int = 0) -> dict:
        d = event.decision
        reason = Reason(int(d.reason))
        out = {"reason": reason.name, "opened": bool(event.opened),
               "closed": bool(event.closed), "escalated": bool(event.escalated),
               "price": price}

        # contact event on every fresh touch latch (quirk Q9: the reference's
        # batch retrain reads contact_events but nothing writes them; here the
        # contact⋈trade training join actually has data)
        if self.compat.record_contact_events and bool(d.new_touch):
            lvl_idx = int(d.level_idx)
            from ..types import COLORS, KINDS

            self.conn.execute(
                "INSERT INTO contact_events(ts, symbol, level_color, level_type,"
                " level_index, level_price, approach, reaction, distance) "
                "VALUES(?,?,?,?,?,?,?,?,?)",
                (_db.utcnow(), self.symbol,
                 COLORS[int(np.asarray(self.levels.color)[lvl_idx])],
                 KINDS[int(np.asarray(self.levels.kind)[lvl_idx])],
                 int(np.asarray(self.levels.index)[lvl_idx]),
                 float(d.level_price),
                 "up" if int(d.direction) == 1 else "down",
                 None, float(d.dist)),
            )
            self.conn.commit()

        # structured policy event + mirrored audit line for every evaluation
        # except while idle-in-position (the reference floods IN_POSITION skips;
        # we keep them — parity — but skip QVoice for them)
        audit_io.record_decision(
            self.conn, d, self.levels,
            qmin=float(np.asarray(self.params.q_min_prob)), price=price,
            compat=self.compat,
            contact_prox=float(np.asarray(self.params.contact_prox)),
            cooldown_until_ms=int(np.asarray(self.carry.cooldown_until_ms)),
            last_ts_ms=int(np.asarray(self.carry.last_ts_ms)),
            now_ms=rel_ms,
        )
        # the reference's loop ALSO audits "ENTRY"/<returned code> for skips
        # other than TOO_FAR (:3022-3025) — keep that row for WAL parity
        if not bool(d.ok) and reason not in (Reason.TOO_FAR, Reason.IN_POSITION):
            code = audit_io.returned_code_for(d, self.compat)
            _db.audit(self.conn, "ENTRY", code,
                      f"skip {reason.name}", {"price": price})

        # ex-post exit labeling: the reference *documents* the exit-head label
        # ("label=1 if exiting beat holding for the next K bars", :287-289) but
        # never writes exit events; here each close records one and a deferred
        # labeler scores it K minute-closes later.
        if bool(event.minute_closed) and self._pending_exits:
            still = []
            for rec in self._pending_exits:
                rec[3] -= 1
                if rec[3] > 0:
                    still.append(rec)
                    continue
                ev_id, side, exit_px, _ = rec
                # exiting was good if holding would have done worse
                better = price < exit_px if side == "long" else price > exit_px
                self.conn.execute(
                    "UPDATE policy_events SET label=? WHERE id=?",
                    (1 if better else 0, ev_id),
                )
                self.conn.commit()
            self._pending_exits = still

        if bool(event.opened):
            side = "long" if int(d.side) == SIDE_LONG else "short"
            self.open_trade_id = _db.open_trade(
                self.conn, self.symbol, side, price,
                float(d.stop), float(d.target),
                f"contact@{float(d.level_price):.2f} conf={float(d.conf):.2f}",
            )
            _db.audit(self.conn, "ENTRY", "EXECUTE",
                      f"ENTRY {side} @ {price:.2f}",
                      {"stop": float(d.stop), "target": float(d.target)})
            self.qvoice.narrate_entry_evaluation(
                symbol=self.symbol, code="ENTRY_EXECUTE",
                direction="from_below" if side == "long" else "from_above",
                proximity=float(d.dist), confidence=float(d.conf),
                min_conf=float(np.asarray(self.params.q_min_prob)),
                ml_prob=float(d.ml_prob),
                min_prob=float(np.asarray(self.params.q_min_prob)),
                touches=int(d.touch_count),
                notes="Conditions aligned with policy and thresholds.",
            )
            out["trade_id"] = self.open_trade_id
        elif bool(event.closed) and self.open_trade_id is not None:
            why = "STOP" if int(event.close_reason) == LC.CLOSE_STOP else "TARGET"
            trow = self.conn.execute(
                "SELECT side, stop FROM trades WHERE id=?", (self.open_trade_id,)
            ).fetchone()
            side = trow[0] if trow else "long"
            pnl = _db.close_trade(self.conn, self.open_trade_id, price, why)
            _db.audit(self.conn, "EXIT", why, f"{why} hit at {price:.2f}", {})
            # real exit features: volume trend toward the trade's level
            # (reconstructed from the stored stop: level = stop ± STOP_PADDING)
            # computed over the carry's bar ring, and the actual session clock
            volume_trend = 0.0
            if trow is not None and trow[1] is not None:
                sp = float(np.asarray(self.params.stop_padding))
                lvl = float(trow[1]) + (sp if side == "long" else -sp)
                b_close, b_vol, b_valid = self.carry.bars.ordered()
                vt, vt_defined = F.volume_trend_toward_level(
                    b_close, b_vol, b_valid, np.float32(lvl)
                )
                if bool(np.asarray(vt_defined)):
                    volume_trend = float(np.asarray(vt))
            ev_id = _db.insert_policy_event(
                self.conn, "exit", "exit_now",
                {"proximity_abs": float(d.dist),
                 "approach": "from_below" if side == "long" else "from_above",
                 "confluence": bool(d.confluence),
                 "minutes_since_open": int(mins),
                 "volume_trend": volume_trend},
                trade_id=self.open_trade_id,
                notes=f"EXPOST_PENDING k={self.exit_label_horizon_bars}",
            )
            self._pending_exits.append(
                [ev_id, side, float(price), self.exit_label_horizon_bars]
            )
            self.qvoice.narrate_exit(
                symbol=self.symbol,
                code="STOP_HIT" if why == "STOP" else "TARGET_HIT",
                reason=why, pnl=pnl,
            )
            out["pnl"] = pnl
            self.open_trade_id = None
        elif bool(event.escalated) and self.open_trade_id is not None:
            new_stop = float(event.new_stop)
            new_target = float(event.new_target)
            self.conn.execute("UPDATE trades SET stop=?, target=? WHERE id=?",
                              (new_stop, new_target, self.open_trade_id))
            self.conn.commit()
            _db.audit(self.conn, "EXIT", "ESCALATE",
                      f"Rolled target→{new_target:.2f}, trailed stop→{new_stop:.2f}", {})
        return out

    # ---- background cadences ----
    def maybe_retrain(self, now_s: float | None = None) -> int:
        now_s = time.time() if now_s is None else now_s
        if now_s - self._last_retrain < self.retrain_interval_s:
            return 0
        self._last_retrain = now_s
        self.policy, n, wm = trainstore.retrain_from_labeled_events(
            self.conn, self.policy, max_rows=1000
        )
        if n:
            os.makedirs(os.path.dirname(self.policy_path) or ".", exist_ok=True)
            ckpt.save_policy_npz(self.policy_path, self.policy)
            self.log(f"POLICY TRAIN: {n} events, watermark → {wm}")
        return n

    def maybe_reload_levels(self, now_s: float | None = None):
        now_s = time.time() if now_s is None else now_s
        if now_s - self._last_levels_reload > 5.0 and self.open_trade_id is None:
            self._last_levels_reload = now_s
            self.reload_levels()

    # ---- the loop ----
    def run(self, max_ticks: int | None = None, sleep=time.sleep,
            on_tick=None) -> int:
        n = 0
        while max_ticks is None or n < max_ticks:
            try:
                status = self.feed.get_market_status(self.api_key)
                market_open = status.is_open or (
                    self.allow_ah and status.session == "extended-hours"
                )
                if not market_open:
                    pclose, _err = self.feed.get_prev_close(self.api_key)
                    if pclose is None:
                        break
                    sleep(2.0)
                    n += 1
                    continue
                price, t_ms, err = self.feed.get_last_trade(self.api_key)
                if err:
                    _db.audit(self.conn, "FEED", "FEED_ERR",
                              f"Price fetch error: {err}")
                    if err == "exhausted":
                        break
                    sleep(1.0)
                    n += 1
                    continue
                out = self.tick(price, t_ms)
                if on_tick is not None:
                    on_tick(n, out)
                self.maybe_reload_levels()
                self.maybe_retrain()
                sleep(self.tick_sleep)
            except Exception as e:  # absorbed like the reference (:3192-3195)
                _db.audit(self.conn, "MISC", "ENGINE_ERR", str(e), {})
                sleep(1.0)
            n += 1
        return n

    def portfolio(self, last_price: float | None = None) -> dict:
        start = float(_db.settings_get(self.conn, "portfolio_start", "10000") or 10000)
        return port.snapshot(self.conn, start, self.open_trade_id, last_price)
