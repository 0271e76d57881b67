"""Training pipelines off the SQLite store: watermarked incremental policy
updates and batch logistic-regression retraining.

Re-expression of the reference's two retraining paths (SURVEY.md §3.5):

* ``retrain_from_labeled_events`` (:3753-3803) — stream labeled ``policy_events``
  past the ``last_trained_policy_event_id`` watermark, rebuild the 7-dim feature
  vector from the stored JSON, apply sequential SGD (models/online_policy
  ``train_events`` scan), persist the watermark — resumable and exactly-once.
* ``build_training_data`` + ``do_retrain`` (:3833-3894) — join ``contact_events``
  to the first trade opened within 120 s, build features, require ≥50 samples,
  fit logistic regression.  The reference's 3-feature set caused the train/serve
  skew (quirk Q5); the default here trains the 4-feature set ``_ml_allowed``
  serves, with ``reference_features=True`` reproducing the skewed 3-feature fit.
* ``auto_tune_conf_threshold`` (:3805-3821) — the dead-in-reference threshold
  nudger, implemented and wired to an explicit call site.
"""

from __future__ import annotations

import json
import sqlite3
from datetime import datetime

import numpy as np

from ..models import logistic as L
from ..models import online_policy as OP
from ..ops.features import POLICY_FEATURE_DIM
from . import db as _db

ENTRY_ACTION_IDS = {a: i for i, a in enumerate(OP.ENTRY_ACTIONS)}
EXIT_ACTION_IDS = {a: i for i, a in enumerate(OP.EXIT_ACTIONS)}

WATERMARK_KEY = "last_trained_policy_event_id"


def _features_from_json(feats: dict) -> list[float]:
    """Rebuild the OnlinePolicy feature vector exactly as :3778-3784."""
    prox = min(1.0, float(feats.get("proximity_abs", 0.0)))
    vt = max(-1.0, min(1.0, float(feats.get("volume_trend", 0.0)) / 1e6))
    approach = str(feats.get("approach", "from_above"))
    ao = [1.0 if approach == c else 0.0 for c in ("from_above", "from_below")]
    cf = 1.0 if bool(feats.get("confluence", False)) else 0.0
    tod = min(1.0, int(feats.get("minutes_since_open", 0)) / 390.0)
    return [1.0, prox, vt] + ao + [cf, tod]


def retrain_from_labeled_events(conn: sqlite3.Connection,
                                policy: OP.PolicyParams,
                                max_rows: int = 1000) -> tuple[OP.PolicyParams, int, int]:
    """One incremental pass. Returns (new_policy, n_updates, new_watermark)."""
    last_id = int(_db.settings_get(conn, WATERMARK_KEY, "0") or 0)
    rows = conn.execute(
        """SELECT id, phase, action, features_json, label FROM policy_events
           WHERE label IS NOT NULL AND id > ? ORDER BY id ASC LIMIT ?""",
        (last_id, max_rows),
    ).fetchall()
    if not rows:
        return policy, 0, last_id

    xs, phases, actions, labels, valid = [], [], [], [], []
    trained_up_to = last_id
    for _id, phase, action, fjson, label in rows:
        try:
            feats = json.loads(fjson or "{}")
            # events written by the open path store {"x": [...]} directly (:3147)
            if "x" in feats and isinstance(feats["x"], list):
                x = [float(v) for v in feats["x"]][:POLICY_FEATURE_DIM]
                x = x + [0.0] * (POLICY_FEATURE_DIM - len(x))
            else:
                x = _features_from_json(feats)
            if phase == "entry":
                a = ENTRY_ACTION_IDS.get(action, ENTRY_ACTION_IDS["skip"])
                ph = 0
            elif phase == "exit":
                a = EXIT_ACTION_IDS.get(action, EXIT_ACTION_IDS["hold"])
                ph = 1
            else:
                trained_up_to = _id
                continue
            xs.append(x)
            phases.append(ph)
            actions.append(a)
            labels.append(int(label))
            valid.append(True)
            trained_up_to = _id
        except Exception:
            trained_up_to = _id  # skip malformed rows, advance watermark (:3796-3797)

    n = len(xs)
    if n:
        policy = OP.train_events(
            policy,
            np.asarray(xs, np.float32),
            np.asarray(phases, np.int32),
            np.asarray(actions, np.int32),
            np.asarray(labels, np.int32),
            np.asarray(valid),
        )
    _db.settings_set(conn, WATERMARK_KEY, str(trained_up_to))
    return policy, n, trained_up_to


def _parse_iso(s):
    try:
        return datetime.fromisoformat(s.replace("Z", "+00:00"))
    except (ValueError, AttributeError):
        return None


def build_training_data(conn: sqlite3.Connection,
                        reference_features: bool = False):
    """contact_events ⋈ first trade opened within [0, 120]s (:3864-3894).

    Default features (fixed, matches the 4-feature serving path
    ``_ml_allowed`` :1457-1461): [lvl_type, distance, touch_count≡1, approach_up].
    ``reference_features=True``: the reference's skewed 3-feature set
    [lvl_type, distance, approach_up].
    """
    contacts = conn.execute(
        "SELECT id, ts, symbol, level_color, level_type, level_index, "
        "level_price, approach, reaction, distance FROM contact_events "
        "ORDER BY id ASC"
    ).fetchall()
    trades = conn.execute(
        "SELECT id, ts_open, ts_close, side, entry, exit, pnl FROM trades "
        "ORDER BY id ASC"
    ).fetchall()
    xs, ys = [], []
    for (_cid, ts, _sym, _color, ltype, _lidx, _lprice, approach, _react,
         dist) in contacts:
        t_contact = _parse_iso(ts)
        if not t_contact:
            continue
        best = None
        for (tid, ts_open, _tsc, _side, _entry, _exit, pnl) in trades:
            to = _parse_iso(ts_open) if ts_open else None
            if not to:
                continue
            delta = (to - t_contact).total_seconds()
            if 0 <= delta <= 120:
                best = pnl
                break
        if best is None:
            continue
        lvl_type = 1.0 if ltype == "solid" else 0.0
        direc = 1.0 if approach == "up" else 0.0
        distf = float(dist) if dist is not None else 0.0
        if reference_features:
            xs.append([lvl_type, distf, direc])
        else:
            xs.append([lvl_type, distf, 1.0, direc])
        ys.append(1 if (best is not None and best > 0) else 0)
    d = 3 if reference_features else 4
    x = np.asarray(xs, np.float64).reshape(len(ys), d) if ys else np.zeros((0, d))
    return x, np.asarray(ys, np.int32)


def do_retrain(conn: sqlite3.Connection, *, min_samples: int = 50,
               reference_features: bool = False):
    """Batch LR retrain (:3833-3862) with the JAX IRLS fit.
    Returns (LRModel | None, n_samples)."""
    x, y = build_training_data(conn, reference_features=reference_features)
    if len(y) < min_samples:
        return None, len(y)
    model = L.fit(x, y, max_iter=50)
    return model, len(y)


def auto_tune_conf_threshold(conn: sqlite3.Connection, window: int = 200,
                             min_labels: int = 30) -> float | None:
    """Nudge Q_MIN_PROB toward the recent win rate with 0.8/0.2 inertia, clamped
    [0.45, 0.70] (:3805-3821; dead in the reference, live here)."""
    labels = [r[0] for r in conn.execute(
        "SELECT label FROM policy_events WHERE phase='entry' AND label IS NOT NULL "
        "ORDER BY id DESC LIMIT ?",
        (window,),
    ).fetchall()]
    if len(labels) < min_labels:
        return None
    winrate = sum(1 for v in labels if int(v) == 1) / len(labels)
    cur = float(_db.settings_get(conn, "Q_MIN_PROB", "0.60") or 0.60)
    target = min(0.70, max(0.45, winrate))
    new = 0.8 * cur + 0.2 * target
    _db.settings_set(conn, "Q_MIN_PROB", f"{new:.2f}")
    return new
