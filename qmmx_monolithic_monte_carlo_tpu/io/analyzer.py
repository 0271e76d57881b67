"""Offline audit-log analyzer: skip-reason aggregation.

Re-expression of log_analyzer.py:7-85: queries entry-phase skip policy_events,
aggregates counts per reason with per-reason detail histograms (same detail
formats for PRICE_STALE, COOLDOWN, LEVEL_OVERTOUCHED, CONF_LOW/ML_CONF_LOW,
TOO_FAR, VETO, NO_PLANNER_SIGNAL).  Returns structured data + renders the same
text report; importable (CLI subcommand) instead of a standalone script.
"""

from __future__ import annotations

import json
import sqlite3
from collections import defaultdict


def analyze_policy_events(conn: sqlite3.Connection,
                          actions=("skip", "policy_skip")) -> dict:
    rows = conn.execute(
        "SELECT ts, phase, action, features_json FROM policy_events "
        f"WHERE phase='entry' AND action IN ({','.join('?' * len(actions))})",
        tuple(actions),
    ).fetchall()
    reason_counts: dict[str, int] = defaultdict(int)
    reason_details: dict[str, dict[str, int]] = defaultdict(lambda: defaultdict(int))

    def _fmt(v, spec=".2f"):
        try:
            return format(float(v), spec)
        except (TypeError, ValueError):
            return str(v)

    for ts, phase, action, fjson in rows:
        try:
            extras = json.loads(fjson or "{}")
        except json.JSONDecodeError:
            reason_counts["JSON_PARSE_ERROR"] += 1
            reason_details["JSON_PARSE_ERROR"]["General"] += 1
            continue
        reason = extras.get("reason", "UNKNOWN_REASON")
        reason_counts[reason] += 1
        if reason == "PRICE_STALE":
            detail = (f"last_ts_ms: {extras.get('last_ts_ms', 'N/A')}, "
                      f"now: {extras.get('now', 'N/A')}")
        elif reason == "COOLDOWN":
            detail = f"cooldown_until: {extras.get('cooldown_until_ms', 'N/A')}"
        elif reason == "LEVEL_OVERTOUCHED":
            detail = (f"level: {tuple(extras.get('level', ['N/A'] * 3))}, "
                      f"touches: {extras.get('touch_count', 'N/A')}")
        elif reason in ("CONF_LOW", "ML_CONF_LOW"):
            detail = (f"conf: {_fmt(extras.get('conf', extras.get('ml_prob')))}, "
                      f"min_prob: {_fmt(extras.get('Q_MIN_PROB'))}, "
                      f"level: {extras.get('level_price', 'N/A')}, "
                      f"prox: {_fmt(extras.get('proximity_abs'))}")
        elif reason == "TOO_FAR":
            detail = (f"level: {extras.get('level_price', 'N/A')}, "
                      f"prox: {_fmt(extras.get('proximity_abs'))}, "
                      f"contact_prox: {_fmt(extras.get('CONTACT_PROX'))}")
        elif reason == "VETO":
            detail = f"veto_code: {extras.get('veto', 'N/A')}"
        else:
            detail = "General"
        reason_details[reason][detail] += 1

    return {
        "total": len(rows),
        "counts": dict(reason_counts),
        "details": {k: dict(v) for k, v in reason_details.items()},
    }


def render_report(result: dict) -> str:
    if result["total"] == 0:
        return "No 'entry' phase skip events found in the policy_events table."
    lines = [f"Found {result['total']} 'entry' phase skip events.", "",
             "--- Summary of Skip Reasons ---"]
    for reason, count in sorted(result["counts"].items(), key=lambda kv: -kv[1]):
        lines.append(f"Reason: {reason} (Count: {count})")
        for detail, dcount in sorted(result["details"][reason].items(),
                                     key=lambda kv: -kv[1]):
            lines.append(f"  - {detail}: {dcount} times")
        lines.append("")
    return "\n".join(lines)
