"""Portfolio snapshot: equity = starting balance + realized + unrealized.

Re-expression of qmmx_monolithic.py:3246-3303 (one-share units, single open
trade) plus the win/loss counts of ``_refresh_portfolio_ui``.
"""

from __future__ import annotations

import sqlite3


def snapshot(conn: sqlite3.Connection, starting_balance: float,
             open_trade_id: int | None = None,
             last_price: float | None = None) -> dict:
    row = conn.execute(
        "SELECT COALESCE(SUM(pnl),0) FROM trades WHERE ts_close IS NOT NULL"
    ).fetchone()
    realized = float(row[0] or 0.0)

    unreal = 0.0
    if open_trade_id is not None and last_price is not None:
        trow = conn.execute(
            "SELECT side, entry FROM trades WHERE id=?", (open_trade_id,)
        ).fetchone()
        if trow:
            side, entry = trow
            unreal = (last_price - float(entry)) if side == "long" \
                else (float(entry) - last_price)

    wins, losses = conn.execute(
        "SELECT COALESCE(SUM(CASE WHEN pnl>0 THEN 1 ELSE 0 END),0), "
        "COALESCE(SUM(CASE WHEN pnl<=0 THEN 1 ELSE 0 END),0) "
        "FROM trades WHERE ts_close IS NOT NULL"
    ).fetchone()

    return {
        "starting": starting_balance,
        "realized": realized,
        "unrealized": unreal,
        "equity": starting_balance + realized + unreal,
        "wins": int(wins or 0),
        "losses": int(losses or 0),
    }


def trades_table(conn: sqlite3.Connection, *, symbol: str = "", side: str = "",
                 date_from: str = "", date_to: str = "") -> list[dict]:
    """Filterable trades view (reference Trades tab, :2167-2318) with per-row R."""
    q = ("SELECT id, ts_open, ts_close, symbol, side, entry, exit, stop, target, "
         "reason_open, reason_close, pnl FROM trades WHERE 1=1")
    args: list = []
    if symbol:
        q += " AND symbol=?"
        args.append(symbol)
    if side:
        q += " AND side=?"
        args.append(side)
    if date_from:
        q += " AND ts_open>=?"
        args.append(date_from)
    if date_to:
        q += " AND ts_open<=?"
        args.append(date_to)
    q += " ORDER BY id"
    out = []
    for row in conn.execute(q, args).fetchall():
        (tid, ts_open, ts_close, sym, sd, entry, exit_p, stop, target,
         ro, rc, pnl) = row
        r = None
        if pnl is not None and entry is not None and stop is not None:
            risk = abs(float(entry) - float(stop)) or 1e-9
            r = float(pnl) / risk
        out.append({
            "id": tid, "ts_open": ts_open, "ts_close": ts_close, "symbol": sym,
            "side": sd, "entry": entry, "exit": exit_p, "stop": stop,
            "target": target, "reason_open": ro, "reason_close": rc,
            "pnl": pnl, "r": r,
        })
    return out


def export_trades_csv(conn: sqlite3.Connection, path: str, **filters) -> int:
    """CSV export (reference ``_export_trades_csv``, :2319-2333)."""
    import csv

    rows = trades_table(conn, **filters)
    cols = ["id", "ts_open", "ts_close", "symbol", "side", "entry", "exit",
            "stop", "target", "reason_open", "reason_close", "pnl", "r"]
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=cols)
        w.writeheader()
        for r in rows:
            w.writerow(r)
    return len(rows)
