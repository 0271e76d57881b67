"""Session keepalive: the headless analog of the reference's keepalive.py.

The reference wiggles the mouse via pyautogui every 300 s to keep a desktop
session awake (keepalive.py:1-11).  A server deployment has no desktop; the
equivalent liveness concern is idle connections and silent stalls, so this
heartbeat periodically touches the SQLite store (a DIAG/PING audit row, exactly
the `_Diag.ping` pattern at qmmx_monolithic.py:37-40) and optionally pings the
feed, giving the audit log a monotonic liveness trail.
"""

from __future__ import annotations

import time

from ..io import db as _db


def run(db_path: str = "qmmx.db", *, interval_s: float = 300.0,
        feed=None, api_key: str = "", max_beats: int | None = None,
        sleep=time.sleep) -> int:
    conn = _db.db_connect(db_path)
    _db.db_init(conn)
    beats = 0
    while max_beats is None or beats < max_beats:
        extras = {}
        if feed is not None:
            try:
                status = feed.get_market_status(api_key)
                extras = {"session": status.session}
            except Exception as e:
                extras = {"feed_error": str(e)}
        _db.audit(conn, "DIAG", "PING", "keepalive ok", extras)
        beats += 1
        if max_beats is None or beats < max_beats:
            sleep(interval_s)
    return beats


if __name__ == "__main__":
    run()
