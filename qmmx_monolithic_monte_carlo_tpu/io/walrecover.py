"""Recover rows from a raw SQLite WAL file (no main db needed).

The reference snapshot ships only ``qmmx.db-wal`` — the main database was
checkpointed away, so standard SQLite cannot open it.  This module parses the
WAL container format directly (header + frames, salts/commit markers), decodes
the committed table-leaf pages (SQLite record format), and classifies rows by
their column shapes against the known schema (qmmx_monolithic.py:69-127).

This is both a test fixture source (tests/test_wal_replay.py replays the
recovered rows through the strict-quirks engine) and a user-facing recovery
surface: a reference deployment whose db file was lost can still feed its WAL
tail into the audit analyzer / training store.

Format references: https://www.sqlite.org/fileformat2.html (§ WAL, § B-tree
pages, § record format).  Only what the recovery needs is implemented: table
leaf pages (type 0x0D), committed frames of the first salt generation.
"""

from __future__ import annotations

import struct
from typing import Any

WAL_MAGIC = (0x377F0682, 0x377F0683)
_SERIAL_INT_BYTES = {1: 1, 2: 2, 3: 3, 4: 4, 5: 6, 6: 8}


def _varint(buf: bytes, i: int) -> tuple[int, int]:
    result = 0
    for k in range(9):
        byte = buf[i + k]
        if k == 8:
            return (result << 8) | byte, i + 9
        result = (result << 7) | (byte & 0x7F)
        if not byte & 0x80:
            return result, i + k + 1
    raise ValueError("bad varint")


def read_committed_pages(wal_path: str) -> tuple[dict[int, bytes], int, int]:
    """Parse a WAL file → ({page_no: latest committed content}, page_size,
    db_size_pages).  Frames after a salt change or past the last commit marker
    are discarded, mirroring SQLite's recovery rules."""
    with open(wal_path, "rb") as f:
        raw = f.read()
    if len(raw) < 32:
        raise ValueError("not a WAL file (too short)")
    magic, _fmt, page_size, _ckpt = struct.unpack(">IIII", raw[:16])
    if magic not in WAL_MAGIC:
        raise ValueError(f"not a WAL file (magic {magic:#x})")
    salt = raw[16:24]
    frame_size = 24 + page_size
    pages: dict[int, bytes] = {}
    staged: dict[int, bytes] = {}
    db_size = 0
    for i in range((len(raw) - 32) // frame_size):
        off = 32 + i * frame_size
        page_no, size_after = struct.unpack(">II", raw[off:off + 8])
        if raw[off + 8:off + 16] != salt:
            break  # later checkpoint generation; frames no longer valid
        staged[page_no] = raw[off + 24:off + 24 + page_size]
        if size_after:  # commit frame: everything staged becomes durable
            pages.update(staged)
            staged.clear()
            db_size = size_after
    return pages, page_size, db_size


def decode_record(buf: bytes, i: int) -> list[Any]:
    """Decode one SQLite record (header of serial types + body)."""
    header_len, j = _varint(buf, i)
    header_end = i + header_len
    serial_types = []
    while j < header_end:
        t, j = _varint(buf, j)
        serial_types.append(t)
    values: list[Any] = []
    k = header_end
    for t in serial_types:
        if t == 0:
            values.append(None)
        elif t in _SERIAL_INT_BYTES:
            n = _SERIAL_INT_BYTES[t]
            values.append(int.from_bytes(buf[k:k + n], "big", signed=True))
            k += n
        elif t == 7:
            values.append(struct.unpack(">d", buf[k:k + 8])[0])
            k += 8
        elif t == 8:
            values.append(0)
        elif t == 9:
            values.append(1)
        elif t >= 13 and t % 2 == 1:
            n = (t - 13) // 2
            values.append(buf[k:k + n].decode("utf-8", "replace"))
            k += n
        elif t >= 12:
            n = (t - 12) // 2
            values.append(buf[k:k + n])
            k += n
        else:
            raise ValueError(f"unsupported serial type {t}")
    return values


def decode_table_leaf(page: bytes, *, is_page1: bool = False) -> list[tuple[int, list]]:
    """(rowid, values) for every cell of a table-leaf (0x0D) page; [] for
    other page types.  Overflowing cells (payload spilling to overflow pages
    we may not have) decode their in-page prefix only and are skipped on
    error."""
    base = 100 if is_page1 else 0
    if page[base] != 0x0D:
        return []
    n_cells = struct.unpack(">H", page[base + 3:base + 5])[0]
    out = []
    for ci in range(n_cells):
        ptr = struct.unpack(">H", page[base + 8 + 2 * ci:base + 10 + 2 * ci])[0]
        try:
            _payload_len, j = _varint(page, ptr)
            rowid, j = _varint(page, j)
            out.append((rowid, decode_record(page, j)))
        except Exception:
            continue
    return out


def recover(wal_path: str) -> dict[str, Any]:
    """Recover and classify all rows from a qmmx WAL.

    Returns a dict with:
      * ``schema``: {table_name: create_sql} from the sqlite_master page
      * ``price_levels``: [{color, type, index, price}] (load_levels shape)
      * ``audit_log``: [{id, ts, phase, code, message, extras_json}]
      * ``policy_events``: [{id, ts, phase, action, features_json, label,
        trade_id, notes}]
      * ``settings``: {k: v} if the settings page survived
      * ``n_pages``, ``db_size_pages``
    Classification is by column shape (the schema's tables are mutually
    distinguishable), so it works even though interior b-tree pages that
    would name each leaf's table are usually checkpointed away.
    """
    pages, _page_size, db_size = read_committed_pages(wal_path)
    out: dict[str, Any] = {
        "schema": {}, "price_levels": [], "audit_log": [],
        "policy_events": [], "settings": {},
        "n_pages": len(pages), "db_size_pages": db_size,
    }
    for page_no in sorted(pages):
        rows = decode_table_leaf(pages[page_no], is_page1=(page_no == 1))
        for rowid, vals in rows:
            if page_no == 1:
                if len(vals) == 5 and vals[0] == "table":
                    out["schema"][vals[1]] = vals[4]
                continue
            if (len(vals) == 5 and isinstance(vals[1], str)
                    and vals[1] in ("blue", "orange", "black", "teal")
                    and vals[2] in ("solid", "dashed")):
                out["price_levels"].append({
                    "color": vals[1], "type": vals[2],
                    "index": int(vals[3]), "price": float(vals[4]),
                })
            elif len(vals) == 6 and isinstance(vals[1], str) and isinstance(vals[2], str):
                out["audit_log"].append({
                    "id": rowid, "ts": vals[1], "phase": vals[2],
                    "code": vals[3], "message": vals[4], "extras_json": vals[5],
                })
            elif (len(vals) == 8 and isinstance(vals[2], str)
                    and vals[2] in ("entry", "exit")):
                out["policy_events"].append({
                    "id": rowid, "ts": vals[1], "phase": vals[2],
                    "action": vals[3], "features_json": vals[4],
                    "label": vals[5], "trade_id": vals[6], "notes": vals[7],
                })
            elif len(vals) == 2 and all(isinstance(v, str) for v in vals):
                out["settings"][vals[0]] = vals[1]
    return out
