"""ctypes bindings for the native host data path (native/qmmx_native.cpp).

Builds the shared library on demand with g++ (cached next to the source) and
falls back to pure-Python implementations with identical semantics when no
compiler is available — callers never need to care which ran.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_SRC_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_SO_PATH = os.path.abspath(os.path.join(_SRC_DIR, "libqmmx_native.so"))
_SRC_PATH = os.path.abspath(os.path.join(_SRC_DIR, "qmmx_native.cpp"))

_lock = threading.Lock()
_lib = None
_tried = False

_I64 = ctypes.POINTER(ctypes.c_longlong)
_F64 = ctypes.POINTER(ctypes.c_double)
_I32 = ctypes.POINTER(ctypes.c_int32)


def _build() -> bool:
    flags = ["g++", "-O3", "-fPIC", "-shared", "-std=c++17"]
    out = ["-o", _SO_PATH, _SRC_PATH]
    # prefer the sqlite-enabled build (batched audit writer); the image ships
    # libsqlite3.so.0 without dev headers, so link it by exact soname
    for cmd in (flags + ["-DQMMX_WITH_SQLITE"] + out + ["-l:libsqlite3.so.0"],
                flags + out):
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            return True
        except Exception:
            continue
    return False


def load() -> ctypes.CDLL | None:
    """Load (building if needed) the native library; None when unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO_PATH) or (
            os.path.exists(_SRC_PATH)
            and os.path.getmtime(_SRC_PATH) > os.path.getmtime(_SO_PATH)
        ):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
        except OSError:
            return None
        lib.qmmx_aggregate_ticks.restype = ctypes.c_longlong
        lib.qmmx_aggregate_ticks.argtypes = [
            _I64, _F64, _F64, ctypes.c_longlong,
            _I64, _F64, _F64, _F64, _F64, _F64, ctypes.c_longlong,
        ]
        lib.qmmx_parse_bars_csv.restype = ctypes.c_longlong
        lib.qmmx_parse_bars_csv.argtypes = [
            ctypes.c_char_p, _I64, _F64, _F64, _F64, _F64, _F64,
            ctypes.c_longlong,
        ]
        lib.qmmx_resample_returns.restype = None
        lib.qmmx_resample_returns.argtypes = [
            _F64, _F64, _F64, _F64, _I32,
            ctypes.c_longlong, ctypes.c_longlong, ctypes.c_double,
            _F64, _F64, _F64, _F64,
        ]
        if hasattr(lib, "qmmx_audit_batch_write"):
            _CPP = ctypes.POINTER(ctypes.c_char_p)
            lib.qmmx_audit_batch_write.restype = ctypes.c_longlong
            lib.qmmx_audit_batch_write.argtypes = [
                ctypes.c_char_p, _CPP, _CPP, _CPP, _CPP, _CPP,
                ctypes.c_longlong,
            ]
        _lib = lib
        return _lib


def available() -> bool:
    return load() is not None


def _ptr(a, typ):
    return a.ctypes.data_as(typ)


def aggregate_ticks(ts_ms, price, volume=None):
    """Tick prints → 1-minute OHLCV bars (reference ingest_tick bucketing,
    qmmx_monolithic.py:1857-1883).  Returns dict of numpy arrays."""
    ts_ms = np.ascontiguousarray(ts_ms, np.int64)
    price = np.ascontiguousarray(price, np.float64)
    n = len(ts_ms)
    if volume is None:
        volume = np.zeros(n, np.float64)
    volume = np.ascontiguousarray(volume, np.float64)

    lib = load()
    if lib is not None:
        max_bars = n + 1
        bt = np.empty(max_bars, np.int64)
        o = np.empty(max_bars, np.float64)
        h = np.empty(max_bars, np.float64)
        l = np.empty(max_bars, np.float64)
        c = np.empty(max_bars, np.float64)
        v = np.empty(max_bars, np.float64)
        nb = lib.qmmx_aggregate_ticks(
            _ptr(ts_ms, _I64), _ptr(price, _F64), _ptr(volume, _F64), n,
            _ptr(bt, _I64), _ptr(o, _F64), _ptr(h, _F64), _ptr(l, _F64),
            _ptr(c, _F64), _ptr(v, _F64), max_bars,
        )
        if nb >= 0:
            return {"t": bt[:nb], "o": o[:nb], "h": h[:nb], "l": l[:nb],
                    "c": c[:nb], "v": v[:nb]}
    return _aggregate_ticks_py(ts_ms, price, volume)


def _aggregate_ticks_py(ts_ms, price, volume):
    bars = {"t": [], "o": [], "h": [], "l": [], "c": [], "v": []}
    cur_m = None
    for i in range(len(ts_ms)):
        m = int(ts_ms[i]) // 60000
        p = float(price[i])
        if m != cur_m:
            cur_m = m
            bars["t"].append(int(ts_ms[i]) - int(ts_ms[i]) % 60000)
            bars["o"].append(p)
            bars["h"].append(p)
            bars["l"].append(p)
            bars["c"].append(p)
            bars["v"].append(float(volume[i]))
        else:
            bars["c"][-1] = p
            bars["h"][-1] = max(bars["h"][-1], p)
            bars["l"][-1] = min(bars["l"][-1], p)
            bars["v"][-1] += float(volume[i])
    return {
        "t": np.asarray(bars["t"], np.int64),
        "o": np.asarray(bars["o"], np.float64),
        "h": np.asarray(bars["h"], np.float64),
        "l": np.asarray(bars["l"], np.float64),
        "c": np.asarray(bars["c"], np.float64),
        "v": np.asarray(bars["v"], np.float64),
    }


def parse_bars_csv(path: str, max_rows: int = 1 << 22):
    """Fast CSV bar loader (header t,o,h,l,c[,v] in any column order)."""
    lib = load()
    if lib is not None:
        ts = np.empty(max_rows, np.int64)
        o = np.empty(max_rows, np.float64)
        h = np.empty(max_rows, np.float64)
        l = np.empty(max_rows, np.float64)
        c = np.empty(max_rows, np.float64)
        v = np.empty(max_rows, np.float64)
        n = lib.qmmx_parse_bars_csv(
            path.encode(), _ptr(ts, _I64), _ptr(o, _F64), _ptr(h, _F64),
            _ptr(l, _F64), _ptr(c, _F64), _ptr(v, _F64), max_rows,
        )
        if n == -1:
            raise FileNotFoundError(path)
        if n >= 0:
            return {"t": ts[:n], "o": o[:n], "h": h[:n], "l": l[:n],
                    "c": c[:n], "v": v[:n]}
        # n == -2: malformed header → let the Python path raise a clear error
    return _parse_bars_csv_py(path)


def _parse_bars_csv_py(path: str):
    import csv

    cols = {"t": [], "o": [], "h": [], "l": [], "c": [], "v": []}
    with open(path) as f:
        reader = csv.DictReader(f)
        if reader.fieldnames is None or not {"t", "o", "h", "l", "c"} <= set(
            reader.fieldnames
        ):
            raise ValueError(f"{path}: header must contain t,o,h,l,c")
        for row in reader:
            cols["t"].append(int(float(row["t"])))
            for k in ("o", "h", "l", "c"):
                cols[k].append(float(row[k]))
            cols["v"].append(float(row.get("v", 0.0) or 0.0))
    return {
        "t": np.asarray(cols["t"], np.int64),
        "o": np.asarray(cols["o"], np.float64),
        "h": np.asarray(cols["h"], np.float64),
        "l": np.asarray(cols["l"], np.float64),
        "c": np.asarray(cols["c"], np.float64),
        "v": np.asarray(cols["v"], np.float64),
    }


def audit_batch(db_path: str, rows) -> int:
    """Write audit rows (ts, phase, code, message, extras_json) in ONE
    transaction — the reference commits per row (qmmx_monolithic.py:157),
    which costs one fsync each; batch flows (sim breadcrumbs, WAL imports)
    go through here instead.  Native sqlite3 C-ABI writer when built with
    sqlite support; a single-transaction ``executemany`` otherwise."""
    rows = [tuple(str(x) for x in r) for r in rows]
    n = len(rows)
    if n == 0:
        return 0
    lib = load()
    if lib is not None and hasattr(lib, "qmmx_audit_batch_write"):
        cols = [
            (ctypes.c_char_p * n)(*[r[k].encode() for r in rows])
            for k in range(5)
        ]
        rc = lib.qmmx_audit_batch_write(db_path.encode(), *cols, n)
        if rc >= 0:
            return int(rc)
    import sqlite3

    conn = sqlite3.connect(db_path)
    try:
        with conn:
            conn.executemany(
                "INSERT INTO audit_log(ts, phase, code, message, extras_json)"
                " VALUES(?,?,?,?,?)",
                rows,
            )
    finally:
        conn.close()
    return n


def resample_returns(logc, logh, logl, logo, idx, log_s0: float):
    """Chain bootstrap-resampled bar geometry (host-side materialization for
    feeding the device sampler). idx: int32[P, W]."""
    logc = np.ascontiguousarray(logc, np.float64)
    logh = np.ascontiguousarray(logh, np.float64)
    logl = np.ascontiguousarray(logl, np.float64)
    logo = np.ascontiguousarray(logo, np.float64)
    idx = np.ascontiguousarray(idx, np.int32)
    p, w = idx.shape
    out = [np.empty((p, w), np.float64) for _ in range(4)]
    lib = load()
    if lib is not None:
        lib.qmmx_resample_returns(
            _ptr(logc, _F64), _ptr(logh, _F64), _ptr(logl, _F64),
            _ptr(logo, _F64), _ptr(idx, _I32), p, w, float(log_s0),
            _ptr(out[0], _F64), _ptr(out[1], _F64), _ptr(out[2], _F64),
            _ptr(out[3], _F64),
        )
        return tuple(out)
    # numpy fallback
    r = logc[idx]
    prev = log_s0 + np.concatenate(
        [np.zeros((p, 1)), np.cumsum(r[:, :-1], axis=1)], axis=1
    )
    return prev + r, prev + logh[idx], prev + logl[idx], prev + logo[idx]
