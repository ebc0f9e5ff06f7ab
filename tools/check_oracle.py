#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [query ...]

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs the
matching oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB with the
sfDir tables registered as views, and compares: column sets (by name), row
counts, and values (columns sorted by name, rows sorted, exact compare after
normalizing ints/floats/timestamps). Dev tool only — NOT part of the library.
"""
import json, math, re, sys
from pathlib import Path

import duckdb
import pyarrow.dataset as ds

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


# DuckDB output types Spark can never emit. Any oracle query producing one
# (even nested inside a LIST/STRUCT) is a latent driver-hash mismatch —
# e.g. sum() OVER silently promotes BIGINT to HUGEINT (int128), which the
# driver's canonicalizer renders differently from Spark's int64 even when
# the values are equal (the round-10 q_sessionize/q_bpe_learn failure).
# TIME\b(?!STAMP| ZONE) bans DuckDB's bare TIME / TIME WITH TIME ZONE
# (time-of-day, which Spark lacks) without tripping on TIMESTAMP or
# TIMESTAMP WITH TIME ZONE (both Spark-expressible)
BANNED_TYPES = re.compile(r"HUGEINT|UHUGEINT|UBIGINT|UINTEGER|USMALLINT"
                          r"|UTINYINT|DECIMAL|INTERVAL|TIME\b(?!STAMP| ZONE)"
                          r"|UUID|BIT\b")


def lint_types(con, name, sql):
    """DESCRIBE the oracle query; return the list of banned-type columns."""
    rows = con.execute(f"DESCRIBE {sql}").fetchall()
    return [(c, t) for c, t, *_ in rows if BANNED_TYPES.search(t)]


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return int(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # repr-strict: -0.0 and 0.0 are equal under float compare but NOT
        # under the driver's hash canonicalization (round-10 q_rolling_z
        # failed on exactly one -0.0 cell) — compare the repr instead
        return repr(v)
    if isinstance(v, int):
        return int(v)
    if hasattr(v, "isoformat"):  # datetime/date — truncate to µs string
        s = v.isoformat()
        return s
    if isinstance(v, list):
        return tuple(norm_cell(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, norm_cell(x)) for k, x in v.items()))
    return str(v)


def canon(cols, rows):
    """columns sorted by name; rows as sorted tuples in that column order."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [cols[i] for i in order], out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.loads(Path(out_dir, "oracle_sql.json").read_text())
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        p = Path(sf_dir, f"{t}.parquet")
        if p.exists():
            # driver testdata is one file per table; generated scale-ups
            # (Sf1Gen) are Spark part-file directories — glob those
            src = f"{p}/*.parquet" if p.is_dir() else str(p)
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        res_dir = Path(out_dir, name)
        if not res_dir.exists():
            print(f"FAIL {name}: no Spark result dir")
            n_fail += 1
            continue
        tbl = ds.dataset(str(res_dir), format="parquet").to_table()
        s_cols = list(tbl.column_names)
        s_rows = [tuple(d[c] for c in s_cols) for d in tbl.to_pylist()]
        try:
            bad_types = lint_types(con, name, oracle[name])
        except Exception as e:
            print(f"FAIL {name}: oracle DESCRIBE error: {e}")
            n_fail += 1
            continue
        if bad_types:
            print(f"FAIL {name}: oracle emits non-Spark types {bad_types} "
                  f"(CAST to BIGINT/DOUBLE in the oracle SQL)")
            n_fail += 1
            continue
        try:
            cur = con.execute(oracle[name])
            d_cols = [c[0] for c in cur.description]
            d_rows = cur.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        sc, sr = canon(s_cols, s_rows)
        dc, dr = canon(d_cols, d_rows)
        if sc != dc:
            print(f"FAIL {name}: columns spark={sc} duckdb={dc}")
            n_fail += 1
            continue
        if len(sr) != len(dr):
            print(f"FAIL {name}: rows spark={len(sr)} duckdb={len(dr)}")
            n_fail += 1
            continue
        bad = [(a, b) for a, b in zip(sr, dr) if a != b]
        if bad:
            print(f"FAIL {name}: {len(bad)}/{len(sr)} row mismatches; first: spark={bad[0][0]} duckdb={bad[0][1]}")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(sr)} rows)")
        n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail / {len(oracle)} oracled")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
