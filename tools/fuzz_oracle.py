#!/usr/bin/env python3
"""DuckDB executor for FuzzDifferentialSpec (dev tool, NOT library code).

Usage: python3 tools/fuzz_oracle.py <sfDir> <queriesJson> <outDir>

Reads <queriesJson> ({name: sql, ...}), registers the canonical fuzz views
(ev/li — every column BIGINT or VARCHAR, derived EXACTLY as the Scala side
derives its base frames), runs each query, and writes <outDir>/<name>.txt:
line 1 = sorted column names (tab-joined); then one line per row — cells of
the name-sorted columns joined by \\x1f, null as \\x00, rows sorted — the
same canonical form the spec computes for the Spark result. A query error
writes ERROR <msg> on line 1 (the spec fails loudly on it).
"""
import json, sys
from pathlib import Path

import duckdb


def main():
    sf_dir, qfile, out_dir = sys.argv[1], sys.argv[2], sys.argv[3]
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    queries = json.loads(Path(qfile).read_text())
    con = duckdb.connect()
    # optional extra views: a views.json next to the queries file maps
    # view name -> parquet path (used by FuzzRangeRewriteSpec's synthetic
    # frames; name/path are caller-controlled dev inputs)
    views = Path(qfile).parent / "views.json"
    if views.exists():
        for name, path in json.loads(views.read_text()).items():
            con.execute(
                f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}/*.parquet')")
    # canonical views: all-BIGINT/VARCHAR, cents via the proven oracle
    # formula, timestamps as epoch micros — keep IN LOCKSTEP with
    # FuzzDifferentialSpec.evBase/liBase
    con.execute(f"""
      CREATE VIEW ev AS
      SELECT event_id, user_id, event_type,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
             epoch_us(CAST(ts AS TIMESTAMP)) AS tsus
      FROM read_parquet('{sf_dir}/events.parquet')""")
    con.execute(f"""
      CREATE VIEW li AS
      SELECT l_orderkey, l_partkey, l_suppkey,
             CAST(l_linenumber AS BIGINT) AS l_linenumber,
             CAST(l_quantity AS BIGINT) AS qty,
             CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS price_cents,
             CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS disc_cents,
             l_returnflag, l_linestatus
      FROM read_parquet('{sf_dir}/lineitem.parquet')""")
    for name, sql in queries.items():
        path = out / f"{name}.txt"
        try:
            # materialize through a table first: duckdb 1.0's streaming
            # fetchall() can HANG on inequality-only LEFT JOIN results
            # (reproduced: pts LEFT JOIN ivs ON p >= lo AND p <= hi spins
            # forever, while the same query materialized via CTAS returns
            # in milliseconds)
            con.execute(f"CREATE OR REPLACE TABLE __fuzz_result AS {sql}")
            rel = con.execute("SELECT * FROM __fuzz_result")
            cols = [d[0] for d in rel.description]
            rows = rel.fetchall()
        except Exception as e:  # noqa: BLE001 — report, spec fails loudly
            path.write_text("ERROR " + repr(e) + "\n")
            continue
        order = sorted(range(len(cols)), key=lambda i: cols[i])
        def cell(v):
            if v is None:
                return "\x00"
            if isinstance(v, bool):
                return "true" if v else "false"
            if isinstance(v, float):
                raise AssertionError(
                    f"{name}: fuzz queries must not emit floats (col set {cols})")
            return str(v)
        lines = sorted("\x1f".join(cell(r[i]) for i in order) for r in rows)
        path.write_text("\t".join(sorted(cols)) + "\n" +
                        "".join(l + "\n" for l in lines))
    print(f"ran {len(queries)} queries -> {out}")


if __name__ == "__main__":
    main()
