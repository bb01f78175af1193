#!/usr/bin/env python3
"""DuckDB-side oracle compare for big scale factors.

compare_oracle.py materializes both result sets in pandas and sorts them —
fine at sf0.01 (the driver's gate), hopeless for sf10 outputs like
q_neardup_simhash (~170M pairs: the sort alone needs tens of GB and the
object-dtype canonicalization walks every row in Python). This harness keeps
the ENTIRE compare inside DuckDB:

  1. run the oracle SQL into a temp table `o`
  2. scan the Spark parquet output as `s`, casting each column to `o`'s
     type (DESCRIBE o) so parquet physical types (INT32 vs INT64, FLOAT
     vs DOUBLE) can't manufacture mismatches the values don't have
  3. compare row counts, column-name sets, then
       (s EXCEPT ALL o) UNION ALL (o EXCEPT ALL s)
     — a hash-based multiset difference that spills under memory_limit
     instead of materializing a Python object per cell

Equality is exact (bit-level for floats), the same standard as
compare_oracle.py / the driver's hash: DuckDB's set operations use a total
order where NaN == NaN, so NaN rows compare like values. List columns
compare element-wise natively.

Usage:
  python3 tools/compare_oracle_duck.py <verify_out_dir> <sf_dir> [query ...]
  (no query args = every query in oracle_sql.json)

Env knobs (same as compare_oracle.py): GRAFT_DUCKDB_MEMORY,
GRAFT_DUCKDB_THREADS, GRAFT_DUCKDB_TMP, plus GRAFT_COMPARE_OUT (append a
JSON line per query so a sweep's progress survives a crash).
"""
import glob
import json
import os
import sys
import time

import duckdb

out_dir, sf_dir = sys.argv[1], sys.argv[2]
only = sys.argv[3:]
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
con.sql(f"SET memory_limit='{os.environ.get('GRAFT_DUCKDB_MEMORY', '24GB')}'")
con.sql(f"SET threads={int(os.environ.get('GRAFT_DUCKDB_THREADS', '8'))}")
if os.environ.get("GRAFT_DUCKDB_TMP"):
    con.sql(f"SET temp_directory='{os.environ['GRAFT_DUCKDB_TMP']}'")
    con.sql("SET max_temp_directory_size='120GB'")
for t in TABLES:
    con.sql(f"CREATE VIEW {t} AS FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
names = only if only else sorted(oracle)
rec_path = os.environ.get("GRAFT_COMPARE_OUT")


def record(name, **kw):
    if rec_path:
        with open(rec_path, "a") as f:
            f.write(json.dumps({"query": name, **kw}) + "\n")


fails = 0
for name in names:
    if name not in oracle:
        print(f"SKIP {name}: no oracle SQL")
        record(name, ok=False, err="no oracle SQL")
        continue
    t0 = time.time()
    files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
    if not files:
        print(f"FAIL {name}: no spark output")
        record(name, ok=False, err="no spark output")
        fails += 1
        continue
    try:
        con.sql("DROP TABLE IF EXISTS o")
        con.sql(f"CREATE TEMP TABLE o AS {oracle[name]}")
        schema = con.sql("DESCRIBE o").fetchall()  # (col, type, ...)
        otypes = {r[0]: r[1] for r in schema}
        flist = ", ".join(f"'{f}'" for f in files)
        scols = [r[0] for r in con.sql(
            f"DESCRIBE SELECT * FROM read_parquet([{flist}])").fetchall()]
        if sorted(scols) != sorted(otypes):
            print(f"FAIL {name}: columns spark={sorted(scols)} "
                  f"oracle={sorted(otypes)}")
            record(name, ok=False, err="column mismatch",
                   spark_cols=sorted(scols), oracle_cols=sorted(otypes))
            fails += 1
            continue
        cols = sorted(otypes)
        cast = ", ".join(f'"{c}"::{otypes[c]} AS "{c}"' for c in cols)
        proj = ", ".join(f'"{c}"' for c in cols)
        con.sql("DROP VIEW IF EXISTS s")
        con.sql(f"CREATE TEMP VIEW s AS "
                f"SELECT {cast} FROM read_parquet([{flist}])")
        n_s = con.sql("SELECT count(*) FROM s").fetchone()[0]
        n_o = con.sql("SELECT count(*) FROM o").fetchone()[0]
        if n_s != n_o:
            print(f"FAIL {name}: rows spark={n_s} oracle={n_o}")
            record(name, ok=False, err=f"rows spark={n_s} oracle={n_o}")
            fails += 1
            continue
        diff = con.sql(
            f"SELECT count(*) FROM ("
            f"(SELECT {proj} FROM s EXCEPT ALL SELECT {proj} FROM o) "
            f"UNION ALL "
            f"(SELECT {proj} FROM o EXCEPT ALL SELECT {proj} FROM s))"
        ).fetchone()[0]
        dt = time.time() - t0
        if diff != 0:
            ex = con.sql(
                f"SELECT {proj} FROM s EXCEPT ALL SELECT {proj} FROM o "
                f"LIMIT 3").fetchall()
            print(f"FAIL {name}: {diff} multiset-diff rows "
                  f"(spark-only sample: {ex})")
            record(name, ok=False, rows=int(n_s), sec=round(dt, 1),
                   err=f"{diff} multiset-diff rows")
            fails += 1
        else:
            print(f"OK   {name} ({n_s} rows, {dt:.1f}s)", flush=True)
            record(name, ok=True, rows=int(n_s), sec=round(dt, 1))
    except Exception as e:
        msg = str(e).split("\n")[0][:300]
        print(f"FAIL {name}: {msg}")
        record(name, ok=False, err=msg)
        fails += 1

print(f"\n{len(names)} compared, {fails} FAIL")
sys.exit(1 if fails else 0)
