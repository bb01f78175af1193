#!/usr/bin/env python3
"""Chunked DuckDB oracle for q_ann_ivf at big scale factors.

The generated oracle SQL is exact but DuckDB 1.0's grouped aggregate
MATERIALIZES the |corpus| x nCells cross-product input before radix
partitioning (measured: the 200k x 3125 assignment at sf10 climbs past
100 GB RSS regardless of memory_limit, which the operator under-accounts).
The math itself streams fine — so this harness runs the IDENTICAL
generated SQL with one mechanical rewrite: the corpus arm of the i_asg
CTE is sliced into id ranges, each slice's argmin lands in a temp table,
and the rest of the oracle runs verbatim against the union. Every slice
evaluates the same unrolled d2 expressions, the same min(struct) tie
rule, over the same full-corpus seed/centroid CTEs — per-vector argmin
is independent of every other vector, so the union is bit-identical to
the unchunked aggregate (the r17 verdict's ask #1, shape (a)).

Usage:
  python3 tools/ann_oracle_chunked.py <verify_out_dir> <sf_dir> [chunk_rows] [query]

[query] defaults to q_ann_ivf and may be any of the i_asg-family oracles
(q_ann_ivf / _2l / _filtered / q_ann_ivfpq / _rerank / _res /
q_ann_recall) - all seven generate the IDENTICAL assignment-CTE shape
(SELECT vec_id, cell, min-struct argmin over the e x i_cent cross
product), verified by marker-count assert below. Reads
<verify_out_dir>/oracle_sql.json, compares against
<verify_out_dir>/<query>/*.parquet, prints the same OK/FAIL line format
as compare_oracle.py.
"""
import glob
import json
import os
import sys

import duckdb
import numpy as np
import pandas as pd

out_dir, sf_dir = sys.argv[1], sys.argv[2]
chunk = int(sys.argv[3]) if len(sys.argv) > 3 else 20000
qname = sys.argv[4] if len(sys.argv) > 4 else "q_ann_ivf"

con = duckdb.connect()
con.sql(f"SET memory_limit='{os.environ.get('GRAFT_DUCKDB_MEMORY', '24GB')}'")
con.sql(f"SET threads={int(os.environ.get('GRAFT_DUCKDB_THREADS', '16'))}")
if os.environ.get("GRAFT_DUCKDB_TMP"):
    con.sql(f"SET temp_directory='{os.environ['GRAFT_DUCKDB_TMP']}'")
con.sql(f"CREATE VIEW embeddings AS FROM '{sf_dir}/embeddings.parquet'")

sql = json.load(open(f"{out_dir}/oracle_sql.json"))[qname]

# --- mechanical split of the generated text ------------------------------
# WITH e AS (...), i_nc AS (...), i_seeds AS (...), i_cent AS (...),
# i_asg AS (SELECT ... FROM e, i_cent cent GROUP BY e.vec_id)),
# i_probes AS (... down to the final SELECT
ASG_MARK = "i_asg AS ("
PROBE_MARK = "i_probes AS ("
JOIN_MARK = "FROM e, i_cent cent GROUP BY e.vec_id"
assert ASG_MARK in sql and PROBE_MARK in sql and JOIN_MARK in sql, \
    "oracle SQL shape changed; update the markers"
head = sql[: sql.index(ASG_MARK)].rstrip().rstrip(",")  # WITH e/nc/seeds/cent
asg_body = sql[sql.index(ASG_MARK) + len(ASG_MARK): sql.index(PROBE_MARK)]
asg_body = asg_body.rstrip().rstrip(",").rstrip()
assert asg_body.endswith(")"), asg_body[-80:]
asg_body = asg_body[:-1]  # strip the CTE's closing paren
tail = sql[sql.index(PROBE_MARK):]  # i_probes ... final SELECT

n = con.sql(f"SELECT max(vec_id) + 1 FROM embeddings").fetchone()[0]
con.sql("CREATE TEMP TABLE asg_acc (vec_id BIGINT, cell BIGINT)")
lo = 0
while lo < n:
    hi = lo + chunk
    # materialize the slice so DuckDB parallelizes over a table, not a
    # single parquet row-group; the seed/centroid CTEs stay full-corpus
    sliced = asg_body.replace(
        JOIN_MARK,
        f"FROM (SELECT * FROM e WHERE e.vec_id >= {lo} AND e.vec_id < {hi}) e,"
        f" i_cent cent GROUP BY e.vec_id")
    assert sliced != asg_body
    con.sql(f"{head},\nasg_slice AS ({sliced})\n"
            "INSERT INTO asg_acc SELECT vec_id, cell FROM asg_slice")
    print(f"  asg slice [{lo}, {min(hi, n)}) done", file=sys.stderr)
    lo = hi

final = f"{head},\ni_asg AS (SELECT vec_id, cell FROM asg_acc),\n{tail}"
exp = con.sql(final).df()

files = glob.glob(f"{out_dir}/{qname}/*.parquet")
got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)


def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(by=list(df.columns), ignore_index=True)


ok = sorted(got.columns) == sorted(exp.columns) and len(got) == len(exp)
if ok:
    g, e = canon(got), canon(exp)
    for c in g.columns:
        gv, ev = g[c].to_numpy(), e[c].to_numpy()
        if gv.dtype.kind == "f" or ev.dtype.kind == "f":
            if not np.array_equal(gv.astype(float), ev.astype(float),
                                  equal_nan=True):
                print(f"FAIL {qname}: col {c} float mismatch")
                ok = False
        elif not (gv == ev).all():
            print(f"FAIL {qname}: col {c} mismatch")
            ok = False
else:
    print(f"FAIL {qname}: shape spark=({len(got)}, {sorted(got.columns)}) "
          f"oracle=({len(exp)}, {sorted(exp.columns)})")
if ok:
    print(f"OK   {qname} ({len(got)} rows)")
