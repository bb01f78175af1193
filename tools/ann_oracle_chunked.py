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
# The assignment CTE is named `i_asg` (ANN index family) or `asg`
# (q_semantic_dedup); its body is extracted by paren matching (not a
# next-CTE marker, which differs per query), and its cross-product join
# is one of two fixed spellings. Everything before it is the head
# (WITH e/nc/seeds/cent), everything after is the tail.
ASG_NAMES = ["i_asg AS (", "asg AS ("]
JOIN_MARKS = ["FROM e, i_cent cent GROUP BY e.vec_id",
              "FROM e, cent GROUP BY e.vec_id"]
asg_mark = next((m for m in ASG_NAMES
                 if f"\n{m}" in sql or sql.startswith(m)), None)
assert asg_mark, "oracle SQL shape changed; no assignment CTE found"
asg_name = asg_mark.split(" ")[0]
start = sql.index(asg_mark)
body_start = start + len(asg_mark)
depth = 1
i = body_start
while depth > 0:
    if sql[i] == "(":
        depth += 1
    elif sql[i] == ")":
        depth -= 1
    i += 1
body_end = i - 1  # the CTE's closing paren
head = sql[:start].rstrip().rstrip(",")
asg_body = sql[body_start:body_end]
tail = sql[body_end + 1:].lstrip().lstrip(",").lstrip()
join_mark = next((m for m in JOIN_MARKS if m in asg_body), None)
assert join_mark, "oracle SQL shape changed; no cross-product join found"
assert asg_body.count(join_mark) == 1

n = con.sql(f"SELECT max(vec_id) + 1 FROM embeddings").fetchone()[0]
con.sql("CREATE TEMP TABLE asg_acc (vec_id BIGINT, cell BIGINT)")
# GRAFT_ASG_CACHE=<path.parquet>: persist the chunked assignment across
# retries — the asg loop is ~17 min at sf10 and per-query-identical for a
# given (query, sf), so tail-side failures shouldn't pay it again
cache = os.environ.get("GRAFT_ASG_CACHE")
if cache and os.path.exists(cache):
    con.sql(f"INSERT INTO asg_acc SELECT * FROM read_parquet('{cache}')")
    print(f"  asg loaded from cache {cache}", file=sys.stderr)
    n = 0  # skip the loop
lo = 0
while lo < n:
    hi = lo + chunk
    # materialize the slice so DuckDB parallelizes over a table, not a
    # single parquet row-group; the seed/centroid CTEs stay full-corpus
    cent_alias = ("i_cent cent" if "i_cent" in join_mark else "cent")
    sliced = asg_body.replace(
        join_mark,
        f"FROM (SELECT * FROM e WHERE e.vec_id >= {lo} AND e.vec_id < {hi}) e,"
        f" {cent_alias} GROUP BY e.vec_id")
    assert sliced != asg_body
    con.sql(f"{head},\nasg_slice AS ({sliced})\n"
            "INSERT INTO asg_acc SELECT vec_id, cell FROM asg_slice")
    print(f"  asg slice [{lo}, {min(hi, n)}) done", file=sys.stderr)
    lo = hi

if cache and not os.path.exists(cache):
    con.sql(f"COPY asg_acc TO '{cache}' (FORMAT PARQUET)")
    print(f"  asg cached to {cache}", file=sys.stderr)

final = f"{head},\n{asg_name} AS (SELECT vec_id, cell FROM asg_acc),\n{tail}"
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
