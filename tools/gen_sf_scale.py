#!/usr/bin/env python3
"""Generate a scaled-up fixture set from /root/testdata/sf0.1 by key-shifted
replication (driver-side tooling only — the Scala library never reads this
script's output except through SPARK_GRAFT_SF_DIR like any other sf dir).

Design notes (why replication is shaped this way):
  * Every integer key column is shifted by replica * (max+1) so joins stay
    consistent (lineitem.l_orderkey matches orders.o_orderkey in the same
    replica) and key cardinality grows linearly.
  * documents.text is WORD-ROTATED per replica (rotate word list by 7*r):
    token/vocab statistics are preserved exactly, but shingles/minhashes
    differ across replicas — so near-dup pair counts grow LINEARLY with
    scale instead of quadratically (10 near-identical copies of every doc
    would manufacture ~45x pair blowup that says nothing about the engine).
  * embeddings.embedding is DIM-ROTATED per replica (roll by r): norms and
    within-replica neighborhoods are preserved, across-replica vectors are
    scrambled — ANN work grows linearly.
  * region/nation are dimension tables and are NOT replicated.

Usage: python3 tools/gen_sf_scale.py <src_sf_dir> <out_dir> <replicas>
"""
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SHIFT_COLS = {
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY_ONLY = ["region", "nation"]


def rotate_words(text, r):
    words = text.split(" ")
    if len(words) < 2:
        return text
    k = (7 * r) % len(words)
    return " ".join(words[k:] + words[:k])


def replicate(table_name, tbl, replicas):
    offsets = {c: pc.max(tbl[c]).as_py() + 1 for c in SHIFT_COLS[table_name]}
    out = []
    for r in range(replicas):
        t = tbl
        for c, off in offsets.items():
            idx = t.schema.get_field_index(c)
            shifted = pc.add(t[c], pa.scalar(r * off, type=t.schema.field(c).type))
            t = t.set_column(idx, t.schema.field(c), shifted)
        if r > 0 and table_name == "documents":
            idx = t.schema.get_field_index("text")
            rotated = pa.array([rotate_words(x, r) for x in t["text"].to_pylist()],
                               type=pa.string())
            t = t.set_column(idx, t.schema.field("text"), rotated)
        if r > 0 and table_name == "embeddings":
            idx = t.schema.get_field_index("embedding")
            mat = np.array(t["embedding"].to_pylist(), dtype=np.float32)
            rolled = np.roll(mat, r, axis=1)
            t = t.set_column(idx, t.schema.field("embedding"),
                             pa.array(list(rolled), type=t.schema.field("embedding").type))
        out.append(t)
    return pa.concat_tables(out)


def main(src, dst, replicas):
    import os
    os.makedirs(dst, exist_ok=True)
    for name in COPY_ONLY:
        tbl = pq.read_table(f"{src}/{name}.parquet")
        pq.write_table(tbl, f"{dst}/{name}.parquet")
        print(f"{name}: copied {tbl.num_rows} rows")
    for name in SHIFT_COLS:
        tbl = pq.read_table(f"{src}/{name}.parquet")
        big = replicate(name, tbl, replicas)
        pq.write_table(big, f"{dst}/{name}.parquet")
        print(f"{name}: {tbl.num_rows} -> {big.num_rows} rows")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]))
