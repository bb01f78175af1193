#!/usr/bin/env python3
"""Streaming variant of gen_sf_scale.py for big replica counts (sf100 =
1000 replicas of sf0.1): writes each replica straight to a ParquetWriter
instead of concatenating 1000 Arrow tables in RAM (the non-streaming
script peaks at the FULL output size — ~60 GB for sf100 lineitem).

Replication semantics are IDENTICAL to gen_sf_scale.py (key shifts by
replica * (max+1), per-replica word rotation for documents, dim rotation
for embeddings, region/nation copied) — see that script's header for why
the rotations keep near-dup pair counts and ANN work linear in sf.
One row group per replica, so the output splits naturally (no hollow
one-row-group files at any size).

Usage:
  python3 tools/gen_sf_scale_stream.py <src_sf_dir> <out_dir> <replicas> \
      [table ...]
  (no table args = all tables; pass e.g. "lineitem events documents" to
  generate only a pilot subset — dims region/nation are always copied)
"""
import os
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


def replica(table_name, tbl, offsets, r):
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
                         pa.array(list(rolled),
                                  type=t.schema.field("embedding").type))
    return t


def main(src, dst, replicas, only):
    os.makedirs(dst, exist_ok=True)
    for name in COPY_ONLY:
        tbl = pq.read_table(f"{src}/{name}.parquet")
        pq.write_table(tbl, f"{dst}/{name}.parquet")
        print(f"{name}: copied {tbl.num_rows} rows", flush=True)
    for name in SHIFT_COLS:
        if only and name not in only:
            continue
        tbl = pq.read_table(f"{src}/{name}.parquet")
        offsets = {c: pc.max(tbl[c]).as_py() + 1 for c in SHIFT_COLS[name]}
        out = f"{dst}/{name}.parquet"
        writer = pq.ParquetWriter(out, tbl.schema)
        try:
            for r in range(replicas):
                writer.write_table(replica(name, tbl, offsets, r))
        finally:
            writer.close()
        meta = pq.read_metadata(out)
        print(f"{name}: {tbl.num_rows} -> {meta.num_rows} rows "
              f"({meta.num_row_groups} row groups)", flush=True)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]), set(sys.argv[4:]))
