#!/usr/bin/env python3
"""Aggregate an sf_sweep JSONL into the committed correctness record
format (the bench/correctness_*_full_*.json shape the judge reads).

Usage:
  python3 tools/aggregate_sweep.py <results.jsonl> <out.json> <sf_label> \
      <note...>
Queries with multiple rows keep the LAST (re-runs supersede).
"""
import json
import sys

results_path, out_path, sf = sys.argv[1], sys.argv[2], sys.argv[3]
note = " ".join(sys.argv[4:])

rows = {}
for line in open(results_path):
    try:
        r = json.loads(line)
        rows[r["query"]] = r
    except json.JSONDecodeError:
        pass

queries = {}
for q in sorted(rows):
    r = rows[q]
    entry = {"ok": bool(r.get("ok"))}
    if r.get("rows") is not None:
        entry["rows"] = r["rows"]
    if r.get("sec") is not None:
        entry["oracle_sec"] = r["sec"]
    if r.get("harness"):
        entry["harness"] = r["harness"]
    if r.get("err"):
        entry["err"] = r["err"]
    queries[q] = entry

n_ok = sum(1 for q in queries.values() if q["ok"])
out = {
    "sf": sf,
    "n_queries": len(queries),
    "n_ok": n_ok,
    "n_fail": len(queries) - n_ok,
    "note": note,
    "queries": queries,
}
with open(out_path, "w") as f:
    json.dump(out, f, indent=1, sort_keys=True)
print(f"{out_path}: {n_ok}/{len(queries)} ok")
