#!/usr/bin/env python3
"""Convert tools/compare_oracle.py text output into a committed JSON artifact.

Usage: python3 tools/compare_to_json.py <compare_output.txt> <out.json> [sf_label]
Each `OK   name (N rows)` line becomes {"name": {"ok": true, "rows": N}};
each `FAIL name: reason` line becomes {"name": {"ok": false, "reason": ...}}
(first reason kept). The trailing summary line is recorded verbatim.
"""
import json, re, sys

src, dst = sys.argv[1], sys.argv[2]
sf = sys.argv[3] if len(sys.argv) > 3 else ""
queries, summary = {}, ""
for line in open(src):
    line = line.rstrip("\n")
    m = re.match(r"OK\s+(\S+) \((\d+) rows\)", line)
    if m:
        queries[m.group(1)] = {"ok": True, "rows": int(m.group(2))}
        continue
    m = re.match(r"FAIL (\S+?):\s*(.*)", line)
    if m:
        name = m.group(1)
        if name not in queries or queries[name].get("ok"):
            queries[name] = {"ok": False, "reason": m.group(2)}
        continue
    if "oracled," in line:
        summary = line
n_ok = sum(1 for v in queries.values() if v["ok"])
out = {"sf": sf, "n_queries": len(queries), "n_ok": n_ok,
       "n_fail": len(queries) - n_ok, "summary": summary, "queries": queries}
json.dump(out, open(dst, "w"), indent=1, sort_keys=True)
print(f"{n_ok}/{len(queries)} ok -> {dst}")
