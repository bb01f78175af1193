#!/usr/bin/env python3
"""Convert tools/compare_oracle.py text output into a committed JSON artifact.

Usage: python3 tools/compare_to_json.py <compare_output.txt> <out.json> [sf_label]
Each `OK   name (N rows)` line becomes {"name": {"ok": true, "rows": N}};
each `FAIL name: reason` line becomes {"name": {"ok": false, "reason": ...}}
(first reason kept). A FAIL can never be overwritten by a later OK for the
same name — conflicting statuses abort, since this script produces
committed correctness records and an inflated n_ok must not pass silently.
Unparsed non-summary lines are counted and surfaced in the JSON for the
same reason. The trailing summary line is recorded verbatim.
"""
import json, re, sys

src, dst = sys.argv[1], sys.argv[2]
sf = sys.argv[3] if len(sys.argv) > 3 else ""
queries, summary, unparsed = {}, "", []
for line in open(src):
    line = line.rstrip("\n")
    m = re.match(r"OK\s+(\S+) \((\d+) rows\)", line)
    if m:
        name = m.group(1)
        if name in queries and not queries[name]["ok"]:
            sys.exit(f"conflicting statuses for {name}: FAIL then OK "
                     f"({queries[name]['reason']!r})")
        queries[name] = {"ok": True, "rows": int(m.group(2))}
        continue
    m = re.match(r"FAIL (\S+?):\s*(.*)", line)
    if m:
        name = m.group(1)
        if name not in queries:
            queries[name] = {"ok": False, "reason": m.group(2)}
        elif queries[name]["ok"]:
            sys.exit(f"conflicting statuses for {name}: OK then FAIL "
                     f"({m.group(2)!r})")
        continue
    if "oracled," in line:
        summary = line
    elif line.strip():
        unparsed.append(line)
n_ok = sum(1 for v in queries.values() if v["ok"])
out = {"sf": sf, "n_queries": len(queries), "n_ok": n_ok,
       "n_fail": len(queries) - n_ok, "n_unparsed": len(unparsed),
       "unparsed": unparsed[:20], "summary": summary, "queries": queries}
json.dump(out, open(dst, "w"), indent=1, sort_keys=True)
print(f"{n_ok}/{len(queries)} ok, {len(unparsed)} unparsed -> {dst}")
