#!/usr/bin/env python3
"""The weak-list criterion, as ONE script over committed artifacts
(VERDICT r12 "do this" #1): round N's builder-claimed weak count and the
judge's recompute must come from the same rule applied to the same two
files, so the number cannot drift with measurement context.

Rule (the bar stated in SCALE.md / VERDICT r12): a query is WEAK iff
  best(query) >= 1.0 s  AND  best(query) > 2 x oracle(query)
where best = min(in-suite best-of-passes, solo re-measure) from the
Spark bench artifact, and oracle = the same-box DuckDB per-query min.
Queries without an oracle timing (spec-only surfaces) are skipped and
counted separately.

Usage: python3 tools/weaklist.py <bench_full.json> <duckdb_bench.json>
Prints one row per weak query (sorted slowest-first) and a final line
  WEAK <n> of <total> [names...]
so SCALE.md can embed the output verbatim and anyone can re-derive it.
"""
import sys, json

bench = json.load(open(sys.argv[1]))
oracle = json.load(open(sys.argv[2]))["queries"]

suite = {k: v for k, v in bench["queries"].items() if v >= 0}
solo = bench.get("solo", {})
# Bench writes solo under the same full names as queries in bench_full.json
best = {k: min(v, solo[k]) if k in solo and solo[k] >= 0 else v
        for k, v in suite.items()}

weak, skipped = [], []
for name, t in best.items():
    o = oracle.get(name)
    if o is None:
        skipped.append(name)
        continue
    if t >= 1.0 and t > 2.0 * o:
        weak.append((t, o, name))

weak.sort(reverse=True)
for t, o, name in weak:
    ratio = t / o if o > 0 else float("inf")
    print(f"{name:28s} spark {t:6.2f}s  oracle {o:6.2f}s  {ratio:5.1f}x")
if skipped:
    print(f"(no oracle timing, skipped: {len(skipped)})")
print(f"WEAK {len(weak)} of {len(best)} "
      f"{sorted(n for _, _, n in weak)}")
