#!/usr/bin/env python3
"""Time the DuckDB oracle suite — the same-box head-to-head partner of
`graft.Bench` (SCALE.md). Per-query min over N passes, warm connection.

Usage: python3 tools/duckdb_bench.py <sfDir> <oracle_sql.json> [passes=2]
Prints one JSON line: {"total": s, "n": k, "queries": {name: s, ...}}
"""
import sys, json, time, os
import duckdb

sf = sys.argv[1]
sqlfile = sys.argv[2]
passes = int(sys.argv[3]) if len(sys.argv) > 3 else 2

con = duckdb.connect()
for t in ['region', 'nation', 'customer', 'supplier', 'part', 'orders',
          'lineitem', 'events', 'documents', 'embeddings']:
    p = f'{sf}/{t}.parquet'
    if os.path.isdir(p):
        p = f'{p}/*.parquet'
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

sqls = json.load(open(sqlfile))
times = {}
for name, sql in sorted(sqls.items()):
    best = float('inf')
    for _ in range(passes):
        t0 = time.time()
        con.execute(sql).fetchall()
        best = min(best, time.time() - t0)
    times[name] = round(best, 3)
    print(f'{name} {best:.3f}', file=sys.stderr)

print(json.dumps({"total": round(sum(times.values()), 3),
                  "n": len(times), "queries": times}))
