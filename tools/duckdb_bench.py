#!/usr/bin/env python3
"""Time the DuckDB oracle suite — the same-box head-to-head partner of
`graft.Bench` (SCALE.md). Per-query min over N passes, warm connection.

Usage: python3 tools/duckdb_bench.py <sfDir> <oracle_sql.json> [passes=2] [timeout_s=0]
Prints one JSON line: {"total": s, "n": k, "queries": {...}, "timeouts": [...]}

timeout_s > 0 interrupts any query past that wall-clock (duckdb
con.interrupt() from a timer thread) and records the elapsed time as a
LOWER BOUND, listing the query under "timeouts". Needed at sf10p where
a few oracle formulations are superlinear; a lower-bound oracle time
only UNDERSTATES the spark-vs-oracle ratio's denominator, so a weak
verdict derived from it is conservative in spark's favor — never
flattering.
"""
import sys, json, time, os, threading
import duckdb

sf = sys.argv[1]
sqlfile = sys.argv[2]
passes = int(sys.argv[3]) if len(sys.argv) > 3 else 2
timeout_s = float(sys.argv[4]) if len(sys.argv) > 4 else 0.0

con = duckdb.connect()
for t in ['region', 'nation', 'customer', 'supplier', 'part', 'orders',
          'lineitem', 'events', 'documents', 'embeddings']:
    p = f'{sf}/{t}.parquet'
    if os.path.isdir(p):
        p = f'{p}/*.parquet'
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

sqls = json.load(open(sqlfile))
times = {}
timeouts = []
for name, sql in sorted(sqls.items()):
    best = float('inf')
    completed = 0
    timed_out_any = False
    for _ in range(passes):
        timer = None
        # done-flag guards the race (ADVICE r14): if the timer fires in
        # the window AFTER fetchall() returns but BEFORE timer.cancel(),
        # an unguarded con.interrupt() would abort the NEXT execution and
        # mislabel a fast query as a near-zero "timeout lower bound".
        done = threading.Event()
        if timeout_s > 0:
            timer = threading.Timer(
                timeout_s, lambda: None if done.is_set() else con.interrupt())
            timer.start()
        t0 = time.time()
        this_timed_out = False
        try:
            con.execute(sql).fetchall()
            completed += 1
        except duckdb.InterruptException:
            this_timed_out = True
            timed_out_any = True
        finally:
            done.set()
            if timer:
                timer.cancel()
        best = min(best, time.time() - t0)
        if this_timed_out:
            break  # no point paying the timeout again
    times[name] = round(best, 3)
    # TIMEOUT labels a LOWER BOUND — only honest when NO pass completed;
    # a genuine completed-pass time must never carry the label
    timed_out = timed_out_any and completed == 0
    if timed_out:
        timeouts.append(name)
    print(f'{name} {best:.3f}{" TIMEOUT(lower bound)" if timed_out else ""}',
          file=sys.stderr, flush=True)

print(json.dumps({"total": round(sum(times.values()), 3),
                  "n": len(times), "queries": times, "timeouts": timeouts}))
