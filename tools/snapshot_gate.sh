#!/bin/bash
# Snapshot-commit gate (VERDICT r11 "Next round" #1): the full-surface
# sf1p hash verification must COMPLETE — log ends in `TOTAL OK N of N`
# with zero BAD entries — before an end-of-round snapshot commit. Same
# enforcement status as the per-commit ShuffleBudgetSpec rule.
#
# Usage: tools/snapshot_gate.sh [sf1pDir] [voutDir] [logPath]
# Dumps the whole SparkEntry surface at sf1p via graft.Verify, compares
# every oracle entry in DuckDB, and writes the complete log. Exits
# nonzero unless the TOTAL line certifies every query.
set -u
SF=${1:-/root/repo/target/sf1p}
VOUT=${2:-/root/repo/target/vout_sf1p_gate}
LOG=${3:-/root/repo/target/cmp_sf1p_full_r12.log}
cd /root/repo

CP="/root/repo/target/scala-2.13/classes:/opt/spark/jars/*"
OPENS="--add-opens=java.base/java.lang=ALL-UNNAMED \
  --add-opens=java.base/java.lang.invoke=ALL-UNNAMED \
  --add-opens=java.base/java.lang.reflect=ALL-UNNAMED \
  --add-opens=java.base/java.io=ALL-UNNAMED \
  --add-opens=java.base/java.net=ALL-UNNAMED \
  --add-opens=java.base/java.nio=ALL-UNNAMED \
  --add-opens=java.base/java.util=ALL-UNNAMED \
  --add-opens=java.base/java.util.concurrent=ALL-UNNAMED \
  --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED \
  --add-opens=java.base/sun.nio.ch=ALL-UNNAMED \
  --add-opens=java.base/sun.nio.cs=ALL-UNNAMED \
  --add-opens=java.base/sun.security.action=ALL-UNNAMED \
  --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"

SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-16} \
  java -Xmx48g $OPENS -cp "$CP" graft.Verify "$SF" "$VOUT" \
  2> >(grep -i "\[verify\]" >&2) || { echo "VERIFY DRIVER FAILED"; exit 2; }

python3 tools/oracle_compare.py "$SF" "$VOUT" | tee "$LOG"
tail -1 "$LOG" | grep -q "^TOTAL OK \([0-9]*\) of \1 BAD \[\]$" || {
  echo "SNAPSHOT GATE FAILED: incomplete or non-green sf1p compare ($LOG)"
  exit 1
}
echo "SNAPSHOT GATE PASSED: $(tail -1 "$LOG")"
