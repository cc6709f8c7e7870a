#!/usr/bin/env bash
# REAL two-cluster-size scaling evidence (BASELINE.json north rule):
# a Spark STANDALONE cluster on this host — real master/worker daemons,
# real executor JVMs, broadcasts over RPC, spark-submit as the entry
# point — run at N=1 worker vs 4N=4 workers.
#
# This complements tools/bench_scaling.sh (taskset-pinned local[N]):
# local mode isolates the software's thread-scaling; this exercises the
# actual deployment path (serialization, executor launch, cluster
# scheduler). Same single-box DRAM caveat for the 32-core point.
#
# Usage: tools/bench_cluster.sh [nDocs]
set -euo pipefail
cd "$(dirname "$0")/.."
NDOCS="${1:-200000}"
JAR=$(ls target/scala-2.13/*spark_2.13*.jar | head -1)
source tools/cluster_lib.sh

start_cluster_master

submit() { # shuffle-partitions expected-cores exec-mem
  "$SPARK/bin/spark-submit" --master spark://127.0.0.1:7077 \
    --class graft.tools.BenchCluster \
    --driver-memory 4g --executor-memory "${3:-7g}" \
    --conf spark.sql.shuffle.partitions="$1" \
    --conf spark.ui.enabled=false \
    --conf spark.executor.extraJavaOptions=-XX:+UseParallelGC \
    --conf spark.driver.extraJavaOptions=-XX:+UseParallelGC \
    "$JAR" "$NDOCS" "$2" 2>/dev/null | grep -oE '\{"executors".*\}' | tail -1
}

best3() { # shuffle-partitions expected-cores exec-mem — best of 3 submits
  local best=""
  for t in 1 2 3; do
    local r
    # a single failed submit (host noise, executor OOM) loses one try,
    # not the whole multi-minute harness — the max below skips empties
    r=$(submit "$1" "$2" "$3") || r=""
    echo "    [try $t] ${r:-<failed>}" >&2
    best=$(python3 -c "
import json, sys
cands = [json.loads(x) for x in sys.argv[1:] if x]
print(json.dumps(max(cands, key=lambda c: c['tp'])) if cands else '')" "$r" "$best")
  done
  [ -n "$best" ] || { echo "all 3 submits failed" >&2; exit 1; }
  echo "$best"
}

# ---- pair A (scaling-faithful: both points BELOW the box's DRAM
# ceiling, like real executor groups with their own memory systems;
# best of 3 submits per point — the host shows ~4x run-to-run noise) ----
echo "== A/N: 1 worker x 2 cores (pinned cpus 0-1) ==" >&2
start_workers 1 2 4g
A1=$(best3 2 2 3g); echo "  $A1" >&2
stop_workers
echo "== A/4N: 4 workers x 2 cores (pinned per 2-core block) ==" >&2
start_workers 4 2 4g
A4=$(best3 8 8 3g); echo "  $A4" >&2
stop_workers

# ---- pair B (box-saturating; single submit per point, reported for
# transparency only — not a tuned measurement) ----
echo "== B/N: 1 worker x 8 cores (pinned cpus 0-7) ==" >&2
start_workers 1 8 7g
B1=$(submit 8 8); echo "  $B1" >&2
stop_workers
echo "== B/4N: 4 workers x 8 cores (pinned per 8-core block) ==" >&2
start_workers 4 8 7g
B4=$(submit 32 32); echo "  $B4" >&2

python3 - "$A1" "$A4" "$B1" "$B4" "$NDOCS" <<'EOF'
import json, sys
a1, a4, b1, b4 = (json.loads(x) for x in sys.argv[1:5])
out = {"docs": int(sys.argv[5]),
       "tp_1w2c": a1["tp"], "tp_4w2c": a4["tp"],
       "eff_A_1w_4w": round(a4["tp"] / (4 * a1["tp"]), 3),
       "tp_1w8c": b1["tp"], "tp_4w8c": b4["tp"],
       "eff_B_1w_4w": round(b4["tp"] / (4 * b1["tp"]), 3)}
print(json.dumps(out))
EOF
