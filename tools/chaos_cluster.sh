#!/usr/bin/env bash
# Executor-loss fault-tolerance demo on the REAL standalone cluster:
# submit graft.tools.ChaosCheck to 4 workers, SIGKILL one executor JVM
# mid-scoring-pass, and verify the job completes with bit-identical
# results (task retry + lineage recompute of the dead executor's cache).
#
# Usage: tools/chaos_cluster.sh [nDocs]
set -euo pipefail
cd "$(dirname "$0")/.."
NDOCS="${1:-400000}"
JAR=$(ls target/scala-2.13/*spark_2.13*.jar | head -1)
SPARK=/opt/spark

export SPARK_LOG_DIR=/tmp/spark-logs SPARK_PID_DIR=/tmp/spark-pids \
  SPARK_WORKER_DIR=/tmp/spark-work SPARK_LOCAL_IP=127.0.0.1 \
  SPARK_MASTER_HOST=127.0.0.1
mkdir -p "$SPARK_LOG_DIR" "$SPARK_PID_DIR" "$SPARK_WORKER_DIR"

cleanup() {
  for i in 0 1 2 3; do
    SPARK_IDENT_STRING="w$i" "$SPARK/sbin/stop-worker.sh" >/dev/null 2>&1 || true
  done
  "$SPARK/sbin/stop-master.sh" >/dev/null 2>&1 || true
  pkill -f 'deploy.worker.Worker' 2>/dev/null || true
  pkill -f 'deploy.master.Master' 2>/dev/null || true
}
trap cleanup EXIT
cleanup; sleep 2

"$SPARK/sbin/start-master.sh" >/dev/null
sleep 3
for i in 0 1 2 3; do
  SPARK_IDENT_STRING="w$i" "$SPARK/sbin/start-worker.sh" \
    spark://127.0.0.1:7077 -c 2 -m 4g \
    --port $((41000 + i)) --webui-port $((42000 + i)) >/dev/null
done
sleep 4

OUT=/tmp/chaos_submit.out
rm -f "$OUT"

# watcher: when the app prints CHAOS-READY, give the second pass a
# moment to start, then SIGKILL one executor JVM (not the daemons)
(
  for _ in $(seq 1 600); do
    if grep -q CHAOS-READY "$OUT" 2>/dev/null; then
      sleep 3
      PID=$(pgrep -f CoarseGrainedExecutorBackend | head -1)
      if [ -n "$PID" ]; then
        echo "[chaos] SIGKILL executor pid $PID" >&2
        kill -9 "$PID"
      fi
      exit 0
    fi
    sleep 0.5
  done
) &
WATCHER=$!

"$SPARK/bin/spark-submit" --master spark://127.0.0.1:7077 \
  --class graft.tools.ChaosCheck \
  --driver-memory 4g --executor-memory 3g \
  --conf spark.sql.shuffle.partitions=8 \
  --conf spark.ui.enabled=false \
  --conf spark.executor.extraJavaOptions=-XX:+UseParallelGC \
  --conf spark.driver.extraJavaOptions=-XX:+UseParallelGC \
  "$JAR" "$NDOCS" 8 2>/dev/null | tee "$OUT" | grep -E 'CHAOS-READY|"match"'
wait "$WATCHER" 2>/dev/null || true
grep -q '"match":true' "$OUT" && echo "CHAOS OK: executor killed mid-pass, results identical"
