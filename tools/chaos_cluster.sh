#!/usr/bin/env bash
# Executor-loss fault-tolerance demo on the REAL standalone cluster:
# submit graft.tools.ChaosCheck to 4 workers, SIGKILL one executor JVM
# mid-scoring-pass, and verify (a) the job completes with bit-identical
# results AND (b) the kill actually landed — a run where nothing died
# is a FAILURE, not vacuous success.
#
# Usage: tools/chaos_cluster.sh [nDocs]
set -euo pipefail
cd "$(dirname "$0")/.."
NDOCS="${1:-400000}"
JAR=$(ls target/scala-2.13/*spark_2.13*.jar | head -1)
source tools/cluster_lib.sh

start_cluster_master
start_workers 4 2 4g

OUT=/tmp/chaos_submit.out
KILLED=/tmp/chaos_killed
rm -f "$OUT" "$KILLED"

# watcher: when the app prints CHAOS-READY, give the second pass a
# moment to start, then SIGKILL one executor JVM (not the daemons);
# record the pid so the main script can verify the kill happened
(
  for _ in $(seq 1 1200); do
    if grep -q CHAOS-READY "$OUT" 2>/dev/null; then
      sleep 3
      # refuse a vacuous kill: if the chaos pass already finished, the
      # SIGKILL would land during shutdown and prove nothing
      if grep -q '"match"' "$OUT" 2>/dev/null; then
        echo "[chaos] pass finished before the kill — corpus too small" >&2
        exit 0
      fi
      # scope the kill to THIS app's executors (ChaosCheck prints its
      # app id) — never a concurrent Spark app's executor. No app id =
      # no kill: the main script then fails on the missing $KILLED file.
      APPID=$(grep -o 'CHAOS-READY app=[^ ]*' "$OUT" 2>/dev/null | head -1 | cut -d= -f2 || true)
      if [ -z "$APPID" ]; then
        echo "[chaos] no app id in CHAOS-READY line — refusing an unscoped kill" >&2
        exit 0
      fi
      PID=$(pgrep -f "CoarseGrainedExecutorBackend.*$APPID" | head -1 || true)
      if [ -n "$PID" ]; then
        echo "[chaos] SIGKILL executor pid $PID (app $APPID)" >&2
        kill -9 "$PID" && echo "$PID" > "$KILLED"
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

grep -q '"match":true' "$OUT" || { echo "CHAOS FAIL: results diverged or app failed" >&2; exit 1; }
[ -s "$KILLED" ] || { echo "CHAOS FAIL: no executor was killed (pass too fast or watcher timed out) — rerun with more docs" >&2; exit 1; }
# independent evidence from the master: the executor really was lost
grep -q "because it is EXITED" "$SPARK_LOG_DIR"/spark-root-org.apache.spark.deploy.master.Master-*.out \
  || { echo "CHAOS FAIL: master log shows no executor loss" >&2; exit 1; }
echo "CHAOS OK: executor pid $(cat "$KILLED") SIGKILLed mid-pass, master logged the loss, results identical"
