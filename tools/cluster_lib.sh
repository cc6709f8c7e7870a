#!/usr/bin/env bash
# Shared standalone-cluster lifecycle for tools/bench_cluster.sh and
# tools/chaos_cluster.sh. Source this; it defines start_cluster_master,
# start_workers, stop_workers, and installs a cleanup trap.
# All daemon state lives under /tmp (never write /opt/spark).

SPARK=/opt/spark
export SPARK_LOG_DIR=/tmp/spark-logs SPARK_PID_DIR=/tmp/spark-pids \
  SPARK_WORKER_DIR=/tmp/spark-work SPARK_LOCAL_IP=127.0.0.1 \
  SPARK_MASTER_HOST=127.0.0.1
mkdir -p "$SPARK_LOG_DIR" "$SPARK_PID_DIR" "$SPARK_WORKER_DIR"

stop_workers() {
  "$SPARK/sbin/stop-worker.sh" >/dev/null 2>&1 || true
  for i in 0 1 2 3; do
    SPARK_IDENT_STRING="w$i" "$SPARK/sbin/stop-worker.sh" >/dev/null 2>&1 || true
  done
  sleep 2
}

cluster_cleanup() {
  stop_workers
  "$SPARK/sbin/stop-master.sh" >/dev/null 2>&1 || true
  pkill -f 'deploy.worker.Worker' 2>/dev/null || true
  pkill -f 'deploy.master.Master' 2>/dev/null || true
}

start_cluster_master() {
  trap cluster_cleanup EXIT
  cluster_cleanup; sleep 2
  "$SPARK/sbin/start-master.sh" >/dev/null
  sleep 3
}

start_workers() { # n cores-each mem-each — each pinned to its own core block
  local n="$1" c="$2" m="$3"
  for i in $(seq 0 $((n - 1))); do
    local lo=$((i * c)); local hi=$((lo + c - 1))
    SPARK_IDENT_STRING="w$i" taskset -c "$lo-$hi" \
      "$SPARK/sbin/start-worker.sh" spark://127.0.0.1:7077 -c "$c" -m "$m" \
      --port $((41000 + i)) --webui-port $((42000 + i)) >/dev/null
  done
  sleep 4
}
