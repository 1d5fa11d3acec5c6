#!/bin/bash
# Scaling-efficiency protocol under real executor isolation (north rule):
# standalone master + one 32-core worker on this host, then interleaved
# spark-submit runs of the identical pipeline job at N executors and 4N
# executors (fixed --executor-cores/--executor-memory, spark.cores.max
# selects the count). Interleaving keeps each N/4N pair under similar
# co-tenant load on this time-shared host (same hygiene as graft.Scaling).
#
# Usage: scripts/scaling_cluster.sh [nPages] [reps] [execCores] [nExecs]
#   default: 120000 pages, 3 interleaved pairs, 4-core executors, N=2 execs
set -u
NPAGES=${1:-120000}
REPS=${2:-3}
ECORES=${3:-4}
NEXECS=${4:-2}
N4EXECS=$((NEXECS * 4))
JAR=target/scala-2.13/entityembedspark_2.13-0.1.0.jar

export SPARK_HOME=/opt/spark
export SPARK_LOG_DIR=/tmp/spark-logs
export SPARK_WORKER_DIR=/tmp/spark-work
export SPARK_PID_DIR=/tmp/spark-pids
export SPARK_LOCAL_IP=127.0.0.1
export SPARK_MASTER_HOST=127.0.0.1
mkdir -p "$SPARK_LOG_DIR" "$SPARK_WORKER_DIR" "$SPARK_PID_DIR"

"$SPARK_HOME/sbin/stop-worker.sh" >/dev/null 2>&1
"$SPARK_HOME/sbin/stop-master.sh" >/dev/null 2>&1
"$SPARK_HOME/sbin/start-master.sh" >/dev/null
sleep 3
"$SPARK_HOME/sbin/start-worker.sh" spark://127.0.0.1:7077 -c 32 -m 100g >/dev/null
sleep 3

submit() { # $1 = total cores for this app
  "$SPARK_HOME/bin/spark-submit" \
    --master spark://127.0.0.1:7077 \
    --deploy-mode client \
    --class graft.tools.ScalingCluster \
    --executor-cores "$ECORES" \
    --executor-memory "${GRAFT_EXEC_MEM:-6g}" \
    --driver-memory 8g \
    --conf spark.cores.max="$1" \
    --conf spark.sql.shuffle.partitions="${GRAFT_SHUFFLE_PARTS:-32}" \
    --conf spark.sql.adaptive.enabled=true \
    --conf spark.ui.enabled=false \
    "$JAR" "$NPAGES" 1 2>/dev/null | grep '\[scalec\]'
}

echo "[protocol] ${NEXECS}x${ECORES}-core executors vs ${N4EXECS}x${ECORES}-core executors, ${NPAGES} pages, ${REPS} interleaved pairs"
for i in $(seq 1 "$REPS"); do
  echo "--- pair $i ---"
  submit $((NEXECS * ECORES))
  submit $((N4EXECS * ECORES))
done

"$SPARK_HOME/sbin/stop-worker.sh" >/dev/null 2>&1
"$SPARK_HOME/sbin/stop-master.sh" >/dev/null 2>&1
