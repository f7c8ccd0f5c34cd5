#!/usr/bin/env bash
# Cluster entry point (north_rule: spark-submit --py-files on a
# multi-executor cluster). Locally this reproduces bench/pipeline_job.py;
# on a real cluster set MASTER (e.g. yarn / k8s://... / spark://...) and
# executor sizing, and the same job runs unchanged — the engine ships as
# one zip via --py-files.
#
#   bench/submit.sh [cores_or_master] [n_pages]
#   MASTER=yarn EXECUTORS=1000 bench/submit.sh - 1000000000
set -euo pipefail
cd "$(dirname "$0")/.."

LEVEL="${1:-32}"
N_PAGES="${2:-2000000}"
MASTER="${MASTER:-local[$LEVEL]}"

ZIP=/tmp/ocds_entity_extract_spark.zip
rm -f "$ZIP"
zip -qr "$ZIP" ocds_entity_extract_spark -x '*__pycache__*'

exec spark-submit \
  --master "$MASTER" \
  ${EXECUTORS:+--num-executors "$EXECUTORS"} \
  --py-files "$ZIP" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.adaptive.coalescePartitions.parallelismFirst=false \
  --conf spark.sql.adaptive.skewJoin.enabled=true \
  --conf spark.sql.optimizer.canChangeCachedPlanOutputPartitioning=true \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  --conf spark.driver.extraJavaOptions=-XX:+UseParallelGC \
  --conf spark.executor.extraJavaOptions=-XX:+UseParallelGC \
  bench/pipeline_job.py "$LEVEL" "$N_PAGES"
