#!/usr/bin/env bash
# Package the engine and run the crawl job via spark-submit --py-files —
# the deployment shape the north rule requires. On a real cluster, swap
# --master for yarn / k8s://... ; the artifact is identical.
set -euo pipefail
cd "$(dirname "$0")/.."

mkdir -p dist
rm -f dist/crawler_spark.zip
zip -qr dist/crawler_spark.zip crawler_spark -x '*__pycache__*'

CORES="${SPARK_GRAFT_CPUS:-8}"
exec /opt/spark/bin/spark-submit \
  --master "local[${CORES}]" \
  --conf spark.sql.shuffle.partitions=$((2 * CORES)) \
  --conf spark.driver.memory=8g \
  --py-files dist/crawler_spark.zip \
  scripts/crawl_job.py --sites 5 --chunks 4 --items 100 --hot-chunks 8 "$@"
