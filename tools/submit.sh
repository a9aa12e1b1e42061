#!/usr/bin/env bash
# spark-submit --py-files deployment path (BASELINE.json north rule: "run
# via spark-submit --py-files ... at two cluster sizes N and 4N").
#
# Packages crawler_spark/ as a zip, ships it via --py-files, and runs the
# bench entry. On a real cluster, replace --master with the cluster URL
# and size the executor fleet; locally local[N] stands in:
#
#   tools/submit.sh 8          # N
#   tools/submit.sh 32         # 4N
#   SPARK_GRAFT_FRONTIER_ONLY=1 tools/submit.sh 16
set -euo pipefail
cd "$(dirname "$0")/.."

CPUS="${1:-32}"
ZIP="$(mktemp -d)/crawler_spark.zip"
(cd . && zip -qr "$ZIP" crawler_spark)

SPARK_GRAFT_CPUS="$CPUS" exec spark-submit \
  --master "local[$CPUS]" \
  --conf spark.driver.memory="${SPARK_GRAFT_DRIVER_MEM:-24g}" \
  --py-files "$ZIP" \
  bench.py
