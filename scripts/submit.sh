#!/usr/bin/env bash
# spark-submit launcher (north_rule: spark-submit --py-files on a cluster).
# In the sandbox MASTER defaults to local[32]; on a real cluster point it at
# YARN/k8s and the same artifact runs unchanged.
set -euo pipefail
cd "$(dirname "$0")/.."

MASTER="${SPARK_GRAFT_MASTER:-local[${SPARK_GRAFT_CPUS:-32}]}"
DIST=/tmp/manga_translator_spark.zip

# package the engine for executor shipment
rm -f "$DIST"
(cd . && zip -qr "$DIST" manga_translator_spark -x '*__pycache__*')

exec spark-submit \
  --master "$MASTER" \
  --py-files "$DIST" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.shuffle.partitions="${SHUFFLE_PARTITIONS:-64}" \
  jobs/extract.py "$@"
