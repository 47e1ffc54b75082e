#!/usr/bin/env bash
# Production Iceberg binding for the pages source (SURVEY §2.1 S1,
# sources/io.py table:<name>). The sandbox has no Iceberg jar, so this
# script documents the EXACT submit line; it runs unchanged on any
# machine with network access to Maven Central.
#
# Pick the iceberg-spark-runtime artifact matching your Spark minor
# (Spark 4.x runtimes are Scala 2.13). For PySpark 4.1.x:
#   org.apache.iceberg:iceberg-spark-runtime-4.1_2.13:<latest>
# (fall back to -4.0_2.13 if your Iceberg release predates Spark 4.1).
#
# Usage: tools/submit_iceberg.sh <warehouse-dir> <stage> [extra args...]
set -euo pipefail

WAREHOUSE=${1:?usage: submit_iceberg.sh <warehouse-dir> <stage> [args...]}
shift

ICEBERG_PKG=${ICEBERG_PKG:-org.apache.iceberg:iceberg-spark-runtime-4.1_2.13:1.10.0}

cd "$(dirname "$0")/.."
rm -f /tmp/engine.zip
zip -qr /tmp/engine.zip osm_addr_tools_spark/

exec spark-submit \
  --packages "$ICEBERG_PKG" \
  --conf spark.sql.extensions=org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions \
  --conf spark.sql.catalog.local=org.apache.iceberg.spark.SparkCatalog \
  --conf spark.sql.catalog.local.type=hadoop \
  --conf "spark.sql.catalog.local.warehouse=$WAREHOUSE" \
  --py-files /tmp/engine.zip \
  tools/submit_job.py "$@"
