#!/usr/bin/env bash
# Zero-Scala deployment smoke: package the library, then consume it
# from a plain spark-sql session — the graft JAR on the classpath, the
# engine wired in via spark.sql.extensions, and every query coming
# from a .sql file (tools/smoke.sql). This is exactly how a downstream
# SQL-only team would deploy the engine on a real cluster (swap
# --master and the parquet paths).
#
# Usage: tools/spark_submit_smoke.sh [sf_dir]   (default sf0.01)
set -euo pipefail
cd "$(dirname "$0")/.."

SF_DIR="${1:-/root/testdata/sf0.01}"
SPARK_HOME="${SPARK_HOME:-/opt/spark}"

# Plain `sbt package` is the deployable artifact: the library's only
# dependency is Spark itself, which spark-submit provides — no
# assembly/shading needed.
sbt -batch package
JAR=$(ls target/scala-2.13/datasheetetlspark_*.jar | grep -v -- '-tests' | head -1)

# --jars ships the library to executors; --driver-class-path puts it
# on the driver's boot classpath too, which spark.sql.extensions needs
# (the extension class is instantiated at session construction, before
# --jars-added jars reach the session classloader in the SQL CLI).
"$SPARK_HOME/bin/spark-sql" \
  --master 'local[32]' \
  --jars "$JAR" \
  --driver-class-path "$JAR" \
  --conf spark.sql.extensions=graft.GraftExtensions \
  --conf spark.sql.shuffle.partitions=32 \
  --conf spark.sql.session.timeZone=UTC \
  --conf spark.ui.enabled=false \
  --hivevar dir="$SF_DIR" \
  -f tools/smoke.sql
