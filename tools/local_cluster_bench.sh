#!/usr/bin/env bash
# Multi-JVM validation: run the full battery (and optionally Verify)
# against real separate executor processes via Spark's local-cluster
# mode — the strongest single-machine approximation of a real cluster:
# closures/kernels/custom exec nodes must actually serialize, shuffles
# cross process boundaries over netty, and broadcasts leave the driver
# JVM. local[n] shares one JVM and catches none of that.
#
#   tools/local_cluster_bench.sh bench   [sfDir]   # full 165-query battery
#   tools/local_cluster_bench.sh verify  [sfDir] [outDir]
#
# Topology: 4 workers x 8 cores x 6 GiB = the same 32 cores the
# local[32] batteries use, so numbers are comparable modulo IPC.
set -euo pipefail
cd "$(dirname "$0")/.."
MODE="${1:-bench}"
SF="${2:-/root/testdata/sf0.1}"
OUT="${3:-/tmp/verify_lc}"

sbt -batch package >/dev/null
JAR="$(ls target/scala-2.13/*.jar | grep -v -- '-tests' | head -1)"

export SPARK_HOME=/opt/spark
# Workers build the executor command outside spark-class: the scala
# version probe ("Cannot find any build directories") needs this.
export SPARK_SCALA_VERSION=2.13
export SPARK_GRAFT_MASTER='local-cluster[4,8,6144]'
export SPARK_GRAFT_JAR="$JAR"
export SPARK_GRAFT_CPUS=32

case "$MODE" in
  bench)
    SPARK_GRAFT_SF_DIR="$SF" \
    SPARK_GRAFT_DETAIL_OUT=/tmp/bench_local_cluster.json \
      sbt -batch "runMain graft.Bench"
    echo "detail: /tmp/bench_local_cluster.json"
    ;;
  verify)
    sbt -batch "runMain graft.Verify $SF $OUT"
    echo "dump: $OUT"
    ;;
  *) echo "usage: $0 bench|verify [sfDir] [outDir]" >&2; exit 2 ;;
esac
