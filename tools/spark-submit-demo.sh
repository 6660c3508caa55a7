#!/usr/bin/env bash
# Deploy the engine via spark-submit (the north star's literal run shape):
# package the thin application jar (the engine depends only on Spark itself,
# so no assembly/shading is needed — spark-submit ships the primary jar to
# the executors) and run an index build + WAND query demo on a
# multi-executor local-cluster. Swap --master for yarn/k8s/standalone on a
# real cluster; nothing else changes.
#
# Usage: tools/spark-submit-demo.sh [nDocs] [master]
set -euo pipefail
cd "$(dirname "$0")/.."

NDOCS="${1:-200000}"
MASTER="${2:-local-cluster[2,2,2048]}"
JAR=target/scala-2.13/monstachespark_2.13-0.1.0.jar

# thin jar: graft classes only; Spark provides everything else at runtime
sbt -batch package

export SPARK_SCALA_VERSION=2.13
exec /opt/spark/bin/spark-submit \
  --master "$MASTER" \
  --class graft.tools.SubmitDemo \
  --conf spark.sql.shuffle.partitions=8 \
  --conf spark.sql.files.maxPartitionBytes=16m \
  --conf spark.sql.session.timeZone=UTC \
  --conf spark.ui.enabled=false \
  --conf spark.driver.host=127.0.0.1 \
  --conf spark.executor.memory=2g \
  "$JAR" "$NDOCS" "/tmp/graft-submit-$$"
