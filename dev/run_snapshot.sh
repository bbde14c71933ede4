#!/usr/bin/env bash
# Snapshot-classpath runner (r10): copies target/scala-2.13/classes to a
# frozen temp dir and runs a graft main under plain `java`, so a long
# bench/verify doesn't hold the sbt build lock — and a concurrent
# `sbt compile` can't mutate class files under the running JVM's lazy
# classloading. JVM flags mirror build.sbt's javaOptions (Spark 4 on
# JDK 17 needs the add-opens when SparkSession starts outside
# spark-submit).
set -euo pipefail
cd "$(dirname "$0")/.."
main="${1:?usage: dev/run_snapshot.sh <mainClass> [args...]}"
shift || true
snap=$(mktemp -d /tmp/graft-snap.XXXXXX)
trap 'rm -rf "$snap"' EXIT
cp -r target/scala-2.13/classes "$snap/classes"
addopens=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  addopens="$addopens --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  addopens="$addopens --add-opens java.base/$p=ALL-UNNAMED"
done
java $addopens \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  "-Xmx${SPARK_DRIVER_MEM:-16g}" \
  -cp "$snap/classes:/opt/spark/jars/*" \
  "$main" "$@"
