#!/bin/bash
# Plain-java bench runner (no sbt decoration): the compact summary JSON is
# the literal last stdout line, so the driver's tail-parse always succeeds.
# Usage: [SPARK_GRAFT_SF_DIR=...] [SPARK_GRAFT_CPUS=N] [SPARK_GRAFT_ONLY=q1,q2]
#        [SPARK_GRAFT_PASSES=N] tools/bench.sh [main-class, default graft.Bench]
set -euo pipefail
cd "$(dirname "$0")/.."
MAIN="${1:-graft.Bench}"
[ $# -gt 0 ] && shift
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $ADD_OPENS ${SPARK_GRAFT_JAVA_OPTS:-} \
  -Xmx"${SPARK_DRIVER_MEM:-24g}" \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  "$MAIN" "$@"
