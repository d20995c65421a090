#!/bin/bash
# Launch a graft main on the compiled classes WITHOUT sbt — same JVM shape
# as build.sbt's `run / fork` (add-opens, GC, SPARK_DRIVER_MEM), but no
# sbt project lock, so measurement mains and `sbt test` can overlap.
# Usage: tools/jrun.sh <mainClass> [args...]   (compile first: sbt compile)
set -euo pipefail
CP="/root/repo/target/scala-2.13/classes:/opt/spark/jars/*"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $OPENS \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -XX:+"${SPARK_GC:-UseParallelGC}" \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  ${SPARK_EXTRA_JAVA_OPTS:-} \
  -cp "$CP" "$@"
