#!/bin/bash
# Plain-JVM launcher for graft mains (Verify / Bench / tools.*): mirrors
# build.sbt's fork settings (JDK17 add-opens, UTC, UI off, SPARK_DRIVER_MEM)
# but skips sbt entirely, so N shard JVMs can run CONCURRENTLY on the same
# project without sbt's exclusive target/ lock. Compile first (sbt compile);
# this only launches what's already in target/scala-2.13/classes.
#
# Usage: tools/run_class.sh <mainClass> [args...]
set -euo pipefail
MEM="${SPARK_DRIVER_MEM:-8g}"
OPENS=(java.base/java.lang java.base/java.lang.invoke
  java.base/java.lang.reflect java.base/java.io java.base/java.net
  java.base/java.nio java.base/java.util java.base/java.util.concurrent
  java.base/java.util.concurrent.atomic java.base/sun.nio.ch
  java.base/sun.nio.cs java.base/sun.security.action
  java.base/sun.util.calendar)
ARGS=()
for p in "${OPENS[@]}"; do ARGS+=(--add-opens "$p=ALL-UNNAMED"); done
# GRAFT_CLASSES overrides the classes dir — long-running gate JVMs load
# classes lazily, so point them at a SNAPSHOT copy to stay immune to
# concurrent `sbt compile` rewriting target/scala-2.13/classes mid-run.
CLASSES="${GRAFT_CLASSES:-/root/repo/target/scala-2.13/classes}"
exec java "${ARGS[@]}" "-Xmx$MEM" \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$CLASSES:/opt/spark/jars/*" "$@"
