#!/bin/bash
# Dev runner: invoke a graft main class directly on the compiled classes +
# the unmanaged Spark jars, with the JDK17 module opens spark-submit would
# add. Usage: tools/run.sh <mainClass> [args...]  (env: SPARK_GRAFT_*;
# GRAFT_XMX overrides the heap, GRAFT_REPO the repo root)
set -eu
if [ "$#" -eq 0 ]; then
  echo "usage: tools/run.sh <mainClass> [args...]" >&2
  echo "  env: SPARK_GRAFT_* (harness knobs), GRAFT_XMX (default 96g), GRAFT_REPO (default /root/repo)" >&2
  exit 2
fi
MAIN="$1"; shift
REPO="${GRAFT_REPO:-/root/repo}"
# Xms=Xmx + AlwaysPreTouch: G1 uncommits heap pages after Full GC /
# concurrent-cycle cleanup; the next query's Tungsten allocations then
# re-fault them under 32-thread contention -- measured (r10 RepDiag) as
# 150us/fault kernel storms that turned 3.5 s reps into 25 s ones with
# IDENTICAL user CPU. Pinning the heap and pre-faulting it at JVM start
# moves that cost out of every timed window. GRAFT_JAVA_OPTS appends
# extra flags (diag GC logs, experiment toggles).
exec java -Xms"${GRAFT_XMX:-96g}" -Xmx"${GRAFT_XMX:-96g}" -XX:+AlwaysPreTouch \
  ${GRAFT_JAVA_OPTS:-} -XX:+IgnoreUnrecognizedVMOptions \
  --add-opens=java.base/java.lang=ALL-UNNAMED \
  --add-opens=java.base/java.lang.invoke=ALL-UNNAMED \
  --add-opens=java.base/java.lang.reflect=ALL-UNNAMED \
  --add-opens=java.base/java.io=ALL-UNNAMED \
  --add-opens=java.base/java.net=ALL-UNNAMED \
  --add-opens=java.base/java.nio=ALL-UNNAMED \
  --add-opens=java.base/java.util=ALL-UNNAMED \
  --add-opens=java.base/java.util.concurrent=ALL-UNNAMED \
  --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED \
  --add-opens=java.base/sun.nio.ch=ALL-UNNAMED \
  --add-opens=java.base/sun.nio.cs=ALL-UNNAMED \
  --add-opens=java.base/sun.security.action=ALL-UNNAMED \
  --add-opens=java.base/sun.util.calendar=ALL-UNNAMED \
  -cp "$REPO/target/scala-2.13/classes:$REPO/src/main/resources:/opt/spark/jars/*" \
  "$MAIN" "$@"
