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
exec java -Xmx"${GRAFT_XMX:-96g}" -XX:+IgnoreUnrecognizedVMOptions \
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
