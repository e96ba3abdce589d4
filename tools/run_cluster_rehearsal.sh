#!/usr/bin/env bash
# Dev-only: launch ClusterRehearsal with an ABSOLUTE classpath (the
# local-cluster executor JVMs spawn from SPARK_HOME with a different
# cwd, so run_main.sh's relative classpath breaks executor-side
# classloading of the graft classes).
set -euo pipefail
cd "$(dirname "$0")/.."
CP="$(pwd)/target/scala-2.13/classes:/opt/spark/jars/*"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
export SPARK_SCALA_VERSION=2.13
exec java $ADD_OPENS \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -Dspark.executor.extraJavaOptions="$ADD_OPENS" \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -cp "$CP" graft.ClusterRehearsal "$@"
