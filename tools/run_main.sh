#!/usr/bin/env bash
# Dev-only runner: launch a graft main against the compiled classes
# without going through sbt (avoids the sbt server lock while a test
# run is in flight). Mirrors build.sbt's fork JVM options.
#   tools/run_main.sh graft.MakeScale /tmp/graft_sf1 /tmp/graft_sf10 10 perm
set -euo pipefail
CP="target/scala-2.13/classes:/opt/spark/jars/*"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $ADD_OPENS \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  ${JAVA_EXTRA_OPTS:-} \
  -cp "$CP" "$@"
