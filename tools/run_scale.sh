#!/bin/bash
# Launch a graft main directly against the compiled classes (no sbt lock),
# with the same JVM options build.sbt's forked run uses. Usage:
#   tools/run_scale.sh <MainClass> [args...]
# Env: SPARK_DRIVER_MEM (default 8g) plus the SPARK_GRAFT_* knobs the mains read.
set -u
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
cd /root/repo
exec java $OPENS \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -cp "/root/repo/target/scala-2.13/classes:/opt/spark/jars/*" "$@"
