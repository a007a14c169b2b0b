#!/bin/bash
# Run a graft main class against the compiled classes + Spark jars without
# sbt startup overhead. Usage: tools/run.sh graft.Verify <args...>
set -e
CP="/root/repo/target/scala-2.13/classes:/root/repo/target/scala-2.13/test-classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
# Heap: 48g only when the host can back it (>=96 GiB physical), else a
# portable 8g; override with SPARK_DRIVER_MEM. Xms pinned (GC variance).
if [ -z "$SPARK_DRIVER_MEM" ]; then
  mem_kb=$(awk '/^MemTotal:/{print $2}' /proc/meminfo 2>/dev/null || echo 0)
  if [ "$mem_kb" -ge $((96*1024*1024)) ]; then SPARK_DRIVER_MEM=48g; else SPARK_DRIVER_MEM=8g; fi
fi
# file.encoding: the container JVM defaults to ASCII and Spark's variant
# builder round-trips strings through the platform charset
exec java $ADD_OPENS -Xmx$SPARK_DRIVER_MEM -Xms$SPARK_DRIVER_MEM \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Dfile.encoding=UTF-8 -Dsun.jnu.encoding=UTF-8 \
  -cp "$CP" "$@"
