#!/bin/bash
# Direct-java runner for graft mains — keeps the sbt lock free so tests
# and CLI runs can proceed concurrently. Mirrors build.sbt's JDK-17
# add-opens flags and session flags. Usage:
#   scripts/runjava.sh graft.Bench            (env: SPARK_GRAFT_* as usual)
#   JMEM=48g scripts/runjava.sh graft.ScaleBench 10 /tmp/graft-scale10
CP="/root/repo/target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
exec java \
 --add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED \
 --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED \
 --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED \
 --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED \
 --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED \
 --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED \
 --add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED \
 -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx${JMEM:-12g} \
 -cp "$CP" "$@"
