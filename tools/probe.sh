#!/bin/bash
# Dev probe: run graft.DebugBench pinned to N cores with per-job/stage
# accounting, to attribute non-parallel wall time in the scaling legs.
# Usage: tools/probe.sh <cores> <rep> [sfdir]
set -e
N="${1:-8}"
REP="${2:-8}"
DIR="${3:-/root/testdata/sf0.1}"
CP="target/scala-2.13/classes:$(ls -d /opt/spark/jars/* | tr '\n' ':')"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
OPENS="$OPENS --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED"
OPENS="$OPENS --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
exec taskset -c 0-$((N-1)) java $OPENS -Xmx20g -Dspark.ui.enabled=false \
  -cp "$CP" graft.DebugBench "$DIR" "$N" "$REP" warm
