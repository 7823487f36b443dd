#!/bin/bash
# Dev probe for the INIT phase's scaling (round-4 verdict #4): run one
# BenchOne leg pinned to N cores over a pre-materialized fixture with
# the per-job timeline on, so init-phase jobs (plan build: dup window,
# robots join, politeness rank, v1 commit) are attributable.
# Usage: tools/initprobe.sh <cores> <rep> <fixdir> [sfdir]
set -e
N="${1:-4}"
REP="${2:-16}"
FIX="${3:?fixture dir (graft.FixPrep output)}"
DIR="${4:-/root/testdata/sf0.1}"
CP="target/scala-2.13/classes:$(ls -d /opt/spark/jars/* | tr '\n' ':')"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
OPENS="$OPENS --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED"
OPENS="$OPENS --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
AVAIL=$(nproc)
LO=$((AVAIL-N))
exec taskset -c $LO-$((AVAIL-1)) env SPARK_GRAFT_JOBLOG=1 \
  SPARK_GRAFT_CRAWL_PARTS="${SPARK_GRAFT_CRAWL_PARTS:-12}" \
  java $OPENS -Xmx20g -Dspark.ui.enabled=false \
  -cp "$CP" graft.BenchOne "$DIR" "$N" "$REP" "$FIX"
