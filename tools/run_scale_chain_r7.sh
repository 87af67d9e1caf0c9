#!/bin/bash
# Round-7 scale-validation chain, run against a SNAPSHOTTED classpath
# (/tmp/graft_cls_r7) with plain java so the sbt lock stays free for
# development. Gates run PAIRWISE at 16 threads each (the box has 32);
# the full-suite sf1 bench runs alone at local[32]. Stages, logged
# under /tmp/r7_scale/:
#   1. full gates on ORGANIC sf1 (/tmp/sf1) and the x10 replica
#      smoke (/tmp/scale10), in parallel
#   2. full gates on the value-jittered (/tmp/jitter10) and
#      zipf-skewed (/tmp/skew10) smokes, in parallel
#   3. full-suite (356-query) bench on organic sf1, 1 warmup +
#      1 measured pass -> bench_sf1_r7.json
set -u
CLS="/tmp/graft_cls_r7:/opt/spark/jars/*"
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
JOPTS="-Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx40g"
OUT=/tmp/r7_scale
mkdir -p $OUT

gate () {  # name sfdir cpus
  local name=$1 sfdir=$2 cpus=$3
  SPARK_GRAFT_CPUS=$cpus \
  java $OPENS $JOPTS -cp "$CLS" graft.Verify "$sfdir" "$OUT/${name}_dump" \
    > "$OUT/${name}_verify.log" 2>&1
  echo "$name verify exit: $?" >> $OUT/status.txt
  python3 tools/check.py "$sfdir" "$OUT/${name}_dump" \
    > "$OUT/${name}_check.log" 2>&1
  echo "$name check exit: $?" >> $OUT/status.txt
  tail -2 "$OUT/${name}_check.log" >> $OUT/status.txt
  rm -rf "$OUT/${name}_dump"
}

echo "=== stage 1: sf1 + x10 full gates (parallel, 16 threads each) ===" > $OUT/status.txt
gate sf1 /tmp/sf1 16 &
P1=$!
gate x10 /tmp/scale10 16 &
P2=$!
wait $P1 $P2

echo "=== stage 2: jitter + skew full gates (parallel) ===" >> $OUT/status.txt
gate jit /tmp/jitter10 16 &
P3=$!
gate skew /tmp/skew10 16 &
P4=$!
wait $P3 $P4

echo "=== stage 3: full-suite sf1 bench (local[32], 1+1 passes) ===" >> $OUT/status.txt
SPARK_GRAFT_SF_DIR=/tmp/sf1 \
SPARK_GRAFT_BENCH_WARMUPS=1 SPARK_GRAFT_BENCH_PASSES=1 \
SPARK_GRAFT_BENCH_FULL=$OUT/bench_sf1_r7.json \
java $OPENS $JOPTS -cp "$CLS" graft.Bench \
  > $OUT/sf1_bench.log 2>&1
echo "sf1 bench exit: $?" >> $OUT/status.txt
tail -1 $OUT/sf1_bench.log >> $OUT/status.txt
echo "=== chain done ===" >> $OUT/status.txt
