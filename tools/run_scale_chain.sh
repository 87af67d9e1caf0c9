#!/bin/bash
# Round-AGNOSTIC scale-validation chain (replaces the former per-round
# run_scale_chain_rN.sh copies). Round comes from SPARK_GRAFT_ROUND, or
# is inferred as (largest committed BENCH_r*.json) + 1. The compiled
# classes are SNAPSHOTTED to /tmp/graft_cls_r${R} and run with plain
# java so the sbt lock stays free for development. Stages, logged
# under /tmp/r${R}_scale/:
#   1. full gates on ORGANIC sf1 (/tmp/sf1) and the x10 replica smoke
#      (/tmp/scale10), in parallel at 16 threads each (the box has 32)
#   2. full gates on the value-jittered (/tmp/jitter10) and
#      zipf-skewed (/tmp/skew10) smokes, in parallel
#   3. full-suite bench on organic sf1 at local[32], 1 warmup +
#      2 measured passes -> bench_sf1 WITH per-query noise bands
#      (min-of-2 protocol, so cross-round sf1 regression calls are
#      decision-grade like the sf0.1 ones)
# Each parallel gate writes its OWN status file; stage barriers
# concatenate them into status.txt (no concurrent appends to a shared
# file). Smoke datasets are regenerated first if missing (they live in
# /tmp and do not persist).
set -u
cd "$(dirname "$0")/.."

R="${SPARK_GRAFT_ROUND:-}"
if [ -z "$R" ]; then
  last=$(ls BENCH_r*.json 2>/dev/null \
    | sed -E 's/BENCH_r0*([0-9]+)\.json/\1/' | sort -n | tail -1)
  [ -n "$last" ] && R=$((last + 1))
fi
: "${R:?cannot infer round — set SPARK_GRAFT_ROUND}"

CLS_DIR="/tmp/graft_cls_r${R}"
rm -rf "$CLS_DIR"
mkdir -p "$CLS_DIR"
cp -r target/scala-2.13/classes/. "$CLS_DIR"/
CLS="$CLS_DIR:/opt/spark/jars/*"
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
JOPTS="-Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx40g"
OUT="/tmp/r${R}_scale"
mkdir -p "$OUT"

# regenerate any missing smoke dataset (they don't persist in /tmp).
# Generators take positional argv; abort the chain if one fails —
# otherwise the gates below would run against a nonexistent dir.
regen () {  # dir cmd...
  local dir=$1; shift
  [ -d "$dir" ] && return 0
  "$@" || { echo "FATAL: smoke regeneration failed: $* (for $dir)" >&2; exit 1; }
}
regen /tmp/sf1      python3 tools/make_sf1.py 1.0 /tmp/sf1 /root/testdata/sf0.1
regen /tmp/scale10  python3 tools/make_scale.py /root/testdata/sf0.1 /tmp/scale10 10
regen /tmp/jitter10 python3 tools/make_jitter.py /root/testdata/sf0.1 /tmp/jitter10 10
regen /tmp/skew10   python3 tools/make_skew.py /root/testdata/sf0.1 /tmp/skew10

gate () {  # name sfdir cpus — writes ONLY $OUT/${name}_status.txt
  local name=$1 sfdir=$2 cpus=$3
  # NB: $st must be assigned on its OWN local line — bash expands a
  # whole `local a=$1 b=${a}` command before any assignment lands, so
  # referencing ${name} in the same line trips set -u
  local st="$OUT/${name}_status.txt"
  : > "$st"
  SPARK_GRAFT_CPUS=$cpus \
  java $OPENS $JOPTS -cp "$CLS" graft.Verify "$sfdir" "$OUT/${name}_dump" \
    > "$OUT/${name}_verify.log" 2>&1
  echo "$name verify exit: $?" >> "$st"
  python3 tools/check.py "$sfdir" "$OUT/${name}_dump" \
    > "$OUT/${name}_check.log" 2>&1
  echo "$name check exit: $?" >> "$st"
  tail -2 "$OUT/${name}_check.log" >> "$st"
  rm -rf "$OUT/${name}_dump"
}

echo "=== stage 1: sf1 + x10 full gates (parallel, 16 threads each) ===" > "$OUT/status.txt"
gate sf1 /tmp/sf1 16 &
P1=$!
gate x10 /tmp/scale10 16 &
P2=$!
wait $P1 $P2
cat "$OUT/sf1_status.txt" "$OUT/x10_status.txt" >> "$OUT/status.txt"

echo "=== stage 2: jitter + skew full gates (parallel) ===" >> "$OUT/status.txt"
gate jit /tmp/jitter10 16 &
P3=$!
gate skew /tmp/skew10 16 &
P4=$!
wait $P3 $P4
cat "$OUT/jit_status.txt" "$OUT/skew_status.txt" >> "$OUT/status.txt"

echo "=== stage 3: full-suite sf1 bench (local[32], 1 warmup + 2 passes, noise bands) ===" >> "$OUT/status.txt"
SPARK_GRAFT_SF_DIR=/tmp/sf1 \
SPARK_GRAFT_BENCH_WARMUPS=1 SPARK_GRAFT_BENCH_PASSES=2 \
SPARK_GRAFT_BENCH_FULL="$OUT/bench_sf1_r${R}.json" \
SPARK_GRAFT_ROUND="$R" \
java $OPENS $JOPTS -cp "$CLS" graft.Bench \
  > "$OUT/sf1_bench.log" 2>&1
echo "sf1 bench exit: $?" >> "$OUT/status.txt"
tail -1 "$OUT/sf1_bench.log" >> "$OUT/status.txt"
echo "=== chain done ===" >> "$OUT/status.txt"
