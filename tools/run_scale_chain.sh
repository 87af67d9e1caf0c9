#!/bin/bash
# Round-6 scale-validation chain, run against a SNAPSHOTTED classpath
# (/tmp/graft_cls_r6) with plain java so the sbt lock stays free for
# development. Three stages, each logged under /tmp/r6_scale/:
#   1. full gate (Spark + DuckDB) on the ORGANIC sf1 (/tmp/sf1)
#   2. heavy-tail bench on sf1
#   3. full gate on the rebuilt x10 replica smoke (/tmp/scale10)
set -u
CLS="/tmp/graft_cls_r6:/opt/spark/jars/*"
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
JOPTS="-Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx48g"
OUT=/tmp/r6_scale
mkdir -p $OUT

echo "=== stage 1: organic sf1 full gate ===" > $OUT/status.txt
java $OPENS $JOPTS -cp "$CLS" graft.Verify /tmp/sf1 $OUT/sf1_dump \
  > $OUT/sf1_verify.log 2>&1
echo "sf1 verify exit: $?" >> $OUT/status.txt
python3 tools/check.py /tmp/sf1 $OUT/sf1_dump \
  > $OUT/sf1_check.log 2>&1
echo "sf1 check exit: $?" >> $OUT/status.txt
tail -2 $OUT/sf1_check.log >> $OUT/status.txt

echo "=== stage 2: sf1 heavy-tail bench ===" >> $OUT/status.txt
SPARK_GRAFT_SF_DIR=/tmp/sf1 \
SPARK_GRAFT_BENCH_ONLY=q108,q184,q222,q22,q198,q214,q292,q79,q138,q59,q291,q300,q302,q307 \
SPARK_GRAFT_BENCH_FULL=$OUT/bench_sf1.json \
java $OPENS $JOPTS -cp "$CLS" graft.Bench \
  > $OUT/sf1_bench.log 2>&1
echo "sf1 bench exit: $?" >> $OUT/status.txt
tail -1 $OUT/sf1_bench.log >> $OUT/status.txt

echo "=== stage 3: x10 replica smoke, full 307-query gate ===" >> $OUT/status.txt
if [ ! -f /tmp/scale10/lineitem.parquet ]; then
  python3 tools/make_scale.py /root/testdata/sf0.1 /tmp/scale10 10 \
    > $OUT/make_scale.log 2>&1
fi
java $OPENS $JOPTS -cp "$CLS" graft.Verify /tmp/scale10 $OUT/x10_dump \
  > $OUT/x10_verify.log 2>&1
echo "x10 verify exit: $?" >> $OUT/status.txt
python3 tools/check.py /tmp/scale10 $OUT/x10_dump \
  > $OUT/x10_check.log 2>&1
echo "x10 check exit: $?" >> $OUT/status.txt
tail -2 $OUT/x10_check.log >> $OUT/status.txt
echo "=== chain done ===" >> $OUT/status.txt
