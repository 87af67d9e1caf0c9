#!/bin/bash
# Round-6 continuation chain (snapshot classpath /tmp/graft_cls_r6b):
#   A. full 327-query gate on the x10 replica smoke (/tmp/scale10)
#   B. full 327-query gate on the value-jittered smoke (/tmp/jitter10)
# Logged under /tmp/r6b_scale/.
set -u
CLS="/tmp/graft_cls_r6b:/opt/spark/jars/*"
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
JOPTS="-Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx48g"
OUT=/tmp/r6b_scale
mkdir -p $OUT

echo "=== stage A: x10 replica full gate ===" > $OUT/status.txt
java $OPENS $JOPTS -cp "$CLS" graft.Verify /tmp/scale10 $OUT/x10_dump \
  > $OUT/x10_verify.log 2>&1
echo "x10 verify exit: $?" >> $OUT/status.txt
python3 tools/check.py /tmp/scale10 $OUT/x10_dump \
  > $OUT/x10_check.log 2>&1
echo "x10 check exit: $?" >> $OUT/status.txt
tail -2 $OUT/x10_check.log >> $OUT/status.txt
rm -rf $OUT/x10_dump

echo "=== stage B: jitter10 full gate ===" >> $OUT/status.txt
java $OPENS $JOPTS -cp "$CLS" graft.Verify /tmp/jitter10 $OUT/jit_dump \
  > $OUT/jit_verify.log 2>&1
echo "jit verify exit: $?" >> $OUT/status.txt
python3 tools/check.py /tmp/jitter10 $OUT/jit_dump \
  > $OUT/jit_check.log 2>&1
echo "jit check exit: $?" >> $OUT/status.txt
tail -2 $OUT/jit_check.log >> $OUT/status.txt
rm -rf $OUT/jit_dump
echo "=== chain done ===" >> $OUT/status.txt
