#!/bin/bash
# 3-point growth-exponent certification for the pair-heavy tier:
# x1 (driver sf0.1), x10 (/tmp/scale10), x30 (/tmp/scale30) — fresh
# JVM per point, plain-java launcher, 1 warmup, 2 passes at x1/x10
# and 1 pass at x30 (times there are large relative to noise).
# Fit exponents as log-slopes; every ENFORCED operator must measure
# <= ~1.2 — the jaccard family is output-bound on replica data (a xk
# replica turns every doc into a k-clone near-dup cluster => true
# pairs grow C(k,2) per cluster; compare measured time against the
# candidate-pair mass, not against n). See README "Growth-exponent
# certification". Round-agnostic: outputs land in /tmp/growth_x*.json;
# archive them as bench_growth_r<N>_x*.json when adopting.
set -u
cd "$(dirname "$0")/.."
R="${SPARK_GRAFT_ROUND:-X}"
CLS_DIR="/tmp/graft_cls_growth"
rm -rf "$CLS_DIR"; mkdir -p "$CLS_DIR"
cp -r target/scala-2.13/classes/. "$CLS_DIR"/
CLS="$CLS_DIR:/opt/spark/jars/*"
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
JOPTS="-Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx40g"
Q="q108_record_linkage,q258_jw_linkage,q23_dedup_jaccard,q136_containment,q137_incremental_dedup,q144_triangles,q204_gram_matrix,q359_pair_identity,q393_fellegi_sunter"
regen () { local dir=$1; shift; [ -d "$dir" ] && return 0
  "$@" || { echo "FATAL: generation failed: $* (for $dir)" >&2; exit 1; }; }
regen /tmp/scale10 python3 tools/make_scale.py /root/testdata/sf0.1 /tmp/scale10 10
regen /tmp/scale30 python3 tools/make_scale.py /root/testdata/sf0.1 /tmp/scale30 30
for pt in "x1:/root/testdata/sf0.1:2" "x10:/tmp/scale10:2" "x30:/tmp/scale30:1"; do
  IFS=: read name dir passes <<< "$pt"
  SPARK_GRAFT_SF_DIR=$dir SPARK_GRAFT_BENCH_ONLY=$Q \
  SPARK_GRAFT_BENCH_WARMUPS=1 SPARK_GRAFT_BENCH_PASSES=$passes \
  SPARK_GRAFT_BENCH_FULL=/tmp/growth_${name}.json \
  java $OPENS $JOPTS -cp "$CLS" graft.Bench \
    > /tmp/growth_${name}.log 2>&1
  echo "$name exit $?"
done
python3 - <<'PYEOF'
import json, math
xs = {n: json.load(open(f'/tmp/growth_{n}.json')) for n in ('x1','x10','x30')}
q1, q30 = xs['x1']['queries'], xs['x30']['queries']
print(f"{'query':34s} {'x1':>7s} {'x10':>8s} {'x30':>8s} {'exp(1->30)':>10s}")
for q in sorted(q1):
    e = math.log(q30[q]/q1[q])/math.log(30)
    print(f"{q:34s} {q1[q]:7.2f} {xs['x10']['queries'][q]:8.2f} {q30[q]:8.2f} {e:10.2f}")
for n in xs: print(n, 'canary', xs[n].get('canary',{}).get('median'))
PYEOF
