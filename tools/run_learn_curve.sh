#!/bin/bash
# Uniform 3-point growth curve for the Learn tier (r11, closing the
# r10 verdict's #2: the three archived points must share ONE query
# set). Query set: every Learn-tier batch query q467-q489 EXCEPT the
# streaming twin q486 (its time is replay-harness-bound, not
# plan-bound). x1 = driver sf0.1, x10 = organic /tmp/sf1, x30 =
# organic /tmp/org30 (make_sf1.py natively at 1.0 / 3.0). Fresh JVM
# per point, 1 warmup + 1 pass. Outputs /tmp/learn_r11_x{1,10,30}.json;
# archive as bench_learn_r11_x*.json when adopting.
set -u
cd "$(dirname "$0")/.."
CLS_DIR="/tmp/graft_cls_learn"
rm -rf "$CLS_DIR"; mkdir -p "$CLS_DIR"
cp -r target/scala-2.13/classes/. "$CLS_DIR"/
CLS="$CLS_DIR:/opt/spark/jars/*"
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
JOPTS="-Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx40g"
Q="q467_naive_bayes,q468_decision_stump,q469_batch_perceptron,q470_kmeans_lloyd,q471_jackknife_ratio,q472_cem_att,q473_grid_dbscan,q474_minimizer_sketch,q475_repeated_spans,q476_gbdt_rounds,q477_weighted_sample,q478_pca_power,q479_ridge_cramer,q480_learning_curve,q481_rocchio_tfidf,q482_bagged_stumps,q483_als_alternation,q484_bias_baseline,q485_macqueen_walk,q487_greedy_coverage,q488_label_noise,q489_model_averaging"
regen () { local dir=$1; shift; [ -d "$dir" ] && return 0
  "$@" || { echo "FATAL: generation failed: $* (for $dir)" >&2; exit 1; }; }
regen /tmp/sf1 python3 tools/make_sf1.py 1.0 /tmp/sf1
regen /tmp/org30 python3 tools/make_sf1.py 3.0 /tmp/org30
for pt in "x1:/root/testdata/sf0.1" "x10:/tmp/sf1" "x30:/tmp/org30"; do
  IFS=: read name dir <<< "$pt"
  SPARK_GRAFT_SF_DIR=$dir SPARK_GRAFT_BENCH_ONLY=$Q \
  SPARK_GRAFT_BENCH_WARMUPS=1 SPARK_GRAFT_BENCH_PASSES=1 \
  SPARK_GRAFT_BENCH_FULL=/tmp/learn_r11_${name}.json \
  java $OPENS $JOPTS -cp "$CLS" graft.Bench \
    > /tmp/learn_r11_${name}.log 2>&1
  echo "$name exit $?"
done
python3 - <<'PYEOF'
import json, math
xs = {n: json.load(open(f'/tmp/learn_r11_{n}.json')) for n in ('x1','x10','x30')}
q1, q30 = xs['x1']['queries'], xs['x30']['queries']
print(f"{'query':26s} {'x1':>8s} {'x10':>8s} {'x30':>8s} {'exp(1->30)':>10s}")
tot = {n: 0.0 for n in xs}
for q in sorted(q1):
    t1, t10, t30 = q1[q], xs['x10']['queries'].get(q), q30.get(q)
    for n, v in (('x1',t1),('x10',t10),('x30',t30)):
        if v: tot[n] += v
    e = math.log(t30/t1)/math.log(30) if t30 and t1 else None
    print(f"{q:26s} {t1:8.2f} {t10 or 0:8.2f} {t30 or 0:8.2f} "
          f"{e if e is not None else float('nan'):10.2f}")
print(f"{'TOTAL':26s} {tot['x1']:8.2f} {tot['x10']:8.2f} {tot['x30']:8.2f} "
      f"{math.log(tot['x30']/tot['x1'])/math.log(30):10.2f}")
for n in xs: print(n, 'canary', xs[n].get('canary_med'))
PYEOF
