#!/usr/bin/env bash
# Isolated fresh-JVM reruns of named bench queries, with both canaries.
#
# Usage: tools/bench_isolate.sh <q1,q2,...> [passes] [ref_archive.json]
#   q1,q2,...         comma-separated query prefixes (Bench's
#                     SPARK_GRAFT_BENCH_ONLY semantics: 'q142' matches
#                     q142_mobility_pipeline)
#   passes            fresh-JVM passes, default 3
#   ref_archive.json  optional bench_full_r<N>.json to adjudicate
#                     against (per-query verdict: matches archive /
#                     in-gate inflation / regression)
#
# Each pass is a FRESH JVM (java -cp target/classes:/opt/spark/jars/*)
# running graft.Bench restricted to the named queries (1 in-JVM warmup
# + 1 measured pass), so accumulated shuffle-file/page-cache/JIT state
# from a 500-query gate cannot contaminate the number. Both canary
# medians (CPU probe + shuffle/checkpoint IO probe) are captured per
# pass; the adjudication normalizes by the canary matching each
# query's class before calling a verdict. This is the tool form of the
# manual SPARK_GRAFT_BENCH_ONLY protocol used in rounds 9-11.
#
# Env passthrough: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
# SPARK_GRAFT_CPUS, SPARK_DRIVER_MEM.
set -euo pipefail
cd "$(dirname "$0")/.."

QUERIES="${1:?usage: tools/bench_isolate.sh <q1,q2,...> [passes] [ref_archive.json]}"
PASSES="${2:-3}"
REF="${3:-}"

CLASSES=target/scala-2.13/classes
if [ ! -d "$CLASSES" ]; then
  echo "no $CLASSES — run 'sbt compile' first" >&2
  exit 1
fi

ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done

TMP=$(mktemp -d /tmp/bench_isolate.XXXXXX)
trap 'rm -rf "$TMP"' EXIT

for i in $(seq 1 "$PASSES"); do
  echo "pass $i/$PASSES (fresh JVM) ..." >&2
  SPARK_GRAFT_BENCH_ONLY="$QUERIES" \
  SPARK_GRAFT_BENCH_WARMUPS=1 \
  SPARK_GRAFT_BENCH_PASSES=1 \
  SPARK_GRAFT_BENCH_FULL="$TMP/pass_$i.json" \
  SPARK_GRAFT_SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}" \
  java $ADD_OPENS \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -Xmx"${SPARK_DRIVER_MEM:-8g}" \
    -cp "$CLASSES:/opt/spark/jars/*" graft.Bench \
    >"$TMP/pass_$i.log" 2>&1 || {
      echo "pass $i failed; tail of log:" >&2
      tail -20 "$TMP/pass_$i.log" >&2
      exit 1
    }
done

python3 - "$TMP" "$PASSES" "$REF" <<'EOF'
import glob
import json
import statistics
import sys

tmp, passes, ref_path = sys.argv[1], int(sys.argv[2]), sys.argv[3]
docs = [json.load(open(p)) for p in sorted(glob.glob(f"{tmp}/pass_*.json"))]

names = sorted(docs[0]["queries"])
times = {q: [d["queries"][q] for d in docs] for q in names}
cpu = [d.get("canary", {}).get("median") for d in docs]
io = [d.get("canary_io", {}).get("median") for d in docs]
cpu_med = statistics.median([c for c in cpu if c]) if any(cpu) else None
io_med = statistics.median([c for c in io if c]) if any(io) else None
ioclass = set()
for d in docs:
    ioclass |= set(d.get("ioclass", {}))

print(f"isolated fresh-JVM runs: {passes} passes")
print(f"  cpu canary median: {cpu_med:.3f}s   io canary median: "
      f"{io_med:.3f}s" if io_med else f"  cpu canary median: {cpu_med}")

ref = json.load(open(ref_path)) if ref_path else None
if ref:
    rca = ref.get("canary", {}).get("median")
    rio = ref.get("canary_io", {}).get("median")
    ref_ioclass = set(ref.get("ioclass", {}))
    print(f"  reference: {ref_path}  cpu canary {rca}  io canary {rio}")

print()
hdr = f"  {'query':40s} {'min':>7s} {'med':>7s} {'spread':>7s}"
if ref:
    hdr += f" {'ref':>7s} {'verdict'}"
print(hdr)
for q in names:
    ts = sorted(times[q])
    mn, md, sp = ts[0], statistics.median(ts), ts[-1] - ts[0]
    line = f"  {q:40s} {mn:7.2f} {md:7.2f} {sp:7.2f}"
    if ref and q in ref.get("queries", {}):
        rt = ref["queries"][q]
        # normalize the isolated median onto the reference machine via
        # the canary matching this query's class (IO probe for
        # checkpoint/streaming queries, CPU probe otherwise)
        is_io = q in (ioclass | ref_ioclass)
        pair = (io_med, rio) if (is_io and io_med and rio) else (cpu_med, rca)
        norm = md * (pair[1] / pair[0]) if (pair[0] and pair[1]) else md
        # band: the archive's own spread with the cross-run floor
        band = max(ref.get("spread", {}).get(q, 0.0),
                   0.15 + 0.10 * min(norm, rt))
        if abs(norm - rt) <= band:
            v = "matches archive"
        elif norm < rt:
            v = (f"archive inflated +{rt - norm:.2f}s "
                 f"(in-gate interference)")
        else:
            v = f"slower isolated +{norm - rt:.2f}s (regression signal)"
        line += f" {rt:7.2f} {v}" + ("  [io]" if is_io else "")
    print(line)
EOF
