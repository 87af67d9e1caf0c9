#!/usr/bin/env python3
"""Cross-round bench regression table.

Usage: python3 tools/bench_diff.py bench_full_r5.json bench_full_r6.json [n]

Prints the n (default 15) largest per-query regressions and
improvements between two per-query bench archives, plus totals —
the table the per-round `bench_full_r<N>.json` archives exist for.
"""
import json
import sys

a_path, b_path = sys.argv[1], sys.argv[2]
n = int(sys.argv[3]) if len(sys.argv) > 3 else 15

a_doc = json.load(open(a_path))
b_doc = json.load(open(b_path))


def flatten(doc):
    """Chunked archives (round 12+, SPARK_GRAFT_BENCH_CHUNKS): merge
    the per-chunk documents into one flat archive and attach each
    query's OWN chunk's canary medians as per-query maps — the whole
    point of chunking is that a query's drift correction comes from
    the canaries that ran in its JVM."""
    if "chunks" not in doc:
        return doc
    out = {k: v for k, v in doc.items() if k != "chunks"}
    out["queries"] = {}
    out["spread"] = {}
    out["ioclass"] = {}
    out["_per_can"] = {}
    out["_per_io"] = {}
    cpu_meds, io_meds = [], []
    for ch in doc["chunks"]:
        out["queries"].update(ch.get("queries", {}))
        out["spread"].update(ch.get("spread", {}))
        out["ioclass"].update(ch.get("ioclass", {}))
        cm = ch.get("canary", {}).get("median")
        im = ch.get("canary_io", {}).get("median")
        if cm:
            cpu_meds.append(cm)
        if im:
            io_meds.append(im)
        for q in ch.get("queries", {}):
            if cm:
                out["_per_can"][q] = cm
            if im:
                out["_per_io"][q] = im
    if cpu_meds:
        out["canary"] = {"median": sorted(cpu_meds)[len(cpu_meds) // 2]}
    if io_meds:
        out["canary_io"] = {"median": sorted(io_meds)[len(io_meds) // 2]}
    return out


a_doc = flatten(a_doc)
b_doc = flatten(b_doc)
a, b = a_doc["queries"], b_doc["queries"]

# Drift canary (round 9+): each archive carries the median of an
# SF-independent CPU probe interleaved through the measured passes.
# The b/a canary ratio IS the machine-drift factor between the two
# runs (same-code r8 episodes: totals 403/368/355s — +-13% — with no
# code change); when both archives carry a canary, b's times are
# NORMALIZED by that ratio before any call is made, so a uniform
# environmental shift stops reading as 375 tiny regressions.
ca = a_doc.get("canary", {}).get("median")
cb = b_doc.get("canary", {}).get("median")
drift = (cb / ca) if (ca and cb and ca > 0) else None

# IO canary (round 12+): each archive may also carry the median of a
# fixed-size SHUFFLE+localCheckpoint probe ("canary_io") and a map
# "ioclass" of queries observed doing checkpoint/streaming IO during
# the measured passes. The CPU canary is blind to shuffle-file /
# block-manager / page-cache state — the exact medium the
# checkpoint/streaming tier is sensitive to (r11: shared-set +11%
# with the CPU canary FLAT, concentrated in that tier) — so IO-class
# queries are normalized by the IO canary's ratio and everything
# else by the CPU one.
ia = a_doc.get("canary_io", {}).get("median")
ib = b_doc.get("canary_io", {}).get("median")
io_drift = (ib / ia) if (ia and ib and ia > 0) else None
ioclass = set(a_doc.get("ioclass", {})) | set(b_doc.get("ioclass", {}))


def _factor(q):
    """Per-query drift ratio: prefer the query's own chunk canaries
    (chunked archives), the IO pair for IO-class queries, the global
    CPU pair otherwise."""
    ca_q = a_doc.get("_per_can", {}).get(q, ca)
    cb_q = b_doc.get("_per_can", {}).get(q, cb)
    ia_q = a_doc.get("_per_io", {}).get(q, ia)
    ib_q = b_doc.get("_per_io", {}).get(q, ib)
    if q in ioclass and ia_q and ib_q:
        return ib_q / ia_q
    if ca_q and cb_q:
        return cb_q / ca_q
    return drift


b_raw = dict(b)
b_spread_raw = dict(b_doc.get("spread", {}))
b_spread = dict(b_spread_raw)
if drift is not None:
    b = {q: t / (_factor(q) or 1.0) if t >= 0 else t for q, t in b.items()}
    # b's recorded noise bands are raw seconds from the same run —
    # scale them by the same factor so the band is consistent with
    # the normalized deltas (else the band is off by the drift).
    b_spread = {q: s / (_factor(q) or 1.0) for q, s in b_spread_raw.items()}

# Per-query noise band: the archives' own max-min over measured
# passes (round 7+), WITH A CROSS-RUN FLOOR. Round-8 diagnosis (the
# r7 q144/q127 false alarms): intra-run min-of-2 spread measures
# same-JVM pass jitter only — three isolated fresh-JVM reruns of
# q144 spanned 0.40s against its recorded 0.02s band, i.e. suite
# composition + JIT/GC state move a <3s query ~20x more than its
# intra-run spread. So a delta is only a regression/improvement call
# when it clears max(recorded band, floor). The floor was 0.15s+10%
# in round 8; the three same-code r8 runs (403.0/367.9/355.4s, +-13%
# about their mean) showed that sits at the optimistic edge, so
# UN-normalized comparisons use 0.15s+15%. With a canary on both
# sides the uniform component is already divided out and the floor
# drops back to 0.15s+10% (residual per-query jitter).
def _floor(q):
    base = min(a.get(q, 1e9), b.get(q, 1e9))
    return 0.15 + (0.10 if drift is not None else 0.15) * base

spread = {q: max(a_doc.get("spread", {}).get(q, 0.0),
                 b_spread.get(q, 0.0),
                 _floor(q))
          for q in set(a) | set(b)}

shared = sorted(set(a) & set(b))
added = sorted(set(b) - set(a))
removed = sorted(set(a) - set(b))

rows = [(q, a[q], b[q], b[q] - a[q]) for q in shared]
tot_a = sum(a[q] for q in shared)
tot_b = sum(b[q] for q in shared)
tot_b_raw = sum(b_raw[q] for q in shared)

print(f"shared queries: {len(shared)}  added: {len(added)}  "
      f"removed: {len(removed)}")
if drift is not None:
    print(f"canary drift: {ca:.3f}s -> {cb:.3f}s (x{drift:.3f}) — "
          f"b normalized by the ratio; calls below are drift-corrected.")
    if io_drift is not None:
        print(f"io canary drift: {ia:.3f}s -> {ib:.3f}s (x{io_drift:.3f})"
              f" — {len(ioclass)} IO-class queries (checkpoint/streaming"
              f" observed in-run) normalized by THIS ratio instead.")
    else:
        print("io canary: absent in at least one archive — IO-class "
              "queries normalized by the CPU canary (over/under-corrects "
              "when disk state drifts; see [raw>band] flags).")
    print("NOTE: the CPU canary is blind to shuffle/disk state. Both "
          "deltas print below — a query whose RAW delta clears the "
          "band while the normalized one does not is flagged "
          "[raw>band] and worth an isolated rerun.")
else:
    print("canary: absent in at least one archive — no drift "
          "normalization; using the wider (+15%) cross-run floor")
print(f"shared total: {tot_a:.1f}s -> {tot_b:.1f}s "
      f"({tot_b - tot_a:+.1f}s normalized; raw {tot_b_raw:.1f}s, "
      f"{tot_b_raw - tot_a:+.1f}s)")
if added:
    print(f"added total: {sum(b[q] for q in added):.1f}s "
          f"({', '.join(added[:8])}{'...' if len(added) > 8 else ''})")

def band(q, d):
    """Three-tier call on the NORMALIZED delta: inside the band ->
    noise; inside 2x the band -> the r7 q144/q127 zone, where
    zero-code-change suite reruns have landed — isolate (fresh JVM,
    SPARK_GRAFT_BENCH_ONLY=<q>, 3 runs) before treating it as real;
    beyond 2x -> regression. When the raw (un-normalized) delta
    clears the raw-scale band but the normalized one sits inside it,
    flag it: a genuinely IO/shuffle-bound regression can hide just
    under the CPU-drift correction."""
    s = spread.get(q, 0.0)
    d_raw = b_raw.get(q, 0.0) - a.get(q, 0.0)
    s_raw = max(a_doc.get("spread", {}).get(q, 0.0),
                b_spread_raw.get(q, 0.0), _floor(q))
    raw_flag = ("  [raw>band]"
                if abs(d) <= s < abs(d_raw) and abs(d_raw) > s_raw
                else "")
    if abs(d) <= s:
        return "  [noise]" + raw_flag
    if abs(d) <= 2 * s:
        return "  [isolate before calling]"
    return ""

def row_fmt(q, ta, tb, d):
    raw = f" (raw {b_raw[q] - ta:+.2f}s)" if drift is not None else ""
    io = " [io]" if (io_drift is not None and q in ioclass) else ""
    return f"  {q:40s} {ta:7.2f} -> {tb:7.2f}  {d:+.2f}s{raw}{io}{band(q, d)}"

print(f"\ntop {n} regressions (delta > 0.2s):")
for q, ta, tb, d in sorted(rows, key=lambda r: -r[3])[:n]:
    if d <= 0.2:
        break
    print(row_fmt(q, ta, tb, d))

print(f"\ntop {n} improvements (delta < -0.2s):")
for q, ta, tb, d in sorted(rows, key=lambda r: r[3])[:n]:
    if d >= -0.2:
        break
    print(row_fmt(q, ta, tb, d))

# raw-only suspects: normalized delta reads as noise, raw delta
# clears both bands — the over-correction blind spot.
suspects = [(q, a[q], b_raw[q]) for q, ta, tb, d in rows
            if "[raw>band]" in band(q, d)]
if suspects:
    print(f"\nraw-only suspects (normalized=noise but raw clears the "
          f"band; isolate these): ")
    for q, ta, tbr in suspects[:n]:
        print(f"  {q:40s} raw {ta:7.2f} -> {tbr:7.2f}  {tbr - ta:+.2f}s")
