#!/usr/bin/env python3
"""Organic scale-factor-1 dataset generator.

Unlike make_scale.py (replica stamping) and make_jitter.py (replicas
with value jitter), this generates sf1 NATIVELY: every row is an
independent deterministic draw from the same distributions the driver
testdata exhibits at sf0.001-0.1, so per-key structure (orders per
customer, lines per order, user activity, document near-dup rate,
degree distribution of the purchase graph) GROWS the way real data
grows instead of repeating the sf0.1 shape k times. This is the
honest input for the heavy-tail scale smoke (q108/q184/q222/q22/
q198/q214/q292): replication preserves per-key cardinalities that
these queries' costs depend on; native generation does not.

Distribution provenance (measured on /root/testdata/sf0.1):
  - orders/lineitem/customer/part/supplier: uniform draws in the
    observed ranges; lines-per-order follows the EMPIRICAL sf0.1
    distribution (embedded CDF below); o_totalprice independent of
    line sums (as observed); l_shipdate independent uniform (the
    observed order->ship delta is the triangular difference of two
    uniforms).
  - events: ~66 events/user, exponential(mean 50) value, 30-day span.
  - documents: 10-100 words uniform from the 30-word vocabulary;
    5% near-dups = copy of an earlier doc + " dup"; ~0.16% exact
    copies; lang mix 41% en / ~15% each de es fr zh; 20 sources.
  - embeddings: 64-dim unit-norm gaussian, 20 labels, no planted
    near-dup pairs (none observed at sf0.1).

Determinism: all randomness is duckdb hash() of (salt, id) — no RNG
state, so any table regenerates identically in isolation.

Usage: python3 tools/make_sf1.py [sf] [outdir] [srcdir]
  defaults: sf=1.0 outdir=/tmp/sf1 srcdir=/root/testdata/sf0.1
"""
import os
import sys

import duckdb

SF = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
SRC = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"

NCUST = int(150000 * SF)
NSUPP = int(10000 * SF)
NPART = int(200000 * SF)
NORD = int(1500000 * SF)
NEVENT = int(1000000 * SF)
NUSER = int(15000 * SF)
NDOC = int(50000 * SF)
NVEC = int(20000 * SF)

# empirical lines-per-order CDF at sf0.1 (counts / 147235 orders)
LINES_CDF = [
    (1, 0.07482), (2, 0.22298), (3, 0.42335), (4, 0.62098),
    (5, 0.78147), (6, 0.88759), (7, 0.94831), (8, 0.97824),
    (9, 0.99155), (10, 0.99710), (11, 0.99909), (12, 0.99972),
    (13, 0.99992), (14, 0.99998), (15, 0.99999), (16, 0.999997),
    (17, 1.1)]

ADJ = ["large", "hot", "blue", "small", "red", "green", "cold", "shiny"]
NOUN = ["ring", "bolt", "screw", "plate", "wheel", "gear", "pin", "cap"]
SEG = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PTYPE = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
PRIO = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
ETYPE = ["click", "error", "purchase", "signup", "view"]
VOCAB = ["spark", "window", "merge", "table", "column", "vector",
         "stream", "value", "data", "small", "join", "filter", "big",
         "group", "hash", "customer", "sort", "order", "slow", "line",
         "part", "fast", "the", "row", "agg", "key", "query", "a",
         "scan", "batch"]


def u(salt, key):
    """Deterministic uniform in [0,1) from (salt, key)."""
    return (f"((hash('{salt}:' || ({key})) % 4294967296)"
            f" / 4294967296.0)")


def pick(salt, key, lst):
    opts = ", ".join(f"'{x}'" for x in lst)
    return f"[{opts}][1 + CAST(floor({u(salt, key)} * {len(lst)}) AS INT)]"


def lines_case(uexpr):
    branches = " ".join(
        f"WHEN {uexpr} < {c} THEN {n}" for n, c in LINES_CDF[:-1])
    return f"(CASE {branches} ELSE 17 END)"


def main():
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")

    def copy(table, sql):
        con.execute(
            f"COPY ({sql}) TO '{DST}/{table}.parquet' (FORMAT PARQUET)")
        n = con.execute(
            f"SELECT count(*) FROM '{DST}/{table}.parquet'").fetchone()[0]
        print(f"{table}: {n} rows", flush=True)

    for dim in ["region", "nation"]:
        copy(dim, f"SELECT * FROM '{SRC}/{dim}.parquet'")

    copy("customer", f"""
      SELECT CAST(i AS BIGINT) AS c_custkey,
        printf('Customer#%09d', i) AS c_name,
        CAST(hash('cn:' || i) % 25 AS INT) AS c_nationkey,
        round(-1000.0 + 11000.0 * {u('cb', 'i')}, 2) AS c_acctbal,
        {pick('cs', 'i', SEG)} AS c_mktsegment
      FROM (SELECT unnest(range({NCUST})) AS i)""")

    copy("supplier", f"""
      SELECT CAST(i AS BIGINT) AS s_suppkey,
        printf('Supplier#%09d', i) AS s_name,
        CAST(hash('sn:' || i) % 25 AS INT) AS s_nationkey,
        round(-1000.0 + 11000.0 * {u('sb', 'i')}, 2) AS s_acctbal
      FROM (SELECT unnest(range({NSUPP})) AS i)""")

    copy("part", f"""
      SELECT CAST(i AS BIGINT) AS p_partkey,
        {pick('pa', 'i', ADJ)} || ' ' || {pick('pn', 'i', NOUN)} AS p_name,
        'Brand#' || CAST(hash('pb:' || i) % 25 AS INT) AS p_brand,
        {pick('pt', 'i', PTYPE)} AS p_type,
        CAST(1 + hash('ps:' || i) % 50 AS INT) AS p_size,
        900.0 + (i % 1000) * 0.1 AS p_retailprice
      FROM (SELECT unnest(range({NPART})) AS i)""")

    copy("orders", f"""
      SELECT CAST(i AS BIGINT) AS o_orderkey,
        CAST(hash('oc:' || i) % {NCUST} AS BIGINT) AS o_custkey,
        {pick('os', 'i', ['F', 'O', 'P'])} AS o_orderstatus,
        round(1000.0 + 499000.0 * {u('op', 'i')}, 2) AS o_totalprice,
        TIMESTAMP '1995-01-01' + INTERVAL (CAST(floor(
          {u('od', 'i')} * 2404) AS INT)) DAY AS o_orderdate,
        {pick('opr', 'i', PRIO)} AS o_orderpriority
      FROM (SELECT unnest(range({NORD})) AS i)""")

    copy("lineitem", f"""
      WITH o AS (
        SELECT i AS ok, {lines_case(u('nl', 'i'))} AS nl
        FROM (SELECT unnest(range({NORD})) AS i)),
      l AS (
        SELECT ok, CAST(unnest(range(nl)) AS INT) + 1 AS ln FROM o),
      k AS (SELECT ok, ln, ok || '-' || ln AS lk FROM l)
      SELECT CAST(ok AS BIGINT) AS l_orderkey,
        CAST(hash('lp:' || lk) % {NPART} AS BIGINT) AS l_partkey,
        CAST(hash('ls:' || lk) % {NSUPP} AS BIGINT) AS l_suppkey,
        ln AS l_linenumber,
        CAST(1 + hash('lq:' || lk) % 50 AS DOUBLE) AS l_quantity,
        round(900.0 + 104100.0 * {u('le', 'lk')}, 2) AS l_extendedprice,
        CAST((hash('ld:' || lk) % 11) * 0.01 AS DOUBLE) AS l_discount,
        CAST((hash('lt:' || lk) % 9) * 0.01 AS DOUBLE) AS l_tax,
        {pick('lr', 'lk', ['A', 'N', 'R'])} AS l_returnflag,
        {pick('ll', 'lk', ['F', 'O'])} AS l_linestatus,
        TIMESTAMP '1995-01-01' + INTERVAL (CAST(1 + floor(
          {u('lsd', 'lk')} * 2498) AS INT)) DAY AS l_shipdate
      FROM k""")

    copy("events", f"""
      SELECT CAST(i AS BIGINT) AS event_id,
        TIMESTAMP '2024-01-01' + INTERVAL (CAST(floor(
          {u('et1', 'i')} * 2592000) AS BIGINT)) SECOND
          + INTERVAL (CAST(floor({u('et2', 'i')} * 1000000)
            AS BIGINT)) MICROSECOND AS ts,
        CAST(hash('eu:' || i) % {NUSER} AS BIGINT) AS user_id,
        {pick('ee', 'i', ETYPE)} AS event_type,
        round(-50.0 * ln(1.0 - {u('ev', 'i')}), 2) AS value,
        '{{"k": ' || CAST(hash('ek:' || i) % 100 AS INT) || '}}' AS props
      FROM (SELECT unnest(range({NEVENT})) AS i)""")

    # documents: base texts for the first 95%, then near-dups (base
    # text + " dup") with ~3% of those being exact copies instead
    nbase = int(NDOC * 0.95)
    copy("documents", f"""
      WITH pos AS (
        SELECT i, CAST(unnest(range(10 + CAST(floor(
            {u('dl', 'i')} * 91) AS INT))) AS INT) AS j
        FROM (SELECT unnest(range({nbase})) AS i)),
      base AS (
        SELECT i, string_agg({pick('dw', "i || '-' || j", VOCAB)},
          ' ' ORDER BY j) AS text
        FROM pos GROUP BY i),
      all_docs AS (
        SELECT i AS doc_id, text FROM base
        UNION ALL
        SELECT d.i AS doc_id,
          b.text || CASE WHEN {u('dx', 'd.i')} < 0.032
                         THEN '' ELSE ' dup' END AS text
        FROM (SELECT unnest(range({nbase}, {NDOC})) AS i,
                CAST(hash('db:' || unnest(range({nbase}, {NDOC})))
                  % {nbase} AS BIGINT) AS b) d
        JOIN base b ON d.b = b.i)
      SELECT CAST(doc_id AS BIGINT) AS doc_id, text,
        CASE WHEN {u('dlg', 'doc_id')} < 0.41 THEN 'en'
             WHEN {u('dlg', 'doc_id')} < 0.56 THEN 'de'
             WHEN {u('dlg', 'doc_id')} < 0.71 THEN 'es'
             WHEN {u('dlg', 'doc_id')} < 0.86 THEN 'fr'
             ELSE 'zh' END AS lang,
        'src' || CAST(hash('dsrc:' || doc_id) % 20 AS INT) AS source,
        CAST(length(text) AS BIGINT) AS n_chars
      FROM all_docs ORDER BY doc_id""")

    # embeddings: Box-Muller gaussian per (vec, dim), normalized
    copy("embeddings", f"""
      WITH cells AS (
        SELECT i, CAST(unnest(range(64)) AS INT) AS d
        FROM (SELECT unnest(range({NVEC})) AS i)),
      g AS (
        SELECT i, d,
          sqrt(-2.0 * ln(1.0 - {u('g1', "i || '-' || d")}))
            * cos(2.0 * pi() * {u('g2', "i || '-' || d")}) AS z
        FROM cells),
      vecs AS (
        SELECT i, list(CAST(z AS FLOAT) ORDER BY d) AS raw,
          sqrt(sum(z * z)) AS nrm
        FROM g GROUP BY i)
      SELECT CAST(i AS BIGINT) AS vec_id,
        list_transform(raw, x -> CAST(x / nrm AS FLOAT)) AS embedding,
        CAST(hash('vl:' || i) % 20 AS INT) AS label
      FROM vecs ORDER BY i""")

    print(f"done: sf={SF} at {DST}", flush=True)


if __name__ == "__main__":
    main()
