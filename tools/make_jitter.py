#!/usr/bin/env python3
"""Generate a k×-scaled, VALUE-JITTERED copy of a testdata dir — a
"native-ish sf1" smoke (driver-side tooling, like make_scale.py).

`make_scale.py` replicates facts verbatim (key offsets only), which
preserves every per-key density and every value distribution — so
distribution-sensitive code paths (quantiles, Benford-ish digit
stats, Zipf fits, EWMA tails) see k identical copies, not a bigger
dataset. This tool breaks replica symmetry DETERMINISTICALLY:

- replica i's orders/lineitem dates shift by i·3 days (seasonality
  stays, replicas decorrelate in time);
- prices/values scale by a per-row md5-derived factor in [0.8, 1.2)
  rounded to cents (realistic value spread, exactly reproducible
  from the row alone);
- customer FKs on replica i>0 are re-drawn by md5 over the dense key
  space (breaks replica-identical per-customer order counts);
- events values jitter the same way; users/types/ts untouched so the
  streaming/session fixtures stay valid.

Both engines read the same parquet, so the full bit-exact oracle
gate applies unchanged — nothing here depends on how the data was
made. Dimensions copy verbatim (facts grow, dims don't).

Usage: python3 tools/make_jitter.py <src_dir> <dst_dir> <k>
"""
import sys
import duckdb


def main():
    src, dst, k = sys.argv[1], sys.argv[2], int(sys.argv[3])
    con = duckdb.connect()
    import os
    os.makedirs(dst, exist_ok=True)

    def copy(table, sql):
        con.execute(
            f"COPY ({sql}) TO '{dst}/{table}.parquet' (FORMAT PARQUET)")
        n = con.execute(
            f"SELECT count(*) FROM '{dst}/{table}.parquet'").fetchone()[0]
        print(f"{table}: {n} rows")

    for dim in ["region", "nation", "customer", "supplier", "part"]:
        copy(dim, f"SELECT * FROM '{src}/{dim}.parquet'")

    ooff = con.execute(
        f"SELECT max(o_orderkey)+1 FROM '{src}/orders.parquet'"
    ).fetchone()[0]
    eoff = con.execute(
        f"SELECT max(event_id)+1 FROM '{src}/events.parquet'"
    ).fetchone()[0]
    doff = con.execute(
        f"SELECT max(doc_id)+1 FROM '{src}/documents.parquet'"
    ).fetchone()[0]
    voff = con.execute(
        f"SELECT max(vec_id)+1 FROM '{src}/embeddings.parquet'"
    ).fetchone()[0]
    ncust = con.execute(
        f"SELECT count(*) FROM '{src}/customer.parquet'").fetchone()[0]
    # the re-drawn o_custkey below is md5 % ncust, which assumes the
    # customer key space is DENSE and 0-BASED; on a 1-based dataset it
    # would silently create orphan o_custkey=0 orders and starve key
    # ncust-1, skewing the smoke with no error — assert instead
    cmin, cmax = con.execute(
        f"SELECT min(c_custkey), max(c_custkey)"
        f" FROM '{src}/customer.parquet'").fetchone()
    assert cmin == 0 and cmax == ncust - 1, (
        f"c_custkey must be dense 0..n-1 (got min={cmin}, max={cmax},"
        f" n={ncust}); the FK redraw would create orphans")
    reps = f"(SELECT unnest(range({k})) AS i)"

    # deterministic per-row factor in [0.8, 1.2): md5 hex prefix -> u in
    # [0,1). Replica 0 keeps factor 1.0 so fixed-id lookups still match.
    def fac(key):
        u = (f"(list_reduce(list_transform(string_split(substr(md5({key}),"
             f" 1, 8), ''), c -> CAST(strpos('0123456789abcdef', c) - 1"
             f" AS BIGINT)), (a, b) -> a * 16 + b) / 4294967296.0)")
        return f"CASE WHEN i = 0 THEN 1.0 ELSE 0.8 + 0.4 * {u} END"

    ofac = fac("'j:' || o_orderkey || ':' || i")
    copy("orders", f"""
        SELECT o_orderkey + i*{ooff} AS o_orderkey,
               CASE WHEN i = 0 THEN o_custkey
                    ELSE list_reduce(list_transform(string_split(
                      substr(md5('c:' || o_orderkey || ':' || i), 1, 8),
                      ''), c -> CAST(strpos('0123456789abcdef', c) - 1
                      AS BIGINT)), (a, b) -> a * 16 + b) % {ncust}
               END AS o_custkey,
               o_orderstatus,
               round(o_totalprice * ({ofac}) * 100) / 100 AS o_totalprice,
               o_orderdate + to_days(CAST(i * 3 AS INTEGER))
                 AS o_orderdate,
               o_orderpriority
        FROM '{src}/orders.parquet' CROSS JOIN {reps}""")

    lfac = fac("'j:' || l_orderkey || ':' || l_linenumber || ':' || i")
    copy("lineitem", f"""
        SELECT l_orderkey + i*{ooff} AS l_orderkey, l_partkey, l_suppkey,
               l_linenumber, l_quantity,
               round(l_extendedprice * ({lfac}) * 100) / 100
                 AS l_extendedprice,
               l_discount, l_tax, l_returnflag, l_linestatus,
               l_shipdate + to_days(CAST(i * 3 AS INTEGER)) AS l_shipdate
        FROM '{src}/lineitem.parquet' CROSS JOIN {reps}""")

    efac = fac("'j:' || event_id || ':' || i")
    copy("events", f"""
        SELECT event_id + i*{eoff} AS event_id, ts, user_id, event_type,
               round(value * ({efac}) * 100) / 100 AS value, props
        FROM '{src}/events.parquet' CROSS JOIN {reps}""")

    copy("documents", f"""
        SELECT doc_id + i*{doff} AS doc_id,
               CASE WHEN i = 0 THEN text
                    ELSE text || ' r' || CAST(i AS VARCHAR) END AS text,
               lang, source,
               CASE WHEN i = 0 THEN n_chars
                    ELSE n_chars + 2 + length(CAST(i AS VARCHAR))
               END AS n_chars
        FROM '{src}/documents.parquet' CROSS JOIN {reps}""")
    copy("embeddings", f"""
        SELECT vec_id + i*{voff} AS vec_id, embedding, label
        FROM '{src}/embeddings.parquet' CROSS JOIN {reps}""")


if __name__ == "__main__":
    main()
