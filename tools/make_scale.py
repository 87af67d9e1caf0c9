#!/usr/bin/env python3
"""Generate a k×-scaled copy of a testdata dir for scale smokes.

Fact tables (lineitem, orders, events, documents, embeddings) are
replicated k times with key offsets so primary keys stay unique and
FKs stay consistent (replica 0 is the original data verbatim, so
fixed-id lookups in gate queries still resolve). Dimension tables are
copied as-is — the TPC-H shape: facts grow, dims don't.

Replica i>0 documents get a ' r<i>' text suffix (and n_chars bumped to
match) so the dedup/similarity tier sees NEAR duplicates, not exact
clones — exact 10-way clones would collapse the n-gram postings under
df-pruning and test nothing.

Usage: python3 tools/make_scale.py <src_dir> <dst_dir> <k>
(driver-side tooling, like tools/check.py — not part of the library)
"""
import sys
import duckdb

def main():
    src, dst, k = sys.argv[1], sys.argv[2], int(sys.argv[3])
    con = duckdb.connect()
    import os
    os.makedirs(dst, exist_ok=True)

    def copy(table, sql):
        con.execute(f"COPY ({sql}) TO '{dst}/{table}.parquet' (FORMAT PARQUET)")
        n = con.execute(f"SELECT count(*) FROM '{dst}/{table}.parquet'").fetchone()[0]
        print(f"{table}: {n} rows")

    for dim in ["region", "nation", "customer", "supplier", "part"]:
        copy(dim, f"SELECT * FROM '{src}/{dim}.parquet'")

    ooff = con.execute(
        f"SELECT max(o_orderkey)+1 FROM '{src}/orders.parquet'").fetchone()[0]
    eoff = con.execute(
        f"SELECT max(event_id)+1 FROM '{src}/events.parquet'").fetchone()[0]
    doff = con.execute(
        f"SELECT max(doc_id)+1 FROM '{src}/documents.parquet'").fetchone()[0]
    voff = con.execute(
        f"SELECT max(vec_id)+1 FROM '{src}/embeddings.parquet'").fetchone()[0]
    reps = f"(SELECT unnest(range({k})) AS i)"

    copy("orders", f"""
        SELECT o_orderkey + i*{ooff} AS o_orderkey, o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM '{src}/orders.parquet' CROSS JOIN {reps}""")
    copy("lineitem", f"""
        SELECT l_orderkey + i*{ooff} AS l_orderkey, l_partkey, l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount,
               l_tax, l_returnflag, l_linestatus, l_shipdate
        FROM '{src}/lineitem.parquet' CROSS JOIN {reps}""")
    copy("events", f"""
        SELECT event_id + i*{eoff} AS event_id, ts, user_id, event_type,
               value, props
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
