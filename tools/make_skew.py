#!/usr/bin/env python3
"""Generate a SKEWED copy of a testdata dir for skew smokes.

`make_scale.py` replicates keys with offsets, which preserves the
source's per-key densities — uniform-ish fixtures stay uniform, so
hub/straggler code paths (Salt.join, twoHopReach's hot path, AQE skew
splits) never fire. This tool rewrites the lineitem fact's join keys
through a DETERMINISTIC log-uniform (zipf-like) transform: u =
md5-hash of the row key folded to [0,1), key' = floor(exp(u·ln(D))),
which concentrates mass on small ids (rank-frequency slope ≈ -1)
while keeping every value reproducible from the row alone — both
engines see the same parquet, so the full oracle gate still applies.

Everything else copies verbatim — the skew is in the fact's FK
columns only (l_partkey, l_suppkey), the ones the graph/join gate
queries derive their keyspaces from.

Usage: python3 tools/make_skew.py <src_dir> <dst_dir>
(driver-side tooling, like tools/check.py — not part of the library)
"""
import sys
import duckdb


def main():
    src, dst = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    import os
    os.makedirs(dst, exist_ok=True)

    def copy(table, sql):
        con.execute(
            f"COPY ({sql}) TO '{dst}/{table}.parquet' (FORMAT PARQUET)")
        n = con.execute(
            f"SELECT count(*) FROM '{dst}/{table}.parquet'").fetchone()[0]
        print(f"{table}: {n} rows")

    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "events", "documents", "embeddings"]:
        copy(t, f"SELECT * FROM '{src}/{t}.parquet'")

    # deterministic log-uniform fold: md5 hex prefix -> u in [0,1) ->
    # floor(exp(u * ln(D))) in [1, D] — zipf-ish rank-frequency
    def zipf(expr_key, domain):
        u = (f"(CAST(('0x' || substr(md5(CAST({expr_key} AS VARCHAR)), "
             f"1, 12)) AS BIGINT) % 1000000) / 1000000.0")
        return f"CAST(floor(exp({u} * ln({domain}))) AS BIGINT)"

    copy("lineitem", f"""
        SELECT l_orderkey,
               {zipf('l_partkey', 20000)} AS l_partkey,
               {zipf('l_suppkey', 1000)} AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount,
               l_tax, l_returnflag, l_linestatus, l_shipdate
        FROM '{src}/lineitem.parquet'""")

    top = con.execute(f"""
        SELECT l_suppkey, count(*) c FROM '{dst}/lineitem.parquet'
        GROUP BY 1 ORDER BY c DESC LIMIT 5""").fetchall()
    print(f"top-5 l_suppkey frequencies (skew check): {top}")


if __name__ == "__main__":
    main()
