"""Inflate a driver testdata directory by an integer factor for scale
rehearsals (e.g. sf0.1 -> sf1-equivalent) WITHOUT touching the read-only
/root/testdata tree.

Key-offset replication: each copy c shifts every surrogate key by
c * (max_key + 1), preserving referential integrity (orders.o_custkey
moves with customer.c_custkey, lineitem fks move with their dims) and
leaving per-key group sizes, join fan-outs, and value distributions
identical to the source — so a query's work scales linearly with the
factor, which is exactly what a scale rehearsal should isolate.
Documents get a per-copy text prefix (realistic near-duplicates rather
than exact 10× clones, so MinHash/LSH bucket-size behavior stays
honest); embeddings get a tiny per-copy perturbation for the same
reason; event timestamps shift by c seconds to keep them distinct.

Usage: python tools/make_scale.py [--factor 10] [--src /root/testdata/sf0.1]
       [--dst /tmp/gmr_sf1]
"""

from __future__ import annotations

import argparse
import os

import duckdb

DIMS_AS_IS = ["region", "nation"]


def union_copies(con, select_per_copy: str, factor: int) -> str:
    return " UNION ALL ".join(
        select_per_copy.format(c=c) for c in range(factor)
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default="/tmp/gmr_sf1")
    args = ap.parse_args()
    os.makedirs(args.dst, exist_ok=True)
    con = duckdb.connect()
    con.execute("SET threads TO 16")

    def src(t: str) -> str:
        return f"'{args.src}/{t}.parquet'"

    def write(t: str, sql: str) -> None:
        out = f"{args.dst}/{t}.parquet"
        con.execute(
            f"COPY ({sql}) TO '{out}' (FORMAT PARQUET, COMPRESSION SNAPPY)"
        )
        n = con.execute(f"SELECT COUNT(*) FROM '{out}'").fetchone()[0]
        print(f"{t}: {n} rows")

    for t in DIMS_AS_IS:
        write(t, f"SELECT * FROM {src(t)}")

    offs = {}
    for t, k in [
        ("customer", "c_custkey"),
        ("supplier", "s_suppkey"),
        ("part", "p_partkey"),
        ("orders", "o_orderkey"),
        ("events", "event_id"),
        ("documents", "doc_id"),
        ("embeddings", "vec_id"),
    ]:
        offs[t] = con.execute(
            f"SELECT MAX({k}) + 1 FROM {src(t)}"
        ).fetchone()[0]
    uoff = con.execute(f"SELECT MAX(user_id) + 1 FROM {src('events')}").fetchone()[0]

    write(
        "customer",
        union_copies(
            con,
            f"SELECT c_custkey + {{c}} * {offs['customer']} AS c_custkey,"
            f" c_name, c_nationkey, c_acctbal, c_mktsegment FROM {src('customer')}",
            args.factor,
        ),
    )
    write(
        "supplier",
        union_copies(
            con,
            f"SELECT s_suppkey + {{c}} * {offs['supplier']} AS s_suppkey,"
            f" s_name, s_nationkey, s_acctbal FROM {src('supplier')}",
            args.factor,
        ),
    )
    write(
        "part",
        union_copies(
            con,
            f"SELECT p_partkey + {{c}} * {offs['part']} AS p_partkey,"
            f" p_name, p_brand, p_type, p_size, p_retailprice FROM {src('part')}",
            args.factor,
        ),
    )
    write(
        "orders",
        union_copies(
            con,
            f"SELECT o_orderkey + {{c}} * {offs['orders']} AS o_orderkey,"
            f" o_custkey + {{c}} * {offs['customer']} AS o_custkey,"
            f" o_orderstatus, o_totalprice, o_orderdate, o_orderpriority"
            f" FROM {src('orders')}",
            args.factor,
        ),
    )
    write(
        "lineitem",
        union_copies(
            con,
            f"SELECT l_orderkey + {{c}} * {offs['orders']} AS l_orderkey,"
            f" l_partkey + {{c}} * {offs['part']} AS l_partkey,"
            f" l_suppkey + {{c}} * {offs['supplier']} AS l_suppkey,"
            f" l_linenumber, l_quantity, l_extendedprice, l_discount,"
            f" l_tax, l_returnflag, l_linestatus, l_shipdate"
            f" FROM {src('lineitem')}",
            args.factor,
        ),
    )
    write(
        "events",
        union_copies(
            con,
            f"SELECT event_id + {{c}} * {offs['events']} AS event_id,"
            f" ts + INTERVAL ({{c}}) SECOND AS ts,"
            f" user_id + {{c}} * {uoff} AS user_id,"
            f" event_type, value, props FROM {src('events')}",
            args.factor,
        ),
    )
    write(
        "documents",
        union_copies(
            con,
            f"SELECT doc_id + {{c}} * {offs['documents']} AS doc_id,"
            f" CASE WHEN {{c}} = 0 THEN text"
            f"      ELSE 'v{{c}} ' || text END AS text,"
            f" lang, source, n_chars FROM {src('documents')}",
            args.factor,
        ),
    )
    write(
        "embeddings",
        union_copies(
            con,
            f"SELECT vec_id + {{c}} * {offs['embeddings']} AS vec_id,"
            f" list_transform(embedding, x -> (x + {{c}} * 0.001)::FLOAT)"
            f"   AS embedding,"
            f" label FROM {src('embeddings')}",
            args.factor,
        ),
    )


if __name__ == "__main__":
    main()
