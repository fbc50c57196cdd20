"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB over the same parquet dir,
compare row count, column names and order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def norm_cell(x):
    if isinstance(x, float):
        if math.isnan(x):
            return "NaN"
        # collapse -0.0/0.0 and float noise beyond 9 significant digits
        return f"{x:.9g}"
    if isinstance(x, bool):
        return str(int(x))
    return str(x)


def norm_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(norm_cell(r[i]) for i in idx))
    out.sort()
    return [cols[i] for i in idx], out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from graphmapreduce_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark(master="local[8]", shuffle_partitions=8, app_name="oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = n_rowsonly = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            cols = df.columns
            rows = [tuple(r) for r in df.collect()]
        except Exception as ex:
            print(f"FAIL  {name}: spark error: {type(ex).__name__}: {ex}")
            n_fail += 1
            continue
        if name not in oracles:
            print(
                f"rows  {name}: {len(rows)} rows, cols={cols}"
                f" ({time.time()-t0:.1f}s) [rows-only]"
            )
            n_rowsonly += 1
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as ex:
            print(f"FAIL  {name}: duckdb error: {type(ex).__name__}: {ex}")
            n_fail += 1
            continue
        scols, srows = norm_rows(cols, rows)
        docols, dorows = norm_rows(ocols, orows)
        if scols != docols:
            print(f"FAIL  {name}: column mismatch spark={scols} duckdb={docols}")
            n_fail += 1
            continue
        if len(srows) != len(dorows):
            print(
                f"FAIL  {name}: row count spark={len(srows)} duckdb={len(dorows)}"
            )
            n_fail += 1
            continue
        if srows != dorows:
            diffs = [
                (a, b) for a, b in zip(srows, dorows) if a != b
            ][:3]
            print(f"FAIL  {name}: value mismatch, first diffs: {diffs}")
            n_fail += 1
            continue
        print(f"PASS  {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")
        n_pass += 1
    print(
        f"\n== {n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only, "
        f"{len(qs)} total =="
    )
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
