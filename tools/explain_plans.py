"""Dump formatted physical plans for headline queries and audit them for
scale hygiene: predicate pushdown reaching the scan, column pruning
(ReadSchema), broadcast joins on dim tables, whole-stage codegen spans.

Usage: python tools/explain_plans.py [sf_dir] [query ...]
"""

from __future__ import annotations

import io
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:]

    from graphmapreduce_spark.session import get_spark
    from graphmapreduce_spark.plans import workload

    spark = get_spark(master="local[4]", shuffle_partitions=4, app_name="explain")
    qs = workload.queries()
    if not names:
        names = [
            "q01_pricing_summary",
            "q02_top_customers",
            "q03_snowflake_agg",
            "q12_distinct_agg",
            "q21_range_join",
            "q31_triangle_count",
            "q48_embedding_topk",
        ]
    for name in names:
        df = qs[name](spark, sf_dir)
        # execute THIS DataFrame's plan first (a write would execute a
        # separate plan instance): AQE only annotates codegen stages /
        # coalesced shuffle reads in the final post-execution plan
        df.collect()
        fmt_buf, simple_buf = io.StringIO(), io.StringIO()
        with redirect_stdout(fmt_buf):
            df.explain("formatted")
        with redirect_stdout(simple_buf):
            df.explain()  # simple mode carries the "*(N)" codegen marks
        plan = simple_buf.getvalue()
        n_exchanges = len(re.findall(r"\bExchange\b", plan))
        n_bcast = len(re.findall(r"BroadcastHashJoin", plan))
        n_codegen = len(set(re.findall(r"\*\((\d+)\)", plan)))
        n_coalesced = len(re.findall(r"AQEShuffleRead coalesced", plan))
        plan = plan + fmt_buf.getvalue()  # formatted part feeds scan info
        pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
        schemas = re.findall(r"ReadSchema: ([^\n]*)", plan)
        print(f"\n==== {name} ====")
        print(
            f"exchanges={n_exchanges} broadcast={n_bcast}"
            f" codegen_spans={n_codegen} aqe_coalesced={n_coalesced}"
        )
        for i, (p, s) in enumerate(zip(pushed, schemas)):
            print(f"scan[{i}]: pushed=[{p[:90]}] read={s[:110]}")
        if "--full" in sys.argv:
            print(plan)
    spark.stop()


if __name__ == "__main__":
    main()
