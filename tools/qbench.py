"""Focused per-query bench: same session/methodology as bench.py
(local[$SPARK_GRAFT_CPUS], shuffle_partitions=cpus, noop sink, best of
N) but only for the queries named on the command line.

Usage: python tools/qbench.py [-n PASSES] q46_minhash_lsh [q54_... ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from graphmapreduce_spark.session import get_spark  # noqa: E402
from graphmapreduce_spark.plans import workload  # noqa: E402


def main() -> int:
    args = sys.argv[1:]
    n = 3
    if args and args[0] == "-n":
        n = int(args[1])
        args = args[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="gmr-spark-qbench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    qs = workload.queries()
    # same warmup as bench.py so numbers are comparable
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()
    workload.q01_pricing_summary(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    for name in args:
        fn = qs[name]
        runs = []
        for _ in range(n):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        print(
            f"{name}: min={min(runs):.3f}s runs="
            + ",".join(f"{t:.2f}" for t in runs)
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
