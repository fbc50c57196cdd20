"""Measured skew-join evidence: hot-key joins under three strategies.

The brief's scale mandate ("skewed keys -> salting or AQE skew-join")
should be a measured table, not prose.  This probe builds a fact table
where ONE key owns a configurable share of all rows (the classic
power-law hot key: a null-ish default, a viral item, a bot user),
joins it to a dim table too large to broadcast, and times three
physical strategies back-to-back in ONE session so ratios cancel
ambient load:

  A. plain shuffle join, AQE off   — the naive plan: the hot key's
     entire row set lands on ONE reducer while every other core idles;
  B. ``salted_join`` (operators/relational.py), AQE off — the explicit
     mitigation: the hot key spreads over ``num_salts`` reducers at the
     cost of replicating the dim side once per salt;
  C. plain join, AQE on with skew-join splitting — the runtime
     mitigation: AQE observes the oversized partition after the map
     stage and splits it into advisory-sized chunks.

Broadcast is disabled in all three runs: a broadcastable dim is the
real fix for THIS size, but the probe models the 100 TB case where the
dim side is itself too big to ship to every executor.  For C the AQE
skew thresholds are lowered so splitting fires at probe scale
(production defaults: 256 MB threshold, factor 5 — they fire untouched
at real partition sizes).

All three strategies must produce the IDENTICAL aggregate (asserted),
so the timing table is also a correctness check of ``salted_join``.

Usage:
    python tools/skew_probe.py [--rows N] [--hot-share F]
                               [--keys K] [--salts S] [--repeat R]

Prints one JSON line: {"rows": ..., "hot_share": ...,
"plain_s": ..., "salted_s": ..., "aqe_skew_s": ..., ...}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_tables(spark, n_rows: int, n_keys: int, hot_pct: int):
    from pyspark.sql import functions as F

    # deterministic skew: hot_pct% of rows hash-land on key 0, the
    # rest spread uniformly over 1..n_keys — no RNG, so every run and
    # every strategy sees byte-identical inputs
    fact = (
        spark.range(n_rows)
        .withColumn(
            "key",
            F.when(
                F.pmod(F.xxhash64("id"), F.lit(100)) < hot_pct, F.lit(0)
            ).otherwise(F.pmod(F.col("id"), F.lit(n_keys)) + 1),
        )
        .withColumn("val", F.pmod(F.col("id"), F.lit(997)))
        .select("key", "val")
    )
    dim = (
        spark.range(n_keys + 1)
        .withColumnRenamed("id", "key")
        .withColumn("payload", F.pmod(F.col("key") * 31 + 7, F.lit(1009)))
    )
    return fact, dim


def consume(joined):
    from pyspark.sql import functions as F

    row = joined.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("val") * F.col("payload")).alias("s"),
    ).collect()[0]
    return (row["n"], row["s"])


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=60_000_000)
    ap.add_argument("--keys", type=int, default=1_000_000)
    ap.add_argument("--hot-share", type=int, default=40,
                    help="percent of fact rows on the single hot key")
    ap.add_argument("--salts", type=int, default=32)
    ap.add_argument("--repeat", type=int, default=2,
                    help="timed passes per strategy; min is reported")
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    args = ap.parse_args()

    os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .config("spark.sql.shuffle.partitions", str(args.cpus))
        .config("spark.driver.memory",
                os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
        .config("spark.ui.enabled", "false")
        # model the non-broadcastable dim of the 100 TB case
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        .appName("skew_probe")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    from graphmapreduce_spark.operators.relational import salted_join

    fact, dim = build_tables(spark, args.rows, args.keys, args.hot_share)
    fact = fact.localCheckpoint(eager=True)   # freeze inputs: probe times
    dim = dim.localCheckpoint(eager=True)     # the JOIN, not the generator

    def set_aqe(on: bool):
        spark.conf.set("spark.sql.adaptive.enabled", str(on).lower())
        if on:
            spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
            # production defaults (256 MB / factor 5) fire untouched at
            # real partition sizes; probe partitions are smaller
            spark.conf.set(
                "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
                "16m",
            )
            spark.conf.set(
                "spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m"
            )
            spark.conf.set(
                "spark.sql.adaptive.coalescePartitions.enabled", "false"
            )

    def strat_plain():
        return fact.join(dim, "key")

    def strat_salted():
        return salted_join(fact, dim, ["key"], num_salts=args.salts)

    strategies = [
        ("plain_s", False, strat_plain),
        ("salted_s", False, strat_salted),
        ("aqe_skew_s", True, strat_plain),
    ]
    timings: dict[str, float] = {}
    answers: dict[str, tuple] = {}
    for name, aqe, build in strategies:
        set_aqe(aqe)
        runs = []
        for _ in range(args.repeat):
            t0 = time.perf_counter()
            ans = consume(build())
            runs.append(time.perf_counter() - t0)
        timings[name] = round(min(runs), 2)
        answers[name] = ans
        print(f"# {name}: {timings[name]}s  runs={[round(r,2) for r in runs]}"
              f"  answer={ans}", file=sys.stderr)

    base = answers["plain_s"]
    for name, ans in answers.items():
        if ans != base:
            raise SystemExit(
                f"strategy {name} answer {ans} != plain {base} — "
                "salting/AQE changed the join result"
            )

    out = {
        "rows": args.rows,
        "keys": args.keys,
        "hot_share_pct": args.hot_share,
        "salts": args.salts,
        "cpus": int(args.cpus),
        **timings,
        "speedup_salted": round(timings["plain_s"] / timings["salted_s"], 2),
        "speedup_aqe": round(timings["plain_s"] / timings["aqe_skew_s"], 2),
        "answers_identical": True,
    }
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
