"""The registered workload: every operator of SURVEY.md §2 as a
(spark_fn, oracle_sql) pair.

- ``spark_fn(spark, sf_dir) -> DataFrame`` — the idiomatic DataFrame plan.
- ``oracle_sql`` — ANSI SQL for DuckDB over the same parquet tables
  (views pre-registered), or ``None`` for genuinely non-SQL-expressible
  operators (iterative graph algorithms, LSH with engine-native hashes)
  which get a rows-only check and are instead covered by golden-graph
  pytest fixtures.

Float discipline (hash-compare safety): every aggregated float column is
ROUNDed identically on both sides; money to 2 decimals, ratios/statistics
to 6, cosine to 4 (then ranking happens on the rounded value with an id
tiebreak so top-k membership is deterministic on both engines).
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from graphmapreduce_spark.functions import text as T
from graphmapreduce_spark.functions import vectors as V
from graphmapreduce_spark.graph import PropertyGraph
from graphmapreduce_spark.graph import algorithms as alg
from graphmapreduce_spark.operators._time import normalize_ts as _normalize_ts
from graphmapreduce_spark.operators import dedup as D
from graphmapreduce_spark.operators import multimodal as M
from graphmapreduce_spark.operators import packing as PK
from graphmapreduce_spark.operators import relational as R
from graphmapreduce_spark.operators import sampling as SMP
from graphmapreduce_spark.operators import similarity as S
from graphmapreduce_spark.operators import sketches as SK
from graphmapreduce_spark.operators import timeseries as TS
from graphmapreduce_spark.operators.relational import asof_join, top_k_per_group
from graphmapreduce_spark.streaming import session_agg, sliding_agg, tumbling_agg

QUERIES: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {}


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # events.ts varies by fixture build: TIMESTAMP(NANOS) (read as
        # long under nanosAsLong; values are µs-aligned so the integer
        # ns→µs div is lossless), TIMESTAMP_MICROS isAdjustedToUTC=0
        # (Spark TIMESTAMP_NTZ, which watermarks and bigint casts
        # reject), or plain TIMESTAMP.  Normalize every shape to
        # session-TZ TIMESTAMP (session TZ is UTC) so downstream epoch
        # math matches DuckDB's epoch(ts) on the same file.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        return _normalize_ts(spark.read.parquet(path), "ts")
    return spark.read.parquet(path)


def register(name: str, sql: str | None):
    def deco(fn):
        QUERIES[name] = (fn, sql)
        return fn

    return deco


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {k: v[0] for k, v in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {k: v[1] for k, v in QUERIES.items() if v[1] is not None}


# =====================================================================
# Relational core
# =====================================================================


@register(
    "q01_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2)                                    AS sum_qty,
           ROUND(SUM(l_extendedprice), 2)                               AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)            AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           ROUND(AVG(l_quantity), 6)                                    AS avg_qty,
           ROUND(AVG(l_extendedprice), 6)                               AS avg_price,
           ROUND(AVG(l_discount), 6)                                    AS avg_disc,
           COUNT(*)                                                     AS count_order
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q01_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape: full-scan groupBy-agg with arithmetic — partial
    (map-side) aggregation + whole-stage codegen carry it at any scale."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "sum_disc_price"
        ),
        F.round(
            F.sum(
                F.col("l_extendedprice")
                * (1 - F.col("l_discount"))
                * (1 + F.col("l_tax"))
            ),
            2,
        ).alias("sum_charge"),
        F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
        F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
        F.round(F.avg("l_discount"), 6).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


@register(
    "q02_top_customers",
    """
    SELECT o.o_custkey AS c_custkey, ANY_VALUE(c.c_name) AS c_name,
           ROUND(SUM(o.o_totalprice), 2) AS revenue,
           COUNT(*) AS n_orders
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY o.o_custkey
    ORDER BY revenue DESC, c_custkey ASC
    LIMIT 10
    """,
)
def q02_top_customers(spark, sf_dir):
    """Fact⋈dim join + agg + deterministic top-k (TakeOrderedAndProject)."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(
            F.any_value("c_name").alias("c_name"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(10)
    )


@register(
    "q03_snowflake_agg",
    """
    SELECT r.r_name, n.n_name,
           COUNT(*) AS n_customers,
           ROUND(AVG(c.c_acctbal), 6) AS avg_acctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    """,
)
def q03_snowflake_agg(spark, sf_dir):
    """Snowflake join through two broadcast dims — no shuffle on the fact
    side until the final agg."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.avg("c_acctbal"), 6).alias("avg_acctbal"),
        )
    )


@register(
    "q04_semi_join",
    """
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 1000)
    """,
)
def q04_semi_join(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 1000)
    return c.join(
        o, c["c_custkey"] == o["o_custkey"], "left_semi"
    ).select("c_custkey", "c_name")


@register(
    "q05_anti_join",
    """
    SELECT c_custkey, c_acctbal
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def q05_anti_join(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(o, c["c_custkey"] == o["o_custkey"], "left_anti").select(
        "c_custkey", "c_acctbal"
    )


@register(
    "q06_outer_join_counts",
    """
    SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders,
           ROUND(COALESCE(SUM(o.o_totalprice), 0), 2) AS total_spent
    FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey
    """,
)
def q06_outer_join_counts(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias(
                "total_spent"
            ),
        )
    )


@register(
    "q07_window_topk_per_group",
    """
    SELECT p_brand, p_partkey, p_retailprice, rn FROM (
      SELECT p_brand, p_partkey, p_retailprice,
             ROW_NUMBER() OVER (PARTITION BY p_brand
                                ORDER BY p_retailprice DESC, p_partkey ASC) AS rn
      FROM part) t
    WHERE rn <= 3
    """,
)
def q07_window_topk_per_group(spark, sf_dir):
    p = _t(spark, sf_dir, "part")
    return top_k_per_group(
        p.select("p_brand", "p_partkey", "p_retailprice"),
        ["p_brand"],
        [F.col("p_retailprice").desc(), F.col("p_partkey").asc()],
        k=3,
        keep_rank=True,
    )


@register(
    "q08_window_lag",
    """
    SELECT o_orderkey, o_custkey,
           ROUND(o_totalprice - LAG(o_totalprice) OVER
                 (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), 2)
             AS delta_prev
    FROM orders
    """,
)
def q08_window_lag(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.round(F.col("o_totalprice") - F.lag("o_totalprice").over(w), 2).alias(
            "delta_prev"
        ),
    )


@register(
    "q09_window_running_sum",
    """
    SELECT o_orderkey,
           ROUND(SUM(o_totalprice) OVER
                 (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
             AS running_total
    FROM orders
    """,
)
def q09_window_running_sum(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
    )


@register(
    "q10_rollup",
    """
    SELECT r.r_name, n.n_name, COUNT(*) AS n, ROUND(SUM(c.c_acctbal), 2) AS bal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP (r.r_name, n.n_name)
    """,
)
def q10_rollup(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .rollup("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("c_acctbal"), 2).alias("bal"),
        )
    )


@register(
    "q11_cube",
    """
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty, COUNT(*) AS n
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def q11_cube(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "q12_distinct_agg",
    """
    SELECT l_suppkey,
           COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(DISTINCT l_orderkey) AS n_orders,
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY l_suppkey
    """,
)
def q12_distinct_agg(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_suppkey").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "q13_set_ops",
    """
    SELECT 'only_rich' AS side, c_custkey FROM
      (SELECT c_custkey FROM customer WHERE c_acctbal > 5000
       EXCEPT
       SELECT DISTINCT o_custkey FROM orders)
    UNION ALL
    SELECT 'only_buyers' AS side, c_custkey FROM
      (SELECT DISTINCT o_custkey AS c_custkey FROM orders
       EXCEPT
       SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
    """,
)
def q13_set_ops(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    rich = c.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    buyers = o.select(F.col("o_custkey").alias("c_custkey")).distinct()
    only_rich = rich.exceptAll(rich.intersect(buyers)).select(
        F.lit("only_rich").alias("side"), "c_custkey"
    )
    only_buyers = buyers.exceptAll(buyers.intersect(rich)).select(
        F.lit("only_buyers").alias("side"), "c_custkey"
    )
    return only_rich.unionByName(only_buyers)


@register(
    "q14_sort_limit",
    """
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
    LIMIT 100
    """,
)
def q14_sort_limit(spark, sf_dir):
    """Global ordered top-k — Spark's TakeOrderedAndProject replaces the
    reference's distributed sample sort (samplesort.cpp:21-191)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(
            F.col("l_extendedprice").desc(),
            F.col("l_orderkey").asc(),
            F.col("l_linenumber").asc(),
        )
        .limit(100)
    )


@register(
    "q15_string_funcs",
    """
    SELECT p_partkey,
           LOWER(p_name)                         AS name_lower,
           SUBSTRING(p_name, 1, 5)               AS name_prefix,
           SPLIT_PART(p_name, ' ', 1)            AS first_word,
           CONCAT(p_brand, '#', p_type)          AS brand_type,
           LENGTH(p_name)                        AS name_len,
           LEVENSHTEIN(p_brand, p_type)          AS brand_type_dist,
           REGEXP_EXTRACT(p_name, '([a-z]+)$', 1) AS last_word
    FROM part
    """,
)
def q15_string_funcs(spark, sf_dir):
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("name_lower"),
        F.substring("p_name", 1, 5).alias("name_prefix"),
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)).alias("first_word"),
        F.concat(F.col("p_brand"), F.lit("#"), F.col("p_type")).alias("brand_type"),
        F.length("p_name").alias("name_len"),
        F.levenshtein("p_brand", "p_type").alias("brand_type_dist"),
        F.regexp_extract(F.col("p_name"), "([a-z]+)$", 1).alias("last_word"),
    )


@register(
    "q16_date_funcs",
    """
    SELECT CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS order_month,
           COUNT(*) AS n,
           ROUND(SUM(o_totalprice), 2) AS total,
           MIN(EPOCH(o_orderdate))::BIGINT AS first_epoch,
           MAX(YEAR(o_orderdate)) AS max_year,
           MAX(MONTH(o_orderdate)) AS max_month
    FROM orders
    GROUP BY 1
    """,
)
def q16_date_funcs(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return o.groupBy(
        F.date_trunc("month", "o_orderdate").alias("order_month")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
        F.min(F.unix_timestamp("o_orderdate")).alias("first_epoch"),
        F.max(F.year("o_orderdate")).alias("max_year"),
        F.max(F.month("o_orderdate")).alias("max_month"),
    )


@register(
    "q17_conditional",
    """
    SELECT CASE WHEN c_acctbal < 0 THEN 'neg'
                WHEN c_acctbal < 1000 THEN 'low'
                WHEN c_acctbal < 5000 THEN 'mid'
                ELSE 'high' END AS bucket,
           COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'OTHER') AS seg,
           COUNT(*) AS n
    FROM customer
    GROUP BY 1, 2
    """,
)
def q17_conditional(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    bucket = (
        F.when(F.col("c_acctbal") < 0, "neg")
        .when(F.col("c_acctbal") < 1000, "low")
        .when(F.col("c_acctbal") < 5000, "mid")
        .otherwise("high")
    )
    seg = F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("OTHER"))
    return c.groupBy(bucket.alias("bucket"), seg.alias("seg")).agg(
        F.count(F.lit(1)).alias("n")
    )


@register(
    "q18_json",
    """
    SELECT event_type,
           COUNT(*) AS n,
           ROUND(AVG(CAST(json_extract_string(props, '$.k') AS BIGINT)), 6) AS avg_k,
           MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
    FROM events
    GROUP BY event_type
    """,
)
def q18_json(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg(k), 6).alias("avg_k"),
        F.max(k).alias("max_k"),
    )


@register(
    "q19_array_agg",
    """
    SELECT l_orderkey,
           ARRAY_TO_STRING(LIST_SORT(LIST(l_linenumber)), ',') AS lines_str,
           COUNT(*) AS n_lines
    FROM lineitem
    GROUP BY l_orderkey
    """,
)
def q19_array_agg(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_orderkey").agg(
        F.concat_ws(",", F.array_sort(F.collect_list("l_linenumber"))).alias(
            "lines_str"
        ),
        F.count(F.lit(1)).alias("n_lines"),
    )


@register(
    "q20_theta_join",
    """
    SELECT n1.n_name AS name_a, n2.n_name AS name_b
    FROM nation n1 JOIN nation n2
      ON n1.n_regionkey = n2.n_regionkey AND n1.n_nationkey < n2.n_nationkey
    """,
)
def q20_theta_join(spark, sf_dir):
    n = _t(spark, sf_dir, "nation")
    n1, n2 = n.alias("n1"), n.alias("n2")
    return n1.join(
        n2,
        (F.col("n1.n_regionkey") == F.col("n2.n_regionkey"))
        & (F.col("n1.n_nationkey") < F.col("n2.n_nationkey")),
    ).select(F.col("n1.n_name").alias("name_a"), F.col("n2.n_name").alias("name_b"))


@register(
    "q21_range_join",
    """
    SELECT e1.user_id, COUNT(*) AS n_pairs
    FROM events e1 JOIN events e2
      ON e1.user_id = e2.user_id
     AND e1.event_type = 'click' AND e2.event_type = 'purchase'
     AND e2.ts > e1.ts AND e2.ts <= e1.ts + INTERVAL 10 MINUTE
    GROUP BY e1.user_id
    """,
)
def q21_range_join(spark, sf_dir):
    """Interval join: equi key (user) + band predicate on time — the
    equi key keeps it a hash join with a residual filter."""
    e = _t(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").alias("e1")
    buys = e.filter(F.col("event_type") == "purchase").alias("e2")
    return (
        clicks.join(
            buys,
            (F.col("e1.user_id") == F.col("e2.user_id"))
            & (F.col("e2.ts") > F.col("e1.ts"))
            & (F.col("e2.ts") <= F.col("e1.ts") + F.expr("INTERVAL 10 MINUTES")),
        )
        .groupBy(F.col("e1.user_id").alias("user_id"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


@register(
    "q22_asof_join",
    """
    SELECT p.event_id, p.user_id,
           c.value AS last_click_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND c.ts <= p.ts
    """,
)
def q22_asof_join(spark, sf_dir):
    """As-of join via union + running last() window — no per-key merge
    loop, one shuffle on the key."""
    e = _t(spark, sf_dir, "events")
    buys = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = e.filter(F.col("event_type") == "click").select("user_id", "ts", "value")
    out = asof_join(
        buys,
        clicks,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        value_cols=["value"],
        direction="backward",
    )
    return out.select(
        "event_id", "user_id", F.col("value").alias("last_click_value")
    )


@register(
    "q23_grouping_sets",
    """
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty, COUNT(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def q23_grouping_sets(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_quantity), 2) AS sum_qty, COUNT(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@register("q24_approx_distinct", None)  # HLL sketches differ per engine
def q24_approx_distinct(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
        F.countDistinct("l_partkey").alias("exact_parts"),
    )


@register(
    "q25_pandas_udaf_median",
    """
    SELECT o_custkey,
           ROUND(MEDIAN(o_totalprice), 3) AS median_price,
           COUNT(*) AS n
    FROM orders
    GROUP BY o_custkey
    """,
)
def q25_pandas_udaf_median(spark, sf_dir):
    """Custom UDAF surface (ref GMR::reduce, gmr.h:89): grouped-map
    applyInPandas computing an exact per-group median — Arrow-batched,
    one shuffle on the group key."""
    import pandas as pd

    o = _t(spark, sf_dir, "orders")

    def median(pdf: "pd.DataFrame") -> "pd.DataFrame":
        # no Python round() here: banker's rounding differs from SQL
        # HALF_UP — rounding happens in the engine on both sides
        return pd.DataFrame(
            {
                "o_custkey": [pdf["o_custkey"].iloc[0]],
                "median_price": [float(pdf["o_totalprice"].median())],
                "n": [len(pdf)],
            }
        )

    out = o.groupBy("o_custkey").applyInPandas(
        median, schema="o_custkey long, median_price double, n long"
    )
    # medians of 2-decimal prices are exact at 3 decimals → boundary-safe
    return out.select(
        "o_custkey", F.round("median_price", 3).alias("median_price"), "n"
    )


@register(
    "q26_higher_order_array",
    """
    SELECT l_orderkey,
           ROUND(SUM(CASE WHEN l_extendedprice > 1000
                          THEN l_extendedprice * (1 - l_discount) END), 4)
             AS big_net,
           COUNT(*) FILTER (l_extendedprice > 1000) AS n_big
    FROM lineitem
    GROUP BY l_orderkey
    """,
)
def q26_higher_order_array(spark, sf_dir):
    """Array higher-order functions (filter→transform→aggregate fold) over
    per-order collected line arrays — the declarative form of the
    reference's list-payload reduces (KV.svalue, gmr.h:36)."""
    li = _t(spark, sf_dir, "lineitem")
    rows = li.groupBy("l_orderkey").agg(
        F.collect_list(F.struct("l_extendedprice", "l_discount")).alias("lines")
    )
    big = F.filter("lines", lambda s: s["l_extendedprice"] > 1000)
    net = F.aggregate(
        F.transform(big, lambda s: s["l_extendedprice"] * (1 - s["l_discount"])),
        F.lit(None).cast("double"),
        lambda acc, x: F.coalesce(acc + x, x),
    )
    # products of 2-decimal prices × 2-decimal discounts are exact at 4
    # decimals → rounding there never sits on a boundary
    return rows.select(
        "l_orderkey",
        F.round(net, 4).alias("big_net"),
        F.size(big).cast("long").alias("n_big"),
    )


@register(
    "q27_map_funcs",
    """
    SELECT user_id,
           COUNT(DISTINCT event_type) AS n_types,
           MAX(event_type = 'click')::BOOLEAN AS has_click,
           MAX(CASE WHEN event_type = 'purchase' THEN cnt ELSE 0 END)
             AS n_purchases
    FROM (SELECT user_id, event_type, COUNT(*) AS cnt
          FROM events GROUP BY 1, 2)
    GROUP BY user_id
    """,
)
def q27_map_funcs(spark, sf_dir):
    """Map-typed columns: per-user event_type→count map built with
    map_from_entries, queried with map_keys/map_contains_key/element_at."""
    e = _t(spark, sf_dir, "events")
    per_type = e.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    maps = per_type.groupBy("user_id").agg(
        F.map_from_entries(
            F.collect_list(F.struct("event_type", "cnt"))
        ).alias("m")
    )
    return maps.select(
        "user_id",
        F.size(F.map_keys("m")).cast("long").alias("n_types"),
        F.map_contains_key("m", "click").alias("has_click"),
        F.coalesce(F.element_at("m", "purchase"), F.lit(0)).alias("n_purchases"),
    )


@register(
    "q28_udtf_tokenize",
    """
    SELECT doc_id,
           len(list_filter(string_split_regex(text, '\\s+'), x -> x <> ''))
             AS n_tokens
    FROM documents WHERE doc_id < 200
    """,
)
def q28_udtf_tokenize(spark, sf_dir):
    """UDTF-style mapInPandas: Python tokenizer over Arrow batches,
    exploding then re-aggregating — result matches the pure-SQL oracle."""
    import pandas as pd

    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)

    def tokenize(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_tokens": [
                        len([w for w in str(s).split() if w]) for s in pdf["text"]
                    ],
                }
            )

    return d.mapInPandas(tokenize, schema="doc_id long, n_tokens long")


@register(
    "q29_json_construct",
    """
    SELECT event_id,
           '{"k2":' || (2 * CAST(json_extract_string(props, '$.k') AS BIGINT))
             || '}' AS doubled_json
    FROM events WHERE event_type = 'error'
    """,
)
def q29_json_construct(spark, sf_dir):
    """JSON parse → transform → re-serialize (from_json/to_json)."""
    e = _t(spark, sf_dir, "events").filter(F.col("event_type") == "error")
    parsed = e.select(
        "event_id", F.from_json("props", "k BIGINT").alias("j")
    )
    return parsed.select(
        "event_id",
        F.to_json(F.struct((F.col("j.k") * 2).alias("k2"))).alias("doubled_json"),
    )


@register(
    "q59_window_range_frame",
    """
    SELECT o_orderkey,
           COUNT(*) OVER w AS n_last30d,
           ROUND(SUM(o_totalprice) OVER w, 2) AS spent_last30d
    FROM (SELECT o_orderkey, o_custkey, o_totalprice,
                 EPOCH(o_orderdate)::BIGINT AS ep FROM orders)
    WINDOW w AS (PARTITION BY o_custkey ORDER BY ep
                 RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW)
    """,
)
def q59_window_range_frame(spark, sf_dir):
    """RANGE-frame window (value-based, not row-based): per customer,
    orders within the trailing 30 days of each order.  Epoch seconds as
    the range key keeps the frame arithmetic engine-portable."""
    o = _t(spark, sf_dir, "orders").withColumn(
        "ep", F.unix_timestamp("o_orderdate")
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("ep")
        .rangeBetween(-30 * 86400, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        F.count(F.lit(1)).over(w).alias("n_last30d"),
        F.round(F.sum("o_totalprice").over(w), 2).alias("spent_last30d"),
    )


@register(
    "q70_ranking_suite",
    """
    SELECT c_custkey, c_nationkey,
           ROW_NUMBER()   OVER w AS rn,
           RANK()         OVER w AS rnk,
           DENSE_RANK()   OVER w AS drnk,
           NTILE(4)       OVER w AS quartile,
           ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
           ROUND(CUME_DIST()    OVER w, 6) AS cume
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey
                 ORDER BY c_acctbal DESC, c_custkey)
    """,
)
def q70_ranking_suite(spark, sf_dir):
    """Full ranking-function surface in one window (unique ordering via
    the custkey tiebreak makes every function deterministic)."""
    c = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), "c_custkey"
    )
    return c.select(
        "c_custkey",
        "c_nationkey",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


@register(
    "q71_analytic_suite",
    """
    SELECT o_orderkey,
           LEAD(o_totalprice)  OVER w AS next_price,
           FIRST_VALUE(o_totalprice) OVER w AS first_price,
           LAST_VALUE(o_totalprice)  OVER
             (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS last_price,
           NTH_VALUE(o_totalprice, 2) OVER
             (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS second_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def q71_analytic_suite(spark, sf_dir):
    """lead / first_value / last_value / nth_value.  last & nth use an
    explicit unbounded frame — the ANSI default frame ends at CURRENT
    ROW, which would silently make last_value ≡ current value."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wfull = w.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return o.select(
        "o_orderkey",
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(wfull).alias("last_price"),
        F.nth_value("o_totalprice", 2).over(wfull).alias("second_price"),
    )


@register(
    "q72_exists_subquery",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_totalprice > 300000)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderstatus = 'F')
    """,
)
def q72_exists_subquery(spark, sf_dir):
    """Correlated EXISTS / NOT EXISTS — Catalyst rewrites them to
    left-semi and left-anti hash joins (same physical plan a hand-written
    semi/anti join would get; subquery surface, not a new operator)."""
    _t(spark, sf_dir, "customer").createOrReplaceTempView("v_customer")
    _t(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    return spark.sql("""
        SELECT c_custkey, c_name FROM v_customer c
        WHERE EXISTS (SELECT 1 FROM v_orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 300000)
          AND NOT EXISTS (SELECT 1 FROM v_orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderstatus = 'F')
    """)


@register(
    "q73_unpivot",
    """
    SELECT p_partkey, dim, val FROM (
      SELECT p_partkey, 'size' AS dim, p_size::DOUBLE AS val FROM part
      UNION ALL
      SELECT p_partkey, 'retail' AS dim, p_retailprice AS val FROM part
    ) WHERE val IS NOT NULL
    """,
)
def q73_unpivot(spark, sf_dir):
    """Unpivot (long-form melt) via the native ``unpivot`` — one scan,
    no self-union (the UNION ALL oracle form scans the table once per
    measure; at 100 TB that multiplier matters)."""
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.col("p_size").cast("double").alias("size"),
        F.col("p_retailprice").alias("retail"),
    ).unpivot("p_partkey", ["size", "retail"], "dim", "val")


@register("q74_hll_sketch_rollup", None)  # sketch estimate: no SQL oracle
def q74_hll_sketch_rollup(spark, sf_dir):
    """Mergeable-sketch pre-aggregation: per-(event_type, day) HLL
    sketches of user_id, rolled up to per-event_type distinct-user
    estimates by merging sketches only — the pattern that answers any
    later date-range distinct query without re-scanning the base table.
    Estimate accuracy vs. true distinct is pytest-verified (<2%), as is
    the union-vs-direct-sketch drift bound."""
    from graphmapreduce_spark.operators import sketches as SK

    e = _t(spark, sf_dir, "events").withColumn(
        "day", F.to_date("ts")
    )
    daily = SK.hll_sketch_table(e, ["event_type", "day"], "user_id")
    return SK.hll_rollup(daily, ["event_type"]).orderBy("event_type")


@register(
    "q57_percentiles",
    """
    SELECT l_returnflag,
           ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
           ROUND(quantile_cont(l_extendedprice, 0.9), 4) AS p90,
           ROUND(quantile_cont(l_extendedprice, 0.99), 4) AS p99,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q57_percentiles(spark, sf_dir):
    """Exact interpolated percentiles (sort-based agg) — the determinstic
    counterpart of approx_percentile, value-comparable across engines."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(l_extendedprice, 0.9)"), 4).alias("p90"),
        F.round(F.expr("percentile(l_extendedprice, 0.99)"), 4).alias("p99"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "q58_scalar_subquery",
    """
    SELECT c_custkey, c_nationkey,
           ROUND(c_acctbal, 2) AS c_acctbal
    FROM customer c
    WHERE c_acctbal > (SELECT AVG(c2.c_acctbal) FROM customer c2
                       WHERE c2.c_nationkey = c.c_nationkey)
    """,
)
def q58_scalar_subquery(spark, sf_dir):
    """Correlated scalar subquery (above-per-nation-average), decorrelated
    the scale-correct way: one groupBy + a broadcast join back, instead
    of a per-row subquery execution."""
    c = _t(spark, sf_dir, "customer")
    nat_avg = c.groupBy("c_nationkey").agg(
        F.avg("c_acctbal").alias("_nat_avg")
    )
    return (
        c.join(F.broadcast(nat_avg), "c_nationkey")
        .filter(F.col("c_acctbal") > F.col("_nat_avg"))
        .select(
            "c_custkey", "c_nationkey", F.round("c_acctbal", 2).alias("c_acctbal")
        )
    )


# =====================================================================
# Graph algorithms on derived edge tables
# =====================================================================


def _ps_graph(spark, sf_dir) -> PropertyGraph:
    """Bipartite part–supplier graph from lineitem (parts negated to keep
    id spaces disjoint), weight = min quantity seen."""
    li = _t(spark, sf_dir, "lineitem")
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    # ONE shuffle: partition by src first, then aggregate — hash
    # partitioning on src already co-locates equal (src, dst) pairs, so
    # the groupBy needs no further exchange and the cached edge table
    # comes out partitioned on the join key of every superstep
    e = (
        li.select(
            F.col("l_suppkey").alias("src"),
            (-F.col("l_partkey")).alias("dst"),
            F.col("l_quantity"),
        )
        .repartition(n_part, "src")
        .groupBy("src", "dst")
        .agg(F.min("l_quantity").alias("weight"))
    )
    return PropertyGraph.from_edges(e, prepartition=False)


def _mod_graph(spark, sf_dir, k: int = 500) -> PropertyGraph:
    """Directed graph on Z_k derived from lineitem (orderkey→partkey)."""
    li = _t(spark, sf_dir, "lineitem")
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    # single-shuffle build: see _ps_graph
    e = (
        li.select(
            (F.col("l_orderkey") % k).alias("src"),
            (F.col("l_partkey") % k).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .repartition(n_part, "src")
        .dropDuplicates(["src", "dst"])
        .withColumn("weight", F.lit(1.0))
    )
    return PropertyGraph.from_edges(e, prepartition=False)


@register(
    "q30_degrees",
    """
    SELECT src AS id, COUNT(*) AS out_degree FROM
      (SELECT DISTINCT l_suppkey AS src, l_partkey AS dst FROM lineitem)
    GROUP BY src
    """,
)
def q30_degrees(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    e = li.select(
        F.col("l_suppkey").alias("src"), F.col("l_partkey").alias("dst")
    ).distinct()
    return e.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("out_degree")
    )


@register(
    "q31_triangle_count",
    """
    WITH und AS (
      SELECT DISTINCT LEAST(l_orderkey % 500, l_partkey % 500) AS a,
                      GREATEST(l_orderkey % 500, l_partkey % 500) AS b
      FROM lineitem
      WHERE l_orderkey % 500 <> l_partkey % 500
    )
    SELECT COUNT(*)::BIGINT AS n_triangles
    FROM und e1 JOIN und e2 ON e1.b = e2.a
                JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
    """,
)
def q31_triangle_count(spark, sf_dir):
    """TriangleCount (ref algorithms.h:97-180) on the degree-ordered
    orientation (`algorithms._enumerate_triangles`): wedges pair the
    out-edges of each triangle's lowest-degree corner, so hub vertices
    can't go quadratic in the wedge join."""
    li = _t(spark, sf_dir, "lineitem")
    e = (
        li.select(
            (F.col("l_orderkey") % 500).alias("s"), (F.col("l_partkey") % 500).alias("t")
        )
        .select(F.least("s", "t").alias("a"), F.greatest("s", "t").alias("b"))
        .filter(F.col("a") < F.col("b"))
        .distinct()
        # materialize once: the orientation + 3-way self-join must not
        # re-derive the (scan + distinct shuffle) edge set per branch
        .localCheckpoint(eager=True)
    )
    return alg._enumerate_triangles(e).agg(
        F.count(F.lit(1)).alias("n_triangles")
    )


def _pagerank_oracle_sql(n_iter: int = 15, d: float = 0.85, k: int = 500) -> str:
    """Unrolled power iteration in portable SQL (MATERIALIZED CTEs so the
    oracle engine scans lineitem once, not once per iteration)."""
    pre = f"""
    WITH e AS MATERIALIZED (
      SELECT DISTINCT l_orderkey % {k} AS src, l_partkey % {k} AS dst
      FROM lineitem WHERE l_orderkey % {k} <> l_partkey % {k}
    ),
    v AS MATERIALIZED (SELECT src AS id FROM e UNION SELECT dst AS id FROM e),
    deg AS MATERIALIZED (
      SELECT src AS id, COUNT(*)::DOUBLE AS d FROM e GROUP BY src),
    nn AS MATERIALIZED (SELECT COUNT(*)::DOUBLE AS n FROM v),
    r0 AS MATERIALIZED (SELECT id, 1.0/(SELECT n FROM nn) AS rank FROM v)
    """
    its = []
    for i in range(1, n_iter + 1):
        p = f"r{i - 1}"
        its.append(f"""
    r{i} AS MATERIALIZED (
      SELECT v.id,
             (1-{d})/(SELECT n FROM nn)
             + {d} * (SELECT COALESCE(SUM(r.rank),0) FROM {p} r
                      LEFT JOIN deg dg ON dg.id = r.id WHERE dg.id IS NULL)
                   / (SELECT n FROM nn)
             + {d} * COALESCE(s.in_sum, 0) AS rank
      FROM v
      LEFT JOIN (SELECT e.dst AS id, SUM(r.rank / dg.d) AS in_sum
                 FROM e JOIN {p} r ON r.id = e.src
                        JOIN deg dg ON dg.id = e.src
                 GROUP BY e.dst) s ON s.id = v.id
    )""")
        pre_sep = ","
    return (
        pre + pre_sep + ",".join(its)
        + f"\n    SELECT id, ROUND(rank, 6) AS rank FROM r{n_iter}"
    )


@register("q32_pagerank", _pagerank_oracle_sql())
def q32_pagerank(spark, sf_dir):
    """PageRank (ref algorithms.h:4-37, quirks normalized per SURVEY §7.4).
    Oracle: the same 15 power iterations unrolled as SQL CTEs."""
    g = _mod_graph(spark, sf_dir, 500)
    # fixed 15 iterations (threshold unreachable) → chain 5 supersteps
    # per Spark job; exact-iteration parity holds since 15 % 5 == 0
    pr = alg.pagerank(
        g, damping=0.85, max_iter=15, threshold=1e-8, check_interval=5
    )
    return pr.select("id", F.round("rank", 6).alias("rank"))


@register(
    "q33_sssp",
    """
    WITH w AS (SELECT -l_partkey AS id, MIN(l_quantity)::DOUBLE AS distance
               FROM lineitem WHERE l_suppkey = 1 GROUP BY 1)
    SELECT id, ROUND(distance, 6) AS distance FROM w
    UNION ALL SELECT 1 AS id, 0.0 AS distance
    """,
)
def q33_sssp(spark, sf_dir):
    """SSSP (ref algorithms.h:42-92).  On the bipartite supplier→part
    graph every shortest path is one hop, so the converged Bellman-Ford
    fixpoint has a closed-form oracle; multi-hop convergence is covered
    by the golden-graph pytest suite."""
    g = _ps_graph(spark, sf_dir)
    d = alg.sssp(g, source=1, broadcast_vertices=True)
    return d.filter(F.col("distance") != float("inf")).select(
        "id", F.round("distance", 6).alias("distance")
    )


def _wcc_oracle_sql(n_iter: int = 14) -> str:
    """Min-label propagation unrolled to the fixpoint (graph diameter at
    sf0.01 is well under n_iter; extra iterations are no-ops)."""
    pre = """
    WITH de AS MATERIALIZED (
      SELECT DISTINCT l_suppkey AS src, -l_partkey AS dst FROM lineitem
    ),
    e AS MATERIALIZED (SELECT src, dst FROM de UNION SELECT dst, src FROM de),
    v AS MATERIALIZED (SELECT DISTINCT src AS id FROM e),
    c0 AS MATERIALIZED (SELECT id, id AS lbl FROM v)
    """
    its = []
    for i in range(1, n_iter + 1):
        p = f"c{i - 1}"
        its.append(f"""
    c{i} AS MATERIALIZED (
      SELECT v.id, LEAST(p.lbl, COALESCE(m.mn, p.lbl)) AS lbl
      FROM v JOIN {p} p ON p.id = v.id
      LEFT JOIN (SELECT e.dst AS id, MIN(p2.lbl) AS mn
                 FROM e JOIN {p} p2 ON p2.id = e.src GROUP BY e.dst) m
             ON m.id = v.id
    )""")
    return (
        pre + "," + ",".join(its)
        + f"\n    SELECT lbl AS component, COUNT(*) AS n_members"
        + f" FROM c{n_iter} GROUP BY lbl"
    )


@register("q34_wcc", _wcc_oracle_sql())
def q34_wcc(spark, sf_dir):
    """Connected components (ref stub algorithms.h:195).  Oracle: the
    same min-label propagation unrolled as SQL CTEs past the diameter."""
    g = _ps_graph(spark, sf_dir)
    # min-propagation is idempotent past the fixpoint, so chunking the
    # vote-to-halt to every 2 supersteps is safe (AQE broadcasts the
    # small vertex state at runtime; no explicit hint needed)
    cc = alg.connected_components(g, check_interval=2)
    return cc.groupBy("component").agg(F.count(F.lit(1)).alias("n_members"))


@register(
    "q35_bfs",
    """
    WITH de AS MATERIALIZED (
      SELECT DISTINCT l_suppkey AS src, -l_partkey AS dst FROM lineitem),
    v AS MATERIALIZED (SELECT src AS id FROM de UNION SELECT dst AS id FROM de),
    l1 AS (SELECT DISTINCT dst AS id FROM de WHERE src = 1)
    SELECT level, COUNT(*) AS n_at_level FROM (
      SELECT v.id, CASE WHEN v.id = 1 THEN 0
                        WHEN l1.id IS NOT NULL THEN 1
                        ELSE -1 END AS level
      FROM v LEFT JOIN l1 ON l1.id = v.id) t
    GROUP BY level
    """,
)
def q35_bfs(spark, sf_dir):
    """BFS levels (ref stub algorithms.h:190); -1 = unreachable.  The
    bipartite graph has exact levels {0, 1, -1} from a supplier source."""
    g = _ps_graph(spark, sf_dir)
    lv = alg.bfs(g, source=1)
    return lv.groupBy("level").agg(F.count(F.lit(1)).alias("n_at_level"))


def _scc_oracle_sql(k: int = 100, n_iter: int = 8) -> str:
    """Forward/backward min-label reachability unrolled past the diameter.
    v belongs to the SCC of root r iff r is both the min label reaching v
    and the min label reachable from v.  Single peel round — exact here
    because the Z_k graph at sf0.01 is one SCC (0 stragglers, verified);
    multi-round peeling is covered by the golden-graph pytest suite."""
    pre = f"""
    WITH e AS MATERIALIZED (
      SELECT DISTINCT l_orderkey % {k} AS src, l_partkey % {k} AS dst
      FROM lineitem WHERE l_orderkey % {k} <> l_partkey % {k}
    ),
    v AS MATERIALIZED (SELECT src AS id FROM e UNION SELECT dst AS id FROM e),
    f0 AS MATERIALIZED (SELECT id, id AS lbl FROM v),
    b0 AS MATERIALIZED (SELECT id, id AS lbl FROM v)"""
    its = []
    for i in range(1, n_iter + 1):
        its.append(f"""
    f{i} AS MATERIALIZED (
      SELECT v.id, LEAST(p.lbl, COALESCE(m.mn, p.lbl)) AS lbl
      FROM v JOIN f{i - 1} p ON p.id = v.id
      LEFT JOIN (SELECT e.dst AS id, MIN(p2.lbl) AS mn
                 FROM e JOIN f{i - 1} p2 ON p2.id = e.src GROUP BY e.dst) m
             ON m.id = v.id),
    b{i} AS MATERIALIZED (
      SELECT v.id, LEAST(p.lbl, COALESCE(m.mn, p.lbl)) AS lbl
      FROM v JOIN b{i - 1} p ON p.id = v.id
      LEFT JOIN (SELECT e.src AS id, MIN(p2.lbl) AS mn
                 FROM e JOIN b{i - 1} p2 ON p2.id = e.dst GROUP BY e.src) m
             ON m.id = v.id)""")
    return (
        pre + "," + ",".join(its)
        + f"""
    SELECT f.lbl AS component, COUNT(*) AS n_members
    FROM f{n_iter} f JOIN b{n_iter} b ON f.id = b.id AND f.lbl = b.lbl
    GROUP BY f.lbl"""
    )


@register("q36_scc", _scc_oracle_sql())
def q36_scc(spark, sf_dir):
    """SCC (ref stub algorithms.h:207) via forward/backward min-label
    peeling; oracle: the same reachability labels unrolled as SQL CTEs."""
    g = _mod_graph(spark, sf_dir, 100)
    scc = alg.strongly_connected_components(g, max_outer=20)
    return scc.groupBy("component").agg(F.count(F.lit(1)).alias("n_members"))


@register("q37_mst", None)  # iterative — golden-graph pytest coverage
def q37_mst(spark, sf_dir):
    g = _ps_graph(spark, sf_dir)
    mst = alg.boruvka_mst(g)
    return mst.agg(
        F.count(F.lit(1)).alias("n_edges"),
        F.round(F.sum("weight"), 4).alias("total_weight"),
    )


@register(
    "q38_matmul",
    """
    WITH a AS (SELECT l_suppkey AS i, l_partkey % 20 AS k,
                      SUM(l_quantity) AS v
               FROM lineitem GROUP BY 1, 2),
         b AS (SELECT p_partkey % 20 AS k, p_size % 10 AS j,
                      SUM(p_retailprice) AS v
               FROM part GROUP BY 1, 2)
    SELECT a.i, b.j, ROUND(SUM(a.v * b.v), 2) AS v
    FROM a JOIN b ON a.k = b.k
    GROUP BY a.i, b.j
    """,
)
def q38_matmul(spark, sf_dir):
    """MatrixMultiply (ref stub algorithms.h:185) as COO join-agg."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    a = li.groupBy(
        F.col("l_suppkey").alias("i"), (F.col("l_partkey") % 20).alias("k")
    ).agg(F.sum("l_quantity").alias("v"))
    b = p.groupBy(
        (F.col("p_partkey") % 20).alias("k"), (F.col("p_size") % 10).alias("j")
    ).agg(F.sum("p_retailprice").alias("v"))
    out = alg.matmul(a, b)
    return out.select("i", "j", F.round("v", 2).alias("v"))


@register("q39_kmeans", None)  # iterative — pytest-covered; deterministic seeds
def q39_kmeans(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    assign = alg.kmeans(
        emb, k=4, max_iter=5, id_col="vec_id", vec_col="embedding"
    )
    return assign.groupBy("cluster").agg(F.count(F.lit(1)).alias("n_members"))


# =====================================================================
# Dedup / text analysis / similarity (north-star [EXT])
# =====================================================================


@register(
    "q40_dedup_exact",
    """
    WITH keep AS (SELECT text, MIN(doc_id) AS doc_id FROM documents GROUP BY text)
    SELECT d.source, COUNT(*) AS n_kept
    FROM documents d JOIN keep k ON d.text = k.text AND d.doc_id = k.doc_id
    GROUP BY d.source
    """,
)
def q40_dedup_exact(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    kept = D.exact_dedup(d, ["text"], "doc_id")
    return kept.groupBy("source").agg(F.count(F.lit(1)).alias("n_kept"))


@register(
    "q41_fingerprint",
    """
    SELECT md5(array_to_string(list_sort(list_distinct(
             list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                         x -> x <> ''))), ' ')) AS fingerprint,
           COUNT(*) AS n_docs,
           MIN(doc_id) AS min_doc_id
    FROM documents
    GROUP BY 1
    """,
)
def q41_fingerprint(spark, sf_dir):
    """Normalized (OpenRefine-style) document fingerprint groups."""
    d = _t(spark, sf_dir, "documents")
    return d.groupBy(
        T.normalized_fingerprint("text").alias("fingerprint")
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("doc_id").alias("min_doc_id"),
    )


@register(
    "q42_text_stats",
    """
    SELECT lang,
           COUNT(*) AS n_docs,
           ROUND(AVG(len(list_filter(string_split_regex(trim(text), '\\s+'),
                                     x -> x <> ''))), 6) AS avg_words,
           ROUND(AVG(CASE WHEN length(regexp_replace(text, '\\s', '', 'g')) > 0
                  THEN CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE)
                       / length(regexp_replace(text, '\\s', '', 'g'))
                  ELSE 0 END), 6) AS avg_punct_ratio,
           ROUND(AVG(length(text)), 6) AS avg_chars
    FROM documents
    GROUP BY lang
    """,
)
def q42_text_stats(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg(T.n_words("text")), 6).alias("avg_words"),
        F.round(F.avg(T.punct_ratio("text")), 6).alias("avg_punct_ratio"),
        F.round(F.avg(F.length("text")), 6).alias("avg_chars"),
    )


@register(
    "q43_token_count",
    """
    SELECT source,
           SUM(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]')))::BIGINT
             AS total_tokens,
           ROUND(AVG(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]'))), 6)
             AS avg_tokens
    FROM documents
    GROUP BY source
    """,
)
def q43_token_count(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.groupBy("source").agg(
        F.sum(T.token_count("text")).cast("long").alias("total_tokens"),
        F.round(F.avg(T.token_count("text")), 6).alias("avg_tokens"),
    )


def _lang_id_oracle_sql() -> str:
    """Replicates functions.text.language_id: per-language stopword hits,
    argmax with alphabetical tie-break, 'und' when no hits."""
    hit_exprs = []
    for lang, stops in sorted(T.STOPWORDS.items()):
        lst = ", ".join(f"'{w}'" for w in stops)
        hit_exprs.append(
            f"len(list_filter(ws, x -> list_contains([{lst}], lower(x))))"
            f" AS h_{lang}"
        )
    hits = ",\n             ".join(hit_exprs)
    return f"""
    WITH toks AS (
      SELECT list_filter(string_split_regex(trim(text), '\\s+'),
                         x -> x <> '') AS ws
      FROM documents
    ),
    scored AS (
      SELECT {hits}
      FROM toks
    )
    SELECT CASE WHEN GREATEST(h_de, h_en, h_es, h_fr) = 0 THEN 'und'
                WHEN h_de >= h_en AND h_de >= h_es AND h_de >= h_fr THEN 'de'
                WHEN h_en >= h_es AND h_en >= h_fr THEN 'en'
                WHEN h_es >= h_fr THEN 'es'
                ELSE 'fr' END AS predicted_lang,
           COUNT(*) AS n_docs
    FROM scored
    GROUP BY 1
    """


@register("q44_lang_id", _lang_id_oracle_sql())
def q44_lang_id(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.groupBy(T.language_id("text").alias("predicted_lang")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )


@register(
    "q45_ngram_jaccard",
    """
    WITH sh AS (
      SELECT doc_id, list_distinct(list_transform(
               range(1, GREATEST(length(text) - 2, 0) + 1),
               i -> substr(text, i, 3))) AS grams
      FROM documents WHERE doc_id < 100
    ),
    inv AS (SELECT doc_id, UNNEST(grams) AS g FROM sh),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
      FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           ROUND(CAST(i AS DOUBLE) /
                 (len(sa.grams) + len(sb.grams) - i), 6) AS jaccard
    FROM inter
    JOIN sh sa ON sa.doc_id = id_a
    JOIN sh sb ON sb.doc_id = id_b
    WHERE CAST(i AS DOUBLE) / (len(sa.grams) + len(sb.grams) - i) >= 0.2
    """,
)
def q45_ngram_jaccard(spark, sf_dir):
    """Exact n-gram Jaccard similarity join via shingle inverted index.
    max_df=1000 exceeds the 100-doc slice's maximum possible document
    frequency, so the cap is exercised in-plan without changing results
    (the oracle is uncapped)."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return D.ngram_jaccard_pairs(
        d, "doc_id", "text", n=3, threshold=0.2, max_df=1000
    )


def _minhash_lsh_oracle_sql(
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 5,
    threshold: float = 0.5,
    seed: int = 42,
) -> str:
    """Replicates the full MinHash-LSH pipeline: md5-60bit shingle ids,
    the same seeded universal-hash coefficients, band buckets by content,
    exact-Jaccard verification — every stage value-checked."""
    a, b = D._hash_coeffs(num_hashes, seed)
    p = D._MERSENNE
    mins = ",\n             ".join(
        f"MIN(({int(a[i])} * x + {int(b[i])}) % {p}) AS m{i}"
        for i in range(num_hashes)
    )
    r = num_hashes // bands
    band_rows = "\n      UNION ALL ".join(
        "SELECT doc_id, '{j}:' || {expr} AS bucket FROM sig".format(
            j=j,
            expr=" || '_' || ".join(f"m{j * r + i}" for i in range(r)),
        )
        for j in range(bands)
    )
    return f"""
    WITH sh AS MATERIALIZED (
      SELECT doc_id, list_distinct(list_transform(
               range(1, GREATEST(length(text) - {shingle_n - 1}, 0) + 1),
               i -> substr(text, i, {shingle_n}))) AS grams
      FROM documents
    ),
    ids AS MATERIALIZED (
      SELECT doc_id,
             ('0x' || substr(md5(g), 1, 15))::BIGINT % {p} AS x
      FROM (SELECT doc_id, UNNEST(grams) AS g FROM sh)
    ),
    sig AS MATERIALIZED (
      SELECT doc_id,
             {mins}
      FROM ids GROUP BY doc_id
    ),
    bands AS MATERIALIZED (
      {band_rows}
    ),
    cand AS MATERIALIZED (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b
        ON a.bucket = b.bucket AND a.doc_id < b.doc_id
    ),
    scored AS (
      SELECT id_a, id_b,
             CAST(len(list_filter(sa.grams,
                      g -> list_contains(sb.grams, g))) AS DOUBLE)
             / (len(sa.grams) + len(sb.grams)
                - len(list_filter(sa.grams,
                      g -> list_contains(sb.grams, g)))) AS jaccard
      FROM cand JOIN sh sa ON sa.doc_id = id_a
                JOIN sh sb ON sb.doc_id = id_b
    )
    SELECT id_a, id_b, ROUND(jaccard, 6) AS jaccard
    FROM scored WHERE jaccard >= {threshold}
    """


@register("q46_minhash_lsh", _minhash_lsh_oracle_sql())
def q46_minhash_lsh(spark, sf_dir):
    """MinHash+LSH near-dup pairs, md5-hash variant: signatures, band
    buckets, and Jaccard verification all replicated by the SQL oracle.
    (xxhash64 is the production default; the hash swap changes only the
    shingle-id expression, not the plan shape.)"""
    d = _t(spark, sf_dir, "documents")
    pairs = D.minhash_lsh_near_dup_pairs(
        d, "doc_id", "text", threshold=0.5, num_hashes=32, shingle_n=5,
        hash_fn="md5",
    )
    return pairs


def _simhash_fp_ctes(num_bits: int, where: str) -> str:
    """CTE chain yielding ``sh(doc_id, simhash)`` that replicates
    operators.dedup.simhash with the md5-60bit word hash: per-bit +1/-1
    sums over word hashes, bit set iff sum positive.  Bits >= 60 are
    provably never set (the 60-bit hash has them zero, so their sum is
    -n_words <= 0) and are omitted from the SQL."""
    hi = min(num_bits, 60)
    sums = ",\n             ".join(
        f"SUM(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS s{i}"
        for i in range(hi)
    )
    fp = " + ".join(
        f"(CASE WHEN s{i} > 0 THEN {1 << i} ELSE 0 END)" for i in range(hi)
    )
    return f"""w AS MATERIALIZED (
      SELECT doc_id,
             UNNEST(list_filter(string_split_regex(trim(text), '\\s+'),
                                x -> x <> '')) AS word
      FROM documents {where}
    ),
    h AS MATERIALIZED (
      SELECT doc_id, ('0x' || substr(md5(word), 1, 15))::BIGINT AS h FROM w
    ),
    bits AS (
      SELECT doc_id,
             {sums}
      FROM h GROUP BY doc_id
    ),
    sh AS MATERIALIZED (
      SELECT d.doc_id, COALESCE({fp}, 0) AS simhash
      FROM (SELECT doc_id FROM documents {where}) d
      LEFT JOIN bits USING (doc_id)
    )"""


def _simhash_oracle_sql(num_bits: int, where: str) -> str:
    return f"""
    WITH {_simhash_fp_ctes(num_bits, where)}
    SELECT doc_id, simhash FROM sh
    """


def _simhash_hamming_oracle_sql(
    num_bits: int, bands: int, max_hamming: int, where: str
) -> str:
    """Replicates simhash_near_dup_pairs: banded candidate buckets over
    the replicated fingerprints, popcount-verified."""
    band_w = num_bits // bands
    mask = (1 << band_w) - 1
    return f"""
    WITH {_simhash_fp_ctes(num_bits, where)},
    bands AS (
      SELECT doc_id, simhash AS fp, t.j,
             (simhash >> (t.j * {band_w})) & {mask} AS bv
      FROM sh CROSS JOIN range(0, {bands}) t(j)
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
             a.fp AS fa, b.fp AS fb
      FROM bands a JOIN bands b
        ON a.j = b.j AND a.bv = b.bv AND a.doc_id < b.doc_id
    )
    SELECT id_a, id_b, CAST(bit_count(xor(fa, fb)) AS BIGINT) AS hamming
    FROM cand WHERE bit_count(xor(fa, fb)) <= {max_hamming}
    """


@register("q47_simhash", _simhash_oracle_sql(32, "WHERE doc_id < 100"))
def q47_simhash(spark, sf_dir):
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return d.select(
        "doc_id", D.simhash("text", num_bits=32, hash_fn="md5").alias("simhash")
    )


@register(
    "q75_simhash_hamming",
    _simhash_hamming_oracle_sql(32, 4, 3, "WHERE doc_id < 200"),
)
def q75_simhash_hamming(spark, sf_dir):
    """SimHash hamming-band near-dup: 4 bands over a 32-bit fingerprint,
    candidates share a band, verified by popcount <= 3 (complete for
    hamming < bands by pigeonhole).  md5 variant — the full pipeline is
    replicated by the SQL oracle."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    pairs = D.simhash_near_dup_pairs(
        d, "doc_id", "text", num_bits=32, bands=4, max_hamming=3,
        hash_fn="md5",
    )
    return pairs.select("id_a", "id_b", F.col("hamming").cast("long").alias("hamming"))


@register(
    "q48_embedding_topk",
    """
    WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         q AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
               WHERE vec_id < 5),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             ROUND(list_sum(list_transform(range(1, len(q.v) + 1),
                              i -> q.v[i] * c.v[i]))
               / (sqrt(list_sum(list_transform(q.v, x -> x * x)))
                * sqrt(list_sum(list_transform(c.v, x -> x * x)))), 4)
               AS cosine
      FROM c CROSS JOIN q
      WHERE q.vec_id <> c.vec_id
    )
    SELECT query_id, neighbor_id, cosine, rank FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                 ORDER BY cosine DESC, neighbor_id ASC) AS rank
      FROM scored) t
    WHERE rank <= 10
    """,
)
def q48_embedding_topk(spark, sf_dir):
    """Brute-force cosine top-k (the ANN baseline).  Ranking happens on
    the ROUNDed cosine with an id tiebreak so both engines agree."""
    emb = _t(spark, sf_dir, "embeddings")
    qs = emb.filter(F.col("vec_id") < 5)
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").cast("array<double>").alias("cv"),
    )
    q = qs.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("qv"),
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(V.cosine(F.col("qv"), F.col("cv")), 4).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= 10
    )


@register("q49_ivf_ann", None)  # approximate by design — recall pytest-verified
def q49_ivf_ann(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    qs = emb.filter(F.col("vec_id") < 5)
    return S.ivf_topk(emb, qs, k=10, n_cells=8, nprobe=3).select(
        "query_id", "neighbor_id", "cosine", "rank"
    )


@register(
    "q50_multimodal_meta",
    """
    SELECT doc_id,
           OCTET_LENGTH(ENCODE(text)) AS n_bytes,
           MD5(text) AS payload_md5
    FROM documents
    """,
)
def q50_multimodal_meta(spark, sf_dir):
    """Binary-column metadata path: payload stays opaque; only built-in
    byte-level functions touch it (the binary never enters Python)."""
    d = _t(spark, sf_dir, "documents")
    media = d.select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    out = M.media_metadata(media)
    return out.select("doc_id", "n_bytes", "payload_md5")


def _embedding_near_dup_oracle_sql(
    num_planes: int = 4,
    seed: int = 42,
    dim: int = 64,
    threshold: float = 0.3,
    id_cap: int = 300,
) -> str:
    """Replicates embedding_near_dup_pairs exactly: the seeded hyperplanes
    are embedded as SQL literals, so bucket assignment AND cosine verify
    both run in the oracle engine."""
    import numpy as np

    rng = np.random.RandomState(seed)
    planes = rng.standard_normal((num_planes, dim))
    bits = " + ".join(
        "(CASE WHEN list_sum(list_transform(range(1, {d} + 1),"
        " i -> v[i] * ([{plane}])[i])) >= 0 THEN {w} ELSE 0 END)".format(
            d=dim,
            plane=", ".join(repr(float(x)) for x in p),
            w=1 << b,
        )
        for b, p in enumerate(planes)
    )
    return f"""
    WITH sig AS MATERIALIZED (
      SELECT vec_id AS id, embedding::DOUBLE[] AS v,
             {bits} AS bucket
      FROM embeddings WHERE vec_id < {id_cap}
    )
    SELECT a.id AS id_a, b.id AS id_b,
           ROUND(list_sum(list_transform(range(1, {dim} + 1),
                            i -> a.v[i] * b.v[i]))
             / (sqrt(list_sum(list_transform(a.v, x -> x * x)))
              * sqrt(list_sum(list_transform(b.v, x -> x * x)))), 6) AS cosine
    FROM sig a JOIN sig b ON a.bucket = b.bucket AND a.id < b.id
    WHERE list_sum(list_transform(range(1, {dim} + 1), i -> a.v[i] * b.v[i]))
          / (sqrt(list_sum(list_transform(a.v, x -> x * x)))
           * sqrt(list_sum(list_transform(b.v, x -> x * x)))) >= {threshold}
    """


@register("q51_embedding_near_dup", _embedding_near_dup_oracle_sql())
def q51_embedding_near_dup(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs: random-hyperplane LSH
    candidates verified by exact cosine.  The oracle embeds the same
    seeded hyperplanes as SQL literals — bucketing and verification are
    both value-checked."""
    emb = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 300)
    return D.embedding_near_dup_pairs(
        emb, "vec_id", "embedding", threshold=0.3, num_planes=4, dim=64
    )


def _simhash_groups_oracle_sql() -> str:
    inner = _simhash_oracle_sql(64, "")
    return f"""
    WITH fp AS MATERIALIZED ({inner})
    SELECT simhash,
           array_to_string(list_sort(list(doc_id)), ',') AS ids_str,
           COUNT(*) AS group_size
    FROM fp
    GROUP BY simhash
    HAVING COUNT(*) >= 2
    """


@register("q52_simhash_groups", _simhash_groups_oracle_sql())
def q52_simhash_groups(spark, sf_dir):
    """SimHash duplicate groups (identical 64-bit fingerprint),
    md5-hash variant so the whole grouping is oracle-verified."""
    d = _t(spark, sf_dir, "documents")
    out = D.simhash_dup_groups(d, "doc_id", "text", num_bits=64, hash_fn="md5")
    return out.select(
        "simhash", F.concat_ws(",", "ids").alias("ids_str"), "group_size"
    )


@register(
    "q53_quality_score",
    """
    WITH feats AS (
      SELECT doc_id,
             LEAST(length(text) / 200.0, 1.0) AS len_score,
             CASE WHEN length(regexp_replace(text, '\\s', '', 'g')) > 0
                  THEN CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE)
                       / length(regexp_replace(text, '\\s', '', 'g'))
                  ELSE 0 END AS punct,
             list_filter(string_split_regex(trim(text), '\\s+'),
                         x -> x <> '') AS ws
      FROM documents
    )
    SELECT doc_id,
           ROUND((len_score
                  + GREATEST(0.0, 1.0 - punct * 4.0)
                  + LEAST(CASE WHEN len(ws) > 0
                          THEN len(list_filter(ws, x -> list_contains(
                                 ['the','and','is','of','to','a','in','that','it','for'],
                                 lower(x)))) * 5.0 / len(ws)
                          ELSE 0 END, 1.0)) / 3.0, 6) AS quality
    FROM feats
    """,
)
def q53_quality_score(spark, sf_dir):
    """Pretraining-corpus quality heuristic (length / punctuation /
    stopword tests) as a pure Column expression."""
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", T.quality_score("text").alias("quality"))


def _winnowing_oracle_sql(n: int = 8, w: int = 4) -> str:
    """Replicates winnowing_fingerprints (md5 variant) + the q54 pair
    pipeline: rolling md5-60bit hashes, window-of-w min, distinct fps,
    document-frequency cap, shared-fp pair counts."""
    return f"""
    WITH d AS MATERIALIZED (
      SELECT doc_id, text FROM documents WHERE doc_id < 100
    ),
    g AS MATERIALIZED (
      SELECT doc_id, i AS pos,
             ('0x' || substr(md5(substr(text, i, {n})), 1, 15))::BIGINT AS h
      FROM d, UNNEST(range(1, GREATEST(length(text) - {n - 1}, 0) + 1)) AS t(i)
    ),
    m AS (
      SELECT doc_id, pos,
             MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
                          ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING)
               AS wmin,
             COUNT(*) OVER (PARTITION BY doc_id) AS sz
      FROM g
    ),
    fp AS MATERIALIZED (
      SELECT DISTINCT doc_id, wmin AS fp
      FROM m WHERE pos <= GREATEST(sz - {w}, 0) + 1
    ),
    hot AS (SELECT fp FROM fp GROUP BY fp HAVING COUNT(*) > 20),
    fpc AS (SELECT * FROM fp WHERE fp NOT IN (SELECT fp FROM hot))
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS shared_fps
    FROM fpc a JOIN fpc b ON a.fp = b.fp AND a.doc_id < b.doc_id
    GROUP BY 1, 2
    HAVING COUNT(*) >= 5
    """


@register("q54_winnowing", _winnowing_oracle_sql())
def q54_winnowing(spark, sf_dir):
    """Winnowing fingerprints (Schleimer et al., SIGMOD'03): shared
    fingerprint count per candidate pair over a small doc slice.
    md5-hash variant — the whole pipeline is oracle-verified."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    fp = D.winnowing_fingerprints(
        d, "doc_id", "text", n=8, w=4, hash_fn="md5"
    ).localCheckpoint(eager=True)  # fingerprint once, not once per join side
    # cap fingerprint document frequency: boilerplate n-grams shared by
    # most docs produce O(df^2) pairs and zero dedup signal
    hot = (
        fp.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > 20)
        .select("fp")
    )
    fp = fp.join(F.broadcast(hot), "fp", "left_anti")
    a, b = fp.alias("a"), fp.alias("b")
    return (
        a.join(b, (F.col("a.fp") == F.col("b.fp"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("shared_fps"))
        .filter(F.col("shared_fps") >= 5)
    )


@register("q55_image_features", None)  # deterministic fake decoder
def q55_image_features(spark, sf_dir):
    """Multimodal decode plumbing: binary payload → mapInPandas feature
    extraction (deterministic stub decoder; schema/batching real)."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    media = d.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "UTF-8").alias("payload"),
        F.lit(8).alias("width"),
        F.lit(8).alias("height"),
    )
    feats = M.extract_image_features(media, fake=True, n_features=4)
    return feats.select(
        "media_id",
        F.round(F.col("features")[0], 6).alias("f_mean"),
        F.round(F.col("features")[1], 6).alias("f_std"),
    )


@register("q56_video_frames", None)  # deterministic fake decoder
def q56_video_frames(spark, sf_dir):
    """Frame-sampling UDTF shape: one row per sampled frame."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    media = d.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "UTF-8").alias("payload"),
        (F.col("doc_id") % 5 * 1000 + 1000).cast("long").alias("duration_ms"),
    )
    frames = M.sample_video_frames(media, every_ms=1000, fake=True)
    return frames.select("media_id", "frame_idx", "ts_ms", "frame_md5")


@register("q67_audio_features", None)  # deterministic fake decoder
def q67_audio_features(spark, sf_dir):
    """Audio-clip feature extraction (framed RMS + zero-crossing rate)
    over binary payloads — mapInPandas plumbing real, decode stubbed."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    media = d.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "UTF-8").alias("payload"),
        (F.col("doc_id") % 4 * 250 + 250).cast("long").alias("duration_ms"),
    )
    feats = M.extract_audio_features(media, fake=True, frame_ms=25)
    return feats.select(
        "media_id",
        "n_samples",
        "n_frames",
        F.round("rms_mean", 6).alias("rms_mean"),
        F.round("zcr_mean", 6).alias("zcr_mean"),
    )


@register(
    "q68_pivot",
    """
    SELECT l_linestatus,
           ROUND(SUM(CASE WHEN l_returnflag = 'A' THEN l_quantity END), 2) AS A,
           ROUND(SUM(CASE WHEN l_returnflag = 'N' THEN l_quantity END), 2) AS N,
           ROUND(SUM(CASE WHEN l_returnflag = 'R' THEN l_quantity END), 2) AS R
    FROM lineitem GROUP BY l_linestatus
    """,
)
def q68_pivot(spark, sf_dir):
    """Pivot (wide aggregation).  Explicit value list — with it the
    pivot is a single pass (one shuffle, same plan as the CASE-WHEN
    form); without it Spark must first run a distinct() job to discover
    the columns, which is a full extra scan at 100 TB."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_linestatus")
        .pivot("l_returnflag", ["A", "N", "R"])
        .agg(F.round(F.sum("l_quantity"), 2))
    )


# =====================================================================
# Streaming (batch-verifiable event-time windows)
# =====================================================================


@register(
    "q60_tumbling_window",
    """
    SELECT DATE_TRUNC('hour', ts) AS window_start,
           event_type,
           COUNT(*) AS n,
           ROUND(SUM(value), 4) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def q60_tumbling_window(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    out = tumbling_agg(
        e,
        "ts",
        "1 hour",
        group_cols=["event_type"],
        aggs=[
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("total_value"),
        ],
    )
    return out.drop("window_end")


@register(
    "q61_sliding_window",
    """
    WITH buckets AS (
      SELECT make_timestamp(CAST(floor(epoch(ts) / 300) * 300 AS BIGINT)
                            * 1000000) AS w0, * FROM events
    ),
    expanded AS (
      SELECT w0 AS window_start, user_id, value FROM buckets
      UNION ALL
      SELECT w0 - INTERVAL 5 MINUTE AS window_start, user_id, value FROM buckets
    )
    SELECT window_start, COUNT(*) AS n, ROUND(SUM(value), 4) AS total_value
    FROM expanded
    GROUP BY 1
    """,
)
def q61_sliding_window(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    out = sliding_agg(
        e,
        "ts",
        "10 minutes",
        "5 minutes",
        aggs=[
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("total_value"),
        ],
    )
    return out.drop("window_end")


@register(
    "q62_session_window",
    """
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id)
                       > INTERVAL 5 MINUTE
                  OR LAG(ts) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    sess AS (
      SELECT *, SUM(new_session) OVER (PARTITION BY user_id
                                       ORDER BY ts
                                       ROWS UNBOUNDED PRECEDING) AS sid
      FROM flagged
    )
    SELECT MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 5 MINUTE AS session_end,
           user_id,
           COUNT(*) AS n,
           ROUND(SUM(value), 4) AS total_value
    FROM sess
    GROUP BY user_id, sid
    """,
)
def q62_session_window(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    return session_agg(
        e,
        "ts",
        "5 minutes",
        group_cols=["user_id"],
        aggs=[
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("total_value"),
        ],
    )


def _stream_events(spark, sf_dir):
    """readStream over the events parquet fixture, with ``ts``
    normalized to session-TZ TIMESTAMP whatever the physical form
    (nanos-as-long, TIMESTAMP_NTZ, or TIMESTAMP), mirroring ``_t`` —
    watermarks require TIMESTAMP, not NTZ."""
    import os as _os

    path = _os.path.join(sf_dir, "events.parquet")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    static = spark.read.parquet(path)
    # the file stream source requires a directory: point it at sf_dir
    # with a glob selecting only the events file
    stream = (
        spark.readStream.schema(static.schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return _normalize_ts(stream, "ts")


def _run_stream_to_table(spark, stream_df, name: str, output_mode: str = "update"):
    """Execute a streaming query to completion (availableNow) into an
    in-memory sink and return the materialized table."""
    import tempfile
    import uuid

    qname = f"{name}_{uuid.uuid4().hex[:8]}"
    q = (
        stream_df.writeStream.format("memory")
        .queryName(qname)
        .outputMode(output_mode)
        .option(
            "checkpointLocation",
            tempfile.mkdtemp(prefix=f"gmr_ckpt_{name}_"),
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(qname)


@register(
    "q63_streaming_tumbling",
    """
    SELECT DATE_TRUNC('hour', ts) AS window_start,
           event_type,
           COUNT(*) AS n,
           ROUND(SUM(value), 4) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def q63_streaming_tumbling(spark, sf_dir):
    """True Structured Streaming execution (readStream → watermark →
    tumbling window → memory sink, availableNow) — the fixture is one
    file = one micro-batch, so no rows are late and the result equals
    the batch oracle."""
    stream = _stream_events(spark, sf_dir)
    windowed = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )
    return _run_stream_to_table(spark, windowed, "tumbling")


@register(
    "q64_stateful_running_totals",
    """
    SELECT user_id, COUNT(*) AS n, ROUND(SUM(value), 4) AS total
    FROM events
    GROUP BY user_id
    """,
)
def q64_stateful_running_totals(spark, sf_dir):
    """Arbitrary stateful streaming (applyInPandasWithState running
    count/sum per user).  Update mode emits one row per key per
    micro-batch; the final row per key (max n) is the converged total,
    equal to the batch aggregate."""
    from graphmapreduce_spark.streaming import stateful as ST

    stream = _stream_events(spark, sf_dir)
    running = ST.running_totals(stream, key_col="user_id", value_col="value")
    out = _run_stream_to_table(spark, running, "running")
    w = Window.partitionBy("user_id").orderBy(F.col("n").desc())
    return (
        out.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("user_id", "n", F.round("total", 4).alias("total"))
    )


@register(
    "q65_streaming_session",
    """
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id)
                       > INTERVAL 5 MINUTE
                  OR LAG(ts) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    sess AS (
      SELECT *, SUM(new_session) OVER (PARTITION BY user_id
                                       ORDER BY ts
                                       ROWS UNBOUNDED PRECEDING) AS sid
      FROM flagged
    )
    SELECT MIN(ts) AS session_start, user_id,
           COUNT(*) AS n, ROUND(SUM(value), 4) AS total_value
    FROM sess
    GROUP BY user_id, sid
    """,
)
def q65_streaming_session(spark, sf_dir):
    """True streaming session windows: readStream → watermark →
    session_window(gap 5 min) → append-mode memory sink.

    Session aggregation only supports append output, which emits a
    session once the watermark passes its end.  A far-future 'flush'
    event is appended to a temp copy of the stream so the final
    watermark closes every real session — i.e. the query exercises the
    real eviction semantics instead of relying on query shutdown."""
    import os as _os
    import shutil
    import tempfile

    src = _os.path.join(sf_dir, "events.parquet")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    static = spark.read.parquet(src)
    d = tempfile.mkdtemp(prefix="gmr_sess_src_")
    shutil.copy(src, _os.path.join(d, "00_events.parquet"))
    # flush row in the fixture's native physical type (nanos-long,
    # TIMESTAMP_NTZ, or TIMESTAMP), 2h past the max event
    max_ts = static.agg(F.max("ts")).first()[0]
    if dict(static.dtypes).get("ts") == "bigint":
        flush_ts = int(max_ts) + 2 * 3600 * 1_000_000_000
    else:
        import datetime as _dt

        flush_ts = max_ts + _dt.timedelta(hours=2)
    flush = spark.createDataFrame(
        [(-1, flush_ts, -1, "flush", 0.0, None)], static.schema
    )
    flush.coalesce(1).write.mode("append").parquet(d)
    stream = _normalize_ts(
        spark.readStream.schema(static.schema).parquet(d), "ts"
    )
    sess = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.session_window("ts", "5 minutes"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.col("session_window.start").alias("session_start"),
            "user_id",
            "n",
            "total_value",
        )
    )
    out = _run_stream_to_table(spark, sess, "session", output_mode="append")
    return out.filter(F.col("user_id") >= 0)


@register(
    "q66_stream_stream_join",
    """
    SELECT e1.user_id, COUNT(*) AS n_pairs
    FROM events e1 JOIN events e2
      ON e1.user_id = e2.user_id
     AND e1.event_type = 'click' AND e2.event_type = 'purchase'
     AND e2.ts > e1.ts AND e2.ts <= e1.ts + INTERVAL 10 MINUTE
    GROUP BY e1.user_id
    """,
)
def q66_stream_stream_join(spark, sf_dir):
    """Stream-stream interval join (clicks ⋈ purchases within 10 min per
    user), both sides watermarked — state is bounded by the watermark +
    band width.  Joined rows are re-aggregated batch-side after the
    stream completes (one micro-batch, so no pairs straddle a batch
    boundary) and must equal the q21 batch-join oracle."""
    stream = _stream_events(spark, sf_dir)
    clicks = (
        stream.filter(F.col("event_type") == "click")
        .select("user_id", F.col("ts").alias("click_ts"))
        .withWatermark("click_ts", "30 minutes")
    )
    buys = (
        stream.filter(F.col("event_type") == "purchase")
        .select(F.col("user_id").alias("b_user_id"), F.col("ts").alias("buy_ts"))
        .withWatermark("buy_ts", "30 minutes")
    )
    joined = clicks.join(
        buys,
        (F.col("user_id") == F.col("b_user_id"))
        & (F.col("buy_ts") > F.col("click_ts"))
        & (F.col("buy_ts") <= F.col("click_ts") + F.expr("INTERVAL 10 MINUTES")),
        "inner",
    ).select("user_id", "click_ts", "buy_ts")
    # stream-stream joins support append output only
    out = _run_stream_to_table(spark, joined, "ssjoin", output_mode="append")
    return out.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_pairs"))


@register(
    "q69_stream_dedup",
    """
    SELECT event_type, COUNT(*) AS n, ROUND(SUM(value), 4) AS total_value
    FROM events GROUP BY event_type
    """,
)
def q69_stream_dedup(spark, sf_dir):
    """Streaming exact dedup under at-least-once delivery:
    ``dropDuplicatesWithinWatermark`` on event_id over a self-unioned
    stream (every event delivered twice).  State for an id is kept only
    until the watermark passes its timestamp — bounded memory at any
    scale, unlike an unbounded ``dropDuplicates``.  The deduped stream
    re-aggregated equals the plain batch aggregate over events."""
    from graphmapreduce_spark.streaming.windows import dedup_within_watermark

    stream = _stream_events(spark, sf_dir)
    duplicated = stream.unionByName(stream)  # simulate redelivery
    deduped = dedup_within_watermark(
        duplicated, ["event_id"], ts_col="ts", delay="30 minutes"
    )
    out = _run_stream_to_table(spark, deduped, "sdedup", output_mode="append")
    return out.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 4).alias("total_value"),
    )


# ---------------------------------------------------------------------
# Cluster-level dedup: transitive closure of near-dup pairs + canonical
# doc selection.  The oracle runs the SAME closure as a DuckDB recursive
# CTE (min-label reachability), so the whole pipeline — shingles →
# jaccard pairs → connected components → representative pick — is
# value-checked end-to-end.
# ---------------------------------------------------------------------
_PAIR_CLOSURE_CTES = """
    sh AS MATERIALIZED (
      SELECT doc_id, list_distinct(list_transform(
               range(1, GREATEST(length(text) - 2, 0) + 1),
               i -> substr(text, i, 3))) AS grams
      FROM documents WHERE doc_id < 100
    ),
    inv AS (SELECT doc_id, UNNEST(grams) AS g FROM sh),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
      FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    pairs AS MATERIALIZED (
      SELECT id_a, id_b
      FROM inter
      JOIN sh sa ON sa.doc_id = id_a
      JOIN sh sb ON sb.doc_id = id_b
      WHERE CAST(i AS DOUBLE) / (len(sa.grams) + len(sb.grams) - i) >= 0.6
    ),
    sym AS (SELECT id_a AS src, id_b AS dst FROM pairs
            UNION ALL SELECT id_b AS src, id_a AS dst FROM pairs),
    verts AS (SELECT DISTINCT src AS id FROM sym),
    reach AS (
      SELECT id, id AS lbl FROM verts
      UNION
      SELECT s.dst AS id, r.lbl AS lbl
      FROM reach r JOIN sym s ON s.src = r.id
    ),
    clusters AS (SELECT id, MIN(lbl) AS cluster FROM reach GROUP BY id)
"""


def _pair_frame(spark, sf_dir):
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return d, D.ngram_jaccard_pairs(
        d, "doc_id", "text", n=3, threshold=0.6, max_df=1000
    )


@register(
    "q76_dedup_clusters",
    f"""
    WITH RECURSIVE
    {_PAIR_CLOSURE_CTES}
    SELECT id, cluster FROM clusters
    """,
)
def q76_dedup_clusters(spark, sf_dir):
    """Transitive closure of n-gram-Jaccard near-dup pairs: (doc id,
    cluster = min id in its connected component).  Spark side runs
    min-label Pregel over the pair graph; the oracle runs the identical
    closure as a DuckDB recursive CTE."""
    _, pairs = _pair_frame(spark, sf_dir)
    return D.dedup_clusters(pairs)


@register(
    "q77_canonical_docs",
    f"""
    WITH RECURSIVE
    {_PAIR_CLOSURE_CTES},
    scored AS (
      SELECT d.doc_id, length(d.text) AS n_chars, c.cluster,
             ROW_NUMBER() OVER (PARTITION BY c.cluster
                                ORDER BY length(d.text) DESC, d.doc_id)
               AS rn
      FROM documents d JOIN clusters c ON c.id = d.doc_id
      WHERE d.doc_id < 100
    )
    SELECT doc_id, n_chars FROM scored WHERE rn = 1
    UNION ALL
    SELECT doc_id, length(text) AS n_chars FROM documents
    WHERE doc_id < 100
      AND doc_id NOT IN (SELECT id FROM clusters)
    """,
)
def q77_canonical_docs(spark, sf_dir):
    """Cluster-level dedup keeping the BEST copy: per near-dup cluster
    the longest member (ties → smallest id) survives; unique docs pass
    through.  This is the full corpus-dedup pipeline a training-data
    run would execute."""
    docs, pairs = _pair_frame(spark, sf_dir)
    clusters = D.dedup_clusters(pairs)
    slim = docs.select(
        "doc_id", F.length("text").cast("long").alias("n_chars")
    )
    return D.canonical_docs(slim, "doc_id", clusters, prefer="n_chars")


# ---------------------------------------------------------------------
# Deterministic sampling — reproducible corpus subsampling, train/eval
# splits and data-mixture control.  md5 variant is value-checked: the
# oracle replicates the 60-bit hash bit-for-bit, so set MEMBERSHIP (not
# just the rate) must match.
# ---------------------------------------------------------------------
_MD5_BUCKET = (
    "('0x' || substr(md5(CAST({col} AS VARCHAR) || ':{seed}'), 1, 15))"
    "::BIGINT % 1000000"
)


@register(
    "q78_hash_sample",
    f"""
    SELECT doc_id FROM documents
    WHERE {_MD5_BUCKET.format(col='doc_id', seed=0)} < 100000
    """,
)
def q78_hash_sample(spark, sf_dir):
    """10% deterministic Bernoulli sample of the corpus: pure filter
    (no shuffle, no RNG state), same members on any engine / partition
    layout — unlike df.sample()."""
    d = _t(spark, sf_dir, "documents").select("doc_id")
    return SMP.hash_sample(d, "doc_id", 0.10, seed=0, hash_fn="md5")


@register(
    "q79_stratified_sample",
    f"""
    SELECT event_id, event_type FROM events
    WHERE {_MD5_BUCKET.format(col='event_id', seed=7)}
          < CASE event_type WHEN 'click' THEN 500000
                            WHEN 'error' THEN 50000
                            ELSE 200000 END
    """,
)
def q79_stratified_sample(spark, sf_dir):
    """Data-mixture control: per-stratum deterministic keep rates
    (upsample clicks to 50%, downsample errors to 5%, default 20%) as a
    single CASE-rate filter compiled into the scan."""
    e = _t(spark, sf_dir, "events").select("event_id", "event_type")
    return SMP.stratified_hash_sample(
        e,
        "event_id",
        "event_type",
        {"click": 0.5, "error": 0.05},
        default_fraction=0.2,
        seed=7,
        hash_fn="md5",
    )


@register(
    "q80_hash_split",
    f"""
    WITH b AS (
      SELECT doc_id,
             {_MD5_BUCKET.format(col='doc_id', seed=1)} AS bk
      FROM documents
    )
    SELECT 'test' AS split, CAST(COUNT(*) AS BIGINT) AS n
    FROM b WHERE bk >= 900000
    UNION ALL
    SELECT 'train', CAST(COUNT(*) AS BIGINT) FROM b WHERE bk < 800000
    UNION ALL
    SELECT 'val', CAST(COUNT(*) AS BIGINT)
    FROM b WHERE bk >= 800000 AND bk < 900000
    """,
)
def q80_hash_split(spark, sf_dir):
    """80/10/10 train/val/test split from ONE hash: contiguous bucket
    ranges, so the three frames partition the corpus exactly and an id
    keeps its split forever as new data lands."""
    d = _t(spark, sf_dir, "documents").select("doc_id")
    train, val, test = SMP.hash_split(
        d, "doc_id", [0.8, 0.1, 0.1], seed=1, hash_fn="md5"
    )
    parts = [("train", train), ("val", val), ("test", test)]
    out = None
    for name, frame in parts:
        c = frame.agg(F.count(F.lit(1)).alias("n")).select(
            F.lit(name).alias("split"), "n"
        )
        out = c if out is None else out.unionByName(c)
    return out


@register(
    "q81_heavy_hitters",
    r"""
    SELECT term, CAST(COUNT(*) AS BIGINT) AS n
    FROM (SELECT UNNEST(list_filter(
            string_split_regex(trim(text), '\s+'), x -> x <> '')) AS term
          FROM documents)
    GROUP BY term
    ORDER BY n DESC, term
    LIMIT 20
    """,
)
def q81_heavy_hitters(spark, sf_dir):
    """Exact corpus-wide top-20 terms (count desc, term tiebreak) —
    boilerplate detection / vocabulary profiling.  explode + partial
    agg; top-k via TakeOrdered, never a global sort."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.select(F.explode(T.words("text")).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("term"))
        .limit(20)
    )


# ---------------------------------------------------------------------
# Sketch extensions: mergeable quantiles (KLL) + distinct-count set
# algebra (theta).  KLL estimates are rank-bounded but the compaction
# is randomized → rows-only driver check, accuracy pytest.  Theta is
# EXACT below its nominal capacity, so q83 gets a full value oracle.
# ---------------------------------------------------------------------
@register("q82_kll_quantile_rollup", None)  # randomized compaction: no oracle
def q82_kll_quantile_rollup(spark, sf_dir):
    """Mergeable-percentile pattern: KLL sketch per (event_type, day)
    fine grain, rolled up to event_type by sketch MERGE — any later
    quantile question over any date range without re-scanning the base
    table.  Rank error is bounded by k regardless of merge depth."""
    e = _t(spark, sf_dir, "events").withColumn("day", F.to_date("ts"))
    sk = SK.kll_sketch_table(e, ["event_type", "day"], "value")
    return SK.kll_quantile_rollup(sk, ["event_type"], [0.5, 0.95]).orderBy(
        "event_type"
    )


@register(
    "q83_theta_segment_overlap",
    """
    WITH a AS (SELECT DISTINCT user_id FROM events
               WHERE event_type = 'click' AND value > 90),
         b AS (SELECT DISTINCT user_id FROM events
               WHERE event_type = 'purchase' AND value > 90)
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM a) AS n_a,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM b) AS n_b,
           (SELECT CAST(COUNT(*) AS BIGINT)
              FROM (SELECT * FROM a UNION SELECT * FROM b)) AS n_union,
           (SELECT CAST(COUNT(*) AS BIGINT)
              FROM (SELECT * FROM a INTERSECT SELECT * FROM b))
             AS n_intersect,
           (SELECT CAST(COUNT(*) AS BIGINT)
              FROM (SELECT * FROM a EXCEPT SELECT * FROM b)) AS n_a_only
    """,
)
def q83_theta_segment_overlap(spark, sf_dir):
    """Segment distinct-count algebra from theta sketches: high-value
    click users vs purchase users — |A|, |B|, |A∪B|, |A∩B|, |A\\B|
    with NO self-join of the fact table.  Below 2^lgk distinct values
    the sketch is exact, so the oracle compares exact set counts."""
    e = _t(spark, sf_dir, "events").filter(F.col("value") > 90)
    sk = SK.theta_sketch_table(e, ["event_type"], "user_id", lgk=12)
    return SK.theta_overlap(sk, "event_type", "click", "purchase")


def _kcore_oracle_sql(k: int = 15, mod: int = 5000, rounds: int = 8) -> str:
    """Unrolled synchronous peel (same pattern as the PageRank oracle):
    each round keeps vertices with degree >= k and re-filters the edge
    set.  The k-core is the unique maximal subgraph with min degree >= k,
    so once the fixture converges (3 rounds at sf0.01) the remaining
    unrolled rounds are no-ops and the fixed-depth SQL equals Spark's
    run-to-fixpoint result."""
    pre = f"""
    WITH und AS MATERIALIZED (
      SELECT DISTINCT LEAST(l_orderkey % {mod}, l_partkey % {mod}) AS a,
                      GREATEST(l_orderkey % {mod}, l_partkey % {mod}) AS b
      FROM lineitem WHERE l_orderkey % {mod} <> l_partkey % {mod}
    ),
    s0 AS MATERIALIZED (
      SELECT a AS src, b AS dst FROM und
      UNION ALL SELECT b AS src, a AS dst FROM und)"""
    its = []
    for i in range(1, rounds + 1):
        p = f"s{i - 1}"
        its.append(f"""
    k{i} AS MATERIALIZED (
      SELECT src FROM {p} GROUP BY src HAVING COUNT(*) >= {k}),
    s{i} AS MATERIALIZED (
      SELECT e.src, e.dst FROM {p} e
      JOIN k{i} x ON x.src = e.src
      JOIN k{i} y ON y.src = e.dst)""")
    return (
        pre + "," + ",".join(its)
        + f"""
    SELECT src AS id, CAST(COUNT(*) AS BIGINT) AS core_degree
    FROM s{rounds} GROUP BY src"""
    )


@register("q84_kcore", _kcore_oracle_sql())
def q84_kcore(spark, sf_dir):
    """k-core of the lineitem-derived graph (k=15): iterative
    synchronous peel; oracle is the unrolled-CTE form of the same peel."""
    li = _t(spark, sf_dir, "lineitem")
    e = (
        li.select(
            (F.col("l_orderkey") % 5000).alias("s"),
            (F.col("l_partkey") % 5000).alias("t"),
        )
        .filter(F.col("s") != F.col("t"))
        .select(F.least("s", "t").alias("src"), F.greatest("s", "t").alias("dst"))
        .distinct()
    )
    g = PropertyGraph.from_edges(e)
    return alg.k_core(g, k=15, assume_simple=True)


# ---------------------------------------------------------------------
# Text cleaning stage: normalization, PII scrubbing, boilerplate
# removal, repetition scoring.  The fixture text is already clean ASCII
# word-soup, so q85 injects deterministic noise (case, tabs, an email,
# an IP, a long digit run) IN THE QUERY on both engines — the
# transformations are exercised for real, not vacuously.
# ---------------------------------------------------------------------
@register(
    "q85_normalize_scrub",
    r"""
    WITH noisy AS (
      SELECT doc_id,
             '  THE Quick' || chr(9) || text ||
             '  reach me: bob.smith+x@example.co.uk or 10.0.42.7 ref 123456789012  '
               AS t
      FROM documents WHERE doc_id < 200
    )
    SELECT doc_id,
           trim(regexp_replace(regexp_replace(lower(t),
                '[\x00-\x1f\x7f]', ' ', 'g'), '\s{2,}', ' ', 'g'))
             AS norm_text,
           regexp_replace(regexp_replace(regexp_replace(t,
                '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
                '\b\d{10,18}\b', '<NUM>', 'g')
             AS scrubbed
    FROM noisy
    """,
)
def q85_normalize_scrub(spark, sf_dir):
    """Text normalization + PII scrubbing as pure expressions; noise is
    injected deterministically so case folding, control-char removal,
    whitespace collapse and all three redaction patterns fire."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    noisy = F.concat(
        F.lit("  THE Quick\t"),
        F.col("text"),
        F.lit("  reach me: bob.smith+x@example.co.uk or 10.0.42.7 ref 123456789012  "),
    )
    return d.select(
        "doc_id",
        T.normalize_text(noisy).alias("norm_text"),
        T.scrub_pii(noisy).alias("scrubbed"),
    )


@register(
    "q87_boilerplate_segments",
    """
    WITH d AS MATERIALIZED (
      SELECT doc_id, text FROM documents WHERE doc_id < 200
    ),
    arrs AS (SELECT doc_id, string_split_regex(text, ' the ') AS arr FROM d),
    segs AS (
      SELECT doc_id, i AS pos, trim(arr[i]) AS k, arr[i] AS seg
      FROM arrs, UNNEST(range(1, len(arr) + 1)) AS t(i)
      WHERE trim(arr[i]) <> ''
    ),
    hot AS (
      SELECT k FROM (
        SELECT k, COUNT(DISTINCT doc_id) AS df FROM segs GROUP BY k
      ) WHERE df >= 2
    ),
    kept AS (SELECT * FROM segs WHERE k NOT IN (SELECT k FROM hot))
    SELECT doc_id, string_agg(seg, ' the ' ORDER BY pos) AS text
    FROM kept GROUP BY doc_id
    """,
)
def q87_boilerplate_segments(spark, sf_dir):
    """Corpus-level boilerplate removal: segments appearing in >= 2
    distinct docs are dropped, survivors re-joined in order.  The
    fixture's synthetic text has no newlines, so segments are delimited
    by a frequent token — the plan (posexplode, doc-frequency agg,
    broadcast anti-join, ordered reassembly) is identical to the
    paragraph-delimiter production form."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return D.remove_boilerplate_segments(
        d, "doc_id", "text", delimiter=" the ", min_df=2, rejoin=" the "
    )


@register(
    "q88_repetition_ratio",
    """
    SELECT doc_id,
           ROUND(CASE WHEN len(g) > 0
                 THEN 1.0 - CAST(len(list_distinct(g)) AS DOUBLE) / len(g)
                 ELSE 0.0 END, 6) AS rep_ratio
    FROM (SELECT doc_id,
                 list_transform(range(1, GREATEST(length(text) - 7, 0) + 1),
                                i -> substr(text, i, 8)) AS g
          FROM documents)
    """,
)
def q88_repetition_ratio(spark, sf_dir):
    """Gopher-style intra-doc repetition: 1 - distinct/total char
    8-grams, pure expression."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id", F.round(T.repetition_ratio("text", 8), 6).alias("rep_ratio")
    )


# ---------------------------------------------------------------------
# Event analytics: gap-based sessionization (the batch analog of the
# streaming session window) and first-touch funnel.
# ---------------------------------------------------------------------
@register(
    "q89_sessionize",
    """
    WITH e AS (
      -- floor to whole seconds: Spark's cast(timestamp AS long)
      -- truncates, DuckDB's epoch() keeps fractional seconds
      SELECT user_id, ts, CAST(floor(epoch(ts)) AS BIGINT) AS tsec
      FROM events
    ),
    s AS (
      SELECT user_id, ts, tsec,
             CASE WHEN lag(tsec) OVER w IS NULL
                       OR tsec - lag(tsec) OVER w > 1800
                  THEN 1 ELSE 0 END AS is_new
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    numbered AS (
      SELECT user_id, tsec,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS UNBOUNDED PRECEDING) AS session_seq
      FROM s
    )
    SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           MAX(tsec) - MIN(tsec) AS span_s
    FROM numbered GROUP BY user_id, session_seq
    """,
)
def q89_sessionize(spark, sf_dir):
    """Sessionize the event stream with a 30-minute inactivity gap and
    summarize each session (event count, span).  Two window passes over
    ONE per-user shuffle, then a hash agg."""
    e = _t(spark, sf_dir, "events").select("user_id", "ts")
    s = R.sessionize(e, "user_id", "ts", gap_seconds=1800)
    return s.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max(F.col("ts").cast("long")) - F.min(F.col("ts").cast("long")))
        .alias("span_s"),
    )


@register(
    "q90_funnel",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_converted FROM (
      SELECT user_id
      FROM events
      GROUP BY user_id
      HAVING MIN(CASE WHEN event_type = 'view' THEN ts END)
               < MIN(CASE WHEN event_type = 'click' THEN ts END)
         AND MIN(CASE WHEN event_type = 'click' THEN ts END)
               < MIN(CASE WHEN event_type = 'purchase' THEN ts END)
    )
    """,
)
def q90_funnel(spark, sf_dir):
    """First-touch funnel: users whose first view precedes their first
    click, which precedes their first purchase — one hash agg with
    conditional MINs, no self-joins."""
    e = _t(spark, sf_dir, "events")
    m = lambda t: F.min(F.when(F.col("event_type") == t, F.col("ts")))  # noqa: E731
    per_user = e.groupBy("user_id").agg(
        m("view").alias("v"), m("click").alias("c"), m("purchase").alias("p")
    )
    return per_user.filter(
        (F.col("v") < F.col("c")) & (F.col("c") < F.col("p"))
    ).agg(F.count(F.lit(1)).alias("n_converted"))


@register(
    "q91_python_udtf",
    r"""
    SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos, arr[i] AS term
    FROM (SELECT doc_id,
                 list_filter(string_split_regex(trim(text), '\s+'),
                             x -> x <> '') AS arr
          FROM documents WHERE doc_id < 20),
         UNNEST(range(1, len(arr) + 1)) AS t(i)
    """,
)
def q91_python_udtf(spark, sf_dir):
    """Genuine PySpark-4 table-function API (@udtf class + SQL LATERAL
    correlation) — complements q28's Arrow-batched mapInPandas form.
    Row-at-a-time Python: API-parity query on a small slice, NOT the
    bulk-tokenization path (that's functions.text.words)."""
    from graphmapreduce_spark.functions.udtfs import register_udtfs

    register_udtfs(spark)
    _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 20).select(
        "doc_id", "text"
    ).createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        """
        SELECT d.doc_id, t.pos, t.term
        FROM _udtf_docs d, LATERAL tokenize_udtf(d.text) t
        """
    )


# ---------------------------------------------------------------------
# Pretraining layout + IR scoring
# ---------------------------------------------------------------------
@register(
    "q92_sequence_packing",
    r"""
    WITH toks AS (
      SELECT doc_id,
             len(regexp_extract_all(text,
                 '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]'))::BIGINT AS n_tokens
      FROM documents
    ),
    cum AS (
      SELECT doc_id, n_tokens,
             -- CAST: DuckDB SUM(BIGINT) is HUGEINT; Spark emits BIGINT
             -- and the driver hash is type-sensitive
             CAST(SUM(n_tokens) OVER (ORDER BY doc_id
                                      ROWS UNBOUNDED PRECEDING) - n_tokens
                  AS BIGINT) AS "offset"
      FROM toks
    )
    SELECT doc_id, n_tokens,
           CAST("offset" // 2048 AS BIGINT) AS bin,
           "offset" FROM cum
    """,
)
def q92_sequence_packing(spark, sf_dir):
    """Pretraining sequence packing: docs virtually concatenated in
    doc_id order and cut into 2048-token context windows — each doc gets
    (bin, offset).  The oracle is the naive global running sum; the
    Spark plan computes the identical layout with the scalable two-level
    cumsum (parallel per-range windows + broadcast prefix offsets)."""
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", T.token_count("text").cast("long").alias("n_tokens")
    )
    return PK.packed_layout(
        d, "doc_id", "n_tokens", capacity=2048, range_size=100
    )


@register(
    "q93_bm25",
    r"""
    WITH params AS (SELECT 1.2 AS k1, 0.75 AS b),
    toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(text), '\s+'),
                         x -> x <> '') AS ws
      FROM documents
    ),
    stats AS (
      SELECT COUNT(*) AS n_docs, AVG(len(ws)) AS avg_len FROM toks
    ),
    tf AS (
      SELECT doc_id, term, COUNT(*)::DOUBLE AS tf, ANY_VALUE(dl) AS dl
      FROM (SELECT doc_id, UNNEST(ws) AS term, len(ws)::DOUBLE AS dl
            FROM toks)
      WHERE term IN ('spark', 'fast', 'window')
      GROUP BY doc_id, term
    ),
    idf AS (
      SELECT term,
             ln(((SELECT n_docs FROM stats) - COUNT(*) + 0.5)
                / (COUNT(*) + 0.5) + 1.0) AS idf
      FROM tf GROUP BY term
    )
    SELECT tf.doc_id,
           ROUND(SUM(idf.idf * tf.tf * (k1 + 1)
                     / (tf.tf + k1 * (1 - b + b * tf.dl
                                      / (SELECT avg_len FROM stats)))),
                 6) AS bm25
    FROM tf JOIN idf USING (term), params
    GROUP BY tf.doc_id
    """,
)
def q93_bm25(spark, sf_dir):
    """BM25 relevance of every document to the query terms
    {spark, fast, window}: tf via explode+filter, df/idf per term
    (broadcast — the query vocabulary is tiny), avg doc length as a
    1-row broadcast.  One corpus scan, no UDF; the Lucene-style idf
    ln((N-df+.5)/(df+.5)+1) keeps scores positive."""
    k1, b = 1.2, 0.75
    terms = ["spark", "fast", "window"]
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", T.words("text").alias("ws")
    )
    toks = d.select(
        "doc_id", F.size("ws").cast("double").alias("dl"), "ws"
    )
    stats = toks.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avg_len")
    )
    tf = (
        toks.select(
            "doc_id", "dl", F.explode("ws").alias("term")
        )
        .filter(F.col("term").isin(terms))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"),
             F.first("dl").alias("dl"))
    )
    idf = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_t"))
    scored = (
        tf.join(F.broadcast(idf), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(
                (F.col("n_docs") - F.col("df_t") + 0.5)
                / (F.col("df_t") + 0.5)
                + 1.0
            ),
        )
        .withColumn(
            "contrib",
            F.col("idf")
            * F.col("tf")
            * (k1 + 1)
            / (
                F.col("tf")
                + k1 * (1 - b + b * F.col("dl") / F.col("avg_len"))
            ),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.round(F.sum("contrib"), 6).alias("bm25")
    )


@register(
    "q94_merge_upsert",
    """
    WITH base AS (
      SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey < 1000
    ),
    updates AS (
      SELECT o_orderkey, ROUND(o_totalprice * 1.1, 2) AS o_totalprice
      FROM orders WHERE o_orderkey < 100
      UNION ALL
      SELECT o_orderkey + 1000000, ROUND(o_totalprice, 2)
      FROM orders WHERE o_orderkey < 50
    )
    SELECT o_orderkey, ROUND(o_totalprice, 2) AS o_totalprice FROM updates
    UNION ALL
    SELECT b.o_orderkey, ROUND(b.o_totalprice, 2)
    FROM base b
    WHERE NOT EXISTS (SELECT 1 FROM updates u
                      WHERE u.o_orderkey = b.o_orderkey)
    """,
)
def q94_merge_upsert(spark, sf_dir):
    """SCD-type-1 MERGE as a relational rewrite: a CDC batch (repriced
    existing keys + brand-new keys) replaces/inserts into the base —
    one anti-join (update keys broadcast) + one union."""
    o = _t(spark, sf_dir, "orders")
    base = o.filter(F.col("o_orderkey") < 1000).select(
        "o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice")
    )
    updates = (
        o.filter(F.col("o_orderkey") < 100)
        .select(
            "o_orderkey",
            F.round(F.col("o_totalprice") * 1.1, 2).alias("o_totalprice"),
        )
        .unionByName(
            o.filter(F.col("o_orderkey") < 50).select(
                (F.col("o_orderkey") + 1000000).alias("o_orderkey"),
                F.round("o_totalprice", 2).alias("o_totalprice"),
            )
        )
    )
    return R.merge_upsert(base, updates, ["o_orderkey"])


@register(
    "q95_embedding_centroids",
    """
    SELECT label, CAST(i - 1 AS INTEGER) AS pos,
           ROUND(AVG(embedding[i]), 6) AS c
    FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS t(i)
    GROUP BY label, i
    """,
)
def q95_embedding_centroids(spark, sf_dir):
    """Per-label embedding centroid, emitted exploded as (label, pos,
    component): posexplode + hash agg — the vector-aggregation shape
    k-means and IVF coarse quantizers build on.  Rounded per component
    so float summation order can't flip the hash compare."""
    e = _t(spark, sf_dir, "embeddings")
    return (
        e.select("label", F.posexplode("embedding").alias("pos", "x"))
        .groupBy("label", "pos")
        .agg(F.round(F.avg("x"), 6).alias("c"))
    )


@register(
    "q86_decontaminate",
    r"""
    WITH ws AS (
      SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'),
                                 x -> x <> '') AS w
      FROM documents
    ),
    g AS (
      SELECT doc_id,
             CASE WHEN len(w) >= 4 THEN list_distinct(list_transform(
                    range(1, len(w) - 4 + 2),
                    i -> array_to_string(w[i:i+3], ' ')))
                  ELSE [] END AS grams
      FROM ws
    ),
    ev AS (SELECT DISTINCT UNNEST(grams) AS gram FROM g
           WHERE doc_id % 17 = 0),
    tr AS (SELECT doc_id, UNNEST(grams) AS gram FROM g
           WHERE doc_id % 17 <> 0)
    SELECT tr.doc_id, COUNT(*) AS matched_ngrams
    FROM tr JOIN ev USING (gram)
    GROUP BY tr.doc_id
    """,
)
def q86_decontaminate(spark, sf_dir):
    """Test-set decontamination signal: training docs sharing >= 1
    distinct word 4-gram with the eval slice (doc_id % 17 == 0), with
    the count of contaminated grams.  The eval n-gram set collapses to
    a broadcast distinct list, so the train side is one scan + broadcast
    semi-join — the shape that survives a 100 TB corpus."""
    d = _t(spark, sf_dir, "documents")
    ev = d.filter(F.col("doc_id") % 17 == 0)
    tr = d.filter(F.col("doc_id") % 17 != 0)
    return D.contamination_report(tr, ev, "doc_id", "text", n=4)


@register(
    "q96_tfidf",
    r"""
    WITH ws AS (
      SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'),
                                 x -> x <> '') AS w
      FROM documents
    ),
    tf AS (
      SELECT doc_id, term, COUNT(*) AS tf
      FROM (SELECT doc_id, UNNEST(w) AS term FROM ws)
      GROUP BY doc_id, term
    ),
    df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    n AS (SELECT COUNT(*) AS n_docs FROM ws),
    scored AS (
      SELECT doc_id, term,
             ROUND(tf * ln((SELECT n_docs FROM n)::DOUBLE / df), 6)
               AS tfidf
      FROM tf JOIN df USING (term)
      WHERE doc_id < 30
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                   ORDER BY tfidf DESC, term ASC) AS rn
      FROM scored
    )
    SELECT doc_id, term, tfidf FROM ranked WHERE rn <= 3
    """,
)
def q96_tfidf(spark, sf_dir):
    """Top-3 characteristic terms per document by tf-idf (idf =
    ln(N/df), df over the WHOLE corpus, top-k only over the doc_id < 30
    slice).  One corpus scan -> (doc,term) hash agg -> term df agg
    (broadcast: vocabulary << corpus) -> per-doc window top-k.  Ranking
    uses the ROUNDED score + term tie-break so both engines agree."""
    from pyspark.sql.window import Window

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.explode(T.words("text")).alias("term")
    )
    tf = d.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = tf.select("doc_id").distinct().count()
    scored = (
        tf.filter(F.col("doc_id") < 30)
        .join(F.broadcast(df_t), "term")
        .select(
            "doc_id",
            "term",
            F.round(
                F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .drop("rn")
    )


@register(
    "q97_chunk_documents",
    """
    SELECT doc_id, CAST(i AS INTEGER) AS chunk_id,
           substr(text, i * 80 + 1, 120) AS chunk,
           length(substr(text, i * 80 + 1, 120)) AS chunk_len
    FROM documents,
         UNNEST(range(0, (length(text) - 1) // 80 + 1)) AS t(i)
    WHERE doc_id < 50 AND length(text) > 0
    """,
)
def q97_chunk_documents(spark, sf_dir):
    """RAG-style document chunking: 120-char windows every 80 chars
    (40-char overlap), emitted as (doc_id, chunk_id, chunk, chunk_len).
    Pure expression + posexplode — a narrow map stage at any scale."""
    d = _t(spark, sf_dir, "documents").filter(
        (F.col("doc_id") < 50) & (F.length("text") > 0)
    )
    return d.select(
        "doc_id",
        F.posexplode(T.chunk_text("text", size=120, stride=80)).alias(
            "chunk_id", "chunk"
        ),
    ).select(
        "doc_id",
        "chunk_id",
        "chunk",
        F.length("chunk").cast("long").alias("chunk_len"),
    )


def _ppr_oracle_sql(
    n_iter: int = 12,
    d: float = 0.85,
    k: int = 500,
    seeds: tuple[int, ...] = (0, 7, 42),
) -> str:
    """Personalized PageRank unrolled: same power iteration as
    _pagerank_oracle_sql but the teleport vector is uniform over the
    seed set and dangling mass restarts to the seeds."""
    seed_list = ", ".join(str(s) for s in seeds)
    e_v = f"(CASE WHEN v.id IN ({seed_list}) THEN 1.0/{len(seeds)} ELSE 0.0 END)"
    pre = f"""
    WITH e AS MATERIALIZED (
      SELECT DISTINCT l_orderkey % {k} AS src, l_partkey % {k} AS dst
      FROM lineitem WHERE l_orderkey % {k} <> l_partkey % {k}
    ),
    v AS MATERIALIZED (SELECT src AS id FROM e UNION SELECT dst AS id FROM e),
    deg AS MATERIALIZED (
      SELECT src AS id, COUNT(*)::DOUBLE AS d FROM e GROUP BY src),
    r0 AS MATERIALIZED (
      SELECT v.id, {e_v} AS rank FROM v)
    """
    its = []
    for i in range(1, n_iter + 1):
        p = f"r{i - 1}"
        its.append(f"""
    r{i} AS MATERIALIZED (
      SELECT v.id,
             ((1-{d}) + {d} * (SELECT COALESCE(SUM(r.rank),0) FROM {p} r
                               LEFT JOIN deg dg ON dg.id = r.id
                               WHERE dg.id IS NULL)) * {e_v}
             + {d} * COALESCE(s.in_sum, 0) AS rank
      FROM v
      LEFT JOIN (SELECT e.dst AS id, SUM(r.rank / dg.d) AS in_sum
                 FROM e JOIN {p} r ON r.id = e.src
                        JOIN deg dg ON dg.id = e.src
                 GROUP BY e.dst) s ON s.id = v.id
    )""")
    return (
        pre + "," + ",".join(its)
        + f"\n    SELECT id, ROUND(rank, 6) AS rank FROM r{n_iter}"
        + "\n    WHERE ROUND(rank, 6) > 0"
    )


@register("q98_personalized_pagerank", _ppr_oracle_sql())
def q98_personalized_pagerank(spark, sf_dir):
    """Personalized PageRank from seeds {0,7,42}: seed-expansion
    retrieval over the Z_500 lineitem graph.  Oracle: the same 12
    restart-walk iterations unrolled as SQL CTEs.  Zero-rank vertices
    (unreachable from the seeds) are filtered on both sides."""
    g = _mod_graph(spark, sf_dir, 500)
    pr = alg.personalized_pagerank(
        g, sources=[0, 7, 42], damping=0.85, max_iter=12,
        threshold=1e-12, check_interval=4,
    )
    return pr.select("id", F.round("rank", 6).alias("rank")).filter(
        F.col("rank") > 0
    )


def _label_propagation_oracle_sql(n_iter: int = 3, k: int = 2000) -> str:
    """Synchronous LPA unrolled: per round a (dst,label) count and a
    (count desc, label asc) argmax — deterministic, so exact."""
    pre = f"""
    WITH de AS MATERIALIZED (
      SELECT DISTINCT l_orderkey % {k} AS src, l_partkey % {k} AS dst
      FROM lineitem WHERE l_orderkey % {k} <> l_partkey % {k}
    ),
    e AS MATERIALIZED (SELECT src, dst FROM de UNION SELECT dst, src FROM de),
    v AS MATERIALIZED (SELECT DISTINCT src AS id FROM e),
    l0 AS MATERIALIZED (SELECT id, id AS lab FROM v)
    """
    its = []
    for i in range(1, n_iter + 1):
        p = f"l{i - 1}"
        its.append(f"""
    c{i} AS MATERIALIZED (
      SELECT e.dst AS id, p.lab, COUNT(*) AS c
      FROM e JOIN {p} p ON p.id = e.src GROUP BY e.dst, p.lab
    ),
    b{i} AS MATERIALIZED (
      SELECT id, lab FROM (
        SELECT id, lab,
               ROW_NUMBER() OVER (PARTITION BY id
                                  ORDER BY c DESC, lab ASC) AS rn
        FROM c{i}) WHERE rn = 1
    ),
    l{i} AS MATERIALIZED (
      SELECT p.id, COALESCE(b.lab, p.lab) AS lab
      FROM {p} p LEFT JOIN b{i} b ON b.id = p.id
    )""")
    return (
        pre + "," + ",".join(its)
        + f"\n    SELECT lab AS community, COUNT(*) AS n_members"
        + f" FROM l{n_iter} GROUP BY lab"
    )


@register("q99_label_propagation", _label_propagation_oracle_sql())
def q99_label_propagation(spark, sf_dir):
    """Community detection by synchronous label propagation (3 rounds,
    deterministic most-frequent-neighbor-label / smallest-label
    tie-break) on the undirected Z_2000 lineitem graph — sparse enough
    (avg degree ~30 at sf0.01) that multiple communities survive."""
    g = _mod_graph(spark, sf_dir, 2000)
    lp = alg.label_propagation(g, max_iter=3, symmetrize=True)
    return lp.groupBy(F.col("label").alias("community")).agg(
        F.count(F.lit(1)).alias("n_members")
    )


@register(
    "q100_line_dedup",
    """
    WITH d AS MATERIALIZED (
      SELECT doc_id, text FROM documents WHERE doc_id < 300
    ),
    arrs AS (SELECT doc_id, string_split_regex(text, ' the ') AS arr FROM d),
    segs AS (
      SELECT doc_id, i AS pos, trim(arr[i]) AS k, arr[i] AS line
      FROM arrs, UNNEST(range(1, len(arr) + 1)) AS t(i)
      WHERE trim(arr[i]) <> ''
    ),
    kept AS (
      SELECT doc_id, pos, line FROM (
        SELECT doc_id, pos, line,
               ROW_NUMBER() OVER (PARTITION BY k
                                  ORDER BY doc_id, pos) AS rn
        FROM segs) WHERE rn = 1
    )
    SELECT doc_id, string_agg(line, ' the ' ORDER BY pos) AS text
    FROM kept GROUP BY doc_id
    """,
)
def q100_line_dedup(spark, sf_dir):
    """Corpus-level exact line dedup (CCNet-style keep-first): every
    distinct trimmed segment keeps only its first (doc id, position)
    occurrence; later copies anywhere in the corpus are dropped.  Same
    ' the ' delimiter trick as q87 (the fixture text has no newlines);
    the plan — posexplode, winner-per-line agg on an md5 key, join-back,
    ordered reassembly — is the production newline form."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    return D.dedup_lines(
        d, "doc_id", "text", delimiter=" the ", rejoin=" the ", min_len=1
    )


@register(
    "q101_stats_suite",
    """
    WITH m AS (SELECT l_returnflag, avg(l_quantity) AS mu
               FROM lineitem GROUP BY l_returnflag)
    SELECT l.l_returnflag,
           ROUND(corr(l_quantity, l_extendedprice), 6)       AS corr_qty_price,
           ROUND(covar_samp(l_quantity, l_extendedprice), 2) AS covar_qty_price,
           ROUND(covar_pop(l_quantity, l_extendedprice), 2)  AS covarp_qty_price,
           ROUND(stddev_samp(l_discount), 6)                 AS sd_disc,
           ROUND(var_samp(l_discount), 6)                    AS var_disc,
           ROUND(avg((l_quantity - mu) ^ 3)
                 / avg((l_quantity - mu) ^ 2) ^ 1.5, 6)      AS skew_qty,
           ROUND(avg((l_quantity - mu) ^ 4)
                 / avg((l_quantity - mu) ^ 2) ^ 2 - 3, 6)    AS kurt_qty,
           ROUND(median(l_quantity), 6)                      AS med_qty
    FROM lineitem l JOIN m ON l.l_returnflag = m.l_returnflag
    GROUP BY l.l_returnflag
    """,
)
def q101_stats_suite(spark, sf_dir):
    """Statistical aggregate suite — corr/covar/stddev/var/skewness/
    kurtosis/median per group, all single-pass hash aggregates (Spark
    computes the moments map-side-combinably; median is the sort-based
    exact form).  Oracle note: DuckDB's skewness/kurtosis are
    bias-corrected SAMPLE statistics while Spark's are population
    moments, so the oracle derives them from raw central moments
    (m3/m2^1.5, m4/m2^2-3) — verified to reproduce Spark bit-for-bit."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias(
            "covar_qty_price"
        ),
        F.round(F.covar_pop("l_quantity", "l_extendedprice"), 2).alias(
            "covarp_qty_price"
        ),
        F.round(F.stddev_samp("l_discount"), 6).alias("sd_disc"),
        F.round(F.var_samp("l_discount"), 6).alias("var_disc"),
        F.round(F.skewness("l_quantity"), 6).alias("skew_qty"),
        F.round(F.kurtosis("l_quantity"), 6).alias("kurt_qty"),
        F.round(F.median("l_quantity"), 6).alias("med_qty"),
    )


@register(
    "q102_scd2",
    """
    WITH cur AS (
      SELECT c_custkey, c_mktsegment AS segment,
             TIMESTAMP '1992-01-01' AS ts, 0 AS src
      FROM customer WHERE c_custkey <= 300
    ),
    upd AS (
      SELECT o_custkey AS c_custkey, min(o_orderpriority) AS segment,
             o_orderdate AS ts, 1 AS src
      FROM orders WHERE o_custkey <= 300
      GROUP BY o_custkey, o_orderdate
    ),
    tl AS (SELECT * FROM cur UNION ALL SELECT * FROM upd),
    lagged AS (
      SELECT *, lag(segment) OVER (PARTITION BY c_custkey
                                   ORDER BY ts, src) AS prev
      FROM tl
    ),
    kept AS (
      SELECT * FROM lagged
      WHERE src = 0 OR (prev IS DISTINCT FROM segment)
    )
    SELECT c_custkey, segment, ts AS valid_from,
           lead(ts) OVER (PARTITION BY c_custkey
                          ORDER BY ts, src) AS valid_to
    FROM kept
    """,
)
def q102_scd2(spark, sf_dir):
    """SCD-type-2 dimension versioning: replay each customer's order
    priorities as segment-change CDC events against a day-one snapshot;
    `scd2_apply` chains mid-batch versions, collapses no-op updates, and
    emits half-open [valid_from, valid_to) spans in one keyed shuffle.
    The history-keeping complement of q94's type-1 MERGE."""
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 300)
    cur = cust.select(
        "c_custkey",
        F.col("c_mktsegment").alias("segment"),
        F.lit("1992-01-01").cast("timestamp").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
    )
    upd = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") <= 300)
        .groupBy("o_custkey", "o_orderdate")
        .agg(F.min("o_orderpriority").alias("segment"))
        .select(
            F.col("o_custkey").alias("c_custkey"),
            "segment",
            F.col("o_orderdate").alias("ts"),
        )
    )
    return R.scd2_apply(cur, upd, ["c_custkey"], ["segment"], "ts")


@register(
    "q103_resample_gapfill",
    """
    WITH e AS (
      SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS es, value
      FROM events WHERE user_id < 50
    ),
    b AS (SELECT user_id, (es // 86400) * 86400 AS bucket_start, es, value
          FROM e),
    pb AS (
      SELECT user_id, bucket_start, value FROM (
        SELECT user_id, bucket_start, value,
               row_number() OVER (PARTITION BY user_id, bucket_start
                                  ORDER BY es DESC, value DESC) AS rn
        FROM b) WHERE rn = 1
    ),
    bounds AS (SELECT user_id, min(bucket_start) AS lo,
                      max(bucket_start) AS hi
               FROM b GROUP BY user_id),
    grid AS (SELECT user_id, g AS bucket_start
             FROM bounds, UNNEST(range(lo, hi + 1, 86400)) AS t(g)),
    j AS (SELECT g.user_id, g.bucket_start, pb.value
          FROM grid g LEFT JOIN pb
            ON g.user_id = pb.user_id AND g.bucket_start = pb.bucket_start)
    SELECT user_id, bucket_start,
           ROUND(last_value(value IGNORE NULLS)
                 OVER (PARTITION BY user_id ORDER BY bucket_start
                       ROWS UNBOUNDED PRECEDING), 6) AS value
    FROM j
    """,
)
def q103_resample_gapfill(spark, sf_dir):
    """Time-series regularization: resample each user's irregular event
    stream onto a daily grid (last value at bucket close) and forward-
    fill the gaps — `resample_ffill`, one keyed shuffle for bucket agg +
    grid join + fill window, grid generated in-plan via sequence()."""
    e = _t(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    out = TS.resample_ffill(e, "user_id", "ts", "value", 86400, fill="ffill")
    return out.withColumn("value", F.round("value", 6))


@register(
    "q104_char_entropy",
    """
    WITH d AS (SELECT doc_id, text FROM documents
               WHERE doc_id < 500 AND length(text) > 0),
    chars AS (
      SELECT doc_id, c
      FROM d, UNNEST(string_split(text, '')) AS t(c)
    ),
    cnt AS (SELECT doc_id, c, count(*) AS n FROM chars GROUP BY doc_id, c),
    tot AS (SELECT doc_id, sum(n) AS tot FROM cnt GROUP BY doc_id)
    SELECT cnt.doc_id,
           ROUND(-sum((n / tot) * log2(n / tot)), 6) AS entropy_bits
    FROM cnt JOIN tot ON cnt.doc_id = tot.doc_id
    GROUP BY cnt.doc_id
    """,
)
def q104_char_entropy(spark, sf_dir):
    """Character-distribution entropy as a corpus quality signal
    (degenerate filler -> 0 bits, prose ~4, noise -> log2 alphabet).
    The Spark side is a pure higher-order-function expression — NO
    shuffle at all — while the oracle uses the equivalent
    explode+group formulation."""
    d = _t(spark, sf_dir, "documents").filter(
        (F.col("doc_id") < 500) & (F.length("text") > 0)
    )
    return d.select(
        "doc_id", F.round(T.char_entropy("text"), 6).alias("entropy_bits")
    )


def _ktruss_oracle_sql(need: int = 2, mod: int = 2000, rounds: int = 12) -> str:
    """Unrolled synchronous truss peel (k-core-oracle pattern,
    `_kcore_oracle_sql`): per round enumerate canonical a<b<c triangles,
    credit each one to its three edges, keep edges with support >= k-2.
    The k-truss is the unique maximal such subgraph, so once the fixture
    converges (10 rounds at sf0.01) extra unrolled rounds are no-ops.
    Edges in no triangle never enter the support table and drop
    implicitly — support 0 < need."""
    pre = f"""
    WITH s0 AS MATERIALIZED (
      SELECT DISTINCT LEAST(l_orderkey % {mod}, l_partkey % {mod}) AS a,
                      GREATEST(l_orderkey % {mod}, l_partkey % {mod}) AS b
      FROM lineitem WHERE l_orderkey % {mod} <> l_partkey % {mod})"""
    its = []
    for i in range(1, rounds + 1):
        p = f"s{i - 1}"
        its.append(f"""
    t{i} AS (SELECT e1.a AS a, e1.b AS b, e2.b AS c
             FROM {p} e1
             JOIN {p} e2 ON e1.b = e2.a
             JOIN {p} e3 ON e3.a = e1.a AND e3.b = e2.b),
    p{i} AS MATERIALIZED (
      SELECT a, b, CAST(count(*) AS BIGINT) AS support FROM (
        SELECT a, b FROM t{i}
        UNION ALL SELECT b AS a, c AS b FROM t{i}
        UNION ALL SELECT a, c AS b FROM t{i}) GROUP BY a, b),
    s{i} AS MATERIALIZED (
      SELECT a, b FROM p{i} WHERE support >= {need})""")
    return (
        pre + "," + ",".join(its)
        + f"""
    SELECT a, b, support FROM p{rounds} WHERE support >= {need}"""
    )


@register("q105_ktruss", _ktruss_oracle_sql())
def q105_ktruss(spark, sf_dir):
    """4-truss of the lineitem-derived graph: every surviving edge
    closes >= 2 triangles inside the truss (10 synchronous peel rounds
    to fixpoint at sf0.01); oracle is the unrolled-CTE form of the same
    peel."""
    li = _t(spark, sf_dir, "lineitem")
    e = li.select(
        (F.col("l_orderkey") % 2000).alias("src"),
        (F.col("l_partkey") % 2000).alias("dst"),
    ).filter(F.col("src") != F.col("dst"))
    g = PropertyGraph.from_edges(e)
    return alg.k_truss(g, k=4)


@register(
    "q106_fuzzy_join",
    """
    WITH c AS (SELECT c_custkey AS id, c_name AS t
               FROM customer WHERE c_custkey < 400)
    SELECT a.id AS id_a, b.id AS id_b,
           levenshtein(a.t, b.t) AS dist
    FROM c a JOIN c b ON a.id < b.id
    WHERE levenshtein(a.t, b.t) <= 2
    """,
)
def q106_fuzzy_join(spark, sf_dir):
    """Edit-distance self-join on customer names (dist <= 2): q-gram
    multiset count filtering prunes candidates before the levenshtein
    verify; the oracle is the O(n^2) brute force the blocking avoids.
    Completeness precondition (len >= q*(d+1) = 9) holds — names are
    18 chars."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") < 400)
    out = S.fuzzy_self_join(c, "c_custkey", "c_name", max_dist=2, q=3)
    return out.withColumn("dist", F.col("dist").cast("long"))


@register(
    "q107_interval_join",
    """
    WITH iv AS (
      SELECT event_id, user_id, event_type,
             CAST(floor(epoch(ts)) AS BIGINT)                   AS s,
             CAST(floor(epoch(ts)) AS BIGINT)
               + CAST(floor(value * 60) AS BIGINT) + 1          AS e
      FROM events WHERE user_id < 200
    ),
    l AS (SELECT * FROM iv WHERE event_type = 'click'),
    r AS (SELECT * FROM iv WHERE event_type = 'view')
    SELECT l.user_id, l.event_id AS a_id, r.event_id AS b_id,
           least(l.e, r.e) - greatest(l.s, r.s) AS overlap_secs
    FROM l JOIN r ON l.user_id = r.user_id
                 AND l.s < r.e AND r.s < l.e
    """,
)
def q107_interval_join(spark, sf_dir):
    """Interval-overlap join: click spans x view spans per user (span =
    [ts, ts + value minutes)).  `interval_join` blocks on 1-hour
    buckets generated in-plan so the pairs meet with a HASH join plus
    an exact-overlap filter (emitted once, in the overlap-start
    bucket); the oracle is the inequality join Catalyst would plan as
    a nested loop."""
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") < 200)
    iv = ev.select(
        "event_id",
        "user_id",
        "event_type",
        F.col("ts").cast("long").alias("s"),
        (
            F.col("ts").cast("long")
            + F.floor(F.col("value") * 60).cast("long")
            + 1
        ).alias("e"),
    )
    left = iv.filter(F.col("event_type") == "click").drop("event_type")
    right = iv.filter(F.col("event_type") == "view").drop("event_type")
    out = R.interval_join(
        left, right, ("s", "e"), ("s", "e"), on=["user_id"], bucket_width=3600
    )
    return out.select(
        "user_id",
        F.col("event_id").alias("a_id"),
        F.col("event_id_r").alias("b_id"),
        (F.least("e", "e_r") - F.greatest("s", "s_r")).alias("overlap_secs"),
    )


@register(
    "q108_cms_freq",
    """
    WITH j(j) AS (SELECT unnest([0, 1, 2, 3])),
    cms AS (
      SELECT j AS d,
             ('0x' || substr(md5(p_brand || '#' || j), 1, 15))::BIGINT % 16
               AS w,
             CAST(count(*) AS BIGINT) AS cnt
      FROM part, j GROUP BY 1, 2
    ),
    probes AS (SELECT DISTINCT p_brand FROM part),
    keyed AS (
      SELECT p_brand, j AS d,
             ('0x' || substr(md5(p_brand || '#' || j), 1, 15))::BIGINT % 16
               AS w
      FROM probes, j
    )
    SELECT k.p_brand, min(coalesce(cnt, 0)) AS est
    FROM keyed k LEFT JOIN cms ON k.d = cms.d AND k.w = cms.w
    GROUP BY k.p_brand
    """,
)
def q108_cms_freq(spark, sf_dir):
    """Count-min sketch as a DataFrame-native (d, w, cnt) table —
    width 16 x depth 4 is deliberately tight so bucket collisions
    OCCUR and the estimates show the CMS overcount, which the oracle
    reproduces hash-for-hash (portable md5 bucketing).  Build is one
    bounded-size agg; probing all 25 brands is a broadcast join."""
    part = _t(spark, sf_dir, "part")
    cms = SK.cms_table(part, "p_brand", width=16, depth=4)
    return SK.cms_lookup(cms, part, "p_brand", width=16, depth=4)


@register(
    "q109_bloom_filter",
    """
    WITH j(j) AS (SELECT unnest([0, 1, 2, 3])),
    member AS (SELECT CAST(s_suppkey AS VARCHAR) AS v
               FROM supplier WHERE s_nationkey < 5),
    bloom AS (
      SELECT DISTINCT
             ('0x' || substr(md5(v || '#' || j), 1, 15))::BIGINT % 64 AS bit
      FROM member, j
    ),
    probes AS (SELECT DISTINCT CAST(s_suppkey AS VARCHAR) AS v FROM supplier),
    keyed AS (
      SELECT v, ('0x' || substr(md5(v || '#' || j), 1, 15))::BIGINT % 64
               AS bit
      FROM probes, j
    )
    SELECT k.v, count(*) = sum(CASE WHEN b.bit IS NULL THEN 0 ELSE 1 END)
             AS maybe
    FROM keyed k LEFT JOIN bloom b ON k.bit = b.bit
    GROUP BY k.v
    """,
)
def q109_bloom_filter(spark, sf_dir):
    """Bloom filter as a table of set bit positions (64 bits x 4
    hashes over ~1/5 of suppliers — tight enough that false positives
    appear; the oracle reproduces them exactly).  The 100 TB use: build
    from the small join side, broadcast the <=64 rows, pre-filter the
    big side before the real shuffle."""
    sup = _t(spark, sf_dir, "supplier")
    member = sup.filter(F.col("s_nationkey") < 5).select(
        F.col("s_suppkey").cast("string").alias("v")
    )
    probes = sup.select(F.col("s_suppkey").cast("string").alias("v"))
    bloom = SK.bloom_table(member, "v", num_bits=64, num_hashes=4)
    return SK.bloom_maybe_contains(bloom, probes, "v", num_bits=64, num_hashes=4)


@register(
    "q110_stream_static_join",
    """
    SELECT c_mktsegment, COUNT(*) AS n, ROUND(SUM(value), 4) AS total
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY c_mktsegment
    """,
)
def q110_stream_static_join(spark, sf_dir):
    """Stream-static enrichment join: the event stream joins the
    customer dimension (stateless — the static side is re-planned per
    micro-batch, broadcast when small) and feeds a streaming aggregate.
    One availableNow micro-batch over the fixture, so update mode emits
    exactly the converged totals; equals the batch join+agg oracle."""
    stream = _stream_events(spark, sf_dir)
    dim = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    agg = (
        stream.join(dim, "user_id")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("total"),
        )
    )
    return _run_stream_to_table(spark, agg, "streamstatic")


@register(
    "q111_quality_audit",
    """
    SELECT 'completeness:o_orderkey' AS "check",
           ROUND(avg(CASE WHEN o_orderkey IS NOT NULL THEN 1.0 ELSE 0.0 END), 6)
             AS metric FROM orders
    UNION ALL
    SELECT 'completeness:prio',
           ROUND(avg(CASE WHEN nullif(o_orderpriority, '1-URGENT')
                          IS NOT NULL THEN 1.0 ELSE 0.0 END), 6) FROM orders
    UNION ALL
    SELECT 'uniqueness:o_orderkey',
           ROUND(CAST(count(DISTINCT o_orderkey) AS DOUBLE) / count(*), 6)
    FROM orders
    UNION ALL
    SELECT 'uniqueness:o_custkey',
           ROUND(CAST(count(DISTINCT o_custkey) AS DOUBLE) / count(*), 6)
    FROM orders
    UNION ALL
    SELECT 'integrity:orders_customer',
           ROUND(CAST((SELECT count(*) FROM orders
                       WHERE o_custkey IN (SELECT c_custkey FROM customer))
                      AS DOUBLE)
                 / (SELECT count(*) FROM orders), 6)
    UNION ALL
    SELECT 'integrity:lineitem_halfpart',
           ROUND(CAST((SELECT count(*) FROM lineitem
                       WHERE l_partkey IN (SELECT p_partkey FROM part
                                           WHERE p_partkey % 2 = 0))
                      AS DOUBLE)
                 / (SELECT count(*) FROM lineitem), 6)
    """,
)
def q111_quality_audit(spark, sf_dir):
    """Deequ-style data-quality gate: null-fraction, key-uniqueness and
    referential-integrity metrics as ONE (check, metric) report — each
    family is a single aggregate pass (no per-rule rescans); the prio
    column gets nulls injected via nullif and the part side is halved so
    both failure modes actually show fractions < 1."""
    from graphmapreduce_spark.operators import quality as Q

    o = _t(spark, sf_dir, "orders")
    o2 = o.withColumn("prio", F.expr("nullif(o_orderpriority, '1-URGENT')"))
    li = _t(spark, sf_dir, "lineitem")
    return Q.audit(
        [
            Q.completeness(o2, ["o_orderkey", "prio"]),
            Q.uniqueness(o, ["o_orderkey", "o_custkey"]),
            Q.referential_integrity(
                o,
                _t(spark, sf_dir, "customer"),
                "o_custkey",
                "c_custkey",
                "orders_customer",
            ),
            Q.referential_integrity(
                li,
                _t(spark, sf_dir, "part").filter(F.col("p_partkey") % 2 == 0),
                "l_partkey",
                "p_partkey",
                "lineitem_halfpart",
            ),
        ]
    )


@register(
    "q112_histogram",
    """
    WITH b AS (SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi
               FROM orders)
    SELECT CAST(least(floor((o_totalprice - lo) / ((hi - lo) / 20)), 19)
                AS BIGINT)                                   AS bucket,
           ROUND(lo + least(floor((o_totalprice - lo) / ((hi - lo) / 20)), 19)
                      * ((hi - lo) / 20), 4)                 AS bucket_lo,
           CAST(count(*) AS BIGINT)                          AS n
    FROM orders, b
    GROUP BY 1, 2
    """,
)
def q112_histogram(spark, sf_dir):
    """Equal-width histogram (20 bins over the observed [min, max]):
    the bounds are a 1-row aggregate broadcast back over the scan —
    two passes total, both full-codegen, no driver round-trip for the
    bounds."""
    o = _t(spark, sf_dir, "orders")
    bounds = o.agg(
        F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi")
    )
    w = (F.col("hi") - F.col("lo")) / 20
    bucket = F.least(F.floor((F.col("o_totalprice") - F.col("lo")) / w), F.lit(19))
    return (
        o.join(F.broadcast(bounds))
        .groupBy(
            bucket.cast("long").alias("bucket"),
            F.round(F.col("lo") + bucket * w, 4).alias("bucket_lo"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "q113_cogroup_merge",
    """
    WITH o AS (SELECT o_custkey, count(*) AS n_orders,
                      sum(o_totalprice) AS total
               FROM orders GROUP BY o_custkey)
    SELECT coalesce(o.o_custkey, c.c_custkey) AS custkey,
           CAST(coalesce(n_orders, 0) AS BIGINT) AS n_orders,
           ROUND(coalesce(total, 0.0), 2) AS total_spend,
           c.c_acctbal AS acctbal
    FROM o FULL JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def q113_cogroup_merge(spark, sf_dir):
    """Co-grouped map (the `groupBy().cogroup().applyInPandas` API):
    both sides shuffle once on the key, then each key's order rows and
    customer row meet in ONE Arrow-batched pandas call — the escape
    hatch for per-key merge logic joins can't express.  This instance
    is deliberately join-expressible so the full-outer join+agg oracle
    value-checks the plumbing (keys on either side, empty frames)."""
    import pandas as pd

    orders = _t(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")

    def merge(key, left: "pd.DataFrame", right: "pd.DataFrame") -> "pd.DataFrame":
        return pd.DataFrame(
            {
                "custkey": [int(key[0])],
                "n_orders": [len(left)],
                "total_spend": [float(left["o_totalprice"].sum())],
                "acctbal": [
                    float(right["c_acctbal"].iloc[0]) if len(right) else None
                ],
            }
        )

    out = (
        orders.groupBy("o_custkey")
        .cogroup(cust.groupBy("c_custkey"))
        .applyInPandas(
            merge,
            schema="custkey long, n_orders long, total_spend double, acctbal double",
        )
    )
    return out.withColumn("total_spend", F.round("total_spend", 2))


def _harmonic_oracle_sql(
    sources: tuple[int, ...] = (0, 1, 2), mod: int = 500, depth: int = 8
) -> str:
    """Per-source unrolled BFS (min-dist accumulation; extra rounds
    no-op once the frontier is exhausted — the mod-500 graph's directed
    diameter is ~4 at sf0.01), then the harmonic sum over sources."""
    pre = f"""
    WITH e AS MATERIALIZED (
      SELECT DISTINCT l_orderkey % {mod} AS src, l_partkey % {mod} AS dst
      FROM lineitem WHERE l_orderkey % {mod} <> l_partkey % {mod})"""
    blocks, finals = [], []
    for s in sources:
        blocks.append(f"""
    s{s}d0 AS (SELECT CAST({s} AS BIGINT) AS id, 0 AS dist)""")
        for i in range(1, depth + 1):
            p = f"s{s}d{i - 1}"
            blocks.append(f"""
    s{s}d{i} AS MATERIALIZED (
      SELECT id, min(dist) AS dist FROM (
        SELECT id, dist FROM {p}
        UNION ALL
        SELECT e.dst AS id, p.dist + 1 AS dist
        FROM e JOIN {p} p ON p.id = e.src
      ) GROUP BY id)""")
        finals.append(
            f"SELECT id, 1.0 / dist AS h FROM s{s}d{depth} WHERE dist > 0"
        )
    return (
        pre
        + ","
        + ",".join(blocks)
        + f"""
    SELECT id, ROUND(sum(h), 6) AS harmonic
    FROM ({" UNION ALL ".join(finals)}) GROUP BY id"""
    )


@register("q114_harmonic_centrality", _harmonic_oracle_sql())
def q114_harmonic_centrality(spark, sf_dir):
    """Sampled harmonic centrality from 3 fixed seed sources over the
    directed mod-500 graph — one frontier-filtered BFS fixpoint per
    source over the shared cached edge table; oracle is the per-source
    unrolled min-dist BFS summed the same way."""
    g = _mod_graph(spark, sf_dir)
    out = alg.harmonic_centrality(g, [0, 1, 2])
    return out.withColumn("harmonic", F.round("harmonic", 6))


@register(
    "q115_iqr_outliers",
    """
    WITH f AS (
      SELECT o_orderpriority,
             quantile_cont(o_totalprice, 0.25) AS q1,
             quantile_cont(o_totalprice, 0.75) AS q3
      FROM orders GROUP BY o_orderpriority
    )
    SELECT o.o_orderpriority,
           CAST(sum(CASE WHEN o_totalprice < q1 - 1.5 * (q3 - q1)
                           OR o_totalprice > q3 + 1.5 * (q3 - q1)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           CAST(count(*) AS BIGINT) AS n
    FROM orders o JOIN f ON o.o_orderpriority = f.o_orderpriority
    GROUP BY o.o_orderpriority
    """,
)
def q115_iqr_outliers(spark, sf_dir):
    """Tukey-fence (1.5 IQR) outlier counts per order priority: exact
    per-group quartiles (one tiny sort-based agg) broadcast back over
    the scan, so the flagging pass is shuffle-free on the fact side."""
    from graphmapreduce_spark.operators import quality as Q

    o = _t(spark, sf_dir, "orders")
    flagged = Q.iqr_outliers(o, ["o_orderpriority"], "o_totalprice", k=1.5)
    return flagged.groupBy("o_orderpriority").agg(
        F.sum(F.col("is_outlier").cast("long")).alias("n_outliers"),
        F.count(F.lit(1)).alias("n"),
    )


def _zorder_oracle_sql(bits: int = 8) -> str:
    """Bit-for-bit replica of `layout.zorder_key` arithmetic on
    (o_custkey % 256, epoch-day % 256)."""
    terms = []
    for i, col in enumerate(("x", "y")):
        for b in range(bits):
            terms.append(f"((({col} >> {b}) & 1) << {b * 2 + i})")
    z = " | ".join(terms)
    return f"""
    WITH src AS (
      SELECT o_orderkey,
             o_custkey % 256 AS x,
             (o_orderdate::DATE - DATE '1970-01-01') % 256 AS y
      FROM orders WHERE o_orderkey < 2000
    )
    SELECT o_orderkey, x, y, {z} AS z FROM src
    """


@register("q116_zorder_key", _zorder_oracle_sql())
def q116_zorder_key(spark, sf_dir):
    """Z-order (Morton) clustering key over (customer, order-day) — the
    layout expression behind `cluster_by_zorder`, which range-partitions
    and sorts on this key so parquet files stay narrow in BOTH columns
    and multi-dimensional filters prune files.  The oracle replicates
    the bit interleave arithmetic exactly."""
    from graphmapreduce_spark.operators.layout import zorder_key

    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    src = o.select(
        "o_orderkey",
        (F.col("o_custkey") % 256).alias("x"),
        (
            F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01"))
            .cast("long")
            % 256
        ).alias("y"),
    )
    return src.withColumn("z", zorder_key(["x", "y"], bits=8))


def _mis_oracle_sql(mod: int = 500, rounds: int = 8) -> str:
    """Unrolled Luby rounds with the same md5-60bit priorities: winners
    beat every active neighbor, winners+neighbors retire, repeat.  The
    dense mod-500 graph finishes in ~3 rounds at sf0.01; later rounds
    are no-ops on an empty active set."""
    pre = f"""
    WITH de AS MATERIALIZED (
      SELECT DISTINCT l_orderkey % {mod} AS src, l_partkey % {mod} AS dst
      FROM lineitem WHERE l_orderkey % {mod} <> l_partkey % {mod}),
    e AS MATERIALIZED (
      SELECT src, dst FROM de UNION SELECT dst AS src, src AS dst FROM de),
    a0 AS MATERIALIZED (
      SELECT id, ('0x' || substr(md5(id || ':mis'), 1, 15))::BIGINT AS pri
      FROM (SELECT DISTINCT src AS id FROM e))"""
    its, winners = [], []
    for i in range(rounds):
        a, w = f"a{i}", f"w{i}"
        its.append(f"""
    nm{i} AS (
      SELECT e.dst AS id, min(s.pri) AS mn
      FROM e JOIN {a} s ON s.id = e.src JOIN {a} t ON t.id = e.dst
      GROUP BY e.dst),
    {w} AS MATERIALIZED (
      SELECT a.id FROM {a} a LEFT JOIN nm{i} m ON m.id = a.id
      WHERE m.mn IS NULL OR a.pri < m.mn),
    rm{i} AS (
      SELECT id FROM {w}
      UNION SELECT e.dst AS id FROM e JOIN {w} w ON w.id = e.src),
    a{i + 1} AS MATERIALIZED (
      SELECT a.id, a.pri FROM {a} a
      WHERE a.id NOT IN (SELECT id FROM rm{i}))""")
        winners.append(f"SELECT id FROM w{i}")
    return (
        pre + "," + ",".join(its)
        + f"""
    {" UNION ALL ".join(winners)}"""
    )


@register("q117_maximal_independent_set", _mis_oracle_sql())
def q117_maximal_independent_set(spark, sf_dir):
    """Luby's parallel MIS with deterministic md5 priorities over the
    symmetrized mod-500 graph — O(log n) BSP rounds, each one
    neighbor-min agg + anti-join on the shrinking active set; the
    oracle unrolls the same rounds in SQL."""
    g = _mod_graph(spark, sf_dir)
    return alg.maximal_independent_set(g)


@register(
    "q118_weighted_sample",
    """
    WITH d AS (
      SELECT doc_id, n_chars,
             least(greatest(CAST(n_chars AS DOUBLE) / 800.0, 0.0), 1.0) AS p
      FROM documents
    )
    SELECT doc_id, n_chars FROM d
    WHERE CAST(('0x' || substr(md5(doc_id || ':7'), 1, 15))::BIGINT % 1000000
               AS DOUBLE) / 1000000 < p
    """,
)
def q118_weighted_sample(spark, sf_dir):
    """Quality-weighted Bernoulli sampling: keep probability scales with
    document length (the data-mixture upweighting move), drawn from the
    content-deterministic hash uniform — a pure narrow filter the oracle
    replicates draw-for-draw (md5 variant)."""
    d = _t(spark, sf_dir, "documents").withColumn(
        "p", F.col("n_chars").cast("double") / 800.0
    )
    out = SMP.weighted_hash_sample(
        d, "doc_id", "p", scale=1.0, seed=7, hash_fn="md5"
    )
    return out.select("doc_id", "n_chars")


def _walks_oracle_sql(mod: int = 500, length: int = 4) -> str:
    """Unrolled deterministic-walk steps: step t moves to the
    out-neighbor minimizing (md5-60bit of 'cur|t|nb', nb) — the same
    argmin `deterministic_walks` takes via min(struct)."""
    pre = f"""
    WITH e AS MATERIALIZED (
      SELECT DISTINCT l_orderkey % {mod} AS src, l_partkey % {mod} AS dst
      FROM lineitem WHERE l_orderkey % {mod} <> l_partkey % {mod}),
    v AS MATERIALIZED (
      SELECT DISTINCT src AS id FROM e UNION SELECT DISTINCT dst FROM e),
    s0 AS (SELECT id AS start, id AS node FROM v)"""
    its = []
    for t in range(1, length + 1):
        its.append(f"""
    s{t} AS MATERIALIZED (
      SELECT start, node FROM (
        SELECT c.start, e.dst AS node,
               row_number() OVER (
                 PARTITION BY c.start
                 ORDER BY ('0x' || substr(md5(c.node || '|' || {t} || '|'
                                              || e.dst), 1, 15))::BIGINT,
                          e.dst) AS rn
        FROM s{t - 1} c JOIN e ON e.src = c.node) WHERE rn = 1)""")
    sel = ["SELECT start, 0 AS step, node FROM s0"] + [
        f"SELECT start, {t} AS step, node FROM s{t}" for t in range(1, length + 1)
    ]
    return pre + "," + ",".join(its) + "\n    " + " UNION ALL ".join(sel)


@register("q119_deterministic_walks", _walks_oracle_sql())
def q119_deterministic_walks(spark, sf_dir):
    """Random-walk corpus generation (DeepWalk/node2vec input) with
    hash-deterministic transitions from every vertex of the mod-500
    graph — per step one frontier join + min-struct agg, never
    reshuffling the edge set; oracle unrolls the same argmin steps."""
    g = _mod_graph(spark, sf_dir)
    return alg.deterministic_walks(g, walk_length=4)


@register(
    "q120_cooccurrence",
    r"""
    WITH dw AS (
      SELECT DISTINCT doc_id, term FROM (
        SELECT doc_id, UNNEST(list_filter(
          string_split_regex(trim(text), '\s+'), x -> x <> '')) AS term
        FROM documents WHERE doc_id < 400)
      WHERE length(term) >= 4
    ),
    df AS (SELECT term, count(*) AS d FROM dw GROUP BY term),
    keep AS (SELECT term FROM df WHERE d BETWEEN 5 AND 320),
    dk AS (SELECT dw.doc_id, dw.term FROM dw JOIN keep USING (term))
    SELECT a.term AS term_a, b.term AS term_b,
           CAST(count(*) AS BIGINT) AS support
    FROM dk a JOIN dk b ON a.doc_id = b.doc_id AND a.term < b.term
    GROUP BY a.term, b.term
    ORDER BY support DESC, term_a, term_b
    LIMIT 20
    """,
)
def q120_cooccurrence(spark, sf_dir):
    """Market-basket co-occurrence mining: top word pairs sharing
    documents.  Scale hygiene mirrors the n-gram-Jaccard lesson: a
    document-frequency band (5..320) caps the per-term fanout BEFORE
    the within-doc self-join, so one corpus-wide term can never create
    O(docs^2) pair rows; top-k via TakeOrdered, no global sort."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 400)
    dw = (
        d.select("doc_id", F.explode(T.words("text")).alias("term"))
        .filter(F.length("term") >= 4)
        .distinct()
    )
    df_band = (
        dw.groupBy("term")
        .agg(F.count(F.lit(1)).alias("d"))
        .filter((F.col("d") >= 5) & (F.col("d") <= 320))
        .select("term")
    )
    dk = dw.join(F.broadcast(df_band), "term").localCheckpoint(eager=False)
    pairs = (
        dk.alias("a")
        .join(
            dk.alias("b"),
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("a.term") < F.col("b.term")),
        )
        .groupBy(
            F.col("a.term").alias("term_a"), F.col("b.term").alias("term_b")
        )
        .agg(F.count(F.lit(1)).alias("support"))
    )
    return pairs.orderBy(
        F.desc("support"), F.asc("term_a"), F.asc("term_b")
    ).limit(20)


@register(
    "q121_recursive_cte",
    """
    WITH RECURSIVE chain(id, root, depth) AS (
      SELECT c_custkey, c_custkey, 0 FROM customer WHERE c_custkey < 10
      UNION ALL
      SELECT c.c_custkey, chain.root, chain.depth + 1
      FROM customer c JOIN chain ON chain.id = c.c_custkey // 10
      WHERE c.c_custkey >= 10
    )
    SELECT id, root, depth FROM chain
    """,
)
def q121_recursive_cte(spark, sf_dir):
    """Recursive SQL (WITH RECURSIVE, new in Spark 4): hierarchy
    traversal over the implicit digit-prefix forest (parent(k) = k
    div 10) — the BOM-explosion / org-chain shape, expressed the same
    way on both engines; each recursion level is one hash join, depth
    bounded by the key width."""
    _t(spark, sf_dir, "customer").createOrReplaceTempView("customer_v")
    return spark.sql(
        """
        WITH RECURSIVE chain(id, root, depth) AS (
          SELECT c_custkey, c_custkey, 0 FROM customer_v WHERE c_custkey < 10
          UNION ALL
          SELECT c.c_custkey, chain.root, chain.depth + 1
          FROM customer_v c JOIN chain ON chain.id = c.c_custkey div 10
          WHERE c.c_custkey >= 10
        )
        SELECT id, root, depth FROM chain
        """
    )


@register(
    "q122_variant_json",
    """
    SELECT event_type,
           CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
             AS k_sum,
           CAST(count(*) AS BIGINT) AS n
    FROM events
    WHERE CAST(json_extract(props, '$.k') AS BIGINT) >= 50
    GROUP BY event_type
    """,
)
def q122_variant_json(spark, sf_dir):
    """Semi-structured VARIANT path (Spark 4): `parse_json` once into
    the binary variant encoding, then typed `variant_get` extraction —
    the shredded-JSON fast path vs per-access string re-parsing
    (q18's from_json covers the schema-ful route).  Oracle uses
    DuckDB's json_extract on the same paths."""
    e = _t(spark, sf_dir, "events")
    v = e.select(
        "event_type",
        F.expr("variant_get(parse_json(props), '$.k', 'long')").alias("k"),
    )
    return (
        v.filter(F.col("k") >= 50)
        .groupBy("event_type")
        .agg(F.sum("k").alias("k_sum"), F.count(F.lit(1)).alias("n"))
    )


@register(
    "q123_incremental_agg",
    """
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT)        AS n,
           ROUND(sum(o_totalprice), 2)     AS total,
           ROUND(min(o_totalprice), 2)     AS lo,
           ROUND(max(o_totalprice), 2)     AS hi
    FROM orders GROUP BY o_orderpriority
    """,
)
def q123_incremental_agg(spark, sf_dir):
    """Incremental materialized-aggregate maintenance: history and the
    'new day' are aggregated separately, then `merge_agg_tables` merges
    the two agg tables WITHOUT re-scanning history (union + re-agg over
    group rows only — count/sum/min/max states are algebraic).  The
    oracle is the from-scratch aggregate the merge must equal."""
    o = _t(spark, sf_dir, "orders")
    cutoff = "1997-01-01"

    def agg_at_grain(df):
        return df.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("o_totalprice").alias("total"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
        )

    base = agg_at_grain(o.filter(F.col("o_orderdate") < cutoff))
    delta = agg_at_grain(o.filter(F.col("o_orderdate") >= cutoff))
    merged = SK.merge_agg_tables(
        base,
        delta,
        ["o_orderpriority"],
        sum_cols=["total"],
        count_cols=["n"],
        min_cols=["lo"],
        max_cols=["hi"],
    )
    return merged.select(
        "o_orderpriority",
        "n",
        F.round("total", 2).alias("total"),
        F.round("lo", 2).alias("lo"),
        F.round("hi", 2).alias("hi"),
    )


@register(
    "q124_clustering_coefficient",
    """
    WITH und AS (
      SELECT DISTINCT LEAST(l_orderkey % 500, l_partkey % 500) AS a,
                      GREATEST(l_orderkey % 500, l_partkey % 500) AS b
      FROM lineitem
      WHERE l_orderkey % 500 <> l_partkey % 500
    ),
    sym AS (SELECT a AS id, b AS nbr FROM und
            UNION ALL SELECT b, a FROM und),
    deg AS (SELECT id, COUNT(*) AS deg FROM sym GROUP BY id),
    tris AS (
      SELECT e1.a AS x, e1.b AS y, e2.b AS z
      FROM und e1 JOIN und e2 ON e1.b = e2.a
                  JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
    ),
    corners AS (SELECT x AS id FROM tris
                UNION ALL SELECT y FROM tris
                UNION ALL SELECT z FROM tris),
    pvt AS (SELECT id, COUNT(*) AS t FROM corners GROUP BY id)
    SELECT d.id,
           CAST(d.deg AS BIGINT) AS degree,
           CAST(COALESCE(pvt.t, 0) AS BIGINT) AS triangles,
           ROUND(CASE WHEN d.deg < 2 THEN 0.0
                      ELSE 2.0 * COALESCE(pvt.t, 0)
                           / (d.deg * (d.deg - 1)) END, 6) AS cc
    FROM deg d LEFT JOIN pvt ON d.id = pvt.id
    """,
)
def q124_clustering_coefficient(spark, sf_dir):
    """Local clustering coefficient per vertex over the Z_500 lineitem
    graph — `clustering_coefficient` composes the canonical-orientation
    wedge join (triangles) with one distinct-neighbor degree agg; the
    oracle replays both as plain SQL."""
    from graphmapreduce_spark.graph.algorithms import clustering_coefficient

    g = _mod_graph(spark, sf_dir, 500)
    out = clustering_coefficient(g)
    return out.withColumn("cc", F.round("cc", 6))


@register(
    "q125_vertex_jaccard",
    """
    WITH und AS (
      SELECT DISTINCT LEAST(l_orderkey % 2000, l_partkey % 2000) AS a,
                      GREATEST(l_orderkey % 2000, l_partkey % 2000) AS b
      FROM lineitem
      WHERE l_orderkey % 2000 <> l_partkey % 2000 AND l_quantity <= 5
    ),
    sym AS (SELECT a AS id, b AS nbr FROM und
            UNION ALL SELECT b, a FROM und),
    deg AS (SELECT id, COUNT(*) AS deg FROM sym GROUP BY id),
    common AS (
      SELECT l.id AS id_a, r.id AS id_b, CAST(COUNT(*) AS BIGINT) AS common
      FROM sym l JOIN sym r ON l.nbr = r.nbr AND l.id < r.id
      GROUP BY 1, 2 HAVING COUNT(*) >= 2
    )
    SELECT c.id_a, c.id_b, c.common,
           ROUND(c.common::DOUBLE
                 / (da.deg + db.deg - c.common), 6) AS jaccard
    FROM common c JOIN deg da ON c.id_a = da.id
                  JOIN deg db ON c.id_b = db.id
    """,
)
def q125_vertex_jaccard(spark, sf_dir):
    """Common-neighbor Jaccard similarity between vertex pairs (the
    link-prediction primitive) on a sparse lineitem-derived graph —
    `vertex_jaccard` generates pairs ONLY through shared neighbors
    (wedge join), never an all-pairs cross; the oracle is the same
    wedge join in SQL."""
    from graphmapreduce_spark.graph.algorithms import vertex_jaccard

    li = _t(spark, sf_dir, "lineitem")
    e = (
        li.filter(F.col("l_quantity") <= 5)
        .select(
            (F.col("l_orderkey") % 2000).alias("src"),
            (F.col("l_partkey") % 2000).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
        .withColumn("weight", F.lit(1.0))
    )
    g = PropertyGraph.from_edges(e, prepartition=False)
    out = vertex_jaccard(g, min_common=2)
    return out.withColumn("jaccard", F.round("jaccard", 6))


@register(
    "q126_shard_assignment",
    r"""
    WITH toks AS (
      SELECT doc_id,
             len(regexp_extract_all(text,
                 '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]'))::BIGINT AS n_tokens
      FROM documents
    ),
    tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS t FROM toks),
    cum AS (
      SELECT doc_id, n_tokens,
             CAST(SUM(n_tokens) OVER (ORDER BY doc_id
                                      ROWS UNBOUNDED PRECEDING) - n_tokens
                  AS BIGINT) AS "offset"
      FROM toks
    )
    SELECT doc_id, n_tokens,
           CAST("offset" // ((t + 7) // 8) AS BIGINT) AS shard,
           "offset"
    FROM cum, tot
    """,
)
def q126_shard_assignment(spark, sf_dir):
    """Token-balanced contiguous sharding of the corpus into 8 shards
    (equal token mass per data-loader worker) — `shard_assignment`
    reuses the scalable two-level cumsum; the oracle is the naive
    global window with ceil-divided capacity."""
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", T.token_count("text").cast("long").alias("n_tokens")
    )
    return PK.shard_assignment(d, "doc_id", "n_tokens", num_shards=8)


@register(
    "q127_gopher_quality",
    r"""
    WITH base AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(text), '\s+'),
                         w -> w <> '') AS ws,
             string_split(text, chr(10)) AS lines,
             length(regexp_replace(text, '\s', '', 'g')) AS nonspace
      FROM documents
    ),
    m AS (
      SELECT doc_id,
             len(ws)::BIGINT AS n_words,
             ROUND(CASE WHEN len(ws) > 0
                        THEN nonspace::DOUBLE / len(ws) ELSE 0.0 END, 6)
               AS avg_word_len,
             ROUND(CASE WHEN len(ws) > 0
                        THEN len(list_filter(ws,
                             w -> regexp_matches(w, '[A-Za-z]')))::DOUBLE
                             / len(ws) ELSE 0.0 END, 6) AS alpha_frac,
             ROUND(CASE WHEN len(lines) > 0
                        THEN len(list_filter(lines,
                             x -> regexp_matches(x, '^\s*[-*•]')))::DOUBLE
                             / len(lines) ELSE 0.0 END, 6) AS bullet_frac,
             CAST(list_contains(list_transform(ws, w -> lower(w)), 'the')::INT
                + list_contains(list_transform(ws, w -> lower(w)), 'be')::INT
                + list_contains(list_transform(ws, w -> lower(w)), 'to')::INT
                + list_contains(list_transform(ws, w -> lower(w)), 'of')::INT
                + list_contains(list_transform(ws, w -> lower(w)), 'and')::INT
                + list_contains(list_transform(ws, w -> lower(w)), 'that')::INT
                + list_contains(list_transform(ws, w -> lower(w)), 'have')::INT
                + list_contains(list_transform(ws, w -> lower(w)), 'with')::INT
               AS BIGINT) AS stop_hits
      FROM base
    )
    SELECT *,
           (n_words BETWEEN 50 AND 100000
            AND avg_word_len BETWEEN 3.0 AND 10.0
            AND alpha_frac >= 0.8
            AND bullet_frac <= 0.9
            AND stop_hits >= 2) AS keep
    FROM m
    """,
)
def q127_gopher_quality(spark, sf_dir):
    """Gopher-style quality gates over the corpus (word-count bounds,
    mean word length, alphabetic fraction, bullet-line fraction,
    stopword floor) — `gopher_rules` computes every rule as pure
    expressions in one scan-speed pass; the oracle replays the same
    arithmetic with DuckDB list lambdas."""
    from graphmapreduce_spark.operators import quality as Q

    d = _t(spark, sf_dir, "documents")
    return Q.gopher_rules(d, "doc_id", "text")


@register(
    "q128_merge_cdc",
    """
    WITH changes AS (
      SELECT c_custkey,
             CASE WHEN c_custkey % 20 = 0 THEN 'D'
                  WHEN c_custkey % 10 = 0 THEN 'U'
                  ELSE 'I' END AS op,
             c_name,
             ROUND(c_acctbal + 100.0, 2) AS c_acctbal
      FROM customer WHERE c_custkey % 5 = 0
    ),
    survivors AS (
      SELECT c_custkey, c_name, ROUND(c_acctbal, 2) AS c_acctbal
      FROM customer
      WHERE c_custkey NOT IN (SELECT c_custkey FROM changes)
    )
    SELECT * FROM survivors
    UNION ALL
    SELECT c_custkey, c_name, c_acctbal FROM changes WHERE op <> 'D'
    """,
)
def q128_merge_cdc(spark, sf_dir):
    """Full CDC MERGE (insert/update/delete ops in one change batch)
    against the customer dimension — `merge_apply_cdc` is one anti-join
    on the broadcastable change keys + one union; deleted keys vanish,
    updates replace wholesale.  The oracle is the NOT IN + union
    formulation."""
    c = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", F.round("c_acctbal", 2).alias("c_acctbal")
    )
    changes = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 5 == 0)
        .select(
            "c_custkey",
            F.when(F.col("c_custkey") % 20 == 0, "D")
            .when(F.col("c_custkey") % 10 == 0, "U")
            .otherwise("I")
            .alias("op"),
            "c_name",
            F.round(F.col("c_acctbal") + 100.0, 2).alias("c_acctbal"),
        )
    )
    return R.merge_apply_cdc(c, changes, ["c_custkey"], op_col="op")


@register(
    "q129_stream_left_outer_join",
    """
    SELECT e1.user_id,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(*) - COUNT(e2.ts) AS BIGINT) AS n_unmatched
    FROM events e1 LEFT JOIN events e2
      ON e1.user_id = e2.user_id AND e2.event_type = 'purchase'
     AND e2.ts > e1.ts AND e2.ts <= e1.ts + INTERVAL 10 MINUTE
    WHERE e1.event_type = 'click'
    GROUP BY e1.user_id
    """,
)
def q129_stream_left_outer_join(spark, sf_dir):
    """Stream-stream LEFT OUTER interval join: every click emits —
    matched with purchases within 10 minutes, or with nulls once the
    watermark proves no match can arrive.  Outer results only
    materialize when BOTH sides' watermarks pass the join window, so a
    far-future flush event per side (click + purchase, user -1) is
    appended to a temp copy of the stream — the query exercises real
    outer-eviction semantics, not shutdown flushing."""
    import datetime as _dt
    import os as _os
    import shutil
    import tempfile

    src = _os.path.join(sf_dir, "events.parquet")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    static = spark.read.parquet(src)
    d = tempfile.mkdtemp(prefix="gmr_loj_src_")
    shutil.copy(src, _os.path.join(d, "00_events.parquet"))
    max_ts = static.agg(F.max("ts")).first()[0]
    if dict(static.dtypes).get("ts") == "bigint":
        f1 = int(max_ts) + 2 * 3600 * 1_000_000_000
    else:
        f1 = max_ts + _dt.timedelta(hours=2)
    flush = spark.createDataFrame(
        [(-1, f1, -1, "click", 0.0, None), (-2, f1, -1, "purchase", 0.0, None)],
        static.schema,
    )
    flush.coalesce(1).write.mode("append").parquet(d)
    stream = _normalize_ts(
        spark.readStream.schema(static.schema).parquet(d), "ts"
    )
    clicks = (
        stream.filter(F.col("event_type") == "click")
        .select("user_id", F.col("ts").alias("click_ts"))
        .withWatermark("click_ts", "30 minutes")
    )
    buys = (
        stream.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("b_user_id"), F.col("ts").alias("buy_ts")
        )
        .withWatermark("buy_ts", "30 minutes")
    )
    joined = clicks.join(
        buys,
        (F.col("user_id") == F.col("b_user_id"))
        & (F.col("buy_ts") > F.col("click_ts"))
        & (
            F.col("buy_ts")
            <= F.col("click_ts") + F.expr("INTERVAL 10 MINUTES")
        ),
        "left_outer",
    ).select("user_id", "click_ts", "buy_ts")
    out = _run_stream_to_table(spark, joined, "lojoin", output_mode="append")
    return (
        out.filter(F.col("user_id") >= 0)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(
                F.when(F.col("buy_ts").isNull(), 1).otherwise(0)
            ).alias("n_unmatched"),
        )
    )


@register(
    "q130_intradoc_line_dedup",
    """
    WITH base AS (
      SELECT doc_id, string_split(text, chr(10)) AS ls FROM documents
    ),
    k AS (
      SELECT doc_id, ls,
             list_transform(
               list_filter(range(1, len(ls) + 1),
                           i -> list_position(ls, ls[i]) = i),
               i -> ls[i]) AS kept
      FROM base
    )
    SELECT doc_id,
           CAST(len(ls) AS BIGINT) AS n_lines,
           CAST(len(kept) AS BIGINT) AS n_kept,
           array_to_string(kept, chr(10)) AS cleaned
    FROM k
    """,
)
def q130_intradoc_line_dedup(spark, sf_dir):
    """Within-document repeated-line removal (template/menu spam) —
    `dedup_lines` keeps first occurrences in order via an index-lambda
    filter, entirely in-scan with no shuffle; the oracle rebuilds the
    same kept-list with DuckDB list lambdas."""
    d = _t(spark, sf_dir, "documents")
    cleaned = T.dedup_lines("text")
    return d.select(
        "doc_id",
        F.size(F.split(F.col("text"), "\n")).alias("n_lines"),
        F.size(F.split(cleaned, "\n")).alias("n_kept"),
        cleaned.alias("cleaned"),
    )


@register(
    "q131_time_weighted_avg",
    """
    WITH e AS (
      SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS es, value
      FROM events WHERE user_id < 100
    ),
    o AS (
      SELECT user_id, es, value,
             (es // 86400) * 86400 AS bucket_start,
             lead(es) OVER (PARTITION BY user_id ORDER BY es, value) AS nxt
      FROM e
    ),
    w AS (
      SELECT user_id, bucket_start, value,
             (LEAST(COALESCE(nxt, bucket_start + 86400),
                    bucket_start + 86400) - es)::DOUBLE AS dt
      FROM o
    )
    SELECT user_id, bucket_start,
           ROUND(SUM(value * dt) / SUM(dt), 6) AS twap
    FROM w GROUP BY user_id, bucket_start
    """,
)
def q131_time_weighted_avg(spark, sf_dir):
    """Daily TWAP per user over the irregular event stream — each
    observation weighted by how long it stayed current (lead() clamped
    to the bucket edge); `time_weighted_avg` carries the window and the
    bucket agg on ONE keyed shuffle.  Plain AVG would overweight
    bursts; the oracle replays the same lead/clamp arithmetic."""
    e = _t(spark, sf_dir, "events").filter(F.col("user_id") < 100)
    out = TS.time_weighted_avg(e, "user_id", "ts", "value", 86400)
    return out.withColumn("twap", F.round("twap", 6))


@register(
    "q132_table_diff",
    """
    WITH a AS (
      SELECT c_custkey, c_name, ROUND(c_acctbal, 2) AS c_acctbal
      FROM customer
    ),
    b0 AS (
      SELECT c_custkey, c_name,
             CASE WHEN c_custkey % 7 = 0
                  THEN ROUND(c_acctbal + 50.0, 2)
                  ELSE ROUND(c_acctbal, 2) END AS c_acctbal
      FROM customer WHERE c_custkey % 11 <> 0
    ),
    bn AS (
      SELECT c_custkey + 1000000 AS c_custkey, c_name,
             ROUND(c_acctbal, 2) AS c_acctbal
      FROM customer WHERE c_custkey % 13 = 0
    ),
    b AS (SELECT * FROM b0 UNION ALL SELECT * FROM bn),
    j AS (
      SELECT COALESCE(a.c_custkey, b.c_custkey) AS c_custkey,
             CASE WHEN b.c_custkey IS NULL THEN 'only_a'
                  WHEN a.c_custkey IS NULL THEN 'only_b'
                  WHEN NOT (a.c_name IS NOT DISTINCT FROM b.c_name
                            AND a.c_acctbal IS NOT DISTINCT FROM b.c_acctbal)
                  THEN 'changed' END AS status,
             a.c_name AS c_name_a, a.c_acctbal AS c_acctbal_a,
             b.c_name AS c_name_b, b.c_acctbal AS c_acctbal_b
      FROM a FULL OUTER JOIN b ON a.c_custkey = b.c_custkey
    )
    SELECT c_custkey, status, c_name_a, c_acctbal_a, c_name_b, c_acctbal_b
    FROM j WHERE status IS NOT NULL
    """,
)
def q132_table_diff(spark, sf_dir):
    """Anti-entropy reconciliation: diff the customer dimension against
    a drifted copy (dropped keys, changed balances, new keys) —
    `table_diff` is one full-outer hash join emitting only the
    differing keys with null-safe change detection."""
    a = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", F.round("c_acctbal", 2).alias("c_acctbal")
    )
    b0 = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 11 != 0)
        .select(
            "c_custkey",
            "c_name",
            F.when(
                F.col("c_custkey") % 7 == 0,
                F.round(F.col("c_acctbal") + 50.0, 2),
            )
            .otherwise(F.round("c_acctbal", 2))
            .alias("c_acctbal"),
        )
    )
    bn = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 13 == 0)
        .select(
            (F.col("c_custkey") + 1000000).alias("c_custkey"),
            "c_name",
            F.round("c_acctbal", 2).alias("c_acctbal"),
        )
    )
    return R.table_diff(
        a, b0.unionByName(bn), ["c_custkey"], ["c_name", "c_acctbal"]
    )


@register(
    "q133_stratified_fixed_k",
    """
    SELECT o_orderkey, o_orderpriority FROM (
      SELECT o_orderkey, o_orderpriority,
             row_number() OVER (
               PARTITION BY o_orderpriority
               ORDER BY ('0x' || substr(md5('0' || '|'
                         || CAST(o_orderkey AS VARCHAR)), 1, 15))::BIGINT,
                        o_orderkey) AS rn
      FROM orders)
    WHERE rn <= 100
    """,
)
def q133_stratified_fixed_k(spark, sf_dir):
    """Deterministic fixed-size stratified sample: exactly 100 orders
    per priority class chosen by portable md5 priority —
    `stratified_fixed_k` is one keyed window shuffle, a pure function
    of the data (stable across runs/engines/partitionings), the
    count-based complement of the rate-based `hash_sample`."""
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    return SMP.stratified_fixed_k(
        o, ["o_orderpriority"], k=100, seed=0, id_cols=["o_orderkey"]
    )


@register(
    "q134_ewma",
    """
    WITH e AS (
      SELECT user_id, event_id,
             CAST(floor(epoch(ts)) AS BIGINT) AS es, value
      FROM events WHERE user_id < 30
    ),
    l AS (
      SELECT user_id, event_id, es, value,
             lag(value, 1) OVER w AS v1,
             lag(value, 2) OVER w AS v2,
             lag(value, 3) OVER w AS v3,
             lag(value, 4) OVER w AS v4
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY es, event_id)
    )
    SELECT user_id, event_id,
           ROUND((value
                  + COALESCE(0.5 * v1, 0) + COALESCE(0.25 * v2, 0)
                  + COALESCE(0.125 * v3, 0) + COALESCE(0.0625 * v4, 0))
                 / (1
                    + CASE WHEN v1 IS NULL THEN 0 ELSE 0.5 END
                    + CASE WHEN v2 IS NULL THEN 0 ELSE 0.25 END
                    + CASE WHEN v3 IS NULL THEN 0 ELSE 0.125 END
                    + CASE WHEN v4 IS NULL THEN 0 ELSE 0.0625 END), 6)
             AS ewma
    FROM l
    """,
)
def q134_ewma(spark, sf_dir):
    """Finite-window EWMA smoothing of each user's value series
    (alpha=0.5, last 5 observations, renormalized at series heads) —
    `ewma` unrolls the recursion into lag() terms over ONE keyed
    window; the oracle is the same unrolled arithmetic."""
    e = _t(spark, sf_dir, "events").filter(F.col("user_id") < 30).select(
        "user_id", "event_id", F.col("ts").cast("long").alias("es"), "value"
    )
    out = TS.ewma(
        e, "user_id", ["es", "event_id"], "value", alpha=0.5, k=5
    )
    return out.select(
        "user_id", "event_id", F.round("ewma", 6).alias("ewma")
    )


@register(
    "q135_degree_assortativity",
    """
    WITH und AS (
      SELECT DISTINCT LEAST(l_orderkey % 500, l_partkey % 500) AS a,
                      GREATEST(l_orderkey % 500, l_partkey % 500) AS b
      FROM lineitem
      WHERE l_orderkey % 500 <> l_partkey % 500
    ),
    sym AS (SELECT a, b FROM und UNION ALL SELECT b, a FROM und),
    deg AS (SELECT a AS id, COUNT(*) AS deg FROM sym GROUP BY a)
    SELECT ROUND(corr(da.deg, db.deg), 6) AS assortativity
    FROM sym JOIN deg da ON sym.a = da.id
             JOIN deg db ON sym.b = db.id
    """,
)
def q135_degree_assortativity(spark, sf_dir):
    """Newman degree assortativity of the Z_500 lineitem graph — one
    scalar from two degree joins + the built-in corr aggregate;
    positive means hubs attach to hubs."""
    from graphmapreduce_spark.graph.algorithms import degree_assortativity

    g = _mod_graph(spark, sf_dir, 500)
    return degree_assortativity(g).select(
        F.round("assortativity", 6).alias("assortativity")
    )


@register(
    "q136_modularity",
    """
    WITH und AS (
      SELECT DISTINCT LEAST(l_orderkey % 500, l_partkey % 500) AS a,
                      GREATEST(l_orderkey % 500, l_partkey % 500) AS b
      FROM lineitem
      WHERE l_orderkey % 500 <> l_partkey % 500
    ),
    m AS (SELECT COUNT(*)::DOUBLE AS m FROM und),
    intra AS (
      SELECT a % 4 AS community, COUNT(*) AS e_c
      FROM und WHERE a % 4 = b % 4 GROUP BY 1
    ),
    sym AS (SELECT a, b FROM und UNION ALL SELECT b, a FROM und),
    degmass AS (
      SELECT a % 4 AS community, COUNT(*) AS a_c FROM sym GROUP BY 1
    )
    SELECT ROUND(SUM(COALESCE(e_c, 0) / m - POW(a_c / (2 * m), 2)), 6)
             AS modularity
    FROM degmass LEFT JOIN intra USING (community), m
    """,
)
def q136_modularity(spark, sf_dir):
    """Newman modularity Q of a 4-way hash community assignment on the
    Z_500 lineitem graph — `modularity` is two broadcastable assignment
    joins + two tiny aggs, the quality gate for label-propagation or
    locality-partition output."""
    from graphmapreduce_spark.graph.algorithms import modularity

    g = _mod_graph(spark, sf_dir, 500)
    comm = g.vertices.select(
        "id", (F.col("id") % 4).alias("community")
    )
    return modularity(g, comm).select(
        F.round("modularity", 6).alias("modularity")
    )


@register(
    "q137_flesch_readability",
    r"""
    WITH base AS (
      SELECT doc_id,
             len(list_filter(string_split_regex(trim(text), '\s+'),
                             w -> w <> ''))::BIGINT AS nw,
             GREATEST(len(regexp_extract_all(text, '[.!?]+')), 1) AS sentences,
             len(regexp_extract_all(lower(text), '[aeiouy]+')) AS syllables
      FROM documents
    )
    SELECT doc_id,
           CASE WHEN nw > 0
                THEN ROUND(206.835 - 1.015 * (nw::DOUBLE / sentences)
                           - 84.6 * (syllables::DOUBLE / nw), 4)
           END AS flesch
    FROM base
    """,
)
def q137_flesch_readability(spark, sf_dir):
    """Flesch reading-ease per document (vowel-group syllable proxy,
    terminal-punctuation sentence proxy) — `flesch_reading_ease` is one
    regexp-count expression per component, no explode, scan-speed."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id", F.round(T.flesch_reading_ease("text"), 4).alias("flesch")
    )


@register(
    "q138_winsorize",
    """
    WITH b AS (
      SELECT l_returnflag,
             quantile_cont(l_extendedprice, 0.05) AS lo,
             quantile_cont(l_extendedprice, 0.95) AS hi
      FROM lineitem GROUP BY 1
    )
    SELECT l.l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN l_extendedprice < lo THEN 1 ELSE 0 END)
                AS BIGINT) AS n_clip_lo,
           CAST(SUM(CASE WHEN l_extendedprice > hi THEN 1 ELSE 0 END)
                AS BIGINT) AS n_clip_hi,
           ROUND(AVG(GREATEST(lo, LEAST(hi, l_extendedprice))), 2)
             AS avg_wins,
           ROUND(ANY_VALUE(lo), 4) AS p05,
           ROUND(ANY_VALUE(hi), 4) AS p95
    FROM lineitem l JOIN b USING (l_returnflag)
    GROUP BY l.l_returnflag
    """,
)
def q138_winsorize(spark, sf_dir):
    """Per-group winsorized price summary: clip to the group's exact
    [p05, p95] percentiles then summarize — `winsorize` is a two-pass
    shape (tiny bounds agg broadcast onto a map-side clip join), never
    a full-data window sort."""
    from graphmapreduce_spark.operators import quality as Q

    li = _t(spark, sf_dir, "lineitem")
    w = Q.winsorize(li, ["l_returnflag"], "l_extendedprice", 0.05, 0.95)
    return w.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            (F.col("l_extendedprice") < F.col("l_extendedprice_lo"))
            .cast("long")
        ).alias("n_clip_lo"),
        F.sum(
            (F.col("l_extendedprice") > F.col("l_extendedprice_hi"))
            .cast("long")
        ).alias("n_clip_hi"),
        F.round(F.avg("l_extendedprice_wins"), 2).alias("avg_wins"),
        F.round(F.any_value("l_extendedprice_lo"), 4).alias("p05"),
        F.round(F.any_value("l_extendedprice_hi"), 4).alias("p95"),
    )


@register(
    "q139_chi_squared",
    """
    WITH cells AS (
      SELECT o_orderpriority AS a, o_orderstatus AS b, COUNT(*) AS o
      FROM orders GROUP BY 1, 2
    ),
    ra AS (SELECT o_orderpriority AS a, COUNT(*) AS ra FROM orders GROUP BY 1),
    rb AS (SELECT o_orderstatus AS b, COUNT(*) AS rb FROM orders GROUP BY 1),
    n AS (SELECT COUNT(*)::DOUBLE AS n FROM orders),
    fullgrid AS (
      SELECT COALESCE(cells.o, 0) AS o, ra.ra * rb.rb / n.n AS e
      FROM ra CROSS JOIN rb CROSS JOIN n
      LEFT JOIN cells ON cells.a = ra.a AND cells.b = rb.b
    )
    SELECT ROUND(SUM(POW(o - e, 2) / e), 4) AS chi2,
           CAST((SELECT (COUNT(*) - 1) FROM ra)
                * (SELECT (COUNT(*) - 1) FROM rb) AS BIGINT) AS dof
    FROM fullgrid
    """,
)
def q139_chi_squared(spark, sf_dir):
    """Pearson chi-squared independence test between order priority and
    status — `chi_squared` builds the full product-marginal grid
    (empty cells still contribute their expectation) from three tiny
    aggs + broadcast joins."""
    from graphmapreduce_spark.operators import quality as Q

    o = _t(spark, sf_dir, "orders")
    out = Q.chi_squared(o, "o_orderpriority", "o_orderstatus")
    return out.select(F.round("chi2", 4).alias("chi2"), "dof")


@register(
    "q140_retention_cohorts",
    """
    WITH act AS (
      SELECT DISTINCT user_id,
             (CAST(floor(epoch(ts)) AS BIGINT) // 86400) * 86400 AS b
      FROM events
    ),
    cohort AS (SELECT user_id, MIN(b) AS c FROM act GROUP BY user_id)
    SELECT c AS cohort,
           CAST((b - c) // 86400 AS BIGINT) AS bucket_offset,
           CAST(COUNT(DISTINCT act.user_id) AS BIGINT) AS n_users
    FROM act JOIN cohort USING (user_id)
    GROUP BY 1, 2
    """,
)
def q140_retention_cohorts(spark, sf_dir):
    """Daily cohort retention triangle over the event stream (users
    bucketed by first-activity day, counted in every later day they
    return) — `retention_cohorts` carries the distinct, the cohort
    min, and the count on one user-key partitioning."""
    e = _t(spark, sf_dir, "events")
    return TS.retention_cohorts(e, "user_id", "ts", 86400)


@register(
    "q141_corpus_pipeline",
    r"""
    WITH norm AS (
      SELECT doc_id,
             trim(regexp_replace(regexp_replace(lower(text),
                  '[\x00-\x1f\x7f]', ' ', 'g'), '\s{2,}', ' ', 'g')) AS ntext
      FROM documents
    ),
    base AS (
      SELECT doc_id, ntext,
             list_filter(string_split_regex(trim(ntext), '\s+'),
                         w -> w <> '') AS ws,
             string_split(ntext, chr(10)) AS lines,
             length(regexp_replace(ntext, '\s', '', 'g')) AS nonspace
      FROM norm
    ),
    m AS (
      SELECT doc_id, ntext,
             len(ws)::BIGINT AS n_words,
             ROUND(CASE WHEN len(ws) > 0
                        THEN nonspace::DOUBLE / len(ws) ELSE 0.0 END, 6)
               AS avg_word_len,
             ROUND(CASE WHEN len(ws) > 0
                        THEN len(list_filter(ws,
                             w -> regexp_matches(w, '[A-Za-z]')))::DOUBLE
                             / len(ws) ELSE 0.0 END, 6) AS alpha_frac,
             ROUND(CASE WHEN len(lines) > 0
                        THEN len(list_filter(lines,
                             x -> regexp_matches(x, '^\s*[-*•]')))::DOUBLE
                             / len(lines) ELSE 0.0 END, 6) AS bullet_frac,
             (list_contains(ws, 'the')::INT + list_contains(ws, 'be')::INT
              + list_contains(ws, 'to')::INT + list_contains(ws, 'of')::INT
              + list_contains(ws, 'and')::INT + list_contains(ws, 'that')::INT
              + list_contains(ws, 'have')::INT
              + list_contains(ws, 'with')::INT) AS stop_hits
      FROM base
    ),
    gated AS (
      SELECT doc_id, ntext FROM m
      WHERE n_words BETWEEN 20 AND 100000
        AND avg_word_len BETWEEN 3.0 AND 10.0
        AND alpha_frac >= 0.8 AND bullet_frac <= 0.9 AND stop_hits >= 1
    ),
    dedup AS (SELECT ntext, MIN(doc_id) AS doc_id FROM gated GROUP BY ntext),
    toks AS (
      SELECT doc_id,
             len(regexp_extract_all(ntext,
                 '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]'))::BIGINT AS n_tokens
      FROM dedup
    ),
    cum AS (
      SELECT doc_id, n_tokens,
             CAST(SUM(n_tokens) OVER (ORDER BY doc_id
                                      ROWS UNBOUNDED PRECEDING) - n_tokens
                  AS BIGINT) AS "offset"
      FROM toks
    )
    SELECT doc_id, n_tokens,
           CAST("offset" // 2048 AS BIGINT) AS bin, "offset"
    FROM cum
    """,
)
def q141_corpus_pipeline(spark, sf_dir):
    """The composed corpus-prep flow (`pipeline.prepare_corpus`):
    normalize → Gopher gate → exact dedup on the normalized form →
    tokenize → pack into 2048-token windows.  Every stage is an
    already-oracled operator; the chained CTE oracle value-checks the
    composition end-to-end.  Narrow stages fuse into one scan — the
    only shuffles are the dedup agg and the packing cumsum."""
    from graphmapreduce_spark.pipeline import prepare_corpus

    d = _t(spark, sf_dir, "documents")
    return prepare_corpus(
        d, "doc_id", "text", capacity=2048,
        # fixture register: terse technical docs (10-99 words)
        min_words=20, min_stopword_hits=1,
    )


@register(
    "q142_asof_forward",
    """
    WITH l AS (SELECT user_id, ts, event_id FROM events
               WHERE event_type = 'click'),
    r AS (SELECT user_id, ts, value FROM events
          WHERE event_type = 'purchase')
    SELECT l.user_id, l.event_id,
           MIN(CASE WHEN r.ts >= l.ts
                    THEN r.ts END) AS next_purchase_ts
    FROM l LEFT JOIN r ON l.user_id = r.user_id
    GROUP BY l.user_id, l.event_id
    """,
)
def q142_asof_forward(spark, sf_dir):
    """Forward as-of join: each click matched to the EARLIEST purchase
    at-or-after it per user — `asof_join(direction='forward')` is the
    tagged-union + running-window formulation (one keyed shuffle,
    per-key row counts unbounded); q22 covers the backward direction.
    The oracle is the quadratic min-over-future formulation."""
    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    buys = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("b_ts"), "value"
    )
    out = asof_join(
        clicks, buys, on="user_id", left_ts="ts", right_ts="b_ts",
        value_cols=["b_ts"], direction="forward",
    )
    return out.select(
        "user_id", "event_id",
        F.col("b_ts").alias("next_purchase_ts"),
    )


@register(
    "q143_distribution_windows",
    """
    SELECT o_orderkey, o_orderpriority,
           ROUND(percent_rank() OVER w, 6) AS pr,
           ROUND(cume_dist() OVER w, 6) AS cd,
           CAST(ntile(10) OVER w AS BIGINT) AS decile
    FROM orders
    WHERE o_custkey < 200
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice, o_orderkey)
    """,
)
def q143_distribution_windows(spark, sf_dir):
    """Distribution window functions (percent_rank / cume_dist /
    ntile) per priority class — completes the window-function family
    beyond the q07/q70 ranking and q08/q71 analytic rows.  Unique
    (price, key) order keeps every engine's tie handling identical."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_custkey") < 200)
    w = Window.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey"
    )
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.percent_rank().over(w), 6).alias("pr"),
        F.round(F.cume_dist().over(w), 6).alias("cd"),
        F.ntile(10).over(w).cast("long").alias("decile"),
    )


@register(
    "q144_ordered_listagg",
    """
    SELECT o_orderpriority,
           string_agg(CAST(o_orderkey AS VARCHAR), ','
                      ORDER BY o_totalprice DESC, o_orderkey) AS top_keys
    FROM (
      SELECT * FROM (
        SELECT o_orderpriority, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_orderpriority
                                  ORDER BY o_totalprice DESC, o_orderkey)
                 AS rn
        FROM orders) WHERE rn <= 10)
    GROUP BY o_orderpriority
    """,
)
def q144_ordered_listagg(spark, sf_dir):
    """Deterministic ordered string aggregation: the 10 priciest order
    keys per priority, concatenated in (price desc, key) order — the
    report/export shape.  Spark side sorts structs inside the
    aggregated array (`array_sort` of (neg-price, key) structs), so the
    concatenation order is plan-independent — never a bare
    collect_list, whose order is partition-dependent."""
    o = _t(spark, sf_dir, "orders")
    top = R.top_k_per_group(
        o.select("o_orderpriority", "o_orderkey", "o_totalprice"),
        ["o_orderpriority"],
        [F.col("o_totalprice").desc(), F.col("o_orderkey")],
        10,
    )
    agged = top.groupBy("o_orderpriority").agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    (-F.col("o_totalprice")).alias("np"),
                    F.col("o_orderkey").alias("k"),
                )
            )
        ).alias("_s")
    )
    return agged.select(
        "o_orderpriority",
        F.array_join(
            F.transform(F.col("_s"), lambda s: s["k"].cast("string")), ","
        ).alias("top_keys"),
    )


@register(
    "q145_mad_outliers",
    """
    WITH med AS (
      SELECT l_returnflag, quantile_cont(l_extendedprice, 0.5) AS m
      FROM lineitem GROUP BY 1
    ),
    dev AS (
      SELECT l.l_returnflag, ABS(l_extendedprice - m.m) AS d, m.m
      FROM lineitem l JOIN med m USING (l_returnflag)
    ),
    mad AS (
      SELECT l_returnflag, ANY_VALUE(m) AS m,
             quantile_cont(d, 0.5) AS mad
      FROM dev GROUP BY l_returnflag
    )
    SELECT l.l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(ANY_VALUE(mad.m), 4) AS median,
           ROUND(ANY_VALUE(mad.mad), 4) AS mad,
           CAST(SUM(CASE WHEN ABS(l.l_extendedprice - mad.m)
                              > 3 * 1.4826 * mad.mad
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM lineitem l JOIN mad USING (l_returnflag)
    GROUP BY l.l_returnflag
    """,
)
def q145_mad_outliers(spark, sf_dir):
    """Robust outlier detection via median absolute deviation (the
    breakdown-resistant alternative to q115's IQR fences): two exact
    median aggs (group-tiny, broadcast back) + a scan-speed flagging
    pass with the 1.4826 normal-consistency factor."""
    li = _t(spark, sf_dir, "lineitem")
    med = li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_extendedprice, 0.5)").alias("m")
    )
    dev = li.join(F.broadcast(med), "l_returnflag")
    mad = dev.groupBy("l_returnflag").agg(
        F.any_value("m").alias("m"),
        F.expr("percentile(abs(l_extendedprice - m), 0.5)").alias("mad"),
    )
    out = li.join(F.broadcast(mad), "l_returnflag")
    return out.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.any_value("m"), 4).alias("median"),
        F.round(F.any_value("mad"), 4).alias("mad"),
        F.sum(
            (
                F.abs(F.col("l_extendedprice") - F.col("m"))
                > 3 * 1.4826 * F.col("mad")
            ).cast("long")
        ).alias("n_outliers"),
    )


@register(
    "q146_salted_skew_join",
    """
    WITH skewed AS (
      SELECT CASE WHEN l_orderkey % 10 < 7 THEN 1
                  ELSE l_orderkey % 100 END AS k,
             l_quantity
      FROM lineitem
    ),
    dim AS (SELECT DISTINCT o_orderkey % 100 AS k,
                   o_orderpriority
            FROM orders WHERE o_orderkey % 100 < 100)
    SELECT s.k, d.o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(s.l_quantity), 2) AS qty
    FROM skewed s JOIN dim d ON s.k = d.k
    GROUP BY s.k, d.o_orderpriority
    """,
)
def q146_salted_skew_join(spark, sf_dir):
    """Skew-resistant equi join: ~70% of the fact rows share ONE hot
    key — `salted_join` spreads it over 8 shuffle partitions (salt on
    the fact side, replicate the dim side) and must return rows
    identical to the plain join the oracle computes.  The explicit
    fallback for joins AQE's skew splitting can't rebalance."""
    li = _t(spark, sf_dir, "lineitem").select(
        F.when(F.col("l_orderkey") % 10 < 7, 1)
        .otherwise(F.col("l_orderkey") % 100)
        .alias("k"),
        "l_quantity",
    )
    dim = (
        _t(spark, sf_dir, "orders")
        .select(
            (F.col("o_orderkey") % 100).alias("k"), "o_orderpriority"
        )
        .distinct()
    )
    joined = R.salted_join(li, dim, ["k"], num_salts=8)
    return joined.groupBy("k", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_quantity"), 2).alias("qty"),
    )


@register(
    "q147_embedding_dim_stats",
    """
    SELECT CAST(i - 1 AS INTEGER) AS pos,
           ROUND(AVG(embedding[i]), 6) AS mean,
           ROUND(STDDEV_POP(embedding[i]), 6) AS std,
           ROUND(MIN(embedding[i]), 6) AS lo,
           ROUND(MAX(embedding[i]), 6) AS hi
    FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS t(i)
    GROUP BY i
    """,
)
def q147_embedding_dim_stats(spark, sf_dir):
    """Dimension-wise embedding distribution audit (mean/std/min/max
    per coordinate — the 'is dim 17 dead or exploding' check before
    ANN indexing): posexplode + one hash agg keyed on the dimension,
    map-side combinable, never a driver-side matrix."""
    e = _t(spark, sf_dir, "embeddings")
    ex = e.select(F.posexplode("embedding").alias("pos", "v"))
    return (
        ex.groupBy("pos")
        .agg(
            F.round(F.avg("v"), 6).alias("mean"),
            F.round(F.stddev_pop("v"), 6).alias("std"),
            F.round(F.min("v"), 6).alias("lo"),
            F.round(F.max("v"), 6).alias("hi"),
        )
    )


@register(
    "q148_centroid_similarity",
    """
    WITH c AS (
      SELECT label, i, AVG(embedding[i]) AS v
      FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS t(i)
      GROUP BY label, i
    ),
    pairs AS (
      SELECT a.label AS label_a, b.label AS label_b,
             SUM(a.v * b.v) AS dot,
             SQRT(SUM(a.v * a.v)) AS na, SQRT(SUM(b.v * b.v)) AS nb
      FROM c a JOIN c b ON a.i = b.i AND a.label < b.label
      GROUP BY a.label, b.label
    )
    SELECT label_a, label_b, ROUND(dot / (na * nb), 6) AS cosine
    FROM pairs
    """,
)
def q148_centroid_similarity(spark, sf_dir):
    """Pairwise cosine similarity between per-label embedding
    centroids (the cluster-overlap diagnostic on q95's output): the
    k×k matrix comes from a dimension-keyed join of the tiny centroid
    table with itself — the corpus is scanned ONCE for the centroids,
    never for the pairs."""
    e = _t(spark, sf_dir, "embeddings")
    c = (
        e.select("label", F.posexplode("embedding").alias("i", "v"))
        .groupBy("label", "i")
        .agg(F.avg("v").alias("v"))
    )
    a = c.select(
        F.col("label").alias("label_a"), "i", F.col("v").alias("va")
    )
    b = c.select(
        F.col("label").alias("label_b"), "i", F.col("v").alias("vb")
    )
    pairs = (
        a.join(b, ["i"])
        .filter(F.col("label_a") < F.col("label_b"))
        .groupBy("label_a", "label_b")
        .agg(
            F.sum(F.col("va") * F.col("vb")).alias("dot"),
            F.sqrt(F.sum(F.col("va") * F.col("va"))).alias("na"),
            F.sqrt(F.sum(F.col("vb") * F.col("vb"))).alias("nb"),
        )
    )
    return pairs.select(
        "label_a",
        "label_b",
        F.round(F.col("dot") / (F.col("na") * F.col("nb")), 6).alias(
            "cosine"
        ),
    )


@register(
    "q149_bigram_topk",
    r"""
    WITH ws AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(lower(text)), '\s+'),
                         w -> w <> '') AS w
      FROM documents
    ),
    bg AS (
      SELECT UNNEST(list_transform(range(1, len(w)),
                    i -> w[i] || ' ' || w[i + 1])) AS bigram
      FROM ws WHERE len(w) >= 2
    )
    SELECT bigram, CAST(COUNT(*) AS BIGINT) AS n
    FROM bg GROUP BY bigram
    ORDER BY n DESC, bigram LIMIT 25
    """,
)
def q149_bigram_topk(spark, sf_dir):
    """Corpus-wide top adjacent word pairs — ORDERED bigrams (q120's
    co-occurrence is unordered within-doc): the bigram list is built
    in-array with an index lambda (no self-join at all), then one
    explode + hash agg + TakeOrdered."""
    d = _t(spark, sf_dir, "documents")
    w = F.filter(
        F.split(F.trim(F.lower(F.col("text"))), "\\s+"),
        lambda x: x != "",
    )
    bg = d.select(w.alias("w")).filter(F.size("w") >= 2).select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("w") - 1),
                lambda i: F.concat(
                    F.element_at(F.col("w"), i),
                    F.lit(" "),
                    F.element_at(F.col("w"), i + 1),
                ),
            )
        ).alias("bigram")
    )
    return (
        bg.groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "bigram")
        .limit(25)
    )


@register(
    "q150_activity_heatmap",
    """
    WITH e AS (
      SELECT CAST(floor(epoch(ts)) AS BIGINT) AS es, value FROM events
    )
    SELECT CAST(((es // 86400) + 4) % 7 AS BIGINT) AS dow,
           CAST((es % 86400) // 3600 AS BIGINT) AS hour,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(value), 4) AS total_value
    FROM e GROUP BY 1, 2
    """,
)
def q150_activity_heatmap(spark, sf_dir):
    """Day-of-week × hour activity heatmap over the event stream —
    dow/hour derived ARITHMETICALLY from the epoch (1970-01-01 was a
    Thursday, hence the +4), sidestepping the engines' incompatible
    dayofweek conventions; one hash agg over 168 cells."""
    e = _t(spark, sf_dir, "events")
    es = F.col("ts").cast("long")
    return (
        e.select(
            ((F.floor(es / 86400) + 4) % 7).cast("long").alias("dow"),
            ((es % 86400) / 3600).cast("long").alias("hour"),
            "value",
        )
        .groupBy("dow", "hour")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
    )


@register("q151_image_decode", None)  # binary codec — not SQL-expressible
def q151_image_decode(spark, sf_dir):
    """REAL image decode end-to-end: synthesize deterministic PNG
    payloads (stdlib encoder) in one mapInPandas stage, then decode +
    feature-extract them with ``extract_image_features(fake=False)`` —
    the stdlib zlib/numpy PNG decoder in `functions/codecs.py`.  Unlike
    q55 (stand-in decoder, plumbing only), every byte here moves through
    a genuine codec.  Deterministic, so the driver's rows-only check is
    stable; pixel-exact value checks live in
    tests/test_multimodal_codecs.py."""
    import numpy as np  # worker-side
    import pandas as pd

    from graphmapreduce_spark.functions import codecs as C
    from graphmapreduce_spark.operators import multimodal as M

    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 64)

    def encode(batches):
        for pdf in batches:
            ids = pdf["doc_id"].tolist()
            payloads = []
            for i in ids:
                # gradient image whose mean intensity encodes doc_id
                arr = (
                    (np.arange(8)[:, None] + np.arange(12)[None, :] + i * 3)
                    % 256
                ).astype(np.uint8)
                payloads.append(C.encode_png(arr, filter_type=i % 5))
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    media = d.select("doc_id").mapInPandas(
        encode, schema="media_id long, payload binary"
    )
    feats = M.extract_image_features(media, n_features=4)
    return feats.select(
        "media_id",
        F.round(F.col("features")[0], 6).alias("f_mean"),
        F.round(F.col("features")[1], 6).alias("f_std"),
    )


@register("q152_audio_decode", None)  # binary codec — not SQL-expressible
def q152_audio_decode(spark, sf_dir):
    """REAL audio decode end-to-end: synthesize deterministic PCM-WAV
    sine clips (stdlib wave encoder), then decode + frame-analyze with
    ``extract_audio_features(fake=False)`` — RMS and zero-crossing rate
    over genuinely decoded samples.  Analytic value checks (rms ≈
    amp/√2, zcr ≈ 2f/sr) live in tests/test_multimodal_codecs.py."""
    import numpy as np
    import pandas as pd

    from graphmapreduce_spark.functions import codecs as C
    from graphmapreduce_spark.operators import multimodal as M

    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 32)

    def encode(batches):
        sr = 8000
        t = np.arange(sr // 4) / sr  # 250 ms clips
        for pdf in batches:
            ids = pdf["doc_id"].tolist()
            rows = []
            for i in ids:
                freq = 100 + 50 * (i % 8)
                amp = 0.2 + 0.1 * (i % 5)
                wav = C.encode_wav(amp * np.sin(2 * np.pi * freq * t), sr)
                rows.append((i, wav, 250))
            yield pd.DataFrame(
                rows, columns=["media_id", "payload", "duration_ms"]
            )

    media = d.select("doc_id").mapInPandas(
        encode, schema="media_id long, payload binary, duration_ms long"
    )
    feats = M.extract_audio_features(media, frame_ms=25)
    return feats.select(
        "media_id",
        "n_samples",
        "n_frames",
        F.round("rms_mean", 6).alias("rms_mean"),
        F.round("zcr_mean", 6).alias("zcr_mean"),
    )


@register(
    "q153_hashed_ngram_classifier",
    r"""
    WITH ws AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(lower(text)), '\s+'),
                         w -> w <> '') AS w
      FROM documents
    ),
    g AS (
      SELECT doc_id,
             w || CASE WHEN len(w) >= 2
                  THEN list_transform(range(1, len(w)),
                                      i -> w[i] || ' ' || w[i + 1])
                  ELSE [] END AS grams
      FROM ws
    ),
    s AS (
      SELECT doc_id, grams,
             list_sum(list_transform(grams, x ->
               ((('0x' || substr(md5(x), 1, 15))::BIGINT % 4096)
                 * 2654435761 + 42) % 10007 / 10007.0 - 0.5)) AS total
      FROM g
    )
    SELECT doc_id,
           ROUND(1.0 / (1.0 + EXP(-(CASE WHEN len(grams) > 0
                 THEN COALESCE(total, 0) / len(grams) ELSE 0 END))), 6)
             AS score
    FROM s
    """,
)
def q153_hashed_ngram_classifier(spark, sf_dir):
    """Hashing-trick linear classifier inference (fastText scoring
    shape): unigram+bigram features hashed to 4096 buckets, arithmetic
    weight lookup, mean-pool, sigmoid — one codegen expression, zero
    shuffles, zero UDFs.  The seeded weight table is embedded in both
    engines, so the whole inference path is value-oracled."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.round(T.hashed_ngram_score("text", num_buckets=4096, seed=42), 6)
        .alias("score"),
    )


@register(
    "q154_temperature_sample",
    """
    WITH c AS (
      SELECT lang, CAST(COUNT(*) AS DOUBLE) AS ng
      FROM documents GROUP BY lang
    ),
    m AS (SELECT MAX(ng) AS nmax FROM c),
    r AS (
      SELECT lang, LEAST(1.0, 0.5 * POW(ng / nmax, 0.5 - 1.0)) AS pg
      FROM c, m
    )
    SELECT d.doc_id, d.lang
    FROM documents d JOIN r USING (lang)
    WHERE (('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || ':0'), 1, 15))
             ::BIGINT % 1000000) / 1000000.0 < pg
    """,
)
def q154_temperature_sample(spark, sf_dir):
    """Temperature-scaled mixture resampling over the language column
    (alpha=0.5 flattens the en-heavy mixture toward the tail languages;
    the largest language keeps base_rate=0.5).  Draw-for-draw md5
    oracle — every kept row matches."""
    d = _t(spark, sf_dir, "documents")
    out = SMP.temperature_sample(
        d, "doc_id", "lang", alpha=0.5, base_rate=0.5, hash_fn="md5"
    )
    return out.select("doc_id", "lang")


@register(
    "q155_unigram_surprisal",
    r"""
    WITH tok AS (
      SELECT doc_id, UNNEST(list_filter(
               string_split_regex(trim(lower(text)), '\s+'),
               w -> w <> '')) AS w
      FROM documents
    ),
    v AS (SELECT w, COUNT(*) AS cnt FROM tok GROUP BY w),
    t AS (SELECT CAST(SUM(cnt) AS DOUBLE) AS n FROM v)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           ROUND(AVG(-LN(cnt / n)), 6) AS surprisal
    FROM tok JOIN v USING (w), t
    GROUP BY doc_id
    """,
)
def q155_unigram_surprisal(spark, sf_dir):
    """Corpus-unigram-LM surprisal per document — the CCNet-style
    perplexity quality filter with the corpus as its own LM.  Vocab agg
    + broadcast-scalar N + per-doc agg; fully value-oracled."""
    from graphmapreduce_spark.operators import quality as Q

    d = _t(spark, sf_dir, "documents")
    return Q.unigram_surprisal(d, "doc_id", "text")


@register(
    "q156_pmi",
    r"""
    WITH dw AS (
      SELECT DISTINCT doc_id, term FROM (
        SELECT doc_id, UNNEST(list_filter(
          string_split_regex(trim(text), '\s+'), x -> x <> '')) AS term
        FROM documents WHERE doc_id < 400)
      WHERE length(term) >= 4
    ),
    n AS (SELECT CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS nd FROM dw),
    df AS (SELECT term, count(*) AS d FROM dw GROUP BY term),
    keep AS (SELECT term, d FROM df WHERE d BETWEEN 5 AND 320),
    dk AS (SELECT dw.doc_id, dw.term FROM dw JOIN keep USING (term)),
    pairs AS (
      SELECT a.term AS term_a, b.term AS term_b,
             CAST(count(*) AS BIGINT) AS support
      FROM dk a JOIN dk b ON a.doc_id = b.doc_id AND a.term < b.term
      GROUP BY 1, 2 HAVING count(*) >= 8
    )
    SELECT term_a, term_b, support,
           ROUND(LN(support * nd / (ka.d * kb.d)), 6) AS pmi
    FROM pairs
    JOIN keep ka ON ka.term = term_a
    JOIN keep kb ON kb.term = term_b, n
    ORDER BY pmi DESC, term_a, term_b LIMIT 25
    """,
)
def q156_pmi(spark, sf_dir):
    """Pointwise mutual information over within-document co-occurrence —
    the association statistic behind embedding-era collocation mining
    (word2vec's implicit factorization target).  Same scale hygiene as
    q120 (document-frequency band before the within-doc self-join, so a
    corpus-wide term cannot go quadratic), then PMI = ln(n_ab·N /
    (n_a·n_b)) from one broadcast df-table join; TakeOrdered top-k."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 400)
    dw = (
        d.select("doc_id", F.explode(T.words("text")).alias("term"))
        .filter(F.length("term") >= 4)
        .distinct()
        .localCheckpoint(eager=False)
    )
    nd = dw.agg(
        F.countDistinct("doc_id").cast("double").alias("nd")
    )
    keep = (
        dw.groupBy("term")
        .agg(F.count(F.lit(1)).alias("d"))
        .filter((F.col("d") >= 5) & (F.col("d") <= 320))
    )
    dk = dw.join(F.broadcast(keep.select("term")), "term").localCheckpoint(
        eager=False
    )
    pairs = (
        dk.alias("a")
        .join(
            dk.alias("b"),
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("a.term") < F.col("b.term")),
        )
        .groupBy(
            F.col("a.term").alias("term_a"), F.col("b.term").alias("term_b")
        )
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= 8)
    )
    scored = (
        pairs.join(
            F.broadcast(
                keep.select(F.col("term").alias("term_a"), F.col("d").alias("da"))
            ),
            "term_a",
        )
        .join(
            F.broadcast(
                keep.select(F.col("term").alias("term_b"), F.col("d").alias("db"))
            ),
            "term_b",
        )
        .crossJoin(F.broadcast(nd))
        .select(
            "term_a",
            "term_b",
            "support",
            F.round(
                F.log(
                    F.col("support") * F.col("nd") / (F.col("da") * F.col("db"))
                ),
                6,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(
        F.desc("pmi"), F.asc("term_a"), F.asc("term_b")
    ).limit(25)


@register(
    "q157_linear_interp",
    """
    WITH e AS (
      SELECT user_id AS k, CAST(floor(epoch(ts)) AS BIGINT) AS t, value
      FROM events WHERE user_id < 50
    ),
    obs AS (
      SELECT k, t, MAX(value) AS v, 1 AS o FROM e GROUP BY k, t
    ),
    bounds AS (SELECT k, (MIN(t) // 3600) * 3600 AS lo,
                      (MAX(t) // 3600) * 3600 AS hi
               FROM obs GROUP BY k),
    grid AS (SELECT k, g AS t, NULL::DOUBLE AS v, 0 AS o
             FROM bounds, UNNEST(range(lo, hi + 1, 3600)) AS s(g)),
    u AS (SELECT * FROM obs UNION ALL SELECT * FROM grid),
    w AS (
      SELECT k, t, o,
        last_value(CASE WHEN o = 1 THEN t END IGNORE NULLS)
          OVER (PARTITION BY k ORDER BY t, o DESC
                ROWS UNBOUNDED PRECEDING) AS pt,
        last_value(CASE WHEN o = 1 THEN v END IGNORE NULLS)
          OVER (PARTITION BY k ORDER BY t, o DESC
                ROWS UNBOUNDED PRECEDING) AS pv,
        first_value(CASE WHEN o = 1 THEN t END IGNORE NULLS)
          OVER (PARTITION BY k ORDER BY t, o ASC
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt,
        first_value(CASE WHEN o = 1 THEN v END IGNORE NULLS)
          OVER (PARTITION BY k ORDER BY t, o ASC
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv
      FROM u
    )
    SELECT k AS user_id, t AS bucket_start,
           ROUND(CASE WHEN pt IS NULL OR nt IS NULL THEN NULL
                      WHEN nt = pt THEN pv
                      ELSE pv + (nv - pv) * (t - pt) / (nt - pt)
                 END, 6) AS value
    FROM w WHERE o = 0
    """,
)
def q157_linear_interp(spark, sf_dir):
    """Hourly linear-interpolation resampling of the event series —
    `resample_interpolate`: one keyed shuffle carries both bracketing
    windows; the whole union+window+arithmetic pipeline is replicated
    in the oracle."""
    e = _t(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    return TS.resample_interpolate(e, "user_id", "ts", "value", 3600)


@register(
    "q158_containment_join",
    """
    WITH sh AS (
      SELECT doc_id, list_distinct(list_transform(
               range(1, GREATEST(length(text) - 2, 0) + 1),
               i -> substr(text, i, 3))) AS grams
      FROM documents WHERE doc_id < 100
    ),
    inv AS (SELECT doc_id, UNNEST(grams) AS g FROM sh),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
      FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           ROUND(CAST(i AS DOUBLE) / len(sa.grams), 6) AS cont_a_in_b,
           ROUND(CAST(i AS DOUBLE) / len(sb.grams), 6) AS cont_b_in_a
    FROM inter
    JOIN sh sa ON sa.doc_id = id_a
    JOIN sh sb ON sb.doc_id = id_b
    WHERE CAST(i AS DOUBLE) / len(sa.grams) >= 0.8
       OR CAST(i AS DOUBLE) / len(sb.grams) >= 0.8
    """,
)
def q158_containment_join(spark, sf_dir):
    """n-gram containment join (|A∩B|/|A|, both directions) — the
    asymmetric quote/excerpt/contamination detector where symmetric
    Jaccard under-fires because the union is dominated by the longer
    document.  Same inverted-index plan as q45."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return D.ngram_containment_pairs(
        d, "doc_id", "text", n=3, threshold=0.8, max_df=None
    )


@register(
    "q161_prefix_jaccard",
    """
    WITH sh AS (
      SELECT doc_id, list_distinct(list_transform(
               range(1, GREATEST(length(text) - 2, 0) + 1),
               i -> substr(text, i, 3))) AS grams
      FROM documents WHERE doc_id < 150
    ),
    inv AS (SELECT doc_id, UNNEST(grams) AS g FROM sh),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
      FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           ROUND(CAST(i AS DOUBLE) /
                 (len(sa.grams) + len(sb.grams) - i), 6) AS jaccard
    FROM inter
    JOIN sh sa ON sa.doc_id = id_a
    JOIN sh sb ON sb.doc_id = id_b
    WHERE CAST(i AS DOUBLE) / (len(sa.grams) + len(sb.grams) - i) >= 0.5
    """,
)
def q161_prefix_jaccard(spark, sf_dir):
    """PPJoin prefix-filtered exact Jaccard join (Xiao et al. WWW'08):
    only each doc's rarest |A|−⌈t·|A|⌉+1 shingles are indexed; the
    oracle is the PLAIN full-inverted-index SQL, so the value check
    PROVES the prefix filter is lossless on real data."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 150)
    return D.ngram_jaccard_pairs_prefix(
        d, "doc_id", "text", n=3, threshold=0.5
    )


@register(
    "q160_asof_tolerance",
    """
    SELECT p.event_id, p.user_id,
           CASE WHEN c.ts IS NOT NULL
                 AND epoch(p.ts) - epoch(c.ts) <= 600
                THEN c.value END AS last_click_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND c.ts <= p.ts
    """,
)
def q160_asof_tolerance(spark, sf_dir):
    """As-of join with a match tolerance (pandas merge_asof parity):
    the most recent click within 10 minutes of each purchase — stale
    matches null out exactly as if absent.  Same single-shuffle
    union+window plan as q22 with one extra carried column."""
    e = _t(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase")
    c = e.filter(F.col("event_type") == "click").withColumnRenamed(
        "value", "last_click_value"
    )
    out = asof_join(
        p, c, on="user_id", left_ts="ts", right_ts="ts",
        value_cols=["last_click_value"], direction="backward", tolerance=600,
    )
    return out.select("event_id", "user_id", "last_click_value")


def _weighted_pagerank_oracle_sql(
    n_iter: int = 10, d: float = 0.85, k: int = 500
) -> str:
    """Unrolled WEIGHTED power iteration: contrib = rank·w/strength,
    edge weight = pair multiplicity in lineitem (repeat interactions)."""
    pre = f"""
    WITH e AS MATERIALIZED (
      SELECT l_orderkey % {k} AS src, l_partkey % {k} AS dst,
             COUNT(*)::DOUBLE AS w
      FROM lineitem WHERE l_orderkey % {k} <> l_partkey % {k}
      GROUP BY 1, 2
    ),
    v AS MATERIALIZED (SELECT src AS id FROM e UNION SELECT dst AS id FROM e),
    stg AS MATERIALIZED (
      SELECT src AS id, SUM(w) AS s FROM e GROUP BY src),
    nn AS MATERIALIZED (SELECT COUNT(*)::DOUBLE AS n FROM v),
    r0 AS MATERIALIZED (SELECT id, 1.0/(SELECT n FROM nn) AS rank FROM v)
    """
    its = []
    for i in range(1, n_iter + 1):
        p = f"r{i - 1}"
        its.append(f"""
    r{i} AS MATERIALIZED (
      SELECT v.id,
             (1-{d})/(SELECT n FROM nn)
             + {d} * (SELECT COALESCE(SUM(r.rank),0) FROM {p} r
                      LEFT JOIN stg dg ON dg.id = r.id WHERE dg.id IS NULL)
                   / (SELECT n FROM nn)
             + {d} * COALESCE(s.in_sum, 0) AS rank
      FROM v
      LEFT JOIN (SELECT e.dst AS id, SUM(r.rank * e.w / dg.s) AS in_sum
                 FROM e JOIN {p} r ON r.id = e.src
                        JOIN stg dg ON dg.id = e.src
                 GROUP BY e.dst) s ON s.id = v.id
    )""")
    return (
        pre + "," + ",".join(its)
        + f"\n    SELECT id, ROUND(rank, 6) AS rank FROM r{n_iter}"
    )


@register("q159_weighted_pagerank", _weighted_pagerank_oracle_sql())
def q159_weighted_pagerank(spark, sf_dir):
    """WEIGHTED PageRank — rank distributed over out-edges proportional
    to edge weight (pair multiplicity), the natural mode for the
    reference's weighted-adjacency graph format (graph.h adjwgt).
    Oracle: the same 10 weighted power iterations unrolled as SQL CTEs."""
    li = _t(spark, sf_dir, "lineitem")
    e = (
        li.select(
            (F.col("l_orderkey") % 500).alias("src"),
            (F.col("l_partkey") % 500).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("double").alias("weight"))
    )
    g = PropertyGraph.from_edges(e)
    pr = alg.pagerank(
        g,
        damping=0.85,
        max_iter=10,
        threshold=1e-8,
        check_interval=5,
        weighted=True,
    )
    return pr.select("id", F.round("rank", 6).alias("rank"))


def _hits_oracle_sql(n_iter: int = 8, k: int = 500) -> str:
    """Unrolled Kleinberg iterations: auth ← Σ in-hub, L2-normalize,
    hub ← Σ out-auth, L2-normalize — norms as scalar subqueries over the
    raw sums (zeros contribute nothing, so raw == padded norm)."""
    pre = f"""
    WITH e AS MATERIALIZED (
      SELECT DISTINCT l_orderkey % {k} AS src, l_partkey % {k} AS dst
      FROM lineitem WHERE l_orderkey % {k} <> l_partkey % {k}
    ),
    v AS MATERIALIZED (SELECT src AS id FROM e UNION SELECT dst AS id FROM e),
    h0 AS MATERIALIZED (SELECT id, 1.0 AS h FROM v)"""
    its = []
    for i in range(1, n_iter + 1):
        its.append(f"""
    a{i}r AS MATERIALIZED (
      SELECT e.dst AS id, SUM(p.h) AS a
      FROM e JOIN h{i - 1} p ON p.id = e.src GROUP BY e.dst),
    a{i} AS MATERIALIZED (
      SELECT v.id, COALESCE(r.a, 0) / (SELECT sqrt(SUM(a*a)) FROM a{i}r) AS a
      FROM v LEFT JOIN a{i}r r ON r.id = v.id),
    h{i}r AS MATERIALIZED (
      SELECT e.src AS id, SUM(p.a) AS h
      FROM e JOIN a{i} p ON p.id = e.dst GROUP BY e.src),
    h{i} AS MATERIALIZED (
      SELECT v.id, COALESCE(r.h, 0) / (SELECT sqrt(SUM(h*h)) FROM h{i}r) AS h
      FROM v LEFT JOIN h{i}r r ON r.id = v.id)""")
    return (
        pre + "," + ",".join(its)
        + f"""
    SELECT a.id, ROUND(a.a, 6) AS auth, ROUND(h.h, 6) AS hub
    FROM a{n_iter} a JOIN h{n_iter} h ON h.id = a.id"""
    )


@register("q162_hits", _hits_oracle_sql())
def q162_hits(spark, sf_dir):
    """HITS hubs & authorities — the reference's PageRank dataflow
    (algorithms.h:4-37) with two message exchanges per superstep and an
    in-plan broadcast L2 normalizer.  Oracle: the same 8 Kleinberg
    iterations unrolled as SQL CTEs."""
    g = _mod_graph(spark, sf_dir, 500)
    out = alg.hits(g, max_iter=8)
    return out.select(
        "id", F.round("auth", 6).alias("auth"), F.round("hub", 6).alias("hub")
    )


def _closeness_oracle_sql(
    sources: tuple[int, ...] = (0, 1, 2), mod: int = 500, depth: int = 8
) -> str:
    """Per-source unrolled min-dist BFS (same frontier algebra as
    _harmonic_oracle_sql), collapsed to reached-count / distance-sum."""
    pre = f"""
    WITH e AS MATERIALIZED (
      SELECT DISTINCT l_orderkey % {mod} AS src, l_partkey % {mod} AS dst
      FROM lineitem WHERE l_orderkey % {mod} <> l_partkey % {mod})"""
    blocks, finals = [], []
    for s in sources:
        blocks.append(f"""
    s{s}d0 AS (SELECT CAST({s} AS BIGINT) AS id, 0 AS dist)""")
        for i in range(1, depth + 1):
            p = f"s{s}d{i - 1}"
            blocks.append(f"""
    s{s}d{i} AS MATERIALIZED (
      SELECT id, min(dist) AS dist FROM (
        SELECT id, dist FROM {p}
        UNION ALL
        SELECT e.dst AS id, p.dist + 1 AS dist
        FROM e JOIN {p} p ON p.id = e.src
      ) GROUP BY id)""")
        finals.append(
            f"SELECT id, dist FROM s{s}d{depth} WHERE dist > 0"
        )
    return (
        pre
        + ","
        + ",".join(blocks)
        + f"""
    SELECT id, COUNT(*)::BIGINT AS n_reached, SUM(dist)::BIGINT AS total_dist,
           ROUND(COUNT(*)::DOUBLE / SUM(dist), 6) AS closeness
    FROM ({" UNION ALL ".join(finals)}) GROUP BY id"""
    )


@register("q163_closeness_centrality", _closeness_oracle_sql())
def q163_closeness_centrality(spark, sf_dir):
    """Sampled closeness centrality from 3 fixed seed sources — one
    frontier-filtered BFS per source over the shared cached edge table
    (harmonic_centrality's dataflow, distance-sum collapse)."""
    g = _mod_graph(spark, sf_dir)
    out = alg.closeness_centrality(g, [0, 1, 2])
    return out.select(
        "id",
        "n_reached",
        F.col("total_dist").cast("long").alias("total_dist"),
        F.round("closeness", 6).alias("closeness"),
    )


@register(
    "q164_gaps_islands",
    """
    WITH d AS (
      SELECT DISTINCT user_id,
             CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS b
      FROM events
    ),
    r AS (
      SELECT user_id, b,
             b - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY b) AS a
      FROM d
    )
    SELECT user_id, MIN(b) AS island_start, MAX(b) AS island_end,
           COUNT(*)::BIGINT AS n_buckets
    FROM r GROUP BY user_id, a
    """,
)
def q164_gaps_islands(spark, sf_dir):
    """Gaps-and-islands: maximal runs of consecutive activity days per
    user — distinct, anchor window, and hash agg all on the one user_id
    partitioning (`relational.gaps_islands`)."""
    e = _t(spark, sf_dir, "events")
    days = e.select(
        "user_id",
        F.floor(F.col("ts").cast("long") / 86400).cast("long").alias("day"),
    )
    return R.gaps_islands(days, "user_id", "day")


@register(
    "q165_skyline",
    """
    SELECT p_partkey, p_retailprice, p_size
    FROM part r
    WHERE NOT EXISTS (
      SELECT 1 FROM part s
      WHERE s.p_retailprice <= r.p_retailprice AND s.p_size >= r.p_size
        AND (s.p_retailprice < r.p_retailprice OR s.p_size > r.p_size))
    """,
)
def q165_skyline(spark, sf_dir):
    """2-D Pareto frontier (cheapest-price / largest-size parts).  The
    oracle is the textbook quadratic NOT-EXISTS; the Spark plan is the
    scale path — per-price hash agg, cummax over the collapsed distinct
    values, broadcast semi-join back (`relational.skyline_2d`)."""
    p = _t(spark, sf_dir, "part").select(
        "p_partkey", "p_retailprice", "p_size"
    )
    return R.skyline_2d(p, "p_retailprice", "p_size")


@register(
    "q166_group_mode",
    """
    WITH c AS (
      SELECT p_type, p_brand, COUNT(*)::BIGINT AS n
      FROM part GROUP BY 1, 2
    ),
    r AS (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY p_type ORDER BY n DESC, p_brand ASC) AS rn
      FROM c
    )
    SELECT p_type, p_brand AS mode, n FROM r WHERE rn = 1
    """,
)
def q166_group_mode(spark, sf_dir):
    """Per-group modal value with deterministic tiebreak (count desc,
    value asc) — count-then-rank so the window sees the collapsed
    group×value table, not the raw rows (`relational.group_mode`)."""
    p = _t(spark, sf_dir, "part")
    return R.group_mode(p, ["p_type"], "p_brand")


@register(
    "q167_dup_ngram_spans",
    r"""
    WITH ws AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(lower(text)), '\s+'),
                         w -> w <> '') AS w
      FROM documents
    ),
    gp AS (
      SELECT doc_id,
             UNNEST(list_transform(range(1, len(w) - 8 + 2),
               i -> ('0x' || substr(md5(
                      array_to_string(list_slice(w, i, i + 7), ' ')),
                      1, 15))::BIGINT)) AS g
      FROM ws WHERE len(w) >= 8
    ),
    cnt AS (SELECT g, COUNT(*) AS c FROM gp GROUP BY g)
    SELECT gp.doc_id AS id, COUNT(*)::BIGINT AS n_grams,
           SUM(CASE WHEN cnt.c >= 2 THEN 1 ELSE 0 END)::BIGINT AS n_dup,
           ROUND(SUM(CASE WHEN cnt.c >= 2 THEN 1 ELSE 0 END)::DOUBLE
                 / COUNT(*), 6) AS dup_ratio
    FROM gp JOIN cnt USING (g)
    GROUP BY gp.doc_id
    """,
)
def q167_dup_ngram_spans(spark, sf_dir):
    """Substring-level duplication profile (Lee et al. span-dedup
    signal): per document, the fraction of word-8-gram positions whose
    gram repeats corpus-wide.  Positions kept via posexplode-style
    in-array build; md5-60bit gram keys so the count/join shuffles carry
    longs (`dedup.duplicate_ngram_spans`)."""
    d = _t(spark, sf_dir, "documents")
    return D.duplicate_ngram_spans(d, "doc_id", "text", n=8, min_count=2)


def _brandes_oracle_blocks(
    sources: tuple[int, ...], mod: int, depth: int
) -> tuple[str, list]:
    """Shared CTE scaffolding for the two Brandes oracles: per source
    the forward level/σ BFS (anti-join via NOT IN over the accumulated
    visited set) and the backward dependency sweep
    δ(v)=Σ σv/σw·(1+δw) as one LEFT-JOIN agg per level, deepest
    first."""
    pre = f"""
    WITH e AS MATERIALIZED (
      SELECT DISTINCT l_orderkey % {mod} AS src, l_partkey % {mod} AS dst
      FROM lineitem WHERE l_orderkey % {mod} <> l_partkey % {mod})"""
    blocks = []
    for s in sources:
        blocks.append(f"""
    s{s}f0 AS (SELECT CAST({s} AS BIGINT) AS id, 1.0 AS sigma),
    s{s}vis0 AS (SELECT id FROM s{s}f0)""")
        for l in range(1, depth + 1):
            blocks.append(f"""
    s{s}f{l} AS MATERIALIZED (
      SELECT e.dst AS id, SUM(p.sigma) AS sigma
      FROM e JOIN s{s}f{l - 1} p ON p.id = e.src
      WHERE e.dst NOT IN (SELECT id FROM s{s}vis{l - 1})
      GROUP BY e.dst),
    s{s}vis{l} AS MATERIALIZED (
      SELECT id FROM s{s}vis{l - 1} UNION SELECT id FROM s{s}f{l})""")
        blocks.append(f"""
    s{s}d{depth} AS (SELECT id, sigma, 0.0 AS delta FROM s{s}f{depth})""")
        for l in range(depth - 1, -1, -1):
            blocks.append(f"""
    s{s}d{l} AS MATERIALIZED (
      SELECT p.id, p.sigma,
             COALESCE(SUM(p.sigma / w.sigma * (1 + w.delta)), 0) AS delta
      FROM s{s}f{l} p
      LEFT JOIN e ON e.src = p.id
      LEFT JOIN s{s}d{l + 1} w ON w.id = e.dst
      GROUP BY p.id, p.sigma)""")
    return pre + "," + ",".join(blocks), list(sources)


def _betweenness_oracle_sql(
    sources: tuple[int, ...] = (0, 1, 2), mod: int = 500, depth: int = 8
) -> str:
    body, srcs = _brandes_oracle_blocks(sources, mod, depth)
    finals = [
        f"SELECT id, delta FROM s{s}d{l}"
        for s in srcs
        for l in range(1, depth + 1)
    ]
    return (
        body
        + f"""
    SELECT id, ROUND(SUM(delta), 6) AS betweenness
    FROM ({" UNION ALL ".join(finals)}) GROUP BY id"""
    )


def _edge_betweenness_oracle_sql(
    sources: tuple[int, ...] = (0, 1, 2), mod: int = 500, depth: int = 8
) -> str:
    """Per-edge dependency terms σ(src)/σ(dst)·(1+δ(dst)) of the same
    unrolled sweep, summed over sources and level transitions."""
    body, srcs = _brandes_oracle_blocks(sources, mod, depth)
    finals = [
        f"""SELECT e.src, e.dst,
            p.sigma / w.sigma * (1 + w.delta) AS c
            FROM s{s}f{l} p
            JOIN e ON e.src = p.id
            JOIN s{s}d{l + 1} w ON w.id = e.dst"""
        for s in srcs
        for l in range(0, depth)
    ]
    return (
        body
        + f"""
    SELECT src, dst, ROUND(SUM(c), 6) AS betweenness
    FROM ({" UNION ALL ".join(finals)}) GROUP BY src, dst"""
    )


@register("q168_betweenness", _betweenness_oracle_sql())
def q168_betweenness(spark, sf_dir):
    """Sampled Brandes betweenness from 3 fixed seed sources — forward
    σ-carrying BFS + backward per-level dependency sweep, all joins and
    hash aggs over the shared cached edge table.  Oracle: the same two
    phases unrolled per source as SQL CTEs."""
    g = _mod_graph(spark, sf_dir)
    out = alg.betweenness_centrality(g, [0, 1, 2])
    return out.select("id", F.round("betweenness", 6).alias("betweenness"))


@register(
    "q169_bipartite_projection",
    """
    WITH e AS (
      SELECT DISTINCT l_suppkey AS s, l_partkey AS p FROM lineitem
    ),
    ok AS (SELECT p FROM e GROUP BY p HAVING COUNT(*) <= 1000),
    pe AS (SELECT s, e.p FROM e JOIN ok USING (p))
    SELECT a.s AS a, b.s AS b, COUNT(*)::BIGINT AS common
    FROM pe a JOIN pe b ON a.p = b.p AND a.s < b.s
    GROUP BY 1, 2
    """,
)
def q169_bipartite_projection(spark, sf_dir):
    """Bipartite supplier–part graph projected onto suppliers (pairs
    weighted by shared parts) — inverted-index self-join on the part
    key with the hub-part df cap exercised in-plan (1000 exceeds any
    sf0.01 part df, so the oracle stays uncapped-equivalent)."""
    li = _t(spark, sf_dir, "lineitem")
    e = li.select(
        F.col("l_suppkey").alias("src"), F.col("l_partkey").alias("dst")
    )
    return alg.bipartite_project(e, max_df=1000)


@register(
    "q170_bigram_surprisal",
    r"""
    WITH ws AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(lower(text)), '\s+'),
                         w -> w <> '') AS w
      FROM documents
    ),
    tok AS (SELECT UNNEST(w) AS t FROM ws),
    v AS (SELECT COUNT(DISTINCT t)::DOUBLE AS v FROM tok),
    bgp AS (
      SELECT doc_id,
             UNNEST(list_transform(range(1, len(w)),
                    i -> w[i] || ' ' || w[i + 1])) AS b
      FROM ws WHERE len(w) >= 2
    ),
    bg AS (
      SELECT doc_id, split_part(b, ' ', 1) AS w1,
             split_part(b, ' ', 2) AS w2
      FROM bgp
    ),
    cb AS (SELECT w1, w2, COUNT(*)::DOUBLE AS cb FROM bg GROUP BY 1, 2),
    cl AS (SELECT w1, COUNT(*)::DOUBLE AS cl FROM bg GROUP BY 1)
    SELECT bg.doc_id, COUNT(*)::BIGINT AS n_bigrams,
           ROUND(AVG(-ln((cb.cb + 1.0) / (cl.cl + (SELECT v FROM v)))), 6)
             AS surprisal
    FROM bg JOIN cb USING (w1, w2) JOIN cl USING (w1)
    GROUP BY bg.doc_id
    """,
)
def q170_bigram_surprisal(spark, sf_dir):
    """Add-1-smoothed bigram-LM surprisal per document — the KenLM
    perplexity-filter shape one n-gram up from q155; bigram stream
    built in-array, two Zipf-bounded count aggs, scalar V broadcast
    (`quality.bigram_surprisal`)."""
    from graphmapreduce_spark.operators import quality as Q

    d = _t(spark, sf_dir, "documents")
    return Q.bigram_surprisal(d, "doc_id", "text", k=1.0)


@register(
    "q171_equi_depth_histogram",
    """
    WITH r AS (
      SELECT l_extendedprice AS v,
             NTILE(10) OVER (ORDER BY l_extendedprice, l_orderkey,
                             l_linenumber) AS bucket
      FROM lineitem)
    SELECT bucket::BIGINT AS bucket, COUNT(*)::BIGINT AS n,
           MIN(v) AS lo, MAX(v) AS hi
    FROM r GROUP BY bucket
    """,
)
def q171_equi_depth_histogram(spark, sf_dir):
    """Exact equal-frequency histogram with NTILE semantics — computed
    from `sort.global_rank` (range partition + per-partition row_number
    + offset fold-in), so the complement of q112's equal-WIDTH histogram
    never runs a single-partition window.  Tiebreak columns make the
    order total, so bucket boundaries are engine-identical."""
    from graphmapreduce_spark.operators import sort as GS

    li = _t(spark, sf_dir, "lineitem")
    out = GS.equi_depth_histogram(
        li.select("l_extendedprice", "l_orderkey", "l_linenumber"),
        "l_extendedprice",
        ["l_orderkey", "l_linenumber"],
        buckets=10,
    )
    return out.select("bucket", "n", "lo", "hi")


@register(
    "q172_weighted_median",
    """
    WITH c AS (
      SELECT l_returnflag, l_quantity AS v, SUM(l_extendedprice) AS w
      FROM lineitem GROUP BY 1, 2
    ),
    r AS (
      SELECT l_returnflag, v,
             SUM(w) OVER (PARTITION BY l_returnflag ORDER BY v
                          ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(w) OVER (PARTITION BY l_returnflag) AS tot
      FROM c)
    SELECT l_returnflag, MIN(v) AS wmedian
    FROM r WHERE cum * 2 >= tot GROUP BY 1
    """,
)
def q172_weighted_median(spark, sf_dir):
    """Revenue-weighted median quantity per return flag — lower weighted
    median via collapse-then-cumulate: the window walks distinct values
    on the group-key partitioning (`relational.weighted_median`)."""
    li = _t(spark, sf_dir, "lineitem")
    return R.weighted_median(
        li, ["l_returnflag"], "l_quantity", "l_extendedprice"
    )


def _eccentricity_oracle_sql(
    sources: tuple[int, ...] = (0, 1, 2), mod: int = 500, depth: int = 8
) -> str:
    """Same per-source unrolled min-dist BFS as _closeness_oracle_sql,
    collapsed to the per-SOURCE max distance + reached count."""
    pre = f"""
    WITH e AS MATERIALIZED (
      SELECT DISTINCT l_orderkey % {mod} AS src, l_partkey % {mod} AS dst
      FROM lineitem WHERE l_orderkey % {mod} <> l_partkey % {mod})"""
    blocks, finals = [], []
    for s in sources:
        blocks.append(f"""
    s{s}d0 AS (SELECT CAST({s} AS BIGINT) AS id, 0 AS dist)""")
        for i in range(1, depth + 1):
            p = f"s{s}d{i - 1}"
            blocks.append(f"""
    s{s}d{i} AS MATERIALIZED (
      SELECT id, min(dist) AS dist FROM (
        SELECT id, dist FROM {p}
        UNION ALL
        SELECT e.dst AS id, p.dist + 1 AS dist
        FROM e JOIN {p} p ON p.id = e.src
      ) GROUP BY id)""")
        finals.append(
            f"""SELECT CAST({s} AS BIGINT) AS id,
            MAX(dist)::BIGINT AS eccentricity,
            (COUNT(*) - 1)::BIGINT AS n_reached FROM s{s}d{depth}"""
        )
    return pre + "," + ",".join(blocks) + "\n" + " UNION ALL ".join(finals)


@register("q173_eccentricity", _eccentricity_oracle_sql())
def q173_eccentricity(spark, sf_dir):
    """Sampled landmark eccentricity (max BFS distance per seed source,
    the double-sweep diameter heuristic's primitive) — one tagged
    multi-source BFS, one per-source agg."""
    g = _mod_graph(spark, sf_dir)
    out = alg.eccentricity(g, [0, 1, 2])
    return out.select(
        "id",
        F.col("eccentricity").cast("long").alias("eccentricity"),
        "n_reached",
    )


@register(
    "q174_benford_audit",
    """
    WITH d AS (
      SELECT substr(CAST(CAST(floor(l_extendedprice) AS BIGINT)
                    AS VARCHAR), 1, 1)::INT AS digit
      FROM lineitem WHERE l_extendedprice > 0
    ),
    c AS (SELECT digit, COUNT(*)::BIGINT AS n FROM d
          WHERE digit > 0 GROUP BY digit),
    t AS (SELECT SUM(n)::DOUBLE AS t FROM c)
    SELECT digit, n,
           ROUND(n / t.t, 6) AS freq,
           ROUND(log10(1.0 + 1.0 / digit), 6) AS expected,
           ROUND(ABS(n / t.t - log10(1.0 + 1.0 / digit)), 6) AS deviation
    FROM c CROSS JOIN t
    """,
)
def q174_benford_audit(spark, sf_dir):
    """Benford first-digit audit over extended prices — the
    fabricated-data / unit-mixing quality check: one 9-row map-side
    combined agg + broadcast total (`quality.benford_audit`)."""
    li = _t(spark, sf_dir, "lineitem")
    from graphmapreduce_spark.operators import quality as Q

    return Q.benford_audit(li, "l_extendedprice")


@register(
    "q175_event_transitions",
    """
    WITH seq AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_event
      FROM events
    ),
    c AS (
      SELECT prev_event, event_type AS event, COUNT(*)::BIGINT AS n
      FROM seq WHERE prev_event IS NOT NULL
      GROUP BY 1, 2
    ),
    tot AS (SELECT prev_event, SUM(n)::DOUBLE AS t FROM c GROUP BY 1)
    SELECT c.prev_event, c.event, c.n, ROUND(c.n / tot.t, 6) AS p
    FROM c JOIN tot USING (prev_event)
    """,
)
def q175_event_transitions(spark, sf_dir):
    """First-order Markov transition matrix over per-user event
    sequences (the session-flow / next-event-model statistic): one lag
    window on the user-key partitioning (ties broken by event_id so the
    sequence is engine-identical), pair counts, and a per-prev
    normalizer joined back — the normalizer table is |event_type|²-
    bounded, so AQE broadcasts it at any event volume."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.withColumn("prev_event", F.lag("event_type").over(w))
    c = (
        seq.filter(F.col("prev_event").isNotNull())
        .groupBy("prev_event", F.col("event_type").alias("event"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = c.groupBy("prev_event").agg(F.sum("n").cast("double").alias("_t"))
    return c.join(tot, "prev_event").select(
        "prev_event",
        "event",
        "n",
        F.round(F.col("n") / F.col("_t"), 6).alias("p"),
    )


@register("q176_edge_betweenness", _edge_betweenness_oracle_sql())
def q176_edge_betweenness(spark, sf_dir):
    """Sampled EDGE betweenness (the Girvan–Newman cut primitive) from
    the same tagged Brandes sweep as q168 — the per-edge dependency
    terms are that sweep's pre-aggregation rows, summed per edge."""
    g = _mod_graph(spark, sf_dir)
    out = alg.edge_betweenness(g, [0, 1, 2])
    return out.select(
        "src", "dst", F.round("betweenness", 6).alias("betweenness")
    )


@register(
    "q177_period_over_period",
    """
    WITH m AS (
      SELECT date_part('year', l_shipdate)::BIGINT AS y,
             date_part('month', l_shipdate)::BIGINT AS m,
             ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
      FROM lineitem GROUP BY 1, 2
    )
    SELECT y, m, revenue,
           ROUND((revenue - LAG(revenue) OVER (ORDER BY y, m))
                 / LAG(revenue) OVER (ORDER BY y, m), 6) AS pct_change
    FROM m
    """,
)
def q177_period_over_period(spark, sf_dir):
    """Month-over-month revenue change — the reporting staple: the lag
    window runs over the COLLAPSED monthly table (tens of rows at any
    fact volume), so the single-partition order is bounded by the
    calendar, never the data."""
    li = _t(spark, sf_dir, "lineitem")
    m = li.groupBy(
        F.year("l_shipdate").cast("long").alias("y"),
        F.month("l_shipdate").cast("long").alias("m"),
    ).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue")
    )
    w = Window.orderBy("y", "m")
    prev = F.lag("revenue").over(w)
    return m.withColumn(
        "pct_change", F.round((F.col("revenue") - prev) / prev, 6)
    )


@register(
    "q178_skew_report",
    """
    WITH c AS (
      SELECT l_partkey, COUNT(*)::BIGINT AS n FROM lineitem GROUP BY 1
    )
    SELECT SUM(n)::BIGINT AS n_rows, COUNT(*)::BIGINT AS n_keys,
           MAX(n)::BIGINT AS max_n,
           ROUND(MAX(n) / SUM(n)::DOUBLE, 6) AS top_share,
           ROUND(ln(SUM(n)::DOUBLE)
                 - SUM(n * ln(n::DOUBLE)) / SUM(n)::DOUBLE, 6) AS entropy
    FROM c
    """,
)
def q178_skew_report(spark, sf_dir):
    """Join-key skew diagnostic over the part key — the decision input
    for q146's salted join: hottest-key share + distribution entropy
    from one count agg and a 1-row collapse
    (`quality.skew_report`)."""
    li = _t(spark, sf_dir, "lineitem")
    from graphmapreduce_spark.operators import quality as Q

    return Q.skew_report(li, ["l_partkey"])


@register(
    "q179_interval_union",
    """
    WITH iv AS (
      SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS s,
             CAST(floor(epoch(ts)) AS BIGINT) + 300 AS e
      FROM events
    ),
    m AS (
      SELECT user_id, s, e,
             MAX(e) OVER (PARTITION BY user_id ORDER BY s, e
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS pm
      FROM iv
    ),
    g AS (
      SELECT user_id, s, e,
             SUM(CASE WHEN pm IS NULL OR s > pm THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY s, e
                     ROWS UNBOUNDED PRECEDING) AS grp
      FROM m
    ),
    c AS (
      SELECT user_id, grp, MIN(s) AS ms, MAX(e) AS me
      FROM g GROUP BY user_id, grp
    )
    SELECT user_id, COUNT(*)::BIGINT AS n_intervals,
           SUM(me - ms)::BIGINT AS covered
    FROM c GROUP BY user_id
    """,
)
def q179_interval_union(spark, sf_dir):
    """Per-user union measure of 5-minute activity windows (overlaps
    counted once) — the utilization/SLA primitive: plane sweep as a
    strict-predecessor running-max window + group numbering, all on one
    user-key partitioning (`relational.interval_union`)."""
    e = _t(spark, sf_dir, "events")
    iv = e.select(
        "user_id",
        F.col("ts").cast("long").alias("s"),
        (F.col("ts").cast("long") + 300).alias("e"),
    )
    return R.interval_union(iv, ["user_id"], "s", "e")


@register(
    "q180_cumulative_distinct",
    """
    WITH firstday AS (
      SELECT user_id,
             MIN(CAST(floor(epoch(ts)) AS BIGINT) // 86400) AS day
      FROM events GROUP BY user_id
    ),
    daily AS (
      SELECT day, COUNT(*)::BIGINT AS new_users
      FROM firstday GROUP BY day
    )
    SELECT day, new_users,
           SUM(new_users) OVER (ORDER BY day
                                ROWS UNBOUNDED PRECEDING)::BIGINT
             AS cum_users
    FROM daily
    """,
)
def q180_cumulative_distinct(spark, sf_dir):
    """Running distinct-user count by day — EXACT cumulative distinct
    via the first-seen trick: distinct collapses to one row per user
    (min day), the cumulative window then runs over the collapsed
    per-day table (calendar-bounded), never the raw events."""
    e = _t(spark, sf_dir, "events")
    fd = e.groupBy("user_id").agg(
        F.min(F.floor(F.col("ts").cast("long") / 86400).cast("long")).alias(
            "day"
        )
    )
    daily = fd.groupBy("day").agg(F.count(F.lit(1)).alias("new_users"))
    w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return daily.withColumn(
        "cum_users", F.sum("new_users").over(w).cast("long")
    )


@register(
    "q181_hard_negatives",
    """
    WITH c AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
               FROM embeddings),
         q AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
               FROM embeddings WHERE vec_id < 5),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             ROUND(list_sum(list_transform(range(1, len(q.v) + 1),
                              i -> q.v[i] * c.v[i]))
               / (sqrt(list_sum(list_transform(q.v, x -> x * x)))
                * sqrt(list_sum(list_transform(c.v, x -> x * x)))), 6)
               AS cosine
      FROM c CROSS JOIN q
      WHERE q.label <> c.label
    )
    SELECT query_id, neighbor_id, cosine, rank FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                 ORDER BY cosine DESC, neighbor_id ASC) AS rank
      FROM scored) t
    WHERE rank <= 10
    """,
)
def q181_hard_negatives(spark, sf_dir):
    """Hard-negative mining for contrastive pairs: per query vector the
    top-10 most-similar vectors with a DIFFERENT label — q48's
    broadcast-scan plan with the label-inequality predicate pushed into
    the scoring join (`similarity.hard_negatives`)."""
    from graphmapreduce_spark.operators.similarity import hard_negatives

    emb = _t(spark, sf_dir, "embeddings")
    return hard_negatives(emb, emb.filter(F.col("vec_id") < 5), k=10)


@register(
    "q182_class_weights",
    """
    WITH c AS (SELECT label, COUNT(*)::BIGINT AS n
               FROM embeddings GROUP BY label),
    t AS (SELECT SUM(n)::DOUBLE AS tot, COUNT(*)::DOUBLE AS k FROM c)
    SELECT label, n,
           ROUND(n / t.tot, 6) AS share,
           ROUND(t.tot / (t.k * n), 6) AS weight
    FROM c CROSS JOIN t
    """,
)
def q182_class_weights(spark, sf_dir):
    """Class-balance report + inverse-frequency reweighting factors
    (sklearn's 'balanced' convention, weight = N/(k·n_c)) — the label
    audit before classifier-head training: one count agg + broadcast
    1-row total."""
    emb = _t(spark, sf_dir, "embeddings")
    c = emb.groupBy("label").agg(F.count(F.lit(1)).alias("n"))
    t = c.agg(
        F.sum("n").cast("double").alias("_tot"),
        F.count(F.lit(1)).cast("double").alias("_k"),
    )
    return c.crossJoin(F.broadcast(t)).select(
        "label",
        "n",
        F.round(F.col("n") / F.col("_tot"), 6).alias("share"),
        F.round(F.col("_tot") / (F.col("_k") * F.col("n")), 6).alias(
            "weight"
        ),
    )


def _katz_oracle_sql(
    n_iter: int = 8, alpha: float = 0.005, beta: float = 1.0, k: int = 500
) -> str:
    """Unrolled Katz iteration x = β + α·(Aᵀx) from x₀ = β."""
    pre = f"""
    WITH e AS MATERIALIZED (
      SELECT DISTINCT l_orderkey % {k} AS src, l_partkey % {k} AS dst
      FROM lineitem WHERE l_orderkey % {k} <> l_partkey % {k}
    ),
    v AS MATERIALIZED (SELECT src AS id FROM e UNION SELECT dst AS id FROM e),
    k0 AS MATERIALIZED (SELECT id, {beta}::DOUBLE AS x FROM v)"""
    its = []
    for i in range(1, n_iter + 1):
        its.append(f"""
    k{i} AS MATERIALIZED (
      SELECT v.id, {beta}::DOUBLE + {alpha}::DOUBLE * COALESCE(s.in_sum, 0) AS x
      FROM v
      LEFT JOIN (SELECT e.dst AS id, SUM(r.x) AS in_sum
                 FROM e JOIN k{i - 1} r ON r.id = e.src
                 GROUP BY e.dst) s ON s.id = v.id
    )""")
    return (
        pre + "," + ",".join(its)
        + f"\n    SELECT id, ROUND(x, 6) AS katz FROM k{n_iter}"
    )


@register("q183_katz", _katz_oracle_sql())
def q183_katz(spark, sf_dir):
    """Katz centrality (attenuated walk counts) — pagerank's superstep
    plan minus degree normalization; 8 unrolled iterations as the
    oracle."""
    g = _mod_graph(spark, sf_dir, 500)
    # alpha must sit below 1/lambda_max (~1/44 on this graph) or the
    # series diverges and round-6 parity dies at double precision
    out = alg.katz_centrality(g, alpha=0.005, beta=1.0, max_iter=8)
    return out.select("id", F.round("katz", 6).alias("katz"))


def _eigenvector_oracle_sql(n_iter: int = 8, k: int = 500) -> str:
    """Unrolled power iteration x = Aᵀx from x₀ = 1, L2-normalized once
    at the end (mirrors eigenvector_centrality exactly)."""
    pre = f"""
    WITH e AS MATERIALIZED (
      SELECT DISTINCT l_orderkey % {k} AS src, l_partkey % {k} AS dst
      FROM lineitem WHERE l_orderkey % {k} <> l_partkey % {k}
    ),
    v AS MATERIALIZED (SELECT src AS id FROM e UNION SELECT dst AS id FROM e),
    x0 AS MATERIALIZED (SELECT id, 1.0::DOUBLE AS x FROM v)"""
    its = []
    for i in range(1, n_iter + 1):
        its.append(f"""
    x{i} AS MATERIALIZED (
      SELECT v.id, COALESCE(s.in_sum, 0)::DOUBLE AS x
      FROM v
      LEFT JOIN (SELECT e.dst AS id, SUM(r.x) AS in_sum
                 FROM e JOIN x{i - 1} r ON r.id = e.src
                 GROUP BY e.dst) s ON s.id = v.id
    )""")
    return (
        pre + "," + ",".join(its)
        + f"""
    SELECT id,
           ROUND(x / (SELECT sqrt(SUM(x * x)) FROM x{n_iter}), 6)
             AS eigenvector
    FROM x{n_iter}"""
    )


@register("q184_eigenvector", _eigenvector_oracle_sql())
def q184_eigenvector(spark, sf_dir):
    """Eigenvector centrality by 8 power-iteration supersteps,
    un-normalized chunks + one final L2 norm (the HITS trick on a
    single vector)."""
    g = _mod_graph(spark, sf_dir, 500)
    out = alg.eigenvector_centrality(g, max_iter=8)
    return out.select(
        "id", F.round("eigenvector", 6).alias("eigenvector")
    )


@register(
    "q185_reciprocity",
    """
    WITH e AS (
      SELECT DISTINCT l_orderkey % 500 AS src, l_partkey % 500 AS dst
      FROM lineitem WHERE l_orderkey % 500 <> l_partkey % 500
    )
    SELECT (SELECT COUNT(*) FROM e)::BIGINT AS n_edges,
           (SELECT COUNT(*) FROM e a
            WHERE EXISTS (SELECT 1 FROM e b
                          WHERE b.src = a.dst AND b.dst = a.src))::BIGINT
             AS n_mutual,
           ROUND((SELECT COUNT(*) FROM e a
                  WHERE EXISTS (SELECT 1 FROM e b
                                WHERE b.src = a.dst AND b.dst = a.src))
                 / (SELECT COUNT(*) FROM e)::DOUBLE, 6) AS reciprocity
    """,
)
def q185_reciprocity(spark, sf_dir):
    """Directed-edge reciprocity (mutual-edge fraction) — one flipped
    self-semi-join + two counts (`algorithms.reciprocity`)."""
    g = _mod_graph(spark, sf_dir)
    return alg.reciprocity(g)


@register(
    "q186_band_join",
    """
    SELECT a.p_partkey AS a_key, b.p_partkey AS b_key,
           ROUND(ABS(a.p_retailprice - b.p_retailprice), 2) AS price_gap
    FROM part a JOIN part b
      ON ABS(a.p_retailprice - b.p_retailprice) <= 0.5
     AND a.p_partkey < b.p_partkey
    """,
)
def q186_band_join(spark, sf_dir):
    """Numeric band join (|price gap| ≤ 0.5) via eps-bucket blocking —
    equi join on floor(val/eps) with 3-bucket left expansion, exact
    band re-checked post-join; the oracle is the quadratic theta join
    (`relational.band_join`)."""
    p = _t(spark, sf_dir, "part")
    a = p.select(
        F.col("p_partkey").alias("a_key"),
        F.col("p_retailprice").alias("pa"),
    )
    b = p.select(
        F.col("p_partkey").alias("b_key"),
        F.col("p_retailprice").alias("pb"),
    )
    out = R.band_join(
        a, b, "pa", "pb", 0.5, condition=F.col("a_key") < F.col("b_key")
    )
    return out.select(
        "a_key",
        "b_key",
        F.round(F.abs(F.col("pa") - F.col("pb")), 2).alias("price_gap"),
    )


@register(
    "q187_leakage_safe_split",
    f"""
    WITH RECURSIVE
    {_PAIR_CLOSURE_CTES},
    alld AS (SELECT doc_id FROM documents WHERE doc_id < 100),
    asg AS (
      SELECT d.doc_id, COALESCE(c.cluster, d.doc_id) AS cluster
      FROM alld d LEFT JOIN clusters c ON c.id = d.doc_id
    ),
    b AS (
      SELECT doc_id, cluster,
             {_MD5_BUCKET.format(col='cluster', seed=1)} AS bk
      FROM asg
    )
    SELECT doc_id, cluster,
           CASE WHEN bk < 800000 THEN 'train'
                WHEN bk < 900000 THEN 'val'
                ELSE 'test' END AS split
    FROM b
    """,
)
def q187_leakage_safe_split(spark, sf_dir):
    """Leakage-safe train/val/test split: hash on the near-dup CLUSTER
    id, not the doc id, so near-duplicates can never straddle a split
    boundary and leak eval data into training — the q80 split's
    correctness upgrade, composing the q76 closure with the md5 bucket
    ranges.  Singleton docs are their own cluster."""
    d, pairs = _pair_frame(spark, sf_dir)
    clusters = D.dedup_clusters(pairs)
    assigned = (
        d.select("doc_id")
        .join(clusters, d["doc_id"] == clusters["id"], "left")
        .select(
            "doc_id",
            F.coalesce("cluster", F.col("doc_id")).alias("cluster"),
        )
    )
    bk = F.pmod(
        T.md5_hash60(
            F.concat(F.col("cluster").cast("string"), F.lit(":1"))
        ),
        F.lit(1_000_000),
    )
    return assigned.select(
        "doc_id",
        "cluster",
        F.when(bk < 800_000, "train")
        .when(bk < 900_000, "val")
        .otherwise("test")
        .alias("split"),
    )


@register(
    "q188_length_buckets",
    r"""
    WITH t AS (
      SELECT doc_id,
             len(list_filter(string_split_regex(trim(text), '\s+'),
                             w -> w <> '')) AS n_tok
      FROM documents
    ),
    b AS (
      SELECT doc_id, n_tok,
             CAST(POWER(2, CEIL(LOG2(GREATEST(n_tok, 1)))) AS BIGINT)
               AS bucket
      FROM t WHERE n_tok > 0
    )
    SELECT bucket, COUNT(*)::BIGINT AS n_docs,
           SUM(n_tok)::BIGINT AS total_tokens,
           (COUNT(*) * bucket)::BIGINT AS padded_tokens,
           ROUND(1.0 - SUM(n_tok) / (COUNT(*) * bucket)::DOUBLE, 6)
             AS waste_ratio
    FROM b GROUP BY bucket
    """,
)
def q188_length_buckets(spark, sf_dir):
    """Power-of-two length bucketing with padding-waste accounting —
    the batching-efficiency audit run before fixed-shape training
    (docs padded to their bucket; waste = padding fraction).  One
    tokenize + one 20-row hash agg."""
    d = _t(spark, sf_dir, "documents")
    n_tok = F.size(
        F.filter(F.split(F.trim(F.col("text")), "\\s+"), lambda w: w != "")
    )
    b = (
        d.select(n_tok.alias("n_tok"))
        .filter(F.col("n_tok") > 0)
        .withColumn(
            "bucket",
            F.pow(
                F.lit(2.0),
                F.ceil(F.log2(F.greatest(F.col("n_tok"), F.lit(1)))),
            ).cast("long"),
        )
    )
    return b.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("total_tokens"),
        (F.count(F.lit(1)) * F.col("bucket").cast("long"))
        .alias("padded_tokens"),
        F.round(
            1.0
            - F.sum("n_tok")
            / (F.count(F.lit(1)) * F.col("bucket")).cast("double"),
            6,
        ).alias("waste_ratio"),
    )


@register(
    "q189_encoding_audit",
    r"""
    SELECT doc_id,
           length(text)::BIGINT AS n_chars,
           (length(text) - length(replace(text, chr(65533), '')))::BIGINT
             AS n_replacement,
           (length(text)
            - length(regexp_replace(text, '[\x00-\x08\x0B\x0C\x0E-\x1F]',
                                    '', 'g')))::BIGINT AS n_control
    FROM documents
    """,
)
def q189_encoding_audit(spark, sf_dir):
    """Mojibake / encoding-damage audit: per document the count of
    U+FFFD replacement characters and C0 control characters (tab,
    newline, CR excluded) — the ingest-corruption signal a crawl
    pipeline thresholds on.  Pure scan-speed regexp-count expressions,
    zero shuffles."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars"),
        F.regexp_count(F.col("text"), F.lit("�"))
        .cast("long")
        .alias("n_replacement"),
        F.regexp_count(
            F.col("text"),
            F.lit("[\x00-\x08\x0B\x0C\x0E-\x1F]"),
        )
        .cast("long")
        .alias("n_control"),
    )


@register(
    "q190_powerlaw_alpha",
    """
    WITH e AS (
      SELECT DISTINCT l_orderkey % 500 AS src, l_partkey % 500 AS dst
      FROM lineitem WHERE l_orderkey % 500 <> l_partkey % 500
    ),
    deg AS (SELECT src, COUNT(*)::DOUBLE AS d FROM e GROUP BY src)
    SELECT COUNT(*)::BIGINT AS n_vertices,
           MIN(d)::BIGINT AS d_min,
           MAX(d)::BIGINT AS d_max,
           ROUND(1.0 + COUNT(*)
                 / SUM(ln(d / (SELECT MIN(d) FROM deg))), 6) AS alpha_mle
    FROM deg
    """,
)
def q190_powerlaw_alpha(spark, sf_dir):
    """Degree-distribution power-law exponent by the Clauset–Shalizi–
    Newman continuous MLE α = 1 + n/Σ ln(d/d_min) over out-degrees —
    the one-row structure statistic deciding whether skew mitigation
    (degree orientation, salting) is even needed.  One degree agg +
    one collapse."""
    li = _t(spark, sf_dir, "lineitem")
    deg = (
        li.select(
            (F.col("l_orderkey") % 500).alias("src"),
            (F.col("l_partkey") % 500).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .groupBy("src")
        .agg(F.count(F.lit(1)).cast("double").alias("d"))
    )
    dmin = deg.agg(F.min("d").alias("_dm"))
    return (
        deg.crossJoin(F.broadcast(dmin))
        .agg(
            F.count(F.lit(1)).alias("n_vertices"),
            F.min("d").cast("long").alias("d_min"),
            F.max("d").cast("long").alias("d_max"),
            F.round(
                1.0
                + F.count(F.lit(1))
                / F.sum(F.log(F.col("d") / F.col("_dm"))),
                6,
            ).alias("alpha_mle"),
        )
    )


@register(
    "q191_join_size",
    """
    WITH l AS (SELECT l_partkey AS k, COUNT(*)::BIGINT AS n
               FROM lineitem GROUP BY 1),
         r AS (SELECT p_partkey AS k, COUNT(*)::BIGINT AS n
               FROM part GROUP BY 1)
    SELECT SUM(l.n * r.n)::BIGINT AS join_rows,
           MAX(l.n * r.n)::BIGINT AS max_key_rows,
           COUNT(*)::BIGINT AS n_join_keys
    FROM l JOIN r USING (k)
    """,
)
def q191_join_size(spark, sf_dir):
    """EXACT join-cardinality forecast without running the join:
    |L ⋈ R| = Σ_k n_L(k)·n_R(k) from the two key histograms — the
    planning diagnostic (with per-key max, the skew half of the
    decision feeding q146's salted join and q178's skew report) at the
    cost of two count aggs and a join over |keys|, not |rows|."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    l = li.groupBy(F.col("l_partkey").alias("k")).agg(
        F.count(F.lit(1)).alias("nl")
    )
    r = p.groupBy(F.col("p_partkey").alias("k")).agg(
        F.count(F.lit(1)).alias("nr")
    )
    return l.join(r, "k").agg(
        F.sum(F.col("nl") * F.col("nr")).alias("join_rows"),
        F.max(F.col("nl") * F.col("nr")).alias("max_key_rows"),
        F.count(F.lit(1)).alias("n_join_keys"),
    )


@register(
    "q192_sliding_distinct",
    """
    WITH act AS (
      SELECT DISTINCT user_id,
             CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day
      FROM events
    ),
    contrib AS (
      SELECT a.user_id, a.day + o.offs AS win_end
      FROM act a
      JOIN (SELECT UNNEST(range(0, 7)) AS offs) o ON TRUE
    ),
    dedup AS (SELECT DISTINCT user_id, win_end FROM contrib),
    days AS (SELECT DISTINCT day FROM act)
    SELECT d.day, COUNT(DISTINCT c.user_id)::BIGINT AS users_7d
    FROM days d JOIN dedup c ON c.win_end = d.day
    GROUP BY d.day
    """,
)
def q192_sliding_distinct(spark, sf_dir):
    """EXACT trailing-7-day distinct users per active day — each
    (user, day) activity contributes to the 7 windows ending on
    day..day+6 (a FIXED 7× explode, never a range self-join), then one
    distinct + count per window end, restricted to days that actually
    occur.  The exact complement of an HLL-by-window rollup."""
    e = _t(spark, sf_dir, "events")
    act = e.select(
        "user_id",
        F.floor(F.col("ts").cast("long") / 86400).cast("long").alias("day"),
    ).distinct()
    contrib = act.select(
        "user_id",
        F.explode(
            F.sequence(F.col("day"), F.col("day") + 6)
        ).alias("win_end"),
    ).distinct()
    days = act.select("day").distinct()
    return (
        days.join(contrib, days["day"] == contrib["win_end"])
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("users_7d"))
    )


@register(
    "q193_rolling_zscore",
    """
    WITH w AS (
      SELECT event_id, user_id, value,
             AVG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
               AS m,
             STDDEV_SAMP(value) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id
                              ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
               AS s
      FROM events
    )
    SELECT event_id, user_id, ROUND((value - m) / s, 6) AS z
    FROM w WHERE s > 0 AND ABS((value - m) / s) > 3
    """,
)
def q193_rolling_zscore(spark, sf_dir):
    """Trailing-20-event rolling z-score anomaly flags per user — the
    streaming-monitoring primitive in batch form: one per-user window
    (event_id tiebreak keeps frames engine-identical), flags where
    |z| > 3.  Output is the anomalous rows only."""
    e = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-19, Window.currentRow)
    )
    scored = e.select(
        "event_id",
        "user_id",
        "value",
        F.avg("value").over(w).alias("m"),
        F.stddev_samp("value").over(w).alias("s"),
    )
    z = (F.col("value") - F.col("m")) / F.col("s")
    return scored.filter((F.col("s") > 0) & (F.abs(z) > 3)).select(
        "event_id", "user_id", F.round(z, 6).alias("z")
    )


@register(
    "q194_autocorr",
    """
    WITH lagged AS (
      SELECT user_id, value,
             LAG(value) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS pv
      FROM events
    )
    SELECT user_id, COUNT(*)::BIGINT AS n_pairs,
           ROUND(CORR(value, pv), 6) AS autocorr
    FROM lagged WHERE pv IS NOT NULL
    GROUP BY user_id
    """,
)
def q194_autocorr(spark, sf_dir):
    """Lag-1 autocorrelation of event values per user (the
    persistence/seasonality screen before forecasting): one lag window
    + one Pearson-corr agg on the same user partitioning."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lagged = e.select(
        "user_id", "value", F.lag("value").over(w).alias("pv")
    ).filter(F.col("pv").isNotNull())
    return lagged.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.round(F.corr("value", "pv"), 6).alias("autocorr"),
    )


def _langid_confusion_oracle_sql() -> str:
    """The q44 stopword-argmax scorer keyed by the labeled lang column —
    the confusion matrix instead of the marginal."""
    hit_exprs = []
    for lang, stops in sorted(T.STOPWORDS.items()):
        lst = ", ".join(f"'{w}'" for w in stops)
        hit_exprs.append(
            f"len(list_filter(ws, x -> list_contains([{lst}], lower(x))))"
            f" AS h_{lang}"
        )
    hits = ",\n             ".join(hit_exprs)
    return f"""
    WITH toks AS (
      SELECT lang, list_filter(string_split_regex(trim(text), '\\s+'),
                         x -> x <> '') AS ws
      FROM documents
    ),
    scored AS (
      SELECT lang, {hits}
      FROM toks
    )
    SELECT lang,
           CASE WHEN GREATEST(h_de, h_en, h_es, h_fr) = 0 THEN 'und'
                WHEN h_de >= h_en AND h_de >= h_es AND h_de >= h_fr THEN 'de'
                WHEN h_en >= h_es AND h_en >= h_fr THEN 'en'
                WHEN h_es >= h_fr THEN 'es'
                ELSE 'fr' END AS predicted_lang,
           COUNT(*)::BIGINT AS n
    FROM scored
    GROUP BY 1, 2
    """


@register("q195_langid_confusion", _langid_confusion_oracle_sql())
def q195_langid_confusion(spark, sf_dir):
    """Language-ID confusion matrix: predicted language (q44's stopword
    argmax) against the labeled ``lang`` column — the classifier
    evaluation every corpus-mixing decision leans on.  One scan, one
    |langs|²-bounded agg."""
    d = _t(spark, sf_dir, "documents")
    return d.groupBy(
        "lang", T.language_id("text").alias("predicted_lang")
    ).agg(F.count(F.lit(1)).alias("n"))


@register(
    "q196_table_checksum",
    """
    WITH h AS (
      SELECT ('0x' || substr(md5(
               CAST(o_orderkey AS VARCHAR) || '|' ||
               CAST(o_custkey AS VARCHAR) || '|' || o_orderstatus || '|' ||
               CAST(ROUND(o_totalprice, 2) AS VARCHAR)), 1, 15))::BIGINT
             AS rh
      FROM orders
    )
    SELECT COUNT(*)::BIGINT AS n_rows,
           BIT_XOR(rh)::BIGINT AS xor_checksum,
           SUM(rh % 1000000007)::BIGINT AS modsum_checksum
    FROM h
    """,
)
def q196_table_checksum(spark, sf_dir):
    """Order-insensitive content checksum of a table (row-hash sum) —
    the cheap cross-system integrity handshake before/after a
    migration, CDC replay, or compaction: one scan, two commutative
    aggs, no sort, no collect.  md5-60bit row hashes keep it
    engine-portable; XOR never overflows (but cancels rows duplicated
    an even number of times), and the mod-1e9+7 hash sum catches
    exactly that case while staying exact in BIGINT to ~9·10⁹ rows —
    together with the row count the pair is a robust handshake."""
    o = _t(spark, sf_dir, "orders")
    row_repr = F.concat_ws(
        "|",
        F.col("o_orderkey").cast("string"),
        F.col("o_custkey").cast("string"),
        F.col("o_orderstatus"),
        F.round("o_totalprice", 2).cast("string"),
    )
    h = o.select(T.md5_hash60(row_repr).alias("rh"))
    return h.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.expr("bit_xor(rh)").cast("long").alias("xor_checksum"),
        F.sum(F.pmod(F.col("rh"), F.lit(1_000_000_007)))
        .cast("long")
        .alias("modsum_checksum"),
    )


@register(
    "q197_psi_drift",
    """
    WITH b AS (
      SELECT CASE WHEN l_orderkey % 2 = 0 THEN 'a' ELSE 'b' END AS period,
             LEAST(CAST(l_quantity AS BIGINT) // 10, 4) AS bucket
      FROM lineitem
    ),
    c AS (SELECT period, bucket, COUNT(*)::DOUBLE AS n
          FROM b GROUP BY 1, 2),
    t AS (SELECT period, SUM(n) AS tot FROM c GROUP BY 1),
    p AS (SELECT c.bucket,
                 MAX(CASE WHEN c.period = 'a' THEN c.n / t.tot END) AS pa,
                 MAX(CASE WHEN c.period = 'b' THEN c.n / t.tot END) AS pb
          FROM c JOIN t USING (period) GROUP BY c.bucket)
    SELECT ROUND(SUM((pa - pb) * ln(pa / pb)), 6) AS psi,
           COUNT(*)::BIGINT AS n_buckets
    FROM p WHERE pa > 0 AND pb > 0
    """,
)
def q197_psi_drift(spark, sf_dir):
    """Population Stability Index between two periods' quantity
    distributions — THE production ML drift gate:
    PSI = Σ (p_i − q_i)·ln(p_i/q_i) over shared buckets.  Two count
    aggs collapse to |buckets| rows before any division; the split here
    is a deterministic orderkey parity stand-in for time periods."""
    li = _t(spark, sf_dir, "lineitem")
    b = li.select(
        F.when(F.col("l_orderkey") % 2 == 0, "a").otherwise("b").alias(
            "period"
        ),
        F.least(
            F.floor(F.col("l_quantity").cast("long") / 10), F.lit(4)
        ).alias("bucket"),
    )
    c = b.groupBy("period", "bucket").agg(
        F.count(F.lit(1)).cast("double").alias("n")
    )
    t = c.groupBy("period").agg(F.sum("n").alias("tot"))
    p = (
        c.join(t, "period")
        .groupBy("bucket")
        .agg(
            F.max(
                F.when(F.col("period") == "a", F.col("n") / F.col("tot"))
            ).alias("pa"),
            F.max(
                F.when(F.col("period") == "b", F.col("n") / F.col("tot"))
            ).alias("pb"),
        )
    )
    return (
        p.filter((F.col("pa") > 0) & (F.col("pb") > 0))
        .agg(
            F.round(
                F.sum(
                    (F.col("pa") - F.col("pb"))
                    * F.log(F.col("pa") / F.col("pb"))
                ),
                6,
            ).alias("psi"),
            F.count(F.lit(1)).alias("n_buckets"),
        )
    )


@register(
    "q198_lexical_diversity",
    r"""
    WITH tok AS (
      SELECT doc_id, UNNEST(list_filter(
               string_split_regex(trim(lower(text)), '\s+'),
               w -> w <> '')) AS w
      FROM documents
    ),
    per AS (
      SELECT doc_id, w, COUNT(*) AS c FROM tok GROUP BY doc_id, w
    )
    SELECT doc_id,
           SUM(c)::BIGINT AS n_tokens,
           COUNT(*)::BIGINT AS n_types,
           ROUND(COUNT(*) / SUM(c)::DOUBLE, 6) AS ttr,
           ROUND(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END)
                 / COUNT(*)::DOUBLE, 6) AS hapax_frac
    FROM per GROUP BY doc_id
    """,
)
def q198_lexical_diversity(spark, sf_dir):
    """Type-token ratio + hapax-legomenon fraction per document — the
    lexical-diversity screen separating word-salad spam (TTR→1) from
    template boilerplate (TTR→0): one explode, one (doc, word) agg,
    one per-doc collapse on the same doc partitioning."""
    d = _t(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        F.explode(
            F.filter(
                F.split(F.trim(F.lower(F.col("text"))), "\\s+"),
                lambda w: w != "",
            )
        ).alias("w"),
    )
    per = tok.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("c"))
    return per.groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_types"),
        F.round(F.count(F.lit(1)) / F.sum("c"), 6).alias("ttr"),
        F.round(
            F.sum((F.col("c") == 1).cast("long")) / F.count(F.lit(1)), 6
        ).alias("hapax_frac"),
    )


@register(
    "q199_cross_source_dups",
    """
    WITH sh AS (
      SELECT doc_id, source, list_distinct(list_transform(
               range(1, GREATEST(length(text) - 2, 0) + 1),
               i -> substr(text, i, 3))) AS grams
      FROM documents WHERE doc_id < 100
    ),
    inv AS (SELECT doc_id, UNNEST(grams) AS g FROM sh),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
      FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT id_a, id_b FROM inter
      JOIN sh sa ON sa.doc_id = id_a
      JOIN sh sb ON sb.doc_id = id_b
      WHERE CAST(i AS DOUBLE) / (len(sa.grams) + len(sb.grams) - i) >= 0.6
    )
    SELECT LEAST(sa.source, sb.source) AS source_a,
           GREATEST(sa.source, sb.source) AS source_b,
           COUNT(*)::BIGINT AS n_pairs
    FROM pairs
    JOIN sh sa ON sa.doc_id = id_a
    JOIN sh sb ON sb.doc_id = id_b
    GROUP BY 1, 2
    """,
)
def q199_cross_source_dups(spark, sf_dir):
    """Near-duplicate leakage matrix BETWEEN sources: q45's pair
    pipeline joined back to the source column, pair counts keyed by
    the unordered source pair — the report deciding which feeds
    duplicate which before corpus mixing."""
    d, pairs = _pair_frame(spark, sf_dir)
    src = d.select("doc_id", "source")
    sa = src.select(
        F.col("doc_id").alias("id_a"), F.col("source").alias("_sa")
    )
    sb = src.select(
        F.col("doc_id").alias("id_b"), F.col("source").alias("_sb")
    )
    return (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .groupBy(
            F.least("_sa", "_sb").alias("source_a"),
            F.greatest("_sa", "_sb").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


@register(
    "q200_corpus_card",
    r"""
    WITH ws AS (
      SELECT doc_id, lang, source,
             len(list_filter(string_split_regex(trim(text), '\s+'),
                             w -> w <> '')) AS n_tok,
             length(text) AS n_chars
      FROM documents
    )
    SELECT 'n_docs' AS metric, COUNT(*)::DOUBLE AS value FROM ws
    UNION ALL
    SELECT 'total_tokens', SUM(n_tok)::DOUBLE FROM ws
    UNION ALL
    SELECT 'mean_doc_tokens', ROUND(AVG(n_tok), 6) FROM ws
    UNION ALL
    SELECT 'total_chars', SUM(n_chars)::DOUBLE FROM ws
    UNION ALL
    SELECT 'n_langs', COUNT(DISTINCT lang)::DOUBLE FROM ws
    UNION ALL
    SELECT 'n_sources', COUNT(DISTINCT source)::DOUBLE FROM ws
    UNION ALL
    SELECT 'exact_dup_docs',
           (COUNT(*) - COUNT(DISTINCT md5(text)))::DOUBLE FROM documents
    """,
)
def q200_corpus_card(spark, sf_dir):
    """The one-page corpus datasheet (size, token mass, language and
    source breadth, exact-dup mass) as (metric, value) rows — every
    component is a single-pass aggregate over one scan, union'd free;
    the summary a dataset release ships next to the data."""
    d = _t(spark, sf_dir, "documents")
    n_tok = F.size(
        F.filter(F.split(F.trim(F.col("text")), "\\s+"), lambda w: w != "")
    )
    ws = d.select(
        "lang", "source", n_tok.alias("n_tok"),
        F.length("text").alias("n_chars"), F.md5("text").alias("_h"),
    )
    agg = ws.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.sum("n_tok").cast("double").alias("total_tokens"),
        F.round(F.avg("n_tok"), 6).alias("mean_doc_tokens"),
        F.sum("n_chars").cast("double").alias("total_chars"),
        F.countDistinct("lang").cast("double").alias("n_langs"),
        F.countDistinct("source").cast("double").alias("n_sources"),
        (F.count(F.lit(1)) - F.countDistinct("_h"))
        .cast("double")
        .alias("exact_dup_docs"),
    )
    pairs = ", ".join(
        f"'{m}', `{m}`"
        for m in (
            "n_docs", "total_tokens", "mean_doc_tokens", "total_chars",
            "n_langs", "n_sources", "exact_dup_docs",
        )
    )
    return agg.selectExpr(f"stack(7, {pairs}) AS (metric, value)")


@register(
    "q201_asof_nearest",
    """
    WITH p AS (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'purchase'),
    c AS (SELECT user_id, ts, MAX(value) AS v FROM events
          WHERE event_type = 'click' GROUP BY 1, 2),
    sel AS (
      SELECT p.event_id, p.user_id, epoch(p.ts) AS lts,
             (SELECT MAX(epoch(c.ts)) FROM c
              WHERE c.user_id = p.user_id AND c.ts <= p.ts) AS bts,
             (SELECT MIN(epoch(c.ts)) FROM c
              WHERE c.user_id = p.user_id AND c.ts >= p.ts) AS fts
      FROM p),
    pick AS (
      SELECT event_id, user_id, lts,
             CASE WHEN bts IS NOT NULL
                   AND (fts IS NULL OR lts - bts <= fts - lts)
                  THEN bts ELSE fts END AS mts
      FROM sel)
    SELECT pk.event_id, pk.user_id,
           CASE WHEN pk.mts IS NOT NULL AND ABS(pk.lts - pk.mts) <= 900
                THEN c.v END AS nearest_click_value
    FROM pick pk
    LEFT JOIN c ON c.user_id = pk.user_id AND epoch(c.ts) = pk.mts
    """,
)
def q201_asof_nearest(spark, sf_dir):
    """As-of NEAREST join (completes pandas merge_asof direction
    parity with q22 backward / q142 forward / q160 tolerance): each
    purchase takes the click closest in time within 15 minutes, ties
    backward.  Both running fills ride ONE keyed shuffle (same
    partitioning, two sort orders); clicks collapse to one row per
    (user, ts) so equal-timestamp matches are deterministic."""
    e = _t(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("nearest_click_value"))
    )
    out = R.asof_join(
        p, c, on="user_id", left_ts="ts", right_ts="ts",
        value_cols=["nearest_click_value"], direction="nearest",
        tolerance=900,
    )
    return out.select("event_id", "user_id", "nearest_click_value")


@register(
    "q202_oov_rate",
    r"""
    WITH tok AS (
      SELECT doc_id, UNNEST(list_filter(
               string_split_regex(trim(lower(text)), '\s+'),
               w -> w <> '')) AS w
      FROM documents
    ),
    vocab AS (
      SELECT w FROM (
        SELECT w, COUNT(*) AS c,
               ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, w ASC) AS rn
        FROM tok GROUP BY w
      ) WHERE rn <= 1000
    )
    SELECT t.doc_id, COUNT(*)::BIGINT AS n_tokens,
           SUM(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_oov,
           ROUND(SUM(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END)
                 / COUNT(*)::DOUBLE, 6) AS oov_rate
    FROM tok t LEFT JOIN vocab v USING (w)
    GROUP BY t.doc_id
    """,
)
def q202_oov_rate(spark, sf_dir):
    """Out-of-vocabulary rate per document against the corpus's own
    top-1000 vocabulary (count-desc, word-asc tiebreak — the
    fixed-vocab tokenizer coverage question): one token agg builds the
    Zipf-bounded vocabulary, TakeOrdered truncates it, and the
    broadcast left-anti-style membership join never shuffles the token
    stream."""
    d = _t(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        F.explode(
            F.filter(
                F.split(F.trim(F.lower(F.col("text"))), "\\s+"),
                lambda w: w != "",
            )
        ).alias("w"),
    )
    # orderBy+limit compiles to TakeOrderedAndProject — per-partition
    # top-k merged at the driver, never a single-partition sort of the
    # full vocabulary; the (count desc, word asc) key makes it
    # deterministic
    vocab = (
        tok.groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), F.asc("w"))
        .limit(1000)
        .select("w", F.lit(True).alias("_inv"))
    )
    return (
        tok.join(F.broadcast(vocab), "w", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.col("_inv").isNull().cast("long")).alias("n_oov"),
            F.round(
                F.sum(F.col("_inv").isNull().cast("long"))
                / F.count(F.lit(1)),
                6,
            ).alias("oov_rate"),
        )
    )


@register(
    "q203_streaming_topk",
    """
    WITH c AS (
      SELECT DATE_TRUNC('hour', ts) AS window_start, event_type,
             COUNT(*) AS n
      FROM events GROUP BY 1, 2
    ),
    r AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY window_start
                 ORDER BY n DESC, event_type ASC) AS rank
      FROM c
    )
    SELECT window_start, event_type, n, rank FROM r WHERE rank <= 3
    """,
)
def q203_streaming_topk(spark, sf_dir):
    """Streaming windowed top-k (the trending-items shape): the
    UNBOUNDED part — per-window counts — runs as a true Structured
    Streaming query (watermark + tumbling window, availableNow); the
    rank-and-truncate runs as a batch post-pass on the materialized
    sink table, the standard split since ranking needs the window
    closed.  Sink table is window-bounded, so the post-pass is tiny."""
    stream = _stream_events(spark, sf_dir)
    counts = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("window.start").alias("window_start"), "event_type", "n"
        )
    )
    table = _run_stream_to_table(spark, counts, "topk")
    w = Window.partitionBy("window_start").orderBy(
        F.desc("n"), F.asc("event_type")
    )
    return (
        table.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
    )


_POISSON1_CDF = [
    (0, 0.367879441), (1, 0.735758882), (2, 0.919698603),
    (3, 0.981011843), (4, 0.996340153), (5, 0.999405815),
    (6, 0.999916758), (7, 0.999989750),
]


def _bootstrap_oracle_sql(n_boot: int = 20) -> str:
    """Deterministic Poisson bootstrap of mean(l_quantity): per (row,
    replica) the md5-uniform drives a Poisson(1) inverse-CDF weight."""
    case = " ".join(
        f"WHEN u < {p} THEN {k}" for k, p in _POISSON1_CDF
    )
    return f"""
    WITH r AS (
      SELECT l_quantity AS x,
             CAST(l_orderkey AS VARCHAR) || '-'
               || CAST(l_linenumber AS VARCHAR) AS rid
      FROM lineitem
    ),
    rep AS (
      SELECT x, rid, UNNEST(range(1, {n_boot} + 1)) AS b FROM r
    ),
    wtd AS (
      SELECT b, x,
             (CASE {case} ELSE 8 END) AS w
      FROM (SELECT b, x,
              (('0x' || substr(md5(rid || ':' || CAST(b AS VARCHAR)),
                 1, 15))::BIGINT % 1000000) / 1e6 AS u
            FROM rep)
    )
    SELECT b, ROUND(SUM(w * x) / SUM(w), 6) AS est
    FROM wtd GROUP BY b
    """


@register("q204_bootstrap_mean", _bootstrap_oracle_sql())
def q204_bootstrap_mean(spark, sf_dir):
    """Poisson bootstrap of mean(quantity), 20 replicas — THE
    distributed resampling technique: true multinomial resampling
    needs global coordination, but per-row independent Poisson(1)
    weights approximate it exactly in expectation and partial-combine
    like any aggregate.  Deterministic md5-uniform draws make every
    replica value-checkable; the 20× replica explode collapses
    map-side to 20 partial rows before the only shuffle."""
    li = _t(spark, sf_dir, "lineitem")
    rid = F.concat_ws(
        "-",
        F.col("l_orderkey").cast("string"),
        F.col("l_linenumber").cast("string"),
    )
    rep = li.select(
        F.col("l_quantity").alias("x"), rid.alias("rid")
    ).select(
        "x", "rid", F.explode(F.sequence(F.lit(1), F.lit(20))).alias("b")
    )
    u = (
        F.pmod(
            T.md5_hash60(
                F.concat(F.col("rid"), F.lit(":"), F.col("b").cast("string"))
            ),
            F.lit(1_000_000),
        )
        / F.lit(1e6)
    )
    w = F.lit(8)
    for k, p in reversed(_POISSON1_CDF):
        w = F.when(u < p, k).otherwise(w)
    return (
        rep.withColumn("w", w)
        .groupBy("b")
        .agg(
            F.round(
                F.sum(F.col("w") * F.col("x")) / F.sum("w"), 6
            ).alias("est")
        )
    )


@register(
    "q205_groupwise_regression",
    """
    SELECT user_id,
           COUNT(*)::BIGINT AS n,
           ROUND(REGR_SLOPE(value, epoch(ts)), 6) + 0.0 AS slope,
           ROUND(REGR_INTERCEPT(value, epoch(ts)), 6) + 0.0 AS intercept,
           ROUND(REGR_R2(value, epoch(ts)), 6) + 0.0 AS r2
    FROM events
    GROUP BY user_id
    """,
)
def q205_groupwise_regression(spark, sf_dir):
    """Per-key ordinary least squares (value ~ time) via the
    sufficient-statistics aggregates — slope, intercept, and R² for
    every user in ONE map-side-combined agg pass: regression at any
    group count without per-group fitting loops."""
    e = _t(spark, sf_dir, "events")
    x = F.col("ts").cast("double")
    return e.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        # + 0.0 canonicalizes IEEE negative zero — the engines round
        # tiny negative slopes to -0.0 vs 0.0 inconsistently
        (F.round(F.regr_slope(F.col("value"), x), 6) + 0.0).alias("slope"),
        (F.round(F.regr_intercept(F.col("value"), x), 6) + 0.0).alias(
            "intercept"
        ),
        (F.round(F.regr_r2(F.col("value"), x), 6) + 0.0).alias("r2"),
    )


@register(
    "q206_token_apportionment",
    r"""
    WITH s AS (
      SELECT source,
             SUM(len(list_filter(string_split_regex(trim(text), '\s+'),
                                 w -> w <> '')))::DOUBLE AS toks
      FROM documents GROUP BY source
    ),
    q AS (
      SELECT source, toks,
             toks * 100000 / (SELECT SUM(toks) FROM s) AS quota
      FROM s
    ),
    r AS (
      SELECT source, toks, quota,
             CAST(FLOOR(quota) AS BIGINT) AS base,
             ROW_NUMBER() OVER (ORDER BY quota - FLOOR(quota) DESC,
                                source ASC) AS rnk
      FROM q
    )
    SELECT source, toks::BIGINT AS n_tokens,
           (base + CASE WHEN rnk <= 100000 - (SELECT SUM(base) FROM r)
                        THEN 1 ELSE 0 END)::BIGINT AS budget
    FROM r
    """,
)
def q206_token_apportionment(spark, sf_dir):
    """Integer apportionment of a 100k-token training budget across
    sources by largest-remainder (Hamilton) rounding — the sampling
    budgets every corpus-mixing config needs to sum EXACTLY to the
    total: floors + rank-the-remainders, all over the |sources|-row
    collapsed table (the only window is source-count-bounded)."""
    d = _t(spark, sf_dir, "documents")
    total_budget = 100_000
    n_tok = F.size(
        F.filter(F.split(F.trim(F.col("text")), "\\s+"), lambda w: w != "")
    )
    s = d.groupBy("source").agg(
        F.sum(n_tok).cast("double").alias("toks")
    )
    tot = s.agg(F.sum("toks").alias("_t"))
    q = s.crossJoin(F.broadcast(tot)).withColumn(
        "quota", F.col("toks") * total_budget / F.col("_t")
    )
    w = Window.orderBy(
        F.desc(F.col("quota") - F.floor("quota")), F.asc("source")
    )
    r = q.withColumn("base", F.floor("quota").cast("long")).withColumn(
        "rnk", F.row_number().over(w)
    )
    short = r.agg(
        (F.lit(total_budget) - F.sum("base")).alias("_short")
    )
    return (
        r.crossJoin(F.broadcast(short))
        .select(
            "source",
            F.col("toks").cast("long").alias("n_tokens"),
            (
                F.col("base")
                + (F.col("rnk") <= F.col("_short")).cast("long")
            ).alias("budget"),
        )
    )


@register(
    "q207_wilson_ci",
    """
    WITH d AS (
      SELECT CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
             user_id,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS purchased
      FROM events GROUP BY 1, 2
    ),
    r AS (
      SELECT day, COUNT(*)::DOUBLE AS n, SUM(purchased)::DOUBLE AS k
      FROM d GROUP BY day
    )
    SELECT day, n::BIGINT AS n_users, k::BIGINT AS n_converted,
           ROUND(k / n, 6) AS rate,
           ROUND(((k/n) + 1.9207592/n
                  - 1.959964 * sqrt((k/n)*(1-(k/n))/n
                                    + 0.9603796/(n*n)))
                 / (1 + 3.8415184/n), 6) AS wilson_lo,
           ROUND(((k/n) + 1.9207592/n
                  + 1.959964 * sqrt((k/n)*(1-(k/n))/n
                                    + 0.9603796/(n*n)))
                 / (1 + 3.8415184/n), 6) AS wilson_hi
    FROM r
    """,
)
def q207_wilson_ci(spark, sf_dir):
    """Daily conversion rate with the Wilson 95% score interval — the
    CI that stays sane at small n and extreme rates (unlike the normal
    approximation): two hash aggs collapse to the calendar, the
    interval is a closed-form scan expression (z = 1.959964,
    z² = 3.8415184, z²/2 = 1.9207592, z⁴/4 = 0.9603796)."""
    e = _t(spark, sf_dir, "events")
    d = (
        e.groupBy(
            F.floor(F.col("ts").cast("long") / 86400)
            .cast("long")
            .alias("day"),
            "user_id",
        )
        .agg(
            F.max(
                (F.col("event_type") == "purchase").cast("int")
            ).alias("purchased")
        )
    )
    r = d.groupBy("day").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("purchased").cast("double").alias("k"),
    )
    p = F.col("k") / F.col("n")
    z, z2, z2h, z4q = 1.959964, 3.8415184, 1.9207592, 0.9603796
    rad = F.sqrt(p * (1 - p) / F.col("n") + z4q / (F.col("n") * F.col("n")))
    return r.select(
        "day",
        F.col("n").cast("long").alias("n_users"),
        F.col("k").cast("long").alias("n_converted"),
        F.round(p, 6).alias("rate"),
        F.round((p + z2h / F.col("n") - z * rad) / (1 + z2 / F.col("n")), 6)
        .alias("wilson_lo"),
        F.round((p + z2h / F.col("n") + z * rad) / (1 + z2 / F.col("n")), 6)
        .alias("wilson_hi"),
    )


@register(
    "q208_bounce_rate",
    """
    WITH s AS (
      SELECT user_id, ts,
             SUM(CASE WHEN prev IS NULL OR epoch(ts) - prev > 1800
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts
                     ROWS UNBOUNDED PRECEDING) AS session_seq
      FROM (SELECT user_id, ts,
                   LAG(epoch(ts)) OVER (PARTITION BY user_id
                                        ORDER BY ts) AS prev
            FROM events)
    ),
    per AS (
      SELECT user_id, session_seq, COUNT(*) AS n_events
      FROM s GROUP BY 1, 2
    )
    SELECT user_id, COUNT(*)::BIGINT AS n_sessions,
           SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)::BIGINT
             AS n_bounces,
           ROUND(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)
                 / COUNT(*)::DOUBLE, 6) AS bounce_rate
    FROM per GROUP BY user_id
    """,
)
def q208_bounce_rate(spark, sf_dir):
    """Single-event-session (bounce) fraction per user — q89's
    sessionization collapsed twice on the same user partitioning: the
    engagement-quality metric next to the session table itself."""
    e = _t(spark, sf_dir, "events")
    s = R.sessionize(e.select("user_id", "ts"), "user_id", "ts", 1800)
    per = s.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    return per.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum((F.col("n_events") == 1).cast("long")).alias("n_bounces"),
        F.round(
            F.sum((F.col("n_events") == 1).cast("long"))
            / F.count(F.lit(1)),
            6,
        ).alias("bounce_rate"),
    )


@register(
    "q209_label_dim_stats",
    """
    WITH d AS (
      SELECT label, UNNEST(embedding)::DOUBLE AS v,
             generate_subscripts(embedding, 1) AS dim
      FROM embeddings
    )
    SELECT label, dim, COUNT(*)::BIGINT AS n,
           ROUND(AVG(v), 6) AS mean,
           ROUND(STDDEV_SAMP(v), 6) AS std
    FROM d GROUP BY label, dim
    """,
)
def q209_label_dim_stats(spark, sf_dir):
    """Per-LABEL dimension-wise embedding statistics — q147's global
    audit keyed by class: the per-class mean/σ drift check before
    classifier training (a class whose dimensions shifted is a
    labeling or ingest bug).  posexplode + one (label, dim)-keyed hash
    agg, never a driver-side matrix."""
    emb = _t(spark, sf_dir, "embeddings")
    d = emb.select(
        "label",
        F.posexplode(F.col("embedding").cast("array<double>")).alias(
            "_p", "v"
        ),
    ).select("label", (F.col("_p") + 1).alias("dim"), "v")
    return d.groupBy("label", "dim").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("v"), 6).alias("mean"),
        F.round(F.stddev_samp("v"), 6).alias("std"),
    )


@register(
    "q210_degree_histogram",
    """
    WITH e AS (
      SELECT DISTINCT l_orderkey % 500 AS src, l_partkey % 500 AS dst
      FROM lineitem WHERE l_orderkey % 500 <> l_partkey % 500
    ),
    deg AS (SELECT src, COUNT(*)::BIGINT AS d FROM e GROUP BY src)
    SELECT CAST(FLOOR(LOG2(d)) AS BIGINT) AS log2_bucket,
           COUNT(*)::BIGINT AS n_vertices,
           MIN(d)::BIGINT AS d_min, MAX(d)::BIGINT AS d_max
    FROM deg GROUP BY 1
    """,
)
def q210_degree_histogram(spark, sf_dir):
    """Log-binned out-degree histogram — the visual companion of
    q190's power-law MLE (straight line in log-log ⇒ heavy tail):
    degree agg + a ~log(d_max)-row bucket agg."""
    li = _t(spark, sf_dir, "lineitem")
    deg = (
        li.select(
            (F.col("l_orderkey") % 500).alias("src"),
            (F.col("l_partkey") % 500).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .groupBy("src")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    return deg.groupBy(
        F.floor(F.log2("d")).cast("long").alias("log2_bucket")
    ).agg(
        F.count(F.lit(1)).alias("n_vertices"),
        F.min("d").alias("d_min"),
        F.max("d").alias("d_max"),
    )


@register(
    "q211_interarrival_median",
    """
    WITH g AS (
      SELECT user_id,
             epoch(ts) - LAG(epoch(ts)) OVER (PARTITION BY user_id
                                              ORDER BY ts, event_id) AS gap
      FROM events
    )
    SELECT user_id, COUNT(*)::BIGINT AS n_gaps,
           ROUND(quantile_cont(gap, 0.5), 6) AS median_gap,
           ROUND(quantile_cont(gap, 0.9), 6) AS p90_gap
    FROM g WHERE gap IS NOT NULL
    GROUP BY user_id
    """,
)
def q211_interarrival_median(spark, sf_dir):
    """Median and P90 inter-arrival gap per user (the traffic-cadence
    profile behind session-gap and rate-limit tuning): one lag window
    + one exact-percentile agg on the same user partitioning."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    g = e.select(
        "user_id",
        (
            F.col("ts").cast("double")
            - F.lag(F.col("ts").cast("double")).over(w)
        ).alias("gap"),
    ).filter(F.col("gap").isNotNull())
    return g.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.round(F.percentile("gap", F.lit(0.5)), 6).alias("median_gap"),
        F.round(F.percentile("gap", F.lit(0.9)), 6).alias("p90_gap"),
    )


@register(
    "q212_avg_neighbor_degree",
    """
    WITH e AS (
      SELECT DISTINCT l_orderkey % 500 AS src, l_partkey % 500 AS dst
      FROM lineitem WHERE l_orderkey % 500 <> l_partkey % 500
    ),
    deg AS (SELECT src AS id, COUNT(*)::DOUBLE AS d FROM e GROUP BY src)
    SELECT e.src AS id, COUNT(*)::BIGINT AS n_nbrs,
           ROUND(AVG(nd.d), 6) AS avg_nbr_degree
    FROM e JOIN deg nd ON nd.id = e.dst
    GROUP BY e.src
    """,
)
def q212_avg_neighbor_degree(spark, sf_dir):
    """Average out-degree of each vertex's out-neighbors — the local
    form of q135's assortativity (rich-club vs hub-and-spoke mixing,
    per vertex): one degree agg broadcast onto the edge scan, one
    per-vertex agg.  Neighbors with no out-edges contribute no rows,
    matching the degree table's support."""
    g = _mod_graph(spark, sf_dir)
    e = g.edges.select("src", "dst")
    deg = e.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).cast("double").alias("d")
    )
    nd = deg.select(F.col("id").alias("dst"), F.col("d").alias("_nd"))
    return (
        e.join(nd, "dst")
        .groupBy(F.col("src").alias("id"))
        .agg(
            F.count(F.lit(1)).alias("n_nbrs"),
            F.round(F.avg("_nd"), 6).alias("avg_nbr_degree"),
        )
    )


@register(
    "q213_trending_terms",
    r"""
    WITH tok AS (
      SELECT doc_id % 2 AS half,
             UNNEST(list_filter(
               string_split_regex(trim(lower(text)), '\s+'),
               w -> w <> '')) AS w
      FROM documents
    ),
    c AS (
      SELECT w,
             SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END)::DOUBLE AS ca,
             SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END)::DOUBLE AS cb
      FROM tok GROUP BY w
    )
    SELECT w AS term, ca::BIGINT AS n_a, cb::BIGINT AS n_b,
           ROUND(ln((cb + 1) / (ca + 1)), 6) AS growth
    FROM c
    ORDER BY ln((cb + 1) / (ca + 1)) DESC, w ASC
    LIMIT 20
    """,
)
def q213_trending_terms(spark, sf_dir):
    """Trending terms between two corpus halves (add-1 smoothed
    log-growth — the burst/shift detector run between crawl
    snapshots): one tokenize, one term-keyed pivot agg, TakeOrdered
    top-20.  The doc-parity split stands in for time snapshots."""
    d = _t(spark, sf_dir, "documents")
    tok = d.select(
        (F.col("doc_id") % 2).alias("half"),
        F.explode(
            F.filter(
                F.split(F.trim(F.lower(F.col("text"))), "\\s+"),
                lambda w: w != "",
            )
        ).alias("w"),
    )
    c = tok.groupBy("w").agg(
        F.sum((F.col("half") == 0).cast("double")).alias("ca"),
        F.sum((F.col("half") == 1).cast("double")).alias("cb"),
    )
    growth = F.log((F.col("cb") + 1) / (F.col("ca") + 1))
    return (
        c.select(
            F.col("w").alias("term"),
            F.col("ca").cast("long").alias("n_a"),
            F.col("cb").cast("long").alias("n_b"),
            F.round(growth, 6).alias("growth"),
            growth.alias("_g"),
        )
        .orderBy(F.desc("_g"), F.asc("term"))
        .limit(20)
        .drop("_g")
    )


@register(
    "q214_pareto_coverage",
    """
    WITH r AS (
      SELECT l_returnflag,
             SUM(l_extendedprice) AS rev,
             l_partkey
      FROM lineitem GROUP BY l_returnflag, l_partkey
    ),
    c AS (
      SELECT l_returnflag, rev,
             SUM(rev) OVER (PARTITION BY l_returnflag
                            ORDER BY rev DESC, l_partkey ASC
                            ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(rev) OVER (PARTITION BY l_returnflag) AS tot,
             ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                ORDER BY rev DESC, l_partkey ASC) AS rn
      FROM r
    )
    SELECT l_returnflag, COUNT(*)::BIGINT AS n_parts,
           MIN(CASE WHEN cum >= 0.8 * tot THEN rn END)::BIGINT
             AS parts_for_80pct,
           ROUND(MIN(CASE WHEN cum >= 0.8 * tot THEN rn END)
                 / COUNT(*)::DOUBLE, 6) AS concentration
    FROM c GROUP BY l_returnflag
    """,
)
def q214_pareto_coverage(spark, sf_dir):
    """Pareto 80/20 concentration: per return flag, how many parts
    cover 80% of revenue — the corpus/catalog concentration question
    (a tiny answer ⇒ hub-heavy, plan for skew).  Collapse to (flag,
    part) revenue first, then cumulative + rank windows on the
    flag partitioning, one final agg."""
    li = _t(spark, sf_dir, "lineitem")
    r = li.groupBy("l_returnflag", "l_partkey").agg(
        F.sum("l_extendedprice").alias("rev")
    )
    order = [F.desc("rev"), F.asc("l_partkey")]
    wc = (
        Window.partitionBy("l_returnflag")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wt = Window.partitionBy("l_returnflag")
    wr = Window.partitionBy("l_returnflag").orderBy(*order)
    c = r.select(
        "l_returnflag",
        F.sum("rev").over(wc).alias("cum"),
        F.sum("rev").over(wt).alias("tot"),
        F.row_number().over(wr).alias("rn"),
    )
    hit = F.when(F.col("cum") >= 0.8 * F.col("tot"), F.col("rn"))
    return c.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.min(hit).alias("parts_for_80pct"),
        F.round(F.min(hit) / F.count(F.lit(1)), 6).alias("concentration"),
    )


@register(
    "q215_padding_curve",
    r"""
    WITH t AS (
      SELECT len(list_filter(string_split_regex(trim(text), '\s+'),
                             w -> w <> '')) AS n_tok
      FROM documents
    ),
    sizes AS (SELECT UNNEST([256, 512, 1024, 2048]) AS win),
    x AS (
      SELECT win, n_tok,
             CAST(CEIL(n_tok / win::DOUBLE) AS BIGINT) * win AS padded
      FROM t CROSS JOIN sizes WHERE n_tok > 0
    )
    SELECT win, SUM(n_tok)::BIGINT AS total_tokens,
           SUM(padded)::BIGINT AS padded_tokens,
           ROUND(1.0 - SUM(n_tok) / SUM(padded)::DOUBLE, 6)
             AS waste_ratio
    FROM x GROUP BY win
    """,
)
def q215_padding_curve(spark, sf_dir):
    """Padding-waste curve across candidate context-window sizes (each
    doc chunked to ⌈n/W⌉ windows and padded): the one-scan answer to
    "which training window size wastes least" — the 4× size explode
    collapses map-side to 4 rows.  Complements q188's power-of-two
    bucketing with the chunked-document accounting."""
    d = _t(spark, sf_dir, "documents")
    n_tok = F.size(
        F.filter(F.split(F.trim(F.col("text")), "\\s+"), lambda w: w != "")
    )
    x = (
        d.select(n_tok.alias("n_tok"))
        .filter(F.col("n_tok") > 0)
        .select(
            "n_tok",
            F.explode(F.array(*[F.lit(w) for w in (256, 512, 1024, 2048)]))
            .alias("win"),
        )
        .withColumn(
            "padded",
            F.ceil(F.col("n_tok") / F.col("win")).cast("long")
            * F.col("win"),
        )
    )
    return x.groupBy("win").agg(
        F.sum("n_tok").alias("total_tokens"),
        F.sum("padded").alias("padded_tokens"),
        F.round(1.0 - F.sum("n_tok") / F.sum("padded"), 6).alias(
            "waste_ratio"
        ),
    )


@register(
    "q216_source_length_deciles",
    """
    SELECT source,
           COUNT(*)::BIGINT AS n_docs,
           ROUND(quantile_cont(n_chars, 0.1), 6) AS p10,
           ROUND(quantile_cont(n_chars, 0.5), 6) AS p50,
           ROUND(quantile_cont(n_chars, 0.9), 6) AS p90
    FROM documents GROUP BY source
    """,
)
def q216_source_length_deciles(spark, sf_dir):
    """Per-source document-length distribution profile (P10/P50/P90 of
    n_chars) — the at-a-glance shape comparison across feeds before
    mixing; one exact-percentile agg per source."""
    d = _t(spark, sf_dir, "documents")
    return d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.percentile("n_chars", F.lit(0.1)), 6).alias("p10"),
        F.round(F.percentile("n_chars", F.lit(0.5)), 6).alias("p50"),
        F.round(F.percentile("n_chars", F.lit(0.9)), 6).alias("p90"),
    )


@register(
    "q217_user_entropy",
    """
    WITH c AS (
      SELECT user_id, event_type, COUNT(*)::DOUBLE AS n
      FROM events GROUP BY 1, 2
    )
    SELECT user_id, SUM(n)::BIGINT AS n_events,
           COUNT(*)::BIGINT AS n_types,
           ROUND(ln(SUM(n)) - SUM(n * ln(n)) / SUM(n), 6) AS entropy
    FROM c GROUP BY user_id
    """,
)
def q217_user_entropy(spark, sf_dir):
    """Behavioral diversity per user: Shannon entropy of each user's
    event-type distribution via the same ln N − (Σ n·ln n)/N identity
    as q178 — two aggs on one user partitioning; 0 = single-action
    bots, ln(n_types) = uniform explorers."""
    e = _t(spark, sf_dir, "events")
    c = e.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n")
    )
    n_tot = F.sum("n")
    return c.groupBy("user_id").agg(
        n_tot.cast("long").alias("n_events"),
        F.count(F.lit(1)).alias("n_types"),
        F.round(
            F.log(n_tot) - F.sum(F.col("n") * F.log("n")) / n_tot, 6
        ).alias("entropy"),
    )


@register(
    "q218_time_to_convert",
    """
    WITH m AS (
      SELECT p.event_id, epoch(p.ts) - epoch(c.ts) AS latency
      FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      ASOF JOIN (SELECT * FROM events WHERE event_type = 'click') c
        ON p.user_id = c.user_id AND c.ts <= p.ts
    )
    SELECT COUNT(*)::BIGINT AS n_conversions,
           ROUND(quantile_cont(latency, 0.5), 6) AS median_latency,
           ROUND(quantile_cont(latency, 0.9), 6) AS p90_latency,
           ROUND(AVG(latency), 6) AS mean_latency
    FROM m
    """,
)
def q218_time_to_convert(spark, sf_dir):
    """Click-to-purchase latency distribution (median/P90/mean seconds
    from each purchase back to its most recent click) — q22's as-of
    machinery carrying the matched timestamp, collapsed to the
    attribution-lag profile marketing models calibrate on."""
    e = _t(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    c = e.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("ts").cast("double").alias("click_ts")
    )
    matched = R.asof_join(
        p, c, on="user_id", left_ts="ts", right_ts="ts",
        value_cols=["click_ts"], direction="backward",
    ).filter(F.col("click_ts").isNotNull())
    lat = F.col("ts").cast("double") - F.col("click_ts")
    return matched.select(lat.alias("latency")).agg(
        F.count(F.lit(1)).alias("n_conversions"),
        F.round(F.percentile("latency", F.lit(0.5)), 6).alias(
            "median_latency"
        ),
        F.round(F.percentile("latency", F.lit(0.9)), 6).alias(
            "p90_latency"
        ),
        F.round(F.avg("latency"), 6).alias("mean_latency"),
    )


@register(
    "q219_jaccard_threshold_curve",
    """
    WITH sh AS (
      SELECT doc_id, list_distinct(list_transform(
               range(1, GREATEST(length(text) - 2, 0) + 1),
               i -> substr(text, i, 3))) AS grams
      FROM documents WHERE doc_id < 100
    ),
    inv AS (SELECT doc_id, UNNEST(grams) AS g FROM sh),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
      FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    j AS (
      SELECT CAST(i AS DOUBLE)
               / (len(sa.grams) + len(sb.grams) - i) AS jac
      FROM inter
      JOIN sh sa ON sa.doc_id = id_a
      JOIN sh sb ON sb.doc_id = id_b
    ),
    t AS (SELECT UNNEST([0.5, 0.6, 0.7, 0.8, 0.9]) AS threshold)
    SELECT t.threshold, COUNT(CASE WHEN j.jac >= t.threshold THEN 1 END)
             ::BIGINT AS n_pairs
    FROM t LEFT JOIN j ON TRUE
    GROUP BY t.threshold
    """,
)
def q219_jaccard_threshold_curve(spark, sf_dir):
    """Near-dup pair count at five Jaccard thresholds from ONE inverted
    index pass — the dedup-threshold sensitivity curve that tells you
    what a 0.1 threshold change costs before running the full
    pipeline.  The pair table is computed once at the loosest
    threshold; the curve is a 5-row conditional agg over it."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    pairs = D.ngram_jaccard_pairs(
        d, "doc_id", "text", n=3, threshold=0.0, max_df=1000
    )
    th = F.explode(
        F.array(*[F.lit(t) for t in (0.5, 0.6, 0.7, 0.8, 0.9)])
    ).alias("threshold")
    crossed = pairs.select("jaccard").crossJoin(
        spark.range(1).select(th)
    )
    return (
        spark.range(1)
        .select(th)
        .join(
            crossed.filter(
                F.col("jaccard") >= F.col("threshold")
            ).groupBy("threshold").agg(F.count(F.lit(1)).alias("_n")),
            "threshold",
            "left",
        )
        .select(
            "threshold",
            F.coalesce("_n", F.lit(0)).cast("long").alias("n_pairs"),
        )
    )


@register(
    "q220_weighted_reservoir",
    f"""
    WITH s AS (
      SELECT doc_id, n_chars,
             ({_MD5_BUCKET.format(col='doc_id', seed=0)} + 0.5) / 1e6 AS u
      FROM documents WHERE n_chars > 0
    )
    SELECT doc_id, n_chars FROM (
      SELECT doc_id, n_chars, POWER(u, 1.0 / n_chars) AS pri
      FROM s ORDER BY pri DESC, doc_id ASC LIMIT 50
    )
    """,
)
def q220_weighted_reservoir(spark, sf_dir):
    """Exactly-50 weighted sample without replacement, probability ∝
    document length — Efraimidis–Spirakis A-Res priorities u^(1/w)
    with md5-deterministic draws; selection is TakeOrderedAndProject
    (`sampling.weighted_reservoir_k`).  Complements q118's
    Bernoulli-by-weight (random size) and q133's uniform fixed-k."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return SMP.weighted_reservoir_k(d, "doc_id", "n_chars", k=50, seed=0)


@register(
    "q221_whitened_norms",
    """
    WITH d AS (
      SELECT vec_id, UNNEST(embedding)::DOUBLE AS v,
             generate_subscripts(embedding, 1) AS dim
      FROM embeddings
    ),
    stats AS (
      SELECT dim, AVG(v) AS mu, STDDEV_SAMP(v) AS sd
      FROM d GROUP BY dim
    )
    SELECT d.vec_id,
           ROUND(sqrt(SUM(POWER((d.v - s.mu) / s.sd, 2))), 6)
             AS whitened_norm
    FROM d JOIN stats s ON s.dim = d.dim
    WHERE s.sd > 0
    GROUP BY d.vec_id
    """,
)
def q221_whitened_norms(spark, sf_dir):
    """L2 norm of each embedding after per-dimension standardization
    (z-score whitening) — the Mahalanobis-diagonal outlier score for
    vector stores: a norm far above √dim flags an embedding generated
    under a different model or preprocessing.  One posexplode, one
    dim-keyed stats agg broadcast back, one per-vector agg — never a
    driver-side matrix."""
    emb = _t(spark, sf_dir, "embeddings")
    d = emb.select(
        "vec_id",
        F.posexplode(F.col("embedding").cast("array<double>")).alias(
            "dim", "v"
        ),
    )
    stats = d.groupBy("dim").agg(
        F.avg("v").alias("mu"), F.stddev_samp("v").alias("sd")
    )
    return (
        d.join(F.broadcast(stats), "dim")
        .filter(F.col("sd") > 0)
        .groupBy("vec_id")
        .agg(
            F.round(
                F.sqrt(
                    F.sum(
                        F.pow((F.col("v") - F.col("mu")) / F.col("sd"), 2)
                    )
                ),
                6,
            ).alias("whitened_norm")
        )
    )


@register(
    "q222_regression_outliers",
    """
    WITH fit AS (
      SELECT user_id,
             REGR_SLOPE(value, epoch(ts)) AS b,
             REGR_INTERCEPT(value, epoch(ts)) AS a
      FROM events GROUP BY user_id
    ),
    res AS (
      SELECT e.event_id, e.user_id,
             ABS(e.value - (f.a + f.b * epoch(e.ts))) AS abs_resid
      FROM events e JOIN fit f USING (user_id)
    )
    SELECT event_id, user_id, ROUND(abs_resid, 6) AS abs_resid
    FROM res ORDER BY abs_resid DESC, event_id ASC LIMIT 25
    """,
)
def q222_regression_outliers(spark, sf_dir):
    """Model-based anomaly detection: the 25 events farthest from
    their user's own OLS trend line — q205's sufficient-statistics fit
    broadcast back onto the scan, residuals ranked by TakeOrdered.
    Flags the 'right value, wrong trajectory' anomalies a global
    z-score misses."""
    e = _t(spark, sf_dir, "events")
    x = F.col("ts").cast("double")
    fit = e.groupBy("user_id").agg(
        F.regr_slope(F.col("value"), x).alias("b"),
        F.regr_intercept(F.col("value"), x).alias("a"),
    )
    res = e.join(F.broadcast(fit), "user_id").select(
        "event_id",
        "user_id",
        F.abs(
            F.col("value")
            - (F.col("a") + F.col("b") * F.col("ts").cast("double"))
        ).alias("_r"),
    )
    return (
        res.orderBy(F.desc("_r"), F.asc("event_id"))
        .limit(25)
        .select("event_id", "user_id", F.round("_r", 6).alias("abs_resid"))
    )


@register(
    "q223_rfm_segmentation",
    """
    WITH mx AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS md FROM orders),
    rfm AS (
      SELECT o_custkey,
             date_diff('day', MAX(CAST(o_orderdate AS DATE)),
                       (SELECT md FROM mx)) AS r,
             COUNT(*)::DOUBLE AS f,
             ROUND(SUM(o_totalprice), 2) AS m
      FROM orders GROUP BY o_custkey
    ),
    th AS (
      SELECT quantile_cont(r * 1.0, 0.25) AS r1, quantile_cont(r * 1.0, 0.5) AS r2,
             quantile_cont(r * 1.0, 0.75) AS r3,
             quantile_cont(f, 0.25) AS f1, quantile_cont(f, 0.5) AS f2,
             quantile_cont(f, 0.75) AS f3,
             quantile_cont(m, 0.25) AS m1, quantile_cont(m, 0.5) AS m2,
             quantile_cont(m, 0.75) AS m3
      FROM rfm
    )
    SELECT (1 + (r > r1)::INT + (r > r2)::INT + (r > r3)::INT) AS r_band,
           (1 + (f > f1)::INT + (f > f2)::INT + (f > f3)::INT) AS f_band,
           (1 + (m > m1)::INT + (m > m2)::INT + (m > m3)::INT) AS m_band,
           COUNT(*)::BIGINT AS n_customers,
           ROUND(SUM(m), 2) AS total_monetary
    FROM rfm CROSS JOIN th
    GROUP BY 1, 2, 3
    """,
)
def q223_rfm_segmentation(spark, sf_dir):
    """RFM customer segmentation: recency/frequency/monetary per
    customer, quartile-banded against exact global P25/P50/P75
    thresholds (one 9-percentile agg broadcast back — never a global
    NTILE sort), then segment counts.  Monetary is rounded to cents
    BEFORE the thresholds are computed so the band comparison is
    float-noise-proof on both engines."""
    o = _t(spark, sf_dir, "orders")
    md = o.agg(F.max(F.to_date("o_orderdate")).alias("md"))
    rfm = (
        o.groupBy("o_custkey")
        .agg(
            F.max(F.to_date("o_orderdate")).alias("last_d"),
            F.count(F.lit(1)).cast("double").alias("f"),
            F.round(F.sum("o_totalprice"), 2).alias("m"),
        )
        .join(F.broadcast(md))
        .withColumn("r", F.datediff(F.col("md"), F.col("last_d")).cast("double"))
    )
    th = rfm.agg(
        *[
            F.percentile(c, F.lit(q)).alias(f"{c}{i}")
            for c in ("r", "f", "m")
            for i, q in ((1, 0.25), (2, 0.5), (3, 0.75))
        ]
    )

    def band(c):
        return (
            F.lit(1)
            + (F.col(c) > F.col(f"{c}1")).cast("int")
            + (F.col(c) > F.col(f"{c}2")).cast("int")
            + (F.col(c) > F.col(f"{c}3")).cast("int")
        )

    return (
        rfm.join(F.broadcast(th))
        .groupBy(
            band("r").alias("r_band"),
            band("f").alias("f_band"),
            band("m").alias("m_band"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("m"), 2).alias("total_monetary"),
        )
    )


@register(
    "q224_association_rules",
    """
    WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    n AS (SELECT COUNT(DISTINCT l_orderkey)::DOUBLE AS n_orders FROM lineitem),
    item AS (SELECT l_partkey, COUNT(*)::DOUBLE AS cnt FROM b GROUP BY 1),
    pair AS (
      SELECT x.l_partkey AS part_a, y.l_partkey AS part_b,
             COUNT(*)::BIGINT AS support_cnt
      FROM b x JOIN b y
        ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= 2
    )
    SELECT part_a, part_b, support_cnt,
           ROUND(support_cnt / n_orders, 6) AS support,
           ROUND(support_cnt / ia.cnt, 6) AS confidence,
           ROUND(support_cnt * n_orders / (ia.cnt * ib.cnt), 6) AS lift
    FROM pair
    JOIN item ia ON ia.l_partkey = part_a
    JOIN item ib ON ib.l_partkey = part_b
    CROSS JOIN n
    ORDER BY lift DESC, part_a, part_b LIMIT 30
    """,
)
def q224_association_rules(spark, sf_dir):
    """Market-basket association rules over order baskets: pairwise
    support / confidence / lift, top-30 by lift.  Candidate pairs come
    from a within-basket self-join — the fanout is C(basket_size, 2),
    bounded by the max lines per order (a data-shape constant, ~7 for
    TPC-H), so pair volume stays linear in order count at any scale;
    item counts and the basket total fold back in as broadcast joins."""
    li = _t(spark, sf_dir, "lineitem")
    b = li.select("l_orderkey", "l_partkey").distinct()
    n_orders = b.agg(
        F.count_distinct("l_orderkey").cast("double").alias("n_orders")
    )
    item = b.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("double").alias("cnt")
    )
    pair = (
        b.alias("x")
        .join(
            b.alias("y"),
            (F.col("x.l_orderkey") == F.col("y.l_orderkey"))
            & (F.col("x.l_partkey") < F.col("y.l_partkey")),
        )
        .groupBy(
            F.col("x.l_partkey").alias("part_a"),
            F.col("y.l_partkey").alias("part_b"),
        )
        .agg(F.count(F.lit(1)).alias("support_cnt"))
        .filter(F.col("support_cnt") >= 2)
    )
    ia = item.select(
        F.col("l_partkey").alias("part_a"), F.col("cnt").alias("cnt_a")
    )
    ib = item.select(
        F.col("l_partkey").alias("part_b"), F.col("cnt").alias("cnt_b")
    )
    return (
        pair.join(F.broadcast(ia), "part_a")
        .join(F.broadcast(ib), "part_b")
        .join(F.broadcast(n_orders))
        .select(
            "part_a",
            "part_b",
            "support_cnt",
            F.round(F.col("support_cnt") / F.col("n_orders"), 6).alias(
                "support"
            ),
            F.round(F.col("support_cnt") / F.col("cnt_a"), 6).alias(
                "confidence"
            ),
            F.round(
                F.col("support_cnt")
                * F.col("n_orders")
                / (F.col("cnt_a") * F.col("cnt_b")),
                6,
            ).alias("lift"),
        )
        .orderBy(F.desc("lift"), F.asc("part_a"), F.asc("part_b"))
        .limit(30)
    )


@register(
    "q225_js_divergence",
    r"""
    WITH w AS (
      SELECT source, UNNEST(list_filter(
        string_split_regex(trim(text), '\s+'), x -> x <> '')) AS term
      FROM documents
    ),
    c AS (SELECT source, term, COUNT(*)::DOUBLE AS cnt FROM w GROUP BY 1, 2),
    tot AS (SELECT source, SUM(cnt) AS n FROM c GROUP BY 1),
    p AS (
      SELECT c.source, c.term, c.cnt / t.n AS p
      FROM c JOIN tot t USING (source)
    ),
    grid AS (
      SELECT a.source AS src_a, b.source AS src_b
      FROM tot a JOIN tot b ON a.source < b.source
    ),
    hm AS (
      SELECT g.src_a, g.src_b,
             -SUM(m * ln(m)) AS h_mix
      FROM (
        SELECT g.src_a, g.src_b, p.term, SUM(p.p) / 2 AS m
        FROM grid g JOIN p ON p.source IN (g.src_a, g.src_b)
        GROUP BY 1, 2, 3
      ) g GROUP BY 1, 2
    ),
    h AS (SELECT source, -SUM(p * ln(p)) AS ent FROM p GROUP BY 1)
    SELECT hm.src_a, hm.src_b,
           ROUND(hm.h_mix - (ha.ent + hb.ent) / 2, 6) AS js_nats
    FROM hm
    JOIN h ha ON ha.source = hm.src_a
    JOIN h hb ON hb.source = hm.src_b
    """,
)
def q225_js_divergence(spark, sf_dir):
    """Pairwise Jensen-Shannon divergence between per-source unigram
    distributions via the entropy identity JS(P,Q) = H((P+Q)/2) −
    (H(P)+H(Q))/2 — no per-pair full-outer join, and absent terms need
    no zero-imputation because they simply don't appear in either
    entropy sum.  The source-pair grid is k², broadcast against the
    term-probability table; all heavy work is term-keyed aggregation,
    so cost is O(sources · terms), never pairs × corpus."""
    d = _t(spark, sf_dir, "documents")
    c = (
        d.select("source", F.explode(T.words("text")).alias("term"))
        .groupBy("source", "term")
        .agg(F.count(F.lit(1)).cast("double").alias("cnt"))
    )
    tot = c.groupBy("source").agg(F.sum("cnt").alias("n"))
    p = c.join(F.broadcast(tot), "source").select(
        "source", "term", (F.col("cnt") / F.col("n")).alias("p")
    )
    srcs = tot.select("source")
    grid = (
        srcs.alias("a")
        .join(
            srcs.alias("b"),
            F.col("a.source") < F.col("b.source"),
        )
        .select(
            F.col("a.source").alias("src_a"), F.col("b.source").alias("src_b")
        )
    )
    mix = (
        p.join(
            F.broadcast(grid),
            (F.col("source") == F.col("src_a"))
            | (F.col("source") == F.col("src_b")),
        )
        .groupBy("src_a", "src_b", "term")
        .agg((F.sum("p") / 2).alias("m"))
        .groupBy("src_a", "src_b")
        .agg((-F.sum(F.col("m") * F.log("m"))).alias("h_mix"))
    )
    h = p.groupBy("source").agg(
        (-F.sum(F.col("p") * F.log("p"))).alias("ent")
    )
    ha = h.select(F.col("source").alias("src_a"), F.col("ent").alias("ent_a"))
    hb = h.select(F.col("source").alias("src_b"), F.col("ent").alias("ent_b"))
    return (
        mix.join(F.broadcast(ha), "src_a")
        .join(F.broadcast(hb), "src_b")
        .select(
            "src_a",
            "src_b",
            F.round(
                F.col("h_mix") - (F.col("ent_a") + F.col("ent_b")) / 2, 6
            ).alias("js_nats"),
        )
    )


@register(
    "q226_zipf_fit",
    r"""
    WITH w AS (
      SELECT UNNEST(list_filter(
        string_split_regex(trim(text), '\s+'), x -> x <> '')) AS term
      FROM documents
    ),
    tf AS (SELECT term, COUNT(*)::DOUBLE AS c FROM w GROUP BY term
           HAVING COUNT(*) >= 2),
    r AS (
      SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, term ASC) AS rnk
      FROM tf
    )
    SELECT COUNT(*)::BIGINT AS n_terms,
           ROUND(REGR_SLOPE(ln(c), ln(rnk)), 6) AS zipf_slope,
           ROUND(REGR_INTERCEPT(ln(c), ln(rnk)), 6) AS zipf_intercept,
           ROUND(REGR_R2(ln(c), ln(rnk)), 6) AS r2
    FROM r
    """,
)
def q226_zipf_fit(spark, sf_dir):
    """Zipf's-law fit of the corpus term-frequency distribution: OLS of
    ln(freq) on ln(rank) (slope ≈ −1 on natural text; the synthetic
    word-soup corpus is the flat counter-example the fit detects).  The
    global frequency rank comes from `sort.global_rank` — range
    partition + per-partition row_number + offset fold-in, never a
    single-partition window over the vocabulary — and the fit itself is
    one sufficient-statistics agg."""
    from graphmapreduce_spark.operators import sort as GS

    d = _t(spark, sf_dir, "documents")
    tf = (
        d.select(F.explode(T.words("text")).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
        .filter(F.col("c") >= 2)
    )
    r = GS.global_rank(
        tf, [F.col("c").desc(), F.col("term").asc()], rank_col="rnk"
    )
    lc, lr = F.log("c"), F.log(F.col("rnk").cast("double"))
    return r.agg(
        F.count(F.lit(1)).alias("n_terms"),
        F.round(F.regr_slope(lc, lr), 6).alias("zipf_slope"),
        F.round(F.regr_intercept(lc, lr), 6).alias("zipf_intercept"),
        F.round(F.regr_r2(lc, lr), 6).alias("r2"),
    )


@register(
    "q227_pmi_topk",
    r"""
    WITH dw AS (
      SELECT DISTINCT doc_id, term FROM (
        SELECT doc_id, UNNEST(list_filter(
          string_split_regex(trim(text), '\s+'), x -> x <> '')) AS term
        FROM documents)
      WHERE length(term) >= 4
    ),
    n AS (SELECT COUNT(DISTINCT doc_id)::DOUBLE AS n_docs FROM dw),
    df AS (SELECT term, COUNT(*)::DOUBLE AS d FROM dw GROUP BY term),
    keep AS (SELECT term, d FROM df WHERE d BETWEEN 5 AND 320),
    dk AS (SELECT dw.doc_id, dw.term FROM dw JOIN keep USING (term)),
    pair AS (
      SELECT a.term AS term_a, b.term AS term_b,
             COUNT(*)::DOUBLE AS support
      FROM dk a JOIN dk b ON a.doc_id = b.doc_id AND a.term < b.term
      GROUP BY 1, 2 HAVING COUNT(*) >= 5
    )
    SELECT term_a, term_b, CAST(support AS BIGINT) AS support_cnt,
           ROUND(ln(support * n_docs / (ka.d * kb.d)), 6) AS pmi
    FROM pair
    JOIN keep ka ON ka.term = term_a
    JOIN keep kb ON kb.term = term_b
    CROSS JOIN n
    ORDER BY pmi DESC, term_a, term_b LIMIT 25
    """,
)
def q227_pmi_topk(spark, sf_dir):
    """Pointwise mutual information of document-level term pairs:
    PMI = ln(P(a,b) / (P(a)·P(b))) over co-occurrence presence, top-25.
    Same scale hygiene as q120: the document-frequency band caps
    per-term fanout BEFORE the within-doc self-join (one corpus-wide
    term can never go O(docs²)); df and n_docs fold back in as
    broadcast joins and ranking is TakeOrdered on the rounded score."""
    d = _t(spark, sf_dir, "documents")
    dw = (
        d.select("doc_id", F.explode(T.words("text")).alias("term"))
        .filter(F.length("term") >= 4)
        .distinct()
    )
    n_docs = dw.agg(
        F.count_distinct("doc_id").cast("double").alias("n_docs")
    )
    keep = (
        dw.groupBy("term")
        .agg(F.count(F.lit(1)).cast("double").alias("d"))
        .filter((F.col("d") >= 5) & (F.col("d") <= 320))
    )
    dk = dw.join(
        F.broadcast(keep.select("term")), "term"
    ).localCheckpoint(eager=False)
    pair = (
        dk.alias("a")
        .join(
            dk.alias("b"),
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("a.term") < F.col("b.term")),
        )
        .groupBy(
            F.col("a.term").alias("term_a"), F.col("b.term").alias("term_b")
        )
        .agg(F.count(F.lit(1)).cast("double").alias("support"))
        .filter(F.col("support") >= 5)
    )
    ka = keep.select(F.col("term").alias("term_a"), F.col("d").alias("d_a"))
    kb = keep.select(F.col("term").alias("term_b"), F.col("d").alias("d_b"))
    return (
        pair.join(F.broadcast(ka), "term_a")
        .join(F.broadcast(kb), "term_b")
        .join(F.broadcast(n_docs))
        .select(
            "term_a",
            "term_b",
            F.col("support").cast("long").alias("support_cnt"),
            F.round(
                F.log(
                    F.col("support")
                    * F.col("n_docs")
                    / (F.col("d_a") * F.col("d_b"))
                ),
                6,
            ).alias("pmi"),
        )
        .orderBy(F.desc("pmi"), F.asc("term_a"), F.asc("term_b"))
        .limit(25)
    )


@register(
    "q228_kaplan_meier",
    """
    WITH u0 AS (
      SELECT user_id, MIN(epoch(ts)) AS t0,
             MIN(CASE WHEN event_type = 'purchase' THEN epoch(ts) END) AS tp
      FROM events GROUP BY user_id
    ),
    mx AS (SELECT MAX(epoch(ts)) AS tmax FROM events),
    u AS (
      SELECT CASE WHEN tp IS NOT NULL
                  THEN CAST(FLOOR((tp - t0) / 86400.0) AS BIGINT)
                  ELSE CAST(FLOOR((tmax - t0) / 86400.0) AS BIGINT)
             END AS dur,
             CASE WHEN tp IS NOT NULL THEN 1 ELSE 0 END AS obs
      FROM u0 CROSS JOIN mx
    ),
    ad AS (SELECT dur, COUNT(*)::DOUBLE AS c_all, SUM(obs)::DOUBLE AS d
           FROM u GROUP BY dur),
    r AS (
      SELECT dur, d, SUM(c_all) OVER (ORDER BY dur DESC) AS n_risk
      FROM ad
    ),
    km AS (
      SELECT dur, d, n_risk,
             SUM(CASE WHEN d < n_risk THEN ln(1 - d / n_risk)
                      ELSE -1e308 END)
               OVER (ORDER BY dur ASC) AS lsum
      FROM r WHERE d > 0
    )
    SELECT dur AS day, CAST(d AS BIGINT) AS d_events,
           CAST(n_risk AS BIGINT) AS n_at_risk,
           ROUND(exp(lsum), 6) AS survival
    FROM km
    """,
)
def q228_kaplan_meier(spark, sf_dir):
    """Kaplan-Meier survival curve for days-from-first-event to first
    purchase, non-purchasers right-censored at the corpus horizon:
    S(t) = Π_{tᵢ≤t} (1 − dᵢ/nᵢ), computed as exp of a running sum of
    ln terms.  All per-user work is one groupBy; the risk-set and
    product windows run over the DAY-aggregated table, whose row count
    is bounded by the calendar span — never by users — so the
    single-partition windows are over a provably tiny frame.  A −1e308
    sentinel (not ln 0, which Spark nulls) absorbs the d=n final day to
    survival 0 identically on both engines."""
    e = _t(spark, sf_dir, "events")
    ep = F.col("ts").cast("long")
    u0 = e.groupBy("user_id").agg(
        F.min(ep).alias("t0"),
        F.min(F.when(F.col("event_type") == "purchase", ep)).alias("tp"),
    )
    mx = e.agg(F.max(ep).alias("tmax"))
    end = F.coalesce(F.col("tp"), F.col("tmax"))
    u = u0.join(F.broadcast(mx)).select(
        F.floor((end - F.col("t0")) / 86400.0).alias("dur"),
        F.col("tp").isNotNull().cast("int").alias("obs"),
    )
    ad = u.groupBy("dur").agg(
        F.count(F.lit(1)).cast("double").alias("c_all"),
        F.sum("obs").cast("double").alias("d"),
    )
    w_risk = Window.orderBy(F.desc("dur"))
    w_km = Window.orderBy(F.asc("dur"))
    r = ad.withColumn("n_risk", F.sum("c_all").over(w_risk)).filter(
        F.col("d") > 0
    )
    term = F.when(
        F.col("d") < F.col("n_risk"),
        F.log(F.lit(1) - F.col("d") / F.col("n_risk")),
    ).otherwise(F.lit(-1e308))
    return r.withColumn("lsum", F.sum(term).over(w_km)).select(
        F.col("dur").alias("day"),
        F.col("d").cast("long").alias("d_events"),
        F.col("n_risk").cast("long").alias("n_at_risk"),
        F.round(F.exp("lsum"), 6).alias("survival"),
    )


@register(
    "q229_event_trigrams",
    """
    WITH s AS (
      SELECT user_id, event_type AS e1,
             LEAD(event_type, 1) OVER
               (PARTITION BY user_id ORDER BY ts, event_id) AS e2,
             LEAD(event_type, 2) OVER
               (PARTITION BY user_id ORDER BY ts, event_id) AS e3
      FROM events
    )
    SELECT e1, e2, e3, COUNT(*)::BIGINT AS cnt
    FROM s WHERE e3 IS NOT NULL
    GROUP BY 1, 2, 3
    ORDER BY cnt DESC, e1, e2, e3 LIMIT 20
    """,
)
def q229_event_trigrams(spark, sf_dir):
    """Behavioral path mining one step beyond q179's Markov bigrams:
    the 20 most common event-type TRIGRAMS across user sessions.  LEAD
    windows partitioned by user (total order by ts with event_id
    tiebreak) keep the scan partition-parallel; top-k is TakeOrdered on
    the counted result."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = e.select(
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).filter(F.col("e3").isNotNull())
    return (
        s.groupBy("e1", "e2", "e3")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), "e1", "e2", "e3")
        .limit(20)
    )


@register(
    "q230_gini_engagement",
    """
    WITH x AS (
      SELECT user_id, COUNT(*)::DOUBLE AS n FROM events GROUP BY user_id
    ),
    r AS (
      SELECT n, ROW_NUMBER() OVER (ORDER BY n ASC, user_id ASC) AS i
      FROM x
    )
    SELECT COUNT(*)::BIGINT AS n_users,
           ROUND(2.0 * SUM(i * n) / (COUNT(*) * SUM(n))
                 - (COUNT(*) + 1.0) / COUNT(*), 6) AS gini
    FROM r
    """,
)
def q230_gini_engagement(spark, sf_dir):
    """Gini coefficient of per-user event-count concentration — the
    single-number inequality complement to q214's Pareto coverage
    curve, via the sorted-rank identity G = 2·Σ i·xᵢ/(n·Σx) − (n+1)/n.
    The global rank over users comes from `sort.global_rank` (range
    partition + offset fold-in), so no single-partition window ever
    sees the full user table; the identity itself is one agg."""
    from graphmapreduce_spark.operators import sort as GS

    e = _t(spark, sf_dir, "events")
    x = e.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("double").alias("n")
    )
    r = GS.global_rank(
        x, [F.col("n").asc(), F.col("user_id").asc()], rank_col="i"
    )
    return r.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.round(
            F.lit(2.0)
            * F.sum(F.col("i") * F.col("n"))
            / (F.count(F.lit(1)) * F.sum("n"))
            - (F.count(F.lit(1)) + F.lit(1.0)) / F.count(F.lit(1)),
            6,
        ).alias("gini"),
    )


@register(
    "q231_dedup_inflation",
    r"""
    WITH t AS (
      SELECT source, md5(text) AS k,
             len(list_filter(string_split_regex(trim(text), '\s+'),
                             x -> x <> '')) AS n_tok
      FROM documents
    ),
    g AS (
      SELECT source, k, COUNT(*)::BIGINT AS c, MAX(n_tok) AS n_tok
      FROM t GROUP BY 1, 2
    )
    SELECT source,
           CAST(SUM(c) AS BIGINT) AS n_docs,
           CAST(SUM(c - 1) AS BIGINT) AS dup_docs,
           ROUND(SUM(c - 1) / CAST(SUM(c) AS DOUBLE), 6) AS dup_ratio,
           CAST(SUM(n_tok * c) AS BIGINT) AS tokens_total,
           CAST(SUM(n_tok * (c - 1)) AS BIGINT) AS tokens_redundant,
           ROUND(SUM(n_tok * (c - 1)) /
                 CAST(SUM(n_tok * c) AS DOUBLE), 6) AS waste_ratio
    FROM g GROUP BY source
    """,
)
def q231_dedup_inflation(spark, sf_dir):
    """Per-source exact-duplicate inflation audit: how many docs and
    how many TOKENS the q40 exact-dedup pass would remove, by feed —
    the number that decides which source pays for a dedup stage at all.
    One hash-groupBy per (source, text-md5) then a per-source rollup;
    identical copies share one token count via MAX."""
    d = _t(spark, sf_dir, "documents")
    t = d.select(
        "source",
        F.md5("text").alias("k"),
        F.size(T.words("text")).alias("n_tok"),
    )
    g = t.groupBy("source", "k").agg(
        F.count(F.lit(1)).alias("c"), F.max("n_tok").alias("n_tok")
    )
    return g.groupBy("source").agg(
        F.sum("c").alias("n_docs"),
        F.sum(F.col("c") - 1).alias("dup_docs"),
        F.round(
            F.sum(F.col("c") - 1) / F.sum("c").cast("double"), 6
        ).alias("dup_ratio"),
        F.sum(F.col("n_tok") * F.col("c")).alias("tokens_total"),
        F.sum(F.col("n_tok") * (F.col("c") - 1)).alias("tokens_redundant"),
        F.round(
            F.sum(F.col("n_tok") * (F.col("c") - 1))
            / F.sum(F.col("n_tok") * F.col("c")).cast("double"),
            6,
        ).alias("waste_ratio"),
    )


@register(
    "q232_shingle_df_profile",
    r"""
    WITH t AS (
      SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'),
                                 x -> x <> '') AS ws
      FROM documents
    ),
    s AS (
      SELECT DISTINCT doc_id,
             array_to_string(list_slice(ws, i, i + 4), ' ') AS sh
      FROM t, UNNEST(generate_series(1, len(ws) - 4)) AS u(i)
      WHERE len(ws) >= 5
    ),
    df AS (SELECT sh, COUNT(*)::BIGINT AS d FROM s GROUP BY sh),
    tot AS (SELECT SUM(d)::DOUBLE AS postings_all FROM df)
    SELECT CAST(LENGTH(BIN(d)) - 1 AS BIGINT) AS df_log2_bucket,
           COUNT(*)::BIGINT AS n_shingles,
           CAST(SUM(d) AS BIGINT) AS postings,
           ROUND(SUM(d) / ANY_VALUE(postings_all), 6) AS postings_share
    FROM df CROSS JOIN tot
    GROUP BY 1
    """,
)
def q232_shingle_df_profile(spark, sf_dir):
    """Shingle document-frequency histogram (log₂-binned): the direct
    measurement behind every inverted-index pair-join knob in this repo
    — Σ df² is the self-join cost, so the share of postings sitting in
    high-df buckets IS the predicted blowup, and the profile says
    whether a `max_df` cap will bite before the join goes quadratic.
    Cost is one explode + two hash aggs; nothing pairwise.  The log₂
    bucket is the exact integer `length(bin(d)) − 1`, not
    `floor(ln d / ln 2)` — at exact powers of two the float form can
    flip buckets on a last-ulp libm difference between engines."""
    d = _t(spark, sf_dir, "documents")
    s = d.select(
        "doc_id", F.explode(T.word_ngrams("text", n=5)).alias("sh")
    ).distinct()
    df = s.groupBy("sh").agg(F.count(F.lit(1)).alias("d"))
    tot = df.agg(F.sum("d").cast("double").alias("postings_all"))
    return (
        df.join(F.broadcast(tot))
        .groupBy(
            (F.length(F.bin("d")) - 1).cast("long").alias("df_log2_bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum("d").alias("postings"),
            F.round(F.sum("d") / F.first("postings_all"), 6).alias(
                "postings_share"
            ),
        )
    )


@register(
    "q233_quantization_error",
    """
    WITH v AS (
      SELECT vec_id, label, i AS dim, embedding[i]::DOUBLE AS x
      FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS u(i)
    ),
    s AS (SELECT dim, MAX(ABS(x)) AS m FROM v GROUP BY dim),
    e AS (
      SELECT v.label,
             ABS(v.x - ROUND(127 * v.x / s.m) * s.m / 127) AS err,
             ABS(v.x) AS mag
      FROM v JOIN s USING (dim) WHERE s.m > 0
    )
    SELECT label,
           ROUND(AVG(err), 9) AS mean_abs_err,
           ROUND(MAX(err), 9) AS max_abs_err,
           ROUND(AVG(err) / AVG(mag), 6) AS rel_err
    FROM e GROUP BY label
    """,
)
def q233_quantization_error(spark, sf_dir):
    """Int8 vector-quantization audit: symmetric per-dimension scaling
    (q = round(127·x/m), m = per-dim max-abs), reporting per-label
    reconstruction error — the go/no-go number before shipping a
    compressed ANN index.  One explode + a dim-keyed scale agg
    broadcast back onto the scan; the quantize/dequantize round-trip is
    pure codegen arithmetic, bit-identical across engines because both
    round half-away-from-zero on IEEE doubles."""
    em = _t(spark, sf_dir, "embeddings")
    v = em.select(
        "label",
        F.posexplode("embedding").alias("dim0", "xf"),
    ).select(
        "label",
        (F.col("dim0") + 1).alias("dim"),
        F.col("xf").cast("double").alias("x"),
    )
    s = v.groupBy("dim").agg(F.max(F.abs("x")).alias("m"))
    q = F.round(F.lit(127) * F.col("x") / F.col("m"), 0)
    e = (
        v.join(F.broadcast(s), "dim")
        .filter(F.col("m") > 0)
        .select(
            "label",
            F.abs(F.col("x") - q * F.col("m") / 127).alias("err"),
            F.abs("x").alias("mag"),
        )
    )
    return e.groupBy("label").agg(
        F.round(F.avg("err"), 9).alias("mean_abs_err"),
        F.round(F.max("err"), 9).alias("max_abs_err"),
        F.round(F.avg("err") / F.avg("mag"), 6).alias("rel_err"),
    )


@register(
    "q234_fano_burstiness",
    """
    WITH d AS (
      SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*)::DOUBLE AS n
      FROM events GROUP BY 1, 2
    )
    SELECT event_type,
           COUNT(*)::BIGINT AS n_days,
           ROUND(AVG(n), 6) AS mean_daily,
           ROUND(VAR_SAMP(n), 6) AS var_daily,
           ROUND(VAR_SAMP(n) / AVG(n), 6) AS fano
    FROM d GROUP BY event_type
    """,
)
def q234_fano_burstiness(spark, sf_dir):
    """Dispersion (Fano factor) of daily event volume per type:
    var/mean of the day-count series — ≈1 is Poisson-like arrivals,
    ≫1 flags bursty types that need burst-aware capacity or sampling
    (the per-type complement of q213's term-burst detector).  Two hash
    aggs, no window, no shuffle beyond the day rollup."""
    e = _t(spark, sf_dir, "events")
    d = e.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).cast("double").alias("n"))
    return d.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.round(F.avg("n"), 6).alias("mean_daily"),
        F.round(F.var_samp("n"), 6).alias("var_daily"),
        F.round(F.var_samp("n") / F.avg("n"), 6).alias("fano"),
    )


@register(
    "q235_k_anonymity",
    """
    WITH g AS (
      SELECT lang, source, LENGTH(BIN(GREATEST(n_chars, 1))) - 1 AS len_b,
             COUNT(*)::BIGINT AS k
      FROM documents GROUP BY 1, 2, 3
    ),
    tot AS (SELECT COUNT(*)::DOUBLE AS n FROM documents)
    SELECT CASE WHEN k = 1 THEN '1'
                WHEN k < 5 THEN '2-4'
                WHEN k < 20 THEN '5-19'
                ELSE '20+' END AS k_band,
           COUNT(*)::BIGINT AS n_groups,
           CAST(SUM(k) AS BIGINT) AS n_rows,
           ROUND(SUM(k) / ANY_VALUE(tot.n), 6) AS row_share
    FROM g CROSS JOIN tot
    GROUP BY 1
    """,
)
def q235_k_anonymity(spark, sf_dir):
    """k-anonymity audit over the quasi-identifier tuple (lang, source,
    log₂ length bucket): how many documents sit in singleton or
    near-singleton equivalence classes — the re-identification-risk
    companion to `scrub_pii` (a doc unique on its quasi-identifiers is
    linkable even with PII scrubbed).  One hash-groupBy over the tuple,
    then a banded rollup; the length bucket is the exact
    `length(bin(n)) − 1` integer form."""
    d = _t(spark, sf_dir, "documents")
    g = d.groupBy(
        "lang",
        "source",
        (F.length(F.bin(F.greatest("n_chars", F.lit(1)))) - 1).alias(
            "len_b"
        ),
    ).agg(F.count(F.lit(1)).alias("k"))
    tot = d.agg(F.count(F.lit(1)).cast("double").alias("n"))
    band = (
        F.when(F.col("k") == 1, "1")
        .when(F.col("k") < 5, "2-4")
        .when(F.col("k") < 20, "5-19")
        .otherwise("20+")
    )
    return (
        g.join(F.broadcast(tot))
        .groupBy(band.alias("k_band"))
        .agg(
            F.count(F.lit(1)).alias("n_groups"),
            F.sum("k").alias("n_rows"),
            F.round(F.sum("k") / F.first("n"), 6).alias("row_share"),
        )
    )


@register(
    "q236_mrr_eval",
    """
    WITH c AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
               FROM embeddings),
    q AS (SELECT * FROM c WHERE vec_id % 25 = 0),
    scored AS (
      SELECT q.vec_id AS qid, q.label AS qlab,
             c.vec_id AS nid, c.label AS nlab,
             ROUND(list_sum(list_transform(range(1, len(q.v) + 1),
                              i -> q.v[i] * c.v[i]))
               / (sqrt(list_sum(list_transform(q.v, x -> x * x)))
                * sqrt(list_sum(list_transform(c.v, x -> x * x)))), 4)
               AS cosine
      FROM c CROSS JOIN q
      WHERE q.vec_id <> c.vec_id
    ),
    r AS (
      SELECT qid, qlab, nlab,
             ROW_NUMBER() OVER (PARTITION BY qid
               ORDER BY cosine DESC, nid ASC) AS rnk
      FROM scored
    )
    SELECT qid AS query_id, CAST(MIN(rnk) AS BIGINT) AS first_hit_rank,
           ROUND(1.0 / MIN(rnk), 6) AS reciprocal_rank
    FROM r WHERE nlab = qlab GROUP BY qid
    """,
)
def q236_mrr_eval(spark, sf_dir):
    """Retrieval-quality evaluation: mean-reciprocal-rank inputs for a
    label-match relevance model — for each held-out query vector, the
    rank of the first same-label neighbor under exact cosine.  The
    query sample (1/25 of vectors) is the broadcast side against the
    partition-parallel corpus — the q48 brute-force shape, which is the
    ground-truth harness any ANN variant (q49 IVF) is scored against;
    ranking is on the ROUNDed cosine with an id tiebreak so both
    engines agree on ties."""
    emb = _t(spark, sf_dir, "embeddings")
    c = emb.select(
        F.col("vec_id").alias("nid"),
        F.col("label").alias("nlab"),
        F.col("embedding").cast("array<double>").alias("cv"),
    )
    q = emb.filter(F.col("vec_id") % 25 == 0).select(
        F.col("vec_id").alias("qid"),
        F.col("label").alias("qlab"),
        F.col("embedding").cast("array<double>").alias("qv"),
    )
    scored = c.join(F.broadcast(q), F.col("qid") != F.col("nid")).select(
        "qid",
        "qlab",
        "nid",
        "nlab",
        F.round(V.cosine(F.col("qv"), F.col("cv")), 4).alias("cosine"),
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("cosine").desc(), F.col("nid").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("nlab") == F.col("qlab"))
        .groupBy(F.col("qid").alias("query_id"))
        .agg(
            F.min("rnk").alias("first_hit_rank"),
            F.round(F.lit(1.0) / F.min("rnk"), 6).alias("reciprocal_rank"),
        )
    )


@register("q237_coreness", None)  # run-to-fixpoint peel per level — no
# fixed-depth SQL form; verified by the pytest golden + the
# coreness(v)>=k <=> k_core membership cross-invariant against the
# value-oracled q84 peel (tests/test_graph_algorithms.py)
def q237_coreness(spark, sf_dir):
    """Full k-core decomposition (coreness per vertex) of the
    lineitem-derived graph — the degeneracy profile that tells you
    which k the q84 fixed-k core is worth carving at.  Distributed
    peeling in increasing k; rounds bounded by peel depth + occupied
    core levels (degeneracy-bounded), never |V|."""
    li = _t(spark, sf_dir, "lineitem")
    e = (
        li.select(
            (F.col("l_orderkey") % 5000).alias("s"),
            (F.col("l_partkey") % 5000).alias("t"),
        )
        .filter(F.col("s") != F.col("t"))
        .select(F.least("s", "t").alias("src"), F.greatest("s", "t").alias("dst"))
        .distinct()
    )
    g = PropertyGraph.from_edges(e)
    return alg.coreness(g, assume_simple=True)


@register("q238_diameter_double_sweep", None)  # two chained data-dependent
# BFS runs — no fixed-depth SQL form; verified by pytest goldens
# (exact on trees; cycle/star fixtures) in tests/test_graph_algorithms.py
def q238_diameter_double_sweep(spark, sf_dir):
    """Double-sweep BFS diameter lower bound of the (symmetrized)
    lineitem-derived graph — the two-BFS heuristic that replaces the
    O(n·BFS) exact sweep nothing can afford at 100 TB."""
    li = _t(spark, sf_dir, "lineitem")
    e = (
        li.select(
            (F.col("l_orderkey") % 5000).alias("s"),
            (F.col("l_partkey") % 5000).alias("t"),
        )
        .filter(F.col("s") != F.col("t"))
        .select(F.least("s", "t").alias("src"), F.greatest("s", "t").alias("dst"))
        .distinct()
    )
    sym = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).withColumn("weight", F.lit(1.0))
    g = PropertyGraph.from_edges(sym)
    return alg.diameter_double_sweep(g)


@register(
    "q239_ndcg_eval",
    """
    WITH c AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
               FROM embeddings),
    q AS (SELECT * FROM c WHERE vec_id % 25 = 0),
    nrel AS (
      SELECT q.vec_id AS qid,
             COUNT(*)::BIGINT AS r
      FROM q JOIN c ON c.label = q.label AND c.vec_id <> q.vec_id
      GROUP BY 1
    ),
    scored AS (
      SELECT q.vec_id AS qid, q.label AS qlab,
             c.vec_id AS nid, c.label AS nlab,
             ROUND(list_sum(list_transform(range(1, len(q.v) + 1),
                              i -> q.v[i] * c.v[i]))
               / (sqrt(list_sum(list_transform(q.v, x -> x * x)))
                * sqrt(list_sum(list_transform(c.v, x -> x * x)))), 4)
               AS cosine
      FROM c CROSS JOIN q
      WHERE q.vec_id <> c.vec_id
    ),
    r AS (
      SELECT qid, qlab, nlab,
             ROW_NUMBER() OVER (PARTITION BY qid
               ORDER BY cosine DESC, nid ASC) AS rnk
      FROM scored
    ),
    dcg AS (
      SELECT qid,
             SUM(CASE WHEN nlab = qlab
                      THEN 1.0 / log2(rnk + 1) ELSE 0 END) AS dcg
      FROM r WHERE rnk <= 10 GROUP BY qid
    )
    SELECT d.qid AS query_id,
           ROUND(d.dcg, 6) AS dcg_at_10,
           ROUND(d.dcg / list_sum(list_transform(
                   generate_series(1, LEAST(10, n.r)),
                   i -> 1.0 / log2(i + 1))), 6) AS ndcg_at_10
    FROM dcg d JOIN nrel n ON n.qid = d.qid
    """,
)
def q239_ndcg_eval(spark, sf_dir):
    """nDCG@10 under the label-match relevance model — the graded
    companion to q236's MRR: DCG over the top-10 exact-cosine ranking,
    normalized by the ideal DCG for the query's true relevant count.
    The per-query ideal is a closed-form sum over sequence(1,
    least(10, R)) — pure codegen, no second ranking pass; everything
    heavy is the one broadcast-query × corpus scoring stage."""
    emb = _t(spark, sf_dir, "embeddings")
    c = emb.select(
        F.col("vec_id").alias("nid"),
        F.col("label").alias("nlab"),
        F.col("embedding").cast("array<double>").alias("cv"),
    )
    q = emb.filter(F.col("vec_id") % 25 == 0).select(
        F.col("vec_id").alias("qid"),
        F.col("label").alias("qlab"),
        F.col("embedding").cast("array<double>").alias("qv"),
    )
    nrel = (
        c.join(
            F.broadcast(q),
            (F.col("nlab") == F.col("qlab")) & (F.col("qid") != F.col("nid")),
        )
        .groupBy("qid")
        .agg(F.count(F.lit(1)).alias("r"))
    )
    scored = c.join(F.broadcast(q), F.col("qid") != F.col("nid")).select(
        "qid",
        "qlab",
        "nid",
        "nlab",
        F.round(V.cosine(F.col("qv"), F.col("cv")), 4).alias("cosine"),
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("cosine").desc(), F.col("nid").asc()
    )
    dcg = (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 10)
        .groupBy("qid")
        .agg(
            F.sum(
                F.when(
                    F.col("nlab") == F.col("qlab"),
                    F.lit(1.0) / F.log2(F.col("rnk") + 1),
                ).otherwise(0.0)
            ).alias("dcg")
        )
    )
    idcg = F.aggregate(
        F.sequence(F.lit(1), F.least(F.lit(10), F.col("r"))),
        F.lit(0.0),
        lambda acc, i: acc + F.lit(1.0) / F.log2(i.cast("double") + 1),
    )
    return (
        dcg.join(F.broadcast(nrel), "qid")
        .select(
            F.col("qid").alias("query_id"),
            F.round("dcg", 6).alias("dcg_at_10"),
            F.round(F.col("dcg") / idcg, 6).alias("ndcg_at_10"),
        )
    )


@register(
    "q240_onenn_confusion",
    """
    WITH c AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
               FROM embeddings),
    q AS (SELECT * FROM c WHERE vec_id % 5 = 0),
    corpus AS (SELECT * FROM c WHERE vec_id % 5 <> 0),
    scored AS (
      SELECT q.vec_id AS qid, q.label AS true_label,
             corpus.vec_id AS nid, corpus.label AS pred,
             ROUND(list_sum(list_transform(range(1, len(q.v) + 1),
                              i -> q.v[i] * corpus.v[i]))
               / (sqrt(list_sum(list_transform(q.v, x -> x * x)))
                * sqrt(list_sum(list_transform(corpus.v, x -> x * x)))), 4)
               AS cosine
      FROM corpus CROSS JOIN q
    ),
    top1 AS (
      SELECT qid, true_label, pred FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                   ORDER BY cosine DESC, nid ASC) AS rnk
        FROM scored) t
      WHERE rnk = 1
    )
    SELECT true_label, pred AS pred_label, COUNT(*)::BIGINT AS n
    FROM top1 GROUP BY 1, 2
    """,
)
def q240_onenn_confusion(spark, sf_dir):
    """1-nearest-neighbor classification confusion matrix on a 20%
    holdout (vec_id % 5): predicted label = nearest corpus vector's
    label under exact cosine.  The holdout is the broadcast side
    against the partition-parallel corpus — the q48 brute-force
    contract; at corpus×corpus scale the IVF path (q49) replaces the
    scorer, the confusion rollup is unchanged."""
    emb = _t(spark, sf_dir, "embeddings")
    c = emb.select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    q = c.filter(F.col("vec_id") % 5 == 0).select(
        F.col("vec_id").alias("qid"),
        F.col("label").alias("true_label"),
        F.col("v").alias("qv"),
    )
    corpus = c.filter(F.col("vec_id") % 5 != 0).select(
        F.col("vec_id").alias("nid"),
        F.col("label").alias("pred"),
        F.col("v").alias("cv"),
    )
    scored = corpus.join(F.broadcast(q)).select(
        "qid",
        "true_label",
        "nid",
        "pred",
        F.round(V.cosine(F.col("qv"), F.col("cv")), 4).alias("cosine"),
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("cosine").desc(), F.col("nid").asc()
    )
    top1 = scored.withColumn("rnk", F.row_number().over(w)).filter(
        F.col("rnk") == 1
    )
    return top1.groupBy(
        "true_label", F.col("pred").alias("pred_label")
    ).agg(F.count(F.lit(1)).alias("n"))


@register(
    "q241_auc_roc",
    """
    WITH v AS (
      SELECT vec_id, label, i AS dim, embedding[i]::DOUBLE AS x
      FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS u(i)
    ),
    cent AS (
      SELECT dim, AVG(x) AS c FROM v WHERE label = 0 GROUP BY dim
    ),
    sc AS (
      SELECT v.vec_id, MAX(v.label) AS label,
             ROUND(SUM(v.x * cent.c)
               / (sqrt(SUM(v.x * v.x))
                * sqrt(SUM(cent.c * cent.c))), 4) AS score
      FROM v JOIN cent USING (dim)
      GROUP BY v.vec_id
    ),
    g AS (
      SELECT score, COUNT(*)::DOUBLE AS cnt,
             SUM(CASE WHEN label = 0 THEN 1 ELSE 0 END)::DOUBLE AS pos
      FROM sc GROUP BY score
    ),
    mid AS (
      SELECT pos,
             COALESCE(SUM(cnt) OVER (ORDER BY score ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               + (cnt + 1) / 2 AS r_mid
      FROM g
    ),
    s AS (
      SELECT SUM(pos * r_mid) AS rank_sum,
             SUM(pos) AS n_pos,
             (SELECT COUNT(*) FROM sc) - SUM(pos) AS n_neg
      FROM mid
    )
    SELECT CAST(n_pos AS BIGINT) AS n_pos, CAST(n_neg AS BIGINT) AS n_neg,
           ROUND((rank_sum - n_pos * (n_pos + 1) / 2)
                 / (n_pos * n_neg), 6) AS auc
    FROM s
    """,
)
def q241_auc_roc(spark, sf_dir):
    """AUC-ROC of 'cosine to the label-0 centroid' as a detector for
    label 0, via the Mann-Whitney rank-sum identity with midranks for
    ties: AUC = (Σ_pos r_mid − n₊(n₊+1)/2)/(n₊·n₋).  Scores are
    ROUNDed to 4 before ranking so tie groups are engine-identical;
    the midrank window runs over the SCORE-DISTINCT aggregate (≤ 2·10⁴
    rows by construction at 4 decimals), never the vector table."""
    emb = _t(spark, sf_dir, "embeddings")
    v = emb.select(
        "vec_id",
        "label",
        F.posexplode("embedding").alias("dim0", "xf"),
    ).select(
        "vec_id",
        "label",
        (F.col("dim0") + 1).alias("dim"),
        F.col("xf").cast("double").alias("x"),
    )
    cent = (
        v.filter(F.col("label") == 0)
        .groupBy("dim")
        .agg(F.avg("x").alias("c"))
    )
    sc = (
        v.join(F.broadcast(cent), "dim")
        .groupBy("vec_id")
        .agg(
            F.max("label").alias("label"),
            F.round(
                F.sum(F.col("x") * F.col("c"))
                / (
                    F.sqrt(F.sum(F.col("x") * F.col("x")))
                    * F.sqrt(F.sum(F.col("c") * F.col("c")))
                ),
                4,
            ).alias("score"),
        )
    )
    g = sc.groupBy("score").agg(
        F.count(F.lit(1)).cast("double").alias("cnt"),
        F.sum((F.col("label") == 0).cast("int")).cast("double").alias("pos"),
    )
    w = (
        Window.orderBy(F.asc("score"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    mid = g.withColumn(
        "r_mid",
        F.coalesce(F.sum("cnt").over(w), F.lit(0.0))
        + (F.col("cnt") + 1) / 2,
    )
    tot = sc.agg(F.count(F.lit(1)).cast("double").alias("n_all"))
    s = mid.join(F.broadcast(tot)).agg(
        F.sum(F.col("pos") * F.col("r_mid")).alias("rank_sum"),
        F.sum("pos").alias("n_pos"),
        (F.first("n_all") - F.sum("pos")).alias("n_neg"),
    )
    return s.select(
        F.col("n_pos").cast("long").alias("n_pos"),
        F.col("n_neg").cast("long").alias("n_neg"),
        F.round(
            (F.col("rank_sum") - F.col("n_pos") * (F.col("n_pos") + 1) / 2)
            / (F.col("n_pos") * F.col("n_neg")),
            6,
        ).alias("auc"),
    )


@register(
    "q242_ks_drift",
    """
    WITH s0 AS (SELECT MIN(source) AS s FROM documents),
    d AS (
      SELECT n_chars AS x,
             CASE WHEN source = (SELECT s FROM s0) THEN 1 ELSE 0 END AS a
      FROM documents
    ),
    g AS (
      SELECT x, SUM(a)::DOUBLE AS ca, SUM(1 - a)::DOUBLE AS cb
      FROM d GROUP BY x
    ),
    t AS (SELECT SUM(ca) AS na, SUM(cb) AS nb FROM g),
    c AS (
      SELECT SUM(ca) OVER (ORDER BY x ASC) / na AS fa,
             SUM(cb) OVER (ORDER BY x ASC) / nb AS fb
      FROM g CROSS JOIN t
    )
    SELECT (SELECT CAST(na AS BIGINT) FROM t) AS n_a,
           (SELECT CAST(nb AS BIGINT) FROM t) AS n_b,
           ROUND(MAX(ABS(fa - fb)), 6) AS ks_d
    FROM c
    """,
)
def q242_ks_drift(spark, sf_dir):
    """Two-sample Kolmogorov-Smirnov statistic between the
    lexicographically-first source's document-length distribution and
    everything else — the exact-distribution drift test next to q197's
    binned PSI.  Both ECDFs come from one cumulative window over the
    VALUE-DISTINCT aggregate (bounded by the length domain, never row
    count); D = max gap is one agg on top."""
    d = _t(spark, sf_dir, "documents")
    s0 = d.agg(F.min("source").alias("s"))
    dd = d.join(F.broadcast(s0)).select(
        F.col("n_chars").alias("x"),
        (F.col("source") == F.col("s")).cast("int").alias("a"),
    )
    g = dd.groupBy("x").agg(
        F.sum("a").cast("double").alias("ca"),
        F.sum(1 - F.col("a")).cast("double").alias("cb"),
    )
    t = g.agg(F.sum("ca").alias("na"), F.sum("cb").alias("nb"))
    w = Window.orderBy(F.asc("x"))
    c = g.join(F.broadcast(t)).select(
        (F.sum("ca").over(w) / F.col("na")).alias("fa"),
        (F.sum("cb").over(w) / F.col("nb")).alias("fb"),
        "na",
        "nb",
    )
    return c.agg(
        F.first("na").cast("long").alias("n_a"),
        F.first("nb").cast("long").alias("n_b"),
        F.round(F.max(F.abs(F.col("fa") - F.col("fb"))), 6).alias("ks_d"),
    )


@register(
    "q243_mutual_information",
    """
    WITH j AS (
      SELECT source, lang, COUNT(*)::DOUBLE AS n
      FROM documents GROUP BY 1, 2
    ),
    tot AS (SELECT SUM(n) AS nn FROM j),
    ps AS (SELECT source, SUM(n) AS ns FROM j GROUP BY source),
    pl AS (SELECT lang, SUM(n) AS nl FROM j GROUP BY lang),
    mi AS (
      SELECT SUM((j.n / nn) * ln(j.n * nn / (ps.ns * pl.nl))) AS mi
      FROM j JOIN ps USING (source) JOIN pl USING (lang) CROSS JOIN tot
    ),
    hl AS (
      SELECT -SUM((nl / nn) * ln(nl / nn)) AS h_lang
      FROM pl CROSS JOIN tot
    )
    SELECT ROUND(mi.mi, 6) AS mi_nats,
           ROUND(hl.h_lang, 6) AS h_lang_nats,
           ROUND(mi.mi / hl.h_lang, 6) AS uncertainty_coef
    FROM mi CROSS JOIN hl
    """,
)
def q243_mutual_information(spark, sf_dir):
    """Mutual information between source and language plus Theil's
    uncertainty coefficient U(lang|source) = MI/H(lang) — 'how much
    does knowing the feed tell you about the language', the
    feature-selection audit before stratifying a mixture on metadata.
    All probabilities come from one (source, lang) contingency agg with
    its two broadcast marginals; no pairwise anything."""
    d = _t(spark, sf_dir, "documents")
    j = d.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("double").alias("n")
    )
    tot = j.agg(F.sum("n").alias("nn"))
    ps = j.groupBy("source").agg(F.sum("n").alias("ns"))
    pl = j.groupBy("lang").agg(F.sum("n").alias("nl"))
    mi = (
        j.join(F.broadcast(ps), "source")
        .join(F.broadcast(pl), "lang")
        .join(F.broadcast(tot))
        .agg(
            F.sum(
                (F.col("n") / F.col("nn"))
                * F.log(
                    F.col("n") * F.col("nn") / (F.col("ns") * F.col("nl"))
                )
            ).alias("mi")
        )
    )
    hl = pl.join(F.broadcast(tot)).agg(
        (-F.sum((F.col("nl") / F.col("nn")) * F.log(F.col("nl") / F.col("nn"))))
        .alias("h_lang")
    )
    return (
        mi.join(hl)
        .select(
            F.round("mi", 6).alias("mi_nats"),
            F.round("h_lang", 6).alias("h_lang_nats"),
            F.round(F.col("mi") / F.col("h_lang"), 6).alias(
                "uncertainty_coef"
            ),
        )
    )


@register("q244_louvain", None)  # synchronous local moving runs to a
# data-dependent fixpoint — no fixed-depth SQL form; verified by the
# planted-community + ring-of-cliques pytest goldens and the
# modularity >= label-propagation gate (tests/test_graph_algorithms.py)
def q244_louvain(spark, sf_dir):
    """Louvain-style modularity communities of the lineitem-derived
    graph, with the assignment's Newman modularity joined on — the
    community-detection upgrade over q99's label propagation, gated by
    the same `modularity()` score."""
    li = _t(spark, sf_dir, "lineitem")
    e = (
        li.select(
            (F.col("l_orderkey") % 5000).alias("s"),
            (F.col("l_partkey") % 5000).alias("t"),
        )
        .filter(F.col("s") != F.col("t"))
        .select(F.least("s", "t").alias("src"), F.greatest("s", "t").alias("dst"))
        .distinct()
    )
    g = PropertyGraph.from_edges(e)
    return alg.louvain(g, max_rounds=10, assume_simple=True)


@register(
    "q245_growth_accounting",
    """
    WITH ud AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ),
    firsts AS (SELECT user_id, MIN(day) AS first_day FROM ud GROUP BY 1),
    cur AS (
      SELECT ud.day, ud.user_id,
             (ud.day = f.first_day) AS is_new,
             EXISTS (SELECT 1 FROM ud p
                     WHERE p.user_id = ud.user_id
                       AND p.day = ud.day - 1) AS was_active
      FROM ud JOIN firsts f USING (user_id)
    ),
    act AS (
      SELECT day,
             COUNT(*)::BIGINT AS dau,
             SUM(CASE WHEN is_new THEN 1 ELSE 0 END)::BIGINT AS new_users,
             SUM(CASE WHEN NOT is_new AND was_active
                      THEN 1 ELSE 0 END)::BIGINT AS retained,
             SUM(CASE WHEN NOT is_new AND NOT was_active
                      THEN 1 ELSE 0 END)::BIGINT AS resurrected
      FROM cur GROUP BY day
    ),
    churn AS (
      SELECT a.day + 1 AS day, COUNT(*)::BIGINT AS churned
      FROM ud a
      WHERE NOT EXISTS (SELECT 1 FROM ud n
                        WHERE n.user_id = a.user_id
                          AND n.day = a.day + 1)
      GROUP BY 1
    )
    SELECT CAST(act.day AS DATE) AS day, dau, new_users, retained,
           resurrected, COALESCE(churn.churned, 0) AS churned
    FROM act LEFT JOIN churn ON churn.day = act.day
    """,
)
def q245_growth_accounting(spark, sf_dir):
    """Daily growth accounting — DAU split into new / retained /
    resurrected, plus yesterday's churn: the standard activity ledger
    (new + retained + resurrected = DAU; churned from day d−1 balances
    the running count).  One (user, day) distinct, a broadcastable
    first-day table, and two self-joins on the (user, day±1) key —
    all hash joins on user-day, no windows over the raw event scan."""
    e = _t(spark, sf_dir, "events")
    ud = e.select(
        "user_id", F.to_date("ts").alias("day")
    ).distinct().localCheckpoint(eager=False)
    firsts = ud.groupBy("user_id").agg(F.min("day").alias("first_day"))
    prev = ud.select(
        "user_id", F.date_add("day", 1).alias("day"), F.lit(1).alias("_p")
    )
    cur = (
        ud.join(firsts, "user_id")
        .join(prev, ["user_id", "day"], "left")
        .select(
            "day",
            (F.col("day") == F.col("first_day")).alias("is_new"),
            F.col("_p").isNotNull().alias("was_active"),
        )
    )
    act = cur.groupBy("day").agg(
        F.count(F.lit(1)).alias("dau"),
        F.sum(F.col("is_new").cast("int")).alias("new_users"),
        F.sum((~F.col("is_new") & F.col("was_active")).cast("int")).alias(
            "retained"
        ),
        F.sum(
            (~F.col("is_new") & ~F.col("was_active")).cast("int")
        ).alias("resurrected"),
    )
    nxt = ud.select(
        "user_id", F.date_sub("day", 1).alias("day"), F.lit(1).alias("_n")
    )
    churn = (
        ud.join(nxt, ["user_id", "day"], "left")
        .filter(F.col("_n").isNull())
        .groupBy(F.date_add("day", 1).alias("day"))
        .agg(F.count(F.lit(1)).alias("churned"))
    )
    return (
        act.join(churn, "day", "left")
        .select(
            "day",
            "dau",
            "new_users",
            "retained",
            "resurrected",
            F.coalesce("churned", F.lit(0)).alias("churned"),
        )
    )


@register(
    "q246_frequent_triples",
    """
    WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    n AS (SELECT COUNT(DISTINCT l_orderkey)::DOUBLE AS n_orders FROM lineitem),
    t AS (
      SELECT x.l_partkey AS part_a, y.l_partkey AS part_b,
             z.l_partkey AS part_c, COUNT(*)::BIGINT AS support_cnt
      FROM b x
      JOIN b y ON x.l_orderkey = y.l_orderkey
              AND x.l_partkey < y.l_partkey
      JOIN b z ON y.l_orderkey = z.l_orderkey
              AND y.l_partkey < z.l_partkey
      GROUP BY 1, 2, 3 HAVING COUNT(*) >= 2
    )
    SELECT part_a, part_b, part_c, support_cnt,
           ROUND(support_cnt / n_orders, 6) AS support
    FROM t CROSS JOIN n
    ORDER BY support_cnt DESC, part_a, part_b, part_c LIMIT 20
    """,
)
def q246_frequent_triples(spark, sf_dir):
    """Frequent 3-itemsets over order baskets — the A-priori level
    above q224's pairs.  The within-basket double self-join fans out
    C(basket_size, 3), still bounded by the max lines per order (a
    data-shape constant), so triple volume stays linear in order count;
    at larger basket bounds the candidate set would first be pruned by
    the frequent-pair table (the A-priori antimonotonicity step)."""
    li = _t(spark, sf_dir, "lineitem")
    b = li.select("l_orderkey", "l_partkey").distinct().localCheckpoint(
        eager=False
    )
    n_orders = b.agg(
        F.count_distinct("l_orderkey").cast("double").alias("n_orders")
    )
    t = (
        b.alias("x")
        .join(
            b.alias("y"),
            (F.col("x.l_orderkey") == F.col("y.l_orderkey"))
            & (F.col("x.l_partkey") < F.col("y.l_partkey")),
        )
        .join(
            b.alias("z"),
            (F.col("y.l_orderkey") == F.col("z.l_orderkey"))
            & (F.col("y.l_partkey") < F.col("z.l_partkey")),
        )
        .groupBy(
            F.col("x.l_partkey").alias("part_a"),
            F.col("y.l_partkey").alias("part_b"),
            F.col("z.l_partkey").alias("part_c"),
        )
        .agg(F.count(F.lit(1)).alias("support_cnt"))
        .filter(F.col("support_cnt") >= 2)
    )
    return (
        t.join(F.broadcast(n_orders))
        .select(
            "part_a",
            "part_b",
            "part_c",
            "support_cnt",
            F.round(F.col("support_cnt") / F.col("n_orders"), 6).alias(
                "support"
            ),
        )
        .orderBy(
            F.desc("support_cnt"), "part_a", "part_b", "part_c"
        )
        .limit(20)
    )


@register(
    "q247_percentile_disc",
    """
    WITH r AS (
      SELECT l_returnflag,
             quantile_disc(l_extendedprice, 0.25) AS p25,
             quantile_disc(l_extendedprice, 0.5) AS p50,
             quantile_disc(l_extendedprice, 0.75) AS p75,
             quantile_disc(l_extendedprice, 0.99) AS p99
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, ROUND(p25, 2) AS p25, ROUND(p50, 2) AS p50,
           ROUND(p75, 2) AS p75, ROUND(p99, 2) AS p99
    FROM r
    """,
)
def q247_percentile_disc(spark, sf_dir):
    """Exact DISCRETE percentiles per group (an actual data value, not
    an interpolation — the complement of q216's continuous
    percentiles): lower-inverse-CDF semantics, computed per group with
    a rank window against the group row count — both engines pick the
    identical physical value so even un-rounded comparisons agree;
    ROUND(2) applied for the money columns regardless."""
    li = _t(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag").orderBy("l_extendedprice")
    cnt = Window.partitionBy("l_returnflag")
    r = li.select(
        "l_returnflag",
        "l_extendedprice",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(cnt).alias("n"),
    )

    def disc(q):
        # quantile_disc: smallest value whose cumulative rank fraction
        # reaches q — rn = ceil(q * n)
        return F.max(
            F.when(
                F.col("rn") == F.ceil(F.lit(q) * F.col("n")),
                F.col("l_extendedprice"),
            )
        )

    return r.groupBy("l_returnflag").agg(
        F.round(disc(0.25), 2).alias("p25"),
        F.round(disc(0.5), 2).alias("p50"),
        F.round(disc(0.75), 2).alias("p75"),
        F.round(disc(0.99), 2).alias("p99"),
    )


@register(
    "q248_weighted_jaccard",
    r"""
    WITH dw AS (
      SELECT DISTINCT doc_id, term FROM (
        SELECT doc_id, UNNEST(list_filter(
          string_split_regex(trim(text), '\s+'), x -> x <> '')) AS term
        FROM documents WHERE doc_id < 200)
    ),
    n AS (SELECT COUNT(DISTINCT doc_id)::DOUBLE AS n_docs FROM dw),
    idf AS (
      SELECT term, ln((SELECT n_docs FROM n) / COUNT(*)) AS w
      FROM dw GROUP BY term HAVING COUNT(*) <= 150
    ),
    dk AS (SELECT dw.doc_id, dw.term, idf.w FROM dw JOIN idf USING (term)),
    tot AS (SELECT doc_id, SUM(w) AS wt FROM dk GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, SUM(a.w) AS wi
      FROM dk a JOIN dk b ON a.term = b.term AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           ROUND(wi / (ta.wt + tb.wt - wi), 6) AS weighted_jaccard
    FROM inter
    JOIN tot ta ON ta.doc_id = id_a
    JOIN tot tb ON tb.doc_id = id_b
    WHERE wi / (ta.wt + tb.wt - wi) >= 0.6
    """,
)
def q248_weighted_jaccard(spark, sf_dir):
    """IDF-weighted Jaccard near-dup pairs: shared boilerplate terms
    contribute ~0 (idf → 0) so template-sharing docs stop looking like
    duplicates — the robustness upgrade over q45's unweighted overlap.
    Same scale hygiene: the df cap (≤150) bounds the inverted-index
    fanout BEFORE the self-join, idf and per-doc weights fold in as
    broadcast joins, and pair weight is one sum over the shared-term
    postings — never an all-pairs comparison."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    dw = d.select(
        "doc_id", F.explode(T.words("text")).alias("term")
    ).distinct()
    n_docs = dw.agg(
        F.count_distinct("doc_id").cast("double").alias("n_docs")
    )
    idf = (
        dw.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= 150)
        .join(F.broadcast(n_docs))
        .select("term", F.log(F.col("n_docs") / F.col("df")).alias("w"))
    )
    dk = dw.join(F.broadcast(idf), "term").localCheckpoint(eager=False)
    tot = dk.groupBy("doc_id").agg(F.sum("w").alias("wt"))
    inter = (
        dk.alias("a")
        .join(
            dk.alias("b"),
            (F.col("a.term") == F.col("b.term"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .agg(F.sum("a.w").alias("wi"))
    )
    ta = tot.select(F.col("doc_id").alias("id_a"), F.col("wt").alias("wa"))
    tb = tot.select(F.col("doc_id").alias("id_b"), F.col("wt").alias("wb"))
    wj = F.col("wi") / (F.col("wa") + F.col("wb") - F.col("wi"))
    return (
        inter.join(F.broadcast(ta), "id_a")
        .join(F.broadcast(tb), "id_b")
        .filter(wj >= 0.6)
        .select("id_a", "id_b", F.round(wj, 6).alias("weighted_jaccard"))
    )


@register(
    "q249_cusum_drift",
    """
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             COUNT(*)::DOUBLE AS x
      FROM events GROUP BY 1, 2
    ),
    m AS (
      SELECT event_type, AVG(x) AS mu, STDDEV_SAMP(x) AS sigma
      FROM daily GROUP BY 1
    ),
    c AS (
      SELECT daily.event_type, day, sigma,
             SUM(x - mu) OVER (PARTITION BY daily.event_type ORDER BY day
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS cum
      FROM daily JOIN m USING (event_type)
    )
    SELECT event_type, day,
           ROUND(cum - LEAST(0.0,
             MIN(cum) OVER (PARTITION BY event_type ORDER BY day
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW)), 6) AS cusum,
           ROUND(3 * sigma, 6) AS threshold
    FROM c
    """,
)
def q249_cusum_drift(spark, sf_dir):
    """One-sided CUSUM change-point statistic per event-type daily
    series.  The textbook recursion S_i = max(0, S_{i-1} + dev_i) is
    NOT window-expressible directly, but its prefix identity is:
    S_i = cum_i - min(0, min_{j<=i} cum_j) with cum the running sum of
    deviations — two ordered windows over the tiny day-aggregated
    table, so the engine-side work is one partial agg over raw events
    and the windows never touch row-level data.  Both engines sum the
    same values in the same day order, so no float divergence; the 3σ
    alarm threshold is emitted as a column rather than a boolean so no
    borderline comparison can flip between engines."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date(F.date_trunc("DAY", "ts")).alias("day")
    ).agg(F.count(F.lit(1)).cast("double").alias("x"))
    m = daily.groupBy("event_type").agg(
        F.avg("x").alias("mu"), F.stddev_samp("x").alias("sigma")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = daily.join(F.broadcast(m), "event_type").withColumn(
        "cum", F.sum(F.col("x") - F.col("mu")).over(w)
    )
    return c.select(
        "event_type",
        "day",
        F.round(
            F.col("cum") - F.least(F.lit(0.0), F.min("cum").over(w)), 6
        ).alias("cusum"),
        F.round(3 * F.col("sigma"), 6).alias("threshold"),
    )


@register(
    "q250_attribution",
    """
    WITH p AS (
      SELECT user_id, event_id AS pid, ts AS pts, value
      FROM events WHERE event_type = 'purchase'
    ),
    t AS (
      SELECT user_id, event_id AS tid, ts AS tts, event_type AS channel
      FROM events WHERE event_type <> 'purchase'
    ),
    j AS (
      SELECT pid, value, channel,
             ROW_NUMBER() OVER (PARTITION BY pid
                                ORDER BY tts ASC, tid ASC)  AS rn_first,
             ROW_NUMBER() OVER (PARTITION BY pid
                                ORDER BY tts DESC, tid DESC) AS rn_last
      FROM p JOIN t ON p.user_id = t.user_id AND t.tts < p.pts
    )
    SELECT channel,
           ROUND(COALESCE(SUM(CASE WHEN rn_first = 1 THEN value END),
                          0.0), 2) AS first_touch_rev,
           COUNT(CASE WHEN rn_first = 1 THEN 1 END) AS first_touch_n,
           ROUND(COALESCE(SUM(CASE WHEN rn_last = 1 THEN value END),
                          0.0), 2) AS last_touch_rev,
           COUNT(CASE WHEN rn_last = 1 THEN 1 END) AS last_touch_n
    FROM j WHERE rn_first = 1 OR rn_last = 1
    GROUP BY channel
    """,
)
def q250_attribution(spark, sf_dir):
    """First-touch / last-touch revenue attribution: each purchase's
    value credits the user's earliest and latest preceding non-purchase
    event's channel.  The purchase x prior-touch join is keyed on
    user_id — per-user fan-out only, bounded by session depth, never a
    corpus cross join — and both ROW_NUMBER picks run over one
    purchase-id partitioning so Spark plans a single sort.  (ts, id)
    tiebreaks make the pick deterministic on both engines."""
    ev = _t(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("pid"),
        F.col("ts").alias("pts"),
        "value",
    )
    t = ev.filter(F.col("event_type") != "purchase").select(
        "user_id",
        F.col("event_id").alias("tid"),
        F.col("ts").alias("tts"),
        F.col("event_type").alias("channel"),
    )
    j = p.join(t, ["user_id"]).filter(F.col("tts") < F.col("pts"))
    wf = Window.partitionBy("pid").orderBy(
        F.col("tts").asc(), F.col("tid").asc()
    )
    wl = Window.partitionBy("pid").orderBy(
        F.col("tts").desc(), F.col("tid").desc()
    )
    j = j.select(
        "pid",
        "value",
        "channel",
        F.row_number().over(wf).alias("rn_first"),
        F.row_number().over(wl).alias("rn_last"),
    )
    # ONE pass: a row is a first/last pick or filtered out; conditional
    # sums split the two models without re-deriving the join per branch
    return (
        j.filter((F.col("rn_first") == 1) | (F.col("rn_last") == 1))
        .groupBy("channel")
        .agg(
            F.round(
                F.coalesce(
                    F.sum(F.when(F.col("rn_first") == 1, F.col("value"))),
                    F.lit(0.0),
                ),
                2,
            ).alias("first_touch_rev"),
            F.count(F.when(F.col("rn_first") == 1, 1)).alias(
                "first_touch_n"
            ),
            F.round(
                F.coalesce(
                    F.sum(F.when(F.col("rn_last") == 1, F.col("value"))),
                    F.lit(0.0),
                ),
                2,
            ).alias("last_touch_rev"),
            F.count(F.when(F.col("rn_last") == 1, 1)).alias(
                "last_touch_n"
            ),
        )
    )


@register(
    "q251_cohort_ltv",
    """
    WITH first_seen AS (
      SELECT user_id,
             CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
      FROM events GROUP BY user_id
    ),
    size AS (
      SELECT cohort_week, COUNT(*)::DOUBLE AS n_users
      FROM first_seen GROUP BY 1
    ),
    rev AS (
      SELECT f.cohort_week,
             CAST(date_diff('day', f.cohort_week,
                  CAST(date_trunc('week', e.ts) AS DATE)) // 7 AS BIGINT)
               AS age_wk,
             SUM(e.value) AS wk_rev
      FROM events e
      JOIN first_seen f ON e.user_id = f.user_id
      WHERE e.event_type = 'purchase'
      GROUP BY 1, 2
    )
    SELECT r.cohort_week, r.age_wk,
           ROUND(SUM(wk_rev) OVER (PARTITION BY r.cohort_week
                                   ORDER BY r.age_wk
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW) / s.n_users, 4)
             AS cum_ltv_per_user
    FROM rev r JOIN size s USING (cohort_week)
    """,
)
def q251_cohort_ltv(spark, sf_dir):
    """Cohort lifetime-value curve: users cohorted by first-seen week,
    purchase revenue bucketed by cohort age in weeks, cumulated along
    age and normalized by cohort size.  Weekly pre-aggregation happens
    BEFORE the cumulative window, so the ordered window runs over a
    (cohorts x weeks)-sized table, not raw events; the cohort-size
    divisor arrives as a broadcast join."""
    ev = _t(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.to_date(F.date_trunc("week", F.min("ts"))).alias("cohort_week")
    )
    size = first_seen.groupBy("cohort_week").agg(
        F.count(F.lit(1)).cast("double").alias("n_users")
    )
    rev = (
        ev.filter(F.col("event_type") == "purchase")
        .join(first_seen, "user_id")
        .groupBy(
            "cohort_week",
            F.floor(
                F.datediff(
                    F.to_date(F.date_trunc("week", F.col("ts"))),
                    F.col("cohort_week"),
                )
                / 7
            )
            .cast("bigint")
            .alias("age_wk"),
        )
        .agg(F.sum("value").alias("wk_rev"))
    )
    w = (
        Window.partitionBy("cohort_week")
        .orderBy("age_wk")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return rev.join(F.broadcast(size), "cohort_week").select(
        "cohort_week",
        "age_wk",
        F.round(F.sum("wk_rev").over(w) / F.col("n_users"), 4).alias(
            "cum_ltv_per_user"
        ),
    )


@register(
    "q252_corr_matrix",
    """
    WITH a AS (
      SELECT corr(l_quantity, l_extendedprice) AS c_qty_price,
             corr(l_quantity, l_discount)      AS c_qty_disc,
             corr(l_quantity, l_tax)           AS c_qty_tax,
             corr(l_extendedprice, l_discount) AS c_price_disc,
             corr(l_extendedprice, l_tax)      AS c_price_tax,
             corr(l_discount, l_tax)           AS c_disc_tax
      FROM lineitem
    )
    SELECT 'l_quantity' AS col_a, 'l_extendedprice' AS col_b,
           ROUND(c_qty_price, 6) AS pearson FROM a
    UNION ALL SELECT 'l_quantity', 'l_discount', ROUND(c_qty_disc, 6) FROM a
    UNION ALL SELECT 'l_quantity', 'l_tax', ROUND(c_qty_tax, 6) FROM a
    UNION ALL SELECT 'l_extendedprice', 'l_discount',
                     ROUND(c_price_disc, 6) FROM a
    UNION ALL SELECT 'l_extendedprice', 'l_tax',
                     ROUND(c_price_tax, 6) FROM a
    UNION ALL SELECT 'l_discount', 'l_tax', ROUND(c_disc_tax, 6) FROM a
    """,
)
def q252_corr_matrix(spark, sf_dir):
    """Pairwise Pearson correlation matrix (upper triangle, long form)
    over the lineitem numeric columns — all six coefficients in ONE
    full scan (one partial-agg pass computes every sum/sum-of-squares/
    cross-product), then a 1-row stack() melt.  The melt is driver-free:
    stack runs on the single agg row inside the plan."""
    li = _t(spark, sf_dir, "lineitem")
    a = li.agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("c1"),
        F.round(F.corr("l_quantity", "l_discount"), 6).alias("c2"),
        F.round(F.corr("l_quantity", "l_tax"), 6).alias("c3"),
        F.round(F.corr("l_extendedprice", "l_discount"), 6).alias("c4"),
        F.round(F.corr("l_extendedprice", "l_tax"), 6).alias("c5"),
        F.round(F.corr("l_discount", "l_tax"), 6).alias("c6"),
    )
    return a.select(
        F.expr(
            "stack(6, "
            "'l_quantity', 'l_extendedprice', c1, "
            "'l_quantity', 'l_discount', c2, "
            "'l_quantity', 'l_tax', c3, "
            "'l_extendedprice', 'l_discount', c4, "
            "'l_extendedprice', 'l_tax', c5, "
            "'l_discount', 'l_tax', c6) AS (col_a, col_b, pearson)"
        )
    )


@register(
    "q253_kn_bigram",
    r"""
    WITH toks AS (
      SELECT doc_id, w, ord,
             LEAD(w) OVER (PARTITION BY doc_id ORDER BY ord) AS w2
      FROM (
        SELECT doc_id, UNNEST(tok) AS w,
               generate_subscripts(tok, 1) AS ord
        FROM (
          SELECT doc_id, list_filter(
            string_split_regex(trim(text), '\s+'), x -> x <> '') AS tok
          FROM documents WHERE doc_id < 500)
      )
    ),
    big AS (
      SELECT w AS w1, w2, COUNT(*)::DOUBLE AS c12
      FROM toks WHERE w2 IS NOT NULL GROUP BY 1, 2
    ),
    fw AS (
      SELECT w1, SUM(c12) AS c1, COUNT(*)::DOUBLE AS n1p_fw
      FROM big GROUP BY w1
    ),
    bw AS (SELECT w2, COUNT(*)::DOUBLE AS n1p_bw FROM big GROUP BY w2),
    tot AS (SELECT SUM(n1p_bw) AS types FROM bw),
    top20 AS (
      SELECT w1, c1, n1p_fw FROM (
        SELECT *, ROW_NUMBER() OVER (ORDER BY c1 DESC, w1 ASC) AS rk
        FROM fw) WHERE rk <= 20
    ),
    p AS (
      SELECT b.w1, b.w2,
             ROUND(GREATEST(b.c12 - 0.75, 0.0) / t.c1
                   + 0.75 * t.n1p_fw / t.c1 * (bw.n1p_bw / tot.types), 6)
               AS p_kn
      FROM big b
      JOIN top20 t ON b.w1 = t.w1
      JOIN bw ON b.w2 = bw.w2
      CROSS JOIN tot
    )
    SELECT w1, w2, p_kn FROM (
      SELECT w1, w2, p_kn,
             ROW_NUMBER() OVER (PARTITION BY w1
                                ORDER BY p_kn DESC, w2 ASC) AS rk
      FROM p) WHERE rk <= 5
    """,
)
def q253_kn_bigram(spark, sf_dir):
    """Interpolated Kneser-Ney bigram language model (discount 0.75):
    P(w2|w1) = max(c12-d,0)/c1 + d*N1+(w1,.)/c1 * N1+(.,w2)/N1+(.,.),
    reported as top-5 continuations for the 20 most frequent contexts.
    Everything is count aggregation over the bigram table — the
    continuation counts N1+ are DISTINCT-predecessor counts, which fall
    out of the same grouped bigram-type table for free (no second scan
    of raw text).  The scalar type total folds in as a 1-row broadcast
    cross join; ranking happens on the ROUNDed probability with a word
    tiebreak so both engines pick identical top-5 sets."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    toks = d.select(
        "doc_id", F.posexplode(T.words("text")).alias("ord", "w")
    )
    nxt = Window.partitionBy("doc_id").orderBy("ord")
    big = (
        toks.withColumn("w2", F.lead("w").over(nxt))
        .filter(F.col("w2").isNotNull())
        .groupBy(F.col("w").alias("w1"), "w2")
        .agg(F.count(F.lit(1)).cast("double").alias("c12"))
    )
    big = big.localCheckpoint(eager=False)
    fw = big.groupBy("w1").agg(
        F.sum("c12").alias("c1"),
        F.count(F.lit(1)).cast("double").alias("n1p_fw"),
    )
    bw = big.groupBy("w2").agg(
        F.count(F.lit(1)).cast("double").alias("n1p_bw")
    )
    tot = bw.agg(F.sum("n1p_bw").alias("types"))
    # global top-20 contexts via TakeOrderedAndProject (partition-local
    # top-k + driver merge of 20-row heads) — no single-partition window
    top20 = fw.orderBy(F.col("c1").desc(), F.col("w1").asc()).limit(20)
    p = (
        big.join(F.broadcast(top20), "w1")
        .join(F.broadcast(bw), "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            F.round(
                F.greatest(F.col("c12") - 0.75, F.lit(0.0)) / F.col("c1")
                + 0.75
                * F.col("n1p_fw")
                / F.col("c1")
                * (F.col("n1p_bw") / F.col("types")),
                6,
            ).alias("p_kn"),
        )
    )
    w5 = Window.partitionBy("w1").orderBy(
        F.col("p_kn").desc(), F.col("w2").asc()
    )
    return (
        p.withColumn("rk", F.row_number().over(w5))
        .filter(F.col("rk") <= 5)
        .select("w1", "w2", "p_kn")
    )


@register(
    "q254_dow_seasonality",
    """
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             dayofweek(CAST(date_trunc('day', ts) AS DATE)) AS dow,
             COUNT(*)::DOUBLE AS x
      FROM events GROUP BY 1, 2
    ),
    base AS (SELECT AVG(x) AS overall FROM daily)
    SELECT dow,
           COUNT(*)                          AS n_days,
           ROUND(AVG(x), 6)                  AS avg_count,
           ROUND(AVG(x) / overall, 6)        AS seasonal_index,
           ROUND(STDDEV_SAMP(x), 6)          AS day_std
    FROM daily CROSS JOIN base
    GROUP BY dow, overall
    """,
)
def q254_dow_seasonality(spark, sf_dir):
    """Day-of-week seasonal index: per-DOW mean daily event volume over
    the overall daily mean (index 1.0 = no weekly seasonality), plus
    the within-DOW spread.  The window never sees raw events — one
    partial agg to days, then a 7-group agg with the overall mean as a
    1-row broadcast.  DOW is numbered 0=Sunday on both engines (Spark's
    1-based dayofweek is shifted by one)."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.to_date(F.date_trunc("DAY", "ts")).alias("day")
    ).agg(F.count(F.lit(1)).cast("double").alias("x"))
    daily = daily.withColumn(
        "dow", (F.dayofweek("day") - F.lit(1)).cast("bigint")
    )
    base = daily.agg(F.avg("x").alias("overall"))
    return (
        daily.crossJoin(F.broadcast(base))
        .groupBy("dow", "overall")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.round(F.avg("x"), 6).alias("avg_count"),
            F.round(F.avg("x") / F.col("overall"), 6).alias(
                "seasonal_index"
            ),
            F.round(F.stddev_samp("x"), 6).alias("day_std"),
        )
        .select("dow", "n_days", "avg_count", "seasonal_index", "day_std")
    )


@register(
    "q255_tfidf_cosine",
    r"""
    WITH tf AS (
      SELECT doc_id, term, COUNT(*)::DOUBLE AS tf FROM (
        SELECT doc_id, UNNEST(list_filter(
          string_split_regex(trim(text), '\s+'), x -> x <> '')) AS term
        FROM documents WHERE doc_id < 200)
      GROUP BY 1, 2
    ),
    n AS (SELECT COUNT(DISTINCT doc_id)::DOUBLE AS n_docs FROM tf),
    idf AS (
      SELECT term, ln((SELECT n_docs FROM n) / COUNT(*)) AS idf
      FROM tf GROUP BY term HAVING COUNT(*) <= 150
    ),
    w AS (
      SELECT tf.doc_id, tf.term, tf.tf * idf.idf AS w
      FROM tf JOIN idf USING (term)
    ),
    nrm AS (SELECT doc_id, SQRT(SUM(w * w)) AS nn FROM w GROUP BY doc_id),
    dot AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, SUM(a.w * b.w) AS d
      FROM w a JOIN w b ON a.term = b.term AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b, ROUND(d / (na.nn * nb.nn), 6) AS cosine
    FROM dot
    JOIN nrm na ON na.doc_id = id_a
    JOIN nrm nb ON nb.doc_id = id_b
    WHERE d / (na.nn * nb.nn) >= 0.5
    """,
)
def q255_tfidf_cosine(spark, sf_dir):
    """Sparse TF-IDF cosine document-similarity join via the inverted
    index: weights live per (doc, term) posting, the dot product is one
    grouped sum over shared-term postings, and the norms fold in as
    broadcast joins — never a dense-vector cross join.  The df cap
    (<= 150) bounds posting-list fanout before the self-join, the same
    sum-of-df-squared contract as the q45/q248 n-gram index family."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    tf = (
        d.select("doc_id", F.explode(T.words("text")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )
    n_docs = tf.agg(
        F.count_distinct("doc_id").cast("double").alias("n_docs")
    )
    idf = (
        tf.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= 150)
        .join(F.broadcast(n_docs))
        .select("term", F.log(F.col("n_docs") / F.col("df")).alias("idf"))
    )
    w = (
        tf.join(F.broadcast(idf), "term")
        .select("doc_id", "term", (F.col("tf") * F.col("idf")).alias("w"))
        .localCheckpoint(eager=False)
    )
    nrm = w.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nn")
    )
    dot = (
        w.alias("a")
        .join(
            w.alias("b"),
            (F.col("a.term") == F.col("b.term"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .agg(F.sum(F.col("a.w") * F.col("b.w")).alias("d"))
    )
    na = nrm.select(F.col("doc_id").alias("id_a"), F.col("nn").alias("na"))
    nb = nrm.select(F.col("doc_id").alias("id_b"), F.col("nn").alias("nb"))
    cos = F.col("d") / (F.col("na") * F.col("nb"))
    return (
        dot.join(F.broadcast(na), "id_a")
        .join(F.broadcast(nb), "id_b")
        .filter(cos >= 0.5)
        .select("id_a", "id_b", F.round(cos, 6).alias("cosine"))
    )


@register(
    "q256_adamic_adar",
    """
    WITH und AS (
      SELECT DISTINCT LEAST(l_orderkey % 2000, l_partkey % 2000) AS a,
                      GREATEST(l_orderkey % 2000, l_partkey % 2000) AS b
      FROM lineitem
      WHERE l_orderkey % 2000 <> l_partkey % 2000 AND l_quantity <= 5
    ),
    sym AS (SELECT a AS id, b AS nbr FROM und
            UNION ALL SELECT b, a FROM und),
    deg AS (SELECT id, COUNT(*) AS deg FROM sym GROUP BY id),
    cw AS (SELECT id AS c, 1.0 / ln(deg) AS w FROM deg WHERE deg >= 2),
    centers AS (
      SELECT sym.nbr AS c, sym.id AS leaf, cw.w
      FROM sym JOIN cw ON sym.nbr = cw.c
    ),
    pairs AS (
      SELECT l.leaf AS id_a, r.leaf AS id_b,
             CAST(COUNT(*) AS BIGINT) AS common, SUM(l.w) AS score
      FROM centers l JOIN centers r
        ON l.c = r.c AND l.leaf < r.leaf
      GROUP BY 1, 2 HAVING COUNT(*) >= 2
    )
    SELECT id_a, id_b, common, ROUND(score, 6) AS score
    FROM pairs p
    WHERE NOT EXISTS (SELECT 1 FROM und
                      WHERE und.a = p.id_a AND und.b = p.id_b)
    """,
)
def q256_adamic_adar(spark, sf_dir):
    """Adamic-Adar link prediction on the sparse lineitem graph:
    candidate (non-adjacent) pairs scored by Σ 1/ln(deg) over shared
    neighbors.  Pairs generate only through the wedge join (`graph/
    algorithms.py::adamic_adar`), the 1/ln(deg) weight rides the wedge
    row, and adjacency exclusion is one left_anti on the canonical edge
    set — never an all-pairs scan."""
    li = _t(spark, sf_dir, "lineitem")
    e = (
        li.filter(F.col("l_quantity") <= 5)
        .select(
            (F.col("l_orderkey") % 2000).alias("src"),
            (F.col("l_partkey") % 2000).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
        .withColumn("weight", F.lit(1.0))
    )
    g = PropertyGraph.from_edges(e, prepartition=False)
    out = alg.adamic_adar(g, min_common=2)
    return out.withColumn("score", F.round("score", 6))


@register(
    "q257_ngram_novelty",
    r"""
    WITH ws AS (
      SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'),
                                 x -> x <> '') AS w
      FROM documents WHERE doc_id < 500
    ),
    g AS (
      SELECT doc_id,
             CASE WHEN len(w) >= 3 THEN list_distinct(list_transform(
                    range(1, len(w) - 3 + 2),
                    i -> array_to_string(w[i:i+2], ' ')))
                  ELSE [] END AS grams
      FROM ws
    ),
    e AS (SELECT doc_id, UNNEST(grams) AS gram FROM g),
    firsts AS (SELECT gram, MIN(doc_id) AS first_doc FROM e GROUP BY gram)
    SELECT e.doc_id,
           COUNT(*) AS n_grams,
           ROUND(SUM(CASE WHEN first_doc = e.doc_id THEN 1 ELSE 0
                     END)::DOUBLE / COUNT(*), 6) AS novel_frac
    FROM e JOIN firsts USING (gram)
    GROUP BY e.doc_id
    """,
)
def q257_ngram_novelty(spark, sf_dir):
    """Marginal-novelty curve: per document (in doc_id ingest order),
    the fraction of its distinct word 3-grams never seen in any earlier
    document — the signal behind dedup-aware data valuation ('how much
    NEW text does each incremental source add').  One grouped MIN over
    the exploded gram postings finds each gram's first holder; the
    per-doc share is a second agg over the same postings — both shuffle
    on the gram key, the inverted-index shape, with no window over raw
    text and no pairwise comparison."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    e = d.select(
        "doc_id",
        F.explode(T.word_ngrams("text", 3, distinct=True)).alias("gram"),
    )
    e = e.localCheckpoint(eager=False)
    firsts = e.groupBy("gram").agg(F.min("doc_id").alias("first_doc"))
    return (
        e.join(firsts, "gram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.round(
                F.sum(
                    F.when(
                        F.col("first_doc") == F.col("doc_id"), 1
                    ).otherwise(0)
                ).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("novel_frac"),
        )
    )


@register(
    "q258_token_fertility",
    r"""
    WITH t AS (
      SELECT lang,
             len(regexp_extract_all(text,
                 '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]'))::BIGINT AS toks,
             len(list_filter(string_split_regex(trim(text), '\s+'),
                             x -> x <> ''))::BIGINT AS words,
             length(text)::BIGINT AS chars
      FROM documents
    )
    SELECT lang,
           COUNT(*)                                   AS n_docs,
           ROUND(SUM(toks)::DOUBLE / SUM(words), 6)   AS fertility,
           ROUND(SUM(chars)::DOUBLE / SUM(toks), 6)   AS chars_per_token
    FROM t GROUP BY lang
    """,
)
def q258_token_fertility(spark, sf_dir):
    """Tokenizer fertility per language: BPE-ish tokens per whitespace
    word (high fertility = the tokenizer fragments that language,
    inflating training cost per useful word) plus characters per token.
    Pure scan-speed expressions (the shared TOKEN_REGEX) into one
    partial-aggregated groupBy — zero joins, zero windows."""
    d = _t(spark, sf_dir, "documents")
    t = d.select(
        "lang",
        T.token_count("text").cast("bigint").alias("toks"),
        T.n_words("text").cast("bigint").alias("words"),
        F.length("text").cast("bigint").alias("chars"),
    )
    return t.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(
            F.sum("toks").cast("double") / F.sum("words"), 6
        ).alias("fertility"),
        F.round(
            F.sum("chars").cast("double") / F.sum("toks"), 6
        ).alias("chars_per_token"),
    )


@register("q261_graph_coloring", None)  # MIS peeling runs to a
# data-dependent fixpoint per color — no fixed-depth SQL form; verified
# by the properness/Δ+1/determinism pytest goldens
# (tests/test_graph_algorithms.py::test_greedy_coloring_proper_and_bounded)
def q261_graph_coloring(spark, sf_dir):
    """Distributed greedy vertex coloring (iterative deterministic-MIS
    peeling) of the sparse lineitem graph, reported as a color
    histogram — the conflict-free scheduling primitive (a color class
    is a set of vertices safe to update concurrently)."""
    li = _t(spark, sf_dir, "lineitem")
    # mod-4000 keeps the fixture graph SPARSE at every sf (a dense
    # remainder graph approaches a clique, where Δ+1 coloring is the
    # answer, not a test of the peel)
    e = (
        li.filter(F.col("l_quantity") <= 2)
        .select(
            (F.col("l_orderkey") % 4000).alias("src"),
            (F.col("l_partkey") % 4000).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
        .withColumn("weight", F.lit(1.0))
    )
    g = PropertyGraph.from_edges(e, prepartition=False)
    col = alg.greedy_coloring(g)
    return col.groupBy("color").agg(F.count(F.lit(1)).alias("n_vertices"))


@register(
    "q259_windowed_funnel",
    """
    WITH s1 AS (
      SELECT user_id, MIN(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    s2 AS (
      SELECT e.user_id, MIN(e.ts) AS t2
      FROM events e JOIN s1 ON e.user_id = s1.user_id
      WHERE e.event_type = 'click' AND e.ts > s1.t1
        AND e.ts <= s1.t1 + INTERVAL 24 HOUR
      GROUP BY e.user_id
    ),
    s3 AS (
      SELECT e.user_id
      FROM events e
      JOIN s1 ON e.user_id = s1.user_id
      JOIN s2 ON e.user_id = s2.user_id
      WHERE e.event_type = 'purchase' AND e.ts > s2.t2
        AND e.ts <= s1.t1 + INTERVAL 24 HOUR
      GROUP BY e.user_id
    ),
    lv AS (
      SELECT s1.user_id,
             CASE WHEN s3.user_id IS NOT NULL THEN 3
                  WHEN s2.user_id IS NOT NULL THEN 2
                  ELSE 1 END AS funnel_level
      FROM s1
      LEFT JOIN s2 ON s1.user_id = s2.user_id
      LEFT JOIN s3 ON s1.user_id = s3.user_id
    )
    SELECT funnel_level, COUNT(*) AS users,
           ROUND(COUNT(*)::DOUBLE / (SELECT COUNT(*) FROM s1), 6)
             AS share_of_entered
    FROM lv GROUP BY funnel_level
    """,
)
def q259_windowed_funnel(spark, sf_dir):
    """Strict ordered windowed funnel (the windowFunnel shape):
    view → click → purchase, each step strictly after the previous and
    all within 24 h of the FIRST step.  Each stage is one filtered
    groupBy-min joined on user_id — per-user work only, no window over
    raw events, no self-join wider than the user key — and the final
    level histogram is a 3-row aggregate."""
    ev = _t(spark, sf_dir, "events")
    day = F.expr("INTERVAL 24 HOURS")
    s1 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        ev.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(
            (F.col("ts") > F.col("t1"))
            & (F.col("ts") <= F.col("t1") + day)
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s1, "user_id")
        .join(s2, "user_id")
        .filter(
            (F.col("ts") > F.col("t2"))
            & (F.col("ts") <= F.col("t1") + day)
        )
        .select("user_id")
        .distinct()
    )
    lv = (
        s1.join(s2.select("user_id", F.lit(1).alias("_s2")), "user_id", "left")
        .join(s3.select("user_id", F.lit(1).alias("_s3")), "user_id", "left")
        .select(
            "user_id",
            F.when(F.col("_s3").isNotNull(), 3)
            .when(F.col("_s2").isNotNull(), 2)
            .otherwise(1)
            .alias("funnel_level"),
        )
    )
    entered = s1.agg(F.count(F.lit(1)).alias("_n"))
    return (
        lv.groupBy("funnel_level")
        .agg(F.count(F.lit(1)).alias("users"))
        .crossJoin(F.broadcast(entered))
        .select(
            "funnel_level",
            "users",
            F.round(F.col("users").cast("double") / F.col("_n"), 6).alias(
                "share_of_entered"
            ),
        )
    )


@register(
    "q260_calibration_bins",
    """
    WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
               FROM embeddings),
    pairs AS (
      SELECT a.label = b.label AS same,
             ROUND(list_sum(list_transform(range(1, len(a.v) + 1),
                              i -> a.v[i] * b.v[i]))
               / (sqrt(list_sum(list_transform(a.v, x -> x * x)))
                * sqrt(list_sum(list_transform(b.v, x -> x * x)))), 4)
               AS cosine
      FROM e a JOIN e b
        ON b.vec_id > a.vec_id AND b.vec_id <= a.vec_id + 50
    )
    SELECT CAST(LEAST(FLOOR((cosine + 1.0) / 0.2), 9) AS BIGINT) AS bin,
           COUNT(*) AS n_pairs,
           ROUND(AVG(cosine), 6) AS avg_cosine,
           ROUND(AVG(CASE WHEN same THEN 1.0 ELSE 0.0 END), 6)
             AS same_label_rate
    FROM pairs GROUP BY 1
    """,
)
def q260_calibration_bins(spark, sf_dir):
    """Reliability curve for embedding similarity as a same-class
    predictor: banded local pairs (id distance ≤ 50 — a deterministic
    O(n·band) sample, never all-pairs), cosine binned into ten
    fixed-width bins over [-1, 1], and the empirical same-label rate
    per bin.  Binning happens on the ROUNDed cosine so both engines
    place borderline pairs identically; the band condition is a range
    join AQE can turn into a broadcast range join at this width."""
    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id", "label", V.as_double("embedding").alias("v")
    )
    # bucket blocking turns the band predicate into an EQUI join (the
    # band_join technique): b in (a, a+50] implies floor(b/50) is
    # floor(a/50) or +1, so a 2× explode on one side replaces the
    # nested-loop theta join with a hash join + residual filter
    bk = F.floor(F.col("vec_id") / 50).cast("long")
    a = e.select(
        F.col("vec_id").alias("ida"),
        F.col("label").alias("la"),
        F.col("v").alias("va"),
        F.explode(F.array(bk, bk + 1)).alias("_bk"),
    )
    b = e.select(
        F.col("vec_id").alias("idb"),
        F.col("label").alias("lb"),
        F.col("v").alias("vb"),
        bk.alias("_bk"),
    )
    pairs = (
        a.join(b, "_bk")
        .filter(
            (F.col("idb") > F.col("ida"))
            & (F.col("idb") <= F.col("ida") + 50)
        )
        .select(
            (F.col("la") == F.col("lb")).alias("same"),
            F.round(V.cosine(F.col("va"), F.col("vb")), 4).alias("cosine"),
        )
    )
    return (
        pairs.groupBy(
            F.least(F.floor((F.col("cosine") + 1.0) / 0.2), F.lit(9))
            .cast("bigint")
            .alias("bin")
        )
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(F.avg("cosine"), 6).alias("avg_cosine"),
            F.round(
                F.avg(F.when(F.col("same"), 1.0).otherwise(0.0)), 6
            ).alias("same_label_rate"),
        )
    )


@register(
    "q262_matryoshka_audit",
    """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    pairs AS (
      SELECT ROUND(list_sum(list_transform(range(1, len(a.v) + 1),
                              i -> a.v[i] * b.v[i]))
               / (sqrt(list_sum(list_transform(a.v, x -> x * x)))
                * sqrt(list_sum(list_transform(b.v, x -> x * x)))), 4)
               AS cos_full,
             ROUND(list_sum(list_transform(range(1, 33),
                              i -> a.v[i] * b.v[i]))
               / (sqrt(list_sum(list_transform(a.v[1:32], x -> x * x)))
                * sqrt(list_sum(list_transform(b.v[1:32], x -> x * x)))),
               4) AS cos_half
      FROM e a JOIN e b
        ON b.vec_id > a.vec_id AND b.vec_id <= a.vec_id + 25
    )
    SELECT CAST(LEAST(FLOOR((cos_full + 1.0) / 0.2), 9) AS BIGINT) AS bin,
           COUNT(*) AS n_pairs,
           ROUND(AVG(cos_half - cos_full), 6) AS mean_shift,
           ROUND(AVG(ABS(cos_half - cos_full)), 6) AS mean_abs_err
    FROM pairs GROUP BY 1
    """,
)
def q262_matryoshka_audit(spark, sf_dir):
    """Matryoshka-truncation audit: how well does cosine on the FIRST
    HALF of each embedding (dim 64 → 32) preserve full-dim cosine —
    the measurement behind serving truncated vectors for cheap ANN
    pre-filtering.  Banded local pairs (never all-pairs); both cosines
    are computed in one pass over each pair and binned by the rounded
    full-dim score, so the report reads 'truncation error as a function
    of true similarity'."""
    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id", V.as_double("embedding").alias("v")
    )
    half = lambda c: F.slice(c, 1, 32)  # noqa: E731
    # same bucket-blocking equi-join as q260 (band 25)
    bk = F.floor(F.col("vec_id") / 25).cast("long")
    a = e.select(
        F.col("vec_id").alias("ida"),
        F.col("v").alias("va"),
        F.explode(F.array(bk, bk + 1)).alias("_bk"),
    )
    b = e.select(
        F.col("vec_id").alias("idb"),
        F.col("v").alias("vb"),
        bk.alias("_bk"),
    )
    pairs = (
        a.join(b, "_bk")
        .filter(
            (F.col("idb") > F.col("ida"))
            & (F.col("idb") <= F.col("ida") + 25)
        )
        .select(
            F.round(V.cosine(F.col("va"), F.col("vb")), 4).alias(
                "cos_full"
            ),
            F.round(
                V.cosine(half(F.col("va")), half(F.col("vb"))), 4
            ).alias("cos_half"),
        )
    )
    diff = F.col("cos_half") - F.col("cos_full")
    return (
        pairs.groupBy(
            F.least(F.floor((F.col("cos_full") + 1.0) / 0.2), F.lit(9))
            .cast("bigint")
            .alias("bin")
        )
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(F.avg(diff), 6).alias("mean_shift"),
            F.round(F.avg(F.abs(diff)), 6).alias("mean_abs_err"),
        )
    )


@register(
    "q263_rich_club",
    """
    WITH und AS (
      SELECT DISTINCT LEAST(l_orderkey % 2000, l_partkey % 2000) AS a,
                      GREATEST(l_orderkey % 2000, l_partkey % 2000) AS b
      FROM lineitem
      WHERE l_orderkey % 2000 <> l_partkey % 2000 AND l_quantity <= 5
    ),
    sym AS (SELECT a AS id, b AS nbr FROM und
            UNION ALL SELECT b, a FROM und),
    deg AS (SELECT id, COUNT(*) AS deg FROM sym GROUP BY id),
    dh AS (SELECT deg AS d, COUNT(*) AS nd FROM deg GROUP BY deg),
    em AS (
      SELECT LEAST(da.deg, db.deg) AS m, COUNT(*) AS ne
      FROM und JOIN deg da ON und.a = da.id
               JOIN deg db ON und.b = db.id
      GROUP BY 1
    ),
    grid AS (SELECT UNNEST(generate_series(1, (SELECT MAX(deg) - 1
                                               FROM deg))) AS k),
    nk AS (SELECT k, SUM(CASE WHEN d > k THEN nd ELSE 0 END) AS n_nodes
           FROM grid CROSS JOIN dh GROUP BY k),
    ek AS (SELECT k, SUM(CASE WHEN m > k THEN ne ELSE 0 END) AS n_edges
           FROM grid CROSS JOIN em GROUP BY k)
    SELECT nk.k, nk.n_nodes, COALESCE(ek.n_edges, 0) AS n_edges,
           ROUND(2.0 * COALESCE(ek.n_edges, 0)
                 / (nk.n_nodes * (nk.n_nodes - 1)), 6) AS phi
    FROM nk LEFT JOIN ek ON nk.k = ek.k
    WHERE nk.n_nodes >= 2
    """,
)
def q263_rich_club(spark, sf_dir):
    """Rich-club coefficient curve φ(k): the edge density among
    vertices of degree > k, for every k — do high-degree vertices
    preferentially interconnect?  The edge table collapses to a
    min-endpoint-degree histogram and the vertex table to a degree
    histogram BEFORE the k-grid expands (grid × histogram is
    max_degree² tiny rows), so no per-k pass over real edges ever
    happens."""
    li = _t(spark, sf_dir, "lineitem")
    und = (
        li.filter(F.col("l_quantity") <= 5)
        .select(
            F.least(
                F.col("l_orderkey") % 2000, F.col("l_partkey") % 2000
            ).alias("a"),
            F.greatest(
                F.col("l_orderkey") % 2000, F.col("l_partkey") % 2000
            ).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    sym = und.select(F.col("a").alias("id")).unionByName(
        und.select(F.col("b").alias("id"))
    )
    deg = sym.groupBy("id").agg(F.count(F.lit(1)).alias("deg"))
    dh = deg.groupBy(F.col("deg").alias("d")).agg(
        F.count(F.lit(1)).alias("nd")
    )
    em = (
        und.join(deg.select(F.col("id").alias("a"),
                            F.col("deg").alias("da")), "a")
        .join(deg.select(F.col("id").alias("b"),
                         F.col("deg").alias("db")), "b")
        .groupBy(F.least("da", "db").alias("m"))
        .agg(F.count(F.lit(1)).alias("ne"))
    )
    max_deg = deg.agg(F.max("deg").alias("mx"))
    grid = max_deg.select(
        F.explode(F.sequence(F.lit(1), F.col("mx") - 1)).alias("k")
    )
    nk = (
        grid.crossJoin(F.broadcast(dh))
        .groupBy("k")
        .agg(
            F.sum(
                F.when(F.col("d") > F.col("k"), F.col("nd")).otherwise(0)
            ).alias("n_nodes")
        )
    )
    ek = (
        grid.crossJoin(F.broadcast(em))
        .groupBy("k")
        .agg(
            F.sum(
                F.when(F.col("m") > F.col("k"), F.col("ne")).otherwise(0)
            ).alias("n_edges")
        )
    )
    return (
        nk.join(ek, "k", "left")
        .filter(F.col("n_nodes") >= 2)
        .select(
            "k",
            "n_nodes",
            F.coalesce("n_edges", F.lit(0)).alias("n_edges"),
            F.round(
                2.0
                * F.coalesce("n_edges", F.lit(0))
                / (F.col("n_nodes") * (F.col("n_nodes") - 1)),
                6,
            ).alias("phi"),
        )
    )


@register(
    "q264_simpson_audit",
    """
    WITH per AS (
      SELECT l_returnflag AS grp,
             COUNT(*) AS n,
             ROUND(corr(l_discount, l_quantity), 6) AS group_corr
      FROM lineitem GROUP BY l_returnflag
    ),
    overall AS (
      SELECT ROUND(corr(l_discount, l_quantity), 6) AS c
      FROM lineitem
    )
    SELECT grp, n, group_corr,
           (SELECT c FROM overall) AS overall_corr,
           CASE WHEN group_corr * (SELECT c FROM overall) < 0
                THEN 1 ELSE 0 END AS sign_flips
    FROM per
    """,
)
def q264_simpson_audit(spark, sf_dir):
    """Simpson's-paradox audit: the discount↔quantity correlation
    overall vs within each return-flag stratum, flagging strata whose
    sign disagrees with the pooled sign — the canonical 'your
    aggregate-level conclusion reverses under stratification' data
    check.  Two scans (pooled + grouped partial-agg corr), the pooled
    scalar folded in as a 1-row broadcast; the flip flag compares
    ROUNDed values so both engines agree at the boundary."""
    li = _t(spark, sf_dir, "lineitem")
    per = li.groupBy(F.col("l_returnflag").alias("grp")).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.corr("l_discount", "l_quantity"), 6).alias("group_corr"),
    )
    overall = li.agg(
        F.round(F.corr("l_discount", "l_quantity"), 6).alias(
            "overall_corr"
        )
    )
    return per.crossJoin(F.broadcast(overall)).select(
        "grp",
        "n",
        "group_corr",
        "overall_corr",
        F.when(
            F.col("group_corr") * F.col("overall_corr") < 0, 1
        )
        .otherwise(0)
        .alias("sign_flips"),
    )


@register(
    "q265_transition_entropy",
    """
    WITH seq AS (
      SELECT event_type,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_event
      FROM events
    ),
    c AS (
      SELECT prev_event, event_type AS event, COUNT(*)::DOUBLE AS n
      FROM seq WHERE prev_event IS NOT NULL
      GROUP BY 1, 2
    ),
    tot AS (SELECT prev_event, SUM(n) AS t FROM c GROUP BY 1),
    grand AS (SELECT SUM(t) AS g FROM tot)
    SELECT c.prev_event,
           CAST(tot.t AS BIGINT) AS n_from,
           ROUND(-SUM((c.n / tot.t) * ln(c.n / tot.t) / ln(2)), 6)
             AS h_next_bits,
           ROUND(tot.t / (SELECT g FROM grand), 6) AS weight
    FROM c JOIN tot USING (prev_event)
    GROUP BY c.prev_event, tot.t
    """,
)
def q265_transition_entropy(spark, sf_dir):
    """Markov entropy rate inputs: per-state conditional next-event
    entropy H(next | current) in bits, plus each state's stationary
    weight — Σ weight·h is the sequence entropy rate (how predictable
    user behavior is one step ahead).  All computation happens on the
    |event_type|²-row transition-count table; raw events are touched
    once by the lag window on the user partitioning."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.withColumn("prev_event", F.lag("event_type").over(w))
    c = (
        seq.filter(F.col("prev_event").isNotNull())
        .groupBy("prev_event", F.col("event_type").alias("event"))
        .agg(F.count(F.lit(1)).cast("double").alias("n"))
    )
    tot = c.groupBy("prev_event").agg(F.sum("n").alias("t"))
    grand = tot.agg(F.sum("t").alias("g"))
    p = F.col("n") / F.col("t")
    return (
        c.join(F.broadcast(tot), "prev_event")
        .crossJoin(F.broadcast(grand))
        .groupBy("prev_event", "t", "g")
        .agg(
            F.round(
                -F.sum(p * F.log(p) / F.log(F.lit(2.0))), 6
            ).alias("h_next_bits")
        )
        .select(
            "prev_event",
            F.col("t").cast("bigint").alias("n_from"),
            "h_next_bits",
            F.round(F.col("t") / F.col("g"), 6).alias("weight"),
        )
    )


@register(
    "q266_replay_stream_agg",
    """
    SELECT l_returnflag,
           COUNT(*) AS n,
           ROUND(SUM(l_quantity), 2) AS sum_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q266_replay_stream_agg(spark, sf_dir):
    """End-to-end custom STREAMING source execution: lineitem replayed
    through the `parquet_replay` Python data source (column-projected
    at the arrow read), aggregated in complete mode into a memory
    sink — the converged table equals the batch aggregate, which is the
    oracle.  Python streaming sources don't support availableNow, so
    the drain is processAllAvailable on row-position offsets."""
    import os as _os
    import tempfile
    import uuid

    from graphmapreduce_spark.sources.replay_stream import (
        ParquetReplayStreamSource,
    )

    spark.dataSource.register(ParquetReplayStreamSource)
    src = (
        spark.readStream.format("parquet_replay")
        .option("path", _os.path.join(sf_dir, "lineitem.parquet"))
        .option("columns", "l_returnflag,l_quantity")
        .option("rows_per_batch", "25000")
        .load()
    )
    agg = src.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
    )
    qname = f"replay_agg_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(qname)
        .outputMode("complete")
        .option(
            "checkpointLocation", tempfile.mkdtemp(prefix="gmr_ckpt_rp_")
        )
        .start()
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(60)
    return spark.table(qname)


@register(
    "q267_fk_integrity",
    """
    SELECT 'lineitem->orders' AS fk,
           (SELECT COUNT(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_orderkey = l.l_orderkey))
             AS n_orphans,
           (SELECT COUNT(*) FROM lineitem) AS n_rows
    UNION ALL
    SELECT 'orders->customer',
           (SELECT COUNT(*) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_custkey = o.o_custkey)),
           (SELECT COUNT(*) FROM orders)
    UNION ALL
    SELECT 'lineitem->part',
           (SELECT COUNT(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM part p
                              WHERE p.p_partkey = l.l_partkey)),
           (SELECT COUNT(*) FROM lineitem)
    UNION ALL
    SELECT 'lineitem->supplier',
           (SELECT COUNT(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM supplier s
                              WHERE s.s_suppkey = l.l_suppkey)),
           (SELECT COUNT(*) FROM lineitem)
    """,
)
def q267_fk_integrity(spark, sf_dir):
    """Referential-integrity audit: orphan counts for every declared
    foreign key in the star schema, as left_anti joins.  The dimension
    side of each anti-join broadcasts (orders/customer/part/supplier
    key sets are dimension-sized), so each audit is one scan of the
    fact table — the shape that still works when lineitem is the
    100 TB table."""
    li = _t(spark, sf_dir, "lineitem")
    od = _t(spark, sf_dir, "orders")
    cu = _t(spark, sf_dir, "customer")
    pa = _t(spark, sf_dir, "part")
    su = _t(spark, sf_dir, "supplier")

    def one(fact, fact_key, dim, dim_key, label):
        keys = dim.select(F.col(dim_key).alias("_k")).distinct()
        n_orph = (
            fact.join(
                F.broadcast(keys),
                fact[fact_key] == F.col("_k"),
                "left_anti",
            )
            .agg(F.count(F.lit(1)).alias("n_orphans"))
        )
        n_rows = fact.agg(F.count(F.lit(1)).alias("n_rows"))
        return (
            n_orph.crossJoin(n_rows)
            .select(
                F.lit(label).alias("fk"), "n_orphans", "n_rows"
            )
        )

    out = one(li, "l_orderkey", od, "o_orderkey", "lineitem->orders")
    for args in [
        (od, "o_custkey", cu, "c_custkey", "orders->customer"),
        (li, "l_partkey", pa, "p_partkey", "lineitem->part"),
        (li, "l_suppkey", su, "s_suppkey", "lineitem->supplier"),
    ]:
        out = out.unionByName(one(*args))
    return out


@register(
    "q268_dup_size_histogram",
    """
    WITH keys AS (
      SELECT md5(text) AS fp, COUNT(*) AS copies
      FROM documents GROUP BY md5(text)
    )
    SELECT copies, COUNT(*) AS n_groups,
           CAST(copies * COUNT(*) AS BIGINT) AS n_docs
    FROM keys GROUP BY copies
    """,
)
def q268_dup_size_histogram(spark, sf_dir):
    """Exact-duplicate multiplicity histogram: how many fingerprint
    groups have exactly k copies, and how many documents that accounts
    for — the 'is duplication a few huge clusters or many pairs'
    diagnostic that decides dedup strategy.  Two cascaded hash aggs on
    the md5 key; nothing else."""
    d = _t(spark, sf_dir, "documents")
    keys = d.groupBy(F.md5("text").alias("fp")).agg(
        F.count(F.lit(1)).alias("copies")
    )
    return keys.groupBy("copies").agg(
        F.count(F.lit(1)).alias("n_groups"),
        (F.col("copies") * F.count(F.lit(1)))
        .cast("bigint")
        .alias("n_docs"),
    )


@register(
    "q269_lsh_planner",
    """
    WITH bands AS (
      SELECT UNNEST([4, 8, 16, 32]) AS b
    ),
    rows_ AS (SELECT UNNEST([2, 4, 8]) AS r),
    sims AS (SELECT UNNEST([0.5, 0.7, 0.8, 0.9]) AS s)
    SELECT b, r, s,
           ROUND(1.0 - POWER(1.0 - POWER(s, r), b), 6) AS p_capture,
           ROUND(POWER(1.0 / b, 1.0 / r), 6) AS s_threshold
    FROM bands CROSS JOIN rows_ CROSS JOIN sims
    """,
)
def q269_lsh_planner(spark, sf_dir):
    """MinHash-LSH parameter planner: the S-curve capture probability
    1-(1-s^r)^b and the threshold similarity (1/b)^(1/r) for every
    (bands, rows-per-band, similarity) combination — the design table
    behind q46's banding knobs.  Pure expression math over a literal
    grid; sf-independent by construction (a planning query reads no
    data)."""
    # grid via explode on a single row — a crossJoin of three literal
    # frames multiplies their default partitionings into hundreds of
    # empty tasks
    s, r, b = F.col("s"), F.col("r"), F.col("b")
    grid = (
        spark.range(1)
        .select(
            F.explode(F.array(*[F.lit(x) for x in (4, 8, 16, 32)])).alias(
                "b"
            )
        )
        .select(
            "b",
            F.explode(F.array(*[F.lit(x) for x in (2, 4, 8)])).alias("r"),
        )
        .select(
            "b",
            "r",
            F.explode(
                F.array(*[F.lit(x) for x in (0.5, 0.7, 0.8, 0.9)])
            ).alias("s"),
        )
    )
    return (
        grid
        .select(
            "b",
            "r",
            "s",
            F.round(
                1.0 - F.pow(1.0 - F.pow(s, r), b), 6
            ).alias("p_capture"),
            F.round(F.pow(1.0 / b, 1.0 / r), 6).alias("s_threshold"),
        )
    )


@register(
    "q270_effective_corpus_size",
    r"""
    WITH t AS (
      SELECT source, md5(text) AS fp,
             len(list_filter(string_split_regex(trim(text), '\s+'),
                             x -> x <> ''))::DOUBLE AS toks
      FROM documents
    ),
    g AS (
      SELECT source, fp, toks, COUNT(*) OVER (PARTITION BY fp) AS copies
      FROM t
    )
    SELECT source,
           CAST(SUM(toks) AS BIGINT) AS raw_tokens,
           ROUND(SUM(toks / copies), 2) AS effective_tokens,
           ROUND(SUM(toks / copies) / SUM(toks), 6) AS retention
    FROM g GROUP BY source
    """,
)
def q270_effective_corpus_size(spark, sf_dir):
    """Duplication-weighted effective corpus size: each document's
    tokens count 1/copies (copies = corpus-wide exact-duplicate
    multiplicity of its fingerprint), so a source padded with clones
    contributes its unique mass only — the 'how much data do we REALLY
    have' number that precedes any token budget.  One md5-keyed window
    for multiplicity (fingerprint-partitioned, no global sort), one
    grouped sum."""
    d = _t(spark, sf_dir, "documents")
    t = d.select(
        "source",
        F.md5("text").alias("fp"),
        T.n_words("text").cast("double").alias("toks"),
    )
    w = Window.partitionBy("fp")
    g = t.withColumn("copies", F.count(F.lit(1)).over(w))
    return g.groupBy("source").agg(
        F.sum("toks").cast("bigint").alias("raw_tokens"),
        F.round(F.sum(F.col("toks") / F.col("copies")), 2).alias(
            "effective_tokens"
        ),
        F.round(
            F.sum(F.col("toks") / F.col("copies")) / F.sum("toks"), 6
        ).alias("retention"),
    )


@register(
    "q271_behavior_editdist",
    """
    WITH seq AS (
      SELECT user_id,
             substr(string_agg(substr(event_type, 1, 1), ''
                               ORDER BY ts, event_id), 1, 100) AS sig
      FROM events WHERE user_id < 200
      GROUP BY user_id
    )
    SELECT a.user_id AS id_a, b.user_id AS id_b,
           levenshtein(a.sig, b.sig) AS dist,
           ROUND(levenshtein(a.sig, b.sig)::DOUBLE
                 / GREATEST(length(a.sig), length(b.sig), 1), 6)
             AS norm_dist
    FROM seq a JOIN seq b
      ON b.user_id > a.user_id AND b.user_id <= a.user_id + 10
    """,
)
def q271_behavior_editdist(spark, sf_dir):
    """Behavioral-sequence similarity: each user's event history
    becomes a compact signature string (first letter of each event
    type, time-ordered, capped at 100 chars) and banded user pairs are
    compared by edit distance — the sequence-level analog of q106's
    string fuzzy join.  The signature build is one ordered
    listagg per user (user-partitioned sort, no global window); the
    band keeps pair count linear; levenshtein runs JVM-side."""
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") < 200)
    wseq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = (
        ev.select(
            "user_id",
            F.substring("event_type", 1, 1).alias("ch"),
            F.row_number().over(wseq).alias("rn"),
        )
        .groupBy("user_id")
        .agg(
            F.substring(
                F.concat_ws(
                    "",
                    F.array_sort(
                        F.collect_list(F.struct("rn", "ch"))
                    ).getField("ch"),
                ),
                1,
                100,
            ).alias("sig")
        )
    )
    a, b = seq.alias("a"), seq.alias("b")
    dist = F.levenshtein(F.col("a.sig"), F.col("b.sig"))
    return a.join(
        b,
        (F.col("b.user_id") > F.col("a.user_id"))
        & (F.col("b.user_id") <= F.col("a.user_id") + 10),
    ).select(
        F.col("a.user_id").alias("id_a"),
        F.col("b.user_id").alias("id_b"),
        dist.alias("dist"),
        F.round(
            dist.cast("double")
            / F.greatest(
                F.length(F.col("a.sig")),
                F.length(F.col("b.sig")),
                F.lit(1),
            ),
            6,
        ).alias("norm_dist"),
    )


@register(
    "q272_hhi_concentration",
    """
    WITH rev AS (
      SELECT c.c_mktsegment AS segment, o.o_custkey,
             SUM(o.o_totalprice) AS cust_rev
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2
    ),
    tot AS (SELECT segment, SUM(cust_rev) AS seg_rev FROM rev GROUP BY 1)
    SELECT rev.segment,
           COUNT(*) AS n_customers,
           ROUND(SUM(POWER(cust_rev / seg_rev, 2)), 6) AS hhi,
           ROUND(1.0 / COUNT(*), 6) AS hhi_floor
    FROM rev JOIN tot ON rev.segment = tot.segment
    GROUP BY rev.segment
    """,
)
def q272_hhi_concentration(spark, sf_dir):
    """Herfindahl-Hirschman revenue concentration per market segment:
    Σ (customer share)² against its 1/n perfect-competition floor — the
    antitrust-style complement of q230's Gini (HHI needs no sorting at
    all, just two grouped sums and a broadcast of per-segment
    totals)."""
    od = _t(spark, sf_dir, "orders")
    cu = _t(spark, sf_dir, "customer")
    rev = (
        od.join(F.broadcast(cu.select("c_custkey", "c_mktsegment")),
                od.o_custkey == F.col("c_custkey"))
        .groupBy(F.col("c_mktsegment").alias("segment"), "o_custkey")
        .agg(F.sum("o_totalprice").alias("cust_rev"))
    )
    tot = rev.groupBy("segment").agg(F.sum("cust_rev").alias("seg_rev"))
    return (
        rev.join(F.broadcast(tot), "segment")
        .groupBy("segment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(
                F.sum(F.pow(F.col("cust_rev") / F.col("seg_rev"), 2)), 6
            ).alias("hhi"),
            F.round(1.0 / F.count(F.lit(1)), 6).alias("hhi_floor"),
        )
    )


@register(
    "q273_open_triads",
    """
    WITH und AS (
      SELECT DISTINCT LEAST(l_orderkey % 2000, l_partkey % 2000) AS a,
                      GREATEST(l_orderkey % 2000, l_partkey % 2000) AS b
      FROM lineitem
      WHERE l_orderkey % 2000 <> l_partkey % 2000 AND l_quantity <= 5
    ),
    sym AS (SELECT a AS id, b AS nbr FROM und
            UNION ALL SELECT b, a FROM und),
    wedges AS (
      SELECT l.id AS u, l.nbr AS center, r.nbr AS w
      FROM sym l JOIN sym r ON l.nbr = r.id AND l.id < r.nbr
    ),
    closed AS (
      SELECT COUNT(*)::BIGINT AS n FROM wedges
      WHERE EXISTS (SELECT 1 FROM und
                    WHERE und.a = wedges.u AND und.b = wedges.w)
    ),
    total AS (SELECT COUNT(*)::BIGINT AS n FROM wedges)
    SELECT total.n AS wedges,
           closed.n AS closed_wedges,
           total.n - closed.n AS open_triads,
           ROUND(closed.n::DOUBLE / total.n, 6) AS global_clustering
    FROM total CROSS JOIN closed
    """,
)
def q273_open_triads(spark, sf_dir):
    """Triad census scalars: total wedges (2-paths), closed wedges, the
    open-triad count, and the global clustering coefficient
    closed/total — the 'how cliquish is this graph' one-rower.  Wedges
    enumerate through the shared center (the q31 join shape, u < w
    canonical so each wedge counts once); closure is one semi/anti
    split against the canonical edge set, no second wedge pass."""
    li = _t(spark, sf_dir, "lineitem")
    und = (
        li.filter(F.col("l_quantity") <= 5)
        .select(
            F.least(
                F.col("l_orderkey") % 2000, F.col("l_partkey") % 2000
            ).alias("a"),
            F.greatest(
                F.col("l_orderkey") % 2000, F.col("l_partkey") % 2000
            ).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    sym = und.select(F.col("a").alias("id"), F.col("b").alias("nbr")).unionByName(
        und.select(F.col("b").alias("id"), F.col("a").alias("nbr"))
    )
    l, r = sym.alias("l"), sym.alias("r")
    wedges = l.join(
        r,
        (F.col("l.nbr") == F.col("r.id"))
        & (F.col("l.id") < F.col("r.nbr")),
    ).select(F.col("l.id").alias("a"), F.col("r.nbr").alias("b"))
    wedges = wedges.localCheckpoint(eager=False)
    total = wedges.agg(F.count(F.lit(1)).alias("wedges"))
    closed = wedges.join(und, ["a", "b"], "left_semi").agg(
        F.count(F.lit(1)).alias("closed_wedges")
    )
    return total.crossJoin(closed).select(
        "wedges",
        "closed_wedges",
        (F.col("wedges") - F.col("closed_wedges")).alias("open_triads"),
        F.round(
            F.col("closed_wedges").cast("double") / F.col("wedges"), 6
        ).alias("global_clustering"),
    )


@register(
    "q274_expected_lsh_recall",
    """
    WITH sh AS (
      SELECT doc_id, list_distinct(list_transform(
               range(1, GREATEST(length(text) - 2, 0) + 1),
               i -> substr(text, i, 3))) AS grams
      FROM documents WHERE doc_id < 100
    ),
    inv AS (SELECT doc_id, UNNEST(grams) AS g FROM sh),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
      FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT ROUND(CAST(i AS DOUBLE) /
                   (len(sa.grams) + len(sb.grams) - i), 6) AS s
      FROM inter
      JOIN sh sa ON sa.doc_id = id_a
      JOIN sh sb ON sb.doc_id = id_b
      WHERE CAST(i AS DOUBLE) / (len(sa.grams) + len(sb.grams) - i)
            >= 0.2
    )
    SELECT CAST(FLOOR(s * 10) AS BIGINT) AS s_decile,
           COUNT(*) AS n_pairs,
           ROUND(AVG(1.0 - POWER(1.0 - POWER(s, 4), 8)), 6)
             AS expected_recall
    FROM pairs GROUP BY 1
    """,
)
def q274_expected_lsh_recall(spark, sf_dir):
    """Expected MinHash-LSH recall on THIS corpus: the exact n-gram
    Jaccard pair distribution (the q45 inverted-index join) pushed
    through the banding S-curve 1-(1-s^r)^b at q46's (b=8, r=4)
    configuration, bucketed by similarity decile — 'which of my real
    near-dup pairs would the sketch pipeline catch', the planner
    (q269) evaluated against measured data instead of a grid."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    pairs = D.ngram_jaccard_pairs(
        d, "doc_id", "text", n=3, threshold=0.2, max_df=1000
    ).select(F.col("jaccard").alias("s"))
    return (
        pairs.groupBy(
            F.floor(F.col("s") * 10).cast("bigint").alias("s_decile")
        )
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(
                F.avg(1.0 - F.pow(1.0 - F.pow(F.col("s"), 4), 8)), 6
            ).alias("expected_recall"),
        )
    )


@register(
    "q275_robust_trend",
    """
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             epoch(date_trunc('day', ts)) / 86400.0 AS x,
             COUNT(*)::DOUBLE AS y
      FROM events GROUP BY 1, 2, 3
    ),
    pairs AS (
      SELECT a.event_type,
             (b.y - a.y) / (b.x - a.x) AS slope,
             CASE WHEN b.y > a.y THEN 1
                  WHEN b.y < a.y THEN -1 ELSE 0 END AS sgn
      FROM daily a JOIN daily b
        ON a.event_type = b.event_type AND b.x > a.x
    ),
    ranked AS (
      SELECT event_type, slope,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY slope, sgn) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n,
             SUM(sgn) OVER (PARTITION BY event_type) AS s
      FROM pairs
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n_pairs,
           ROUND(MAX(CASE WHEN rn = (n + 1) // 2 THEN slope END), 6)
             AS theil_sen_slope,
           CAST(MAX(s) AS BIGINT) AS mann_kendall_s
    FROM ranked GROUP BY event_type, n
    """,
)
def q275_robust_trend(spark, sf_dir):
    """Robust trend per event-type daily series: the Theil-Sen
    estimator (lower-median of all pairwise slopes — outlier-immune
    where OLS is not) and the Mann-Kendall S statistic (sum of
    pairwise direction signs) from the SAME pairwise join.  The
    pairwise grid is days², built per series over the 30-row
    day-aggregated table — never over raw events; the median pick is
    the q247 discrete-percentile rank trick, no sort beyond the
    per-series window."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.to_date(F.date_trunc("DAY", "ts")).alias("day"),
        (
            F.unix_timestamp(F.date_trunc("DAY", "ts")) / 86400.0
        ).alias("x"),
    ).agg(F.count(F.lit(1)).cast("double").alias("y"))
    a, b = daily.alias("a"), daily.alias("b")
    pairs = a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type"))
        & (F.col("b.x") > F.col("a.x")),
    ).select(
        F.col("a.event_type").alias("event_type"),
        ((F.col("b.y") - F.col("a.y")) / (F.col("b.x") - F.col("a.x")))
        .alias("slope"),
        F.when(F.col("b.y") > F.col("a.y"), 1)
        .when(F.col("b.y") < F.col("a.y"), -1)
        .otherwise(0)
        .alias("sgn"),
    )
    w = Window.partitionBy("event_type")
    wo = w.orderBy("slope", "sgn")
    ranked = pairs.select(
        "event_type",
        "slope",
        F.row_number().over(wo).alias("rn"),
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum("sgn").over(w).alias("s"),
    )
    return ranked.groupBy("event_type", "n").agg(
        F.col("n").cast("bigint").alias("n_pairs"),
        F.round(
            F.max(
                F.when(
                    F.col("rn") == F.floor((F.col("n") + 1) / 2),
                    F.col("slope"),
                )
            ),
            6,
        ).alias("theil_sen_slope"),
        F.max("s").cast("bigint").alias("mann_kendall_s"),
    ).select("event_type", "n_pairs", "theil_sen_slope", "mann_kendall_s")


@register(
    "q276_keyword_extraction",
    r"""
    WITH tf AS (
      SELECT doc_id, term, COUNT(*)::DOUBLE AS tf FROM (
        SELECT doc_id, UNNEST(list_filter(
          string_split_regex(trim(text), '\s+'), x -> x <> '')) AS term
        FROM documents)
      GROUP BY 1, 2
    ),
    n AS (SELECT COUNT(DISTINCT doc_id)::DOUBLE AS n_docs FROM tf),
    idf AS (
      SELECT term, ln((SELECT n_docs FROM n) / COUNT(*)) AS idf
      FROM tf GROUP BY term
    ),
    scored AS (
      SELECT tf.doc_id, tf.term,
             ROUND(tf.tf * idf.idf, 6) AS score
      FROM tf JOIN idf USING (term)
    )
    SELECT doc_id, term, score FROM (
      SELECT doc_id, term, score,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY score DESC, term ASC) AS rk
      FROM scored WHERE doc_id < 50) t
    WHERE rk <= 5
    """,
)
def q276_keyword_extraction(spark, sf_dir):
    """Per-document keyword extraction: top-5 terms by TF-IDF — the
    tagging/labeling primitive.  Document frequencies come from the
    FULL corpus (idf must not depend on which docs you keyword);
    only the reported doc slice pays the ranking window, partitioned
    by doc so no global sort exists.  Ranking on the ROUNDed score
    with a term tiebreak keeps top-5 membership engine-identical."""
    d = _t(spark, sf_dir, "documents")
    tf = (
        d.select("doc_id", F.explode(T.words("text")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )
    n_docs = tf.agg(
        F.count_distinct("doc_id").cast("double").alias("n_docs")
    )
    idf = (
        tf.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .join(F.broadcast(n_docs))
        .select(
            "term", F.log(F.col("n_docs") / F.col("df")).alias("idf")
        )
    )
    scored = (
        tf.filter(F.col("doc_id") < 50)
        .join(idf, "term")
        .select(
            "doc_id",
            "term",
            F.round(F.col("tf") * F.col("idf"), 6).alias("score"),
        )
    )
    rk = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(rk))
        .filter(F.col("rk") <= 5)
        .select("doc_id", "term", "score")
    )


@register(
    "q277_dynamic_session_window",
    """
    WITH ordered AS (
      SELECT user_id, ts, event_type, value,
             ts + CASE WHEN event_type = 'purchase'
                       THEN INTERVAL 48 HOUR
                       ELSE INTERVAL 24 HOUR END AS window_end,
             event_id
      FROM events
    ),
    marked AS (
      SELECT user_id, ts, value,
             CASE WHEN MAX(window_end) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    IS NULL
                  OR ts >= MAX(window_end) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  THEN 1 ELSE 0 END AS new_session
      FROM ordered
    ),
    sess AS (
      SELECT user_id, ts, value,
             SUM(new_session) OVER (
               PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM marked
    )
    SELECT user_id, MIN(ts) AS session_start,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 4) AS session_value
    FROM sess GROUP BY user_id, sid
    """,
)
def q277_dynamic_session_window(spark, sf_dir):
    """Dynamic-gap session windows: the session timeout DEPENDS ON THE
    EVENT (purchases hold the session open 48 h, everything else 24 h)
    — Spark's `session_window` with a per-row gap column, the feature
    fixed-gap sessionizers can't express.  The oracle replicates the
    merge semantics with a running MAX of per-event window ends (an
    early long-gap event can bridge past a later short-gap one, so
    lag-against-previous-row alone is wrong)."""
    ev = _t(spark, sf_dir, "events")
    gap = F.when(
        F.col("event_type") == "purchase", F.lit("48 hours")
    ).otherwise(F.lit("24 hours"))
    return (
        ev.groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("session_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n_events",
            "session_value",
        )
    )


@register(
    "q278_welch_ttest",
    """
    WITH s AS (
      SELECT source,
             COUNT(*)::DOUBLE AS n,
             AVG(n_chars) AS m,
             VAR_SAMP(n_chars) AS v
      FROM documents WHERE source IN ('src0', 'src1')
      GROUP BY source
    ),
    w AS (
      SELECT a.n AS na, a.m AS ma, a.v AS va,
             b.n AS nb, b.m AS mb, b.v AS vb
      FROM s a JOIN s b ON a.source = 'src0' AND b.source = 'src1'
    )
    SELECT ROUND(ma - mb, 6) AS mean_diff,
           ROUND((ma - mb) / sqrt(va / na + vb / nb), 6) AS t_stat,
           ROUND(POWER(va / na + vb / nb, 2)
                 / (POWER(va / na, 2) / (na - 1)
                  + POWER(vb / nb, 2) / (nb - 1)), 6) AS welch_df
    FROM w
    """,
)
def q278_welch_ttest(spark, sf_dir):
    """Welch's unequal-variance t-test between two sources' document
    lengths: t statistic and Welch-Satterthwaite degrees of freedom
    from one grouped (n, mean, variance) pass — the 'are these two
    corpora actually different' check that precedes any mixing
    decision.  Two partial-agg scans worth of work, a 1×1 join, zero
    shuffles of row data."""
    d = _t(spark, sf_dir, "documents").filter(
        F.col("source").isin("src0", "src1")
    )
    s = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.avg("n_chars").alias("m"),
        F.var_samp("n_chars").alias("v"),
    )
    a = s.filter(F.col("source") == "src0").select(
        F.col("n").alias("na"), F.col("m").alias("ma"),
        F.col("v").alias("va"),
    )
    b = s.filter(F.col("source") == "src1").select(
        F.col("n").alias("nb"), F.col("m").alias("mb"),
        F.col("v").alias("vb"),
    )
    se2 = F.col("va") / F.col("na") + F.col("vb") / F.col("nb")
    return a.crossJoin(b).select(
        F.round(F.col("ma") - F.col("mb"), 6).alias("mean_diff"),
        F.round((F.col("ma") - F.col("mb")) / F.sqrt(se2), 6).alias(
            "t_stat"
        ),
        F.round(
            F.pow(se2, 2)
            / (
                F.pow(F.col("va") / F.col("na"), 2) / (F.col("na") - 1)
                + F.pow(F.col("vb") / F.col("nb"), 2) / (F.col("nb") - 1)
            ),
            6,
        ).alias("welch_df"),
    )


@register(
    "q279_anova_oneway",
    """
    WITH g AS (
      SELECT lang, COUNT(*)::DOUBLE AS n, AVG(n_chars) AS m,
             SUM(n_chars * n_chars) AS ss
      FROM documents GROUP BY lang
    ),
    tot AS (
      SELECT SUM(n) AS nt, SUM(n * m) / SUM(n) AS gm,
             COUNT(*)::DOUBLE AS k
      FROM g
    )
    SELECT CAST(tot.k AS BIGINT) AS k_groups,
           CAST(tot.nt AS BIGINT) AS n_total,
           ROUND(SUM(g.n * POWER(g.m - tot.gm, 2)) / (tot.k - 1), 6)
             AS ms_between,
           ROUND(SUM(g.ss - g.n * g.m * g.m) / (tot.nt - tot.k), 6)
             AS ms_within,
           ROUND((SUM(g.n * POWER(g.m - tot.gm, 2)) / (tot.k - 1))
                 / (SUM(g.ss - g.n * g.m * g.m) / (tot.nt - tot.k)), 6)
             AS f_stat
    FROM g CROSS JOIN tot
    GROUP BY tot.k, tot.nt
    """,
)
def q279_anova_oneway(spark, sf_dir):
    """One-way ANOVA of document length across languages: between- and
    within-group mean squares and the F statistic, from per-group
    (n, mean, sum-of-squares) partials only — the sufficient-statistics
    decomposition, so the grand mean and both mean squares come from
    the k-row group table and raw rows are scanned once."""
    d = _t(spark, sf_dir, "documents")
    g = d.groupBy("lang").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.avg("n_chars").alias("m"),
        F.sum(F.col("n_chars") * F.col("n_chars")).alias("ss"),
    )
    tot = g.agg(
        F.sum("n").alias("nt"),
        (F.sum(F.col("n") * F.col("m")) / F.sum("n")).alias("gm"),
        F.count(F.lit(1)).cast("double").alias("k"),
    )
    msb = F.sum(
        F.col("n") * F.pow(F.col("m") - F.col("gm"), 2)
    ) / (F.col("k") - 1)
    msw = F.sum(
        F.col("ss") - F.col("n") * F.col("m") * F.col("m")
    ) / (F.col("nt") - F.col("k"))
    return (
        g.crossJoin(F.broadcast(tot))
        .groupBy("k", "nt")
        .agg(
            F.round(msb, 6).alias("ms_between"),
            F.round(msw, 6).alias("ms_within"),
            F.round(msb / msw, 6).alias("f_stat"),
        )
        .select(
            F.col("k").cast("bigint").alias("k_groups"),
            F.col("nt").cast("bigint").alias("n_total"),
            "ms_between",
            "ms_within",
            "f_stat",
        )
    )


@register(
    "q280_hyperplane_lsh",
    """
    WITH planes AS (
      SELECT p, i,
             CASE WHEN (ascii(substr(md5(p::VARCHAR || '_'
                                         || i::VARCHAR), 1, 1)) % 2) = 0
                  THEN 1.0 ELSE -1.0 END AS w
      FROM (SELECT UNNEST(range(0, 4)) AS p),
           (SELECT UNNEST(range(1, 65)) AS i)
    ),
    ev AS (
      SELECT vec_id, i, v FROM (
        SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
        LATERAL (SELECT UNNEST(range(1, 65)) AS i, UNNEST(emb) AS v)
    ),
    dots AS (
      SELECT ev.vec_id, planes.p,
             ROUND(SUM(ev.v * planes.w), 6) AS dot
      FROM ev JOIN planes ON ev.i = planes.i
      GROUP BY 1, 2
    ),
    sig AS (
      SELECT vec_id,
             string_agg(CASE WHEN dot >= 0 THEN '1' ELSE '0' END, ''
                        ORDER BY p) AS bucket
      FROM dots GROUP BY vec_id
    ),
    emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             ROUND(list_sum(list_transform(range(1, 65),
                              i -> ea.v[i] * eb.v[i]))
               / (sqrt(list_sum(list_transform(ea.v, x -> x * x)))
                * sqrt(list_sum(list_transform(eb.v, x -> x * x)))), 4)
               AS cosine
      FROM sig a JOIN sig b ON a.bucket = b.bucket
                           AND a.vec_id < b.vec_id
      JOIN emb ea ON ea.vec_id = a.vec_id
      JOIN emb eb ON eb.vec_id = b.vec_id
    )
    SELECT id_a, id_b, cosine FROM pairs WHERE cosine >= 0.3
    """,
)
def q280_hyperplane_lsh(spark, sf_dir):
    """Cosine LSH via signed random projections (the SimHash idea
    applied to dense embeddings): 4 deterministic ±1 hyperplanes
    (md5-parity over (plane, dim) — engine-portable, data-independent)
    hash each vector to a 4-bit bucket; exact cosine runs only WITHIN
    buckets — candidate generation is a hash join on the signature,
    never all-pairs, and expected collision probability follows
    (1 - θ/π)^4.  Per-plane dots are ROUNDed before the sign so a
    borderline projection can't land in different buckets on different
    engines.  The in-bucket verify is the q48 exact-cosine shape."""
    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id", V.as_double("embedding").alias("v")
    )
    # plane weights: md5 parity over (p, i) — 8×64 tiny grid
    planes = (
        spark.range(1)
        .select(
            F.explode(F.sequence(F.lit(0), F.lit(3))).alias("p")
        )
        .select(
            "p",
            F.explode(F.sequence(F.lit(1), F.lit(64))).alias("i"),
        )
        .select(
            "p",
            "i",
            F.when(
                F.ascii(
                    F.substring(
                        F.md5(
                            F.concat_ws(
                                "_",
                                F.col("p").cast("string"),
                                F.col("i").cast("string"),
                            )
                        ),
                        1,
                        1,
                    )
                )
                % 2
                == 0,
                1.0,
            )
            .otherwise(-1.0)
            .alias("w"),
        )
    )
    ev = e.select(
        "vec_id", F.posexplode("v").alias("i0", "val")
    ).select("vec_id", (F.col("i0") + 1).alias("i"), "val")
    sig = (
        ev.join(F.broadcast(planes), "i")
        .groupBy("vec_id", "p")
        .agg(F.round(F.sum(F.col("val") * F.col("w")), 6).alias("dot"))
        .groupBy("vec_id")
        .agg(
            F.concat_ws(
                "",
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            "p",
                            F.when(F.col("dot") >= 0, "1")
                            .otherwise("0")
                            .alias("b"),
                        )
                    )
                ).getField("b"),
            ).alias("bucket")
        )
    )
    a = sig.select(
        F.col("vec_id").alias("id_a"), F.col("bucket")
    )
    b = sig.select(
        F.col("vec_id").alias("id_b"), F.col("bucket")
    )
    ea = e.select(F.col("vec_id").alias("id_a"), F.col("v").alias("va"))
    eb = e.select(F.col("vec_id").alias("id_b"), F.col("v").alias("vb"))
    return (
        a.join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .join(ea, "id_a")
        .join(eb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(V.cosine("va", "vb"), 4).alias("cosine"),
        )
        .filter(F.col("cosine") >= 0.3)
    )


@register(
    "q281_haversine_join",
    """
    WITH pts AS (
      SELECT user_id,
             (('0x' || substr(md5('lat_' || user_id::VARCHAR), 1, 12))
                ::BIGINT / 281474976710656.0) * 120.0 - 60.0 AS lat,
             (('0x' || substr(md5('lon_' || user_id::VARCHAR), 1, 12))
                ::BIGINT / 281474976710656.0) * 360.0 - 180.0 AS lon
      FROM (SELECT DISTINCT user_id FROM events)
    ),
    cells AS (
      SELECT user_id, lat, lon,
             CAST(FLOOR(lat / 9.0) AS BIGINT) AS cla,
             CAST(FLOOR(lon / 18.0) AS BIGINT) AS clo
      FROM pts
    ),
    lhs AS (
      SELECT c.user_id, c.lat, c.lon,
             c.cla + da.d AS cla, c.clo + dl.d AS clo
      FROM cells c,
           (SELECT UNNEST([-1, 0, 1]) AS d) da,
           (SELECT UNNEST([-1, 0, 1]) AS d) dl
    ),
    pairs AS (
      SELECT a.user_id AS id_a, b.user_id AS id_b,
             ROUND(2 * 6371.0 * asin(sqrt(
               pow(sin(radians(b.lat - a.lat) / 2), 2)
               + cos(radians(a.lat)) * cos(radians(b.lat))
                 * pow(sin(radians(b.lon - a.lon) / 2), 2))), 3)
               AS dist_km
      FROM lhs a JOIN cells b
        ON a.cla = b.cla AND a.clo = b.clo AND a.user_id < b.user_id
    )
    SELECT id_a, id_b, dist_km FROM pairs WHERE dist_km <= 1000.0
    """,
)
def q281_haversine_join(spark, sf_dir):
    """Spatial radius self-join: deterministic per-user coordinates
    (md5-derived, lat ∈ [-60, 60]), grid-cell blocking sized to the
    search radius (lat cells 9° ≈ 1000 km; lon cells 18° to stay
    radius-covering at 60° latitude), one side exploded to its 3×3
    neighborhood so candidates come from an EQUI join on the cell key —
    the standard geo-join plan that never goes all-pairs — then the
    exact haversine refine on the ROUNDed distance."""
    ev = _t(spark, sf_dir, "events")
    frac = lambda tag: (  # noqa: E731
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(tag), F.col("user_id").cast("string"))),
                1,
                12,
            ),
            16,
            10,
        ).cast("double")
        / 281474976710656.0
    )
    pts = (
        ev.select("user_id")
        .distinct()
        .select(
            "user_id",
            (frac("lat_") * 120.0 - 60.0).alias("lat"),
            (frac("lon_") * 360.0 - 180.0).alias("lon"),
        )
    )
    cells = pts.select(
        "user_id",
        "lat",
        "lon",
        F.floor(F.col("lat") / 9.0).cast("bigint").alias("cla"),
        F.floor(F.col("lon") / 18.0).cast("bigint").alias("clo"),
    )
    d3 = F.array(F.lit(-1), F.lit(0), F.lit(1))
    lhs = (
        cells.withColumn("da", F.explode(d3))
        .withColumn("dl", F.explode(d3))
        .select(
            "user_id",
            "lat",
            "lon",
            (F.col("cla") + F.col("da")).alias("cla"),
            (F.col("clo") + F.col("dl")).alias("clo"),
        )
    )
    a, b = lhs.alias("a"), cells.alias("b")
    dlat = F.radians(F.col("b.lat") - F.col("a.lat")) / 2
    dlon = F.radians(F.col("b.lon") - F.col("a.lon")) / 2
    dist = F.round(
        2
        * 6371.0
        * F.asin(
            F.sqrt(
                F.pow(F.sin(dlat), 2)
                + F.cos(F.radians(F.col("a.lat")))
                * F.cos(F.radians(F.col("b.lat")))
                * F.pow(F.sin(dlon), 2)
            )
        ),
        3,
    )
    return (
        a.join(
            b,
            (F.col("a.cla") == F.col("b.cla"))
            & (F.col("a.clo") == F.col("b.clo"))
            & (F.col("a.user_id") < F.col("b.user_id")),
        )
        .select(
            F.col("a.user_id").alias("id_a"),
            F.col("b.user_id").alias("id_b"),
            dist.alias("dist_km"),
        )
        .filter(F.col("dist_km") <= 1000.0)
    )


@register(
    "q282_nearest_neighbor",
    """
    WITH pts AS (
      SELECT user_id,
             (('0x' || substr(md5('lat_' || user_id::VARCHAR), 1, 12))
                ::BIGINT / 281474976710656.0) * 120.0 - 60.0 AS lat,
             (('0x' || substr(md5('lon_' || user_id::VARCHAR), 1, 12))
                ::BIGINT / 281474976710656.0) * 360.0 - 180.0 AS lon
      FROM (SELECT DISTINCT user_id FROM events)
    ),
    cells AS (
      SELECT user_id, lat, lon,
             CAST(FLOOR(lat / 9.0) AS BIGINT) AS cla,
             CAST(FLOOR(lon / 18.0) AS BIGINT) AS clo
      FROM pts
    ),
    lhs AS (
      SELECT c.user_id, c.lat, c.lon,
             c.cla + da.d AS cla, c.clo + dl.d AS clo
      FROM cells c,
           (SELECT UNNEST([-1, 0, 1]) AS d) da,
           (SELECT UNNEST([-1, 0, 1]) AS d) dl
    ),
    cand AS (
      SELECT a.user_id, b.user_id AS nn_id,
             ROUND(2 * 6371.0 * asin(sqrt(
               pow(sin(radians(b.lat - a.lat) / 2), 2)
               + cos(radians(a.lat)) * cos(radians(b.lat))
                 * pow(sin(radians(b.lon - a.lon) / 2), 2))), 3)
               AS dist_km
      FROM lhs a JOIN cells b
        ON a.cla = b.cla AND a.clo = b.clo
       AND a.user_id <> b.user_id
    )
    SELECT user_id, nn_id, dist_km FROM (
      SELECT user_id, nn_id, dist_km,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY dist_km, nn_id) AS rk
      FROM cand WHERE dist_km <= 1000.0) t
    WHERE rk = 1
    """,
)
def q282_nearest_neighbor(spark, sf_dir):
    """Nearest-neighbor-per-point over the same md5-coordinate fixture
    as q281: blocked candidates (3×3 radius-sized cells), exact
    haversine refine, then one rank window per point on the ROUNDed
    distance with an id tiebreak.  Points whose nearest neighbor lies
    beyond the radius drop out — the documented blocking contract, not
    a bug (a second coarser pass is the standard escalation)."""
    ev = _t(spark, sf_dir, "events")
    frac = lambda tag: (  # noqa: E731
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(tag), F.col("user_id").cast("string"))),
                1,
                12,
            ),
            16,
            10,
        ).cast("double")
        / 281474976710656.0
    )
    pts = (
        ev.select("user_id")
        .distinct()
        .select(
            "user_id",
            (frac("lat_") * 120.0 - 60.0).alias("lat"),
            (frac("lon_") * 360.0 - 180.0).alias("lon"),
        )
    )
    cells = pts.select(
        "user_id",
        "lat",
        "lon",
        F.floor(F.col("lat") / 9.0).cast("bigint").alias("cla"),
        F.floor(F.col("lon") / 18.0).cast("bigint").alias("clo"),
    )
    d3 = F.array(F.lit(-1), F.lit(0), F.lit(1))
    lhs = (
        cells.withColumn("da", F.explode(d3))
        .withColumn("dl", F.explode(d3))
        .select(
            "user_id",
            "lat",
            "lon",
            (F.col("cla") + F.col("da")).alias("cla"),
            (F.col("clo") + F.col("dl")).alias("clo"),
        )
    )
    a, b = lhs.alias("a"), cells.alias("b")
    dlat = F.radians(F.col("b.lat") - F.col("a.lat")) / 2
    dlon = F.radians(F.col("b.lon") - F.col("a.lon")) / 2
    dist = F.round(
        2
        * 6371.0
        * F.asin(
            F.sqrt(
                F.pow(F.sin(dlat), 2)
                + F.cos(F.radians(F.col("a.lat")))
                * F.cos(F.radians(F.col("b.lat")))
                * F.pow(F.sin(dlon), 2)
            )
        ),
        3,
    )
    cand = (
        a.join(
            b,
            (F.col("a.cla") == F.col("b.cla"))
            & (F.col("a.clo") == F.col("b.clo"))
            & (F.col("a.user_id") != F.col("b.user_id")),
        )
        .select(
            F.col("a.user_id").alias("user_id"),
            F.col("b.user_id").alias("nn_id"),
            dist.alias("dist_km"),
        )
        .filter(F.col("dist_km") <= 1000.0)
    )
    rk = Window.partitionBy("user_id").orderBy("dist_km", "nn_id")
    return (
        cand.withColumn("rk", F.row_number().over(rk))
        .filter(F.col("rk") == 1)
        .select("user_id", "nn_id", "dist_km")
    )


@register(
    "q283_stream_semi_join",
    """
    WITH clicks AS (
      SELECT user_id, ts AS click_ts FROM events
      WHERE event_type = 'click'
    )
    SELECT user_id, COUNT(*) AS n_converting_clicks
    FROM clicks c
    WHERE EXISTS (
      SELECT 1 FROM events p
      WHERE p.event_type = 'purchase' AND p.user_id = c.user_id
        AND p.ts > c.click_ts
        AND p.ts <= c.click_ts + INTERVAL 10 MINUTE)
    GROUP BY user_id
    """,
)
def q283_stream_semi_join(spark, sf_dir):
    """Stream-stream LEFT SEMI interval join: clicks that converted to
    a purchase within 10 minutes — matched left rows emit once their
    match arrives; unmatched rows are GC'd silently at the watermark
    (never emitted), which is exactly EXISTS semantics.  Same
    flush-sentinel harness as q129 so state eviction really runs."""
    import datetime as _dt
    import os as _os
    import shutil
    import tempfile

    src = _os.path.join(sf_dir, "events.parquet")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    static = spark.read.parquet(src)
    d = tempfile.mkdtemp(prefix="gmr_semi_src_")
    shutil.copy(src, _os.path.join(d, "00_events.parquet"))
    max_ts = static.agg(F.max("ts")).first()[0]
    if dict(static.dtypes).get("ts") == "bigint":
        f1 = int(max_ts) + 2 * 3600 * 1_000_000_000
    else:
        f1 = max_ts + _dt.timedelta(hours=2)
    flush = spark.createDataFrame(
        [
            (-1, f1, -1, "click", 0.0, None),
            (-2, f1, -1, "purchase", 0.0, None),
        ],
        static.schema,
    )
    flush.coalesce(1).write.mode("append").parquet(d)
    stream = _normalize_ts(
        spark.readStream.schema(static.schema).parquet(d), "ts"
    )
    clicks = (
        stream.filter(F.col("event_type") == "click")
        .select("user_id", F.col("ts").alias("click_ts"))
        .withWatermark("click_ts", "30 minutes")
    )
    buys = (
        stream.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("b_user_id"),
            F.col("ts").alias("buy_ts"),
        )
        .withWatermark("buy_ts", "30 minutes")
    )
    joined = clicks.join(
        buys,
        (F.col("user_id") == F.col("b_user_id"))
        & (F.col("buy_ts") > F.col("click_ts"))
        & (
            F.col("buy_ts")
            <= F.col("click_ts") + F.expr("INTERVAL 10 MINUTES")
        ),
        "left_semi",
    ).select("user_id", "click_ts")
    out = _run_stream_to_table(spark, joined, "semijoin", output_mode="append")
    return (
        out.filter(F.col("user_id") >= 0)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_converting_clicks"))
    )


@register(
    "q284_rolling_percentile",
    """
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             COUNT(*)::DOUBLE AS x
      FROM events GROUP BY 1, 2
    )
    SELECT event_type, day,
           ROUND(quantile_cont(x, 0.9) OVER (
             PARTITION BY event_type ORDER BY day
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6) AS p90_7d,
           ROUND(median(x) OVER (
             PARTITION BY event_type ORDER BY day
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6) AS med_7d
    FROM daily
    """,
)
def q284_rolling_percentile(spark, sf_dir):
    """Rolling windowed percentiles: trailing-7-day p90 and median of
    daily event volume per type — the moving-SLO-band primitive.
    `percentile` runs as a true WINDOW aggregate over the bounded
    7-row frame (no self-join re-aggregation), and the window only
    ever sees the day-aggregated table."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date(F.date_trunc("DAY", "ts")).alias("day")
    ).agg(F.count(F.lit(1)).cast("double").alias("x"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-6, Window.currentRow)
    )
    return daily.select(
        "event_type",
        "day",
        F.round(F.expr("percentile(x, 0.9)").over(w), 6).alias("p90_7d"),
        F.round(F.expr("percentile(x, 0.5)").over(w), 6).alias("med_7d"),
    )


@register(
    "q285_lead_time",
    """
    WITH lt AS (
      SELECT o.o_orderpriority AS priority,
             date_diff('day', CAST(o.o_orderdate AS DATE),
                       CAST(l.l_shipdate AS DATE)) AS days
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE l.l_shipdate >= o.o_orderdate
    )
    SELECT priority,
           COUNT(*) AS n,
           ROUND(AVG(days), 6) AS avg_days,
           ROUND(quantile_cont(days, 0.5), 6) AS p50_days,
           ROUND(quantile_cont(days, 0.9), 6) AS p90_days,
           MAX(days) AS max_days
    FROM lt GROUP BY priority
    """,
)
def q285_lead_time(spark, sf_dir):
    """Order-to-ship lead time by priority: the fact-to-fact date
    arithmetic classic.  orders joins as the dimension side per
    orderkey (broadcast below the threshold, shuffle-hash above — AQE
    decides), negative lead times are filtered as data errors, and the
    continuous percentiles run per priority group."""
    li = _t(spark, sf_dir, "lineitem")
    od = _t(spark, sf_dir, "orders")
    lt = (
        li.join(
            od.select("o_orderkey", "o_orderpriority", "o_orderdate"),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .filter(F.col("l_shipdate") >= F.col("o_orderdate"))
        .select(
            F.col("o_orderpriority").alias("priority"),
            F.datediff(
                F.to_date("l_shipdate"), F.to_date("o_orderdate")
            ).alias("days"),
        )
    )
    return lt.groupBy("priority").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("days"), 6).alias("avg_days"),
        F.round(F.expr("percentile(days, 0.5)"), 6).alias("p50_days"),
        F.round(F.expr("percentile(days, 0.9)"), 6).alias("p90_days"),
        F.max("days").alias("max_days"),
    )


@register(
    "q286_hourly_ohlc",
    """
    WITH ranked AS (
      SELECT event_type, date_trunc('hour', ts) AS hour, value,
             ROW_NUMBER() OVER (PARTITION BY event_type,
                                date_trunc('hour', ts)
                                ORDER BY ts ASC, event_id ASC) AS rf,
             ROW_NUMBER() OVER (PARTITION BY event_type,
                                date_trunc('hour', ts)
                                ORDER BY ts DESC, event_id DESC) AS rl
      FROM events
    )
    SELECT event_type, hour,
           ROUND(MAX(CASE WHEN rf = 1 THEN value END), 4) AS open,
           ROUND(MAX(value), 4) AS high,
           ROUND(MIN(value), 4) AS low,
           ROUND(MAX(CASE WHEN rl = 1 THEN value END), 4) AS close,
           COUNT(*) AS n
    FROM ranked GROUP BY event_type, hour
    """,
)
def q286_hourly_ohlc(spark, sf_dir):
    """Hourly OHLC bars (open/high/low/close) of event value per type —
    the candlestick downsampling primitive.  Open/close come from ONE
    shared (type, hour) partitioning: two row_numbers over the same
    sort (ts, event_id tiebreak so both engines pick the identical
    first/last event), folded into the same grouped aggregate as
    high/low — min_by/arg_min are avoided because their tie rules are
    engine-defined."""
    ev = _t(spark, sf_dir, "events")
    hour = F.date_trunc("hour", "ts")
    wf = Window.partitionBy("event_type", hour).orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    wl = Window.partitionBy("event_type", hour).orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    ranked = ev.select(
        "event_type",
        hour.alias("hour"),
        "value",
        F.row_number().over(wf).alias("rf"),
        F.row_number().over(wl).alias("rl"),
    )
    return ranked.groupBy("event_type", "hour").agg(
        F.round(
            F.max(F.when(F.col("rf") == 1, F.col("value"))), 4
        ).alias("open"),
        F.round(F.max("value"), 4).alias("high"),
        F.round(F.min("value"), 4).alias("low"),
        F.round(
            F.max(F.when(F.col("rl") == 1, F.col("value"))), 4
        ).alias("close"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "q287_max_drawdown",
    """
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             SUM(value) AS v
      FROM events GROUP BY 1, 2
    ),
    cum AS (
      SELECT event_type, day,
             SUM(v) OVER (PARTITION BY event_type ORDER BY day
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS c
      FROM daily
    ),
    dd AS (
      SELECT event_type, day, c,
             MAX(c) OVER (PARTITION BY event_type ORDER BY day
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS peak
      FROM cum
    )
    SELECT event_type,
           ROUND(MAX(peak - c), 4) AS max_drawdown,
           ROUND(MAX((peak - c) / peak), 6) AS max_drawdown_frac
    FROM dd WHERE peak > 0
    GROUP BY event_type
    """,
)
def q287_max_drawdown(spark, sf_dir):
    """Maximum drawdown of the cumulative daily value series per event
    type: running peak minus current cumulative, maximized — the
    risk-metric classic, two ordered windows over the day-aggregated
    table (same engine-identical summation-order argument as q249's
    CUSUM)."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date(F.date_trunc("DAY", "ts")).alias("day")
    ).agg(F.sum("value").alias("v"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    dd = daily.select(
        "event_type",
        "day",
        F.sum("v").over(w).alias("c"),
    ).withColumn("peak", F.max("c").over(w))
    return (
        dd.filter(F.col("peak") > 0)
        .groupBy("event_type")
        .agg(
            F.round(F.max(F.col("peak") - F.col("c")), 4).alias(
                "max_drawdown"
            ),
            F.round(
                F.max((F.col("peak") - F.col("c")) / F.col("peak")), 6
            ).alias("max_drawdown_frac"),
        )
    )


@register(
    "q288_lead_lag_corr",
    """
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             COUNT(*)::DOUBLE AS x
      FROM events WHERE event_type IN ('click', 'purchase')
      GROUP BY 1, 2
    ),
    lags AS (SELECT UNNEST([-3, -2, -1, 0, 1, 2, 3]) AS lag)
    SELECT lags.lag,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           ROUND(corr(c.x, p.x), 6) AS correlation
    FROM lags
    JOIN daily c ON c.event_type = 'click'
    JOIN daily p ON p.event_type = 'purchase'
               AND p.day = c.day + CAST(lags.lag AS INT)
    GROUP BY lags.lag
    """,
)
def q288_lead_lag_corr(spark, sf_dir):
    """Lead-lag cross-correlation: corr(clicks_t, purchases_{t+k}) for
    k in [-3, 3] — does click volume LEAD purchase volume, and by how
    many days?  The lag grid joins two 30-row daily series (day
    arithmetic keys), so the whole analysis after the one raw-event
    partial agg is constant-size work."""
    ev = _t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    daily = ev.groupBy(
        "event_type", F.to_date(F.date_trunc("DAY", "ts")).alias("day")
    ).agg(F.count(F.lit(1)).cast("double").alias("x"))
    c = daily.filter(F.col("event_type") == "click").select(
        F.col("day").alias("cday"), F.col("x").alias("cx")
    )
    p = daily.filter(F.col("event_type") == "purchase").select(
        F.col("day").alias("pday"), F.col("x").alias("px")
    )
    lags = spark.range(1).select(
        F.explode(
            F.array(*[F.lit(x) for x in (-3, -2, -1, 0, 1, 2, 3)])
        ).alias("lag")
    )
    return (
        lags.crossJoin(F.broadcast(c))
        .join(
            F.broadcast(p),
            F.col("pday")
            == F.date_add(F.col("cday"), F.col("lag").cast("int")),
        )
        .groupBy("lag")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.round(F.corr("cx", "px"), 6).alias("correlation"),
        )
    )


@register(
    "q289_position_attribution",
    """
    WITH p AS (
      SELECT user_id, event_id AS pid, ts AS pts, value
      FROM events WHERE event_type = 'purchase'
    ),
    t AS (
      SELECT user_id, event_id AS tid, ts AS tts, event_type AS channel
      FROM events WHERE event_type <> 'purchase'
    ),
    j AS (
      SELECT pid, value, channel,
             ROW_NUMBER() OVER (PARTITION BY pid
                                ORDER BY tts ASC, tid ASC)  AS rn,
             COUNT(*) OVER (PARTITION BY pid) AS n
      FROM p JOIN t ON p.user_id = t.user_id AND t.tts < p.pts
    ),
    credited AS (
      SELECT channel, value,
             CASE WHEN n = 1 THEN 1.0
                  WHEN n = 2 THEN 0.5
                  WHEN rn = 1 THEN 0.4
                  WHEN rn = n THEN 0.4
                  ELSE 0.2 / (n - 2) END AS credit
      FROM j
    )
    SELECT channel,
           ROUND(SUM(value * credit), 2) AS attributed_rev
    FROM credited GROUP BY channel
    """,
)
def q289_position_attribution(spark, sf_dir):
    """Position-based (U-shaped) multi-touch attribution: 40% of each
    purchase's value to the first touch, 40% to the last, 20% split
    across the middles (degenerate paths: 1 touch takes all, 2 touches
    split evenly).  Same single purchase-id sort as q250 — one
    row_number and one count over one partitioning — then a credit
    CASE and a grouped sum; credits per purchase always total 1.0 so
    attributed revenue reconciles with raw revenue."""
    ev = _t(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("pid"),
        F.col("ts").alias("pts"),
        "value",
    )
    t = ev.filter(F.col("event_type") != "purchase").select(
        "user_id",
        F.col("event_id").alias("tid"),
        F.col("ts").alias("tts"),
        F.col("event_type").alias("channel"),
    )
    j = p.join(t, ["user_id"]).filter(F.col("tts") < F.col("pts"))
    w = Window.partitionBy("pid").orderBy(
        F.col("tts").asc(), F.col("tid").asc()
    )
    j = j.select(
        "pid",
        "value",
        "channel",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("pid")).alias("n"),
    )
    credit = (
        F.when(F.col("n") == 1, 1.0)
        .when(F.col("n") == 2, 0.5)
        .when(F.col("rn") == 1, 0.4)
        .when(F.col("rn") == F.col("n"), 0.4)
        .otherwise(0.2 / (F.col("n") - 2))
    )
    return (
        j.select("channel", (F.col("value") * credit).alias("cv"))
        .groupBy("channel")
        .agg(F.round(F.sum("cv"), 2).alias("attributed_rev"))
    )


@register(
    "q290_column_profile",
    """
    SELECT 'l_quantity' AS col,
           COUNT(*) AS n_rows,
           ROUND(AVG(CASE WHEN l_quantity IS NULL
                     THEN 1.0 ELSE 0.0 END), 6) AS null_frac,
           COUNT(DISTINCT l_quantity) AS n_distinct,
           ROUND(MIN(l_quantity), 4) AS min_val,
           ROUND(MAX(l_quantity), 4) AS max_val
    FROM lineitem
    UNION ALL
    SELECT 'l_discount', COUNT(*),
           ROUND(AVG(CASE WHEN l_discount IS NULL THEN 1.0 ELSE 0.0 END),
                 6),
           COUNT(DISTINCT l_discount),
           ROUND(MIN(l_discount), 4), ROUND(MAX(l_discount), 4)
    FROM lineitem
    UNION ALL
    SELECT 'l_extendedprice', COUNT(*),
           ROUND(AVG(CASE WHEN l_extendedprice IS NULL
                     THEN 1.0 ELSE 0.0 END), 6),
           COUNT(DISTINCT l_extendedprice),
           ROUND(MIN(l_extendedprice), 4), ROUND(MAX(l_extendedprice), 4)
    FROM lineitem
    UNION ALL
    SELECT 'l_tax', COUNT(*),
           ROUND(AVG(CASE WHEN l_tax IS NULL THEN 1.0 ELSE 0.0 END), 6),
           COUNT(DISTINCT l_tax),
           ROUND(MIN(l_tax), 4), ROUND(MAX(l_tax), 4)
    FROM lineitem
    """,
)
def q290_column_profile(spark, sf_dir):
    """Column profiler (long form): rows, null fraction, exact distinct
    count, min, max per numeric column — the schema-audit table every
    ingestion pipeline prints first.  ONE scan: all four columns'
    statistics compute in a single aggregate (count_distinct per
    column expands to Expand + partial aggs under the hood), then a
    4-row melt via stack."""
    li = _t(spark, sf_dir, "lineitem")
    cols = ["l_quantity", "l_discount", "l_extendedprice", "l_tax"]
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.lit(1)).alias(f"n_{c}"),
            F.round(
                F.avg(
                    F.when(F.col(c).isNull(), 1.0).otherwise(0.0)
                ),
                6,
            ).alias(f"nf_{c}"),
            F.count_distinct(F.col(c)).alias(f"nd_{c}"),
            F.round(F.min(c), 4).alias(f"mn_{c}"),
            F.round(F.max(c), 4).alias(f"mx_{c}"),
        ]
    a = li.agg(*aggs)
    stack = ", ".join(
        f"'{c}', n_{c}, nf_{c}, nd_{c}, mn_{c}, mx_{c}" for c in cols
    )
    return a.select(
        F.expr(
            f"stack({len(cols)}, {stack}) AS "
            "(col, n_rows, null_frac, n_distinct, min_val, max_val)"
        )
    )


@register(
    "q291_format_masks",
    """
    WITH masked AS (
      SELECT regexp_replace(regexp_replace(c_name,
               '[A-Za-z]', 'A', 'g'), '[0-9]', '9', 'g') AS mask
      FROM customer
    )
    SELECT mask, COUNT(*) AS n
    FROM masked GROUP BY mask
    """,
)
def q291_format_masks(spark, sf_dir):
    """Format-mask profiling: every letter folds to 'A', every digit to
    '9', punctuation stays — the value-pattern histogram that catches
    mixed ID formats, stray whitespace, and malformed keys in one
    groupBy.  Scan-speed regexp_replace chain; the result is
    distinct-mask-sized, not data-sized."""
    cu = _t(spark, sf_dir, "customer")
    mask = F.regexp_replace(
        F.regexp_replace(F.col("c_name"), "[A-Za-z]", "A"),
        "[0-9]",
        "9",
    )
    return (
        cu.select(mask.alias("mask"))
        .groupBy("mask")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "q292_missing_days",
    """
    WITH bounds AS (
      SELECT CAST(MIN(date_trunc('day', ts)) AS DATE) AS lo,
             CAST(MAX(date_trunc('day', ts)) AS DATE) AS hi
      FROM events
    ),
    cal AS (
      SELECT UNNEST(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS day
      FROM bounds
    ),
    present AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day
      FROM events GROUP BY 1, 2
    ),
    types AS (SELECT DISTINCT event_type FROM events)
    SELECT t.event_type,
           COUNT(*) AS days_in_range,
           SUM(CASE WHEN p.day IS NULL THEN 0 ELSE 1 END)
             AS days_present,
           SUM(CASE WHEN p.day IS NULL THEN 1 ELSE 0 END)
             AS n_missing_days
    FROM types t CROSS JOIN cal
    LEFT JOIN present p
      ON p.event_type = t.event_type AND p.day = cal.day
    GROUP BY t.event_type
    """,
)
def q292_missing_days(spark, sf_dir):
    """Series-completeness audit: for each event type, how many
    calendar days inside the table's own [min, max] range have NO
    events — the missing-partition detector that runs before any
    gap-fill.  The calendar generates in-plan from the observed bounds
    (sequence + explode), the type×day grid is types × days tiny, and
    presence is one anti-join against the day-aggregated table."""
    ev = _t(spark, sf_dir, "events")
    bounds = ev.agg(
        F.to_date(F.min(F.date_trunc("DAY", "ts"))).alias("lo"),
        F.to_date(F.max(F.date_trunc("DAY", "ts"))).alias("hi"),
    )
    cal = bounds.select(
        F.explode(F.sequence("lo", "hi")).alias("day")
    )
    present = ev.groupBy(
        "event_type",
        F.to_date(F.date_trunc("DAY", "ts")).alias("day"),
    ).agg(F.lit(1).alias("_x"))
    types = ev.select("event_type").distinct()
    return (
        types.crossJoin(F.broadcast(cal))
        .join(F.broadcast(present), ["event_type", "day"], "left")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("days_in_range"),
            F.sum(
                F.when(F.col("_x").isNull(), 0).otherwise(1)
            ).alias("days_present"),
            F.sum(
                F.when(F.col("_x").isNull(), 1).otherwise(0)
            ).alias("n_missing_days"),
        )
    )


@register(
    "q293_spearman_rank",
    r"""
    WITH toks AS (
      SELECT doc_id, UNNEST(list_filter(
        string_split_regex(trim(text), '\s+'), x -> x <> '')) AS term
      FROM documents
    ),
    h1 AS (
      SELECT term, COUNT(*) AS c FROM toks WHERE doc_id % 2 = 0
      GROUP BY term
    ),
    h2 AS (
      SELECT term, COUNT(*) AS c FROM toks WHERE doc_id % 2 = 1
      GROUP BY term
    ),
    r1 AS (
      SELECT term, ROW_NUMBER() OVER (ORDER BY c DESC, term ASC) AS r
      FROM h1
    ),
    r2 AS (
      SELECT term, ROW_NUMBER() OVER (ORDER BY c DESC, term ASC) AS r
      FROM h2
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_common_terms,
           ROUND(corr(r1.r, r2.r), 6) AS spearman_rho
    FROM r1 JOIN r2 USING (term)
    """,
)
def q293_spearman_rank(spark, sf_dir):
    """Vocabulary rank stability: Spearman's ρ between term frequency
    ranks computed on the even-doc and odd-doc halves of the corpus —
    near 1 means the term distribution is stable under resampling, the
    cheap drift guard for tokenizer/vocab decisions.  Ranks are
    (count desc, term) row_numbers per half over the vocab-sized
    tables; ρ is Pearson on the joined ranks."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(T.words("text")).alias("term")
    )
    toks = toks.localCheckpoint(eager=False)

    def half_ranks(parity):
        h = (
            toks.filter(F.col("doc_id") % 2 == parity)
            .groupBy("term")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        w = Window.orderBy(F.col("c").desc(), F.col("term").asc())
        return h.select(
            "term", F.row_number().over(w).alias(f"r{parity}")
        )

    j = half_ranks(0).join(half_ranks(1), "term")
    return j.agg(
        F.count(F.lit(1)).alias("n_common_terms"),
        F.round(F.corr("r0", "r1"), 6).alias("spearman_rho"),
    )


@register(
    "q294_capture_recapture",
    r"""
    WITH toks AS (
      SELECT doc_id, UNNEST(list_filter(
        string_split_regex(trim(text), '\s+'), x -> x <> '')) AS term
      FROM documents
    ),
    v1 AS (SELECT DISTINCT term FROM toks WHERE doc_id % 2 = 0),
    v2 AS (SELECT DISTINCT term FROM toks WHERE doc_id % 2 = 1),
    m AS (SELECT COUNT(*)::DOUBLE AS m_both FROM v1 JOIN v2 USING (term)),
    s AS (SELECT (SELECT COUNT(*)::DOUBLE FROM v1) AS n1,
                 (SELECT COUNT(*)::DOUBLE FROM v2) AS n2,
                 (SELECT m_both FROM m) AS m)
    SELECT CAST(n1 AS BIGINT) AS vocab_half1,
           CAST(n2 AS BIGINT) AS vocab_half2,
           CAST(m AS BIGINT) AS vocab_both,
           CAST(ROUND(n1 * n2 / m, 0) AS BIGINT)
             AS lincoln_petersen_estimate
    FROM s
    """,
)
def q294_capture_recapture(spark, sf_dir):
    """Capture-recapture vocabulary estimate: treat the even-doc and
    odd-doc halves as two independent samples; Lincoln-Petersen
    N ≈ n1·n2/m extrapolates the TOTAL vocabulary including unseen
    terms — the 'how much tail vocabulary is left' estimator.  Three
    distinct-counts and one semi-join-sized intersection, all on the
    vocab-keyed tables."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(T.words("text")).alias("term")
    )
    toks = toks.localCheckpoint(eager=False)
    v1 = (
        toks.filter(F.col("doc_id") % 2 == 0).select("term").distinct()
    )
    v2 = (
        toks.filter(F.col("doc_id") % 2 == 1).select("term").distinct()
    )
    n1 = v1.agg(F.count(F.lit(1)).cast("double").alias("n1"))
    n2 = v2.agg(F.count(F.lit(1)).cast("double").alias("n2"))
    m = v1.join(v2, "term").agg(
        F.count(F.lit(1)).cast("double").alias("m")
    )
    return (
        n1.crossJoin(n2)
        .crossJoin(m)
        .select(
            F.col("n1").cast("bigint").alias("vocab_half1"),
            F.col("n2").cast("bigint").alias("vocab_half2"),
            F.col("m").cast("bigint").alias("vocab_both"),
            F.round(F.col("n1") * F.col("n2") / F.col("m"), 0)
            .cast("bigint")
            .alias("lincoln_petersen_estimate"),
        )
    )


@register(
    "q295_hill_tail_index",
    """
    WITH topk AS (
      SELECT n_chars::DOUBLE AS x FROM documents
      ORDER BY n_chars DESC, doc_id ASC LIMIT 100
    ),
    kth AS (SELECT MIN(x) AS xk FROM topk)
    SELECT CAST(COUNT(*) AS BIGINT) AS k,
           ROUND((SELECT xk FROM kth), 4) AS x_k,
           ROUND(1.0 / AVG(ln(x / (SELECT xk FROM kth))), 6)
             AS hill_alpha
    FROM topk WHERE x > (SELECT xk FROM kth)
    """,
)
def q295_hill_tail_index(spark, sf_dir):
    """Hill estimator of the tail index over the top-100 document
    lengths: α = 1/mean(ln(x_i/x_k)) — the order-statistics complement
    of q190's log-log OLS power-law fit (Hill is the MLE for the
    Pareto tail; OLS on binned counts is biased).  Top-k comes from
    TakeOrderedAndProject (partition-local heads, driver merge), the
    k-th value folds back as a broadcast scalar."""
    d = _t(spark, sf_dir, "documents")
    topk = (
        d.select(
            F.col("n_chars").cast("double").alias("x"), "doc_id"
        )
        .orderBy(F.col("n_chars").desc(), F.col("doc_id").asc())
        .limit(100)
        .select("x")
    )
    topk = topk.localCheckpoint(eager=False)
    kth = topk.agg(F.min("x").alias("xk"))
    return (
        topk.crossJoin(F.broadcast(kth))
        .filter(F.col("x") > F.col("xk"))
        .agg(
            F.count(F.lit(1)).alias("k"),
            F.round(F.max("xk"), 4).alias("x_k"),
            F.round(
                1.0 / F.avg(F.log(F.col("x") / F.col("xk"))), 6
            ).alias("hill_alpha"),
        )
    )


@register(
    "q297_cube_grouping_id",
    """
    SELECT COALESCE(l_returnflag, '<all>') AS returnflag,
           COALESCE(l_linestatus, '<all>') AS linestatus,
           GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus)
             AS grouping_id,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(l_extendedprice), 2) AS revenue
    FROM lineitem
    GROUP BY CUBE(l_returnflag, l_linestatus)
    """,
)
def q297_cube_grouping_id(spark, sf_dir):
    """CUBE with the GROUPING bitmask made explicit: every subtotal row
    carries which dimensions were rolled away (grouping_id 0 = detail,
    3 = grand total), and NULL group keys are disambiguated from real
    NULLs via the COALESCE-on-grouping idiom — the part of cube output
    BI layers actually key on.  One Expand + partial agg, as with
    plain cube."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().alias("grouping_id"),
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("<all>")).alias(
                "returnflag"
            ),
            F.coalesce("l_linestatus", F.lit("<all>")).alias(
                "linestatus"
            ),
            "grouping_id",
            "n",
            "revenue",
        )
    )


@register(
    "q298_acf",
    """
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             COUNT(*)::DOUBLE AS x
      FROM events GROUP BY 1
    ),
    lags AS (SELECT UNNEST(range(1, 8)) AS lag)
    SELECT lags.lag,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           ROUND(corr(a.x, b.x), 6) AS acf
    FROM lags
    JOIN daily a ON TRUE
    JOIN daily b ON b.day = a.day + CAST(lags.lag AS INT)
    GROUP BY lags.lag
    """,
)
def q298_acf(spark, sf_dir):
    """Autocorrelation function of total daily volume at lags 1–7 (the
    q194 single-lag statistic extended to the weekly window that
    exposes day-of-week cycles).  The lag grid joins the 30-row daily
    series against itself on date arithmetic — constant-size work
    after the one raw partial agg."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.to_date(F.date_trunc("DAY", "ts")).alias("day")
    ).agg(F.count(F.lit(1)).cast("double").alias("x"))
    a = daily.select(F.col("day").alias("aday"), F.col("x").alias("ax"))
    b = daily.select(F.col("day").alias("bday"), F.col("x").alias("bx"))
    lags = spark.range(1).select(
        F.explode(F.sequence(F.lit(1), F.lit(7))).alias("lag")
    )
    return (
        lags.crossJoin(F.broadcast(a))
        .join(
            F.broadcast(b),
            F.col("bday")
            == F.date_add(F.col("aday"), F.col("lag").cast("int")),
        )
        .groupBy("lag")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.round(F.corr("ax", "bx"), 6).alias("acf"),
        )
    )


@register(
    "q299_audience_overlap",
    """
    WITH ut AS (
      SELECT DISTINCT event_type, user_id FROM events
    ),
    sz AS (SELECT event_type, COUNT(*) AS n FROM ut GROUP BY 1),
    inter AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             CAST(COUNT(*) AS BIGINT) AS n_both
      FROM ut a JOIN ut b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2
    )
    SELECT type_a, type_b, n_both,
           ROUND(n_both::DOUBLE / (sa.n + sb.n - n_both), 6)
             AS audience_jaccard
    FROM inter
    JOIN sz sa ON sa.event_type = type_a
    JOIN sz sb ON sb.event_type = type_b
    """,
)
def q299_audience_overlap(spark, sf_dir):
    """Audience-overlap matrix: Jaccard of user sets between every
    event-type pair — the 'do clickers also purchase' table.  Pairs
    generate through the shared user (the inverted-index wedge shape
    on the distinct user×type table, |types|² output), set sizes fold
    in as broadcast joins."""
    ev = _t(spark, sf_dir, "events")
    ut = ev.select("event_type", "user_id").distinct()
    ut = ut.localCheckpoint(eager=False)
    sz = ut.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    a, b = ut.alias("a"), ut.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    sa = sz.select(F.col("event_type").alias("type_a"),
                   F.col("n").alias("na"))
    sb = sz.select(F.col("event_type").alias("type_b"),
                   F.col("n").alias("nb"))
    return (
        inter.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .select(
            "type_a",
            "type_b",
            "n_both",
            F.round(
                F.col("n_both").cast("double")
                / (F.col("na") + F.col("nb") - F.col("n_both")),
                6,
            ).alias("audience_jaccard"),
        )
    )


@register(
    "q300_concurrency_profile",
    """
    WITH e AS (
      SELECT user_id, ts, CAST(floor(epoch(ts)) AS BIGINT) AS tsec
      FROM events
    ),
    s AS (
      SELECT user_id, ts, tsec,
             CASE WHEN lag(tsec) OVER w IS NULL
                       OR tsec - lag(tsec) OVER w > 1800
                  THEN 1 ELSE 0 END AS is_new
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    numbered AS (
      SELECT user_id, tsec,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS UNBOUNDED PRECEDING) AS session_seq
      FROM s
    ),
    sess AS (
      SELECT user_id, session_seq,
             MIN(tsec) AS s0, MAX(tsec) AS s1
      FROM numbered GROUP BY user_id, session_seq
    ),
    bounds AS (
      SELECT s0 AS t, 1 AS delta FROM sess WHERE s1 > s0
      UNION ALL
      SELECT s1, -1 FROM sess WHERE s1 > s0
    ),
    merged AS (
      SELECT t, SUM(delta) AS d FROM bounds GROUP BY t
    ),
    sweep AS (
      SELECT t, SUM(d) OVER (ORDER BY t
                             ROWS UNBOUNDED PRECEDING) AS active,
             LEAD(t) OVER (ORDER BY t) AS t_next
      FROM merged
    )
    SELECT CAST(active AS BIGINT) AS concurrent_sessions,
           CAST(SUM(t_next - t) AS BIGINT) AS total_seconds
    FROM sweep WHERE t_next IS NOT NULL AND active > 0
    GROUP BY active
    """,
)
def q300_concurrency_profile(spark, sf_dir):
    """Concurrency profile by sweep line: sessionize (30-min gap),
    emit +1/−1 boundary deltas at session start/end seconds, COALESCE
    same-instant deltas by grouping on the timestamp (so ordering
    within an instant cannot differ between engines), one ordered
    running sum, and durations to the next boundary — 'how many
    seconds had exactly k concurrent sessions'.  The sweep window runs
    over the boundary table (2 rows per session, not per event); at
    cluster scale the same plan runs on a `global_rank`-style range
    partitioning of the boundary timeline."""
    e = _t(spark, sf_dir, "events").select("user_id", "ts")
    s = R.sessionize(e, "user_id", "ts", gap_seconds=1800)
    sess = s.groupBy("user_id", "session_seq").agg(
        F.min(F.col("ts").cast("long")).alias("s0"),
        F.max(F.col("ts").cast("long")).alias("s1"),
    ).filter(F.col("s1") > F.col("s0"))
    bounds = sess.select(
        F.col("s0").alias("t"), F.lit(1).alias("delta")
    ).unionByName(
        sess.select(F.col("s1").alias("t"), F.lit(-1).alias("delta"))
    )
    merged = bounds.groupBy("t").agg(F.sum("delta").alias("d"))
    w = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sweep = merged.select(
        "t",
        F.sum("d").over(w).alias("active"),
        F.lead("t").over(Window.orderBy("t")).alias("t_next"),
    )
    return (
        sweep.filter(
            F.col("t_next").isNotNull() & (F.col("active") > 0)
        )
        .groupBy(F.col("active").cast("bigint").alias(
            "concurrent_sessions"
        ))
        .agg(
            F.sum(F.col("t_next") - F.col("t"))
            .cast("bigint")
            .alias("total_seconds")
        )
    )


@register(
    "q399_dup_length_bias",
    """
    WITH fp AS (
      SELECT md5(text) AS f, COUNT(*) AS copies,
             MAX(n_chars) AS len
      FROM documents GROUP BY md5(text)
    )
    SELECT CASE WHEN copies = 1 THEN 'unique' ELSE 'duplicated' END
             AS dup_class,
           CAST(COUNT(*) AS BIGINT) AS n_texts,
           ROUND(AVG(len), 4) AS mean_len,
           ROUND(quantile_cont(len, 0.5), 4) AS median_len
    FROM fp
    GROUP BY CASE WHEN copies = 1 THEN 'unique' ELSE 'duplicated' END
    """,
)
def q399_dup_length_bias(spark, sf_dir):
    """Duplication-length bias: are duplicated texts systematically
    shorter than unique ones?  (They usually are — boilerplate and
    error pages dominate exact dups — which means naive dedup shifts
    the corpus length distribution and everything downstream of it.)
    One fingerprint agg, one two-class comparison."""
    d = _t(spark, sf_dir, "documents")
    fp = d.groupBy(F.md5("text").alias("f")).agg(
        F.count(F.lit(1)).alias("copies"),
        F.max("n_chars").alias("len"),
    )
    cls = F.when(F.col("copies") == 1, "unique").otherwise(
        "duplicated"
    )
    return fp.groupBy(cls.alias("dup_class")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_texts"),
        F.round(F.avg("len"), 4).alias("mean_len"),
        F.round(F.expr("percentile(len, 0.5)"), 4).alias(
            "median_len"
        ),
    )


@register(
    "q400_pipeline_yield",
    r"""
    WITH staged AS (
      SELECT source,
             length(trim(text)) >= 20 AS passes_gate,
             md5(lower(trim(text))) AS f,
             len(list_filter(string_split_regex(trim(text), '\s+'),
                             x -> x <> ''))::DOUBLE AS toks,
             ROW_NUMBER() OVER (PARTITION BY md5(lower(trim(text)))
                                ORDER BY doc_id) AS copy_rank
      FROM documents
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS raw_docs,
           CAST(SUM(toks) AS BIGINT) AS raw_tokens,
           CAST(SUM(CASE WHEN passes_gate AND copy_rank = 1
                    THEN 1 ELSE 0 END) AS BIGINT) AS kept_docs,
           CAST(SUM(CASE WHEN passes_gate AND copy_rank = 1
                    THEN toks ELSE 0 END) AS BIGINT) AS kept_tokens,
           ROUND(SUM(CASE WHEN passes_gate AND copy_rank = 1
                     THEN toks ELSE 0 END) / SUM(toks), 6)
             AS token_yield
    FROM staged GROUP BY source
    """,
)
def q400_pipeline_yield(spark, sf_dir):
    """The registry's 400th entry: end-to-end pipeline yield in ONE
    query — normalize (lowercase+trim), exact-dedup keeping the
    first copy per normalized fingerprint, gate junk (<20 chars), and
    report per-source document and token yield — the whole q85→q40→
    q127 pipeline's accounting, executed as a single plan: one
    fingerprint window for winner-per-group, scan-speed gates, one
    grouped rollup."""
    d = _t(spark, sf_dir, "documents")
    w = Window.partitionBy(
        F.md5(F.lower(F.trim(F.col("text"))))
    ).orderBy("doc_id")
    staged = d.select(
        "source",
        (F.length(F.trim(F.col("text"))) >= 20).alias("passes_gate"),
        T.n_words("text").cast("double").alias("toks"),
        F.row_number().over(w).alias("copy_rank"),
    )
    kept = F.col("passes_gate") & (F.col("copy_rank") == 1)
    return staged.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("raw_docs"),
        F.sum("toks").cast("bigint").alias("raw_tokens"),
        F.sum(F.when(kept, 1).otherwise(0))
        .cast("bigint")
        .alias("kept_docs"),
        F.sum(F.when(kept, F.col("toks")).otherwise(0.0))
        .cast("bigint")
        .alias("kept_tokens"),
        F.round(
            F.sum(F.when(kept, F.col("toks")).otherwise(0.0))
            / F.sum("toks"),
            6,
        ).alias("token_yield"),
    )


@register(
    "q401_source_kl",
    r"""
    WITH tok AS (
      SELECT source, UNNEST(list_filter(
               string_split_regex(trim(lower(text)), '\s+'),
               w -> w <> '')) AS w
      FROM documents
    ),
    sw AS (SELECT source, w, CAST(COUNT(*) AS DOUBLE) AS cs
           FROM tok GROUP BY source, w),
    cw AS (SELECT w, CAST(SUM(cs) AS DOUBLE) AS c FROM sw GROUP BY w),
    g AS (SELECT CAST(SUM(c) AS DOUBLE) AS n,
                 CAST(COUNT(*) AS DOUBLE) AS v,
                 SUM(LN(c)) AS lc
          FROM cw),
    per AS (
      SELECT sw.source,
             SUM(sw.cs) AS ns,
             CAST(COUNT(*) AS DOUBLE) AS vs,
             SUM(LN(cw.c)) AS lcs,
             SUM((sw.cs + 1) * (LN(sw.cs + 1) - LN(cw.c)))
               AS present_core
      FROM sw JOIN cw USING (w)
      GROUP BY sw.source
    )
    SELECT per.source,
           CAST(per.ns AS BIGINT) AS n_tokens,
           CAST(per.vs AS BIGINT) AS vocab_used,
           ROUND((per.present_core - g.lc + per.lcs) / (per.ns + g.v)
                 + LN(g.n) - LN(per.ns + g.v), 6) AS kl_nats
    FROM per, g
    """,
)
def q401_source_kl(spark, sf_dir):
    """Per-source KL divergence from the corpus unigram LM — "which
    source sounds least like the rest of the corpus", the domain-drift
    statistic behind source-mixing decisions in pretraining-data prep.
    Add-one smoothing over the corpus vocabulary means every source is
    scored against ALL of V, but the absent-word mass is folded
    analytically: for w the source never uses, p_s(w)=1/(n_s+V) is
    constant, so the sum over V\\S collapses to global scalars
    (V, ln n, sum-of-ln-counts) minus the source's own aggregates.
    KL = (present_core - Lc + Lc_s)/(n_s+V) + ln n - ln(n_s+V) —
    two hash aggs and a one-row broadcast, never a source x vocab
    expansion.  Same tokenizer as q155's surprisal LM."""
    d = _t(spark, sf_dir, "documents")
    toks = F.filter(
        F.split(F.trim(F.lower(F.col("text"))), r"\s+"),
        lambda w: w != "",
    )
    sw = (
        d.select("source", F.explode(toks).alias("w"))
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).cast("double").alias("cs"))
        .localCheckpoint(eager=False)
    )
    cw = sw.groupBy("w").agg(F.sum("cs").alias("c"))
    g = cw.agg(
        F.sum("c").alias("n"),
        F.count(F.lit(1)).cast("double").alias("v"),
        F.sum(F.log("c")).alias("lc"),
    )
    per = (
        sw.join(cw, "w")
        .groupBy("source")
        .agg(
            F.sum("cs").alias("ns"),
            F.count(F.lit(1)).cast("double").alias("vs"),
            F.sum(F.log("c")).alias("lcs"),
            F.sum(
                (F.col("cs") + 1)
                * (F.log(F.col("cs") + 1) - F.log("c"))
            ).alias("present_core"),
        )
    )
    return per.crossJoin(F.broadcast(g)).select(
        "source",
        F.col("ns").cast("bigint").alias("n_tokens"),
        F.col("vs").cast("bigint").alias("vocab_used"),
        F.round(
            (F.col("present_core") - F.col("lc") + F.col("lcs"))
            / (F.col("ns") + F.col("v"))
            + F.log("n")
            - F.log(F.col("ns") + F.col("v")),
            6,
        ).alias("kl_nats"),
    )


@register(
    "q402_ship_window",
    """
    WITH span AS (
      SELECT l_orderkey,
             date_diff('day', MIN(CAST(l_shipdate AS DATE)),
                       MAX(CAST(l_shipdate AS DATE))) AS span_days
      FROM lineitem GROUP BY l_orderkey
    )
    SELECT o.o_orderpriority AS priority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(AVG(span_days), 6) AS avg_span,
           ROUND(quantile_cont(span_days, 0.9), 6) AS p90_span,
           ROUND(AVG(CASE WHEN span_days = 0 THEN 1.0 ELSE 0.0 END),
                 6) AS single_window_rate
    FROM span JOIN orders o ON span.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def q402_ship_window(spark, sf_dir):
    """Ship-window span per order: days between an order's first and
    last line shipment, summarized by priority.  A long window means
    the order stayed open across many shipments (split fulfilment);
    q285 measures order->first-ship latency, this measures the spread
    WITHIN the order.  Per-order min/max agg, then a broadcast-sized
    priority rollup with a continuous p90."""
    li = _t(spark, sf_dir, "lineitem")
    od = _t(spark, sf_dir, "orders")
    span = li.groupBy("l_orderkey").agg(
        F.datediff(
            F.max(F.to_date("l_shipdate")),
            F.min(F.to_date("l_shipdate")),
        ).alias("span_days")
    )
    return (
        span.join(
            od.select("o_orderkey", "o_orderpriority"),
            span.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.round(F.avg("span_days"), 6).alias("avg_span"),
            F.round(
                F.expr("percentile(span_days, 0.9)"), 6
            ).alias("p90_span"),
            F.round(
                F.avg(
                    F.when(F.col("span_days") == 0, 1.0).otherwise(
                        0.0
                    )
                ),
                6,
            ).alias("single_window_rate"),
        )
    )


@register(
    "q403_sentence_stats",
    r"""
    WITH sent AS (
      SELECT doc_id, source, trim(s) AS s
      FROM (
        SELECT doc_id, source, UNNEST(
                 string_split_regex(text, '[.!?]+')) AS s
        FROM documents)
      WHERE trim(s) <> ''
    ),
    per_doc AS (
      SELECT doc_id, source,
             COUNT(*) AS n_sent,
             AVG(len(list_filter(string_split_regex(s, '\s+'),
                                 w -> w <> ''))::DOUBLE) AS wps
      FROM sent GROUP BY doc_id, source
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(AVG(n_sent), 6) AS avg_sentences,
           ROUND(AVG(wps), 6) AS avg_words_per_sentence,
           ROUND(quantile_cont(wps, 0.9), 6) AS p90_words_per_sentence
    FROM per_doc GROUP BY source
    """,
)
def q403_sentence_stats(spark, sf_dir):
    """Sentence-level shape per source: sentences per doc and words
    per sentence — the syntactic-complexity axis that word-level stats
    (q42) can't see, and the input to readability gates beyond q137's
    fixed formula.  Explode on terminal punctuation, per-doc agg, then
    a source rollup; everything is codegen split/filter expressions."""
    d = _t(spark, sf_dir, "documents")
    sent = (
        d.select(
            "doc_id",
            "source",
            F.explode(F.split("text", "[.!?]+")).alias("s0"),
        )
        .select("doc_id", "source", F.trim("s0").alias("s"))
        .filter(F.col("s") != "")
    )
    per_doc = sent.groupBy("doc_id", "source").agg(
        F.count(F.lit(1)).alias("n_sent"),
        F.avg(
            F.size(
                F.filter(
                    F.split("s", r"\s+"), lambda w: w != ""
                )
            ).cast("double")
        ).alias("wps"),
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.round(F.avg("n_sent"), 6).alias("avg_sentences"),
        F.round(F.avg("wps"), 6).alias("avg_words_per_sentence"),
        F.round(F.expr("percentile(wps, 0.9)"), 6).alias(
            "p90_words_per_sentence"
        ),
    )


@register(
    "q404_local_bridges",
    """
    WITH e AS (
      SELECT DISTINCT LEAST(l_orderkey % 2000, l_partkey % 2000) AS a,
             GREATEST(l_orderkey % 2000, l_partkey % 2000) AS b
      FROM lineitem
      WHERE l_orderkey % 2000 <> l_partkey % 2000
    ),
    nbr AS (SELECT a AS v, b AS u FROM e
            UNION ALL SELECT b AS v, a AS u FROM e),
    supp AS (
      SELECT e.a, e.b, CAST(COUNT(*) AS BIGINT) AS support
      FROM e
      JOIN nbr na ON na.v = e.a
      JOIN nbr nb ON nb.v = e.b AND nb.u = na.u
      GROUP BY e.a, e.b
    )
    SELECT CAST((SELECT COUNT(*) FROM e) AS BIGINT) AS n_edges,
           CAST((SELECT COUNT(*) FROM supp) AS BIGINT)
             AS n_supported,
           CAST((SELECT COUNT(*) FROM e) -
                (SELECT COUNT(*) FROM supp) AS BIGINT) AS n_bridges,
           ROUND(1.0 - (SELECT COUNT(*) FROM supp)::DOUBLE /
                 (SELECT COUNT(*) FROM e), 6) AS bridge_rate,
           ROUND((SELECT AVG(support) FROM supp), 6) AS avg_support
    """,
)
def q404_local_bridges(spark, sf_dir):
    """Granovetter local bridges: edges whose endpoints share NO
    common neighbor — the weak ties that carry novel information
    across communities, and exactly the support-0 edges k-truss
    (q105) peels first.  Wedge join on the symmetric adjacency
    (bounded: sum-of-degrees rows, same shape as triangle support),
    then one anti-join-free summary row via two counts.  Uses a
    sparser mod-2000 projection so bridges actually exist at small
    scale."""
    li = _t(spark, sf_dir, "lineitem")
    s = (F.col("l_orderkey") % 2000).alias("s")
    t = (F.col("l_partkey") % 2000).alias("t")
    e = (
        li.select(s, t)
        .filter(F.col("s") != F.col("t"))
        .select(
            F.least("s", "t").alias("a"),
            F.greatest("s", "t").alias("b"),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    nbr = e.select(
        F.col("a").alias("v"), F.col("b").alias("u")
    ).unionAll(e.select(F.col("b").alias("v"), F.col("a").alias("u")))
    supp = (
        e.join(
            nbr.select(F.col("v").alias("va"), F.col("u").alias("ua")),
            F.col("va") == F.col("a"),
        )
        .join(
            nbr.select(F.col("v").alias("vb"), F.col("u").alias("ub")),
            (F.col("vb") == F.col("b"))
            & (F.col("ub") == F.col("ua")),
        )
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("support"))
    )
    totals = e.agg(F.count(F.lit(1)).cast("bigint").alias("n_edges"))
    stats = supp.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_supported"),
        F.avg("support").alias("avg_support_raw"),
    )
    return totals.crossJoin(F.broadcast(stats)).select(
        "n_edges",
        "n_supported",
        (F.col("n_edges") - F.col("n_supported"))
        .cast("bigint")
        .alias("n_bridges"),
        F.round(
            F.lit(1.0)
            - F.col("n_supported").cast("double") / F.col("n_edges"),
            6,
        ).alias("bridge_rate"),
        F.round("avg_support_raw", 6).alias("avg_support"),
    )


@register(
    "q405_zipf_coverage",
    r"""
    WITH tok AS (
      SELECT lang, UNNEST(list_filter(
               string_split_regex(trim(lower(text)), '\s+'),
               w -> w <> '')) AS w
      FROM documents
    ),
    v AS (SELECT lang, w, CAST(COUNT(*) AS DOUBLE) AS cnt
          FROM tok GROUP BY lang, w),
    r AS (
      SELECT lang, cnt,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY cnt DESC, w) AS rn,
             SUM(cnt) OVER (PARTITION BY lang
                            ORDER BY cnt DESC, w) AS cum
      FROM v
    ),
    tot AS (SELECT lang, SUM(cnt) AS n FROM v GROUP BY lang)
    SELECT r.lang,
           CAST(tot.n AS BIGINT) AS n_tokens,
           CAST(MAX(r.rn) AS BIGINT) AS vocab,
           ROUND(MAX(CASE WHEN r.rn <= 10 THEN r.cum END) / tot.n, 6)
             AS cov_top10,
           ROUND(MAX(CASE WHEN r.rn <= 100 THEN r.cum END) / tot.n, 6)
             AS cov_top100,
           ROUND(MAX(CASE WHEN r.rn <= 1000 THEN r.cum END) / tot.n,
                 6) AS cov_top1000
    FROM r JOIN tot USING (lang)
    GROUP BY r.lang, tot.n
    """,
)
def q405_zipf_coverage(spark, sf_dir):
    """Zipf coverage curve per language: what fraction of the token
    mass the top-10/100/1000 word types carry — the statistic that
    sizes stopword lists and tokenizer vocabularies, and the
    cumulative complement of q226's Zipf slope.  The ordered window
    (rank + running sum) runs over the per-(lang, word) AGGREGATED
    vocab table, never the raw token stream; ties break on the word
    itself so the cumulative path is deterministic."""
    d = _t(spark, sf_dir, "documents")
    toks = F.filter(
        F.split(F.trim(F.lower(F.col("text"))), r"\s+"),
        lambda w: w != "",
    )
    v = (
        d.select("lang", F.explode(toks).alias("w"))
        .groupBy("lang", "w")
        .agg(F.count(F.lit(1)).cast("double").alias("cnt"))
    )
    w = Window.partitionBy("lang").orderBy(
        F.col("cnt").desc(), "w"
    )
    r = v.select(
        "lang",
        "cnt",
        F.row_number().over(w).alias("rn"),
        F.sum("cnt")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("cum"),
    )
    tot = v.groupBy("lang").agg(F.sum("cnt").alias("n"))
    cov = lambda k: F.round(  # noqa: E731
        F.max(F.when(F.col("rn") <= k, F.col("cum"))) / F.first("n"),
        6,
    )
    return (
        r.join(F.broadcast(tot), "lang")
        .groupBy("lang")
        .agg(
            F.first("n").cast("bigint").alias("n_tokens"),
            F.max("rn").cast("bigint").alias("vocab"),
            cov(10).alias("cov_top10"),
            cov(100).alias("cov_top100"),
            cov(1000).alias("cov_top1000"),
        )
    )


@register(
    "q406_local_supplier_volume",
    """
    SELECT n.n_name AS nation,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2)
             AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND s.s_nationkey = c.c_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= DATE '1996-01-01'
      AND o.o_orderdate <  DATE '1998-01-01'
    GROUP BY n.n_name
    """,
)
def q406_local_supplier_volume(spark, sf_dir):
    """TPC-H Q5 (local supplier volume): revenue from orders where
    the customer and the line's supplier sit in the SAME nation,
    rolled up by nation within one region — the classic snowflake +
    self-consistency join.  customer/supplier/nation/region broadcast
    (dimension-sized); the only shuffle is lineitem joining orders on
    orderkey; the date filter prunes at the orders scan before that
    shuffle."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1998-01-01"))
    )
    li = _t(spark, sf_dir, "lineitem")
    su = _t(spark, sf_dir, "supplier")
    na = _t(spark, sf_dir, "nation")
    re = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(
            F.broadcast(c),
            (F.col("o_custkey") == F.col("c_custkey")),
        )
        .join(
            F.broadcast(su),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
        .join(
            F.broadcast(na), F.col("s_nationkey") == F.col("n_nationkey")
        )
        .join(
            F.broadcast(re), F.col("n_regionkey") == F.col("r_regionkey")
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
            F.round(
                F.sum(
                    F.col("l_extendedprice")
                    * (F.lit(1) - F.col("l_discount"))
                ),
                2,
            ).alias("revenue"),
        )
    )


@register(
    "q407_dormant_high_balance",
    """
    WITH avg_bal AS (
      SELECT AVG(c_acctbal) AS ab FROM customer WHERE c_acctbal > 0
    )
    SELECT c.c_mktsegment AS segment,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           ROUND(SUM(c.c_acctbal), 2) AS total_bal
    FROM customer c, avg_bal
    WHERE c.c_acctbal > avg_bal.ab
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= DATE '2000-01-01')
    GROUP BY c.c_mktsegment
    """,
)
def q407_dormant_high_balance(spark, sf_dir):
    """TPC-H Q22's shape (global sales opportunity): customers whose
    balance beats the positive-balance average yet who placed NO
    order in the dataset's final 18 months — the scalar-subquery +
    anti-join composition, by segment.  The average is a one-row
    broadcast; the dormancy test is a LEFT ANTI against the date-
    filtered o_custkey column (filter + pruning reach the orders
    scan), so the big table contributes only recent keys."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    ab = c.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("ab")
    )
    return (
        c.crossJoin(F.broadcast(ab))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(
            o.filter(F.col("o_orderdate") >= F.lit("2000-01-01"))
            .select(F.col("o_custkey").alias("c_custkey")),
            "c_custkey",
            "left_anti",
        )
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
    )


@register(
    "q408_quarter_end_hockey_stick",
    """
    WITH q AS (
      SELECT CAST(date_trunc('quarter', o_orderdate) AS DATE)
               AS quarter,
             CAST(o_orderdate AS DATE) >=
               CAST(date_trunc('quarter', o_orderdate)
                    + INTERVAL 3 MONTH AS DATE) - 7 AS last_week,
             o_totalprice AS rev
      FROM orders
    )
    SELECT quarter,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(SUM(rev), 2) AS revenue,
           ROUND(SUM(CASE WHEN last_week THEN rev ELSE 0 END)
                 / SUM(rev), 6) AS last_week_share,
           ROUND(AVG(CASE WHEN last_week THEN 1.0 ELSE 0.0 END), 6)
             AS last_week_order_share
    FROM q GROUP BY quarter
    """,
)
def q408_quarter_end_hockey_stick(spark, sf_dir):
    """Quarter-end hockey stick: the share of each quarter's revenue
    booked in its final 7 days.  A flat ~7.7% means organic flow; a
    spike means quota-driven pull-ins (or batch ingestion dumping at
    period close) — either way downstream forecasts must model it.
    Calendar arithmetic is codegen (date_trunc + add_months), one
    grouped rollup, zero joins."""
    od = _t(spark, sf_dir, "orders")
    qstart = F.to_date(F.date_trunc("QUARTER", "o_orderdate"))
    cutoff = F.date_sub(F.add_months(qstart, 3), 7)
    q = od.select(
        qstart.alias("quarter"),
        (F.to_date("o_orderdate") >= cutoff).alias("last_week"),
        F.col("o_totalprice").alias("rev"),
    )
    return q.groupBy("quarter").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.round(F.sum("rev"), 2).alias("revenue"),
        F.round(
            F.sum(F.when(F.col("last_week"), F.col("rev")).otherwise(0))
            / F.sum("rev"),
            6,
        ).alias("last_week_share"),
        F.round(
            F.avg(F.when(F.col("last_week"), 1.0).otherwise(0.0)), 6
        ).alias("last_week_order_share"),
    )


@register(
    "q409_butterfly_count",
    """
    WITH e AS (
      SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    ),
    wedge AS (
      SELECT e1.c AS c1, e2.c AS c2
      FROM e e1 JOIN e e2 ON e1.p = e2.p AND e1.c < e2.c
    ),
    m AS (SELECT c1, c2, CAST(COUNT(*) AS DOUBLE) AS shared
          FROM wedge GROUP BY c1, c2)
    SELECT CAST((SELECT COUNT(*) FROM e) AS BIGINT) AS n_edges,
           CAST((SELECT COUNT(*) FROM wedge) AS BIGINT) AS n_wedges,
           CAST((SELECT SUM(shared * (shared - 1) / 2) FROM m)
                AS BIGINT) AS n_butterflies,
           ROUND((SELECT SUM(shared * (shared - 1) / 2) FROM m) /
                 (SELECT COUNT(*) FROM wedge), 6)
             AS butterflies_per_wedge
    """,
)
def q409_butterfly_count(spark, sf_dir):
    """Butterfly (bipartite 4-cycle) count on the customer-part
    purchase graph — the bipartite analogue of the triangle, the base
    motif for bipartite clustering and co-purchase community
    strength.  Wedges pair the customers of each part (sum-of-deg^2
    rows, part-side); butterflies are C(shared,2) summed over
    customer pairs.  At 100x the part-side wedge join takes the same
    max_df degree cap as the shingle joins (q45/q232) — here the
    exact count is the oracle contract."""
    od = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    e = (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .select(
            F.col("o_custkey").alias("c"),
            F.col("l_partkey").alias("p"),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    wedge = (
        e.select(F.col("c").alias("c1"), "p")
        .join(
            e.select(F.col("c").alias("c2"), "p"), "p"
        )
        .filter(F.col("c1") < F.col("c2"))
    )
    m = wedge.groupBy("c1", "c2").agg(
        F.count(F.lit(1)).cast("double").alias("shared")
    )
    ecnt = e.agg(F.count(F.lit(1)).cast("bigint").alias("n_edges"))
    stats = m.agg(
        F.sum("shared").cast("bigint").alias("n_wedges"),
        F.sum(
            F.col("shared") * (F.col("shared") - 1) / 2
        ).alias("bf"),
    )
    return ecnt.crossJoin(F.broadcast(stats)).select(
        "n_edges",
        "n_wedges",
        F.col("bf").cast("bigint").alias("n_butterflies"),
        F.round(F.col("bf") / F.col("n_wedges"), 6).alias(
            "butterflies_per_wedge"
        ),
    )


@register(
    "q410_price_index",
    """
    WITH py AS (
      SELECT l_partkey,
             EXTRACT(year FROM l_shipdate) AS yr,
             SUM(l_extendedprice) / SUM(l_quantity) AS p,
             SUM(l_quantity) AS q
      FROM lineitem
      WHERE EXTRACT(year FROM l_shipdate) IN (1999, 2000)
      GROUP BY l_partkey, EXTRACT(year FROM l_shipdate)
    ),
    both_years AS (
      SELECT b.l_partkey, b.p AS p0, b.q AS q0, c.p AS p1, c.q AS q1
      FROM py b JOIN py c ON b.l_partkey = c.l_partkey
      WHERE b.yr = 1999 AND c.yr = 2000
    )
    SELECT pt.p_brand AS brand,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           ROUND(SUM(p1 * q0) / SUM(p0 * q0), 6) AS laspeyres,
           ROUND(SUM(p1 * q1) / SUM(p0 * q1), 6) AS paasche,
           ROUND(SQRT((SUM(p1 * q0) / SUM(p0 * q0)) *
                      (SUM(p1 * q1) / SUM(p0 * q1))), 6) AS fisher
    FROM both_years b JOIN part pt ON b.l_partkey = pt.p_partkey
    GROUP BY pt.p_brand
    """,
)
def q410_price_index(spark, sf_dir):
    """Laspeyres / Paasche / Fisher price indices per brand, 1999 ->
    2000: the index-number problem — base-year-weighted vs current-
    year-weighted inflation disagree whenever quantity shifts toward
    cheaper parts, and Fisher's geometric mean is the standard
    compromise.  One year-partitioned agg, a self-join on partkey
    restricted to parts traded in BOTH years, then brand sufficient
    sums; the year filter prunes the lineitem scan."""
    li = _t(spark, sf_dir, "lineitem")
    pt = _t(spark, sf_dir, "part")
    py = (
        li.filter(F.year("l_shipdate").isin(1999, 2000))
        .groupBy(
            "l_partkey", F.year("l_shipdate").alias("yr")
        )
        .agg(
            (F.sum("l_extendedprice") / F.sum("l_quantity")).alias(
                "p"
            ),
            F.sum("l_quantity").alias("q"),
        )
    )
    base = py.filter(F.col("yr") == 1999).select(
        "l_partkey",
        F.col("p").alias("p0"),
        F.col("q").alias("q0"),
    )
    cur = py.filter(F.col("yr") == 2000).select(
        "l_partkey",
        F.col("p").alias("p1"),
        F.col("q").alias("q1"),
    )
    lasp = F.sum(F.col("p1") * F.col("q0")) / F.sum(
        F.col("p0") * F.col("q0")
    )
    paas = F.sum(F.col("p1") * F.col("q1")) / F.sum(
        F.col("p0") * F.col("q1")
    )
    return (
        base.join(cur, "l_partkey")
        .join(
            F.broadcast(pt.select("p_partkey", "p_brand")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_parts"),
            F.round(lasp, 6).alias("laspeyres"),
            F.round(paas, 6).alias("paasche"),
            F.round(F.sqrt(lasp * paas), 6).alias("fisher"),
        )
    )


@register(
    "q411_abc_classes",
    """
    WITH rev AS (
      SELECT l_partkey,
             SUM(l_extendedprice * (1 - l_discount)) AS r
      FROM lineitem GROUP BY l_partkey
    ),
    ranked AS (
      SELECT l_partkey, r,
             SUM(r) OVER (ORDER BY r DESC, l_partkey) /
               SUM(r) OVER () AS cum_share
      FROM rev
    )
    SELECT CASE WHEN cum_share <= 0.8 THEN 'A'
                WHEN cum_share <= 0.95 THEN 'B'
                ELSE 'C' END AS abc_class,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           ROUND(SUM(r), 2) AS revenue,
           ROUND(SUM(r) / SUM(SUM(r)) OVER (), 6) AS revenue_share
    FROM ranked
    GROUP BY CASE WHEN cum_share <= 0.8 THEN 'A'
                  WHEN cum_share <= 0.95 THEN 'B'
                  ELSE 'C' END
    """,
)
def q411_abc_classes(spark, sf_dir):
    """ABC inventory classification: parts ranked by revenue, class A
    carries the first 80% of cumulative share, B to 95%, C the tail —
    the warehouse-policy partition (count A parts daily, C parts
    yearly).  The ordered cumulative window runs over the per-part
    AGGREGATED revenue table (deterministic partkey tiebreak), and
    the class rollup reuses one grand-total window."""
    li = _t(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_partkey").agg(
        F.sum(
            F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
        ).alias("r")
    )
    wcum = Window.orderBy(F.col("r").desc(), "l_partkey").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wall = Window.partitionBy()
    ranked = rev.select(
        "r",
        (F.sum("r").over(wcum) / F.sum("r").over(wall)).alias(
            "cum_share"
        ),
    )
    cls = (
        F.when(F.col("cum_share") <= 0.8, "A")
        .when(F.col("cum_share") <= 0.95, "B")
        .otherwise("C")
    )
    per = ranked.groupBy(cls.alias("abc_class")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_parts"),
        F.round(F.sum("r"), 2).alias("revenue"),
        F.sum("r").alias("raw_r"),
    )
    return per.withColumn(
        "revenue_share",
        F.round(F.col("raw_r") / F.sum("raw_r").over(wall), 6),
    ).drop("raw_r")


@register(
    "q412_stl_lite_residuals",
    """
    WITH daily AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
             SUM(o_totalprice) AS rev
      FROM orders GROUP BY 1
    ),
    trend AS (
      SELECT day, rev,
             AVG(rev) OVER (ORDER BY day
                            ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
               AS ma7,
             dayofweek(day) AS dow
      FROM daily
    ),
    detrended AS (
      SELECT day, dow, rev, ma7, rev - ma7 AS dt FROM trend
    ),
    dow_idx AS (
      SELECT dow, AVG(dt) AS dow_effect FROM detrended GROUP BY dow
    )
    SELECT d.dow,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           ROUND(i.dow_effect, 4) AS dow_effect,
           ROUND(STDDEV_SAMP(d.dt - i.dow_effect), 4) AS resid_sd,
           ROUND(STDDEV_SAMP(d.rev), 4) AS raw_sd
    FROM detrended d JOIN dow_idx i ON d.dow = i.dow
    GROUP BY d.dow, i.dow_effect
    """,
)
def q412_stl_lite_residuals(spark, sf_dir):
    """STL-lite decomposition of daily revenue: a centered 7-day
    moving-average trend, a day-of-week seasonal index from the
    detrended series, and the residual sd that's left — how much of
    the raw volatility the two components explain (the go/no-go
    check before fitting any real forecaster).  All windows run over
    the 2,400-row daily AGGREGATE; the seasonal index joins back as a
    7-row broadcast."""
    od = _t(spark, sf_dir, "orders")
    daily = od.groupBy(
        F.to_date(F.date_trunc("DAY", "o_orderdate")).alias("day")
    ).agg(F.sum("o_totalprice").alias("rev"))
    wma = Window.orderBy("day").rowsBetween(-3, 3)
    trend = daily.select(
        "day",
        "rev",
        F.avg("rev").over(wma).alias("ma7"),
        # DuckDB dayofweek is 0=Sunday..6; Spark's is 1..7 — shift.
        (F.dayofweek("day") - F.lit(1)).cast("bigint").alias("dow"),
    )
    det = trend.withColumn("dt", F.col("rev") - F.col("ma7"))
    dow_idx = det.groupBy("dow").agg(
        F.avg("dt").alias("dow_effect")
    )
    return (
        det.join(F.broadcast(dow_idx), "dow")
        .groupBy("dow", "dow_effect")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_days"),
            F.round(
                F.stddev_samp(F.col("dt") - F.col("dow_effect")), 4
            ).alias("resid_sd"),
            F.round(F.stddev_samp("rev"), 4).alias("raw_sd"),
        )
        .select(
            "dow",
            "n_days",
            F.round("dow_effect", 4).alias("dow_effect"),
            "resid_sd",
            "raw_sd",
        )
    )


@register(
    "q413_brevity_law",
    r"""
    WITH tok AS (
      SELECT UNNEST(list_filter(
               string_split_regex(trim(lower(text)), '\s+'),
               w -> w <> '')) AS w
      FROM documents
    ),
    v AS (SELECT w, CAST(COUNT(*) AS DOUBLE) AS cnt
          FROM tok GROUP BY w),
    ranked AS (
      SELECT w, cnt, length(w) AS wlen,
             NTILE(10) OVER (ORDER BY cnt DESC, w) AS freq_decile
      FROM v
    )
    SELECT freq_decile,
           CAST(COUNT(*) AS BIGINT) AS n_types,
           CAST(SUM(cnt) AS BIGINT) AS n_tokens,
           ROUND(AVG(wlen), 6) AS avg_type_len,
           ROUND(SUM(wlen * cnt) / SUM(cnt), 6) AS avg_token_len
    FROM ranked GROUP BY freq_decile
    """,
)
def q413_brevity_law(spark, sf_dir):
    """Zipf's law of abbreviation: frequent words are shorter.  Word
    types bucketed into frequency deciles (NTILE over the aggregated
    vocab, deterministic tiebreak), then type-weighted and token-
    weighted mean lengths per decile — the monotone-ish decline is
    the compression pressure that BPE tokenizers exploit, and a
    corpus that violates it is usually machine-generated."""
    d = _t(spark, sf_dir, "documents")
    toks = F.filter(
        F.split(F.trim(F.lower(F.col("text"))), r"\s+"),
        lambda w: w != "",
    )
    v = (
        d.select(F.explode(toks).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("double").alias("cnt"))
    )
    ranked = v.select(
        "cnt",
        F.length("w").alias("wlen"),
        F.ntile(10)
        .over(Window.orderBy(F.col("cnt").desc(), "w"))
        .alias("freq_decile"),
    )
    return ranked.groupBy("freq_decile").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_types"),
        F.sum("cnt").cast("bigint").alias("n_tokens"),
        F.round(F.avg("wlen"), 6).alias("avg_type_len"),
        F.round(
            F.sum(F.col("wlen") * F.col("cnt")) / F.sum("cnt"), 6
        ).alias("avg_token_len"),
    )


@register(
    "q414_transition_timing",
    """
    WITH seq AS (
      SELECT user_id, event_type, ts,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type,
             LAG(ts) OVER (PARTITION BY user_id
                           ORDER BY ts, event_id) AS prev_ts
      FROM events
    )
    SELECT prev_type, event_type AS next_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(AVG(date_diff('second', prev_ts, ts)), 4)
             AS avg_gap_s,
           ROUND(quantile_cont(date_diff('second', prev_ts, ts),
                               0.5), 4) AS p50_gap_s
    FROM seq
    WHERE prev_type IS NOT NULL
    GROUP BY prev_type, event_type
    """,
)
def q414_transition_timing(spark, sf_dir):
    """How long each event transition takes: q175 counts prev->next
    frequencies, this adds the time dimension — mean and median
    seconds between consecutive events per (prev, next) pair, the
    dwell profile that separates considered purchases
    (view->purchase, slow) from bot paths (uniform, fast).  One
    user-partitioned ordered window, then a 25-cell rollup."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        "ts",
        F.lag("event_type").over(w).alias("prev_type"),
        F.lag("ts").over(w).alias("prev_ts"),
    ).filter(F.col("prev_type").isNotNull())
    gap = F.col("ts").cast("long") - F.col("prev_ts").cast("long")
    return seq.groupBy(
        "prev_type", F.col("event_type").alias("next_type")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.round(F.avg(gap), 4).alias("avg_gap_s"),
        F.round(F.expr(
            "percentile(CAST(ts AS LONG) - CAST(prev_ts AS LONG), 0.5)"
        ), 4).alias("p50_gap_s"),
    )


@register(
    "q397_baseline_forecast_tournament",
    """
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             COUNT(*)::DOUBLE AS x
      FROM events GROUP BY 1, 2
    ),
    j AS (
      SELECT a.event_type, a.day, a.x AS actual,
             n1.x AS naive_1d, n7.x AS naive_7d
      FROM daily a
      JOIN daily n1 ON a.event_type = n1.event_type
                   AND n1.day = a.day - 1
      JOIN daily n7 ON a.event_type = n7.event_type
                   AND n7.day = a.day - 7
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           ROUND(AVG(ABS(actual - naive_1d) / actual), 6)
             AS mape_naive_1d,
           ROUND(AVG(ABS(actual - naive_7d) / actual), 6)
             AS mape_naive_7d,
           CASE WHEN AVG(ABS(actual - naive_7d) / actual)
                     < AVG(ABS(actual - naive_1d) / actual)
                THEN 'seasonal' ELSE 'naive' END AS winner
    FROM j GROUP BY event_type
    """,
)
def q397_baseline_forecast_tournament(spark, sf_dir):
    """Baseline forecast tournament: yesterday's value vs last week's
    value as predictors of each day's volume, MAPE head-to-head per
    event type — 'seasonal' winning means weekly structure dominates
    day-to-day momentum, which decides every downstream model's
    feature set.  Two date-offset self-joins of the 30-row daily
    table."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date(F.date_trunc("DAY", "ts")).alias("day")
    ).agg(F.count(F.lit(1)).cast("double").alias("x"))
    daily = daily.localCheckpoint(eager=False)
    a = daily.select(
        "event_type", F.col("day").alias("d"), F.col("x").alias("actual")
    )
    n1 = daily.select(
        F.col("event_type").alias("et1"),
        F.col("day").alias("d1"),
        F.col("x").alias("naive_1d"),
    )
    n7 = daily.select(
        F.col("event_type").alias("et7"),
        F.col("day").alias("d7"),
        F.col("x").alias("naive_7d"),
    )
    j = (
        a.join(
            n1,
            (F.col("event_type") == F.col("et1"))
            & (F.col("d1") == F.date_sub(F.col("d"), 1)),
        )
        .join(
            n7,
            (F.col("event_type") == F.col("et7"))
            & (F.col("d7") == F.date_sub(F.col("d"), 7)),
        )
    )
    m1 = F.avg(F.abs(F.col("actual") - F.col("naive_1d")) / F.col("actual"))
    m7 = F.avg(F.abs(F.col("actual") - F.col("naive_7d")) / F.col("actual"))
    return j.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.round(m1, 6).alias("mape_naive_1d"),
        F.round(m7, 6).alias("mape_naive_7d"),
        F.when(m7 < m1, "seasonal").otherwise("naive").alias("winner"),
    )


@register(
    "q398_dormancy_gaps",
    """
    WITH g AS (
      SELECT user_id,
             epoch(ts) - epoch(LAG(ts) OVER (
               PARTITION BY user_id ORDER BY ts, event_id)) AS gap
      FROM events
    ),
    per AS (
      SELECT user_id, MAX(gap) / 86400.0 AS max_gap_days
      FROM g WHERE gap IS NOT NULL GROUP BY user_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
           ROUND(AVG(max_gap_days), 4) AS mean_max_gap_days,
           ROUND(quantile_cont(max_gap_days, 0.9), 4)
             AS p90_max_gap_days,
           ROUND(AVG(CASE WHEN max_gap_days > 14 THEN 1.0 ELSE 0.0
                     END), 6) AS share_dormant_14d
    FROM per
    """,
)
def q398_dormancy_gaps(spark, sf_dir):
    """Dormancy profile: each user's LONGEST inactivity gap, and the
    share who ever went dark 14+ days and came back — resurrection
    potential (q245 counts resurrections per day; this measures how
    deep the sleeps are).  One lag window, per-user max, one rollup."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    g = ev.select(
        "user_id",
        (
            F.unix_micros("ts") / 1e6
            - F.unix_micros(F.lag("ts").over(w)) / 1e6
        ).alias("gap"),
    ).filter(F.col("gap").isNotNull())
    per = g.groupBy("user_id").agg(
        (F.max("gap") / 86400.0).alias("max_gap_days")
    )
    return per.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.round(F.avg("max_gap_days"), 4).alias("mean_max_gap_days"),
        F.round(
            F.expr("percentile(max_gap_days, 0.9)"), 4
        ).alias("p90_max_gap_days"),
        F.round(
            F.avg(
                F.when(F.col("max_gap_days") > 14, 1.0).otherwise(0.0)
            ),
            6,
        ).alias("share_dormant_14d"),
    )


@register(
    "q395_first_order_predicts_repeat",
    """
    WITH firsts AS (
      SELECT o_custkey, o_totalprice AS first_value,
             cnt
      FROM (
        SELECT o_custkey, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate, o_orderkey)
                 AS rn,
               COUNT(*) OVER (PARTITION BY o_custkey) AS cnt
        FROM orders) t
      WHERE rn = 1
    ),
    tiled AS (
      SELECT first_value, CASE WHEN cnt > 1 THEN 1.0 ELSE 0.0 END
               AS repeated,
             NTILE(5) OVER (ORDER BY first_value, o_custkey)
               AS quintile
      FROM firsts
    )
    SELECT quintile,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           ROUND(AVG(first_value), 2) AS mean_first_value,
           ROUND(AVG(repeated), 6) AS repeat_rate
    FROM tiled GROUP BY quintile
    """,
)
def q395_first_order_predicts_repeat(spark, sf_dir):
    """Does the first order's size predict coming back?  Customers
    quintiled by first-order value against their repeat rate — the
    acquisition-quality signal available on day one.  One ranked
    window picks the first order and carries the lifetime order count
    in the same partitioning."""
    od = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        "o_orderdate", "o_orderkey"
    )
    firsts = (
        od.select(
            "o_custkey",
            F.col("o_totalprice").alias("first_value"),
            F.row_number().over(w).alias("rn"),
            F.count(F.lit(1))
            .over(Window.partitionBy("o_custkey"))
            .alias("cnt"),
        )
        .filter(F.col("rn") == 1)
    )
    wq = Window.orderBy("first_value", "o_custkey")
    tiled = firsts.select(
        "first_value",
        F.when(F.col("cnt") > 1, 1.0).otherwise(0.0).alias("repeated"),
        F.ntile(5).over(wq).alias("quintile"),
    )
    return tiled.groupBy("quintile").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.round(F.avg("first_value"), 2).alias("mean_first_value"),
        F.round(F.avg("repeated"), 6).alias("repeat_rate"),
    )


@register(
    "q396_vocab_gini",
    r"""
    WITH counts AS (
      SELECT source, term, COUNT(*)::DOUBLE AS n FROM (
        SELECT source, UNNEST(list_filter(
          string_split_regex(trim(text), '\s+'), x -> x <> '')) AS term
        FROM documents)
      GROUP BY 1, 2
    ),
    ranked AS (
      SELECT source, n,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY n, term) AS r,
             COUNT(*) OVER (PARTITION BY source) AS v
      FROM counts
    )
    SELECT source,
           CAST(MAX(v) AS BIGINT) AS vocab,
           ROUND(SUM((2.0 * r - v - 1) * n) / (MAX(v) * SUM(n)), 6)
             AS term_gini
    FROM ranked GROUP BY source
    """,
)
def q396_vocab_gini(spark, sf_dir):
    """Vocabulary concentration per source: the Gini coefficient of
    term frequencies via the sorted-rank identity (per-source rank
    windows over the vocab-sized count table) — the single-number
    companion to the q226 Zipf exponent: high Gini means a few
    function words carry the text, low means a flat specialized
    vocabulary."""
    d = _t(spark, sf_dir, "documents")
    counts = (
        d.select("source", F.explode(T.words("text")).alias("term"))
        .groupBy("source", "term")
        .agg(F.count(F.lit(1)).cast("double").alias("n"))
    )
    ws = Window.partitionBy("source")
    wr = ws.orderBy("n", "term")
    ranked = counts.select(
        "source",
        "n",
        F.row_number().over(wr).alias("r"),
        F.count(F.lit(1)).over(ws).alias("v"),
    )
    return ranked.groupBy("source").agg(
        F.max("v").cast("bigint").alias("vocab"),
        F.round(
            F.sum((2.0 * F.col("r") - F.col("v") - 1) * F.col("n"))
            / (F.max("v") * F.sum("n")),
            6,
        ).alias("term_gini"),
    )


@register(
    "q393_price_per_size",
    """
    SELECT p_type,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           ROUND(AVG(p_retailprice / p_size), 6) AS mean_price_per_size,
           ROUND(corr(p_size, p_retailprice), 6) AS size_price_corr
    FROM part WHERE p_size > 0
    GROUP BY p_type
    """,
)
def q393_price_per_size(spark, sf_dir):
    """Size-normalized pricing: retail price per size unit and the
    size-price correlation by type — near-zero correlation means the
    catalog prices by SKU identity, not physical size, which changes
    how substitution should be modeled.  One dimension scan."""
    pa = _t(spark, sf_dir, "part")
    return (
        pa.filter(F.col("p_size") > 0)
        .groupBy("p_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_parts"),
            F.round(
                F.avg(F.col("p_retailprice") / F.col("p_size")), 6
            ).alias("mean_price_per_size"),
            F.round(F.corr("p_size", "p_retailprice"), 6).alias(
                "size_price_corr"
            ),
        )
    )


@register(
    "q394_quantity_integerness",
    """
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           ROUND(AVG(CASE WHEN l_quantity = FLOOR(l_quantity)
                     THEN 1.0 ELSE 0.0 END), 6) AS integer_share,
           ROUND(AVG(CASE WHEN l_quantity <= 0 THEN 1.0 ELSE 0.0
                     END), 6) AS nonpositive_share,
           ROUND(MIN(l_quantity), 4) AS min_qty,
           ROUND(MAX(l_quantity), 4) AS max_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q394_quantity_integerness(spark, sf_dir):
    """Quantity integrity: the share of integer-valued and
    non-positive quantities per return flag — unit goods should be
    whole numbers, so fractional or zero quantities are a schema
    misuse (weights in a count column) or corruption signal.  One
    conditional scan."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        F.round(
            F.avg(
                F.when(
                    F.col("l_quantity") == F.floor("l_quantity"), 1.0
                ).otherwise(0.0)
            ),
            6,
        ).alias("integer_share"),
        F.round(
            F.avg(
                F.when(F.col("l_quantity") <= 0, 1.0).otherwise(0.0)
            ),
            6,
        ).alias("nonpositive_share"),
        F.round(F.min("l_quantity"), 4).alias("min_qty"),
        F.round(F.max("l_quantity"), 4).alias("max_qty"),
    )


@register(
    "q391_balance_vs_spend",
    """
    WITH spend AS (
      SELECT o_custkey, SUM(o_totalprice) AS s
      FROM orders GROUP BY o_custkey
    ),
    j AS (
      SELECT c.c_acctbal, COALESCE(spend.s, 0.0) AS s,
             c.c_custkey
      FROM customer c LEFT JOIN spend ON c.c_custkey = spend.o_custkey
    ),
    tiled AS (
      SELECT c_acctbal, s,
             NTILE(5) OVER (ORDER BY c_acctbal, c_custkey) AS quintile
      FROM j
    )
    SELECT quintile,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           ROUND(AVG(c_acctbal), 4) AS mean_balance,
           ROUND(AVG(s), 2) AS mean_spend,
           ROUND(AVG(CASE WHEN s = 0 THEN 1.0 ELSE 0.0 END), 6)
             AS never_ordered_rate
    FROM tiled GROUP BY quintile
    """,
)
def q391_balance_vs_spend(spark, sf_dir):
    """Account balance vs realized spend: customers quintiled by
    account balance with mean spend and the never-ordered rate per
    quintile — whether the credit signal the dimension carries
    predicts commercial behavior at all.  LEFT join keeps
    zero-spenders (dropping them is survivor bias); NTILE with key
    tiebreak."""
    cu = _t(spark, sf_dir, "customer")
    od = _t(spark, sf_dir, "orders")
    spend = od.groupBy("o_custkey").agg(
        F.sum("o_totalprice").alias("s")
    )
    j = cu.join(
        spend, cu.c_custkey == spend.o_custkey, "left"
    ).select(
        "c_acctbal",
        "c_custkey",
        F.coalesce("s", F.lit(0.0)).alias("s"),
    )
    w = Window.orderBy("c_acctbal", "c_custkey")
    tiled = j.withColumn("quintile", F.ntile(5).over(w))
    return tiled.groupBy("quintile").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.round(F.avg("c_acctbal"), 4).alias("mean_balance"),
        F.round(F.avg("s"), 2).alias("mean_spend"),
        F.round(
            F.avg(F.when(F.col("s") == 0, 1.0).otherwise(0.0)), 6
        ).alias("never_ordered_rate"),
    )


@register(
    "q392_stressed_supplier_exposure",
    """
    WITH rev AS (
      SELECT l_suppkey, SUM(l_extendedprice) AS r
      FROM lineitem GROUP BY l_suppkey
    ),
    j AS (
      SELECT s.s_suppkey, s.s_acctbal, COALESCE(rev.r, 0.0) AS r
      FROM supplier s LEFT JOIN rev ON s.s_suppkey = rev.l_suppkey
    ),
    tot AS (SELECT SUM(r) AS t FROM j)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_suppliers,
           CAST(SUM(CASE WHEN s_acctbal < 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_stressed,
           ROUND(SUM(CASE WHEN s_acctbal < 0 THEN r ELSE 0 END), 2)
             AS stressed_revenue,
           ROUND(SUM(CASE WHEN s_acctbal < 0 THEN r ELSE 0 END)
                 / (SELECT t FROM tot), 6) AS stressed_share
    FROM j
    """,
)
def q392_stressed_supplier_exposure(spark, sf_dir):
    """Financially stressed supplier exposure: suppliers with negative
    account balance, and the share of line revenue flowing through
    them — the counterparty-risk number procurement watches.  One
    revenue rollup, one dimension join, conditional shares."""
    su = _t(spark, sf_dir, "supplier")
    li = _t(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_suppkey").agg(
        F.sum("l_extendedprice").alias("r")
    )
    j = su.join(
        rev, su.s_suppkey == rev.l_suppkey, "left"
    ).select(
        "s_acctbal", F.coalesce("r", F.lit(0.0)).alias("r")
    )
    j = j.localCheckpoint(eager=False)
    tot = j.agg(F.sum("r").alias("t"))
    stressed = F.col("s_acctbal") < 0
    return j.crossJoin(F.broadcast(tot)).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_suppliers"),
        F.sum(F.when(stressed, 1).otherwise(0))
        .cast("bigint")
        .alias("n_stressed"),
        F.round(
            F.sum(F.when(stressed, F.col("r")).otherwise(0.0)), 2
        ).alias("stressed_revenue"),
        F.round(
            F.sum(F.when(stressed, F.col("r")).otherwise(0.0))
            / F.max("t"),
            6,
        ).alias("stressed_share"),
    )


@register(
    "q389_series_corr_matrix",
    """
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             COUNT(*)::DOUBLE AS x
      FROM events GROUP BY 1, 2
    )
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           ROUND(corr(a.x, b.x), 6) AS correlation
    FROM daily a JOIN daily b
      ON a.day = b.day AND a.event_type < b.event_type
    GROUP BY a.event_type, b.event_type
    """,
)
def q389_series_corr_matrix(spark, sf_dir):
    """Cross-series correlation matrix: same-day correlation of daily
    volumes between every event-type pair — co-moving series share a
    driver (traffic), anti-moving ones substitute; the q288 lead-lag
    analysis starts from whichever pairs light up here.  The pair
    join runs on the 150-row daily table."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date(F.date_trunc("DAY", "ts")).alias("day")
    ).agg(F.count(F.lit(1)).cast("double").alias("x"))
    a = daily.select(
        F.col("event_type").alias("type_a"), "day",
        F.col("x").alias("xa"),
    )
    b = daily.select(
        F.col("event_type").alias("type_b"), "day",
        F.col("x").alias("xb"),
    )
    return (
        a.join(b, "day")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_days"),
            F.round(F.corr("xa", "xb"), 6).alias("correlation"),
        )
    )


@register(
    "q390_fixed_effects_slope",
    """
    WITH p AS (
      SELECT user_id, value,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id)::DOUBLE AS k
      FROM events WHERE event_type = 'purchase'
    ),
    m AS (
      SELECT user_id, AVG(k) AS mk, AVG(value) AS mv,
             COUNT(*) AS n
      FROM p GROUP BY user_id HAVING COUNT(*) >= 3
    ),
    dm AS (
      SELECT p.k - m.mk AS dk, p.value - m.mv AS dv
      FROM p JOIN m ON p.user_id = m.user_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_obs,
           ROUND(SUM(dk * dv) / SUM(dk * dk), 6) AS within_user_slope,
           ROUND(SUM(dk * dv)
                 / SQRT(SUM(dk * dk) * SUM(dv * dv)), 6)
             AS within_corr
    FROM dm
    """,
)
def q390_fixed_effects_slope(spark, sf_dir):
    """Fixed-effects (within-user) regression: demean purchase value
    and purchase index within each user (≥3 purchases), then pool the
    OLS slope — does spend grow with the user's own experience, with
    every between-user level difference controlled away (the pooled
    q205-style OLS would confound rich users buying often).  One rank
    window, per-user means as a join, one sufficient-statistics
    aggregate."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "value",
        F.row_number().over(w).cast("double").alias("k"),
    )
    p = p.localCheckpoint(eager=False)
    m = (
        p.groupBy("user_id")
        .agg(
            F.avg("k").alias("mk"),
            F.avg("value").alias("mv"),
            F.count(F.lit(1)).alias("n"),
        )
        .filter(F.col("n") >= 3)
    )
    dm = p.join(m, "user_id").select(
        (F.col("k") - F.col("mk")).alias("dk"),
        (F.col("value") - F.col("mv")).alias("dv"),
    )
    return dm.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_obs"),
        F.round(
            F.sum(F.col("dk") * F.col("dv"))
            / F.sum(F.col("dk") * F.col("dk")),
            6,
        ).alias("within_user_slope"),
        F.round(
            F.sum(F.col("dk") * F.col("dv"))
            / F.sqrt(
                F.sum(F.col("dk") * F.col("dk"))
                * F.sum(F.col("dv") * F.col("dv"))
            ),
            6,
        ).alias("within_corr"),
    )


@register(
    "q387_longest_type_runs",
    """
    WITH runs AS (
      SELECT user_id, event_type,
             SUM(brk) OVER (PARTITION BY user_id
                            ORDER BY ts_ord
                            ROWS UNBOUNDED PRECEDING) AS run_id
      FROM (SELECT user_id, event_type, brk,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id)
                     AS ts_ord,
                   ts, event_id
            FROM (SELECT user_id, event_type, ts, event_id,
                         CASE WHEN LAG(event_type) OVER (
                                PARTITION BY user_id
                                ORDER BY ts, event_id) = event_type
                              THEN 0 ELSE 1 END AS brk
                  FROM events) t) t2
    ),
    run_len AS (
      SELECT user_id, event_type, run_id, COUNT(*) AS len
      FROM runs GROUP BY user_id, event_type, run_id
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_runs,
           CAST(MAX(len) AS BIGINT) AS longest_run,
           ROUND(AVG(len), 6) AS mean_run_len
    FROM run_len GROUP BY event_type
    """,
)
def q387_longest_type_runs(spark, sf_dir):
    """Same-event-type run lengths per user (gaps-and-islands on the
    type sequence): long unbroken runs of one type are either habits
    or a stuck client re-firing — the run-length view that q348's
    60-second window can't see.  One break-flag lag plus one
    cumulative-sum window over the same per-user sort, then run
    aggregation."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = ev.select(
        "user_id",
        "event_type",
        F.when(
            F.lag("event_type").over(w) == F.col("event_type"), 0
        )
        .otherwise(1)
        .alias("brk"),
        F.row_number().over(w).alias("ts_ord"),
    )
    wc = Window.partitionBy("user_id").orderBy("ts_ord").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    runs = marked.withColumn("run_id", F.sum("brk").over(wc))
    run_len = runs.groupBy("user_id", "event_type", "run_id").agg(
        F.count(F.lit(1)).alias("len")
    )
    return run_len.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_runs"),
        F.max("len").cast("bigint").alias("longest_run"),
        F.round(F.avg("len"), 6).alias("mean_run_len"),
    )


@register(
    "q388_discount_return_odds",
    """
    WITH t AS (
      SELECT CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END AS disc,
             CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS ret
      FROM lineitem
    ),
    cells AS (
      SELECT SUM(CASE WHEN disc = 1 AND ret = 1 THEN 1 ELSE 0
                 END)::DOUBLE AS a,
             SUM(CASE WHEN disc = 1 AND ret = 0 THEN 1 ELSE 0
                 END)::DOUBLE AS b,
             SUM(CASE WHEN disc = 0 AND ret = 1 THEN 1 ELSE 0
                 END)::DOUBLE AS c,
             SUM(CASE WHEN disc = 0 AND ret = 0 THEN 1 ELSE 0
                 END)::DOUBLE AS d
      FROM t
    )
    SELECT CAST(a AS BIGINT) AS disc_returned,
           CAST(b AS BIGINT) AS disc_kept,
           CAST(c AS BIGINT) AS full_returned,
           CAST(d AS BIGINT) AS full_kept,
           ROUND((a * d) / (b * c), 6) AS odds_ratio,
           ROUND(sqrt(1/a + 1/b + 1/c + 1/d), 6) AS log_or_se
    FROM cells
    """,
)
def q388_discount_return_odds(spark, sf_dir):
    """Discount × return 2×2: the odds ratio of deeply discounted
    lines being returned, with the Woolf standard error of the
    log-odds — OR ≈ 1 within ±2·SE means discounting does not move
    returns (sanity for 'discounted goods are worse' folklore).  One
    conditional-cell aggregate."""
    li = _t(spark, sf_dir, "lineitem")
    disc = F.when(F.col("l_discount") > 0.05, 1).otherwise(0)
    ret = F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
    t = li.select(disc.alias("disc"), ret.alias("ret"))
    cells = t.agg(
        F.sum(
            F.when((F.col("disc") == 1) & (F.col("ret") == 1), 1)
            .otherwise(0)
        )
        .cast("double")
        .alias("a"),
        F.sum(
            F.when((F.col("disc") == 1) & (F.col("ret") == 0), 1)
            .otherwise(0)
        )
        .cast("double")
        .alias("b"),
        F.sum(
            F.when((F.col("disc") == 0) & (F.col("ret") == 1), 1)
            .otherwise(0)
        )
        .cast("double")
        .alias("c"),
        F.sum(
            F.when((F.col("disc") == 0) & (F.col("ret") == 0), 1)
            .otherwise(0)
        )
        .cast("double")
        .alias("d"),
    )
    return cells.select(
        F.col("a").cast("bigint").alias("disc_returned"),
        F.col("b").cast("bigint").alias("disc_kept"),
        F.col("c").cast("bigint").alias("full_returned"),
        F.col("d").cast("bigint").alias("full_kept"),
        F.round(
            (F.col("a") * F.col("d")) / (F.col("b") * F.col("c")), 6
        ).alias("odds_ratio"),
        F.round(
            F.sqrt(
                1 / F.col("a")
                + 1 / F.col("b")
                + 1 / F.col("c")
                + 1 / F.col("d")
            ),
            6,
        ).alias("log_or_se"),
    )


@register(
    "q385_class_separation",
    """
    WITH ev AS (
      SELECT vec_id, label, i, v FROM (
        SELECT vec_id, label, embedding::DOUBLE[] AS emb
        FROM embeddings),
        LATERAL (SELECT UNNEST(range(1, 65)) AS i, UNNEST(emb) AS v)
    ),
    cent AS (
      SELECT label, i, AVG(v) AS c FROM ev GROUP BY label, i
    ),
    within AS (
      SELECT SQRT(SUM(POWER(ev.v - cent.c, 2))) AS d
      FROM ev JOIN cent ON ev.label = cent.label AND ev.i = cent.i
      GROUP BY ev.vec_id
    ),
    between_ AS (
      SELECT SQRT(SUM(POWER(a.c - b.c, 2))) AS d
      FROM cent a JOIN cent b
        ON a.i = b.i AND a.label < b.label
      GROUP BY a.label, b.label
    )
    SELECT ROUND((SELECT AVG(d) FROM within), 6) AS mean_within,
           ROUND((SELECT AVG(d) FROM between_), 6) AS mean_between,
           ROUND((SELECT AVG(d) FROM between_)
                 / (SELECT AVG(d) FROM within), 6)
             AS separation_ratio
    """,
)
def q385_class_separation(spark, sf_dir):
    """Class separability of the embedding space: mean
    between-centroid distance over mean point-to-own-centroid
    distance — below ~1 the labels are not linearly clusterable and
    any centroid-based ANN routing (q49 IVF) will mix classes.
    Centroids come from one grouped mean over the unnested
    (label, dim) table; both distance pools are centroid-sized."""
    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id", "label", V.as_double("embedding").alias("v")
    )
    ev = e.select(
        "vec_id", "label", F.posexplode("v").alias("i0", "val")
    ).select("vec_id", "label", (F.col("i0") + 1).alias("i"), "val")
    cent = ev.groupBy("label", "i").agg(F.avg("val").alias("c"))
    cent = cent.localCheckpoint(eager=False)
    within = (
        ev.join(F.broadcast(cent), ["label", "i"])
        .groupBy("vec_id")
        .agg(
            F.sqrt(
                F.sum(F.pow(F.col("val") - F.col("c"), 2))
            ).alias("d")
        )
        .agg(F.avg("d").alias("mean_within"))
    )
    a = cent.select(
        F.col("label").alias("la"), "i", F.col("c").alias("ca")
    )
    b = cent.select(
        F.col("label").alias("lb"), "i", F.col("c").alias("cb")
    )
    between = (
        a.join(b, "i")
        .filter(F.col("la") < F.col("lb"))
        .groupBy("la", "lb")
        .agg(
            F.sqrt(
                F.sum(F.pow(F.col("ca") - F.col("cb"), 2))
            ).alias("d")
        )
        .agg(F.avg("d").alias("mean_between"))
    )
    return within.crossJoin(F.broadcast(between)).select(
        F.round("mean_within", 6).alias("mean_within"),
        F.round("mean_between", 6).alias("mean_between"),
        F.round(
            F.col("mean_between") / F.col("mean_within"), 6
        ).alias("separation_ratio"),
    )


@register(
    "q386_dominant_term_docs",
    r"""
    WITH tf AS (
      SELECT doc_id, term, COUNT(*)::DOUBLE AS n FROM (
        SELECT doc_id, UNNEST(list_filter(
          string_split_regex(trim(text), '\s+'), x -> x <> '')) AS term
        FROM documents)
      GROUP BY 1, 2
    ),
    per AS (
      SELECT doc_id, MAX(n) / SUM(n) AS top_share
      FROM tf GROUP BY doc_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(AVG(top_share), 6) AS mean_top_share,
           CAST(SUM(CASE WHEN top_share > 0.2 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_dominated,
           ROUND(AVG(CASE WHEN top_share > 0.2 THEN 1.0 ELSE 0.0
                     END), 6) AS dominated_rate
    FROM per
    """,
)
def q386_dominant_term_docs(spark, sf_dir):
    """Dominant-term detector: documents where one token carries more
    than 20% of all tokens — keyword-stuffed spam and broken
    templates, at the TERM level where q127's character-repetition
    gate is blind.  Per-doc MAX/SUM over the term-frequency table,
    one rollup."""
    d = _t(spark, sf_dir, "documents")
    tf = (
        d.select("doc_id", F.explode(T.words("text")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("double").alias("n"))
    )
    per = tf.groupBy("doc_id").agg(
        (F.max("n") / F.sum("n")).alias("top_share")
    )
    return per.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.round(F.avg("top_share"), 6).alias("mean_top_share"),
        F.sum(F.when(F.col("top_share") > 0.2, 1).otherwise(0))
        .cast("bigint")
        .alias("n_dominated"),
        F.round(
            F.avg(
                F.when(F.col("top_share") > 0.2, 1.0).otherwise(0.0)
            ),
            6,
        ).alias("dominated_rate"),
    )


@register(
    "q383_adjacent_doc_overlap",
    r"""
    WITH ws AS (
      SELECT doc_id, list_distinct(list_filter(
        string_split_regex(trim(text), '\s+'), x -> x <> '')) AS w
      FROM documents
    ),
    pairs AS (
      SELECT a.doc_id,
             len(list_intersect(a.w, b.w))::DOUBLE AS inter,
             len(a.w) + len(b.w)
               - len(list_intersect(a.w, b.w)) AS uni
      FROM ws a JOIN ws b ON b.doc_id = a.doc_id + 1
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
           ROUND(AVG(inter / uni), 6) AS mean_adjacent_jaccard,
           CAST(SUM(CASE WHEN inter / uni >= 0.5 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_high_overlap
    FROM pairs
    """,
)
def q383_adjacent_doc_overlap(spark, sf_dir):
    """Ingest-stream redundancy: word-set Jaccard between each pair
    of ADJACENT documents (doc_id, doc_id+1) — crawl near-duplicates
    cluster in arrival order, so high adjacent overlap is the cheapest
    early warning that the frontier is stuck on one site.  A band-1
    self-join on the id (equi join on doc_id+1), set ops on the
    per-row token arrays."""
    d = _t(spark, sf_dir, "documents")
    ws = d.select(
        "doc_id", F.array_distinct(T.words("text")).alias("w")
    )
    a = ws.select(
        F.col("doc_id"), F.col("w").alias("wa"),
        (F.col("doc_id") + 1).alias("nxt"),
    )
    b = ws.select(
        F.col("doc_id").alias("nxt"), F.col("w").alias("wb")
    )
    inter = F.size(F.array_intersect("wa", "wb")).cast("double")
    uni = (
        F.size("wa") + F.size("wb")
        - F.size(F.array_intersect("wa", "wb"))
    )
    pairs = a.join(b, "nxt").select(
        (inter / uni).alias("j")
    )
    return pairs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.round(F.avg("j"), 6).alias("mean_adjacent_jaccard"),
        F.sum(F.when(F.col("j") >= 0.5, 1).otherwise(0))
        .cast("bigint")
        .alias("n_high_overlap"),
    )


@register(
    "q384_round_number_affinity",
    """
    WITH v AS (
      SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(AVG(CASE WHEN cents % 100 = 0 THEN 1.0 ELSE 0.0
                     END), 6) AS share_whole_dollar,
           ROUND(AVG(CASE WHEN cents % 100 = 99 THEN 1.0 ELSE 0.0
                     END), 6) AS share_99_cents,
           ROUND(AVG(CASE WHEN cents % 50 = 0 THEN 1.0 ELSE 0.0
                     END), 6) AS share_half_dollar,
           ROUND(AVG(CASE WHEN cents % 1000 = 0 THEN 1.0 ELSE 0.0
                     END), 6) AS share_ten_dollar
    FROM v
    """,
)
def q384_round_number_affinity(spark, sf_dir):
    """Round-number affinity of order totals: shares at whole-dollar,
    .99, half-dollar, and ten-dollar points — organic totals from
    summed line items land on round numbers at roughly chance rates,
    so excess affinity flags price-point psychology upstream or
    fabricated/defaulted data (the forensic complement of q174's
    Benford first-digit test).  Integer-cents modular arithmetic in
    one scan."""
    od = _t(spark, sf_dir, "orders")
    v = od.select(
        F.round(F.col("o_totalprice") * 100)
        .cast("bigint")
        .alias("cents")
    )

    def share(mod, rem):
        return F.round(
            F.avg(
                F.when(F.col("cents") % mod == rem, 1.0).otherwise(0.0)
            ),
            6,
        )

    return v.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        share(100, 0).alias("share_whole_dollar"),
        share(100, 99).alias("share_99_cents"),
        share(50, 0).alias("share_half_dollar"),
        share(1000, 0).alias("share_ten_dollar"),
    )


@register(
    "q381_brand_switching",
    """
    WITH order_brand AS (
      SELECT o.o_custkey, o.o_orderkey, o.o_orderdate,
             MIN(p.p_brand) AS brand
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY o.o_custkey, o.o_orderkey, o.o_orderdate
      HAVING COUNT(DISTINCT p.p_brand) = 1
    ),
    seq AS (
      SELECT brand,
             LAG(brand) OVER (PARTITION BY o_custkey
                              ORDER BY o_orderdate, o_orderkey)
               AS prev_brand
      FROM order_brand
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_transitions,
           CAST(SUM(CASE WHEN brand = prev_brand THEN 1 ELSE 0 END)
                AS BIGINT) AS n_stayed,
           ROUND(AVG(CASE WHEN brand = prev_brand THEN 1.0 ELSE 0.0
                     END), 6) AS stay_rate
    FROM seq WHERE prev_brand IS NOT NULL
    """,
)
def q381_brand_switching(spark, sf_dir):
    """Brand switching on single-brand orders: among a customer's
    consecutive single-brand orders, how often does the next order
    stay with the same brand — the behavioral loyalty rate (q372
    measures SHARE of lines; this measures PERSISTENCE across
    purchases).  Orders mixing brands are excluded so 'the order's
    brand' is well-defined; one lag window per customer."""
    li = _t(spark, sf_dir, "lineitem")
    od = _t(spark, sf_dir, "orders")
    pa = _t(spark, sf_dir, "part")
    ob = (
        li.join(
            F.broadcast(
                od.select("o_orderkey", "o_custkey", "o_orderdate")
            ),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(pa.select("p_partkey", "p_brand")),
            li.l_partkey == F.col("p_partkey"),
        )
        .groupBy("o_custkey", "o_orderkey", "o_orderdate")
        .agg(
            F.min("p_brand").alias("brand"),
            F.count_distinct("p_brand").alias("nb"),
        )
        .filter(F.col("nb") == 1)
    )
    w = Window.partitionBy("o_custkey").orderBy(
        "o_orderdate", "o_orderkey"
    )
    seq = ob.select(
        "brand", F.lag("brand").over(w).alias("prev_brand")
    ).filter(F.col("prev_brand").isNotNull())
    stay = F.when(F.col("brand") == F.col("prev_brand"), 1).otherwise(0)
    return seq.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_transitions"),
        F.sum(stay).cast("bigint").alias("n_stayed"),
        F.round(
            F.avg(stay.cast("double")), 6
        ).alias("stay_rate"),
    )


@register(
    "q382_hapax_rate",
    r"""
    WITH toks AS (
      SELECT source, UNNEST(list_filter(
        string_split_regex(trim(text), '\s+'), x -> x <> '')) AS term
      FROM documents
    ),
    counts AS (
      SELECT source, term, COUNT(*) AS n FROM toks GROUP BY 1, 2
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS vocab,
           CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS hapax,
           ROUND(AVG(CASE WHEN n = 1 THEN 1.0 ELSE 0.0 END), 6)
             AS hapax_rate
    FROM counts GROUP BY source
    """,
)
def q382_hapax_rate(spark, sf_dir):
    """Hapax legomena rate per source: the share of vocabulary
    appearing exactly once — high hapax rates mean open vocabulary
    (names, codes, noise) where stemming/normalization pays; low
    rates mean closed templated text.  Two cascaded hash aggs on the
    (source, term) key."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "source", F.explode(T.words("text")).alias("term")
    )
    counts = toks.groupBy("source", "term").agg(
        F.count(F.lit(1)).alias("n")
    )
    return counts.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("vocab"),
        F.sum(F.when(F.col("n") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("hapax"),
        F.round(
            F.avg(F.when(F.col("n") == 1, 1.0).otherwise(0.0)), 6
        ).alias("hapax_rate"),
    )


@register(
    "q379_returns_by_leadtime",
    """
    WITH lt AS (
      SELECT CASE WHEN date_diff('day', CAST(o.o_orderdate AS DATE),
                                 CAST(l.l_shipdate AS DATE)) < 30
                  THEN '0_fast'
                  WHEN date_diff('day', CAST(o.o_orderdate AS DATE),
                                 CAST(l.l_shipdate AS DATE)) < 90
                  THEN '1_medium'
                  ELSE '2_slow' END AS lead_band,
             CASE WHEN l.l_returnflag = 'R' THEN 1.0 ELSE 0.0 END
               AS returned
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE l.l_shipdate >= o.o_orderdate
    ),
    g AS (SELECT AVG(returned) AS grate FROM lt)
    SELECT lead_band,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           ROUND(AVG(returned), 6) AS return_rate,
           ROUND(AVG(returned) - (SELECT grate FROM g), 6)
             AS vs_global
    FROM lt GROUP BY lead_band
    """,
)
def q379_returns_by_leadtime(spark, sf_dir):
    """Do slow shipments come back?  Return rate by order-to-ship
    lead-time band against the global rate — the logistics-quality
    cross-metric that connects q285's lead times to q338's returns.
    One fact join, one conditional agg, global rate broadcast."""
    li = _t(spark, sf_dir, "lineitem")
    od = _t(spark, sf_dir, "orders")
    days = F.datediff(
        F.to_date("l_shipdate"), F.to_date("o_orderdate")
    )
    lt = (
        li.join(
            F.broadcast(od.select("o_orderkey", "o_orderdate")),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .filter(F.col("l_shipdate") >= F.col("o_orderdate"))
        .select(
            F.when(days < 30, "0_fast")
            .when(days < 90, "1_medium")
            .otherwise("2_slow")
            .alias("lead_band"),
            F.when(F.col("l_returnflag") == "R", 1.0)
            .otherwise(0.0)
            .alias("returned"),
        )
    )
    lt = lt.localCheckpoint(eager=False)
    g = lt.agg(F.avg("returned").alias("grate"))
    return (
        lt.groupBy("lead_band")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
            F.round(F.avg("returned"), 6).alias("return_rate"),
            F.avg("returned").alias("_r"),
        )
        .crossJoin(F.broadcast(g))
        .select(
            "lead_band",
            "n_lines",
            "return_rate",
            F.round(F.col("_r") - F.col("grate"), 6).alias(
                "vs_global"
            ),
        )
    )


@register(
    "q380_lsh_autotune",
    """
    WITH sh AS (
      SELECT doc_id, list_distinct(list_transform(
               range(1, GREATEST(length(text) - 2, 0) + 1),
               i -> substr(text, i, 3))) AS grams
      FROM documents WHERE doc_id < 100
    ),
    inv AS (SELECT doc_id, UNNEST(grams) AS g FROM sh),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
      FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT ROUND(CAST(i AS DOUBLE) /
                   (len(sa.grams) + len(sb.grams) - i), 6) AS s
      FROM inter
      JOIN sh sa ON sa.doc_id = id_a
      JOIN sh sb ON sb.doc_id = id_b
      WHERE CAST(i AS DOUBLE) / (len(sa.grams) + len(sb.grams) - i)
            >= 0.5
    ),
    grid AS (
      SELECT b, r FROM (SELECT UNNEST([4, 8, 16, 32]) AS b),
                       (SELECT UNNEST([2, 4, 8]) AS r)
    ),
    scored AS (
      SELECT grid.b, grid.r, grid.b * grid.r AS n_hashes,
             AVG(1.0 - POWER(1.0 - POWER(pairs.s, grid.r), grid.b))
               AS recall
      FROM grid CROSS JOIN pairs
      GROUP BY grid.b, grid.r
    )
    SELECT b, r, CAST(n_hashes AS BIGINT) AS n_hashes,
           ROUND(recall, 6) AS expected_recall
    FROM scored
    WHERE recall >= 0.9
    ORDER BY n_hashes ASC, ROUND(recall, 6) DESC, b ASC
    LIMIT 5
    """,
)
def q380_lsh_autotune(spark, sf_dir):
    """LSH auto-tuner: evaluate every (bands, rows) configuration of
    the q269 planner grid against the MEASURED ≥0.5-Jaccard pair
    distribution (the q274 expected-recall integral per config), keep
    configs reaching 90% expected recall, and return the 5 cheapest by
    signature length — parameters chosen by the data, not by rule of
    thumb.  One inverted-index pair pass; the 12-config grid rides a
    broadcast cross join over the pair similarities."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    pairs = D.ngram_jaccard_pairs(
        d, "doc_id", "text", n=3, threshold=0.5, max_df=1000
    ).select(F.col("jaccard").alias("s"))
    pairs = pairs.localCheckpoint(eager=False)
    grid = (
        spark.range(1)
        .select(
            F.explode(
                F.array(*[F.lit(x) for x in (4, 8, 16, 32)])
            ).alias("b")
        )
        .select(
            "b",
            F.explode(F.array(*[F.lit(x) for x in (2, 4, 8)])).alias(
                "r"
            ),
        )
    )
    scored = (
        F.broadcast(grid)
        .crossJoin(pairs)
        .groupBy("b", "r")
        .agg(
            F.avg(
                1.0
                - F.pow(
                    1.0 - F.pow(F.col("s"), F.col("r")), F.col("b")
                )
            ).alias("recall")
        )
        .select(
            "b",
            "r",
            (F.col("b") * F.col("r")).cast("bigint").alias("n_hashes"),
            "recall",
        )
    )
    return (
        scored.filter(F.col("recall") >= 0.9)
        .orderBy(
            F.col("n_hashes").asc(),
            F.round("recall", 6).desc(),
            F.col("b").asc(),
        )
        .limit(5)
        .select(
            "b",
            "r",
            "n_hashes",
            F.round("recall", 6).alias("expected_recall"),
        )
    )


@register(
    "q377_dedup_aware_sample",
    """
    WITH fp AS (
      SELECT doc_id, source, md5(text) AS f,
             ('0x' || substr(md5('draw_' || doc_id::VARCHAR), 1, 12))
               ::BIGINT / 281474976710656.0 AS u
      FROM documents
    ),
    copies AS (
      SELECT f, COUNT(*)::DOUBLE AS c FROM fp GROUP BY f
    ),
    tagged AS (
      SELECT fp.source, fp.u, copies.c,
             CASE WHEN fp.u < 1.0 / copies.c THEN 1 ELSE 0 END AS kept
      FROM fp JOIN copies ON fp.f = copies.f
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_raw,
           CAST(SUM(kept) AS BIGINT) AS n_kept,
           ROUND(AVG(kept::DOUBLE), 6) AS keep_rate
    FROM tagged GROUP BY source
    """,
)
def q377_dedup_aware_sample(spark, sf_dir):
    """Dedup-aware sampling: each document survives with probability
    1/copies (copies = exact-duplicate multiplicity), so every
    DISTINCT text contributes one expected survivor however many
    clones it has — the sampler that kills duplication bias without a
    join against a dedup table at read time.  The draw is a
    deterministic md5 uniform per doc (reproducible, oracle-exact);
    multiplicity folds in by fingerprint join."""
    d = _t(spark, sf_dir, "documents")
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("draw_"), F.col("doc_id").cast("string")
                    )
                ),
                1,
                12,
            ),
            16,
            10,
        ).cast("double")
        / 281474976710656.0
    )
    fp = d.select(
        "source", F.md5("text").alias("f"), u.alias("u")
    )
    copies = fp.groupBy("f").agg(
        F.count(F.lit(1)).cast("double").alias("c")
    )
    tagged = fp.join(copies, "f").select(
        "source",
        F.when(F.col("u") < 1.0 / F.col("c"), 1)
        .otherwise(0)
        .alias("kept"),
    )
    return tagged.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_raw"),
        F.sum("kept").cast("bigint").alias("n_kept"),
        F.round(
            F.avg(F.col("kept").cast("double")), 6
        ).alias("keep_rate"),
    )


@register(
    "q378_closure_by_degree",
    """
    WITH und AS (
      SELECT DISTINCT LEAST(l_orderkey % 2000, l_partkey % 2000) AS a,
                      GREATEST(l_orderkey % 2000, l_partkey % 2000) AS b
      FROM lineitem
      WHERE l_orderkey % 2000 <> l_partkey % 2000 AND l_quantity <= 5
    ),
    sym AS (SELECT a AS id, b AS nbr FROM und
            UNION ALL SELECT b, a FROM und),
    deg AS (SELECT id, COUNT(*) AS deg FROM sym GROUP BY id),
    wedges AS (
      SELECT l.id AS u, r.nbr AS w,
             LEAST(du.deg, dw.deg) AS min_deg,
             CASE WHEN EXISTS (SELECT 1 FROM und
                               WHERE und.a = LEAST(l.id, r.nbr)
                                 AND und.b = GREATEST(l.id, r.nbr))
                  THEN 1 ELSE 0 END AS closed
      FROM sym l JOIN sym r ON l.nbr = r.id AND l.id < r.nbr
      JOIN deg du ON du.id = l.id
      JOIN deg dw ON dw.id = r.nbr
    )
    SELECT CAST(LEAST(length(bin(min_deg)) - 1, 6) AS BIGINT)
             AS degree_band,
           CAST(COUNT(*) AS BIGINT) AS n_wedges,
           ROUND(AVG(closed::DOUBLE), 6) AS closure_rate
    FROM wedges GROUP BY 1
    """,
)
def q378_closure_by_degree(spark, sf_dir):
    """Wedge closure rate by endpoint-degree band: does triangle
    closure concentrate among low- or high-degree endpoint pairs —
    the degree-resolved view of q273's single global clustering
    coefficient (hierarchical graphs close low-degree wedges far more
    often).  The wedge join carries both endpoint degrees; closure is
    one semi-join flag; exact bit-length log₂ bands cap at 6."""
    li = _t(spark, sf_dir, "lineitem")
    und = (
        li.filter(F.col("l_quantity") <= 5)
        .select(
            F.least(
                F.col("l_orderkey") % 2000, F.col("l_partkey") % 2000
            ).alias("a"),
            F.greatest(
                F.col("l_orderkey") % 2000, F.col("l_partkey") % 2000
            ).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    sym = und.select(F.col("a").alias("id"), F.col("b").alias("nbr")).unionByName(
        und.select(F.col("b").alias("id"), F.col("a").alias("nbr"))
    )
    deg = sym.groupBy("id").agg(F.count(F.lit(1)).alias("deg"))
    l, r = sym.alias("l"), sym.alias("r")
    wedges = (
        l.join(r, (F.col("l.nbr") == F.col("r.id"))
               & (F.col("l.id") < F.col("r.nbr")))
        .select(F.col("l.id").alias("u"), F.col("r.nbr").alias("w"))
        .join(deg.select(F.col("id").alias("u"),
                         F.col("deg").alias("du")), "u")
        .join(deg.select(F.col("id").alias("w"),
                         F.col("deg").alias("dw")), "w")
    )
    closed = (
        wedges.join(
            und.select(F.col("a").alias("u"), F.col("b").alias("w")),
            ["u", "w"],
            "left_semi",
        )
        .withColumn("closed", F.lit(1))
    )
    open_ = wedges.join(
        und.select(F.col("a").alias("u"), F.col("b").alias("w")),
        ["u", "w"],
        "left_anti",
    ).withColumn("closed", F.lit(0))
    allw = closed.unionByName(open_)
    # exact log2 band via bit length — floor(ln d / ln 2) can flip
    # at powers of two on a last-ulp libm difference (the q232 lesson)
    band = F.least(
        F.length(F.bin(F.least("du", "dw"))) - 1, F.lit(6)
    ).cast("bigint")
    return allw.groupBy(band.alias("degree_band")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_wedges"),
        F.round(
            F.avg(F.col("closed").cast("double")), 6
        ).alias("closure_rate"),
    )


@register(
    "q375_new_vs_returning_revenue",
    """
    WITH firsts AS (
      SELECT user_id,
             CAST(MIN(date_trunc('day', ts)) AS DATE) AS first_day
      FROM events GROUP BY user_id
    ),
    daily AS (
      SELECT CAST(date_trunc('day', e.ts) AS DATE) AS day,
             CASE WHEN CAST(date_trunc('day', e.ts) AS DATE)
                       = f.first_day
                  THEN 'new' ELSE 'returning' END AS cohort,
             SUM(e.value) AS rev
      FROM events e JOIN firsts f ON e.user_id = f.user_id
      WHERE e.event_type = 'purchase'
      GROUP BY 1, 2
    )
    SELECT day,
           ROUND(SUM(CASE WHEN cohort = 'new' THEN rev ELSE 0 END), 4)
             AS new_revenue,
           ROUND(SUM(CASE WHEN cohort = 'returning' THEN rev
                     ELSE 0 END), 4) AS returning_revenue,
           ROUND(SUM(CASE WHEN cohort = 'new' THEN rev ELSE 0 END)
                 / SUM(rev), 6) AS new_share
    FROM daily GROUP BY day
    """,
)
def q375_new_vs_returning_revenue(spark, sf_dir):
    """Daily revenue split new vs returning: purchases on a user's
    very first active day count as acquisition revenue, everything
    after as retention revenue — the mix whose drift tells you whether
    growth is buying customers or keeping them.  One first-day join,
    one conditional pivot per day."""
    ev = _t(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.to_date(F.min(F.date_trunc("DAY", "ts"))).alias("first_day")
    )
    daily = (
        ev.filter(F.col("event_type") == "purchase")
        .join(firsts, "user_id")
        .groupBy(
            F.to_date(F.date_trunc("DAY", "ts")).alias("day"),
            F.when(
                F.to_date(F.date_trunc("DAY", "ts"))
                == F.col("first_day"),
                "new",
            )
            .otherwise("returning")
            .alias("cohort"),
        )
        .agg(F.sum("value").alias("rev"))
    )
    return daily.groupBy("day").agg(
        F.round(
            F.sum(
                F.when(F.col("cohort") == "new", F.col("rev")).otherwise(
                    0.0
                )
            ),
            4,
        ).alias("new_revenue"),
        F.round(
            F.sum(
                F.when(
                    F.col("cohort") == "returning", F.col("rev")
                ).otherwise(0.0)
            ),
            4,
        ).alias("returning_revenue"),
        F.round(
            F.sum(
                F.when(F.col("cohort") == "new", F.col("rev")).otherwise(
                    0.0
                )
            )
            / F.sum("rev"),
            6,
        ).alias("new_share"),
    )


@register(
    "q376_discount_exposure",
    """
    SELECT CASE WHEN l_discount = 0 THEN '0_none'
                WHEN l_discount <= 0.05 THEN '1_light'
                ELSE '2_deep' END AS discount_band,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)
             AS net_revenue,
           ROUND(SUM(l_extendedprice * l_discount), 2)
             AS discount_given,
           ROUND(SUM(l_extendedprice * (1 - l_discount))
                 / SUM(SUM(l_extendedprice * (1 - l_discount)))
                   OVER (), 6) AS revenue_share
    FROM lineitem
    GROUP BY CASE WHEN l_discount = 0 THEN '0_none'
                  WHEN l_discount <= 0.05 THEN '1_light'
                  ELSE '2_deep' END
    """,
)
def q376_discount_exposure(spark, sf_dir):
    """Discount exposure: net revenue and the money given away per
    discount band (none / ≤5% / deep), with each band's share of net
    revenue — the margin-leakage one-pager.  One conditional groupBy;
    the share normalizer is a window SUM over the 3-row aggregate."""
    li = _t(spark, sf_dir, "lineitem")
    band = (
        F.when(F.col("l_discount") == 0, "0_none")
        .when(F.col("l_discount") <= 0.05, "1_light")
        .otherwise("2_deep")
    )
    net = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    agg = li.groupBy(band.alias("discount_band")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        F.round(net, 2).alias("net_revenue"),
        F.round(
            F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2
        ).alias("discount_given"),
        net.alias("_net_raw"),
    )
    w = Window.partitionBy()
    return agg.select(
        "discount_band",
        "n_lines",
        "net_revenue",
        "discount_given",
        F.round(
            F.col("_net_raw") / F.sum("_net_raw").over(w), 6
        ).alias("revenue_share"),
    )


@register(
    "q373_cross_shop_curve",
    """
    WITH breadth AS (
      SELECT o.o_custkey,
             COUNT(DISTINCT p.p_type) AS n_types,
             SUM(l.l_extendedprice) AS revenue
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY o.o_custkey
    )
    SELECT n_types,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           ROUND(AVG(revenue), 2) AS avg_revenue
    FROM breadth GROUP BY n_types
    """,
)
def q373_cross_shop_curve(spark, sf_dir):
    """Cross-shop value curve: customers bucketed by how many product
    types they buy, with average revenue per bucket — the
    'omni-category customers are worth more' curve that justifies
    cross-sell programs (or not).  One grouped distinct-count per
    customer after broadcast dimension hops."""
    li = _t(spark, sf_dir, "lineitem")
    od = _t(spark, sf_dir, "orders")
    pa = _t(spark, sf_dir, "part")
    breadth = (
        li.join(
            F.broadcast(od.select("o_orderkey", "o_custkey")),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(pa.select("p_partkey", "p_type")),
            li.l_partkey == F.col("p_partkey"),
        )
        .groupBy("o_custkey")
        .agg(
            F.count_distinct("p_type").alias("n_types"),
            F.sum("l_extendedprice").alias("revenue"),
        )
    )
    return breadth.groupBy("n_types").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.round(F.avg("revenue"), 2).alias("avg_revenue"),
    )


@register(
    "q374_basket_size_value_corr",
    """
    WITH per_order AS (
      SELECT l_orderkey,
             COUNT(*)::DOUBLE AS n_lines,
             AVG(l_extendedprice) AS avg_line_value,
             SUM(l_extendedprice) AS order_value
      FROM lineitem GROUP BY l_orderkey
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(corr(n_lines, avg_line_value), 6)
             AS corr_lines_linevalue,
           ROUND(corr(n_lines, order_value), 6)
             AS corr_lines_ordervalue,
           ROUND(AVG(n_lines), 4) AS mean_lines
    FROM per_order
    """,
)
def q374_basket_size_value_corr(spark, sf_dir):
    """Basket composition: does adding lines dilute line value?
    Correlation of lines-per-order against average line value (the
    dilution signal) and against total order value (the obvious
    positive), from one per-order agg — the decomposition behind
    upsell-vs-cross-sell strategy."""
    li = _t(spark, sf_dir, "lineitem")
    per = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).cast("double").alias("n_lines"),
        F.avg("l_extendedprice").alias("avg_line_value"),
        F.sum("l_extendedprice").alias("order_value"),
    )
    return per.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.round(F.corr("n_lines", "avg_line_value"), 6).alias(
            "corr_lines_linevalue"
        ),
        F.round(F.corr("n_lines", "order_value"), 6).alias(
            "corr_lines_ordervalue"
        ),
        F.round(F.avg("n_lines"), 4).alias("mean_lines"),
    )


@register(
    "q371_reorder_cadence",
    """
    WITH gaps AS (
      SELECT o_custkey,
             date_diff('day',
               LAG(CAST(o_orderdate AS DATE)) OVER (
                 PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey),
               CAST(o_orderdate AS DATE)) AS gap_days
      FROM orders
    ),
    g AS (SELECT gap_days FROM gaps WHERE gap_days IS NOT NULL),
    custs AS (
      SELECT COUNT(DISTINCT o_custkey)::DOUBLE AS n_cust,
             COUNT(DISTINCT CASE WHEN cnt > 1 THEN o_custkey END)
               ::DOUBLE AS n_repeat
      FROM (SELECT o_custkey, COUNT(*) AS cnt FROM orders
            GROUP BY o_custkey) t
    )
    SELECT CAST((SELECT n_cust FROM custs) AS BIGINT) AS n_customers,
           ROUND((SELECT n_repeat FROM custs)
                 / (SELECT n_cust FROM custs), 6) AS repeat_rate,
           CAST(COUNT(*) AS BIGINT) AS n_gaps,
           ROUND(quantile_cont(gap_days, 0.5), 4) AS median_gap_days,
           ROUND(AVG(gap_days), 4) AS mean_gap_days
    FROM g
    """,
)
def q371_reorder_cadence(spark, sf_dir):
    """Repeat-purchase cadence: the share of customers who ever
    reorder, and the median/mean days between a customer's
    consecutive orders — the replenishment-cycle input for campaign
    timing.  One lag window on the customer partitioning plus a
    repeat-rate rollup."""
    od = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        "o_orderdate", "o_orderkey"
    )
    gaps = od.select(
        F.datediff(
            F.to_date("o_orderdate"),
            F.to_date(F.lag("o_orderdate").over(w)),
        ).alias("gap_days")
    ).filter(F.col("gap_days").isNotNull())
    custs = (
        od.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .agg(
            F.count(F.lit(1)).cast("double").alias("n_cust"),
            F.sum(F.when(F.col("cnt") > 1, 1).otherwise(0))
            .cast("double")
            .alias("n_repeat"),
        )
    )
    return gaps.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_gaps"),
        F.round(F.expr("percentile(gap_days, 0.5)"), 4).alias(
            "median_gap_days"
        ),
        F.round(F.avg("gap_days"), 4).alias("mean_gap_days"),
    ).crossJoin(F.broadcast(custs)).select(
        F.col("n_cust").cast("bigint").alias("n_customers"),
        F.round(F.col("n_repeat") / F.col("n_cust"), 6).alias(
            "repeat_rate"
        ),
        "n_gaps",
        "median_gap_days",
        "mean_gap_days",
    )


@register(
    "q372_brand_loyalty",
    """
    WITH cb AS (
      SELECT o.o_custkey, p.p_brand, COUNT(*) AS n
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY o.o_custkey, p.p_brand
    ),
    per AS (
      SELECT o_custkey,
             MAX(n)::DOUBLE / SUM(n) AS top_brand_share,
             SUM(n) AS n_lines
      FROM cb GROUP BY o_custkey
      HAVING SUM(n) >= 10
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
           ROUND(AVG(top_brand_share), 6) AS mean_top_brand_share,
           ROUND(quantile_cont(top_brand_share, 0.5), 6)
             AS median_top_brand_share,
           ROUND(AVG(CASE WHEN top_brand_share >= 0.5
                     THEN 1.0 ELSE 0.0 END), 6) AS share_loyal_50pct
    FROM per
    """,
)
def q372_brand_loyalty(spark, sf_dir):
    """Brand loyalty: each qualifying customer's share of lines in
    their single most-bought brand (≥10 lines), summarized — mean,
    median, and the fraction of customers majority-committed to one
    brand.  Two grouped aggs after broadcast dimension hops; MAX/SUM
    per customer needs no window."""
    li = _t(spark, sf_dir, "lineitem")
    od = _t(spark, sf_dir, "orders")
    pa = _t(spark, sf_dir, "part")
    cb = (
        li.join(
            F.broadcast(od.select("o_orderkey", "o_custkey")),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(pa.select("p_partkey", "p_brand")),
            li.l_partkey == F.col("p_partkey"),
        )
        .groupBy("o_custkey", "p_brand")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    per = (
        cb.groupBy("o_custkey")
        .agg(
            (F.max("n").cast("double") / F.sum("n")).alias(
                "top_brand_share"
            ),
            F.sum("n").alias("n_lines"),
        )
        .filter(F.col("n_lines") >= 10)
    )
    return per.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.round(F.avg("top_brand_share"), 6).alias(
            "mean_top_brand_share"
        ),
        F.round(
            F.expr("percentile(top_brand_share, 0.5)"), 6
        ).alias("median_top_brand_share"),
        F.round(
            F.avg(
                F.when(F.col("top_brand_share") >= 0.5, 1.0).otherwise(
                    0.0
                )
            ),
            6,
        ).alias("share_loyal_50pct"),
    )


@register(
    "q369_duplicate_order_audit",
    """
    WITH sig AS (
      SELECT o_custkey, o_totalprice,
             CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
             COUNT(*) AS n
      FROM orders GROUP BY 1, 2, 3
    )
    SELECT CAST(SUM(n) AS BIGINT) AS n_orders,
           CAST(SUM(CASE WHEN n > 1 THEN n ELSE 0 END) AS BIGINT)
             AS n_in_dup_groups,
           CAST(SUM(CASE WHEN n > 1 THEN n - 1 ELSE 0 END) AS BIGINT)
             AS n_suspected_dups,
           ROUND(SUM(CASE WHEN n > 1 THEN n - 1 ELSE 0 END)::DOUBLE
                 / SUM(n), 6) AS dup_rate
    FROM sig
    """,
)
def q369_duplicate_order_audit(spark, sf_dir):
    """Fact-table duplicate audit: orders sharing (customer, total
    price, day) — the attribute signature a double-submitted or
    double-ingested order leaves — with the suspected-duplicate count
    (group size minus one) and rate.  One signature agg, one rollup."""
    od = _t(spark, sf_dir, "orders")
    sig = od.groupBy(
        "o_custkey",
        "o_totalprice",
        F.to_date(F.date_trunc("DAY", "o_orderdate")).alias("day"),
    ).agg(F.count(F.lit(1)).alias("n"))
    return sig.agg(
        F.sum("n").cast("bigint").alias("n_orders"),
        F.sum(F.when(F.col("n") > 1, F.col("n")).otherwise(0))
        .cast("bigint")
        .alias("n_in_dup_groups"),
        F.sum(F.when(F.col("n") > 1, F.col("n") - 1).otherwise(0))
        .cast("bigint")
        .alias("n_suspected_dups"),
        F.round(
            F.sum(
                F.when(F.col("n") > 1, F.col("n") - 1).otherwise(0)
            ).cast("double")
            / F.sum("n"),
            6,
        ).alias("dup_rate"),
    )


@register(
    "q370_cross_domain_summary",
    r"""
    WITH commerce AS (
      SELECT (SELECT ROUND(SUM(o_totalprice), 2) FROM orders)
               AS revenue,
             (SELECT COUNT(DISTINCT o_custkey) FROM orders)
               AS n_buyers
    ),
    behavior AS (
      SELECT COUNT(DISTINCT user_id) AS n_users FROM events
    ),
    corpus AS (
      SELECT COUNT(*) AS n_docs,
             CAST(SUM(len(list_filter(string_split_regex(trim(text),
                 '\s+'), x -> x <> ''))) AS BIGINT) AS n_tokens,
             ROUND(1.0 - COUNT(DISTINCT md5(text))::DOUBLE
                   / COUNT(*), 6) AS exact_dup_rate
      FROM documents
    )
    SELECT commerce.revenue, commerce.n_buyers, behavior.n_users,
           corpus.n_docs, corpus.n_tokens, corpus.exact_dup_rate
    FROM commerce CROSS JOIN behavior CROSS JOIN corpus
    """,
)
def q370_cross_domain_summary(spark, sf_dir):
    """Cross-domain summary card: total revenue and buyer count,
    active users, corpus size in documents and whitespace tokens, and
    the exact-duplicate rate — one row spanning all three fixture
    domains, the executive header above the per-domain cards
    (q200/q349/q350)."""
    od = _t(spark, sf_dir, "orders")
    ev = _t(spark, sf_dir, "events")
    d = _t(spark, sf_dir, "documents")
    commerce = od.agg(
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        F.count_distinct("o_custkey").alias("n_buyers"),
    )
    behavior = ev.agg(F.count_distinct("user_id").alias("n_users"))
    corpus = d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(T.words("text"))).cast("bigint").alias(
            "n_tokens"
        ),
        F.round(
            1.0
            - F.count_distinct(F.md5("text")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("exact_dup_rate"),
    )
    return (
        commerce.crossJoin(F.broadcast(behavior))
        .crossJoin(F.broadcast(corpus))
    )


@register(
    "q367_normalization_impact",
    """
    WITH raw AS (
      SELECT COUNT(*) - COUNT(DISTINCT md5(text)) AS dups
      FROM documents
    ),
    norm AS (
      SELECT COUNT(*) - COUNT(DISTINCT md5(lower(trim(text))))
               AS dups
      FROM documents
    ),
    n AS (SELECT COUNT(*)::DOUBLE AS total FROM documents)
    SELECT CAST((SELECT total FROM n) AS BIGINT) AS n_docs,
           CAST((SELECT dups FROM raw) AS BIGINT) AS raw_dups,
           CAST((SELECT dups FROM norm) AS BIGINT) AS normalized_dups,
           CAST((SELECT dups FROM norm) - (SELECT dups FROM raw)
                AS BIGINT) AS dups_gained_by_normalizing,
           ROUND(((SELECT dups FROM norm) - (SELECT dups FROM raw))
                 / (SELECT total FROM n), 6) AS gain_rate
    FROM n
    """,
)
def q367_normalization_impact(spark, sf_dir):
    """Normalization-impact audit: exact-duplicate counts under raw
    md5 vs lowercase+trim md5 — the delta is exactly how many
    duplicates casing/whitespace noise hides from naive exact dedup,
    which prices whether the normalize step (q85) is worth running
    before the fingerprint pass.  Two distinct-counts in one scan
    each."""
    d = _t(spark, sf_dir, "documents")
    agg = d.agg(
        F.count(F.lit(1)).cast("double").alias("total"),
        (
            F.count(F.lit(1)) - F.count_distinct(F.md5("text"))
        ).alias("raw_dups"),
        (
            F.count(F.lit(1))
            - F.count_distinct(F.md5(F.lower(F.trim(F.col("text")))))
        ).alias("norm_dups"),
    )
    return agg.select(
        F.col("total").cast("bigint").alias("n_docs"),
        F.col("raw_dups").cast("bigint").alias("raw_dups"),
        F.col("norm_dups").cast("bigint").alias("normalized_dups"),
        (F.col("norm_dups") - F.col("raw_dups"))
        .cast("bigint")
        .alias("dups_gained_by_normalizing"),
        F.round(
            (F.col("norm_dups") - F.col("raw_dups")) / F.col("total"),
            6,
        ).alias("gain_rate"),
    )


@register(
    "q368_realized_vs_list_price",
    """
    WITH j AS (
      SELECT p.p_type,
             l.l_extendedprice / l.l_quantity AS unit_price,
             p.p_retailprice
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      WHERE l.l_quantity > 0
    )
    SELECT p_type,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           ROUND(AVG(unit_price / p_retailprice), 6)
             AS mean_realization,
           ROUND(AVG(CASE WHEN unit_price > p_retailprice
                     THEN 1.0 ELSE 0.0 END), 6)
             AS share_above_list
    FROM j GROUP BY p_type
    """,
)
def q368_realized_vs_list_price(spark, sf_dir):
    """Price realization by product type: the realized unit price as a
    fraction of list (retail) price, plus the share of lines sold
    ABOVE list — under 1.0 is structural discounting, above-list lines
    are either premiums or data errors worth a look.  Broadcast part
    join, one ratio agg."""
    li = _t(spark, sf_dir, "lineitem")
    pa = _t(spark, sf_dir, "part")
    j = (
        li.filter(F.col("l_quantity") > 0)
        .join(
            F.broadcast(
                pa.select("p_partkey", "p_type", "p_retailprice")
            ),
            li.l_partkey == F.col("p_partkey"),
        )
        .select(
            "p_type",
            (F.col("l_extendedprice") / F.col("l_quantity")).alias(
                "unit_price"
            ),
            "p_retailprice",
        )
    )
    return j.groupBy("p_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        F.round(
            F.avg(F.col("unit_price") / F.col("p_retailprice")), 6
        ).alias("mean_realization"),
        F.round(
            F.avg(
                F.when(
                    F.col("unit_price") > F.col("p_retailprice"), 1.0
                ).otherwise(0.0)
            ),
            6,
        ).alias("share_above_list"),
    )


@register(
    "q365_order_splitting",
    """
    WITH per_day AS (
      SELECT o_custkey, CAST(date_trunc('day', o_orderdate) AS DATE)
               AS day,
             COUNT(*) AS n
      FROM orders GROUP BY 1, 2
    )
    SELECT n AS orders_same_day,
           CAST(COUNT(*) AS BIGINT) AS n_customer_days,
           CAST(SUM(n) AS BIGINT) AS n_orders
    FROM per_day GROUP BY n
    """,
)
def q365_order_splitting(spark, sf_dir):
    """Order-splitting detector: how often one customer places
    multiple orders the same day — the histogram's n>1 tail is either
    checkout fragmentation (minimum-order gaming) or an ingestion
    duplicate bug, and both corrupt AOV.  Two cascaded hash aggs."""
    od = _t(spark, sf_dir, "orders")
    per_day = od.groupBy(
        "o_custkey",
        F.to_date(F.date_trunc("DAY", "o_orderdate")).alias("day"),
    ).agg(F.count(F.lit(1)).alias("n"))
    return per_day.groupBy(
        F.col("n").alias("orders_same_day")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customer_days"),
        F.sum("n").cast("bigint").alias("n_orders"),
    )


@register(
    "q366_concentration_trend",
    """
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day, user_id,
             SUM(value) AS v
      FROM events WHERE event_type = 'purchase'
      GROUP BY 1, 2
    ),
    ranked AS (
      SELECT day, v,
             ROW_NUMBER() OVER (PARTITION BY day
                                ORDER BY v, user_id) AS r,
             COUNT(*) OVER (PARTITION BY day) AS n
      FROM daily
    ),
    gini AS (
      SELECT day,
             SUM((2.0 * r - n - 1) * v)
               / (MAX(n) * SUM(v)) AS g
      FROM ranked WHERE n >= 10
      GROUP BY day
    ),
    m AS (SELECT AVG(epoch(day) / 86400.0) AS mx, AVG(g) AS my
          FROM gini)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
           ROUND(AVG(g), 6) AS mean_gini,
           ROUND(SUM((epoch(day) / 86400.0 - m.mx) * (g - m.my))
                 / SUM(POWER(epoch(day) / 86400.0 - m.mx, 2)), 9)
             AS gini_trend_per_day
    FROM gini CROSS JOIN m
    GROUP BY m.mx, m.my
    """,
)
def q366_concentration_trend(spark, sf_dir):
    """Is revenue concentrating?  Daily per-user purchase Gini (the
    q230 sorted-rank identity, per day on the day-partitioned rank
    window) fitted with an OLS slope over time — a positive trend says
    a shrinking set of users carries more of each day's revenue.
    Days with <10 purchasers are suppressed; the fit runs on 30
    sufficient-statistics rows."""
    ev = _t(spark, sf_dir, "events")
    daily = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(
            F.to_date(F.date_trunc("DAY", "ts")).alias("day"),
            "user_id",
        )
        .agg(F.sum("value").alias("v"))
    )
    wd = Window.partitionBy("day")
    wr = wd.orderBy("v", "user_id")
    ranked = daily.select(
        "day",
        "v",
        F.row_number().over(wr).alias("r"),
        F.count(F.lit(1)).over(wd).alias("n"),
    )
    gini = (
        ranked.filter(F.col("n") >= 10)
        .groupBy("day")
        .agg(
            (
                F.sum(
                    (2.0 * F.col("r") - F.col("n") - 1) * F.col("v")
                )
                / (F.max("n") * F.sum("v"))
            ).alias("g")
        )
    )
    gini = gini.localCheckpoint(eager=False)
    x = F.unix_date(F.col("day")).cast("double")
    m = gini.agg(
        F.avg(x).alias("mx"), F.avg("g").alias("my")
    )
    return (
        gini.crossJoin(F.broadcast(m))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_days"),
            F.round(F.avg("g"), 6).alias("mean_gini"),
            F.round(
                F.sum((x - F.col("mx")) * (F.col("g") - F.col("my")))
                / F.sum(F.pow(x - F.col("mx"), 2)),
                9,
            ).alias("gini_trend_per_day"),
        )
    )


@register(
    "q363_supplier_assortment_overlap",
    """
    WITH sp AS (
      SELECT DISTINCT l_suppkey, l_partkey FROM lineitem
    ),
    sz AS (SELECT l_suppkey, COUNT(*) AS n FROM sp GROUP BY 1),
    inter AS (
      SELECT a.l_suppkey AS supp_a, b.l_suppkey AS supp_b,
             CAST(COUNT(*) AS BIGINT) AS n_shared
      FROM sp a JOIN sp b
        ON a.l_partkey = b.l_partkey AND a.l_suppkey < b.l_suppkey
      GROUP BY 1, 2 HAVING COUNT(*) >= 20
    )
    SELECT supp_a, supp_b, n_shared,
           ROUND(n_shared::DOUBLE / (sa.n + sb.n - n_shared), 6)
             AS assortment_jaccard
    FROM inter
    JOIN sz sa ON sa.l_suppkey = supp_a
    JOIN sz sb ON sb.l_suppkey = supp_b
    ORDER BY ROUND(n_shared::DOUBLE / (sa.n + sb.n - n_shared), 6)
             DESC, supp_a, supp_b
    LIMIT 20
    """,
)
def q363_supplier_assortment_overlap(spark, sf_dir):
    """Supplier assortment overlap: Jaccard of supplied-part sets for
    the 20 most-overlapping supplier pairs (≥20 shared parts) — the
    substitutability map procurement negotiates against.  Pairs
    generate through the shared part (the inverted-index wedge, never
    supplier × supplier), set sizes broadcast, ranking on the ROUNDed
    Jaccard with key tiebreaks."""
    li = _t(spark, sf_dir, "lineitem")
    sp = li.select("l_suppkey", "l_partkey").distinct()
    sp = sp.localCheckpoint(eager=False)
    sz = sp.groupBy("l_suppkey").agg(F.count(F.lit(1)).alias("n"))
    a, b = sp.alias("a"), sp.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.l_partkey") == F.col("b.l_partkey"))
            & (F.col("a.l_suppkey") < F.col("b.l_suppkey")),
        )
        .groupBy(
            F.col("a.l_suppkey").alias("supp_a"),
            F.col("b.l_suppkey").alias("supp_b"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
        .filter(F.col("n_shared") >= 20)
    )
    sa = sz.select(F.col("l_suppkey").alias("supp_a"),
                   F.col("n").alias("na"))
    sb = sz.select(F.col("l_suppkey").alias("supp_b"),
                   F.col("n").alias("nb"))
    jac = F.round(
        F.col("n_shared").cast("double")
        / (F.col("na") + F.col("nb") - F.col("n_shared")),
        6,
    )
    return (
        inter.join(F.broadcast(sa), "supp_a")
        .join(F.broadcast(sb), "supp_b")
        .orderBy(jac.desc(), "supp_a", "supp_b")
        .limit(20)
        .select("supp_a", "supp_b", "n_shared",
                jac.alias("assortment_jaccard"))
    )


@register(
    "q364_behavior_maturation",
    """
    WITH firsts AS (
      SELECT user_id, MIN(epoch(ts)) AS t0 FROM events GROUP BY user_id
    ),
    tagged AS (
      SELECT e.event_type,
             CASE WHEN epoch(e.ts) <= f.t0 + 7 * 86400
                  THEN 'first_week' ELSE 'after' END AS tenure
      FROM events e JOIN firsts f ON e.user_id = f.user_id
    ),
    tot AS (
      SELECT tenure, COUNT(*)::DOUBLE AS t FROM tagged GROUP BY tenure
    )
    SELECT tagged.event_type,
           ROUND(SUM(CASE WHEN tagged.tenure = 'first_week'
                     THEN 1.0 ELSE 0 END)
                 / (SELECT t FROM tot WHERE tenure = 'first_week'), 6)
             AS share_first_week,
           ROUND(SUM(CASE WHEN tagged.tenure = 'after'
                     THEN 1.0 ELSE 0 END)
                 / (SELECT t FROM tot WHERE tenure = 'after'), 6)
             AS share_after
    FROM tagged GROUP BY tagged.event_type
    """,
)
def q364_behavior_maturation(spark, sf_dir):
    """Behavior maturation: the event-type mix during each user's
    first week vs afterwards — activation behavior (signups, first
    purchases) concentrates early; the divergence between the two
    columns is what onboarding actually changes.  One per-user start
    join, conditional shares against per-tenure totals."""
    ev = _t(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.unix_micros("ts") / 1e6).alias("t0")
    )
    tagged = ev.join(firsts, "user_id").select(
        "event_type",
        F.when(
            F.unix_micros("ts") / 1e6 <= F.col("t0") + 7 * 86400,
            "first_week",
        )
        .otherwise("after")
        .alias("tenure"),
    )
    tagged = tagged.localCheckpoint(eager=False)
    tot = tagged.groupBy("tenure").agg(
        F.count(F.lit(1)).cast("double").alias("t")
    )
    fw = tot.filter(F.col("tenure") == "first_week").select(
        F.col("t").alias("t_fw")
    )
    af = tot.filter(F.col("tenure") == "after").select(
        F.col("t").alias("t_af")
    )
    return (
        tagged.groupBy("event_type")
        .agg(
            F.sum(
                F.when(F.col("tenure") == "first_week", 1.0).otherwise(
                    0.0
                )
            ).alias("n_fw"),
            F.sum(
                F.when(F.col("tenure") == "after", 1.0).otherwise(0.0)
            ).alias("n_af"),
        )
        .crossJoin(F.broadcast(fw))
        .crossJoin(F.broadcast(af))
        .select(
            "event_type",
            F.round(F.col("n_fw") / F.col("t_fw"), 6).alias(
                "share_first_week"
            ),
            F.round(F.col("n_af") / F.col("t_af"), 6).alias(
                "share_after"
            ),
        )
    )


@register(
    "q361_dead_stock",
    """
    WITH sold AS (SELECT DISTINCT l_partkey FROM lineitem)
    SELECT p.p_type,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(SUM(CASE WHEN s.l_partkey IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_never_sold,
           ROUND(AVG(CASE WHEN s.l_partkey IS NULL THEN 1.0 ELSE 0.0
                     END), 6) AS dead_rate,
           ROUND(SUM(CASE WHEN s.l_partkey IS NULL
                     THEN p.p_retailprice ELSE 0 END), 2)
             AS dead_retail_value
    FROM part p LEFT JOIN sold s ON p.p_partkey = s.l_partkey
    GROUP BY p.p_type
    """,
)
def q361_dead_stock(spark, sf_dir):
    """Dead-stock report: catalog parts that never appear in a single
    lineitem, by product type, with the retail value parked in them —
    the classic left-anti inventory audit (here as a LEFT JOIN so the
    live counts ride the same pass).  The sold-key set is
    dimension-sized and broadcasts."""
    pa = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem")
    sold = li.select("l_partkey").distinct()
    j = pa.join(
        F.broadcast(sold), pa.p_partkey == sold.l_partkey, "left"
    )
    dead = F.col("l_partkey").isNull()
    return j.groupBy("p_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_parts"),
        F.sum(F.when(dead, 1).otherwise(0))
        .cast("bigint")
        .alias("n_never_sold"),
        F.round(
            F.avg(F.when(dead, 1.0).otherwise(0.0)), 6
        ).alias("dead_rate"),
        F.round(
            F.sum(
                F.when(dead, F.col("p_retailprice")).otherwise(0.0)
            ),
            2,
        ).alias("dead_retail_value"),
    )


@register(
    "q362_lead_time_stability",
    """
    WITH lt AS (
      SELECT CAST(date_trunc('month', l.l_shipdate) AS DATE) AS month,
             date_diff('day', CAST(o.o_orderdate AS DATE),
                       CAST(l.l_shipdate AS DATE)) AS days
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE l.l_shipdate >= o.o_orderdate
    )
    SELECT month,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           ROUND(quantile_cont(days, 0.25), 4) AS p25,
           ROUND(quantile_cont(days, 0.5), 4) AS p50,
           ROUND(quantile_cont(days, 0.75), 4) AS p75
    FROM lt GROUP BY month
    HAVING COUNT(*) >= 50
    """,
)
def q362_lead_time_stability(spark, sf_dir):
    """Lead-time stability over time: the monthly p25/p50/p75 whisker
    of order-to-ship days — a widening box is the operations early
    warning long before the mean moves.  One fact join, per-month percentile
    aggregates, months under 50 lines suppressed."""
    li = _t(spark, sf_dir, "lineitem")
    od = _t(spark, sf_dir, "orders")
    lt = (
        li.join(
            F.broadcast(od.select("o_orderkey", "o_orderdate")),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .filter(F.col("l_shipdate") >= F.col("o_orderdate"))
        .select(
            F.to_date(F.date_trunc("month", "l_shipdate")).alias(
                "month"
            ),
            F.datediff(
                F.to_date("l_shipdate"), F.to_date("o_orderdate")
            ).alias("days"),
        )
    )
    return (
        lt.groupBy("month")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
            F.round(F.expr("percentile(days, 0.25)"), 4).alias("p25"),
            F.round(F.expr("percentile(days, 0.5)"), 4).alias("p50"),
            F.round(F.expr("percentile(days, 0.75)"), 4).alias("p75"),
        )
        .filter(F.col("n_lines") >= 50)
    )


@register(
    "q359_sla_attainment",
    """
    WITH lt AS (
      SELECT o.o_orderpriority AS priority,
             date_diff('day', CAST(o.o_orderdate AS DATE),
                       CAST(l.l_shipdate AS DATE)) AS days
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE l.l_shipdate >= o.o_orderdate
    )
    SELECT priority,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           ROUND(AVG(CASE WHEN days <= 30 THEN 1.0 ELSE 0.0 END), 6)
             AS within_30d,
           ROUND(AVG(CASE WHEN days <= 60 THEN 1.0 ELSE 0.0 END), 6)
             AS within_60d,
           ROUND(AVG(CASE WHEN days <= 90 THEN 1.0 ELSE 0.0 END), 6)
             AS within_90d
    FROM lt GROUP BY priority
    """,
)
def q359_sla_attainment(spark, sf_dir):
    """SLA attainment by priority: the share of lines shipped within
    30/60/90 days — thresholds, not distributions (q285 gives the
    percentiles; contracts are written against attainment rates).
    One fact join and a conditional-average agg."""
    li = _t(spark, sf_dir, "lineitem")
    od = _t(spark, sf_dir, "orders")
    lt = (
        li.join(
            F.broadcast(
                od.select("o_orderkey", "o_orderpriority", "o_orderdate")
            ),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .filter(F.col("l_shipdate") >= F.col("o_orderdate"))
        .select(
            F.col("o_orderpriority").alias("priority"),
            F.datediff(
                F.to_date("l_shipdate"), F.to_date("o_orderdate")
            ).alias("days"),
        )
    )

    def within(d):
        return F.round(
            F.avg(
                F.when(F.col("days") <= d, 1.0).otherwise(0.0)
            ),
            6,
        )

    return lt.groupBy("priority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        within(30).alias("within_30d"),
        within(60).alias("within_60d"),
        within(90).alias("within_90d"),
    )


@register(
    "q360_ttr_length_confound",
    r"""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(text), '\s+'),
                         x -> x <> '') AS w
      FROM documents
    ),
    stats AS (
      SELECT doc_id, len(w) AS n_tokens,
             len(list_distinct(w)) AS n_types
      FROM t WHERE len(w) > 0
    ),
    tiled AS (
      SELECT n_tokens, n_types,
             NTILE(10) OVER (ORDER BY n_tokens, doc_id) AS decile
      FROM stats
    )
    SELECT decile,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(AVG(n_tokens), 4) AS mean_tokens,
           ROUND(AVG(n_types::DOUBLE / n_tokens), 6) AS mean_ttr
    FROM tiled GROUP BY decile
    """,
)
def q360_ttr_length_confound(spark, sf_dir):
    """The TTR-length confound made visible: mean type-token ratio per
    document-length decile — TTR falls mechanically with length, so
    any 'lexical diversity by source' comparison (q198) must be read
    against this curve or length differences masquerade as vocabulary
    differences.  Per-doc token/type counts at scan speed, one NTILE
    over the docs-sized table."""
    d = _t(spark, sf_dir, "documents")
    stats = d.select(
        "doc_id",
        F.size(T.words("text")).alias("n_tokens"),
        F.size(F.array_distinct(T.words("text"))).alias("n_types"),
    ).filter(F.col("n_tokens") > 0)
    w = Window.orderBy("n_tokens", "doc_id")
    tiled = stats.withColumn("decile", F.ntile(10).over(w))
    return tiled.groupBy("decile").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.round(F.avg("n_tokens"), 4).alias("mean_tokens"),
        F.round(
            F.avg(
                F.col("n_types").cast("double") / F.col("n_tokens")
            ),
            6,
        ).alias("mean_ttr"),
    )


@register(
    "q357_shift_share",
    """
    WITH mid AS (
      SELECT MIN(epoch(o_orderdate))
             + (MAX(epoch(o_orderdate)) - MIN(epoch(o_orderdate)))
               * 0.5 AS t
      FROM orders
    ),
    rev AS (
      SELECT c.c_nationkey AS nation,
             CASE WHEN epoch(o.o_orderdate) < (SELECT t FROM mid)
                  THEN 'h1' ELSE 'h2' END AS half,
             SUM(o.o_totalprice) AS r
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2
    ),
    wide AS (
      SELECT nation,
             SUM(CASE WHEN half = 'h1' THEN r ELSE 0 END) AS r1,
             SUM(CASE WHEN half = 'h2' THEN r ELSE 0 END) AS r2
      FROM rev GROUP BY nation
    ),
    g AS (SELECT SUM(r2) / SUM(r1) - 1.0 AS g_tot FROM wide)
    SELECT nation,
           ROUND(r2 - r1, 2) AS actual_growth,
           ROUND(r1 * (SELECT g_tot FROM g), 2) AS expected_growth,
           ROUND((r2 - r1) - r1 * (SELECT g_tot FROM g), 2)
             AS competitive_effect
    FROM wide WHERE r1 > 0
    """,
)
def q357_shift_share(spark, sf_dir):
    """Shift-share growth decomposition per nation between the two
    window halves: actual revenue growth vs the growth the nation
    would have posted at the overall rate, with the residual as the
    competitive effect — which markets genuinely out/under-performed
    once the tide is removed.  One conditional-sum pivot per nation;
    the overall rate folds in as a broadcast scalar."""
    od = _t(spark, sf_dir, "orders")
    cu = _t(spark, sf_dir, "customer")
    mid = od.agg(
        (
            F.min(F.unix_micros(F.col("o_orderdate").cast("timestamp")))
            + (
                F.max(F.unix_micros(F.col("o_orderdate").cast("timestamp")))
                - F.min(F.unix_micros(F.col("o_orderdate").cast("timestamp")))
            )
            * 0.5
        ).alias("t")
    )
    rev = (
        od.join(
            F.broadcast(cu.select("c_custkey", "c_nationkey")),
            od.o_custkey == F.col("c_custkey"),
        )
        .crossJoin(F.broadcast(mid))
        .groupBy(F.col("c_nationkey").alias("nation"))
        .agg(
            F.sum(
                F.when(
                    F.unix_micros(F.col("o_orderdate").cast("timestamp")) < F.col("t"),
                    F.col("o_totalprice"),
                ).otherwise(0.0)
            ).alias("r1"),
            F.sum(
                F.when(
                    F.unix_micros(F.col("o_orderdate").cast("timestamp")) >= F.col("t"),
                    F.col("o_totalprice"),
                ).otherwise(0.0)
            ).alias("r2"),
        )
    )
    rev = rev.localCheckpoint(eager=False)
    g = rev.agg((F.sum("r2") / F.sum("r1") - 1.0).alias("g_tot"))
    return (
        rev.crossJoin(F.broadcast(g))
        .filter(F.col("r1") > 0)
        .select(
            "nation",
            F.round(F.col("r2") - F.col("r1"), 2).alias(
                "actual_growth"
            ),
            F.round(F.col("r1") * F.col("g_tot"), 2).alias(
                "expected_growth"
            ),
            F.round(
                (F.col("r2") - F.col("r1"))
                - F.col("r1") * F.col("g_tot"),
                2,
            ).alias("competitive_effect"),
        )
    )


@register(
    "q358_metadata_consistency",
    """
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN n_chars <> length(text)
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_mismatched,
           ROUND(AVG(CASE WHEN n_chars <> length(text)
                     THEN 1.0 ELSE 0.0 END), 6) AS mismatch_rate,
           CAST(MAX(ABS(n_chars - length(text))) AS BIGINT)
             AS max_abs_gap
    FROM documents GROUP BY source
    """,
)
def q358_metadata_consistency(spark, sf_dir):
    """Stored-metadata consistency audit: does the n_chars column
    still equal length(text)?  Pre-computed statistics drift when text
    is cleaned without refreshing them, and every query that trusts
    the stale column inherits the error — the audit that catches it
    is one scan of conditional aggregates."""
    d = _t(spark, sf_dir, "documents")
    mism = F.col("n_chars") != F.length("text")
    return d.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.when(mism, 1).otherwise(0))
        .cast("bigint")
        .alias("n_mismatched"),
        F.round(
            F.avg(F.when(mism, 1.0).otherwise(0.0)), 6
        ).alias("mismatch_rate"),
        F.max(F.abs(F.col("n_chars") - F.length("text")))
        .cast("bigint")
        .alias("max_abs_gap"),
    )


@register(
    "q355_log_odds_terms",
    r"""
    WITH toks AS (
      SELECT lang, UNNEST(list_filter(
        string_split_regex(trim(text), '\s+'), x -> x <> '')) AS term
      FROM documents WHERE lang IN ('en', 'de')
    ),
    c AS (
      SELECT term,
             SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)::DOUBLE AS a,
             SUM(CASE WHEN lang = 'de' THEN 1 ELSE 0 END)::DOUBLE AS b
      FROM toks GROUP BY term
    ),
    tot AS (SELECT SUM(a) AS na, SUM(b) AS nb, SUM(a + b) AS n0
            FROM c),
    scored AS (
      SELECT term, CAST(a AS BIGINT) AS n_en, CAST(b AS BIGINT) AS n_de,
             ROUND(
               (ln((a + 0.01 * (a + b))
                   / (tot.na + 0.01 * tot.n0 - a - 0.01 * (a + b)))
                - ln((b + 0.01 * (a + b))
                     / (tot.nb + 0.01 * tot.n0 - b
                        - 0.01 * (a + b))))
               / sqrt(1.0 / (a + 0.01 * (a + b))
                      + 1.0 / (b + 0.01 * (a + b))), 6) AS z
      FROM c CROSS JOIN tot
      WHERE a + b >= 10
    )
    SELECT term, n_en, n_de, z FROM (
      SELECT *, ROW_NUMBER() OVER (ORDER BY z DESC, term ASC) AS rk
      FROM scored) t
    WHERE rk <= 15
    """,
)
def q355_log_odds_terms(spark, sf_dir):
    """Distinctive terms by weighted log-odds with an informative
    Dirichlet prior (Monroe et al.'s 'Fightin' Words'): the top-15
    en-vs-de terms by z-scored log-odds — the statistically honest
    alternative to TF-IDF for WHICH WORDS DISTINGUISH TWO CORPORA
    (raw ratios over-reward rare terms; the prior and variance term
    fix that).  One grouped count per term, the totals as a broadcast
    scalar, ranking on the ROUNDed z."""
    d = _t(spark, sf_dir, "documents").filter(
        F.col("lang").isin("en", "de")
    )
    toks = d.select("lang", F.explode(T.words("text")).alias("term"))
    c = toks.groupBy("term").agg(
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0))
        .cast("double")
        .alias("a"),
        F.sum(F.when(F.col("lang") == "de", 1).otherwise(0))
        .cast("double")
        .alias("b"),
    )
    c = c.localCheckpoint(eager=False)
    tot = c.agg(
        F.sum("a").alias("na"),
        F.sum("b").alias("nb"),
        F.sum(F.col("a") + F.col("b")).alias("n0"),
    )
    ab = F.col("a") + F.col("b")
    pa = F.col("a") + 0.01 * ab
    pb = F.col("b") + 0.01 * ab
    qa = F.col("na") + 0.01 * F.col("n0") - pa
    qb = F.col("nb") + 0.01 * F.col("n0") - pb
    z = F.round(
        (F.log(pa / qa) - F.log(pb / qb))
        / F.sqrt(1.0 / pa + 1.0 / pb),
        6,
    )
    scored = (
        c.crossJoin(F.broadcast(tot))
        .filter(ab >= 10)
        .select(
            "term",
            F.col("a").cast("bigint").alias("n_en"),
            F.col("b").cast("bigint").alias("n_de"),
            z.alias("z"),
        )
    )
    return (
        scored.orderBy(F.col("z").desc(), F.col("term").asc())
        .limit(15)
    )


@register(
    "q356_qq_table",
    """
    WITH qa0 AS (
      SELECT quantile_cont(n_chars,
        [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS qs
      FROM documents WHERE source = 'src0'
    ),
    qb0 AS (
      SELECT quantile_cont(n_chars,
        [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS qs
      FROM documents WHERE source = 'src1'
    ),
    qa AS (SELECT UNNEST(qs) AS q, generate_subscripts(qs, 1) AS i
           FROM qa0),
    qb AS (SELECT UNNEST(qs) AS q, generate_subscripts(qs, 1) AS i
           FROM qb0)
    SELECT qa.i AS decile,
           ROUND(qa.q, 4) AS q_src0,
           ROUND(qb.q, 4) AS q_src1,
           ROUND(qb.q - qa.q, 4) + 0.0 AS shift,
           ROUND(qb.q / qa.q, 6) AS ratio
    FROM qa JOIN qb USING (i)
    """,
)
def q356_qq_table(spark, sf_dir):
    """Q-Q shift table: src0-vs-src1 document-length quantiles at each
    decile with the absolute shift and ratio — WHERE the q296
    Wasserstein mass moved (a tail-only shift and a uniform shift have
    the same W₁ but opposite remedies).  One percentile-array
    aggregate per side, a 9-row zip."""
    d = _t(spark, sf_dir, "documents")
    pcts = ",".join(str(i / 10.0) for i in range(1, 10))

    def side(src, alias):
        return (
            d.filter(F.col("source") == src)
            .agg(
                F.expr(
                    f"percentile(n_chars, array({pcts}))"
                ).alias("qs")
            )
            .select(F.posexplode("qs").alias("i", alias))
        )

    qa = side("src0", "qa")
    qb = side("src1", "qb")
    return qa.join(qb, "i").select(
        (F.col("i") + 1).alias("decile"),
        F.round("qa", 4).alias("q_src0"),
        F.round("qb", 4).alias("q_src1"),
        # + 0.0 folds IEEE -0.0 (from rounding a tiny negative
        # difference) back to +0.0 so both engines hash identically
        (F.round(F.col("qb") - F.col("qa"), 4) + F.lit(0.0)).alias(
            "shift"
        ),
        F.round(F.col("qb") / F.col("qa"), 6).alias("ratio"),
    )


@register(
    "q353_subsample_convergence",
    """
    WITH rates AS (SELECT UNNEST([1, 5, 25, 100]) AS pct),
    tagged AS (
      SELECT o_totalprice,
             ('0x' || substr(md5('ss_' || o_orderkey::VARCHAR), 1, 12))
               ::BIGINT % 100 AS bucket
      FROM orders
    )
    SELECT rates.pct,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(AVG(o_totalprice), 4) AS mean_est,
           ROUND(STDDEV_SAMP(o_totalprice) / SQRT(COUNT(*)), 6)
             AS stderr
    FROM rates JOIN tagged ON tagged.bucket < rates.pct
    GROUP BY rates.pct
    """,
)
def q353_subsample_convergence(spark, sf_dir):
    """Subsample-convergence table: the mean order value and its
    standard error at deterministic 1/5/25/100% hash samples — 'how
    much data does this metric need', the budget question answered
    with nested samples (each rate's sample contains the smaller
    ones, so the estimates converge monotonically in expectation).
    One md5 bucket per row, a 4-rate conditional join."""
    od = _t(spark, sf_dir, "orders")
    tagged = od.select(
        "o_totalprice",
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("ss_"),
                            F.col("o_orderkey").cast("string"),
                        )
                    ),
                    1,
                    12,
                ),
                16,
                10,
            ).cast("long")
            % 100
        ).alias("bucket"),
    )
    rates = spark.range(1).select(
        F.explode(
            F.array(*[F.lit(x) for x in (1, 5, 25, 100)])
        ).alias("pct")
    )
    return (
        rates.crossJoin(tagged)
        .filter(F.col("bucket") < F.col("pct"))
        .groupBy("pct")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.round(F.avg("o_totalprice"), 4).alias("mean_est"),
            F.round(
                F.stddev_samp("o_totalprice")
                / F.sqrt(F.count(F.lit(1))),
                6,
            ).alias("stderr"),
        )
    )


@register(
    "q354_rare_category_collapse",
    """
    WITH counts AS (
      SELECT p_type, COUNT(*) AS n FROM part GROUP BY p_type
    ),
    tagged AS (
      SELECT CASE WHEN n >= 40 THEN p_type ELSE '<other>' END AS cat,
             n
      FROM counts
    )
    SELECT cat,
           CAST(SUM(n) AS BIGINT) AS n_parts,
           CAST(COUNT(*) AS BIGINT) AS n_raw_categories
    FROM tagged GROUP BY cat
    """,
)
def q354_rare_category_collapse(spark, sf_dir):
    """Rare-category collapsing (min-support 40): product types below
    the support threshold fold into '<other>' — the categorical
    preprocessing step that keeps one-hot/target encodings from
    memorizing noise, reported as the post-collapse category table
    with how many raw categories each bucket absorbed.  Two tiny
    aggregations over the category-count table."""
    pa = _t(spark, sf_dir, "part")
    counts = pa.groupBy("p_type").agg(F.count(F.lit(1)).alias("n"))
    tagged = counts.select(
        F.when(F.col("n") >= 40, F.col("p_type"))
        .otherwise("<other>")
        .alias("cat"),
        "n",
    )
    return tagged.groupBy("cat").agg(
        F.sum("n").cast("bigint").alias("n_parts"),
        F.count(F.lit(1)).cast("bigint").alias("n_raw_categories"),
    )


@register(
    "q351_geo_hotspots",
    """
    WITH pts AS (
      SELECT user_id,
             (('0x' || substr(md5('lat_' || user_id::VARCHAR), 1, 12))
                ::BIGINT / 281474976710656.0) * 120.0 - 60.0 AS lat,
             (('0x' || substr(md5('lon_' || user_id::VARCHAR), 1, 12))
                ::BIGINT / 281474976710656.0) * 360.0 - 180.0 AS lon
      FROM (SELECT DISTINCT user_id FROM events)
    ),
    cells AS (
      SELECT CAST(FLOOR(lat / 15.0) AS BIGINT) AS cla,
             CAST(FLOOR(lon / 15.0) AS BIGINT) AS clo,
             COUNT(*) AS n
      FROM pts GROUP BY 1, 2
    ),
    tot AS (SELECT SUM(n)::DOUBLE AS t FROM cells)
    SELECT cla, clo, CAST(n AS BIGINT) AS n_points,
           ROUND(n / (SELECT t FROM tot), 6) AS share
    FROM cells
    ORDER BY n DESC, cla ASC, clo ASC
    LIMIT 15
    """,
)
def q351_geo_hotspots(spark, sf_dir):
    """Spatial density hotspots: the 15 most populated 15°×15° grid
    cells with their share of all points — the aggregation level every
    geo dashboard heats first, and the load-balancing input for
    spatial partitioning (a hot cell is a hot Spark partition under
    naive cell hashing).  Integer cell keys, one groupBy, top-k on
    exact counts."""
    ev = _t(spark, sf_dir, "events")
    frac = lambda tag: (  # noqa: E731
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(tag), F.col("user_id").cast("string"))),
                1,
                12,
            ),
            16,
            10,
        ).cast("double")
        / 281474976710656.0
    )
    pts = (
        ev.select("user_id")
        .distinct()
        .select(
            (frac("lat_") * 120.0 - 60.0).alias("lat"),
            (frac("lon_") * 360.0 - 180.0).alias("lon"),
        )
    )
    cells = pts.groupBy(
        F.floor(F.col("lat") / 15.0).cast("bigint").alias("cla"),
        F.floor(F.col("lon") / 15.0).cast("bigint").alias("clo"),
    ).agg(F.count(F.lit(1)).alias("n"))
    cells = cells.localCheckpoint(eager=False)
    tot = cells.agg(F.sum("n").cast("double").alias("t"))
    return (
        cells.crossJoin(F.broadcast(tot))
        .orderBy(F.col("n").desc(), "cla", "clo")
        .limit(15)
        .select(
            "cla",
            "clo",
            F.col("n").cast("bigint").alias("n_points"),
            F.round(F.col("n") / F.col("t"), 6).alias("share"),
        )
    )


@register(
    "q352_clark_evans",
    """
    WITH pts AS (
      SELECT user_id,
             (('0x' || substr(md5('lat_' || user_id::VARCHAR), 1, 12))
                ::BIGINT / 281474976710656.0) * 120.0 - 60.0 AS lat,
             (('0x' || substr(md5('lon_' || user_id::VARCHAR), 1, 12))
                ::BIGINT / 281474976710656.0) * 360.0 - 180.0 AS lon
      FROM (SELECT DISTINCT user_id FROM events)
    ),
    cells AS (
      SELECT user_id, lat, lon,
             CAST(FLOOR(lat / 9.0) AS BIGINT) AS cla,
             CAST(FLOOR(lon / 18.0) AS BIGINT) AS clo
      FROM pts
    ),
    lhs AS (
      SELECT c.user_id, c.lat, c.lon,
             c.cla + da.d AS cla, c.clo + dl.d AS clo
      FROM cells c,
           (SELECT UNNEST([-1, 0, 1]) AS d) da,
           (SELECT UNNEST([-1, 0, 1]) AS d) dl
    ),
    cand AS (
      SELECT a.user_id,
             ROUND(2 * 6371.0 * asin(sqrt(
               pow(sin(radians(b.lat - a.lat) / 2), 2)
               + cos(radians(a.lat)) * cos(radians(b.lat))
                 * pow(sin(radians(b.lon - a.lon) / 2), 2))), 3)
               AS dist_km
      FROM lhs a JOIN cells b
        ON a.cla = b.cla AND a.clo = b.clo
       AND a.user_id <> b.user_id
    ),
    nn AS (
      SELECT user_id, MIN(dist_km) AS d FROM cand
      WHERE dist_km <= 1000.0 GROUP BY user_id
    ),
    n_all AS (SELECT COUNT(*)::DOUBLE AS n FROM pts)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_with_nn,
           ROUND(AVG(d), 4) AS mean_nn_km,
           ROUND(0.5 * sqrt((120.0 * 111.0)
                 * (360.0 * 111.0 * 0.743)
                 / (SELECT n FROM n_all)), 4) AS expected_random_km,
           ROUND(AVG(d) / (0.5 * sqrt((120.0 * 111.0)
                 * (360.0 * 111.0 * 0.743)
                 / (SELECT n FROM n_all))), 6) AS clark_evans_r
    FROM nn
    """,
)
def q352_clark_evans(spark, sf_dir):
    """Clark-Evans aggregation index: observed mean nearest-neighbor
    distance over the 0.5·√(A/n) expectation for uniform-random points
    (R≈1 random, R<1 clustered, R→2.15 dispersed) — the spatial
    randomness test, here over the md5-coordinate fixture with the
    study area's mean-latitude cosine folded into A.  Reuses the q282
    blocked-NN join; the index is one aggregate over the NN table."""
    ev = _t(spark, sf_dir, "events")
    frac = lambda tag: (  # noqa: E731
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(tag), F.col("user_id").cast("string"))),
                1,
                12,
            ),
            16,
            10,
        ).cast("double")
        / 281474976710656.0
    )
    pts = (
        ev.select("user_id")
        .distinct()
        .select(
            "user_id",
            (frac("lat_") * 120.0 - 60.0).alias("lat"),
            (frac("lon_") * 360.0 - 180.0).alias("lon"),
        )
    )
    cells = pts.select(
        "user_id",
        "lat",
        "lon",
        F.floor(F.col("lat") / 9.0).cast("bigint").alias("cla"),
        F.floor(F.col("lon") / 18.0).cast("bigint").alias("clo"),
    )
    d3 = F.array(F.lit(-1), F.lit(0), F.lit(1))
    lhs = (
        cells.withColumn("da", F.explode(d3))
        .withColumn("dl", F.explode(d3))
        .select(
            "user_id",
            "lat",
            "lon",
            (F.col("cla") + F.col("da")).alias("cla"),
            (F.col("clo") + F.col("dl")).alias("clo"),
        )
    )
    a, b = lhs.alias("a"), cells.alias("b")
    dlat = F.radians(F.col("b.lat") - F.col("a.lat")) / 2
    dlon = F.radians(F.col("b.lon") - F.col("a.lon")) / 2
    dist = F.round(
        2
        * 6371.0
        * F.asin(
            F.sqrt(
                F.pow(F.sin(dlat), 2)
                + F.cos(F.radians(F.col("a.lat")))
                * F.cos(F.radians(F.col("b.lat")))
                * F.pow(F.sin(dlon), 2)
            )
        ),
        3,
    )
    nn = (
        a.join(
            b,
            (F.col("a.cla") == F.col("b.cla"))
            & (F.col("a.clo") == F.col("b.clo"))
            & (F.col("a.user_id") != F.col("b.user_id")),
        )
        .select(F.col("a.user_id").alias("user_id"), dist.alias("d"))
        .filter(F.col("d") <= 1000.0)
        .groupBy("user_id")
        .agg(F.min("d").alias("d"))
    )
    n_all = pts.agg(F.count(F.lit(1)).cast("double").alias("n"))
    expected = 0.5 * F.sqrt(
        (120.0 * 111.0) * (360.0 * 111.0 * 0.743) / F.col("n")
    )
    return nn.crossJoin(F.broadcast(n_all)).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_with_nn"),
        F.round(F.avg("d"), 4).alias("mean_nn_km"),
        F.round(F.max(expected), 4).alias("expected_random_km"),
        F.round(F.avg("d") / F.max(expected), 6).alias(
            "clark_evans_r"
        ),
    )


@register(
    "q349_unit_economics",
    """
    WITH o AS (
      SELECT COUNT(*)::DOUBLE AS n_orders,
             COUNT(DISTINCT o_custkey)::DOUBLE AS n_customers,
             SUM(o_totalprice) AS revenue
      FROM orders
    ),
    l AS (SELECT COUNT(*)::DOUBLE AS n_lines FROM lineitem)
    SELECT CAST(n_orders AS BIGINT) AS n_orders,
           CAST(n_customers AS BIGINT) AS n_customers,
           ROUND(revenue, 2) AS revenue,
           ROUND(revenue / n_orders, 4) AS aov,
           ROUND((SELECT n_lines FROM l) / n_orders, 6)
             AS lines_per_order,
           ROUND(revenue / n_customers, 4) AS revenue_per_customer,
           ROUND(n_orders / n_customers, 6) AS orders_per_customer
    FROM o
    """,
)
def q349_unit_economics(spark, sf_dir):
    """Unit-economics KPI card: AOV, lines per order, revenue per
    customer, purchase frequency — the one-row scorecard every
    commerce dashboard opens with, each ratio defined from two
    single-scan aggregates."""
    od = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    o = od.agg(
        F.count(F.lit(1)).cast("double").alias("n_orders"),
        F.count_distinct("o_custkey").cast("double").alias(
            "n_customers"
        ),
        F.sum("o_totalprice").alias("revenue"),
    )
    l = li.agg(F.count(F.lit(1)).cast("double").alias("n_lines"))
    return o.crossJoin(F.broadcast(l)).select(
        F.col("n_orders").cast("bigint").alias("n_orders"),
        F.col("n_customers").cast("bigint").alias("n_customers"),
        F.round("revenue", 2).alias("revenue"),
        F.round(F.col("revenue") / F.col("n_orders"), 4).alias("aov"),
        F.round(F.col("n_lines") / F.col("n_orders"), 6).alias(
            "lines_per_order"
        ),
        F.round(F.col("revenue") / F.col("n_customers"), 4).alias(
            "revenue_per_customer"
        ),
        F.round(F.col("n_orders") / F.col("n_customers"), 6).alias(
            "orders_per_customer"
        ),
    )


@register(
    "q350_dataset_card",
    """
    SELECT 'region' AS tbl, (SELECT COUNT(*) FROM region) AS n_rows
    UNION ALL SELECT 'nation', (SELECT COUNT(*) FROM nation)
    UNION ALL SELECT 'customer', (SELECT COUNT(*) FROM customer)
    UNION ALL SELECT 'supplier', (SELECT COUNT(*) FROM supplier)
    UNION ALL SELECT 'part', (SELECT COUNT(*) FROM part)
    UNION ALL SELECT 'orders', (SELECT COUNT(*) FROM orders)
    UNION ALL SELECT 'lineitem', (SELECT COUNT(*) FROM lineitem)
    UNION ALL SELECT 'events', (SELECT COUNT(*) FROM events)
    UNION ALL SELECT 'documents', (SELECT COUNT(*) FROM documents)
    UNION ALL SELECT 'embeddings', (SELECT COUNT(*) FROM embeddings)
    """,
)
def q350_dataset_card(spark, sf_dir):
    """Dataset card: row counts of every table in the fixture star
    schema in one result — the manifest row-count section every data
    release publishes (metadata-only scans; parquet serves these from
    footers without reading data pages)."""
    rows = None
    for name in [
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
    ]:
        t = _t(spark, sf_dir, name).agg(
            F.count(F.lit(1)).alias("n_rows")
        ).select(F.lit(name).alias("tbl"), "n_rows")
        rows = t if rows is None else rows.unionByName(t)
    return rows


@register(
    "q347_catalog_tokens",
    r"""
    WITH toks AS (
      SELECT p_type,
             UNNEST(list_filter(string_split_regex(lower(p_name),
                                '\s+'), x -> x <> '')) AS tok
      FROM part
    ),
    counts AS (
      SELECT p_type, tok, COUNT(*) AS n FROM toks GROUP BY 1, 2
    )
    SELECT p_type, tok, n FROM (
      SELECT p_type, tok, n,
             ROW_NUMBER() OVER (PARTITION BY p_type
                                ORDER BY n DESC, tok ASC) AS rk
      FROM counts) t
    WHERE rk <= 3
    """,
)
def q347_catalog_tokens(spark, sf_dir):
    """Catalog text mining: the top-3 name tokens per product type —
    the naming-convention probe over the dimension's own text (catalog
    hygiene: tokens that should align with the type taxonomy and
    don't are misfiled products).  Token explode over the part
    dimension only; per-type rank with count+token tiebreak."""
    pa = _t(spark, sf_dir, "part")
    toks = pa.select(
        "p_type",
        F.explode(T.words(F.lower(F.col("p_name")))).alias("tok"),
    )
    counts = toks.groupBy("p_type", "tok").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("p_type").orderBy(
        F.col("n").desc(), F.col("tok").asc()
    )
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("p_type", "tok", "n")
    )


@register(
    "q348_double_fire_audit",
    """
    WITH lagged AS (
      SELECT user_id, event_type, value,
             epoch(ts) - epoch(LAG(ts) OVER (
               PARTITION BY user_id, event_type
               ORDER BY ts, event_id)) AS gap,
             value - LAG(value) OVER (
               PARTITION BY user_id, event_type
               ORDER BY ts, event_id) AS dv
      FROM events
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN gap IS NOT NULL AND gap < 60
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_rapid_repeat,
           CAST(SUM(CASE WHEN gap IS NOT NULL AND gap < 60
                         AND dv = 0
                    THEN 1 ELSE 0 END) AS BIGINT)
             AS n_suspect_double_fire,
           ROUND(AVG(CASE WHEN gap IS NOT NULL AND gap < 60
                     THEN 1.0 ELSE 0.0 END), 6) AS rapid_repeat_rate
    FROM lagged GROUP BY event_type
    """,
)
def q348_double_fire_audit(spark, sf_dir):
    """Instrumentation double-fire audit: same user, same event type,
    fired again within 60 s — and the stricter signature of identical
    value — the telemetry-bug detector that runs before any funnel is
    trusted.  One lag window per (user, type) partitioning, then a
    conditional agg."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        "ts", "event_id"
    )
    lagged = ev.select(
        "event_type",
        (
            F.unix_micros("ts") / 1e6
            - F.unix_micros(F.lag("ts").over(w)) / 1e6
        ).alias("gap"),
        (F.col("value") - F.lag("value").over(w)).alias("dv"),
    )
    rapid = F.col("gap").isNotNull() & (F.col("gap") < 60)
    return lagged.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum(F.when(rapid, 1).otherwise(0))
        .cast("bigint")
        .alias("n_rapid_repeat"),
        F.sum(F.when(rapid & (F.col("dv") == 0), 1).otherwise(0))
        .cast("bigint")
        .alias("n_suspect_double_fire"),
        F.round(
            F.avg(F.when(rapid, 1.0).otherwise(0.0)), 6
        ).alias("rapid_repeat_rate"),
    )


@register(
    "q345_trade_matrix",
    """
    WITH flows AS (
      SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
             l.l_extendedprice * (1 - l.l_discount) AS rev
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation sn ON s.s_nationkey = sn.n_nationkey
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation cn ON c.c_nationkey = cn.n_nationkey
    )
    SELECT supp_nation, cust_nation,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           ROUND(SUM(rev), 2) AS revenue
    FROM flows
    GROUP BY supp_nation, cust_nation
    ORDER BY ROUND(SUM(rev), 2) DESC, supp_nation, cust_nation
    LIMIT 30
    """,
)
def q345_trade_matrix(spark, sf_dir):
    """Nation-to-nation trade matrix (the TPC-H Q7 shape generalized):
    discounted revenue flowing from supplier nation to customer
    nation, top-30 cells — the fact table joins four dimension hops,
    every one a broadcast, so the plan is one lineitem scan plus a
    hash agg; ranking on the ROUNDed revenue with name tiebreaks."""
    li = _t(spark, sf_dir, "lineitem")
    su = _t(spark, sf_dir, "supplier")
    na = _t(spark, sf_dir, "nation")
    od = _t(spark, sf_dir, "orders")
    cu = _t(spark, sf_dir, "customer")
    sn = na.select(
        F.col("n_nationkey").alias("snk"), F.col("n_name").alias("supp_nation")
    )
    cn = na.select(
        F.col("n_nationkey").alias("cnk"), F.col("n_name").alias("cust_nation")
    )
    flows = (
        li.join(
            F.broadcast(su.select("s_suppkey", "s_nationkey")),
            li.l_suppkey == F.col("s_suppkey"),
        )
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("snk"))
        .join(
            F.broadcast(od.select("o_orderkey", "o_custkey")),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(cu.select("c_custkey", "c_nationkey")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cnk"))
        .select(
            "supp_nation",
            "cust_nation",
            (
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("rev"),
        )
    )
    agg = flows.groupBy("supp_nation", "cust_nation").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        F.round(F.sum("rev"), 2).alias("revenue"),
    )
    return agg.orderBy(
        F.col("revenue").desc(), "supp_nation", "cust_nation"
    ).limit(30)


@register(
    "q346_two_way_anova",
    """
    WITH cells AS (
      SELECT lang, source, COUNT(*)::DOUBLE AS n,
             AVG(n_chars) AS m,
             SUM(n_chars * n_chars) AS ss
      FROM documents GROUP BY lang, source
    ),
    rowm AS (SELECT lang, SUM(n * m) / SUM(n) AS rm FROM cells
             GROUP BY lang),
    colm AS (SELECT source, SUM(n * m) / SUM(n) AS cm FROM cells
             GROUP BY source),
    grand AS (SELECT SUM(n * m) / SUM(n) AS gm, SUM(n) AS nt,
                     COUNT(DISTINCT lang) AS a,
                     COUNT(DISTINCT source) AS b
              FROM cells)
    SELECT ROUND(SUM(c.n * POWER(r.rm - g.gm, 2)), 2) AS ss_lang,
           ROUND(SUM(c.n * POWER(cl.cm - g.gm, 2)), 2) AS ss_source,
           ROUND(SUM(c.n * POWER(c.m - r.rm - cl.cm + g.gm, 2)), 2)
             AS ss_interaction,
           ROUND(SUM(c.ss - c.n * c.m * c.m), 2) AS ss_within
    FROM cells c
    JOIN rowm r ON c.lang = r.lang
    JOIN colm cl ON c.source = cl.source
    CROSS JOIN grand g
    """,
)
def q346_two_way_anova(spark, sf_dir):
    """Two-way factorial ANOVA sums of squares for document length by
    lang × source: main effects, the interaction term (does a source's
    length profile DEPEND on language — the signal that per-source
    cleaning rules must be language-aware), and the within-cell
    residual.  All four SS terms compute from cell-level sufficient
    statistics; raw rows are scanned once."""
    d = _t(spark, sf_dir, "documents")
    cells = d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.avg("n_chars").alias("m"),
        F.sum(F.col("n_chars") * F.col("n_chars")).alias("ss"),
    )
    cells = cells.localCheckpoint(eager=False)
    rowm = cells.groupBy("lang").agg(
        (F.sum(F.col("n") * F.col("m")) / F.sum("n")).alias("rm")
    )
    colm = cells.groupBy("source").agg(
        (F.sum(F.col("n") * F.col("m")) / F.sum("n")).alias("cm")
    )
    grand = cells.agg(
        (F.sum(F.col("n") * F.col("m")) / F.sum("n")).alias("gm")
    )
    j = (
        cells.join(F.broadcast(rowm), "lang")
        .join(F.broadcast(colm), "source")
        .crossJoin(F.broadcast(grand))
    )
    return j.agg(
        F.round(
            F.sum(F.col("n") * F.pow(F.col("rm") - F.col("gm"), 2)), 2
        ).alias("ss_lang"),
        F.round(
            F.sum(F.col("n") * F.pow(F.col("cm") - F.col("gm"), 2)), 2
        ).alias("ss_source"),
        F.round(
            F.sum(
                F.col("n")
                * F.pow(
                    F.col("m")
                    - F.col("rm")
                    - F.col("cm")
                    + F.col("gm"),
                    2,
                )
            ),
            2,
        ).alias("ss_interaction"),
        F.round(
            F.sum(
                F.col("ss") - F.col("n") * F.col("m") * F.col("m")
            ),
            2,
        ).alias("ss_within"),
    )


@register(
    "q343_top3_customer_share",
    """
    WITH spend AS (
      SELECT c.c_nationkey AS nation, o.o_custkey,
             SUM(o.o_totalprice) AS s
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY c.c_nationkey, o.o_custkey
    ),
    ranked AS (
      SELECT nation, s,
             ROW_NUMBER() OVER (PARTITION BY nation
                                ORDER BY s DESC, o_custkey ASC) AS rk
      FROM spend
    )
    SELECT nation,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           ROUND(SUM(CASE WHEN rk <= 3 THEN s ELSE 0 END), 2)
             AS top3_revenue,
           ROUND(SUM(CASE WHEN rk <= 3 THEN s ELSE 0 END) / SUM(s), 6)
             AS top3_share
    FROM ranked GROUP BY nation
    """,
)
def q343_top3_customer_share(spark, sf_dir):
    """Key-account concentration per nation: the revenue share held by
    each nation's top-3 customers — the 'how fragile is this market'
    table (one defection moves top3_share of the nation).  One rank
    window per nation over the customer-spend table, then a
    conditional share agg; ties broken by customer key so both
    engines pick identical top-3 sets."""
    od = _t(spark, sf_dir, "orders")
    cu = _t(spark, sf_dir, "customer")
    spend = (
        od.join(
            F.broadcast(cu.select("c_custkey", "c_nationkey")),
            od.o_custkey == F.col("c_custkey"),
        )
        .groupBy(F.col("c_nationkey").alias("nation"), "o_custkey")
        .agg(F.sum("o_totalprice").alias("s"))
    )
    w = Window.partitionBy("nation").orderBy(
        F.col("s").desc(), F.col("o_custkey").asc()
    )
    ranked = spend.withColumn("rk", F.row_number().over(w))
    return ranked.groupBy("nation").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.round(
            F.sum(F.when(F.col("rk") <= 3, F.col("s")).otherwise(0.0)),
            2,
        ).alias("top3_revenue"),
        F.round(
            F.sum(F.when(F.col("rk") <= 3, F.col("s")).otherwise(0.0))
            / F.sum("s"),
            6,
        ).alias("top3_share"),
    )


@register(
    "q344_char_class_profile",
    """
    WITH t AS (
      SELECT source,
             length(text)::DOUBLE AS n,
             len(regexp_extract_all(text, '[0-9]'))::DOUBLE AS digits,
             len(regexp_extract_all(text, '[A-Z]'))::DOUBLE AS uppers,
             len(regexp_extract_all(text,
                 '[^A-Za-z0-9\\s]'))::DOUBLE AS puncts
      FROM documents WHERE length(text) > 0
    )
    SELECT source,
           ROUND(SUM(digits) / SUM(n), 6) AS digit_ratio,
           ROUND(SUM(uppers) / SUM(n), 6) AS upper_ratio,
           ROUND(SUM(puncts) / SUM(n), 6) AS punct_ratio
    FROM t GROUP BY source
    """,
)
def q344_char_class_profile(spark, sf_dir):
    """Character-class profile per source: digit, uppercase, and
    punctuation ratios — tables/code/boilerplate skew these long
    before any model sees the text, and a source whose ratios drift
    from its peers is the first thing to eyeball.  Scan-speed
    regexp counts into one grouped ratio agg."""
    d = _t(spark, sf_dir, "documents").filter(F.length("text") > 0)
    cnt = lambda pat: F.size(  # noqa: E731
        F.expr(f"regexp_extract_all(text, '{pat}', 0)")
    ).cast("double")
    t = d.select(
        "source",
        F.length("text").cast("double").alias("n"),
        cnt("[0-9]").alias("digits"),
        cnt("[A-Z]").alias("uppers"),
        cnt(r"[^A-Za-z0-9\\s]").alias("puncts"),
    )
    return t.groupBy("source").agg(
        F.round(F.sum("digits") / F.sum("n"), 6).alias("digit_ratio"),
        F.round(F.sum("uppers") / F.sum("n"), 6).alias("upper_ratio"),
        F.round(F.sum("puncts") / F.sum("n"), 6).alias("punct_ratio"),
    )


@register(
    "q341_order_aging",
    """
    WITH now_ AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS cutoff
                  FROM orders),
    aged AS (
      SELECT o_orderstatus,
             date_diff('day', CAST(o_orderdate AS DATE),
                       (SELECT cutoff FROM now_)) AS age_days,
             o_totalprice
      FROM orders
    )
    SELECT o_orderstatus,
           CASE WHEN age_days < 30 THEN '0-29'
                WHEN age_days < 90 THEN '30-89'
                WHEN age_days < 365 THEN '90-364'
                ELSE '365+' END AS age_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS value
    FROM aged
    GROUP BY o_orderstatus, CASE WHEN age_days < 30 THEN '0-29'
                WHEN age_days < 90 THEN '30-89'
                WHEN age_days < 365 THEN '90-364'
                ELSE '365+' END
    """,
)
def q341_order_aging(spark, sf_dir):
    """Order-aging report: orders bucketed by status × age band
    relative to the table's own latest date (no wall clock — the
    report is reproducible), with the value sitting in each cell —
    the WIP/receivables triage table.  One broadcast as-of scalar,
    one conditional-bucket groupBy."""
    od = _t(spark, sf_dir, "orders")
    asof = od.agg(F.max(F.to_date("o_orderdate")).alias("asof"))
    aged = od.crossJoin(F.broadcast(asof)).select(
        "o_orderstatus",
        F.datediff(F.col("asof"), F.to_date("o_orderdate")).alias(
            "age_days"
        ),
        "o_totalprice",
    )
    bucket = (
        F.when(F.col("age_days") < 30, "0-29")
        .when(F.col("age_days") < 90, "30-89")
        .when(F.col("age_days") < 365, "90-364")
        .otherwise("365+")
    )
    return aged.groupBy(
        "o_orderstatus", bucket.alias("age_bucket")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("value"),
    )


@register(
    "q342_discount_uplift",
    """
    WITH tagged AS (
      SELECT p.p_brand,
             CASE WHEN l.l_discount > 0.05 THEN 1 ELSE 0 END AS disc,
             l.l_quantity
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ),
    per AS (
      SELECT p_brand,
             AVG(CASE WHEN disc = 1 THEN l_quantity END) AS q_disc,
             AVG(CASE WHEN disc = 0 THEN l_quantity END) AS q_full,
             SUM(disc) AS n_disc,
             SUM(1 - disc) AS n_full
      FROM tagged GROUP BY p_brand
      HAVING SUM(disc) >= 30 AND SUM(1 - disc) >= 30
    )
    SELECT p_brand,
           CAST(n_disc AS BIGINT) AS n_discounted,
           CAST(n_full AS BIGINT) AS n_full_price,
           ROUND(q_disc, 4) AS qty_discounted,
           ROUND(q_full, 4) AS qty_full_price,
           ROUND(q_disc / q_full - 1.0, 6) AS qty_uplift
    FROM per
    """,
)
def q342_discount_uplift(spark, sf_dir):
    """Discount effectiveness by brand: average quantity on deeply
    discounted (>5%) lines vs full-price lines, as a relative uplift —
    the observational 'do discounts move volume' table (with
    minimum-support guards; causal reads need q310's experiment
    planner).  One conditional agg after the broadcast part join."""
    li = _t(spark, sf_dir, "lineitem")
    pa = _t(spark, sf_dir, "part")
    tagged = li.join(
        F.broadcast(pa.select("p_partkey", "p_brand")),
        li.l_partkey == F.col("p_partkey"),
    ).select(
        "p_brand",
        F.when(F.col("l_discount") > 0.05, 1).otherwise(0).alias(
            "disc"
        ),
        "l_quantity",
    )
    per = (
        tagged.groupBy("p_brand")
        .agg(
            F.avg(
                F.when(F.col("disc") == 1, F.col("l_quantity"))
            ).alias("q_disc"),
            F.avg(
                F.when(F.col("disc") == 0, F.col("l_quantity"))
            ).alias("q_full"),
            F.sum("disc").alias("n_disc"),
            F.sum(1 - F.col("disc")).alias("n_full"),
        )
        .filter((F.col("n_disc") >= 30) & (F.col("n_full") >= 30))
    )
    return per.select(
        "p_brand",
        F.col("n_disc").cast("bigint").alias("n_discounted"),
        F.col("n_full").cast("bigint").alias("n_full_price"),
        F.round("q_disc", 4).alias("qty_discounted"),
        F.round("q_full", 4).alias("qty_full_price"),
        F.round(F.col("q_disc") / F.col("q_full") - 1.0, 6).alias(
            "qty_uplift"
        ),
    )


@register(
    "q339_emptiness_audit",
    """
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN length(text) = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_empty,
           CAST(SUM(CASE WHEN length(text) > 0
                         AND length(trim(text)) = 0
                    THEN 1 ELSE 0 END) AS BIGINT)
             AS n_whitespace_only,
           CAST(SUM(CASE WHEN length(trim(text)) BETWEEN 1 AND 19
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_under_20_chars,
           ROUND(AVG(CASE WHEN length(trim(text)) < 20
                     THEN 1.0 ELSE 0.0 END), 6) AS junk_frac
    FROM documents GROUP BY source
    """,
)
def q339_emptiness_audit(spark, sf_dir):
    """Emptiness audit per source: empty, whitespace-only, and
    under-20-char documents with the junk fraction — the first gate of
    any ingestion pipeline (upstream extractors that emit husks show
    up here before they poison dedup statistics).  Scan-speed
    conditional aggregation, zero joins."""
    d = _t(spark, sf_dir, "documents")
    tl = F.length(F.trim(F.col("text")))
    return d.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.when(F.length("text") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_empty"),
        F.sum(
            F.when((F.length("text") > 0) & (tl == 0), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_whitespace_only"),
        F.sum(F.when(tl.between(1, 19), 1).otherwise(0))
        .cast("bigint")
        .alias("n_under_20_chars"),
        F.round(
            F.avg(F.when(tl < 20, 1.0).otherwise(0.0)), 6
        ).alias("junk_frac"),
    )


@register(
    "q340_conflicting_metadata",
    """
    WITH fp AS (
      SELECT md5(text) AS f,
             COUNT(*) AS n_copies,
             COUNT(DISTINCT lang) AS n_langs,
             COUNT(DISTINCT source) AS n_sources
      FROM documents GROUP BY md5(text)
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_fingerprints,
           CAST(SUM(CASE WHEN n_copies > 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_duplicated,
           CAST(SUM(CASE WHEN n_langs > 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_lang_conflicts,
           CAST(SUM(CASE WHEN n_sources > 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_source_conflicts
    FROM fp
    """,
)
def q340_conflicting_metadata(spark, sf_dir):
    """Conflicting-metadata audit: identical text (md5 fingerprint)
    carrying MORE THAN ONE language or source label — the
    label-noise detector that matters when labels feed training
    (one of the two labels is wrong, and naive per-label statistics
    double-count the text).  One fingerprint agg with two distinct
    counts riding it."""
    d = _t(spark, sf_dir, "documents")
    fp = d.groupBy(F.md5("text").alias("f")).agg(
        F.count(F.lit(1)).alias("n_copies"),
        F.count_distinct("lang").alias("n_langs"),
        F.count_distinct("source").alias("n_sources"),
    )
    return fp.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_fingerprints"),
        F.sum(F.when(F.col("n_copies") > 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_duplicated"),
        F.sum(F.when(F.col("n_langs") > 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_lang_conflicts"),
        F.sum(F.when(F.col("n_sources") > 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_source_conflicts"),
    )


@register(
    "q337_supplier_scorecard",
    """
    WITH lt AS (
      SELECT l.l_suppkey,
             date_diff('day', CAST(o.o_orderdate AS DATE),
                       CAST(l.l_shipdate AS DATE)) AS days,
             l.l_extendedprice
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE l.l_shipdate >= o.o_orderdate
    ),
    g AS (SELECT AVG(days) AS gmean, STDDEV_SAMP(days) AS gsd FROM lt),
    per AS (
      SELECT l_suppkey,
             COUNT(*) AS n_lines,
             AVG(days) AS mean_days,
             SUM(l_extendedprice) AS revenue
      FROM lt GROUP BY l_suppkey
      HAVING COUNT(*) >= 20
    )
    SELECT l_suppkey, n_lines,
           ROUND(mean_days, 4) AS mean_lead_days,
           ROUND((mean_days - (SELECT gmean FROM g))
                 / (SELECT gsd FROM g), 6) AS lead_z,
           ROUND(revenue, 2) AS revenue
    FROM per
    ORDER BY ROUND((mean_days - (SELECT gmean FROM g))
                   / (SELECT gsd FROM g), 6) DESC, l_suppkey ASC
    LIMIT 20
    """,
)
def q337_supplier_scorecard(spark, sf_dir):
    """Supplier reliability scorecard: the 20 suppliers with the worst
    mean order-to-ship lead time, z-scored against the global lead
    distribution (≥20 lines support), with the revenue exposed to
    them — the vendor-management table.  One fact join, global
    moments as a broadcast scalar, ranking on the ROUNDed z."""
    li = _t(spark, sf_dir, "lineitem")
    od = _t(spark, sf_dir, "orders")
    lt = (
        li.join(
            od.select("o_orderkey", "o_orderdate"),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .filter(F.col("l_shipdate") >= F.col("o_orderdate"))
        .select(
            "l_suppkey",
            F.datediff(
                F.to_date("l_shipdate"), F.to_date("o_orderdate")
            ).alias("days"),
            "l_extendedprice",
        )
    )
    lt = lt.localCheckpoint(eager=False)
    g = lt.agg(
        F.avg("days").alias("gmean"),
        F.stddev_samp("days").alias("gsd"),
    )
    per = (
        lt.groupBy("l_suppkey")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.avg("days").alias("mean_days"),
            F.sum("l_extendedprice").alias("revenue"),
        )
        .filter(F.col("n_lines") >= 20)
    )
    z = F.round(
        (F.col("mean_days") - F.col("gmean")) / F.col("gsd"), 6
    )
    return (
        per.crossJoin(F.broadcast(g))
        .orderBy(z.desc(), F.col("l_suppkey").asc())
        .limit(20)
        .select(
            "l_suppkey",
            "n_lines",
            F.round("mean_days", 4).alias("mean_lead_days"),
            z.alias("lead_z"),
            F.round("revenue", 2).alias("revenue"),
        )
    )


@register(
    "q338_return_rate_by_brand",
    """
    WITH j AS (
      SELECT p.p_brand,
             CASE WHEN l.l_returnflag = 'R' THEN 1.0 ELSE 0.0 END
               AS returned,
             l.l_extendedprice
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ),
    g AS (SELECT AVG(returned) AS grate FROM j)
    SELECT p_brand,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           ROUND(AVG(returned), 6) AS return_rate,
           ROUND(AVG(returned) - (SELECT grate FROM g), 6)
             AS vs_global,
           ROUND(SUM(CASE WHEN returned = 1.0
                     THEN l_extendedprice ELSE 0 END), 2)
             AS returned_revenue
    FROM j GROUP BY p_brand
    """,
)
def q338_return_rate_by_brand(spark, sf_dir):
    """Return-rate attribution by brand: each brand's R-flag share
    against the global rate, with the revenue value of returned lines
    — the product-quality triage table.  The part dimension broadcasts
    into the fact scan; one conditional agg."""
    li = _t(spark, sf_dir, "lineitem")
    pa = _t(spark, sf_dir, "part")
    j = li.join(
        F.broadcast(pa.select("p_partkey", "p_brand")),
        li.l_partkey == F.col("p_partkey"),
    ).select(
        "p_brand",
        F.when(F.col("l_returnflag") == "R", 1.0)
        .otherwise(0.0)
        .alias("returned"),
        "l_extendedprice",
    )
    j = j.localCheckpoint(eager=False)
    g = j.agg(F.avg("returned").alias("grate"))
    return (
        j.groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
            F.round(F.avg("returned"), 6).alias("return_rate"),
            F.avg("returned").alias("_r"),
            F.round(
                F.sum(
                    F.when(
                        F.col("returned") == 1.0,
                        F.col("l_extendedprice"),
                    ).otherwise(0.0)
                ),
                2,
            ).alias("returned_revenue"),
        )
        .crossJoin(F.broadcast(g))
        .select(
            "p_brand",
            "n_lines",
            "return_rate",
            F.round(F.col("_r") - F.col("grate"), 6).alias(
                "vs_global"
            ),
            "returned_revenue",
        )
    )


@register(
    "q335_single_source_risk",
    """
    WITH ps AS (
      SELECT l_partkey, COUNT(DISTINCT l_suppkey) AS n_suppliers,
             SUM(l_extendedprice) AS spend
      FROM lineitem GROUP BY l_partkey
    )
    SELECT n_suppliers,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           ROUND(SUM(spend), 2) AS spend_at_risk,
           ROUND(SUM(spend) / (SELECT SUM(spend) FROM ps), 6)
             AS spend_share
    FROM ps GROUP BY n_suppliers
    """,
)
def q335_single_source_risk(spark, sf_dir):
    """Single-source supply risk: parts histogrammed by their distinct
    supplier count, with the spend concentrated at each redundancy
    level — the n_suppliers=1 row is the revenue a single supplier
    failure strands.  One distinct-count agg per part, one histogram
    agg; total spend folds in as a broadcast scalar."""
    li = _t(spark, sf_dir, "lineitem")
    ps = li.groupBy("l_partkey").agg(
        F.count_distinct("l_suppkey").alias("n_suppliers"),
        F.sum("l_extendedprice").alias("spend"),
    )
    ps = ps.localCheckpoint(eager=False)
    tot = ps.agg(F.sum("spend").alias("t"))
    return (
        ps.groupBy("n_suppliers")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_parts"),
            F.sum("spend").alias("spend_raw"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "n_suppliers",
            "n_parts",
            F.round("spend_raw", 2).alias("spend_at_risk"),
            F.round(F.col("spend_raw") / F.col("t"), 6).alias(
                "spend_share"
            ),
        )
    )


@register(
    "q336_price_dispersion",
    """
    WITH unit AS (
      SELECT l_partkey,
             l_extendedprice / l_quantity AS unit_price
      FROM lineitem WHERE l_quantity > 0
    ),
    per AS (
      SELECT l_partkey,
             COUNT(*) AS n_sales,
             AVG(unit_price) AS mean_p,
             STDDEV_SAMP(unit_price) AS sd_p
      FROM unit GROUP BY l_partkey
      HAVING COUNT(*) >= 5
    )
    SELECT l_partkey, n_sales,
           ROUND(mean_p, 4) AS mean_unit_price,
           ROUND(sd_p / mean_p, 6) AS price_cv
    FROM per
    ORDER BY ROUND(sd_p / mean_p, 6) DESC, l_partkey ASC
    LIMIT 25
    """,
)
def q336_price_dispersion(spark, sf_dir):
    """Price-consistency audit: the 25 parts with the highest
    coefficient of variation of realized unit price (≥5 sales) —
    erratic pricing is either discount leakage or data error, and CV
    normalizes across price levels.  Grouped sufficient statistics,
    then TakeOrderedAndProject for the top slice, ranking on the
    ROUNDed CV with a key tiebreak (the house float discipline)."""
    li = _t(spark, sf_dir, "lineitem")
    unit = li.filter(F.col("l_quantity") > 0).select(
        "l_partkey",
        (F.col("l_extendedprice") / F.col("l_quantity")).alias(
            "unit_price"
        ),
    )
    per = (
        unit.groupBy("l_partkey")
        .agg(
            F.count(F.lit(1)).alias("n_sales"),
            F.avg("unit_price").alias("mean_p"),
            F.stddev_samp("unit_price").alias("sd_p"),
        )
        .filter(F.col("n_sales") >= 5)
    )
    return (
        per.orderBy(
            F.round(F.col("sd_p") / F.col("mean_p"), 6).desc(),
            F.col("l_partkey").asc(),
        )
        .limit(25)
        .select(
            "l_partkey",
            "n_sales",
            F.round("mean_p", 4).alias("mean_unit_price"),
            F.round(F.col("sd_p") / F.col("mean_p"), 6).alias(
                "price_cv"
            ),
        )
    )


@register(
    "q333_price_volume_decomposition",
    """
    WITH monthly AS (
      SELECT CAST(date_trunc('month', l_shipdate) AS DATE) AS month,
             SUM(l_quantity) AS q,
             SUM(l_extendedprice) / SUM(l_quantity) AS p
      FROM lineitem GROUP BY 1
    ),
    lagged AS (
      SELECT month, q, p,
             LAG(q) OVER (ORDER BY month) AS q0,
             LAG(p) OVER (ORDER BY month) AS p0
      FROM monthly
    )
    SELECT month,
           ROUND(q * p - q0 * p0, 2) AS revenue_delta,
           ROUND((q - q0) * p0, 2) AS volume_effect,
           ROUND(q0 * (p - p0), 2) AS price_effect,
           ROUND((q - q0) * (p - p0), 2) AS interaction
    FROM lagged WHERE q0 IS NOT NULL
    """,
)
def q333_price_volume_decomposition(spark, sf_dir):
    """Month-over-month revenue bridge: ΔR = Δq·p₀ + q₀·Δp + Δq·Δp —
    how much of each month's revenue change came from shipping MORE
    vs charging MORE (the finance bridge chart).  One monthly partial
    agg; the decomposition is a lag window over a dozen rows, and the
    three effects plus interaction reconcile to the revenue delta by
    construction."""
    li = _t(spark, sf_dir, "lineitem")
    monthly = li.groupBy(
        F.to_date(F.date_trunc("month", "l_shipdate")).alias("month")
    ).agg(
        F.sum("l_quantity").alias("q"),
        (F.sum("l_extendedprice") / F.sum("l_quantity")).alias("p"),
    )
    w = Window.orderBy("month")
    lagged = monthly.select(
        "month",
        "q",
        "p",
        F.lag("q").over(w).alias("q0"),
        F.lag("p").over(w).alias("p0"),
    ).filter(F.col("q0").isNotNull())
    return lagged.select(
        "month",
        F.round(
            F.col("q") * F.col("p") - F.col("q0") * F.col("p0"), 2
        ).alias("revenue_delta"),
        F.round((F.col("q") - F.col("q0")) * F.col("p0"), 2).alias(
            "volume_effect"
        ),
        F.round(F.col("q0") * (F.col("p") - F.col("p0")), 2).alias(
            "price_effect"
        ),
        F.round(
            (F.col("q") - F.col("q0")) * (F.col("p") - F.col("p0")), 2
        ).alias("interaction"),
    )


@register(
    "q334_brand_price_position",
    """
    WITH type_avg AS (
      SELECT p_type, AVG(p_retailprice) AS type_mean,
             COUNT(*) AS n_in_type
      FROM part GROUP BY p_type
    ),
    pos AS (
      SELECT p.p_brand, p.p_type,
             COUNT(*) AS n_parts,
             AVG(p.p_retailprice) AS brand_mean,
             MAX(t.type_mean) AS type_mean
      FROM part p JOIN type_avg t ON p.p_type = t.p_type
      WHERE t.n_in_type >= 5
      GROUP BY p.p_brand, p.p_type
      HAVING COUNT(*) >= 3
    )
    SELECT p_brand, p_type, n_parts,
           ROUND(brand_mean, 4) AS brand_mean,
           ROUND(brand_mean / type_mean, 6) AS price_position
    FROM pos
    """,
)
def q334_brand_price_position(spark, sf_dir):
    """Brand price-position index: each brand's mean retail price
    relative to its product type's mean (>1 = premium positioning) —
    the merchandising benchmark table, with minimum-support filters on
    both levels so thin cells don't masquerade as positioning.  Two
    grouped passes over the part dimension; type means broadcast."""
    pa = _t(spark, sf_dir, "part")
    type_avg = (
        pa.groupBy("p_type")
        .agg(
            F.avg("p_retailprice").alias("type_mean"),
            F.count(F.lit(1)).alias("n_in_type"),
        )
        .filter(F.col("n_in_type") >= 5)
    )
    return (
        pa.join(F.broadcast(type_avg), "p_type")
        .groupBy("p_brand", "p_type")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.avg("p_retailprice").alias("brand_mean"),
            F.max("type_mean").alias("type_mean"),
        )
        .filter(F.col("n_parts") >= 3)
        .select(
            "p_brand",
            "p_type",
            "n_parts",
            F.round("brand_mean", 4).alias("brand_mean"),
            F.round(
                F.col("brand_mean") / F.col("type_mean"), 6
            ).alias("price_position"),
        )
    )


@register(
    "q331_time_hierarchy_rollup",
    """
    WITH base AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
             CAST(date_trunc('week', o_orderdate) AS DATE) AS week,
             CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
             o_totalprice
      FROM orders
    )
    SELECT 'day' AS grain, day AS period,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS revenue
    FROM base GROUP BY day
    UNION ALL
    SELECT 'week', week, COUNT(*), ROUND(SUM(o_totalprice), 2)
    FROM base GROUP BY week
    UNION ALL
    SELECT 'month', month, COUNT(*), ROUND(SUM(o_totalprice), 2)
    FROM base GROUP BY month
    """,
)
def q331_time_hierarchy_rollup(spark, sf_dir):
    """Time-hierarchy rollup: revenue at day, week, and month grain in
    one result set with an explicit grain tag — the calendar analog of
    dimensional GROUPING SETS, expressed as grouping sets over derived
    time parts so Spark plans ONE scan + Expand instead of three
    scans."""
    od = _t(spark, sf_dir, "orders")
    base = od.select(
        F.to_date(F.date_trunc("DAY", "o_orderdate")).alias("day"),
        F.to_date(F.date_trunc("week", "o_orderdate")).alias("week"),
        F.to_date(F.date_trunc("month", "o_orderdate")).alias("month"),
        "o_totalprice",
    )
    base.createOrReplaceTempView("_q331_base")
    return spark.sql(
        """
        SELECT CASE WHEN day IS NOT NULL THEN 'day'
                    WHEN week IS NOT NULL THEN 'week'
                    ELSE 'month' END AS grain,
               COALESCE(day, week, month) AS period,
               COUNT(*) AS n_orders,
               ROUND(SUM(o_totalprice), 2) AS revenue
        FROM _q331_base
        GROUP BY GROUPING SETS ((day), (week), (month))
        """
    )


@register(
    "q332_feature_hashing",
    """
    WITH pairs AS (
      SELECT DISTINCT user_id, event_type FROM events
    ),
    hashed AS (
      SELECT user_id, event_type,
             ('0x' || substr(md5(event_type), 1, 15))::BIGINT % 32
               AS bucket
      FROM pairs
    ),
    bucket_types AS (
      SELECT bucket, COUNT(DISTINCT event_type) AS n_types
      FROM hashed GROUP BY bucket
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_buckets_used,
           CAST(SUM(CASE WHEN n_types > 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_colliding_buckets,
           CAST(MAX(n_types) AS BIGINT) AS max_types_per_bucket,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM hashed)
             AS n_user_features
    FROM bucket_types
    """,
)
def q332_feature_hashing(spark, sf_dir):
    """Feature-hashing (hashing-trick) audit: categorical event-type
    features hash into 32 buckets via the portable md5-60bit hash;
    report bucket usage, collision count, and worst collision — the
    dimensionality-vs-collision tradeoff check that precedes choosing
    the hash width for sparse models.  Distinct user-feature pairs are
    the only data-sized stage."""
    from graphmapreduce_spark.functions.text import md5_hash60

    ev = _t(spark, sf_dir, "events")
    pairs = ev.select("user_id", "event_type").distinct()
    hashed = pairs.select(
        "user_id",
        "event_type",
        (md5_hash60("event_type") % 32).alias("bucket"),
    )
    hashed = hashed.localCheckpoint(eager=False)
    bt = hashed.groupBy("bucket").agg(
        F.count_distinct("event_type").alias("n_types")
    )
    n_feat = hashed.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_user_features")
    )
    return (
        bt.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_buckets_used"),
            F.sum(F.when(F.col("n_types") > 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_colliding_buckets"),
            F.max("n_types").cast("bigint").alias(
                "max_types_per_bucket"
            ),
        )
        .crossJoin(F.broadcast(n_feat))
    )


@register(
    "q329_scale_agreement",
    """
    WITH s AS (
      SELECT stddev_samp(l_extendedprice) AS sd,
             mad(l_extendedprice) * 1.4826 AS mad_sigma,
             (quantile_cont(l_extendedprice, 0.75)
              - quantile_cont(l_extendedprice, 0.25)) / 1.349
               AS iqr_sigma
      FROM lineitem
    )
    SELECT ROUND(sd, 4) AS stddev,
           ROUND(mad_sigma, 4) AS mad_sigma,
           ROUND(iqr_sigma, 4) AS iqr_sigma,
           ROUND(mad_sigma / sd, 6) AS mad_over_sd,
           ROUND(iqr_sigma / sd, 6) AS iqr_over_sd
    FROM s
    """,
)
def q329_scale_agreement(spark, sf_dir):
    """Scale-estimator agreement audit: σ̂ from stddev, from
    MAD·1.4826, and from IQR/1.349 — all three agree near 1.0 only for
    Gaussian-ish data, so the ratios are a one-row normality smell
    test that tells you whether z-score fences (q193) or robust fences
    (q115/q145) are the right outlier tool for this column.  One scan;
    MAD needs the median-of-deviations two-phase, fused here into
    percentile aggregates."""
    li = _t(spark, sf_dir, "lineitem")
    med = li.agg(
        F.expr("percentile(l_extendedprice, 0.5)").alias("m")
    )
    s = (
        li.crossJoin(F.broadcast(med))
        .agg(
            F.stddev_samp("l_extendedprice").alias("sd"),
            (
                F.expr(
                    "percentile(abs(l_extendedprice - m), 0.5)"
                )
                * 1.4826
            ).alias("mad_sigma"),
            (
                (
                    F.expr("percentile(l_extendedprice, 0.75)")
                    - F.expr("percentile(l_extendedprice, 0.25)")
                )
                / 1.349
            ).alias("iqr_sigma"),
        )
    )
    return s.select(
        F.round("sd", 4).alias("stddev"),
        F.round("mad_sigma", 4).alias("mad_sigma"),
        F.round("iqr_sigma", 4).alias("iqr_sigma"),
        F.round(F.col("mad_sigma") / F.col("sd"), 6).alias(
            "mad_over_sd"
        ),
        F.round(F.col("iqr_sigma") / F.col("sd"), 6).alias(
            "iqr_over_sd"
        ),
    )


@register(
    "q330_ingest_order_drift",
    r"""
    WITH t AS (
      SELECT doc_id,
             NTILE(10) OVER (ORDER BY doc_id) AS decile,
             n_chars::DOUBLE AS len,
             len(regexp_extract_all(text, '[A-Za-z]'))::DOUBLE
               / GREATEST(length(text), 1) AS alpha_ratio
      FROM documents
    ),
    per AS (
      SELECT decile,
             COUNT(*) AS n_docs,
             ROUND(AVG(len), 4) AS mean_len,
             ROUND(AVG(alpha_ratio), 6) AS mean_alpha
      FROM t GROUP BY decile
    ),
    drift AS (
      SELECT corr(decile, mean_len) AS c_len,
             corr(decile, mean_alpha) AS c_alpha
      FROM per
    )
    SELECT per.decile, per.n_docs, per.mean_len, per.mean_alpha,
           ROUND((SELECT c_len FROM drift), 6) AS len_drift_corr,
           ROUND((SELECT c_alpha FROM drift), 6) AS alpha_drift_corr
    FROM per
    """,
)
def q330_ingest_order_drift(spark, sf_dir):
    """Ingest-order drift: quality proxies (length, alphabetic ratio)
    per doc_id decile, with the decile-vs-metric correlation attached
    — a strong correlation means the corpus CHANGES along ingest
    order (crawl frontier decay, source exhaustion) and random splits
    of it are not exchangeable.  NTILE over the docs-sized table;
    drift scalars fold back onto the 10-row decile profile."""
    d = _t(spark, sf_dir, "documents")
    w = Window.orderBy("doc_id")
    t = d.select(
        "doc_id",
        F.ntile(10).over(w).alias("decile"),
        F.col("n_chars").cast("double").alias("len"),
        (
            F.size(
                F.expr("regexp_extract_all(text, '[A-Za-z]', 0)")
            ).cast("double")
            / F.greatest(F.length("text"), F.lit(1))
        ).alias("alpha_ratio"),
    )
    per = t.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("len"), 4).alias("mean_len"),
        F.round(F.avg("alpha_ratio"), 6).alias("mean_alpha"),
    )
    per = per.localCheckpoint(eager=False)
    drift = per.agg(
        F.round(F.corr("decile", "mean_len"), 6).alias("c_len"),
        F.round(F.corr("decile", "mean_alpha"), 6).alias("c_alpha"),
    )
    return per.crossJoin(F.broadcast(drift)).select(
        "decile",
        "n_docs",
        "mean_len",
        "mean_alpha",
        F.col("c_len").alias("len_drift_corr"),
        F.col("c_alpha").alias("alpha_drift_corr"),
    )


@register(
    "q327_binned_percentile_error",
    """
    WITH b AS (
      SELECT MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi
      FROM orders
    ),
    binned AS (
      SELECT LEAST(CAST(FLOOR((o_totalprice - b.lo)
                   / ((b.hi - b.lo) / 20.0)) AS BIGINT), 19) AS bin,
             COUNT(*) AS n
      FROM orders CROSS JOIN b
      GROUP BY 1
    ),
    tot AS (SELECT SUM(n)::DOUBLE AS t FROM binned),
    cum AS (
      SELECT bin, n,
             SUM(n) OVER (ORDER BY bin
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS c
      FROM binned
    ),
    medbin AS (
      SELECT MIN(bin) AS mb FROM cum
      WHERE c >= (SELECT t FROM tot) / 2.0
    ),
    est AS (
      SELECT b.lo + ((SELECT mb FROM medbin)
             + ((SELECT t FROM tot) / 2.0
                - COALESCE((SELECT MAX(c) FROM cum
                            WHERE bin < (SELECT mb FROM medbin)), 0))
               / (SELECT n FROM cum
                  WHERE bin = (SELECT mb FROM medbin)))
             * ((b.hi - b.lo) / 20.0) AS p50_est
      FROM b
    ),
    exact AS (
      SELECT quantile_cont(o_totalprice, 0.5) AS p50 FROM orders
    )
    SELECT ROUND((SELECT p50 FROM exact), 4) AS exact_p50,
           ROUND((SELECT p50_est FROM est), 4) AS binned_p50,
           ROUND(ABS((SELECT p50_est FROM est)
                 - (SELECT p50 FROM exact))
                 / (SELECT p50 FROM exact), 6) AS rel_error
    """,
)
def q327_binned_percentile_error(spark, sf_dir):
    """Binned-median error audit: estimate p50 from a 20-bucket
    equi-width histogram by within-bin linear interpolation and
    compare against the exact percentile — measures what the cheap
    mergeable-histogram shortcut costs on THIS distribution (the
    decision input for sketch-vs-exact at scale, companion to the
    KLL accuracy bounds).  Everything after the one binning pass runs
    on 20 rows."""
    od = _t(spark, sf_dir, "orders")
    b = od.agg(
        F.min("o_totalprice").alias("lo"),
        F.max("o_totalprice").alias("hi"),
    )
    width = (F.col("hi") - F.col("lo")) / 20.0
    binned = (
        od.crossJoin(F.broadcast(b))
        .groupBy(
            F.least(
                F.floor((F.col("o_totalprice") - F.col("lo")) / width),
                F.lit(19),
            )
            .cast("bigint")
            .alias("bin")
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    binned = binned.localCheckpoint(eager=False)
    tot = binned.agg(F.sum("n").cast("double").alias("t"))
    wc = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = binned.select(
        "bin", "n", F.sum("n").over(wc).alias("c")
    ).crossJoin(F.broadcast(tot))
    medbin = (
        cum.filter(F.col("c") >= F.col("t") / 2.0)
        .agg(F.min("bin").alias("mb"))
    )
    below = (
        cum.crossJoin(F.broadcast(medbin))
        .filter(F.col("bin") < F.col("mb"))
        .agg(F.coalesce(F.max("c"), F.lit(0)).alias("cb"))
    )
    inbin = (
        cum.crossJoin(F.broadcast(medbin))
        .filter(F.col("bin") == F.col("mb"))
        .select(F.col("n").alias("nb"), F.col("t"))
    )
    exact = od.agg(
        F.expr("percentile(o_totalprice, 0.5)").alias("p50")
    )
    est = (
        b.crossJoin(F.broadcast(medbin))
        .crossJoin(F.broadcast(below))
        .crossJoin(F.broadcast(inbin))
        .select(
            (
                F.col("lo")
                + (
                    F.col("mb")
                    + (F.col("t") / 2.0 - F.col("cb")) / F.col("nb")
                )
                * (F.col("hi") - F.col("lo"))
                / 20.0
            ).alias("p50_est")
        )
    )
    return est.crossJoin(F.broadcast(exact)).select(
        F.round("p50", 4).alias("exact_p50"),
        F.round("p50_est", 4).alias("binned_p50"),
        F.round(
            F.abs(F.col("p50_est") - F.col("p50")) / F.col("p50"), 6
        ).alias("rel_error"),
    )


@register(
    "q328_negbin_fit",
    r"""
    WITH t AS (
      SELECT len(list_filter(string_split_regex(trim(text), '\s+'),
                             x -> x <> ''))::DOUBLE AS k
      FROM documents
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(AVG(k), 6) AS mean_tokens,
           ROUND(VAR_SAMP(k), 6) AS var_tokens,
           ROUND(VAR_SAMP(k) / AVG(k), 6) AS dispersion,
           ROUND(AVG(k) / VAR_SAMP(k), 6) AS nb_p,
           ROUND(AVG(k) * AVG(k) / (VAR_SAMP(k) - AVG(k)), 6) AS nb_r
    FROM t
    """,
)
def q328_negbin_fit(spark, sf_dir):
    """Negative-binomial moment fit of tokens-per-document:
    p = m/v, r = m²/(v−m) — valid when the dispersion v/m exceeds 1
    (Poisson would have v = m; real document lengths are
    overdispersed), completing the distribution-fit family
    (lognormal q315, exponential q322, Weibull q325).  One scan of
    sufficient statistics."""
    d = _t(spark, sf_dir, "documents")
    t = d.select(T.n_words("text").cast("double").alias("k"))
    return t.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("k"), 6).alias("mean_tokens"),
        F.round(F.var_samp("k"), 6).alias("var_tokens"),
        F.round(F.var_samp("k") / F.avg("k"), 6).alias("dispersion"),
        F.round(F.avg("k") / F.var_samp("k"), 6).alias("nb_p"),
        F.round(
            F.avg("k") * F.avg("k") / (F.var_samp("k") - F.avg("k")),
            6,
        ).alias("nb_r"),
    )


@register(
    "q325_weibull_fit",
    """
    WITH firsts AS (
      SELECT user_id, MIN(epoch(ts)) AS t0 FROM events
      GROUP BY user_id
    ),
    conv AS (
      SELECT f.user_id,
             (MIN(e.ts_epoch) - f.t0) / 86400.0 AS t_days
      FROM firsts f
      JOIN (SELECT user_id, epoch(ts) AS ts_epoch FROM events
            WHERE event_type = 'purchase') e
        ON e.user_id = f.user_id AND e.ts_epoch > f.t0
      GROUP BY f.user_id, f.t0
    ),
    n AS (SELECT COUNT(*)::DOUBLE AS n FROM conv),
    ranked AS (
      SELECT t_days,
             ROW_NUMBER() OVER (ORDER BY t_days, user_id) AS r
      FROM conv
    ),
    pts AS (
      SELECT ln(t_days) AS x,
             ln(-ln(1.0 - (r - 0.3) / ((SELECT n FROM n) + 0.4)))
               AS y
      FROM ranked WHERE t_days > 0
    ),
    m AS (SELECT AVG(x) AS mx, AVG(y) AS my FROM pts)
    SELECT CAST((SELECT n FROM n) AS BIGINT) AS n_events,
           ROUND(SUM((x - m.mx) * (y - m.my))
                 / SUM(POWER(x - m.mx, 2)), 6) AS weibull_shape_k,
           ROUND(EXP(m.mx - m.my * SUM(POWER(x - m.mx, 2))
                 / SUM((x - m.mx) * (y - m.my))), 4)
             AS weibull_scale_days
    FROM pts CROSS JOIN m
    GROUP BY m.mx, m.my
    """,
)
def q325_weibull_fit(spark, sf_dir):
    """Weibull fit of time-to-first-purchase by median-rank
    regression: plot ln(-ln(1-F)) against ln t using Benard's
    approximation F ≈ (r-0.3)/(n+0.4), fit by OLS — shape k < 1 means
    conversion hazard DECREASES with time (convert early or never),
    k > 1 means ripening.  The parametric layer over q228's
    Kaplan-Meier; ranks via `global_rank`, fit on sufficient
    statistics."""
    from graphmapreduce_spark.operators.sort import global_rank

    ev = _t(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.unix_micros("ts") / 1e6).alias("t0")
    )
    conv = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", (F.unix_micros("ts") / 1e6).alias("tp"))
        .join(firsts, "user_id")
        .filter(F.col("tp") > F.col("t0"))
        .groupBy("user_id", "t0")
        .agg(F.min("tp").alias("tp"))
        .select(
            "user_id",
            ((F.col("tp") - F.col("t0")) / 86400.0).alias("t_days"),
        )
    )
    conv = conv.localCheckpoint(eager=False)
    n = conv.agg(F.count(F.lit(1)).cast("double").alias("n"))
    ranked = global_rank(conv, ["t_days", "user_id"], rank_col="r")
    pts = (
        ranked.crossJoin(F.broadcast(n))
        .filter(F.col("t_days") > 0)
        .select(
            F.log("t_days").alias("x"),
            F.log(
                -F.log(
                    1.0 - (F.col("r") - 0.3) / (F.col("n") + 0.4)
                )
            ).alias("y"),
            F.col("n"),
        )
    )
    m = pts.agg(F.avg("x").alias("mx"), F.avg("y").alias("my"))
    fit = pts.crossJoin(F.broadcast(m)).agg(
        F.max("n").cast("bigint").alias("n_events"),
        (
            F.sum((F.col("x") - F.col("mx")) * (F.col("y") - F.col("my")))
            / F.sum(F.pow(F.col("x") - F.col("mx"), 2))
        ).alias("k"),
        F.max("mx").alias("mx"),
        F.max("my").alias("my"),
    )
    return fit.select(
        "n_events",
        F.round("k", 6).alias("weibull_shape_k"),
        F.round(
            F.exp(F.col("mx") - F.col("my") / F.col("k")), 4
        ).alias("weibull_scale_days"),
    )


@register(
    "q326_early_value_signal",
    """
    WITH firsts AS (
      SELECT user_id, MIN(epoch(ts)) AS t0 FROM events GROUP BY user_id
    ),
    spend AS (
      SELECT e.user_id,
             SUM(CASE WHEN epoch(e.ts) <= f.t0 + 7 * 86400
                      AND e.event_type = 'purchase'
                      THEN e.value ELSE 0 END) AS week1,
             SUM(CASE WHEN e.event_type = 'purchase'
                      THEN e.value ELSE 0 END) AS total
      FROM events e JOIN firsts f ON e.user_id = f.user_id
      GROUP BY e.user_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
           ROUND(corr(week1, total), 6) AS corr_week1_total,
           ROUND(AVG(CASE WHEN total > 0
                     THEN week1 / total END), 6)
             AS avg_week1_share
    FROM spend
    """,
)
def q326_early_value_signal(spark, sf_dir):
    """Early-value signal: does first-week spend predict lifetime
    spend?  Correlation of week-1 vs total purchase value per user,
    plus the average share of lifetime value captured in week 1 — the
    'how early can we score a user' number behind LTV models.  One
    grouped conditional-sum pass with the per-user start time joined
    in."""
    ev = _t(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.unix_micros("ts") / 1e6).alias("t0")
    )
    spend = (
        ev.join(firsts, "user_id")
        .groupBy("user_id")
        .agg(
            F.sum(
                F.when(
                    (
                        F.unix_micros("ts") / 1e6
                        <= F.col("t0") + 7 * 86400
                    )
                    & (F.col("event_type") == "purchase"),
                    F.col("value"),
                ).otherwise(0.0)
            ).alias("week1"),
            F.sum(
                F.when(
                    F.col("event_type") == "purchase", F.col("value")
                ).otherwise(0.0)
            ).alias("total"),
        )
    )
    return spend.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.round(F.corr("week1", "total"), 6).alias("corr_week1_total"),
        F.round(
            F.avg(
                F.when(
                    F.col("total") > 0, F.col("week1") / F.col("total")
                )
            ),
            6,
        ).alias("avg_week1_share"),
    )


@register(
    "q323_gini_mean_difference",
    """
    WITH ranked AS (
      SELECT o_totalprice AS x,
             ROW_NUMBER() OVER (ORDER BY o_totalprice, o_orderkey)
               AS r,
             COUNT(*) OVER () AS n
      FROM orders
    )
    SELECT CAST(MAX(n) AS BIGINT) AS n,
           ROUND(SUM((2.0 * r - n - 1) * x)
                 / (MAX(n) * (MAX(n) - 1.0) / 2.0) / 2.0, 4)
             AS gini_mean_difference,
           ROUND(AVG(x), 4) AS mean_x
    FROM ranked
    """,
)
def q323_gini_mean_difference(spark, sf_dir):
    """Gini mean difference E|X−Y| of order values WITHOUT the
    pairwise join, via the sorted-rank identity
    E|X−Y| = Σ(2r−n−1)·x_r / (n(n−1)/2) / 2 — the robust dispersion
    scalar whose ratio to the mean is twice the Gini coefficient.
    Ranks come from the range-partitioned `global_rank`; one pass,
    closed form, no O(n²) anywhere."""
    from graphmapreduce_spark.operators.sort import global_rank

    od = _t(spark, sf_dir, "orders").select(
        F.col("o_totalprice").alias("x"), "o_orderkey"
    )
    ranked = global_rank(od, ["x", "o_orderkey"], rank_col="r")
    n = ranked.agg(F.count(F.lit(1)).alias("n"))
    return (
        ranked.crossJoin(F.broadcast(n))
        .agg(
            F.max("n").cast("bigint").alias("n"),
            F.round(
                F.sum(
                    (2.0 * F.col("r") - F.col("n") - 1) * F.col("x")
                )
                / (F.max("n") * (F.max("n") - 1.0) / 2.0)
                / 2.0,
                4,
            ).alias("gini_mean_difference"),
            F.round(F.avg("x"), 4).alias("mean_x"),
        )
    )


def _expected_steps_oracle_sql(steps: int = 20) -> str:
    """Unrolled value iteration h ← 1 + P_sub·h for expected steps to
    absorption at 'purchase' (the q301 technique on the hitting-time
    equation; transient states only)."""
    ctes = [
        """
    seq AS (
      SELECT event_type,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_event
      FROM events
    ),
    c AS MATERIALIZED (
      SELECT prev_event, event_type AS event, COUNT(*)::DOUBLE AS n
      FROM seq WHERE prev_event IS NOT NULL GROUP BY 1, 2
    ),
    p AS MATERIALIZED (
      SELECT c.prev_event, c.event, c.n / t.tot AS p
      FROM c JOIN (SELECT prev_event, SUM(n) AS tot FROM c
                   GROUP BY prev_event) t USING (prev_event)
    ),
    trans AS MATERIALIZED (SELECT DISTINCT prev_event AS s FROM c
              WHERE prev_event <> 'purchase'),
    h0 AS (SELECT s, 0.0 AS h FROM trans)
        """
    ]
    prev = "h0"
    for i in range(1, steps + 1):
        ctes.append(
            f"""
    h{i} AS (
      SELECT trans.s,
             1.0 + COALESCE(SUM(p.p * {prev}.h), 0.0) AS h
      FROM trans
      LEFT JOIN p ON p.prev_event = trans.s
                 AND p.event <> 'purchase'
      LEFT JOIN {prev} ON {prev}.s = p.event
      GROUP BY trans.s
    )
            """
        )
        prev = f"h{i}"
    return (
        "WITH "
        + ",".join(ctes)
        + f"""
    SELECT s AS state, ROUND(h, 6) AS expected_steps_to_purchase
    FROM {prev}
    """
    )


@register(
    "q324_expected_steps_to_purchase",
    _expected_steps_oracle_sql(),
)
def q324_expected_steps_to_purchase(spark, sf_dir):
    """Expected number of steps to reach 'purchase' from each event
    state, treating purchase as absorbing: 20 value-iteration steps of
    h ← 1 + P_sub·h on the transient-state transition matrix — the
    funnel-friction scalar per state ('how many more events until a
    signup-state user buys').  Each iteration is a ≤25-row broadcast
    join-agg; the oracle unrolls identically (q301 technique)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.withColumn("prev_event", F.lag("event_type").over(w))
    c = (
        seq.filter(F.col("prev_event").isNotNull())
        .groupBy("prev_event", F.col("event_type").alias("event"))
        .agg(F.count(F.lit(1)).cast("double").alias("n"))
    )
    tot = c.groupBy("prev_event").agg(F.sum("n").alias("tot"))
    p = (
        c.join(tot, "prev_event")
        .select(
            "prev_event", "event", (F.col("n") / F.col("tot")).alias("p")
        )
        .filter(F.col("event") != "purchase")
        .localCheckpoint(eager=True)
    )
    trans = (
        c.select(F.col("prev_event").alias("s"))
        .filter(F.col("s") != "purchase")
        .distinct()
        .localCheckpoint(eager=True)
    )
    h = trans.withColumn("h", F.lit(0.0))
    for it in range(20):
        if it and it % 5 == 0:
            # 4-row state table, but 20 nested broadcast-join layers
            # cost ~90 s in ANALYSIS alone — truncate the plan
            h = h.localCheckpoint(eager=True)
        h = (
            trans.join(
                F.broadcast(p), p.prev_event == trans.s, "left"
            )
            .join(
                F.broadcast(
                    h.select(
                        F.col("s").alias("hs"), F.col("h").alias("hv")
                    )
                ),
                F.col("event") == F.col("hs"),
                "left",
            )
            .groupBy("s")
            .agg(
                (
                    F.lit(1.0)
                    + F.coalesce(
                        F.sum(F.col("p") * F.col("hv")), F.lit(0.0)
                    )
                ).alias("h")
            )
        )
    return h.select(
        F.col("s").alias("state"),
        F.round("h", 6).alias("expected_steps_to_purchase"),
    )


@register(
    "q321_char_bigram_entropy",
    """
    WITH grams AS (
      SELECT lang,
             UNNEST(CASE WHEN length(text) >= 2
                    THEN list_transform(range(1, length(text)),
                                        i -> substr(text, i, 2))
                    ELSE [] END) AS g
      FROM documents
    ),
    c AS (
      SELECT lang, substr(g, 1, 1) AS c1, g,
             COUNT(*)::DOUBLE AS n
      FROM grams GROUP BY lang, substr(g, 1, 1), g
    ),
    ctx AS (
      SELECT lang, c1, SUM(n) AS t FROM c GROUP BY lang, c1
    ),
    tot AS (SELECT lang, SUM(t) AS g FROM ctx GROUP BY lang)
    SELECT c.lang,
           ROUND(-SUM((c.n / tot.g) * ln(c.n / ctx.t) / ln(2)), 6)
             AS h_cond_bits
    FROM c
    JOIN ctx ON c.lang = ctx.lang AND c.c1 = ctx.c1
    JOIN tot ON c.lang = tot.lang
    GROUP BY c.lang
    """,
)
def q321_char_bigram_entropy(spark, sf_dir):
    """Character-level conditional entropy H(next char | current char)
    per language, in bits: the bigram upgrade over q104's unigram
    character entropy and a sharper language/compressibility
    fingerprint (natural language sits well below the unigram bound).
    Computed as -Σ p(c1,c2)·log p(c2|c1) over the bigram-type table —
    the heavy lifting is one grouped count; the entropy folds over
    the types table only."""
    d = _t(spark, sf_dir, "documents")
    grams = d.select(
        "lang",
        F.explode(T.char_shingles("text", 2, distinct=False)).alias(
            "g"
        ),
    )
    c = grams.groupBy(
        "lang", F.substring("g", 1, 1).alias("c1"), "g"
    ).agg(F.count(F.lit(1)).cast("double").alias("n"))
    ctx = c.groupBy("lang", "c1").agg(F.sum("n").alias("t"))
    tot = ctx.groupBy("lang").agg(F.sum("t").alias("g_tot"))
    return (
        c.join(ctx, ["lang", "c1"])
        .join(F.broadcast(tot), "lang")
        .groupBy("lang")
        .agg(
            F.round(
                -F.sum(
                    (F.col("n") / F.col("g_tot"))
                    * F.log(F.col("n") / F.col("t"))
                    / F.log(F.lit(2.0))
                ),
                6,
            ).alias("h_cond_bits")
        )
    )


@register(
    "q322_exponential_gap_fit",
    """
    WITH g AS (
      SELECT epoch(ts) - epoch(LAG(ts) OVER (
               PARTITION BY user_id ORDER BY ts, event_id)) AS gap
      FROM events
    ),
    gaps AS (SELECT gap FROM g WHERE gap IS NOT NULL AND gap > 0)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_gaps,
           ROUND(1.0 / AVG(gap), 9) AS lambda_per_s,
           ROUND(quantile_cont(gap, 0.5), 4) AS median_gap_s,
           ROUND(ln(2) * AVG(gap), 4) AS exp_predicted_median_s,
           ROUND(quantile_cont(gap, 0.5) / (ln(2) * AVG(gap)), 6)
             AS memorylessness_ratio
    FROM gaps
    """,
)
def q322_exponential_gap_fit(spark, sf_dir):
    """Exponential fit of per-user inter-event gaps: rate MLE
    λ = 1/mean, plus the memorylessness check — an exponential process
    has median = ln2/λ, so the observed-median / predicted-median
    ratio far from 1 (here: heavy-tailed, ratio ≪ 1) quantifies how
    non-Poisson user behavior is, justifying the burstiness-aware
    models (q306).  One lag window, one aggregate."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    g = ev.select(
        (
            F.unix_micros("ts") / 1e6
            - F.unix_micros(F.lag("ts").over(w)) / 1e6
        ).alias("gap")
    ).filter(F.col("gap").isNotNull() & (F.col("gap") > 0))
    return g.agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.round(1.0 / F.avg("gap"), 9).alias("lambda_per_s"),
        F.round(F.expr("percentile(gap, 0.5)"), 4).alias(
            "median_gap_s"
        ),
        F.round(F.log(F.lit(2.0)) * F.avg("gap"), 4).alias(
            "exp_predicted_median_s"
        ),
        F.round(
            F.expr("percentile(gap, 0.5)")
            / (F.log(F.lit(2.0)) * F.avg("gap")),
            6,
        ).alias("memorylessness_ratio"),
    )


@register(
    "q319_temporal_split_audit",
    """
    WITH cut AS (
      SELECT MIN(epoch(ts)) + (MAX(epoch(ts)) - MIN(epoch(ts))) * 0.8
               AS t
      FROM events
    ),
    tagged AS (
      SELECT CASE WHEN epoch(ts) < (SELECT t FROM cut) THEN 'train'
                  ELSE 'test' END AS split,
             user_id, event_type, ts
      FROM events
    )
    SELECT split,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users,
           ROUND(AVG(CASE WHEN event_type = 'purchase'
                     THEN 1.0 ELSE 0.0 END), 6) AS purchase_rate,
           MIN(ts) AS t_min, MAX(ts) AS t_max
    FROM tagged GROUP BY split
    """,
)
def q319_temporal_split_audit(spark, sf_dir):
    """Temporal 80/20 split audit: the forecasting-correct alternative
    to hash splits (q80/q187) — train strictly precedes test in time.
    Reports sizes, user counts, label balance, and the time bounds per
    side; t_max(train) < t_min(test) holding BY CONSTRUCTION is the
    leakage guarantee the audit row makes visible.  The cut point is a
    broadcast scalar from the table's own bounds."""
    ev = _t(spark, sf_dir, "events")
    cut = ev.agg(
        (
            F.min(F.unix_micros("ts"))
            + (
                F.max(F.unix_micros("ts"))
                - F.min(F.unix_micros("ts"))
            )
            * 0.8
        ).alias("t")
    )
    tagged = ev.crossJoin(F.broadcast(cut)).select(
        F.when(F.unix_micros("ts") < F.col("t"), "train")
        .otherwise("test")
        .alias("split"),
        "user_id",
        "event_type",
        "ts",
    )
    return tagged.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count_distinct("user_id").alias("n_users"),
        F.round(
            F.avg(
                F.when(
                    F.col("event_type") == "purchase", 1.0
                ).otherwise(0.0)
            ),
            6,
        ).alias("purchase_rate"),
        F.min("ts").alias("t_min"),
        F.max("ts").alias("t_max"),
    )


@register(
    "q320_feature_label_corr",
    """
    WITH feat0 AS (
      SELECT user_id,
             COUNT(*)::DOUBLE AS frequency,
             COUNT(DISTINCT CAST(date_trunc('day', ts) AS DATE))::DOUBLE
               AS active_days,
             AVG(CASE WHEN event_type = 'error' THEN 1.0 ELSE 0.0
                 END) AS error_rate,
             SUM(CASE WHEN event_type = 'purchase' THEN value ELSE 0
                 END) AS spend
      FROM events GROUP BY user_id
    ),
    med AS (SELECT quantile_cont(spend, 0.5) AS m FROM feat0),
    feat AS (
      SELECT frequency, active_days, error_rate,
             CASE WHEN spend > (SELECT m FROM med) THEN 1.0 ELSE 0.0
               END AS y
      FROM feat0
    ),
    c AS (
      SELECT corr(frequency, y) AS c_freq,
             corr(active_days, y) AS c_days,
             corr(error_rate, y) AS c_err
      FROM feat
    )
    SELECT 'frequency' AS feature, ROUND(c_freq, 6) AS point_biserial
    FROM c
    UNION ALL SELECT 'active_days', ROUND(c_days, 6) FROM c
    UNION ALL SELECT 'error_rate', ROUND(c_err, 6) FROM c
    """,
)
def q320_feature_label_corr(spark, sf_dir):
    """Feature-label screening: point-biserial correlation (Pearson
    against a binary high-value label — spend above the median, which
    guarantees label variance) for each candidate feature of the q313
    table — the first filter any feature-selection pass runs.  One
    grouped pass builds all features, one aggregate computes every
    correlation, a 3-row stack melts them."""
    ev = _t(spark, sf_dir, "events")
    feat0 = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("double").alias("frequency"),
        F.count_distinct(F.to_date(F.date_trunc("DAY", "ts")))
        .cast("double")
        .alias("active_days"),
        F.avg(
            F.when(F.col("event_type") == "error", 1.0).otherwise(0.0)
        ).alias("error_rate"),
        F.sum(
            F.when(
                F.col("event_type") == "purchase", F.col("value")
            ).otherwise(0.0)
        ).alias("spend"),
    )
    feat0 = feat0.localCheckpoint(eager=False)
    med = feat0.agg(F.expr("percentile(spend, 0.5)").alias("m"))
    feat = feat0.crossJoin(F.broadcast(med)).select(
        "frequency",
        "active_days",
        "error_rate",
        F.when(F.col("spend") > F.col("m"), 1.0)
        .otherwise(0.0)
        .alias("y"),
    )
    c = feat.agg(
        F.round(F.corr("frequency", "y"), 6).alias("c_freq"),
        F.round(F.corr("active_days", "y"), 6).alias("c_days"),
        F.round(F.corr("error_rate", "y"), 6).alias("c_err"),
    )
    return c.select(
        F.expr(
            "stack(3, 'frequency', c_freq, 'active_days', c_days, "
            "'error_rate', c_err) AS (feature, point_biserial)"
        )
    )


@register(
    "q317_quantile_transform",
    """
    WITH ranked AS (
      SELECT o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (ORDER BY o_totalprice, o_orderkey)
               AS r,
             COUNT(*) OVER () AS n
      FROM orders
    )
    SELECT o_orderkey,
           ROUND((r - 0.5) / n, 6) AS price_quantile
    FROM ranked WHERE o_orderkey < 1000
    """,
)
def q317_quantile_transform(spark, sf_dir):
    """Quantile transformation (rank-to-uniform feature scaling):
    each order's price maps to (rank − 0.5)/n — the outlier-immune
    normalization ML pipelines use when min-max or z-scores break on
    heavy tails.  Ranks come from `global_rank`'s range-partitioned
    machinery (no single-partition window over the data — the output
    filter keeps the check small, the TRANSFORM ranks everything)."""
    from graphmapreduce_spark.operators.sort import global_rank

    od = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    ranked = global_rank(
        od, ["o_totalprice", "o_orderkey"], rank_col="r"
    )
    n = ranked.agg(F.count(F.lit(1)).alias("n"))
    return (
        ranked.crossJoin(F.broadcast(n))
        .filter(F.col("o_orderkey") < 1000)
        .select(
            "o_orderkey",
            F.round((F.col("r") - 0.5) / F.col("n"), 6).alias(
                "price_quantile"
            ),
        )
    )


@register(
    "q318_target_encoding",
    """
    WITH firsts AS (
      SELECT user_id, event_type AS channel
      FROM (
        SELECT user_id, event_type,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events) t
      WHERE rn = 1
    ),
    labeled AS (
      SELECT f.user_id, f.channel,
             MAX(CASE WHEN e.event_type = 'purchase' THEN 1 ELSE 0
                 END) AS y
      FROM firsts f JOIN events e ON f.user_id = e.user_id
      GROUP BY f.user_id, f.channel
    ),
    prior AS (SELECT AVG(y::DOUBLE) AS p FROM labeled)
    SELECT channel,
           COUNT(*) AS n,
           ROUND(AVG(y::DOUBLE), 6) AS raw_rate,
           ROUND((SUM(y) + 20.0 * (SELECT p FROM prior))
                 / (COUNT(*) + 20.0), 6) AS encoded
    FROM labeled GROUP BY channel
    """,
)
def q318_target_encoding(spark, sf_dir):
    """Smoothed target encoding (m-estimate, m=20): each entry channel
    encodes as (Σy + m·prior)/(n + m) — the categorical-feature
    transform that shrinks rare categories toward the global rate
    instead of memorizing them (the leakage-prone naive mean is shown
    alongside).  Two grouped passes; the prior folds in as a broadcast
    scalar."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    firsts = (
        ev.select(
            "user_id",
            F.col("event_type").alias("channel"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    labeled = (
        firsts.join(ev, "user_id")
        .groupBy("user_id", "channel")
        .agg(
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("y")
        )
    )
    labeled = labeled.localCheckpoint(eager=False)
    prior = labeled.agg(
        F.avg(F.col("y").cast("double")).alias("p")
    )
    return (
        labeled.crossJoin(F.broadcast(prior))
        .groupBy("channel")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg(F.col("y").cast("double")), 6).alias(
                "raw_rate"
            ),
            F.round(
                (F.sum("y") + 20.0 * F.max("p"))
                / (F.count(F.lit(1)) + 20.0),
                6,
            ).alias("encoded"),
        )
    )


@register(
    "q315_lognormal_fit",
    """
    WITH v AS (
      SELECT ln(value) AS lv FROM events
      WHERE event_type = 'purchase' AND value > 0
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(AVG(lv), 6) AS mu_log,
           ROUND(STDDEV_SAMP(lv), 6) AS sigma_log,
           ROUND(EXP(AVG(lv)), 4) AS implied_median,
           ROUND(EXP(AVG(lv) + VAR_SAMP(lv) / 2), 4) AS implied_mean
    FROM v
    """,
)
def q315_lognormal_fit(spark, sf_dir):
    """Lognormal fit of purchase values by log-moment MLE: μ and σ of
    ln(v), with the implied median e^μ and mean e^(μ+σ²/2) — the
    parametric summary behind basket-size simulation and revenue
    projections (heavy-tailed spend is lognormal-ish far more often
    than normal).  One scan, sufficient statistics only."""
    ev = _t(spark, sf_dir, "events")
    v = ev.filter(
        (F.col("event_type") == "purchase") & (F.col("value") > 0)
    ).select(F.log("value").alias("lv"))
    return v.agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("lv"), 6).alias("mu_log"),
        F.round(F.stddev_samp("lv"), 6).alias("sigma_log"),
        F.round(F.exp(F.avg("lv")), 4).alias("implied_median"),
        F.round(
            F.exp(F.avg("lv") + F.var_samp("lv") / 2), 4
        ).alias("implied_mean"),
    )


@register(
    "q316_ece",
    """
    WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
               FROM embeddings),
    pairs AS (
      SELECT a.label = b.label AS same,
             ROUND(list_sum(list_transform(range(1, len(a.v) + 1),
                              i -> a.v[i] * b.v[i]))
               / (sqrt(list_sum(list_transform(a.v, x -> x * x)))
                * sqrt(list_sum(list_transform(b.v, x -> x * x)))), 4)
               AS cosine
      FROM e a JOIN e b
        ON b.vec_id > a.vec_id AND b.vec_id <= a.vec_id + 50
    ),
    bins AS (
      SELECT CAST(LEAST(FLOOR((cosine + 1.0) / 0.2), 9) AS BIGINT)
               AS bin,
             COUNT(*)::DOUBLE AS n,
             AVG((cosine + 1.0) / 2.0) AS conf,
             AVG(CASE WHEN same THEN 1.0 ELSE 0.0 END) AS acc
      FROM pairs GROUP BY 1
    ),
    tot AS (SELECT SUM(n) AS t FROM bins)
    SELECT CAST((SELECT t FROM tot) AS BIGINT) AS n_pairs,
           ROUND(SUM(n * ABS(acc - conf)) / (SELECT t FROM tot), 6)
             AS ece,
           ROUND(MAX(ABS(acc - conf)), 6) AS max_bin_gap
    FROM bins
    """,
)
def q316_ece(spark, sf_dir):
    """Expected calibration error of embedding cosine as a same-label
    predictor: per-bin |accuracy − confidence| weighted by bin mass
    (confidence = cosine mapped to [0,1]) — the scalar that says
    whether q260's reliability curve is USABLE as a probability.  Same
    bucket-keyed banded pair join as q260; ECE folds the bin table to
    one row."""
    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id", "label", V.as_double("embedding").alias("v")
    )
    bk = F.floor(F.col("vec_id") / 50).cast("long")
    a = e.select(
        F.col("vec_id").alias("ida"),
        F.col("label").alias("la"),
        F.col("v").alias("va"),
        F.explode(F.array(bk, bk + 1)).alias("_bk"),
    )
    b = e.select(
        F.col("vec_id").alias("idb"),
        F.col("label").alias("lb"),
        F.col("v").alias("vb"),
        bk.alias("_bk"),
    )
    pairs = (
        a.join(b, "_bk")
        .filter(
            (F.col("idb") > F.col("ida"))
            & (F.col("idb") <= F.col("ida") + 50)
        )
        .select(
            (F.col("la") == F.col("lb")).alias("same"),
            F.round(V.cosine(F.col("va"), F.col("vb")), 4).alias(
                "cosine"
            ),
        )
    )
    bins = pairs.groupBy(
        F.least(F.floor((F.col("cosine") + 1.0) / 0.2), F.lit(9))
        .cast("bigint")
        .alias("bin")
    ).agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.avg((F.col("cosine") + 1.0) / 2.0).alias("conf"),
        F.avg(F.when(F.col("same"), 1.0).otherwise(0.0)).alias("acc"),
    )
    tot = bins.agg(F.sum("n").alias("t"))
    return (
        bins.crossJoin(F.broadcast(tot))
        .agg(
            F.max("t").cast("bigint").alias("n_pairs"),
            F.round(
                F.sum(
                    F.col("n") * F.abs(F.col("acc") - F.col("conf"))
                )
                / F.max("t"),
                6,
            ).alias("ece"),
            F.round(
                F.max(F.abs(F.col("acc") - F.col("conf"))), 6
            ).alias("max_bin_gap"),
        )
    )


@register(
    "q313_user_feature_table",
    """
    WITH bounds AS (
      SELECT MAX(epoch(ts)) AS t_end FROM events
    ),
    g AS (
      SELECT user_id,
             epoch(ts) - epoch(LAG(ts) OVER (PARTITION BY user_id
                                             ORDER BY ts, event_id))
               AS gap
      FROM events
    ),
    gaps AS (
      SELECT user_id, AVG(gap) AS avg_gap_s
      FROM g WHERE gap IS NOT NULL GROUP BY user_id
    ),
    base AS (
      SELECT user_id,
             COUNT(*) AS frequency,
             ROUND(SUM(CASE WHEN event_type = 'purchase'
                       THEN value ELSE 0 END), 2) AS monetary,
             COUNT(DISTINCT CAST(date_trunc('day', ts) AS DATE))
               AS active_days,
             ROUND(((SELECT t_end FROM bounds) - MAX(epoch(ts)))
                   / 86400.0, 4) AS recency_days,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS converted
      FROM events GROUP BY user_id
    )
    SELECT b.user_id, b.frequency, b.monetary, b.active_days,
           b.recency_days,
           ROUND(COALESCE(gaps.avg_gap_s, 0.0), 4) AS avg_gap_s,
           b.converted
    FROM base b LEFT JOIN gaps ON b.user_id = gaps.user_id
    """,
)
def q313_user_feature_table(spark, sf_dir):
    """ML feature materialization per user: recency (days before the
    table's own end), frequency, monetary, active days, mean
    inter-event gap, and the conversion label — the
    one-row-per-entity training table every churn/propensity model
    starts from.  One grouped pass plus one lag window, both on the
    user partitioning; the corpus end-time folds in as a broadcast
    scalar (no wall-clock dependence, so the feature set is
    reproducible)."""
    ev = _t(spark, sf_dir, "events")
    t_end = ev.agg(
        F.max(F.unix_micros("ts") / 1e6).alias("t_end")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    g = ev.select(
        "user_id",
        (
            F.unix_micros("ts") / 1e6
            - F.unix_micros(F.lag("ts").over(w)) / 1e6
        ).alias("gap"),
    ).filter(F.col("gap").isNotNull())
    gaps = g.groupBy("user_id").agg(F.avg("gap").alias("avg_gap_s"))
    base = (
        ev.crossJoin(F.broadcast(t_end))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("frequency"),
            F.round(
                F.sum(
                    F.when(
                        F.col("event_type") == "purchase", F.col("value")
                    ).otherwise(0.0)
                ),
                2,
            ).alias("monetary"),
            F.count_distinct(
                F.to_date(F.date_trunc("DAY", "ts"))
            ).alias("active_days"),
            F.round(
                (
                    F.max("t_end")
                    - F.max(F.unix_micros("ts") / 1e6)
                )
                / 86400.0,
                4,
            ).alias("recency_days"),
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("converted"),
        )
    )
    return base.join(gaps, "user_id", "left").select(
        "user_id",
        "frequency",
        "monetary",
        "active_days",
        "recency_days",
        F.round(F.coalesce("avg_gap_s", F.lit(0.0)), 4).alias(
            "avg_gap_s"
        ),
        "converted",
    )


@register(
    "q314_dup_degree_profile",
    """
    WITH sh AS (
      SELECT doc_id, list_distinct(list_transform(
               range(1, GREATEST(length(text) - 2, 0) + 1),
               i -> substr(text, i, 3))) AS grams
      FROM documents WHERE doc_id < 100
    ),
    inv AS (SELECT doc_id, UNNEST(grams) AS g FROM sh),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
      FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT id_a, id_b
      FROM inter
      JOIN sh sa ON sa.doc_id = id_a
      JOIN sh sb ON sb.doc_id = id_b
      WHERE CAST(i AS DOUBLE) / (len(sa.grams) + len(sb.grams) - i)
            >= 0.3
    ),
    deg AS (
      SELECT doc_id, COUNT(*) AS d FROM (
        SELECT id_a AS doc_id FROM pairs
        UNION ALL SELECT id_b FROM pairs) t
      GROUP BY doc_id
    )
    SELECT d AS dup_degree, COUNT(*) AS n_docs
    FROM deg GROUP BY d
    """,
)
def q314_dup_degree_profile(spark, sf_dir):
    """Near-duplicate degree profile: for each document, how many
    ≥0.3-Jaccard partners it has, histogrammed — distinguishes
    'one template with 50 clones' (a few huge degrees) from 'many
    independent pairs' (degree 1s), which picks the dedup strategy
    (canonical-per-cluster vs pairwise drop).  Reuses the q45
    inverted-index pair join; the degree agg is one union + groupBy
    over the pair list."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    pairs = D.ngram_jaccard_pairs(
        d, "doc_id", "text", n=3, threshold=0.3, max_df=1000
    ).select("id_a", "id_b")
    deg = (
        pairs.select(F.col("id_a").alias("doc_id"))
        .unionByName(pairs.select(F.col("id_b").alias("doc_id")))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    return deg.groupBy(F.col("d").alias("dup_degree")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )


@register(
    "q311_retention_decay_fit",
    """
    WITH firsts AS (
      SELECT user_id, CAST(MIN(date_trunc('day', ts)) AS DATE) AS d0
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT e.user_id,
             date_diff('day', f.d0,
                       CAST(date_trunc('day', e.ts) AS DATE)) AS age
      FROM events e JOIN firsts f ON e.user_id = f.user_id
    ),
    cohort_n AS (SELECT COUNT(*)::DOUBLE AS n FROM firsts),
    ret AS (
      SELECT age, COUNT(*)::DOUBLE / (SELECT n FROM cohort_n) AS r
      FROM activity WHERE age BETWEEN 1 AND 14
      GROUP BY age
    ),
    fit AS (
      SELECT COUNT(*)::DOUBLE AS k,
             AVG(age) AS mx, AVG(ln(r)) AS my,
             SUM((age - (SELECT AVG(age) FROM ret))
                 * (ln(r) - (SELECT AVG(ln(r)) FROM ret))) AS sxy,
             SUM(POWER(age - (SELECT AVG(age) FROM ret), 2)) AS sxx
      FROM ret
    )
    SELECT CAST(k AS BIGINT) AS n_points,
           ROUND(-sxy / sxx, 6) AS decay_lambda,
           ROUND(EXP(my - (sxy / sxx) * mx), 6) AS r0,
           ROUND(LN(2) / (-sxy / sxx), 4) AS half_life_days
    FROM fit
    """,
)
def q311_retention_decay_fit(spark, sf_dir):
    """Exponential retention-decay fit: day-age retention r(t) for
    t = 1..14, log-linear OLS ln r = ln r₀ − λt, reporting λ, r₀, and
    the half-life in days — the parametric summary on top of q140's
    raw cohort triangle.  The fit runs on 14 rows of sufficient
    statistics; raw events are touched once for the distinct
    (user, age) activity set."""
    ev = _t(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.to_date(F.min(F.date_trunc("DAY", "ts"))).alias("d0")
    )
    activity = (
        ev.join(firsts, "user_id")
        .select(
            "user_id",
            F.datediff(
                F.to_date(F.date_trunc("DAY", "ts")), F.col("d0")
            ).alias("age"),
        )
        .distinct()
    )
    n = firsts.agg(F.count(F.lit(1)).cast("double").alias("n"))
    ret = (
        activity.filter(F.col("age").between(1, 14))
        .groupBy("age")
        .agg(F.count(F.lit(1)).cast("double").alias("cnt"))
        .crossJoin(F.broadcast(n))
        .select("age", (F.col("cnt") / F.col("n")).alias("r"))
    )
    ret = ret.localCheckpoint(eager=False)
    means = ret.agg(
        F.avg("age").alias("mx"), F.avg(F.log("r")).alias("my")
    )
    fit = (
        ret.crossJoin(F.broadcast(means))
        .agg(
            F.count(F.lit(1)).cast("double").alias("k"),
            F.max("mx").alias("mx"),
            F.max("my").alias("my"),
            F.sum(
                (F.col("age") - F.col("mx"))
                * (F.log("r") - F.col("my"))
            ).alias("sxy"),
            F.sum(F.pow(F.col("age") - F.col("mx"), 2)).alias("sxx"),
        )
    )
    lam = F.col("sxy") / F.col("sxx")
    return fit.select(
        F.col("k").cast("bigint").alias("n_points"),
        F.round(-lam, 6).alias("decay_lambda"),
        F.round(
            F.exp(F.col("my") - lam * F.col("mx")), 6
        ).alias("r0"),
        F.round(F.log(F.lit(2.0)) / (-lam), 4).alias("half_life_days"),
    )


@register(
    "q312_lorenz_points",
    """
    WITH spend AS (
      SELECT o_custkey, SUM(o_totalprice) AS s
      FROM orders GROUP BY o_custkey
    ),
    tiled AS (
      SELECT s, NTILE(10) OVER (ORDER BY s, o_custkey) AS decile
      FROM spend
    ),
    per AS (
      SELECT decile, SUM(s) AS ds, COUNT(*) AS n
      FROM tiled GROUP BY decile
    ),
    tot AS (SELECT SUM(ds) AS t FROM per)
    SELECT decile,
           n AS n_customers,
           ROUND(SUM(ds) OVER (ORDER BY decile
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW)
                 / (SELECT t FROM tot), 6) AS cum_revenue_share
    FROM per
    """,
)
def q312_lorenz_points(spark, sf_dir):
    """Lorenz curve points: cumulative revenue share of customer
    spend deciles (poorest first) — the curve whose area deficit IS
    q230's Gini, reported as the 10 plottable points BI needs.  NTILE
    with an id tiebreak over the customers-sized table; the cumsum
    runs over 10 rows."""
    od = _t(spark, sf_dir, "orders")
    spend = od.groupBy("o_custkey").agg(
        F.sum("o_totalprice").alias("s")
    )
    w = Window.orderBy("s", "o_custkey")
    tiled = spend.withColumn("decile", F.ntile(10).over(w))
    per = tiled.groupBy("decile").agg(
        F.sum("s").alias("ds"), F.count(F.lit(1)).alias("n")
    )
    tot = per.agg(F.sum("ds").alias("t"))
    wc = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "decile",
            F.col("n").alias("n_customers"),
            F.round(F.sum("ds").over(wc) / F.col("t"), 6).alias(
                "cum_revenue_share"
            ),
        )
    )


@register(
    "q309_heaps_curve",
    r"""
    WITH toks AS (
      SELECT doc_id, UNNEST(list_filter(
        string_split_regex(trim(text), '\s+'), x -> x <> '')) AS term
      FROM documents
    ),
    firsts AS (
      SELECT term, MIN(doc_id) AS first_doc FROM toks GROUP BY term
    ),
    n AS (SELECT MAX(doc_id) + 1 AS n_docs FROM toks),
    grid AS (SELECT UNNEST([10, 25, 50, 75, 100]) AS pct)
    SELECT grid.pct,
           SUM(CASE WHEN firsts.first_doc
                    < (SELECT n_docs FROM n) * grid.pct / 100.0
                    THEN 1 ELSE 0 END) AS vocab_size
    FROM grid CROSS JOIN firsts
    GROUP BY grid.pct
    """,
)
def q309_heaps_curve(spark, sf_dir):
    """Heaps'-law vocabulary growth curve: distinct vocabulary after
    processing the first 10/25/50/75/100% of documents (ingest order =
    doc_id) — sublinear growth says dedup/vocab budgets amortize;
    linear growth says the corpus keeps bringing new language.  One
    first-occurrence MIN per term (the q257 inverted-index shape),
    then conditional sums against the cutoff grid — never a per-prefix
    distinct-count pass."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(T.words("text")).alias("term")
    )
    firsts = toks.groupBy("term").agg(
        F.min("doc_id").alias("first_doc")
    )
    n = toks.agg((F.max("doc_id") + 1).alias("n_docs"))
    grid = spark.range(1).select(
        F.explode(
            F.array(*[F.lit(x) for x in (10, 25, 50, 75, 100)])
        ).alias("pct")
    )
    return (
        grid.crossJoin(F.broadcast(n))
        .crossJoin(firsts)
        .groupBy("pct")
        .agg(
            F.sum(
                F.when(
                    F.col("first_doc")
                    < F.col("n_docs") * F.col("pct") / 100.0,
                    1,
                ).otherwise(0)
            ).alias("vocab_size")
        )
    )


@register(
    "q310_power_analysis",
    """
    WITH base AS (SELECT UNNEST([0.02, 0.05, 0.10, 0.20]::DOUBLE[]) AS p),
    lift AS (SELECT UNNEST([0.10, 0.20, 0.50]::DOUBLE[]) AS rel)
    SELECT p AS baseline_rate, rel AS relative_lift,
           ROUND(p * (1 + rel), 6) AS treated_rate,
           CAST(CEIL(
             POWER(1.959964 * sqrt(2 * p * (1 - p))
                   + 0.841621 * sqrt(p * (1 - p)
                       + p * (1 + rel) * (1 - p * (1 + rel))), 2)
             / POWER(p * rel, 2)) AS BIGINT) AS n_per_arm
    FROM base CROSS JOIN lift
    """,
)
def q310_power_analysis(spark, sf_dir):
    """A/B sample-size planner: users per arm to detect a relative
    conversion lift at α=0.05 (two-sided, z=1.959964) with 80% power
    (z=0.841621), the standard two-proportion formula over a
    baseline×lift grid — the q269-planner pattern applied to
    experimentation instead of LSH.  Pure expression math; reads no
    data by design."""
    base = spark.range(1).select(
        F.explode(
            F.array(*[F.lit(x) for x in (0.02, 0.05, 0.10, 0.20)])
        ).alias("p")
    )
    lift = F.array(*[F.lit(x) for x in (0.10, 0.20, 0.50)])
    g = base.select("p", F.explode(lift).alias("rel"))
    p, rel = F.col("p"), F.col("rel")
    p2 = p * (1 + rel)
    n = F.ceil(
        F.pow(
            1.959964 * F.sqrt(2 * p * (1 - p))
            + 0.841621 * F.sqrt(p * (1 - p) + p2 * (1 - p2)),
            2,
        )
        / F.pow(p * rel, 2)
    )
    return g.select(
        p.alias("baseline_rate"),
        rel.alias("relative_lift"),
        F.round(p2, 6).alias("treated_rate"),
        n.cast("bigint").alias("n_per_arm"),
    )


@register(
    "q307_segment_migration",
    """
    WITH mid AS (
      SELECT CAST(MIN(date_trunc('day', ts)) AS DATE)
             + CAST((date_diff('day',
                 CAST(MIN(date_trunc('day', ts)) AS DATE),
                 CAST(MAX(date_trunc('day', ts)) AS DATE)) // 2)
               AS INT) AS cut
      FROM events
    ),
    halves AS (
      SELECT user_id,
             CASE WHEN CAST(date_trunc('day', ts) AS DATE)
                       < (SELECT cut FROM mid)
                  THEN 'h1' ELSE 'h2' END AS half,
             value
      FROM events WHERE event_type = 'purchase'
    ),
    spend AS (
      SELECT user_id, half, SUM(value) AS s
      FROM halves GROUP BY user_id, half
    ),
    med AS (
      SELECT half, quantile_cont(s, 0.5) AS m FROM spend GROUP BY half
    ),
    seg AS (
      SELECT spend.user_id, spend.half,
             CASE WHEN spend.s >= med.m THEN 'high' ELSE 'low' END
               AS segment
      FROM spend JOIN med USING (half)
    ),
    j AS (
      SELECT COALESCE(a.user_id, b.user_id) AS user_id,
             COALESCE(a.segment, 'none') AS seg_h1,
             COALESCE(b.segment, 'none') AS seg_h2
      FROM (SELECT * FROM seg WHERE half = 'h1') a
      FULL OUTER JOIN (SELECT * FROM seg WHERE half = 'h2') b
        ON a.user_id = b.user_id
    )
    SELECT seg_h1, seg_h2, COUNT(*) AS n_users
    FROM j GROUP BY seg_h1, seg_h2
    """,
)
def q307_segment_migration(spark, sf_dir):
    """Spend-segment migration matrix: split the observation window at
    its midpoint, classify each purchaser high/low against that half's
    median spend, and cross-tabulate movements (including churn-in/out
    as 'none') — the cohort-migration table behind retention
    marketing.  Two grouped sums, per-half medians folded back as
    broadcast joins, one full-outer self-alignment on user."""
    ev = _t(spark, sf_dir, "events")
    b = ev.agg(
        F.to_date(F.min(F.date_trunc("DAY", "ts"))).alias("lo"),
        F.to_date(F.max(F.date_trunc("DAY", "ts"))).alias("hi"),
    ).select(
        F.date_add(
            F.col("lo"),
            F.floor(F.datediff(F.col("hi"), F.col("lo")) / 2).cast(
                "int"
            ),
        ).alias("cut")
    )
    spend = (
        ev.filter(F.col("event_type") == "purchase")
        .crossJoin(F.broadcast(b))
        .select(
            "user_id",
            F.when(
                F.to_date(F.date_trunc("DAY", "ts")) < F.col("cut"),
                "h1",
            )
            .otherwise("h2")
            .alias("half"),
            "value",
        )
        .groupBy("user_id", "half")
        .agg(F.sum("value").alias("s"))
    )
    spend = spend.localCheckpoint(eager=False)
    med = spend.groupBy("half").agg(
        F.expr("percentile(s, 0.5)").alias("m")
    )
    seg = spend.join(F.broadcast(med), "half").select(
        "user_id",
        "half",
        F.when(F.col("s") >= F.col("m"), "high")
        .otherwise("low")
        .alias("segment"),
    )
    h1 = seg.filter(F.col("half") == "h1").select(
        "user_id", F.col("segment").alias("seg_h1")
    )
    h2 = seg.filter(F.col("half") == "h2").select(
        "user_id", F.col("segment").alias("seg_h2")
    )
    return (
        h1.join(h2, "user_id", "full_outer")
        .select(
            F.coalesce("seg_h1", F.lit("none")).alias("seg_h1"),
            F.coalesce("seg_h2", F.lit("none")).alias("seg_h2"),
        )
        .groupBy("seg_h1", "seg_h2")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


@register(
    "q308_depth_vs_conversion",
    """
    WITH per_user AS (
      SELECT user_id, COUNT(*) AS n_events,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS converted
      FROM events GROUP BY user_id
    ),
    tiled AS (
      SELECT user_id, n_events, converted,
             NTILE(4) OVER (ORDER BY n_events, user_id) AS quartile
      FROM per_user
    )
    SELECT quartile,
           COUNT(*) AS n_users,
           MIN(n_events) AS min_events,
           MAX(n_events) AS max_events,
           ROUND(AVG(converted::DOUBLE), 6) AS conversion_rate
    FROM tiled GROUP BY quartile
    """,
)
def q308_depth_vs_conversion(spark, sf_dir):
    """Engagement-depth vs conversion: users quartiled by total event
    count (NTILE with a user_id tiebreak so bucket edges are
    engine-identical), conversion rate per quartile — the
    'does usage depth predict buying' curve.  The NTILE runs over the
    users-sized table; at cluster scale the same statistic computes on
    `global_rank` range partitioning (q171's equi-depth machinery)."""
    ev = _t(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("converted"),
    )
    w = Window.orderBy("n_events", "user_id")
    tiled = per_user.withColumn("quartile", F.ntile(4).over(w))
    return tiled.groupBy("quartile").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.min("n_events").alias("min_events"),
        F.max("n_events").alias("max_events"),
        F.round(F.avg(F.col("converted").cast("double")), 6).alias(
            "conversion_rate"
        ),
    )


@register(
    "q305_entry_channel_conversion",
    """
    WITH firsts AS (
      SELECT user_id, event_type AS entry_channel, ts AS t0
      FROM (
        SELECT user_id, event_type, ts,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events) t
      WHERE rn = 1
    ),
    conv AS (
      SELECT f.user_id
      FROM firsts f
      WHERE f.entry_channel <> 'purchase'
        AND EXISTS (SELECT 1 FROM events p
                    WHERE p.user_id = f.user_id
                      AND p.event_type = 'purchase'
                      AND p.ts > f.t0
                      AND p.ts <= f.t0 + INTERVAL 7 DAY)
      GROUP BY f.user_id
    )
    SELECT f.entry_channel,
           COUNT(*) AS n_users,
           SUM(CASE WHEN c.user_id IS NULL THEN 0 ELSE 1 END)
             AS n_converted,
           ROUND(SUM(CASE WHEN c.user_id IS NULL THEN 0.0 ELSE 1.0
                     END) / COUNT(*), 6) AS conversion_rate
    FROM firsts f LEFT JOIN conv c ON f.user_id = c.user_id
    WHERE f.entry_channel <> 'purchase'
    GROUP BY f.entry_channel
    """,
)
def q305_entry_channel_conversion(spark, sf_dir):
    """Conversion by ENTRY channel: cohort users by their very first
    event's type, then measure who purchased within 7 days of that
    first touch — the acquisition-quality table (which door people
    come in through vs whether they buy).  One first-event pick per
    user (single sort), one per-user semi join for the conversion
    flag."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    firsts = (
        ev.select(
            "user_id",
            F.col("event_type").alias("entry_channel"),
            F.col("ts").alias("t0"),
            F.row_number().over(w).alias("rn"),
        )
        .filter((F.col("rn") == 1) & (F.col("entry_channel") != "purchase"))
        .drop("rn")
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("pts")
    )
    conv = (
        firsts.join(p, "user_id")
        .filter(
            (F.col("pts") > F.col("t0"))
            & (F.col("pts") <= F.col("t0") + F.expr("INTERVAL 7 DAYS"))
        )
        .select("user_id")
        .distinct()
        .withColumn("_c", F.lit(1))
    )
    return (
        firsts.join(conv, "user_id", "left")
        .groupBy("entry_channel")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum(
                F.when(F.col("_c").isNull(), 0).otherwise(1)
            ).alias("n_converted"),
            F.round(
                F.sum(
                    F.when(F.col("_c").isNull(), 0.0).otherwise(1.0)
                )
                / F.count(F.lit(1)),
                6,
            ).alias("conversion_rate"),
        )
    )


@register(
    "q306_burstiness_param",
    """
    WITH gaps AS (
      SELECT user_id, event_type,
             epoch(ts) - epoch(LAG(ts) OVER (
               PARTITION BY user_id, event_type
               ORDER BY ts, event_id)) AS gap
      FROM events
    ),
    per_user AS (
      SELECT user_id, event_type,
             COUNT(gap) AS n_gaps,
             AVG(gap) AS mu,
             STDDEV_SAMP(gap) AS sigma
      FROM gaps WHERE gap IS NOT NULL
      GROUP BY user_id, event_type
      HAVING COUNT(gap) >= 4
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           ROUND(AVG((sigma - mu) / (sigma + mu)), 6) AS burstiness_b
    FROM per_user GROUP BY event_type
    """,
)
def q306_burstiness_param(spark, sf_dir):
    """Goh-Barabási burstiness B = (σ−μ)/(σ+μ) of inter-event gaps,
    averaged over users with ≥5 events of a type: B→−1 periodic,
    B≈0 Poisson, B→1 bursty — the inter-event-TIMING complement of
    q234's count-based Fano factor.  One lag per (user, type)
    partitioning, then two stacked aggs; raw events are touched
    once."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        "ts", "event_id"
    )
    gaps = ev.select(
        "user_id",
        "event_type",
        (
            F.unix_micros("ts") / 1e6
            - F.unix_micros(F.lag("ts").over(w)) / 1e6
        ).alias("gap"),
    ).filter(F.col("gap").isNotNull())
    per_user = (
        gaps.groupBy("user_id", "event_type")
        .agg(
            F.count("gap").alias("n_gaps"),
            F.avg("gap").alias("mu"),
            F.stddev_samp("gap").alias("sigma"),
        )
        .filter(F.col("n_gaps") >= 4)
    )
    return per_user.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.round(
            F.avg(
                (F.col("sigma") - F.col("mu"))
                / (F.col("sigma") + F.col("mu"))
            ),
            6,
        ).alias("burstiness_b"),
    )


@register(
    "q303_two_hop_reach",
    """
    WITH und AS (
      SELECT DISTINCT LEAST(l_orderkey % 2000, l_partkey % 2000) AS a,
                      GREATEST(l_orderkey % 2000, l_partkey % 2000) AS b
      FROM lineitem
      WHERE l_orderkey % 2000 <> l_partkey % 2000 AND l_quantity <= 5
    ),
    sym AS (SELECT a AS id, b AS nbr FROM und
            UNION ALL SELECT b, a FROM und),
    two_hop AS (
      SELECT DISTINCT l.id, r.nbr AS hop2
      FROM sym l JOIN sym r ON l.nbr = r.id
      WHERE r.nbr <> l.id
    ),
    pure AS (
      SELECT t.id, t.hop2 FROM two_hop t
      WHERE NOT EXISTS (SELECT 1 FROM sym
                        WHERE sym.id = t.id AND sym.nbr = t.hop2)
    ),
    deg AS (SELECT id, COUNT(*) AS deg FROM sym GROUP BY id)
    SELECT p.id, deg.deg AS direct,
           COUNT(*) AS two_hop_only,
           ROUND(COUNT(*)::DOUBLE / deg.deg, 6) AS expansion
    FROM pure p JOIN deg ON p.id = deg.id
    GROUP BY p.id, deg.deg
    """,
)
def q303_two_hop_reach(spark, sf_dir):
    """Two-hop reach per vertex: distinct friends-of-friends that are
    NOT direct neighbors (and not self), with the expansion ratio
    2-hop/direct — the audience-growth / graph-expander statistic.
    The hop-2 set builds through the shared-neighbor wedge join with
    an early DISTINCT (each (id, hop2) pair once, however many wedges
    connect them); directs are removed by one anti-join."""
    li = _t(spark, sf_dir, "lineitem")
    und = (
        li.filter(F.col("l_quantity") <= 5)
        .select(
            F.least(
                F.col("l_orderkey") % 2000, F.col("l_partkey") % 2000
            ).alias("a"),
            F.greatest(
                F.col("l_orderkey") % 2000, F.col("l_partkey") % 2000
            ).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    sym = und.select(
        F.col("a").alias("id"), F.col("b").alias("nbr")
    ).unionByName(
        und.select(F.col("b").alias("id"), F.col("a").alias("nbr"))
    )
    sym = sym.localCheckpoint(eager=False)
    l, r = sym.alias("l"), sym.alias("r")
    two_hop = (
        l.join(r, F.col("l.nbr") == F.col("r.id"))
        .filter(F.col("r.nbr") != F.col("l.id"))
        .select(F.col("l.id").alias("id"), F.col("r.nbr").alias("hop2"))
        .distinct()
    )
    pure = two_hop.join(
        sym.select(F.col("id"), F.col("nbr").alias("hop2")),
        ["id", "hop2"],
        "left_anti",
    )
    deg = sym.groupBy("id").agg(F.count(F.lit(1)).alias("deg"))
    return (
        pure.groupBy("id")
        .agg(F.count(F.lit(1)).alias("two_hop_only"))
        .join(deg, "id")
        .select(
            "id",
            F.col("deg").alias("direct"),
            "two_hop_only",
            F.round(
                F.col("two_hop_only").cast("double") / F.col("deg"), 6
            ).alias("expansion"),
        )
    )


@register(
    "q304_value_at_risk",
    """
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             SUM(value) AS v
      FROM events GROUP BY 1, 2
    ),
    var AS (
      SELECT event_type, quantile_cont(v, 0.05) AS var5
      FROM daily GROUP BY event_type
    )
    SELECT d.event_type,
           ROUND(var.var5, 4) AS var_5pct,
           ROUND(AVG(CASE WHEN d.v <= var.var5 THEN d.v END), 4)
             AS cvar_5pct,
           ROUND(AVG(d.v), 4) AS mean_daily
    FROM daily d JOIN var ON d.event_type = var.event_type
    GROUP BY d.event_type, var.var5
    """,
)
def q304_value_at_risk(spark, sf_dir):
    """Value-at-risk of daily value per event type: the 5th-percentile
    daily total (VaR) and the conditional mean of days at or below it
    (CVaR / expected shortfall) — 'how bad is a bad day'.  Percentile
    per group over the 30-row daily table, then one conditional
    average with the VaR folded back as a per-group join."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date(F.date_trunc("DAY", "ts")).alias("day")
    ).agg(F.sum("value").alias("v"))
    daily = daily.localCheckpoint(eager=False)
    var = daily.groupBy("event_type").agg(
        F.expr("percentile(v, 0.05)").alias("var5")
    )
    return (
        daily.join(F.broadcast(var), "event_type")
        .groupBy("event_type", "var5")
        .agg(
            F.round(
                F.avg(
                    F.when(F.col("v") <= F.col("var5"), F.col("v"))
                ),
                4,
            ).alias("cvar_5pct"),
            F.round(F.avg("v"), 4).alias("mean_daily"),
        )
        .select(
            "event_type",
            F.round("var5", 4).alias("var_5pct"),
            "cvar_5pct",
            "mean_daily",
        )
    )


def _markov_stationary_oracle_sql(steps: int = 12) -> str:
    """Unrolled power iteration π_{t+1} = π_t · P over the event-type
    transition matrix (same unrolled-CTE technique as the q32 pagerank
    oracle)."""
    ctes = [
        """
    seq AS (
      SELECT event_type,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_event
      FROM events
    ),
    c AS MATERIALIZED (
      SELECT prev_event, event_type AS event, COUNT(*)::DOUBLE AS n
      FROM seq WHERE prev_event IS NOT NULL GROUP BY 1, 2
    ),
    p AS MATERIALIZED (
      SELECT c.prev_event, c.event, c.n / t.tot AS p
      FROM c JOIN (SELECT prev_event, SUM(n) AS tot FROM c
                   GROUP BY prev_event) t USING (prev_event)
    ),
    states AS MATERIALIZED (SELECT DISTINCT prev_event AS s FROM c),
    pi0 AS (SELECT s, 1.0 / (SELECT COUNT(*) FROM states) AS v
            FROM states)
        """
    ]
    prev = "pi0"
    for i in range(1, steps + 1):
        ctes.append(
            f"""
    pi{i} AS (
      SELECT p.event AS s, SUM({prev}.v * p.p) AS v
      FROM {prev} JOIN p ON p.prev_event = {prev}.s
      GROUP BY p.event
    )
            """
        )
        prev = f"pi{i}"
    return (
        "WITH "
        + ",".join(ctes)
        + f"""
    SELECT s AS event_type, ROUND(v, 6) AS stationary_p
    FROM {prev}
    """
    )


@register("q301_markov_stationary", _markov_stationary_oracle_sql())
def q301_markov_stationary(spark, sf_dir):
    """Stationary distribution of the event-type Markov chain: 12
    power-iteration steps π·P on the |types|²-row transition matrix —
    the long-run 'where does user attention settle' vector.  After the
    one raw-event lag pass, every iteration is a join-agg over ≤25
    rows (broadcast both sides); the oracle unrolls the same 12 steps
    as CTEs, the q32 pagerank technique."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.withColumn("prev_event", F.lag("event_type").over(w))
    c = (
        seq.filter(F.col("prev_event").isNotNull())
        .groupBy("prev_event", F.col("event_type").alias("event"))
        .agg(F.count(F.lit(1)).cast("double").alias("n"))
    )
    tot = c.groupBy("prev_event").agg(F.sum("n").alias("tot"))
    p = (
        c.join(tot, "prev_event")
        .select(
            "prev_event", "event", (F.col("n") / F.col("tot")).alias("p")
        )
        .localCheckpoint(eager=True)
    )
    states = p.select(F.col("prev_event").alias("s")).distinct()
    n_states = states.count()
    pi = states.withColumn("v", F.lit(1.0 / n_states))
    for _ in range(12):
        pi = (
            pi.join(F.broadcast(p), pi.s == p.prev_event)
            .groupBy(F.col("event").alias("s"))
            .agg(F.sum(F.col("v") * F.col("p")).alias("v"))
        )
    return pi.select(
        F.col("s").alias("event_type"),
        F.round("v", 6).alias("stationary_p"),
    )


@register(
    "q302_seasonal_naive_mape",
    """
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             COUNT(*)::DOUBLE AS x
      FROM events GROUP BY 1, 2
    ),
    j AS (
      SELECT a.event_type, a.day, a.x AS actual, b.x AS forecast
      FROM daily a JOIN daily b
        ON a.event_type = b.event_type AND b.day = a.day - 7
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           ROUND(AVG(ABS(actual - forecast) / actual), 6) AS mape,
           ROUND(AVG(actual - forecast), 6) AS mean_bias
    FROM j GROUP BY event_type
    """,
)
def q302_seasonal_naive_mape(spark, sf_dir):
    """Seasonal-naive forecast backtest: predict each day's volume
    with the value 7 days earlier, report MAPE and bias per event
    type — the baseline any real forecaster must beat, and the
    cheapest continuous sanity check on volume stability.  One
    self-join of the 30-row daily series on date arithmetic."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date(F.date_trunc("DAY", "ts")).alias("day")
    ).agg(F.count(F.lit(1)).cast("double").alias("x"))
    a = daily.select(
        "event_type", F.col("day").alias("aday"), F.col("x").alias("actual")
    )
    b = daily.select(
        "event_type",
        F.col("day").alias("bday"),
        F.col("x").alias("forecast"),
    )
    j = a.join(
        b,
        (a.event_type == b.event_type)
        & (F.col("bday") == F.date_sub(F.col("aday"), 7)),
    ).select(a.event_type, "actual", "forecast")
    return j.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.round(
            F.avg(F.abs(F.col("actual") - F.col("forecast"))
                  / F.col("actual")),
            6,
        ).alias("mape"),
        F.round(F.avg(F.col("actual") - F.col("forecast")), 6).alias(
            "mean_bias"
        ),
    )


_W1_PCTS = ", ".join(str(i / 100.0) for i in range(1, 100))


@register(
    "q296_wasserstein_drift",
    f"""
    WITH qa0 AS (
      SELECT quantile_cont(n_chars, [{_W1_PCTS}]) AS qs
      FROM documents WHERE source = 'src0'
    ),
    qb0 AS (
      SELECT quantile_cont(n_chars, [{_W1_PCTS}]) AS qs
      FROM documents WHERE source = 'src1'
    ),
    qa AS (SELECT UNNEST(qs) AS q, generate_subscripts(qs, 1) AS i
           FROM qa0),
    qb AS (SELECT UNNEST(qs) AS q, generate_subscripts(qs, 1) AS i
           FROM qb0)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_quantiles,
           ROUND(AVG(ABS(qa.q - qb.q)), 6) AS wasserstein_1,
           ROUND(MAX(ABS(qa.q - qb.q)), 6) AS max_quantile_gap
    FROM qa JOIN qb USING (i)
    """,
)
def q296_wasserstein_drift(spark, sf_dir):
    """Wasserstein-1 (earth-mover) drift between two sources' document
    length distributions via the quantile-function identity
    W₁ = ∫|Qₐ(u) − Q_b(u)|du, discretized on a 99-point percentile
    grid — the metric-space upgrade over PSI/KS (q197/q242): it reports
    HOW FAR mass moved, not just that it moved.  One percentile-array
    aggregate per source, then a 99-row zip."""
    d = _t(spark, sf_dir, "documents")
    qa = (
        d.filter(F.col("source") == "src0")
        .agg(
            F.expr(
                "percentile(n_chars, array("
                + ",".join(str(i / 100.0) for i in range(1, 100))
                + "))"
            ).alias("qs")
        )
        .select(F.posexplode("qs").alias("i", "qa"))
    )
    qb = (
        d.filter(F.col("source") == "src1")
        .agg(
            F.expr(
                "percentile(n_chars, array("
                + ",".join(str(i / 100.0) for i in range(1, 100))
                + "))"
            ).alias("qs")
        )
        .select(F.posexplode("qs").alias("i", "qb"))
    )
    gap = F.abs(F.col("qa") - F.col("qb"))
    return qa.join(qb, "i").agg(
        F.count(F.lit(1)).alias("n_quantiles"),
        F.round(F.avg(gap), 6).alias("wasserstein_1"),
        F.round(F.max(gap), 6).alias("max_quantile_gap"),
    )


@register(
    "q415_kendall_tau",
    """
    WITH b AS (
      SELECT p.p_brand AS brand,
             AVG(l.l_extendedprice / l.l_quantity) AS x,
             SUM(l.l_quantity) AS y
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY p.p_brand
    ),
    pairs AS (
      SELECT a.x AS xa, a.y AS ya, c.x AS xb, c.y AS yb
      FROM b a JOIN b c ON a.brand < c.brand
    )
    SELECT CAST(SUM(CASE WHEN (xa-xb)*(ya-yb) > 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS concordant,
           CAST(SUM(CASE WHEN (xa-xb)*(ya-yb) < 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS discordant,
           CAST(SUM(CASE WHEN xa = xb THEN 1 ELSE 0 END) AS BIGINT)
             AS ties_price,
           CAST(SUM(CASE WHEN ya = yb THEN 1 ELSE 0 END) AS BIGINT)
             AS ties_qty,
           ROUND(CAST(SUM(CASE WHEN (xa-xb)*(ya-yb) > 0 THEN 1 ELSE 0 END)
                    - SUM(CASE WHEN (xa-xb)*(ya-yb) < 0 THEN 1 ELSE 0 END)
                      AS DOUBLE)
                 / SQRT((COUNT(*) - SUM(CASE WHEN xa = xb THEN 1 ELSE 0 END))
                      * (COUNT(*) - SUM(CASE WHEN ya = yb THEN 1 ELSE 0 END))),
                 6) AS tau_b
    FROM pairs
    """,
)
def q415_kendall_tau(spark, sf_dir):
    """Kendall tau-b rank concordance between a brand's average unit
    price and its total sold quantity — the nonparametric 'does
    premium pricing depress volume' test that q293's Spearman answers
    with ranks; tau answers it with pairwise orderings and has a
    direct interpretation (P(concordant) − P(discordant)).  The
    pairwise self-join runs over the 25-row brand AGGREGATE (300
    pairs), never over lineitem — the standard trick that keeps the
    O(k²) concordance count off the fact table."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    b = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.avg(F.col("l_extendedprice") / F.col("l_quantity")).alias("x"),
            F.sum("l_quantity").alias("y"),
        )
    )
    a, c = b.alias("a"), b.alias("c")
    pairs = a.join(c, F.col("a.brand") < F.col("c.brand")).select(
        F.col("a.x").alias("xa"),
        F.col("a.y").alias("ya"),
        F.col("c.x").alias("xb"),
        F.col("c.y").alias("yb"),
    )
    prod = (F.col("xa") - F.col("xb")) * (F.col("ya") - F.col("yb"))
    conc = F.sum(F.when(prod > 0, 1).otherwise(0))
    disc = F.sum(F.when(prod < 0, 1).otherwise(0))
    tx = F.sum(F.when(F.col("xa") == F.col("xb"), 1).otherwise(0))
    ty = F.sum(F.when(F.col("ya") == F.col("yb"), 1).otherwise(0))
    n = F.count(F.lit(1))
    return pairs.agg(
        conc.cast("bigint").alias("concordant"),
        disc.cast("bigint").alias("discordant"),
        tx.cast("bigint").alias("ties_price"),
        ty.cast("bigint").alias("ties_qty"),
        F.round(
            (conc - disc).cast("double") / F.sqrt((n - tx) * (n - ty)), 6
        ).alias("tau_b"),
    )


@register(
    "q416_theil_decomposition",
    """
    WITH cust AS (
      SELECT o_custkey, SUM(o_totalprice) AS x
      FROM orders GROUP BY o_custkey
    ),
    g AS (
      SELECT n.n_name AS nation, COUNT(*)::DOUBLE AS n,
             SUM(cust.x) AS sx, SUM(cust.x * LN(cust.x)) AS sxlx
      FROM cust
      JOIN customer c ON cust.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY n.n_name
    ),
    tot AS (SELECT SUM(n) AS nt, SUM(sx) AS sxt FROM g)
    SELECT g.nation,
           CAST(g.n AS BIGINT) AS n_customers,
           ROUND(g.sx / tot.sxt, 6) AS income_share,
           ROUND(g.sxlx / g.sx - LN(g.sx / g.n), 6) AS theil_within,
           ROUND((g.sx / tot.sxt)
                 * (g.sxlx / g.sx - LN(g.sx / g.n)), 6) AS within_contrib,
           ROUND((g.sx / tot.sxt)
                 * LN((g.sx / g.n) / (tot.sxt / tot.nt)), 6) AS between_term
    FROM g CROSS JOIN tot
    """,
)
def q416_theil_decomposition(spark, sf_dir):
    """Theil-T inequality of customer lifetime spend, decomposed by
    nation: T = Σ_g s_g·T_g (within) + Σ_g s_g·ln(μ_g/μ) (between),
    where s_g is the nation's share of total spend.  Unlike the Gini
    family (q230/q323) the Theil index is additively decomposable, so
    'how much inequality is cross-country vs within-country' falls out
    exactly.  Each nation's T_g comes from sufficient statistics only
    (n, Σx, Σx·ln x) — one grouped pass over the per-customer
    aggregate, a 25-row broadcast against the grand totals, no sort."""
    od = _t(spark, sf_dir, "orders")
    cu = _t(spark, sf_dir, "customer")
    na = _t(spark, sf_dir, "nation")
    cust = od.groupBy("o_custkey").agg(F.sum("o_totalprice").alias("x"))
    g = (
        cust.join(cu, cust.o_custkey == cu.c_custkey)
        .join(F.broadcast(na), cu.c_nationkey == na.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            F.sum("x").alias("sx"),
            F.sum(F.col("x") * F.log("x")).alias("sxlx"),
        )
    )
    tot = g.agg(F.sum("n").alias("nt"), F.sum("sx").alias("sxt"))
    share = F.col("sx") / F.col("sxt")
    t_within = F.col("sxlx") / F.col("sx") - F.log(F.col("sx") / F.col("n"))
    return g.crossJoin(F.broadcast(tot)).select(
        "nation",
        F.col("n").cast("bigint").alias("n_customers"),
        F.round(share, 6).alias("income_share"),
        F.round(t_within, 6).alias("theil_within"),
        F.round(share * t_within, 6).alias("within_contrib"),
        F.round(
            share
            * F.log(
                (F.col("sx") / F.col("n")) / (F.col("sxt") / F.col("nt"))
            ),
            6,
        ).alias("between_term"),
    )


@register(
    "q417_mixture_epochs",
    r"""
    WITH s AS (
      SELECT source,
             CAST(SUM(len(list_filter(
                 string_split_regex(trim(text), '\s+'),
                 w -> w <> ''))) AS DOUBLE) AS toks
      FROM documents GROUP BY source
    ),
    tot AS (SELECT SUM(toks) AS tt, COUNT(*)::DOUBLE AS k FROM s)
    SELECT s.source,
           CAST(s.toks AS BIGINT) AS tokens,
           ROUND(0.5 * tot.tt / tot.k, 4) AS requested_tokens,
           ROUND(0.5 * tot.tt / tot.k / s.toks, 6) AS epochs_needed,
           ROUND(LEAST(0.5 * tot.tt / tot.k / s.toks, 2.0), 6)
             AS epochs_capped,
           ROUND(LEAST(0.5 * tot.tt / tot.k / s.toks, 2.0) * s.toks, 4)
             AS achieved_tokens,
           ROUND(GREATEST(0.5 * tot.tt / tot.k
                 - LEAST(0.5 * tot.tt / tot.k / s.toks, 2.0) * s.toks,
                 0), 4) AS shortfall_tokens
    FROM s CROSS JOIN tot
    """,
)
def q417_mixture_epochs(spark, sf_dir):
    """Training-mixture epoch solver: given a token budget (here half
    the corpus) split uniformly across sources, how many epochs of
    each source does its slice demand, capped at a max-repetition
    budget (2 epochs, the data-constrained-scaling rule of thumb), and
    how many tokens go unfilled.  The per-source token census is one
    grouped scan; everything after is arithmetic on the 20-row source
    table against a broadcast grand total — the planner that decides
    'can this mixture even be served by this corpus'."""
    d = _t(spark, sf_dir, "documents")
    toks = F.size(
        F.filter(
            F.split(F.trim(F.col("text")), r"\s+"), lambda w: w != ""
        )
    )
    s = d.groupBy("source").agg(
        F.sum(toks).cast("double").alias("toks")
    )
    tot = s.agg(
        F.sum("toks").alias("tt"),
        F.count(F.lit(1)).cast("double").alias("k"),
    )
    req = F.lit(0.5) * F.col("tt") / F.col("k")
    need = req / F.col("toks")
    capped = F.least(need, F.lit(2.0))
    return s.crossJoin(F.broadcast(tot)).select(
        "source",
        F.col("toks").cast("bigint").alias("tokens"),
        F.round(req, 4).alias("requested_tokens"),
        F.round(need, 6).alias("epochs_needed"),
        F.round(capped, 6).alias("epochs_capped"),
        F.round(capped * F.col("toks"), 4).alias("achieved_tokens"),
        F.round(
            F.greatest(req - capped * F.col("toks"), F.lit(0.0)), 4
        ).alias("shortfall_tokens"),
    )


@register(
    "q418_changepoint_split",
    """
    WITH daily AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
             SUM(o_totalprice) AS rev
      FROM orders GROUP BY 1
    ),
    cum AS (
      SELECT day,
             ROW_NUMBER() OVER (ORDER BY day) AS t,
             SUM(rev) OVER (ORDER BY day) AS cs,
             SUM(rev * rev) OVER (ORDER BY day) AS css,
             COUNT(*) OVER () AS n,
             SUM(rev) OVER () AS ts,
             SUM(rev * rev) OVER () AS tss
      FROM daily
    ),
    scored AS (
      SELECT day, t, n,
             tss - ts * ts / n AS sse_total,
             (css - cs * cs / t)
             + ((tss - css) - (ts - cs) * (ts - cs) / (n - t)) AS sse_split
      FROM cum WHERE t < n
    )
    SELECT day AS split_day,
           CAST(t AS BIGINT) AS n_left,
           CAST(n - t AS BIGINT) AS n_right,
           ROUND(sse_total, 4) AS sse_total,
           ROUND(sse_split, 4) AS sse_split,
           ROUND(1 - sse_split / sse_total, 6) AS var_reduction
    FROM scored
    ORDER BY sse_split, day
    LIMIT 1
    """,
)
def q418_changepoint_split(spark, sf_dir):
    """Single change-point detection on daily revenue (binary
    segmentation, step 1): the split day minimizing the summed
    within-segment SSE, found in closed form from running (Σx, Σx²)
    prefixes — SSE(1..t) = css_t − cs_t²/t, same for the suffix — so
    scoring every candidate split is one ordered cumulative window
    over the ~2.4k-row daily aggregate, not n² segment rescans.
    Ties break to the earliest day."""
    od = _t(spark, sf_dir, "orders")
    daily = od.groupBy(
        F.to_date(F.date_trunc("DAY", "o_orderdate")).alias("day")
    ).agg(F.sum("o_totalprice").alias("rev"))
    wc = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy()
    cum = daily.select(
        "day",
        F.row_number().over(Window.orderBy("day")).alias("t"),
        F.sum("rev").over(wc).alias("cs"),
        F.sum(F.col("rev") * F.col("rev")).over(wc).alias("css"),
        F.count(F.lit(1)).over(wall).alias("n"),
        F.sum("rev").over(wall).alias("ts"),
        F.sum(F.col("rev") * F.col("rev")).over(wall).alias("tss"),
    ).filter(F.col("t") < F.col("n"))
    sse_total = F.col("tss") - F.col("ts") * F.col("ts") / F.col("n")
    sse_split = (
        F.col("css") - F.col("cs") * F.col("cs") / F.col("t")
    ) + (
        (F.col("tss") - F.col("css"))
        - (F.col("ts") - F.col("cs"))
        * (F.col("ts") - F.col("cs"))
        / (F.col("n") - F.col("t"))
    )
    return (
        cum.select(
            F.col("day").alias("split_day"),
            F.col("t").cast("bigint").alias("n_left"),
            (F.col("n") - F.col("t")).cast("bigint").alias("n_right"),
            F.round(sse_total, 4).alias("sse_total"),
            F.round(sse_split, 4).alias("sse_split"),
            F.round(F.lit(1) - sse_split / sse_total, 6).alias(
                "var_reduction"
            ),
            sse_split.alias("_raw"),
        )
        .orderBy("_raw", "split_day")
        .limit(1)
        .drop("_raw")
    )


@register(
    "q419_fdr_bh",
    """
    WITH s AS (
      SELECT p.p_brand AS brand,
             CASE WHEN l.l_discount >= 0.05 THEN 1 ELSE 0 END AS disc,
             COUNT(*)::DOUBLE AS n, AVG(l.l_quantity) AS m,
             VAR_SAMP(l.l_quantity) AS v
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY 1, 2
    ),
    z AS (
      SELECT a.brand,
             (a.m - b.m) / SQRT(a.v / a.n + b.v / b.n) AS zstat
      FROM s a JOIN s b ON a.brand = b.brand
                       AND a.disc = 1 AND b.disc = 0
    ),
    p AS (
      SELECT brand, zstat,
             1 - (1 - (((((1.061405429
                   * (1 / (1 + 0.3275911 * (ABS(zstat) / SQRT(2))))
                   - 1.453152027)
                   * (1 / (1 + 0.3275911 * (ABS(zstat) / SQRT(2))))
                   + 1.421413741)
                   * (1 / (1 + 0.3275911 * (ABS(zstat) / SQRT(2))))
                   - 0.284496736)
                   * (1 / (1 + 0.3275911 * (ABS(zstat) / SQRT(2))))
                   + 0.254829592)
                   * (1 / (1 + 0.3275911 * (ABS(zstat) / SQRT(2))))
                   * EXP(-(ABS(zstat) / SQRT(2)) * (ABS(zstat) / SQRT(2)))))
               AS pval
      FROM z
    ),
    ranked AS (
      SELECT brand, zstat, pval,
             ROW_NUMBER() OVER (ORDER BY pval, brand) AS prank,
             COUNT(*) OVER () AS m
      FROM p
    ),
    kstar AS (
      SELECT MAX(CASE WHEN pval <= prank * 0.05 / m THEN prank END)
               OVER () AS k
      FROM ranked LIMIT 1
    )
    SELECT r.brand,
           ROUND(r.zstat, 4) AS z_stat,
           ROUND(r.pval, 6) AS p_value,
           CAST(r.prank AS BIGINT) AS p_rank,
           ROUND(r.prank * 0.05 / r.m, 6) AS bh_threshold,
           CAST(CASE WHEN kstar.k IS NOT NULL AND r.prank <= kstar.k
                     THEN 1 ELSE 0 END AS BIGINT) AS rejected
    FROM ranked r CROSS JOIN kstar
    """,
)
def q419_fdr_bh(spark, sf_dir):
    """Benjamini-Hochberg FDR control over 25 simultaneous hypothesis
    tests: per brand, a Welch z-test of 'do discounted line items move
    different quantities', two-sided p via the Abramowitz-Stegun
    7.1.26 erf polynomial (pure arithmetic, so Spark and the DuckDB
    oracle evaluate the identical expression), then the BH step-up —
    rank p ascending, find the largest k with p_(k) ≤ k·α/m, reject
    ranks ≤ k.  The multiple-testing gate every per-segment screening
    query should end with: at α=0.05 across 25 brands, ~1.25 false
    positives are expected from noise alone.  All window work runs on
    the 25-row test table; the fact scan is one grouped pass."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    s = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.when(F.col("l_discount") >= 0.05, 1).otherwise(0).alias(
                "disc"
            ),
        )
        .agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            F.avg("l_quantity").alias("m"),
            F.var_samp("l_quantity").alias("v"),
        )
    )
    a = s.filter(F.col("disc") == 1).select(
        "brand",
        F.col("n").alias("na"),
        F.col("m").alias("ma"),
        F.col("v").alias("va"),
    )
    b = s.filter(F.col("disc") == 0).select(
        F.col("brand").alias("brand_b"),
        F.col("n").alias("nb"),
        F.col("m").alias("mb"),
        F.col("v").alias("vb"),
    )
    z = a.join(b, a.brand == b.brand_b).select(
        "brand",
        (
            (F.col("ma") - F.col("mb"))
            / F.sqrt(F.col("va") / F.col("na") + F.col("vb") / F.col("nb"))
        ).alias("zstat"),
    )
    # Abramowitz-Stegun 7.1.26: identical arithmetic to the oracle SQL.
    x = F.abs(F.col("zstat")) / F.sqrt(F.lit(2))
    t = F.lit(1) / (F.lit(1) + F.lit(0.3275911) * x)
    erf = (
        (
            (
                (
                    (F.lit(1.061405429) * t - F.lit(1.453152027)) * t
                    + F.lit(1.421413741)
                )
                * t
                - F.lit(0.284496736)
            )
            * t
            + F.lit(0.254829592)
        )
        * t
        * F.exp(-x * x)
    )
    pv = z.withColumn("pval", F.lit(1) - (F.lit(1) - erf))
    ranked = pv.select(
        "brand",
        "zstat",
        "pval",
        F.row_number().over(Window.orderBy("pval", "brand")).alias("prank"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("m"),
    )
    wall = Window.partitionBy()
    withk = ranked.withColumn(
        "k",
        F.max(
            F.when(
                F.col("pval") <= F.col("prank") * F.lit(0.05) / F.col("m"),
                F.col("prank"),
            )
        ).over(wall),
    )
    return withk.select(
        "brand",
        F.round("zstat", 4).alias("z_stat"),
        F.round("pval", 6).alias("p_value"),
        F.col("prank").cast("bigint").alias("p_rank"),
        F.round(F.col("prank") * F.lit(0.05) / F.col("m"), 6).alias(
            "bh_threshold"
        ),
        F.when(
            F.col("k").isNotNull() & (F.col("prank") <= F.col("k")), 1
        )
        .otherwise(0)
        .cast("bigint")
        .alias("rejected"),
    )


@register(
    "q420_zonemap_skipping",
    """
    WITH zone AS (
      SELECT l_orderkey // 1000 AS rg,
             CAST(MIN(l_shipdate) AS DATE) AS lo_ship,
             CAST(MAX(l_shipdate) AS DATE) AS hi_ship,
             COUNT(*) AS n_rows
      FROM lineitem GROUP BY 1
    ),
    preds AS (
      SELECT * FROM (VALUES
        ('h2_1995', DATE '1995-07-01', DATE '1996-01-01'),
        ('q1_1994', DATE '1994-01-01', DATE '1994-04-01'),
        ('week_jun95', DATE '1995-06-01', DATE '1995-06-08')
      ) AS v(pname, lo, hi)
    )
    SELECT p.pname,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(CASE WHEN z.hi_ship < p.lo OR z.lo_ship >= p.hi
                         THEN 1 ELSE 0 END) AS BIGINT)
             AS skippable_groups,
           ROUND(SUM(CASE WHEN z.hi_ship < p.lo OR z.lo_ship >= p.hi
                          THEN 1.0 ELSE 0 END) / COUNT(*), 6)
             AS group_skip_frac,
           CAST(SUM(z.n_rows) AS BIGINT) AS rows_total,
           CAST(SUM(CASE WHEN z.hi_ship < p.lo OR z.lo_ship >= p.hi
                         THEN z.n_rows ELSE 0 END) AS BIGINT)
             AS rows_skipped,
           ROUND(SUM(CASE WHEN z.hi_ship < p.lo OR z.lo_ship >= p.hi
                          THEN CAST(z.n_rows AS DOUBLE) ELSE 0 END)
                 / SUM(z.n_rows), 6) AS row_skip_frac
    FROM zone z CROSS JOIN preds p
    GROUP BY p.pname
    """,
)
def q420_zonemap_skipping(spark, sf_dir):
    """Zone-map data-skipping effectiveness: build per-row-group
    min/max statistics for l_shipdate (synthetic 1000-orderkey row
    groups — the stand-in for parquet row-group footers) and measure,
    for three ship-date predicates, what fraction of groups and rows a
    scan could skip outright (group max < lo, or group min ≥ hi).
    This is the layout-quality audit behind Z-ordering (q116): on
    time-correlated data the skip fraction is high and a 100 TB scan
    touches only the matching footers; on shuffled data it collapses
    to zero and the same predicate reads everything.  One grouped pass
    builds the zone table; the predicate sweep is a 3-row broadcast."""
    li = _t(spark, sf_dir, "lineitem")
    zone = li.groupBy(
        F.floor(F.col("l_orderkey") / 1000).alias("rg")
    ).agg(
        F.min("l_shipdate").cast("date").alias("lo_ship"),
        F.max("l_shipdate").cast("date").alias("hi_ship"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    preds = spark.createDataFrame(
        [
            ("h2_1995", "1995-07-01", "1996-01-01"),
            ("q1_1994", "1994-01-01", "1994-04-01"),
            ("week_jun95", "1995-06-01", "1995-06-08"),
        ],
        "pname string, lo string, hi string",
    ).select(
        "pname",
        F.to_date("lo").alias("lo"),
        F.to_date("hi").alias("hi"),
    )
    skip = (F.col("hi_ship") < F.col("lo")) | (
        F.col("lo_ship") >= F.col("hi")
    )
    return (
        zone.crossJoin(F.broadcast(preds))
        .groupBy("pname")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_groups"),
            F.sum(F.when(skip, 1).otherwise(0))
            .cast("bigint")
            .alias("skippable_groups"),
            F.round(
                F.sum(F.when(skip, F.lit(1.0)).otherwise(0))
                / F.count(F.lit(1)),
                6,
            ).alias("group_skip_frac"),
            F.sum("n_rows").cast("bigint").alias("rows_total"),
            F.sum(F.when(skip, F.col("n_rows")).otherwise(0))
            .cast("bigint")
            .alias("rows_skipped"),
            F.round(
                F.sum(
                    F.when(
                        skip, F.col("n_rows").cast("double")
                    ).otherwise(0)
                )
                / F.sum("n_rows"),
                6,
            ).alias("row_skip_frac"),
        )
    )


@register(
    "q421_mann_whitney",
    """
    WITH vals AS (
      SELECT n_chars AS v,
             CAST(SUM(CASE WHEN source = 'src0' THEN 1 ELSE 0 END)
                  AS DOUBLE) AS c0,
             COUNT(*)::DOUBLE AS ct
      FROM documents WHERE source IN ('src0', 'src1')
      GROUP BY n_chars
    ),
    r AS (
      SELECT v, c0, ct,
             SUM(ct) OVER (ORDER BY v) - ct AS cumbefore
      FROM vals
    ),
    s AS (
      SELECT SUM(c0 * (cumbefore + (ct + 1) / 2)) AS r1,
             SUM(c0) AS n1, SUM(ct) AS n, SUM(ct - c0) AS n2,
             SUM(ct * ct * ct - ct) AS tiesum
      FROM r
    )
    SELECT CAST(n1 AS BIGINT) AS n_src0,
           CAST(n2 AS BIGINT) AS n_src1,
           ROUND(r1, 2) AS rank_sum_src0,
           ROUND(r1 - n1 * (n1 + 1) / 2, 2) AS u_stat,
           ROUND((r1 - n1 * (n1 + 1) / 2 - n1 * n2 / 2)
                 / SQRT(n1 * n2 / 12
                        * ((n + 1) - tiesum / (n * (n - 1)))), 4)
             AS z_stat
    FROM s
    """,
)
def q421_mann_whitney(spark, sf_dir):
    """Mann-Whitney U rank-sum test between two sources' document
    lengths — the nonparametric sibling of q278's Welch t: no
    normality assumption, tie-corrected normal approximation.
    Average ranks come from the VALUE-level histogram (cumulative
    count before each distinct value + (t+1)/2), so the rank
    computation runs over distinct lengths, not rows — the same
    sufficient-statistics discipline as the ANOVA family, and at
    100 TB the only shuffle is the value histogram."""
    d = _t(spark, sf_dir, "documents").filter(
        F.col("source").isin("src0", "src1")
    )
    vals = d.groupBy(F.col("n_chars").alias("v")).agg(
        F.sum(F.when(F.col("source") == "src0", 1).otherwise(0))
        .cast("double")
        .alias("c0"),
        F.count(F.lit(1)).cast("double").alias("ct"),
    )
    wc = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    r = vals.select(
        "c0",
        "ct",
        (F.sum("ct").over(wc) - F.col("ct")).alias("cumbefore"),
    )
    s = r.agg(
        F.sum(
            F.col("c0") * (F.col("cumbefore") + (F.col("ct") + 1) / 2)
        ).alias("r1"),
        F.sum("c0").alias("n1"),
        F.sum("ct").alias("n"),
        F.sum(F.col("ct") - F.col("c0")).alias("n2"),
        F.sum(
            F.col("ct") * F.col("ct") * F.col("ct") - F.col("ct")
        ).alias("tiesum"),
    )
    u = F.col("r1") - F.col("n1") * (F.col("n1") + 1) / 2
    sigma = F.sqrt(
        F.col("n1")
        * F.col("n2")
        / 12
        * (
            (F.col("n") + 1)
            - F.col("tiesum") / (F.col("n") * (F.col("n") - 1))
        )
    )
    return s.select(
        F.col("n1").cast("bigint").alias("n_src0"),
        F.col("n2").cast("bigint").alias("n_src1"),
        F.round("r1", 2).alias("rank_sum_src0"),
        F.round(u, 2).alias("u_stat"),
        F.round(
            (u - F.col("n1") * F.col("n2") / 2) / sigma, 4
        ).alias("z_stat"),
    )


@register(
    "q422_mcnemar",
    """
    WITH bounds AS (
      SELECT MIN(epoch_us(ts)) AS lo, MAX(epoch_us(ts)) AS hi
      FROM events
    ),
    thr AS (
      SELECT quantile_cont(value, 0.75) AS p75
      FROM events WHERE event_type = 'purchase'
    ),
    u AS (
      SELECT e.user_id,
             MAX(CASE WHEN e.event_type = 'purchase' AND e.value > t.p75
                       AND 2 * epoch_us(e.ts) < b.lo + b.hi
                      THEN 1 ELSE 0 END) AS h1,
             MAX(CASE WHEN e.event_type = 'purchase' AND e.value > t.p75
                       AND 2 * epoch_us(e.ts) >= b.lo + b.hi
                      THEN 1 ELSE 0 END) AS h2
      FROM events e CROSS JOIN bounds b CROSS JOIN thr t
      GROUP BY e.user_id
    )
    SELECT CAST(SUM(CASE WHEN h1 = 1 AND h2 = 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS both_halves,
           CAST(SUM(CASE WHEN h1 = 1 AND h2 = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS first_only,
           CAST(SUM(CASE WHEN h1 = 0 AND h2 = 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS second_only,
           CAST(SUM(CASE WHEN h1 = 0 AND h2 = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS neither,
           ROUND(POWER(ABS(CAST(SUM(CASE WHEN h1 = 1 AND h2 = 0
                                         THEN 1 ELSE 0 END)
                              - SUM(CASE WHEN h1 = 0 AND h2 = 1
                                         THEN 1 ELSE 0 END) AS DOUBLE))
                       - 1, 2)
                 / (SUM(CASE WHEN h1 = 1 AND h2 = 0 THEN 1 ELSE 0 END)
                  + SUM(CASE WHEN h1 = 0 AND h2 = 1 THEN 1 ELSE 0 END)),
                 4) AS chi2_cc
    FROM u
    """,
)
def q422_mcnemar(spark, sf_dir):
    """McNemar's paired test on user high-value purchase activity: did
    the same users make an above-p75 purchase in the first and second
    half of the observation window?  The 2×2 paired table (both /
    first-only / second-only / neither) and the continuity-corrected
    chi² = (|b−c|−1)²/(b+c), which only the DISCORDANT cells drive —
    the right test for 'did behavior change' on paired observations,
    where a two-sample test would throw away the pairing.  (Plain
    'any purchase' is degenerate on this fixture — every user buys in
    both halves, b+c=0 — hence the p75 value threshold.)  The
    half-window midpoint is integer microsecond arithmetic
    (2·ts < lo+hi), identical in both engines; one grouped pass per
    user, then a 4-cell fold."""
    ev = _t(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    bounds = ev.agg(
        F.min(us).alias("lo"), F.max(us).alias("hi")
    )
    thr = ev.filter(F.col("event_type") == "purchase").agg(
        F.expr("percentile(value, 0.75)").alias("p75")
    )
    first_half = F.lit(2) * us < F.col("lo") + F.col("hi")
    is_p = (F.col("event_type") == "purchase") & (
        F.col("value") > F.col("p75")
    )
    u = (
        ev.crossJoin(F.broadcast(bounds))
        .crossJoin(F.broadcast(thr))
        .groupBy("user_id")
        .agg(
            F.max(
                F.when(is_p & first_half, 1).otherwise(0)
            ).alias("h1"),
            F.max(
                F.when(is_p & ~first_half, 1).otherwise(0)
            ).alias("h2"),
        )
    )
    b = F.sum(
        F.when((F.col("h1") == 1) & (F.col("h2") == 0), 1).otherwise(0)
    )
    c = F.sum(
        F.when((F.col("h1") == 0) & (F.col("h2") == 1), 1).otherwise(0)
    )
    return u.agg(
        F.sum(
            F.when((F.col("h1") == 1) & (F.col("h2") == 1), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("both_halves"),
        b.cast("bigint").alias("first_only"),
        c.cast("bigint").alias("second_only"),
        F.sum(
            F.when((F.col("h1") == 0) & (F.col("h2") == 0), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("neither"),
        F.round(
            F.pow(F.abs((b - c).cast("double")) - 1, 2) / (b + c), 4
        ).alias("chi2_cc"),
    )


@register(
    "q423_hurst_exponent",
    """
    WITH daily AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
             SUM(o_totalprice) AS rev
      FROM orders GROUP BY 1
    ),
    seq AS (
      SELECT rev, ROW_NUMBER() OVER (ORDER BY day) AS rn FROM daily
    ),
    sized AS (
      SELECT s.sz, q.rn, q.rev,
             CAST((q.rn - 1) AS BIGINT) // s.sz AS blk
      FROM seq q CROSS JOIN (VALUES (8), (16), (32), (64)) AS s(sz)
    ),
    dev AS (
      SELECT sz, blk, rn, rev,
             rev - AVG(rev) OVER (PARTITION BY sz, blk) AS d,
             COUNT(*) OVER (PARTITION BY sz, blk) AS bn
      FROM sized
    ),
    cum AS (
      SELECT sz, blk, bn, rev,
             SUM(d) OVER (PARTITION BY sz, blk ORDER BY rn) AS cd
      FROM dev WHERE bn = sz
    ),
    blocks AS (
      SELECT sz, blk,
             (MAX(cd) - MIN(cd)) / STDDEV_POP(rev) AS rs
      FROM cum GROUP BY sz, blk
    ),
    per_size AS (
      SELECT sz, COUNT(*) AS n_blocks, AVG(rs) AS mean_rs
      FROM blocks GROUP BY sz
    )
    SELECT CAST(sz AS BIGINT) AS block_size,
           CAST(n_blocks AS BIGINT) AS n_blocks,
           ROUND(mean_rs, 6) AS mean_rs,
           ROUND((AVG(LN(sz) * LN(mean_rs)) OVER ()
                  - AVG(LN(sz)) OVER () * AVG(LN(mean_rs)) OVER ())
                 / (AVG(LN(sz) * LN(sz)) OVER ()
                    - AVG(LN(sz)) OVER () * AVG(LN(sz)) OVER ()), 4)
             AS hurst
    FROM per_size
    """,
)
def q423_hurst_exponent(spark, sf_dir):
    """Hurst exponent of daily revenue by rescaled-range analysis:
    chunk the series into blocks of 8/16/32/64 days, compute each
    block's R/S (range of cumulative mean-deviations over the
    population std), average per size, and fit the log-log slope —
    H≈0.5 is a random walk, H>0.5 long-range persistence (trending
    demand), H<0.5 mean reversion.  The only row-level work is one
    ordered window per (size, block) partition over the 2.4k-day
    aggregate; the regression runs on the 4-row size table."""
    od = _t(spark, sf_dir, "orders")
    daily = od.groupBy(
        F.to_date(F.date_trunc("DAY", "o_orderdate")).alias("day")
    ).agg(F.sum("o_totalprice").alias("rev"))
    seq = daily.select(
        "rev", F.row_number().over(Window.orderBy("day")).alias("rn")
    )
    sizes = daily.sparkSession.createDataFrame(
        [(8,), (16,), (32,), (64,)], "sz int"
    )
    sized = seq.crossJoin(F.broadcast(sizes)).withColumn(
        "blk", ((F.col("rn") - 1).cast("bigint") / F.col("sz")).cast("bigint")
    )
    wb = Window.partitionBy("sz", "blk")
    dev = sized.select(
        "sz",
        "blk",
        "rn",
        "rev",
        (F.col("rev") - F.avg("rev").over(wb)).alias("d"),
        F.count(F.lit(1)).over(wb).alias("bn"),
    ).filter(F.col("bn") == F.col("sz"))
    cum = dev.select(
        "sz",
        "blk",
        "rev",
        F.sum("d")
        .over(
            Window.partitionBy("sz", "blk")
            .orderBy("rn")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        .alias("cd"),
    )
    blocks = cum.groupBy("sz", "blk").agg(
        ((F.max("cd") - F.min("cd")) / F.stddev_pop("rev")).alias("rs")
    )
    per_size = blocks.groupBy("sz").agg(
        F.count(F.lit(1)).alias("n_blocks"),
        F.avg("rs").alias("mean_rs"),
    )
    wall = Window.partitionBy()
    ls, lr = F.log("sz"), F.log("mean_rs")
    slope = (
        F.avg(ls * lr).over(wall) - F.avg(ls).over(wall) * F.avg(lr).over(wall)
    ) / (
        F.avg(ls * ls).over(wall)
        - F.avg(ls).over(wall) * F.avg(ls).over(wall)
    )
    return per_size.select(
        F.col("sz").cast("bigint").alias("block_size"),
        F.col("n_blocks").cast("bigint").alias("n_blocks"),
        F.round("mean_rs", 6).alias("mean_rs"),
        F.round(slope, 4).alias("hurst"),
    )


@register(
    "q424_sax_symbols",
    """
    WITH daily AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
             SUM(o_totalprice) AS rev
      FROM orders GROUP BY 1
    ),
    z AS (
      SELECT ROW_NUMBER() OVER (ORDER BY day) AS rn,
             (rev - AVG(rev) OVER ()) / STDDEV_SAMP(rev) OVER () AS zv
      FROM daily
    ),
    paa AS (
      SELECT (rn - 1) // 10 AS blk, AVG(zv) AS pv, COUNT(*) AS bn
      FROM z GROUP BY 1 HAVING COUNT(*) = 10
    ),
    sym AS (
      SELECT blk,
             CASE WHEN pv < -0.6745 THEN 'a'
                  WHEN pv < 0 THEN 'b'
                  WHEN pv < 0.6745 THEN 'c'
                  ELSE 'd' END AS s
      FROM paa
    ),
    trans AS (
      SELECT LAG(s) OVER (ORDER BY blk) AS prev_s, s
      FROM sym
    )
    SELECT prev_s, s AS next_s,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM trans WHERE prev_s IS NOT NULL
    GROUP BY prev_s, s
    """,
)
def q424_sax_symbols(spark, sf_dir):
    """SAX symbolization of daily revenue: z-normalize the series,
    Piecewise Aggregate Approximation into 10-day frames, map frame
    means to a 4-letter alphabet at the N(0,1) quartile breakpoints
    (±0.6745, 0), and report the symbol-transition counts — the
    discretization that turns a numeric series into a string so
    motif mining, anomaly grammars, and suffix indexing apply.  All
    heavy lifting is two ordered windows over the 2.4k-day daily
    aggregate; the PAA is a 10:1 compression done with one hash agg."""
    od = _t(spark, sf_dir, "orders")
    daily = od.groupBy(
        F.to_date(F.date_trunc("DAY", "o_orderdate")).alias("day")
    ).agg(F.sum("o_totalprice").alias("rev"))
    wall = Window.partitionBy()
    z = daily.select(
        F.row_number().over(Window.orderBy("day")).alias("rn"),
        (
            (F.col("rev") - F.avg("rev").over(wall))
            / F.stddev_samp("rev").over(wall)
        ).alias("zv"),
    )
    paa = (
        z.groupBy(((F.col("rn") - 1) / 10).cast("bigint").alias("blk"))
        .agg(F.avg("zv").alias("pv"), F.count(F.lit(1)).alias("bn"))
        .filter(F.col("bn") == 10)
    )
    sym = paa.select(
        "blk",
        F.when(F.col("pv") < -0.6745, "a")
        .when(F.col("pv") < 0, "b")
        .when(F.col("pv") < 0.6745, "c")
        .otherwise("d")
        .alias("s"),
    )
    trans = sym.select(
        F.lag("s").over(Window.orderBy("blk")).alias("prev_s"), "s"
    ).filter(F.col("prev_s").isNotNull())
    return trans.groupBy("prev_s", F.col("s").alias("next_s")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )


@register(
    "q425_pareto_knee",
    """
    WITH rev AS (
      SELECT l_partkey, SUM(l_extendedprice * (1 - l_discount)) AS r
      FROM lineitem GROUP BY l_partkey
    ),
    curve AS (
      SELECT ROW_NUMBER() OVER (ORDER BY r DESC, l_partkey) AS rk,
             COUNT(*) OVER () AS n,
             SUM(r) OVER (ORDER BY r DESC, l_partkey)
               / SUM(r) OVER () AS cum_share
      FROM rev
    )
    SELECT CAST(rk AS BIGINT) AS knee_rank,
           ROUND(CAST(rk AS DOUBLE) / n, 6) AS frac_items,
           ROUND(cum_share, 6) AS cum_share,
           ROUND(cum_share - CAST(rk AS DOUBLE) / n, 6) AS chord_gap
    FROM curve
    ORDER BY cum_share - CAST(rk AS DOUBLE) / n DESC, rk
    LIMIT 1
    """,
)
def q425_pareto_knee(spark, sf_dir):
    """Knee detection on the part-revenue Pareto curve: the point of
    maximum perpendicular distance to the (0,0)→(1,1) chord — which
    for a unit-square Lorenz-style curve reduces to argmax(cum_share −
    rank/n) — the principled answer to 'where does the head end',
    instead of an arbitrary 80% cut (q411's fixed ABC bands).  One
    ordered cumulative window over the 2k-part aggregate, then a
    top-1; ties break to the earliest rank."""
    li = _t(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_partkey").agg(
        F.sum(
            F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
        ).alias("r")
    )
    wc = Window.orderBy(F.col("r").desc(), "l_partkey").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wall = Window.partitionBy()
    curve = rev.select(
        F.row_number()
        .over(Window.orderBy(F.col("r").desc(), "l_partkey"))
        .alias("rk"),
        F.count(F.lit(1)).over(wall).alias("n"),
        (F.sum("r").over(wc) / F.sum("r").over(wall)).alias("cum_share"),
    )
    gap = F.col("cum_share") - F.col("rk").cast("double") / F.col("n")
    return (
        curve.select(
            F.col("rk").cast("bigint").alias("knee_rank"),
            F.round(F.col("rk").cast("double") / F.col("n"), 6).alias(
                "frac_items"
            ),
            F.round("cum_share", 6).alias("cum_share"),
            F.round(gap, 6).alias("chord_gap"),
            gap.alias("_g"),
        )
        .orderBy(F.col("_g").desc(), "knee_rank")
        .limit(1)
        .drop("_g")
    )


@register(
    "q426_term_burstiness",
    r"""
    WITH tf AS (
      SELECT doc_id, w, COUNT(*) AS c
      FROM (
        SELECT doc_id,
               UNNEST(list_filter(
                 string_split_regex(trim(lower(text)), '\s+'),
                 x -> x <> '')) AS w
        FROM documents
      ) GROUP BY doc_id, w
    ),
    terms AS (
      SELECT w,
             COUNT(*)::DOUBLE AS df,
             SUM(CASE WHEN c >= 2 THEN 1 ELSE 0 END)::DOUBLE AS df2,
             AVG(c) AS mean_tf
      FROM tf GROUP BY w HAVING COUNT(*) >= 20
    )
    SELECT w AS term,
           CAST(df AS BIGINT) AS df,
           CAST(df2 AS BIGINT) AS df_multi,
           ROUND(df2 / df, 6) AS burstiness,
           ROUND(mean_tf, 6) AS mean_tf
    FROM terms
    ORDER BY df2 / df DESC, w
    LIMIT 25
    """,
)
def q426_term_burstiness(spark, sf_dir):
    """Church-Gale term burstiness: for each term with df ≥ 20, the
    probability a document that mentions it mentions it AGAIN
    (df₂/df).  Content words are bursty (one mention begets more);
    function words are Poisson-ish — so the ranking separates topical
    vocabulary from glue without any stopword list, and complements
    q234's TEMPORAL Fano factor with a within-document axis.  One
    explode → (doc, term) hash agg → term rollup; the df≥20 gate
    bounds the ranked set."""
    d = _t(spark, sf_dir, "documents")
    toks = F.filter(
        F.split(F.trim(F.lower(F.col("text"))), r"\s+"),
        lambda w: w != "",
    )
    tf = (
        d.select("doc_id", F.explode(toks).alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    terms = (
        tf.groupBy("w")
        .agg(
            F.count(F.lit(1)).cast("double").alias("df"),
            F.sum(F.when(F.col("c") >= 2, 1).otherwise(0))
            .cast("double")
            .alias("df2"),
            F.avg("c").alias("mean_tf"),
        )
        .filter(F.col("df") >= 20)
    )
    return (
        terms.select(
            F.col("w").alias("term"),
            F.col("df").cast("bigint").alias("df"),
            F.col("df2").cast("bigint").alias("df_multi"),
            F.round(F.col("df2") / F.col("df"), 6).alias("burstiness"),
            F.round("mean_tf", 6).alias("mean_tf"),
            (F.col("df2") / F.col("df")).alias("_b"),
        )
        .orderBy(F.col("_b").desc(), "term")
        .limit(25)
        .drop("_b")
    )


@register(
    "q427_negative_sampling",
    r"""
    WITH v AS (
      SELECT w, COUNT(*)::DOUBLE AS cnt
      FROM (
        SELECT UNNEST(list_filter(
                 string_split_regex(trim(lower(text)), '\s+'),
                 x -> x <> '')) AS w
        FROM documents
      ) GROUP BY w
    ),
    p AS (
      SELECT w, cnt,
             POWER(cnt, 0.75) / SUM(POWER(cnt, 0.75)) OVER () AS ps,
             cnt / SUM(cnt) OVER () AS pu
      FROM v
    ),
    cum AS (
      SELECT w, cnt, pu, ps,
             FLOOR(10000 * SUM(ps) OVER (ORDER BY cnt DESC, w))
             - FLOOR(10000 * (SUM(ps) OVER (ORDER BY cnt DESC, w) - ps))
               AS slots
      FROM p
    )
    SELECT w AS term,
           CAST(cnt AS BIGINT) AS cnt,
           ROUND(pu, 8) AS p_unigram,
           ROUND(ps, 8) AS p_smoothed,
           CAST(slots AS BIGINT) AS slots
    FROM cum
    ORDER BY cnt DESC, w
    LIMIT 20
    """,
)
def q427_negative_sampling(spark, sf_dir):
    """word2vec-style negative-sampling table: unigram frequencies
    raised to the 3/4 power and renormalized (the flattening that
    keeps rare words reachable), then a 10,000-slot sampling table
    apportioned by CUMULATIVE rounding — slotsᵢ = ⌊S·cumᵢ⌋ −
    ⌊S·cumᵢ₋₁⌋, which sums to the table size exactly and is
    deterministic under the (count desc, term) order both engines
    share.  The whole computation lives on the vocab aggregate; at
    100 TB the table build is one ordered window over ~10⁶ types,
    and the table itself broadcasts to samplers."""
    d = _t(spark, sf_dir, "documents")
    toks = F.filter(
        F.split(F.trim(F.lower(F.col("text"))), r"\s+"),
        lambda w: w != "",
    )
    v = (
        d.select(F.explode(toks).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("double").alias("cnt"))
    )
    wall = Window.partitionBy()
    p = v.select(
        "w",
        "cnt",
        (
            F.pow("cnt", 0.75) / F.sum(F.pow("cnt", 0.75)).over(wall)
        ).alias("ps"),
        (F.col("cnt") / F.sum("cnt").over(wall)).alias("pu"),
    )
    wc = Window.orderBy(F.col("cnt").desc(), "w").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = p.select(
        "w",
        "cnt",
        "pu",
        "ps",
        (
            F.floor(F.lit(10000) * F.sum("ps").over(wc))
            - F.floor(
                F.lit(10000) * (F.sum("ps").over(wc) - F.col("ps"))
            )
        ).alias("slots"),
    )
    return (
        cum.select(
            F.col("w").alias("term"),
            F.col("cnt").cast("bigint").alias("cnt"),
            F.round("pu", 8).alias("p_unigram"),
            F.round("ps", 8).alias("p_smoothed"),
            F.col("slots").cast("bigint").alias("slots"),
        )
        .orderBy(F.col("cnt").desc(), "term")
        .limit(20)
    )


@register(
    "q428_taxonomy_branching",
    """
    WITH lv AS (
      SELECT k.k,
             array_to_string(string_split(p.p_type, ' ')[1:k.k], ' ')
               AS node
      FROM part p CROSS JOIN (VALUES (1), (2), (3)) AS k(k)
    ),
    nodes AS (
      SELECT k, node, COUNT(*)::DOUBLE AS n_parts
      FROM lv GROUP BY k, node
    ),
    shares AS (
      SELECT k,
             n_parts / SUM(n_parts) OVER (PARTITION BY k) AS sh
      FROM nodes
    ),
    per_level AS (
      SELECT k, COUNT(*)::DOUBLE AS n_nodes,
             -SUM(sh * LN(sh)) AS entropy
      FROM shares GROUP BY k
    ),
    seq AS (
      SELECT k, n_nodes, entropy,
             LAG(n_nodes) OVER (ORDER BY k) AS prev_nodes
      FROM per_level
    )
    SELECT CAST(k AS BIGINT) AS level,
           CAST(n_nodes AS BIGINT) AS n_nodes,
           ROUND(n_nodes / COALESCE(prev_nodes, 1), 6) AS branching,
           ROUND(entropy, 6) AS entropy
    FROM seq
    """,
)
def q428_taxonomy_branching(spark, sf_dir):
    """Catalog taxonomy profile over the 3-word p_type hierarchy:
    distinct nodes at each prefix depth, the branching factor between
    consecutive levels, and the Shannon entropy of the part
    distribution per level — the shape audit that tells you whether a
    category tree partitions the catalog evenly (entropy near ln n)
    or dumps everything in one branch.  Word-prefix expansion is a
    3-way cross join on the dimension table; every aggregate runs on
    the node table."""
    p = _t(spark, sf_dir, "part")
    ks = p.sparkSession.createDataFrame([(1,), (2,), (3,)], "k int")
    lv = p.crossJoin(F.broadcast(ks)).select(
        "k",
        F.array_join(
            F.slice(F.split(F.col("p_type"), " "), 1, F.col("k")), " "
        ).alias("node"),
    )
    nodes = lv.groupBy("k", "node").agg(
        F.count(F.lit(1)).cast("double").alias("n_parts")
    )
    wk = Window.partitionBy("k")
    share = F.col("n_parts") / F.sum("n_parts").over(wk)
    per_level = (
        nodes.select("k", share.alias("sh"))
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).cast("double").alias("n_nodes"),
            (-F.sum(F.col("sh") * F.log("sh"))).alias("entropy"),
        )
    )
    seq = per_level.select(
        "k",
        "n_nodes",
        "entropy",
        F.lag("n_nodes").over(Window.orderBy("k")).alias("prev_nodes"),
    )
    return seq.select(
        F.col("k").cast("bigint").alias("level"),
        F.col("n_nodes").cast("bigint").alias("n_nodes"),
        F.round(
            F.col("n_nodes") / F.coalesce(F.col("prev_nodes"), F.lit(1.0)),
            6,
        ).alias("branching"),
        F.round("entropy", 6).alias("entropy"),
    )


@register(
    "q429_runs_test",
    """
    WITH daily AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
             SUM(o_totalprice) AS rev
      FROM orders GROUP BY 1
    ),
    med AS (SELECT quantile_cont(rev, 0.5) AS m FROM daily),
    signs AS (
      SELECT CASE WHEN d.rev > med.m THEN 1 ELSE 0 END AS s,
             LAG(CASE WHEN d.rev > med.m THEN 1 ELSE 0 END)
               OVER (ORDER BY d.day) AS prev_s
      FROM daily d CROSS JOIN med
    ),
    agg AS (
      SELECT SUM(s)::DOUBLE AS n1,
             SUM(1 - s)::DOUBLE AS n2,
             1 + SUM(CASE WHEN prev_s IS NOT NULL AND s <> prev_s
                          THEN 1 ELSE 0 END)::DOUBLE AS r
      FROM signs
    )
    SELECT CAST(n1 AS BIGINT) AS n_above,
           CAST(n2 AS BIGINT) AS n_below,
           CAST(r AS BIGINT) AS runs,
           ROUND((r - (2 * n1 * n2 / (n1 + n2) + 1))
                 / SQRT(2 * n1 * n2 * (2 * n1 * n2 - n1 - n2)
                        / (POWER(n1 + n2, 2) * (n1 + n2 - 1))), 4)
             AS z_stat
    FROM agg
    """,
)
def q429_runs_test(spark, sf_dir):
    """Wald-Wolfowitz runs test for randomness of daily revenue around
    its median: count maximal runs of above/below-median days and
    compare to the null mean 2n₁n₂/(n₁+n₂)+1 — too FEW runs means
    positive serial dependence (trending/regime-y demand), too many
    means oscillation.  The distribution-free cousin of q194's ACF:
    it needs only signs, so a single heavy-tailed day can't move it.
    One ordered lag over the daily aggregate, then scalar algebra."""
    od = _t(spark, sf_dir, "orders")
    daily = od.groupBy(
        F.to_date(F.date_trunc("DAY", "o_orderdate")).alias("day")
    ).agg(F.sum("o_totalprice").alias("rev"))
    med = daily.agg(F.expr("percentile(rev, 0.5)").alias("m"))
    s = F.when(F.col("rev") > F.col("m"), 1).otherwise(0)
    signs = daily.crossJoin(F.broadcast(med)).select(
        s.alias("s"),
        F.lag(s).over(Window.orderBy("day")).alias("prev_s"),
    )
    agg = signs.agg(
        F.sum("s").cast("double").alias("n1"),
        F.sum(F.lit(1) - F.col("s")).cast("double").alias("n2"),
        (
            F.lit(1)
            + F.sum(
                F.when(
                    F.col("prev_s").isNotNull()
                    & (F.col("s") != F.col("prev_s")),
                    1,
                ).otherwise(0)
            )
        )
        .cast("double")
        .alias("r"),
    )
    n1, n2, r = F.col("n1"), F.col("n2"), F.col("r")
    mu = 2 * n1 * n2 / (n1 + n2) + 1
    sigma = F.sqrt(
        2
        * n1
        * n2
        * (2 * n1 * n2 - n1 - n2)
        / (F.pow(n1 + n2, 2) * (n1 + n2 - 1))
    )
    return agg.select(
        n1.cast("bigint").alias("n_above"),
        n2.cast("bigint").alias("n_below"),
        r.cast("bigint").alias("runs"),
        F.round((r - mu) / sigma, 4).alias("z_stat"),
    )


@register(
    "q430_haar_energy",
    """
    WITH daily AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
             SUM(o_totalprice) AS rev
      FROM orders GROUP BY 1
    ),
    seq AS (
      SELECT rev, ROW_NUMBER() OVER (ORDER BY day) AS rn FROM daily
      QUALIFY rn <= 2048
    ),
    blocks AS (
      SELECT j.j, (s.rn - 1) // POWER(2, j.j - 1)::BIGINT AS g,
             AVG(s.rev) AS mv
      FROM seq s CROSS JOIN (VALUES (1), (2), (3), (4)) AS j(j)
      GROUP BY 1, 2
    ),
    details AS (
      SELECT j, g // 2 AS parent,
             (SUM(CASE WHEN g % 2 = 0 THEN mv ELSE 0 END)
              - SUM(CASE WHEN g % 2 = 1 THEN mv ELSE 0 END)) / 2 AS d
      FROM blocks GROUP BY j, g // 2
      HAVING COUNT(*) = 2
    ),
    energy AS (
      SELECT j, COUNT(*) AS n_coeffs, SUM(d * d) AS e
      FROM details GROUP BY j
    )
    SELECT CAST(j AS BIGINT) AS level,
           CAST(n_coeffs AS BIGINT) AS n_coeffs,
           ROUND(e, 4) AS energy,
           ROUND(e / SUM(e) OVER (), 6) AS energy_share
    FROM energy
    """,
)
def q430_haar_energy(spark, sf_dir):
    """Haar wavelet energy decomposition of daily revenue (first 2048
    days, levels 1–4 ≙ 2/4/8/16-day scales): each level's detail
    coefficients are half the difference of adjacent block means, so
    the whole multiresolution cascade reduces to four grouped
    averages over the daily aggregate — no recursion, no UDF.  The
    energy-by-scale profile says WHERE the variance lives (day-to-day
    noise vs weekly vs fortnightly structure), the quantitative
    companion to q412's fixed-period seasonal fit."""
    od = _t(spark, sf_dir, "orders")
    daily = od.groupBy(
        F.to_date(F.date_trunc("DAY", "o_orderdate")).alias("day")
    ).agg(F.sum("o_totalprice").alias("rev"))
    seq = daily.select(
        "rev", F.row_number().over(Window.orderBy("day")).alias("rn")
    ).filter(F.col("rn") <= 2048)
    js = daily.sparkSession.createDataFrame(
        [(1,), (2,), (3,), (4,)], "j int"
    )
    blocks = (
        seq.crossJoin(F.broadcast(js))
        .groupBy(
            "j",
            (
                (F.col("rn") - 1)
                / F.pow(F.lit(2), F.col("j") - 1).cast("bigint")
            )
            .cast("bigint")
            .alias("g"),
        )
        .agg(F.avg("rev").alias("mv"))
    )
    details = (
        blocks.groupBy("j", (F.col("g") / 2).cast("bigint").alias("parent"))
        .agg(
            (
                (
                    F.sum(
                        F.when(F.col("g") % 2 == 0, F.col("mv")).otherwise(
                            0
                        )
                    )
                    - F.sum(
                        F.when(F.col("g") % 2 == 1, F.col("mv")).otherwise(
                            0
                        )
                    )
                )
                / 2
            ).alias("d"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .filter(F.col("cnt") == 2)
    )
    energy = details.groupBy("j").agg(
        F.count(F.lit(1)).alias("n_coeffs"),
        F.sum(F.col("d") * F.col("d")).alias("e"),
    )
    wall = Window.partitionBy()
    return energy.select(
        F.col("j").cast("bigint").alias("level"),
        F.col("n_coeffs").cast("bigint").alias("n_coeffs"),
        F.round("e", 4).alias("energy"),
        F.round(F.col("e") / F.sum("e").over(wall), 6).alias(
            "energy_share"
        ),
    )


@register(
    "q431_cohen_kappa",
    r"""
    WITH feat AS (
      SELECT n_chars,
             len(list_filter(string_split_regex(trim(text), '\s+'),
                             w -> w <> '')) AS wc
      FROM documents
    ),
    med AS (
      SELECT quantile_cont(n_chars, 0.5) AS mc,
             quantile_cont(wc, 0.5) AS mw
      FROM feat
    ),
    rated AS (
      SELECT CASE WHEN f.n_chars > m.mc THEN 1 ELSE 0 END AS a,
             CASE WHEN f.wc > m.mw THEN 1 ELSE 0 END AS b
      FROM feat f CROSS JOIN med m
    ),
    cells AS (
      SELECT COUNT(*)::DOUBLE AS n,
             SUM(CASE WHEN a = 1 AND b = 1 THEN 1 ELSE 0 END)::DOUBLE
               AS n11,
             SUM(CASE WHEN a = 1 AND b = 0 THEN 1 ELSE 0 END)::DOUBLE
               AS n10,
             SUM(CASE WHEN a = 0 AND b = 1 THEN 1 ELSE 0 END)::DOUBLE
               AS n01,
             SUM(CASE WHEN a = 0 AND b = 0 THEN 1 ELSE 0 END)::DOUBLE
               AS n00
      FROM rated
    )
    SELECT CAST(n11 AS BIGINT) AS both_pass,
           CAST(n10 AS BIGINT) AS only_chars,
           CAST(n01 AS BIGINT) AS only_words,
           CAST(n00 AS BIGINT) AS both_fail,
           ROUND((n11 + n00) / n, 6) AS p_observed,
           ROUND(((n11 + n10) * (n11 + n01)
                + (n01 + n00) * (n10 + n00)) / (n * n), 6) AS p_chance,
           ROUND(((n11 + n00) / n
                 - ((n11 + n10) * (n11 + n01)
                  + (n01 + n00) * (n10 + n00)) / (n * n))
                 / (1 - ((n11 + n10) * (n11 + n01)
                       + (n01 + n00) * (n10 + n00)) / (n * n)), 6)
             AS kappa
    FROM cells
    """,
)
def q431_cohen_kappa(spark, sf_dir):
    """Cohen's kappa between two cheap document-quality raters — an
    above-median character-length gate and an above-median word-count
    gate: observed agreement, chance agreement from the marginals,
    and κ = (pₒ−pₑ)/(1−pₑ).  Raw agreement overstates consistency
    when both raters pass most documents; kappa is the number to
    report when two heuristic filters are claimed to 'agree'.  One
    scan builds both features, the medians broadcast, the test is a
    4-cell fold."""
    d = _t(spark, sf_dir, "documents")
    wc = F.size(
        F.filter(F.split(F.trim(F.col("text")), r"\s+"), lambda w: w != "")
    )
    feat = d.select("n_chars", wc.alias("wc"))
    med = feat.agg(
        F.expr("percentile(n_chars, 0.5)").alias("mc"),
        F.expr("percentile(wc, 0.5)").alias("mw"),
    )
    rated = feat.crossJoin(F.broadcast(med)).select(
        F.when(F.col("n_chars") > F.col("mc"), 1).otherwise(0).alias("a"),
        F.when(F.col("wc") > F.col("mw"), 1).otherwise(0).alias("b"),
    )
    cells = rated.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(F.when((F.col("a") == 1) & (F.col("b") == 1), 1).otherwise(0))
        .cast("double")
        .alias("n11"),
        F.sum(F.when((F.col("a") == 1) & (F.col("b") == 0), 1).otherwise(0))
        .cast("double")
        .alias("n10"),
        F.sum(F.when((F.col("a") == 0) & (F.col("b") == 1), 1).otherwise(0))
        .cast("double")
        .alias("n01"),
        F.sum(F.when((F.col("a") == 0) & (F.col("b") == 0), 1).otherwise(0))
        .cast("double")
        .alias("n00"),
    )
    n = F.col("n")
    po = (F.col("n11") + F.col("n00")) / n
    pe = (
        (F.col("n11") + F.col("n10")) * (F.col("n11") + F.col("n01"))
        + (F.col("n01") + F.col("n00")) * (F.col("n10") + F.col("n00"))
    ) / (n * n)
    return cells.select(
        F.col("n11").cast("bigint").alias("both_pass"),
        F.col("n10").cast("bigint").alias("only_chars"),
        F.col("n01").cast("bigint").alias("only_words"),
        F.col("n00").cast("bigint").alias("both_fail"),
        F.round(po, 6).alias("p_observed"),
        F.round(pe, 6).alias("p_chance"),
        F.round((po - pe) / (F.lit(1) - pe), 6).alias("kappa"),
    )


@register(
    "q432_dickey_fuller",
    """
    WITH daily AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
             SUM(o_totalprice) AS rev
      FROM orders GROUP BY 1
    ),
    lagged AS (
      SELECT rev - LAG(rev) OVER (ORDER BY day) AS dx,
             LAG(rev) OVER (ORDER BY day) AS xl
      FROM daily
    ),
    s AS (
      SELECT COUNT(*)::DOUBLE AS n,
             AVG(xl) AS mx, AVG(dx) AS my,
             SUM(xl * dx) AS sxy, SUM(xl * xl) AS sxx,
             SUM(dx * dx) AS syy
      FROM lagged WHERE xl IS NOT NULL
    ),
    fit AS (
      SELECT n,
             (sxy - n * mx * my) / (sxx - n * mx * mx) AS beta,
             (syy - n * my * my)
             - POWER(sxy - n * mx * my, 2) / (sxx - n * mx * mx) AS sse,
             sxx - n * mx * mx AS ssx
      FROM s
    )
    SELECT CAST(n AS BIGINT) AS n_obs,
           ROUND(beta, 8) AS beta,
           ROUND(beta / SQRT((sse / (n - 2)) / ssx), 4) AS df_t,
           CASE WHEN beta > -1 AND beta < 0
                THEN ROUND(-LN(2) / LN(1 + beta), 4) END
             AS half_life_days
    FROM fit
    """,
)
def q432_dickey_fuller(spark, sf_dir):
    """Dickey-Fuller unit-root test on daily revenue: regress Δxₜ on
    xₜ₋₁ (with intercept) and report β, its t statistic, and the
    implied AR(1) mean-reversion half-life −ln2/ln(1+β) — strongly
    negative t rejects the random-walk null, meaning revenue shocks
    decay and a mean-reverting forecaster is justified (the
    stationarity gate in front of q302's backtests).  The half-life
    is only defined for −1<β<0 (white-noise-like series fit β≈−1 and
    report NULL — this fixture does).  One ordered lag window over
    the daily aggregate, then closed-form OLS from five sufficient
    statistics."""
    od = _t(spark, sf_dir, "orders")
    daily = od.groupBy(
        F.to_date(F.date_trunc("DAY", "o_orderdate")).alias("day")
    ).agg(F.sum("o_totalprice").alias("rev"))
    w = Window.orderBy("day")
    lagged = daily.select(
        (F.col("rev") - F.lag("rev").over(w)).alias("dx"),
        F.lag("rev").over(w).alias("xl"),
    ).filter(F.col("xl").isNotNull())
    s = lagged.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.avg("xl").alias("mx"),
        F.avg("dx").alias("my"),
        F.sum(F.col("xl") * F.col("dx")).alias("sxy"),
        F.sum(F.col("xl") * F.col("xl")).alias("sxx"),
        F.sum(F.col("dx") * F.col("dx")).alias("syy"),
    )
    n, mx, my = F.col("n"), F.col("mx"), F.col("my")
    cxy = F.col("sxy") - n * mx * my
    cxx = F.col("sxx") - n * mx * mx
    cyy = F.col("syy") - n * my * my
    fit = s.select(
        "n",
        (cxy / cxx).alias("beta"),
        (cyy - F.pow(cxy, 2) / cxx).alias("sse"),
        cxx.alias("ssx"),
    )
    return fit.select(
        F.col("n").cast("bigint").alias("n_obs"),
        F.round("beta", 8).alias("beta"),
        F.round(
            F.col("beta")
            / F.sqrt(
                (F.col("sse") / (F.col("n") - 2)) / F.col("ssx")
            ),
            4,
        ).alias("df_t"),
        F.when(
            (F.col("beta") > -1) & (F.col("beta") < 0),
            F.round(
                -F.log(F.lit(2.0)) / F.log(F.lit(1.0) + F.col("beta")),
                4,
            ),
        ).alias("half_life_days"),
    )


@register(
    "q433_newsvendor",
    """
    WITH demand AS (
      SELECT p.p_brand AS brand,
             CAST(date_trunc('day', l.l_shipdate) AS DATE) AS day,
             SUM(l.l_quantity) AS d
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY 1, 2
    ),
    q AS (
      SELECT brand, quantile_cont(d, 0.8) AS stock
      FROM demand GROUP BY brand
    )
    SELECT d.brand,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           ROUND(q.stock, 4) AS stock_q80,
           ROUND(AVG(d.d), 4) AS mean_demand,
           ROUND(AVG(GREATEST(d.d - q.stock, 0)), 4) AS exp_shortfall,
           ROUND(AVG(GREATEST(q.stock - d.d, 0)), 4) AS exp_overstock,
           ROUND(1 - AVG(GREATEST(d.d - q.stock, 0)) / AVG(d.d), 6)
             AS fill_rate
    FROM demand d JOIN q ON d.brand = q.brand
    GROUP BY d.brand, q.stock
    """,
)
def q433_newsvendor(spark, sf_dir):
    """Newsvendor stocking policy per brand: stock at the critical
    quantile (0.8 ≙ underage:overage cost ratio 4:1) of observed
    daily shipped demand, then the policy's expected shortfall,
    expected overstock, and fill rate evaluated against the same
    empirical distribution.  (Demand days are days WITH shipments —
    the empirical conditional distribution; zero-fill would need a
    calendar spine like q103's.)  Two grouped passes over the
    (brand, day) demand aggregate and a 25-row broadcast join —
    the inventory-policy counterpart of q304's VaR tail math."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    demand = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.to_date(F.date_trunc("DAY", "l_shipdate")).alias("day"),
        )
        .agg(F.sum("l_quantity").alias("d"))
    )
    q = demand.groupBy("brand").agg(
        F.expr("percentile(d, 0.8)").alias("stock")
    )
    short = F.greatest(F.col("d") - F.col("stock"), F.lit(0.0))
    over = F.greatest(F.col("stock") - F.col("d"), F.lit(0.0))
    return (
        demand.join(F.broadcast(q), "brand")
        .groupBy("brand", "stock")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_days"),
            F.round(F.avg("d"), 4).alias("mean_demand"),
            F.round(F.avg(short), 4).alias("exp_shortfall"),
            F.round(F.avg(over), 4).alias("exp_overstock"),
            F.round(
                F.lit(1) - F.avg(short) / F.avg("d"), 6
            ).alias("fill_rate"),
        )
        .select(
            "brand",
            "n_days",
            F.round("stock", 4).alias("stock_q80"),
            "mean_demand",
            "exp_shortfall",
            "exp_overstock",
            "fill_rate",
        )
    )


@register(
    "q434_revenue_beta",
    """
    WITH brand_day AS (
      SELECT p.p_brand AS brand,
             CAST(date_trunc('day', l.l_shipdate) AS DATE) AS day,
             SUM(l.l_extendedprice * (1 - l.l_discount)) AS r
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY 1, 2
    ),
    days AS (SELECT DISTINCT day FROM brand_day),
    brands AS (SELECT DISTINCT brand FROM brand_day),
    filled AS (
      SELECT b.brand, d.day, COALESCE(bd.r, 0) AS r
      FROM days d CROSS JOIN brands b
      LEFT JOIN brand_day bd ON bd.brand = b.brand AND bd.day = d.day
    ),
    tot AS (
      SELECT day, SUM(r) AS rt FROM filled GROUP BY day
    ),
    s AS (
      SELECT f.brand, COUNT(*)::DOUBLE AS n,
             AVG(f.r) AS mb, AVG(t.rt) AS mt,
             SUM(f.r * t.rt) AS sbt,
             SUM(t.rt * t.rt) AS stt,
             SUM(f.r * f.r) AS sbb
      FROM filled f JOIN tot t ON f.day = t.day
      GROUP BY f.brand
    )
    SELECT brand,
           ROUND((sbt - n * mb * mt) / (stt - n * mt * mt), 6) AS beta,
           ROUND((sbt - n * mb * mt)
                 / SQRT((sbb - n * mb * mb) * (stt - n * mt * mt)), 6)
             AS corr,
           ROUND(1 - POWER((sbt - n * mb * mt), 2)
                     / ((sbb - n * mb * mb) * (stt - n * mt * mt)), 6)
             AS idio_share
    FROM s
    """,
)
def q434_revenue_beta(spark, sf_dir):
    """Per-brand revenue beta against total daily revenue — the CAPM
    decomposition applied to a portfolio of brands: β says how hard
    the brand swings with aggregate demand, R² (1−idio_share) how
    much of its variance aggregate demand explains.  Brand-days with
    no sales are zero-filled on the day×brand spine (without it, β is
    biased toward sold-days only); all covariances come from
    sufficient statistics on the 60k-row filled panel, and the day
    spine is built once and reused for the market total."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    bd = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.to_date(F.date_trunc("DAY", "l_shipdate")).alias("day"),
        )
        .agg(
            F.sum(
                F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
            ).alias("r")
        )
    )
    days = bd.select("day").distinct()
    brands = bd.select("brand").distinct()
    filled = (
        days.crossJoin(F.broadcast(brands))
        .join(bd, ["brand", "day"], "left")
        .select("brand", "day", F.coalesce("r", F.lit(0.0)).alias("r"))
    )
    tot = filled.groupBy("day").agg(F.sum("r").alias("rt"))
    s = (
        filled.join(tot, "day")
        .groupBy("brand")
        .agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            F.avg("r").alias("mb"),
            F.avg("rt").alias("mt"),
            F.sum(F.col("r") * F.col("rt")).alias("sbt"),
            F.sum(F.col("rt") * F.col("rt")).alias("stt"),
            F.sum(F.col("r") * F.col("r")).alias("sbb"),
        )
    )
    n, mb, mt = F.col("n"), F.col("mb"), F.col("mt")
    cbt = F.col("sbt") - n * mb * mt
    ctt = F.col("stt") - n * mt * mt
    cbb = F.col("sbb") - n * mb * mb
    return s.select(
        "brand",
        F.round(cbt / ctt, 6).alias("beta"),
        F.round(cbt / F.sqrt(cbb * ctt), 6).alias("corr"),
        F.round(F.lit(1) - F.pow(cbt, 2) / (cbb * ctt), 6).alias(
            "idio_share"
        ),
    )


@register(
    "q435_tail_dependence",
    """
    WITH per_order AS (
      SELECT l_orderkey, COUNT(*)::DOUBLE AS n_items,
             SUM(l_extendedprice * (1 - l_discount)) AS price
      FROM lineitem GROUP BY l_orderkey
    ),
    thr AS (
      SELECT quantile_cont(n_items, 0.9) AS qx,
             quantile_cont(price, 0.9) AS qy
      FROM per_order
    ),
    flags AS (
      SELECT CASE WHEN o.n_items > t.qx THEN 1 ELSE 0 END AS fx,
             CASE WHEN o.price > t.qy THEN 1 ELSE 0 END AS fy
      FROM per_order o CROSS JOIN thr t
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(AVG(fx), 6) AS p_big_basket,
           ROUND(AVG(fy), 6) AS p_big_price,
           ROUND(AVG(fx * fy), 6) AS p_joint,
           ROUND(AVG(fx * fy) / AVG(fy), 6) AS lambda_upper,
           ROUND(AVG(fx * fy) / (AVG(fx) * AVG(fy)), 4) AS lift
    FROM flags
    """,
)
def q435_tail_dependence(spark, sf_dir):
    """Upper-tail dependence between basket size and order value: the
    probability an order is simultaneously in both top deciles,
    conditioned (λ_U = P(X>q₉₀ˣ | Y>q₉₀ʸ)) and as a lift over
    independence.  Pearson/Spearman (q252/q293) measure average
    co-movement; tail dependence asks whether the EXTREMES coincide —
    the number that decides if 'big basket' and 'big spend' segments
    are one segment or two.  One per-order rollup, two broadcast
    thresholds, a flag fold."""
    li = _t(spark, sf_dir, "lineitem")
    po = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).cast("double").alias("n_items"),
        F.sum(
            F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
        ).alias("price"),
    )
    thr = po.agg(
        F.expr("percentile(n_items, 0.9)").alias("qx"),
        F.expr("percentile(price, 0.9)").alias("qy"),
    )
    flags = po.crossJoin(F.broadcast(thr)).select(
        F.when(F.col("n_items") > F.col("qx"), 1).otherwise(0).alias("fx"),
        F.when(F.col("price") > F.col("qy"), 1).otherwise(0).alias("fy"),
    )
    return flags.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.round(F.avg("fx"), 6).alias("p_big_basket"),
        F.round(F.avg("fy"), 6).alias("p_big_price"),
        F.round(F.avg(F.col("fx") * F.col("fy")), 6).alias("p_joint"),
        F.round(
            F.avg(F.col("fx") * F.col("fy")) / F.avg("fy"), 6
        ).alias("lambda_upper"),
        F.round(
            F.avg(F.col("fx") * F.col("fy"))
            / (F.avg("fx") * F.avg("fy")),
            4,
        ).alias("lift"),
    )


@register(
    "q436_grubbs_outlier",
    """
    WITH daily AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
             SUM(o_totalprice) AS rev
      FROM orders GROUP BY 1
    ),
    stats AS (
      SELECT day, rev,
             ABS(rev - AVG(rev) OVER ()) / STDDEV_SAMP(rev) OVER () AS g,
             COUNT(*) OVER () AS n
      FROM daily
    )
    SELECT day AS outlier_day,
           ROUND(rev, 2) AS rev,
           ROUND(g, 4) AS grubbs_g,
           CAST(n AS BIGINT) AS n_days,
           CAST(SUM(CASE WHEN g > 3 THEN 1 ELSE 0 END) OVER ()
                AS BIGINT) AS n_beyond_3sd
    FROM stats
    ORDER BY g DESC, day
    LIMIT 1
    """,
)
def q436_grubbs_outlier(spark, sf_dir):
    """Grubbs' maximum-deviation statistic on daily revenue: the
    single most extreme day's |x−μ|/s, plus how many days sit beyond
    3σ — the 'is my worst point an outlier or just the tail' test
    that complements the fence-based q115/q145 (which flag SETS of
    points, not the extremum).  Two global windows over the daily
    aggregate and a top-1; ties break to the earliest day."""
    od = _t(spark, sf_dir, "orders")
    daily = od.groupBy(
        F.to_date(F.date_trunc("DAY", "o_orderdate")).alias("day")
    ).agg(F.sum("o_totalprice").alias("rev"))
    wall = Window.partitionBy()
    stats = daily.select(
        "day",
        "rev",
        (
            F.abs(F.col("rev") - F.avg("rev").over(wall))
            / F.stddev_samp("rev").over(wall)
        ).alias("g"),
        F.count(F.lit(1)).over(wall).alias("n"),
    )
    return (
        stats.select(
            F.col("day").alias("outlier_day"),
            F.round("rev", 2).alias("rev"),
            F.round("g", 4).alias("grubbs_g"),
            F.col("n").cast("bigint").alias("n_days"),
            F.sum(F.when(F.col("g") > 3, 1).otherwise(0))
            .over(wall)
            .cast("bigint")
            .alias("n_beyond_3sd"),
            F.col("g").alias("_g"),
        )
        .orderBy(F.col("_g").desc(), "outlier_day")
        .limit(1)
        .drop("_g")
    )


@register(
    "q437_pacf",
    """
    WITH daily AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
             SUM(o_totalprice) AS rev
      FROM orders GROUP BY 1
    ),
    lagged AS (
      SELECT rev - AVG(rev) OVER () AS d,
             LAG(rev, 1) OVER (ORDER BY day) - AVG(rev) OVER () AS d1,
             LAG(rev, 2) OVER (ORDER BY day) - AVG(rev) OVER () AS d2,
             LAG(rev, 3) OVER (ORDER BY day) - AVG(rev) OVER () AS d3
      FROM daily
    ),
    acf AS (
      SELECT SUM(CASE WHEN d1 IS NOT NULL THEN d * d1 ELSE 0 END)
               / SUM(d * d) AS r1,
             SUM(CASE WHEN d2 IS NOT NULL THEN d * d2 ELSE 0 END)
               / SUM(d * d) AS r2,
             SUM(CASE WHEN d3 IS NOT NULL THEN d * d3 ELSE 0 END)
               / SUM(d * d) AS r3
      FROM lagged
    ),
    dl AS (
      SELECT r1, r2, r3,
             (r2 - r1 * r1) / (1 - r1 * r1) AS p22
      FROM acf
    ),
    dl2 AS (
      SELECT r1, r2, r3, p22,
             r1 * (1 - p22) AS p21
      FROM dl
    )
    SELECT ROUND(r1, 6) AS acf1,
           ROUND(r2, 6) AS acf2,
           ROUND(r3, 6) AS acf3,
           ROUND(r1, 6) AS pacf1,
           ROUND(p22, 6) AS pacf2,
           ROUND((r3 - p21 * r2 - p22 * r1)
                 / (1 - p21 * r1 - p22 * r2), 6) AS pacf3
    FROM dl2
    """,
)
def q437_pacf(spark, sf_dir):
    """Partial autocorrelation of daily revenue at lags 1–3 by the
    Durbin-Levinson recursion in closed form: PACF(2) =
    (ρ₂−ρ₁²)/(1−ρ₁²), PACF(3) from the level-2 coefficients —
    the AR-order selector that q298's raw ACF can't provide (ACF
    tails off for any AR process; PACF CUTS off at the true order).
    The biased ACF estimates come from three lag windows over the
    daily aggregate sharing one global mean; everything after is
    scalar algebra on a single row."""
    od = _t(spark, sf_dir, "orders")
    daily = od.groupBy(
        F.to_date(F.date_trunc("DAY", "o_orderdate")).alias("day")
    ).agg(F.sum("o_totalprice").alias("rev"))
    wall = Window.partitionBy()
    w = Window.orderBy("day")
    mean = F.avg("rev").over(wall)
    lagged = daily.select(
        (F.col("rev") - mean).alias("d"),
        (F.lag("rev", 1).over(w) - mean).alias("d1"),
        (F.lag("rev", 2).over(w) - mean).alias("d2"),
        (F.lag("rev", 3).over(w) - mean).alias("d3"),
    )
    def _num(c):
        return F.sum(
            F.when(F.col(c).isNotNull(), F.col("d") * F.col(c)).otherwise(
                0.0
            )
        )

    acf = lagged.agg(
        (_num("d1") / F.sum(F.col("d") * F.col("d"))).alias("r1"),
        (_num("d2") / F.sum(F.col("d") * F.col("d"))).alias("r2"),
        (_num("d3") / F.sum(F.col("d") * F.col("d"))).alias("r3"),
    )
    r1, r2, r3 = F.col("r1"), F.col("r2"), F.col("r3")
    dl = acf.withColumn("p22", (r2 - r1 * r1) / (1 - r1 * r1))
    dl2 = dl.withColumn("p21", r1 * (1 - F.col("p22")))
    p21, p22 = F.col("p21"), F.col("p22")
    return dl2.select(
        F.round(r1, 6).alias("acf1"),
        F.round(r2, 6).alias("acf2"),
        F.round(r3, 6).alias("acf3"),
        F.round(r1, 6).alias("pacf1"),
        F.round(p22, 6).alias("pacf2"),
        F.round(
            (r3 - p21 * r2 - p22 * r1) / (1 - p21 * r1 - p22 * r2), 6
        ).alias("pacf3"),
    )


@register(
    "q438_diff_in_diff",
    """
    WITH med AS (
      SELECT quantile_cont(epoch_us(l_shipdate), 0.5) AS ms
      FROM lineitem
    ),
    cells AS (
      SELECT CASE WHEN l.l_discount >= 0.05 THEN 1 ELSE 0 END AS treated,
             CASE WHEN epoch_us(l.l_shipdate) >= m.ms THEN 1 ELSE 0 END
               AS post,
             COUNT(*)::DOUBLE AS n,
             AVG(CASE WHEN l.l_returnflag = 'R' THEN 1.0 ELSE 0 END)
               AS rate
      FROM lineitem l CROSS JOIN med m
      GROUP BY 1, 2
    ),
    wide AS (
      SELECT
        MAX(CASE WHEN treated = 1 AND post = 1 THEN rate END) AS tp,
        MAX(CASE WHEN treated = 1 AND post = 0 THEN rate END) AS tq,
        MAX(CASE WHEN treated = 0 AND post = 1 THEN rate END) AS cp,
        MAX(CASE WHEN treated = 0 AND post = 0 THEN rate END) AS cq,
        MAX(CASE WHEN treated = 1 AND post = 1 THEN rate * (1 - rate) / n END)
        + MAX(CASE WHEN treated = 1 AND post = 0 THEN rate * (1 - rate) / n END)
        + MAX(CASE WHEN treated = 0 AND post = 1 THEN rate * (1 - rate) / n END)
        + MAX(CASE WHEN treated = 0 AND post = 0 THEN rate * (1 - rate) / n END)
          AS var_did
      FROM cells
    )
    SELECT ROUND(tq, 6) AS treated_pre,
           ROUND(tp, 6) AS treated_post,
           ROUND(cq, 6) AS control_pre,
           ROUND(cp, 6) AS control_post,
           ROUND((tp - tq) - (cp - cq), 6) AS did,
           ROUND(SQRT(var_did), 6) AS se,
           ROUND(((tp - tq) - (cp - cq)) / SQRT(var_did), 4) AS z_stat
    FROM wide
    """,
)
def q438_diff_in_diff(spark, sf_dir):
    """Difference-in-differences on return rates: treated = discounted
    line items (≥5%), periods split at the median ship date; DID =
    (T,post − T,pre) − (C,post − C,pre) nets out both the level
    difference between groups and the common time trend — the
    estimator behind every 'did the policy change returns' question,
    where q342's raw uplift would confound trend with treatment.  The
    SE pools the four binomial cell variances.  One grouped scan into
    a 4-cell table; the rest is scalar algebra."""
    li = _t(spark, sf_dir, "lineitem")
    # l_shipdate arrives as TIMESTAMP_NTZ; unix_micros needs TIMESTAMP
    # (session TZ is UTC, so the cast is value-preserving vs DuckDB).
    us = F.unix_micros(F.col("l_shipdate").cast("timestamp"))
    med = li.agg(
        F.expr(
            "percentile(unix_micros(CAST(l_shipdate AS TIMESTAMP)), 0.5)"
        ).alias("ms")
    )
    cells = (
        li.crossJoin(F.broadcast(med))
        .groupBy(
            F.when(F.col("l_discount") >= 0.05, 1).otherwise(0).alias(
                "treated"
            ),
            F.when(us >= F.col("ms"), 1).otherwise(0).alias("post"),
        )
        .agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            F.avg(
                F.when(F.col("l_returnflag") == "R", 1.0).otherwise(0.0)
            ).alias("rate"),
        )
    )

    def cell(t, p, expr):
        return F.max(
            F.when((F.col("treated") == t) & (F.col("post") == p), expr)
        )

    v = F.col("rate") * (1 - F.col("rate")) / F.col("n")
    wide = cells.agg(
        cell(1, 1, F.col("rate")).alias("tp"),
        cell(1, 0, F.col("rate")).alias("tq"),
        cell(0, 1, F.col("rate")).alias("cp"),
        cell(0, 0, F.col("rate")).alias("cq"),
        (
            cell(1, 1, v) + cell(1, 0, v) + cell(0, 1, v) + cell(0, 0, v)
        ).alias("var_did"),
    )
    did = (F.col("tp") - F.col("tq")) - (F.col("cp") - F.col("cq"))
    return wide.select(
        F.round("tq", 6).alias("treated_pre"),
        F.round("tp", 6).alias("treated_post"),
        F.round("cq", 6).alias("control_pre"),
        F.round("cp", 6).alias("control_post"),
        F.round(did, 6).alias("did"),
        F.round(F.sqrt(F.col("var_did")), 6).alias("se"),
        F.round(did / F.sqrt(F.col("var_did")), 4).alias("z_stat"),
    )


@register(
    "q439_control_chart_rules",
    """
    WITH daily AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
             SUM(o_totalprice) AS rev
      FROM orders GROUP BY 1
    ),
    z AS (
      SELECT day,
             (rev - AVG(rev) OVER ()) / STDDEV_SAMP(rev) OVER () AS zv
      FROM daily
    ),
    flags AS (
      SELECT day, zv,
             CASE WHEN zv > 2 THEN 1 ELSE 0 END AS hi2,
             CASE WHEN zv < -2 THEN 1 ELSE 0 END AS lo2,
             CASE WHEN zv > 0 THEN 1 ELSE 0 END AS above
      FROM z
    ),
    runs AS (
      SELECT day, zv,
             SUM(hi2) OVER (ORDER BY day
                            ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
               AS hi2_3,
             SUM(lo2) OVER (ORDER BY day
                            ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
               AS lo2_3,
             SUM(above) OVER (ORDER BY day
                              ROWS BETWEEN 7 PRECEDING AND CURRENT ROW)
               AS above_8,
             ROW_NUMBER() OVER (ORDER BY day) AS rn
      FROM flags
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(SUM(CASE WHEN ABS(zv) > 3 THEN 1 ELSE 0 END) AS BIGINT)
             AS rule1_beyond_3sd,
           CAST(SUM(CASE WHEN rn >= 3
                          AND (hi2_3 >= 2 OR lo2_3 >= 2)
                         THEN 1 ELSE 0 END) AS BIGINT)
             AS rule2_2of3_beyond_2sd,
           CAST(SUM(CASE WHEN rn >= 8
                          AND (above_8 = 8 OR above_8 = 0)
                         THEN 1 ELSE 0 END) AS BIGINT)
             AS rule4_run_of_8
    FROM runs
    """,
)
def q439_control_chart_rules(spark, sf_dir):
    """Western Electric control-chart rules on daily revenue: Rule 1
    (a point beyond 3σ), Rule 2 (2 of 3 consecutive beyond 2σ on the
    same side), Rule 4 (8 consecutive on one side of the mean) — the
    SPC patterns that catch shifts q193's plain rolling z-score
    misses, because small sustained drifts never cross 3σ but
    reliably trip the run rules.  Counts are of completion days, so
    a sustained shift scores every day it persists.  Three framed
    windows over the daily aggregate, one fold."""
    od = _t(spark, sf_dir, "orders")
    daily = od.groupBy(
        F.to_date(F.date_trunc("DAY", "o_orderdate")).alias("day")
    ).agg(F.sum("o_totalprice").alias("rev"))
    wall = Window.partitionBy()
    z = daily.select(
        "day",
        (
            (F.col("rev") - F.avg("rev").over(wall))
            / F.stddev_samp("rev").over(wall)
        ).alias("zv"),
    )
    flags = z.select(
        "day",
        "zv",
        F.when(F.col("zv") > 2, 1).otherwise(0).alias("hi2"),
        F.when(F.col("zv") < -2, 1).otherwise(0).alias("lo2"),
        F.when(F.col("zv") > 0, 1).otherwise(0).alias("above"),
    )
    w3 = Window.orderBy("day").rowsBetween(-2, 0)
    w8 = Window.orderBy("day").rowsBetween(-7, 0)
    runs = flags.select(
        "zv",
        F.sum("hi2").over(w3).alias("hi2_3"),
        F.sum("lo2").over(w3).alias("lo2_3"),
        F.sum("above").over(w8).alias("above_8"),
        F.row_number().over(Window.orderBy("day")).alias("rn"),
    )
    return runs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum(F.when(F.abs(F.col("zv")) > 3, 1).otherwise(0))
        .cast("bigint")
        .alias("rule1_beyond_3sd"),
        F.sum(
            F.when(
                (F.col("rn") >= 3)
                & ((F.col("hi2_3") >= 2) | (F.col("lo2_3") >= 2)),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("rule2_2of3_beyond_2sd"),
        F.sum(
            F.when(
                (F.col("rn") >= 8)
                & ((F.col("above_8") == 8) | (F.col("above_8") == 0)),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("rule4_run_of_8"),
    )


@register(
    "q440_cox_stuart",
    """
    WITH daily AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
             SUM(o_totalprice) AS rev
      FROM orders GROUP BY 1
    ),
    seq AS (
      SELECT rev, ROW_NUMBER() OVER (ORDER BY day) AS rn,
             COUNT(*) OVER () AS n
      FROM daily
    ),
    pairs AS (
      SELECT a.rev AS xa, b.rev AS xb
      FROM seq a JOIN seq b
        ON b.rn = a.rn + (a.n + 1) // 2
    ),
    s AS (
      SELECT SUM(CASE WHEN xb > xa THEN 1 ELSE 0 END)::DOUBLE AS sp,
             SUM(CASE WHEN xb < xa THEN 1 ELSE 0 END)::DOUBLE AS sm
      FROM pairs
    )
    SELECT CAST(sp + sm AS BIGINT) AS n_pairs,
           CAST(sp AS BIGINT) AS s_plus,
           CAST(sm AS BIGINT) AS s_minus,
           ROUND((sp - (sp + sm) / 2) / SQRT((sp + sm) / 4), 4)
             AS z_stat
    FROM s
    """,
)
def q440_cox_stuart(spark, sf_dir):
    """Cox-Stuart trend test on daily revenue: pair each day in the
    first half with its counterpart one half-length later and sign-test
    the differences — a monotone-trend detector that needs no
    distributional assumptions and ignores magnitudes entirely,
    complementing q275's robust Theil-Sen SLOPE with a significance
    verdict.  The pairing is one self-join on row number at a fixed
    offset (an equi-join, so it co-partitions); the test is a two-cell
    fold."""
    od = _t(spark, sf_dir, "orders")
    daily = od.groupBy(
        F.to_date(F.date_trunc("DAY", "o_orderdate")).alias("day")
    ).agg(F.sum("o_totalprice").alias("rev"))
    seq = daily.select(
        "rev",
        F.row_number().over(Window.orderBy("day")).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    a = seq.alias("a")
    b = seq.alias("b")
    pairs = a.join(
        b,
        F.col("b.rn")
        == F.col("a.rn") + ((F.col("a.n") + 1) / 2).cast("bigint"),
    ).select(F.col("a.rev").alias("xa"), F.col("b.rev").alias("xb"))
    s = pairs.agg(
        F.sum(F.when(F.col("xb") > F.col("xa"), 1).otherwise(0))
        .cast("double")
        .alias("sp"),
        F.sum(F.when(F.col("xb") < F.col("xa"), 1).otherwise(0))
        .cast("double")
        .alias("sm"),
    )
    sp, sm = F.col("sp"), F.col("sm")
    return s.select(
        (sp + sm).cast("bigint").alias("n_pairs"),
        sp.cast("bigint").alias("s_plus"),
        sm.cast("bigint").alias("s_minus"),
        F.round(
            (sp - (sp + sm) / 2) / F.sqrt((sp + sm) / 4), 4
        ).alias("z_stat"),
    )


@register(
    "q441_friedman_test",
    """
    WITH cell AS (
      SELECT CAST(date_trunc('month', l.l_shipdate) AS DATE) AS mth,
             p.p_brand AS brand,
             SUM(l.l_extendedprice * (1 - l.l_discount)) AS r
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY 1, 2
    ),
    k AS (SELECT COUNT(DISTINCT brand)::DOUBLE AS k FROM cell),
    full_months AS (
      SELECT mth FROM cell GROUP BY mth
      HAVING COUNT(*) = (SELECT k FROM k)
    ),
    ranked AS (
      SELECT c.brand,
             ROW_NUMBER() OVER (PARTITION BY c.mth
                                ORDER BY c.r, c.brand) AS rk
      FROM cell c JOIN full_months f ON c.mth = f.mth
    ),
    sums AS (
      SELECT brand, SUM(rk)::DOUBLE AS rj, COUNT(*)::DOUBLE AS n
      FROM ranked GROUP BY brand
    ),
    agg AS (
      SELECT SUM(rj * rj) AS srj2, MAX(n) AS n,
             COUNT(*)::DOUBLE AS k
      FROM sums
    )
    SELECT CAST(n AS BIGINT) AS n_blocks,
           CAST(k AS BIGINT) AS k_brands,
           ROUND(12 / (n * k * (k + 1)) * srj2 - 3 * n * (k + 1), 4)
             AS chi2_f,
           ROUND((12 / (n * k * (k + 1)) * srj2 - 3 * n * (k + 1))
                 / (n * (k - 1)), 6) AS kendalls_w
    FROM agg
    """,
)
def q441_friedman_test(spark, sf_dir):
    """Friedman rank test across brands with months as blocks: rank
    the 25 brands WITHIN each month by revenue, and test whether the
    mean ranks differ — the repeated-measures cousin of q279's ANOVA
    that is immune to month-level scale shifts (a hot month inflates
    every brand; within-month ranks don't move).  Kendall's W =
    χ²/(n(k−1)) grades the agreement 0..1.  Only months with all k
    brands enter (complete blocks); ranking is one partitioned window
    over the month×brand aggregate."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    cell = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy(
            F.to_date(F.date_trunc("MONTH", "l_shipdate")).alias("mth"),
            F.col("p_brand").alias("brand"),
        )
        .agg(
            F.sum(
                F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
            ).alias("r")
        )
    )
    kdf = cell.agg(
        F.countDistinct("brand").cast("double").alias("k")
    )
    full_months = (
        cell.groupBy("mth")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .crossJoin(F.broadcast(kdf))
        .filter(F.col("cnt") == F.col("k"))
        .select("mth")
    )
    ranked = cell.join(full_months, "mth").select(
        "brand",
        F.row_number()
        .over(Window.partitionBy("mth").orderBy("r", "brand"))
        .alias("rk"),
    )
    sums = ranked.groupBy("brand").agg(
        F.sum("rk").cast("double").alias("rj"),
        F.count(F.lit(1)).cast("double").alias("n"),
    )
    agg = sums.agg(
        F.sum(F.col("rj") * F.col("rj")).alias("srj2"),
        F.max("n").alias("n"),
        F.count(F.lit(1)).cast("double").alias("k"),
    )
    n, k = F.col("n"), F.col("k")
    chi2 = 12 / (n * k * (k + 1)) * F.col("srj2") - 3 * n * (k + 1)
    return agg.select(
        n.cast("bigint").alias("n_blocks"),
        k.cast("bigint").alias("k_brands"),
        F.round(chi2, 4).alias("chi2_f"),
        F.round(chi2 / (n * (k - 1)), 6).alias("kendalls_w"),
    )


@register(
    "q442_kruskal_wallis",
    """
    WITH per_vs AS (
      SELECT n_chars AS v, source, COUNT(*)::DOUBLE AS c
      FROM documents GROUP BY n_chars, source
    ),
    per_v AS (
      SELECT v, SUM(c) AS ct FROM per_vs GROUP BY v
    ),
    cum AS (
      SELECT v, ct, SUM(ct) OVER (ORDER BY v) - ct AS cumbefore
      FROM per_v
    ),
    groups AS (
      SELECT s.source,
             SUM(s.c) AS nj,
             SUM(s.c * (c2.cumbefore + (c2.ct + 1) / 2)) AS rj
      FROM per_vs s JOIN cum c2 ON s.v = c2.v
      GROUP BY s.source
    ),
    ties AS (
      SELECT SUM(ct * ct * ct - ct) AS tsum, SUM(ct) AS n
      FROM per_v
    ),
    h AS (
      SELECT (12 / (t.n * (t.n + 1)))
             * (SELECT SUM(rj * rj / nj) FROM groups)
             - 3 * (t.n + 1) AS h_raw,
             t.n AS n, t.tsum AS tsum,
             (SELECT COUNT(*) FROM groups) AS k
      FROM ties t
    )
    SELECT CAST(k AS BIGINT) AS k_groups,
           CAST(n AS BIGINT) AS n_docs,
           ROUND(h_raw, 4) AS h_stat,
           ROUND(h_raw / (1 - tsum / (n * n * n - n)), 4)
             AS h_tie_corrected
    FROM h
    """,
)
def q442_kruskal_wallis(spark, sf_dir):
    """Kruskal-Wallis rank ANOVA of document length across ALL 20
    sources — the k-group generalization of q421's Mann-Whitney and
    the rank-based alternative to q279's F test: H = 12/(N(N+1))
    ΣR²ⱼ/nⱼ − 3(N+1), tie-corrected by 1−Σ(t³−t)/(N³−N).  Rank sums
    again come from the distinct-VALUE histogram (cumulative count
    before each length + average tie rank), so no row ever gets an
    individual rank — one grouped scan, one small ordered window."""
    d = _t(spark, sf_dir, "documents")
    per_vs = d.groupBy(F.col("n_chars").alias("v"), "source").agg(
        F.count(F.lit(1)).cast("double").alias("c")
    )
    per_v = per_vs.groupBy("v").agg(F.sum("c").alias("ct"))
    wc = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = per_v.select(
        "v",
        "ct",
        (F.sum("ct").over(wc) - F.col("ct")).alias("cumbefore"),
    )
    groups = (
        per_vs.join(cum, "v")
        .groupBy("source")
        .agg(
            F.sum("c").alias("nj"),
            F.sum(
                F.col("c") * (F.col("cumbefore") + (F.col("ct") + 1) / 2)
            ).alias("rj"),
        )
    )
    gagg = groups.agg(
        F.sum(F.col("rj") * F.col("rj") / F.col("nj")).alias("srn"),
        F.count(F.lit(1)).cast("double").alias("k"),
    )
    ties = per_v.agg(
        F.sum(
            F.col("ct") * F.col("ct") * F.col("ct") - F.col("ct")
        ).alias("tsum"),
        F.sum("ct").alias("n"),
    )
    n = F.col("n")
    h_raw = 12 / (n * (n + 1)) * F.col("srn") - 3 * (n + 1)
    return ties.crossJoin(F.broadcast(gagg)).select(
        F.col("k").cast("bigint").alias("k_groups"),
        n.cast("bigint").alias("n_docs"),
        F.round(h_raw, 4).alias("h_stat"),
        F.round(
            h_raw / (1 - F.col("tsum") / (n * n * n - n)), 4
        ).alias("h_tie_corrected"),
    )


@register(
    "q443_cramers_v",
    """
    WITH cell AS (
      SELECT p.p_brand AS brand, l.l_returnflag AS flag,
             COUNT(*)::DOUBLE AS o
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY 1, 2
    ),
    m AS (
      SELECT brand, flag, o,
             SUM(o) OVER (PARTITION BY brand) AS rowtot,
             SUM(o) OVER (PARTITION BY flag) AS coltot,
             SUM(o) OVER () AS n
      FROM cell
    ),
    chi AS (
      SELECT SUM(POWER(o - rowtot * coltot / n, 2)
                 / (rowtot * coltot / n)) AS chi2,
             MAX(n) AS n,
             COUNT(DISTINCT brand)::DOUBLE AS r,
             COUNT(DISTINCT flag)::DOUBLE AS c
      FROM m
    )
    SELECT ROUND(chi2, 4) AS chi2,
           CAST((r - 1) * (c - 1) AS BIGINT) AS dof,
           ROUND(SQRT(chi2 / (n * (LEAST(r, c) - 1))), 6) AS cramers_v
    FROM chi
    """,
)
def q443_cramers_v(spark, sf_dir):
    """Cramér's V for the brand × return-flag association: the
    effect-size that q139's chi-squared LACKS — chi² grows with N, so
    at 100 TB everything is 'significant'; V = √(χ²/(N·(min(r,c)−1)))
    is scale-free and answers whether the association is MATERIAL.
    The full contingency table is a 75-cell aggregate; margins come
    from windows over it, never a second scan."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    cell = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.col("l_returnflag").alias("flag"),
        )
        .agg(F.count(F.lit(1)).cast("double").alias("o"))
    )
    m = cell.select(
        "brand",
        "flag",
        "o",
        F.sum("o").over(Window.partitionBy("brand")).alias("rowtot"),
        F.sum("o").over(Window.partitionBy("flag")).alias("coltot"),
        F.sum("o").over(Window.partitionBy()).alias("n"),
    )
    e = F.col("rowtot") * F.col("coltot") / F.col("n")
    chi = m.agg(
        F.sum(F.pow(F.col("o") - e, 2) / e).alias("chi2"),
        F.max("n").alias("n"),
        F.countDistinct("brand").cast("double").alias("r"),
        F.countDistinct("flag").cast("double").alias("c"),
    )
    return chi.select(
        F.round("chi2", 4).alias("chi2"),
        ((F.col("r") - 1) * (F.col("c") - 1))
        .cast("bigint")
        .alias("dof"),
        F.round(
            F.sqrt(
                F.col("chi2")
                / (F.col("n") * (F.least(F.col("r"), F.col("c")) - 1))
            ),
            6,
        ).alias("cramers_v"),
    )


@register(
    "q444_partial_correlation",
    """
    WITH s AS (
      SELECT COUNT(*)::DOUBLE AS n,
             AVG(l_quantity) AS mx, AVG(l_extendedprice) AS my,
             AVG(l_discount) AS mz,
             SUM(l_quantity * l_extendedprice) AS sxy,
             SUM(l_quantity * l_discount) AS sxz,
             SUM(l_extendedprice * l_discount) AS syz,
             SUM(l_quantity * l_quantity) AS sxx,
             SUM(l_extendedprice * l_extendedprice) AS syy,
             SUM(l_discount * l_discount) AS szz
      FROM lineitem
    ),
    r AS (
      SELECT (sxy - n * mx * my)
             / SQRT((sxx - n * mx * mx) * (syy - n * my * my)) AS rxy,
             (sxz - n * mx * mz)
             / SQRT((sxx - n * mx * mx) * (szz - n * mz * mz)) AS rxz,
             (syz - n * my * mz)
             / SQRT((syy - n * my * my) * (szz - n * mz * mz)) AS ryz
      FROM s
    )
    SELECT ROUND(rxy, 6) AS r_qty_price,
           ROUND(rxz, 6) AS r_qty_disc,
           ROUND(ryz, 6) AS r_price_disc,
           ROUND((rxy - rxz * ryz)
                 / SQRT((1 - rxz * rxz) * (1 - ryz * ryz)), 6)
             AS partial_r_qty_price
    FROM r
    """,
)
def q444_partial_correlation(spark, sf_dir):
    """First-order partial correlation of quantity and extended price
    CONTROLLING for discount: r_xy·z = (r_xy − r_xz·r_yz) /
    √((1−r_xz²)(1−r_yz²)) — the correlation that remains after the
    common driver is regressed out, which q252's raw Pearson matrix
    cannot distinguish from confounding.  All three pairwise
    correlations come from one ten-sufficient-statistics scan; the
    partialling is scalar algebra."""
    li = _t(spark, sf_dir, "lineitem")
    x, y, z = F.col("l_quantity"), F.col("l_extendedprice"), F.col(
        "l_discount"
    )
    s = li.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.avg(x).alias("mx"),
        F.avg(y).alias("my"),
        F.avg(z).alias("mz"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * z).alias("sxz"),
        F.sum(y * z).alias("syz"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
        F.sum(z * z).alias("szz"),
    )
    n = F.col("n")
    cxx = F.col("sxx") - n * F.col("mx") * F.col("mx")
    cyy = F.col("syy") - n * F.col("my") * F.col("my")
    czz = F.col("szz") - n * F.col("mz") * F.col("mz")
    rxy = (F.col("sxy") - n * F.col("mx") * F.col("my")) / F.sqrt(
        cxx * cyy
    )
    rxz = (F.col("sxz") - n * F.col("mx") * F.col("mz")) / F.sqrt(
        cxx * czz
    )
    ryz = (F.col("syz") - n * F.col("my") * F.col("mz")) / F.sqrt(
        cyy * czz
    )
    r = s.select(
        rxy.alias("rxy"), rxz.alias("rxz"), ryz.alias("ryz")
    )
    return r.select(
        F.round("rxy", 6).alias("r_qty_price"),
        F.round("rxz", 6).alias("r_qty_disc"),
        F.round("ryz", 6).alias("r_price_disc"),
        F.round(
            (F.col("rxy") - F.col("rxz") * F.col("ryz"))
            / F.sqrt(
                (1 - F.col("rxz") * F.col("rxz"))
                * (1 - F.col("ryz") * F.col("ryz"))
            ),
            6,
        ).alias("partial_r_qty_price"),
    )


@register(
    "q445_jackknife_mean",
    """
    WITH g AS (
      SELECT n.n_name AS nation, COUNT(*)::DOUBLE AS ni,
             SUM(o.o_totalprice) AS si
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY 1
    ),
    tot AS (
      SELECT SUM(ni) AS nt, SUM(si) AS st,
             COUNT(*)::DOUBLE AS gk
      FROM g
    ),
    pseudo AS (
      SELECT g.nation,
             tot.gk * (tot.st / tot.nt)
             - (tot.gk - 1) * ((tot.st - g.si) / (tot.nt - g.ni))
               AS pv,
             tot.st / tot.nt AS theta, tot.gk AS gk
      FROM g CROSS JOIN tot
    )
    SELECT ROUND(MAX(theta), 4) AS theta_full,
           ROUND(AVG(pv), 4) AS jackknife_mean,
           ROUND(SQRT(SUM(POWER(pv - (SELECT AVG(pv) FROM pseudo), 2))
                      / (MAX(gk) * (MAX(gk) - 1))), 4) AS jackknife_se,
           CAST(MAX(gk) AS BIGINT) AS n_groups
    FROM pseudo
    """,
)
def q445_jackknife_mean(spark, sf_dir):
    """Delete-one-GROUP jackknife for the mean order price, with
    customer nations as the deletion groups: pseudo-values θ*ᵢ =
    g·θ − (g−1)·θ₍₋ᵢ₎ and their spread give a standard error that
    respects within-nation clustering — the honest SE when
    observations inside a nation are correlated, where q204's i.i.d.
    bootstrap is too optimistic.  Every leave-one-out estimate is
    closed-form from (Σ, n) per group, so the whole resampling plan
    is one grouped scan plus 25-row algebra — no replicate passes."""
    od = _t(spark, sf_dir, "orders")
    cu = _t(spark, sf_dir, "customer")
    na = _t(spark, sf_dir, "nation")
    g = (
        od.join(cu, od.o_custkey == cu.c_custkey)
        .join(F.broadcast(na), cu.c_nationkey == na.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).cast("double").alias("ni"),
            F.sum("o_totalprice").alias("si"),
        )
    )
    tot = g.agg(
        F.sum("ni").alias("nt"),
        F.sum("si").alias("st"),
        F.count(F.lit(1)).cast("double").alias("gk"),
    )
    theta = F.col("st") / F.col("nt")
    loo = (F.col("st") - F.col("si")) / (F.col("nt") - F.col("ni"))
    pseudo = g.crossJoin(F.broadcast(tot)).select(
        (F.col("gk") * theta - (F.col("gk") - 1) * loo).alias("pv"),
        theta.alias("theta"),
        F.col("gk").alias("gk"),
    )
    wall = Window.partitionBy()
    withm = pseudo.withColumn("pm", F.avg("pv").over(wall))
    return withm.agg(
        F.round(F.max("theta"), 4).alias("theta_full"),
        F.round(F.avg("pv"), 4).alias("jackknife_mean"),
        F.round(
            F.sqrt(
                F.sum(F.pow(F.col("pv") - F.col("pm"), 2))
                / (F.max("gk") * (F.max("gk") - 1))
            ),
            4,
        ).alias("jackknife_se"),
        F.max("gk").cast("bigint").alias("n_groups"),
    )


@register(
    "q446_price_stickiness",
    """
    WITH seq AS (
      SELECT p.p_brand AS brand,
             ROUND(l.l_extendedprice / l.l_quantity, 2) AS up,
             LAG(ROUND(l.l_extendedprice / l.l_quantity, 2))
               OVER (PARTITION BY l.l_partkey
                     ORDER BY l.l_shipdate, l.l_orderkey,
                              l.l_linenumber) AS prev_up
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    )
    SELECT brand,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(CASE WHEN up = prev_up THEN 1 ELSE 0 END)
                AS BIGINT) AS sticky_pairs,
           ROUND(AVG(CASE WHEN up = prev_up THEN 1.0 ELSE 0 END), 6)
             AS stickiness,
           ROUND(AVG(CASE WHEN up <> prev_up
                          THEN ABS(up - prev_up) / prev_up END), 4)
             AS mean_abs_change
    FROM seq WHERE prev_up IS NOT NULL
    GROUP BY brand
    """,
)
def q446_price_stickiness(spark, sf_dir):
    """Price stickiness per brand: for each part's sale sequence in
    ship-date order, the share of consecutive transactions at an
    UNCHANGED unit price (2-decimal) and the mean |Δp|/p when the
    price does move — the menu-cost micro-metric (Bils-Klenow style)
    that q336's dispersion snapshot can't see because it has no time
    axis.  One part-partitioned ordered lag over the fact table, then
    a brand rollup; the partition key is the natural sales order, so
    the window shuffle is the only exchange."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    up = F.round(F.col("l_extendedprice") / F.col("l_quantity"), 2)
    w = Window.partitionBy("l_partkey").orderBy(
        "l_shipdate", "l_orderkey", "l_linenumber"
    )
    seq = (
        li.join(p, li.l_partkey == p.p_partkey)
        .select(
            F.col("p_brand").alias("brand"),
            up.alias("up"),
            F.lag(up).over(w).alias("prev_up"),
        )
        .filter(F.col("prev_up").isNotNull())
    )
    same = F.col("up") == F.col("prev_up")
    return seq.groupBy("brand").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum(F.when(same, 1).otherwise(0))
        .cast("bigint")
        .alias("sticky_pairs"),
        F.round(F.avg(F.when(same, 1.0).otherwise(0.0)), 6).alias(
            "stickiness"
        ),
        F.round(
            F.avg(
                F.when(
                    ~same,
                    F.abs(F.col("up") - F.col("prev_up"))
                    / F.col("prev_up"),
                )
            ),
            # 4 dp: the ratio mean accumulates in partition order, so
            # the engines differ at ~1e-6 — round below that noise.
            4,
        ).alias("mean_abs_change"),
    )


@register(
    "q447_logrank",
    """
    WITH purch AS (
      SELECT user_id, epoch_us(ts) AS us, value,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS k
      FROM events WHERE event_type = 'purchase'
    ),
    maxt AS (SELECT MAX(epoch_us(ts)) AS mx FROM events),
    firsts AS (
      SELECT user_id, us AS t1, value AS v1 FROM purch WHERE k = 1
    ),
    seconds AS (
      SELECT user_id, us AS t2 FROM purch WHERE k = 2
    ),
    med AS (SELECT quantile_cont(v1, 0.5) AS mv FROM firsts),
    subj AS (
      SELECT CASE WHEN f.v1 > med.mv THEN 1 ELSE 0 END AS grp,
             CASE WHEN s.user_id IS NOT NULL
                  THEN (s.t2 - f.t1) // 86400000000
                  ELSE (maxt.mx - f.t1) // 86400000000 END AS dur,
             CASE WHEN s.user_id IS NOT NULL THEN 1 ELSE 0 END AS ev
      FROM firsts f
      LEFT JOIN seconds s ON f.user_id = s.user_id
      CROSS JOIN med CROSS JOIN maxt
    ),
    wide AS (
      SELECT dur,
             SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END)::DOUBLE AS c1,
             SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END)::DOUBLE AS c0,
             SUM(CASE WHEN grp = 1 AND ev = 1 THEN 1 ELSE 0 END)::DOUBLE
               AS d1,
             SUM(CASE WHEN grp = 0 AND ev = 1 THEN 1 ELSE 0 END)::DOUBLE
               AS d0
      FROM subj GROUP BY dur
    ),
    risk AS (
      SELECT dur, d1, d0,
             SUM(c1) OVER () - (SUM(c1) OVER (ORDER BY dur) - c1)
               AS n1,
             SUM(c1 + c0) OVER ()
             - (SUM(c1 + c0) OVER (ORDER BY dur) - c1 - c0) AS n
      FROM wide
    ),
    terms AS (
      SELECT SUM(d1) AS o1,
             SUM((d1 + d0) * n1 / n) AS e1,
             SUM(CASE WHEN n > 1
                      THEN (d1 + d0) * (n1 / n) * (1 - n1 / n)
                           * (n - d1 - d0) / (n - 1)
                      ELSE 0 END) AS v
      FROM risk WHERE d1 + d0 > 0
    )
    SELECT CAST(o1 AS BIGINT) AS observed_hi,
           ROUND(e1, 4) AS expected_hi,
           ROUND(v, 4) AS variance,
           ROUND((o1 - e1) / SQRT(v), 4) AS z_stat
    FROM terms
    """,
)
def q447_logrank(spark, sf_dir):
    """Log-rank test for time-to-second-purchase between users whose
    FIRST purchase was above vs below the median value — do big
    first-baskets come back sooner?  Right-censoring at the end of
    the window is handled properly (censored users leave the risk set
    without counting as events), which is exactly what a naive
    mean-gap comparison gets wrong.  The risk sets nₘ(t) come from
    cumulative windows over the per-DURATION histogram, not per-
    (time×subject) expansion — the hypergeometric terms then fold in
    one pass, the same discipline as q228's Kaplan-Meier."""
    ev = _t(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    purch = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        us.alias("us"),
        "value",
        F.row_number()
        .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("k"),
    )
    maxt = ev.agg(F.max(us).alias("mx"))
    firsts = purch.filter(F.col("k") == 1).select(
        "user_id", F.col("us").alias("t1"), F.col("value").alias("v1")
    )
    seconds = purch.filter(F.col("k") == 2).select(
        F.col("user_id").alias("uid2"), F.col("us").alias("t2")
    )
    med = firsts.agg(F.expr("percentile(v1, 0.5)").alias("mv"))
    day = F.lit(86400000000)
    subj = (
        firsts.join(seconds, firsts.user_id == seconds.uid2, "left")
        .crossJoin(F.broadcast(med))
        .crossJoin(F.broadcast(maxt))
        .select(
            F.when(F.col("v1") > F.col("mv"), 1).otherwise(0).alias("grp"),
            F.when(
                F.col("uid2").isNotNull(),
                ((F.col("t2") - F.col("t1")) / day).cast("bigint"),
            )
            .otherwise(((F.col("mx") - F.col("t1")) / day).cast("bigint"))
            .alias("dur"),
            F.when(F.col("uid2").isNotNull(), 1).otherwise(0).alias("ev"),
        )
    )
    wide = subj.groupBy("dur").agg(
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0))
        .cast("double")
        .alias("c1"),
        F.sum(F.when(F.col("grp") == 0, 1).otherwise(0))
        .cast("double")
        .alias("c0"),
        F.sum(F.when((F.col("grp") == 1) & (F.col("ev") == 1), 1).otherwise(0))
        .cast("double")
        .alias("d1"),
        F.sum(F.when((F.col("grp") == 0) & (F.col("ev") == 1), 1).otherwise(0))
        .cast("double")
        .alias("d0"),
    )
    wall = Window.partitionBy()
    wc = Window.orderBy("dur").rowsBetween(Window.unboundedPreceding, 0)
    risk = wide.select(
        "dur",
        "d1",
        "d0",
        (
            F.sum("c1").over(wall)
            - (F.sum("c1").over(wc) - F.col("c1"))
        ).alias("n1"),
        (
            F.sum(F.col("c1") + F.col("c0")).over(wall)
            - (
                F.sum(F.col("c1") + F.col("c0")).over(wc)
                - F.col("c1")
                - F.col("c0")
            )
        ).alias("n"),
    ).filter(F.col("d1") + F.col("d0") > 0)
    d = F.col("d1") + F.col("d0")
    n1, n = F.col("n1"), F.col("n")
    terms = risk.agg(
        F.sum("d1").alias("o1"),
        F.sum(d * n1 / n).alias("e1"),
        F.sum(
            F.when(
                n > 1,
                d * (n1 / n) * (1 - n1 / n) * (n - d) / (n - 1),
            ).otherwise(0.0)
        ).alias("v"),
    )
    return terms.select(
        F.col("o1").cast("bigint").alias("observed_hi"),
        F.round("e1", 4).alias("expected_hi"),
        F.round("v", 4).alias("variance"),
        F.round(
            (F.col("o1") - F.col("e1")) / F.sqrt(F.col("v")), 4
        ).alias("z_stat"),
    )


@register(
    "q448_average_precision",
    """
    WITH u AS (
      SELECT user_id,
             SUM(CASE WHEN event_type IN ('click', 'view')
                      THEN 1 ELSE 0 END)::DOUBLE AS engagement,
             SUM(CASE WHEN event_type = 'purchase'
                      THEN value ELSE 0 END) AS spend
      FROM events GROUP BY user_id
    ),
    med AS (SELECT quantile_cont(spend, 0.5) AS ms FROM u),
    ranked AS (
      SELECT CASE WHEN u.spend > med.ms THEN 1.0 ELSE 0 END AS rel,
             ROW_NUMBER() OVER (ORDER BY u.engagement DESC, u.user_id)
               AS k
      FROM u CROSS JOIN med
    ),
    prec AS (
      SELECT rel, k,
             SUM(rel) OVER (ORDER BY k) / k AS p_at_k
      FROM ranked
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(rel) AS BIGINT) AS n_pos,
           ROUND(SUM(rel * p_at_k) / SUM(rel), 6)
             AS average_precision,
           ROUND(SUM(CASE WHEN k <= 10 THEN rel ELSE 0 END) / 10, 6)
             AS precision_at_10
    FROM prec
    """,
)
def q448_average_precision(spark, sf_dir):
    """Average precision (PR-curve area) for ranking users by
    click/view engagement against an above-median-spend label: AP =
    (1/P)·Σ relₖ·Precision@k — the retrieval metric that, unlike
    q241's AUC-ROC, concentrates on the TOP of the ranking, which is
    what matters when you can only act on the first page.  One
    per-user rollup, one ordered cumulative window over the 150-user
    table; ties break on user_id so both engines rank identically."""
    ev = _t(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.sum(
            F.when(F.col("event_type").isin("click", "view"), 1).otherwise(
                0
            )
        )
        .cast("double")
        .alias("engagement"),
        F.sum(
            F.when(F.col("event_type") == "purchase", F.col("value"))
            .otherwise(0.0)
        ).alias("spend"),
    )
    med = u.agg(F.expr("percentile(spend, 0.5)").alias("ms"))
    ranked = u.crossJoin(F.broadcast(med)).select(
        F.when(F.col("spend") > F.col("ms"), 1.0).otherwise(0.0).alias(
            "rel"
        ),
        F.row_number()
        .over(Window.orderBy(F.col("engagement").desc(), "user_id"))
        .alias("k"),
    )
    wc = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    prec = ranked.select(
        "rel", "k", (F.sum("rel").over(wc) / F.col("k")).alias("p_at_k")
    )
    return prec.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum("rel").cast("bigint").alias("n_pos"),
        F.round(
            F.sum(F.col("rel") * F.col("p_at_k")) / F.sum("rel"), 6
        ).alias("average_precision"),
        F.round(
            F.sum(F.when(F.col("k") <= 10, F.col("rel")).otherwise(0.0))
            / 10,
            6,
        ).alias("precision_at_10"),
    )


@register(
    "q449_lorenz_asymmetry",
    """
    WITH cust AS (
      SELECT o_custkey, SUM(o_totalprice) AS x
      FROM orders GROUP BY o_custkey
    ),
    stats AS (
      SELECT x,
             AVG(x) OVER () AS mu,
             COUNT(*) OVER () AS n,
             SUM(x) OVER () AS sx
      FROM cust
    )
    SELECT CAST(MAX(n) AS BIGINT) AS n_customers,
           ROUND(MAX(mu), 4) AS mean_spend,
           ROUND(SUM(CASE WHEN x < mu THEN 1.0 ELSE 0 END) / MAX(n), 6)
             AS f_mu,
           ROUND(SUM(CASE WHEN x < mu THEN x ELSE 0 END) / MAX(sx), 6)
             AS l_mu,
           ROUND(SUM(CASE WHEN x < mu THEN 1.0 ELSE 0 END) / MAX(n)
                 + SUM(CASE WHEN x < mu THEN x ELSE 0 END) / MAX(sx), 6)
             AS lorenz_asymmetry
    FROM stats
    """,
)
def q449_lorenz_asymmetry(spark, sf_dir):
    """Lorenz asymmetry coefficient of customer spend: S = F(μ)+L(μ)
    (discrete estimator) — the shape diagnostic that two
    distributions with IDENTICAL Gini (q230) can still disagree on:
    S<1 says inequality is driven by many small customers, S>1 by a
    few dominant ones — different retention strategies entirely.
    F(μ) and L(μ) are two conditional folds against broadcast global
    stats; no sort is needed at all (the curve point at μ doesn't
    require ranking, just the below-mean mass and its spend share)."""
    od = _t(spark, sf_dir, "orders")
    cust = od.groupBy("o_custkey").agg(F.sum("o_totalprice").alias("x"))
    wall = Window.partitionBy()
    stats = cust.select(
        "x",
        F.avg("x").over(wall).alias("mu"),
        F.count(F.lit(1)).over(wall).alias("n"),
        F.sum("x").over(wall).alias("sx"),
    )
    below = F.col("x") < F.col("mu")
    f_mu = F.sum(F.when(below, 1.0).otherwise(0.0)) / F.max("n")
    l_mu = F.sum(F.when(below, F.col("x")).otherwise(0.0)) / F.max("sx")
    return stats.agg(
        F.max("n").cast("bigint").alias("n_customers"),
        F.round(F.max("mu"), 4).alias("mean_spend"),
        F.round(f_mu, 6).alias("f_mu"),
        F.round(l_mu, 6).alias("l_mu"),
        F.round(f_mu + l_mu, 6).alias("lorenz_asymmetry"),
    )


@register(
    "q450_cmh_test",
    """
    WITH cell AS (
      SELECT p.p_brand AS brand,
             SUM(CASE WHEN l.l_discount >= 0.05
                       AND l.l_returnflag = 'R'
                      THEN 1 ELSE 0 END)::DOUBLE AS a,
             SUM(CASE WHEN l.l_discount >= 0.05
                       AND l.l_returnflag <> 'R'
                      THEN 1 ELSE 0 END)::DOUBLE AS b,
             SUM(CASE WHEN l.l_discount < 0.05
                       AND l.l_returnflag = 'R'
                      THEN 1 ELSE 0 END)::DOUBLE AS c,
             SUM(CASE WHEN l.l_discount < 0.05
                       AND l.l_returnflag <> 'R'
                      THEN 1 ELSE 0 END)::DOUBLE AS d
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY 1
    ),
    terms AS (
      SELECT COUNT(*)::DOUBLE AS k,
             SUM(a) AS sa,
             SUM((a + b) * (a + c) / (a + b + c + d)) AS se,
             SUM((a + b) * (c + d) * (a + c) * (b + d)
                 / (POWER(a + b + c + d, 2) * (a + b + c + d - 1)))
               AS sv,
             SUM(a * d / (a + b + c + d)) AS snum,
             SUM(b * c / (a + b + c + d)) AS sden
      FROM cell
    )
    SELECT CAST(k AS BIGINT) AS k_strata,
           ROUND(sa, 1) AS observed,
           ROUND(se, 4) AS expected,
           ROUND(POWER(ABS(sa - se) - 0.5, 2) / sv, 4) AS chi2_cmh,
           ROUND(snum / sden, 6) AS odds_ratio_mh
    FROM terms
    """,
)
def q450_cmh_test(spark, sf_dir):
    """Cochran-Mantel-Haenszel test of the discount→return association
    STRATIFIED by brand: each brand contributes its own 2×2 table and
    the test pools Σ(a−E[a]) over strata with hypergeometric
    variances, plus the Mantel-Haenszel common odds ratio — the
    confounding-proof version of q388's single-table odds ratio (a
    brand that both discounts heavily and gets returned often would
    fake a marginal association; CMH nets it out).  The whole
    analysis is one grouped scan into 25 four-cell rows and a scalar
    fold — the same shape Simpson's-paradox auditing (q264) uses."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    disc = F.col("l_discount") >= 0.05
    ret = F.col("l_returnflag") == "R"

    def s(cond):
        return F.sum(F.when(cond, 1).otherwise(0)).cast("double")

    cell = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            s(disc & ret).alias("a"),
            s(disc & ~ret).alias("b"),
            s(~disc & ret).alias("c"),
            s(~disc & ~ret).alias("d"),
        )
    )
    a, b, c, d = F.col("a"), F.col("b"), F.col("c"), F.col("d")
    nt = a + b + c + d
    terms = cell.agg(
        F.count(F.lit(1)).cast("double").alias("k"),
        F.sum(a).alias("sa"),
        F.sum((a + b) * (a + c) / nt).alias("se"),
        F.sum(
            (a + b) * (c + d) * (a + c) * (b + d)
            / (F.pow(nt, 2) * (nt - 1))
        ).alias("sv"),
        F.sum(a * d / nt).alias("snum"),
        F.sum(b * c / nt).alias("sden"),
    )
    return terms.select(
        F.col("k").cast("bigint").alias("k_strata"),
        F.round("sa", 1).alias("observed"),
        F.round("se", 4).alias("expected"),
        F.round(
            F.pow(F.abs(F.col("sa") - F.col("se")) - 0.5, 2)
            / F.col("sv"),
            4,
        ).alias("chi2_cmh"),
        F.round(F.col("snum") / F.col("sden"), 6).alias(
            "odds_ratio_mh"
        ),
    )


@register(
    "q451_mann_kendall",
    """
    WITH monthly AS (
      SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS mth,
             SUM(o_totalprice) AS rev
      FROM orders GROUP BY 1
    ),
    seq AS (
      SELECT rev, ROW_NUMBER() OVER (ORDER BY mth) AS rn
      FROM monthly
    ),
    s AS (
      SELECT SUM(CASE WHEN b.rev > a.rev THEN 1
                      WHEN b.rev < a.rev THEN -1 ELSE 0 END)::DOUBLE
               AS s,
             (SELECT COUNT(*)::DOUBLE FROM seq) AS n
      FROM seq a JOIN seq b ON b.rn > a.rn
    )
    SELECT CAST(n AS BIGINT) AS n_months,
           CAST(s AS BIGINT) AS s_stat,
           ROUND(s / (n * (n - 1) / 2), 6) AS kendall_tau,
           ROUND((s - CASE WHEN s > 0 THEN 1
                           WHEN s < 0 THEN -1 ELSE 0 END)
                 / SQRT(n * (n - 1) * (2 * n + 5) / 18), 4) AS z_stat
    FROM s
    """,
)
def q451_mann_kendall(spark, sf_dir):
    """Mann-Kendall trend test on monthly revenue: S = Σ sign(xⱼ−xᵢ)
    over all i<j pairs, continuity-corrected normal z — the
    hydrology-standard monotone-trend test that sees through any
    monotone transformation of the data and pairs naturally with
    q275's Theil-Sen slope (MK decides IF, Sen says HOW MUCH).  The
    O(n²) pair join runs on the 80-row MONTHLY aggregate (3k pairs) —
    the deliberate scale trade the daily series wouldn't allow; ties
    are counted as zero sign (tie variance correction omitted for
    continuous revenue)."""
    od = _t(spark, sf_dir, "orders")
    monthly = od.groupBy(
        F.to_date(F.date_trunc("MONTH", "o_orderdate")).alias("mth")
    ).agg(F.sum("o_totalprice").alias("rev"))
    seq = monthly.select(
        "rev", F.row_number().over(Window.orderBy("mth")).alias("rn")
    )
    a, b = seq.alias("a"), seq.alias("b")
    pairs = a.join(b, F.col("b.rn") > F.col("a.rn"))
    nrow = seq.agg(F.count(F.lit(1)).cast("double").alias("n"))
    s = pairs.agg(
        F.sum(
            F.when(F.col("b.rev") > F.col("a.rev"), 1)
            .when(F.col("b.rev") < F.col("a.rev"), -1)
            .otherwise(0)
        )
        .cast("double")
        .alias("s")
    ).crossJoin(F.broadcast(nrow))
    sv, n = F.col("s"), F.col("n")
    cc = F.when(sv > 0, 1).when(sv < 0, -1).otherwise(0)
    return s.select(
        n.cast("bigint").alias("n_months"),
        sv.cast("bigint").alias("s_stat"),
        F.round(sv / (n * (n - 1) / 2), 6).alias("kendall_tau"),
        F.round(
            (sv - cc) / F.sqrt(n * (n - 1) * (2 * n + 5) / 18), 4
        ).alias("z_stat"),
    )


@register(
    "q452_turning_points",
    """
    WITH daily AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
             SUM(o_totalprice) AS rev
      FROM orders GROUP BY 1
    ),
    tri AS (
      SELECT rev,
             LAG(rev) OVER (ORDER BY day) AS prev,
             LEAD(rev) OVER (ORDER BY day) AS next
      FROM daily
    ),
    agg AS (
      SELECT COUNT(*)::DOUBLE AS n,
             SUM(CASE WHEN prev IS NOT NULL AND next IS NOT NULL
                       AND ((rev > prev AND rev > next)
                         OR (rev < prev AND rev < next))
                      THEN 1 ELSE 0 END)::DOUBLE AS t
      FROM tri
    )
    SELECT CAST(n AS BIGINT) AS n_days,
           CAST(t AS BIGINT) AS turning_points,
           ROUND(2 * (n - 2) / 3, 4) AS expected,
           ROUND((t - 2 * (n - 2) / 3)
                 / SQRT((16 * n - 29) / 90), 4) AS z_stat
    FROM agg
    """,
)
def q452_turning_points(spark, sf_dir):
    """Turning-point test on daily revenue: count strict local peaks
    and troughs and compare to the i.i.d. expectation 2(n−2)/3 with
    variance (16n−29)/90 — too few turns means smooth momentum, too
    many means alternation (e.g., order batching that dumps on
    alternate days).  The third classical randomness lens next to
    q429's runs test (level-based) and q194's ACF (linear) — this one
    is purely LOCAL shape.  One lag+lead window over the daily
    aggregate."""
    od = _t(spark, sf_dir, "orders")
    daily = od.groupBy(
        F.to_date(F.date_trunc("DAY", "o_orderdate")).alias("day")
    ).agg(F.sum("o_totalprice").alias("rev"))
    w = Window.orderBy("day")
    tri = daily.select(
        "rev",
        F.lag("rev").over(w).alias("prev"),
        F.lead("rev").over(w).alias("next"),
    )
    turn = (
        F.col("prev").isNotNull()
        & F.col("next").isNotNull()
        & (
            ((F.col("rev") > F.col("prev")) & (F.col("rev") > F.col("next")))
            | (
                (F.col("rev") < F.col("prev"))
                & (F.col("rev") < F.col("next"))
            )
        )
    )
    agg = tri.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(F.when(turn, 1).otherwise(0)).cast("double").alias("t"),
    )
    n, t = F.col("n"), F.col("t")
    return agg.select(
        n.cast("bigint").alias("n_days"),
        t.cast("bigint").alias("turning_points"),
        F.round(2 * (n - 2) / 3, 4).alias("expected"),
        F.round(
            (t - 2 * (n - 2) / 3) / F.sqrt((16 * n - 29) / 90), 4
        ).alias("z_stat"),
    )


@register(
    "q453_ljung_box",
    """
    WITH daily AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
             SUM(o_totalprice) AS rev
      FROM orders GROUP BY 1
    ),
    seq AS (
      SELECT rev - AVG(rev) OVER () AS d,
             ROW_NUMBER() OVER (ORDER BY day) AS rn
      FROM daily
    ),
    denom AS (
      SELECT SUM(d * d) AS ss, COUNT(*)::DOUBLE AS n FROM seq
    ),
    rho AS (
      SELECT k.k, SUM(a.d * b.d) / MAX(denom.ss) AS r
      FROM seq a
      CROSS JOIN (VALUES (1),(2),(3),(4),(5),(6),(7),(8),(9),(10))
        AS k(k)
      JOIN seq b ON a.rn = b.rn + k.k
      CROSS JOIN denom
      GROUP BY k.k
    )
    SELECT CAST(MAX(denom.n) AS BIGINT) AS n_days,
           CAST(COUNT(*) AS BIGINT) AS n_lags,
           ROUND(MAX(CASE WHEN rho.k = 1 THEN rho.r END), 6) AS acf1,
           ROUND(MAX(denom.n) * (MAX(denom.n) + 2)
                 * SUM(rho.r * rho.r / (denom.n - rho.k)), 4)
             AS q_stat
    FROM rho CROSS JOIN denom
    """,
)
def q453_ljung_box(spark, sf_dir):
    """Ljung-Box portmanteau test on daily revenue: Q = n(n+2)·
    Σₖ ρ²ₖ/(n−k) over lags 1–10 — the omnibus 'is there ANY linear
    serial structure' verdict that a per-lag eyeball of q298's ACF
    can't give without multiple-testing inflation (under the null
    Q~χ²₁₀, so one number answers all ten lags at once).  The ten
    lagged products come from one equi-join of the mean-centered
    daily sequence against itself at offsets 1..10 (a 10-row
    broadcast expansion, co-partitioned on row number)."""
    od = _t(spark, sf_dir, "orders")
    daily = od.groupBy(
        F.to_date(F.date_trunc("DAY", "o_orderdate")).alias("day")
    ).agg(F.sum("o_totalprice").alias("rev"))
    wall = Window.partitionBy()
    seq = daily.select(
        (F.col("rev") - F.avg("rev").over(wall)).alias("d"),
        F.row_number().over(Window.orderBy("day")).alias("rn"),
    )
    denom = seq.agg(
        F.sum(F.col("d") * F.col("d")).alias("ss"),
        F.count(F.lit(1)).cast("double").alias("n"),
    )
    ks = daily.sparkSession.createDataFrame(
        [(k,) for k in range(1, 11)], "k int"
    )
    a, b = seq.alias("a"), seq.alias("b")
    rho = (
        a.crossJoin(F.broadcast(ks))
        .join(b, F.col("a.rn") == F.col("b.rn") + F.col("k"))
        .crossJoin(F.broadcast(denom))
        .groupBy("k")
        .agg(
            (F.sum(F.col("a.d") * F.col("b.d")) / F.max("ss")).alias("r")
        )
    )
    # n is constant across the 10 joined rows — use the plain column
    # inside the SUM (a nested MAX would be an aggregate-in-aggregate).
    return rho.crossJoin(F.broadcast(denom)).agg(
        F.max("n").cast("bigint").alias("n_days"),
        F.count(F.lit(1)).cast("bigint").alias("n_lags"),
        F.round(
            F.max(F.when(F.col("k") == 1, F.col("r"))), 6
        ).alias("acf1"),
        F.round(
            F.max("n")
            * (F.max("n") + 2)
            * F.sum(
                F.col("r") * F.col("r") / (F.col("n") - F.col("k"))
            ),
            4,
        ).alias("q_stat"),
    )


@register(
    "q454_jarque_bera",
    """
    WITH daily AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
             SUM(o_totalprice) AS rev
      FROM orders GROUP BY 1
    ),
    ret AS (
      SELECT LN(rev / LAG(rev) OVER (ORDER BY day)) AS r
      FROM daily QUALIFY LAG(rev) OVER (ORDER BY day) IS NOT NULL
    ),
    cent AS (
      SELECT r - AVG(r) OVER () AS d FROM ret
    ),
    m AS (
      SELECT COUNT(*)::DOUBLE AS n,
             SUM(d * d) / COUNT(*) AS m2,
             SUM(d * d * d) / COUNT(*) AS m3,
             SUM(d * d * d * d) / COUNT(*) AS m4
      FROM cent
    )
    SELECT CAST(n AS BIGINT) AS n_returns,
           ROUND(m3 / POWER(m2, 1.5), 6) AS skewness,
           ROUND(m4 / (m2 * m2), 6) AS kurtosis,
           ROUND(n / 6 * (POWER(m3 / POWER(m2, 1.5), 2)
                 + POWER(m4 / (m2 * m2) - 3, 2) / 4), 4) AS jb_stat
    FROM m
    """,
)
def q454_jarque_bera(spark, sf_dir):
    """Jarque-Bera normality test on daily revenue LOG-RETURNS:
    JB = n/6·(S² + (K−3)²/4) from the third and fourth central
    moments — the gate in front of every Gaussian assumption
    downstream (q304's parametric VaR, q310's power analysis); a JB
    in the hundreds says 'use the empirical quantiles, not μ±zσ'.
    Returns are one lag window, moments one fold over the centered
    series."""
    od = _t(spark, sf_dir, "orders")
    daily = od.groupBy(
        F.to_date(F.date_trunc("DAY", "o_orderdate")).alias("day")
    ).agg(F.sum("o_totalprice").alias("rev"))
    w = Window.orderBy("day")
    ret = daily.select(
        F.log(F.col("rev") / F.lag("rev").over(w)).alias("r"),
        F.lag("rev").over(w).alias("prev"),
    ).filter(F.col("prev").isNotNull())
    wall = Window.partitionBy()
    cent = ret.select((F.col("r") - F.avg("r").over(wall)).alias("d"))
    m = cent.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        (F.sum(F.col("d") * F.col("d")) / F.count(F.lit(1))).alias("m2"),
        (
            F.sum(F.col("d") * F.col("d") * F.col("d"))
            / F.count(F.lit(1))
        ).alias("m3"),
        (
            F.sum(F.col("d") * F.col("d") * F.col("d") * F.col("d"))
            / F.count(F.lit(1))
        ).alias("m4"),
    )
    skew = F.col("m3") / F.pow(F.col("m2"), 1.5)
    kurt = F.col("m4") / (F.col("m2") * F.col("m2"))
    return m.select(
        F.col("n").cast("bigint").alias("n_returns"),
        F.round(skew, 6).alias("skewness"),
        F.round(kurt, 6).alias("kurtosis"),
        F.round(
            F.col("n")
            / 6
            * (F.pow(skew, 2) + F.pow(kurt - 3, 2) / 4),
            4,
        ).alias("jb_stat"),
    )


@register(
    "q455_durbin_watson",
    """
    WITH daily AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
             SUM(o_totalprice) AS rev
      FROM orders GROUP BY 1
    ),
    seq AS (
      SELECT rev AS y,
             CAST(ROW_NUMBER() OVER (ORDER BY day) AS DOUBLE) AS t
      FROM daily
    ),
    fit AS (
      SELECT (SUM(t * y) - COUNT(*) * AVG(t) * AVG(y))
             / (SUM(t * t) - COUNT(*) * AVG(t) * AVG(t)) AS b,
             AVG(y) AS ybar, AVG(t) AS tbar
      FROM seq
    ),
    resid AS (
      SELECT s.y - (f.ybar - f.b * f.tbar) - f.b * s.t AS e,
             LAG(s.y - (f.ybar - f.b * f.tbar) - f.b * s.t)
               OVER (ORDER BY s.t) AS pe,
             f.b AS b
      FROM seq s CROSS JOIN fit f
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
           ROUND(MAX(b), 6) AS trend_slope,
           ROUND(SUM(CASE WHEN pe IS NOT NULL
                          THEN POWER(e - pe, 2) ELSE 0 END)
                 / SUM(e * e), 4) AS dw_stat,
           ROUND(1 - (SUM(CASE WHEN pe IS NOT NULL
                               THEN POWER(e - pe, 2) ELSE 0 END)
                      / SUM(e * e)) / 2, 6) AS rho_approx
    FROM resid
    """,
)
def q455_durbin_watson(spark, sf_dir):
    """Durbin-Watson autocorrelation test on the residuals of the
    daily-revenue linear trend: DW = Σ(eₜ−eₜ₋₁)²/Σe² ≈ 2(1−ρ) — the
    regression-diagnostic companion to q432: if DW ≪ 2 the trend
    fit's standard errors are fiction (positively correlated errors)
    and any 'significant growth' claim from q205-style OLS needs
    Newey-West or differencing.  The trend coefficients are
    closed-form from one fold; residuals need no second scan — the
    fit broadcasts back over the ordered window."""
    od = _t(spark, sf_dir, "orders")
    daily = od.groupBy(
        F.to_date(F.date_trunc("DAY", "o_orderdate")).alias("day")
    ).agg(F.sum("o_totalprice").alias("rev"))
    seq = daily.select(
        F.col("rev").alias("y"),
        F.row_number()
        .over(Window.orderBy("day"))
        .cast("double")
        .alias("t"),
    )
    fit = seq.agg(
        (
            (F.sum(F.col("t") * F.col("y"))
             - F.count(F.lit(1)) * F.avg("t") * F.avg("y"))
            / (
                F.sum(F.col("t") * F.col("t"))
                - F.count(F.lit(1)) * F.avg("t") * F.avg("t")
            )
        ).alias("b"),
        F.avg("y").alias("ybar"),
        F.avg("t").alias("tbar"),
    )
    e = (
        F.col("y")
        - (F.col("ybar") - F.col("b") * F.col("tbar"))
        - F.col("b") * F.col("t")
    )
    resid = seq.crossJoin(F.broadcast(fit)).select(
        e.alias("e"),
        F.lag(e).over(Window.orderBy("t")).alias("pe"),
        F.col("b").alias("b"),
    )
    num = F.sum(
        F.when(
            F.col("pe").isNotNull(),
            F.pow(F.col("e") - F.col("pe"), 2),
        ).otherwise(0.0)
    )
    den = F.sum(F.col("e") * F.col("e"))
    return resid.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.round(F.max("b"), 6).alias("trend_slope"),
        F.round(num / den, 4).alias("dw_stat"),
        F.round(F.lit(1) - (num / den) / 2, 6).alias("rho_approx"),
    )


@register(
    "q456_arch_test",
    """
    WITH daily AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
             SUM(o_totalprice) AS rev
      FROM orders GROUP BY 1
    ),
    sq AS (
      SELECT POWER(rev - AVG(rev) OVER (), 2) AS x2, day
      FROM daily
    ),
    lagged AS (
      SELECT x2 AS y, LAG(x2) OVER (ORDER BY day) AS x
      FROM sq QUALIFY LAG(x2) OVER (ORDER BY day) IS NOT NULL
    ),
    s AS (
      SELECT COUNT(*)::DOUBLE AS n,
             AVG(x) AS mx, AVG(y) AS my,
             SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy
      FROM lagged
    )
    SELECT CAST(n AS BIGINT) AS n_obs,
           ROUND(POWER(sxy - n * mx * my, 2)
                 / ((sxx - n * mx * mx) * (syy - n * my * my)), 6)
             AS r_squared,
           ROUND(n * POWER(sxy - n * mx * my, 2)
                 / ((sxx - n * mx * mx) * (syy - n * my * my)), 4)
             AS lm_stat
    FROM s
    """,
)
def q456_arch_test(spark, sf_dir):
    """Engle's ARCH LM test (order 1) on daily revenue: regress the
    squared demeaned series on its own lag; LM = n·R² ~ χ²₁ under
    homoskedasticity.  Volatility CLUSTERING is invisible to every
    level-based test in the suite (q429/q452/q453 all pass white
    noise with ARCH effects); this is the one that catches 'calm
    weeks, wild weeks' — and if it fires, q304's VaR should be
    conditional, not unconditional.  One window for the lag, one
    sufficient-statistics fold."""
    od = _t(spark, sf_dir, "orders")
    daily = od.groupBy(
        F.to_date(F.date_trunc("DAY", "o_orderdate")).alias("day")
    ).agg(F.sum("o_totalprice").alias("rev"))
    wall = Window.partitionBy()
    sq = daily.select(
        F.pow(F.col("rev") - F.avg("rev").over(wall), 2).alias("x2"),
        "day",
    )
    w = Window.orderBy("day")
    lagged = sq.select(
        F.col("x2").alias("y"), F.lag("x2").over(w).alias("x")
    ).filter(F.col("x").isNotNull())
    s = lagged.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.avg("x").alias("mx"),
        F.avg("y").alias("my"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    n = F.col("n")
    r2 = F.pow(F.col("sxy") - n * F.col("mx") * F.col("my"), 2) / (
        (F.col("sxx") - n * F.col("mx") * F.col("mx"))
        * (F.col("syy") - n * F.col("my") * F.col("my"))
    )
    return s.select(
        n.cast("bigint").alias("n_obs"),
        F.round(r2, 6).alias("r_squared"),
        F.round(n * r2, 4).alias("lm_stat"),
    )


@register(
    "q457_granger_cause",
    """
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
               AS clicks,
             SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS buys
      FROM events GROUP BY 1
    ),
    lagged AS (
      SELECT CAST(buys AS DOUBLE) AS y,
             CAST(LAG(buys) OVER (ORDER BY day) AS DOUBLE) AS x1,
             CAST(LAG(clicks) OVER (ORDER BY day) AS DOUBLE) AS x2
      FROM daily
      QUALIFY LAG(buys) OVER (ORDER BY day) IS NOT NULL
    ),
    c AS (
      SELECT COUNT(*)::DOUBLE AS n,
             SUM(x1 * y) - COUNT(*) * AVG(x1) * AVG(y) AS s1y,
             SUM(x2 * y) - COUNT(*) * AVG(x2) * AVG(y) AS s2y,
             SUM(x1 * x1) - COUNT(*) * AVG(x1) * AVG(x1) AS s11,
             SUM(x2 * x2) - COUNT(*) * AVG(x2) * AVG(x2) AS s22,
             SUM(x1 * x2) - COUNT(*) * AVG(x1) * AVG(x2) AS s12,
             SUM(y * y) - COUNT(*) * AVG(y) * AVG(y) AS syy
      FROM lagged
    ),
    fit AS (
      SELECT n, syy,
             (s1y * s22 - s2y * s12) / (s11 * s22 - s12 * s12) AS b1,
             (s2y * s11 - s1y * s12) / (s11 * s22 - s12 * s12) AS b2,
             s1y, s2y,
             syy - s1y * s1y / s11 AS sse_r
      FROM c
    )
    SELECT CAST(n AS BIGINT) AS n_days,
           ROUND(b2, 6) AS click_coef,
           ROUND(sse_r, 4) AS sse_restricted,
           ROUND(syy - b1 * s1y - b2 * s2y, 4) AS sse_unrestricted,
           ROUND((sse_r - (syy - b1 * s1y - b2 * s2y))
                 / ((syy - b1 * s1y - b2 * s2y) / (n - 3)), 4)
             AS f_stat
    FROM fit
    """,
)
def q457_granger_cause(spark, sf_dir):
    """Granger causality (lag 1): do yesterday's CLICKS predict
    today's PURCHASES beyond what yesterday's purchases already do?
    Unrestricted AR(1)+exogenous vs restricted AR(1), F-test on the
    SSE drop — the temporal-precedence test that separates 'clicks
    lead buys' from mere contemporaneous correlation (q288's lead-lag
    corr measures association; this one demands incremental
    predictive power).  The 2-regressor OLS solves the 2×2 normal
    equations in closed form from seven centered sufficient
    statistics — one lag window, one fold, no matrix library."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.to_date(F.date_trunc("DAY", "ts")).alias("day")
    ).agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias(
            "clicks"
        ),
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("buys"),
    )
    w = Window.orderBy("day")
    lagged = daily.select(
        F.col("buys").cast("double").alias("y"),
        F.lag("buys").over(w).cast("double").alias("x1"),
        F.lag("clicks").over(w).cast("double").alias("x2"),
    ).filter(F.col("x1").isNotNull())
    cnt = F.count(F.lit(1))
    c = lagged.agg(
        cnt.cast("double").alias("n"),
        (F.sum(F.col("x1") * F.col("y")) - cnt * F.avg("x1") * F.avg("y")).alias("s1y"),
        (F.sum(F.col("x2") * F.col("y")) - cnt * F.avg("x2") * F.avg("y")).alias("s2y"),
        (F.sum(F.col("x1") * F.col("x1")) - cnt * F.avg("x1") * F.avg("x1")).alias("s11"),
        (F.sum(F.col("x2") * F.col("x2")) - cnt * F.avg("x2") * F.avg("x2")).alias("s22"),
        (F.sum(F.col("x1") * F.col("x2")) - cnt * F.avg("x1") * F.avg("x2")).alias("s12"),
        (F.sum(F.col("y") * F.col("y")) - cnt * F.avg("y") * F.avg("y")).alias("syy"),
    )
    det = F.col("s11") * F.col("s22") - F.col("s12") * F.col("s12")
    b1 = (F.col("s1y") * F.col("s22") - F.col("s2y") * F.col("s12")) / det
    b2 = (F.col("s2y") * F.col("s11") - F.col("s1y") * F.col("s12")) / det
    fit = c.select(
        "n",
        "syy",
        b1.alias("b1"),
        b2.alias("b2"),
        "s1y",
        "s2y",
        (F.col("syy") - F.col("s1y") * F.col("s1y") / F.col("s11")).alias(
            "sse_r"
        ),
    )
    sse_u = (
        F.col("syy")
        - F.col("b1") * F.col("s1y")
        - F.col("b2") * F.col("s2y")
    )
    return fit.select(
        F.col("n").cast("bigint").alias("n_days"),
        F.round("b2", 6).alias("click_coef"),
        F.round("sse_r", 4).alias("sse_restricted"),
        F.round(sse_u, 4).alias("sse_unrestricted"),
        F.round(
            (F.col("sse_r") - sse_u) / (sse_u / (F.col("n") - 3)), 4
        ).alias("f_stat"),
    )


@register(
    "q458_periodogram",
    """
    WITH daily AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
             SUM(o_totalprice) AS rev
      FROM orders GROUP BY 1
    ),
    seq AS (
      SELECT rev - AVG(rev) OVER () AS d,
             CAST(ROW_NUMBER() OVER (ORDER BY day) AS DOUBLE) AS t
      FROM daily
    ),
    terms AS (
      SELECT p.period,
             SUM(s.d * COS(2 * 3.141592653589793 * s.t / p.period))
               AS c,
             SUM(s.d * SIN(2 * 3.141592653589793 * s.t / p.period))
               AS sn,
             COUNT(*)::DOUBLE AS n,
             SUM(s.d * s.d) / COUNT(*) AS m2
      FROM seq s CROSS JOIN (VALUES (7.0), (30.0), (91.0), (365.0))
        AS p(period)
      GROUP BY p.period
    )
    SELECT CAST(period AS BIGINT) AS period_days,
           ROUND((c * c + sn * sn) / n, 4) AS power,
           ROUND(2 * SQRT(c * c + sn * sn) / n, 4) AS amplitude,
           ROUND(POWER(2 * SQRT(c * c + sn * sn) / n, 2) / 2 / m2, 6)
             AS var_share
    FROM terms
    """,
)
def q458_periodogram(spark, sf_dir):
    """Periodogram probe of daily revenue at the four calendar
    frequencies that matter (weekly, monthly, quarterly, yearly):
    the DFT power (C²+S²)/n, the implied sinusoid amplitude, and the
    fraction of total variance that single frequency explains —
    q412 FITS a weekly shape and q254 tabulates it; this one asks
    each period 'how much signal is at exactly your frequency' with
    one trig-weighted fold per period, so an unexpected spike (e.g.
    a 14-day invoicing echo) shows up without being modeled first.
    Four periods × one pass over the daily aggregate."""
    od = _t(spark, sf_dir, "orders")
    daily = od.groupBy(
        F.to_date(F.date_trunc("DAY", "o_orderdate")).alias("day")
    ).agg(F.sum("o_totalprice").alias("rev"))
    wall = Window.partitionBy()
    seq = daily.select(
        (F.col("rev") - F.avg("rev").over(wall)).alias("d"),
        F.row_number()
        .over(Window.orderBy("day"))
        .cast("double")
        .alias("t"),
    )
    periods = daily.sparkSession.createDataFrame(
        [(7.0,), (30.0,), (91.0,), (365.0,)], "period double"
    )
    two_pi = 2 * 3.141592653589793
    ang = F.lit(two_pi) * F.col("t") / F.col("period")
    terms = (
        seq.crossJoin(F.broadcast(periods))
        .groupBy("period")
        .agg(
            F.sum(F.col("d") * F.cos(ang)).alias("c"),
            F.sum(F.col("d") * F.sin(ang)).alias("sn"),
            F.count(F.lit(1)).cast("double").alias("n"),
            (F.sum(F.col("d") * F.col("d")) / F.count(F.lit(1))).alias(
                "m2"
            ),
        )
    )
    p2 = F.col("c") * F.col("c") + F.col("sn") * F.col("sn")
    amp = 2 * F.sqrt(p2) / F.col("n")
    return terms.select(
        F.col("period").cast("bigint").alias("period_days"),
        F.round(p2 / F.col("n"), 4).alias("power"),
        F.round(amp, 4).alias("amplitude"),
        F.round(F.pow(amp, 2) / 2 / F.col("m2"), 6).alias("var_share"),
    )


@register(
    "q459_variance_changepoint",
    """
    WITH daily AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
             SUM(o_totalprice) AS rev
      FROM orders GROUP BY 1
    ),
    sq AS (
      SELECT day, POWER(rev - AVG(rev) OVER (), 2) AS e2
      FROM daily
    ),
    cum AS (
      SELECT day,
             ROW_NUMBER() OVER (ORDER BY day) AS k,
             SUM(e2) OVER (ORDER BY day) AS ck,
             SUM(e2) OVER () AS cn,
             COUNT(*) OVER () AS n
      FROM sq
    ),
    scored AS (
      SELECT day, k, n,
             ck / cn - CAST(k AS DOUBLE) / n AS dk,
             ck / k AS var_left,
             (cn - ck) / (n - k) AS var_right
      FROM cum WHERE k < n
    )
    SELECT day AS split_day,
           CAST(k AS BIGINT) AS n_left,
           CAST(n - k AS BIGINT) AS n_right,
           ROUND(dk, 6) AS d_k,
           ROUND(var_left, 4) AS var_left,
           ROUND(var_right, 4) AS var_right,
           ROUND(var_right / var_left, 4) AS var_ratio
    FROM scored
    ORDER BY ABS(dk) DESC, day
    LIMIT 1
    """,
)
def q459_variance_changepoint(spark, sf_dir):
    """Single VARIANCE change-point (ICSS step 1): the day maximizing
    |Dₖ| = |Cₖ/Cₙ − k/n| on the centered cumulative sum of squares —
    q418 finds a LEVEL shift; this finds the day volatility regime
    changed even when the mean never moved (the split q456's ARCH
    test motivates).  Same closed-form prefix discipline: one ordered
    cumulative window over the daily aggregate, a top-1 with an
    earliest-day tiebreak."""
    od = _t(spark, sf_dir, "orders")
    daily = od.groupBy(
        F.to_date(F.date_trunc("DAY", "o_orderdate")).alias("day")
    ).agg(F.sum("o_totalprice").alias("rev"))
    wall = Window.partitionBy()
    sq = daily.select(
        "day",
        F.pow(F.col("rev") - F.avg("rev").over(wall), 2).alias("e2"),
    )
    wc = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    cum = sq.select(
        "day",
        F.row_number().over(Window.orderBy("day")).alias("k"),
        F.sum("e2").over(wc).alias("ck"),
        F.sum("e2").over(wall).alias("cn"),
        F.count(F.lit(1)).over(wall).alias("n"),
    ).filter(F.col("k") < F.col("n"))
    dk = F.col("ck") / F.col("cn") - F.col("k").cast("double") / F.col("n")
    vl = F.col("ck") / F.col("k")
    vr = (F.col("cn") - F.col("ck")) / (F.col("n") - F.col("k"))
    return (
        cum.select(
            F.col("day").alias("split_day"),
            F.col("k").cast("bigint").alias("n_left"),
            (F.col("n") - F.col("k")).cast("bigint").alias("n_right"),
            F.round(dk, 6).alias("d_k"),
            F.round(vl, 4).alias("var_left"),
            F.round(vr, 4).alias("var_right"),
            F.round(vr / vl, 4).alias("var_ratio"),
            F.abs(dk).alias("_a"),
        )
        .orderBy(F.col("_a").desc(), "split_day")
        .limit(1)
        .drop("_a")
    )


@register(
    "q460_stopword_discovery",
    r"""
    WITH tf AS (
      SELECT doc_id, w, COUNT(*) AS c
      FROM (
        SELECT doc_id,
               UNNEST(list_filter(
                 string_split_regex(trim(lower(text)), '\s+'),
                 x -> x <> '')) AS w
        FROM documents
      ) GROUP BY doc_id, w
    ),
    nd AS (SELECT COUNT(DISTINCT doc_id)::DOUBLE AS n FROM tf),
    terms AS (
      SELECT t.w,
             COUNT(*)::DOUBLE / MAX(nd.n) AS df_frac,
             SUM(CASE WHEN t.c >= 2 THEN 1 ELSE 0 END)::DOUBLE
               / COUNT(*) AS burst
      FROM tf t CROSS JOIN nd
      GROUP BY t.w
      HAVING COUNT(*)::DOUBLE / MAX(nd.n) >= 0.5
    )
    SELECT w AS term,
           ROUND(df_frac, 6) AS df_frac,
           ROUND(burst, 6) AS burstiness,
           ROUND(df_frac * (1 - burst), 6) AS stopword_score
    FROM terms
    ORDER BY df_frac * (1 - burst) DESC, w
    LIMIT 20
    """,
)
def q460_stopword_discovery(spark, sf_dir):
    """Data-driven stopword discovery: score = df_frac·(1−burstiness)
    — a stopword appears in (nearly) every document (high df) but
    does NOT burst when it appears (function words are dispersed;
    q426 showed content words re-occur).  No language-specific list,
    so it works on any corpus the pipeline meets — the principled
    replacement for the hardcoded lists most cleaning stacks carry.
    Reuses the (doc, term) aggregate; the ≥50%-df gate keeps the
    ranked set tiny."""
    d = _t(spark, sf_dir, "documents")
    toks = F.filter(
        F.split(F.trim(F.lower(F.col("text"))), r"\s+"),
        lambda w: w != "",
    )
    tf = (
        d.select("doc_id", F.explode(toks).alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    nd = tf.agg(F.countDistinct("doc_id").cast("double").alias("n"))
    terms = (
        tf.crossJoin(F.broadcast(nd))
        .groupBy("w")
        .agg(
            (F.count(F.lit(1)).cast("double") / F.max("n")).alias(
                "df_frac"
            ),
            (
                F.sum(F.when(F.col("c") >= 2, 1).otherwise(0)).cast(
                    "double"
                )
                / F.count(F.lit(1))
            ).alias("burst"),
        )
        .filter(F.col("df_frac") >= 0.5)
    )
    score = F.col("df_frac") * (1 - F.col("burst"))
    return (
        terms.select(
            F.col("w").alias("term"),
            F.round("df_frac", 6).alias("df_frac"),
            F.round("burst", 6).alias("burstiness"),
            F.round(score, 6).alias("stopword_score"),
            score.alias("_s"),
        )
        .orderBy(F.col("_s").desc(), "term")
        .limit(20)
        .drop("_s")
    )


@register(
    "q461_brier_decomposition",
    """
    WITH u AS (
      SELECT user_id,
             SUM(CASE WHEN event_type IN ('click', 'view')
                      THEN 1 ELSE 0 END)::DOUBLE AS engagement,
             SUM(CASE WHEN event_type = 'purchase'
                      THEN value ELSE 0 END) AS spend
      FROM events GROUP BY user_id
    ),
    med AS (SELECT quantile_cont(spend, 0.5) AS ms FROM u),
    scored AS (
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY u.engagement, u.user_id)
                  AS DOUBLE)
             / COUNT(*) OVER () AS p,
             CASE WHEN u.spend > med.ms THEN 1.0 ELSE 0 END AS o
      FROM u CROSS JOIN med
    ),
    binned AS (
      SELECT LEAST(CAST(FLOOR(p * 10) AS BIGINT), 9) AS bin, p, o
      FROM scored
    ),
    bins AS (
      SELECT bin, COUNT(*)::DOUBLE AS nk, AVG(p) AS pk, AVG(o) AS ok
      FROM binned GROUP BY bin
    ),
    tot AS (
      SELECT SUM(nk) AS n, SUM(nk * ok) / SUM(nk) AS obar FROM bins
    ),
    parts AS (
      SELECT SUM(b.nk * POWER(b.pk - b.ok, 2)) / MAX(t.n) AS rel,
             SUM(b.nk * POWER(b.ok - t.obar, 2)) / MAX(t.n) AS res,
             MAX(t.obar) * (1 - MAX(t.obar)) AS unc
      FROM bins b CROSS JOIN tot t
    ),
    brier AS (
      SELECT AVG(POWER(p - o, 2)) AS bs FROM scored
    )
    SELECT ROUND(brier.bs, 6) AS brier_score,
           ROUND(parts.rel, 6) AS reliability,
           ROUND(parts.res, 6) AS resolution,
           ROUND(parts.unc, 6) AS uncertainty,
           ROUND(parts.rel - parts.res + parts.unc, 6)
             AS decomposed_brier
    FROM brier CROSS JOIN parts
    """,
)
def q461_brier_decomposition(spark, sf_dir):
    """Brier score with the Murphy decomposition (reliability −
    resolution + uncertainty) for an engagement-percentile forecast
    of above-median spend: q316's ECE measures miscalibration only;
    the decomposition separates 'the probabilities are wrong'
    (reliability) from 'the forecaster can't discriminate'
    (resolution) — two different fixes.  The binned decomposition
    won't equal the raw Brier exactly (within-bin variance is the
    documented gap).  One per-user rollup, one rank window, a 10-bin
    fold."""
    ev = _t(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.sum(
            F.when(F.col("event_type").isin("click", "view"), 1).otherwise(
                0
            )
        )
        .cast("double")
        .alias("engagement"),
        F.sum(
            F.when(F.col("event_type") == "purchase", F.col("value"))
            .otherwise(0.0)
        ).alias("spend"),
    )
    med = u.agg(F.expr("percentile(spend, 0.5)").alias("ms"))
    wall = Window.partitionBy()
    scored = u.crossJoin(F.broadcast(med)).select(
        (
            F.row_number()
            .over(Window.orderBy("engagement", "user_id"))
            .cast("double")
            / F.count(F.lit(1)).over(wall)
        ).alias("p"),
        F.when(F.col("spend") > F.col("ms"), 1.0).otherwise(0.0).alias(
            "o"
        ),
    )
    binned = scored.select(
        F.least(F.floor(F.col("p") * 10).cast("bigint"), F.lit(9)).alias(
            "bin"
        ),
        "p",
        "o",
    )
    bins = binned.groupBy("bin").agg(
        F.count(F.lit(1)).cast("double").alias("nk"),
        F.avg("p").alias("pk"),
        F.avg("o").alias("ok"),
    )
    tot = bins.agg(
        F.sum("nk").alias("n"),
        (F.sum(F.col("nk") * F.col("ok")) / F.sum("nk")).alias("obar"),
    )
    parts = bins.crossJoin(F.broadcast(tot)).agg(
        (
            F.sum(F.col("nk") * F.pow(F.col("pk") - F.col("ok"), 2))
            / F.max("n")
        ).alias("rel"),
        (
            F.sum(F.col("nk") * F.pow(F.col("ok") - F.col("obar"), 2))
            / F.max("n")
        ).alias("res"),
        (F.max("obar") * (1 - F.max("obar"))).alias("unc"),
    )
    brier = scored.agg(
        F.avg(F.pow(F.col("p") - F.col("o"), 2)).alias("bs")
    )
    return brier.crossJoin(F.broadcast(parts)).select(
        F.round("bs", 6).alias("brier_score"),
        F.round("rel", 6).alias("reliability"),
        F.round("res", 6).alias("resolution"),
        F.round("unc", 6).alias("uncertainty"),
        F.round(
            F.col("rel") - F.col("res") + F.col("unc"), 6
        ).alias("decomposed_brier"),
    )


@register(
    "q462_cohens_d_league",
    """
    WITH s AS (
      SELECT p.p_brand AS brand,
             CASE WHEN l.l_discount >= 0.05 THEN 1 ELSE 0 END AS disc,
             COUNT(*)::DOUBLE AS n, AVG(l.l_quantity) AS m,
             VAR_SAMP(l.l_quantity) AS v
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY 1, 2
    ),
    d AS (
      SELECT a.brand, a.n AS na, b.n AS nb,
             (a.m - b.m)
             / SQRT(((a.n - 1) * a.v + (b.n - 1) * b.v)
                    / (a.n + b.n - 2)) AS cd
      FROM s a JOIN s b ON a.brand = b.brand
                        AND a.disc = 1 AND b.disc = 0
    )
    SELECT brand,
           CAST(na AS BIGINT) AS n_discounted,
           CAST(nb AS BIGINT) AS n_full_price,
           ROUND(cd, 6) AS cohens_d,
           ROUND(cd * (1 - 3 / (4 * (na + nb) - 9)), 6) AS hedges_g
    FROM d
    ORDER BY ABS(cd) DESC, brand
    LIMIT 10
    """,
)
def q462_cohens_d_league(spark, sf_dir):
    """Effect-size league table: Cohen's d (pooled-SD standardized
    mean difference) of discounted-vs-full-price quantity per brand,
    with the Hedges small-sample correction — the magnitude ranking
    that q419's BH-FDR p-values deliberately don't give (at large n
    everything is significant; d says which effects are WORTH
    acting on).  Same one-scan grouped sufficient statistics as the
    test queries; the league is a 25-row sort."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    s = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.when(F.col("l_discount") >= 0.05, 1).otherwise(0).alias(
                "disc"
            ),
        )
        .agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            F.avg("l_quantity").alias("m"),
            F.var_samp("l_quantity").alias("v"),
        )
    )
    a = s.filter(F.col("disc") == 1).select(
        "brand",
        F.col("n").alias("na"),
        F.col("m").alias("ma"),
        F.col("v").alias("va"),
    )
    b = s.filter(F.col("disc") == 0).select(
        F.col("brand").alias("brand_b"),
        F.col("n").alias("nb"),
        F.col("m").alias("mb"),
        F.col("v").alias("vb"),
    )
    pooled = F.sqrt(
        (
            (F.col("na") - 1) * F.col("va")
            + (F.col("nb") - 1) * F.col("vb")
        )
        / (F.col("na") + F.col("nb") - 2)
    )
    cd = (F.col("ma") - F.col("mb")) / pooled
    d = a.join(b, a.brand == b.brand_b).select(
        "brand", "na", "nb", cd.alias("cd")
    )
    return (
        d.select(
            "brand",
            F.col("na").cast("bigint").alias("n_discounted"),
            F.col("nb").cast("bigint").alias("n_full_price"),
            F.round("cd", 6).alias("cohens_d"),
            F.round(
                F.col("cd")
                * (1 - 3 / (4 * (F.col("na") + F.col("nb")) - 9)),
                6,
            ).alias("hedges_g"),
            F.abs(F.col("cd")).alias("_a"),
        )
        .orderBy(F.col("_a").desc(), "brand")
        .limit(10)
        .drop("_a")
    )


@register(
    "q463_error_metric_suite",
    """
    WITH monthly AS (
      SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS mth,
             SUM(o_totalprice) AS y
      FROM orders GROUP BY 1
    ),
    fc AS (
      SELECT mth, y,
             LAG(y, 12) OVER (ORDER BY mth) AS yhat,
             ABS(y - LAG(y, 1) OVER (ORDER BY mth)) AS naive1_ae
      FROM monthly
    ),
    scored AS (
      SELECT y, yhat, ABS(y - yhat) AS ae,
             (SELECT AVG(naive1_ae) FROM fc
              WHERE naive1_ae IS NOT NULL) AS mae_naive1
      FROM fc WHERE yhat IS NOT NULL
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_months,
           ROUND(AVG(ae / ABS(y)), 6) AS mape,
           ROUND(SUM(ae) / SUM(ABS(y)), 6) AS wape,
           ROUND(AVG(2 * ae / (ABS(y) + ABS(yhat))), 6) AS smape,
           ROUND(SQRT(AVG(ae * ae)), 4) AS rmse,
           ROUND(AVG(ae) / MAX(mae_naive1), 6) AS mase
    FROM scored
    """,
)
def q463_error_metric_suite(spark, sf_dir):
    """The forecast error-metric suite evaluated on one seasonal-naive
    (lag-12) forecast of monthly revenue: MAPE, WAPE, sMAPE, RMSE and
    MASE side by side — q302 reports MAPE alone, but on skewed series
    MAPE and WAPE diverge hard (MAPE over-weights small months), and
    MASE > 1 is the 'worse than naive-1' red flag that percentage
    metrics can hide entirely.  Two lag windows over the 80-month
    aggregate and one fold."""
    od = _t(spark, sf_dir, "orders")
    monthly = od.groupBy(
        F.to_date(F.date_trunc("MONTH", "o_orderdate")).alias("mth")
    ).agg(F.sum("o_totalprice").alias("y"))
    w = Window.orderBy("mth")
    fc = monthly.select(
        "y",
        F.lag("y", 12).over(w).alias("yhat"),
        F.abs(F.col("y") - F.lag("y", 1).over(w)).alias("naive1_ae"),
    )
    mae1 = fc.filter(F.col("naive1_ae").isNotNull()).agg(
        F.avg("naive1_ae").alias("mae_naive1")
    )
    scored = (
        fc.filter(F.col("yhat").isNotNull())
        .crossJoin(F.broadcast(mae1))
        .select(
            "y",
            "yhat",
            F.abs(F.col("y") - F.col("yhat")).alias("ae"),
            "mae_naive1",
        )
    )
    return scored.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_months"),
        F.round(F.avg(F.col("ae") / F.abs(F.col("y"))), 6).alias("mape"),
        F.round(F.sum("ae") / F.sum(F.abs(F.col("y"))), 6).alias("wape"),
        F.round(
            F.avg(
                2 * F.col("ae") / (F.abs(F.col("y")) + F.abs(F.col("yhat")))
            ),
            6,
        ).alias("smape"),
        F.round(F.sqrt(F.avg(F.col("ae") * F.col("ae"))), 4).alias(
            "rmse"
        ),
        F.round(F.avg("ae") / F.max("mae_naive1"), 6).alias("mase"),
    )


@register(
    "q464_pinball_loss",
    """
    WITH daily AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
             SUM(o_totalprice) AS rev
      FROM orders GROUP BY 1
    ),
    seq AS (
      SELECT day, rev,
             ROW_NUMBER() OVER (ORDER BY day) AS rn,
             COUNT(*) OVER () AS n
      FROM daily
    ),
    train AS (
      SELECT quantile_cont(rev, 0.1) AS q10,
             quantile_cont(rev, 0.5) AS q50,
             quantile_cont(rev, 0.9) AS q90
      FROM seq WHERE rn <= n / 2
    ),
    test AS (
      SELECT s.rev, t.q10, t.q50, t.q90
      FROM seq s CROSS JOIN train t
      WHERE s.rn > s.n / 2
    ),
    folded AS (
      SELECT tau, fc,
             AVG(CASE WHEN rev >= fc THEN tau * (rev - fc)
                      ELSE (1 - tau) * (fc - rev) END) AS pinball,
             AVG(CASE WHEN rev <= fc THEN 1.0 ELSE 0 END) AS coverage
      FROM (
        SELECT rev, 0.1 AS tau, q10 AS fc FROM test
        UNION ALL
        SELECT rev, 0.5, q50 FROM test
        UNION ALL
        SELECT rev, 0.9, q90 FROM test
      )
      GROUP BY tau, fc
    )
    SELECT tau,
           ROUND(fc, 4) AS forecast,
           ROUND(pinball, 4) AS pinball_loss,
           ROUND(coverage, 6) AS coverage
    FROM folded
    """,
)
def q464_pinball_loss(spark, sf_dir):
    """Quantile-forecast evaluation with the pinball loss: train-half
    empirical q10/q50/q90 of daily revenue held constant over the
    test half, scored with the asymmetric loss each quantile is the
    Bayes answer to, plus realized coverage — the evaluation harness
    any quantile forecaster plugs into, and the reason 'predict the
    median' and 'predict the 90th' are different problems (q327's
    binned error audit has no notion of asymmetric cost).  One split
    by row number, three constant forecasts, one fold per τ."""
    od = _t(spark, sf_dir, "orders")
    daily = od.groupBy(
        F.to_date(F.date_trunc("DAY", "o_orderdate")).alias("day")
    ).agg(F.sum("o_totalprice").alias("rev"))
    seq = daily.select(
        "rev",
        F.row_number().over(Window.orderBy("day")).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    train = seq.filter(F.col("rn") <= F.col("n") / 2).agg(
        F.expr("percentile(rev, 0.1)").alias("q10"),
        F.expr("percentile(rev, 0.5)").alias("q50"),
        F.expr("percentile(rev, 0.9)").alias("q90"),
    )
    test = (
        seq.filter(F.col("rn") > F.col("n") / 2)
        .crossJoin(F.broadcast(train))
        .select("rev", "q10", "q50", "q90")
    )
    stacked = None
    for tau, col in ((0.1, "q10"), (0.5, "q50"), (0.9, "q90")):
        part = test.select(
            "rev",
            F.lit(tau).alias("tau"),
            F.col(col).alias("fc"),
        )
        stacked = part if stacked is None else stacked.unionByName(part)
    pin = F.when(
        F.col("rev") >= F.col("fc"),
        F.col("tau") * (F.col("rev") - F.col("fc")),
    ).otherwise((1 - F.col("tau")) * (F.col("fc") - F.col("rev")))
    return stacked.groupBy("tau", "fc").agg(
        F.round(F.avg(pin), 4).alias("pinball_loss"),
        F.round(
            F.avg(F.when(F.col("rev") <= F.col("fc"), 1.0).otherwise(0.0)),
            6,
        ).alias("coverage"),
    ).select(
        "tau",
        F.round("fc", 4).alias("forecast"),
        "pinball_loss",
        "coverage",
    )


@register(
    "q465_auc_confidence",
    """
    WITH u AS (
      SELECT user_id,
             SUM(CASE WHEN event_type IN ('click', 'view')
                      THEN 1 ELSE 0 END)::DOUBLE AS engagement,
             SUM(CASE WHEN event_type = 'purchase'
                      THEN value ELSE 0 END) AS spend
      FROM events GROUP BY user_id
    ),
    med AS (SELECT quantile_cont(spend, 0.5) AS ms FROM u),
    vals AS (
      SELECT u.engagement AS v,
             SUM(CASE WHEN u.spend > med.ms THEN 1 ELSE 0 END)::DOUBLE
               AS c1,
             COUNT(*)::DOUBLE AS ct
      FROM u CROSS JOIN med
      GROUP BY u.engagement
    ),
    r AS (
      SELECT v, c1, ct,
             SUM(ct) OVER (ORDER BY v) - ct AS cumbefore
      FROM vals
    ),
    s AS (
      SELECT SUM(c1 * (cumbefore + (ct + 1) / 2)) AS r1,
             SUM(c1) AS n1, SUM(ct - c1) AS n0
      FROM r
    ),
    auc AS (
      SELECT n1, n0,
             (r1 - n1 * (n1 + 1) / 2) / (n0 * n1) AS a
      FROM s
    )
    SELECT CAST(n1 AS BIGINT) AS n_pos,
           CAST(n0 AS BIGINT) AS n_neg,
           ROUND(a, 6) AS auc,
           ROUND(SQRT((a * (1 - a)
                 + (n1 - 1) * (a / (2 - a) - a * a)
                 + (n0 - 1) * (2 * a * a / (1 + a) - a * a))
                 / (n0 * n1)), 6) AS se,
           ROUND(a - 1.96 * SQRT((a * (1 - a)
                 + (n1 - 1) * (a / (2 - a) - a * a)
                 + (n0 - 1) * (2 * a * a / (1 + a) - a * a))
                 / (n0 * n1)), 6) AS ci_lo,
           ROUND(a + 1.96 * SQRT((a * (1 - a)
                 + (n1 - 1) * (a / (2 - a) - a * a)
                 + (n0 - 1) * (2 * a * a / (1 + a) - a * a))
                 / (n0 * n1)), 6) AS ci_hi
    FROM auc
    """,
)
def q465_auc_confidence(spark, sf_dir):
    """AUC-ROC with a Hanley-McNeil confidence interval for the
    engagement→high-spend ranking: the AUC comes from the tie-
    corrected rank-sum identity (AUC = U/(n₀n₁), average ranks off
    the distinct-VALUE histogram as in q421), and the SE from the
    Q₁/Q₂ closed forms — so 'AUC 0.71' ships with the ±0.05 that
    says whether it beats yesterday's 0.68 at all.  q241 reports the
    point estimate; this is the inferential version, still one
    grouped scan plus a histogram window."""
    ev = _t(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.sum(
            F.when(F.col("event_type").isin("click", "view"), 1).otherwise(
                0
            )
        )
        .cast("double")
        .alias("engagement"),
        F.sum(
            F.when(F.col("event_type") == "purchase", F.col("value"))
            .otherwise(0.0)
        ).alias("spend"),
    )
    med = u.agg(F.expr("percentile(spend, 0.5)").alias("ms"))
    vals = (
        u.crossJoin(F.broadcast(med))
        .groupBy(F.col("engagement").alias("v"))
        .agg(
            F.sum(
                F.when(F.col("spend") > F.col("ms"), 1).otherwise(0)
            )
            .cast("double")
            .alias("c1"),
            F.count(F.lit(1)).cast("double").alias("ct"),
        )
    )
    wc = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    r = vals.select(
        "c1",
        "ct",
        (F.sum("ct").over(wc) - F.col("ct")).alias("cumbefore"),
    )
    s = r.agg(
        F.sum(
            F.col("c1") * (F.col("cumbefore") + (F.col("ct") + 1) / 2)
        ).alias("r1"),
        F.sum("c1").alias("n1"),
        F.sum(F.col("ct") - F.col("c1")).alias("n0"),
    )
    n1, n0 = F.col("n1"), F.col("n0")
    a = (F.col("r1") - n1 * (n1 + 1) / 2) / (n0 * n1)
    auc = s.select(n1.alias("n1"), n0.alias("n0"), a.alias("a"))
    av = F.col("a")
    se = F.sqrt(
        (
            av * (1 - av)
            + (n1 - 1) * (av / (2 - av) - av * av)
            + (n0 - 1) * (2 * av * av / (1 + av) - av * av)
        )
        / (n0 * n1)
    )
    return auc.select(
        n1.cast("bigint").alias("n_pos"),
        n0.cast("bigint").alias("n_neg"),
        F.round(av, 6).alias("auc"),
        F.round(se, 6).alias("se"),
        F.round(av - 1.96 * se, 6).alias("ci_lo"),
        F.round(av + 1.96 * se, 6).alias("ci_hi"),
    )


@register(
    "q466_goodman_kruskal_gamma",
    """
    WITH ranked AS (
      SELECT CAST(SUBSTR(o_orderpriority, 1, 1) AS BIGINT) AS pr,
             NTILE(4) OVER (ORDER BY o_totalprice, o_orderkey) AS vq
      FROM orders
    ),
    cells AS (
      SELECT pr, vq, COUNT(*)::DOUBLE AS n
      FROM ranked GROUP BY pr, vq
    ),
    pairs AS (
      SELECT SUM(CASE WHEN (a.pr < b.pr AND a.vq < b.vq)
                        OR (a.pr > b.pr AND a.vq > b.vq)
                      THEN a.n * b.n ELSE 0 END) / 2 AS c,
             SUM(CASE WHEN (a.pr < b.pr AND a.vq > b.vq)
                        OR (a.pr > b.pr AND a.vq < b.vq)
                      THEN a.n * b.n ELSE 0 END) / 2 AS d
      FROM cells a CROSS JOIN cells b
    )
    SELECT CAST(c AS BIGINT) AS concordant_pairs,
           CAST(d AS BIGINT) AS discordant_pairs,
           ROUND((c - d) / (c + d), 6) AS gamma
    FROM pairs
    """,
)
def q466_goodman_kruskal_gamma(spark, sf_dir):
    """Goodman-Kruskal gamma between order PRIORITY (ordinal 1..5)
    and order-value quartile: concordant vs discordant pairs,
    computed from the 5×4 CONTINGENCY cells (nᵢⱼ·nᵢ'ⱼ' products over
    the 400 cell pairs) rather than the n² row pairs — the ordinal
    association measure for categorical-but-ordered columns where
    Pearson (q252) assumes intervals and Cramér's V (q443) throws the
    ordering away.  Gamma ignores ties entirely, the right default
    for coarse ordinal scales."""
    od = _t(spark, sf_dir, "orders")
    ranked = od.select(
        F.substring("o_orderpriority", 1, 1).cast("bigint").alias("pr"),
        F.ntile(4)
        .over(Window.orderBy("o_totalprice", "o_orderkey"))
        .alias("vq"),
    )
    cells = ranked.groupBy("pr", "vq").agg(
        F.count(F.lit(1)).cast("double").alias("n")
    )
    a, b = cells.alias("a"), cells.alias("b")
    conc = (
        (F.col("a.pr") < F.col("b.pr")) & (F.col("a.vq") < F.col("b.vq"))
    ) | (
        (F.col("a.pr") > F.col("b.pr")) & (F.col("a.vq") > F.col("b.vq"))
    )
    disc = (
        (F.col("a.pr") < F.col("b.pr")) & (F.col("a.vq") > F.col("b.vq"))
    ) | (
        (F.col("a.pr") > F.col("b.pr")) & (F.col("a.vq") < F.col("b.vq"))
    )
    prod = F.col("a.n") * F.col("b.n")
    pairs = a.crossJoin(b).agg(
        (F.sum(F.when(conc, prod).otherwise(0.0)) / 2).alias("c"),
        (F.sum(F.when(disc, prod).otherwise(0.0)) / 2).alias("d"),
    )
    c, dd = F.col("c"), F.col("d")
    return pairs.select(
        c.cast("bigint").alias("concordant_pairs"),
        dd.cast("bigint").alias("discordant_pairs"),
        F.round((c - dd) / (c + dd), 6).alias("gamma"),
    )


@register(
    "q467_zipf_mandelbrot_grid",
    r"""
    WITH v AS (
      SELECT w, COUNT(*)::DOUBLE AS cnt
      FROM (
        SELECT UNNEST(list_filter(
                 string_split_regex(trim(lower(text)), '\s+'),
                 x -> x <> '')) AS w
        FROM documents
      ) GROUP BY w
    ),
    ranked AS (
      SELECT LN(cnt) AS lf,
             CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, w) AS DOUBLE)
               AS r
      FROM v QUALIFY ROW_NUMBER() OVER (ORDER BY cnt DESC, w) <= 1000
    ),
    grid AS (
      SELECT CAST(s.s AS DOUBLE) AS s, CAST(q.q AS DOUBLE) AS q FROM
        (VALUES (0.8), (0.9), (1.0), (1.1), (1.2)) AS s(s),
        (VALUES (0.0), (1.0), (2.0), (3.0), (5.0)) AS q(q)
    ),
    fit AS (
      SELECT g.s, g.q,
             AVG(rk.lf + g.s * LN(rk.r + g.q)) AS logc
      FROM ranked rk CROSS JOIN grid g
      GROUP BY g.s, g.q
    )
    SELECT f.s AS zipf_s,
           f.q AS mandelbrot_q,
           ROUND(f.logc, 6) AS log_c,
           ROUND(SUM(POWER(rk.lf
                 - (f.logc - f.s * LN(rk.r + f.q)), 2)), 6) AS sse
    FROM ranked rk CROSS JOIN fit f
    GROUP BY f.s, f.q, f.logc
    """,
)
def q467_zipf_mandelbrot_grid(spark, sf_dir):
    """Zipf-Mandelbrot grid fit over the top-1000 vocabulary:
    ln f = ln C − s·ln(r+q) evaluated on a 5×5 (s, q) grid, with the
    intercept C closed-form per cell and the SSE surface reported for
    all 25 candidates — the Mandelbrot shift q is what fixes plain
    Zipf's (q226) systematic head misfit, and the full surface shows
    WHERE the fit is sensitive (flat valley → parameters barely
    identified).  Grid search as a 25-row broadcast cross join; two
    passes over the 1000-row ranked vocab."""
    d = _t(spark, sf_dir, "documents")
    toks = F.filter(
        F.split(F.trim(F.lower(F.col("text"))), r"\s+"),
        lambda w: w != "",
    )
    v = (
        d.select(F.explode(toks).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("double").alias("cnt"))
    )
    ranked = (
        v.select(
            F.log("cnt").alias("lf"),
            F.row_number()
            .over(Window.orderBy(F.col("cnt").desc(), "w"))
            .cast("double")
            .alias("r"),
        )
        .filter(F.col("r") <= 1000)
    )
    grid = d.sparkSession.createDataFrame(
        [
            (s, q)
            for s in (0.8, 0.9, 1.0, 1.1, 1.2)
            for q in (0.0, 1.0, 2.0, 3.0, 5.0)
        ],
        "s double, q double",
    )
    fit = (
        ranked.crossJoin(F.broadcast(grid))
        .groupBy("s", "q")
        .agg(
            F.avg(
                F.col("lf") + F.col("s") * F.log(F.col("r") + F.col("q"))
            ).alias("logc")
        )
    )
    resid = F.col("lf") - (
        F.col("logc") - F.col("s") * F.log(F.col("r") + F.col("q"))
    )
    return (
        ranked.crossJoin(F.broadcast(fit))
        .groupBy("s", "q", "logc")
        .agg(F.round(F.sum(F.pow(resid, 2)), 6).alias("sse"))
        .select(
            F.col("s").alias("zipf_s"),
            F.col("q").alias("mandelbrot_q"),
            F.round("logc", 6).alias("log_c"),
            "sse",
        )
    )


@register(
    "q468_silhouette_lite",
    """
    WITH dims AS (
      SELECT vec_id, label, i, embedding[i] AS x
      FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS t(i)
    ),
    cent AS (
      SELECT label AS clabel, i, AVG(x) AS cx
      FROM dims GROUP BY label, i
    ),
    dist AS (
      SELECT d.vec_id, d.label, c.clabel,
             SQRT(SUM(POWER(d.x - c.cx, 2))) AS dst
      FROM dims d JOIN cent c ON d.i = c.i
      GROUP BY d.vec_id, d.label, c.clabel
    ),
    ab AS (
      SELECT vec_id, label,
             MAX(CASE WHEN clabel = label THEN dst END) AS a,
             MIN(CASE WHEN clabel <> label THEN dst END) AS b
      FROM dist GROUP BY vec_id, label
    )
    SELECT CAST(label AS BIGINT) AS label,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           ROUND(AVG((b - a) / GREATEST(a, b)), 4)
             AS mean_silhouette,
           ROUND(AVG(a), 4) AS mean_dist_own,
           ROUND(AVG(b), 4) AS mean_dist_nearest
    FROM ab GROUP BY label
    """,
)
def q468_silhouette_lite(spark, sf_dir):
    """Centroid silhouette per embedding class: for each vector, a =
    distance to its OWN class centroid, b = distance to the nearest
    OTHER centroid, s = (b−a)/max(a,b), averaged per label — the
    cluster-quality score whose full version is O(n²) pairwise but
    whose centroid variant is one vec×centroid join (n·k distances),
    the only formulation that survives 100 TB.  Complements q385's
    class-separation ratio with a PER-CLASS verdict (which labels
    bleed into which).  Dimension explosion → per-dim centroid agg →
    distance re-agg, all hash joins on (dim) and (vec)."""
    e = _t(spark, sf_dir, "embeddings")
    dims = e.select(
        "vec_id", "label", F.posexplode("embedding").alias("i", "x")
    )
    cent = dims.groupBy(
        F.col("label").alias("clabel"), "i"
    ).agg(F.avg("x").alias("cx"))
    dist = (
        dims.join(cent, "i")
        .groupBy("vec_id", "label", "clabel")
        .agg(
            F.sqrt(F.sum(F.pow(F.col("x") - F.col("cx"), 2))).alias(
                "dst"
            )
        )
    )
    ab = dist.groupBy("vec_id", "label").agg(
        F.max(
            F.when(F.col("clabel") == F.col("label"), F.col("dst"))
        ).alias("a"),
        F.min(
            F.when(F.col("clabel") != F.col("label"), F.col("dst"))
        ).alias("b"),
    )
    sil = (F.col("b") - F.col("a")) / F.greatest(F.col("a"), F.col("b"))
    return ab.groupBy(F.col("label").cast("bigint").alias("label")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
        F.round(F.avg(sil), 4).alias("mean_silhouette"),
        F.round(F.avg("a"), 4).alias("mean_dist_own"),
        F.round(F.avg("b"), 4).alias("mean_dist_nearest"),
    )


@register(
    "q469_srm_check",
    f"""
    WITH b AS (
      SELECT {_MD5_BUCKET.format(col='doc_id', seed=1)} AS bk
      FROM documents
    ),
    counts AS (
      SELECT SUM(CASE WHEN bk < 800000 THEN 1 ELSE 0 END)::DOUBLE
               AS n_train,
             SUM(CASE WHEN bk >= 800000 AND bk < 900000
                      THEN 1 ELSE 0 END)::DOUBLE AS n_val,
             SUM(CASE WHEN bk >= 900000 THEN 1 ELSE 0 END)::DOUBLE
               AS n_test,
             COUNT(*)::DOUBLE AS n
      FROM b
    )
    SELECT CAST(n AS BIGINT) AS n_total,
           CAST(n_train AS BIGINT) AS n_train,
           CAST(n_val AS BIGINT) AS n_val,
           CAST(n_test AS BIGINT) AS n_test,
           ROUND(POWER(n_train - 0.8 * n, 2) / (0.8 * n)
                 + POWER(n_val - 0.1 * n, 2) / (0.1 * n)
                 + POWER(n_test - 0.1 * n, 2) / (0.1 * n), 4)
             AS chi2_srm,
           ROUND(GREATEST(ABS(n_train / n - 0.8),
                          ABS(n_val / n - 0.1),
                          ABS(n_test / n - 0.1)), 6) AS max_abs_dev
    FROM counts
    """,
)
def q469_srm_check(spark, sf_dir):
    """Sample-ratio-mismatch check on the 80/10/10 md5 hash split
    (q80's splitter): chi² of observed split counts against the
    declared ratios, dof 2 — the first thing to run on ANY
    experiment or split pipeline, because a biased assignment
    invalidates everything downstream and SRM is how you catch
    hash-collision bugs, key skew, or a filter applied to one arm.
    Here it doubles as a deterministic audit of the splitter itself.
    One hash scan, a three-cell fold."""
    d = _t(spark, sf_dir, "documents").select("doc_id")
    train, val, test = SMP.hash_split(
        d, "doc_id", [0.8, 0.1, 0.1], seed=1, hash_fn="md5"
    )
    counts = None
    for name, frame in (("n_train", train), ("n_val", val), ("n_test", test)):
        c = frame.agg(F.count(F.lit(1)).cast("double").alias(name))
        counts = c if counts is None else counts.crossJoin(c)
    counts = counts.withColumn(
        "n", F.col("n_train") + F.col("n_val") + F.col("n_test")
    )
    n = F.col("n")
    chi2 = (
        F.pow(F.col("n_train") - 0.8 * n, 2) / (0.8 * n)
        + F.pow(F.col("n_val") - 0.1 * n, 2) / (0.1 * n)
        + F.pow(F.col("n_test") - 0.1 * n, 2) / (0.1 * n)
    )
    return counts.select(
        n.cast("bigint").alias("n_total"),
        F.col("n_train").cast("bigint").alias("n_train"),
        F.col("n_val").cast("bigint").alias("n_val"),
        F.col("n_test").cast("bigint").alias("n_test"),
        F.round(chi2, 4).alias("chi2_srm"),
        F.round(
            F.greatest(
                F.abs(F.col("n_train") / n - 0.8),
                F.abs(F.col("n_val") / n - 0.1),
                F.abs(F.col("n_test") / n - 0.1),
            ),
            6,
        ).alias("max_abs_dev"),
    )


@register(
    "q470_pit_uniformity",
    """
    WITH cust AS (
      SELECT LN(SUM(o_totalprice)) AS lx
      FROM orders GROUP BY o_custkey
    ),
    fit AS (
      SELECT AVG(lx) AS mu, STDDEV_SAMP(lx) AS sigma FROM cust
    ),
    z AS (
      SELECT (c.lx - f.mu) / f.sigma AS zv
      FROM cust c CROSS JOIN fit f
    ),
    pit AS (
      SELECT 0.5 * (1 + (CASE WHEN zv < 0 THEN -1 ELSE 1 END)
             * (1 - (((((1.061405429
                 * (1 / (1 + 0.3275911 * (ABS(zv) / SQRT(2))))
                 - 1.453152027)
                 * (1 / (1 + 0.3275911 * (ABS(zv) / SQRT(2))))
                 + 1.421413741)
                 * (1 / (1 + 0.3275911 * (ABS(zv) / SQRT(2))))
                 - 0.284496736)
                 * (1 / (1 + 0.3275911 * (ABS(zv) / SQRT(2))))
                 + 0.254829592)
                 * (1 / (1 + 0.3275911 * (ABS(zv) / SQRT(2))))
                 * EXP(-(ABS(zv) / SQRT(2)) * (ABS(zv) / SQRT(2))))))
               AS u
      FROM z
    ),
    bins AS (
      SELECT LEAST(GREATEST(CAST(FLOOR(ROUND(u, 6) * 10) AS BIGINT),
                            0), 9) AS bin,
             COUNT(*)::DOUBLE AS o
      FROM pit GROUP BY 1
    ),
    tot AS (SELECT SUM(o) AS n FROM bins)
    SELECT CAST(MAX(tot.n) AS BIGINT) AS n_customers,
           CAST(COUNT(*) AS BIGINT) AS n_bins,
           ROUND(SUM(POWER(bins.o - tot.n / 10, 2) / (tot.n / 10)), 4)
             AS chi2_uniform,
           ROUND(MAX(bins.o) / MAX(tot.n), 6) AS max_bin_share,
           ROUND(MIN(bins.o) / MAX(tot.n), 6) AS min_bin_share
    FROM bins CROSS JOIN tot
    """,
)
def q470_pit_uniformity(spark, sf_dir):
    """Probability-integral-transform check of q315's lognormal spend
    model: push every customer's ln-spend through the FITTED normal
    CDF (A-S erf polynomial, sign-extended for negative z — identical
    arithmetic in both engines) and chi²-test the resulting u-values
    against uniform(0,1) over 10 bins — the universal goodness-of-fit
    harness that works for ANY continuous parametric model, not just
    this one (swap the CDF, keep the plan).  If the model is right,
    PIT is flat; humps at the ends mean heavy tails the lognormal
    missed.  One grouped scan, broadcast fit, 10-bin fold."""
    od = _t(spark, sf_dir, "orders")
    cust = od.groupBy("o_custkey").agg(
        F.log(F.sum("o_totalprice")).alias("lx")
    )
    fit = cust.agg(
        F.avg("lx").alias("mu"), F.stddev_samp("lx").alias("sigma")
    )
    z = cust.crossJoin(F.broadcast(fit)).select(
        ((F.col("lx") - F.col("mu")) / F.col("sigma")).alias("zv")
    )
    x = F.abs(F.col("zv")) / F.sqrt(F.lit(2))
    t = F.lit(1) / (F.lit(1) + F.lit(0.3275911) * x)
    erf = (
        (
            (
                (
                    (F.lit(1.061405429) * t - F.lit(1.453152027)) * t
                    + F.lit(1.421413741)
                )
                * t
                - F.lit(0.284496736)
            )
            * t
            + F.lit(0.254829592)
        )
        * t
        * F.exp(-x * x)
    )
    sign = F.when(F.col("zv") < 0, -1.0).otherwise(1.0)
    # `erf` above is the A-S complement (poly·e^(−x²)); true erf is
    # 1 − that.
    pit = z.select(
        (F.lit(0.5) * (F.lit(1) + sign * (F.lit(1) - erf))).alias("u")
    )
    # Round u to 6 dp before binning: the engines' exp() differ in the
    # last ulp, so raw edge values (incl. the saturated u=0 tail) can
    # flip bins between Spark and the oracle.
    bins = pit.groupBy(
        F.least(
            F.greatest(
                F.floor(F.round(F.col("u"), 6) * 10).cast("bigint"),
                F.lit(0),
            ),
            F.lit(9),
        ).alias("bin")
    ).agg(F.count(F.lit(1)).cast("double").alias("o"))
    tot = bins.agg(F.sum("o").alias("n"))
    n = F.max("n")
    return bins.crossJoin(F.broadcast(tot)).agg(
        n.cast("bigint").alias("n_customers"),
        F.count(F.lit(1)).cast("bigint").alias("n_bins"),
        F.round(
            F.sum(
                F.pow(F.col("o") - F.col("n") / 10, 2)
                / (F.col("n") / 10)
            ),
            4,
        ).alias("chi2_uniform"),
        F.round(F.max("o") / n, 6).alias("max_bin_share"),
        F.round(F.min("o") / n, 6).alias("min_bin_share"),
    )


@register(
    "q471_bloom_join_effectiveness",
    f"""
    WITH thr AS (
      SELECT quantile_cont(o_totalprice, 0.9) AS p90 FROM orders
    ),
    qual AS (
      SELECT o.o_orderkey,
             {_MD5_BUCKET.format(col='o.o_orderkey', seed=7)} % 8192
               AS bkt
      FROM orders o CROSS JOIN thr t
      WHERE o.o_totalprice > t.p90
    ),
    bits AS (SELECT DISTINCT bkt FROM qual),
    li AS (
      SELECT l_orderkey,
             {_MD5_BUCKET.format(col='l_orderkey', seed=7)} % 8192
               AS bkt
      FROM lineitem
    ),
    flags AS (
      SELECT CASE WHEN q.o_orderkey IS NOT NULL THEN 1 ELSE 0 END
               AS exact_hit,
             CASE WHEN b.bkt IS NOT NULL THEN 1 ELSE 0 END AS bloom_hit
      FROM li
      LEFT JOIN (SELECT DISTINCT o_orderkey FROM qual) q
        ON li.l_orderkey = q.o_orderkey
      LEFT JOIN bits b ON li.bkt = b.bkt
    )
    SELECT CAST((SELECT COUNT(*) FROM bits) AS BIGINT) AS bits_set,
           CAST(COUNT(*) AS BIGINT) AS li_rows,
           CAST(SUM(exact_hit) AS BIGINT) AS exact_pass,
           CAST(SUM(bloom_hit) AS BIGINT) AS bloom_pass,
           ROUND(CAST(SUM(bloom_hit) - SUM(exact_hit) AS DOUBLE)
                 / (COUNT(*) - SUM(exact_hit)), 6) AS false_pos_rate,
           ROUND(1 - CAST(SUM(bloom_hit) AS DOUBLE) / COUNT(*), 6)
             AS scan_reduction
    FROM flags
    """,
)
def q471_bloom_join_effectiveness(spark, sf_dir):
    """Runtime-filter (Bloom-style) join reduction, measured: build a
    single-hash 8192-bucket filter from the top-decile orders, probe
    every lineitem row, and compare against the exact semi-join —
    observed false-positive rate and the fraction of the fact scan
    the filter would eliminate before the shuffle.  This is the
    arithmetic behind Spark's own
    `spark.sql.optimizer.runtimeFilter.bloomFilter` decision: at
    100 TB the filter's bits broadcast for free and every skipped row
    is shuffle traffic saved; a measured FPR near the m/n theory
    (here 1.5k keys into 8k buckets ≈ 17%) validates the sizing.
    The md5 bucket keeps both engines bit-identical."""
    od = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    thr = od.agg(F.expr("percentile(o_totalprice, 0.9)").alias("p90"))
    bkt = lambda c: (
        F.conv(F.substring(F.md5(F.concat_ws(":", c.cast("string"), F.lit("7"))), 1, 15), 16, 10)
        .cast("bigint")
        % 1000000
    ) % 8192
    qual = (
        od.crossJoin(F.broadcast(thr))
        .filter(F.col("o_totalprice") > F.col("p90"))
        .select("o_orderkey", bkt(F.col("o_orderkey")).alias("bkt"))
    )
    bits = qual.select("bkt").distinct()
    keys = qual.select("o_orderkey").distinct()
    lib = li.select(
        "l_orderkey", bkt(F.col("l_orderkey")).alias("bkt")
    )
    flags = (
        lib.join(
            F.broadcast(keys), lib.l_orderkey == keys.o_orderkey, "left"
        )
        .join(
            F.broadcast(bits.withColumnRenamed("bkt", "bbkt")),
            lib.bkt == F.col("bbkt"),
            "left",
        )
        .select(
            F.when(F.col("o_orderkey").isNotNull(), 1)
            .otherwise(0)
            .alias("exact_hit"),
            F.when(F.col("bbkt").isNotNull(), 1).otherwise(0).alias(
                "bloom_hit"
            ),
        )
    )
    nbits = bits.agg(F.count(F.lit(1)).alias("bits_set"))
    eh, bh = F.sum("exact_hit"), F.sum("bloom_hit")
    return flags.crossJoin(F.broadcast(nbits)).agg(
        F.max("bits_set").cast("bigint").alias("bits_set"),
        F.count(F.lit(1)).cast("bigint").alias("li_rows"),
        eh.cast("bigint").alias("exact_pass"),
        bh.cast("bigint").alias("bloom_pass"),
        F.round(
            (bh - eh).cast("double") / (F.count(F.lit(1)) - eh), 6
        ).alias("false_pos_rate"),
        F.round(
            F.lit(1) - bh.cast("double") / F.count(F.lit(1)), 6
        ).alias("scan_reduction"),
    )


@register(
    "q472_partition_balance",
    f"""
    WITH maxk AS (
      SELECT MAX(l_orderkey) + 1 AS mk FROM lineitem
    ),
    assigned AS (
      SELECT 'hash' AS scheme,
             {_MD5_BUCKET.format(col='l_orderkey', seed=3)} % 32
               AS bucket
      FROM lineitem
      UNION ALL
      SELECT 'range',
             LEAST(CAST(l_orderkey * 32 // m.mk AS BIGINT), 31)
      FROM lineitem CROSS JOIN maxk m
    ),
    sizes AS (
      SELECT scheme, bucket, COUNT(*)::DOUBLE AS n
      FROM assigned GROUP BY scheme, bucket
    ),
    ranked AS (
      SELECT scheme, n,
             ROW_NUMBER() OVER (PARTITION BY scheme
                                ORDER BY n, bucket) AS i,
             COUNT(*) OVER (PARTITION BY scheme) AS k,
             SUM(n) OVER (PARTITION BY scheme) AS tot
      FROM sizes
    )
    SELECT scheme,
           CAST(MAX(k) AS BIGINT) AS n_buckets,
           ROUND(MIN(n) / MAX(tot), 6) AS min_share,
           ROUND(MAX(n) / MAX(tot), 6) AS max_share,
           ROUND(SUM((2 * i - k - 1) * n)
                 / (MAX(k) * MAX(tot)), 6) AS gini
    FROM ranked
    GROUP BY scheme
    """,
)
def q472_partition_balance(spark, sf_dir):
    """Partition-balance audit, hash vs range, 32 buckets on
    l_orderkey: per-scheme min/max bucket share and the Gini of
    bucket sizes (sorted-rank identity) — the number that predicts
    straggler tasks BEFORE a shuffle runs.  Hash partitioning should
    sit near Gini 0; range partitioning on fixed-width key spans
    inherits whatever non-uniformity the key distribution has (TPC-H
    orderkeys are deliberately gappy).  This is q178's skew report
    pointed at the PARTITIONER instead of the data, and the exact
    measurement the salted-join (q146) decision needs."""
    li = _t(spark, sf_dir, "lineitem")
    maxk = li.agg((F.max("l_orderkey") + 1).alias("mk"))
    hash_b = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":", F.col("l_orderkey").cast("string"), F.lit("3")
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("bigint")
        % 1000000
    ) % 32
    h = li.select(F.lit("hash").alias("scheme"), hash_b.alias("bucket"))
    r = li.crossJoin(F.broadcast(maxk)).select(
        F.lit("range").alias("scheme"),
        F.least(
            (F.col("l_orderkey") * 32 / F.col("mk")).cast("bigint"),
            F.lit(31),
        ).alias("bucket"),
    )
    sizes = (
        h.unionByName(r)
        .groupBy("scheme", "bucket")
        .agg(F.count(F.lit(1)).cast("double").alias("n"))
    )
    wp = Window.partitionBy("scheme")
    ranked = sizes.select(
        "scheme",
        "n",
        F.row_number()
        .over(Window.partitionBy("scheme").orderBy("n", "bucket"))
        .alias("i"),
        F.count(F.lit(1)).over(wp).alias("k"),
        F.sum("n").over(wp).alias("tot"),
    )
    return ranked.groupBy("scheme").agg(
        F.max("k").cast("bigint").alias("n_buckets"),
        F.round(F.min("n") / F.max("tot"), 6).alias("min_share"),
        F.round(F.max("n") / F.max("tot"), 6).alias("max_share"),
        F.round(
            F.sum((2 * F.col("i") - F.col("k") - 1) * F.col("n"))
            / (F.max("k") * F.max("tot")),
            6,
        ).alias("gini"),
    )


@register(
    "q473_path_census",
    """
    WITH e AS (
      SELECT DISTINCT LEAST(l_orderkey % 500, l_partkey % 500) AS a,
             GREATEST(l_orderkey % 500, l_partkey % 500) AS b
      FROM lineitem
      WHERE l_orderkey % 500 <> l_partkey % 500
    ),
    deg AS (
      SELECT v, COUNT(*)::DOUBLE AS d FROM (
        SELECT a AS v FROM e UNION ALL SELECT b FROM e
      ) GROUP BY v
    ),
    tri AS (
      SELECT COUNT(*)::DOUBLE AS t
      FROM e e1 JOIN e e2 ON e1.b = e2.a
                JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
    ),
    dd AS (
      SELECT SUM(d) AS sd, SUM(d * (d - 1) / 2) AS wedges,
             COUNT(*)::DOUBLE AS nv
      FROM deg
    ),
    epairs AS (
      SELECT SUM((da.d - 1) * (db.d - 1)) AS pe
      FROM e JOIN deg da ON e.a = da.v
             JOIN deg db ON e.b = db.v
    )
    SELECT CAST(dd.nv AS BIGINT) AS n_vertices,
           CAST(dd.sd / 2 AS BIGINT) AS n_edges,
           CAST(dd.wedges AS BIGINT) AS wedges,
           CAST(tri.t AS BIGINT) AS triangles,
           CAST(epairs.pe - 3 * tri.t AS BIGINT) AS paths3,
           ROUND(3 * tri.t / dd.wedges, 6) AS transitivity
    FROM dd CROSS JOIN tri CROSS JOIN epairs
    """,
)
def q473_path_census(spark, sf_dir):
    """Motif census by pure degree algebra on the mod-500 bipartite
    projection: wedges = ΣC(d,2), simple 3-paths = Σ_{(u,v)∈E}
    (dᵤ−1)(dᵥ−1) − 3·triangles, global transitivity = 3T/wedges —
    every count EXCEPT the triangle core comes from the degree table,
    no path enumeration anywhere (the identity is what makes motif
    statistics computable at 100 TB; enumerating 3-paths would be
    Σd² join rows).  Complements q124/q273 with the path-level
    numbers a null-model comparison needs."""
    li = _t(spark, sf_dir, "lineitem")
    s, t = F.col("l_orderkey") % 500, F.col("l_partkey") % 500
    e = (
        li.select(
            F.least(s, t).alias("a"), F.greatest(s, t).alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = (
        e.select(F.col("a").alias("v"))
        .unionByName(e.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).cast("double").alias("d"))
    )
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.b") == F.col("e2.a"))
        .join(
            e3,
            (F.col("e3.a") == F.col("e1.a"))
            & (F.col("e3.b") == F.col("e2.b")),
        )
        .agg(F.count(F.lit(1)).cast("double").alias("t"))
    )
    dd = deg.agg(
        F.sum("d").alias("sd"),
        F.sum(F.col("d") * (F.col("d") - 1) / 2).alias("wedges"),
        F.count(F.lit(1)).cast("double").alias("nv"),
    )
    da = deg.withColumnRenamed("v", "va").withColumnRenamed("d", "dda")
    db = deg.withColumnRenamed("v", "vb").withColumnRenamed("d", "ddb")
    epairs = (
        e.join(da, e.a == da.va)
        .join(db, e.b == db.vb)
        .agg(
            F.sum((F.col("dda") - 1) * (F.col("ddb") - 1)).alias("pe")
        )
    )
    return (
        dd.crossJoin(F.broadcast(tri))
        .crossJoin(F.broadcast(epairs))
        .select(
            F.col("nv").cast("bigint").alias("n_vertices"),
            (F.col("sd") / 2).cast("bigint").alias("n_edges"),
            F.col("wedges").cast("bigint").alias("wedges"),
            F.col("t").cast("bigint").alias("triangles"),
            (F.col("pe") - 3 * F.col("t"))
            .cast("bigint")
            .alias("paths3"),
            F.round(3 * F.col("t") / F.col("wedges"), 6).alias(
                "transitivity"
            ),
        )
    )


@register(
    "q474_rrf_fusion",
    """
    WITH u AS (
      SELECT user_id,
             SUM(CASE WHEN event_type IN ('click', 'view')
                      THEN 1 ELSE 0 END)::DOUBLE AS engagement,
             SUM(CASE WHEN event_type = 'purchase'
                      THEN value ELSE 0 END) AS spend
      FROM events GROUP BY user_id
    ),
    ranked AS (
      SELECT user_id,
             ROW_NUMBER() OVER (ORDER BY engagement DESC, user_id)
               AS r_eng,
             ROW_NUMBER() OVER (ORDER BY spend DESC, user_id)
               AS r_spend
      FROM u
    )
    SELECT user_id,
           CAST(r_eng AS BIGINT) AS rank_engagement,
           CAST(r_spend AS BIGINT) AS rank_spend,
           ROUND(1.0 / (60 + r_eng) + 1.0 / (60 + r_spend), 6)
             AS rrf_score
    FROM ranked
    ORDER BY 1.0 / (60 + r_eng) + 1.0 / (60 + r_spend) DESC, user_id
    LIMIT 10
    """,
)
def q474_rrf_fusion(spark, sf_dir):
    """Reciprocal-rank fusion of two user rankings (engagement and
    spend): RRF = Σ 1/(60+rankᵢ) — the retrieval-standard way to
    merge heterogeneous rankings WITHOUT calibrating their scores
    against each other (scores from different systems aren't
    comparable; ranks are).  k=60 damps the head so one list can't
    dominate.  Two rank windows over the per-user aggregate and a
    top-10; the same fusion pattern merges BM25 (q93) with cosine
    (q255) lists in a hybrid retriever."""
    ev = _t(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.sum(
            F.when(F.col("event_type").isin("click", "view"), 1).otherwise(
                0
            )
        )
        .cast("double")
        .alias("engagement"),
        F.sum(
            F.when(F.col("event_type") == "purchase", F.col("value"))
            .otherwise(0.0)
        ).alias("spend"),
    )
    ranked = u.select(
        "user_id",
        F.row_number()
        .over(Window.orderBy(F.col("engagement").desc(), "user_id"))
        .alias("r_eng"),
        F.row_number()
        .over(Window.orderBy(F.col("spend").desc(), "user_id"))
        .alias("r_spend"),
    )
    rrf = 1.0 / (60 + F.col("r_eng")) + 1.0 / (60 + F.col("r_spend"))
    return (
        ranked.select(
            "user_id",
            F.col("r_eng").cast("bigint").alias("rank_engagement"),
            F.col("r_spend").cast("bigint").alias("rank_spend"),
            F.round(rrf, 6).alias("rrf_score"),
            rrf.alias("_s"),
        )
        .orderBy(F.col("_s").desc(), "user_id")
        .limit(10)
        .drop("_s")
    )


@register(
    "q475_weighted_kappa",
    r"""
    WITH feat AS (
      SELECT NTILE(10) OVER (ORDER BY n_chars, doc_id) AS i,
             NTILE(10) OVER (
               ORDER BY len(list_filter(
                 string_split_regex(trim(text), '\s+'),
                 w -> w <> '')), doc_id) AS j
      FROM documents
    ),
    cells AS (
      SELECT i, j, COUNT(*)::DOUBLE AS o FROM feat GROUP BY i, j
    ),
    tot AS (SELECT SUM(o) AS n FROM cells),
    mi AS (SELECT i, SUM(o) AS ri FROM cells GROUP BY i),
    mj AS (SELECT j, SUM(o) AS cj FROM cells GROUP BY j),
    obs AS (
      SELECT SUM(POWER((c.i - c.j) / 9.0, 2) * c.o / t.n) AS do_w,
             SUM(CASE WHEN c.i <> c.j THEN c.o / t.n ELSE 0 END)
               AS do_u
      FROM cells c CROSS JOIN tot t
    ),
    exp_d AS (
      SELECT SUM(POWER((mi.i - mj.j) / 9.0, 2)
                 * mi.ri * mj.cj / (t.n * t.n)) AS de_w,
             SUM(CASE WHEN mi.i <> mj.j
                      THEN mi.ri * mj.cj / (t.n * t.n) ELSE 0 END)
               AS de_u
      FROM mi CROSS JOIN mj CROSS JOIN tot t
    )
    SELECT ROUND(1 - obs.do_w / exp_d.de_w, 6) AS weighted_kappa,
           ROUND(1 - obs.do_u / exp_d.de_u, 6) AS unweighted_kappa
    FROM obs CROSS JOIN exp_d
    """,
)
def q475_weighted_kappa(spark, sf_dir):
    """Quadratic-weighted kappa between two ORDINAL raters (character-
    length decile vs word-count decile): disagreement is weighted by
    ((i−j)/9)², so being one decile off costs 1/81 of being nine off —
    the agreement statistic for graded labels (quality tiers, star
    ratings) where q431's binary kappa wastes the ordering.  Both the
    observed and the chance disagreement come from the 10×10 cell
    table and its margins (a 100-row cross join), never the rows."""
    d = _t(spark, sf_dir, "documents")
    wc = F.size(
        F.filter(F.split(F.trim(F.col("text")), r"\s+"), lambda w: w != "")
    )
    feat = d.select(
        F.ntile(10).over(Window.orderBy("n_chars", "doc_id")).alias("i"),
        F.ntile(10).over(Window.orderBy(wc, F.col("doc_id"))).alias("j"),
    )
    cells = feat.groupBy("i", "j").agg(
        F.count(F.lit(1)).cast("double").alias("o")
    )
    tot = cells.agg(F.sum("o").alias("n"))
    mi = cells.groupBy("i").agg(F.sum("o").alias("ri"))
    mj = cells.groupBy("j").agg(F.sum("o").alias("cj"))
    wq = F.pow((F.col("i") - F.col("j")) / 9.0, 2)
    obs = cells.crossJoin(F.broadcast(tot)).agg(
        F.sum(wq * F.col("o") / F.col("n")).alias("do_w"),
        F.sum(
            F.when(
                F.col("i") != F.col("j"), F.col("o") / F.col("n")
            ).otherwise(0.0)
        ).alias("do_u"),
    )
    exp_d = (
        mi.crossJoin(mj)
        .crossJoin(F.broadcast(tot))
        .agg(
            F.sum(
                wq * F.col("ri") * F.col("cj") / (F.col("n") * F.col("n"))
            ).alias("de_w"),
            F.sum(
                F.when(
                    F.col("i") != F.col("j"),
                    F.col("ri") * F.col("cj") / (F.col("n") * F.col("n")),
                ).otherwise(0.0)
            ).alias("de_u"),
        )
    )
    return obs.crossJoin(F.broadcast(exp_d)).select(
        F.round(
            F.lit(1) - F.col("do_w") / F.col("de_w"), 6
        ).alias("weighted_kappa"),
        F.round(
            F.lit(1) - F.col("do_u") / F.col("de_u"), 6
        ).alias("unweighted_kappa"),
    )


@register(
    "q476_bullwhip_ratio",
    """
    WITH od AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
             SUM(o_totalprice) AS v
      FROM orders GROUP BY 1
    ),
    sh AS (
      SELECT CAST(date_trunc('day', l_shipdate) AS DATE) AS day,
             SUM(l_extendedprice * (1 - l_discount)) AS v
      FROM lineitem GROUP BY 1
    ),
    s AS (
      SELECT (SELECT VAR_SAMP(v) FROM od) AS vo,
             (SELECT AVG(v) FROM od) AS mo,
             (SELECT VAR_SAMP(v) FROM sh) AS vs,
             (SELECT AVG(v) FROM sh) AS ms
    )
    SELECT ROUND(vo, 2) AS var_order_value,
           ROUND(vs, 2) AS var_ship_value,
           ROUND(vs / vo, 4) AS variance_ratio,
           ROUND((vs / (ms * ms)) / (vo / (mo * mo)), 4)
             AS bullwhip_cv2_ratio
    FROM s
    """,
)
def q476_bullwhip_ratio(spark, sf_dir):
    """Bullwhip measurement between the demand signal (daily ordered
    value) and the fulfillment signal (daily shipped value): the raw
    variance ratio and the scale-free CV² ratio — a ratio above 1
    means the fulfillment process AMPLIFIES demand variability
    (batching, shortage gaming), the supply-chain instability whose
    stages this pair of tables actually records.  Two daily
    aggregates, four scalars."""
    od = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    odd = od.groupBy(
        F.to_date(F.date_trunc("DAY", "o_orderdate")).alias("day")
    ).agg(F.sum("o_totalprice").alias("v"))
    shd = li.groupBy(
        F.to_date(F.date_trunc("DAY", "l_shipdate")).alias("day")
    ).agg(
        F.sum(
            F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
        ).alias("v")
    )
    so = odd.agg(
        F.var_samp("v").alias("vo"), F.avg("v").alias("mo")
    )
    ss = shd.agg(
        F.var_samp("v").alias("vs"), F.avg("v").alias("ms")
    )
    s = so.crossJoin(F.broadcast(ss))
    return s.select(
        F.round("vo", 2).alias("var_order_value"),
        F.round("vs", 2).alias("var_ship_value"),
        F.round(F.col("vs") / F.col("vo"), 4).alias("variance_ratio"),
        F.round(
            (F.col("vs") / (F.col("ms") * F.col("ms")))
            / (F.col("vo") / (F.col("mo") * F.col("mo"))),
            4,
        ).alias("bullwhip_cv2_ratio"),
    )


@register(
    "q477_trading_day_adjustment",
    """
    WITH daily AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
             SUM(o_totalprice) AS rev
      FROM orders GROUP BY 1
    ),
    dow_mean AS (
      SELECT dayofweek(day) AS dow, AVG(rev) AS m
      FROM daily GROUP BY 1
    ),
    monthly AS (
      SELECT CAST(date_trunc('month', d.day) AS DATE) AS mth,
             SUM(d.rev) AS actual,
             SUM(w.m) AS expected,
             COUNT(*) AS n_days
      FROM daily d JOIN dow_mean w ON dayofweek(d.day) = w.dow
      GROUP BY 1
    ),
    ranked AS (
      SELECT mth, actual, expected,
             ROW_NUMBER() OVER (ORDER BY mth DESC) AS rk
      FROM monthly WHERE n_days >= 28
    )
    SELECT mth AS month,
           ROUND(actual, 2) AS actual,
           ROUND(expected, 2) AS expected,
           ROUND(actual / expected, 6) AS adjustment_index
    FROM ranked WHERE rk <= 12
    """,
)
def q477_trading_day_adjustment(spark, sf_dir):
    """Trading-day adjustment for the last 12 full months: each
    month's expected revenue is the sum of the GLOBAL day-of-week
    means over the weekdays that month actually contains, and the
    index actual/expected is month-over-month growth with the
    'this March had five Fridays' artifact removed — the calendar
    composition effect that raw monthly comparisons (q177) silently
    include.  One dow profile (7-row broadcast), one month rollup."""
    od = _t(spark, sf_dir, "orders")
    daily = od.groupBy(
        F.to_date(F.date_trunc("DAY", "o_orderdate")).alias("day")
    ).agg(F.sum("o_totalprice").alias("rev"))
    dow_mean = daily.groupBy(
        F.dayofweek("day").alias("dow")
    ).agg(F.avg("rev").alias("m"))
    monthly = (
        daily.withColumn("dow", F.dayofweek("day"))
        .join(F.broadcast(dow_mean), "dow")
        .groupBy(
            F.to_date(F.date_trunc("MONTH", "day")).alias("mth")
        )
        .agg(
            F.sum("rev").alias("actual"),
            F.sum("m").alias("expected"),
            F.count(F.lit(1)).alias("n_days"),
        )
        .filter(F.col("n_days") >= 28)
    )
    ranked = monthly.select(
        "mth",
        "actual",
        "expected",
        F.row_number()
        .over(Window.orderBy(F.col("mth").desc()))
        .alias("rk"),
    ).filter(F.col("rk") <= 12)
    return ranked.select(
        F.col("mth").alias("month"),
        F.round("actual", 2).alias("actual"),
        F.round("expected", 2).alias("expected"),
        F.round(F.col("actual") / F.col("expected"), 6).alias(
            "adjustment_index"
        ),
    )


@register(
    "q478_tost_equivalence",
    """
    WITH s AS (
      SELECT source, COUNT(*)::DOUBLE AS n, AVG(n_chars) AS m,
             VAR_SAMP(n_chars) AS v
      FROM documents WHERE source IN ('src0', 'src1')
      GROUP BY source
    ),
    w AS (
      SELECT a.m - b.m AS diff,
             SQRT(a.v / a.n + b.v / b.n) AS se,
             0.05 * (a.m * a.n + b.m * b.n) / (a.n + b.n) AS margin
      FROM s a JOIN s b ON a.source = 'src0' AND b.source = 'src1'
    )
    SELECT ROUND(diff, 4) AS mean_diff,
           ROUND(margin, 4) AS margin,
           ROUND(se, 4) AS se,
           ROUND((diff + margin) / se, 4) AS z_lower,
           ROUND((margin - diff) / se, 4) AS z_upper,
           CAST(CASE WHEN (diff + margin) / se > 1.645
                      AND (margin - diff) / se > 1.645
                     THEN 1 ELSE 0 END AS BIGINT) AS equivalent
    FROM w
    """,
)
def q478_tost_equivalence(spark, sf_dir):
    """TOST equivalence test between two sources' mean document
    lengths: two one-sided z-tests against a ±5%-of-grand-mean
    margin — the test that can conclude the sources are THE SAME,
    which q278's difference test can never do (failing to reject ≠
    equivalence; TOST requires the whole CI inside the margin).  The
    right gate for 'may I pool these two corpora'.  One grouped scan
    into two sufficient-statistics rows, scalar algebra after."""
    d = _t(spark, sf_dir, "documents").filter(
        F.col("source").isin("src0", "src1")
    )
    s = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.avg("n_chars").alias("m"),
        F.var_samp("n_chars").alias("v"),
    )
    a = s.filter(F.col("source") == "src0").select(
        F.col("n").alias("na"), F.col("m").alias("ma"),
        F.col("v").alias("va"),
    )
    b = s.filter(F.col("source") == "src1").select(
        F.col("n").alias("nb"), F.col("m").alias("mb"),
        F.col("v").alias("vb"),
    )
    w = a.crossJoin(b).select(
        (F.col("ma") - F.col("mb")).alias("diff"),
        F.sqrt(
            F.col("va") / F.col("na") + F.col("vb") / F.col("nb")
        ).alias("se"),
        (
            F.lit(0.05)
            * (F.col("ma") * F.col("na") + F.col("mb") * F.col("nb"))
            / (F.col("na") + F.col("nb"))
        ).alias("margin"),
    )
    zl = (F.col("diff") + F.col("margin")) / F.col("se")
    zu = (F.col("margin") - F.col("diff")) / F.col("se")
    return w.select(
        F.round("diff", 4).alias("mean_diff"),
        F.round("margin", 4).alias("margin"),
        F.round("se", 4).alias("se"),
        F.round(zl, 4).alias("z_lower"),
        F.round(zu, 4).alias("z_upper"),
        F.when((zl > 1.645) & (zu > 1.645), 1)
        .otherwise(0)
        .cast("bigint")
        .alias("equivalent"),
    )


@register(
    "q479_fleiss_kappa",
    r"""
    WITH feat AS (
      SELECT n_chars,
             len(list_filter(string_split_regex(trim(text), '\s+'),
                             w -> w <> '')) AS wc,
             CAST(n_chars AS DOUBLE)
             / len(list_filter(string_split_regex(trim(text), '\s+'),
                               w -> w <> '')) AS awl
      FROM documents
    ),
    med AS (
      SELECT quantile_cont(n_chars, 0.5) AS mc,
             quantile_cont(wc, 0.5) AS mw,
             quantile_cont(awl, 0.5) AS ma
      FROM feat
    ),
    votes AS (
      SELECT (CASE WHEN f.n_chars > m.mc THEN 1 ELSE 0 END
            + CASE WHEN f.wc > m.mw THEN 1 ELSE 0 END
            + CASE WHEN f.awl > m.ma THEN 1 ELSE 0 END) AS x
      FROM feat f CROSS JOIN med m
    ),
    agg AS (
      SELECT COUNT(*)::DOUBLE AS n,
             AVG((x * (x - 1) + (3 - x) * (2 - x)) / 6.0) AS pbar,
             SUM(x)::DOUBLE / (3 * COUNT(*)) AS p
      FROM votes
    )
    SELECT CAST(n AS BIGINT) AS n_docs,
           ROUND(p, 6) AS p_pass,
           ROUND(pbar, 6) AS p_bar,
           ROUND(p * p + (1 - p) * (1 - p), 6) AS p_chance,
           ROUND((pbar - (p * p + (1 - p) * (1 - p)))
                 / (1 - (p * p + (1 - p) * (1 - p))), 6)
             AS fleiss_kappa
    FROM agg
    """,
)
def q479_fleiss_kappa(spark, sf_dir):
    """Fleiss' kappa across THREE document-quality raters (above-
    median characters, words, and average word length): per-document
    agreement Pᵢ = (x(x−1)+(3−x)(2−x))/6 over the pass-vote count x,
    chance-corrected by the pooled marginal — the multi-rater
    generalization of q431's two-rater kappa, and the statistic to
    report when a quality ensemble votes.  One scan builds all three
    features, medians broadcast, then a one-column fold."""
    d = _t(spark, sf_dir, "documents")
    wc = F.size(
        F.filter(F.split(F.trim(F.col("text")), r"\s+"), lambda w: w != "")
    )
    feat = d.select(
        "n_chars",
        wc.alias("wc"),
        (F.col("n_chars").cast("double") / wc).alias("awl"),
    )
    med = feat.agg(
        F.expr("percentile(n_chars, 0.5)").alias("mc"),
        F.expr("percentile(wc, 0.5)").alias("mw"),
        F.expr("percentile(awl, 0.5)").alias("ma"),
    )
    x = (
        F.when(F.col("n_chars") > F.col("mc"), 1).otherwise(0)
        + F.when(F.col("wc") > F.col("mw"), 1).otherwise(0)
        + F.when(F.col("awl") > F.col("ma"), 1).otherwise(0)
    )
    votes = feat.crossJoin(F.broadcast(med)).select(x.alias("x"))
    agg = votes.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.avg(
            (
                F.col("x") * (F.col("x") - 1)
                + (3 - F.col("x")) * (2 - F.col("x"))
            )
            / 6.0
        ).alias("pbar"),
        (
            F.sum("x").cast("double") / (3 * F.count(F.lit(1)))
        ).alias("p"),
    )
    p = F.col("p")
    pe = p * p + (1 - p) * (1 - p)
    return agg.select(
        F.col("n").cast("bigint").alias("n_docs"),
        F.round(p, 6).alias("p_pass"),
        F.round("pbar", 6).alias("p_bar"),
        F.round(pe, 6).alias("p_chance"),
        F.round((F.col("pbar") - pe) / (1 - pe), 6).alias(
            "fleiss_kappa"
        ),
    )


@register(
    "q480_gains_table",
    """
    WITH u AS (
      SELECT user_id,
             SUM(CASE WHEN event_type IN ('click', 'view')
                      THEN 1 ELSE 0 END)::DOUBLE AS engagement,
             SUM(CASE WHEN event_type = 'purchase'
                      THEN value ELSE 0 END) AS spend
      FROM events GROUP BY user_id
    ),
    med AS (SELECT quantile_cont(spend, 0.5) AS ms FROM u),
    ranked AS (
      SELECT NTILE(10) OVER (ORDER BY u.engagement DESC, u.user_id)
               AS decile,
             CASE WHEN u.spend > med.ms THEN 1.0 ELSE 0 END AS pos
      FROM u CROSS JOIN med
    ),
    dec AS (
      SELECT decile, COUNT(*)::DOUBLE AS n, SUM(pos) AS np
      FROM ranked GROUP BY decile
    )
    SELECT CAST(decile AS BIGINT) AS decile,
           CAST(n AS BIGINT) AS n_users,
           CAST(np AS BIGINT) AS n_pos,
           ROUND(SUM(np) OVER (ORDER BY decile) / SUM(np) OVER (), 6)
             AS cum_capture,
           ROUND((np / n) / (SUM(np) OVER () / SUM(n) OVER ()), 4)
             AS lift
    FROM dec
    """,
)
def q480_gains_table(spark, sf_dir):
    """Decile gains table for the engagement→high-spend ranking: per
    decile of the ranked population, the positives captured, the
    cumulative capture curve, and the lift over the base rate — the
    campaign-planning view of the SAME ranking q465 summarizes as one
    AUC ('mail the top 3 deciles, get 52% of the buyers').  A rank
    window, a 10-row rollup, two windows over it."""
    ev = _t(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.sum(
            F.when(F.col("event_type").isin("click", "view"), 1).otherwise(
                0
            )
        )
        .cast("double")
        .alias("engagement"),
        F.sum(
            F.when(F.col("event_type") == "purchase", F.col("value"))
            .otherwise(0.0)
        ).alias("spend"),
    )
    med = u.agg(F.expr("percentile(spend, 0.5)").alias("ms"))
    ranked = u.crossJoin(F.broadcast(med)).select(
        F.ntile(10)
        .over(Window.orderBy(F.col("engagement").desc(), "user_id"))
        .alias("decile"),
        F.when(F.col("spend") > F.col("ms"), 1.0).otherwise(0.0).alias(
            "pos"
        ),
    )
    dec = ranked.groupBy("decile").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("pos").alias("np"),
    )
    wc = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wall = Window.partitionBy()
    return dec.select(
        F.col("decile").cast("bigint").alias("decile"),
        F.col("n").cast("bigint").alias("n_users"),
        F.col("np").cast("bigint").alias("n_pos"),
        F.round(
            F.sum("np").over(wc) / F.sum("np").over(wall), 6
        ).alias("cum_capture"),
        F.round(
            (F.col("np") / F.col("n"))
            / (F.sum("np").over(wall) / F.sum("n").over(wall)),
            4,
        ).alias("lift"),
    )


@register(
    "q481_empirical_bayes",
    """
    WITH g AS (
      SELECT p.p_brand AS brand,
             SUM(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END)
               ::DOUBLE AS x,
             COUNT(*)::DOUBLE AS n
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY 1
    ),
    prior AS (
      SELECT SUM(x) / SUM(n) AS p0,
             GREATEST((SUM(x) / SUM(n)) * (1 - SUM(x) / SUM(n))
                      / VAR_SAMP(x / n) - 1, 1.0) AS m
      FROM g
    )
    SELECT g.brand,
           CAST(g.n AS BIGINT) AS n_items,
           ROUND(g.x / g.n, 6) AS raw_rate,
           ROUND((g.x + pr.m * pr.p0) / (g.n + pr.m), 6)
             AS shrunk_rate,
           ROUND(g.n / (g.n + pr.m), 6) AS shrink_weight
    FROM g CROSS JOIN prior pr
    """,
)
def q481_empirical_bayes(spark, sf_dir):
    """Empirical-Bayes (beta-binomial) shrinkage of per-brand return
    rates: the prior precision m comes from the method of moments on
    the observed rate spread (m = p₀(1−p₀)/σ̂² − 1, floored at 1), and
    every brand's rate is pulled toward the global p₀ with weight
    n/(n+m) — the fix for 'the smallest segment always tops the
    league table' (q338's raw ranking).  At 100 TB the same two-pass
    shape holds: one grouped scan, one 25-row prior fold, broadcast
    back."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    g = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.sum(
                F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
            )
            .cast("double")
            .alias("x"),
            F.count(F.lit(1)).cast("double").alias("n"),
        )
    )
    p0 = F.sum("x") / F.sum("n")
    prior = g.agg(
        p0.alias("p0"),
        F.greatest(
            p0 * (1 - p0) / F.var_samp(F.col("x") / F.col("n")) - 1,
            F.lit(1.0),
        ).alias("m"),
    )
    return g.crossJoin(F.broadcast(prior)).select(
        "brand",
        F.col("n").cast("bigint").alias("n_items"),
        F.round(F.col("x") / F.col("n"), 6).alias("raw_rate"),
        F.round(
            (F.col("x") + F.col("m") * F.col("p0"))
            / (F.col("n") + F.col("m")),
            6,
        ).alias("shrunk_rate"),
        F.round(F.col("n") / (F.col("n") + F.col("m")), 6).alias(
            "shrink_weight"
        ),
    )


@register(
    "q482_adstock_transform",
    """
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
               ::DOUBLE AS c,
             SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               ::DOUBLE AS p
      FROM events GROUP BY 1
    ),
    seq AS (
      SELECT c, p, ROW_NUMBER() OVER (ORDER BY day) AS rn
      FROM daily
    ),
    ad AS (
      SELECT a.rn, MAX(a.c) AS c, MAX(a.p) AS p,
             SUM(POWER(0.5, k.k) * b.c) AS astock
      FROM seq a
      CROSS JOIN (VALUES (0),(1),(2),(3),(4),(5),(6),(7)) AS k(k)
      JOIN seq b ON b.rn = a.rn - k.k
      GROUP BY a.rn
      HAVING COUNT(*) = 8
    ),
    s AS (
      SELECT COUNT(*)::DOUBLE AS n,
             AVG(c) AS mc, AVG(p) AS mp, AVG(astock) AS ma,
             SUM(c * p) AS scp, SUM(c * c) AS scc,
             SUM(p * p) AS spp,
             SUM(astock * p) AS sap, SUM(astock * astock) AS saa
      FROM ad
    )
    SELECT CAST(n AS BIGINT) AS n_days,
           ROUND((scp - n * mc * mp)
                 / SQRT((scc - n * mc * mc) * (spp - n * mp * mp)), 6)
             AS corr_raw_clicks,
           ROUND((sap - n * ma * mp)
                 / SQRT((saa - n * ma * ma) * (spp - n * mp * mp)), 6)
             AS corr_adstock,
           ROUND((sap - n * ma * mp)
                 / SQRT((saa - n * ma * ma) * (spp - n * mp * mp))
                 - (scp - n * mc * mp)
                 / SQRT((scc - n * mc * mc) * (spp - n * mp * mp)), 6)
             AS adstock_gain
    FROM s
    """,
)
def q482_adstock_transform(spark, sf_dir):
    """Geometric adstock (8-tap, λ=0.5) of daily clicks and its
    correlation with purchases vs the raw series — the media-mix
    transform encoding 'advertising works with decay': if the
    adstocked correlation beats the raw one, click effects carry over
    days and same-day attribution (q250) under-credits.  The carryover
    convolution is an 8-offset equi-join on row number (a FIR filter
    as a join — no recursion), then two sufficient-statistics
    correlations from one fold."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.to_date(F.date_trunc("DAY", "ts")).alias("day")
    ).agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("double")
        .alias("c"),
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        )
        .cast("double")
        .alias("p"),
    )
    seq = daily.select(
        "c", "p", F.row_number().over(Window.orderBy("day")).alias("rn")
    )
    ks = daily.sparkSession.createDataFrame(
        [(k,) for k in range(8)], "k int"
    )
    a, b = seq.alias("a"), seq.alias("b")
    ad = (
        a.crossJoin(F.broadcast(ks))
        .join(b, F.col("b.rn") == F.col("a.rn") - F.col("k"))
        .groupBy(F.col("a.rn"))
        .agg(
            F.max(F.col("a.c")).alias("c"),
            F.max(F.col("a.p")).alias("p"),
            F.sum(F.pow(F.lit(0.5), F.col("k")) * F.col("b.c")).alias(
                "astock"
            ),
            F.count(F.lit(1)).alias("taps"),
        )
        .filter(F.col("taps") == 8)
    )
    s = ad.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.avg("c").alias("mc"),
        F.avg("p").alias("mp"),
        F.avg("astock").alias("ma"),
        F.sum(F.col("c") * F.col("p")).alias("scp"),
        F.sum(F.col("c") * F.col("c")).alias("scc"),
        F.sum(F.col("p") * F.col("p")).alias("spp"),
        F.sum(F.col("astock") * F.col("p")).alias("sap"),
        F.sum(F.col("astock") * F.col("astock")).alias("saa"),
    )
    n = F.col("n")
    corr_raw = (F.col("scp") - n * F.col("mc") * F.col("mp")) / F.sqrt(
        (F.col("scc") - n * F.col("mc") * F.col("mc"))
        * (F.col("spp") - n * F.col("mp") * F.col("mp"))
    )
    corr_ad = (F.col("sap") - n * F.col("ma") * F.col("mp")) / F.sqrt(
        (F.col("saa") - n * F.col("ma") * F.col("ma"))
        * (F.col("spp") - n * F.col("mp") * F.col("mp"))
    )
    return s.select(
        n.cast("bigint").alias("n_days"),
        F.round(corr_raw, 6).alias("corr_raw_clicks"),
        F.round(corr_ad, 6).alias("corr_adstock"),
        F.round(corr_ad - corr_raw, 6).alias("adstock_gain"),
    )


@register(
    "q483_mahalanobis_outliers",
    r"""
    WITH feat AS (
      SELECT doc_id, CAST(n_chars AS DOUBLE) AS x,
             CAST(len(list_filter(
               string_split_regex(trim(text), '\s+'),
               w -> w <> '')) AS DOUBLE) AS y
      FROM documents
    ),
    s AS (
      SELECT AVG(x) AS mx, AVG(y) AS my,
             SUM(x * x) / COUNT(*) - AVG(x) * AVG(x) AS sxx,
             SUM(y * y) / COUNT(*) - AVG(y) * AVG(y) AS syy,
             SUM(x * y) / COUNT(*) - AVG(x) * AVG(y) AS sxy
      FROM feat
    )
    SELECT f.doc_id,
           CAST(f.x AS BIGINT) AS n_chars,
           CAST(f.y AS BIGINT) AS n_words,
           ROUND((s.syy * POWER(f.x - s.mx, 2)
                - 2 * s.sxy * (f.x - s.mx) * (f.y - s.my)
                + s.sxx * POWER(f.y - s.my, 2))
                / (s.sxx * s.syy - s.sxy * s.sxy), 4)
             AS mahalanobis_sq
    FROM feat f CROSS JOIN s
    ORDER BY (s.syy * POWER(f.x - s.mx, 2)
            - 2 * s.sxy * (f.x - s.mx) * (f.y - s.my)
            + s.sxx * POWER(f.y - s.my, 2))
            / (s.sxx * s.syy - s.sxy * s.sxy) DESC, f.doc_id
    LIMIT 10
    """,
)
def q483_mahalanobis_outliers(spark, sf_dir):
    """Bivariate Mahalanobis outliers on (characters, words): the
    2×2 covariance inverts in closed form, so d² = (σ_yy dx² −
    2σ_xy dx dy + σ_xx dy²)/det — which flags documents that break
    the length CORRELATION (many chars, few words → binary junk or
    megawords) even when each marginal looks normal, exactly what
    the per-column fences (q115/q145) cannot see.  One
    sufficient-statistics fold, broadcast back, top-10."""
    d = _t(spark, sf_dir, "documents")
    wc = F.size(
        F.filter(F.split(F.trim(F.col("text")), r"\s+"), lambda w: w != "")
    )
    feat = d.select(
        "doc_id",
        F.col("n_chars").cast("double").alias("x"),
        wc.cast("double").alias("y"),
    )
    cnt = F.count(F.lit(1))
    s = feat.agg(
        F.avg("x").alias("mx"),
        F.avg("y").alias("my"),
        (F.sum(F.col("x") * F.col("x")) / cnt - F.avg("x") * F.avg("x")).alias("sxx"),
        (F.sum(F.col("y") * F.col("y")) / cnt - F.avg("y") * F.avg("y")).alias("syy"),
        (F.sum(F.col("x") * F.col("y")) / cnt - F.avg("x") * F.avg("y")).alias("sxy"),
    )
    dx = F.col("x") - F.col("mx")
    dy = F.col("y") - F.col("my")
    d2 = (
        F.col("syy") * dx * dx
        - 2 * F.col("sxy") * dx * dy
        + F.col("sxx") * dy * dy
    ) / (F.col("sxx") * F.col("syy") - F.col("sxy") * F.col("sxy"))
    return (
        feat.crossJoin(F.broadcast(s))
        .select(
            "doc_id",
            F.col("x").cast("bigint").alias("n_chars"),
            F.col("y").cast("bigint").alias("n_words"),
            F.round(d2, 4).alias("mahalanobis_sq"),
            d2.alias("_d"),
        )
        .orderBy(F.col("_d").desc(), "doc_id")
        .limit(10)
        .drop("_d")
    )


@register(
    "q484_pca_2x2",
    r"""
    WITH feat AS (
      SELECT LN(CAST(n_chars AS DOUBLE)) AS x,
             LN(CAST(len(list_filter(
               string_split_regex(trim(text), '\s+'),
               w -> w <> '')) AS DOUBLE)) AS y
      FROM documents
    ),
    s AS (
      SELECT SUM(x * x) / COUNT(*) - AVG(x) * AVG(x) AS sxx,
             SUM(y * y) / COUNT(*) - AVG(y) * AVG(y) AS syy,
             SUM(x * y) / COUNT(*) - AVG(x) * AVG(y) AS sxy
      FROM feat
    )
    SELECT ROUND(sxx, 6) AS var_logchars,
           ROUND(syy, 6) AS var_logwords,
           ROUND(sxy, 6) AS covar,
           ROUND((sxx + syy
                  + SQRT(POWER(sxx - syy, 2) + 4 * sxy * sxy)) / 2, 6)
             AS lambda1,
           ROUND((sxx + syy
                  - SQRT(POWER(sxx - syy, 2) + 4 * sxy * sxy)) / 2, 6)
             AS lambda2,
           ROUND((sxx + syy
                  + SQRT(POWER(sxx - syy, 2) + 4 * sxy * sxy))
                 / (2 * (sxx + syy)), 6) AS explained_pc1,
           ROUND(DEGREES(0.5 * ATAN2(2 * sxy, sxx - syy)), 4)
             AS pc1_angle_deg
    FROM s
    """,
)
def q484_pca_2x2(spark, sf_dir):
    """Closed-form 2D PCA of (ln chars, ln words): the 2×2 covariance
    eigendecomposes analytically — λ = (tr ± √((σxx−σyy)²+4σxy²))/2,
    first-component angle from atan2 — so the 'one length factor
    explains 9x% of both columns' statement costs one
    sufficient-statistics fold, no linear-algebra library and no
    iteration.  The 2×2 case is the workhorse for pairwise feature
    whitening (q221) and for deciding whether two length features
    deserve one dimension."""
    d = _t(spark, sf_dir, "documents")
    wc = F.size(
        F.filter(F.split(F.trim(F.col("text")), r"\s+"), lambda w: w != "")
    )
    feat = d.select(
        F.log(F.col("n_chars").cast("double")).alias("x"),
        F.log(wc.cast("double")).alias("y"),
    )
    cnt = F.count(F.lit(1))
    s = feat.agg(
        (F.sum(F.col("x") * F.col("x")) / cnt - F.avg("x") * F.avg("x")).alias("sxx"),
        (F.sum(F.col("y") * F.col("y")) / cnt - F.avg("y") * F.avg("y")).alias("syy"),
        (F.sum(F.col("x") * F.col("y")) / cnt - F.avg("x") * F.avg("y")).alias("sxy"),
    )
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    disc = F.sqrt(F.pow(sxx - syy, 2) + 4 * sxy * sxy)
    return s.select(
        F.round(sxx, 6).alias("var_logchars"),
        F.round(syy, 6).alias("var_logwords"),
        F.round(sxy, 6).alias("covar"),
        F.round((sxx + syy + disc) / 2, 6).alias("lambda1"),
        F.round((sxx + syy - disc) / 2, 6).alias("lambda2"),
        F.round((sxx + syy + disc) / (2 * (sxx + syy)), 6).alias(
            "explained_pc1"
        ),
        F.round(
            F.degrees(F.lit(0.5) * F.atan2(2 * sxy, sxx - syy)), 4
        ).alias("pc1_angle_deg"),
    )


@register(
    "q485_conformal_interval",
    """
    WITH daily AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
             SUM(o_totalprice) AS rev
      FROM orders GROUP BY 1
    ),
    seq AS (
      SELECT rev,
             LAG(rev, 7) OVER (ORDER BY day) AS yhat,
             ROW_NUMBER() OVER (ORDER BY day) AS rn,
             COUNT(*) OVER () AS n
      FROM daily
    ),
    train_resid AS (
      SELECT ABS(rev - yhat) AS r
      FROM seq WHERE yhat IS NOT NULL AND rn <= n / 2
    ),
    qhat AS (
      SELECT r AS q
      FROM (
        SELECT r, ROW_NUMBER() OVER (ORDER BY r) AS k,
               COUNT(*) OVER () AS m
        FROM train_resid
      )
      WHERE k = LEAST(CAST(CEIL(0.9 * (m + 1)) AS BIGINT), m)
    ),
    test AS (
      SELECT s.rev, s.yhat, q.q
      FROM seq s CROSS JOIN qhat q
      WHERE s.yhat IS NOT NULL AND s.rn > s.n / 2
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_test,
           ROUND(MAX(q), 4) AS q_hat,
           ROUND(AVG(CASE WHEN ABS(rev - yhat) <= q
                          THEN 1.0 ELSE 0 END), 6) AS coverage,
           0.9 AS target_coverage,
           ROUND(2 * MAX(q), 4) AS interval_width
    FROM test
    """,
)
def q485_conformal_interval(spark, sf_dir):
    """Split-conformal prediction interval around a lag-7 naive
    forecast of daily revenue: q̂ is the ⌈0.9(n+1)⌉-th smallest
    training |residual| — chosen by RANK, which is what gives the
    finite-sample coverage guarantee WITHOUT any distributional
    assumption (compare q304's parametric VaR and q454's normality
    gate: conformal needs neither).  Test-half coverage verifies the
    promise empirically.  Rank selection is one ordered window over
    the train residuals; no quantile interpolation anywhere."""
    od = _t(spark, sf_dir, "orders")
    daily = od.groupBy(
        F.to_date(F.date_trunc("DAY", "o_orderdate")).alias("day")
    ).agg(F.sum("o_totalprice").alias("rev"))
    w = Window.orderBy("day")
    seq = daily.select(
        "rev",
        F.lag("rev", 7).over(w).alias("yhat"),
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    train_resid = seq.filter(
        F.col("yhat").isNotNull() & (F.col("rn") <= F.col("n") / 2)
    ).select(F.abs(F.col("rev") - F.col("yhat")).alias("r"))
    ranked = train_resid.select(
        "r",
        F.row_number().over(Window.orderBy("r")).alias("k"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("m"),
    )
    qhat = ranked.filter(
        F.col("k")
        == F.least(
            F.ceil(0.9 * (F.col("m") + 1)).cast("bigint"), F.col("m")
        )
    ).select(F.col("r").alias("q"))
    test = (
        seq.filter(
            F.col("yhat").isNotNull() & (F.col("rn") > F.col("n") / 2)
        )
        .crossJoin(F.broadcast(qhat))
    )
    return test.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_test"),
        F.round(F.max("q"), 4).alias("q_hat"),
        F.round(
            F.avg(
                F.when(
                    F.abs(F.col("rev") - F.col("yhat")) <= F.col("q"),
                    1.0,
                ).otherwise(0.0)
            ),
            6,
        ).alias("coverage"),
        F.lit(0.9).alias("target_coverage"),
        F.round(2 * F.max("q"), 4).alias("interval_width"),
    )


@register(
    "q486_matrix_profile",
    """
    WITH monthly AS (
      SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS mth,
             SUM(o_totalprice) AS rev
      FROM orders GROUP BY 1
    ),
    seq AS (
      SELECT rev, ROW_NUMBER() OVER (ORDER BY mth) AS rn,
             COUNT(*) OVER () AS n
      FROM monthly
    ),
    subs AS (
      SELECT a.rn AS i, k.k, b.rev AS xv
      FROM seq a
      CROSS JOIN (VALUES (0), (1), (2), (3)) AS k(k)
      JOIN seq b ON b.rn = a.rn + k.k
      WHERE a.rn + 3 <= a.n
    ),
    stats AS (
      SELECT i, AVG(xv) AS m, STDDEV_POP(xv) AS sd
      FROM subs GROUP BY i
    ),
    z AS (
      SELECT s.i, s.k, (s.xv - st.m) / st.sd AS zv
      FROM subs s JOIN stats st ON s.i = st.i
    ),
    d2 AS (
      SELECT a.i AS i, b.i AS j,
             ROUND(SUM(POWER(a.zv - b.zv, 2)), 10) AS d
      FROM z a JOIN z b ON a.k = b.k
      WHERE ABS(a.i - b.i) >= 2
      GROUP BY a.i, b.i
    ),
    profile AS (
      SELECT i, j AS nn, d,
             ROW_NUMBER() OVER (PARTITION BY i ORDER BY d, j) AS rk
      FROM d2
    ),
    p AS (SELECT i, nn, d FROM profile WHERE rk = 1),
    labeled AS (
      SELECT 'motif' AS kind, i, nn, d,
             ROW_NUMBER() OVER (ORDER BY d, i) AS rk
      FROM p
      UNION ALL
      SELECT 'discord', i, nn, d,
             ROW_NUMBER() OVER (ORDER BY d DESC, i)
      FROM p
    )
    SELECT kind,
           CAST(i AS BIGINT) AS position,
           CAST(nn AS BIGINT) AS nn_position,
           ROUND(SQRT(d), 4) AS distance
    FROM labeled WHERE rk <= 3
    """,
)
def q486_matrix_profile(spark, sf_dir):
    """Matrix profile (window 4) over monthly revenue: z-normalized
    distance from every 4-month subsequence to its nearest neighbor
    (exclusion zone 2), reporting the top-3 MOTIFS (repeated shapes —
    recurring demand patterns) and top-3 DISCORDS (anomalous
    quarters nothing else resembles).  The all-pairs join is 76²
    rows on the MONTHLY aggregate — the deliberate granularity trade;
    distances are pre-rounded at 1e-10 before ranking so fp
    summation order can't flip nearest-neighbor ties between
    engines."""
    od = _t(spark, sf_dir, "orders")
    monthly = od.groupBy(
        F.to_date(F.date_trunc("MONTH", "o_orderdate")).alias("mth")
    ).agg(F.sum("o_totalprice").alias("rev"))
    seq = monthly.select(
        "rev",
        F.row_number().over(Window.orderBy("mth")).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    ks = monthly.sparkSession.createDataFrame(
        [(0,), (1,), (2,), (3,)], "k int"
    )
    a, b = seq.alias("a"), seq.alias("b")
    subs = (
        a.crossJoin(F.broadcast(ks))
        .join(b, F.col("b.rn") == F.col("a.rn") + F.col("k"))
        .filter(F.col("a.rn") + 3 <= F.col("a.n"))
        .select(
            F.col("a.rn").alias("i"), "k", F.col("b.rev").alias("xv")
        )
    )
    stats = subs.groupBy("i").agg(
        F.avg("xv").alias("m"), F.stddev_pop("xv").alias("sd")
    )
    z = subs.join(stats, "i").select(
        "i", "k", ((F.col("xv") - F.col("m")) / F.col("sd")).alias("zv")
    )
    za = z.select(
        F.col("i").alias("ia"), F.col("k"), F.col("zv").alias("zva")
    )
    zb = z.select(
        F.col("i").alias("ib"),
        F.col("k").alias("kb"),
        F.col("zv").alias("zvb"),
    )
    d2 = (
        za.join(zb, (za.k == zb.kb) & (F.abs(za.ia - zb.ib) >= 2))
        .groupBy(F.col("ia").alias("i"), F.col("ib").alias("j"))
        .agg(
            F.round(
                F.sum(F.pow(F.col("zva") - F.col("zvb"), 2)), 10
            ).alias("d")
        )
    )
    profile = d2.select(
        "i",
        F.col("j").alias("nn"),
        "d",
        F.row_number()
        .over(Window.partitionBy("i").orderBy("d", "j"))
        .alias("rk"),
    ).filter(F.col("rk") == 1)
    motifs = profile.select(
        F.lit("motif").alias("kind"),
        "i",
        "nn",
        "d",
        F.row_number().over(Window.orderBy("d", "i")).alias("rk"),
    )
    discords = profile.select(
        F.lit("discord").alias("kind"),
        "i",
        "nn",
        "d",
        F.row_number()
        .over(Window.orderBy(F.col("d").desc(), "i"))
        .alias("rk"),
    )
    return (
        motifs.unionByName(discords)
        .filter(F.col("rk") <= 3)
        .select(
            "kind",
            F.col("i").cast("bigint").alias("position"),
            F.col("nn").cast("bigint").alias("nn_position"),
            F.round(F.sqrt("d"), 4).alias("distance"),
        )
    )


@register(
    "q487_pooled_testing",
    """
    WITH prev AS (
      SELECT AVG(CASE WHEN l_returnflag = 'R' THEN 1.0 ELSE 0 END)
               AS p
      FROM lineitem
    ),
    grid AS (
      SELECT k.k, prev.p,
             1.0 / k.k + 1 - POWER(1 - prev.p, k.k) AS e
      FROM (VALUES (2),(3),(4),(5),(6),(7),(8),(9),(10),(11),(12))
        AS k(k)
      CROSS JOIN prev
    )
    SELECT CAST(k AS BIGINT) AS group_size,
           ROUND(p, 6) AS prevalence,
           ROUND(e, 6) AS expected_tests_per_item,
           ROUND(1 - e, 6) AS savings,
           CAST(CASE WHEN e = MIN(e) OVER () THEN 1 ELSE 0 END
                AS BIGINT) AS is_optimal
    FROM grid
    """,
)
def q487_pooled_testing(spark, sf_dir):
    """Dorfman pooled-testing design against the measured defect
    (return) prevalence: expected tests per item 1/k + 1 − (1−p)^k
    over group sizes 2..12, with the cost-minimizing pool flagged —
    the group-testing arithmetic that applies verbatim to batched
    quality audits of data shards ('sample the pool; only open the
    shard if the pool fails').  At the fixture's p the optimum and
    its ~50% saving fall straight out of one measured scalar and an
    11-row grid."""
    li = _t(spark, sf_dir, "lineitem")
    prev = li.agg(
        F.avg(
            F.when(F.col("l_returnflag") == "R", 1.0).otherwise(0.0)
        ).alias("p")
    )
    ks = li.sparkSession.createDataFrame(
        [(k,) for k in range(2, 13)], "k int"
    )
    grid = ks.crossJoin(F.broadcast(prev)).select(
        "k",
        "p",
        (
            1.0 / F.col("k")
            + 1
            - F.pow(1 - F.col("p"), F.col("k"))
        ).alias("e"),
    )
    wall = Window.partitionBy()
    return grid.select(
        F.col("k").cast("bigint").alias("group_size"),
        F.round("p", 6).alias("prevalence"),
        F.round("e", 6).alias("expected_tests_per_item"),
        F.round(F.lit(1) - F.col("e"), 6).alias("savings"),
        F.when(F.col("e") == F.min("e").over(wall), 1)
        .otherwise(0)
        .cast("bigint")
        .alias("is_optimal"),
    )


@register(
    "q488_eoq",
    """
    WITH span AS (
      SELECT date_diff('day',
               MIN(CAST(l_shipdate AS DATE)),
               MAX(CAST(l_shipdate AS DATE))) / 365.25 AS years
      FROM lineitem
    ),
    b AS (
      SELECT p.p_brand AS brand,
             SUM(l.l_quantity) AS total_qty,
             AVG(l.l_extendedprice / l.l_quantity) AS unit_price
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY 1
    )
    SELECT b.brand,
           ROUND(b.total_qty / s.years, 2) AS annual_demand,
           ROUND(SQRT(2 * (b.total_qty / s.years) * 100
                      / (0.2 * b.unit_price)), 4) AS eoq_units,
           ROUND((b.total_qty / s.years)
                 / SQRT(2 * (b.total_qty / s.years) * 100
                        / (0.2 * b.unit_price)), 4) AS orders_per_year,
           ROUND(365.25 / ((b.total_qty / s.years)
                 / SQRT(2 * (b.total_qty / s.years) * 100
                        / (0.2 * b.unit_price))), 4) AS cycle_days
    FROM b CROSS JOIN span s
    """,
)
def q488_eoq(spark, sf_dir):
    """Economic order quantity per brand from measured demand: EOQ =
    √(2DK/h) with annual demand D from the shipped-quantity history,
    fixed order cost K=100, holding cost 20% of the brand's average
    unit price — then the implied replenishment cadence.  The classic
    OR counterpart to q433's newsvendor (EOQ sets the CYCLE,
    newsvendor sets the BUFFER); both run off the same one-scan brand
    aggregate and a broadcast time-span scalar."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    span = li.agg(
        (
            F.datediff(
                F.max(F.col("l_shipdate").cast("date")),
                F.min(F.col("l_shipdate").cast("date")),
            )
            / 365.25
        ).alias("years")
    )
    b = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.sum("l_quantity").alias("total_qty"),
            F.avg(F.col("l_extendedprice") / F.col("l_quantity")).alias(
                "unit_price"
            ),
        )
    )
    d = F.col("total_qty") / F.col("years")
    eoq = F.sqrt(2 * d * 100 / (0.2 * F.col("unit_price")))
    return b.crossJoin(F.broadcast(span)).select(
        "brand",
        F.round(d, 2).alias("annual_demand"),
        F.round(eoq, 4).alias("eoq_units"),
        F.round(d / eoq, 4).alias("orders_per_year"),
        F.round(F.lit(365.25) / (d / eoq), 4).alias("cycle_days"),
    )


@register(
    "q489_interrupted_ts",
    """
    WITH daily AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
             SUM(o_totalprice) AS rev
      FROM orders GROUP BY 1
    ),
    seq AS (
      SELECT rev AS y,
             CAST(ROW_NUMBER() OVER (ORDER BY day) AS DOUBLE) AS t,
             COUNT(*) OVER () AS n
      FROM daily
    ),
    halves AS (
      SELECT CASE WHEN t <= n / 2 THEN 0 ELSE 1 END AS post,
             COUNT(*)::DOUBLE AS cnt,
             AVG(t) AS mt, AVG(y) AS my,
             SUM(t * y) AS sty, SUM(t * t) AS stt,
             MAX(n) AS n
      FROM seq GROUP BY 1
    ),
    fits AS (
      SELECT post, n,
             (sty - cnt * mt * my) / (stt - cnt * mt * mt) AS b,
             my - (sty - cnt * mt * my) / (stt - cnt * mt * mt) * mt
               AS a
      FROM halves
    ),
    wide AS (
      SELECT MAX(CASE WHEN post = 0 THEN a END) AS a0,
             MAX(CASE WHEN post = 0 THEN b END) AS b0,
             MAX(CASE WHEN post = 1 THEN a END) AS a1,
             MAX(CASE WHEN post = 1 THEN b END) AS b1,
             MAX(n) / 2.0 + 0.5 AS t0
      FROM fits
    )
    SELECT ROUND(b0, 6) AS slope_pre,
           ROUND(b1, 6) AS slope_post,
           ROUND(b1 - b0, 6) AS slope_change,
           ROUND((a1 + b1 * t0) - (a0 + b0 * t0), 4) AS level_change
    FROM wide
    """,
)
def q489_interrupted_ts(spark, sf_dir):
    """Interrupted-time-series (segmented regression) at the series
    midpoint: separate OLS trend fits on the two halves, reporting
    the slope change and the level discontinuity at the break —
    q418 FINDS the best break; this quantifies WHAT changed there in
    the two quantities a policy evaluation needs (did growth bend,
    did the level jump).  Both fits come from one grouped
    sufficient-statistics pass (group = half), no per-segment
    rescans; SEs deliberately omitted (q455's DW shows these
    residuals are serially dependent — honest SEs need Newey-West)."""
    od = _t(spark, sf_dir, "orders")
    daily = od.groupBy(
        F.to_date(F.date_trunc("DAY", "o_orderdate")).alias("day")
    ).agg(F.sum("o_totalprice").alias("rev"))
    seq = daily.select(
        F.col("rev").alias("y"),
        F.row_number()
        .over(Window.orderBy("day"))
        .cast("double")
        .alias("t"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    halves = seq.groupBy(
        F.when(F.col("t") <= F.col("n") / 2, 0).otherwise(1).alias("post")
    ).agg(
        F.count(F.lit(1)).cast("double").alias("cnt"),
        F.avg("t").alias("mt"),
        F.avg("y").alias("my"),
        F.sum(F.col("t") * F.col("y")).alias("sty"),
        F.sum(F.col("t") * F.col("t")).alias("stt"),
        F.max("n").alias("n"),
    )
    bexp = (
        F.col("sty") - F.col("cnt") * F.col("mt") * F.col("my")
    ) / (F.col("stt") - F.col("cnt") * F.col("mt") * F.col("mt"))
    fits = halves.select(
        "post",
        "n",
        bexp.alias("b"),
        (F.col("my") - bexp * F.col("mt")).alias("a"),
    )
    wide = fits.agg(
        F.max(F.when(F.col("post") == 0, F.col("a"))).alias("a0"),
        F.max(F.when(F.col("post") == 0, F.col("b"))).alias("b0"),
        F.max(F.when(F.col("post") == 1, F.col("a"))).alias("a1"),
        F.max(F.when(F.col("post") == 1, F.col("b"))).alias("b1"),
        (F.max("n") / 2.0 + 0.5).alias("t0"),
    )
    return wide.select(
        F.round("b0", 6).alias("slope_pre"),
        F.round("b1", 6).alias("slope_post"),
        F.round(F.col("b1") - F.col("b0"), 6).alias("slope_change"),
        F.round(
            (F.col("a1") + F.col("b1") * F.col("t0"))
            - (F.col("a0") + F.col("b0") * F.col("t0")),
            4,
        ).alias("level_change"),
    )


@register(
    "q490_freshness_audit",
    """
    WITH spans AS (
      SELECT 'orders' AS tbl,
             MIN(CAST(o_orderdate AS DATE)) AS lo,
             MAX(CAST(o_orderdate AS DATE)) AS hi,
             COUNT(*) AS n
      FROM orders
      UNION ALL
      SELECT 'lineitem', MIN(CAST(l_shipdate AS DATE)),
             MAX(CAST(l_shipdate AS DATE)), COUNT(*)
      FROM lineitem
      UNION ALL
      SELECT 'events', MIN(CAST(ts AS DATE)),
             MAX(CAST(ts AS DATE)), COUNT(*)
      FROM events
    ),
    gmax AS (SELECT MAX(hi) AS gm FROM spans)
    SELECT s.tbl,
           CAST(s.n AS BIGINT) AS n_rows,
           s.lo AS first_date,
           s.hi AS last_date,
           CAST(date_diff('day', s.lo, s.hi) AS BIGINT) AS span_days,
           CAST(date_diff('day', s.hi, g.gm) AS BIGINT)
             AS days_behind_freshest
    FROM spans s CROSS JOIN gmax g
    """,
)
def q490_freshness_audit(spark, sf_dir):
    """Cross-table freshness card: each temporal table's date span and
    how many days it lags the freshest table in the warehouse — the
    first dashboard a data-platform team builds, because a silently
    stalled feed shows up here days before any downstream metric
    drifts (q330's ingest-order audit catches WITHIN-table disorder;
    this catches BETWEEN-table lag).  One min/max scan per table,
    three rows."""
    od = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    ev = _t(spark, sf_dir, "events")
    parts = []
    for name, frame, col in (
        ("orders", od, "o_orderdate"),
        ("lineitem", li, "l_shipdate"),
        ("events", ev, "ts"),
    ):
        parts.append(
            frame.agg(
                F.min(F.col(col).cast("date")).alias("lo"),
                F.max(F.col(col).cast("date")).alias("hi"),
                F.count(F.lit(1)).alias("n"),
            ).select(F.lit(name).alias("tbl"), "lo", "hi", "n")
        )
    spans = parts[0].unionByName(parts[1]).unionByName(parts[2])
    gmax = spans.agg(F.max("hi").alias("gm"))
    return spans.crossJoin(F.broadcast(gmax)).select(
        "tbl",
        F.col("n").cast("bigint").alias("n_rows"),
        F.col("lo").alias("first_date"),
        F.col("hi").alias("last_date"),
        F.datediff("hi", "lo").cast("bigint").alias("span_days"),
        F.datediff("gm", "hi")
        .cast("bigint")
        .alias("days_behind_freshest"),
    )


# =====================================================================
# Driver verification-window ordering
# =====================================================================
# The round driver oracle-checks the FIRST 50 registered queries; round 1
# covered q01–q42, q57–q59, q70–q74; round 2 covered q43–q69, q75–q99;
# round 3 covered q100–q143 plus re-verifies (CORRECTNESS_r01–r03.json).
# Round 4 banks the never-driver-checked names: q144–q150 (written
# after the r03 window rotated) and everything new this round
# (q151–q190 — codecs, scoring/sampling, the centrality suite, the
# analytics/LLM-pipeline additions), then re-verifies the three
# queries whose implementations were touched and not already covered
# by the new names (q45 hot-shingle probe, q106 short-string routing,
# q114 harmonic moved to the tagged multi-source BFS) — 47 + 3 fills
# the 50 slots exactly.  Every query stays registered — ordering only
# decides which get driver rows this round, and tools/check_oracle.py
# ran the FULL registry green this session (see BASELINE.md).
_WINDOW_PRIORITY = [
    # VERDICT round-3 item 4 pins q144–q150 into this round's driver
    # window (their first driver rows).  The remaining 43 slots hold
    # the newest value-oracled additions (q202–q247, minus the
    # rows-only q237/q238/q244 which carry pytest goldens); everything
    # in between (q151–q201, plus the q114 re-verify) is covered by this
    # session's full-registry tools/check_oracle.py sweeps recorded in
    # BASELINE.md — q151/q152 are rows-only decode checks with
    # pixel/waveform-exact pytests besides.
    # ROUND-5 ROTATION QUEUE: q248–q460 (written after this round's
    # window locked; all green under the continuation-4 full-registry
    # sweeps and per-arc batch sweeps, BASELINE.md) — swap them in for
    # their first driver rows once CORRECTNESS_r04 lands.
    "q144_ordered_listagg",
    "q145_mad_outliers",
    "q146_salted_skew_join",
    "q147_embedding_dim_stats",
    "q148_centroid_similarity",
    "q149_bigram_topk",
    "q150_activity_heatmap",
    "q202_oov_rate",
    "q203_streaming_topk",
    "q204_bootstrap_mean",
    "q205_groupwise_regression",
    "q206_token_apportionment",
    "q207_wilson_ci",
    "q208_bounce_rate",
    "q209_label_dim_stats",
    "q210_degree_histogram",
    "q211_interarrival_median",
    "q212_avg_neighbor_degree",
    "q213_trending_terms",
    "q214_pareto_coverage",
    "q215_padding_curve",
    "q216_source_length_deciles",
    "q217_user_entropy",
    "q218_time_to_convert",
    "q219_jaccard_threshold_curve",
    "q220_weighted_reservoir",
    "q221_whitened_norms",
    "q222_regression_outliers",
    "q223_rfm_segmentation",
    "q224_association_rules",
    "q225_js_divergence",
    "q226_zipf_fit",
    "q227_pmi_topk",
    "q228_kaplan_meier",
    "q229_event_trigrams",
    "q230_gini_engagement",
    "q231_dedup_inflation",
    "q232_shingle_df_profile",
    "q233_quantization_error",
    "q234_fano_burstiness",
    "q235_k_anonymity",
    "q236_mrr_eval",
    "q239_ndcg_eval",
    "q240_onenn_confusion",
    "q241_auc_roc",
    "q242_ks_drift",
    "q243_mutual_information",
    "q245_growth_accounting",
    "q246_frequent_triples",
    "q247_percentile_disc",
]


def _apply_window_order() -> None:
    global QUERIES
    missing = [n for n in _WINDOW_PRIORITY if n not in QUERIES]
    if missing:
        raise RuntimeError(f"_WINDOW_PRIORITY names unknown queries: {missing}")
    # the driver oracle-checks EXACTLY the first 50 registered queries:
    # less wastes verification slots, more silently pushes names out
    if len(_WINDOW_PRIORITY) != 50:
        raise RuntimeError(
            f"_WINDOW_PRIORITY must hold exactly 50 names, has "
            f"{len(_WINDOW_PRIORITY)} — trim re-verify/filler entries"
        )
    prioritized = {n: QUERIES[n] for n in _WINDOW_PRIORITY}
    rest = {n: v for n, v in QUERIES.items() if n not in prioritized}
    QUERIES = {**prioritized, **rest}


_apply_window_order()
