"""Relational core — scans, joins, aggregation, windows, set ops (q01–q31 band).

Part 1/11 of the query registry (split from the former single-file
workload.py); importing this module registers its queries in
``plans._shared.QUERIES``.
"""

from graphmapreduce_spark.plans._shared import *  # noqa: F401,F403

@register(
    "q01_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           -- money sums as exact decimals (q429/q418 discipline, found
           -- at sf10: a double SUM at 5e11 magnitude carries more
           -- summation-order noise than the emitted cent precision).
           -- Small bounded casts — (12,2) price, (3,2) disc/tax — keep
           -- every product/sum inside BOTH engines' 38-digit cap with
           -- no precision-loss truncation.  Quantity sums stay double:
           -- integer-valued doubles sum exactly in any order.
           ROUND(SUM(l_quantity), 2)                                    AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)  AS sum_base_price,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                          * (1 - CAST(l_discount AS DECIMAL(3,2)))), 2)
                AS DOUBLE)                                              AS sum_disc_price,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                          * (1 - CAST(l_discount AS DECIMAL(3,2)))
                          * (1 + CAST(l_tax AS DECIMAL(3,2)))), 2)
                AS DOUBLE)                                              AS sum_charge,
           ROUND(AVG(l_quantity), 6)                                    AS avg_qty,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)))
                      AS DOUBLE) / COUNT(*), 6)                         AS avg_price,
           ROUND(AVG(l_discount), 6)                                    AS avg_disc,
           COUNT(*)                                                     AS count_order
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q01_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape: full-scan groupBy-agg with arithmetic — partial
    (map-side) aggregation + whole-stage codegen carry it at any scale.
    Money columns accumulate as exact decimals (the sf10 lesson: at
    10M-row groups the double sums' summation-order noise crosses the
    emitted cent precision on both engines, differently)."""
    li = _t(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("decimal(12,2)")
    one_m_disc = F.lit(1).cast("decimal(3,2)") - F.col("l_discount").cast(
        "decimal(3,2)"
    )
    one_p_tax = F.lit(1).cast("decimal(3,2)") + F.col("l_tax").cast(
        "decimal(3,2)"
    )
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.sum(price).cast("double").alias("sum_base_price"),
        F.round(F.sum(price * one_m_disc), 2)
        .cast("double")
        .alias("sum_disc_price"),
        F.round(F.sum(price * one_m_disc * one_p_tax), 2)
        .cast("double")
        .alias("sum_charge"),
        F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
        F.round(
            F.sum(price).cast("double") / F.count(F.lit(1)), 6
        ).alias("avg_price"),
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
    # spread by the group key before the multi-distinct: Catalyst plans
    # two countDistincts as Expand(×3) + partial agg FUSED INTO THE SCAN,
    # and a single-row-group file runs that serially; one narrow shuffle
    # of the 3 projected columns moves the ×3 expansion and both
    # aggregate passes behind the exchange where they parallelize
    # (r07: 1.16 → 0.67 s at sf0.1, plan: Expand now above the exchange).
    # Input-parallelism-gated (r08, operators/_spread.py): when the scan
    # reaches the shuffle parallelism by itself, the expanded partial
    # aggregate shuffles FEWER bytes than the raw projection — measured
    # at sf1-equivalent: 161 MB / 12.3M rows (direct) vs 227 MB / 18.2M
    # rows (repartition-first), wall 1.7 vs 2.2-3.9 s — so the spread is
    # strictly a few-row-group layout fix, exactly VERDICT r07 item 7's
    # revert condition.
    from graphmapreduce_spark.operators._spread import spread_by

    return (
        spread_by(li.select("l_suppkey", "l_partkey", "l_orderkey"), "l_suppkey")
        .groupBy("l_suppkey")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_orderkey").alias("n_orders"),
            F.count(F.lit(1)).alias("n_rows"),
        )
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
           -- RAW emission: both are exact integer-ratio doubles
           -- (bit-identical cross-engine); ROUND(,6) diverged at a
           -- true decimal halfway point (333/640 at sf0.1)
           PERCENT_RANK() OVER w AS pct_rank,
           CUME_DIST()    OVER w AS cume
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
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
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


@register(
    "q589_xml_roundtrip",
    """
    SELECT CAST(n_regionkey AS BIGINT) AS region_key,
           COUNT(*)::BIGINT AS n_nations,
           MIN(n_name) AS first_name,
           MIN(md5(n_name)) AS name_md5_min
    FROM nation
    GROUP BY 1
    """,
)
def q589_xml_roundtrip(spark, sf_dir):
    """XML source/sink (Spark 4 native ``format("xml")``,
    `sources/xml_io.py`): write the nation table as XML, read it back,
    aggregate the ROUND-TRIPPED rows.  The oracle computes the same
    aggregate from the original parquet, so a value match proves the
    write→read cycle is byte-faithful (the md5-of-name aggregate pins
    string fidelity through the tag escaping, not just counts).  XML is
    the land-once ingestion format — see the module docstring for why
    the production pattern is XML → parquet, never XML as the working
    format."""
    import tempfile

    from graphmapreduce_spark.sources import read_xml, write_xml

    n = _t(spark, sf_dir, "nation")
    d = tempfile.mkdtemp(prefix="gmr_xml_")
    write_xml(n, d, row_tag="nation")
    back = read_xml(spark, d, row_tag="nation")
    return back.groupBy(
        F.col("n_regionkey").alias("region_key")
    ).agg(
        F.count(F.lit(1)).alias("n_nations"),
        F.min("n_name").alias("first_name"),
        F.min(F.md5(F.col("n_name").cast("binary"))).alias("name_md5_min"),
    )
