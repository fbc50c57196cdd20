"""Analytics arc C: statistics long tail (tests, correlations, distributions).

Part 8/11 of the query registry (split from the former single-file
workload.py); importing this module registers its queries in
``plans._shared.QUERIES``.
"""

from graphmapreduce_spark.plans._shared import *  # noqa: F401,F403

@register(
    "q333_price_volume_decomposition",
    """
    WITH monthly AS (
      -- exact decimal money sum (q01/q411 sf10 class): the ~800k-row
      -- monthly price sums at 1.6e9 carry ~0.05 of summation-order
      -- noise, which the cent-rounded bridge columns can see.
      -- Quantity sums are integer-valued doubles — exact as is.
      SELECT CAST(date_trunc('month', l_shipdate) AS DATE) AS month,
             SUM(l_quantity) AS q,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
               / SUM(l_quantity) AS p
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
        (
            F.sum(F.col("l_extendedprice").cast("decimal(12,2)"))
            .cast("double")
            / F.sum("l_quantity")
        ).alias("p"),
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
      -- exact-decimal money means (sf10 class): a double AVG's
      -- summation-order ulp lands the 4dp ROUND on a half-boundary
      SELECT p_type,
             CAST(SUM(CAST(p_retailprice AS DECIMAL(12,2))) AS DOUBLE)
               / COUNT(*) AS type_mean,
             COUNT(*) AS n_in_type
      FROM part GROUP BY p_type
    ),
    pos AS (
      SELECT p.p_brand, p.p_type,
             COUNT(*) AS n_parts,
             CAST(SUM(CAST(p.p_retailprice AS DECIMAL(12,2))) AS DOUBLE)
               / COUNT(*) AS brand_mean,
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
    # exact-decimal money means (mirrors the oracle): sum at (12,2),
    # one cast to double, THEN divide — no summation-order ulps
    exact_mean = (
        F.sum(F.col("p_retailprice").cast("decimal(12,2)")).cast("double")
        / F.count(F.lit(1))
    )
    type_avg = (
        pa.groupBy("p_type")
        .agg(
            exact_mean.alias("type_mean"),
            F.count(F.lit(1)).alias("n_in_type"),
        )
        .filter(F.col("n_in_type") >= 5)
    )
    return (
        pa.join(F.broadcast(type_avg), "p_type")
        .groupBy("p_brand", "p_type")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            exact_mean.alias("brand_mean"),
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
    -- CROSS JOIN, not scalar subqueries: with the outer query ALSO
    -- reading per, DuckDB 1.0.0 re-evaluates the (SELECT ... FROM
    -- drift) scalar path differently and corr over a zero-variance
    -- column comes back nonzero garbage instead of NULL (found at
    -- sf10, where replication makes mean_len constant across deciles)
    SELECT per.decile, per.n_docs, per.mean_len, per.mean_alpha,
           ROUND(drift.c_len, 6) AS len_drift_corr,
           ROUND(drift.c_alpha, 6) AS alpha_drift_corr
    FROM per CROSS JOIN drift
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

    # F.corr under ANSI mode THROWS DIVIDE_BY_ZERO when either side has
    # zero variance (sf1's replicated deciles make mean_len constant);
    # DuckDB's corr returns NULL there.  Same co-moment computation,
    # with try_divide supplying the NULL-on-degenerate contract.
    def _corr(x: str, y: str):
        return F.try_divide(
            F.covar_samp(x, y), F.stddev_samp(x) * F.stddev_samp(y)
        )

    drift = per.agg(
        F.round(_corr("decile", "mean_len"), 6).alias("c_len"),
        F.round(_corr("decile", "mean_alpha"), 6).alias("c_alpha"),
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
           CAST(SUM(CASE WHEN firsts.first_doc
                         < (SELECT n_docs FROM n) * grid.pct / 100.0
                         THEN 1 ELSE 0 END) AS BIGINT) AS vocab_size
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
      -- exact-decimal sum, then ONE cast to double: a per-user double
      -- SUM's last-ulp order noise flips the s >= median comparison
      -- for users sitting exactly on the segment boundary (sf10 find);
      -- identical doubles in -> identical median + comparison out
      SELECT user_id, half,
             CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS s
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
        # exact decimal sum -> one cast to double (mirrors the oracle):
        # kills the last-ulp boundary flip at the half-median (sf10)
        .agg(
            F.sum(F.col("value").cast("decimal(12,2)"))
            .cast("double")
            .alias("s")
        )
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
           CAST(SUM(CASE WHEN c.user_id IS NULL THEN 0 ELSE 1 END)
                AS BIGINT) AS n_converted,
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
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                  AS DECIMAL(18,2)) AS rev
      FROM orders GROUP BY 1
    ),
    cumd AS (
      SELECT day,
             ROW_NUMBER() OVER (ORDER BY day) AS t,
             SUM(rev) OVER (ORDER BY day) AS csd,
             -- widen ONE operand: DuckDB multiplies same-width
             -- decimals on the int64 fast path and overflows at
             -- sf>=0.1 daily revenues; 19+18=37 <= 38 forces int128
             -- (values unchanged -- decimal arithmetic is exact)
             SUM(CAST(rev AS DECIMAL(19,2)) * rev)
               OVER (ORDER BY day) AS cssd,
             COUNT(*) OVER () AS n,
             SUM(rev) OVER () AS tsd,
             SUM(CAST(rev AS DECIMAL(19,2)) * rev) OVER () AS tssd
      FROM daily
    ),
    cum AS (
      SELECT day, t, n,
             CAST(CAST(csd AS DECIMAL(18,2)) AS DOUBLE) AS cs,
             CAST(CAST(cssd - (cssd % 1) AS DECIMAL(38,0))
                  AS DOUBLE) AS css,
             CAST(CAST(tsd AS DECIMAL(18,2)) AS DOUBLE) AS ts,
             CAST(CAST(tssd - (tssd % 1) AS DECIMAL(38,0))
                  AS DOUBLE) AS tss
      FROM cumd
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
           sse_total,
           sse_split,
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
    Ties break to the earliest day.

    Float discipline: (Σx, Σx²) accumulate as EXACT decimals (money ×
    money stays within DECIMAL(38,4); order-proof on both engines) and
    convert to double only at the closed form — a double SUM is
    partition-order-dependent in its last ulp, which at this magnitude
    (~1e15) survives ROUND(,4) and would flip the driver's value hash
    run to run.  The conversions ride the SAFE-CAST rule: a decimal is
    rescaled to scale 0 (or a scale-2 int64) BEFORE the double cast,
    because DuckDB casts DECIMAL(38,s>0) via int128→double THEN /10^s
    (two roundings, observed 1 ulp off Spark's correctly-rounded
    BigDecimal path)."""
    od = _t(spark, sf_dir, "orders")
    daily = od.groupBy(
        F.to_date(F.date_trunc("DAY", "o_orderdate")).alias("day")
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("decimal(18,2)")
        .alias("rev")
    )
    wc = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy()
    def _trunc_dbl(c):
        # exact decimal truncation (x - x%1) BEFORE the scale-0 cast:
        # Spark's decimal downscale rounds HALF_UP while DuckDB's
        # truncates — stripping the fraction exactly makes the cast a
        # no-op on both, and the integral int→double is then a single
        # correct rounding (bit-equal cross-engine, probe-verified)
        return (c - c % 1).cast("decimal(38,0)").cast("double")

    cum = daily.select(
        "day",
        F.row_number().over(Window.orderBy("day")).alias("t"),
        F.sum("rev").over(wc).cast("decimal(18,2)")
        .cast("double").alias("cs"),
        _trunc_dbl(
            F.sum(F.col("rev") * F.col("rev")).over(wc)
        ).alias("css"),
        F.count(F.lit(1)).over(wall).alias("n"),
        F.sum("rev").over(wall).cast("decimal(18,2)")
        .cast("double").alias("ts"),
        _trunc_dbl(
            F.sum(F.col("rev") * F.col("rev")).over(wall)
        ).alias("tss"),
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
            sse_total.alias("sse_total"),
            sse_split.alias("sse_split"),
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
             -- exact decimal accumulation + cents-integer safe cast
             -- (q418 discipline): at sf1 two days' revenues tie within
             -- ONE ULP, so an order-dependent double SUM flips the
             -- strict above/below-median comparison between engines
             CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100
                       AS DECIMAL(38,0)) AS DOUBLE) / 100 AS rev
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
    One ordered lag over the daily aggregate, then scalar algebra.
    Daily revenue accumulates as an exact decimal (q418 discipline):
    at sf1 two days tie within one ulp, so an order-dependent double
    SUM flips the strict median comparison between engines."""
    od = _t(spark, sf_dir, "orders")
    daily = od.groupBy(
        F.to_date(F.date_trunc("DAY", "o_orderdate")).alias("day")
    ).agg(
        (
            (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
            .cast("decimal(38,0)")
            .cast("double")
            / 100
        ).alias("rev")
    )
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
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                  AS DECIMAL(18,2)) AS rev
      FROM orders GROUP BY 1
    ),
    seq AS (
      SELECT rev, ROW_NUMBER() OVER (ORDER BY day) AS rn FROM daily
      QUALIFY rn <= 2048
    ),
    blocks AS (
      SELECT j.j, (s.rn - 1) // POWER(2, j.j - 1)::BIGINT AS g,
             CAST(SUM(s.rev) AS DECIMAL(18,2)) AS sv
      FROM seq s CROSS JOIN (VALUES (1), (2), (3), (4)) AS j(j)
      GROUP BY 1, 2
    ),
    details AS (
      SELECT j, g // 2 AS parent,
             CAST(SUM(CASE WHEN g % 2 = 0 THEN sv ELSE 0 END)
                  - SUM(CASE WHEN g % 2 = 1 THEN sv ELSE 0 END)
                  AS DECIMAL(18,2)) AS dnum
      FROM blocks GROUP BY j, g // 2
      HAVING COUNT(*) = 2
    ),
    energy AS (
      -- DECIMAL(19,2) widening: see q418 (int64-path multiply
      -- overflows at sf>=0.1; int128 path is value-identical)
      SELECT j, COUNT(*) AS n_coeffs,
             SUM(CAST(dnum AS DECIMAL(19,2)) * dnum) AS sed
      FROM details GROUP BY j
    ),
    en AS (
      SELECT j, n_coeffs,
             CAST(CAST(sed - (sed % 1) AS DECIMAL(38,0)) AS DOUBLE)
               / POWER(4.0, j) AS e
      FROM energy
    ),
    one AS (
      SELECT MAX(CASE WHEN j = 1 THEN e END) AS e1,
             MAX(CASE WHEN j = 2 THEN e END) AS e2,
             MAX(CASE WHEN j = 3 THEN e END) AS e3,
             MAX(CASE WHEN j = 4 THEN e END) AS e4
      FROM en
    )
    SELECT CAST(j AS BIGINT) AS level,
           CAST(n_coeffs AS BIGINT) AS n_coeffs,
           e AS energy,
           ROUND(e / ((COALESCE(e1, 0) + COALESCE(e2, 0))
                      + (COALESCE(e3, 0) + COALESCE(e4, 0))), 6)
             AS energy_share
    FROM en CROSS JOIN one
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
    companion to q412's fixed-period seasonal fit.

    Float discipline (q418's): the detail numerators (block-sum
    differences) and their squared sums accumulate as EXACT decimals;
    the /4^j mean-and-half scaling is a power-of-two exponent shift
    (exact on doubles), and the level total adds the four exact
    energies in one fixed-shape expression — no order-dependent
    double SUM anywhere."""
    od = _t(spark, sf_dir, "orders")
    daily = od.groupBy(
        F.to_date(F.date_trunc("DAY", "o_orderdate")).alias("day")
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("decimal(18,2)")
        .alias("rev")
    )
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
        .agg(F.sum("rev").cast("decimal(18,2)").alias("sv"))
    )
    details = (
        blocks.groupBy("j", (F.col("g") / 2).cast("bigint").alias("parent"))
        .agg(
            (
                F.sum(F.when(F.col("g") % 2 == 0, F.col("sv")).otherwise(0))
                - F.sum(
                    F.when(F.col("g") % 2 == 1, F.col("sv")).otherwise(0)
                )
            )
            .cast("decimal(18,2)")
            .alias("dnum"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .filter(F.col("cnt") == 2)
    )
    sed = F.sum(F.col("dnum") * F.col("dnum"))
    en = details.groupBy("j").agg(
        F.count(F.lit(1)).alias("n_coeffs"),
        (
            (sed - sed % 1).cast("decimal(38,0)").cast("double")
            / F.pow(F.lit(4.0), F.col("j"))
        ).alias("e"),
    )
    one = en.agg(
        *[
            F.max(F.when(F.col("j") == i, F.col("e"))).alias(f"e{i}")
            for i in (1, 2, 3, 4)
        ]
    )
    total = (
        F.coalesce("e1", F.lit(0.0)) + F.coalesce("e2", F.lit(0.0))
    ) + (F.coalesce("e3", F.lit(0.0)) + F.coalesce("e4", F.lit(0.0)))
    return en.crossJoin(F.broadcast(one)).select(
        F.col("j").cast("bigint").alias("level"),
        F.col("n_coeffs").cast("bigint").alias("n_coeffs"),
        F.col("e").alias("energy"),
        F.round(F.col("e") / total, 6).alias("energy_share"),
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
             -- exact <=4dp product + decimal SUM + cents safe cast
             -- (q429/q177 discipline): the q90 threshold comparison
             -- is knife-edge and double-SUM ulps flip it at sf1
             CAST(CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount)
                                      AS DECIMAL(18,4))), 2) * 100
                       AS DECIMAL(38,0)) AS DOUBLE) / 100 AS price
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
        (
            (
                F.round(
                    F.sum(
                        (
                            F.col("l_extendedprice")
                            * (F.lit(1) - F.col("l_discount"))
                        ).cast("decimal(18,4)")
                    ),
                    2,
                )
                * 100
            )
            .cast("decimal(38,0)")
            .cast("double")
            / 100
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
