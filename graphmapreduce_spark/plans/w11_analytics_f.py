"""Analytics arc F: closing arcs + the composed 100 TB dedup recipe (q576).

Part 11/11 of the query registry (split from the former single-file
workload.py); importing this module registers its queries in
``plans._shared.QUERIES``.
"""

from graphmapreduce_spark.plans._shared import *  # noqa: F401,F403

@register(
    "q561_cochran_q",
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
      SELECT CASE WHEN f.n_chars > m.mc THEN 1 ELSE 0 END AS g1,
             CASE WHEN f.wc > m.mw THEN 1 ELSE 0 END AS g2,
             CASE WHEN f.awl > m.ma THEN 1 ELSE 0 END AS g3
      FROM feat f CROSS JOIN med m
    ),
    s AS (
      SELECT COUNT(*)::DOUBLE AS n,
             SUM(g1)::DOUBLE AS c1, SUM(g2)::DOUBLE AS c2,
             SUM(g3)::DOUBLE AS c3,
             SUM(g1 + g2 + g3)::DOUBLE AS sr,
             SUM(POWER(g1 + g2 + g3, 2))::DOUBLE AS sr2
      FROM votes
    )
    SELECT CAST(n AS BIGINT) AS n_docs,
           ROUND(c1 / n, 6) AS pass_rate_chars,
           ROUND(c2 / n, 6) AS pass_rate_words,
           ROUND(c3 / n, 6) AS pass_rate_awl,
           ROUND(2 * (3 * (c1 * c1 + c2 * c2 + c3 * c3) - sr * sr)
                 / (3 * sr - sr2), 4) AS cochran_q
    FROM s
    """,
)
def q561_cochran_q(spark, sf_dir):
    """Cochran's Q across the three binary quality gates of q479: do
    the gates pass DIFFERENT proportions of documents?  Q = (k−1)
    (kΣCⱼ²−(ΣCⱼ)²)/(kΣRᵢ−ΣRᵢ²) ~ χ²₂ — the marginal-homogeneity
    complement to Fleiss' kappa (raters can AGREE highly yet differ
    systematically in strictness; kappa sees the first, Q the
    second, and a gate ensemble needs both checks).  All terms from
    one per-document vote fold."""
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
    votes = feat.crossJoin(F.broadcast(med)).select(
        F.when(F.col("n_chars") > F.col("mc"), 1).otherwise(0).alias("g1"),
        F.when(F.col("wc") > F.col("mw"), 1).otherwise(0).alias("g2"),
        F.when(F.col("awl") > F.col("ma"), 1).otherwise(0).alias("g3"),
    )
    r = F.col("g1") + F.col("g2") + F.col("g3")
    s = votes.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("g1").cast("double").alias("c1"),
        F.sum("g2").cast("double").alias("c2"),
        F.sum("g3").cast("double").alias("c3"),
        F.sum(r).cast("double").alias("sr"),
        F.sum(F.pow(r, 2)).cast("double").alias("sr2"),
    )
    q = (
        2
        * (
            3
            * (
                F.col("c1") * F.col("c1")
                + F.col("c2") * F.col("c2")
                + F.col("c3") * F.col("c3")
            )
            - F.col("sr") * F.col("sr")
        )
        / (3 * F.col("sr") - F.col("sr2"))
    )
    return s.select(
        F.col("n").cast("bigint").alias("n_docs"),
        F.round(F.col("c1") / F.col("n"), 6).alias("pass_rate_chars"),
        F.round(F.col("c2") / F.col("n"), 6).alias("pass_rate_words"),
        F.round(F.col("c3") / F.col("n"), 6).alias("pass_rate_awl"),
        F.round(q, 4).alias("cochran_q"),
    )


@register(
    "q562_mcc",
    """
    WITH u AS (
      SELECT user_id,
             SUM(CASE WHEN event_type IN ('click', 'view')
                      THEN 1 ELSE 0 END)::DOUBLE AS engagement,
             SUM(CASE WHEN event_type = 'purchase'
                      THEN value ELSE 0 END) AS spend
      FROM events GROUP BY user_id
    ),
    med AS (
      SELECT quantile_cont(spend, 0.5) AS ms,
             quantile_cont(engagement, 0.5) AS me
      FROM u
    ),
    cells AS (
      SELECT SUM(CASE WHEN engagement > me AND spend > ms
                      THEN 1 ELSE 0 END)::DOUBLE AS tp,
             SUM(CASE WHEN engagement > me AND spend <= ms
                      THEN 1 ELSE 0 END)::DOUBLE AS fp,
             SUM(CASE WHEN engagement <= me AND spend > ms
                      THEN 1 ELSE 0 END)::DOUBLE AS fn,
             SUM(CASE WHEN engagement <= me AND spend <= ms
                      THEN 1 ELSE 0 END)::DOUBLE AS tn
      FROM u CROSS JOIN med
    )
    SELECT CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
           CAST(fn AS BIGINT) AS fn, CAST(tn AS BIGINT) AS tn,
           ROUND((tp * tn - fp * fn)
                 / SQRT((tp + fp) * (tp + fn)
                        * (tn + fp) * (tn + fn)), 6) AS mcc,
           ROUND((tp + tn) / (tp + fp + fn + tn), 6) AS accuracy
    FROM cells
    """,
)
def q562_mcc(spark, sf_dir):
    """Matthews correlation coefficient for the median-engagement →
    median-spend classifier: MCC = (TP·TN−FP·FN)/√(∏ margins) — the
    single confusion-matrix summary that stays honest under class
    imbalance, where accuracy (reported beside it) inflates; MCC
    closes the eval family q241/q448/q465/q535 by giving the
    BALANCED point-estimate at a fixed operating point.  One fold
    over the 2×2."""
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
    med = u.agg(
        F.expr("percentile(spend, 0.5)").alias("ms"),
        F.expr("percentile(engagement, 0.5)").alias("me"),
    )
    pe = F.col("engagement") > F.col("me")
    ps = F.col("spend") > F.col("ms")
    cells = u.crossJoin(F.broadcast(med)).agg(
        F.sum(F.when(pe & ps, 1).otherwise(0)).cast("double").alias("tp"),
        F.sum(F.when(pe & ~ps, 1).otherwise(0)).cast("double").alias("fp"),
        F.sum(F.when(~pe & ps, 1).otherwise(0)).cast("double").alias("fn"),
        F.sum(F.when(~pe & ~ps, 1).otherwise(0)).cast("double").alias("tn"),
    )
    tp, fp, fn, tn = (
        F.col("tp"), F.col("fp"), F.col("fn"), F.col("tn"),
    )
    return cells.select(
        tp.cast("bigint").alias("tp"),
        fp.cast("bigint").alias("fp"),
        fn.cast("bigint").alias("fn"),
        tn.cast("bigint").alias("tn"),
        F.round(
            (tp * tn - fp * fn)
            / F.sqrt((tp + fp) * (tp + fn) * (tn + fp) * (tn + fn)),
            6,
        ).alias("mcc"),
        F.round((tp + tn) / (tp + fp + fn + tn), 6).alias("accuracy"),
    )


@register(
    "q563_chain_drift",
    """
    WITH pm AS (
      SELECT p.p_brand AS brand,
             CAST(date_trunc('month', l.l_shipdate) AS DATE) AS mth,
             SUM(l.l_extendedprice) / SUM(l.l_quantity) AS price,
             SUM(l.l_quantity) AS qty
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY 1, 2
    ),
    linked AS (
      SELECT mth,
             SUM(price * prev_qty)
             / SUM(prev_price * prev_qty) AS monthly_laspeyres
      FROM (
        SELECT brand, mth, price, qty,
               LAG(price) OVER (PARTITION BY brand ORDER BY mth)
                 AS prev_price,
               LAG(qty) OVER (PARTITION BY brand ORDER BY mth)
                 AS prev_qty
        FROM pm
      )
      WHERE prev_price IS NOT NULL
      GROUP BY mth
    ),
    seq AS (
      SELECT mth, monthly_laspeyres,
             ROW_NUMBER() OVER (ORDER BY mth) AS rn,
             COUNT(*) OVER () AS n
      FROM linked
    ),
    lastyear AS (
      SELECT EXP(SUM(LN(monthly_laspeyres))) AS chained
      FROM seq WHERE rn > n - 12
    ),
    direct AS (
      SELECT SUM(c.price * b.qty) / SUM(b.price * b.qty) AS idx
      FROM (SELECT brand, price, qty FROM pm
            WHERE mth = (SELECT MIN(mth) FROM pm
                         WHERE mth > (SELECT MAX(mth)
                                      FROM pm) - INTERVAL 12 MONTH))
           b
      JOIN (SELECT brand, price FROM pm
            WHERE mth = (SELECT MAX(mth) FROM pm)) c
        ON b.brand = c.brand
    )
    SELECT ROUND(l.chained, 6) AS chained_index,
           ROUND(d.idx, 6) AS direct_index,
           ROUND(l.chained / d.idx - 1, 6) AS chain_drift
    FROM lastyear l CROSS JOIN direct d
    """,
)
def q563_chain_drift(spark, sf_dir):
    """Chain drift in the Laspeyres price index over the final 12
    months: the PRODUCT of month-over-month linked indices vs the
    single direct base-to-end index — with oscillating prices and
    quantities the chained index drifts systematically (the known
    index-number pathology that motivates multilateral methods), and
    the drift magnitude is the audit before trusting any chained
    KPI (q410's fixed-base family doesn't expose it).  Monthly links
    from one lag window, the chain as exp(Σln), the direct index as
    two endpoint joins."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    pm = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.to_date(F.date_trunc("MONTH", "l_shipdate")).alias("mth"),
        )
        .agg(
            (F.sum("l_extendedprice") / F.sum("l_quantity")).alias(
                "price"
            ),
            F.sum("l_quantity").alias("qty"),
        )
    )
    w = Window.partitionBy("brand").orderBy("mth")
    lagged = pm.select(
        "brand",
        "mth",
        "price",
        "qty",
        F.lag("price").over(w).alias("prev_price"),
        F.lag("qty").over(w).alias("prev_qty"),
    ).filter(F.col("prev_price").isNotNull())
    linked = lagged.groupBy("mth").agg(
        (
            F.sum(F.col("price") * F.col("prev_qty"))
            / F.sum(F.col("prev_price") * F.col("prev_qty"))
        ).alias("ml")
    )
    seq = linked.select(
        "mth",
        "ml",
        F.row_number().over(Window.orderBy("mth")).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    lastyear = seq.filter(F.col("rn") > F.col("n") - 12).agg(
        F.exp(F.sum(F.log("ml"))).alias("chained")
    )
    maxm = pm.agg(F.max("mth").alias("mx"))
    basem = (
        pm.crossJoin(F.broadcast(maxm))
        .filter(F.col("mth") > F.add_months(F.col("mx"), -12))
        .agg(F.min("mth").alias("bm"))
    )
    b = (
        pm.crossJoin(F.broadcast(basem))
        .filter(F.col("mth") == F.col("bm"))
        .select(
            F.col("brand").alias("bb"),
            F.col("price").alias("bp"),
            F.col("qty").alias("bq"),
        )
    )
    c = (
        pm.crossJoin(F.broadcast(maxm))
        .filter(F.col("mth") == F.col("mx"))
        .select(F.col("brand").alias("cb"), F.col("price").alias("cp"))
    )
    direct = b.join(c, F.col("bb") == F.col("cb")).agg(
        (
            F.sum(F.col("cp") * F.col("bq"))
            / F.sum(F.col("bp") * F.col("bq"))
        ).alias("idx")
    )
    return lastyear.crossJoin(F.broadcast(direct)).select(
        F.round("chained", 6).alias("chained_index"),
        F.round("idx", 6).alias("direct_index"),
        F.round(F.col("chained") / F.col("idx") - 1, 6).alias(
            "chain_drift"
        ),
    )


@register(
    "q564_cuped",
    """
    WITH med AS (
      SELECT quantile_cont(epoch_us(o_orderdate), 0.5) AS ms
      FROM orders
    ),
    u AS (
      SELECT o.o_custkey,
             SUM(CASE WHEN epoch_us(o.o_orderdate) < m.ms
                      THEN o.o_totalprice ELSE 0 END) AS pre,
             SUM(CASE WHEN epoch_us(o.o_orderdate) >= m.ms
                      THEN o.o_totalprice ELSE 0 END) AS post
      FROM orders o CROSS JOIN med m
      GROUP BY o.o_custkey
    ),
    s AS (
      SELECT COUNT(*)::DOUBLE AS n,
             AVG(pre) AS mx, AVG(post) AS my,
             SUM(pre * post) AS sxy, SUM(pre * pre) AS sxx,
             VAR_SAMP(post) AS vy, VAR_SAMP(pre) AS vx
      FROM u
    )
    SELECT CAST(n AS BIGINT) AS n_customers,
           ROUND((sxy - n * mx * my) / (sxx - n * mx * mx), 6)
             AS theta,
           ROUND(vy, 2) AS var_post,
           ROUND(vy * (1 - POWER(sxy - n * mx * my, 2)
                 / ((sxx - n * mx * mx) * (n - 1) * vy)), 2)
             AS var_cuped,
           ROUND(POWER(sxy - n * mx * my, 2)
                 / ((sxx - n * mx * mx) * (n - 1) * vy), 6)
             AS variance_reduction
    FROM s
    """,
)
def q564_cuped(spark, sf_dir):
    """CUPED variance reduction for customer spend: θ = cov(pre,
    post)/var(pre) and the adjusted-metric variance var(post)(1−ρ²)
    — the industry-standard trick that shrinks an A/B test's
    required sample by exactly ρ² using only PRE-period data (no
    model, no assumptions beyond linearity), the practical payoff of
    the q320-style covariate screening.  Here ρ² is measured on the
    fixture's own pre/post split: one customer fold and scalar
    algebra."""
    od = _t(spark, sf_dir, "orders")
    us = F.unix_micros(F.col("o_orderdate").cast("timestamp"))
    med = od.agg(
        F.expr(
            "percentile(unix_micros(CAST(o_orderdate AS TIMESTAMP)), 0.5)"
        ).alias("ms")
    )
    u = (
        od.crossJoin(F.broadcast(med))
        .groupBy("o_custkey")
        .agg(
            F.sum(
                F.when(us < F.col("ms"), F.col("o_totalprice")).otherwise(
                    0.0
                )
            ).alias("pre"),
            F.sum(
                F.when(us >= F.col("ms"), F.col("o_totalprice")).otherwise(
                    0.0
                )
            ).alias("post"),
        )
    )
    cnt = F.count(F.lit(1))
    s = u.agg(
        cnt.cast("double").alias("n"),
        F.avg("pre").alias("mx"),
        F.avg("post").alias("my"),
        F.sum(F.col("pre") * F.col("post")).alias("sxy"),
        F.sum(F.col("pre") * F.col("pre")).alias("sxx"),
        F.var_samp("post").alias("vy"),
        F.var_samp("pre").alias("vx"),
    )
    n = F.col("n")
    cxy = F.col("sxy") - n * F.col("mx") * F.col("my")
    cxx = F.col("sxx") - n * F.col("mx") * F.col("mx")
    rho2 = F.pow(cxy, 2) / (cxx * (n - 1) * F.col("vy"))
    return s.select(
        n.cast("bigint").alias("n_customers"),
        F.round(cxy / cxx, 6).alias("theta"),
        F.round("vy", 2).alias("var_post"),
        F.round(F.col("vy") * (1 - rho2), 2).alias("var_cuped"),
        F.round(rho2, 6).alias("variance_reduction"),
    )


@register(
    "q565_p90_ci",
    """
    WITH ranked AS (
      SELECT o_totalprice AS x,
             ROW_NUMBER() OVER (ORDER BY o_totalprice) AS rk,
             COUNT(*) OVER () AS n
      FROM orders
    ),
    bounds AS (
      SELECT MAX(n) AS n,
             CAST(FLOOR(0.9 * MAX(n)
                  - 1.96 * SQRT(MAX(n) * 0.9 * 0.1)) AS BIGINT)
               AS lo_rank,
             CAST(CEIL(0.9 * MAX(n)
                  + 1.96 * SQRT(MAX(n) * 0.9 * 0.1)) + 1 AS BIGINT)
               AS hi_rank,
             CAST(CEIL(0.9 * MAX(n)) AS BIGINT) AS pt_rank
      FROM ranked
    )
    SELECT CAST(b.n AS BIGINT) AS n_orders,
           ROUND(m.x, 2) AS p90_estimate,
           ROUND(l.x, 2) AS ci_lo,
           ROUND(h.x, 2) AS ci_hi,
           ROUND((h.x - l.x) / m.x, 6) AS relative_width
    FROM bounds b
    JOIN ranked m ON m.rk = b.pt_rank
    JOIN ranked l ON l.rk = b.lo_rank
    JOIN ranked h ON h.rk = b.hi_rank
    """,
)
def q565_p90_ci(spark, sf_dir):
    """Distribution-free 95% CI for the 90th percentile of order
    value by order statistics: ranks 0.9n ∓ 1.96√(n·0.9·0.1)
    bracket the true quantile with binomial coverage — q518's
    median machinery shifted to the tail, where it matters more
    (tail quantiles drive q304's VaR and q433's stocking, and their
    CIs are MUCH wider than the median's at the same n — this query
    shows exactly how much).  The rank over the fact table goes
    through `sort.global_rank` (range-partitioned — no single-task
    window); three rows selected by rank."""
    import math

    from graphmapreduce_spark.operators import sort as GS

    od = _t(spark, sf_dir, "orders")
    ranked = GS.global_rank(
        od.select(F.col("o_totalprice").alias("x")), ["x"],
        rank_col="rk",
    )
    n = ranked.count()
    lo_rank = int(math.floor(0.9 * n - 1.96 * math.sqrt(n * 0.9 * 0.1)))
    hi_rank = int(math.ceil(0.9 * n + 1.96 * math.sqrt(n * 0.9 * 0.1))) + 1
    pt_rank = int(math.ceil(0.9 * n))
    picked = ranked.filter(
        F.col("rk").isin(lo_rank, hi_rank, pt_rank)
    )
    bounds = picked.agg(
        F.max(F.when(F.col("rk") == pt_rank, F.col("x"))).alias("mx"),
        F.max(F.when(F.col("rk") == lo_rank, F.col("x"))).alias("lx"),
        F.max(F.when(F.col("rk") == hi_rank, F.col("x"))).alias("hx"),
    )
    return (
        bounds.select(
            F.lit(n).cast("bigint").alias("n_orders"),
            F.round("mx", 2).alias("p90_estimate"),
            F.round("lx", 2).alias("ci_lo"),
            F.round("hx", 2).alias("ci_hi"),
            F.round(
                (F.col("hx") - F.col("lx")) / F.col("mx"), 6
            ).alias("relative_width"),
        )
    )


@register(
    "q566_pps_inclusion",
    """
    WITH o AS (
      SELECT o_orderkey, o_totalprice AS x FROM orders
    ),
    tot AS (SELECT SUM(x) AS tx, COUNT(*)::DOUBLE AS n FROM o),
    p1 AS (
      SELECT o.o_orderkey, o.x, 100 * o.x / t.tx AS pi1
      FROM o CROSS JOIN tot t
    ),
    cert AS (
      SELECT COUNT(*)::DOUBLE AS nc,
             COALESCE(SUM(CASE WHEN pi1 >= 1 THEN x END), 0) AS cx
      FROM p1 WHERE pi1 >= 1
    ),
    p2 AS (
      SELECT p.o_orderkey, p.x,
             CASE WHEN p.pi1 >= 1 THEN 1.0
                  ELSE (100 - c.nc) * p.x / (t.tx - c.cx) END AS pi
      FROM p1 p CROSS JOIN cert c CROSS JOIN tot t
    )
    SELECT CAST(100 AS BIGINT) AS target_sample,
           CAST((SELECT nc FROM cert) AS BIGINT) AS certainty_units,
           ROUND(SUM(pi), 2) AS sum_inclusion_prob,
           ROUND(MAX(CASE WHEN pi < 1 THEN pi END), 6)
             AS max_noncertainty_pi,
           ROUND(SUM(pi * x) / SUM(x), 6)
             AS expected_value_coverage
    FROM p2
    """,
)
def q566_pps_inclusion(spark, sf_dir):
    """Probability-proportional-to-size audit design for a 100-order
    sample: first-pass inclusion probabilities n·xᵢ/Σx, CERTAINTY
    units (π≥1 — the whales you always audit) pulled out, and the
    residual budget re-spread over the rest — the sampling design
    that makes a 100-order audit cover the documented share of total
    VALUE, versus the ~n/N a uniform sample would.  Same two-pass
    cap-and-redistribute shape as q560's water-fill, applied to
    inclusion probabilities."""
    od = _t(spark, sf_dir, "orders")
    o = od.select("o_orderkey", F.col("o_totalprice").alias("x"))
    tot = o.agg(
        F.sum("x").alias("tx"), F.count(F.lit(1)).cast("double").alias("n")
    )
    p1 = o.crossJoin(F.broadcast(tot)).select(
        "o_orderkey", "x", (100 * F.col("x") / F.col("tx")).alias("pi1")
    )
    cert = p1.filter(F.col("pi1") >= 1).agg(
        F.count(F.lit(1)).cast("double").alias("nc"),
        F.coalesce(F.sum("x"), F.lit(0.0)).alias("cx"),
    )
    p2 = (
        p1.crossJoin(F.broadcast(cert))
        .crossJoin(F.broadcast(tot))
        .select(
            "x",
            F.when(F.col("pi1") >= 1, 1.0)
            .otherwise(
                (100 - F.col("nc"))
                * F.col("x")
                / (F.col("tx") - F.col("cx"))
            )
            .alias("pi"),
            "nc",
        )
    )
    return p2.agg(
        F.lit(100).cast("bigint").alias("target_sample"),
        F.max("nc").cast("bigint").alias("certainty_units"),
        F.round(F.sum("pi"), 2).alias("sum_inclusion_prob"),
        F.round(
            F.max(F.when(F.col("pi") < 1, F.col("pi"))), 6
        ).alias("max_noncertainty_pi"),
        F.round(
            F.sum(F.col("pi") * F.col("x")) / F.sum("x"), 6
        ).alias("expected_value_coverage"),
    )


@register(
    "q567_abc_migration",
    """
    WITH med AS (
      SELECT quantile_cont(epoch_us(l_shipdate), 0.5) AS ms
      FROM lineitem
    ),
    rev AS (
      SELECT l.l_partkey,
             CASE WHEN epoch_us(l.l_shipdate) < m.ms
                  THEN 0 ELSE 1 END AS h,
             SUM(l.l_extendedprice * (1 - l.l_discount)) AS r
      FROM lineitem l CROSS JOIN med m
      GROUP BY 1, 2
    ),
    classed AS (
      SELECT l_partkey, h,
             CASE WHEN SUM(r) OVER (PARTITION BY h
                      ORDER BY r DESC, l_partkey)
                      / SUM(r) OVER (PARTITION BY h) <= 0.8 THEN 'A'
                  WHEN SUM(r) OVER (PARTITION BY h
                      ORDER BY r DESC, l_partkey)
                      / SUM(r) OVER (PARTITION BY h) <= 0.95 THEN 'B'
                  ELSE 'C' END AS cls
      FROM rev
    )
    SELECT a.cls AS class_h1, b.cls AS class_h2,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           ROUND(COUNT(*)::DOUBLE
                 / SUM(COUNT(*)) OVER (PARTITION BY a.cls), 6)
             AS row_share
    FROM classed a JOIN classed b
      ON a.l_partkey = b.l_partkey AND a.h = 0 AND b.h = 1
    GROUP BY a.cls, b.cls
    """,
)
def q567_abc_migration(spark, sf_dir):
    """ABC-class migration matrix between the first and second half
    of the ship history: the 3×3 transition counts and row shares —
    a stable assortment keeps its diagonal heavy; heavy A→C flow
    means the revenue head churns and last year's 'count daily'
    policy (q411/q540) is mis-aimed at yesterday's winners.  Two
    half-partitioned cumulative-share windows and one self-join on
    part."""
    li = _t(spark, sf_dir, "lineitem")
    med = li.agg(
        F.expr(
            "percentile(unix_micros(CAST(l_shipdate AS TIMESTAMP)), 0.5)"
        ).alias("ms")
    )
    us = F.unix_micros(F.col("l_shipdate").cast("timestamp"))
    rev = (
        li.crossJoin(F.broadcast(med))
        .groupBy(
            "l_partkey",
            F.when(us < F.col("ms"), 0).otherwise(1).alias("h"),
        )
        .agg(
            F.sum(
                F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
            ).alias("r")
        )
    )
    wcum = Window.partitionBy("h").orderBy(
        F.col("r").desc(), "l_partkey"
    ).rowsBetween(Window.unboundedPreceding, 0)
    wh = Window.partitionBy("h")
    share = F.sum("r").over(wcum) / F.sum("r").over(wh)
    classed = rev.select(
        "l_partkey",
        "h",
        F.when(share <= 0.8, "A")
        .when(share <= 0.95, "B")
        .otherwise("C")
        .alias("cls"),
    )
    a = classed.filter(F.col("h") == 0).select(
        F.col("l_partkey").alias("pk"), F.col("cls").alias("class_h1")
    )
    b = classed.filter(F.col("h") == 1).select(
        F.col("l_partkey").alias("pk2"), F.col("cls").alias("class_h2")
    )
    j = a.join(b, F.col("pk") == F.col("pk2"))
    counts = j.groupBy("class_h1", "class_h2").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_parts")
    )
    wrow = Window.partitionBy("class_h1")
    return counts.select(
        "class_h1",
        "class_h2",
        "n_parts",
        F.round(
            F.col("n_parts").cast("double")
            / F.sum("n_parts").over(wrow),
            6,
        ).alias("row_share"),
    )


@register(
    "q568_spectral_entropy",
    """
    WITH daily AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
             -- q429/q418 discipline: exact decimal + cents safe cast
             CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100
                       AS DECIMAL(38,0)) AS DOUBLE) / 100 AS rev
      FROM orders GROUP BY 1
    ),
    seq AS (
      SELECT rev - AVG(rev) OVER () AS d,
             CAST(ROW_NUMBER() OVER (ORDER BY day) AS DOUBLE) AS t
      FROM daily
    ),
    periods AS (
      SELECT CAST(p AS DOUBLE) AS period
      FROM UNNEST(range(2, 29)) AS t(p)
    ),
    pw AS (
      SELECT p.period,
             POWER(SUM(s.d * COS(2 * 3.141592653589793
                                 * s.t / p.period)), 2)
             + POWER(SUM(s.d * SIN(2 * 3.141592653589793
                                   * s.t / p.period)), 2) AS pwr
      FROM seq s CROSS JOIN periods p
      GROUP BY p.period
    ),
    norm AS (
      SELECT period, pwr / SUM(pwr) OVER () AS ps FROM pw
    ),
    best AS (
      -- argmax by rank, never ps = (SELECT MAX(ps) ...): the subquery
      -- re-evaluates norm and its windowed double SUM can differ in
      -- the last ulp between evaluations, failing the self-equality
      -- (observed at sf1: peak_period NULL)
      SELECT period FROM norm ORDER BY ps DESC, period ASC LIMIT 1
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_periods,
           ROUND(-SUM(ps * LN(ps)) / LN(COUNT(*)), 6)
             AS spectral_entropy_norm,
           ROUND(1 + SUM(ps * LN(ps)) / LN(COUNT(*)), 6)
             AS forecastability,
           CAST(MAX(b.period) AS BIGINT) AS peak_period
    FROM norm CROSS JOIN best b
    """,
)
def q568_spectral_entropy(spark, sf_dir):
    """Normalized spectral entropy of daily revenue over periods
    2–28 days: flat spectrum (entropy→1) means white-noise-like,
    unforecastable beyond the mean; concentrated power (entropy→0)
    means one rhythm dominates and even a naive seasonal model will
    work — the single forecastability score that q458's four-period
    probe generalizes, and the principled triage before spending on
    any forecasting effort (q397's tournament).  27 trig-weighted
    folds over the daily aggregate."""
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
    wall = Window.partitionBy()
    seq = daily.select(
        (F.col("rev") - F.avg("rev").over(wall)).alias("d"),
        F.row_number()
        .over(Window.orderBy("day"))
        .cast("double")
        .alias("t"),
    )
    periods = od.sparkSession.createDataFrame(
        [(float(p),) for p in range(2, 29)], "period double"
    )
    ang = F.lit(2 * 3.141592653589793) * F.col("t") / F.col("period")
    pw = (
        seq.crossJoin(F.broadcast(periods))
        .groupBy("period")
        .agg(
            (
                F.pow(F.sum(F.col("d") * F.cos(ang)), 2)
                + F.pow(F.sum(F.col("d") * F.sin(ang)), 2)
            ).alias("pwr")
        )
    )
    norm = pw.select(
        "period", (F.col("pwr") / F.sum("pwr").over(wall)).alias("ps")
    )
    best = (
        norm.orderBy(F.desc("ps"), F.asc("period"))
        .limit(1)
        .select(F.col("period").alias("_pp"))
    )
    h = -F.sum(F.col("ps") * F.log("ps")) / F.log(
        F.count(F.lit(1)).cast("double")
    )
    return norm.crossJoin(F.broadcast(best)).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_periods"),
        F.round(h, 6).alias("spectral_entropy_norm"),
        F.round(1 - h, 6).alias("forecastability"),
        F.max("_pp").cast("bigint").alias("peak_period"),
    )


@register(
    "q569_survivorship_bias",
    """
    WITH maxy AS (
      SELECT MAX(date_part('year', o_orderdate)) AS my FROM orders
    ),
    cust AS (
      SELECT o.o_custkey,
             MIN(date_part('year', o.o_orderdate)) AS cohort,
             SUM(o.o_totalprice) AS lifetime,
             MAX(CASE WHEN date_part('year', o.o_orderdate) = m.my
                      THEN 1 ELSE 0 END) AS survivor
      FROM orders o CROSS JOIN maxy m
      GROUP BY o.o_custkey
    )
    SELECT CAST(cohort AS BIGINT) AS cohort_year,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(survivor) AS BIGINT) AS n_survivors,
           ROUND(AVG(lifetime), 2) AS mean_lifetime_all,
           ROUND(AVG(CASE WHEN survivor = 1 THEN lifetime END), 2)
             AS mean_lifetime_survivors,
           ROUND(AVG(CASE WHEN survivor = 1 THEN lifetime END)
                 / AVG(lifetime) - 1, 6) AS survivorship_bias
    FROM cust GROUP BY cohort
    """,
)
def q569_survivorship_bias(spark, sf_dir):
    """Survivorship bias, measured per acquisition cohort: mean
    lifetime spend of customers still active in the FINAL year vs
    the whole cohort — the inflation factor that silently enters any
    analysis run on 'current customers' (dashboards filtered to
    active accounts overstate historical LTV by exactly this
    ratio).  Early cohorts show the largest bias because they've had
    the longest to lose their small customers.  One customer fold
    with a final-year flag."""
    od = _t(spark, sf_dir, "orders")
    maxy = od.agg(F.max(F.year("o_orderdate")).alias("my"))
    cust = (
        od.crossJoin(F.broadcast(maxy))
        .groupBy("o_custkey")
        .agg(
            F.min(F.year("o_orderdate")).alias("cohort"),
            F.sum("o_totalprice").alias("lifetime"),
            F.max(
                F.when(F.year("o_orderdate") == F.col("my"), 1).otherwise(
                    0
                )
            ).alias("survivor"),
        )
    )
    surv_mean = F.avg(
        F.when(F.col("survivor") == 1, F.col("lifetime"))
    )
    return cust.groupBy(
        F.col("cohort").cast("bigint").alias("cohort_year")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.sum("survivor").cast("bigint").alias("n_survivors"),
        F.round(F.avg("lifetime"), 2).alias("mean_lifetime_all"),
        F.round(surv_mean, 2).alias("mean_lifetime_survivors"),
        F.round(surv_mean / F.avg("lifetime") - 1, 6).alias(
            "survivorship_bias"
        ),
    )


@register(
    "q570_lindy_effect",
    """
    WITH life AS (
      SELECT l_partkey,
             date_diff('month',
               MIN(CAST(date_trunc('month', l_shipdate) AS DATE)),
               MAX(CAST(date_trunc('month', l_shipdate) AS DATE)))
               AS span_m
      FROM lineitem GROUP BY l_partkey
    ),
    ages AS (
      SELECT CAST(a AS BIGINT) AS age
      FROM UNNEST([0, 6, 12, 18, 24, 36]) AS t(a)
    )
    SELECT a.age AS age_threshold_months,
           CAST(COUNT(*) AS BIGINT) AS n_parts_alive,
           -- RAW emission: AVG of BIGINTs is an exact integer sum
           -- followed by one correctly-rounded division on both
           -- engines (bit-identical); ROUND(,4) diverged at a true
           -- halfway point (40.59065 at sf0.1)
           AVG(l.span_m - a.age) AS mean_remaining_life_months,
           AVG(l.span_m) AS mean_total_life_months
    FROM ages a JOIN life l ON l.span_m >= a.age
    GROUP BY a.age
    """,
)
def q570_lindy_effect(spark, sf_dir):
    """Lindy-effect check on part sales lifespans: among parts that
    have already survived a months, does expected REMAINING life grow
    with a?  Increasing remaining life (heavy-tailed lifespans)
    says longevity predicts longevity — keep old SKUs; decreasing
    (light tails) says aging products die on schedule — sunset
    them.  (Lifespans are measured within the observation window —
    right-censoring inflates nothing here because every threshold
    sees the same truncation; documented.)  One per-part span
    aggregate, a 6-threshold broadcast sweep."""
    li = _t(spark, sf_dir, "lineitem")
    life = li.groupBy("l_partkey").agg(
        F.months_between(
            F.max(F.to_date(F.date_trunc("MONTH", "l_shipdate"))),
            F.min(F.to_date(F.date_trunc("MONTH", "l_shipdate"))),
        )
        .cast("bigint")
        .alias("span_m")
    )
    ages = li.sparkSession.createDataFrame(
        [(a,) for a in (0, 6, 12, 18, 24, 36)], "age bigint"
    )
    j = ages.join(life, life.span_m >= ages.age)
    return j.groupBy(F.col("age").alias("age_threshold_months")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_parts_alive"),
        F.avg(F.col("span_m") - F.col("age")).alias(
            "mean_remaining_life_months"
        ),
        F.avg("span_m").alias("mean_total_life_months"),
    )


@register(
    "q571_quartile_cv",
    """
    SELECT p.p_brand AS brand,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           -- RAW quantiles + ratio: both engines interpolate with the
           -- same formula on the same sorted values (bit-identical);
           -- ROUND(,2) diverged at a money halfway point (79140.275
           -- at sf0.1).  moment_cv keeps ROUND: its double sums are
           -- order-dependent in the last ulp but tiny vs 6 digits.
           quantile_cont(l.l_extendedprice, 0.25) AS q1,
           quantile_cont(l.l_extendedprice, 0.75) AS q3,
           (quantile_cont(l.l_extendedprice, 0.75)
                - quantile_cont(l.l_extendedprice, 0.25))
                / (quantile_cont(l.l_extendedprice, 0.75)
                 + quantile_cont(l.l_extendedprice, 0.25))
             AS quartile_cv,
           ROUND(STDDEV_SAMP(l.l_extendedprice)
                 / AVG(l.l_extendedprice), 6) AS moment_cv
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_brand
    """,
)
def q571_quartile_cv(spark, sf_dir):
    """Coefficient of quartile variation (Q₃−Q₁)/(Q₃+Q₁) of line
    prices per brand, beside the moment CV — the robust relative-
    dispersion measure that one fat-fingered price can't move, and
    the divergence between the two columns IS the outlier alarm (the
    ratio-scale analogue of comparing q101's std to q145's MAD).
    One grouped pass with two percentile aggregates."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    q1 = F.expr("percentile(l_extendedprice, 0.25)")
    q3 = F.expr("percentile(l_extendedprice, 0.75)")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
            q1.alias("q1"),
            q3.alias("q3"),
            ((q3 - q1) / (q3 + q1)).alias("quartile_cv"),
            F.round(
                F.stddev_samp("l_extendedprice")
                / F.avg("l_extendedprice"),
                6,
            ).alias("moment_cv"),
        )
    )


@register(
    "q572_bowley_skewness",
    """
    SELECT p.p_brand AS brand,
           ROUND(quantile_cont(l.l_quantity, 0.5), 2) AS median_qty,
           ROUND((quantile_cont(l.l_quantity, 0.75)
                + quantile_cont(l.l_quantity, 0.25)
                - 2 * quantile_cont(l.l_quantity, 0.5))
                / (quantile_cont(l.l_quantity, 0.75)
                 - quantile_cont(l.l_quantity, 0.25)), 6)
             AS bowley_skew,
           ROUND((quantile_cont(l.l_quantity, 0.9)
                + quantile_cont(l.l_quantity, 0.1)
                - 2 * quantile_cont(l.l_quantity, 0.5))
                / (quantile_cont(l.l_quantity, 0.9)
                 - quantile_cont(l.l_quantity, 0.1)), 6)
             AS kelley_skew
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_brand
    """,
)
def q572_bowley_skewness(spark, sf_dir):
    """Bowley (quartile) and Kelley (decile) skewness of quantity per
    brand: (Q₃+Q₁−2·median)/(Q₃−Q₁), bounded in [−1,1] and immune to
    tails — the robust counterparts of q454's moment skewness, and
    the pair whose DISAGREEMENT with the moment version localizes
    where the asymmetry lives (quartile-range vs decile-range vs
    extreme tail).  One grouped percentile pass."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")

    def pc(q):
        return F.expr(f"percentile(l_quantity, {q})")

    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.round(pc(0.5), 2).alias("median_qty"),
            F.round(
                (pc(0.75) + pc(0.25) - 2 * pc(0.5))
                / (pc(0.75) - pc(0.25)),
                6,
            ).alias("bowley_skew"),
            F.round(
                (pc(0.9) + pc(0.1) - 2 * pc(0.5))
                / (pc(0.9) - pc(0.1)),
                6,
            ).alias("kelley_skew"),
        )
    )


@register(
    "q573_overdispersion",
    """
    WITH daily AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
             COUNT(*)::DOUBLE AS c
      FROM orders GROUP BY 1
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
           ROUND(AVG(c), 4) AS mean_orders,
           ROUND(VAR_SAMP(c), 4) AS var_orders,
           ROUND(VAR_SAMP(c) / AVG(c), 6) AS vmr,
           ROUND((VAR_SAMP(c) / AVG(c) - 1)
                 * SQRT((COUNT(*) - 1) / 2.0), 4) AS dispersion_z
    FROM daily
    """,
)
def q573_overdispersion(spark, sf_dir):
    """Poisson overdispersion test on daily order counts: the
    variance-to-mean ratio (VMR=1 under Poisson arrivals) with its
    normal-approximation z — VMR>1 means orders arrive in BURSTS
    beyond random traffic, which changes capacity planning (q537)
    and makes Poisson-based alert thresholds fire constantly; the
    count-data sibling of q306's inter-event burstiness.  One daily
    fold."""
    od = _t(spark, sf_dir, "orders")
    daily = od.groupBy(
        F.to_date(F.date_trunc("DAY", "o_orderdate")).alias("day")
    ).agg(F.count(F.lit(1)).cast("double").alias("c"))
    vmr = F.var_samp("c") / F.avg("c")
    return daily.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.round(F.avg("c"), 4).alias("mean_orders"),
        F.round(F.var_samp("c"), 4).alias("var_orders"),
        F.round(vmr, 6).alias("vmr"),
        F.round(
            (vmr - 1)
            * F.sqrt((F.count(F.lit(1)) - 1) / F.lit(2.0)),
            4,
        ).alias("dispersion_z"),
    )


@register(
    "q574_peak_month_share",
    """
    WITH monthly AS (
      SELECT CAST(date_part('year', o_orderdate) AS BIGINT) AS yr,
             date_part('month', o_orderdate) AS mth,
             SUM(o_totalprice) AS r
      FROM orders GROUP BY 1, 2
    )
    SELECT yr AS year,
           CAST(COUNT(*) AS BIGINT) AS n_months,
           ROUND(MAX(r) / SUM(r), 6) AS peak_month_share,
           CAST(MAX_BY(mth, r) AS BIGINT) AS peak_month,
           ROUND(MAX(r) / (SUM(r) / COUNT(*)), 4)
             AS peak_vs_avg_month
    FROM monthly GROUP BY yr
    """,
)
def q574_peak_month_share(spark, sf_dir):
    """Seasonal concentration by year: the peak month's share of
    annual revenue, which month it is, and its ratio to the average
    month — the operational seasonality number (warehouse staffing
    is sized to the peak, not the mean), trendable year over year to
    see whether the business is getting MORE seasonal; a drifting
    peak month flags a calendar change rather than demand.  MAX_BY
    keeps the argmax in the same fold."""
    od = _t(spark, sf_dir, "orders")
    monthly = od.groupBy(
        F.year("o_orderdate").cast("bigint").alias("yr"),
        F.month("o_orderdate").alias("mth"),
    ).agg(F.sum("o_totalprice").alias("r"))
    return monthly.groupBy(F.col("yr").alias("year")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_months"),
        F.round(F.max("r") / F.sum("r"), 6).alias("peak_month_share"),
        F.expr("max_by(mth, r)").cast("bigint").alias("peak_month"),
        F.round(
            F.max("r") / (F.sum("r") / F.count(F.lit(1))), 4
        ).alias("peak_vs_avg_month"),
    )


@register(
    "q575_iqr_overlap",
    """
    WITH s AS (
      SELECT CASE WHEN l_discount >= 0.05 THEN 1 ELSE 0 END AS grp,
             quantile_cont(l_quantity, 0.25) AS q1,
             quantile_cont(l_quantity, 0.75) AS q3
      FROM lineitem
      GROUP BY CASE WHEN l_discount >= 0.05 THEN 1 ELSE 0 END
    ),
    wide AS (
      SELECT MAX(CASE WHEN grp = 1 THEN q1 END) AS a1,
             MAX(CASE WHEN grp = 1 THEN q3 END) AS a3,
             MAX(CASE WHEN grp = 0 THEN q1 END) AS b1,
             MAX(CASE WHEN grp = 0 THEN q3 END) AS b3
      FROM s
    )
    SELECT ROUND(a1, 2) AS disc_q1, ROUND(a3, 2) AS disc_q3,
           ROUND(b1, 2) AS full_q1, ROUND(b3, 2) AS full_q3,
           ROUND(GREATEST(LEAST(a3, b3) - GREATEST(a1, b1), 0)
                 / (GREATEST(a3, b3) - LEAST(a1, b1)), 6)
             AS iqr_overlap_jaccard
    FROM wide
    """,
)
def q575_iqr_overlap(spark, sf_dir):
    """Interquartile-range overlap (Jaccard of the two [Q₁,Q₃]
    intervals) between discounted and full-price quantities: a
    one-number 'do the two populations actually occupy different
    ranges' check that calibrates the significance verdicts — q419's
    z can be large while the IQRs overlap ~100% (big n, tiny shift),
    and this number is what the stakeholder's boxplot intuition
    actually reads.  One grouped percentile pass and interval
    algebra."""
    li = _t(spark, sf_dir, "lineitem")
    s = li.groupBy(
        F.when(F.col("l_discount") >= 0.05, 1).otherwise(0).alias("grp")
    ).agg(
        F.expr("percentile(l_quantity, 0.25)").alias("q1"),
        F.expr("percentile(l_quantity, 0.75)").alias("q3"),
    )
    wide = s.agg(
        F.max(F.when(F.col("grp") == 1, F.col("q1"))).alias("a1"),
        F.max(F.when(F.col("grp") == 1, F.col("q3"))).alias("a3"),
        F.max(F.when(F.col("grp") == 0, F.col("q1"))).alias("b1"),
        F.max(F.when(F.col("grp") == 0, F.col("q3"))).alias("b3"),
    )
    inter = F.greatest(
        F.least(F.col("a3"), F.col("b3"))
        - F.greatest(F.col("a1"), F.col("b1")),
        F.lit(0.0),
    )
    union = F.greatest(F.col("a3"), F.col("b3")) - F.least(
        F.col("a1"), F.col("b1")
    )
    return wide.select(
        F.round("a1", 2).alias("disc_q1"),
        F.round("a3", 2).alias("disc_q3"),
        F.round("b1", 2).alias("full_q1"),
        F.round("b3", 2).alias("full_q3"),
        F.round(inter / union, 6).alias("iqr_overlap_jaccard"),
    )


def _dedup_corpus_cte_body(
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 5,
    threshold: float = 0.5,
    est_margin: float = 0.2,
    sample_mod: int = 4,
    sample_margin: float = 0.1,
    seed: int = 42,
    src: str = "documents",
    text: str = "text",
) -> str:
    """Replicates pipeline.dedup_corpus end-to-end as a CTE chain (no
    leading WITH — callers compose it) ending in
    ``mapping(doc_id, canonical_id)``: exact dedup by
    text (min-id representative), the q46 MinHash-LSH chain over
    REPRESENTATIVES only, the est_margin signature-agreement prefilter,
    the hash-mod sampled-shingle Jaccard prefilter (both deterministic
    given the seed, so value-checkable), exact-Jaccard verification,
    recursive-CTE min-label closure, and the final doc → canonical
    mapping.  max_bucket_size=4096 cannot bind at sf0.01 (no band
    bucket holds >4096 representatives), so the uncapped SQL is
    exact.  ``src``/``text`` let the chain run over an upstream CTE
    (q591 feeds it the Gopher-gated normalized corpus)."""
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
    agree = " + ".join(
        f"(CASE WHEN sa.m{i} = sb.m{i} THEN 1 ELSE 0 END)"
        for i in range(num_hashes)
    )
    cut = max(0.0, threshold - est_margin)
    return f"""
    reps AS MATERIALIZED (
      SELECT MIN(doc_id) AS doc_id, {text} AS text
      FROM {src} GROUP BY {text}
    ),
    ex AS MATERIALIZED (
      SELECT d.doc_id, r.doc_id AS rep
      FROM {src} d JOIN reps r ON r.text = d.{text}
    ),
    sh AS MATERIALIZED (
      SELECT doc_id, list_distinct(list_transform(
               range(1, GREATEST(length(text) - {shingle_n - 1}, 0) + 1),
               i -> substr(text, i, {shingle_n}))) AS grams
      FROM reps
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
    agreed AS MATERIALIZED (
      SELECT id_a, id_b
      FROM cand
      JOIN sig sa ON sa.doc_id = id_a
      JOIN sig sb ON sb.doc_id = id_b
      WHERE {agree} >= {cut} * {num_hashes}
    ),
    shs AS MATERIALIZED (
      SELECT doc_id,
             list_filter(
               list_distinct(list_transform(grams,
                 g -> ('0x' || substr(md5(g), 1, 15))::BIGINT)),
               h -> h % {sample_mod} = 0) AS sgrams
      FROM sh
    ),
    sampled AS MATERIALIZED (
      SELECT id_a, id_b
      FROM agreed
      JOIN shs xa ON xa.doc_id = id_a
      JOIN shs xb ON xb.doc_id = id_b
      WHERE (len(xa.sgrams) + len(xb.sgrams)
             - len(list_filter(xa.sgrams,
                   h -> list_contains(xb.sgrams, h)))) < {8 * sample_mod}
         OR CAST(len(list_filter(xa.sgrams,
                     h -> list_contains(xb.sgrams, h))) AS DOUBLE)
            / (len(xa.sgrams) + len(xb.sgrams)
               - len(list_filter(xa.sgrams,
                     h -> list_contains(xb.sgrams, h))))
            >= {max(0.0, threshold - sample_margin)}
    ),
    pairs AS MATERIALIZED (
      SELECT id_a, id_b
      FROM sampled
      JOIN sh sa ON sa.doc_id = id_a
      JOIN sh sb ON sb.doc_id = id_b
      WHERE CAST(len(list_filter(sa.grams,
                     g -> list_contains(sb.grams, g))) AS DOUBLE)
            / (len(sa.grams) + len(sb.grams)
               - len(list_filter(sa.grams,
                     g -> list_contains(sb.grams, g)))) >= {threshold}
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
    clusters AS (SELECT id, MIN(lbl) AS cluster FROM reach GROUP BY id),
    mapping AS (
      SELECT e.doc_id, COALESCE(c.cluster, e.rep) AS canonical_id
      FROM ex e LEFT JOIN clusters c ON c.id = e.rep
    )"""


def _dedup_corpus_oracle_sql(**kw) -> str:
    return (
        "\n    WITH RECURSIVE"
        + _dedup_corpus_cte_body(**kw)
        + "\n    SELECT doc_id, canonical_id FROM mapping\n    "
    )


@register("q576_dedup_corpus", _dedup_corpus_oracle_sql())
def q576_dedup_corpus(spark, sf_dir):
    """[EXT] The production 100 TB dedup recipe as ONE composed,
    value-oracled operator (pipeline.dedup_corpus): exact dedup →
    MinHash-LSH over representatives with the measured cost knobs
    (est_margin signature prefilter + bucket-capped star expansion) →
    connected-component clustering → full doc→canonical mapping,
    never materializing within-cluster all-pairs.  md5 hash variant so
    the oracle replicates every stage bit-for-bit; production default
    is xxhash64."""
    from graphmapreduce_spark import pipeline as P

    d = _t(spark, sf_dir, "documents")
    return P.dedup_corpus(
        d,
        "doc_id",
        "text",
        threshold=0.5,
        num_hashes=32,
        shingle_n=5,
        hash_fn="md5",
        max_bucket_size=64,
        est_margin=0.2,
        verify_sample_mod=4,
    )


@register(
    "q577_rendezvous_sharding",
    """
    WITH h AS MATERIALIZED (
      SELECT doc_id, CAST(t.s AS BIGINT) AS s,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' ||
                                 CAST(t.s AS VARCHAR)), 1, 15))::BIGINT
               AS hv
      FROM documents, UNNEST(range(8)) AS t(s)
    ),
    m8 AS (SELECT doc_id, MAX(hv) AS mh FROM h GROUP BY doc_id),
    a8 AS (SELECT h.doc_id, MAX(h.s) AS shard
           FROM h JOIN m8 USING (doc_id) WHERE h.hv = m8.mh
           GROUP BY h.doc_id),
    m7 AS (SELECT doc_id, MAX(hv) AS mh FROM h WHERE s < 7
           GROUP BY doc_id),
    a7 AS (SELECT h.doc_id, MAX(h.s) AS shard
           FROM h JOIN m7 USING (doc_id)
           WHERE h.s < 7 AND h.hv = m7.mh
           GROUP BY h.doc_id)
    SELECT CAST(a8.shard AS BIGINT) AS from_shard,
           CAST(a7.shard AS BIGINT) AS to_shard,
           COUNT(*)::BIGINT AS n_moved
    FROM a8 JOIN a7 USING (doc_id)
    WHERE a8.shard <> a7.shard
    GROUP BY 1, 2
    """,
)
def q577_rendezvous_sharding(spark, sf_dir):
    """[EXT] Rendezvous (highest-random-weight) sharding stability
    audit: each document goes to the shard maximizing
    md5(doc_id:shard), assignments computed for 8 shards and for 7
    (shard 7 decommissioned), and the (from, to) migration matrix of
    moved documents returned.  The HRW property — ONLY the removed
    shard's documents move, and they spread evenly over survivors —
    is what makes incremental shard rebalancing at 100 TB a 1/S
    re-shuffle instead of a full one; this query IS the proof on real
    data (every from_shard row = 7).  Pure narrow expressions: the
    argmax over 8 seeded hashes is an in-row array_max of structs —
    no shuffle until the tiny migration-matrix agg."""
    d = _t(spark, sf_dir, "documents").select("doc_id")

    def assign(n_shards):
        return F.array_max(
            F.array(
                *[
                    F.struct(
                        T._hash_col(
                            F.concat_ws(
                                ":", F.col("doc_id"), F.lit(s)
                            ),
                            "md5",
                        ).alias("h"),
                        F.lit(s).cast("bigint").alias("s"),
                    )
                    for s in range(n_shards)
                ]
            )
        )["s"]

    moved = d.select(
        assign(8).alias("from_shard"), assign(7).alias("to_shard")
    ).filter(F.col("from_shard") != F.col("to_shard"))
    return moved.groupBy("from_shard", "to_shard").agg(
        F.count(F.lit(1)).alias("n_moved")
    )


@register(
    "q578_l_diversity",
    """
    WITH g AS (
      SELECT event_type,
             CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hod,
             COUNT(*)::BIGINT AS n_rows,
             COUNT(DISTINCT user_id)::BIGINT AS l
      FROM events GROUP BY 1, 2
    )
    SELECT CASE WHEN l < 2 THEN '1'
                WHEN l < 5 THEN '2-4'
                WHEN l < 20 THEN '5-19'
                ELSE '20+' END AS l_band,
           COUNT(*)::BIGINT AS n_groups,
           SUM(n_rows)::BIGINT AS n_rows,
           CAST(MIN(l) AS BIGINT) AS min_l
    FROM g GROUP BY 1
    """,
)
def q578_l_diversity(spark, sf_dir):
    """[EXT] l-diversity audit — the sensitive-attribute complement of
    q235's k-anonymity: per quasi-identifier class (event_type ×
    hour-of-day), the number of DISTINCT users (l); a class can be
    k-anonymous yet l=1 (every row the same person → attribute
    disclosure).  Banded rollup of l with the minimum per band.  One
    distinct-agg on the quasi-identifier partitioning; the bands are a
    4-row second agg."""
    e = _t(spark, sf_dir, "events")
    g = e.groupBy(
        "event_type", F.hour("ts").cast("bigint").alias("hod")
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_distinct("user_id").alias("l"),
    )
    band = (
        F.when(F.col("l") < 2, "1")
        .when(F.col("l") < 5, "2-4")
        .when(F.col("l") < 20, "5-19")
        .otherwise("20+")
    )
    return g.groupBy(band.alias("l_band")).agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum("n_rows").alias("n_rows"),
        F.min("l").cast("bigint").alias("min_l"),
    )


@register(
    "q579_source_interleave",
    """
    WITH srcs AS (
      SELECT source,
             ROW_NUMBER() OVER (ORDER BY source) - 1 AS src_idx,
             COUNT(*) OVER () AS n_sources
      FROM (SELECT DISTINCT source FROM documents)
    ),
    ranked AS (
      SELECT d.doc_id, d.source,
             ROW_NUMBER() OVER (
               PARTITION BY d.source
               ORDER BY ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)),
                                        1, 15))::BIGINT, d.doc_id
             ) - 1 AS rk
      FROM documents d
    )
    SELECT r.doc_id,
           CAST(r.rk * s.n_sources + s.src_idx AS BIGINT)
             AS interleave_pos
    FROM ranked r JOIN srcs s USING (source)
    """,
)
def q579_source_interleave(spark, sf_dir):
    """[EXT] Deterministic source-stratified interleave — the
    pretraining data-order op: documents are hash-shuffled WITHIN each
    source (content-keyed md5 order, engine- and layout-stable, the
    q78 sampling discipline) and round-robined across sources, so any
    prefix of the stream carries every source in proportion and reruns
    are bit-identical.  interleave_pos = within-source rank × n_sources
    + source index.  The per-source rank is a PARTITIONED window (per
    source, scale-safe); the source index table is |sources| rows,
    broadcast."""
    d = _t(spark, sf_dir, "documents")
    srcs = (
        d.select("source")
        .distinct()
        .withColumn(
            "src_idx",
            F.row_number().over(Window.orderBy("source")) - 1,
        )
        .withColumn(
            "n_sources", F.count(F.lit(1)).over(Window.partitionBy())
        )
    )
    w = Window.partitionBy("source").orderBy(
        T._hash_col(F.col("doc_id").cast("string"), "md5"), "doc_id"
    )
    ranked = d.select(
        "doc_id", "source", (F.row_number().over(w) - 1).alias("rk")
    )
    return ranked.join(F.broadcast(srcs), "source").select(
        "doc_id",
        (F.col("rk") * F.col("n_sources") + F.col("src_idx"))
        .cast("bigint")
        .alias("interleave_pos"),
    )


def _incremental_dedup_oracle_sql(
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 5,
    threshold: float = 0.5,
    seed: int = 42,
) -> str:
    """Two-sided replica of incremental_near_dup_pairs (md5 variant):
    batch = doc_id % 10 = 3, corpus = the rest; band buckets joined
    ACROSS sides only, exact-Jaccard verification."""
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
      SELECT doc_id, doc_id % 10 = 3 AS is_batch,
             list_distinct(list_transform(
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
    bnd AS MATERIALIZED (
      {band_rows}
    ),
    cand AS MATERIALIZED (
      SELECT DISTINCT b.doc_id AS batch_id, c.doc_id AS corpus_id
      FROM bnd b
      JOIN sh sb ON sb.doc_id = b.doc_id AND sb.is_batch
      JOIN bnd c ON c.bucket = b.bucket
      JOIN sh sc ON sc.doc_id = c.doc_id AND NOT sc.is_batch
    )
    SELECT batch_id, corpus_id,
           ROUND(CAST(len(list_filter(sa.grams,
                     g -> list_contains(sb.grams, g))) AS DOUBLE)
            / (len(sa.grams) + len(sb.grams)
               - len(list_filter(sa.grams,
                     g -> list_contains(sb.grams, g)))), 6) AS jaccard
    FROM cand
    JOIN sh sa ON sa.doc_id = batch_id
    JOIN sh sb ON sb.doc_id = corpus_id
    WHERE CAST(len(list_filter(sa.grams,
                  g -> list_contains(sb.grams, g))) AS DOUBLE)
          / (len(sa.grams) + len(sb.grams)
             - len(list_filter(sa.grams,
                   g -> list_contains(sb.grams, g)))) >= {threshold}
    """


@register("q580_incremental_dedup", _incremental_dedup_oracle_sql())
def q580_incremental_dedup(spark, sf_dir):
    """[EXT] Incremental batch-vs-corpus near-dup check
    (`operators/dedup.py incremental_near_dup_pairs`): a synthetic
    daily batch (doc_id % 10 = 3) screened against the rest of the
    corpus via a band-bucket equi join that NEVER pairs the corpus
    with itself — the production pattern whose cost scales with the
    batch, not the corpus.  md5 variant; the oracle replicates both
    sides' banding and the exact-Jaccard verify."""
    d = _t(spark, sf_dir, "documents")
    batch = d.filter(F.col("doc_id") % 10 == 3)
    corpus = d.filter(F.col("doc_id") % 10 != 3)
    return D.incremental_near_dup_pairs(
        corpus, batch, "doc_id", "text",
        threshold=0.5, num_hashes=32, shingle_n=5, hash_fn="md5",
    )


@register(
    "q581_bpe_merge_candidates",
    r"""
    WITH wc AS (
      SELECT w, COUNT(*)::BIGINT AS cnt FROM (
        SELECT UNNEST(list_filter(
                 string_split_regex(trim(lower(text)), '\s+'),
                 x -> x <> '')) AS w
        FROM documents
      ) GROUP BY w
    ),
    pairs AS (
      SELECT substr(w, CAST(i AS INTEGER), 2) AS pair, cnt
      FROM wc, UNNEST(range(1, length(w))) AS t(i)
      WHERE length(w) >= 2
    ),
    scored AS (
      SELECT pair, SUM(cnt)::BIGINT AS weighted_count
      FROM pairs GROUP BY pair
    )
    SELECT pair, weighted_count
    FROM scored
    ORDER BY weighted_count DESC, pair ASC
    LIMIT 20
    """,
)
def q581_bpe_merge_candidates(spark, sf_dir):
    """[EXT] One BPE vocabulary-induction step: the top-20 adjacent
    character pairs by corpus-frequency-weighted count — exactly the
    merge-candidate table a byte-pair-encoding trainer scores each
    round (subsequent rounds re-run the same plan over the merged
    symbol stream).  Shape: word-count agg (Zipf-bounded) → in-array
    pair build over the COLLAPSED vocab (pair work ∝ Σ|word|, not
    corpus size) → pair agg → TakeOrdered."""
    d = _t(spark, sf_dir, "documents")
    wc = (
        d.select(F.explode(T.words(F.lower(F.col("text")))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    pairs = wc.filter(F.length("w") >= 2).select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("w") - 1),
                lambda i: F.col("w").substr(i, F.lit(2)),
            )
        ).alias("pair"),
        "cnt",
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("cnt").alias("weighted_count"))
        .orderBy(F.desc("weighted_count"), F.asc("pair"))
        .limit(20)
    )


def _lsh_recall_oracle_sql(
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 5,
    threshold: float = 0.5,
    seed: int = 42,
    id_cap: int = 300,
) -> str:
    """Exact pair set (full inverted-index Jaccard) vs the banded LSH
    pair set on the same slice — measured recall + candidate
    efficiency, every stage md5-replicated."""
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
    jac = (
        "CAST(len(list_filter(sa.grams, g -> list_contains(sb.grams, g)))"
        " AS DOUBLE) / (len(sa.grams) + len(sb.grams)"
        " - len(list_filter(sa.grams, g -> list_contains(sb.grams, g))))"
    )
    return f"""
    WITH sh AS MATERIALIZED (
      SELECT doc_id, list_distinct(list_transform(
               range(1, GREATEST(length(text) - {shingle_n - 1}, 0) + 1),
               i -> substr(text, i, {shingle_n}))) AS grams
      FROM documents WHERE doc_id < {id_cap}
    ),
    inv AS (SELECT doc_id, UNNEST(grams) AS g FROM sh),
    exact AS MATERIALIZED (
      SELECT sa.doc_id AS id_a, sb.doc_id AS id_b
      FROM (SELECT DISTINCT a.doc_id AS ida, b.doc_id AS idb
            FROM inv a JOIN inv b
              ON a.g = b.g AND a.doc_id < b.doc_id) c
      JOIN sh sa ON sa.doc_id = c.ida
      JOIN sh sb ON sb.doc_id = c.idb
      WHERE {jac} >= {threshold}
    ),
    ids AS MATERIALIZED (
      SELECT doc_id,
             ('0x' || substr(md5(g), 1, 15))::BIGINT % {p} AS x
      FROM inv
    ),
    sig AS MATERIALIZED (
      SELECT doc_id,
             {mins}
      FROM ids GROUP BY doc_id
    ),
    bnd AS MATERIALIZED (
      {band_rows}
    ),
    cand AS MATERIALIZED (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bnd a JOIN bnd b
        ON a.bucket = b.bucket AND a.doc_id < b.doc_id
    ),
    lsh AS MATERIALIZED (
      SELECT id_a, id_b
      FROM cand
      JOIN sh sa ON sa.doc_id = id_a
      JOIN sh sb ON sb.doc_id = id_b
      WHERE {jac} >= {threshold}
    )
    SELECT (SELECT COUNT(*) FROM exact)::BIGINT AS n_exact,
           (SELECT COUNT(*) FROM lsh)::BIGINT AS n_lsh,
           (SELECT COUNT(*) FROM cand)::BIGINT AS n_candidates,
           ROUND((SELECT COUNT(*) FROM lsh)
                 / GREATEST((SELECT COUNT(*) FROM exact), 1)::DOUBLE, 6)
             AS recall,
           ROUND((SELECT COUNT(*) FROM lsh)
                 / GREATEST((SELECT COUNT(*) FROM cand), 1)::DOUBLE, 6)
             AS verify_efficiency
    """


@register("q582_lsh_measured_recall", _lsh_recall_oracle_sql())
def q582_lsh_measured_recall(spark, sf_dir):
    """[EXT] MEASURED banding recall on real data — the empirical
    companion to q274's analytic S-curve: the exact ≥-threshold pair
    set (full inverted-index Jaccard) vs the banded-LSH pair set on
    the same 300-doc slice, plus candidate efficiency (verified /
    candidates).  This is the audit a pipeline runs before trusting a
    (num_hashes, bands) configuration at corpus scale; every stage is
    deterministic md5, so recall itself is value-checked."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    exact = D.ngram_jaccard_pairs(
        d, "doc_id", "text", n=5, threshold=0.5, max_df=100000
    ).select("id_a", "id_b")
    sigs = D.minhash_signatures(
        d, "doc_id", "text", 32, 5, 42, "md5"
    ).withColumnRenamed("doc_id", "_id")
    cand = D.lsh_candidate_pairs(
        sigs, "_id", "sig", 32, 8, exact_buckets=True
    )
    lsh = D.minhash_lsh_near_dup_pairs(
        d, "doc_id", "text", threshold=0.5, num_hashes=32,
        shingle_n=5, hash_fn="md5",
    ).select("id_a", "id_b")
    n_exact = exact.count()
    n_lsh = lsh.count()
    n_cand = cand.count()
    spark_ = d.sparkSession
    return spark_.createDataFrame(
        [(n_exact, n_lsh, n_cand)],
        "n_exact long, n_lsh long, n_candidates long",
    ).select(
        "n_exact",
        "n_lsh",
        "n_candidates",
        F.round(
            F.col("n_lsh") / F.greatest(F.col("n_exact"), F.lit(1)), 6
        ).alias("recall"),
        F.round(
            F.col("n_lsh") / F.greatest(F.col("n_candidates"), F.lit(1)),
            6,
        ).alias("verify_efficiency"),
    )


def _streaming_ingest_oracle_sql(
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 5,
    threshold: float = 0.5,
    seed: int = 42,
) -> str:
    """Batch-equivalent of the streaming ingest filter: accepted =
    batch docs with NO ≥threshold near-dup in the static corpus
    (the q580 two-sided pipeline ending in an anti-join)."""
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
    jac = (
        "CAST(len(list_filter(sa.grams, g -> list_contains(sb.grams, g)))"
        " AS DOUBLE) / (len(sa.grams) + len(sb.grams)"
        " - len(list_filter(sa.grams, g -> list_contains(sb.grams, g))))"
    )
    return f"""
    WITH sh AS MATERIALIZED (
      SELECT doc_id, doc_id % 10 = 3 AS is_batch,
             list_distinct(list_transform(
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
    bnd AS MATERIALIZED (
      {band_rows}
    ),
    matched AS MATERIALIZED (
      SELECT DISTINCT b.doc_id AS batch_id
      FROM bnd b
      JOIN sh xb ON xb.doc_id = b.doc_id AND xb.is_batch
      JOIN bnd c ON c.bucket = b.bucket
      JOIN sh xc ON xc.doc_id = c.doc_id AND NOT xc.is_batch
      JOIN sh sa ON sa.doc_id = b.doc_id
      JOIN sh sb ON sb.doc_id = c.doc_id
      WHERE {jac} >= {threshold}
    )
    SELECT doc_id FROM documents
    WHERE doc_id % 10 = 3
      AND doc_id NOT IN (SELECT batch_id FROM matched)
    """


@register(
    "q583_streaming_dedup_ingest", _streaming_ingest_oracle_sql()
)
def q583_streaming_dedup_ingest(spark, sf_dir):
    """[EXT] Streaming ingest dedup — the daily-arrival pattern END TO
    END: new documents arrive as a file stream (2 micro-batches via
    maxFilesPerTrigger), each micro-batch is screened against the
    STATIC deduped corpus with `incremental_near_dup_pairs`
    (foreachBatch), and only documents with no ≥threshold near-dup in
    the corpus reach the sink.  The oracle is the batch-equivalent
    anti-join — valid because banding is per-document deterministic,
    so the micro-batch split cannot change the accepted set.  A real
    deployment persists the corpus band index; here it recomputes per
    batch (the plan shape under test is the candidate equi join)."""
    import glob as _glob
    import os as _os
    import tempfile

    d = _t(spark, sf_dir, "documents")
    corpus = (
        d.filter(F.col("doc_id") % 10 != 3)
        .select("doc_id", "text")
        .localCheckpoint(eager=True)
    )
    batch_docs = d.filter(F.col("doc_id") % 10 == 3).select(
        "doc_id", "text"
    )
    srcdir = tempfile.mkdtemp(prefix="gmr_ingest_src_")
    batch_docs.coalesce(2).write.mode("overwrite").parquet(srcdir)
    outdir = tempfile.mkdtemp(prefix="gmr_ingest_out_")

    def ingest(bdf, _bid):
        hits = (
            D.incremental_near_dup_pairs(
                corpus, bdf, "doc_id", "text",
                threshold=0.5, num_hashes=32, shingle_n=5,
                hash_fn="md5",
            )
            .select(F.col("batch_id").alias("doc_id"))
            .distinct()
        )
        bdf.join(hits, "doc_id", "left_anti").select(
            "doc_id"
        ).write.mode("append").parquet(outdir)

    q = (
        spark.readStream.schema(batch_docs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(srcdir)
        .writeStream.foreachBatch(ingest)
        .option(
            "checkpointLocation",
            tempfile.mkdtemp(prefix="gmr_ckpt_ingest_"),
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    if not _glob.glob(_os.path.join(outdir, "*.parquet")):
        return spark.createDataFrame([], "doc_id long")
    return spark.read.parquet(outdir)


@register(
    "q584_dedup_token_accounting",
    "\n    WITH RECURSIVE"
    + _dedup_corpus_cte_body()
    + r"""
    SELECT d.source,
           COUNT(*)::BIGINT AS n_docs_total,
           SUM(CASE WHEN cn.canonical_id = d.doc_id
                    THEN 1 ELSE 0 END)::BIGINT AS n_docs_kept,
           SUM(CASE WHEN cn.canonical_id = d.doc_id
                    THEN len(list_filter(
                           string_split_regex(trim(d.text), '\s+'),
                           x -> x <> ''))
                    ELSE 0 END)::BIGINT AS tokens_kept,
           ROUND(SUM(CASE WHEN cn.canonical_id = d.doc_id
                          THEN 1.0 ELSE 0.0 END) / COUNT(*), 6)
             AS kept_share
    FROM documents d JOIN mapping cn ON cn.doc_id = d.doc_id
    GROUP BY d.source""",
)
def q584_dedup_token_accounting(spark, sf_dir):
    """[EXT] Dedup-aware per-source token accounting — the dataset-card
    number: after the full `dedup_corpus` recipe, how many documents
    and whitespace tokens each source actually CONTRIBUTES (its kept
    canonical docs), and what fraction of its raw volume survives.  A
    source whose kept_share is far below the others is mostly
    duplicating the corpus — the budget-reallocation signal q231's
    within-source inflation can't see.  One recipe pass + one
    source-keyed agg."""
    from graphmapreduce_spark import pipeline as P

    d = _t(spark, sf_dir, "documents")
    canon = P.dedup_corpus(
        d, "doc_id", "text", threshold=0.5, num_hashes=32,
        shingle_n=5, hash_fn="md5", max_bucket_size=64,
        est_margin=0.2, verify_sample_mod=4,
    )
    kept = F.col("canonical_id") == F.col("doc_id")
    return (
        d.select("doc_id", "source", F.size(T.words("text")).alias("_nt"))
        .join(canon, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs_total"),
            F.sum(F.when(kept, 1).otherwise(0))
            .cast("bigint")
            .alias("n_docs_kept"),
            F.sum(F.when(kept, F.col("_nt")).otherwise(0))
            .cast("bigint")
            .alias("tokens_kept"),
            F.round(
                F.sum(F.when(kept, 1.0).otherwise(0.0))
                / F.count(F.lit(1)),
                6,
            ).alias("kept_share"),
        )
    )


def _maximal_matching_oracle_sql(rounds: int = 9) -> str:
    """Unrolled mutual-minimum handshake (measured 7 drain rounds at
    sf0.01; rounds past drain operate on an empty edge set, so a fixed
    unroll with margin is value-exact): per round, every vertex
    proposes to its minimum neighbour, mutual proposals with src < dst
    match, and both endpoints' edges leave the residual set."""
    steps = []
    for k in range(1, rounds + 1):
        steps.append(
            f"""p{k} AS MATERIALIZED (
      SELECT src, MIN(dst) AS t FROM s{k - 1} GROUP BY src
    ),
    m{k} AS MATERIALIZED (
      SELECT p1.src AS a, p1.t AS b
      FROM p{k} p1 JOIN p{k} p2 ON p2.src = p1.t AND p2.t = p1.src
      WHERE p1.src < p1.t
    ),
    g{k} AS MATERIALIZED (SELECT a AS id FROM m{k}
             UNION ALL SELECT b AS id FROM m{k}),
    s{k} AS MATERIALIZED (
      SELECT s.src, s.dst FROM s{k - 1} s
      WHERE s.src NOT IN (SELECT id FROM g{k})
        AND s.dst NOT IN (SELECT id FROM g{k})
    )"""
        )
    body = ",\n    ".join(steps)
    matches = "\n      UNION ALL ".join(
        f"SELECT a, b FROM m{k}" for k in range(1, rounds + 1)
    )
    return f"""
    WITH e0 AS MATERIALIZED (
      SELECT DISTINCT o_custkey AS src,
                      o_orderkey % 500 + 100000 AS dst
      FROM orders WHERE o_orderkey % 7 < 2
    ),
    s0 AS MATERIALIZED (
      SELECT DISTINCT src, dst FROM (
        SELECT src, dst FROM e0
        UNION ALL SELECT dst AS src, src AS dst FROM e0
      ) WHERE src <> dst
    ),
    {body}
    SELECT a, b FROM ({matches})
    ORDER BY a, b
    """


@register("q585_maximal_matching", _maximal_matching_oracle_sql())
def q585_maximal_matching(spark, sf_dir):
    """[EXT] Distributed maximal matching (mutual-minimum handshake,
    `graph/algorithms.py maximal_matching`) over the derived
    customer→order-priority edge table: disjoint matched pairs.
    Value-oracled via a fixed unroll of the handshake rounds
    (deterministic given min-proposal + id tiebreaks); the pytest
    goldens + no-unmatched-edge invariant in
    tests/test_graph_algorithms.py remain as the structural gate."""
    from graphmapreduce_spark.graph.property_graph import PropertyGraph

    od = _t(spark, sf_dir, "orders")
    edges = (
        od.filter(F.col("o_orderkey") % 7 < 2)
        .select(
            F.col("o_custkey").alias("src"),
            (
                F.col("o_orderkey") % 500 + 100000
            ).alias("dst"),
        )
        .distinct()
    )
    g = PropertyGraph.from_edges(edges)
    return alg.maximal_matching(g).orderBy("a", "b")


@register(
    "q586_dedup_corpus_best",
    "\n    WITH RECURSIVE"
    + _dedup_corpus_cte_body()
    + """,
    best AS (
      SELECT canonical_id, doc_id AS best_id FROM (
        SELECT cn.canonical_id, d.doc_id,
               ROW_NUMBER() OVER (
                 PARTITION BY cn.canonical_id
                 ORDER BY d.n_chars DESC, d.doc_id ASC) AS rn
        FROM mapping cn JOIN documents d ON d.doc_id = cn.doc_id
      ) WHERE rn = 1
    )
    SELECT cn.doc_id, b.best_id AS canonical_id
    FROM mapping cn JOIN best b USING (canonical_id)""",
)
def q586_dedup_corpus_best(spark, sf_dir):
    """[EXT] The dedup recipe with QUALITY-PREFERRED canonical
    selection (`dedup_corpus(prefer="n_chars")`): every document maps
    to its cluster's LONGEST member (smallest id on ties — the q77
    canonical_docs convention) instead of the smallest id — what a
    real pipeline keeps when near-dup copies differ in completeness.
    One extra max-struct agg per cluster + a broadcast-back join on
    top of the q576 plan."""
    from graphmapreduce_spark import pipeline as P

    d = _t(spark, sf_dir, "documents")
    return P.dedup_corpus(
        d, "doc_id", "text", threshold=0.5, num_hashes=32,
        shingle_n=5, hash_fn="md5", max_bucket_size=64,
        est_margin=0.2, verify_sample_mod=4, prefer="n_chars",
    )


def _corpus_index_batch_oracle_sql(
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 5,
    threshold: float = 0.5,
    seed: int = 42,
) -> str:
    """Composes the q576 recipe oracle (over the corpus slice) with the
    q580 incremental oracle (batch vs the KEPT canonicals) — the SQL
    replica of dedup_corpus(emit_index=True) → save/load index →
    incremental_near_dup_pairs(corpus_index=...)."""
    a, b = D._hash_coeffs(num_hashes, seed)
    p = D._MERSENNE
    bmins = ",\n             ".join(
        f"MIN(({int(a[i])} * x + {int(b[i])}) % {p}) AS m{i}"
        for i in range(num_hashes)
    )
    r = num_hashes // bands
    bband_rows = "\n      UNION ALL ".join(
        "SELECT doc_id, '{j}:' || {expr} AS bucket FROM bsig".format(
            j=j,
            expr=" || '_' || ".join(f"m{j * r + i}" for i in range(r)),
        )
        for j in range(bands)
    )
    body = _dedup_corpus_cte_body(
        num_hashes=num_hashes, bands=bands, shingle_n=shingle_n,
        threshold=threshold, seed=seed, src="corp",
    )
    head = (
        "\n    WITH RECURSIVE\n"
        "    corp AS MATERIALIZED (\n"
        "      SELECT doc_id, text FROM documents"
        " WHERE doc_id % 10 <> 3\n"
        "    ),\n"
        "    batchd AS MATERIALIZED (\n"
        "      SELECT doc_id, text FROM documents"
        " WHERE doc_id % 10 = 3\n"
        "    ),"
    )
    tail = f""",
    kept AS MATERIALIZED (
      SELECT DISTINCT canonical_id AS doc_id FROM mapping
    ),
    bsh AS MATERIALIZED (
      SELECT doc_id, list_distinct(list_transform(
               range(1, GREATEST(length(text) - {shingle_n - 1}, 0) + 1),
               i -> substr(text, i, {shingle_n}))) AS grams
      FROM batchd
    ),
    bids AS MATERIALIZED (
      SELECT doc_id,
             ('0x' || substr(md5(g), 1, 15))::BIGINT % {p} AS x
      FROM (SELECT doc_id, UNNEST(grams) AS g FROM bsh)
    ),
    bsig AS MATERIALIZED (
      SELECT doc_id,
             {bmins}
      FROM bids GROUP BY doc_id
    ),
    bbands AS MATERIALIZED (
      {bband_rows}
    ),
    bcand AS MATERIALIZED (
      SELECT DISTINCT b.doc_id AS batch_id, c.doc_id AS corpus_id
      FROM bbands b
      JOIN bands c ON c.bucket = b.bucket
      JOIN kept k ON k.doc_id = c.doc_id
    )
    SELECT batch_id, corpus_id,
           ROUND(CAST(len(list_filter(ba.grams,
                     g -> list_contains(ca.grams, g))) AS DOUBLE)
            / (len(ba.grams) + len(ca.grams)
               - len(list_filter(ba.grams,
                     g -> list_contains(ca.grams, g)))), 6) AS jaccard
    FROM bcand
    JOIN bsh ba ON ba.doc_id = batch_id
    JOIN sh ca ON ca.doc_id = corpus_id
    WHERE CAST(len(list_filter(ba.grams,
                  g -> list_contains(ca.grams, g))) AS DOUBLE)
          / (len(ba.grams) + len(ca.grams)
             - len(list_filter(ba.grams,
                   g -> list_contains(ca.grams, g)))) >= {threshold}"""
    return head + body + tail


@register("q587_corpus_index_batch", _corpus_index_batch_oracle_sql())
def q587_corpus_index_batch(spark, sf_dir):
    """[EXT] The corpus-dedup → index → daily-increment flow as ONE
    artifact chain (VERDICT r05 task 3): `dedup_corpus(emit_index=
    True)` dedups the corpus slice (doc_id % 10 ≠ 3) AND emits the
    band index over its kept canonicals; the index parquet
    round-trips through `save_near_dup_index`/`load_near_dup_index`;
    the synthetic daily batch (doc_id % 10 = 3) is then screened with
    `incremental_near_dup_pairs(corpus_index=...)` — the corpus text
    is never re-read on the batch path.  md5 variant so every stage
    is oracle-replicable."""
    import atexit
    import shutil
    import tempfile

    from graphmapreduce_spark import pipeline as P

    d = _t(spark, sf_dir, "documents")
    corpus = d.filter(F.col("doc_id") % 10 != 3)
    batch = d.filter(F.col("doc_id") % 10 == 3).select("doc_id", "text")
    _, idx = P.dedup_corpus(
        corpus, "doc_id", "text", threshold=0.5, num_hashes=32,
        shingle_n=5, hash_fn="md5", max_bucket_size=64,
        est_margin=0.2, verify_sample_mod=4, emit_index=True,
    )
    tmp = tempfile.mkdtemp(prefix="gmr_q587_index_")
    atexit.register(shutil.rmtree, tmp, ignore_errors=True)
    D.save_near_dup_index(idx, tmp)
    loaded = D.load_near_dup_index(spark, tmp)
    return D.incremental_near_dup_pairs(
        None, batch, "doc_id", "text", threshold=0.5,
        corpus_index=loaded,
    )


@register(
    "q591_corpus_pipeline_neardup",
    "\n    WITH RECURSIVE "
    + r"""norm AS (
      SELECT doc_id,
             trim(regexp_replace(regexp_replace(lower(text),
                  '[\x00-\x1f\x7f]', ' ', 'g'), '\s{2,}', ' ', 'g')) AS ntext
      FROM documents
    ),
    gbase AS (
      SELECT doc_id, ntext,
             list_filter(string_split_regex(trim(ntext), '\s+'),
                         w -> w <> '') AS ws,
             string_split(ntext, chr(10)) AS lines,
             length(regexp_replace(ntext, '\s', '', 'g')) AS nonspace
      FROM norm
    ),
    gm AS (
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
      FROM gbase
    ),
    gated AS MATERIALIZED (
      SELECT doc_id, ntext FROM gm
      WHERE n_words BETWEEN 20 AND 100000
        AND avg_word_len BETWEEN 3.0 AND 10.0
        AND alpha_frac >= 0.8 AND bullet_frac <= 0.9 AND stop_hits >= 1
    ),"""
    + _dedup_corpus_cte_body(src="gated", text="ntext")
    + r""",
    canon AS (
      SELECT g.doc_id, g.ntext
      FROM gated g JOIN mapping mp ON mp.doc_id = g.doc_id
      WHERE mp.canonical_id = g.doc_id
    ),
    toks AS (
      SELECT doc_id,
             len(regexp_extract_all(ntext,
                 '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]'))::BIGINT AS n_tokens
      FROM canon
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
def q591_corpus_pipeline_neardup(spark, sf_dir):
    """[EXT] The corpus-prep pipeline with the 100 TB dedup stage wired
    in (`pipeline.prepare_corpus(near_dup=True)`): normalize → Gopher
    gate → FULL `dedup_corpus` recipe over the gated normalized text
    (exact reps → capped MinHash-LSH → clusters → canonical mapping,
    only cluster canonicals survive) → tokenize → pack into 2048-token
    windows.  q141 is this flow with exact dedup only; this is the
    production swap its docstring promised, value-checked end-to-end
    by composing the q141 gate CTEs with the q576 recipe CTEs.  md5
    variant so every stage is oracle-replicable."""
    from graphmapreduce_spark.pipeline import prepare_corpus

    d = _t(spark, sf_dir, "documents")
    return prepare_corpus(
        d, "doc_id", "text", capacity=2048,
        near_dup=True,
        near_kwargs=dict(
            threshold=0.5, num_hashes=32, shingle_n=5, hash_fn="md5",
            max_bucket_size=64, est_margin=0.2, verify_sample_mod=4,
        ),
        # fixture register: terse technical docs (10-99 words)
        min_words=20, min_stopword_hits=1,
    )
