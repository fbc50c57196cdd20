"""Analytics arc D: forecast eval, causal, SPC, spectral, copulas.

Part 9/11 of the query registry (split from the former single-file
workload.py); importing this module registers its queries in
``plans._shared.QUERIES``.
"""

from graphmapreduce_spark.plans._shared import *  # noqa: F401,F403
from graphmapreduce_spark.plans.w05_corpus_ops import _MD5_BUCKET  # noqa: F401

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
             -- exact decimal accumulation + cents-integer safe cast
             -- (q429/q418 discipline): order-dependent double SUMs
             -- flip strict comparisons when two periods tie within
             -- an ulp (observed at sf1)
             CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100
                       AS DECIMAL(38,0)) AS DOUBLE) / 100 AS rev
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
    ).agg(
        (
            (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
            .cast("decimal(38,0)")
            .cast("double")
            / 100
        ).alias("rev")
    )
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
             -- exact decimal accumulation + cents-integer safe cast
             -- (q429/q418 discipline): order-dependent double SUMs
             -- flip strict comparisons when two periods tie within
             -- an ulp (observed at sf1)
             CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100
                       AS DECIMAL(38,0)) AS DOUBLE) / 100 AS rev
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
    ).agg(
        (
            (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
            .cast("decimal(38,0)")
            .cast("double")
            / 100
        ).alias("rev")
    )
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
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                  AS DECIMAL(18,2)) AS rev
      FROM orders GROUP BY 1
    ),
    mu AS (
      SELECT CAST(CAST(SUM(rev) AS DECIMAL(18,2)) AS DOUBLE)
               / COUNT(*) AS m
      FROM daily
    ),
    seq AS (
      SELECT CAST(rev AS DOUBLE) - m AS d,
             CAST(ROW_NUMBER() OVER (ORDER BY day) AS DOUBLE) AS t
      FROM daily CROSS JOIN mu
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
    ),
    p0 AS (
      SELECT period, c, sn, n, m2,
             (c * c + sn * sn) / n AS praw
      FROM terms
    )
    SELECT CAST(period AS BIGINT) AS period_days,
           CASE WHEN praw = 0 THEN 0.0
                ELSE ROUND(praw / POWER(10,
                             FLOOR(LOG10(ABS(praw))) - 8))
                     * POWER(10, FLOOR(LOG10(ABS(praw))) - 8)
           END AS power,
           ROUND(2 * SQRT(c * c + sn * sn) / n, 4) AS amplitude,
           ROUND(POWER(2 * SQRT(c * c + sn * sn) / n, 2) / 2 / m2, 6)
             AS var_share
    FROM p0
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
    Four periods × one pass over the daily aggregate.

    Float discipline: daily revenue accumulates as an exact decimal
    and centers on an explicit safe-cast double mean, so the only
    engine-divergent inputs left are the trig ulps (JVM Math.cos vs
    libm differ on ~27% of cells, probe-measured) — power is
    therefore emitted on a 9-significant-digit lattice (scale to
    [1e8,1e9), round to an integer, scale back; every step exact or
    correctly rounded), which absorbs the ~1e-14 relative drift that
    a 16-digit ROUND(,4) at this magnitude cannot."""
    od = _t(spark, sf_dir, "orders")
    daily = od.groupBy(
        F.to_date(F.date_trunc("DAY", "o_orderdate")).alias("day")
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("decimal(18,2)")
        .alias("rev")
    )
    mu = daily.agg(
        (
            F.sum("rev").cast("decimal(18,2)").cast("double")
            / F.count(F.lit(1))
        ).alias("m")
    )
    seq = daily.crossJoin(F.broadcast(mu)).select(
        (F.col("rev").cast("double") - F.col("m")).alias("d"),
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
    praw = p2 / F.col("n")
    sc = F.pow(F.lit(10.0), F.floor(F.log10(F.abs(praw))) - 8)
    return terms.select(
        F.col("period").cast("bigint").alias("period_days"),
        F.when(praw == 0, F.lit(0.0))
        .otherwise(F.round(praw / sc) * sc)
        .alias("power"),
        F.round(amp, 4).alias("amplitude"),
        F.round(F.pow(amp, 2) / 2 / F.col("m2"), 6).alias("var_share"),
    )


@register(
    "q459_variance_changepoint",
    """
    WITH daily AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                  AS DECIMAL(18,2)) AS rev
      FROM orders GROUP BY 1
    ),
    mu AS (
      SELECT CAST(ROUND(CAST(CAST(SUM(rev) AS DECIMAL(18,2)) AS DOUBLE)
                        / COUNT(*), 2) AS DECIMAL(18,2)) AS m
      FROM daily
    ),
    dev AS (
      SELECT day, CAST(rev - m AS DECIMAL(18,2)) AS dv
      FROM daily CROSS JOIN mu
    ),
    cumd AS (
      SELECT day,
             ROW_NUMBER() OVER (ORDER BY day) AS k,
             SUM(dv * dv) OVER (ORDER BY day) AS ckd,
             SUM(dv * dv) OVER () AS cnd,
             COUNT(*) OVER () AS n
      FROM dev
    ),
    cum AS (
      SELECT day, k, n,
             CAST(CAST(ckd - (ckd % 1) AS DECIMAL(38,0)) AS DOUBLE)
               AS ck,
             CAST(CAST(cnd - (cnd % 1) AS DECIMAL(38,0)) AS DOUBLE)
               AS cn
      FROM cumd
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
           var_left,
           var_right,
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
    earliest-day tiebreak.

    Float discipline (q418's): deviations center on the CENT-ROUNDED
    mean so Σ(x−μ)² accumulates as an EXACT decimal (order-proof on
    both engines, immune to double-SUM partition-order ulp drift at
    the ~1e14 magnitudes ROUND(,4) can't absorb), truncated to its
    integral part and safe-cast to double only at the closed form."""
    od = _t(spark, sf_dir, "orders")
    daily = od.groupBy(
        F.to_date(F.date_trunc("DAY", "o_orderdate")).alias("day")
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("decimal(18,2)")
        .alias("rev")
    )
    mu = daily.agg(
        F.round(
            F.sum("rev").cast("decimal(18,2)").cast("double")
            / F.count(F.lit(1)),
            2,
        )
        .cast("decimal(18,2)")
        .alias("m")
    )
    dev = daily.crossJoin(F.broadcast(mu)).select(
        "day", (F.col("rev") - F.col("m")).cast("decimal(18,2)").alias("dv")
    )
    wall = Window.partitionBy()
    wc = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)

    def _trunc_dbl(c):
        # exact decimal truncation before the scale-0 cast (Spark
        # rounds HALF_UP on downscale, DuckDB truncates) — then one
        # correctly-rounded int->double on both engines
        return (c - c % 1).cast("decimal(38,0)").cast("double")

    cum = dev.select(
        "day",
        F.row_number().over(Window.orderBy("day")).alias("k"),
        _trunc_dbl(F.sum(F.col("dv") * F.col("dv")).over(wc)).alias("ck"),
        _trunc_dbl(F.sum(F.col("dv") * F.col("dv")).over(wall)).alias("cn"),
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
            vl.alias("var_left"),
            vr.alias("var_right"),
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
             -- exact decimal accumulation + cents-integer safe cast
             -- (q429/q418 discipline): order-dependent double SUMs
             -- flip strict comparisons when two periods tie within
             -- an ulp (observed at sf1)
             CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100
                       AS DECIMAL(38,0)) AS DOUBLE) / 100 AS rev
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
        SELECT rev, 0.1::DOUBLE AS tau, q10 AS fc FROM test
        UNION ALL
        SELECT rev, 0.5::DOUBLE, q50 FROM test
        UNION ALL
        SELECT rev, 0.9::DOUBLE, q90 FROM test
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
    ).agg(
        (
            (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
            .cast("decimal(38,0)")
            .cast("double")
            / 100
        ).alias("rev")
    )
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
    from graphmapreduce_spark.operators import sort as GS

    od = _t(spark, sf_dir, "orders")
    ranked = GS.global_ntile(
        od.select(
            F.substring("o_orderpriority", 1, 1)
            .cast("bigint")
            .alias("pr"),
            "o_totalprice",
            "o_orderkey",
        ),
        ["o_totalprice", "o_orderkey"],
        4,
        tile_col="vq",
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
    from graphmapreduce_spark.operators import sort as GS

    d = _t(spark, sf_dir, "documents")
    wc = F.size(
        F.filter(F.split(F.trim(F.col("text")), r"\s+"), lambda w: w != "")
    )
    base = d.select("doc_id", "n_chars", wc.alias("_wc"))
    feat = GS.global_ntile(
        GS.global_ntile(
            base, ["n_chars", "doc_id"], 10, tile_col="i"
        ),
        ["_wc", "doc_id"],
        10,
        tile_col="j",
    ).select("i", "j")
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
      -- exact decimal money sums (q01/q411 sf10 class)
      SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
               AS v
      FROM orders GROUP BY 1
    ),
    sh AS (
      SELECT CAST(date_trunc('day', l_shipdate) AS DATE) AS day,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                      * (1 - CAST(l_discount AS DECIMAL(3,2))))
                  AS DOUBLE) AS v
      FROM lineitem GROUP BY 1
    ),
    s AS (
      SELECT (SELECT VAR_SAMP(v) FROM od) AS vo,
             (SELECT AVG(v) FROM od) AS mo,
             (SELECT VAR_SAMP(v) FROM sh) AS vs,
             (SELECT AVG(v) FROM sh) AS ms
    )
    -- magnitude-appropriate emission (q502 discipline): the raw
    -- variances reach 5e16 at sf10 where the engines' variance
    -- algorithms differ past the cent; the SDs carry the same
    -- information with ~1e-7 noise
    SELECT ROUND(SQRT(vo), 2) AS sd_order_value,
           ROUND(SQRT(vs), 2) AS sd_ship_value,
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
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(12,2)"))
        .cast("double")
        .alias("v")
    )
    shd = li.groupBy(
        F.to_date(F.date_trunc("DAY", "l_shipdate")).alias("day")
    ).agg(
        F.sum(
            F.col("l_extendedprice").cast("decimal(12,2)")
            * (
                F.lit(1).cast("decimal(3,2)")
                - F.col("l_discount").cast("decimal(3,2)")
            )
        )
        .cast("double")
        .alias("v")
    )
    so = odd.agg(
        F.var_samp("v").alias("vo"), F.avg("v").alias("mo")
    )
    ss = shd.agg(
        F.var_samp("v").alias("vs"), F.avg("v").alias("ms")
    )
    s = so.crossJoin(F.broadcast(ss))
    # SD emission, not raw variance (q502 discipline — see oracle)
    return s.select(
        F.round(F.sqrt("vo"), 2).alias("sd_order_value"),
        F.round(F.sqrt("vs"), 2).alias("sd_ship_value"),
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
           0.9::DOUBLE AS target_coverage,
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


@register(
    "q491_l_diversity",
    """
    WITH qi AS (
      SELECT n.n_name AS nation,
             CAST(date_part('year', o.o_orderdate) AS BIGINT) AS yr,
             COUNT(*)::DOUBLE AS k,
             COUNT(DISTINCT o.o_orderpriority)::DOUBLE AS l
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY 1, 2
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(MIN(k) AS BIGINT) AS min_k,
           CAST(MIN(l) AS BIGINT) AS min_l,
           CAST(SUM(CASE WHEN l < 3 THEN 1 ELSE 0 END) AS BIGINT)
             AS groups_l_lt_3,
           ROUND(SUM(CASE WHEN l < 3 THEN 1.0 ELSE 0 END) / COUNT(*), 6)
             AS frac_l_lt_3,
           ROUND(AVG(l), 4) AS avg_l
    FROM qi
    """,
)
def q491_l_diversity(spark, sf_dir):
    """l-diversity audit over the (nation, order-year) quasi-
    identifier: each QI group's count of DISTINCT sensitive values
    (order priority) — the privacy property q235's k-anonymity
    misses entirely: a group can hold 50 rows (k=50) that all share
    ONE priority, so membership leaks the attribute.  min-l and the
    fraction of groups below l=3 are the release gate.  One grouped
    scan with a distinct-count, one fold."""
    od = _t(spark, sf_dir, "orders")
    cu = _t(spark, sf_dir, "customer")
    na = _t(spark, sf_dir, "nation")
    qi = (
        od.join(cu, od.o_custkey == cu.c_custkey)
        .join(F.broadcast(na), cu.c_nationkey == na.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("yr"),
        )
        .agg(
            F.count(F.lit(1)).cast("double").alias("k"),
            F.countDistinct("o_orderpriority").cast("double").alias("l"),
        )
    )
    return qi.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.min("k").cast("bigint").alias("min_k"),
        F.min("l").cast("bigint").alias("min_l"),
        F.sum(F.when(F.col("l") < 3, 1).otherwise(0))
        .cast("bigint")
        .alias("groups_l_lt_3"),
        F.round(
            F.sum(F.when(F.col("l") < 3, 1.0).otherwise(0.0))
            / F.count(F.lit(1)),
            6,
        ).alias("frac_l_lt_3"),
        F.round(F.avg("l"), 4).alias("avg_l"),
    )


@register(
    "q492_sprt",
    """
    WITH med AS (
      SELECT quantile_cont(value, 0.5) AS mv
      FROM events WHERE event_type = 'purchase'
    ),
    seq AS (
      SELECT ROW_NUMBER() OVER (ORDER BY e.ts, e.event_id) AS rn,
             CASE WHEN e.value > m.mv
                  THEN LN(0.6 / 0.5) ELSE LN(0.4 / 0.5) END AS llr
      FROM events e CROSS JOIN med m
      WHERE e.event_type = 'purchase'
    ),
    cum AS (
      SELECT rn, SUM(llr) OVER (ORDER BY rn) AS c,
             COUNT(*) OVER () AS n
      FROM seq
    ),
    crossing AS (
      SELECT MIN(CASE WHEN c >= LN(19.0) OR c <= -LN(19.0)
                      THEN rn END) AS first_cross
      FROM cum
    ),
    final AS (
      SELECT MAX(CASE WHEN rn = n THEN c END) AS llr_final,
             MAX(n) AS n
      FROM cum
    )
    SELECT CAST(f.n AS BIGINT) AS n_events,
           CAST(x.first_cross AS BIGINT) AS first_cross_at,
           CASE WHEN x.first_cross IS NULL THEN 'continue'
                WHEN (SELECT c FROM cum WHERE rn = x.first_cross) > 0
                  THEN 'accept_h1'
                ELSE 'accept_h0' END AS decision,
           ROUND(f.llr_final, 4) AS llr_final
    FROM final f CROSS JOIN crossing x
    """,
)
def q492_sprt(spark, sf_dir):
    """Wald's SPRT replayed over the purchase stream: H₀ p=0.5 vs H₁
    p=0.6 for 'above-median purchase value', log-likelihood ratio
    accumulated in event order with ±ln19 boundaries (α=β=0.05) —
    the sequential test that stops the A/B experiment at the FIRST
    decisive sample instead of a fixed n (q310's power planner says
    how many you'd need; SPRT usually needs far fewer).  By
    construction the true rate is 0.5, so the replay should hit the
    LOWER boundary — a self-validating fixture.  One ordered cumsum,
    a min-crossing fold."""
    ev = _t(spark, sf_dir, "events")
    med = ev.filter(F.col("event_type") == "purchase").agg(
        F.expr("percentile(value, 0.5)").alias("mv")
    )
    import math

    up, dn = math.log(0.6 / 0.5), math.log(0.4 / 0.5)
    seq = (
        ev.filter(F.col("event_type") == "purchase")
        .crossJoin(F.broadcast(med))
        .select(
            F.row_number()
            .over(Window.orderBy("ts", "event_id"))
            .alias("rn"),
            F.when(F.col("value") > F.col("mv"), F.lit(up))
            .otherwise(F.lit(dn))
            .alias("llr"),
        )
    )
    wc = Window.orderBy("rn").rowsBetween(Window.unboundedPreceding, 0)
    cum = seq.select(
        "rn",
        F.sum("llr").over(wc).alias("c"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    bound = math.log(19.0)
    crossing = cum.agg(
        F.min(
            F.when(
                (F.col("c") >= bound) | (F.col("c") <= -bound),
                F.col("rn"),
            )
        ).alias("first_cross")
    )
    final = cum.agg(
        F.max(F.when(F.col("rn") == F.col("n"), F.col("c"))).alias(
            "llr_final"
        ),
        F.max("n").alias("n"),
    )
    cross_val = (
        cum.join(
            F.broadcast(crossing),
            cum.rn == F.col("first_cross"),
            "inner",
        )
        .select(F.col("c").alias("cross_c"))
    )
    base = final.crossJoin(F.broadcast(crossing))
    # left join the crossing value (empty if never crossed)
    base = base.crossJoin(
        F.broadcast(
            cross_val.agg(F.max("cross_c").alias("cross_c"))
        )
    )
    return base.select(
        F.col("n").cast("bigint").alias("n_events"),
        F.col("first_cross").cast("bigint").alias("first_cross_at"),
        F.when(F.col("first_cross").isNull(), "continue")
        .when(F.col("cross_c") > 0, "accept_h1")
        .otherwise("accept_h0")
        .alias("decision"),
        F.round("llr_final", 4).alias("llr_final"),
    )


@register(
    "q493_gumbel_copula",
    """
    WITH b AS (
      SELECT p.p_brand AS brand,
             AVG(l.l_extendedprice / l.l_quantity) AS x,
             SUM(l.l_quantity) AS y
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY p.p_brand
    ),
    pairs AS (
      SELECT SUM(CASE WHEN (a.x - c.x) * (a.y - c.y) > 0
                      THEN 1 ELSE 0 END)::DOUBLE AS conc,
             SUM(CASE WHEN (a.x - c.x) * (a.y - c.y) < 0
                      THEN 1 ELSE 0 END)::DOUBLE AS disc,
             COUNT(*)::DOUBLE AS np
      FROM b a JOIN b c ON a.brand < c.brand
    ),
    tau AS (
      SELECT (conc - disc) / np AS t FROM pairs
    )
    SELECT ROUND(t, 6) AS kendall_tau,
           ROUND(CASE WHEN t > 0 AND t < 1
                      THEN 1 / (1 - t) END, 4) AS gumbel_theta,
           ROUND(CASE WHEN t > 0 AND t < 1
                      THEN 2 - POWER(2, 1 - t) END, 6)
             AS implied_upper_tail_dep
    FROM tau
    """,
)
def q493_gumbel_copula(spark, sf_dir):
    """Gumbel copula calibrated by inversion of Kendall's tau
    (θ = 1/(1−τ)) on the brand price/volume dependence, with the
    copula's implied upper-tail dependence 2 − 2^(1/θ) — the
    parametric bridge between q415's rank concordance and q435's
    empirical tail coincidence: fit the whole dependence structure
    from ONE robust statistic, then read off the tail.  A Gumbel fit
    only exists for positive dependence (τ≤0 → NULL columns, the
    honest answer).  All O(k²) work stays on the 25-brand aggregate."""
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
    prod = (F.col("a.x") - F.col("c.x")) * (F.col("a.y") - F.col("c.y"))
    pairs = a.join(c, F.col("a.brand") < F.col("c.brand")).agg(
        F.sum(F.when(prod > 0, 1).otherwise(0))
        .cast("double")
        .alias("conc"),
        F.sum(F.when(prod < 0, 1).otherwise(0))
        .cast("double")
        .alias("disc"),
        F.count(F.lit(1)).cast("double").alias("np"),
    )
    tau = pairs.select(
        ((F.col("conc") - F.col("disc")) / F.col("np")).alias("t")
    )
    t = F.col("t")
    ok = (t > 0) & (t < 1)
    return tau.select(
        F.round(t, 6).alias("kendall_tau"),
        F.when(ok, F.round(1 / (1 - t), 4)).alias("gumbel_theta"),
        F.when(ok, F.round(2 - F.pow(F.lit(2), 1 - t), 6)).alias(
            "implied_upper_tail_dep"
        ),
    )


@register(
    "q494_revenue_retention",
    """
    WITH firsts AS (
      SELECT o_custkey,
             MIN(date_part('year', o_orderdate)) AS cohort
      FROM orders GROUP BY o_custkey
    ),
    rev AS (
      -- exact decimal money sum (q01/q411 sf10 class): cohort-year
      -- cells reach 4e11 at sf10 and out-noise the cent emission
      SELECT f.cohort,
             date_part('year', o.o_orderdate) AS yr,
             SUM(CAST(o.o_totalprice AS DECIMAL(12,2))) AS r
      FROM orders o JOIN firsts f ON o.o_custkey = f.o_custkey
      GROUP BY 1, 2
    )
    SELECT CAST(cohort AS BIGINT) AS cohort_year,
           CAST(yr AS BIGINT) AS year,
           CAST(r AS DOUBLE) AS revenue,
           ROUND(CAST(r AS DOUBLE)
                 / CAST(LAG(r) OVER (PARTITION BY cohort ORDER BY yr)
                        AS DOUBLE), 6)
             AS retention_vs_prev_year
    FROM rev
    """,
)
def q494_revenue_retention(spark, sf_dir):
    """Net revenue retention by acquisition cohort: customers are
    stamped with their first-order year, and each cohort's
    year-over-year revenue ratio tracks whether the book GROWS or
    DECAYS after acquisition — the SaaS-board metric that q140's
    user-count retention can't see (users can stay while spend
    shrinks).  A first-touch window, one (cohort, year) rollup, a
    cohort-partitioned lag."""
    od = _t(spark, sf_dir, "orders")
    firsts = od.groupBy("o_custkey").agg(
        F.min(F.year("o_orderdate")).alias("cohort")
    )
    rev = (
        od.join(firsts, "o_custkey")
        .groupBy("cohort", F.year("o_orderdate").alias("yr"))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(12,2)")).alias(
                "r"
            )
        )
    )
    w = Window.partitionBy("cohort").orderBy("yr")
    return rev.select(
        F.col("cohort").cast("bigint").alias("cohort_year"),
        F.col("yr").cast("bigint").alias("year"),
        F.col("r").cast("double").alias("revenue"),
        F.round(
            F.col("r").cast("double")
            / F.lag("r").over(w).cast("double"),
            6,
        ).alias("retention_vs_prev_year"),
    )


@register(
    "q495_dunning_keyness",
    r"""
    WITH tok AS (
      SELECT source,
             UNNEST(list_filter(
               string_split_regex(trim(lower(text)), '\s+'),
               x -> x <> '')) AS w
      FROM documents
    ),
    counts AS (
      SELECT w,
             SUM(CASE WHEN source = 'src0' THEN 1 ELSE 0 END)::DOUBLE
               AS a,
             SUM(CASE WHEN source <> 'src0' THEN 1 ELSE 0 END)::DOUBLE
               AS b
      FROM tok GROUP BY w
    ),
    tot AS (SELECT SUM(a) AS n1, SUM(b) AS n2 FROM counts),
    g AS (
      SELECT c.w, c.a, c.b,
             2 * ((CASE WHEN c.a > 0
                        THEN c.a * LN(c.a / ((c.a + c.b) * t.n1
                                             / (t.n1 + t.n2)))
                        ELSE 0 END)
                + (CASE WHEN c.b > 0
                        THEN c.b * LN(c.b / ((c.a + c.b) * t.n2
                                             / (t.n1 + t.n2)))
                        ELSE 0 END)) AS g2,
             CASE WHEN c.a / t.n1 > c.b / t.n2 THEN 1 ELSE -1 END
               AS direction
      FROM counts c CROSS JOIN tot t
      WHERE c.a + c.b >= 50
    )
    SELECT w AS term,
           CAST(a AS BIGINT) AS count_src0,
           CAST(b AS BIGINT) AS count_rest,
           ROUND(g2, 4) AS log_likelihood_g2,
           CAST(direction AS BIGINT) AS direction
    FROM g
    ORDER BY g2 DESC, w
    LIMIT 15
    """,
)
def q495_dunning_keyness(spark, sf_dir):
    """Dunning log-likelihood keyness of src0 against the rest of the
    corpus: G² = 2Σ O·ln(O/E) over the term's 2-cell split, signed by
    over/under-use — the corpus-linguistics standard for 'what words
    make this source THIS source', better calibrated than q355's
    smoothed log-odds for rare-ish terms because it is an actual
    likelihood-ratio test (G² ~ χ²₁).  One token census with a
    two-source conditional split, broadcast totals, top-15."""
    d = _t(spark, sf_dir, "documents")
    toks = F.filter(
        F.split(F.trim(F.lower(F.col("text"))), r"\s+"),
        lambda w: w != "",
    )
    tok = d.select("source", F.explode(toks).alias("w"))
    counts = tok.groupBy("w").agg(
        F.sum(F.when(F.col("source") == "src0", 1).otherwise(0))
        .cast("double")
        .alias("a"),
        F.sum(F.when(F.col("source") != "src0", 1).otherwise(0))
        .cast("double")
        .alias("b"),
    )
    tot = counts.agg(
        F.sum("a").alias("n1"), F.sum("b").alias("n2")
    )
    a, b, n1, n2 = F.col("a"), F.col("b"), F.col("n1"), F.col("n2")
    e1 = (a + b) * n1 / (n1 + n2)
    e2 = (a + b) * n2 / (n1 + n2)
    g2 = 2 * (
        F.when(a > 0, a * F.log(a / e1)).otherwise(0.0)
        + F.when(b > 0, b * F.log(b / e2)).otherwise(0.0)
    )
    g = (
        counts.crossJoin(F.broadcast(tot))
        .filter(a + b >= 50)
        .select(
            "w",
            "a",
            "b",
            g2.alias("g2"),
            F.when(a / n1 > b / n2, 1).otherwise(-1).alias("direction"),
        )
    )
    return (
        g.select(
            F.col("w").alias("term"),
            a.cast("bigint").alias("count_src0"),
            b.cast("bigint").alias("count_rest"),
            F.round("g2", 4).alias("log_likelihood_g2"),
            F.col("direction").cast("bigint").alias("direction"),
            F.col("g2").alias("_g"),
        )
        .orderBy(F.col("_g").desc(), "term")
        .limit(15)
        .drop("_g")
    )


@register(
    "q496_new_item_share",
    """
    WITH sales AS (
      SELECT l_partkey,
             CAST(date_trunc('month', l_shipdate) AS DATE) AS mth,
             SUM(l_extendedprice * (1 - l_discount)) AS r
      FROM lineitem GROUP BY 1, 2
    ),
    firsts AS (
      SELECT l_partkey, MIN(mth) AS first_mth
      FROM sales GROUP BY l_partkey
    )
    SELECT s.mth AS month,
           ROUND(SUM(s.r) / 1000, 1) AS total_revenue_k,
           ROUND(SUM(CASE WHEN f.first_mth = s.mth THEN s.r ELSE 0 END)
                 / 1000, 1) AS new_item_revenue_k,
           ROUND(SUM(CASE WHEN f.first_mth = s.mth THEN s.r ELSE 0 END)
                 / SUM(s.r), 6) AS new_item_share
    FROM sales s JOIN firsts f ON s.l_partkey = f.l_partkey
    GROUP BY s.mth
    """,
)
def q496_new_item_share(spark, sf_dir):
    """Catalog-rotation profile: each month's revenue share earned by
    parts making their FIRST-ever sale that month — high early (the
    whole catalog is 'new'), then the steady-state innovation rate; a
    sudden rise flags assortment churn, a fall flags a stale catalog.
    The first-sale stamp is a min over the (part, month) aggregate —
    no window over raw rows — then one conditional rollup."""
    li = _t(spark, sf_dir, "lineitem")
    sales = li.groupBy(
        "l_partkey",
        F.to_date(F.date_trunc("MONTH", "l_shipdate")).alias("mth"),
    ).agg(
        F.sum(
            F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
        ).alias("r")
    )
    firsts = sales.groupBy("l_partkey").agg(
        F.min("mth").alias("first_mth")
    )
    new_r = F.when(
        F.col("first_mth") == F.col("mth"), F.col("r")
    ).otherwise(0.0)
    return (
        sales.join(firsts, "l_partkey")
        .groupBy(F.col("mth").alias("month"))
        .agg(
            # thousands: month-level revenue sums accumulate in
            # partition order, so a 2-dp round sits inside fp noise
            F.round(F.sum("r") / 1000, 1).alias("total_revenue_k"),
            F.round(F.sum(new_r) / 1000, 1).alias("new_item_revenue_k"),
            F.round(F.sum(new_r) / F.sum("r"), 6).alias(
                "new_item_share"
            ),
        )
    )


@register(
    "q497_cannibalization",
    """
    WITH bm AS (
      SELECT p.p_brand AS brand,
             CAST(date_trunc('month', l.l_shipdate) AS DATE) AS mth,
             SUM(CASE WHEN l.l_discount >= 0.05
                      THEN l.l_extendedprice * (1 - l.l_discount)
                      ELSE 0 END) AS disc_rev,
             SUM(CASE WHEN l.l_discount < 0.05
                      THEN l.l_extendedprice * (1 - l.l_discount)
                      ELSE 0 END) AS full_rev
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY 1, 2
    ),
    chg AS (
      SELECT brand,
             disc_rev - LAG(disc_rev) OVER (PARTITION BY brand
                                            ORDER BY mth) AS dd,
             full_rev - LAG(full_rev) OVER (PARTITION BY brand
                                            ORDER BY mth) AS df
      FROM bm
    ),
    s AS (
      SELECT brand, COUNT(*)::DOUBLE AS n,
             AVG(dd) AS md, AVG(df) AS mf,
             SUM(dd * df) AS sdf, SUM(dd * dd) AS sdd,
             SUM(df * df) AS sff
      FROM chg WHERE dd IS NOT NULL
      GROUP BY brand
    )
    SELECT brand,
           CAST(n AS BIGINT) AS n_months,
           ROUND((sdf - n * md * mf)
                 / SQRT((sdd - n * md * md) * (sff - n * mf * mf)), 6)
             AS corr_of_changes,
           CAST(CASE WHEN (sdf - n * md * mf)
                 / SQRT((sdd - n * md * md) * (sff - n * mf * mf))
                 < -0.2 THEN 1 ELSE 0 END AS BIGINT)
             AS cannibalization_flag
    FROM s
    """,
)
def q497_cannibalization(spark, sf_dir):
    """Promo cannibalization screen per brand: correlate MONTH-OVER-
    MONTH CHANGES in discounted revenue against changes in full-price
    revenue — differencing removes the shared growth trend that makes
    raw levels spuriously positive, so a clearly negative change-
    correlation means discount volume is eating full-price volume
    rather than adding demand (the question q342's uplift can't
    answer, because uplift has no counterfactual for the full-price
    line).  Brand-partitioned lag over the month aggregate, then
    sufficient-statistics correlations."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    bm = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.to_date(F.date_trunc("MONTH", "l_shipdate")).alias("mth"),
        )
        .agg(
            F.sum(
                F.when(F.col("l_discount") >= 0.05, rev).otherwise(0.0)
            ).alias("disc_rev"),
            F.sum(
                F.when(F.col("l_discount") < 0.05, rev).otherwise(0.0)
            ).alias("full_rev"),
        )
    )
    w = Window.partitionBy("brand").orderBy("mth")
    chg = bm.select(
        "brand",
        (F.col("disc_rev") - F.lag("disc_rev").over(w)).alias("dd"),
        (F.col("full_rev") - F.lag("full_rev").over(w)).alias("df"),
    ).filter(F.col("dd").isNotNull())
    s = chg.groupBy("brand").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.avg("dd").alias("md"),
        F.avg("df").alias("mf"),
        F.sum(F.col("dd") * F.col("df")).alias("sdf"),
        F.sum(F.col("dd") * F.col("dd")).alias("sdd"),
        F.sum(F.col("df") * F.col("df")).alias("sff"),
    )
    n = F.col("n")
    corr = (F.col("sdf") - n * F.col("md") * F.col("mf")) / F.sqrt(
        (F.col("sdd") - n * F.col("md") * F.col("md"))
        * (F.col("sff") - n * F.col("mf") * F.col("mf"))
    )
    return s.select(
        "brand",
        n.cast("bigint").alias("n_months"),
        F.round(corr, 6).alias("corr_of_changes"),
        F.when(corr < -0.2, 1)
        .otherwise(0)
        .cast("bigint")
        .alias("cannibalization_flag"),
    )


@register(
    "q498_wilcoxon_signed_rank",
    """
    WITH bounds AS (
      SELECT MIN(epoch_us(l_shipdate)) AS lo,
             MAX(epoch_us(l_shipdate)) AS hi
      FROM lineitem
    ),
    halves AS (
      SELECT p.p_brand AS brand,
             SUM(CASE WHEN 2 * epoch_us(l.l_shipdate) < b.lo + b.hi
                      THEN l.l_extendedprice * (1 - l.l_discount)
                      ELSE 0 END) AS h1,
             SUM(CASE WHEN 2 * epoch_us(l.l_shipdate) >= b.lo + b.hi
                      THEN l.l_extendedprice * (1 - l.l_discount)
                      ELSE 0 END) AS h2
      FROM lineitem l
      JOIN part p ON l.l_partkey = p.p_partkey
      CROSS JOIN bounds b
      GROUP BY 1
    ),
    diffs AS (
      SELECT h2 - h1 AS d, ABS(h2 - h1) AS ad
      FROM halves WHERE h2 <> h1
    ),
    ranked AS (
      SELECT d, ROW_NUMBER() OVER (ORDER BY ad, d) AS rk
      FROM diffs
    ),
    s AS (
      SELECT COUNT(*)::DOUBLE AS n,
             SUM(CASE WHEN d > 0 THEN rk ELSE 0 END)::DOUBLE AS wp,
             SUM(CASE WHEN d < 0 THEN rk ELSE 0 END)::DOUBLE AS wm
      FROM ranked
    )
    SELECT CAST(n AS BIGINT) AS n_pairs,
           CAST(wp AS BIGINT) AS w_plus,
           CAST(wm AS BIGINT) AS w_minus,
           ROUND((wp - n * (n + 1) / 4)
                 / SQRT(n * (n + 1) * (2 * n + 1) / 24), 4) AS z_stat
    FROM s
    """,
)
def q498_wilcoxon_signed_rank(spark, sf_dir):
    """Wilcoxon signed-rank test of brand revenue, first half vs
    second half of the ship-date span: each brand is its OWN control
    (the pairing), signed ranks of |Δ| decide whether the typical
    brand grew — robust both to the heavy cross-brand scale spread
    (which breaks a paired t) and to a few exploding brands (which
    dominate a mean).  Continuous revenue makes |Δ| ties measure-zero,
    so plain row-number ranks suffice (d, then sign, breaks exact
    ties deterministically); one grouped scan, one rank window over
    25 rows."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    us = F.unix_micros(F.col("l_shipdate").cast("timestamp"))
    bounds = li.agg(F.min(us).alias("lo"), F.max(us).alias("hi"))
    rev = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    first = F.lit(2) * us < F.col("lo") + F.col("hi")
    halves = (
        li.join(p, li.l_partkey == p.p_partkey)
        .crossJoin(F.broadcast(bounds))
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.sum(F.when(first, rev).otherwise(0.0)).alias("h1"),
            F.sum(F.when(~first, rev).otherwise(0.0)).alias("h2"),
        )
    )
    diffs = halves.filter(F.col("h2") != F.col("h1")).select(
        (F.col("h2") - F.col("h1")).alias("d"),
        F.abs(F.col("h2") - F.col("h1")).alias("ad"),
    )
    ranked = diffs.select(
        "d",
        F.row_number().over(Window.orderBy("ad", "d")).alias("rk"),
    )
    s = ranked.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(F.when(F.col("d") > 0, F.col("rk")).otherwise(0))
        .cast("double")
        .alias("wp"),
        F.sum(F.when(F.col("d") < 0, F.col("rk")).otherwise(0))
        .cast("double")
        .alias("wm"),
    )
    n, wp = F.col("n"), F.col("wp")
    return s.select(
        n.cast("bigint").alias("n_pairs"),
        wp.cast("bigint").alias("w_plus"),
        F.col("wm").cast("bigint").alias("w_minus"),
        F.round(
            (wp - n * (n + 1) / 4)
            / F.sqrt(n * (n + 1) * (2 * n + 1) / 24),
            4,
        ).alias("z_stat"),
    )


@register(
    "q499_ewma_chart",
    """
    WITH daily AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
             SUM(o_totalprice) AS rev
      FROM orders GROUP BY 1
    ),
    seq AS (
      SELECT day, rev, ROW_NUMBER() OVER (ORDER BY day) AS rn,
             AVG(rev) OVER () AS mu, STDDEV_SAMP(rev) OVER () AS sd
      FROM daily
    ),
    ew AS (
      SELECT a.rn, MAX(a.day) AS day, MAX(a.mu) AS mu,
             MAX(a.sd) AS sd,
             SUM(0.2 * POWER(0.8, k.k) * b.rev)
             + POWER(0.8, 40) * MAX(a.mu) AS z
      FROM seq a
      CROSS JOIN UNNEST(range(0, 40)) AS k(k)
      JOIN seq b ON b.rn = a.rn - k.k
      GROUP BY a.rn HAVING COUNT(*) = 40
    ),
    scored AS (
      SELECT day, z, mu,
             sd * SQRT(0.2 / 1.8) * 3 AS lim
      FROM ew
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_days_scored,
           ROUND(MAX(lim), 4) AS control_halfwidth,
           CAST(SUM(CASE WHEN ABS(z - mu) > lim THEN 1 ELSE 0 END)
                AS BIGINT) AS violations,
           MIN(CASE WHEN ABS(z - mu) > lim THEN day END)
             AS first_violation_day
    FROM scored
    """,
)
def q499_ewma_chart(spark, sf_dir):
    """EWMA control chart (λ=0.2, 3σ steady-state limits) on daily
    revenue: the small-persistent-shift detector that completes the
    SPC trio — Shewhart rules (q439) catch big jumps, CUSUM (q249)
    catches accumulating drift, EWMA sits between with one tunable
    memory knob.  The recursion z_t = λx_t + (1−λ)z_{t−1} unrolls
    exactly into a 40-tap geometric FIR (residual weight 0.8⁴⁰ ≈ 1e-4
    folded to μ), so the whole chart is one offsets-join over the
    daily aggregate — no sequential state anywhere."""
    od = _t(spark, sf_dir, "orders")
    daily = od.groupBy(
        F.to_date(F.date_trunc("DAY", "o_orderdate")).alias("day")
    ).agg(F.sum("o_totalprice").alias("rev"))
    wall = Window.partitionBy()
    seq = daily.select(
        "day",
        "rev",
        F.row_number().over(Window.orderBy("day")).alias("rn"),
        F.avg("rev").over(wall).alias("mu"),
        F.stddev_samp("rev").over(wall).alias("sd"),
    )
    ks = daily.sparkSession.createDataFrame(
        [(k,) for k in range(40)], "k int"
    )
    a, b = seq.alias("a"), seq.alias("b")
    ew = (
        a.crossJoin(F.broadcast(ks))
        .join(b, F.col("b.rn") == F.col("a.rn") - F.col("k"))
        .groupBy(F.col("a.rn"))
        .agg(
            F.max(F.col("a.day")).alias("day"),
            F.max(F.col("a.mu")).alias("mu"),
            F.max(F.col("a.sd")).alias("sd"),
            (
                F.sum(
                    F.lit(0.2)
                    * F.pow(F.lit(0.8), F.col("k"))
                    * F.col("b.rev")
                )
                + F.pow(F.lit(0.8), 40) * F.max(F.col("a.mu"))
            ).alias("z"),
            F.count(F.lit(1)).alias("taps"),
        )
        .filter(F.col("taps") == 40)
    )
    lim = F.col("sd") * F.sqrt(F.lit(0.2 / 1.8)) * 3
    scored = ew.select("day", "z", "mu", lim.alias("lim"))
    viol = F.abs(F.col("z") - F.col("mu")) > F.col("lim")
    return scored.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days_scored"),
        F.round(F.max("lim"), 4).alias("control_halfwidth"),
        F.sum(F.when(viol, 1).otherwise(0))
        .cast("bigint")
        .alias("violations"),
        F.min(F.when(viol, F.col("day"))).alias("first_violation_day"),
    )


@register(
    "q500_kpi_card",
    """
    WITH o AS (
      SELECT COUNT(*)::DOUBLE AS n_orders,
             SUM(o_totalprice) AS revenue,
             COUNT(DISTINCT o_custkey)::DOUBLE AS buyers
      FROM orders
    ),
    l AS (
      SELECT AVG(CASE WHEN l_returnflag = 'R' THEN 1.0 ELSE 0 END)
               AS return_rate,
             COUNT(*)::DOUBLE AS n_lines
      FROM lineitem
    ),
    e AS (
      SELECT COUNT(DISTINCT user_id)::DOUBLE AS users,
             COUNT(DISTINCT CASE WHEN event_type = 'purchase'
                                 THEN user_id END)::DOUBLE
               AS purchasers
      FROM events
    ),
    d AS (
      SELECT COUNT(*)::DOUBLE AS n_docs,
             SUM(n_chars)::DOUBLE AS corpus_chars,
             COUNT(DISTINCT md5(text))::DOUBLE AS distinct_docs
      FROM documents
    )
    SELECT CAST(o.n_orders AS BIGINT) AS n_orders,
           ROUND(o.revenue / 1000000, 2) AS revenue_m,
           ROUND(o.revenue / o.n_orders, 2) AS avg_order_value,
           ROUND(l.n_lines / o.n_orders, 4) AS lines_per_order,
           ROUND(l.return_rate, 6) AS return_rate,
           CAST(e.users AS BIGINT) AS active_users,
           ROUND(e.purchasers / e.users, 6) AS purchase_conversion,
           CAST(d.n_docs AS BIGINT) AS n_docs,
           CAST(d.corpus_chars AS BIGINT) AS corpus_chars,
           ROUND(1 - d.distinct_docs / d.n_docs, 6) AS exact_dup_rate
    FROM o CROSS JOIN l CROSS JOIN e CROSS JOIN d
    """,
)
def q500_kpi_card(spark, sf_dir):
    """The registry's capstone: one cross-domain KPI card — commerce
    (orders, revenue, AOV, basket depth, returns), behavior (active
    users, purchase conversion), and corpus health (documents, bytes,
    exact-dup rate) — four independent single-pass aggregates
    cross-joined into a single row.  Every number is a headline
    metric whose drill-down exists elsewhere in the registry; this is
    the query a dashboard's top banner runs, and it touches four
    tables without a single row-level join."""
    od = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    ev = _t(spark, sf_dir, "events")
    dc = _t(spark, sf_dir, "documents")
    o = od.agg(
        F.count(F.lit(1)).cast("double").alias("n_orders"),
        F.sum("o_totalprice").alias("revenue"),
        F.countDistinct("o_custkey").cast("double").alias("buyers"),
    )
    l = li.agg(
        F.avg(
            F.when(F.col("l_returnflag") == "R", 1.0).otherwise(0.0)
        ).alias("return_rate"),
        F.count(F.lit(1)).cast("double").alias("n_lines"),
    )
    e = ev.agg(
        F.countDistinct("user_id").cast("double").alias("users"),
        F.countDistinct(
            F.when(F.col("event_type") == "purchase", F.col("user_id"))
        )
        .cast("double")
        .alias("purchasers"),
    )
    d = dc.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.sum("n_chars").cast("double").alias("corpus_chars"),
        F.countDistinct(F.md5("text")).cast("double").alias(
            "distinct_docs"
        ),
    )
    card = (
        o.crossJoin(F.broadcast(l))
        .crossJoin(F.broadcast(e))
        .crossJoin(F.broadcast(d))
    )
    return card.select(
        F.col("n_orders").cast("bigint").alias("n_orders"),
        F.round(F.col("revenue") / 1000000, 2).alias("revenue_m"),
        F.round(F.col("revenue") / F.col("n_orders"), 2).alias(
            "avg_order_value"
        ),
        F.round(F.col("n_lines") / F.col("n_orders"), 4).alias(
            "lines_per_order"
        ),
        F.round("return_rate", 6).alias("return_rate"),
        F.col("users").cast("bigint").alias("active_users"),
        F.round(F.col("purchasers") / F.col("users"), 6).alias(
            "purchase_conversion"
        ),
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.col("corpus_chars").cast("bigint").alias("corpus_chars"),
        F.round(
            F.lit(1) - F.col("distinct_docs") / F.col("n_docs"), 6
        ).alias("exact_dup_rate"),
    )


@register(
    "q501_anderson_darling",
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
      SELECT LEAST(GREATEST(
             0.5 * (1 + (CASE WHEN zv < 0 THEN -1 ELSE 1 END)
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
                 * EXP(-(ABS(zv) / SQRT(2)) * (ABS(zv) / SQRT(2)))))),
             1e-10), 1 - 1e-10) AS u
      FROM z
    ),
    ranked AS (
      SELECT u, ROW_NUMBER() OVER (ORDER BY u) AS i,
             COUNT(*) OVER () AS n
      FROM pit
    ),
    paired AS (
      SELECT a.i, a.n, a.u AS ui, b.u AS umirror
      FROM ranked a JOIN ranked b ON b.i = a.n + 1 - a.i
    ),
    s AS (
      SELECT MAX(n)::DOUBLE AS n,
             SUM((2 * i - 1) * (LN(ui) + LN(1 - umirror))) AS t
      FROM paired
    )
    SELECT CAST(n AS BIGINT) AS n_customers,
           ROUND(-n - t / n, 4) AS a_squared,
           ROUND((-n - t / n) * (1 + 0.75 / n + 2.25 / (n * n)), 4)
             AS a_squared_star
    FROM s
    """,
)
def q501_anderson_darling(spark, sf_dir):
    """Anderson-Darling test of the lognormal spend fit: A² weights
    the CDF discrepancy by 1/(F(1−F)), so it sees the TAILS that
    q470's binned chi² smears into 10 cells — the test of record
    when the downstream use is tail math (VaR, stocking quantiles).
    PIT values are clamped to (1e-10, 1−1e-10) before the logs (the
    erf saturates in double for |z|>6).  The (2i−1) pairing joins
    rank i with rank n+1−i — one sort window and an equi-join on
    mirrored rank, then a fold; the small-sample A²* correction
    rides along."""
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
    comp = (
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
    u = F.lit(0.5) * (F.lit(1) + sign * (F.lit(1) - comp))
    pit = z.select(
        F.least(
            F.greatest(u, F.lit(1e-10)), F.lit(1 - 1e-10)
        ).alias("u")
    )
    ranked = pit.select(
        "u",
        F.row_number().over(Window.orderBy("u")).alias("i"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    a, b = ranked.alias("a"), ranked.alias("b")
    paired = a.join(
        b, F.col("b.i") == F.col("a.n") + 1 - F.col("a.i")
    ).select(
        F.col("a.i").alias("i"),
        F.col("a.n").alias("n"),
        F.col("a.u").alias("ui"),
        F.col("b.u").alias("umirror"),
    )
    s = paired.agg(
        F.max("n").cast("double").alias("n"),
        F.sum(
            (2 * F.col("i") - 1)
            * (F.log("ui") + F.log(F.lit(1) - F.col("umirror")))
        ).alias("t"),
    )
    n, tt = F.col("n"), F.col("t")
    a2 = -n - tt / n
    return s.select(
        n.cast("bigint").alias("n_customers"),
        F.round(a2, 4).alias("a_squared"),
        F.round(a2 * (1 + 0.75 / n + 2.25 / (n * n)), 4).alias(
            "a_squared_star"
        ),
    )


@register(
    "q502_seasonal_strength",
    """
    WITH daily AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
             -- q429/q418 discipline: exact decimal + cents safe cast
             CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100
                       AS DECIMAL(38,0)) AS DOUBLE) / 100 AS rev
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
    det AS (
      SELECT day, dow, rev, ma7, rev - ma7 AS dt FROM trend
    ),
    dow_idx AS (
      SELECT dow, AVG(dt) AS eff FROM det GROUP BY dow
    ),
    parts AS (
      SELECT d.rev, d.dt, d.dt - i.eff AS resid,
             d.rev - i.eff AS deseason
      FROM det d JOIN dow_idx i ON d.dow = i.dow
    )
    -- STDDEV, not variance: at sf1 Var(rev) ~ 5e14 where one double
    -- ulp is 0.06 > a cent, so ROUND(VAR,2) is engine-noise; the same
    -- noise on the sd is ~1e-9 and ROUND(,2) is rock-solid
    SELECT ROUND(STDDEV_SAMP(rev), 2) AS sd_raw,
           ROUND(STDDEV_SAMP(resid), 2) AS sd_resid,
           ROUND(GREATEST(0, 1 - VAR_SAMP(resid) / VAR_SAMP(dt)), 6)
             AS seasonal_strength,
           ROUND(GREATEST(0, 1 - VAR_SAMP(resid) / VAR_SAMP(deseason)),
                 6) AS trend_strength
    FROM parts
    """,
)
def q502_seasonal_strength(spark, sf_dir):
    """Hyndman's seasonal and trend strength (Fs, Ft) from the q412
    STL-lite decomposition: Fs = 1 − Var(R)/Var(S+R) grades how much
    of the detrended variation the weekly shape explains, Ft the
    same against the trend — the pair of [0,1] numbers that decides
    whether a forecaster needs seasonal terms AT ALL (q463's suite
    evaluates one; this says which to try).  Reuses the 7-day MA and
    dow-index plan shape; two variance folds at the end."""
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
    wma = Window.orderBy("day").rowsBetween(-3, 3)
    trend = daily.select(
        "day",
        "rev",
        F.avg("rev").over(wma).alias("ma7"),
        F.dayofweek("day").alias("dow"),
    )
    det = trend.withColumn("dt", F.col("rev") - F.col("ma7"))
    dow_idx = det.groupBy("dow").agg(F.avg("dt").alias("eff"))
    parts = det.join(F.broadcast(dow_idx), "dow").select(
        "rev",
        "dt",
        (F.col("dt") - F.col("eff")).alias("resid"),
        (F.col("rev") - F.col("eff")).alias("deseason"),
    )
    return parts.agg(
        F.round(F.stddev_samp("rev"), 2).alias("sd_raw"),
        F.round(F.stddev_samp("resid"), 2).alias("sd_resid"),
        F.round(
            F.greatest(
                F.lit(0.0),
                F.lit(1) - F.var_samp("resid") / F.var_samp("dt"),
            ),
            6,
        ).alias("seasonal_strength"),
        F.round(
            F.greatest(
                F.lit(0.0),
                F.lit(1)
                - F.var_samp("resid") / F.var_samp("deseason"),
            ),
            6,
        ).alias("trend_strength"),
    )


@register(
    "q503_bass_diffusion_grid",
    """
    WITH firsts AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS d0
      FROM events WHERE event_type = 'purchase'
      GROUP BY user_id
    ),
    origin AS (SELECT MIN(d0) AS lo FROM firsts),
    adopt AS (
      SELECT date_diff('day', o.lo, f.d0) AS t,
             COUNT(*)::DOUBLE AS k
      FROM firsts f CROSS JOIN origin o
      GROUP BY 1
    ),
    curve AS (
      SELECT t, SUM(k) OVER (ORDER BY t) AS cum,
             SUM(k) OVER () AS m
      FROM adopt
    ),
    grid AS (
      SELECT CAST(p.p AS DOUBLE) AS p, CAST(q.q AS DOUBLE) AS q
      FROM (VALUES (0.001), (0.003), (0.01), (0.03)) AS p(p),
           (VALUES (0.1), (0.2), (0.3), (0.4), (0.5)) AS q(q)
    )
    SELECT g.p AS innovation_p,
           g.q AS imitation_q,
           ROUND(SUM(POWER(
             c.m * (1 - EXP(-(g.p + g.q) * c.t))
                 / (1 + (g.q / g.p) * EXP(-(g.p + g.q) * c.t))
             - c.cum, 2)) / 1000000, 4) AS sse_m,
           CAST(CASE WHEN SUM(POWER(
             c.m * (1 - EXP(-(g.p + g.q) * c.t))
                 / (1 + (g.q / g.p) * EXP(-(g.p + g.q) * c.t))
             - c.cum, 2))
             = MIN(SUM(POWER(
               c.m * (1 - EXP(-(g.p + g.q) * c.t))
                   / (1 + (g.q / g.p) * EXP(-(g.p + g.q) * c.t))
               - c.cum, 2))) OVER () THEN 1 ELSE 0 END AS BIGINT)
             AS is_best
    FROM curve c CROSS JOIN grid g
    GROUP BY g.p, g.q
    """,
)
def q503_bass_diffusion_grid(spark, sf_dir):
    """Bass diffusion model fitted to the first-purchase adoption
    curve by grid search: F(t) = (1−e^−(p+q)t)/(1+(q/p)e^−(p+q)t)
    over a 4×5 (innovation p, imitation q) grid, SSE against the
    observed cumulative-adopter curve, best cell flagged — the
    product-growth model that separates 'adopters arrive on their
    own' from 'adopters recruit adopters', and another instance of
    the nonlinear-fit-as-broadcast-grid pattern (q467): no optimizer
    library, one pass per candidate over the ~daily adoption
    aggregate."""
    ev = _t(spark, sf_dir, "events")
    firsts = ev.filter(F.col("event_type") == "purchase").groupBy(
        "user_id"
    ).agg(F.min(F.col("ts").cast("date")).alias("d0"))
    origin = firsts.agg(F.min("d0").alias("lo"))
    adopt = (
        firsts.crossJoin(F.broadcast(origin))
        .groupBy(F.datediff("d0", "lo").alias("t"))
        .agg(F.count(F.lit(1)).cast("double").alias("k"))
    )
    wc = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy()
    curve = adopt.select(
        "t",
        F.sum("k").over(wc).alias("cum"),
        F.sum("k").over(wall).alias("m"),
    )
    grid = ev.sparkSession.createDataFrame(
        [
            (p, q)
            for p in (0.001, 0.003, 0.01, 0.03)
            for q in (0.1, 0.2, 0.3, 0.4, 0.5)
        ],
        "p double, q double",
    )
    pred = (
        F.col("m")
        * (1 - F.exp(-(F.col("p") + F.col("q")) * F.col("t")))
        / (
            1
            + (F.col("q") / F.col("p"))
            * F.exp(-(F.col("p") + F.col("q")) * F.col("t"))
        )
    )
    sse = F.sum(F.pow(pred - F.col("cum"), 2))
    fitted = (
        curve.crossJoin(F.broadcast(grid))
        .groupBy("p", "q")
        .agg(sse.alias("sse"))
    )
    return fitted.select(
        F.col("p").alias("innovation_p"),
        F.col("q").alias("imitation_q"),
        F.round(F.col("sse") / 1000000, 4).alias("sse_m"),
        F.when(F.col("sse") == F.min("sse").over(wall), 1)
        .otherwise(0)
        .cast("bigint")
        .alias("is_best"),
    )


@register(
    "q504_burrows_delta",
    r"""
    WITH tok AS (
      SELECT source,
             UNNEST(list_filter(
               string_split_regex(trim(lower(text)), '\s+'),
               x -> x <> '')) AS w
      FROM documents
    ),
    counts AS (
      SELECT source, w, COUNT(*)::DOUBLE AS c
      FROM tok GROUP BY source, w
    ),
    stotal AS (
      SELECT source, SUM(c) AS st FROM counts GROUP BY source
    ),
    markers AS (
      SELECT w FROM (
        SELECT w, SUM(c) AS tc,
               ROW_NUMBER() OVER (ORDER BY SUM(c) DESC, w) AS rk
        FROM counts GROUP BY w
      ) WHERE rk <= 30
    ),
    dense AS (
      SELECT s.source, m.w,
             COALESCE(c.c, 0) / s.st AS rf
      FROM stotal s CROSS JOIN markers m
      LEFT JOIN counts c ON c.source = s.source AND c.w = m.w
    ),
    zs AS (
      SELECT source, w,
             (rf - AVG(rf) OVER (PARTITION BY w))
             / STDDEV_SAMP(rf) OVER (PARTITION BY w) AS z
      FROM dense
    ),
    pairs AS (
      SELECT a.source AS s1, b.source AS s2,
             AVG(ABS(a.z - b.z)) AS delta
      FROM zs a JOIN zs b ON a.w = b.w AND a.source < b.source
      GROUP BY a.source, b.source
    )
    SELECT s1, s2, ROUND(delta, 6) AS burrows_delta
    FROM pairs
    ORDER BY delta, s1, s2
    LIMIT 5
    """,
)
def q504_burrows_delta(spark, sf_dir):
    """Burrows' Delta between sources — the authorship-attribution
    classic: z-score each source's relative frequency of the 30 most
    common words (function words dominate, per q460), then Delta =
    mean |z₁−z₂| over markers; the 5 closest pairs are candidate
    same-generator sources.  The (source × marker) grid is
    DENSIFIED before z-scoring (a missing marker is rf=0, not an
    absent row — skipping that step silently biases the means).
    All pairwise work is 190 pairs × 30 markers on aggregates."""
    d = _t(spark, sf_dir, "documents")
    toks = F.filter(
        F.split(F.trim(F.lower(F.col("text"))), r"\s+"),
        lambda w: w != "",
    )
    tok = d.select("source", F.explode(toks).alias("w"))
    counts = tok.groupBy("source", "w").agg(
        F.count(F.lit(1)).cast("double").alias("c")
    )
    stotal = counts.groupBy("source").agg(F.sum("c").alias("st"))
    markers = (
        counts.groupBy("w")
        .agg(F.sum("c").alias("tc"))
        .select(
            "w",
            F.row_number()
            .over(Window.orderBy(F.col("tc").desc(), "w"))
            .alias("rk"),
        )
        .filter(F.col("rk") <= 30)
        .select("w")
    )
    dense = (
        stotal.crossJoin(F.broadcast(markers))
        .join(counts, ["source", "w"], "left")
        .select(
            "source",
            "w",
            (F.coalesce("c", F.lit(0.0)) / F.col("st")).alias("rf"),
        )
    )
    ww = Window.partitionBy("w")
    zs = dense.select(
        "source",
        "w",
        (
            (F.col("rf") - F.avg("rf").over(ww))
            / F.stddev_samp("rf").over(ww)
        ).alias("z"),
    )
    a, b = zs.alias("a"), zs.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.w") == F.col("b.w"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("s1"), F.col("b.source").alias("s2")
        )
        .agg(F.avg(F.abs(F.col("a.z") - F.col("b.z"))).alias("delta"))
    )
    return (
        pairs.select(
            "s1", "s2", F.round("delta", 6).alias("burrows_delta"),
            F.col("delta").alias("_d"),
        )
        .orderBy("_d", "s1", "s2")
        .limit(5)
        .drop("_d")
    )


@register(
    "q505_shapley_attribution",
    """
    WITH buyers AS (
      SELECT user_id FROM events
      WHERE event_type = 'purchase' GROUP BY user_id
    ),
    touches AS (
      SELECT b.user_id,
             MAX(CASE WHEN e.event_type = 'click' THEN 1 ELSE 0 END)
             + 2 * MAX(CASE WHEN e.event_type = 'view'
                            THEN 1 ELSE 0 END)
             + 4 * MAX(CASE WHEN e.event_type = 'signup'
                            THEN 1 ELSE 0 END) AS tset
      FROM buyers b JOIN events e ON b.user_id = e.user_id
      GROUP BY b.user_id
    ),
    exact_sets AS (
      SELECT tset, COUNT(*)::DOUBLE AS c FROM touches GROUP BY tset
    ),
    masks AS (
      SELECT m.m FROM (VALUES (0),(1),(2),(3),(4),(5),(6),(7)) AS m(m)
    ),
    v AS (
      SELECT m.m, COALESCE(SUM(e.c), 0) AS v
      FROM masks m LEFT JOIN exact_sets e ON (e.tset & m.m) = e.tset
      GROUP BY m.m
    ),
    chan AS (
      SELECT * FROM (VALUES ('click', 1), ('view', 2), ('signup', 4))
        AS c(name, bit)
    ),
    contrib AS (
      SELECT c.name,
             SUM((CASE bit_count(s.m)
                    WHEN 0 THEN 2.0 WHEN 1 THEN 1.0 ELSE 2.0
                  END) / 6.0
                 * (si.v - s.v)) AS phi
      FROM chan c
      JOIN v s ON (s.m & c.bit) = 0
      JOIN v si ON si.m = s.m + c.bit
      GROUP BY c.name
    )
    SELECT name AS channel,
           ROUND(phi, 4) AS shapley_credit,
           ROUND(phi / SUM(phi) OVER (), 6) AS credit_share
    FROM contrib
    """,
)
def q505_shapley_attribution(spark, sf_dir):
    """EXACT Shapley attribution over three touch channels (click,
    view, signup): the characteristic function v(S) = purchasers
    whose full touch set fits inside S, built from the 8 channel-
    subset counts by a bitmask containment join, then the closed
    3-player Shapley weights |S|!(2−|S|)!/3! — the axiomatic
    fair-split that position rules (q250 last-touch, q289 U-shaped)
    only approximate.  Everything past the per-user touch rollup is
    arithmetic on 8 rows; with C channels the same plan is 2^C rows —
    exact Shapley is FEASIBLE when channels are few, which is the
    realistic marketing case."""
    ev = _t(spark, sf_dir, "events")
    buyers = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id")
        .distinct()
    )
    touches = (
        buyers.join(ev, "user_id")
        .groupBy("user_id")
        .agg(
            (
                F.max(
                    F.when(F.col("event_type") == "click", 1).otherwise(0)
                )
                + 2
                * F.max(
                    F.when(F.col("event_type") == "view", 1).otherwise(0)
                )
                + 4
                * F.max(
                    F.when(F.col("event_type") == "signup", 1).otherwise(
                        0
                    )
                )
            ).alias("tset")
        )
    )
    exact_sets = touches.groupBy("tset").agg(
        F.count(F.lit(1)).cast("double").alias("c")
    )
    masks = ev.sparkSession.createDataFrame(
        [(m,) for m in range(8)], "m int"
    )
    v = (
        masks.join(
            exact_sets,
            F.col("tset").bitwiseAND(F.col("m")) == F.col("tset"),
            "left",
        )
        .groupBy("m")
        .agg(F.coalesce(F.sum("c"), F.lit(0.0)).alias("v"))
    )
    chan = ev.sparkSession.createDataFrame(
        [("click", 1), ("view", 2), ("signup", 4)], "name string, bit int"
    )
    s = v.select(F.col("m").alias("sm"), F.col("v").alias("sv"))
    si = v.select(F.col("m").alias("sim"), F.col("v").alias("siv"))
    weight = (
        F.when(F.bit_count(F.col("sm")) == 0, 2.0)
        .when(F.bit_count(F.col("sm")) == 1, 1.0)
        .otherwise(2.0)
        / 6.0
    )
    contrib = (
        chan.join(s, s.sm.bitwiseAND(chan.bit) == 0)
        .join(si, F.col("sim") == F.col("sm") + F.col("bit"))
        .groupBy("name")
        .agg(
            F.sum(weight * (F.col("siv") - F.col("sv"))).alias("phi")
        )
    )
    wall = Window.partitionBy()
    return contrib.select(
        F.col("name").alias("channel"),
        F.round("phi", 4).alias("shapley_credit"),
        F.round(F.col("phi") / F.sum("phi").over(wall), 6).alias(
            "credit_share"
        ),
    )


@register(
    "q506_rmst",
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
    seconds AS (SELECT user_id, us AS t2 FROM purch WHERE k = 2),
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
      SELECT grp, dur,
             COUNT(*)::DOUBLE AS cnt,
             SUM(ev)::DOUBLE AS d
      FROM subj GROUP BY grp, dur
    ),
    risk AS (
      SELECT grp, dur, d,
             SUM(cnt) OVER (PARTITION BY grp) -
             (SUM(cnt) OVER (PARTITION BY grp ORDER BY dur) - cnt)
               AS n
      FROM wide
    ),
    km AS (
      SELECT grp, dur,
             EXP(SUM(LN(1 - d / n))
                 OVER (PARTITION BY grp ORDER BY dur)) AS s
      FROM risk WHERE d > 0 AND d < n
    ),
    seg AS (
      SELECT grp, dur, s,
             LEAD(dur, 1, 730) OVER (PARTITION BY grp ORDER BY dur)
               AS nxt
      FROM km WHERE dur < 730
    ),
    area AS (
      SELECT grp,
             MIN(dur) AS first_ev,
             SUM(s * (LEAST(nxt, 730) - dur)) AS tail_area,
             MIN(s) AS km_end
      FROM seg GROUP BY grp
    )
    SELECT CAST(grp AS BIGINT) AS high_value_group,
           ROUND(first_ev + tail_area, 4) AS rmst_days,
           ROUND(km_end, 6) AS km_at_tau
    FROM area
    """,
)
def q506_rmst(spark, sf_dir):
    """Restricted mean survival time (τ=730 days) for time-to-second-
    purchase, by first-purchase value group: the area under each
    Kaplan-Meier curve — 'expected repeat-free days within two
    years', the absolute-scale effect summary that the q447 log-rank
    (a pure significance verdict) lacks, and the modern replacement
    for hazard ratios when proportional hazards is dubious.  The KM
    product is exp(Σ ln(1−d/n)) over an ordered window (no recursion,
    no UDF), the area a lead-window trapezoid sum; subjects with a
    same-day event-count tie fold into one histogram row first."""
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
    wide = subj.groupBy("grp", "dur").agg(
        F.count(F.lit(1)).cast("double").alias("cnt"),
        F.sum("ev").cast("double").alias("d"),
    )
    wg = Window.partitionBy("grp")
    wc = Window.partitionBy("grp").orderBy("dur").rowsBetween(
        Window.unboundedPreceding, 0
    )
    risk = wide.select(
        "grp",
        "dur",
        "d",
        (
            F.sum("cnt").over(wg)
            - (F.sum("cnt").over(wc) - F.col("cnt"))
        ).alias("n"),
    )
    km = risk.filter(
        (F.col("d") > 0) & (F.col("d") < F.col("n"))
    ).select(
        "grp",
        "dur",
        F.exp(
            F.sum(F.log(1 - F.col("d") / F.col("n"))).over(
                Window.partitionBy("grp")
                .orderBy("dur")
                .rowsBetween(Window.unboundedPreceding, 0)
            )
        ).alias("s"),
    )
    seg = km.filter(F.col("dur") < 730).select(
        "grp",
        "dur",
        "s",
        F.lead("dur", 1, 730)
        .over(Window.partitionBy("grp").orderBy("dur"))
        .alias("nxt"),
    )
    area = seg.groupBy("grp").agg(
        F.min("dur").alias("first_ev"),
        F.sum(
            F.col("s") * (F.least(F.col("nxt"), F.lit(730)) - F.col("dur"))
        ).alias("tail_area"),
        F.min("s").alias("km_end"),
    )
    return area.select(
        F.col("grp").cast("bigint").alias("high_value_group"),
        F.round(F.col("first_ev") + F.col("tail_area"), 4).alias(
            "rmst_days"
        ),
        F.round("km_end", 6).alias("km_at_tau"),
    )


@register(
    "q507_icc",
    """
    WITH g AS (
      SELECT user_id, COUNT(*)::DOUBLE AS n, AVG(value) AS m,
             SUM(value * value) AS ss, SUM(value) AS s
      FROM events WHERE event_type = 'purchase'
      GROUP BY user_id
    ),
    tot AS (
      SELECT SUM(n) AS nt, SUM(s) / SUM(n) AS gm,
             COUNT(*)::DOUBLE AS k, SUM(n * n) AS sn2
      FROM g
    ),
    ms AS (
      SELECT (SELECT SUM(n * POWER(m - tot.gm, 2)) FROM g)
               / (tot.k - 1) AS msb,
             (SELECT SUM(ss - n * m * m) FROM g)
               / (tot.nt - tot.k) AS msw,
             (tot.nt - tot.sn2 / tot.nt) / (tot.k - 1) AS k0,
             tot.k AS k, tot.nt AS nt
      FROM tot
    )
    SELECT CAST(k AS BIGINT) AS n_users,
           CAST(nt AS BIGINT) AS n_purchases,
           ROUND(msb, 4) AS ms_between,
           ROUND(msw, 4) AS ms_within,
           ROUND(k0, 4) AS k0,
           ROUND((msb - msw) / (msb + (k0 - 1) * msw), 6) AS icc1
    FROM ms
    """,
)
def q507_icc(spark, sf_dir):
    """Intraclass correlation ICC(1) of purchase values within users:
    from the one-way random-effects ANOVA decomposition (between-user
    vs within-user mean squares, unbalanced-design k₀ = (N−Σn²/N)/
    (g−1)) — the fraction of spending variance that is a USER trait
    rather than purchase-to-purchase noise, which is exactly the
    number that says whether per-user features (q313) can work at
    all, and whether clustered SEs (q445) are needed.  Same
    sufficient-statistics shape as q279, different inference target."""
    ev = _t(spark, sf_dir, "events")
    g = ev.filter(F.col("event_type") == "purchase").groupBy(
        "user_id"
    ).agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.avg("value").alias("m"),
        F.sum(F.col("value") * F.col("value")).alias("ss"),
        F.sum("value").alias("s"),
    )
    tot = g.agg(
        F.sum("n").alias("nt"),
        (F.sum("s") / F.sum("n")).alias("gm"),
        F.count(F.lit(1)).cast("double").alias("k"),
        F.sum(F.col("n") * F.col("n")).alias("sn2"),
    )
    j = g.crossJoin(F.broadcast(tot))
    ms = j.agg(
        (
            F.sum(F.col("n") * F.pow(F.col("m") - F.col("gm"), 2))
            / F.max(F.col("k") - 1)
        ).alias("msb"),
        (
            F.sum(F.col("ss") - F.col("n") * F.col("m") * F.col("m"))
            / F.max(F.col("nt") - F.col("k"))
        ).alias("msw"),
        F.max(
            (F.col("nt") - F.col("sn2") / F.col("nt"))
            / (F.col("k") - 1)
        ).alias("k0"),
        F.max("k").alias("k"),
        F.max("nt").alias("nt"),
    )
    msb, msw, k0 = F.col("msb"), F.col("msw"), F.col("k0")
    return ms.select(
        F.col("k").cast("bigint").alias("n_users"),
        F.col("nt").cast("bigint").alias("n_purchases"),
        F.round(msb, 4).alias("ms_between"),
        F.round(msw, 4).alias("ms_within"),
        F.round(k0, 4).alias("k0"),
        F.round((msb - msw) / (msb + (k0 - 1) * msw), 6).alias(
            "icc1"
        ),
    )


@register(
    "q508_discrete_hazard",
    """
    WITH span AS (
      SELECT MAX(epoch_us(ts)) AS mx FROM events
    ),
    u AS (
      SELECT e.user_id,
             (MAX(epoch_us(e.ts)) - MIN(epoch_us(e.ts)))
               // 86400000000 AS tenure_d,
             CASE WHEN s.mx - MAX(epoch_us(e.ts)) > 432000000000
                  THEN 1 ELSE 0 END AS churned
      FROM events e CROSS JOIN span s
      WHERE e.event_type = 'purchase'
      GROUP BY e.user_id, s.mx
    ),
    hist AS (
      SELECT tenure_d, COUNT(*)::DOUBLE AS cnt,
             SUM(churned)::DOUBLE AS d
      FROM u GROUP BY tenure_d
    ),
    risk AS (
      SELECT tenure_d, d,
             SUM(cnt) OVER () -
             (SUM(cnt) OVER (ORDER BY tenure_d) - cnt) AS at_risk
      FROM hist
    )
    SELECT CAST(tenure_d AS BIGINT) AS tenure_day,
           CAST(at_risk AS BIGINT) AS at_risk,
           CAST(d AS BIGINT) AS churned,
           ROUND(d / at_risk, 6) AS hazard
    FROM risk WHERE d > 0
    """,
)
def q508_discrete_hazard(spark, sf_dir):
    """Discrete-time churn hazard by PURCHASE-tenure day: a user is
    churned if purchase-silent for the final 5 days of the window
    (the events fixture spans ~30 dense days, so day is the natural
    tick and 5 days ≈ the p80 silence), tenure is first-to-last
    purchase, and h(t) = churners at tenure t over users who REACHED
    t — the life-table view that says WHEN customers are lost, which
    q311's fitted exponential decay assumes away by construction.
    Histogram + reverse-cumulative risk set, the q447/q506
    discipline on a business lifecycle."""
    ev = _t(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    span = ev.agg(F.max(us).alias("mx"))
    day_us = F.lit(86400000000)
    u = (
        ev.filter(F.col("event_type") == "purchase")
        .crossJoin(F.broadcast(span))
        .groupBy("user_id", "mx")
        .agg(
            ((F.max(us) - F.min(us)) / day_us)
            .cast("bigint")
            .alias("tenure_m"),
            F.when(
                F.col("mx") - F.max(us) > F.lit(432000000000), 1
            )
            .otherwise(0)
            .alias("churned"),
        )
    )
    hist = u.groupBy("tenure_m").agg(
        F.count(F.lit(1)).cast("double").alias("cnt"),
        F.sum("churned").cast("double").alias("d"),
    )
    wall = Window.partitionBy()
    wc = Window.orderBy("tenure_m").rowsBetween(
        Window.unboundedPreceding, 0
    )
    risk = hist.select(
        "tenure_m",
        "d",
        (
            F.sum("cnt").over(wall)
            - (F.sum("cnt").over(wc) - F.col("cnt"))
        ).alias("at_risk"),
    )
    return risk.filter(F.col("d") > 0).select(
        F.col("tenure_m").cast("bigint").alias("tenure_day"),
        F.col("at_risk").cast("bigint").alias("at_risk"),
        F.col("d").cast("bigint").alias("churned"),
        F.round(F.col("d") / F.col("at_risk"), 6).alias("hazard"),
    )
