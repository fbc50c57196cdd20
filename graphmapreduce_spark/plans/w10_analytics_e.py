"""Analytics arc E: survey stats, decompositions, robust dispersion.

Part 10/11 of the query registry (split from the former single-file
workload.py); importing this module registers its queries in
``plans._shared.QUERIES``.
"""

from graphmapreduce_spark.plans._shared import *  # noqa: F401,F403
from graphmapreduce_spark.plans.w05_corpus_ops import _MD5_BUCKET  # noqa: F401

@register(
    "q509_yuen_trimmed_t",
    """
    WITH ranked AS (
      SELECT CASE WHEN l_discount >= 0.05 THEN 1 ELSE 0 END AS grp,
             l_quantity AS x,
             ROW_NUMBER() OVER (
               PARTITION BY CASE WHEN l_discount >= 0.05
                                 THEN 1 ELSE 0 END
               ORDER BY l_quantity, l_orderkey, l_linenumber) AS rk,
             COUNT(*) OVER (
               PARTITION BY CASE WHEN l_discount >= 0.05
                                 THEN 1 ELSE 0 END) AS n
      FROM lineitem
    ),
    bounds AS (
      SELECT grp, MAX(n) AS n,
             CAST(FLOOR(0.2 * MAX(n)) AS BIGINT) AS g
      FROM ranked GROUP BY grp
    ),
    lov AS (
      -- boundary ROWS first (tiny), never ranked JOIN ranked on the
      -- 2-value grp key: that shape probes ~n^2/2 pairs per group
      -- and is intractable at sf1
      SELECT r.grp, r.x AS lox FROM ranked r
      JOIN bounds b ON b.grp = r.grp AND r.rk = b.g + 1
    ),
    hiv AS (
      SELECT r.grp, r.x AS hix FROM ranked r
      JOIN bounds b ON b.grp = r.grp AND r.rk = b.n - b.g
    ),
    wins AS (
      SELECT r.grp, b.n, b.g,
             CASE WHEN r.rk <= b.g THEN lo.lox
                  WHEN r.rk > b.n - b.g THEN hi.hix
                  ELSE r.x END AS wx,
             CASE WHEN r.rk > b.g AND r.rk <= b.n - b.g
                  THEN r.x END AS tx
      FROM ranked r
      JOIN bounds b ON r.grp = b.grp
      JOIN lov lo ON lo.grp = r.grp
      JOIN hiv hi ON hi.grp = r.grp
    ),
    s AS (
      SELECT grp, MAX(n)::DOUBLE AS n, MAX(g)::DOUBLE AS g,
             AVG(tx) AS tmean,
             VAR_SAMP(wx) AS wvar
      FROM wins GROUP BY grp
    ),
    wide AS (
      SELECT MAX(CASE WHEN grp = 1 THEN tmean END) AS t1,
             MAX(CASE WHEN grp = 0 THEN tmean END) AS t0,
             MAX(CASE WHEN grp = 1 THEN
               (n - 1) * wvar / ((n - 2 * g) * (n - 2 * g - 1)) END)
               AS d1,
             MAX(CASE WHEN grp = 0 THEN
               (n - 1) * wvar / ((n - 2 * g) * (n - 2 * g - 1)) END)
               AS d0
      FROM s
    )
    SELECT ROUND(t1, 6) AS trimmed_mean_disc,
           ROUND(t0, 6) AS trimmed_mean_full,
           ROUND(t1 - t0, 6) AS trimmed_diff,
           ROUND((t1 - t0) / SQRT(d1 + d0), 4) AS yuen_t
    FROM wide
    """,
)
def q509_yuen_trimmed_t(spark, sf_dir):
    """Yuen's trimmed-mean t (20% trim) for discounted vs full-price
    quantities: compare the MIDDLE 60% of each group with winsorized
    variances — the robust two-sample test that q419's Welch z is
    not: a heavy tail or clerical outliers move Welch but barely
    touch Yuen, so divergence between the two IS the outlier alarm.
    Order statistics come from the DISTRIBUTED global sample-sort rank
    over (grp, x, tiebreak) — a 2-value PARTITION BY window would
    funnel half the fact table through one task, the q555 shape with a
    fig leaf — with per-group ranks recovered by subtracting the
    2-row group-offset table.  The winsorization bounds are two
    rank-selected ROWS (not the ranked table) broadcast back, so
    no percentile interpolation and full engine parity."""
    from graphmapreduce_spark.operators.sort import global_rank

    li = _t(spark, sf_dir, "lineitem")
    grp = F.when(F.col("l_discount") >= 0.05, 1).otherwise(0)
    ranked_g = global_rank(
        li.select(
            grp.alias("grp"),
            F.col("l_quantity").alias("x"),
            "l_orderkey",
            "l_linenumber",
        ),
        ["grp", "x", "l_orderkey", "l_linenumber"],
        rank_col="_gr",
    )
    counts = ranked_g.groupBy("grp").agg(F.count(F.lit(1)).alias("n"))
    woff = Window.orderBy("grp").rowsBetween(
        Window.unboundedPreceding, -1
    )
    bounds = counts.select(
        "grp",
        F.coalesce(F.sum("n").over(woff), F.lit(0)).alias("off"),
        "n",
        F.floor(0.2 * F.col("n")).cast("bigint").alias("g"),
    )
    ranked = (
        ranked_g.join(F.broadcast(bounds), "grp")
        .select(
            "grp",
            "x",
            (F.col("_gr") - F.col("off")).alias("rk"),
            F.col("n").alias("bn"),
            F.col("g").alias("bg"),
        )
        .localCheckpoint(eager=True)
    )
    lo = (
        ranked.filter(F.col("rk") == F.col("bg") + 1)
        .select("grp", F.col("x").alias("lox"))
    )
    hi = (
        ranked.filter(F.col("rk") == F.col("bn") - F.col("bg"))
        .select("grp", F.col("x").alias("hix"))
    )
    wins = (
        ranked.join(F.broadcast(lo), "grp")
        .join(F.broadcast(hi), "grp")
        .select(
            "grp",
            F.col("bn").alias("n"),
            F.col("bg").alias("g"),
            F.when(F.col("rk") <= F.col("bg"), F.col("lox"))
            .when(F.col("rk") > F.col("bn") - F.col("bg"), F.col("hix"))
            .otherwise(F.col("x"))
            .alias("wx"),
            F.when(
                (F.col("rk") > F.col("bg"))
                & (F.col("rk") <= F.col("bn") - F.col("bg")),
                F.col("x"),
            ).alias("tx"),
        )
    )
    s = wins.groupBy("grp").agg(
        F.max("n").cast("double").alias("n"),
        F.max("g").cast("double").alias("g"),
        F.avg("tx").alias("tmean"),
        F.var_samp("wx").alias("wvar"),
    )
    dterm = (
        (F.col("n") - 1)
        * F.col("wvar")
        / (
            (F.col("n") - 2 * F.col("g"))
            * (F.col("n") - 2 * F.col("g") - 1)
        )
    )
    wide = s.agg(
        F.max(F.when(F.col("grp") == 1, F.col("tmean"))).alias("t1"),
        F.max(F.when(F.col("grp") == 0, F.col("tmean"))).alias("t0"),
        F.max(F.when(F.col("grp") == 1, dterm)).alias("d1"),
        F.max(F.when(F.col("grp") == 0, dterm)).alias("d0"),
    )
    return wide.select(
        F.round("t1", 6).alias("trimmed_mean_disc"),
        F.round("t0", 6).alias("trimmed_mean_full"),
        F.round(F.col("t1") - F.col("t0"), 6).alias("trimmed_diff"),
        F.round(
            (F.col("t1") - F.col("t0"))
            / F.sqrt(F.col("d1") + F.col("d0")),
            4,
        ).alias("yuen_t"),
    )


@register(
    "q510_peak_prominence",
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
      SELECT mth, rev, ROW_NUMBER() OVER (ORDER BY mth) AS i
      FROM monthly
    ),
    peaks AS (
      SELECT s.mth, s.rev, s.i
      FROM seq s
      JOIN seq p ON p.i = s.i - 1
      JOIN seq n ON n.i = s.i + 1
      WHERE s.rev > p.rev AND s.rev > n.rev
    ),
    lbound AS (
      SELECT pk.i AS pi, MAX(o.i) AS lb
      FROM peaks pk LEFT JOIN seq o
        ON o.i < pk.i AND o.rev > pk.rev
      GROUP BY pk.i
    ),
    rbound AS (
      SELECT pk.i AS pi, MIN(o.i) AS rb
      FROM peaks pk LEFT JOIN seq o
        ON o.i > pk.i AND o.rev > pk.rev
      GROUP BY pk.i
    ),
    valleys AS (
      SELECT pk.i, pk.mth, pk.rev,
             MIN(CASE WHEN o.i > COALESCE(l.lb, 0) AND o.i < pk.i
                      THEN o.rev END) AS vleft,
             MIN(CASE WHEN o.i > pk.i
                       AND o.i < COALESCE(r.rb, 1000000)
                      THEN o.rev END) AS vright
      FROM peaks pk
      JOIN lbound l ON l.pi = pk.i
      JOIN rbound r ON r.pi = pk.i
      JOIN seq o ON o.i <> pk.i
      GROUP BY pk.i, pk.mth, pk.rev
    )
    SELECT mth AS peak_month,
           ROUND(rev / 1000, 1) AS revenue_k,
           ROUND((rev - GREATEST(COALESCE(vleft, 0),
                                 COALESCE(vright, 0))) / 1000, 1)
             AS prominence_k
    FROM valleys
    ORDER BY rev - GREATEST(COALESCE(vleft, 0), COALESCE(vright, 0))
             DESC, mth
    LIMIT 5
    """,
)
def q510_peak_prominence(spark, sf_dir):
    """Topographic peak prominence on monthly revenue: for each local
    maximum, descend to the lowest valley you must cross to reach
    higher ground on either side — prominence = peak − max(valley_L,
    valley_R) — the measure that separates a STRUCTURAL demand peak
    from a wiggle on a slope, which raw local-max detection (q452
    counts them) cannot.  Bounds-to-nearest-higher and valley minima
    are conditional aggregates over the 80-row monthly table; top-5
    by prominence."""
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
        "mth", "rev", F.row_number().over(Window.orderBy("mth")).alias("i")
    ).localCheckpoint(eager=True)
    s, p, n = seq.alias("s"), seq.alias("p"), seq.alias("n")
    peaks = (
        s.join(p, F.col("p.i") == F.col("s.i") - 1)
        .join(n, F.col("n.i") == F.col("s.i") + 1)
        .filter(
            (F.col("s.rev") > F.col("p.rev"))
            & (F.col("s.rev") > F.col("n.rev"))
        )
        .select(
            F.col("s.mth").alias("mth"),
            F.col("s.rev").alias("rev"),
            F.col("s.i").alias("i"),
        )
    )
    o = seq.alias("o")
    lbound = (
        peaks.alias("pk")
        .join(
            o,
            (F.col("o.i") < F.col("pk.i"))
            & (F.col("o.rev") > F.col("pk.rev")),
            "left",
        )
        .groupBy(F.col("pk.i").alias("pi"))
        .agg(F.max(F.col("o.i")).alias("lb"))
    )
    rbound = (
        peaks.alias("pk")
        .join(
            o,
            (F.col("o.i") > F.col("pk.i"))
            & (F.col("o.rev") > F.col("pk.rev")),
            "left",
        )
        .groupBy(F.col("pk.i").alias("pi"))
        .agg(F.min(F.col("o.i")).alias("rb"))
    )
    valleys = (
        peaks.alias("pk")
        .join(lbound, F.col("pi") == F.col("pk.i"))
        .drop("pi")
        .join(rbound, F.col("pi") == F.col("pk.i"))
        .join(o, F.col("o.i") != F.col("pk.i"))
        .groupBy(
            F.col("pk.i").alias("i"),
            F.col("pk.mth").alias("mth"),
            F.col("pk.rev").alias("rev"),
        )
        .agg(
            F.min(
                F.when(
                    (F.col("o.i") > F.coalesce(F.col("lb"), F.lit(0)))
                    & (F.col("o.i") < F.col("pk.i")),
                    F.col("o.rev"),
                )
            ).alias("vleft"),
            F.min(
                F.when(
                    (F.col("o.i") > F.col("pk.i"))
                    & (
                        F.col("o.i")
                        < F.coalesce(F.col("rb"), F.lit(1000000))
                    ),
                    F.col("o.rev"),
                )
            ).alias("vright"),
        )
    )
    prom = F.col("rev") - F.greatest(
        F.coalesce(F.col("vleft"), F.lit(0.0)),
        F.coalesce(F.col("vright"), F.lit(0.0)),
    )
    return (
        valleys.select(
            F.col("mth").alias("peak_month"),
            F.round(F.col("rev") / 1000, 1).alias("revenue_k"),
            F.round(prom / 1000, 1).alias("prominence_k"),
            prom.alias("_p"),
        )
        .orderBy(F.col("_p").desc(), "peak_month")
        .limit(5)
        .drop("_p")
    )


@register(
    "q511_synthetic_control",
    """
    WITH bm AS (
      SELECT p.p_brand AS brand,
             CAST(date_trunc('month', l.l_shipdate) AS DATE) AS mth,
             SUM(l.l_extendedprice * (1 - l.l_discount)) AS r
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY 1, 2
    ),
    treated AS (
      SELECT p.p_brand AS tb
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY p.p_brand
      ORDER BY SUM(CASE WHEN l.l_discount >= 0.05
                        THEN l.l_extendedprice ELSE 0 END)
               / SUM(l.l_extendedprice) DESC, p.p_brand
      LIMIT 1
    ),
    months AS (
      SELECT mth, ROW_NUMBER() OVER (ORDER BY mth) AS rn,
             COUNT(*) OVER () AS n
      FROM (SELECT DISTINCT mth FROM bm)
    ),
    panel AS (
      SELECT b.brand, b.r, m.rn <= m.n / 2 AS pre, t.tb
      FROM bm b JOIN months m ON b.mth = m.mth CROSS JOIN treated t
    ),
    tr AS (
      SELECT pre, r FROM panel WHERE brand = tb
    ),
    donors AS (
      SELECT p.brand,
             COUNT(*)::DOUBLE AS n,
             SUM(p.r * t.r) - COUNT(*) * AVG(p.r) * AVG(t.r) AS cxy,
             SUM(p.r * p.r) - COUNT(*) * AVG(p.r) * AVG(p.r) AS cxx,
             SUM(t.r * t.r) - COUNT(*) * AVG(t.r) * AVG(t.r) AS cyy
      FROM (SELECT b.brand, b.r, m.rn
            FROM bm b JOIN months m ON b.mth = m.mth
            CROSS JOIN treated t
            WHERE b.brand <> t.tb AND m.rn <= m.n / 2) p
      JOIN (SELECT b.r, m.rn
            FROM bm b JOIN months m ON b.mth = m.mth
            CROSS JOIN treated t
            WHERE b.brand = t.tb AND m.rn <= m.n / 2) t
        ON p.rn = t.rn
      GROUP BY p.brand
    ),
    w AS (
      SELECT brand,
             GREATEST(cxy / SQRT(cxx * cyy), 0) AS wraw
      FROM donors
    ),
    wn AS (
      SELECT brand, wraw / SUM(wraw) OVER () AS wt
      FROM w WHERE wraw > 0
    ),
    post AS (
      SELECT SUM(CASE WHEN p.brand = p.tb THEN p.r ELSE 0 END)
               AS actual,
             SUM(CASE WHEN wn.wt IS NOT NULL THEN p.r * wn.wt
                      ELSE 0 END) AS synthetic
      FROM panel p LEFT JOIN wn ON p.brand = wn.brand
      WHERE NOT p.pre
    )
    SELECT (SELECT tb FROM treated) AS treated_brand,
           CAST((SELECT COUNT(*) FROM wn) AS BIGINT) AS n_donors,
           ROUND(actual / 1000, 1) AS post_actual_k,
           ROUND(synthetic / 1000, 1) AS post_synthetic_k,
           ROUND((actual - synthetic) / 1000, 1) AS gap_k,
           ROUND(actual / synthetic - 1, 6) AS gap_pct
    FROM post
    """,
)
def q511_synthetic_control(spark, sf_dir):
    """Synthetic-control-flavored counterfactual for the most-
    discounted brand: donors are the other 24 brands weighted by
    their (positive, normalized) pre-period revenue correlation with
    the treated brand, and the post-period gap actual − synthetic is
    the treatment read — the Abadie idea reduced to a deterministic
    correlation-weighted donor pool (no quadratic program), which is
    the honest closed-form version a SQL engine can verify.  The
    panel is the 25×80 month×brand aggregate; weights come from one
    sufficient-statistics pass over its pre-period half."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    joined = li.join(p, li.l_partkey == p.p_partkey)
    bm = joined.groupBy(
        F.col("p_brand").alias("brand"),
        F.to_date(F.date_trunc("MONTH", "l_shipdate")).alias("mth"),
    ).agg(
        F.sum(
            F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
        ).alias("r")
    )
    treated = (
        joined.groupBy(F.col("p_brand").alias("tb"))
        .agg(
            (
                F.sum(
                    F.when(
                        F.col("l_discount") >= 0.05,
                        F.col("l_extendedprice"),
                    ).otherwise(0.0)
                )
                / F.sum("l_extendedprice")
            ).alias("ds")
        )
        .orderBy(F.col("ds").desc(), "tb")
        .limit(1)
        .select("tb")
    )
    months = (
        bm.select("mth")
        .distinct()
        .select(
            "mth",
            F.row_number().over(Window.orderBy("mth")).alias("rn"),
            F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
        )
    )
    panel = (
        bm.join(months, "mth")
        .crossJoin(F.broadcast(treated))
        .select(
            "brand",
            "r",
            "rn",
            (F.col("rn") <= F.col("n") / 2).alias("pre"),
            "tb",
        )
    )
    tr_pre = panel.filter(
        (F.col("brand") == F.col("tb")) & F.col("pre")
    ).select(F.col("rn").alias("trn"), F.col("r").alias("tr"))
    don_pre = panel.filter(
        (F.col("brand") != F.col("tb")) & F.col("pre")
    ).select("brand", "rn", F.col("r").alias("dr"))
    cnt = F.count(F.lit(1))
    donors = (
        don_pre.join(F.broadcast(tr_pre), don_pre.rn == tr_pre.trn)
        .groupBy("brand")
        .agg(
            (
                F.sum(F.col("dr") * F.col("tr"))
                - cnt * F.avg("dr") * F.avg("tr")
            ).alias("cxy"),
            (
                F.sum(F.col("dr") * F.col("dr"))
                - cnt * F.avg("dr") * F.avg("dr")
            ).alias("cxx"),
            (
                F.sum(F.col("tr") * F.col("tr"))
                - cnt * F.avg("tr") * F.avg("tr")
            ).alias("cyy"),
        )
    )
    w = donors.select(
        "brand",
        F.greatest(
            F.col("cxy") / F.sqrt(F.col("cxx") * F.col("cyy")),
            F.lit(0.0),
        ).alias("wraw"),
    ).filter(F.col("wraw") > 0)
    wall = Window.partitionBy()
    wn = w.select(
        "brand", (F.col("wraw") / F.sum("wraw").over(wall)).alias("wt")
    )
    ndon = wn.agg(F.count(F.lit(1)).alias("n_donors"))
    post = (
        panel.filter(~F.col("pre"))
        .join(wn.withColumnRenamed("brand", "wb"),
              F.col("brand") == F.col("wb"), "left")
        .agg(
            F.sum(
                F.when(
                    F.col("brand") == F.col("tb"), F.col("r")
                ).otherwise(0.0)
            ).alias("actual"),
            F.sum(
                F.when(
                    F.col("wt").isNotNull(), F.col("r") * F.col("wt")
                ).otherwise(0.0)
            ).alias("synthetic"),
        )
    )
    return (
        post.crossJoin(F.broadcast(treated))
        .crossJoin(F.broadcast(ndon))
        .select(
            F.col("tb").alias("treated_brand"),
            F.col("n_donors").cast("bigint").alias("n_donors"),
            F.round(F.col("actual") / 1000, 1).alias("post_actual_k"),
            F.round(F.col("synthetic") / 1000, 1).alias(
                "post_synthetic_k"
            ),
            F.round(
                (F.col("actual") - F.col("synthetic")) / 1000, 1
            ).alias("gap_k"),
            F.round(
                F.col("actual") / F.col("synthetic") - 1, 6
            ).alias("gap_pct"),
        )
    )


@register(
    "q512_burt_constraint",
    """
    WITH e AS (
      SELECT DISTINCT LEAST(l_orderkey % 500, l_partkey % 500) AS a,
             GREATEST(l_orderkey % 500, l_partkey % 500) AS b
      FROM lineitem
      WHERE l_linenumber = 1
        AND l_orderkey % 500 <> l_partkey % 500
    ),
    dir AS (
      SELECT a AS i, b AS j FROM e
      UNION ALL SELECT b, a FROM e
    ),
    deg AS (SELECT i, COUNT(*)::DOUBLE AS d FROM dir GROUP BY i),
    p AS (
      SELECT dir.i, dir.j, 1.0 / deg.d AS pij
      FROM dir JOIN deg ON dir.i = deg.i
    ),
    twohop AS (
      SELECT a.i, b.j, SUM(a.pij * b.pij) AS s
      FROM p a JOIN p b ON a.j = b.i
      WHERE a.i <> b.j
      GROUP BY a.i, b.j
    ),
    c AS (
      SELECT p.i,
             SUM(POWER(p.pij + COALESCE(t.s, 0), 2)) AS constraint_i
      FROM p LEFT JOIN twohop t ON p.i = t.i AND p.j = t.j
      GROUP BY p.i
    )
    SELECT CAST(c.i AS BIGINT) AS vertex,
           CAST(deg.d AS BIGINT) AS degree,
           ROUND(c.constraint_i, 6) AS burt_constraint
    FROM c JOIN deg ON c.i = deg.i
    ORDER BY c.constraint_i DESC, c.i
    LIMIT 10
    """,
)
def q512_burt_constraint(spark, sf_dir):
    """Burt's network constraint on the (linenumber-1-sampled)
    mod-500 projection: cᵢ = Σⱼ (pᵢⱼ + Σq pᵢq pqⱼ)² over i's
    neighbors — HIGH constraint means your contacts all know each
    other (no structural holes, redundant information), the inverse
    of brokerage; the SNA complement to q404's local bridges, which
    find the holes themselves.  One normalized-adjacency build and
    one two-hop join grouped back to (i,j); the edge sample keeps
    Σdeg² bounded, the documented scale knob for this motif family."""
    li = _t(spark, sf_dir, "lineitem")
    s, t = F.col("l_orderkey") % 500, F.col("l_partkey") % 500
    e = (
        li.filter(F.col("l_linenumber") == 1)
        .select(F.least(s, t).alias("a"), F.greatest(s, t).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    dire = e.select(
        F.col("a").alias("i"), F.col("b").alias("j")
    ).unionByName(e.select(F.col("b").alias("i"), F.col("a").alias("j")))
    deg = dire.groupBy("i").agg(F.count(F.lit(1)).cast("double").alias("d"))
    pm = dire.join(deg, "i").select(
        "i", "j", (F.lit(1.0) / F.col("d")).alias("pij")
    ).localCheckpoint(eager=True)
    a = pm.select(
        F.col("i").alias("ai"), F.col("j").alias("aj"),
        F.col("pij").alias("pa"),
    )
    b = pm.select(
        F.col("i").alias("bi"), F.col("j").alias("bj"),
        F.col("pij").alias("pb"),
    )
    twohop = (
        a.join(b, F.col("aj") == F.col("bi"))
        .filter(F.col("ai") != F.col("bj"))
        .groupBy(F.col("ai").alias("i"), F.col("bj").alias("j"))
        .agg(F.sum(F.col("pa") * F.col("pb")).alias("s"))
    )
    c = (
        pm.join(twohop, ["i", "j"], "left")
        .groupBy("i")
        .agg(
            F.sum(
                F.pow(
                    F.col("pij") + F.coalesce(F.col("s"), F.lit(0.0)), 2
                )
            ).alias("constraint_i")
        )
    )
    return (
        c.join(deg, "i")
        .select(
            F.col("i").cast("bigint").alias("vertex"),
            F.col("d").cast("bigint").alias("degree"),
            F.round("constraint_i", 6).alias("burt_constraint"),
            F.col("constraint_i").alias("_c"),
        )
        .orderBy(F.col("_c").desc(), "vertex")
        .limit(10)
        .drop("_c")
    )


@register(
    "q513_gravity_model",
    """
    WITH flows AS (
      SELECT cn.n_name AS cnation, sn.n_name AS snation,
             SUM(l.l_extendedprice * (1 - l.l_discount)) AS flow
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation cn ON c.c_nationkey = cn.n_nationkey
      JOIN supplier su ON l.l_suppkey = su.s_suppkey
      JOIN nation sn ON su.s_nationkey = sn.n_nationkey
      GROUP BY 1, 2
    ),
    mass AS (
      SELECT cnation AS nation, SUM(flow) AS imports FROM flows
      GROUP BY 1
    ),
    smass AS (
      SELECT snation AS nation, SUM(flow) AS exports FROM flows
      GROUP BY 1
    ),
    obs AS (
      SELECT LN(f.flow) AS y, LN(m.imports) AS x1,
             LN(s.exports) AS x2
      FROM flows f
      JOIN mass m ON f.cnation = m.nation
      JOIN smass s ON f.snation = s.nation
      WHERE f.flow > 0
    ),
    c AS (
      SELECT COUNT(*)::DOUBLE AS n,
             SUM(x1 * y) - COUNT(*) * AVG(x1) * AVG(y) AS s1y,
             SUM(x2 * y) - COUNT(*) * AVG(x2) * AVG(y) AS s2y,
             SUM(x1 * x1) - COUNT(*) * AVG(x1) * AVG(x1) AS s11,
             SUM(x2 * x2) - COUNT(*) * AVG(x2) * AVG(x2) AS s22,
             SUM(x1 * x2) - COUNT(*) * AVG(x1) * AVG(x2) AS s12,
             SUM(y * y) - COUNT(*) * AVG(y) * AVG(y) AS syy
      FROM obs
    )
    SELECT CAST(n AS BIGINT) AS n_pairs,
           ROUND((s1y * s22 - s2y * s12)
                 / (s11 * s22 - s12 * s12), 6) AS elasticity_imports,
           ROUND((s2y * s11 - s1y * s12)
                 / (s11 * s22 - s12 * s12), 6) AS elasticity_exports,
           ROUND(((s1y * s22 - s2y * s12) * s1y
                + (s2y * s11 - s1y * s12) * s2y)
                 / ((s11 * s22 - s12 * s12) * syy), 6) AS r_squared
    FROM c
    """,
)
def q513_gravity_model(spark, sf_dir):
    """Gravity model of the nation-to-nation trade flows (q345's
    matrix, modeled): ln(flow) regressed on ln(importer mass) and
    ln(exporter mass), closed-form 2-regressor OLS — elasticities
    near 1 with high R² mean flows are proportional to economic
    mass and the RESIDUALS are the interesting part (pairs trading
    above/below gravity).  Masses are the flow margins themselves;
    the 625-cell flow matrix comes from one 5-way star join that
    broadcasts every dimension."""
    li = _t(spark, sf_dir, "lineitem")
    od = _t(spark, sf_dir, "orders")
    cu = _t(spark, sf_dir, "customer")
    su = _t(spark, sf_dir, "supplier")
    na = _t(spark, sf_dir, "nation")
    cn = na.select(
        F.col("n_nationkey").alias("cnk"), F.col("n_name").alias("cnation")
    )
    sn = na.select(
        F.col("n_nationkey").alias("snk"), F.col("n_name").alias("snation")
    )
    flows = (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .join(cu, od.o_custkey == cu.c_custkey)
        .join(F.broadcast(cn), cu.c_nationkey == F.col("cnk"))
        .join(F.broadcast(su), li.l_suppkey == su.s_suppkey)
        .join(F.broadcast(sn), su.s_nationkey == F.col("snk"))
        .groupBy("cnation", "snation")
        .agg(
            F.sum(
                F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
            ).alias("flow")
        )
    )
    mass = flows.groupBy(F.col("cnation").alias("mn")).agg(
        F.sum("flow").alias("imports")
    )
    smass = flows.groupBy(F.col("snation").alias("sn2")).agg(
        F.sum("flow").alias("exports")
    )
    obs = (
        flows.filter(F.col("flow") > 0)
        .join(F.broadcast(mass), flows.cnation == F.col("mn"))
        .join(F.broadcast(smass), flows.snation == F.col("sn2"))
        .select(
            F.log("flow").alias("y"),
            F.log("imports").alias("x1"),
            F.log("exports").alias("x2"),
        )
    )
    cnt = F.count(F.lit(1))
    c = obs.agg(
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
    return c.select(
        F.col("n").cast("bigint").alias("n_pairs"),
        F.round(b1, 6).alias("elasticity_imports"),
        F.round(b2, 6).alias("elasticity_exports"),
        F.round(
            (b1 * F.col("s1y") + b2 * F.col("s2y")) / F.col("syy"), 6
        ).alias("r_squared"),
    )


@register(
    "q514_taylors_law",
    """
    WITH bd AS (
      SELECT p.p_brand AS brand,
             CAST(date_trunc('day', l.l_shipdate) AS DATE) AS day,
             SUM(l.l_quantity) AS q
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY 1, 2
    ),
    stats AS (
      SELECT brand, LN(AVG(q)) AS x, LN(VAR_SAMP(q)) AS y
      FROM bd GROUP BY brand
    ),
    c AS (
      SELECT COUNT(*)::DOUBLE AS n,
             AVG(x) AS mx, AVG(y) AS my,
             SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy
      FROM stats
    )
    SELECT CAST(n AS BIGINT) AS n_brands,
           ROUND((sxy - n * mx * my) / (sxx - n * mx * mx), 4)
             AS taylor_slope_b,
           ROUND(my - (sxy - n * mx * my) / (sxx - n * mx * mx) * mx,
                 4) AS intercept,
           ROUND(POWER(sxy - n * mx * my, 2)
                 / ((sxx - n * mx * mx) * (syy - n * my * my)), 6)
             AS r_squared
    FROM c
    """,
)
def q514_taylors_law(spark, sf_dir):
    """Taylor's power law across brands: Var(daily demand) ∝
    Mean(daily demand)^b, fitted log-log over the 25 brand points —
    b≈1 is Poisson-like independent demand, b→2 means demand scales
    with synchronized bursts (everyone orders the popular brand on
    the same days); b is THE parameter for setting per-brand safety
    stock from mean volume alone, feeding q433's buffers.  One
    (brand, day) rollup, one 25-point closed-form OLS."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    bd = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.to_date(F.date_trunc("DAY", "l_shipdate")).alias("day"),
        )
        .agg(F.sum("l_quantity").alias("q"))
    )
    stats = bd.groupBy("brand").agg(
        F.log(F.avg("q")).alias("x"),
        F.log(F.var_samp("q")).alias("y"),
    )
    cnt = F.count(F.lit(1))
    c = stats.agg(
        cnt.cast("double").alias("n"),
        F.avg("x").alias("mx"),
        F.avg("y").alias("my"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    n, mx, my = F.col("n"), F.col("mx"), F.col("my")
    cxy = F.col("sxy") - n * mx * my
    cxx = F.col("sxx") - n * mx * mx
    cyy = F.col("syy") - n * my * my
    return c.select(
        n.cast("bigint").alias("n_brands"),
        F.round(cxy / cxx, 4).alias("taylor_slope_b"),
        F.round(my - cxy / cxx * mx, 4).alias("intercept"),
        F.round(F.pow(cxy, 2) / (cxx * cyy), 6).alias("r_squared"),
    )


@register(
    "q515_time_irreversibility",
    """
    WITH seq AS (
      SELECT event_type AS cur,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev
      FROM events
    ),
    trans AS (
      SELECT prev AS i, cur AS j, COUNT(*)::DOUBLE AS n
      FROM seq WHERE prev IS NOT NULL
      GROUP BY prev, cur
    ),
    tot AS (SELECT SUM(n) AS nt FROM trans),
    paired AS (
      SELECT f.i, f.j, f.n / t.nt AS pij, r.n / t.nt AS pji
      FROM trans f
      JOIN trans r ON f.i = r.j AND f.j = r.i
      CROSS JOIN tot t
      WHERE f.i <> f.j
    )
    SELECT CAST((SELECT nt FROM tot) AS BIGINT) AS n_transitions,
           CAST(COUNT(*) AS BIGINT) AS n_ordered_pairs,
           ROUND(SUM(pij * LN(pij / pji)), 6) AS kl_irreversibility,
           ROUND(MAX(ABS(pij - pji)), 6) AS max_pair_asymmetry
    FROM paired
    """,
)
def q515_time_irreversibility(spark, sf_dir):
    """Time-irreversibility of the event process: KL divergence
    between the forward transition distribution p(i→j) and its
    reverse p(j→i) — exactly zero for any equilibrium/reversible
    chain, positive when behavior has an ARROW (view→purchase flows
    forward, purchase→view doesn't), which is the property that
    session-replay augmentation and sequence-model training both
    quietly assume.  Off-diagonal pairs join the transition table to
    its own transpose; the KL folds in one pass over ≤20 ordered
    pairs."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("cur"),
        F.lag("event_type").over(w).alias("prev"),
    ).filter(F.col("prev").isNotNull())
    trans = seq.groupBy(
        F.col("prev").alias("i"), F.col("cur").alias("j")
    ).agg(F.count(F.lit(1)).cast("double").alias("n"))
    tot = trans.agg(F.sum("n").alias("nt"))
    fwd = trans.select("i", "j", F.col("n").alias("nf"))
    rev = trans.select(
        F.col("i").alias("rj"), F.col("j").alias("ri"),
        F.col("n").alias("nr"),
    )
    paired = (
        fwd.join(
            rev, (fwd.i == F.col("ri")) & (fwd.j == F.col("rj"))
        )
        .filter(F.col("i") != F.col("j"))
        .crossJoin(F.broadcast(tot))
        .select(
            (F.col("nf") / F.col("nt")).alias("pij"),
            (F.col("nr") / F.col("nt")).alias("pji"),
            "nt",
        )
    )
    return paired.agg(
        F.max("nt").cast("bigint").alias("n_transitions"),
        F.count(F.lit(1)).cast("bigint").alias("n_ordered_pairs"),
        F.round(
            F.sum(F.col("pij") * F.log(F.col("pij") / F.col("pji"))), 6
        ).alias("kl_irreversibility"),
        F.round(F.max(F.abs(F.col("pij") - F.col("pji"))), 6).alias(
            "max_pair_asymmetry"
        ),
    )


@register(
    "q516_gallagher_index",
    """
    WITH rev AS (
      SELECT p.p_brand AS brand,
             SUM(l.l_extendedprice * (1 - l.l_discount)) AS r
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY 1
    ),
    cat AS (
      SELECT p_brand AS brand, COUNT(*)::DOUBLE AS np
      FROM part GROUP BY 1
    ),
    shares AS (
      SELECT r.brand,
             100 * r.r / SUM(r.r) OVER () AS v,
             100 * c.np / SUM(c.np) OVER () AS s
      FROM rev r JOIN cat c ON r.brand = c.brand
    )
    SELECT brand,
           ROUND(v, 4) AS revenue_share_pct,
           ROUND(s, 4) AS catalog_share_pct,
           ROUND(v - s, 4) AS over_representation,
           ROUND(SQRT(0.5 * SUM(POWER(v - s, 2)) OVER ()), 4)
             AS gallagher_index
    FROM shares
    """,
)
def q516_gallagher_index(spark, sf_dir):
    """Gallagher disproportionality between catalog share (parts
    carried) and revenue share per brand — the electoral-systems
    index √(½Σ(vᵢ−sᵢ)²) repurposed as a merchandising audit: a high
    index means shelf space and sales have diverged and the
    assortment no longer reflects demand (q361's dead stock is the
    row-level view; this is the one-number summary, carried on every
    row beside each brand's own gap).  Two grouped scans and window
    shares."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    rev = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.sum(
                F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
            ).alias("r")
        )
    )
    cat = p.groupBy(F.col("p_brand").alias("brand")).agg(
        F.count(F.lit(1)).cast("double").alias("np")
    )
    wall = Window.partitionBy()
    shares = rev.join(cat, "brand").select(
        "brand",
        (100 * F.col("r") / F.sum("r").over(wall)).alias("v"),
        (100 * F.col("np") / F.sum("np").over(wall)).alias("s"),
    )
    return shares.select(
        "brand",
        F.round("v", 4).alias("revenue_share_pct"),
        F.round("s", 4).alias("catalog_share_pct"),
        F.round(F.col("v") - F.col("s"), 4).alias("over_representation"),
        F.round(
            F.sqrt(
                F.lit(0.5)
                * F.sum(F.pow(F.col("v") - F.col("s"), 2)).over(wall)
            ),
            4,
        ).alias("gallagher_index"),
    )


@register(
    "q517_menzerath_altmann",
    r"""
    WITH sents AS (
      SELECT trim(s) AS sent
      FROM documents,
           UNNEST(string_split_regex(text, '[.!?]+')) AS t(s)
      WHERE trim(s) <> ''
    ),
    feat AS (
      SELECT len(list_filter(string_split_regex(sent, '\s+'),
                             w -> w <> '')) AS nw,
             CAST(length(regexp_replace(sent, '\s+', '', 'g'))
                  AS DOUBLE) AS chars
      FROM sents
    ),
    grouped AS (
      SELECT nw, COUNT(*)::DOUBLE AS cnt,
             AVG(chars / nw) AS mean_awl
      FROM feat WHERE nw >= 2
      GROUP BY nw HAVING COUNT(*) >= 20
    ),
    c AS (
      SELECT COUNT(*)::DOUBLE AS n,
             AVG(LN(CAST(nw AS DOUBLE))) AS mx,
             AVG(LN(mean_awl)) AS my,
             SUM(LN(CAST(nw AS DOUBLE)) * LN(mean_awl)) AS sxy,
             SUM(POWER(LN(CAST(nw AS DOUBLE)), 2)) AS sxx,
             SUM(POWER(LN(mean_awl), 2)) AS syy
      FROM grouped
    )
    SELECT CAST(n AS BIGINT) AS n_length_groups,
           ROUND((sxy - n * mx * my) / (sxx - n * mx * mx), 4)
             AS menzerath_slope,
           ROUND(POWER(sxy - n * mx * my, 2)
                 / ((sxx - n * mx * mx) * (syy - n * my * my)), 6)
             AS r_squared
    FROM c
    """,
)
def q517_menzerath_altmann(spark, sf_dir):
    """Menzerath-Altmann law check: do longer sentences use shorter
    words?  Mean word length per sentence-length group, log-log
    slope across groups (≥20 sentences each) — a negative slope is
    the construct-level compression real language shows and
    template-generated text usually violates, making this a
    corpus-authenticity probe alongside q413's brevity law (which is
    token-level, not construct-level).  Sentence explode → per-
    sentence arithmetic → group OLS on ~40 aggregate points."""
    d = _t(spark, sf_dir, "documents")
    sents = d.select(
        F.explode(F.split(F.col("text"), r"[.!?]+")).alias("s")
    ).select(F.trim(F.col("s")).alias("sent")).filter(
        F.col("sent") != ""
    )
    nw = F.size(
        F.filter(F.split(F.col("sent"), r"\s+"), lambda w: w != "")
    )
    feat = sents.select(
        nw.alias("nw"),
        F.length(F.regexp_replace(F.col("sent"), r"\s+", ""))
        .cast("double")
        .alias("chars"),
    )
    grouped = (
        feat.filter(F.col("nw") >= 2)
        .groupBy("nw")
        .agg(
            F.count(F.lit(1)).cast("double").alias("cnt"),
            F.avg(F.col("chars") / F.col("nw")).alias("mean_awl"),
        )
        .filter(F.col("cnt") >= 20)
    )
    lx = F.log(F.col("nw").cast("double"))
    ly = F.log("mean_awl")
    cnt = F.count(F.lit(1))
    c = grouped.agg(
        cnt.cast("double").alias("n"),
        F.avg(lx).alias("mx"),
        F.avg(ly).alias("my"),
        F.sum(lx * ly).alias("sxy"),
        F.sum(F.pow(lx, 2)).alias("sxx"),
        F.sum(F.pow(ly, 2)).alias("syy"),
    )
    n, mx, my = F.col("n"), F.col("mx"), F.col("my")
    cxy = F.col("sxy") - n * mx * my
    cxx = F.col("sxx") - n * mx * mx
    cyy = F.col("syy") - n * my * my
    return c.select(
        n.cast("bigint").alias("n_length_groups"),
        F.round(cxy / cxx, 4).alias("menzerath_slope"),
        F.round(F.pow(cxy, 2) / (cxx * cyy), 6).alias("r_squared"),
    )


@register(
    "q518_median_ci",
    """
    WITH cust AS (
      SELECT SUM(o_totalprice) AS x
      FROM orders GROUP BY o_custkey
    ),
    ranked AS (
      SELECT x, ROW_NUMBER() OVER (ORDER BY x) AS rk,
             COUNT(*) OVER () AS n
      FROM cust
    ),
    bounds AS (
      SELECT MAX(n) AS n,
             CAST(FLOOR(MAX(n) / 2.0 - 1.96 * SQRT(MAX(n)) / 2)
                  AS BIGINT) AS lo_rank,
             CAST(CEIL(MAX(n) / 2.0 + 1.96 * SQRT(MAX(n)) / 2) + 1
                  AS BIGINT) AS hi_rank,
             CAST((MAX(n) + 1) / 2 AS BIGINT) AS med_rank
      FROM ranked
    )
    SELECT CAST(b.n AS BIGINT) AS n_customers,
           ROUND(m.x, 4) AS median_spend,
           ROUND(l.x, 4) AS ci_lo,
           ROUND(h.x, 4) AS ci_hi,
           CAST(b.lo_rank AS BIGINT) AS lo_rank,
           CAST(b.hi_rank AS BIGINT) AS hi_rank
    FROM bounds b
    JOIN ranked m ON m.rk = b.med_rank
    JOIN ranked l ON l.rk = b.lo_rank
    JOIN ranked h ON h.rk = b.hi_rank
    """,
)
def q518_median_ci(spark, sf_dir):
    """Distribution-free 95% confidence interval for the median
    customer spend, from ORDER STATISTICS: ranks n/2 ∓ 1.96√n/2
    bracket the median with binomial coverage, no normality, no
    bootstrap, no interpolation — the CI that q204's bootstrap
    approximates with 200 resamples, obtained here from one sort
    window and three rank-selected rows.  The same trick gives a CI
    for ANY quantile by shifting the center rank."""
    od = _t(spark, sf_dir, "orders")
    cust = od.groupBy("o_custkey").agg(
        F.sum("o_totalprice").alias("x")
    )
    ranked = cust.select(
        "x",
        F.row_number().over(Window.orderBy("x")).alias("rk"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    bounds = ranked.agg(
        F.max("n").alias("n"),
        F.floor(
            F.max("n") / 2.0 - 1.96 * F.sqrt(F.max("n")) / 2
        )
        .cast("bigint")
        .alias("lo_rank"),
        (
            F.ceil(F.max("n") / 2.0 + 1.96 * F.sqrt(F.max("n")) / 2)
            + 1
        )
        .cast("bigint")
        .alias("hi_rank"),
        ((F.max("n") + 1) / 2).cast("bigint").alias("med_rank"),
    )
    m = ranked.select(F.col("rk").alias("mrk"), F.col("x").alias("mx"))
    l = ranked.select(F.col("rk").alias("lrk"), F.col("x").alias("lx"))
    h = ranked.select(F.col("rk").alias("hrk"), F.col("x").alias("hx"))
    return (
        bounds.join(F.broadcast(m), F.col("mrk") == F.col("med_rank"))
        .join(F.broadcast(l), F.col("lrk") == F.col("lo_rank"))
        .join(F.broadcast(h), F.col("hrk") == F.col("hi_rank"))
        .select(
            F.col("n").cast("bigint").alias("n_customers"),
            F.round("mx", 4).alias("median_spend"),
            F.round("lx", 4).alias("ci_lo"),
            F.round("hx", 4).alias("ci_hi"),
            F.col("lo_rank").cast("bigint").alias("lo_rank"),
            F.col("hi_rank").cast("bigint").alias("hi_rank"),
        )
    )


@register(
    "q519_process_capability",
    """
    WITH s AS (
      SELECT p.p_brand AS brand,
             AVG(l.l_quantity) AS mu,
             STDDEV_SAMP(l.l_quantity) AS sd,
             AVG(CASE WHEN l.l_quantity < 1 OR l.l_quantity > 50
                      THEN 1.0 ELSE 0 END) AS oos
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY 1
    )
    SELECT brand,
           ROUND(mu, 4) AS mean_qty,
           ROUND(sd, 4) AS sd_qty,
           ROUND((50 - 1) / (6 * sd), 4) AS cp,
           ROUND(LEAST(50 - mu, mu - 1) / (3 * sd), 4) AS cpk,
           ROUND(oos, 6) AS out_of_spec_rate
    FROM s
    """,
)
def q519_process_capability(spark, sf_dir):
    """Process capability per brand against the quantity spec [1,50]:
    Cp (spec width over 6σ — what the process COULD hold if
    centered) and Cpk (what it actually holds given its centering) —
    the manufacturing pair that, applied to data pipelines, grades a
    field's distribution against its contract bounds; Cpk < 1 says
    violations are arriving even if today's sample shows none (the
    forward-looking version of q111's static range audit).  One
    grouped scan."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    s = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.avg("l_quantity").alias("mu"),
            F.stddev_samp("l_quantity").alias("sd"),
            F.avg(
                F.when(
                    (F.col("l_quantity") < 1) | (F.col("l_quantity") > 50),
                    1.0,
                ).otherwise(0.0)
            ).alias("oos"),
        )
    )
    return s.select(
        "brand",
        F.round("mu", 4).alias("mean_qty"),
        F.round("sd", 4).alias("sd_qty"),
        F.round((50 - 1) / (6 * F.col("sd")), 4).alias("cp"),
        F.round(
            F.least(50 - F.col("mu"), F.col("mu") - 1) / (3 * F.col("sd")),
            4,
        ).alias("cpk"),
        F.round("oos", 6).alias("out_of_spec_rate"),
    )


@register(
    "q520_dq_score",
    """
    WITH o AS (
      SELECT COUNT(*)::DOUBLE AS n,
             AVG(CASE WHEN o_custkey IS NOT NULL
                       AND o_orderdate IS NOT NULL
                      THEN 1.0 ELSE 0 END) AS completeness,
             AVG(CASE WHEN o_totalprice > 0 THEN 1.0 ELSE 0 END)
               AS validity,
             COUNT(DISTINCT o_orderkey)::DOUBLE / COUNT(*)
               AS uniqueness
      FROM orders
    ),
    ref AS (
      SELECT AVG(CASE WHEN c.c_custkey IS NOT NULL
                      THEN 1.0 ELSE 0 END) AS referential
      FROM orders o LEFT JOIN customer c
        ON o.o_custkey = c.c_custkey
    ),
    consist AS (
      SELECT AVG(CASE WHEN ABS(o.o_totalprice - l.s) / o.o_totalprice
                           <= 0.5
                      THEN 1.0 ELSE 0 END) AS consistency
      FROM orders o
      JOIN (SELECT l_orderkey,
                   SUM(l_extendedprice * (1 - l_discount)
                       * (1 + l_tax)) AS s
            FROM lineitem GROUP BY l_orderkey) l
        ON o.o_orderkey = l.l_orderkey
    ),
    fresh AS (
      SELECT AVG(CASE WHEN epoch_us(o_orderdate)
                   >= (SELECT MAX(epoch_us(o_orderdate))
                       FROM orders) - 31536000000000
                      THEN 1.0 ELSE 0 END) AS freshness
      FROM orders
    )
    SELECT ROUND(o.completeness, 6) AS completeness,
           ROUND(o.validity, 6) AS validity,
           ROUND(o.uniqueness, 6) AS uniqueness,
           ROUND(ref.referential, 6) AS referential_integrity,
           ROUND(consist.consistency, 6) AS cross_table_consistency,
           ROUND(fresh.freshness, 6) AS freshness_1y_share,
           ROUND((o.completeness + o.validity + o.uniqueness
                + ref.referential + consist.consistency
                + fresh.freshness) / 6, 6) AS dq_composite
    FROM o CROSS JOIN ref CROSS JOIN consist CROSS JOIN fresh
    """,
)
def q520_dq_score(spark, sf_dir):
    """Composite data-quality score for the orders feed: six measured
    dimensions — completeness, validity, key uniqueness, referential
    integrity against customer, cross-table price consistency
    against the lineitem-derived total, and a 1-year freshness share
    — averaged into one trendable number.  q111 checks rules, q290
    profiles columns; this is the SLA-grade rollup a platform pins
    on a dashboard, and each component is a one-scan conditional
    average (the consistency check reuses the natural join key)."""
    od = _t(spark, sf_dir, "orders")
    cu = _t(spark, sf_dir, "customer")
    li = _t(spark, sf_dir, "lineitem")
    o = od.agg(
        F.avg(
            F.when(
                F.col("o_custkey").isNotNull()
                & F.col("o_orderdate").isNotNull(),
                1.0,
            ).otherwise(0.0)
        ).alias("completeness"),
        F.avg(
            F.when(F.col("o_totalprice") > 0, 1.0).otherwise(0.0)
        ).alias("validity"),
        (
            F.countDistinct("o_orderkey").cast("double")
            / F.count(F.lit(1))
        ).alias("uniqueness"),
    )
    ref = (
        od.join(
            cu.select(F.col("c_custkey")),
            od.o_custkey == F.col("c_custkey"),
            "left",
        )
        .agg(
            F.avg(
                F.when(F.col("c_custkey").isNotNull(), 1.0).otherwise(0.0)
            ).alias("referential")
        )
    )
    lsum = li.groupBy("l_orderkey").agg(
        F.sum(
            F.col("l_extendedprice")
            * (F.lit(1) - F.col("l_discount"))
            * (F.lit(1) + F.col("l_tax"))
        ).alias("s")
    )
    consist = od.join(lsum, od.o_orderkey == lsum.l_orderkey).agg(
        F.avg(
            F.when(
                F.abs(F.col("o_totalprice") - F.col("s"))
                / F.col("o_totalprice")
                <= 0.5,
                1.0,
            ).otherwise(0.0)
        ).alias("consistency")
    )
    mx = od.agg(
        F.max(F.unix_micros(F.col("o_orderdate").cast("timestamp"))).alias(
            "mx"
        )
    )
    fresh = od.crossJoin(F.broadcast(mx)).agg(
        F.avg(
            F.when(
                F.unix_micros(F.col("o_orderdate").cast("timestamp"))
                >= F.col("mx") - F.lit(31536000000000),
                1.0,
            ).otherwise(0.0)
        ).alias("freshness")
    )
    card = (
        o.crossJoin(F.broadcast(ref))
        .crossJoin(F.broadcast(consist))
        .crossJoin(F.broadcast(fresh))
    )
    comp = (
        F.col("completeness")
        + F.col("validity")
        + F.col("uniqueness")
        + F.col("referential")
        + F.col("consistency")
        + F.col("freshness")
    ) / 6
    return card.select(
        F.round("completeness", 6).alias("completeness"),
        F.round("validity", 6).alias("validity"),
        F.round("uniqueness", 6).alias("uniqueness"),
        F.round("referential", 6).alias("referential_integrity"),
        F.round("consistency", 6).alias("cross_table_consistency"),
        F.round("freshness", 6).alias("freshness_1y_share"),
        F.round(comp, 6).alias("dq_composite"),
    )


@register(
    "q521_engle_granger",
    """
    WITH od AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
             SUM(o_totalprice) AS x
      FROM orders GROUP BY 1
    ),
    sh AS (
      SELECT CAST(date_trunc('day', l_shipdate) AS DATE) AS day,
             SUM(l_extendedprice * (1 - l_discount)) AS y
      FROM lineitem GROUP BY 1
    ),
    j AS (
      SELECT od.day, od.x, sh.y FROM od JOIN sh ON od.day = sh.day
    ),
    fit AS (
      SELECT (SUM(x * y) - COUNT(*) * AVG(x) * AVG(y))
             / (SUM(x * x) - COUNT(*) * AVG(x) * AVG(x)) AS b,
             AVG(y) AS my, AVG(x) AS mx
      FROM j
    ),
    resid AS (
      SELECT j.day,
             j.y - (f.my - f.b * f.mx) - f.b * j.x AS e
      FROM j CROSS JOIN fit f
    ),
    lagged AS (
      SELECT e - LAG(e) OVER (ORDER BY day) AS de,
             LAG(e) OVER (ORDER BY day) AS el
      FROM resid
    ),
    df AS (
      SELECT COUNT(*)::DOUBLE AS n,
             SUM(el * de) / SUM(el * el) AS beta,
             SUM(de * de) AS sdd, SUM(el * de) AS sed,
             SUM(el * el) AS see
      FROM lagged WHERE el IS NOT NULL
    )
    SELECT CAST(n AS BIGINT) AS n_days,
           ROUND((SELECT b FROM fit), 6) AS cointegrating_beta,
           ROUND(beta, 6) AS df_beta,
           ROUND(beta / SQRT(((sdd - beta * sed) / (n - 1)) / see), 4)
             AS df_t
    FROM df
    """,
)
def q521_engle_granger(spark, sf_dir):
    """Engle-Granger cointegration test between daily ordered revenue
    and daily shipped revenue: OLS the long-run relation, then a
    no-intercept Dickey-Fuller on its RESIDUALS — a strongly negative
    t says the two series are tied by an equilibrium (shipping
    follows ordering with bounded backlog), so their spread is
    mean-reverting and monitorable even though each series alone may
    wander (q432 tests one series; this tests the LINK).  Two daily
    aggregates, two closed-form regressions."""
    od0 = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    odd = od0.groupBy(
        F.to_date(F.date_trunc("DAY", "o_orderdate")).alias("day")
    ).agg(F.sum("o_totalprice").alias("x"))
    shd = li.groupBy(
        F.to_date(F.date_trunc("DAY", "l_shipdate")).alias("day")
    ).agg(
        F.sum(
            F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
        ).alias("y")
    )
    j = odd.join(shd, "day")
    cnt = F.count(F.lit(1))
    fit = j.agg(
        (
            (F.sum(F.col("x") * F.col("y")) - cnt * F.avg("x") * F.avg("y"))
            / (
                F.sum(F.col("x") * F.col("x"))
                - cnt * F.avg("x") * F.avg("x")
            )
        ).alias("b"),
        F.avg("y").alias("my"),
        F.avg("x").alias("mx"),
    )
    resid = j.crossJoin(F.broadcast(fit)).select(
        "day",
        (
            F.col("y")
            - (F.col("my") - F.col("b") * F.col("mx"))
            - F.col("b") * F.col("x")
        ).alias("e"),
        F.col("b").alias("b"),
    )
    w = Window.orderBy("day")
    lagged = resid.select(
        "b",
        (F.col("e") - F.lag("e").over(w)).alias("de"),
        F.lag("e").over(w).alias("el"),
    ).filter(F.col("el").isNotNull())
    df = lagged.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        (
            F.sum(F.col("el") * F.col("de"))
            / F.sum(F.col("el") * F.col("el"))
        ).alias("beta"),
        F.sum(F.col("de") * F.col("de")).alias("sdd"),
        F.sum(F.col("el") * F.col("de")).alias("sed"),
        F.sum(F.col("el") * F.col("el")).alias("see"),
        F.max("b").alias("cb"),
    )
    beta = F.col("beta")
    return df.select(
        F.col("n").cast("bigint").alias("n_days"),
        F.round("cb", 6).alias("cointegrating_beta"),
        F.round(beta, 6).alias("df_beta"),
        F.round(
            beta
            / F.sqrt(
                (
                    (F.col("sdd") - beta * F.col("sed"))
                    / (F.col("n") - 1)
                )
                / F.col("see")
            ),
            4,
        ).alias("df_t"),
    )


@register(
    "q522_stochastic_dominance",
    """
    WITH top2 AS (
      SELECT p.p_brand AS brand,
             ROW_NUMBER() OVER (
               ORDER BY SUM(l.l_extendedprice * (1 - l.l_discount))
                        DESC, p.p_brand) AS rk
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY p.p_brand QUALIFY rk <= 2
    ),
    vals AS (
      SELECT t.rk, l.l_quantity AS v, COUNT(*)::DOUBLE AS c
      FROM lineitem l
      JOIN part p ON l.l_partkey = p.p_partkey
      JOIN top2 t ON p.p_brand = t.brand
      GROUP BY t.rk, l.l_quantity
    ),
    grid AS (
      SELECT DISTINCT v FROM vals
    ),
    dense AS (
      SELECT g.v, r.rk, COALESCE(vals.c, 0) AS c
      FROM grid g CROSS JOIN (SELECT DISTINCT rk FROM vals) r
      LEFT JOIN vals ON vals.v = g.v AND vals.rk = r.rk
    ),
    cdf AS (
      SELECT v, rk,
             SUM(c) OVER (PARTITION BY rk ORDER BY v)
             / SUM(c) OVER (PARTITION BY rk) AS f
      FROM dense
    ),
    wide AS (
      SELECT v,
             MAX(CASE WHEN rk = 1 THEN f END) AS fa,
             MAX(CASE WHEN rk = 2 THEN f END) AS fb
      FROM cdf GROUP BY v
    )
    SELECT MAX((SELECT brand FROM top2 WHERE rk = 1)) AS brand_a,
           MAX((SELECT brand FROM top2 WHERE rk = 2)) AS brand_b,
           ROUND(SUM(GREATEST(fa - fb, 0))
                 / NULLIF(SUM(ABS(fa - fb)), 0), 6)
             AS violation_ratio_a_over_b,
           ROUND(MAX(ABS(fa - fb)), 6) AS ks_gap,
           CAST(CASE WHEN SUM(GREATEST(fa - fb, 0))
                          / NULLIF(SUM(ABS(fa - fb)), 0) < 0.05
                     THEN 1 ELSE 0 END AS BIGINT) AS a_dominates
    FROM wide
    """,
)
def q522_stochastic_dominance(spark, sf_dir):
    """Almost-first-order stochastic dominance between the two top
    revenue brands' quantity distributions: the violation ratio
    ∫(F_A−F_B)₊ / ∫|F_A−F_B| over the shared value grid — 0 means A
    strictly dominates (its CDF never sits above B's), small means
    'dominates except trivially', the criterion modern eval
    comparisons use instead of a bare mean test because it certifies
    superiority at EVERY quantile simultaneously.  CDFs come from
    per-value histograms densified on the common grid; the integral
    is a discrete sum over ≤50 quantity levels."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    joined = li.join(p, li.l_partkey == p.p_partkey)
    top2 = (
        joined.groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.sum(
                F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
            ).alias("r")
        )
        .select(
            "brand",
            F.row_number()
            .over(Window.orderBy(F.col("r").desc(), "brand"))
            .alias("rk"),
        )
        .filter(F.col("rk") <= 2)
    )
    vals = (
        joined.join(F.broadcast(top2), joined.p_brand == top2.brand)
        .groupBy("rk", F.col("l_quantity").alias("v"))
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
    )
    grid = vals.select("v").distinct()
    rks = vals.select("rk").distinct()
    dense = (
        grid.crossJoin(F.broadcast(rks))
        .join(vals, ["v", "rk"], "left")
        .select("v", "rk", F.coalesce("c", F.lit(0.0)).alias("c"))
    )
    wr = Window.partitionBy("rk")
    wc = Window.partitionBy("rk").orderBy("v").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cdf = dense.select(
        "v",
        "rk",
        (F.sum("c").over(wc) / F.sum("c").over(wr)).alias("f"),
    )
    wide = cdf.groupBy("v").agg(
        F.max(F.when(F.col("rk") == 1, F.col("f"))).alias("fa"),
        F.max(F.when(F.col("rk") == 2, F.col("f"))).alias("fb"),
    )
    names = top2.groupBy().agg(
        F.max(F.when(F.col("rk") == 1, F.col("brand"))).alias("ba"),
        F.max(F.when(F.col("rk") == 2, F.col("brand"))).alias("bb"),
    )
    num = F.sum(F.greatest(F.col("fa") - F.col("fb"), F.lit(0.0)))
    den = F.sum(F.abs(F.col("fa") - F.col("fb")))
    ratio = num / F.nullif(den, F.lit(0.0))
    return wide.crossJoin(F.broadcast(names)).agg(
        F.max("ba").alias("brand_a"),
        F.max("bb").alias("brand_b"),
        F.round(ratio, 6).alias("violation_ratio_a_over_b"),
        F.round(F.max(F.abs(F.col("fa") - F.col("fb"))), 6).alias(
            "ks_gap"
        ),
        F.when(ratio < 0.05, 1)
        .otherwise(0)
        .cast("bigint")
        .alias("a_dominates"),
    )


@register(
    "q523_bimodality_coefficient",
    """
    WITH cent AS (
      SELECT o_orderpriority AS pr,
             o_totalprice - AVG(o_totalprice)
               OVER (PARTITION BY o_orderpriority) AS d
      FROM orders
    ),
    m AS (
      SELECT pr, COUNT(*)::DOUBLE AS n,
             SUM(d * d) / COUNT(*) AS m2,
             SUM(d * d * d) / COUNT(*) AS m3,
             SUM(d * d * d * d) / COUNT(*) AS m4
      FROM cent GROUP BY pr
    )
    SELECT pr AS priority,
           CAST(n AS BIGINT) AS n_orders,
           ROUND(m3 / POWER(m2, 1.5), 4) AS skewness,
           ROUND(m4 / (m2 * m2), 4) AS kurtosis,
           ROUND((POWER(m3 / POWER(m2, 1.5), 2) + 1)
                 / (m4 / (m2 * m2)), 6) AS bimodality_coef,
           CAST(CASE WHEN (POWER(m3 / POWER(m2, 1.5), 2) + 1)
                          / (m4 / (m2 * m2)) > 0.555
                     THEN 1 ELSE 0 END AS BIGINT) AS bimodal_flag
    FROM m
    """,
)
def q523_bimodality_coefficient(spark, sf_dir):
    """Sarle's bimodality coefficient (skew²+1)/kurtosis per order
    priority: BC above the uniform's 5/9 flags a two-population mix
    (e.g., a segment quietly split between small restock orders and
    bulk buys) that every mean-based summary in the suite would
    average away — the cheap moment-based screen you run before
    paying for a real mixture fit.  One windowed centering pass and
    a moment fold per group."""
    od = _t(spark, sf_dir, "orders")
    wp = Window.partitionBy("o_orderpriority")
    cent = od.select(
        F.col("o_orderpriority").alias("pr"),
        (F.col("o_totalprice") - F.avg("o_totalprice").over(wp)).alias(
            "d"
        ),
    )
    cnt = F.count(F.lit(1))
    m = cent.groupBy("pr").agg(
        cnt.cast("double").alias("n"),
        (F.sum(F.col("d") * F.col("d")) / cnt).alias("m2"),
        (F.sum(F.col("d") * F.col("d") * F.col("d")) / cnt).alias("m3"),
        (
            F.sum(F.col("d") * F.col("d") * F.col("d") * F.col("d"))
            / cnt
        ).alias("m4"),
    )
    skew = F.col("m3") / F.pow(F.col("m2"), 1.5)
    kurt = F.col("m4") / (F.col("m2") * F.col("m2"))
    bc = (F.pow(skew, 2) + 1) / kurt
    return m.select(
        F.col("pr").alias("priority"),
        F.col("n").cast("bigint").alias("n_orders"),
        F.round(skew, 4).alias("skewness"),
        F.round(kurt, 4).alias("kurtosis"),
        F.round(bc, 6).alias("bimodality_coef"),
        F.when(bc > 0.555, 1).otherwise(0).cast("bigint").alias(
            "bimodal_flag"
        ),
    )


@register(
    "q524_fractional_knapsack",
    """
    WITH items AS (
      SELECT l_partkey,
             SUM(l_extendedprice * (1 - l_discount)) AS value,
             SUM(l_quantity) AS weight
      FROM lineitem GROUP BY l_partkey
    ),
    budget AS (SELECT 0.2 * SUM(weight) AS b FROM items),
    ranked AS (
      SELECT i.l_partkey, i.value, i.weight,
             i.value / i.weight AS ratio,
             SUM(i.weight) OVER (ORDER BY i.value / i.weight DESC,
                                 i.l_partkey) AS cumw,
             bu.b
      FROM items i CROSS JOIN budget bu
    ),
    taken AS (
      SELECT value, weight, ratio, cumw, b,
             CASE WHEN cumw <= b THEN 1.0
                  WHEN cumw - weight < b
                    THEN (b - (cumw - weight)) / weight
                  ELSE 0 END AS frac
      FROM ranked
    )
    SELECT ROUND(MAX(b), 2) AS capacity,
           CAST(SUM(CASE WHEN frac = 1.0 THEN 1 ELSE 0 END) AS BIGINT)
             AS full_items,
           ROUND(SUM(value * frac) / 1000, 1) AS packed_value_k,
           ROUND(SUM(value * frac) / SUM(value), 6)
             AS value_share_of_total,
           ROUND(MIN(CASE WHEN frac > 0 THEN ratio END), 4)
             AS marginal_ratio
    FROM taken
    """,
)
def q524_fractional_knapsack(spark, sf_dir):
    """Fractional knapsack as a window: pack parts by revenue-per-
    unit-of-inventory into a capacity of 20% of total shipped volume
    — greedy-by-ratio is EXACT for the fractional relaxation, so the
    packed value is a true upper bound for any 0/1 assortment
    decision at this capacity, and the marginal ratio is the shadow
    price of one more unit of warehouse.  One ordered cumulative
    window over the part aggregate; the 20%-capacity answer ('x% of
    volume carries y% of value') is q214's Pareto statement with an
    optimization guarantee attached."""
    li = _t(spark, sf_dir, "lineitem")
    items = li.groupBy("l_partkey").agg(
        F.sum(
            F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
        ).alias("value"),
        F.sum("l_quantity").alias("weight"),
    )
    budget = items.agg((0.2 * F.sum("weight")).alias("b"))
    ratio = F.col("value") / F.col("weight")
    wc = Window.orderBy(
        (F.col("value") / F.col("weight")).desc(), "l_partkey"
    ).rowsBetween(Window.unboundedPreceding, 0)
    ranked = items.crossJoin(F.broadcast(budget)).select(
        "value",
        "weight",
        ratio.alias("ratio"),
        F.sum("weight").over(wc).alias("cumw"),
        "b",
    )
    frac = (
        F.when(F.col("cumw") <= F.col("b"), 1.0)
        .when(
            F.col("cumw") - F.col("weight") < F.col("b"),
            (F.col("b") - (F.col("cumw") - F.col("weight")))
            / F.col("weight"),
        )
        .otherwise(0.0)
    )
    taken = ranked.withColumn("frac", frac)
    return taken.agg(
        F.round(F.max("b"), 2).alias("capacity"),
        F.sum(F.when(F.col("frac") == 1.0, 1).otherwise(0))
        .cast("bigint")
        .alias("full_items"),
        F.round(
            F.sum(F.col("value") * F.col("frac")) / 1000, 1
        ).alias("packed_value_k"),
        F.round(
            F.sum(F.col("value") * F.col("frac")) / F.sum("value"), 6
        ).alias("value_share_of_total"),
        F.round(
            F.min(F.when(F.col("frac") > 0, F.col("ratio"))), 4
        ).alias("marginal_ratio"),
    )


@register(
    "q525_interval_score",
    """
    WITH daily AS (
      -- exact decimal money sum (q01/q411 sf10 class), surfaced as a
      -- double so every downstream lag/abs/compare is identical
      SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
               AS rev
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
      SELECT r AS q FROM (
        SELECT r, ROW_NUMBER() OVER (ORDER BY r) AS k,
               COUNT(*) OVER () AS m
        FROM train_resid
      ) WHERE k = LEAST(CAST(CEIL(0.9 * (m + 1)) AS BIGINT), m)
    ),
    test AS (
      SELECT s.rev AS y, s.yhat - q.q AS lo, s.yhat + q.q AS hi
      FROM seq s CROSS JOIN qhat q
      WHERE s.yhat IS NOT NULL AND s.rn > s.n / 2
    ),
    -- quantized-term exact sums: the scored terms are identical
    -- doubles on both engines, but a double AVG over them at 1e9
    -- magnitude still picks up engine-specific summation order —
    -- quantize each term to 1e-6 and sum exactly instead
    terms AS (
      SELECT CAST(hi - lo AS DECIMAL(24,6)) AS w_t,
             CAST(20 * GREATEST(lo - y, 0)
                  + 20 * GREATEST(y - hi, 0) AS DECIMAL(24,6)) AS p_t
      FROM test
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_test,
           ROUND(CAST(SUM(w_t) AS DOUBLE) / COUNT(*), 4) AS mean_width,
           ROUND(CAST(SUM(w_t + p_t) AS DOUBLE) / COUNT(*), 4)
             AS mean_interval_score,
           ROUND(CAST(SUM(p_t) AS DOUBLE)
                 / CAST(SUM(w_t + p_t) AS DOUBLE), 6)
             AS penalty_share
    FROM terms
    """,
)
def q525_interval_score(spark, sf_dir):
    """Winkler interval score for q485's conformal band (α=0.1):
    width + (2/α)·(undershoot + overshoot) — the PROPER score that
    coverage alone is not (any band can hit 90% coverage by being
    huge; the interval score charges for width AND misses, so
    narrower honest bands win).  The penalty share says whether the
    band's cost is girth or failures.  Same plan as q485 plus one
    scoring fold."""
    od = _t(spark, sf_dir, "orders")
    daily = od.groupBy(
        F.to_date(F.date_trunc("DAY", "o_orderdate")).alias("day")
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(12,2)"))
        .cast("double")
        .alias("rev")
    )
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
        .select(
            F.col("rev").alias("y"),
            (F.col("yhat") - F.col("q")).alias("lo"),
            (F.col("yhat") + F.col("q")).alias("hi"),
        )
    )
    # quantized-term exact sums (see oracle comment): the per-row
    # scores are identical doubles, but a plain double AVG at 1e9
    # magnitude re-introduces engine-specific summation order
    width = F.col("hi") - F.col("lo")
    pen = 20 * F.greatest(F.col("lo") - F.col("y"), F.lit(0.0)) + 20 * F.greatest(
        F.col("y") - F.col("hi"), F.lit(0.0)
    )
    w_t = width.cast("decimal(24,6)")
    p_t = pen.cast("decimal(24,6)")
    return test.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_test"),
        F.round(
            F.sum(w_t).cast("double") / F.count(F.lit(1)), 4
        ).alias("mean_width"),
        F.round(
            F.sum(w_t + p_t).cast("double") / F.count(F.lit(1)), 4
        ).alias("mean_interval_score"),
        F.round(
            F.sum(p_t).cast("double") / F.sum(w_t + p_t).cast("double"),
            6,
        ).alias("penalty_share"),
    )


@register(
    "q526_crps",
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
    train AS (
      SELECT rev AS x FROM seq WHERE rn <= n / 2
    ),
    gmd AS (
      SELECT SUM((2 * i - m - 1) * x) * 2.0 / (MAX(m) * MAX(m))
               AS egmd,
             MAX(m) AS nt, MAX(sx) AS sx
      FROM (
        SELECT x, ROW_NUMBER() OVER (ORDER BY x) AS i,
               COUNT(*) OVER () AS m, SUM(x) OVER () AS sx
        FROM train
      )
    ),
    stacked AS (
      SELECT rev AS v, CASE WHEN rn <= n / 2 THEN 1 ELSE 0 END AS tr
      FROM seq
    ),
    cum AS (
      SELECT v, tr,
             SUM(CASE WHEN tr = 1 THEN 1.0 ELSE 0 END)
               OVER (ORDER BY v, tr DESC) AS cb,
             SUM(CASE WHEN tr = 1 THEN v ELSE 0 END)
               OVER (ORDER BY v, tr DESC) AS sb
      FROM stacked
    ),
    test_terms AS (
      SELECT (c.v * c.cb - c.sb
            + (g.sx - c.sb) - c.v * (g.nt - c.cb)) / g.nt AS exy
      FROM cum c CROSS JOIN gmd g
      WHERE c.tr = 0
    )
    SELECT CAST((SELECT nt FROM gmd) AS BIGINT) AS n_train,
           CAST(COUNT(*) AS BIGINT) AS n_test,
           ROUND(AVG(exy), 4) AS mean_abs_error_vs_dist,
           ROUND((SELECT egmd FROM gmd), 4) AS train_gini_mean_diff,
           ROUND(AVG(exy) - 0.5 * (SELECT egmd FROM gmd), 4) AS crps
    FROM test_terms
    """,
)
def q526_crps(spark, sf_dir):
    """CRPS of the train-half EMPIRICAL distribution as a
    probabilistic forecast for each test-half day: CRPS = E|X−y| −
    ½E|X−X'|, with E|X−X'| from the sorted-rank Gini-mean-difference
    identity (q323's trick) and E|X−y| from ONE interleaved
    cumulative scan of train∪test (counts and sums of train values
    below each test value) — no train×test pair join anywhere, which
    is what makes proper scoring of a full DISTRIBUTION (not just a
    point, q463; not just an interval, q525) feasible at scale."""
    od = _t(spark, sf_dir, "orders")
    daily = od.groupBy(
        F.to_date(F.date_trunc("DAY", "o_orderdate")).alias("day")
    ).agg(F.sum("o_totalprice").alias("rev"))
    seq = daily.select(
        "rev",
        F.row_number().over(Window.orderBy("day")).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    train = seq.filter(F.col("rn") <= F.col("n") / 2).select(
        F.col("rev").alias("x")
    )
    tr_ranked = train.select(
        "x",
        F.row_number().over(Window.orderBy("x")).alias("i"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("m"),
        F.sum("x").over(Window.partitionBy()).alias("sx"),
    )
    gmd = tr_ranked.agg(
        (
            F.sum((2 * F.col("i") - F.col("m") - 1) * F.col("x"))
            * 2.0
            / (F.max("m") * F.max("m"))
        ).alias("egmd"),
        F.max("m").alias("nt"),
        F.max("sx").alias("sx"),
    )
    stacked = seq.select(
        F.col("rev").alias("v"),
        F.when(F.col("rn") <= F.col("n") / 2, 1).otherwise(0).alias("tr"),
    )
    wc = Window.orderBy("v", F.col("tr").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = stacked.select(
        "v",
        "tr",
        F.sum(F.when(F.col("tr") == 1, 1.0).otherwise(0.0))
        .over(wc)
        .alias("cb"),
        F.sum(F.when(F.col("tr") == 1, F.col("v")).otherwise(0.0))
        .over(wc)
        .alias("sb"),
    )
    test_terms = (
        cum.filter(F.col("tr") == 0)
        .crossJoin(F.broadcast(gmd))
        .select(
            (
                (
                    F.col("v") * F.col("cb")
                    - F.col("sb")
                    + (F.col("sx") - F.col("sb"))
                    - F.col("v") * (F.col("nt") - F.col("cb"))
                )
                / F.col("nt")
            ).alias("exy"),
            "nt",
            "egmd",
        )
    )
    return test_terms.agg(
        F.max("nt").cast("bigint").alias("n_train"),
        F.count(F.lit(1)).cast("bigint").alias("n_test"),
        F.round(F.avg("exy"), 4).alias("mean_abs_error_vs_dist"),
        F.round(F.max("egmd"), 4).alias("train_gini_mean_diff"),
        F.round(F.avg("exy") - 0.5 * F.max("egmd"), 4).alias("crps"),
    )


@register(
    "q527_p_chart",
    """
    WITH daily AS (
      SELECT CAST(date_trunc('day', l_shipdate) AS DATE) AS day,
             COUNT(*)::DOUBLE AS n,
             SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
               ::DOUBLE AS x
      FROM lineitem GROUP BY 1
    ),
    pbar AS (SELECT SUM(x) / SUM(n) AS p FROM daily),
    scored AS (
      SELECT d.day, d.n, d.x / d.n AS rate, pb.p,
             3 * SQRT(pb.p * (1 - pb.p) / d.n) AS halfwidth
      FROM daily d CROSS JOIN pbar pb
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
           ROUND(MAX(p), 6) AS pbar,
           CAST(SUM(CASE WHEN ABS(rate - p) > halfwidth
                         THEN 1 ELSE 0 END) AS BIGINT) AS violations,
           ROUND(MAX(ABS(rate - p)
                     / (halfwidth / 3)), 4) AS max_sigma_dev
    FROM scored
    """,
)
def q527_p_chart(spark, sf_dir):
    """Attribute p-chart on the daily return RATE with per-day
    varying control limits p̄ ± 3√(p̄(1−p̄)/nₜ) — the binomial chart
    for proportions where q439/q499 chart continuous levels: a
    low-volume day is ALLOWED to wobble more, so fixed limits would
    false-alarm on quiet days and miss shifts on busy ones.  One
    daily aggregate, one broadcast p̄, one fold."""
    li = _t(spark, sf_dir, "lineitem")
    daily = li.groupBy(
        F.to_date(F.date_trunc("DAY", "l_shipdate")).alias("day")
    ).agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
        .cast("double")
        .alias("x"),
    )
    pbar = daily.agg((F.sum("x") / F.sum("n")).alias("p"))
    scored = daily.crossJoin(F.broadcast(pbar)).select(
        (F.col("x") / F.col("n")).alias("rate"),
        "p",
        (
            3 * F.sqrt(F.col("p") * (1 - F.col("p")) / F.col("n"))
        ).alias("halfwidth"),
    )
    return scored.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.round(F.max("p"), 6).alias("pbar"),
        F.sum(
            F.when(
                F.abs(F.col("rate") - F.col("p")) > F.col("halfwidth"),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("violations"),
        F.round(
            F.max(
                F.abs(F.col("rate") - F.col("p"))
                / (F.col("halfwidth") / 3)
            ),
            4,
        ).alias("max_sigma_dev"),
    )


@register(
    "q528_kish_neff",
    """
    WITH w AS (
      SELECT SUM(o_totalprice) AS wt
      FROM orders GROUP BY o_custkey
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
           ROUND(POWER(SUM(wt), 2) / SUM(wt * wt), 2)
             AS kish_neff,
           ROUND(POWER(SUM(wt), 2) / SUM(wt * wt) / COUNT(*), 6)
             AS weighting_efficiency,
           ROUND(1 + (SUM(wt * wt) * COUNT(*) / POWER(SUM(wt), 2) - 1),
                 4) AS design_effect
    FROM w
    """,
)
def q528_kish_neff(spark, sf_dir):
    """Kish effective sample size for spend-weighted customer
    estimates: neff = (Σw)²/Σw² — when analyses weight customers by
    revenue (as every 'revenue-weighted NPS/metric' does), the
    variance behaves as if only neff customers were sampled, and the
    design effect 1+cv²(w) is the SE inflation to apply.  The number
    that belongs next to q118's weighted sampling and q204's
    bootstrap whenever weights are skewed (a Pareto book can turn
    10⁶ customers into a few thousand effective ones).  One fold."""
    od = _t(spark, sf_dir, "orders")
    w = od.groupBy("o_custkey").agg(F.sum("o_totalprice").alias("wt"))
    sw = F.sum("wt")
    sww = F.sum(F.col("wt") * F.col("wt"))
    cnt = F.count(F.lit(1))
    return w.agg(
        cnt.cast("bigint").alias("n_customers"),
        F.round(F.pow(sw, 2) / sww, 2).alias("kish_neff"),
        F.round(F.pow(sw, 2) / sww / cnt, 6).alias(
            "weighting_efficiency"
        ),
        F.round(
            1 + (sww * cnt / F.pow(sw, 2) - 1), 4
        ).alias("design_effect"),
    )


@register(
    "q529_event_study",
    """
    WITH bd AS (
      SELECT p.p_brand AS brand,
             CAST(date_trunc('day', l.l_shipdate) AS DATE) AS day,
             SUM(l.l_extendedprice * (1 - l.l_discount)) AS r,
             AVG(CASE WHEN l.l_discount >= 0.05 THEN 1.0 ELSE 0 END)
               AS disc_share
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY 1, 2
    ),
    base AS (
      SELECT brand, AVG(r) AS mu FROM bd GROUP BY brand
    ),
    promo AS (
      SELECT brand, day FROM bd WHERE disc_share >= 0.7
    ),
    win AS (
      SELECT pr.brand, k.k,
             t.r / b.mu AS rel
      FROM promo pr
      CROSS JOIN (VALUES (-3),(-2),(-1),(0),(1),(2),(3),(4),(5),(6),(7))
        AS k(k)
      JOIN bd t ON t.brand = pr.brand AND t.day = pr.day + k.k
      JOIN base b ON b.brand = pr.brand
    )
    SELECT CAST(k AS BIGINT) AS offset_days,
           CAST(COUNT(*) AS BIGINT) AS n_obs,
           ROUND(AVG(rel), 4) AS mean_rel_revenue
    FROM win GROUP BY k
    """,
)
def q529_event_study(spark, sf_dir):
    """Event study around heavy-promo days (≥70% of a brand's units
    discounted that day): brand-relative revenue averaged at offsets
    −3..+7 across ALL such events — the pre-window is the
    anticipation check (pantry-loading shows up as a pre-dip), the
    post-window traces how fast the lift decays, the full curve is
    what q342's single uplift number integrates away.  The offset
    expansion is an 11-row broadcast joined back to the brand-day
    panel on (brand, day+k) — an equi-join, not a range scan."""
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
            ).alias("r"),
            F.avg(
                F.when(F.col("l_discount") >= 0.05, 1.0).otherwise(0.0)
            ).alias("disc_share"),
        )
    )
    base = bd.groupBy("brand").agg(F.avg("r").alias("mu"))
    promo = bd.filter(F.col("disc_share") >= 0.7).select(
        F.col("brand").alias("pb"), F.col("day").alias("pday")
    )
    ks = li.sparkSession.createDataFrame(
        [(k,) for k in range(-3, 8)], "k int"
    )
    win = (
        promo.crossJoin(F.broadcast(ks))
        .join(
            bd,
            (bd.brand == F.col("pb"))
            & (bd.day == F.date_add(F.col("pday"), F.col("k"))),
        )
        .join(F.broadcast(base), "brand")
        .select("k", (F.col("r") / F.col("mu")).alias("rel"))
    )
    return win.groupBy(F.col("k").cast("bigint").alias("offset_days")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_obs"),
        F.round(F.avg("rel"), 4).alias("mean_rel_revenue"),
    )


@register(
    "q530_min_variance_portfolio",
    """
    WITH top2 AS (
      SELECT p.p_brand AS brand,
             ROW_NUMBER() OVER (
               ORDER BY SUM(l.l_extendedprice * (1 - l.l_discount))
                        DESC, p.p_brand) AS rk
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY p.p_brand QUALIFY rk <= 2
    ),
    bd AS (
      SELECT t.rk, CAST(date_trunc('day', l.l_shipdate) AS DATE)
               AS day,
             SUM(l.l_extendedprice * (1 - l.l_discount)) AS r
      FROM lineitem l
      JOIN part p ON l.l_partkey = p.p_partkey
      JOIN top2 t ON p.p_brand = t.brand
      GROUP BY 1, 2
    ),
    wide AS (
      SELECT a.r AS r1, b.r AS r2
      FROM bd a JOIN bd b ON a.day = b.day AND a.rk = 1 AND b.rk = 2
    ),
    s AS (
      SELECT COUNT(*)::DOUBLE AS n,
             VAR_SAMP(r1) AS v1, VAR_SAMP(r2) AS v2,
             (SUM(r1 * r2) - COUNT(*) * AVG(r1) * AVG(r2))
             / (COUNT(*) - 1) AS c12
      FROM wide
    ),
    w AS (
      SELECT n, v1, v2, c12,
             LEAST(GREATEST((v2 - c12)
                            / (v1 + v2 - 2 * c12), 0), 1) AS w1
      FROM s
    )
    SELECT CAST(n AS BIGINT) AS n_common_days,
           ROUND(w1, 6) AS weight_brand1,
           ROUND(SQRT(v1), 2) AS sd_brand1,
           ROUND(SQRT(v2), 2) AS sd_brand2,
           ROUND(SQRT(w1 * w1 * v1 + (1 - w1) * (1 - w1) * v2
                      + 2 * w1 * (1 - w1) * c12), 2) AS sd_portfolio,
           ROUND(1 - SQRT(w1 * w1 * v1 + (1 - w1) * (1 - w1) * v2
                          + 2 * w1 * (1 - w1) * c12)
                 / LEAST(SQRT(v1), SQRT(v2)), 6)
             AS risk_reduction_vs_best
    FROM w
    """,
)
def q530_min_variance_portfolio(spark, sf_dir):
    """Markowitz minimum-variance mix of the two top brands' daily
    revenue streams: w* = (σ₂²−σ₁₂)/(σ₁²+σ₂²−2σ₁₂) in closed form,
    clamped to [0,1], with the portfolio volatility against the
    safer single brand — the diversification arithmetic behind 'how
    much does carrying both smooth my revenue', driven entirely by
    the covariance q434's betas decompose.  One joined daily panel,
    one sufficient-statistics fold, scalar algebra."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    joined = li.join(p, li.l_partkey == p.p_partkey)
    rev = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    top2 = (
        joined.groupBy(F.col("p_brand").alias("brand"))
        .agg(F.sum(rev).alias("r"))
        .select(
            "brand",
            F.row_number()
            .over(Window.orderBy(F.col("r").desc(), "brand"))
            .alias("rk"),
        )
        .filter(F.col("rk") <= 2)
    )
    bd = (
        joined.join(F.broadcast(top2), joined.p_brand == top2.brand)
        .groupBy(
            "rk",
            F.to_date(F.date_trunc("DAY", "l_shipdate")).alias("day"),
        )
        .agg(F.sum(rev).alias("r"))
    )
    a = bd.filter(F.col("rk") == 1).select(
        F.col("day").alias("d1"), F.col("r").alias("r1")
    )
    b = bd.filter(F.col("rk") == 2).select(
        F.col("day").alias("d2"), F.col("r").alias("r2")
    )
    wide = a.join(b, a.d1 == b.d2)
    cnt = F.count(F.lit(1))
    s = wide.agg(
        cnt.cast("double").alias("n"),
        F.var_samp("r1").alias("v1"),
        F.var_samp("r2").alias("v2"),
        (
            (
                F.sum(F.col("r1") * F.col("r2"))
                - cnt * F.avg("r1") * F.avg("r2")
            )
            / (cnt - 1)
        ).alias("c12"),
    )
    v1, v2, c12 = F.col("v1"), F.col("v2"), F.col("c12")
    w1 = F.least(
        F.greatest((v2 - c12) / (v1 + v2 - 2 * c12), F.lit(0.0)),
        F.lit(1.0),
    )
    w = s.withColumn("w1", w1)
    pv = (
        F.col("w1") * F.col("w1") * v1
        + (1 - F.col("w1")) * (1 - F.col("w1")) * v2
        + 2 * F.col("w1") * (1 - F.col("w1")) * c12
    )
    return w.select(
        F.col("n").cast("bigint").alias("n_common_days"),
        F.round("w1", 6).alias("weight_brand1"),
        F.round(F.sqrt(v1), 2).alias("sd_brand1"),
        F.round(F.sqrt(v2), 2).alias("sd_brand2"),
        F.round(F.sqrt(pv), 2).alias("sd_portfolio"),
        F.round(
            1 - F.sqrt(pv) / F.least(F.sqrt(v1), F.sqrt(v2)), 6
        ).alias("risk_reduction_vs_best"),
    )


@register(
    "q531_hurdle_decomposition",
    """
    WITH tot AS (
      SELECT COUNT(*)::DOUBLE AS nc FROM customer
    ),
    yearly AS (
      SELECT CAST(date_part('year', o_orderdate) AS BIGINT) AS yr,
             SUM(o_totalprice) AS rev,
             COUNT(DISTINCT o_custkey)::DOUBLE AS active
      FROM orders GROUP BY 1
    ),
    parts AS (
      SELECT y.yr, y.rev, y.active / t.nc AS participation,
             y.rev / y.active AS intensity
      FROM yearly y CROSS JOIN tot t
    )
    SELECT yr AS year,
           ROUND(rev / 1000, 1) AS revenue_k,
           ROUND(participation, 6) AS participation,
           ROUND(intensity, 2) AS intensity,
           ROUND(LN(rev) - LN(LAG(rev) OVER (ORDER BY yr)), 6)
             AS dln_revenue,
           ROUND(LN(participation)
                 - LN(LAG(participation) OVER (ORDER BY yr)), 6)
             AS dln_participation,
           ROUND(LN(intensity)
                 - LN(LAG(intensity) OVER (ORDER BY yr)), 6)
             AS dln_intensity
    FROM parts
    """,
)
def q531_hurdle_decomposition(spark, sf_dir):
    """Two-part (hurdle) growth decomposition by year: revenue =
    base × participation × intensity, so Δln(revenue) splits EXACTLY
    into Δln(active share) + Δln(spend per active) — the first
    question about any growth or decline ('fewer buyers, or smaller
    baskets?') answered additively, which raw YoY percentages
    (q177) cannot do.  One yearly rollup, one customer-base scalar,
    two lag windows."""
    od = _t(spark, sf_dir, "orders")
    cu = _t(spark, sf_dir, "customer")
    tot = cu.agg(F.count(F.lit(1)).cast("double").alias("nc"))
    yearly = od.groupBy(
        F.year("o_orderdate").cast("bigint").alias("yr")
    ).agg(
        F.sum("o_totalprice").alias("rev"),
        F.countDistinct("o_custkey").cast("double").alias("active"),
    )
    parts = yearly.crossJoin(F.broadcast(tot)).select(
        "yr",
        "rev",
        (F.col("active") / F.col("nc")).alias("participation"),
        (F.col("rev") / F.col("active")).alias("intensity"),
    )
    w = Window.orderBy("yr")
    return parts.select(
        F.col("yr").alias("year"),
        F.round(F.col("rev") / 1000, 1).alias("revenue_k"),
        F.round("participation", 6).alias("participation"),
        F.round("intensity", 2).alias("intensity"),
        F.round(
            F.log("rev") - F.log(F.lag("rev").over(w)), 6
        ).alias("dln_revenue"),
        F.round(
            F.log("participation")
            - F.log(F.lag("participation").over(w)),
            6,
        ).alias("dln_participation"),
        F.round(
            F.log("intensity") - F.log(F.lag("intensity").over(w)), 6
        ).alias("dln_intensity"),
    )


@register(
    "q532_polarization_index",
    """
    WITH cust AS (
      SELECT SUM(o_totalprice) AS x
      FROM orders GROUP BY o_custkey
    ),
    deciles AS (
      SELECT NTILE(10) OVER (ORDER BY x) AS d, x
      FROM cust
    ),
    g AS (
      SELECT d, COUNT(*)::DOUBLE AS n, AVG(x) AS mu
      FROM deciles GROUP BY d
    ),
    tot AS (SELECT SUM(n) AS nt, AVG(mu) AS gmu FROM g),
    pairs AS (
      SELECT SUM(POWER(a.n / t.nt, 2) * (b.n / t.nt)
                 * ABS(a.mu - b.mu)) AS er,
             SUM((a.n / t.nt) * (b.n / t.nt)
                 * ABS(a.mu - b.mu)) AS meangap
      FROM g a CROSS JOIN g b CROSS JOIN tot t
    )
    SELECT ROUND(p.er / t.gmu, 6) AS polarization_er_alpha1,
           ROUND(p.meangap / (2 * t.gmu), 6) AS gini_between_groups,
           ROUND(p.er / p.meangap, 6) AS polarization_vs_inequality
    FROM pairs p CROSS JOIN tot t
    """,
)
def q532_polarization_index(spark, sf_dir):
    """Esteban-Ray polarization (α=1) of customer spend over decile
    groups: Σᵢⱼ πᵢ^(1+α) πⱼ |μᵢ−μⱼ|, normalized by the mean —
    polarization measures CLUSTERING AROUND POLES, not spread, so a
    book splitting into 'whales and minnows' polarizes while its
    Gini (q230) can stay flat; the ratio to the between-group Gini
    isolates exactly that identification effect.  Decile means from
    one rank window, the double sum on a 100-pair aggregate."""
    od = _t(spark, sf_dir, "orders")
    cust = od.groupBy("o_custkey").agg(
        F.sum("o_totalprice").alias("x")
    )
    # spend sums are continuous — ties are measure-zero, so the bare
    # value order is deterministic across engines
    deciles = cust.select(
        "x", F.ntile(10).over(Window.orderBy("x")).alias("d")
    )
    g = deciles.groupBy("d").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.avg("x").alias("mu"),
    )
    tot = g.agg(F.sum("n").alias("nt"), F.avg("mu").alias("gmu"))
    a = g.select(
        F.col("n").alias("na"), F.col("mu").alias("mua")
    )
    b = g.select(
        F.col("n").alias("nb"), F.col("mu").alias("mub")
    )
    pairs = (
        a.crossJoin(b)
        .crossJoin(F.broadcast(tot))
        .agg(
            F.sum(
                F.pow(F.col("na") / F.col("nt"), 2)
                * (F.col("nb") / F.col("nt"))
                * F.abs(F.col("mua") - F.col("mub"))
            ).alias("er"),
            F.sum(
                (F.col("na") / F.col("nt"))
                * (F.col("nb") / F.col("nt"))
                * F.abs(F.col("mua") - F.col("mub"))
            ).alias("meangap"),
        )
    )
    return pairs.crossJoin(F.broadcast(tot)).select(
        F.round(F.col("er") / F.col("gmu"), 6).alias(
            "polarization_er_alpha1"
        ),
        F.round(F.col("meangap") / (2 * F.col("gmu")), 6).alias(
            "gini_between_groups"
        ),
        F.round(F.col("er") / F.col("meangap"), 6).alias(
            "polarization_vs_inequality"
        ),
    )


@register(
    "q533_price_leadership",
    """
    WITH top5 AS (
      SELECT p.p_brand AS brand,
             ROW_NUMBER() OVER (
               ORDER BY SUM(l.l_extendedprice * (1 - l.l_discount))
                        DESC, p.p_brand) AS rk
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY p.p_brand QUALIFY rk <= 5
    ),
    pm AS (
      SELECT t.brand,
             CAST(date_trunc('month', l.l_shipdate) AS DATE) AS mth,
             AVG(l.l_extendedprice / l.l_quantity) AS up
      FROM lineitem l
      JOIN part p ON l.l_partkey = p.p_partkey
      JOIN top5 t ON p.p_brand = t.brand
      GROUP BY 1, 2
    ),
    chg AS (
      SELECT brand, mth,
             CASE WHEN up > LAG(up) OVER (PARTITION BY brand
                                          ORDER BY mth) THEN 1
                  WHEN up < LAG(up) OVER (PARTITION BY brand
                                          ORDER BY mth) THEN -1
                  ELSE 0 END AS sgn
      FROM pm
      QUALIFY LAG(up) OVER (PARTITION BY brand ORDER BY mth)
              IS NOT NULL
    ),
    follow AS (
      SELECT a.brand AS ba, b.brand AS bb,
             COUNT(*)::DOUBLE AS n,
             AVG(CASE WHEN bn.sgn = a.sgn THEN 1.0 ELSE 0 END)
               AS f_ab,
             AVG(CASE WHEN an.sgn = b.sgn THEN 1.0 ELSE 0 END)
               AS f_ba
      FROM chg a
      JOIN chg b ON a.mth = b.mth AND a.brand < b.brand
      JOIN chg bn ON bn.brand = b.brand
                 AND bn.mth = a.mth + INTERVAL 1 MONTH
      JOIN chg an ON an.brand = a.brand
                 AND an.mth = a.mth + INTERVAL 1 MONTH
      WHERE a.sgn <> 0 AND b.sgn <> 0
      GROUP BY a.brand, b.brand
    )
    SELECT ba AS brand_a, bb AS brand_b,
           CAST(n AS BIGINT) AS n_months,
           ROUND(f_ab, 4) AS b_follows_a,
           ROUND(f_ba, 4) AS a_follows_b,
           ROUND(f_ab - f_ba, 4) AS leadership_a_minus_b
    FROM follow
    """,
)
def q533_price_leadership(spark, sf_dir):
    """Price-leadership detection among the top-5 brands: for each
    pair, how often does B's next-month price move MATCH A's current
    move vs the reverse — an asymmetric follow rate means one brand
    sets and the other matches (tacit leadership), which
    contemporaneous correlation (q389) is blind to because it has no
    direction.  Sign changes come from one brand-partitioned lag;
    the follow table is two offset self-joins on (brand, month+1)."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    joined = li.join(p, li.l_partkey == p.p_partkey)
    rev = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    top5 = (
        joined.groupBy(F.col("p_brand").alias("brand"))
        .agg(F.sum(rev).alias("r"))
        .select(
            "brand",
            F.row_number()
            .over(Window.orderBy(F.col("r").desc(), "brand"))
            .alias("rk"),
        )
        .filter(F.col("rk") <= 5)
        .select("brand")
    )
    pm = (
        joined.join(F.broadcast(top5), joined.p_brand == top5.brand)
        .groupBy(
            "brand",
            F.to_date(F.date_trunc("MONTH", "l_shipdate")).alias("mth"),
        )
        .agg(
            F.avg(F.col("l_extendedprice") / F.col("l_quantity")).alias(
                "up"
            )
        )
    )
    w = Window.partitionBy("brand").orderBy("mth")
    chg = pm.select(
        "brand",
        "mth",
        F.when(F.col("up") > F.lag("up").over(w), 1)
        .when(F.col("up") < F.lag("up").over(w), -1)
        .otherwise(0)
        .alias("sgn"),
        F.lag("up").over(w).alias("prev"),
    ).filter(F.col("prev").isNotNull()).drop("prev")
    a = chg.select(
        F.col("brand").alias("ba"), F.col("mth").alias("ma"),
        F.col("sgn").alias("sa"),
    )
    b = chg.select(
        F.col("brand").alias("bb"), F.col("mth").alias("mb"),
        F.col("sgn").alias("sb"),
    )
    bn = chg.select(
        F.col("brand").alias("bnb"), F.col("mth").alias("mnb"),
        F.col("sgn").alias("snb"),
    )
    an = chg.select(
        F.col("brand").alias("anb"), F.col("mth").alias("mna"),
        F.col("sgn").alias("sna"),
    )
    follow = (
        a.join(b, (a.ma == b.mb) & (a.ba < b.bb))
        .filter((F.col("sa") != 0) & (F.col("sb") != 0))
        .join(
            bn,
            (F.col("bnb") == F.col("bb"))
            & (F.col("mnb") == F.add_months(F.col("ma"), 1)),
        )
        .join(
            an,
            (F.col("anb") == F.col("ba"))
            & (F.col("mna") == F.add_months(F.col("ma"), 1)),
        )
        .groupBy("ba", "bb")
        .agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            F.avg(
                F.when(F.col("snb") == F.col("sa"), 1.0).otherwise(0.0)
            ).alias("f_ab"),
            F.avg(
                F.when(F.col("sna") == F.col("sb"), 1.0).otherwise(0.0)
            ).alias("f_ba"),
        )
    )
    return follow.select(
        F.col("ba").alias("brand_a"),
        F.col("bb").alias("brand_b"),
        F.col("n").cast("bigint").alias("n_months"),
        F.round("f_ab", 4).alias("b_follows_a"),
        F.round("f_ba", 4).alias("a_follows_b"),
        F.round(F.col("f_ab") - F.col("f_ba"), 4).alias(
            "leadership_a_minus_b"
        ),
    )


@register(
    "q534_ipf_raking",
    """
    WITH pop AS (
      SELECT c_custkey, c_nationkey AS nat, c_mktsegment AS seg
      FROM customer
    ),
    maxd AS (SELECT MAX(o_orderdate) AS mx FROM orders),
    samp AS (
      SELECT DISTINCT p.c_custkey, p.nat, p.seg
      FROM pop p
      JOIN orders o ON o.o_custkey = p.c_custkey
      CROSS JOIN maxd m
      WHERE o.o_orderdate >= m.mx - INTERVAL 365 DAY
    ),
    pn AS (
      SELECT nat, COUNT(*)::DOUBLE
             / (SELECT COUNT(*) FROM pop) AS share
      FROM pop GROUP BY nat
    ),
    sn AS (
      SELECT nat, COUNT(*)::DOUBLE
             / (SELECT COUNT(*) FROM samp) AS share
      FROM samp GROUP BY nat
    ),
    row_w AS (
      SELECT pn.nat, pn.share / sn.share AS rf
      FROM pn JOIN sn ON pn.nat = sn.nat
    ),
    after_row AS (
      SELECT s.seg, SUM(r.rf) AS wsum
      FROM samp s JOIN row_w r ON s.nat = r.nat
      GROUP BY s.seg
    ),
    ps AS (
      SELECT seg, COUNT(*)::DOUBLE
             / (SELECT COUNT(*) FROM pop) AS share
      FROM pop GROUP BY seg
    ),
    col_w AS (
      SELECT ps.seg,
             ps.share / (ar.wsum / (SELECT SUM(wsum) FROM after_row))
               AS cf
      FROM ps JOIN after_row ar ON ps.seg = ar.seg
    ),
    final AS (
      SELECT s.nat, s.seg, r.rf * c.cf AS w
      FROM samp s
      JOIN row_w r ON s.nat = r.nat
      JOIN col_w c ON s.seg = c.seg
    ),
    nat_err AS (
      SELECT MAX(ABS(f.ws / t.tw - pn.share)) AS e
      FROM (SELECT nat, SUM(w) AS ws FROM final GROUP BY nat) f
      CROSS JOIN (SELECT SUM(w) AS tw FROM final) t
      JOIN pn ON f.nat = pn.nat
    ),
    seg_err AS (
      SELECT MAX(ABS(f.ws / t.tw - ps.share)) AS e
      FROM (SELECT seg, SUM(w) AS ws FROM final GROUP BY seg) f
      CROSS JOIN (SELECT SUM(w) AS tw FROM final) t
      JOIN ps ON f.seg = ps.seg
    )
    SELECT CAST((SELECT COUNT(*) FROM pop) AS BIGINT) AS n_population,
           CAST((SELECT COUNT(*) FROM samp) AS BIGINT) AS n_sample,
           ROUND((SELECT e FROM nat_err), 6)
             AS nation_margin_error,
           ROUND((SELECT e FROM seg_err), 6)
             AS segment_margin_error
    FROM (SELECT 1)
    """,
)
def q534_ipf_raking(spark, sf_dir):
    """One iteration of IPF raking: weight the biased sample (active
    buyers of the final year) so its NATION margins match the full
    customer population, then its SEGMENT margins — after which the
    segment margin is exact by construction and the REMAINING nation
    error measures how far from convergence one sweep leaves you
    (small error ⇒ the two margins are nearly independent and one
    sweep suffices).  Raking is the survey-weighting workhorse every
    'representative metrics from a biased sample' request needs;
    each factor is a grouped share join, no iteration in-engine
    beyond the one documented sweep."""
    cu = _t(spark, sf_dir, "customer")
    od = _t(spark, sf_dir, "orders")
    pop = cu.select(
        "c_custkey",
        F.col("c_nationkey").alias("nat"),
        F.col("c_mktsegment").alias("seg"),
    )
    maxd = od.agg(F.max("o_orderdate").alias("mx"))
    samp = (
        pop.join(od, pop.c_custkey == od.o_custkey)
        .crossJoin(F.broadcast(maxd))
        .filter(
            F.col("o_orderdate")
            >= F.col("mx") - F.expr("INTERVAL 365 DAY")
        )
        .select("c_custkey", "nat", "seg")
        .distinct()
    )
    npop = pop.agg(F.count(F.lit(1)).cast("double").alias("np"))
    nsamp = samp.agg(F.count(F.lit(1)).cast("double").alias("ns"))
    pn = (
        pop.groupBy("nat")
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
        .crossJoin(F.broadcast(npop))
        .select("nat", (F.col("c") / F.col("np")).alias("pshare"))
    )
    sn = (
        samp.groupBy("nat")
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
        .crossJoin(F.broadcast(nsamp))
        .select(
            F.col("nat").alias("snat"),
            (F.col("c") / F.col("ns")).alias("sshare"),
        )
    )
    row_w = pn.join(sn, pn.nat == sn.snat).select(
        "nat", (F.col("pshare") / F.col("sshare")).alias("rf")
    )
    after_row = (
        samp.join(F.broadcast(row_w), "nat")
        .groupBy("seg")
        .agg(F.sum("rf").alias("wsum"))
    )
    artot = after_row.agg(F.sum("wsum").alias("tw0"))
    ps = (
        pop.groupBy("seg")
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
        .crossJoin(F.broadcast(npop))
        .select(
            F.col("seg").alias("pseg"),
            (F.col("c") / F.col("np")).alias("pgshare"),
        )
    )
    col_w = (
        ps.join(after_row, ps.pseg == after_row.seg)
        .crossJoin(F.broadcast(artot))
        .select(
            "seg",
            (
                F.col("pgshare") / (F.col("wsum") / F.col("tw0"))
            ).alias("cf"),
        )
    )
    final = (
        samp.join(F.broadcast(row_w), "nat")
        .join(F.broadcast(col_w), "seg")
        .select("nat", "seg", (F.col("rf") * F.col("cf")).alias("w"))
    )
    tw = final.agg(F.sum("w").alias("tw"))
    nat_err = (
        final.groupBy("nat")
        .agg(F.sum("w").alias("ws"))
        .crossJoin(F.broadcast(tw))
        .join(F.broadcast(pn), "nat")
        .agg(
            F.max(
                F.abs(F.col("ws") / F.col("tw") - F.col("pshare"))
            ).alias("ne")
        )
    )
    seg_err = (
        final.groupBy("seg")
        .agg(F.sum("w").alias("ws"))
        .crossJoin(F.broadcast(tw))
        .join(F.broadcast(ps), F.col("seg") == F.col("pseg"))
        .agg(
            F.max(
                F.abs(F.col("ws") / F.col("tw") - F.col("pgshare"))
            ).alias("se")
        )
    )
    return (
        npop.crossJoin(F.broadcast(nsamp))
        .crossJoin(F.broadcast(nat_err))
        .crossJoin(F.broadcast(seg_err))
        .select(
            F.col("np").cast("bigint").alias("n_population"),
            F.col("ns").cast("bigint").alias("n_sample"),
            F.round("ne", 6).alias("nation_margin_error"),
            F.round("se", 6).alias("segment_margin_error"),
        )
    )


@register(
    "q535_optimal_threshold",
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
      SELECT u.engagement AS t,
             SUM(CASE WHEN u.spend > med.ms THEN 1 ELSE 0 END)::DOUBLE
               AS pos,
             COUNT(*)::DOUBLE AS cnt
      FROM u CROSS JOIN med GROUP BY u.engagement
    ),
    cum AS (
      SELECT t,
             SUM(pos) OVER (ORDER BY t DESC) AS tp,
             SUM(cnt - pos) OVER (ORDER BY t DESC) AS fp,
             SUM(pos) OVER () AS p,
             SUM(cnt - pos) OVER () AS neg
      FROM vals
    ),
    scored AS (
      SELECT t, tp / p AS tpr, fp / neg AS fpr,
             2 * tp / (2 * tp + fp + (p - tp)) AS f1
      FROM cum
    )
    SELECT 'youden_j' AS criterion,
           ROUND(t, 1) AS threshold,
           ROUND(tpr, 6) AS tpr, ROUND(fpr, 6) AS fpr,
           ROUND(f1, 6) AS f1
    FROM scored
    ORDER BY tpr - fpr DESC, t LIMIT 1
    """,
)
def q535_optimal_threshold(spark, sf_dir):
    """Operating-point selection for the engagement→high-spend
    classifier: sweep every distinct score as a threshold via ONE
    descending cumulative window (TP and FP at all cutoffs
    simultaneously) and return the Youden-J-optimal point — the step
    q241's AUC deliberately skips (AUC ranks; deployment needs a
    CUTOFF), with F1 reported at the same point for the
    class-imbalance view."""
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
        .groupBy(F.col("engagement").alias("t"))
        .agg(
            F.sum(F.when(F.col("spend") > F.col("ms"), 1).otherwise(0))
            .cast("double")
            .alias("pos"),
            F.count(F.lit(1)).cast("double").alias("cnt"),
        )
    )
    wc = Window.orderBy(F.col("t").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    wall = Window.partitionBy()
    cum = vals.select(
        "t",
        F.sum("pos").over(wc).alias("tp"),
        F.sum(F.col("cnt") - F.col("pos")).over(wc).alias("fp"),
        F.sum("pos").over(wall).alias("p"),
        F.sum(F.col("cnt") - F.col("pos")).over(wall).alias("neg"),
    )
    scored = cum.select(
        "t",
        (F.col("tp") / F.col("p")).alias("tpr"),
        (F.col("fp") / F.col("neg")).alias("fpr"),
        (
            2
            * F.col("tp")
            / (2 * F.col("tp") + F.col("fp") + (F.col("p") - F.col("tp")))
        ).alias("f1"),
    )
    return (
        scored.select(
            F.lit("youden_j").alias("criterion"),
            F.round("t", 1).alias("threshold"),
            F.round("tpr", 6).alias("tpr"),
            F.round("fpr", 6).alias("fpr"),
            F.round("f1", 6).alias("f1"),
            (F.col("tpr") - F.col("fpr")).alias("_j"),
        )
        .orderBy(F.col("_j").desc(), "threshold")
        .limit(1)
        .drop("_j")
    )


@register(
    "q536_circular_stats",
    """
    WITH ang AS (
      SELECT 2 * 3.141592653589793
             * date_part('doy', o_orderdate) / 365.25 AS th
      FROM orders
    ),
    s AS (
      SELECT COUNT(*)::DOUBLE AS n,
             AVG(COS(th)) AS mc, AVG(SIN(th)) AS ms
      FROM ang
    )
    SELECT CAST(n AS BIGINT) AS n_orders,
           ROUND(SQRT(mc * mc + ms * ms), 6) AS resultant_r,
           ROUND(MOD(DEGREES(ATAN2(ms, mc)) + 360, 360)
                 / 360 * 365.25, 2) AS mean_peak_doy,
           ROUND(1 - SQRT(mc * mc + ms * ms), 6) AS circular_variance,
           ROUND(n * (mc * mc + ms * ms), 2) AS rayleigh_z
    FROM s
    """,
)
def q536_circular_stats(spark, sf_dir):
    """Circular statistics of order timing within the year: map each
    order's day-of-year to an angle and take the mean resultant
    vector — its direction is the TRUE seasonal peak and its length R̄
    the concentration, with the Rayleigh z = nR̄² testing 'is there a
    peak at all'.  Linear statistics fail on this wraparound scale
    (the mean of Dec-28 and Jan-3 is NOT July); the circular mean is
    the correct way, and it costs two trig folds."""
    od = _t(spark, sf_dir, "orders")
    two_pi = 2 * 3.141592653589793
    th = F.lit(two_pi) * F.dayofyear("o_orderdate") / F.lit(365.25)
    s = od.select(th.alias("th")).agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.avg(F.cos("th")).alias("mc"),
        F.avg(F.sin("th")).alias("ms"),
    )
    r2 = F.col("mc") * F.col("mc") + F.col("ms") * F.col("ms")
    return s.select(
        F.col("n").cast("bigint").alias("n_orders"),
        F.round(F.sqrt(r2), 6).alias("resultant_r"),
        F.round(
            (
                (F.degrees(F.atan2(F.col("ms"), F.col("mc"))) + 360)
                % 360
            )
            / 360
            * 365.25,
            2,
        ).alias("mean_peak_doy"),
        F.round(F.lit(1) - F.sqrt(r2), 6).alias("circular_variance"),
        F.round(F.col("n") * r2, 2).alias("rayleigh_z"),
    )


@register(
    "q537_congestion_curve",
    """
    WITH lead AS (
      SELECT o.o_orderkey,
             CAST(date_trunc('day', o.o_orderdate) AS DATE) AS day,
             date_diff('day', CAST(o.o_orderdate AS DATE),
                       MIN(CAST(l.l_shipdate AS DATE))) AS lead_days
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      GROUP BY 1, 2, o.o_orderdate
    ),
    vol AS (
      SELECT day, COUNT(*)::DOUBLE AS v FROM lead GROUP BY day
    ),
    j AS (
      SELECT l.lead_days, v.v,
             NTILE(5) OVER (ORDER BY v.v, l.day, l.o_orderkey)
               AS vq
      FROM lead l JOIN vol v ON l.day = v.day
    )
    SELECT CAST(vq AS BIGINT) AS volume_quintile,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(AVG(v), 2) AS mean_daily_volume,
           ROUND(AVG(lead_days), 4) AS mean_lead_days
    FROM j GROUP BY vq
    """,
)
def q537_congestion_curve(spark, sf_dir):
    """Congestion curve: first-ship lead time by order-day VOLUME
    quintile — if the top quintile's lead stretches, fulfillment has
    a capacity knee and the queue backs up exactly when demand
    spikes (the operational risk q285's unconditional lead-time
    distribution averages over).  Per-order lead from one grouped
    min, day volume joined back, a deterministic NTILE over (volume,
    day, order) and a 5-row rollup."""
    od = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    lead = (
        od.join(li, od.o_orderkey == li.l_orderkey)
        .groupBy(
            "o_orderkey",
            F.to_date(F.date_trunc("DAY", "o_orderdate")).alias("day"),
            F.col("o_orderdate").alias("odt"),
        )
        .agg(
            F.datediff(
                F.min(F.col("l_shipdate").cast("date")),
                F.col("odt").cast("date"),
            ).alias("lead_days")
        )
        .drop("odt")
    )
    vol = lead.groupBy("day").agg(
        F.count(F.lit(1)).cast("double").alias("v")
    )
    j = lead.join(vol, "day").select(
        "lead_days",
        "v",
        F.ntile(5)
        .over(Window.orderBy("v", "day", "o_orderkey"))
        .alias("vq"),
    )
    return j.groupBy(F.col("vq").cast("bigint").alias("volume_quintile")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.round(F.avg("v"), 2).alias("mean_daily_volume"),
        F.round(F.avg("lead_days"), 4).alias("mean_lead_days"),
    )


@register(
    "q538_dupont_growth",
    """
    WITH yearly AS (
      SELECT CAST(date_part('year', o_orderdate) AS BIGINT) AS yr,
             SUM(o_totalprice) AS rev,
             COUNT(*)::DOUBLE AS orders,
             COUNT(DISTINCT o_custkey)::DOUBLE AS buyers
      FROM orders GROUP BY 1
    )
    SELECT yr AS year,
           ROUND(rev / 1000, 1) AS revenue_k,
           ROUND(LN(rev) - LN(LAG(rev) OVER (ORDER BY yr)), 6)
             AS dln_revenue,
           ROUND(LN(buyers) - LN(LAG(buyers) OVER (ORDER BY yr)), 6)
             AS dln_buyers,
           ROUND(LN(orders / buyers)
                 - LN(LAG(orders / buyers) OVER (ORDER BY yr)), 6)
             AS dln_frequency,
           ROUND(LN(rev / orders)
                 - LN(LAG(rev / orders) OVER (ORDER BY yr)), 6)
             AS dln_order_value
    FROM yearly
    """,
)
def q538_dupont_growth(spark, sf_dir):
    """DuPont-style growth tree by year: revenue ≡ buyers ×
    orders-per-buyer × value-per-order, so Δln(revenue) =
    Δln(buyers) + Δln(frequency) + Δln(AOV) EXACTLY — three levers,
    three additive numbers, no residual (the property percentage
    decompositions lack).  Extends q531's two-factor hurdle with the
    frequency/value split that routes the fix to acquisition,
    engagement, or pricing respectively.  One yearly rollup and lag
    windows."""
    od = _t(spark, sf_dir, "orders")
    yearly = od.groupBy(
        F.year("o_orderdate").cast("bigint").alias("yr")
    ).agg(
        F.sum("o_totalprice").alias("rev"),
        F.count(F.lit(1)).cast("double").alias("orders"),
        F.countDistinct("o_custkey").cast("double").alias("buyers"),
    )
    w = Window.orderBy("yr")

    def dln(c):
        return F.round(F.log(c) - F.log(F.lag(c).over(w)), 6)

    return yearly.select(
        F.col("yr").alias("year"),
        F.round(F.col("rev") / 1000, 1).alias("revenue_k"),
        dln(F.col("rev")).alias("dln_revenue"),
        dln(F.col("buyers")).alias("dln_buyers"),
        dln(F.col("orders") / F.col("buyers")).alias("dln_frequency"),
        dln(F.col("rev") / F.col("orders")).alias("dln_order_value"),
    )


@register(
    "q539_ranking_stability",
    """
    WITH yb AS (
      SELECT CAST(date_part('year', l.l_shipdate) AS BIGINT) AS yr,
             p.p_brand AS brand,
             SUM(l.l_extendedprice * (1 - l.l_discount)) AS r
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY 1, 2
    ),
    ranked AS (
      SELECT yr, brand,
             ROW_NUMBER() OVER (PARTITION BY yr
                                ORDER BY r DESC, brand) AS rk
      FROM yb QUALIFY rk <= 10
    ),
    pairs AS (
      SELECT a.yr AS y1, b.yr AS y2, a.brand,
             a.rk AS rk1, b.rk AS rk2
      FROM ranked a JOIN ranked b
        ON b.yr = a.yr + 1 AND a.brand = b.brand
    )
    SELECT y2 AS year,
           CAST(COUNT(*) AS BIGINT) AS n_common_top10,
           ROUND(COUNT(*) / (20.0 - COUNT(*)), 4) AS jaccard,
           ROUND(AVG(ABS(rk1 - rk2)), 4) AS mean_rank_shift
    FROM pairs GROUP BY y2
    """,
)
def q539_ranking_stability(spark, sf_dir):
    """Year-over-year stability of the top-10 brand league: Jaccard
    of consecutive years' top-10 sets (|∩|/(20−|∩|)) and the mean
    rank displacement of the brands that stayed — the churn metric
    for ANY leaderboard the warehouse publishes; a sudden Jaccard
    drop means the market reshuffled (or the pipeline broke), and
    it's the longitudinal check a single-year top-k (q02/q07) never
    sees.  Year-partitioned rank windows and one offset self-join on
    (year+1, brand)."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    yb = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy(
            F.year("l_shipdate").cast("bigint").alias("yr"),
            F.col("p_brand").alias("brand"),
        )
        .agg(
            F.sum(
                F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
            ).alias("r")
        )
    )
    ranked = yb.select(
        "yr",
        "brand",
        F.row_number()
        .over(
            Window.partitionBy("yr").orderBy(F.col("r").desc(), "brand")
        )
        .alias("rk"),
    ).filter(F.col("rk") <= 10)
    a = ranked.select(
        F.col("yr").alias("y1"), F.col("brand").alias("b1"),
        F.col("rk").alias("rk1"),
    )
    b = ranked.select(
        F.col("yr").alias("y2"), F.col("brand").alias("b2"),
        F.col("rk").alias("rk2"),
    )
    pairs = a.join(
        b, (F.col("y2") == F.col("y1") + 1) & (F.col("b1") == F.col("b2"))
    )
    return pairs.groupBy(F.col("y2").alias("year")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_common_top10"),
        F.round(
            F.count(F.lit(1)) / (F.lit(20.0) - F.count(F.lit(1))), 4
        ).alias("jaccard"),
        F.round(F.avg(F.abs(F.col("rk1") - F.col("rk2"))), 4).alias(
            "mean_rank_shift"
        ),
    )


@register(
    "q540_abc_xyz_matrix",
    """
    WITH rev AS (
      SELECT l_partkey,
             SUM(l_extendedprice * (1 - l_discount)) AS r
      FROM lineitem GROUP BY l_partkey
    ),
    abc AS (
      SELECT l_partkey, r,
             CASE WHEN SUM(r) OVER (ORDER BY r DESC, l_partkey)
                       / SUM(r) OVER () <= 0.8 THEN 'A'
                  WHEN SUM(r) OVER (ORDER BY r DESC, l_partkey)
                       / SUM(r) OVER () <= 0.95 THEN 'B'
                  ELSE 'C' END AS abc_class
      FROM rev
    ),
    monthly AS (
      SELECT l_partkey,
             CAST(date_trunc('month', l_shipdate) AS DATE) AS mth,
             SUM(l_quantity) AS q
      FROM lineitem GROUP BY 1, 2
    ),
    xyz AS (
      SELECT l_partkey,
             CASE WHEN STDDEV_SAMP(q) / AVG(q) < 0.5 THEN 'X'
                  WHEN STDDEV_SAMP(q) / AVG(q) < 1.0 THEN 'Y'
                  ELSE 'Z' END AS xyz_class
      FROM monthly GROUP BY l_partkey
      HAVING COUNT(*) >= 3
    )
    SELECT a.abc_class, x.xyz_class,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           ROUND(SUM(a.r) / 1000, 1) AS revenue_k
    FROM abc a JOIN xyz x ON a.l_partkey = x.l_partkey
    GROUP BY a.abc_class, x.xyz_class
    """,
)
def q540_abc_xyz_matrix(spark, sf_dir):
    """The ABC-XYZ inventory matrix: value classes from the
    cumulative revenue curve (q411) crossed with demand-variability
    classes from each part's monthly-quantity CV — AX items (high
    value, steady demand) get automated replenishment, CZ items
    (low value, erratic) get make-to-order; the 9-cell census with
    revenue per cell IS the inventory policy map.  Two independent
    per-part aggregates joined once; parts with <3 sale months are
    excluded from the CV (documented)."""
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
    share = F.sum("r").over(wc) / F.sum("r").over(wall)
    abc = rev.select(
        "l_partkey",
        "r",
        F.when(share <= 0.8, "A")
        .when(share <= 0.95, "B")
        .otherwise("C")
        .alias("abc_class"),
    )
    monthly = li.groupBy(
        "l_partkey",
        F.to_date(F.date_trunc("MONTH", "l_shipdate")).alias("mth"),
    ).agg(F.sum("l_quantity").alias("q"))
    cv = F.stddev_samp("q") / F.avg("q")
    xyz = (
        monthly.groupBy("l_partkey")
        .agg(cv.alias("cv"), F.count(F.lit(1)).alias("nm"))
        .filter(F.col("nm") >= 3)
        .select(
            F.col("l_partkey").alias("xk"),
            F.when(F.col("cv") < 0.5, "X")
            .when(F.col("cv") < 1.0, "Y")
            .otherwise("Z")
            .alias("xyz_class"),
        )
    )
    return (
        abc.join(xyz, abc.l_partkey == xyz.xk)
        .groupBy("abc_class", "xyz_class")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_parts"),
            F.round(F.sum("r") / 1000, 1).alias("revenue_k"),
        )
    )


@register(
    "q541_lorenz_crossing",
    """
    WITH yrs AS (
      SELECT MIN(date_part('year', o_orderdate)) AS y1,
             MAX(date_part('year', o_orderdate)) AS y2
      FROM orders
    ),
    cust AS (
      SELECT date_part('year', o.o_orderdate) AS yr, o.o_custkey,
             SUM(o.o_totalprice) AS x
      FROM orders o CROSS JOIN yrs
      WHERE date_part('year', o.o_orderdate) IN (yrs.y1, yrs.y2)
      GROUP BY 1, 2
    ),
    ventile AS (
      SELECT yr, NTILE(20) OVER (PARTITION BY yr ORDER BY x) AS v, x
      FROM cust
    ),
    lorenz AS (
      SELECT yr, v,
             SUM(SUM(x)) OVER (PARTITION BY yr ORDER BY v)
             / SUM(SUM(x)) OVER (PARTITION BY yr) AS lshare
      FROM ventile GROUP BY yr, v
    ),
    wide AS (
      SELECT v,
             MAX(CASE WHEN yr = (SELECT y1 FROM yrs)
                      THEN lshare END) AS la,
             MAX(CASE WHEN yr = (SELECT y2 FROM yrs)
                      THEN lshare END) AS lb
      FROM lorenz GROUP BY v
    ),
    signs AS (
      SELECT v, la, lb,
             CASE WHEN la > lb THEN 1
                  WHEN la < lb THEN -1 ELSE 0 END AS sg,
             LAG(CASE WHEN la > lb THEN 1
                      WHEN la < lb THEN -1 ELSE 0 END)
               OVER (ORDER BY v) AS psg
      FROM wide WHERE v < 20
    )
    SELECT CAST((SELECT y1 FROM yrs) AS BIGINT) AS year_a,
           CAST((SELECT y2 FROM yrs) AS BIGINT) AS year_b,
           CAST(SUM(CASE WHEN psg IS NOT NULL AND sg <> 0
                          AND psg <> 0 AND sg <> psg
                         THEN 1 ELSE 0 END) AS BIGINT)
             AS lorenz_crossings,
           ROUND(MAX(ABS(la - lb)), 6) AS max_curve_gap
    FROM signs
    """,
)
def q541_lorenz_crossing(spark, sf_dir):
    """Do the first and last year's spend Lorenz curves CROSS?
    Curves on a shared ventile grid, sign changes of their gap —
    if they cross, neither year Lorenz-dominates and ANY single
    inequality index (Gini q230, Theil q416) ranks them only by its
    own weighting choice; if they don't, every index agrees.  The
    check that should precede 'inequality went up'.  Year-
    partitioned NTILE, a 19-point sign scan."""
    od = _t(spark, sf_dir, "orders")
    yrs = od.agg(
        F.min(F.year("o_orderdate")).alias("y1"),
        F.max(F.year("o_orderdate")).alias("y2"),
    )
    cust = (
        od.crossJoin(F.broadcast(yrs))
        .filter(
            (F.year("o_orderdate") == F.col("y1"))
            | (F.year("o_orderdate") == F.col("y2"))
        )
        .groupBy(
            F.year("o_orderdate").alias("yr"), "o_custkey", "y1", "y2"
        )
        .agg(F.sum("o_totalprice").alias("x"))
    )
    ventile = cust.select(
        "yr",
        "y1",
        "y2",
        "x",
        F.ntile(20).over(Window.partitionBy("yr").orderBy("x")).alias("v"),
    )
    grouped = ventile.groupBy("yr", "v", "y1", "y2").agg(
        F.sum("x").alias("sx")
    )
    wcum = Window.partitionBy("yr").orderBy("v").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wyr = Window.partitionBy("yr")
    lorenz = grouped.select(
        "yr",
        "v",
        "y1",
        "y2",
        (F.sum("sx").over(wcum) / F.sum("sx").over(wyr)).alias("lshare"),
    )
    wide = lorenz.groupBy("v").agg(
        F.max(
            F.when(F.col("yr") == F.col("y1"), F.col("lshare"))
        ).alias("la"),
        F.max(
            F.when(F.col("yr") == F.col("y2"), F.col("lshare"))
        ).alias("lb"),
        F.max("y1").alias("y1"),
        F.max("y2").alias("y2"),
    ).filter(F.col("v") < 20)
    sg = (
        F.when(F.col("la") > F.col("lb"), 1)
        .when(F.col("la") < F.col("lb"), -1)
        .otherwise(0)
    )
    signs = wide.select(
        "la",
        "lb",
        "y1",
        "y2",
        sg.alias("sg"),
        F.lag(sg).over(Window.orderBy("v")).alias("psg"),
    )
    return signs.agg(
        F.max("y1").cast("bigint").alias("year_a"),
        F.max("y2").cast("bigint").alias("year_b"),
        F.sum(
            F.when(
                F.col("psg").isNotNull()
                & (F.col("sg") != 0)
                & (F.col("psg") != 0)
                & (F.col("sg") != F.col("psg")),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("lorenz_crossings"),
        F.round(F.max(F.abs(F.col("la") - F.col("lb"))), 6).alias(
            "max_curve_gap"
        ),
    )


@register(
    "q542_shrinkage_validation",
    """
    WITH med AS (
      SELECT quantile_cont(epoch_us(l_shipdate), 0.5) AS ms
      FROM lineitem
    ),
    halves AS (
      SELECT p.p_brand AS brand,
             CASE WHEN epoch_us(l.l_shipdate) < m.ms
                  THEN 0 ELSE 1 END AS h,
             l.l_quantity AS q
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      CROSS JOIN med m
    ),
    a AS (
      SELECT brand, COUNT(*)::DOUBLE AS n, AVG(q) AS m,
             VAR_SAMP(q) AS v
      FROM halves WHERE h = 0 GROUP BY brand
    ),
    prior AS (
      SELECT AVG(m) AS gm,
             AVG(v / n) AS within,
             GREATEST(VAR_SAMP(m) - AVG(v / n), 0.000001) AS between
      FROM a
    ),
    preds AS (
      SELECT a.brand, a.m AS raw_pred,
             pr.gm + (a.m - pr.gm)
               * (pr.between / (pr.between + a.v / a.n))
               AS shrunk_pred
      FROM a CROSS JOIN prior pr
    ),
    b AS (
      SELECT brand, COUNT(*)::DOUBLE AS n, AVG(q) AS m
      FROM halves WHERE h = 1 GROUP BY brand
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_brands,
           ROUND(SUM(b.n * POWER(p.raw_pred - b.m, 2)) / SUM(b.n), 6)
             AS mse_raw,
           ROUND(SUM(b.n * POWER(p.shrunk_pred - b.m, 2)) / SUM(b.n),
                 6) AS mse_shrunk,
           ROUND(1 - SUM(b.n * POWER(p.shrunk_pred - b.m, 2))
                   / SUM(b.n * POWER(p.raw_pred - b.m, 2)), 6)
             AS mse_reduction
    FROM preds p JOIN b ON p.brand = b.brand
    """,
)
def q542_shrinkage_validation(spark, sf_dir):
    """Out-of-sample validation of empirical-Bayes shrinkage (the
    Stein effect, MEASURED): estimate per-brand mean quantities on
    the first half of the ship history, shrink them toward the grand
    mean with the James-Stein weight between/(between+within), then
    score BOTH predictors against the second half's realized brand
    means — shrinkage should win in aggregate even though it biases
    every brand.  The honest companion to q481 (which only computes
    the shrunk rates); one split, two grouped passes, a 25-row
    scoring join."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    med = li.agg(
        F.expr(
            "percentile(unix_micros(CAST(l_shipdate AS TIMESTAMP)), 0.5)"
        ).alias("ms")
    )
    us = F.unix_micros(F.col("l_shipdate").cast("timestamp"))
    halves = (
        li.join(p, li.l_partkey == p.p_partkey)
        .crossJoin(F.broadcast(med))
        .select(
            F.col("p_brand").alias("brand"),
            F.when(us < F.col("ms"), 0).otherwise(1).alias("h"),
            F.col("l_quantity").alias("q"),
        )
    )
    a = halves.filter(F.col("h") == 0).groupBy("brand").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.avg("q").alias("m"),
        F.var_samp("q").alias("v"),
    )
    prior = a.agg(
        F.avg("m").alias("gm"),
        F.avg(F.col("v") / F.col("n")).alias("within"),
        F.greatest(
            F.var_samp("m") - F.avg(F.col("v") / F.col("n")),
            F.lit(0.000001),
        ).alias("between"),
    )
    preds = a.crossJoin(F.broadcast(prior)).select(
        "brand",
        F.col("m").alias("raw_pred"),
        (
            F.col("gm")
            + (F.col("m") - F.col("gm"))
            * (
                F.col("between")
                / (F.col("between") + F.col("v") / F.col("n"))
            )
        ).alias("shrunk_pred"),
    )
    b = halves.filter(F.col("h") == 1).groupBy(
        F.col("brand").alias("bb")
    ).agg(
        F.count(F.lit(1)).cast("double").alias("bn"),
        F.avg("q").alias("bm"),
    )
    j = preds.join(b, preds.brand == b.bb)
    mse_raw = F.sum(
        F.col("bn") * F.pow(F.col("raw_pred") - F.col("bm"), 2)
    ) / F.sum("bn")
    mse_shr = F.sum(
        F.col("bn") * F.pow(F.col("shrunk_pred") - F.col("bm"), 2)
    ) / F.sum("bn")
    return j.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_brands"),
        F.round(mse_raw, 6).alias("mse_raw"),
        F.round(mse_shr, 6).alias("mse_shrunk"),
        F.round(
            F.lit(1)
            - F.sum(
                F.col("bn") * F.pow(F.col("shrunk_pred") - F.col("bm"), 2)
            )
            / F.sum(
                F.col("bn") * F.pow(F.col("raw_pred") - F.col("bm"), 2)
            ),
            6,
        ).alias("mse_reduction"),
    )


@register(
    "q543_breusch_pagan",
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
             AVG(y) AS my, AVG(t) AS mt
      FROM seq
    ),
    e2 AS (
      SELECT s.t,
             POWER(s.y - (f.my - f.b * f.mt) - f.b * s.t, 2) AS e2
      FROM seq s CROSS JOIN fit f
    ),
    c AS (
      SELECT COUNT(*)::DOUBLE AS n,
             AVG(t) AS mx, AVG(e2) AS my,
             SUM(t * e2) AS sxy, SUM(t * t) AS sxx,
             SUM(e2 * e2) AS syy
      FROM e2
    )
    SELECT CAST(n AS BIGINT) AS n_days,
           ROUND(POWER(sxy - n * mx * my, 2)
                 / ((sxx - n * mx * mx) * (syy - n * my * my)), 6)
             AS r_squared,
           ROUND(n * POWER(sxy - n * mx * my, 2)
                 / ((sxx - n * mx * mx) * (syy - n * my * my)), 4)
             AS lm_stat
    FROM c
    """,
)
def q543_breusch_pagan(spark, sf_dir):
    """Breusch-Pagan heteroskedasticity test on the daily-revenue
    trend regression: regress squared residuals on the trend
    REGRESSOR itself; LM = nR² ~ χ²₁ under constant variance — if it
    fires, error variance GROWS along the fitted line (scale effects)
    and the OLS SEs are wrong in a different way than q456's ARCH
    (time-clustered) or q455's DW (serially correlated); the three
    tests triage WHICH robustness fix the regression needs.  Two
    sufficient-statistics passes."""
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
    cnt = F.count(F.lit(1))
    fit = seq.agg(
        (
            (F.sum(F.col("t") * F.col("y")) - cnt * F.avg("t") * F.avg("y"))
            / (
                F.sum(F.col("t") * F.col("t"))
                - cnt * F.avg("t") * F.avg("t")
            )
        ).alias("b"),
        F.avg("y").alias("my"),
        F.avg("t").alias("mt"),
    )
    e2 = seq.crossJoin(F.broadcast(fit)).select(
        "t",
        F.pow(
            F.col("y")
            - (F.col("my") - F.col("b") * F.col("mt"))
            - F.col("b") * F.col("t"),
            2,
        ).alias("e2"),
    )
    c = e2.agg(
        cnt.cast("double").alias("n"),
        F.avg("t").alias("mx"),
        F.avg("e2").alias("my"),
        F.sum(F.col("t") * F.col("e2")).alias("sxy"),
        F.sum(F.col("t") * F.col("t")).alias("sxx"),
        F.sum(F.col("e2") * F.col("e2")).alias("syy"),
    )
    n = F.col("n")
    r2 = F.pow(F.col("sxy") - n * F.col("mx") * F.col("my"), 2) / (
        (F.col("sxx") - n * F.col("mx") * F.col("mx"))
        * (F.col("syy") - n * F.col("my") * F.col("my"))
    )
    return c.select(
        n.cast("bigint").alias("n_days"),
        F.round(r2, 6).alias("r_squared"),
        F.round(n * r2, 4).alias("lm_stat"),
    )


@register(
    "q544_chow_test",
    """
    WITH daily AS (
      -- exact decimal money sum (q01/q411 sf10 class); kept DECIMAL
      -- so the co-moment sums below stay exact too — the SSE formula
      -- cancels ~7 orders of magnitude and sees every summation-order
      -- ulp of a double SUM(y*y)
      SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
                  AS DECIMAL(16,2)) AS rev
      FROM orders GROUP BY 1
    ),
    seq AS (
      SELECT rev AS y,
             ROW_NUMBER() OVER (ORDER BY day) AS t,
             COUNT(*) OVER () AS n
      FROM daily
    ),
    grouped AS (
      -- exact integer/decimal sufficient statistics per half; the
      -- widening casts keep every DuckDB product inside int128
      SELECT CASE WHEN t <= n / 2 THEN 0 ELSE 1 END AS g,
             COUNT(*) AS cnt,
             SUM(t) AS st,
             CAST(SUM(y) AS DECIMAL(19,2)) AS sy,
             SUM(t * t) AS stt,
             CAST(SUM(CAST(t AS DECIMAL(9,0)) * y) AS DECIMAL(25,2))
               AS sty,
             CAST(SUM(CAST(y AS DECIMAL(19,2)) * CAST(y AS DECIMAL(19,2)))
                  AS DECIMAL(32,4)) AS syy
      FROM seq GROUP BY 1
    ),
    -- cancel EXACTLY in decimal (n·Syy − Sy², n·Sty − St·Sy,
    -- n·Stt − St²), then drop to double: casting the RAW 1e21-scale
    -- moments to double first loses ~30 ulps to the engines'
    -- different decimal→double conversions, which the 7-orders-of-
    -- magnitude SSE cancellation amplifies into visible cents
    sses AS (
      SELECT SUM(sse) AS ssesplit FROM (
        SELECT (CAST(CAST(cnt AS DECIMAL(6,0)) * syy - sy * sy
                     AS DOUBLE)
                - CAST(CAST(cnt AS DECIMAL(6,0)) * sty
                       - CAST(st AS DECIMAL(8,0)) * sy AS DOUBLE)
                  * CAST(CAST(cnt AS DECIMAL(6,0)) * sty
                         - CAST(st AS DECIMAL(8,0)) * sy AS DOUBLE)
                  / CAST(cnt * stt - st * st AS DOUBLE))
               / cnt AS sse
        FROM grouped
      )
    ),
    tot AS (
      SELECT SUM(cnt) AS n, SUM(st) AS st,
             CAST(SUM(sy) AS DECIMAL(19,2)) AS sy,
             SUM(stt) AS stt,
             CAST(SUM(sty) AS DECIMAL(25,2)) AS sty,
             CAST(SUM(syy) AS DECIMAL(32,4)) AS syy
      FROM grouped
    ),
    pooled AS (
      SELECT (CAST(CAST(n AS DECIMAL(6,0)) * syy - sy * sy AS DOUBLE)
              - CAST(CAST(n AS DECIMAL(6,0)) * sty
                     - CAST(st AS DECIMAL(8,0)) * sy AS DOUBLE)
                * CAST(CAST(n AS DECIMAL(6,0)) * sty
                       - CAST(st AS DECIMAL(8,0)) * sy AS DOUBLE)
                / CAST(n * stt - st * st AS DOUBLE))
             / n AS ssep,
             n
      FROM tot
    )
    -- magnitude-appropriate emission (q502 discipline): the absolute
    -- SSEs demand ~14 significant digits at sf10 where engine
    -- decimal→double conversion ulps still differ; their RATIO (the
    -- actual break signal, like chow_f) is stable to ~1e-12
    SELECT CAST(p.n AS BIGINT) AS n_days,
           ROUND(p.ssep / (SELECT ssesplit FROM sses), 6)
             AS sse_pooled_over_split,
           ROUND(((p.ssep - (SELECT ssesplit FROM sses)) / 2)
                 / ((SELECT ssesplit FROM sses) / (p.n - 4)), 4)
             AS chow_f
    FROM pooled p
    """,
)
def q544_chow_test(spark, sf_dir):
    """Chow structural-break F-test at the series midpoint: fit the
    daily-revenue trend pooled and separately per half, and test
    whether freeing the two halves' coefficients buys more SSE
    reduction than chance — the FORMAL verdict on the break q489
    only describes (F ~ F(2, n−4) under no-break).  The pooled SSE
    is reconstructed from the same per-half sufficient statistics
    (weighted means recombine exactly), so ONE grouped pass feeds
    all three regressions."""
    od = _t(spark, sf_dir, "orders")
    # exact decimal daily sums kept DECIMAL into the co-moments (see
    # oracle comment): the SSE cancellation sees every ulp of a double
    # SUM(y*y)
    daily = od.groupBy(
        F.to_date(F.date_trunc("DAY", "o_orderdate")).alias("day")
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(12,2)"))
        .cast("decimal(16,2)")
        .alias("rev")
    )
    seq = daily.select(
        F.col("rev").alias("y"),
        F.row_number().over(Window.orderBy("day")).alias("t"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    # exact sufficient statistics; cancel exactly in decimal, then
    # drop to double (see the oracle comment on decimal→double ulps)
    grouped = seq.groupBy(
        F.when(F.col("t") <= F.col("n") / 2, 0).otherwise(1).alias("g")
    ).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum("t").alias("st"),
        F.sum("y").cast("decimal(19,2)").alias("sy"),
        F.sum(F.col("t") * F.col("t")).alias("stt"),
        F.sum(F.col("t").cast("decimal(9,0)") * F.col("y"))
        .cast("decimal(25,2)")
        .alias("sty"),
        F.sum(
            F.col("y").cast("decimal(19,2)")
            * F.col("y").cast("decimal(19,2)")
        )
        .cast("decimal(32,4)")
        .alias("syy"),
    )

    def _sse(cnt, st, sy, stt, sty, syy):
        a = (cnt.cast("decimal(6,0)") * syy - sy * sy).cast("double")
        b = (
            cnt.cast("decimal(6,0)") * sty
            - st.cast("decimal(8,0)") * sy
        ).cast("double")
        c = (cnt * stt - st * st).cast("double")
        return (a - b * b / c) / cnt

    sses = grouped.agg(
        F.sum(
            _sse(
                F.col("cnt"), F.col("st"), F.col("sy"),
                F.col("stt"), F.col("sty"), F.col("syy"),
            )
        ).alias("ssesplit"),
    )
    tot = grouped.agg(
        F.sum("cnt").alias("n"),
        F.sum("st").alias("st"),
        F.sum("sy").cast("decimal(19,2)").alias("sy"),
        F.sum("stt").alias("stt"),
        F.sum("sty").cast("decimal(25,2)").alias("sty"),
        F.sum("syy").cast("decimal(32,4)").alias("syy"),
    )
    pooled = tot.select(
        _sse(
            F.col("n"), F.col("st"), F.col("sy"),
            F.col("stt"), F.col("sty"), F.col("syy"),
        ).alias("ssep"),
        F.col("n"),
    )
    j = pooled.crossJoin(F.broadcast(sses))
    # ratio emission, not absolute SSEs (q502 discipline — see oracle)
    return j.select(
        F.col("n").cast("bigint").alias("n_days"),
        F.round(F.col("ssep") / F.col("ssesplit"), 6).alias(
            "sse_pooled_over_split"
        ),
        F.round(
            ((F.col("ssep") - F.col("ssesplit")) / 2)
            / (F.col("ssesplit") / (F.col("n") - 4)),
            4,
        ).alias("chow_f"),
    )


@register(
    "q545_newey_west",
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
             AVG(y) AS my, AVG(t) AS mt,
             SUM(t * t) - COUNT(*) * AVG(t) * AVG(t) AS sxx,
             COUNT(*)::DOUBLE AS n
      FROM seq
    ),
    v AS (
      SELECT s.t,
             (s.t - f.mt)
             * (s.y - (f.my - f.b * f.mt) - f.b * s.t) AS vt
      FROM seq s CROSS JOIN fit f
    ),
    gam AS (
      SELECT k.k,
             SUM(a.vt * b.vt) AS g
      FROM v a
      CROSS JOIN (VALUES (0),(1),(2),(3),(4),(5)) AS k(k)
      JOIN v b ON b.t = a.t - k.k
      GROUP BY k.k
    ),
    s AS (
      SELECT SUM(CASE WHEN k = 0 THEN g
                      ELSE 2 * (1 - k / 6.0) * g END) AS lrv
      FROM gam
    )
    SELECT ROUND(f.b, 6) AS slope,
           ROUND(SQRT((SELECT SUM(CASE WHEN k = 0 THEN g END)
                       FROM gam)
                      / (f.n - 2)) / SQRT(f.sxx), 6) AS se_ols,
           ROUND(SQRT(s.lrv) / f.sxx, 6) AS se_newey_west,
           ROUND((SQRT(s.lrv) / f.sxx)
                 / (SQRT((SELECT SUM(CASE WHEN k = 0 THEN g END)
                          FROM gam) / (f.n - 2)) / SQRT(f.sxx)), 4)
             AS se_inflation
    FROM fit f CROSS JOIN s
    """,
)
def q545_newey_west(spark, sf_dir):
    """Newey-West (HAC) standard error for the daily-revenue trend
    slope, Bartlett kernel with 5 lags: the long-run variance of the
    score vₜ=(t−t̄)eₜ replaces the i.i.d. σ²/Sxx, delivering the
    serial-correlation-robust SE that q455's Durbin-Watson and
    q543's Breusch-Pagan DEMAND when they fire — the fix those
    diagnostics point at, completing the trio.  Autocovariances come
    from a 6-offset self-join of the score series; one fold each."""
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
    cnt = F.count(F.lit(1))
    fit = seq.agg(
        (
            (F.sum(F.col("t") * F.col("y")) - cnt * F.avg("t") * F.avg("y"))
            / (
                F.sum(F.col("t") * F.col("t"))
                - cnt * F.avg("t") * F.avg("t")
            )
        ).alias("b"),
        F.avg("y").alias("my"),
        F.avg("t").alias("mt"),
        (
            F.sum(F.col("t") * F.col("t"))
            - cnt * F.avg("t") * F.avg("t")
        ).alias("sxx"),
        cnt.cast("double").alias("n"),
    )
    v = seq.crossJoin(F.broadcast(fit)).select(
        "t",
        (
            (F.col("t") - F.col("mt"))
            * (
                F.col("y")
                - (F.col("my") - F.col("b") * F.col("mt"))
                - F.col("b") * F.col("t")
            )
        ).alias("vt"),
    )
    ks = od.sparkSession.createDataFrame(
        [(k,) for k in range(6)], "k int"
    )
    a, b = v.alias("a"), v.alias("b")
    gam = (
        a.crossJoin(F.broadcast(ks))
        .join(b, F.col("b.t") == F.col("a.t") - F.col("k"))
        .groupBy("k")
        .agg(F.sum(F.col("a.vt") * F.col("b.vt")).alias("g"))
    )
    s = gam.agg(
        F.sum(
            F.when(F.col("k") == 0, F.col("g")).otherwise(
                2 * (1 - F.col("k") / 6.0) * F.col("g")
            )
        ).alias("lrv"),
        F.sum(F.when(F.col("k") == 0, F.col("g"))).alias("g0"),
    )
    j = fit.crossJoin(F.broadcast(s))
    se_ols = F.sqrt(F.col("g0") / (F.col("n") - 2)) / F.sqrt(F.col("sxx"))
    se_nw = F.sqrt(F.col("lrv")) / F.col("sxx")
    return j.select(
        F.round("b", 6).alias("slope"),
        F.round(se_ols, 6).alias("se_ols"),
        F.round(se_nw, 6).alias("se_newey_west"),
        F.round(se_nw / se_ols, 4).alias("se_inflation"),
    )


@register(
    "q546_morans_i",
    """
    WITH x AS (
      SELECT n.n_nationkey AS nk, n.n_regionkey AS rk,
             AVG(cs.x) AS v
      FROM (SELECT c.c_nationkey, o.o_custkey,
                   SUM(o.o_totalprice) AS x
            FROM orders o JOIN customer c
              ON o.o_custkey = c.c_custkey
            GROUP BY c.c_nationkey, o.o_custkey) cs
      JOIN nation n ON cs.c_nationkey = n.n_nationkey
      GROUP BY 1, 2
    ),
    z AS (
      SELECT nk, rk, v - AVG(v) OVER () AS z,
             COUNT(*) OVER ()::DOUBLE AS n
      FROM x
    ),
    num AS (
      SELECT SUM(a.z * b.z) AS s, COUNT(*)::DOUBLE AS wsum,
             MAX(a.n) AS n
      FROM z a JOIN z b ON a.rk = b.rk AND a.nk <> b.nk
    ),
    den AS (SELECT SUM(z * z) AS ss FROM z)
    SELECT CAST(num.n AS BIGINT) AS n_nations,
           CAST(num.wsum AS BIGINT) AS n_weight_pairs,
           ROUND((num.n / num.wsum) * num.s / den.ss, 6) AS morans_i,
           ROUND(-1 / (num.n - 1), 6) AS expected_under_null
    FROM num CROSS JOIN den
    """,
)
def q546_morans_i(spark, sf_dir):
    """Moran's I spatial autocorrelation of mean customer spend
    across nations, with same-REGION contiguity weights: do nations
    in the same region have correlated spend levels?  I above
    −1/(n−1) means regional clustering (marketing or logistics act
    at region level), the spatial analogue of q194's temporal ACF —
    and the audit that per-nation 'independent' league tables
    (q416/q445) implicitly assume away.  The weight matrix never
    materializes: the numerator is one same-region self-join on the
    25-row nation aggregate."""
    od = _t(spark, sf_dir, "orders")
    cu = _t(spark, sf_dir, "customer")
    na = _t(spark, sf_dir, "nation")
    cs = (
        od.join(cu, od.o_custkey == cu.c_custkey)
        .groupBy("c_nationkey", "o_custkey")
        .agg(F.sum("o_totalprice").alias("x"))
    )
    x = (
        cs.join(F.broadcast(na), cs.c_nationkey == na.n_nationkey)
        .groupBy(
            F.col("n_nationkey").alias("nk"),
            F.col("n_regionkey").alias("rk"),
        )
        .agg(F.avg("x").alias("v"))
    )
    wall = Window.partitionBy()
    z = x.select(
        "nk",
        "rk",
        (F.col("v") - F.avg("v").over(wall)).alias("z"),
        F.count(F.lit(1)).over(wall).cast("double").alias("n"),
    )
    a = z.select(
        F.col("nk").alias("ank"), F.col("rk").alias("ark"),
        F.col("z").alias("az"), F.col("n").alias("an"),
    )
    b = z.select(
        F.col("nk").alias("bnk"), F.col("rk").alias("brk"),
        F.col("z").alias("bz"),
    )
    num = a.join(
        b, (a.ark == b.brk) & (a.ank != b.bnk)
    ).agg(
        F.sum(F.col("az") * F.col("bz")).alias("s"),
        F.count(F.lit(1)).cast("double").alias("wsum"),
        F.max("an").alias("n"),
    )
    den = z.agg(F.sum(F.col("z") * F.col("z")).alias("ss"))
    return num.crossJoin(F.broadcast(den)).select(
        F.col("n").cast("bigint").alias("n_nations"),
        F.col("wsum").cast("bigint").alias("n_weight_pairs"),
        F.round(
            (F.col("n") / F.col("wsum")) * F.col("s") / F.col("ss"), 6
        ).alias("morans_i"),
        F.round(-1 / (F.col("n") - 1), 6).alias("expected_under_null"),
    )


@register(
    "q547_dissimilarity_index",
    """
    WITH mix AS (
      SELECT cn.n_name AS nation, p.p_brand AS brand,
             COUNT(*)::DOUBLE AS c
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer cu ON o.o_custkey = cu.c_custkey
      JOIN nation cn ON cu.c_nationkey = cn.n_nationkey
      JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY 1, 2
    ),
    shares AS (
      SELECT nation, brand,
             c / SUM(c) OVER (PARTITION BY nation) AS ns,
             SUM(c) OVER (PARTITION BY brand)
             / SUM(c) OVER () AS gs
      FROM mix
    )
    SELECT nation,
           CAST(COUNT(*) AS BIGINT) AS n_brands,
           ROUND(0.5 * SUM(ABS(ns - gs)), 6) AS dissimilarity
    FROM shares GROUP BY nation
    """,
)
def q547_dissimilarity_index(spark, sf_dir):
    """Duncan dissimilarity index of each nation's brand mix against
    the global mix: D = ½Σ|nation share − global share| — the
    fraction of a nation's purchases that would have to SWITCH
    brands to match the world, a direct 'how localized is taste'
    number that q401's KL gives in nats (D is bounded, unit-free,
    and survives zero cells without smoothing).  One grouped scan,
    shares from windows, a per-nation fold."""
    li = _t(spark, sf_dir, "lineitem")
    od = _t(spark, sf_dir, "orders")
    cu = _t(spark, sf_dir, "customer")
    na = _t(spark, sf_dir, "nation")
    p = _t(spark, sf_dir, "part")
    mix = (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .join(cu, od.o_custkey == cu.c_custkey)
        .join(F.broadcast(na), cu.c_nationkey == na.n_nationkey)
        .join(p, li.l_partkey == p.p_partkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.col("p_brand").alias("brand"),
        )
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
    )
    wn = Window.partitionBy("nation")
    wb = Window.partitionBy("brand")
    wall = Window.partitionBy()
    shares = mix.select(
        "nation",
        (F.col("c") / F.sum("c").over(wn)).alias("ns"),
        (F.sum("c").over(wb) / F.sum("c").over(wall)).alias("gs"),
    )
    return shares.groupBy("nation").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_brands"),
        F.round(
            0.5 * F.sum(F.abs(F.col("ns") - F.col("gs"))), 6
        ).alias("dissimilarity"),
    )


@register(
    "q548_gini_decomposition",
    """
    WITH cust AS (
      SELECT n.n_name AS nation, SUM(o.o_totalprice) AS x
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY n.n_name, o.o_custkey
    ),
    overall AS (
      SELECT SUM((2 * i - n - 1) * x) / (MAX(n) * MAX(sx)) AS g
      FROM (SELECT x, ROW_NUMBER() OVER (ORDER BY x) AS i,
                   COUNT(*) OVER ()::DOUBLE AS n,
                   SUM(x) OVER () AS sx
            FROM cust)
    ),
    within AS (
      SELECT nation,
             SUM((2 * i - n - 1) * x) / (n * sx) AS gw,
             MAX(n) AS ni, MAX(sx) AS sxi
      FROM (SELECT nation, x,
                   ROW_NUMBER() OVER (PARTITION BY nation
                                      ORDER BY x) AS i,
                   COUNT(*) OVER (PARTITION BY nation)::DOUBLE AS n,
                   SUM(x) OVER (PARTITION BY nation) AS sx
            FROM cust)
      GROUP BY nation, n, sx
    ),
    tot AS (
      SELECT SUM(ni) AS nt, SUM(sxi) AS st FROM within
    ),
    wterm AS (
      SELECT SUM(w.gw * (w.ni / t.nt) * (w.sxi / t.st)) AS gwc
      FROM within w CROSS JOIN tot t
    ),
    between_g AS (
      SELECT SUM((a.ni / t.nt) * (b.ni / t.nt)
                 * ABS(a.sxi / a.ni - b.sxi / b.ni))
             / (2 * (MAX(t.st) / MAX(t.nt))) AS gb
      FROM within a CROSS JOIN within b CROSS JOIN tot t
    )
    SELECT ROUND(o.g, 6) AS gini_total,
           ROUND(w.gwc, 6) AS within_contribution,
           ROUND(b.gb, 6) AS between_groups,
           ROUND(o.g - w.gwc - b.gb, 6) AS overlap_residual
    FROM overall o CROSS JOIN wterm w CROSS JOIN between_g b
    """,
)
def q548_gini_decomposition(spark, sf_dir):
    """Gini decomposition of customer spend by nation: within-group
    contributions (each nation's Gini weighted by population × income
    share), the between-group Gini on nation means, and the OVERLAP
    residual — the term that does not exist for Theil (q416) and
    measures how much the nations' distributions interleave (zero
    only if they occupy disjoint spend ranges).  Every Gini uses the
    sorted-rank identity; the between term is a 625-pair aggregate."""
    od = _t(spark, sf_dir, "orders")
    cu = _t(spark, sf_dir, "customer")
    na = _t(spark, sf_dir, "nation")
    cust = (
        od.join(cu, od.o_custkey == cu.c_custkey)
        .join(F.broadcast(na), cu.c_nationkey == na.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), "o_custkey")
        .agg(F.sum("o_totalprice").alias("x"))
    )
    wall = Window.partitionBy()
    r_all = cust.select(
        "x",
        F.row_number().over(Window.orderBy("x")).alias("i"),
        F.count(F.lit(1)).over(wall).cast("double").alias("n"),
        F.sum("x").over(wall).alias("sx"),
    )
    overall = r_all.agg(
        (
            F.sum((2 * F.col("i") - F.col("n") - 1) * F.col("x"))
            / (F.max("n") * F.max("sx"))
        ).alias("g")
    )
    wn = Window.partitionBy("nation")
    r_g = cust.select(
        "nation",
        "x",
        F.row_number()
        .over(Window.partitionBy("nation").orderBy("x"))
        .alias("i"),
        F.count(F.lit(1)).over(wn).cast("double").alias("n"),
        F.sum("x").over(wn).alias("sx"),
    )
    within = r_g.groupBy("nation").agg(
        (
            F.sum((2 * F.col("i") - F.col("n") - 1) * F.col("x"))
            / (F.max("n") * F.max("sx"))
        ).alias("gw"),
        F.max("n").alias("ni"),
        F.max("sx").alias("sxi"),
    )
    tot = within.agg(
        F.sum("ni").alias("nt"), F.sum("sxi").alias("st")
    )
    wterm = within.crossJoin(F.broadcast(tot)).agg(
        F.sum(
            F.col("gw")
            * (F.col("ni") / F.col("nt"))
            * (F.col("sxi") / F.col("st"))
        ).alias("gwc")
    )
    a = within.select(
        F.col("ni").alias("na"), F.col("sxi").alias("sa")
    )
    b = within.select(
        F.col("ni").alias("nb"), F.col("sxi").alias("sb")
    )
    between_g = (
        a.crossJoin(b)
        .crossJoin(F.broadcast(tot))
        .agg(
            (
                F.sum(
                    (F.col("na") / F.col("nt"))
                    * (F.col("nb") / F.col("nt"))
                    * F.abs(
                        F.col("sa") / F.col("na")
                        - F.col("sb") / F.col("nb")
                    )
                )
                / (2 * (F.max("st") / F.max("nt")))
            ).alias("gb")
        )
    )
    return (
        overall.crossJoin(F.broadcast(wterm))
        .crossJoin(F.broadcast(between_g))
        .select(
            F.round("g", 6).alias("gini_total"),
            F.round("gwc", 6).alias("within_contribution"),
            F.round("gb", 6).alias("between_groups"),
            F.round(
                F.col("g") - F.col("gwc") - F.col("gb"), 6
            ).alias("overlap_residual"),
        )
    )


@register(
    "q549_record_counts",
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
             CAST(ROW_NUMBER() OVER (ORDER BY day) AS DOUBLE) AS t,
             MAX(rev) OVER (ORDER BY day
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING) AS prior_max
      FROM daily
    ),
    flags AS (
      SELECT day, t,
             CASE WHEN prior_max IS NULL OR rev > prior_max
                  THEN 1 ELSE 0 END AS rec
      FROM seq
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(SUM(rec) AS BIGINT) AS n_records,
           ROUND(SUM(1 / t), 4) AS expected_records,
           ROUND((SUM(rec) - SUM(1 / t))
                 / SQRT(SUM(1 / t - 1 / (t * t))), 4) AS z_stat,
           MAX(CASE WHEN rec = 1 THEN day END) AS last_record_day
    FROM flags
    """,
)
def q549_record_counts(spark, sf_dir):
    """Record-value test: count all-time-high revenue days and
    compare to the i.i.d. expectation Hₙ = Σ1/t (≈ln n + γ — records
    become logarithmically rare under stationarity), variance
    Σ(1/t − 1/t²) — a surplus of records is DRIFT detected from
    nothing but argmax events, robust to any monotone
    transformation; records clustered late confirm growth, and the
    last-record date stamps when the series last broke new ground.
    One running-max window and a harmonic fold."""
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
    wprior = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, -1
    )
    seq = daily.select(
        "day",
        "rev",
        F.row_number()
        .over(Window.orderBy("day"))
        .cast("double")
        .alias("t"),
        F.max("rev").over(wprior).alias("prior_max"),
    )
    flags = seq.select(
        "day",
        "t",
        F.when(
            F.col("prior_max").isNull()
            | (F.col("rev") > F.col("prior_max")),
            1,
        )
        .otherwise(0)
        .alias("rec"),
    )
    t = F.col("t")
    return flags.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum("rec").cast("bigint").alias("n_records"),
        F.round(F.sum(1 / t), 4).alias("expected_records"),
        F.round(
            (F.sum("rec") - F.sum(1 / t))
            / F.sqrt(F.sum(1 / t - 1 / (t * t))),
            4,
        ).alias("z_stat"),
        F.max(F.when(F.col("rec") == 1, F.col("day"))).alias(
            "last_record_day"
        ),
    )


@register(
    "q550_tail_model_contest",
    """
    WITH cust AS (
      -- exact decimal money sum (q01/q411 sf10 class): noisy double
      -- per-customer sums flip boundary customers across the p90
      -- threshold differently per engine
      SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
               AS x
      FROM orders GROUP BY o_custkey
    ),
    thr AS (SELECT quantile_cont(x, 0.9) AS xmin FROM cust),
    lnfit AS (
      SELECT AVG(LN(x)) AS mu, STDDEV_SAMP(LN(x)) AS sigma FROM cust
    ),
    tail AS (
      SELECT c.x, t.xmin, f.mu, f.sigma
      FROM cust c CROSS JOIN thr t CROSS JOIN lnfit f
      WHERE c.x > t.xmin
    ),
    hill AS (
      SELECT COUNT(*)::DOUBLE / SUM(LN(x / xmin)) AS alpha,
             COUNT(*)::DOUBLE AS n,
             MAX(xmin) AS xmin, MAX(mu) AS mu, MAX(sigma) AS sigma
      FROM tail
    ),
    lntailp AS (
      SELECT h.*,
             0.5 * (1 - (CASE WHEN (LN(h.xmin) - h.mu) / h.sigma < 0
                              THEN -1 ELSE 1 END)
             * (1 - (((((1.061405429
                 * (1 / (1 + 0.3275911
                    * (ABS((LN(h.xmin) - h.mu) / h.sigma) / SQRT(2))))
                 - 1.453152027)
                 * (1 / (1 + 0.3275911
                    * (ABS((LN(h.xmin) - h.mu) / h.sigma) / SQRT(2))))
                 + 1.421413741)
                 * (1 / (1 + 0.3275911
                    * (ABS((LN(h.xmin) - h.mu) / h.sigma) / SQRT(2))))
                 - 0.284496736)
                 * (1 / (1 + 0.3275911
                    * (ABS((LN(h.xmin) - h.mu) / h.sigma) / SQRT(2))))
                 + 0.254829592)
                 * (1 / (1 + 0.3275911
                    * (ABS((LN(h.xmin) - h.mu) / h.sigma) / SQRT(2))))
                 * EXP(-(ABS((LN(h.xmin) - h.mu) / h.sigma) / SQRT(2))
                       * (ABS((LN(h.xmin) - h.mu) / h.sigma)
                          / SQRT(2)))))) AS p_tail
      FROM hill h
    ),
    pointwise AS (
      SELECT (LN(l.alpha) + l.alpha * LN(l.xmin)
              - (l.alpha + 1) * LN(t.x))
             - (-LN(t.x * l.sigma * SQRT(2 * 3.141592653589793))
                - POWER(LN(t.x) - l.mu, 2) / (2 * l.sigma * l.sigma)
                - LN(l.p_tail)) AS d
      FROM tail t CROSS JOIN lntailp l
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_tail,
           ROUND((SELECT alpha FROM hill), 4) AS hill_alpha,
           ROUND(SUM(d), 2) AS llr_pareto_minus_lognormal,
           ROUND(AVG(d) / STDDEV_SAMP(d) * SQRT(COUNT(*)), 4)
             AS vuong_z,
           CASE WHEN AVG(d) / STDDEV_SAMP(d) * SQRT(COUNT(*)) > 1.96
                THEN 'pareto'
                WHEN AVG(d) / STDDEV_SAMP(d) * SQRT(COUNT(*)) < -1.96
                THEN 'lognormal'
                ELSE 'undecided' END AS winner
    FROM pointwise
    """,
)
def q550_tail_model_contest(spark, sf_dir):
    """Vuong model contest for the spend tail (above p90): Pareto
    (Hill α) vs the truncated lognormal, compared by POINTWISE
    log-likelihood differences and the Vuong z = √n·d̄/s_d — the
    principled referee between q295's power-law reading and q315's
    lognormal reading of the same tail (they imply wildly different
    'biggest customer we'll ever see' answers; eyeballing a log-log
    plot cannot arbitrate, this test does, including the honest
    'undecided').  The lognormal tail mass uses the shared erf
    complement; everything is folds over the ~150-row tail."""
    od = _t(spark, sf_dir, "orders")
    cust = od.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(12,2)"))
        .cast("double")
        .alias("x")
    )
    thr = cust.agg(F.expr("percentile(x, 0.9)").alias("xmin"))
    lnfit = cust.agg(
        F.avg(F.log("x")).alias("mu"),
        F.stddev_samp(F.log("x")).alias("sigma"),
    )
    tail = (
        cust.crossJoin(F.broadcast(thr))
        .crossJoin(F.broadcast(lnfit))
        .filter(F.col("x") > F.col("xmin"))
    )
    hill = tail.agg(
        (
            F.count(F.lit(1)).cast("double")
            / F.sum(F.log(F.col("x") / F.col("xmin")))
        ).alias("alpha"),
        F.max("xmin").alias("hxmin"),
        F.max("mu").alias("hmu"),
        F.max("sigma").alias("hsigma"),
    )
    zv = (F.log(F.col("hxmin")) - F.col("hmu")) / F.col("hsigma")
    xx = F.abs(zv) / F.sqrt(F.lit(2))
    tt = F.lit(1) / (F.lit(1) + F.lit(0.3275911) * xx)
    comp = (
        (
            (
                (
                    (F.lit(1.061405429) * tt - F.lit(1.453152027)) * tt
                    + F.lit(1.421413741)
                )
                * tt
                - F.lit(0.284496736)
            )
            * tt
            + F.lit(0.254829592)
        )
        * tt
        * F.exp(-xx * xx)
    )
    sign = F.when(zv < 0, -1.0).otherwise(1.0)
    p_tail = F.lit(1) - F.lit(0.5) * (
        F.lit(1) + sign * (F.lit(1) - comp)
    )
    lntailp = hill.withColumn("p_tail", p_tail)
    sqrt2pi = 2.5066282746310002
    pw = tail.crossJoin(F.broadcast(lntailp)).select(
        (
            (
                F.log("alpha")
                + F.col("alpha") * F.log("hxmin")
                - (F.col("alpha") + 1) * F.log(F.col("x"))
            )
            - (
                -F.log(F.col("x") * F.col("hsigma") * F.lit(sqrt2pi))
                - F.pow(F.log(F.col("x")) - F.col("hmu"), 2)
                / (2 * F.col("hsigma") * F.col("hsigma"))
                - F.log("p_tail")
            )
        ).alias("d"),
        "alpha",
    )
    vz = F.avg("d") / F.stddev_samp("d") * F.sqrt(
        F.count(F.lit(1)).cast("double")
    )
    return pw.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tail"),
        F.round(F.max("alpha"), 4).alias("hill_alpha"),
        F.round(F.sum("d"), 2).alias("llr_pareto_minus_lognormal"),
        F.round(vz, 4).alias("vuong_z"),
        F.when(vz > 1.96, "pareto")
        .when(vz < -1.96, "lognormal")
        .otherwise("undecided")
        .alias("winner"),
    )


@register(
    "q551_cross_source_oov",
    r"""
    WITH counts AS (
      SELECT source, w, COUNT(*)::DOUBLE AS c
      FROM (
        SELECT source,
               UNNEST(list_filter(
                 string_split_regex(trim(lower(text)), '\s+'),
                 x -> x <> '')) AS w
        FROM documents
      ) GROUP BY source, w
    ),
    top5 AS (
      SELECT source FROM (
        SELECT source, SUM(c) AS tc,
               ROW_NUMBER() OVER (ORDER BY SUM(c) DESC, source) AS rk
        FROM counts GROUP BY source
      ) WHERE rk <= 5
    ),
    c5 AS (
      SELECT c.* FROM counts c JOIN top5 t ON c.source = t.source
    ),
    pairs AS (
      SELECT ti.source AS train_src, b.source AS apply_src,
             SUM(CASE WHEN a.w IS NULL THEN b.c ELSE 0 END)
               / SUM(b.c) AS oov_mass
      FROM top5 ti
      JOIN c5 b ON b.source <> ti.source
      LEFT JOIN c5 a ON a.source = ti.source AND a.w = b.w
      GROUP BY ti.source, b.source
    )
    SELECT train_src, apply_src,
           ROUND(oov_mass, 6) AS oov_token_mass
    FROM pairs
    """,
)
def q551_cross_source_oov(spark, sf_dir):
    """Cross-source OOV transfer matrix over the five biggest
    sources: the TOKEN MASS of source j not covered by source i's
    vocabulary — the asymmetric cost of training a tokenizer (or
    vocabulary-dependent filter) on one source and applying it to
    another, which q202's single global OOV rate cannot localize.
    High asymmetry (i covers j but not vice versa) identifies the
    superset source to build vocab from.  One token census, a
    vocab anti-join per ordered pair of the 5×4 grid."""
    d = _t(spark, sf_dir, "documents")
    toks = F.filter(
        F.split(F.trim(F.lower(F.col("text"))), r"\s+"),
        lambda w: w != "",
    )
    counts = (
        d.select("source", F.explode(toks).alias("w"))
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
    )
    top5 = (
        counts.groupBy("source")
        .agg(F.sum("c").alias("tc"))
        .select(
            "source",
            F.row_number()
            .over(Window.orderBy(F.col("tc").desc(), "source"))
            .alias("rk"),
        )
        .filter(F.col("rk") <= 5)
        .select("source")
    )
    c5 = counts.join(F.broadcast(top5), "source").localCheckpoint(
        eager=True
    )
    ti = top5.select(F.col("source").alias("train_src"))
    b = c5.select(
        F.col("source").alias("apply_src"),
        F.col("w").alias("bw"),
        F.col("c").alias("bc"),
    )
    a = c5.select(
        F.col("source").alias("asrc"), F.col("w").alias("aw")
    )
    pairs = (
        ti.join(b, F.col("apply_src") != F.col("train_src"))
        .join(
            a,
            (F.col("asrc") == F.col("train_src"))
            & (F.col("aw") == F.col("bw")),
            "left",
        )
        .groupBy("train_src", "apply_src")
        .agg(
            (
                F.sum(
                    F.when(F.col("aw").isNull(), F.col("bc")).otherwise(
                        0.0
                    )
                )
                / F.sum("bc")
            ).alias("oov_mass")
        )
    )
    return pairs.select(
        "train_src",
        "apply_src",
        F.round("oov_mass", 6).alias("oov_token_mass"),
    )


@register(
    "q552_split_leakage",
    f"""
    WITH docs AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(lower(text)),
                                            '\\s+'),
                         x -> x <> '') AS ws,
             {_MD5_BUCKET.format(col='doc_id', seed=1)} AS bk
      FROM documents
    ),
    grams AS (
      SELECT doc_id, bk,
             array_to_string(ws[g:g+7], ' ') AS gram
      FROM docs,
           UNNEST(range(1, len(ws) - 6)) AS t(g)
      WHERE len(ws) >= 8
    ),
    train_g AS (
      SELECT DISTINCT gram FROM grams WHERE bk < 800000
    ),
    test_docs AS (
      SELECT g.doc_id,
             MAX(CASE WHEN t.gram IS NOT NULL THEN 1 ELSE 0 END)
               AS leaked
      FROM grams g LEFT JOIN train_g t ON g.gram = t.gram
      WHERE g.bk >= 900000
      GROUP BY g.doc_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_test_docs,
           CAST(SUM(leaked) AS BIGINT) AS leaked_docs,
           ROUND(AVG(CAST(leaked AS DOUBLE)), 6) AS leakage_rate
    FROM test_docs
    """,
)
def q552_split_leakage(spark, sf_dir):
    """Split-leakage audit of the md5 80/10/10 split (q80's
    splitter): the fraction of TEST documents sharing at least one
    word 8-gram with the TRAIN partition — document-level hash
    splitting guarantees no doc is in both sides, but near-dups and
    quoted passages leak CONTENT anyway; this measures that residual
    directly, the check that motivates running q86-style
    decontamination even on 'cleanly' split corpora.  Shingle
    explode, a distinct train-gram set, one semi-join verdict per
    test doc."""
    d = _t(spark, sf_dir, "documents")
    ws = F.filter(
        F.split(F.trim(F.lower(F.col("text"))), r"\s+"),
        lambda w: w != "",
    )
    bk = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":", F.col("doc_id").cast("string"), F.lit("1")
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("bigint")
        % 1000000
    )
    docs = d.select("doc_id", ws.alias("ws"), bk.alias("bk")).filter(
        F.size("ws") >= 8
    )
    grams = docs.select(
        "doc_id",
        "bk",
        F.explode(
            F.expr(
                "transform(sequence(1, size(ws) - 7),"
                " g -> array_join(slice(ws, g, 8), ' '))"
            )
        ).alias("gram"),
    ).localCheckpoint(eager=True)
    train_g = (
        grams.filter(F.col("bk") < 800000).select("gram").distinct()
    )
    test_docs = (
        grams.filter(F.col("bk") >= 900000)
        .join(
            train_g.withColumnRenamed("gram", "tg"),
            F.col("gram") == F.col("tg"),
            "left",
        )
        .groupBy("doc_id")
        .agg(
            F.max(
                F.when(F.col("tg").isNotNull(), 1).otherwise(0)
            ).alias("leaked")
        )
    )
    return test_docs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_test_docs"),
        F.sum("leaked").cast("bigint").alias("leaked_docs"),
        F.round(F.avg(F.col("leaked").cast("double")), 6).alias(
            "leakage_rate"
        ),
    )


@register(
    "q553_bigram_perplexity",
    f"""
    WITH docs AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(lower(text)),
                                            '\\s+'),
                         x -> x <> '') AS ws,
             {_MD5_BUCKET.format(col='doc_id', seed=1)} AS bk
      FROM documents
    ),
    toks AS (
      SELECT doc_id, bk, g AS pos, ws[g] AS w
      FROM docs, UNNEST(range(1, len(ws) + 1)) AS t(g)
    ),
    train_uni AS (
      SELECT w, COUNT(*)::DOUBLE AS c1
      FROM toks WHERE bk < 800000 GROUP BY w
    ),
    vsize AS (
      SELECT COUNT(*)::DOUBLE + 1 AS v FROM train_uni
    ),
    train_bi AS (
      SELECT a.w AS w1, b.w AS w2, COUNT(*)::DOUBLE AS c12
      FROM toks a JOIN toks b
        ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
      WHERE a.bk < 800000
      GROUP BY a.w, b.w
    ),
    held AS (
      SELECT COALESCE(u1.w, '<unk>') AS w1,
             COALESCE(u2.w, '<unk>') AS w2
      FROM toks a
      JOIN toks b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
      LEFT JOIN train_uni u1 ON a.w = u1.w
      LEFT JOIN train_uni u2 ON b.w = u2.w
      WHERE a.bk >= 800000
    ),
    scored AS (
      SELECT LN((COALESCE(tb.c12, 0) + 1)
                / (COALESCE(tu.c1, 0) + vs.v))
               / LN(2) AS lg
      FROM held h
      LEFT JOIN train_bi tb ON h.w1 = tb.w1 AND h.w2 = tb.w2
      LEFT JOIN train_uni tu ON h.w1 = tu.w
      CROSS JOIN vsize vs
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_held_bigrams,
           ROUND(-AVG(lg), 4) AS cross_entropy_bits,
           ROUND(POWER(2, -AVG(lg)), 2) AS perplexity
    FROM scored
    """,
)
def q553_bigram_perplexity(spark, sf_dir):
    """Held-out perplexity of an add-one bigram language model:
    train on the md5-80% docs, score every held-out bigram with
    P(w₂|w₁) = (c₁₂+1)/(c₁+V+1) after OOV→<unk> mapping, report
    cross-entropy and PPL — the END-TO-END LM evaluation loop (train
    counts → smooth → score held-out) as three joins, where q253's
    Kneser-Ney builds the better model and q170's surprisal scores
    in-sample; this is the out-of-sample number you'd track while
    cleaning a corpus (dedup and boilerplate removal LOWER it).
    All shuffles key on tokens or (doc, pos)."""
    d = _t(spark, sf_dir, "documents")
    ws = F.filter(
        F.split(F.trim(F.lower(F.col("text"))), r"\s+"),
        lambda w: w != "",
    )
    bk = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":", F.col("doc_id").cast("string"), F.lit("1")
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("bigint")
        % 1000000
    )
    docs = d.select("doc_id", ws.alias("ws"), bk.alias("bk"))
    # materialize the token table once: it feeds the unigram census,
    # the bigram self-join (twice), and the held-out side — without
    # this the plan re-scans and re-explodes documents per branch
    # (plan audit: 18 scans -> 2).
    toks = docs.select(
        "doc_id", "bk", F.posexplode("ws").alias("pos0", "w")
    ).select(
        "doc_id", "bk", (F.col("pos0") + 1).alias("pos"), "w"
    ).localCheckpoint(eager=True)
    train_uni = (
        toks.filter(F.col("bk") < 800000)
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("double").alias("c1"))
    )
    vsize = train_uni.agg(
        (F.count(F.lit(1)).cast("double") + 1).alias("v")
    )
    ta = toks.select(
        F.col("doc_id").alias("da"), F.col("bk").alias("ba"),
        F.col("pos").alias("pa"), F.col("w").alias("wa"),
    )
    tb = toks.select(
        F.col("doc_id").alias("db"), F.col("pos").alias("pb"),
        F.col("w").alias("wb"),
    )
    big = ta.join(
        tb, (F.col("da") == F.col("db")) & (F.col("pb") == F.col("pa") + 1)
    )
    train_bi = (
        big.filter(F.col("ba") < 800000)
        .groupBy(F.col("wa").alias("w1"), F.col("wb").alias("w2"))
        .agg(F.count(F.lit(1)).cast("double").alias("c12"))
    )
    u1 = train_uni.select(F.col("w").alias("u1w"))
    u2 = train_uni.select(F.col("w").alias("u2w"))
    held = (
        big.filter(F.col("ba") >= 800000)
        .join(u1, F.col("wa") == F.col("u1w"), "left")
        .join(u2, F.col("wb") == F.col("u2w"), "left")
        .select(
            F.coalesce(F.col("u1w"), F.lit("<unk>")).alias("w1"),
            F.coalesce(F.col("u2w"), F.lit("<unk>")).alias("w2"),
        )
    )
    scored = (
        held.join(train_bi, ["w1", "w2"], "left")
        .join(
            train_uni.withColumnRenamed("w", "w1"),
            "w1",
            "left",
        )
        .crossJoin(F.broadcast(vsize))
        .select(
            (
                F.log(
                    (F.coalesce("c12", F.lit(0.0)) + 1)
                    / (F.coalesce("c1", F.lit(0.0)) + F.col("v"))
                )
                / F.log(F.lit(2.0))
            ).alias("lg")
        )
    )
    return scored.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_held_bigrams"),
        F.round(-F.avg("lg"), 4).alias("cross_entropy_bits"),
        F.round(F.pow(F.lit(2.0), -F.avg("lg")), 2).alias(
            "perplexity"
        ),
    )


@register(
    "q554_embedding_isotropy",
    """
    WITH dims AS (
      SELECT vec_id, i, embedding[i] AS x
      FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS t(i)
    ),
    norms AS (
      SELECT vec_id, SQRT(SUM(x * x)) AS nv FROM dims GROUP BY vec_id
    ),
    unit AS (
      SELECT d.vec_id, d.i, d.x / n.nv AS u
      FROM dims d JOIN norms n ON d.vec_id = n.vec_id
    ),
    dimsum AS (
      SELECT i, SUM(u) AS s, COUNT(*)::DOUBLE AS n
      FROM unit GROUP BY i
    ),
    agg AS (
      SELECT SUM(s * s) AS ss, MAX(n) AS n FROM dimsum
    )
    SELECT CAST(n AS BIGINT) AS n_vectors,
           ROUND((ss - n) / (n * (n - 1)), 6)
             AS mean_pairwise_cosine,
           ROUND(SQRT(ss) / n, 6) AS mean_vector_norm,
           ROUND(1 - (ss - n) / (n * (n - 1)), 6) AS isotropy_score
    FROM agg
    """,
)
def q554_embedding_isotropy(spark, sf_dir):
    """Embedding isotropy in closed form: the mean pairwise cosine of
    the NORMALIZED vectors equals (‖Σv̂‖²−n)/(n(n−1)), so the whole
    'does the embedding space have a rogue common direction'
    diagnostic costs two grouped passes and ZERO pairs — anisotropic
    spaces (large mean cosine) break cosine-threshold dedup (q51)
    and similarity search calibration, and the common fix (subtract
    the mean vector) is validated by re-running this same query.
    The identity is exact, not sampled."""
    e = _t(spark, sf_dir, "embeddings")
    dims = e.select("vec_id", F.posexplode("embedding").alias("i", "x"))
    norms = dims.groupBy("vec_id").agg(
        F.sqrt(F.sum(F.col("x") * F.col("x"))).alias("nv")
    )
    unit = dims.join(norms, "vec_id").select(
        "i", (F.col("x") / F.col("nv")).alias("u")
    )
    dimsum = unit.groupBy("i").agg(
        F.sum("u").alias("s"), F.count(F.lit(1)).cast("double").alias("n")
    )
    agg = dimsum.agg(
        F.sum(F.col("s") * F.col("s")).alias("ss"),
        F.max("n").alias("n"),
    )
    n, ss = F.col("n"), F.col("ss")
    mpc = (ss - n) / (n * (n - 1))
    return agg.select(
        n.cast("bigint").alias("n_vectors"),
        F.round(mpc, 6).alias("mean_pairwise_cosine"),
        F.round(F.sqrt(ss) / n, 6).alias("mean_vector_norm"),
        F.round(F.lit(1) - mpc, 6).alias("isotropy_score"),
    )


@register(
    "q555_intrinsic_dimension",
    """
    WITH anchors AS (
      SELECT vec_id, label FROM (
        SELECT vec_id, label,
               ROW_NUMBER() OVER (PARTITION BY label
                                  ORDER BY vec_id) AS rk
        FROM embeddings
      ) WHERE rk <= 50
    ),
    dims AS (
      SELECT vec_id, label, i, embedding[i] AS x
      FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS t(i)
    ),
    adims AS (
      SELECT d.* FROM dims d JOIN anchors an
        ON d.vec_id = an.vec_id
    ),
    pd AS (
      SELECT a.vec_id AS va, b.vec_id AS vb,
             SQRT(SUM(POWER(a.x - b.x, 2))) AS dist
      FROM adims a JOIN dims b
        ON a.i = b.i AND a.label = b.label AND a.vec_id <> b.vec_id
      GROUP BY a.vec_id, b.vec_id
    ),
    nn AS (
      SELECT va, dist,
             ROW_NUMBER() OVER (PARTITION BY va
                                ORDER BY dist, vb) AS rk
      FROM pd
    ),
    mu AS (
      SELECT a.va, b.dist / a.dist AS mu
      FROM nn a JOIN nn b ON a.va = b.va AND a.rk = 1 AND b.rk = 2
      WHERE a.dist > 0
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_vectors,
           ROUND(AVG(mu), 4) AS mean_nn_ratio,
           ROUND(COUNT(*) / SUM(LN(mu)), 4) AS intrinsic_dim
    FROM mu
    """,
)
def q555_intrinsic_dimension(spark, sf_dir):
    """TwoNN intrinsic dimension of the embeddings (label-blocked):
    d̂ = n/Σln(r₂/r₁) from each vector's two nearest same-label
    neighbors — if 64-dimensional vectors live on a ~10-dimensional
    manifold, LSH bucket counts (q269's planner) and distance
    concentration behave like d≈10, not 64; the single number that
    calibrates every ANN design choice.  Estimation runs from a
    FIXED 50-anchor set per label against all same-label candidates,
    so the pair join is anchors×n — LINEAR in corpus size (the
    unbounded within-label all-pairs version measured 148× at 10×
    data; anchors are the documented fix, and 500 anchors is ample
    for the MLE)."""
    e = _t(spark, sf_dir, "embeddings")
    anchors = (
        e.select(
            "vec_id",
            "label",
            F.row_number()
            .over(Window.partitionBy("label").orderBy("vec_id"))
            .alias("rk"),
        )
        .filter(F.col("rk") <= 50)
        .select(F.col("vec_id").alias("avid"))
    )
    dims = e.select(
        "vec_id", "label", F.posexplode("embedding").alias("i", "x")
    )
    adims = dims.join(
        F.broadcast(anchors), dims.vec_id == F.col("avid")
    ).drop("avid")
    a = adims.select(
        F.col("vec_id").alias("va"), F.col("label").alias("la"),
        F.col("i").alias("ia"), F.col("x").alias("xa"),
    )
    b = dims.select(
        F.col("vec_id").alias("vb"), F.col("label").alias("lb"),
        F.col("i").alias("ib"), F.col("x").alias("xb"),
    )
    pd = (
        a.join(
            b,
            (F.col("ia") == F.col("ib"))
            & (F.col("la") == F.col("lb"))
            & (F.col("va") != F.col("vb")),
        )
        .groupBy("va", "vb")
        .agg(
            F.sqrt(F.sum(F.pow(F.col("xa") - F.col("xb"), 2))).alias(
                "dist"
            )
        )
    )
    nn = pd.select(
        "va",
        "dist",
        F.row_number()
        .over(Window.partitionBy("va").orderBy("dist", "vb"))
        .alias("rk"),
    )
    n1 = nn.filter(F.col("rk") == 1).select(
        F.col("va").alias("v1"), F.col("dist").alias("r1")
    )
    n2 = nn.filter(F.col("rk") == 2).select(
        F.col("va").alias("v2"), F.col("dist").alias("r2")
    )
    mu = (
        n1.join(n2, F.col("v1") == F.col("v2"))
        .filter(F.col("r1") > 0)
        .select((F.col("r2") / F.col("r1")).alias("mu"))
    )
    return mu.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vectors"),
        F.round(F.avg("mu"), 4).alias("mean_nn_ratio"),
        F.round(
            F.count(F.lit(1)) / F.sum(F.log("mu")), 4
        ).alias("intrinsic_dim"),
    )


@register(
    "q556_quality_yield_curve",
    r"""
    WITH feat AS (
      SELECT n_chars,
             CAST(len(list_filter(
               string_split_regex(trim(text), '\s+'),
               w -> w <> '')) AS DOUBLE) AS wc
      FROM documents
    ),
    thr AS (
      SELECT 'p00' AS lbl, 0.0 AS t
      UNION ALL
      SELECT 'p25', quantile_cont(n_chars, 0.25) FROM feat
      UNION ALL
      SELECT 'p50', quantile_cont(n_chars, 0.5) FROM feat
      UNION ALL
      SELECT 'p75', quantile_cont(n_chars, 0.75) FROM feat
    ),
    tot AS (SELECT SUM(wc) AS tw, COUNT(*)::DOUBLE AS td FROM feat)
    SELECT t.lbl AS threshold,
           ROUND(t.t, 1) AS min_chars,
           CAST(SUM(CASE WHEN f.n_chars >= t.t THEN 1 ELSE 0 END)
                AS BIGINT) AS docs_retained,
           ROUND(SUM(CASE WHEN f.n_chars >= t.t THEN f.wc ELSE 0 END)
                 / MAX(tt.tw), 6) AS token_share_retained,
           ROUND(SUM(CASE WHEN f.n_chars >= t.t THEN f.wc ELSE 0 END)
                 / SUM(CASE WHEN f.n_chars >= t.t THEN 1 ELSE 0 END),
                 2) AS mean_tokens_per_doc
    FROM thr t CROSS JOIN feat f CROSS JOIN tot tt
    GROUP BY t.lbl, t.t
    """,
)
def q556_quality_yield_curve(spark, sf_dir):
    """Token-yield curve of a minimum-length quality gate: at the
    p25/p50/p75 length thresholds, how many documents and — the
    number that matters for training — what TOKEN MASS survives,
    plus the mean document size of the survivors.  Length gates
    always cost fewer tokens than documents (short docs carry little
    mass); the curve quantifies that lever before committing, the
    sweep version of q400's single fixed pipeline.  One feature
    scan, a 4-threshold broadcast sweep."""
    d = _t(spark, sf_dir, "documents")
    wc = F.size(
        F.filter(F.split(F.trim(F.col("text")), r"\s+"), lambda w: w != "")
    )
    feat = d.select("n_chars", wc.cast("double").alias("wc"))
    thr_vals = feat.agg(
        F.expr("percentile(n_chars, 0.25)").alias("p25"),
        F.expr("percentile(n_chars, 0.5)").alias("p50"),
        F.expr("percentile(n_chars, 0.75)").alias("p75"),
    )
    parts = []
    for lbl, col in (
        ("p00", F.lit(0.0)),
        ("p25", F.col("p25")),
        ("p50", F.col("p50")),
        ("p75", F.col("p75")),
    ):
        parts.append(
            thr_vals.select(
                F.lit(lbl).alias("lbl"), col.alias("t")
            )
        )
    thr = parts[0]
    for pc in parts[1:]:
        thr = thr.unionByName(pc)
    tot = feat.agg(
        F.sum("wc").alias("tw"),
        F.count(F.lit(1)).cast("double").alias("td"),
    )
    keep = F.col("n_chars") >= F.col("t")
    return (
        feat.crossJoin(F.broadcast(thr))
        .crossJoin(F.broadcast(tot))
        .groupBy(F.col("lbl").alias("threshold"), "t")
        .agg(
            F.sum(F.when(keep, 1).otherwise(0))
            .cast("bigint")
            .alias("docs_retained"),
            F.round(
                F.sum(F.when(keep, F.col("wc")).otherwise(0.0))
                / F.max("tw"),
                6,
            ).alias("token_share_retained"),
            F.round(
                F.sum(F.when(keep, F.col("wc")).otherwise(0.0))
                / F.sum(F.when(keep, 1).otherwise(0)),
                2,
            ).alias("mean_tokens_per_doc"),
        )
        .select(
            "threshold",
            F.round("t", 1).alias("min_chars"),
            "docs_retained",
            "token_share_retained",
            "mean_tokens_per_doc",
        )
    )


@register(
    "q557_good_turing_mass",
    r"""
    WITH counts AS (
      SELECT source, w, COUNT(*)::DOUBLE AS c
      FROM (
        SELECT source,
               UNNEST(list_filter(
                 string_split_regex(trim(lower(text)), '\s+'),
                 x -> x <> '')) AS w
        FROM documents
      ) GROUP BY source, w
    )
    SELECT source,
           CAST(SUM(c) AS BIGINT) AS tokens,
           CAST(COUNT(*) AS BIGINT) AS types,
           CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS hapax,
           ROUND(SUM(CASE WHEN c = 1 THEN 1.0 ELSE 0 END) / SUM(c), 6)
             AS gt_unseen_mass,
           ROUND(SUM(CASE WHEN c = 1 THEN 1.0 ELSE 0 END) / COUNT(*),
                 6) AS hapax_type_share
    FROM counts GROUP BY source
    """,
)
def q557_good_turing_mass(spark, sf_dir):
    """Good-Turing unseen-probability mass per source: P₀ = N₁/N (the
    hapax token share) estimates how much probability the NEXT
    sample will spend on never-seen words — high P₀ sources are
    lexically open (names, code, noise) and will punish any
    fixed-vocabulary model hardest, which makes this the principled
    prioritizer for where q551's OOV problem will bite next.  One
    census, one conditional fold per source."""
    d = _t(spark, sf_dir, "documents")
    toks = F.filter(
        F.split(F.trim(F.lower(F.col("text"))), r"\s+"),
        lambda w: w != "",
    )
    counts = (
        d.select("source", F.explode(toks).alias("w"))
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
    )
    return counts.groupBy("source").agg(
        F.sum("c").cast("bigint").alias("tokens"),
        F.count(F.lit(1)).cast("bigint").alias("types"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("hapax"),
        F.round(
            F.sum(F.when(F.col("c") == 1, 1.0).otherwise(0.0))
            / F.sum("c"),
            6,
        ).alias("gt_unseen_mass"),
        F.round(
            F.sum(F.when(F.col("c") == 1, 1.0).otherwise(0.0))
            / F.count(F.lit(1)),
            6,
        ).alias("hapax_type_share"),
    )


@register(
    "q558_code_detector_profile",
    r"""
    WITH feat AS (
      SELECT source,
             (CAST(length(regexp_replace(text,
                '[^{{}}()\[\]=<>#]', '', 'g')) AS DOUBLE)
              + length(text) - length(replace(text, chr(59), '')))
               / n_chars AS sym,
             CAST(length(regexp_replace(text, '[^0-9]', '', 'g'))
                  AS DOUBLE) / n_chars AS dig,
             CAST(length(text) - length(replace(text, chr(59), ''))
                  AS DOUBLE) * 100 / n_chars AS scount
      FROM documents
    )
    SELECT source,
           ROUND(AVG(sym), 6) AS symbol_ratio,
           ROUND(AVG(dig), 6) AS digit_ratio,
           ROUND(AVG(scount), 6) AS semicolons_per_100_chars,
           ROUND(AVG(10 * sym + 2 * dig + 0.1 * scount), 6)
             AS code_score
    FROM feat GROUP BY source
    """,
)
def q558_code_detector_profile(spark, sf_dir):
    """Code-vs-prose fingerprint per source: bracket/operator symbol
    density, digit density, and semicolon rate, folded into one
    code score — the cheap router that decides whether a source
    flows to the code-cleaning pipeline (where q85's prose
    normalizers would mangle it) or the text one; these three
    scan-speed regex counts separate the two populations with no
    model.  Pure column expressions, one grouped fold."""
    d = _t(spark, sf_dir, "documents")
    # semicolons counted via replace() — a literal ';' inside a quoted
    # string inside a CTE trips DuckDB 1.0's statement splitter, so the
    # oracle uses chr(59); both sides share this exact arithmetic.
    n_semi = F.length(F.col("text")) - F.length(
        F.regexp_replace(F.col("text"), r";", "")
    )
    sym = (
        (
            F.length(
                F.regexp_replace(F.col("text"), r"[^{}()\[\]=<>#]", "")
            ).cast("double")
            + n_semi
        )
        / F.col("n_chars")
    )
    dig = (
        F.length(F.regexp_replace(F.col("text"), r"[^0-9]", ""))
        .cast("double")
        / F.col("n_chars")
    )
    semi = n_semi.cast("double") * 100 / F.col("n_chars")
    feat = d.select(
        "source", sym.alias("sym"), dig.alias("dig"), semi.alias("semi")
    )
    return feat.groupBy("source").agg(
        F.round(F.avg("sym"), 6).alias("symbol_ratio"),
        F.round(F.avg("dig"), 6).alias("digit_ratio"),
        F.round(F.avg("semi"), 6).alias("semicolons_per_100_chars"),
        F.round(
            F.avg(
                10 * F.col("sym") + 2 * F.col("dig") + 0.1 * F.col("semi")
            ),
            6,
        ).alias("code_score"),
    )


@register(
    "q559_template_slot_entropy",
    r"""
    WITH docs AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(lower(text)),
                                            '\s+'),
                         x -> x <> '') AS ws
      FROM documents
    ),
    pre AS (
      SELECT array_to_string(ws[1:2], ' ') AS prefix,
             ws[3] AS slot
      FROM docs WHERE len(ws) >= 3
    ),
    fam AS (
      SELECT prefix, slot, COUNT(*)::DOUBLE AS c
      FROM pre GROUP BY prefix, slot
    ),
    shares AS (
      SELECT prefix, c,
             c / SUM(c) OVER (PARTITION BY prefix) AS sh
      FROM fam
    ),
    fams AS (
      SELECT prefix, SUM(c) AS n,
             -SUM(sh * LN(sh)) AS h,
             MAX(sh) AS top_share
      FROM shares GROUP BY prefix HAVING SUM(c) >= 3
    )
    SELECT prefix,
           CAST(n AS BIGINT) AS n_docs,
           ROUND(h, 4) AS slot_entropy,
           ROUND(top_share, 4) AS top_next_share
    FROM fams
    ORDER BY n DESC, prefix
    LIMIT 10
    """,
)
def q559_template_slot_entropy(spark, sf_dir):
    """Template rigidity probe: group documents by their first two
    tokens (template families with ≥3 members — this corpus's
    openings are diverse, so two tokens is the usable prefix) and
    measure the ENTROPY of the third token — near-zero entropy means the
    family is a fill-in-the-blank template (one continuation
    dominates), high entropy means a genuine common opening; the
    follow-up question to q87's boilerplate detection, asking HOW
    templated the shared openings are rather than just whether they
    repeat.  Prefix rollup, per-family entropy fold, top-10 by
    size."""
    d = _t(spark, sf_dir, "documents")
    ws = F.filter(
        F.split(F.trim(F.lower(F.col("text"))), r"\s+"),
        lambda w: w != "",
    )
    docs = d.select(ws.alias("ws")).filter(F.size("ws") >= 3)
    pre = docs.select(
        F.array_join(F.slice("ws", 1, 2), " ").alias("prefix"),
        F.element_at("ws", 3).alias("slot"),
    )
    fam = pre.groupBy("prefix", "slot").agg(
        F.count(F.lit(1)).cast("double").alias("c")
    )
    shares = fam.withColumn(
        "sh",
        F.col("c") / F.sum("c").over(Window.partitionBy("prefix")),
    )
    fams = (
        shares.groupBy("prefix")
        .agg(
            F.sum("c").alias("n"),
            (-F.sum(F.col("sh") * F.log("sh"))).alias("h"),
            F.max("sh").alias("top_share"),
        )
        .filter(F.col("n") >= 3)
    )
    return (
        fams.select(
            "prefix",
            F.col("n").cast("bigint").alias("n_docs"),
            F.round("h", 4).alias("slot_entropy"),
            F.round("top_share", 4).alias("top_next_share"),
            F.col("n").alias("_n"),
        )
        .orderBy(F.col("_n").desc(), "prefix")
        .limit(10)
        .drop("_n")
    )


@register(
    "q560_budget_waterfill",
    r"""
    WITH s AS (
      SELECT source,
             CAST(SUM(len(list_filter(
               string_split_regex(trim(text), '\s+'),
               w -> w <> ''))) AS DOUBLE) AS avail,
             AVG(n_chars) AS quality_w
      FROM documents GROUP BY source
    ),
    tot AS (
      SELECT SUM(avail) AS ta, SUM(quality_w) AS tw FROM s
    ),
    pass1 AS (
      SELECT s.source, s.avail, s.quality_w,
             0.6 * t.ta * s.quality_w / t.tw AS a1
      FROM s CROSS JOIN tot t
    ),
    caps AS (
      SELECT SUM(CASE WHEN a1 > avail THEN a1 - avail ELSE 0 END)
               AS overflow,
             SUM(CASE WHEN a1 <= avail THEN quality_w ELSE 0 END)
               AS open_w
      FROM pass1
    ),
    pass2 AS (
      SELECT p.source, p.avail, p.quality_w,
             LEAST(p.a1, p.avail) AS take1,
             CASE WHEN p.a1 <= p.avail
                  THEN LEAST(p.a1 + c.overflow * p.quality_w
                             / c.open_w, p.avail)
                  ELSE p.avail END AS take2
      FROM pass1 p CROSS JOIN caps c
    )
    SELECT source,
           CAST(avail AS BIGINT) AS available_tokens,
           ROUND(take1, 1) AS allocation_pass1,
           ROUND(take2, 1) AS allocation_pass2,
           CAST(CASE WHEN take2 >= avail THEN 1 ELSE 0 END AS BIGINT)
             AS capped
    FROM pass2
    """,
)
def q560_budget_waterfill(spark, sf_dir):
    """Two-pass water-filling of a 60%-of-corpus token budget across
    sources, weighted by a quality proxy (mean doc length): pass 1
    allocates proportionally; sources whose share exceeds their
    AVAILABILITY are capped and their overflow redistributes over
    the uncapped pool in pass 2 — the closed-form core of every
    'mix these sources at these weights' data order, and the
    redistribution step q417's single-pass epochs solver stops
    short of.  Two folds and two broadcast joins; at 2^k sources
    the same plan is k redistribution passes, each a fold."""
    d = _t(spark, sf_dir, "documents")
    toks = F.size(
        F.filter(F.split(F.trim(F.col("text")), r"\s+"), lambda w: w != "")
    )
    s = d.groupBy("source").agg(
        F.sum(toks).cast("double").alias("avail"),
        F.avg("n_chars").alias("quality_w"),
    )
    tot = s.agg(
        F.sum("avail").alias("ta"), F.sum("quality_w").alias("tw")
    )
    pass1 = s.crossJoin(F.broadcast(tot)).select(
        "source",
        "avail",
        "quality_w",
        (
            0.6 * F.col("ta") * F.col("quality_w") / F.col("tw")
        ).alias("a1"),
    )
    caps = pass1.agg(
        F.sum(
            F.when(
                F.col("a1") > F.col("avail"), F.col("a1") - F.col("avail")
            ).otherwise(0.0)
        ).alias("overflow"),
        F.sum(
            F.when(
                F.col("a1") <= F.col("avail"), F.col("quality_w")
            ).otherwise(0.0)
        ).alias("open_w"),
    )
    pass2 = pass1.crossJoin(F.broadcast(caps)).select(
        "source",
        "avail",
        F.least(F.col("a1"), F.col("avail")).alias("take1"),
        F.when(
            F.col("a1") <= F.col("avail"),
            F.least(
                F.col("a1")
                + F.col("overflow") * F.col("quality_w") / F.col("open_w"),
                F.col("avail"),
            ),
        )
        .otherwise(F.col("avail"))
        .alias("take2"),
    )
    return pass2.select(
        "source",
        F.col("avail").cast("bigint").alias("available_tokens"),
        F.round("take1", 1).alias("allocation_pass1"),
        F.round("take2", 1).alias("allocation_pass2"),
        F.when(F.col("take2") >= F.col("avail"), 1)
        .otherwise(0)
        .cast("bigint")
        .alias("capped"),
    )
