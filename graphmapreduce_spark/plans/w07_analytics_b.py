"""Analytics arc B: drift, eval metrics, business analytics, econometrics.

Part 7/11 of the query registry (split from the former single-file
workload.py); importing this module registers its queries in
``plans._shared.QUERIES``.
"""

from graphmapreduce_spark.plans._shared import *  # noqa: F401,F403

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
        # a web-scale vocab is itself 10⁸+ terms: rank via the
        # range-partitioned global_rank, not a single-task window
        from graphmapreduce_spark.operators import sort as GS

        h = (
            toks.filter(F.col("doc_id") % 2 == parity)
            .groupBy("term")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        return GS.global_rank(
            h, [F.col("c").desc(), F.col("term").asc()],
            rank_col=f"r{parity}",
        ).select("term", f"r{parity}")

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
           -- exact decimal + cents safe cast (q429/q418 discipline):
           -- the grand-total double SUM landed on a cent tie at sf1
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) * 100
                     AS DECIMAL(38,0)) AS DOUBLE) / 100 AS revenue
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
            (
                (F.sum(F.col("l_extendedprice").cast("decimal(18,2)")) * 100)
                .cast("decimal(38,0)")
                .cast("double")
                / 100
            ).alias("revenue"),
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
      -- exact decimal accumulation (q429/q418 discipline, found at
      -- sf10): a double SUM at 2.4e12 magnitude carries more
      -- summation-order noise than the emitted cent precision
      SELECT l_partkey,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS r
      FROM lineitem GROUP BY l_partkey
    ),
    ranked AS (
      SELECT l_partkey, r,
             CAST(SUM(r) OVER (ORDER BY r DESC, l_partkey) AS DOUBLE) /
               CAST(SUM(r) OVER () AS DOUBLE) AS cum_share
      FROM rev
    )
    SELECT CASE WHEN cum_share <= 0.8 THEN 'A'
                WHEN cum_share <= 0.95 THEN 'B'
                ELSE 'C' END AS abc_class,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(ROUND(SUM(r), 2) AS DOUBLE) AS revenue,
           ROUND(CAST(SUM(r) AS DOUBLE)
                 / CAST(SUM(SUM(r)) OVER () AS DOUBLE), 6)
             AS revenue_share
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
    yearly).  The cumulative share over the per-part AGGREGATED
    revenue table (parts-sized — billions at 100 TB) goes through
    `sort.global_cumsum` (range-partitioned two-level running sum, no
    single-task window); the grand total folds in as a broadcast
    1-row scalar."""
    from graphmapreduce_spark.operators import sort as GS

    li = _t(spark, sf_dir, "lineitem")
    # exact decimal accumulation end-to-end (the sf10 lesson): r is an
    # exact DECIMAL per part, the cumulative share and total divide as
    # doubles built from identical exact sums on both engines, and the
    # emitted revenue is the exact sum rounded to cents — no
    # summation-order noise anywhere a strict comparison can see
    rev = li.groupBy("l_partkey").agg(
        F.sum(
            F.col("l_extendedprice").cast("decimal(18,2)")
            * (
                F.lit(1).cast("decimal(18,2)")
                - F.col("l_discount").cast("decimal(18,2)")
            )
        ).alias("r")
    )
    cum = GS.global_cumsum(
        rev, [F.col("r").desc(), F.col("l_partkey")], "r",
        cum_col="_cum",
    )
    tot = rev.agg(F.sum("r").alias("_tot"))
    wall = Window.partitionBy()
    ranked = cum.crossJoin(F.broadcast(tot)).select(
        "r",
        (
            F.col("_cum").cast("double") / F.col("_tot").cast("double")
        ).alias("cum_share"),
    )
    cls = (
        F.when(F.col("cum_share") <= 0.8, "A")
        .when(F.col("cum_share") <= 0.95, "B")
        .otherwise("C")
    )
    per = ranked.groupBy(cls.alias("abc_class")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_parts"),
        F.round(F.sum("r"), 2).cast("double").alias("revenue"),
        F.sum("r").alias("raw_r"),
    )
    return per.withColumn(
        "revenue_share",
        F.round(
            F.col("raw_r").cast("double")
            / F.sum("raw_r").over(wall).cast("double"),
            6,
        ),
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
    in the same partitioning; the quintiling runs over the
    customer-sized table, so it goes through `sort.global_ntile`
    (range-partitioned rank, no single-task window)."""
    from graphmapreduce_spark.operators import sort as GS

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
    tiled = GS.global_ntile(
        firsts.select(
            "first_value",
            "o_custkey",
            F.when(F.col("cnt") > 1, 1.0).otherwise(0.0).alias("repeated"),
        ),
        ["first_value", "o_custkey"],
        5,
        tile_col="quintile",
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
           -- exact decimal money sums (q01/q411 sf10 class): 30M-row
           -- bands at 1.5e12 magnitude out-noise the cent emission
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                          * (1 - CAST(l_discount AS DECIMAL(3,2)))), 2)
                AS DOUBLE) AS net_revenue,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                          * CAST(l_discount AS DECIMAL(3,2))), 2)
                AS DOUBLE) AS discount_given,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                          * (1 - CAST(l_discount AS DECIMAL(3,2))))
                      AS DOUBLE)
                 / CAST(SUM(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                                * (1 - CAST(l_discount AS DECIMAL(3,2)))))
                        OVER () AS DOUBLE), 6) AS revenue_share
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
    # exact decimal money sums (q01/q411 sf10 class)
    price = F.col("l_extendedprice").cast("decimal(12,2)")
    disc = F.col("l_discount").cast("decimal(3,2)")
    net = F.sum(price * (F.lit(1).cast("decimal(3,2)") - disc))
    agg = li.groupBy(band.alias("discount_band")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        F.round(net, 2).cast("double").alias("net_revenue"),
        F.round(F.sum(price * disc), 2)
        .cast("double")
        .alias("discount_given"),
        net.alias("_net_raw"),
    )
    w = Window.partitionBy()
    return agg.select(
        "discount_band",
        "n_lines",
        "net_revenue",
        "discount_given",
        F.round(
            F.col("_net_raw").cast("double")
            / F.sum("_net_raw").over(w).cast("double"),
            6,
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
      -- exact decimal money sum (q01/q411 sf10 class): the 6M-row
      -- grand total at 3.7e12 magnitude out-noises the cent emission
      SELECT (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
                          AS DOUBLE) FROM orders)
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
        F.sum(F.col("o_totalprice").cast("decimal(12,2)"))
        .cast("double")
        .alias("revenue"),
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
    differences.  Per-doc token/type counts at scan speed; the decile
    over the docs-sized table goes through `sort.global_ntile`
    (range-partitioned, no single-task window)."""
    from graphmapreduce_spark.operators import sort as GS

    d = _t(spark, sf_dir, "documents")
    stats = d.select(
        "doc_id",
        F.size(T.words("text")).alias("n_tokens"),
        F.size(F.array_distinct(T.words("text"))).alias("n_types"),
    ).filter(F.col("n_tokens") > 0)
    tiled = GS.global_ntile(
        stats, ["n_tokens", "doc_id"], 10, tile_col="decile"
    )
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
      -- exact decimal money sums (q01/q411 sf10 class): per-nation
      -- halves are ~2.4M rows at 1e11 magnitude at sf10
      SELECT c.c_nationkey AS nation,
             CASE WHEN epoch(o.o_orderdate) < (SELECT t FROM mid)
                  THEN 'h1' ELSE 'h2' END AS half,
             SUM(CAST(o.o_totalprice AS DECIMAL(12,2))) AS r
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2
    ),
    wide AS (
      SELECT nation,
             SUM(CASE WHEN half = 'h1' THEN r ELSE 0 END) AS r1,
             SUM(CASE WHEN half = 'h2' THEN r ELSE 0 END) AS r2
      FROM rev GROUP BY nation
    ),
    g AS (SELECT CAST(SUM(r2) AS DOUBLE) / CAST(SUM(r1) AS DOUBLE)
                 - 1.0 AS g_tot FROM wide)
    SELECT nation,
           CAST(r2 - r1 AS DOUBLE) AS actual_growth,
           ROUND(CAST(r1 AS DOUBLE) * (SELECT g_tot FROM g), 2)
             AS expected_growth,
           ROUND(CAST(r2 - r1 AS DOUBLE)
                 - CAST(r1 AS DOUBLE) * (SELECT g_tot FROM g), 2)
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
                    F.col("o_totalprice").cast("decimal(12,2)"),
                ).otherwise(F.lit(0).cast("decimal(12,2)"))
            ).alias("r1"),
            F.sum(
                F.when(
                    F.unix_micros(F.col("o_orderdate").cast("timestamp")) >= F.col("t"),
                    F.col("o_totalprice").cast("decimal(12,2)"),
                ).otherwise(F.lit(0).cast("decimal(12,2)"))
            ).alias("r2"),
        )
    )
    rev = rev.localCheckpoint(eager=False)
    g = rev.agg(
        (
            F.sum("r2").cast("double") / F.sum("r1").cast("double")
            - 1.0
        ).alias("g_tot")
    )
    return (
        rev.crossJoin(F.broadcast(g))
        .filter(F.col("r1") > 0)
        .select(
            "nation",
            (F.col("r2") - F.col("r1"))
            .cast("double")
            .alias("actual_growth"),
            F.round(
                F.col("r1").cast("double") * F.col("g_tot"), 2
            ).alias("expected_growth"),
            F.round(
                (F.col("r2") - F.col("r1")).cast("double")
                - F.col("r1").cast("double") * F.col("g_tot"),
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
      -- exact decimal money sum (q01/q411 sf10 class): the grand
      -- total at 3.7e12 out-noises the cent emission as a double
      SELECT COUNT(*)::DOUBLE AS n_orders,
             COUNT(DISTINCT o_custkey)::DOUBLE AS n_customers,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
               AS revenue
      FROM orders
    ),
    l AS (SELECT COUNT(*)::DOUBLE AS n_lines FROM lineitem)
    SELECT CAST(n_orders AS BIGINT) AS n_orders,
           CAST(n_customers AS BIGINT) AS n_customers,
           revenue,
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
        F.sum(F.col("o_totalprice").cast("decimal(12,2)"))
        .cast("double")
        .alias("revenue"),
    )
    l = li.agg(F.count(F.lit(1)).cast("double").alias("n_lines"))
    return o.crossJoin(F.broadcast(l)).select(
        F.col("n_orders").cast("bigint").alias("n_orders"),
        F.col("n_customers").cast("bigint").alias("n_customers"),
        "revenue",
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
           -- exact decimal money sum (q01/q411 sf10 class): 4M-row
           -- buckets at 1e12 magnitude out-noise the cent emission
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
             AS value
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
        F.sum(F.col("o_totalprice").cast("decimal(12,2)"))
        .cast("double")
        .alias("value"),
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
