"""Analytics arc A: packing/sharding, quality audits, time-series, graph extensions.

Part 6/11 of the query registry (split from the former single-file
workload.py); importing this module registers its queries in
``plans._shared.QUERIES``.
"""

from graphmapreduce_spark.plans._shared import *  # noqa: F401,F403
from graphmapreduce_spark.plans.w02_graph_queries import _mod_graph  # noqa: F401
from graphmapreduce_spark.plans.w04_streaming_queries import _run_stream_to_table  # noqa: F401
from graphmapreduce_spark.plans.w05_corpus_ops import _MD5_BUCKET  # noqa: F401

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
             -- exact integer cents (q429/q418 discipline): the
             -- unordered partition total and the cumulative sum feed
             -- a strict 80%-threshold comparison, which double-SUM
             -- ulp noise can flip when a part lands on the boundary
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) * 100
                  AS BIGINT) AS rev,
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
           MIN(CASE WHEN 5 * cum >= 4 * tot THEN rn END)::BIGINT
             AS parts_for_80pct,
           ROUND(MIN(CASE WHEN 5 * cum >= 4 * tot THEN rn END)
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
        (F.sum(F.col("l_extendedprice").cast("decimal(18,2)")) * 100)
        .cast("long")
        .alias("rev")
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
    hit = F.when(5 * F.col("cum") >= 4 * F.col("tot"), F.col("rn"))
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
    t AS (SELECT UNNEST([0.5, 0.6, 0.7, 0.8, 0.9])::DOUBLE AS threshold)
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
    FROM res ORDER BY ROUND(abs_resid, 6) DESC, event_id ASC LIMIT 25
    """,
)
def q222_regression_outliers(spark, sf_dir):
    """Model-based anomaly detection: the 25 events farthest from
    their user's own OLS trend line — q205's sufficient-statistics fit
    broadcast back onto the scan, residuals ranked by TakeOrdered.
    Flags the 'right value, wrong trajectory' anomalies a global
    z-score misses.  The top-k rank runs on the ROUNDED residual
    (+ event_id) on both sides: sf1's replicated users produce
    residual ties that differ only in last-ulp float noise, so a
    raw-value order is engine-dependent at the k boundary."""
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
        res.withColumn("_r6", F.round("_r", 6))
        .orderBy(F.desc("_r6"), F.asc("event_id"))
        .limit(25)
        .select("event_id", "user_id", F.col("_r6").alias("abs_resid"))
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


def _coreness_oracle_sql(rounds: int = 30) -> str:
    """Unrolled h-index propagation (Lü et al. 2016): c₀ = degree,
    cₜ(v) = H(cₜ₋₁(u) : u∈N(v)) — the fixpoint IS coreness, and extra
    rounds past convergence are no-ops, so a fixed unroll with margin
    (measured 25 rounds at sf0.01) is value-exact.  H computed as
    COUNT(nc >= rank-desc) — the same #{i : xs[i] >= i} expression the
    Spark plan evaluates in codegen."""
    steps = []
    for k in range(1, rounds + 1):
        steps.append(
            f"""n{k} AS (
      SELECT s.src AS id, c.c AS nc,
             ROW_NUMBER() OVER (PARTITION BY s.src
                                ORDER BY c.c DESC) AS rn
      FROM sym s JOIN c{k - 1} c ON c.id = s.dst
    ),
    c{k} AS MATERIALIZED (
      SELECT id, CAST(COUNT(*) FILTER (WHERE nc >= rn) AS BIGINT) AS c
      FROM n{k} GROUP BY id
    )"""
        )
    body = ",\n    ".join(steps)
    return f"""
    WITH und AS MATERIALIZED (
      SELECT DISTINCT LEAST(l_orderkey % 5000, l_partkey % 5000) AS src,
                      GREATEST(l_orderkey % 5000,
                               l_partkey % 5000) AS dst
      FROM lineitem
      WHERE l_orderkey % 5000 <> l_partkey % 5000
    ),
    sym AS MATERIALIZED (
      SELECT src, dst FROM und UNION ALL SELECT dst, src FROM und
    ),
    c0 AS MATERIALIZED (
      SELECT src AS id, CAST(COUNT(*) AS BIGINT) AS c
      FROM sym GROUP BY src
    ),
    {body}
    SELECT id, c AS coreness FROM c{rounds}
    """


@register("q237_coreness", _coreness_oracle_sql())
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


_DIAMETER_ORACLE_SQL = """
    WITH RECURSIVE und AS MATERIALIZED (
      SELECT DISTINCT LEAST(l_orderkey % 5000, l_partkey % 5000) AS src,
                      GREATEST(l_orderkey % 5000,
                               l_partkey % 5000) AS dst
      FROM lineitem
      WHERE l_orderkey % 5000 <> l_partkey % 5000
    ),
    sym AS MATERIALIZED (
      SELECT src, dst FROM und UNION ALL SELECT dst, src FROM und
    ),
    s1 AS MATERIALIZED (SELECT MIN(src) AS s FROM sym),
    b1(id, d) AS (
      SELECT s, 0 FROM s1
      UNION
      SELECT e.dst, b.d + 1
      FROM b1 b JOIN sym e ON e.src = b.id
      WHERE b.d < 12
    ),
    lv1 AS MATERIALIZED (
      SELECT id, MIN(d) AS level FROM b1 GROUP BY id
    ),
    far AS MATERIALIZED (
      SELECT id FROM lv1 ORDER BY level DESC, id ASC LIMIT 1
    ),
    b2(id, d) AS (
      SELECT id, 0 FROM far
      UNION
      SELECT e.dst, b.d + 1
      FROM b2 b JOIN sym e ON e.src = b.id
      WHERE b.d < 12
    ),
    lv2 AS MATERIALIZED (
      SELECT id, MIN(d) AS level FROM b2 GROUP BY id
    )
    SELECT CAST((SELECT s FROM s1) AS BIGINT) AS start_id,
           CAST((SELECT id FROM far) AS BIGINT) AS peripheral_id,
           CAST(MAX(level) AS BIGINT) AS diameter_lb
    FROM lv2
    """


@register("q238_diameter_double_sweep", _DIAMETER_ORACLE_SQL)
# Two chained frontier-BFS runs, each a recursive CTE bounded by a
# depth cap (measured eccentricity 4 at sf0.01; cap 12 = 3x margin —
# levels past the true eccentricity add no (id, d) pairs with a
# smaller MIN, so the cap is value-exact whenever it exceeds the true
# eccentricity).  Peripheral pick replicates the (max level, min id)
# tiebreak.  Pytest goldens (trees/cycle/star) remain.
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
    WITH c AS (SELECT vec_id, label, embedding::DOUBLE[] AS v,
                      -- norms hoisted out of the pair loop: same
                      -- doubles, ~3x less work — the per-pair form
                      -- ground >80 min at sf1, this one takes 75 s
                      sqrt(list_sum(list_transform(
                        embedding::DOUBLE[], x -> x * x))) AS nrm
               FROM embeddings),
    q AS (SELECT * FROM c WHERE vec_id % 5 = 0),
    corpus AS (SELECT * FROM c WHERE vec_id % 5 <> 0),
    scored AS (
      SELECT q.vec_id AS qid, q.label AS true_label,
             corpus.vec_id AS nid, corpus.label AS pred,
             -- zero-norm guard mirrors V.cosine on the Spark side:
             -- a zero embedding scores 0.0 on BOTH engines instead
             -- of NULL/inf here vs 0.0 there
             ROUND(CASE WHEN q.nrm > 0 AND corpus.nrm > 0
                   THEN list_sum(list_transform(range(1, len(q.v) + 1),
                                   i -> q.v[i] * corpus.v[i]))
                        / (q.nrm * corpus.nrm)
                   ELSE 0.0 END, 4)
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
    # norms hoisted out of the pair loop (mirrors the oracle): same
    # doubles — sqrt(dot(v,v)) per VECTOR once, not per pair — 3x less
    # work inside the broadcast-join hot loop
    c = emb.select(
        "vec_id",
        "label",
        F.col("embedding").cast("array<double>").alias("v"),
        V.norm(F.col("embedding").cast("array<double>")).alias("nrm"),
    )
    q = c.filter(F.col("vec_id") % 5 == 0).select(
        F.col("vec_id").alias("qid"),
        F.col("label").alias("true_label"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qnrm"),
    )
    corpus = c.filter(F.col("vec_id") % 5 != 0).select(
        F.col("vec_id").alias("nid"),
        F.col("label").alias("pred"),
        F.col("v").alias("cv"),
        F.col("nrm").alias("cnrm"),
    )
    scored = corpus.join(F.broadcast(q)).select(
        "qid",
        "true_label",
        "nid",
        "pred",
        F.round(
            F.when(
                (F.col("qnrm") > 0) & (F.col("cnrm") > 0),
                V.dot(F.col("qv"), F.col("cv"))
                / (F.col("qnrm") * F.col("cnrm")),
            ).otherwise(F.lit(0.0)),
            4,
        ).alias("cosine"),
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


def _greedy_coloring_oracle_sql(colors: int = 18, rounds: int = 8) -> str:
    """Unrolled MIS-peeling mirror of ``alg.greedy_coloring``.

    Measured depths (the mod-4000 fixture graph DENSIFIES with scale,
    so the peel deepens): sf0.01 → 4 colors / max 3 MIS rounds;
    sf0.1 → 9 / 5; sf1 → 13 / 6.  Unrolled to 18×8 so every validated
    scale carries margin — a color past peel-out sees an empty vertex
    set and a MIS round past drain sees an empty active set, so every
    extra block is a no-op and the fixed unroll is value-exact at any
    scale whose depth fits it (scales beyond sf1 need re-measuring:
    the fixture approaches a dense graph whose chromatic depth keeps
    growing).  Priorities replicate ``md5_hash60(id || ':mis')``
    bit-for-bit via DuckDB ``('0x' || substr(md5(...), 1, 15))::
    BIGINT``."""
    blocks = []
    for c in range(colors):
        blocks.append(f"""a{c}_0 AS MATERIALIZED (
      SELECT id,
             ('0x' || substr(md5(id::VARCHAR || ':mis'), 1, 15))::BIGINT
               AS pri
      FROM v{c}
    ),
    se{c}_0 AS MATERIALIZED (
      SELECT DISTINCT src, dst FROM (
        SELECT src, dst FROM g{c}
        UNION ALL SELECT dst AS src, src AS dst FROM g{c}
      ) WHERE src <> dst
    )""")
        for r in range(1, rounds + 1):
            blocks.append(f"""w{c}_{r} AS MATERIALIZED (
      SELECT a.id FROM a{c}_{r - 1} a LEFT JOIN (
        SELECT s.dst AS id, MIN(a2.pri) AS mn
        FROM se{c}_{r - 1} s JOIN a{c}_{r - 1} a2 ON a2.id = s.src
        GROUP BY s.dst) m ON m.id = a.id
      WHERE m.mn IS NULL OR a.pri < m.mn
    ),
    rm{c}_{r} AS MATERIALIZED (
      SELECT DISTINCT id FROM (
        SELECT id FROM w{c}_{r}
        UNION ALL
        SELECT s.dst AS id
        FROM se{c}_{r - 1} s JOIN w{c}_{r} w ON w.id = s.src)
    ),
    a{c}_{r} AS MATERIALIZED (
      SELECT a.* FROM a{c}_{r - 1} a
      WHERE a.id NOT IN (SELECT id FROM rm{c}_{r})
    ),
    se{c}_{r} AS MATERIALIZED (
      SELECT s.* FROM se{c}_{r - 1} s
      WHERE s.src IN (SELECT id FROM a{c}_{r})
        AND s.dst IN (SELECT id FROM a{c}_{r})
    )""")
        mis_union = "\n        UNION ALL ".join(
            f"SELECT id FROM w{c}_{r}" for r in range(1, rounds + 1)
        )
        blocks.append(f"""mis{c} AS MATERIALIZED (
      SELECT DISTINCT id FROM ({mis_union})
    ),
    v{c + 1} AS MATERIALIZED (
      SELECT id FROM v{c} WHERE id NOT IN (SELECT id FROM mis{c})
    ),
    g{c + 1} AS MATERIALIZED (
      SELECT g.* FROM g{c} g
      WHERE g.src IN (SELECT id FROM v{c + 1})
        AND g.dst IN (SELECT id FROM v{c + 1})
    )""")
    body = ",\n    ".join(blocks)
    hist = "\n      UNION ALL ".join(
        f"SELECT {c} AS color, COUNT(*)::BIGINT AS n_vertices "
        f"FROM mis{c} HAVING COUNT(*) > 0"
        for c in range(colors)
    )
    return f"""
    WITH e0 AS MATERIALIZED (
      SELECT DISTINCT l_orderkey % 4000 AS src, l_partkey % 4000 AS dst
      FROM lineitem
      WHERE l_quantity <= 2 AND l_orderkey % 4000 <> l_partkey % 4000
    ),
    v0 AS MATERIALIZED (
      SELECT DISTINCT id FROM (
        SELECT src AS id FROM e0 UNION ALL SELECT dst FROM e0)
    ),
    g0 AS MATERIALIZED (SELECT src, dst FROM e0),
    {body}
    SELECT color, n_vertices FROM ({hist})
    ORDER BY color
    """


@register("q261_graph_coloring", _greedy_coloring_oracle_sql())
def q261_graph_coloring(spark, sf_dir):
    """Distributed greedy vertex coloring (iterative deterministic-MIS
    peeling) of the sparse lineitem graph, reported as a color
    histogram — the conflict-free scheduling primitive (a color class
    is a set of vertices safe to update concurrently).  Value-oracled
    via the unrolled MIS-peel mirror (hash priorities make the peel a
    pure function of the graph); the properness/Δ+1 invariants stay
    pinned by tests/test_graph_algorithms.py."""
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
    # hoist the norm to ONE per vector: cosine's norms are pair-
    # invariant, so computing them inside the pair stream would run the
    # (interpreted, non-codegen) array aggregate once per PAIR side —
    # ~band× more higher-order-function work for identical doubles
    # (same array, same fold order).  r07: 2.8 s → 0.7 s at sf0.1.
    e = e.withColumn("_n", V.norm("v"))
    # bucket blocking turns the band predicate into an EQUI join (the
    # band_join technique): b in (a, a+50] implies floor(b/50) is
    # floor(a/50) or +1, so a 2× explode on one side replaces the
    # nested-loop theta join with a hash join + residual filter
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    bk = F.floor(F.col("vec_id") / 50).cast("long")
    a = e.select(
        F.col("vec_id").alias("ida"),
        F.col("label").alias("la"),
        F.col("v").alias("va"),
        F.col("_n").alias("na"),
        F.explode(F.array(bk, bk + 1)).alias("_bk"),
        # spread the probe side before the pair fan-out: a few-file
        # embedding table scans as one partition and the whole
        # pair-cosine stage would run on a single core
    ).repartition(n_part, "ida")
    b = e.select(
        F.col("vec_id").alias("idb"),
        F.col("label").alias("lb"),
        F.col("v").alias("vb"),
        F.col("_n").alias("nb"),
        bk.alias("_bk"),
    )
    cosv = F.when(
        (F.col("na") > 0) & (F.col("nb") > 0),
        V.dot("va", "vb") / (F.col("na") * F.col("nb")),
    ).otherwise(F.lit(0.0))
    pairs = (
        a.join(b, "_bk")
        .filter(
            (F.col("idb") > F.col("ida"))
            & (F.col("idb") <= F.col("ida") + 50)
        )
        .select(
            (F.col("la") == F.col("lb")).alias("same"),
            F.round(cosv, 4).alias("cosine"),
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
    # per-vector norm hoist + pre-fan-out spread, exactly as q260 (the
    # norms are pair-invariant; the doubles are bit-identical)
    e = e.withColumn("_nf", V.norm("v")).withColumn(
        "_nh", V.norm(half(F.col("v")))
    )
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    # same bucket-blocking equi-join as q260 (band 25)
    bk = F.floor(F.col("vec_id") / 25).cast("long")
    a = e.select(
        F.col("vec_id").alias("ida"),
        F.col("v").alias("va"),
        F.col("_nf").alias("nfa"),
        F.col("_nh").alias("nha"),
        F.explode(F.array(bk, bk + 1)).alias("_bk"),
    ).repartition(n_part, "ida")
    b = e.select(
        F.col("vec_id").alias("idb"),
        F.col("v").alias("vb"),
        F.col("_nf").alias("nfb"),
        F.col("_nh").alias("nhb"),
        bk.alias("_bk"),
    )
    cos_full = F.when(
        (F.col("nfa") > 0) & (F.col("nfb") > 0),
        V.dot("va", "vb") / (F.col("nfa") * F.col("nfb")),
    ).otherwise(F.lit(0.0))
    cos_half = F.when(
        (F.col("nha") > 0) & (F.col("nhb") > 0),
        V.dot(half(F.col("va")), half(F.col("vb")))
        / (F.col("nha") * F.col("nhb")),
    ).otherwise(F.lit(0.0))
    pairs = (
        a.join(b, "_bk")
        .filter(
            (F.col("idb") > F.col("ida"))
            & (F.col("idb") <= F.col("ida") + 25)
        )
        .select(
            F.round(cos_full, 4).alias("cos_full"),
            F.round(cos_half, 4).alias("cos_half"),
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
    nk AS (SELECT k, CAST(SUM(CASE WHEN d > k THEN nd ELSE 0 END)
                          AS BIGINT) AS n_nodes
           FROM grid CROSS JOIN dh GROUP BY k),
    ek AS (SELECT k, CAST(SUM(CASE WHEN m > k THEN ne ELSE 0 END)
                          AS BIGINT) AS n_edges
           FROM grid CROSS JOIN em GROUP BY k)
    SELECT nk.k, nk.n_nodes, COALESCE(ek.n_edges, 0) AS n_edges,
           CAST(ROUND(2000000.0 * COALESCE(ek.n_edges, 0)
                      / (nk.n_nodes * (nk.n_nodes - 1))) AS BIGINT)
             AS phi_micro
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
            # integer-scaled micro-units: the density ratio is a
            # division of exact BIGINTs (deterministic IEEE double on
            # any engine) rounded to an integer — no raw double ever
            # reaches the driver's value hash (round-5 hash-fail fix)
            F.round(
                2000000.0
                * F.coalesce("n_edges", F.lit(0))
                / (F.col("n_nodes") * (F.col("n_nodes") - 1))
            )
            .cast("long")
            .alias("phi_micro"),
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
    sims AS (SELECT UNNEST([0.5, 0.7, 0.8, 0.9])::DOUBLE AS s)
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
           CAST(SUM(CASE WHEN p.day IS NULL THEN 0 ELSE 1 END)
                AS BIGINT) AS days_present,
           CAST(SUM(CASE WHEN p.day IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_missing_days
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
