"""Data-quality audit — Deequ-style constraint metrics as one narrow
summary table, because a 100 TB ingest needs its gate checks computed
in the SAME pass discipline as everything else: each family is a single
aggregate over the table (no per-rule rescans), emitting
(check, metric) rows a policy layer can threshold.

[EXT] inventory: the reference has no data-quality surface; these are
the checks the north-star pipeline runs before training data ships.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def completeness(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """(check, metric): non-null fraction per column — ALL columns in
    ONE aggregate pass (each is a map-side-combinable avg), then a
    stack() unpivot of the 1-row result.  metric == 1.0 means no nulls.
    """
    aggs = [
        F.avg(F.col(c).isNotNull().cast("double")).alias(c) for c in cols
    ]
    one = df.agg(*aggs)
    pairs = ", ".join(f"'completeness:{c}', `{c}`" for c in cols)
    return one.selectExpr(
        f"stack({len(cols)}, {pairs}) AS (`check`, metric)"
    ).select("check", F.round("metric", 6).alias("metric"))


def uniqueness(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """(check, metric): distinct/total fraction per candidate key —
    1.0 certifies a primary key.  One aggregate pass; count_distinct
    partial-aggregates map-side like any algebraic aggregate."""
    aggs = [
        (F.count_distinct(F.col(c)) / F.count(F.lit(1)))
        .cast("double")
        .alias(c)
        for c in cols
    ]
    one = df.agg(*aggs)
    pairs = ", ".join(f"'uniqueness:{c}', `{c}`" for c in cols)
    return one.selectExpr(
        f"stack({len(cols)}, {pairs}) AS (`check`, metric)"
    ).select("check", F.round("metric", 6).alias("metric"))


def referential_integrity(
    child: DataFrame,
    parent: DataFrame,
    fk: str,
    pk: str,
    label: str = "fk",
) -> DataFrame:
    """(check, metric): fraction of child rows whose foreign key
    resolves in the parent.  A left-semi join (broadcast when the
    parent's key projection is small) counted against the child total —
    never a row-multiplying inner join, so duplicate parent keys can't
    inflate the metric."""
    total = child.agg(F.count(F.lit(1)).alias("n"))
    matched = child.join(
        parent.select(F.col(pk).alias(fk)), fk, "left_semi"
    ).agg(F.count(F.lit(1)).alias("m"))
    return total.crossJoin(matched).select(
        F.lit(f"integrity:{label}").alias("check"),
        F.round(F.col("m") / F.col("n"), 6).alias("metric"),
    )


def audit(parts: Sequence[DataFrame]) -> DataFrame:
    """Union the per-family summaries into one (check, metric) report —
    each part is already a tiny aggregate, so the union is free."""
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def iqr_outliers(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    k: float = 1.5,
) -> DataFrame:
    """Tukey-fence outlier flagging per group: rows outside
    [q1 - k*IQR, q3 + k*IQR] of their group's exact quartiles get
    ``is_outlier`` true.  Two passes: one sort-based percentile agg per
    group (tiny result), joined back over the scan — the join
    broadcasts whenever the group count does, so the flagging pass
    stays shuffle-free on the fact side."""
    keys = list(group_cols)
    fences = df.groupBy(*keys).agg(
        F.percentile(value_col, F.lit(0.25)).alias("_q1"),
        F.percentile(value_col, F.lit(0.75)).alias("_q3"),
    )
    lo = F.col("_q1") - k * (F.col("_q3") - F.col("_q1"))
    hi = F.col("_q3") + k * (F.col("_q3") - F.col("_q1"))
    return (
        df.join(F.broadcast(fences), keys)
        .withColumn(
            "is_outlier", (F.col(value_col) < lo) | (F.col(value_col) > hi)
        )
        .drop("_q1", "_q3")
    )


def gopher_rules(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_words: int = 50,
    max_words: int = 100_000,
    min_avg_len: float = 3.0,
    max_avg_len: float = 10.0,
    min_alpha_frac: float = 0.8,
    max_bullet_frac: float = 0.9,
    min_stopword_hits: int = 2,
) -> DataFrame:
    """Gopher-style document quality rules (Rae et al. 2021, table A1 —
    the standard pretraining-corpus repetition/format gates), computed
    as pure Column expressions in ONE narrow pass: word-count bounds,
    mean word length, alphabetic-word fraction, bulleted-line fraction,
    and a distinct-stopword floor.  Returns the per-doc metrics plus a
    ``keep`` verdict so the policy layer can threshold or re-weight
    without re-scanning.

    Zero UDFs, zero shuffles — every rule is a higher-order-function
    expression over the split arrays, so the filter runs at scan speed
    and pipelines into whatever consumes it."""
    c = F.col(text_col)
    ws = F.filter(F.split(F.trim(c), "\\s+"), lambda w: w != "")
    nw = F.size(ws)
    # mean word length from the space-stripped char count (identical
    # arithmetic is replayable in SQL without per-word aggregation)
    nonspace = F.length(F.regexp_replace(c, "\\s", ""))
    avg_len = F.when(nw > 0, nonspace.cast("double") / nw).otherwise(0.0)
    alpha = F.size(F.filter(ws, lambda w: w.rlike("[A-Za-z]")))
    alpha_frac = F.when(nw > 0, alpha.cast("double") / nw).otherwise(0.0)
    lines = F.split(c, "\n")
    nl = F.size(lines)
    bullets = F.size(F.filter(lines, lambda x: x.rlike(r"^\s*[-*•]")))
    bullet_frac = F.when(nl > 0, bullets.cast("double") / nl).otherwise(0.0)
    low = F.transform(ws, lambda w: F.lower(w))
    stop_hits = sum(
        F.array_contains(low, sw).cast("int")
        for sw in ("the", "be", "to", "of", "and", "that", "have", "with")
    )
    out = df.select(
        F.col(id_col),
        nw.alias("n_words"),
        F.round(avg_len, 6).alias("avg_word_len"),
        F.round(alpha_frac, 6).alias("alpha_frac"),
        F.round(bullet_frac, 6).alias("bullet_frac"),
        stop_hits.cast("long").alias("stop_hits"),
    )
    return out.withColumn(
        "keep",
        (F.col("n_words") >= min_words)
        & (F.col("n_words") <= max_words)
        & (F.col("avg_word_len") >= min_avg_len)
        & (F.col("avg_word_len") <= max_avg_len)
        & (F.col("alpha_frac") >= min_alpha_frac)
        & (F.col("bullet_frac") <= max_bullet_frac)
        & (F.col("stop_hits") >= min_stopword_hits),
    )


def winsorize(
    df: DataFrame,
    group_cols: Sequence[str],
    val_col: str,
    lo_p: float = 0.05,
    hi_p: float = 0.95,
    out_col: str | None = None,
) -> DataFrame:
    """Per-group winsorization: clip ``val_col`` to its group's
    [lo_p, hi_p] exact percentiles (linear interpolation — the
    ``percentile``/``quantile_cont`` semantics shared by engines).
    Appends ``out_col`` (default ``<val>_wins``) plus the bounds.

    Two-pass shape that scales: one agg computes the per-group bounds
    (a tiny table — broadcast), one map-side join clips.  No window
    sort of the full data, no UDF."""
    out_col = out_col or f"{val_col}_wins"
    groups = list(group_cols)
    bounds = df.groupBy(*groups).agg(
        F.expr(f"percentile({val_col}, {lo_p})").alias("_lo"),
        F.expr(f"percentile({val_col}, {hi_p})").alias("_hi"),
    )
    j = df.join(F.broadcast(bounds), groups)
    return j.withColumn(
        out_col, F.greatest(F.col("_lo"), F.least(F.col("_hi"), F.col(val_col)))
    ).withColumnRenamed("_lo", f"{val_col}_lo").withColumnRenamed(
        "_hi", f"{val_col}_hi"
    )


def chi_squared(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """One-row (chi2 DOUBLE, dof BIGINT) Pearson chi-squared statistic
    of independence between two categorical columns — observed
    contingency counts vs the product-marginal expectation.

    Three aggs over the same pass discipline as `audit` (cell counts,
    two marginals — each a tiny table) + broadcast joins; nothing
    larger than the category cross product ever materializes."""
    cells = df.groupBy(col_a, col_b).agg(F.count(F.lit(1)).alias("_o"))
    ra = df.groupBy(col_a).agg(F.count(F.lit(1)).alias("_ra"))
    rb = df.groupBy(col_b).agg(F.count(F.lit(1)).alias("_rb"))
    n = df.count()
    # expected = ra*rb/n for EVERY (a, b) pair, including empty cells
    # (obs=0 still contributes exp to the statistic)
    grid = ra.crossJoin(rb)
    full = grid.join(F.broadcast(cells), [col_a, col_b], "left").select(
        (F.col("_ra") * F.col("_rb") / F.lit(float(n))).alias("_e"),
        F.coalesce("_o", F.lit(0)).alias("_o"),
    )
    stat = full.agg(
        F.sum(F.pow(F.col("_o") - F.col("_e"), 2) / F.col("_e")).alias("chi2")
    )
    dof = (ra.count() - 1) * (rb.count() - 1)
    return stat.select("chi2", F.lit(int(dof)).alias("dof"))


def unigram_surprisal(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Per-document mean unigram-LM surprisal — the CCNet/RedPajama
    perplexity-filter shape with the corpus itself as the language
    model: score(d) = mean over tokens w of -ln(count(w) / N).

    Low scores = stereotypical token distributions (boilerplate,
    word-salad spam skews low too at the extreme); high scores = rare
    vocabulary.  Used as a quality band-pass in pretraining pipelines.

    Plan: one tokenize+explode, one vocabulary hash agg (Zipf-bounded:
    vocabulary grows ~O(corpus^0.7), and AQE broadcasts it back onto
    the token stream when it fits), the scalar N folded in as a
    broadcast 1-row cross join, then one per-doc agg on the id key.
    Two keyed shuffles total (vocab, doc) regardless of corpus size.

    Returns (id_col, n_tokens, surprisal) — surprisal rounded to 6
    decimals so float summation-order differences between engines
    cannot leak into value comparisons.
    """
    from graphmapreduce_spark.functions.text import words

    # spread by id before the tokenize+explode fan-out (consumed by BOTH
    # the vocab agg and the scoring join — the exchange is reused, the
    # explode above it parallelizes): a few-file corpus would otherwise
    # tokenize serially, twice.  Whitespace tokenizing is cheap, so the
    # win is small at sf0.1 (0.42 → 0.40 s warm A/B) — kept because it
    # removes the layout hazard, not for the local seconds.  Input-
    # parallelism-gated (operators/_spread.py): no corpus shuffle when
    # the scan already parallelizes.
    from graphmapreduce_spark.operators._spread import spread_by

    tok = spread_by(
        df.select(F.col(id_col), F.lower(F.col(text_col)).alias("_lt")),
        F.col(id_col),
    ).select(F.col(id_col), F.explode(words(F.col("_lt"))).alias("_w"))
    vocab = tok.groupBy("_w").agg(F.count(F.lit(1)).alias("_cnt"))
    total = vocab.agg(F.sum("_cnt").alias("_n"))
    return (
        tok.join(vocab, "_w")
        .crossJoin(F.broadcast(total))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(
                F.avg(-F.log(F.col("_cnt").cast("double") / F.col("_n"))), 6
            ).alias("surprisal"),
        )
    )


def bigram_surprisal(
    df: DataFrame, id_col: str, text_col: str, k: float = 1.0
) -> DataFrame:
    """Per-document mean bigram-LM surprisal with add-k smoothing — one
    step up the n-gram ladder from `unigram_surprisal`, the closer match
    to the KenLM-scored perplexity filters (CCNet, RedPajama-v2) that
    gate pretraining corpora:

        score(d) = mean over adjacent pairs (w1,w2) of
                   -ln( (c(w1,w2) + k) / (c(w1,·) + k·V) )

    with c from the corpus itself and V the corpus vocabulary size.
    Swapping in an external LM means replacing the two count tables
    with broadcast model tables — the plan shape is identical.

    Plan: the bigram stream is built in-array (token array lambda-bound
    once, struct pairs, no self-join) and exploded once; bigram and
    left-context counts are two hash aggs over it (Zipf-bounded, AQE
    broadcasts them back when small); V is a broadcast 1-row scalar.
    Documents with fewer than 2 tokens carry no bigrams and are absent.

    Returns (id_col, n_bigrams, surprisal), surprisal rounded to 6.
    """
    from graphmapreduce_spark.functions.text import words

    w0 = words(F.lower(F.col(text_col)))
    pairs = F.transform(
        F.array(w0),
        lambda w: F.when(
            F.size(w) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size(w) - 1),
                lambda i: F.struct(
                    F.element_at(w, i).alias("w1"),
                    F.element_at(w, i + 1).alias("w2"),
                ),
            ),
        ).otherwise(
            F.array().cast("array<struct<w1:string,w2:string>>")
        ),
    )[0]
    bg = df.select(F.col(id_col), F.explode(pairs).alias("_p")).select(
        id_col, F.col("_p.w1").alias("_w1"), F.col("_p.w2").alias("_w2")
    )
    vocab_n = (
        df.select(F.explode(words(F.lower(F.col(text_col)))).alias("_t"))
        .agg(F.countDistinct("_t").cast("double").alias("_v"))
    )
    cb = bg.groupBy("_w1", "_w2").agg(F.count(F.lit(1)).alias("_cb"))
    cl = bg.groupBy("_w1").agg(F.count(F.lit(1)).alias("_cl"))
    return (
        bg.join(cb, ["_w1", "_w2"])
        .join(cl, "_w1")
        .crossJoin(F.broadcast(vocab_n))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(
                F.avg(
                    -F.log(
                        (F.col("_cb") + F.lit(k))
                        / (F.col("_cl") + F.lit(k) * F.col("_v"))
                    )
                ),
                6,
            ).alias("surprisal"),
        )
    )


def benford_audit(df: DataFrame, value_col: str) -> DataFrame:
    """First-significant-digit distribution vs Benford's law — the
    classic fabricated-data / unit-mixing audit for positive magnitude
    columns.  Returns ``(digit, n, freq, expected, deviation)`` with
    ``expected = log10(1 + 1/digit)`` and deviation the absolute gap.

    One 9-row hash agg (map-side combined) + a broadcast 1-row total —
    scan-speed at any table size.  Rows with non-positive values are
    excluded (they have no leading significant digit).
    """
    d = (
        df.filter(F.col(value_col) > 0)
        .select(
            F.substring(
                F.floor(F.col(value_col)).cast("string"), 1, 1
            )
            .cast("int")
            .alias("digit")
        )
        # values in (0,1) floor to digit 0 — excluded: this audit reads
        # integer-magnitude columns (amounts, counts, populations)
        .filter(F.col("digit") > 0)
    )
    counts = d.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    total = counts.agg(F.sum("n").cast("double").alias("_t"))
    expected = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "digit",
            "n",
            F.round(F.col("n") / F.col("_t"), 6).alias("freq"),
            F.round(expected, 6).alias("expected"),
            F.round(F.abs(F.col("n") / F.col("_t") - expected), 6).alias(
                "deviation"
            ),
        )
    )


def skew_report(df: DataFrame, key_cols: Sequence[str]) -> DataFrame:
    """One-row key-skew diagnostic for a prospective join/agg key:
    ``(n_rows, n_keys, max_n, top_share, entropy)`` — the decision
    input for reaching for `relational.salted_join` / AQE skew
    handling.  ``top_share`` is the hottest key's row fraction;
    ``entropy`` the Shannon entropy (nats) of the key distribution
    (ln n_keys = perfectly even).

    One map-side-combined count agg to |keys| rows, then a single
    1-row collapse — the per-key table never leaves the executors.
    """
    counts = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("_n"))
    # -Σ (n/N)·ln(n/N)  ==  ln N − (Σ n·ln n)/N — the right side is one
    # algebraic aggregate, no second normalization pass over the keys
    n_tot = F.sum("_n").cast("double")
    return counts.agg(
        F.sum("_n").alias("n_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("_n").alias("max_n"),
        F.round(F.max("_n") / n_tot, 6).alias("top_share"),
        F.round(
            F.log(n_tot)
            - F.sum(F.col("_n") * F.log(F.col("_n"))) / n_tot,
            6,
        ).alias("entropy"),
    )
