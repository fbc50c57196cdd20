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
