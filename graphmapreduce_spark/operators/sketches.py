"""Mergeable sketches — the pre-aggregation pattern for 100 TB scans.

The reference has no sketching (its only aggregate surface is the
user ``reduce`` over grouped KV lists, ``gmr.h:89``); these are [EXT]
operators mandated by the north star.  The scale story: a distinct
count over 100 TB is one full shuffle of the key column, every time
it's asked.  A *sketch table* pays that scan once per partition-grain
(e.g. per day), stores a few KB per group, and answers every later
rollup (any date range, any group subset) by merging sketches — no
re-scan, and the merge is associative so it partial-aggregates
map-side like any algebraic aggregate.

Built on Spark's Apache DataSketches HLL functions (``hll_sketch_agg``
/ ``hll_union_agg`` / ``hll_sketch_estimate``).  Merging sketches keeps
the accuracy class of the configured ``lgK`` (the union gadget may use
a different internal register encoding than a directly-built sketch, so
estimates can differ by a fraction of a percent — but never degrade
with the number of merge steps; tests bound both the union-vs-direct
drift and the error vs exact distinct).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_LGK = 14  # 2^14 registers ≈ 16 KB / sketch, ~0.8% rel. error


def hll_sketch_table(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    lgk: int = DEFAULT_LGK,
    sketch_col: str = "sketch",
) -> DataFrame:
    """One HLL sketch of ``value_col`` per group — the stored,
    re-mergeable form.  One shuffle on ``group_cols`` with map-side
    partial sketching."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(value_col, F.lit(lgk)).alias(sketch_col)
    )


def hll_rollup(
    sketches: DataFrame,
    group_cols: Sequence[str],
    sketch_col: str = "sketch",
    estimate_col: str = "approx_distinct",
) -> DataFrame:
    """Re-aggregate a sketch table to a coarser grain by merging
    sketches — no base-table access.  Returns ``group_cols`` +
    ``estimate_col`` (LONG)."""
    grouped = (
        sketches.groupBy(*group_cols)
        if group_cols
        else sketches.groupBy()
    )
    return grouped.agg(
        F.hll_sketch_estimate(F.hll_union_agg(sketch_col)).alias(estimate_col)
    )


def approx_distinct_by(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    lgk: int = DEFAULT_LGK,
    estimate_col: str = "approx_distinct",
) -> DataFrame:
    """Direct grouped approximate distinct via one sketch pass
    (convenience wrapper: sketch + estimate, nothing stored)."""
    return hll_rollup(
        hll_sketch_table(df, group_cols, value_col, lgk),
        group_cols,
        estimate_col=estimate_col,
    )


# ---------------------------------------------------------------------
# KLL quantile sketches — mergeable percentiles (Spark 4 DataSketches).
# Same pre-aggregation story as HLL: sketch once per fine grain, answer
# any later quantile rollup by merge, never re-scan the base table.
# ---------------------------------------------------------------------
KLL_DEFAULT_K = 200  # DataSketches default: ~1.65% rank error @ 99% conf


def kll_sketch_table(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    k: int = KLL_DEFAULT_K,
    sketch_col: str = "qsketch",
) -> DataFrame:
    """One KLL(double) quantile sketch of ``value_col`` per group.
    One shuffle on ``group_cols`` with map-side partial sketching."""
    return df.groupBy(*group_cols).agg(
        F.kll_sketch_agg_double(
            F.col(value_col).cast("double"), F.lit(k)
        ).alias(sketch_col)
    )


def kll_quantile_rollup(
    sketches: DataFrame,
    group_cols: Sequence[str],
    quantiles: Sequence[float],
    sketch_col: str = "qsketch",
) -> DataFrame:
    """Merge a KLL sketch table to a coarser grain and read quantiles
    from the merged sketch — no base-table access.  Returns
    ``group_cols`` + one ``q_<pct>`` DOUBLE column per requested
    quantile (rank error bounded by the sketch's k, independent of how
    many merge steps happened)."""
    grouped = (
        sketches.groupBy(*group_cols) if group_cols else sketches.groupBy()
    )
    merged = grouped.agg(F.kll_merge_agg_double(sketch_col).alias("_m"))
    cols = [
        F.kll_sketch_get_quantile_double(F.col("_m"), F.lit(q)).alias(
            f"q_{int(q * 100)}"
        )
        for q in quantiles
    ]
    return merged.select(*[F.col(c) for c in group_cols], *cols)


# ---------------------------------------------------------------------
# Theta sketches — distinct-count SET ALGEBRA across segments.
# "users who did A and B" normally needs a self-join of the fact table;
# with per-segment theta sketches it is a sketch intersection — the
# 100 TB scan happens once, every segment-overlap question after that
# is sketch math.  Below the sketch's nominal capacity (2^lgk entries)
# theta sketches are EXACT, which makes the fixture-scale oracle check
# exact too.
# ---------------------------------------------------------------------
def theta_sketch_table(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    lgk: int = 12,
    sketch_col: str = "tsketch",
) -> DataFrame:
    """One theta sketch of ``value_col`` per group (segment)."""
    return df.groupBy(*group_cols).agg(
        F.theta_sketch_agg(value_col, F.lit(lgk)).alias(sketch_col)
    )


def theta_overlap(
    sketches: DataFrame,
    segment_col: str,
    seg_a: object,
    seg_b: object,
    sketch_col: str = "tsketch",
) -> DataFrame:
    """Distinct-count algebra between two segments from their sketches:
    |A|, |B|, |A ∪ B|, |A ∩ B|, |A \\ B| — one row, no base re-scan,
    no join.  Driver-side work is two sketch lookups (bytes, not rows).
    """
    a = sketches.filter(F.col(segment_col) == F.lit(seg_a)).select(
        F.col(sketch_col).alias("sa")
    )
    b = sketches.filter(F.col(segment_col) == F.lit(seg_b)).select(
        F.col(sketch_col).alias("sb")
    )
    both = a.crossJoin(b)
    est = F.theta_sketch_estimate
    return both.select(
        est(F.col("sa")).cast("long").alias("n_a"),
        est(F.col("sb")).cast("long").alias("n_b"),
        est(F.theta_union(F.col("sa"), F.col("sb"))).cast("long").alias("n_union"),
        est(F.theta_intersection(F.col("sa"), F.col("sb")))
        .cast("long")
        .alias("n_intersect"),
        est(F.theta_difference(F.col("sa"), F.col("sb")))
        .cast("long")
        .alias("n_a_only"),
    )
