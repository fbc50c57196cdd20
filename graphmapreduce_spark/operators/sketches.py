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
