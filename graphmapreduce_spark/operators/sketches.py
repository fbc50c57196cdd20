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


# ---------------------------------------------------------------------------
# Count-min sketch + Bloom filter as DATAFRAME-NATIVE structures: the
# sketch is itself a (row, bucket, count) / (bucket) table, so building
# is one hash agg, merging is a union + re-agg, and probing is a hash
# join — every step partial-aggregates map-side and nothing ever passes
# through the driver.  Hashes are the portable md5-60bit family
# (functions/text.md5_hash60), so a SQL oracle reproduces the sketch
# bit-for-bit — unlike opaque binary sketch blobs.
# ---------------------------------------------------------------------------
def _bucket_hash(col, salt: int, width: int):
    h = F.conv(
        F.substring(F.md5(F.concat_ws("#", col, F.lit(str(salt)))), 1, 15), 16, 10
    ).cast("long")
    return F.pmod(h, F.lit(width))


def cms_table(
    df: DataFrame,
    value_col: str,
    width: int = 1024,
    depth: int = 4,
) -> DataFrame:
    """Count-min sketch of ``value_col`` as a (d, w, cnt) table —
    ``depth`` salted hash rows x ``width`` buckets.  At most
    depth*width rows regardless of input size; build is one explode
    (depth rows per input) + one map-side-combinable count agg.
    Merge two sketches of the same shape: union + groupBy(d,w) sum."""
    rows = df.select(
        F.posexplode(
            F.array(
                *[_bucket_hash(F.col(value_col), j, width) for j in range(depth)]
            )
        ).alias("d", "w")
    )
    return rows.groupBy("d", "w").agg(F.count(F.lit(1)).alias("cnt"))


def cms_lookup(
    cms: DataFrame,
    probes: DataFrame,
    value_col: str,
    width: int = 1024,
    depth: int = 4,
) -> DataFrame:
    """Point-frequency estimates: (value_col, est) with
    ``est = min_d cnt[d][h_d(x)]`` — the classical CMS upper bound
    (overcounts on collisions, never undercounts).  One hash join of
    the probe rows (x depth) against the sketch table; the sketch side
    is at most depth*width rows, so Spark broadcasts it."""
    pr = probes.select(value_col).distinct()
    keyed = pr.select(
        value_col,
        F.posexplode(
            F.array(
                *[_bucket_hash(F.col(value_col), j, width) for j in range(depth)]
            )
        ).alias("d", "w"),
    )
    return (
        keyed.join(cms, ["d", "w"], "left")
        .groupBy(value_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )


def bloom_table(
    df: DataFrame,
    value_col: str,
    num_bits: int = 8192,
    num_hashes: int = 4,
) -> DataFrame:
    """Bloom filter of ``value_col`` as a table of SET bit positions —
    at most ``num_bits`` rows however large the input.  Build: explode
    each value into its ``num_hashes`` positions, distinct."""
    return df.select(
        F.explode(
            F.array(
                *[
                    _bucket_hash(F.col(value_col), j, num_bits)
                    for j in range(num_hashes)
                ]
            )
        ).alias("bit")
    ).distinct()


def bloom_maybe_contains(
    bloom: DataFrame,
    probes: DataFrame,
    value_col: str,
    num_bits: int = 8192,
    num_hashes: int = 4,
) -> DataFrame:
    """(value_col, maybe) — ``maybe`` true iff ALL hash positions are
    set: false positives possible (rate ~ (1 - e^{-kn/m})^k), false
    negatives impossible.  The join-pruning pattern at 100 TB: build
    the filter from the small side's keys, broadcast these <= num_bits
    rows, and pre-filter the big side before the real shuffle join."""
    pr = probes.select(value_col).distinct()
    keyed = pr.select(
        value_col,
        F.explode(
            F.array(
                *[
                    _bucket_hash(F.col(value_col), j, num_bits)
                    for j in range(num_hashes)
                ]
            )
        ).alias("bit"),
    )
    marked = keyed.join(
        bloom.withColumn("_set", F.lit(1)), "bit", "left"
    )
    return marked.groupBy(value_col).agg(
        (F.count(F.lit(1)) == F.sum(F.coalesce(F.col("_set"), F.lit(0)))).alias(
            "maybe"
        )
    )


def merge_agg_tables(
    base: DataFrame,
    delta: DataFrame,
    group_cols: Sequence[str],
    sum_cols: Sequence[str] = (),
    count_cols: Sequence[str] = (),
    min_cols: Sequence[str] = (),
    max_cols: Sequence[str] = (),
) -> DataFrame:
    """Incremental materialized-aggregate maintenance: merge a delta
    batch's aggregate table into the base aggregate table WITHOUT
    re-scanning history — union + one re-agg over (|base| + |delta|)
    group rows, exactly because count/sum/min/max are algebraic (their
    states merge by the same function).  avg = merged sum / merged
    count downstream; for distinct counts keep an HLL sketch table
    (`hll_sketch_table`) next to this and merge that instead.

    Both inputs must share the (group_cols + metric columns) schema —
    i.e. the delta is aggregated at the same grain first."""
    keys = list(group_cols)
    merged = base.select(*base.columns).unionByName(delta.select(*base.columns))
    aggs = (
        [F.sum(c).alias(c) for c in sum_cols]
        + [F.sum(c).alias(c) for c in count_cols]
        + [F.min(c).alias(c) for c in min_cols]
        + [F.max(c).alias(c) for c in max_cols]
    )
    return merged.groupBy(*keys).agg(*aggs)
