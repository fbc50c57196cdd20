"""Time-series regularization: resample onto a fixed grid + gap fill.

The reference has no time-series surface (its `events`-style workloads
stop at sort+reduce, ``gmr.h:160-189``); this is [EXT] inventory for the
metrics/telemetry shape every large pipeline carries: irregular event
streams → fixed-interval series with gaps filled, so downstream windowed
models see a dense matrix.

Everything is expression-level (sequence/explode/window) — no UDF, no
driver loop.  Scale shape: one shuffle on the series key carries the
bucket agg, the grid join, and the fill windows; the grid itself is
generated in-plan per key (`sequence()`), so the operator never
materializes a driver-side calendar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from graphmapreduce_spark.operators import _time


def resample_ffill(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    val_col: str,
    step_seconds: int,
    fill: str = "ffill",
) -> DataFrame:
    """Resample each key's series onto a ``step_seconds`` grid spanning
    [floor(min ts), floor(max ts)] and fill empty buckets.

    Bucket value = the observation with the greatest (ts, tiebreak row)
    inside the bucket — "last known value at bucket close".  ``fill``:

    - ``"ffill"`` — carry the last non-null bucket value forward;
      leading buckets before the first observation stay NULL (nothing
      to carry).  The standard telemetry/as-of semantics.
    - ``"zero"``  — empty buckets become 0.0 (event-count-like series).
    - ``"none"``  — leave gaps NULL (caller interpolates).

    Output: (key_col, bucket_start BIGINT epoch-seconds, val_col).
    Epochs stay integral end-to-end (memory: fractional-second epochs
    round differently across engines).
    """
    if fill not in ("ffill", "zero", "none"):
        raise ValueError(f"unknown fill mode: {fill}")
    step = int(step_seconds)
    # type-robust epoch extraction: TIMESTAMP_NTZ rejects cast("long")
    tsec = _time.epoch_seconds(df, ts_col)
    obs = df.select(
        F.col(key_col).alias("_k"),
        (F.floor(tsec / step) * step).cast("long").alias("bucket_start"),
        tsec.alias("_ts"),
        F.col(val_col).cast("double").alias("_v"),
    )
    # last observation per bucket: max_by on the raw epoch; ties broken
    # by value so the winner is engine-independent
    per_bucket = obs.groupBy("_k", "bucket_start").agg(
        F.max(F.struct(F.col("_ts"), F.col("_v"))).alias("_w")
    ).select("_k", "bucket_start", F.col("_w._v").alias("_v"))
    # per-key grid, generated in-plan: sequence() is a few ints per key,
    # exploded executor-side — no driver calendar, no cross join
    grid = obs.groupBy("_k").agg(
        F.min("bucket_start").alias("_lo"), F.max("bucket_start").alias("_hi")
    ).select(
        "_k",
        F.explode(
            F.sequence(F.col("_lo"), F.col("_hi"), F.lit(step))
        ).alias("bucket_start"),
    )
    dense = grid.join(per_bucket, ["_k", "bucket_start"], "left")
    if fill == "ffill":
        w = (
            Window.partitionBy("_k")
            .orderBy("bucket_start")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        dense = dense.withColumn("_v", F.last("_v", ignorenulls=True).over(w))
    elif fill == "zero":
        dense = dense.withColumn("_v", F.coalesce(F.col("_v"), F.lit(0.0)))
    return dense.select(
        F.col("_k").alias(key_col), "bucket_start", F.col("_v").alias(val_col)
    )


def time_weighted_avg(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    val_col: str,
    bucket_seconds: int,
) -> DataFrame:
    """Per-key time-weighted average (TWAP) over fixed buckets: each
    observation's weight is the time it remained current — until the
    key's next observation, clamped to the bucket edge; the last
    observation in a bucket carries to the bucket end.  The standard
    telemetry/finance aggregate where plain AVG over irregular samples
    is biased toward bursts.

    One keyed shuffle carries both the lead() window and the bucket
    agg.  Accepts TIMESTAMP / TIMESTAMP_NTZ / integral-epoch ``ts_col``
    (see `_time.epoch_seconds`).  Output: (key_col, bucket_start BIGINT,
    twap DOUBLE).
    """
    step = int(bucket_seconds)
    tsec = _time.epoch_seconds(df, ts_col)
    obs = df.select(
        F.col(key_col).alias("_k"),
        tsec.alias("_ts"),
        F.col(val_col).cast("double").alias("_v"),
    ).withColumn(
        "bucket_start", (F.floor(F.col("_ts") / step) * step).cast("long")
    )
    w = Window.partitionBy("_k").orderBy("_ts", "_v")
    nxt = F.lead("_ts").over(w)
    bucket_end = F.col("bucket_start") + step
    dt = (
        F.least(F.coalesce(nxt, bucket_end), bucket_end) - F.col("_ts")
    ).cast("double")
    weighted = obs.withColumn("_dt", dt)
    return (
        weighted.groupBy(F.col("_k").alias(key_col), "bucket_start")
        .agg(
            (F.sum(F.col("_v") * F.col("_dt")) / F.sum("_dt")).alias("twap")
        )
    )


def ewma(
    df: DataFrame,
    key_col: str,
    order_cols,
    val_col: str,
    alpha: float = 0.5,
    k: int = 5,
    out_col: str = "ewma",
) -> DataFrame:
    """Finite-window exponentially weighted moving average: per key, the
    last ``k`` observations weighted (1-alpha)^age and renormalized over
    the weights actually present (series heads use fewer terms).  The
    truncated form of the recursive EWMA — expressible as ``k`` unrolled
    ``lag()`` terms over ONE window, so the whole smoother is a single
    keyed shuffle with no recursion, no UDF, and an exact SQL replica.

    ``order_cols`` must be a deterministic total order (add a unique
    tiebreak column — ties make lag() engine-dependent).
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    w = Window.partitionBy(key_col).orderBy(*order_cols)
    v = F.col(val_col).cast("double")
    num = F.lit(0.0)
    den = F.lit(0.0)
    for j in range(k):
        lagged = F.lag(v, j).over(w)
        wt = float((1.0 - alpha) ** j)
        num = num + F.when(lagged.isNotNull(), F.lit(wt) * lagged).otherwise(0.0)
        den = den + F.when(lagged.isNotNull(), F.lit(wt)).otherwise(0.0)
    return df.withColumn(out_col, num / den)


def retention_cohorts(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    bucket_seconds: int = 86400,
) -> DataFrame:
    """Cohort retention matrix: users grouped by their FIRST activity
    bucket (the cohort), counted as retained in every later bucket they
    reappear in.  Output (cohort BIGINT, bucket_offset BIGINT,
    n_users BIGINT) — the standard product-analytics triangle.

    One keyed agg derives each user's cohort, one broadcastless join
    tags activity rows, one distinct-agg counts — the user key carries
    all three on the same partitioning."""
    step = int(bucket_seconds)
    tsec = _time.epoch_seconds(df, ts_col)
    act = df.select(
        F.col(user_col).alias("_u"),
        ((F.floor(tsec / step)) * step).cast("long").alias("_b"),
    ).distinct()
    cohort = act.groupBy("_u").agg(F.min("_b").alias("_c"))
    tagged = act.join(cohort, "_u")
    return (
        tagged.groupBy(
            F.col("_c").alias("cohort"),
            ((F.col("_b") - F.col("_c")) / step).cast("long")
            .alias("bucket_offset"),
        )
        .agg(F.count_distinct("_u").alias("n_users"))
    )


def resample_interpolate(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    val_col: str,
    step_seconds: int,
) -> DataFrame:
    """Resample each key's series onto a ``step_seconds`` grid with
    LINEAR interpolation between the surrounding observations — the
    sensor-fusion / feature-alignment complement of `resample_ffill`
    (step-function semantics) : grid value = v_prev + (v_next − v_prev)
    · (t − t_prev)/(t_next − t_prev); a grid point coinciding with an
    observation returns that observation exactly; points before the
    first or after the last observation stay NULL (no extrapolation).

    Plan: observations collapse to one row per (key, second) (max value
    — engine-independent tie winner), the per-key grid is generated
    in-plan by sequence(), and ONE keyed shuffle carries both bracketing
    windows (previous-observation via an obs-first ordering, next via
    grid-first, so a coincident observation brackets from both sides).
    No joins, no driver calendar.

    Output: (key_col, bucket_start BIGINT epoch-seconds, val_col
    DOUBLE rounded to 6dp — float ratio arithmetic must not leak
    engine last-bit differences into value comparisons).
    """
    step = int(step_seconds)
    tsec = _time.epoch_seconds(df, ts_col)
    obs = (
        df.select(
            F.col(key_col).alias("_k"),
            tsec.alias("_t"),
            F.col(val_col).cast("double").alias("_v"),
        )
        .groupBy("_k", "_t")
        .agg(F.max("_v").alias("_v"))
        .select("_k", "_t", "_v", F.lit(1).alias("_o"))
    )
    grid = (
        obs.groupBy("_k")
        .agg(
            (F.floor(F.min("_t") / step) * step).cast("long").alias("_lo"),
            (F.floor(F.max("_t") / step) * step).cast("long").alias("_hi"),
        )
        .select(
            "_k",
            F.explode(
                F.sequence(F.col("_lo"), F.col("_hi"), F.lit(step))
            ).alias("_t"),
            F.lit(None).cast("double").alias("_v"),
            F.lit(0).alias("_o"),
        )
    )
    u = obs.unionByName(grid)
    obs_first = (
        Window.partitionBy("_k")
        .orderBy(F.col("_t"), F.col("_o").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    grid_first = (
        Window.partitionBy("_k")
        .orderBy(F.col("_t"), F.col("_o").asc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    ot = F.when(F.col("_o") == 1, F.col("_t"))
    ov = F.when(F.col("_o") == 1, F.col("_v"))
    bracketed = u.select(
        "_k",
        "_t",
        "_o",
        F.last(ot, ignorenulls=True).over(obs_first).alias("_pt"),
        F.last(ov, ignorenulls=True).over(obs_first).alias("_pv"),
        F.first(ot, ignorenulls=True).over(grid_first).alias("_nt"),
        F.first(ov, ignorenulls=True).over(grid_first).alias("_nv"),
    ).filter(F.col("_o") == 0)
    interp = F.when(
        F.col("_pt").isNull() | F.col("_nt").isNull(), F.lit(None)
    ).when(F.col("_nt") == F.col("_pt"), F.col("_pv")).otherwise(
        F.col("_pv")
        + (F.col("_nv") - F.col("_pv"))
        * (F.col("_t") - F.col("_pt"))
        / (F.col("_nt") - F.col("_pt"))
    )
    return bracketed.select(
        F.col("_k").alias(key_col),
        F.col("_t").alias("bucket_start"),
        F.round(interp, 6).alias(val_col),
    )
