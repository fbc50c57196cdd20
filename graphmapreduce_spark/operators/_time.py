"""Timestamp-type normalization shared by the time-aware operators.

Parquet event-time columns show up in three physical forms depending on
the writer: TIMESTAMP_MICROS with isAdjustedToUTC=1 (Spark TIMESTAMP /
LTZ), isAdjustedToUTC=0 (Spark TIMESTAMP_NTZ), and raw int64 nanos
(Spark reads as BIGINT under ``spark.sql.legacy.parquet.nanosAsLong``).
Operators that do epoch arithmetic (`sessionize`, `resample_ffill`,
`interval_join`) must accept all three: NTZ in particular rejects a
direct ``cast("bigint")`` and ``withWatermark``.

With ``spark.sql.session.timeZone=UTC`` (set by
`graphmapreduce_spark.session`), NTZ→TIMESTAMP interprets the wall clock
as UTC, matching DuckDB's ``epoch(ts)`` on the same file.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def normalize_ts(df: DataFrame, col: str) -> DataFrame:
    """Return ``df`` with ``col`` coerced to session-TZ TIMESTAMP.

    BIGINT is interpreted as epoch *nanoseconds* (the nanosAsLong shape;
    values are µs-aligned so integer div is lossless); TIMESTAMP_NTZ is
    reinterpreted in the session time zone; TIMESTAMP and DATE pass
    through as a plain cast.
    """
    dt = dict(df.dtypes).get(col)
    if dt == "bigint":
        return df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
    if dt != "timestamp":
        return df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def epoch_seconds(df: DataFrame, col: str) -> Column:
    """Epoch seconds (truncating, BIGINT) for ``col`` regardless of its
    physical timestamp type.

    BIGINT is epoch *nanoseconds* — the same nanosAsLong contract as
    `normalize_ts` (the two helpers must agree, or a raw int64-nanos
    column fed to sessionize/time_weighted_avg/retention_cohorts would
    silently produce buckets wrong by 1e9)."""
    dt = dict(df.dtypes).get(col)
    c = F.col(col)
    if dt == "timestamp_ntz":
        c = c.cast("timestamp")
    elif dt == "bigint":
        return F.expr(f"{col} div 1000000000")
    return c.cast("long")
