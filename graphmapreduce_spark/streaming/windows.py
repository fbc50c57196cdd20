"""Event-time window aggregations.

The reference has no streaming surface (SURVEY.md §0.1); these are the
[EXT] Structured Streaming operators.  Each aggregation is written
against a plain DataFrame so the *same function* runs in two modes:

- batch: over the parquet `events` table — DuckDB-oracle verifiable;
- streaming: over `readStream` input — identical code path, plus
  watermarks (`with_watermark`) for state cleanup / late-data policy.

That one-definition-two-modes property is exactly Structured Streaming's
design (incrementalized batch plans), so "verified in batch" carries to
the stream.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _windowed(
    df: DataFrame,
    window_col: Column,
    group_cols: list[str] | None,
    aggs: list[Column] | None,
    start_name: str,
    end_name: str,
) -> DataFrame:
    aggs = aggs or [F.count(F.lit(1)).alias("n")]
    group_cols = group_cols or []
    out = df.groupBy(window_col.alias("w"), *[F.col(c) for c in group_cols]).agg(*aggs)
    rest = [c for c in out.columns if c != "w"]
    return out.select(
        F.col("w.start").alias(start_name),
        F.col("w.end").alias(end_name),
        *rest,
    )


def tumbling_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    group_cols: list[str] | None = None,
    aggs: list[Column] | None = None,
) -> DataFrame:
    """Tumbling window aggregation; emits window_start/window_end."""
    return _windowed(
        df, F.window(ts_col, duration), group_cols, aggs, "window_start", "window_end"
    )


def sliding_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: str,
    group_cols: list[str] | None = None,
    aggs: list[Column] | None = None,
) -> DataFrame:
    """Sliding (hopping) window aggregation — each event lands in
    duration/slide overlapping windows."""
    return _windowed(
        df,
        F.window(ts_col, duration, slide),
        group_cols,
        aggs,
        "window_start",
        "window_end",
    )


def session_agg(
    df: DataFrame,
    ts_col: str,
    gap: str,
    group_cols: list[str],
    aggs: list[Column] | None = None,
) -> DataFrame:
    """Session windows: events within ``gap`` of each other merge into one
    session; session end = last event + gap (Spark `session_window`
    semantics, reproducible in SQL as a gaps-and-islands query)."""
    return _windowed(
        df,
        F.session_window(ts_col, gap),
        group_cols,
        aggs,
        "session_start",
        "session_end",
    )


def with_watermark(df: DataFrame, ts_col: str, delay: str) -> DataFrame:
    """Watermark wrapper (streaming mode): bounds state for windowed aggs
    and defines the late-data drop policy.  No-op semantics in batch."""
    return df.withWatermark(ts_col, delay)


def stream_events_from_parquet(
    spark, path: str, schema=None, max_files_per_trigger: int = 1
):
    """File-source stream over a parquet directory — the replayable
    fixture stream used in tests (each micro-batch = one file)."""
    reader = spark.readStream.format("parquet").option(
        "maxFilesPerTrigger", max_files_per_trigger
    )
    if schema is not None:
        reader = reader.schema(schema)
    else:
        static = spark.read.parquet(path)
        reader = reader.schema(static.schema)
    return reader.load(path)


def dedup_within_watermark(
    df: DataFrame, key_cols: list[str], ts_col: str, delay: str
) -> DataFrame:
    """Streaming exact dedup with bounded state:
    `dropDuplicatesWithinWatermark` on the key columns."""
    wm = df.withWatermark(ts_col, delay)
    return wm.dropDuplicatesWithinWatermark(key_cols)


def stream_to_parquet(
    stream_df: DataFrame,
    path: str,
    checkpoint_dir: str,
    partition_by: list[str] | None = None,
    available_now: bool = True,
):
    """Exactly-once parquet file sink: offsets + file-commit log live in
    ``checkpoint_dir``, so a restarted query resumes from the last
    committed batch and readers never see partial files (the commit log
    is the read manifest).  ``available_now=True`` drains the source and
    stops — the batch-backfill mode; ``False`` runs continuously.

    Returns the StreamingQuery (caller awaits/stops it)."""
    w = (
        stream_df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if partition_by:
        w = w.partitionBy(*partition_by)
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def stream_upsert_to_parquet(
    stream_df: DataFrame,
    path: str,
    checkpoint_dir: str,
    key_cols: list[str],
    available_now: bool = True,
):
    """foreachBatch MERGE sink: each micro-batch type-1 upserts into a
    parquet target (read current -> `merge_upsert` -> overwrite) — the
    keyed-sink pattern for CDC compaction when no ACID table format is
    available.  Restart-safe: the checkpoint skips committed batches,
    and replaying a committed batch is idempotent because upserting the
    same keys twice is a no-op.

    The merged result is materialized (localCheckpoint) BEFORE the
    overwrite, so the plan never reads the files it is replacing.
    Requires each micro-batch to hold at most one row per key (enforce
    upstream with dropDuplicates/last-write-wins).

    Returns the StreamingQuery (caller awaits/stops it)."""
    from graphmapreduce_spark.operators.relational import merge_upsert

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        try:
            base = spark.read.parquet(path)
            merged = merge_upsert(base, batch_df, key_cols)
        except Exception:  # first batch: no target yet
            merged = batch_df
        merged.localCheckpoint(eager=True).write.mode("overwrite").parquet(path)

    w = stream_df.writeStream.foreachBatch(apply_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()
