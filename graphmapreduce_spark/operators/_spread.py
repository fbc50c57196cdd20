"""Input-parallelism-gated corpus spreads.

Several text operators repartition the (id, text) corpus by id before a
per-token fan-out (shingle/gram/token explode): a corpus read from FEW
files scans as few partitions, and the fan-out — the dominant cost of
those operators — would otherwise run serially (measured r07: q153
0.57 → 0.17 s, q167 4.5 → 1.9 s at sf0.1 on the single-row-group
fixture files).

But the spread is a LAYOUT fix, not an algorithmic need: at 100 TB the
scan is already parallel (thousands of files, split further by
``spark.sql.files.maxPartitionBytes``) and an unconditional repartition
would shuffle the full text payload for nothing (VERDICT r07 item 2).
``spread_by`` therefore repartitions ONLY when the source's file count
cannot reach the session's shuffle parallelism — the observable,
plan-time proxy for scan parallelism (splittable multi-row-group files
can exceed it, in which case the spread is merely redundant, never
wrong).  Non-file sources (in-memory test frames, checkpointed RDDs)
report no files and keep the spread — the safe default for exactly the
single-blob layouts the spread exists to fix.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame


def spread_by(df: DataFrame, key: Column | str, n_part: int | None = None) -> DataFrame:
    """Hash-repartition ``df`` by ``key`` into the session's shuffle
    partition count — unless the frame's file sources already provide
    at least that many scan splits, in which case ``df`` is returned
    unchanged (the scan parallelizes by itself and the shuffle would be
    pure cost)."""
    spark = df.sparkSession
    n = n_part or int(spark.conf.get("spark.sql.shuffle.partitions"))
    try:
        files = df.inputFiles()
    except Exception:
        files = []
    if files and len(files) >= n:
        return df
    return df.repartition(n, key)
