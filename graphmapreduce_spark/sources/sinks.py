"""Sinks.  The reference can only print to stdout (``printResult``,
``gmr.h:102``; ``displayGraph`` ``graph.h:121-155``) — no file writer
exists.  Here: parquet/csv/json writers with partitioning control, plus
a stdout `show` passthrough for parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    max_records_per_file: int | None = None,
) -> None:
    """Parquet sink — the native at-scale format.  ``partition_by`` gives
    directory-partitioned layout (partition pruning on read);
    ``max_records_per_file`` bounds file sizes for downstream splits."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", str(max_records_per_file))
    w.parquet(path)


def write_csv(
    df: DataFrame, path: str, mode: str = "overwrite", header: bool = True
) -> None:
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table: rows hash-clustered into ``num_buckets``
    files per partition on ``bucket_cols``.

    This is the persistent form of co-located joins — two tables
    bucketed identically on the join key join WITHOUT any Exchange (the
    shuffle happened once at write time).  At 100 TB this converts every
    recurring fact⋈fact join on the bucket key from a full shuffle into
    a per-bucket merge; add ``sort_cols`` to also skip the sort of a
    sort-merge join."""
    w = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.format("parquet").saveAsTable(table)


def show(df: DataFrame, n: int = 20, truncate: bool = True) -> None:
    """stdout sink (ref printResult parity)."""
    df.show(n=n, truncate=truncate)


def compact_parquet(
    spark,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_cols: list[str] | None = None,
) -> int:
    """Small-file compaction: rewrite a parquet directory into files of
    roughly ``target_file_bytes`` — the maintenance job every streaming
    / incremental sink needs, because a thousand 1 MB files cost a 100
    TB reader far more in open/footer overhead and scheduler tasks than
    one 1 GB file.  File count = ceil(input_bytes / target); optional
    ``sort_cols`` clusters within the rewrite (pair with
    `layout.cluster_by_zorder` for multi-dim layouts).

    Writes to a sibling temp dir first and swaps only after success, so
    a failed compaction never destroys the input.  Returns the new file
    count."""
    import math
    import shutil
    import uuid

    df = spark.read.parquet(path)
    # size the rewrite from the Hadoop listing — O(#files) metadata
    # only, no data scan
    total = 0
    fs = spark._jvm.org.apache.hadoop.fs.Path(path).getFileSystem(
        spark._jsc.hadoopConfiguration()
    )
    it = fs.listFiles(spark._jvm.org.apache.hadoop.fs.Path(path), True)
    while it.hasNext():
        f = it.next()
        if f.getPath().getName().endswith(".parquet"):
            total += f.getLen()
    n_files = max(1, math.ceil(total / target_file_bytes))
    out = df.repartition(n_files)
    if sort_cols:
        out = out.sortWithinPartitions(*sort_cols)
    tmp = f"{path.rstrip('/')}__compact_{uuid.uuid4().hex[:8]}"
    out.write.mode("overwrite").parquet(tmp)
    shutil.rmtree(path)
    shutil.move(tmp, path)
    return n_files


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Columnar ORC sink — same predicate-pushdown/column-pruning class
    as parquet on the read side; exists so the engine covers every
    columnar format Spark ships natively."""
    df.write.mode(mode).orc(path)
