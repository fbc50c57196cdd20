"""Global distributed sort — the reference's standalone sample sort.

The reference implements a 7-step distributed sample sort by hand
(``samplesort.cpp:21-191``: local sort → per-rank splitter candidates →
gather p(p-1) candidates → choose global splitters → broadcast →
bucket-partition → Alltoallv → local sort).  Spark's ``orderBy`` runs the
*same algorithm* internally: ``RangePartitioner`` samples the input,
picks balanced range boundaries, shuffles into ranges, sorts within each
partition.  These wrappers exist to name that equivalence, to expose the
partition-count knob, and to provide the sortedness checks the tests
assert.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def global_sort(
    df: DataFrame,
    cols: list[Column | str],
    num_partitions: int | None = None,
) -> DataFrame:
    """Totally ordered DataFrame: range-partitioned then locally sorted
    (partition i's rows all ≤ partition i+1's).  ``repartitionByRange``
    is the explicit splitter step; ``sortWithinPartitions`` the local
    sort — together exactly ref samplesort's plan."""
    if num_partitions:
        df = df.repartitionByRange(num_partitions, *cols)
    else:
        df = df.repartitionByRange(*cols)
    return df.sortWithinPartitions(*cols)


def is_globally_sorted(df: DataFrame, col: str) -> bool:
    """Verification helper: per-partition (min, max, first-ordinal) must
    be non-overlapping and internally sorted."""
    from pyspark.sql.functions import spark_partition_id

    stats = (
        df.select(F.col(col).alias("v"), spark_partition_id().alias("pid"))
        .groupBy("pid")
        .agg(F.min("v").alias("lo"), F.max("v").alias("hi"))
        .orderBy("pid")
        .collect()
    )
    prev_hi = None
    for r in stats:
        if prev_hi is not None and r["lo"] < prev_hi:
            return False
        prev_hi = r["hi"]
    return True


def global_rank(
    df: DataFrame,
    cols: list[Column | str],
    rank_col: str = "rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact global 1-based row_number over a total order WITHOUT a
    single-partition window: range-partition (ref samplesort's splitter
    step), per-partition local row_number, then add each partition's
    global offset.

    The offsets are the per-partition counts cumulated in partition
    order — p rows collected driver-side (cold-path tiny, one row per
    partition) and folded back in as a broadcast join.  Every stage is
    partition-parallel; the plan survives any N because no executor
    ever sees more than its range slice.
    """
    from pyspark.sql import Window
    from pyspark.sql.functions import spark_partition_id

    d = global_sort(df, cols, num_partitions).withColumn(
        "_pid", spark_partition_id()
    )
    w = Window.partitionBy("_pid").orderBy(*cols)
    d = d.withColumn("_lrn", F.row_number().over(w))
    # materialize ONCE before reading it twice: RangePartitioner
    # re-samples split boundaries per execution, so without this the
    # offsets job and the output job could disagree on which partition
    # a row landed in — silently corrupting ranks at scale
    d = d.localCheckpoint(eager=True)
    counts = sorted(
        d.groupBy("_pid").agg(F.count(F.lit(1)).alias("n")).collect(),
        key=lambda r: r["_pid"],
    )
    offsets, acc = [], 0
    for r in counts:
        offsets.append((r["_pid"], acc))
        acc += r["n"]
    spark = df.sparkSession
    off = spark.createDataFrame(offsets, "_pid int, _off long")
    return (
        d.join(F.broadcast(off), "_pid")
        .withColumn(rank_col, F.col("_off") + F.col("_lrn"))
        .drop("_pid", "_lrn", "_off")
    )


def global_ntile(
    df: DataFrame,
    cols: list[Column | str],
    k: int,
    tile_col: str = "tile",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact SQL-NTILE(k) over a global order WITHOUT a
    single-partition window: `global_rank` supplies the distributed
    rank, and the tile falls out of the closed form — the first
    ``n mod k`` tiles hold ``n div k + 1`` rows, the rest ``n div k``
    (identical to ``F.ntile(k).over(Window.orderBy(...))`` whenever
    ``cols`` is a total order; with ties the tile of a tied VALUE can
    differ at the boundary exactly as the window's would).

    Cost beyond the range-partitioned sort: one count() on the
    checkpoint-backed ranked frame — a metadata-sized action.  This is
    the scale path for fact-table quantile bucketing (customer
    deciles, document-length quintiles …) where ``Window.orderBy``
    would funnel the table through one task."""
    ranked = global_rank(df, cols, rank_col="_gnr",
                         num_partitions=num_partitions)
    n = ranked.count()
    q, m = divmod(n, k)
    cut = m * (q + 1)
    r = F.col("_gnr")
    if q > 0:
        # integer `div`, not double division + cast: a correctly-
        # rounded double quotient can round UP across an integer
        # boundary for ranks near 2^53 and silently mis-tile — same
        # exactness discipline as global_cumsum's >2^53 handling below
        tile = (
            F.when(
                r <= cut, F.expr(f"(_gnr - 1) div {q + 1}")
            ).otherwise(F.lit(m) + F.expr(f"(_gnr - 1 - {cut}) div {q}"))
            + 1
        )
    else:
        tile = r
    return ranked.withColumn(
        tile_col, tile.cast("int")
    ).drop("_gnr")


def global_cumsum(
    df: DataFrame,
    cols: list[Column | str],
    value_col: str,
    cum_col: str = "cum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact ``SUM(value) OVER (ORDER BY cols ROWS UNBOUNDED
    PRECEDING)`` without a single-partition window: range-partition on
    the order (ref samplesort's splitter step), per-partition local
    running sum, then fold in each partition's prefix total — the same
    two-level pattern as `global_rank` and the packing cumsum
    (one p-row driver collect, every heavy stage partition-parallel).

    This is the scale path for the dimension-collapsed cumulative
    family (ABC / Lorenz / Pareto / cumulative-share plans): 'collapsed
    to parts/users' is still billions of rows at 100 TB, where
    ``Window.orderBy`` funnels the dimension through one task."""
    from pyspark.sql import Window
    from pyspark.sql.functions import spark_partition_id

    d = global_sort(df, cols, num_partitions).withColumn(
        "_pid", spark_partition_id()
    )
    w = (
        Window.partitionBy("_pid")
        .orderBy(*cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    d = d.withColumn("_lcs", F.sum(value_col).over(w))
    # materialize before the two reads (offsets job + output job) —
    # RangePartitioner re-samples per execution (see global_rank)
    d = d.localCheckpoint(eager=True)
    sums = sorted(
        d.groupBy("_pid").agg(F.sum(value_col).alias("s")).collect(),
        key=lambda r: r["_pid"],
    )
    # offsets keep the SUM's own dtype: long sums stay exact integers
    # (a double offset would silently lose exactness past 2^53 —
    # reachable row/token counts at the 100 TB target), DECIMAL sums
    # stay exact decimals (the q411 sf10 lesson: a double running sum
    # over fact-scale money accumulates summation-order noise past the
    # emitted cent precision), doubles stay doubles
    sum_type = dict(
        d.groupBy("_pid").agg(F.sum(value_col).alias("s")).dtypes
    )["s"]
    is_integral = sum_type in ("bigint", "int", "smallint", "tinyint")
    is_decimal = sum_type.startswith("decimal")
    offsets = []
    if is_integral:
        zero = 0
    elif is_decimal:
        import decimal as _dec

        zero = _dec.Decimal(0)
    else:
        zero = 0.0
    acc = zero
    for r in sums:
        offsets.append((r["_pid"], acc))
        acc += r["s"] if r["s"] is not None else zero
    spark = df.sparkSession
    off_type = "bigint" if is_integral else (
        sum_type if is_decimal else "double"
    )
    off = spark.createDataFrame(offsets, f"_pid int, _off {off_type}")
    return (
        d.join(F.broadcast(off), "_pid")
        .withColumn(cum_col, F.col("_off") + F.col("_lcs"))
        .drop("_pid", "_lcs", "_off")
    )


def equi_depth_histogram(
    df: DataFrame,
    value_col: str,
    tiebreak_cols: list[str],
    buckets: int = 10,
) -> DataFrame:
    """Exact equal-frequency (NTILE) histogram: ``(bucket, n, lo, hi)``
    with SQL NTILE semantics — the first ``N mod buckets`` buckets get
    one extra row — computed from `global_rank`, so no single-partition
    window anywhere.  ``tiebreak_cols`` must make the order total, or
    bucket boundaries at ties become engine-dependent."""
    order = [value_col, *tiebreak_cols]
    ranked = global_rank(df.select(*order), order, rank_col="_r")
    n = ranked.count()
    q, m = divmod(n, buckets)
    # NTILE: rank r (1-based) -> bucket; first m buckets hold q+1 rows
    cut = m * (q + 1)
    bucket = (
        F.when(F.col("_r") <= cut, (F.col("_r") - 1) / (q + 1))
        .otherwise(m + (F.col("_r") - cut - 1) / q)
        .cast("long")
        + 1
    ) if q > 0 else F.col("_r")
    return (
        ranked.withColumn("bucket", bucket)
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min(value_col).alias("lo"),
            F.max(value_col).alias("hi"),
        )
    )
