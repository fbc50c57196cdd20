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
