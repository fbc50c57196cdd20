"""Data layout for scan pruning — Z-order (Morton) clustering.

At 100 TB the cheapest scan is the one that never happens: parquet
readers skip whole files/row-groups whose column min/max can't match
the predicate.  Sorting clusters ONE column; interleaving the bits of
several (the Z-order curve) keeps EVERY interleaved column's per-file
range narrow, so multi-dimensional point/range filters prune files on
any of them.  This is the same layout trick Delta/Iceberg OPTIMIZE
ZORDER applies; here it is a pure column expression + repartitionByRange,
so it works on plain parquet.

[EXT]: the reference has no storage layout surface (one graph file per
job); this serves SURVEY §2's sink family.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(cols: Sequence[Column | str], bits: int = 16) -> Column:
    """Morton key interleaving the low ``bits`` of each column —
    col0 bit b lands at position b*ncols, col1 at b*ncols+1, ...
    Inputs must already be non-negative ints scaled to [0, 2^bits)
    (rank/bucket upstream); higher bits are masked off.  Pure integer
    expression (shift/and/or terms), whole-stage-codegen friendly, and
    reproducible in any engine with the same arithmetic."""
    n = len(cols)
    if n == 0:
        raise ValueError("zorder_key needs at least one column")
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    terms = []
    for i, c in enumerate(cs):
        x = c.cast("long")
        for b in range(bits):
            terms.append(
                F.shiftleft(
                    F.shiftright(x, b).bitwiseAND(F.lit(1)), b * n + i
                )
            )
    out = terms[0]
    for t in terms[1:]:
        out = out.bitwiseOR(t)
    return out


def cluster_by_zorder(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 16,
    num_partitions: int | None = None,
    key_col: str = "_z",
) -> DataFrame:
    """Range-partition + sort the frame along the Z-curve of ``cols``
    so a subsequent parquet write yields files whose min/max are narrow
    in EVERY clustered column.  One range shuffle (sampled boundaries)
    + per-partition sort; the key column is dropped from the result."""
    keyed = df.withColumn(key_col, zorder_key(cols, bits))
    parted = (
        keyed.repartitionByRange(num_partitions, key_col)
        if num_partitions
        else keyed.repartitionByRange(key_col)
    )
    return parted.sortWithinPartitions(key_col).drop(key_col)
