"""Generate the persisted mdual-scale graph fixture (VERDICT r05 task
7): the reference names mdual at 258,569 vertices / 513,132 edges
(`graph/README.md:22`) but its blobs are missing upstream, so this is a
deterministic synthetic stand-in at EXACTLY those counts — a ring over
all vertices (connectivity + one component) plus hash-offset chords
from the first 254,563 vertices (513,132 − 258,569), each guaranteed
non-self by construction (offset ∈ [1, N−1]).

The fixture pins the graph-family regression numbers to a stable input:
`tests/test_large_graph_stress.py` reads it when present and falls back
to regenerating THROUGH THIS MODULE, so fixture and regen can never
drift apart.

Usage: python tools/make_mdual_fixture.py  [writes FIXTURE_PATH]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

MDUAL_NVTX = 258_569
MDUAL_NEDGE = 513_132
FIXTURE_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "testdata_fixtures",
    "mdual_edges.parquet",
)


def mdual_edges(spark):
    """The deterministic edge list: exactly MDUAL_NEDGE rows over
    exactly MDUAL_NVTX vertices (1-based ids), one connected
    component, O(log n) diameter."""
    n = MDUAL_NVTX
    n_chords = MDUAL_NEDGE - n
    base = spark.range(1, n + 1).select(F.col("id").alias("src"))
    ring = base.select("src", (F.col("src") % n + 1).alias("dst"))
    # offset in [1, n-1] => dst != src, always; count exact by src cap
    chord_src = base.filter(F.col("src") <= n_chords)
    chords = chord_src.select(
        "src",
        (
            (F.col("src") - 1 + 1 + F.pmod(F.xxhash64("src"), F.lit(n - 1)))
            % n
            + 1
        ).alias("dst"),
    )
    return ring.unionByName(chords).withColumn("weight", F.lit(1.0))


def main() -> int:
    from graphmapreduce_spark.session import get_spark

    spark = get_spark(
        master="local[8]", shuffle_partitions=8, app_name="mdual-fixture"
    )
    edges = mdual_edges(spark)
    n_edges = edges.count()
    n_verts = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
        .count()
    )
    assert n_edges == MDUAL_NEDGE, n_edges
    assert n_verts == MDUAL_NVTX, n_verts
    edges.coalesce(1).write.mode("overwrite").parquet(FIXTURE_PATH)
    print(f"wrote {FIXTURE_PATH}: {n_verts} vertices, {n_edges} edges")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
