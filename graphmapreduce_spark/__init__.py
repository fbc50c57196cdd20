"""graphmapreduce_spark — a PySpark-native analytics engine.

A from-scratch, DataFrame-first re-expression of the query and
data-processing capabilities of the reference GraphMapReduce engine
(vertex-centric BSP graph computation: PageRank / SSSP / TriangleCount
and a generic map-sort-reduce operator surface, reference ``gmr.h:77-108``),
extended with the relational, text/dedup, similarity-search and streaming
operators a large-scale training-data pipeline needs.

Design: declare logical plans with the DataFrame/SQL API and let
Catalyst + Tungsten choose physical strategies.  Python driver loops only
orchestrate iterations (Pregel supersteps); all data movement is Spark
shuffles.  No RDDs on hot paths; Python UDFs only where built-in
expressions genuinely cannot express the semantics (and then Arrow-batched).
"""

__version__ = "0.1.0"

from graphmapreduce_spark.session import get_spark  # noqa: F401
