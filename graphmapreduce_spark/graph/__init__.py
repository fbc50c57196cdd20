"""Graph data model, Pregel BSP driver and graph algorithms."""

from graphmapreduce_spark.graph.partitioning import (  # noqa: F401
    edge_cut,
    locality_partition,
    repartition_by_assignment,
)
from graphmapreduce_spark.graph.property_graph import PropertyGraph  # noqa: F401
from graphmapreduce_spark.graph.pregel import Pregel, UpdateMode  # noqa: F401
