"""Data sources: graph-file readers and tabular source helpers."""

from graphmapreduce_spark.sources.edgelist_datasource import (  # noqa: F401
    EdgeListDataSource,
)
from graphmapreduce_spark.sources.graph_readers import (  # noqa: F401
    read_edge_list,
    read_metis,
    read_subgraph_files,
)
from graphmapreduce_spark.sources.media import read_media_dir  # noqa: F401
from graphmapreduce_spark.sources.xml_io import (  # noqa: F401
    read_xml,
    write_xml,
)
