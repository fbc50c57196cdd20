"""Relational operators: thin, tested, scale-conscious wrappers."""

from graphmapreduce_spark.operators.relational import (  # noqa: F401
    asof_join,
    range_join,
    theta_join,
    top_k,
    top_k_per_group,
)
from graphmapreduce_spark.operators.sketches import (  # noqa: F401
    approx_distinct_by,
    hll_rollup,
    hll_sketch_table,
)
