"""Query plans: the registered workload (queries + DuckDB oracles)."""

from graphmapreduce_spark.plans.workload import QUERIES, oracle_sql, queries  # noqa: F401
