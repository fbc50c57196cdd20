"""Shared registry + helpers for the query modules.

The registry (QUERIES / register / queries / oracle_sql / _t) and the
common imports every domain module star-imports.  __all__ includes the
underscore helpers deliberately — the domain modules are one logical
registry split by domain, not a public API surface.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from graphmapreduce_spark.functions import text as T
from graphmapreduce_spark.functions import vectors as V
from graphmapreduce_spark.graph import PropertyGraph
from graphmapreduce_spark.graph import algorithms as alg
from graphmapreduce_spark.operators._time import normalize_ts as _normalize_ts
from graphmapreduce_spark.operators import dedup as D
from graphmapreduce_spark.operators import multimodal as M
from graphmapreduce_spark.operators import packing as PK
from graphmapreduce_spark.operators import relational as R
from graphmapreduce_spark.operators import sampling as SMP
from graphmapreduce_spark.operators import similarity as S
from graphmapreduce_spark.operators import sketches as SK
from graphmapreduce_spark.operators import timeseries as TS
from graphmapreduce_spark.operators.relational import asof_join, top_k_per_group
from graphmapreduce_spark.streaming import session_agg, sliding_agg, tumbling_agg

QUERIES: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {}


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # events.ts varies by fixture build: TIMESTAMP(NANOS) (read as
        # long under nanosAsLong; values are µs-aligned so the integer
        # ns→µs div is lossless), TIMESTAMP_MICROS isAdjustedToUTC=0
        # (Spark TIMESTAMP_NTZ, which watermarks and bigint casts
        # reject), or plain TIMESTAMP.  Normalize every shape to
        # session-TZ TIMESTAMP (session TZ is UTC) so downstream epoch
        # math matches DuckDB's epoch(ts) on the same file.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        return _normalize_ts(spark.read.parquet(path), "ts")
    return spark.read.parquet(path)


def register(name: str, sql: str | None):
    def deco(fn):
        QUERIES[name] = (fn, sql)
        return fn

    return deco


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {k: v[0] for k, v in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {k: v[1] for k, v in QUERIES.items() if v[1] is not None}


# =====================================================================
# Relational core
# =====================================================================

__all__ = [
    "os",
    "Callable",
    "DataFrame",
    "SparkSession",
    "F",
    "Window",
    "T",
    "V",
    "PropertyGraph",
    "alg",
    "_normalize_ts",
    "D",
    "M",
    "PK",
    "R",
    "SMP",
    "S",
    "SK",
    "TS",
    "asof_join",
    "top_k_per_group",
    "session_agg",
    "sliding_agg",
    "tumbling_agg",
    "QUERIES",
    "_t",
    "register",
    "queries",
    "oracle_sql",
]
