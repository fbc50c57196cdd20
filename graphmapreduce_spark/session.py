"""SparkSession construction with scale-oriented defaults.

The reference runs one single-threaded process per MPI rank
(``gmr.cpp:42-44``); parallelism, memory management and shuffle are all
hand-rolled.  Here a single ``SparkSession`` subsumes all of that: AQE
re-plans shuffles at runtime (skew joins, partition coalescing), Arrow
accelerates any Python exchange, and shuffle partition counts are sized
from the environment so the same code runs on ``local[32]`` and on a
1000-executor cluster unchanged.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "graphmapreduce-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    Defaults favor the 100 TB posture: AQE on (runtime partition
    coalescing + skew-join splitting), broadcast threshold generous
    enough for dimension tables, Arrow on for every pandas-UDF exchange.
    On a real cluster ``master`` comes from the environment / launcher;
    locally we honor ``SPARK_GRAFT_CPUS`` (default 32).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if master is None:
        master = os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    # Python workers must import this package no matter where the driver
    # process was launched from (cloudpickle serializes closures over
    # our modules BY NAME).  Locally that's a PYTHONPATH entry inherited
    # by the worker processes; on a real cluster the equivalent is
    # shipping the package via --py-files / a wheel on the image.
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pp = os.environ.get("PYTHONPATH", "")
    if pkg_root not in pp.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            pkg_root + (os.pathsep + pp if pp else "")
        )
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # NOTE: coalescePartitions.parallelismFirst stays at its default
        # (true).  Coalescing by byte size alone (false) measured ~2×
        # slower on compute-bound fan-out stages (MinHash shingling:
        # ~2 MB of shuffled text exploding to millions of hashed rows) —
        # byte-sized partitions are the wrong proxy when per-row
        # downstream work dominates.
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def load_tables(spark: SparkSession, sf_dir: str, names: list[str] | None = None):
    """Load the standard testdata parquet tables and register temp views.

    Returns a dict name -> DataFrame.  Column pruning / predicate pushdown
    reach the parquet scan automatically because these are plain
    ``spark.read.parquet`` sources.
    """
    names = names or [
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "orders",
        "lineitem",
        "events",
        "documents",
        "embeddings",
    ]
    out = {}
    for n in names:
        df = spark.read.parquet(os.path.join(sf_dir, f"{n}.parquet"))
        df.createOrReplaceTempView(n)
        out[n] = df
    return out
