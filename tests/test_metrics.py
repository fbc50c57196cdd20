"""Metrics surface (ref per-phase timers gmr.h:369-380, byte counters
gmr.cpp:318-319): PhaseTimer, shuffle_metrics, and the per-superstep
timings reported by the Pregel driver."""

import time

from pyspark.sql import functions as F

from graphmapreduce_spark.graph import PropertyGraph
from graphmapreduce_spark.graph.pregel import Pregel
from graphmapreduce_spark.metrics import PhaseTimer, shuffle_metrics


def test_phase_timer_accumulates():
    t = PhaseTimer()
    with t.phase("map"):
        time.sleep(0.01)
    with t.phase("map"):
        time.sleep(0.01)
    with t.phase("reduce"):
        pass
    rep = t.report()
    assert set(rep) == {"map", "reduce"}
    assert rep["map"] >= 0.02
    assert rep["reduce"] >= 0.0


def test_shuffle_metrics_reports_bytes(spark):
    # force a shuffle, then the cumulative counters must be nonzero
    spark.range(100_000).selectExpr("id % 7 AS k", "id AS v").groupBy(
        "k"
    ).sum("v").collect()
    m = shuffle_metrics(spark)
    assert m["active_jobs"] == 0
    assert m["stages"] > 0
    assert m["shuffle_write_bytes"] > 0
    assert m["shuffle_read_bytes"] > 0
    assert m["shuffle_read_records"] > 0


def test_shuffle_tracker_deltas(spark):
    from graphmapreduce_spark.metrics import ShuffleTracker

    tracker = ShuffleTracker(spark)
    spark.range(50_000).selectExpr("id % 5 AS k", "id AS v").groupBy(
        "k"
    ).sum("v").collect()
    d1 = tracker.delta()
    assert d1["shuffle_read_bytes"] > 0
    # no work since the last snapshot -> zero delta
    d2 = tracker.delta()
    assert d2["shuffle_read_bytes"] == 0


def test_pregel_reports_superstep_seconds(spark):
    edges = spark.createDataFrame(
        [(1, 2, 1.0), (2, 3, 1.0), (3, 4, 1.0)], "src long, dst long, weight double"
    )
    g = PropertyGraph.from_edges(edges)
    init = g.vertices.select(
        "id", F.when(F.col("id") == 1, 0.0).otherwise(float("inf")).alias("value")
    )

    def messages(active, e):
        return (
            active.filter(F.col("value") != float("inf"))
            .join(e, active["id"] == e["src"])
            .select(F.col("dst").alias("id"), (F.col("value") + F.col("weight")).alias("msg"))
        )

    p = Pregel(
        make_messages=messages,
        agg=F.min("msg"),
        update=lambda old, agg: F.least(old, F.coalesce(agg, old)),
        threshold=0.5,
        max_iter=10,
        active_frontier=True,
    )
    res = p.run(init, g.edges)
    assert res.converged
    assert len(res.superstep_seconds) == res.iterations
    assert all(s > 0 for s in res.superstep_seconds)


def test_pregel_tracks_shuffle_bytes(spark):
    edges = spark.createDataFrame(
        [(1, 2, 1.0), (2, 3, 1.0), (3, 4, 1.0), (4, 5, 1.0)],
        "src long, dst long, weight double",
    )
    g = PropertyGraph.from_edges(edges)
    init = g.vertices.select(
        "id", F.when(F.col("id") == 1, 0.0).otherwise(float("inf")).alias("value")
    )

    def messages(active, e):
        return (
            active.filter(F.col("value") != float("inf"))
            .join(e, active["id"] == e["src"])
            .select(
                F.col("dst").alias("id"),
                (F.col("value") + F.col("weight")).alias("msg"),
            )
        )

    p = Pregel(
        make_messages=messages,
        agg=F.min("msg"),
        update=lambda old, agg: F.least(old, F.coalesce(agg, old)),
        threshold=0.5,
        max_iter=10,
        active_frontier=True,
        track_shuffle=True,
    )
    res = p.run(init, g.edges)
    assert res.converged
    assert len(res.shuffle_deltas) == len(res.superstep_seconds)
    # message groupBy shuffles every superstep — total must be nonzero
    assert res.total_shuffle_read_bytes > 0
