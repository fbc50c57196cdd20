"""applyInPandasWithState custom stateful operator test: state must
persist across micro-batches (two files → two triggers)."""

import datetime as dt
import shutil
import tempfile

import pytest

from graphmapreduce_spark.streaming.stateful import running_totals
from graphmapreduce_spark.streaming.windows import stream_events_from_parquet


def ts(s):
    return dt.datetime.fromisoformat(s)


def test_running_totals_across_microbatches(spark):
    d = tempfile.mkdtemp(prefix="gmr_state_")
    try:
        b1 = spark.createDataFrame(
            [(1, 10.0), (1, 5.0), (2, 1.0)], "user_id long, value double"
        )
        b2 = spark.createDataFrame(
            [(1, 1.0), (3, 7.0)], "user_id long, value double"
        )
        b1.coalesce(1).write.parquet(d + "/f1")
        b2.coalesce(1).write.parquet(d + "/f2")
        import glob
        import os

        merged = d + "/all"
        os.makedirs(merged)
        for i, f in enumerate(
            sorted(glob.glob(d + "/f1/*.parquet")) + sorted(glob.glob(d + "/f2/*.parquet"))
        ):
            shutil.copy(f, f"{merged}/part-{i:03d}.parquet")
        src = stream_events_from_parquet(spark, merged, max_files_per_trigger=1)
        out = running_totals(src)
        q = (
            out.writeStream.format("memory")
            .queryName("t_running")
            .outputMode("update")
            .start()
        )
        q.processAllAvailable()
        rows = spark.sql(
            "SELECT user_id, max(n) AS n, max(total) AS total FROM t_running GROUP BY user_id"
        ).collect()
        q.stop()
        got = {r["user_id"]: (r["n"], r["total"]) for r in rows}
        assert got[1] == (3, 16.0)  # state accumulated across batches
        assert got[2] == (1, 1.0)
        assert got[3] == (1, 7.0)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_running_totals_processing_time_timeout_evicts(spark):
    """End-to-end eviction: a key idle past the timeout has its state
    removed, so new data for it restarts the running total from zero.

    NOTE processAllAvailable() can NOT be the barrier here: with
    ProcessingTimeTimeout the microbatch engine keeps issuing 'no new
    data but cleaning up state' batches, so the query never quiesces —
    we poll the memory sink with a deadline instead.  (Those cleanup
    batches are also exactly what fires the eviction without new input.)
    """
    import time

    def poll(predicate, timeout_s=90):
        deadline = time.time() + timeout_s
        while time.time() < deadline:
            rows = spark.sql(
                "SELECT user_id, n, total FROM t_running_to"
            ).collect()
            got = {(r["user_id"], r["n"], r["total"]) for r in rows}
            if predicate(got):
                return got
            time.sleep(0.5)
        raise AssertionError(f"sink never satisfied predicate; last={got}")

    d = tempfile.mkdtemp(prefix="gmr_state_to_")
    try:
        spark.createDataFrame(
            [(1, 2.0), (1, 3.0), (2, 4.0)], "user_id long, value double"
        ).coalesce(1).write.parquet(d + "/all")
        src = stream_events_from_parquet(spark, d + "/all")
        out = running_totals(
            src, timeout="ProcessingTimeTimeout", timeout_duration_ms=2_000
        )
        q = (
            out.writeStream.format("memory")
            .queryName("t_running_to")
            .outputMode("update")
            .start()
        )
        try:
            poll(lambda got: (1, 2, 5.0) in got and (2, 1, 4.0) in got)
            # idle past the 2s timeout: cleanup batches evict both keys
            time.sleep(4)
            # new data for key 1 restarts from zero — n=1, not 3
            spark.createDataFrame(
                [(1, 7.0)], "user_id long, value double"
            ).coalesce(1).write.parquet(d + "/all", mode="append")
            poll(lambda got: (1, 1, 7.0) in got)
        finally:
            q.stop()
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_running_extremes_transform_with_state(spark):
    """transformWithStateInPandas (Spark 4 API): ValueState persists
    across micro-batches — min/max/sum/count accumulate.

    The TWS python worker speaks protobuf to the JVM state server;
    conftest's _enable_tws_protobuf_shim supplies a pure-Python runtime
    where none is installed, so this RUNS here.  Still importorskip-
    gated for environments with neither an install nor the shim source."""
    pytest.importorskip("google.protobuf")
    import glob
    import os

    from graphmapreduce_spark.streaming.stateful import running_extremes

    d = tempfile.mkdtemp(prefix="gmr_tws_")
    try:
        b1 = spark.createDataFrame(
            [(1, 10.0), (1, 5.0), (2, 1.0)], "user_id long, value double"
        )
        b2 = spark.createDataFrame(
            [(1, 30.0), (2, -4.0)], "user_id long, value double"
        )
        b1.coalesce(1).write.parquet(d + "/f1")
        b2.coalesce(1).write.parquet(d + "/f2")
        merged = d + "/all"
        os.makedirs(merged)
        for i, f in enumerate(
            sorted(glob.glob(d + "/f1/*.parquet"))
            + sorted(glob.glob(d + "/f2/*.parquet"))
        ):
            shutil.copy(f, f"{merged}/part-{i:03d}.parquet")
        src = stream_events_from_parquet(spark, merged, max_files_per_trigger=1)
        out = running_extremes(src)
        q = (
            out.writeStream.format("memory")
            .queryName("t_extremes")
            .outputMode("update")
            .start()
        )
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM t_extremes").collect()
        q.stop()
        # The file source breaks modification-time ties arbitrarily, so
        # WHICH intermediate rows appear is order-dependent — but the
        # final state row (highest n per key) is not.  Assert on that.
        final = {}
        for r in rows:
            if r["user_id"] not in final or r["n"] > final[r["user_id"]][0]:
                final[r["user_id"]] = (r["n"], r["lo"], r["hi"], r["total"])
        assert final[1] == (3, 5.0, 30.0, 45.0)
        assert final[2] == (2, -4.0, 1.0, -3.0)
        # both keys saw BOTH micro-batches: state accumulated across at
        # least two emissions per key
        from collections import Counter

        per_key = Counter(r["user_id"] for r in rows)
        assert per_key[1] >= 2 and per_key[2] >= 2
    finally:
        shutil.rmtree(d, ignore_errors=True)
