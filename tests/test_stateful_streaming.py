"""applyInPandasWithState custom stateful operator test: state must
persist across micro-batches (two files → two triggers)."""

import datetime as dt
import shutil
import tempfile

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
