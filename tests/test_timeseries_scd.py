"""Unit tests for SCD-type-2 versioning, time-series resample/gap-fill,
corpus line dedup, and char entropy on tiny hand-checked inputs."""

import datetime as dt
import math

from pyspark.sql import functions as F

from graphmapreduce_spark.functions.text import char_entropy
from graphmapreduce_spark.operators.relational import scd2_apply
from graphmapreduce_spark.operators.timeseries import resample_ffill


def ts(s):
    return dt.datetime.fromisoformat(s)


def _scd_fixture(spark):
    current = spark.createDataFrame(
        [
            # closed history row: must pass through untouched
            (1, "OLD", ts("1990-01-01"), ts("1992-01-01")),
            # open rows
            (1, "A", ts("1992-01-01"), None),
            (2, "B", ts("1992-01-01"), None),
            (3, "C", ts("1992-01-01"), None),
        ],
        "k long, seg string, valid_from timestamp, valid_to timestamp",
    )
    updates = spark.createDataFrame(
        [
            (1, "A", ts("1993-01-01")),  # no-op vs open row -> collapsed
            (1, "X", ts("1994-01-01")),  # real change
            (2, "Y", ts("1993-06-01")),  # chain of two changes
            (2, "Z", ts("1995-06-01")),
            (2, "Z", ts("1996-06-01")),  # no-op vs previous batch row
            (4, "N", ts("1997-01-01")),  # brand-new key
        ],
        "k long, seg string, ts timestamp",
    )
    return current, updates


def test_scd2_apply_versions(spark):
    current, updates = _scd_fixture(spark)
    out = scd2_apply(current, updates, ["k"], ["seg"], "ts")
    rows = {
        (r["k"], r["seg"], r["valid_from"], r["valid_to"])
        for r in out.collect()
    }
    assert rows == {
        (1, "OLD", ts("1990-01-01"), ts("1992-01-01")),
        (1, "A", ts("1992-01-01"), ts("1994-01-01")),  # no-op absorbed
        (1, "X", ts("1994-01-01"), None),
        (2, "B", ts("1992-01-01"), ts("1993-06-01")),
        (2, "Y", ts("1993-06-01"), ts("1995-06-01")),
        (2, "Z", ts("1995-06-01"), None),  # duplicate Z collapsed
        (3, "C", ts("1992-01-01"), None),  # untouched key stays open
        (4, "N", ts("1997-01-01"), None),  # insert
    }


def test_scd2_open_row_count_invariant(spark):
    # exactly one open version per live key, spans never overlap
    current, updates = _scd_fixture(spark)
    out = scd2_apply(current, updates, ["k"], ["seg"], "ts").cache()
    open_per_key = (
        out.filter(F.col("valid_to").isNull()).groupBy("k").count().collect()
    )
    assert all(r["count"] == 1 for r in open_per_key)
    # each closed span's valid_to equals the next span's valid_from
    w_rows = out.filter(F.col("k") == 2).orderBy("valid_from").collect()
    for a, b in zip(w_rows, w_rows[1:]):
        assert a["valid_to"] == b["valid_from"]


def test_resample_ffill_modes(spark):
    df = spark.createDataFrame(
        [
            (1, ts("2024-01-01T00:00:30"), 10.0),
            (1, ts("2024-01-01T00:00:45"), 11.0),  # same bucket: last wins
            (1, ts("2024-01-01T00:03:10"), 30.0),  # two-bucket gap before
            (2, ts("2024-01-01T00:00:00"), 5.0),
        ],
        "k long, ts timestamp, v double",
    )
    out = resample_ffill(df, "k", "ts", "v", 60, fill="ffill")
    got = {(r["k"], r["bucket_start"], r["v"]) for r in out.collect()}
    base = int(ts("2024-01-01T00:00:00").timestamp())
    assert got == {
        (1, base, 11.0),  # last obs in bucket, not first
        (1, base + 60, 11.0),  # gap forward-filled
        (1, base + 120, 11.0),
        (1, base + 180, 30.0),
        (2, base, 5.0),
    }
    zero = resample_ffill(df, "k", "ts", "v", 60, fill="zero")
    gz = {(r["k"], r["bucket_start"], r["v"]) for r in zero.collect()}
    assert (1, base + 60, 0.0) in gz and (1, base, 11.0) in gz
    none = resample_ffill(df, "k", "ts", "v", 60, fill="none")
    gn = {(r["k"], r["bucket_start"], r["v"]) for r in none.collect()}
    assert (1, base + 60, None) in gn


def test_char_entropy_known_values(spark):
    df = spark.createDataFrame(
        [(1, "aaaa"), (2, "abab"), (3, "abcd"), (4, "")],
        "id long, t string",
    )
    got = {
        r["id"]: r["e"]
        for r in df.select("id", char_entropy("t").alias("e")).collect()
    }
    assert got[1] == 0.0
    assert math.isclose(got[2], 1.0, abs_tol=1e-9)
    assert math.isclose(got[3], 2.0, abs_tol=1e-9)
    assert got[4] == 0.0


def test_time_weighted_avg_hand_computed(spark):
    from graphmapreduce_spark.operators.timeseries import time_weighted_avg

    # one key, bucket [0, 100): v=10 holds for 40s, v=20 for 40s,
    # v=30 for the final 20s -> twap = (10*40 + 20*40 + 30*20)/100 = 18.
    # BIGINT ts is epoch NANOSECONDS by contract (operators/_time.py) —
    # the same nanosAsLong convention normalize_ts uses.
    NS = 1_000_000_000
    df = spark.createDataFrame(
        [(1, 0 * NS, 10.0), (1, 40 * NS, 20.0), (1, 80 * NS, 30.0)],
        "k long, ts long, v double",
    )
    rows = time_weighted_avg(df, "k", "ts", "v", 100).collect()
    assert len(rows) == 1
    assert rows[0]["bucket_start"] == 0
    assert abs(rows[0]["twap"] - 18.0) < 1e-9
    # a lone observation carries to the bucket end -> twap = its value
    one = spark.createDataFrame(
        [(2, 250 * NS, 7.0)], "k long, ts long, v double"
    )
    r = time_weighted_avg(one, "k", "ts", "v", 100).collect()[0]
    assert r["bucket_start"] == 200 and r["twap"] == 7.0


def test_ewma_weights_and_head_renormalization(spark):
    from graphmapreduce_spark.operators.timeseries import ewma

    df = spark.createDataFrame(
        [(1, 1, 10.0), (1, 2, 20.0), (1, 3, 30.0)],
        "k long, t long, v double",
    )
    rows = {r["t"]: r["ewma"] for r in
            ewma(df, "k", ["t"], "v", alpha=0.5, k=3).collect()}
    assert abs(rows[1] - 10.0) < 1e-9                       # head: itself
    assert abs(rows[2] - (20 + 0.5 * 10) / 1.5) < 1e-9      # two terms
    assert abs(rows[3] - (30 + 0.5 * 20 + 0.25 * 10) / 1.75) < 1e-9


def test_epoch_seconds_bigint_is_nanos_matching_normalize_ts(spark):
    """The two _time helpers must share the nanosAsLong contract: a raw
    int64-nanos column gives the same epoch seconds whether the caller
    normalizes first or extracts directly (regression: epoch_seconds
    used to pass bigint through as if it were already seconds)."""
    from graphmapreduce_spark.operators import _time

    nanos = 1_600_000_123_000_000_000  # 2020-09-13T12:28:43Z in ns
    raw = spark.createDataFrame([(nanos,)], "ts long")
    direct = raw.select(_time.epoch_seconds(raw, "ts").alias("s")).first()["s"]
    normed = _time.normalize_ts(raw, "ts")
    via_norm = normed.select(
        _time.epoch_seconds(normed, "ts").alias("s")
    ).first()["s"]
    assert direct == via_norm == 1_600_000_123


def test_resample_interpolate_hand_computed(spark):
    """Grid at 0,100,200,300: obs (0,10),(150,40),(300,70) -> linear
    values 10, 30, 50, 70; a grid point ON an observation is exact.
    BIGINT ts is epoch nanoseconds by contract."""
    from graphmapreduce_spark.operators.timeseries import (
        resample_interpolate,
    )

    NS = 1_000_000_000
    df = spark.createDataFrame(
        [(1, 0 * NS, 10.0), (1, 150 * NS, 40.0), (1, 300 * NS, 70.0)],
        "k long, ts long, v double",
    )
    got = {r["bucket_start"]: r["v"] for r in
           resample_interpolate(df, "k", "ts", "v", 100).collect()}
    assert got == {0: 10.0, 100: 30.0, 200: 50.0, 300: 70.0}
    # before-first stays NULL: key 2 observed only at t=150
    df2 = spark.createDataFrame(
        [(2, 150 * NS, 5.0), (2, 250 * NS, 15.0)], "k long, ts long, v double"
    )
    got2 = {r["bucket_start"]: r["v"] for r in
            resample_interpolate(df2, "k", "ts", "v", 100).collect()}
    assert got2[100] is None and got2[200] == 10.0
