"""Streaming tests: batch/stream parity of the window operators, real
readStream micro-batch execution against a parquet fixture stream."""

import datetime as dt
import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from graphmapreduce_spark.streaming import session_agg, sliding_agg, tumbling_agg
from graphmapreduce_spark.streaming.windows import (
    dedup_within_watermark,
    stream_events_from_parquet,
    with_watermark,
)


def ts(s):
    return dt.datetime.fromisoformat(s)


EVENTS = [
    (1, 1, ts("2024-01-01T00:01:00"), 1.0),
    (2, 1, ts("2024-01-01T00:04:00"), 2.0),
    (3, 1, ts("2024-01-01T00:20:00"), 3.0),  # new session (>5 min gap)
    (4, 2, ts("2024-01-01T00:59:00"), 4.0),
    (5, 2, ts("2024-01-01T01:01:00"), 5.0),
]


@pytest.fixture(scope="module")
def events(spark):
    return spark.createDataFrame(
        EVENTS, "event_id long, user_id long, ts timestamp, value double"
    )


def test_tumbling(events):
    out = tumbling_agg(events, "ts", "1 hour", aggs=[F.count(F.lit(1)).alias("n")])
    got = {r["window_start"]: r["n"] for r in out.collect()}
    assert got == {ts("2024-01-01T00:00:00"): 4, ts("2024-01-01T01:00:00"): 1}


def test_sliding_counts(events):
    out = sliding_agg(
        events, "ts", "10 minutes", "5 minutes", aggs=[F.count(F.lit(1)).alias("n")]
    )
    got = {r["window_start"]: r["n"] for r in out.collect()}
    # events at 00:01 and 00:04 both fall in windows [23:55,00:05) and [00:00,00:10)
    assert got[ts("2023-12-31T23:55:00")] == 2
    assert got[ts("2024-01-01T00:00:00")] == 2
    assert got[ts("2024-01-01T00:15:00")] == 1
    assert got[ts("2024-01-01T00:20:00")] == 1


def test_session_windows(events):
    out = session_agg(
        events, "ts", "5 minutes", ["user_id"], aggs=[F.count(F.lit(1)).alias("n")]
    )
    rows = sorted(
        (r["user_id"], r["session_start"], r["session_end"], r["n"])
        for r in out.collect()
    )
    assert rows == [
        (1, ts("2024-01-01T00:01:00"), ts("2024-01-01T00:09:00"), 2),
        (1, ts("2024-01-01T00:20:00"), ts("2024-01-01T00:25:00"), 1),
        # 00:59 and 01:01 are 2 min apart -> one merged session
        (2, ts("2024-01-01T00:59:00"), ts("2024-01-01T01:06:00"), 2),
    ]


def test_readstream_tumbling_with_watermark(spark, events):
    """Real micro-batch streaming: write the fixture as multiple parquet
    files, readStream them, run the SAME tumbling_agg code path with a
    watermark, collect via memory sink."""
    d = tempfile.mkdtemp(prefix="gmr_stream_")
    try:
        events.repartition(3).write.mode("overwrite").parquet(d)
        src = stream_events_from_parquet(spark, d, max_files_per_trigger=1)
        agg = tumbling_agg(
            with_watermark(src, "ts", "10 minutes"),
            "ts",
            "1 hour",
            aggs=[F.count(F.lit(1)).alias("n"), F.sum("value").alias("sv")],
        )
        q = (
            agg.writeStream.format("memory")
            .queryName("t_tumbling")
            .outputMode("complete")
            .start()
        )
        q.processAllAvailable()
        got = {
            r["window_start"]: (r["n"], r["sv"])
            for r in spark.sql("SELECT * FROM t_tumbling").collect()
        }
        q.stop()
        assert got == {
            ts("2024-01-01T00:00:00"): (4, 10.0),
            ts("2024-01-01T01:00:00"): (1, 5.0),
        }
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_readstream_dedup_within_watermark(spark):
    d = tempfile.mkdtemp(prefix="gmr_dedup_")
    try:
        dup_events = spark.createDataFrame(
            [
                (1, ts("2024-01-01T00:00:00")),
                (1, ts("2024-01-01T00:00:30")),  # duplicate key within watermark
                (2, ts("2024-01-01T00:01:00")),
            ],
            "k long, ts timestamp",
        )
        dup_events.coalesce(1).write.mode("overwrite").parquet(d)
        src = stream_events_from_parquet(spark, d)
        q = (
            dedup_within_watermark(src, ["k"], "ts", "10 minutes")
            .writeStream.format("memory")
            .queryName("t_dedup")
            .outputMode("append")
            .start()
        )
        q.processAllAvailable()
        ks = sorted(
            r["k"] for r in spark.sql("SELECT k FROM t_dedup").collect()
        )
        q.stop()
        assert ks == [1, 2]
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_multimodal_fake_pipeline(spark):
    """Multimodal plumbing: binary payload column → metadata (no Python)
    → Arrow-batched fake decode → features; stub raises without fake."""
    from graphmapreduce_spark.operators import multimodal as M

    media = spark.createDataFrame(
        [(1, "image", "image/fake", bytearray(b"pix1"), 4, 4, None),
         (2, "image", "image/fake", bytearray(b"pix2"), 4, 4, None)],
        M.MEDIA_SCHEMA,
    )
    meta = M.media_metadata(media)
    rows = {r["media_id"]: r["n_bytes"] for r in meta.collect()}
    assert rows == {1: 4, 2: 4}

    feats = M.extract_image_features(media, fake=True)
    got = {r["media_id"]: r["features"] for r in feats.collect()}
    assert len(got[1]) == 8 and len(got[2]) == 8
    assert got[1] != got[2]  # payload-seeded → different pseudo-pixels

    with pytest.raises(Exception, match="NotImplementedError|real image"):
        M.extract_image_features(media, fake=False).collect()

    frames = M.sample_video_frames(
        spark.createDataFrame(
            [(3, "video", "video/fake", bytearray(b"vid"), None, None, 2500)],
            M.MEDIA_SCHEMA,
        ),
        fake=True,
    )
    fr = frames.collect()
    assert [r["frame_idx"] for r in sorted(fr, key=lambda r: r["frame_idx"])] == [0, 1]


def test_audio_features_fake(spark):
    """Audio stub: deterministic framed RMS/ZCR; 1 row in → 1 row out;
    raises without fake."""
    from graphmapreduce_spark.operators import multimodal as M

    media = spark.createDataFrame(
        [(1, "audio", "audio/fake", bytearray(b"pcm1"), None, None, 100),
         (2, "audio", "audio/fake", bytearray(b"pcm2"), None, None, 50)],
        M.MEDIA_SCHEMA,
    )
    feats = M.extract_audio_features(media, fake=True, frame_ms=25)
    rows = {r["media_id"]: r for r in feats.collect()}
    # 100 ms at 16 kHz, 25 ms frames → 1600 samples, 4 frames
    assert rows[1]["n_samples"] == 1600 and rows[1]["n_frames"] == 4
    assert rows[2]["n_frames"] == 2
    # uniform [-1,1] noise: RMS ≈ 1/sqrt(3) ≈ 0.577, ZCR ≈ 0.5
    assert 0.5 < rows[1]["rms_mean"] < 0.65
    assert 0.4 < rows[1]["zcr_mean"] < 0.6
    # determinism across runs
    again = {r["media_id"]: r for r in feats.collect()}
    assert again[1]["rms_mean"] == rows[1]["rms_mean"]

    with pytest.raises(Exception, match="NotImplementedError|real audio"):
        M.extract_audio_features(media, fake=False).collect()


def test_stream_to_parquet_exactly_once(spark, tmp_path):
    """File sink round-trip: stream the events fixture to parquet with a
    checkpoint; all rows arrive exactly once, and re-running the same
    query with the same checkpoint writes nothing new (offsets are
    committed — the exactly-once contract)."""
    from graphmapreduce_spark.streaming.windows import (
        stream_events_from_parquet,
        stream_to_parquet,
    )

    sf = "/root/testdata/sf0.001"
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    static = spark.read.option("pathGlobFilter", "events.parquet").parquet(sf)
    src = (
        spark.readStream.schema(static.schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf)
    )
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = stream_to_parquet(src.select("event_id", "user_id"), out, ckpt)
    q.awaitTermination()
    n_expected = static.count()
    assert spark.read.parquet(out).count() == n_expected

    # same checkpoint → source fully committed → no duplicate output
    src2 = (
        spark.readStream.schema(static.schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf)
    )
    q2 = stream_to_parquet(src2.select("event_id", "user_id"), out, ckpt)
    q2.awaitTermination()
    assert spark.read.parquet(out).count() == n_expected


def test_stream_upsert_foreachbatch(spark, tmp_path):
    """foreachBatch MERGE sink: two micro-batches of keyed updates land
    as latest-per-key in the parquet target (type-1 upsert), and the
    second batch only touches its own keys."""
    from graphmapreduce_spark.streaming.windows import stream_upsert_to_parquet

    src_dir = str(tmp_path / "src")
    out, ckpt = str(tmp_path / "tgt"), str(tmp_path / "ck")
    spark.createDataFrame([(1, 10.0), (2, 20.0)], "k long, v double").write.mode(
        "append"
    ).parquet(src_dir)
    schema = "k long, v double"
    stream = spark.readStream.schema(schema).parquet(src_dir)
    q = stream_upsert_to_parquet(stream, out, ckpt, ["k"])
    q.awaitTermination()
    got = {r["k"]: r["v"] for r in spark.read.parquet(out).collect()}
    assert got == {1: 10.0, 2: 20.0}

    # second batch: update k=2, insert k=3
    spark.createDataFrame([(2, 99.0), (3, 30.0)], schema).write.mode(
        "append"
    ).parquet(src_dir)
    stream2 = spark.readStream.schema(schema).parquet(src_dir)
    q2 = stream_upsert_to_parquet(stream2, out, ckpt, ["k"])
    q2.awaitTermination()
    got = {r["k"]: r["v"] for r in spark.read.parquet(out).collect()}
    assert got == {1: 10.0, 2: 99.0, 3: 30.0}


# ------------------------------------------------ parquet_replay source

def test_parquet_replay_stream_source(spark, tmp_path):
    from pyspark.sql import functions as F

    from graphmapreduce_spark.sources.replay_stream import (
        ParquetReplayStreamSource,
    )

    spark.dataSource.register(ParquetReplayStreamSource)
    path = "/root/testdata/sf0.001/documents.parquet"
    static = spark.read.parquet(path)
    n_docs = static.count()

    src = (
        spark.readStream.format("parquet_replay")
        .option("path", path)
        .option("rows_per_batch", "150")
        .load()
    )
    assert src.schema == static.schema

    batches = []

    def sink(df, epoch_id):
        batches.append(df.groupBy("lang").count().collect())

    # Python streaming sources don't support Trigger.AvailableNow (the
    # engine logs a single-batch fallback); drain via processAllAvailable
    q = (
        src.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(60)
    # every row replayed exactly once, in >1 micro-batch
    total = sum(r["count"] for b in batches for r in b)
    assert total == n_docs
    assert len([b for b in batches if b]) > 1
    # per-lang totals match the static table (exact replay)
    merged = {}
    for b in batches:
        for r in b:
            merged[r["lang"]] = merged.get(r["lang"], 0) + r["count"]
    expected = {
        r["lang"]: r["count"]
        for r in static.groupBy("lang").count().collect()
    }
    assert merged == expected
