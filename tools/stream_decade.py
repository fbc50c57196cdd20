"""Streaming-throughput decade: the production micro-batch pipeline at
two event-volume scales, same micro-batch COUNT, 10× the rows.

The graph and pair families have measured sf→10×sf decades in
BASELINE.md; this closes the third leg: Structured Streaming.  The
measured pipeline is the canonical shape — file-source stream →
watermarked tumbling-window aggregate → exactly-once parquet sink,
drained with ``trigger(availableNow=True)``:

- the source directory is re-staged into ``--files`` equal parquet
  files at BOTH scales and streamed with the same
  ``maxFilesPerTrigger``, so the two runs execute the SAME number of
  micro-batches and the decade isolates per-batch data volume (the
  honest streaming scale axis: at 100 TB/day you grow batch size, not
  batch count, until you grow the cluster);
- the window state (per (window, event_type) partial aggregates)
  flows through the state store across batches — the part of the
  pipeline a bigger cluster partitions by key;
- wall time is start()→drain, throughput = rows/wall.

Usage:
    python tools/stream_decade.py [--small DIR] [--big DIR]
                                  [--files N] [--per-trigger K]

Defaults: small=/tmp/gmr_sf1, big=/tmp/gmr_sf10 (auto-built from
/root/testdata/sf0.1 via tools/make_scale.py when missing).  Prints one
JSON line with wall seconds, rows/sec, and the decade ratio.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def ensure_scale(src: str, dst: str, factor: int) -> None:
    if os.path.exists(os.path.join(dst, "events.parquet")):
        return
    here = os.path.dirname(os.path.abspath(__file__))
    subprocess.run(
        [sys.executable, os.path.join(here, "make_scale.py"),
         "--factor", str(factor), "--src", src, "--dst", dst],
        check=True,
    )


def stage_files(spark, events_path: str, n_files: int) -> str:
    """Rewrite the events table as exactly ``n_files`` parquet files —
    the micro-batch granularity knob for the file source."""
    from graphmapreduce_spark.operators._time import normalize_ts

    d = tempfile.mkdtemp(prefix="gmr_stream_decade_src_")
    (
        normalize_ts(spark.read.parquet(events_path), "ts")
        .repartition(n_files)
        .write.mode("overwrite")
        .parquet(d)
    )
    return d


def run_pipeline(spark, src_dir: str, per_trigger: int) -> tuple[float, int]:
    from pyspark.sql import functions as F

    from graphmapreduce_spark.streaming.windows import (
        stream_events_from_parquet,
        stream_to_parquet,
        with_watermark,
    )

    out = tempfile.mkdtemp(prefix="gmr_stream_decade_out_")
    ckpt = tempfile.mkdtemp(prefix="gmr_stream_decade_ckpt_")
    stream = stream_events_from_parquet(
        spark, src_dir, max_files_per_trigger=per_trigger
    )
    agg = (
        with_watermark(stream, "ts", "30 seconds")
        .groupBy(F.window("ts", "1 minute"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
            F.approx_count_distinct("user_id").alias("approx_users"),
        )
        .select(
            F.col("window.start").alias("w_start"),
            "event_type", "n_events", "sum_value", "approx_users",
        )
    )
    t0 = time.perf_counter()
    q = stream_to_parquet(agg, out, ckpt, available_now=True)
    q.awaitTermination()
    wall = time.perf_counter() - t0
    n_in = spark.read.parquet(src_dir).count()
    n_out = spark.read.parquet(out).count()
    shutil.rmtree(out, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)
    print(f"#   drained {n_in} rows -> {n_out} window rows in {wall:.1f}s",
          file=sys.stderr)
    return wall, n_in


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", default="/tmp/gmr_sf1")
    ap.add_argument("--big", default="/tmp/gmr_sf10")
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--files", type=int, default=20)
    ap.add_argument("--per-trigger", type=int, default=2)
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    args = ap.parse_args()

    ensure_scale(args.src, args.small, 10)
    ensure_scale(args.src, args.big, 100)

    os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .config("spark.sql.shuffle.partitions", str(args.cpus))
        .config("spark.driver.memory",
                os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .appName("stream_decade")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    results = {}
    for label, d in (("small", args.small), ("big", args.big)):
        src = stage_files(
            spark, os.path.join(d, "events.parquet"), args.files
        )
        print(f"# {label}: {args.files} files, "
              f"{args.per_trigger}/trigger", file=sys.stderr)
        wall, n = run_pipeline(spark, src, args.per_trigger)
        results[label] = {"wall_s": round(wall, 1), "rows": n,
                          "rows_per_s": int(n / wall)}
        shutil.rmtree(src, ignore_errors=True)

    out = {
        "files": args.files,
        "per_trigger": args.per_trigger,
        "cpus": int(args.cpus),
        **{f"{k}_{kk}": vv for k, v in results.items()
           for kk, vv in v.items()},
        "decade_ratio": round(
            results["big"]["wall_s"] / results["small"]["wall_s"], 2
        ),
    }
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
