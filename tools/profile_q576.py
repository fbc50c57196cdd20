"""Stage-level wall profile of the q576 dedup recipe (diagnostic aid;
not part of the bench contract).  Forces each recipe stage with a noop
write in order and reports the incremental wall time — the same
technique as the round-7 session-4 stage profile.

Usage: python tools/profile_q576.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from graphmapreduce_spark.session import get_spark  # noqa: E402
from graphmapreduce_spark.operators.dedup import (  # noqa: E402
    dedup_clusters,
    minhash_lsh_near_dup_pairs,
)


def noop(df, desc, spark):
    spark.sparkContext.setJobDescription(desc)
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    spark.sparkContext.setJobDescription(None)
    print(f"{desc:28s} {dt:6.2f}s", file=sys.stderr)
    return dt


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="gmr-profile-q576",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    docs.count()  # warm footer cache
    id_col, text_col = "doc_id", "text"

    for _pass in (1, 2):
        print(f"--- pass {_pass} ---", file=sys.stderr)
        run_once(spark, docs, id_col, text_col)
    spark.stop()
    return 0


def ctor(label, fn):
    t0 = time.perf_counter()
    out = fn()
    print(f"{label + ' [ctor]':28s} {time.perf_counter() - t0:6.2f}s",
          file=sys.stderr)
    return out


def run_once(spark, docs, id_col, text_col):
    t_all0 = time.perf_counter()
    key = F.md5(F.col(text_col).cast("binary")).alias("_ck")
    reps = (
        docs.select(key, F.col(id_col))
        .groupBy("_ck")
        .agg(F.min(id_col).alias("_rep"))
        .localCheckpoint(eager=False)
    )
    noop(reps, "reps", spark)
    exact_map = (
        docs.select(F.col(id_col), key).join(reps, "_ck").select(id_col, "_rep")
    )
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    rep_docs = (
        docs.join(reps.select(F.col("_rep").alias(id_col)), id_col, "left_semi")
        .select(id_col, text_col)
        .repartition(n_part, F.col(id_col))
        .localCheckpoint(eager=False)
    )
    noop(rep_docs, "rep_docs", spark)
    pairs = ctor("pairs", lambda: minhash_lsh_near_dup_pairs(
        rep_docs, id_col, text_col,
        threshold=0.5, num_hashes=32, shingle_n=5, hash_fn="md5",
        max_bucket_size=64, est_margin=0.2, verify_sample_mod=4,
    ))
    noop(pairs, "pairs (lsh+verify)", spark)
    clusters = ctor("clusters", lambda: dedup_clusters(pairs))
    noop(clusters, "clusters (pregel)", spark)
    base = (
        exact_map.join(clusters.withColumnRenamed("id", "_rep"), "_rep", "left")
        .select(id_col, F.coalesce("cluster", "_rep").alias("canonical_id"))
    )
    noop(base, "mapback", spark)
    print(f"{'TOTAL (staged)':28s} {time.perf_counter() - t_all0:6.2f}s",
          file=sys.stderr)


if __name__ == "__main__":
    raise SystemExit(main())
