"""Deterministic sampling operators: reproducibility across partition
layouts, split disjointness/stability, stratified rates."""

import pytest
from pyspark.sql import functions as F

from graphmapreduce_spark.operators import sampling as SMP


@pytest.fixture(scope="module")
def ids(spark):
    return spark.range(0, 10_000).withColumnRenamed("id", "doc_id")


def test_hash_sample_deterministic_and_layout_independent(ids):
    a = {r["doc_id"] for r in SMP.hash_sample(ids, "doc_id", 0.1).collect()}
    b = {
        r["doc_id"]
        for r in SMP.hash_sample(
            ids.repartition(13, "doc_id"), "doc_id", 0.1
        ).collect()
    }
    assert a == b  # same members under any partitioning — df.sample is not
    assert 800 <= len(a) <= 1200  # ~10% of 10k


def test_hash_sample_seeds_independent(ids):
    a = {r["doc_id"] for r in SMP.hash_sample(ids, "doc_id", 0.1, seed=0).collect()}
    b = {r["doc_id"] for r in SMP.hash_sample(ids, "doc_id", 0.1, seed=1).collect()}
    overlap = len(a & b) / max(len(a), 1)
    assert 0.02 <= overlap <= 0.25  # ~independent: E[overlap rate] = 10%


def test_hash_sample_md5_matches_xxhash_shape(ids):
    m = SMP.hash_sample(ids, "doc_id", 0.1, hash_fn="md5").count()
    assert 800 <= m <= 1200


def test_hash_split_partitions_exactly(ids):
    train, val, test = SMP.hash_split(ids, "doc_id", [0.8, 0.1, 0.1])
    nt, nv, ns = train.count(), val.count(), test.count()
    assert nt + nv + ns == 10_000  # no row lost or duplicated
    assert nt > 7500 and 700 < nv < 1300 and 700 < ns < 1300
    # id→split assignment is stable under growth: a subset of the data
    # gets the identical assignment for surviving ids
    sub = ids.filter(F.col("doc_id") < 5000)
    t2 = {r["doc_id"] for r in SMP.hash_split(sub, "doc_id", [0.8, 0.1, 0.1])[0].collect()}
    t1 = {r["doc_id"] for r in train.filter(F.col("doc_id") < 5000).collect()}
    assert t1 == t2


def test_stratified_rates(spark):
    rows = [(i, "a" if i % 2 == 0 else "b") for i in range(20_000)]
    df = spark.createDataFrame(rows, "id long, s string")
    got = SMP.stratified_hash_sample(
        df, "id", "s", {"a": 0.5, "b": 0.05}, default_fraction=0.0
    )
    counts = {r["s"]: r["n"] for r in got.groupBy("s").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert 4500 <= counts.get("a", 0) <= 5500  # ~50% of 10k
    assert 300 <= counts.get("b", 0) <= 700  # ~5% of 10k


def test_validation_errors(ids):
    with pytest.raises(ValueError):
        SMP.hash_sample(ids, "doc_id", 1.5)
    with pytest.raises(ValueError):
        SMP.hash_split(ids, "doc_id", [0.5, 0.4])  # doesn't sum to 1
    with pytest.raises(ValueError):
        SMP.stratified_hash_sample(ids, "doc_id", "doc_id", {1: 2.0})


def test_packed_layout_equals_global_cumsum(spark):
    """The scalable two-level cumsum must equal the naive global
    Window.orderBy running sum exactly — including across range
    boundaries and with non-contiguous ids."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window
    from graphmapreduce_spark.operators.packing import packed_layout

    df = spark.range(0, 1000).select(
        (F.col("id") * 3).alias("doc_id"),  # non-contiguous ids
        (F.pmod(F.col("id") * 37, F.lit(90)) + 1).alias("n"),
    )
    got = {
        r["doc_id"]: (r["bin"], r["offset"])
        for r in packed_layout(df, "doc_id", "n", capacity=256, range_size=64).collect()
    }
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    naive = {
        r["doc_id"]: (r["off"] // 256, r["off"])
        for r in df.withColumn("off", F.sum("n").over(w) - F.col("n")).collect()
    }
    assert got == naive


def test_shard_assignment_balanced_token_mass(spark):
    from graphmapreduce_spark.operators.packing import shard_assignment

    df = spark.range(1, 1001).selectExpr(
        "id AS doc_id", "CAST(id % 97 + 1 AS LONG) AS n"
    )
    out = shard_assignment(df, "doc_id", "n", num_shards=4, range_size=100)
    rows = out.collect()
    assert len(rows) == 1000
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard"], 0)
        by_shard[r["shard"]] += r["n"]
    assert set(by_shard) == {0, 1, 2, 3}
    total = sum(by_shard.values())
    cap = -(-total // 4)
    # contiguous token-balanced cuts: every shard holds <= cap tokens
    # plus at most one straddling doc
    max_doc = 97
    assert all(v <= cap + max_doc for v in by_shard.values())
    # offsets are the exact global cumsum -> shard is offset div cap
    for r in rows:
        assert r["shard"] == r["offset"] // cap


def test_stratified_fixed_k_exact_counts_and_determinism(spark):
    from graphmapreduce_spark.operators.sampling import stratified_fixed_k

    df = spark.range(1000).selectExpr("id", "id % 3 AS g")
    s1 = stratified_fixed_k(df, ["g"], k=50, id_cols=["id"])
    counts = {r["g"]: r["n"] for r in
              s1.groupBy("g").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts == {0: 50, 1: 50, 2: 50}
    # pure function of the data: repeated + repartitioned runs agree
    s2 = stratified_fixed_k(df.repartition(7), ["g"], k=50, id_cols=["id"])
    assert sorted(r["id"] for r in s1.collect()) == sorted(
        r["id"] for r in s2.collect()
    )
    # small strata are taken whole
    tiny = spark.range(5).selectExpr("id", "0 AS g")
    assert stratified_fixed_k(tiny, ["g"], k=50, id_cols=["id"]).count() == 5


def test_temperature_sample_flattens_mixture(spark, sf_dir):
    """alpha<1 keeps the largest group at base_rate and boosts tail
    groups; alpha=1 is plain rate-base_rate hash sampling."""
    from graphmapreduce_spark.operators.sampling import (
        hash_sample,
        temperature_sample,
    )

    d = spark.read.parquet(sf_dir + "/documents.parquet")
    counts = {r["lang"]: r["n"] for r in d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    biggest = max(counts, key=counts.get)
    out = temperature_sample(
        d, "doc_id", "lang", alpha=0.5, base_rate=0.5, hash_fn="md5"
    )
    kept = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    # largest group sampled at ~base_rate, tail groups at a HIGHER rate
    for lang, n in counts.items():
        rate = kept.get(lang, 0) / n
        if lang != biggest:
            expect = min(1.0, 0.5 * (n / counts[biggest]) ** -0.5)
            assert rate >= 0.5 or n < 20  # boosted vs the base rate
            assert abs(rate - expect) < 0.35  # Bernoulli noise on small n
    # alpha=1 degenerates to the plain deterministic hash sample
    t1 = temperature_sample(
        d, "doc_id", "lang", alpha=1.0, base_rate=0.3, hash_fn="md5"
    )
    h = hash_sample(d, "doc_id", 0.3, seed=0, hash_fn="md5")
    assert sorted(r["doc_id"] for r in t1.collect()) == sorted(
        r["doc_id"] for r in h.collect()
    )


def test_temperature_sample_deterministic(spark, sf_dir):
    from graphmapreduce_spark.operators.sampling import temperature_sample

    d = spark.read.parquet(sf_dir + "/documents.parquet")
    a = sorted(r["doc_id"] for r in temperature_sample(
        d, "doc_id", "lang", alpha=0.5, base_rate=0.5).collect())
    b = sorted(r["doc_id"] for r in temperature_sample(
        d.repartition(7), "doc_id", "lang", alpha=0.5, base_rate=0.5
    ).collect())
    assert a == b and len(a) > 0


def test_weighted_reservoir_exact_k_and_weight_bias(spark):
    from pyspark.sql import functions as F

    from graphmapreduce_spark.operators.sampling import weighted_reservoir_k

    # 100 light rows (w=1) + 10 heavy rows (w=1000): heavy rows should
    # dominate a k=10 draw; exactly k rows return; determinism holds
    rows = [(i, 1.0) for i in range(100)] + [(1000 + i, 1000.0) for i in range(10)]
    df = spark.createDataFrame(rows, "id long, w double")
    out1 = {r["id"] for r in weighted_reservoir_k(df, "id", "w", k=10).collect()}
    out2 = {r["id"] for r in weighted_reservoir_k(df, "id", "w", k=10).collect()}
    assert out1 == out2 and len(out1) == 10
    assert sum(1 for i in out1 if i >= 1000) >= 8  # heavy rows dominate
    # zero/negative weights are excluded entirely
    dfz = spark.createDataFrame([(1, 0.0), (2, -3.0), (3, 5.0)], "id long, w double")
    assert {r["id"] for r in weighted_reservoir_k(dfz, "id", "w", k=5).collect()} == {3}
