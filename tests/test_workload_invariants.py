"""Distributed-correctness invariants for the round-4 diagnostic
queries: results must be independent of physical partitioning, and the
statistics must respect their mathematical bounds."""

from graphmapreduce_spark.plans import workload

SF = "/root/testdata/sf0.001"


def test_table_checksum_partition_invariant(spark):
    q = workload.queries()["q196_table_checksum"]
    base = q(spark, SF).collect()[0]
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        alt = q(spark, SF).collect()[0]
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert (base["n_rows"], base["xor_checksum"], base["modsum_checksum"]) == (
        alt["n_rows"], alt["xor_checksum"], alt["modsum_checksum"],
    )


def test_psi_nonnegative_and_bucketed(spark):
    r = workload.queries()["q197_psi_drift"](spark, SF).collect()[0]
    assert r["psi"] >= 0.0  # PSI is a symmetrized KL: nonnegative
    assert 1 <= r["n_buckets"] <= 5


def test_lexical_diversity_bounds(spark):
    rows = workload.queries()["q198_lexical_diversity"](spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 < r["ttr"] <= 1.0
        assert 0 <= r["hapax_frac"] <= 1.0
        assert r["n_types"] <= r["n_tokens"]
