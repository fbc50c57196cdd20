"""Unit tests for fuzzy edit-distance join, interval-overlap join, and
the DataFrame-native count-min / Bloom sketches."""

from pyspark.sql import functions as F

from graphmapreduce_spark.operators.relational import interval_join
from graphmapreduce_spark.operators.similarity import fuzzy_self_join
from graphmapreduce_spark.operators.sketches import (
    bloom_maybe_contains,
    bloom_table,
    cms_lookup,
    cms_table,
)


def test_fuzzy_self_join_known_pairs(spark):
    df = spark.createDataFrame(
        [(1, "kitten"), (2, "sitten"), (3, "sittin"), (4, "mitten"), (5, "banana")],
        "id long, name string",
    )
    out = fuzzy_self_join(df, "id", "name", max_dist=1, q=2)
    got = {(r["id_a"], r["id_b"], r["dist"]) for r in out.collect()}
    assert got == {(1, 2, 1), (1, 4, 1), (2, 3, 1), (2, 4, 1)}


def test_fuzzy_self_join_dist2_transitive(spark):
    df = spark.createDataFrame(
        [(1, "kitten"), (2, "sittin"), (3, "bitter")], "id long, name string"
    )
    out = fuzzy_self_join(df, "id", "name", max_dist=2, q=2)
    got = {(r["id_a"], r["id_b"]) for r in out.collect()}
    assert (1, 2) in got  # dist exactly 2
    assert (1, 3) in got  # kitten -> bitten -> bitter


def test_interval_join_half_open_and_single_emit(spark):
    left = spark.createDataFrame(
        [(1, 1, 0, 10), (2, 1, 100, 9000), (3, 2, 0, 10)],
        "lid long, k long, s long, e long",
    )
    right = spark.createDataFrame(
        [
            (10, 1, 10, 20),  # touches lid=1 at endpoint: NO overlap
            (11, 1, 5, 8),  # inside lid=1
            (12, 1, 8000, 8500),  # overlaps lid=2 in its THIRD bucket
            (13, 2, 9, 30),  # 1-sec overlap with lid=3
        ],
        "rid long, k long, s long, e long",
    )
    out = interval_join(
        left, right, ("s", "e"), ("s", "e"), on=["k"], bucket_width=3600
    )
    pairs = [(r["lid"], r["rid"]) for r in out.collect()]
    assert sorted(pairs) == [(1, 11), (2, 12), (3, 13)]  # each exactly once


def test_interval_join_no_keys(spark):
    left = spark.createDataFrame([(1, 0, 100)], "lid long, s long, e long")
    right = spark.createDataFrame(
        [(9, 50, 60), (8, 200, 300)], "rid long, s long, e long"
    )
    out = interval_join(left, right, ("s", "e"), ("s", "e"), bucket_width=64)
    assert [(r["lid"], r["rid"]) for r in out.collect()] == [(1, 9)]


def test_cms_never_undercounts(spark):
    df = spark.createDataFrame(
        [(w,) for w in ["a"] * 50 + ["b"] * 30 + ["c"] * 5 + ["d"] * 1],
        "v string",
    )
    # width 2: heavy collisions guaranteed
    cms = cms_table(df, "v", width=2, depth=2)
    est = {
        r["v"]: r["est"]
        for r in cms_lookup(cms, df, "v", width=2, depth=2).collect()
    }
    exact = {"a": 50, "b": 30, "c": 5, "d": 1}
    assert all(est[k] >= exact[k] for k in exact)
    # ample width: no collisions, estimates exact
    cms2 = cms_table(df, "v", width=4096, depth=4)
    est2 = {
        r["v"]: r["est"]
        for r in cms_lookup(cms2, df, "v", width=4096, depth=4).collect()
    }
    assert est2 == exact


def test_bloom_no_false_negatives(spark):
    members = spark.createDataFrame([(str(i),) for i in range(40)], "v string")
    probes = spark.createDataFrame([(str(i),) for i in range(200)], "v string")
    bloom = bloom_table(members, "v", num_bits=128, num_hashes=3)
    got = {
        r["v"]: r["maybe"]
        for r in bloom_maybe_contains(
            bloom, probes, "v", num_bits=128, num_hashes=3
        ).collect()
    }
    assert all(got[str(i)] for i in range(40))  # no false negatives
    # bitmap is bounded by num_bits rows however many members
    assert bloom.count() <= 128


def test_referential_integrity_duplicate_parents_not_inflated(spark):
    from graphmapreduce_spark.operators.quality import referential_integrity

    child = spark.createDataFrame([(1,), (2,)], "fk long")
    parent = spark.createDataFrame([(1,), (1,), (1,)], "pk long")
    out = referential_integrity(child, parent, "fk", "pk").collect()
    assert out[0]["metric"] == 0.5  # semi-join: 3 duplicate parents ≠ 3 matches


def test_zorder_locality_and_roundtrip(spark):
    from graphmapreduce_spark.operators.layout import cluster_by_zorder, zorder_key

    # full 16x16 grid, 4-bit interleave: sorting by z must visit whole
    # quadrants — each consecutive quarter of the order is one 8x8 block
    grid = spark.createDataFrame(
        [(x, y) for x in range(16) for y in range(16)], "x long, y long"
    )
    rows = (
        grid.withColumn("z", zorder_key(["x", "y"], bits=4))
        .orderBy("z")
        .collect()
    )
    zs = [r["z"] for r in rows]
    assert zs == sorted(zs) and len(set(zs)) == 256  # bijective on the grid
    for qi in range(4):
        chunk = rows[qi * 64 : (qi + 1) * 64]
        xs = [r["x"] for r in chunk]
        ys = [r["y"] for r in chunk]
        assert max(xs) - min(xs) == 7 and max(ys) - min(ys) == 7  # one quadrant

    # cluster_by_zorder preserves rows and drops the key column
    out = cluster_by_zorder(grid, ["x", "y"], bits=4, num_partitions=4)
    assert out.columns == ["x", "y"] and out.count() == 256


def test_fuzzy_self_join_short_strings_brute_forced(spark):
    """Strings shorter than q*(max_dist+1) can be inside the distance
    while sharing ZERO q-grams — the count-filter bound is vacuous for
    them (regression: such pairs were silently dropped).  They must
    come back via the brute-force short-pool, exactly once, alongside
    gram-path pairs."""
    df = spark.createDataFrame(
        [
            (1, "abc"), (2, "xyc"),          # dist 2, no shared 3-grams
            (3, "ab"), (4, "cd"),            # sub-q-length, dist 2
            (5, "11111"), (6, "22222"),      # short but far from all
            (7, "abcdefghijkl"), (8, "abcdefghijkx"),  # long, gram path
        ],
        "id long, name string",
    )
    out = fuzzy_self_join(df, "id", "name", max_dist=2, q=3)
    rows = [(r["id_a"], r["id_b"], r["dist"]) for r in out.collect()]
    assert len(rows) == len(set(rows)), f"duplicate pairs: {rows}"
    got = set(rows)
    assert (1, 2, 2) in got     # short pair, zero shared grams
    assert (3, 4, 2) in got     # sub-q-length pair
    assert (7, 8, 1) in got     # gram path unaffected
    assert not any(5 in (a, b) or 6 in (a, b) for a, b, _ in got)
