"""Unit tests for the relational operator wrappers on tiny hand-checked
inputs (duckdb-oracle coverage at sf0.01 lives in tools/check_oracle.py
and the driver's CORRECTNESS gate)."""

import datetime as dt

from pyspark.sql import functions as F

from graphmapreduce_spark.operators import asof_join, range_join, top_k, top_k_per_group


def ts(s):
    return dt.datetime.fromisoformat(s)


def test_top_k(spark):
    df = spark.createDataFrame([(i, i % 3) for i in range(10)], "id long, g long")
    out = top_k(df, [F.col("id").desc()], 3).collect()
    assert [r["id"] for r in out] == [9, 8, 7]


def test_top_k_per_group_ties_deterministic(spark):
    df = spark.createDataFrame(
        [(1, "a", 5.0), (2, "a", 5.0), (3, "a", 4.0), (4, "b", 1.0)],
        "id long, g string, v double",
    )
    out = top_k_per_group(df, ["g"], [F.col("v").desc(), F.col("id").asc()], k=2)
    got = {(r["g"], r["id"]) for r in out.collect()}
    assert got == {("a", 1), ("a", 2), ("b", 4)}


def test_asof_backward_basic(spark):
    left = spark.createDataFrame(
        [(1, 1, ts("2024-01-01T10:00:00")), (2, 1, ts("2024-01-01T11:00:00"))],
        "event_id long, k long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (1, ts("2024-01-01T09:30:00"), 10.0),
            (1, ts("2024-01-01T10:30:00"), 20.0),
            (2, ts("2024-01-01T00:00:00"), 99.0),
        ],
        "k long, ts timestamp, v double",
    )
    out = asof_join(left, right, on="k", left_ts="ts", right_ts="ts", value_cols=["v"])
    got = {r["event_id"]: r["v"] for r in out.collect()}
    assert got == {1: 10.0, 2: 20.0}


def test_asof_no_match_is_null(spark):
    left = spark.createDataFrame(
        [(1, 1, ts("2024-01-01T08:00:00"))], "event_id long, k long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(1, ts("2024-01-01T09:00:00"), 1.0)], "k long, ts timestamp, v double"
    )
    out = asof_join(left, right, on="k", left_ts="ts", right_ts="ts", value_cols=["v"])
    assert out.collect()[0]["v"] is None


def test_asof_equal_ts_matches(spark):
    left = spark.createDataFrame(
        [(1, 1, ts("2024-01-01T09:00:00"))], "event_id long, k long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(1, ts("2024-01-01T09:00:00"), 7.0)], "k long, ts timestamp, v double"
    )
    out = asof_join(left, right, on="k", left_ts="ts", right_ts="ts", value_cols=["v"])
    assert out.collect()[0]["v"] == 7.0


def test_asof_forward(spark):
    left = spark.createDataFrame(
        [(1, 1, ts("2024-01-01T08:00:00"))], "event_id long, k long, ts timestamp"
    )
    right = spark.createDataFrame(
        [
            (1, ts("2024-01-01T09:00:00"), 1.0),
            (1, ts("2024-01-01T10:00:00"), 2.0),
        ],
        "k long, ts timestamp, v double",
    )
    out = asof_join(
        left, right, on="k", left_ts="ts", right_ts="ts", value_cols=["v"],
        direction="forward",
    )
    assert out.collect()[0]["v"] == 1.0


def test_range_join(spark):
    left = spark.createDataFrame([(1, 1, 10.0)], "id long, k long, lo double")
    right = spark.createDataFrame(
        [(1, 9.0), (1, 11.0), (1, 25.0)], "k long, x double"
    )
    out = range_join(
        left,
        right,
        ["k"],
        right["x"] > left["lo"],
        right["x"] <= left["lo"] + 5,
    )
    assert [r["x"] for r in out.collect()] == [11.0]


def test_salted_join_matches_plain_join(spark):
    from graphmapreduce_spark.operators.relational import salted_join

    # skewed left: one hot key (1) with many rows
    left = spark.createDataFrame(
        [(1, i) for i in range(500)] + [(2, 0), (3, 1)], "k long, lv long"
    )
    right = spark.createDataFrame(
        [(1, "a"), (2, "b"), (4, "d")], "k long, rv string"
    )
    plain = sorted(
        (r["k"], r["lv"], r["rv"])
        for r in left.join(right, "k").collect()
    )
    salted = sorted(
        (r["k"], r["lv"], r["rv"])
        for r in salted_join(left, right, ["k"], num_salts=8).collect()
    )
    assert salted == plain
    assert len(salted) == 501  # 500 hot-key rows + k=2; k=3 unmatched

    # right/full outer would duplicate unmatched right rows per salt
    import pytest

    with pytest.raises(ValueError, match="salted_join does not support"):
        salted_join(left, right, ["k"], num_salts=8, how="full_outer")
    with pytest.raises(ValueError, match="salted_join does not support"):
        salted_join(left, right, ["k"], num_salts=8, how="right")


def test_hll_sketch_rollup_properties(spark):
    """HLL sketch table: (1) merging fine-grain sketches stays within
    2% of sketching the whole range directly (the union gadget may
    re-encode registers, so bit-equality is NOT guaranteed; lgK=14 has
    ~0.8% relative standard error);
    (2) estimate within 2% of exact distinct."""
    from pyspark.sql import functions as F

    from graphmapreduce_spark.operators import sketches as SK

    df = spark.range(50_000).select(
        (F.col("id") % 7).alias("g"),
        (F.col("id") % 30).alias("day"),
        (F.col("id") % 4231).alias("u"),
    )
    daily = SK.hll_sketch_table(df, ["g", "day"], "u")
    merged = {
        r["g"]: r["approx_distinct"]
        for r in SK.hll_rollup(daily, ["g"]).collect()
    }
    direct = {
        r["g"]: r["approx_distinct"]
        for r in SK.approx_distinct_by(df, ["g"], "u").collect()
    }
    for g in direct:
        assert abs(merged[g] - direct[g]) / direct[g] < 0.02, (
            g, merged[g], direct[g],
        )
    exact = {
        r["g"]: r["n"]
        for r in df.groupBy("g")
        .agg(F.countDistinct("u").alias("n"))
        .collect()
    }
    for g, est in merged.items():
        assert abs(est - exact[g]) / exact[g] < 0.02, (g, est, exact[g])


def test_kll_quantile_rollup_accuracy(spark):
    """Merged-sketch quantiles stay within KLL's rank-error bound of the
    exact percentiles: with k=200 the normalized rank error is ~1.65%,
    so on 0..9999 the p50/p95 estimates must land within ~250 ranks."""
    from graphmapreduce_spark.operators import sketches as SK

    df = spark.range(0, 10_000).select(
        (F.col("id") % 10).alias("g"), F.col("id").cast("double").alias("v")
    )
    sk = SK.kll_sketch_table(df, ["g"], "v")  # 10 fine-grain sketches
    got = SK.kll_quantile_rollup(sk, [], [0.5, 0.95]).collect()[0]
    assert abs(got["q_50"] - 5000) <= 300
    assert abs(got["q_95"] - 9500) <= 300


def test_theta_overlap_exact_below_capacity(spark):
    """Below 2^lgk distinct values theta sketches are exact: the overlap
    report equals the set-algebra ground truth."""
    from graphmapreduce_spark.operators import sketches as SK

    rows = [("a", i) for i in range(100)] + [("b", i) for i in range(60, 200)]
    df = spark.createDataFrame(rows, "seg string, uid long")
    sk = SK.theta_sketch_table(df, ["seg"], "uid", lgk=12)
    got = SK.theta_overlap(sk, "seg", "a", "b").collect()[0]
    assert (got["n_a"], got["n_b"]) == (100, 140)
    assert got["n_union"] == 200
    assert got["n_intersect"] == 40  # 60..99
    assert got["n_a_only"] == 60  # 0..59


def test_sessionize_gap_semantics(spark):
    from graphmapreduce_spark.operators.relational import sessionize

    rows = [
        (1, "2024-01-01 10:00:00"),
        (1, "2024-01-01 10:10:00"),  # same session (10 min gap)
        (1, "2024-01-01 11:00:00"),  # new session (50 min gap)
        (2, "2024-01-01 09:00:00"),  # separate key: own numbering
    ]
    df = spark.createDataFrame(rows, "user_id long, ts_s string").select(
        "user_id", F.col("ts_s").cast("timestamp").alias("ts")
    )
    got = {
        (r["user_id"], r["ts"].minute, r["ts"].hour): r["session_seq"]
        for r in sessionize(df, "user_id", "ts", gap_seconds=1800).collect()
    }
    assert got[(1, 0, 10)] == 1 and got[(1, 10, 10)] == 1
    assert got[(1, 0, 11)] == 2
    assert got[(2, 0, 9)] == 1


def test_python_udtf_lateral(spark):
    from graphmapreduce_spark.functions.udtfs import register_udtfs

    register_udtfs(spark)
    spark.createDataFrame(
        [(1, "a b  c"), (2, None)], "id long, t string"
    ).createOrReplaceTempView("_udtf_t")
    rows = spark.sql(
        "SELECT id, pos, term FROM _udtf_t, LATERAL tokenize_udtf(t)"
    ).collect()
    got = {(r["id"], r["pos"]): r["term"] for r in rows}
    # null text yields no rows; double space collapses like str.split()
    assert got == {(1, 0): "a", (1, 1): "b", (1, 2): "c"}


def test_merge_upsert_semantics(spark):
    from graphmapreduce_spark.operators.relational import merge_upsert

    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    )
    updates = spark.createDataFrame(
        [(2, "B"), (9, "Z")], "k long, v string"
    )
    got = {r["k"]: r["v"] for r in merge_upsert(base, updates, ["k"]).collect()}
    assert got == {1: "a", 2: "B", 3: "c", 9: "Z"}  # replace, insert, keep


def test_merge_apply_cdc_insert_update_delete(spark):
    from graphmapreduce_spark.operators.relational import merge_apply_cdc

    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    )
    changes = spark.createDataFrame(
        [(2, "U", "b2"), (3, "D", None), (4, "I", "d")],
        "k long, op string, v string",
    )
    got = {r["k"]: r["v"] for r in
           merge_apply_cdc(base, changes, ["k"]).collect()}
    assert got == {1: "a", 2: "b2", 4: "d"}  # 3 deleted, 2 updated, 4 new


def test_table_diff_statuses(spark):
    from graphmapreduce_spark.operators.relational import table_diff

    a = spark.createDataFrame(
        [(1, "x", 1.0), (2, "y", 2.0), (3, "z", 3.0), (5, None, 5.0)],
        "k long, name string, bal double",
    )
    b = spark.createDataFrame(
        [(1, "x", 1.0), (2, "y", 9.0), (4, "w", 4.0), (5, "now", 5.0)],
        "k long, name string, bal double",
    )
    rows = {r["k"]: r["status"] for r in
            table_diff(a, b, ["k"], ["name", "bal"]).collect()}
    # 1 is identical -> absent; NULL -> value counts as changed
    assert rows == {2: "changed", 3: "only_a", 4: "only_b", 5: "changed"}


def test_asof_join_tolerance(spark):
    """merge_asof parity: matches farther than tolerance null out; a
    match exactly AT the tolerance boundary survives."""
    from graphmapreduce_spark.operators.relational import asof_join

    left = spark.createDataFrame(
        [(1, 100, "a"), (1, 500, "b"), (2, 100, "c")],
        "k long, t long, tag string",
    )
    right = spark.createDataFrame(
        [(1, 90, 9.0), (1, 400, 4.0), (2, 95, 5.0)],
        "k long, t long, v double",
    )
    out = {r["tag"]: r["v"] for r in asof_join(
        left, right, on="k", left_ts="t", right_ts="t",
        value_cols=["v"], tolerance=10,
    ).collect()}
    assert out["a"] == 9.0     # gap 10 == tolerance -> keeps
    assert out["b"] is None    # nearest is 100 s stale -> nulled
    assert out["c"] == 5.0     # gap 5 -> keeps
    # without tolerance the stale match is kept (old behavior intact)
    base = {r["tag"]: r["v"] for r in asof_join(
        left, right, on="k", left_ts="t", right_ts="t", value_cols=["v"],
    ).collect()}
    assert base["b"] == 4.0


def test_gaps_islands_basic(spark):
    from graphmapreduce_spark.operators import gaps_islands

    df = spark.createDataFrame(
        [(1, 10), (1, 11), (1, 12), (1, 14), (2, 5), (1, 11)],
        "user_id long, day long",
    )
    out = {
        (r["user_id"], r["island_start"], r["island_end"], r["n_buckets"])
        for r in gaps_islands(df, "user_id", "day").collect()
    }
    assert out == {(1, 10, 12, 3), (1, 14, 14, 1), (2, 5, 5, 1)}


def test_skyline_2d_dominance(spark):
    from graphmapreduce_spark.operators import skyline_2d

    # (price, size): (1,5) and (2,9) are the frontier; (2,5) dominated by
    # (1,5) strictly on price; (3,9) dominated by (2,9); duplicates of a
    # frontier point both survive (no strict inequality between them)
    df = spark.createDataFrame(
        [(1, 1.0, 5), (2, 2.0, 9), (3, 2.0, 5), (4, 3.0, 9), (5, 1.0, 5)],
        "id long, price double, size int",
    )
    out = skyline_2d(df, "price", "size")
    assert {r["id"] for r in out.collect()} == {1, 2, 5}


def test_group_mode_tiebreak(spark):
    from graphmapreduce_spark.operators import group_mode

    df = spark.createDataFrame(
        [("x", "b"), ("x", "b"), ("x", "a"), ("x", "a"), ("x", "c"),
         ("y", "z")],
        "g string, v string",
    )
    out = {(r["g"], r["mode"], r["n"]) for r in group_mode(df, ["g"], "v").collect()}
    # x: a and b tie at 2 -> smallest value 'a' wins
    assert out == {("x", "a", 2), ("y", "z", 1)}


def test_weighted_median(spark):
    from graphmapreduce_spark.operators.relational import weighted_median

    df = spark.createDataFrame(
        [("g", 1.0, 1.0), ("g", 2.0, 1.0), ("g", 3.0, 10.0),
         ("h", 1.0, 1.0), ("h", 2.0, 1.0)],
        "k string, v double, w double",
    )
    out = {r["k"]: r["wmedian"] for r in weighted_median(df, ["k"], "v", "w").collect()}
    assert out["g"] == 3.0  # weight 10 at v=3 dominates
    assert out["h"] == 1.0  # exact half reached at the lower value


def test_equi_depth_histogram_ntile_sizes(spark):
    from graphmapreduce_spark.operators.sort import equi_depth_histogram

    df = spark.createDataFrame([(float(i), i) for i in range(1, 11)], "v double, id int")
    out = {
        r["bucket"]: (r["n"], r["lo"], r["hi"])
        for r in equi_depth_histogram(df, "v", ["id"], buckets=3).collect()
    }
    # NTILE(3) over 10 rows: first bucket gets the extra row
    assert out == {1: (4, 1.0, 4.0), 2: (3, 5.0, 7.0), 3: (3, 8.0, 10.0)}


def test_global_rank_is_dense_and_ordered(spark):
    from graphmapreduce_spark.operators.sort import global_rank

    df = spark.createDataFrame(
        [(v,) for v in [5, 3, 9, 1, 7, 2, 8, 4, 6, 0]], "v int"
    ).repartition(4)
    rows = global_rank(df, ["v"], rank_col="r").orderBy("r").collect()
    assert [r["v"] for r in rows] == sorted(range(10))
    assert [r["r"] for r in rows] == list(range(1, 11))


def test_benford_audit_sums_to_one(spark):
    import math

    from graphmapreduce_spark.operators.quality import benford_audit

    df = spark.createDataFrame(
        [(float(v),) for v in [1, 12, 19, 23, 145, 999, 0.5, -3, 31]],
        "v double",
    )
    rows = benford_audit(df, "v").collect()
    # 0.5 and -3 excluded; digits: 1,12,19,145 -> 1; 23 -> 2; 31 -> 3; 999 -> 9
    got = {r["digit"]: r["n"] for r in rows}
    assert got == {1: 4, 2: 1, 3: 1, 9: 1}
    assert abs(sum(r["freq"] for r in rows) - 1.0) < 1e-4
    for r in rows:
        assert r["expected"] == round(math.log10(1 + 1 / r["digit"]), 6)


def test_skew_report_values(spark):
    import math

    from graphmapreduce_spark.operators.quality import skew_report

    df = spark.createDataFrame(
        [("a",)] * 6 + [("b",)] * 2, "k string"
    )
    r = skew_report(df, ["k"]).collect()[0]
    assert (r["n_rows"], r["n_keys"], r["max_n"]) == (8, 2, 6)
    assert r["top_share"] == 0.75
    expected = -(0.75 * math.log(0.75) + 0.25 * math.log(0.25))
    assert r["entropy"] == round(expected, 6)


def test_interval_union_merges_overlaps(spark):
    from graphmapreduce_spark.operators.relational import interval_union

    df = spark.createDataFrame(
        [
            (1, 0, 10), (1, 5, 15), (1, 15, 20),  # chain -> one [0,20]
            (1, 30, 40),                           # separate island
            (2, 0, 1),
        ],
        "u long, s long, e long",
    )
    out = {
        r["u"]: (r["n_intervals"], r["covered"])
        for r in interval_union(df, ["u"], "s", "e").collect()
    }
    assert out[1] == (2, 30)  # [0,20] (20) + [30,40] (10)
    assert out[2] == (1, 1)


def test_band_join_boundary_and_bucket_edges(spark):
    from graphmapreduce_spark.operators.relational import band_join

    left = spark.createDataFrame(
        [(1, 10.0), (2, 99.9)], "lid long, lv double"
    )
    right = spark.createDataFrame(
        [(1, 10.5), (2, 10.6), (3, 100.4), (4, 9.5)],
        "rid long, rv double",
    )
    out = band_join(left, right, "lv", "rv", 0.5)
    got = {(r["lid"], r["rid"]) for r in out.collect()}
    # 10.0 matches 10.5 (exactly eps) and 9.5; 99.9 matches 100.4
    assert got == {(1, 1), (1, 4), (2, 3)}


def test_asof_nearest_picks_closer_and_ties_backward(spark):
    left = spark.createDataFrame(
        [(1, 1, ts("2024-01-01T10:00:00")),   # back 09:59 (60s) vs fwd 10:02 (120s) -> back
         (2, 1, ts("2024-01-01T10:01:00")),   # back 09:59 (120s) vs fwd 10:02 (60s) -> fwd
         (3, 1, ts("2024-01-01T10:00:30"))],  # 90s vs 90s tie -> backward
        "event_id long, k long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(1, ts("2024-01-01T09:59:00"), 1.0),
         (1, ts("2024-01-01T10:02:00"), 2.0)],
        "k long, ts timestamp, v double",
    )
    out = {
        r["event_id"]: r["v"]
        for r in asof_join(
            left, right, on="k", left_ts="ts", right_ts="ts",
            value_cols=["v"], direction="nearest",
        ).collect()
    }
    assert out == {1: 1.0, 2: 2.0, 3: 1.0}


def test_asof_nearest_tolerance(spark):
    left = spark.createDataFrame(
        [(1, 1, ts("2024-01-01T12:00:00"))], "event_id long, k long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(1, ts("2024-01-01T10:00:00"), 5.0)], "k long, ts timestamp, v double"
    )
    out = asof_join(
        left, right, on="k", left_ts="ts", right_ts="ts",
        value_cols=["v"], direction="nearest", tolerance=600,
    ).collect()
    assert out[0]["v"] is None  # nearest match is 2h away, beyond 600s



# ------------------------------------------------------------ geo joins

def test_radius_join_golden(spark):
    import math

    from graphmapreduce_spark.operators.geo import haversine_km, radius_join

    pts = spark.createDataFrame(
        [(1, 0.0, 0.0), (2, 0.0, 1.0), (3, 1.0, 0.0), (4, 50.0, 50.0)],
        "id long, lat double, lon double",
    )
    out = radius_join(pts, pts, 120.0, dist_col="dist_km")
    pairs = {
        (r["id_l"], r["id_r"]): r["dist_km"]
        for r in out.filter("id_l < id_r").collect()
    }
    # 1 degree of lat/lon at the equator is ~111.19 km: (1,2) and (1,3)
    # are inside 120 km; (2,3) is ~157 km diagonal, outside; 4 is far
    assert set(pairs) == {(1, 2), (1, 3)}
    expected = 2 * 6371.0 * math.asin(
        math.sqrt(math.sin(math.radians(1.0) / 2) ** 2)
    )
    for d in pairs.values():
        assert abs(d - round(expected, 3)) < 1e-9
    # blocking must find pairs that straddle a cell boundary
    edge = spark.createDataFrame(
        [(10, 0.0, 1.079), (11, 0.0, 1.081)],
        "id long, lat double, lon double",
    )
    hit = radius_join(edge, edge, 120.0).filter("id_l < id_r").count()
    assert hit == 1


def test_knn_join_tiebreak_and_radius_contract(spark):
    from graphmapreduce_spark.operators.geo import knn_join

    pts = spark.createDataFrame(
        [(1, 0.0, 0.0), (2, 0.0, 1.0), (3, 1.0, 0.0), (4, 50.0, 50.0)],
        "id long, lat double, lon double",
    )
    nn = knn_join(pts, pts, k=1, radius_km=120.0,
                  id_left="id", id_right="id")
    got = {r["id_l"]: r["id_r"] for r in nn.collect()}
    # 2 and 3 are equidistant from 1 -> id tiebreak picks 2;
    # 4 has no neighbor inside the radius -> absent (contract)
    assert got == {1: 2, 2: 1, 3: 1}


def test_radius_join_antimeridian_wrap(spark):
    """Within-radius pairs straddling lon ±180 must be found: the lon
    cell key wraps modulo the cell count so cell 0 and the last cell
    are blocking neighbors (regression: straddling pairs were silently
    missed)."""
    from graphmapreduce_spark.operators.geo import radius_join

    pts = spark.createDataFrame(
        [(1, 0.0, 179.9), (2, 0.0, -179.9), (3, 0.0, 170.0)],
        "id long, lat double, lon double",
    )
    pairs = {
        (r["id_l"], r["id_r"])
        for r in radius_join(pts, pts, 120.0)
        .filter("id_l < id_r")
        .collect()
    }
    # (1,2) is ~22 km across the antimeridian; 3 is ~1100 km away
    assert pairs == {(1, 2)}
    # and each pair appears exactly once (no duplicate candidates from
    # wrapped neighbor-cell aliasing)
    assert radius_join(pts, pts, 120.0).filter("id_l < id_r").count() == 1


def test_knn_join_cross_table_id_collision(spark):
    """For two DIFFERENT tables, a left id that happens to equal a
    right id is a legitimate neighbor and must not be dropped
    (regression: the self-pair filter applied unconditionally)."""
    from graphmapreduce_spark.operators.geo import knn_join

    stores = spark.createDataFrame(
        [(7, 10.0, 10.0)], "id long, lat double, lon double"
    )
    customers = spark.createDataFrame(
        [(7, 10.0, 10.05), (8, 10.0, 10.4)],
        "id long, lat double, lon double",
    )
    nn = knn_join(stores, customers, k=1, radius_km=100.0,
                  id_left="id", id_right="id")
    got = {(r["id_l"], r["id_r"]) for r in nn.collect()}
    assert got == {(7, 7)}
    # self-join default still excludes the zero-distance self pair
    self_nn = knn_join(customers, customers, k=1, radius_km=100.0,
                       id_left="id", id_right="id")
    assert all(r["id_l"] != r["id_r"] for r in self_nn.collect())
