"""Similarity-search tests: brute-force exactness + IVF recall."""

import numpy as np
import pytest

from graphmapreduce_spark.operators import similarity as S


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.RandomState(7)
    # 3 well-separated gaussian blobs in 8-d
    centers = rng.standard_normal((3, 8)) * 10
    rows = []
    for i in range(90):
        c = centers[i % 3]
        rows.append((i, (c + rng.standard_normal(8) * 0.1).tolist()))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def brute_force_topk(rows, qid, k):
    import math

    vecs = dict(rows)
    q = vecs[qid]

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return d / (na * nb)

    scored = [
        (round(cos(q, v), 6), -i)
        for i, v in vecs.items()
        if i != qid
    ]
    scored.sort(reverse=True)
    return [-i for _, i in scored[:k]]


def test_cosine_topk_matches_local_bruteforce(spark, emb):
    rows = [(r["vec_id"], r["embedding"]) for r in emb.collect()]
    out = S.cosine_topk(emb, emb.filter("vec_id = 0"), k=5)
    got = [r["neighbor_id"] for r in sorted(out.collect(), key=lambda r: r["rank"])]
    expect = brute_force_topk(rows, 0, 5)
    assert got == expect


def test_cosine_topk_rank_shape(spark, emb):
    out = S.cosine_topk(emb, emb.filter("vec_id < 3"), k=4).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r["rank"])
    assert set(by_q) == {0, 1, 2}
    for ranks in by_q.values():
        assert sorted(ranks) == [1, 2, 3, 4]


def test_ivf_recall_on_separated_blobs(spark, emb):
    """With well-separated blobs and nprobe covering the true cell,
    IVF must recover the exact neighbors."""
    exact = S.cosine_topk(emb, emb.filter("vec_id = 0"), k=5)
    approx = S.ivf_topk(
        emb, emb.filter("vec_id = 0"), k=5, n_cells=4, nprobe=2, kmeans_iters=4
    )
    e = {r["neighbor_id"] for r in exact.collect()}
    a = {r["neighbor_id"] for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.8


def test_ivf_build_once_search_many(spark, emb):
    """One ivf_build serves repeated ivf_search calls (the ANN-service
    shape); per-batch results must match the one-shot wrapper."""
    index = S.ivf_build(emb, n_cells=4, kmeans_iters=4)
    try:
        one_shot = S.ivf_topk(
            emb, emb.filter("vec_id = 1"), k=5, n_cells=4, nprobe=2,
            kmeans_iters=4,
        )
        s1 = S.ivf_search(index, emb.filter("vec_id = 1"), k=5, nprobe=2)
        s2 = S.ivf_search(index, emb.filter("vec_id = 2"), k=5, nprobe=2)
        got1 = {(r["neighbor_id"], r["rank"]) for r in s1.collect()}
        expect1 = {(r["neighbor_id"], r["rank"]) for r in one_shot.collect()}
        assert got1 == expect1
        # second search is a different query batch over the same index
        by_q = {r["query_id"] for r in s2.collect()}
        assert by_q == {2}
        assert s2.count() == 5
    finally:
        index.unpersist()


def test_hard_negatives_excludes_same_label(spark):
    from graphmapreduce_spark.operators.similarity import hard_negatives

    rows = [
        (1, [1.0, 0.0], 0),
        (2, [0.99, 0.1], 0),   # same label as 1 -> never its negative
        (3, [0.9, 0.2], 1),
        (4, [0.0, 1.0], 1),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = hard_negatives(df, df.filter("vec_id = 1"), k=2).collect()
    got = [(r["neighbor_id"], r["rank"]) for r in sorted(out, key=lambda r: r["rank"])]
    assert got == [(3, 1), (4, 2)]
