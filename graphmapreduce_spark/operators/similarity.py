"""Similarity search over embedding columns (north-star [EXT]).

Two paths:

- ``cosine_topk``: exact brute force — broadcast the (small) query set
  against the full corpus, score with codegen'd `zip_with`/`aggregate`
  expressions, keep top-k per query with a window.  At 100 TB the corpus
  side stays partition-parallel; the only shuffle is the final per-query
  top-k (tiny: k rows per partition per query after partial filtering).

- ``ivf_build`` / ``ivf_search``: IVF-style approximate search —
  k-means coarse centroids partition the corpus into cells (the
  "inverted file"); a query probes only its ``nprobe`` nearest cells.
  Scale path: the corpus is scored only where cell ids match, i.e. a
  hash join on cell id instead of a cross join.  The index is built
  ONCE (the k-means iterations and cell assignment are the expensive
  part) and probed many times — the build/search split is the real ANN
  service shape; ``ivf_topk`` is the one-shot convenience wrapper.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from graphmapreduce_spark.functions import vectors as V
from graphmapreduce_spark.graph.algorithms import kmeans


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "vec_id",
    query_vec: str = "embedding",
    include_self: bool = False,
) -> DataFrame:
    """Exact top-k neighbors by cosine for each query vector.

    Returns (query_id, neighbor_id, cosine, rank), rank 1..k,
    deterministic tiebreak on neighbor id.
    """
    c = corpus.select(
        F.col(corpus_id).alias("neighbor_id"),
        F.col(corpus_vec).cast("array<double>").alias("cv"),
    )
    q = queries.select(
        F.col(query_id).alias("query_id"),
        F.col(query_vec).cast("array<double>").alias("qv"),
    )
    scored = c.join(F.broadcast(q), F.lit(True)).select(
        "query_id",
        "neighbor_id",
        F.round(V.cosine(F.col("qv"), F.col("cv")), 6).alias("cosine"),
    )
    if not include_self:
        scored = scored.filter(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


@dataclass
class IvfIndex:
    """A built inverted-file index.

    ``cells`` — (neighbor_id, cv array<double>, cell) the cell-tagged
    corpus; persisted so repeated searches never re-run the k-means
    build.  ``centroids`` — (cell, centroid array<double>), broadcast-
    sized by construction (n_cells × dim).
    """

    cells: DataFrame
    centroids: DataFrame
    n_cells: int

    def unpersist(self) -> None:
        self.cells.unpersist()
        self.centroids.unpersist()


def ivf_build(
    corpus: DataFrame,
    n_cells: int = 16,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    kmeans_iters: int = 5,
    persist: bool = True,
) -> IvfIndex:
    """Build the IVF index once: k-means coarse quantizer (the expensive,
    iterative part) + cell assignment of every corpus vector.  The result
    is probe-ready for any number of ``ivf_search`` calls."""
    c = corpus.select(
        F.col(corpus_id).alias("id"),
        F.col(corpus_vec).cast("array<double>").alias("vec"),
    )
    assign = kmeans(c, k=n_cells, max_iter=kmeans_iters)  # (id, cluster)
    cellized = c.join(assign, "id").select(
        F.col("id").alias("neighbor_id"),
        F.col("vec").alias("cv"),
        F.col("cluster").alias("cell"),
    )
    cent = (
        cellized.groupBy("cell")
        .agg(F.collect_list("cv").alias("vs"))
        .select(
            "cell",
            F.transform(
                F.sequence(F.lit(0), F.size(F.element_at("vs", 1)) - 1),
                lambda d: F.aggregate(
                    F.transform("vs", lambda v: v[d]), F.lit(0.0), lambda a, x: a + x
                )
                / F.size("vs"),
            ).alias("centroid"),
        )
    )
    if persist:
        from pyspark.storagelevel import StorageLevel

        cellized = cellized.persist(StorageLevel.MEMORY_AND_DISK)
        cent = cent.persist(StorageLevel.MEMORY_AND_DISK)
        cent.count()  # materialize both (centroids derive from cells)
    return IvfIndex(cells=cellized, centroids=cent, n_cells=n_cells)


def ivf_search(
    index: IvfIndex,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 4,
    query_id: str = "vec_id",
    query_vec: str = "embedding",
    include_self: bool = False,
) -> DataFrame:
    """Probe a built index: each query ranks the (broadcast) centroids,
    keeps its ``nprobe`` nearest cells, and scores only corpus vectors in
    those cells via a hash join on cell id.  Same output shape as
    ``cosine_topk`` (approximate)."""
    q = queries.select(
        F.col(query_id).alias("query_id"),
        F.col(query_vec).cast("array<double>").alias("qv"),
    )
    probed = (
        q.join(F.broadcast(index.centroids), F.lit(True))
        .select(
            "query_id",
            "qv",
            "cell",
            V.l2_distance(F.col("qv"), F.col("centroid")).alias("cd"),
        )
        .withColumn(
            "pr",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.col("cd").asc(), F.col("cell").asc()
                )
            ),
        )
        .filter(F.col("pr") <= nprobe)
        .select("query_id", "qv", "cell")
    )
    scored = probed.join(index.cells, "cell").select(
        "query_id",
        "neighbor_id",
        F.round(V.cosine(F.col("qv"), F.col("cv")), 6).alias("cosine"),
    )
    if not include_self:
        scored = scored.filter(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_cells: int = 16,
    nprobe: int = 4,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "vec_id",
    query_vec: str = "embedding",
    kmeans_iters: int = 5,
    include_self: bool = False,
) -> DataFrame:
    """One-shot IVF approximate top-k (build + single search).  For
    repeated probing keep the ``ivf_build`` result and call
    ``ivf_search`` per query batch."""
    index = ivf_build(
        corpus,
        n_cells=n_cells,
        corpus_id=corpus_id,
        corpus_vec=corpus_vec,
        kmeans_iters=kmeans_iters,
        persist=False,
    )
    return ivf_search(
        index,
        queries,
        k=k,
        nprobe=nprobe,
        query_id=query_id,
        query_vec=query_vec,
        include_self=include_self,
    )


def fuzzy_self_join(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_dist: int = 2,
    q: int = 3,
) -> DataFrame:
    """Edit-distance self-join: (id_a, id_b, dist) for every pair of
    rows with ``levenshtein(text_a, text_b) <= max_dist`` and
    ``id_a < id_b`` — the entity-resolution / fuzzy-dedup primitive.

    Scale shape — q-gram count filtering, NOT an all-pairs cross join:
    each string explodes into its positional q-grams with multiplicity;
    candidate pairs come from an inverted gram join, and the MULTISET
    intersection size ``sum(least(c_a, c_b))`` prunes to pairs sharing
    at least ``max(|a|,|b|) - q + 1 - q*max_dist`` grams (the classical
    count-filter bound: one edit destroys at most q grams).  Only the
    survivors pay the levenshtein verify.

    The bound is conservative whenever the LONGER string of a pair has
    at least ``q*(max_dist+1)`` chars (then the bound is >= 1, so a
    true pair is guaranteed to share a gram and surface in the join).
    Pairs where BOTH strings are shorter can be inside the distance
    while sharing zero grams, so short strings are routed to a
    brute-force pool: short x short pairs are excluded from the gram
    path and verified directly via a broadcast nested-loop join — the
    pool is tiny by construction (strings under ``q*(max_dist+1)``
    chars, e.g. <9 for the defaults), and short x long pairs stay on
    the gram path, which is exact for them.  No true pair is lost.
    Degenerate case to know about: a corpus-wide shared prefix (ids,
    URLs) makes every pair a candidate — strip the static prefix
    before gramming.
    """
    bound = lambda la, lb: F.greatest(la, lb) - q + 1 - q * max_dist  # noqa: E731
    min_len = q * (max_dist + 1)
    base = df.select(
        F.col(id_col).alias("_id"), F.col(text_col).alias("_t")
    ).withColumn("_len", F.length("_t"))
    grams = base.select(
        "_id",
        "_len",
        F.explode(
            F.expr(f"transform(sequence(1, greatest(length(_t) - {q} + 1, 1)), i -> substring(_t, i, {q}))")
        ).alias("_g"),
    )
    # materialize the counted gram table once: it feeds BOTH sides of
    # the self-join (same pattern as the winnowing self-join, and the
    # triangle-count 3-way join) — without this the explode+agg runs
    # twice and the base table is scanned once per alias
    counted = (
        grams.groupBy("_id", "_len", "_g")
        .agg(F.count(F.lit(1)).alias("_c"))
        .localCheckpoint(eager=False)
    )
    a, b = counted.alias("a"), counted.alias("b")
    cand = (
        a.join(b, (F.col("a._g") == F.col("b._g")) & (F.col("a._id") < F.col("b._id")))
        .groupBy(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.col("a._len").alias("_la"),
            F.col("b._len").alias("_lb"),
        )
        .agg(F.sum(F.least(F.col("a._c"), F.col("b._c"))).alias("_shared"))
        .filter(F.col("_shared") >= bound(F.col("_la"), F.col("_lb")))
        # short x short pairs belong to the brute-force pool below —
        # keeping them out here also keeps the union duplicate-free
        .filter(~((F.col("_la") < min_len) & (F.col("_lb") < min_len)))
        .select("id_a", "id_b")
    )
    sa = base.select(F.col("_id").alias("id_a"), F.col("_t").alias("_ta"))
    sb = base.select(F.col("_id").alias("id_b"), F.col("_t").alias("_tb"))
    grammed = (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("dist", F.levenshtein("_ta", "_tb"))
        .filter(F.col("dist") <= max_dist)
        .select("id_a", "id_b", "dist")
    )
    short = base.filter(F.col("_len") < min_len)
    brute = (
        short.alias("sa")
        .join(F.broadcast(short.alias("sb")), F.col("sa._id") < F.col("sb._id"))
        .withColumn("dist", F.levenshtein(F.col("sa._t"), F.col("sb._t")))
        .filter(F.col("dist") <= max_dist)
        .select(
            F.col("sa._id").alias("id_a"),
            F.col("sb._id").alias("id_b"),
            "dist",
        )
    )
    return grammed.unionByName(brute)


def hard_negatives(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    corpus_label: str = "label",
    query_id: str = "vec_id",
    query_vec: str = "embedding",
    query_label: str = "label",
) -> DataFrame:
    """Hard-negative mining for contrastive training data: for each
    query vector, the top-``k`` most cosine-similar corpus vectors with
    a DIFFERENT label — the highest-loss negatives a triplet/InfoNCE
    sampler wants.  Returns (query_id, neighbor_id, cosine, rank).

    Same plan as `cosine_topk` (broadcast query batch over the
    partition-parallel corpus scan) plus the label-inequality predicate
    pushed into the scoring join, so excluded positives never reach the
    ranking window.  For full-corpus mining swap the broadcast for the
    IVF route (`ivf_build`/`ivf_search`) and apply the same predicate
    at probe time."""
    c = corpus.select(
        F.col(corpus_id).alias("neighbor_id"),
        F.col(corpus_vec).cast("array<double>").alias("cv"),
        F.col(corpus_label).alias("_cl"),
    )
    q = queries.select(
        F.col(query_id).alias("query_id"),
        F.col(query_vec).cast("array<double>").alias("qv"),
        F.col(query_label).alias("_ql"),
    )
    scored = (
        c.join(F.broadcast(q), F.lit(True))
        .filter(F.col("_cl") != F.col("_ql"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(V.cosine(F.col("qv"), F.col("cv")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )
