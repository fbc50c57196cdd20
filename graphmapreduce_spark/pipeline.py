"""End-to-end corpus preparation — the composition the individual
operators exist for: a user of the reference switching to this engine
gets the whole normalize → quality-gate → dedup → tokenize → pack flow
as one call, not a parts list.

Every stage is an already-oracled operator (q85 normalize, q127 gopher
rules, q40 exact dedup, q92 packing), so the composed plan is itself
value-checkable end-to-end (q141) — and because each stage is a pure
DataFrame transform, Catalyst fuses the narrow ones (normalize + gate +
fingerprint run in ONE scan) and only the dedup agg and the packing
cumsum shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphmapreduce_spark.functions import text as T
from graphmapreduce_spark.operators.packing import packed_layout
from graphmapreduce_spark.operators.quality import gopher_rules


def prepare_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    capacity: int = 2048,
    range_size: int = 100_000,
    **gate_kwargs,
) -> DataFrame:
    """Normalize text, drop documents failing the Gopher quality gates,
    exact-dedup on the normalized form (keep the smallest id), count
    tokens, and lay the survivors out into ``capacity``-token context
    windows.  Returns (id_col, n_tokens, bin, offset) — the loader
    manifest for a pretraining run.  ``gate_kwargs`` pass through to
    `gopher_rules` (tune thresholds to the corpus register — web text
    carries the paper defaults; terse technical corpora need looser
    word-count/stopword floors).

    Shuffle budget: ONE dedup agg (group on normalized text, min id) +
    the packing cumsum's range window; everything else is scan-fused
    expressions.  At 100 TB swap the exact-dedup stage for the MinHash
    path (`operators/dedup.py`) by deduping ids first and semi-joining
    here — the stage boundary is the contract.
    """
    norm = docs.select(
        F.col(id_col),
        T.normalize_text(text_col).alias("_ntext"),
    )
    gated = gopher_rules(
        norm, id_col, "_ntext", **gate_kwargs
    ).filter(F.col("keep")).select(id_col)
    kept = norm.join(gated, id_col, "left_semi")
    canonical = kept.groupBy("_ntext").agg(F.min(id_col).alias(id_col))
    toks = canonical.select(
        F.col(id_col),
        T.token_count("_ntext").cast("long").alias("n_tokens"),
    )
    return packed_layout(
        toks, id_col, "n_tokens", capacity=capacity, range_size=range_size
    )
