"""Deterministic sampling operators for training-data pipelines.

`df.sample()` is NOT reproducible at scale: its output depends on the
partition layout and the per-partition RNG stream, so the same call over
the same data re-partitioned differently yields a different sample.  A
100 TB corpus pipeline needs sampling that is (a) a pure filter — no
shuffle, pushes down past column pruning, re-runnable per partition on
failure — and (b) content-deterministic, so a train/eval split or a
data-mixture recipe is exactly reproducible across runs, engines and
cluster sizes.  The standard trick: hash the row's stable id with a
seed and keep rows whose hash bucket falls below the rate.

Hash options mirror the dedup operators: ``xxhash64`` (JVM-side, fast
default) and ``md5`` (portable 60-bit — the DuckDB oracle replicates it
bit-for-bit, so sampling itself is value-checked, not just row-counted).

The reference has no sampling surface (its sampling analog is the
splitter sampling inside samplesort.cpp:40-69, a different concern);
these are [EXT] north-star operators.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from graphmapreduce_spark.functions import text as T

# Denominator of the keep-rate fraction: hash mod 1e6 < rate*1e6 gives
# one-in-a-million rate resolution while staying far from the 60-bit
# hash range (no modulo bias worth speaking of).
_BUCKETS = 1_000_000


def _bucket(id_col: Column, seed: int, hash_fn: str) -> Column:
    salted = F.concat(id_col.cast("string"), F.lit(f":{seed}"))
    return F.pmod(T._hash_col(salted, hash_fn), F.lit(_BUCKETS))


def hash_sample(
    df: DataFrame,
    id_col: str,
    fraction: float,
    seed: int = 0,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Deterministic Bernoulli sample: keep a row iff
    ``hash(id:seed) mod 1e6 < fraction * 1e6``.

    Pure narrow filter — no shuffle, no RNG state, survives any
    repartitioning; different seeds give independent samples (disjoint
    splits come from `hash_split`)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    thresh = int(fraction * _BUCKETS)
    return df.filter(_bucket(F.col(id_col), seed, hash_fn) < F.lit(thresh))


def hash_split(
    df: DataFrame,
    id_col: str,
    fractions: list[float],
    seed: int = 0,
    hash_fn: str = "xxhash64",
) -> list[DataFrame]:
    """Disjoint deterministic splits (e.g. train/val/test) from ONE hash:
    contiguous bucket ranges of one hash value, so the splits partition
    the input exactly — no row lost, none duplicated — and stay stable
    when rows are added (an id keeps its split forever)."""
    if any(f < 0 for f in fractions) or abs(sum(fractions) - 1.0) > 1e-9:
        raise ValueError(f"fractions must be >=0 and sum to 1, got {fractions}")
    b = _bucket(F.col(id_col), seed, hash_fn)
    out, lo = [], 0
    for i, f in enumerate(fractions):
        hi = _BUCKETS if i == len(fractions) - 1 else lo + int(f * _BUCKETS)
        out.append(df.filter((b >= F.lit(lo)) & (b < F.lit(hi))))
        lo = hi
    return out


def stratified_hash_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    fractions: Mapping[object, float],
    default_fraction: float = 0.0,
    seed: int = 0,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Per-stratum deterministic sampling — the data-mixture operator:
    ``fractions`` maps a stratum value (source, language, quality tier)
    to its keep rate; strata not listed keep ``default_fraction``.

    Still a pure filter: the rate lookup is a CASE expression compiled
    into the scan, so a 100-way mixture over 100 TB reads each row once
    and shuffles nothing."""
    for k, f in fractions.items():
        if not 0.0 <= f <= 1.0:
            raise ValueError(f"fraction for stratum {k!r} out of [0,1]: {f}")
    if not 0.0 <= default_fraction <= 1.0:
        raise ValueError(f"default_fraction out of [0,1]: {default_fraction}")
    rate = F.lit(int(default_fraction * _BUCKETS))
    for k, f in fractions.items():
        rate = F.when(
            F.col(strata_col) == F.lit(k), F.lit(int(f * _BUCKETS))
        ).otherwise(rate)
    return df.filter(_bucket(F.col(id_col), seed, hash_fn) < rate)


def weighted_hash_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    scale: float = 1.0,
    seed: int = 0,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Per-row Bernoulli sampling with probability
    ``clamp(weight * scale, 0, 1)`` — the quality-weighted data-mixture
    primitive (keep high-quality documents with higher probability),
    content-deterministic like every sampler here: same (id, seed) =>
    same uniform draw, so re-runs, engines and partition layouts agree
    row-for-row.  Pure narrow filter; the weight can be any in-row
    expression (quality score, source prior), no shuffle ever."""
    u = _bucket(F.col(id_col), seed, hash_fn).cast("double") / _BUCKETS
    p = F.least(F.greatest(F.col(weight_col) * scale, F.lit(0.0)), F.lit(1.0))
    return df.filter(u < p)


def stratified_fixed_k(
    df: DataFrame,
    strata_cols: Sequence[str],
    k: int,
    seed: int = 0,
    id_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Deterministic fixed-size sample per stratum: exactly
    min(k, |stratum|) rows from each group, chosen by portable md5
    priority over the id columns — a pure function of the data, stable
    across runs, engines, and partitionings (same contract as
    `hash_sample`, which samples by RATE instead of count).

    One keyed window shuffle (row_number over the hash order); no
    driver state.  ``id_cols`` defaults to every non-strata column —
    pass the real key columns when rows are wide."""
    from pyspark.sql.window import Window as W

    from graphmapreduce_spark.functions.text import md5_hash60

    strata = list(strata_cols)
    ids = list(id_cols) if id_cols is not None else [
        c for c in df.columns if c not in strata
    ]
    pri = md5_hash60(
        F.concat_ws("|", F.lit(str(seed)), *[F.col(c) for c in ids])
    )
    w = W.partitionBy(*strata).orderBy(pri, *[F.col(c) for c in ids])
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def temperature_sample(
    df: DataFrame,
    id_col: str,
    group_col: str,
    alpha: float = 0.5,
    base_rate: float = 1.0,
    seed: int = 0,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Temperature-scaled mixture resampling across groups (the
    multilingual / multi-source rebalancing step of pretraining-corpus
    assembly: sample group g proportionally to n_g^alpha instead of
    n_g, so alpha < 1 flattens the mixture toward small groups).

    Keep probability per group: ``p_g = min(1, base_rate *
    (n_g / n_max)^(alpha - 1))`` — the LARGEST group keeps
    ``base_rate``, smaller groups keep proportionally more, exactly the
    n^alpha reweighting up to the global clamp.  The draw is the
    content-deterministic hash uniform shared by every sampler here, so
    re-runs, engines, and partition layouts agree row-for-row.

    Plan: one tiny group-count agg (|groups| rows) broadcast back onto
    the fact side; the filter itself is narrow.  No data-volume shuffle
    at any scale.
    """
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("_ng"))
    nmax = counts.agg(F.max("_ng").alias("_nmax"))
    rates = counts.crossJoin(F.broadcast(nmax)).select(
        group_col,
        F.least(
            F.lit(1.0),
            F.lit(base_rate)
            * F.pow(
                F.col("_ng").cast("double") / F.col("_nmax"),
                F.lit(alpha - 1.0),
            ),
        ).alias("_pg"),
    )
    u = _bucket(F.col(id_col), seed, hash_fn).cast("double") / _BUCKETS
    return df.join(F.broadcast(rates), group_col).filter(u < F.col("_pg")).drop(
        "_pg"
    )


def weighted_reservoir_k(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
    seed: int = 0,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement of exactly min(k, n) rows
    — Efraimidis–Spirakis A-Res: each row draws priority u^(1/w) from
    a uniform u and the k largest priorities win, which provably
    samples without replacement with probability proportional to
    weight.  THE distributed algorithm for this: priorities are
    per-row independent, so the selection is orderBy+limit
    (TakeOrderedAndProject — per-partition top-k merged at the driver,
    never a global sort).

    md5-deterministic u (same (id, seed) ⇒ same draw, engine- and
    layout-independent; +0.5 bucket centering keeps u strictly inside
    (0, 1) so priorities never collapse to 0/1).  Rows with
    non-positive weight are excluded."""
    from graphmapreduce_spark.functions.text import md5_hash60

    u = (
        F.pmod(
            md5_hash60(
                F.concat(
                    F.col(id_col).cast("string"), F.lit(f":{seed}")
                )
            ),
            F.lit(_BUCKETS),
        ).cast("double")
        + 0.5
    ) / _BUCKETS
    key = F.pow(u, F.lit(1.0) / F.col(weight_col))
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("_pri", key)
        .orderBy(F.desc("_pri"), F.asc(id_col))
        .limit(k)
        .drop("_pri")
    )
