"""Deduplication operators for training-data pipelines.

Five families, each scale-designed (north-star [EXT] mandate,
SURVEY.md §2.2 last row):

- exact: hash-groupBy on content (or md5 fingerprint) — one shuffle.
- MinHash + LSH: shingle → minhash signature → band buckets → candidate
  pairs only within buckets (never the quadratic all-pairs) → exact
  Jaccard verify on candidates.
- SimHash: 64-bit sign-sum fingerprint; near-dups = identical fingerprint
  (or identical band for hamming tolerance).
- n-gram Jaccard: exact similarity join via shingle inverted index
  (explode + self-join on shingle + count agg).
- embedding cosine: near-dups above a cosine threshold, bucketed by
  random-hyperplane LSH to avoid the cross join.

All of it is joins/groupBys over built-in expressions; the only
quadratic step is within-bucket pair generation, bounded by bucket size.
Keep-policy is deterministic everywhere: the smallest id survives.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from graphmapreduce_spark.functions import text as T
from graphmapreduce_spark.functions import vectors as V

# 31-bit Mersenne prime — modular universal hashing for MinHash.
# Coefficients and shingle ids both stay < 2^31, so a*x + b < 2^62 never
# overflows a long (Spark runs ANSI arithmetic by default).
_MERSENNE = (1 << 31) - 1


def exact_dedup(df: DataFrame, content_cols: Sequence[str], id_col: str) -> DataFrame:
    """Keep exactly one row (smallest id) per distinct content tuple."""
    w_cols = [F.col(c) for c in content_cols]
    keep = df.groupBy(*w_cols).agg(F.min(id_col).alias(id_col))
    return df.join(keep, on=[*content_cols, id_col], how="left_semi")


def _hash_coeffs(num_hashes: int, seed: int):
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=num_hashes, dtype=np.int64)
    b = rng.randint(0, _MERSENNE, size=num_hashes, dtype=np.int64)
    return a, b


def minhash_signature(
    col: Column | str,
    num_hashes: int = 64,
    shingle_n: int = 3,
    seed: int = 42,
) -> Column:
    """MinHash signature as array<long> over character shingles
    (expression form — one row in, one array out).

    Universal hashing h_i(x) = (a_i * x + b_i) mod p over xxhash64
    shingle ids.  Coefficients come from a fixed-seed RNG so signatures
    are reproducible across runs/sessions.

    Note: shingle ids are computed once and the per-function min folds
    run over that array.  For corpus-scale signing prefer
    ``minhash_signatures`` (explode + map-side-combined min aggregates).
    """
    a, b = _hash_coeffs(num_hashes, seed)
    shingles = T.char_shingles(col, n=shingle_n, distinct=True)
    ids = F.transform(shingles, lambda s: F.pmod(F.xxhash64(s), F.lit(_MERSENNE)))

    def mins(id_arr: Column) -> Column:
        return F.array(
            *[
                F.array_min(
                    F.transform(
                        id_arr,
                        lambda x: F.pmod(
                            F.lit(int(a[i])) * x + F.lit(int(b[i])),
                            F.lit(_MERSENNE),
                        ),
                    )
                )
                for i in range(num_hashes)
            ]
        )

    # materialize the id array once per row via a lambda binding
    return F.transform(F.array(ids), mins)[0]


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    shingle_n: int = 3,
    seed: int = 42,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Corpus-scale MinHash signing: explode distinct shingles to
    (id, shingle_hash) rows, then one groupBy(id) with ``num_hashes``
    min() aggregates — each shingle is hashed exactly once, the mins
    partial-combine map-side, and parallelism follows the corpus
    partitioning instead of per-row expression width.

    ``hash_fn='md5'`` derives shingle ids from the portable 60-bit md5
    hash so a SQL oracle can replicate signatures exactly.

    Returns (id_col, sig array<long>).
    """
    a, b = _hash_coeffs(num_hashes, seed)
    # spread rows across cores BEFORE the ~|text| fan-out of the explode:
    # a corpus read from few files would otherwise shingle serially
    # (input-parallelism-gated — no corpus shuffle when the scan already
    # parallelizes; operators/_spread.py)
    from graphmapreduce_spark.operators._spread import spread_by

    exploded = (
        spread_by(df.select(id_col, text_col), F.col(id_col))
        .select(
            F.col(id_col),
            F.explode(
                T.char_shingles(text_col, n=shingle_n, distinct=True)
            ).alias("_s"),
        )
        .withColumn(
            "_h", F.pmod(T._hash_col(F.col("_s"), hash_fn), F.lit(_MERSENNE))
        )
    )
    aggd = exploded.groupBy(id_col).agg(
        *[
            F.min(
                F.pmod(F.lit(int(a[i])) * F.col("_h") + F.lit(int(b[i])), F.lit(_MERSENNE))
            ).alias(f"_m{i}")
            for i in range(num_hashes)
        ]
    )
    return aggd.select(
        id_col, F.array(*[F.col(f"_m{i}") for i in range(num_hashes)]).alias("sig")
    )


def _band_rows(
    df: DataFrame,
    id_col: str,
    sig_col: str,
    num_hashes: int,
    bands: int,
    exact_buckets: bool,
) -> DataFrame:
    """(_id, band, bucket) rows: the signature split into ``bands``
    slices, bucketed by (band index, slice content) — shared by the
    self-join (lsh_candidate_pairs) and the batch-vs-corpus
    (incremental_near_dup_pairs) candidate generators."""
    rows_per_band = num_hashes // bands
    banded = df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.slice(
                    F.col(sig_col), b * rows_per_band + 1, rows_per_band
                ),
            )
        ).alias("band", "band_sig"),
    )
    if exact_buckets:
        return banded.select(
            "_id",
            "band",
            F.concat_ws(
                "_", F.col("band_sig").cast("array<string>")
            ).alias("bucket"),
        )
    return banded.select(
        "_id",
        "band",
        F.xxhash64(
            F.col("band_sig").cast("string"), F.col("band")
        ).alias("bucket"),
    )


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str,
    sig_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    exact_buckets: bool = False,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Banding: split the signature into ``bands`` rows, bucket by
    (band index, band content); docs sharing any bucket become a
    candidate pair (id_a < id_b, distinct).

    ``exact_buckets=True`` keeps the band content itself (as a string)
    as the bucket key instead of its xxhash64 — collision-free, SQL-
    oracle-replicable; the default 8-byte hash keys shuffle less.

    ``max_bucket_size`` bounds the within-bucket pair blowup: a
    degenerate bucket (mass-duplicated boilerplate puts df docs in one
    band bucket) would otherwise emit O(df²) pairs from the self-join.
    Buckets over the cap switch to STAR expansion — every member pairs
    with the bucket's min id only, O(df) pairs — which preserves the
    bucket's connected component exactly (transitive dedup clustering
    downstream recovers the same groups) while dropping the redundant
    within-bucket cross pairs.  The default ``None`` keeps exact
    all-pairs semantics (the SQL-oracle-comparable contract); pass a
    cap EXPLICITLY for corpus-scale runs — at 100 TB a single viral
    boilerplate bucket is otherwise a quadratic straggler.  With a cap
    set, bucket sizes are annotated lazily by a map-side-combined
    groupBy joined back onto the banded rows — no extra detection job,
    and no single-task hot spot on the viral bucket itself."""
    banded = _band_rows(
        df, id_col, sig_col, num_hashes, bands, exact_buckets
    )
    if max_bucket_size is not None:
        # ONE lazy plan for both the common and the degenerate case,
        # with NO single-task hot spot on a viral bucket (VERDICT r07
        # item 1 — the r07 shape computed count/min as a whole-partition
        # window, which funnels the entire viral bucket through one
        # task before the cap can filter it, and AQE cannot split a
        # window partition):
        #   1. per-bucket count/min by groupBy — partial aggregates
        #      combine map-side, so even a 10M-member bucket reduces to
        #      one narrow row per map partition before its exchange;
        #   2. ONLY the oversized buckets (rare by construction — at
        #      most |banded|/cap of them exist) are broadcast back, as
        #      the tiny (band, bucket, _hub) list;
        #   3. routing is then two broadcast joins over `banded` —
        #      anti (small side) + inner (star side) — which add ZERO
        #      exchange of the banded rows; the self-join below keeps
        #      its one reused (bucket, band) exchange as before.
        # (Annotating via a full groupBy+join-back was measured ~2 s
        # slower in-recipe at sf0.1: it re-exchanges the whole banded
        # table for the join; the broadcast-the-exceptions shape costs
        # only the narrow stats aggregate.)
        big_buckets = (
            banded.groupBy("band", "bucket")
            .agg(
                F.count(F.lit(1)).alias("_bn"),
                F.min("_id").alias("_hub"),
            )
            .filter(F.col("_bn") > max_bucket_size)
            .select("band", "bucket", "_hub")
        )
        small = banded.join(
            F.broadcast(big_buckets.select("band", "bucket")),
            ["band", "bucket"],
            "left_anti",
        )
        big = banded.join(
            F.broadcast(big_buckets), ["band", "bucket"]
        )
    else:
        small, big = banded, None
    l, r = small.alias("l"), small.alias("r")
    pairs = (
        l.join(
            r,
            (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.band") == F.col("r.band"))
            & (F.col("l._id") < F.col("r._id")),
        )
        .select(F.col("l._id").alias("id_a"), F.col("r._id").alias("id_b"))
    )
    if big is not None:
        # star expansion: every member of an oversized bucket pairs
        # with the bucket min only — id_a < id_b holds because _hub is
        # the bucket minimum
        star = big.filter(F.col("_id") != F.col("_hub")).select(
            F.col("_hub").alias("id_a"), F.col("_id").alias("id_b")
        )
        pairs = pairs.unionByName(star)
    return pairs.distinct()


def minhash_lsh_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.8,
    num_hashes: int = 64,
    bands: int | None = None,
    shingle_n: int = 3,
    seed: int = 42,
    hash_fn: str = "xxhash64",
    max_bucket_size: int | None = None,
    est_margin: float | None = None,
    verify_sample_mod: int | None = None,
    verify_sample_margin: float = 0.1,
) -> DataFrame:
    """Near-duplicate pairs with exact-Jaccard verification of LSH
    candidates.  Returns (id_a, id_b, jaccard) with id_a < id_b.

    ``verify_sample_mod`` (opt-in; e.g. 4) inserts a second
    DETERMINISTIC prefilter between the signature estimate and the full
    intersection: each document's hashed shingle set is subsampled to
    the shingles with ``hash % mod == 0`` (a 1/mod content-keyed
    sample — both documents of a pair sample the SAME shingles, the
    classic bottom-sketch property), the Jaccard of the sampled sets
    estimates the true Jaccard with sd ≈ √(J(1−J)·mod/|A∪B|), and
    pairs whose sampled estimate falls below
    ``threshold − verify_sample_margin`` skip the full verify.  On
    corpora whose candidate sets are dominated by moderate-similarity
    false positives this removes most of the intersection work at
    1/mod of the array width (measured: the sf1 rehearsal verify
    28.3 s → ~8 s at mod=4).  Pairs with an empty sampled union pass
    through to the full verify (no false drops on tiny documents).
    Deterministic given the hash, hence oracle-replicable in SQL.

    ``max_bucket_size`` (opt-in; e.g. 4096 for corpus-scale runs) caps
    degenerate band buckets via star expansion (see
    `lsh_candidate_pairs`); note that inside an oversized bucket only
    hub pairs are verified, so pairwise recall there is deliberately
    reduced to what transitive clustering needs.  The ``None`` default
    keeps exact all-pairs semantics (oracle-comparable).

    ``est_margin`` (opt-in) inserts a signature-estimate prefilter
    between banding and exact verification: candidate pairs whose
    signature-agreement fraction (an unbiased Jaccard estimator) falls
    below ``threshold - est_margin`` are dropped BEFORE the expensive
    shingle-set intersection.  Signature rows are ~``num_hashes``
    longs — ~40× narrower than shingle arrays — so on template-heavy
    corpora where banding admits many moderate-similarity false
    positives (measured: 13.9M candidates → 250k verified at an
    sf1-equivalent rehearsal) this removes most verify traffic.  It is
    APPROXIMATE: a true pair at exactly ``threshold`` survives with
    probability P[Binom(num_hashes, t) ≥ (t - est_margin)·num_hashes]
    (e.g. ~99.5% at num_hashes=32, t=0.5, est_margin=0.2; pairs above
    the threshold survive with higher probability still).  ``None``
    (default) keeps the oracle-exact contract.

    Verification itself intersects 60-bit HASHED shingle sets (the same
    ids the signatures are built from), not raw shingle strings: the
    Jaccard value is identical unless two distinct shingles of one
    document collide in 60 bits (p < 1e-12 per document), and long
    arrays intersect ~2× faster while shuffling ~40% fewer bytes.

    ``bands`` defaults to the largest b with (1/b)^(b/num_hashes) ≥
    threshold — i.e. the banding whose S-curve knee sits at the requested
    threshold, which keeps false-positive candidates (and therefore the
    within-bucket pair blowup) bounded.  Shingle sets are only
    materialized for candidate ids, never for the whole corpus.
    """
    if bands is None:
        bands = 1
        for b in range(1, num_hashes + 1):
            if num_hashes % b:
                continue
            r = num_hashes // b
            if (1.0 / b) ** (1.0 / r) >= threshold:
                bands = b
        bands = max(bands, 1)
    sigs = minhash_signatures(
        df, id_col, text_col, num_hashes, shingle_n, seed, hash_fn
    ).withColumnRenamed(id_col, "_id")
    # Production (staged) path only — see the `staged` comment below:
    # materialize signatures ONCE: downstream they are scanned up to
    # four times (banding for the self-join — twice without exchange
    # reuse — plus the est-margin sides), and every scan would re-run
    # the whole shingle-explode + num_hashes-min-agg pipeline from the
    # corpus.  The table is (id, num_hashes longs) — the narrowest
    # artifact of the whole recipe, so its materialization cost is a
    # fraction of ONE recomputation; localCheckpoint (not persist) is
    # GC-scoped, so repeated calls don't accumulate session cache.
    if (
        max_bucket_size is not None
        or est_margin is not None
        or verify_sample_mod is not None
    ):
        # lazy: materialized by the first action that reaches it (the
        # verify/cluster chain), then every later scan reads the
        # checkpointed blocks — eager cost one standalone driver job
        sigs = sigs.localCheckpoint(eager=False)
    cands = lsh_candidate_pairs(
        sigs, "_id", "sig", num_hashes, bands,
        exact_buckets=(hash_fn == "md5"),
        max_bucket_size=max_bucket_size,
    )
    if est_margin is not None:
        cut = max(0.0, threshold - est_margin)
        sa = sigs.select(
            F.col("_id").alias("id_a"), F.col("sig").alias("_sig_a")
        )
        sb = sigs.select(
            F.col("_id").alias("id_b"), F.col("sig").alias("_sig_b")
        )
        agree = F.aggregate(
            F.zip_with(
                "_sig_a",
                "_sig_b",
                lambda x, y: (x == y).cast("int"),
            ),
            F.lit(0),
            lambda acc, v: acc + v,
        )
        cands = (
            cands.join(sa, "id_a")
            .join(sb, "id_b")
            .filter(agree >= F.lit(cut * num_hashes))
            .select("id_a", "id_b")
        )
    # The production path (any of the candidate-thinning knobs set —
    # the q576 recipe) is STAGED: the surviving pair table is
    # materialized once (both the id prefilter below and the verify
    # joins scan it, and each scan would re-run the banded self-join +
    # est-margin signature joins), shingle sets are built for CANDIDATE
    # ids only (an inner join on the pair table restricts to those ids
    # anyway, but Spark would still shingle the whole corpus on both
    # join sides), spread across cores before the per-shingle hash
    # fan-out (few-file corpora scan as few partitions), and
    # materialized ONCE — the a/b verify sides and the two sampled
    # sides would otherwise each re-shingle from the raw text.
    #
    # The uncapped exact-contract path (q46: every knob None) keeps the
    # original single lazy plan: its candidate set is by-design
    # super-linear (VERDICT r06), so materializing it + the id-set
    # semi-join costs MORE than the exchange reuse Catalyst already
    # finds in the one-plan shape (measured 4.5 s → 9.9 s at sf0.1 when
    # staged — the staging is a win only when candidates are thinned).
    staged = (
        max_bucket_size is not None
        or est_margin is not None
        or verify_sample_mod is not None
    )
    if staged:
        cands = cands.localCheckpoint(eager=False)
        cand_ids = (
            cands.select(F.col("id_a").alias("_sid"))
            .unionByName(cands.select(F.col("id_b").alias("_sid")))
            .distinct()
        )
        from graphmapreduce_spark.operators._spread import spread_by

        sh_src = spread_by(
            df.select(F.col(id_col).alias("_sid"), F.col(text_col))
            .join(cand_ids, "_sid", "left_semi"),
            F.col("_sid"),
        )
    else:
        # no staging, but still spread rows before the shingle fan-out:
        # both verify sides derive from this one exchange
        # (ReusedExchange), so a few-file corpus no longer shingles
        # serially (measured 4.1 s → 2.9 s at sf0.1 for q46;
        # input-parallelism-gated, operators/_spread.py)
        from graphmapreduce_spark.operators._spread import spread_by

        sh_src = spread_by(
            df.select(F.col(id_col).alias("_sid"), F.col(text_col)),
            F.col("_sid"),
        )
    # verify on hashed shingle-id sets — value-identical to raw-shingle
    # Jaccard (full 60/64-bit hash space: within-doc collision p < 1e-12,
    # NOT the 31-bit signature space, whose ~2e-4/doc collision rate
    # would visibly shrink sets) and ~40% narrower than string arrays
    sh = sh_src.select(
        "_sid",
        F.array_distinct(
            F.transform(
                T.char_shingles(text_col, n=shingle_n, distinct=True),
                lambda s: T._hash_col(s, hash_fn),
            )
        ).alias("_sh"),
    )
    # both paths lazily checkpoint the hashed shingle arrays: the a/b
    # verify sides (and the sampled sides) each sit above this table, so
    # the per-shingle hashing — not just the scan — would otherwise run
    # once per side; materializing (id, array<long>) on first use
    # halves it, and on the uncapped one-plan path it is the ONLY
    # materialization (full staging measured worse there, see above)
    sh = sh.localCheckpoint(eager=False)
    if verify_sample_mod is not None:
        # attach the sampled AND full shingle arrays in ONE join per
        # pair side (the sampled set is a projection of the full array,
        # so a separate sm table costs two extra joins over the pair
        # table for nothing); the sampled prefilter then runs ahead of
        # the full intersection inside the same codegen stage
        m = int(verify_sample_mod)
        cut2 = max(0.0, threshold - verify_sample_margin)
        sh2 = sh.select(
            "_sid",
            "_sh",
            F.filter(
                "_sh", lambda h: F.pmod(h, F.lit(m)) == 0
            ).alias("_shs"),
        )
        a = sh2.select(
            F.col("_sid").alias("id_a"),
            F.col("_sh").alias("sh_a"),
            F.col("_shs").alias("sm_a"),
        )
        b = sh2.select(
            F.col("_sid").alias("id_b"),
            F.col("_sh").alias("sh_b"),
            F.col("_shs").alias("sm_b"),
        )
        uni = F.size(F.array_union("sm_a", "sm_b"))
        sampled_j = (
            F.size(F.array_intersect("sm_a", "sm_b")).cast("double") / uni
        )
        # short docs pass through un-prefiltered: with a sampled union
        # below ~8·mod the sampling sd (≈ sqrt(J(1-J)/uni)) exceeds the
        # margin and true near-dups would be false-dropped (e.g.
        # |A∪B|≈50, mod=4, J=0.8 → sd≈0.11 > 0.1); the exact verify
        # below still filters them, so this costs recall nothing
        min_uni = 8 * m
        prefilter = (uni < F.lit(min_uni)) | (sampled_j >= cut2)
        joined = (
            cands.join(a, "id_a").join(b, "id_b").filter(prefilter)
        )
    else:
        a = sh.select(
            F.col("_sid").alias("id_a"), F.col("_sh").alias("sh_a")
        )
        b = sh.select(
            F.col("_sid").alias("id_b"), F.col("_sh").alias("sh_b")
        )
        joined = cands.join(a, "id_a").join(b, "id_b")
    verified = (
        joined.withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
            / F.size(F.array_union("sh_a", "sh_b")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )
    return verified


def _knee_bands(num_hashes: int, threshold: float) -> int:
    """Largest divisor banding whose S-curve knee sits at ``threshold``
    (the q46 rule, shared by all banded generators)."""
    bands = 1
    for b in range(1, num_hashes + 1):
        if num_hashes % b:
            continue
        r = num_hashes // b
        if (1.0 / b) ** (1.0 / r) >= threshold:
            bands = b
    return max(bands, 1)


def build_near_dup_index(
    corpus: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.8,
    num_hashes: int = 64,
    bands: int | None = None,
    shingle_n: int = 3,
    seed: int = 42,
    hash_fn: str = "xxhash64",
) -> dict:
    """The PERSISTABLE near-dup index of a corpus: a dict with two
    DataFrames — ``bands`` (corpus_id, band, bucket) and ``shingles``
    (corpus_id, _sh_corpus_id hashed shingle array) — plus the banding
    parameters that arriving batches must reuse.  Write both frames to
    parquet ONCE after corpus dedup; every daily
    `incremental_near_dup_pairs(corpus_index=...)` call then skips the
    corpus-side signature/shingle scans entirely — the 100 TB corpus
    is never re-read for an arriving batch."""
    if bands is None:
        bands = _knee_bands(num_hashes, threshold)
    sigs = minhash_signatures(
        corpus, id_col, text_col, num_hashes, shingle_n, seed, hash_fn
    )
    bands_df = _band_rows(
        sigs, id_col, "sig", num_hashes, bands, hash_fn == "md5"
    ).select(F.col("_id").alias("corpus_id"), "band", "bucket")
    shingles_df = corpus.select(
        F.col(id_col).alias("corpus_id"),
        F.array_distinct(
            F.transform(
                T.char_shingles(text_col, n=shingle_n, distinct=True),
                lambda s: T._hash_col(s, hash_fn),
            )
        ).alias("_sh_corpus_id"),
    )
    return {
        "bands": bands_df,
        "shingles": shingles_df,
        "num_hashes": num_hashes,
        "bands_n": bands,
        "shingle_n": shingle_n,
        "seed": seed,
        "hash_fn": hash_fn,
    }


def save_near_dup_index(index: dict, path: str) -> None:
    """Persist a `build_near_dup_index` dict as ONE self-describing
    parquet artifact: ``<path>/bands``, ``<path>/shingles``, and a
    one-row ``<path>/params`` table carrying the banding parameters —
    so a later session (or another cluster) reloads everything it
    needs to keep batch buckets compatible with the corpus."""
    spark = index["bands"].sparkSession
    index["bands"].write.mode("overwrite").parquet(path + "/bands")
    index["shingles"].write.mode("overwrite").parquet(path + "/shingles")
    spark.createDataFrame(
        [
            (
                int(index["num_hashes"]),
                int(index["bands_n"]),
                int(index["shingle_n"]),
                int(index["seed"]),
                str(index["hash_fn"]),
            )
        ],
        "num_hashes int, bands_n int, shingle_n int, seed int,"
        " hash_fn string",
    ).write.mode("overwrite").parquet(path + "/params")


def load_near_dup_index(spark, path: str) -> dict:
    """Reload a `save_near_dup_index` artifact; inverse round-trip."""
    p = spark.read.parquet(path + "/params").collect()[0]
    return {
        "bands": spark.read.parquet(path + "/bands"),
        "shingles": spark.read.parquet(path + "/shingles"),
        "num_hashes": p["num_hashes"],
        "bands_n": p["bands_n"],
        "shingle_n": p["shingle_n"],
        "seed": p["seed"],
        "hash_fn": p["hash_fn"],
    }


def incremental_near_dup_pairs(
    corpus: DataFrame | None,
    batch: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.8,
    num_hashes: int = 64,
    bands: int | None = None,
    shingle_n: int = 3,
    seed: int = 42,
    hash_fn: str = "xxhash64",
    corpus_index: dict | None = None,
) -> DataFrame:
    """Near-dup pairs between a NEW batch and an EXISTING corpus —
    (batch_id, corpus_id, jaccard) — without ever pairing the corpus
    against itself: the daily-increment production pattern.  A 100 TB
    corpus is deduped ONCE (`pipeline.dedup_corpus`); each day's
    arrivals then run this asymmetric check, whose cost scales with
    the BATCH.

    Pass ``corpus_index`` (from `build_near_dup_index`, typically
    re-read from parquet) to skip the corpus-side signature/shingle
    scans — banding parameters then come FROM the index so batch and
    corpus buckets stay compatible; ``corpus`` may be None.

    Candidates come from a band-bucket EQUI join of batch bands against
    corpus bands (never a self-join side); verification intersects
    hashed shingle sets only for candidates.  Banding defaults to the
    q46 threshold-knee rule."""
    if corpus is None and corpus_index is None:
        raise ValueError(
            "incremental_near_dup_pairs needs either a corpus DataFrame"
            " or a corpus_index from build_near_dup_index"
        )
    if corpus_index is not None:
        num_hashes = corpus_index["num_hashes"]
        bands = corpus_index["bands_n"]
        shingle_n = corpus_index["shingle_n"]
        seed = corpus_index["seed"]
        hash_fn = corpus_index["hash_fn"]
        cb = corpus_index["bands"]
        corpus_sh = corpus_index["shingles"]
    else:
        if bands is None:
            bands = _knee_bands(num_hashes, threshold)
        idx = build_near_dup_index(
            corpus, id_col, text_col, threshold, num_hashes, bands,
            shingle_n, seed, hash_fn,
        )
        cb = idx["bands"]
        corpus_sh = idx["shingles"]
    exact = hash_fn == "md5"

    bb = _band_rows(
        minhash_signatures(
            batch, id_col, text_col, num_hashes, shingle_n, seed, hash_fn
        ),
        id_col, "sig", num_hashes, bands, exact,
    ).select(F.col("_id").alias("batch_id"), "band", "bucket")
    cands = bb.join(cb, ["band", "bucket"]).select(
        "batch_id", "corpus_id"
    ).distinct()

    batch_sh = batch.select(
        F.col(id_col).alias("batch_id"),
        F.array_distinct(
            F.transform(
                T.char_shingles(text_col, n=shingle_n, distinct=True),
                lambda s: T._hash_col(s, hash_fn),
            )
        ).alias("_sh_batch_id"),
    )
    return (
        cands.join(batch_sh, "batch_id")
        .join(corpus_sh, "corpus_id")
        .withColumn(
            "jaccard",
            F.size(
                F.array_intersect("_sh_batch_id", "_sh_corpus_id")
            ).cast("double")
            / F.size(F.array_union("_sh_batch_id", "_sh_corpus_id")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select(
            "batch_id", "corpus_id", F.round("jaccard", 6).alias("jaccard")
        )
    )


def winnowing_fingerprints(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 8,
    w: int = 4,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Winnowing fingerprints (Schleimer et al., SIGMOD'03) as rows
    (id, fp): min rolling-hash in each window of ``w`` consecutive
    character n-grams, deduplicated.

    Shuffle-based formulation — posexplode the rolling hashes, then a
    bounded-frame window min — rather than the nested array-expression
    form (``functions.text.winnowing_fingerprint``): per-row expression
    depth stays constant, work distributes with the corpus partitioning,
    and skewed long documents parallelize across their hash positions.
    """
    from pyspark.sql.window import Window

    hs = df.select(
        F.col(id_col),
        F.posexplode(T.rolling_hashes(text_col, n, hash_fn)).alias("pos", "h"),
    )
    frame = (
        Window.partitionBy(id_col).orderBy("pos").rowsBetween(0, w - 1)
    )
    whole = Window.partitionBy(id_col)
    return (
        hs.withColumn("_sz", F.count(F.lit(1)).over(whole))
        .withColumn("_wmin", F.min("h").over(frame))
        .filter(F.col("pos") <= F.greatest(F.col("_sz") - w, F.lit(0)))
        .select(F.col(id_col), F.col("_wmin").alias("fp"))
        .distinct()
    )


def dedup_by_pairs(df: DataFrame, id_col: str, pairs: DataFrame) -> DataFrame:
    """Greedy keep-smallest-id dedup: drop any row whose id appears as the
    larger side of a near-dup pair.  (Deterministic, single anti-join; the
    transitive-closure variant is `dedup_clusters` for cluster-level
    dedup.)"""
    losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(losers, id_col, "left_anti")


def dedup_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 50,
) -> DataFrame:
    """Transitive closure of near-dup pairs: (id, cluster) where cluster
    is the smallest doc id in the connected component of the pair graph.

    Near-dup similarity is NOT transitive — A~B and B~C do not make A and
    C similar — so corpus-level dedup takes the closure explicitly and
    keeps one canonical document per cluster (the standard practice in
    large-scale training-data dedup; `dedup_by_pairs` is the greedy
    non-transitive variant).

    Scale shape: the pair graph holds only near-dup ids — a small
    fraction of a 100 TB corpus.  The closure is size-adaptive, the
    same budget logic Spark applies to broadcast joins:

    - If the materialized pair table is within
      ``spark.graphmapreduce.clusterBroadcastMaxPairs`` rows (default
      1M ≈ 16 MB of long pairs — well under the broadcast-relation
      budget the session already grants every BHJ build side), the
      closure runs as an exact min-id union-find over the collected
      pairs and ships back as one small mapping table.  An iterative
      Pregel loop on a graph this size is pure superstep overhead:
      every superstep costs a full stage wave regardless of row count
      (measured: ~6 s for a 241-pair graph at sf0.1 vs ~0.3 s via the
      broadcast path — and on a real cluster each superstep is a
      cluster-wide barrier).
    - Above the cap — corpora whose near-dup pair set itself is beyond
      broadcast scale — the distributed path is unchanged: min-label
      propagation via the Pregel driver, one hash join + min-agg per
      superstep, lineage truncated per chunk, converging in O(cluster
      diameter) supersteps (dup clusters are short chains in practice).

    Both paths produce the identical (id, cluster = min id in the
    connected component) mapping; the count action that picks the path
    also materializes the pair table's lazy checkpoint, so the Pregel
    fallback never recomputes the (expensive) pair derivation.
    """
    from graphmapreduce_spark.graph.algorithms import connected_components
    from graphmapreduce_spark.graph.property_graph import PropertyGraph

    spark = pairs.sparkSession
    # try_cast: under ANSI SQL (the Spark 4 default) a plain cast THROWS
    # on a malformed id; try_cast yields NULL instead, and the filter
    # below drops those rows
    edges = pairs.select(
        F.col(id_a).try_cast("long").alias("src"),
        F.col(id_b).try_cast("long").alias("dst"),
    ).localCheckpoint(eager=False)
    # ids that cast to NULL (non-numeric string ids through the public
    # API) are dropped: the distributed path's equi-joins never match a
    # null id anyway, and the union-find below would otherwise crash
    # comparing None < int.  The filter sits ABOVE the checkpoint so
    # predicate pushdown stops at the RDD boundary — pushing
    # isnotnull(cast(id)) into the deep verified-pairs plan measured
    # +1 s of pure re-planning per invocation at sf0.1.
    nn = edges.filter(
        F.col("src").isNotNull() & F.col("dst").isNotNull()
    )
    cap = int(
        spark.conf.get("spark.graphmapreduce.clusterBroadcastMaxPairs", "1000000")
    )
    if edges.count() <= cap:
        # driver union-find — exactly the data volume a broadcast-join
        # build side would collect.  Collect through Arrow (toPandas):
        # two flat int64 buffers instead of per-pair Row objects, so the
        # transfer itself is ~16 B/pair; the dominant driver footprint
        # is the union-find dict (≤ 2 ints per distinct id — measured
        # 172 MiB at the 1M-pair cap with 2M distinct ids, inside the
        # broadcast budget the session already grants every BHJ build
        # side)
        import pandas as pd

        pdf = nn.toPandas()
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            root = x
            while parent[root] != root:
                root = parent[root]
            while parent[x] != root:  # path compression
                parent[x], x = root, parent[x]
            return root

        for a, b in zip(
            pdf["src"].to_numpy().tolist(), pdf["dst"].to_numpy().tolist()
        ):
            if a not in parent:
                parent[a] = a
            if b not in parent:
                parent[b] = b
            ra, rb = find(a), find(b)
            if ra != rb:
                # union by MIN ROOT so the final root is the component
                # min — the documented smallest-id canonical convention
                if ra < rb:
                    parent[rb] = ra
                else:
                    parent[ra] = rb
        ids = list(parent)
        out = pd.DataFrame(
            {"id": ids, "cluster": [find(x) for x in ids]},
            dtype="int64",
        )
        return spark.createDataFrame(out, "id long, cluster long")
    graph = PropertyGraph.from_edges(nn)
    comp = connected_components(graph, max_iter=max_iter, check_interval=4)
    return comp.select(F.col("id"), F.col("component").alias("cluster"))


def canonical_docs(
    df: DataFrame,
    id_col: str,
    clusters: DataFrame,
    prefer: Column | str | None = None,
) -> DataFrame:
    """One representative row per near-dup cluster, plus every row that
    is in no cluster (unique docs pass through untouched).

    Default pick is the smallest id in the cluster (deterministic, no
    extra data needed).  With ``prefer`` (e.g. a quality-score column)
    the member maximizing it wins, ties broken by smallest id — so dedup
    keeps the BEST copy, not an arbitrary one.

    One left join + one per-cluster window (rows already co-located by
    the cluster shuffle); unique docs skip the window entirely.
    """
    from pyspark.sql.window import Window

    cl = clusters.select(
        F.col("id").alias(id_col), F.col("cluster")
    )
    joined = df.join(cl, id_col, "left")
    in_cluster = joined.filter(F.col("cluster").isNotNull())
    unique = joined.filter(F.col("cluster").isNull()).drop("cluster")
    order = [F.col(id_col).asc()]
    if prefer is not None:
        p = F.col(prefer) if isinstance(prefer, str) else prefer
        order = [p.desc(), F.col(id_col).asc()]
    w = Window.partitionBy("cluster").orderBy(*order)
    best = (
        in_cluster.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "cluster")
    )
    return unique.unionByName(best)


def simhash(
    col: Column | str, num_bits: int = 64, hash_fn: str = "xxhash64"
) -> Column:
    """SimHash fingerprint: for each bit, sum +1/-1 over word hashes;
    bit set iff the sum is positive.  Word-level.  ``hash_fn='md5'``
    uses the portable 60-bit hash the SQL oracle can replicate."""
    ws = T.words(col)
    hs = F.transform(ws, lambda w: T._hash_col(w, hash_fn))
    fp = F.lit(0).cast("long")
    for bit in range(num_bits):
        contrib = F.aggregate(
            hs,
            F.lit(0),
            lambda acc, h: acc
            + F.when(h.bitwiseAND(F.lit(1 << bit if bit < 63 else -(1 << 63))) != 0, 1).otherwise(-1),
        )
        fp = fp + F.when(contrib > 0, F.lit(1 << bit if bit < 63 else -(1 << 63)).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return fp


def simhash_dup_groups(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_bits: int = 64,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Groups of documents sharing an identical SimHash fingerprint.
    Returns (simhash, ids sorted, group_size >= 2)."""
    fp = df.select(
        F.col(id_col).alias("id"),
        simhash(text_col, num_bits, hash_fn).alias("simhash"),
    )
    return (
        fp.groupBy("simhash")
        .agg(
            F.array_sort(F.collect_list("id")).alias("ids"),
            F.count(F.lit(1)).alias("group_size"),
        )
        .filter(F.col("group_size") >= 2)
    )


def simhash_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_bits: int = 64,
    bands: int = 4,
    max_hamming: int = 3,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """SimHash near-duplicates with hamming tolerance (the banded mode
    promised alongside ``simhash_dup_groups``'s exact-fingerprint mode).

    Banding: the ``num_bits`` fingerprint is split into ``bands`` equal
    slices; candidate pairs share at least one identical (band index,
    band value) bucket; candidates are verified by exact popcount
    distance.  By pigeonhole the scheme is COMPLETE for
    ``max_hamming < bands`` (k differing bits can dirty at most k
    bands, leaving one intact) — the default 4×16-bit bands over a
    64-bit fingerprint exactly cover the classic hamming≤3 setting.
    Bucket join instead of the all-pairs cross product; the only
    quadratic step is within-bucket pair generation.

    Returns (id_a, id_b, hamming), id_a < id_b, hamming <= max_hamming.
    """
    if num_bits % bands:
        raise ValueError("num_bits must be divisible by bands")
    if max_hamming >= bands:
        raise ValueError(
            "completeness needs max_hamming < bands "
            f"(got hamming {max_hamming} with {bands} bands)"
        )
    band_w = num_bits // bands
    fp = df.select(
        F.col(id_col).alias("id"),
        simhash(text_col, num_bits, hash_fn).alias("fp"),
    )
    if band_w >= 64:
        band_vals = F.array(F.col("fp"))
    else:
        mask = (1 << band_w) - 1
        band_vals = F.array(
            *[
                F.shiftrightunsigned("fp", j * band_w).bitwiseAND(F.lit(mask))
                for j in range(bands)
            ]
        )
    banded = fp.select(
        "id", "fp", F.posexplode(band_vals).alias("band", "bv")
    )
    a, b = banded.alias("a"), banded.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.fp").alias("fa"),
            F.col("b.fp").alias("fb"),
        )
        .distinct()
    )
    return (
        cands.withColumn(
            "hamming", F.bit_count(F.col("fa").bitwiseXOR(F.col("fb")))
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
    max_df: int | None = None,
) -> DataFrame:
    """n-gram Jaccard similarity join via inverted shingle index.

    Candidate pairs AND their shared-shingle counts come from one
    groupBy over the inverted-index self-join (count = |A∩B| over the
    indexed shingles) — full shingle arrays never ship to pairs; only
    the scalar set sizes join in, so the pair table stays narrow.

    ``max_df`` caps shingle document frequency in the index: a shingle
    appearing in more than ``max_df`` docs produces O(df²) join rows and
    carries no dedup signal (boilerplate).  Hot-shingle detection runs
    EAGERLY (one small agg job at call time): when no shingle exceeds
    the cap — the common case on clean corpora — the plan is exactly
    the uncapped one, paying zero pruning branches (this was a measured
    +62% bench regression when the hot machinery stayed in-plan
    unconditionally).  When hot shingles exist they are removed with a
    broadcast anti-join (the hot set is tiny by construction — same
    scheme as the winnowing pair pipeline), and the Jaccard stays
    EXACT: the intersection count missing from the capped index is
    recovered by joining each doc's own (tiny) hot-shingle array to the
    pair and intersecting those — O(|hot per doc|) per pair, not
    O(|shingles per doc|).  The only pairs lost are those whose every
    shared shingle is hotter than ``max_df``.  ``None`` = no cap
    (exact, quadratic-risk on boilerplate-heavy corpora).

    Returns (id_a, id_b, jaccard), id_a < id_b, jaccard >= threshold.
    """
    sh = df.select(
        F.col(id_col).alias("id"),
        T.char_shingles(text_col, n=n, distinct=True).alias("sh"),
    )
    sizes = sh.select("id", F.size("sh").alias("n_sh"))
    inv = sh.select("id", F.explode("sh").alias("g"))
    hot_by_doc = None
    if max_df is not None:
        hot = (
            inv.groupBy("g")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > max_df)
            .select("g")
        )
        # existence probe: a partial-agg pass over the index, bounded
        # output.  The probe is strictly cheaper than carrying three
        # dead pruning branches through the main job when the hot set
        # is empty.
        if hot.limit(1).count() == 0:
            hot_by_doc = None
        else:
            hot_by_doc = (
                inv.join(F.broadcast(hot), "g")
                .groupBy("id")
                .agg(F.collect_list("g").alias("hot_sh"))
            )
            inv = inv.join(F.broadcast(hot), "g", "left_anti")
    a, b = inv.alias("a"), inv.alias("b")
    pairs = (
        a.join(b, (F.col("a.g") == F.col("b.g")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_sh").alias("nb"))
    pairs = pairs.join(sa, "id_a").join(sb, "id_b")
    if hot_by_doc is not None:
        ha = hot_by_doc.select(F.col("id").alias("id_a"), F.col("hot_sh").alias("hot_a"))
        hb = hot_by_doc.select(F.col("id").alias("id_b"), F.col("hot_sh").alias("hot_b"))
        empty = F.array().cast("array<string>")
        pairs = (
            pairs.join(ha, "id_a", "left")
            .join(hb, "id_b", "left")
            .withColumn(
                "inter",
                F.col("inter")
                + F.size(
                    F.array_intersect(
                        F.coalesce("hot_a", empty), F.coalesce("hot_b", empty)
                    )
                ),
            )
        )
    return (
        pairs.withColumn(
            "jaccard",
            F.col("inter").cast("double")
            / (F.col("na") + F.col("nb") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    num_planes: int = 12,
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """Embedding near-duplicates: candidate pairs share a random-hyperplane
    LSH bucket, verified by exact cosine.  Returns (id_a, id_b, cosine)."""
    if dim is None:
        first = df.select(F.size(F.col(vec_col)).alias("d")).first()
        dim = int(first["d"])
    rng = np.random.RandomState(seed)
    planes = rng.standard_normal((num_planes, dim)).tolist()
    sig = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
        V.hyperplane_signature(vec_col, planes).alias("bucket"),
    )
    a, b = sig.alias("a"), sig.alias("b")
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(V.cosine(F.col("a.v"), F.col("b.v")), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def remove_boilerplate_segments(
    df: DataFrame,
    id_col: str,
    text_col: str,
    delimiter: str = r"\n{2,}",
    min_df: int = 2,
    rejoin: str = "\n\n",
    max_hot: int | None = 100_000,
) -> DataFrame:
    """Corpus-level boilerplate removal (RefinedWeb-style): split each
    doc into segments, drop every segment whose trimmed form appears in
    >= ``min_df`` DISTINCT documents (headers, footers, nav chrome,
    license blurbs), reassemble the survivors in original order.

    Returns (id_col, text_col) for documents with >= 1 surviving
    segment; fully-boilerplate docs drop out (filter them upstream of
    rejoin if empty docs must be kept).

    Scale shape: posexplode -> per-segment doc-frequency agg (two
    shuffles over segment text, map-side combinable) -> anti-join of
    the hot set, broadcast-hinted when the CALLER asserts it is small
    via ``max_hot`` (boilerplate vocabularies usually are; pass None to
    let AQE/shuffle handle an unbounded hot set) -> one groupBy(id) to
    reassemble.  No UDF, no driver data path.  ``max_hot`` is ONLY a
    planning hint — no hot segment is ever dropped, so results never
    depend on it.
    """
    seg = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), delimiter)).alias("pos", "seg"),
    ).filter(F.trim(F.col("seg")) != "")
    key = F.trim(F.col("seg"))
    hot = (
        seg.select(key.alias("k"), F.col(id_col))
        .distinct()
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") >= min_df)
        .select("k")
    )
    if max_hot is not None:
        hot = F.broadcast(hot)
    kept = seg.join(hot, key == F.col("k"), "left_anti")
    return kept.groupBy(id_col).agg(
        F.concat_ws(
            rejoin,
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "seg"))),
                lambda s: s["seg"],
            ),
        ).alias(text_col)
    )


def contamination_report(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str,
    text_col: str,
    eval_text_col: str | None = None,
    n: int = 8,
    broadcast_eval: bool = True,
) -> DataFrame:
    """Per-training-doc count of distinct word n-grams shared with an
    eval/benchmark set — the standard test-set-decontamination signal
    (n-gram collision, as used for pretraining-corpus decontamination).

    Returns (id_col, matched_ngrams >= 1); clean docs are absent.

    Scale shape: the eval side (benchmarks: thousands of docs) collapses
    to a distinct n-gram set and is broadcast, so the 100 TB train side
    is ONE scan + broadcast hash semi-join — no train-side shuffle until
    the per-doc count agg, which only sees matched (rare) rows.  Pass
    ``broadcast_eval=False`` for an eval set too big to broadcast; the
    same plan runs as a shuffle join.  ``word_ngrams`` is distinct
    per doc, so the count is exactly #distinct contaminated grams.
    """
    ev = eval_df.select(
        F.explode(
            T.word_ngrams(eval_text_col or text_col, n)
        ).alias("gram")
    ).distinct()
    if broadcast_eval:
        ev = F.broadcast(ev)
    tr = train.select(
        F.col(id_col),
        F.explode(T.word_ngrams(text_col, n)).alias("gram"),
    )
    return tr.join(ev, "gram").groupBy(id_col).agg(
        F.count(F.lit(1)).alias("matched_ngrams")
    )


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str,
    text_col: str,
    eval_text_col: str | None = None,
    n: int = 8,
    min_overlap: int = 1,
    broadcast_eval: bool = True,
) -> DataFrame:
    """Drop training docs sharing >= ``min_overlap`` distinct word
    n-grams with the eval set (anti-join on the contamination report).
    Returns the clean ``train`` rows unchanged."""
    flagged = contamination_report(
        train, eval_df, id_col, text_col, eval_text_col, n, broadcast_eval
    ).filter(F.col("matched_ngrams") >= min_overlap)
    return train.join(flagged.select(id_col), id_col, "left_anti")


def dedup_lines(
    df: DataFrame,
    id_col: str,
    text_col: str,
    delimiter: str = r"\n",
    rejoin: str = "\n",
    min_len: int = 1,
) -> DataFrame:
    """Corpus-level exact line dedup (CCNet-style): every distinct
    trimmed line keeps ONLY its first occurrence in corpus order —
    smallest (doc id, position) — and every later copy (in other docs
    or later in the same doc) is dropped.  The complement of
    ``remove_boilerplate_segments``: that removes ALL copies of hot
    segments, this keeps exactly one copy of every line.

    Lines whose trimmed form is empty are dropped; lines shorter than
    ``min_len`` characters are exempt from dedup (kept everywhere) so
    structural stubs — bullets, braces, separators — don't collapse
    corpus-wide.  ``delimiter`` is a Java regex, ``rejoin`` a literal.

    Returns (id_col, text_col); docs whose every line lost drop out.

    Scale shape: posexplode -> winner-per-line agg + join back, both
    keyed on md5(line) so shuffle keys stay fixed-width regardless of
    line length; no UDF, no driver data path.  Two shuffles over the
    line set, map-side combinable.
    """
    lines = df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(F.split(F.col(text_col), delimiter)).alias("pos", "line"),
    ).withColumn("k", F.md5(F.trim(F.col("line"))))
    lines = lines.filter(F.trim(F.col("line")) != "")
    exempt = lines.filter(F.length(F.trim(F.col("line"))) < min_len)
    ded = lines.filter(F.length(F.trim(F.col("line"))) >= min_len)
    winners = ded.groupBy("k").agg(
        F.min(F.struct(F.col("_id").alias("i"), F.col("pos").alias("p"))).alias("w")
    )
    kept = (
        ded.join(winners, "k")
        .filter((F.col("_id") == F.col("w.i")) & (F.col("pos") == F.col("w.p")))
        .select("_id", "pos", "line")
    )
    survivors = kept.unionByName(exempt.select("_id", "pos", "line"))
    return survivors.groupBy("_id").agg(
        F.concat_ws(
            rejoin,
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
        ).alias(text_col)
    ).select(F.col("_id").alias(id_col), text_col)


def ngram_containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.8,
    max_df: int | None = None,
) -> DataFrame:
    """n-gram CONTAINMENT join — the asymmetric complement of
    `ngram_jaccard_pairs`: containment(A in B) = |A∩B| / |A|, the
    statistic for quotation / excerpt / benchmark-contamination
    detection where a small document is (near-)embedded in a large one
    and symmetric Jaccard stays low because the union is dominated by
    the large side.

    Same inverted-index plan as the Jaccard join (shared-shingle counts
    from one groupBy over the index self-join; only scalar set sizes
    join onto the narrow pair table), same ``max_df`` hot-shingle
    guard (here a hard cap: dropped shingles reduce counts — pass
    ``None`` for the exact oracle-checked contract).

    Returns (id_a, id_b, cont_a_in_b, cont_b_in_a) for pairs where
    EITHER direction reaches ``threshold``; id_a < id_b.
    """
    sh = df.select(
        F.col(id_col).alias("id"),
        T.char_shingles(text_col, n=n, distinct=True).alias("sh"),
    )
    sizes = sh.select("id", F.size("sh").alias("n_sh"))
    inv = sh.select("id", F.explode("sh").alias("g"))
    if max_df is not None:
        hot = (
            inv.groupBy("g")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > max_df)
            .select("g")
        )
        inv = inv.join(F.broadcast(hot), "g", "left_anti")
    a, b = inv.alias("a"), inv.alias("b")
    pairs = (
        a.join(
            b, (F.col("a.g") == F.col("b.g")) & (F.col("a.id") < F.col("b.id"))
        )
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_sh").alias("nb"))
    out = (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "cont_a_in_b", F.col("inter").cast("double") / F.col("na")
        )
        .withColumn(
            "cont_b_in_a", F.col("inter").cast("double") / F.col("nb")
        )
        .filter(
            (F.col("cont_a_in_b") >= threshold)
            | (F.col("cont_b_in_a") >= threshold)
        )
    )
    return out.select(
        "id_a",
        "id_b",
        F.round("cont_a_in_b", 6).alias("cont_a_in_b"),
        F.round("cont_b_in_a", 6).alias("cont_b_in_a"),
    )


def ngram_jaccard_pairs_prefix(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard join with PPJoin-style PREFIX FILTERING
    (Xiao et al., WWW'08) — provably lossless candidate pruning:
    under any global shingle ordering, two sets with J ≥ t MUST share a
    shingle among their first ``|A| − ⌈t·|A|⌉ + 1`` shingles, so only
    that prefix is indexed.  With the canonical rarest-first order
    (document frequency ascending, shingle value tiebreak) the indexed
    shingles are also the LOW-df ones, which squeezes the candidate set
    from both ends — on template corpora where every doc shares most
    shingles this prunes what a size-ratio filter cannot (measured:
    size filter dropped 10% of q46 candidates; prefixes of a t=0.5 join
    index ~half of each doc's rarest shingles only).

    Output contract is IDENTICAL to `ngram_jaccard_pairs` (id_a < id_b,
    jaccard ≥ threshold, exact scores) — losslessness is value-checked
    by registering this plan against the plain inverted-index oracle.

    Plan: df-table agg, one per-doc window to rank shingles rarest-
    first, prefix-only inverted index self-join, then exact verification
    on full 60-bit-hashed shingle sets for the (small) candidate set.
    """
    sh = df.select(
        F.col(id_col).alias("id"),
        T.char_shingles(text_col, n=n, distinct=True).alias("sh"),
    )
    inv = sh.select("id", F.explode("sh").alias("g"))
    dfreq = inv.groupBy("g").agg(F.count(F.lit(1)).alias("_df"))
    from pyspark.sql.window import Window as W

    ranked = (
        inv.join(dfreq, "g")
        .withColumn(
            "_rn",
            F.row_number().over(
                W.partitionBy("id").orderBy(F.col("_df"), F.col("g"))
            ),
        )
        .withColumn("_na", F.count(F.lit(1)).over(W.partitionBy("id")))
    )
    prefix_len = F.col("_na") - F.ceil(F.lit(threshold) * F.col("_na")) + 1
    pref = ranked.filter(F.col("_rn") <= prefix_len).select("id", "g")
    cands = (
        pref.alias("a")
        .join(
            pref.alias("b"),
            (F.col("a.g") == F.col("b.g")) & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    hashed = sh.select(
        "id",
        F.array_distinct(
            F.transform("sh", lambda s: T._hash_col(s, "md5"))
        ).alias("_sh"),
    )
    a = hashed.select(F.col("id").alias("id_a"), F.col("_sh").alias("sh_a"))
    b = hashed.select(F.col("id").alias("id_b"), F.col("_sh").alias("sh_b"))
    return (
        cands.join(a, "id_a")
        .join(b, "id_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
            / F.size(F.array_union("sh_a", "sh_b")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def duplicate_ngram_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 8,
    min_count: int = 2,
) -> DataFrame:
    """Substring-level duplication profile (the span-dedup signal of
    Lee et al., "Deduplicating Training Data Makes Language Models
    Better"): for every document, the fraction of its word ``n``-gram
    POSITIONS whose gram occurs ≥ ``min_count`` times corpus-wide
    (other documents or elsewhere in the same one).  Returns
    ``(id, n_grams, n_dup, dup_ratio)`` — documents shorter than ``n``
    words are excluded (they have no spans).

    Unlike the distinct-shingle paths above, positions are kept —
    but they never SHUFFLE: ``n_grams`` is the gram-array length (a
    narrow expression), the gram-count agg partial-combines down to
    the vocabulary before its exchange, and only the (count ≥
    min_count) DUP-GRAM SET flows back, as a semi join the optimizer
    broadcasts whenever the dup vocabulary is small (it is, unless the
    corpus is mostly duplicated — and then the join is the point).
    Gram keys are 60-bit md5 longs, so every shuffled row is
    fixed-width.  The position stream is re-derived per consumer by a
    narrow explode of the checkpointed gram-array table — the arrays
    are hashed once, and only the cheap explode repeats.
    """
    # spread rows across cores BEFORE the per-position md5 fan-out
    # (same rule as minhash_signatures): a corpus read from few/large
    # files scans as few partitions, and the gram hashing — the
    # dominant cost of this operator — would otherwise run serially.
    # One narrow shuffle of (id, text); every downstream branch reuses
    # the exchange (ReusedExchange), so the hashing parallelizes in all
    # three consumers of the gram stream.  Input-parallelism-gated
    # (operators/_spread.py): a many-file corpus skips the shuffle.
    from graphmapreduce_spark.operators._spread import spread_by

    df = spread_by(df.select(id_col, text_col), F.col(id_col))
    # bind the token array ONCE via a lambda variable (the per-index
    # slice lambda would otherwise re-evaluate the split per element —
    # quadratic per document; same trick as hashed_ngram_score)
    w0 = T.words(F.lower(F.col(text_col)))
    grams = F.transform(
        F.array(w0),
        lambda w: F.when(
            F.size(w) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(w) - n + 1),
                lambda i: T.md5_hash60(
                    F.concat_ws(" ", F.slice(w, i, F.lit(n)))
                ),
            ),
        ).otherwise(F.array().cast("array<bigint>")),
    )[0]
    docs = df.select(F.col(id_col).alias("id"), grams.alias("_g")).filter(
        F.size("_g") > 0
    )
    # materialize the gram-array table once (lazy checkpoint; the first
    # consumer's job populates it): the per-position md5 hashing is the
    # dominant cost and THREE consumers sit above the reused exchange
    # (the vocab agg's position stream, the semi-join's position stream,
    # and the final per-doc size projection) — each would re-hash the
    # corpus.  The artifact is (id, array<long>) ≈ 8 bytes per token —
    # bounded by corpus text size, MEMORY_AND_DISK so big corpora spill
    # instead of recomputing (r07: 1.17 → 0.44 s warm at sf0.1)
    docs = docs.localCheckpoint(eager=False)
    pos = docs.select("id", F.explode("_g").alias("g"))
    dup_set = (
        pos.groupBy("g")
        .agg(F.count(F.lit(1)).alias("_c"))
        .filter(F.col("_c") >= min_count)
        .select("g")
    )
    dup_counts = (
        pos.join(dup_set, "g", "left_semi")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_dup"))
    )
    return (
        docs.select("id", F.size("_g").cast("long").alias("n_grams"))
        .join(dup_counts, "id", "left")
        .select(
            "id",
            "n_grams",
            F.coalesce("n_dup", F.lit(0)).alias("n_dup"),
            F.round(
                F.coalesce("n_dup", F.lit(0)) / F.col("n_grams"), 6
            ).alias("dup_ratio"),
        )
    )
