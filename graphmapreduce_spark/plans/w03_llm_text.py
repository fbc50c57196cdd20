"""LLM-pipeline north star: dedup, similarity, multimodal codecs, text analysis (q40–q67 band).

Part 3/11 of the query registry (split from the former single-file
workload.py); importing this module registers its queries in
``plans._shared.QUERIES``.
"""

from graphmapreduce_spark.plans._shared import *  # noqa: F401,F403

@register(
    "q40_dedup_exact",
    """
    WITH keep AS (SELECT text, MIN(doc_id) AS doc_id FROM documents GROUP BY text)
    SELECT d.source, COUNT(*) AS n_kept
    FROM documents d JOIN keep k ON d.text = k.text AND d.doc_id = k.doc_id
    GROUP BY d.source
    """,
)
def q40_dedup_exact(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    kept = D.exact_dedup(d, ["text"], "doc_id")
    return kept.groupBy("source").agg(F.count(F.lit(1)).alias("n_kept"))


@register(
    "q41_fingerprint",
    """
    SELECT md5(array_to_string(list_sort(list_distinct(
             list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                         x -> x <> ''))), ' ')) AS fingerprint,
           COUNT(*) AS n_docs,
           MIN(doc_id) AS min_doc_id
    FROM documents
    GROUP BY 1
    """,
)
def q41_fingerprint(spark, sf_dir):
    """Normalized (OpenRefine-style) document fingerprint groups."""
    d = _t(spark, sf_dir, "documents")
    return d.groupBy(
        T.normalized_fingerprint("text").alias("fingerprint")
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("doc_id").alias("min_doc_id"),
    )


@register(
    "q42_text_stats",
    """
    SELECT lang,
           COUNT(*) AS n_docs,
           ROUND(AVG(len(list_filter(string_split_regex(trim(text), '\\s+'),
                                     x -> x <> ''))), 6) AS avg_words,
           ROUND(AVG(CASE WHEN length(regexp_replace(text, '\\s', '', 'g')) > 0
                  THEN CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE)
                       / length(regexp_replace(text, '\\s', '', 'g'))
                  ELSE 0 END), 6) AS avg_punct_ratio,
           ROUND(AVG(length(text)), 6) AS avg_chars
    FROM documents
    GROUP BY lang
    """,
)
def q42_text_stats(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg(T.n_words("text")), 6).alias("avg_words"),
        F.round(F.avg(T.punct_ratio("text")), 6).alias("avg_punct_ratio"),
        F.round(F.avg(F.length("text")), 6).alias("avg_chars"),
    )


@register(
    "q43_token_count",
    """
    SELECT source,
           SUM(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]')))::BIGINT
             AS total_tokens,
           ROUND(AVG(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]'))), 6)
             AS avg_tokens
    FROM documents
    GROUP BY source
    """,
)
def q43_token_count(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.groupBy("source").agg(
        F.sum(T.token_count("text")).cast("long").alias("total_tokens"),
        F.round(F.avg(T.token_count("text")), 6).alias("avg_tokens"),
    )


def _lang_id_oracle_sql() -> str:
    """Replicates functions.text.language_id: per-language stopword hits,
    argmax with alphabetical tie-break, 'und' when no hits."""
    hit_exprs = []
    for lang, stops in sorted(T.STOPWORDS.items()):
        lst = ", ".join(f"'{w}'" for w in stops)
        hit_exprs.append(
            f"len(list_filter(ws, x -> list_contains([{lst}], lower(x))))"
            f" AS h_{lang}"
        )
    hits = ",\n             ".join(hit_exprs)
    return f"""
    WITH toks AS (
      SELECT list_filter(string_split_regex(trim(text), '\\s+'),
                         x -> x <> '') AS ws
      FROM documents
    ),
    scored AS (
      SELECT {hits}
      FROM toks
    )
    SELECT CASE WHEN GREATEST(h_de, h_en, h_es, h_fr) = 0 THEN 'und'
                WHEN h_de >= h_en AND h_de >= h_es AND h_de >= h_fr THEN 'de'
                WHEN h_en >= h_es AND h_en >= h_fr THEN 'en'
                WHEN h_es >= h_fr THEN 'es'
                ELSE 'fr' END AS predicted_lang,
           COUNT(*) AS n_docs
    FROM scored
    GROUP BY 1
    """


@register("q44_lang_id", _lang_id_oracle_sql())
def q44_lang_id(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.groupBy(T.language_id("text").alias("predicted_lang")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )


@register(
    "q45_ngram_jaccard",
    """
    WITH sh AS (
      SELECT doc_id, list_distinct(list_transform(
               range(1, GREATEST(length(text) - 2, 0) + 1),
               i -> substr(text, i, 3))) AS grams
      FROM documents WHERE doc_id < 100
    ),
    inv AS (SELECT doc_id, UNNEST(grams) AS g FROM sh),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
      FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           ROUND(CAST(i AS DOUBLE) /
                 (len(sa.grams) + len(sb.grams) - i), 6) AS jaccard
    FROM inter
    JOIN sh sa ON sa.doc_id = id_a
    JOIN sh sb ON sb.doc_id = id_b
    WHERE CAST(i AS DOUBLE) / (len(sa.grams) + len(sb.grams) - i) >= 0.2
    """,
)
def q45_ngram_jaccard(spark, sf_dir):
    """Exact n-gram Jaccard similarity join via shingle inverted index.
    max_df=1000 exceeds the 100-doc slice's maximum possible document
    frequency, so the cap is exercised in-plan without changing results
    (the oracle is uncapped)."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return D.ngram_jaccard_pairs(
        d, "doc_id", "text", n=3, threshold=0.2, max_df=1000
    )


def _minhash_lsh_oracle_sql(
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 5,
    threshold: float = 0.5,
    seed: int = 42,
) -> str:
    """Replicates the full MinHash-LSH pipeline: md5-60bit shingle ids,
    the same seeded universal-hash coefficients, band buckets by content,
    exact-Jaccard verification — every stage value-checked."""
    a, b = D._hash_coeffs(num_hashes, seed)
    p = D._MERSENNE
    mins = ",\n             ".join(
        f"MIN(({int(a[i])} * x + {int(b[i])}) % {p}) AS m{i}"
        for i in range(num_hashes)
    )
    r = num_hashes // bands
    band_rows = "\n      UNION ALL ".join(
        "SELECT doc_id, '{j}:' || {expr} AS bucket FROM sig".format(
            j=j,
            expr=" || '_' || ".join(f"m{j * r + i}" for i in range(r)),
        )
        for j in range(bands)
    )
    return f"""
    WITH sh AS MATERIALIZED (
      SELECT doc_id, list_distinct(list_transform(
               range(1, GREATEST(length(text) - {shingle_n - 1}, 0) + 1),
               i -> substr(text, i, {shingle_n}))) AS grams
      FROM documents
    ),
    ids AS MATERIALIZED (
      SELECT doc_id,
             ('0x' || substr(md5(g), 1, 15))::BIGINT % {p} AS x
      FROM (SELECT doc_id, UNNEST(grams) AS g FROM sh)
    ),
    sig AS MATERIALIZED (
      SELECT doc_id,
             {mins}
      FROM ids GROUP BY doc_id
    ),
    bands AS MATERIALIZED (
      {band_rows}
    ),
    cand AS MATERIALIZED (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b
        ON a.bucket = b.bucket AND a.doc_id < b.doc_id
    ),
    scored AS (
      SELECT id_a, id_b,
             CAST(len(list_filter(sa.grams,
                      g -> list_contains(sb.grams, g))) AS DOUBLE)
             / (len(sa.grams) + len(sb.grams)
                - len(list_filter(sa.grams,
                      g -> list_contains(sb.grams, g)))) AS jaccard
      FROM cand JOIN sh sa ON sa.doc_id = id_a
                JOIN sh sb ON sb.doc_id = id_b
    )
    SELECT id_a, id_b, ROUND(jaccard, 6) AS jaccard
    FROM scored WHERE jaccard >= {threshold}
    """


@register("q46_minhash_lsh", _minhash_lsh_oracle_sql())
def q46_minhash_lsh(spark, sf_dir):
    """MinHash+LSH near-dup pairs, md5-hash variant: signatures, band
    buckets, and Jaccard verification all replicated by the SQL oracle.
    (xxhash64 is the production default; the hash swap changes only the
    shingle-id expression, not the plan shape.)"""
    d = _t(spark, sf_dir, "documents")
    pairs = D.minhash_lsh_near_dup_pairs(
        d, "doc_id", "text", threshold=0.5, num_hashes=32, shingle_n=5,
        hash_fn="md5",
    )
    return pairs


def _simhash_fp_ctes(num_bits: int, where: str) -> str:
    """CTE chain yielding ``sh(doc_id, simhash)`` that replicates
    operators.dedup.simhash with the md5-60bit word hash: per-bit +1/-1
    sums over word hashes, bit set iff sum positive.  Bits >= 60 are
    provably never set (the 60-bit hash has them zero, so their sum is
    -n_words <= 0) and are omitted from the SQL."""
    hi = min(num_bits, 60)
    sums = ",\n             ".join(
        f"SUM(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS s{i}"
        for i in range(hi)
    )
    fp = " + ".join(
        f"(CASE WHEN s{i} > 0 THEN {1 << i} ELSE 0 END)" for i in range(hi)
    )
    return f"""w AS MATERIALIZED (
      SELECT doc_id,
             UNNEST(list_filter(string_split_regex(trim(text), '\\s+'),
                                x -> x <> '')) AS word
      FROM documents {where}
    ),
    h AS MATERIALIZED (
      SELECT doc_id, ('0x' || substr(md5(word), 1, 15))::BIGINT AS h FROM w
    ),
    bits AS (
      SELECT doc_id,
             {sums}
      FROM h GROUP BY doc_id
    ),
    sh AS MATERIALIZED (
      SELECT d.doc_id, COALESCE({fp}, 0) AS simhash
      FROM (SELECT doc_id FROM documents {where}) d
      LEFT JOIN bits USING (doc_id)
    )"""


def _simhash_oracle_sql(num_bits: int, where: str) -> str:
    return f"""
    WITH {_simhash_fp_ctes(num_bits, where)}
    SELECT doc_id, simhash FROM sh
    """


def _simhash_hamming_oracle_sql(
    num_bits: int, bands: int, max_hamming: int, where: str
) -> str:
    """Replicates simhash_near_dup_pairs: banded candidate buckets over
    the replicated fingerprints, popcount-verified."""
    band_w = num_bits // bands
    mask = (1 << band_w) - 1
    return f"""
    WITH {_simhash_fp_ctes(num_bits, where)},
    bands AS (
      SELECT doc_id, simhash AS fp, t.j,
             (simhash >> (t.j * {band_w})) & {mask} AS bv
      FROM sh CROSS JOIN range(0, {bands}) t(j)
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
             a.fp AS fa, b.fp AS fb
      FROM bands a JOIN bands b
        ON a.j = b.j AND a.bv = b.bv AND a.doc_id < b.doc_id
    )
    SELECT id_a, id_b, CAST(bit_count(xor(fa, fb)) AS BIGINT) AS hamming
    FROM cand WHERE bit_count(xor(fa, fb)) <= {max_hamming}
    """


@register("q47_simhash", _simhash_oracle_sql(32, "WHERE doc_id < 100"))
def q47_simhash(spark, sf_dir):
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return d.select(
        "doc_id", D.simhash("text", num_bits=32, hash_fn="md5").alias("simhash")
    )


@register(
    "q75_simhash_hamming",
    _simhash_hamming_oracle_sql(32, 4, 3, "WHERE doc_id < 200"),
)
def q75_simhash_hamming(spark, sf_dir):
    """SimHash hamming-band near-dup: 4 bands over a 32-bit fingerprint,
    candidates share a band, verified by popcount <= 3 (complete for
    hamming < bands by pigeonhole).  md5 variant — the full pipeline is
    replicated by the SQL oracle."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    pairs = D.simhash_near_dup_pairs(
        d, "doc_id", "text", num_bits=32, bands=4, max_hamming=3,
        hash_fn="md5",
    )
    return pairs.select("id_a", "id_b", F.col("hamming").cast("long").alias("hamming"))


@register(
    "q48_embedding_topk",
    """
    WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         q AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
               WHERE vec_id < 5),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             ROUND(list_sum(list_transform(range(1, len(q.v) + 1),
                              i -> q.v[i] * c.v[i]))
               / (sqrt(list_sum(list_transform(q.v, x -> x * x)))
                * sqrt(list_sum(list_transform(c.v, x -> x * x)))), 4)
               AS cosine
      FROM c CROSS JOIN q
      WHERE q.vec_id <> c.vec_id
    )
    SELECT query_id, neighbor_id, cosine, rank FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                 ORDER BY cosine DESC, neighbor_id ASC) AS rank
      FROM scored) t
    WHERE rank <= 10
    """,
)
def q48_embedding_topk(spark, sf_dir):
    """Brute-force cosine top-k (the ANN baseline).  Ranking happens on
    the ROUNDed cosine with an id tiebreak so both engines agree."""
    emb = _t(spark, sf_dir, "embeddings")
    qs = emb.filter(F.col("vec_id") < 5)
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").cast("array<double>").alias("cv"),
    )
    q = qs.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("qv"),
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(V.cosine(F.col("qv"), F.col("cv")), 4).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= 10
    )


@register("q49_ivf_ann", None)  # approximate by design — recall pytest-verified
def q49_ivf_ann(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    qs = emb.filter(F.col("vec_id") < 5)
    return S.ivf_topk(emb, qs, k=10, n_cells=8, nprobe=3).select(
        "query_id", "neighbor_id", "cosine", "rank"
    )


@register(
    "q50_multimodal_meta",
    """
    SELECT doc_id,
           OCTET_LENGTH(ENCODE(text)) AS n_bytes,
           MD5(text) AS payload_md5
    FROM documents
    """,
)
def q50_multimodal_meta(spark, sf_dir):
    """Binary-column metadata path: payload stays opaque; only built-in
    byte-level functions touch it (the binary never enters Python)."""
    d = _t(spark, sf_dir, "documents")
    media = d.select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    out = M.media_metadata(media)
    return out.select("doc_id", "n_bytes", "payload_md5")


def _embedding_near_dup_oracle_sql(
    num_planes: int = 4,
    seed: int = 42,
    dim: int = 64,
    threshold: float = 0.3,
    id_cap: int = 300,
) -> str:
    """Replicates embedding_near_dup_pairs exactly: the seeded hyperplanes
    are embedded as SQL literals, so bucket assignment AND cosine verify
    both run in the oracle engine."""
    import numpy as np

    rng = np.random.RandomState(seed)
    planes = rng.standard_normal((num_planes, dim))
    bits = " + ".join(
        "(CASE WHEN list_sum(list_transform(range(1, {d} + 1),"
        " i -> v[i] * ([{plane}])[i])) >= 0 THEN {w} ELSE 0 END)".format(
            d=dim,
            plane=", ".join(repr(float(x)) for x in p),
            w=1 << b,
        )
        for b, p in enumerate(planes)
    )
    return f"""
    WITH sig AS MATERIALIZED (
      SELECT vec_id AS id, embedding::DOUBLE[] AS v,
             {bits} AS bucket
      FROM embeddings WHERE vec_id < {id_cap}
    )
    SELECT a.id AS id_a, b.id AS id_b,
           ROUND(list_sum(list_transform(range(1, {dim} + 1),
                            i -> a.v[i] * b.v[i]))
             / (sqrt(list_sum(list_transform(a.v, x -> x * x)))
              * sqrt(list_sum(list_transform(b.v, x -> x * x)))), 6) AS cosine
    FROM sig a JOIN sig b ON a.bucket = b.bucket AND a.id < b.id
    WHERE list_sum(list_transform(range(1, {dim} + 1), i -> a.v[i] * b.v[i]))
          / (sqrt(list_sum(list_transform(a.v, x -> x * x)))
           * sqrt(list_sum(list_transform(b.v, x -> x * x)))) >= {threshold}
    """


@register("q51_embedding_near_dup", _embedding_near_dup_oracle_sql())
def q51_embedding_near_dup(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs: random-hyperplane LSH
    candidates verified by exact cosine.  The oracle embeds the same
    seeded hyperplanes as SQL literals — bucketing and verification are
    both value-checked."""
    emb = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 300)
    return D.embedding_near_dup_pairs(
        emb, "vec_id", "embedding", threshold=0.3, num_planes=4, dim=64
    )


def _simhash_groups_oracle_sql() -> str:
    inner = _simhash_oracle_sql(64, "")
    return f"""
    WITH fp AS MATERIALIZED ({inner})
    SELECT simhash,
           array_to_string(list_sort(list(doc_id)), ',') AS ids_str,
           COUNT(*) AS group_size
    FROM fp
    GROUP BY simhash
    HAVING COUNT(*) >= 2
    """


@register("q52_simhash_groups", _simhash_groups_oracle_sql())
def q52_simhash_groups(spark, sf_dir):
    """SimHash duplicate groups (identical 64-bit fingerprint),
    md5-hash variant so the whole grouping is oracle-verified."""
    d = _t(spark, sf_dir, "documents")
    out = D.simhash_dup_groups(d, "doc_id", "text", num_bits=64, hash_fn="md5")
    return out.select(
        "simhash", F.concat_ws(",", "ids").alias("ids_str"), "group_size"
    )


@register(
    "q53_quality_score",
    """
    WITH feats AS (
      SELECT doc_id,
             LEAST(length(text) / 200.0, 1.0) AS len_score,
             CASE WHEN length(regexp_replace(text, '\\s', '', 'g')) > 0
                  THEN CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE)
                       / length(regexp_replace(text, '\\s', '', 'g'))
                  ELSE 0 END AS punct,
             list_filter(string_split_regex(trim(text), '\\s+'),
                         x -> x <> '') AS ws
      FROM documents
    )
    SELECT doc_id,
           ROUND((len_score
                  + GREATEST(0.0, 1.0 - punct * 4.0)
                  + LEAST(CASE WHEN len(ws) > 0
                          THEN len(list_filter(ws, x -> list_contains(
                                 ['the','and','is','of','to','a','in','that','it','for'],
                                 lower(x)))) * 5.0 / len(ws)
                          ELSE 0 END, 1.0)) / 3.0, 6) AS quality
    FROM feats
    """,
)
def q53_quality_score(spark, sf_dir):
    """Pretraining-corpus quality heuristic (length / punctuation /
    stopword tests) as a pure Column expression."""
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", T.quality_score("text").alias("quality"))


def _winnowing_oracle_sql(n: int = 8, w: int = 4) -> str:
    """Replicates winnowing_fingerprints (md5 variant) + the q54 pair
    pipeline: rolling md5-60bit hashes, window-of-w min, distinct fps,
    document-frequency cap, shared-fp pair counts."""
    return f"""
    WITH d AS MATERIALIZED (
      SELECT doc_id, text FROM documents WHERE doc_id < 100
    ),
    g AS MATERIALIZED (
      SELECT doc_id, i AS pos,
             ('0x' || substr(md5(substr(text, i, {n})), 1, 15))::BIGINT AS h
      FROM d, UNNEST(range(1, GREATEST(length(text) - {n - 1}, 0) + 1)) AS t(i)
    ),
    m AS (
      SELECT doc_id, pos,
             MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
                          ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING)
               AS wmin,
             COUNT(*) OVER (PARTITION BY doc_id) AS sz
      FROM g
    ),
    fp AS MATERIALIZED (
      SELECT DISTINCT doc_id, wmin AS fp
      FROM m WHERE pos <= GREATEST(sz - {w}, 0) + 1
    ),
    hot AS (SELECT fp FROM fp GROUP BY fp HAVING COUNT(*) > 20),
    fpc AS (SELECT * FROM fp WHERE fp NOT IN (SELECT fp FROM hot))
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS shared_fps
    FROM fpc a JOIN fpc b ON a.fp = b.fp AND a.doc_id < b.doc_id
    GROUP BY 1, 2
    HAVING COUNT(*) >= 5
    """


@register("q54_winnowing", _winnowing_oracle_sql())
def q54_winnowing(spark, sf_dir):
    """Winnowing fingerprints (Schleimer et al., SIGMOD'03): shared
    fingerprint count per candidate pair over a small doc slice.
    md5-hash variant — the whole pipeline is oracle-verified."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    fp = D.winnowing_fingerprints(
        d, "doc_id", "text", n=8, w=4, hash_fn="md5"
    ).localCheckpoint(eager=True)  # fingerprint once, not once per join side
    # cap fingerprint document frequency: boilerplate n-grams shared by
    # most docs produce O(df^2) pairs and zero dedup signal
    hot = (
        fp.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > 20)
        .select("fp")
    )
    fp = fp.join(F.broadcast(hot), "fp", "left_anti")
    a, b = fp.alias("a"), fp.alias("b")
    return (
        a.join(b, (F.col("a.fp") == F.col("b.fp"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("shared_fps"))
        .filter(F.col("shared_fps") >= 5)
    )


@register("q55_image_features", None)  # binary codec — not SQL-expressible
def q55_image_features(spark, sf_dir):
    """Multimodal image featurization over the media-TABLE shape
    (payload + width/height metadata columns): deterministic PNG
    payloads synthesized worker-side, then REAL decode + pooled-stat
    features through ``extract_image_features(fake=False)`` (stdlib
    zlib/numpy PNG codec).  Pixel-exact decode checks live in
    tests/test_multimodal_codecs.py; q151 is the all-filter codec
    round-trip."""
    import numpy as np  # worker-side
    import pandas as pd

    from graphmapreduce_spark.functions import codecs as C

    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)

    def encode(batches):
        for pdf in batches:
            ids = pdf["doc_id"].tolist()
            rows = []
            for i in ids:
                arr = (
                    (np.arange(8)[:, None] * 7 + np.arange(8)[None, :]
                     + i * 5) % 256
                ).astype(np.uint8)
                rows.append((i, C.encode_png(arr), 8, 8))
            yield pd.DataFrame(
                rows, columns=["media_id", "payload", "width", "height"]
            )

    media = d.select("doc_id").mapInPandas(
        encode,
        schema="media_id long, payload binary, width long, height long",
    )
    feats = M.extract_image_features(media, n_features=4)
    return feats.select(
        "media_id",
        F.round(F.col("features")[0], 6).alias("f_mean"),
        F.round(F.col("features")[1], 6).alias("f_std"),
    )


@register("q588_image_resize", None)  # binary codec — not SQL-expressible
def q588_image_resize(spark, sf_dir):
    """Batch image resize (`operators/multimodal.py resize_images`) —
    the training-resolution downscale pass: deterministic 12×8 PNG
    payloads synthesized worker-side (q55 pattern), then REAL decode →
    resize → PNG re-encode through mapInPandas under both modes
    (exact box-average 'area' 12×8→4×4 and half-pixel-center
    'nearest' 12×8→5×3), digesting the RESIZED pixels.  Pixel-exact
    resize semantics are pinned against plain-numpy references in
    tests/test_multimodal_codecs.py."""
    import numpy as np  # worker-side
    import pandas as pd

    from graphmapreduce_spark.functions import codecs as C

    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)

    def encode(batches):
        for pdf in batches:
            rows = []
            for i in pdf["doc_id"].tolist():
                arr = (
                    (np.arange(8)[:, None] * 13 + np.arange(12)[None, :] * 3
                     + i * 5) % 256
                ).astype(np.uint8)
                rows.append((i, C.encode_png(arr), 12, 8))
            yield pd.DataFrame(
                rows, columns=["media_id", "payload", "width", "height"]
            )

    media = d.select("doc_id").mapInPandas(
        encode,
        schema="media_id long, payload binary, width long, height long",
    )
    area = M.resize_images(media, 4, 4, mode="area").select(
        "media_id", F.lit("area").alias("mode"),
        "width", "height", "pixel_md5",
        F.octet_length("payload").alias("png_bytes"),
    )
    near = M.resize_images(media, 5, 3, mode="nearest").select(
        "media_id", F.lit("nearest").alias("mode"),
        "width", "height", "pixel_md5",
        F.octet_length("payload").alias("png_bytes"),
    )
    return area.unionByName(near)


@register("q56_video_frames", None)  # binary codec — not SQL-expressible
def q56_video_frames(spark, sf_dir):
    """Video frame sampling with REAL decode end-to-end: deterministic
    GMRV keyframe containers (length-prefixed PNG keyframes —
    `functions.codecs.encode_video_gmrv`; ffmpeg is absent, so the
    engine ships its own documented container) synthesized worker-side,
    then keyframe-seek sampling + pixel decode + pixel-digest via
    ``sample_video_frames(fake=False)``."""
    import numpy as np  # worker-side
    import pandas as pd

    from graphmapreduce_spark.functions import codecs as C

    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)

    def encode(batches):
        for pdf in batches:
            ids = pdf["doc_id"].tolist()
            rows = []
            for i in ids:
                dur = int(i % 5) * 1000 + 1000
                frames = [
                    (
                        ts,
                        ((np.arange(4)[:, None] * 11 + np.arange(6)[None, :]
                          + i * 3 + ts // 500) % 256).astype(np.uint8),
                    )
                    for ts in range(0, dur, 500)
                ]
                rows.append((i, C.encode_video_gmrv(frames), dur))
            yield pd.DataFrame(
                rows, columns=["media_id", "payload", "duration_ms"]
            )

    media = d.select("doc_id").mapInPandas(
        encode,
        schema="media_id long, payload binary, duration_ms long",
    )
    frames = M.sample_video_frames(media, every_ms=1000)
    return frames.select("media_id", "frame_idx", "ts_ms", "frame_md5")


@register("q67_audio_features", None)  # binary codec — not SQL-expressible
def q67_audio_features(spark, sf_dir):
    """Audio-clip feature extraction (framed RMS + zero-crossing rate)
    over binary payloads — REAL PCM-WAV decode end-to-end: deterministic
    sine clips synthesized worker-side with the stdlib wave encoder,
    then ``extract_audio_features(fake=False)`` (analytic rms/zcr value
    checks in tests/test_multimodal_codecs.py)."""
    import numpy as np  # worker-side
    import pandas as pd

    from graphmapreduce_spark.functions import codecs as C

    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)

    def encode(batches):
        sr = 8000
        for pdf in batches:
            ids = pdf["doc_id"].tolist()
            rows = []
            for i in ids:
                dur = int(i % 4) * 250 + 250
                t = np.arange(sr * dur // 1000) / sr
                freq = 150 + 25 * (i % 8)
                wavef = 0.5 * np.sin(2 * np.pi * freq * t)
                rows.append((i, C.encode_wav(wavef, sr), dur))
            yield pd.DataFrame(
                rows, columns=["media_id", "payload", "duration_ms"]
            )

    media = d.select("doc_id").mapInPandas(
        encode,
        schema="media_id long, payload binary, duration_ms long",
    )
    feats = M.extract_audio_features(media, frame_ms=25)
    return feats.select(
        "media_id",
        "n_samples",
        "n_frames",
        F.round("rms_mean", 6).alias("rms_mean"),
        F.round("zcr_mean", 6).alias("zcr_mean"),
    )


@register(
    "q68_pivot",
    """
    SELECT l_linestatus,
           ROUND(SUM(CASE WHEN l_returnflag = 'A' THEN l_quantity END), 2) AS A,
           ROUND(SUM(CASE WHEN l_returnflag = 'N' THEN l_quantity END), 2) AS N,
           ROUND(SUM(CASE WHEN l_returnflag = 'R' THEN l_quantity END), 2) AS R
    FROM lineitem GROUP BY l_linestatus
    """,
)
def q68_pivot(spark, sf_dir):
    """Pivot (wide aggregation).  Explicit value list — with it the
    pivot is a single pass (one shuffle, same plan as the CASE-WHEN
    form); without it Spark must first run a distinct() job to discover
    the columns, which is a full extra scan at 100 TB."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_linestatus")
        .pivot("l_returnflag", ["A", "N", "R"])
        .agg(F.round(F.sum("l_quantity"), 2))
    )
