"""Text-analysis expressions for training-data pipelines.

All pure Column expressions (codegen-friendly, no UDFs): tokenization,
quality statistics, token counting, language identification, document
fingerprinting, character shingles.  Each has an exact ANSI-SQL
equivalent so the DuckDB oracle can verify it (see
``graphmapreduce_spark.plans.workload``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Deterministic, tiny stopword lists for the language-ID heuristic.
# The heuristic is: tokenize, count hits in each language's list,
# predict the language with the most hits (ties broken alphabetically),
# 'und' (undetermined) when no list hits.
STOPWORDS = {
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "für"],
    "en": ["the", "and", "is", "of", "to", "a", "in", "that", "it", "for"],
    "es": ["el", "la", "los", "que", "y", "es", "un", "una", "con", "para"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "dans", "que", "pour"],
}

# BPE-ish token regex: runs of letters, single digits, or single
# non-alphanumeric-non-space characters (GPT-2-style pre-tokenization,
# simplified to stay identical between Java and RE2-style engines).
TOKEN_REGEX = "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"


def words(col: Column | str) -> Column:
    """Whitespace tokens, empties removed."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.trim(c), "\\s+"), lambda w: w != "")


def n_words(col: Column | str) -> Column:
    return F.size(words(col))


def token_count(col: Column | str) -> Column:
    """BPE-ish token count via TOKEN_REGEX (letters run / digit / punct)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(TOKEN_REGEX))


def punct_ratio(col: Column | str) -> Column:
    """Fraction of non-space characters that are not alphanumeric."""
    c = F.col(col) if isinstance(col, str) else col
    nonspace = F.length(F.regexp_replace(c, "\\s", ""))
    punct = F.length(F.regexp_replace(c, "[A-Za-z0-9\\s]", ""))
    return F.when(nonspace > 0, punct.cast("double") / nonspace).otherwise(0.0)


def stopword_ratio(col: Column | str, lang: str = "en") -> Column:
    """Fraction of words that are stopwords of ``lang``."""
    ws = words(col)
    hits = F.size(
        F.filter(
            ws, lambda w: F.lower(w).isin(*STOPWORDS[lang])
        )
    )
    return F.when(F.size(ws) > 0, hits.cast("double") / F.size(ws)).otherwise(0.0)


def avg_word_len(col: Column | str) -> Column:
    ws = words(col)
    total = F.aggregate(
        F.transform(ws, lambda w: F.length(w)),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return F.when(F.size(ws) > 0, total.cast("double") / F.size(ws)).otherwise(0.0)


def quality_score(col: Column | str) -> Column:
    """Composite [0,1] quality heuristic: penalize too-short docs, high
    punctuation, missing stopwords.  Deterministic; mirrors common
    pretraining-corpus filters (length / punctuation / stopword tests)."""
    c = F.col(col) if isinstance(col, str) else col
    len_score = F.least(F.length(c).cast("double") / 200.0, F.lit(1.0))
    punct_pen = F.greatest(F.lit(0.0), F.lit(1.0) - punct_ratio(c) * 4.0)
    stop_score = F.least(stopword_ratio(c, "en") * 5.0, F.lit(1.0))
    return F.round((len_score + punct_pen + stop_score) / 3.0, 6)


def language_id(col: Column | str) -> Column:
    """Heuristic language ID over STOPWORDS; ties → alphabetical, no
    hits → 'und'."""
    ws = F.transform(words(col), lambda w: F.lower(w))
    best = None
    for lang in sorted(STOPWORDS):  # alphabetical: earlier wins ties via >
        hits = F.size(F.filter(ws, lambda w: w.isin(*STOPWORDS[lang])))
        cand = F.struct(hits.alias("hits"), F.lit(lang).alias("lang"))
        if best is None:
            best = cand
        else:
            # strict > keeps the earlier (alphabetically smaller) on ties
            best = F.when(cand["hits"] > best["hits"], cand).otherwise(best)
    return F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))


def normalized_fingerprint(col: Column | str) -> Column:
    """OpenRefine-style fingerprint: lowercase, tokenize, sort distinct
    tokens, rejoin, md5.  Collapses reorderings/duplications of the same
    token multiset — a cheap canonical-form dedup key."""
    c = F.col(col) if isinstance(col, str) else col
    toks = F.array_sort(
        F.array_distinct(
            F.filter(F.split(F.lower(F.trim(c)), "\\s+"), lambda w: w != "")
        )
    )
    return F.md5(F.array_join(toks, " "))


def exact_fingerprint(col: Column | str) -> Column:
    """md5 of the raw text — exact-duplicate key."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(c)


def char_shingles(col: Column | str, n: int = 3, distinct: bool = True) -> Column:
    """Character n-gram array (the MinHash/Jaccard input unit)."""
    c = F.col(col) if isinstance(col, str) else col
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(c) - (n - 1), F.lit(0))),
        lambda i: F.substring(c, i, n),
    )
    return F.array_distinct(grams) if distinct else grams


def rolling_hashes(col: Column | str, n: int = 8) -> Column:
    """xxhash64 of each character n-gram — the winnowing ingredient.
    (Spark-side only; xxhash64 has no DuckDB twin, so callers that need
    oracle parity use md5-based shingles instead.)"""
    return F.transform(char_shingles(col, n, distinct=False), lambda g: F.xxhash64(g))


def winnowing_fingerprint(col: Column | str, n: int = 8, w: int = 4) -> Column:
    """Winnowing document fingerprint: min hash in each window of ``w``
    consecutive n-gram hashes, deduplicated, sorted.  Standard locality-
    sensitive document signature (Schleimer et al., SIGMOD'03)."""
    hs = rolling_hashes(col, n)
    idx = F.sequence(F.lit(0), F.greatest(F.size(hs) - w, F.lit(0)))
    mins = F.transform(
        idx, lambda i: F.array_min(F.slice(hs, i + 1, w))
    )
    return F.array_sort(F.array_distinct(mins))
