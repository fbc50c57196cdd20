"""The registered workload: every operator of SURVEY.md §2 as a
(spark_fn, oracle_sql) pair.

- ``spark_fn(spark, sf_dir) -> DataFrame`` — the idiomatic DataFrame plan.
- ``oracle_sql`` — ANSI SQL for DuckDB over the same parquet tables
  (views pre-registered), or ``None`` for genuinely non-SQL-expressible
  operators (iterative graph algorithms, LSH with engine-native hashes)
  which get a rows-only check and are instead covered by golden-graph
  pytest fixtures.

Float discipline (hash-compare safety): every aggregated float column is
ROUNDed identically on both sides; money to 2 decimals, ratios/statistics
to 6, cosine to 4 (then ranking happens on the rounded value with an id
tiebreak so top-k membership is deterministic on both engines).

The registry implementation is split across domain modules (w01–w11);
this facade imports them in registration order, re-exports the registry
API, and applies the driver verification-window ordering.  Every query
function is also re-exported as a module attribute (workload.qXX_name),
preserving the pre-split surface.
"""

from graphmapreduce_spark.plans._shared import (  # noqa: F401
    QUERIES,
    oracle_sql,
    queries,
    register,
    _t,
)

from graphmapreduce_spark.plans import w01_relational  # noqa: F401,E402
from graphmapreduce_spark.plans import w02_graph_queries  # noqa: F401,E402
from graphmapreduce_spark.plans import w03_llm_text  # noqa: F401,E402
from graphmapreduce_spark.plans import w04_streaming_queries  # noqa: F401,E402
from graphmapreduce_spark.plans import w05_corpus_ops  # noqa: F401,E402
from graphmapreduce_spark.plans import w06_analytics_a  # noqa: F401,E402
from graphmapreduce_spark.plans import w07_analytics_b  # noqa: F401,E402
from graphmapreduce_spark.plans import w08_analytics_c  # noqa: F401,E402
from graphmapreduce_spark.plans import w09_analytics_d  # noqa: F401,E402
from graphmapreduce_spark.plans import w10_analytics_e  # noqa: F401,E402
from graphmapreduce_spark.plans import w11_analytics_f  # noqa: F401,E402

# re-export every query function as a module attribute
for _n, (_fn, _sql) in QUERIES.items():
    globals()[_n] = _fn
del _n, _fn, _sql


_WINDOW_PRIORITY = [
    # ROUND-5 WINDOW: the first 50 of the banked rotation queue
    # (q248-q575, BASELINE.md) get their FIRST driver rows this
    # round — value-oracled names only (rows-only q261 skipped; it
    # carries pytest goldens).  q144-q247 landed driver-green in
    # CORRECTNESS_r04; the rest of the registry is covered by this
    # session's full-registry sweep (560/560 value-green at round
    # start, rerun green after the module split) and the plan lint.
    # NEXT ROUNDS: continue the queue at q299 (value-oracled names
    # in qid order).
    "q248_weighted_jaccard",
    "q249_cusum_drift",
    "q250_attribution",
    "q251_cohort_ltv",
    "q252_corr_matrix",
    "q253_kn_bigram",
    "q254_dow_seasonality",
    "q255_tfidf_cosine",
    "q256_adamic_adar",
    "q257_ngram_novelty",
    "q258_token_fertility",
    "q259_windowed_funnel",
    "q260_calibration_bins",
    "q262_matryoshka_audit",
    "q263_rich_club",
    "q264_simpson_audit",
    "q265_transition_entropy",
    "q266_replay_stream_agg",
    "q267_fk_integrity",
    "q268_dup_size_histogram",
    "q269_lsh_planner",
    "q270_effective_corpus_size",
    "q271_behavior_editdist",
    "q272_hhi_concentration",
    "q273_open_triads",
    "q274_expected_lsh_recall",
    "q275_robust_trend",
    "q276_keyword_extraction",
    "q277_dynamic_session_window",
    "q278_welch_ttest",
    "q279_anova_oneway",
    "q280_hyperplane_lsh",
    "q281_haversine_join",
    "q282_nearest_neighbor",
    "q283_stream_semi_join",
    "q284_rolling_percentile",
    "q285_lead_time",
    "q286_hourly_ohlc",
    "q287_max_drawdown",
    "q288_lead_lag_corr",
    "q289_position_attribution",
    "q290_column_profile",
    "q291_format_masks",
    "q292_missing_days",
    "q293_spearman_rank",
    "q294_capture_recapture",
    "q295_hill_tail_index",
    "q296_wasserstein_drift",
    "q297_cube_grouping_id",
    "q298_acf",
]


def _apply_window_order() -> None:
    missing = [n for n in _WINDOW_PRIORITY if n not in QUERIES]
    if missing:
        raise RuntimeError(f"_WINDOW_PRIORITY names unknown queries: {missing}")
    # the driver oracle-checks EXACTLY the first 50 registered queries:
    # less wastes verification slots, more silently pushes names out
    if len(_WINDOW_PRIORITY) != 50:
        raise RuntimeError(
            f"_WINDOW_PRIORITY must hold exactly 50 names, has "
            f"{len(_WINDOW_PRIORITY)} — trim re-verify/filler entries"
        )
    prioritized = {n: QUERIES[n] for n in _WINDOW_PRIORITY}
    rest = {n: v for n, v in QUERIES.items() if n not in prioritized}
    # mutate IN PLACE: every module that imported QUERIES keeps the
    # same dict object, so the reorder is visible everywhere
    _reordered = {**prioritized, **rest}
    QUERIES.clear()
    QUERIES.update(_reordered)


_apply_window_order()
