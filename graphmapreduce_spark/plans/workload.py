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
    # ROUND-6 WINDOW: q263/q292 re-verify first (their round-5 driver
    # rows were hash-only FAILs — DuckDB HUGEINT SUM(CASE) vs Spark
    # LONG surface, hardened this round with BIGINT casts; a green
    # driver row is the only proof that counts), then the rotation
    # queue continues at q299 with the next 48 value-oracled names in
    # qid order (rows-only ids skipped; q248-q298 landed driver rows
    # in CORRECTNESS_r05, q144-q247 in r04, q01-q143 in r01-r03).
    # NEXT ROUNDS: continue the queue at q347.
    "q263_rich_club",
    "q292_missing_days",
    "q299_audience_overlap",
    "q300_concurrency_profile",
    "q301_markov_stationary",
    "q302_seasonal_naive_mape",
    "q303_two_hop_reach",
    "q304_value_at_risk",
    "q305_entry_channel_conversion",
    "q306_burstiness_param",
    "q307_segment_migration",
    "q308_depth_vs_conversion",
    "q309_heaps_curve",
    "q310_power_analysis",
    "q311_retention_decay_fit",
    "q312_lorenz_points",
    "q313_user_feature_table",
    "q314_dup_degree_profile",
    "q315_lognormal_fit",
    "q316_ece",
    "q317_quantile_transform",
    "q318_target_encoding",
    "q319_temporal_split_audit",
    "q320_feature_label_corr",
    "q321_char_bigram_entropy",
    "q322_exponential_gap_fit",
    "q323_gini_mean_difference",
    "q324_expected_steps_to_purchase",
    "q325_weibull_fit",
    "q326_early_value_signal",
    "q327_binned_percentile_error",
    "q328_negbin_fit",
    "q329_scale_agreement",
    "q330_ingest_order_drift",
    "q331_time_hierarchy_rollup",
    "q332_feature_hashing",
    "q333_price_volume_decomposition",
    "q334_brand_price_position",
    "q335_single_source_risk",
    "q336_price_dispersion",
    "q337_supplier_scorecard",
    "q338_return_rate_by_brand",
    "q339_emptiness_audit",
    "q340_conflicting_metadata",
    "q341_order_aging",
    "q342_discount_uplift",
    "q343_top3_customer_share",
    "q344_char_class_profile",
    "q345_trade_matrix",
    "q346_two_way_anova",
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
