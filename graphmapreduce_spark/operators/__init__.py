"""Operator surface: thin, tested, scale-conscious wrappers."""

from graphmapreduce_spark.operators.dedup import (  # noqa: F401
    canonical_docs,
    dedup_by_pairs,
    dedup_clusters,
    exact_dedup,
    minhash_lsh_near_dup_pairs,
    ngram_jaccard_pairs,
    remove_boilerplate_segments,
    simhash_dup_groups,
    simhash_near_dup_pairs,
)
from graphmapreduce_spark.operators.packing import packed_layout  # noqa: F401
from graphmapreduce_spark.operators.relational import (  # noqa: F401
    asof_join,
    gaps_islands,
    group_mode,
    merge_upsert,
    range_join,
    salted_join,
    sessionize,
    skyline_2d,
    theta_join,
    top_k,
    top_k_per_group,
)
from graphmapreduce_spark.operators.sampling import (  # noqa: F401
    hash_sample,
    hash_split,
    stratified_hash_sample,
)
from graphmapreduce_spark.operators.similarity import (  # noqa: F401
    cosine_topk,
    ivf_build,
    ivf_search,
)
from graphmapreduce_spark.operators.sketches import (  # noqa: F401
    approx_distinct_by,
    hll_rollup,
    hll_sketch_table,
    kll_quantile_rollup,
    kll_sketch_table,
    theta_overlap,
    theta_sketch_table,
)
