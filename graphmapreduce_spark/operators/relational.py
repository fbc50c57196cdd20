"""Relational operators beyond plain `df.join`/`groupBy` — the [EXT]
inventory of SURVEY.md §2.2 that needs actual composition.

The reference engine has no relational surface at all (its closest analog
is the sorted-merge state update, ``gmr.h:160-189``, which is literally a
sort-merge left join on ``key == vertexGID``).  Everything here is
expressed so Catalyst keeps the plan declarative: no Python UDFs, no
collects; as-of joins use window functions over a union rather than a
per-key merge loop.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from graphmapreduce_spark.operators import _time


def top_k(df: DataFrame, order_cols: Sequence[Column | str], k: int) -> DataFrame:
    """Global top-k.  `orderBy + limit` — Spark plans this as a
    TakeOrderedAndProject (per-partition heap + driver merge), the same
    splitter-free replacement for the reference's distributed sample sort
    (``samplesort.cpp:21-191``) when k is small."""
    return df.orderBy(*order_cols).limit(k)


def top_k_per_group(
    df: DataFrame,
    partition_cols: Sequence[str],
    order_cols: Sequence[Column | str],
    k: int,
    rank_col: str = "rn",
    keep_rank: bool = False,
) -> DataFrame:
    """Top-k rows per group via row_number window.  Order columns must be
    a deterministic total order (add a key tiebreak) or results are
    nondeterministic under retries."""
    w = Window.partitionBy(*partition_cols).orderBy(*order_cols)
    out = df.withColumn(rank_col, F.row_number().over(w)).filter(
        F.col(rank_col) <= k
    )
    return out if keep_rank else out.drop(rank_col)


def theta_join(
    left: DataFrame, right: DataFrame, condition: Column, how: str = "inner"
) -> DataFrame:
    """Arbitrary-predicate (non-equi) join.  Catalyst picks BNLJ/cartesian;
    at scale, pre-filter and/or bucket the inputs first — a pure theta join
    is inherently quadratic."""
    return left.join(right, condition, how)


def range_join(
    left: DataFrame,
    right: DataFrame,
    equi_keys: Sequence[str],
    lower: Column,
    upper: Column,
) -> DataFrame:
    """Equi-keys + band predicate.  The equi keys make this a hash join
    with a residual range filter — the scalable form of interval joins
    (without equi keys Spark would fall back to a nested-loop join)."""
    cond = None
    for kcol in equi_keys:
        c = left[kcol] == right[kcol]
        cond = c if cond is None else cond & c
    return left.join(right, cond & lower & upper)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    num_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi join: spread each hot join key over
    ``num_salts`` shuffle partitions.

    The big (skewed) ``left`` side gets a deterministic pseudo-random
    salt per row (hash of all columns mod ``num_salts``); the ``right``
    side is replicated once per salt value.  The join key becomes
    (keys..., salt), so rows of one hot key land on ``num_salts``
    reducers instead of one.  Result is row-identical to the plain join
    for the supported join types: ``inner``, ``left``/``left_outer``,
    ``left_semi``, ``left_anti``, ``cross``.  Right/full outer joins are
    rejected — the replicated right side would emit every unmatched
    right row once per salt.

    Prefer AQE's automatic skew-join splitting when it fires; this is
    the explicit fallback for joins AQE can't rebalance (e.g. when the
    skew only materializes after upstream transforms, or under
    ``spark.sql.adaptive.enabled=false``).  Replication multiplies the
    small side by ``num_salts`` — keep it broadcast-sized.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "left_anti", "leftanti", "cross"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join does not support how={how!r}: unmatched right "
            "rows would be duplicated once per salt (use a plain join or "
            "AQE skew handling for right/full outer)"
        )
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(num_salts))
    l_salted = left.withColumn("_salt", salt.cast("int"))
    r_salted = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1)))
    )
    out = l_salted.join(r_salted, [*on, "_salt"], how)
    return out.drop("_salt")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    direction: str = "backward",
    tolerance: float | None = None,
) -> DataFrame:
    """As-of join: for each left row, the most recent right row with
    ``right_ts <= left_ts`` (direction='backward'; 'forward' = earliest
    ``>=``; 'nearest' = whichever of the two is closer, ties to
    backward — full pandas ``merge_asof`` direction parity), matching
    on the equi key ``on``.

    ``tolerance`` (pandas ``merge_asof`` parity): maximum allowed
    |left_ts − matched right_ts|; a match farther away than that is
    nulled out as if no right row existed.  Units follow the timestamp
    columns (SECONDS for timestamp types — both sides are compared on
    their double-epoch cast).  Costs one extra carried column in the
    same window — no additional shuffle.

    Implementation: union both sides tagged, sort within each key by
    timestamp, and carry the last seen right value forward with
    ``last(..., ignorenulls=True)`` over a running window — one shuffle on
    the key, no per-key Python merge (scales to arbitrarily many rows per
    key; skew on the key column is the thing to watch).
    """
    lcols = [c for c in left.columns]
    tag_l = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*lcols).alias("_lrow"),
        F.lit(None).cast("double").alias("_mts"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in value_cols],
    )
    tag_r = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(tag_l.schema["_lrow"].dataType).alias("_lrow"),
        F.col(right_ts).cast("double").alias("_mts"),
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
    )
    if direction == "backward":
        # right rows sort before left rows at equal ts → a right row at
        # exactly left_ts matches
        w = (
            Window.partitionBy("_k")
            .orderBy(F.col("_ts").asc(), F.col("_side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        unioned = tag_l.unionByName(tag_r)
    elif direction == "forward":
        w = (
            Window.partitionBy("_k")
            .orderBy(F.col("_ts").desc(), F.col("_side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        unioned = tag_l.unionByName(tag_r)
    elif direction == "nearest":
        # BOTH running fills over ONE keyed shuffle (same partitioning,
        # two sort orders), then pick the closer match per left row —
        # ties go backward, pandas merge_asof's convention
        wb = (
            Window.partitionBy("_k")
            .orderBy(F.col("_ts").asc(), F.col("_side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        wf = (
            Window.partitionBy("_k")
            .orderBy(F.col("_ts").desc(), F.col("_side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        unioned = tag_l.unionByName(tag_r)
        both = unioned.select(
            "_side",
            "_lrow",
            F.col("_ts").cast("double").alias("_lts"),
            F.last("_mts", ignorenulls=True).over(wb).alias("_bmts"),
            F.last("_mts", ignorenulls=True).over(wf).alias("_fmts"),
            *[
                F.last(f"_r_{c}", ignorenulls=True)
                .over(wb)
                .alias(f"_b_{c}")
                for c in value_cols
            ],
            *[
                F.last(f"_r_{c}", ignorenulls=True)
                .over(wf)
                .alias(f"_f_{c}")
                for c in value_cols
            ],
        ).filter(F.col("_side") == 1)
        use_b = F.col("_bmts").isNotNull() & (
            F.col("_fmts").isNull()
            | (
                (F.col("_lts") - F.col("_bmts"))
                <= (F.col("_fmts") - F.col("_lts"))
            )
        )
        filled = both.select(
            "_side",
            "_lrow",
            "_lts",
            F.when(use_b, F.col("_bmts"))
            .otherwise(F.col("_fmts"))
            .alias("_mts"),
            *[
                F.when(use_b, F.col(f"_b_{c}"))
                .otherwise(F.col(f"_f_{c}"))
                .alias(f"_r_{c}")
                for c in value_cols
            ],
        )
        if tolerance is not None:
            oob = F.col("_mts").isNull() | (
                F.abs(F.col("_lts") - F.col("_mts"))
                > F.lit(float(tolerance))
            )
            filled = filled.select(
                "_side",
                "_lrow",
                *[
                    F.when(oob, F.lit(None))
                    .otherwise(F.col(f"_r_{c}"))
                    .alias(f"_r_{c}")
                    for c in value_cols
                ],
            )
        return filled.select(
            *[F.col("_lrow")[c].alias(c) for c in lcols],
            *[F.col(f"_r_{c}").alias(c) for c in value_cols],
        )
    else:
        raise ValueError(f"unknown direction {direction!r}")
    filled = unioned.select(
        "_side",
        "_lrow",
        F.col("_ts").cast("double").alias("_lts"),
        F.last("_mts", ignorenulls=True).over(w).alias("_mts"),
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_r_{c}")
            for c in value_cols
        ],
    ).filter(F.col("_side") == 1)
    if tolerance is not None:
        out_of_band = F.col("_mts").isNull() | (
            F.abs(F.col("_lts") - F.col("_mts")) > F.lit(float(tolerance))
        )
        filled = filled.select(
            "_side",
            "_lrow",
            *[
                F.when(out_of_band, F.lit(None)).otherwise(
                    F.col(f"_r_{c}")
                ).alias(f"_r_{c}")
                for c in value_cols
            ],
        )
    return filled.select(
        *[F.col("_lrow")[c].alias(c) for c in lcols],
        *[F.col(f"_r_{c}").alias(c) for c in value_cols],
    )


def sessionize(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_seconds: int = 1800,
    session_col: str = "session_seq",
) -> DataFrame:
    """Gap-based sessionization (batch analog of the streaming
    ``session_window``): a new session starts when the time since the
    same key's previous event exceeds ``gap_seconds``; appends
    ``session_col`` = 1-based session sequence number per key.

    One shuffle (the per-key window sort); both window passes share the
    same partitioning.  At 100 TB the key partitioning bounds state —
    no per-key driver work, no UDF.

    Accepts TIMESTAMP, TIMESTAMP_NTZ, or integral-epoch ``ts_col``
    (NTZ rejects a direct bigint cast — see `_time.epoch_seconds`)."""
    tsec = _time.epoch_seconds(df, ts_col)
    w = Window.partitionBy(key_col).orderBy(ts_col)
    prev = F.lag(tsec).over(w)
    is_new = (
        prev.isNull() | ((tsec - prev) > gap_seconds)
    ).cast("long")
    run = Window.partitionBy(key_col).orderBy(ts_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn(session_col, F.sum(is_new).over(run))


def merge_upsert(
    base: DataFrame,
    updates: DataFrame,
    key_cols: Sequence[str],
) -> DataFrame:
    """Warehouse MERGE / SCD-type-1 upsert as a pure relational rewrite
    (no ACID table format needed): rows whose key appears in ``updates``
    are replaced wholesale, unmatched update keys are inserted, all
    other base rows pass through.

    One anti-join + one union — the anti-join's build side is the
    updates' key projection, which broadcasts whenever the update batch
    is small relative to the base (the common CDC shape at 100 TB).
    Deterministic: requires ``updates`` to hold at most one row per key
    (enforce upstream with `top_k_per_group` or `exact_dedup`)."""
    survivors = base.join(
        updates.select(*key_cols), on=list(key_cols), how="left_anti"
    )
    return survivors.unionByName(updates)


def scd2_apply(
    current: DataFrame,
    updates: DataFrame,
    key_cols: Sequence[str],
    attr_cols: Sequence[str],
    ts_col: str = "ts",
    from_col: str = "valid_from",
    to_col: str = "valid_to",
) -> DataFrame:
    """SCD-type-2 MERGE: apply a CDC batch to a versioned dimension,
    closing superseded versions instead of overwriting them (the history
    complement of `merge_upsert`'s type-1 replace).

    ``current`` holds (keys, attrs, from_col, to_col) with ``to_col``
    NULL on the open version; ``updates`` holds (keys, attrs, ts_col)
    and may carry several versions per key in one batch.  Semantics:

    - closed history rows pass through untouched;
    - per key, the open row and the batch rows form one timeline ordered
      by timestamp; consecutive entries whose tracked attrs are equal
      (null-safe) collapse into the earlier entry, so no-op updates
      never open a version;
    - each surviving entry's ``to_col`` is the next entry's timestamp
      (NULL on the newest) — chained mid-batch versions get correct
      half-open [from, to) spans in a single pass.

    Scale shape: one shuffle on the dimension keys carries both window
    passes (dedup-lag + close-lead); the union with closed history is
    shuffle-free.  Requires batch timestamps > the open rows'
    ``from_col`` for affected keys (the usual CDC contract).
    """
    keys = list(key_cols)
    attrs = list(attr_cols)
    cols = keys + attrs + [from_col, to_col]
    closed = current.filter(F.col(to_col).isNotNull()).select(*cols)
    open_rows = current.filter(F.col(to_col).isNull())
    timeline = open_rows.select(
        *keys, *attrs, F.col(from_col).alias("_ts"), F.lit(0).alias("_src")
    ).unionByName(
        updates.select(
            *keys, *attrs, F.col(ts_col).alias("_ts"), F.lit(1).alias("_src")
        )
    )
    w = Window.partitionBy(*keys).orderBy("_ts", "_src")
    fingerprint = F.struct(*[F.col(a) for a in attrs])
    changed = timeline.withColumn(
        "_same", fingerprint.eqNullSafe(F.lag(fingerprint).over(w))
    ).filter((F.col("_src") == 0) | ~F.coalesce(F.col("_same"), F.lit(False)))
    spans = changed.withColumn("_to", F.lead("_ts").over(w)).select(
        *keys,
        *attrs,
        F.col("_ts").alias(from_col),
        F.col("_to").alias(to_col),
    )
    return closed.unionByName(spans)


def interval_join(
    left: DataFrame,
    right: DataFrame,
    left_span: tuple[str, str],
    right_span: tuple[str, str],
    on: Sequence[str] = (),
    bucket_width: int = 3600,
) -> DataFrame:
    """Interval-overlap join: all (left, right) row pairs whose
    half-open spans [start, end) intersect, optionally also matching on
    equi ``on`` keys.  Complements `range_join` (point-in-interval) for
    the two-interval-table case (time ranges, genomic regions).

    Scale shape — bucket blocking, NOT an inequality-only join (which
    Catalyst can only plan as broadcast-nested-loop): each interval
    explodes into the fixed-width buckets it spans via an in-plan
    `sequence()`, pairs meet with a plain HASH join on (keys, bucket),
    and the exact overlap predicate filters bucket-collisions.  Each
    overlapping pair would surface once per shared bucket, so it is
    emitted only in the bucket containing the overlap's start —
    deterministic dedup with no extra distinct shuffle.  Pick
    ``bucket_width`` near the typical span length: too small explodes
    rows, too large degrades to per-key all-pairs.

    Spans are integral (epoch seconds / positions); left columns keep
    their names, right columns that collide get an ``_r`` suffix.
    """
    ls, le = left_span
    rs, re_ = right_span
    keys = list(on)
    lcols = set(left.columns)
    renames = [c for c in right.columns if c in lcols and c not in keys]
    r = right
    for c in renames:
        r = r.withColumnRenamed(c, f"{c}_r")
    rs = f"{rs}_r" if rs in renames else rs
    re_ = f"{re_}_r" if re_ in renames else re_

    def spanned(df, s, e):
        return df.withColumn(
            "_bkt",
            F.explode(
                F.sequence(
                    F.floor(F.col(s) / bucket_width),
                    # end is exclusive: an interval ending exactly on a
                    # bucket edge does not enter that bucket
                    F.floor((F.col(e) - 1) / bucket_width),
                )
            ),
        )

    lb = spanned(left, ls, le)
    rb = spanned(r, rs, re_)
    joined = lb.join(rb, keys + ["_bkt"]) if keys else lb.join(
        rb, lb["_bkt"] == rb["_bkt"]
    ).drop(rb["_bkt"])
    overlap_start = F.greatest(F.col(ls), F.col(rs))
    return joined.filter(
        (F.col(ls) < F.col(re_))
        & (F.col(rs) < F.col(le))
        & (F.col("_bkt") == F.floor(overlap_start / bucket_width))
    ).drop("_bkt")


def merge_apply_cdc(
    base: DataFrame,
    changes: DataFrame,
    key_cols: Sequence[str],
    op_col: str = "op",
) -> DataFrame:
    """Full CDC MERGE: apply a change batch carrying an op column
    ('I' insert / 'U' update / 'D' delete) to the base table — the
    three-way generalization of `merge_upsert` (which only upserts).
    Matched 'U' rows are replaced wholesale, 'I' rows are inserted,
    'D' keys disappear; base rows without a change pass through.

    One anti-join (base vs ALL change keys — upserts and deletes
    alike) + one union of the non-delete payload.  The anti-join's
    build side is the change batch's key projection, which broadcasts
    whenever the batch is small relative to the base — the standard
    CDC shape at 100 TB.  Requires at most one change row per key
    (dedupe upstream with `top_k_per_group` on a sequence column).
    """
    keys = list(key_cols)
    survivors = base.join(changes.select(*keys), on=keys, how="left_anti")
    payload = changes.filter(F.col(op_col) != "D").drop(op_col)
    return survivors.unionByName(payload)


def table_diff(
    a: DataFrame,
    b: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Sequence[str],
) -> DataFrame:
    """Reconciliation diff of two keyed tables: one row per key that
    differs, with ``status`` in ('only_a', 'only_b', 'changed') and
    both sides' compare columns (``<col>_a`` / ``<col>_b``).  Equal
    rows are dropped — at 100 TB the diff output is the small side.

    One full-outer hash join on the keys; the change predicate is a
    null-safe column comparison so NULL↔value edits count as changes.
    The standard anti-entropy / migration-validation primitive."""
    keys = list(key_cols)
    cols = list(compare_cols)
    left = a.select(*keys, *[F.col(c).alias(f"{c}_a") for c in cols])
    right = b.select(
        *[F.col(k).alias(f"_bk_{k}") for k in keys],
        *[F.col(c).alias(f"{c}_b") for c in cols],
    )
    cond = None
    for k in keys:
        c = left[k] == right[f"_bk_{k}"]
        cond = c if cond is None else cond & c
    j = left.join(right, cond, "full_outer")
    in_a = left[keys[0]].isNotNull()
    in_b = right[f"_bk_{keys[0]}"].isNotNull()
    same = None
    for c in cols:
        eq = F.col(f"{c}_a").eqNullSafe(F.col(f"{c}_b"))
        same = eq if same is None else same & eq
    status = (
        F.when(in_a & ~in_b, F.lit("only_a"))
        .when(~in_a & in_b, F.lit("only_b"))
        .when(~same, F.lit("changed"))
    )
    return (
        j.withColumn("status", status)
        .filter(F.col("status").isNotNull())
        .select(
            *[
                F.coalesce(left[k], right[f"_bk_{k}"]).alias(k)
                for k in keys
            ],
            "status",
            *[F.col(f"{c}_a") for c in cols],
            *[F.col(f"{c}_b") for c in cols],
        )
    )


def gaps_islands(
    df: DataFrame,
    key: str,
    bucket_col: str | Column,
) -> DataFrame:
    """Gaps-and-islands: collapse each key's set of integer buckets into
    maximal runs of consecutive values.  Returns
    ``(key, island_start, island_end, n_buckets)``.

    Classic anchor trick: within a key, ``bucket − row_number()`` is
    constant exactly along a consecutive run, so one distinct + one
    window + one hash agg does it — all three stages share the single
    hash partitioning on ``key`` (the window's partitionBy), no global
    sort anywhere.  Per-key bucket counts are bounded (days per user),
    so the window partition can't skew-explode at scale.
    """
    b = F.col(bucket_col) if isinstance(bucket_col, str) else bucket_col
    # partition by the key FIRST, then dedup: equal (key, bucket) rows
    # share the key, so the dedup is correct within partitions and the
    # window + final agg reuse the same single exchange
    d = (
        df.select(F.col(key), b.cast("long").alias("_b"))
        .repartition(key)
        .dropDuplicates([key, "_b"])
    )
    w = Window.partitionBy(key).orderBy("_b")
    return (
        d.withColumn("_anchor", F.col("_b") - F.row_number().over(w))
        .groupBy(key, "_anchor")
        .agg(
            F.min("_b").alias("island_start"),
            F.max("_b").alias("island_end"),
            F.count(F.lit(1)).alias("n_buckets"),
        )
        .drop("_anchor")
    )


def skyline_2d(
    df: DataFrame,
    minimize: str,
    maximize: str,
) -> DataFrame:
    """2-D skyline (Pareto frontier): rows not dominated by any other row
    — dominated means another row is ≤ on ``minimize`` and ≥ on
    ``maximize`` with at least one strict.  Returns the input rows that
    survive.

    NOT the quadratic NOT-EXISTS self-join: aggregate to one
    ``(minimize, max(maximize))`` row per distinct minimize-value
    (hash agg, map-side combined), run a strict-predecessor cummax over
    that collapsed table, and semi-join survivors back.  The ordered
    window sees only |distinct minimize| rows — at 100 TB the raw table
    never sorts; only the collapsed per-value table does, and if even
    that is huge the same agg can be re-bucketed coarser first.
    """
    mn, mx = F.col(minimize), F.col(maximize)
    per_val = df.groupBy(minimize).agg(F.max(mx).alias("_mx"))
    w = (
        Window.orderBy(minimize)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    frontier = (
        per_val.withColumn("_prev", F.max("_mx").over(w))
        .filter(F.col("_prev").isNull() | (F.col("_prev") < F.col("_mx")))
        .select(minimize, F.col("_mx").alias(maximize))
    )
    # no forced broadcast: the frontier is usually tiny (AQE broadcasts
    # it from runtime stats), but on adversarial anti-correlated data
    # EVERY point is Pareto-optimal and the frontier is the whole
    # table — a hint would OOM the driver where a shuffle join degrades
    # gracefully
    return df.join(frontier, [minimize, maximize], "left_semi")


def group_mode(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
) -> DataFrame:
    """Per-group mode with a deterministic tiebreak (highest count wins,
    then smallest value).  Returns ``(*group_cols, mode, n)``.

    Count-then-rank: the count agg collapses to |groups × distinct
    values| rows before the window, and the window partitions by the
    group key — never a global sort, never a per-row window.
    """
    # pre-partition on the group key alone: hash(group) co-locates
    # every (group, value) pair, so the count agg AND the ranking
    # window share one exchange
    counts = (
        df.repartition(*group_cols)
        .groupBy(*group_cols, value_col)
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy(*group_cols).orderBy(
        F.desc("n"), F.asc(value_col)
    )
    return (
        counts.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(*group_cols, F.col(value_col).alias("mode"), "n")
    )


def weighted_median(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    weight_col: str,
) -> DataFrame:
    """Per-group weighted median: the smallest value whose cumulative
    weight reaches half the group's total (lower weighted median —
    deterministic, no interpolation).  Returns ``(*group_cols, wmedian)``.

    One pre-agg collapses duplicate values (so the window walks distinct
    values, not raw rows), then a per-group cumulative-weight window and
    a min-over-qualifying agg — all three on the same group-key hash
    partitioning, no global sort."""
    # pre-partition on the group key alone so the collapse agg and
    # both windows below share one exchange (see group_mode)
    collapsed = (
        df.repartition(*group_cols)
        .groupBy(*group_cols, value_col)
        .agg(F.sum(weight_col).alias("_w"))
    )
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot = Window.partitionBy(*group_cols)
    return (
        collapsed.withColumn("_cum", F.sum("_w").over(w))
        .withColumn("_tot", F.sum("_w").over(tot))
        .filter(F.col("_cum") * 2 >= F.col("_tot"))
        .groupBy(*group_cols)
        .agg(F.min(value_col).alias("wmedian"))
    )


def interval_union(
    df: DataFrame,
    key_cols: Sequence[str],
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Merge overlapping/touching [start, end] intervals per key and
    report ``(*key_cols, n_intervals, covered)`` — merged-interval count
    and total covered length (the union measure, overlaps counted
    once).  The utilization/SLA primitive interval_join lacks.

    Classic plane sweep as windows: a strict-predecessor running-max of
    ``end`` marks interval starts that open a NEW merged group
    (start > every earlier end), a running sum of those flags numbers
    the groups, and two hash aggs collapse them — every stage on the
    same key partitioning, no self-join, no explode of the time axis.
    Per-key interval counts are data-bounded (events per user), so the
    window partition cannot skew-explode at scale.
    """
    keys = list(key_cols)
    s, e = F.col(start_col), F.col(end_col)
    w = Window.partitionBy(*keys).orderBy(start_col, end_col)
    prev_max = F.max(end_col).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    opens = (prev_max.isNull() | (s > prev_max)).cast("long")
    grouped = (
        df.select(*keys, s.alias(start_col), e.alias(end_col))
        .withColumn("_open", opens)
        .withColumn(
            "_grp",
            F.sum("_open").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .groupBy(*keys, "_grp")
        .agg(F.min(start_col).alias("_s"), F.max(end_col).alias("_e"))
    )
    return grouped.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_intervals"),
        F.sum(F.col("_e") - F.col("_s")).alias("covered"),
    )


def band_join(
    left: DataFrame,
    right: DataFrame,
    left_val: str,
    right_val: str,
    eps: float,
    condition: Column | None = None,
) -> DataFrame:
    """Band join: pairs with ``|left_val − right_val| ≤ eps`` — the
    numeric-proximity join (sensor alignment, price matching, fuzzy
    numeric keys) that a naive theta join turns into a full cross
    product.

    Bucket blocking: each side keys on ``floor(val/eps)``; a pair
    within ``eps`` differs by at most one bucket, so the LEFT side
    explodes into its 3 adjacent bucket keys (3× row inflation — cheap,
    fixed) and the join becomes an EQUI join on the bucket id with the
    exact band predicate re-checked after.  Cost is Σ per-bucket
    |L|·|R| instead of |L|·|R|; bucket population is data-bounded by
    the value distribution within any eps-window.  ``condition``
    optionally adds extra join predicates (applied post-join).
    """
    b_l = F.floor(F.col(left_val) / eps).cast("long")
    b_r = F.floor(F.col(right_val) / eps).cast("long")
    l = left.withColumn(
        "_band",
        F.explode(F.array(b_l - 1, b_l, b_l + 1)),
    )
    r = right.withColumn("_band", b_r)
    out = l.join(r, "_band").filter(
        F.abs(F.col(left_val) - F.col(right_val)) <= eps
    )
    if condition is not None:
        out = out.filter(condition)
    return out.drop("_band")
