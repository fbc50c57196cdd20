"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference's only notion of evolving state is per-vertex values
mutated each BSP superstep (``gmr.h:155-194``).  Structured Streaming's
arbitrary-stateful operator is the streaming generalization: state keyed
by group, updated per micro-batch, with timeout-based eviction.

``running_totals`` is the canonical example operator: per-key running
count/sum maintained across micro-batches with a processing-time timeout.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

RUNNING_STATE_SCHEMA = StructType(
    [
        StructField("n", LongType(), False),
        StructField("total", DoubleType(), False),
    ]
)

RUNNING_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("n", LongType(), False),
        StructField("total", DoubleType(), False),
    ]
)


def _make_update_running(timeout_duration_ms: int | None):
    """Build the state-update fn; a non-None duration arms a processing-
    time timeout per key after every update (the eviction path)."""

    def _update_running(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        (user_id,) = key
        if state.hasTimedOut:
            state.remove()
            return
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        if timeout_duration_ms is not None:
            # must be re-armed after every state.update — an un-armed
            # key would never hit the hasTimedOut branch
            state.setTimeoutDuration(timeout_duration_ms)
        yield pd.DataFrame({"user_id": [user_id], "n": [n], "total": [total]})

    return _update_running


def running_totals(
    events: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
    timeout: str = "NoTimeout",
    timeout_duration_ms: int = 60_000,
) -> DataFrame:
    """Per-key running (count, sum) across micro-batches.

    Works on a streaming DataFrame with columns (key_col, value_col);
    emits one updated row per key per micro-batch.  State is two scalars
    per key — O(distinct keys) executor memory; with
    ``timeout='ProcessingTimeTimeout'`` a key idle for
    ``timeout_duration_ms`` is evicted (its state removed) at the next
    micro-batch, bounding state for ever-growing key spaces.
    """
    conf = getattr(GroupStateTimeout, timeout, GroupStateTimeout.NoTimeout)
    duration = (
        timeout_duration_ms if conf == GroupStateTimeout.ProcessingTimeTimeout
        else None
    )
    src = events.selectExpr(f"{key_col} AS user_id", f"{value_col} AS value")
    return src.groupBy("user_id").applyInPandasWithState(
        _make_update_running(duration),
        outputStructType=RUNNING_OUTPUT_SCHEMA,
        stateStructType=RUNNING_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=conf,
    )
