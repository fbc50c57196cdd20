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


# ---------------------------------------------------------------------
# transformWithState (Spark 4) — the successor API to
# applyInPandasWithState: named state variables (ValueState/ListState/
# MapState) + timers on a StatefulProcessor class.  `running_extremes`
# is the same running-aggregate family as `running_totals`, expressed
# against the new API so both stateful surfaces are covered.
# ---------------------------------------------------------------------
EXTREMES_STATE_SCHEMA = StructType(
    [
        StructField("n", LongType(), False),
        StructField("lo", DoubleType(), False),
        StructField("hi", DoubleType(), False),
        StructField("total", DoubleType(), False),
    ]
)

EXTREMES_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("n", LongType(), False),
        StructField("lo", DoubleType(), False),
        StructField("hi", DoubleType(), False),
        StructField("total", DoubleType(), False),
    ]
)


def _make_extremes_processor():
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class ExtremesProcessor(StatefulProcessor):
        """Per-key running (count, min, max, sum) via one ValueState."""

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "extremes", EXTREMES_STATE_SCHEMA
            )

        def handleInputRows(self, key, rows, timerValues):
            (user_id,) = key
            if self._state.exists():
                n, lo, hi, total = self._state.get()
            else:
                n, lo, hi, total = 0, float("inf"), float("-inf"), 0.0
            for pdf in rows:
                n += len(pdf)
                lo = min(lo, float(pdf["value"].min()))
                hi = max(hi, float(pdf["value"].max()))
                total += float(pdf["value"].sum())
            self._state.update((n, lo, hi, total))
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "n": [n],
                    "lo": [lo],
                    "hi": [hi],
                    "total": [total],
                }
            )

        def close(self) -> None:
            pass

    return ExtremesProcessor()


def running_extremes(
    events: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Per-key running (count, min, max, sum) across micro-batches on
    the Spark-4 `transformWithStateInPandas` API: named ValueState per
    key, updated per batch, one row emitted per key per batch.  State
    is four scalars per key — O(distinct keys) executor memory, same
    bound as `running_totals` on the legacy API.

    transformWithState only runs on the RocksDB state store — the
    provider conf is set here (session-wide; the HDFS-backed default
    works for every other stateful operator too, RocksDB is simply the
    superset requirement).

    Runtime dependency: the TWS python worker speaks protobuf to the
    JVM state server, so ``google.protobuf`` must be importable in the
    worker environment.  Where it is not installed, see
    ``tests/conftest.py::_enable_tws_protobuf_shim`` for the gated
    pure-Python fallback (cloud-sdk runtime + ``tools/pb_compat``
    version-check relaxation) that the test suite uses to verify this
    operator end-to-end."""
    events.sparkSession.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    src = events.selectExpr(f"{key_col} AS user_id", f"{value_col} AS value")
    return src.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_make_extremes_processor(),
        outputStructType=EXTREMES_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
