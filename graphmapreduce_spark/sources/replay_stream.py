"""Streaming Python Data Source (PySpark 4 API): deterministic replay
of a parquet table as a micro-batch stream.

The reference is batch-only; this is the [EXT] streaming complement of
``EdgeListDataSource`` — the backtesting primitive that turns any
static table into a stream with EXACT replay semantics, for driving
the `streaming/` operators (windows, watermarks, stateful) against
known data:

    spark.dataSource.register(ParquetReplayStreamSource)
    src = (spark.readStream.format("parquet_replay")
           .option("path", "/root/testdata/sf0.001/documents.parquet")
           .option("rows_per_batch", "200")
           .load())

Offsets are plain row positions (``{"row": n}``), so
``readBetweenOffsets(start, end)`` re-serves exactly the rows of a
previously planned batch — the contract Structured Streaming needs to
recover a failed batch from the offset log.  Rows are ordered by the
file's physical row order (parquet row order is stable), making every
run bit-identical.

This uses ``SimpleDataSourceStreamReader`` — the driver-side variant of
the streaming source API, sized for control-plane streams (file
replay, queues, CDC feeds at modest rates).  A partition-planned
``streamReader`` is the bulk-data path; the operators downstream of
this source are unaffected by which variant feeds them.
"""

from __future__ import annotations

import pyarrow.parquet as pq

from pyspark.sql.datasource import (
    DataSource,
    SimpleDataSourceStreamReader,
)


class ParquetReplayStreamSource(DataSource):
    """``spark.readStream.format("parquet_replay")`` — see module doc."""

    @classmethod
    def name(cls) -> str:
        return "parquet_replay"

    def schema(self):
        from pyspark.sql.pandas.types import from_arrow_schema

        path = self.options.get("path")
        if not path:
            raise ValueError("parquet_replay requires option 'path'")
        schema = pq.read_schema(path)
        cols = _columns_option(self.options)
        if cols is not None:
            schema = pq.read_schema(path)
            import pyarrow as pa

            schema = pa.schema([schema.field(c) for c in cols])
        return from_arrow_schema(schema)

    def simpleStreamReader(self, schema) -> "ParquetReplayStreamReader":
        return ParquetReplayStreamReader(self.options)


def _columns_option(options: dict) -> list[str] | None:
    cols = options.get("columns")
    if not cols:
        return None
    return [c.strip() for c in cols.split(",") if c.strip()]


class ParquetReplayStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("parquet_replay requires option 'path'")
        self.rows_per_batch = int(options.get("rows_per_batch", "1000"))
        self.columns = _columns_option(options)
        self._table = None

    # lazy: the reader object is pickled to the offset log; the table
    # must not ride along
    def _tbl(self):
        if self._table is None:
            # column projection happens at the arrow read — payload
            # columns the stream never uses are never materialized
            self._table = pq.read_table(self.path, columns=self.columns)
        return self._table

    def __getstate__(self):
        state = self.__dict__.copy()
        state["_table"] = None
        return state

    def initialOffset(self) -> dict:
        return {"row": 0}

    def _rows(self, start: int, end: int):
        # a list_iterator, not a generator: the planned batch is
        # PICKLED to the executors (generators can't pickle; a bare
        # list fails the engine's iterator check), and batch size is
        # bounded by rows_per_batch
        tbl = self._tbl()
        cols = tbl.column_names
        return iter(
            [
                tuple(rec[c] for c in cols)
                for rec in tbl.slice(start, end - start).to_pylist()
            ]
        )

    def read(self, start: dict):
        tbl = self._tbl()
        lo = start["row"]
        hi = min(lo + self.rows_per_batch, tbl.num_rows)
        return self._rows(lo, hi), {"row": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return self._rows(start["row"], end["row"])

    def commit(self, end: dict) -> None:
        pass
