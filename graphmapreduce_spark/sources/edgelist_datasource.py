"""Custom Python Data Source (PySpark 4 API) for edge-list graph files.

Re-expresses the reference's parallel block read (``graph.h:274-549``:
every rank seeks to ``rank*filesize/p`` and realigns to a record
boundary, separator search ``graph.h:163-252``) as a Spark
``DataSource``: the driver plans byte-range ``InputPartition``s, each
executor-side ``read()`` seeks to its range and applies the standard
skip-partial-first-line / finish-straddling-last-line protocol, so a
single large file parallelizes without any coordinator.

Usage::

    spark.dataSource.register(EdgeListDataSource)
    df = (spark.read.format("edgelist")
          .option("path", "/data/graph.txt")
          .load())          # src long, dst long, weight double

Options: ``path`` (file or glob), ``delimiter`` (regex, default
whitespace), ``default_weight`` (default 1.0), ``target_partition_bytes``
(default 32 MB).  Comment lines (``#``), blank lines, and the
reference's 2-line count header (rows with fewer than 2 fields,
``partition.h:570-583``) are skipped.

This complements ``graph_readers.read_edge_list`` (the ``spark.read.text``
composition) — same semantics, but as a first-class source usable from
``spark.read.format(...)`` and SQL, and with explicit split planning.
"""

from __future__ import annotations

import glob as _glob
import os
import re

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

EDGE_SCHEMA = StructType(
    [
        StructField("src", LongType(), True),
        StructField("dst", LongType(), True),
        StructField("weight", DoubleType(), True),
    ]
)

DEFAULT_TARGET_PARTITION_BYTES = 32 * 1024 * 1024


class _Split(InputPartition):
    def __init__(self, path: str, start: int, end: int):
        self.path = path
        self.start = start
        self.end = end


class EdgeListDataSource(DataSource):
    """``spark.read.format("edgelist")`` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "edgelist"

    def schema(self):
        return EDGE_SCHEMA

    def reader(self, schema) -> "EdgeListReader":
        return EdgeListReader(self.options)


class EdgeListReader(DataSourceReader):
    def __init__(self, options: dict):
        path = options.get("path")
        if not path:
            raise ValueError("edgelist source requires option 'path'")
        self.paths = sorted(_glob.glob(path)) if _glob.has_magic(path) else [path]
        if not self.paths:
            raise FileNotFoundError(f"edgelist: no files match {path!r}")
        self.delimiter = options.get("delimiter") or r"\s+"
        self.default_weight = float(options.get("default_weight", 1.0))
        self.target_bytes = int(
            options.get("target_partition_bytes", DEFAULT_TARGET_PARTITION_BYTES)
        )

    def partitions(self):
        # driver-side planning only stats files — never reads them
        splits: list[_Split] = []
        for p in self.paths:
            size = os.path.getsize(p)
            if size == 0:
                continue
            n = max(1, (size + self.target_bytes - 1) // self.target_bytes)
            step = (size + n - 1) // n
            for off in range(0, size, step):
                splits.append(_Split(p, off, min(off + step, size)))
        return splits or [_Split(self.paths[0], 0, 0)]

    def read(self, split: _Split):
        delim = re.compile(self.delimiter)
        dw = self.default_weight
        with open(split.path, "rb") as f:
            if split.start > 0:
                # realign: seek to start-1 and discard one line — if the
                # byte before start is the newline we consume only it
                # (start was already a boundary), else the tail of the
                # straddling line the previous split owns
                # (ref find_Separator, graph.h:163-252)
                f.seek(split.start - 1)
                f.readline()
            else:
                f.seek(0)
            pos = f.tell()
            while pos < split.end:
                line = f.readline()
                if not line:
                    break
                pos = f.tell()
                text = line.decode("utf-8", errors="replace").strip()
                if not text or text.startswith("#"):
                    continue
                toks = delim.split(text)
                if len(toks) < 2:  # count-header lines
                    continue
                try:
                    src = int(toks[0])
                    dst = int(toks[1])
                except ValueError:
                    continue
                w = dw
                if len(toks) > 2:
                    try:
                        w = float(toks[2])
                    except ValueError:
                        pass
                yield (src, dst, w)
