"""Readers for the reference's three on-disk graph formats.

Reference formats (SURVEY.md §1.3):

1. plain edge list ``from to`` per line, optional 2-line header
   ``numVertices\\nnumEdges``, ``#`` comments and blank lines skipped
   (ref ``partition.h:548-829``; comment/blank skip at
   ``partition.h:386-387,419-420``).
2. METIS adjacency: header ``nvtxs nedges [fmt] [ncon]``, one line per
   vertex listing neighbors with optional vertex/edge weight columns
   (ref ``graph.h:562-709``, fmt digit flags at ``graph.h:593-597``).
3. pre-partitioned subgraph (fmt 1111): per line
   ``vid vwgt (nbor nbor_part ewgt)*`` (ref ``graph.h:677-699``,
   ``README.md:66-68``).

Scale posture: the *edge list* is the scalable interchange format and is
read distributed via ``spark.read.csv`` (Spark's source splitting replaces
the reference's hand-rolled parallel block read + separator realignment,
``graph.h:163-252,274-549``).  METIS/subgraph adjacency files are
line-number-addressed (vertex id = line index), which is inherently
sequential; they are parsed driver-side and parallelized — appropriate
because those formats are only used for small golden inputs.  Native
at-scale storage is the parquet ``edges(src,dst,weight)`` table.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graphmapreduce_spark.graph.property_graph import EDGE_SCHEMA, PropertyGraph


def read_edge_list(
    spark: SparkSession,
    path: str,
    has_header_counts: bool | None = None,
    delimiter: str | None = None,
    default_weight: float = 1.0,
    one_based_shift: bool = False,
) -> PropertyGraph:
    """Distributed edge-list reader.

    Accepts ``src dst [weight]`` rows; skips ``#`` comments and blank
    lines; tolerates (and drops) the reference's 2-line count header by
    filtering any row without a second field when ``has_header_counts``
    is None (auto).  ``one_based_shift=True`` shifts 0-based inputs to
    1-based like the reference (``partition.h:435-437``) — opt-in
    compat: the min-id probe it needs is an extra full pass over the
    edge set, which only ever matters for the reference's small
    fixtures, never for at-scale inputs.
    """
    raw = spark.read.text(path)
    parts = F.split(F.trim(F.col("value")), delimiter or r"\s+")
    df = (
        raw.filter(~F.col("value").rlike(r"^\s*(#.*)?$"))
        .select(parts.alias("p"))
        .filter(F.size("p") >= 2)  # drops the header count lines
        .select(
            F.element_at("p", 1).cast("long").alias("src"),
            F.element_at("p", 2).cast("long").alias("dst"),
            F.coalesce(
                F.try_element_at("p", F.lit(3)).cast("double"),
                F.lit(float(default_weight)),
            ).alias("weight"),
        )
        .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
    )
    if one_based_shift:
        min_id = df.agg(F.min(F.least("src", "dst"))).first()[0]
        if min_id == 0:
            df = df.select(
                (F.col("src") + 1).alias("src"),
                (F.col("dst") + 1).alias("dst"),
                "weight",
            )
    return PropertyGraph.from_edges(df)


def _parse_metis_lines(lines: list[str]):
    """Shared METIS header/body tokenizer.  Returns (header, body rows)."""
    body = [
        ln.strip()
        for ln in lines
        if ln.strip() and not ln.lstrip().startswith("%")
    ]
    header = body[0].split()
    return header, body[1:]


def read_metis(spark: SparkSession, path: str) -> PropertyGraph:
    """METIS adjacency reader (ref ``graph.h:562-709``).

    Header: ``nvtxs nedges [fmt] [ncon]``.  fmt is a 3-digit flag string
    ``ABC``: A=vertex sizes present, B=vertex weights present, C=edge
    weights present (ref ``graph.h:593-597``).  Vertex ids are 1-based
    line indices.
    """
    with open(path) as f:
        header, rows = _parse_metis_lines(f.readlines())
    nvtxs = int(header[0])
    fmt = header[2] if len(header) > 2 else "000"
    fmt = fmt.zfill(3)
    has_vsize = fmt[0] == "1"
    has_vwgt = fmt[1] == "1"
    has_ewgt = fmt[2] == "1"
    ncon = int(header[3]) if len(header) > 3 else (1 if has_vwgt else 0)

    edges = []
    vertices = []
    for vid, line in enumerate(rows[:nvtxs], start=1):
        toks = line.split()
        i = 0
        if has_vsize:
            i += 1
        vwgt = 1.0
        if has_vwgt:
            vwgt = float(toks[i])
            i += ncon
        vertices.append((vid, vwgt))
        while i < len(toks):
            nbor = int(toks[i])
            i += 1
            w = 1.0
            if has_ewgt:
                w = float(toks[i])
                i += 1
            edges.append((vid, nbor, w))
    for vid in range(len(rows[:nvtxs]) + 1, nvtxs + 1):
        vertices.append((vid, 1.0))
    e = spark.createDataFrame(edges or [(None, None, None)], EDGE_SCHEMA)
    if not edges:
        e = e.limit(0)
    v = spark.createDataFrame(
        [(i, w) for i, w in vertices], "id long, value double"
    )
    return PropertyGraph(v, e)


def read_subgraph_files(spark: SparkSession, paths: list[str]) -> PropertyGraph:
    """Pre-partitioned subgraph reader (fmt 1111, ref ``graph.h:677-699``).

    Per line: ``vid vwgt (nbor_id nbor_partition edge_wgt)*``.  The
    partition-ownership column is parsed and *discarded* — Spark's shuffle
    partitioning replaces explicit ownership (SURVEY.md §1.4).
    """
    edges = []
    vertices = []
    for path in paths:
        with open(path) as f:
            first = True
            for line in f:
                toks = line.split()
                if not toks or toks[0].startswith(("%", "#")):
                    continue
                if first:
                    first = False
                    # per-file header `nvtxs nedges fmt` (3 tokens; vertex
                    # rows have 2 + 3k tokens) — e.g. the reference's
                    # small.graph.subgraph.* fixtures carry it
                    if len(toks) == 3:
                        continue
                vid = int(toks[0])
                vwgt = float(toks[1])
                vertices.append((vid, vwgt))
                for i in range(2, len(toks) - 2, 3):
                    nbor = int(toks[i])
                    # toks[i+1] = owning partition id — intentionally unused
                    w = float(toks[i + 2])
                    edges.append((vid, nbor, w))
    e = spark.createDataFrame(edges or [(None, None, None)], EDGE_SCHEMA)
    if not edges:
        e = e.limit(0)
    v = spark.createDataFrame(sorted(set(vertices)), "id long, value double")
    return PropertyGraph(v, e)
