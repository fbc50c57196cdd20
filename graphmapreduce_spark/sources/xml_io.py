"""XML source/sink via Spark 4's native XML data source.

Spark 4 absorbed the spark-xml package, so ``format("xml")`` needs no
external jar — each ``rowTag`` element becomes a row, nested elements
become structs, and schema inference types leaf text (integers surface
as LONG, so parquet INT columns come back widened — value-identical).

Scale notes (the reason these helpers exist rather than raw
``spark.read`` calls at every site):

- XML is an INGESTION format, not a working format: tags cost multiples
  of the data bytes, there is no column pruning, predicate pushdown, or
  per-column encoding, and schema inference is an extra full scan
  (``samplingRatio`` trims it at the accuracy cost you'd expect).  The
  production pattern is land-once → parquet, then query the parquet —
  ``read_xml(...).write.parquet(...)`` is the whole pipeline.
- Reads parallelize per FILE (a rowTag element can't be split safely at
  arbitrary byte offsets the way line-delimited text can), so many
  medium files beat one giant file; the writer emits one XML file per
  partition, which round-trips that layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_xml(
    spark: SparkSession,
    path: str,
    row_tag: str = "row",
    schema: str | None = None,
    sampling_ratio: float | None = None,
) -> DataFrame:
    """Read XML files: one row per ``row_tag`` element.  Pass ``schema``
    (DDL string) to skip the inference scan — the right call on large
    ingests where the shape is known."""
    r = spark.read.format("xml").option("rowTag", row_tag)
    if schema is not None:
        r = r.schema(schema)
    elif sampling_ratio is not None:
        r = r.option("samplingRatio", str(sampling_ratio))
    return r.load(path)


def write_xml(
    df: DataFrame,
    path: str,
    row_tag: str = "row",
    root_tag: str = "rows",
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as XML (one file per partition, ``row_tag`` element
    per row, special characters escaped by the writer)."""
    (
        df.write.format("xml")
        .option("rowTag", row_tag)
        .option("rootTag", root_tag)
        .mode(mode)
        .save(path)
    )
