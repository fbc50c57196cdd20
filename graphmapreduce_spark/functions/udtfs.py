"""Python UDTFs (PySpark 4 table-function API).

The reference's whole ``GMR`` subclass surface is a user map + reduce
pair (``gmr.h:77-108``); Spark's modern analog set is UDF / pandas_udf /
applyInPandas / mapInPandas / @udtf.  The first four are covered by
q25/q28 and the multimodal operators; this module covers the genuine
table-function API: a class with ``eval`` yielding rows, registered for
SQL ``LATERAL`` correlation.

Row-at-a-time Python is the SLOW path by design — use it for API parity
and genuinely row-generating logic; bulk transforms belong in
expressions or Arrow-batched pandas (see functions/text.py).
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="pos int, term string")
class TokenizeUdtf:
    """One output row per whitespace token: (position, term).

    ``str.split()`` with no argument splits on whitespace runs and
    drops empties — the same tokenization as ``functions.text.words``.
    """

    def eval(self, text: str):  # noqa: A003 - UDTF contract name
        if text is None:
            return
        for i, w in enumerate(text.split()):
            yield i, w


def register_udtfs(spark) -> None:
    """Register all module UDTFs for SQL use (idempotent)."""
    spark.udtf.register("tokenize_udtf", TokenizeUdtf)
