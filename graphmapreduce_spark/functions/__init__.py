"""Column-expression libraries: text analysis, vectors, fingerprints.

Everything here returns built-in Column expressions (JVM-side, inside
whole-stage codegen) — no Python UDFs on these paths.
"""

from graphmapreduce_spark.functions import text, vectors  # noqa: F401
