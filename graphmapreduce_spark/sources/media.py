"""Media-directory ingestion via Spark's built-in ``binaryFile`` source.

The reference has no media path at all; this is part of the [EXT]
training-data-pipeline surface.  A directory of image/audio files
becomes a DataFrame of opaque binary payloads plus typed metadata —
the shape the rest of ``operators.multimodal`` consumes.  Everything
here stays JVM-side: the modality sniff is a hex prefix comparison on
the binary column (whole-stage codegen), so payload bytes never cross
into Python here.  Note the sniff columns (kind/mime) DERIVE from the
payload, so selecting them reads file bytes; projections of only
path/length/modification_time prune the content column at the scan
(pytest-verified).  At scale the ``maxPartitionBytes``-driven file
grouping of binaryFile handles many-small-files layouts without a
custom reader.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# magic-byte prefixes (hex of the first bytes of the file)
_MAGIC = [
    ("89504E47", "image", "image/png"),  # \x89PNG
    ("FFD8FF", "image", "image/jpeg"),
    ("474946383", "image", "image/gif"),  # GIF87a/GIF89a
    ("52494646", "audio", "audio/x-wav"),  # RIFF (refined below)
    ("494433", "audio", "audio/mpeg"),  # ID3
    ("664C6143", "audio", "audio/flac"),  # fLaC
    ("1A45DFA3", "video", "video/webm"),  # EBML
]


def read_media_dir(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    recursive: bool = True,
) -> DataFrame:
    """Read every file under ``path`` as one row:
    (path, length, modification_time, payload, kind, mime).

    ``kind``/``mime`` come from a magic-byte sniff compiled to a
    CASE-over-hex-prefix expression — never from the file extension
    (corpus crawls lie about extensions) and never in Python.  RIFF
    containers are disambiguated WAVE vs AVI by the format tag at
    offset 9.  Unknown payloads keep kind='binary' so downstream
    filters are explicit about what they decode.
    """
    reader = spark.read.format("binaryFile")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    df = reader.load(path)

    head = F.hex(F.substring(F.col("content"), 1, 12))
    kind, mime = F.lit("binary"), F.lit("application/octet-stream")
    for prefix, k, m in reversed(_MAGIC):
        hit = head.startswith(prefix)
        if prefix == "52494646":  # RIFF: WAVE vs AVI at byte offset 9
            tag = F.hex(F.substring(F.col("content"), 9, 4))
            k_col = F.when(tag == F.lit("57415645"), "audio").otherwise(
                "video"
            )
            m_col = F.when(
                tag == F.lit("57415645"), "audio/x-wav"
            ).otherwise("video/x-msvideo")
            kind = F.when(hit, k_col).otherwise(kind)
            mime = F.when(hit, m_col).otherwise(mime)
        else:
            kind = F.when(hit, F.lit(k)).otherwise(kind)
            mime = F.when(hit, F.lit(m)).otherwise(mime)

    return df.select(
        F.col("path"),
        F.col("length"),
        F.col("modificationTime").alias("modification_time"),
        F.col("content").alias("payload"),
        kind.alias("kind"),
        mime.alias("mime"),
    )
