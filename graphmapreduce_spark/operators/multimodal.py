"""Multimodal (image/audio/video) column handling.

Media are opaque ``binary`` columns plus typed metadata — the pattern
that keeps 100 TB of media shuffle-friendly: Spark moves the bytes, only
Arrow-batched pandas UDFs ever look inside them, and metadata-only
queries never deserialize payloads (column pruning drops the binary
column at the parquet scan).

The decode/feature steps are STUBBED: the real image/audio codecs are
not in this environment.  ``decode_image`` raises NotImplementedError
unless ``fake=True``, in which case a deterministic fake decoder
produces stable pseudo-pixels from the bytes — so the Spark-side
plumbing (schemas, batch iteration, partitioning) is fully real and
testable; swapping in PIL/ffmpeg later changes one inner function.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("mime", StringType(), True),
        StructField("payload", BinaryType(), True),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)


def media_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Payload-agnostic metadata: byte length + md5 — pure built-ins, the
    binary column never crosses into Python."""
    return df.withColumn("n_bytes", F.octet_length(payload_col)).withColumn(
        "payload_md5", F.md5(payload_col)
    )


def _fake_decode(payload: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic fake decoder: seed a PRNG from the payload digest and
    emit (height, width) float 'pixels' — a stand-in with the same shape
    contract as a real decoder."""
    seed = int.from_bytes(hashlib.md5(payload or b"").digest()[:4], "big")
    rng = np.random.RandomState(seed)
    return rng.random_sample((max(1, int(height or 4)), max(1, int(width or 4))))


def extract_image_features(
    df: DataFrame,
    payload_col: str = "payload",
    fake: bool = False,
    n_features: int = 8,
) -> DataFrame:
    """Per-image feature vector via ``mapInPandas`` (Arrow-batched).

    Output: input columns minus the payload, plus ``features
    array<double>``.  With ``fake=False`` this raises
    NotImplementedError at execution time (codec libraries absent here);
    ``fake=True`` uses the deterministic stand-in decoder.
    """
    out_fields = [f for f in df.schema.fields if f.name != payload_col]
    out_schema = StructType(
        out_fields + [StructField("features", ArrayType(DoubleType()), True)]
    )
    keep = [f.name for f in out_fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real image decoding requires PIL/cv2 — not present in "
                    "this environment; pass fake=True for the deterministic stub"
                )
            feats = []
            for payload, w, h in zip(
                pdf[payload_col], pdf.get("width", [4] * len(pdf)), pdf.get("height", [4] * len(pdf))
            ):
                px = _fake_decode(payload, w or 4, h or 4)
                # simple pooled stats as the 'features'
                vec = [
                    float(px.mean()),
                    float(px.std()),
                    float(px.min()),
                    float(px.max()),
                ]
                vec += [float(x) for x in px.mean(axis=0)[: max(0, n_features - 4)]]
                feats.append(vec[:n_features])
            out = pdf[keep].copy()
            out["features"] = feats
            yield out

    return df.mapInPandas(run, schema=out_schema)


def sample_video_frames(
    df: DataFrame,
    payload_col: str = "payload",
    every_ms: int = 1000,
    fake: bool = False,
) -> DataFrame:
    """Frame sampling: one output row per sampled frame (media_id,
    frame_idx, ts_ms, frame_md5).  Real decode is stubbed; fake mode
    derives frame pseudo-content deterministically from payload+index."""
    out_schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("frame_idx", LongType(), False),
            StructField("ts_ms", LongType(), False),
            StructField("frame_md5", StringType(), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real video decoding requires ffmpeg — not present; "
                    "pass fake=True for the deterministic stub"
                )
            rows = []
            for mid, payload, dur in zip(
                pdf["media_id"], pdf[payload_col], pdf["duration_ms"]
            ):
                n = max(1, int((dur or 0) // every_ms))
                for i in range(n):
                    h = hashlib.md5((payload or b"") + i.to_bytes(4, "big")).hexdigest()
                    rows.append((int(mid), i, i * every_ms, h))
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "ts_ms", "frame_md5"]
            )

    return df.mapInPandas(run, schema=out_schema)


def extract_audio_features(
    df: DataFrame,
    payload_col: str = "payload",
    sample_rate: int = 16_000,
    frame_ms: int = 25,
    fake: bool = False,
) -> DataFrame:
    """Per-clip audio features via ``mapInPandas`` (Arrow-batched).

    Output: (media_id, n_samples, n_frames, rms_mean, rms_max,
    zcr_mean) — framed RMS energy and zero-crossing rate, the standard
    first-pass audio quality/VAD signals.  Real PCM decode is stubbed
    (no soundfile/ffmpeg here): ``fake=True`` synthesizes a
    deterministic waveform from the payload digest with the same
    shape contract (duration_ms × sample_rate samples in [-1, 1]);
    ``fake=False`` raises NotImplementedError at execution time.

    Scale shape: one input row → one output row, payload dropped on
    output, so the expensive column never shuffles downstream; batches
    stream through Arrow without materializing a partition at once.
    """
    out_schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("n_samples", LongType(), False),
            StructField("n_frames", LongType(), False),
            StructField("rms_mean", DoubleType(), True),
            StructField("rms_max", DoubleType(), True),
            StructField("zcr_mean", DoubleType(), True),
        ]
    )
    frame_len = max(1, sample_rate * frame_ms // 1000)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real audio decoding requires soundfile/ffmpeg — not "
                    "present in this environment; pass fake=True for the "
                    "deterministic stub"
                )
            rows = []
            for mid, payload, dur in zip(
                pdf["media_id"], pdf[payload_col], pdf["duration_ms"]
            ):
                seed = int.from_bytes(
                    hashlib.md5(payload or b"").digest()[:4], "big"
                )
                rng = np.random.RandomState(seed)
                n = max(frame_len, int((dur or frame_ms) * sample_rate // 1000))
                wave = rng.uniform(-1.0, 1.0, size=n)
                n_frames = n // frame_len
                frames = wave[: n_frames * frame_len].reshape(
                    n_frames, frame_len
                )
                rms = np.sqrt((frames**2).mean(axis=1))
                zcr = (np.diff(np.signbit(frames), axis=1) != 0).mean(axis=1)
                rows.append(
                    (
                        int(mid),
                        int(n),
                        int(n_frames),
                        float(rms.mean()),
                        float(rms.max()),
                        float(zcr.mean()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "n_samples",
                    "n_frames",
                    "rms_mean",
                    "rms_max",
                    "zcr_mean",
                ],
            )

    return df.mapInPandas(run, schema=out_schema)
