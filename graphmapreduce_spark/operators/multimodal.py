"""Multimodal (image/audio/video) column handling.

Media are opaque ``binary`` columns plus typed metadata — the pattern
that keeps 100 TB of media shuffle-friendly: Spark moves the bytes, only
Arrow-batched pandas UDFs ever look inside them, and metadata-only
queries never deserialize payloads (column pruning drops the binary
column at the parquet scan).

Decode is REAL for PNG and PCM WAV via the pure-stdlib codecs in
``functions.codecs`` (zlib/struct/wave + numpy — no PIL/soundfile
needed), and routes through PIL/soundfile automatically when those are
installed for broader format coverage.  Video decodes REALLY too, via
the documented GMRV keyframe container (length-prefixed PNG keyframes,
``functions.codecs`` — no stdlib video codec exists and ffmpeg is
absent, so the engine ships its own deterministic container instead of
a stub).  ``fake=True`` selects a deterministic stand-in decoder
(stable pseudo-pixels from the payload digest) for plumbing tests and
formats with no available codec.
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

from graphmapreduce_spark.functions import codecs

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
    array<double>``.  ``fake=False`` (default contract) decodes for
    real: PIL when installed, else the stdlib PNG decoder in
    ``functions.codecs`` — multi-channel images are averaged to a
    grayscale float image in [0, 1] before pooling.  ``fake=True`` uses
    the deterministic stand-in decoder (plumbing tests / formats with no
    codec available).
    """
    out_fields = [f for f in df.schema.fields if f.name != payload_col]
    out_schema = StructType(
        out_fields + [StructField("features", ArrayType(DoubleType()), True)]
    )
    keep = [f.name for f in out_fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload, w, h in zip(
                pdf[payload_col], pdf.get("width", [4] * len(pdf)), pdf.get("height", [4] * len(pdf))
            ):
                if fake:
                    px = _fake_decode(payload, w or 4, h or 4)
                else:
                    arr = codecs.decode_image(bytes(payload or b""))
                    px = arr.astype(np.float64) / 255.0
                    if px.ndim == 3:
                        px = px.mean(axis=2)
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
    """Frame sampling: one output row per sampled timestamp (media_id,
    frame_idx, ts_ms, frame_md5).

    ``fake=False`` (default contract) REALLY decodes: the payload is a
    GMRV keyframe container (``functions.codecs.encode_video_gmrv`` —
    length-prefixed PNG keyframes; ffmpeg is absent, so this documented
    format is the native video path), each sampled timestamp picks the
    latest keyframe at-or-before it (keyframe-seek semantics), the PNG
    is pixel-decoded, and ``frame_md5`` digests the DECODED pixel bytes
    — byte-identical pixels hash equal across containers.  ``fake=True``
    keeps the deterministic stand-in (plumbing tests / containers with
    no codec)."""
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
            rows = []
            for mid, payload, dur in zip(
                pdf["media_id"], pdf[payload_col], pdf["duration_ms"]
            ):
                if fake:
                    n = max(1, int((dur or 0) // every_ms))
                    for i in range(n):
                        h = hashlib.md5(
                            (payload or b"") + i.to_bytes(4, "big")
                        ).hexdigest()
                        rows.append((int(mid), i, i * every_ms, h))
                    continue
                raw = bytes(payload or b"")
                index = codecs.scan_video_gmrv(raw)
                if not index:
                    continue
                end_ms = int(dur) if dur else index[-1][0] + every_ms
                # single two-pointer walk over headers × sampled
                # timestamps; each selected keyframe is pixel-decoded
                # AT MOST ONCE (lazy header scan — no upfront decode
                # of keyframes the sampling stride skips)
                i = 0
                j = -1  # index of latest keyframe at-or-before ts
                md5_cache = None  # digest of keyframe j
                for ts in range(0, max(end_ms, 1), every_ms):
                    while j + 1 < len(index) and index[j + 1][0] <= ts:
                        j += 1
                        md5_cache = None
                    if j < 0:
                        continue
                    if md5_cache is None:
                        _, off, length = index[j]
                        px = codecs.decode_png(raw[off:off + length])
                        md5_cache = hashlib.md5(
                            np.ascontiguousarray(px).tobytes()
                        ).hexdigest()
                    rows.append((int(mid), i, ts, md5_cache))
                    i += 1
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "ts_ms", "frame_md5"]
            )

    return df.mapInPandas(run, schema=out_schema)


def _resize_nearest(px: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Half-pixel-center nearest-neighbor resize (the OpenCV/PIL
    NEAREST convention): output pixel i samples the source pixel whose
    center is nearest to (i + 0.5) * in/out.  Pure integer index math —
    bit-deterministic for any size pair, up or down."""
    in_h, in_w = px.shape[:2]
    rows = np.minimum(
        ((np.arange(out_h) + 0.5) * in_h / out_h).astype(np.int64), in_h - 1
    )
    cols = np.minimum(
        ((np.arange(out_w) + 0.5) * in_w / out_w).astype(np.int64), in_w - 1
    )
    return px[rows][:, cols]


def _resize_area(px: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Exact box-average downscale: output pixel = mean of its
    (in_h/out_h) × (in_w/out_w) source box.  Requires integer factors
    (the exactness contract — fractional boxes need resampling weights
    whose float order would not be bit-stable); raises ValueError
    otherwise, pointing at mode='nearest'."""
    in_h, in_w = px.shape[:2]
    if in_h % out_h or in_w % out_w:
        raise ValueError(
            f"area resize needs integer factors, got {in_h}x{in_w} -> "
            f"{out_h}x{out_w}; use mode='nearest' for fractional resizes"
        )
    fh, fw = in_h // out_h, in_w // out_w
    shaped = px.reshape(out_h, fh, out_w, fw, *px.shape[2:])
    # sum in int64 then one division — no accumulation-order float drift
    return shaped.sum(axis=(1, 3), dtype=np.int64) // (fh * fw)


def resize_images(
    df: DataFrame,
    out_w: int,
    out_h: int,
    payload_col: str = "payload",
    mode: str = "nearest",
    fake: bool = False,
) -> DataFrame:
    """Batch image resize via ``mapInPandas`` — the missing third leg of
    the decode / feature-extract / resize / frame-sample quartet.

    Decodes each payload (stdlib PNG codec, PIL if installed), resizes
    to (out_w, out_h) with ``mode``:

    - ``nearest`` — half-pixel-center nearest neighbor, any size pair;
    - ``area`` — exact integer-factor box average (the thumbnail /
      training-resolution downscale path; int64 sums, so the result is
      bit-deterministic across partitionings and engines).

    Re-encodes the result as PNG.  Output: input columns minus the
    payload, plus ``payload`` (resized PNG), ``width``/``height`` (the
    new dims, overwriting any metadata columns of those names — they
    describe the payload) and ``pixel_md5`` (digest of the RESIZED
    pixel bytes, the cheap equality handle for dedup/tests).  Arrow
    batches in, Arrow batches out; Spark never deserializes pixels.

    ``fake=True`` routes through the deterministic stand-in decoder and
    emits digest-only rows (payload NULL) — the plumbing contract for
    formats with no codec."""
    if mode not in ("nearest", "area"):
        raise ValueError(f"unknown resize mode {mode!r}")
    keep = [f for f in df.schema.fields
            if f.name not in (payload_col, "width", "height")]
    out_schema = StructType(
        keep
        + [
            StructField("payload", BinaryType(), True),
            StructField("width", LongType(), False),
            StructField("height", LongType(), False),
            StructField("pixel_md5", StringType(), True),
        ]
    )
    keep_names = [f.name for f in keep]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, digests = [], []
            for payload, w, h in zip(
                pdf[payload_col],
                pdf.get("width", [4] * len(pdf)),
                pdf.get("height", [4] * len(pdf)),
            ):
                if fake:
                    px = (_fake_decode(payload, w or 4, h or 4) * 255).astype(
                        np.uint8
                    )
                else:
                    px = codecs.decode_image(bytes(payload or b""))
                small = (
                    _resize_nearest(px, out_w, out_h)
                    if mode == "nearest"
                    else _resize_area(px, out_w, out_h)
                ).astype(np.uint8)
                digests.append(
                    hashlib.md5(np.ascontiguousarray(small).tobytes())
                    .hexdigest()
                )
                payloads.append(
                    None if fake else codecs.encode_png(small)
                )
            out = pdf[keep_names].copy()
            out["payload"] = payloads
            out["width"] = out_w
            out["height"] = out_h
            out["pixel_md5"] = digests
            yield out

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
    first-pass audio quality/VAD signals.  ``fake=False`` decodes for
    real: soundfile when installed, else the stdlib PCM-WAV decoder in
    ``functions.codecs``; the frame length follows the file's actual
    sample rate and multi-channel clips are averaged to mono.
    ``fake=True`` synthesizes a deterministic waveform from the payload
    digest (duration_ms × sample_rate samples in [-1, 1]).

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
            rows = []
            for mid, payload, dur in zip(
                pdf["media_id"], pdf[payload_col], pdf["duration_ms"]
            ):
                if fake:
                    seed = int.from_bytes(
                        hashlib.md5(payload or b"").digest()[:4], "big"
                    )
                    rng = np.random.RandomState(seed)
                    n = max(
                        frame_len, int((dur or frame_ms) * sample_rate // 1000)
                    )
                    wave = rng.uniform(-1.0, 1.0, size=n)
                    flen = frame_len
                else:
                    wave, sr = codecs.decode_audio(bytes(payload or b""))
                    if wave.ndim == 2:
                        wave = wave.mean(axis=1)
                    n = len(wave)
                    flen = max(1, sr * frame_ms // 1000)
                n_frames = n // flen
                frames = wave[: n_frames * flen].reshape(n_frames, flen)
                if n_frames:
                    rms = np.sqrt((frames**2).mean(axis=1))
                    zcr = (
                        np.diff(np.signbit(frames), axis=1) != 0
                    ).mean(axis=1)
                    stats = (
                        float(rms.mean()),
                        float(rms.max()),
                        float(zcr.mean()),
                    )
                else:  # clip shorter than one frame
                    stats = (0.0, 0.0, 0.0)
                rows.append((int(mid), int(n), int(n_frames)) + stats)
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
