"""Pure-stdlib media codecs: PNG and WAV decode/encode.

The reference treats media as opaque byte payloads (its record model is
format-agnostic blocks, ``gmr.h:40-70``); the Spark-side pipeline keeps
that shape — binary columns, Arrow batches — but the decode step itself
needs a codec.  PIL / soundfile / ffmpeg are not available in every
runtime, so this module implements the two bootstrap formats with
nothing beyond the Python standard library + numpy:

- **PNG** (``decode_png`` / ``encode_png``): full non-interlaced 8-bit
  support — color types 0 (grey), 2 (RGB), 4 (grey+alpha), 6 (RGBA),
  all five scanline filters (None/Sub/Up/Average/Paeth) with a
  vectorized numpy unfilter loop (per-scanline, not per-byte).
- **WAV** (``decode_wav`` / ``encode_wav``): PCM 8/16/32-bit via the
  stdlib ``wave`` module, returned as float64 in [-1, 1].

``decode_image`` / ``decode_audio`` are the sniffing front doors used by
``operators.multimodal``: they try PIL / soundfile first when installed
(broader format support, C-speed), then fall back to these decoders for
PNG/WAV, and raise ``NotImplementedError`` naming the actual format only
when neither path applies.  That turns "decode is env-blocked" into
"decode works for PNG/WAV everywhere, and for everything else wherever
the optional codec libs exist".
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# color type -> samples per pixel
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor, vectorized over a scanline (PNG spec 9.4)."""
    a = a.astype(np.int16)
    b = b.astype(np.int16)
    c = c.astype(np.int16)
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def decode_png(payload: bytes) -> np.ndarray:
    """Decode a non-interlaced 8-bit PNG to uint8 ndarray.

    Returns shape (h, w) for greyscale, (h, w, c) otherwise.  Raises
    ``ValueError`` on malformed input, ``NotImplementedError`` for
    interlaced images, palette color, or bit depths other than 8.
    """
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG: bad signature")
    pos, idat, ihdr = 8, [], None
    while pos + 8 <= len(payload):
        (length,), ctype = struct.unpack(">I", payload[pos : pos + 4]), payload[
            pos + 4 : pos + 8
        ]
        body = payload[pos + 8 : pos + 8 + length]
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
        pos += 12 + length  # len + type + body + crc
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, color, _comp, _filt, interlace = ihdr
    if depth != 8:
        raise NotImplementedError(f"PNG bit depth {depth} (only 8 supported)")
    if color not in _PNG_CHANNELS:
        raise NotImplementedError(f"PNG color type {color} (palette unsupported)")
    if interlace:
        raise NotImplementedError("interlaced PNG unsupported")
    ch = _PNG_CHANNELS[color]
    stride = w * ch
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG data length mismatch")
    raw = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    filters, data = raw[:, 0], raw[:, 1:]
    out = np.empty((h, stride), dtype=np.uint8)
    zero = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        line = data[y]
        up = out[y - 1] if y else zero
        f = filters[y]
        if f == 0:
            out[y] = line
        elif f == 1:  # Sub: sequential in x -> cumulative per pixel-lane
            rec = line.reshape(-1, ch).astype(np.uint16)
            out[y] = np.cumsum(rec, axis=0).astype(np.uint8).reshape(-1)
        elif f == 2:  # Up
            out[y] = line + up
        elif f == 3:  # Average: sequential dependency on left neighbor
            row = out[y]
            row[:ch] = line[:ch] + (up[:ch] >> 1)
            for x in range(ch, stride):
                row[x] = (
                    line[x] + ((int(row[x - ch]) + int(up[x])) >> 1)
                ) & 0xFF
        elif f == 4:  # Paeth: left-dependency -> per-pixel column sweep
            row = out[y]
            prior = up.reshape(-1, ch)
            cur = line.reshape(-1, ch)
            left = np.zeros(ch, dtype=np.uint8)
            upleft = np.zeros(ch, dtype=np.uint8)
            rrow = row.reshape(-1, ch)
            for x in range(w):
                rrow[x] = cur[x] + _paeth(left, prior[x], upleft)
                left, upleft = rrow[x], prior[x]
        else:
            raise ValueError(f"bad PNG filter {f}")
    return out.reshape(h, w) if ch == 1 else out.reshape(h, w, ch)


def encode_png(arr: np.ndarray, filter_type: int = 0) -> bytes:
    """Encode uint8 (h,w) / (h,w,2) / (h,w,3) / (h,w,4) as PNG.

    ``filter_type`` applies one scanline filter uniformly (0-4) — mainly
    so tests can exercise every decoder unfilter path; 0 is the fast
    default.
    """
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        color, ch = 0, 1
        arr = arr[:, :, None]
    elif arr.ndim == 3 and arr.shape[2] in (1, 2, 3, 4):
        ch = arr.shape[2]
        color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    else:
        raise ValueError(f"unsupported array shape {arr.shape}")
    h, w = arr.shape[:2]
    flat = arr.reshape(h, w * ch).astype(np.int16)
    zero = np.zeros(w * ch, dtype=np.int16)
    lines = []
    for y in range(h):
        line, up = flat[y], (flat[y - 1] if y else zero)
        if filter_type == 0:
            enc = line
        elif filter_type == 1:
            left = np.concatenate([np.zeros((1, ch), np.int16),
                                   line.reshape(-1, ch)[:-1]]).reshape(-1)
            enc = line - left
        elif filter_type == 2:
            enc = line - up
        elif filter_type == 3:
            left = np.concatenate([np.zeros((1, ch), np.int16),
                                   line.reshape(-1, ch)[:-1]]).reshape(-1)
            enc = line - ((left + up) >> 1)
        elif filter_type == 4:
            left = np.concatenate([np.zeros((1, ch), np.int16),
                                   line.reshape(-1, ch)[:-1]]).reshape(-1)
            upleft = np.concatenate([np.zeros((1, ch), np.int16),
                                     up.reshape(-1, ch)[:-1]]).reshape(-1)
            enc = line - _paeth(
                (left & 0xFF).astype(np.uint8),
                (up & 0xFF).astype(np.uint8),
                (upleft & 0xFF).astype(np.uint8),
            )
        else:
            raise ValueError(f"bad filter_type {filter_type}")
        lines.append(bytes([filter_type]) + (enc & 0xFF).astype(np.uint8).tobytes())

    def chunk(ctype: bytes, body: bytes) -> bytes:
        crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    idat = zlib.compress(b"".join(lines), 6)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode a PCM WAV to (float64 samples in [-1, 1], sample_rate).

    Mono returns shape (n,); multi-channel (n, ch).  Supports 8-bit
    unsigned, 16-bit and 32-bit signed little-endian PCM (what the
    stdlib ``wave`` module reads).
    """
    with wave.open(io.BytesIO(payload), "rb") as f:
        ch, sw, sr, n = f.getnchannels(), f.getsampwidth(), f.getframerate(), f.getnframes()
        raw = f.readframes(n)
    if sw == 1:
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    elif sw == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif sw == 4:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float64) / 2147483648.0
    else:
        raise NotImplementedError(f"WAV sample width {sw} bytes")
    return (x if ch == 1 else x.reshape(-1, ch)), sr


def encode_wav(samples: np.ndarray, sample_rate: int, sampwidth: int = 2) -> bytes:
    """Encode float samples in [-1, 1] (shape (n,) or (n, ch)) as PCM WAV."""
    x = np.asarray(samples, dtype=np.float64)
    ch = 1 if x.ndim == 1 else x.shape[1]
    x = np.clip(x, -1.0, 1.0).reshape(-1)
    if sampwidth == 1:
        pcm = (np.round(x * 127.0) + 128).astype(np.uint8).tobytes()
    elif sampwidth == 2:
        pcm = np.round(x * 32767.0).astype("<i2").tobytes()
    elif sampwidth == 4:
        pcm = np.round(x * 2147483647.0).astype("<i4").tobytes()
    else:
        raise NotImplementedError(f"WAV sample width {sampwidth} bytes")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(ch)
        f.setsampwidth(sampwidth)
        f.setframerate(sample_rate)
        f.writeframes(pcm)
    return buf.getvalue()


def decode_image(payload: bytes) -> np.ndarray:
    """Sniff + decode an image payload to a uint8 ndarray.

    PIL first when installed (any format it knows), then the stdlib PNG
    path; raises ``NotImplementedError`` naming the detected format when
    neither applies.
    """
    try:  # optional fast path — broad format coverage when PIL exists
        from PIL import Image  # type: ignore

        return np.asarray(Image.open(io.BytesIO(payload)))
    except ImportError:
        pass
    if payload[:8] == _PNG_SIG:
        return decode_png(payload)
    head = payload[:4]
    fmt = (
        "jpeg" if head[:3] == b"\xff\xd8\xff"
        else "gif" if head == b"GIF8"
        else "bmp" if head[:2] == b"BM"
        else "unknown"
    )
    raise NotImplementedError(
        f"image format '{fmt}' needs PIL (not installed); PNG decodes natively"
    )


def decode_audio(payload: bytes) -> tuple[np.ndarray, int]:
    """Sniff + decode an audio payload to (float64 samples, rate).

    soundfile first when installed, then the stdlib WAV path."""
    try:  # optional fast path
        import soundfile as sf  # type: ignore

        data, sr = sf.read(io.BytesIO(payload), dtype="float64")
        return data, int(sr)
    except ImportError:
        pass
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return decode_wav(payload)
    raise NotImplementedError(
        "audio format needs soundfile/ffmpeg (not installed); "
        "PCM WAV decodes natively"
    )


# ---------------------------------------------------------------------------
# GMRV — a minimal deterministic video container (no stdlib video codec
# exists and ffmpeg is absent, so real end-to-end video plumbing uses
# this documented format instead of a stub):
#   magic "GMRV" | u32 n_frames | n_frames × (u64 ts_ms | u32 len |
#   PNG payload).  Every frame is an independent PNG (keyframe-only,
#   like MJPEG) — decode needs nothing beyond the PNG codec above.
# ---------------------------------------------------------------------------

_GMRV_MAGIC = b"GMRV"


def encode_video_gmrv(frames: list[tuple[int, np.ndarray]]) -> bytes:
    """Encode (ts_ms, uint8 image) keyframes into a GMRV payload."""
    out = [_GMRV_MAGIC, struct.pack(">I", len(frames))]
    for ts_ms, arr in frames:
        png = encode_png(arr)
        out.append(struct.pack(">QI", int(ts_ms), len(png)))
        out.append(png)
    return b"".join(out)


def scan_video_gmrv(payload: bytes) -> list[tuple[int, int, int]]:
    """Walk GMRV headers WITHOUT decoding pixels: [(ts_ms, offset,
    length), ...] — keyframe-seek callers decode only the frames they
    actually select (``decode_png(payload[off:off+length])``)."""
    if payload[:4] != _GMRV_MAGIC:
        raise NotImplementedError(
            "video format needs ffmpeg (not installed); the GMRV"
            " keyframe container decodes natively"
        )
    (n,) = struct.unpack(">I", payload[4:8])
    pos = 8
    index = []
    for _ in range(n):
        ts_ms, length = struct.unpack(">QI", payload[pos:pos + 12])
        pos += 12
        index.append((int(ts_ms), pos, length))
        pos += length
    return index


def decode_video_gmrv(payload: bytes) -> list[tuple[int, np.ndarray]]:
    """Decode a GMRV payload to [(ts_ms, uint8 image), ...]."""
    return [
        (ts_ms, decode_png(payload[off:off + length]))
        for ts_ms, off, length in scan_video_gmrv(payload)
    ]
