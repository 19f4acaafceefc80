"""Multimodal column plumbing — binary payloads with typed metadata.

cognee ingests audio/image documents by transcribing/describing them through
an LLM before chunking (AudioDocument/ImageDocument,
cognee/tasks/documents/classify_documents.py:19-61). A training-data pipeline
treats media as opaque `binary` columns + metadata and runs decode /
feature-extract / frame-sample as Arrow-batched UDFs.

Decoders: uncompressed formats are decoded FOR REAL in pure Python + numpy —
24-bit BMP images (header parse + pixel statistics) and PCM WAV audio (RIFF
chunk walk + sample statistics) — so the feature-extraction path runs
end-to-end on genuine media bytes without PIL/ffmpeg. Compressed formats
(JPEG/PNG/MP3/MP4) raise NotImplementedError with the library they need;
`fake=True` substitutes a deterministic digest-derived decoder for plumbing
tests. Payload bytes stay in Arrow buffers end-to-end; one Python call per
~10k-row batch.
"""

from __future__ import annotations

import hashlib
import math
import struct
from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("mime", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("checksum", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


# --- real decoders (pure Python + numpy; uncompressed formats) ---------------


def decode_bmp(payload: bytes) -> dict:
    """24-bit uncompressed BMP → dimensions + channel statistics.

    Parses BITMAPFILEHEADER (14 bytes) + BITMAPINFOHEADER; rows are
    bottom-up, BGR, padded to 4-byte boundaries."""
    import numpy as np

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    width, height = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise NotImplementedError(f"only 24bpp uncompressed BMP supported (got {bpp}bpp)")
    height_abs = abs(height)
    row_stride = (width * 3 + 3) & ~3
    px = np.frombuffer(
        payload, dtype=np.uint8, count=row_stride * height_abs, offset=data_offset
    ).reshape(height_abs, row_stride)[:, : width * 3].reshape(height_abs, width, 3)
    bgr = px.astype(np.float64) / 255.0
    means = bgr.mean(axis=(0, 1))  # B, G, R
    stds = bgr.std(axis=(0, 1))
    feature = [
        float(means[2]), float(means[1]), float(means[0]),  # mean R, G, B
        float(stds[2]), float(stds[1]), float(stds[0]),     # std R, G, B
        float(width / height_abs),
        float(bgr.mean()),
    ]
    return {"width": width, "height": height_abs, "feature": [round(x, 6) for x in feature]}


def decode_wav(payload: bytes) -> dict:
    """PCM WAV → sample statistics (RIFF chunk walk, 16-bit PCM)."""
    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, n_channels, sample_rate, bits, samples = 12, 1, 8000, 16, None
    while pos + 8 <= len(payload):
        chunk_id = payload[pos : pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        body = pos + 8
        if chunk_id == b"fmt ":
            fmt, n_channels, sample_rate = struct.unpack_from("<HHI", payload, body)
            bits = struct.unpack_from("<H", payload, body + 14)[0]
            if fmt != 1 or bits != 16:
                raise NotImplementedError("only 16-bit PCM WAV supported")
        elif chunk_id == b"data":
            samples = np.frombuffer(payload, dtype="<i2", count=size // 2, offset=body)
        pos = body + size + (size & 1)
    if samples is None:
        raise ValueError("WAV without data chunk")
    x = samples.astype(np.float64) / 32768.0
    duration = len(samples) / (sample_rate * n_channels)
    zcr = float(np.mean(np.abs(np.diff(np.signbit(x).astype(np.int8))))) if len(x) > 1 else 0.0
    feature = [
        float(duration),
        float(np.sqrt(np.mean(x**2))),   # rms
        float(np.abs(x).max(initial=0)), # peak
        zcr,
        float(x.mean()),
        float(sample_rate / 1e5),
        float(n_channels),
        0.0,
    ]
    return {"width": None, "height": None, "feature": [round(f, 6) for f in feature]}


def _decode_real(payload: bytes, kind: str) -> dict:
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return decode_wav(payload)
    raise NotImplementedError(
        "compressed media decode (JPEG/PNG/MP3/MP4) requires PIL/ffmpeg, not "
        "installed in this container; uncompressed BMP/WAV decode natively"
    )


def _decode_fake(payload: bytes, kind: str) -> dict:
    """Deterministic fake decoder: stable pseudo-dimensions + an 8-dim
    feature vector derived from the payload digest (plumbing tests)."""
    digest = hashlib.sha256(payload).digest()
    width = 64 + digest[0] % 192
    height = 64 + digest[1] % 192
    feature = [round(b / 255.0, 6) for b in digest[2:10]]
    return {"width": width, "height": height, "feature": feature}


def extract_media_features(media: DataFrame, fake: bool = False) -> DataFrame:
    """media(media_id, kind, payload, ...) → per-item features.

    Arrow-batched over binary columns — the pattern that matters at scale:
    payload bytes stay in Arrow buffers end-to-end; one Python call per batch."""
    decode = _decode_fake if fake else _decode_real

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rec in pdf.itertuples(index=False):
                payload = bytes(rec.payload)
                decoded = decode(payload, rec.kind)
                rows.append(
                    {
                        "media_id": rec.media_id,
                        "kind": rec.kind,
                        "n_bytes": len(payload),
                        "checksum": hashlib.sha256(payload).hexdigest(),
                        **decoded,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in FEATURES_SCHEMA])

    return media.select("media_id", "kind", "payload").mapInPandas(run, FEATURES_SCHEMA)


def sample_frames(media: DataFrame, every_n_bytes: int = 4096, fake: bool = False) -> DataFrame:
    """Frame-sampling plumbing: one row per sampled 'frame' (byte-offset
    stand-in — no pure-Python video container parser exists; a real decoder
    would emit decoded frames at timestamps through this same shape)."""
    offsets = F.sequence(
        F.lit(0), F.greatest(F.length("payload") - 1, F.lit(0)), F.lit(every_n_bytes)
    )
    return media.where(F.col("kind") == "video").select(
        "media_id", F.explode(offsets).alias("frame_offset")
    )


# --- synthesis: REAL media bytes, deterministically ---------------------------


def make_bmp(i: int, width: int = 16, height: int = 12) -> bytes:
    """A valid 24bpp BMP with deterministic pixels."""
    row_stride = (width * 3 + 3) & ~3
    pixel_bytes = bytearray()
    for y in range(height):
        row = bytearray()
        for x in range(width):
            row += bytes(((i * 37 + x * 5 + y * 11) % 256,   # B
                          (i * 53 + x * 7 + y * 3) % 256,    # G
                          (i * 29 + x * 13 + y * 17) % 256)) # R
        row += b"\x00" * (row_stride - len(row))
        pixel_bytes += row
    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(pixel_bytes), 2835, 2835, 0, 0)
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(pixel_bytes), 0, 0, 14 + 40)
    return header + info + bytes(pixel_bytes)


def make_wav(i: int, sample_rate: int = 8000, n_samples: int = 400) -> bytes:
    """A valid mono 16-bit PCM WAV: deterministic sine burst."""
    freq = 200 + (i % 20) * 50
    amp = 0.2 + (i % 5) * 0.15
    samples = b"".join(
        struct.pack("<h", int(32767 * amp * math.sin(2 * math.pi * freq * t / sample_rate)))
        for t in range(n_samples)
    )
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    return (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(samples)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(samples)) + samples
    )


def synthesize_media(spark: SparkSession, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic media table: REAL BMP images and PCM WAVs, opaque bytes
    for video (no lib-free container format exists)."""
    def gen(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                kind = ["image", "audio", "video"][i % 3]
                if kind == "image":
                    payload, mime = make_bmp(i + seed), "image/bmp"
                elif kind == "audio":
                    payload, mime = make_wav(i + seed), "audio/wav"
                else:
                    payload = hashlib.sha256(f"media:{seed}:{i}".encode()).digest() * (4 + i % 32)
                    mime = "application/octet-stream"
                rows.append(
                    {
                        "media_id": f"m{i:05d}",
                        "kind": kind,
                        "payload": payload,
                        "mime": mime,
                        "source": f"synthetic:{seed}",
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in MEDIA_SCHEMA])

    return spark.range(n).mapInPandas(gen, MEDIA_SCHEMA)
