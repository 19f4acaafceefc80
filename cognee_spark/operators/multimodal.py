"""Multimodal column plumbing — binary payloads with typed metadata.

cognee ingests audio/image documents by transcribing/describing them through
an LLM before chunking (AudioDocument/ImageDocument,
cognee/tasks/documents/classify_documents.py:19-61). A training-data pipeline
treats media as opaque `binary` columns + metadata and runs decode /
feature-extract / frame-sample as Arrow-batched UDFs.

The decode kernels are STUBBED here (no image/audio libs in this container):
`decode_image` raises NotImplementedError unless `fake=True`, in which case a
deterministic fake decoder (dimensions + checksum derived from the bytes)
exercises the real Spark plumbing — schema, batching, partitioning, UDF
signatures — which is the part that has to be right at 100 TB.
"""

from __future__ import annotations

import hashlib
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


def _decode_real(payload: bytes, kind: str) -> dict:
    raise NotImplementedError(
        "media decode requires PIL/ffmpeg which are not installed in this "
        "container; run with fake=True for the deterministic stand-in"
    )


def _decode_fake(payload: bytes, kind: str) -> dict:
    """Deterministic fake decoder: stable pseudo-dimensions + an 8-dim
    feature vector derived from the payload digest."""
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
    stand-in). Real decoder would emit decoded frames at timestamps."""
    if not fake:
        _decode_real(b"", "video")
    offsets = F.sequence(
        F.lit(0), F.greatest(F.length("payload") - 1, F.lit(0)), F.lit(every_n_bytes)
    )
    return media.where(F.col("kind") == "video").select(
        "media_id", F.explode(offsets).alias("frame_offset")
    )


def synthesize_media(spark: SparkSession, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests/benchmarks."""
    def gen(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        kinds = ["image", "audio", "video"]
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                payload = hashlib.sha256(f"media:{seed}:{i}".encode()).digest() * (4 + i % 32)
                rows.append(
                    {
                        "media_id": f"m{i:05d}",
                        "kind": kinds[i % 3],
                        "payload": payload,
                        "mime": "application/octet-stream",
                        "source": f"synthetic:{seed}",
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in MEDIA_SCHEMA])

    return spark.range(n).mapInPandas(gen, MEDIA_SCHEMA)
