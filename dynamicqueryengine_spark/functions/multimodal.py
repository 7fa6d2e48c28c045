"""Multimodal (image/audio/video) column plumbing (SURVEY.md §7 Phase 4).

Media payloads are opaque ``binary`` columns plus a typed metadata struct —
the Spark-native shape for a 100 TB multimodal corpus (payload bytes stay in
Parquet/columnar storage; metadata prunes without touching payloads).

The Spark-side mechanics here are REAL and tested: schemas, Arrow-batched
``mapInPandas`` feature extraction, partition-preserving pipelines. The
actual media decoding is STUBBED behind ``NotImplementedError`` /
deterministic fakes because no image/audio libraries exist in this
container — swap ``_decode_stub`` for a real decoder (PIL/torchaudio/ffmpeg)
without touching any of the distributed plumbing.
"""

from __future__ import annotations

import hashlib
from typing import Iterable, Iterator

from pyspark.sql import DataFrame, functions as F

from ..util import spread
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

BLOB_METADATA_SCHEMA = StructType(
    [
        StructField("format", StringType(), False),
        StructField("size_bytes", LongType(), False),
        StructField("source", StringType(), True),
    ]
)

BLOB_FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("format", StringType(), False),
        StructField("size_bytes", LongType(), False),
        StructField("payload_md5", StringType(), False),
        StructField("head_byte", IntegerType(), True),
        StructField("decoded", StringType(), False),
    ]
)


def attach_blob(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Build a multimodal-shaped table from a text table: payload =
    utf-8 bytes (a deterministic stand-in for image/audio bytes), metadata =
    typed struct. Pure Column ops — this is the ingestion shape a real
    media pipeline produces."""
    payload = F.encode(F.col(text_col), "utf-8")
    return df.select(
        F.col(id_col),
        payload.alias("payload"),
        F.struct(
            F.lit("text/plain").alias("format"),
            F.octet_length(payload).cast("long").alias("size_bytes"),
            F.col("source").alias("source") if "source" in df.columns else F.lit(None).cast("string").alias("source"),
        ).alias("metadata"),
    )


# --- decode stubs (marked; the container has no media libraries) ---------


def decode_image(payload: bytes, fmt: str) -> "object":
    """STUB — real implementation would use PIL/torchvision.

    Raises NotImplementedError so pipelines fail loudly rather than fake
    image decoding silently."""
    raise NotImplementedError(
        "image decode requires a media library not present in this container; "
        "replace multimodal.decode_image with a PIL/torchvision decoder"
    )


def decode_audio(payload: bytes, fmt: str) -> "object":
    """STUB — see :func:`decode_image`."""
    raise NotImplementedError(
        "audio decode requires a media library not present in this container"
    )


def sample_frames(payload: bytes, fmt: str, every_n: int = 30) -> "list":
    """STUB — video frame sampling; see :func:`decode_image`."""
    raise NotImplementedError(
        "video decode requires a media library not present in this container"
    )


def _decode_stub(payload: bytes) -> dict:
    """Deterministic fake 'decode': cheap byte-level features standing in for
    real decoded-media features (dimensions, duration, ...). md5 keeps the
    checksum oracle-checkable (DuckDB ships md5; crc32 it does not)."""
    return {
        "payload_md5": hashlib.md5(payload).hexdigest(),
        "head_byte": payload[0] if payload else None,
    }


def extract_blob_features(blobs: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the payload column.

    The ``mapInPandas`` shape is exactly what a real decoder needs: batches
    arrive as pandas DataFrames with ``bytes`` payload cells; output rows are
    a flat typed feature table. Batch size is governed by
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` — size it so
    batch_rows × payload_size fits executor memory at the target scale.
    """
    import pandas as pd  # deferred: executors import lazily

    def extract(batches: Iterable["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            feats = [_decode_stub(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "format": [m["format"] for m in pdf["metadata"]],
                    "size_bytes": [m["size_bytes"] for m in pdf["metadata"]],
                    "payload_md5": [f["payload_md5"] for f in feats],
                    "head_byte": [f["head_byte"] for f in feats],
                    "decoded": "stub",
                }
            )

    return spread(blobs).mapInPandas(extract, schema=BLOB_FEATURES_SCHEMA)


def filter_by_metadata(
    blobs: DataFrame, max_size_bytes: int | None = None, formats: list[str] | None = None
) -> DataFrame:
    """Metadata-only pruning — never touches payload bytes, so Parquet
    column pruning keeps the scan narrow (the 100 TB win of the
    payload/metadata split)."""
    out = blobs
    if max_size_bytes is not None:
        out = out.filter(F.col("metadata.size_bytes") <= max_size_bytes)
    if formats:
        out = out.filter(F.col("metadata.format").isin(formats))
    return out
