"""Multimodal columns: opaque binary payloads + typed metadata, with
decode / feature-extract / resize / frame-sample as Arrow-batched pandas
UDFs over mapInPandas.

Storage model (the 100 TB design):
- media lives in a `payload BINARY` column (or object-store URIs for
  >~1 MB blobs) beside a typed `media STRUCT<media_type, width, height,
  duration_ms, sample_rate>` metadata column;
- parquet keeps binary columns page-compressed and column-pruned: metadata-
  only queries never touch payload bytes;
- decode runs in `mapInPandas` — Arrow moves whole batches zero-copy into
  pandas, the decode library runs per batch, and output schemas are fixed
  up front so Catalyst can plan around the black box;
- partitioning: payload rows are large — size `maxPartitionBytes` down (or
  repartition by a bucketed id) so a batch of decoded frames fits executor
  memory.

The actual image/audio codecs are NOT in this container: `_decode_image` is
a clearly-marked stub (NotImplementedError behind an import-try) with a
deterministic byte-level fake used by tests and fixtures. The Spark-side
plumbing — schema, batching, UDF signature — is real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META_STRUCT = StructType(
    [
        StructField("media_type", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", LongType()),
        StructField("sample_rate", IntegerType()),
    ]
)

DECODE_STATS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("sha256", StringType()),
        StructField("fake_width", IntegerType()),
        StructField("fake_height", IntegerType()),
    ]
)


def attach_binary_payload(
    df: DataFrame, text_col: str = "text", media_type: str = "image/fake"
) -> DataFrame:
    """Fixture adapter: treat document text bytes as an opaque media payload
    with typed metadata — the schema real media columns use."""
    return df.withColumn("payload", F.col(text_col).cast("binary")).withColumn(
        "media",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("bigint").alias("duration_ms"),
            F.lit(None).cast("int").alias("sample_rate"),
        ),
    )


def _decode_image(payload: bytes) -> tuple[int, int]:
    """Real decode path — STUB: the codec libraries are not installed here.

    Falls back to a deterministic fake (dimensions derived from the payload
    hash) so pipelines exercise the full plumbing with stable outputs.
    """
    try:
        from PIL import Image  # noqa: F401  (not available in this container)
    except ImportError:
        h = hashlib.sha256(payload).digest()
        return 64 + h[0] % 192, 64 + h[1] % 192
    raise NotImplementedError("real image decode not wired in this environment")


def decode_stats(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Decode/feature-extract over mapInPandas (Arrow-batched).

    Output: per-payload byte stats + (fake-)decoded dimensions. The sha256
    checksum doubles as an integrity/dedup key for binary payloads.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            dims = [_decode_image(bytes(p)) for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": payloads.map(len).astype("int64"),
                    "sha256": payloads.map(
                        lambda p: hashlib.sha256(bytes(p)).hexdigest()
                    ),
                    "fake_width": pd.array([w for w, _ in dims], dtype="int32"),
                    "fake_height": pd.array([h for _, h in dims], dtype="int32"),
                }
            )

    return df.select(id_col, "payload").mapInPandas(batches, DECODE_STATS_SCHEMA)


def resize(
    df: DataFrame,
    target_width: int = 224,
    target_height: int = 224,
    id_col: str = "doc_id",
) -> DataFrame:
    """Resize plumbing: binary-in -> binary-out transform over mapInPandas.

    Real codecs would decode, resample, re-encode; the stub emits a
    deterministic surrogate payload (sha256 of payload + target dims) with
    the typed metadata updated to the target dimensions — the exact schema
    contract a real resize kernel must satisfy.
    """
    out_schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("payload", BinaryType()),
            StructField("media", MEDIA_META_STRUCT),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        dims = target_width.to_bytes(4, "big") + target_height.to_bytes(4, "big")
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "payload": pdf["payload"].map(
                        lambda p: hashlib.sha256(bytes(p) + dims).digest()
                    ),
                    "media": [
                        {
                            "media_type": "image/fake",
                            "width": target_width,
                            "height": target_height,
                            "duration_ms": None,
                            "sample_rate": None,
                        }
                        for _ in range(len(pdf))
                    ],
                }
            )

    return df.select(id_col, "payload").mapInPandas(batches, out_schema)


def frame_sample(
    df: DataFrame,
    every_ms: int = 1000,
    id_col: str = "doc_id",
) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled frame offset.

    Real codecs would decode frames; the stub derives a deterministic
    per-frame checksum from (payload, offset). Output grain: payload x
    frame_offset — the explode pattern video pipelines use.
    """
    out_schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("frame_offset_ms", LongType()),
            StructField("frame_checksum", StringType()),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {"doc_id": [], "frame_offset_ms": [], "frame_checksum": []}
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                payload = bytes(payload)
                # fake duration: 1 ms per byte
                for off in range(0, len(payload), every_ms):
                    rows["doc_id"].append(int(doc_id))
                    rows["frame_offset_ms"].append(off)
                    rows["frame_checksum"].append(
                        hashlib.sha256(payload + off.to_bytes(8, "big")).hexdigest()
                    )
            yield pd.DataFrame(rows)

    return df.select(id_col, "payload").mapInPandas(batches, out_schema)
