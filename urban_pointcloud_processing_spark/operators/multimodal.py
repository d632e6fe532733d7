"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Training-data-pipeline extension of SURVEY.md §2. Images/audio/video
are carried as ``payload: binary`` plus typed metadata columns; decode /
feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` transforms (the real 100 TB shape: one Python worker per
input partition, whole Arrow batches in, schema-stable batches out).

The image/audio codec libraries are NOT in this container, so the
actual pixel/sample decode is stubbed (``decode_image`` raises
``NotImplementedError`` unless given the deterministic fake codec).
Everything Spark-side — schema, partitioning, UDF signature, batch
shape, byte-level feature extraction — is real and oracle-tested:
``media_features`` computes its outputs from the actual payload bytes
inside the Python worker, and the DuckDB oracle reproduces them from
the same deterministic payload definition.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

if TYPE_CHECKING:
    import pandas as pd

MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("byte_mean", DoubleType()),
        StructField("first_byte", IntegerType()),
        StructField("n_sampled_frames", IntegerType()),
    ]
)

_TYPES = ("image", "audio", "video")


def synth_media(docs: DataFrame) -> DataFrame:
    """Deterministic media table derived from documents: the text bytes
    stand in for an encoded payload; metadata is derived from doc_id.
    (Fixture generator — the analog of the reference's synthetic LAS
    builder, src/upcp/utils/las_utils.py:133-183.)"""
    i = F.col("doc_id")
    return docs.select(
        "doc_id",
        F.element_at(
            F.array(*[F.lit(t) for t in _TYPES]), (i % 3 + 1).cast("int")
        ).alias("media_type"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        (F.lit(64) + (i % 577)).cast("int").alias("width"),
        (F.lit(64) + (i * 7 % 421)).cast("int").alias("height"),
        (F.lit(1) + (i % 240)).cast("int").alias("n_frames"),
    )


def decode_image(payload: bytes, codec: str = "real"):
    """Pixel decode — libraries not present in this container."""
    if codec == "fake":
        # Deterministic stand-in: a length-tagged tuple, NOT pixels.
        return (len(payload), payload[:1])
    raise NotImplementedError(
        "image/audio codecs are not available in this environment; "
        "pass codec='fake' for the deterministic test double"
    )


def media_features(media: DataFrame, frame_stride: int = 24) -> DataFrame:
    """Byte-level feature extraction over Arrow batches (mapInPandas).

    Real computation on real bytes: n_bytes, mean byte value, first
    byte, and the frame-sample count ceil(n_frames / frame_stride) —
    each reproducible in SQL for the oracle, while exercising the full
    binary→Python→Arrow round trip a real decoder would use.
    """

    def extract(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            payloads = pdf["payload"]
            n_bytes = payloads.map(len).astype("int64")
            # exact integer byte-sum + integer floor-e6 quantization →
            # both engines derive the same double from the same BIGINT
            # (python round() is half-even; DuckDB round() is half-away —
            # floor-e6 sidesteps the convention mismatch entirely)
            byte_mean = payloads.map(
                lambda b: (
                    int(np.frombuffer(b, dtype=np.uint8).sum(dtype=np.int64))
                    * 1_000_000
                    // len(b)
                )
                / 1e6
                if len(b)
                else 0.0
            )
            first = payloads.map(lambda b: int(b[0]) if len(b) else -1)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": n_bytes,
                    "byte_mean": byte_mean,
                    "first_byte": first.astype("int32"),
                    "n_sampled_frames": (
                        (pdf["n_frames"] + frame_stride - 1) // frame_stride
                    ).astype("int32"),
                }
            )

    return media.mapInPandas(extract, schema=FEATURE_SCHEMA)


def media_features_sql(frame_stride: int = 24) -> str:
    """Oracle: the same features from the deterministic payload
    definition (payload == UTF-8 text bytes; all-ASCII fixture, so the
    mean byte value is the mean code point)."""
    return f"""
WITH media AS (
  SELECT doc_id,
         ['image', 'audio', 'video'][CAST(doc_id % 3 + 1 AS INT)] AS media_type,
         text,
         CAST(1 + (doc_id % 240) AS INT) AS n_frames
  FROM documents
)
SELECT doc_id, media_type,
       CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
       CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
             list_transform(string_split(text, ''), c -> CAST(ord(c) AS BIGINT))),
             (a, b) -> a + b) * 1000000
           // octet_length(CAST(text AS BLOB)) AS DOUBLE) / 1000000.0
         AS byte_mean,
       CAST(CASE WHEN length(text) = 0 THEN -1 ELSE ord(text[1]) END AS INT)
         AS first_byte,
       CAST((n_frames + {frame_stride} - 1) // {frame_stride} AS INT)
         AS n_sampled_frames
FROM media
"""
