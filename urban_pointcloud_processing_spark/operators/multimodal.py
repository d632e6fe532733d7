"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Training-data-pipeline extension of SURVEY.md §2. Images/audio/video
are carried as ``payload: binary`` plus typed metadata columns; decode /
feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` transforms (the real 100 TB shape: one Python worker per
input partition, whole Arrow batches in, schema-stable batches out).

Uncompressed image formats decode for REAL in pure NumPy — binary
PPM/PGM (``decode_ppm``) and 24-bit BI_RGB BMP (``decode_bmp``) need
no codec library; ``image_decode_features`` runs that decoder over
Arrow batches and its DuckDB oracle reproduces the per-channel pixel
means in closed form. Compressed codecs (JPEG/PNG/audio/video) are NOT
in this container, so ``decode_image`` raises ``NotImplementedError``
for them — an honest stub, while everything Spark-side (schema,
partitioning, UDF signature, batch shape, byte/pixel feature
extraction) is real and oracle-tested.
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


def _ppm_tokens(data: bytes, n: int) -> tuple[list[bytes], int]:
    """First ``n`` whitespace-separated PNM header tokens (with ``#``
    comment lines skipped) and the offset of the byte AFTER the single
    whitespace character that terminates the last token — where the
    binary raster begins per the PNM spec."""
    toks: list[bytes] = []
    i = 0
    while len(toks) < n:
        while i < len(data) and data[i : i + 1].isspace():
            i += 1
        if i < len(data) and data[i : i + 1] == b"#":
            while i < len(data) and data[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(data) and not data[j : j + 1].isspace():
            j += 1
        if j == i:
            raise ValueError("truncated PNM header")
        toks.append(data[i:j])
        i = j
    return toks, i + 1  # skip exactly ONE whitespace after maxval


def decode_ppm(data: bytes):
    """Pure-NumPy decode of binary PNM: P6 (RGB) → (h, w, 3) uint8,
    P5 (grayscale) → (h, w) uint8. maxval must be < 256 (1 byte per
    sample). Uncompressed formats need no codec library — this is a
    REAL decoder, not a stub."""
    import numpy as np

    (magic, w_b, h_b, maxval_b), off = _ppm_tokens(data, 4)
    if magic not in (b"P6", b"P5"):
        raise ValueError(f"not a binary PPM/PGM: magic={magic!r}")
    w, h, maxval = int(w_b), int(h_b), int(maxval_b)
    if not (0 < maxval < 256):
        raise ValueError(f"unsupported maxval {maxval} (need 1 byte/sample)")
    ch = 3 if magic == b"P6" else 1
    need = w * h * ch
    raster = np.frombuffer(data, dtype=np.uint8, count=need, offset=off)
    return raster.reshape(h, w, 3) if ch == 3 else raster.reshape(h, w)


def decode_bmp(data: bytes):
    """Pure-NumPy decode of 24-bit uncompressed (BI_RGB) bottom-up BMP
    → (h, w, 3) uint8 in RGB order. Rows are 4-byte aligned in the
    file; stored bottom-up and BGR — both undone here."""
    import struct

    import numpy as np

    if data[:2] != b"BM":
        raise ValueError("not a BMP: missing 'BM' magic")
    (pix_off,) = struct.unpack_from("<I", data, 10)
    (hdr_size, w, h) = struct.unpack_from("<Iii", data, 14)
    if hdr_size < 40:
        raise ValueError(f"unsupported DIB header size {hdr_size}")
    (planes, bpp, compression) = struct.unpack_from("<HHI", data, 26)
    if bpp != 24 or compression != 0:
        raise ValueError(
            f"only 24-bit BI_RGB supported (bpp={bpp}, comp={compression})"
        )
    flip = h > 0  # positive height ⇒ bottom-up storage
    h = abs(h)
    stride = (w * 3 + 3) // 4 * 4
    rows = np.frombuffer(
        data, dtype=np.uint8, count=h * stride, offset=pix_off
    ).reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if flip:
        rows = rows[::-1]
    return rows[..., ::-1].copy()  # BGR → RGB


def decode_image(payload: bytes, codec: str = "auto"):
    """Pixel decode behind one codec interface.

    Uncompressed formats decode for REAL in pure NumPy (no codec
    library needed): binary PPM/PGM (``P6``/``P5`` magic) and 24-bit
    BI_RGB BMP (``BM`` magic). Compressed formats (JPEG/PNG/…) remain
    honestly stubbed — their codec libraries are not in this
    container. ``codec='fake'`` keeps the deterministic test double."""
    if codec == "fake":
        # Deterministic stand-in: a length-tagged tuple, NOT pixels.
        return (len(payload), payload[:1])
    if payload[:2] in (b"P6", b"P5"):
        return decode_ppm(payload)
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    raise NotImplementedError(
        "compressed image codecs (JPEG/PNG/…) are not available in "
        "this environment; uncompressed PPM/PGM/BMP decode natively"
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


# ----------------------------------------------------------------------
# Real pixel path: synthesize REAL PPM images (valid binary P6 files),
# decode them with the pure-NumPy decoder above, and emit per-channel
# pixel statistics. This exercises the full binary→Arrow→decode→feature
# path a production image pipeline runs, with zero stubbed steps.
# ----------------------------------------------------------------------

def synth_ppm_media(docs: DataFrame) -> DataFrame:
    """(doc_id, payload) — a deterministic, VALID binary P6 PPM per
    document: width = 4 + doc_id % 13, height = 3 + doc_id % 11, and
    raster byte j = (doc_id*31 + 7*j) % 256. Built in mapInPandas so
    payload assembly happens executor-side over Arrow batches (the
    fixture analog of the reference's synthetic LAS builder)."""

    def build(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            payloads = []
            for did in pdf["doc_id"]:
                did = int(did)
                w, h = 4 + did % 13, 3 + did % 11
                j = np.arange(w * h * 3, dtype=np.int64)
                raster = ((did * 31 + 7 * j) % 256).astype(np.uint8)
                payloads.append(
                    f"P6\n{w} {h}\n255\n".encode() + raster.tobytes()
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads}
            )

    return docs.select("doc_id").mapInPandas(
        build,
        schema=StructType(
            [
                StructField("doc_id", LongType()),
                StructField("payload", BinaryType()),
            ]
        ),
    )


DECODE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("mean_r", DoubleType()),
        StructField("mean_g", DoubleType()),
        StructField("mean_b", DoubleType()),
    ]
)


def image_decode_features(media: DataFrame) -> DataFrame:
    """Decode each payload with the REAL pure-NumPy decoder and emit
    width/height/channels + per-channel means (exact integer pixel
    sums, floor-e6 quantized — the same cross-engine double discipline
    as media_features). Arrow-batched mapInPandas: one Python worker
    per partition, no per-row Python, no driver collect."""

    def extract(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = {k: [] for k in (
                "doc_id", "width", "height", "channels",
                "mean_r", "mean_g", "mean_b",
            )}
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                arr = decode_image(bytes(payload))
                if arr.ndim == 2:
                    arr = arr[:, :, None]
                h, w, ch = arr.shape
                npx = h * w
                sums = arr.reshape(-1, ch).sum(
                    axis=0, dtype=np.int64
                )
                means = [
                    (int(s) * 1_000_000 // npx) / 1e6 for s in sums
                ]
                while len(means) < 3:
                    means.append(means[0])  # gray → replicate
                rows["doc_id"].append(int(did))
                rows["width"].append(w)
                rows["height"].append(h)
                rows["channels"].append(ch)
                rows["mean_r"].append(means[0])
                rows["mean_g"].append(means[1])
                rows["mean_b"].append(means[2])
            yield pd.DataFrame(rows)

    return media.mapInPandas(extract, schema=DECODE_SCHEMA)


def image_decode_sql() -> str:
    """Oracle: closed-form reproduction of the synth raster — channel c
    of pixel p is raster byte j = 3p + c, so mean_c = floor-e6 of
    (Σ_p (doc_id*31 + 7*(3p+c)) % 256) / (w*h). The list is w*h ≤ 256
    elements per doc — oracle-sized, not a scale path."""
    chan = {0: "mean_r", 1: "mean_g", 2: "mean_b"}
    sums = ",\n".join(
        f"""       CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
             list_transform(range(0, w * h),
               p -> (doc_id * 31 + 7 * (3 * p + {c})) % 256)),
             (a, b) -> a + b) * 1000000 // (w * h) AS DOUBLE) / 1000000.0
         AS {name}"""
        for c, name in chan.items()
    )
    return f"""
WITH dims AS (
  SELECT doc_id,
         CAST(4 + doc_id % 13 AS BIGINT) AS w,
         CAST(3 + doc_id % 11 AS BIGINT) AS h
  FROM documents
)
SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
       3 AS channels,
{sums}
FROM dims
"""
