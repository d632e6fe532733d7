"""Structured-Streaming ingest: incremental tile histogram.

The reference is batch-only (SURVEY.md §2.11) — its incremental story
is "skip tiles whose outputs exist" (scripts/ahn_batch_processor.py:
53-57). The streaming analog for a continuously-crawled pages table:
micro-batch ingest of new page files → geocode → tile-assign →
stateful tile histogram, with exactly-once progress via the stream
checkpoint — the same resume semantics as the batch pipeline's
per-stage checkpoints, handled by Spark's offset log instead.

The transformation is the SAME geocode/tiling code as the batch path
(one definition, two execution modes), so streaming results are
batch-verifiable row-for-row — tested in tests/test_streaming.py with
Trigger.AvailableNow (bounded, deterministic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from ..geocode import geocode
from ..tiling import with_tiles

PAGE_IDS_SCHEMA = StructType([StructField("page_id", LongType())])


def pages_stream(spark: SparkSession, input_dir: str) -> DataFrame:
    """File-source stream of page-id parquet drops (a crawl feed)."""
    raw = spark.readStream.schema(PAGE_IDS_SCHEMA).parquet(input_dir)
    return with_tiles(geocode(raw))


def tile_histogram_stream(pages: DataFrame) -> DataFrame:
    """Running pages-per-tile counts (complete-mode aggregate)."""
    return pages.groupBy("tile_x", "tile_y").agg(
        F.count("*").alias("n_pages")
    )


def run_available_now(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    query_name: str = "tile_histogram",
):
    """Drain everything currently in input_dir into an in-memory sink
    and stop — bounded, deterministic; resume state lives in
    checkpoint_dir so a later run only processes NEW files."""
    agg = tile_histogram_stream(pages_stream(spark, input_dir))
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.sql(f"SELECT * FROM {query_name}")
