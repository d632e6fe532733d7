"""Watermarked tumbling-window streaming aggregate.

The streaming twin of the batch `tumbling_window` query: events stream
in, `withWatermark` bounds how late an event may arrive, and the
1-hour tumbling count/sum per user emits a window only once the
watermark passes its end (append mode) — so state is bounded and
results are final. This is the north-star's "watermarks + windowed
aggs for late data" element; the reference is batch-only, so the
semantics target is Spark's own contract, verified against the batch
aggregate over the same data.

Late-data behavior (tested): an event arriving later than the
watermark allowance for an already-closed window is DROPPED — the
closed window's counts do not change on subsequent drains; an event
within the allowance is folded in before the window closes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("user_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("value", DoubleType()),
    ]
)


def windowed_agg_stream(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "30 minutes",
) -> DataFrame:
    """(window_start, user_id, n_events, sum_value) — append-mode
    emission once the watermark passes the window end."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "user_id", "n_events", "sum_value",
        )
    )


def run_windowed_available_now(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    output_dir: str,
    window: str = "1 hour",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Drain the events currently in input_dir; closed windows append
    to the parquet sink; open-window state persists in the checkpoint
    for the next drain."""
    raw = spark.readStream.schema(EVENTS_SCHEMA).parquet(input_dir)
    out = windowed_agg_stream(raw, window, watermark)
    q = (
        out.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    schema = StructType(
        [
            StructField("window_start", TimestampType()),
            StructField("user_id", LongType()),
            StructField("n_events", LongType()),
            StructField("sum_value", DoubleType()),
        ]
    )
    return spark.read.schema(schema).parquet(output_dir)
