"""CSV sink round-trip (SURVEY §2.1 CSV sink)."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from urban_pointcloud_processing_spark.sources.sinks import (
    read_labels_csv,
    write_labels_csv,
)


def test_csv_sink_round_trip(spark):
    df = spark.range(100).select(
        F.col("id").alias("page_id"),
        (F.col("id") % 3).alias("tile_x"),
        (F.col("id") % 2).alias("tile_y"),
        (F.col("id") % 5).alias("label"),
    )
    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/labels_csv"
        write_labels_csv(df, path)
        back = read_labels_csv(spark, path)
        assert back.count() == 100
        got = {
            (r["page_id"], r["tile_x"], r["tile_y"], r["label"])
            for r in back.collect()
        }
        want = {
            (r["page_id"], r["tile_x"], r["tile_y"], r["label"])
            for r in df.collect()
        }
        assert got == want
