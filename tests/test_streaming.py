"""Streaming ingest parity: the availableNow micro-batch tile histogram
must equal the batch tile histogram on the same ids."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from urban_pointcloud_processing_spark.sources.pages import synthetic_pages
from urban_pointcloud_processing_spark.streaming.ingest import run_available_now


def test_streaming_tile_histogram_matches_batch(spark):
    tmp = tempfile.mkdtemp(prefix="upcp_stream_")
    inp, ckpt = f"{tmp}/in", f"{tmp}/ckpt"
    try:
        spark.range(0, 20_000).select(F.col("id").alias("page_id")) \
            .write.mode("overwrite").parquet(inp)

        got = {
            (r["tile_x"], r["tile_y"]): r["n_pages"]
            for r in run_available_now(spark, inp, ckpt, "th_test").collect()
        }
        want = {
            (r["tile_x"], r["tile_y"]): r["n_pages"]
            for r in synthetic_pages(spark, 20_000)
            .groupBy("tile_x", "tile_y")
            .agg(F.count("*").alias("n_pages"))
            .collect()
        }
        assert got == want

        # resume: append new files, rerun against the SAME checkpoint —
        # only the new rows are ingested on top of the saved state
        spark.range(20_000, 30_000).select(F.col("id").alias("page_id")) \
            .write.mode("append").parquet(inp)
        got2 = {
            (r["tile_x"], r["tile_y"]): r["n_pages"]
            for r in run_available_now(spark, inp, ckpt, "th_test2").collect()
        }
        want2 = {
            (r["tile_x"], r["tile_y"]): r["n_pages"]
            for r in synthetic_pages(spark, 30_000)
            .groupBy("tile_x", "tile_y")
            .agg(F.count("*").alias("n_pages"))
            .collect()
        }
        assert got2 == want2
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
