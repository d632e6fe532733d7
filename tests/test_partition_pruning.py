"""Partition pruning demonstration (SURVEY §2.1 'bbox file-index
pruning' — Iceberg is absent in this sandbox, so the engine's pruning
story is parquet hive-partitioning: a tile predicate must prune the
scan to the matching partition directories, not read-all-then-filter).
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from urban_pointcloud_processing_spark.sources.raster import raster_df


def test_tile_partitioned_raster_scan_prunes_files(spark):
    tmp = tempfile.mkdtemp(prefix="upcp_prune_")
    try:
        path = f"{tmp}/raster"
        raster_df(spark).write.mode("overwrite").partitionBy(
            "tilecode"
        ).parquet(path)
        full = spark.read.parquet(path)
        n_tiles = full.select("tilecode").distinct().count()
        assert n_tiles == 9  # the 3x3 tile window

        one = full.filter(F.col("tilecode") == "2386_9702")
        # the physical plan carries the partition filter (file-index
        # pruning happens at planning, before any row is read)
        plan = one._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan and "2386_9702" in plan
        # runtime evidence: the pruned scan plans far fewer input
        # splits than the full scan (only the one partition's files)
        assert one.rdd.getNumPartitions() < full.rdd.getNumPartitions()
        # results identical to the post-scan filter
        assert one.count() == raster_df(spark).filter(
            F.col("tilecode") == "2386_9702"
        ).count()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
