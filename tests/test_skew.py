"""Salting + adaptive repartition semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from urban_pointcloud_processing_spark.operators.skew import (
    cell_frequency_sketch,
    salted_count,
    salted_repartition,
)


def _skewed(spark):
    # one hot cell (9000 rows in tile (0,0)), nine cold cells of 100
    hot = spark.range(9000).select(
        F.col("id").alias("page_id"), F.lit(0).alias("tile_x"), F.lit(0).alias("tile_y")
    )
    cold = spark.range(9000, 9900).select(
        F.col("id").alias("page_id"),
        (F.col("id") % 3 + 1).cast("int").alias("tile_x"),
        (F.col("id") % 3 + 1).cast("int").alias("tile_y"),
    )
    return hot.unionAll(cold)


def test_frequency_sketch_finds_hot_cells(spark):
    df = _skewed(spark)
    hot = cell_frequency_sketch(df, ["tile_x", "tile_y"], target_rows=1000).collect()
    assert len(hot) == 1
    assert (hot[0]["tile_x"], hot[0]["tile_y"]) == (0, 0)
    assert hot[0]["_salt_factor"] == 9  # ceil(9000/1000)


def test_salted_repartition_splits_hot_cell(spark):
    df = _skewed(spark)
    out = salted_repartition(
        df, ["tile_x", "tile_y"], target_rows=1000, num_partitions=16
    )
    # no rows lost or duplicated
    assert out.count() == 9900
    # the hot cell fans out over >1 salt value → >1 partition
    hot_salts = (
        out.filter((F.col("tile_x") == 0) & (F.col("tile_y") == 0))
        .select("_salt").distinct().count()
    )
    assert hot_salts == 9
    # max rows co-located for the hot cell shrinks to ~target
    per_task = (
        out.filter((F.col("tile_x") == 0) & (F.col("tile_y") == 0))
        .groupBy("_salt").count().agg(F.max("count")).collect()[0][0]
    )
    assert per_task < 2000


def test_salted_count_matches_plain_count(spark):
    df = _skewed(spark)
    plain = {
        (r["tile_x"], r["tile_y"]): r["n"]
        for r in df.groupBy("tile_x", "tile_y").agg(F.count("*").alias("n")).collect()
    }
    salted = {
        (r["tile_x"], r["tile_y"]): r["n_rows"]
        for r in salted_count(df, ["tile_x", "tile_y"]).collect()
    }
    assert plain == salted
