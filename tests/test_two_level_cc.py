"""Two-level CC must produce exactly the iterative CC's partition AND
its canonical ids (component = min cell key of the global component)."""

from __future__ import annotations

from pyspark.sql import functions as F

from urban_pointcloud_processing_spark.operators.components import (
    grid_components,
    grid_components_two_level,
)
from urban_pointcloud_processing_spark.sources.pages import synthetic_pages


def _collect(df):
    return sorted(
        (r["page_id"], r["component"])
        for r in df.select("page_id", "component").collect()
    )


def test_two_level_equals_iterative(spark):
    pts = synthetic_pages(spark, 5000).select("page_id", "x", "y")
    a = _collect(grid_components(pts, grid_size=1.0))
    b = _collect(grid_components_two_level(pts, grid_size=1.0))
    assert a == b


def test_two_level_cross_block_merge(spark):
    # a straight line of points crossing several 64-cell blocks must be
    # ONE component with the min cell key as id
    rows = [(i, float(i), 100.0) for i in range(0, 300)]
    pts = spark.createDataFrame(rows, ["page_id", "x", "y"])
    out = grid_components_two_level(pts, grid_size=1.0, tile_cells=64)
    comps = {r["component"] for r in out.collect()}
    assert len(comps) == 1
    # canonical id = min cell key = cx0 * 2^31 + cy(100)
    assert comps == {0 * (1 << 31) + 100}
