"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``urban_pointcloud_processing_spark`` — this
module is a thin re-export so the registry stays importable both ways.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from urban_pointcloud_processing_spark import queries as Q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: tile-assign every page,
    PIP-join against the polygon layers, enrich with the ground raster,
    and report per-tile totals + labelled counts."""
    from pyspark.sql import functions as F

    from urban_pointcloud_processing_spark.functions.pip import pip_flag
    from urban_pointcloud_processing_spark.sources.layers import polygon_edges_df
    from urban_pointcloud_processing_spark.sources.pages import pages_from_orders
    from urban_pointcloud_processing_spark.sources.raster import raster_df, with_raster

    pages = pages_from_orders(spark, "/root/testdata/sf0.001")
    flagged = pip_flag(pages, polygon_edges_df(spark), "in_polygon")
    enriched = with_raster(flagged, raster_df(spark))
    return (
        enriched.groupBy("tile_x", "tile_y")
        .agg(
            F.count("*").alias("n_pages"),
            F.sum(F.col("in_polygon").cast("int")).alias("n_in_polygon"),
            F.sum((F.abs(F.col("z") - F.col("ground_z")) < 0.2).cast("int")).alias("n_ground"),
        )
        .orderBy("tile_x", "tile_y")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return Q.queries()


def oracle_sql() -> dict[str, str]:
    return Q.oracle_sql()
