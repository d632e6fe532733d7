"""Query registry: every implemented operator exposed as a
(spark, sf_dir) -> DataFrame callable plus a DuckDB oracle SQL string.

This is the driver-facing surface (`__spark_entry__.py` re-exports it).
Each entry cites the reference operator it re-creates (SURVEY.md §2).
Column names are aliased identically on both sides; floating-point
results that cross an aggregation re-order boundary are rounded so the
order-insensitive value hash is stable (SURVEY.md §7.3 item 1).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import geocode as G
from .functions.pip import pip_hits, pip_hits_sql
from .sources import raster as R
from .sources.layers import (
    ROAD_TYPES,
    point_layer_values_sql,
    polygon_edges_df,
    polygon_edges_values_sql,
)
from .sources.pages import pages_from_orders
from .tiling import tile_x_sql, tile_y_sql

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}

PAGES_CTE = G.pages_cte_sql("orders", "o_orderkey")


def register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn
    return deco


# ----------------------------------------------------------------------
# Tiling (reference las_utils.py:24-53 — the tile-assignment operator)
# ----------------------------------------------------------------------

@register(
    "tile_assign",
    f"""
WITH pts AS ({PAGES_CTE})
SELECT page_id, {tile_x_sql('x')} AS tile_x, {tile_y_sql('y')} AS tile_y
FROM pts
""",
)
def q_tile_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-page tile assignment (the north-rule row-level match)."""
    return pages_from_orders(spark, sf_dir).select("page_id", "tile_x", "tile_y")


@register(
    "tile_histogram",
    f"""
WITH pts AS ({PAGES_CTE})
SELECT {tile_x_sql('x')} AS tile_x, {tile_y_sql('y')} AS tile_y,
       COUNT(*) AS n_pages
FROM pts GROUP BY 1, 2
""",
)
def q_tile_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pages per tile — scan→project→groupBy, map-side combined."""
    return (
        pages_from_orders(spark, sf_dir)
        .groupBy("tile_x", "tile_y")
        .agg(F.count("*").alias("n_pages"))
    )


# ----------------------------------------------------------------------
# Point-in-polygon join (reference clip_utils.py:193-238 + fusers)
# ----------------------------------------------------------------------

@register(
    "pip_join",
    pip_hits_sql(PAGES_CTE, polygon_edges_values_sql()),
)
def q_pip_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full (page × polygon) containment pairs over all layers."""
    pages = pages_from_orders(spark, sf_dir)
    return pip_hits(pages, polygon_edges_df(spark))


_ROAD_FILTER = "e.bgt_type IN ({})".format(
    ", ".join(f"'{t}'" for t in ROAD_TYPES)
)


@register(
    "pip_roads",
    pip_hits_sql(PAGES_CTE, polygon_edges_values_sql(), type_filter=_ROAD_FILTER),
)
def q_pip_roads(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-filtered PIP join (reference BGTRoadFuser type vocabulary,
    src/upcp/fusion/road_fuser.py:36-38,85-87)."""
    pages = pages_from_orders(spark, sf_dir)
    edges = polygon_edges_df(spark).filter(F.col("bgt_type").isin(*ROAD_TYPES))
    return pip_hits(pages, edges)


# ----------------------------------------------------------------------
# Raster lookup join (reference FastGridInterpolator,
# src/upcp/utils/interpolation.py:336-348) + AHN fuser predicates
# ----------------------------------------------------------------------

_GX = R.gx_sql("x")
_GY = R.gx_sql("y")


@register(
    "raster_lookup",
    f"""
WITH pts AS ({PAGES_CTE})
SELECT page_id, {R.ground_z_sql(_GX, _GY)} AS ground_z,
       {R.building_z_sql(_GX, _GY)} AS building_z
FROM pts
""",
)
def q_raster_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raster→vector enrichment: floor-key equi-join against the
    long-format raster table (broadcast at this scale)."""
    pages = pages_from_orders(spark, sf_dir)
    joined = R.with_raster(pages, R.raster_df(spark))
    return joined.select("page_id", "ground_z", "building_z")


@register(
    "ground_fuser",
    f"""
WITH pts AS ({PAGES_CTE})
SELECT page_id, 9 AS label
FROM pts
WHERE abs(z - {R.ground_z_sql(_GX, _GY)}) < 0.2
""",
)
def q_ground_fuser(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AHNFuser ground predicate: |z − ground_z| < ε, ε=0.2
    (src/upcp/fusion/ahn_fuser.py:159; ε from notebooks/0.)"""
    pages = pages_from_orders(spark, sf_dir)
    joined = R.with_raster(pages, R.raster_df(spark))
    return (
        joined.filter(F.abs(F.col("z") - F.col("ground_z")) < 0.2)
        .select("page_id", F.lit(9).alias("label"))
    )


@register(
    "building_fuser",
    f"""
WITH pts AS ({PAGES_CTE})
SELECT page_id, 10 AS label
FROM pts
WHERE {R.building_z_sql(_GX, _GY)} IS NOT NULL
  AND z < {R.building_z_sql(_GX, _GY)} + 0.2
""",
)
def q_building_fuser(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AHNFuser building predicate: z < building_z + ε
    (src/upcp/fusion/ahn_fuser.py:169-170)."""
    pages = pages_from_orders(spark, sf_dir)
    joined = R.with_raster(pages, R.raster_df(spark))
    return (
        joined.filter(
            F.col("building_z").isNotNull()
            & (F.col("z") < F.col("building_z") + 0.2)
        )
        .select("page_id", F.lit(10).alias("label"))
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
