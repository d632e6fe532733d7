"""Long-format elevation raster table (ground / building surfaces).

The reference stores per-tile 500×500 float16 grids at 0.1 m resolution
in NPZ files (src/upcp/utils/ahn_utils.py:287-302,
src/upcp/preprocessing/ahn_preprocessing.py:221-235). At 10^12-row
scale a raster is just another (much smaller) table: one row per cell,
keyed by global cell indices — the raster↔vector lookup becomes an
equi-join that Catalyst plans as a broadcast hash join per tile.

Surfaces are pure integer-arithmetic functions of the cell indices
(FIXTURES.md §5 intent), so the DuckDB oracle reproduces every value
bit-exactly without materializing the table:

    ground_z(gx, gy)   = 2.0 + ((gx*31 + gy*17) % 100) / 100.0
    building_z(gx, gy) = ground_z + 9.0  where (gx*7 + gy*13) % 10 < 3
                         NULL elsewhere  (gaps, ahn_utils.py:253 NaN)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.layers import TILE, X_HI, X_LO, Y_HI, Y_LO

DEFAULT_RES = 1.0  # test-scale resolution (FIXTURES.md §5: 1 m variant)


def ground_z_col(gx: Column, gy: Column) -> Column:
    return F.lit(2.0) + ((gx * 31 + gy * 17) % 100) / F.lit(100.0)


def building_mask_col(gx: Column, gy: Column) -> Column:
    return ((gx * 7 + gy * 13) % 10) < 3


def raster_df(spark: SparkSession, res: float = DEFAULT_RES) -> DataFrame:
    """Materialize the raster for the fixture window, long format."""
    gx0, gx1 = int(X_LO // res), int(X_HI // res)
    gy0, gy1 = int(Y_LO // res), int(Y_HI // res)
    nx = gx1 - gx0
    ny = gy1 - gy0
    cells = spark.range(nx * ny).select(
        (F.lit(gx0) + F.col("id") % nx).alias("gx"),
        (F.lit(gy0) + F.floor(F.col("id") / nx)).alias("gy"),
    )
    gx, gy = F.col("gx"), F.col("gy")
    gz = ground_z_col(gx, gy)
    return cells.select(
        gx,
        gy,
        F.concat_ws(
            "_",
            F.floor(gx * F.lit(res) / F.lit(TILE)),
            F.floor(gy * F.lit(res) / F.lit(TILE)),
        ).alias("tilecode"),
        (gx * F.lit(res) + F.lit(res / 2)).alias("cx"),
        (gy * F.lit(res) + F.lit(res / 2)).alias("cy"),
        gz.alias("ground_z"),
        F.when(building_mask_col(gx, gy), gz + F.lit(9.0)).alias("building_z"),
    )


def with_raster(pages: DataFrame, raster: DataFrame,
                res: float = DEFAULT_RES) -> DataFrame:
    """Raster lookup join: page → enclosing cell (reference
    FastGridInterpolator, src/upcp/utils/interpolation.py:336-348,
    re-expressed as floor-key equi-join; broadcast at fixture scale)."""
    keyed = pages.withColumns(
        {"gx": F.floor(F.col("x") / F.lit(res)),
         "gy": F.floor(F.col("y") / F.lit(res))}
    )
    return keyed.join(
        F.broadcast(raster.select("gx", "gy", "ground_z", "building_z")),
        ["gx", "gy"],
        "left",
    )


# --- DuckDB oracle SQL fragments --------------------------------------

def gx_sql(x_expr: str, res: float = DEFAULT_RES) -> str:
    return f"CAST(floor({x_expr} / {res}) AS BIGINT)"


def ground_z_sql(gx: str, gy: str) -> str:
    return f"(2.0 + (({gx} * 31 + {gy} * 17) % 100) / 100.0)"


def building_z_sql(gx: str, gy: str) -> str:
    return (
        f"(CASE WHEN (({gx} * 7 + {gy} * 13) % 10) < 3 "
        f"THEN {ground_z_sql(gx, gy)} + 9.0 ELSE NULL END)"
    )


def raster_cte_sql(res: float = DEFAULT_RES) -> str:
    """CTE body reproducing raster_df() exactly in DuckDB:
    (gx, gy, tilecode, building_z) for the fixture window."""
    gx0, gx1 = int(X_LO // res), int(X_HI // res)
    gy0, gy1 = int(Y_LO // res), int(Y_HI // res)
    nx = gx1 - gx0
    ny = gy1 - gy0
    gx, gy = f"({gx0} + (i % {nx}))", f"({gy0} + (i // {nx}))"
    tc = (
        f"CAST(CAST(floor({gx} * {res} / {TILE}) AS BIGINT) AS VARCHAR)"
        f" || '_' || "
        f"CAST(CAST(floor({gy} * {res} / {TILE}) AS BIGINT) AS VARCHAR)"
    )
    return (
        f"SELECT {gx} AS gx, {gy} AS gy, {tc} AS tilecode, "
        f"{building_z_sql(gx, gy)} AS building_z "
        f"FROM range(0, {nx * ny}) t(i)"
    )
