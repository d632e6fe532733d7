"""Deterministic geocoding of row ids → RD-style (x, y, z) coordinates.

The reference engine's fact table is a LiDAR point table with native
(x, y, z) (reference: src/upcp/pipeline.py:124). Our fact table is a
Common-Crawl-style pages table; each page is geocoded deterministically
from its integer id using pure 64-bit integer arithmetic so that the
Spark DataFrame expressions and the DuckDB oracle SQL produce
bit-identical doubles (no libm, no hashing-library mismatch).

Coordinate window: a 3×3 block of 50 m tiles around the reference demo
tile 2386_9702 (lower-left (119300, 485100) — reference
datasets/README.md, tilecode formula src/upcp/utils/las_utils.py:45-53):
x ∈ [119250, 119400), y ∈ [485050, 485200), z ∈ [0, 12).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Knuth/Fibonacci-style multiplicative constants; products stay < 2^63
# for ids < ~3.5e9 so BIGINT arithmetic is exact in both engines.
AX = 2654435761
AY = 2246822519
AZ = 3266489917

X0 = 119250.0
Y0 = 485050.0
SPAN_MM = 150_000  # 150 m expressed in millimetres
Z_SPAN_MM = 12_000
TILE_SIZE = 50.0  # reference tile edge (datasets/README.md: 50x50 m)


def x_col(id_col: Column) -> Column:
    return F.lit(X0) + (id_col * F.lit(AX)) % F.lit(SPAN_MM) / F.lit(1000.0)


def y_col(id_col: Column) -> Column:
    return F.lit(Y0) + (id_col * F.lit(AY)) % F.lit(SPAN_MM) / F.lit(1000.0)


def z_col(id_col: Column) -> Column:
    return (id_col * F.lit(AZ)) % F.lit(Z_SPAN_MM) / F.lit(1000.0)


def geocode(df, id_col: str = "page_id"):
    """Append deterministic x, y, z columns derived from ``id_col``."""
    c = F.col(id_col)
    return df.withColumns({"x": x_col(c), "y": y_col(c), "z": z_col(c)})


# --- DuckDB oracle SQL fragments (identical arithmetic) ---------------

def x_sql(id_expr: str) -> str:
    return f"(119250.0 + (({id_expr} * 2654435761) % 150000) / 1000.0)"


def y_sql(id_expr: str) -> str:
    return f"(485050.0 + (({id_expr} * 2246822519) % 150000) / 1000.0)"


def z_sql(id_expr: str) -> str:
    return f"((({id_expr} * 3266489917) % 12000) / 1000.0)"


def pages_cte_sql(table: str, id_expr: str, extra_cols: str = "") -> str:
    """CTE body producing (page_id, x, y, z) from a DuckDB view."""
    return (
        f"SELECT {id_expr} AS page_id, {x_sql(id_expr)} AS x, "
        f"{y_sql(id_expr)} AS y, {z_sql(id_expr)} AS z{extra_cols} "
        f"FROM {table}"
    )
