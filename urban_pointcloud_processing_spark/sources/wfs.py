"""WFS / NDW response parsers (the reference scrapers minus HTTP).

Reference: src/upcp/scrapers/ams_bgt_scraper.py:51-127 (parse_polygons,
parse_linestrings, parse_points_bgtplus), ams_bag_scraper.py:33-60, and
ndw_scraper.py:34-60 (parse_traffic_signs). The network fetch itself is
excluded in this sandbox (no external data per FIXTURES.md); the parse
step — JSON feature collections → layer tables — is what the engine
needs at scale anyway, because at 10^12 rows the responses arrive as a
payload COLUMN (one row per fetched tile/layer chunk), not a Python
dict on the driver.

Spark-first: `from_json` with explicit schemas + `explode` +
higher-order bbox folds — the whole parse runs JVM-side inside
codegen, no Python in the path. Output shapes match the engine's layer
tables (sources/layers.py) so parsed payloads plug straight into the
PIP edge builder and the distance joins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    MapType,
    StringType,
    StructField,
    StructType,
)

# {"name": "bgt_v_<type>", "features": [{"geometry": {"coordinates":
#   [[[x, y], ...], ...]}, "properties": {...}}, ...]}
WFS_SCHEMA = StructType(
    [
        StructField("name", StringType()),
        StructField(
            "features",
            ArrayType(
                StructType(
                    [
                        StructField(
                            "geometry",
                            StructType(
                                [
                                    StructField(
                                        "coordinates",
                                        ArrayType(
                                            ArrayType(ArrayType(DoubleType()))
                                        ),
                                    )
                                ]
                            ),
                        ),
                        StructField(
                            "properties", MapType(StringType(), StringType())
                        ),
                    ]
                )
            ),
        ),
    ]
)

# LineString features: geometry.coordinates is [[x, y], ...] (TWO
# levels, per GeoJSON) — one level shallower than polygon rings. The
# reference parse_linestrings (ams_bgt_scraper.py:94-113) reads
# geometry.coordinates directly, so we need a distinct schema.
WFS_LINESTRING_SCHEMA = StructType(
    [
        StructField("name", StringType()),
        StructField(
            "features",
            ArrayType(
                StructType(
                    [
                        StructField(
                            "geometry",
                            StructType(
                                [
                                    StructField(
                                        "coordinates",
                                        ArrayType(ArrayType(DoubleType())),
                                    )
                                ]
                            ),
                        ),
                        StructField(
                            "properties", MapType(StringType(), StringType())
                        ),
                    ]
                )
            ),
        ),
    ]
)

# NDW: [{"location": {"rd": {"x": ..., "y": ...}}}, ...]
NDW_SCHEMA = ArrayType(
    StructType(
        [
            StructField(
                "location",
                StructType(
                    [
                        StructField(
                            "rd",
                            StructType(
                                [
                                    StructField("x", DoubleType()),
                                    StructField("y", DoubleType()),
                                ]
                            ),
                        )
                    ]
                ),
            )
        ]
    )
)


def _layer_name(name_col: Column) -> Column:
    """'_'.join(name.split('_')[2:]) — reference ams_bgt_scraper.py:63."""
    parts = F.split(name_col, "_")
    return F.array_join(F.slice(parts, 3, 1_000_000), "_")


def _ring_bbox(ring: Column) -> dict[str, Column]:
    xs = F.transform(ring, lambda v: v[0])
    ys = F.transform(ring, lambda v: v[1])
    return {
        "x_min": F.array_min(xs),
        "x_max": F.array_max(xs),
        "y_min": F.array_min(ys),
        "y_max": F.array_max(ys),
    }


def parse_wfs_polygons(payloads: DataFrame,
                       payload_col: str = "payload") -> DataFrame:
    """(bgt_type, ring, x_min, y_max, x_max, y_min) — one row per
    polygon feature; ring = outer ring [[x, y], ...] (reference
    parse_polygons keeps coordinates[0] and the bbox)."""
    doc = F.from_json(F.col(payload_col), WFS_SCHEMA)
    rows = payloads.select(
        _layer_name(doc["name"]).alias("bgt_type"),
        F.explode(doc["features"]).alias("f"),
    ).select(
        "bgt_type",
        F.col("f.geometry.coordinates")[0].alias("ring"),
    )
    bb = _ring_bbox(F.col("ring"))
    return rows.select(
        "bgt_type", "ring",
        bb["x_min"].alias("x_min"), bb["y_max"].alias("y_max"),
        bb["x_max"].alias("x_max"), bb["y_min"].alias("y_min"),
    )


def parse_wfs_linestrings(payloads: DataFrame,
                          payload_col: str = "payload") -> DataFrame:
    """(bgt_type, linestring) — reference parse_linestrings reads
    geometry.coordinates directly; a GeoJSON LineString is [[x, y], ...]
    (two nesting levels, unlike a polygon's ring array)."""
    doc = F.from_json(F.col(payload_col), WFS_LINESTRING_SCHEMA)
    return payloads.select(
        _layer_name(doc["name"]).alias("bgt_type"),
        F.explode(doc["features"]).alias("f"),
    ).select(
        "bgt_type",
        F.col("f.geometry.coordinates").alias("linestring"),
    )


def parse_ndw_traffic_signs(
    payloads: DataFrame,
    payload_col: str = "payload",
    bbox: tuple[float, float, float, float] | None = None,
) -> DataFrame:
    """(bgt_type='verkeersbord', x, y) — reference parse_traffic_signs,
    with the same strict-inequality bbox filter when given
    (bx_min, by_min, bx_max, by_max)."""
    doc = F.from_json(F.col(payload_col), NDW_SCHEMA)
    out = payloads.select(F.explode(doc).alias("s")).select(
        F.lit("verkeersbord").alias("bgt_type"),
        F.col("s.location.rd.x").alias("x"),
        F.col("s.location.rd.y").alias("y"),
    )
    if bbox is not None:
        bx_min, by_min, bx_max, by_max = bbox
        out = out.filter(
            (F.col("x") > bx_min) & (F.col("x") < bx_max)
            & (F.col("y") > by_min) & (F.col("y") < by_max)
        )
    return out


def polygons_to_edges(polys: DataFrame) -> DataFrame:
    """Parsed polygons → the engine's PIP edge-table shape
    (sources/layers.EDGE_COLS sans layer): explode consecutive ring
    vertex pairs, carry the polygon bbox prefilter columns."""
    with_id = polys.withColumn(
        "polygon_id", F.monotonically_increasing_id()
    )
    idx = F.sequence(F.lit(0), F.size("ring") - F.lit(2))
    pairs = with_id.select(
        "bgt_type", "polygon_id", "x_min", "y_min", "x_max", "y_max",
        F.explode(idx).alias("i"), "ring",
    )
    return pairs.select(
        "bgt_type", "polygon_id",
        F.col("ring")[F.col("i")][0].alias("x1"),
        F.col("ring")[F.col("i")][1].alias("y1"),
        F.col("ring")[F.col("i") + 1][0].alias("x2"),
        F.col("ring")[F.col("i") + 1][1].alias("y2"),
        F.col("x_min").alias("px_min"), F.col("y_min").alias("py_min"),
        F.col("x_max").alias("px_max"), F.col("y_max").alias("py_max"),
    )
