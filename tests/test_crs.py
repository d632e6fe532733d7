"""RD→WGS84 polynomial + Z-order cell semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from urban_pointcloud_processing_spark.functions.crs import (
    rd_to_wgs84,
    zcell,
)


def test_rd_to_wgs84_amsterdam(spark):
    # RD (121000, 487000) is central Amsterdam ≈ (52.37°N, 4.89°E)
    df = spark.createDataFrame([(121000.0, 487000.0)], ["x", "y"])
    lat, lon = rd_to_wgs84(F.col("x"), F.col("y"))
    r = df.select(lat.alias("lat"), lon.alias("lon")).collect()[0]
    assert r["lat"] == pytest.approx(52.372, abs=0.01)
    assert r["lon"] == pytest.approx(4.891, abs=0.01)
    # RD origin reference point maps back to (PHI0, LAM0)
    df0 = spark.createDataFrame([(155000.0, 463000.0)], ["x", "y"])
    lat0, lon0 = rd_to_wgs84(F.col("x"), F.col("y"))
    r0 = df0.select(lat0.alias("lat"), lon0.alias("lon")).collect()[0]
    assert r0["lat"] == pytest.approx(52.15517440, abs=1e-9)
    assert r0["lon"] == pytest.approx(5.38720621, abs=1e-9)


def test_zcell_prefix_nesting(spark):
    # res-12 cells are (4/4096)° ≈ 0.001° wide — keep the "nearby" pair
    # well inside one cell and the far point in another region
    df = spark.createDataFrame(
        [(52.3720, 4.8910), (52.37201, 4.89101), (53.2, 6.5)], ["lat", "lon"]
    )
    out = df.select(
        zcell(F.col("lat"), F.col("lon"), 16).alias("r16"),
        zcell(F.col("lat"), F.col("lon"), 12).alias("r12"),
    ).collect()
    for r in out:
        # H3/S2-style nesting: the res-12 cell IS the res-16 prefix
        assert r["r16"] >> 8 == r["r12"]
    # nearby points share the coarse parent; the far point does not
    assert out[0]["r12"] == out[1]["r12"]
    assert out[0]["r12"] != out[2]["r12"]
