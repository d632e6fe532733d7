"""Property tests for the PIP kernel (SURVEY.md §5): all three engine
strategies must agree with an independent pure-Python crossing-number
oracle on random polygons/points, including edge/vertex cases."""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from urban_pointcloud_processing_spark.functions.pip import (
    pip_flag_expr,
    pip_flag_pandas_udf,
)


def py_inside(px: float, py: float, rings) -> bool:
    """Independent crossing-number oracle (even-odd over all rings)."""
    parity = False
    for ring in rings:
        for (x1, y1), (x2, y2) in zip(ring, ring[1:]):
            if y1 == y2:
                continue
            if (y1 > py) != (y2 > py):
                if px < (x2 - x1) * (py - y1) / (y2 - y1) + x1:
                    parity = not parity
    return parity


def _poly(cx: float, cy: float, r: float, k: int) -> dict:
    """Regular k-gon on a 0.25 grid (snapped) around (cx, cy)."""
    import math

    ring = []
    for i in range(k):
        a = 2 * math.pi * i / k
        ring.append(
            (round((cx + r * math.cos(a)) * 4) / 4,
             round((cy + r * math.sin(a)) * 4) / 4)
        )
    ring.append(ring[0])
    xs = [v[0] for v in ring]
    ys = [v[1] for v in ring]
    return {
        "bgt_type": "pand", "rings": [ring],
        "x_min": min(xs), "x_max": max(xs),
        "y_min": min(ys), "y_max": max(ys),
    }


coord = st.integers(min_value=0, max_value=400).map(lambda v: v / 4.0)


@settings(max_examples=30, deadline=None)
@given(
    pts=st.lists(st.tuples(coord, coord), min_size=1, max_size=20),
    cx=st.integers(20, 80).map(float),
    cy=st.integers(20, 80).map(float),
    r=st.integers(4, 40).map(lambda v: v / 2.0),
    k=st.integers(3, 9),
)
def test_pandas_udf_matches_python_oracle(pts, cx, cy, r, k):
    poly = _poly(cx, cy, r, k)
    # exercise the UDF body directly (no Spark job per example)
    f = pip_flag_pandas_udf([poly], ["pand"]).func
    xs = pd.Series([p[0] for p in pts], dtype=float)
    ys = pd.Series([p[1] for p in pts], dtype=float)
    got = list(f(xs, ys))
    want = [
        py_inside(px, py, poly["rings"])
        and poly["x_min"] <= px <= poly["x_max"]
        and poly["y_min"] <= py <= poly["y_max"]
        for px, py in pts
    ]
    assert got == want


def test_expr_and_udf_agree_on_vertices_and_edges(spark):
    # points ON vertices/edges of a unit square (boundary semantics
    # must match between the Column expr and the pandas UDF exactly)
    sq = {
        "bgt_type": "pand",
        "rings": [[(0.0, 0.0), (2.0, 0.0), (2.0, 2.0), (0.0, 2.0), (0.0, 0.0)]],
        "x_min": 0.0, "x_max": 2.0, "y_min": 0.0, "y_max": 2.0,
    }
    pts = [
        (0, 0.0, 0.0), (1, 2.0, 2.0), (2, 1.0, 0.0), (3, 0.0, 1.0),
        (4, 2.0, 1.0), (5, 1.0, 2.0), (6, 1.0, 1.0), (7, 3.0, 1.0),
    ]
    df = spark.createDataFrame(pts, ["i", "x", "y"])
    out = df.select(
        "i",
        pip_flag_expr(F.col("x"), F.col("y"), [sq], ["pand"]).alias("e"),
        pip_flag_pandas_udf([sq], ["pand"])(F.col("x"), F.col("y")).alias("u"),
    ).collect()
    for r in out:
        assert r["e"] == r["u"], (r["i"], r["e"], r["u"])
    inside = {r["i"]: r["e"] for r in out}
    assert inside[6] is True  # strict interior
    assert inside[7] is False  # outside


def test_multi_flag_udf_matches_per_flag_udfs(spark):
    """pip_flags_pandas_udf (ONE Arrow pass for all flags) must be
    bit-identical to k independent pip_flag_pandas_udf calls — it is
    the PipEnricher default whenever more than one flag is missing."""
    from urban_pointcloud_processing_spark.functions.pip import (
        pip_flags_pandas_udf,
    )
    from urban_pointcloud_processing_spark.sources.layers import (
        ROAD_TYPES,
        polygon_layer,
    )
    from urban_pointcloud_processing_spark.sources.pages import (
        pages_from_orders,
    )

    polys = polygon_layer()
    flag_types = {"in_road": list(ROAD_TYPES), "in_building": ["pand"]}
    pages = pages_from_orders(spark, "/root/testdata/sf0.001")
    multi = pip_flags_pandas_udf(polys, flag_types)(F.col("x"), F.col("y"))
    df = pages.select(
        "page_id",
        multi.getField("in_road").alias("mr"),
        multi.getField("in_building").alias("mb"),
        pip_flag_pandas_udf(polys, flag_types["in_road"])(
            F.col("x"), F.col("y")).alias("sr"),
        pip_flag_pandas_udf(polys, flag_types["in_building"])(
            F.col("x"), F.col("y")).alias("sb"),
    )
    bad = df.filter(
        (F.col("mr") != F.col("sr")) | (F.col("mb") != F.col("sb"))
    ).count()
    assert bad == 0
    # sanity: both flags light up somewhere on the fixture
    lit_counts = df.agg(
        F.sum(F.col("mr").cast("int")), F.sum(F.col("mb").cast("int"))
    ).collect()[0]
    assert lit_counts[0] > 0 and lit_counts[1] > 0
