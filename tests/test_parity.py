"""Oracle parity for every registered query — mirrors the driver's
CORRECTNESS gate (row-count + schema + order-insensitive values)."""

from __future__ import annotations

import pytest

from urban_pointcloud_processing_spark import queries as Q

from .parity import compare

NAMES = sorted(set(Q.queries()) & set(Q.oracle_sql()))


@pytest.mark.parametrize("name", NAMES)
def test_oracle_parity(spark, sf_dir, name):
    report = compare(spark, sf_dir, name, Q.queries()[name], Q.oracle_sql()[name])
    assert report.get("ok"), report


def test_pip_enricher_strategies_agree(spark, sf_dir):
    """pandas / expr / join strategies must produce identical flags
    (the join path was previously unexercised; expr is capped to small
    layers, so compare on the roads subset which is 3 polygons)."""
    from pyspark.sql import functions as F

    from urban_pointcloud_processing_spark.operators.fusers import PipEnricher
    from urban_pointcloud_processing_spark.sources.layers import (
        ROAD_TYPES,
        polygon_edges_df,
        polygon_layer,
    )
    from urban_pointcloud_processing_spark.sources.pages import (
        pages_from_orders,
    )

    pages = pages_from_orders(spark, sf_dir).select("page_id", "x", "y").limit(
        2000
    ).localCheckpoint(eager=True)
    edges = polygon_edges_df(spark)
    flag_types = {"_in_road": list(ROAD_TYPES)}
    road_polys = [p for p in polygon_layer() if p["layer"] == "roads"]

    def flags(strategy, **kw):
        out = PipEnricher(edges, flag_types, strategy=strategy, **kw)(pages)
        return {
            r["page_id"]: r["_in_road"]
            for r in out.select("page_id", "_in_road").collect()
        }

    pandas_f = flags("pandas", polys=road_polys)
    expr_f = flags("expr", polys=road_polys)
    join_f = flags("join")
    assert pandas_f == expr_f == join_f
    assert any(pandas_f.values()) and not all(pandas_f.values())
