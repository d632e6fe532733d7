"""WFS/NDW parser parity: JVM-side from_json parsing must reproduce the
reference scrapers' parse semantics on fixture payloads."""

from __future__ import annotations

import json

from urban_pointcloud_processing_spark.sources.wfs import (
    parse_ndw_traffic_signs,
    parse_wfs_linestrings,
    parse_wfs_polygons,
    polygons_to_edges,
)


def _wfs_payload():
    return json.dumps(
        {
            "name": "BGT_V_rijbaan_lokale_weg",
            "features": [
                {
                    "geometry": {
                        "coordinates": [
                            [[0.0, 0.0], [4.0, 0.0], [4.0, 2.0],
                             [0.0, 2.0], [0.0, 0.0]]
                        ]
                    },
                    "properties": {"id": "a"},
                },
                {
                    "geometry": {
                        "coordinates": [
                            [[10.0, 5.0], [12.0, 5.0], [11.0, 8.0],
                             [10.0, 5.0]]
                        ]
                    },
                    "properties": {"id": "b"},
                },
            ],
        }
    )


def test_parse_wfs_polygons(spark):
    df = spark.createDataFrame([( _wfs_payload(),)], ["payload"])
    rows = sorted(
        parse_wfs_polygons(df).collect(), key=lambda r: r["x_min"]
    )
    assert [r["bgt_type"] for r in rows] == ["rijbaan_lokale_weg"] * 2
    r0 = rows[0]
    # reference bbox order: [name, polygon, x_min, y_max, x_max, y_min]
    assert (r0["x_min"], r0["y_max"], r0["x_max"], r0["y_min"]) == (
        0.0, 2.0, 4.0, 0.0
    )
    assert rows[1]["x_min"] == 10.0 and rows[1]["y_max"] == 8.0
    assert [list(v) for v in r0["ring"]][0] == [0.0, 0.0]


def test_parse_wfs_linestrings(spark):
    # Real GeoJSON LineString nesting: coordinates = [[x, y], ...]
    # (two levels — NOT wrapped in a ring array like polygons).
    payload = json.dumps(
        {
            "name": "BGT_V_tramspoor",
            "features": [
                {"geometry": {"coordinates": [[0.0, 0.0], [5.0, 1.0]]},
                 "properties": {}}
            ],
        }
    )
    df = spark.createDataFrame([(payload,)], ["payload"])
    rows = parse_wfs_linestrings(df).collect()
    assert rows[0]["bgt_type"] == "tramspoor"
    assert [list(v) for v in rows[0]["linestring"]] == [[0.0, 0.0], [5.0, 1.0]]


def test_parse_ndw_bbox_filter(spark):
    payload = json.dumps(
        [
            {"location": {"rd": {"x": 1.0, "y": 1.0}}},
            {"location": {"rd": {"x": 100.0, "y": 1.0}}},
        ]
    )
    df = spark.createDataFrame([(payload,)], ["payload"])
    all_rows = parse_ndw_traffic_signs(df).collect()
    assert len(all_rows) == 2 and all_rows[0]["bgt_type"] == "verkeersbord"
    filtered = parse_ndw_traffic_signs(df, bbox=(0.0, 0.0, 50.0, 50.0)).collect()
    assert [(r["x"], r["y"]) for r in filtered] == [(1.0, 1.0)]


def test_polygons_to_edges_feeds_pip(spark):
    """Parsed polygons must convert to the engine's edge-table shape and
    give correct PIP answers."""
    from pyspark.sql import functions as F

    from urban_pointcloud_processing_spark.functions.pip import pip_hits

    df = spark.createDataFrame([(_wfs_payload(),)], ["payload"])
    edges = polygons_to_edges(parse_wfs_polygons(df))
    # rectangle 0..4 x 0..2 has 4 edges; triangle has 3
    assert edges.count() == 7
    pts = spark.createDataFrame(
        [(1, 2.0, 1.0), (2, 11.0, 6.0), (3, 50.0, 50.0)],
        ["page_id", "x", "y"],
    )
    hits = pip_hits(pts, edges, keep_cols=("bgt_type",)).collect()
    assert {r["page_id"] for r in hits} == {1, 2}
