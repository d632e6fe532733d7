"""Cable-merging semantics on constructed synthetic cables (the
fixture-generator test strategy of reference las_utils.create_pole_las)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from urban_pointcloud_processing_spark.operators.cable_merge import (
    merge_cables,
    merge_clusters_np,
)


def _cable(cid: int, x0: float, x1: float, y: float, sag: float = 0.2,
            n: int = 20) -> pd.DataFrame:
    """Points along a sagging span from (x0,y) to (x1,y): a parabola in
    z with the given mid-span sag."""
    xs = np.linspace(x0, x1, n)
    mid = (x0 + x1) / 2
    half = (x1 - x0) / 2
    z = 10.0 - sag * (1 - ((xs - mid) / half) ** 2)
    return pd.DataFrame(
        {"cluster_id": cid, "x": xs, "y": y, "z": z}
    )


def test_collinear_segments_merge():
    # two halves of ONE span (same line, touching, shared parabola)
    xs = np.linspace(0.0, 40.0, 40)
    z = 10.0 - 0.2 * (1 - ((xs - 20.0) / 20.0) ** 2)
    pdf = pd.DataFrame({
        "cluster_id": np.where(xs < 20.0, 1, 2),
        "x": xs, "y": 5.0, "z": z,
    })
    m = merge_clusters_np(pdf, 15.0, 10.0, 0.5)
    assert m == {1: 1, 2: 1}


def test_perpendicular_or_distant_do_not_merge():
    a = _cable(1, 0.0, 20.0, 5.0)
    # perpendicular cable crossing nearby
    b = pd.DataFrame({
        "cluster_id": 2,
        "x": 21.0, "y": np.linspace(0.0, 20.0, 20),
        "z": 10.0,
    })
    m = merge_clusters_np(pd.concat([a, b]), 15.0, 10.0, 0.5)
    assert m[1] == 1 and m[2] == 2
    # collinear but far away (gap > max_gap)
    c = _cable(3, 50.0, 70.0, 5.0)
    m2 = merge_clusters_np(pd.concat([a, c]), 15.0, 10.0, 0.5)
    assert m2[1] == 1 and m2[3] == 3


def test_merge_is_transitive_fixpoint():
    # three consecutive collinear segments merge into one id (min)
    segs = pd.concat([
        _cable(7, 0.0, 15.0, 3.0, sag=0.0),
        _cable(5, 16.0, 30.0, 3.0, sag=0.0),
        _cable(9, 31.0, 45.0, 3.0, sag=0.0),
    ])
    m = merge_clusters_np(segs, 15.0, 10.0, 0.5)
    assert set(m.values()) == {5}


def test_merge_cables_grouped(spark):
    pdf = pd.concat([
        _cable(1, 0.0, 18.0, 2.0, sag=0.0),
        _cable(2, 20.0, 38.0, 2.0, sag=0.0),
        _cable(3, 0.0, 18.0, 80.0, sag=0.0),  # far row: own group merge
    ])
    df = spark.createDataFrame(pdf)
    got = {
        r["cluster_id"]: r["merged_id"]
        for r in merge_cables(df, group_col=None).collect()
    }
    assert got[1] == 1 and got[2] == 1
    assert got[3] == 3  # too far from the others (gap > max_gap)
