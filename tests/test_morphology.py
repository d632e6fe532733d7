"""Morphology kernels vs tiny independent oracles."""

from __future__ import annotations

import numpy as np

from urban_pointcloud_processing_spark.operators.morphology import (
    binary_dilate,
    binary_erode,
    cluster_morphology,
    label_regions,
)


def test_dilate_erode_close():
    g = np.zeros((7, 7), dtype=bool)
    g[2, 2] = g[2, 4] = True  # two pixels with a 1-gap
    d = binary_dilate(g)
    assert d[2, 3]  # gap bridged by dilation
    closed = binary_erode(d)
    assert closed[2, 3] and closed[2, 2] and closed[2, 4]
    # erosion of an isolated pixel removes it
    lone = np.zeros((5, 5), dtype=bool)
    lone[2, 2] = True
    assert not binary_erode(lone).any()


def test_label_regions_two_blobs():
    g = np.zeros((6, 6), dtype=bool)
    g[0:2, 0:2] = True
    g[4:6, 4:6] = True
    labels, n = label_regions(g)
    assert n == 2
    assert labels[0, 0] != labels[5, 5]
    assert (labels > 0).sum() == 8
    # diagonal touch is 8-connected → one region
    g2 = np.zeros((4, 4), dtype=bool)
    g2[0, 0] = g2[1, 1] = True
    _, n2 = label_regions(g2)
    assert n2 == 1


def test_cluster_morphology_grouped(spark):
    rows = []
    # component 0: a 3×2 solid block of points at 1 m spacing
    for x in (10.0, 11.0, 12.0):
        for y in (20.0, 21.0):
            rows.append((len(rows), x, y, 0))
    # component 1: two far-apart points → after close(1,1) both erode away
    rows.append((len(rows), 50.0, 50.0, 1))
    rows.append((len(rows), 58.0, 58.0, 1))
    df = spark.createDataFrame(rows, ["page_id", "x", "y", "component"])
    got = {
        (r["component"], r["region"]): r
        for r in cluster_morphology(df, voxel=1.0).collect()
    }
    # block survives closing as one region of ≥6 voxels, 3×2 m extents
    solid = [k for k in got if k[0] == 0 and k[1] > 0]
    assert len(solid) == 1
    r = got[solid[0]]
    assert r["n_voxels"] >= 6
    assert r["width_x"] >= 3.0 and r["width_y"] >= 2.0
    # isolated pixels: dilate(1) then erode(1) keeps them (closing is
    # idempotent on isolated pixels: dilation grows 3×3, erosion returns
    # the center) → two small regions
    iso = [k for k in got if k[0] == 1 and k[1] > 0]
    assert len(iso) == 2
